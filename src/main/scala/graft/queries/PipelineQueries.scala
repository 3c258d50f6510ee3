package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Text, Vectors}
import graft.operators.{Ann, Bpe, Dedup, DupGroups, Multimodal, Packing, PageRank}
import graft.sources.Catalog

/** SURVEY.md §2.D5 — composed curation pipelines (p01–p05), split out of LlmOps along the family seam; they compose the registered stages' exact predicates from the family objects. */
object PipelineQueries extends QDsl {


  // p02 — the INCREMENTAL curation pipeline: what p01 is for a
  // from-scratch build, this is for the daily-ingest run — new batch
  // dedups against the accumulated corpus (d11's Bloom prefilter +
  // exact anti-join: the corpus side never shuffles), survivors flow
  // through the same quality-feature filter and leakage-safe hash
  // split, ending in per-(split, lang) accounting. ONE dataflow, no
  // driver glue; at 100 TB the only full-corpus work is the single
  // digest scan the Bloom filter prunes.
  val p02: Q = q("p02_incremental_pipeline",
    s"""WITH h AS (SELECT doc_id, lang, n_chars, text,
       |            md5(substr(text, 1, 64)) AS ch,
       |            substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'c' AS is_new
       |           FROM documents),
       |ex AS (SELECT DISTINCT ch FROM h WHERE NOT is_new),
       |surv AS (SELECT MIN(doc_id) AS doc_id FROM h
       |         WHERE is_new AND ch NOT IN (SELECT ch FROM ex) GROUP BY ch),
       |d AS (SELECT doc_id, lang, n_chars, string_split(lower(text), ' ') AS toks
       |      FROM h JOIN surv USING (doc_id)),
       |f AS (SELECT doc_id, lang, n_chars, len(toks) AS n_tokens,
       |        len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.enStops)})) AS stop_hits
       |      FROM d),
       |g AS (SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
       |               THEN 'val' ELSE 'train' END AS split,
       |        lang, n_tokens, n_chars
       |      FROM f WHERE n_tokens >= 50 AND stop_hits >= 1)
       |SELECT split, lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
       |FROM g GROUP BY 1, 2 ORDER BY 1, 2""") { c =>
    val bucket = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
    val surv = Dedup.incremental(
        c.documents.filter(bucket >= "c"),
        c.documents.filter(bucket < "c"),
        digest = md5(substring(col("text"), 1, 64).cast("binary")))
      .select("doc_id")
    val toks = Text.tokens(col("text"))
    val feats = c.documents.join(surv, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(toks).as("n_tokens"),
        Text.hitCount(toks, Text.enStops).as("stop_hits"))
    feats.filter(col("n_tokens") >= 50 && col("stop_hits") >= 1)
      .withColumn("split",
        when(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 2) < "1a", "val").otherwise("train"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"), sum("n_chars").as("n_chars"))
      .orderBy("split", "lang")
  }

  val p01: Q = q("p01_curation_pipeline",
    s"""WITH surv AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |d AS (SELECT doc_id, lang, n_chars, string_split(lower(text), ' ') AS toks
       |      FROM documents JOIN surv USING (doc_id)),
       |f AS (SELECT doc_id, lang, n_chars, len(toks) AS n_tokens,
       |        len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.enStops)})) AS stop_hits
       |      FROM d),
       |g AS (SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
       |               THEN 'val' ELSE 'train' END AS split,
       |        lang, n_tokens, n_chars
       |      FROM f WHERE n_tokens >= 50 AND stop_hits >= 1)
       |SELECT split, lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
       |FROM g GROUP BY 1, 2 ORDER BY 1, 2""") { c =>
    val surv = Dedup.exact(c.documents).select("doc_id")
    val toks = Text.tokens(col("text"))
    val feats = c.documents.join(surv, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(toks).as("n_tokens"),
        Text.hitCount(toks, Text.enStops).as("stop_hits"))
    feats.filter(col("n_tokens") >= 50 && col("stop_hits") >= 1)
      .withColumn("split",
        when(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 2) < "1a", "val").otherwise("train"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"), sum("n_chars").as("n_chars"))
      .orderBy("split", "lang")
  }

  // p03 — the CCNet-SHAPED pipeline (Wenzek et al. 2020: paragraph-
  // level dedup → language ID → quality bucketing into head/middle/
  // tail terciles per language), composed from the registered blocks
  // in ONE dataflow: d07's chunk dedup-and-rebuild (chunkCleaned),
  // x01's stopword-profile language predictor on the CLEANED text,
  // and an x02-shaped typicality score (best-language stopword
  // density + length term; CCNet buckets on LM perplexity — x15 is
  // the registered LM scorer, the tercile mechanics are identical)
  // ranked into per-language NTILE(3) buckets. Scale shape: the
  // dedup is d07's one hash agg + keep join, lang/quality features
  // are a projection, and the ONLY new shuffle is the tercile
  // window — per-language partitions, and q15's documented
  // quantile-cutpoint variant is the approximate scale path when a
  // language slice outgrows a partition. Exact NTILE kept here
  // because the oracle demands it (q15's reasoning).
  private val p03OracleSql =
    s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |seg AS (SELECT doc_id, unnest(list_transform(range(0, CAST(ceil(len(t)/8.0) AS INT)),
      |          i -> {'pos': i, 'seg': array_to_string(t[i*8+1 : i*8+8], ' ')}), recursive := true)
      |        FROM toks),
      |keyed AS (SELECT doc_id, pos, seg, doc_id*100000 + pos AS k FROM seg),
      |keeper AS (SELECT seg, MIN(k) AS keep_k FROM keyed GROUP BY seg),
      |kept AS (SELECT doc_id, pos, keyed.seg FROM keyed
      |         JOIN keeper ON keyed.seg = keeper.seg AND keyed.k = keeper.keep_k),
      |rebuilt AS (SELECT doc_id, COUNT(*) AS n_kept,
      |              string_agg(seg, ' ' ORDER BY pos) AS clean_text
      |            FROM kept GROUP BY doc_id),
      |counts AS (SELECT doc_id, COUNT(*) AS n_chunks FROM keyed GROUP BY doc_id),
      |cleaned AS (SELECT counts.doc_id, n_chunks, COALESCE(n_kept, 0) AS n_kept,
      |              COALESCE(clean_text, '') AS clean_text
      |            FROM counts LEFT JOIN rebuilt ON counts.doc_id = rebuilt.doc_id),
      |t2 AS (SELECT doc_id, n_chunks, n_kept,
      |         string_split(clean_text, ' ') AS ct FROM cleaned),
      |h AS (SELECT doc_id, n_chunks, n_kept, len(ct) AS n_tokens,
      |        len(list_filter(ct, x -> x IN ${SharedSql.inList(Text.enStops)})) AS en_hits,
      |        len(list_filter(ct, x -> x IN ${SharedSql.inList(Text.esStops)})) AS es_hits,
      |        len(list_filter(ct, x -> x IN ${SharedSql.inList(Text.deStops)})) AS de_hits,
      |        len(list_filter(ct, x -> x IN ${SharedSql.inList(Text.frStops)})) AS fr_hits
      |      FROM t2),
      |sc AS (SELECT doc_id, n_chunks, n_kept, n_tokens,
      |         CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
      |              WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
      |              WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang,
      |         ROUND(0.5 * LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
      |           + 0.5 * (CAST(GREATEST(en_hits, es_hits, de_hits, fr_hits) AS DOUBLE) / n_tokens), 6) AS score
      |       FROM h)
      |SELECT doc_id, pred_lang, CAST(n_chunks AS BIGINT) AS n_chunks,
      |  CAST(n_kept AS BIGINT) AS n_kept, CAST(n_tokens AS BIGINT) AS n_tokens, score,
      |  CASE NTILE(3) OVER (PARTITION BY pred_lang ORDER BY score DESC, doc_id)
      |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
      |FROM sc ORDER BY doc_id"""

  /** p03's dedup → langid → typicality stages, shared by both tercile
    * forms so the scoring can never drift between them.
    */
  private def p03Scored(c: Catalog): DataFrame = {
    val ct = split(col("clean_text"), " ")
    val feat = DedupQueries.chunkCleaned(c).select(
      col("doc_id"), col("n_chunks"), col("n_kept"),
      size(ct).cast(LongType).as("n_tokens"),
      Text.hitCount(ct, Text.enStops).as("en_hits"),
      Text.hitCount(ct, Text.esStops).as("es_hits"),
      Text.hitCount(ct, Text.deStops).as("de_hits"),
      Text.hitCount(ct, Text.frStops).as("fr_hits"))
    val nTok = col("n_tokens").cast(DoubleType)
    val best = greatest(col("en_hits"), col("es_hits"),
      col("de_hits"), col("fr_hits")).cast(DoubleType)
    feat.select(col("doc_id"),
      Text.predLang(col("en_hits"), col("es_hits"),
        col("de_hits"), col("fr_hits")).as("pred_lang"),
      col("n_chunks"), col("n_kept"), col("n_tokens"),
      round(lit(0.5) * least(lit(1.0), nTok / 100.0)
        + lit(0.5) * (best / nTok), 6).as("score"))
  }

  val p03: Q = q("p03_ccnet_pipeline", p03OracleSql) { c =>
    val w = Window.partitionBy("pred_lang")
      .orderBy(col("score").desc, col("doc_id"))
    p03Scored(c).select(col("doc_id"), col("pred_lang"), col("n_chunks"),
        col("n_kept"), col("n_tokens"), col("score"),
        when(ntile(3).over(w) === 1, "head")
          .when(ntile(3).over(w) === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  // p03_auto — the tercile SCALE path: the NTILE(3) per-language
  // window above funnels each language slice through ONE task (the
  // only corpus-sized sort in the composed pipelines); this form
  // swaps it for Ntile.exact (q15's distributed NTILE: range
  // partition on the full sort key, slice-local ranks, an
  // O(partitions × languages) offset table broadcast back), which is
  // BIT-IDENTICAL to the window under the (score desc, doc_id) total
  // order and keeps parallelism = shuffle partitions — strictly
  // better than the approximate-cutpoint variant the round-13 notes
  // sketched, because it is exact at any scale (no recall dial to
  // justify). Ordering trick: Ntile.exact sorts ascending, so it
  // ranges on (−score, doc_id) — negation is order-exact for the
  // rounded non-negative scores. Same oracle as p03 (the assignment
  // is identical by construction; PropertySpec fuzzes
  // Ntile.exact == ntile on skewed frames).
  val p03auto: Q = q("p03_ccnet_pipeline_auto", p03OracleSql) { c =>
    val scored = p03Scored(c).withColumn("__negscore", -col("score"))
    graft.operators.Ntile.exact(scored, k = 3,
        partCols = Seq("pred_lang"),
        orderCols = Seq("__negscore", "doc_id"), bucketName = "__tile")
      .select(col("doc_id"), col("pred_lang"), col("n_chunks"),
        col("n_kept"), col("n_tokens"), col("score"),
        when(col("__tile") === 1, "head")
          .when(col("__tile") === 2, "middle")
          .otherwise("tail").as("bucket"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  // p04 — CURATION FUNNEL REPORT (the accounting every corpus
  // curation run publishes: docs and tokens surviving each stage —
  // raw → exact dedup → quality filter → decontamination — the
  // first artifact a data lead asks for and the one that catches a
  // mis-dialed filter eating 40% of the corpus). Composed from the
  // registered stages' EXACT predicates (d01 keep-first, x06
  // lang+score gate, x13 4-gram eval overlap), but computed as ONE
  // dataflow: every doc gets its stage-survival FLAGS in a single
  // pipeline (the dedup window and the contamination join are the
  // only shuffles — both inherent to their stages), then one
  // aggregate emits all four stage rows via an unpivot of eight
  // sums — no per-stage re-scan of the corpus. Eval docs
  // (doc_id < 20) leave at the decontamination stage along with
  // overlap hits: benchmarks are not training data.
  val p04: Q = q("p04_funnel_report",
    s"""WITH ${DedupQueries.urlInjectSqlCtes},
       |bd AS (SELECT doc_id, regexp_extract(url_key, '://([^/]+)', 1)
       |         NOT IN ${SharedSql.inList(TextQueries.blocklistRows.map(_._1))} AS s1b
       |       FROM n),
       |t0 AS (SELECT d.doc_id, lang, text, string_split(lower(text), ' ') AS toks, s1b
       |       FROM documents d JOIN bd USING (doc_id)),
       |t AS (SELECT doc_id, lang, toks, s1b,
       |    MIN(CASE WHEN s1b THEN doc_id END) OVER (PARTITION BY md5(text)) AS keeper
       |  FROM t0),
       |h AS (SELECT doc_id, lang, toks, s1b, len(toks) AS n_tok,
       |    s1b AND doc_id = keeper AS s2,
       |    len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.enStops)})) AS en_hits,
       |    len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.esStops)})) AS es_hits,
       |    len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.deStops)})) AS de_hits,
       |    len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.frStops)})) AS fr_hits
       |  FROM t),
       |q3 AS (SELECT *,
       |    s2 AND (CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
       |         WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
       |         WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END) = lang
       |      AND 0.5 * LEAST(1.0, CAST(n_tok AS DOUBLE) / 100.0)
       |        + 0.5 * (CAST(en_hits AS DOUBLE) / n_tok) >= 0.3 AS s3
       |  FROM h),
       |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)-2),
       |        i -> array_to_string(toks[i:i+3], ' ')))) AS g4
       |      FROM t WHERE len(toks) >= 4),
       |ev AS (SELECT DISTINCT g4 FROM g WHERE doc_id < 20),
       |cont AS (SELECT DISTINCT g.doc_id FROM g JOIN ev USING (g4) WHERE g.doc_id >= 20),
       |f AS (SELECT *,
       |    s3 AND doc_id >= 20 AND doc_id NOT IN (SELECT doc_id FROM cont) AS s4
       |  FROM q3),
       |a AS (SELECT COUNT(*) AS d1, CAST(SUM(n_tok) AS BIGINT) AS t1,
       |    CAST(SUM(CASE WHEN s1b THEN 1 ELSE 0 END) AS BIGINT) AS db,
       |    CAST(SUM(CASE WHEN s1b THEN n_tok ELSE 0 END) AS BIGINT) AS tb,
       |    CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
       |    CAST(SUM(CASE WHEN s2 THEN n_tok ELSE 0 END) AS BIGINT) AS t2,
       |    CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
       |    CAST(SUM(CASE WHEN s3 THEN n_tok ELSE 0 END) AS BIGINT) AS t3,
       |    CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
       |    CAST(SUM(CASE WHEN s4 THEN n_tok ELSE 0 END) AS BIGINT) AS t4
       |  FROM f)
       |SELECT 1 AS stage_idx, 'raw' AS stage, d1 AS n_docs, t1 AS n_tokens FROM a
       |UNION ALL SELECT 2, 'blocklist', db, tb FROM a
       |UNION ALL SELECT 3, 'exact_dedup', d2, t2 FROM a
       |UNION ALL SELECT 4, 'quality', d3, t3 FROM a
       |UNION ALL SELECT 5, 'decontam', d4, t4 FROM a
       |ORDER BY stage_idx""".stripMargin) { c =>
    val toks = Text.tokens(col("text"))
    // blocklist stage = x35's EXACT predicate (same canonical URL
    // chain, same domain list — one source of truth); keep-first
    // dedup then runs over blocklist SURVIVORS (a real funnel dedups
    // the post-filter stream), so the md5-window min is conditional
    val s1b = !regexp_extract(DedupQueries.urlKeyCol, "://([^/]+)", 1)
      .isin(TextQueries.blocklistRows.map(_._1): _*)
    val base = c.documents.select(col("doc_id"), col("lang"),
      toks.as("toks"), s1b.as("s1b"),
      (col("doc_id") === min(when(s1b, col("doc_id"))).over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")
          .cast("binary"))))).as("__kf"))
      .withColumn("s2", col("s1b") && col("__kf"))
    val h = base.select(col("doc_id"), col("lang"), col("s1b"), col("s2"),
      size(col("toks")).as("n_tok"),
      Text.hitCount(col("toks"), Text.enStops).as("en_hits"),
      Text.hitCount(col("toks"), Text.esStops).as("es_hits"),
      Text.hitCount(col("toks"), Text.deStops).as("de_hits"),
      Text.hitCount(col("toks"), Text.frStops).as("fr_hits"),
      col("toks"))
    val nTok = col("n_tok").cast(DoubleType)
    val score = lit(0.5) * least(lit(1.0), nTok / 100.0) +
      lit(0.5) * (col("en_hits").cast(DoubleType) / nTok)
    val q3 = h.withColumn("s3",
      col("s2") &&
        (Text.predLang(col("en_hits"), col("es_hits"),
          col("de_hits"), col("fr_hits")) === col("lang")) && score >= 0.3)
    // decontam stage = x13's registered discipline: the eval 4-gram
    // set comes from its OWN doc_id<20 slice (filter pushed to the
    // parquet scan — the r12 form derived it from the corpus-wide
    // stream THROUGH the s2 md5 window), within-doc shingle dedup is
    // the array_distinct already inside Text.shingles (map-side by
    // construction — the r12 corpus-wide `.distinct()` re-shuffled
    // the whole exploded 4-gram stream to deduplicate what was
    // already distinct, 10x probe ratio 14.26). The corpus side
    // stays a narrow explode into a broadcast join; the only wide op
    // left is the per-doc_id distinct AFTER the join, bounded by the
    // contaminated-overlap volume.
    val ev = c.documents.filter(col("doc_id") < 20)
      .select(explode(Text.shingles(Text.tokens(col("text")), 4)).as("g4"))
      .distinct()
    val cont = c.documents.filter(col("doc_id") >= 20)
      .select(col("doc_id"),
        explode(Text.shingles(Text.tokens(col("text")), 4)).as("g4"))
      .join(broadcast(ev), "g4").select("doc_id").distinct()
      .withColumn("contaminated", lit(true))
    val f = q3.join(broadcast(cont), Seq("doc_id"), "left")
      .withColumn("s4", col("s3") && col("doc_id") >= 20 &&
        coalesce(col("contaminated"), lit(false)) === false)
    val a = f.agg(
      count(lit(1)).as("d1"), sum("n_tok").cast(LongType).as("t1"),
      sum(when(col("s1b"), 1).otherwise(0)).cast(LongType).as("db"),
      sum(when(col("s1b"), col("n_tok")).otherwise(0)).cast(LongType).as("tb"),
      sum(when(col("s2"), 1).otherwise(0)).cast(LongType).as("d2"),
      sum(when(col("s2"), col("n_tok")).otherwise(0)).cast(LongType).as("t2"),
      sum(when(col("s3"), 1).otherwise(0)).cast(LongType).as("d3"),
      sum(when(col("s3"), col("n_tok")).otherwise(0)).cast(LongType).as("t3"),
      sum(when(col("s4"), 1).otherwise(0)).cast(LongType).as("d4"),
      sum(when(col("s4"), col("n_tok")).otherwise(0)).cast(LongType).as("t4"))
    a.select(explode(array(
        struct(lit(1).as("stage_idx"), lit("raw").as("stage"),
          col("d1").as("n_docs"), col("t1").as("n_tokens")),
        struct(lit(2).as("stage_idx"), lit("blocklist").as("stage"),
          col("db").as("n_docs"), col("tb").as("n_tokens")),
        struct(lit(3).as("stage_idx"), lit("exact_dedup").as("stage"),
          col("d2").as("n_docs"), col("t2").as("n_tokens")),
        struct(lit(4).as("stage_idx"), lit("quality").as("stage"),
          col("d3").as("n_docs"), col("t3").as("n_tokens")),
        struct(lit(5).as("stage_idx"), lit("decontam").as("stage"),
          col("d4").as("n_docs"), col("t4").as("n_tokens")))).as("r"))
      .select(col("r.*"))
      .orderBy("stage_idx")
  }

  // p05 — the EPOCH MATERIALIZER: x32 derives the rates, this entry
  // BUILDS the epoch — every doc explodes into its ⌊r⌋/⌊r⌋+1 copies
  // (upsampled sources really repeat), each copy gets a deterministic
  // shuffle key (md5 of doc:copy — the epoch-stable global shuffle
  // training wants), and the resampled stream packs into 1024-token
  // sequences via the x16 two-phase prefix scan ordered by that key
  // (Packing.offsetsKeyed — no data-sized single-partition window).
  // Per-sequence accounting reports docs spanned and EXACT token
  // fill (clip arithmetic, all integer): every sequence but the last
  // holds exactly 1024 tokens — spec-pinned, as is total-fill ==
  // x32's kept_tokens (the two entries must account identically).
  // At 100 TB: the explode multiplies only upsampled rows, the
  // shuffle is one range partition on the key, and the packing scan
  // is the parallel two-phase form — nothing is corpus² anywhere.
  val p05: Q = q("p05_epoch_materializer",
    s"""WITH ${TextQueries.tempRateCtes},
      |st0 AS (SELECT tok.doc_id, t AS n_tok, ${TextQueries.repSql} AS rep
      |  FROM tok JOIN r USING (source)),
      |stream AS (SELECT doc_id, n_tok,
      |    md5(CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR)) AS key
      |  FROM (SELECT doc_id, n_tok, unnest(range(1, rep + 1)) AS copy
      |        FROM st0 WHERE rep > 0 AND n_tok > 0)),
      |o AS (SELECT doc_id, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (ORDER BY key
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
      |  FROM stream),
      |e AS (SELECT doc_id, n_tok, start,
      |    unnest(range(start // 1024, (start + n_tok - 1) // 1024 + 1)) AS seq_id
      |  FROM o)
      |SELECT seq_id, COUNT(*) AS n_docs,
      |  CAST(SUM(LEAST(start + n_tok, (seq_id + 1) * 1024) -
      |           GREATEST(start, seq_id * 1024)) AS BIGINT) AS n_tokens
      |FROM e GROUP BY 1 ORDER BY seq_id""") { c =>
    val (tok, r) = TextQueries.temperatureRates(c)
    val stream = tok.join(broadcast(r.select("source", "rate_ppm")), "source")
      .withColumn("rep", TextQueries.repCol)
      .filter(col("rep") > 0 && col("t") > 0)
      .select(col("doc_id"), col("t").as("n_tok"),
        explode(sequence(lit(1L), col("rep"))).as("copy"))
      .withColumn("key",
        md5(concat_ws(":", col("doc_id"), col("copy")).cast("binary")))
    val offs = graft.operators.Packing.offsetsKeyed(
      stream.select("key", "n_tok", "doc_id"), "key")
    offs.select(col("doc_id"), col("n_tok"), col("start"),
        explode(sequence(expr("start div 1024"),
          expr("(start + n_tok - 1) div 1024"))).as("seq_id"))
      .withColumn("contrib",
        least(col("start") + col("n_tok"), (col("seq_id") + 1) * 1024) -
          greatest(col("start"), col("seq_id") * 1024))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("contrib").cast(LongType).as("n_tokens"))
      .orderBy("seq_id")
  }
}
