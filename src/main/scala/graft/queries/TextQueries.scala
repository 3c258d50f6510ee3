package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Text, Vectors}
import graft.operators.{Ann, Bpe, Dedup, DupGroups, Multimodal, Packing, PageRank}
import graft.sources.Catalog

/** SURVEY.md §2.D3 — text-analysis / tokenize entries (x01–x33), split out of LlmOps along the family seam; semantics, oracles, and helper constants are unchanged. */
object TextQueries extends QDsl {


  // x01 — heuristic language ID from stopword hit counts
  val x01: Q = q("x01_langid",
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |h AS (SELECT doc_id,
       |  len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.enStops)})) AS en_hits,
       |  len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.esStops)})) AS es_hits,
       |  len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.deStops)})) AS de_hits,
       |  len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.frStops)})) AS fr_hits
       |FROM t)
       |SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
       |  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
       |       WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
       |       WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang
       |FROM h ORDER BY doc_id""") { c =>
    val toks = Text.tokens(col("text"))
    c.documents
      .select(col("doc_id"),
        Text.hitCount(toks, Text.enStops).as("en_hits"),
        Text.hitCount(toks, Text.esStops).as("es_hits"),
        Text.hitCount(toks, Text.deStops).as("de_hits"),
        Text.hitCount(toks, Text.frStops).as("fr_hits"))
      .withColumn("pred_lang", Text.predLang(
        col("en_hits"), col("es_hits"), col("de_hits"), col("fr_hits")))
      .orderBy("doc_id")
  }

  // x02 — text quality scoring (length / stopword-density features)
  val x02: Q = q("x02_quality_score",
    s"""WITH t AS (SELECT doc_id, length(text) AS n_chars, string_split(lower(text), ' ') AS toks FROM documents),
       |f AS (SELECT doc_id, n_chars, len(toks) AS n_tokens,
       |        len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.enStops)})) AS stop_hits
       |      FROM t)
       |SELECT doc_id, CAST(n_chars AS INT) AS n_chars, CAST(n_tokens AS INT) AS n_tokens,
       |  ROUND(CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens, 6) AS avg_token_len,
       |  ROUND(CAST(stop_hits AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
       |  ROUND(0.5 * LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
       |        + 0.5 * (CAST(stop_hits AS DOUBLE) / n_tokens), 6) AS quality_score
       |FROM f ORDER BY doc_id""") { c =>
    val toks = Text.tokens(col("text"))
    val base = c.documents.select(col("doc_id"),
      length(col("text")).cast(IntegerType).as("n_chars"),
      size(toks).as("n_tokens"),
      Text.hitCount(toks, Text.enStops).as("stop_hits"))
    val nTok = col("n_tokens").cast(DoubleType)
    val ratio = col("stop_hits").cast(DoubleType) / nTok
    base.select(col("doc_id"), col("n_chars"), col("n_tokens"),
        round((col("n_chars").cast(DoubleType) - nTok + 1.0) / nTok, 6)
          .as("avg_token_len"),
        round(ratio, 6).as("stopword_ratio"),
        round(lit(0.5) * least(lit(1.0), nTok / 100.0) + lit(0.5) * ratio, 6)
          .as("quality_score"))
      .orderBy("doc_id")
  }

  // x03 — token counting: whitespace + a BPE-ish regex segmentation
  val x03: Q = q("x03_token_count",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS INT) AS re_tokens
      |FROM documents ORDER BY doc_id""") { c =>
    c.documents.select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))).as("re_tokens"))
      .orderBy("doc_id")
  }

  // x05 — corpus n-gram statistics: document frequency of bigrams
  // (the inverted-index building block; top-k by DF with a total
  // tiebreak). Explode → two hash aggregations; the final top-20 is
  // driver-bounded output, not driver-side compute.
  val x05: Q = q("x05_ngram_stats",
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)),
      |         i -> t[i] || ' ' || t[i+1]))) AS bigram
      |       FROM toks WHERE len(t) >= 2),
      |df AS (SELECT bigram, COUNT(*) AS doc_freq FROM bg GROUP BY bigram)
      |SELECT bigram, doc_freq FROM df
      |ORDER BY doc_freq DESC, bigram LIMIT 20""") { c =>
    val sh = c.documents
      .select(col("doc_id"),
        explode(array(Text.tokens(col("text")))).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(Text.shingles(col("toks"), 2))).as("bigram"))
    sh.groupBy("bigram")
      .agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("bigram"))
      .limit(20)
  }

  // x20 — the Gopher quality rule set (Rae et al. 2021, appendix A —
  // the canonical pre-training document filter): word-count bounds,
  // mean-word-length band, alphabetic-word fraction floor, and the
  // ≥2-stopwords presence rule, each reported per doc plus the
  // conjunction. One projection scan; every rule is a higher-order
  // array expression over ONE tokenization (no per-rule re-split), so
  // the whole battery is a single codegen'd pass — at 100 TB quality
  // filtering is scan-bound and this shape keeps it that way.
  // Dial note: the registered stopword list swaps Gopher's 'be' for
  // 'a' so the presence rule stays live on the synthetic corpus; the
  // bounds are Gopher's.
  /** The x20 battery in its PRODUCTION form: one codegen'd projection
    * pass, NO global sort (the registered entry's orderBy exists only
    * so the oracle diff is deterministic — at 10× the sort was the
    * superlinear term in the r14 probe; quality filtering at 100 TB
    * is scan-bound and emits in scan order).
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val nWords = size(t)
    val sumLen = aggregate(transform(t, w => length(w)), lit(0), (a, x) => a + x)
    val meanLen = sumLen.cast(DoubleType) / nWords
    val alphaFrac = size(filter(t, w => w.rlike("^[a-z]+$"))).cast(DoubleType) / nWords
    val stops = array(Seq("the", "a", "to", "of", "and", "that", "have", "with")
      .map(lit): _*)
    val hits = size(array_intersect(array_distinct(t), stops))
    docs.select(col("doc_id"),
      nWords.cast(LongType).as("n_words"),
      round(meanLen, 4).as("mean_word_len"),
      round(alphaFrac, 4).as("alpha_frac"),
      hits.cast(IntegerType).as("stopword_hits"),
      (nWords.between(50, 100000) && meanLen.between(3.0, 10.0) &&
        alphaFrac >= 0.8 && hits >= 2).as("pass"))
  }

  val x20: Q = q("x20_gopher_rules",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
      |SELECT doc_id,
      |  CAST(len(t) AS BIGINT) AS n_words,
      |  ROUND(CAST(list_sum(list_transform(t, w -> len(w))) AS DOUBLE) / len(t), 4) AS mean_word_len,
      |  ROUND(CAST(len(list_filter(t, w -> regexp_matches(w, '^[a-z]+$'))) AS DOUBLE) / len(t), 4) AS alpha_frac,
      |  CAST(len(list_intersect(list_distinct(t), ['the','a','to','of','and','that','have','with'])) AS INT) AS stopword_hits,
      |  (len(t) BETWEEN 50 AND 100000
      |   AND CAST(list_sum(list_transform(t, w -> len(w))) AS DOUBLE) / len(t) BETWEEN 3 AND 10
      |   AND CAST(len(list_filter(t, w -> regexp_matches(w, '^[a-z]+$'))) AS DOUBLE) / len(t) >= 0.8
      |   AND len(list_intersect(list_distinct(t), ['the','a','to','of','and','that','have','with'])) >= 2) AS pass
      |FROM toks ORDER BY doc_id""") { c =>
    // the orderBy is the ORACLE HARNESS's determinism, not the
    // operator's — gopherRules is the production form
    gopherRules(c.documents).orderBy("doc_id")
  }

  // x21 — character-entropy quality signal (the C4/MassiveText
  // gibberish screen): per-doc Shannon entropy of the character
  // unigram distribution, in nats — encoding junk, key-mash, and
  // repeated-char padding score far below real prose (~2.9), and the
  // signal is tokenizer-free so it runs before any tokenization
  // stage. Plan: one explode scan + two map-side-combined hash aggs
  // (the x12 shape), nothing corpus-wide. Cross-engine determinism:
  // Σ cnt·ln(cnt) is a double sum whose value depends on group
  // order, so both engines sum the 2^40-SCALED TRUNCATED INTEGER
  // terms (the s04 codebook trick) — order-free exact longs — and
  // convert to double once at the end. (Long headroom caps docs at
  // ~500 KB of text; shard larger docs before profiling.)
  val x21: Q = q("x21_char_entropy",
    """WITH ch AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(lower(text))+1),
      |           i -> substr(lower(text), i, 1))) AS ch FROM documents),
      |cnt AS (SELECT doc_id, ch, COUNT(*) AS cnt FROM ch GROUP BY doc_id, ch),
      |agg AS (SELECT doc_id,
      |    CAST(SUM(cnt) AS BIGINT) AS n_chars,
      |    CAST(COUNT(*) AS INT) AS n_distinct,
      |    CAST(SUM(CAST(trunc(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE)) * 1099511627776) AS BIGINT)) AS BIGINT) AS s
      |  FROM cnt GROUP BY doc_id)
      |SELECT doc_id, n_chars, n_distinct,
      |  ROUND(ln(CAST(n_chars AS DOUBLE)) - (CAST(s AS DOUBLE)/1099511627776)/n_chars, 6) AS entropy,
      |  (ROUND(ln(CAST(n_chars AS DOUBLE)) - (CAST(s AS DOUBLE)/1099511627776)/n_chars, 6) < 2.0) AS low_entropy
      |FROM agg ORDER BY doc_id""") { c =>
    val scale = 1099511627776L // 2^40
    val chars = c.documents.select(col("doc_id"),
        explode(split(lower(col("text")), "")).as("ch"))
      .filter(col("ch") =!= "")
    val cd = col("cnt").cast(DoubleType)
    val term = (cd * log(cd) * lit(scale.toDouble)).cast(LongType)
    val agg = chars.groupBy("doc_id", "ch")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").cast(LongType).as("n_chars"),
        count(lit(1)).cast(IntegerType).as("n_distinct"),
        sum(term).as("s"))
    val ent = round(log(col("n_chars").cast(DoubleType)) -
      (col("s").cast(DoubleType) / scale.toDouble) / col("n_chars"), 6)
    agg.select(col("doc_id"), col("n_chars"), col("n_distinct"),
        ent.as("entropy"), (ent < 2.0).as("low_entropy"))
      .orderBy("doc_id")
  }

  // x06 — the FILTER stage of a training-data pipeline: combine the
  // lang-ID and quality signals into a per-doc keep/drop decision
  // (predicted language must match the labeled one AND the quality
  // score must clear a floor), reported as per-(lang, source) keep
  // rates — the dashboard a data-curation run actually reads. Both
  // engines compute the score with identical double arithmetic, so
  // the >= threshold compare is deterministic.
  val x06: Q = q("x06_quality_filter",
    s"""WITH t AS (SELECT doc_id, lang, source, string_split(lower(text), ' ') AS toks FROM documents),
       |h AS (SELECT doc_id, lang, source,
       |  len(toks) AS n_tokens,
       |  len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.enStops)})) AS en_hits,
       |  len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.esStops)})) AS es_hits,
       |  len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.deStops)})) AS de_hits,
       |  len(list_filter(toks, x -> x IN ${SharedSql.inList(Text.frStops)})) AS fr_hits
       |FROM t),
       |d AS (SELECT lang, source,
       |  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
       |       WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
       |       WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang,
       |  0.5 * LEAST(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
       |    + 0.5 * (CAST(en_hits AS DOUBLE) / n_tokens) AS score
       |FROM h)
       |SELECT lang, source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN pred_lang = lang AND score >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  ROUND(CAST(SUM(CASE WHEN pred_lang = lang AND score >= 0.3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS keep_rate
       |FROM d GROUP BY lang, source ORDER BY lang, source""") { c =>
    val toks = Text.tokens(col("text"))
    val h = c.documents.select(col("doc_id"), col("lang"), col("source"),
      size(toks).as("n_tokens"),
      Text.hitCount(toks, Text.enStops).as("en_hits"),
      Text.hitCount(toks, Text.esStops).as("es_hits"),
      Text.hitCount(toks, Text.deStops).as("de_hits"),
      Text.hitCount(toks, Text.frStops).as("fr_hits"))
    val nTok = col("n_tokens").cast(DoubleType)
    val score = lit(0.5) * least(lit(1.0), nTok / 100.0) +
      lit(0.5) * (col("en_hits").cast(DoubleType) / nTok)
    val keep = (Text.predLang(col("en_hits"), col("es_hits"),
      col("de_hits"), col("fr_hits")) === col("lang")) && score >= 0.3
    val kept = sum(when(keep, 1).otherwise(0)).cast(LongType)
    h.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), kept.as("n_keep"),
        round(kept.cast(DoubleType) / count(lit(1)), 6).as("keep_rate"))
      .orderBy("lang", "source")
  }

  // x07 — per-language corpus profile: doc counts, token volume, char
  // length distribution (exact median — percentile() in Spark is the
  // exact interpolated quantile, = DuckDB quantile_cont), source
  // diversity. The profiling pass a curation run uses to weight
  // language mixes.
  val x07: Q = q("x07_corpus_stats",
    """WITH t AS (SELECT lang, source, length(text) AS n_chars,
      |             len(string_split(text, ' ')) AS n_tokens FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars,
      |  ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS median_chars,
      |  CAST(MIN(n_chars) AS INT) AS min_chars, CAST(MAX(n_chars) AS INT) AS max_chars,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM t GROUP BY lang ORDER BY lang""") { c =>
    c.documents
      .select(col("lang"), col("source"),
        length(col("text")).cast(IntegerType).as("n_chars"),
        size(split(col("text"), " ")).as("n_tokens"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast(LongType).as("total_tokens"),
        round(avg(col("n_chars").cast(DoubleType)), 6).as("avg_chars"),
        round(expr("percentile(cast(n_chars as double), 0.5)"), 6).as("median_chars"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
        countDistinct("source").as("n_sources"))
      .orderBy("lang")
  }

  // x08 — TF-IDF top terms per document: term frequency × smoothed
  // inverse document frequency (the classic corpus-weighting step a
  // curation/retrieval pipeline runs before keyword filters or sparse
  // retrieval). Two hash aggregations + one broadcast of the 1-row
  // corpus count; the rank<=3 filter sits directly above one window,
  // so Spark's rank-limit pushdown (WindowGroupLimit) bounds it
  // map-side. Ordering ties break on the term, and both engines
  // compute the same double `tf * ln((n+1)/(df+1))`, so the top-3 cut
  // is deterministic.
  val x08: Q = q("x08_tfidf",
    """WITH toks AS (SELECT doc_id, t AS term FROM
      |         (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents)
      |       WHERE t <> ''),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfr.df,
      |        tf.tf * LN((n.n_docs + 1.0) / (dfr.df + 1.0)) AS raw
      |      FROM tf JOIN dfr USING (term), n),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY raw DESC, term) AS rank FROM s)
      |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, ROUND(raw, 6) AS tfidf
      |FROM r WHERE rank <= 3 AND doc_id < 100 ORDER BY doc_id, rank""") { c =>
    val toks = c.documents
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
    // frozen: the DF table and the scoring join both consume the term
    // frequencies — 2 corpus re-tokenizations pre-freeze
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = c.documents.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("raw",
        col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)))
    val w = Window.partitionBy("doc_id").orderBy(col("raw").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3 && col("doc_id") < 100)
      .select(col("doc_id"), col("rank").cast(IntegerType).as("rank"),
        col("term"), col("tf"), col("df"), round(col("raw"), 6).as("tfidf"))
      .orderBy("doc_id", "rank")
  }

  // x09 — PII scrubbing: email/phone/IPv4 redaction with per-doc
  // counts. The corpus carries no PII, so each doc gets a
  // deterministic doc_id-derived payload appended FIRST — both engines
  // compute the identical injection, then the identical scrub, so the
  // replacement logic itself (not just a no-op pass) is hash-gated.
  // Patterns stay in the Java-regex ∩ RE2 common subset.
  private val emailPat = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  private val phonePat = """\b\d{3}-\d{4}\b"""
  private val ipPat = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  val x09: Q = q("x09_pii_scrub",
    s"""WITH inj AS (SELECT doc_id,
       |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
       |  '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
       |  ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR) AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$emailPat')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$phonePat')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(regexp_replace(t, '$emailPat', '<EMAIL>', 'g'), '$ipPat')) AS BIGINT) AS n_ips,
       |  regexp_replace(regexp_replace(regexp_replace(t,
       |    '$emailPat', '<EMAIL>', 'g'), '$phonePat', '<PHONE>', 'g'),
       |    '$ipPat', '<IP>', 'g') AS scrubbed
       |FROM inj ORDER BY doc_id""") { c =>
    val inj = c.documents.select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com or 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" ip 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), (col("doc_id") % 100).cast("string")).as("t"))
    val noEmail = regexp_replace(col("t"), emailPat, "<EMAIL>")
    inj.select(col("doc_id"),
        regexp_count(col("t"), lit(emailPat)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(phonePat)).cast("long").as("n_phones"),
        // count IPs after the email scrub: 'user10.0.0.7@…' digit runs
        // must not double-count (the scrub order the replace chain uses)
        regexp_count(noEmail, lit(ipPat)).cast("long").as("n_ips"),
        regexp_replace(regexp_replace(noEmail,
          phonePat, "<PHONE>"), ipPat, "<IP>").as("scrubbed"))
      .orderBy("doc_id")
  }

  // x10 — corpus mixing: per-source sampling rates (the data-mixing
  // step before pretraining: upweight rare sources, downsample
  // dominant ones). The keep rule is pure integer arithmetic on
  // (doc_id, source), so the sample is reproducible on any engine and
  // any cluster size — no RNG state, no per-partition seeds.
  val x10: Q = q("x10_corpus_mix",
    """WITH rated AS (SELECT source, doc_id, text,
      |  20 + (CAST(substr(source, 4) AS INT) * 7) % 80 AS rate FROM documents)
      |SELECT source, MAX(rate) AS rate, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN doc_id % 100 < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN doc_id % 100 < rate THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM rated GROUP BY source ORDER BY source""") { c =>
    val rated = c.documents
      .withColumn("rate",
        lit(20) + (expr("cast(substring(source, 4, 10) as int)") * 7) % 80)
      .withColumn("keep", pmod(col("doc_id"), lit(100)) < col("rate"))
    rated.groupBy("source").agg(
        max("rate").as("rate"),
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), size(split(col("text"), " ")).cast("long"))
          .otherwise(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  // x11 — sketch-based corpus profile: HyperLogLog++ distinct counts
  // and GK approximate quantiles per source. THE scale substitution
  // for x07's exact profile: exact COUNT(DISTINCT) shuffles every
  // distinct value and exact percentile sorts whole groups, while
  // both sketches are fixed-size mergeable state (~KB per group) with
  // map-side partial merge — at 100 TB this is the only viable
  // per-corpus cardinality/quantile profile. Rows-only: sketch
  // estimates are engine-specific by nature; LlmOpsSpec pins the
  // HLL estimate within rsd bounds of the exact distinct count and
  // the approximate quantiles within rank tolerance of exact
  // percentiles.
  val x11: Q = rowsOnly("x11_sketch_profile") { c =>
    val toks = c.documents.select(col("source"), col("n_chars"),
      explode(split(lower(col("text")), " ")).as("tok"))
    toks.groupBy("source")
      .agg(
        approx_count_distinct(col("tok"), rsd = 0.02).as("approx_vocab"),
        percentile_approx(col("n_chars"), array(lit(0.5), lit(0.9)),
          lit(1000)).as("chars_p50_p90"),
        count(lit(1)).as("n_tokens"))
      .select(col("source"), col("approx_vocab"),
        col("chars_p50_p90")(0).cast("long").as("chars_p50"),
        col("chars_p50_p90")(1).cast("long").as("chars_p90"),
        col("n_tokens"))
      .orderBy("source")
  }

  // x12 — repetition signals (the Gopher/RefinedWeb quality rules
  // that catch boilerplate and degenerate generations): per doc, the
  // fraction of bigram occurrences taken by the single most frequent
  // bigram, and the fraction that are repeats of an earlier bigram.
  // Two hash aggregations after one explode — (doc_id, bigram) then
  // doc_id, both map-side combined; no windows, no distinct-explode,
  // so the plan is the same two-shuffle shape at any corpus size.
  val x12: Q = q("x12_repetition",
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |         i -> t[i] || ' ' || t[i+1])) AS bigram
      |       FROM toks WHERE len(t) >= 2),
      |cnt AS (SELECT doc_id, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2),
      |agg AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
      |          MAX(n) AS mx, COUNT(*) AS n_distinct FROM cnt GROUP BY 1)
      |SELECT doc_id, CAST(n_bigrams AS INT) AS n_bigrams,
      |  ROUND(CAST(mx AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac,
      |  ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams, 6) AS dup_bigram_frac
      |FROM agg ORDER BY doc_id""") { c =>
    val bg = c.documents
      .select(col("doc_id"), explode(array(Text.tokens(col("text")))).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(Text.ngrams(col("toks"), 2)).as("bigram"))
    bg.groupBy("doc_id", "bigram").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum(col("n")).as("n_bigrams"), max(col("n")).as("mx"),
        count(lit(1)).as("n_distinct"))
      .select(col("doc_id"), col("n_bigrams").cast(IntegerType).as("n_bigrams"),
        round(col("mx").cast(DoubleType) / col("n_bigrams"), 6)
          .as("top_bigram_frac"),
        round(lit(1.0) - col("n_distinct").cast(DoubleType) / col("n_bigrams"), 6)
          .as("dup_bigram_frac"))
      .orderBy("doc_id")
  }

  // x13 — benchmark DECONTAMINATION: flag training documents that
  // share word n-grams with a held-out evaluation set (the standard
  // n-gram-overlap contamination check run before any LLM training
  // job; real corpora use 8-13-gram windows — this synthetic token
  // soup needs 4-grams for the planted near-dups to register, the
  // machinery is identical). Scale shape: the eval side is always
  // benchmark-sized, so its distinct-shingle set BROADCASTS and the
  // train-side shingle stream never shuffles — one broadcast hash
  // join plus a doc_id hash agg, no matter how large the corpus.
  val x13: Q = q("x13_decontamination",
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |g AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-2),
      |        i -> array_to_string(t[i:i+3], ' ')))) AS g4
      |      FROM toks WHERE len(t) >= 4),
      |ev AS (SELECT DISTINCT g4 FROM g WHERE doc_id < 20)
      |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM g JOIN ev USING (g4) WHERE g.doc_id >= 20
      |GROUP BY g.doc_id ORDER BY g.doc_id""") { c =>
    val g = c.documents
      .select(col("doc_id"),
        explode(array(Text.tokens(col("text")))).as("toks"))
      .filter(size(col("toks")) >= 4)
      .select(col("doc_id"),
        explode(Text.shingles(col("toks"), 4)).as("g4"))
    val ev = g.filter(col("doc_id") < 20).select("g4").distinct()
    g.filter(col("doc_id") >= 20)
      .join(broadcast(ev), "g4")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("doc_id")
  }

  // x31 — FUZZY DECONTAMINATION (Dedup.fuzzyContamination — the
  // GPT-3/LLaMA-style near-dup check against eval sets): x13 flags
  // VERBATIM 4-gram leakage; this flags the paraphrased / partially
  // edited leakage exact matching misses, via the portable
  // MinHash-LSH family run BIPARTITE corpus × eval — the eval side's
  // band rows broadcast (eval sets are KB-to-MB at any corpus
  // scale), the corpus pays d02's one map-side shingle+signature
  // pass, and only bucket collisions reach the exact-Jaccard verify.
  // Same md5-portable family as d02, so the oracle reproduces the
  // EXACT candidate set and every (doc, eval, jaccard) row
  // hash-compares.
  val x31: Q = q("x31_fuzzy_decontam",
    s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |shs AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)-1),
      |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
      |       FROM toks WHERE len(t) >= 3),
      |sh AS (SELECT DISTINCT doc_id,
      |         CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS shingle FROM shs),
      |hv AS (SELECT doc_id, shingle % 2147483647 AS h31 FROM sh),
      |sig AS (SELECT doc_id, ${DedupQueries.d02SigAggs} FROM hv GROUP BY doc_id),
      |bk AS (${DedupQueries.d02BandSelects}),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS eval_id
      |         FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
      |          AND a.doc_id >= 20 AND b.doc_id < 20),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.doc_id, c.eval_id, COUNT(*) AS i
      |          FROM cand c
      |          JOIN sh a ON a.doc_id = c.doc_id
      |          JOIN sh b ON b.doc_id = c.eval_id AND b.shingle = a.shingle
      |          GROUP BY 1, 2)
      |SELECT i.doc_id, i.eval_id, ROUND(CAST(i.i AS DOUBLE)/(sa.n + sb.n - i.i), 6) AS jaccard
      |FROM inter i JOIN sizes sa ON i.doc_id = sa.doc_id
      |JOIN sizes sb ON i.eval_id = sb.doc_id
      |WHERE CAST(i.i AS DOUBLE)/(sa.n + sb.n - i.i) >= 0.5
      |ORDER BY i.doc_id, i.eval_id""") { c =>
    Dedup.fuzzyContamination(
        c.documents.filter(col("doc_id") >= 20),
        c.documents.filter(col("doc_id") < 20), n = 3, threshold = 0.5)
      .orderBy("doc_id", "eval_id")
  }

  // x14 — deterministic TRAIN/VAL holdout split: a document's split is
  // a pure function of its id (first two hex chars of md5(doc_id) —
  // 256 buckets, the 26 below '1a' ≈ 10.2% become 'val'), so the
  // assignment survives reshards, reruns, and engine swaps where an
  // RNG-based split leaks val docs into train. This is the standard
  // leakage-safe holdout mechanism for corpus pipelines. Scale shape:
  // one projection + one map-side-combined hash agg over the doc
  // scan; no shuffle larger than the (split × lang) grid.
  val x14: Q = q("x14_hash_split",
    """WITH s AS (
      |  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
      |              THEN 'val' ELSE 'train' END AS split,
      |         lang, n_chars
      |  FROM documents)
      |SELECT split, lang, COUNT(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""") { c =>
    c.documents
      .withColumn("split",
        when(substring(md5(col("doc_id").cast("string").cast("binary")),
            1, 2) < "1a", "val")
          .otherwise("train"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      .orderBy("split", "lang")
  }

  // x15 — PERPLEXITY-proxy quality scoring (the CCNet filter: docs
  // are ranked by language-model perplexity; docs the model finds
  // improbable are noise, boilerplate, or wrong-language). Here the
  // bigram LM is trained on the corpus ITSELF in the same job —
  // add-one smoothed P(w2|w1) from corpus counts — so the score is a
  // self-contained "how typical of this corpus is this document"
  // signal; swapping in an external pre-trained model only changes
  // where the count table comes from. log_ppl = mean −ln P ( =
  // ln(perplexity) ), lower is better. Scale shape: two map-side-
  // combined hash aggs build the model, the scoring pass is ONE
  // equi-join of the bigram stream against the model (shuffle on the
  // bigram key), vocab is a 1-row broadcast, no windows. LN crosses
  // the engine boundary per-row with ROUND(,6) on the per-doc mean —
  // the x08 idf discipline.
  val x15: Q = q("x15_perplexity",
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, unnest(range(1, len(t))) AS i, t FROM toks WHERE len(t) >= 2),
      |b AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram, t[i] AS w1 FROM bg),
      |cb AS (SELECT bigram, COUNT(*) AS cb FROM b GROUP BY 1),
      |cu AS (SELECT w1, COUNT(*) AS cu FROM b GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT tk) AS v FROM
      |        (SELECT unnest(t) AS tk FROM toks) WHERE tk <> ''),
      |s AS (SELECT b.doc_id, LN((cb.cb + 1.0) / (cu.cu + v.v)) AS logp
      |      FROM b JOIN cb USING (bigram) JOIN cu USING (w1), v)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  ROUND(-SUM(logp) / COUNT(*), 6) AS log_ppl
      |FROM s GROUP BY 1 ORDER BY doc_id""") { c =>
    val toksD = c.documents
      .select(col("doc_id"), explode(array(Text.tokens(col("text")))).as("toks"))
      .filter(size(col("toks")) >= 2)
    // frozen: the bigram stream trains BOTH model tables and is then
    // scored against them — 3 corpus re-tokenizations pre-freeze
    // (Explain --execute audit). Kept at occurrence level (not
    // pre-counted) so the per-doc -Σ logp is term-for-term the
    // oracle's sum, not a cnt·logp reweighting with different
    // floating-point association.
    val bg = toksD.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(
            concat_ws(" ", slice(col("toks"), i, lit(2))).as("bigram"),
            element_at(col("toks"), i).as("w1")))).as("b"))
      .select(col("doc_id"), col("b.bigram").as("bigram"), col("b.w1").as("w1"))
      .localCheckpoint(true)
    val cb = bg.groupBy("bigram").agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = c.documents
      .select(explode(Text.tokens(col("text"))).as("tk"))
      .filter(col("tk") =!= "")
      .agg(countDistinct(col("tk")).as("v"))
    bg.join(cb, "bigram").join(cu, "w1").crossJoin(broadcast(vocab))
      .withColumn("logp", log((col("cb") + 1.0) / (col("cu") + col("v"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(col("logp")) / count(lit(1)), 6).as("log_ppl"))
      .orderBy("doc_id")
  }

  // x04 — document fingerprint: md5 of the canonicalized text
  val x04: Q = q("x04_fingerprint",
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
      |FROM documents ORDER BY doc_id""") { c =>
    c.documents.select(col("doc_id"),
        Text.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  // x16 — sequence PACKING (GPT-style concat-and-chunk): documents
  // laid end-to-end in doc_id order, sliced into fixed 1024-token
  // training sequences, reported per sequence. The global token
  // offset is a corpus-wide prefix sum — computed with the TWO-PHASE
  // parallel scan (range partition → config-sized partition totals →
  // broadcast offsets → per-partition windows), NOT the naive global
  // window that would serialize onto one partition
  // (operators/Packing.scala).
  val x16: Q = q("x16_sequence_packing",
    """WITH t AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tok FROM documents),
      |o AS (SELECT doc_id, n_tok,
      |        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
      |      FROM t),
      |e AS (SELECT doc_id, unnest(range(tok_start // 1024,
      |               (tok_start + n_tok - 1) // 1024 + 1)) AS seq_id
      |      FROM o WHERE n_tok > 0)
      |SELECT seq_id, COUNT(*) AS n_docs,
      |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
      |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
      |FROM e GROUP BY 1 ORDER BY seq_id""") { c =>
    Packing.pack(c.documents, seqLen = 1024)
  }

  // x18 — token-budget sampling: build a training mix by taking each
  // source's docs in deterministic hash order until a per-source
  // token budget fills (how a mix spec "N tokens of web, M of code"
  // is actually materialized; the hash order IS the reproducible
  // shuffle). Semantically a per-source running-sum cutoff — but a
  // global per-source window would sort a whole source (50 TB of web)
  // on one key, so it runs as a TWO-PHASE prefix sum like x16's
  // packing: (1) one hash agg computes token sums for 256 md5-prefix
  // buckets, a 256-row-per-source window turns them into bucket start
  // offsets, and buckets starting past the budget are PRUNED before
  // any sort; (2) the within-bucket running sum (window over ~n/256
  // rows) is offset by the broadcast bucket starts. Identical output
  // to the one-window form the oracle states, at 1/256th the sort.
  val x18: Q = q("x18_token_budget_sample",
    """WITH t AS (SELECT source, doc_id,
      |             len(string_split(text, ' ')) AS n_tok,
      |             md5(CAST(doc_id AS VARCHAR)) AS hk
      |           FROM documents),
      |c AS (SELECT source, doc_id, n_tok,
      |        SUM(n_tok) OVER (PARTITION BY source ORDER BY hk, doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      |      FROM t)
      |SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
      |       CAST(cum_tokens AS BIGINT) AS cum_tokens
      |FROM c WHERE cum_tokens <= 800 ORDER BY source, doc_id""") { c =>
    val budget = 800L
    // frozen: the bucket-sum pass and the main join both consume the
    // tokenized frame — without the freeze each re-tokenizes the
    // corpus (Explain --audit: 2 fileScans). Only 4 narrow columns
    // materialize; the text never leaves the first scan.
    val toks = c.documents.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      md5(col("doc_id").cast("string").cast("binary")).as("hk"))
      .withColumn("bucket", substring(col("hk"), 1, 2))
      .localCheckpoint(true)
    val wB = Window.partitionBy("source").orderBy("bucket")
    val starts = toks.groupBy("source", "bucket")
      .agg(sum("n_tok").as("btok"))
      .withColumn("bstart", sum("btok").over(wB) - col("btok"))
      .filter(col("bstart") < budget)
      .select("source", "bucket", "bstart")
    val wIn = Window.partitionBy("source", "bucket")
      .orderBy("hk", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(starts), Seq("source", "bucket"))
      .withColumn("cum_tokens", col("bstart") + sum("n_tok").over(wIn))
      .filter(col("cum_tokens") <= budget)
      .select("source", "doc_id", "n_tok", "cum_tokens")
      .orderBy("source", "doc_id")
  }

  // p01 — the curation PIPELINE end-to-end: exact dedup → quality
  // filter → leakage-safe holdout split → per-(split, lang) corpus
  // accounting, composed from the registered operators' own building
  // blocks (d01 keep-first, x02 token/stopword features, x14 hash
  // split) in ONE dataflow — the shape an actual pre-training data
  // run has, and the proof the operator blocks compose without
  // driver-side glue. Scale shape: dedup is one hash agg on the
  // content digest; the feature filter is a projection; the survivor
  // join is an equi-join on doc_id; the report is one map-side hash
  // agg. Nothing materializes between stages.
  // x17 — DSIR-style importance weighting (Xie et al. 2023, "Data
  // Selection for Language Models via Importance Resampling"): score
  // each document by how much more likely its hashed-bigram features
  // are under a TARGET distribution (here the 'en' slice) than under
  // the raw corpus — importance = Σ_b cnt_doc[b]·(ln p_tgt[b] −
  // ln p_raw[b]) with add-one smoothing over B=256 md5 buckets (the
  // same first-two-hex-chars bucket rule as x14, identical in both
  // engines). Selection then resamples by weight; the weight table is
  // the operator. Scale shape: one shuffle on (doc, bucket), then the
  // ≤256-row bucket model BROADCASTS to both the totals and the
  // per-doc scoring join — the corpus is never shuffled again, the
  // model never leaves the plan. ROUND(,6) absorbs double-sum
  // association differences (x08/x15 discipline; ≤256 terms/doc).
  val x17: Q = q("x17_importance_weights",
    """WITH toks AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, lang,
      |         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
      |       FROM toks WHERE len(t) >= 2),
      |bk AS (SELECT doc_id, lang, substr(md5(bigram), 1, 2) AS b FROM bg),
      |db AS (SELECT doc_id, b, COUNT(*) AS cnt FROM bk GROUP BY 1, 2),
      |raw AS (SELECT b, COUNT(*) AS rc FROM bk GROUP BY 1),
      |tgt AS (SELECT b, COUNT(*) AS tc FROM bk WHERE lang = 'en' GROUP BY 1),
      |tot AS (SELECT (SELECT COUNT(*) FROM bk) AS tr,
      |               (SELECT COUNT(*) FROM bk WHERE lang = 'en') AS tt),
      |w AS (SELECT raw.b,
      |        ln((COALESCE(tc, 0) + 1.0) / (tt + 256.0))
      |          - ln((rc + 1.0) / (tr + 256.0)) AS lnw
      |      FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot)
      |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
      |       ROUND(SUM(cnt * lnw), 6) AS importance
      |FROM db JOIN w USING (b) GROUP BY doc_id ORDER BY doc_id""") { c =>
    val bk = c.documents
      .select(col("doc_id"), col("lang"),
        explode(Text.ngrams(Text.tokens(col("text")), 2)).as("bigram"))
      .select(col("doc_id"), col("lang"),
        substring(md5(col("bigram").cast("binary")), 1, 2).as("b"))
    // ONE corpus explode + ONE (doc, bucket) shuffle feeds everything.
    // The per-doc aggregate is frozen (eager localCheckpoint — the
    // Packing/Ntile multi-consumer discipline) because its two
    // consumers (scoring join, bucket model) otherwise each re-derive
    // the full tokenize+explode: ReuseExchange does NOT unify them —
    // the scoring branch carries a join-key null filter the model
    // branch lacks, so the exchanges are not canonically equal
    // (verified on the executed plan, which showed three corpus
    // scans pre-freeze). At warehouse scale this materialization is
    // "write the (doc, bucket) count table once, aggregate it twice".
    // lang rides along — functionally dependent on doc_id, the group
    // count is unchanged.
    val db0 = bk.groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // corpus/target totals via an unpartitioned window over the bucket
    // model — 256 rows by construction (bounded by the hash width, not
    // the data), so the single partition is safe; this replaces a
    // third corpus-scanning totals branch
    val wTot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val w = db0.groupBy("b").agg(
        sum("cnt").as("rc"),
        sum(when(col("lang") === "en", col("cnt")).otherwise(0L)).as("tc"))
      .select(col("b"),
        (log((col("tc") + 1.0) / (sum("tc").over(wTot) + 256.0))
          - log((col("rc") + 1.0) / (sum("rc").over(wTot) + 256.0))).as("lnw"))
    db0.join(broadcast(w), "b")
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_bigrams"),
        round(sum(col("cnt") * col("lnw")), 6).as("importance"))
      .orderBy("doc_id")
  }

  // x19 — BM25 relevance scoring (Robertson et al.; k1=1.2, b=0.75):
  // the retrieval-grade ranking function over the corpus — the
  // quality/curation sibling of x08's TF-IDF (BM25's tf saturation
  // and length normalization are what make it the default lexical
  // ranker). Plan shape: one projection scan for doc lengths (N and
  // avgdl fold to a 1-row broadcast), one explode scan filtered to
  // the query terms BEFORE any shuffle (the filter reaches the
  // Generate, so the per-token stream is query-terms-only however
  // wide the corpus), df is a ≤|terms|-row broadcast. The corpus
  // shuffles once, on (doc, term). idf uses the +1 form
  // ln(1 + (N−df+0.5)/(df+0.5)) — strictly positive, so stop-like
  // terms cannot flip sign (Lucene's choice). ROUND(,6) absorbs the
  // ≤3-element double-sum association (x08/x15 discipline).
  /** Raw BM25 leg shared by x19 and s07: per-doc (n_terms, bm25 sum)
    * for the given query terms — k1=1.2, b=0.75, the x19 dials.
    */
  private[queries] def bm25Frame(c: Catalog, terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    val dl = c.documents.select(col("doc_id"),
        size(Text.tokens(col("text"))).cast(LongType).as("dl"))
      .localCheckpoint(true)
    val corpus = dl.agg(count(lit(1)).as("n"),
      (sum("dl").cast(DoubleType) / count(lit(1))).as("avgdl"))
    val tf = c.documents
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfT = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val s = log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
      (col("tf") * 2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))
    tf.join(broadcast(dfT), "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpus))
      .select(col("doc_id"), s.as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("s").as("bm25"))
  }

  val x19: Q = q("x19_bm25",
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |dl AS (SELECT doc_id, len(t) AS dl FROM toks),
      |corpus AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf
      |       FROM (SELECT doc_id, unnest(t) AS w FROM toks)
      |       WHERE w IN ('spark', 'vector', 'merge') GROUP BY 1, 2),
      |df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
      |sc AS (SELECT doc_id,
      |         ln(1.0 + (n - df + 0.5)/(df + 0.5)) * (tf * 2.2) /
      |           (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))) AS s
      |       FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN corpus)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms, ROUND(SUM(s), 6) AS bm25
      |FROM sc GROUP BY doc_id ORDER BY doc_id""") { c =>
    // both derived frames inside bm25Frame feed TWO consumers (dl:
    // the scoring join + the (N, avgdl) fold; tf: the df branch + the
    // scoring join) — frozen once each (the d04/x17 multi-scan
    // discipline), so the corpus tokenizes exactly twice (one
    // projection pass, one term-filtered explode), never per consumer
    bm25Frame(c, Seq("spark", "vector", "merge"))
      .select(col("doc_id"), col("n_terms"), round(col("bm25"), 6).as("bm25"))
      .orderBy("doc_id")
  }

  // x22 — BPE tokenizer TRAINING (operators/Bpe.scala — Sennrich
  // ACL 2016): the corpus is read ONCE into a word-frequency dict,
  // then every merge iteration is a vocab-sized pair-count agg + a
  // 1-row argmax collect + a shuffle-free HOF fold — 100 TB of corpus
  // costs one tokenize pass, the 24 iterations cost the same as at
  // 1 GB. Output = the learned merge table (the tokenizer artifact a
  // training run ships). Rows-only: the iterative data-dependent
  // argmax is not SQL-expressible; LlmOpsSpec pins the merge sequence
  // against an independent single-node reference implementation and
  // train/serve segmentation agreement.
  val x22: Q = rowsOnly("x22_bpe_train") { c =>
    val merges = graft.operators.Bpe.train(c.documents, "text", nMerges = 24)
    c.spark.createDataFrame(merges)
      .select(col("rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"),
        col("pairCount").as("pair_count"))
      .orderBy("rank")
  }

  // x23 — UNICODE NORMALIZATION (plans/TextExpressions.NfcNormalize,
  // a native doGenCode Catalyst expression — Spark ships no
  // normalizer and a UDF would drop the corpus scan out of codegen):
  // crawled corpora mix composed and decomposed encodings of the
  // same text, so NFC + zero-width stripping is the mandatory FIRST
  // stage before any hash-based op (d01's digests, d04's shingles,
  // x13's decontamination all treat "é" and "e"+U+0301 as different
  // bytes). The entry plants both corruption classes
  // deterministically — combining acute after every 'e' on doc_id%7,
  // zero-width space after every 'o' on doc_id%11 — then cleans:
  // strip ZWSP/ZWNJ/ZWJ/BOM, NFC-compose. The planted classes prove
  // the two distinct behaviors: zero-width injection is fully
  // UNDONE (changed=false — byte-identical to the original), while
  // decomposition COMPOSES to different-but-canonical bytes
  // (changed=true). Gate: per-doc md5 of the cleaned text vs
  // DuckDB's own nfc_normalize — two independent NFC
  // implementations hash-agreeing on every row.
  val x23: Q = q("x23_text_normalize",
    """WITH p AS (
      |  SELECT doc_id, text,
      |    CASE WHEN doc_id % 7 = 0
      |      THEN regexp_replace(text, 'e', 'e' || chr(769), 'g')
      |      ELSE text END AS t1
      |  FROM documents),
      |p2 AS (
      |  SELECT doc_id, text,
      |    CASE WHEN doc_id % 11 = 0
      |      THEN regexp_replace(t1, 'o', 'o' || chr(8203), 'g')
      |      ELSE t1 END AS t2
      |  FROM p),
      |c AS (
      |  SELECT doc_id, text, nfc_normalize(regexp_replace(t2,
      |    '[' || chr(8203) || chr(8204) || chr(8205) || chr(65279) || ']',
      |    '', 'g')) AS clean
      |  FROM p2)
      |SELECT doc_id, CAST(LENGTH(clean) AS BIGINT) AS n_chars,
      |  md5(clean) AS content_hash, (clean <> text) AS changed
      |FROM c ORDER BY doc_id""") { c =>
    val perturbed = c.documents
      .withColumn("t", when(col("doc_id") % 7 === 0,
          regexp_replace(col("text"), "e", "e\u0301"))
        .otherwise(col("text")))
      .withColumn("t", when(col("doc_id") % 11 === 0,
          regexp_replace(col("t"), "o", "o\u200B"))
        .otherwise(col("t")))
    val clean = graft.plans.TextExpressions.nfcNormalize(
      regexp_replace(col("t"), "[\u200B\u200C\u200D\uFEFF]", ""))
    perturbed.select(col("doc_id"), col("text"), clean.as("clean"))
      .select(col("doc_id"),
        length(col("clean")).cast(LongType).as("n_chars"),
        md5(col("clean").cast(BinaryType)).as("content_hash"),
        (col("clean") =!= col("text")).as("changed"))
      .orderBy("doc_id")
  }

  // x24 — TRAINED text classifier (multinomial Naive Bayes over
  // hashed token buckets), the learned complement to x01's rule
  // heuristic and the shape of every fastText-style corpus filter
  // (CCNet's LM filter, FineWeb-Edu's quality classifier): train on
  // the LABELED slice, broadcast the model, score the unlabeled
  // corpus in one pass. The split is real — the model trains on
  // even-doc_id docs only and predicts the held-out odd half — and
  // because the synthetic corpus draws every lang's text from one
  // shared vocabulary (no natural signal; a classifier on the raw
  // text degenerates to the majority class), the entry PLANTS the
  // signal deterministically (x09/x23's injection discipline): three
  // per-lang marker tokens appended to every doc, so held-out
  // accuracy measures genuine generalization of the train/serve
  // machinery. Features are x17's 256 md5 buckets — the model is
  // (|classes| × 256) rows BY CONSTRUCTION, bounded by the hash
  // width, not the vocabulary. Training is two map-side-combined
  // hash aggs; inference is one broadcast equi-join on the bucket +
  // a per-(doc, class) sum — each corpus half shuffles once on
  // (doc, bucket) and never again; argmax per doc is a rank-limit
  // TopK (q23's pushdown), not a full sort. Cross-engine exactness:
  // every log-probability is a 2^40-scaled truncated BIGINT (x21's
  // trick), so scores are pure integer arithmetic — order-free,
  // tie-broken (score DESC, class ASC) identically everywhere.
  // Model persistence for serving reuses s09's train/serve split
  // unchanged (the weights are one small table).
  val x24: Q = q("x24_nb_classifier",
    """WITH marked AS (
      |  SELECT doc_id, lang,
      |    text || ' ' || repeat('xm' || lang || ' ', 3) AS text
      |  FROM documents),
      |tk AS (
      |  SELECT doc_id, lang, substr(md5(tok), 1, 2) AS b
      |  FROM (SELECT doc_id, lang,
      |          unnest(string_split(lower(text), ' ')) AS tok
      |        FROM marked)
      |  WHERE tok <> ''),
      |db AS (SELECT doc_id, lang, b, COUNT(*) AS cnt FROM tk GROUP BY 1, 2, 3),
      |tot AS (SELECT lang, SUM(cnt) AS tot FROM db WHERE doc_id % 2 = 0 GROUP BY 1),
      |cb AS (SELECT lang, b, SUM(cnt) AS cb FROM db WHERE doc_id % 2 = 0 GROUP BY 1, 2),
      |grid AS (
      |  SELECT t.lang, k.b,
      |    CAST(trunc(ln((COALESCE(cb.cb, 0) + 1.0) / (t.tot + 256.0))
      |      * 1099511627776) AS BIGINT) AS lnp
      |  FROM tot t
      |  CROSS JOIN (SELECT printf('%02x', i) AS b FROM range(256) r(i)) k
      |  LEFT JOIN cb ON cb.lang = t.lang AND cb.b = k.b),
      |pri AS (
      |  SELECT lang, CAST(trunc(ln(CAST(n_docs AS DOUBLE)
      |      / (SUM(n_docs) OVER ())) * 1099511627776) AS BIGINT) AS lpr
      |  FROM (SELECT lang, COUNT(*) AS n_docs FROM documents
      |        WHERE doc_id % 2 = 0 GROUP BY 1)),
      |sc AS (
      |  SELECT db.doc_id, db.lang AS actual, g.lang AS cls,
      |    SUM(db.cnt * g.lnp) AS s
      |  FROM db JOIN grid g USING (b)
      |  WHERE db.doc_id % 2 = 1 GROUP BY 1, 2, 3),
      |fin AS (
      |  SELECT doc_id, actual, cls,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY sc.s + pri.lpr DESC, cls) AS rn
      |  FROM sc JOIN pri ON pri.lang = sc.cls)
      |SELECT doc_id, cls AS pred_lang, actual AS lang,
      |  (cls = actual) AS correct
      |FROM fin WHERE rn = 1 ORDER BY doc_id""") { c =>
    val scale = 1099511627776L // 2^40
    val spark = c.documents.sparkSession
    val marked = c.documents.select(col("doc_id"), col("lang"),
      concat(col("text"), lit(" "),
        repeat(concat(lit("xm"), col("lang"), lit(" ")), 3)).as("text"))
    val tk = marked
      .select(col("doc_id"), col("lang"),
        explode(Text.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), col("lang"),
        substring(md5(col("tok").cast(BinaryType)), 1, 2).as("b"))
    // the one corpus-sized artifact, frozen for its three consumers
    // (two training aggs over the even half, the odd-half scoring
    // join) — x17's multi-consumer freeze discipline
    val db0 = tk.groupBy("doc_id", "lang", "b")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val train = db0.filter(col("doc_id") % 2 === 0)
    val tot = train.groupBy("lang").agg(sum("cnt").as("tot"))
    val cb = train.groupBy("lang", "b").agg(sum("cnt").as("cb"))
    val buckets = spark.range(256)
      .select(format_string("%02x", col("id")).as("b"))
    val grid = tot.crossJoin(buckets)
      .join(cb, Seq("lang", "b"), "left")
      .select(col("lang"), col("b"),
        (log((coalesce(col("cb"), lit(0L)) + lit(1.0))
            / (col("tot") + lit(256.0)))
          * lit(scale.toDouble)).cast(LongType).as("lnp"))
    // class priors from labeled doc counts — a column-pruned scan
    val wTot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val pri = c.documents.filter(col("doc_id") % 2 === 0)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .select(col("lang"),
        (log(col("n_docs").cast(DoubleType)
            / sum(col("n_docs")).over(wTot))
          * lit(scale.toDouble)).cast(LongType).as("lpr"))
    val scored = db0.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang").as("actual"), col("b"), col("cnt"))
      .join(broadcast(grid.withColumnRenamed("lang", "cls")), "b")
      .groupBy("doc_id", "actual", "cls")
      .agg(sum(col("cnt") * col("lnp")).as("s"))
      .join(broadcast(pri.withColumnRenamed("lang", "cls")), "cls")
    val w = Window.partitionBy("doc_id")
      .orderBy((col("s") + col("lpr")).desc, col("cls"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cls").as("pred_lang"),
        col("actual").as("lang"), (col("cls") === col("actual")).as("correct"))
      .orderBy("doc_id")
  }

  // x25 — BPE tokenizer APPLY at corpus scale, the serve-side
  // complement of x22's training: the actual "tokenize 100 TB before
  // the training run" step. The tokenizer artifact is FROZEN — in
  // production a tokenizer is trained once and applied to every
  // corpus snapshot thereafter, so the merge table here is a pinned
  // literal list (a well-formed BPE merge sequence over lowercase
  // chars + Sennrich's </w> sentinel), not something retrained per
  // run. Encoding is x22's OWN merge fold (Bpe.mergeFold — greedy
  // left-to-right, per word) nested per doc: transform over words,
  // one fold per merge in rank order — so serve-time segmentation is
  // the training code path by construction (LlmOpsSpec additionally
  // pins the nested form == the dict-level fold word-for-word; a
  // first-cut sequential string-replace formulation FAILED that spec
  // on "banana" — replace skips pair occurrences that share a
  // boundary symbol with the previous match, which is exactly the
  // divergence the parity spec exists to catch). The shape is the
  // point at 100 TB: tokenization is a PURE MAP — one projection per
  // doc, no explode, no shuffle, tokenizer as literals — and the
  // oracle re-implements the same fold independently in DuckDB
  // (list_reduce with a delimited-string accumulator: fusing appends
  // `b` to the accumulator's tail symbol; appending adds a delimited
  // symbol — last-symbol-equals-`a` iff the string ends with U+001F a),
  // so two independent BPE encoders must hash-agree on every doc's
  // full subword stream.
  val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "e" -> "</w>", "th" -> "e</w>", "i" -> "n", "a" -> "n",
    "r" -> "e", "o" -> "n", "e" -> "r", "er" -> "</w>", "in" -> "g",
    "ing" -> "</w>", "a" -> "t", "s" -> "</w>", "o" -> "r", "t" -> "i",
    "a" -> "l")

  /** Subword stream of `text` under [[bpeMerges]]: lower-cased
    * whitespace tokens stripped to letters, each split to chars +
    * `</w>` and folded through the merges in rank order
    * (Bpe.mergeFold nested inside a per-doc transform), flattened in
    * word order. Pure per-row expressions — no explode, no shuffle.
    */
  def bpeEncodeSubwords(text: Column): Column =
    flatten(transform(bpeWords(text), bpeWordFold(_)))

  /** Lower-cased whitespace tokens of `text` stripped to letters,
    * empties dropped — the ONE word definition both encode paths and
    * the oracle share.
    */
  private def bpeWords(text: Column): Column =
    filter(transform(split(lower(text), " "),
      t => regexp_replace(t, "[^a-z]", "")), w => w =!= "")

  /** One word through the full merge table: chars + `</w>` seed,
    * then Bpe.mergeFold per merge in rank order — the ONE fold both
    * the pure-map and dict-amortized paths share (the path-equality
    * spec pins them equal; a second copy could silently diverge).
    */
  private def bpeWordFold(w: Column): Column =
    bpeMerges.foldLeft(
      concat(split(w, ""), array(lit(Bpe.EndOfWord))): Column)(
      (syms, m) => Bpe.mergeFold(syms, m._1, m._2))

  /** The DuckDB mirror of the merge fold chain: each merge is one
    * `list_reduce` over the symbol list with a U+001F-delimited
    * STRING accumulator (DuckDB's reduce seeds from the first
    * element, so the accumulator must share the element type) —
    * `acc = 'a' OR ends_with(acc, sep || 'a')` recognizes the tail
    * symbol, fusing appends `b` directly (the merged symbol IS
    * a || b), otherwise the next symbol appends delimited;
    * `string_split` restores the list between merges.
    */
  private val x25Fold: String = {
    def step(inner: String, a: String, b: String) =
      s"string_split(list_reduce($inner, (acc, x) -> CASE WHEN " +
        s"(acc = '$a' OR ends_with(acc, chr(31) || '$a')) AND x = '$b' " +
        s"THEN acc || '$b' ELSE acc || chr(31) || x END), chr(31))"
    bpeMerges.foldLeft("syms0")((e, m) => step(e, m._1, m._2))
  }

  val x25: Q = q("x25_bpe_encode",
    s"""WITH w AS (
      |  SELECT doc_id, list_filter(list_transform(
      |      string_split(lower(text), ' '),
      |      t -> regexp_replace(t, '[^a-z]', '', 'g')), x -> x <> '') AS ws
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS i, ws FROM w),
      |s AS (
      |  SELECT doc_id, i, $x25Fold AS subs
      |  FROM (SELECT doc_id, i,
      |      list_append(list_transform(range(1, len(ws[i]) + 1),
      |        j -> substr(ws[i], j, 1)), '</w>') AS syms0
      |    FROM e)),
      |a AS (
      |  SELECT doc_id, SUM(len(subs)) AS n_subwords,
      |    string_agg(array_to_string(subs, ' '), ' ' ORDER BY i) AS stream
      |  FROM s GROUP BY doc_id)
      |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
      |  CAST(COALESCE(a.n_subwords, 0) AS BIGINT) AS n_subwords,
      |  md5(COALESCE(a.stream, '')) AS fingerprint
      |FROM w LEFT JOIN a ON w.doc_id = a.doc_id
      |ORDER BY w.doc_id""") { c =>
    // The corpus path amortizes the fold over the DICT, not the
    // stream (the first-cut per-occurrence nested fold measured
    // 56.8 s at sf0.1 — 14x the next-slowest entry — because HOF
    // folds evaluate interpreted, per word occurrence): segment each
    // DISTINCT word once (Heaps-law vocab, the same sub-linear
    // artifact x22 trains on), then join the segmented dict back to
    // the (doc, pos, word) stream and regroup per doc. This is the
    // production tokenizer-cache shape — at 100 TB the corpus pays
    // one explode + one dict equi-join (broadcast while the vocab
    // fits, sort-merge beyond) + one per-doc regroup, and the
    // interpreted fold runs only vocab-many times. The pure-map form
    // stays available as bpeEncodeSubwords; LlmOpsSpec pins the two
    // paths identical.
    val base = c.documents
      .select(col("doc_id"), bpeWords(col("text")).as("ws"))
      .localCheckpoint(true) // two consumers: token stream + doc base
    val toks = base.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("pos", "w")))
    val vocab = toks.select("w").distinct()
      .withColumn("subs", bpeWordFold(col("w")))
    val agg = toks.join(vocab, "w")
      .groupBy("doc_id")
      .agg(sum(size(col("subs"))).as("n_subwords"),
        md5(array_join(flatten(transform(
            sort_array(collect_list(struct(col("pos"), col("subs")))),
            s => s.getField("subs"))), " ").cast(BinaryType)).as("fp"))
    base.select(col("doc_id"), size(col("ws")).cast(LongType).as("n_words"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
        coalesce(col("fp"), md5(lit("").cast(BinaryType))).as("fingerprint"))
      .orderBy("doc_id")
  }

  // x26 — int8 SCALAR QUANTIZATION of the embedding column: the
  // serving-side compression step before ANN (4 bytes/dim → 1
  // byte/dim, the "SQ8" index most vector stores default to —
  // contrast s04's PRODUCT quantization, which learns centroids;
  // SQ8 is codebook-free and exact-affine). Two passes: (1) the
  // per-dimension corpus min/max — a map-side-combinable hash agg
  // that produces exactly DIM rows (dimension-sized, not
  // corpus-sized, the Ann.scala codebook-collect discipline); (2)
  // one scan that codes every component against the DIM (mn, span)
  // pairs rendered as LITERAL arrays — no broadcast, no second
  // shuffle, the corpus is read once per pass. Codes are exact
  // integers in both engines (the affine formula is identical IEEE
  // double arithmetic, floored), so code_sum/min/max hash-gate
  // bit-for-bit; the reconstruction error crosses the boundary with
  // ROUND(,6) over a 64-term sum (the x08/x15 double-sum
  // discipline). At 100 TB: pass 1 shuffles DIM×partitions partial
  // rows; pass 2 is shuffle-free — the plan you would deploy.
  private val x26Dim = 64
  val x26: Q = q("x26_scalar_quantize",
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |cx AS (SELECT vec_id, unnest(range(1, ${x26Dim + 1})) AS i, v FROM e),
      |c2 AS (SELECT vec_id, i, v[i] AS x FROM cx),
      |st AS (SELECT i, MIN(x) AS mn, MAX(x) - MIN(x) AS span FROM c2 GROUP BY i),
      |cd AS (SELECT vec_id, c2.i, x, mn, span,
      |         CASE WHEN span = 0 THEN 0
      |              ELSE LEAST(255, GREATEST(0, CAST(floor(((x - mn) * 255.0) / span + 0.5) AS INT))) END AS code
      |       FROM c2 JOIN st ON c2.i = st.i),
      |agg AS (SELECT vec_id,
      |          CAST(SUM(CAST(code AS BIGINT)) AS BIGINT) AS code_sum,
      |          MIN(code) AS code_min, MAX(code) AS code_max,
      |          SUM((x - (mn + (code * span) / 255.0)) * (x - (mn + (code * span) / 255.0))) AS se
      |        FROM cd GROUP BY vec_id)
      |SELECT vec_id, code_sum, CAST(code_min AS INT) AS code_min,
      |       CAST(code_max AS INT) AS code_max,
      |       ROUND(se / $x26Dim.0, 6) AS recon_mse
      |FROM agg ORDER BY vec_id""") { c =>
    val e = c.embeddings.select(col("vec_id"),
      Vectors.toDouble(col("embedding")).as("v"))
    // pass 1: per-dim stats — DIM rows, driver-bounded by the vector
    // width (the same bound Ann's k-sized codebook collects rely on)
    val stats = e.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("i").agg(min("x").as("mn"), (max("x") - min("x")).as("span"))
      .orderBy("i").collect()
    require(stats.length == x26Dim, s"embedding dim ${stats.length} != $x26Dim")
    val mnArr = array(stats.map(r => lit(r.getDouble(1))).toIndexedSeq: _*)
    val spArr = array(stats.map(r => lit(r.getDouble(2))).toIndexedSeq: _*)
    // pass 2: code each component against the literal (mn, span)
    // pairs — identical expression shape to the oracle's CASE
    val codes = transform(col("v"), (x, i) => {
      val mn = element_at(mnArr, i + 1)
      val span = element_at(spArr, i + 1)
      when(span === 0.0, lit(0)).otherwise(
        least(lit(255), greatest(lit(0),
          floor((x - mn) * lit(255.0) / span + lit(0.5)).cast(IntegerType))))
    })
    val se = aggregate(sequence(lit(0), lit(x26Dim - 1)), lit(0.0), (acc, i) => {
      val x = element_at(col("v"), i + 1)
      val mn = element_at(mnArr, i + 1)
      val span = element_at(spArr, i + 1)
      val dq = mn + (element_at(col("codes"), i + 1).cast(DoubleType) * span) / lit(255.0)
      acc + (x - dq) * (x - dq)
    })
    e.withColumn("codes", codes)
      .select(col("vec_id"),
        aggregate(col("codes"), lit(0L), (a, x) => a + x.cast(LongType)).as("code_sum"),
        aggregate(col("codes"), lit(255), (a, x) => least(a, x)).as("code_min"),
        aggregate(col("codes"), lit(0), (a, x) => greatest(a, x)).as("code_max"),
        round(se / lit(x26Dim.toDouble), 6).as("recon_mse"))
      .orderBy("vec_id")
  }

  // x27 — host-graph PAGERANK (link-graph centrality, the standing
  // web-corpus quality signal: Common-Crawl-style pipelines rank
  // hosts by centrality before fetching/filtering). The host graph
  // is synthesized deterministically from doc_id (the x09/x24
  // injection discipline — the corpus carries no URLs, so both
  // engines derive the identical edge list: src = doc_id mod H, two
  // affine out-links per doc, self-loops dropped, DISTINCT). The
  // iteration itself is operators/PageRank.ranks: SCALED-INTEGER
  // arithmetic (rank div outdeg per edge, damp with integer div) so
  // all 10 iterations are bit-for-bit reproducible in any engine —
  // no float enters the loop, the oracle below unrolls the same 10
  // iterations as SQL CTEs from the same constants. Workload class:
  // iterative graph (k joins over a frozen edge list with per-round
  // lineage truncation), which no other board entry exercises.
  // iteration count, host modulus, affine link jumps, fixed-point
  // scale — shared with w04's WAT link extraction and p08's
  // domain-rank curation (WebQueries), whose edge universe / rank
  // chain must BE this entry's; private[queries] so the container
  // front end, the rank consumer, and the pagerank entry cannot drift
  private[queries] val x27Iters = 10
  private[queries] val x27Hosts = 97
  private[queries] val x27Jump1: (Int, Int) = (31, 7)
  private[queries] val x27Jump2: (Int, Int) = (57, 13)
  private[queries] val x27Scale = 1000000000000L
  /** x27's oracle rank chain as reusable CTEs (final relation:
    * r{x27Iters} with (host, rank)) — shared by x27's own oracle and
    * p08's, so the composed curation cannot drift from the entry.
    */
  private[queries] def x27RankCtes: String = {
    val jump = 15L * x27Scale / 100L
    val base =
      s"""d AS (SELECT doc_id % $x27Hosts AS src,
         |  (doc_id * ${x27Jump1._1} + ${x27Jump1._2}) % $x27Hosts AS d1,
         |  (doc_id * ${x27Jump2._1} + ${x27Jump2._2}) % $x27Hosts AS d2 FROM documents),
         |edges AS (SELECT DISTINCT src, dst FROM
         |  (SELECT src, d1 AS dst FROM d UNION ALL SELECT src, d2 FROM d)
         |  WHERE src <> dst),
         |v AS (SELECT DISTINCT src AS host FROM edges),
         |e AS (SELECT edges.src, edges.dst FROM edges JOIN v ON edges.dst = v.host),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
         |r0 AS (SELECT host, CAST($x27Scale AS BIGINT) AS rank FROM v)""".stripMargin
    val its = (1 to x27Iters).map { i =>
      s"""r$i AS (SELECT v.host,
         |  CAST($jump + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM v LEFT JOIN
         |    (SELECT e.dst, CAST(SUM(r${i - 1}.rank // deg.outdeg) AS BIGINT) AS s
         |     FROM e JOIN r${i - 1} ON e.src = r${i - 1}.host
         |            JOIN deg ON e.src = deg.src
         |     GROUP BY e.dst) c ON v.host = c.dst)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$its"
  }
  private def x27Oracle: String =
    s"""WITH $x27RankCtes
       |SELECT host, rank AS pr_scaled,
       |  ROUND(CAST(rank AS DOUBLE) / $x27Scale, 6) AS pagerank
       |FROM r$x27Iters ORDER BY host""".stripMargin
  val x27: Q = q("x27_host_pagerank", x27Oracle) { c =>
    val d = c.documents.select(
      (col("doc_id") % x27Hosts).as("src"),
      ((col("doc_id") * x27Jump1._1 + x27Jump1._2) % x27Hosts).as("d1"),
      ((col("doc_id") * x27Jump2._1 + x27Jump2._2) % x27Hosts).as("d2"))
    val edges = d.select(col("src"), col("d1").as("dst"))
      .unionAll(d.select(col("src"), col("d2").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
    PageRank.ranks(edges, iters = x27Iters, scale = x27Scale)
      .select(col("host"), col("pr_scaled"),
        round(col("pr_scaled").cast(DoubleType) / lit(x27Scale.toDouble), 6)
          .as("pagerank"))
      .orderBy("host")
  }

  // ---------------------------------------------------------------
  // x28 — PMI COLLOCATIONS (pointwise mutual information over
  // adjacent bigrams — the classic collocation-extraction /
  // phrase-mining statistic, word2vec-preprocessing's phrase pass):
  // PMI(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) ) with bigram and
  // unigram probabilities from the same scan. Scale shape: TWO
  // map-side-combined hash aggregations (unigrams, bigrams — the
  // bigram stream is a NARROW transform/explode off one
  // tokenization, no self-join on token position), then the
  // vocab²-bounded bigram frame joins the vocab-bounded unigram
  // counts twice via BROADCAST — nothing after the aggregations is
  // corpus-sized. Determinism: PMI is one ln of exact-integer
  // ratios evaluated in the identical parenthesization both
  // engines, ROUND(,6) before ranking.
  val x28: Q = q("x28_pmi_collocations",
    """WITH toks AS (SELECT string_split(lower(text), ' ') AS t FROM documents),
      |uni AS (SELECT unnest(t) AS w FROM toks),
      |u AS (SELECT w, COUNT(*) AS c1 FROM uni WHERE w <> '' GROUP BY w),
      |nt AS (SELECT SUM(c1) AS n FROM u),
      |bg AS (SELECT unnest(list_transform(range(1, len(t)), i -> [t[i], t[i+1]])) AS pr
      |       FROM toks WHERE len(t) >= 2),
      |b AS (SELECT pr[1] AS w1, pr[2] AS w2, COUNT(*) AS c12 FROM bg
      |      WHERE pr[1] <> '' AND pr[2] <> '' GROUP BY 1, 2),
      |nb AS (SELECT SUM(c12) AS n FROM b),
      |p AS (SELECT w1, w2, c12,
      |    ROUND(ln((CAST(c12 AS DOUBLE) / nb.n)
      |      / ((CAST(u1.c1 AS DOUBLE) / nt.n) * (CAST(u2.c1 AS DOUBLE) / nt.n))), 6) AS pmi
      |  FROM b JOIN u u1 ON u1.w = b.w1 JOIN u u2 ON u2.w = b.w2, nt, nb
      |  WHERE c12 >= 5)
      |SELECT w1, w2, c12 AS n_pair, pmi, CAST(rn AS INT) AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS rn FROM p)
      |WHERE rn <= 50 ORDER BY rank""") { c =>
    val toks = c.documents.select(Text.tokens(col("text")).as("t"))
    // Totals derive from the vocab-sized count tables (SUM over u / b),
    // not separate corpus-wide COUNTs — two corpus scans total (one per
    // aggregation granularity), audited down from four.
    val uni = toks.select(explode(col("t")).as("w")).filter(col("w") =!= "")
    val u = uni.groupBy("w").agg(count(lit(1)).as("c1"))
      .localCheckpoint(true) // vocab-sized; 3 consumers (nt, two joins)
    val nt = u.agg(sum("c1").as("nt"))
    val bg = toks.filter(size(col("t")) >= 2)
      .select(explode(
        expr("transform(sequence(0, size(t)-2), i -> array(t[i], t[i+1]))")).as("pr"))
    val b0 = bg
      .filter(col("pr")(0) =!= "" && col("pr")(1) =!= "")
      .groupBy(col("pr")(0).as("w1"), col("pr")(1).as("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint(true) // vocab²-bounded; 2 consumers (nb, b)
    val nb = b0.agg(sum("c12").as("nb"))
    val b = b0.filter(col("c12") >= 5)
    val dbl = (x: Column) => x.cast(DoubleType)
    val scored = b
      .join(broadcast(u.withColumnRenamed("w", "w1").withColumnRenamed("c1", "c1a")), "w1")
      .join(broadcast(u.withColumnRenamed("w", "w2").withColumnRenamed("c1", "c1b")), "w2")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c12").as("n_pair"),
        round(log((dbl(col("c12")) / col("nb"))
          / ((dbl(col("c1a")) / col("nt")) * (dbl(col("c1b")) / col("nt")))), 6)
          .as("pmi"))
    scored
      .withColumn("rank",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("pmi").desc, col("w1"), col("w2"))).cast(IntegerType))
      .filter(col("rank") <= 50)
      .orderBy("rank")
  }

  // x29 — KMV bottom-k DISTINCT-COUNT sketch (plans/KmvDistinct, the
  // board's second custom TypedImperativeAggregate): per-source and
  // corpus-level distinct-document estimates from k-sized mergeable
  // summaries — the pre-dedup sizing question ("how many uniques does
  // each source contribute?") answered WITHOUT shuffling one row per
  // distinct value. The sketch is deterministic under any
  // partitioning (bottom-k of a set is arrival-order-free), and with
  // k=4096 ≫ the gate corpus's distinct count the estimate IS the
  // exact count — the regime the oracle gates (q43's discipline);
  // the estimator regime (k ≪ n, ~1/√k relative error) and
  // partition-invariance are pinned in PropertySpec. xxhash64 stays
  // explicit in the plan; the oracle counts distinct md5 digests —
  // both equal distinct texts absent 64/128-bit collisions.
  val x29: Q = q("x29_kmv_distinct",
    """SELECT source, COUNT(DISTINCT md5(text)) AS n_distinct, COUNT(*) AS n_docs
      |FROM documents GROUP BY 1
      |UNION ALL
      |SELECT '__all__' AS source, COUNT(DISTINCT md5(text)), COUNT(*)
      |FROM documents
      |ORDER BY source""") { c =>
    val hashed = c.documents.select(col("source"),
      xxhash64(col("text")).as("h"))
    val perSource = hashed.groupBy("source")
      .agg(graft.plans.Sketches.kmvDistinct(col("h"), 4096).as("n_distinct"),
        count(lit(1)).as("n_docs"))
    val overall = hashed
      .agg(graft.plans.Sketches.kmvDistinct(col("h"), 4096).as("n_distinct"),
        count(lit(1)).as("n_docs"))
      .select(lit("__all__").as("source"), col("n_distinct"), col("n_docs"))
    perSource.unionAll(overall).orderBy("source")
  }

  // x30 — STRATIFIED proportional sampling with EXACT allocation:
  // each language stratum contributes ⌊n_s/10⌋ (min 1) docs, chosen
  // deterministically by md5(doc_id) rank — the reproducible
  // "10% eval slice, every language represented" cut that x14's
  // global hash-threshold split cannot promise (a 1% stratum can
  // vanish from a thresholded sample; exact allocation can't). Scale
  // shape: stratum sizes are ONE map-side-combined aggregate
  // broadcast back; selection is a rank window PER STRATUM (parallel
  // across languages — the sort is the price of exact allocation;
  // when approximate fractions suffice, the threshold-on-hash x14
  // shape avoids it).
  val x30: Q = q("x30_stratified_sample",
    """WITH a AS (SELECT lang,
      |    GREATEST(1, CAST(FLOOR(COUNT(*) / 10.0) AS BIGINT)) AS n_take
      |  FROM documents GROUP BY 1),
      |r AS (SELECT d.doc_id, d.lang, a.n_take,
      |    row_number() OVER (PARTITION BY d.lang
      |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
      |  FROM documents d JOIN a USING (lang))
      |SELECT doc_id, lang FROM r WHERE rn <= n_take ORDER BY doc_id""") { c =>
    val alloc = c.documents.groupBy("lang")
      .agg(greatest(lit(1L),
        floor(count(lit(1)) / 10.0).cast(LongType)).as("n_take"))
    c.documents
      .withColumn("rk", md5(col("doc_id").cast("string").cast("binary")))
      .join(broadcast(alloc), "lang")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("rk", "doc_id")))
      .filter(col("rn") <= col("n_take"))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  // x32 — TEMPERATURE-RESAMPLED corpus mix (the mT5 §3.1 / XLM-R
  // alpha-sampling that x10's FIXED per-source rates cannot express):
  // per-source sampling weights are DERIVED from the corpus itself —
  // q_i ∝ p_i^α with p_i the source's token share and α = 0.5 (sqrt:
  // IEEE-exact in every engine, unlike pow) — then each source's
  // per-doc rate r_i = T·q_i/tokens_i rebalances the SAME total token
  // budget toward low-resource sources: r_i > 1 means UPSAMPLE
  // (every doc repeats ⌊r⌋ times plus a deterministic fractional
  // copy), r_i < 1 means downsample. All arithmetic is engine-
  // portable by construction: token counts are exact longs, weights
  // go through a µ-quantized fixed point (w_i = ⌊√(p_i)·10⁹⌋ summed
  // as longs — order-free), rates live in INTEGER ppm, and the
  // fractional keep is a multiplicative-hash residue test — no
  // pow(), no float sums, so the DuckDB oracle reproduces every
  // decision bit-for-bit. Scale shape: two metadata-sized aggregates
  // (per-source counts, corpus total) broadcast back over ONE
  // corpus pass — the decision is map-side; the upsample explode
  // happens only in the consumer that materializes epochs.
  /** The shared rate-derivation SQL (tok → per-source → total →
    * µ-quantized weights → ppm rates) — ONE source of truth for x32's
    * accounting oracle and p05's epoch-materializer oracle, exactly
    * as [[temperatureRates]] is for their Spark plans.
    */
  private[queries] val tempRateCtes =
    """tok AS (SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS t FROM documents),
      |per AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS toks
      |        FROM tok GROUP BY source),
      |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS T FROM per),
      |w AS (SELECT source, n_docs, toks,
      |    CAST(FLOOR(SQRT(CAST(toks AS DOUBLE) / T) * 1000000000) AS BIGINT) AS wi
      |  FROM per, tot),
      |ws AS (SELECT CAST(SUM(wi) AS BIGINT) AS W FROM w),
      |r AS (SELECT source, n_docs, toks, CAST(wi AS DOUBLE) / W AS qi,
      |    CAST(FLOOR((SELECT T FROM tot) * (CAST(wi AS DOUBLE) / W) / toks * 1000000) AS BIGINT) AS rate_ppm
      |  FROM w, ws)""".stripMargin

  /** SQL for a doc's repeat count under the derived rates: ⌊rate⌋
    * plus the golden-ratio-hash fractional keep. The id reduces mod
    * 10⁶ BEFORE the multiply — same residue ((a·m) mod n ≡
    * ((a mod n)·m) mod n), but the product stays ≤ 10⁶·m ≈ 2.7e15,
    * so neither engine can overflow a 64-bit long at any doc_id
    * (a raw doc_id·m overflows past id ≈ 3.5e9 — ANSI Spark throws,
    * DuckDB errors, and the claimed bit-for-bit portability dies
    * exactly at corpus scale).
    */
  private[queries] val repSql =
    """rate_ppm // 1000000 + CASE
      |      WHEN ((doc_id % 1000000) * 2654435761) % 1000000 < rate_ppm % 1000000
      |      THEN 1 ELSE 0 END""".stripMargin

  /** Spark side of [[tempRateCtes]]: (tok = per-doc token counts,
    * r = per-source derived rates). The whole rate chain (total →
    * weights → normalizer → rates) re-references the per-source
    * aggregate four times, so `per` is FROZEN once it's computed —
    * it is n_sources rows, and without the freeze every re-reference
    * re-runs the corpus scan underneath it (Explain audit: 8 scans
    * of documents collapse to the honest 2 — one for the rates pass,
    * one for the per-doc decision pass in the consumer).
    */
  private[queries] def temperatureRates(c: Catalog): (DataFrame, DataFrame) = {
    val tok = c.documents.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("t"))
    val per = tok.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("t").cast(LongType).as("toks"))
      .localCheckpoint(true)
    val tot = per.agg(sum("toks").cast(LongType).as("T"))
    val w = per.crossJoin(broadcast(tot))
      .withColumn("wi",
        floor(sqrt(col("toks").cast(DoubleType) / col("T")) * 1000000000L)
          .cast(LongType))
    val ws = w.agg(sum("wi").cast(LongType).as("W"))
    val r = w.crossJoin(broadcast(ws))
      .withColumn("qi", col("wi").cast(DoubleType) / col("W"))
      .withColumn("rate_ppm",
        floor(col("T") * col("qi") / col("toks") * 1000000).cast(LongType))
    (tok, r)
  }

  /** Per-doc repeat count (Spark side of [[repSql]]): a golden-ratio
    * multiplicative hash spreads even small sequential doc_ids across
    * the ppm grid (a small multiplier would map ids < 1e6/mult onto a
    * tiny prefix).
    */
  private[queries] def repCol: Column = expr("rate_ppm DIV 1000000") +
    when(pmod(pmod(col("doc_id"), lit(1000000L)) * 2654435761L,
        lit(1000000L)) <
      pmod(col("rate_ppm"), lit(1000000L)), 1L).otherwise(0L)

  val x32: Q = q("x32_temperature_mix",
    s"""WITH $tempRateCtes,
      |kept AS (SELECT tok.source, t, $repSql AS rep
      |  FROM tok JOIN r USING (source))
      |SELECT r.source, n_docs, toks AS orig_tokens, ROUND(qi, 6) AS weight,
      |  rate_ppm, CAST(SUM(rep) AS BIGINT) AS n_kept,
      |  CAST(SUM(rep * t) AS BIGINT) AS kept_tokens
      |FROM kept JOIN r ON kept.source = r.source
      |GROUP BY r.source, n_docs, toks, qi, rate_ppm
      |ORDER BY r.source""") { c =>
    val (tok, r) = temperatureRates(c)
    val kept = tok.join(broadcast(r.select("source", "rate_ppm")), "source")
      .withColumn("rep", repCol)
      .groupBy("source")
      .agg(sum("rep").cast(LongType).as("n_kept"),
        sum(col("rep") * col("t")).cast(LongType).as("kept_tokens"))
    r.select(col("source"), col("n_docs"), col("toks").as("orig_tokens"),
        round(col("qi"), 6).as("weight"), col("rate_ppm"))
      .join(kept, "source")
      .orderBy("source")
  }

  // x33 — SLIDING-WINDOW chunking with overlap (the RAG/embedding
  // chunker; d07's fixed segments are the DEDUP view of a document,
  // this is the RETRIEVAL view): 12-token windows every 8 tokens, so
  // consecutive chunks share a 4-token overlap and no span longer
  // than the stride is ever split across a chunk boundary without
  // also appearing whole in one. Each chunk carries its PROVENANCE —
  // (doc_id, chunk_id, start_tok) — which is what lets retrieval
  // hits map back to exact source spans (and what d09's span-level
  // dedup consumes). Chunk count per doc is pure integer arithmetic
  // (⌈(n−12)/8⌉+1, one chunk for short docs), so the oracle agrees
  // on every boundary. Scale shape: ONE narrow projection pass —
  // tokenize, per-row explode of a computed range, slice; no
  // shuffle anywhere in the operator (the orderBy is the oracle
  // harness's determinism, dropped in production — the x20 rule).
  val x33: Q = q("x33_sliding_chunks",
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
      |              FROM documents),
      |base AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n FROM toks),
      |ids AS (SELECT doc_id, t, unnest(range(0,
      |      CASE WHEN n <= 12 THEN 1 ELSE (n - 12 + 7) // 8 + 1 END)) AS chunk_id
      |  FROM base)
      |SELECT doc_id, chunk_id, chunk_id * 8 AS start_tok,
      |  CAST(len(t[chunk_id*8+1 : chunk_id*8+12]) AS BIGINT) AS n_toks,
      |  array_to_string(t[chunk_id*8+1 : chunk_id*8+12], ' ') AS chunk_text
      |FROM ids ORDER BY doc_id, chunk_id""") { c =>
    val win = 12L
    val stride = 8L
    c.documents
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      .withColumn("n", size(col("t")).cast(LongType))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        when(col("n") <= win, lit(0L))
          .otherwise(expr(s"(n - $win + ${stride - 1}) DIV $stride")))))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("chunk",
        slice(col("t"), (col("start_tok") + 1).cast(IntegerType), lit(win.toInt)))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("chunk")).cast(LongType).as("n_toks"),
        array_join(col("chunk"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  // ---------------------------------------------------------------
  // x35 — URL/DOMAIN BLOCKLIST filter (the UT1/adult-category pass
  // every CCNet/RefinedWeb-shaped crawl pipeline runs right after URL
  // canonicalization): each doc's canonical URL key (d08's injection
  // + normalization — ONE source of truth, DedupQueries.urlKeyCol, so
  // the dedup and blocklist stages can never disagree on what a
  // page's canonical URL is) yields a domain, checked against a
  // category blocklist. Scale shape: the blocklist is config-sized
  // (UT1 is ~4M lines ≈ tens of MB — broadcast territory), so the
  // filter is ONE broadcast hash join probing the corpus with ZERO
  // shuffle of the corpus side; category accounting is a map-side
  // combinable aggregate a caller composes downstream (p04's funnel
  // recipe). Oracle-gated per doc: domain, matched category, and the
  // keep/drop decision.
  private[queries] val blocklistRows: Seq[(String, String)] = Seq(
    "example1.com" -> "ads", "example4.com" -> "adult",
    "example6.com" -> "malware")

  val x35: Q = q("x35_url_blocklist",
    s"""WITH ${DedupQueries.urlInjectSqlCtes},
      |bl(domain, category) AS (VALUES ${
        blocklistRows.map { case (d, c) => s"('$d', '$c')" }.mkString(", ")}),
      |d AS (SELECT doc_id, url_key,
      |        regexp_extract(url_key, '://([^/]+)', 1) AS domain FROM n)
      |SELECT d.doc_id, d.domain,
      |  COALESCE(bl.category, 'ok') AS category,
      |  bl.category IS NULL AS kept
      |FROM d LEFT JOIN bl ON d.domain = bl.domain
      |ORDER BY d.doc_id""") { c =>
    val bl = broadcast(c.spark.createDataFrame(
      blocklistRows.map { case (d, cat) => (d, cat) })
      .toDF("domain", "block_category"))
    c.documents
      .select(col("doc_id"), DedupQueries.urlKeyCol.as("url_key"))
      .withColumn("domain", regexp_extract(col("url_key"), "://([^/]+)", 1))
      .join(bl, Seq("domain"), "left")
      .select(col("doc_id"), col("domain"),
        coalesce(col("block_category"), lit("ok")).as("category"),
        col("block_category").isNull.as("kept"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  // x36/x37 — UNIGRAM-LM SUBWORD TOKENIZER (Kudo 2018, the
  // SentencePiece unigram model — the tokenizer family next to
  // x22/x25's BPE; operators/Unigram.scala). x36 TRAINS: seed vocab
  // from count-weighted substrings, EM rounds whose E-step Viterbi-
  // segments the DISTINCT-WORD frame (vocab-bounded, one higher-
  // order-function expression, no UDFs) and whose usage counts are
  // piece-keyed vocab-sized aggregates, then prunes to the budget —
  // rows-only by the x22 contract (data-dependent iterative argmax),
  // pinned against an independent single-node reference in the spec.
  // x37 APPLIES the FROZEN artifact below (trained once by
  // tools/GenUnigramVocab at compare scale, then pinned — the
  // bpeMerges recipe): scores are integer MICRO-NATS, Viterbi
  // minimizes their exact integer sum with (fewer pieces, lexico-
  // graphically smallest path) struct tie-breaks, so the DuckDB
  // oracle reproduces every segmentation bit-for-bit by unrolling
  // the same DP (30 generated CTE steps — the ivfTrainSql recipe)
  // over the same vocabulary rendered as literal lists. Scale shape:
  // Viterbi touches only DISTINCT words; the corpus pass is one
  // tokenize + join + per-doc aggregate.
  private[graft] val uniPieces: Seq[graft.operators.Unigram.Piece] = {
    import graft.operators.Unigram.Piece
    Seq(
    Piece("r", 2873427L, 1845L),
    Piece("join", 3522570L, 964L),
    Piece("hash", 3540362L, 947L),
    Piece("row", 3544595L, 943L),
    Piece("batch", 3550978L, 937L),
    Piece("scan", 3552046L, 936L),
    Piece("c", 3554185L, 934L),
    Piece("custo", 3554185L, 934L),
    Piece("mer", 3554185L, 934L),
    Piece("olumn", 3554185L, 934L),
    Piece("filte", 3555256L, 933L),
    Piece("small", 3560630L, 928L),
    Piece("merge", 3571464L, 918L),
    Piece("slow", 3571464L, 918L),
    Piece("order", 3578021L, 912L),
    Piece("vecto", 3578021L, 912L),
    Piece("line", 3580217L, 910L),
    Piece("data", 3582417L, 908L),
    Piece("table", 3582417L, 908L),
    Piece("agg", 3590156L, 901L),
    Piece("value", 3594606L, 897L),
    Piece("key", 3595721L, 896L),
    Piece("s", 3604690L, 888L),
    Piece("tream", 3604690L, 888L),
    Piece("indow", 3606944L, 886L),
    Piece("w", 3606944L, 886L),
    Piece("a", 3613739L, 880L),
    Piece("spark", 3613739L, 880L),
    Piece("group", 3616015L, 878L),
    Piece("part", 3616015L, 878L),
    Piece("big", 3618295L, 876L),
    Piece("sort", 3622872L, 872L),
    Piece("query", 3624019L, 871L),
    Piece("fast", 3643730L, 854L),
    Piece("the", 3660259L, 840L),
    Piece("dup", 7135565L, 26L),
    Piece("b", 10393661L, 0L),
    Piece("d", 10393661L, 0L),
    Piece("e", 10393661L, 0L),
    Piece("f", 10393661L, 0L),
    Piece("g", 10393661L, 0L),
    Piece("h", 10393661L, 0L),
    Piece("i", 10393661L, 0L),
    Piece("j", 10393661L, 0L),
    Piece("k", 10393661L, 0L),
    Piece("l", 10393661L, 0L),
    Piece("m", 10393661L, 0L),
    Piece("n", 10393661L, 0L),
    Piece("o", 10393661L, 0L),
    Piece("p", 10393661L, 0L),
    Piece("q", 10393661L, 0L),
    Piece("t", 10393661L, 0L),
    Piece("u", 10393661L, 0L),
    Piece("v", 10393661L, 0L),
    Piece("y", 10393661L, 0L),
    Piece("x", 10393661L, 0L),
    Piece("z", 10393661L, 0L),
    )
  }

  val x36: Q = rowsOnly("x36_unigram_train") { c =>
    val vocab = graft.operators.Unigram.train(c.documents, "text",
      vocabSize = 64, iters = 2)
    c.spark.createDataFrame(vocab.zipWithIndex.map { case (p, i) =>
      (i + 1, p.piece, p.scoreMu, p.usage)
    }).toDF("rank", "piece", "score_mu", "usage")
      .orderBy("rank")
  }

  private[queries] val x37Oracle: String = {
    val maxP = graft.operators.Unigram.MaxPieceLen
    val maxW = graft.operators.Unigram.MaxWordChars
    val pl = uniPieces.map(p => s"'${p.piece}'").mkString("[", ", ", "]")
    val sl = uniPieces.map(p => s"CAST(${p.scoreMu} AS BIGINT)")
      .mkString("[", ", ", "]")
    def best(t: Int) =
      s"list_sort(list_filter(list_transform(range(greatest(1, $t - ${maxP - 1}), $t + 1), " +
        s"i -> {'s': struct_extract(acc[i], 's') + sc[list_position(pc, substring(w, i, $t - i + 1))], " +
        s"'n': struct_extract(acc[i], 'n') + 1, " +
        s"'p': struct_extract(acc[i], 'p') || ' ' || substring(w, i, $t - i + 1)}), " +
        s"c -> struct_extract(c, 's') IS NOT NULL))[1]"
    val steps = (1 to maxW).map(t =>
      s"v$t AS (SELECT w, len, pc, sc, CASE WHEN $t > len THEN acc ELSE list_append(acc, ${best(t)}) END AS acc FROM v${t - 1})")
      .mkString(",\n")
    s"""WITH toks AS (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS t FROM documents),
       |wp0 AS (SELECT doc_id, unnest(range(1, len(t)+1)) AS i, t FROM toks),
       |wpos AS (SELECT doc_id, i, substring(t[i], 1, $maxW) AS w FROM wp0 WHERE strlen(t[i]) > 0),
       |dw AS (SELECT DISTINCT w FROM wpos),
       |vl AS (SELECT $pl AS pc, $sl AS sc),
       |v0 AS (SELECT w, strlen(w) AS len, pc, sc, [{'s': CAST(0 AS BIGINT), 'n': 0, 'p': ''}] AS acc FROM dw CROSS JOIN vl),
       |$steps,
       |vfin AS (SELECT w, acc[len(acc)] AS b FROM v$maxW),
       |seg AS (SELECT w, ltrim(struct_extract(b, 'p')) AS pieces,
       |  struct_extract(b, 'n') AS n_pieces, struct_extract(b, 's') AS score_mu FROM vfin),
       |j AS (SELECT doc_id, i, pieces, n_pieces, score_mu FROM wpos JOIN seg USING (w))
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(SUM(score_mu) AS BIGINT) AS score_mu,
       |  md5(string_agg(pieces, ' | ' ORDER BY i)) AS piece_hash
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val x37: Q = q("x37_unigram_encode", x37Oracle) { c =>
    val maxW = graft.operators.Unigram.MaxWordChars
    val words = c.documents
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z]+")).as(Seq("i", "w0")))
      .filter(length(col("w0")) > 0)
      .select(col("doc_id"), col("i"),
        col("w0").substr(lit(1), lit(maxW)).as("w"))
    // plain equi-join back to the word stream: the distinct-word
    // frame is corpus-VOCAB-sized, which is small at compare scale
    // (AQE will broadcast it) but UNBOUNDED at 100 TB — forcing a
    // broadcast here would be the scale bug, not the optimization
    val seg = graft.operators.Unigram.segment(
      words.select("w").distinct(), uniPieces)
    words.join(seg, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).cast(LongType).as("n_pieces"),
        sum(col("score_mu")).cast(LongType).as("score_mu"),
        md5(array_join(transform(
            array_sort(collect_list(struct(col("i"), col("pieces")))),
            s => s.getField("pieces")), " | ").cast(BinaryType)).as("piece_hash"))
      .orderBy("doc_id")
  }

  // x38 — KMV SET-OPERATION OVERLAP: the pairwise source-composition
  // matrix ("how much 4-gram content does slice A share with slice
  // B") estimated from bottom-k sketches instead of a corpus × corpus
  // distinct join. Exact overlap shuffles one row per distinct
  // shingle PER SOURCE PAIR — at 100 TB that join IS the job; the
  // KMV sketch (plans/SketchAggregates.KmvSketch) is a mergeable
  // uniform sample of each slice's distinct population, built in ONE
  // map-side-combined pass (≤ k longs per source cross the wire),
  // and every pairwise estimate is array math over source-count-
  // sized rows. Estimator (Beyer et al., SIGMOD'07 §4): combine two
  // sketches, re-trim to the k smallest — provably the bottom-k of
  // the UNION — and the fraction present in both sides estimates
  // Jaccard; scaling by the union-size estimate gives the
  // intersection. The hash is the engine-portable md5-60-bit family
  // (d02's discipline, NOT xxhash64) so the bottom-k sets — and
  // therefore the ESTIMATES THEMSELVES, sketch regime included —
  // replay exactly in DuckDB: the oracle gates the estimator, not a
  // lucky exact regime. THE COMBINE MATH BELOW IS COUPLED TO THIS
  // FAMILY: values are non-negative 60-bit, so signed array_sort IS
  // unsigned order, and the union estimator's space constant is 2^60.
  // Swapping in xxhash64 would need BOTH changed (unsigned-order
  // sort of full-range signed longs + a 2^64 constant) — and would
  // forfeit the DuckDB replay, which is the point of this family.
  // Accuracy + the exact-when-k-covers regime are pinned in
  // PropertySpec against exact set math.
  private val x38K = 1024

  val x38: Q = q("x38_kmv_overlap",
    s"""WITH toks AS (SELECT doc_id, source, string_split(lower(text), ' ') AS t FROM documents),
      |g AS (SELECT source, unnest(list_distinct(list_transform(range(1, len(t)-2),
      |        i -> array_to_string(t[i:i+3], ' ')))) AS g4
      |      FROM toks WHERE len(t) >= 4),
      |h AS (SELECT DISTINCT source, CAST('0x' || substr(md5(g4), 1, 15) AS BIGINT) AS h FROM g),
      |rk AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS r FROM h),
      |sk AS (SELECT source, h FROM rk WHERE r <= $x38K),
      |pr AS (SELECT a.source AS src_a, b.source AS src_b
      |       FROM (SELECT DISTINCT source FROM documents) a
      |       JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source),
      |uni AS (SELECT DISTINCT pr.src_a, pr.src_b, s.h
      |        FROM pr JOIN sk s ON s.source = pr.src_a OR s.source = pr.src_b),
      |ur AS (SELECT src_a, src_b, h,
      |         row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS r FROM uni),
      |s AS (SELECT src_a, src_b, h FROM ur WHERE r <= $x38K),
      |st AS (SELECT src_a, src_b, COUNT(*) AS k_s, MAX(h) AS thr FROM s GROUP BY 1, 2),
      |m AS (SELECT s.src_a, s.src_b, COUNT(*) AS n_common FROM s
      |      JOIN sk a ON a.source = s.src_a AND a.h = s.h
      |      JOIN sk b ON b.source = s.src_b AND b.h = s.h
      |      GROUP BY 1, 2)
      |SELECT st.src_a, st.src_b, CAST(st.k_s AS BIGINT) AS k_s,
      |  CAST(COALESCE(m.n_common, 0) AS BIGINT) AS n_common,
      |  ROUND(CAST(COALESCE(m.n_common, 0) AS DOUBLE) / st.k_s, 6) AS jaccard_est,
      |  ROUND(CASE WHEN st.k_s < $x38K THEN CAST(st.k_s AS DOUBLE)
      |        ELSE ${x38K - 1}.0 * 1152921504606846976.0 / st.thr END, 3) AS union_est,
      |  ROUND(CAST(COALESCE(m.n_common, 0) AS DOUBLE) / st.k_s *
      |        (CASE WHEN st.k_s < $x38K THEN CAST(st.k_s AS DOUBLE)
      |         ELSE ${x38K - 1}.0 * 1152921504606846976.0 / st.thr END), 3) AS inter_est
      |FROM st LEFT JOIN m ON st.src_a = m.src_a AND st.src_b = m.src_b
      |ORDER BY st.src_a, st.src_b""") { c =>
    val g = c.documents
      .select(col("source"), Text.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 4)
      .select(col("source"), explode(Text.shingles(col("toks"), 4)).as("g4"))
    val hashed = g.select(col("source"),
      conv(substring(md5(col("g4").cast(BinaryType)), 1, 15), 16, 10)
        .cast(LongType).as("h"))
    // source-count-sized: one row per source, ≤ k longs each. Frozen
    // because the self-join below consumes it twice.
    val sk = c.documents.select("source").distinct()
      .join(hashed.groupBy("source")
        .agg(graft.plans.Sketches.kmvSketch(col("h"), x38K).as("sk")),
        Seq("source"), "left")
      .select(col("source"),
        coalesce(col("sk"), array().cast(ArrayType(LongType))).as("sk"))
      .localCheckpoint(true)
    val pairs = sk.select(col("source").as("src_a"), col("sk").as("ska"))
      .join(sk.select(col("source").as("src_b"), col("sk").as("skb")),
        col("src_a") < col("src_b"))
    val kL = lit(x38K.toLong)
    pairs
      // bottom-k of the union = bottom-k of the merged sketches
      .withColumn("s", slice(array_sort(array_distinct(
        concat(col("ska"), col("skb")))), 1, x38K))
      .withColumn("k_s", size(col("s")).cast(LongType))
      .filter(col("k_s") > 0) // both-empty pairs vanish in the oracle too
      .withColumn("thr", element_at(col("s"), size(col("s"))))
      // |S ∩ A ∩ B| via array_intersect (hash-set build, O(k)) — the
      // per-element contains-lambda form is O(k²) interpreted
      // evaluation and measured 12 s of scale-flat constant at any
      // corpus size; set semantics identical (all three arrays are
      // distinct by construction)
      .withColumn("n_common", size(array_intersect(
        array_intersect(col("s"), col("ska")), col("skb"))).cast(LongType))
      .withColumn("union_raw",
        when(col("k_s") < kL, col("k_s").cast(DoubleType))
          .otherwise(lit((x38K - 1).toDouble) * lit(1.152921504606846976e18)
            / col("thr").cast(DoubleType)))
      .select(col("src_a"), col("src_b"), col("k_s"), col("n_common"),
        round(col("n_common").cast(DoubleType) / col("k_s"), 6).as("jaccard_est"),
        round(col("union_raw"), 3).as("union_est"),
        round(col("n_common").cast(DoubleType) / col("k_s") * col("union_raw"), 3)
          .as("inter_est"))
      .orderBy("src_a", "src_b")
  }
}
