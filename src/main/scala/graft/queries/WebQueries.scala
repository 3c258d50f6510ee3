package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.core.Scratch
import graft.sources.{Catalog, Warc}

/** The crawl pipeline's FRONT DOOR — where a real 100 TB curation run
  * starts, before any of the D-family stages see a clean `text`
  * column: WARC/WET container ingestion (w01) and HTML boilerplate
  * extraction (x34). Both are oracle-gated end-to-end: the WET
  * fixture is generated deterministically FROM the documents table,
  * so DuckDB recomputes the expected records from the source rows
  * while Spark round-trips through the actual container bytes; the
  * HTML fixture is the same deterministic-injection recipe as d08's
  * URLs, so both engines build identical markup and the extraction
  * ALGORITHM itself is what hash-compares.
  */
object WebQueries extends QDsl {

  // ---------------------------------------------------------------
  // w01 — WARC/WET INGESTION (sources/Warc.scala — the container
  // format crawl corpora arrive in). The reader is ONE splittable
  // text scan with the record boundary as the line separator (the
  // textinputformat.record.delimiter trick through the DataFrame
  // text source — block-sized tasks at 100 TB, no whole-file reads),
  // headers parsed with codegen'd regexp_extract, payload cut by
  // Content-Length exactly as the spec defines the record block.
  // Fixture: a two-shard WET rendering of the documents table
  // (driver-side generation is fixture-only, the mm stubMedia
  // recipe); the oracle recomputes every expected record — including
  // the Content-Length the reader must round-trip — from documents.
  private val w01Fixture =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[queries] def wetFixtureDir(c: Catalog): String =
    w01Fixture.computeIfAbsent(c.dir, { _ =>
      val d = Scratch.dir("w01_wet")
      val rows = c.documents.select("doc_id", "text")
        .orderBy("doc_id").toLocalIterator()
      // shard 0 plain, shard 1 GZIPPED — Common Crawl ships .warc.gz /
      // .warc.wet.gz, and the text source decompresses by extension,
      // so one read covers the mixed-shard reality. (A .gz member is
      // NOT splittable — one task per compressed shard; CC sizes its
      // members ~1 GB for exactly that reason, and a 100 TB crawl
      // parallelizes across its ~100k members, not within them.)
      val plain = java.nio.file.Files.newBufferedWriter(
        d.resolve("shard-0.warc"), java.nio.charset.StandardCharsets.UTF_8)
      val gz = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(
          d.resolve("shard-1.warc.gz"))),
        java.nio.charset.StandardCharsets.UTF_8))
      val writers = Seq(plain, gz)
      try {
        rows.forEachRemaining { r =>
          val id = r.getLong(0)
          val rec = Warc.record(
            s"https://crawl.example/doc/$id",
            f"2024-01-${id % 28 + 1}%02dT00:00:00Z",
            r.getString(1))
          writers((id % 2).toInt).write(rec)
        }
      } finally writers.foreach(_.close())
      d.toString
    })

  val w01: Q = q("w01_warc_source",
    """SELECT 'https://crawl.example/doc/' || CAST(doc_id AS VARCHAR) AS url,
      |  'conversion' AS rec_type,
      |  '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
      |    || 'T00:00:00Z' AS warc_date,
      |  CAST(strlen(text) AS BIGINT) AS content_length,
      |  md5(text) AS payload_md5
      |FROM documents ORDER BY url""") { c =>
    Warc.read(c.spark, wetFixtureDir(c))
      .select(col("url"), col("rec_type"), col("warc_date"),
        col("content_length"), md5(col("payload").cast("binary")).as("payload_md5"))
      .orderBy("url")
  }

  // ---------------------------------------------------------------
  // w02 — RAW-WARC INGESTION, LENGTH-WALKING (sources/Warc.readRaw).
  // w01's delimiter-split reader documents its known limit: a raw
  // fetch BODY embedding the literal record boundary splits early.
  // w02 is the hostile-body path — it hops record to record by
  // Content-Length (the payload is counted, never searched), so the
  // fixture DELIBERATELY plants a complete fake record (boundary +
  // headers + blank line) inside every doc_id%5=0 payload. Shards are
  // the parallel unit (raw WARC without an index is sequential BY
  // FORMAT — the reason CC ships WET/WAT and megawarc .idx next to
  // it); one plain + one gzipped shard cover the mixed reality. The
  // oracle recomputes every expected record — including the embedded-
  // boundary payload bytes the reader must round-trip — from the
  // documents table.
  private val w02Fixture =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The adversarial payload: doc_id%5=0 payloads embed a complete
    * fake record; the oracle mirrors this construction in SQL.
    */
  private def rawPayload(id: Long, text: String): String =
    if (id % 5 == 0)
      text + "\r\nWARC/1.0\r\nWARC-Type: response\r\n" +
        s"Content-Length: 99\r\n\r\nfake body tail-$id"
    else text

  private[queries] def rawWarcFixtureDir(c: Catalog): String =
    w02Fixture.computeIfAbsent(c.dir, { _ =>
      val d = Scratch.dir("w02_warc")
      val rows = c.documents.select("doc_id", "text")
        .orderBy("doc_id").toLocalIterator()
      val plain = java.nio.file.Files.newBufferedWriter(
        d.resolve("shard-0.warc"), java.nio.charset.StandardCharsets.UTF_8)
      val gz = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(
          d.resolve("shard-1.warc.gz"))),
        java.nio.charset.StandardCharsets.UTF_8))
      val writers = Seq(plain, gz)
      try {
        rows.forEachRemaining { r =>
          val id = r.getLong(0)
          val rec = Warc.rawRecord(
            s"https://crawl.example/raw/$id",
            f"2024-01-${id % 28 + 1}%02dT00:00:00Z",
            rawPayload(id, r.getString(1)), "response")
          writers((id % 2).toInt).write(rec)
        }
      } finally writers.foreach(_.close())
      d.toString
    })

  val w02: Q = q("w02_warc_raw",
    """WITH pay AS (SELECT doc_id,
      |  CASE WHEN doc_id % 5 = 0 THEN text
      |      || chr(13) || chr(10) || 'WARC/1.0'
      |      || chr(13) || chr(10) || 'WARC-Type: response'
      |      || chr(13) || chr(10) || 'Content-Length: 99'
      |      || chr(13) || chr(10) || chr(13) || chr(10)
      |      || 'fake body tail-' || CAST(doc_id AS VARCHAR)
      |    ELSE text END AS payload
      |  FROM documents)
      |SELECT 'https://crawl.example/raw/' || CAST(doc_id AS VARCHAR) AS url,
      |  'response' AS rec_type,
      |  '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
      |    || 'T00:00:00Z' AS warc_date,
      |  CAST(strlen(payload) AS BIGINT) AS content_length,
      |  md5(payload) AS payload_md5,
      |  contains(payload, 'WARC/1.0') AS has_embedded_boundary
      |FROM pay ORDER BY url""") { c =>
    Warc.readRaw(c.spark, rawWarcFixtureDir(c))
      .select(col("url"), col("rec_type"), col("warc_date"),
        col("content_length"),
        md5(col("payload").cast("binary")).as("payload_md5"),
        col("payload").contains("WARC/1.0").as("has_embedded_boundary"))
      .orderBy("url")
  }

  // ---------------------------------------------------------------
  // x34 — HTML BOILERPLATE EXTRACTION (the trafilatura/jusText-class
  // stage every CC-derived pipeline runs FIRST — before x01 langid,
  // x02 quality, d02 dedup — because real corpora arrive as markup,
  // not clean text). Block-level link-density classification, the
  // jusText core: strip script/style, split the page into blocks at
  // block-level tags, score each block by alphanumeric mass and the
  // share of it living inside <a> anchors, keep blocks that are long
  // enough (≥25 alnum chars) and not link-dominated (link mass < 1/3)
  // — nav bars, ad units, headings, and footers fail one or both
  // tests, article paragraphs pass. Scale shape: the WHOLE operator
  // is one narrow projection over higher-order array functions
  // (split → transform → filter → concat) — ZERO shuffles, fully
  // codegen-friendly, no explode round-trip (the orderBy is oracle
  // determinism, the x20 rule). Fixture: both engines wrap each doc's
  // text in identical deterministic markup (nav/ads/h1/2-paragraph
  // body/footer, ad unit on doc_id%3=0 — the d08 injection recipe),
  // so the DOM-walk-free block algebra itself is what hash-gates;
  // recall on the planted blocks (paragraphs recovered verbatim,
  // boilerplate never leaks) is spec-pinned.
  /** The x34 CTE chain (markup injection from (doc_id, text) +
    * block extraction to `o`: doc_id, n_blocks, n_kept, content) —
    * shared by x34's oracle and p06's, so the pipeline composition
    * cannot drift from the registered stage.
    */
  private[queries] val htmlExtractSqlCtes: String =
    """t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |h AS (SELECT doc_id,
      |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |  '</title><style>.m{color:#111}</style><script>var t=1;</script></head><body>' ||
      |  '<nav><a href="/">Home</a> <a href="/tags">Tags</a> <a href="/feed">RSS</a></nav>' ||
      |  CASE WHEN doc_id % 3 = 0
      |    THEN '<div><a href="https://ads.example/c">Buy now</a> <a href="https://ads.example/d">Deals</a></div>'
      |    ELSE '' END ||
      |  '<h1>' || array_to_string(w[1:3], ' ') || '</h1>' ||
      |  '<p>' || array_to_string(w[1:len(w)//2], ' ') || '</p>' ||
      |  '<p>' || array_to_string(w[len(w)//2+1:len(w)], ' ') || '</p>' ||
      |  '<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms</a> (c) 2024</footer></body></html>'
      |  AS html FROM t),
      |s AS (SELECT doc_id, regexp_replace(regexp_replace(html,
      |    '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
      |    '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS h2 FROM h),
      |b AS (SELECT doc_id, string_split(regexp_replace(h2,
      |    '<(p|div|nav|footer|h1)', chr(1) || '<\1', 'g'), chr(1)) AS blocks FROM s),
      |sc AS (SELECT doc_id, len(blocks) AS n_blocks, list_transform(blocks, x -> {
      |    'txt': trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')),
      |    'alnum': strlen(regexp_replace(regexp_replace(x, '<[^>]*>', ' ', 'g'), '[^A-Za-z0-9]', '', 'g')),
      |    'linkless': strlen(regexp_replace(regexp_replace(regexp_replace(x,
      |       '(?s)<a[^>]*>.*?</a>', ' ', 'g'), '<[^>]*>', ' ', 'g'), '[^A-Za-z0-9]', '', 'g'))
      |  }) AS sb FROM b),
      |k AS (SELECT doc_id, n_blocks,
      |  list_filter(sb, e -> e.alnum >= 25 AND 3*(e.alnum - e.linkless) < e.alnum) AS kept
      |  FROM sc),
      |o AS (SELECT doc_id, n_blocks, len(kept) AS n_kept,
      |  COALESCE(array_to_string(list_transform(kept, e -> e.txt), ' '), '')
      |    AS content FROM k)"""

  val x34: Q = q("x34_html_extract",
    s"""WITH $htmlExtractSqlCtes
      |SELECT doc_id, CAST(n_blocks AS BIGINT) AS n_blocks,
      |  CAST(n_kept AS BIGINT) AS n_kept,
      |  CAST(length(content) AS BIGINT) AS n_content_chars,
      |  md5(content) AS content_md5
      |FROM o ORDER BY doc_id""") { c =>
    extractContent(c.documents.select(col("doc_id"), col("text")),
        htmlOf(col("doc_id"), split(col("text"), " ")))
      .select(col("doc_id"),
        col("n_blocks").cast(LongType).as("n_blocks"),
        col("n_kept").cast(LongType).as("n_kept"),
        length(col("content")).cast(LongType).as("n_content_chars"),
        md5(col("content").cast("binary")).as("content_md5"))
      .orderBy("doc_id")
  }

  /** The deterministic markup injection — one source of truth for
    * x34 (over documents) and p06 (over WET payloads).
    */
  private[queries] def htmlOf(docId: Column, w: Column): Column = {
    val half = floor(size(w) / 2).cast(IntegerType)
    concat(
      lit("<html><head><title>Doc "), docId.cast("string"),
      lit("</title><style>.m{color:#111}</style><script>var t=1;</script></head><body>"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/tags\">Tags</a> <a href=\"/feed\">RSS</a></nav>"),
      when(docId % 3 === 0,
        "<div><a href=\"https://ads.example/c\">Buy now</a> <a href=\"https://ads.example/d\">Deals</a></div>")
        .otherwise(""),
      lit("<h1>"), array_join(slice(w, 1, 3), " "), lit("</h1>"),
      lit("<p>"), array_join(slice(w, lit(1), half), " "), lit("</p>"),
      lit("<p>"), array_join(slice(w, half + 1, size(w)), " "), lit("</p>"),
      lit("<footer><a href=\"/privacy\">Privacy</a> <a href=\"/terms\">Terms</a> (c) 2024</footer></body></html>"))
  }

  /** The block-level extraction, staged exactly like the original
    * x34 projection chain (withColumn stages collapse into ONE
    * whole-stage-codegen projection whose duplicated subtrees are
    * shared by subexpression elimination — both a struct select and
    * an inline() generator measured 2.4x slower at sf0.1): strip
    * script/style, split at block tags, keep long non-link-dominated
    * blocks. Appends (n_blocks, n_kept, content); shared by x34 and
    * p06.
    */
  private[queries] def extractContent(df: org.apache.spark.sql.DataFrame,
      html: Column): org.apache.spark.sql.DataFrame = {
    val stripped = regexp_replace(regexp_replace(html,
      "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")
    val blocks = split(
      regexp_replace(stripped, "<(p|div|nav|footer|h1)", "<$1"),
      "")
    def alnumLen(x: Column) =
      length(regexp_replace(regexp_replace(x, "<[^>]*>", " "), "[^A-Za-z0-9]", ""))
    df.withColumn("__blocks", blocks)
      .withColumn("__kept", filter(transform(col("__blocks"), x => struct(
        trim(regexp_replace(regexp_replace(x, "<[^>]*>", " "), "\\s+", " ")).as("txt"),
        alnumLen(x).as("alnum"),
        alnumLen(regexp_replace(x, "(?s)<a[^>]*>.*?</a>", " ")).as("linkless"))),
        e => e("alnum") >= 25 && lit(3) * (e("alnum") - e("linkless")) < e("alnum")))
      .withColumn("n_blocks", size(col("__blocks")))
      .withColumn("n_kept", size(col("__kept")))
      .withColumn("content",
        array_join(transform(col("__kept"), e => e("txt")), " "))
      .drop("__blocks", "__kept")
  }

  // ---------------------------------------------------------------
  // p06 — the CRAWL-INGEST PIPELINE: the whole front door COMPOSED in
  // one dataflow, starting from container bytes — w01's WET records
  // (doc identity recovered from the record's own URL — provenance
  // travels through the container, never side-channeled), x34's
  // markup extraction, x01's stopword language predictor on the
  // EXTRACTED content, d01's keep-first exact dedup on the content
  // hash. This is where a real 100 TB curation run starts; every
  // stage is the registered operator's exact predicate (shared
  // helpers, cannot drift). Scale shape: one splittable container
  // scan → one narrow HOF projection (extraction + langid features)
  // → ONE md5-window shuffle (the dedup, inherent). Oracle: the
  // shared x34 CTE chain + the p04 language CASE + the keep-first
  // window, recomputed from the source table the fixture renders
  // from.
  val p06: Q = q("p06_crawl_ingest_pipeline",
    s"""WITH $htmlExtractSqlCtes,
      |tk AS (SELECT doc_id, n_blocks, n_kept, content,
      |         string_split(lower(content), ' ') AS toks FROM o),
      |hh AS (SELECT doc_id, n_blocks, n_kept, content, len(toks) AS n_tokens,
      |  len(list_filter(toks, x -> x IN ${SharedSql.inList(graft.functions.Text.enStops)})) AS en_hits,
      |  len(list_filter(toks, x -> x IN ${SharedSql.inList(graft.functions.Text.esStops)})) AS es_hits,
      |  len(list_filter(toks, x -> x IN ${SharedSql.inList(graft.functions.Text.deStops)})) AS de_hits,
      |  len(list_filter(toks, x -> x IN ${SharedSql.inList(graft.functions.Text.frStops)})) AS fr_hits
      |  FROM tk),
      |lg AS (SELECT *,
      |  CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
      |       WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
      |       WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang FROM hh),
      |kf AS (SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY md5(content)) AS kept FROM lg)
      |SELECT doc_id, CAST(n_blocks AS BIGINT) AS n_blocks,
      |  CAST(n_kept AS BIGINT) AS n_kept,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  pred_lang, kept, md5(content) AS content_md5
      |FROM kf ORDER BY doc_id""") { c =>
    import graft.functions.Text
    val recs = Warc.read(c.spark, wetFixtureDir(c))
      .select(regexp_extract(col("url"), "doc/(\\d+)$", 1)
        .cast(LongType).as("doc_id"), col("payload"))
    val extracted = extractContent(recs,
      htmlOf(col("doc_id"), split(col("payload"), " "))).drop("payload")
    val toks = Text.tokens(col("content"))
    val lg = extracted
      .withColumn("n_tokens", size(toks))
      .withColumn("en_hits", Text.hitCount(toks, Text.enStops))
      .withColumn("es_hits", Text.hitCount(toks, Text.esStops))
      .withColumn("de_hits", Text.hitCount(toks, Text.deStops))
      .withColumn("fr_hits", Text.hitCount(toks, Text.frStops))
      .withColumn("pred_lang", Text.predLang(col("en_hits"),
        col("es_hits"), col("de_hits"), col("fr_hits")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("content").cast("binary")))
    lg.withColumn("kept", col("doc_id") === min("doc_id").over(w))
      .select(col("doc_id"),
        col("n_blocks").cast(LongType).as("n_blocks"),
        col("n_kept").cast(LongType).as("n_kept"),
        col("n_tokens").cast(LongType).as("n_tokens"),
        col("pred_lang"), col("kept"),
        md5(col("content").cast("binary")).as("content_md5"))
      .orderBy("doc_id")
  }
}
