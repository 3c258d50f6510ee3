package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDX capture-index ingestion — the index format crawl archives ship
  * NEXT TO their WARC containers (Common Crawl's cdx-*.gz shards, one
  * line per capture: `urlkey timestamp {json}`). Real 100 TB pipelines
  * do not scan the WARC bytes to decide what to fetch — they query the
  * index (~1% of the corpus bytes), select the captures worth reading
  * (status, MIME, digest-level re-crawl dedup), and plan
  * offset/length range-reads into the containers from the surviving
  * rows. This source is that selection stage's front half.
  *
  * Reader design (the 100 TB shape): one `spark.read.text` scan —
  * splittable on plain shards, one task per member on .gz shards
  * (CC sizes cdx members for exactly that) — then a pure codegen'd
  * projection: the line's first two space-delimited tokens are SURT
  * urlkey and 14-digit timestamp, the rest is one JSON object parsed
  * with `from_json` against an EXPLICIT schema (the sources.yml
  * no-inference discipline; CC encodes every JSON value as a string,
  * numerics included, so casts are part of the projection). Zero
  * UDFs, zero RDDs, no shuffle — filters over the parsed columns are
  * ordinary predicates a downstream select pushes into the scan
  * stage.
  */
object Cdx {

  /** CC CDX-JSON value schema — all strings on the wire. */
  val jsonSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", StringType),
    StructField("digest", StringType),
    StructField("length", StringType),
    StructField("offset", StringType),
    StructField("filename", StringType)))

  /** Parse a CDX file (or directory of shards) into one row per
    * capture: (urlkey, ts, url, mime, status, digest, length,
    * offset, filename).
    *
    * Malformed-input contract (documented, deliberate): a line with
    * fewer than three space-delimited tokens or broken JSON yields
    * NULL parsed columns rather than failing the scan — CDX shards in
    * the wild carry occasional truncated tail lines, and the
    * SELECTION stage's predicates (status/mime/digest) drop
    * null-parsed rows naturally. This is the null-tolerant half of
    * the source discipline; Warc.readRaw keeps the fail-loud half
    * because a mis-parsed CONTAINER corrupts payload boundaries,
    * while a dropped index line only shrinks a selection. Callers
    * needing strictness can assert `j IS NOT NULL` / count corrupt
    * lines on the parsed frame — it is one predicate over these
    * columns.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), " ", 3)
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        element_at(parts, 1).as("urlkey"),
        element_at(parts, 2).cast(LongType).as("ts"),
        from_json(element_at(parts, 3), jsonSchema).as("j"))
      .select(col("urlkey"), col("ts"),
        col("j.url").as("url"), col("j.mime").as("mime"),
        col("j.status").as("status"), col("j.digest").as("digest"),
        col("j.length").cast(LongType).as("length"),
        col("j.offset").cast(LongType).as("offset"),
        col("j.filename").as("filename"))
  }
}
