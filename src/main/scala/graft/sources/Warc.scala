package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** WARC/WET ingestion — the container format crawl corpora actually
  * arrive in (Common Crawl ships WARC for raw fetches and WET for the
  * extracted-text "conversion" records; every CC-derived pipeline
  * starts by record-splitting these files).
  *
  * Reader design (the 100 TB shape): one `spark.read.text` scan with
  * the record boundary `"WARC/1.0\r\n"` as the line separator — the
  * classic WARC-on-Hadoop trick (textinputformat.record.delimiter),
  * expressed through the DataFrame text source so the split walk
  * stays inside Catalyst/Tungsten. The text source is SPLITTABLE on
  * uncompressed input: a 100 TB crawl shards into block-sized tasks
  * that each scan forward to the next record boundary, no
  * whole-file reads anywhere. Header fields parse with codegen'd
  * `regexp_extract`/`substring` — zero UDFs, zero RDDs, and the
  * payload is cut by Content-Length exactly as the WARC spec defines
  * the record block.
  *
  * Known limit shared with every delimiter-split WARC reader: a raw
  * fetch whose BODY embeds the literal record boundary would split
  * early. WET conversion records (text/plain payloads) cannot contain
  * it; raw-WARC users with hostile bodies want the length-aware
  * sequential reader per shard (the format is why Common Crawl ships
  * WET next to WARC).
  *
  * Reference tie-in: the reference pins its raw inputs behind an
  * explicit source schema (DbtEducationalDataProject/models/staging/
  * sources.yml:3) rather than inferring them; this source applies the
  * same explicit-schema discipline to the crawl container instead of
  * inferring anything from record bytes.
  */
object Warc {

  val RecordBoundary = "WARC/1.0\r\n"

  /** Parse a WARC/WET file (or directory of shards) into one row per
    * record: (url, rec_type, warc_date, content_length, payload).
    * Records with a Content-Length header are cut to exactly that
    * many OCTETS — the unit the WARC spec defines the block in — by
    * slicing the UTF-8 encoding, so multi-byte payloads (real WET is
    * UTF-8) round-trip exactly; absent lengths fall back to the raw
    * tail with the inter-record blank line trimmed.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.option("lineSep", RecordBoundary).text(path))

  /** The record-parsing stage alone, over an already record-split
    * frame (one `value` per record) — shared by the batch reader
    * above and the STREAMING ingest (e25: `readStream` over a landing
    * directory with the same record-boundary lineSep; the parse is
    * pure projection, so it is trivially streamable).
    */
  def parse(raw0: DataFrame): DataFrame = {
    val raw = raw0.filter(length(trim(col("value"))) > 0)
    val hdr = substring_index(col("value"), "\r\n\r\n", 1)
    raw
      .withColumn("h", hdr)
      .withColumn("content_length",
        regexp_extract(col("h"), "Content-Length: (\\d+)", 1)
          .cast(LongType))
      .withColumn("tail", expr("substring(value, length(h) + 5)"))
      .select(
        regexp_extract(col("h"), "WARC-Target-URI: (\\S+)", 1).as("url"),
        regexp_extract(col("h"), "WARC-Type: (\\S+)", 1).as("rec_type"),
        regexp_extract(col("h"), "WARC-Date: (\\S+)", 1).as("warc_date"),
        col("content_length"),
        when(col("content_length").isNotNull,
          // byte-exact cut: substring over BINARY slices octets
          expr("decode(substring(encode(tail, 'UTF-8'), 1, content_length), 'UTF-8')"))
          .otherwise(regexp_replace(col("tail"), "(\r\n)+$", ""))
          .as("payload"))
  }

  /** Render one WET-style conversion record. */
  def record(url: String, date: String, payload: String): String = {
    val sb = new StringBuilder
    sb.append(RecordBoundary)
    sb.append("WARC-Type: conversion\r\n")
    sb.append(s"WARC-Target-URI: $url\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    sb.append(s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n")
    sb.append("\r\n")
    sb.append(payload)
    sb.append("\r\n\r\n")
    sb.toString
  }

}
