package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over a scale-factor directory of parquet tables.
  *
  * Plays the role of the reference's `raw_edu` source schema
  * (reference: DbtEducationalDataProject/models/staging/sources.yml) —
  * every query resolves its inputs here, like dbt's `source()`.
  *
  * Scale note: `spark.read.parquet` gives Catalyst a relation with
  * full pushdown (PushedFilters / ReadSchema pruning), so filters and
  * projections written against these tables reach the scan. At 100 TB
  * the same code works over a partitioned table root; nothing here
  * assumes single files.
  */
final case class Catalog(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark
    * refuses natively; read it as long and truncate to microseconds —
    * the same truncation every micro-precision engine (incl. the
    * DuckDB oracle) applies. Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` in the SESSION
    * builder (Verify/Bench/Main/the test session all set it) — a
    * per-call `conf.set` here would mutate shared session state from
    * read paths.
    */
  private def eventsWithTs: DataFrame = {
    val raw = table("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  def events: DataFrame     = eventsWithTs
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
