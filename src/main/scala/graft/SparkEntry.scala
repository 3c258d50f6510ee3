package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Engine, LlmOps, Q, Quality, Relational, Streaming}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All implemented operators, one Q per SURVEY.md §2 line. */
  def registry: Seq[Q] =
    Relational.all ++ Engine.all ++ Quality.all ++ LlmOps.all ++ Streaming.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val m = registry.map(q => q.name -> q.run).toMap
    require(m.size == registry.size,
      "duplicate query names would silently drop coverage")
    m
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
