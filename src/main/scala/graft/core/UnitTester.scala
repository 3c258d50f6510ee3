package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dbt unit tests (dbt-core 1.8 `unit_tests:`): run a model's
  * transform against MOCKED inputs and diff the result against
  * expected rows — the model's logic is tested in isolation, without
  * materializing anything or touching real upstream state.
  *
  * Semantics matched to dbt:
  *  - `given` fixtures override BOTH `ref()` and `source()` by name;
  *    anything not mocked falls through to the real resolver (dbt
  *    requires all inputs mocked, but a fallback is strictly more
  *    permissive and lets fixtures target just the interesting input).
  *  - the model runs with no existing target (`thisTable = None`), so
  *    incremental models exercise their full-refresh branch — exactly
  *    dbt's unit-test behavior of building the model "fresh" from
  *    fixtures.
  *  - comparison is an unordered row-MULTISET diff, like dbt's
  *    expected/actual agate-table compare.
  *
  * Scale note: fixtures are hand-written literal rows (dbt YAML
  * `rows:`), so every frame here is driver-bounded by construction;
  * the report's per-case collect is O(cases), not O(data).
  */
object UnitTester {

  /** One dbt `unit_tests:` entry: mock `given` inputs, run `model`,
    * expect `expect` rows.
    */
  final case class UnitCase(name: String, model: String,
      given: Map[String, DataFrame], expect: DataFrame)

  /** Run the model's transform against the mocked resolver. */
  def run(graph: ModelGraph, c: UnitCase,
      fallback: String => DataFrame): DataFrame = {
    val m = graph.byName(c.model)
    val ctx = new ModelCtx {
      def source(n: String): DataFrame = c.given.getOrElse(n, fallback(n))
      def ref(n: String): DataFrame = c.given.getOrElse(n, fallback(n))
      def thisTable: Option[DataFrame] = None
    }
    m.transform(ctx)
  }

  /** Unordered multiset diff, aligned to `expect`'s column order by
    * NAME (so a transform that reorders columns still compares):
    * actual-only rows tagged `unexpected`, expected-only `missing`.
    * An empty result means the case passes.
    */
  def diff(actual: DataFrame, expect: DataFrame): DataFrame = {
    val a = actual.selectExpr(expect.columns.map(cn => s"`$cn`"): _*)
    a.exceptAll(expect).withColumn("side", lit("unexpected"))
      .unionAll(expect.exceptAll(a).withColumn("side", lit("missing")))
  }

  /** dbt-test-style report: one row per case —
    * (case_name, model, status, n_unexpected, n_missing).
    */
  def report(spark: SparkSession, graph: ModelGraph, cases: Seq[UnitCase],
      fallback: String => DataFrame): DataFrame = {
    val s = spark
    import s.implicits._
    cases.map { c =>
      val counts = diff(run(graph, c, fallback), c.expect)
        .groupBy("side").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val unexpected = counts.getOrElse("unexpected", 0L)
      val missing = counts.getOrElse("missing", 0L)
      (c.name, c.model,
        if (unexpected + missing == 0) "pass" else "fail",
        unexpected, missing)
    }.toDF("case_name", "model", "status", "n_unexpected", "n_missing")
  }
}
