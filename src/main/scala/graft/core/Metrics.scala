package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** dbt SEMANTIC LAYER (MetricFlow): metrics defined ONCE against a
  * semantic model — entities, dimensions, a time dimension, measures
  * — and compiled per query into a Spark plan, so every dashboard
  * asking for "revenue by segment by month" gets the same number
  * from the same definition instead of re-hand-writing the
  * aggregation (the metric-drift problem the semantic layer exists
  * to kill).
  *
  * Metric types mirror MetricFlow's: `simple` (an aggregated
  * measure), `ratio` (numerator/denominator — computed from the SAME
  * grouped row, never a join of two aggregates), `derived` (an
  * expression over other metrics), `cumulative` (running total over
  * the time grain).
  *
  * Compilation shape, which is the scale story: ONE scan + ONE hash
  * aggregation per query however many metrics it asks for — all
  * referenced measures fold into the same groupBy (map-side
  * combined), ratio/derived metrics are column arithmetic ON the
  * grouped row, and cumulative metrics add one window partitioned by
  * the non-time dimensions (state = one running value per group). A
  * 100 TB fact pays the aggregation once; metric count is free.
  */
object Metrics {

  /** A measure: aggregation over a column of the model's table. */
  final case class Measure(agg: String, expr: Column) {
    private[core] def toAgg: Column = agg match {
      case "sum" => sum(expr)
      case "count" => count(expr)
      case "count_distinct" => countDistinct(expr)
      case "min" => min(expr)
      case "max" => max(expr)
      case "avg" => avg(expr)
      case other => throw new IllegalArgumentException(
        s"unsupported measure agg '$other'")
    }
  }

  /** The semantic model: the table, its dimensions (name → column),
    * the time dimension, and named measures — dbt's `semantic_models:`
    * yml block as data.
    */
  final case class SemanticModel(
      table: DataFrame,
      dimensions: Map[String, Column],
      timeDimension: Column,
      measures: Map[String, Measure])

  sealed trait Metric { def name: String }
  /** An aggregated measure, optionally filtered (MetricFlow
    * `filter:` — applied to the INPUT rows, pre-aggregation).
    */
  final case class Simple(name: String, measure: String,
      filter: Option[Column] = None) extends Metric
  /** numerator / denominator, NULL on zero denominator. */
  final case class Ratio(name: String, numerator: String,
      denominator: String) extends Metric
  /** Expression over already-computed metric columns. */
  final case class Derived(name: String,
      expr: Map[String, Column] => Column,
      inputs: Seq[String]) extends Metric
  /** Running total of a simple metric over the time grain. */
  final case class Cumulative(name: String, base: String) extends Metric

  /** Compile a metric query: `metrics` at (`groupBy` dims ×
    * `grain` ∈ day|month|year). Returns one row per group with one
    * column per requested metric.
    */
  def query(model: SemanticModel, metrics: Seq[Metric],
      groupBy: Seq[String], grain: String): DataFrame = {
    val grainCol = grain match {
      case "day" => to_date(model.timeDimension)
      case "month" => date_trunc("month", model.timeDimension)
        .cast("date")
      case "year" => date_trunc("year", model.timeDimension).cast("date")
      case other => throw new IllegalArgumentException(
        s"unsupported grain '$other'")
    }
    // resolve the transitive simple-metric set: ratio/derived/
    // cumulative metrics pull their inputs into the SAME aggregation
    def simpleDeps(m: Metric): Seq[Simple] = m match {
      case s: Simple => Seq(s)
      case r: Ratio => Seq(byName(r.numerator), byName(r.denominator))
        .flatMap(simpleDeps)
      case d: Derived => d.inputs.map(byName).flatMap(simpleDeps)
      case c: Cumulative => simpleDeps(byName(c.base))
    }
    lazy val byName: Map[String, Metric] =
      metrics.map(m => m.name -> m).toMap.withDefault(n =>
        throw new IllegalArgumentException(s"metric '$n' not in query"))
    val simples = metrics.flatMap(simpleDeps).distinct
    require(simples.nonEmpty,
      "metric query resolves to no measures — at least one simple " +
        "metric (directly or via ratio/derived/cumulative inputs) is required")
    val aggCols = simples.map { s =>
      val meas = model.measures.getOrElse(s.measure,
        throw new IllegalArgumentException(s"unknown measure '${s.measure}'"))
      // filtered simple metric: the filter gates the INPUT rows of
      // this one metric, inside the shared aggregation
      val gated = s.filter.fold(meas)(f =>
        meas.copy(expr = when(f, meas.expr)))
      gated.toAgg.as(s.name)
    }
    val dims = groupBy.map(d => model.dimensions.getOrElse(d,
      throw new IllegalArgumentException(s"unknown dimension '$d'")).as(d))
    val grouped = model.table
      .groupBy((dims :+ grainCol.as(s"metric_time__$grain")): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    // non-simple metrics are column arithmetic on the grouped row
    val cols = scala.collection.mutable.Map.empty[String, Column]
    simples.foreach(s => cols(s.name) = col(s.name))
    def colOf(name: String): Column = cols.getOrElseUpdate(name,
      byName(name) match {
        case s: Simple => col(s.name)
        case r: Ratio =>
          colOf(r.numerator).cast("double") /
            nullif(colOf(r.denominator).cast("double"), lit(0.0d))
        case d: Derived =>
          d.expr(d.inputs.map(i => i -> colOf(i)).toMap)
        case c: Cumulative =>
          sum(colOf(c.base)).over(
            Window.partitionBy(groupBy.map(col): _*)
              .orderBy(col(s"metric_time__$grain"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      })
    val outCols = groupBy.map(col) ++
      Seq(col(s"metric_time__$grain")) ++
      metrics.map(m => colOf(m.name).as(m.name))
    grouped.select(outCols: _*)
  }
}
