package graft.core

import org.apache.spark.sql.DataFrame

/** Topological DAG runner — `dbt run` over a graft ModelGraph: every
  * model executes after its deps, `ref()` resolves to the dep's
  * materialized output, unknown names fall through to raw sources
  * (dbt `source()`).
  *
  * Driver-side loop is O(models), not O(data): each step only declares
  * the next Spark job. Views stay lazy (their plan is composed into
  * downstream models — Catalyst sees through them, exactly like a SQL
  * view), so a 3-layer staging→intermediate→mart pipeline collapses
  * into as few physical jobs as there are persisted models.
  */
final case class Runner(mat: Materializer, sources: String => DataFrame,
    fullRefresh: Boolean = false) {

  /** Run every model in topological order; returns name → output. */
  def runAll(graph: ModelGraph): Map[String, DataFrame] =
    runSelected(graph, graph.topoOrder)

  /** Run `names` (must already be topologically ordered). */
  def runSelected(graph: ModelGraph, names: Seq[String]): Map[String, DataFrame] =
    names.foldLeft(Map.empty[String, DataFrame]) { (acc, name) =>
      val model = graph.byName(name)
      val resolve: String => DataFrame = n => acc.getOrElse(n, sources(n))
      acc + (name -> mat.run(model, resolve, fullRefresh))
    }
}
