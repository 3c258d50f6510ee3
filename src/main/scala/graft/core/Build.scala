package graft.core

import org.apache.spark.sql.DataFrame

/** `dbt build`: models AND their tests as one DAG run — each model's
  * tests execute immediately after it materializes, and a test
  * failure SKIPS everything downstream of that model while
  * independent branches run to completion. This is the semantics
  * that makes `build` safer than `run; test`: a broken staging model
  * can never feed a mart (dbt docs: "if a test fails, downstream
  * nodes are skipped"), but the blast radius is exactly the failed
  * node's descendants, not the whole run.
  *
  * Driver-side orchestration is O(nodes); the heavy lifting stays in
  * each model's Catalyst plan and each test's aggregate. Tests are
  * violation COUNTS (dbt's contract: pass == zero rows), so a test
  * costs one aggregation over the just-built relation — at 100 TB
  * the scan the test pays is the price of the gate, which is why
  * dbt orders tests right after their model while its output is
  * hottest.
  */
object Build {

  /** One node's outcome: status ∈ success | test_failed:<tests> |
    * skipped:<first blocking upstream>.
    */
  final case class NodeResult(name: String, status: String)

  /** Run the DAG with test gates. `tests(model)` = (test name,
    * violation-count frame builder) pairs; the builder receives the
    * model's materialized output.
    */
  def run(mat: Materializer, graph: ModelGraph,
      sources: String => DataFrame,
      tests: Map[String, Seq[(String, DataFrame => DataFrame)]])
      : Seq[NodeResult] = {
    val outs = scala.collection.mutable.Map.empty[String, DataFrame]
    val blocked = scala.collection.mutable.Map.empty[String, String]
    graph.topoOrder.map { name =>
      val model = graph.byName(name)
      val badDep = model.deps.find(blocked.contains)
      badDep match {
        case Some(d) =>
          // a skip propagates: this node now blocks ITS descendants
          blocked(name) = d
          NodeResult(name, s"skipped:$d")
        case None =>
          val out = mat.run(model,
            n => outs.getOrElse(n, sources(n)))
          outs(name) = out
          val failed = tests.getOrElse(name, Nil).collect {
            case (tName, violations) if !violations(out).isEmpty => tName
          }
          if (failed.isEmpty) NodeResult(name, "success")
          else {
            blocked(name) = name
            NodeResult(name, s"test_failed:${failed.sorted.mkString(",")}")
          }
      }
    }
  }
}
