package graft.core

/** dbt EXPOSURES: declared DOWNSTREAM consumers of the DAG — a BI
  * dashboard, an ML training job, a reverse-ETL feed. An exposure
  * never executes; it exists so the graph can see PAST the warehouse
  * boundary, which buys three dbt workflows:
  *
  *  - impact analysis: "which dashboards does this PR break?" — the
  *    CI question the reference's `state:modified+` selection stops
  *    one hop short of answering ([[impacted]]);
  *  - selection: `--select +exposure:name` builds exactly the models
  *    an exposure needs ([[selectUpstream]] — composes with
  *    [[Selector]]'s grammar by resolving the exposure to its
  *    upstream set first);
  *  - documentation: owner/kind/url surface in the docs catalog next
  *    to the models feeding them ([[catalogRows]], m25's recipe).
  *
  * Like ModelGraph/Selector/Versioned/AccessControl, all of this is
  * pure driver-side graph math — O(nodes + edges), never O(data).
  */
final case class Exposure(
    name: String,
    kind: String, // dbt: dashboard | notebook | analysis | ml | application
    owner: String,
    dependsOn: Seq[String],
    url: String = "",
    description: String = "")

object Exposures {

  /** Transitive upstream models feeding `e` (including its direct
    * deps) — the exposure's full provenance.
    */
  def upstream(graph: ModelGraph, e: Exposure): Set[String] = {
    val seen = scala.collection.mutable.Set.empty[String]
    val stack = scala.collection.mutable.Stack(
      e.dependsOn.filter(graph.byName.contains): _*)
    while (stack.nonEmpty) {
      val n = stack.pop()
      if (seen.add(n))
        graph.byName(n).deps.filter(graph.byName.contains).foreach(stack.push)
    }
    seen.toSet
  }

  /** dbt `--select +exposure:name`: the models a run must build so
    * the exposure is fresh.
    */
  def selectUpstream(graph: ModelGraph, exposures: Seq[Exposure],
      name: String): Set[String] = {
    val e = exposures.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no exposure named $name"))
    upstream(graph, e)
  }

  /** Exposures reached by a change: the downstream closure of the
    * modified models (ModelGraph.modifiedPlus — dbt
    * `state:modified+`) intersected with each exposure's direct
    * deps. THE CI question — which declared consumers does this PR
    * touch. Deterministic order by exposure name.
    */
  def impacted(graph: ModelGraph, exposures: Seq[Exposure],
      modified: Set[String]): Seq[Exposure] = {
    val reach = graph.modifiedPlus(modified)
    exposures.filter(_.dependsOn.exists(reach)).sortBy(_.name)
  }

  /** Docs-catalog rows: (name, kind, owner, url, depends_on CSV). */
  def catalogRows(exposures: Seq[Exposure]): Seq[(String, String, String, String, String)] =
    exposures.sortBy(_.name).map(e =>
      (e.name, e.kind, e.owner, e.url, e.dependsOn.sorted.mkString(",")))
}
