package graft.core

/** dbt's node-selection mini-language — the `--select`/`--exclude`
  * layer that the reference's `state:modified+` CI selection is one
  * instance of (reference: the `state:modified+` literal in
  * src/dbt_incremental_ci/dbt_helper.py:37-43; the full language is
  * dbt-core's public selector syntax).
  *
  * Supported, matching dbt-core semantics:
  *  - `name`        — that node
  *  - `name+`       — the node and its descendants
  *  - `+name`       — the node and its ancestors
  *  - `+name+`      — both closures
  *  - `@name`       — the node, its descendants, and ALL ancestors of
  *                    those descendants (dbt's at-operator: build a
  *                    mart's whole upstream world in CI)
  *  - `tag:x`       — nodes carrying the tag (composable with +/@)
  *  - `stg_*`       — shell-style name wildcard
  *  - `a b`         — space: union
  *  - `a,b`         — comma: intersection (e.g. `stg_b+,tag:mart`)
  *  - exclude spec  — evaluated with the same grammar, subtracted last
  *
  * Selection is pure driver-side math over model NAMES — O(graph)
  * like ModelGraph, never O(data), so it costs the same on a laptop
  * and a 1000-executor cluster. Unknown names select nothing (dbt
  * warns rather than fails).
  */
object Selector {

  /** Evaluate `spec` (a union of comma-intersection groups), then
    * subtract `exclude` evaluated under the same grammar.
    */
  def select(graph: ModelGraph, spec: String,
      exclude: Option[String] = None): Set[String] = {
    val included = union(graph, spec)
    exclude.filter(_.trim.nonEmpty).fold(included)(e => included -- union(graph, e))
  }

  private def union(graph: ModelGraph, spec: String): Set[String] =
    spec.trim.split("\\s+").filter(_.nonEmpty)
      .map(intersection(graph, _))
      .foldLeft(Set.empty[String])(_ | _)

  private def intersection(graph: ModelGraph, group: String): Set[String] = {
    val atoms = group.split(",").filter(_.nonEmpty)
    require(atoms.nonEmpty, s"empty selector group in '$group'")
    atoms.map(atom(graph, _)).reduce(_ & _)
  }

  private def atom(graph: ModelGraph, raw: String): Set[String] =
    if (raw.startsWith("@")) {
      val down = withClosure(graph, core(graph, raw.drop(1)), downstreamEdges(graph))
      down ++ withClosure(graph, down, upstreamEdges(graph))
    } else {
      val base = core(graph, raw.stripPrefix("+").stripSuffix("+"))
      val withDown =
        if (raw.endsWith("+")) withClosure(graph, base, downstreamEdges(graph))
        else base
      if (raw.startsWith("+")) withDown ++ withClosure(graph, base, upstreamEdges(graph))
      else withDown
    }

  /** A bare atom: tag method, name wildcard, or literal name. */
  private def core(graph: ModelGraph, c: String): Set[String] =
    if (c.startsWith("tag:"))
      graph.models.filter(_.tags.contains(c.drop(4))).map(_.name).toSet
    else if (c.contains("*")) {
      val re = c.split("\\*", -1)
        .map(java.util.regex.Pattern.quote).mkString(".*")
      graph.models.map(_.name).filter(_.matches(re)).toSet
    } else graph.byName.keySet & Set(c)

  private def downstreamEdges(graph: ModelGraph): Map[String, Seq[String]] =
    graph.downstream

  private def upstreamEdges(graph: ModelGraph): Map[String, Seq[String]] =
    graph.models.map(m => m.name -> m.deps.filter(graph.byName.contains)).toMap

  /** Seeds plus everything reachable over `edges` (BFS). */
  private def withClosure(graph: ModelGraph, seeds: Set[String],
      edges: Map[String, Seq[String]]): Set[String] = {
    val seen = scala.collection.mutable.Set(seeds.toSeq: _*)
    val stack = scala.collection.mutable.Stack(seeds.toSeq: _*)
    while (stack.nonEmpty)
      for (n <- edges.getOrElse(stack.pop(), Nil) if seen.add(n)) stack.push(n)
    seen.toSet
  }
}
