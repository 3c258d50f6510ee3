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
  // ---- selectors.yml: dbt's persisted NAMED selectors ----

  /** A named selector definition: `--selector <name>` resolves to
    * `select(graph, definition, exclude)`.
    */
  final case class NamedSelector(name: String, definition: String,
      exclude: Option[String])

  /** Parse dbt's `selectors.yml`. Hand-rolled line parser (the
    * Jinja.scala discipline — the grammar a project actually writes
    * is small and spec-pinned; no YAML engine dependency). Supported:
    *
    * {{{
    * selectors:
    *   - name: nightly
    *     description: free text (ignored)
    *     definition: "tag:nightly+"        # inline mini-language
    *   - name: marts_world
    *     definition:
    *       union:                          # list -> space-union
    *         - "@mart_x"
    *         - "stg_c+"
    *   - name: nightly_marts
    *     definition:
    *       intersection:                   # list -> comma-intersection
    *         - "tag:nightly"
    *         - "tag:mart"
    *   - name: no_staging
    *     definition: "+mart_y"
    *     exclude:
    *       - "tag:staging"
    * }}}
    *
    * union/intersection compose INTO the mini-language (space/comma),
    * so every named selector is exactly one `select()` call — the
    * same evaluation path as an inline `--select`, never a parallel
    * engine that could drift.
    */
  def parseSelectorsYaml(text: String): Map[String, NamedSelector] = {
    def strip(s: String): String = {
      // drop comments (outside quotes), surrounding quotes, whitespace
      val noC = s.indexOf('#') match {
        case i if i >= 0 && !s.take(i).count(_ == '"').%(2).==(1) => s.take(i)
        case _ => s
      }
      val t = noC.trim
      if ((t.startsWith("\"") && t.endsWith("\"")) ||
          (t.startsWith("'") && t.endsWith("'")))
        t.substring(1, t.length - 1)
      else t
    }
    val lines = text.split("\n").toSeq
      .map(l => (l.takeWhile(_ == ' ').length, l.trim))
      .filter { case (_, t) => t.nonEmpty && !t.startsWith("#") }
    require(lines.headOption.exists(_._2 == "selectors:"),
      "selectors.yml must start with a 'selectors:' document key")
    var out = Vector.empty[NamedSelector]
    var name: Option[String] = None
    var definition: Option[String] = None
    var exclude: Vector[String] = Vector.empty
    // list collection state: which key's block list we are inside,
    // and the join that folds it into the mini-language
    var listKey: Option[(String, String)] = None // (key, join)
    var listItems: Vector[String] = Vector.empty
    def closeList(): Unit = listKey.foreach { case (key, join) =>
      require(listItems.nonEmpty, s"empty $key list in selectors.yml")
      val folded = listItems.mkString(join)
      key match {
        case "definition" => definition = Some(folded)
        case "exclude" => exclude = exclude ++ listItems
        case _ => ()
      }
      listKey = None; listItems = Vector.empty
    }
    def closeSelector(): Unit = name.foreach { n =>
      closeList()
      require(definition.exists(_.nonEmpty),
        s"selector '$n' has no definition")
      out :+= NamedSelector(n, definition.get,
        Option(exclude.mkString(" ")).filter(_.nonEmpty))
      name = None; definition = None; exclude = Vector.empty
    }
    for ((_, t) <- lines.drop(1)) {
      if (t.startsWith("- name:")) {
        closeSelector()
        name = Some(strip(t.stripPrefix("- name:")))
      } else if (t.startsWith("definition:")) {
        closeList()
        val inline = strip(t.stripPrefix("definition:"))
        if (inline.nonEmpty) definition = Some(inline)
        // else: block form — union:/intersection: follows
      } else if (t.startsWith("union:")) {
        closeList(); listKey = Some(("definition", " "))
      } else if (t.startsWith("intersection:")) {
        closeList(); listKey = Some(("definition", ","))
      } else if (t.startsWith("exclude:")) {
        closeList()
        val inline = strip(t.stripPrefix("exclude:"))
        if (inline.nonEmpty) exclude :+= inline
        else listKey = Some(("exclude", " "))
      } else if (t.startsWith("- ") || t == "-") {
        require(listKey.isDefined,
          s"stray list item '$t' in selectors.yml")
        listItems :+= strip(t.stripPrefix("-"))
      } else if (t.startsWith("description:")) {
        closeList() // free text, ignored
      } else {
        require(false, s"unsupported selectors.yml line: '$t'")
      }
    }
    closeSelector()
    require(out.map(_.name).distinct.size == out.size,
      "duplicate selector names in selectors.yml")
    out.map(s => s.name -> s).toMap
  }

  /** Resolve `--selector name` against parsed selectors.yml — one
    * [[select]] call, identical semantics to the inline spec.
    */
  def selectNamed(graph: ModelGraph,
      selectors: Map[String, NamedSelector], name: String): Set[String] = {
    val s = selectors.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown selector '$name' (have: ${selectors.keys.toSeq.sorted.mkString(", ")})"))
    select(graph, s.definition, s.exclude)
  }
}
