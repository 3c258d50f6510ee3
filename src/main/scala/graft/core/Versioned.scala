package graft.core

/** dbt MODEL VERSIONS (dbt-core ≥1.5 `versions:` / `latest_version:`
  * model config) — the authoring surface a dbt project adopts when a
  * model needs a BREAKING change (column rename, semantic filter)
  * while its consumers migrate at their own pace:
  *
  *  - each version materializes as its own relation `<name>_v<k>`
  *    (dbt's default versioned alias);
  *  - `{{ ref('name') }}` with no version argument resolves to the
  *    LATEST version's relation — unpinned consumers float forward
  *    when `latest_version` is bumped;
  *  - `{{ ref('name', v=K) }}` pins version K — that consumer keeps
  *    the old contract until it migrates deliberately;
  *  - a `deprecation_date` on an old version turns every pinned ref
  *    into a named warning (dbt's model-deprecation warning), the
  *    nudge that retires v1 without breaking anyone overnight.
  *
  * Everything here is pure driver-side name/graph rewriting —
  * O(number of models), never O(data). The lowered graph is plain
  * [[Model]]s, so materializations, `state:modified` CI selection,
  * contracts, docs, and selectors all apply to versioned models with
  * no special cases. Ref resolution happens at TEXT level, BEFORE
  * [[SqlModel.apply]] expands the body: the concrete `_v<k>` name
  * lands in the consumer's checksummed body, so bumping
  * `latest_version` changes every floating consumer's checksum and
  * `state:modified+` selects exactly the consumers the bump re-binds
  * — the same manifest diff dbt produces for a version bump.
  *
  * Reference scope note: the reference project (43 models) predates
  * model versions; this implements the dbt feature set its users
  * would reach for at the first breaking schema change
  * (cited surface: dbt_project.yml-style model configs).
  */
final case class VersionedModel(
    name: String,
    versions: Seq[(Int, Model)],
    latestVersion: Int,
    deprecationDates: Map[Int, String] = Map.empty) {
  require(versions.nonEmpty, s"versioned model $name declares no versions")
  require(versions.map(_._1).distinct.size == versions.size,
    s"versioned model $name has duplicate version numbers")
  require(versions.exists(_._1 == latestVersion),
    s"versioned model $name: latest_version=$latestVersion is not a declared version")
  require(deprecationDates.keySet.subsetOf(versions.map(_._1).toSet),
    s"versioned model $name: deprecation_date on an undeclared version")

  /** The lowered relation name of version `v` (dbt: `<name>_v<k>`). */
  def concrete(v: Int): String = s"${name}_v$v"
  /** The relation an unpinned `ref('name')` binds to. */
  def latest: String = concrete(latestVersion)
}

object Versioned {

  private val AnyRef =
    """\{\{\s*ref\(\s*'([A-Za-z0-9_]+)'(?:\s*,\s*v\s*=\s*(\d+))?\s*\)\s*\}\}""".r

  /** Resolve version-aware refs in SQL text to concrete lowered
    * names: `ref('m', v=K)` → `ref('m_vK')`, bare `ref('m')` of a
    * versioned model → `ref('m_v<latest>')`; refs to non-versioned
    * models pass through untouched. ONE pass over the source text —
    * emitted replacement text is never re-scanned, so a concrete
    * `_v<k>` name that happens to equal another spec's model name
    * cannot be rewritten twice. Apply BEFORE [[SqlModel.apply]] so
    * DAG edges and body checksums see the concrete binding. A pinned
    * ref to an unknown model or undeclared version fails parse-time
    * — dbt's compile-time ref validation, not a silent miss at run
    * time.
    */
  def rewriteRefs(sql: String, specs: Seq[VersionedModel]): String = {
    val byName = specs.map(s => s.name -> s).toMap
    AnyRef.replaceAllIn(sql, m => {
      val pinned = Option(m.group(2))
      byName.get(m.group(1)) match {
        case None =>
          pinned.foreach(v => throw new IllegalArgumentException(
            s"ref('${m.group(1)}', v=$v) names no versioned model"))
          scala.util.matching.Regex.quoteReplacement(m.matched)
        case Some(spec) =>
          val target = pinned match {
            case None => spec.latest
            case Some(vs) =>
              val v = vs.toInt
              require(spec.versions.exists(_._1 == v),
                s"ref('${spec.name}', v=$v): no such version (declared: " +
                  s"${spec.versions.map(_._1).mkString(",")})")
              spec.concrete(v)
          }
          scala.util.matching.Regex.quoteReplacement(s"{{ ref('$target') }}")
      }
    })
  }

  /** Lower a versioned model into plain graph nodes: one [[Model]]
    * per version, renamed to its concrete `_v<k>` relation. Bodies
    * (and so checksums) stay per-version — editing only v2 marks
    * only v2's node modified.
    */
  def lower(spec: VersionedModel): Seq[Model] =
    spec.versions.map { case (v, m) => m.copy(name = spec.concrete(v)) }

  /** dbt's deprecation warnings: one line per graph edge into a
    * version carrying a `deprecation_date` (after text-level
    * rewriting, pinned and floated refs to that version are
    * indistinguishable — both reference the concrete relation, and
    * both deserve the warning). Deterministic order (spec, version,
    * consumer name). Deprecating the LATEST version warns without a
    * migrate-to target — there is no newer version to point at.
    */
  def deprecationWarnings(specs: Seq[VersionedModel],
      graph: ModelGraph): Seq[String] =
    for {
      spec <- specs
      (v, date) <- spec.deprecationDates.toSeq.sortBy(_._1)
      consumer <- graph.models.sortBy(_.name)
      if consumer.deps.contains(spec.concrete(v))
    } yield s"model ${consumer.name} references ${spec.name}.v$v " +
      (if (v == spec.latestVersion)
        s"(deprecated $date; no newer version declared)"
      else s"(deprecated $date) — migrate to ${spec.name}.v${spec.latestVersion}")
}
