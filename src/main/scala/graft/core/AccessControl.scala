package graft.core

/** dbt MODEL GOVERNANCE (dbt-core ≥1.5 `groups` + `access` model
  * config, the contract layer under dbt Mesh): a model declares who
  * may `ref` it, and the violation is a COMPILE-time error — caught
  * when the DAG is assembled, not discovered as a broken relation in
  * production.
  *
  *  - `private`: ref-able only from models in the SAME group — the
  *    team's internal plumbing;
  *  - `protected` (dbt's default): ref-able from anywhere in the
  *    same package/project, but not across projects;
  *  - `public`: the stable interface — ref-able from anywhere,
  *    including other packages (dbt Mesh's cross-project ref).
  *
  * Like [[Versioned]] and [[Selector]], this is pure driver-side
  * graph validation — O(edges in the model DAG), never O(data), so
  * it costs the same against a 100 TB warehouse as against a test
  * fixture. Governance composes with versions: lowered `_v<k>`
  * relations are plain graph nodes, so an old version can be taken
  * private to force migration while the new one stays public.
  */
sealed trait Access
object Access {
  /** Same-group refs only. */
  case object Private extends Access
  /** Same-package refs only (dbt's default). */
  case object Protected extends Access
  /** Ref-able from anywhere — the published interface. */
  case object Public extends Access

  def name(a: Access): String = a match {
    case Private   => "private"
    case Protected => "protected"
    case Public    => "public"
  }
}

/** A model's governance declaration: owning group, access level, and
  * the package it ships in (single-project setups leave `pkg` at the
  * default).
  */
final case class Governance(group: String, access: Access,
    pkg: String = "main") {
  // a private model with an empty group would match every ungoverned
  // consumer's empty group — the opposite of what Private means
  require(access != Access.Private || group.nonEmpty,
    "a private model must declare a non-empty group")
}

object AccessControl {

  /** dbt's default for an ungoverned model: protected, main package,
    * no group (so it can never satisfy a private same-group check).
    */
  val Ungoverned: Governance = Governance("", Access.Protected)

  /** May `consumer` reference a dep declared as `dep`? The access
    * decision, exactly as dbt resolves it at parse time.
    */
  def allowed(consumer: Governance, dep: Governance): Boolean =
    dep.access match {
      case Access.Private   => consumer.group == dep.group
      case Access.Protected => consumer.pkg == dep.pkg
      case Access.Public    => true
    }

  /** Every ref edge in the graph that violates its dep's declared
    * access — deterministically ordered (consumer, dep). Empty means
    * the graph compiles. An UNGOVERNED dep defaults to [[Ungoverned]]
    * (protected, main package) on the dep side too — dbt's default,
    * so a cross-package consumer cannot slip through just because the
    * dep never wrote a governance entry.
    */
  def violations(graph: ModelGraph,
      gov: Map[String, Governance]): Seq[String] =
    for {
      consumer <- graph.models.sortBy(_.name)
      dep <- consumer.deps.distinct.sorted
      if graph.byName.contains(dep)
      dg = gov.getOrElse(dep, Ungoverned)
      cg = gov.getOrElse(consumer.name, Ungoverned)
      if !allowed(cg, dg)
    } yield s"model ${consumer.name} (group '${cg.group}', package " +
      s"'${cg.pkg}') is not allowed to reference ${Access.name(dg.access)} " +
      s"model $dep (group '${dg.group}', package '${dg.pkg}')"

  /** Fail compilation on the first governance breach — call before
    * handing the graph to the Runner (dbt's parse-time enforcement).
    */
  def enforce(graph: ModelGraph, gov: Map[String, Governance]): Unit = {
    val v = violations(graph, gov)
    require(v.isEmpty, v.mkString("; "))
  }
}
