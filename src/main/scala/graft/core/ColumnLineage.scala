package graft.core

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project, SubqueryAlias, UnaryNode, UnresolvedWith}

/** COLUMN-LEVEL lineage for SQL-text models: which SOURCE columns
  * does each output column of each model derive from — the
  * column-granular refinement of the reference's model-level
  * `state:modified+` impact analysis (dbt tracks edges between
  * models; changing `customer.c_phone` should not flag a mart that
  * only reads `c_name`).
  *
  * Spark-first by construction: the SQL is parsed with Catalyst's own
  * parser (`sparkSession.sessionState.sqlParser.parsePlan`) and the
  * lineage walk runs over the UNRESOLVED logical plan — no regex over
  * SQL text, no second grammar to maintain; anything Spark can parse,
  * this can walk. Resolution is the textbook scope walk the analyzer
  * itself performs: FROM-clause relations (base tables, CTEs,
  * aliased subqueries, joins) build a scope; each SELECT-list item's
  * attribute leaves resolve against it (qualified by alias, or
  * unambiguously unqualified — ambiguity throws, as the analyzer
  * would).
  *
  * Semantics (matching what column-lineage catalogs report):
  *  - an aliased expression depends on every column it references
  *    (`a + b AS s` → {a, b}); `count(*)` depends on nothing;
  *  - `SELECT *` / `SELECT t.*` expand through the scope;
  *  - CTEs and subqueries thread lineage through their own select
  *    lists; model refs resolve through upstream models transitively
  *    down to source-table columns ([[toSources]]).
  *
  * Pure driver-side plan analysis — O(plan nodes), never touches
  * data; schemas come in as column-name lists.
  */
object ColumnLineage {

  /** A source-table column: (relation, column). */
  type Src = (String, String)

  /** One visible column with the source columns it derives from. */
  final case class Col(name: String, srcs: Set[Src])

  /** FROM-clause scope: (qualifier, columns) per visible relation. */
  private final case class Scope(rels: Seq[(String, Seq[Col])]) {
    def lookup(parts: Seq[String]): Set[Src] = parts match {
      case Seq(c) =>
        val hits = rels.flatMap { case (_, cols) =>
          cols.filter(_.name.equalsIgnoreCase(c)) }
        if (hits.isEmpty)
          throw new IllegalArgumentException(s"unresolved column: $c")
        if (hits.size > 1)
          throw new IllegalArgumentException(
            s"ambiguous column: $c (qualify it)")
        hits.head.srcs
      case Seq(q, c) =>
        val cols = rels.collectFirst {
          case (qq, cs) if qq.equalsIgnoreCase(q) => cs
        }.getOrElse(throw new IllegalArgumentException(
          s"unknown relation or alias: $q"))
        cols.find(_.name.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalArgumentException(s"unresolved column: $q.$c")).srcs
      case other =>
        throw new IllegalArgumentException(
          s"nested field lineage unsupported: ${other.mkString(".")}")
    }
    def star(target: Option[Seq[String]]): Seq[Col] = target match {
      case None => rels.flatMap(_._2)
      case Some(Seq(q)) => rels.collectFirst {
        case (qq, cs) if qq.equalsIgnoreCase(q) => cs
      }.getOrElse(throw new IllegalArgumentException(
        s"unknown relation or alias: $q.*"))
      case Some(other) =>
        throw new IllegalArgumentException(
          s"unsupported star target: ${other.mkString(".")}.*")
    }
  }

  private def relCols(name: String, env: Map[String, Seq[Col]]): Seq[Col] =
    env.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"unknown relation: $name"))

  /** Attribute leaves of an expression, resolved through the scope.
    * Stars inside function args (`count(*)`) contribute nothing —
    * the count depends on row existence, not any column's values.
    */
  private def refsIn(e: Expression, scope: Scope): Set[Src] =
    e.collect { case u: UnresolvedAttribute => scope.lookup(u.nameParts) }
      .flatten.toSet

  private def project(list: Seq[NamedExpression], scope: Scope): Seq[Col] =
    list.flatMap {
      case s: UnresolvedStar => scope.star(s.target)
      case u: UnresolvedAttribute =>
        Seq(Col(u.nameParts.last, scope.lookup(u.nameParts)))
      case a: Alias => Seq(Col(a.name, refsIn(a.child, scope)))
      case ua: UnresolvedAlias =>
        throw new IllegalArgumentException(
          s"alias required for computed column: ${ua.child.sql}")
      case other =>
        throw new IllegalArgumentException(
          s"unsupported select item: $other")
    }

  /** Output columns of a parsed (unresolved) plan. `env` maps visible
    * relation names (sources, upstream models, outer CTEs) to their
    * already-lineaged columns.
    */
  private def outputOf(plan: LogicalPlan, env: Map[String, Seq[Col]]): Seq[Col] =
    plan match {
      case w: UnresolvedWith =>
        // CTEs see sources + previously-defined CTEs (no recursion)
        val inner = w.cteRelations.foldLeft(env) { case (acc, cte) =>
          acc + (cte._1.toLowerCase -> outputOf(cte._2.child, acc))
        }
        outputOf(w.child, inner)
      case p: Project => project(p.projectList, scopeOf(p.child, env))
      case a: Aggregate => project(a.aggregateExpressions, scopeOf(a.child, env))
      case s: SubqueryAlias => outputOf(s.child, env)
      case u: UnresolvedRelation => relCols(u.multipartIdentifier.last, env)
      case u: UnaryNode => outputOf(u.child, env) // Filter/Sort/Limit/Distinct…
      case other =>
        throw new IllegalArgumentException(
          s"unsupported plan node: ${other.nodeName}")
    }

  /** FROM-clause scope of a plan: every visible (qualifier, columns).
    * A base relation's qualifier is its own name; a SubqueryAlias
    * re-qualifies whatever it wraps; joins concatenate.
    */
  private def scopeOf(plan: LogicalPlan, env: Map[String, Seq[Col]]): Scope =
    plan match {
      case j: Join => Scope(scopeOf(j.left, env).rels ++ scopeOf(j.right, env).rels)
      case s: SubqueryAlias =>
        Scope(Seq(s.identifier.name -> outputOf(s.child, env)))
      case u: UnresolvedRelation =>
        val n = u.multipartIdentifier.last
        Scope(Seq(n -> relCols(n, env)))
      case f: Filter => scopeOf(f.child, env)
      case other => Scope(Seq("" -> outputOf(other, env)))
    }

  private val RefPat = """\{\{\s*ref\(\s*'([A-Za-z0-9_]+)'\s*\)\s*\}\}""".r
  private val SourcePat =
    """\{\{\s*source\(\s*'([A-Za-z0-9_]+)'\s*,\s*'([A-Za-z0-9_]+)'\s*\)\s*\}\}""".r

  /** Lower `{{ ref('m') }}` / `{{ source('s','t') }}` to bare
    * relation names so the text parses as plain SQL — lineage needs
    * the NAME of the upstream, not its bound relation.
    */
  private def lower(sql: String): String =
    SourcePat.replaceAllIn(RefPat.replaceAllIn(sql, _.group(1)), _.group(2))

  /** Direct lineage of one model body: each output column with the
    * upstream (relation, column) pairs it reads. `schemas` maps every
    * referenced relation to its columns.
    */
  def ofSql(spark: SparkSession, sql: String,
      schemas: Map[String, Seq[String]]): Seq[Col] = {
    val env = schemas.map { case (t, cs) =>
      t.toLowerCase -> cs.map(c => Col(c, Set((t, c): Src)))
    }
    outputOf(spark.sessionState.sqlParser.parsePlan(lower(sql)), env)
  }

  /** Whole-DAG lineage resolved transitively to SOURCE columns:
    * model name -> its columns, each carrying only (source table,
    * source column) pairs. Models are walked in dependency order;
    * when model X refs model Y, Y's already-source-resolved columns
    * ARE X's view of Y, so transitivity falls out of the same scope
    * walk with no substitution pass.
    */
  def toSources(spark: SparkSession, models: Seq[(String, String)],
      sources: Map[String, Seq[String]]): Map[String, Seq[Col]] = {
    val names = models.map(_._1).toSet
    val deps: Map[String, Seq[String]] = models.map { case (n, sql) =>
      n -> RefPat.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct
        .filter(names.contains)
    }.toMap
    // Kahn order, name tiebreak for determinism (ModelGraph's recipe)
    val indeg = mutable.Map(models.map { case (n, _) => n -> deps(n).size }: _*)
    val down = deps.toSeq.flatMap { case (n, ds) => ds.map(_ -> n) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val ready = mutable.PriorityQueue(
      indeg.collect { case (n, 0) => n }.toSeq: _*)(Ordering[String].reverse)
    val order = mutable.ArrayBuffer.empty[String]
    while (ready.nonEmpty) {
      val n = ready.dequeue()
      order += n
      for (d <- down.getOrElse(n, Nil)) {
        indeg(d) -= 1
        if (indeg(d) == 0) ready.enqueue(d)
      }
    }
    require(order.size == models.size, s"cycle among: ${
      indeg.collect { case (n, d) if d > 0 => n }.mkString(", ")}")
    val bodies = models.toMap
    val env = mutable.Map[String, Seq[Col]](sources.map { case (t, cs) =>
      t.toLowerCase -> cs.map(c => Col(c, Set((t, c): Src)))
    }.toSeq: _*)
    val out = mutable.Map.empty[String, Seq[Col]]
    for (n <- order) {
      val cols = outputOf(
        spark.sessionState.sqlParser.parsePlan(lower(bodies(n))), env.toMap)
      out(n) = cols
      env(n.toLowerCase) = cols
    }
    out.toMap
  }

  /** The column-level CI question: which (model, column) pairs are
    * reachable from a modified SOURCE column — `state:modified+` at
    * column granularity. A mart that never reads the column is NOT
    * flagged, the precision model-level diffing can't give.
    */
  def impactedColumns(lineage: Map[String, Seq[Col]],
      source: Src): Seq[(String, String)] =
    lineage.toSeq.flatMap { case (m, cols) =>
      cols.collect { case c if c.srcs.exists(s =>
        s._1.equalsIgnoreCase(source._1) &&
          s._2.equalsIgnoreCase(source._2)) => (m, c.name) }
    }.sorted
}
