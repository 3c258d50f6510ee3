package graft.core

import org.apache.spark.sql.DataFrame

/** SQL-TEXT models: the reference's actual authoring surface. Its 43
  * models are `.sql` files whose Jinja calls (`{{ ref('…') }}`,
  * `{{ source('…','…') }}`, `{{ this }}`,
  * `{% if is_incremental() %} … {% endif %}` — e.g.
  * models/staging/stg_enrollments_incremental.sql) resolve at parse
  * time into the dependency graph and at run time into relations.
  * graft's `Model` carries a Scala transform; this layer makes a
  * Model FROM SQL text, so a user can port a dbt project's SQL
  * verbatim modulo dialect:
  *
  *  - deps come from scanning the text for `ref()` — exactly how dbt
  *    builds its DAG (no declaration besides the SQL itself);
  *  - `body` IS the SQL text, so manifest checksums / state:modified
  *    detection work on the same artifact dbt checksums;
  *  - rendering binds each ref/source/this to a uniquely-suffixed
  *    temp view over the ModelCtx resolution (unique per render, so
  *    the parallel Runner's threads never collide), runs
  *    `spark.sql`, forces analysis, then drops the views — the
  *    returned frame is a plain Catalyst plan with full pushdown,
  *    identical in optimization surface to a hand-written transform;
  *  - `{% if is_incremental() %}` blocks are kept on incremental
  *    runs against an existing target and stripped otherwise —
  *    dbt's exact contract, which is what makes the watermark
  *    predicate (`> (SELECT max(…) FROM {{ this }})`) safe on the
  *    first build.
  *
  * Scale: nothing here touches data — rendering is string work on
  * the driver; the heavy lifting stays in Catalyst, which sees the
  * same logical plan it would from the DataFrame API.
  */
object SqlModel {

  private val RefPat = """\{\{\s*ref\(\s*'([A-Za-z0-9_]+)'\s*\)\s*\}\}""".r
  private val SourcePat =
    """\{\{\s*source\(\s*'([A-Za-z0-9_]+)'\s*,\s*'([A-Za-z0-9_]+)'\s*\)\s*\}\}""".r
  private val ThisPat = """\{\{\s*this\s*\}\}""".r
  private val IncrPat =
    """(?s)\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}""".r

  /** Upstream model names referenced by the text (dbt's DAG edge
    * derivation). A ref inside an is_incremental block still counts —
    * dbt parses the raw text, not the rendered one.
    */
  def refs(sql: String): Seq[String] =
    RefPat.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  /** Raw source tables referenced by the text. Recorded as deps too
    * (dbt manifests track source edges; ModelGraph ignores dep names
    * it doesn't own, so these only matter to checksum/state diffs).
    */
  def sources(sql: String): Seq[String] =
    SourcePat.findAllMatchIn(sql).map(_.group(2)).toSeq.distinct

  /** Render and run the SQL against the resolution context. */
  def run(name: String, sql: String, ctx: ModelCtx): DataFrame = {
    // is_incremental blocks first: kept only when a target exists
    val conditioned = IncrPat.replaceAllIn(sql,
      m => if (ctx.isIncremental)
        scala.util.matching.Regex.quoteReplacement(m.group(1)) else " ")
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val views = scala.collection.mutable.ArrayBuffer.empty[String]
    // temp views are PER-SESSION: the SQL must run on the session that
    // owns the bound views (each bound frame's own session), not
    // SparkSession.active — under a cloned runner session the two
    // differ and the views would not resolve
    var owner: Option[org.apache.spark.sql.SparkSession] = None
    def bind(df: DataFrame, kind: String, n: String): String = {
      val v = s"graft_sql_${kind}_${n}_$tag"
      df.createOrReplaceTempView(v)
      if (owner.isEmpty) owner = Some(df.sparkSession)
      views += v
      v
    }
    var rendered = RefPat.replaceAllIn(conditioned,
      m => bind(ctx.ref(m.group(1)), "ref", m.group(1)))
    rendered = SourcePat.replaceAllIn(rendered,
      m => bind(ctx.source(m.group(2)), "src", m.group(2)))
    rendered = ThisPat.replaceAllIn(rendered, m => bind(
      ctx.thisTable.getOrElse(throw new IllegalStateException(
        s"model $name uses {{ this }} with no existing target — " +
          "guard it with {% if is_incremental() %}")),
      "this", "target"))
    require(!rendered.contains("{{") && !rendered.contains("{%"),
      s"model $name has unsupported template syntax after rendering:\n$rendered")
    val session = owner.getOrElse(org.apache.spark.sql.SparkSession.active)
    val out = session.sql(rendered)
    out.queryExecution.analyzed // resolve view refs before dropping them
    views.foreach(session.catalog.dropTempView(_))
    out
  }

  /** Build a [[Model]] from SQL text — deps scanned from the text,
    * body = the text (checksum parity with dbt).
    *
    * `macros` + `vars` expand FIRST (core/Jinja.scala — `{% macro %}`
    * calls, `{% if %}` branches, `{{ var() }}`), and the EXPANDED text
    * becomes the body: a macro or var edit changes every calling
    * model's checksum, so `state:modified` catches it exactly as
    * dbt's macro-aware manifest diff does. Inline `{% macro %}` defs
    * in the model text itself are hoisted and usable too.
    */
  def apply(name: String, sql: String,
      materialization: Materialization = Materialization.View,
      schema: String = "analytics",
      onSchemaChange: OnSchemaChange = OnSchemaChange.Ignore,
      tags: Seq[String] = Nil,
      macros: Seq[Jinja.MacroDef] = Nil,
      vars: Map[String, String] = Map.empty): Model = {
    val expanded = Jinja.expand(Jinja.stripMacros(sql),
      macros ++ Jinja.parseMacros(sql), vars)
    Model(name, refs(expanded) ++ sources(expanded), materialization,
      ctx => run(name, expanded, ctx),
      schema = schema, onSchemaChange = onSchemaChange,
      body = expanded, tags = tags)
  }
}
