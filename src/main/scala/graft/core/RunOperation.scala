package graft.core

import org.apache.spark.sql.DataFrame

/** dbt `run-operation`: invoke a standalone macro against the
  * warehouse (reference: the dbt CLI's maintenance entry point —
  * grants, audits, ad-hoc backfills live here, not in the model DAG).
  *
  * The macro call is synthesized from the CLI-style args map and
  * expanded through the SAME Jinja layer models use (positional-free:
  * every arg is a keyword, like dbt's `--args` YAML), then the
  * rendered SQL executes through SqlModel.run so `ref()` binds
  * already-materialized models and `source()` binds raw tables —
  * operations see exactly the resolution surface models do. The
  * result lands as a journaled ops table (`op_<name>`), the artifact
  * trail dbt keeps under run_results.
  *
  * Scale: rendering is driver-side string work; the statement itself
  * is one Catalyst plan, and the audit write is the result's own
  * (operation-sized, not corpus-sized) frame.
  */
object RunOperation {

  /** Execute macro `name` with `args` (rendered as keyword arguments)
    * and persist the result as `<schema>.op_<name>`.
    */
  def run(wh: Warehouse, schema: String, macros: Seq[Jinja.MacroDef],
      name: String, args: Map[String, String],
      sources: String => DataFrame,
      vars: Map[String, String] = Map.empty): DataFrame = {
    require(macros.exists(_.name == name),
      s"run-operation: unknown macro '$name' " +
        s"(known: ${macros.map(_.name).sorted.mkString(", ")})")
    val kwargs = args.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(", ")
    val call = s"{{ $name($kwargs) }}"
    val expanded = Jinja.expand(call, macros, vars)
    val ctx = new ModelCtx {
      def source(n: String): DataFrame = sources(n)
      def ref(n: String): DataFrame = wh.read(schema, n)
      def thisTable: Option[DataFrame] = None
    }
    val out = SqlModel.run(s"operation:$name", expanded, ctx)
    wh.overwriteStaged(out, schema, s"op_$name")
    wh.read(schema, s"op_$name")
  }
}
