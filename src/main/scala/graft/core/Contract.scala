package graft.core

import org.apache.spark.sql.types.{DataType, StructType}

/** dbt model contracts (`contract: enforced: true` + per-column
  * `data_type:` in the model's YAML): the model's OUTPUT schema is
  * validated against the declared columns BEFORE anything
  * materializes, so a transform change that drifts the public shape
  * fails the build instead of silently breaking downstream consumers.
  *
  * Matching dbt's core semantics: every declared column must exist
  * with the declared type, and no undeclared column may appear
  * (dbt: "contracted models must declare all columns"); declaration
  * ORDER is not significant. Checks are schema-level — O(columns),
  * no data read.
  */
final case class Contract(columns: Seq[Contract.ColumnSpec]) {

  /** Per-column verdicts: (column, expected, actual, status) with
    * status ∈ ok | type_mismatch | missing | unexpected.
    */
  def check(schema: StructType): Seq[(String, String, String, String)] = {
    val actual = schema.fields.map(f => f.name -> f.dataType).toMap
    val declared = columns.map(_.name).toSet
    columns.map { cs =>
      actual.get(cs.name) match {
        case None =>
          (cs.name, cs.dataType.catalogString, "<absent>", "missing")
        case Some(dt) if dt != cs.dataType =>
          (cs.name, cs.dataType.catalogString, dt.catalogString, "type_mismatch")
        case Some(dt) =>
          (cs.name, cs.dataType.catalogString, dt.catalogString, "ok")
      }
    } ++ schema.fields.filterNot(f => declared(f.name)).map(f =>
      (f.name, "<undeclared>", f.dataType.catalogString, "unexpected"))
  }

  def violations(schema: StructType): Seq[(String, String, String, String)] =
    check(schema).filter(_._4 != "ok")
}

object Contract {
  final case class ColumnSpec(name: String, dataType: DataType)

  def of(cols: (String, DataType)*): Contract =
    Contract(cols.map { case (n, t) => ColumnSpec(n, t) })

  /** Fail the build on any violation — called by the Materializer
    * before a contracted model writes.
    */
  def enforce(model: String, schema: StructType, c: Contract): Unit = {
    val bad = c.violations(schema)
    require(bad.isEmpty,
      s"contract violated for model '$model': " +
        bad.map { case (col, exp, act, st) => s"$col[$st: $exp vs $act]" }
          .mkString(", "))
  }
}
