package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** `dbt docs generate` analogue: the catalog artifact — one row per
  * (table, column) with declared type + row/null/distinct counts
  * (what dbt's catalog.json carries per node/column from the
  * warehouse's information schema + stats queries).
  *
  * Scale shape: each table is profiled in ONE aggregation pass —
  * `count(*)`, per-column `count(col)` and `count(distinct col)` fold
  * into a single agg (Catalyst plans the multi-distinct via Expand),
  * so a profile costs one scan however many columns a table has. The
  * catalog itself is metadata-sized (one row per column), which is
  * why serializing it to a driver-side JSON artifact is legitimate —
  * it is the same order of driver state as any manifest.
  */
object Docs {

  /** Catalog rendering of a column type. Timezone flavor is a STORAGE
    * property, not a schema contract: the same source table arrives
    * as TIMESTAMP_NTZ or TIMESTAMP_LTZ depending on how the producer
    * encoded parquet, and a schema-drift monitor that reported that
    * flip as a type change would page on every encoding migration. So
    * both flavors render as plain `timestamp` (what dbt's catalog and
    * the DuckDB information schema call them too).
    */
  private[graft] def renderType(dt: org.apache.spark.sql.types.DataType): String =
    dt.simpleString.replace("timestamp_ntz", "timestamp")

  /** Profile one relation: (table_name, column_name, dtype, n_rows,
    * n_nulls, n_distinct), one aggregation pass.
    */
  def profileTable(name: String, df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = count(lit(1)).as("__n") +: fields.flatMap(f => Seq(
      count(col(f.name)).as(s"__nn_${f.name}"),
      countDistinct(col(f.name)).as(s"__nd_${f.name}")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = array(fields.map(f => struct(
      lit(f.name).as("column_name"),
      lit(renderType(f.dataType)).as("dtype"),
      col(s"__nn_${f.name}").as("n_notnull"),
      col(s"__nd_${f.name}").as("n_distinct"))): _*)
    one.select(lit(name).as("table_name"), col("__n").as("n_rows"),
        explode(perCol).as("c"))
      .select(col("table_name"), col("c.column_name").as("column_name"),
        col("c.dtype").as("dtype"), col("n_rows").cast(LongType).as("n_rows"),
        (col("n_rows") - col("c.n_notnull")).cast(LongType).as("n_nulls"),
        col("c.n_distinct").cast(LongType).as("n_distinct"))
  }

  /** Catalog over a set of named relations (a schema's tables, a
    * run's outputs): the union of per-table profiles, stable order.
    */
  def catalog(tables: Seq[(String, DataFrame)]): DataFrame =
    tables.map { case (n, df) => profileTable(n, df) }
      .reduce(_ unionByName _)
      .orderBy("table_name", "column_name")

  /** Profile every table of a warehouse schema (the persisted
    * relations — what dbt's catalog covers; views recompose lazily
    * and have no warehouse presence to document).
    */
  def forSchema(wh: Warehouse, schema: String): DataFrame = {
    val names = wh.tables(schema).sorted
    require(names.nonEmpty, s"schema '$schema' has no tables to document")
    catalog(names.map(n => n -> wh.read(schema, n)))
  }

  /** Metadata-only schema frame: (table_name, column_name, dtype)
    * from the RESOLVED schema — no scan (a createDataFrame of the
    * field list), which is the point: schema monitoring at 100 TB
    * must not read data.
    */
  def schemaFrame(spark: SparkSession, name: String, df: DataFrame): DataFrame = {
    import spark.implicits._
    df.schema.fields.toSeq.map(f => (name, f.name, renderType(f.dataType)))
      .toDF("table_name", "column_name", "dtype")
  }

  /** Schema-change monitor (elementary's `schema_changes` / a dbt
    * source-schema contract): BASELINE vs CURRENT schema catalogs,
    * full-outer joined on (table, column) → one verdict per column:
    * ok / type_changed / removed / added. Both sides are
    * metadata-sized; the comparison never touches data.
    */
  def schemaDrift(baseline: DataFrame, current: DataFrame): DataFrame = {
    val b = baseline.select(col("table_name"), col("column_name"),
      col("dtype").as("baseline_type"))
    val c = current.select(col("table_name"), col("column_name"),
      col("dtype").as("current_type"))
    b.join(c, Seq("table_name", "column_name"), "full_outer")
      .withColumn("status",
        when(col("baseline_type").isNull, "added")
          .when(col("current_type").isNull, "removed")
          .when(col("baseline_type") =!= col("current_type"), "type_changed")
          .otherwise("ok"))
  }

  /** Serialize a catalog frame to the dbt-catalog-shaped JSON
    * artifact. The collect is catalog-sized (one row per column) —
    * driver-bounded by construction, like every manifest.
    */
  def toJson(cat: DataFrame): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val rows = cat.collect().map { r =>
      s"""{"table":"${esc(r.getString(0))}","column":"${esc(r.getString(1))}",""" +
        s""""dtype":"${esc(r.getString(2))}","n_rows":${r.getLong(3)},""" +
        s""""n_nulls":${r.getLong(4)},"n_distinct":${r.getLong(5)}}"""
    }
    rows.mkString("[", ",", "]")
  }
}
