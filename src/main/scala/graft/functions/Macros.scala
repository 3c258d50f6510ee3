package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference project's Jinja macros, re-expressed as `Column`
  * builders. A dbt macro expands to a SQL fragment at compile time;
  * the Spark-native equivalent is a function returning a Catalyst
  * expression tree — same inlining, full whole-stage codegen.
  */
object Macros {

  /** Ordinal CASE map, the shape of
    * reference: macros/grade_point_calculator.sql:1-19 (grade → 4.0
    * scale). Here mapped over TPC-H `o_orderpriority`.
    * Exact decimal so downstream weighted averages are reproducible.
    */
  def priorityPoints(c: Column): Column =
    when(c === "1-URGENT", lit("4.0"))
      .when(c === "2-HIGH", lit("3.0"))
      .when(c === "3-MEDIUM", lit("2.0"))
      .when(c === "4-NOT SPECIFIED", lit("1.0"))
      .when(c === "5-LOW", lit("0.0"))
      .otherwise(lit(null))
      .cast(DecimalType(3, 1))

  /** Weighted average with divide-by-zero guard, the shape of
    * reference: macros/calculate_gpa.sql:1-15
    * (`sum(points*credits)/nullif(sum(credits),0)` rounded to 2).
    * Operands are expected as exact decimals; the final division is
    * done in double precision from the exact sums so distributed
    * accumulation order cannot change the result.
    */
  def weightedAvg(value: Column, weight: Column): Column =
    round(
      sum(value * weight).cast(DoubleType) /
        nullif(sum(weight).cast(DoubleType), lit(0.0d)),
      2)

  /** Fiscal/academic year label from a date, the shape of
    * reference: macros/academic_year_from_date.sql:1-8 (Aug+ rolls
    * into the next academic year).
    */
  def academicYear(d: Column): Column = {
    val y = year(d)
    when(month(d) >= 8,
      concat(y.cast(StringType), lit("-"), (y + 1).cast(StringType)))
      .otherwise(
        concat((y - 1).cast(StringType), lit("-"), y.cast(StringType)))
  }

  /** Deterministic "as of" date: the reference models call
    * `current_date` in ~20 places and `age()` in 3
    * (e.g. models/marts/academic/student_retention_analysis.sql:35,
    * models/marts/core/institutional_kpi_dashboard.sql:5) — an
    * injectable as-of keeps those queries reproducible and lets CI
    * pin a date. Pass as a literal date string.
    */
  def asOf(date: String): Column = lit(date).cast(DateType)

  /** Full years elapsed from `start` to `asOf` (the `age()` pattern):
    * calendar-year difference minus one when the anniversary hasn't
    * been reached. String MMdd comparison is locale-free and has an
    * exact DuckDB counterpart (strftime '%m%d').
    */
  def yearsBetween(asOfDate: Column, start: Column): Column =
    (year(asOfDate) - year(start) -
      when(date_format(start, "MMdd") > date_format(asOfDate, "MMdd"), 1)
        .otherwise(0)).cast(IntegerType)

  /** Threshold bucketing CASE chain — the single most common pattern
    * in the reference models (181 CASE uses; e.g.
    * reference: models/staging/stg_enrollments.sql:24-41).
    */
  def bucket(c: Column, cuts: Seq[(Double, String)], default: String): Column =
    cuts.foldLeft(None: Option[Column]) { case (acc, (cut, label)) =>
      Some(acc.fold(when(c >= cut, label))(_.when(c >= cut, label)))
    }.fold(lit(default))(_.otherwise(default))
}
