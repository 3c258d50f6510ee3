package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** dbt seeds: small CSV reference tables loaded with an explicit typed
  * schema (reference: the CSVs under DbtEducationalDataProject/seeds/
  * plus the seeds config in dbt_project.yml). Seeds are driver-small
  * by definition; downstream joins against them should broadcast.
  */
object Seed {

  /** Parse inline CSV text (header row + records) with an explicit
    * schema — the dbt `column_types` contract. FAILFAST so a malformed
    * seed aborts the run instead of silently nulling cells.
    */
  def fromString(spark: SparkSession, csv: String, schema: StructType): DataFrame = {
    import spark.implicits._
    val lines = csv.trim.split("\n").toSeq.toDS()
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(lines)
  }

  /** A grade-scale seed mirroring the SHAPE of the reference's
    * seeds/grade_scale_reference.csv (letter grade → points → minimum
    * percentage): our own values, same contract.
    */
  val gradeScaleCsv: String =
    """grade,points,min_pct
      |A,4.0,90
      |B,3.0,80
      |C,2.0,70
      |D,1.0,60
      |F,0.0,0""".stripMargin

  // ----------------------------------------------------------------
  // Calendar seeds, mirroring the SHAPE of the reference's
  // seeds/semester_calendar.csv (semester_name, academic_year,
  // semester_type, start_date, end_date, ...) and
  // seeds/academic_calendar_holidays.csv (holiday_name, holiday_date,
  // holiday_type, affects_classes): our own values, placed inside the
  // TPC-H order-date range so a date-dimension join against orders is
  // non-trivial. One Scala value is the single source for BOTH the
  // CSV seed and the DuckDB oracle's VALUES list (m13), so the two
  // sides cannot drift.

  /** (semester_name, academic_year, semester_type, start_date, end_date). */
  val semesterTerms: Seq[(String, String, String, String, String)] =
    (1995 to 1997).flatMap { y =>
      Seq(
        (s"Spring $y", s"${y - 1}-$y", "Spring", f"$y-01-16", f"$y-05-10"),
        (s"Summer $y", s"${y - 1}-$y", "Summer", f"$y-06-01", f"$y-07-28"),
        (s"Fall $y", s"$y-${y + 1}", "Fall", f"$y-08-25", f"$y-12-15"))
    }

  val semesterCalendarCsv: String =
    "semester_name,academic_year,semester_type,start_date,end_date\n" +
      semesterTerms.map(t => s"${t._1},${t._2},${t._3},${t._4},${t._5}")
        .mkString("\n")

  /** (holiday_name, holiday_date, affects_classes). */
  val calendarHolidays: Seq[(String, String, String)] =
    (1995 to 1997).flatMap { y =>
      Seq(
        (s"Spring Break $y", f"$y-03-13", "Yes"),
        (s"Independence Day $y", f"$y-07-04", "No"),
        (s"Thanksgiving $y", f"$y-11-23", "Yes"),
        (s"Winter Break $y", f"$y-12-25", "Yes"))
    }

  val calendarHolidaysCsv: String =
    "holiday_name,holiday_date,affects_classes\n" +
      calendarHolidays.map(h => s"${h._1},${h._2},${h._3}").mkString("\n")
}
