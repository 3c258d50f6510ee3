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
}
