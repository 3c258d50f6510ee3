package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A parquet "warehouse": `root/<schema>/<table>` directories play the
  * role of the reference's Postgres schemas/tables
  * (reference: DbtEducationalDataProject/models/staging/sources.yml —
  * the `raw_edu` schema). At cluster scale the root would be an
  * object-store prefix; nothing here assumes a local filesystem —
  * all IO goes through Spark's Hadoop FS layer.
  */
final case class Warehouse(spark: SparkSession, root: String) {
  def path(schema: String, table: String): String = s"$root/$schema/$table"

  private def fs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(schema: String, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(schema, table))
    fs(p).exists(p)
  }

  def read(schema: String, table: String): DataFrame =
    spark.read.parquet(path(schema, table))

  def write(df: DataFrame, schema: String, table: String,
      mode: String = "overwrite", partitionBy: Seq[String] = Nil,
      options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode(mode).options(options)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(schema, table))
  }

  /** Copy-on-write overwrite of a table the plan is also READING: stage
    * the full result to `<table>.__tmp`, then swap directories. Parquet
    * cannot overwrite its own input; staging to a sibling path keeps the
    * write fully distributed and resilient (a lost executor just re-runs
    * its write task), unlike pinning the result in block-manager memory
    * via localCheckpoint. On a lakehouse table format this is exactly
    * MERGE INTO's copy-on-write commit.
    */
  def overwriteStaged(df: DataFrame, schema: String, table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val tmp = table + ".__tmp"
    write(df, schema, tmp, partitionBy = partitionBy)
    val target = new org.apache.hadoop.fs.Path(path(schema, table))
    val staged = new org.apache.hadoop.fs.Path(path(schema, tmp))
    val f = fs(target)
    if (f.exists(target)) f.delete(target, true)
    require(f.rename(staged, target), s"staged swap failed for $schema.$table")
  }

  def drop(schema: String, table: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(schema, table))
    val f = fs(p)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  def tables(schema: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$schema")
    val f = fs(p)
    if (!f.exists(p)) Nil
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }
}

object Warehouse {
  /** Fresh scratch warehouse under the JVM temp dir (unit tests and
    * the Verify-driven engine queries).
    */
  def scratch(spark: SparkSession, tag: String): Warehouse = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$tag").toString
    Warehouse(spark, dir)
  }
}
