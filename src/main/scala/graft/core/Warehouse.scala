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
    *
    * Commit order is crash-safe: the live table is renamed ASIDE
    * (`<table>.__old`) before the staged dir takes its place, so at no
    * point is there zero copies of the data — a failure between the two
    * renames leaves the previous version recoverable at `.__old`, and a
    * failure after leaves the new version live.
    */
  def overwriteStaged(df: DataFrame, schema: String, table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val target = new org.apache.hadoop.fs.Path(path(schema, table))
    val staged = new org.apache.hadoop.fs.Path(path(schema, table + ".__tmp"))
    val old = new org.apache.hadoop.fs.Path(path(schema, table + ".__old"))
    val f = fs(target)
    // clear leftovers from a previous crashed swap before staging anew
    if (f.exists(staged)) f.delete(staged, true)
    if (f.exists(old)) f.delete(old, true)
    write(df, schema, table + ".__tmp", partitionBy = partitionBy)
    val hadTarget = f.exists(target)
    if (hadTarget) require(f.rename(target, old),
      s"could not move $schema.$table aside for staged swap")
    require(f.rename(staged, target),
      s"staged swap failed for $schema.$table; previous data intact at $old, new data at $staged")
    if (hadTarget) { f.delete(old, true); () }
  }

  def drop(schema: String, table: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(schema, table))
    val f = fs(p)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  /** Live tables only — staging/backup dirs from an in-flight or
    * crashed staged swap (`.__tmp`, `.__old`) are never listed, so
    * schema-wide consumers (e.g. a CI clone of a prod schema) cannot
    * pick up stale staging data.
    */
  def tables(schema: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$schema")
    val f = fs(p)
    if (!f.exists(p)) Nil
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.endsWith(".__tmp") || n.endsWith(".__old"))
      .toSeq.sorted
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
