package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-ON-READ: the write-cheap complement to the engine's
  * copy-on-write merge (Materializer's staged swap = Delta/Iceberg
  * COW; this = Iceberg v2 delete-file / Hudi MOR semantics).
  *
  * A COW merge of a 1000-row batch into a 100 TB table rewrites every
  * touched partition. MOR instead APPENDS two small logs per merge
  * commit and leaves the base untouched:
  *  - `_log/inserts/c<N>/` — the batch rows (upsert values);
  *  - `_log/deletes/c<N>/` — the batch's keys (each upsert implies
  *    "supersede any older row with this key"; a bare delete writes
  *    the key with no insert row).
  * The write cost is O(batch) no matter how big the base is — the
  * shape a high-frequency CDC ingest needs.
  *
  * The price moves to READ: current state =
  *   newest-version-per-key over (base ∪ all insert logs)
  *   minus keys whose newest action is a delete
  * — one key-window per read, whose input grows with un-compacted
  * commits. That read amplification is the honest MOR trade, and
  * [[compact]] is the maintenance op that pays it down: materialize
  * the merged state once, swap it in as the new base, truncate the
  * logs (Iceberg's rewrite_data_files + rewrite_position_delete_files;
  * running it is what keeps p99 read latency flat under continuous
  * ingest). Within one batch a key appears at most once (dbt's
  * unique_key contract — same as the COW merge).
  */
object MergeOnRead {

  private def fs(wh: Warehouse, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(wh.spark.sparkContext.hadoopConfiguration)

  private def logDir(wh: Warehouse, schema: String, table: String, kind: String) =
    s"${wh.path(schema, table)}/_log/$kind"

  /** Seed the base (commit 0). Overwrites any previous state. */
  def init(wh: Warehouse, schema: String, table: String, base: DataFrame): Unit = {
    val root = new org.apache.hadoop.fs.Path(wh.path(schema, table))
    val f = fs(wh, root)
    if (f.exists(root)) f.delete(root, true)
    base.write.parquet(s"${wh.path(schema, table)}/_base")
  }

  private def commits(wh: Warehouse, schema: String, table: String): Seq[Int] = {
    val d = new org.apache.hadoop.fs.Path(logDir(wh, schema, table, "deletes"))
    val f = fs(wh, d)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath.getName)
      // {5,}: past slot 99999 the names widen (c100000) — an exact-5
      // regex would hide them; sort is already numeric (parsed ints)
      .filter(_.matches("c\\d{5,}")).map(_.stripPrefix("c").toInt).sorted
  }

  /** Upsert `batch` into the table: one O(batch) append per log, the
    * base never read or written. Rows where `deleteCol` is true are
    * bare deletes (key superseded, no replacement row). Returns the
    * commit number.
    */
  def merge(wh: Warehouse, schema: String, table: String, batch: DataFrame,
      keyCol: String, deleteCol: Option[String] = None): Int = {
    val n = commits(wh, schema, table).lastOption.getOrElse(0) + 1
    val cn = f"c$n%05d"
    val ins = deleteCol.fold(batch)(d => batch.filter(!col(d)).drop(d))
    // crash-safety protocol: `commits()` derives the commit list from
    // the DELETES dir, so the deletes log is the COMMIT POINT — and
    // because Spark creates the output directory at job start (a crash
    // mid-write would otherwise publish a partial delete log that
    // poisons every later read), the deletes write lands in a hidden
    // tmp dir and an atomic filesystem RENAME to `c<N>` publishes it.
    // Order: inserts first (an orphan inserts dir with no published
    // deletes slot is invisible to readers and overwritten on retry),
    // then deletes-to-tmp, then rename = commit.
    ins.write.mode("overwrite")
      .parquet(s"${logDir(wh, schema, table, "inserts")}/$cn")
    val delDir = logDir(wh, schema, table, "deletes")
    val tmp = new org.apache.hadoop.fs.Path(s"$delDir/.$cn.__tmp")
    val target = new org.apache.hadoop.fs.Path(s"$delDir/$cn")
    val f = fs(wh, target)
    if (f.exists(tmp)) f.delete(tmp, true) // orphan from a crashed try
    batch.select(col(keyCol)).write.mode("overwrite").parquet(tmp.toString)
    require(f.rename(tmp, target),
      s"could not publish MOR commit $cn for $schema.$table")
    n
  }

  /** The merged current state. Base and every log commit union into
    * one frame tagged (commit, tombstone); a single key-window keeps
    * the newest version and drops keys whose newest action is a
    * delete. ONE shuffle on the key regardless of commit count.
    */
  def read(wh: Warehouse, schema: String, table: String,
      keyCol: String): DataFrame = {
    val spark = wh.spark
    val base = spark.read.parquet(s"${wh.path(schema, table)}/_base")
    val cols = base.columns.toSeq
    def shape(df: DataFrame, commit: Int, tomb: Boolean): DataFrame =
      df.withColumn("__commit", lit(commit))
        .withColumn("__tombstone", lit(tomb))
        .select((cols :+ "__commit" :+ "__tombstone").map(col): _*)
    val parts = shape(base, 0, tomb = false) +:
      commits(wh, schema, table).flatMap { n =>
        val cn = f"c$n%05d"
        val ins = spark.read
          .parquet(s"${logDir(wh, schema, table, "inserts")}/$cn")
        // a delete-only key has no insert row; widen it to the table
        // schema as a NULL-bodied tombstone so the window sees it
        val tomb = cols.filterNot(_ == keyCol).foldLeft(
            spark.read.parquet(s"${logDir(wh, schema, table, "deletes")}/$cn")
              .join(ins.select(col(keyCol)), Seq(keyCol), "left_anti")) {
          (df, c) => df.withColumn(c, lit(null).cast(base.schema(c).dataType))
        }
        Seq(shape(ins, n, tomb = false), shape(tomb, n, tomb = true))
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col("__commit").desc)
    parts.reduce(_ unionByName _)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("__tombstone"))
      .drop("__rn", "__commit", "__tombstone")
  }

  /** Pay down the read debt: materialize the merged state beside the
    * live base (the read scans `_base`, the write lands in
    * `_base.__tmp` — parquet never overwrites its own input), swap
    * with the warehouse's hidden-backup rename discipline, truncate
    * the logs. After compaction a read is a plain base scan again.
    */
  def compact(wh: Warehouse, schema: String, table: String,
      keyCol: String): Unit = {
    val root = wh.path(schema, table)
    val f = fs(wh, new org.apache.hadoop.fs.Path(root))
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_base.__tmp")
    if (f.exists(tmp)) f.delete(tmp, true)
    read(wh, schema, table, keyCol).write.parquet(tmp.toString)
    val baseP = new org.apache.hadoop.fs.Path(s"$root/_base")
    val oldP = new org.apache.hadoop.fs.Path(s"$root/._base.__old")
    if (f.exists(oldP)) f.delete(oldP, true)
    require(f.rename(baseP, oldP), s"could not move MOR base aside for $table")
    require(f.rename(tmp, baseP), s"MOR compact swap failed for $table")
    f.delete(oldP, true)
    f.delete(new org.apache.hadoop.fs.Path(s"$root/_log"), true)
    ()
  }
}
