package graft.core

import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.hadoop.fs.Path

/** OPTIMIZE — small-file compaction for partitioned warehouse tables
  * (the maintenance command every lakehouse format ships: Delta
  * OPTIMIZE, Iceberg rewrite_data_files, Hive concatenate). Streaming
  * ingest (e03/e09) and per-batch incremental commits (m01/m16) leave
  * a partition holding one small file per micro-batch; at 100 TB the
  * resulting file-listing and task-scheduling overhead — not the data
  * volume — becomes the scan bottleneck. Compaction rewrites each
  * partition's files into ceil(bytes / targetBytes) right-sized files
  * and leaves the table contents bit-for-bit identical.
  *
  * Scale shape: the data path is one `coalesce(nOut)` read→write per
  * partition — no shuffle (coalesce only merges read splits), fully
  * distributed, and partitions compact CONCURRENTLY from a fixed
  * thread pool (Spark's scheduler interleaves the jobs; the same
  * discipline as TableCopier/the parallel Runner). Driver-side work is
  * O(#partitions) metadata ops. Partitions already at or below the
  * target file count are skipped without reading any data, so steady-
  * state maintenance touches only what ingest fragmented since the
  * last pass. The commit per partition mirrors
  * [[Warehouse.overwritePartitionsStaged]]: stage to a sibling dir,
  * live dir aside, staged in, backup dropped — crash-DURABLE at every
  * step (at least one complete copy always exists on disk, and the
  * healer restores it), but not reader-atomic: between the two renames
  * a concurrent reader sees the partition absent (the backup is
  * dot-prefixed, invisible to partition discovery). Single-writer,
  * no-concurrent-reader is the assumed maintenance window, as with
  * the staged overwrite it mirrors.
  */
object Compaction {

  /** Per-partition outcome: `filesAfter == filesBefore` means the
    * partition was already compact and was skipped unread.
    */
  final case class Stat(partition: String, filesBefore: Int,
    filesAfter: Int, bytes: Long)

  private def isDataFile(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith("_") && !n.startsWith(".")
  }

  /** Compact every partition of `schema.table` (written with
    * `nPartCols` partition columns) toward `targetBytes`-sized files.
    * Returns one [[Stat]] per partition, sorted by partition path.
    */
  def compact(wh: Warehouse, schema: String, table: String,
      nPartCols: Int, targetBytes: Long, threads: Int = 4): Seq[Stat] = {
    require(nPartCols >= 1, "compaction targets partitioned tables")
    require(targetBytes > 0, "targetBytes must be positive")
    val spark = wh.spark
    val tableRoot = new Path(wh.path(schema, table))
    val f = tableRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveRoot = f.makeQualified(tableRoot)
    val stagedRoot = f.makeQualified(
      new Path(wh.path(schema, table + ".__ctmp")))
    if (f.exists(stagedRoot)) f.delete(stagedRoot, true)
    // restore any half-swapped partition from a crashed previous run
    // BEFORE enumerating — the backup may be the only copy
    wh.healPartitions(f, liveRoot)

    val parts = wh.partitionDirs(f, liveRoot, nPartCols)
    val pool = Executors.newFixedThreadPool(math.max(1, threads))
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try {
      val futures = parts.map { dir =>
        Future {
          val rel = wh.relativize(f, liveRoot, dir)
          val files = f.listStatus(dir).filter(s =>
            s.isFile && isDataFile(s.getPath))
          val bytes = files.map(_.getLen).sum
          val nOut = math.max(1L,
            (bytes + targetBytes - 1) / targetBytes).toInt
          if (files.length <= nOut)
            Stat(rel, files.length, files.length, bytes)
          else {
            // partition files carry no partition columns, so the
            // rewrite reads and writes the same leaf schema
            val staged = new Path(stagedRoot, rel)
            spark.read.parquet(dir.toString)
              .coalesce(nOut)
              .write.mode("overwrite").parquet(staged.toString)
            val written = f.listStatus(staged).count(s =>
              s.isFile && isDataFile(s.getPath))
            // hidden (dot-prefixed) backup: invisible to Spark
            // partition discovery, so concurrent readers never see
            // the partition twice, and a crash here is restored by
            // healPartitions on the next writer entry
            val old = new Path(dir.getParent, wh.hiddenOldName(dir.getName))
            if (f.exists(old)) f.delete(old, true)
            require(f.rename(dir, old),
              s"could not move partition $rel aside in $schema.$table")
            require(f.rename(staged, new Path(liveRoot, rel)),
              s"compaction swap failed for $rel in $schema.$table; " +
                s"previous data intact at $old")
            f.delete(old, true)
            Stat(rel, files.length, written, bytes)
          }
        }
      }
      val stats = futures.map(Await.result(_, Duration.Inf))
      f.delete(stagedRoot, true)
      stats.sortBy(_.partition)
    } finally pool.shutdown()
  }
}
