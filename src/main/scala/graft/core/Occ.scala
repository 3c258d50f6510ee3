package graft.core

import org.apache.spark.sql.DataFrame

/** OPTIMISTIC CONCURRENCY CONTROL over the TimeTravel manifest log —
  * the multi-writer protocol Delta/Iceberg layer on the same
  * structure TimeTravel already has (immutable commit dirs + a
  * versioned manifest whose RENAME is the commit point).
  *
  * Protocol: a writer snapshots (version, state), computes the new
  * full state, and publishes it as version+1 with a COMPARE-AND-SWAP
  * on the manifest slot: destination-exists check + rename. On HDFS /
  * object stores with no-overwrite rename the rename itself is the
  * atomic arbiter; on the local filesystem (where POSIX rename
  * replaces) the exists check arbitrates — a check-then-rename
  * window remains between truly simultaneous local commits, so the
  * deployment note a cluster operator needs is "point the warehouse
  * at a no-overwrite filesystem" (the same note every Delta-on-posix
  * deployment carries). A writer that loses must RE-READ
  * and RE-APPLY — the blind alternative silently discards the
  * winner's update (the lost-update anomaly).
  * Each writer's data lands in a WRITER-SUFFIXED commit dir
  * (`c00002_wa`) so racing writers never touch each other's files;
  * the loser's orphan dir is unreferenced residue VACUUM sweeps.
  *
  * Scale: the CAS is one metadata rename regardless of table size;
  * the retry recomputes only the writer's own update function. This
  * is exactly why lakehouse formats arbitrate on a log instead of
  * locking data files at 100 TB.
  */
object Occ {

  final case class Read(version: Int, df: DataFrame)

  /** The current committed (version, state). */
  def snapshot(wh: Warehouse, schema: String, table: String): Read = {
    val snaps = TimeTravel.history(wh, schema, table)
    require(snaps.nonEmpty, s"$schema.$table has no committed versions")
    Read(snaps.last.version, TimeTravel.read(wh, schema, table, snaps.last.version))
  }

  /** CAS-publish `df` as the FULL state at `expected + 1`. Returns
    * false when another writer committed first (stale `expected`).
    */
  def tryCommit(wh: Warehouse, schema: String, table: String,
      df: DataFrame, expected: Int, writerId: String): Boolean = {
    require(writerId.matches("[A-Za-z0-9_]+"), "writer id must be a name")
    val n = expected + 1
    // cheap precheck: a manifest at or past n means the CAS must fail —
    // skip the data write (the rename below remains the real arbiter)
    if (TimeTravel.history(wh, schema, table).exists(_.version >= n))
      return false
    val r = TimeTravel.root(wh, schema, table)
    val f = TimeTravel.fsOf(wh, r)
    val dirName = TimeTravel.commitName(n) + s"_$writerId"
    df.write.mode("overwrite")
      .parquet(TimeTravel.commitDir(r, dirName).toString)
    val json = s"""{"version":$n,"commits":["$dirName"]}"""
    val md = TimeTravel.manifestDir(r)
    f.mkdirs(md)
    val target = new org.apache.hadoop.fs.Path(md, f"v$n%05d.json")
    val tmp = new org.apache.hadoop.fs.Path(md, f".v$n%05d.json.__tmp_$writerId")
    val out = f.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val won = !f.exists(target) && f.rename(tmp, target)
    if (!won) {
      // lost the race: drop our tmp manifest; the data dir is
      // unreferenced residue (vacuum's concern, like any crashed write)
      f.delete(tmp, false)
    }
    won
  }

  /** Read-modify-write with OCC retries: re-reads and re-applies
    * `update` until the CAS lands. Returns the committed version.
    */
  def transact(wh: Warehouse, schema: String, table: String,
      writerId: String, maxRetries: Int = 5)(
      update: DataFrame => DataFrame): Int = {
    var attempt = 0
    while (attempt <= maxRetries) {
      val s = snapshot(wh, schema, table)
      if (tryCommit(wh, schema, table, update(s.df), s.version,
          s"${writerId}_a$attempt"))
        return s.version + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"$schema.$table: lost the commit race $maxRetries times (writer $writerId)")
  }
}
