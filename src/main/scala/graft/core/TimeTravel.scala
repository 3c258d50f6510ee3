package graft.core

import org.apache.spark.sql.DataFrame

/** Lakehouse-style TIME TRAVEL over the parquet warehouse: a table is
  * a set of immutable commit directories plus tiny versioned MANIFEST
  * files; every commit writes ONLY its own new files and one new
  * manifest naming the commit set that composes the snapshot. Reads
  * resolve a version's manifest and scan exactly those directories.
  *
  * This is the Delta-log / Iceberg-snapshot design re-expressed over
  * plain parquet + a JSON log, and it is what makes history cheap at
  * 100 TB:
  *  - an APPEND commit shares every prior commit's files — version
  *    N+1 costs only the new data plus one metadata file, never a
  *    copy of the table;
  *  - historical reads ("AS OF v2") are O(manifest) metadata plus
  *    that snapshot's data — no backup restore, no second copy;
  *  - the manifest rename is the COMMIT POINT (write-tmp + atomic
  *    rename, same protocol as the Delta log): a crash after the data
  *    write but before the manifest leaves orphan files that no
  *    version references — invisible to every reader, and exactly
  *    what warehouse VACUUM (m28's machinery) exists to sweep.
  *
  * Single-writer per table, like the rest of the warehouse (dbt's own
  * execution model); concurrent-writer arbitration is a lock-service
  * concern a table format layers on top of this same structure.
  *
  * Reference tie-in: the reference clones PROD state into CI schemas
  * (copier.py:110-284) precisely because its warehouse has no
  * as-of-yesterday read; with snapshot manifests, "the table as prod
  * last ran it" is just a version pin.
  */
object TimeTravel {

  final case class Snapshot(version: Int, commits: Seq[String])

  private[core] def fsOf(wh: Warehouse, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(wh.spark.sparkContext.hadoopConfiguration)

  private[core] def root(wh: Warehouse, schema: String, table: String) =
    new org.apache.hadoop.fs.Path(wh.path(schema, table))

  private[core] def manifestDir(r: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(r, "_manifests")

  private[core] def commitDir(r: org.apache.hadoop.fs.Path, name: String) =
    new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(r, "_commits"), name)

  private[core] def commitName(n: Int) = f"c$n%05d"

  /** All snapshots, oldest first. Tolerates orphan commit dirs (a
    * crashed writer's residue) — only manifests define versions.
    */
  def history(wh: Warehouse, schema: String, table: String): Seq[Snapshot] = {
    val r = root(wh, schema, table)
    val md = manifestDir(r)
    val f = fsOf(wh, md)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .filter(n => n.matches("v\\d{5,}\\.json"))
      // numeric, not lexicographic: past slot 99999 the names widen
      // (v100000.json) and string order would put them BEFORE v99999,
      // making lastOption resolve a stale latest and expire's
      // dropRight sweep the true newest manifest
      .sortBy(_.stripPrefix("v").stripSuffix(".json").toInt)
      .map { name =>
        val content = MetaFile.read(f, new org.apache.hadoop.fs.Path(md, name))
        Snapshot(name.stripPrefix("v").stripSuffix(".json").toInt,
          // writer-suffixed names (c00002_wa) are OCC commits — the
          // suffix keeps racing writers' data dirs disjoint (Occ.scala)
          "\"(c\\d{5}[A-Za-z0-9_]*)\"".r.findAllMatchIn(content).map(_.group(1)).toSeq)
      }
  }

  /** Commit `df` as the next version. `mode` is `overwrite` (the new
    * commit alone composes the snapshot) or `append` (the new commit
    * joins every commit of the previous snapshot — prior files are
    * SHARED, never rewritten). Returns the committed version number.
    */
  def commit(wh: Warehouse, schema: String, table: String, df: DataFrame,
      mode: String): Int =
    commitFrom(wh, schema, table, df, mode, Int.MaxValue)

  /** [[commit]] with an EXPLICIT parent snapshot — the primitive that
    * makes branching possible (Branches.scala): an `append` composes
    * against the parent's commit set instead of the global latest, so
    * two refs can grow divergent histories over the same linear
    * version-number space (version numbers are allocation slots,
    * lineage lives in the refs — the Iceberg snapshot-DAG shape).
    * `parentVersion = Int.MaxValue` means "latest", which is exactly
    * [[commit]].
    */
  def commitFrom(wh: Warehouse, schema: String, table: String, df: DataFrame,
      mode: String, parentVersion: Int): Int = {
    require(mode == "overwrite" || mode == "append", s"unknown commit mode $mode")
    val r = root(wh, schema, table)
    val f = fsOf(wh, r)
    val prior = history(wh, schema, table)
    val parent =
      if (parentVersion == Int.MaxValue) prior.lastOption
      else Some(prior.find(_.version == parentVersion).getOrElse(
        throw new IllegalArgumentException(
          s"$schema.$table has no committed version $parentVersion to commit from")))
    val n = prior.lastOption.map(_.version).getOrElse(0) + 1
    val cn = commitName(n)
    // data first — readers still resolve the previous manifest. A dir
    // already at this slot is a crashed writer's residue: no manifest
    // references it (the rename below never happened), so replacing
    // it is safe — this is also what unblocks commits after a crash.
    df.write.mode("overwrite").parquet(commitDir(r, cn).toString)
    val commits =
      if (mode == "append") parent.map(_.commits).getOrElse(Nil) :+ cn
      else Seq(cn)
    val json = s"""{"version":$n,"commits":[${commits.map("\"" + _ + "\"").mkString(",")}]}"""
    // manifest rename is the atomic commit point (Delta-log protocol)
    MetaFile.writeAtomic(f, manifestDir(r), f"v$n%05d.json", json,
      s"could not commit $schema.$table v$n")
    n
  }

  /** CHANGE DATA FEED between two versions (Delta `table_changes` /
    * Iceberg changelog): the row-level diff of snapshot `fromV` →
    * snapshot `toV`, keyed on `keyCols`. Emits Delta CDF's four
    * change types — `insert`, `delete`, `update_preimage`,
    * `update_postimage` (updates contribute BOTH rows, old and new
    * values, so a downstream consumer can maintain any derived
    * state). One full-outer join on the key — the diff costs the two
    * snapshots' scan plus one shuffle, never a third copy of the
    * table. This is what lets an incremental consumer subscribe to
    * "what changed since the version I last saw" instead of
    * re-reading 100 TB.
    */
  def changes(wh: Warehouse, schema: String, table: String,
      fromV: Int, toV: Int, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(keyCols.nonEmpty, "CDF requires at least one key column")
    val a = read(wh, schema, table, fromV)
    val b = read(wh, schema, table, toV)
    val valueCols = a.columns.filterNot(keyCols.contains).toSeq
    require(b.columns.toSeq == a.columns.toSeq,
      s"CDF requires matching schemas between v$fromV and v$toV")
    val aP = keyCols.foldLeft(
      valueCols.foldLeft(a)((df, c) => df.withColumnRenamed(c, s"__a_$c")))(
      (df, k) => df.withColumnRenamed(k, s"__ka_$k"))
      .withColumn("__in_a", lit(true))
    val bP = keyCols.foldLeft(
      valueCols.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"__b_$c")))(
      (df, k) => df.withColumnRenamed(k, s"__kb_$k"))
      .withColumn("__in_b", lit(true))
    val joined = aP.join(bP,
      keyCols.map(k => col(s"__ka_$k") <=> col(s"__kb_$k")).reduce(_ && _),
      "full_outer")
    val inA = coalesce(col("__in_a"), lit(false))
    val inB = coalesce(col("__in_b"), lit(false))
    // fold from FALSE so a key-only table (no value columns) diffs as
    // pure insert/delete — matched keys are never "updated"
    val changed = valueCols.map(c => !(col(s"__a_$c") <=> col(s"__b_$c")))
      .foldLeft(lit(false))(_ || _)
    def emit(side: String, tpe: String) = {
      val kp = if (side == "a") "__ka_" else "__kb_"
      val vp = if (side == "a") "__a_" else "__b_"
      (keyCols.map(k => col(s"$kp$k").as(k)) ++
        valueCols.map(c => col(s"$vp$c").as(c)) :+
        lit(tpe).as("change_type"))
    }
    joined.filter(!inA && inB).select(emit("b", "insert"): _*)
      .unionByName(joined.filter(inA && !inB).select(emit("a", "delete"): _*))
      .unionByName(joined.filter(inA && inB && changed)
        .select(emit("a", "update_preimage"): _*))
      .unionByName(joined.filter(inA && inB && changed)
        .select(emit("b", "update_postimage"): _*))
  }

  /** EXPIRE SNAPSHOTS (Iceberg `expire_snapshots` / Delta log
    * retention — the op that completes the manifest design: history
    * is cheap BECAUSE commits are shared, so reclaiming space needs
    * reference counting, not age): drop all but the last `keepLast`
    * versions' manifests, then delete every commit directory no
    * RETAINED manifest references. Files shared with a retained
    * snapshot — the append-chain case, where v1's commit underlies
    * every later append — survive any number of expiry sweeps
    * (spec-pinned: the oldest retained version reads bit-identically
    * after the sweep); a commit referenced by NO manifest at all (a
    * crashed writer's residue) sweeps too, the remove_orphan_files
    * half of the contract — GATED on `orphanGraceMs`: an unreferenced
    * dir younger than the grace window is spared, because "no
    * manifest references it" is also the state of a commit MID-FLIGHT
    * (data written, manifest rename pending) and a zero-grace sweep
    * racing that writer would delete the files its about-to-land
    * version needs (Iceberg's remove_orphan_files requires an
    * older_than age for exactly this; when a janitor cadence can race
    * writers, set the grace ≥ the longest in-flight commit —
    * spec-pinned). O(#versions + #commit dirs) metadata ops,
    * zero data IO beyond the deletes. Retention is the reader
    * contract: a reader pinned to a version older than `keepLast`
    * loses its files — run expiry on a cadence longer than the
    * longest query, exactly like Iceberg's. Returns
    * (droppedManifests, droppedCommitDirs).
    */
  def expire(wh: Warehouse, schema: String, table: String,
      keepLast: Int, protect: Set[Int] = Set.empty,
      orphanGraceMs: Long = 0L): (Int, Int) = {
    require(keepLast >= 1, "retention must keep at least the latest version")
    val r = root(wh, schema, table)
    val f = fsOf(wh, r)
    val snaps = history(wh, schema, table)
    require(snaps.nonEmpty, s"$schema.$table has no committed versions")
    // `protect` pins versions OUTSIDE the keepLast window — ref heads
    // (Branches.expire passes every branch/tag head, Iceberg's
    // expire-respects-refs rule): their manifests survive, and
    // therefore so does every commit they reference
    val dropped = snaps.dropRight(keepLast).filterNot(s => protect(s.version))
    val keep = (snaps.takeRight(keepLast) ++
      snaps.filter(s => protect(s.version))).flatMap(_.commits).toSet
    val md = manifestDir(r)
    dropped.foreach { s =>
      f.delete(new org.apache.hadoop.fs.Path(md, f"v${s.version}%05d.json"),
        false)
    }
    val cd = new org.apache.hadoop.fs.Path(r, "_commits")
    val now = System.currentTimeMillis()
    val dead =
      if (!f.exists(cd)) Seq.empty
      else f.listStatus(cd).toSeq
        // unreferenced AND older than the grace window — a young
        // unreferenced dir may be a commit whose manifest rename is
        // about to land (see docstring)
        .filter(s => !keep(s.getPath.getName) &&
          now - s.getModificationTime >= orphanGraceMs)
        .map(_.getPath)
    dead.foreach(p => f.delete(p, true))
    (dropped.size, dead.size)
  }

  /** Read the table AS OF `version` (latest when omitted). */
  def read(wh: Warehouse, schema: String, table: String,
      version: Int = Int.MaxValue): DataFrame = {
    val snaps = history(wh, schema, table)
    require(snaps.nonEmpty, s"$schema.$table has no committed versions")
    val snap = snaps.filter(_.version <= version).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"$schema.$table has no version <= $version"))
    val r = root(wh, schema, table)
    wh.spark.read.parquet(snap.commits.map(c => commitDir(r, c).toString): _*)
  }
}
