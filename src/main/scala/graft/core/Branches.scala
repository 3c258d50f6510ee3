package graft.core

import org.apache.spark.sql.DataFrame

/** Named REFS over [[TimeTravel]] tables — Iceberg branches and tags
  * (`ALTER TABLE … CREATE BRANCH/TAG`, Nessie's git-for-data) on the
  * same versioned-manifest substrate:
  *
  *  - a REF is a tiny JSON file `_refs/<name>.json` holding the ref's
  *    LINEAGE — the ordered version list from root to head. Version
  *    numbers stay globally linear (they are manifest allocation
  *    slots, [[TimeTravel.commitFrom]]); which versions form a
  *    branch's history lives here, so two branches can interleave
  *    commits over the same table without ever seeing each other.
  *  - a BRANCH commit composes against the BRANCH HEAD (not the
  *    global latest) and then advances the ref — write-tmp + atomic
  *    rename, the same single-file commit point as the manifests. A
  *    crash between the manifest commit and the ref advance leaves an
  *    orphan version no ref references: invisible to every reader,
  *    re-tryable, and swept by expiry — the TimeTravel crash story
  *    unchanged.
  *  - a TAG is an immutable ref (release pins, eval-set freezes):
  *    commits and fast-forwards onto it refuse.
  *  - FAST-FORWARD publishes a branch: `main` advances to `dev`'s
  *    head iff main's lineage is a prefix of dev's (Iceberg's
  *    `fast_forward` has exactly this contract); divergent histories
  *    refuse rather than silently losing commits — merging divergent
  *    branches is a conflict-resolution policy a catalog layers on
  *    top, not a ref operation.
  *
  * Why this matters at 100 TB: branches make the m33 write-audit-
  * publish pattern a FIRST-CLASS object — a pipeline writes N commits
  * to a staging branch over hours, audits the branch head, and
  * publishes with ONE metadata rename; no data moves, and `main`
  * readers never see a half-loaded state. The reference's CI-schema
  * clone (copier.py:110-284) is this same isolation need solved by
  * copying tables; a ref costs one JSON file instead.
  *
  * Adoption: the first ref operation on a plain TimeTravel table
  * snapshots its current history as `main`'s lineage (every earlier
  * commit was trunk by construction). After adoption, writes go
  * through [[commitTo]] — a raw TimeTravel.commit would allocate a
  * version no ref sees (same orphan semantics as a crashed ref
  * advance, so nothing breaks; it is just invisible until expiry).
  *
  * Single-writer per table like the rest of the warehouse; racing
  * ref writers would arbitrate through the m47 OCC CAS on the ref
  * file, the same way table commits do.
  */
object Branches {

  /** A named ref: `versions` is the lineage root→head (head = last). */
  final case class Ref(name: String, tag: Boolean, versions: Seq[Int]) {
    def head: Int = versions.last
  }

  private def refsDir(wh: Warehouse, schema: String, table: String) =
    new org.apache.hadoop.fs.Path(TimeTravel.root(wh, schema, table), "_refs")

  /** A ref is a DIRECTORY of seq-stamped immutable state files
    * (`_refs/<name>/r%05d.json`), latest seq wins — the manifest
    * protocol applied to refs: an advance only ever CREATES a file
    * (write-tmp + atomic rename to a fresh slot), never rewrites or
    * deletes the live one, so a crash at any point leaves the
    * previous state resolvable. Each advance sweeps seq files OLDER
    * than the immediately-previous state (which is retained so a
    * reader racing one advance never opens a deleted file — the
    * keepLast-style retention window; readers pinned across more
    * than one advance should pin a tag).
    */
  private def refDir(wh: Warehouse, schema: String, table: String,
      name: String) =
    new org.apache.hadoop.fs.Path(refsDir(wh, schema, table), name)

  private def fs(wh: Warehouse, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(wh.spark.sparkContext.hadoopConfiguration)

  private def seqFiles(f: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path): Seq[String] =
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).toSeq.map(_.getPath.getName)
      .filter(_.matches("r\\d{5,}\\.json"))
      // numeric: past slot 99999 (r100000.json) string order would
      // resolve a stale latest and allocate a colliding next seq
      .sortBy(_.stripPrefix("r").stripSuffix(".json").toInt)

  private def save(wh: Warehouse, schema: String, table: String,
      ref: Ref): Unit = {
    require(ref.name.matches("[A-Za-z0-9_-]+"), s"bad ref name ${ref.name}")
    val d = refDir(wh, schema, table, ref.name)
    val f = fs(wh, d)
    f.mkdirs(d)
    val prior = seqFiles(f, d)
    val seq = prior.lastOption
      .map(_.stripPrefix("r").stripSuffix(".json").toInt).getOrElse(0) + 1
    val json = s"""{"name":"${ref.name}","tag":${ref.tag},""" +
      s""""versions":[${ref.versions.mkString(",")}]}"""
    // the rename inside writeAtomic IS the advance — until it lands,
    // readers resolve the previous seq file; after it, this one
    MetaFile.writeAtomic(f, d, f"r$seq%05d.json", json,
      s"could not advance ref ${ref.name} on $schema.$table")
    // sweep superseded states best-effort, RETAINING the immediately
    // previous one: a reader that listed the dir just before this
    // advance may still be about to open it (the one-advance race a
    // zero-retention sweep would turn into FileNotFound); a reader
    // pinned across MORE than one advance wants a tag, not a branch
    // head — same retention contract as TimeTravel.expire's keepLast
    prior.dropRight(1).foreach(n =>
      f.delete(new org.apache.hadoop.fs.Path(d, n), false))
  }

  private def parse(name: String, content: String): Ref = Ref(
    name,
    "\"tag\"\\s*:\\s*(true|false)".r.findFirstMatchIn(content).get.group(1).toBoolean,
    "\\[([0-9,\\s]*)\\]".r.findFirstMatchIn(content).get.group(1)
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toInt))

  private def loadFile(wh: Warehouse, schema: String, table: String,
      name: String): Option[Ref] = {
    val d = refDir(wh, schema, table, name)
    val f = fs(wh, d)
    seqFiles(f, d).lastOption.map { latest =>
      parse(name,
        MetaFile.read(f, new org.apache.hadoop.fs.Path(d, latest)))
    }
  }

  /** The implicit `main` view of a never-adopted table: lineage = the
    * full trunk history. NOT persisted — reads must never write
    * (concurrent first readers would race the ref-file create, and a
    * read of an unadopted table on read-only storage must work).
    */
  private def trunkMain(wh: Warehouse, schema: String, table: String): Ref = {
    val trunk = TimeTravel.history(wh, schema, table).map(_.version)
    require(trunk.nonEmpty,
      s"$schema.$table has no committed versions to view as main")
    Ref("main", tag = false, trunk)
  }

  /** Adopt a plain TimeTravel table into the ref world: if `main` has
    * no ref file yet, snapshot the table's full history as its
    * lineage (every pre-adoption commit was trunk by construction).
    * Called ONLY from mutating ops — the read path resolves the same
    * view via [[trunkMain]] without touching storage.
    */
  private def ensureMain(wh: Warehouse, schema: String, table: String): Ref =
    loadFile(wh, schema, table, "main").getOrElse {
      val m = trunkMain(wh, schema, table)
      save(wh, schema, table, m)
      m
    }

  /** Resolve a ref by name. A missing `main` resolves as the implicit
    * trunk view (full history) WITHOUT persisting anything — the read
    * path never mutates storage.
    */
  def resolve(wh: Warehouse, schema: String, table: String,
      name: String): Ref =
    loadFile(wh, schema, table, name).getOrElse {
      if (name == "main") trunkMain(wh, schema, table)
      else throw new IllegalArgumentException(
        s"$schema.$table has no ref named $name")
    }

  /** All refs on the table, name-sorted. A ref dir with no committed
    * seq file (a crashed first save's residue — only `.__tmp` inside)
    * is no ref: the rename never happened, so it never existed.
    */
  def list(wh: Warehouse, schema: String, table: String): Seq[Ref] = {
    val d = refsDir(wh, schema, table)
    val f = fs(wh, d)
    val onDisk =
      if (!f.exists(d)) Seq.empty[Ref]
      else f.listStatus(d).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).sorted
        .flatMap(loadFile(wh, schema, table, _))
    // a never-adopted table with history still lists its implicit
    // main (read-only trunk view), matching what resolve would
    // return — one history scan serves both the emptiness check and
    // the implicit ref
    if (onDisk.exists(_.name == "main")) onDisk
    else {
      val trunk = TimeTravel.history(wh, schema, table).map(_.version)
      if (trunk.isEmpty) onDisk
      else (onDisk :+ Ref("main", tag = false, trunk)).sortBy(_.name)
    }
  }

  /** Create a branch (or, with `tag = true`, an immutable tag) from
    * `from`'s lineage — at its head, or at ancestor version `at`
    * (lineage = the prefix through `at`). One JSON file; no data
    * moves.
    */
  def create(wh: Warehouse, schema: String, table: String, name: String,
      from: String = "main", tag: Boolean = false,
      at: Int = Int.MaxValue): Ref = {
    ensureMain(wh, schema, table) // mutating op — adopt on first touch
    val src = resolve(wh, schema, table, from)
    require(loadFile(wh, schema, table, name).isEmpty,
      s"$schema.$table already has a ref named $name")
    val lineage =
      if (at == Int.MaxValue) src.versions
      else {
        require(src.versions.contains(at),
          s"version $at is not in $from's lineage ${src.versions.mkString(",")}")
        // lineage membership is necessary but not sufficient: expire
        // ages out non-head lineage manifests, and a branch minted at
        // an expired ancestor would have an unreadable head — refuse
        // NOW with the real reason, not later with TimeTravel.read's
        // confusing "no committed version"
        require(TimeTravel.history(wh, schema, table).exists(_.version == at),
          s"version $at of $schema.$table has expired — its manifest " +
            "no longer exists, so a ref created there could not be read")
        src.versions.takeWhile(_ < at) :+ at
      }
    val ref = Ref(name, tag, lineage)
    save(wh, schema, table, ref)
    ref
  }

  /** Commit `df` to the branch: compose against the BRANCH head
    * ([[TimeTravel.commitFrom]]), then advance the ref. Returns the
    * new head version.
    */
  def commitTo(wh: Warehouse, schema: String, table: String, name: String,
      df: DataFrame, mode: String): Int = {
    ensureMain(wh, schema, table) // mutating op — adopt on first touch
    val ref = resolve(wh, schema, table, name)
    require(!ref.tag, s"$name is a tag — tags are immutable")
    val v = TimeTravel.commitFrom(wh, schema, table, df, mode, ref.head)
    save(wh, schema, table, ref.copy(versions = ref.versions :+ v))
    v
  }

  /** Read the ref's head snapshot. */
  def read(wh: Warehouse, schema: String, table: String,
      name: String): DataFrame =
    TimeTravel.read(wh, schema, table, resolve(wh, schema, table, name).head)

  /** Fast-forward `to` onto `from`'s head — allowed iff `to`'s
    * lineage is a PREFIX of `from`'s (pure ancestry; nothing on `to`
    * would be lost). Publishing a staged branch to `main` is one
    * ref-file rename; divergent histories refuse (Iceberg
    * `fast_forward`'s contract). Returns the new head version.
    */
  def fastForward(wh: Warehouse, schema: String, table: String,
      to: String, from: String): Int = {
    ensureMain(wh, schema, table) // mutating op — adopt on first touch
    val dst = resolve(wh, schema, table, to)
    require(!dst.tag, s"$to is a tag — tags are immutable")
    val src = resolve(wh, schema, table, from)
    require(src.versions.startsWith(dst.versions),
      s"cannot fast-forward $to to $from: histories diverged " +
        s"(${dst.versions.mkString(",")} is not a prefix of " +
        s"${src.versions.mkString(",")})")
    save(wh, schema, table, dst.copy(versions = src.versions))
    src.versions.last
  }

  /** Ref-aware snapshot expiry: [[TimeTravel.expire]] with every
    * ref's HEAD protected, so no branch or tag ever loses the files
    * it serves — intermediate branch history ages out with the same
    * keepLast window as trunk versions (per-branch time travel
    * reaches as far back as the expiry cadence allows, the m29/s17
    * retention contract).
    */
  def expire(wh: Warehouse, schema: String, table: String,
      keepLast: Int, orphanGraceMs: Long = 0L): (Int, Int) = {
    ensureMain(wh, schema, table)
    TimeTravel.expire(wh, schema, table, keepLast,
      protect = list(wh, schema, table).map(_.head).toSet,
      orphanGraceMs = orphanGraceMs)
  }
}
