package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** COLUMN MAPPING — rename/drop columns as METADATA (Iceberg schema
  * evolution via field IDs / Delta `columnMapping.mode=name`), the
  * missing half of m05's append_new_columns: on plain parquet a
  * rename is a full-table rewrite (every file stores the old name);
  * with field IDs it is one schema-version bump.
  *
  * The identity of a column is its FIELD ID, never its name:
  *  - each commit is bound to the schema version it was WRITTEN
  *    under, so its files' physical names resolve through that
  *    version's (id → name) mapping;
  *  - a logical read selects, per commit, each live field's physical
  *    name aliased to its CURRENT name — old eras serve a renamed
  *    column with zero rewrites, and because the projection is a
  *    plain `select`, parquet column pruning means a DROPPED field's
  *    bytes are never even scanned in any era;
  *  - fields added after a commit read as typed NULLs there (m05's
  *    semantics, carried per era);
  *  - and the field-id guarantee that name-based mapping cannot give:
  *    DROP `x` then ADD a new `x` assigns a FRESH id, so the old
  *    physical `x` bytes never resurrect under the new column — a
  *    name-based reader would silently serve deleted data
  *    (spec-pinned).
  *
  * Why this is the 100 TB feature: renaming or retiring a column on
  * a 100 TB table must not cost a rewrite — Iceberg/Delta bind
  * schemas to commits for exactly this reason. Schema versions and
  * the commit→version binding are metadata-sized at any volume.
  *
  * Like PartitionEvolution.Table, the table handle is carried
  * in-process (commit list + schema versions); persisting it is the
  * same one-JSON-per-version manifest TimeTravel already implements —
  * commit atomicity/visibility is that layer's job, not this one's.
  */
object ColumnMapping {

  /** A live column: immutable id, current name, Spark SQL type. */
  final case class Field(id: Int, name: String, dtype: String)

  /** One schema version (live fields only, in declaration order). */
  final case class Schema(version: Int, fields: Seq[Field])

  /** An evolved table: commit dirs each bound to the schema it was
    * written under, plus the current schema and the next fresh id.
    */
  final case class Table(root: String, commits: Seq[(String, Schema)],
      current: Schema, nextId: Int)

  private def commitDir(root: String, n: Int) = f"$root/c$n%05d"

  /** Create the table from `df`'s columns (ids assigned by position)
    * and write commit 1 under schema v1. Clears any residue at
    * `root` first — create means a FRESH table, and a stale c00002
    * from a previous incarnation would otherwise block (or worse,
    * satisfy) the first append's collision check.
    */
  def create(df: DataFrame, root: String): Table = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val fields = df.schema.fields.zipWithIndex.map { case (f, i) =>
      Field(i, f.name, f.dataType.sql)
    }.toSeq
    val s1 = Schema(1, fields)
    df.write.mode("overwrite").parquet(commitDir(root, 1))
    Table(root, Seq(commitDir(root, 1) -> s1), s1, fields.size)
  }

  /** Append a batch carrying the CURRENT live columns; the commit is
    * bound to the current schema version. REFUSES a commit slot that
    * already holds data: the slot number derives from this handle's
    * commit count, so two appends branched from the same immutable
    * handle would otherwise silently share one directory — the first
    * handle would then serve the second append's rows (handles are
    * linear, like any single-writer table; the check turns the misuse
    * into an error instead of corrupted reads).
    */
  def append(t: Table, df: DataFrame): Table = {
    val expect = t.current.fields.map(_.name)
    require(df.columns.toSeq == expect,
      s"append must carry the current live columns $expect, got ${df.columns.toSeq}")
    val dir = commitDir(t.root, t.commits.size + 1)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    require(!fs.exists(p),
      s"commit slot $dir already holds data — append through the LATEST " +
        "table handle (handles are linear; an append from a stale handle " +
        "would overwrite another append's commit)")
    df.write.mode("errorifexists").parquet(dir)
    t.copy(commits = t.commits :+ (dir -> t.current))
  }

  /** Rename a live column — METADATA ONLY (the field keeps its id, so
    * every era's physical name still resolves). Refuses a collision
    * with another live name.
    */
  def rename(t: Table, from: String, to: String): Table = {
    require(t.current.fields.exists(_.name == from),
      s"no live column named $from")
    require(!t.current.fields.exists(_.name == to),
      s"a live column named $to already exists")
    val next = Schema(t.current.version + 1,
      t.current.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    t.copy(current = next)
  }

  /** Drop a live column — METADATA ONLY. Old files keep the bytes on
    * disk (a lakehouse rewrite reclaims them lazily), but no read
    * ever selects them again: the projection below prunes the
    * physical column out of every scan.
    */
  def drop(t: Table, name: String): Table = {
    require(t.current.fields.exists(_.name == name),
      s"no live column named $name")
    val next = Schema(t.current.version + 1,
      t.current.fields.filterNot(_.name == name))
    t.copy(current = next)
  }

  /** Add a column with a FRESH field id (never a recycled one — the
    * non-resurrection guarantee). Commits written before it read
    * typed NULLs.
    */
  def addColumn(t: Table, name: String, dtype: String): Table = {
    require(!t.current.fields.exists(_.name == name),
      s"a live column named $name already exists")
    val next = Schema(t.current.version + 1,
      t.current.fields :+ Field(t.nextId, name, dtype))
    t.copy(current = next, nextId = t.nextId + 1)
  }

  /** The logical read: per commit, each live field resolves to the
    * physical name it had AT WRITE TIME (by field id), aliased to its
    * current name; fields the commit predates read as typed NULLs.
    * One select per era, one unionByName — the scan of each era reads
    * exactly the live fields' physical columns, nothing else.
    */
  def read(spark: SparkSession, t: Table): DataFrame =
    t.commits.map { case (dir, written) =>
      val byId = written.fields.map(f => f.id -> f).toMap
      spark.read.parquet(dir).select(t.current.fields.map { f =>
        byId.get(f.id) match {
          case Some(pf) => col(pf.name).as(f.name)
          case None     => expr(s"CAST(NULL AS ${f.dtype})").as(f.name)
        }
      }: _*)
    }.reduce(_ unionByName _)
}
