package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** MULTI-TABLE ATOMIC TRANSACTIONS (the Iceberg/Nessie catalog-level
  * commit — one CAS covers N tables): a transaction stages a new data
  * version for EVERY table it touches (unreferenced directories —
  * invisible), then publishes ONE catalog manifest mapping each table
  * to its current data directory, with untouched tables' pointers
  * carried forward. Readers resolve every table through the same
  * catalog snapshot, so a cross-table invariant (a mart and its audit
  * roll-up, a fact and its dimension) is NEVER observable half-
  * updated: a crash or a lost race after staging leaves only orphan
  * dirs (vacuum's concern), and the previous snapshot keeps serving
  * both tables.
  *
  * This is the capability single-table logs (TimeTravel/Occ) cannot
  * compose into: two separate CAS commits have a window where table A
  * is new and table B is old — at 100 TB with long-running writers
  * that window is minutes, and every dashboard join through it is
  * wrong. The catalog commit is still one metadata rename regardless
  * of how many tables or bytes the transaction touched; data stays in
  * per-table immutable dirs, and losing writers retry by re-staging
  * only their own updates (Occ.scala's discipline, lifted one level).
  *
  * Reference anchor: the reference's CI clone copies model tables one
  * by one (src/dbt_incremental_ci/copier.py:110-284) and its marts
  * join them; this module is the layer that would make those joins
  * consistent under concurrent refresh.
  */
object MultiTxn {

  /** One catalog snapshot: table name → data dir RELATIVE to the
    * schema root (`table/c00002_w1`).
    */
  final case class Snap(version: Int, tables: Map[String, String])

  private def fsOf(wh: Warehouse, p: Path) =
    p.getFileSystem(wh.spark.sparkContext.hadoopConfiguration)

  private def catDir(wh: Warehouse, schema: String) =
    new Path(wh.path(schema, "_catalog"))

  /** Current catalog snapshot; version 0 = empty catalog. */
  def snapshot(wh: Warehouse, schema: String): Snap = {
    val cd = catDir(wh, schema)
    val f = fsOf(wh, cd)
    if (!f.exists(cd)) return Snap(0, Map.empty)
    val names = f.listStatus(cd).toSeq.map(_.getPath.getName)
      // {5,} + numeric sort: past slot 99999 the names widen
      // (v100000.json), which a 5-exact regex would hide and a
      // lexicographic sort would order before v99999
      .filter(_.matches("v\\d{5,}\\.json"))
      .sortBy(_.stripPrefix("v").stripSuffix(".json").toInt)
    if (names.isEmpty) return Snap(0, Map.empty)
    parse(wh, cd, names.last)
  }

  /** The catalog AS OF `version` — time travel across the whole
    * schema in one pin, since every table resolves through the one
    * manifest.
    */
  def snapshotAt(wh: Warehouse, schema: String, version: Int): Snap =
    parse(wh, catDir(wh, schema), f"v$version%05d.json")

  private def parse(wh: Warehouse, cd: Path, name: String): Snap = {
    val f = fsOf(wh, cd)
    val in = f.open(new Path(cd, name))
    val content = try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 8192, false)
      new String(bytes.toByteArray, "UTF-8")
    } finally in.close()
    val tables = "\"([A-Za-z0-9_]+)\"\\s*:\\s*\"([A-Za-z0-9_/]+)\"".r
      .findAllMatchIn(content).map(m => m.group(1) -> m.group(2)).toMap
    Snap(name.stripPrefix("v").stripSuffix(".json").toInt, tables)
  }

  /** Read `table` AS OF `snap` — every table of a join resolved
    * through the same snapshot is the whole point.
    */
  def read(wh: Warehouse, schema: String, snap: Snap, table: String): DataFrame = {
    val dir = snap.tables.getOrElse(table,
      throw new IllegalArgumentException(
        s"$schema.$table not in catalog v${snap.version}"))
    wh.spark.read.parquet(s"${wh.root}/$schema/$dir")
  }

  /** Stage `df` as `table`'s data for version `n`: write to an
    * UNREFERENCED writer-suffixed dir and return its relative name.
    * Public so a crash between staging and commit is simulable — the
    * staged dir must be invisible until the catalog rename.
    */
  def stage(wh: Warehouse, schema: String, table: String, df: DataFrame,
      n: Int, writerId: String): String = {
    require(writerId.matches("[A-Za-z0-9_]+"), "writer id must be a name")
    // the manifest is parsed by a [A-Za-z0-9_]+ name pattern (parse
    // above); a table name outside it would serialize into valid JSON
    // yet vanish from every subsequent snapshot — reject it at the
    // door instead of losing it silently
    require(table.matches("[A-Za-z0-9_]+"),
      s"table name '$table' must match [A-Za-z0-9_]+ (manifest identifier)")
    val rel = f"$table/c$n%05d_$writerId"
    df.write.mode("overwrite").parquet(s"${wh.root}/$schema/$rel")
    rel
  }

  /** CAS-publish one catalog version binding `staged` (table →
    * staged dir) plus every untouched table carried forward from
    * `expected`'s snapshot. False = lost the race (stale snapshot);
    * the staged dirs become sweepable orphans.
    *
    * Arbiter caveat (same as Occ.tryCommit, which this lifts one
    * level): on HDFS / object stores with no-overwrite rename the
    * rename IS the atomic arbiter; on the local filesystem POSIX
    * rename replaces, so the exists check arbitrates and a
    * check-then-rename window remains between truly simultaneous
    * local commits — the deployment note is "point the warehouse at
    * a no-overwrite filesystem", the note every Delta-on-posix
    * deployment carries.
    */
  def tryCommit(wh: Warehouse, schema: String, staged: Map[String, String],
      expected: Int, writerId: String): Boolean = {
    val cur = snapshot(wh, schema)
    if (cur.version != expected) return false
    val n = expected + 1
    val merged = cur.tables ++ staged
    val json = merged.toSeq.sortBy(_._1)
      .map { case (t, d) => s""""$t":"$d"""" }
      .mkString(s"""{"version":$n,"tables":{""", ",", "}}")
    val cd = catDir(wh, schema)
    val f = fsOf(wh, cd)
    f.mkdirs(cd)
    val target = new Path(cd, f"v$n%05d.json")
    val tmp = new Path(cd, f".v$n%05d.json.__tmp_$writerId")
    val out = f.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val won = !f.exists(target) && f.rename(tmp, target)
    if (!won) f.delete(tmp, false)
    won
  }

  /** Multi-table read-modify-write with OCC retries: `update` maps a
    * snapshot to the tables it replaces; staging + the single CAS
    * repeat until the commit lands. Returns the committed version.
    */
  def transact(wh: Warehouse, schema: String, writerId: String,
      maxRetries: Int = 5)(update: Snap => Map[String, DataFrame]): Int = {
    var attempt = 0
    while (attempt <= maxRetries) {
      val s = snapshot(wh, schema)
      val n = s.version + 1
      val staged = update(s).map { case (t, df) =>
        t -> stage(wh, schema, t, df, n, s"${writerId}_a$attempt") }
      if (tryCommit(wh, schema, staged, s.version, s"${writerId}_a$attempt"))
        return n
      attempt += 1
    }
    throw new IllegalStateException(
      s"$schema: lost the catalog commit race $maxRetries times (writer $writerId)")
  }
}
