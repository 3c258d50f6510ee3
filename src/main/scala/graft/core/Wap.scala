package graft.core

import org.apache.spark.sql.DataFrame

/** WRITE-AUDIT-PUBLISH (Iceberg's WAP pattern / Netflix's original
  * branch-audit-publish): a model's output lands in a STAGED
  * location, data-quality checks run against the staged bytes, and
  * only a fully-clean audit promotes them to the live table — a
  * failing audit leaves the previous version untouched and visible.
  * This is the missing composition between the engine's
  * materializations (which publish unconditionally) and its
  * data-quality operators (which report violations after the fact):
  * at 100 TB you cannot afford consumers reading a bad publish even
  * briefly, and you equally cannot afford auditing a COPY of the
  * data — so the audited files must BE the published files.
  *
  * Mechanics on the parquet warehouse:
  *  - stage: write to `<table>.__audit` (distributed, resilient);
  *  - audit: each check maps the staged DataFrame to its VIOLATION
  *    rows (the DataQuality contract — zero rows = pass) and is
  *    counted against the staged read, so the bytes checked are the
  *    bytes promoted;
  *  - publish: the staged dir renames into place with the same
  *    live-aside/.__old crash-safe discipline as overwriteStaged —
  *    two metadata renames, no data movement;
  *  - abort: the staged dir is dropped, the live table never
  *    changed, and the violation counts come back for the CI report.
  *
  * Reference tie-in: this is the reference's CI philosophy (test
  * BEFORE the expensive promotion — core.py's clone-then-run) applied
  * at the single-table publish boundary.
  */
object Wap {

  final case class Audit(check: String, violations: Long)

  /** Stage `df`, audit it, and promote only on a clean audit.
    * Returns (published?, per-check violation counts).
    */
  def publish(wh: Warehouse, schema: String, table: String, df: DataFrame,
      checks: Seq[(String, DataFrame => DataFrame)]): (Boolean, Seq[Audit]) = {
    require(checks.nonEmpty, "WAP without checks is just a publish")
    val auditName = table + ".__audit"
    wh.write(df, schema, auditName)
    val staged = wh.read(schema, auditName)
    val results = checks.map { case (name, violations) =>
      Audit(name, violations(staged).count())
    }
    val root = new org.apache.hadoop.fs.Path(wh.path(schema, table))
    val f = root.getFileSystem(wh.spark.sparkContext.hadoopConfiguration)
    val stagedP = new org.apache.hadoop.fs.Path(wh.path(schema, auditName))
    if (results.forall(_.violations == 0L)) {
      // promote: same crash-safe two-rename discipline as
      // Warehouse.overwriteStaged (live aside, audited dir in)
      val old = new org.apache.hadoop.fs.Path(wh.path(schema, table + ".__old"))
      if (f.exists(old)) f.delete(old, true)
      val hadLive = f.exists(root)
      if (hadLive) require(f.rename(root, old),
        s"could not move $schema.$table aside for WAP publish")
      require(f.rename(stagedP, root),
        s"WAP publish failed for $schema.$table")
      if (hadLive) f.delete(old, true)
      (true, results)
    } else {
      f.delete(stagedP, true)
      (false, results)
    }
  }
}
