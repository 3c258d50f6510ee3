package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 snapshots, dbt's `timestamp` strategy re-expressed set-based:
  * each run captures the source's CURRENT state; rows whose
  * `updated_at` advanced since the last captured version close out the
  * old version (valid_to = new updated_at) and open a new current one.
  *
  * The reference treats snapshots as first-class CI clone targets
  * (reference: src/dbt_incremental_ci/dbt_helper.py:146-156); the
  * snapshot table shape (valid_from / valid_to / is_current) matches
  * dbt's dbt_valid_from / dbt_valid_to convention.
  *
  * Scale: one shuffle on the snapshot key per run (the full-outer
  * source⋈current join); history rows are carried through untouched by
  * the staged rewrite — on a lakehouse format the rewrite becomes a
  * MERGE INTO on the same join.
  */
object Snapshot {

  /** Run one snapshot capture of `source` into `schema.name`.
    * `source` must be one row per `key` (the current state).
    */
  def capture(wh: Warehouse, schema: String, name: String,
      source: DataFrame, key: Seq[String], updatedAt: String): Unit = {
    val tsType = source.schema(updatedAt).dataType
    if (!wh.exists(schema, name)) {
      val seeded = source
        .withColumn("valid_from", col(updatedAt))
        .withColumn("valid_to", lit(null).cast(tsType))
        .withColumn("is_current", lit(true))
      wh.write(seeded, schema, name)
    } else {
      val existing = wh.read(schema, name)
      val history = existing.filter(!col("is_current"))
      val current = existing.filter(col("is_current"))

      val srcCols = source.columns.toSeq
      val newState = source.select(srcCols.map(c => col(c).as(s"__src_$c")): _*)
      val joinCond = key.map(k => col(k) === col(s"__src_$k")).reduce(_ && _)
      val joined = current.join(newState, joinCond, "full_outer")

      val changed = col(s"__src_$updatedAt") > col(updatedAt)
      val newKey = col(updatedAt).isNull // key only in source

      // existing current rows: closed out if changed, else carried
      val carried = joined.filter(col(updatedAt).isNotNull)
        .select((current.columns.toSeq.filterNot(
          Set("valid_to", "is_current")).map(col) ++ Seq(
          when(changed, col(s"__src_$updatedAt"))
            .otherwise(lit(null).cast(tsType)).as("valid_to"),
          (!coalesce(changed, lit(false))).as("is_current"))): _*)

      // new versions: changed keys + brand-new keys
      val opened = joined.filter(newKey || coalesce(changed, lit(false)))
        .select((srcCols.map(c => col(s"__src_$c").as(c)) ++ Seq(
          col(s"__src_$updatedAt").as("valid_from"),
          lit(null).cast(tsType).as("valid_to"),
          lit(true).as("is_current"))): _*)

      wh.overwriteStaged(
        history.unionByName(carried).unionByName(opened), schema, name)
    }
  }
}
