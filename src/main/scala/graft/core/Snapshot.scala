package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

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
    *
    * `hardDeleteTs`: dbt's opt-in `invalidate_hard_deletes` — when
    * set, current rows whose key is ABSENT from the source are closed
    * out with this timestamp (dbt stamps the run clock; graft takes it
    * as a parameter so CI runs are reproducible). Default `None`
    * keeps dbt's default: an absent key stays current.
    */
  def capture(wh: Warehouse, schema: String, name: String,
      source: DataFrame, key: Seq[String], updatedAt: String,
      hardDeleteTs: Option[String] = None): Unit = {
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

      // a non-null source timestamp against a NULL stored one IS a
      // change (the key finally got a real updated_at) — a bare
      // `src > cur` would be NULL there and freeze the row forever
      val srcTs = col(s"__src_$updatedAt")
      val changed = srcTs.isNotNull && (col(updatedAt).isNull || srcTs > col(updatedAt))
      // row existence is anchored on KEY nullity, not updated_at: an
      // existing current row whose updated_at is legitimately NULL must
      // still be carried, not silently dropped from the snapshot.
      val anchor = col(key.head)
      val newKey = anchor.isNull // key only in source
      val gone =
        if (hardDeleteTs.isDefined) col(s"__src_${key.head}").isNull
        else lit(false)

      // existing current rows: closed out if changed (or hard-deleted
      // under invalidate_hard_deletes), else carried
      val carried = joined.filter(anchor.isNotNull)
        .select((current.columns.toSeq.filterNot(
          Set("valid_to", "is_current")).map(col) ++ Seq(
          when(changed, srcTs)
            .when(gone, lit(hardDeleteTs.orNull).cast(tsType))
            .otherwise(lit(null).cast(tsType)).as("valid_to"),
          (!(changed || gone)).as("is_current"))): _*)

      // new versions: changed keys + brand-new keys
      val opened = joined.filter(newKey || changed)
        .select((srcCols.map(c => col(s"__src_$c").as(c)) ++ Seq(
          srcTs.as("valid_from"),
          lit(null).cast(tsType).as("valid_to"),
          lit(true).as("is_current"))): _*)

      wh.overwriteStaged(
        history.unionByName(carried).unionByName(opened), schema, name)
    }
  }

  /** dbt's `check` snapshot strategy: a row is a new version when any
    * of `checkCols` changed (null-safe compare), stamped with the
    * run's `captureTs` (dbt uses the run clock; graft takes it as a
    * parameter so CI runs are reproducible). Same single-shuffle
    * full-outer shape as the timestamp strategy.
    */
  def captureCheck(wh: Warehouse, schema: String, name: String,
      source: DataFrame, key: Seq[String], checkCols: Seq[String],
      captureTs: String, invalidateHardDeletes: Boolean = false): Unit = {
    val ts = lit(captureTs).cast(TimestampType)
    if (!wh.exists(schema, name)) {
      wh.write(source
        .withColumn("valid_from", ts)
        .withColumn("valid_to", lit(null).cast(TimestampType))
        .withColumn("is_current", lit(true)), schema, name)
    } else {
      val existing = wh.read(schema, name)
      val history = existing.filter(!col("is_current"))
      val current = existing.filter(col("is_current"))

      val srcCols = source.columns.toSeq
      val newState = source.select(srcCols.map(c => col(c).as(s"__src_$c")): _*)
      val joinCond = key.map(k => col(k) === col(s"__src_$k")).reduce(_ && _)
      val joined = current.join(newState, joinCond, "full_outer")

      val anchor = col(key.head)
      val srcExists = col(s"__src_${key.head}").isNotNull
      // a key absent from the source is NOT a change (dbt keeps it
      // current unless invalidate_hard_deletes is on)
      val changed = srcExists &&
        checkCols.map(c => !(col(c) <=> col(s"__src_$c"))).reduce(_ || _)
      val newKey = anchor.isNull
      val gone = if (invalidateHardDeletes) !srcExists else lit(false)

      val carried = joined.filter(anchor.isNotNull)
        .select((current.columns.toSeq.filterNot(
          Set("valid_to", "is_current")).map(col) ++ Seq(
          when(changed || gone, ts)
            .otherwise(lit(null).cast(TimestampType)).as("valid_to"),
          (!(changed || gone)).as("is_current"))): _*)

      val opened = joined.filter(newKey || changed)
        .select((srcCols.map(c => col(s"__src_$c").as(c)) ++ Seq(
          ts.as("valid_from"),
          lit(null).cast(TimestampType).as("valid_to"),
          lit(true).as("is_current"))): _*)

      wh.overwriteStaged(
        history.unionByName(carried).unionByName(opened), schema, name)
    }
  }
}
