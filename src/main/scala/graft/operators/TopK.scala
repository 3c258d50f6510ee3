package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase top-k per group.
  *
  * A plain `row_number over (partition by g order by o) <= k` shuffles
  * EVERY row of a group to one task — with low-cardinality groups
  * (5 market segments, 25 nations) that caps parallelism at the group
  * count and buffers whole groups, a scale-killer at 100×.
  *
  * Phase 1 ranks within (group, input-partition) — parallelism is
  * groups × partitions and each task holds at most k rows per group —
  * and keeps the local top-k. Phase 2 ranks the ≤ k·partitions
  * survivors per group globally. Any row in the global top-k is in its
  * partition's local top-k, so the result is exact; moreover every row
  * PRECEDING (in `order`) a surviving global top-k row also survives
  * phase 1, so rank()/dense_rank() computed on the pruned set agree
  * with their full-data values for all emitted rows.
  */
object TopK {

  /** Rows whose per-group `row_number` (by `order`) is ≤ k, with the
    * rank as `rankName`. `order` must be a total order (include a
    * tiebreak) for deterministic output.
    */
  def perGroup(df: DataFrame, group: Seq[Column], order: Seq[Column],
      k: Int, rankName: String = "rn"): DataFrame = {
    val local = Window.partitionBy(group :+ spark_partition_id(): _*)
      .orderBy(order: _*)
    val pruned = df
      .withColumn("__local_rn", row_number().over(local))
      .filter(col("__local_rn") <= k)
      .drop("__local_rn")
    val global = Window.partitionBy(group: _*).orderBy(order: _*)
    pruned
      .withColumn(rankName, row_number().over(global))
      .filter(col(rankName) <= k)
  }

  /** Phase-1 prune only: global top-k superset with bounded per-task
    * state; callers layer their own window functions (rank,
    * dense_rank, ...) over the survivors.
    */
  def prune(df: DataFrame, group: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val local = Window.partitionBy(group :+ spark_partition_id(): _*)
      .orderBy(order: _*)
    df.withColumn("__local_rn", row_number().over(local))
      .filter(col("__local_rn") <= k)
      .drop("__local_rn")
  }
}
