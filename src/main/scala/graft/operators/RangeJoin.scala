package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded range (interval) join — all (left, right) pairs in the
  * same key group with `0 <= left.ts - right.ts <= maxGap` (the
  * attribution-window shape: every event within `maxGap` AFTER a
  * purchase). Spark's naive plan for a time-inequality join is a
  * nested-loop over each key group — O(|L|·|R|) per key.
  *
  * Scale path: quantize time into `maxGap`-wide bins. A qualifying
  * pair's bins differ by at most 1, so the left side duplicates into
  * its own bin and the previous one (a bounded 2× explode of the
  * SMALL projection, not the payload), the join becomes a pure
  * equi-join on (key, bin), and the exact interval predicate filters
  * the ≤2-bin candidates. One bounded shuffle, no nested loop — the
  * standard bucketed rendering of interval joins (the same idea
  * Structured Streaming uses for stream-stream time-bound joins).
  */
object RangeJoin {

  /** Pairs (left row, right row) with `right.ts <= left.ts <=
    * right.ts + maxGapSec` on the same key. Returns every left column
    * plus a `range` struct of the right row's non-key/ts columns and
    * the right timestamp as `range_ts`.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, maxGapSec: Long): DataFrame = {
    require(maxGapSec > 0, "maxGapSec must be positive")
    val rPayloadCols = right.columns.filterNot(c => c == keyCol || c == tsCol)
    // epochMicros, not unix_micros: accepts TIMESTAMP_NTZ (the
    // canonical events encoding) as well as LTZ.
    def binOf(c: org.apache.spark.sql.Column) =
      floor(graft.sources.Catalog.epochMicros(c) / lit(maxGapSec * 1000000L))
    val l = left
      .withColumn("__bin", explode(array(binOf(col(tsCol)),
        binOf(col(tsCol)) - 1)))
      .withColumn("__lts", col(tsCol))
    val r = right.select(col(keyCol).as("__rk"), binOf(col(tsCol)).as("__bin"),
      col(tsCol).as("range_ts"),
      struct(rPayloadCols.map(col): _*).as("range"))
    l.join(r, l(keyCol) === r("__rk") && l("__bin") === r("__bin"))
      .filter(col("range_ts") <= col("__lts") &&
        graft.sources.Catalog.epochMicros(col("__lts")) -
          graft.sources.Catalog.epochMicros(col("range_ts")) <=
          maxGapSec * 1000000L)
      .drop("__bin", "__rk", "__lts")
  }
}
