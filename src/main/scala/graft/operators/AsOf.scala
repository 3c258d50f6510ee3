package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the LATEST right
  * row with `right.ts <= left.ts` in the same key group. The operator
  * Spark famously lacks; the naive rendering is a range join
  * (`l.k = r.k AND r.ts <= l.ts` + a per-row max), which explodes to
  * O(|matches|) pairs before pruning and shows up as a
  * BroadcastNestedLoopJoin or a huge SMJ at scale.
  *
  * This is the composed form instead (prompt ladder (a): existing ops
  * express the semantics): tag both sides, union, and take
  * `last(right_payload, ignoreNulls)` over a rows-preceding window
  * ordered by (ts, side) — right rows sort before left rows at equal
  * ts, so the match is inclusive (`>=`). ONE shuffle on the key, a
  * per-partition sort, zero row multiplication: exactly the plan an
  * as-of join wants at 100 TB. Requires right rows unique per
  * (key, ts) — otherwise "the" match at a timestamp is ill-defined.
  */
object AsOf {

  /** Left as-of join. Returns every left column plus an `asof` struct
    * holding the matched right row's non-key/ts columns (NULL when no
    * right row precedes the left row).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val rPayloadCols = right.columns.filterNot(c => c == keyCol || c == tsCol)
    val lPre = left.select(col(keyCol).as("__k"), col(tsCol).as("__t"),
      struct(left.columns.map(col): _*).as("__lp"))
    val rPre = right.select(col(keyCol).as("__k"), col(tsCol).as("__t"),
      struct(rPayloadCols.map(col): _*).as("__rp"))
    val lTagged = lPre
      .withColumn("__rp", lit(null).cast(rPre.schema("__rp").dataType))
      .withColumn("__isL", lit(true))
    val rTagged = rPre
      .withColumn("__lp", lit(null).cast(lPre.schema("__lp").dataType))
      .withColumn("__isL", lit(false))
    val cols = Seq("__k", "__t", "__lp", "__rp", "__isL")
    val unioned = lTagged.select(cols.map(col): _*)
      .unionByName(rTagged.select(cols.map(col): _*))
    // right (isL=false) sorts before left at equal ts => >= semantics
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__isL").cast("int"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__isL"))
      .select(col("__lp.*"), col("asof"))
  }
}
