package graft.operators

import org.apache.spark.sql.DataFrame

/** Size gate for the COMPARE-SCALE calibration dials (the exact
  * fixed-parameter forms whose candidate volume is super-linear by
  * construction — s05's fixed-centroid kNN graph, d05/d03/s15's fixed
  * bucket widths). Each has an occupancy-held `_auto` sibling that is
  * the production path; the exact forms exist to calibrate those
  * dials against a known corpus size, and REFUSING oversized input —
  * loudly, with a pointer at the production operator — is the correct
  * behavior at 100 TB, where running them would not fail fast but
  * melt a cluster slowly.
  */
object Gate {

  /** Thrown when a calibration dial refuses corpus-sized input.
    * Distinct type so harnesses (the sf1 sweep, Bench) can record
    * "gated by design" instead of an operator error.
    */
  final class SizeGatedException(msg: String)
    extends IllegalArgumentException(msg)

  def check(n: Long, limit: Long, op: String, productionOp: String): Unit =
    if (n > limit) throw new SizeGatedException(
      s"$op is a compare-scale calibration dial and refuses inputs over " +
        s"$limit rows (got $n): its fixed parameters make candidate volume " +
        s"super-linear at corpus scale. Use $productionOp instead — same " +
        "verified output contract, occupancy-held candidates at any scale.")

  /** Bounded-probe form: counts `limit + 1` rows at most, so the gate
    * itself costs O(limit) — a full `df.count()` would scan the very
    * corpus the gate exists to refuse. The probe count saturates at
    * limit + 1, so the refusal message reports a lower bound.
    */
  def check(df: DataFrame, limit: Long, op: String, productionOp: String): Unit =
    if (limit >= Int.MaxValue.toLong)
      // limit(Int) can't express the probe — fall back to the exact
      // count rather than a saturated probe that could never fire
      check(df.count(), limit, op, productionOp)
    else {
      val n = df.limit(limit.toInt + 1).count()
      if (n > limit) throw new SizeGatedException(
        s"$op is a compare-scale calibration dial and refuses inputs over " +
          s"$limit rows (probe saw > $limit): its fixed parameters make " +
          s"candidate volume super-linear at corpus scale. Use $productionOp " +
          "instead — same verified output contract, occupancy-held candidates " +
          "at any scale.")
    }
}
