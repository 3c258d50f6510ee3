package graft.ci

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Warehouse

/** Post-clone reconciliation — the trust-but-verify step after a CI
  * clone (reference: the clone handoff in
  * src/dbt_incremental_ci/copier.py:110-284 reports per-table status;
  * this closes the loop by proving source and target actually agree):
  * row counts plus an order-independent portable fingerprint compared
  * between the prod and CI schemas.
  *
  * The fingerprint is a SUM of a per-row polynomial over a prime
  * modulus — one map-side-combined aggregation pass per side (partial
  * aggregation in every scan task, a 1-row final combine, no sort and
  * no data shuffle), and engine-portable so any SQL warehouse — or
  * the DuckDB oracle — recomputes the identical value. It is a parity
  * check, not a cryptographic MAC.
  */
object Reconcile {
  private val P = 1000000007L
  private val C = 2654435761L

  /** One-row frame: (n_rows, checksum) over (key, strCol). NULLs are
    * coalesced to sentinels INSIDE the polynomial — SUM skips NULL
    * terms, so a NULL-keyed (or NULL-valued) row would otherwise
    * contribute nothing and two tables differing only in null-bearing
    * row content would still "checksum-match" when counts agree.
    * An all-NULL (or empty) input checksums to 0, not NULL.
    */
  def fingerprint(df: DataFrame, key: Column, strCol: Column): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      coalesce(sum(coalesce((key % P) * C % P, lit(P - 1)) +
        coalesce(length(strCol).cast("long"), lit(-1L))), lit(0L))
        .cast("long").as("checksum"))

  /** Reconciliation report between two schemas of a warehouse, one
    * row per (table, keyCol, strCol) triple. Each side's fingerprint
    * is an independent single-pass agg; the per-table crossJoin is
    * 1-row × 1-row.
    */
  def report(wh: Warehouse, prodSchema: String, ciSchema: String,
      tables: Seq[(String, String, String)]): DataFrame = {
    require(tables.nonEmpty, "Reconcile.report: no tables to reconcile")
    tables.map { case (t, k, s) =>
      val p = fingerprint(wh.read(prodSchema, t), col(k), col(s))
        .select(col("n_rows").as("prod_rows"),
          col("checksum").as("prod_checksum"))
      val c = fingerprint(wh.read(ciSchema, t), col(k), col(s))
        .select(col("n_rows").as("ci_rows"), col("checksum").as("ci_checksum"))
      p.crossJoin(c).select(
        lit(t).as("table_name"), col("prod_rows"), col("ci_rows"),
        col("prod_checksum"), col("ci_checksum"),
        (col("prod_rows") === col("ci_rows")).as("rows_match"),
        (col("prod_checksum") === col("ci_checksum")).as("checksum_match"))
    }.reduce(_ unionByName _)
  }
}
