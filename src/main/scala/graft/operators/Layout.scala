package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) data layout + min/max file skipping — the
  * Delta `OPTIMIZE ZORDER BY` / Iceberg sort-order analogue for
  * multi-dimensional range queries.
  *
  * Why a linear sort is not enough: files sorted by ONE key give
  * perfect skipping on that key and none on the other. Interleaving
  * the bits of two dimension ranks places rows that are close in BOTH
  * dimensions into the same files, so every file's min/max envelope
  * stays tight on both columns and a 2-D range predicate prunes most
  * files before a single row group is read — at 100 TB that is the
  * difference between touching ~1% of files and scanning the table.
  *
  * The per-file stats frame is the lakehouse-manifest analogue (Delta
  * checkpoint / Iceberg manifest file): ONE ROW PER FILE, so it is
  * metadata-sized however large the data is. Here it is derived with
  * one `_metadata.file_path` aggregation over the written table
  * (bench-scale convenience); a production writer maintains it
  * incrementally at commit time, and parquet footers already carry
  * the same min/max per row group.
  */
object Layout {

  /** Morton code: interleave the low `bits` bits of two non-negative
    * ranks (`a` in odd positions, `b` in even). Pure bit arithmetic —
    * whole-stage codegen, no UDF.
    */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a.cast(LongType), i).bitwiseAND(lit(1L)),
          2 * i + 1)
        .bitwiseOR(shiftleft(
          shiftrightunsigned(b.cast(LongType), i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))

  /** Equal-width rank of `v` into [0, 2^bits): (v−min)·(2^bits−1) /
    * (max−min), computed against a broadcast 1-row stats frame — one
    * metadata-cheap aggregate at any scale. (Equi-DEPTH ranks via
    * range_partition_id would tighten envelopes further under heavy
    * skew, at the cost of a sample pass; equal-width is the right
    * default for the roughly uniform dimensions range queries target.)
    */
  private def rank(v: Column, lo: Column, hi: Column, bits: Int): Column =
    when(hi === lo, lit(0L)).otherwise(
      ((v.cast(DoubleType) - lo) * ((1L << bits) - 1) / (hi - lo))
        .cast(LongType))

  /** Write `df` z-ordered by (`colA`, `colB`) into `nFiles` files at
    * `path`. One (min,max) aggregate, one range shuffle on the Morton
    * code, a within-partition sort, one write — the exact cost profile
    * of Delta's OPTIMIZE ZORDER.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      nFiles: Int, bits: Int = 16): Unit = {
    val stats = df.agg(
      min(col(colA)).as("__loA"), max(col(colA)).as("__hiA"),
      min(col(colB)).as("__loB"), max(col(colB)).as("__hiB"))
    val z = zvalue(
      rank(col(colA), col("__loA"), col("__hiA"), bits),
      rank(col(colB), col("__loB"), col("__hiB"), bits), bits)
    df.crossJoin(broadcast(stats))
      .withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__loA", "__hiA", "__loB", "__hiB")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (min, max) envelope for `cols` + row count — the
    * manifest. One row per file; `n_files` rows total regardless of
    * data volume.
    */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"lo_$c"), max(col(c)).as(s"hi_$c"))) :+
      count(lit(1)).as("n_rows")
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file") +: cols.map(col): _*)
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose envelope overlaps EVERY `(col, lo, hi)` range —
    * the candidate list a manifest-driven scan would read. The
    * collect is manifest-sized (one path per surviving file), which
    * is exactly what any lakehouse reader holds on the driver.
    */
  def prunedFiles(stats: DataFrame,
      ranges: Seq[(String, Long, Long)]): (Seq[String], Long) = {
    val total = stats.count()
    val pred = ranges.map { case (c, lo, hi) =>
      col(s"lo_$c") <= hi && col(s"hi_$c") >= lo
    }.reduce(_ && _)
    val kept = stats.filter(pred).select("file")
      .collect().map(_.getString(0)).toSeq
    (kept, total)
  }

  /** Manifest-pruned scan: read only overlapping files, then apply
    * the exact predicate (envelope overlap is necessary, not
    * sufficient). Returns an empty frame with the table's schema when
    * every file prunes away.
    */
  def prunedRead(spark: SparkSession, path: String, stats: DataFrame,
      ranges: Seq[(String, Long, Long)]): DataFrame = {
    val (kept, _) = prunedFiles(stats, ranges)
    val base =
      if (kept.isEmpty)
        spark.read.parquet(path).limit(0)
      else spark.read.parquet(kept: _*)
    ranges.foldLeft(base) { case (df, (c, lo, hi)) =>
      df.filter(col(c) >= lo && col(c) <= hi)
    }
  }
}
