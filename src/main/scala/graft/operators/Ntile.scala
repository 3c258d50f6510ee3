package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact distributed NTILE without a whole-partition window.
  *
  * `ntile(k).over(partitionBy(p).orderBy(o))` forces every row of a
  * partition through ONE task — parallelism = number of partition-key
  * values (for q15, 5 market segments forever, no matter the cluster).
  * This operator computes the identical bucket assignment with
  * parallelism = shuffle partitions:
  *
  *  1. range-partition by (partition key, order key) — a total sort
  *     order, so each partition key spans a contiguous RUN of Spark
  *     partitions and any one Spark partition holds a contiguous
  *     slice of it;
  *  2. local row_number per (spark-partition, partition-key) slice —
  *     the window key now includes the Spark partition id, so no
  *     window task sees more than one range slice;
  *  3. per-slice counts (a few rows per shuffle partition) prefix-sum
  *     into slice offsets + per-key totals — this side table is
  *     O(shuffle partitions × partition keys), broadcast back;
  *  4. global rank = slice offset + local rank; NTILE's bucket math
  *     (first n mod k buckets get the extra row) applied per row.
  *
  * Every step is a bounded shuffle or a broadcast; nothing is
  * proportional to the largest partition-key group. The assignment is
  * bit-identical to `ntile` whenever the order key is a total order
  * (ties across a range boundary would otherwise split
  * nondeterministically — same caveat as `ntile` itself).
  */
object Ntile {

  def exact(df: DataFrame, k: Int, partCols: Seq[String],
      orderCols: Seq[String], bucketName: String = "bucket",
      numPartitions: Int = 0): DataFrame = {
    require(k > 0, "k must be positive")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sortKeys = (partCols ++ orderCols).map(col)
    // eager localCheckpoint FREEZES the range partitioning: the range
    // partitioner samples boundaries per exchange materialization, and
    // `ranged` feeds two consumers (the count subtree and the final
    // join). Within one execution ReuseExchange usually dedups the
    // identical exchanges, but that is an optimizer courtesy, not a
    // contract — materializing once makes the (__pid → rows) mapping
    // the two consumers see identical BY CONSTRUCTION (the same fix
    // as Packing.offsets; a drifted boundary would mis-assign offsets).
    val ranged = df.repartitionByRange(parts, sortKeys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)

    val pk = partCols.map(col)
    val counts = ranged.groupBy((col("__pid") +: pk): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wRun = Window.partitionBy(pk: _*).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(pk: _*)
    // O(parts × keys) rows: the whole-partition window here runs over
    // the tiny count table, not the data (same bounded-input argument
    // as q14's 25-row global window)
    val offsets = counts.select(
      (Seq(col("__pid")) ++ pk ++ Seq(
        coalesce(sum("__cnt").over(wRun), lit(0L)).as("__off"),
        sum("__cnt").over(wAll).as("__n"))): _*)

    val wLocal = Window.partitionBy((col("__pid") +: pk): _*)
      .orderBy(orderCols.map(col): _*)
    // null-safe (<=>) join keys: `ntile` treats a NULL partition key as
    // a normal group, so the offset lookup must too — a plain equi-join
    // would silently drop every NULL-keyed row.
    val offSide = offsets.select(
      (col("__pid").as("__o_pid") +:
        partCols.map(c => col(c).as(s"__o_$c"))) ++
        Seq(col("__off"), col("__n")): _*)
    val joinCond = ((col("__pid") === col("__o_pid")) +:
      partCols.map(c => col(c) <=> col(s"__o_$c"))).reduce(_ && _)
    val ranked = ranged
      .join(broadcast(offSide), joinCond)
      .drop(("__o_pid" +: partCols.map(c => s"__o_$c")): _*)
      .withColumn("__rank", col("__off") + row_number().over(wLocal))

    // NTILE bucket math: base = n div k rows per bucket, the first
    // n mod k buckets take one extra. (n < 2^53 keeps the double
    // divisions exact well past any realistic group size.)
    val n = col("__n")
    val r = col("__rank")
    val base = floor(n / k).cast(LongType)
    val rem = n % k
    val cut = rem * (base + lit(1L))
    val bucket = when(r <= cut,
        floor((r - 1) / (base + lit(1L))) + 1)
      .otherwise(rem + floor((r - cut - lit(1L)) / base) + 1)
    ranked
      .withColumn(bucketName, bucket.cast(IntegerType))
      .drop("__pid", "__off", "__n", "__rank")
  }
}
