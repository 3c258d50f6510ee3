package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the "concatenate and chunk" preprocessing step
  * of GPT-style training: documents are laid end-to-end in a
  * deterministic order (doc_id) and sliced into fixed-length training
  * sequences of `seqLen` tokens; the report says which docs each
  * sequence spans.
  *
  * The interesting part is the GLOBAL RUNNING OFFSET of each document
  * — a prefix sum over the whole corpus. The naive form is a global
  * `Window.orderBy(doc_id)`, which Spark executes on a SINGLE
  * partition (the WindowExec warning) — a non-starter at corpus
  * scale. This operator implements the classic TWO-PHASE PARALLEL
  * SCAN instead:
  *
  *   1. range-partition by doc_id (so partition i holds a contiguous
  *      id range) and size each partition: one tiny aggregate —
  *      only numPartitions (pid, total) rows reach the driver;
  *   2. the driver prefix-sums those totals (a numPartitions-length
  *      loop) and broadcasts the per-partition starting offsets back;
  *   3. each partition computes its own within-partition running sum
  *      under a window PARTITIONED BY pid — every partition scans in
  *      parallel, no single-partition stage anywhere.
  *
  * The result is invariant to where the range boundaries fall, so the
  * sampling inside the range partitioner cannot affect the output —
  * only the degree of parallelism.
  */
object Packing {

  /** Per-document global token offsets: (doc_id, n_tok, start) with
    * `start` = total tokens of all lower-id docs.
    */
  def offsets(docs: DataFrame, numParts: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    val sized = docs
      .select(col("doc_id"), size(split(lower(col("text")), " ")).as("n_tok"))
      .repartitionByRange(numParts, col("doc_id"))
      .withColumn("pid", spark_partition_id())
    // phase 1: numPartitions (pid, total) rows — config-sized collect
    val totals = sized.groupBy("pid").agg(sum("n_tok").as("total"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // phase 2: driver-side prefix over the partition totals (empty
    // partitions produce no row and need no offset)
    val prefixes = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
    val offsetDf = spark.createDataFrame(prefixes.toSeq)
      .toDF("pid", "part_offset")
    // phase 3: per-partition running sums, all partitions in parallel
    val w = Window.partitionBy("pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    sized.join(broadcast(offsetDf), "pid")
      .withColumn("start",
        col("part_offset") + coalesce(sum("n_tok").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tok"), col("start"))
  }

  /** Pack into `seqLen`-token sequences: one row per sequence with
    * the docs it spans. A document overlapping k sequences contributes
    * k (seq, doc) rows via an in-plan sequence() explode — bounded by
    * total_tokens / seqLen + n_docs.
    */
  def pack(docs: DataFrame, seqLen: Int, numParts: Int = 32): DataFrame =
    offsets(docs, numParts)
      .filter(col("n_tok") > 0)
      .select(col("doc_id"),
        explode(sequence(
          (col("start") / seqLen).cast("long"),
          ((col("start") + col("n_tok") - 1) / seqLen).cast("long")))
          .as("seq_id"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("seq_id")
}
