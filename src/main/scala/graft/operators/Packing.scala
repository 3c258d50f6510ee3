package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

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
  *   1. range-partition by doc_id (partition i holds a contiguous id
  *      range) and MATERIALIZE that layout once (eager
  *      localCheckpoint): the range partitioner samples boundaries
  *      per execution, so the two consumers below must read the SAME
  *      materialized partitioning — re-executing the exchange twice
  *      could sample different boundaries and mis-assign offsets;
  *   2. per-partition totals → running offsets, computed over the
  *      numPartitions-row count table (the single-partition window
  *      there is bounded by the parallelism knob, not the data — the
  *      Ntile.exact argument) and broadcast-joined back;
  *   3. each partition computes its own within-partition running sum
  *      under a window PARTITIONED BY pid — every partition scans in
  *      parallel, no data-sized single-partition stage anywhere.
  */
object Packing {

  /** Per-document global token offsets: (doc_id, n_tok, start) with
    * `start` = total tokens of all lower-id docs. Token rule =
    * [[Text.tokens]], the corpus-wide tokenization every operator
    * shares.
    */
  def offsets(docs: DataFrame, numParts: Int = 32): DataFrame =
    offsetsKeyed(
      docs.select(col("doc_id"), size(Text.tokens(col("text"))).as("n_tok")),
      "doc_id", numParts)
      .select(col("doc_id"), col("n_tok"), col("start"))

  /** The two-phase scan over an ARBITRARY pre-sized stream: `rows`
    * carries a sortable `keyCol` plus `n_tok` (and any passthrough
    * columns); `start` = total n_tok of all lower-key rows. This is
    * the seam p05's epoch materializer packs through — the stream
    * there is doc COPIES in shuffle-key order, not docs in id order.
    * Keys must be unique (equal keys would make the within-partition
    * order, and therefore the offsets, ambiguous).
    */
  def offsetsKeyed(rows: DataFrame, keyCol: String,
      numParts: Int = 32): DataFrame = {
    val sized = rows
      .repartitionByRange(numParts, col(keyCol))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val wRun = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sized.groupBy("pid").agg(sum("n_tok").as("total"))
      .select(col("pid"),
        coalesce(sum("total").over(wRun), lit(0L)).as("part_offset"))
    val wLocal = Window.partitionBy("pid").orderBy(keyCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    sized.join(broadcast(offs), "pid")
      .withColumn("start",
        col("part_offset") + coalesce(sum("n_tok").over(wLocal), lit(0L)))
      .drop("pid", "part_offset")
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
        // integral `div`, not double `/` + cast: double division only
        // matches the oracle's floor past ~2^42 tokens by luck of the
        // mantissa — `div` is exact at any corpus size
        explode(sequence(
          expr(s"start div $seqLen"),
          expr(s"(start + n_tok - 1) div $seqLen")))
          .as("seq_id"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("seq_id")
}
