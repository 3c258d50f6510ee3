package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al., ACL 2016 —
  * "Neural Machine Translation of Rare Words with Subword Units"),
  * the missing piece between corpus curation (x01–x21) and an actual
  * training run: the tokenizer itself is learned FROM the corpus.
  *
  * Scale shape — the part that matters at 100 TB: the corpus is
  * touched EXACTLY ONCE, to build the word-frequency dict (tokenize →
  * one map-side-combined hash agg). Every merge iteration after that
  * runs over the DICT — vocab-sized, which grows sub-linearly with
  * corpus size (Heaps' law) — so 30 merges cost 30 small shuffles
  * over ~10⁵ rows regardless of whether the corpus behind them was
  * 1 GB or 100 TB. This mirrors how the reference single-node BPE
  * trainers scale (they too collapse to a word dict first); here the
  * dict itself stays distributed and each iteration is:
  *   1. adjacent-pair counts: one indexed `transform` + explode +
  *      hash agg (map-side combined), weighted by word frequency;
  *   2. argmax pair: TakeOrderedAndProject(1) — ONE row to the driver
  *      (the same bounded-collect contract as Recursive.iterate's
  *      termination probe);
  *   3. merge application: a codegen-friendly `aggregate` HOF fold
  *      over each word's symbol array (greedy left-to-right,
  *      non-overlapping — standard BPE), no shuffle at all;
  *   4. eager localCheckpoint so iteration N's plan does not replay
  *      N−1 prior folds (the Recursive.iterate lineage rule).
  *
  * Determinism: pair counts are exact long sums; ties break on the
  * pair's lexicographic order, so the learned merge sequence is a
  * pure function of the corpus.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** End-of-word sentinel (Sennrich's `</w>`): distinguishes "er" in
    * "older</w>" from "er" mid-word, so merges never cross word
    * boundaries.
    */
  val EndOfWord = "</w>"

  /** The ONE corpus-sized pass: words lower-cased, non-letter split,
    * counted, and exploded into per-word symbol arrays (chars + the
    * end-of-word sentinel).
    */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(
        concat(split(col("w"), ""), array(lit(EndOfWord))).as("syms"),
        col("cnt"))

  /** Frequency of every ADJACENT symbol pair, weighted by word count.
    * The indexed-transform lambda pairs position i with i+1; the HOF
    * runs over arrays bounded by word length, so per-row cost is tiny
    * and constant in corpus size.
    */
  def pairCounts(dict: DataFrame): DataFrame =
    dict.select(col("cnt"), explode(transform(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        (x: Column, i: Column) =>
          struct(x.as("a"), element_at(col("syms"), i + 2).as("b"))))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("pc"))

  /** Replace every adjacent (a, b) with the merged symbol, greedy
    * left-to-right (if the accumulator ends in `a` and the next
    * symbol is `b`, fuse; merged output never re-matches as `a` in
    * the same pass — standard BPE non-overlap). Pure map — no
    * shuffle. Literals go through `lit`, so symbol text needs no
    * escaping.
    */
  def applyMerge(dict: DataFrame, a: String, b: String): DataFrame =
    dict.withColumn("syms", mergeFold(col("syms"), a, b))

  /** The merge application as a pure COLUMN expression, so it nests
    * inside other higher-order functions (x25 folds it per word
    * inside a per-doc `transform` — corpus tokenization as a single
    * shuffle-free projection) as well as running dict-level here.
    */
  def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc: Column, x: Column) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn up to `nMerges` merges; stops early when the best pair
    * occurs fewer than `minCount` times (nothing left worth fusing).
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[Merge] = {
    var dict = wordDict(docs, textCol).localCheckpoint(eager = true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.size < nMerges && !done) {
      val top = pairCounts(dict)
        .orderBy(desc("pc"), col("a"), col("b")).limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("pc") < minCount) done = true
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        merges += Merge(merges.size + 1, a, b, top(0).getAs[Long]("pc"))
        val prev = dict
        dict = applyMerge(dict, a, b).localCheckpoint(eager = true)
        // the superseded dict (vocab-sized, one copy PER MERGE —
        // nMerges of them by the end) is dead once the new eager
        // checkpoint exists; drop its blocks
        org.apache.spark.sql.graftbridge.RddBridge.unpersistCheckpoint(prev)
      }
    }
    merges.toSeq
  }

  /** Tokenize a text column with an already-learned merge list: the
    * SERVE path — merges broadcast as literals folded in rank order,
    * one `aggregate` pass per merge over dict-free raw words. Used by
    * the spec to pin train/serve agreement.
    */
  def segmentWords(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(words)((df, m) => applyMerge(df, m.left, m.right))
}
