package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** UNIGRAM-LM subword tokenizer (Kudo 2018 — the SentencePiece
  * unigram model; the other tokenizer family next to x22/x25's BPE):
  * a vocabulary of PIECES with unigram log-probabilities, a word's
  * segmentation = the piece sequence maximizing total probability
  * (Viterbi), training = EM over piece usage with vocabulary pruning.
  *
  * Determinism / portability discipline: piece scores are INTEGER
  * µ-nats (round(1e6·ln(total/usage)) as BIGINT) and Viterbi
  * minimizes their exact integer sum, tie-breaking on (fewer pieces,
  * lexicographically smallest path) via struct ordering — so the
  * DuckDB oracle reproduces every segmentation bit-for-bit from the
  * same frozen vocabulary rendered as literal lists (the d02/SRP
  * "family constants in SQL" recipe).
  *
  * Scale shape: Viterbi runs over the DISTINCT-WORD frame
  * (vocab-bounded, never corpus-sized) as ONE higher-order-function
  * expression — no UDFs, no shuffle inside the DP — then joins back
  * to the doc-word stream; EM's usage counts are piece-keyed
  * aggregates (vocab-sized), and the only corpus-sized pass per
  * round is the word re-count the dictionary already amortizes.
  * Words are capped at [[MaxWordChars]] chars for the DP (documented
  * dial; the oracle unrolls exactly that many steps).
  */
object Unigram {

  final case class Piece(piece: String, scoreMu: Long, usage: Long)

  /** DP horizon: chars of a word the Viterbi considers. */
  val MaxWordChars = 30

  /** Longest piece the segmenter may emit. */
  val MaxPieceLen = 5

  /** Distinct lower-cased letter words with corpus counts — the ONE
    * corpus-sized pass everything else works from.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(substring(col("w"), 1, MaxWordChars).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** The Viterbi segmentation as ONE SQL expression over a word
    * column and a piece→µ-nat-score MAP column: acc[i] holds the best
    * (score, pieces, path) for the length-(i−1) prefix; step j
    * extends from every split point within [[MaxPieceLen]], keeps
    * candidates whose piece exists (try_element_at → NULL filtered),
    * and takes the struct-minimum — exact integer score, then fewest
    * pieces, then lexicographically smallest path. Returns the final
    * struct (s BIGINT, n INT, p leading-space-joined pieces).
    */
  def viterbiExpr(w: String, vmap: String): String =
    s"""aggregate(
       |  sequence(1, length($w)),
       |  array(named_struct('s', cast(0 as bigint), 'n', 0, 'p', '')),
       |  (acc, j) -> concat(acc, array(array_min(filter(transform(
       |      sequence(greatest(1, j - ${MaxPieceLen - 1}), j),
       |      i -> named_struct(
       |        's', element_at(acc, i).s +
       |             try_element_at($vmap, substring($w, i, j - i + 1)),
       |        'n', element_at(acc, i).n + 1,
       |        'p', concat(element_at(acc, i).p, ' ',
       |                    substring($w, i, j - i + 1)))),
       |    c -> c.s is not null)))),
       |  acc -> element_at(acc, -1))""".stripMargin

  private def vmapLit(vocab: Seq[Piece]): Column =
    typedLit(vocab.map(p => p.piece -> p.scoreMu).toMap)

  /** Segment the distinct words of `words` (column `w`) under
    * `vocab`: (w, pieces, n_pieces, score_mu).
    *
    * A word containing a character absent from the vocab has NO
    * segmentation — the Viterbi struct comes back NULL (array_min
    * over an empty filtered array). That is a coverage bug in the
    * vocabulary, and it FAILS LOUDLY here (raise_error naming the
    * word) instead of letting null pieces/score_mu flow silently
    * into downstream sums and piece hashes.
    */
  def segment(words: DataFrame, vocab: Seq[Piece]): DataFrame =
    words
      .withColumn("__vm", vmapLit(vocab))
      .withColumn("__vit", expr(viterbiExpr("w", "__vm")))
      .withColumn("__vit",
        when(col("__vit").isNotNull, col("__vit"))
          .otherwise(raise_error(concat(
            lit("unigram: no segmentation for word '"), col("w"),
            lit("' — the vocabulary lacks single-char coverage")))))
      .select(col("w"),
        ltrim(col("__vit.p")).as("pieces"),
        col("__vit.n").as("n_pieces"),
        col("__vit.s").as("score_mu"))

  /** Seed vocabulary: every substring (length ≤ [[MaxPieceLen]]) of
    * the corpus words, count-weighted; keep single chars always and
    * the `seedSize` most frequent multi-char candidates. Seed scores
    * are µ-nat unigram surprisals of the candidate counts.
    *
    * The minCount filter and the top-seedSize selection run IN THE
    * PLAN (filter + orderBy + limit — Spark plans the limit as a
    * per-partition TopK + one final merge, never a global sort), so
    * the driver collects exactly seedSize + |alphabet| rows. The
    * candidate universe (distinct-words × O(len·MaxPieceLen)
    * substrings) stays on the executors — at corpus scale it is a
    * driver OOM if collected, and it never is.
    */
  def seedVocab(wc: DataFrame, seedSize: Int, minCount: Long): Seq[Piece] = {
    val subs = wc.select(col("cnt"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), i =>
          transform(sequence(lit(1),
              least(lit(MaxPieceLen), length(col("w")) - i + 1)),
            l => col("w").substr(i, l)))))
        .as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("c"))
    // (deliberately NOT checkpointed: pinning the candidate universe
    // in the block manager would trade the driver OOM for an executor
    // one — recomputing the explode+groupBy once for each of the two
    // bounded collects below is one extra pass over the already-
    // checkpointed word frame)
    // alphabet-bounded: one row per distinct character in the corpus
    val chars = subs.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // seedSize-bounded: filter + TopK inside the plan, tie-broken on
    // the piece exactly as the in-memory sort did
    val multi = subs
      .filter(length(col("piece")) > 1 && col("c") >= minCount)
      .orderBy(col("c").desc, col("piece"))
      .limit(seedSize)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val total = (chars ++ multi).map(_._2).sum
    (chars ++ multi).sortBy { case (p, c) => (-c, p) }.map { case (p, c) =>
      Piece(p, muScore(total, c), c)
    }.toSeq
  }

  /** µ-nat surprisal: round(1e6 · ln(total/count)). */
  def muScore(total: Long, count: Long): Long =
    math.round(1e6 * math.log(total.toDouble / count.toDouble))

  /** EM training: E-step segments the distinct words under the
    * current scores and accumulates count-weighted piece usage;
    * M-step rescores from usage and PRUNES to `vocabSize` (single
    * chars always survive — coverage). `iters` rounds; returns the
    * final vocabulary sorted by (usage desc, piece) with ranks
    * implicit in order.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 64,
      iters: Int = 2, seedSize: Int = 256, minCount: Long = 2L): Seq[Piece] = {
    val wc = wordCounts(docs, textCol).localCheckpoint(true)
    var vocab = seedVocab(wc, seedSize, minCount)
    (1 to iters).foreach { _ =>
      val usage = segment(wc, vocab)
        .join(wc, "w")
        .select(col("cnt"), explode(split(col("pieces"), " ")).as("piece"))
        .groupBy("piece").agg(sum(col("cnt")).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val scored = vocab.map(p => (p.piece, usage.getOrElse(p.piece, 0L)))
      val keepMulti = scored.filter(p => p._1.length > 1 && p._2 > 0)
        .sortBy { case (p, u) => (-u, p) }
        .take(vocabSize - scored.count(_._1.length == 1))
      val kept = scored.filter(_._1.length == 1) ++ keepMulti
      val total = math.max(1L, kept.map(_._2).sum)
      vocab = kept.sortBy { case (p, u) => (-u, p) }.map { case (p, u) =>
        // unused single chars keep a floor probability (usage 0 →
        // treat as 1 so the surprisal stays finite; they must remain
        // segmentable for coverage)
        Piece(p, muScore(total, math.max(1L, u)), u)
      }
    }
    vocab
  }
}
