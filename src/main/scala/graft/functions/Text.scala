package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis building blocks for the LLM-data-pipeline operators,
  * built exclusively from `org.apache.spark.sql.functions._` higher-
  * order functions — every expression stays inside whole-stage codegen
  * (no UDFs, no serialization walls). See SURVEY.md §2.D / §4.
  */
object Text {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct word n-gram shingles ("a b c" strings). Documents
    * shorter than `n` tokens yield an empty array.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** All word n-grams in document order, duplicates KEPT — the input
    * to repetition signals, where multiplicity is the measurement.
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Occurrences of any word from `words` (duplicates counted). */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast(LongType)

  /** Tiny per-language stopword lists for the heuristic language ID.
    * (The corpus is synthetic English-ish token soup, so `en` wins
    * everywhere — the point is the deterministic, oracle-checkable
    * scoring pipeline, not linguistic accuracy.)
    */
  val enStops = Seq("the", "a", "of", "and", "to", "in", "is")
  val esStops = Seq("el", "la", "de", "que", "y", "en")
  val deStops = Seq("der", "die", "das", "und", "ist")
  val frStops = Seq("le", "les", "des", "et", "une")

  /** argmax over the four stopword-hit counts with a fixed tie order
    * en > es > de > fr (mirrored verbatim in the DuckDB oracle).
    */
  def predLang(en: Column, es: Column, de: Column, fr: Column): Column =
    when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")

  /** Canonical form for fingerprinting: lowercase, collapse runs of
    * whitespace, trim.
    */
  def canonical(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Document fingerprint = md5 of the canonical form. */
  def fingerprint(text: Column): Column = md5(canonical(text).cast(BinaryType))
}
