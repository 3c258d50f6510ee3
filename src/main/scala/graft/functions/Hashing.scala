package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MinHash / SimHash signature machinery as pure Catalyst column
  * expressions (higher-order functions over the shingle array — fully
  * codegen'd, no UDFs; see SURVEY.md §4 scale decisions: candidate
  * generation must be band/bucket joins, never O(n²)).
  */
object Hashing {

  /** Mersenne prime 2^61-1: modulus for the universal hash family. */
  val P: Long = 2305843009213693951L

  /** 2^31-1: shingle hashes are folded below this before the affine
    * step so a*h + b never overflows a long (Spark 4 runs ANSI mode —
    * overflow THROWS, it does not wrap).
    */
  val M31: Long = 2147483647L

  /** k fixed (a, b) parameter pairs — seeded, so signatures are
    * reproducible across runs and JVMs. a < 2^31 keeps
    * a*h31 + b < 2^62 + 2^61 < Long.MaxValue.
    */
  def minhashParams(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(k)(((r.nextLong() & Long.MaxValue) % (M31 - 1) + 1,
      (r.nextLong() & Long.MaxValue) % P))
  }

  /** One minhash slot: (a·(h mod 2^31) + b) mod P, overflow-free under
    * ANSI semantics. `h31` must already be in [0, 2^31).
    */
  def affine(h31: Column, a: Long, b: Long): Column =
    pmod(lit(a) * h31 + lit(b), lit(P))

  /** LSH band keys over a MATERIALIZED signature column (an attribute,
    * not an expression tree — nested-lambda re-evaluation of a
    * computed signature is quadratic; see Dedup.minhashSignatures):
    * split into `bands` bands of `rows` values, hash each to a bucket.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.cast(IntegerType).as("band"),
        xxhash64(slice(sig, b * rows + lit(1), lit(rows))).as("bucket")))

  val bitMasks: Seq[Long] = Seq.tabulate(64)(i => 1L << i)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
