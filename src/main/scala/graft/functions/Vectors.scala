package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dense-vector math over `array<float>` embedding columns using
  * codegen-friendly higher-order functions. Folds are strict
  * left-folds in index order, so results are bit-identical to the
  * DuckDB oracle's list_reduce — float nondeterminism cannot leak
  * into the hash compare.
  */
object Vectors {

  /** array<float> → array<double> (all math in double). */
  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Strict left-fold sum of an array<double>. */
  def fsum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  /** Codegen'd strict-order dot product (graft.plans.DotProduct). */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExpressions.dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays given precomputed norms
    * (precompute norms once per row; never per pair).
    */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Dot product against a fixed hyperplane (literal weights). */
  def dotLit(v: Column, plane: Array[Double]): Column =
    dot(v, array(plane.map(lit): _*))
}
