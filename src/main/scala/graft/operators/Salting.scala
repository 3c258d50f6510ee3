package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual fallback when a hot
  * key would swamp one reducer and the optimizer can't help (AQE's
  * skew-join splitting covers sort-merge joins at runtime, but not
  * aggregations feeding the first shuffle, and not plans pinned to a
  * strategy AQE won't rewrite).
  *
  * Pattern: the skewed (fact) side appends a deterministic salt in
  * [0, salts) derived by hashing a high-cardinality column, spreading
  * each hot key over `salts` reducers; the other side replicates every
  * row once per salt value so the equi-join on (key, salt) is exact.
  * Cost model: replicated-side size × salts extra shuffle volume buys
  * `salts`-way parallelism on the hottest key — pick salts ≈ the skew
  * factor, keep the replicated side the SMALL side.
  *
  * The salt is Murmur3 over data columns — deterministic across runs,
  * partitionings, and cluster sizes (no RNG), and it never reaches the
  * output, so results are bit-identical to the unsalted join.
  */
object Salting {

  /** Inner equi-join `fact.factKey == dim.dimKey` executed as a salted
    * join on (key, salt). `saltBy` must be high-cardinality on the
    * fact side (e.g. the fact's line number / unique id) so each hot
    * key spreads ~evenly over the `salts` buckets.
    */
  def saltedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, salts: Int, saltBy: String): DataFrame = {
    require(salts >= 1, "salts must be positive")
    val sf = fact.withColumn("__salt", pmod(hash(col(saltBy)), lit(salts)))
    val sd = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    sf.join(sd, sf(factKey) === sd(dimKey) && sf("__salt") === sd("__salt"))
      .drop("__salt")
  }
}
