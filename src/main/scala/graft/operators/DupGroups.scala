package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-dup PAIRS into dedup GROUPS. Pair detection (d02/d04/
  * d05) says "a≈b" and "b≈c"; deduplication needs the transitive
  * closure {a,b,c} with ONE canonical survivor, which is exactly a
  * connected-components problem on the similarity graph.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the minimum
  * label in its neighborhood (including its own); fixpoint when no
  * label changes. The component label is therefore the smallest node
  * id in the component — a deterministic canonical id.
  *
  * Scale shape: each round is one shuffle on node id (join edges with
  * labels + a min aggregation); the driver reads only a changed-count
  * scalar per round, and `localCheckpoint` cuts lineage exactly like
  * Recursive.iterate. Rounds needed = component diameter; near-dup
  * components are shallow clusters (not long chains), so the loop is
  * short in practice and `maxIter` is a safety cap, not a tuning knob.
  * This is the DataFrame rendering of classic label-propagation CC
  * (the Pregel/GraphX formulation).
  */
object DupGroups {

  /** (id, comp) for every node appearing in `edges` (columns
    * id_a/id_b); comp = min node id of the connected component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // symmetric edge list, materialized once — every iteration reuses
    // it instead of recomputing the (possibly expensive) pair plan
    val sym = edges.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(edges.select(col("id_b").as("u"), col("id_a").as("v")))
      .localCheckpoint()
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val nbr = sym.join(labels, sym("u") === labels("id"))
        .select(col("v").as("id"), col("comp").as("ncomp"))
        .groupBy("id").agg(min("ncomp").as("ncomp"))
      val next = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (col("ncomp").isNotNull && col("ncomp") < col("comp")).as("__chg"))
        .localCheckpoint()
      changed = next.filter(col("__chg")).count()
      labels = next.drop("__chg")
      it += 1
    }
    require(changed == 0, s"connected components did not converge in $maxIter rounds")
    labels
  }

  /** Dedup groups from near-dup pairs: every doc that appears in a
    * pair, with its group's canonical id (min doc id in the
    * component), the group size, and whether THIS doc is the one a
    * dedup pass would keep.
    */
  def groups(pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs.select("id_a", "id_b"))
      .select(col("id").as("doc_id"), col("comp").as("canonical_id"))
    val sizes = comp.groupBy("canonical_id")
      .agg(count(lit(1)).as("group_size"))
    comp.join(sizes, "canonical_id")
      .select(col("doc_id"), col("canonical_id"), col("group_size"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
  }
}
