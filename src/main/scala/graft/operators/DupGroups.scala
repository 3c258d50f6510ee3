package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-dup PAIRS into dedup GROUPS. Pair detection (d02/d04/
  * d05) says "a≈b" and "b≈c"; deduplication needs the transitive
  * closure {a,b,c} with ONE canonical survivor, which is exactly a
  * connected-components problem on the similarity graph.
  *
  * Algorithm: min-label propagation WITH pointer jumping (path
  * compression). Every node starts labeled with its own id; each
  * round every node (1) takes the minimum label in its neighborhood
  * (including its own), then (2) replaces its label with its LABEL'S
  * label — the Shiloach-Vishkin shortcut step. Step 2 roughly doubles
  * the distance a min label travels per round, so convergence is
  * O(log diameter) rounds instead of O(diameter): a 50-node chain
  * finishes in ~6 rounds, not 50 (pinned in PropertySpec). The
  * component label is the smallest node id in the component — a
  * deterministic canonical id.
  *
  * Scale shape: each round is one shuffle on node id (join edges with
  * labels + a min aggregation) plus one label self-join on the label
  * key (the compression lookup — labels is |V| rows, far smaller than
  * the edge join); the driver reads only a changed-count scalar per
  * round, and `localCheckpoint` cuts lineage exactly like
  * Recursive.iterate. With the log-round bound, `maxIter` = 50 covers
  * diameters up to ~2^48 — a pure safety net against a malformed edge
  * list, not a knob a caller must tune for chain-shaped corpora
  * (templated/boilerplate docs commonly form long near-dup chains).
  * This is the DataFrame rendering of label-propagation CC with the
  * classic Pregel/GraphX pointer-jumping acceleration.
  */
object DupGroups {

  /** (id, comp) for every node appearing in `edges` (columns
    * id_a/id_b); comp = min node id of the connected component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
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
      // (1) propagate: min label across the neighborhood
      val nbr = sym.join(labels, sym("u") === labels("id"))
        .select(col("v").as("id"), col("comp").as("ncomp"))
        .groupBy("id").agg(min("ncomp").as("ncomp"))
      val prop = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (col("ncomp").isNotNull && col("ncomp") < col("comp")).as("__chg"))
      // (2) compress: comp <- comp's own label (pointer jumping). Every
      // comp value IS a node id present in `prop`, so the lookup is an
      // equi-join of labels against itself keyed on the label value.
      val byId = prop.select(col("id").as("__cid"), col("comp").as("__ccomp"))
      val next = prop.join(byId, prop("comp") === byId("__cid"), "left")
        .select(col("id"),
          coalesce(col("__ccomp"), col("comp")).as("comp"),
          (col("__chg") || col("__ccomp") < col("comp")).as("__chg"))
        .localCheckpoint()
      changed = next.filter(col("__chg")).count()
      // the superseded |V|-sized label frame is dead once `next` is
      // eagerly frozen — d20's block-retention lesson: without the
      // drop, O(log d) full label copies stay pinned for the job
      org.apache.spark.sql.graftbridge.RddBridge.unpersistCheckpoint(labels)
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
