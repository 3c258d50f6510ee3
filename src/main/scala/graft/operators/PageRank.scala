package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed PageRank over an edge list, in SCALED-INTEGER
  * arithmetic so two engines reproduce every iteration bit-for-bit.
  *
  * The curation use: link-graph centrality is a standing web-corpus
  * quality signal (harmonic/PageRank centrality is how Common-Crawl
  * pipelines rank hosts before fetching or filtering), so the engine
  * needs an iterative-graph workload class, not just joins and aggs.
  *
  * Determinism: ranks are BIGINTs in units of `scale`⁻¹ (1e-12 of a
  * unit of mass). Each iteration distributes `rank div outdeg` per
  * edge (integer division — order-free), sums per destination (exact
  * integer sum), and damps with integer ops:
  * `rank' = (15·scale) div 100 + (85·Σcontrib) div 100`. No float
  * enters the loop, so the fixed-iteration result is exact in any
  * engine with 64-bit integers; truncation dust (≤1 unit per edge
  * per iteration) is part of the defined semantics.
  *
  * Dangling-node policy: vertices are the hosts that LINK OUT
  * (distinct src); edges into anything else are dropped. Every
  * vertex then has outdeg ≥ 1 — no dangling mass, no global
  * redistribution term, and the iteration is a pure
  * join-aggregate (the "strongly preferential" teleport variant,
  * restricted to the out-linking subgraph).
  *
  * Scale shape (the 100 TB plan): `edges ⋈ deg` is computed ONCE and
  * frozen (localCheckpoint) — each of the k iterations then costs
  * one equi-join of the |V|-sized rank table against the frozen edge
  * list (shuffle on src, or a broadcast when |V| fits) plus one
  * map-side-combinable sum on dst. The corpus-sized edge scan never
  * re-reads its source; rank lineage is truncated per iteration
  * (d06's pointer-jumping discipline) so the plan stays k-shallow
  * instead of k-deep.
  */
object PageRank {

  /** @param edges distinct (src: BIGINT, dst: BIGINT) pairs
    * @return (host, pr_scaled) — scaled-integer rank per out-linking host
    */
  def ranks(edges: DataFrame, iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "pagerank needs at least one iteration")
    val v = edges.select(col("src").as("host")).distinct()
      .localCheckpoint(true)
    // keep only edges whose dst is itself a vertex, and pre-join the
    // out-degree — counted AFTER the dst filter, so a src whose other
    // edges were dropped distributes its full rank over the edges
    // that survive (the documented no-dangling-mass policy; counting
    // on the unfiltered list would leak the dropped edges' share)
    val kept = edges
      .join(v.select(col("host").as("dst")), "dst")
    val e = kept
      .join(kept.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .select("src", "dst", "outdeg")
      .localCheckpoint(true)
    val jump = 15L * scale / 100L
    var r = v.withColumn("rank", lit(scale))
    for (i <- 1 to iters) {
      val contrib = e.join(r, e("src") === r("host"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").cast(LongType).as("c"))
      val prev = r
      r = v.join(contrib, v("host") === contrib("dst"), "left")
        .select(col("host"),
          (lit(jump) + expr("(85 * coalesce(c, 0L)) div 100")).as("rank"))
        .localCheckpoint(true)
      // the superseded rank frame is dead once its successor is
      // eagerly frozen — at fixture scale 97 rows, but the frame is
      // |V|-sized (host-scaled), so k iterations would otherwise pin
      // k copies of the vertex table until session cleanup
      if (i > 1) org.apache.spark.sql.graftbridge.RddBridge
        .unpersistCheckpoint(prev)
    }
    r.select(col("host"), col("rank").as("pr_scaled"))
  }
}
