package graft.operators

import org.apache.spark.sql.DataFrame

/** `WITH RECURSIVE` re-expressed Spark-first as an iterative
  * DataFrame fixpoint loop.
  *
  * The reference traverses a prerequisite graph with a recursive CTE
  * capped at depth 10
  * (reference: models/intermediate/int_course_prerequisite_chains.sql:3-37).
  * Spark has no recursive CTE; the idiomatic equivalent is a driver
  * loop that unions per-level frontiers. Each level is
  * `localCheckpoint`ed so lineage (and the physical plan) stays flat —
  * without that, iteration N replays all N-1 prior joins.
  *
  * Scale: each `step` is a distributed join (broadcast the frontier
  * when small, shuffle otherwise — Catalyst + AQE decide from runtime
  * stats). The only driver-side data is one boolean per level
  * (`isEmpty` termination probe); paths/rows never hit the driver.
  */
object Recursive {

  /** Expand `base` by repeatedly applying `step` to the previous
    * frontier until it is empty or `maxIter` levels were produced.
    * Returns base ∪ step(base) ∪ step(step(base)) ∪ …
    */
  def iterate(base: DataFrame, maxIter: Int)(step: DataFrame => DataFrame): DataFrame = {
    var acc = base.localCheckpoint(eager = true)
    var frontier = acc
    var level = 0
    var done = false
    while (level < maxIter && !done) {
      val next = step(frontier).localCheckpoint(eager = true)
      if (next.isEmpty) done = true
      else {
        acc = acc.union(next)
        frontier = next
      }
      level += 1
    }
    acc
  }
}
