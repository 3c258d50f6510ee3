package graft.core

import org.apache.spark.sql.DataFrame

/** dbt ≥1.8 `--empty`: a SCHEMA-VALIDATING dry run — the whole DAG
  * executes with every source limited to zero rows, so each model
  * materializes an empty relation whose SCHEMA is exactly what a real
  * run would produce (schemas propagate through transforms
  * independent of row count). What that buys in CI, for the cost of
  * metadata-only scans:
  *
  *  - every model's SQL/transform actually runs (syntax errors,
  *    unresolved refs, bad casts surface immediately);
  *  - contract enforcement (m21's [[Contract]]) checks the REAL
  *    output schema — a breaking column change is caught before a
  *    single data-bearing task is scheduled;
  *  - incremental models exercise their first-build path (a LIMIT-0
  *    watermark scan yields a NULL max, the documented
  *    full-first-load branch).
  *
  * Scale note: `limit(0)` on a parquet relation collapses to an
  * empty-scan plan — no file IO beyond footers — so the validating
  * run costs the same on a 100 TB warehouse as on the laptop. The
  * run writes into whatever warehouse the Materializer targets;
  * callers point it at a scratch/CI schema exactly as dbt's `--empty`
  * assumes a dev target.
  */
object EmptyRun {

  /** One model's validation outcome. `contractStatus`: "no_contract",
    * "ok", or a deterministic comma-joined violation list
    * (`missing:col`, `type_mismatch:col`, `unexpected:col`).
    */
  final case class Validation(model: String, nRows: Long, nCols: Int,
      contractStatus: String)

  def validate(mat: Materializer, graph: ModelGraph,
      sources: String => DataFrame,
      contracts: Map[String, Contract] = Map.empty): Seq[Validation] = {
    val outs = Runner(mat, n => sources(n).limit(0)).runAll(graph)
    graph.topoOrder.map { n =>
      val df = outs(n)
      val status = contracts.get(n) match {
        case None => "no_contract"
        case Some(ct) =>
          val v = ct.violations(df.schema)
          if (v.isEmpty) "ok"
          else v.map(x => s"${x._4}:${x._1}").sorted.mkString(",")
      }
      Validation(n, df.count(), df.schema.size, status)
    }
  }
}
