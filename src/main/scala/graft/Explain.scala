package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the queries named in args —
  * the `.explain` audit loop behind PLANS.md.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_spark_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // --execute: run the query first and print the FINAL adaptive plan
    // (ReusedExchange/ReusedSubquery only appear post-execution, so the
    // initial formatted plan under-reports stage reuse)
    val execute = args.contains("--execute")
    val auditOnly = args.contains("--audit") // one line per query
    val wanted0 = args.toSeq.filterNot(_.startsWith("--"))
    val wanted = if (wanted0.isEmpty) Seq("q23_topk_per_group") else wanted0
    for (name <- wanted; fn <- SparkEntry.queries.get(name)) {
      if (!auditOnly) println(s"==== $name ====")
      val df = fn(spark, sfDir)
      if (execute || auditOnly) {
        df.count()
        val p = df.queryExecution.executedPlan.toString
        if (!auditOnly) println(p)
        // the multi-scan audit in one line: every FileScan / Generate
        // in the FINAL plan is a real pass over (a stream derived
        // from) the input — >1 over the same table means a shared
        // subtree is being recomputed per consumer
        println(s"[audit] $name: fileScans=" +
          "FileScan".r.findAllIn(p).size +
          " generates=" + "Generate".r.findAllIn(p).size +
          " reusedExchanges=" + "ReusedExchange".r.findAllIn(p).size +
          " existingRdd=" + "ExistingRDD".r.findAllIn(p).size)
      } else
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
