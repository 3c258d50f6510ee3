package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off plan audits for PLANS.md — prints the formatted physical
  * plan of whichever entries the session is inspecting (query names
  * as args; default set = the current session's new entries).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q42_interval_concurrency", "q43_approx_topk",
        "t17_seasonal_anomaly", "x28_pmi_collocations",
        "s11_ann_recall_eval", "s12_mmr_diversify", "p04_funnel_report")
    val reg = graft.SparkEntry.queries
    names.foreach { n =>
      println(s"=== $n ===")
      println(reg(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
