package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** One timed noop-sink run per query; a failure is RECORDED as the
    * query's error (first line of the message) instead of silently
    * contributing its time-to-crash to the totals.
    */
  def runAll(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame])
      : Seq[(String, Double, Option[String])] =
    queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every column of the full plan (count()
      // would let Catalyst prune projections + the final sort).
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName)
            .takeWhile(_ != '\n').take(200))
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/codegen/filesystem warmup outside the timings (the
    // alphabetically-first query otherwise pays ~5s of it)
    spark.read.parquet(s"$sfDir/nation.parquet")
      .write.format("noop").mode("overwrite").save()
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()
    val results = runAll(spark, sfDir, SparkEntry.queries)
    val qs = results.map { case (k, secs, _) => s"${jstr(k)}:$secs" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val nErr = results.count(_._3.isDefined)
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_queries":${results.size},"n_ok":${results.size - nErr},"n_err":$nErr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
