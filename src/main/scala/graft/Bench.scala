package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Bench {

  /** One timed noop-sink pass over every query; a failure is RECORDED
    * as the query's error (first line of the message) instead of
    * silently contributing its time-to-crash to the totals.
    */
  def runAll(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame])
      : Seq[(String, Double, Option[String])] =
    queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (secs, err) = timed(spark, sfDir, fn)
      (name, secs, err)
    }

  private def timed(spark: SparkSession, dir: String,
      fn: (SparkSession, String) => DataFrame): (Double, Option[String]) = {
    val t0 = System.nanoTime()
    // noop sink: materializes every column of the full plan (count()
    // would let Catalyst prune projections + the final sort).
    val err =
      try { fn(spark, dir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable =>
        Some(Option(e.getMessage).getOrElse(e.getClass.getName)
          .takeWhile(_ != '\n').take(200))
      }
    ((System.nanoTime() - t0) / 1e9, err)
  }

  /** Median of an odd or even sample (midpoint average). */
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  // ----------------------------------------------------------------
  // scale10x: empirical super-linearity probe. /root/testdata has no
  // sf1, so a 10x corpus is synthesized from sf0.1 as 10 key-shifted
  // copies; each heavy data-proportional operator then runs once on it
  // and reports secs(10x)/median-secs(1x). A roughly-linear operator
  // lands well under ~15 (10x work + shuffle/log-factor overhead).
  //
  // q21 is deliberately NOT probed: its frontier is capped at
  // p_partkey <= 255 by construction, so its work is independent of
  // input scale and the ratio would be a meaningless ~1.

  /** The heavy operators whose work grows with the corpus. */
  val scaleOps: Seq[String] = Seq(
    "d02_dedup_minhash", "d03_dedup_simhash", "d04_ngram_jaccard",
    "d05_embedding_neardup", "m02_incremental_merge", "q26_cohort_retention")

  /** Stage a `copies`x corpus of the tables the probed operators read.
    * Key columns are shifted per copy so cardinalities scale; content
    * columns are perturbed with a per-copy BIJECTION so the planted
    * duplicate/near-dup structure is preserved WITHIN each copy but
    * destroyed ACROSS copies — a naive 10x concat of identical text
    * would make every doc a 10-way near-dup group and quadratically
    * inflate the true-pair count, measuring output explosion instead
    * of operator scaling.
    *  - documents.text: rotate the 12 most frequent letters by copy
    *    index (bijective per copy => within-copy shingle Jaccard is
    *    exactly preserved; cross-copy shingle overlap collapses);
    *  - embeddings.embedding: circular-shift the vector by the copy
    *    index (exact within-copy cosines; cross-copy ~orthogonal);
    *  - orders keys: shift o_orderkey by a multiple of 10 (keeps
    *    m02's key%10 update-batch shape) and o_custkey so q26's
    *    group-by cardinality scales with the data.
    */
  def stageScaled(spark: SparkSession, sfDir: String, outDir: String,
      copies: Int = 10): Unit = {
    val alpha = "etaoinshrdlu"
    def union(mk: Int => DataFrame): DataFrame =
      (0 until copies).map(mk).reduce(_ unionByName _)

    union { i =>
      val rot = alpha.drop(i % alpha.length) + alpha.take(i % alpha.length)
      spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text", translate(col("text"), alpha, rot))
    }.write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    union { i =>
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
      if (i == 0) e
      else e.withColumn("embedding",
        concat(slice(col("embedding"), lit(i + 1), size(col("embedding")) - i),
          slice(col("embedding"), lit(1), lit(i))))
    }.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    union { i =>
      spark.read.parquet(s"$sfDir/orders.parquet")
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * 1000000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L))
    }.write.mode("overwrite").parquet(s"$outDir/orders.parquet")
  }

  // ----------------------------------------------------------------

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
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val doScale = sys.env.getOrElse("SPARK_GRAFT_SCALE10X", "1") != "0"
    // hard wall for the optional scale10x tail so a contended sandbox
    // can never push the bench past the driver's patience
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "2400").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val benchStart = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - benchStart) / 1e9
    // absorb JVM/codegen/filesystem warmup outside the timings (the
    // alphabetically-first query otherwise pays ~5s of it)
    spark.read.parquet(s"$sfDir/nation.parquet")
      .write.format("noop").mode("overwrite").save()
    spark.range(1000000).selectExpr("sum(id * 2)")
      .write.format("noop").mode("overwrite").save()

    // INTERLEAVED passes: the same query's samples land ~a full suite
    // apart, so a multi-second host-contention window (observed up to
    // 12x on this sandbox) pollutes at most one of the three samples
    // and the median discards it. Back-to-back repeats would put all
    // samples inside the same window.
    val passes = (1 to iters).map(_ => runAll(spark, sfDir, SparkEntry.queries))
    val names = passes.head.map(_._1)
    val byName = names.map { n =>
      val samples = passes.map(_.find(_._1 == n).get)
      n -> (samples.map(_._2), samples.flatMap(_._3).headOption)
    }.toMap
    val medians = names.map(n => n -> median(byName(n)._1)).toMap
    val mins = names.map(n => n -> byName(n)._1.min).toMap
    val errs = names.flatMap(n => byName(n)._2.map(n -> _))

    val scaleResults: Seq[(String, Double, Double, Option[String])] =
      if (!doScale) Nil
      else {
        val scaleDir = s"/tmp/graft_scale10x_${ProcessHandle.current().pid()}"
        stageScaled(spark, sfDir, scaleDir)
        val rs = scaleOps.map { n =>
          if (elapsed > budgetSec) (n, -1.0, medians(n), Some("skipped_budget"))
          else {
            val (secs, err) = timed(spark, scaleDir, SparkEntry.queries(n))
            (n, secs, medians(n), err)
          }
        } ++ {
          // the d05 scale DIAL, demonstrated on the same 10x corpus:
          // bits raised 6 -> 9 (log2 of the copy factor, +1) restores
          // per-bucket occupancy to ~the 1x corpus, collapsing the
          // quadratic candidate volume fixed-width LSH accrues.
          // Reported against the bits=6 run on the SAME corpus.
          if (elapsed > budgetSec) Nil
          else {
            val (secs, err) = timed(spark, scaleDir, (s, d) =>
              graft.operators.Ann.nearDupLsh(
                s.read.parquet(s"$d/embeddings.parquet"),
                threshold = 0.4, tables = 8, bits = 9, dim = 64, seed = 7L))
            Seq(("d05_embedding_neardup_bits9", secs, -1.0, err))
          }
        }
        // best-effort scratch cleanup; the data lives under /tmp anyway
        try {
          val p = new org.apache.hadoop.fs.Path(scaleDir)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
          ()
        } catch { case _: Throwable => () }
        rs
      }

    val qs = names.map(n => s"${jstr(n)}:${medians(n)}").mkString("{", ",", "}")
    val qmins = names.map(n => s"${jstr(n)}:${mins(n)}").mkString("{", ",", "}")
    val errJson = errs.map { case (k, e) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val scaleJson = scaleResults.map { case (n, s10, s1, err) =>
      val ratio = if (s1 > 0 && s10 >= 0) s10 / s1 else -1.0
      s"${jstr(n)}:{" +
        s""""sec10x":$s10,"sec1x_median":$s1,"ratio":$ratio""" +
        err.fold("")(e => s""","err":${jstr(e)}""") + "}"
    }.mkString("{", ",", "}")
    val nErr = errs.size
    val total = names.map(medians).sum
    println(s"""{"metric":"total_median","value":$total,"unit":"sec","iters":$iters,"queries":$qs,"queries_min":$qmins,"errors":$errJson,"scale10x":$scaleJson,"n_queries":${names.size},"n_ok":${names.size - nErr},"n_err":$nErr,"bench_wall_sec":$elapsed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
