package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-dial audit harness (the PLANS.md candidate-volume method as
  * a runnable main): stages the same 10×/100× corpora the bench
  * probes use, then decomposes the Auto-dial operators into their
  * stages — codebook, assignment, pair generation — timing each and
  * counting the candidate volume the dials exist to bound. Run when a
  * probe ratio drifts to tell "plan got worse" apart from "corpus got
  * bigger / dial landed elsewhere":
  *
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.ProbeAudit [10x|100x|both]"
  */
object ProbeAudit {
  private def sec[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("both")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def audit(tag: String, dir: String): Unit = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val k = math.max(16L, n / 256L)
      println(f"[$tag] n=$n k=$k routed=${k > 256L}")
      // stage 1: codebook
      val (cb, tCb) = sec {
        graft.operators.Ann.kmeansDf(emb, k).localCheckpoint(true)
      }
      println(f"[$tag] kmeans: $tCb%.1f s (${cb.count()} centroids)")
      // stage 2: occupancy — Σn² is the within-cluster pair bound
      val (stats, tOcc) = sec {
        graft.operators.Ann.clusterSizes(emb, k)
          .agg(count(lit(1)).as("used"), max("n").as("maxn"),
            sum(col("n") * col("n")).as("sumsq")).head
      }
      println(f"[$tag] occupancy: used=${stats.getLong(0)}/$k " +
        f"max=${stats.getLong(1)} sumsq=${stats.getLong(2)} " +
        f"(balanced would be ~${n * 256}) assign+hist: $tOcc%.1f s")
      // stage 3: the full operators end-to-end
      val (pairs, tSem) = sec {
        graft.operators.Ann.semDedupAuto(emb, threshold = 0.4).count()
      }
      println(f"[$tag] semDedupAuto: $tSem%.1f s, $pairs pairs")
      val (edges, tKnn) = sec {
        graft.operators.Ann.knnGraphAuto(emb, k = 3).count()
      }
      println(f"[$tag] knnGraphAuto: $tKnn%.1f s, $edges edges")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (which == "10x" || which == "both") {
      val d = graft.core.Scratch.dir("audit10x").toString
      val (_, tStage) = sec(Bench.stageScaled(spark, sfDir, d))
      println(f"[10x] staged in $tStage%.1f s")
      audit("10x", d)
      // d13: isolated 1× vs 10× (the bench measured ratio 13.5 at r10)
      for ((tag, dd) <- Seq(("1x", sfDir), ("10x", d))) {
        val (_, t) = sec(noop(
          SparkEntry.queries("d13_cdc_chunk_dedup")(spark, dd)))
        println(f"[d13 $tag] $t%.1f s")
      }
    }
    if (which == "m12") {
      // demo-DAG thread sweep: 43 models, threads=1 vs the registered
      // threads=4 — how much of the wall is critical path vs fan-out
      val c = graft.sources.Catalog(spark, sfDir)
      for (t <- Seq(1, 4, 8); rep <- 1 to 2) {
        val wh = graft.core.Warehouse.scratch(spark, s"m12probe_t${t}_$rep")
        val (_, secs) = sec {
          graft.core.Runner(graft.core.Materializer(wh), c.table, threads = t)
            .runAll(graft.cli.DemoProject.graph(19))
        }
        println(f"[m12 threads=$t rep=$rep] $secs%.1f s")
      }
    }
    if (which == "100x" || which == "both") {
      val d = graft.core.Scratch.dir("audit100x").toString
      val (_, tStage) = sec(Bench.stageEmbeddings100x(spark, sfDir, d))
      println(f"[100x] staged in $tStage%.1f s")
      audit("100x", d)
    }
    spark.stop()
  }
}
