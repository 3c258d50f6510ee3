package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Ann

/** Dev-loop stage-timing probe (the companion to [[Explain]]): stage
  * the 10× corpus once, then time the individual stages of an
  * operator to find where the seconds actually go — bench medians
  * time the whole plan and cannot localize a bottleneck.
  *
  * `runMain graft.Probe d05` — stages to a scratch dir, prints one
  * line per stage.
  */
object Probe {

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val dir = graft.core.Scratch.dir("probe10x").toString
      time("stage 10x corpus")(Bench.stageScaled(spark, sfDir, dir))
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      args.headOption.getOrElse("d05") match {
        case "d05" =>
          val n = time("normed + checkpoint")(
            Ann.normed(emb).localCheckpoint(true))
          time("rows")(println(s"  n = ${n.count()}"))
          for (bits <- Seq(6, 11)) {
            time(s"bucket signatures bits=$bits")(
              println(s"  buckets = ${Ann.lshBuckets(n, 8, bits, 64, 7L).count()}"))
            time(s"candidate pairs bits=$bits")(
              println(s"  cands = ${Ann.lshCandidatePairs(n, 8, bits, 64, 7L).count()}"))
          }
          time("full nearDupLsh bits=6")(
            println(s"  pairs = ${Ann.nearDupLsh(emb, 0.4, 8, 6, 64, 7L).count()}"))
          time("full nearDupLshAuto")(
            println(s"  pairs = ${Ann.nearDupLshAuto(emb, 0.4).count()}"))
        case "ivf" =>
          val n = time("normed + checkpoint")(
            Ann.normed(emb).localCheckpoint(true))
          val cb = time("ivfCodebook k=16")(
            Ann.ivfCodebook(emb, 16, 2))
          time("assigned (literal codebook) count")(
            println(s"  rows = ${Ann.assigned(emb, cb).count()}"))
          time("full d10 semDedup")(
            println(s"  pairs = ${Ann.semDedup(emb, 0.4).count()}"))
          // the fixed-centroid dial refuses 10x-scale corpora by
          // design (Gate) — report the refusal instead of aborting
          // the probe before the auto comparison it exists to measure
          time("full s05 knnGraph k=3")(
            try println(s"  edges = ${Ann.knnGraph(emb, 3).count()}")
            catch { case e: graft.operators.Gate.SizeGatedException =>
              println(s"  gated by design: ${e.getMessage.takeWhile(_ != ':')}") })
          time("full s05 knnGraphAuto k=3")(
            println(s"  edges = ${Ann.knnGraphAuto(emb, 3).count()}"))
          println(s"  (n frozen: ${n.count()})")
        case "s19" =>
          // localize s19_ann_opq's 10× wall (r18 board ratio 19.6):
          // stage-by-stage replica of Ann.ivfpqOpq's plan
          import org.apache.spark.sql.functions._
          val queries = emb.filter(col("vec_id") < 20)
          time("opqAllocation (explode+groupBy+collect)")(
            println(s"  perm head = ${Ann.opqAllocation(emb).take(4)}"))
          val cb = time("ivfCodebook k=16")(Ann.ivfCodebook(emb, 16, 2))
          println(s"  centroids = ${cb.length}")
          time("full ivfpqOpq (registered s19 plan)")(
            Ann.ivfpqOpq(queries, emb, k = 5)
              .write.format("noop").mode("overwrite").save())
          time("full ivfpq (s04 plan, same dials)")(
            Ann.ivfpq(queries, emb, k = 5)
              .write.format("noop").mode("overwrite").save())
        case "mm05" =>
          // localize mm05_audio_dedup's 10× wall (r18 ratio 24.0):
          // fixture synth vs decode+fingerprint vs pigeonhole join
          import org.apache.spark.sql.functions._
          val media = graft.operators.Multimodal.wavDupMedia(spark, 1200)
          time("wavDupMedia synth (noop)")(
            media.write.format("noop").mode("overwrite").save())
          val fp = graft.operators.Multimodal.audioFingerprint(media)
            .select(col("media_id"), col("afp").as("phash"))
          time("synth + decode + fingerprint (noop)")(
            fp.write.format("noop").mode("overwrite").save())
          time("full phashPairs")(
            println(s"  pairs = ${graft.operators.Multimodal
              .phashPairs(fp, maxHamming = 2).count()}"))
        case other =>
          println(s"unknown probe '$other' (have: d05, ivf, s19, mm05)")
      }
    } finally spark.stop()
  }
}
