package graft

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Catalog
import graft.streaming.EventStream

/** The events-time encoding CONTRACT, pinned so a driver-side storage
  * change can never silently skew time again (round 9's break: the
  * testdata regenerated from INT64 TIMESTAMP(NANOS) to timestamp[us]
  * NTZ and every site that hard-coded the nanos encoding read time
  * 1000x compressed). `Catalog.normalizeEventTs` is the ONE
  * chokepoint: whatever encoding the files carry — nanos-as-long,
  * timestamp[us] (NTZ), or LTZ — every consumer sees canonical
  * TIMESTAMP_NTZ with identical wall-clock values.
  */
class EncodingSpec extends SparkSpec {

  private def writeEvents(dir: java.nio.file.Path, df: DataFrame): String = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  /** Synthetic events with sub-second precision and a >30-min session
    * gap, as NTZ wall-clock rows.
    */
  private def baseEvents: DataFrame = {
    val rows = Seq(
      (1L, LocalDateTime.parse("2024-03-01T10:00:00.123456"), 7L, "view", 1.5, "{}"),
      (2L, LocalDateTime.parse("2024-03-01T10:10:00"), 7L, "click", 2.0, "{}"),
      (3L, LocalDateTime.parse("2024-03-01T11:00:00"), 7L, "purchase", 9.0, "{}"),
      (4L, LocalDateTime.parse("2024-03-01T11:20:00"), 7L, "view", 0.5, "{}"),
      (5L, LocalDateTime.parse("2024-03-02T09:00:00"), 8L, "view", 3.0, "{}"))
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromTuple)), schema)
  }

  private def encodings: Seq[(String, String)] = {
    val ntz = writeEvents(core.Scratch.dir("enc_ntz"), baseEvents)
    val ltz = writeEvents(core.Scratch.dir("enc_ltz"),
      baseEvents.withColumn("ts", col("ts").cast(TimestampType)))
    // raw INT64 epoch-nanos column — what the nanos-era files look
    // like to Spark under spark.sql.legacy.parquet.nanosAsLong
    val nanos = writeEvents(core.Scratch.dir("enc_nanos"),
      baseEvents.withColumn("ts",
        (Catalog.epochMicros(col("ts")) * lit(1000L)).cast(LongType)))
    Seq("ntz" -> ntz, "ltz" -> ltz, "nanos" -> nanos)
  }

  test("every storage encoding normalizes to canonical TIMESTAMP_NTZ") {
    for ((label, dir) <- encodings) {
      val got = Catalog(spark, dir).events.schema("ts").dataType
      assert(got == TimestampNTZType, s"encoding $label yielded $got")
    }
    // and the real driver-generated testdata resolves through the
    // same chokepoint to the same canonical type
    assert(Catalog(spark, sfDir).events.schema("ts").dataType == TimestampNTZType)
  }

  test("testdata schema contract: every table reads with the expected Spark types") {
    // TRIPWIRE for driver-side testdata regeneration (round 9 changed
    // the events ts encoding under the repo and five call sites broke
    // at a distance): if a regen moves ANY column type, this points at
    // exactly what moved instead of a hash mismatch three layers up.
    // Types are as read THROUGH Catalog — i.e. post-normalization for
    // events — because that is the surface every query consumes.
    val expected = Map(
      "region" -> "r_regionkey:int, r_name:string",
      "nation" -> "n_nationkey:int, n_name:string, n_regionkey:int",
      "customer" -> ("c_custkey:bigint, c_name:string, c_nationkey:int, " +
        "c_acctbal:double, c_mktsegment:string"),
      "supplier" -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
      "part" -> ("p_partkey:bigint, p_name:string, p_brand:string, " +
        "p_type:string, p_size:int, p_retailprice:double"),
      "orders" -> ("o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, " +
        "o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string"),
      "lineitem" -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, " +
        "l_linenumber:int, l_quantity:double, l_extendedprice:double, " +
        "l_discount:double, l_tax:double, l_returnflag:string, " +
        "l_linestatus:string, l_shipdate:timestamp_ntz"),
      "events" -> ("event_id:bigint, ts:timestamp_ntz, user_id:bigint, " +
        "event_type:string, value:double, props:string"),
      "documents" -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
      "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")
    val c = Catalog(spark, sfDir)
    val frames = Map("region" -> c.region, "nation" -> c.nation,
      "customer" -> c.customer, "supplier" -> c.supplier, "part" -> c.part,
      "orders" -> c.orders, "lineitem" -> c.lineitem, "events" -> c.events,
      "documents" -> c.documents, "embeddings" -> c.embeddings)
    for ((name, df) <- frames) {
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      assert(got == expected(name),
        s"table $name schema moved:\n  got      $got\n  expected ${expected(name)}")
    }
  }

  test("SparkEntry.entry flagship returns rows (the driver's smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("sessionize / tumbling / range-join results are encoding-invariant") {
    def fingerprint(dir: String): (Seq[String], Seq[String], Seq[String]) = {
      val ev = Catalog(spark, dir).events
      def dump(df: DataFrame): Seq[String] =
        df.collect().map(_.mkString("|")).sorted.toSeq
      val sess = dump(EventStream.sessionize(ev)
        .select("user_id", "session_seq", "session_start", "session_end",
          "n_events", "total_value"))
      val tumb = dump(EventStream.tumbling(ev))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val others = ev.filter(col("event_type") =!= "purchase")
        .select("event_id", "ts", "user_id", "event_type")
      val range = dump(operators.RangeJoin
        .intervalJoin(others, purchases, "user_id", "ts", maxGapSec = 1800L)
        .select(col("event_id"), col("range.event_id").as("purchase_id"),
          col("range_ts")))
      (sess, tumb, range)
    }
    val all = encodings.map { case (label, dir) => label -> fingerprint(dir) }
    val (refLabel, ref) = all.head
    // the micros-precision row must survive: 10:00:00.123456 opens the
    // first session, so its start carries the fractional second
    assert(ref._1.exists(_.contains("10:00:00.123456")),
      s"expected micros precision in sessions: ${ref._1}")
    for ((label, got) <- all.tail) {
      assert(got == ref, s"encoding $label diverged from $refLabel:\n$got\nvs\n$ref")
    }
    // three sessions for user 7+8 (gap splits 10:xx from 11:xx? gap is
    // exactly 50 min between events 2 and 3 -> new session), one for user 8
    assert(ref._1.size == 3, s"sessions: ${ref._1}")
    assert(ref._3.size == 1, s"range pairs: ${ref._3}")
  }
}
