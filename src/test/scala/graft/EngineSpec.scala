package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ci.{IncrementalCI, TableCopier}
import graft.core._
import graft.queries.Engine

/** Materializer / Snapshot / Copier / graph semantics at sf0.001. */
class EngineSpec extends SparkSpec {

  private def freshWh(tag: String) = Warehouse.scratch(spark, tag)

  private def df(rows: Seq[(Long, String, Int)]) =
    spark.createDataFrame(rows).toDF("k", "v", "wm")

  test("incremental append: empty target seeds, second batch appends only past watermark") {
    val wh = freshWh("append")
    val mat = Materializer(wh)
    val model = Model("t", Seq("src"),
      Materialization.Incremental(IncrementalStrategy.Append("wm")),
      ctx => ctx.source("src"))
    mat.run(model, _ => df(Seq((1L, "a", 1), (2L, "b", 2))))
    val out = mat.run(model,
      _ => df(Seq((1L, "a", 1), (2L, "x", 2), (3L, "c", 3), (4L, "d", 4))))
    // rows with wm <= 2 in batch2 are ignored (no dup, no update)
    assert(out.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("incremental append: all-null watermark target appends everything") {
    val wh = freshWh("appendnull")
    val mat = Materializer(wh)
    val model = Model("t", Seq("src"),
      Materialization.Incremental(IncrementalStrategy.Append("wm")),
      ctx => ctx.source("src"))
    val nullWm = spark.createDataFrame(Seq((1L, "a")))
      .toDF("k", "v").withColumn("wm", lit(null).cast(IntegerType))
    mat.run(model, _ => nullWm)
    val out = mat.run(model, _ => df(Seq((2L, "b", 2))))
    assert(out.count() == 2)
  }

  test("incremental merge: incoming wins per key, watermark breaks in-batch ties") {
    val wh = freshWh("merge")
    val mat = Materializer(wh)
    val model = Model("t", Seq("src"),
      Materialization.Incremental(
        IncrementalStrategy.Merge(Seq("k"), Some("wm"))),
      ctx => ctx.source("src"))
    mat.run(model, _ => df(Seq((1L, "old1", 1), (2L, "old2", 1))))
    // key 1 updated twice in one batch: wm=3 must win; key 3 is new
    val out = mat.run(model,
      _ => df(Seq((1L, "mid", 2), (1L, "new", 3), (3L, "three", 1))))
    assert(out.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq(1L -> "new", 2L -> "old2", 3L -> "three"))
  }

  test("schema evolution: append_new_columns back-fills NULL, Fail raises") {
    val wh = freshWh("evolve")
    val mat = Materializer(wh)
    val model = Model("t", Seq("src"),
      Materialization.Incremental(IncrementalStrategy.Append("wm")),
      ctx => ctx.source("src"),
      onSchemaChange = OnSchemaChange.AppendNewColumns)
    mat.run(model, _ => df(Seq((1L, "a", 1))))
    val widened = df(Seq((2L, "b", 2))).withColumn("extra", lit("x"))
    val out = mat.run(model, _ => widened).orderBy("k").collect()
    assert(out.map(_.get(3)).toSeq == Seq(null, "x"))

    val failing = model.copy(name = "t2", onSchemaChange = OnSchemaChange.Fail)
    mat.run(failing, _ => df(Seq((1L, "a", 1))))
    intercept[IllegalArgumentException] {
      mat.run(failing, _ => widened)
    }
  }

  test("full refresh drops the incremental target and rebuilds from the batch") {
    val wh = freshWh("refresh")
    val mat = Materializer(wh)
    val model = Model("t", Seq("src"),
      Materialization.Incremental(IncrementalStrategy.Append("wm")),
      ctx => ctx.source("src"))
    mat.run(model, _ => df(Seq((1L, "a", 1))))
    mat.run(model, _ => df(Seq((2L, "b", 2))))
    assert(wh.read("analytics", "t").count() == 2)
    val out = mat.run(model, _ => df(Seq((9L, "z", 9))), fullRefresh = true)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("snapshot SCD2: changed key closes old version, unchanged stays current") {
    val wh = freshWh("snap")
    val state1 = spark.createDataFrame(Seq((1L, "v1", 10), (2L, "w1", 10)))
      .toDF("k", "v", "updated")
    val state2 = spark.createDataFrame(Seq((1L, "v2", 20), (2L, "w1", 10), (3L, "n1", 20)))
      .toDF("k", "v", "updated")
    Snapshot.capture(wh, "s", "snap", state1, Seq("k"), "updated")
    Snapshot.capture(wh, "s", "snap", state2, Seq("k"), "updated")
    val rows = wh.read("s", "snap")
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getAs[Any]("valid_to") != null, r.getBoolean(r.fieldIndex("is_current"))))
    assert(rows.toSeq == Seq(
      (1L, "v1", true, false),   // closed out at updated=20
      (1L, "v2", false, true),   // new current version
      (2L, "w1", false, true),   // unchanged
      (3L, "n1", false, true)))  // new key
  }

  test("snapshot check strategy: value change opens a version, same value stays current") {
    val wh = freshWh("snapcheck")
    val s1 = spark.createDataFrame(Seq((1L, "a"), (2L, "b"))).toDF("k", "v")
    val s2 = spark.createDataFrame(Seq((1L, "a"), (2L, "c"), (3L, "d"))).toDF("k", "v")
    Snapshot.captureCheck(wh, "s", "t", s1, Seq("k"), Seq("v"), "2024-01-01 00:00:00")
    Snapshot.captureCheck(wh, "s", "t", s2, Seq("k"), Seq("v"), "2024-02-01 00:00:00")
    val rows = wh.read("s", "t").orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Any]("valid_to") != null, r.getBoolean(r.fieldIndex("is_current"))))
    assert(rows.toSeq == Seq(
      (1L, "a", false, true),   // value unchanged: still current
      (2L, "b", true, false),   // closed at capture 2
      (2L, "c", false, true),
      (3L, "d", false, true)))  // new key
  }

  test("copier: suffix mapping, parallel copy, dry-run and missing source statuses") {
    val wh = freshWh("copier")
    wh.write(df(Seq((1L, "a", 1), (2L, "b", 2))), "prod", "t1")
    wh.write(df(Seq((3L, "c", 3))), "prod", "t2")
    val copier = TableCopier(wh, parallelism = 3)
    assert(copier.targetSchema("prod", "ci_42") == "prod_ci_42")

    val dry = copier.copyAll("prod", Seq("t1", "t2", "ghost"), "ci", dryRun = true)
    assert(dry.map(r => (r.table, r.status, r.rows)) ==
      Seq(("t1", "would_copy", 2L), ("t2", "would_copy", 1L), ("ghost", "missing_source", 0L)))
    assert(wh.tables("prod_ci").isEmpty)

    val real = copier.copyAll("prod", Seq("t1", "t2"), "ci")
    assert(real.forall(_.status == "copied"))
    assert(wh.tables("prod_ci") == Seq("t1", "t2"))
    assert(wh.read("prod_ci", "t1").count() == 2)
  }

  test("state:modified+ closure and clone-target filter") {
    // graph built inside the m06 query; assert its final selection
    val out = Engine.m06.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      .toMap
    assert(out("stg_b") == ((true, true, false)))   // modified view: not clonable
    assert(out("int_ab") == ((false, true, true)))  // downstream incremental
    assert(out("snap_b") == ((false, true, true)))  // downstream snapshot
    assert(out("mart_all") == ((false, true, true)))
    assert(out("stg_a") == ((false, false, false)))
    assert(out("int_c") == ((false, false, false)))
  }

  test("manifest round-trips through JSON") {
    val g = ModelGraph(Seq(
      Model("a", Nil, Materialization.View, _ => spark.emptyDataFrame, body = "x"),
      Model("b", Seq("a"), Materialization.Table, _ => spark.emptyDataFrame, body = "y")))
    val st = ManifestState.of(g)
    assert(ManifestState.fromJson(st.toJson) == st)
    assert(st.diff(g).isEmpty)
  }

  test("DAG runner materializes in topological order with lazy views") {
    val wh = freshWh("dag")
    val sources: String => org.apache.spark.sql.DataFrame =
      _ => df(Seq((1L, "a", 1), (2L, "b", 2), (3L, "c", 3)))
    val graph = ModelGraph(Seq(
      Model("stg", Seq("raw"), Materialization.View,
        ctx => ctx.source("raw").filter(col("wm") >= 2)),
      Model("mart", Seq("stg"), Materialization.Table,
        ctx => ctx.ref("stg").agg(count(lit(1)).as("n"), max(col("wm")).as("mx")))))
    val outs = Runner(Materializer(wh), sources).runAll(graph)
    val r = outs("mart").collect().head
    assert((r.getLong(0), r.getInt(1)) == ((2L, 3)))
    assert(wh.exists("analytics", "mart") && !wh.exists("analytics", "stg"))
  }

  for (q <- Engine.all) {
    test(s"${q.name} returns rows at sf0.001") {
      assert(q.run(spark, sfDir).count() > 0)
    }
  }
}
