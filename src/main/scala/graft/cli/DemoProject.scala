package graft.cli

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core._

/** A reference-scale model DAG over the TPC-H-ish catalog — the same
  * 3-layer staging → intermediate → marts shape as the reference's
  * 43-model dbt project (reference: DbtEducationalDataProject/models/
  * staging|intermediate|marts, 43 models), sized by `nSlices`:
  * `2·nSlices + 5` models (nSlices = 19 → 43).
  *
  * Layers:
  *  - nSlices staging VIEWS, each a hash slice of orders (stand-ins
  *    for the reference's many per-source staging models; views stay
  *    lazy so Catalyst composes them into downstream plans);
  *  - one staging view over customer;
  *  - nSlices intermediate TABLES, one aggregation per slice;
  *  - an all-slices rollup table + two mart tables + one INCREMENTAL
  *    mart (watermark append), so every materialization class the
  *    engine supports appears in the DAG.
  *
  * `changed` marks model bodies as edited — the hook the CLI's `ci`
  * command uses to simulate a PR diff against the stored manifest.
  */
object DemoProject {

  def graph(nSlices: Int = 19, changed: Set[String] = Set.empty,
      schema: String = "analytics",
      vars: Map[String, String] = Map.empty): ModelGraph = {
    require(nSlices >= 1)
    def body(name: String, base: String): String =
      if (changed(name)) base + " /* v2 */" else base

    val stgOrders = (0 until nSlices).map { i =>
      Model(s"stg_orders_$i", Seq("orders"), Materialization.View,
        ctx => ctx.source("orders")
          .filter(pmod(col("o_orderkey"), lit(nSlices)) === lit(i))
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        body = body(s"stg_orders_$i", s"select orders slice $i of $nSlices"))
    }
    // SQL-TEXT models (core/SqlModel.scala) sit in the same DAG as
    // Scala models — the mixed-authoring shape of a real dbt port,
    // where most models arrive as .sql files. `changed` edits the
    // SQL itself (a trailing comment), so CI's checksum diff sees a
    // SQL model edit exactly as dbt would.
    val stgCustomer = SqlModel("stg_customer",
      body("stg_customer",
        """SELECT c_custkey, c_nationkey, c_mktsegment
          |FROM {{ source('raw', 'customer') }}""".stripMargin),
      Materialization.View)

    val ints = (0 until nSlices).map { i =>
      Model(s"int_spend_$i", Seq(s"stg_orders_$i"), Materialization.Table,
        ctx => ctx.ref(s"stg_orders_$i")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(14, 2))).as("spend"),
            max(col("o_orderdate")).as("last_order")),
        body = body(s"int_spend_$i", s"aggregate spend for slice $i"))
    }
    val intAll = Model("int_spend_all",
      (0 until nSlices).map(i => s"int_spend_$i"),
      Materialization.Table,
      ctx => (0 until nSlices).map(i => ctx.ref(s"int_spend_$i"))
        .reduce(_ unionByName _)
        .groupBy("o_custkey")
        .agg(sum("n_orders").cast("long").as("n_orders"),
          sum("spend").as("spend"), max("last_order").as("last_order")),
      body = body("int_spend_all", "union + rollup of all slices"))

    val martSegment = Model("mart_segment_spend",
      Seq("int_spend_all", "stg_customer"), Materialization.Table,
      ctx => ctx.ref("stg_customer")
        .join(ctx.ref("int_spend_all"), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_buyers"),
          sum("n_orders").cast("long").as("n_orders"),
          sum("spend").as("spend")),
      body = body("mart_segment_spend", "spend by market segment"))
    // `{{ var('min_spend', 0) }}` binds from the CLI's `--vars` (dbt
    // --vars): the default keeps semantics unchanged, a rebound value
    // changes the RENDERED body — so `ci --vars min_spend=N` sees the
    // model as modified exactly like dbt's state:modified.vars
    val martNation = SqlModel("mart_nation_spend",
      body("mart_nation_spend",
        """SELECT c_nationkey, COUNT(*) AS n_buyers, SUM(spend) AS spend
          |FROM {{ ref('stg_customer') }}
          |JOIN {{ ref('int_spend_all') }} ON c_custkey = o_custkey
          |GROUP BY c_nationkey
          |HAVING SUM(spend) >= {{ var('min_spend', 0) }}""".stripMargin),
      Materialization.Table, vars = vars)
    val martRecent = Model("mart_recent_buyers", Seq("int_spend_all"),
      Materialization.Incremental(IncrementalStrategy.Append("last_order")),
      ctx => ctx.ref("int_spend_all"),
      body = body("mart_recent_buyers", "incremental buyers by last order date"))

    ModelGraph(((stgOrders :+ stgCustomer) ++ ints ++
      Seq(intAll, martSegment, martNation, martRecent))
      .map(_.copy(schema = schema)))
  }

  /** dbt `unit_tests:` for the demo project — fixture-driven cases
    * over the mart logic (the models whose transforms embed business
    * rules worth pinning). Mocks cover every input each model under
    * test references, so a `unit` run touches no real sources.
    */
  def unitCases(spark: org.apache.spark.sql.SparkSession): Seq[graft.core.UnitTester.UnitCase] = {
    import spark.implicits._
    val customers = Seq((1L, 7L, "BUILDING"), (2L, 7L, "AUTOMOBILE"),
      (3L, 8L, "BUILDING"), (4L, 9L, "MACHINERY"))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val spend = Seq((1L, 2L, BigDecimal("100.50")), (2L, 1L, BigDecimal("40.00")),
      (3L, 3L, BigDecimal("59.50")))
      .toDF("o_custkey", "n_orders", "spend")
    Seq(
      graft.core.UnitTester.UnitCase("segment_rollup", "mart_segment_spend",
        Map("stg_customer" -> customers, "int_spend_all" -> spend),
        // customer 4 never bought: inner join must drop it, not emit
        // a zero row — the rule this case exists to pin
        Seq(("AUTOMOBILE", 1L, 1L, BigDecimal("40.00")),
          ("BUILDING", 2L, 5L, BigDecimal("160.00")))
          .toDF("c_mktsegment", "n_buyers", "n_orders", "spend")),
      graft.core.UnitTester.UnitCase("nation_rollup", "mart_nation_spend",
        Map("stg_customer" -> customers, "int_spend_all" -> spend),
        Seq((7L, 2L, BigDecimal("140.50")), (8L, 1L, BigDecimal("59.50")))
          .toDF("c_nationkey", "n_buyers", "spend")))
  }
}
