package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Macros
import graft.operators.{Bucketing, Ntile, Recursive, Salting, TopK}
import graft.sources.Catalog

/** A named query with an optional DuckDB oracle (ANSI SQL over the
  * same parquet tables). Oracle-less entries get a rows-only check.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** SURVEY.md §2.A — the relational/analytic operator surface of the
  * reference's 43 dbt models, re-expressed as Catalyst-friendly
  * DataFrame transforms over the TPC-H-ish test tables.
  *
  * Determinism rules (so the driver's DuckDB hash compare is stable):
  *  - money sums go through exact DECIMAL casts, cast to DOUBLE last;
  *  - derived floats are computed from exact sums with one double op,
  *    or rounded coarsely (stats);
  *  - every output has a total ORDER BY on a unique key;
  *  - aggregate output types are pinned (BIGINT counts, INT ranks).
  */
object Relational {

  private def q(name: String, oracle: String)(f: Catalog => DataFrame): Q =
    Q(name, (s, dir) => f(Catalog(s, dir)), Some(oracle.stripMargin.trim))

  private def dbl(c: Column): Column = c.cast(DoubleType)
  private def i32(c: Column): Column = c.cast(IntegerType)
  /** exact decimal casts — source doubles carry ≤2 decimal digits */
  private def decQty(c: Column): Column = c.cast(DecimalType(8, 2))
  private def decDisc(c: Column): Column = c.cast(DecimalType(4, 2))
  private def decPrice(c: Column): Column = c.cast(DecimalType(12, 2))
  private def decTotal(c: Column): Column = c.cast(DecimalType(14, 2))

  // ---------------------------------------------------------------
  // q01 — projection, filter, CASE bucketing
  // (reference: models/staging/stg_enrollments.sql:24-41)
  val q01: Q = q("q01_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |  CASE WHEN l_quantity >= 40 THEN 'Large' WHEN l_quantity >= 20 THEN 'Medium'
      |       WHEN l_quantity >= 10 THEN 'Small' ELSE 'Tiny' END AS qty_bucket,
      |  CASE WHEN l_returnflag = 'R' THEN 'Returned'
      |       WHEN l_linestatus = 'O' THEN 'Open' ELSE 'Fulfilled' END AS line_status
      |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-06-01'
      |ORDER BY l_orderkey, l_linenumber""") { c =>
    c.lineitem
      .filter(col("l_shipdate") >= lit("1995-06-01").cast(TimestampType))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        Macros.bucket(col("l_quantity"),
          Seq(40.0 -> "Large", 20.0 -> "Medium", 10.0 -> "Small"), "Tiny")
          .as("qty_bucket"),
        when(col("l_returnflag") === "R", "Returned")
          .when(col("l_linestatus") === "O", "Open")
          .otherwise("Fulfilled").as("line_status"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // q02 — groupBy aggregate battery (TPC-H Q1 shape; every int_* model)
  val q02: Q = q("q02_agg_groupby",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
      |  CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""") { c =>
    c.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dbl(sum(decQty(col("l_quantity")))).as("sum_qty"),
        dbl(sum(decPrice(col("l_extendedprice")))).as("sum_base_price"),
        dbl(sum(decPrice(col("l_extendedprice")) *
          (lit(1).cast(DecimalType(3, 2)) - decDisc(col("l_discount")))))
          .as("sum_disc_price"),
        dbl(min(col("l_quantity"))).as("min_qty"),
        dbl(max(col("l_quantity"))).as("max_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // q03 — HAVING post-aggregate filter (4 uses in reference)
  val q03: Q = q("q03_agg_having",
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS spend
      |FROM orders GROUP BY o_custkey
      |HAVING COUNT(*) >= 12 ORDER BY o_custkey""") { c =>
    c.orders
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        dbl(sum(decTotal(col("o_totalprice")))).as("spend"))
      .filter(col("n_orders") >= 12)
      .orderBy("o_custkey")
  }

  // q04 — COUNT(DISTINCT) (47 uses in reference)
  val q04: Q = q("q04_count_distinct",
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(*) AS n_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
    c.lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")
  }

  // q05 — inner equi-join, fact⋈dim (29 uses in reference)
  val q05: Q = q("q05_join_inner",
    """SELECT c_mktsegment, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, order_year ORDER BY c_mktsegment, order_year""") { c =>
    c.orders
      .join(c.customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), year(col("o_orderdate")).as("order_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        dbl(sum(decTotal(col("o_totalprice")))).as("revenue"))
      .orderBy("c_mktsegment", "order_year")
  }

  // q06 — left join + COALESCE null handling (55 uses in reference)
  val q06: Q = q("q06_join_left",
    """WITH o AS (SELECT o_custkey, COUNT(*) AS n_orders,
      |             SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev
      |           FROM orders GROUP BY o_custkey)
      |SELECT c_nationkey, COUNT(*) AS n_customers,
      |  CAST(SUM(CASE WHEN o.n_orders IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_idle_customers,
      |  COALESCE(CAST(SUM(o.rev) AS DOUBLE), 0.0) AS revenue
      |FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""") { c =>
    val perCust = c.orders
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(decTotal(col("o_totalprice"))).as("rev"))
    c.customer
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(when(col("n_orders").isNull, 1).otherwise(0)).cast(LongType)
          .as("n_idle_customers"),
        coalesce(dbl(sum(col("rev"))), lit(0.0)).as("revenue"))
      .orderBy("c_nationkey")
  }

  // q07 — full outer join (3 uses: institutional dashboards)
  val q07: Q = q("q07_join_full",
    """WITH s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers,
      |             CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS supplier_bal
      |           FROM supplier GROUP BY s_nationkey),
      |     c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers,
      |             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS customer_bal
      |           FROM customer GROUP BY c_nationkey)
      |SELECT COALESCE(s.nk, c.nk) AS nationkey, n_suppliers, supplier_bal, n_customers, customer_bal
      |FROM s FULL OUTER JOIN c ON s.nk = c.nk ORDER BY nationkey""") { c =>
    val s = c.supplier.groupBy(col("s_nationkey").as("snk"))
      .agg(count(lit(1)).as("n_suppliers"),
        dbl(sum(decPrice(col("s_acctbal")))).as("supplier_bal"))
    val cu = c.customer.groupBy(col("c_nationkey").as("cnk"))
      .agg(count(lit(1)).as("n_customers"),
        dbl(sum(decPrice(col("c_acctbal")))).as("customer_bal"))
    s.join(cu, col("snk") === col("cnk"), "full_outer")
      .select(
        coalesce(col("snk"), col("cnk")).as("nationkey"),
        col("n_suppliers"), col("supplier_bal"),
        col("n_customers"), col("customer_bal"))
      .orderBy("nationkey")
  }

  // q08 — cross join of small dims → broadcast NL join (1 use)
  val q08: Q = q("q08_join_cross",
    """SELECT r_name, pr AS priority FROM region
      |CROSS JOIN (SELECT DISTINCT o_orderpriority AS pr FROM orders)
      |ORDER BY r_name, priority""") { c =>
    val prio = c.orders.select(col("o_orderpriority").as("priority")).distinct()
    c.region.select("r_name")
      .crossJoin(broadcast(prio))
      .orderBy("r_name", "priority")
  }

  // q09 — semi/anti join (NOT EXISTS / EXISTS;
  // reference: macros/test_referential_integrity.sql:1-9)
  val q09: Q = q("q09_join_anti_semi",
    """SELECT 'has_orders' AS tag, c_nationkey, COUNT(*) AS n FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_nationkey
      |UNION ALL
      |SELECT 'no_orders' AS tag, c_nationkey, COUNT(*) AS n FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_nationkey
      |ORDER BY tag, c_nationkey""") { c =>
    val cond = col("c_custkey") === col("o_custkey")
    val semi = c.customer.join(c.orders, cond, "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .select(lit("has_orders").as("tag"), col("c_nationkey"), col("n"))
    val anti = c.customer.join(c.orders, cond, "left_anti")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      .select(lit("no_orders").as("tag"), col("c_nationkey"), col("n"))
    semi.unionAll(anti).orderBy("tag", "c_nationkey")
  }

  // q10 — row_number / rank / dense_rank (ranking marts)
  val q10: Q = q("q10_window_rank",
    """SELECT * FROM (
      |  SELECT c_mktsegment, c_custkey, c_nationkey,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey, c_custkey) AS INT) AS rn,
      |    CAST(RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS INT) AS rnk,
      |    CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS INT) AS drnk
      |  FROM customer) t
      |WHERE rn <= 100 ORDER BY c_mktsegment, rn""") { c =>
    // rank-limit pushdown does NOT fire here (the rn filter sits above
    // TWO stacked Window nodes), so bound the wide windows explicitly:
    // local top-100 per (segment, input partition) first. rank/
    // dense_rank stay exact on the pruned set — every row ordered
    // before a surviving row also survives phase 1. See PLANS.md.
    val pruned = TopK.prune(c.customer,
      Seq(col("c_mktsegment")), Seq(col("c_nationkey"), col("c_custkey")), 100)
    val wTie = Window.partitionBy("c_mktsegment").orderBy("c_nationkey", "c_custkey")
    val w = Window.partitionBy("c_mktsegment").orderBy("c_nationkey")
    pruned
      .select(
        col("c_mktsegment"), col("c_custkey"), col("c_nationkey"),
        row_number().over(wTie).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .filter(col("rn") <= 100)
      .orderBy("c_mktsegment", "rn")
  }

  // q11 — lag/lead trend offsets (62 lag uses in reference)
  val q11: Q = q("q11_window_lag",
    """SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
      |  CAST(LAG(o_totalprice)  OVER w AS DOUBLE) AS prev_price,
      |  CAST(LEAD(o_totalprice) OVER w AS DOUBLE) AS next_price,
      |  CAST(DATE_DIFF('day', LAG(CAST(o_orderdate AS DATE)) OVER w, CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""") { c =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    c.orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        dbl(col("o_totalprice")).as("price"),
        dbl(lag(col("o_totalprice"), 1).over(w)).as("prev_price"),
        dbl(lead(col("o_totalprice"), 1).over(w)).as("next_price"),
        i32(datediff(col("o_orderdate").cast(DateType),
          lag(col("o_orderdate").cast(DateType), 1).over(w))).as("days_since_prev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // q12 — first_value/last_value (7 uses: success predictors)
  val q12: Q = q("q12_window_first_last",
    """SELECT o_custkey, o_orderkey,
      |  CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price,
      |  CAST(LAST_VALUE(o_totalprice)  OVER w AS DOUBLE) AS last_price,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_orderkey
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""") { c =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c.orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        dbl(first(col("o_totalprice")).over(w)).as("first_price"),
        dbl(last(col("o_totalprice")).over(w)).as("last_price"),
        first(col("o_orderkey")).over(w).as("first_orderkey"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // q13 — running sum/avg, rows frame (enrollment trend models)
  val q13: Q = q("q13_window_running",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE) AS running_spend,
      |  CAST(ROW_NUMBER() OVER w AS INT) AS order_seq,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE)
      |    / CAST(ROW_NUMBER() OVER w AS DOUBLE) AS running_avg
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""") { c =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runSpend = dbl(sum(decTotal(col("o_totalprice"))).over(w))
    val seq = row_number().over(w)
    c.orders
      .select(
        col("o_custkey"), col("o_orderkey"),
        runSpend.as("running_spend"),
        seq.as("order_seq"),
        (runSpend / dbl(seq)).as("running_avg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // q14 — percent_rank benchmarking (8 uses in reference marts)
  val q14: Q = q("q14_percent_rank",
    """WITH nr AS (
      |  SELECT c_nationkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey)
      |SELECT c_nationkey, revenue,
      |  PERCENT_RANK() OVER (ORDER BY revenue) AS revenue_pctl
      |FROM nr ORDER BY c_nationkey""") { c =>
    val nr = c.orders
      .join(c.customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(dbl(sum(decTotal(col("o_totalprice")))).as("revenue"))
    nr.select(
        col("c_nationkey"), col("revenue"),
        percent_rank().over(Window.orderBy("revenue")).as("revenue_pctl"))
      .orderBy("c_nationkey")
  }

  // q15 — ntile quartiles
  val q15: Q = q("q15_ntile",
    """WITH t AS (SELECT c_mktsegment, c_acctbal,
      |    CAST(NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS INT) AS quartile
      |  FROM customer)
      |SELECT c_mktsegment, quartile, COUNT(*) AS n,
      |  CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal, CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
      |FROM t GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile""") { c =>
    // Ntile.exact, not ntile().over(partitionBy(...)): the built-in
    // window funnels each segment through ONE task (parallelism = 5
    // market segments forever); the distributed operator keeps
    // parallelism = shuffle partitions with a bit-identical assignment
    // under the (c_acctbal, c_custkey) total order.
    Ntile.exact(
        c.customer.select("c_mktsegment", "c_acctbal", "c_custkey"),
        k = 4, partCols = Seq("c_mktsegment"),
        orderCols = Seq("c_acctbal", "c_custkey"), bucketName = "quartile")
      .groupBy("c_mktsegment", "quartile")
      .agg(count(lit(1)).as("n"),
        dbl(min(col("c_acctbal"))).as("min_bal"),
        dbl(max(col("c_acctbal"))).as("max_bal"))
      .orderBy("c_mktsegment", "quartile")
  }

  // q16 — stddev/variance/corr (grade-inflation + predictor models)
  val q16: Q = q("q16_stats",
    """SELECT l_returnflag,
      |  CAST(ROUND(STDDEV_SAMP(l_quantity), 4) AS DOUBLE) AS stddev_qty,
      |  CAST(ROUND(VAR_SAMP(l_quantity), 4) AS DOUBLE) AS var_qty,
      |  CAST(ROUND(STDDEV_SAMP(l_discount), 4) AS DOUBLE) AS stddev_disc,
      |  CAST(ROUND(CORR(l_quantity, l_discount), 4) AS DOUBLE) AS corr_qty_disc
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
    c.lineitem
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("stddev_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(stddev_samp(col("l_discount")), 4).as("stddev_disc"),
        round(corr(col("l_quantity"), col("l_discount")), 4).as("corr_qty_disc"))
      .orderBy("l_returnflag")
  }

  // q17 — ordered string_agg (reference: int_course_prerequisite_chains.sql:76)
  val q17: Q = q("q17_string_agg",
    """SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations, COUNT(*) AS n_nations
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |GROUP BY r_name ORDER BY r_name""") { c =>
    c.region
      .join(c.nation, col("r_regionkey") === col("n_regionkey"))
      .groupBy("r_name")
      .agg(
        array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy("r_name")
  }

  // q18 — grade-point macro + weighted-average GPA macro
  // (reference: macros/grade_point_calculator.sql, macros/calculate_gpa.sql)
  val q18: Q = q("q18_grade_macro",
    """WITH g AS (
      |  SELECT c_mktsegment,
      |    CASE o_orderpriority WHEN '1-URGENT' THEN CAST('4.0' AS DECIMAL(3,1))
      |      WHEN '2-HIGH' THEN CAST('3.0' AS DECIMAL(3,1))
      |      WHEN '3-MEDIUM' THEN CAST('2.0' AS DECIMAL(3,1))
      |      WHEN '4-NOT SPECIFIED' THEN CAST('1.0' AS DECIMAL(3,1))
      |      WHEN '5-LOW' THEN CAST('0.0' AS DECIMAL(3,1)) END AS pts,
      |    CAST(o_totalprice AS DECIMAL(14,2)) AS w
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT c_mktsegment,
      |  CAST(ROUND(CAST(SUM(pts * w) AS DOUBLE) / NULLIF(CAST(SUM(w) AS DOUBLE), 0.0), 2) AS DOUBLE) AS priority_gpa,
      |  COUNT(*) AS n_orders
      |FROM g GROUP BY c_mktsegment ORDER BY c_mktsegment""") { c =>
    c.orders
      .join(c.customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        Macros.priorityPoints(col("o_orderpriority")).as("pts"),
        decTotal(col("o_totalprice")).as("w"))
      .groupBy("c_mktsegment")
      .agg(
        Macros.weightedAvg(col("pts"), col("w")).as("priority_gpa"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  // q19 — academic-year date macro (reference: macros/academic_year_from_date.sql)
  val q19: Q = q("q19_academic_year",
    """SELECT CASE WHEN CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) >= 8
      |    THEN CAST(CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS VARCHAR) || '-' ||
      |         CAST(CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) + 1 AS VARCHAR)
      |    ELSE CAST(CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) - 1 AS VARCHAR) || '-' ||
      |         CAST(CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS VARCHAR) END AS academic_year,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY academic_year ORDER BY academic_year""") { c =>
    c.orders
      .groupBy(Macros.academicYear(col("o_orderdate")).as("academic_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        dbl(sum(decTotal(col("o_totalprice")))).as("revenue"))
      .orderBy("academic_year")
  }

  // q20 — UNION ALL / EXCEPT set ops
  val q20: Q = q("q20_union_except",
    """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995),
      |     b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996),
      |     u AS (SELECT k FROM a UNION ALL SELECT k FROM b),
      |     e AS (SELECT k FROM a EXCEPT SELECT k FROM b)
      |SELECT 'except' AS tag, COUNT(*) AS n FROM e
      |UNION ALL
      |SELECT 'union_all' AS tag, COUNT(*) AS n FROM u
      |ORDER BY tag""") { c =>
    val a = c.orders.filter(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey").as("k")).distinct()
    val b = c.orders.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_custkey").as("k")).distinct()
    val e = a.except(b).agg(count(lit(1)).as("n")).select(lit("except").as("tag"), col("n"))
    val u = a.unionAll(b).agg(count(lit(1)).as("n")).select(lit("union_all").as("tag"), col("n"))
    e.unionAll(u).orderBy("tag")
  }

  // q21 — recursive CTE → iterative frontier expansion
  // (reference: models/intermediate/int_course_prerequisite_chains.sql:3-37)
  // Synthetic hierarchy: parent(p_partkey) = p_partkey // 2, keys ≤ 255.
  val q21: Q = q("q21_recursive_chain",
    """WITH RECURSIVE ch AS (
      |  SELECT p_partkey, 0 AS depth, CAST(p_partkey AS VARCHAR) AS chain
      |  FROM part WHERE p_partkey = 1
      |  UNION ALL
      |  SELECT p.p_partkey, ch.depth + 1, ch.chain || '->' || CAST(p.p_partkey AS VARCHAR)
      |  FROM part p JOIN ch ON CAST(FLOOR(p.p_partkey / 2) AS BIGINT) = ch.p_partkey
      |  WHERE p.p_partkey > 1 AND p.p_partkey <= 255 AND ch.depth < 10)
      |SELECT p_partkey, depth, chain FROM ch ORDER BY p_partkey""") { c =>
    val parts = c.part.select("p_partkey")
    val base = parts.filter(col("p_partkey") === 1)
      .select(col("p_partkey"), lit(0).as("depth"),
        col("p_partkey").cast(StringType).as("chain"))
    val children = parts
      .filter(col("p_partkey") > 1 && col("p_partkey") <= 255)
      .select(col("p_partkey").as("child_key"),
        floor(col("p_partkey") / 2).cast(LongType).as("parent_key"))
    Recursive.iterate(base, maxIter = 10) { frontier =>
      frontier
        .join(children, col("parent_key") === col("p_partkey"))
        .select(
          col("child_key").as("p_partkey"),
          (col("depth") + 1).as("depth"),
          concat(col("chain"), lit("->"), col("child_key").cast(StringType)).as("chain"))
    }.orderBy("p_partkey")
  }

  // q22 — conditional aggregation / manual pivot (dashboard models)
  val q22: Q = q("q22_conditional_pivot",
    """SELECT c_nationkey,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(14,2))
      |               ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE) AS urgent_revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey""") { c =>
    c.orders
      .join(c.customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast(LongType).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast(LongType).as("n_open"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).cast(LongType).as("n_pending"),
        dbl(sum(when(col("o_orderpriority") === "1-URGENT", decTotal(col("o_totalprice")))
          .otherwise(lit(0).cast(DecimalType(14, 2))))).as("urgent_revenue"))
      .orderBy("c_nationkey")
  }

  // q23 — top-k per group (rank-then-filter, QUALIFY shape)
  val q23: Q = q("q23_topk_per_group",
    """SELECT c_nationkey, CAST(rn AS INT) AS rn, c_custkey, c_name,
      |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
      |FROM (SELECT c_nationkey, c_custkey, c_name, c_acctbal,
      |        ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      |      FROM customer) t
      |WHERE rn <= 3 ORDER BY c_nationkey, rn""") { c =>
    // scale note: rank-limit pushdown (WindowGroupLimit Partial/Final)
    // bounds this to 3 rows per (nation, map task) pre-shuffle — the
    // 25-nation key skew never sees full-nation buffers; see PLANS.md.
    // graft.operators.TopK covers engines/cases without the rewrite.
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    c.customer
      .select(col("c_nationkey"), col("c_custkey"), col("c_name"),
        dbl(col("c_acctbal")).as("c_acctbal"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .select("c_nationkey", "rn", "c_custkey", "c_name", "c_acctbal")
      .orderBy("c_nationkey", "rn")
  }

  // q24 — multi-grain ROLLUP aggregate (dashboards re-aggregate at
  // dept + institution level)
  val q24: Q = q("q24_rollup",
    """SELECT COALESCE(r_name, 'ALL') AS region_name, COALESCE(n_name, 'ALL') AS nation_name,
      |  CAST(GROUPING(r_name) AS INT) AS g_region, CAST(GROUPING(n_name) AS INT) AS g_nation,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
      |  COUNT(*) AS n_suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY g_region, g_nation, region_name, nation_name""") { c =>
    val joined = c.supplier
      .join(broadcast(c.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(c.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"), col("s_acctbal"))
    // Selecting rollup grouping columns post-agg trips Spark 4's
    // DetectAmbiguousSelfJoin (the Expand's null-extended copies alias
    // the originals), so the rollup goes through the SQL resolution
    // path — identical Catalyst plan, no Dataset-column ambiguity check.
    // The view is session-unique and dropped once the plan is analyzed,
    // so the query leaves no shared session state behind.
    val view = s"graft_q24_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    joined.createOrReplaceTempView(view)
    try {
      val out = joined.sparkSession.sql(
        s"""SELECT COALESCE(r_name, 'ALL') AS region_name,
           |  COALESCE(n_name, 'ALL') AS nation_name,
           |  CAST(GROUPING(r_name) AS INT) AS g_region,
           |  CAST(GROUPING(n_name) AS INT) AS g_nation,
           |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
           |  COUNT(*) AS n_suppliers
           |FROM $view GROUP BY ROLLUP(r_name, n_name)
           |ORDER BY g_region, g_nation, region_name, nation_name""".stripMargin)
      out.queryExecution.analyzed // resolve the view ref before dropping it
      out
    } finally {
      joined.sparkSession.catalog.dropTempView(view); ()
    }
  }

  // q25 — scalar math battery (round/abs/mod/power/exp/ln/sign/
  // greatest/least/nullif/coalesce — all used in reference models)
  val q25: Q = q("q25_scalar_math",
    """SELECT p_partkey,
      |  CAST(ROUND(ABS(p_retailprice - 1000.0), 2) AS DOUBLE) AS abs_diff,
      |  CAST(p_size % 7 AS INT) AS size_mod,
      |  CAST(ROUND(POWER(CAST(p_size AS DOUBLE), 2.0), 6) AS DOUBLE) AS size_sq,
      |  CAST(ROUND(EXP(CAST(p_size AS DOUBLE) / 25.0), 6) AS DOUBLE) AS size_exp,
      |  CAST(ROUND(LN(CAST(p_retailprice AS DOUBLE)), 6) AS DOUBLE) AS price_ln,
      |  CAST(SIGN(p_retailprice - 1500.0) AS INT) AS price_sign,
      |  CAST(GREATEST(p_size, 25) AS INT) AS g25,
      |  CAST(LEAST(p_size, 25) AS INT) AS l25,
      |  CAST(COALESCE(NULLIF(p_size, 13), -1) AS INT) AS size_nz
      |FROM part WHERE p_partkey <= 2000 ORDER BY p_partkey""") { c =>
    c.part
      .filter(col("p_partkey") <= 2000)
      .select(
        col("p_partkey"),
        round(abs(col("p_retailprice") - 1000.0), 2).as("abs_diff"),
        i32(col("p_size") % 7).as("size_mod"),
        round(pow(dbl(col("p_size")), 2.0), 6).as("size_sq"),
        round(exp(dbl(col("p_size")) / 25.0), 6).as("size_exp"),
        round(log(dbl(col("p_retailprice"))), 6).as("price_ln"),
        i32(signum(col("p_retailprice") - 1500.0)).as("price_sign"),
        i32(greatest(col("p_size"), lit(25))).as("g25"),
        i32(least(col("p_size"), lit(25))).as("l25"),
        i32(coalesce(nullif(col("p_size"), lit(13)), lit(-1))).as("size_nz"))
      .orderBy("p_partkey")
  }

  // q26 — cohort retention with deterministic as-of date arithmetic
  // (reference: student_retention_analysis.sql:35 age()/current_date
  // — 20 current_date uses across marts; graft injects the as-of)
  val q26: Q = q("q26_cohort_retention",
    """WITH firsts AS (
      |  SELECT o_custkey, MIN(o_orderdate) AS first_order FROM orders GROUP BY o_custkey),
      |recents AS (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-07-01')
      |SELECT
      |  CASE WHEN CAST(EXTRACT(MONTH FROM first_order) AS INT) >= 8
      |    THEN CAST(CAST(EXTRACT(YEAR FROM first_order) AS INT) AS VARCHAR) || '-' ||
      |         CAST(CAST(EXTRACT(YEAR FROM first_order) AS INT) + 1 AS VARCHAR)
      |    ELSE CAST(CAST(EXTRACT(YEAR FROM first_order) AS INT) - 1 AS VARCHAR) || '-' ||
      |         CAST(CAST(EXTRACT(YEAR FROM first_order) AS INT) AS VARCHAR) END AS cohort,
      |  COUNT(*) AS n_customers,
      |  CAST(SUM(CASE WHEN r.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |  CAST(SUM(CAST(EXTRACT(YEAR FROM DATE '1998-07-01') AS INT) - CAST(EXTRACT(YEAR FROM first_order) AS INT)
      |        - CASE WHEN strftime(first_order, '%m%d') > strftime(DATE '1998-07-01', '%m%d') THEN 1 ELSE 0 END) AS BIGINT) AS total_tenure_years,
      |  ROUND(CAST(SUM(CASE WHEN r.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS retention_rate
      |FROM firsts f LEFT JOIN recents r ON f.o_custkey = r.o_custkey
      |GROUP BY cohort ORDER BY cohort""") { c =>
    val asOf = Macros.asOf("1998-07-01")
    val firsts = c.orders.groupBy("o_custkey")
      .agg(min(col("o_orderdate")).as("first_order"))
    val recents = c.orders
      .filter(col("o_orderdate") >= lit("1997-07-01").cast(TimestampType))
      .select(col("o_custkey").as("r_custkey")).distinct()
    val retained = sum(when(col("r_custkey").isNotNull, 1).otherwise(0)).cast(LongType)
    firsts
      .join(recents, col("o_custkey") === col("r_custkey"), "left")
      .groupBy(Macros.academicYear(col("first_order")).as("cohort"))
      .agg(
        count(lit(1)).as("n_customers"),
        retained.as("n_retained"),
        sum(Macros.yearsBetween(asOf, col("first_order"))).cast(LongType)
          .as("total_tenure_years"),
        round(retained.cast(DoubleType) / count(lit(1)), 6).as("retention_rate"))
      .orderBy("cohort")
  }

  // q27 — salted skew join: lineitem⋈orders executed on (key, salt)
  // with the orders side replicated 8×. Results are bit-identical to
  // the plain join (the Murmur3 salt never reaches the output), which
  // is exactly what the oracle verifies; the value is the mechanism —
  // the manual skew fallback for when AQE's runtime skew splitting
  // can't apply (see operators/Salting.scala).
  val q27: Q = q("q27_salted_join",
    """SELECT o_orderstatus, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS total_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""") { c =>
    Salting.saltedJoin(
        c.lineitem.select("l_orderkey", "l_linenumber", "l_partkey",
          "l_quantity", "l_extendedprice"),
        "l_orderkey",
        c.orders.select("o_orderkey", "o_orderstatus"),
        "o_orderkey", salts = 8, saltBy = "l_partkey")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        dbl(sum(decQty(col("l_quantity")))).as("total_qty"),
        dbl(sum(decPrice(col("l_extendedprice")))).as("revenue"))
      .orderBy("o_orderstatus")
  }

  // q28 — bucketed co-located join: both sides written hash-bucketed
  // on the join key, then joined with ZERO shuffle exchanges (the
  // plan assertion lives in RelationalSpec). The write-once shuffle
  // amortizes over every downstream join on the key — the storage
  // layout a 100 TB fact table wants under the reference's
  // staging→marts shape.
  val q28: Q = Q("q28_bucketed_join", (spark, dir) => {
    val c = Catalog(spark, dir)
    Bucketing.writeBucketed(
      c.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "graft_bkt_orders", "o_custkey", buckets = 8)
    Bucketing.writeBucketed(
      c.customer.select("c_custkey", "c_mktsegment"),
      "graft_bkt_customer", "c_custkey", buckets = 8)
    Bucketing.coLocatedJoin(spark, "graft_bkt_orders", "graft_bkt_customer",
        "o_custkey", "c_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        dbl(sum(decTotal(col("o_totalprice")))).as("revenue"))
      .orderBy("c_mktsegment")
  }, Some(
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin.trim))

  // q29 — GROUPING SETS: the non-hierarchical multi-grain form the
  // dashboard marts re-aggregate with (dept×priority, dept-only,
  // priority-only in ONE pass). Unlike q24's ROLLUP this is an
  // arbitrary grain list — Catalyst compiles it to a single Expand +
  // hash-aggregate, one scan for all three grains (vs three scans +
  // a union, which is what the reference's SQL engines would do
  // without it). Same SQL-resolution-path workaround as q24: selecting
  // grouping columns post-agg from the Dataset API trips Spark 4's
  // DetectAmbiguousSelfJoin on the Expand's null-extended copies.
  val q29: Q = Q("q29_grouping_sets", (spark, dir) => {
    val c = Catalog(spark, dir)
    val src = c.orders.select(col("o_orderstatus"), col("o_orderpriority"),
      col("o_totalprice"))
    val view = s"graft_q29_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    src.createOrReplaceTempView(view)
    try {
      val out = spark.sql(
        s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           |  COALESCE(o_orderpriority, 'ALL') AS priority,
           |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           |  COUNT(*) AS n_orders,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
           |FROM $view
           |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
           |  (o_orderstatus), (o_orderpriority))
           |ORDER BY g_status, g_priority, status, priority""".stripMargin)
      out.queryExecution.analyzed // resolve the view ref before dropping it
      out
    } finally {
      spark.catalog.dropTempView(view); ()
    }
  }, Some(
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |  (o_orderstatus), (o_orderpriority))
      |ORDER BY g_status, g_priority, status, priority""".stripMargin.trim))

  // q30 — exact interpolated percentiles per group (the reference's
  // benchmarking marts bucket on quartiles; percent_rank covers the
  // rank side, this covers the VALUE side). Spark's `percentile` and
  // DuckDB's `quantile_cont` share the lo + (hi-lo)·frac linear
  // interpolation, so the doubles agree and ROUND(…,4) hash-compares.
  // Scale note: exact percentile is a per-group sort — correct here
  // and fine per-group, but the 100 TB default is
  // `percentile_approx` (t-digest sketch, one pass, mergeable);
  // x11_sketch_profile registers that path with tolerance specs.
  val q30: Q = q("q30_percentile",
    """SELECT l_returnflag,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  ROUND(quantile_cont(l_quantity, 0.25), 4) AS qty_p25,
      |  ROUND(quantile_cont(l_quantity, 0.50), 4) AS qty_p50,
      |  ROUND(quantile_cont(l_quantity, 0.75), 4) AS qty_p75,
      |  ROUND(quantile_cont(l_quantity, 0.95), 4) AS qty_p95,
      |  ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS price_median
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { c =>
    c.lineitem
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        round(expr("percentile(l_quantity, 0.25D)"), 4).as("qty_p25"),
        round(expr("percentile(l_quantity, 0.50D)"), 4).as("qty_p50"),
        round(expr("percentile(l_quantity, 0.75D)"), 4).as("qty_p75"),
        round(expr("percentile(l_quantity, 0.95D)"), 4).as("qty_p95"),
        round(expr("percentile(l_extendedprice, 0.50D)"), 4).as("price_median"))
      .orderBy("l_returnflag")
  }

  // q31 — event-time RANGE frame: trailing-90-day rolling aggregates
  // per customer (the marts' "recent activity" windows). Unlike q13's
  // ROWS frame this is VALUE-based — all date-tie peers enter the
  // frame together, so the result is deterministic under ties, and a
  // gap in activity shrinks the frame to reality instead of counting
  // a fixed number of rows back. One shuffle on o_custkey; the frame
  // scan is a per-partition sliding two-pointer, never a re-scan.
  // Interval frames are SQL-only in Spark (the Dataset rangeBetween
  // API takes long offsets), hence the q24-style view path.
  val q31: Q = Q("q31_window_range_frame", (spark, dir) => {
    val c = Catalog(spark, dir)
    val src = c.orders.select(col("o_custkey"), col("o_orderkey"),
      col("o_orderdate"), col("o_totalprice"))
    val view = s"graft_q31_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    src.createOrReplaceTempView(view)
    try {
      val out = spark.sql(
        s"""SELECT o_custkey, o_orderkey, o_orderdate,
           |  COUNT(*) OVER w AS n_90d,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE) AS rev_90d
           |FROM $view
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
           |  RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
           |ORDER BY o_custkey, o_orderkey""".stripMargin)
      out.queryExecution.analyzed
      out
    } finally {
      spark.catalog.dropTempView(view); ()
    }
  }, Some(
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  COUNT(*) OVER w AS n_90d,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE) AS rev_90d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |  RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin.trim))

  // q32 — semi-structured JSON extraction: the events `props` payload
  // parsed ONCE per row into a typed struct with `from_json` (schema
  // declared, codegen'd Jackson parse — not N get_json_object calls
  // re-parsing the string per field), then a plain typed aggregate.
  // At 100 TB the parse cost dominates semi-structured scans; one
  // parse per row and pruned struct fields are the whole game.
  val q32: Q = q("q32_json_extract",
    """SELECT event_type, COUNT(*) AS n_events,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum
      |FROM events GROUP BY event_type ORDER BY event_type""") { c =>
    val k = from_json(col("props"), StructType(Seq(
      StructField("k", IntegerType)))).getField("k")
    c.events
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"),
        sum(col("k")).cast(LongType).as("k_sum"))
      .orderBy("event_type")
  }

  // q33 — UNPIVOT/melt: the complement of q22's conditional pivot.
  // Dashboard marts materialize wide per-entity metric rows; the
  // long (entity, metric, value) form feeds generic metric stores
  // and chart layers. Spark's Dataset.unpivot is ONE Expand pass
  // over the already-aggregated frame (same operator family as
  // q29's grouping sets) — NOT three scans + a union, which is what
  // the naive SQL rewrite costs at 100 TB. Values unify to DOUBLE
  // (unpivot requires one common type); counts are exact in double
  // far past any test scale.
  val q33: Q = q("q33_unpivot",
    """WITH wide AS (
      |  SELECT n_name,
      |    CAST(COUNT(*) AS DOUBLE) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
      |    CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_cust
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name)
      |SELECT n_name, 'n_orders' AS metric, n_orders AS value FROM wide
      |UNION ALL SELECT n_name, 'total_price', total_price FROM wide
      |UNION ALL SELECT n_name, 'n_cust', n_cust FROM wide
      |ORDER BY n_name, metric""") { c =>
    val wide = c.orders
      .join(c.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        count(lit(1)).cast(DoubleType).as("n_orders"),
        sum(decTotal(col("o_totalprice"))).cast(DoubleType).as("total_price"),
        countDistinct(col("o_custkey")).cast(DoubleType).as("n_cust"))
    wide.unpivot(
        Array(col("n_name")),
        Array(col("n_orders"), col("total_price"), col("n_cust")),
        "metric", "value")
      .orderBy("n_name", "metric")
  }

  // q34 — DYNAMIC partition pruning (DPP): the fact table is laid out
  // partitioned on a derived key (order year), the filter lives on a
  // DIM attribute (`d_era`) the fact never stores, and Catalyst
  // injects a runtime `dynamicpruningexpression` into the fact scan's
  // PartitionFilters — the broadcast of the filtered dim doubles as
  // the pruning subquery (reuseBroadcastOnly), so the fact reads ONLY
  // the 2 of 7 year partitions the dim selects, for free. Static
  // pushdown (q01) can't do this: the pruning values exist only at
  // runtime. At 100 TB date-partitioned facts joined to a filtered
  // calendar dim are THE dominant mart pattern, and DPP is the
  // difference between scanning 7 years and 2. The executed-plan
  // assertion (dynamicpruningexpression present, partitions actually
  // skipped) lives in RelationalSpec; the oracle proves layout +
  // pruning never change the answer.
  /** q34's partitioned-fact + dim layout, staged ONCE per source dir
    * and memoized: the layout is a FIXTURE (at 100 TB the fact is
    * already date-partitioned on disk), so repeated bench/probe
    * invocations must time the DPP-pruned read, not re-pay two
    * linear fixture writes — r11's driver probe read 9.67 (the
    * staging write) while the pruned read itself scales ~1.4.
    * Memoization also bounds scratch growth to one dir per corpus
    * (the prior per-invocation dirs accreted until JVM exit).
    */
  private val q34Layouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  def stageQ34(spark: SparkSession, dir: String): String =
    // compute, not computeIfAbsent: the memoized layout lives in
    // Scratch, which the bench's PROBE TAIL sweeps once before the
    // scale probes (passes 2+ deliberately do NOT sweep — the
    // streaming fixtures memoize across passes) — a stale memo entry
    // pointing at a swept dir must restage, not serve a dangling path
    q34Layouts.compute(dir, (_, prev) => {
      if (prev != null &&
          java.nio.file.Files.exists(java.nio.file.Paths.get(prev))) prev
      else stageQ34Fresh(spark, dir)
    })

  private def stageQ34Fresh(spark: SparkSession, dir: String): String = locally {
      val c = Catalog(spark, dir)
      val base = graft.core.Scratch.dir("q34_dpp_").toString
      c.orders
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year")
        .parquet(s"$base/orders_by_year")
      // the year dim: era label known ONLY to the dim (the calendar-
      // dim attribute shape of m13), written to disk so the planner
      // sees an independent relation, not a foldable subtree of the
      // fact
      c.orders.select(year(col("o_orderdate")).as("d_year")).distinct()
        .withColumn("d_era",
          when(col("d_year") >= 2000, "focus").otherwise("archive"))
        .write.mode("overwrite").parquet(s"$base/year_dim")
      base
    }

  val q34: Q = Q("q34_dpp", (spark, dir) => {
    val base = stageQ34(spark, dir)
    val fact = spark.read.parquet(s"$base/orders_by_year")
    val dim = spark.read.parquet(s"$base/year_dim")
      .filter(col("d_era") === "focus")
    fact.join(broadcast(dim), col("o_year") === col("d_year"))
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_orders"),
        dbl(sum(decTotal(col("o_totalprice")))).as("revenue"))
      .orderBy("o_year")
  }, Some(
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      |FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) >= 2000
      |GROUP BY 1 ORDER BY 1""".stripMargin.trim))

  // q35 — RUNTIME bloom-filter join pruning (InjectRuntimeFilter —
  // Spark 3.3+): the ROW-level sibling of q34's partition-level DPP.
  // When a big fact shuffle-joins a dim that carries a selective
  // filter, Catalyst builds a bloom filter over the dim's join keys
  // as a subquery and injects `bloom_filter_might_contain` into the
  // FACT side BEFORE its shuffle — at 100 TB that's the difference
  // between shuffling every lineitem row and shuffling only the ~1/5
  // that can possibly match. Semantically free: a bloom filter only
  // PRUNES (false positives still meet the exact join), so the result
  // is bit-identical — which is exactly what the oracle gates. The
  // injection thresholds are sized for multi-GB scans, so this entry
  // scopes bench-scale-friendly thresholds (and disables broadcast so
  // the join actually shuffles) and PLANS + EXECUTES inside that
  // scope via an eager checkpoint; the plan pin lives in
  // RelationalSpec. Conf scoping is restore-safe.
  val q35: Q = Q("q35_runtime_filter", (spark, dir) => {
    val c = Catalog(spark, dir)
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "0")
      spark.conf.set(keys(2), "512MB")
      spark.conf.set(keys(3), "-1")
      runtimeFilterJoin(c)
        // execute while the runtime-filter confs are live: planning is
        // lazy, and Verify/Bench materialize after this scope restores
        .localCheckpoint(eager = true)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }, Some(
    """SELECT l_returnflag, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS total_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.trim))

  /** The q35 join body, shared with RelationalSpec's plan pin. */
  def runtimeFilterJoin(c: Catalog): DataFrame =
    c.lineitem
      .join(
        c.orders.filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        dbl(sum(decQty(col("l_quantity")))).as("total_qty"),
        dbl(sum(decPrice(col("l_extendedprice")))).as("revenue"))
      .orderBy("l_returnflag")

  // q36 — the remaining SET operators with multiset semantics: q20
  // covers UNION ALL + EXCEPT (distinct); this covers INTERSECT,
  // INTERSECT ALL, and EXCEPT ALL — the bag forms whose per-key
  // multiplicity math (min / difference of counts) Catalyst compiles
  // to a single aggregate + generate instead of a join per
  // occurrence. Counts over customer multisets on two order-status
  // slices make the distinct-vs-all distinction visible in the
  // output (intersect < intersect_all iff shared keys repeat).
  // Scale note: registering the REAL operators costs one scan pair
  // per set-op (6 pushed-down single-column scans here); when only
  // the counts are needed at 100 TB, the one-scan form is a single
  // groupBy(key) with per-side conditional counts and the multiset
  // math (Σ min / Σ max(0, a−b) / count(both > 0)) on the grouped
  // frame — same answers, one shuffle.
  val q36: Q = q("q36_set_ops",
    """SELECT * FROM (
      |  SELECT 'except_all' AS op, COUNT(*) AS n FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    EXCEPT ALL
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  UNION ALL SELECT 'intersect', COUNT(*) FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    INTERSECT
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  UNION ALL SELECT 'intersect_all', COUNT(*) FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    INTERSECT ALL
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |) ORDER BY op""") { c =>
    val fCust = c.orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    val oCust = c.orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    Seq(
      "except_all" -> fCust.exceptAll(oCust),
      "intersect" -> fCust.intersect(oCust),
      "intersect_all" -> fCust.intersectAll(oCust))
      .map { case (op, df) =>
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      }
      .reduce(_ unionAll _).orderBy("op")
  }

  // q37 — the remaining window DISTRIBUTION functions: cume_dist
  // (q14's percent_rank sibling — fraction of peers at-or-below,
  // ties share the value in both engines since it's rank math, so
  // ROUND(,6) hash-compares) and nth_value with an explicit
  // full-partition ROWS frame (the default running frame would make
  // early rows NULL — pinning the frame is the correctness point;
  // benchmarking marts use exactly this "second-cheapest per group"
  // shape). Total order inside each partition via the
  // (totalprice, orderkey) tiebreak keeps every value deterministic.
  val q37: Q = q("q37_window_distribution",
    """SELECT o_custkey, o_orderkey,
      |  ROUND(cume_dist() OVER
      |    (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 6) AS cd,
      |  nth_value(o_orderkey, 2) OVER
      |    (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |    AS second_cheapest
      |FROM orders ORDER BY o_custkey, o_orderkey""") { c =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c.orders.select(
        col("o_custkey"), col("o_orderkey"),
        round(cume_dist().over(w), 6).as("cd"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_cheapest"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // q38 — correlated LATERAL subqueries: the "for each outer row,
  // run this parameterized subquery" SQL surface. Catalyst
  // DECORRELATES both forms into joins — the scalar aggregate
  // becomes a group-by + equi-join, the LIMIT-per-group becomes a
  // partitioned rank filter — so what reads as a nested loop
  // executes as two shuffles; that rewrite is exactly why the shape
  // survives 100 TB (a true row-at-a-time lateral would not). Both
  // classic forms in one result: each nation's customer count +
  // account-balance max (scalar agg lateral) and its single
  // top-balance customer (LIMIT lateral).
  val q38: Q = Q("q38_lateral", (spark, dir) => {
    val c = Catalog(spark, dir)
    val nv = s"graft_q38_n_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val cv = s"graft_q38_c_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    c.nation.createOrReplaceTempView(nv)
    c.customer.createOrReplaceTempView(cv)
    try {
      val out = spark.sql(
        s"""SELECT n.n_name, s.n_cust, s.max_bal, t.top_custkey
           |FROM $nv n,
           |LATERAL (SELECT COUNT(*) AS n_cust, MAX(c_acctbal) AS max_bal
           |         FROM $cv WHERE c_nationkey = n.n_nationkey) s,
           |LATERAL (SELECT c_custkey AS top_custkey FROM $cv
           |         WHERE c_nationkey = n.n_nationkey
           |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) t
           |ORDER BY n.n_name""".stripMargin)
      out.queryExecution.analyzed
      out
    } finally {
      spark.catalog.dropTempView(nv)
      spark.catalog.dropTempView(cv); ()
    }
  }, Some(
    """SELECT n.n_name, s.n_cust, s.max_bal, t.top_custkey
      |FROM nation n,
      |LATERAL (SELECT COUNT(*) AS n_cust, MAX(c_acctbal) AS max_bal
      |         FROM customer WHERE c_nationkey = n.n_nationkey) s,
      |LATERAL (SELECT c_custkey AS top_custkey FROM customer
      |         WHERE c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) t
      |ORDER BY n.n_name""".stripMargin.trim))

  // q39 — TIME-SERIES GAP FILL + FORWARD FILL (the dbt-utils
  // date_spine + last_value(IGNORE NULLS) recipe, and the standard
  // prep before any per-entity time-series model): densify each
  // user's sparse purchase-day series over its own [min, max] span,
  // then carry the last observed value across the gaps. Scale shape:
  // two map-side-combinable hash aggs (daily rollup, per-user
  // bounds), a spine EXPLODE that is output-sized (Σ user spans, not
  // users × global span), one (user, day) equi-join, and ONE window
  // partitioned BY USER — each partition is a ≤31-row span here and
  // a bounded-cardinality series at any scale, so the sort inside
  // the window never sees more than one entity's days (q14's
  // caution: this pattern is safe precisely because the partition
  // key is the entity, never the whole fact). filled_value is one
  // row's exact DECIMAL→DOUBLE, so forward fill crosses engines
  // bit-for-bit.
  val q39: Q = Q("q39_gap_fill", (spark, dir) => {
    val c = Catalog(spark, dir)
    // frozen: the daily rollup feeds both the spine bounds and the
    // join — without the freeze the events scan runs twice (Explain
    // audit: fileScans=2); the rollup is users×days tiny
    val d = c.events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("day_value"))
      .localCheckpoint(true)
    val spine = d.groupBy("user_id")
      .agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(d, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).cast(LongType).as("n_events"),
        (coalesce(col("n"), lit(0L)) === 0L).as("is_gap"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"))
      .orderBy("user_id", "day")
  }, Some(
    """WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |spine AS (SELECT user_id,
      |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY 1)),
      |j AS (SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n, d.day_value
      |      FROM spine s LEFT JOIN d ON s.user_id = d.user_id AND s.day = d.day)
      |SELECT user_id, day, CAST(n AS BIGINT) AS n_events, (n = 0) AS is_gap,
      |  last_value(day_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      |FROM j ORDER BY user_id, day""".stripMargin))

  // q40 — POINT-IN-TIME (temporal) dimension join: each fact row
  // joins the SCD2 dimension version that was valid AT THE FACT'S
  // DATE — the warehouse classic behind "what segment was this
  // customer in when they ordered" (m04 BUILDS such dimensions; this
  // is the query side that consumes them). The dimension history is
  // synthesized deterministically (two versions per customer around
  // a 1996 segment migration — the x09 injection discipline, both
  // engines derive the identical history). The naive rendering is a
  // RANGE join (key equality + BETWEEN) — O(|matches|) pair
  // explosion before pruning; the registered plan is the AsOf
  // composition instead: union + one rows-preceding window per key,
  // ONE shuffle, zero row multiplication (operators/AsOf.scala) —
  // correct because SCD2 versions are contiguous and non-overlapping,
  // so "latest valid_from ≤ fact date" IS the containing version.
  // The oracle states the BETWEEN form, so the hash gate proves the
  // as-of rewrite equals the range-join semantics row for row.
  val q40: Q = Q("q40_temporal_join", (spark, dir) => {
    val c = Catalog(spark, dir)
    // one customer scan: the two versions explode from an inline
    // array instead of a self-union (Explain audit: 3 → 2 fileScans)
    val dim = c.customer.select(col("c_custkey").as("ckey"),
        explode(array(
          struct(lit(java.sql.Date.valueOf("1992-01-01")).as("vdate"),
            concat(lit("LEGACY_"), col("c_mktsegment")).as("segment_at"),
            lit(1).as("version")),
          struct(lit(java.sql.Date.valueOf("1996-01-01")).as("vdate"),
            col("c_mktsegment").as("segment_at"),
            lit(2).as("version")))).as("x"))
      .select(col("ckey"), col("x.vdate").as("vdate"),
        col("x.segment_at").as("segment_at"), col("x.version").as("version"))
    val facts = c.orders.select(col("o_orderkey"),
      col("o_custkey").as("ckey"), col("o_orderdate").as("vdate"))
    graft.operators.AsOf.joinAsOf(facts, dim, "ckey", "vdate")
      .select(col("o_orderkey"), col("ckey").as("o_custkey"),
        col("vdate").as("o_orderdate"),
        col("asof.segment_at").as("segment_at"),
        col("asof.version").cast(IntegerType).as("version"))
      .orderBy("o_orderkey")
  }, Some(
    """WITH dim AS (
      |  SELECT c_custkey AS ckey, DATE '1992-01-01' AS valid_from,
      |    DATE '1996-01-01' AS valid_to,
      |    'LEGACY_' || c_mktsegment AS segment_at, 1 AS version
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, DATE '1996-01-01', DATE '9999-01-01',
      |    c_mktsegment, 2
      |  FROM customer)
      |SELECT o_orderkey, o_custkey, o_orderdate, segment_at,
      |  CAST(version AS INT) AS version
      |FROM orders JOIN dim ON o_custkey = dim.ckey
      |  AND o_orderdate >= valid_from AND o_orderdate < valid_to
      |ORDER BY o_orderkey""".stripMargin))

  // q41 — LINEAR INTERPOLATION over the densified series (q39's
  // spine, the other classic resampling fill): an interior gap day
  // gets prev + (next − prev) · Δdays/span from its two flanking
  // observations — four IGNORE-NULLS window scans (prev/next value
  // and day) over the SAME per-entity partition, so the plan is
  // q39's plus one mirrored window, still entity-partitioned and
  // output-sized. The interpolation arithmetic is two exact
  // DECIMAL→DOUBLE observations and integer day offsets in one
  // identical expression shape both engines ROUND(,6).
  val q41: Q = Q("q41_linear_interp", (spark, dir) => {
    val c = Catalog(spark, dir)
    val d = c.events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("day_value"))
      .localCheckpoint(true) // spine bounds + join (q39's freeze)
    val spine = d.groupBy("user_id")
      .agg(min("day").as("lo"), max("day").as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("day"))
    val back = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("day_value").isNotNull, col("day"))
    val j = spine.join(d, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("day_value"),
        last(col("day_value"), ignoreNulls = true).over(back).as("pv"),
        last(obsDay, ignoreNulls = true).over(back).as("pd"),
        first(col("day_value"), ignoreNulls = true).over(fwd).as("nv"),
        first(obsDay, ignoreNulls = true).over(fwd).as("nd"))
    j.select(col("user_id"), col("day"),
        col("day_value").isNotNull.as("observed"),
        round(when(col("day_value").isNotNull, col("day_value"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * datediff(col("day"), col("pd")).cast(DoubleType)
            / datediff(col("nd"), col("pd")).cast(DoubleType)), 6)
          .as("value_interp"))
      .orderBy("user_id", "day")
  }, Some(
    """WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |spine AS (SELECT user_id,
      |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM d GROUP BY 1)),
      |j AS (SELECT s.user_id, s.day, d.day_value,
      |    last_value(d.day_value IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    last_value(CASE WHEN d.day_value IS NOT NULL THEN s.day END IGNORE NULLS)
      |      OVER (PARTITION BY s.user_id ORDER BY s.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
      |    first_value(d.day_value IGNORE NULLS) OVER (PARTITION BY s.user_id ORDER BY s.day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN d.day_value IS NOT NULL THEN s.day END IGNORE NULLS)
      |      OVER (PARTITION BY s.user_id ORDER BY s.day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      |  FROM spine s LEFT JOIN d ON s.user_id = d.user_id AND s.day = d.day)
      |SELECT user_id, day, (day_value IS NOT NULL) AS observed,
      |  ROUND(CASE WHEN day_value IS NOT NULL THEN day_value
      |    ELSE pv + (nv - pv) * CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE) END, 6)
      |    AS value_interp
      |FROM j ORDER BY user_id, day""".stripMargin))

  // ---------------------------------------------------------------
  // q42 — INTERVAL CONCURRENCY via sweep-line: peak simultaneous
  // sessions per day. The naive plan is an interval self-join
  // (quadratic in overlap density); the sweep reduces it to ±1
  // deltas at interval endpoints and ONE running sum — 2n rows,
  // no join. The running sum itself is computed scale-safely with
  // the two-phase prefix-sum discipline (x16/x18's): a per-DAY
  // partitioned running window plus a calendar-sized carry-in of
  // prior days' net deltas — no corpus-wide single-partition
  // window anywhere (the oracle's global window is the semantic
  // statement; days order by time, so carry-in + within-day prefix
  // ≡ the global prefix). Ties at equal timestamps process starts
  // before ends (delta DESC: touching closed intervals overlap),
  // then (user_id, session_seq) for full determinism.
  val q42: Q = q("q42_interval_concurrency",
    """WITH s AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |t AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS sid FROM s),
      |iv AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en
      |       FROM t GROUP BY user_id, sid),
      |d AS (SELECT st AS t, 1 AS delta, user_id, sid FROM iv
      |      UNION ALL
      |      SELECT en AS t, -1 AS delta, user_id, sid FROM iv),
      |r AS (SELECT t, delta,
      |        SUM(delta) OVER (ORDER BY t, delta DESC, user_id, sid
      |          ROWS UNBOUNDED PRECEDING) AS conc
      |      FROM d)
      |SELECT CAST(t AS DATE) AS day, CAST(MAX(conc) AS INT) AS peak_concurrency,
      |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
      |FROM r GROUP BY 1 ORDER BY day""") { c =>
    // Frozen: the session frame feeds both union legs, and the delta
    // stream they form feeds the within-day window AND the carry-in
    // aggregate. Unfrozen that recomputes the sessionization (corpus
    // scan + per-user window) four times — audited at 8 fileScans;
    // frozen it runs ONCE and the downstream consumers read a
    // sessions-sized frame (q39's shared-rollup freeze class).
    val iv = graft.streaming.EventStream.sessionize(c.events)
      .select("user_id", "session_seq", "session_start", "session_end")
      .localCheckpoint(true)
    val d = iv.select(col("session_start").as("t"), lit(1).as("delta"),
        col("user_id"), col("session_seq"))
      .unionByName(iv.select(col("session_end").as("t"), lit(-1).as("delta"),
        col("user_id"), col("session_seq")))
      .withColumn("day", to_date(col("t")))
    val wDay = Window.partitionBy("day")
      .orderBy(col("t"), col("delta").desc, col("user_id"), col("session_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCal = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = d.groupBy("day").agg(sum("delta").as("net"))
      .select(col("day"), coalesce(sum("net").over(wCal), lit(0)).as("carry"))
    d.withColumn("run", sum("delta").over(wDay))
      .join(broadcast(carry), "day")
      .withColumn("conc", col("carry") + col("run"))
      .groupBy("day")
      .agg(max("conc").cast(IntegerType).as("peak_concurrency"),
        sum(when(col("delta") === 1, 1).otherwise(0)).as("n_starts"))
      .orderBy("day")
  }

  // q43 — APPROXIMATE TOP-K via the MisraGries typed aggregate
  // (plans/SketchAggregates.scala): heavy hitters without shuffling
  // one row per distinct item. Each map task folds its partition
  // into a capacity-bounded buffer; partial buffers merge on the
  // reducer (mergeable summaries) — only capacity-sized state
  // crosses the wire, the plan that survives a billion-distinct
  // item column where groupBy(item) cannot. Oracle-gated in the
  // EXACT regime (capacity 128 ≥ the corpus vocabulary, so no
  // decrement fires in any partial and the summary IS the exact
  // frequency table); the sketch regime's N/(capacity+1) undercount
  // bound is pinned in RelationalSpec on an undersized buffer.
  val q43: Q = q("q43_approx_topk",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
      |c AS (SELECT word, COUNT(*) AS cnt FROM tok WHERE word <> '' GROUP BY word)
      |SELECT word, cnt, CAST(rn AS INT) AS rank
      |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rn FROM c)
      |WHERE rn <= 10 ORDER BY rank""") { c =>
    val words = c.documents
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    words
      .agg(graft.plans.Sketches.approxTopItems(col("word"), capacity = 128).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item").as("word"), col("e.count").as("cnt"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("word")))
          .cast(IntegerType))
      .filter(col("rank") <= 10)
      .orderBy("rank")
  }

  // q44 — INTERVAL-WEIGHTED aggregation (time-weighted average): each
  // order's value is "held" until the same customer's next order, and
  // the segment-level average weights each value by its holding
  // period — the TWAP/position-exposure shape (billing proration,
  // SCD-2 attribute weighting) that a plain AVG silently gets wrong
  // whenever sampling is irregular. Plan: ONE lead() window per
  // customer (shuffle on the natural key — parallelism = |customers|,
  // no global window), durations as exact integer days, money through
  // the exact-DECIMAL discipline, ONE double division per output row
  // at the very end. The open last interval per customer carries no
  // successor and drops — the standard right-open convention.
  val q44: Q = q("q44_time_weighted_avg",
    """WITH iv AS (
      |  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(14,2)) AS price,
      |    date_diff('day', CAST(o_orderdate AS DATE),
      |      CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS DATE)) AS dur
      |  FROM orders)
      |SELECT c_mktsegment,
      |  COUNT(*) AS n_intervals,
      |  CAST(SUM(dur) AS BIGINT) AS n_days,
      |  ROUND(CAST(SUM(price * dur) AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 6)
      |    AS tw_avg_value
      |FROM iv JOIN customer ON o_custkey = c_custkey
      |WHERE dur IS NOT NULL
      |GROUP BY 1 ORDER BY 1""") { c =>
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    val iv = c.orders
      .select(col("o_custkey"), decTotal(col("o_totalprice")).as("price"),
        datediff(lead(col("o_orderdate"), 1).over(w), col("o_orderdate"))
          .as("dur"))
      .filter(col("dur").isNotNull)
    iv.join(c.customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_intervals"),
        sum("dur").cast(LongType).as("n_days"),
        round(dbl(sum(col("price") * col("dur")))
          / dbl(sum("dur")), 6).as("tw_avg_value"))
      .orderBy("c_mktsegment")
  }

  val all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q28, q29, q30, q31, q32, q33,
    q34, q35, q36, q37, q38, q39, q40, q41, q42, q43, q44)
}
