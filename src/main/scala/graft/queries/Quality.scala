package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, TimestampType}

import graft.operators.DataQuality
import graft.sources.Catalog

/** SURVEY.md §2.C — dbt data tests as verifiable operators. Each query
  * reports per-check violation counts (dbt: a test passes when it
  * returns zero rows; the summary is what `dbt test` prints).
  * References: tests/test_data_quality_checks.sql,
  * macros/test_referential_integrity.sql, sources.yml column tests.
  */
object Quality {

  private def q(name: String, oracle: String)(f: Catalog => DataFrame): Q =
    Q(name, (s, dir) => f(Catalog(s, dir)), Some(oracle.stripMargin.trim))

  // t01 — not_null + unique column tests (sources.yml shape)
  val t01: Q = q("t01_test_not_null_unique",
    """SELECT * FROM (
      |  SELECT 'not_null_customer_name' AS check_name,
      |         (SELECT COUNT(*) FROM customer WHERE c_name IS NULL) AS n_violations
      |  UNION ALL SELECT 'not_null_orders_custkey',
      |         (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
      |  UNION ALL SELECT 'unique_orders_orderkey',
      |         (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1))
      |  UNION ALL SELECT 'unique_lineitem_orderkey',
      |         (SELECT COUNT(*) FROM (SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING COUNT(*) > 1))
      |  UNION ALL SELECT 'unique_lineitem_order_line',
      |         (SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem GROUP BY 1, 2 HAVING COUNT(*) > 1))
      |) ORDER BY check_name""") { c =>
    DataQuality.summarize(Seq(
      "not_null_customer_name" -> DataQuality.notNull(c.customer, Seq("c_name")),
      "not_null_orders_custkey" -> DataQuality.notNull(c.orders, Seq("o_custkey")),
      "unique_orders_orderkey" -> DataQuality.unique(c.orders, Seq("o_orderkey")),
      "unique_lineitem_orderkey" -> DataQuality.unique(c.lineitem, Seq("l_orderkey")),
      "unique_lineitem_order_line" ->
        DataQuality.unique(c.lineitem, Seq("l_orderkey", "l_linenumber"))))
      .orderBy("check_name")
  }

  // t02 — referential integrity via anti-join
  // (macros/test_referential_integrity.sql re-expressed)
  val t02: Q = q("t02_test_relationships",
    """SELECT * FROM (
      |  SELECT 'orders_customer' AS check_name,
      |         (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
      |            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_violations
      |  UNION ALL SELECT 'lineitem_orders',
      |         (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
      |            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL SELECT 'lineitem_part',
      |         (SELECT COUNT(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL AND NOT EXISTS
      |            (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
      |  UNION ALL SELECT 'events_customer',
      |         (SELECT COUNT(*) FROM events e WHERE e.user_id IS NOT NULL AND NOT EXISTS
      |            (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
      |) ORDER BY check_name""") { c =>
    DataQuality.summarize(Seq(
      "orders_customer" ->
        DataQuality.relationships(c.orders, "o_custkey", c.customer, "c_custkey"),
      "lineitem_orders" ->
        DataQuality.relationships(c.lineitem, "l_orderkey", c.orders, "o_orderkey"),
      "lineitem_part" ->
        DataQuality.relationships(c.lineitem, "l_partkey", c.part, "p_partkey"),
      "events_customer" ->
        DataQuality.relationships(c.events, "user_id", c.customer, "c_custkey")))
      .orderBy("check_name")
  }

  // t03 — accepted_values (tests/test_data_quality_checks.sql shape;
  // 'P' orders and 'error' events are genuine violations in the data)
  val t03: Q = q("t03_test_accepted_values",
    """SELECT * FROM (
      |  SELECT 'orders_status_FO' AS check_name,
      |         (SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('F','O') OR o_orderstatus IS NULL) AS n_violations
      |  UNION ALL SELECT 'lineitem_returnflag',
      |         (SELECT COUNT(*) FROM lineitem WHERE l_returnflag NOT IN ('A','N','R') OR l_returnflag IS NULL)
      |  UNION ALL SELECT 'events_type_no_error',
      |         (SELECT COUNT(*) FROM events WHERE event_type NOT IN ('click','view','purchase','signup') OR event_type IS NULL)
      |) ORDER BY check_name""") { c =>
    DataQuality.summarize(Seq(
      "orders_status_FO" ->
        DataQuality.acceptedValues(c.orders, "o_orderstatus", Seq("F", "O")),
      "lineitem_returnflag" ->
        DataQuality.acceptedValues(c.lineitem, "l_returnflag", Seq("A", "N", "R")),
      "events_type_no_error" ->
        DataQuality.acceptedValues(c.events, "event_type",
          Seq("click", "view", "purchase", "signup"))))
      .orderBy("check_name")
  }

  // t04 — SINGULAR cross-model tests (reference:
  // tests/test_financial_consistency.sql shape — reconcile a parent
  // model's stored totals against its child model's computed totals,
  // fail on rows). All three checks are genuine findings in this
  // synthetic data; thresholds sit far from any boundary value
  // (min observed reconciliation diff is ~8.9), so the counts are
  // deterministic across engines despite double-precision sums.
  val t04: Q = q("t04_singular_financial_consistency",
    """SELECT * FROM (
      |  SELECT 'lineitem_total_mismatch' AS check_name,
      |         (SELECT COUNT(*) FROM orders o JOIN
      |            (SELECT l_orderkey, SUM(l_extendedprice*(1-l_discount)*(1+l_tax)) AS li_total
      |             FROM lineitem GROUP BY 1) li ON o.o_orderkey = li.l_orderkey
      |          WHERE ABS(o.o_totalprice - li.li_total) > 1.0) AS n_violations
      |  UNION ALL SELECT 'linenumber_sequence_broken',
      |         (SELECT COUNT(*) FROM (SELECT l_orderkey FROM lineitem
      |                                GROUP BY 1 HAVING MAX(l_linenumber) <> COUNT(*)))
      |  UNION ALL SELECT 'orders_without_lineitems',
      |         (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      |            (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
      |) ORDER BY check_name""") { c =>
    val li = c.lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("li_total"),
        max(col("l_linenumber")).as("max_ln"),
        count(lit(1)).as("n_ln"))
    DataQuality.summarize(Seq(
      DataQuality.singular("lineitem_total_mismatch",
        c.orders.join(li, col("o_orderkey") === col("l_orderkey"))
          .filter(abs(col("o_totalprice") - col("li_total")) > 1.0)),
      DataQuality.singular("linenumber_sequence_broken",
        li.filter(col("max_ln") =!= col("n_ln"))),
      DataQuality.singular("orders_without_lineitems",
        c.orders.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti"))))
      .orderBy("check_name")
  }

  // t05 — SINGULAR date-logic test (reference:
  // tests/test_enrollment_integrity.sql shape — enrollment after the
  // semester's end OR completion before enrollment, i.e. child-event
  // timestamps outside the parent's validity window, plus the
  // duplicate-enrollment shape). Over orders/lineitem: a line shipped
  // before its order exists, shipped past the 120-day fulfilment
  // window, or the same (order, part, supplier) appearing twice.
  // Timestamps compare exactly (ms precision, no rounding), so the
  // counts are engine-independent.
  val t05: Q = q("t05_singular_enrollment_integrity",
    """SELECT * FROM (
      |  SELECT 'duplicate_order_part_supp' AS check_name,
      |         (SELECT COUNT(*) FROM (SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
      |                                GROUP BY 1, 2, 3 HAVING COUNT(*) > 1)) AS n_violations
      |  UNION ALL SELECT 'shipped_before_order',
      |         (SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |          WHERE l.l_shipdate < o.o_orderdate)
      |  UNION ALL SELECT 'shipped_outside_window',
      |         (SELECT COUNT(*) FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |          WHERE l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY)
      |) ORDER BY check_name""") { c =>
    val joined = c.lineitem
      .join(c.orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
    DataQuality.summarize(Seq(
      DataQuality.singular("duplicate_order_part_supp",
        DataQuality.unique(c.lineitem, Seq("l_orderkey", "l_partkey", "l_suppkey"))),
      DataQuality.singular("shipped_before_order",
        joined.filter(col("l_shipdate") < col("o_orderdate"))),
      DataQuality.singular("shipped_outside_window",
        joined.filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 120 DAYS")))))
      .orderBy("check_name")
  }

  // t06 — source freshness (dbt `source freshness`: per source, the
  // max of its loaded_at field is aged against warn_after/error_after
  // and reported as pass/warn/error — sources.yml `freshness:` block).
  // The as-of instant is pinned (a wall-clock `now()` would be
  // nondeterministic across engines and runs); thresholds sit far
  // from the observed ages so the statuses are stable. Each max() is
  // a single-column scan aggregate — at 100 TB this is the cheapest
  // possible full-scan check, and on a lakehouse format it degrades
  // to metadata-only (max stats per file).
  val t06: Q = q("t06_source_freshness",
    """WITH f AS (
      |  SELECT 'events' AS source_name, CAST(MAX(ts) AS TIMESTAMP) AS max_loaded_at,
      |         14 AS warn_after, 60 AS error_after
      |  FROM events
      |  UNION ALL
      |  SELECT 'lineitem', CAST(MAX(l_shipdate) AS TIMESTAMP), 5000, 8000 FROM lineitem
      |  UNION ALL
      |  SELECT 'orders', CAST(MAX(o_orderdate) AS TIMESTAMP), 9000, 10000 FROM orders),
      |a AS (SELECT source_name, max_loaded_at,
      |  CAST(date_diff('day', CAST(max_loaded_at AS DATE), DATE '2024-03-01') AS INT) AS age_days,
      |  warn_after, error_after FROM f)
      |SELECT source_name, max_loaded_at, age_days,
      |  CASE WHEN age_days > error_after THEN 'error'
      |       WHEN age_days > warn_after THEN 'warn' ELSE 'pass' END AS status
      |FROM a ORDER BY source_name""") { c =>
    val asof = to_date(lit("2024-03-01"))
    def fresh(src: DataFrame, name: String, loadedAt: String,
        warnAfter: Int, errorAfter: Int): DataFrame = {
      src.agg(max(col(loadedAt)).cast(TimestampType).as("max_loaded_at"))
        .select(lit(name).as("source_name"), col("max_loaded_at"),
          datediff(asof, col("max_loaded_at").cast(DateType)).as("age_days"))
        .withColumn("status",
          when(col("age_days") > errorAfter, "error")
            .when(col("age_days") > warnAfter, "warn")
            .otherwise("pass"))
    }
    fresh(c.events, "events", "ts", 14, 60)
      .unionByName(fresh(c.lineitem, "lineitem", "l_shipdate", 5000, 8000))
      .unionByName(fresh(c.orders, "orders", "o_orderdate", 9000, 10000))
      .orderBy("source_name")
  }

  // t07 — volume anomaly test (elementary/dbt-style freshness+volume
  // monitoring): each day's event count is z-scored against the
  // trailing 7-day window and flagged when |z| > 3. The variance is
  // rebuilt from INTEGER trailing sums (n, Σx, Σx²) rather than a
  // builtin stddev so both engines evaluate the identical IEEE
  // expression — counts this small make Σx²/n exact in a double.
  // Scale shape: the window runs over the POST-AGGREGATE daily series
  // (one row per day — thousands of rows for years of data), so the
  // single-partition window is bounded by the calendar, not the
  // corpus; the heavy lifting is the groupBy(day) hash agg, which is
  // map-side combined on the event scan.
  val t07: Q = q("t07_volume_anomaly",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |  FROM events GROUP BY 1),
      |w AS (SELECT day, n_events,
      |  COUNT(*)                 OVER tw AS t_n,
      |  SUM(n_events)            OVER tw AS t_sum,
      |  SUM(n_events * n_events) OVER tw AS t_sumsq
      |  FROM daily
      |  WINDOW tw AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT day, n_events, t_n, t_sum,
      |  CASE WHEN t_n >= 3 AND (t_sumsq - CAST(t_sum AS DOUBLE) * t_sum / t_n) > 0
      |       THEN (n_events - CAST(t_sum AS DOUBLE) / t_n)
      |            / sqrt((t_sumsq - CAST(t_sum AS DOUBLE) * t_sum / t_n) / (t_n - 1))
      |  END AS zscore FROM w)
      |SELECT day, n_events, ROUND(zscore, 6) AS zscore,
      |  CASE WHEN t_n < 3 THEN 'insufficient'
      |       WHEN zscore IS NULL THEN
      |         CASE WHEN n_events * t_n = t_sum THEN 'ok' ELSE 'anomaly' END
      |       WHEN abs(zscore) > 3.0 THEN 'anomaly' ELSE 'ok' END AS status
      |FROM z ORDER BY day""") { c =>
    val daily = c.events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val tw = Window.orderBy("day").rowsBetween(-7, -1)
    val w = daily
      .withColumn("t_n", count(lit(1)).over(tw))
      .withColumn("t_sum", sum("n_events").over(tw))
      .withColumn("t_sumsq", sum(col("n_events") * col("n_events")).over(tw))
    val varNum =
      col("t_sumsq") - col("t_sum").cast("double") * col("t_sum") / col("t_n")
    w.withColumn("zscore",
        when(col("t_n") >= 3 && varNum > 0,
          (col("n_events") - col("t_sum").cast("double") / col("t_n")) /
            sqrt(varNum / (col("t_n") - 1))))
      .select(col("day"), col("n_events"),
        round(col("zscore"), 6).as("zscore"),
        when(col("t_n") < 3, "insufficient")
          .when(col("zscore").isNull,
            when(col("n_events") * col("t_n") === col("t_sum"), "ok")
              .otherwise("anomaly"))
          .when(abs(col("zscore")) > 3.0, "anomaly")
          .otherwise("ok").as("status"))
      .orderBy("day")
  }

  // t08 — distribution drift (PSI): bucket the metric into 10 fixed
  // bands, compare the baseline window's shares (orders before the
  // engine cutoff) against the current window's, and report each
  // band's Population Stability Index contribution plus the
  // classified total (>0.2 drift / >0.1 moderate — the standard PSI
  // bands). Laplace-smoothed shares keep empty bands finite. Scale
  // shape: ONE conditional hash agg over the table; everything after
  // operates on the 10-row band frame (the unpartitioned windows are
  // over those 10 rows, never data).
  val t08: Q = q("t08_distribution_drift",
    """WITH b AS (SELECT LEAST(9, CAST(floor(o_totalprice / 60000.0) AS BIGINT)) AS bucket,
      |            o_orderdate < TIMESTAMP '1996-07-01' AS is_base FROM orders),
      |spine AS (SELECT range AS bucket FROM range(0, 10)),
      |counts AS (SELECT bucket,
      |    SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS n_base,
      |    SUM(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS n_curr
      |  FROM b GROUP BY bucket),
      |f AS (SELECT s.bucket, COALESCE(n_base, 0) AS n_base,
      |        COALESCE(n_curr, 0) AS n_curr
      |      FROM spine s LEFT JOIN counts c ON s.bucket = c.bucket),
      |t AS (SELECT *, SUM(n_base) OVER () AS t_base,
      |        SUM(n_curr) OVER () AS t_curr FROM f),
      |p AS (SELECT bucket, n_base, n_curr,
      |        (CAST(n_curr + 1 AS DOUBLE) / (t_curr + 10)
      |          - CAST(n_base + 1 AS DOUBLE) / (t_base + 10))
      |        * ln((CAST(n_curr + 1 AS DOUBLE) / (t_curr + 10))
      |             / (CAST(n_base + 1 AS DOUBLE) / (t_base + 10))) AS term
      |      FROM t)
      |SELECT bucket, CAST(n_base AS BIGINT) AS n_base,
      |  CAST(n_curr AS BIGINT) AS n_curr, ROUND(term, 6) AS psi_term,
      |  ROUND(SUM(term) OVER (), 6) AS psi_total,
      |  CASE WHEN SUM(term) OVER () > 0.2 THEN 'drift'
      |       WHEN SUM(term) OVER () > 0.1 THEN 'moderate'
      |       ELSE 'stable' END AS status
      |FROM p ORDER BY bucket""") { c =>
    val cutoff = lit("1996-07-01").cast(TimestampType)
    val bucketed = c.orders.select(
      least(lit(9L), floor(col("o_totalprice") / 60000.0)).as("bucket"),
      (col("o_orderdate").cast(TimestampType) < cutoff).as("is_base"))
    val counts = bucketed.groupBy("bucket").agg(
      sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
      sum(when(!col("is_base"), 1L).otherwise(0L)).as("n_curr"))
    val spine = c.spark.range(0, 10).select(col("id").as("bucket"))
    val f = spine.join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_base", "n_curr"))
    // 10-row frame from here on: unpartitioned windows are bounded
    // by the band count, not data
    val wAll = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pb = (col("n_base") + 1).cast("double") / (col("t_base") + 10)
    val pc = (col("n_curr") + 1).cast("double") / (col("t_curr") + 10)
    f.withColumn("t_base", sum("n_base").over(wAll))
      .withColumn("t_curr", sum("n_curr").over(wAll))
      .withColumn("term", (pc - pb) * log(pc / pb))
      .withColumn("psi_total_raw", sum("term").over(wAll))
      .select(col("bucket"), col("n_base"), col("n_curr"),
        round(col("term"), 6).as("psi_term"),
        round(col("psi_total_raw"), 6).as("psi_total"),
        when(col("psi_total_raw") > 0.2, "drift")
          .when(col("psi_total_raw") > 0.1, "moderate")
          .otherwise("stable").as("status"))
      .orderBy("bucket")
  }

  // t09 — schema-change monitor (elementary-style `schema_changes` /
  // a dbt source-schema contract): the CURRENT source schema diffs
  // against the stored BASELINE catalog, METADATA-ONLY — both sides
  // come from resolved schemas (no scan at any data size), the
  // comparison is a full outer join on (table, column). The simulated
  // evolution drops a column, adds one, and narrows a type, so all
  // four verdicts (ok / removed / added / type_changed) materialize;
  // the oracle is the literal verdict matrix.
  val t09: Q = q("t09_schema_drift",
    """SELECT * FROM (VALUES
      |  ('orders_slim', 'o_custkey', 'bigint', NULL, 'removed'),
      |  ('orders_slim', 'o_orderdate', NULL, 'timestamp', 'added'),
      |  ('orders_slim', 'o_orderkey', 'bigint', 'bigint', 'ok'),
      |  ('orders_slim', 'o_totalprice', 'double', 'decimal(14,2)', 'type_changed'))
      |  AS t(table_name, column_name, baseline_type, current_type, status)
      |ORDER BY table_name, column_name""") { c =>
    val v1 = c.orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice"))
    val v2 = c.orders.select(col("o_orderkey"),
      col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(14, 2))
        .as("o_totalprice"),
      col("o_orderdate"))
    graft.core.Docs.schemaDrift(
      graft.core.Docs.schemaFrame(c.spark, "orders_slim", v1),
      graft.core.Docs.schemaFrame(c.spark, "orders_slim", v2))
      .orderBy("table_name", "column_name")
  }

  // t10 — post-clone reconciliation: after the m07-style CI clone,
  // prove the clone by comparing row counts AND an order-independent
  // portable checksum (sum of a per-row polynomial mod a prime — one
  // map-side-combined agg pass per side, engine-portable so the
  // DuckDB oracle recomputes the identical longs). The oracle derives
  // BOTH sides from the base tables — a faithful clone must match it
  // twice over, checksums included.
  val t10: Q = Q("t10_reconciliation", (spark, dir) => {
    val c = Catalog(spark, dir)
    val wh = graft.core.Warehouse.scratch(spark, "t10")
    val tables = Seq(
      ("customer", "c_custkey", "c_name"),
      ("nation", "n_nationkey", "n_name"),
      ("orders", "o_orderkey", "o_orderpriority"),
      ("supplier", "s_suppkey", "s_name"))
    for ((t, _, _) <- tables) wh.write(c.table(t), "prod", t)
    graft.ci.TableCopier(wh, parallelism = 4)
      .copyAll("prod", tables.map(_._1), "ci")
    graft.ci.Reconcile.report(wh, "prod", "prod_ci", tables)
      .orderBy("table_name")
  }, Some {
    def side(t: String, k: String, s: String, as: String) =
      s"(SELECT CAST(SUM(($k % 1000000007) * 2654435761 % 1000000007 + length($s)) AS BIGINT) FROM $t) AS $as"
    val rows = Seq(
      ("customer", "c_custkey", "c_name"),
      ("nation", "n_nationkey", "n_name"),
      ("orders", "o_orderkey", "o_orderpriority"),
      ("supplier", "s_suppkey", "s_name")).map { case (t, k, s) =>
      s"""SELECT '$t' AS table_name,
         |  (SELECT COUNT(*) FROM $t) AS prod_rows,
         |  (SELECT COUNT(*) FROM $t) AS ci_rows,
         |  ${side(t, k, s, "prod_checksum")},
         |  ${side(t, k, s, "ci_checksum")},
         |  true AS rows_match, true AS checksum_match""".stripMargin
    }
    rows.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY table_name")
  })

  // t11 — single-pass OBSERVED metrics: Dataset.observe
  // (CollectMetrics) rides the QC counters on the SAME scan that
  // materializes the model — at 100 TB the difference between "row
  // counts, null rates and sums for free during the write" and a
  // second full pass for monitoring. The entry writes a filtered
  // lineitem slice to scratch (the "model run") and reports exactly
  // the metrics observed during that one pass; the oracle recomputes
  // them with plain aggregates, so the observation pipeline itself is
  // hash-gated.
  val t11: Q = Q("t11_observed_metrics", (spark, dir) => {
    import org.apache.spark.sql.Observation
    val c = Catalog(spark, dir)
    val obs = Observation("t11")
    val slice = c.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType))
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("n_null_qty"),
        sum(col("l_quantity")
          .cast(org.apache.spark.sql.types.DecimalType(8, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("total_qty"))
    val out = graft.core.Scratch.dir("t11_model")
    try {
      slice.write.mode("overwrite").parquet(out.toString)
      val m = obs.get
      def d(k: String): Double = m(k) match {
        case l: java.lang.Long => l.toDouble
        case x: java.lang.Double => x
        case other => sys.error(s"unexpected metric type for $k: $other")
      }
      spark.createDataFrame(Seq(
          ("n_null_qty", d("n_null_qty")),
          ("n_returned", d("n_returned")),
          ("n_rows", d("n_rows")),
          ("total_qty", d("total_qty"))))
        .toDF("metric", "value").orderBy("metric")
    } finally {
      graft.core.Scratch.remove(out)
    }
  }, Some(
    """SELECT * FROM (
      |  SELECT 'n_null_qty' AS metric,
      |    CAST((SELECT COUNT(*) FROM lineitem
      |          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_quantity IS NULL) AS DOUBLE) AS value
      |  UNION ALL SELECT 'n_returned',
      |    CAST((SELECT COUNT(*) FROM lineitem
      |          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_returnflag = 'R') AS DOUBLE)
      |  UNION ALL SELECT 'n_rows',
      |    CAST((SELECT COUNT(*) FROM lineitem
      |          WHERE l_shipdate >= TIMESTAMP '1996-01-01') AS DOUBLE)
      |  UNION ALL SELECT 'total_qty',
      |    CAST((SELECT SUM(CAST(l_quantity AS DECIMAL(8,2))) FROM lineitem
      |          WHERE l_shipdate >= TIMESTAMP '1996-01-01') AS DOUBLE)
      |) ORDER BY metric""".stripMargin.trim))

  // t12 — dbt-utils GENERIC tests: accepted_range + expression_is_true
  // (dbt_utils.accepted_range / dbt_utils.expression_is_true — the two
  // workhorse generics beyond core's four). Each rule is a violation
  // PREDICATE, and all of a table's rules fold into ONE conditional-sum
  // scan (DataQuality.ruleReport) — orders is read once for its two
  // rules, lineitem once for its three; at 100 TB per-rule scans are
  // the difference between one pass and N. NULL handling matches dbt:
  // out-of-range NULLs violate accepted_range, and a NULL assertion is
  // not "true" (three-valued logic) so it violates expression_is_true.
  val t12: Q = q("t12_accepted_range",
    """SELECT * FROM (
      |  SELECT 'range_o_totalprice_0_400k' AS check_name,
      |    (SELECT CAST(COALESCE(SUM(CASE WHEN o_totalprice < 0 OR o_totalprice >= CAST(400000 AS DOUBLE)
      |       OR o_totalprice IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders) AS n_violations
      |  UNION ALL SELECT 'expr_orderdate_before_2001',
      |    (SELECT CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(o_orderdate < TIMESTAMP '2001-01-01', false)
      |       THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders)
      |  UNION ALL SELECT 'range_l_discount_0_008',
      |    (SELECT CAST(COALESCE(SUM(CASE WHEN l_discount < 0 OR l_discount > CAST(0.08 AS DOUBLE)
      |       OR l_discount IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem)
      |  UNION ALL SELECT 'range_l_quantity_1_45',
      |    (SELECT CAST(COALESCE(SUM(CASE WHEN l_quantity < 1 OR l_quantity > CAST(45 AS DOUBLE)
      |       OR l_quantity IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem)
      |  UNION ALL SELECT 'expr_extendedprice_positive',
      |    (SELECT CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(l_extendedprice > 0, false)
      |       THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem)
      |) ORDER BY check_name""") { c =>
    val orders = DataQuality.ruleReport(c.orders, Seq(
      "range_o_totalprice_0_400k" -> DataQuality.acceptedRange(
        col("o_totalprice"), lit(0).cast(DoubleType),
        lit(400000).cast(DoubleType), maxInclusive = false),
      "expr_orderdate_before_2001" -> DataQuality.expressionIsTrue(
        col("o_orderdate") < lit("2001-01-01").cast(TimestampType))))
    val lineitem = DataQuality.ruleReport(c.lineitem, Seq(
      "range_l_discount_0_008" -> DataQuality.acceptedRange(
        col("l_discount"), lit(0).cast(DoubleType), lit(0.08).cast(DoubleType)),
      "range_l_quantity_1_45" -> DataQuality.acceptedRange(
        col("l_quantity"), lit(1).cast(DoubleType), lit(45).cast(DoubleType)),
      "expr_extendedprice_positive" -> DataQuality.expressionIsTrue(
        col("l_extendedprice") > 0)))
    orders.unionAll(lineitem).orderBy("check_name")
  }

  // t13 — the dbt-utils CARDINALITY generics: unique_combination_of_
  // columns (multi-column uniqueness — the grain declaration every
  // mart carries), equal_rowcount (two models must agree on row
  // count — the staging-view-vs-source contract), fewer_rows_than
  // (a dim must stay smaller than its fact), not_constant (a column
  // that collapsed to one value is a broken upstream filter).
  // Cost shape: the combo check is ONE hash aggregation on the grain
  // (map-side combined); the three scalar checks share a single
  // orders aggregate subtree (count + distinct-status in one pass —
  // Catalyst reuses the identical exchange) plus one 1-row aggregate
  // per other table, glued with 1-row crossJoins — no data shuffle
  // beyond the aggregates themselves at any scale.
  val t13: Q = q("t13_cardinality_tests",
    """SELECT * FROM (
      |  SELECT 'equal_rowcount_lineitem_orders' AS check_name,
      |    CAST(ABS((SELECT COUNT(*) FROM orders)
      |      - (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem)) AS BIGINT) AS n_violations
      |  UNION ALL SELECT 'fewer_rows_than_customer_orders',
      |    CAST(CASE WHEN (SELECT COUNT(*) FROM customer)
      |      >= (SELECT COUNT(*) FROM orders) THEN 1 ELSE 0 END AS BIGINT)
      |  UNION ALL SELECT 'not_constant_o_orderstatus',
      |    CAST(CASE WHEN (SELECT COUNT(DISTINCT o_orderstatus) FROM orders)
      |      <= 1 THEN 1 ELSE 0 END AS BIGINT)
      |  UNION ALL SELECT 'unique_combo_custkey_orderdate',
      |    CAST((SELECT COUNT(*) FROM (
      |      SELECT 1 AS one FROM orders GROUP BY o_custkey, o_orderdate
      |      HAVING COUNT(*) > 1)) AS BIGINT)
      |) ORDER BY check_name""") { c =>
    // orders' two scalar facts ride ONE aggregate, frozen eagerly so
    // the three downstream checks consume the 1-row result instead of
    // re-planning (and re-scanning) the aggregate subtree per use —
    // without the checkpoint the Explain audit showed 3 orders scans
    val o = c.orders.agg(count(lit(1)).as("n_orders"),
      countDistinct(col("o_orderstatus")).as("nd_status"))
      .localCheckpoint(true)
    val dupCombos = DataQuality.unique(
        c.orders, Seq("o_custkey", "o_orderdate"))
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("unique_combo_custkey_orderdate").as("check_name"),
        col("n_violations"))
    val equalRc = o.crossJoin(
        c.lineitem.agg(countDistinct(col("l_orderkey")).as("n_line_orders")))
      .select(lit("equal_rowcount_lineitem_orders").as("check_name"),
        abs(col("n_orders") - col("n_line_orders")).as("n_violations"))
    val fewer = o.crossJoin(c.customer.agg(count(lit(1)).as("n_customer")))
      .select(lit("fewer_rows_than_customer_orders").as("check_name"),
        when(col("n_customer") >= col("n_orders"), 1L).otherwise(0L)
          .as("n_violations"))
    val notConst = o
      .select(lit("not_constant_o_orderstatus").as("check_name"),
        when(col("nd_status") <= 1, 1L).otherwise(0L).as("n_violations"))
    equalRc.unionAll(fewer).unionAll(notConst).unionAll(dupCombos)
      .orderBy("check_name")
  }

  // t14 — dbt-utils `sequential_values` over a date series: a daily
  // pipeline that silently skipped a day is the failure volume
  // monitors (t07) can't see once counts recover — the GAP itself is
  // the violation. Deterministic gaps are injected by excluding
  // day-of-month ≡ 3 (mod 11) on both sides; detection is one lag
  // window over the DISTINCT-dates series, which is calendar-bounded
  // (≲366 rows/year — t07's post-aggregate-series rule), so the
  // global ordering costs nothing at any event volume; the raw scan
  // is one pushed-down date projection + distinct.
  val t14: Q = q("t14_sequential_values",
    """WITH days AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS d FROM events
      |  WHERE EXTRACT(DAY FROM ts) % 11 <> 3),
      |gaps AS (SELECT d, LEAD(d) OVER (ORDER BY d) AS next_d FROM days)
      |SELECT d AS gap_start, next_d AS gap_end,
      |  CAST(next_d - d AS BIGINT) - 1 AS missing_days
      |FROM gaps
      |WHERE next_d IS NOT NULL AND CAST(next_d - d AS BIGINT) > 1
      |ORDER BY gap_start""") { c =>
    val days = c.events.filter(dayofmonth(col("ts")) % 11 =!= 3)
      .select(to_date(col("ts")).as("d")).distinct()
    val w = Window.orderBy("d")
    days.withColumn("next_d", lead(col("d"), 1).over(w))
      .filter(col("next_d").isNotNull &&
        datediff(col("next_d"), col("d")) > 1)
      .select(col("d").as("gap_start"), col("next_d").as("gap_end"),
        (datediff(col("next_d"), col("d")) - 1).cast("long")
          .as("missing_days"))
      .orderBy("gap_start")
  }

  // t15 — dbt test SEVERITY + STORE_FAILURES
  // (operators/DataQuality.scala TestConfig/runTests): the first
  // config block a dbt user tunes on the t-layer. Five tests exercise
  // the whole decision space: a clean unique test (pass), a
  // `severity: warn` test whose nonzero count can only WARN (dbt's
  // contract — warn severity never fails a run), a default-severity
  // test that FAILS, an `error_if: >1e6` threshold test whose count
  // clears warn_if but not error_if (→ warn under severity error),
  // and a `store_failures` test whose violating ROWS persist into
  // the dbt_test__audit warehouse schema — the report counts the
  // STORED table, so the hash gate proves the persisted rows are the
  // violations. Statuses are computed IN-PLAN from the counts (the
  // report is one union of per-test aggregates, no driver loop); the
  // oracle recomputes count AND status per test from the same
  // predicates, so classification logic is value-gated, not asserted.
  val t15: Q = Q("t15_test_severity", (spark, dir) => {
    val c = Catalog(spark, dir)
    val wh = graft.core.Warehouse.scratch(spark, "t15")
    DataQuality.runTests(wh, Seq(
      ("error_bigticket_stored",
        c.orders.filter(col("o_totalprice") > 350000.0),
        DataQuality.TestConfig(storeFailures = true)),
      ("error_bigticket_threshold",
        c.orders.filter(col("o_totalprice") > 300000.0),
        DataQuality.TestConfig(warnIf = 0, errorIf = 1000000L)),
      ("error_moderate_discount",
        c.lineitem.filter(col("l_discount") > 0.02),
        DataQuality.TestConfig()),
      ("error_unique_orderkey",
        DataQuality.unique(c.orders, Seq("o_orderkey")),
        DataQuality.TestConfig()),
      ("warn_high_discount",
        c.lineitem.filter(col("l_discount") > 0.05),
        DataQuality.TestConfig(severity = "warn"))))
      .orderBy("check_name")
  }, Some(
    """WITH
      |t1 AS (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > CAST(350000 AS DOUBLE)),
      |t2 AS (SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > CAST(300000 AS DOUBLE)),
      |t3 AS (SELECT COUNT(*) AS n FROM lineitem WHERE l_discount > CAST(0.02 AS DOUBLE)),
      |t4 AS (SELECT COUNT(*) AS n FROM (
      |  SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)),
      |t5 AS (SELECT COUNT(*) AS n FROM lineitem WHERE l_discount > CAST(0.05 AS DOUBLE))
      |SELECT * FROM (
      |  SELECT 'error_bigticket_stored' AS check_name, n AS n_violations,
      |    'error' AS severity,
      |    CASE WHEN n > 0 THEN 'fail' ELSE 'pass' END AS status, true AS stored
      |  FROM t1
      |  UNION ALL SELECT 'error_bigticket_threshold', n, 'error',
      |    CASE WHEN n > 1000000 THEN 'fail' WHEN n > 0 THEN 'warn' ELSE 'pass' END,
      |    false FROM t2
      |  UNION ALL SELECT 'error_moderate_discount', n, 'error',
      |    CASE WHEN n > 0 THEN 'fail' ELSE 'pass' END, false FROM t3
      |  UNION ALL SELECT 'error_unique_orderkey', n, 'error',
      |    CASE WHEN n > 0 THEN 'fail' ELSE 'pass' END, false FROM t4
      |  UNION ALL SELECT 'warn_high_discount', n, 'warn',
      |    CASE WHEN n > 0 THEN 'warn' ELSE 'pass' END, false FROM t5
      |) ORDER BY check_name""".stripMargin.trim))

  // t16 — dbt-utils `mutually_exclusive_ranges`: per-partition
  // interval tables (SCD2 validity windows, booking slots, session
  // spans) must not overlap; gaps and zero-length rows are separately
  // classified (the test's `gaps:` / `zero_length_range_allowed`
  // dials). Intervals here are [l_shipdate, l_shipdate + quantity
  // days] per order — a derivation both engines compute identically
  // that yields real overlaps AND real gaps. Detection is ONE lag
  // window per partition over a totally-ordered (lo, hi, linenumber)
  // sort — O(n log n) within each order's handful of lines, no
  // self-join (the naive pairwise-overlap formulation is quadratic
  // per key and unusable at 100 TB); zero-length is a scan predicate.
  // Touching ranges (lo == prev_hi) are valid, dbt-utils's
  // non-inclusive default.
  val t16: Q = q("t16_mutually_exclusive_ranges",
    """WITH r AS (
      |  SELECT l_orderkey,
      |         l_shipdate AS lo,
      |         l_shipdate + INTERVAL (CAST(l_quantity AS INT)) DAY AS hi,
      |         l_linenumber
      |  FROM lineitem),
      |lagged AS (
      |  SELECT lo, hi,
      |         LAG(hi) OVER (PARTITION BY l_orderkey
      |                       ORDER BY lo, hi, l_linenumber) AS prev_hi
      |  FROM r)
      |SELECT * FROM (
      |  SELECT 'gaps_between_ranges' AS check_name,
      |         (SELECT COUNT(*) FROM lagged
      |          WHERE prev_hi IS NOT NULL AND lo > prev_hi) AS n_violations
      |  UNION ALL SELECT 'overlapping_ranges',
      |         (SELECT COUNT(*) FROM lagged
      |          WHERE prev_hi IS NOT NULL AND lo < prev_hi)
      |  UNION ALL SELECT 'zero_length_ranges',
      |         (SELECT COUNT(*) FROM r WHERE lo >= hi)
      |) ORDER BY check_name""") { c =>
    val r = c.lineitem.select(
      col("l_orderkey"),
      col("l_shipdate").as("lo"),
      timestamp_add("DAY", col("l_quantity").cast("int"), col("l_shipdate"))
        .as("hi"),
      col("l_linenumber"))
    DataQuality.mutuallyExclusiveRanges(r, "lo", "hi",
      partitionBy = Seq("l_orderkey"), tiebreak = Seq("l_linenumber"))
      .orderBy("check_name")
  }

  // t17 — SEASONAL volume anomaly: t07's trailing z-score is
  // weekday-blind, so a quiet-Sunday/busy-Monday corpus flags every
  // Monday. Here each day's count compares against the SAME-WEEKDAY
  // trailing baseline (up to 4 prior same-weekday observations —
  // seasonal-naive, the elementary/Prophet-lite default for weekly
  // seasonality) and flags relative deviations past 50%. Scale
  // shape: identical to t07 — the seasonal window runs over the
  // post-aggregate daily series partitioned by weekday (calendar-
  // bounded, 7 partitions of days), the corpus-sized work is the one
  // map-side-combined groupBy(day).
  val t17: Q = q("t17_seasonal_anomaly",
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
      |  FROM events GROUP BY 1),
      |w AS (SELECT day, CAST(isodow(day) AS INT) AS dow, n_events,
      |  COUNT(*)      OVER sw AS b_n,
      |  SUM(n_events) OVER sw AS b_sum
      |  FROM daily
      |  WINDOW sw AS (PARTITION BY isodow(day) ORDER BY day
      |                ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING))
      |SELECT day, dow, n_events,
      |  ROUND(CASE WHEN b_n >= 2 THEN CAST(b_sum AS DOUBLE) / b_n END, 6) AS baseline,
      |  CASE WHEN b_n < 2 THEN 'insufficient'
      |       WHEN abs(n_events - CAST(b_sum AS DOUBLE) / b_n)
      |            > 0.5 * (CAST(b_sum AS DOUBLE) / b_n) THEN 'anomaly'
      |       ELSE 'ok' END AS status
      |FROM w ORDER BY day""") { c =>
    val daily = c.events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val sw = Window.partitionBy(weekday(col("day")))
      .orderBy("day").rowsBetween(-4, -1)
    val base = col("b_sum").cast(DoubleType) / col("b_n")
    daily
      .withColumn("dow", (weekday(col("day")) + 1).cast("int"))
      .withColumn("b_n", count(lit(1)).over(sw))
      .withColumn("b_sum", sum("n_events").over(sw))
      .select(col("day"), col("dow"), col("n_events"),
        round(when(col("b_n") >= 2, base), 6).as("baseline"),
        when(col("b_n") < 2, "insufficient")
          .when(abs(col("n_events") - base) > lit(0.5) * base, "anomaly")
          .otherwise("ok").as("status"))
      .orderBy("day")
  }

  // t18 — audit-helper RELATION COMPARE (dbt audit_helper.
  // compare_relations — the migration-validation report: "is the
  // rewritten model the same table?"): rows classified
  // identical / differing / only-in-a / only-in-b over the key
  // universe, with each status's share. Drift is injected
  // deterministically (x09's discipline): B drops every key
  // ≡ 7 (mod 101), shifts the price on keys ≡ 3 (mod 97) by an
  // exact double +1.5, and gains synthetic keys (+10M offset) for
  // keys ≡ 11 (mod 103) — so every status class is populated and
  // the oracle can restate the same B. Scale shape: ONE full-outer
  // join on the key carries the whole compare (the irreducible cost
  // of a row-level diff); status derives in-plan, the rollup is 4
  // rows.
  val t18: Q = q("t18_audit_compare",
    """WITH b AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 97 = 3 THEN o_totalprice + 1.5
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 101 <> 7
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
      |    o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 103 = 11),
      |j AS (
      |  SELECT a.o_orderkey IS NOT NULL AS in_a,
      |    b.o_orderkey IS NOT NULL AS in_b,
      |    (a.o_custkey IS NOT DISTINCT FROM b.o_custkey
      |     AND a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus
      |     AND a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice
      |     AND a.o_orderdate IS NOT DISTINCT FROM b.o_orderdate
      |     AND a.o_orderpriority IS NOT DISTINCT FROM b.o_orderpriority) AS same
      |  FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey),
      |s AS (SELECT CASE WHEN in_a AND in_b AND same THEN 'in_both_identical'
      |                  WHEN in_a AND in_b THEN 'in_both_differing'
      |                  WHEN in_a THEN 'only_in_a'
      |                  ELSE 'only_in_b' END AS status FROM j),
      |c AS (SELECT status, COUNT(*) AS n_rows FROM s GROUP BY status),
      |t AS (SELECT SUM(n_rows) AS total FROM c)
      |SELECT status, n_rows,
      |  ROUND(CAST(n_rows AS DOUBLE) / t.total, 6) AS pct
      |FROM c, t ORDER BY status""") { c =>
    val a = c.orders
    val b = a.filter(col("o_orderkey") % 101 =!= 7)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 97 === 3, col("o_totalprice") + 1.5)
          .otherwise(col("o_totalprice")))
      .unionByName(a.filter(col("o_orderkey") % 103 === 11)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    DataQuality.compareRelations(a, b, key = Seq("o_orderkey"))
      .orderBy("status")
  }

  val all: Seq[Q] =
    Seq(t01, t02, t03, t04, t05, t06, t07, t08, t09, t10, t11, t12, t13,
      t14, t15, t16, t17, t18)
}
