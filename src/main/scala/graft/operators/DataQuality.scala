package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt data tests as reusable DataFrame operators. Each check returns
  * the VIOLATING rows (dbt's contract: a test passes when its query
  * returns zero rows — reference: the not_null/unique/accepted_values/
  * relationships tests in models/staging/sources.yml and
  * macros/test_referential_integrity.sql).
  *
  * Scale: not_null / accepted_values are pure scans (predicate reaches
  * the parquet reader); unique is one hash aggregation on the key;
  * relationships is a broadcast/shuffle anti-join — all embarrassingly
  * parallel, no windows, no driver-side data.
  */
object DataQuality {

  /** Rows where any of `cols` is NULL. */
  def notNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(c => col(c).isNull).reduce(_ || _))

  /** Key values appearing more than once (the duplicated keys with
    * their multiplicity, not the raw rows — bounded output).
    */
  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Rows whose `c` is outside the accepted set (NULL counts as a
    * violation, matching dbt's accepted_values on a non-null column).
    */
  def acceptedValues(df: DataFrame, c: String, accepted: Seq[String]): DataFrame =
    df.filter(!col(c).isin(accepted: _*) || col(c).isNull)

  /** Child rows whose foreign key has no match in the parent —
    * referential-integrity violations via left-anti join.
    */
  def relationships(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey)),
        col(childKey) === col(parentKey), "left_anti")

  /** dbt "singular" test: ANY query's rows are the violations — the
    * escape hatch for cross-model assertions no generic test shape
    * covers (reference: tests/test_financial_consistency.sql,
    * tests/test_enrollment_integrity.sql — arbitrary SQL joining
    * several models, failing when rows come back). Pairs with
    * [[summarize]] exactly like the generic checks.
    */
  def singular(name: String, violations: DataFrame): (String, DataFrame) =
    name -> violations

  /** dbt-utils `mutually_exclusive_ranges`: per-partition interval
    * tables (SCD2 validity windows, booking slots) must not overlap.
    * Returns the standard (check_name, n_violations) summary with the
    * test's three classifications — `overlapping_ranges` (lo strictly
    * inside the previous range: touching lo == prev_hi is VALID, the
    * non-inclusive default), `gaps_between_ranges` (lo strictly past
    * prev_hi — the `gaps: not_allowed` dial), `zero_length_ranges`
    * (lo >= hi — `zero_length_range_allowed: false`).
    *
    * Scale: ONE lag window per partition over a totally-ordered
    * (lo, hi, tiebreak*) sort — a single shuffle on the partition
    * keys — never the naive pairwise-overlap self-join, which is
    * quadratic per key and unusable at 100 TB; zero-length is a scan
    * predicate. `tiebreak` must complete a total order so lag is
    * deterministic across engines.
    */
  def mutuallyExclusiveRanges(df: DataFrame, lo: String, hi: String,
      partitionBy: Seq[String], tiebreak: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionBy.map(col): _*)
      .orderBy((Seq(lo, hi) ++ tiebreak).map(col): _*)
    val lagged = df.withColumn("prev_hi", lag(col(hi), 1).over(w))
    summarize(Seq(
      "gaps_between_ranges" ->
        lagged.filter(col("prev_hi").isNotNull && col(lo) > col("prev_hi")),
      "overlapping_ranges" ->
        lagged.filter(col("prev_hi").isNotNull && col(lo) < col("prev_hi")),
      "zero_length_ranges" -> df.filter(col(lo) >= col(hi))))
  }

  /** One (check_name, n_violations) row per named check — the test
    * summary a CI run reports. Stays distributed: each count is an
    * aggregate, the union is a plan over all of them.
    */
  def summarize(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, violations) =>
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_ unionAll _)

  /** dbt-utils `accepted_range`: values outside [min, max] (bound
    * inclusivity per flag) or NULL violate. Returns the violation
    * PREDICATE so rules compose into [[ruleReport]]'s one-scan form.
    */
  def acceptedRange(c: Column, min: Column, max: Column,
      minInclusive: Boolean = true, maxInclusive: Boolean = true): Column = {
    val belowMin = if (minInclusive) c < min else c <= min
    val aboveMax = if (maxInclusive) c > max else c >= max
    belowMin || aboveMax || c.isNull
  }

  /** dbt-utils `expression_is_true`: rows where the asserted
    * expression is false OR null violate (SQL's three-valued trap:
    * a NULL comparison is not "true", so it must count).
    */
  def expressionIsTrue(assertion: Column): Column =
    !coalesce(assertion, lit(false))

  /** dbt test config block (severity / warn_if / error_if /
    * store_failures — the first knobs a dbt user tunes on a test):
    *
    *  - `severity: warn` can never fail a run — its worst outcome is
    *    a warning (dbt's documented contract);
    *  - `errorIf` / `warnIf` are the `error_if: ">N"` / `warn_if:
    *    ">N"` thresholds on the failure count (dbt's default for both
    *    is `>0`): with `severity: error`, error_if is evaluated
    *    first, then warn_if — a count over neither threshold passes;
    *  - `storeFailures` persists the violating ROWS as a warehouse
    *    table in the `dbt_test__audit` schema (dbt
    *    `store_failures: true`), so a failure is debuggable from the
    *    stored rows instead of re-running the test query.
    */
  final case class TestConfig(severity: String = "error",
      warnIf: Long = 0, errorIf: Long = 0, storeFailures: Boolean = false) {
    require(severity == "error" || severity == "warn",
      s"severity must be error|warn, got '$severity'")
  }

  /** The audit schema store_failures writes into (dbt's
    * `dbt_test__audit` convention).
    */
  val auditSchema = "dbt_test__audit"

  /** Run configured tests: one (check_name, n_violations, severity,
    * status, stored) row per test. A store_failures test persists its
    * violating rows FIRST and counts the stored table — one
    * computation of the violations either way; non-stored tests count
    * distributed without materializing. Each violations frame is an
    * arbitrary query (generic or singular), so the counts stay
    * per-test aggregates like [[summarize]]'s.
    */
  def runTests(wh: graft.core.Warehouse,
      tests: Seq[(String, DataFrame, TestConfig)]): DataFrame = {
    require(tests.nonEmpty, "runTests needs at least one test")
    tests.map { case (name, violations, cfg) =>
      // stored tests count their PERSISTED rows (write once, count
      // the parquet — the stored table is the single computation of
      // the violations); everything else stays a lazy aggregate in
      // the one unioned report plan, like summarize
      val base =
        if (cfg.storeFailures) {
          wh.write(violations, auditSchema, name)
          wh.read(auditSchema, name)
        } else violations
      base.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"),
          lit(cfg.severity).as("severity"),
          when(lit(cfg.severity) === "error" &&
              col("n_violations") > cfg.errorIf, "fail")
            .when(col("n_violations") > cfg.warnIf, "warn")
            .otherwise("pass").as("status"),
          lit(cfg.storeFailures).as("stored"))
    }.reduce(_ unionAll _)
  }

  /** Many rules over ONE table in ONE scan: each rule is a violation
    * predicate folded into a conditional sum, then the 1-row wide
    * aggregate explodes into (check_name, n_violations) rows. vs
    * [[summarize]] (one aggregate subtree per check — fine across
    * DIFFERENT tables) this reads the table once no matter how many
    * rules it carries, which is the difference between one and N
    * full scans at 100 TB.
    */
  def ruleReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "ruleReport needs at least one rule")
    val sums = rules.map { case (name, viol) =>
      coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L)).as(name)
    }
    df.agg(sums.head, sums.tail: _*)
      .select(explode(array(rules.map { case (name, _) =>
        struct(lit(name).as("check_name"), col(name).as("n_violations"))
      }: _*)).as("r"))
      .select(col("r.check_name"), col("r.n_violations"))
  }

  /** audit-helper-style relation compare (dbt `audit_helper.
    * compare_relations` — the migration-validation report: "is the
    * rewritten model the same table?"): key-matched rows classified
    * identical / differing (null-safe equality over every non-key
    * column), unmatched rows attributed to their side; one summary
    * row per status with its share of the key universe.
    *
    * Scale shape: ONE full-outer shuffle join on the key carries the
    * whole compare; the status is derived in-plan (no per-column
    * re-scan), the rollup is 4 rows, and the share divides by a
    * broadcast 1-row total. At 100 TB this is the plan you want —
    * the join is the irreducible cost of a row-level diff.
    */
  def compareRelations(a: DataFrame, b: DataFrame,
      key: Seq[String]): DataFrame = {
    val dataCols = a.columns.filterNot(key.contains).toSeq
    val aP = a.withColumn("_in_a", lit(true))
    val bP = dataCols.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"_b_$c"))
      .withColumn("_in_b", lit(true))
    val same = dataCols
      .map(c => col(c) <=> col(s"_b_$c"))
      .reduce(_ && _)
    val status =
      when(col("_in_a") && col("_in_b"),
        when(same, "in_both_identical").otherwise("in_both_differing"))
        .when(col("_in_a"), "only_in_a")
        .otherwise("only_in_b")
    val s = aP.join(bP, key, "full_outer").select(status.as("status"))
    val counts = s.groupBy("status").agg(count(lit(1)).as("n_rows"))
      .localCheckpoint(true) // 4 rows; 2 consumers (total + output)
    val total = counts.agg(sum("n_rows").as("_total"))
    counts.crossJoin(broadcast(total))
      .select(col("status"), col("n_rows"),
        round(col("n_rows").cast(org.apache.spark.sql.types.DoubleType)
          / col("_total"), 6).as("pct"))
  }
}
