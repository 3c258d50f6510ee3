package graft

/** Static lint over the DuckDB oracle SQL strings.
  *
  * DuckDB's SUM over any integer type widens to HUGEINT, and the
  * driver's hash compare is type-aware: a value-identical column that
  * is HUGEINT on the oracle side and BIGINT on the Spark side is a
  * driver-gate FAIL (round 6's x14 red row — the only one on the
  * board). The discipline is `CAST(SUM(x) AS BIGINT)`; this lint makes
  * it structural: any top-level select-list item whose outermost call
  * is an uncast `SUM(` is rejected unless allowlisted here with a
  * reason (DuckDB SUM(DOUBLE) stays DOUBLE, so double-summing items
  * are safe — each allowlisted item is hash-green in the driver gate).
  *
  * Scope: select lists at paren depth 0 (the main query and any UNION
  * branches). CTE-internal sums live at depth >= 1 and are consumed
  * downstream, where arithmetic or explicit casts normalize the type;
  * they are out of scope — if one ever leaks a HUGEINT to the output,
  * tools/check.py's typeclass compare catches it empirically.
  */
class OracleLintSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** query -> normalized select-list items allowed to stay uncast
    * because their SUM argument is DOUBLE-typed (type audited against
    * the parquet schema / generating CTE; hash-green in the driver
    * gate, CORRECTNESS_r06.json).
    */
  private val doubleSumAllow: Map[String, Set[String]] = Map.empty

  /** Positions of a keyword at paren depth 0, outside string literals. */
  private def depth0Spans(sql: String): Seq[(Int, Char)] = {
    val out = Seq.newBuilder[(Int, Char)]
    var depth = 0
    var inStr = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => if (depth == 0) out += ((i, c))
      }
      i += 1
    }
    out.result()
  }

  /** All depth-0 select lists: (start, items). */
  private def topLevelSelectItems(sql: String): Seq[String] = {
    val visible = depth0Spans(sql)
    val d0Text = visible.map(_._2).mkString
    val d0Pos = visible.map(_._1)
    def keywordAt(kw: String): Seq[Int] =
      s"(?i)\\b$kw\\b".r.findAllMatchIn(d0Text).map(_.start).toSeq
    val selects = keywordAt("SELECT")
    val ends = (keywordAt("FROM") ++ keywordAt("ORDER") ++
      keywordAt("UNION") ++ keywordAt("EXCEPT")).sorted
    selects.flatMap { s =>
      val e = ends.find(_ > s).getOrElse(d0Text.length)
      // map back to original offsets so parenthesized sub-exprs are kept
      val from = d0Pos(s) + "SELECT".length
      val to = if (e < d0Pos.length) d0Pos(e) else sql.length
      val list = sql.substring(from, to)
      // split on commas at depth 0 relative to the list
      val items = Seq.newBuilder[String]
      var depth = 0; var inStr = false; var last = 0; var i = 0
      while (i < list.length) {
        val c = list.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else c match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 0 =>
            items += list.substring(last, i); last = i + 1
          case _ =>
        }
        i += 1
      }
      items += list.substring(last)
      items.result().map(_.replaceAll("\\s+", " ").trim)
        .filter(_.nonEmpty)
    }
  }

  test("no uncast SUM in any oracle's top-level select lists") {
    val offenders = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      item <- topLevelSelectItems(sql)
      if item.matches("(?is)^(DISTINCT )?SUM\\s*\\(.*")
      if !doubleSumAllow.getOrElse(name, Set.empty).contains(item)
    } yield s"  $name: $item"
    assert(offenders.isEmpty,
      "uncast top-level SUM(...) — DuckDB widens integer sums to " +
        "HUGEINT and the driver's type-aware hash will red the row " +
        "even when values match. CAST(... AS BIGINT) (or allowlist " +
        "with a type audit if the argument is DOUBLE):\n" +
        offenders.mkString("\n"))
  }

  test("lint self-check: flags the round-6 x14 shape, passes the fix") {
    val pre =
      """WITH s AS (SELECT lang, n_chars FROM documents)
        |SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
    val post = pre.replace("SUM(n_chars) AS",
      "CAST(SUM(n_chars) AS BIGINT) AS")
    assert(topLevelSelectItems(pre)
      .exists(_.matches("(?is)^(DISTINCT )?SUM\\s*\\(.*")))
    assert(!topLevelSelectItems(post)
      .exists(_.matches("(?is)^(DISTINCT )?SUM\\s*\\(.*")))
    // windowed sums are caught too
    assert(topLevelSelectItems(
      "SELECT SUM(n) OVER (ORDER BY d) AS running FROM t")
      .exists(_.matches("(?is)^(DISTINCT )?SUM\\s*\\(.*")))
  }
}
