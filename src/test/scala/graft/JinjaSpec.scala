package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Jinja

/** core/Jinja.scala — the parse-time macro/var expansion dbt SQL
  * projects author with. Pure string tests, no Spark session.
  */
class JinjaSpec extends AnyFunSuite {

  private val gpc = Jinja.parseMacros(
    """{% macro grade_point_calculator(grade_column) %}
      |case when {{ grade_column }} = 'A' then 4.0
      |     when {{ grade_column }} in ('F', 'WF') then 0.0
      |     else null end
      |{% endmacro %}""".stripMargin)

  test("macro parse: name, params, body") {
    assert(gpc.size == 1)
    assert(gpc.head.name == "grade_point_calculator")
    assert(gpc.head.params == Seq("grade_column" -> None))
    assert(gpc.head.body.contains("case when"))
  }

  test("call expansion substitutes the argument text everywhere") {
    val out = Jinja.expand(
      "SELECT {{ grade_point_calculator(g.grade) }} AS pts FROM g", gpc)
    assert(out.contains("g.grade = 'A'"))
    assert(out.contains("g.grade in ('F', 'WF')"))
    assert(!out.contains("{{"))
  }

  private val gpa = Jinja.parseMacros(
    """{% macro calculate_gpa(points, credits, partition_by=none) %}
      |{% if partition_by %}
      |round(sum({{ points }} * {{ credits }}) over (partition by {{ partition_by }}) /
      |  nullif(sum({{ credits }}) over (partition by {{ partition_by }}), 0), 2)
      |{% else %}
      |round(sum({{ points }} * {{ credits }}) / nullif(sum({{ credits }}), 0), 2)
      |{% endif %}
      |{% endmacro %}""".stripMargin)

  test("defaulted none param takes the else branch (the reference's calculate_gpa shape)") {
    val out = Jinja.expand("{{ calculate_gpa(pts, cr) }}", gpa)
    assert(out.contains("round(sum(pts * cr) / nullif(sum(cr), 0), 2)"))
    assert(!out.contains("partition by"))
  }

  test("keyword arg flips the if branch and substitutes into the window") {
    val out = Jinja.expand("{{ calculate_gpa(pts, cr, partition_by='sid') }}", gpa)
    assert(out.contains("over (partition by sid)"))
    assert(!out.contains("{%"))
  }

  test("nested macro calls expand to a fixpoint") {
    val macros = gpc ++ Jinja.parseMacros(
      """{% macro avg_points(g) %}avg({{ grade_point_calculator(g) }}){% endmacro %}""")
    val out = Jinja.expand("SELECT {{ avg_points(x.grade) }} FROM x", macros)
    assert(out.contains("avg(case when x.grade = 'A'"))
  }

  test("recursive macros are rejected, not looped") {
    // stable self-call: the one-pass fixpoint the growth cap never
    // trips — caught by the unresolved-call post-check instead
    val rec = Jinja.parseMacros(
      "{% macro loop_forever(x) %}{{ loop_forever(x) }}{% endmacro %}")
    val e = intercept[IllegalArgumentException](
      Jinja.expand("{{ loop_forever(1) }}", rec))
    assert(e.getMessage.toLowerCase.contains("recursive"))
    // growing self-call: trips the depth cap
    val grow = Jinja.parseMacros(
      "{% macro f(x) %}{{ x }} + {{ f(x) }}{% endmacro %}")
    val e2 = intercept[IllegalArgumentException](
      Jinja.expand("{{ f(1) }}", grow))
    assert(e2.getMessage.contains("depth") ||
      e2.getMessage.toLowerCase.contains("recursive"))
  }

  test("args with nested parens and quoted commas split correctly") {
    val m = Jinja.parseMacros(
      "{% macro two(a, b) %}[{{ a }}|{{ b }}]{% endmacro %}")
    val out = Jinja.expand("{{ two(coalesce(x, y), 'lit,eral') }}", m)
    assert(out == "[coalesce(x, y)|lit,eral]")
  }

  test("var(): map value wins, default fills, missing-with-no-default throws") {
    assert(Jinja.expand("WHERE y >= {{ var('min_year') }}",
      vars = Map("min_year" -> "1996")) == "WHERE y >= 1996")
    assert(Jinja.expand("WHERE y >= {{ var('min_year', 1990) }}")
      == "WHERE y >= 1990")
    assert(Jinja.expand("seg = {{ var('seg', 'BUILDING') }}")
      == "seg = BUILDING")
    val e = intercept[IllegalArgumentException](
      Jinja.expand("{{ var('nope') }}"))
    assert(e.getMessage.contains("nope"))
  }

  test("stripMacros removes inline defs, leaves the model text") {
    val text = "SELECT 1\n{% macro m(x) %}{{ x }}{% endmacro %}\nFROM t"
    assert(Jinja.stripMacros(text).trim == "SELECT 1\n\nFROM t".trim)
  }

  test("non-macro call-shaped text (source/ref) passes through untouched") {
    val sql = "SELECT * FROM {{ source('raw', 'orders') }} JOIN {{ ref('m1') }}"
    assert(Jinja.expand(sql, gpc) == sql)
  }

  test("ref()/source()/this INSIDE a macro body keep their braces for the model layer") {
    val m = Jinja.parseMacros(
      """{% macro latest(t) %}(SELECT * FROM {{ ref(t) }}
        |WHERE ts = (SELECT MAX(ts) FROM {{ this }})){% endmacro %}""".stripMargin)
    val out = Jinja.expand("{{ latest('stg_x') }}", m)
    // the param substituted INTO the braced ref call, braces intact —
    // SqlModel's dep scan and view binding must still see them
    assert(out.contains("{{ ref('stg_x') }}"), out)
    assert(out.contains("{{ this }}"), out)
    val srcM = Jinja.parseMacros(
      "{% macro raw(t) %}{{ source('raw', t) }}{% endmacro %}")
    assert(Jinja.expand("{{ raw('orders') }}", srcM)
      == "{{ source('raw', 'orders') }}")
  }

  test("simultaneous param substitution: an arg named like a later param is never re-substituted") {
    val m = Jinja.parseMacros(
      "{% macro m(a, b) %}{{ a }} + {{ b }}{% endmacro %}")
    // arg for `a` is literally the identifier `b`: sequential
    // substitution would render 2 + 2
    assert(Jinja.expand("{{ m(b, 2) }}", m) == "b + 2")
  }

  test("unknown keyword arguments are rejected, not silently defaulted") {
    val e = intercept[IllegalArgumentException](
      Jinja.expand("{{ calculate_gpa(p, c, partiton_by='sid') }}", gpa))
    assert(e.getMessage.contains("partiton_by"))
  }

  test("for: substitutes the loop var, loop.index, and the not-loop.last separator") {
    val out = Jinja.expand(
      "{% for s in ['a', 'b', 'c'] %}col_{{ s }} AS c{{ loop.index }}{% if not loop.last %}, {% endif %}{% endfor %}")
    assert(out == "col_a AS c1, col_b AS c2, col_c AS c3")
  }

  test("for: loop.first branch and else arm") {
    val out = Jinja.expand(
      "{% for s in ['x', 'y'] %}{% if loop.first %}F{% else %}R{% endif %}{{ s }} {% endfor %}")
    assert(out.trim == "Fx Ry")
  }

  test("for inside a macro body: the loop var survives render braced, expands one pass later") {
    val m = Jinja.parseMacros(
      """{% macro pivot(c) %}{% for v in ['o', 'f'] %}SUM(CASE WHEN {{ c }} = '{{ v }}' THEN 1 END) AS n_{{ v }}{% if not loop.last %}, {% endif %}{% endfor %}{% endmacro %}""")
    val out = Jinja.expand("SELECT {{ pivot(st) }} FROM t", m)
    assert(out ==
      "SELECT SUM(CASE WHEN st = 'o' THEN 1 END) AS n_o, SUM(CASE WHEN st = 'f' THEN 1 END) AS n_f FROM t")
  }

  test("loop.index/loop.first inside a macro body survive render braced, expand with the for") {
    // regression: substRegions used to unquote 'loop.index' (not a
    // bare identifier, not a preserved call), stripping the braces
    // before expandFor could substitute it — silently invalid SQL
    // that bypassed the no-residual-braces guard
    val m = Jinja.parseMacros(
      """{% macro idx(c) %}{% for v in ['a', 'b'] %}{% if loop.first %}/*h*/{% endif %}{{ c }}_{{ v }} AS c{{ loop.index }}{% if not loop.last %}, {% endif %}{% endfor %}{% endmacro %}""")
    val out = Jinja.expand("SELECT {{ idx(x) }} FROM t", m)
    assert(out == "SELECT /*h*/x_a AS c1, x_b AS c2 FROM t", out)
  }

  test("nested for: innermost expands first, outer var reaches the inner body") {
    val out = Jinja.expand(
      "{% for a in ['1', '2'] %}{% for b in ['x', 'y'] %}{{ a }}{{ b }} {% endfor %}{% endfor %}")
    assert(out.trim == "1x 1y 2x 2y")
  }

  test("for: a ref() inside the body keeps braces for the model layer") {
    val out = Jinja.expand(
      "{% for t in ['u'] %}SELECT * FROM {{ ref(t) }}{% endfor %}")
    // the item's quotes ride along into the call, exactly as a macro
    // arg's do (cf. the ref('stg_x') test above)
    assert(out.trim == "SELECT * FROM {{ ref('u') }}")
  }
}
