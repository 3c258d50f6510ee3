package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.Jinja

/** Property fuzz for the Jinja layer (seeded ScalaCheck generators
  * driven directly, PropertySpec's discipline): expansion must be
  * total, brace-clean, and faithful on arbitrary identifier/arg
  * shapes — the properties SqlModel.run's
  * `require(!rendered.contains("{{"))` guard depends on at runtime.
  */
class JinjaPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
  } yield (h :: t).mkString

  // argument text shapes a dbt project actually passes: bare columns,
  // dotted refs, quoted strings (commas inside), nested calls
  private val argText: Gen[String] = Gen.oneOf(
    ident,
    for { a <- ident; b <- ident } yield s"$a.$b",
    ident.map(s => s"'$s,x'"),
    for { f <- ident; a <- ident; b <- ident } yield s"$f($a, $b)")

  test("single-param macro: every region occurrence receives the arg verbatim (modulo unquote)") {
    for (i <- 1 to 40) {
      val mname = sample(ident, 1000 + i)
      val p = sample(ident, 2000 + i)
      val arg = sample(argText, 3000 + i)
      if (mname != p && mname != "var") {
        val mac = Jinja.parseMacros(
          s"{% macro $mname($p) %}A {{ $p }} B {{ $p }} C{% endmacro %}")
        val out = Jinja.expand(s"{{ $mname($arg) }}", mac)
        val v = if (arg.startsWith("'")) arg.stripPrefix("'").stripSuffix("'")
          else arg
        assert(out == s"A $v B $v C", s"macro=$mname p=$p arg=$arg")
      }
    }
  }

  test("expansion never leaves a known-macro call or {% %} block behind") {
    for (i <- 1 to 40) {
      val mname = sample(ident, 4000 + i)
      val p = sample(ident, 5000 + i)
      val a1 = sample(argText, 6000 + i)
      val a2 = sample(argText, 7000 + i)
      if (mname != p && p != "opt" && mname != "var" &&
          !a1.contains(mname) && !a2.contains(mname)) {
        val mac = Jinja.parseMacros(
          s"""{% macro $mname($p, opt=none) %}
             |{% if opt %}W({{ $p }}, {{ opt }}){% else %}P({{ $p }}){% endif %}
             |{% endmacro %}""".stripMargin)
        val plain = Jinja.expand(s"x {{ $mname($a1) }} y", mac)
        val kw = Jinja.expand(s"x {{ $mname($a1, opt=$a2) }} y", mac)
        for (out <- Seq(plain, kw)) {
          assert(!out.contains("{%"), out)
          assert(!out.contains(mname + "("), out)
        }
        assert(plain.contains("P("), plain)
        assert(kw.contains("W("), kw)
      }
    }
  }

  test("two-param macros are capture-free even when an arg names the other param") {
    for (i <- 1 to 40) {
      val p1 = sample(ident, 8000 + i)
      val p2 = sample(ident, 9000 + i)
      if (p1 != p2 && p1 != "m" && p2 != "m") {
        val mac = Jinja.parseMacros(
          s"{% macro m($p1, $p2) %}{{ $p1 }}|{{ $p2 }}{% endmacro %}")
        // the capture case: the first arg is LITERALLY the second
        // param's name — sequential substitution would render 7|7
        val out = Jinja.expand(s"{{ m($p2, 7) }}", mac)
        assert(out == s"$p2|7", s"p1=$p1 p2=$p2")
      }
    }
  }

  test("vars substitute anywhere, defaults hold, expansion is deterministic") {
    for (i <- 1 to 40) {
      val v = sample(ident, 10000 + i)
      val n = sample(Gen.choose(0, 99999), 11000 + i)
      if (v != "var") {
        val sql = s"a {{ var('$v', 1) }} b {{ var('$v') }} c"
        val out = Jinja.expand(sql, vars = Map(v -> n.toString))
        assert(out == s"a $n b $n c")
        assert(Jinja.expand(sql, vars = Map(v -> n.toString)) == out)
        assert(Jinja.expand(s"{{ var('$v', 42) }}") == "42")
      }
    }
  }
}
