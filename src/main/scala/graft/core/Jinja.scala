package graft.core

/** The Jinja slice a dbt SQL project actually authors with, rendered
  * as pure parse-time text expansion (reference: the four macro .sql files —
  * `{% macro %}` definitions — plus dbt's `{{ var() }}` project variables):
  *
  *  - `{% macro name(p1, p2=default) %} body {% endmacro %}`
  *    definitions, parsed from macro files or inline in a model;
  *  - `{{ name(arg, kw=value) }}` call expansion — positional and
  *    keyword args, nested calls (a macro body may call another
  *    macro), `{% if param %}…{% else %}…{% endif %}` branches on
  *    argument truthiness (dbt's `partition_by=none` dispatch shape,
  *    reference: macros/calculate_gpa.sql:1-15);
  *  - `{{ var('name') }}` / `{{ var('name', default) }}` resolved
  *    from the run's vars map (dbt `--vars`).
  *
  * Expansion happens at MODEL-CONSTRUCTION time, before ref/source
  * scanning, so (a) a `ref()` inside a macro body contributes DAG
  * edges exactly as dbt's parser sees them, and (b) the expanded text
  * IS the model body — a macro edit therefore changes every calling
  * model's checksum and trips `state:modified` the way dbt's
  * macro-aware manifest diff does. Driver-side string work only;
  * nothing here touches data.
  */
object Jinja {

  /** One `{% macro %}` definition: ordered params, each optionally
    * defaulted (a default of `none` is the Jinja idiom for an
    * optional argument the body branches on).
    */
  final case class MacroDef(name: String,
      params: Seq[(String, Option[String])], body: String)

  private val MacroPat =
    """(?s)\{%-?\s*macro\s+([A-Za-z0-9_]+)\s*\((.*?)\)\s*-?%\}(.*?)\{%-?\s*endmacro\s*-?%\}""".r

  /** Parse every macro definition in `text` (a macro .sql file or a
    * model carrying inline defs).
    */
  def parseMacros(text: String): Seq[MacroDef] =
    MacroPat.findAllMatchIn(text).map { m =>
      val params = splitTopLevel(m.group(2)).filter(_.nonEmpty).map { p =>
        p.split("=", 2) match {
          case Array(k, v) => k.trim -> Some(v.trim)
          case Array(k) => k.trim -> None
        }
      }
      MacroDef(m.group(1), params, m.group(3).trim)
    }.toSeq

  /** `text` with its macro definitions removed (what remains of a
    * model file after its inline defs are hoisted).
    */
  def stripMacros(text: String): String = MacroPat.replaceAllIn(text, "")

  private val VarPat =
    """\{\{\s*var\(\s*'([A-Za-z0-9_]+)'\s*(?:,\s*([^)]*?)\s*)?\)\s*\}\}""".r

  private val MaxDepth = 10

  /** Expand macro calls and `var()` in `sql` to a fixpoint. */
  def expand(sql: String, macros: Seq[MacroDef] = Nil,
      vars: Map[String, String] = Map.empty): String = {
    val byName = macros.map(m => m.name -> m).toMap
    var out = substVars(sql, vars)
    var depth = 0
    var changed = true
    while (changed) {
      require(depth < MaxDepth,
        s"macro expansion exceeded depth $MaxDepth (recursive macro?)")
      val next = expandFor(expandOnce(out, byName, vars), byName.keySet)
      changed = next != out
      out = next
      depth += 1
    }
    // a SELF-call expands to itself in one pass (a stable fixpoint the
    // growth cap above never sees) — any known-macro call surviving
    // the fixpoint is unresolvable recursion, not valid output
    for (name <- byName.keys)
      require(!s"""\\{\\{\\s*$name\\s*\\(""".r.findFirstIn(out).isDefined,
        s"recursive macro '$name' never resolves")
    out
  }

  private def substVars(sql: String, vars: Map[String, String]): String =
    VarPat.replaceAllIn(sql, m => {
      val dflt = Option(m.group(2)).map(unquote)
      val v = vars.get(m.group(1)).orElse(dflt).getOrElse(
        throw new IllegalArgumentException(
          s"undefined var '${m.group(1)}' and no default given"))
      scala.util.matching.Regex.quoteReplacement(v)
    })

  /** One left-to-right pass replacing every `{{ name(...) }}` whose
    * name is a known macro. Hand-scanned (not a regex) because the
    * argument list nests parens and carries quoted strings.
    */
  private def expandOnce(sql: String, macros: Map[String, MacroDef],
      vars: Map[String, String]): String = {
    val callStart = """\{\{\s*([A-Za-z0-9_]+)\s*\(""".r
    val sb = new StringBuilder
    var rest = sql
    var scanning = true
    while (scanning) {
      callStart.findFirstMatchIn(rest) match {
        case None =>
          sb.append(rest); scanning = false
        case Some(mm) =>
          macros.get(mm.group(1)) match {
            case Some(mac) =>
              val argsEnd = matchParen(rest, mm.end - 1)
              val close = rest.indexOf("}}", argsEnd)
              require(close >= 0 &&
                  rest.substring(argsEnd + 1, close).trim.isEmpty,
                s"malformed macro call '{{ ${mm.group(1)}(...) }}'")
              sb.append(rest.substring(0, mm.start))
              sb.append(render(mac,
                splitTopLevel(rest.substring(mm.end, argsEnd)), vars,
                macros.keySet))
              rest = rest.substring(close + 2)
            case None => // a call-shaped brace that is not a macro
              sb.append(rest.substring(0, mm.end))
              rest = rest.substring(mm.end)
          }
      }
    }
    sb.toString
  }

  /** Index of the `)` matching the `(` at `open` (quote-aware). */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  /** Split on top-level commas (quote- and paren-aware). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var quote: Char = 0
    var start = 0
    for (i <- 0 until s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
    }
    val last = s.substring(start).trim
    if (last.nonEmpty || out.nonEmpty) out += last
    out.toSeq.filter(_.nonEmpty)
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '\'' && t.last == '\'') ||
        (t.head == '"' && t.last == '"')))
      t.substring(1, t.length - 1)
    else t
  }

  /** `{% for x in ['a', 'b'] %} body {% endfor %}` — the dbt pivot
    * idiom (generate one aggregate column per list element). The
    * body's loop variable substitutes through the same region rules
    * as macro params (a call region keeps its braces for the next
    * pass, a value renders in place), `{{ loop.index }}` is 1-based,
    * and `{% if [not] loop.first|last %}` resolves per iteration —
    * the trailing-comma idiom. Innermost loops expand first (the
    * body pattern refuses a nested `{% for %}`), and the expand()
    * fixpoint re-runs until none remain, so macros may emit loops
    * and loops may nest.
    */
  private val ForPat =
    // the list group refuses `]` so a failed body match (nested for)
    // cannot backtrack the list across the closing bracket and
    // swallow the inner loop's header
    ("""(?s)\{%-?\s*for\s+([A-Za-z_][A-Za-z0-9_]*)\s+in\s+\[([^\]]*)\]\s*-?%\}""" +
      """((?:(?!\{%-?\s*for\s).)*?)\{%-?\s*endfor\s*-?%\}""").r

  private val LoopIfPat =
    """(?s)\{%-?\s*if\s+(not\s+)?loop\.(first|last)\s*-?%\}(.*?)(?:\{%-?\s*else\s*-?%\}(.*?))?\{%-?\s*endif\s*-?%\}""".r

  private def expandFor(sql: String, macroNames: Set[String]): String =
    ForPat.replaceAllIn(sql, fm => {
      val ident = fm.group(1)
      val items = splitTopLevel(fm.group(2))
      val body = fm.group(3)
      val rendered = items.zipWithIndex.map { case (raw, idx) =>
        val first = idx == 0
        val last = idx == items.size - 1
        val branched = LoopIfPat.replaceAllIn(body, m => {
          val v = if (m.group(2) == "last") last else first
          val take = if (m.group(1) != null) !v else v
          scala.util.matching.Regex.quoteReplacement(
            if (take) m.group(3) else Option(m.group(4)).getOrElse(""))
        })
        val indexed = branched.replaceAll(
          """\{\{\s*loop\.index\s*\}\}""", (idx + 1).toString)
        substRegions(indexed, Map(ident -> Some(raw)), macroNames)
      }.mkString("")
      // no trim: iteration boundaries carry meaningful separators
      // (a nested loop's trailing space/newline is the outer join)
      scala.util.matching.Regex.quoteReplacement(rendered)
    })

  /** Jinja truthiness for `{% if param %}`: absent, `none`, `false`,
    * and the empty string are false; any other value is true.
    */
  private def truthy(v: Option[String]): Boolean =
    v.map(_.trim.toLowerCase).exists(t =>
      t.nonEmpty && t != "none" && t != "false")

  private val IfPat =
    """(?s)\{%-?\s*if\s+([A-Za-z0-9_]+)\s*-?%\}(.*?)(?:\{%-?\s*else\s*-?%\}(.*?))?\{%-?\s*endif\s*-?%\}""".r

  /** Render one macro call: bind positional then keyword args over
    * the declared params (defaults fill the rest), evaluate
    * `{% if param %}` branches on the BINDING (Jinja tests the value,
    * not the substituted text), then substitute `{{ param }}`.
    */
  private def render(mac: MacroDef, args: Seq[String],
      vars: Map[String, String], macroNames: Set[String]): String = {
    val (positional, keyword) = args.partition(a =>
      !a.matches("""(?s)[A-Za-z0-9_]+\s*=[^=].*"""))
    require(positional.size <= mac.params.size,
      s"macro ${mac.name}: ${positional.size} positional args for " +
        s"${mac.params.size} params")
    val kw = keyword.map { a =>
      val Array(k, v) = a.split("=", 2)
      k.trim -> v.trim
    }.toMap
    // a misspelled keyword would otherwise fall back to the param's
    // default and SILENTLY select the wrong {% if %} branch — Jinja
    // errors on unexpected kwargs, so do we
    val unknown = kw.keySet -- mac.params.map(_._1).toSet
    require(unknown.isEmpty,
      s"macro ${mac.name}: unknown keyword argument(s) ${unknown.mkString(", ")}")
    val bound: Map[String, Option[String]] = mac.params.zipWithIndex.map {
      case ((p, dflt), i) =>
        val v = if (i < positional.size) Some(positional(i))
          else kw.get(p).orElse(dflt)
        require(v.isDefined, s"macro ${mac.name}: missing argument '$p'")
        p -> v
    }.toMap
    val branched = IfPat.replaceAllIn(mac.body, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (truthy(bound.getOrElse(m.group(1), None))) m.group(2)
        else Option(m.group(3)).getOrElse("")))
    substVars(substRegions(branched, bound, macroNames), vars).trim
  }

  /** Params (and loop variables) are VARIABLES inside `{{ … }}`
    * expressions (Jinja scope): `{{ p }}` renders the value, and
    * `{{ other_macro(p) }}` passes it through a nested call. So
    * substitution works per-region — bare identifiers inside each
    * region get the raw bound text; a region that is then a call
    * keeps its braces for the next expansion pass, a plain value
    * renders in place (quotes stripped: Jinja prints the string's
    * value, not its literal).
    */
  private def substRegions(text: String,
      bound: Map[String, Option[String]], macroNames: Set[String]): String = {
    val RegionPat = """(?s)\{\{(.*?)\}\}""".r
    val Ident = """[A-Za-z_][A-Za-z0-9_]*""".r
    RegionPat.replaceAllIn(text, rm => {
      val raw = rm.group(1).trim
      // a bare identifier that nothing here binds: a LATER pass owns
      // it (a loop variable inside a macro body expands at expandFor
      // time; a truly undefined name stays visibly braced for
      // SqlModel's no-residual-braces require). Decided on the
      // ORIGINAL region text — a bound param whose VALUE happens to
      // be identifier-shaped must still render in place. loop.*
      // attributes are owned by expandFor the same way: a macro that
      // EMITS a {% for %} body carries {{ loop.index }} through this
      // pass braced, or expandFor's textual replacement never fires.
      if (raw != "this" && (raw.matches("""[A-Za-z_][A-Za-z0-9_]*""") ||
            raw.matches("""loop\.(index|first|last)""")) &&
          !bound.contains(raw))
        scala.util.matching.Regex.quoteReplacement(s"{{ $raw }}")
      else {
        // SIMULTANEOUS substitution (one identifier pass, not a fold):
        // sequential replacement would let an earlier param's
        // substituted value be captured by a later param's name — e.g.
        // m(a, b) called as m(b, 2) must render `b + 2`, never `2 + 2`
        val expr = Ident.replaceAllIn(raw, im =>
          scala.util.matching.Regex.quoteReplacement(
            bound.get(im.group(0)).flatten.getOrElse(im.group(0))))
        val callName = """^([A-Za-z0-9_]+)\s*\(""".r
          .findFirstMatchIn(expr).map(_.group(1))
        scala.util.matching.Regex.quoteReplacement(
          // braces survive for anything a LATER pass resolves: a
          // nested macro, var() (substVars), and the model-render
          // layer's own calls — ref()/source()/{{ this }} inside a
          // macro body must reach SqlModel.run braced or the dep scan
          // loses the DAG edge and the SQL goes out invalid; any
          // other call-shaped text is the arg's own SQL, rendered
          // as-is
          if (callName.exists(n => macroNames(n) || n == "var" ||
              n == "ref" || n == "source") || expr == "this")
            s"{{ $expr }}"
          else unquote(expr))
      }
    })
  }
}
