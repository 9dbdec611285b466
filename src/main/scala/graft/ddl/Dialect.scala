package graft.ddl

/** Reference-dialect spellings that Spark parses differently — applied to
  * VIEW bodies and ad-hoc statements before they reach Catalyst
  * (docs.feldera.com/docs/sql/grammar.md:403-444 `SELECT * EXCLUDE`,
  * :482-497 UNPIVOT). The rewrite is strictly a spelling map onto Spark's
  * own surface:
  *
  *  - `SELECT * EXCLUDE (a, b)` → Spark's `SELECT * EXCEPT (a, b)`
  *    (the reference treats EXCEPT/EXCLUDE as synonyms after `*`; Spark
  *    only spells EXCEPT). Anchored to a preceding `*` so a function or
  *    column named `exclude` is untouched.
  *  - `UNPIVOT INCLUDING NULLS` / `EXCLUDING NULLS` → Spark's
  *    `UNPIVOT INCLUDE NULLS` / `EXCLUDE NULLS` (same semantics, Calcite
  *    vs Spark participle).
  *
  * Everything else in the grammar (PIVOT, the UNPIVOT measure/axis/IN
  * body, multi-column unpivot values) is spelled identically by both
  * engines and passes through verbatim. String literals are copied
  * through untouched.
  */
object Dialect {

  private val unpivotIncluding =
    """(?is)\bUNPIVOT\s+INCLUDING\s+NULLS\b""".r
  private val unpivotExcluding =
    """(?is)\bUNPIVOT\s+EXCLUDING\s+NULLS\b""".r
  private val starExclude =
    """(?is)(\*\s*)EXCLUDE(\s*\()""".r
  // ROW(expr, …) / ROW(T.*) constructor (grammar.md:430-436) → Spark's
  // struct(...) (same semantics; Spark expands a star inside struct()).
  // Word-bounded + paren-anchored so ROWS frames / ROW_NUMBER survive.
  private val rowCtor = """(?is)\bROW(\s*\()""".r

  def normalize(sql: String): String =
    mapOutsideQuotes(sql) { run =>
      val a = unpivotIncluding.replaceAllIn(run, "UNPIVOT INCLUDE NULLS")
      val b = unpivotExcluding.replaceAllIn(a, "UNPIVOT EXCLUDE NULLS")
      val c = starExclude.replaceAllIn(b, "$1EXCEPT$2")
      rowCtor.replaceAllIn(c, "struct$1")
    }

  /** Apply `f` to the unquoted runs of `s`; single-quoted SQL string
    * literals (with `''` escapes) pass through verbatim.
    */
  private def mapOutsideQuotes(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val run = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuote) {
        out += c
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
            out += '\''; i += 1
          } else inQuote = false
        }
      } else if (c == '\'') {
        out ++= f(run.toString); run.clear()
        out += c
        inQuote = true
      } else run += c
      i += 1
    }
    out ++= f(run.toString)
    out.toString
  }
}
