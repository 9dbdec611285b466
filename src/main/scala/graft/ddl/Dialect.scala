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
  // anchored to a select-item star (after SELECT/comma/a qualifying
  // dot) so a multiplication by a function named `exclude`
  // (`price * exclude(r)`) is untouched
  private val starExclude =
    """(?is)((?:\bSELECT\s+(?:DISTINCT\s+)?|,\s*|\.\s*)\*\s*)EXCLUDE(\s*\()""".r
  // ROW(expr, …) / ROW(T.*) constructor (grammar.md:430-436) → Spark's
  // struct(...) (same semantics; Spark expands a star inside struct()).
  // Word-bounded + paren-anchored so ROWS frames / ROW_NUMBER survive.
  private val rowCtor = """(?is)\bROW(\s*\()""".r
  // CROSS APPLY / OUTER APPLY (grammar.md tableExpression) → Spark's
  // lateral joins: CROSS APPLY ≡ CROSS JOIN LATERAL (inner, row dropped
  // when the applied subquery is empty); OUTER APPLY ≡ LEFT OUTER JOIN
  // LATERAL … ON TRUE (null-extended when empty) — the ON TRUE is
  // spliced in after the applied subquery's alias by a paren-balanced
  // scan, since Spark's LEFT JOIN grammar requires a join condition.
  private val crossApply = """(?is)\bCROSS\s+APPLY\b""".r
  private val outerApply = """(?is)\bOUTER\s+APPLY\b""".r
  // ANSI FETCH spelling (grammar.md:343) → Spark's LIMIT; the count
  // defaults to 1 when omitted. The combined `OFFSET n ROWS FETCH …`
  // form must swap to Spark's `LIMIT k OFFSET n` clause order; a lone
  // `OFFSET n ROWS` just drops the ROWS word.
  private val offsetFetchRows =
    ("""(?is)\bOFFSET\s+(\d+)\s+ROWS?\s+""" +
      """FETCH\s+(?:FIRST|NEXT)\s+(?:(\d+)\s+)?ROWS?\s+ONLY""").r
  private val fetchRows =
    """(?is)\bFETCH\s+(?:FIRST|NEXT)\s+(?:(\d+)\s+)?ROWS?\s+ONLY""".r
  private val offsetRows = """(?is)\bOFFSET\s+(\d+)\s+ROWS?\b""".r
  // `LIMIT start, count` (grammar.md:341 — the MySQL-style pair) →
  // Spark's LIMIT count OFFSET start; `LIMIT ALL` (no limit) drops.
  private val limitStartCount =
    """(?is)\bLIMIT\s+(\d+)\s*,\s*(\d+)""".r
  private val limitAll = """(?is)\s*\bLIMIT\s+ALL\b""".r
  // Postgres also accepts the clauses in OFFSET-first order
  private val offsetLimit =
    """(?is)\bOFFSET\s+(\d+)\s+LIMIT\s+(\d+)\b""".r
  // LOGICAL_AND / LOGICAL_OR (aggregates.md:90,441 — synonyms of
  // BOOL_AND/BOOL_OR; Spark spells only the BOOL_ forms natively)
  private val logicalAgg = """(?is)\bLOGICAL_(AND|OR)(\s*\()""".r
  // SAFE_CAST(x AS t) (casts.md:77 — CAST returning NULL on failure) is
  // Spark's TRY_CAST, spelled differently
  private val safeCast = """(?is)\bSAFE_CAST(\s*\()""".r
  // the reference's VARCHAR is unlimited (types.md); Spark's bare
  // VARCHAR demands a length, so the un-parenthesized type spelling
  // maps to STRING (VARCHAR(n) stays — Spark accepts it); same for a
  // bare CHAR → CHAR(1), the SQL default length
  private val bareVarchar = """(?is)\bVARCHAR\b(?!\s*\()""".r
  private val bareChar = """(?is)\bCHAR\b(?!\s*\()""".r

  /** Bare VARCHAR/CHAR type spellings → Spark's (the caller guarantees
    * an unquoted fragment); shared with the CREATE FUNCTION
    * params/RETURNS path in the runtime.
    */
  private[graft] def mapBareTypes(s: String): String = {
    val base = bareChar.replaceAllIn(
      bareVarchar.replaceAllIn(s, "STRING"), "CHAR(1)")
    // `T ARRAY` postfix array type (types.md) → Spark's ARRAY<T>
    ("""(?i)\b(STRING|INT|INTEGER|BIGINT|SMALLINT|TINYINT|DOUBLE|""" +
      """FLOAT|REAL|BOOLEAN|DATE|TIMESTAMP|""" +
      """DECIMAL(?:\(\d+(?:,\s*\d+)?\))?)\s+ARRAY\b""").r
      .replaceAllIn(base, m => "ARRAY<" + m.group(1) + ">")
  }

  def normalize(sql: String): String = normalize(sql, adHoc = false)

  /** Opt-in for the quadratic ASOF LATERAL fallback (scoped to one
    * normalize call; `SET asof_lateral_fallback = ON` in a program
    * threads it here). Default OFF: an ASOF shape the union+window
    * lowering cannot prove is a loud error, not a silent planner-
    * quadratic plan — a batch job never reads a stderr note.
    */
  private val asofLateralOptIn = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  def normalize(sql: String, adHoc: Boolean,
      asofLateralFallback: Boolean): String = {
    val prev = asofLateralOptIn.get
    asofLateralOptIn.set(asofLateralFallback)
    try normalize(sql, adHoc) finally asofLateralOptIn.set(prev)
  }

  /** @param adHoc true for interactive statements (not view bodies) —
    *   a DISTINCT ON's trailing ORDER BY is then kept (the user asked
    *   for a presentation order; in a view body relations are
    *   unordered Z-sets and a pure-ordering tail may name unprojected
    *   columns, so it is dropped).
    */
  def normalize(sql: String, adHoc: Boolean): String =
    escapeLiteralBackslashes(rewriteDistinctOn(rewriteAsofJoin(rewriteQualify(rewriteOuterApply(rewritePeriodPredicates(rewriteScalarTumble(rewriteWindowTvf(rewriteFloorCeilTo(rewriteDateTrunc(rewriteExtract(rewriteDatePart(rewriteTruncate1(rewriteCharCast(rewriteBinaryCast(rewriteSubstringFromFor(rewriteGroupingSetsWrap(rewriteTimeTsLiterals(rewriteCalciteLiterals(dispatchArityAll(mapOutsideQuotes(rewriteHints(rewriteQuotedIdents(rewriteArrayBrackets(singularizeIntervalUnits(rewriteUnicodeStringLiterals(stripComments(sql))))))) { run =>
      val a = unpivotIncluding.replaceAllIn(run, "UNPIVOT INCLUDE NULLS")
      val b = unpivotExcluding.replaceAllIn(a, "UNPIVOT EXCLUDE NULLS")
      val c0 = starExclude.replaceAllIn(b, "$1EXCEPT$2")
      // Calcite tolerates duplicates in the EXCLUDE list; Spark's
      // EXCEPT list must be distinct (quidem SelectTests testExclude)
      val c = """(?i)(\*\s*EXCEPT\s*\()([^()]*)(\))""".r
        .replaceAllIn(c0, m => java.util.regex.Matcher.quoteReplacement(
          m.group(1) + m.group(2).split(",").map(_.trim)
            .filter(_.nonEmpty).distinct.mkString(", ") + m.group(3)))
      val d = rowCtor.replaceAllIn(c, "struct$1")
      val e = crossApply.replaceAllIn(d, "CROSS JOIN LATERAL")
      val f = offsetFetchRows.replaceAllIn(e, m =>
        "LIMIT " + Option(m.group(2)).getOrElse("1") +
          " OFFSET " + m.group(1))
      val g = fetchRows.replaceAllIn(f,
        m => "LIMIT " + Option(m.group(1)).getOrElse("1"))
      val h = offsetRows.replaceAllIn(g, "OFFSET $1")
      val h2 = offsetLimit.replaceAllIn(h, "LIMIT $2 OFFSET $1")
      // `LIMIT start, ALL` (Calcite: offset with no limit)
      val h3 = """(?i)\bLIMIT\s+(\d+)\s*,\s*ALL\b""".r
        .replaceAllIn(h2, "OFFSET $1")
      val i = limitStartCount.replaceAllIn(h3, "LIMIT $2 OFFSET $1")
      val j = limitAll.replaceAllIn(i, "")
      val k = logicalAgg.replaceAllIn(j,
        m => "BOOL_" + m.group(1).toUpperCase +
          java.util.regex.Matcher.quoteReplacement(m.group(2)))
      val l0a = safeCast.replaceAllIn(k, "TRY_CAST$1")
      // GREATEST/LEAST null-propagate in the reference
      // (comparisons.md); Spark's natives skip NULLs and stay the
      // _IGNORE_NULLS spellings (quidem PostgresTests testGreatest)
      val l0b = """(?i)\b(GREATEST|LEAST)(\s*\()""".r
        .replaceAllIn(l0a, m =>
          "graft_" + m.group(1).toLowerCase + m.group(2))
      // ARRAY_EXCEPT/INTERSECT/UNION results are SORTED ascending in
      // the reference (array.md:100-116); Spark's keep left order
      val l0 = """(?i)\bARRAY_(EXCEPT|INTERSECT|UNION)(\s*\()""".r
        .replaceAllIn(l0b, m =>
          "graft_array_" + m.group(1).toLowerCase + m.group(2))
      // interval idioms: negated string literal, plural units in
      // ranged qualifiers (grammar.md allows plurals; Spark's ranged
      // form wants singular)
      val l1 = """(?i)\b(INTERVAL\s+)-\s*'""".r
        .replaceAllIn(l0, "$1'-")
      val l1b =
        """(?i)\b(DAY|HOUR|MINUTE|SECOND|YEAR|MONTH)S(\s+TO\s+)""".r
          .replaceAllIn(l1, "$1$2")
      val l1c =
        """(?i)(\bTO\s+)(DAY|HOUR|MINUTE|SECOND|YEAR|MONTH)S\b""".r
          .replaceAllIn(l1b, "$1$2")
      // single-unit interval TYPE spelling (CAST(x AS INTERVAL DAYS))
      val l = ("""(?i)(\bAS\s+INTERVAL\s+)""" +
        """(DAY|HOUR|MINUTE|SECOND|YEAR|MONTH)S\b""").r
        .replaceAllIn(l1c, "$1$2")
      // reference SPLIT_PART tolerates n = 0 (''), Spark's raises;
      // reference SPLIT uses a LITERAL delimiter (Spark's is regex)
      val l2a = """(?i)\bSPLIT_PART(\s*\()""".r
        .replaceAllIn(l, "split_part_f$1")
      val l2b = """(?i)\bSPLIT(\s*\()""".r.replaceAllIn(l2a, m =>
        java.util.regex.Matcher.quoteReplacement("split_f" + m.group(1)))
      // unsigned widths widen to the next signed type in CAST position
      // (SqlTypes.sparkType; range checks live on the table-DDL path)
      val uns1 = """(?i)\bTINYINT\s+UNSIGNED\b""".r
        .replaceAllIn(l2b, "SMALLINT")
      val uns2 = """(?i)\bSMALLINT\s+UNSIGNED\b""".r
        .replaceAllIn(uns1, "INT")
      val uns3 = """(?i)\b(?:INT|INTEGER)\s+UNSIGNED\b""".r
        .replaceAllIn(uns2, "BIGINT")
      val uns = """(?i)\bBIGINT\s+UNSIGNED\b""".r
        .replaceAllIn(uns3, "DECIMAL(20, 0)")
      // SQL_TSI_* unit aliases in the datetime arithmetic functions
      // (Calcite grammar; Spark only knows the bare units), and the
      // 3-arg bare-unit DATEDIFF synonym of TIMESTAMPDIFF
      // (mysql/TimestampDiffTests)
      val tsi = ("""(?i)\b(TIMESTAMPDIFF|TIMESTAMPADD|DATEDIFF|""" +
        """DATEADD|DATE_DIFF|DATE_ADD)(\s*\(\s*)SQL_TSI_(\w+)""").r
        .replaceAllIn(uns, "$1$2$3")
      val ddiff =
        """(?i)\bDATEDIFF(\s*\(\s*)(YEAR|QUARTER|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND)\b""".r
          .replaceAllIn(tsi, "TIMESTAMPDIFF$1$2")
      // COUNTIF is Calcite's spelling of Spark's count_if
      val cif = """(?i)\bCOUNTIF(\s*\()""".r.replaceAllIn(ddiff,
        "count_if$1")
      // decimal-literal ROWS frame bounds truncate to the integer
      // (Calcite; Spark requires INT — WinAggTests testWindowRows)
      val rframe =
        ("""(?i)\b(ROWS\s+(?:BETWEEN\s+)?)(\d+)\.\d+""" +
          """(\s+(?:PRECEDING|FOLLOWING))""").r
          .replaceAllIn(cif, "$1$2$3")
      // PI is a reserved NILADIC function in the reference grammar
      // (float.md: "() is not allowed"); Spark's is pi()
      val l2c = """(?i)\bPI\b(?!\s*\()""".r.replaceAllIn(rframe, "pi()")
      // `GROUP BY DISTINCT` (Calcite: dedupe the grouping-set product)
      // — the keyword drops; queries whose set lists actually contain
      // duplicates are outside this engine's surface (documented)
      val l2d = """(?i)\bGROUP\s+BY\s+DISTINCT\b""".r
        .replaceAllIn(l2c, "GROUP BY")
      // SQL-standard `GROUP BY ()` is the SINGLE-GROUP aggregate in
      // Calcite: with aggregates it is the global aggregate (one row
      // even over empty input — AggTests testScalar#5), without them
      // one row of the constant select items (testAggregates4#15).
      // Spark's GROUP BY ALL matches both: no non-aggregate items →
      // global aggregate; constant items → one group
      val l2e = """(?i)\bGROUP\s+BY\s*\(\s*\)""".r
        .replaceAllIn(l2d, "GROUP BY ALL")
      // Calcite's GROUP_ID() is the duplicate-grouping-set ordinal —
      // constant 0 whenever the set list has no duplicates (the only
      // shape this engine accepts, see GROUP BY DISTINCT above)
      val l2 = """(?i)\bGROUP_ID\s*\(\s*\)""".r
        .replaceAllIn(l2e, "CAST(0 AS BIGINT)")
      mapBareTypes(rewriteMultiArgGrouping(l2))
    })))))))))))))))))), adHoc))

  /** The reference's string literals are standard-conforming (no
    * backslash escapes; '' is the only escape — string.md), while
    * Spark's parser processes C-style escapes ('a\b' becomes
    * a<backspace>). Doubling every backslash inside literals at the
    * end of the rewrite pipeline makes Spark read them verbatim while
    * leaving '' doubling (which Spark also honors) untouched.
    */
  private[graft] def escapeLiteralBackslashes(s: String): String = {
    val out = new StringBuilder(s.length)
    var inQ = false
    for (c <- s) {
      if (c == '\'') inQ = !inQ
      if (c == '\\' && inQ) out ++= "\\\\" else out += c
    }
    out.toString
  }

  /** `U&'...' [UESCAPE 'c']` Unicode string literals (string.md:59-70):
    * escape char + 4 hex digits denote a code point, a doubled escape
    * char denotes itself; decoded at rewrite time into a plain quoted
    * literal (Spark has no U& literal spelling). A decoded quote is
    * re-doubled so the emitted literal stays well-formed.
    */
  private[graft] def rewriteUnicodeStringLiterals(s: String): String = {
    val re = """(?is)\bU&'((?:[^']|'')*)'(\s*UESCAPE\s*'([^'])')?""".r
    re.replaceAllIn(s, m => {
      val body = m.group(1)
      val esc = if (m.group(3) != null) m.group(3).charAt(0) else '\\'
      val out = new StringBuilder
      var i = 0
      while (i < body.length) {
        val c = body.charAt(i)
        if (c == esc) {
          if (i + 1 < body.length && body.charAt(i + 1) == esc) {
            out += esc; i += 2
          } else if (i + 4 < body.length && body.substring(i + 1, i + 5)
              .forall(h => Character.digit(h, 16) >= 0)) {
            val cp = Integer.parseInt(body.substring(i + 1, i + 5), 16)
            if (cp == '\'') out ++= "''" else out += cp.toChar
            i += 5
          } else sys.error(
            s"invalid unicode escape in U&'...' literal: $body")
        } else { out += c; i += 1 }
      }
      scala.util.matching.Regex
        .quoteReplacement("'" + out.toString + "'")
    })
  }

  /** `SUBSTRING(x FROM s FOR l)` with the reference's clamp semantics
    * (string.md:249-251): a negative start yields `max(l + s - 1, 0)`
    * characters from position 1, a negative length yields the empty
    * string — where Spark's native FROM/FOR form wraps a negative
    * start around the END of the string. Arithmetic runs in BIGINT so
    * pathological lengths cannot overflow. The FROM-only form matches
    * natively (both count a negative start back from the end) and is
    * left alone.
    */
  private def rewriteSubstringFromFor(s: String): String = {
    val re = """(?i)\bSUBSTRING\s*\(""".r
    re.findAllMatchIn(s).toSeq
      .filter(mm => !inQuoteMap(s)(mm.start))
      .reverse.foldLeft(s) { (acc, m) =>
      // top-level scan of the argument list for FROM / FOR keywords
      var depth = 1
      var i = m.end
      var inQ = false
      var fromAt = -1
      var forAt = -1
      var close = -1
      while (close < 0 && i < acc.length) {
        val c = acc.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case 'F' | 'f' if depth == 1 =>
            val up = acc.substring(i, math.min(i + 5, acc.length))
              .toUpperCase
            def kw(w: String): Boolean =
              up.startsWith(w) && i > 0 &&
                !Character.isLetterOrDigit(acc.charAt(i - 1)) &&
                i + w.length < acc.length &&
                !Character.isLetterOrDigit(acc.charAt(i + w.length))
            if (kw("FROM") && fromAt < 0) fromAt = i
            else if (kw("FOR") && forAt < 0 && fromAt >= 0) forAt = i
          case _ =>
        }
        i += 1
      }
      if (close < 0 || fromAt < 0 || forAt < 0) acc
      else {
        val x = acc.substring(m.end, fromAt).trim
        val st = acc.substring(fromAt + 4, forAt).trim
        val ln = acc.substring(forAt + 3, close).trim
        val sb = s"CAST(($st) AS BIGINT)"
        val lb = s"CAST(($ln) AS BIGINT)"
        val start = s"GREATEST($sb, 1L)"
        val count =
          s"LEAST(GREATEST($sb + $lb - $start, 0L), 2147483647L)"
        acc.substring(0, m.start) +
          s"(CASE WHEN $lb < 0 THEN '' ELSE SUBSTRING($x, " +
          s"CAST($start AS INT), CAST($count AS INT)) END)" +
          acc.substring(close + 1)
      }
    }
  }

  /** EXTRACT units Spark lacks or disagrees on (datetime.md:7-34 — the
    * reference returns BIGINT for every unit):
    * EPOCH/CENTURY/MILLENNIUM/DECADE have no Spark field; DOW is
    * Sunday=1..Saturday=7 where Spark's is 0-based; ISODOW is
    * Monday=1..Sunday=7; MICROSECOND/MILLISECOND/NANOSECOND count
    * within the MINUTE; SECOND is integral (Spark's is DECIMAL(8,6));
    * SQL_TSI_* are unit aliases. Composable forms are emitted in terms
    * of native EXTRACT/functions so everything stays codegen'd.
    */
  private def rewriteExtract(s: String): String = {
    val re = """(?i)\bEXTRACT\s*\(\s*(\w+)\s+FROM\b""".r
    re.findAllMatchIn(s).toSeq
      .filter(mm => !inQuoteMap(s)(mm.start))
      .reverse.foldLeft(s) { (acc, m) =>
      val unit = m.group(1).toUpperCase.stripPrefix("SQL_TSI_")
      val mapped = Set("EPOCH", "CENTURY", "MILLENNIUM", "DECADE",
        "DOW", "ISODOW", "ISOYEAR", "MICROSECOND", "MILLISECOND",
        "NANOSECOND", "SECOND")
      if (!mapped(unit) && !m.group(1).toUpperCase.startsWith("SQL_TSI_"))
        acc
      else {
        var depth = 1
        var i = m.end
        var inQ = false
        var close = -1
        while (close < 0 && i < acc.length) {
          val c = acc.charAt(i)
          if (inQ) { if (c == '\'') inQ = false }
          else c match {
            case '\'' => inQ = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        if (close < 0) acc
        else {
          val x = acc.substring(m.end, close).trim
          val repl = unit match {
            case "EPOCH" =>
              s"CAST(unix_timestamp(CAST($x AS TIMESTAMP)) AS BIGINT)"
            case "CENTURY" =>
              s"CAST(FLOOR((EXTRACT(YEAR FROM $x) + 99) / 100.0) AS BIGINT)"
            case "MILLENNIUM" =>
              s"CAST(FLOOR((EXTRACT(YEAR FROM $x) + 999) / 1000.0) AS BIGINT)"
            case "DECADE" =>
              s"CAST(FLOOR(EXTRACT(YEAR FROM $x) / 10.0) AS BIGINT)"
            case "DOW" => s"CAST(dayofweek($x) AS BIGINT)"
            case "ISODOW" => s"CAST(weekday($x) + 1 AS BIGINT)"
            case "ISOYEAR" =>
              s"CAST(EXTRACT(YEAROFWEEK FROM $x) AS BIGINT)"
            case "MICROSECOND" =>
              s"CAST(EXTRACT(SECOND FROM $x) * 1000000 AS BIGINT)"
            case "MILLISECOND" =>
              s"CAST(EXTRACT(SECOND FROM $x) * 1000 AS BIGINT)"
            case "NANOSECOND" =>
              s"CAST(EXTRACT(SECOND FROM $x) * 1000000000 AS BIGINT)"
            case "SECOND" =>
              s"CAST(FLOOR(EXTRACT(SECOND FROM $x)) AS BIGINT)"
            case u => s"EXTRACT($u FROM $x)" // SQL_TSI_ alias
          }
          acc.substring(0, m.start) + repl + acc.substring(close + 1)
        }
      }
    }
  }

  /** The SQL-standard `ARRAY[a, b, …]` constructor (Calcite grammar)
    * → Spark's `array(a, b, …)`. Bracket matching is quote-aware and
    * counts nesting, so element-access brackets inside stay intact;
    * nested ARRAY[ constructors resolve over the fixpoint loop.
    */
  private def rewriteArrayBrackets(s0: String): String = {
    var s = s0
    var changed = true
    while (changed) {
      changed = false
      val m = """(?i)\b(ARRAY|MAP)\s*\[""".r.findFirstMatchIn(s)
        .filter(mm => !inQuoteMap(s)(mm.start))
      m.foreach { mm =>
        var depth = 1
        var i = mm.end
        var inQ = false
        var close = -1
        while (close < 0 && i < s.length) {
          val c = s.charAt(i)
          if (inQ) { if (c == '\'') inQ = false }
          else c match {
            case '\'' => inQ = true
            case '[' => depth += 1
            case ']' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        if (close >= 0) {
          // `MAP[k1, v1, …]` is Calcite's map constructor → map(...)
          s = s.substring(0, mm.start) +
            mm.group(1).toLowerCase + "(" +
            s.substring(mm.end, close) + ")" + s.substring(close + 1)
          changed = true
        }
      }
    }
    s
  }

  /** Optional-argument dispatches that need the full quote-bearing
    * text (1-arg SPLIT → split_f1; 3-arg ARRAY_TO_STRING → its
    * null_string spelling).
    */
  private def dispatchArityAll(s: String): String = {
    var r = dispatchArity(dispatchArity(s, "split_f", 0, "split_f1"),
      "array_to_string", 2, "array_to_string3")
    // reference transcendentals (float.md/float.rs): LOG(x[, base]) is
    // ln-ratio (NOT Spark's log(base, x) argument order), LN/LOG10
    // return -Infinity at 0 and raise below 0, EXP matches libm
    r = dispatchArity(r, "log10", 0, "graft_log10")
    r = dispatchArity(r, "log", 1, "graft_log2")
    r = dispatchArity(r, "log", 0, "graft_ln")
    r = dispatchArity(r, "ln", 0, "graft_ln")
    r = dispatchArity(r, "convert_timezone", 2, "graft_convert_tz")
    r = dispatchArity(r, "regexp_replace", 1, "graft_regexp_remove")
    r = dispatchArity(r, "power", 1, "graft_pow")
    r = dispatchArity(r, "pow", 1, "graft_pow")
    dispatchArity(r, "exp", 0, "graft_exp")
  }

  /** Re-dispatch `name(` calls with exactly `commas` top-level commas
    * to `target(` — SQL-bodied functions cannot overload, so optional
    * arguments get sibling registrations (split_f1, array_to_string3).
    */
  private def dispatchArity(s: String, name: String, commas: Int,
      target: String): String = {
    val re = ("""(?i)\b""" + name + """\s*\(""").r
    re.findAllMatchIn(s).toSeq
      .filter(mm => !inQuoteMap(s)(mm.start))
      .reverse.foldLeft(s) { (acc, m) =>
      var depth = 1
      var i = m.end
      var inQ = false
      var n = 0
      var close = -1
      while (close < 0 && i < acc.length) {
        val c = acc.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case ',' if depth == 1 => n += 1
          case _ =>
        }
        i += 1
      }
      if (close < 0 || n != commas) acc
      else acc.substring(0, m.start) + target + "(" +
        acc.substring(m.end)
    }
  }

  /** Single-argument `TRUNCATE(x)` (decimal.md — truncate toward zero
    * at scale 0); the registry's truncate is 2-ary, so the bare form
    * gains the explicit scale.
    */
  private def rewriteTruncate1(s: String): String = {
    val re = """(?i)\bTRUNCATE\s*\(""".r
    re.findAllMatchIn(s).toSeq
      .filter(mm => !inQuoteMap(s)(mm.start))
      .reverse.foldLeft(s) { (acc, m) =>
      var depth = 1
      var i = m.end
      var inQ = false
      var commas = 0
      var close = -1
      while (close < 0 && i < acc.length) {
        val c = acc.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case ',' if depth == 1 => commas += 1
          case _ =>
        }
        i += 1
      }
      if (close < 0 || commas > 0) acc
      else acc.substring(0, close) + ", 0" + acc.substring(close)
    }
  }

  /** `DATE_PART(unit, x)` with a BARE unit keyword — the reference's
    * EXTRACT synonym (datetime.md:58). Respelled as EXTRACT so
    * [[rewriteExtract]] then maps the units Spark lacks. The quoted
    * form `date_part('unit', x)` is Spark-native and left alone.
    */
  private def rewriteDatePart(s: String): String = {
    val re = """(?i)\bDATE_PART\s*\(\s*([A-Za-z_]+)\s*,""".r
    re.findAllMatchIn(s).toSeq
      .filter(mm => !inQuoteMap(s)(mm.start))
      .reverse.foldLeft(s) { (acc, m) =>
      var depth = 1
      var i = m.end
      var inQ = false
      var close = -1
      while (close < 0 && i < acc.length) {
        val c = acc.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      if (close < 0) acc
      else acc.substring(0, m.start) +
        s"EXTRACT(${m.group(1).toUpperCase} FROM " +
        acc.substring(m.end, close).trim + ")" + acc.substring(close + 1)
    }
  }

  /** `FLOOR(x TO UNIT)` / `CEIL(x TO UNIT)` (datetime.md:56,59 — round
    * a date/timestamp to a unit boundary) lower onto
    * [[org.apache.spark.sql.graft.GraftDateTrunc]].
    */
  private def rewriteFloorCeilTo(s: String): String = {
    val re = """(?i)\b(FLOOR|CEIL|CEILING)\s*\(""".r
    re.findAllMatchIn(s).toSeq
      .filter(mm => !inQuoteMap(s)(mm.start))
      .reverse.foldLeft(s) { (acc, m) =>
      var depth = 1
      var i = m.end
      var inQ = false
      var toAt = -1
      var close = -1
      while (close < 0 && i < acc.length) {
        val c = acc.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case 'T' | 't' if depth == 1 =>
            if (acc.regionMatches(true, i, "TO", 0, 2) && i > 0 &&
              Character.isWhitespace(acc.charAt(i - 1)) &&
              i + 2 < acc.length &&
              Character.isWhitespace(acc.charAt(i + 2))) toAt = i
          case _ =>
        }
        i += 1
      }
      if (close < 0 || toAt < 0) acc
      else {
        val unit = acc.substring(toAt + 2, close).trim
        if (!unit.matches("(?i)[A-Z_]+")) acc
        else {
          // FLOOR/CEIL TO use the calendar-zero CENTURY/MILLENNIUM
          // bases (timestamp.rs floor_century: y/100*100), unlike
          // DATE_TRUNC's century-number base — hence the _to variants
          val fn = if (m.group(1).equalsIgnoreCase("FLOOR"))
            "graft_date_floor_to" else "graft_date_ceil_to"
          val x = acc.substring(m.end, toAt).trim
          acc.substring(0, m.start) +
            s"$fn($x, '${unit.toUpperCase}')" + acc.substring(close + 1)
        }
      }
    }
  }

  /** The reference's `DATE_TRUNC(x, UNIT)` spelling (datetime.md:57 —
    * value first, bare-keyword unit, result type = input type) lowers
    * onto [[org.apache.spark.sql.graft.GraftDateTrunc]]. Spark's own
    * `date_trunc('unit', ts)` spelling (string literal first) is left
    * untouched.
    */
  private def rewriteDateTrunc(s: String): String = {
    val re = """(?i)\b(?:DATE|TIMESTAMP|TIME)_TRUNC\s*\(""".r
    re.findAllMatchIn(s).toSeq
      .filter(mm => !inQuoteMap(s)(mm.start))
      .reverse.foldLeft(s) { (acc, m) =>
      var depth = 1
      var i = m.end
      var inQ = false
      var commaAt = -1
      var close = -1
      while (close < 0 && i < acc.length) {
        val c = acc.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case ',' if depth == 1 => commaAt = i // last top-level comma
          case _ =>
        }
        i += 1
      }
      if (close < 0 || commaAt < 0) acc
      else {
        val unit = acc.substring(commaAt + 1, close).trim
        // only a RECOGNIZED bare unit keyword triggers the reference
        // spelling — any other trailing identifier (a column in Spark's
        // own date_trunc('unit', col)) leaves the call untouched
        val units = Set("MILLENNIUM", "CENTURY", "DECADE", "YEAR",
          "QUARTER", "MONTH", "WEEK", "DAY", "HOUR", "MINUTE",
          "SECOND", "MILLISECOND")
        if (!units(unit.toUpperCase)) acc
        else {
          val x = acc.substring(m.end, commaAt)
          acc.substring(0, m.start) +
            s"graft_date_trunc($x, '${unit.toUpperCase}')" +
            acc.substring(close + 1)
        }
      }
    }
  }

  /** `CAST(x AS CHAR(n))` with the reference's fixed-width semantics
    * (types.md CHAR(n): truncate to n, pad to n with spaces) — Spark
    * erases CHAR(n) to STRING in cast position (no truncation, no
    * padding). The postfix `x::char(n)` spelling is normalized to the
    * same form for simple operands (literals/identifiers — the only
    * shapes the reference grammar's tests use postfix on).
    */
  private def rewriteCharCast(s: String): String = {
    val post =
      ("""('(?:[^']|'')*'|[A-Za-z_][\w.]*)\s*::\s*""" +
        """(?i:char(?:acter)?)\s*\(\s*(\d+)\s*\)""").r
    val s1 = post.replaceAllIn(s, m => {
      val n = m.group(2)
      java.util.regex.Matcher.quoteReplacement(
        s"rpad(substring(CAST(${m.group(1)} AS STRING), 1, $n), $n, ' ')")
    })
    val re = """(?i)\bCAST\s*\(""".r
    re.findAllMatchIn(s1).toSeq
      .filter(mm => !inQuoteMap(s1)(mm.start))
      .reverse.foldLeft(s1) { (acc, m) =>
      var depth = 1
      var i = m.end
      var inQ = false
      var asAt = -1
      var close = -1
      while (close < 0 && i < acc.length) {
        val c = acc.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case 'A' | 'a' if depth == 1 =>
            if (acc.regionMatches(true, i, "AS", 0, 2) && i > 0 &&
              !Character.isLetterOrDigit(acc.charAt(i - 1)) &&
              i + 2 < acc.length &&
              !Character.isLetterOrDigit(acc.charAt(i + 2))) asAt = i
          case _ =>
        }
        i += 1
      }
      val charN = """(?i)^CHAR(?:ACTER)?\s*\(\s*(\d+)\s*\)$""".r
      if (close < 0 || asAt < 0) acc
      else acc.substring(asAt + 2, close).trim match {
        case charN(n) =>
          val x = acc.substring(m.end, asAt).trim
          acc.substring(0, m.start) +
            s"rpad(substring(CAST($x AS STRING), 1, $n), $n, ' ')" +
            acc.substring(close + 1)
        case _ => acc
      }
    }
  }

  /** TIME literals in TIMESTAMP contexts — `CAST(TIME '…' AS
    * TIMESTAMP)` and TIME operands of TIMESTAMPDIFF — become epoch-day
    * timestamps (mysql/TimestampDiffTests issue4610: the reference
    * casts TIME to TIMESTAMP on 1970-01-01); Spark's TIME type has no
    * TIMESTAMP cast. Literal spellings only — a TIME column in cast
    * position stays a loud analysis error.
    */
  private def rewriteTimeTsLiterals(s: String): String = {
    // runs on the full statement (the rewrite spans string-literal
    // boundaries), so matches inside string literals must be skipped
    // like every sibling full-statement rewrite (replaceGuarded)
    val cast =
      """(?i)\bCAST\s*\(\s*TIME\s+'([^']*)'\s+AS\s+TIMESTAMP\b""".r
    var r = replaceGuarded(s, cast)(m =>
      s"CAST(TIMESTAMP '1970-01-01 ${m.group(1)}' AS TIMESTAMP")
    val inDiff =
      """(?i)(TIMESTAMPDIFF\s*\([^()]*?)\bTIME\s+'([^']*)'""".r
    var changed = true
    while (changed) {
      val r2 = replaceGuarded(r, inDiff)(m =>
        m.group(1) + s"TIMESTAMP '1970-01-01 ${m.group(2)}'")
      changed = r2 != r
      r = r2
    }
    r
  }

  /** Calcite literal/ctor idioms that span string-literal boundaries
    * (so they cannot live in the quote-splitting run block):
    *  - `CAST(UUID '…' AS VARBINARY)` → the 16 raw bytes
    *    (uuid_to_binary); bare `UUID '…'` → the canonical lowercase
    *    string literal (uuid.md — the UUID type maps to STRING here,
    *    SqlTypes:66);
    *  - `INTERVAL '<n>' WEEK/QUARTER` (units Spark's interval grammar
    *    lacks) → the equivalent DAY/MONTH literal;
    *  - `INTERVAL <column|(expr)> unit` (Calcite's dynamic interval)
    *    → make_dt_interval / make_ym_interval;
    *  - `UNNEST(` → Spark's explode table function (arrays AND maps).
    */
  /** Singularize plural unit words in multi-field interval literals:
    * the reference accepts `INTERVAL '1:00' HOURS TO MINUTES`
    * (streaming tests' LATENESS declarations), Spark's `H TO M` form
    * demands singular units (single-field literals take either).
    * Exposed for the Pipeline's LATENESS/WATERMARK expressions, which
    * carry raw CREATE TABLE text.
    */
  private[graft] def singularizeIntervalUnits(s: String): String = {
    val re = ("""(?i)\b(INTERVAL\s+'[^']*'\s+)""" +
      """(YEARS?|MONTHS?|DAYS?|HOURS?|MINUTES?|SECONDS?)\s+TO\s+""" +
      """(YEARS?|MONTHS?|DAYS?|HOURS?|MINUTES?|SECONDS?)\b""").r
    replaceGuarded(s, re)(m => m.group(1) +
      m.group(2).replaceAll("(?i)s$", "") + " TO " +
      m.group(3).replaceAll("(?i)s$", ""))
  }

  /** Calcite's legacy scalar tumbling-window functions (GROUP BY
    * TUMBLE(ts, size) + SELECT TUMBLE_START/TUMBLE_END — the
    * pre-windowing-TVF spelling the reference still accepts):
    * epoch-aligned floor via [[org.apache.spark.sql.graft.GraftTumble]]
    * (same assignment as Spark's `window()`). Runs AFTER the TVF
    * rewrite, so `TABLE(TUMBLE(...DESCRIPTOR...))` forms are already
    * consumed.
    */
  private def rewriteScalarTumble(s0: String): String = {
    val re = """(?i)\bTUMBLE(_START|_END)?\s*\(""".r
    var s = s0
    var found = true
    while (found) {
      found = false
      re.findAllMatchIn(s).find(m => !inQuoteMap(s)(m.start)) match {
        case Some(m) =>
          val close = balancedClose(s, m.end - 1)
          if (close > 0) {
            val args = splitTopLevel(s.substring(m.end, close))
            if (args.length >= 2 &&
              !args.exists(_.toUpperCase.contains("DESCRIPTOR"))) {
              val kind = Option(m.group(1)).getOrElse("").toUpperCase
              val (sizeMs, _) = parseShortInterval(args(1), "TUMBLE")
              // Calcite also takes the offset as a TIME literal
              // (tumblingTestLimits: TIME '00:12:00')
              val timeLit =
                """(?is)^\s*TIME\s+'(\d{1,2}):(\d{2})(?::(\d{2}))?'\s*$""".r
              val offMs = args.lift(2).map {
                case timeLit(h, mi, se) =>
                  (h.toLong * 3600 + mi.toLong * 60 +
                    Option(se).map(_.toLong).getOrElse(0L)) * 1000L
                case other => parseShortInterval(other, "TUMBLE")._1
              }.getOrElse(0L)
              val base =
                s"graft_tumble(${args.head.trim}, ${sizeMs}L, ${offMs}L)"
              val repl = kind match {
                case "_END" =>
                  s"timestampadd(MILLISECOND, $sizeMs, $base)"
                case _ => base
              }
              s = s.substring(0, m.start) + repl + s.substring(close + 1)
              found = true
            }
          }
        case None =>
      }
    }
    s
  }

  /** The balanced unit (subquery) or dotted table name immediately
    * before position `pos` — the table-suffix operand of PIVOT/UNPIVOT.
    */
  private def precedingRelation(s: String, pos: Int): (Int, String) = {
    var e = pos - 1
    while (e >= 0 && s.charAt(e).isWhitespace) e -= 1
    if (e >= 0 && s.charAt(e) == ')') {
      var d = 0
      var b = e
      var open = -1
      while (open < 0 && b >= 0) {
        s.charAt(b) match {
          case ')' => d += 1
          case '(' => d -= 1; if (d == 0) open = b
          case _ =>
        }
        b -= 1
      }
      (open, s.substring(open, e + 1))
    } else {
      var b = e
      while (b >= 0 && (s.charAt(b).isLetterOrDigit ||
        s.charAt(b) == '_' || s.charAt(b) == '.')) b -= 1
      (b + 1, s.substring(b + 1, e + 1))
    }
  }

  /** Calcite's COMPOUND UNPIVOT — tuple measures and/or tuple FOR keys
    * with `AS (value, …)` item aliases (PivotTests unpivotTests#0/#10)
    * — has no Spark UNPIVOT spelling: lower to a UNION ALL of
    * per-item projections (EXCLUDE NULLS = drop rows whose measures
    * are all NULL, the default). Simple single-measure forms stay on
    * Spark's native UNPIVOT, with bare source-column labels folded to
    * lowercase (Calcite records `sal`, not `SAL`).
    */
  private def rewriteUnpivot(s0: String): String = {
    val re = """(?i)\bUNPIVOT\s*((?:INCLUDE|EXCLUDE)\s+NULLS\s*)?\(""".r
    var s = s0
    var search = 0
    var guard = 0
    while (guard < 200) {
      guard += 1
      re.findAllMatchIn(s)
        .find(m => m.start >= search && !inQuoteMap(s)(m.start)) match {
        case None => return s
        case Some(m) =>
          val include = Option(m.group(1))
            .exists(_.toUpperCase.startsWith("INCLUDE"))
          val close = balancedClose(s, m.end - 1)
          require(close > 0, s"unbalanced UNPIVOT in: $s")
          val body = s.substring(m.end, close)
          val forM = """(?i)\bFOR\b""".r.findAllMatchIn(body).find { fm =>
            var d = 0
            body.take(fm.start).foreach {
              case '(' => d += 1
              case ')' => d -= 1
              case _ =>
            }
            d == 0
          }.getOrElse(sys.error(s"UNPIVOT without FOR: $body"))
          val measText = body.take(forM.start).trim
          val measures =
            if (measText.startsWith("("))
              splitTopLevel(measText.stripPrefix("(").stripSuffix(")"))
                .map(_.trim)
            else Seq(measText)
          val tail = body.drop(forM.end).trim
          val inM = """(?i)\bIN\s*\(""".r.findFirstMatchIn(tail)
            .getOrElse(sys.error(s"UNPIVOT FOR without IN: $body"))
          val keyText = tail.take(inM.start).trim
          val keys =
            if (keyText.startsWith("("))
              splitTopLevel(keyText.stripPrefix("(").stripSuffix(")"))
                .map(_.trim)
            else Seq(keyText)
          val inClose = balancedClose(tail, inM.end - 1)
          val items = splitTopLevel(tail.substring(inM.end, inClose))
            .map(_.trim).filter(_.nonEmpty)
          val compound = measures.size > 1 || keys.size > 1 ||
            items.exists(i => """(?is)\bAS\s*\(""".r
              .findFirstIn(i).isDefined)
          if (!compound) {
            // native path: lowercase bare source-column labels (the
            // label VALUE is the column name as written)
            val lowered = items.map { i =>
              val asM = """(?is)^([A-Za-z_]\w*)(\s+(?:AS\s+)?.+)?$""".r
              i match {
                case asM(c, al) =>
                  c.toLowerCase + Option(al).getOrElse("")
                case other => other
              }
            }
            val newBody = body.take(forM.end) + " " +
              tail.take(inM.end) + lowered.mkString(", ") +
              tail.substring(inClose)
            s = s.substring(0, m.end) + newBody + s.substring(close)
            search = m.end + newBody.length + 1
          } else {
          val parsed = items.map { i =>
            val (colsText, aliasText) =
              if (i.startsWith("(")) {
                val c = balancedClose(i, 0)
                (i.substring(1, c), i.substring(c + 1).trim)
              } else {
                val am = """(?is)^(\S+)\s*(.*)$""".r
                val am(c, a) = i
                (c, a.trim)
              }
            val cols = splitTopLevel(colsText).map(_.trim)
            val alias = """(?is)^(?:AS\s+)?(.*)$""".r
              .findFirstMatchIn(aliasText).map(_.group(1).trim)
              .filter(_.nonEmpty)
            val vals = alias match {
              case Some(a) if a.startsWith("(") =>
                splitTopLevel(a.stripPrefix("(").stripSuffix(")"))
                  .map(_.trim)
              case Some(a) => keys.map(_ => a)
              case None =>
                // Calcite's default label: source names joined,
                // lowercased, repeated in every key column
                val label = "'" + cols.map(_.toLowerCase)
                  .mkString("_") + "'"
                keys.map(_ => label)
            }
            (cols, vals)
          }
          val allCols = parsed.flatMap(_._1).distinct
          val (inputStart, input) = precedingRelation(s, m.start)
          val branches = parsed.map { case (cols, vals) =>
            val keep = s"* EXCEPT (${allCols.mkString(", ")})"
            val keysSel = keys.zip(vals)
              .map { case (k, v) => s"$v AS $k" }.mkString(", ")
            val measSel = measures.zip(cols)
              .map { case (mn, c) => s"$c AS $mn" }.mkString(", ")
            val where =
              if (include) ""
              else s" WHERE NOT (${cols.map(c => s"$c IS NULL")
                .mkString(" AND ")})"
            s"SELECT $keep, $keysSel, $measSel FROM $input __unp0$where"
          }
          val repl = s"(${branches.mkString(" UNION ALL ")})"
          s = s.substring(0, inputStart) + repl + s.substring(close + 1)
          search = inputStart
          }
      }
    }
    s
  }

  /** Index of the `)` closing the `(` at position `open` (quote-aware). */
  private def balancedClose(s: String, open: Int): Int = {
    var depth = 0
    var inQ = false
    var j = open
    while (j < s.length) {
      val c = s.charAt(j)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return j
        case _ => ()
      }
      j += 1
    }
    -1
  }

  private def replaceGuarded(s: String, re: scala.util.matching.Regex)(
      f: scala.util.matching.Regex.Match => String): String =
    re.findAllMatchIn(s).toSeq
      .filter(m => !inQuoteMap(s)(m.start))
      .reverse.foldLeft(s) { (acc, m) =>
        acc.substring(0, m.start) + f(m) + acc.substring(m.end)
      }

  private def rewriteCalciteLiterals(s0: String): String = {
    var s = s0
    s = replaceGuarded(s,
      ("""(?i)\bCAST\s*\(\s*UUID\s+'([0-9a-fA-F-]+)'\s+AS\s+""" +
        """VARBINARY\b""").r)(m =>
      s"CAST(uuid_to_binary('${m.group(1).toLowerCase}') AS VARBINARY")
    s = replaceGuarded(s, """(?i)\bUUID\s+'([0-9a-fA-F-]+)'""".r)(m =>
      s"'${m.group(1).toLowerCase}'")
    s = replaceGuarded(s,
      """(?i)\bINTERVAL\s+'(-?\d+)'\s+WEEKS?\b""".r)(m =>
      s"INTERVAL '${m.group(1).toLong * 7}' DAY")
    s = replaceGuarded(s,
      """(?i)\bINTERVAL\s+'(-?\d+)'\s+QUARTERS?\b""".r)(m =>
      s"INTERVAL '${m.group(1).toLong * 3}' MONTH")
    val dyn = ("""(?i)\bINTERVAL\s+""" +
      """(\((?:[^()]|\([^()]*\))*\)|[A-Za-z_]\w*)\s+""" +
      """(DAY|HOUR|MINUTE|SECOND|YEAR|MONTH)S?\b""").r
    // unit-literal × operand keeps the NARROW interval span (DT(DAY)
    // etc.), so DATE + the result stays DATE-typed via the plan rule,
    // where make_dt_interval's full DAY-TO-SECOND span would not
    s = replaceGuarded(s, dyn)(m =>
      s"(INTERVAL '1' ${m.group(2).toUpperCase} * (${m.group(1)}))")
    // Calcite lexes digit-leading identifiers (`SELECT 10_sum_empno` —
    // a pivot-generated column, PivotTests #13); Spark needs quoting.
    // `\d+_[letter]` cannot be a numeric literal (underscore groups are
    // digits-only), so the match is unambiguous.
    val s2 = replaceGuarded(s, """(?<![\w`])(\d+_[A-Za-z_]\w*)""".r)(m =>
      s"`${m.group(1)}`")
    rewriteSubscript(rewriteUnnest(rewriteArrayAggOrder(rewriteRowCase(
      rewriteTupleIn(rewriteUnpivot(rewritePivot(rewriteLateralValues(
        rewriteParenIntervalQualifier(s2)))))))))
  }

  /** Postfix subscripts `x[i]` follow the reference's contract —
    * 1-BASED, out-of-bounds → NULL (array.md), ordinal field access on
    * ROW values — where Spark's native `[]` is 0-based and raises
    * under ANSI. Lowered to the type-dispatching `graft_subscript`
    * (Registry): array/map → try_element_at, struct → ordinal
    * GetStructField. ARRAY[...]/MAP[...] constructors were consumed by
    * rewriteArrayBrackets earlier in the chain.
    */
  private[graft] def rewriteSubscript(s0: String): String = {
    var s = s0
    var search = 0
    var guard = 0
    while (guard < 500) {
      guard += 1
      // a '[' directly after an identifier, ')' or ']' is a subscript
      var open = -1
      var j = search
      while (open < 0 && j < s.length) {
        if (s.charAt(j) == '[' && !inQuoteMap(s)(j) && j > 0 &&
          (s.charAt(j - 1).isLetterOrDigit || s.charAt(j - 1) == '_' ||
            s.charAt(j - 1) == ')' || s.charAt(j - 1) == '`'))
          open = j
        j += 1
      }
      if (open < 0) return s
      // balanced close over nested brackets/parens
      var depth = 0
      var inQ = false
      var close = -1
      j = open
      while (close < 0 && j < s.length) {
        val c = s.charAt(j)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '[' => depth += 1
          case ']' => depth -= 1; if (depth == 0) close = j
          case _ =>
        }
        j += 1
      }
      if (close < 0) return s
      // the primary expression before '[': balanced parens (call or
      // group), then a dotted identifier chain
      var b = open - 1
      if (s.charAt(b) == ')') {
        var d = 0
        var o2 = -1
        while (o2 < 0 && b >= 0) {
          s.charAt(b) match {
            case ')' => d += 1
            case '(' => d -= 1; if (d == 0) o2 = b
            case _ =>
          }
          b -= 1
        }
      }
      while (b >= 0 && (s.charAt(b).isLetterOrDigit ||
        s.charAt(b) == '_' || s.charAt(b) == '.' || s.charAt(b) == '`'))
        b -= 1
      val pStart = b + 1
      val primary = s.substring(pStart, open)
      val idxText = s.substring(open + 1, close)
      if (primary.trim.isEmpty) { search = close + 1 }
      else {
        s = s.substring(0, pStart) +
          s"graft_subscript($primary, $idxText)" + s.substring(close + 1)
        search = pStart
      }
    }
    s
  }

  /** `LATERAL (VALUES (…outer refs…), …) AS t(c…)` — a correlated
    * inline table (PivotTests unpivotTests#2). Spark's inline tables
    * must be foldable; lower to a UNION ALL of SELECTs, which lateral
    * correlation supports.
    */
  private def rewriteLateralValues(s0: String): String = {
    val re = """(?i)\bLATERAL\s*\(\s*VALUES\b""".r
    var s = s0
    var guard = 0
    while (guard < 100) {
      guard += 1
      re.findAllMatchIn(s).find(m => !inQuoteMap(s)(m.start)) match {
        case None => return s
        case Some(m) =>
          // the '(' right after LATERAL
          val parOpen = s.indexOf('(', m.start)
          val close = balancedClose(s, parOpen)
          require(close > 0, s"unbalanced LATERAL VALUES in: $s")
          val valuesBody = s.substring(
            s.indexOf("VALUES", m.start) + "VALUES".length, close)
          val rows = splitTopLevel(valuesBody).map(_.trim)
            .filter(_.nonEmpty)
          val selects = rows.map { r =>
            val c = balancedClose(r, 0)
            "SELECT " + splitTopLevel(r.substring(1, c))
              .map(_.trim).mkString(", ")
          }
          val repl = "LATERAL (" + selects.mkString(" UNION ALL ") + ")"
          s = s.substring(0, m.start) + repl + s.substring(close + 1)
      }
    }
    s
  }

  /** `CASE (a, b) WHEN (x, y) THEN … END` — Calcite's row-valued
    * simple CASE ([CALCITE-4434]; quidem StructTests testRow#4) —
    * expands to the searched form with pairwise equalities (Spark
    * compares the named_structs by full type, field names included).
    * Only fires when the CASE operand is a top-level-comma tuple.
    */
  private def rewriteRowCase(s0: String): String = {
    var s = s0
    var search = 0
    var guard = 0
    while (guard < 100) {
      guard += 1
      """(?i)\bCASE\s*\(""".r.findAllMatchIn(s)
        .find(m => m.start >= search && !inQuoteMap(s)(m.start)) match {
        case None => return s
        case Some(m) =>
          val open = s.indexOf('(', m.start)
          val close = balancedClose(s, open)
          val operand = s.substring(open + 1, close)
          val lhs = splitTopLevel(operand).map(_.trim)
          val afterM = """(?is)^\s*WHEN\s*\(""".r
            .findPrefixMatchOf(s.substring(close + 1))
          if (lhs.size < 2 || afterM.isEmpty) { search = m.end }
          else {
            // rewrite each `WHEN (tuple)` of this CASE up to its END
            val sb = new StringBuilder("CASE")
            var pos = close + 1
            var ok = true
            while (ok) {
              val rest = s.substring(pos)
              """(?is)^\s*WHEN\s*\(""".r.findPrefixMatchOf(rest) match {
                case Some(wm) =>
                  val wOpen = pos + wm.end - 1
                  val wClose = balancedClose(s, wOpen)
                  val rhs = splitTopLevel(
                    s.substring(wOpen + 1, wClose)).map(_.trim)
                  require(rhs.size == lhs.size,
                    s"row-CASE arity mismatch at: ${rest.take(40)}")
                  sb ++= " WHEN " + lhs.zip(rhs)
                    .map { case (a, b) => s"$a = $b" }.mkString(" AND ")
                  pos = wClose + 1
                case None =>
                  ok = false
              }
              if (ok) {
                // copy THEN <result> (up to the next WHEN/ELSE/END)
                val tm = """(?is)^\s*THEN\b""".r
                  .findPrefixMatchOf(s.substring(pos)).getOrElse(
                    sys.error("row-CASE WHEN without THEN"))
                val bodyStart = pos + tm.end
                val stop = """(?is)\b(WHEN|ELSE|END)\b""".r
                  .findAllMatchIn(s).find(x =>
                    x.start >= bodyStart && {
                      var d = 0
                      s.substring(bodyStart, x.start).foreach {
                        case '(' => d += 1
                        case ')' => d -= 1
                        case _ =>
                      }
                      d == 0
                    }).getOrElse(sys.error("row-CASE without END"))
                sb ++= " THEN" + s.substring(bodyStart, stop.start)
                pos = stop.start
              }
            }
            // remainder (ELSE … END or END) copies verbatim up to END
            val endM = """(?is)\bEND\b""".r.findAllMatchIn(s)
              .find(x => x.start >= pos && {
                var d = 0
                s.substring(pos, x.start).foreach {
                  case '(' => d += 1
                  case ')' => d -= 1
                  case _ =>
                }
                d == 0
              }).getOrElse(sys.error("row-CASE without END"))
            sb ++= " " + s.substring(pos, endM.end).trim
            s = s.substring(0, m.start) + sb.toString +
              s.substring(endM.end)
            search = m.start + sb.length
          }
      }
    }
    s
  }

  /** Row-valued IN over a literal list — `(a, b) IN (('CLERK', 10), …)`
    * (PivotTests testPivot#16) — expands to a disjunction of pairwise
    * equalities: Spark compares the named_structs it builds for row-IN
    * by full struct type (field names included) and rejects the mix.
    * Subquery IN (`(a,b) IN (SELECT …)`) is left alone. Runs AFTER the
    * PIVOT/UNPIVOT rewrites so their FOR…IN clauses are already gone.
    */
  private def rewriteTupleIn(s0: String): String = {
    val re = """(?i)\(([^()]+,[^()]+)\)\s+IN\s*\(""".r
    var s = s0
    var search = 0
    var guard = 0
    while (guard < 200) {
      guard += 1
      re.findAllMatchIn(s)
        .find(m => m.start >= search && !inQuoteMap(s)(m.start)) match {
        case None => return s
        case Some(m) =>
          val close = balancedClose(s, m.end - 1)
          val list = s.substring(m.end, close).trim
          if (close < 0 || !list.startsWith("(")) { search = m.end }
          else {
            val lhs = splitTopLevel(m.group(1)).map(_.trim)
            val disjuncts = splitTopLevel(list).map(_.trim).map { it =>
              val c = balancedClose(it, 0)
              val rhs = splitTopLevel(it.substring(1, c)).map(_.trim)
              require(rhs.size == lhs.size,
                s"row-IN arity mismatch: $it vs (${lhs.mkString(",")})")
              "(" + lhs.zip(rhs)
                .map { case (a, b) => s"$a = $b" }.mkString(" AND ") + ")"
            }
            val repl = "(" + disjuncts.mkString(" OR ") + ")"
            s = s.substring(0, m.start) + repl + s.substring(close + 1)
            search = m.start + repl.length
          }
      }
    }
    s
  }

  /** `<input> PIVOT (aggs FOR c IN (vals))` → the explicit
    * FILTER + GROUP BY ALL spread. Spark has native PIVOT, but its
    * empty cells are NULL for every aggregate where Calcite records
    * COUNT cells as 0 (quidem PivotTests); the FILTER form computes
    * each aggregate over the value-restricted group, so COUNT's
    * empty-group zero falls out naturally. Output column order matches
    * Calcite (group cols, then value-major agg spread). Value aliases
    * (`'MANAGER' mgr`, `AS "a"`) only name columns — grading is
    * positional — and are dropped.
    */
  private def rewritePivot(s0: String): String = {
    var s = s0
    var found = true
    while (found) {
      found = false
      """(?i)\bPIVOT\s*\(""".r.findAllMatchIn(s)
        .find(m => !inQuoteMap(s)(m.start)) match {
        case None => return s
        case Some(m) =>
          val close = balancedClose(s, m.end - 1)
          require(close > 0, s"unbalanced PIVOT in: $s")
          val body = s.substring(m.end, close)
          // split at the top-level FOR
          val forM = """(?i)\bFOR\b""".r.findAllMatchIn(body).find { fm =>
            var d = 0; var inQ = false
            body.take(fm.start).foreach { c =>
              if (inQ) { if (c == '\'') inQ = false }
              else c match {
                case '\'' => inQ = true
                case '(' => d += 1
                case ')' => d -= 1
                case _ =>
              }
            }
            d == 0 && !inQ
          }.getOrElse(sys.error(s"PIVOT without FOR: $body"))
          // aggregate list: (expr, alias?) — Calcite's output names are
          // REFERENCEABLE (`SELECT "10_COUNT" FROM … PIVOT (COUNT(*)
          // AS "COUNT" …)`), so aliases must be preserved exactly
          def unalias(x: String): (String, Option[String]) = {
            // quoted aliases may already be backticked (the
            // quoted-ident rewrite runs earlier in the chain)
            val am = ("""(?is)^(.*?)\s+(?:AS\s+)?""" +
              """("[^"]*"|`[^`]*`|[A-Za-z_]\w*)\s*$""").r
            am.findFirstMatchIn(x.trim) match {
              case Some(mm)
                if !mm.group(1).trim.isEmpty &&
                  // a trailing close paren means the "alias" candidate
                  // was inside the expression, not after it
                  mm.group(1).trim.count(_ == '(') ==
                    mm.group(1).trim.count(_ == ')') =>
                val a0 = mm.group(2)
                val a =
                  if (a0.startsWith("\""))
                    a0.stripPrefix("\"").stripSuffix("\"")
                  else if (a0.startsWith("`"))
                    a0.stripPrefix("`").stripSuffix("`")
                  else a0.toLowerCase
                (mm.group(1).trim, Some(a))
              case _ => (x.trim, None)
            }
          }
          val aggs = splitTopLevel(body.take(forM.start))
            .map(_.trim).filter(_.nonEmpty).map(unalias)
          val tail = body.drop(forM.end).trim
          val inM = """(?i)\bIN\s*\(""".r.findFirstMatchIn(tail)
            .getOrElse(sys.error(s"PIVOT FOR without IN: $body"))
          val pivotColText = tail.take(inM.start).trim
          val pivotCols =
            (if (pivotColText.startsWith("("))
              splitTopLevel(pivotColText.stripPrefix("(")
                .stripSuffix(")"))
            else Seq(pivotColText)).map(_.trim).filter(_.nonEmpty)
          val inClose = balancedClose(tail, inM.end - 1)
          // value list: tuple-or-literal plus optional alias
          val values = splitTopLevel(tail.substring(inM.end, inClose))
            .map(_.trim).filter(_.nonEmpty).map { v =>
              if (v.startsWith("(")) {
                val c = balancedClose(v, 0)
                val elems = splitTopLevel(v.substring(1, c)).map(_.trim)
                val al = unalias("x " + v.substring(c + 1))._2
                (elems, al)
              } else {
                val (lit, al) = unalias(v)
                (Seq(lit), al)
              }
            }
          // the input: the balanced unit (subquery) or table name
          // immediately before PIVOT
          val (inputStart, input) = precedingRelation(s, m.start)
          // group columns = everything but the pivot column and the
          // aggregate argument columns: spelled via * EXCEPT
          val kw = Set("count", "sum", "min", "max", "avg", "filter",
            "where", "distinct", "and", "or", "not", "case", "when",
            "then", "else", "end", "as", "cast", "stddev", "var_pop",
            "var_samp", "stddev_pop", "stddev_samp")
          val argCols = aggs.flatMap { case (a, _) =>
            """[A-Za-z_]\w*""".r.findAllIn(a).toSeq
              .filterNot(t => kw(t.toLowerCase)) }.distinct
          val exceptList = (pivotCols ++ argCols).distinct.mkString(", ")
          val singleBareAgg = aggs.size == 1 && aggs.head._2.isEmpty
          val spread = for {
            ((elems, valAlias), vi) <- values.zipWithIndex
            ((a, aggAlias), j) <- aggs.zipWithIndex
          } yield {
            // Calcite matches pivot values with `=`: a NULL value
            // matches nothing (PivotTests testPivot#7 records NULL_C
            // = 0 for the mgr-IS-NULL rows)
            val pred = pivotCols.zip(elems)
              .map { case (c, v) => s"$c = $v" }.mkString(" AND ")
            val valPart = valAlias.getOrElse(elems.mkString("_"))
            val name =
              if (singleBareAgg) valPart
              else valPart + "_" + aggAlias.getOrElse(s"__a$j")
            s"$a FILTER (WHERE $pred) AS `$name`"
          }
          val repl = s"(SELECT * EXCEPT ($exceptList), " +
            spread.mkString(", ") +
            s" FROM $input __piv0 GROUP BY ALL)"
          s = s.substring(0, inputStart) + repl + s.substring(close + 1)
          found = true
      }
    }
    s
  }

  /** `ARRAY_AGG(e ORDER BY k [DESC])` (Calcite's in-aggregate ordering;
    * IncrementalRegressionTests issue4447) — Spark's array_agg takes no
    * ORDER BY: sort by a carried key instead
    * (`transform(array_sort(array_agg(struct(k, e))), x -> x.v)`).
    */
  private def rewriteArrayAggOrder(s0: String): String = {
    def topOrderBy(body: String): Option[(String, String, Boolean)] = {
      val re = """(?i)\bORDER\s+BY\b""".r
      re.findAllMatchIn(body).find { m =>
        var depth = 0
        var inQ = false
        body.take(m.start).foreach { c =>
          if (inQ) { if (c == '\'') inQ = false }
          else c match {
            case '\'' => inQ = true
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
        }
        depth == 0 && !inQ
      }.map { m =>
        val e = body.take(m.start).trim
        var key = body.drop(m.end).trim
        val desc = """(?i)\s+DESC\s*$""".r.findFirstIn(key).isDefined
        key = key.replaceAll("(?i)\\s+(ASC|DESC)\\s*$", "")
          .replaceAll("(?i)\\s+NULLS\\s+(FIRST|LAST)\\s*$", "")
        (e, key, desc)
      }
    }
    var s = s0
    var found = true
    while (found) {
      found = false
      """(?i)\bARRAY_AGG\s*\(""".r.findAllMatchIn(s)
        .find { m =>
          !inQuoteMap(s)(m.start) && {
            val close = balancedClose(s, m.end - 1)
            close > 0 && topOrderBy(s.substring(m.end, close)).isDefined
          }
        } match {
        case Some(m) =>
          val close = balancedClose(s, m.end - 1)
          val (e, key, desc) = topOrderBy(s.substring(m.end, close)).get
          val sorted =
            s"array_sort(array_agg(named_struct('o', $key, 'v', $e)))"
          val arr = s"transform(${if (desc) s"reverse($sorted)"
            else sorted}, __x -> __x.v)"
          // a bare select item keeps a REFERENCEABLE name (the long
          // auto-generated one breaks name-keyed view machinery)
          val aliased =
            if ("""(?is)^\s*(,|FROM\b)""".r
              .findPrefixMatchOf(s.substring(close + 1)).isDefined &&
              !"""(?is)AS\s*$""".r.findFirstIn(s.take(m.start)).isDefined)
              arr + " AS __array_agg"
            else arr
          s = s.substring(0, m.start) + aliased + s.substring(close + 1)
          found = true
        case None =>
      }
    }
    s
  }

  /** Calcite's `(datetime - datetime) UNIT` interval qualifier
    * (`(t0 - TIMESTAMP '…') HOURS AS t`, StreamingTests
    * rollingInterval) → `CAST((…) AS INTERVAL UNIT)`. Narrow on
    * purpose: the balanced group must contain a top-level '-'
    * (the construct only exists for datetime subtraction) so a
    * subquery aliased `day`/`hour` never matches. Runs AFTER the
    * dynamic-INTERVAL rewrite consumed `INTERVAL (expr) UNIT` forms.
    */
  private def rewriteParenIntervalQualifier(s0: String): String = {
    val unitRe =
      """(?i)\)\s*(YEAR|MONTH|DAY|HOUR|MINUTE|SECOND)S?\b(?!\s+TO\b)""".r
    var s = s0
    var search = 0
    var guard = 0
    while (guard < 1000) {
      guard += 1
      val qm = unitRe.findAllMatchIn(s)
        .find(m => m.start >= search && !inQuoteMap(s)(m.start))
      qm match {
        case None => return s
        case Some(m) =>
          // backtrack to the matching '('
          var depth = 0
          var open = -1
          var j = m.start
          while (open < 0 && j >= 0) {
            s.charAt(j) match {
              case ')' => depth += 1
              case '(' => depth -= 1; if (depth == 0) open = j
              case _ =>
            }
            j -= 1
          }
          val group = if (open >= 0) s.substring(open, m.start + 1) else ""
          // last top-level binary '-' inside the group
          val minusIdx: Int = if (open < 0) -1 else {
            var d = 0; var inQ = false; var idx = -1
            var prev = ' '
            var k = 0
            group.foreach { c =>
              if (inQ) { if (c == '\'') inQ = false }
              else c match {
                case '\'' => inQ = true
                case '(' => d += 1
                case ')' => d -= 1
                case '-' if d == 1 && !"(,+-*/<>=".contains(prev) =>
                  idx = k
                case _ =>
              }
              if (!c.isWhitespace) prev = c
              k += 1
            }
            idx
          }
          if (minusIdx > 0) {
            val unit = m.group(1).toUpperCase
            val repl = unit match {
              // Spark cannot cast a day-time interval to year-month;
              // Calcite's `(ts1 - ts2) MONTH/YEAR` is the CALENDAR
              // difference — lower to TIMESTAMPDIFF
              case "YEAR" | "MONTH" =>
                val lhs = group.substring(1, minusIdx).trim
                val rhs = group.substring(minusIdx + 1,
                  group.length - 1).trim
                s"(INTERVAL '1' $unit * TIMESTAMPDIFF($unit, $rhs, $lhs))"
              case _ => s"CAST($group AS INTERVAL $unit)"
            }
            s = s.substring(0, open) + repl + s.substring(m.end)
            search = open
          } else search = m.end
      }
    }
    s
  }

  /** `UNNEST(` → Spark's explode table function. A comma-join UNNEST
    * may be CORRELATED (`FROM m, UNNEST(m.data)`) — Spark needs the
    * LATERAL keyword there; and Calcite's single bare alias names the
    * COLUMN (`UNNEST(data) AS v` → column v), which Spark spells
    * `AS v(v)`.
    */
  private def rewriteUnnest(s0: String): String = {
    var s = s0
    var found = true
    while (found) {
      found = false
      """(?i)(,\s*|\bJOIN\s+)?\bUNNEST\s*\(""".r.findAllMatchIn(s)
        .find(m => !inQuoteMap(s)(m.start)) match {
        case Some(m) =>
          val lateral = Option(m.group(1)).isDefined
          val open = m.end - 1
          val close = balancedClose(s, open)
          require(close > 0, s"unbalanced UNNEST in: $s")
          val args = s.substring(open + 1, close)
          val after = s.substring(close + 1)
          // `WITH ORDINALITY AS t(v, o)` → posexplode (1-based)
          val withOrd = ("""(?is)^\s+WITH\s+ORDINALITY\s+AS\s+""" +
            """(\w+)\s*\(([^)]*)\)""").r
          withOrd.findPrefixMatchOf(after) match {
            case Some(wm) =>
              val cols = wm.group(2).split(",").map(_.trim).toSeq
              require(cols.size == 2, "UNNEST WITH ORDINALITY takes " +
                s"a (value, ordinal) alias list; got ${wm.group(2)}")
              // args evaluate in a Project below the generator (a SQL
              // UDF — split_f — may not appear inside Generate itself)
              val repl = (if (lateral) m.group(1) + "LATERAL " else "") +
                s"(SELECT __uv AS ${cols.head}, __up + 1 AS " +
                s"${cols(1)} FROM (SELECT posexplode(__ua) AS " +
                s"(__up, __uv) FROM (SELECT ($args) AS __ua) __u1) " +
                s"__u0) ${wm.group(1)}"
              s = s.substring(0, m.start) + repl +
                s.substring(close + 1 + wm.end)
            case None =>
              // single bare alias names the column: `AS v` → `AS v(v)`
              val bareAlias =
                """(?is)^\s+AS\s+([A-Za-z_]\w*)\s*(?![\w(])""".r
              val (tail, tailLen) =
                bareAlias.findPrefixMatchOf(after) match {
                  case Some(am) =>
                    (s" AS ${am.group(1)}(${am.group(1)})", am.end)
                  case None => ("", 0)
                }
              val kw = if (lateral) m.group(1) + "LATERAL explode("
                else "explode("
              s = s.substring(0, m.start) + kw + args + ")" + tail +
                s.substring(close + 1 + tailLen)
          }
          found = true
        case None =>
      }
    }
    s
  }

  /** Calcite allows `GROUPING(c)` under a PLAIN `GROUP BY c` (it is
    * then the constant 0 — quidem AggTests testGrouping#1), and in the
    * ORDER BY above such an aggregate; Spark only resolves GROUPING
    * under GroupingSets/Cube/Rollup. `GROUP BY list` is semantically
    * identical to `GROUP BY GROUPING SETS ((list))`, so when a
    * statement mentions GROUPING(/GROUPING_ID( anywhere, plain GROUP
    * BY lists are wrapped. Only fires on such statements — everything
    * else keeps the plain (Expand-free) aggregate plan.
    */
  private def rewriteGroupingSetsWrap(s: String): String = {
    val usesGrouping = """(?i)\bGROUPING(_ID)?\s*\(""".r
      .findFirstMatchIn(s).exists(m => !inQuoteMap(s)(m.start))
    if (!usesGrouping) return s
    val re = """(?i)\bGROUP\s+BY\b""".r
    val enders = Seq("HAVING", "QUALIFY", "WINDOW", "ORDER", "LIMIT",
      "OFFSET", "FETCH", "UNION", "EXCEPT", "INTERSECT")
    re.findAllMatchIn(s).toSeq
      .filter(mm => !inQuoteMap(s)(mm.start))
      .reverse.foldLeft(s) { (acc, m) =>
        // clause extent: scan at the clause's own depth until a
        // closing paren below it, a top-level clause keyword, or ';'
        var i = m.end
        var depth = 0
        var inQ = false
        var end = -1
        while (end < 0 && i < acc.length) {
          val c = acc.charAt(i)
          if (inQ) { if (c == '\'') inQ = false }
          else c match {
            case '\'' => inQ = true
            case '(' => depth += 1
            case ')' => if (depth == 0) end = i else depth -= 1
            case ';' if depth == 0 => end = i
            case ch if depth == 0 && Character.isLetter(ch) &&
              (i == 0 || !Character.isLetterOrDigit(acc.charAt(i - 1))
                && acc.charAt(i - 1) != '_') =>
              val word = acc.substring(i).takeWhile(x =>
                Character.isLetterOrDigit(x) || x == '_').toUpperCase
              if (enders.contains(word)) end = i
            case _ =>
          }
          i += 1
        }
        if (end < 0) end = acc.length
        val list = acc.substring(m.end, end)
        if ("""(?i)\b(ROLLUP|CUBE|GROUPING)\b""".r
          .findFirstIn(list).isDefined || list.trim.isEmpty) acc
        else acc.substring(0, m.start) +
          s"GROUP BY GROUPING SETS ((${list.trim})) " +
          acc.substring(end)
      }
  }

  /** `CAST(x AS BINARY(n))` / `CAST(x AS VARBINARY[(n)])` lower onto
    * [[org.apache.spark.sql.graft.GraftToBinary]] — the reference's
    * width-adjusting, integral-capable binary cast (casts.rs:3595;
    * Spark erases the width and refuses integral sources). The bare
    * `AS BINARY` cast stays Spark-native (string/binary sources,
    * codegen'd).
    */
  private def rewriteBinaryCast(s: String): String = {
    val re = """(?i)\bCAST\s*\(""".r
    re.findAllMatchIn(s).toSeq
      .filter(mm => !inQuoteMap(s)(mm.start))
      .reverse.foldLeft(s) { (acc, m) =>
        var depth = 1
        var i = m.end
        var inQ = false
        var asAt = -1
        var close = -1
        while (close < 0 && i < acc.length) {
          val c = acc.charAt(i)
          if (inQ) { if (c == '\'') inQ = false }
          else c match {
            case '\'' => inQ = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case 'A' | 'a' if depth == 1 =>
              if (acc.regionMatches(true, i, "AS", 0, 2) && i > 0 &&
                !Character.isLetterOrDigit(acc.charAt(i - 1)) &&
                i + 2 < acc.length &&
                !Character.isLetterOrDigit(acc.charAt(i + 2))) asAt = i
            case _ =>
          }
          i += 1
        }
        val binN =
          """(?i)^(VAR)?BINARY(?:\s*\(\s*(\d+)\s*\))?$""".r
        // the run block's ROW-constructor rewrite has already renamed
        // a `ROW(a T, b T)` cast TARGET to struct(...) — match both
        val rowT = """(?is)^(?:ROW|STRUCT)\s*\((.*)\)$""".r
        if (close < 0 || asAt < 0) acc
        else acc.substring(asAt + 2, close).trim match {
          case binN(varPrefix, n)
            if varPrefix != null || n != null => // bare BINARY: native
            val x = acc.substring(m.end, asAt).trim
            val size = Option(n).getOrElse("-1")
            val fixed = varPrefix == null
            acc.substring(0, m.start) +
              s"graft_to_binary($x, $size, $fixed)" +
              acc.substring(close + 1)
          case t if t.equalsIgnoreCase("UUID") =>
            // type-directed (string canonicalize / binary decode)
            val x = acc.substring(m.end, asAt).trim
            acc.substring(0, m.start) + s"graft_to_uuid($x)" +
              acc.substring(close + 1)
          case rowT(fields) =>
            // ROW(a T1, b T2) type → STRUCT<a: T1, b: T2>
            val mapped = splitTopLevel(fields).map(_.trim)
              .filter(_.nonEmpty).map { d =>
                val parts = d.split("\\s+", 2)
                s"${parts(0)}: ${mapBareTypes(parts(1))}"
              }.mkString("STRUCT<", ", ", ">")
            acc.substring(0, asAt + 2) + " " + mapped +
              acc.substring(close)
          case _ => acc
        }
      }
  }

  /** Multi-argument `GROUPING(a, b, …)` and every `GROUPING_ID(…)`
    * (SQL standard / Calcite) lower to the explicit bit sum
    * `Σ CAST(GROUPING(argᵢ) AS BIGINT) * 2^(n-1-i)` — the same bitmask
    * (leftmost argument = most significant bit), but Spark's native
    * GROUPING_ID insists the argument list equal the grouping columns
    * exactly, where Calcite allows any subset / reorder / repeat
    * (quidem AggTests testGrouping). Spark's one-argument GROUPING is
    * left untouched; `GROUPING SETS (` never matches (SETS intervenes).
    */
  private def rewriteMultiArgGrouping(s0: String): String = {
    def lower(s: String, name: String, minArgs: Int): String = {
      val re = ("""(?i)\b""" + name + """\s*\(""").r
      re.findAllMatchIn(s).toSeq
        .filter(mm => !inQuoteMap(s)(mm.start))
        .reverse.foldLeft(s) { (acc, m) =>
          var depth = 1
          var i = m.end
          var inQ = false
          var close = -1
          while (close < 0 && i < acc.length) {
            val c = acc.charAt(i)
            if (inQ) { if (c == '\'') inQ = false }
            else c match {
              case '\'' => inQ = true
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = i
              case _ =>
            }
            i += 1
          }
          if (close < 0) acc
          else {
            val args = splitTopLevel(acc.substring(m.end, close))
              .map(_.trim).filter(_.nonEmpty)
            if (args.size < minArgs) acc
            else {
              val n = args.size
              val sum = args.zipWithIndex.map { case (a, k) =>
                val shift = 1L << (n - 1 - k)
                if (shift == 1L) s"CAST(GROUPING($a) AS BIGINT)"
                else s"CAST(GROUPING($a) AS BIGINT) * $shift"
              }.mkString("(", " + ", ")")
              acc.substring(0, m.start) + sum + acc.substring(close + 1)
            }
          }
        }
    }
    // GROUPING_ID first, so the GROUPING(…) calls it emits (zero top-
    // level commas each) are not re-visited by the multi-arg pass
    lower(lower(s0, "GROUPING_ID", 1), "GROUPING", 2)
  }

  /** Strip SQL comments — `--` to end-of-line and (nested) block
    * comments — outside string literals, BEFORE any rewriter scans the
    * text: a QUALIFY/ASOF/DISTINCT ON spelled inside a comment must
    * never trigger a lowering, and a quote or semicolon inside a
    * comment must never derail the quote/statement scanners. Optimizer
    * hint blocks (slash-star-PLUS openers) survive verbatim — they are
    * semantic here ([[rewriteHints]]). Each comment is replaced by one
    * space so it keeps separating tokens.
    */
  private[graft] def stripComments(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    var inQ = false   // single-quoted string literal
    var inD = false   // double-quoted identifier
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { sb += c; if (c == '\'') inQ = false; i += 1 }
      else if (inD) { sb += c; if (c == '"') inD = false; i += 1 }
      else if (c == '\'') { sb += c; inQ = true; i += 1 }
      else if (c == '"') { sb += c; inD = true; i += 1 }
      else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
        sb += ' '
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*' &&
          i + 2 < s.length && s.charAt(i + 2) == '+') {
        val end = s.indexOf("*/", i + 2)
        val stop = if (end < 0) s.length else end + 2
        sb.append(s.substring(i, stop))
        i = stop
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        var depth = 1
        i += 2
        while (i < s.length && depth > 0) {
          if (s.charAt(i) == '/' && i + 1 < s.length &&
            s.charAt(i + 1) == '*') { depth += 1; i += 2 }
          else if (s.charAt(i) == '*' && i + 1 < s.length &&
            s.charAt(i + 1) == '/') { depth -= 1; i += 2 }
          else i += 1
        }
        sb += ' '
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private val hintBlock = """(?s)/\*\+(.*?)\*/""".r

  /** Map the reference's optimizer hints (grammar.md "SQL hints") onto
    * Spark's join-strategy hints. Query-position hints (right after
    * SELECT) translate name-wise: `broadcast(t)` → `BROADCAST(t)` (the
    * same strategy), `shard(t)` → `SHUFFLE_HASH(t)` (hash join with the
    * named input sharded), `balance(t)` → `SHUFFLE_HASH(t)` (the
    * reference's balanced hashing on all fields has no exact Spark
    * counterpart; a shuffled hash join is the closest strategy — AQE's
    * skew handling covers the balancing concern). Unrecognized hint
    * names pass through — Spark warns on unknown hints, it does not
    * fail. Table-position hints (a hint block after a relation name,
    * e.g. a size hint) have no Spark surface and are dropped with a
    * note. Hints inside string literals are untouched.
    */
  private def rewriteHints(s: String): String =
    hintBlock.replaceSomeIn(s, m => {
      if (inQuoteMap(s)(m.start)) None
      else {
        var j = m.start - 1
        while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
        val e = j
        while (j >= 0 && (s.charAt(j).isLetterOrDigit ||
          s.charAt(j) == '_')) j -= 1
        if (s.substring(j + 1, e + 1).equalsIgnoreCase("SELECT")) {
          val mapped = m.group(1)
            .replaceAll("(?i)\\bbroadcast\\b", "BROADCAST")
            .replaceAll("(?i)\\bshard\\b", "SHUFFLE_HASH")
            .replaceAll("(?i)\\bbalance\\b", "SHUFFLE_HASH")
          Some(java.util.regex.Matcher.quoteReplacement(s"/*+$mapped*/"))
        } else {
          System.err.println("graft: dropping table-position hint " +
            s"'/*+${m.group(1).trim}*/' (no Spark surface)")
          // a space, not an empty string: `t/*+hint*/JOIN` must not
          // fuse into `tJOIN` (same rule as stripComments)
          Some(" ")
        }
      }
    })

  private val asofJoinKw = """(?is)\b(LEFT\s+)?ASOF\s+JOIN\b""".r

  /** Lower the reference's ASOF join spelling (grammar.md "ASOF joins":
    * `L [LEFT] ASOF JOIN R MATCH_CONDITION (L.t >= R.t) ON L.k = R.k`
    * — for each left row, the single matching right row with the
    * closest timestamp; reference operator
    * crates/dbsp/src/operator/asof_join.rs:37, lowered by
    * LowerAsof.java) onto Spark as the union+window form of
    * [[graft.ops.AsofJoin]] — the scale-correct plan (one exchange on
    * the key + one sort, O(n log n); a lateral top-1 probe decorrelates
    * into a quadratic DISTINCT(ts)×build nested loop — measured at
    * sf0.1):
    *
    * {{{
    *   (SELECT __l.*, __r.*, __l AS L, __r AS R FROM (
    *      SELECT __side, __l, last(__r0, true) OVER (
    *        PARTITION BY __k0… ORDER BY __ts <dir> NULLS FIRST,
    *        __side ASC ROWS UNBOUNDED PRECEDING) AS __r
    *      FROM (SELECT lk AS __k0, lts AS __ts, 1 AS __side,
    *              struct(L.*) AS __l, NULL AS __r0 FROM <left>
    *            UNION ALL
    *            SELECT rk, rts, 0, NULL, struct(R.*) FROM <right>
    *              WHERE rk IS NOT NULL AND rts IS NOT NULL) __u
    *    ) __w WHERE __side = 1 [AND __r IS NOT NULL]) __asof_L_R
    * }}}
    *
    * The lowering is schema-free: `struct(alias.*)` carries each
    * side's whole row, Spark's union widens the bare `NULL` branch to
    * the struct type, and `__l.*`/`__r.*` re-flatten. Qualified
    * references in the surrounding statement (`L.c`, `R.c`, `L.*`)
    * keep resolving with no text surgery because the two original
    * aliases are re-exposed as struct columns — Spark resolves `L.c`
    * as struct-field access. Build rows with a NULL key or NULL
    * timestamp are filtered (an equi-join never matches NULL); probe
    * rows with NULL key/ts sort into an empty frame (NULLS FIRST) and
    * null-extend (LEFT) or drop (inner). A tie (equal ts) matches —
    * the build side (__side 0) sorts first. The reversed condition
    * (`R.t >= L.t`, earliest following match) flips the sort to DESC
    * so both directions stay on the O(n) running-frame execution path.
    *
    * Shapes the union+window form cannot prove — a left operand that
    * is itself a join tree, an ON condition that is not a conjunction
    * of equalities splitting cleanly across the two aliases, or a bare
    * `*` select list over a multi-item FROM clause — are a loud ERROR
    * by default; `SET asof_lateral_fallback = ON` opts in to the
    * LATERAL top-1 probe instead (correct, config-scale only —
    * quadratic under decorrelation). A bare `*` whose FROM is exactly
    * this ASOF join is rewritten to `L.*, R.*`.
    */
  private def rewriteAsofJoin(s: String): String =
    asofJoinKw.findAllMatchIn(s).find(m => !inQuoteMap(s)(m.start)) match {
      case None => s
      case Some(m) =>
        val isLeft = m.group(1) != null
        val baseDepth = depthAt(s, m.start)
        var i = m.end
        def skipWs(): Unit =
          while (i < s.length && s.charAt(i).isWhitespace) i += 1
        def balanceFrom(p: Int): Int = {
          var depth = 0
          var inQ = false
          var j = p
          var close = -1
          while (close < 0 && j < s.length) {
            val c = s.charAt(j)
            if (inQ) { if (c == '\'') inQ = false }
            else c match {
              case '\'' => inQ = true
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = j
              case _ => ()
            }
            j += 1
          }
          require(close > 0, s"unbalanced parens in ASOF JOIN: $s")
          close
        }
        def ident(): String = {
          val st = i
          while (i < s.length &&
            (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          s.substring(st, i)
        }
        skipWs()
        val opStart = i
        var tableName = ""
        if (i < s.length && s.charAt(i) == '(') i = balanceFrom(i) + 1
        else tableName = ident()
        skipWs()
        // optional [AS] alias (stop at the MATCH_CONDITION keyword)
        var alias = ""
        val save = i
        val w1 = ident()
        if (w1.nonEmpty && !w1.equalsIgnoreCase("MATCH_CONDITION")) {
          if (w1.equalsIgnoreCase("AS")) { skipWs(); alias = ident() }
          else alias = w1
          // optional alias column list: `AS t2(k2, ts2)`
          skipWs()
          if (i < s.length && s.charAt(i) == '(') i = balanceFrom(i) + 1
        } else i = save
        val rightOperand = s.substring(opStart, i).trim
        require(alias.nonEmpty || tableName.nonEmpty,
          s"ASOF JOIN subquery operand needs an alias: $s")
        val rName = if (alias.nonEmpty) alias else tableName
        skipWs()
        val kw = ident()
        require(kw.equalsIgnoreCase("MATCH_CONDITION"),
          s"ASOF JOIN requires MATCH_CONDITION, got '$kw' in: $s")
        skipWs()
        // parenthesized or bare condition (both appear in the
        // reference's corpora: `MATCH_CONDITION (a >= b)` and
        // `MATCH_CONDITION a < b ON ...`)
        val mc =
          if (i < s.length && s.charAt(i) == '(') {
            val mcClose = balanceFrom(i)
            val r = s.substring(i + 1, mcClose)
            i = mcClose + 1
            r
          } else {
            val st = i
            var onAt = -1
            var d = 0
            var q = false
            while (onAt < 0 && i < s.length) {
              val c = s.charAt(i)
              if (q) { if (c == '\'') q = false; i += 1 }
              else c match {
                case '\'' => q = true; i += 1
                case '(' => d += 1; i += 1
                case ')' => d -= 1; i += 1
                case c0 if d == 0 && (c0 == 'O' || c0 == 'o') &&
                    (i == 0 || !(s.charAt(i - 1).isLetterOrDigit ||
                      s.charAt(i - 1) == '_')) &&
                    i + 2 <= s.length &&
                    s.regionMatches(true, i, "ON", 0, 2) &&
                    (i + 2 >= s.length ||
                      !(s.charAt(i + 2).isLetterOrDigit ||
                        s.charAt(i + 2) == '_')) => onAt = i
                case _ => i += 1
              }
            }
            require(onAt >= 0, s"ASOF JOIN requires an ON condition: $s")
            val r = s.substring(st, onAt).trim
            i = onAt
            r
          }
        skipWs()
        require(ident().equalsIgnoreCase("ON"),
          s"ASOF JOIN requires an ON condition: $s")
        // ON condition extends to the first base-depth clause/join
        // keyword, a base-depth comma, a paren closing below base
        // depth, or end-of-text
        val stopKw = Set("WHERE", "GROUP", "HAVING", "QUALIFY", "WINDOW",
          "ORDER", "LIMIT", "OFFSET", "FETCH", "UNION", "EXCEPT",
          "INTERSECT", "MINUS", "LEFT", "RIGHT", "FULL", "INNER", "CROSS",
          "JOIN", "NATURAL", "ASOF", "OUTER")
        val onStart = i
        var depth = baseDepth
        var inQ = false
        var onEnd = -1
        while (onEnd < 0 && i < s.length) {
          val c = s.charAt(i)
          if (inQ) { if (c == '\'') inQ = false; i += 1 }
          else c match {
            case '\'' => inQ = true; i += 1
            case '(' => depth += 1; i += 1
            case ')' =>
              if (depth == baseDepth) onEnd = i else { depth -= 1; i += 1 }
            case ',' if depth == baseDepth => onEnd = i
            case c0 if c0.isLetter && depth == baseDepth &&
                (i == 0 || !(s.charAt(i - 1).isLetterOrDigit ||
                  s.charAt(i - 1) == '_' || s.charAt(i - 1) == '.')) =>
              val st = i
              var j = i
              while (j < s.length && (s.charAt(j).isLetterOrDigit ||
                s.charAt(j) == '_')) j += 1
              val word = s.substring(st, j).toUpperCase
              if (stopKw.contains(word)) onEnd = st else i = j
            case _ => i += 1
          }
        }
        if (onEnd < 0) onEnd = s.length
        val onCond = s.substring(onStart, onEnd).trim
        // the comparison operator: >=, <=, > or < at top level (the
        // reference's AsofTests exercise all four; <> is not a match op)
        val (opIdx, op) = {
          var j = 0
          var d = 0
          var q = false
          var at = -1
          var o = ""
          while (at < 0 && j < mc.length) {
            val c = mc.charAt(j)
            if (q) { if (c == '\'') q = false }
            else c match {
              case '\'' => q = true
              case '(' => d += 1
              case ')' => d -= 1
              case '>' if d == 0 =>
                if (j + 1 < mc.length && mc.charAt(j + 1) == '=') {
                  at = j; o = ">="
                } else { at = j; o = ">" }
              case '<' if d == 0 =>
                if (j + 1 < mc.length && mc.charAt(j + 1) == '=') {
                  at = j; o = "<="
                } else if (j + 1 < mc.length && mc.charAt(j + 1) == '>') {
                  j += 1 // <> is not a match comparison
                } else { at = j; o = "<" }
              case _ => ()
            }
            j += 1
          }
          require(at >= 0,
            s"MATCH_CONDITION must use one of >= <= > < : $mc")
          (at, o)
        }
        val (lhs, rhs) = (mc.substring(0, opIdx).trim,
          mc.substring(opIdx + op.length).trim)
        // right-side reference: `alias.` prefix, or — when the right
        // operand declares an alias column list (`... AS t2(k2, ts2)`)
        // — a bare identifier from that list (AsofTests uses
        // `MATCH_CONDITION ts2 < ts1` unqualified)
        val rightCols: Set[String] =
          """(?is)\)\s*(?:AS\s+)?\w+\s*\(([^)]*)\)\s*$""".r
            .findFirstMatchIn(rightOperand)
            .map(_.group(1).split(",").map(_.trim.toLowerCase).toSet)
            .getOrElse(Set.empty)
        val refsRight = (e: String) =>
          ("(?i)\\b" + java.util.regex.Pattern.quote(rName) + "\\s*\\.").r
            .findFirstIn(e).isDefined ||
            (e.matches("(?i)[A-Za-z_]\\w*") &&
              rightCols(e.trim.toLowerCase))
        require(refsRight(lhs) != refsRight(rhs),
          s"MATCH_CONDITION must compare the right table's column " +
            s"($rName.*) against a left expression: $mc")
        // normalize to `Lexpr NOP Rexpr` to read the scan direction
        val nop =
          if (refsRight(lhs))
            op match { case ">=" => "<="; case "<=" => ">="
              case ">" => "<"; case _ => ">" }
          else op
        // backward = latest PRECEDING build row; strict excludes ties
        val backward = nop == ">=" || nop == ">"
        val strict = !nop.contains('=')
        val (orderExpr, dir) =
          (if (refsRight(rhs)) rhs else lhs,
            if (backward) "DESC" else "ASC")
        val replaced = lowerAsofUnionWindow(s, m.start, onEnd, baseDepth,
          isLeft, rightOperand, rName, lhs, rhs, refsRight, onCond,
          backward, strict)
          .getOrElse {
            if (!asofLateralOptIn.get) sys.error(
              "graft: ASOF JOIN shape not provable for the union+window " +
                "lowering (the left operand is a join tree that cannot " +
                "be wrapped, the ON clause is not a conjunction of " +
                "cross-alias equalities, or a bare * spans a multi-item " +
                "FROM): «" +
                s.substring(m.start, math.min(onEnd, m.start + 200)) +
                "» — the LATERAL top-1 probe is quadratic under " +
                "decorrelation (config scale only); opt in explicitly " +
                "with SET asof_lateral_fallback = ON")
            System.err.println("graft: ASOF JOIN shape not provable for " +
              "the union+window lowering; falling back to the LATERAL " +
              "top-1 probe (correct, but quadratic under decorrelation " +
              "- config scale only) per SET asof_lateral_fallback = ON")
            val joinKw = if (isLeft) "LEFT OUTER JOIN LATERAL"
              else "CROSS JOIN LATERAL"
            val onTrue = if (isLeft) " ON TRUE" else ""
            s.substring(0, m.start) +
              s"$joinKw (SELECT * FROM $rightOperand WHERE ($onCond) AND " +
              s"($mc) ORDER BY $orderExpr $dir LIMIT 1) $rName$onTrue " +
              s.substring(onEnd).trim
          }
        rewriteAsofJoin(replaced)
    }

  /** The union+window ASOF emission (see [[rewriteAsofJoin]]). Returns
    * None when a precondition cannot be proven from the text — the
    * caller falls back to the lateral probe.
    */
  private def lowerAsofUnionWindow(
      s: String, asofStart: Int, onEnd: Int, baseDepth: Int,
      isLeft: Boolean, rightOperand: String, rName: String,
      mcLhs: String, mcRhs: String, refsRight: String => Boolean,
      onCond: String, backward: Boolean, strict: Boolean)
      : Option[String] = {
    val quotes = inQuoteMap(s)
    val identRe = "(?i)^[A-Za-z_]\\w*$".r
    if (!identRe.matches(rName)) return None
    // the governing FROM: the last one before the ASOF at the same depth
    val fromM = """(?is)\bFROM\b""".r.findAllMatchIn(s)
      .filter(fm => fm.end <= asofStart && !quotes(fm.start) &&
        depthAt(s, fm.start) == baseDepth).toSeq.lastOption
      .getOrElse(return None)
    // left operand = the last comma-separated FROM item before the ASOF
    var segStart = fromM.end
    var multiFrom = false
    locally {
      var depth = baseDepth
      var inQ = false
      var i = fromM.end
      while (i < asofStart) {
        val c = s.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == baseDepth =>
            segStart = i + 1; multiFrom = true
          case _ => ()
        }
        i += 1
      }
    }
    if (onEnd < s.length && s.charAt(onEnd) == ',') multiFrom = true
    val seg = s.substring(segStart, asofStart).trim
    if (seg.isEmpty) return None
    // a left operand that is a non table/subquery/ON-join form (APPLY,
    // UNNEST, NATURAL/USING joins, …) is not provable from text — fall
    // back; an ON-join tree takes the multi-alias capture path below
    val disq = Set("APPLY", "LATERAL", "UNNEST", "VALUES",
      "TABLE", "PIVOT", "UNPIVOT", "TABLESAMPLE", "NATURAL", "USING")
    var segHasJoin = false
    locally {
      var depth = 0
      var inQ = false
      var i = 0
      while (i < seg.length) {
        val c = seg.charAt(i)
        if (inQ) { if (c == '\'') inQ = false; i += 1 }
        else c match {
          case '\'' => inQ = true; i += 1
          case '(' => depth += 1; i += 1
          case ')' => depth -= 1; i += 1
          case c0 if c0.isLetter && depth == 0 &&
              (i == 0 || !(seg.charAt(i - 1).isLetterOrDigit ||
                seg.charAt(i - 1) == '_' || seg.charAt(i - 1) == '.')) =>
            var j = i
            while (j < seg.length && (seg.charAt(j).isLetterOrDigit ||
              seg.charAt(j) == '_')) j += 1
            val w = seg.substring(i, j).toUpperCase
            if (disq.contains(w)) return None
            if (w == "JOIN") segHasJoin = true
            i = j
          case _ => i += 1
        }
      }
    }
    // parse `<table|(subquery)> [AS] alias`
    def singleAlias(): Option[String] = Some {
      if (seg.startsWith("(")) {
        var depth = 0
        var inQ = false
        var close = -1
        var j = 0
        while (close < 0 && j < seg.length) {
          val c = seg.charAt(j)
          if (inQ) { if (c == '\'') inQ = false }
          else c match {
            case '\'' => inQ = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = j
            case _ => ()
          }
          j += 1
        }
        if (close < 0) return None
        val rest = seg.substring(close + 1).trim
        // alias may carry a column list: `(subquery) AS t1(k, t)`
        "(?is)^(?:AS\\s+)?([A-Za-z_]\\w*)\\s*(?:\\([^)]*\\))?$".r
          .findFirstMatchIn(rest)
          .map(_.group(1)).getOrElse(return None)
      } else {
        val m0 = ("(?is)^([A-Za-z_][\\w.]*)" +
          "(?:\\s+(?:AS\\s+)?([A-Za-z_]\\w*))?$").r
          .findFirstMatchIn(seg).getOrElse(return None)
        Option(m0.group(2))
          .getOrElse(m0.group(1).split('.').last)
      }
    }
    // the left operand's exposed relation aliases: one for a plain
    // table/subquery, one PER RELATION for an ON-join tree (each is
    // captured as its own struct so qualified references keep resolving)
    val aliases: Seq[String] =
      if (segHasJoin) parseJoinTreeAliases(seg).getOrElse(return None)
      else Seq(singleAlias().getOrElse(return None))
    if (aliases.exists(_.equalsIgnoreCase(rName))) return None
    if (aliases.exists(a =>
        Set("AS", "ON", "WHERE").contains(a.toUpperCase))) return None
    if (aliases.map(_.toLowerCase).distinct.size != aliases.size)
      return None
    val lAlias = aliases.head
    // the ON condition must be a conjunction of equalities, each with
    // exactly one side referencing the right alias
    val conjuncts = splitTopLevelKeyword(onCond, "AND")
    if (conjuncts.exists(c =>
        splitTopLevelKeyword(c, "OR").lengthIs > 1)) return None
    val keyPairs = conjuncts.map { c =>
      val eq = {
        var d = 0
        var q = false
        var at = -1
        var j = 0
        while (at < 0 && j < c.length) {
          val ch = c.charAt(j)
          if (q) { if (ch == '\'') q = false }
          else ch match {
            case '\'' => q = true
            case '(' => d += 1
            case ')' => d -= 1
            case '=' if d == 0 &&
                (j == 0 || !"<>!=".contains(c.charAt(j - 1))) &&
                (j + 1 >= c.length || c.charAt(j + 1) != '=') => at = j
            case _ => ()
          }
          j += 1
        }
        at
      }
      if (eq < 0) return None
      val (a, b) = (c.substring(0, eq).trim, c.substring(eq + 1).trim)
      if (refsRight(a) && !refsRight(b)) (b, a)
      else if (refsRight(b) && !refsRight(a)) (a, b)
      else return None
    }
    // MATCH_CONDITION sides: right-referencing side is the build ts.
    // Backward (L.t >= R.t): latest preceding build — ASC scan.
    // Forward (R.t <= L.t... i.e. R.t >= L.t): earliest following
    // build — DESC scan, so both directions run the O(n) running frame.
    // (backward/strict are resolved by the caller from the operator.)
    val (leftTs, rightTs) =
      if (refsRight(mcRhs)) (mcLhs, mcRhs) else (mcRhs, mcLhs)
    val sortDir = if (backward) "ASC" else "DESC"
    // ties: an inclusive comparison admits equal timestamps, so build
    // rows (__side 0) sort before the probe; a STRICT one excludes
    // them, so equal-ts builds sort after the probe and stay outside
    // the running frame
    val sideDir = if (strict) "DESC" else "ASC"
    // a bare `*` over exactly this FROM item rewrites to `L.*, R.*`;
    // over a multi-item FROM it is not provable — fall back
    var starSpan: Option[(Int, Int, String)] = None
    var starOverMultiFrom = false
    val selM = """(?is)\bSELECT\b""".r.findAllMatchIn(s)
      .filter(sm => sm.end <= fromM.start && !quotes(sm.start) &&
        depthAt(s, sm.start) == baseDepth).toSeq.lastOption
    selM.foreach { sm =>
      var itemStart = sm.end
      var depth = baseDepth
      var inQ = false
      var i = sm.end
      def checkItem(endAt: Int): Unit = {
        val item = s.substring(itemStart, endAt)
        val bare = "(?is)^(\\s*(?:DISTINCT\\s+)?)\\*\\s*$".r
        bare.findFirstMatchIn(item).foreach { bm =>
          if (multiFrom) starOverMultiFrom = true
          else starSpan = Some((itemStart, endAt,
            bm.group(1) + aliases.map(_ + ".*").mkString(", ") +
              s", $rName.* "))
        }
      }
      while (i < fromM.start) {
        val c = s.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else c match {
          case '\'' => inQ = true
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == baseDepth =>
            checkItem(i); itemStart = i + 1
          case _ => ()
        }
        i += 1
      }
      checkItem(fromM.start)
    }
    if (starOverMultiFrom) return None
    val ks = keyPairs.indices.map(i => s"__k$i")
    val b1keys = keyPairs.zipWithIndex
      .map { case ((l, _), i) => s"($l) AS __k$i" }
    val b2keys = keyPairs.map { case (_, r) => s"($r)" }
    val guards = (keyPairs.map(_._2) :+ rightTs)
      .map(e => s"($e) IS NOT NULL").mkString(" AND ")
    val filt = if (isLeft) "__side = 1" else "__side = 1 AND __r IS NOT NULL"
    val fresh = s"__asof_${lAlias}_$rName"
    // left-row capture: one struct for a plain relation; for a join
    // tree, a struct-of-structs so every relation alias is re-exposed
    // and qualified references (a.x, b.y) resolve untouched downstream
    val structCapture =
      if (aliases.sizeIs == 1) s"struct($lAlias.*)"
      else "struct(" + aliases.zipWithIndex
        .map { case (a, i) => s"struct($a.*) AS __s$i" }
        .mkString(", ") + ")"
    val expose =
      if (aliases.sizeIs == 1)
        s"__l.*, __r.*, __l AS $lAlias, __r AS $rName"
      else aliases.indices.map(i => s"__l.__s$i.*").mkString(", ") +
        ", __r.*, " + aliases.zipWithIndex
          .map { case (a, i) => s"__l.__s$i AS $a" }.mkString(", ") +
        s", __r AS $rName"
    val lowered =
      s"(SELECT $expose FROM " +
        s"(SELECT __side, __l, last(__r0, true) OVER (PARTITION BY " +
        s"${ks.mkString(", ")} ORDER BY __ts $sortDir NULLS FIRST, " +
        s"__side $sideDir ROWS BETWEEN UNBOUNDED PRECEDING AND " +
        "CURRENT ROW) " +
        s"AS __r FROM (SELECT ${b1keys.mkString(", ")}, ($leftTs) AS " +
        s"__ts, 1 AS __side, $structCapture AS __l, NULL AS __r0 " +
        s"FROM $seg UNION ALL SELECT ${b2keys.mkString(", ")}, " +
        s"($rightTs), 0, NULL, struct($rName.*) FROM $rightOperand " +
        s"WHERE $guards) __u) __w WHERE $filt) $fresh"
    val sb = new StringBuilder
    starSpan match {
      case Some((ss, se, repl)) =>
        sb.append(s.substring(0, ss)).append(repl)
          .append(s.substring(se, segStart))
      case None => sb.append(s.substring(0, segStart))
    }
    sb.append(' ').append(lowered)
    if (onEnd < s.length) sb.append(' ').append(s.substring(onEnd))
    Some(sb.toString)
  }

  /** Relation aliases of a depth-0 ON-join tree
    * `rel ([INNER|LEFT|RIGHT|FULL|CROSS] [OUTER] JOIN rel [ON expr])*`
    * where each rel is `<table|(subquery)> [AS] alias`. Returns None for
    * anything not provably of that shape (NATURAL/USING trees are
    * rejected upstream — their coalesced columns would change a bare
    * `*`'s schema under the per-alias re-exposure).
    */
  private def parseJoinTreeAliases(seg: String): Option[Seq[String]] = {
    // depth-0 tokens: words (dotted) and whole paren groups; `fn(`-style
    // calls are tagged so a column/function named like a join keyword
    // inside an ON expression is never mistaken for one
    final case class Tok(w: String, call: Boolean)
    val toks = scala.collection.mutable.ArrayBuffer[Tok]()
    locally {
      var i = 0
      var inQ = false
      while (i < seg.length) {
        val c = seg.charAt(i)
        if (inQ) { if (c == '\'') inQ = false; i += 1 }
        else c match {
          case '\'' => inQ = true; i += 1
          case '(' =>
            var d = 0
            var q = false
            var close = -1
            var j = i
            while (close < 0 && j < seg.length) {
              val ch = seg.charAt(j)
              if (q) { if (ch == '\'') q = false }
              else ch match {
                case '\'' => q = true
                case '(' => d += 1
                case ')' => d -= 1; if (d == 0) close = j
                case _ => ()
              }
              j += 1
            }
            if (close < 0) return None
            toks += Tok("()", call = false)
            i = close + 1
          case c0 if c0.isLetter || c0 == '_' =>
            var j = i
            while (j < seg.length && (seg.charAt(j).isLetterOrDigit ||
              seg.charAt(j) == '_' || seg.charAt(j) == '.')) j += 1
            var k = j
            while (k < seg.length && seg.charAt(k).isWhitespace) k += 1
            toks += Tok(seg.substring(i, j),
              call = k < seg.length && seg.charAt(k) == '(')
            i = j
          case _ => i += 1
        }
      }
    }
    val joinKw = Set("JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS")
    val reserved = joinKw ++ Set("OUTER", "NATURAL", "ON", "USING", "AS")
    def isJoinStart(t: Tok) =
      !t.call && t.w != "()" && joinKw.contains(t.w.toUpperCase)
    val aliases = Seq.newBuilder[String]
    var p = 0
    def parseRelation(): Boolean = {
      if (p >= toks.length) return false
      val t = toks(p)
      if (t.w == "()") {
        p += 1
        if (p < toks.length && toks(p).w.equalsIgnoreCase("AS")) p += 1
        if (p < toks.length && toks(p).w != "()" &&
            !reserved.contains(toks(p).w.toUpperCase) &&
            !toks(p).w.contains('.')) {
          aliases += toks(p).w; p += 1; true
        } else false // a subquery relation needs an alias
      } else if (!reserved.contains(t.w.toUpperCase)) {
        p += 1
        var a = t.w.split('.').last
        if (p < toks.length && toks(p).w.equalsIgnoreCase("AS")) {
          p += 1
          if (p >= toks.length || toks(p).w == "()" ||
            reserved.contains(toks(p).w.toUpperCase) ||
            toks(p).w.contains('.')) return false
          a = toks(p).w; p += 1
        } else if (p < toks.length && toks(p).w != "()" &&
            !reserved.contains(toks(p).w.toUpperCase) &&
            !toks(p).w.contains('.') && !toks(p).call) {
          a = toks(p).w; p += 1
        }
        if (a.contains('.') || a.isEmpty) return false
        aliases += a; true
      } else false
    }
    if (!parseRelation()) return None
    var sawJoin = false
    while (p < toks.length) {
      // modifier words up to JOIN
      var cross = false
      var sane = true
      while (p < toks.length && !toks(p).w.equalsIgnoreCase("JOIN")) {
        val w = toks(p).w.toUpperCase
        if (toks(p).call || toks(p).w == "()" ||
          !Set("INNER", "LEFT", "RIGHT", "FULL", "OUTER", "CROSS")
            .contains(w)) { sane = false; p = toks.length }
        else { if (w == "CROSS") cross = true; p += 1 }
      }
      if (!sane || p >= toks.length) return None
      p += 1 // JOIN
      sawJoin = true
      if (!parseRelation()) return None
      if (p < toks.length && toks(p).w.equalsIgnoreCase("ON")) {
        p += 1
        var exprToks = 0
        while (p < toks.length && !isJoinStart(toks(p))) {
          p += 1; exprToks += 1
        }
        if (exprToks == 0) return None
      } else if (!cross && p < toks.length && !isJoinStart(toks(p)))
        return None
      else if (!cross && p >= toks.length) return None
    }
    val out = aliases.result()
    if (!sawJoin || out.size < 2) None else Some(out)
  }

  /** Split on a depth-0, out-of-quote keyword (word-bounded). */
  private def splitTopLevelKeyword(s: String, kw: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = 0
    var depth = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false; i += 1 }
      else c match {
        case '\'' => inQ = true; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c0 if depth == 0 && c0.isLetter &&
            (i == 0 || !(s.charAt(i - 1).isLetterOrDigit ||
              s.charAt(i - 1) == '_' || s.charAt(i - 1) == '.')) =>
          var j = i
          while (j < s.length && (s.charAt(j).isLetterOrDigit ||
            s.charAt(j) == '_')) j += 1
          if (s.substring(i, j).equalsIgnoreCase(kw)) {
            out += s.substring(start, i); start = j
          }
          i = j
        case _ => i += 1
      }
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val distinctOnKw =
    """(?is)\bSELECT\s+DISTINCT\s+ON\s*\(""".r

  /** Lower `SELECT DISTINCT ON (exprs) <list> FROM … [ORDER BY …]`
    * (grammar.md:367-372 — PostgreSQL-style first-row-per-group; the ON
    * exprs must be a prefix of the ORDER BY) onto Spark, which has no
    * DISTINCT ON: ROW_NUMBER partitioned by the ON exprs and ordered by
    * the statement's ORDER BY items (the partition prefix is constant
    * within a partition, so including it is harmless), filtered to 1 —
    * the QUALIFY lowering's shape, with the same select-list
    * alias-substitution so ON/ORDER references to aliases evaluate in
    * scope. Without an ORDER BY the first row is unspecified, as in
    * PostgreSQL (the window orders by the ON exprs alone). A DISTINCT
    * ON inside a subquery (depth > 0) is lowered by recursing into its
    * innermost enclosing paren group — the grammar allows one per
    * SELECT block.
    */
  private def rewriteDistinctOn(s: String, adHoc: Boolean): String =
    distinctOnKw.findAllMatchIn(s)
      .find(m => !inQuoteMap(s)(m.start))
    match {
      case None => s
      case Some(m) if depthAt(s, m.start) > 0 =>
        val (open, close) = enclosingGroup(s, m.start)
        rewriteDistinctOn(s.substring(0, open + 1) +
          rewriteDistinctOn(s.substring(open + 1, close), adHoc = false) +
          s.substring(close), adHoc)
      case Some(m) =>
        val onClose = {
          var depth = 0
          var inQ = false
          var j = m.end - 1
          var close = -1
          while (close < 0 && j < s.length) {
            val c = s.charAt(j)
            if (inQ) { if (c == '\'') inQ = false }
            else c match {
              case '\'' => inQ = true
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = j
              case _ => ()
            }
            j += 1
          }
          require(close > 0, s"unbalanced DISTINCT ON clause: $s")
          close
        }
        val onExprs = splitTopLevel(s.substring(m.end, onClose))
          .map(_.trim)
        val fromStart = """(?is)\bFROM\b""".r.findAllMatchIn(s)
          .map(_.start)
          .find(p => p > onClose && !inQuoteMap(s)(p) &&
            depthAt(s, p) == 0)
          .getOrElse(sys.error(s"DISTINCT ON without FROM: $s"))
        val list = s.substring(onClose + 1, fromStart)
        // the trailing ORDER BY of this statement (depth 0)
        val orderM = """(?is)\bORDER\s+BY\b""".r.findAllMatchIn(s)
          .find(p => p.start > fromStart && !inQuoteMap(s)(p.start) &&
            depthAt(s, p.start) == 0)
        val (bodyEnd, orderItems, tail) = orderM match {
          case None => (s.length, onExprs, "")
          case Some(om) =>
            val limStart = """(?is)\b(LIMIT|OFFSET|FETCH)\b""".r
              .findAllMatchIn(s).map(_.start)
              .find(p => p > om.end && !inQuoteMap(s)(p) &&
                depthAt(s, p) == 0)
            // the ORDER BY may reference columns the select list does
    // not project (legal in DISTINCT ON); those are visible to the
    // WINDOW inside the subquery but not through it — so in a VIEW
    // body the trailing ORDER BY is DROPPED unless a LIMIT/OFFSET
    // makes it semantic (relation output is an unordered Z-set; pure
    // ordering is decorative). For an AD-HOC statement the user asked
    // for a presentation order, so it is kept — and fails loudly at
    // analysis if it names an unprojected column.
            (om.start,
              splitTopLevel(s.substring(om.end,
                limStart.getOrElse(s.length))).map(_.trim),
              if (adHoc || limStart.isDefined) s.substring(om.start)
              else "")
        }
        val body = s.substring(fromStart, bodyEnd)
        // strip trailing ASC/DESC/NULLS markers for alias substitution
        val aliases = splitTopLevel(list).flatMap { item =>
          val as = lastTopLevelAsIdx(item)
          if (as < 0) None
          else {
            val name = item.substring(as + 2).trim
              .stripPrefix("\"").stripSuffix("\"")
            if (name.matches("(?i)\\w+"))
              Some(name.toLowerCase -> item.substring(0, as).trim)
            else None
          }
        }.toMap
        def subst(e: String): String =
          if (aliases.isEmpty) e
          else aliases.foldLeft(e) { case (acc, (n, ex)) =>
            // only substitute when the item IS the bare alias (possibly
            // with a direction suffix); expressions keep their
            // spelling, and a qualified reference `t.<name>` — the
            // alias name used as a relation qualifier — is untouched
            // (the lookahead rejects a following dot)
            acc.replaceAll("(?i)^" + java.util.regex.Pattern.quote(n) +
              "\\b(?!\\s*\\.)",
              java.util.regex.Matcher.quoteReplacement(s"($ex)"))
          }
        val part = onExprs.map(subst).mkString(", ")
        val ord = orderItems.map(subst).mkString(", ")
        rewriteDistinctOn(
          s.substring(0, m.start) +
            "SELECT * EXCEPT (__dn) FROM (SELECT " + list.trim +
            s", ROW_NUMBER() OVER (PARTITION BY $part ORDER BY $ord) " +
            s"AS __dn ${body.trim}) __don WHERE __dn = 1" +
            (if (tail.isEmpty) "" else " " + tail.trim), adHoc)
    }

  private val qualifyKw = """(?is)\bQUALIFY\b""".r

  /** Lower a top-level `QUALIFY <pred>` (grammar.md:721 — filter on
    * window aggregates, evaluated after the SELECT list) onto Spark,
    * which has no QUALIFY clause:
    *
    * {{{
    *   SELECT <list> FROM … QUALIFY <pred> [ORDER BY …]
    *   ⇒ SELECT * EXCEPT (__q) FROM (
    *       SELECT <list>, (<pred'>) AS __q FROM …) __qualify
    *     WHERE __q [ORDER BY …]
    * }}}
    *
    * where `<pred'>` is the predicate with references to SELECT-list
    * aliases substituted by their expressions (so the predicate
    * evaluates in the same scope as the list — a window alias reference
    * like `QUALIFY rn = 1` inlines the window expression, which the
    * optimizer de-duplicates against the list's own copy). A QUALIFY
    * inside a subquery (depth > 0) is lowered by recursing into its
    * innermost enclosing paren group — the grammar attaches one per
    * SELECT block.
    */
  private def rewriteQualify(s: String): String =
    qualifyKw.findAllMatchIn(s)
      .find(m => !inQuoteMap(s)(m.start))
    match {
      case None => s
      case Some(m) if depthAt(s, m.start) > 0 =>
        val (open, close) = enclosingGroup(s, m.start)
        rewriteQualify(s.substring(0, open + 1) +
          rewriteQualify(s.substring(open + 1, close)) +
          s.substring(close))
      case Some(m) =>
        // the predicate runs to the first depth-0 trailing clause
        val tailRe =
          """(?is)\b(ORDER\s+BY|LIMIT|OFFSET|FETCH|UNION|EXCEPT|INTERSECT|MINUS)\b""".r
        val predEnd = tailRe.findAllMatchIn(s).map(_.start)
          .find(p => p > m.end && !inQuoteMap(s)(p) && depthAt(s, p) == 0)
          .getOrElse(s.length)
        val pred = s.substring(m.end, predEnd).trim
        val tail = s.substring(predEnd)
        val head = s.substring(0, m.start)
        // the QUALIFY's own SELECT block = the LAST depth-0 SELECT
        // before it (a depth-0 set-op chain puts earlier blocks in head)
        val selStart = """(?is)\bSELECT\b""".r.findAllMatchIn(head)
          .map(_.start)
          .filter(p => !inQuoteMap(head)(p) && depthAt(head, p) == 0)
          .toSeq.lastOption
          .getOrElse(sys.error(s"QUALIFY outside a SELECT block: $s"))
        val distinctRe = """(?is)^SELECT\s+(DISTINCT\s+)?""".r
        val selM = distinctRe.findFirstMatchIn(head.substring(selStart)).get
        val listStart = selStart + selM.end
        val fromStart = """(?is)\bFROM\b""".r.findAllMatchIn(head)
          .map(_.start)
          .find(p => p > listStart && !inQuoteMap(head)(p) &&
            depthAt(head, p) == 0)
          .getOrElse(sys.error(s"QUALIFY SELECT block has no FROM: $s"))
        val list = head.substring(listStart, fromStart)
        // alias → expression map from the list's explicit AS aliases
        val aliases = splitTopLevel(list).flatMap { item =>
          val as = lastTopLevelAsIdx(item)
          if (as < 0) None
          else {
            val name = item.substring(as + 2).trim
              .stripPrefix("\"").stripSuffix("\"")
            if (name.matches("(?i)\\w+"))
              Some(name.toLowerCase -> item.substring(0, as).trim)
            else None
          }
        }.toMap
        // substitute only alias tokens outside string literals and not
        // dot-qualified (`t.<alias>` names another relation's column)
        val predSub =
          if (aliases.isEmpty) pred
          else aliases.foldLeft(pred) { case (acc, (n, e)) =>
            val q = inQuoteMap(acc)
            ("(?i)(?<![\\.\\w])" + java.util.regex.Pattern.quote(n) +
              "\\b").r.replaceSomeIn(acc, mm =>
              if (q(mm.start)) None
              else Some(java.util.regex.Matcher
                .quoteReplacement(s"($e)")))
          }
        val distinct = Option(selM.group(1)).map(_ => "DISTINCT ").getOrElse("")
        rewriteQualify(
          head.substring(0, selStart) +
            s"SELECT * EXCEPT (__q) FROM (SELECT $distinct" +
            list.trim + s", ($predSub) AS __q " +
            head.substring(fromStart).trim + ") __qualify WHERE __q" +
            (if (tail.trim.isEmpty) "" else " " + tail.trim))
    }

  /** (openIdx, closeIdx) of the innermost paren group containing
    * `pos` (quote-aware). The caller guarantees depthAt(s, pos) > 0.
    */
  private def enclosingGroup(s: String, pos: Int): (Int, Int) = {
    val opens = scala.collection.mutable.Stack[Int]()
    var inQ = false
    var i = 0
    while (i < pos) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => opens.push(i)
        case ')' => if (opens.nonEmpty) opens.pop()
        case _ => ()
      }
      i += 1
    }
    require(opens.nonEmpty, s"no enclosing paren group at $pos in: $s")
    val open = opens.top
    var depth = 0
    inQ = false
    i = pos
    var close = -1
    while (close < 0 && i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => if (depth == 0) close = i else depth -= 1
        case _ => ()
      }
      i += 1
    }
    require(close > open, s"unbalanced paren group at $open in: $s")
    (open, close)
  }

  private def depthAt(s: String, pos: Int): Int = {
    var depth = 0
    var inQ = false
    var i = 0
    while (i < pos) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ => ()
      }
      i += 1
    }
    depth
  }

  /** Split on depth-0 commas outside quotes. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { cur += c; if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** Index of the last depth-0 `AS` keyword in a select item, or -1. */
  private def lastTopLevelAsIdx(s: String): Int = {
    var last = -1
    var depth = 0
    var inQ = false
    var i = 0
    def wordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'A' | 'a' if depth == 0 && i + 1 < s.length &&
            (s.charAt(i + 1) == 'S' || s.charAt(i + 1) == 's') &&
            (i == 0 || !wordChar(s.charAt(i - 1))) &&
            (i + 2 >= s.length || !wordChar(s.charAt(i + 2))) =>
          last = i
        case _ => ()
      }
      i += 1
    }
    last
  }

  /** Per-character map of text no rewriter may touch: single-quoted
    * string literals (with `''` escapes) AND backtick-quoted
    * identifiers (with ``` `` ``` escapes — rewriteQuotedIdents emits
    * them, and a quoted identifier named like a keyword, `"VARCHAR"`,
    * `"qualify"`, must never trigger a keyword rewrite).
    */
  private[graft] def inQuoteMap(s: String): Array[Boolean] = {
    val m = new Array[Boolean](s.length)
    var inQ = false
    var inBt = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        m(i) = true
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
            m(i + 1) = true; i += 1
          } else inQ = false
        }
      } else if (inBt) {
        m(i) = true
        if (c == '`') {
          if (i + 1 < s.length && s.charAt(i + 1) == '`') {
            m(i + 1) = true; i += 1
          } else inBt = false
        }
      } else if (c == '\'') { m(i) = true; inQ = true }
      else if (c == '`') { m(i) = true; inBt = true }
      i += 1
    }
    m
  }

  /** Rewrite every `OUTER APPLY (subquery) [AS] alias [(cols)]` to
    * `LEFT OUTER JOIN LATERAL (subquery) [AS] alias [(cols)] ON TRUE`.
    * Runs on the FULL statement (a subquery may contain string
    * literals, so the run-splitting quote mapper cannot host the
    * paren-balanced scan); keyword matches inside literals are
    * skipped. Only the parenthesized-subquery form is handled (the
    * grammar's other operand, a bare table function, appears as UNNEST
    * in the reference corpus and maps through the FROM-clause path).
    */
  private def rewriteOuterApply(s: String): String =
    outerApply.findAllMatchIn(s)
      .find(m => !inQuoteMap(s)(m.start)) match {
      case None => s
      case Some(m) =>
        var i = m.end
        while (i < s.length && s.charAt(i).isWhitespace) i += 1
        if (i >= s.length || s.charAt(i) != '(')
          // not the subquery form — leave it (Spark will report the
          // unsupported APPLY spelling verbatim)
          s
        else {
          var depth = 0
          var inQ = false
          var close = -1
          var j = i
          while (close < 0 && j < s.length) {
            val c = s.charAt(j)
            if (inQ) { if (c == '\'') inQ = false }
            else c match {
              case '\'' => inQ = true
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = j
              case _ => ()
            }
            j += 1
          }
          require(close > 0, s"unbalanced OUTER APPLY subquery in: $s")
          // optional [AS] alias [(colAliases)]
          var k = close + 1
          while (k < s.length && s.charAt(k).isWhitespace) k += 1
          val aliasRe = """(?is)^(?:AS\s+)?(\w+)""".r
          aliasRe.findFirstMatchIn(s.substring(k)) match {
            case Some(am)
                if !Set("ON", "WHERE", "GROUP", "ORDER", "LEFT", "RIGHT",
                  "FULL", "INNER", "CROSS", "JOIN", "OUTER", "UNION",
                  "EXCEPT", "INTERSECT", "LIMIT", "HAVING")
                  .contains(am.group(1).toUpperCase) =>
              k += am.end
              // optional column-alias list
              var k2 = k
              while (k2 < s.length && s.charAt(k2).isWhitespace) k2 += 1
              if (k2 < s.length && s.charAt(k2) == '(') {
                var d2 = 0
                var q2 = false
                var c2 = -1
                var j2 = k2
                while (c2 < 0 && j2 < s.length) {
                  val c = s.charAt(j2)
                  if (q2) { if (c == '\'') q2 = false }
                  else c match {
                    case '\'' => q2 = true
                    case '(' => d2 += 1
                    case ')' => d2 -= 1; if (d2 == 0) c2 = j2
                    case _ => ()
                  }
                  j2 += 1
                }
                if (c2 > 0) k = c2 + 1
              }
            case _ => k = close + 1
          }
          rewriteOuterApply(
            s.substring(0, m.start) + "LEFT OUTER JOIN LATERAL" +
              s.substring(m.end, k) + " ON TRUE" + s.substring(k))
        }
    }

  // SQL:2011 period predicates (datetime.md:370-379): the `(s, e) KW …`
  // infix forms Spark has no surface for.
  private val periodKw =
    """(?is)(?:\b(IMMEDIATELY)\s+)?\b(OVERLAPS|EQUALS|PRECEDES|SUCCEEDS|CONTAINS)\b""".r

  /** Lower the reference's period predicates to plain comparisons
    * (datetime.md:370-379): `(s1,e1) OVERLAPS (s2,e2)` → s1<=e2 AND
    * e1>=s2; EQUALS → both ends equal; [IMMEDIATELY] PRECEDES →
    * e1<=s2 / e1=s2; [IMMEDIATELY] SUCCEEDS → s1>=e2 / s1=e2;
    * CONTAINS over a pair or a single value. Engages only when the
    * keyword directly follows a parenthesized TWO-expression group —
    * a function call or scalar subquery before the word never has a
    * top-level comma, so it passes through (and fails loudly at
    * Spark's parser, same as before).
    */
  private def rewritePeriodPredicates(s: String): String = {
    val quotes = inQuoteMap(s)
    periodKw.findAllMatchIn(s).foreach { m =>
      if (!quotes(m.start)) {
        val imm = m.group(1) != null
        val kw = m.group(2).toUpperCase
        if (!imm || kw == "PRECEDES" || kw == "SUCCEEDS") {
          // left operand: a paren group ending right before the keyword
          var i = m.start - 1
          while (i >= 0 && s.charAt(i).isWhitespace) i -= 1
          if (i >= 0 && s.charAt(i) == ')') {
            val close = i
            var depth = 0
            var open = -1
            var j = close
            while (open < 0 && j >= 0) {
              if (!quotes(j)) s.charAt(j) match {
                case ')' => depth += 1
                case '(' => depth -= 1; if (depth == 0) open = j
                case _ => ()
              }
              j -= 1
            }
            if (open >= 0) {
              val lParts = splitTopLevel(s.substring(open + 1, close))
              if (lParts.sizeIs == 2) {
                val (s1, e1) = (lParts(0).trim, lParts(1).trim)
                // right operand: pair, parenthesized value, or (for
                // CONTAINS) a bare expression up to a depth-0 boundary
                var k = m.end
                while (k < s.length && s.charAt(k).isWhitespace) k += 1
                val right: Option[(Seq[String], Int)] =
                  if (k < s.length && s.charAt(k) == '(') {
                    var d = 0
                    var rc = -1
                    var x = k
                    while (rc < 0 && x < s.length) {
                      if (!quotes(x)) s.charAt(x) match {
                        case '(' => d += 1
                        case ')' => d -= 1; if (d == 0) rc = x
                        case _ => ()
                      }
                      x += 1
                    }
                    if (rc < 0) None
                    else Some((splitTopLevel(s.substring(k + 1, rc))
                      .map(_.trim), rc + 1))
                  } else {
                    val stop = ("(?is)\\b(AND|OR|WHERE|GROUP|ORDER|" +
                      "HAVING|QUALIFY|UNION|EXCEPT|INTERSECT|MINUS|" +
                      "LIMIT|OFFSET|FETCH|JOIN|ON|THEN|ELSE|END|WHEN|" +
                      "AS|FROM|ASC|DESC|NULLS|WINDOW)\\b").r
                    var d = 0
                    var x = k
                    var endAt = -1
                    while (endAt < 0 && x < s.length) {
                      if (!quotes(x)) s.charAt(x) match {
                        case '(' => d += 1; x += 1
                        case ')' if d == 0 => endAt = x
                        case ')' => d -= 1; x += 1
                        case ',' if d == 0 => endAt = x
                        case c0 if d == 0 && (c0.isLetter || c0 == '_') &&
                            !(s.charAt(x - 1).isLetterOrDigit ||
                              s.charAt(x - 1) == '_' ||
                              s.charAt(x - 1) == '.') &&
                            stop.findPrefixOf(s.substring(x)).isDefined =>
                          endAt = x
                        case _ => x += 1
                      }
                    }
                    if (endAt < 0) endAt = s.length
                    val raw = s.substring(k, endAt)
                    val v = raw.trim
                    // splice point excludes the value's trailing
                    // whitespace so the original spacing before the
                    // next token survives
                    if (v.isEmpty) None
                    else Some((Seq(v),
                      k + raw.lastIndexWhere(!_.isWhitespace) + 1))
                  }
                right.foreach { case (rParts, rEnd) =>
                  val repl: Option[String] = (kw, rParts) match {
                    case ("OVERLAPS", Seq(s2, e2)) => Some(
                      s"(($s1) <= ($e2) AND ($e1) >= ($s2))")
                    case ("EQUALS", Seq(s2, e2)) => Some(
                      s"(($s1) = ($s2) AND ($e1) = ($e2))")
                    case ("PRECEDES", Seq(s2, _)) =>
                      Some(if (imm) s"(($e1) = ($s2))"
                      else s"(($e1) <= ($s2))")
                    case ("SUCCEEDS", Seq(_, e2)) =>
                      Some(if (imm) s"(($s1) = ($e2))"
                      else s"(($s1) >= ($e2))")
                    case ("CONTAINS", Seq(s2, e2)) => Some(
                      s"(($s1) <= ($s2) AND ($e1) >= ($e2))")
                    case ("CONTAINS", Seq(v)) => Some(
                      s"(($s1) <= ($v) AND ($v) <= ($e1))")
                    case _ => None
                  }
                  repl.foreach { r =>
                    return rewritePeriodPredicates(
                      s.substring(0, open) + r + s.substring(rEnd))
                  }
                }
              }
            }
          }
        }
      }
    }
    s
  }

  /** Map the reference's quoted identifiers onto Spark's backtick form
    * (identifiers.md): string literals are single-quoted in this
    * dialect, so any `"..."` outside a string literal is an identifier
    * (Spark's default parser would read it as a string literal or
    * reject it; `spark.sql.ansi.doubleQuotedIdentifiers` would drag in
    * full ANSI arithmetic semantics, so this stays a spelling map).
    * Handles the `""` escape and the `U&"..." [UESCAPE 'c']` Unicode
    * code-point variant (4-hex-digit escapes, doubled escape char for
    * the literal). An identifier containing a single quote or backtick
    * is rejected loudly — it would derail the downstream quote-aware
    * rewriters rather than fail cleanly at Spark's parser.
    */
  private def rewriteQuotedIdents(s: String): String = {
    if (s.indexOf('"') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    var inQ = false
    def wordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      val uniForm = (c == 'U' || c == 'u') && i + 2 < s.length &&
        s.charAt(i + 1) == '&' && s.charAt(i + 2) == '"' &&
        (i == 0 || !wordChar(s.charAt(i - 1)))
      if (inQ) { sb += c; if (c == '\'') inQ = false; i += 1 }
      else if (c == '\'') { sb += c; inQ = true; i += 1 }
      else if (c == '"' || uniForm) {
        var j = if (uniForm) i + 3 else i + 1
        val ident = new StringBuilder
        var open = true
        while (open && j < s.length) {
          val d = s.charAt(j)
          if (d == '"') {
            if (j + 1 < s.length && s.charAt(j + 1) == '"') {
              ident += '"'; j += 2
            } else { open = false; j += 1 }
          } else { ident += d; j += 1 }
        }
        require(!open, s"unterminated quoted identifier in: $s")
        var text = ident.toString
        if (uniForm) {
          val ue = """(?is)^\s*UESCAPE\s+'(.)'""".r
            .findFirstMatchIn(s.substring(j))
          val esc = ue.map(_.group(1).head).getOrElse('\\')
          ue.foreach(m => j += m.end)
          val out = new StringBuilder
          var k = 0
          while (k < text.length) {
            val e = text.charAt(k)
            if (e == esc) {
              if (k + 1 < text.length && text.charAt(k + 1) == esc) {
                out += esc; k += 2
              } else {
                require(k + 4 < text.length,
                  s"bad Unicode escape in identifier: $text")
                out += Integer
                  .parseInt(text.substring(k + 1, k + 5), 16).toChar
                k += 5
              }
            } else { out += e; k += 1 }
          }
          text = out.toString
        }
        require(!text.exists(c => "'`(),;".contains(c)),
          s"identifier ${'"'}$text${'"'} contains a quote/paren/comma/" +
            "semicolon — not representable through the Spark spelling " +
            "map (it would derail the statement scanners)")
        sb += '`'
        sb ++= text
        sb += '`'
        i = j
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  // Windowing table functions (docs/sql/table.md): the
  // `TABLE(TUMBLE|HOP|SESSION(TABLE t | (query), DESCRIPTOR(..), …))`
  // FROM-clause spelling, positional or `name => value` named args.
  private val windowTvf =
    """(?is)\bTABLE\s*\(\s*(TUMBLE|HOP|SESSION)\s*\(""".r
  private val namedArg = """(?is)^\s*(\w+)\s*=>\s*(.*)$""".r
  private val descriptorArg =
    """(?is)^\s*DESCRIPTOR\s*\(\s*([\w]+(?:\s*,\s*[\w]+)*)\s*\)\s*$""".r
  private val tableArg = """(?is)^\s*TABLE\s+([\w.]+)\s*$""".r
  private val shortInterval =
    """(?is)^\s*INTERVAL\s+'?(\d+)'?\s+(MILLISECOND|SECOND|MINUTE|HOUR|DAY)S?\s*$""".r

  /** millis + Spark duration string for a "short" interval literal
    * (table.md: long intervals are not constants and are rejected).
    */
  private def parseShortInterval(e: String, fn: String): (Long, String) =
    e match {
      case shortInterval(v, u) =>
        val unit = u.toLowerCase
        val factor = unit match {
          case "millisecond" => 1L
          case "second" => 1000L
          case "minute" => 60000L
          case "hour" => 3600000L
          case "day" => 86400000L
        }
        (v.toLong * factor,
          s"$v $unit" + (if (v == "1") "" else "s"))
      case _ => sys.error(
        s"$fn windowing requires a short INTERVAL literal " +
          s"(MILLISECOND..DAY, table.md); got: ${e.trim}")
    }

  /** Lower the reference's windowing table functions (table.md TUMBLE/
    * HOP/SESSION; Calcite's SqlWindowTableFunction surface) to Spark:
    *
    *  - TUMBLE(t, DESCRIPTOR(c), size [, offset]) and
    *    HOP(t, DESCRIPTOR(c), slide, size [, offset]) become a
    *    projection over Spark's native `window()` expression (the same
    *    epoch-aligned assignment; HOP fans each row to its covering
    *    windows, size/slide swap to Spark's (size, slide) order), with
    *    the struct re-exposed as `window_start`/`window_end` and NULL
    *    timestamps filtered (table.md: a NULL timestamp produces no
    *    rows). One narrow map over the scan — no shuffle.
    *  - SESSION(t, DESCRIPTOR(ts) [, DESCRIPTOR(k)], gap) becomes the
    *    reference's own rewrite (SessionRewriteRule.java:51 — brk =
    *    CASE(prev IS NULL OR ts >= prev + gap), running RANGE-frame sum
    *    as the session id, min/max+gap per session): one exchange on
    *    the key + one sort, O(n log n) at any scale.
    *
    * Named-argument spellings (`data =>`, `timecol =>`, `slide =>`,
    * `size =>`, `key =>`, `offset =>`) normalize to the positional
    * form first (the DATA param is always first, per table.md).
    */
  private def rewriteWindowTvf(s: String): String =
    windowTvf.findAllMatchIn(s)
      .find(m => !inQuoteMap(s)(m.start)) match {
      case None => s
      case Some(m) =>
        val fn = m.group(1).toUpperCase
        val innerOpen = m.end - 1
        // balanced scan for the inner call's close paren
        var depth = 0
        var inQ = false
        var innerClose = -1
        var j = innerOpen
        while (innerClose < 0 && j < s.length) {
          val c = s.charAt(j)
          if (inQ) { if (c == '\'') inQ = false }
          else c match {
            case '\'' => inQ = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) innerClose = j
            case _ => ()
          }
          j += 1
        }
        require(innerClose > 0, s"unbalanced $fn call in: $s")
        var k = innerClose + 1
        while (k < s.length && s.charAt(k).isWhitespace) k += 1
        require(k < s.length && s.charAt(k) == ')',
          s"TABLE($fn(...)) missing its closing paren in: $s")
        val rawArgs = splitTopLevel(s.substring(innerOpen + 1, innerClose))
        // named args → canonical positional order
        val named = scala.collection.mutable.Map[String, String]()
        val positional = Seq.newBuilder[String]
        rawArgs.foreach {
          case namedArg(n, v) => named(n.toLowerCase) = v
          case a => positional += a
        }
        val pos = positional.result()
        def arg(name: String, posIdx: Int): Option[String] =
          named.get(name).orElse(pos.lift(posIdx))
        val data = arg("data", 0).map(_.trim).getOrElse(
          sys.error(s"$fn windowing needs a DATA argument: $s"))
        val dataSql = data match {
          case tableArg(t) => t
          case d if d.startsWith("(") => d
          case d => d // bare table name
        }
        val tsCol = arg("timecol", 1).map {
          case descriptorArg(c) => c.trim
          case other => sys.error(
            s"$fn windowing needs DESCRIPTOR(timecol); got: ${other.trim}")
        }.getOrElse(sys.error(s"$fn windowing needs a TIMECOL: $s"))
        val replacement = fn match {
          case "TUMBLE" =>
            val (_, sizeDur) = parseShortInterval(
              arg("size", 2).getOrElse(
                sys.error(s"TUMBLE needs a SIZE interval: $s")), fn)
            val off = arg("offset", 3).map(parseShortInterval(_, fn)._2)
            val win = off match {
              case Some(o) => s"window($tsCol, '$sizeDur', '$sizeDur', '$o')"
              case None => s"window($tsCol, '$sizeDur')"
            }
            s"(SELECT * EXCEPT (__w), __w.start AS window_start, " +
              s"__w.end AS window_end FROM (SELECT __tvf0.*, $win AS __w " +
              s"FROM $dataSql __tvf0 WHERE $tsCol IS NOT NULL) __tvf1)"
          case "HOP" =>
            val (_, slideDur) = parseShortInterval(
              arg("slide", 2).getOrElse(
                sys.error(s"HOP needs a SLIDE interval: $s")), fn)
            val (_, sizeDur) = parseShortInterval(
              arg("size", 3).getOrElse(
                sys.error(s"HOP needs a SIZE interval: $s")), fn)
            val off = arg("offset", 4).map(parseShortInterval(_, fn)._2)
            val win = off match {
              case Some(o) =>
                s"window($tsCol, '$sizeDur', '$slideDur', '$o')"
              case None => s"window($tsCol, '$sizeDur', '$slideDur')"
            }
            s"(SELECT * EXCEPT (__w), __w.start AS window_start, " +
              s"__w.end AS window_end FROM (SELECT __tvf0.*, $win AS __w " +
              s"FROM $dataSql __tvf0 WHERE $tsCol IS NOT NULL) __tvf1)"
          case "SESSION" =>
            // positional: key descriptor is optional 3rd arg
            val posKey = pos.lift(2).collect {
              case descriptorArg(c) => c
            }
            val keyCols: Seq[String] =
              named.get("key").map {
                case descriptorArg(c) => c
                case other => sys.error(
                  s"SESSION KEY must be DESCRIPTOR(cols); got: ${other.trim}")
              }.orElse(posKey)
                .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty)
            val gapArg = named.get("size").orElse(
              if (posKey.isDefined) pos.lift(3) else pos.lift(2))
              .getOrElse(sys.error(s"SESSION needs a SIZE interval: $s"))
            parseShortInterval(gapArg, fn) // validate: short interval only
            val gapSql = gapArg.trim
            val partKey =
              if (keyCols.isEmpty) "" else s"PARTITION BY ${keyCols.mkString(", ")} "
            val partSid =
              if (keyCols.isEmpty) "PARTITION BY __sid"
              else s"PARTITION BY ${keyCols.mkString(", ")}, __sid"
            val prev = s"LAG($tsCol) OVER (${partKey}ORDER BY $tsCol)"
            s"(SELECT * EXCEPT (__sid), " +
              s"MIN($tsCol) OVER ($partSid) AS window_start, " +
              s"MAX($tsCol) OVER ($partSid) + $gapSql AS window_end " +
              s"FROM (SELECT * EXCEPT (__new), " +
              s"SUM(__new) OVER (${partKey}ORDER BY $tsCol) AS __sid " +
              s"FROM (SELECT __tvf0.*, CASE WHEN $prev IS NULL OR " +
              s"$tsCol >= $prev + $gapSql THEN 1 ELSE 0 END AS __new " +
              s"FROM $dataSql __tvf0 WHERE $tsCol IS NOT NULL) __tvf1) " +
              s"__tvf2)"
        }
        rewriteWindowTvf(
          s.substring(0, m.start) + replacement + s.substring(k + 1))
    }

  /** Apply `f` to the unquoted runs of `s`; single-quoted SQL string
    * literals (with `''` escapes) pass through verbatim.
    */
  private def mapOutsideQuotes(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val run = new StringBuilder
    var inQuote = false
    var inBt = false
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
      } else if (inBt) {
        out += c
        if (c == '`') {
          if (i + 1 < s.length && s.charAt(i + 1) == '`') {
            out += '`'; i += 1
          } else inBt = false
        }
      } else if (c == '\'' || c == '`') {
        out ++= f(run.toString); run.clear()
        out += c
        if (c == '\'') inQuote = true else inBt = true
      } else run += c
      i += 1
    }
    out ++= f(run.toString)
    out.toString
  }
}
