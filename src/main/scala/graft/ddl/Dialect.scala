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

  def normalize(sql: String): String =
    rewriteDistinctOn(rewriteAsofJoin(rewriteQualify(rewriteOuterApply(mapOutsideQuotes(sql) { run =>
      val a = unpivotIncluding.replaceAllIn(run, "UNPIVOT INCLUDE NULLS")
      val b = unpivotExcluding.replaceAllIn(a, "UNPIVOT EXCLUDE NULLS")
      val c = starExclude.replaceAllIn(b, "$1EXCEPT$2")
      val d = rowCtor.replaceAllIn(c, "struct$1")
      val e = crossApply.replaceAllIn(d, "CROSS JOIN LATERAL")
      val f = offsetFetchRows.replaceAllIn(e, m =>
        "LIMIT " + Option(m.group(2)).getOrElse("1") +
          " OFFSET " + m.group(1))
      val g = fetchRows.replaceAllIn(f,
        m => "LIMIT " + Option(m.group(1)).getOrElse("1"))
      val h = offsetRows.replaceAllIn(g, "OFFSET $1")
      val i = limitStartCount.replaceAllIn(h, "LIMIT $2 OFFSET $1")
      limitAll.replaceAllIn(i, "")
    }))))

  private val asofJoinKw = """(?is)\b(LEFT\s+)?ASOF\s+JOIN\b""".r

  /** Lower the reference's ASOF join spelling (grammar.md "ASOF joins":
    * `L [LEFT] ASOF JOIN R MATCH_CONDITION (L.t >= R.t) ON L.k = R.k`
    * — for each left row, the single matching right row with the
    * closest timestamp) onto Spark as a LATERAL top-1 probe:
    *
    * {{{
    *   L LEFT OUTER JOIN LATERAL (
    *     SELECT * FROM R WHERE (<on>) AND (<mc>)
    *     ORDER BY <right-side of mc> DESC LIMIT 1) R ON TRUE
    * }}}
    *
    * (CROSS JOIN LATERAL for the inner form — an empty probe drops the
    * row, exactly the inner-ASOF contract). The right operand may be a
    * table name or a parenthesized subquery; its alias names the
    * lateral relation so outer references keep resolving. The
    * MATCH_CONDITION comparison must be `>=` (the only operator the
    * reference supports); the side referencing the right alias becomes
    * the ORDER BY — DESC when it is the lower bound (the usual
    * `left >= right`), ASC when the condition is reversed.
    *
    * SCALE CAVEAT (measured, sf0.1): Spark decorrelates the lateral's
    * LIMIT through WindowGroupLimit and pulls the equality key into a
    * hash join, but the correlated INEQUALITY becomes a
    * BroadcastNestedLoopJoin of DISTINCT(left timestamps) × right —
    * quadratic. This spelling is therefore right for config-scale
    * probes only; large ASOF joins should use the production operator
    * [[graft.ops.AsofJoin]] (one union + window pass, O(n log n),
    * graded by join_asof). A schema-aware union+window lowering in the
    * view path (the REPLACE-star throwaway-analysis technique) is the
    * planned replacement.
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
        require(i < s.length && s.charAt(i) == '(',
          s"MATCH_CONDITION needs a parenthesized expression: $s")
        val mcClose = balanceFrom(i)
        val mc = s.substring(i + 1, mcClose)
        i = mcClose + 1
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
        // ORDER BY = the mc side referencing the right alias; direction
        // from which side of >= it sits on
        val geIdx = {
          var j = 0
          var d = 0
          var q = false
          var at = -1
          while (at < 0 && j < mc.length - 1) {
            val c = mc.charAt(j)
            if (q) { if (c == '\'') q = false }
            else c match {
              case '\'' => q = true
              case '(' => d += 1
              case ')' => d -= 1
              case '>' if d == 0 && mc.charAt(j + 1) == '=' => at = j
              case _ => ()
            }
            j += 1
          }
          require(at >= 0,
            s"MATCH_CONDITION must use >= (the reference's only " +
              s"supported comparison): $mc")
          at
        }
        val (lhs, rhs) = (mc.substring(0, geIdx).trim,
          mc.substring(geIdx + 2).trim)
        val refsRight = (e: String) =>
          ("(?i)\\b" + java.util.regex.Pattern.quote(rName) + "\\s*\\.").r
            .findFirstIn(e).isDefined
        val (orderExpr, dir) =
          if (refsRight(rhs) && !refsRight(lhs)) (rhs, "DESC")
          else if (refsRight(lhs) && !refsRight(rhs)) (lhs, "ASC")
          else sys.error(s"MATCH_CONDITION must compare the right " +
            s"table's column ($rName.*) against a left expression: $mc")
        val joinKw = if (isLeft) "LEFT OUTER JOIN LATERAL"
          else "CROSS JOIN LATERAL"
        val onTrue = if (isLeft) " ON TRUE" else ""
        rewriteAsofJoin(
          s.substring(0, m.start) +
            s"$joinKw (SELECT * FROM $rightOperand WHERE ($onCond) AND " +
            s"($mc) ORDER BY $orderExpr $dir LIMIT 1) $rName$onTrue " +
            s.substring(onEnd).trim)
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
    * PostgreSQL (the window orders by the ON exprs alone).
    */
  private def rewriteDistinctOn(s: String): String =
    distinctOnKw.findAllMatchIn(s)
      .find(m => !inQuoteMap(s)(m.start) && depthAt(s, m.start) == 0)
    match {
      case None => s
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
    // WINDOW inside the subquery but not through it — so the trailing
    // ORDER BY is DROPPED unless a LIMIT/OFFSET makes it semantic
    // (relation output is an unordered Z-set; pure ordering is
    // decorative). With a LIMIT it is kept and fails loudly if it
    // names an unprojected column.
            (om.start,
              splitTopLevel(s.substring(om.end,
                limStart.getOrElse(s.length))).map(_.trim),
              limStart.map(_ => s.substring(om.start)).getOrElse(""))
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
            // with a direction suffix); expressions keep their spelling
            acc.replaceAll("(?i)^" + java.util.regex.Pattern.quote(n) +
              "\\b", java.util.regex.Matcher.quoteReplacement(s"($ex)"))
          }
        val part = onExprs.map(subst).mkString(", ")
        val ord = orderItems.map(subst).mkString(", ")
        rewriteDistinctOn(
          s.substring(0, m.start) +
            "SELECT * EXCEPT (__dn) FROM (SELECT " + list.trim +
            s", ROW_NUMBER() OVER (PARTITION BY $part ORDER BY $ord) " +
            s"AS __dn ${body.trim}) __don WHERE __dn = 1" +
            (if (tail.isEmpty) "" else " " + tail.trim))
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
    * optimizer de-duplicates against the list's own copy). Only a
    * depth-0 QUALIFY is lowered — the grammar attaches one per SELECT
    * block, and nested blocks arrive here one statement at a time.
    */
  private def rewriteQualify(s: String): String =
    qualifyKw.findAllMatchIn(s)
      .find(m => !inQuoteMap(s)(m.start) && depthAt(s, m.start) == 0)
    match {
      case None => s
      case Some(m) =>
        // the predicate runs to the first depth-0 trailing clause
        val tailRe =
          """(?is)\b(ORDER\s+BY|LIMIT|OFFSET|UNION|EXCEPT|INTERSECT)\b""".r
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
        val predSub =
          if (aliases.isEmpty) pred
          else aliases.foldLeft(pred) { case (acc, (n, e)) =>
            acc.replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(n) +
              "\\b", java.util.regex.Matcher.quoteReplacement(s"($e)"))
          }
        val distinct = Option(selM.group(1)).map(_ => "DISTINCT ").getOrElse("")
        rewriteQualify(
          head.substring(0, selStart) +
            s"SELECT * EXCEPT (__q) FROM (SELECT $distinct" +
            list.trim + s", ($predSub) AS __q " +
            head.substring(fromStart).trim + ") __qualify WHERE __q" +
            (if (tail.trim.isEmpty) "" else " " + tail.trim))
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

  /** Per-character in-string-literal map (with `''` escapes). */
  private def inQuoteMap(s: String): Array[Boolean] = {
    val m = new Array[Boolean](s.length)
    var inQ = false
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
      } else if (c == '\'') { m(i) = true; inQ = true }
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
