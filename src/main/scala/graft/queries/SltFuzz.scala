package graft.queries

/** SLT-style randomized conformance corpus — modeled on the reference's
  * SqlLogicTest validation (`sql-to-dbsp-compiler/README.md` runs the
  * ~5M-query sqllogictest suite against the compiler). A seeded
  * generator emits ONE dialect-shared SQL text per query from a grammar
  * of integer expressions, predicates, CASE, and aggregates over the
  * [[SqlConformance]] 100-row fixture; every generated query contributes
  * its FILTER-ed aggregate columns to one of two wide statements
  * (global / GROUP BY), so two DuckDB hash-matches verify the whole
  * corpus at once (per-query columns are keyed `q{qid}_c*`).
  *
  * Grammar discipline (the shared-dialect subset):
  *  - every column leaf is CAST(... AS BIGINT): arithmetic is 64-bit in
  *    both engines, and leaf magnitude (≤99) × max tree fan-in (8
  *    leaves) bounds products at ~1e16 — no overflow even after SUM
  *    over 100 rows;
  *  - no division (x/0 is NULL in Spark, Inf/error in DuckDB) — MOD
  *    only with positive literal divisors (sign semantics pinned by
  *    pg_num_mod_sign);
  *  - SUM casts back to BIGINT (DuckDB sums to HUGEINT);
  *  - three-valued logic flows through predicates and CASE via the
  *    nullable `v` column (semantics pinned by pg_in_null_semantics).
  */
object SltFuzz {

  private val N = 120

  /** Each generated query q contributes 5 FILTER-ed aggregate columns
    * `q{qid}_c1..c5` to ONE wide aggregation over a single fixture scan
    * — per-query plan cost is 5 expression trees, not a union branch
    * (a 300-way UNION ALL of the same corpus measured 20s of pure
    * Catalyst planning; this form plans in well under a second).
    */
  private[queries] def gen(seed: Long = 20260814L): (String, String) = {
    // deterministic corpus: same text on every JVM, every run
    val rnd = new scala.util.Random(seed)
    val leaves = Seq("CAST(i AS BIGINT)", "CAST(two AS BIGINT)",
      "CAST(four AS BIGINT)", "CAST(ten AS BIGINT)", "v")

    def intExpr(d: Int): String =
      if (d <= 0) {
        if (rnd.nextInt(4) == 0) s"CAST(${rnd.nextInt(10)} AS BIGINT)"
        else leaves(rnd.nextInt(leaves.length))
      } else rnd.nextInt(8) match {
        case 0 => s"(${intExpr(d - 1)} + ${intExpr(d - 1)})"
        case 1 => s"(${intExpr(d - 1)} - ${intExpr(d - 1)})"
        case 2 => s"(${intExpr(d - 1)} * ${intExpr(d - 1)})"
        case 3 => s"ABS(${intExpr(d - 1)})"
        case 4 => s"MOD(${intExpr(d - 1)}, ${1 + rnd.nextInt(9)})"
        case 5 => s"LEAST(${intExpr(d - 1)}, ${intExpr(d - 1)})"
        case 6 => s"GREATEST(${intExpr(d - 1)}, ${intExpr(d - 1)})"
        case 7 =>
          s"(CASE WHEN ${pred(d - 1)} THEN ${intExpr(d - 1)} " +
            s"ELSE ${intExpr(d - 1)} END)"
      }

    def pred(d: Int): String = rnd.nextInt(10) match {
      case 0 => s"${intExpr(d)} IS NULL"
      case 1 => s"${intExpr(d)} IS NOT NULL"
      case 2 if d > 0 => s"(${pred(d - 1)} AND ${pred(d - 1)})"
      case 3 if d > 0 => s"(${pred(d - 1)} OR ${pred(d - 1)})"
      case 4 if d > 0 => s"(NOT ${pred(d - 1)})"
      case _ =>
        val op = Seq("<", "<=", "=", "<>", ">", ">=")(rnd.nextInt(6))
        s"${intExpr(d)} $op ${intExpr(d)}"
    }

    def cols(qid: Int): String = {
      val e1 = intExpr(1 + rnd.nextInt(2))
      val e2 = intExpr(1 + rnd.nextInt(2))
      val e3 = intExpr(1 + rnd.nextInt(2))
      val p = pred(1 + rnd.nextInt(1))
      s"CAST(SUM($e1) FILTER (WHERE $p) AS BIGINT) AS q${qid}_c1, " +
        s"CAST(MIN($e2) FILTER (WHERE $p) AS BIGINT) AS q${qid}_c2, " +
        s"CAST(MAX($e2) FILTER (WHERE $p) AS BIGINT) AS q${qid}_c3, " +
        s"COUNT($e3) FILTER (WHERE $p) AS q${qid}_c4, " +
        s"COUNT(*) FILTER (WHERE $p) AS q${qid}_c5"
    }

    // two statements: a global aggregate and a GROUP BY four aggregate
    // (each generated query is assigned to one family)
    val (globalIds, groupedIds) =
      (0 until N).partition(_ => rnd.nextInt(3) != 0)
    // note: cols() draws from the SAME rng stream in id order, keeping
    // the corpus deterministic
    val colsOf = (0 until N).map(q => q -> cols(q)).toMap
    val flat = "SELECT " +
      globalIds.map(colsOf).mkString(", ") + " FROM t"
    val grouped = "SELECT CAST(four AS BIGINT) AS g, " +
      groupedIds.map(colsOf).mkString(", ") + " FROM t GROUP BY four"
    (flat, grouped)
  }

  private val (flatBody, groupedBody) = gen()

  /** Window-function corpus, SLT result-hash style: every generated
    * window expression is computed per row in a subquery (ORDER BY the
    * UNIQUE key `i`, so ties cannot make results engine-dependent) and
    * folded to one checksum column `CAST(SUM(expr * (i+1)) AS BIGINT)`
    * — a positional fingerprint that detects any per-row divergence.
    * Covers the rank family, NTILE, LAG/LEAD with offset+default,
    * FIRST/LAST/NTH_VALUE with explicit frames, and SUM/MIN/MAX/COUNT
    * over random ROWS frames across partitions and sort directions.
    */
  private[queries] def genWindows(seed: Long = 8141821L): String = {
    val rnd = new scala.util.Random(seed)
    val leaves = Seq("CAST(i AS BIGINT)", "CAST(two AS BIGINT)",
      "CAST(four AS BIGINT)", "CAST(ten AS BIGINT)", "v")
    def e(): String = leaves(rnd.nextInt(leaves.length))
    def over(frame: Boolean): String = {
      val part = Seq("", "PARTITION BY two ", "PARTITION BY four ",
        "PARTITION BY ten ")(rnd.nextInt(4))
      val dir = if (rnd.nextBoolean()) "ASC" else "DESC"
      val fr =
        if (!frame) ""
        else rnd.nextInt(3) match {
          case 0 => " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
          case 1 => s" ROWS BETWEEN ${1 + rnd.nextInt(3)} PRECEDING " +
            s"AND ${rnd.nextInt(3)} FOLLOWING"
          case 2 =>
            " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
        }
      s"OVER (${part}ORDER BY i $dir$fr)"
    }
    def winExpr(): String = rnd.nextInt(10) match {
      case 0 => s"ROW_NUMBER() ${over(frame = false)}"
      case 1 => s"RANK() ${over(frame = false)}"
      case 2 => s"DENSE_RANK() ${over(frame = false)}"
      case 3 => s"NTILE(${2 + rnd.nextInt(5)}) ${over(frame = false)}"
      case 4 => s"LAG(${e()}, ${1 + rnd.nextInt(3)}, " +
        s"CAST(${rnd.nextInt(10)} AS BIGINT)) ${over(frame = false)}"
      case 5 => s"LEAD(${e()}, ${1 + rnd.nextInt(3)}, " +
        s"CAST(${rnd.nextInt(10)} AS BIGINT)) ${over(frame = false)}"
      case 6 => s"FIRST_VALUE(${e()}) ${over(frame = true)}"
      case 7 =>
        // LAST/NTH need a full frame to see past the current row
        val full = over(frame = false).stripSuffix(")") +
          " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        if (rnd.nextBoolean()) s"LAST_VALUE(${e()}) $full"
        else s"NTH_VALUE(${e()}, ${1 + rnd.nextInt(5)}) $full"
      case 8 =>
        val f = Seq("SUM", "MIN", "MAX", "COUNT")(rnd.nextInt(4))
        s"$f(${e()}) ${over(frame = true)}"
      case 9 => s"CAST(ROUND(PERCENT_RANK() ${over(frame = false)} " +
        s"* 1000000) AS BIGINT)"
    }
    val nW = 60
    val inner = (0 until nW)
      .map(k => s"COALESCE(${winExpr()}, -1) AS w$k").mkString(", ")
    val outer = (0 until nW)
      .map(k => s"CAST(SUM(w$k * (CAST(i AS BIGINT) + 1)) AS BIGINT) " +
        s"AS q$k").mkString(", ")
    s"SELECT $outer FROM (SELECT i, $inner FROM t) s"
  }

  private val windowBody = genWindows()

  /** String-function corpus: ASCII-only derived strings (collation-
    * neutral in both engines), random chains of UPPER/LOWER/SUBSTR/
    * TRIM/REPLACE/REVERSE/LPAD/RPAD/LEFT/RIGHT/REPEAT/SPLIT_PART/||,
    * folded per shape to a length checksum + an ASCII-of-first-char
    * checksum + lexicographic MIN/MAX.
    */
  private[queries] def genStrings(seed: Long = 3141592L): String = {
    val rnd = new scala.util.Random(seed)
    val leaves = Seq(
      "('r' || CAST(i AS VARCHAR(20)))",
      "('ab,cd,' || CAST(ten AS VARCHAR(20)))",
      "(' pad ' || CAST(four AS VARCHAR(20)) || ' ')",
      "('XyZ' || CAST(two AS VARCHAR(20)))")
    def sExpr(d: Int): String =
      if (d <= 0) leaves(rnd.nextInt(leaves.length))
      else rnd.nextInt(11) match {
        case 0 => s"UPPER(${sExpr(d - 1)})"
        case 1 => s"LOWER(${sExpr(d - 1)})"
        case 2 => s"SUBSTR(${sExpr(d - 1)}, ${1 + rnd.nextInt(3)}, " +
          s"${1 + rnd.nextInt(6)})"
        case 3 => s"TRIM(${sExpr(d - 1)})"
        case 4 => s"REPLACE(${sExpr(d - 1)}, " +
          s"'${"rabX".charAt(rnd.nextInt(4))}', '_')"
        case 5 => s"REVERSE(${sExpr(d - 1)})"
        case 6 => s"LPAD(${sExpr(d - 1)}, ${4 + rnd.nextInt(8)}, '.')"
        case 7 => s"RPAD(${sExpr(d - 1)}, ${4 + rnd.nextInt(8)}, '-')"
        case 8 => s"(${sExpr(d - 1)} || ${sExpr(d - 1)})"
        case 9 => s"REPEAT(${sExpr(d - 1)}, ${1 + rnd.nextInt(2)})"
        case 10 => s"SPLIT_PART(${sExpr(d - 1)}, ',', " +
          s"${1 + rnd.nextInt(3)})"
      }
    val nS = 50
    val inner = (0 until nS)
      .map(k => s"${sExpr(1 + rnd.nextInt(2))} AS w$k").mkString(", ")
    val outer = (0 until nS).map { k =>
      s"CAST(SUM(LENGTH(w$k) * (CAST(i AS BIGINT) + 1)) AS BIGINT) " +
        s"AS q${k}_len, " +
        s"CAST(SUM(ASCII(w$k) * (CAST(i AS BIGINT) + 1)) AS BIGINT) " +
        s"AS q${k}_asc, MIN(w$k) AS q${k}_mn, MAX(w$k) AS q${k}_mx"
    }.mkString(", ")
    s"SELECT $outer FROM (SELECT i, $inner FROM t) s"
  }

  /** Date-arithmetic corpus: make_date leaves (shared spelling), random
    * interval add/subtract chains with month-end clamping in play, and
    * LAST_DAY; folded per shape to a yyyymmdd positional checksum.
    */
  private[queries] def genDates(seed: Long = 27182818L): String = {
    val rnd = new scala.util.Random(seed)
    def leaf(): String = rnd.nextInt(3) match {
      case 0 => "MAKE_DATE(2000 + ten, 1 + two * 6, 1 + four * 7)"
      case 1 => "MAKE_DATE(2020 + two, 1 + ten, 28)"
      case 2 => "MAKE_DATE(2024, 2, 1 + MOD(i, 28))"
    }
    // day-interval constants avoid multiples of 30: DuckDB 1.0
    // normalizes intervals at 30-day months for expression equality, so
    // its CSE merges `X + INTERVAL '30' DAY` with `X + INTERVAL '1'
    // MONTH` over the same base and returns the MONTH result for the
    // DAY add — a wrong-result engine bug this sweep caught under seed
    // 1357 (minimal repro: SELECT both adds of DATE '2020-01-28' in one
    // projection). Semantically-distinct-but-normalized-equal constant
    // pairs are exactly the collision class, so the grammar skips them.
    def days(): Int = {
      val n = 1 + rnd.nextInt(40)
      if (n % 30 == 0) n + 1 else n
    }
    def dExpr(d: Int): String =
      if (d <= 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => s"(${dExpr(d - 1)} + INTERVAL '${days()}' DAY)"
        case 1 => s"(${dExpr(d - 1)} - INTERVAL '${days()}' DAY)"
        case 2 =>
          s"(${dExpr(d - 1)} + INTERVAL '${1 + rnd.nextInt(14)}' MONTH)"
        case 3 => s"LAST_DAY(${dExpr(d - 1)})"
      }
    val nD = 40
    val inner = (0 until nD)
      .map(k => s"CAST(${dExpr(1 + rnd.nextInt(2))} AS DATE) AS w$k")
      .mkString(", ")
    val outer = (0 until nD).map { k =>
      s"CAST(SUM((EXTRACT(YEAR FROM w$k) * 10000 + " +
        s"EXTRACT(MONTH FROM w$k) * 100 + EXTRACT(DAY FROM w$k)) * " +
        s"(CAST(i AS BIGINT) + 1)) AS BIGINT) AS q$k"
    }.mkString(", ")
    s"SELECT $outer FROM (SELECT i, $inner FROM t) s"
  }

  private val stringBody = genStrings()
  private val dateBody = genDates()

  // ------------------------------------------------------ join corpus

  /** Two-table fixture for the join corpus, spelled per engine (Spark's
    * `range` yields `id`; DuckDB's yields a positional alias). Key
    * domains overlap partially (ka 0..12 vs kb 0..10) so outer joins
    * produce unmatched rows on both sides, and `va`/`wb` are NULLABLE
    * keys — the null-never-matches join rule and the NOT IN null trap
    * are both in play.
    */
  private[queries] val JS =
    """WITH a AS (SELECT id AS i, CAST(id % 13 AS INT) AS ka,
      | CAST(CASE WHEN id % 5 = 0 THEN NULL ELSE id % 7 END AS BIGINT)
      |  AS va FROM range(0, 100, 1, 1)),
      |b AS (SELECT id AS j, CAST(id % 11 AS INT) AS kb,
      | CAST(CASE WHEN id % 4 = 0 THEN NULL ELSE id % 9 END AS BIGINT)
      |  AS wb FROM range(0, 60, 1, 1)) """.stripMargin.replaceAll("\n", "")
  private[queries] val JD =
    """WITH a AS (SELECT i, CAST(i % 13 AS INT) AS ka,
      | CAST(CASE WHEN i % 5 = 0 THEN NULL ELSE i % 7 END AS BIGINT)
      |  AS va FROM range(0, 100) AS _r(i)),
      |b AS (SELECT j, CAST(j % 11 AS INT) AS kb,
      | CAST(CASE WHEN j % 4 = 0 THEN NULL ELSE j % 9 END AS BIGINT)
      |  AS wb FROM range(0, 60) AS _s(j)) """.stripMargin
      .replaceAll("\n", "")

  /** Join/subquery/set-op corpus: every generated query is folded to a
    * scalar-subquery checksum pair `(SUM fingerprint, COUNT)` so one
    * wide SELECT (no FROM) verifies the whole corpus in a single
    * DuckDB hash-match. Shapes: the four join types over equi keys
    * (incl. NULLABLE keys), compound ON conditions, grouped join
    * aggregates, [NOT] EXISTS correlation, [NOT] IN with the null trap,
    * and EXCEPT/INTERSECT [ALL]/UNION set ops.
    */
  private[queries] def genJoins(seed: Long = 4669201L): String = {
    val rnd = new scala.util.Random(seed)
    def pred(): String = rnd.nextInt(6) match {
      case 0 => s"a.i < b.j * ${1 + rnd.nextInt(3)}"
      case 1 => "b.wb IS NOT NULL"
      case 2 => "a.va IS NOT NULL"
      case 3 => s"MOD(a.i + b.j, ${2 + rnd.nextInt(5)}) = 0"
      case 4 => s"a.va <> b.j % 7"
      case 5 => s"a.i + b.j < ${40 + rnd.nextInt(100)}"
    }
    def onKeys(): String = rnd.nextInt(4) match {
      case 0 => "a.ka = b.kb"
      case 1 => "a.va = b.wb" // nullable keys: NULL never matches
      case 2 => s"MOD(a.i, ${4 + rnd.nextInt(6)}) = MOD(b.j, 8)"
      case 3 => "a.ka = b.kb AND " + pred()
    }
    // null-tolerant row fingerprint: distinct COALESCE sentinels per
    // side keep unmatched-left and unmatched-right rows distinguishable
    def fingerprint(): String =
      s"COALESCE(a.i, -${1 + rnd.nextInt(9)}) * 31 + " +
        s"COALESCE(b.j, -${10 + rnd.nextInt(9)}) * 7 + " +
        s"COALESCE(${if (rnd.nextBoolean()) "a.va" else "b.wb"}, " +
        s"${rnd.nextInt(5)})"
    def joinQ(): String = {
      val jt = Seq("JOIN", "LEFT JOIN", "RIGHT JOIN",
        "FULL JOIN")(rnd.nextInt(4))
      val where = if (rnd.nextInt(3) == 0) s" WHERE ${pred()}" else ""
      s"FROM a $jt b ON ${onKeys()}$where"
    }
    def groupedJoinQ(): String = {
      val g = Seq("a.ka", "b.kb", "a.va")(rnd.nextInt(3))
      s"(SELECT CAST(SUM(c * (COALESCE(g, -1) + 2)) AS BIGINT) " +
        s"FROM (SELECT $g AS g, COUNT(*) AS c, " +
        s"CAST(SUM(${fingerprint()}) AS BIGINT) AS f " +
        s"${joinQ()} GROUP BY $g) s0)"
    }
    def subQ(): String = {
      val corr = rnd.nextInt(4) match {
        case 0 => s"EXISTS (SELECT 1 FROM b WHERE b.kb = a.ka AND " +
          s"b.j < a.i + ${rnd.nextInt(20)})"
        case 1 => s"NOT EXISTS (SELECT 1 FROM b WHERE b.wb = a.va)"
        case 2 => s"a.ka IN (SELECT b.wb FROM b WHERE b.j % " +
          s"${2 + rnd.nextInt(3)} = 0)" // nullable IN list
        case 3 => s"a.va NOT IN (SELECT b.kb FROM b WHERE b.j < " +
          s"${10 + rnd.nextInt(30)})"
      }
      s"(SELECT COALESCE(CAST(SUM(a.i * 13 + COALESCE(a.va, -3)) " +
        s"AS BIGINT), -99) FROM a WHERE $corr)"
    }
    def setQ(): String = {
      val op = Seq("EXCEPT", "EXCEPT ALL", "INTERSECT",
        "INTERSECT ALL", "UNION", "UNION ALL")(rnd.nextInt(6))
      val l = Seq("SELECT ka AS x FROM a", "SELECT CAST(MOD(i, 17) " +
        "AS INT) AS x FROM a", "SELECT CAST(va AS INT) AS x FROM a")(
        rnd.nextInt(3))
      val r = Seq("SELECT kb AS x FROM b", "SELECT CAST(MOD(j, 15) " +
        "AS INT) AS x FROM b", "SELECT CAST(wb AS INT) AS x FROM b")(
        rnd.nextInt(3))
      s"(SELECT COALESCE(CAST(SUM(x * 5) AS BIGINT), -7) || '/' || " +
        s"COUNT(*) FROM ($l $op $r) s0)"
    }
    val cols = (0 until 44).map { k =>
      rnd.nextInt(4) match {
        case 0 =>
          val q = joinQ()
          s"(SELECT COALESCE(CAST(SUM(${fingerprint()}) AS BIGINT), " +
            s"-88) || '/' || COUNT(*) $q) AS q$k"
        case 1 => s"${groupedJoinQ()} AS q$k"
        case 2 => s"${subQ()} AS q$k"
        case 3 => s"${setQ()} AS q$k"
      }
    }.mkString(", ")
    s"SELECT $cols"
  }

  private val joinBody = genJoins()

  /** ASOF-join corpus: random ASOF shapes over the join fixture —
    * backward (`l.ts >= r.ts`) and forward (reversed) match
    * conditions, expression timestamps with literal offsets, nullable
    * keys (`va = wb`: NULL never matches) and a nullable PROBE
    * timestamp (no match, LEFT null-extends), inner and LEFT forms,
    * and a pre-aggregated subquery build side keyed on a nullable
    * build timestamp. The Spark text uses the reference's
    * MATCH_CONDITION spelling and goes through Dialect.normalize (the
    * union+window lowering under fuzz); DuckDB's native
    * `ASOF [LEFT] JOIN … ON eq AND ineq` is the oracle. Build rows are
    * unique per (key, ts-expression) by construction (j is unique; the
    * subquery groups by (kb, wb)), so the single-match row is
    * deterministic in both engines. The probe timestamp stays NON-NULL
    * by construction: DuckDB's ASOF sorts a NULL probe ordering value
    * as +infinity and matches it to the key's LARGEST build row
    * (measured, DuckDB 1.0), while the SQL comparison semantics the
    * reference and this engine implement (`NULL >= x` is not true) give
    * no match — a real engine split, pinned instead by DialectSpec's
    * null-timestamp e2e. Returns (sparkBody, duckBody).
    */
  private[graft] def genAsof(seed: Long = 2718281L): (String, String) = {
    val rnd = new scala.util.Random(seed)
    val sparkCols = Seq.newBuilder[String]
    val duckCols = Seq.newBuilder[String]
    (0 until 20).foreach { k =>
      val left = rnd.nextBoolean()
      val forward = rnd.nextInt(4) == 0
      val c = rnd.nextInt(20)
      val (ropA, on, lts, rts, payload) = rnd.nextInt(4) match {
        case 0 => ("b", "a.ka = b.kb", "a.i", s"b.j + $c", "b.j")
        case 1 => ("b", "a.va = b.wb", "a.i", s"b.j + $c", "b.j")
        case 2 => ("(SELECT kb, wb, MAX(j) AS pj FROM b GROUP BY kb, wb) bb",
          "a.ka = bb.kb", "a.i", "bb.wb", "bb.pj")
        // small-domain probe ts: heavy probe-probe and probe-build ties
        case 3 => ("b", "a.ka = b.kb", "a.i % 7", "b.j", "b.j")
      }
      val mc = if (forward) s"$rts >= $lts" else s"$lts >= $rts"
      val duckIneq = if (forward) s"$lts <= $rts" else s"$lts >= $rts"
      // 1-in-4: the probe side is itself an ON-join tree (probe x dim) —
      // the multi-alias struct-capture path of the union+window lowering;
      // the fingerprint reads a dim column so the re-exposed alias is
      // load-bearing. Identical FROM text parses in both engines.
      val tree = rnd.nextInt(4) == 0
      val from =
        if (tree) "a JOIN (SELECT DISTINCT ka AS dk, ka % 3 AS grp " +
          "FROM a) d ON a.ka = d.dk"
        else "a"
      val treeFp = if (tree) " + COALESCE(d.grp, -2) * 13" else ""
      val fp = s"COALESCE(a.va, -3) * 31 + a.i * 7 + " +
        s"COALESCE($payload, -${1 + rnd.nextInt(7)})$treeFp"
      val agg = s"COALESCE(CAST(SUM($fp) AS BIGINT), -88) || '/' || COUNT(*)"
      val sj = if (left) "LEFT ASOF JOIN" else "ASOF JOIN"
      val dj = if (left) "ASOF LEFT JOIN" else "ASOF JOIN"
      sparkCols += s"(SELECT $agg FROM $from $sj $ropA " +
        s"MATCH_CONDITION ($mc) ON $on) AS q$k"
      duckCols +=
        s"(SELECT $agg FROM $from $dj $ropA ON $on AND $duckIneq) AS q$k"
    }
    ("SELECT " + sparkCols.result().mkString(", "),
      "SELECT " + duckCols.result().mkString(", "))
  }

  private val asofBodies = genAsof()

  /** Windowing-TVF corpus (table.md TUMBLE/HOP/SESSION through
    * [[graft.ddl.Dialect]]'s rewriteWindowTvf): 15 random shapes —
    * TUMBLE with/without offset, HOP with size an exact multiple of
    * slide, SESSION keyed/unkeyed — each folded to a scalar-subquery
    * checksum `SUM(fingerprint) || '/' || COUNT(*)`. The DuckDB oracle
    * re-derives TUMBLE/HOP bounds with integer epoch arithmetic (the
    * fixture's timestamps are whole seconds, so the math is exact) and
    * SESSION with the same islands SQL the lowering emits (brk =
    * ts >= prev + gap, RANGE-frame running sum). ~1/17 of fixture
    * timestamps are NULL — the produces-no-rows rule is in play on
    * every line. Named-argument spellings are drawn at random.
    */
  private[graft] def genTvf(seed: Long = 31415926L): (String, String) = {
    val rnd = new scala.util.Random(seed)
    val step = 13 + rnd.nextInt(120)
    val jit = 1 + rnd.nextInt(29)
    val base = 1700000000L
    val es = s"WITH e AS (SELECT id AS i, CAST(id % 7 AS INT) AS k, " +
      s"CASE WHEN id % 17 = 0 THEN NULL ELSE " +
      s"timestamp_seconds($base + id * $step + (id % 5) * $jit) END AS ts " +
      s"FROM range(0, 90, 1, 1)) "
    val ed = s"WITH e AS (SELECT i, CAST(i % 7 AS INT) AS k, " +
      s"CASE WHEN i % 17 = 0 THEN NULL ELSE " +
      s"make_timestamp(($base + i * $step + (i % 5) * $jit) * 1000000) " +
      s"END AS ts FROM range(0, 90) AS _r(i)) "
    val ep = "CAST(FLOOR(EPOCH(ts)) AS BIGINT)"
    val sparkCols = Seq.newBuilder[String]
    val duckCols = Seq.newBuilder[String]
    (0 until 15).foreach { q =>
      val p1 = 86400 + rnd.nextInt(10000)
      val p2 = 900 + rnd.nextInt(500)
      rnd.nextInt(3) match {
        case 0 => // TUMBLE [offset]
          val s0 = Seq(60, 120, 300, 600, 900, 1800, 3600)(rnd.nextInt(7))
          val off = if (rnd.nextInt(3) == 0) 1 + rnd.nextInt(s0 - 1) else 0
          val tvf =
            if (rnd.nextBoolean())
              s"TABLE(TUMBLE(data => TABLE e, timecol => DESCRIPTOR(ts), " +
                s"size => INTERVAL '$s0' SECOND" +
                (if (off > 0) s", offset => INTERVAL '$off' SECOND" else "") +
                "))"
            else
              s"TABLE(TUMBLE(TABLE e, DESCRIPTOR(ts), INTERVAL '$s0' SECOND" +
                (if (off > 0) s", INTERVAL '$off' SECOND" else "") + "))"
          val fp = s"(unix_seconds(window_start) % $p1) * (i + 1) + " +
            s"unix_seconds(window_end) % $p2"
          sparkCols += s"(SELECT CAST(SUM($fp) AS BIGINT) || '/' || " +
            s"COUNT(*) FROM $tvf) AS q$q"
          val ws = s"((($ep - $off) // $s0) * $s0 + $off)"
          duckCols += s"(SELECT CAST(SUM(($ws % $p1) * (i + 1) + " +
            s"($ws + $s0) % $p2) AS BIGINT) || '/' || COUNT(*) " +
            s"FROM e WHERE ts IS NOT NULL) AS q$q"
        case 1 => // HOP, size = m * slide
          val sl = Seq(60, 300, 600, 900)(rnd.nextInt(4))
          val m = 2 + rnd.nextInt(3)
          val sz = sl * m
          val tvf =
            if (rnd.nextBoolean())
              s"TABLE(HOP(data => TABLE e, timecol => DESCRIPTOR(ts), " +
                s"slide => INTERVAL '$sl' SECOND, " +
                s"size => INTERVAL '$sz' SECOND))"
            else
              s"TABLE(HOP(TABLE e, DESCRIPTOR(ts), INTERVAL '$sl' SECOND, " +
                s"INTERVAL '$sz' SECOND))"
          val fp = s"(unix_seconds(window_start) % $p1) * (i + 1)"
          sparkCols += s"(SELECT CAST(SUM($fp) AS BIGINT) || '/' || " +
            s"COUNT(*) FROM $tvf) AS q$q"
          val ds = (0 until m).map(d => s"($d)").mkString(", ")
          val ws = s"((($ep) // $sl - d.d) * $sl)"
          duckCols += s"(SELECT CAST(SUM(($ws % $p1) * (i + 1)) AS BIGINT)" +
            s" || '/' || COUNT(*) FROM e, (VALUES $ds) d(d) " +
            s"WHERE ts IS NOT NULL) AS q$q"
        case 2 => // SESSION [key]
          val g = Seq(30, 60, 120, 300, 600)(rnd.nextInt(5))
          val keyed = rnd.nextBoolean()
          val tvf = s"TABLE(SESSION(TABLE e, DESCRIPTOR(ts)" +
            (if (keyed) ", DESCRIPTOR(k)" else "") +
            s", INTERVAL '$g' SECOND))"
          val fp = s"(unix_seconds(window_start) % $p1) * (i + 1) + " +
            s"unix_seconds(window_end) % $p2"
          sparkCols += s"(SELECT CAST(SUM($fp) AS BIGINT) || '/' || " +
            s"COUNT(*) FROM $tvf) AS q$q"
          val pk = if (keyed) "PARTITION BY k " else ""
          val pks = if (keyed) "PARTITION BY k, sid" else "PARTITION BY sid"
          duckCols += s"(SELECT CAST(SUM((CAST(FLOOR(EPOCH(ws)) AS BIGINT)" +
            s" % $p1) * (i + 1) + CAST(FLOOR(EPOCH(we)) AS BIGINT) % $p2) " +
            s"AS BIGINT) || '/' || COUNT(*) FROM " +
            s"(SELECT i, MIN(ts) OVER ($pks) AS ws, " +
            s"MAX(ts) OVER ($pks) + INTERVAL $g SECOND AS we FROM " +
            s"(SELECT i, k, ts, SUM(brk) OVER (${pk}ORDER BY ts) AS sid " +
            s"FROM (SELECT i, k, ts, CASE WHEN LAG(ts) OVER " +
            s"(${pk}ORDER BY ts) IS NULL OR ts >= LAG(ts) OVER " +
            s"(${pk}ORDER BY ts) + INTERVAL $g SECOND THEN 1 ELSE 0 END " +
            s"AS brk FROM e WHERE ts IS NOT NULL) _m) _s) _w) AS q$q"
      }
    }
    (es + "SELECT " + sparkCols.result().mkString(", "),
      ed + "SELECT " + duckCols.result().mkString(", "))
  }

  private val tvfBodies = genTvf()

  /** strftime-format corpus (datetime.md:460-560 through the
    * registered FORMAT_TIMESTAMP/FORMAT_DATE wrappers): 20 random
    * %-patterns over the directive subset chrono, java.time (our
    * translator), and DuckDB's strftime all agree on byte-for-byte
    * (%e and %f are excluded — space-padding and fraction width are
    * documented engine splits), each emitted as a PER-ROW output
    * column, so the driver's hash compares every formatted string of
    * every row. Whole-second fixture timestamps; one column formats
    * the DATE cast. Returns (sparkSql, duckSql).
    */
  private[graft] def genStrftime(seed: Long = 6180339L): (String, String) = {
    val rnd = new scala.util.Random(seed)
    val step = 4001 + rnd.nextInt(90000)
    val base = 1500000000L + rnd.nextInt(100000)
    val es = s"WITH e AS (SELECT id AS i, " +
      s"timestamp_seconds($base + id * $step) AS ts FROM range(0, 90, 1, 1)) "
    val ed = s"WITH e AS (SELECT i, " +
      s"make_timestamp(($base + i * $step) * 1000000) AS ts " +
      s"FROM range(0, 90) AS _r(i)) "
    val dirs = "YymdHMSjaAbBIp".toCharArray
    val seps = Seq("-", "/", " ", ":", "|", ".", "T", ", ")
    val sparkCols = Seq.newBuilder[String]
    val duckCols = Seq.newBuilder[String]
    (0 until 20).foreach { q =>
      val n = 3 + rnd.nextInt(4)
      val fmt = (0 until n).map { k =>
        "%" + dirs(rnd.nextInt(dirs.length)) +
          (if (k == n - 1) "" else seps(rnd.nextInt(seps.length)))
      }.mkString
      val asDate = rnd.nextInt(5) == 0 &&
        !fmt.exists("HMSIp".toSet.contains(_: Char))
      if (asDate) {
        sparkCols += s"format_date('$fmt', CAST(ts AS DATE)) AS q$q"
        duckCols += s"strftime(CAST(ts AS DATE), '$fmt') AS q$q"
      } else {
        sparkCols += s"format_timestamp('$fmt', ts) AS q$q"
        duckCols += s"strftime(ts, '$fmt') AS q$q"
      }
    }
    (es + "SELECT i, " + sparkCols.result().mkString(", ") + " FROM e",
      ed + "SELECT i, " + duckCols.result().mkString(", ") + " FROM e")
  }

  private val strftimeBodies = genStrftime()

  /** Decimal-arithmetic corpus (the reference's Postgres numeric golden
    * suites, fuzzed): random add/subtract/multiply/ABS/LEAST/GREATEST/
    * CASE chains over
    * DECIMAL(18,4) with every binary result cast back to (18,4). The
    * only scale-reducing cast is the multiplication case's (,8)→(,4),
    * and decimal scale reduction is NOT portable at all (DuckDB 1.0
    * TRUNCATES the cast, newer DuckDB rounds, Spark rounds HALF_UP —
    * measured), so the grammar keeps the dropped digits exactly ZERO
    * by construction: every multiplication operand has an unscaled
    * value that is a multiple of 100 (columns are multiples of 10^4,
    * literal fractions carry only 2 decimals), so each product is a
    * multiple of 10^4 and the cast is exact in every engine/version.
    * Everything else stays inside the exact envelope: leaves ≤
    * 99.9999, products ≤ 1e4, so no intermediate overflows 38 digits
    * in either engine and no value silently degrades to DOUBLE (DuckDB
    * would on width overflow). Division and AVG are excluded on
    * purpose: x/0 and decimal-AVG return types are real dialect
    * splits, pinned separately in SqlConformance.
    */
  private[queries] def genDecimals(seed: Long = 16180339L): String = {
    val rnd = new scala.util.Random(seed)
    val D = "DECIMAL(18,4)"
    def leaf(): String = rnd.nextInt(6) match {
      case 0 => s"CAST(i AS $D)"
      case 1 => s"CAST(two AS $D)"
      case 2 => s"CAST(ten AS $D)"
      case 3 => s"CAST(v AS $D)" // nullable
      case 4 => s"CAST(${rnd.nextInt(90)}.${1000 + rnd.nextInt(9000)} " +
        s"AS $D)"
      case 5 => s"CAST(-${rnd.nextInt(20)}.${1000 + rnd.nextInt(9000)} " +
        s"AS $D)"
    }
    // multiplication operands whose product's low four unscaled digits
    // are always exact zeros (columns: multiples of 10^4; literals:
    // 2-decimal fractions, multiples of 100 — product of two multiples
    // of 100 is a multiple of 10^4), so the (,8)→(,4) cast drops
    // nothing and its engine-divergent rounding mode never engages
    def mulLeaf(): String = rnd.nextInt(6) match {
      case 0 => s"CAST(i AS $D)"
      case 1 => s"CAST(two AS $D)"
      case 2 => s"CAST(ten AS $D)"
      case 3 => s"CAST(v AS $D)" // nullable
      case _ =>
        val frac = 10 + rnd.nextInt(90)
        val sign = if (rnd.nextBoolean()) "" else "-"
        s"CAST($sign${rnd.nextInt(90)}.$frac AS $D)"
    }
    def dExpr(d: Int): String =
      if (d <= 0) leaf()
      else rnd.nextInt(7) match {
        case 0 => s"CAST(${dExpr(d - 1)} + ${dExpr(d - 1)} AS $D)"
        case 1 => s"CAST(${dExpr(d - 1)} - ${dExpr(d - 1)} AS $D)"
        // multiplication only at the leaf tier: bounded magnitude,
        // and the (36,8) → (18,4) cast is tie-free (odd operands)
        case 2 => s"CAST(${mulLeaf()} * ${mulLeaf()} AS $D)"
        case 3 => s"ABS(${dExpr(d - 1)})"
        case 4 => s"LEAST(${dExpr(d - 1)}, ${dExpr(d - 1)})"
        case 5 => s"GREATEST(${dExpr(d - 1)}, ${dExpr(d - 1)})"
        case 6 => s"(CASE WHEN ${dExpr(d - 1)} > ${leaf()} " +
          s"THEN ${dExpr(d - 1)} ELSE ${dExpr(d - 1)} END)"
      }
    // Result columns are rendered as STRING digits over a pinned
    // intermediate decimal type (the fn_decimal pattern): a raw
    // derived-DECIMAL output column is a driver-side DuckDB-version
    // representation split even when the values are bit-identical (r9
    // adjudication — precision/scale/python-repr rules moved between
    // versions). Both engines print a pinned DECIMAL(p,s) with the full
    // s-digit scale, so the hash compares exact digits. `STRING` is a
    // shared spelling (Spark native; DuckDB alias for VARCHAR).
    val nD = 40
    val cols = (0 until nD).map { k =>
      val e = dExpr(1 + rnd.nextInt(2))
      s"CAST(CAST(SUM($e) AS DECIMAL(38,6)) AS STRING) AS q${k}_s, " +
        s"CAST(CAST(MIN($e) AS $D) AS STRING) AS q${k}_mn, " +
        s"CAST(CAST(MAX($e) AS $D) AS STRING) AS q${k}_mx, " +
        s"COUNT($e) AS q${k}_n"
    }.mkString(", ")
    s"SELECT $cols FROM t"
  }

  private val decimalBody = genDecimals()

  /** Timestamp-arithmetic corpus: MAKE_TIMESTAMP leaves (shared
    * spelling, integer args), random interval chains across every unit
    * from SECOND to MONTH (month-end clamping in play), and DATE_TRUNC
    * at minute/hour/day — folded per shape to a positional
    * yyyymmddhhmmss checksum via EXTRACT, which sidesteps the epoch
    * dialect split (Spark UNIX_TIMESTAMP vs DuckDB EXTRACT(EPOCH)).
    */
  private[queries] def genTimestamps(seed: Long = 14142135L): String = {
    val rnd = new scala.util.Random(seed)
    def leaf(): String = rnd.nextInt(3) match {
      case 0 => "MAKE_TIMESTAMP(2020 + two, 1 + ten, 1 + MOD(i, 27), " +
        "MOD(i, 24), MOD(i * 7, 60), MOD(i * 13, 60))"
      case 1 => "MAKE_TIMESTAMP(1999 + four, 12, 28 + MOD(i, 4), " +
        "23, MOD(i, 60), 59)" // year-boundary rollovers
      case 2 => "MAKE_TIMESTAMP(2024, 2, 26 + MOD(i, 4), " +
        "MOD(i * 3, 24), 30, 0)" // leap-day neighborhood
    }
    // DAY constants skip multiples of 30 — the DuckDB interval-CSE
    // collision class (see genDates); sub-day units are exact multiples
    // of each other, so their normalized-equal pairs are semantically
    // identical and CSE-safe.
    def tDays(): Int = {
      val n = 1 + rnd.nextInt(40)
      if (n % 30 == 0) n + 1 else n
    }
    def tExpr(d: Int): String =
      if (d <= 0) leaf()
      else rnd.nextInt(7) match {
        case 0 => s"(${tExpr(d - 1)} + INTERVAL '${1 + rnd.nextInt(90)}' SECOND)"
        case 1 => s"(${tExpr(d - 1)} + INTERVAL '${1 + rnd.nextInt(200)}' MINUTE)"
        case 2 => s"(${tExpr(d - 1)} + INTERVAL '${1 + rnd.nextInt(50)}' HOUR)"
        case 3 => s"(${tExpr(d - 1)} - INTERVAL '${tDays()}' DAY)"
        case 4 => s"(${tExpr(d - 1)} + INTERVAL '${1 + rnd.nextInt(14)}' MONTH)"
        case 5 => s"DATE_TRUNC('${Seq("minute", "hour", "day")(rnd.nextInt(3))}', " +
          s"${tExpr(d - 1)})"
        case 6 => s"(${tExpr(d - 1)} - INTERVAL '${1 + rnd.nextInt(1000)}' MINUTE)"
      }
    val nT = 40
    val inner = (0 until nT)
      .map(k => s"${tExpr(1 + rnd.nextInt(2))} AS w$k").mkString(", ")
    val outer = (0 until nT).map { k =>
      s"CAST(SUM((EXTRACT(YEAR FROM w$k) * 10000000000 + " +
        s"EXTRACT(MONTH FROM w$k) * 100000000 + " +
        s"EXTRACT(DAY FROM w$k) * 1000000 + " +
        s"EXTRACT(HOUR FROM w$k) * 10000 + " +
        s"EXTRACT(MINUTE FROM w$k) * 100 + " +
        s"CAST(EXTRACT(SECOND FROM w$k) AS BIGINT)) * " +
        s"(CAST(i AS BIGINT) + 1)) AS BIGINT) AS q$k"
    }.mkString(", ")
    s"SELECT $outer FROM (SELECT i, $inner FROM t) s"
  }

  private val timestampBody = genTimestamps()

  /** Alternate-seed corpora for the cross-engine robustness sweep
    * ([[graft.tools.FuzzSweep]]): the SAME grammars as the graded
    * fixed-seed rows, regenerated under arbitrary seeds so latent
    * dialect splits surface in a dev sweep before any future driver
    * DuckDB can find them. Returns (name, sparkSql, duckSql).
    */
  private[graft] def corpus(seed: Long): Seq[(String, String, String)] = {
    val (f, g) = gen(seed)
    val w = genWindows(seed)
    val st = genStrings(seed)
    val dt = genDates(seed)
    val jn = genJoins(seed)
    val dc = genDecimals(seed)
    val ts = genTimestamps(seed)
    val (asS, asD) = genAsof(seed)
    val (tvS, tvD) = genTvf(seed)
    def overT(n: String, b: String) =
      (n, SqlConformance.TS + b, SqlConformance.TD + b)
    Seq(
      overT("fz_flat", f), overT("fz_grouped", g), overT("fz_window", w),
      overT("fz_strings", st), overT("fz_dates", dt),
      ("fz_joins", JS + jn, JD + jn),
      ("fz_asof", graft.ddl.Dialect.normalize(JS + asS), JD + asD),
      ("fz_tvf", graft.ddl.Dialect.normalize(tvS), tvD),
      { val (sfS, sfD) = genStrftime(seed); ("fz_strftime", sfS, sfD) },
      overT("fz_decimals", dc), overT("fz_timestamps", ts))
  }

  val queries: Seq[Q] = Seq(
    Q("slt_fuzz", SqlConformance.TD + flatBody) { (s, _) =>
      s.sql(SqlConformance.TS + flatBody)
    },
    Q("slt_fuzz_grouped", SqlConformance.TD + groupedBody) { (s, _) =>
      s.sql(SqlConformance.TS + groupedBody)
    },
    Q("slt_fuzz_window", SqlConformance.TD + windowBody) { (s, _) =>
      s.sql(SqlConformance.TS + windowBody)
    },
    Q("slt_fuzz_strings", SqlConformance.TD + stringBody) { (s, _) =>
      s.sql(SqlConformance.TS + stringBody)
    },
    Q("slt_fuzz_dates", SqlConformance.TD + dateBody) { (s, _) =>
      s.sql(SqlConformance.TS + dateBody)
    },
    Q("slt_fuzz_joins", JD + joinBody) { (s, _) =>
      s.sql(JS + joinBody)
    },
    Q("slt_fuzz_asof", JD + asofBodies._2) { (s, _) =>
      s.sql(graft.ddl.Dialect.normalize(JS + asofBodies._1))
    },
    Q("slt_fuzz_tvf", tvfBodies._2) { (s, _) =>
      s.sql(graft.ddl.Dialect.normalize(tvfBodies._1))
    },
    Q("slt_fuzz_strftime", strftimeBodies._2) { (s, _) =>
      graft.functions.Registry.registerAll(s)
      s.sql(strftimeBodies._1)
    },
    Q("slt_fuzz_decimals", SqlConformance.TD + decimalBody) { (s, _) =>
      s.sql(SqlConformance.TS + decimalBody)
    },
    Q("slt_fuzz_timestamps", SqlConformance.TD + timestampBody) { (s, _) =>
      s.sql(SqlConformance.TS + timestampBody)
    })
}
