package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** External conformance corpus: PostgreSQL's regression suite
  * (postgres/src/test/regress), as adapted into golden tests by the
  * reference compiler (sql-to-dbsp-compiler `compiler/sql/postgres/
  * Postgres*Tests.java`) and ported here as DATA under
  * `resources/pgcorpus/` (scripts/port_pgcorpus.py) — queries plus
  * their RECORDED expected outputs. Unlike the self-authored
  * [[SqlConformance]]/[[SltFuzz]] batteries, these queries and answers
  * were written by neither this repo nor its oracle, so they probe
  * blind spots both share.
  *
  * Execution path: fixture DDL+INSERTs become temp views (bad rows
  * dropped via try_cast, mirroring the reference's tolerance of the
  * corpus's deliberately-invalid inserts); each query runs through
  * [[graft.ddl.Dialect.normalize]] — the production view path.
  *
  * Comparison: each result row renders to a canonical `|`-joined cell
  * string (Postgres .out conventions: `t`/`f` booleans, `MM-dd-yyyy`
  * dates, `Mon Feb 10 17:32:01.4 1997` timestamps) and compares as a
  * MULTISET against the recorded output — the same Z-set semantics the
  * reference's own harness uses (SqlIoTest.java compare via Change).
  * NULL and the corpus's textual null spellings canonicalize to one
  * marker on BOTH sides, so the compare is exact up to that encoding.
  *
  * Graded rows (`pgr_*`): the Spark side emits (tid, r) rendered rows;
  * the DuckDB "oracle" is a literal VALUES relation of the
  * corpus-recorded expected rows — the driver's hash-match then grades
  * Spark against PostgreSQL's own recorded answers, a stronger anchor
  * than cross-engine agreement.
  */
object PgCorpus {

  final case class CorpusTest(id: String, query: String,
      expected: Seq[Seq[String]])
  final case class Suite(name: String, setup: Seq[String],
      tests: Seq[CorpusTest])

  private val NullMarker = "∅"

  /** Canonical cell: trimmed; the corpus's null spellings and NULL
    * itself collapse to one marker (bool cells arrive as t/f already).
    */
  private val pgDate = """^(\d{2})-(\d{2})-(\d{4,})$""".r
  private val pgTs =
    ("""^[A-Z][a-z]{2} ([A-Z][a-z]{2}) (\d{1,2}) """ +
      """(\d{2}:\d{2}:\d{2}(?:\.\d+)?) (\d{1,})$""").r
  private val months = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec").zipWithIndex
    .map { case (m, i) => m -> f"${i + 1}%02d" }.toMap

  def canonCell(s: String): String = canonCell(s, interval = false)

  private val clockIv =
    """^(?:(-?\d+) days? )?([+-])?(\d{1,2}):(\d{2})(?::(\d{2}))?(\.\d+)?$""".r
  private val verboseIv =
    ("""^((?:-?\d+(?:\.\d+)? """ +
      """(?:years?|mons?|months?|days?|hours?|mins?|minutes?""" +
      """|secs?|seconds?)\s*)+)(ago)?$""").r

  /** Interval-suite cells parse to exact totals — ym:<months> /
    * dt:<micros> — because the corpus mixes Postgres verbose,
    * sql-standard and clock interval renderings; renderCol emits the
    * same totals from the typed values.
    */
  private def canonInterval(t: String): Option[String] = t match {
    case clockIv(days, tsign, hh, mm, ss, frac) =>
      val micros = Option(ss).map(_.toLong).getOrElse(0L) * 1000000L +
        mm.toLong * 60000000L + hh.toLong * 3600000000L +
        Option(frac).map(f0 =>
          math.round(f0.toDouble * 1000000L)).getOrElse(0L)
      // day-ful form: the corpus prints the sign on the day component
      // only ("-1 days 02:03:00" is the NEGATIVE 1d2h3m interval)
      val total = Option(days) match {
        case Some(ds) =>
          val sign = if (ds.startsWith("-")) -1L else 1L
          sign * (math.abs(ds.toLong) * 86400000000L + micros)
        case None =>
          (if (tsign == "-") -1L else 1L) * micros
      }
      Some(s"dt:$total")
    case verboseIv(body, ago) =>
      var months = 0L
      var micros = 0L
      var ym = false
      val part = """(-?\d+(?:\.\d+)?) ([a-z]+)""".r
      for (m <- part.findAllMatchIn(body)) {
        val n = m.group(1)
        def whole = n.toLong
        def us = math.round(n.toDouble * 1000000L)
        m.group(2).stripSuffix("s") match {
          case "year" => months += whole * 12; ym = true
          case "mon" | "month" => months += whole; ym = true
          case "day" => micros += whole * 86400000000L
          case "hour" => micros += whole * 3600000000L
          case "min" | "minute" => micros += whole * 60000000L
          case "sec" | "second" => micros += us
          case _ =>
        }
      }
      val sgn = if (ago != null) -1L else 1L
      Some(if (ym) s"ym:${sgn * months}" else s"dt:${sgn * micros}")
    case _ => None
  }

  def canonCell(s: String, interval: Boolean): String = {
    val t = if (s == null) "" else s.trim
    if (t.isEmpty || t == "null" || t == "NULL") NullMarker
    else if (t == "-0") "0" // a corpus-side negative-zero int rendering
    else if (interval && canonInterval(t).isDefined) canonInterval(t).get
    else t match {
      // the corpus mixes rendering conventions across its adaptations
      // (ISO vs MM-dd-yyyy dates, ISO vs `Mon Feb 10 ... 1997`
      // timestamps — their TableParser accepts all); both sides
      // canonicalize to ISO with trimmed fractional seconds
      case sci if sci.matches("-?\\d+(\\.\\d+)?[eE][+-]?\\d+") =>
        // exponent-notation case varies across the corpus adaptations
        sci.toLowerCase.replace("e", "e").replaceFirst("e(\\d)", "e+$1")
      case dec if dec.matches("-?\\d+\\.\\d+") =>
        val trimmed = dec.replaceAll("(\\.\\d*?)0+$", "$1")
          .replaceAll("\\.$", "")
        if (trimmed == "-0") "0" else trimmed
      case pgDate(mm, dd, y) => f"${y.toInt}%04d-$mm-$dd"
      case pgTs(mon, dd, time, y) =>
        f"${y.toInt}%04d-${months(mon)}-${dd.toInt}%02d ${trimFrac(time)}"
      case other if other.matches(
        """\d{4,}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?""") =>
        val Array(d, tm) = other.split(" ", 2)
        s"$d ${trimFrac(tm)}"
      case other => other
    }
  }

  private def trimFrac(time: String): String =
    if (!time.contains('.')) time
    else time.replaceAll("0+$", "").stripSuffix(".")

  // ----------------------------------------------------------- parse

  def load(name: String): Suite = {
    val in = getClass.getResourceAsStream(s"/pgcorpus/$name.txt")
    require(in != null, s"pgcorpus resource missing: $name")
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val lines = text.split("\n", -1)
    val setup = Vector.newBuilder[String]
    val tests = Vector.newBuilder[CorpusTest]
    var mode = ""
    var testId = ""
    val buf = scala.collection.mutable.Buffer[String]()
    def flush(): Unit = {
      if (mode == "SETUP") setup ++= splitStatements(
        buf.map(stripLineComment).mkString("\n"))
      else if (mode == "TEST")
        tests ++= parseTests(testId, buf.toSeq, name == "interval")
      buf.clear()
    }
    for (line <- lines) {
      if (line.startsWith("== SETUP")) { flush(); mode = "SETUP" }
      else if (line.startsWith("== TEST ")) {
        flush(); mode = "TEST"
        testId = line.drop("== TEST ".length).split(" ")(0)
      } else if (!line.startsWith("-- pgcorpus") &&
        !line.startsWith("-- provenance") &&
        !line.startsWith("--   sql-to-dbsp") &&
        !line.startsWith("-- ported ")) buf += line
    }
    flush()
    Suite(name, setup.result(), tests.result())
  }

  /** Test block(s): query (up to the line ending with `;`), then the
    * .out table: header, ---- separator, data rows, optional "(N rows)"
    * fence. A block may carry several query/table units back to back;
    * units after the first get a `/k` id suffix.
    */
  private def parseTests(id: String, lines0: Seq[String],
      intervalMode: Boolean = false): Seq[CorpusTest] = {
    val out = Vector.newBuilder[CorpusTest]
    var lines = lines0.dropWhile(_.trim.isEmpty)
    var k = 0
    while (lines.exists(_.trim.nonEmpty)) {
      val uid = if (k == 0) id else s"$id/$k"
      val qEnd =
        lines.indexWhere(l => stripLineComment(l).trim.endsWith(";"))
      require(qEnd >= 0, s"pgcorpus test $uid: no query terminator")
      val query = lines.take(qEnd + 1).map(stripLineComment)
        .mkString("\n").trim.stripSuffix(";")
      val rest = lines.drop(qEnd + 1)
      val sepIdx = rest.indexWhere(l =>
        l.trim.nonEmpty && l.trim.forall(c => c == '-' || c == '+'))
      val fence: String => Boolean = _.trim.matches("""\(\d+ rows?\)""")
      // keep blank lines: a single-column empty/NULL row renders as an
      // (almost) empty line in .out; trailing blanks are trimmed only
      // when there is no "(N rows)" fence to delimit the rows exactly
      val afterSep = if (sepIdx < 0) Seq.empty else rest.drop(sepIdx + 1)
      val fenceIdx = afterSep.indexWhere(fence)
      val dataLines =
        if (fenceIdx >= 0) afterSep.take(fenceIdx)
        else {
          val untilNext = afterSep
          untilNext.reverse.dropWhile(_.trim.isEmpty).reverse
        }
      out += CorpusTest(uid, query,
        dataLines.map(_.split("\\|", -1).toSeq
          .map(canonCell(_, intervalMode))))
      lines =
        (if (fenceIdx >= 0) afterSep.drop(fenceIdx + 1) else Seq.empty)
          .dropWhile(_.trim.isEmpty)
      k += 1
    }
    out.result()
  }

  /** Drop `--` comments outside single-quoted literals. */
  private def stripLineComment(l: String): String = {
    var inQ = false
    var i = 0
    while (i < l.length) {
      val c = l.charAt(i)
      if (c == '\'') inQ = !inQ
      else if (!inQ && c == '-' && i + 1 < l.length &&
        l.charAt(i + 1) == '-') return l.substring(0, i)
      i += 1
    }
    l
  }

  private def splitStatements(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    for (c <- s) {
      if (c == '\'') inQ = !inQ
      if (c == ';' && !inQ) { out += cur.toString.trim; cur.clear() }
      else cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result().filter(_.nonEmpty)
  }

  // ----------------------------------------------------------- setup

  /** Postgres type spellings → Spark (word-boundary, case-insensitive). */
  private[queries] def mapPgTypes(sql: String): String = {
    var s = sql
    s = "(?i)\\bdouble\\s+precision\\b".r.replaceAllIn(s, "DOUBLE")
    // Spark's BINARY takes no length parameter
    s = "(?i)\\bbinary\\s*\\(\\s*\\d+\\s*\\)".r.replaceAllIn(s, "BINARY")
    for ((pg, spark) <- Seq("int2" -> "SMALLINT", "int4" -> "INT",
      "int8" -> "BIGINT", "float4" -> "FLOAT", "float8" -> "DOUBLE",
      "int16" -> "SMALLINT", "int32" -> "INT", "int64" -> "BIGINT",
      "bytea" -> "BINARY",
      "text" -> "STRING", "bool" -> "BOOLEAN", "numeric" -> "DECIMAL"))
      s = ("(?i)\\b" + pg + "\\b").r.replaceAllIn(s, spark)
    graft.ddl.Dialect.mapBareTypes(s) // bare VARCHAR → STRING
  }

  private val createRe =
    """(?is)\s*CREATE\s+TABLE\s+(\w+)\s*\((.*)\)\s*""".r
  private val createViewRe =
    """(?is)\s*CREATE\s+(?:LOCAL\s+|MATERIALIZED\s+)?VIEW\s+(\w+)\s*(\([^)]*\))?\s*AS\s+(.*)""".r
  private val insertRe =
    """(?is)\s*INSERT\s+INTO\s+(\w+)\s*(?:\(([^)]*)\))?\s*VALUES\s*(.*)""".r

  /** Build each corpus table as a temp view over VALUES with per-column
    * try_cast; rows whose non-null literals fail the cast are dropped —
    * the corpus includes deliberately-invalid inserts ('1997-02-29',
    * BC dates) whose rows the recorded outputs omit.
    */
  def registerSetup(spark: SparkSession, suite: Suite): Unit = {
    graft.functions.Registry.registerAll(spark)
    val cols = scala.collection.mutable.LinkedHashMap[String,
      Seq[(String, String)]]() // table -> (colName, sparkType)
    val rows = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.Buffer[String]]() // table -> tuples text
    for (stmt <- suite.setup) stmt match {
      case createRe(name, body) =>
        val defs = splitTopLevel(body, ',').map(_.trim).filter(_.nonEmpty)
          .filterNot(_.toUpperCase.startsWith("PRIMARY "))
          .map { d =>
            val parts = d.split("\\s+", 2)
            (parts(0).toLowerCase,
              mapPgTypes(parts(1)
                .replaceAll(
                  "(?i)\\b(not\\s+null|primary\\s+key|unique)\\b", "")
                .trim))
          }
        cols(name.toLowerCase) = defs
        rows.getOrElseUpdate(name.toLowerCase,
          scala.collection.mutable.Buffer[String]())
      case insertRe(name, colList, values) =>
        val t = name.toLowerCase
        val tuples = splitTopLevel(values.trim, ',').map(_.trim)
        val targetCols = Option(colList)
          .map(_.split(",").map(_.trim.toLowerCase).toSeq)
        val allCols = cols(t).map(_._1)
        rows.getOrElseUpdate(t, scala.collection.mutable.Buffer[String]())
        for (tup <- tuples if tup.nonEmpty) {
          // Postgres typed bool literals (`bool 't'`) in fixture rows
          val inner0 = tup.stripPrefix("(").stripSuffix(")")
          val inner = """(?i)\bbool(?:ean)?\s+('(?:[^']|'')*')""".r
            .replaceAllIn(inner0, "CAST($1 AS BOOLEAN)")
          // quote bare numeric literals destined for DECIMAL/STRING
          // columns — Spark's inline tables refuse mixed INT/STRING
          def normalized(values: Seq[String]): Seq[String] =
            cols(t).map(_._2).zipAll(values, "STRING", "NULL").map {
              case (tpe, v)
                if v.matches("-?[\\d.]+") &&
                  (tpe.toUpperCase.startsWith("DECIMAL") ||
                    tpe.toUpperCase.startsWith("STRING")) => s"'$v'"
              case (_, v) => v
            }
          targetCols match {
            case None =>
              rows(t) += normalized(splitTopLevel(inner, ',')
                .map(_.trim)).mkString("(", ", ", ")")
            case Some(tc) => // reorder/pad to the full column list
              val vals = splitTopLevel(inner, ',').map(_.trim)
              val byCol = tc.zip(vals).toMap
              rows(t) += normalized(
                allCols.map(byCol.getOrElse(_, "NULL")))
                .mkString("(", ", ", ")")
          }
        }
      case createViewRe(name, colList, body) =>
        // fixture views (the interval suite) go straight through the
        // dialect path like any program view; normalize already
        // escapes literal backslashes — a second pass would quadruple
        spark.sql(
          s"CREATE OR REPLACE TEMPORARY VIEW ${name.toLowerCase}" +
            s"${Option(colList).getOrElse("")} AS " +
            graft.ddl.Dialect.normalize(body))
      case other =>
        System.err.println(s"pgcorpus: ignoring setup statement: " +
          other.take(60))
    }
    for ((t, defs) <- cols) {
      val vnames = defs.indices.map(i => s"v$i")
      val casts = defs.zip(vnames).map { case ((c, tpe), v) =>
        s"TRY_CAST($v AS $tpe) AS $c" }.mkString(", ")
      val guards = defs.zip(vnames).map { case ((_, tpe), v) =>
        // DATE casts in Spark tolerate trailing junk ('2040-04-10 BC'
        // parses); a round-trip equality makes the bad-row drop exact
        if (tpe.toUpperCase.startsWith("DATE"))
          s"($v IS NULL OR CAST(TRY_CAST($v AS $tpe) AS STRING) = " +
            s"trim(CAST($v AS STRING)))"
        else s"($v IS NULL OR TRY_CAST($v AS $tpe) IS NOT NULL)" }
        .mkString(" AND ")
      val body =
        if (rows(t).isEmpty) {
          val schema = defs
            .map { case (c, tpe) => s"CAST(NULL AS $tpe) AS $c" }
            .mkString(", ")
          s"SELECT $schema WHERE 1 = 0"
        } else
          s"SELECT $casts FROM (VALUES ${rows(t).mkString(", ")}) AS " +
            s"_v(${vnames.mkString(", ")}) WHERE $guards"
      // fixture literals are standard-conforming; protect backslashes
      // from Spark's C-style literal escapes, like Dialect.normalize
      spark.sql(graft.ddl.Dialect.escapeLiteralBackslashes(
        s"CREATE OR REPLACE TEMPORARY VIEW $t AS $body"))
    }
  }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    for (c <- s) {
      if (c == '\'') { inQ = !inQ; cur += c }
      else if (inQ) cur += c
      else if (c == '(') { depth += 1; cur += c }
      else if (c == ')') { depth -= 1; cur += c }
      else if (c == sep && depth == 0) { out += cur.toString; cur.clear() }
      else cur += c
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.result()
  }

  // ------------------------------------------------------------- run

  /** Corpus-dialect pre-rewrites the production Dialect does not carry
    * (they are Postgres-testfile idioms, not reference grammar):
    * quoted/keyword column aliases and Postgres type names. All
    * rewrites are quote-aware — a literal 'text' must never be read as
    * the type text. Double-quoted aliases are replaced with generated
    * names: the corpus headers are not compared (only cells are), and
    * several carry parens/commas the identifier map rejects by design.
    */
  private[queries] def preRewrite(q: String): String = {
    var n = 0
    val mapped = mapOutsideLiterals(q) { run =>
      var s = run
      s = """(?i)\bAS\s+(?:U&)?"[^"]*"(\s+UESCAPE)?""".r.replaceAllIn(s,
        m => { n += 1
          if (m.group(1) == null) s"AS _qa$n" else s"AS _qa$n UESCAPE" })
      s = """(?i)\bAS\s+(true|false|year|month|day|case|end|from|to)\b""".r
        .replaceAllIn(s, m => "AS `" + m.group(1) + "`")
      mapPgTypes(s)
    }
    // a dropped quoted alias may have carried a UESCAPE clause whose
    // escape-char literal sat outside the rewritten run
    val noUe = """(?i)\bAS\s+(_qa\d+) UESCAPE\s*'[^']*'""".r
      .replaceAllIn(mapped, "AS $1")
    // Postgres's typed bool literal (`bool 't'`) has no Spark typed-
    // literal form; CAST accepts the same spellings. The single-quoted
    // alias form (`AS 'one'`) also sits across the literal boundary.
    val noBool = """(?i)\bBOOLEAN\s+('(?:[^']|'')*')""".r
      .replaceAllIn(noUe, "CAST($1 AS BOOLEAN)")
    """(?i)\bAS\s+'([^']+)'""".r
      .replaceAllIn(noBool, m => "AS `" + m.group(1) + "`")
  }

  /** Apply `f` to the text between single-quoted literals, leaving the
    * literals themselves untouched ('' is the embedded-quote escape).
    */
  private def mapOutsideLiterals(s: String)(f: String => String): String = {
    val out = new StringBuilder
    val run = new StringBuilder
    var i = 0
    var inQ = false
    def flushRun(): Unit = { out ++= f(run.toString); run.clear() }
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inQ && c == '\'') { flushRun(); inQ = true; out += c }
      else if (inQ && c == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
          out ++= "''"; i += 1
        } else { inQ = false; out += c }
      } else if (inQ) out += c
      else run += c
      i += 1
    }
    flushRun()
    out.toString
  }

  def runQuery(spark: SparkSession, q: String): DataFrame =
    org.apache.spark.sql.graft.IntegerDivision(
      spark.sql(graft.ddl.Dialect.normalize(preRewrite(q))))

  /** One query result as a single rendered column `r`: columns renamed
    * positionally first — corpus queries may emit duplicate names
    * (`SELECT *` over a join) that a by-name render would find
    * ambiguous.
    */
  private[graft] def renderedRows(df: DataFrame,
      intervalMode: Boolean = false): DataFrame = {
    val rn = df.toDF(df.columns.indices.map(i => s"_c$i"): _*)
    val cells = rn.schema.fields.map(renderCol).toSeq
    // the interval suite's expected cells canonicalize through
    // canonInterval; STRING results (CAST(interval AS VARCHAR)) must
    // take the same path so "+2:03" and "dt:7380000000" compare equal
    val canon =
      if (!intervalMode) cells
      else {
        val u = udf((x: String) =>
          if (x == null) null else canonCell(x, interval = true))
        cells.map(u(_))
      }
    rn.select(concat_ws("|", canon: _*).as("r"))
  }

  /** Render one column to its canonical Postgres-.out cell string. */
  private[graft] def renderCol(f: StructField): Column = {
    val c = col(f.name)
    val rendered = f.dataType match {
      case BooleanType => when(c, "t").otherwise("f")
      // the corpus renders binary as bare lowercase hex (TableParser)
      case BinaryType => lower(hex(c))
      // canonical ISO forms — expected cells canonicalize to the same
      // (see canonCell; the corpus mixes rendering conventions)
      case DateType => date_format(c, "yyyy-MM-dd")
      case TimestampType | TimestampNTZType =>
        val frac = regexp_replace(
          regexp_replace(date_format(c, ".SSSSSS"), "0+$", ""),
          "^\\.$", "")
        // negative (BC) years render unsigned like the corpus (its
        // datestyle prints "0097 BC"; canonCell keeps only the digits)
        concat(regexp_replace(
          date_format(c, "yyyy-MM-dd HH:mm:ss"), "^-", ""), frac)
      case DoubleType | FloatType =>
        // Postgres float output: plain below 1e15 (integral values
        // without the .0), lowercase e+NN scientific above — Java's
        // repr maps onto it ("4.0E15" → "4e+15"); the heavily
        // format-sensitive float4/float8 suites are not ported
        val sci = regexp_replace(regexp_replace(
          c.cast(StringType), "\\.0E", "E"), "E(-?)", "e+$1")
        when(c === floor(c) && abs(c) < 1e15,
          c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .cast(StringType))
          .otherwise(regexp_replace(
            regexp_replace(sci, "e\\+-", "e-"), "\\.0$", ""))
      case StringType =>
        // the corpus renders an embedded NUL as the 2-char "\0"
        regexp_replace(c, "\u0000", "\\\\0")
      case ArrayType(_, _) =>
        // the corpus renders arrays "{ a, b, }" (leading space, comma-
        // joined, NULL spelled out)
        when(size(c) === 0, "{}").otherwise(concat(lit("{ "),
          array_join(transform(c, e => e.cast(StringType)), ", ",
            "NULL"), lit("}")))
      case _: DecimalType =>
        // Postgres trims trailing fractional zeros
        regexp_replace(regexp_replace(
          c.cast(StringType), "(\\.\\d*?)0+$", "$1"), "\\.$", "")
      case t if t.typeName == "time" || t.typeName.startsWith("time(") =>
        regexp_replace(regexp_replace(
          c.cast(StringType), "(\\.\\d*?)0+$", "$1"), "\\.$", "")
      case ym: YearMonthIntervalType =>
        // canonical exact total (months): Spark casts an interval to a
        // number in its END-field unit exactly
        val n = c.cast("long")
        concat(lit("ym:"),
          (if (ym.endField == YearMonthIntervalType.YEAR) n * 12 else n)
            .cast(StringType))
      case dt: DayTimeIntervalType =>
        // total micros via the end-field-unit numeric cast (the
        // DECIMAL form keeps the fractional seconds)
        val totalMicros = dt.endField match {
          case DayTimeIntervalType.DAY => c.cast("long") * 86400000000L
          case DayTimeIntervalType.HOUR => c.cast("long") * 3600000000L
          case DayTimeIntervalType.MINUTE => c.cast("long") * 60000000L
          case _ =>
            (c.cast(DecimalType(38, 6)) * 1000000).cast("long")
        }
        concat(lit("dt:"), totalMicros.cast(StringType))
      case _ => c.cast(StringType)
    }
    when(c.isNull, NullMarker).otherwise(
      when(trim(rendered).isin("", "null", "NULL"), NullMarker)
        .when(trim(rendered) === "-0", "0") // mirrors canonCell
        .otherwise(trim(rendered)))
  }

  /** Run every (non-skipped) test of a suite; returns (tid, r) rendered
    * actual rows — the graded-row relation.
    */
  def runSuite(spark: SparkSession, suite: Suite,
      skip: Set[String]): DataFrame = {
    val parts = suite.tests.filterNot(t => skip(t.id)).map { t =>
      renderedRows(runQuery(spark, t.query), suite.name == "interval")
        .select(lit(t.id).as("tid"), col("r"))
    }
    parts.reduce(_ unionAll _)
  }

  /** The corpus-recorded expected rows of a suite as literal SQL —
    * the driver's DuckDB "oracle" for the graded rows.
    */
  def expectedSql(suite: Suite, skip: Set[String]): String = {
    val rows = for {
      t <- suite.tests if !skip(t.id)
      row <- if (t.expected.isEmpty) Seq.empty else t.expected
    } yield s"('${t.id}', '${row.mkString("|").replace("'", "''")}')"
    require(rows.nonEmpty, s"suite ${suite.name}: no expected rows")
    s"SELECT tid, r FROM (VALUES ${rows.mkString(", ")}) AS t(tid, r)"
  }

  /** Expected rows as in-memory pairs (for the ScalaTest harness). */
  def expectedRows(suite: Suite, skip: Set[String]): Seq[(String, String)] =
    for {
      t <- suite.tests if !skip(t.id)
      row <- t.expected
    } yield (t.id, row.mkString("|"))

  // ------------------------------------------------- graded surface

  /** Per-suite skip lists: corpus tests exercising features with no
    * equivalent here, each with its reason. Kept small and explicit —
    * every skip is a documented divergence, not a silent drop.
    */
  val skips: Map[String, Set[String]] = Map(
    // a double-quoted alias containing parens/commas ("NULLIF(a.i,b.i)")
    // — Dialect's quoted-identifier map rejects such identifiers loudly
    // by design (they would derail the statement scanners)
    "case" -> Set("testCases2#10"),
    // BIT_AND(binary): SQL has no type-directed overload dispatch over
    // Spark's integral-only builtin; the binary forms are the explicit
    // bit_and_binary/bit_or_binary/bit_xor_binary spellings
    // (FunctionsSpec covers them on this exact fixture)
    "aggregates" -> Set("testBitAggs#1"),
    // FLOAT4 rendering: Postgres prints the true shortest round-trip
    // decimal ("4.56789e+15"); the JVM's Float.toString is not
    // shortest ("4.5678899E15") — same float value, formatting-only
    "int8" -> Set("testSelect#51"),
    // error-contract units: the corpus records these as raising (zero
    // output rows); this engine follows string.md's documented
    // behavior instead — negative count/repeat yield '' (the docs and
    // the reference's own test disagree here)
    "strings" -> Set("testNegativeSubstringLength#0",
      "testNegativeSubstringLength#1", "testRepeat#1"),
    // Spark's TimeType is MICROsecond precision; these two units need
    // the reference's nanosecond TIME payload
    "time" -> Set("testConstants#1", "testUnits#2"),
    // decimal-domain transcendentals (exp/ln/log10 over NUMERIC): the
    // reference computes in decimal, we in binary double — last-ulp
    // differences on two units
    "numeric" -> Set("testExp#2", "testLog#0"),
    // interval edges with no Spark equivalent: interval-to-interval
    // casts keep the underlying VALUE in Calcite (Spark truncates to
    // the target span); CAST(interval AS VARCHAR) renders Calcite's
    // +Y-M form; EXTRACT over intervals outside Spark's span rules;
    // DECADE/CENTURY over intervals divide truncating (no date era)
    "interval" -> Set(
      // interval-to-interval casts keep the underlying VALUE in
      // Calcite (Spark truncates to the target span)
      "testCast#0", "doubleCastTest#0", "doubleCastTest#1",
      "doubleCastTest#2", "testCastToInterval#1", "testCastToInterval#2",
      // EXTRACT over intervals outside Spark's span rules; DECADE/
      // CENTURY over intervals divide truncating (no date era)
      "checkExtract#0", "checkExtract#1", "testLongExtract#2",
      "testLongExtract#5")
  ).withDefaultValue(Set.empty)

  def gradedSuites: Seq[String] = Seq("window", "case", "limit", "bool",
    "groupingsets", "aggregates", "int4", "int8", "strings", "date",
    "timestamp", "time", "numeric", "interval", "asof", "array")

  def queries: Seq[Q] =
    gradedSuites.map { name =>
      val suite = load(name)
      Q(s"pgr_$name", expectedSql(suite, skips(name))) { (s, _) =>
        registerSetup(s, suite)
        runSuite(s, suite, skips(name))
      }
    }
}
