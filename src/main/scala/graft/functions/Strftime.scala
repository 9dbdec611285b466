package graft.functions

import java.time.{LocalDate, LocalDateTime, LocalTime}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.{ChronoField, IsoFields}

/** chrono/strftime `%`-directive patterns for the reference's
  * FORMAT_DATE/FORMAT_TIMESTAMP/FORMAT_TIME and PARSE_DATE/
  * PARSE_TIMESTAMP/PARSE_TIME surface (datetime.md:460-560 — the
  * format-specifier table; runtime `sqllib/src/timestamp.rs` formats via
  * Rust chrono). The translator builds a java.time formatter from the
  * common directive set; an UNSUPPORTED directive raises, a parse whose
  * directives cannot resolve the needed fields raises, and a string that
  * simply fails to match the format yields NULL (the reference's
  * contract — datetime.md:475-485, e.g. `%I` without `%p` errors while
  * `PARSE_DATE('%Y-%m-%d', 'junk')` is NULL).
  * Week-related directives (%V/%G/%u) use the ISO-8601 fields
  * explicitly — the pattern letters ww/YYYY/e would resolve through
  * the US locale's Sunday-start week numbering. Formatters are cached
  * per pattern (thread-safe, formatters are immutable).
  */
object Strftime {

  /** Translated pattern + which field families its directives carry
    * (drives parse resolution: a pattern with time directives that
    * cannot build a LocalTime must raise, not default to midnight).
    */
  private final case class Pat(fmt: DateTimeFormatter,
      hasDate: Boolean, hasTime: Boolean) {
    /** chrono parses case-insensitively ('07:30:00 am' matches %p) and
      * with flexible numeric widths ('2:23:38' matches %I:%M:%S);
      * java.time is strict. Strict parse runs first — the lenient
      * wrapper is the fallback, so digit-adjacent patterns (%Y%m%d)
      * keep their fixed-width reading.
      */
    lazy val lenient: DateTimeFormatter =
      new DateTimeFormatterBuilder().parseCaseInsensitive()
        .parseLenient().append(fmt).toFormatter(java.util.Locale.US)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Pat]()

  private val dateDirectives = "YymbhBdeaAjFDGVuxcCgUWw".toSet
  private val timeDirectives = "HkIlpMSTRfXc".toSet

  /** chrono directive → java.time pattern fragment (appendPattern).
    * Directives with no exact pattern-letter equivalent (%y's 1969-based
    * two-digit years, the space-padded %e/%k/%l) are special-cased in
    * [[pat]] with explicit builder calls instead.
    */
  private def javaPattern(directive: Char): String = directive match {
    case 'Y' => "uuuu"
    case 'm' => "MM"
    case 'b' | 'h' => "MMM"
    case 'B' => "MMMM"
    case 'd' => "dd"
    case 'a' => "EEE"
    case 'A' => "EEEE"
    case 'j' => "DDD"
    case 'H' => "HH"
    case 'I' => "hh"
    case 'p' => "a"
    case 'M' => "mm"
    case 'S' => "ss"
    case 'F' => "uuuu-MM-dd"
    case 'T' => "HH:mm:ss"
    case 'R' => "HH:mm"
    case 'X' => "HH:mm:ss" // chrono %X: C-locale time representation
    case other => throw new IllegalArgumentException(
      s"unsupported strftime directive %$other (datetime.md format table)")
  }

  /** chrono's %y: prints year mod 100 (ALL years — 1901 prints "01"),
    * parses 69-99 as 1969-1999 and 00-68 as 2000-2068 (the strftime
    * pivot — java's 'uu' would resolve '85' to 2085, and a reduced-
    * value field would print the FULL year outside its 100-year
    * window). One custom field serves both directions.
    */
  private object YearMod100 extends java.time.temporal.TemporalField {
    import java.time.temporal._
    override def getBaseUnit: TemporalUnit = ChronoUnit.YEARS
    override def getRangeUnit: TemporalUnit = ChronoUnit.CENTURIES
    override def range: ValueRange = ValueRange.of(0, 99)
    override def isDateBased: Boolean = true
    override def isTimeBased: Boolean = false
    override def isSupportedBy(t: TemporalAccessor): Boolean =
      t.isSupported(ChronoField.YEAR)
    override def rangeRefinedBy(t: TemporalAccessor): ValueRange = range
    override def getFrom(t: TemporalAccessor): Long =
      Math.floorMod(t.getLong(ChronoField.YEAR), 100L)
    override def adjustInto[R <: Temporal](t: R, v: Long): R = {
      val cur = Math.floorMod(t.getLong(ChronoField.YEAR), 100L)
      t.plus(v - cur, ChronoUnit.YEARS).asInstanceOf[R]
    }
    override def resolve(
        fieldValues: java.util.Map[TemporalField, java.lang.Long],
        partialTemporal: TemporalAccessor,
        resolverStyle: java.time.format.ResolverStyle): TemporalAccessor = {
      val v = fieldValues.remove(this).longValue
      val year = if (v >= 69) 1900 + v else 2000 + v
      fieldValues.put(ChronoField.YEAR, java.lang.Long.valueOf(year))
      null
    }
    override def toString: String = "YearMod100[pivot1969]"
  }

  private def appendTwoDigitYear(b: DateTimeFormatterBuilder): Unit =
    b.appendValue(YearMod100, 2)

  /** chrono's %g: ISO week-based year mod 100 (print side; parse
    * resolves with the 1969 pivot like %y).
    */
  private object WeekYearMod100 extends java.time.temporal.TemporalField {
    import java.time.temporal._
    override def getBaseUnit: TemporalUnit = ChronoUnit.YEARS
    override def getRangeUnit: TemporalUnit = ChronoUnit.CENTURIES
    override def range: ValueRange = ValueRange.of(0, 99)
    override def isDateBased: Boolean = true
    override def isTimeBased: Boolean = false
    override def isSupportedBy(t: TemporalAccessor): Boolean =
      t.isSupported(ChronoField.YEAR)
    override def rangeRefinedBy(t: TemporalAccessor): ValueRange = range
    override def getFrom(t: TemporalAccessor): Long =
      Math.floorMod(t.getLong(IsoFields.WEEK_BASED_YEAR), 100L)
    override def adjustInto[R <: Temporal](t: R, v: Long): R =
      throw new UnsupportedTemporalTypeException("%g adjust")
    override def resolve(
        fieldValues: java.util.Map[TemporalField, java.lang.Long],
        partialTemporal: TemporalAccessor,
        resolverStyle: java.time.format.ResolverStyle): TemporalAccessor = {
      val v = fieldValues.remove(this).longValue
      fieldValues.put(IsoFields.WEEK_BASED_YEAR,
        java.lang.Long.valueOf(if (v >= 69) 1900 + v else 2000 + v))
      null
    }
    override def toString: String = "WeekYearMod100"
  }

  /** chrono's %w: day of week with Sunday = 0 .. Saturday = 6. */
  private object DowSunZero extends java.time.temporal.TemporalField {
    import java.time.temporal._
    override def getBaseUnit: TemporalUnit = ChronoUnit.DAYS
    override def getRangeUnit: TemporalUnit = ChronoUnit.WEEKS
    override def range: ValueRange = ValueRange.of(0, 6)
    override def isDateBased: Boolean = true
    override def isTimeBased: Boolean = false
    override def isSupportedBy(t: TemporalAccessor): Boolean =
      t.isSupported(ChronoField.DAY_OF_WEEK)
    override def rangeRefinedBy(t: TemporalAccessor): ValueRange = range
    override def getFrom(t: TemporalAccessor): Long =
      t.getLong(ChronoField.DAY_OF_WEEK) % 7L
    override def adjustInto[R <: Temporal](t: R, v: Long): R = {
      val cur = t.getLong(ChronoField.DAY_OF_WEEK) % 7L
      t.plus(v - cur, ChronoUnit.DAYS).asInstanceOf[R]
    }
    override def resolve(
        fieldValues: java.util.Map[TemporalField, java.lang.Long],
        partialTemporal: TemporalAccessor,
        resolverStyle: java.time.format.ResolverStyle): TemporalAccessor = {
      val v = fieldValues.remove(this).longValue
      fieldValues.put(ChronoField.DAY_OF_WEEK,
        java.lang.Long.valueOf(if (v == 0) 7 else v))
      null
    }
    override def toString: String = "DowSunZero"
  }

  /** chrono's %C: floor(year/100), two digits. Print-oriented; a parse
    * resolves to year C*100 (chrono pairs it with %y for exact years —
    * unsupported combination here, the corpus only formats it).
    */
  private object YearDiv100 extends java.time.temporal.TemporalField {
    import java.time.temporal._
    override def getBaseUnit: TemporalUnit = ChronoUnit.CENTURIES
    override def getRangeUnit: TemporalUnit = ChronoUnit.FOREVER
    override def range: ValueRange = ValueRange.of(0, 99)
    override def isDateBased: Boolean = true
    override def isTimeBased: Boolean = false
    override def isSupportedBy(t: TemporalAccessor): Boolean =
      t.isSupported(ChronoField.YEAR)
    override def rangeRefinedBy(t: TemporalAccessor): ValueRange = range
    override def getFrom(t: TemporalAccessor): Long =
      Math.floorDiv(t.getLong(ChronoField.YEAR), 100L)
    override def adjustInto[R <: Temporal](t: R, v: Long): R = {
      val cur = Math.floorDiv(t.getLong(ChronoField.YEAR), 100L)
      t.plus((v - cur) * 100, ChronoUnit.YEARS).asInstanceOf[R]
    }
    override def resolve(
        fieldValues: java.util.Map[TemporalField, java.lang.Long],
        partialTemporal: TemporalAccessor,
        resolverStyle: java.time.format.ResolverStyle): TemporalAccessor = {
      val v = fieldValues.remove(this).longValue
      fieldValues.put(ChronoField.YEAR, java.lang.Long.valueOf(v * 100))
      null
    }
    override def toString: String = "YearDiv100"
  }

  private def pat(fmt: String): Pat =
    cache.computeIfAbsent(fmt, { f =>
      val b = new DateTimeFormatterBuilder()
      var hasDate = false
      var hasTime = false
      var i = 0
      while (i < f.length) {
        val c = f.charAt(i)
        if (c == '%') {
          require(i + 1 < f.length, s"dangling %% at end of pattern: $f")
          f.charAt(i + 1) match {
            case '%' => b.appendLiteral('%'); i += 2
            case 'f' => // fractional seconds, full nanos, no dot
              b.appendFraction(ChronoField.NANO_OF_SECOND, 9, 9, false)
              hasTime = true; i += 2
            case d @ ('3' | '6' | '9') if i + 2 < f.length &&
                f.charAt(i + 2) == 'f' =>
              val w = d - '0'
              b.appendFraction(ChronoField.NANO_OF_SECOND, w, w, false)
              hasTime = true; i += 3
            // ISO-8601 week directives — explicit fields, never the
            // locale-week pattern letters
            case 'V' =>
              b.appendValue(IsoFields.WEEK_OF_WEEK_BASED_YEAR, 2)
              hasDate = true; i += 2
            case 'G' =>
              b.appendValue(IsoFields.WEEK_BASED_YEAR, 4)
              hasDate = true; i += 2
            case 'u' => // ISO day-of-week, Monday=1
              b.appendValue(ChronoField.DAY_OF_WEEK, 1)
              hasDate = true; i += 2
            case 'y' =>
              appendTwoDigitYear(b); hasDate = true; i += 2
            case 'D' | 'x' => // %m/%d/%y, with the %y pivot (chrono's
              // %x is the C-locale date representation = %D)
              b.appendPattern("MM/dd/")
              appendTwoDigitYear(b); hasDate = true; i += 2
            case 'c' => // C-locale date+time: %a %b %e %T %Y
              b.appendPattern("EEE MMM ")
              b.padNext(2, ' ').appendValue(ChronoField.DAY_OF_MONTH)
              b.appendPattern(" HH:mm:ss ")
              b.appendValue(ChronoField.YEAR, 4)
              hasDate = true; hasTime = true; i += 2
            case 'C' => // century (floor(year/100)), print-oriented
              b.appendValue(YearDiv100, 2); hasDate = true; i += 2
            case 'g' => // ISO week-based year mod 100
              b.appendValue(WeekYearMod100, 2); hasDate = true; i += 2
            case 'U' => // week of year, Sunday-started, 00-53
              b.appendValue(java.time.temporal.WeekFields
                .of(java.time.DayOfWeek.SUNDAY, 7).weekOfYear(), 2)
              hasDate = true; i += 2
            case 'W' => // week of year, Monday-started, 00-53
              b.appendValue(java.time.temporal.WeekFields
                .of(java.time.DayOfWeek.MONDAY, 7).weekOfYear(), 2)
              hasDate = true; i += 2
            case 'w' => // day of week, Sunday = 0
              b.appendValue(DowSunZero, 1); hasDate = true; i += 2
            case 't' => b.appendLiteral('\t'); i += 2
            case 'n' => b.appendLiteral('\n'); i += 2
            // space-padded fields ("Same as %d/%H/%I but space-padded")
            case 'e' =>
              b.padNext(2, ' ').appendValue(ChronoField.DAY_OF_MONTH)
              hasDate = true; i += 2
            case 'k' =>
              b.padNext(2, ' ').appendValue(ChronoField.HOUR_OF_DAY)
              hasTime = true; i += 2
            case 'l' =>
              b.padNext(2, ' ').appendValue(ChronoField.CLOCK_HOUR_OF_AMPM)
              hasTime = true; i += 2
            case d =>
              b.appendPattern(javaPattern(d))
              if (dateDirectives(d)) hasDate = true
              if (timeDirectives(d)) hasTime = true
              i += 2
          }
        } else { b.appendLiteral(c); i += 1 }
      }
      Pat(b.toFormatter(java.util.Locale.US), hasDate, hasTime)
    })

  def formatter(fmt: String): DateTimeFormatter = pat(fmt).fmt

  /** Format an ISO-rendered date/timestamp/time value (the SQL wrappers
    * pass `CAST(x AS STRING)`, so this sees `yyyy-MM-dd`,
    * `yyyy-MM-dd HH:mm:ss[.f]`, or `HH:mm[:ss[.f]]`).
    */
  def format(fmt: String, iso: String): String = {
    if (fmt == null || iso == null) return null
    val t = iso.trim
    val accessor: java.time.temporal.TemporalAccessor =
      if (t.contains(' ') || t.contains('T'))
        LocalDateTime.parse(t.replace(' ', 'T'))
      else if (t.contains('-')) LocalDate.parse(t)
      else LocalTime.parse(t)
    formatter(fmt).format(accessor)
  }

  /** PARSE_* failure contract (datetime.md:475-485): a string that does
    * not match the format yields NULL; only a format incapable of
    * producing the required type (e.g. `%I` without `%p`) is a runtime
    * error. Text mismatches surface as DateTimeParseException from
    * `DateTimeFormatter.parse` → null here; the later
    * `LocalDate.from`/`LocalTime.from` resolution failures (missing
    * field families) throw plain DateTimeException and keep raising.
    */
  private def tryParse(fmt: DateTimeFormatter,
      s: String): java.time.temporal.TemporalAccessor =
    try fmt.parse(s)
    catch { case _: java.time.format.DateTimeParseException => null }

  /** chrono's parse treats pattern whitespace as "any run of
    * whitespace, including none" (PARSE_DATE(' %F ', '  2000-12-30  ')
    * parses); java.time matches literals exactly. Both sides
    * normalize: trim + collapse runs to one space. Parse-only — the
    * FORMAT direction prints pattern whitespace verbatim.
    */
  private def wsNorm(x: String): String = {
    // fast path: already normalized (no edge/run/odd whitespace) —
    // this runs per parsed ROW, the regex only on the rare shapes
    val n = x.length
    var needs = n > 0 &&
      (Character.isWhitespace(x.charAt(0)) ||
        Character.isWhitespace(x.charAt(n - 1)))
    var i = 0
    var prevWs = false
    while (!needs && i < n) {
      val c = x.charAt(i)
      val ws = Character.isWhitespace(c)
      if (ws && (prevWs || c != ' ')) needs = true
      prevWs = ws
      i += 1
    }
    if (!needs) x else x.trim.replaceAll("\\s+", " ")
  }

  def parseDate(fmt: String, s: String): String = {
    if (fmt == null || s == null) return null
    val p = pat(wsNorm(fmt))
    val t = wsNorm(s)
    val parsed = Option(tryParse(p.fmt, t))
      .getOrElse(tryParse(p.lenient, t))
    if (parsed == null) null else LocalDate.from(parsed).toString
  }

  def parseTimestamp(fmt: String, s: String): String = {
    if (fmt == null || s == null) return null
    val p = pat(wsNorm(fmt))
    val t = wsNorm(s)
    val parsed = Option(tryParse(p.fmt, t))
      .getOrElse(tryParse(p.lenient, t))
    if (parsed == null) return null
    // a pattern with date/time directives must RESOLVE them —
    // LocalDate.from / LocalTime.from raise on an incomplete set
    // (e.g. %I without %p), the reference's contract; a pattern
    // without them defaults (epoch date / midnight)
    val date =
      if (p.hasDate) LocalDate.from(parsed) else LocalDate.of(1970, 1, 1)
    val time =
      if (p.hasTime) LocalTime.from(parsed) else LocalTime.MIDNIGHT
    LocalDateTime.of(date, time)
      .format(DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS"))
  }

  def parseTime(fmt: String, s: String): String = {
    if (fmt == null || s == null) return null
    val p = pat(wsNorm(fmt))
    val t = wsNorm(s)
    val parsed = Option(tryParse(p.fmt, t))
      .getOrElse(tryParse(p.lenient, t))
    if (parsed == null) null
    else LocalTime.from(parsed)
      .format(DateTimeFormatter.ofPattern("HH:mm:ss.SSSSSS"))
  }
}
