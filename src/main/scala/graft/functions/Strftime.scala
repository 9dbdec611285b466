package graft.functions

import java.time.{LocalDate, LocalDateTime, LocalTime}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField

/** chrono/strftime `%`-directive patterns for the reference's
  * FORMAT_DATE/FORMAT_TIMESTAMP/FORMAT_TIME and PARSE_DATE/
  * PARSE_TIMESTAMP/PARSE_TIME surface (datetime.md:460-560 — the
  * format-specifier table; runtime `sqllib/src/timestamp.rs` formats via
  * Rust chrono). The translator builds a java.time formatter from the
  * common directive set; an UNSUPPORTED directive raises (the reference
  * likewise raises on directives it cannot satisfy, e.g. `%I` without
  * `%p` — datetime.md:480-485). Formatters are cached per pattern
  * (thread-safe, formatters are immutable).
  */
object Strftime {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DateTimeFormatter]()

  /** chrono directive → java.time pattern fragment (appendPattern). */
  private def javaPattern(directive: Char): String = directive match {
    case 'Y' => "uuuu"
    case 'y' => "uu"
    case 'm' => "MM"
    case 'b' | 'h' => "MMM"
    case 'B' => "MMMM"
    case 'd' => "dd"
    case 'e' => "d"
    case 'a' => "EEE"
    case 'A' => "EEEE"
    case 'j' => "DDD"
    case 'H' => "HH"
    case 'k' => "H"
    case 'I' => "hh"
    case 'l' => "h"
    case 'p' => "a"
    case 'M' => "mm"
    case 'S' => "ss"
    case 'F' => "uuuu-MM-dd"
    case 'T' => "HH:mm:ss"
    case 'R' => "HH:mm"
    case 'D' => "MM/dd/uu"
    case 'G' => "YYYY"
    case 'V' => "ww"
    case 'u' => "e"
    case other => throw new IllegalArgumentException(
      s"unsupported strftime directive %$other (datetime.md format table)")
  }

  def formatter(fmt: String): DateTimeFormatter =
    cache.computeIfAbsent(fmt, { f =>
      val b = new DateTimeFormatterBuilder()
      var i = 0
      while (i < f.length) {
        val c = f.charAt(i)
        if (c == '%') {
          require(i + 1 < f.length, s"dangling %% at end of pattern: $f")
          f.charAt(i + 1) match {
            case '%' => b.appendLiteral('%'); i += 2
            case 'f' => // fractional seconds, full nanos, no dot
              b.appendFraction(ChronoField.NANO_OF_SECOND, 9, 9, false)
              i += 2
            case d @ ('3' | '6' | '9') if i + 2 < f.length &&
                f.charAt(i + 2) == 'f' =>
              val w = d - '0'
              b.appendFraction(ChronoField.NANO_OF_SECOND, w, w, false)
              i += 3
            case d => b.appendPattern(javaPattern(d)); i += 2
          }
        } else { b.appendLiteral(c); i += 1 }
      }
      b.toFormatter(java.util.Locale.US)
    })

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

  def parseDate(fmt: String, s: String): String = {
    if (fmt == null || s == null) return null
    LocalDate.parse(s, formatter(fmt)).toString
  }

  def parseTimestamp(fmt: String, s: String): String = {
    if (fmt == null || s == null) return null
    val f = formatter(fmt)
    // a pattern without time fields parses to midnight (the reference:
    // missing elements default — PARSE_TIMESTAMP('%Y-%m-%d', …) works)
    val parsed = f.parse(s)
    val date =
      if (parsed.isSupported(ChronoField.EPOCH_DAY))
        LocalDate.from(parsed)
      else LocalDate.of(1970, 1, 1)
    val time =
      if (parsed.isSupported(ChronoField.HOUR_OF_DAY) ||
        parsed.isSupported(ChronoField.MINUTE_OF_HOUR))
        LocalTime.of(
          if (parsed.isSupported(ChronoField.HOUR_OF_DAY))
            parsed.get(ChronoField.HOUR_OF_DAY) else 0,
          if (parsed.isSupported(ChronoField.MINUTE_OF_HOUR))
            parsed.get(ChronoField.MINUTE_OF_HOUR) else 0,
          if (parsed.isSupported(ChronoField.SECOND_OF_MINUTE))
            parsed.get(ChronoField.SECOND_OF_MINUTE) else 0,
          if (parsed.isSupported(ChronoField.NANO_OF_SECOND))
            parsed.get(ChronoField.NANO_OF_SECOND) else 0)
      else LocalTime.MIDNIGHT
    LocalDateTime.of(date, time)
      .format(DateTimeFormatter.ofPattern("uuuu-MM-dd HH:mm:ss.SSSSSS"))
  }

  def parseTime(fmt: String, s: String): String = {
    if (fmt == null || s == null) return null
    LocalTime.parse(s, formatter(fmt))
      .format(DateTimeFormatter.ofPattern("HH:mm:ss.SSSSSS"))
  }
}
