package org.apache.spark.sql.graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DateType, TimestampNTZType, TimestampType}

/** The reference's `DATE_TRUNC(x, unit)` (datetime.md:57 — bare-keyword
  * unit, units MILLENNIUM..DAY for dates and down to SECOND for
  * timestamps, result type = INPUT type). Spark's native
  * `date_trunc('unit', ts)` always returns TIMESTAMP and lacks the
  * MILLENNIUM/CENTURY/DECADE units (Postgres rules: millennium 1970 →
  * 1001-01-01, century → 1901-01-01, decade → floor(y/10)*10), so the
  * Dialect lowers the reference spelling onto this expression.
  * Timestamps truncate on their UTC wall clock — every session this
  * library manages pins spark.sql.session.timeZone=UTC.
  */
case class GraftDateTrunc(child: Expression, unit: String,
    ceil: Boolean = false, floorMode: Boolean = false)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def prettyName: String =
    if (ceil) "graft_date_ceil" else "graft_date_trunc"

  /** Advance one unit — used by the CEIL form (datetime.md date_ceil:
    * the smallest unit boundary ≥ the input).
    */
  private def plusUnit(d: LocalDate): LocalDate = unit match {
    case "MILLENNIUM" => d.plusYears(1000)
    case "CENTURY" => d.plusYears(100)
    case "DECADE" => d.plusYears(10)
    case "YEAR" => d.plusYears(1)
    case "QUARTER" => d.plusMonths(3)
    case "MONTH" => d.plusMonths(1)
    case "WEEK" => d.plusDays(7)
    case "DAY" => d.plusDays(1)
    case other => throw new IllegalArgumentException(
      s"CEIL unit not valid for dates: $other")
  }

  private def truncDate(d: LocalDate): LocalDate = unit match {
    // FLOOR/CEIL(x TO CENTURY|MILLENNIUM) use the calendar-zero base
    // (y/100*100 — timestamp.rs:2436,2419) while DATE_TRUNC keeps the
    // Postgres century-number base ((c-1)*100+1 — timestamp.rs:3259)
    case "MILLENNIUM" if floorMode =>
      LocalDate.of(d.getYear / 1000 * 1000, 1, 1)
    case "CENTURY" if floorMode =>
      LocalDate.of(d.getYear / 100 * 100, 1, 1)
    case "MILLENNIUM" =>
      LocalDate.of((d.getYear - 1) / 1000 * 1000 + 1, 1, 1)
    case "CENTURY" => LocalDate.of((d.getYear - 1) / 100 * 100 + 1, 1, 1)
    case "DECADE" =>
      LocalDate.of(Math.floorDiv(d.getYear, 10) * 10, 1, 1)
    case "YEAR" => d.withDayOfYear(1)
    case "QUARTER" =>
      LocalDate.of(d.getYear, (d.getMonthValue - 1) / 3 * 3 + 1, 1)
    case "MONTH" => d.withDayOfMonth(1)
    // week starts SUNDAY, matching the reference's DOW (Sunday = 1)
    case "WEEK" => d.minusDays(d.getDayOfWeek.getValue % 7L)
    case "DAY" => d
    case other => throw new IllegalArgumentException(
      s"DATE_TRUNC unit not valid for dates: $other")
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case DateType =>
      val d = LocalDate.ofEpochDay(input.asInstanceOf[Int].toLong)
      val t = truncDate(d)
      (if (ceil && t != d) plusUnit(t) else t).toEpochDay.toInt
    case TimestampType | TimestampNTZType =>
      val micros = input.asInstanceOf[Long]
      val dayMicros = 86400000000L
      val day = Math.floorDiv(micros, dayMicros)
      val inDay = Math.floorMod(micros, dayMicros)
      def subDay(u: Long): Long = {
        val t = day * dayMicros + inDay / u * u
        if (ceil && t != micros) t + u else t
      }
      unit match {
        case "HOUR" => subDay(3600000000L)
        case "MINUTE" => subDay(60000000L)
        case "SECOND" => subDay(1000000L)
        case "MILLISECOND" => subDay(1000L)
        case "DAY" => subDay(dayMicros)
        case _ =>
          val d = LocalDate.ofEpochDay(day)
          val t = truncDate(d)
          val tm = t.toEpochDay * dayMicros
          if (ceil && tm != micros) plusUnit(t).toEpochDay * dayMicros
          else tm
      }
    case t if t.typeName.startsWith("time(") || t.typeName == "time" =>
      // TIME_TRUNC / FLOOR/CEIL(time TO unit): nanos-of-day payload
      val nanos = input.asInstanceOf[Long]
      val div = unit match {
        case "HOUR" => 3600000000000L
        case "MINUTE" => 60000000000L
        case "SECOND" => 1000000000L
        case "MILLISECOND" => 1000000L
        case other => throw new IllegalArgumentException(
          s"TIME_TRUNC unit not valid: $other")
      }
      val down = nanos / div * div
      // CEIL wraps past midnight (timestamp.rs ceil_hour_Time:
      // `(hour + 1) % 24` — CEIL(TIME '23:30:00' TO HOUR) = 00:00:00),
      // keeping the payload inside the 0..86399999999999 domain
      if (ceil && down != nanos) (down + div) % 86400000000000L else down
    case other => throw new IllegalArgumentException(
      s"DATE_TRUNC over ${other.catalogString}")
  }

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

object DateTruncExpr {
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    def unitOf(e: Expression): String = e match {
      case org.apache.spark.sql.catalyst.expressions
        .Literal(u: org.apache.spark.unsafe.types.UTF8String, _) =>
        u.toString.toUpperCase
      case other => throw new IllegalArgumentException(
        s"graft_date_trunc/ceil needs a literal unit, got $other")
    }
    reg.createOrReplaceTempFunction("graft_date_trunc",
      (args: Seq[Expression]) =>
        GraftDateTrunc(args.head, unitOf(args(1))), "built-in")
    reg.createOrReplaceTempFunction("graft_date_ceil",
      (args: Seq[Expression]) =>
        GraftDateTrunc(args.head, unitOf(args(1)), ceil = true),
      "built-in")
    // FLOOR/CEIL(x TO unit) — calendar-zero century/millennium bases
    reg.createOrReplaceTempFunction("graft_date_floor_to",
      (args: Seq[Expression]) =>
        GraftDateTrunc(args.head, unitOf(args(1)), floorMode = true),
      "built-in")
    reg.createOrReplaceTempFunction("graft_date_ceil_to",
      (args: Seq[Expression]) =>
        GraftDateTrunc(args.head, unitOf(args(1)), ceil = true,
          floorMode = true),
      "built-in")
  }
}
