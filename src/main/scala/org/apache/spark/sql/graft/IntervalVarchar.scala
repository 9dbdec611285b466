package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DayTimeIntervalType, StringType, YearMonthIntervalType}
import org.apache.spark.unsafe.types.UTF8String

/** CAST(interval AS VARCHAR) with the reference's rendering
  * (casts.md; Calcite interval literal form): explicit sign, leading
  * component unpadded, inner components zero-padded, seconds with a
  * 6-digit fraction — `+1 02:03:04.500000`, `+1-10`, `-22`, `+2:03`.
  * Spark's own cast renders `INTERVAL '...' DAY TO SECOND`, which no
  * reference program expects. Substituted post-analysis (before
  * constant folding) wherever a cast targets STRING from an interval.
  */
case class GraftIntervalVarchar(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "interval_varchar"

  override def nullSafeEval(input: Any): Any = {
    val s = child.dataType match {
      case ym: YearMonthIntervalType =>
        val m = input.asInstanceOf[Int]
        val sign = if (m < 0) "-" else "+"
        val a = math.abs(m)
        (ym.startField, ym.endField) match {
          case (YearMonthIntervalType.YEAR, YearMonthIntervalType.YEAR) =>
            s"$sign${a / 12}"
          case (YearMonthIntervalType.MONTH,
            YearMonthIntervalType.MONTH) => s"$sign$a"
          case _ => f"$sign${a / 12}-${a % 12}%02d"
        }
      case dt: DayTimeIntervalType =>
        val us = input.asInstanceOf[Long]
        val sign = if (us < 0) "-" else "+"
        val a = math.abs(us)
        val d = a / 86400000000L
        val h = a / 3600000000L % 24
        val mi = a / 60000000L % 60
        val ss = a / 1000000L % 60
        val frac = a % 1000000L
        val sb = new StringBuilder(sign)
        import DayTimeIntervalType._
        dt.startField match {
          case DAY => sb.append(d)
          case HOUR => sb.append(a / 3600000000L)
          case MINUTE => sb.append(a / 60000000L)
          case _ => sb.append(a / 1000000L)
        }
        if (dt.startField < HOUR && dt.endField >= HOUR)
          sb.append(f" $h%02d")
        if (dt.startField < MINUTE && dt.endField >= MINUTE)
          sb.append(f":$mi%02d")
        if (dt.startField < SECOND && dt.endField >= SECOND)
          sb.append(f":$ss%02d")
        if (dt.endField >= SECOND) sb.append(f".$frac%06d")
        sb.toString
      case other => throw new IllegalArgumentException(
        s"interval_varchar over ${other.catalogString}")
    }
    UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** Interval-to-interval CAST keeps the underlying VALUE and changes
  * only the nominal span (Calcite/the reference — interval.md:
  * `CAST(INTERVAL 22 MONTHS AS INTERVAL YEARS)` still holds 22 months;
  * rendering then truncates to the span's fields, see
  * [[GraftIntervalVarchar]]). Spark's own interval cast truncates the
  * stored value to the target's end field.
  */
case class GraftIntervalCast(child: Expression, target: DataType)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = target
  override def prettyName: String = "graft_interval_cast"
  override def nullSafeEval(input: Any): Any = input
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** Interval ÷ number with Calcite's TRUNCATION toward zero (quidem
  * MiscTests intervalDivision: 15 months / 10 = 1 month, where Spark's
  * DivideYMInterval rounds half-up to 2). Works for both families —
  * months (Int) and micros (Long).
  */
case class GraftIntervalDivTrunc(interval: Expression, num: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def left: Expression = interval
  override def right: Expression = num
  override def dataType: DataType = interval.dataType
  override def prettyName: String = "graft_interval_div"

  private def toD(n: Any): Double = n match {
    case d: Double => d
    case f: Float => f.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case x: Number => x.doubleValue()
  }

  override def nullSafeEval(iv: Any, n: Any): Any = {
    // integral divisor: exact long division (Java `/` truncates toward
    // zero) — the double path loses ulps above 2^53 and Long.MIN/-1
    // must raise, not wrap
    GraftIntervalMulTrunc.asLongExact(n) match {
      case Some(l) =>
        if (l == 0)
          throw new ArithmeticException("Interval divided by zero")
        interval.dataType match {
          case _: YearMonthIntervalType =>
            val v = iv.asInstanceOf[Int]
            if (l == -1L) Math.negateExact(v) else (v / l).toInt
          case _ =>
            val v = iv.asInstanceOf[Long]
            if (l == -1L) Math.negateExact(v) else v / l
        }
      case None =>
        val d = toD(n)
        if (d == 0)
          throw new ArithmeticException("Interval divided by zero")
        interval.dataType match {
          case _: YearMonthIntervalType =>
            (iv.asInstanceOf[Int] / d).toInt
          case _ => (iv.asInstanceOf[Long] / d).toLong
        }
    }
  }

  override protected def withNewChildrenInternal(a: Expression,
      b: Expression) = copy(interval = a, num = b)
}

/** Interval × number with Calcite's TRUNCATION toward zero at the
  * storage unit (months / micros); Spark's Multiply[YM|DT]Interval
  * round half-up (MiscTests intervalTests: REAL 10/15 of a day is
  * …1716 µs).
  */
case class GraftIntervalMulTrunc(interval: Expression, num: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def left: Expression = interval
  override def right: Expression = num
  override def dataType: DataType = interval.dataType
  override def prettyName: String = "graft_interval_mul"

  private def toD(n: Any): Double = n match {
    case d: Double => d
    case f: Float => f.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case x: Number => x.doubleValue()
  }

  override def nullSafeEval(iv: Any, n: Any): Any =
    // integral multiplier: exact long arithmetic, raising on overflow
    // like Multiply[DT|YM]Interval (the double path loses ulps above
    // 2^53 and saturates via toLong); double only for fractional
    GraftIntervalMulTrunc.asLongExact(n) match {
      case Some(l) => interval.dataType match {
        case _: YearMonthIntervalType =>
          Math.toIntExact(
            Math.multiplyExact(iv.asInstanceOf[Int].toLong, l))
        case _ => Math.multiplyExact(iv.asInstanceOf[Long], l)
      }
      case None =>
        val d = toD(n)
        interval.dataType match {
          case _: YearMonthIntervalType =>
            (iv.asInstanceOf[Int] * d).toInt
          case _ => (iv.asInstanceOf[Long] * d).toLong
        }
    }

  override protected def withNewChildrenInternal(a: Expression,
      b: Expression) = copy(interval = a, num = b)
}

object GraftIntervalMulTrunc {
  /** The factor as an exact Long when it is integral-typed. */
  private[graft] def asLongExact(n: Any): Option[Long] = n match {
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case _ => None
  }
}

/** Raw interval total — months for year-month, microseconds for
  * day-time — independent of the nominal span (Spark's numeric cast
  * reads the END field, truncating a denormalized value). Harness-side
  * canonical rendering.
  */
case class GraftIntervalTotal(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_interval_total"
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case _: YearMonthIntervalType => input.asInstanceOf[Int].toLong
    case _: DayTimeIntervalType => input.asInstanceOf[Long]
    case other => throw new IllegalArgumentException(
      s"graft_interval_total over ${other.catalogString}")
  }
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}
