package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, DateFormatClass, Expression, Literal, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Constant-pattern fast path for the strftime FORMAT_* family
  * (datetime.md:460-560): when the `%`-pattern is a LITERAL whose
  * directives all have exact Spark datetime-pattern equivalents, the
  * per-row `__strftime` Scala UDF is rewritten to native
  * `date_format` — codegen'd, null-safe, no serialization boundary.
  * Patterns with directives Spark's formatter cannot express
  * identically (ISO-week %V/%G/%u, space-padded %e/%k/%l, full
  * day-name %A — Spark caps E at EEE) keep the UDF, as do all PARSE_*
  * paths (the NULL-vs-raise contract needs custom resolution).
  *
  * Registered per-session via `spark.experimental.extraOptimizations`
  * (the non-invasive session hook for optimizer rules; an
  * SparkSessionExtensions injection would need builder-time setup the
  * embedding application may not control).
  */
object StrftimeFastPath extends Rule[LogicalPlan] {

  /** chrono directive → Spark datetime pattern fragment, for the
    * exactly-equivalent subset. Returns None for a pattern that must
    * stay on the UDF; otherwise (pattern, hasTimeDirectives) — a DATE
    * source with time directives keeps the UDF, which raises like the
    * reference (a LocalDate cannot produce an hour) where date_format
    * over a midnight cast would silently print zeros.
    */
  private[graft] def translate(fmt: String): Option[(String, Boolean)] = {
    var hasTime = false
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = {
      if (lit.nonEmpty) {
        val s = lit.toString
        // pattern letters and quotes in literal text need quoting;
        // a bare run of safe punctuation passes through
        if (s.exists(c => c.isLetter || c == '\'')) {
          out += '\''
          out ++= s.replace("'", "''")
          out += '\''
        } else out ++= s
        lit.clear()
      }
    }
    def dir(d: String): Boolean = { flushLit(); out ++= d; true }
    def tdir(d: String): Boolean = { hasTime = true; dir(d) }
    var i = 0
    var ok = true
    while (ok && i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        if (i + 1 >= fmt.length) ok = false
        else {
          val n = fmt.charAt(i + 1)
          val step = n match {
            case '%' => lit += '%'; true
            case 'Y' => dir("yyyy")
            // 'yy' prints year mod 100 — matches the UDF's FORMAT
            // direction. PARSE never takes this path: parsing '85' via
            // 'yy' would resolve 2085, not the UDF's 1969-pivot 1985
            // (Strftime.YearMod100) — do not "unify" them
            case 'y' => dir("yy")
            case 'm' => dir("MM")
            case 'b' | 'h' => dir("MMM")
            case 'B' => dir("MMMM")
            case 'd' => dir("dd")
            case 'a' => dir("EEE")
            case 'j' => dir("DDD")
            case 'H' => tdir("HH")
            case 'I' => tdir("hh")
            case 'p' => tdir("a")
            case 'M' => tdir("mm")
            case 'S' => tdir("ss")
            case 'F' => dir("yyyy-MM-dd")
            case 'T' => tdir("HH:mm:ss")
            case 'R' => tdir("HH:mm")
            case 'D' => dir("MM/dd/yy")
            case 'f' => tdir("SSSSSSSSS")
            case d @ ('3' | '6' | '9') if i + 2 < fmt.length &&
                fmt.charAt(i + 2) == 'f' =>
              i += 1; tdir("S" * (d - '0'))
            case _ => false // %V %G %u %e %k %l %A, unknown → UDF
          }
          if (step) i += 2 else ok = false
        }
      } else { lit += c; i += 1 }
    }
    if (!ok) None else { flushLit(); Some((out.toString, hasTime)) }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case u: ScalaUDF if u.udfName.contains("__strftime") =>
        u.children match {
          case Seq(Literal(fmt: UTF8String, StringType), inner) =>
            (strippedDatetime(inner), translate(fmt.toString)) match {
              case (Some(src), Some((sparkPat, hasTime)))
                  if !(hasTime && src.dataType == DateType) =>
                // the optimizer runs after ResolveTimeZone — set the
                // session zone explicitly on the new tz-aware nodes
                val tz = Some(conf.sessionLocalTimeZone)
                DateFormatClass(
                  if (src.dataType == TimestampType) src
                  else Cast(src, TimestampType, tz),
                  Literal(UTF8String.fromString(sparkPat), StringType),
                  tz)
              case _ => u
            }
          case _ => u
        }
    }

  /** The SQL-bodied wrappers pass `CAST(x AS STRING)`; recover x when
    * it is a date/timestamp (the types whose ISO rendering round-trips
    * through date_format exactly).
    */
  private def strippedDatetime(e: Expression): Option[Expression] =
    e match {
      case Cast(src, StringType, _, _) => src.dataType match {
        case DateType | TimestampType | TimestampNTZType => Some(src)
        case _ => None
      }
      case _ => None
    }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
