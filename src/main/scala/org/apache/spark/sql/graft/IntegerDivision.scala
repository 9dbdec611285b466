package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Cast, Divide, Expression, IntegralDivide}
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, IntegralType, LongType, ShortType}

/** Reference division semantics for the SQL path (integer.md:8-10,55-58;
  * Calcite): `/` over two INTEGRAL operands is integer division with the
  * operand-widening result type — `1/2 = 0`, `i32min / -1` overflows —
  * where Spark's `/` always promotes to DOUBLE (`1/2 = 0.5`).
  *
  * Applied to the ANALYZED plan of a dialect-path query: Spark's type
  * coercion has by then wrapped integral operands in un-tagged
  * `CAST(_ AS DOUBLE)`; a USER-spelled cast carries
  * `Cast.USER_SPECIFIED_CAST`, so `CAST(a AS DOUBLE) / b` — the
  * standard idiom for forcing fractional division — keeps Spark's
  * fractional semantics exactly like the reference. The DataFrame API
  * is untouched (Column `/` keeps Spark semantics; library code doing
  * ratio math stays fractional).
  */
object IntegerDivision {

  private def coercedIntegral(e: Expression): Option[Expression] = e match {
    case c @ Cast(child, DoubleType, _, _)
        if child.dataType.isInstanceOf[IntegralType] &&
          c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
      Some(child)
    case _ => None
  }

  /** Calcite's arithmetic result type: the wider integral operand. */
  private def wider(a: DataType, b: DataType): DataType = {
    def rank(t: DataType): Int = t match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 3
      case LongType => 4
      case _ => 4
    }
    if (rank(a) >= rank(b)) a else b
  }

  /** Plan-level form — the IVM delta deriver applies it to analyzed
    * view plans so incremental evaluation divides exactly like batch.
    * Also carries the reference's CAST(interval AS VARCHAR) rendering
    * ([[GraftIntervalVarchar]]) — both are "reference semantics the
    * analyzer can't express" rewrites that must run before folding.
    */
  def transformPlan(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case d @ Divide(l, r, mode) =>
        (coercedIntegral(l), coercedIntegral(r)) match {
          case (Some(a), Some(b)) =>
            Cast(IntegralDivide(a, b, mode),
              wider(a.dataType, b.dataType))
          case _ => d
        }
      case Cast(child, org.apache.spark.sql.types.StringType, _, _)
          if child.dataType
            .isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType]
            || child.dataType.isInstanceOf[
              org.apache.spark.sql.types.YearMonthIntervalType] =>
        GraftIntervalVarchar(child)
    }

  def apply(df: DataFrame): DataFrame =
    Shims.ofRows(df.sparkSession,
      transformPlan(df.queryExecution.analyzed))
}
