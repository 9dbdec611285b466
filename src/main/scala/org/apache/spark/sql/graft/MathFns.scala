package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Reference transcendental semantics for the SQL path (float.rs):
  *  - EXP is glibc-flavored `Math.exp` (Spark's Exp uses StrictMath,
  *    which differs from the reference's Rust/libm results in the last
  *    ulp — float8p2 `testsThatFailInPostgres#3` caught it);
  *  - LN/LOG10 return -Infinity at zero and PANIC below zero
  *    (float.rs:21-43 `is_sign_negative` guard), where Spark's
  *    builtins return NULL for the whole non-positive domain.
  * Registered as graft_exp/graft_ln/graft_log10; the Dialect
  * arity-dispatches the reference spellings (EXP/LN/LOG/LOG10) onto
  * them. The DataFrame API keeps Spark's own functions.
  */
object GraftMathFns {
  def exp(x: Double): Double = Math.exp(x)

  def ln(x: Double): Double =
    if (java.lang.Double.doubleToRawLongBits(x) < 0 && !(x != x))
      throw new ArithmeticException(s"Unable to calculate ln for $x")
    else if (x == 0d) Double.NegativeInfinity
    else Math.log(x)

  def log10(x: Double): Double =
    if (java.lang.Double.doubleToRawLongBits(x) < 0 && !(x != x))
      throw new ArithmeticException(s"Unable to calculate log10 for $x")
    else if (x == 0d) Double.NegativeInfinity
    else Math.log10(x)

  def apply(fn: String, x: Double): Double = fn match {
    case "exp" => exp(x)
    case "ln" => ln(x)
    case "log10" => log10(x)
    case other => throw new IllegalArgumentException(
      s"unknown graft math fn: $other")
  }

  /** ZoneId validity — CONVERT_TIMEZONE with an unknown zone is NULL
    * in the reference (mysql/TimestampDiffTests issue5986), where
    * Spark's raises. Cached: the zone set is static per JVM.
    */
  private val zoneCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]
  def zoneValid(zone: org.apache.spark.unsafe.types.UTF8String): Boolean =
    if (zone == null) false
    else zoneCache.computeIfAbsent(zone.toString, z =>
      try { java.time.ZoneId.of(z); true }
      catch { case _: Exception => false })

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    for (fn <- Seq("exp", "ln", "log10"))
      reg.createOrReplaceTempFunction(s"graft_$fn",
        (args: Seq[Expression]) => GraftMathUnary(args.head, fn),
        "built-in")
    reg.createOrReplaceTempFunction("graft_zone_valid",
      (args: Seq[Expression]) => GraftZoneValid(args.head), "built-in")
    reg.createOrReplaceTempFunction("graft_interval_total",
      (args: Seq[Expression]) => GraftIntervalTotal(args.head),
      "built-in")
  }
}

case class GraftZoneValid(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  import org.apache.spark.sql.types.{BooleanType, StringType}
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_zone_valid"
  override def nullSafeEval(input: Any): Any = GraftMathFns.zoneValid(
    input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftMathFns.zoneValid($c);")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

case class GraftMathUnary(child: Expression, fn: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"graft_$fn"

  override def nullSafeEval(input: Any): Any =
    GraftMathFns(fn, input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftMathFns.$fn($c);")

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** IEEE ceil/floor over DOUBLE, preserving the DOUBLE type
  * (float.md CEIL/FLOOR: result type = argument type; Spark's
  * Ceil/Floor over DOUBLE return BIGINT and overflow-saturate on
  * |x| >= 2^63 — float8 `testSelect#25-27` record 1.23e200 unchanged).
  */
case class GraftFpCeil(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fp_ceil"
  override def nullSafeEval(input: Any): Any =
    Math.ceil(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = java.lang.Math.ceil($c);")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

case class GraftFpFloor(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_fp_floor"
  override def nullSafeEval(input: Any): Any =
    Math.floor(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = java.lang.Math.floor($c);")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}
