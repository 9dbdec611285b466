package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** IEEE-754 float division for the SQL path (operators.rs:388-395
  * `fp_div`: plain Rust `/` — `1.0/0.0 = Infinity`, `NaN/0 = NaN`,
  * `1.0/-0.0 = -Infinity`), where Spark's ANSI `Divide` raises
  * DIVIDE_BY_ZERO and legacy mode returns NULL — neither is the
  * reference's semantics. Integral and DECIMAL division keep Spark's
  * ANSI error, which matches the reference's panic (operators.rs:372).
  *
  * Both children share one fractional type (FLOAT when both operands
  * were REAL pre-coercion — Calcite's REAL/REAL → REAL — DOUBLE
  * otherwise); codegen'd so dialect-path hot loops stay whole-stage.
  */
case class GraftFpDiv(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = left.dataType
  override def prettyName: String = "graft_fp_div"

  override def nullSafeEval(a: Any, b: Any): Any = dataType match {
    case FloatType => a.asInstanceOf[Float] / b.asInstanceOf[Float]
    case _ => a.asInstanceOf[Double] / b.asInstanceOf[Double]
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $l / $r;")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression) =
    copy(left = newLeft, right = newRight)
}
