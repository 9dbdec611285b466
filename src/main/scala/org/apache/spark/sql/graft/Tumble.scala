package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Epoch-aligned tumbling-window start — Calcite's legacy scalar
  * `TUMBLE(ts, size [, offset])` / `TUMBLE_START` (the reference still
  * accepts the GROUP BY form, streaming/StreamingTests.java
  * tumblingTest); same assignment as Spark's `window()` expression.
  * size/offset arrive as millisecond literals (Dialect
  * rewriteScalarTumble); timestamps evaluate as epoch micros for both
  * TIMESTAMP flavors, so the floor is a pure long computation.
  */
case class GraftTumble(child: Expression, size: Expression,
    offset: Expression) extends TernaryExpression with CodegenFallback {
  override def first: Expression = child
  override def second: Expression = size
  override def third: Expression = offset
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_tumble"

  override def nullSafeEval(ts: Any, sz: Any, off: Any): Any = {
    val micros = ts.asInstanceOf[Long]
    val sizeUs = sz.asInstanceOf[Long] * 1000L
    val offUs = off.asInstanceOf[Long] * 1000L
    Math.floorDiv(micros - offUs, sizeUs) * sizeUs + offUs
  }

  override protected def withNewChildrenInternal(a: Expression,
      b: Expression, c: Expression) = copy(child = a, size = b, offset = c)
}
