package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two FLOAT vectors in a tight
  * codegen loop over the underlying ArrayData — no intermediate array
  * allocation, stays inside WholeStageCodegen.
  *
  * This is the SURVEY §custom-operators preference (b): when composing
  * built-ins is too slow (aggregate+zip_with allocates a zipped array per
  * row) and before reaching for a UDF (boxing, no codegen). Used by the
  * embedding-similarity hot path where the per-row cost at 100 TB is the
  * inner loop.
  *
  * Null semantics: null if either array is null; null ELEMENTS are treated
  * as 0 (embeddings have no null elements; branch kept for safety).
  */
case class VectorDotFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot_float"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorDotFloat =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column API: codegen'd float-vector dot product. */
  def dotF(a: Column, b: Column): Column =
    Shims.column(VectorDotFloat(Shims.expression(a), Shims.expression(b)))

  /** Cosine similarity on float vectors via the codegen'd dot. */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    dotF(a, b) / nullif(sqrt(dotF(a, a)) * sqrt(dotF(b, b)),
      org.apache.spark.sql.functions.lit(0d))
  }
}
