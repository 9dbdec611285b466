package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

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

/** Native Catalyst expression: exact integer dot product of two BIGINT
  * vectors (the quantized-embedding representation the oracle-checked
  * similarity queries use). Same tight-loop shape as [[VectorDotFloat]];
  * arithmetic is exact long adds/multiplies, so the result is identical to
  * the interpreted `aggregate(zip_with(...))` fold it replaces — but stays
  * inside WholeStageCodegen with no per-pair array allocation.
  *
  * Null semantics: null if either array is null; null ELEMENTS contribute 0
  * (quantized embeddings have no null elements; branch kept for safety).
  */
case class VectorDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "vector_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getLong(i) * y.getLong(i)
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
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorDotLong =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd exact squared-L2 distance over BIGINT vectors — the
  * assignment kernel of the quantized IVF path (centroid routing computes
  * |vectors| × |centroids| of these per Lloyd round / per query batch).
  * Identical arithmetic to the interpreted
  * `aggregate(zip_with((x-c)*(x-c)))` fold it replaces.
  */
case class VectorDist2Long(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "vector_dist2_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
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
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorDist2Long =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column API: codegen'd float-vector dot product. */
  def dotF(a: Column, b: Column): Column =
    Shims.column(VectorDotFloat(Shims.expression(a), Shims.expression(b)))

  /** Column API: codegen'd exact BIGINT squared-L2 distance. */
  def dist2L(a: Column, b: Column): Column =
    Shims.column(VectorDist2Long(Shims.expression(a), Shims.expression(b)))

  /** Column API: codegen'd exact integer (BIGINT) vector dot product. */
  def dotL(a: Column, b: Column): Column =
    Shims.column(VectorDotLong(Shims.expression(a), Shims.expression(b)))

  /** Cosine similarity on float vectors via the codegen'd dot. */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    dotF(a, b) / nullif(sqrt(dotF(a, a)) * sqrt(dotF(b, b)),
      org.apache.spark.sql.functions.lit(0d))
  }
}
