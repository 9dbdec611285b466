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

/** Codegen'd integer quantization of a FLOAT/DOUBLE vector:
  * `transform(a, x => round(x.cast("double") * scale).cast("long"))` as a
  * single tight loop — the staging projection of every quantized ANN row
  * (brute-force / IVF / PQ / IVFPQ) evaluated that HOF lambda tree
  * interpreted, per element, per corpus row.
  *
  * Bit-identical to the composed form (QuantizeKernelSpec): Spark's
  * `round` on DOUBLE is `BigDecimal.valueOf(v).setScale(0, HALF_UP)` —
  * for |v| < 2^52 the shortest-decimal detour equals binary
  * round-half-away-from-zero (a double whose shortest decimal form is
  * `k.5` IS the representable `k.5`, because that literal parses to
  * itself), and above 2^52 every double is already integral; so the
  * kernel computes floor + half-compare and skips BigDecimal entirely.
  * The trailing LONG cast replicates ANSI overflow semantics.
  *
  * Null semantics: null if the array is null; null ELEMENTS stay null
  * (exactly `transform`'s behavior).
  */
case class QuantizeRoundLong(child: Expression, scale: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_quantize"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isD = elemIsDouble
    val vals = new Array[Long](n)
    var anyNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) anyNull = true
      else {
        val v = (if (isD) a.getDouble(i) else a.getFloat(i).toDouble) *
          scale.toDouble
        vals(i) = QuantizeRoundLong.roundCastLong(v)
      }
      i += 1
    }
    if (!anyNull)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(vals)
    else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!a.isNullAt(i)) out(i) = vals(i)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val vals = ctx.freshName("vals")
      val anyNull = ctx.freshName("anyNull")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val getter = if (elemIsDouble) s"$a.getDouble($i)"
        else s"(double) $a.getFloat($i)"
      val cls = "graft.functions.QuantizeRoundLong"
      s"""
         |int $n = $a.numElements();
         |long[] $vals = new long[$n];
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $anyNull = true; }
         |  else {
         |    double $v = $getter * (double) $scale;
         |    $vals[$i] = $cls.roundCastLong($v);
         |  }
         |}
         |if (!$anyNull) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($vals);
         |} else {
         |  Object[] $out = new Object[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    if (!$a.isNullAt($j)) $out[$j] = $vals[$j];
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeRoundLong = copy(child = newChild)
}

object QuantizeRoundLong {
  /** `round(v)` (HALF_UP, Spark Round-on-DOUBLE semantics) then ANSI cast
    * to LONG. Called from generated code — must stay public and static.
    */
  def roundCastLong(v: Double): Long = {
    val r =
      if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v) ||
        math.abs(v) >= 4.503599627370496e15) v // >= 2^52: integral
      else {
        val f = math.floor(v)
        // frac = v - f computed in fp is INEXACT near .5 (e.g.
        // v = -0.49999999999999994 gives exactly 0.5), so recover the
        // subtraction's exact error with Knuth 2Sum: s + err == v - f
        // as reals. Comparing (s - 0.5) + err against 0 is then exact:
        // s - 0.5 is exact by Sterbenz whenever it could be smaller
        // than |err|, and fp addition preserves the sign of the result.
        // Binary-exact comparison agrees with Spark Round's
        // shortest-decimal HALF_UP: strict sides can't straddle a
        // representable half (both are within half an ulp of it), and
        // an exact binary k.5 prints as "k.5".
        val s = v - f
        val a1 = s + f
        val b1 = s - a1
        val err = (v - a1) + (-f - b1)
        val c = (s - 0.5d) + err
        if (c > 0d || (c == 0d && v > 0d)) f + 1d else f
      }
    // ANSI cast(double as long), bit-for-bit (probed): the window is
    // [-2^63, 2^63] on the ROUNDED value (Long.MaxValue.toDouble is
    // 2^63), in-window values saturate via toLong (so r == 2^63 yields
    // Long.MaxValue), NaN/Inf/outside throw Spark's own CAST_OVERFLOW.
    if (r >= -9.223372036854776e18 && r <= 9.223372036854776e18) r.toLong
    else throw org.apache.spark.sql.graft.Shims.castDoubleToLongOverflow(r)
  }
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
