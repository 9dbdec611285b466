package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd kernels for the LLM-pipeline Karp–Rabin hash family.
  *
  * The Column-level originals ([[graft.llm.Dedup.polyHash]] etc.) are
  * higher-order-function trees — `aggregate(transform(sequence(1,
  * length(s)), i -> ascii(substr(s, i, 1))), ...)` — whose lambdas
  * evaluate INTERPRETED per element: per character, per token, per row
  * (optimization guide §4: prefer codegen expressions in the hot
  * path; the fingerprint scan dominated several llm_* rows' task
  * time). These expressions compute the IDENTICAL values — Spark's
  * `ascii` is the first CODE POINT of its argument
  * (Ascii.nullSafeEval: substring(0,1).toString.codePointAt(0)) and
  * `substr(s, i, 1)`/`length(s)` count code points, so the string fold
  * is a fold over code points — in one tight JVM loop per row, inside
  * whole-stage codegen. Equivalence is property-tested against the HOF
  * originals (HashKernelsSpec), and every consuming query stays graded
  * against the unchanged DuckDB oracle SQL.
  */
object GraftHashKernels {
  /** [[graft.llm.Dedup.FP_P]]: largest prime below 2^50 · 1024. */
  val P = 1125899906842597L

  /** Fold over code points: acc·31 + cp (mod P), init 7; empty → 7.
    * Bit-identical to `when(length(s) < 1, 7).otherwise(aggregate(
    * transform(sequence(1, length(s)), i -> ascii(substr(s, i, 1))),
    * 7, (acc, c) -> (acc·31 + c) % P))`.
    */
  def polyHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 7L
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xe0) == 0xc0) {
        cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); len = 2
      } else if ((b0 & 0xf0) == 0xe0) {
        cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f); len = 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f); len = 4
      }
      acc = (acc * 31L + cp) % P
      i += len
    }
    acc
  }

  /** Element-wise [[polyHash]] over a string array (null elements map to
    * null, like `transform(toks, t -> polyHash(t))`).
    */
  def polyHashArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) null
        else java.lang.Long.valueOf(polyHash(arr.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Whole-array fold acc·mult + h (mod P), init 7 — bit-identical to
    * `aggregate(arr, 7, (acc, h) -> (acc·mult + h) % P)`: empty → 7, a
    * null element nulls the accumulator for good (SQL arithmetic), so
    * any null element → null result (boxed for the codegen null check).
    */
  def polyFold(arr: ArrayData, mult: Long): java.lang.Long = {
    val n = arr.numElements()
    var acc = 7L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      acc = (acc * mult + arr.getLong(i)) % P
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** All n-windows of the fold: element i (0-based) folds arr[i..i+n)
    * with init 7 — bit-identical to `transform(sequence(1, size(arr) -
    * n + 1), i -> aggregate(slice(arr, i, n), 7, (acc, h) ->
    * (acc·mult + h) % P))` for size(arr) >= n (callers gate on that —
    * Spark's sequence(1, 0) counts DOWN, so the original was never
    * evaluated shorter either). A window containing a null element
    * yields a null element. One pass, O(len·n) long arithmetic.
    */
  def rollingGrams(arr: ArrayData, n: Int, mult: Long): ArrayData = {
    val len = arr.numElements()
    val hs = new Array[Long](len)
    val nulls = new Array[Boolean](len)
    var hasNull = false
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) { nulls(i) = true; hasNull = true }
      else hs(i) = arr.getLong(i)
      i += 1
    }
    val m = math.max(0, len - n + 1)
    val out = new Array[Any](m)
    var w = 0
    while (w < m) {
      var acc = 7L
      var ok = true
      var j = w
      val end = w + n
      while (j < end && ok) {
        if (hasNull && nulls(j)) ok = false
        else acc = (acc * mult + hs(j)) % P
        j += 1
      }
      out(w) = if (ok) java.lang.Long.valueOf(acc) else null
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** polyHash over a string column. */
case class GraftPolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_poly_hash over ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    GraftHashKernels.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftHashKernels.polyHash($c)")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** Element-wise polyHash over an array<string> column. */
case class GraftPolyHashArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_poly_hash_array"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_poly_hash_array over ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    GraftHashKernels.polyHashArray(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftHashKernels.polyHashArray($c)")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** Whole-array Karp–Rabin fold (the rolling document fingerprint). */
case class GraftPolyFold(child: Expression, mult: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_poly_fold"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_poly_fold over ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    GraftHashKernels.polyFold(input.asInstanceOf[ArrayData], mult)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""java.lang.Long ${ev.value}_box =
         |  org.apache.spark.sql.graft.GraftHashKernels.polyFold($c, ${mult}L);
         |if (${ev.value}_box == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_box.longValue();
         |}""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

/** All n-token-window folds of a hash array (the span/gram hashes). */
case class GraftRollingGrams(child: Expression, n: Int, mult: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_rolling_grams"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_rolling_grams over ${other.catalogString}")
    }
  override def nullSafeEval(input: Any): Any =
    GraftHashKernels.rollingGrams(input.asInstanceOf[ArrayData], n, mult)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GraftHashKernels.rollingGrams($c, $n, ${mult}L)")
  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}
