package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Reference BINARY semantics the Spark builtins don't carry
  * (binary.rs / casts.rs, exercised by mysql/VarbinaryTests):
  *
  *  - CAST(x AS BINARY(n)/VARBINARY[(n)]): bytes sources keep the
  *    FIRST n bytes and right-pad with 0 when fixed
  *    (ByteArray::with_size, binary.rs:235); integral sources render
  *    their type-width big-endian bytes, keep the LAST n and LEFT-pad
  *    (with_size_truncate_left, binary.rs:256 / casts.rs:3595) —
  *    CAST(10 AS BINARY(2)) is 000A, CAST(x'abcd' AS BINARY(4)) is
  *    abcd0000.
  *  - SUBSTRING over bytes clamps a sub-1 start to the beginning and
  *    returns empty for a negative count (binary_substring2/3 —
  *    binary.rs:387,398), where Spark's negative start counts from the
  *    end.
  *  - LEFT/RIGHT over bytes are substring forms with empty-on-
  *    non-positive size (binary.rs:419,426).
  *  - OVERLAY over bytes follows binary_overlay4 (binary.rs:450):
  *    negative remove → 0, position ≤ 0 → source unchanged, position
  *    past the end → append.
  */
object BinaryFns {
  private[graft] def beBytes(value: Any, dt: DataType): Array[Byte] =
    dt match {
      case ByteType => Array(value.asInstanceOf[Byte])
      case ShortType =>
        java.nio.ByteBuffer.allocate(2)
          .putShort(value.asInstanceOf[Short]).array()
      case IntegerType =>
        java.nio.ByteBuffer.allocate(4)
          .putInt(value.asInstanceOf[Int]).array()
      case LongType =>
        java.nio.ByteBuffer.allocate(8)
          .putLong(value.asInstanceOf[Long]).array()
      case other => throw new IllegalArgumentException(
        s"CAST to BINARY over ${other.catalogString}")
    }

  /** binary.rs ByteArray::with_size — truncate keeping the FIRST
    * `size` bytes; right-pad with zeros when fixed.
    */
  private[graft] def withSize(d: Array[Byte], size: Int,
      fixed: Boolean): Array[Byte] =
    if (size < 0 || d.length == size) d
    else if (d.length > size) d.take(size)
    else if (fixed) d ++ Array.fill[Byte](size - d.length)(0)
    else d

  /** binary.rs with_size_truncate_left — keep the LAST `size` bytes;
    * LEFT-pad with zeros when fixed (the integral-source form).
    */
  private[graft] def withSizeLeft(d: Array[Byte], size: Int,
      fixed: Boolean): Array[Byte] =
    if (size < 0 || d.length == size) d
    else if (d.length > size) d.takeRight(size)
    else if (fixed) Array.fill[Byte](size - d.length)(0) ++ d
    else d

  /** binary_substring3 (1-based; start clamps to 1, negative count is
    * empty); count = Int.MaxValue for the 2-argument form.
    */
  private[graft] def substr(d: Array[Byte], left: Int,
      count: Int): Array[Byte] = {
    val start = if (left < 1) 0 else left - 1
    if (count < 0) Array.emptyByteArray
    else d.iterator.drop(start).take(count).toArray
  }

  private[graft] def overlay(src: Array[Byte], repl: Array[Byte],
      position: Int, remove0: Int): Array[Byte] = {
    val remove = math.max(remove0, 0)
    if (position <= 0) src
    else if (position > src.length) src ++ repl
    else substr(src, 0, position - 1) ++ repl ++
      substr(src, position + remove, Int.MaxValue)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_to_binary",
      (args: Seq[Expression]) => {
        def intLit(e: Expression): Int = e match {
          case Literal(i: Int, IntegerType) => i
          case other => throw new IllegalArgumentException(
            s"graft_to_binary needs literal size/fixed args, got $other")
        }
        val fixed = args(2) match {
          case Literal(b: Boolean, BooleanType) => b
          case other => throw new IllegalArgumentException(
            s"graft_to_binary fixed flag must be literal, got $other")
        }
        GraftToBinary(args.head, intLit(args(1)), fixed)
      }, "built-in")
  }
}

/** CAST(x AS BINARY(n)/VARBINARY[(n)]) (size = -1 for no limit). */
case class GraftToBinary(child: Expression, size: Int, fixed: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_to_binary"

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case BinaryType =>
      BinaryFns.withSize(input.asInstanceOf[Array[Byte]], size, fixed)
    case StringType =>
      BinaryFns.withSize(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .getBytes, size, fixed)
    case t @ (ByteType | ShortType | IntegerType | LongType) =>
      BinaryFns.withSizeLeft(BinaryFns.beBytes(input, t), size, fixed)
    case other => throw new IllegalArgumentException(
      s"CAST to BINARY over ${other.catalogString}")
  }

  override protected def withNewChildInternal(c: Expression) =
    copy(child = c)
}

case class GraftBinSubstr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bin_substr"
  override def nullSafeEval(b: Any, pos: Any, len: Any): Any =
    BinaryFns.substr(b.asInstanceOf[Array[Byte]],
      pos.asInstanceOf[Int], len.asInstanceOf[Int])
  override protected def withNewChildrenInternal(a: Expression,
      b: Expression, c: Expression) = copy(a, b, c)
}

/** LEFT/RIGHT over bytes (binary.rs:419,426). */
case class GraftBinLeftRight(bytes: Expression, size: Expression,
    fromRight: Boolean) extends BinaryExpression with CodegenFallback {
  override def left: Expression = bytes
  override def right: Expression = size
  override def dataType: DataType = BinaryType
  override def prettyName: String =
    if (fromRight) "graft_bin_right" else "graft_bin_left"
  override def nullSafeEval(b: Any, n: Any): Any = {
    val d = b.asInstanceOf[Array[Byte]]
    val sz = n.asInstanceOf[Int]
    if (!fromRight) BinaryFns.substr(d, 1, sz)
    else if (sz <= 0) Array.emptyByteArray
    else {
      val start = if (sz >= d.length) 1 else d.length - sz + 1
      BinaryFns.substr(d, start, sz)
    }
  }
  override protected def withNewChildrenInternal(a: Expression,
      b: Expression) = copy(bytes = a, size = b)
}

case class GraftBinOverlay(src: Expression, repl: Expression,
    pos: Expression, len: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(src, repl, pos, len)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_bin_overlay"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else BinaryFns.overlay(vs(0).asInstanceOf[Array[Byte]],
      vs(1).asInstanceOf[Array[Byte]], vs(2).asInstanceOf[Int],
      vs(3).asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]) = copy(cs(0), cs(1), cs(2), cs(3))
}
