package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}

/** The reference's debug helpers (crates/sqllib/src/operators.rs blackbox,
  * string.rs writelog; docs sql/operators): identity functions whose
  * value is their SIDE EFFECT on optimization or logging. CodegenFallback
  * — these are debugging tools, never a hot path.
  */

/** BLACKBOX(v): returns v unchanged but the optimizer may not see
  * through it — no constant folding, no predicate pushdown across it
  * (declared non-deterministic, which is the Catalyst mechanism for
  * "make no assumptions"). The reference uses it to pin benchmark
  * fragments; same contract here.
  */
case class BlackBox(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false // never constant-folded
  override def prettyName: String = "blackbox"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(c: Expression): BlackBox =
    copy(child = c)
}

/** WRITELOG(format, v): prints `format` with every `%%` replaced by v's
  * string form, returns v — the reference's per-row debug tap. Declared
  * non-deterministic so the side effect is not folded away or
  * deduplicated.
  */
case class WriteLog(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = right.dataType
  override def nullable: Boolean = right.nullable
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false // the side effect must survive
  override def prettyName: String = "writelog"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("writelog format must be a string")
  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    val f = left.eval(input)
    if (f != null) {
      // format's %% is the value placeholder (reference string.rs:679)
      print(f.toString.replace("%%", String.valueOf(v)))
    }
    v
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): WriteLog = copy(left = l, right = r)
}

object DebugFns {
  /** Register BLACKBOX and WRITELOG as SQL functions on the session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction("blackbox",
      (args: Seq[Expression]) => BlackBox(args.head), "built-in")
    reg.createOrReplaceTempFunction("writelog",
      (args: Seq[Expression]) => WriteLog(args(0), args(1)), "built-in")
  }
}
