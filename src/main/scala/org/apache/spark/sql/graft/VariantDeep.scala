package org.apache.spark.sql.graft

import java.util.ArrayList

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.types.variant.{Variant, VariantBuilder, VariantUtil}
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** Runtime-recursive VARIANT_DEEP_FILTER / VARIANT_DEEP_MAP as a native
  * Catalyst HigherOrderFunction (reference: crates/sqllib/src/variant.rs
  * deep filter/map; docs json.md VARIANT_DEEP_*). Lives under
  * org.apache.spark.sql because HigherOrderFunction's AbstractDataType
  * signature is private[sql]; the public API is the companion's
  * deepFilter/deepMap, re-exported as graft.functions.Variants
  * .variantDeepFilterAll / .variantDeepMapAll (parity-tested against the
  * unrolled versions in VariantsSpec).
  *
  * The HOF-composed versions in [[Variants]] unroll structural recursion
  * to a depth bound, and the unrolled expression tree DOUBLES per level
  * (object + array branches) — depth 8 costs ~24 s of codegen. This
  * expression walks the variant binary at runtime instead: constant plan
  * size, no depth bound, one [[VariantBuilder]] pass per row
  * (CodegenFallback — a single interpreted call beats a megamorphic
  * unrolled codegen tree here; the lambda itself is still a compiled
  * Catalyst expression evaluated per visited node).
  *
  * Semantics mirror [[Variants.variantDeepFilter]] / [[Variants.variantDeepMap]]:
  * the lambda receives each item's dot-joined path (object fields `a.b`,
  * array elements `e[1].f`, 1-based; NULL path for a top-level scalar) and
  * its value. Filter drops whole subtrees and shrinks arrays; map rewrites
  * only leaves (scalars / JSON nulls), containers keep their shape.
  */
case class VariantDeepTransform(
    argument: Expression,
    function: Expression,
    isFilter: Boolean)
    extends HigherOrderFunction with CodegenFallback {

  private type VType = VariantUtil.Type

  override def arguments: Seq[Expression] = Seq(argument)
  override def argumentTypes: Seq[AbstractDataType] = Seq(VariantType)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] =
    Seq(if (isFilter) BooleanType else VariantType)
  override def children: Seq[Expression] = arguments ++ functions
  override def dataType: DataType = VariantType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (isFilter) "variant_deep_filter" else "variant_deep_map"

  override protected def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): HigherOrderFunction =
    copy(function = f(function, Seq((StringType, true), (VariantType, true))))

  @transient private lazy val (lambdaBody: Expression,
      pathVar: NamedLambdaVariable, valueVar: NamedLambdaVariable) =
    function match {
      case LambdaFunction(body,
          Seq(p: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
        (body, p, v)
      case other => sys.error(s"$prettyName lambda is unbound: $other")
    }

  /** Standalone VariantVal for a subtree (the shared dictionary is
    * re-packed so the lambda sees a self-contained value).
    */
  private def subVal(v: Variant): VariantVal = {
    val b = new VariantBuilder(false)
    b.appendVariant(v)
    val r = b.result()
    new VariantVal(r.getValue, r.getMetadata)
  }

  private def evalLambda(path: String, v: Variant, input: InternalRow): Any = {
    pathVar.value.set(if (path == null) null else UTF8String.fromString(path))
    valueVar.value.set(subVal(v))
    lambdaBody.eval(input)
  }

  private def pred(path: String, v: Variant, input: InternalRow): Boolean =
    evalLambda(path, v, input) match {
      case b: java.lang.Boolean => b
      case _ => false // NULL predicate = drop, matching coalesce(f, false)
    }

  private val identRe = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private def quoteKey(k: String): String =
    if (identRe.matches(k)) k
    else "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  private def trimDot(p: String): String =
    if (p.endsWith(".")) p.dropRight(1) else p

  private def isContainer(v: Variant): Boolean = {
    val t = v.getType
    t == VariantUtil.Type.OBJECT || t == VariantUtil.Type.ARRAY
  }

  private def writeFiltered(b: VariantBuilder, v: Variant, prefix: String,
      input: InternalRow): Unit = v.getType match {
    case VariantUtil.Type.OBJECT =>
      val start = b.getWritePos
      val fields = new ArrayList[VariantBuilder.FieldEntry]()
      var i = 0
      while (i < v.objectSize) {
        val f = v.getFieldAtIndex(i)
        val path = prefix + quoteKey(f.key)
        if (pred(path, f.value, input)) {
          val id = b.addKey(f.key)
          fields.add(new VariantBuilder.FieldEntry(f.key, id,
            b.getWritePos - start))
          writeFiltered(b, f.value, path + ".", input)
        }
        i += 1
      }
      b.finishWritingObject(start, fields)
    case VariantUtil.Type.ARRAY =>
      val start = b.getWritePos
      val offs = new ArrayList[Integer]()
      var i = 0
      while (i < v.arraySize) {
        val e = v.getElementAtIndex(i)
        val path = trimDot(prefix) + "[" + (i + 1) + "]"
        if (pred(path, e, input)) {
          offs.add(b.getWritePos - start)
          writeFiltered(b, e, path + ".", input)
        }
        i += 1
      }
      b.finishWritingArray(start, offs)
    case _ => b.appendVariant(v)
  }

  private def writeMapped(b: VariantBuilder, v: Variant, prefix: String,
      input: InternalRow): Unit = v.getType match {
    case VariantUtil.Type.OBJECT =>
      val start = b.getWritePos
      val fields = new ArrayList[VariantBuilder.FieldEntry]()
      var i = 0
      while (i < v.objectSize) {
        val f = v.getFieldAtIndex(i)
        val id = b.addKey(f.key)
        fields.add(new VariantBuilder.FieldEntry(f.key, id,
          b.getWritePos - start))
        writeMapped(b, f.value, prefix + quoteKey(f.key) + ".", input)
        i += 1
      }
      b.finishWritingObject(start, fields)
    case VariantUtil.Type.ARRAY =>
      val start = b.getWritePos
      val offs = new ArrayList[Integer]()
      var i = 0
      while (i < v.arraySize) {
        offs.add(b.getWritePos - start)
        writeMapped(b, v.getElementAtIndex(i),
          trimDot(prefix) + "[" + (i + 1) + "].", input)
        i += 1
      }
      b.finishWritingArray(start, offs)
    case _ =>
      evalLambda(trimDot(prefix), v, input) match {
        case vv: VariantVal =>
          b.appendVariant(new Variant(vv.getValue, vv.getMetadata))
        case _ => b.appendNull() // SQL NULL result → JSON null leaf
      }
  }

  override def eval(input: InternalRow): Any = {
    val arg = argument.eval(input)
    if (arg == null) return null
    val vv = arg.asInstanceOf[VariantVal]
    val v = new Variant(vv.getValue, vv.getMetadata)
    if (!isContainer(v)) {
      // top-level scalar: single item with NULL path
      if (isFilter) { if (pred(null, v, input)) vv else null }
      else evalLambda(null, v, input) match {
        case res: VariantVal => res
        case _ => null
      }
    } else {
      val b = new VariantBuilder(false)
      if (isFilter) writeFiltered(b, v, "", input)
      else writeMapped(b, v, "", input)
      val r = b.result()
      new VariantVal(r.getValue, r.getMetadata)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VariantDeepTransform =
    copy(argument = newChildren(0), function = newChildren(1))
}

object VariantDeepTransform {
  private def lambda2(f: (Column, Column) => Column): Expression = {
    val p = UnresolvedNamedLambdaVariable(
      Seq(UnresolvedNamedLambdaVariable.freshVarName("p")))
    val v = UnresolvedNamedLambdaVariable(
      Seq(UnresolvedNamedLambdaVariable.freshVarName("v")))
    LambdaFunction(Shims.expression(f(Shims.column(p), Shims.column(v))),
      Seq(p, v))
  }

  /** Runtime-recursive VARIANT_DEEP_FILTER: no depth bound, constant plan
    * size. Drop-in for [[Variants.variantDeepFilter]].
    */
  def deepFilter(v: Column, f: (Column, Column) => Column): Column =
    Shims.column(VariantDeepTransform(Shims.expression(v), lambda2(f),
      isFilter = true))

  /** Runtime-recursive VARIANT_DEEP_MAP: transforms leaves only, no depth
    * bound. Drop-in for [[Variants.variantDeepMap]].
    */
  def deepMap(v: Column, f: (Column, Column) => Column): Column =
    Shims.column(VariantDeepTransform(Shims.expression(v),
      lambda2((p, x) => f(p, x).cast("variant")), isFilter = false))
}
