package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Expression, IsNotNull, LambdaFunction, Literal, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's ad-hoc JSON path-getter family
  * (docs.feldera.com/docs/sql/ad-hoc.md:160-215 — the
  * datafusion-functions-json surface: `json_get_str(doc, 'scores', 0)`
  * etc. with variadic key/index path steps). Registered as SQL functions
  * that COMPOSE Spark's native VARIANT machinery: the doc argument
  * (VARIANT column or JSON string — casting VARIANT to STRING yields its
  * JSON text, so both shapes converge) parses through `try_parse_json`
  * and the literal path steps fold into one `variant_get` JSON path, so
  * every getter plans as codegen'd variant extraction — no UDF.
  *
  * Path steps must be string-key or integer-index literals (0-based),
  * matching the reference's contract; a missing key, mismatched type, or
  * null document yields NULL.
  */
object JsonGetFns {

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  private def doc(e: Expression): Expression =
    fn("try_parse_json", Cast(e, StringType))

  private def path(parts: Seq[Expression]): Expression = {
    val p = parts.map {
      case Literal(u: UTF8String, StringType) =>
        val k = u.toString
        if (k.matches("[A-Za-z_][A-Za-z0-9_]*")) s".$k"
        else s"['${k.replace("'", "\\'")}']"
      case Literal(v, ByteType | ShortType | IntegerType | LongType) =>
        s"[$v]"
      case other => throw new IllegalArgumentException(
        "json_get path steps must be string-key or integer-index " +
          s"literals, got: ${other.sql}")
    }.mkString
    Literal(UTF8String.fromString("$" + p), StringType)
  }

  /** try_variant_get(try_parse_json(doc), '$...path', type) — try on
    * both layers: a type mismatch yields NULL, never an error.
    */
  private def get(args: Seq[Expression], typ: String): Expression =
    fn("try_variant_get", doc(args.head), path(args.tail),
      Literal(UTF8String.fromString(typ), StringType))

  private def tryCastTo(e: Expression, t: DataType): Expression =
    Cast(e, t, None, EvalMode.TRY)

  /** Register the family on the session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    def add(name: String)(b: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, b, "built-in")

    add("json_get")(a => get(a, "variant"))
    add("json_get_str")(a => get(a, "string"))
    add("json_get_int")(a => get(a, "bigint"))
    add("json_get_float")(a => get(a, "double"))
    add("json_get_bool")(a => get(a, "boolean"))
    // raw JSON text of the value at path
    add("json_get_json")(a => fn("to_json", get(a, "variant")))
    // array at path, each element as raw JSON text
    add("json_get_array") { a =>
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      fn("transform",
        tryCastTo(get(a, "variant"), ArrayType(VariantType)),
        LambdaFunction(fn("to_json", x), Seq(x)))
    }
    // any scalar at path as text (the ->> analogue)
    add("json_as_text")(a => get(a, "string"))
    // a value EXISTS at path (a JSON null value still exists — it casts
    // to a non-null VariantNull, while a missing path is SQL NULL)
    add("json_contains")(a => IsNotNull(get(a, "variant")))
    // length of the object or array at path (BIGINT per the contract)
    add("json_length") { a =>
      val v = get(a, "variant")
      Cast(fn("coalesce",
        fn("size", tryCastTo(v, ArrayType(VariantType))),
        fn("size", fn("map_keys",
          tryCastTo(v, MapType(StringType, VariantType))))), LongType)
    }
    // keys of the object at path
    add("json_object_keys")(a => fn("map_keys",
      tryCastTo(get(a, "variant"), MapType(StringType, VariantType))))
  }
}
