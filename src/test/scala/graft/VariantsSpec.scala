package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Variants._

/** VARIANT function tail, pinned to the reference's documented examples
  * (docs json.md:78-510).
  */
class VariantsSpec extends SparkSpec {
  import spark.implicits._

  private def v(json: String): Column = parse_json(lit(json))
  private def one(c: Column): String =
    spark.range(1).select(to_json(c).as("r")).as[String].head()
  private def oneRaw[T](c: Column)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    spark.range(1).select(c.as("r")).as[T].head()

  private val ada =
    """{"name":"Ada","age":36,"address":{"city":"Boston","zip":"02115"},"tags":[1,2],"note":null}"""

  test("TYPEOF matches reference spellings") {
    val got = spark.range(1).select(
      variantTypeof(v("\"s\"")), variantTypeof(v("1")),
      variantTypeof(v("2.5")), variantTypeof(v("true")),
      variantTypeof(v("null")), variantTypeof(v("[1]")),
      variantTypeof(v("{\"a\":1}")),
      variantTypeof(lit(null).cast("variant")))
      .as[(String, String, String, String, String, String, String, String)].head()
    assert(got === ("VARCHAR", "BIGINT", "DECIMAL", "BOOLEAN", "VARIANT",
      "ARRAY", "MAP", "NULL"))
  }

  test("JSON_EACH_<type> partitions fields by runtime type") {
    val d = """{"i":7,"s":"7","f":2.5,"b":true,"d":"2024-01-01","n":null}"""
    assert(one(jsonEachBigint(v(d))) === """{"i":7}""")
    assert(one(jsonEachString(v(d))) === """{"d":"2024-01-01","s":"7"}""")
    assert(one(jsonEachBoolean(v(d))) === """{"b":true}""")
    assert(one(jsonEachDate(v(d))) === """{"d":"2024-01-01"}""")
    // date-only string is a valid midnight timestamp (like CAST)
    assert(one(jsonEachTimestamp(v(d))) === """{"d":"2024-01-01T00:00:00.000Z"}""")
  }

  test("JSON_OBJECT_KEYS: sorted top-level keys, incl. null/nested values") {
    assert(oneRaw[Seq[String]](jsonObjectKeys(
      v("""{"a": 1, "b": {"c": 2}, "d": null}""")))
      === Seq("a", "b", "d"))
    assert(oneRaw[Seq[String]](jsonObjectKeys(v("5"))) === Seq.empty)
  }

  test("JSON_KEYS: deep dot-joined paths, arrays not traversed, quoting") {
    assert(oneRaw[Seq[String]](jsonKeys(
      v("""{"a": {"b": 1, "c": {"d": 2}}, "e": [{"f": 3}], "g": 4}""")))
      === Seq("a", "a.b", "a.c", "a.c.d", "e", "g"))
    assert(oneRaw[Seq[String]](jsonKeys(v("""{"a.b": 1, "a": {"b": 2}}""")))
      === Seq("\"a.b\"", "a", "a.b"))
  }

  test("VARIANT_FILTER keeps fields passing the predicate; scalar case") {
    assert(one(variantFilter(v(ada),
      (_, x) => schema_of_variant(x) === "STRING")) === """{"name":"Ada"}""")
    assert(one(variantFilter(v("5"), (k, _) => k.isNull)) === "5")
    assert(oneRaw[String](variantFilter(v("5"), (k, _) => k.isNotNull)
      .cast("string")) === null)
  }

  test("VARIANT_MAP transforms values isomorphically") {
    assert(one(variantMap(v("""{"a":1,"b":2}"""),
      (_, x) => x.cast("bigint") * 10)) === """{"a":10,"b":20}""")
    assert(one(variantMap(v("3"), (_, x) => x.cast("bigint") + 1)) === "4")
  }

  test("VARIANT_DEEP_FILTER prunes by path, shrinks arrays") {
    assert(one(variantDeepFilter(v("""{"a": {"b": 1, "c": {"d": 2}}}"""),
      (p, _) => p =!= "a.c")) === """{"a":{"b":1}}""")
    // dropped array element shrinks the array; 1-based [i] components
    assert(one(variantDeepFilter(v("""{"e":[10,20,30]}"""),
      (p, _) => p =!= "e[2]")) === """{"e":[10,30]}""")
    // quoted keys keep paths unambiguous: "example.com".a does NOT match
    // example.% (the quotes are part of the path), but example.b does
    assert(one(variantDeepFilter(
      v("""{"example.com": {"a": 1}, "example": {"b": 2}}"""),
      (p, _) => !p.like("example.%")))
      === """{"example":{},"example.com":{"a":1}}""")
  }

  test("VARIANT_DEEP_MAP transforms leaves labeled by path") {
    assert(one(variantDeepMap(v("""{"a":{"b":2},"c":[5]}"""),
      (_, x) => x.cast("bigint") * 100)) === """{"a":{"b":200},"c":[500]}""")
  }

  test("runtime-recursive deep filter/map match the unrolled versions") {
    // parity across the documented surface: nested objects, array
    // shrinking with 1-based paths, quoted keys, NULL-predicate = drop,
    // NULL-map-result = JSON null leaf, top-level scalars
    val docs = Seq(
      """{"a": {"b": 1, "c": {"d": 2}}}""",
      """{"e":[10,20,30]}""",
      """{"example.com": {"a": 1}, "example": {"b": 2}}""",
      """{"a":{"b":2},"c":[5],"n":null}""",
      """[{"x":1},{"x":2}]""",
      "5", "\"s\"", "null")
    val preds: Seq[(Column, Column) => Column] = Seq(
      (p, _) => p =!= "a.c",
      (p, _) => p =!= "e[2]",
      (p, _) => !p.like("example.%"),
      (_, x) => schema_of_variant(x) =!= "BIGINT",
      (p, _) => when(p.like("%x%"), lit(null)), // NULL predicate = drop
      (p, _) => p.isNull)
    for (d <- docs; f <- preds)
      assert(one(variantDeepFilterAll(v(d), f)) === one(variantDeepFilter(v(d), f)),
        s"deep-filter parity broke on $d")
    val maps: Seq[(Column, Column) => Column] = Seq(
      (_, x) => x.try_cast("bigint") * 100, // non-numeric leaf → JSON null
      (p, x) => when(p.like("%b%"), (x.cast("bigint") * 10).cast("variant"))
        .otherwise(x.cast("variant")),
      (_, _) => lit(null)) // NULL map result = JSON null leaf
    for (d <- docs; f <- maps)
      assert(one(variantDeepMapAll(v(d), f)) === one(variantDeepMap(v(d), f)),
        s"deep-map parity broke on $d")
  }

  test("runtime-recursive deep functions have no depth bound") {
    // 12 nested levels: the unrolled version (depth 8 default) leaves the
    // deep leaf untouched; the runtime walk reaches it
    val deep = (1 to 12).foldRight("7") { (i, acc) => s"""{"k$i":$acc}""" }
    val path = (1 to 12).map(i => s"k$i").mkString(".")
    assert(one(variantDeepMapAll(v(deep), (_, x) => x.cast("bigint") * 2))
      .contains("14"))
    // dropping the full-depth path removes field k12, leaving k11 empty
    assert(one(variantDeepFilterAll(v(deep), (p, _) => p =!= path))
      .contains(""""k11":{}"""))
    // and the lambda sees the full dot-joined path at depth: field k9's
    // path starts with the 9-component prefix, so k8 is left empty
    assert(one(variantDeepFilterAll(v(deep),
      (p, _) => !p.startsWith("k1.k2.k3.k4.k5.k6.k7.k8.k9")))
      .contains(""""k8":{}"""))
  }

  test("VARIANT_MERGE merges objects recursively, second wins") {
    assert(one(variantMerge(
      v("""{"a": {"x": 1, "y": 2}, "b": 1}"""),
      v("""{"a": {"y": 20, "z": 30}, "c": 3}""")))
      === """{"a":{"x":1,"y":20,"z":30},"b":1,"c":3}""")
    assert(one(variantMerge(v("[1]"), v("[2,3]"))) === "[2,3]")
  }
}
