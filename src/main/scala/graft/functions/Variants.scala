package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's VARIANT function tail over Spark 4 VariantType
  * (crates/sqllib/src/variant.rs, 2199 LoC; docs json.md:78-510) —
  * TYPEOF, JSON_EACH_<type>, JSON_OBJECT_KEYS, JSON_KEYS, VARIANT_FILTER /
  * VARIANT_MAP (+ DEEP variants), VARIANT_MERGE.
  *
  * Everything is composed from native variant primitives and map/array
  * higher-order functions (`try_cast` to `MAP<STRING,VARIANT>` /
  * `ARRAY<VARIANT>`, `to_variant_object`, `map_filter`,
  * `transform_values`, `map_zip_with`) — pure Catalyst expressions, no
  * UDFs, fully codegen-able. User lambdas arrive as Scala
  * `(Column, Column) => Column`, the same shape Spark's own HOFs use;
  * keys/paths are passed as STRING (Spark map keys), where the reference
  * passes VARIANT keys — `CAST(k AS VARCHAR)` in reference lambdas is a
  * no-op here.
  *
  * Deep/recursive functions (VARIANT_DEEP_FILTER/MAP, VARIANT_MERGE,
  * JSON_KEYS) unroll recursion to a fixed structural depth (default 8,
  * far beyond typical documents; expression size grows linearly with
  * depth). Below the cutoff, subtrees are kept whole.
  */
object Variants {

  private val ObjType = "map<string,variant>"
  private val ArrType = "array<variant>"

  /** Top-level object as MAP<STRING,VARIANT>; null for non-objects. */
  def toObjectMap(v: Column): Column = v.try_cast(ObjType)

  /** Top-level array as ARRAY<VARIANT>; null for non-arrays. */
  def toVariantArray(v: Column): Column = v.try_cast(ArrType)

  def isObject(v: Column): Column =
    schema_of_variant(v).startsWith("OBJECT")
  def isArray(v: Column): Column =
    schema_of_variant(v).startsWith("ARRAY")

  /** Reference TYPEOF spellings (variant.rs:388-419): Spark's runtime
    * schema mapped to SQL type names; JSON null (VariantNull) → 'VARIANT',
    * SQL NULL → 'NULL'.
    */
  def variantTypeof(v: Column): Column = {
    val s = schema_of_variant(v)
    when(v.isNull, lit("NULL"))
      .when(is_variant_null(v), lit("VARIANT"))
      .when(s.startsWith("OBJECT"), lit("MAP"))
      .when(s.startsWith("ARRAY"), lit("ARRAY"))
      .when(s.startsWith("DECIMAL"), lit("DECIMAL"))
      .when(s === "STRING", lit("VARCHAR"))
      .when(s === "FLOAT", lit("REAL"))
      .otherwise(s)
  }

  // ------------------------------------------------------------ JSON_EACH

  private def each(v: Column, keep: Column => Column,
      conv: Column => Column): Column =
    transform_values(
      map_filter(toObjectMap(v), (_, x) => coalesce(keep(x), lit(false))),
      (_, x) => conv(x))

  /** Whole numbers fitting BIGINT (strings like "7" are NOT numbers). */
  def jsonEachBigint(v: Column): Column =
    each(v, x => schema_of_variant(x) === "BIGINT", _.cast("bigint"))

  def jsonEachString(v: Column): Column =
    each(v, x => schema_of_variant(x) === "STRING", _.cast("string"))

  def jsonEachBoolean(v: Column): Column =
    each(v, x => schema_of_variant(x) === "BOOLEAN", _.cast("boolean"))

  /** DATE values, plus strings that parse as dates (JSON has no date
    * type; json.md:229-236).
    */
  def jsonEachDate(v: Column): Column = {
    // only DATE-typed values and parseable STRINGs qualify — a bare number
    // must NOT coerce (json.md:229-236)
    def d(x: Column) = when(schema_of_variant(x) === "DATE", x.try_cast("date"))
      .when(schema_of_variant(x) === "STRING",
        x.try_cast("string").try_cast("date"))
    each(v, x => d(x).isNotNull, d)
  }

  def jsonEachTimestamp(v: Column): Column = {
    def ts(x: Column) =
      when(schema_of_variant(x).startsWith("TIMESTAMP"), x.try_cast("timestamp"))
        .when(schema_of_variant(x) === "STRING",
          x.try_cast("string").try_cast("timestamp"))
    each(v, x => ts(x).isNotNull, ts)
  }

  // ----------------------------------------------------------------- keys

  /** Sorted top-level keys of an object (Postgres json_object_keys);
    * non-object → empty array, SQL NULL → NULL (json.md JSON_OBJECT_KEYS).
    */
  def jsonObjectKeys(v: Column): Column =
    when(v.isNull, lit(null).cast("array<string>"))
      .otherwise(coalesce(
        array_sort(map_keys(toObjectMap(v))),
        array().cast("array<string>")))

  /** Quote a path component when it contains special characters, BigQuery
    * style: `{"a.b":1}` → `"a.b"` with embedded quotes/backslashes escaped.
    */
  private def quoteKey(k: Column): Column =
    when(k.rlike("^[A-Za-z_][A-Za-z0-9_]*$"), k)
      .otherwise(concat(lit("\""),
        regexp_replace(regexp_replace(k, "\\\\", "\\\\\\\\"), "\"", "\\\\\""),
        lit("\"")))

  /** Dot-joined paths of all nested object keys, deduplicated and sorted
    * (BigQuery JSON_KEYS, strict mode: arrays are not traversed);
    * recursion unrolled to `depth`.
    */
  def jsonKeys(v: Column, depth: Int = 8): Column = {
    def go(x: Column, d: Int): Column = {
      // paths contributed by object x: each key, plus its subtree's paths
      if (d == 0) array().cast("array<string>")
      else coalesce(
        flatten(transform(map_entries(toObjectMap(x)), e => {
          val k = quoteKey(e.getField("key"))
          concat(array(k),
            transform(go(e.getField("value"), d - 1),
              p => concat(k, lit("."), p)))
        })),
        array().cast("array<string>"))
    }
    when(v.isNull, lit(null).cast("array<string>"))
      .otherwise(array_sort(array_distinct(go(v, depth))))
  }

  // --------------------------------------------------- filter / map / merge

  /** Keep object fields where `f(key, value)` is TRUE; a non-object is a
    * single item with NULL key, kept whole or dropped to SQL NULL
    * (json.md VARIANT_FILTER).
    */
  def variantFilter(v: Column, f: (Column, Column) => Column): Column =
    when(isObject(v),
      to_variant_object(map_filter(toObjectMap(v),
        (k, x) => coalesce(f(k, x), lit(false)))))
      .otherwise(when(coalesce(f(lit(null).cast("string"), v), lit(false)), v))

  /** Replace each object value by `f(key, value)` (result auto-converted
    * to VARIANT); a non-object is a single item with NULL key.
    */
  def variantMap(v: Column, f: (Column, Column) => Column): Column =
    when(isObject(v),
      to_variant_object(transform_values(toObjectMap(v),
        (k, x) => f(k, x).cast("variant"))))
      .otherwise(f(lit(null).cast("string"), v).cast("variant"))

  /** Recursive filter: the predicate receives each item's dot-joined path
    * (object fields `a.b`, array elements `e[1].f`, 1-based) and its
    * original value; dropping an item removes its subtree and shrinks
    * arrays (json.md VARIANT_DEEP_FILTER).
    */
  def variantDeepFilter(v: Column, f: (Column, Column) => Column,
      depth: Int = 8): Column = {
    def pred(p: Column, x: Column) = coalesce(f(p, x), lit(false))
    def go(x: Column, prefix: Column, d: Int): Column =
      if (d == 0) x
      else when(isObject(x),
        to_variant_object(transform_values(
          map_filter(toObjectMap(x),
            (k, c) => pred(concat(prefix, quoteKey(k)), c)),
          (k, c) => go(c, concat(prefix, quoteKey(k), lit(".")), d - 1))))
      .when(isArray(x), {
        val path = (i: Column) =>
          concat(regexp_replace(prefix, "\\.$", ""),
            lit("["), (i + 1).cast("string"), lit("]"))
        transform(
          filter(toVariantArray(x), (c, i) => pred(path(i), c)),
          (c, i) => go(c, concat(path(i), lit(".")), d - 1))
          .cast("variant")
      })
      .otherwise(x)
    when(isObject(v) || isArray(v), go(v, lit(""), depth))
      .otherwise(when(pred(lit(null).cast("string"), v), v))
  }

  /** Recursive map: transforms only the LEAVES (scalars / JSON nulls),
    * labeled by their dot-joined path; containers keep their shape
    * (json.md VARIANT_DEEP_MAP).
    */
  def variantDeepMap(v: Column, f: (Column, Column) => Column,
      depth: Int = 8): Column = {
    def go(x: Column, prefix: Column, d: Int): Column =
      if (d == 0) x
      else when(isObject(x),
        to_variant_object(transform_values(toObjectMap(x),
          (k, c) => go(c, concat(prefix, quoteKey(k), lit(".")), d - 1))))
      .when(isArray(x),
        transform(toVariantArray(x), (c, i) =>
          go(c, concat(regexp_replace(prefix, "\\.$", ""),
            lit("["), (i + 1).cast("string"), lit("].")), d - 1))
          .cast("variant"))
      .otherwise(f(regexp_replace(prefix, "\\.$", ""), x).cast("variant"))
    when(isObject(v) || isArray(v), go(v, lit(""), depth))
      .otherwise(f(lit(null).cast("string"), v).cast("variant"))
  }

  /** Runtime-recursive VARIANT_DEEP_FILTER — same semantics as
    * [[variantDeepFilter]] but with NO depth bound and constant plan size
    * (a native HigherOrderFunction walking the variant binary,
    * [[org.apache.spark.sql.graft.VariantDeepTransform]]). Prefer this for
    * deep or unknown-depth documents: the unrolled tree doubles per level
    * (depth 8 ≈ 24 s of codegen), this expression plans in milliseconds.
    */
  def variantDeepFilterAll(v: Column, f: (Column, Column) => Column): Column =
    org.apache.spark.sql.graft.VariantDeepTransform.deepFilter(v, f)

  /** Runtime-recursive VARIANT_DEEP_MAP — unbounded-depth twin of
    * [[variantDeepMap]]; see [[variantDeepFilterAll]].
    */
  def variantDeepMapAll(v: Column, f: (Column, Column) => Column): Column =
    org.apache.spark.sql.graft.VariantDeepTransform.deepMap(v, f)

  /** Recursive merge of two VARIANTs; objects merge key-wise, anything
    * else resolves to the SECOND value (json.md VARIANT_MERGE).
    */
  def variantMerge(a: Column, b: Column, depth: Int = 8): Column = {
    def go(x: Column, y: Column, d: Int): Column =
      if (d == 0) coalesce(y, x)
      else when(isObject(x) && isObject(y),
        to_variant_object(map_zip_with(toObjectMap(x), toObjectMap(y),
          (_, xv, yv) => when(xv.isNull, yv).when(yv.isNull, xv)
            .otherwise(go(xv, yv, d - 1)))))
        .otherwise(coalesce(y, x))
    when(a.isNull, b).when(b.isNull, a).otherwise(go(a, b, depth))
  }
}
