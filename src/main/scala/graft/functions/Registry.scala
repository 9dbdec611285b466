package graft.functions

import java.io.ByteArrayInputStream
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.SparkSession

/** Scalar-function surface completion (SURVEY §2.8, §7.1 functions/):
  * Feldera spellings that Spark lacks, registered as SQL-bodied functions
  * (`CREATE FUNCTION ... RETURN expr` — Spark 4 inlines these into the
  * plan, so they stay inside WholeStageCodegen; this is also exactly the
  * reference's SQL-bodied `CREATE FUNCTION` feature, udf.md:6-16).
  * Only genuinely-procedural functions (GUNZIP) fall back to Scala UDFs.
  */
object Registry {

  /** SQL-bodied aliases: name → (params, returnType, body). */
  val sqlFunctions: Seq[(String, String, String, String)] = Seq(
    // TO_INT(binary) — the FIRST min(4, len) bytes folded big-endian
    // into a SIGNED i32 (binary.md:118, sqllib/src/binary.rs:489:
    // result = result << 8 | byte). conv() reads the fold unsigned in
    // [0, 2^32); the modular shift re-centers it into signed-i32 range
    // BEFORE the INT cast (ANSI mode rejects a wrapping cast — a bare
    // CAST(BIGINT AS INT) of x'FFFFFFFF' throws CAST_OVERFLOW where the
    // reference folds to -1)
    ("to_int", "b BINARY", "INT",
      "CAST(((CAST(conv(hex(substr(b, 1, 4)), 16, 10) AS BIGINT) " +
        "+ 2147483648) % 4294967296) - 2147483648 AS INT)"),
    // trig tail (float.md: SEC/CSC/COT and hyperbolics)
    ("sec", "x DOUBLE", "DOUBLE", "1.0 / cos(x)"),
    ("csc", "x DOUBLE", "DOUBLE", "1.0 / sin(x)"),
    ("coth", "x DOUBLE", "DOUBLE", "cosh(x) / sinh(x)"),
    ("sech", "x DOUBLE", "DOUBLE", "1.0 / cosh(x)"),
    ("csch", "x DOUBLE", "DOUBLE", "1.0 / sinh(x)"),
    // division/NaN guards (DIV_NULL, FINITE_OR_NULL)
    ("div_null", "x DOUBLE, y DOUBLE", "DOUBLE", "try_divide(x, y)"),
    // float predicates + numeric truncation (float.md IS_INF/IS_NAN;
    // decimal.md TRUNC — truncation toward zero at a scale, which Spark
    // only has for dates; double→bigint CAST truncates, matching)
    ("is_inf", "x DOUBLE", "BOOLEAN",
      "x = double('inf') OR x = double('-inf')"),
    ("is_nan", "x DOUBLE", "BOOLEAN", "isnan(x)"),
    // float.rs truncate_d_i32: (x*10^n).trunc()/10^n in DOUBLE (never
    // through BIGINT — truncate(1.2e200) is 1.2e200, not an overflow);
    // x % 1.0 is IEEE fmod so huge/NaN pass through, and the final
    // `+ 0.0` normalizes -0 like the reference's normalize_zero_d
    ("truncate", "x DOUBLE, n INT", "DOUBLE",
      "CASE WHEN isnan(x * power(10, n)) " +
        "OR abs(x * power(10, n)) = double('inf') " +
        "THEN (x * power(10, n)) / power(10, n) " +
        "ELSE ((x * power(10, n)) - (x * power(10, n)) % 1.0D) " +
        "/ power(10, n) + 0.0D END"),
    // float.rs log_d_d: LOG(x, base) = ln(x)/ln(base), 0 base → 0,
    // negative x or base panics; graft_ln supplies ln(0) = -Infinity
    // POWER edges per the reference's recorded contract (float8
    // testSelect#34,39-42): pow(1, NaN) = NaN (Postgres), but
    // pow(±1, ±inf) = 1 (IEEE) — Java's Math.pow returns NaN for
    // BOTH |x|=1-with-infinite-y cases, so the infinities need the
    // explicit branch
    ("graft_pow", "x DOUBLE, y DOUBLE", "DOUBLE",
      "CASE WHEN abs(x) = 1.0D AND abs(y) = double('inf') THEN 1.0D " +
        "ELSE power(x, y) END"),
    // CONVERT_TIMEZONE with an unknown zone name is NULL in the
    // reference (TimestampDiffTests issue5986); Spark's raises
    ("graft_convert_tz", "a STRING, b STRING, t TIMESTAMP_NTZ",
      "TIMESTAMP_NTZ",
      "CASE WHEN graft_zone_valid(a) AND graft_zone_valid(b) " +
        "THEN convert_timezone(a, b, t) ELSE NULL END"),
    ("graft_log2", "x DOUBLE, b DOUBLE", "DOUBLE",
      "CASE WHEN x < 0D OR b < 0D THEN CAST(raise_error(" +
        "concat('Unable to calculate log(', x, ', ', b, ')')) " +
        "AS DOUBLE) WHEN b = 0D THEN 0D " +
        "ELSE graft_ln(x) / graft_ln(b) END"),
    // Feldera GREATEST/LEAST return NULL on any NULL argument; the
    // _IGNORE_NULLS forms are Spark's native skip-null semantics
    // greatest/least family: n-ary Catalyst builders below
    // (comparisons.md: GREATEST null-propagates, the _IGNORE_NULLS
    // forms keep Spark's native skip-nulls behavior)
    ("finite_or_null", "x DOUBLE", "DOUBLE",
      "CASE WHEN isnan(x) OR x = double('inf') OR x = double('-inf') THEN NULL ELSE x END"),
    // Feldera spellings of natives (ad-hoc.md:34-35, function-index.md)
    ("timestamp_trunc", "t TIMESTAMP, u STRING", "TIMESTAMP",
      "date_trunc(u, t)"),
    ("time_trunc", "t TIMESTAMP, u STRING", "TIMESTAMP", "date_trunc(u, t)"),
    ("initcap_spaces", "s STRING", "STRING", "initcap(s)"),
    ("xxhash", "s STRING", "BIGINT", "xxhash64(s)"),
    ("gt_date", "a DATE, b DATE", "BOOLEAN", "a > b"),
    ("dow", "d DATE", "INT", "dayofweek(d) - 1"),
    ("doy", "d DATE", "INT", "dayofyear(d)"),
    // int→timestamp interprets MILLIseconds (ad-hoc.md:36-38)
    ("to_timestamp_millis", "x BIGINT", "TIMESTAMP", "timestamp_millis(x)"),
    // TIME tail (types.md:19; crates/sqllib/src/timestamp.rs TIME
    // section). The primary mapping is Spark 4.1's NATIVE TimeType
    // (SqlTypes "TIME"; fn_time grades it) — native make_time/EXTRACT/
    // casts apply there. This BIGINT nanos-of-day tail is the portable
    // fallback for sessions without spark.sql.timeType.enabled, plus the
    // pieces the native type lacks (wrap-around arithmetic, explicit
    // format). format_time renders exactly like an engine-native
    // TIME→VARCHAR cast (zero-padded HH:MM:SS, fractional part trimmed
    // of trailing zeros, omitted when zero) so cross-engine string
    // compares work. No "make_time" here: that name is the native
    // builtin, which wins resolution over a CREATE FUNCTION.
    ("parse_time", "s STRING", "BIGINT",
      "CAST(split(s, ':')[0] AS BIGINT) * 3600000000000 " +
        "+ CAST(split(s, ':')[1] AS BIGINT) * 60000000000 " +
        "+ CAST(CAST(split(s, ':')[2] AS DECIMAL(18,9)) * 1000000000 AS BIGINT)"),
    ("format_time", "t BIGINT", "STRING",
      "concat(lpad(CAST(t div 3600000000000 AS STRING), 2, '0'), ':', " +
        "lpad(CAST((t div 60000000000) % 60 AS STRING), 2, '0'), ':', " +
        "lpad(CAST((t div 1000000000) % 60 AS STRING), 2, '0'), " +
        "CASE WHEN t % 1000000000 = 0 THEN '' ELSE concat('.', " +
        "regexp_replace(lpad(CAST(t % 1000000000 AS STRING), 9, '0'), '0+$', '')) END)"),
    ("hour_time", "t BIGINT", "BIGINT", "t div 3600000000000"),
    ("minute_time", "t BIGINT", "BIGINT", "(t div 60000000000) % 60"),
    ("second_time", "t BIGINT", "BIGINT", "(t div 1000000000) % 60"),
    ("millisecond_time", "t BIGINT", "BIGINT", "(t div 1000000) % 1000"),
    // interval arithmetic wraps mod 24h, like the reference's TIME ops
    ("time_add_seconds", "t BIGINT, s BIGINT", "BIGINT",
      "pmod(t + s * 1000000000, 86400000000000)"),
    ("time_to_timestamp", "d DATE, t BIGINT", "TIMESTAMP",
      "CAST(d AS TIMESTAMP_NTZ) + make_dt_interval(0, 0, 0, " +
        "CAST(t AS DOUBLE) / 1000000000)"),
    // GEOMETRY point tail (crates/sqllib/src/geopoint.rs: MAKE_GEOPOINT,
    // ST_DISTANCE = planar Euclidean distance); GEOMETRY maps to
    // STRUCT<x,y> (SqlTypes "GEOMETRY")
    ("make_geopoint", "x DOUBLE, y DOUBLE", "STRUCT<x: DOUBLE, y: DOUBLE>",
      "named_struct('x', x, 'y', y)"),
    ("st_x", "p STRUCT<x: DOUBLE, y: DOUBLE>", "DOUBLE", "p.x"),
    ("st_y", "p STRUCT<x: DOUBLE, y: DOUBLE>", "DOUBLE", "p.y"),
    ("st_distance", "a STRUCT<x: DOUBLE, y: DOUBLE>, " +
      "b STRUCT<x: DOUBLE, y: DOUBLE>", "DOUBLE",
      "sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))"),
    // array tail
    ("array_length", "a ARRAY<STRING>", "INT", "size(a)"),
    // reference spellings of natives (array.md:96,112); Spark's concat
    // is already NULL on any NULL argument, matching ARRAY_CONCAT's rule
    ("array_concat", "a ARRAY<STRING>, b ARRAY<STRING>", "ARRAY<STRING>",
      "concat(a, b)"),
    ("array_reverse", "a ARRAY<STRING>", "ARRAY<STRING>", "reverse(a)"),
    ("element", "a ARRAY<STRING>", "STRING",
      "CASE WHEN size(a) = 1 THEN a[0] WHEN size(a) = 0 THEN NULL " +
        "ELSE raise_error('ELEMENT() of array with more than one element') END"),
    ("safe_offset", "a ARRAY<STRING>, i INT", "STRING",
      "try_element_at(a, i + 1)"),
    // SPLIT(string[, delimiter]) — LITERAL delimiter (string.md:216-221:
    // empty delimiter → [string]; empty string → []; NULL → NULL;
    // default delimiter ','). Spark's builtin split is regex-based, so
    // the Dialect routes the reference spelling here; \\Q..\\E quoting
    // makes the native (codegen'd) split treat the delimiter literally
    // empty-delimiter wins over empty-string (the corpus records
    // split('','') as [''])
    ("split_f", "s STRING, d STRING", "ARRAY<STRING>",
      "CASE WHEN s IS NULL OR d IS NULL THEN NULL " +
        "WHEN d = '' THEN array(s) " +
        "WHEN s = '' THEN array() " +
        // an embedded \E would end the quoting early — re-open it the
        // way java.util.regex.Pattern.quote does (\E → \E\\E\Q)
        """ELSE split(s, concat('\\Q', """ +
        """replace(d, '\\E', '\\E\\\\E\\Q'), '\\E'), -1) END"""),
    ("split_f1", "s STRING", "ARRAY<STRING>", "split_f(s, ',')"),
    // ARRAY_TO_STRING (array.md:115): NULL elements omitted unless the
    // null_string form names a replacement; NULL delimiter → NULL
    ("array_to_string", "a ARRAY<STRING>, d STRING", "STRING",
      "array_join(a, d)"),
    ("array_to_string3", "a ARRAY<STRING>, d STRING, n STRING", "STRING",
      "CASE WHEN n IS NULL THEN array_join(a, d) " +
        "ELSE array_join(a, d, n) END"),
    // string tail. SPLIT_PART(s, d, 0) is '' in the reference
    // (string.md:224-239 — any out-of-range n is ''), where Spark's
    // native split_part raises INVALID_INDEX_OF_ZERO
    ("split_part_f", "s STRING, d STRING, n INT", "STRING",
      "CASE WHEN n = 0 THEN '' ELSE split_part(s, d, n) END"),
    // binary.rs:361 TO_HEX — lowercase (encode_hex)
    ("to_hex", "b BINARY", "STRING", "lower(hex(b))"),
    // 2-argument REGEXP_REPLACE removes matches (string.md)
    ("graft_regexp_remove", "s STRING, p STRING", "STRING",
      "regexp_replace(s, p, '')"),
    ("bin2utf8", "b BINARY", "STRING", "decode(b, 'UTF-8')"),
    ("utf82bin", "s STRING", "BINARY", "encode(s, 'UTF-8')"),
    // VARIANT tail SQL spellings (variant.rs; json.md:78-510). Lambda-taking
    // functions (VARIANT_FILTER/MAP/MERGE…) live in graft.functions.Variants
    // — SQL can't pass lambdas through a function boundary; the JSON_EACH
    // family and VARIANTNULL have no such parameter, so they register here.
    ("variantnull", "", "VARIANT", "parse_json('null')"),
    ("json_each_bigint", "v VARIANT", "MAP<STRING,BIGINT>",
      "transform_values(map_filter(try_cast(v AS MAP<STRING,VARIANT>), " +
        "(k, x) -> schema_of_variant(x) = 'BIGINT'), " +
        "(k, x) -> cast(x AS BIGINT))"),
    ("json_each_string", "v VARIANT", "MAP<STRING,STRING>",
      "transform_values(map_filter(try_cast(v AS MAP<STRING,VARIANT>), " +
        "(k, x) -> schema_of_variant(x) = 'STRING'), " +
        "(k, x) -> cast(x AS STRING))"),
    ("json_each_boolean", "v VARIANT", "MAP<STRING,BOOLEAN>",
      "transform_values(map_filter(try_cast(v AS MAP<STRING,VARIANT>), " +
        "(k, x) -> schema_of_variant(x) = 'BOOLEAN'), " +
        "(k, x) -> cast(x AS BOOLEAN))"),
    ("json_each_date", "v VARIANT", "MAP<STRING,DATE>",
      "transform_values(map_filter(try_cast(v AS MAP<STRING,VARIANT>), " +
        "(k, x) -> (CASE WHEN schema_of_variant(x) = 'DATE' THEN try_cast(x AS DATE) " +
        "WHEN schema_of_variant(x) = 'STRING' THEN try_cast(try_cast(x AS STRING) AS DATE) END) IS NOT NULL), " +
        "(k, x) -> CASE WHEN schema_of_variant(x) = 'DATE' THEN try_cast(x AS DATE) " +
        "ELSE try_cast(try_cast(x AS STRING) AS DATE) END)"),
    ("json_each_timestamp", "v VARIANT", "MAP<STRING,TIMESTAMP>",
      "transform_values(map_filter(try_cast(v AS MAP<STRING,VARIANT>), " +
        "(k, x) -> (CASE WHEN schema_of_variant(x) LIKE 'TIMESTAMP%' THEN try_cast(x AS TIMESTAMP) " +
        "WHEN schema_of_variant(x) = 'STRING' THEN try_cast(try_cast(x AS STRING) AS TIMESTAMP) END) IS NOT NULL), " +
        "(k, x) -> CASE WHEN schema_of_variant(x) LIKE 'TIMESTAMP%' THEN try_cast(x AS TIMESTAMP) " +
        "ELSE try_cast(try_cast(x AS STRING) AS TIMESTAMP) END)"))

  def registerSql(spark: SparkSession): Unit =
    sqlFunctions.foreach { case (name, params, ret, body) =>
      // newer Spark versions promote some of these to builtins (e.g. sec);
      // the native implementation wins when present
      if (!spark.catalog.functionExists(name))
        spark.sql(
          s"CREATE OR REPLACE TEMPORARY FUNCTION $name($params) RETURNS $ret RETURN $body")
    }

  /** BIT_AND/BIT_OR/BIT_XOR over BINARY (aggregates.md:62-72 — "integer
    * and binary types are supported"; bytewise fold, equal lengths
    * required, sqllib/src/binary.rs ByteArray::and/or/xor). Spark's
    * builtin bit aggs are integral-only and SQL has no type-directed
    * overload dispatch, so the binary forms register under explicit
    * `_binary` spellings.
    */
  private def binaryBitAgg(op: (Byte, Byte) => Byte) =
    new org.apache.spark.sql.expressions.Aggregator[
      Array[Byte], Array[Byte], Array[Byte]] {
      override def zero: Array[Byte] = null
      override def reduce(acc: Array[Byte], x: Array[Byte]): Array[Byte] =
        merge(acc, x)
      override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
        if (b == null) return a
        if (a == null) return b.clone()
        require(a.length == b.length,
          s"binary bit aggregate over unequal lengths: " +
            s"${a.length} vs ${b.length}")
        val out = new Array[Byte](a.length)
        var i = 0
        while (i < a.length) { out(i) = op(a(i), b(i)); i += 1 }
        out
      }
      override def finish(r: Array[Byte]): Array[Byte] = r
      override def bufferEncoder = org.apache.spark.sql.Encoders.BINARY
      override def outputEncoder = org.apache.spark.sql.Encoders.BINARY
    }

  /** Procedural tail: GUNZIP (string.md), UUID casts (uuid.md). */
  def registerUdfs(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udaf
    spark.udf.register("bit_and_binary",
      udaf(binaryBitAgg((a, b) => (a & b).toByte)))
    spark.udf.register("bit_or_binary",
      udaf(binaryBitAgg((a, b) => (a | b).toByte)))
    spark.udf.register("bit_xor_binary",
      udaf(binaryBitAgg((a, b) => (a ^ b).toByte)))
    // type-directed BIT_AND/OR/XOR dispatch (aggregates.md:62-72 —
    // the reference overloads them over BINARY): function builders
    // run with RESOLVED children, so the argument type picks Spark's
    // integral aggregate or the bytewise Aggregator above
    locally {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
      import org.apache.spark.sql.catalyst.expressions.Expression
      import org.apache.spark.sql.catalyst.expressions.aggregate.{BitAndAgg, BitOrAgg, BitXorAgg}
      val reg = spark
        .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      def dispatch(name: String,
          integral: Expression => Expression): Unit =
        reg.createOrReplaceTempFunction(name, (args: Seq[Expression]) =>
          if (args.head.resolved &&
            args.head.dataType ==
              org.apache.spark.sql.types.BinaryType)
            UnresolvedFunction(Seq(name + "_binary"), args,
              isDistinct = false)
          else integral(args.head), "built-in")
      dispatch("bit_and", BitAndAgg(_))
      dispatch("bit_or", BitOrAgg(_))
      dispatch("bit_xor", BitXorAgg(_))
      // ARG_MIN/ARG_MAX (aggregates.md) = Spark's min_by/max_by —
      // registered as builders so any value/compared types work
      reg.createOrReplaceTempFunction("arg_min",
        (args: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions.aggregate
            .MinBy(args(0), args(1)), "built-in")
      reg.createOrReplaceTempFunction("arg_max",
        (args: Seq[Expression]) =>
          org.apache.spark.sql.catalyst.expressions.aggregate
            .MaxBy(args(0), args(1)), "built-in")
      // scalar TUMBLE/TUMBLE_START (Calcite's legacy GROUP BY form) —
      // Dialect.rewriteScalarTumble lowers to this with ms literals
      reg.createOrReplaceTempFunction("graft_tumble",
        (args: Seq[Expression]) =>
          org.apache.spark.sql.graft.GraftTumble(args(0), args(1),
            args(2)), "built-in")
      // 1-based subscript with the reference's contract (array.md):
      // array/map → try_element_at (NULL out of bounds); ROW values →
      // ORDINAL field access (Calcite `row[2]` is the 2nd field)
      reg.createOrReplaceTempFunction("graft_subscript",
        (args: Seq[Expression]) => {
          import org.apache.spark.sql.catalyst.expressions.{GetStructField, TryElementAt}
          val struct = args.head.resolved &&
            args.head.dataType
              .isInstanceOf[org.apache.spark.sql.types.StructType]
          if (struct && args(1).foldable) {
            val i = args(1).eval(null) match {
              case n: Number => n.intValue()
              case other => sys.error(s"ROW ordinal must be a number: $other")
            }
            GetStructField(args.head, i - 1)
          } else UnresolvedFunction(Seq("try_element_at"), args,
            isDistinct = false)
        }, "built-in")
      // sorted array set-ops (array.md: "sorted in ascending order",
      // NULLs first per the recorded fixtures) — dialect-path spellings
      Seq("except", "intersect", "union").foreach { op =>
        reg.createOrReplaceTempFunction(s"graft_array_$op",
          (args: Seq[Expression]) => UnresolvedFunction(
            Seq("sort_array"),
            Seq(UnresolvedFunction(Seq(s"array_$op"), args,
              isDistinct = false),
              org.apache.spark.sql.catalyst.expressions.Literal(true)),
            isDistinct = false), "built-in")
      }
      // GREATEST/LEAST null-propagate in the reference (comparisons.md:
      // "if any argument is NULL, the result is NULL") — the DIALECT
      // path respells them onto these builders, so library SQL and the
      // DuckDB-aligned fuzz batteries keep Spark's skip-nulls natives;
      // the _IGNORE_NULLS spellings are those natives, n-ary
      locally {
        import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Greatest, IsNull, Least, Literal}
        def nullProp(mk: Seq[Expression] => Expression)(
            args: Seq[Expression]): Expression =
          if (args.size <= 1) mk(args)
          else CaseWhen(
            Seq((args.map(IsNull(_): Expression)
              .reduce(org.apache.spark.sql.catalyst.expressions.Or),
              Literal.create(null, org.apache.spark.sql.types.NullType))),
            Some(mk(args)))
        reg.createOrReplaceTempFunction("graft_greatest",
          nullProp(Greatest) _, "built-in")
        reg.createOrReplaceTempFunction("graft_least",
          nullProp(Least) _, "built-in")
        reg.createOrReplaceTempFunction("greatest_ignore_nulls",
          (args: Seq[Expression]) => Greatest(args), "built-in")
        reg.createOrReplaceTempFunction("least_ignore_nulls",
          (args: Seq[Expression]) => Least(args), "built-in")
      }
      // CAST(x AS UUID) — type-directed: 16 raw bytes decode to the
      // canonical dashed form, strings lowercase (uuid.md; the UUID
      // type maps to STRING, SqlTypes:66)
      reg.createOrReplaceTempFunction("graft_to_uuid",
        (args: Seq[Expression]) =>
          if (args.head.resolved && args.head.dataType ==
            org.apache.spark.sql.types.BinaryType)
            UnresolvedFunction(Seq("uuid_from_binary"), args,
              isDistinct = false)
          else org.apache.spark.sql.catalyst.expressions.Lower(
            org.apache.spark.sql.catalyst.expressions.Cast(args.head,
              org.apache.spark.sql.types.StringType)),
        "built-in")
    }
    spark.udf.register("gunzip", (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      })
    spark.udf.register("uuid_from_binary", (bytes: Array[Byte]) =>
      if (bytes == null || bytes.length != 16) null
      else {
        val bb = java.nio.ByteBuffer.wrap(bytes)
        new java.util.UUID(bb.getLong, bb.getLong).toString
      })
    spark.udf.register("uuid_to_binary", (s: String) =>
      if (s == null) null
      else {
        val u = java.util.UUID.fromString(s)
        val bb = java.nio.ByteBuffer.allocate(16)
        bb.putLong(u.getMostSignificantBits)
        bb.putLong(u.getLeastSignificantBits)
        bb.array()
      })
    // chrono/strftime surface (datetime.md:460-560): the %-pattern
    // formatters under their reference spellings. The Scala helpers work
    // over the ISO string rendering (CAST bridges the SQL types), so one
    // implementation serves DATE/TIMESTAMP/TIME; a string that fails to
    // match the format parses to NULL, while a format that cannot
    // resolve the required fields raises (datetime.md:475-485).
    spark.udf.register("__strftime",
      (fmt: String, iso: String) => Strftime.format(fmt, iso))
    spark.udf.register("__strptime_date",
      (fmt: String, s: String) => Strftime.parseDate(fmt, s))
    spark.udf.register("__strptime_ts",
      (fmt: String, s: String) => Strftime.parseTimestamp(fmt, s))
    spark.udf.register("__strptime_time",
      (fmt: String, s: String) => Strftime.parseTime(fmt, s))
    def fn(ddl: String): Unit =
      spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION " + ddl)
    fn("format_date(f STRING, d DATE) RETURNS STRING " +
      "RETURN __strftime(f, CAST(d AS STRING))")
    fn("format_timestamp(f STRING, t TIMESTAMP) RETURNS STRING " +
      "RETURN __strftime(f, CAST(t AS STRING))")
    fn("parse_date(f STRING, s STRING) RETURNS DATE " +
      "RETURN CAST(__strptime_date(f, s) AS DATE)")
    fn("parse_timestamp(f STRING, s STRING) RETURNS TIMESTAMP " +
      "RETURN CAST(__strptime_ts(f, s) AS TIMESTAMP)")
    // the TIME pair needs Spark 4.1's native TimeType flag — the same
    // contract Pipeline runs under; enable before registering
    spark.conf.set("spark.sql.timeType.enabled", "true")
    fn("format_time(f STRING, t TIME) RETURNS STRING " +
      "RETURN __strftime(f, CAST(t AS STRING))")
    fn("parse_time(f STRING, s STRING) RETURNS TIME " +
      "RETURN CAST(__strptime_time(f, s) AS TIME)")
    // JSON_EACH_TIME completes the json_each family (json.md:208,229-234:
    // TIME values and strings that parse as SQL TIME literals; JSON has
    // no time type so the string-parse arm is the productive one) — it
    // registers here, not with its siblings, because MAP<STRING,TIME>
    // needs the TimeType flag just enabled above
    fn("json_each_time(v VARIANT) RETURNS MAP<STRING,TIME> RETURN " +
      "transform_values(map_filter(try_cast(v AS MAP<STRING,VARIANT>), " +
      "(k, x) -> try_cast(try_cast(x AS STRING) AS TIME) IS NOT NULL), " +
      "(k, x) -> try_cast(try_cast(x AS STRING) AS TIME))")
  }

  def registerAll(spark: SparkSession): Unit = {
    // before registerSql: CreateSQLFunctionCommand eagerly resolves
    // referenced functions (graft_log2's body calls graft_ln)
    org.apache.spark.sql.graft.GraftMathFns.register(spark)
    org.apache.spark.sql.graft.BinaryFns.register(spark)
    registerSql(spark)
    registerUdfs(spark)
    // debug helpers: BLACKBOX (optimizer barrier), WRITELOG (per-row tap)
    org.apache.spark.sql.graft.DebugFns.register(spark)
    // the ad-hoc json_get path-getter family (ad-hoc.md)
    org.apache.spark.sql.graft.JsonGetFns.register(spark)
    // constant-pattern FORMAT_* → native date_format optimizer rule
    org.apache.spark.sql.graft.StrftimeFastPath.register(spark)
    // type-preserving DATE_TRUNC with the reference's unit set
    org.apache.spark.sql.graft.DateTruncExpr.register(spark)
    org.apache.spark.sql.graft.GraftFloatRender.register(spark)
  }

  /** Generic (any element type) Column forms of the array tail — the SQL
    * registrations above are necessarily monomorphic (a SQL-bodied
    * function needs concrete parameter types); library users get the
    * full-generic contract here.
    */
  object arrays {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._

    def arrayLength(a: Column): Column = size(a)

    /** Single element of a 0/1-element array; errors on more (array.md
      * ELEMENT).
      */
    def element(a: Column): Column =
      when(size(a) === 1, a.getItem(0))
        .when(size(a) === 0, lit(null))
        .otherwise(raise_error(
          lit("ELEMENT() of array with more than one element")))

    /** 0-based SAFE_OFFSET: null out of range. */
    def safeOffset(a: Column, i: Column): Column = try_element_at(a, i + 1)

    /** ARRAY_CONCAT / ARRAY_REVERSE (array.md:96,112) — Spark's natives
      * already carry the NULL-on-any-NULL-argument rule.
      */
    def arrayConcat(arrs: Column*): Column = concat(arrs: _*)
    def arrayReverse(a: Column): Column = reverse(a)

    /** Feldera ARRAY_EXCEPT/INTERSECT: deduplicated AND ascending
      * (array.md:100-103) — Spark's natives keep left order.
      */
    def arrayExcept(l: Column, r: Column): Column =
      array_sort(array_except(l, r))
    def arrayIntersect(l: Column, r: Column): Column =
      array_sort(array_intersect(l, r))
  }
}
