package graft.queries

import org.apache.spark.sql.functions._
import QB._

/** Scalar function library coverage (SURVEY §2.8; reference crates/sqllib/
  * — string.rs, float.rs, timestamp.rs, array.rs, variant.rs, casts.rs).
  * All expressions are native Catalyst functions (codegen'd, no UDFs) so
  * they stay inside WholeStageCodegen at scale.
  *
  * Transcendental functions (ln/exp/trig) are rounded to 6 decimals: JVM
  * and DuckDB libm may differ in the last ulp; everything else is exact.
  */
object Functions {

  val queries: Seq[Q] = Seq(
    Q(
      "fn_string",
      """SELECT p_partkey,
        |  UPPER(p_name) AS up, LOWER(p_brand) AS lo,
        |  LENGTH(p_name) AS len,
        |  SUBSTR(p_name, 3, 8) AS sub,
        |  STRPOS(p_name, 'a') AS pos_a,
        |  SPLIT_PART(p_type, ' ', 1) AS type_head,
        |  CONCAT(p_brand, '#', p_type) AS tagged,
        |  CONCAT_WS('/', p_brand, p_type) AS joined,
        |  REPLACE(p_name, ' ', '_') AS snake,
        |  TRANSLATE(p_name, 'aeiou', '-----') AS devowel,
        |  REVERSE(p_brand) AS rev,
        |  TRIM(CONCAT('  ', p_brand, ' ')) AS trimmed,
        |  LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  RPAD(p_brand, 12, '.') AS brand_pad,
        |  LEFT(p_name, 5) AS l5, RIGHT(p_name, 5) AS r5,
        |  REPEAT(p_brand, 2) AS twice,
        |  ASCII(p_brand) AS first_code,
        |  MD5(p_name) AS name_md5,
        |  SHA256(p_name) AS name_sha,
        |  LEVENSHTEIN(p_brand, 'Brand#11') AS lev,
        |  CONTAINS(p_name, 'al') AS has_al,
        |  STARTS_WITH(p_type, 'S') AS is_s,
        |  ENDS_WITH(p_type, 'D') AS ends_d,
        |  (p_name LIKE '%press%') AS is_press,
        |  REGEXP_EXTRACT(p_brand, '[0-9]+') AS brand_num,
        |  REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS consonants,
        |  PRINTF('%06d', p_partkey) AS key_pad
        |FROM part""".stripMargin) { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 3, 8).as("sub"),
        instr(col("p_name"), "a").cast("long").as("pos_a"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("tagged"),
        concat_ws("/", col("p_brand"), col("p_type")).as("joined"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        translate(col("p_name"), "aeiou", "-----").as("devowel"),
        reverse(col("p_brand")).as("rev"),
        trim(concat(lit("  "), col("p_brand"), lit(" "))).as("trimmed"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        rpad(col("p_brand"), 12, ".").as("brand_pad"),
        substring(col("p_name"), 1, 5).as("l5"),
        expr("right(p_name, 5)").as("r5"),
        repeat(col("p_brand"), 2).as("twice"),
        ascii(col("p_brand")).as("first_code"),
        md5(col("p_name")).as("name_md5"),
        sha2(col("p_name"), 256).as("name_sha"),
        levenshtein(col("p_brand"), lit("Brand#11")).cast("long").as("lev"),
        col("p_name").contains("al").as("has_al"),
        col("p_type").startsWith("S").as("is_s"),
        col("p_type").endsWith("D").as("ends_d"),
        col("p_name").like("%press%").as("is_press"),
        regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("consonants"),
        format_string("%06d", col("p_partkey")).as("key_pad"))
    },

    Q(
      "fn_math",
      """SELECT l_orderkey, l_linenumber,
        |  ABS(l_quantity - 25) AS dist25,
        |  CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        |  CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        |  MOD(CAST(l_quantity AS BIGINT), 7) AS qmod,
        |  CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
        |  ROUND(SQRT(l_quantity), 6) AS qsqrt,
        |  ROUND(LN(l_quantity), 6) AS qln,
        |  ROUND(LOG10(l_extendedprice), 6) AS plog,
        |  ROUND(EXP(l_discount), 6) AS dexp,
        |  ROUND(POW(l_quantity, 2), 6) AS qsq,
        |  ROUND(SIN(l_quantity), 6) AS qsin,
        |  ROUND(COS(l_quantity), 6) AS qcos,
        |  ROUND(ATAN2(l_quantity, 10), 6) AS qatan2,
        |  ROUND(DEGREES(ATAN(l_discount)), 6) AS ddeg,
        |  ROUND(RADIANS(l_quantity), 6) AS qrad,
        |  ROUND(CBRT(l_quantity), 6) AS qcbrt,
        |  GREATEST(l_tax, l_discount) AS max_rate,
        |  ROUND(PI(), 6) AS pi6
        |FROM lineitem WHERE l_orderkey <= 12000""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 12000).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("dist25"),
        ceil(col("l_extendedprice") / 1000).as("price_k_ceil"),
        floor(col("l_extendedprice") / 1000).as("price_k_floor"),
        (col("l_quantity").cast("long") % 7).as("qmod"),
        signum(col("l_discount") - 0.05).as("disc_sign"),
        round(sqrt(col("l_quantity")), 6).as("qsqrt"),
        round(log(col("l_quantity")), 6).as("qln"),
        round(log10(col("l_extendedprice")), 6).as("plog"),
        round(exp(col("l_discount")), 6).as("dexp"),
        round(pow(col("l_quantity"), 2), 6).as("qsq"),
        round(sin(col("l_quantity")), 6).as("qsin"),
        round(cos(col("l_quantity")), 6).as("qcos"),
        round(atan2(col("l_quantity"), lit(10d)), 6).as("qatan2"),
        round(degrees(atan(col("l_discount"))), 6).as("ddeg"),
        round(radians(col("l_quantity")), 6).as("qrad"),
        round(cbrt(col("l_quantity")), 6).as("qcbrt"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        round(lit(math.Pi), 6).as("pi6"))
    },

    Q(
      "fn_datetime",
      """SELECT o_orderkey,
        |  CAST(YEAR(o_orderdate) AS INT) AS y,
        |  CAST(QUARTER(o_orderdate) AS INT) AS q,
        |  CAST(MONTH(o_orderdate) AS INT) AS m,
        |  CAST(DAY(o_orderdate) AS INT) AS d,
        |  CAST(WEEKOFYEAR(o_orderdate) AS INT) AS woy,
        |  CAST(ISODOW(o_orderdate) AS INT) AS idow,
        |  CAST(HOUR(o_orderdate) AS INT) AS h,
        |  LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS epoch_s,
        |  STRFTIME(o_orderdate, '%Y-%m') AS ym,
        |  MAKE_DATE(CAST(YEAR(o_orderdate) AS INT), 1, 1) AS year_start,
        |  CAST(MAKE_TIMESTAMP(2024, 3, 1, 12, 0, 0) AS DATE) AS fixed_ts_d
        |FROM orders""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        weekofyear(col("o_orderdate")).as("woy"),
        (weekday(col("o_orderdate")) + 1).as("idow"),
        hour(col("o_orderdate")).as("h"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        date_trunc("month", col("o_orderdate")).cast("date")
          .as("month_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01"))
          .cast("long").as("days_since"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        make_date(year(col("o_orderdate")), lit(1), lit(1)).as("year_start"),
        expr("make_timestamp(2024, 3, 1, 12, 0, 0)").cast("date")
          .as("fixed_ts_d"))
    },

    // Array columns are serialized to joined strings: the driver's pandas
    // compare cannot hash ndarray cells. The array ops themselves still run
    // inside both engines; only the output representation is scalar.
    Q(
      "fn_array",
      """SELECT p_partkey,
        |  len(words) AS n_words,
        |  list_contains(words, 'spring') AS has_spring,
        |  CAST(list_position(words, 'green') AS BIGINT) AS pos_green,
        |  array_to_string(list_sort(list_distinct(words)), '|') AS uniq_sorted,
        |  array_to_string(words, '|') AS joined,
        |  words[1] AS head,
        |  array_to_string(words[2:3], '|') AS mid,
        |  array_to_string(list_transform(range(1, (p_size % 5) + 2), x -> CAST(x * 10 AS VARCHAR)), ',') AS tens,
        |  array_to_string(list_transform(list_filter(range(1, 7), x -> x % 2 = 0), x -> CAST(x AS VARCHAR)), ',') AS evens,
        |  CAST(list_reduce(range(1, (p_size % 5) + 2), (a, b) -> a + b) AS BIGINT) AS tri
        |FROM (SELECT p_partkey, p_size, string_split(p_name, ' ') AS words FROM part)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"), col("p_size"),
            split(col("p_name"), " ").as("words"))
          .select(
            col("p_partkey"),
            size(col("words")).cast("long").as("n_words"),
            array_contains(col("words"), "spring").as("has_spring"),
            array_position(col("words"), "green").as("pos_green"),
            array_join(sort_array(array_distinct(col("words"))), "|")
              .as("uniq_sorted"),
            array_join(col("words"), "|").as("joined"),
            element_at(col("words"), 1).as("head"),
            array_join(slice(col("words"), 2, 2), "|").as("mid"),
            array_join(transform(sequence(lit(1), (col("p_size") % 5) + 1),
              x => (x * 10).cast("string")), ",").as("tens"),
            array_join(transform(
              filter(sequence(lit(1), lit(6)), x => x % 2 === 0),
              x => x.cast("string")), ",").as("evens"),
            aggregate(sequence(lit(1), (col("p_size") % 5) + 1), lit(0L),
              (a, x) => a + x).as("tri"))
    },

    // JSON / VARIANT (reference: sqllib/src/variant.rs; SURVEY maps VARIANT
    // → Spark 4 VariantType). Exercises both the string-path extract and a
    // true variant round-trip (parse_json → variant_get).
    Q(
      "fn_json",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract(props, '$.k') AS INTEGER) * 2 AS k_doubled,
        |  json_valid(props) AS ok
        |FROM events WHERE event_id < 2000""".stripMargin) { (s, dir) =>
      t(s, dir, "events").filter(col("event_id") < 2000).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        try_variant_get(parse_json(col("props")), "$.k", "int").as("k_int"),
        (try_variant_get(parse_json(col("props")), "$.k", "int") * 2)
          .as("k_doubled"),
        get_json_object(col("props"), "$.k").isNotNull.as("ok"))
    },

    // The ad-hoc json_get path-getter family (ad-hoc.md:160-215, the
    // datafusion-functions-json surface) — registered by JsonGetFns as
    // pure variant_get compositions; the oracle re-derives each getter
    // with DuckDB's json_extract family on the same documents.
    Q(
      "fn_json_get",
      """WITH d(id, doc) AS (VALUES
        |  (1, '{"name":"Bob","scores":[8,10],"active":true,"meta":{"x":1.5}}'),
        |  (2, '{"name":"Ann","scores":[3],"active":false,"meta":{"x":2.5}}'),
        |  (3, '{"name":null,"scores":[],"active":true}'))
        |SELECT id,
        |  json_extract_string(doc, '$.name') AS nm,
        |  CAST(json_extract(doc, '$.scores[0]') AS BIGINT) AS s0,
        |  CAST(json_extract(doc, '$.meta.x') AS DOUBLE) AS mx,
        |  CAST(json_extract(doc, '$.active') AS BOOLEAN) AS act,
        |  CAST(json_extract(doc, '$.scores') AS VARCHAR) AS sraw,
        |  json_extract(doc, '$.meta') IS NOT NULL AS hasmeta,
        |  CAST(json_array_length(doc, '$.scores') AS BIGINT) AS slen,
        |  list_aggregate(list_sort(json_keys(doc)), 'string_agg', ',')
        |    AS okeys
        |FROM d""".stripMargin) { (s, _) =>
      graft.functions.Registry.registerAll(s)
      s.sql("""
        WITH d AS (SELECT * FROM VALUES
          (1, '{"name":"Bob","scores":[8,10],"active":true,"meta":{"x":1.5}}'),
          (2, '{"name":"Ann","scores":[3],"active":false,"meta":{"x":2.5}}'),
          (3, '{"name":null,"scores":[],"active":true}') AS v(id, doc))
        SELECT id,
          json_get_str(doc, 'name') AS nm,
          json_get_int(doc, 'scores', 0) AS s0,
          json_get_float(doc, 'meta', 'x') AS mx,
          json_get_bool(doc, 'active') AS act,
          json_get_json(doc, 'scores') AS sraw,
          json_contains(doc, 'meta') AS hasmeta,
          json_length(doc, 'scores') AS slen,
          array_join(array_sort(json_object_keys(doc)), ',') AS okeys
        FROM d""")
    },

    // UUID surface (uuid.md; types/SqlTypes UUID = canonical string,
    // functions/Registry uuid_from_binary): deterministic UUIDs derived
    // from md5 bytes; DuckDB formats the same 16 bytes by hand.
    Q(
      "fn_uuid",
      """SELECT p_partkey,
        |  lower(concat(substr(md5(p_name), 1, 8), '-',
        |    substr(md5(p_name), 9, 4), '-', substr(md5(p_name), 13, 4), '-',
        |    substr(md5(p_name), 17, 4), '-', substr(md5(p_name), 21, 12))) AS u,
        |  length(md5(p_name)) AS ulen
        |FROM part WHERE p_partkey < 1000""".stripMargin) { (s, dir) =>
      graft.functions.Registry.registerAll(s)
      t(s, dir, "part").filter(col("p_partkey") < 1000).select(
        col("p_partkey"),
        call_udf("uuid_from_binary", unhex(md5(col("p_name")))).as("u"),
        length(md5(col("p_name"))).cast("long").as("ulen"))
    },

    // Function-index completeness tail (function-index.md): TO_HEX,
    // OVERLAY, ARRAY_INSERT/REPEAT/EXCEPT/INTERSECT (Feldera's EXCEPT/
    // INTERSECT are deduped AND sorted — array.md:100-103 — hence the
    // array_sort wrappers), MAKE_TIMESTAMP, CONVERT_TIMEZONE. DuckDB
    // lacks OVERLAY/ARRAY_* spellings, so the oracle states the same
    // semantics through substr/list primitives.
    Q(
      "fn_tail",
      """SELECT p_partkey,
        |  lower(hex(encode(p_brand))) AS hexed,
        |  substr(p_name, 1, 2) || 'XY' || substr(p_name, 3 + 4) AS overlaid,
        |  array_to_string(list_sort(list_distinct(list_filter(
        |    [p_partkey, p_partkey % 7, p_partkey % 3, p_partkey % 7],
        |    x -> NOT list_contains([p_partkey % 3, 99], x)))), ',') AS exc,
        |  array_to_string(list_sort(list_distinct(list_filter(
        |    [p_partkey, p_partkey % 7, p_partkey % 3, p_partkey % 7],
        |    x -> list_contains([p_partkey % 3, 99], x)))), ',') AS inter,
        |  array_to_string([p_partkey, p_partkey % 7][1:1] || [p_partkey % 5]
        |    || [p_partkey, p_partkey % 7][2:], ',') AS inserted,
        |  array_to_string(list_transform(range(3), x -> p_partkey % 9), ',') AS repeated,
        |  CAST(make_timestamp(2024, 1 + p_partkey % 12, 1 + p_partkey % 28,
        |    CAST(p_partkey % 24 AS INT), CAST(p_partkey % 60 AS INT), 0) AS VARCHAR) AS made_ts,
        |  CAST((TIMESTAMP '2008-03-05 12:25:29' AT TIME ZONE 'America/New_York')
        |    AT TIME ZONE 'America/Los_Angeles' AS VARCHAR) AS converted
        |FROM part WHERE p_partkey >= 3 AND p_partkey < 500""".stripMargin) { (s, dir) =>
      val arr = array(col("p_partkey"), col("p_partkey") % 7,
        col("p_partkey") % 3, col("p_partkey") % 7)
      val other = array(col("p_partkey") % 3, lit(99L))
      // p_partkey >= 3 keeps every array column non-empty: an empty
      // array_to_string cell round-trips as NaN on the pandas side and
      // breaks the row sort alignment
      t(s, dir, "part")
        .filter(col("p_partkey") >= 3 && col("p_partkey") < 500).select(
        col("p_partkey"),
        lower(hex(col("p_brand").cast("binary"))).as("hexed"),
        overlay(col("p_name"), lit("XY"), lit(3), lit(4)).as("overlaid"),
        array_sort(array_except(arr, other)).as("exc"),
        array_sort(array_intersect(arr, other)).as("inter"),
        array_insert(array(col("p_partkey"), col("p_partkey") % 7),
          lit(2), col("p_partkey") % 5).as("inserted"),
        array_repeat(col("p_partkey") % 9, 3).as("repeated"),
        make_timestamp_ntz(lit(2024), lit(1) + col("p_partkey") % 12,
          lit(1) + col("p_partkey") % 28, col("p_partkey") % 24,
          col("p_partkey") % 60, lit(0)).cast("string").as("made_ts"),
        convert_timezone(lit("America/New_York"),
          lit("America/Los_Angeles"),
          lit("2008-03-05 12:25:29").cast("timestamp_ntz"))
          .cast("string").as("converted"))
        .withColumn("exc", concat_ws(",", col("exc")))
        .withColumn("inter", concat_ws(",", col("inter")))
        .withColumn("inserted", concat_ws(",", col("inserted")))
        .withColumn("repeated", concat_ws(",", col("repeated")))
    },

    // Debug helpers (operators.rs blackbox, string.rs writelog): both are
    // value-level identities — the oracle is the plain projection; the
    // point graded here is that the barrier and the tap do not change
    // results (their side effects are on optimization and logging)
    Q(
      "fn_debug",
      """SELECT n_nationkey AS k, n_nationkey * 2 AS dbl, n_name AS nm
        |FROM nation""".stripMargin) { (s, dir) =>
      graft.functions.Registry.registerAll(s)
      t(s, dir, "nation").createOrReplaceTempView("nation")
      s.sql("""SELECT blackbox(n_nationkey) AS k,
              |  writelog('', n_nationkey * 2) AS dbl,
              |  blackbox(n_name) AS nm FROM nation""".stripMargin)
    },

    // Function-index completeness tail 2 (function-index.md): inverse/
    // hyperbolic trig (ACOS/ASIN/TAN/TANH/ASINH/ACOSH/ATANH), BROUND
    // (banker's rounding — ties exact here because l_quantity is
    // integer-valued so q/2 is exactly representable), POWER, TRUNC
    // (numeric, toward zero), SAFE_CAST→try_cast, IS_INF/IS_NAN,
    // GREATEST/LEAST_IGNORE_NULLS, CHR, CHAR_LENGTH, ILIKE, IFNULL,
    // DATE_PART('week'). DuckDB lacks tanh/asinh/acosh/atanh — the oracle
    // states the defining exp/ln identities; both sides round to 6.
    Q(
      "fn_math2",
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(ACOS(l_discount), 6) AS v_acos,
        |  ROUND(ASIN(l_discount), 6) AS v_asin,
        |  ROUND(TAN(l_discount), 6) AS v_tan,
        |  ROUND((EXP(2 * l_discount) - 1) / (EXP(2 * l_discount) + 1), 6) AS v_tanh,
        |  ROUND(LN(1.0 + l_quantity + SQRT((1.0 + l_quantity) * (1.0 + l_quantity) - 1)), 6) AS v_acosh,
        |  ROUND(LN(l_quantity + SQRT(l_quantity * l_quantity + 1)), 6) AS v_asinh,
        |  ROUND(0.5 * LN((1 + l_discount) / (1 - l_discount)), 6) AS v_atanh,
        |  round_even(l_quantity / 2, 0) AS v_bround,
        |  POWER(l_quantity, 3) AS v_pow,
        |  CAST(trunc(l_extendedprice / 7.0 * 100) AS BIGINT) / 100.0 AS v_trunc,
        |  TRY_CAST(CASE WHEN l_linenumber % 2 = 0 THEN '12' ELSE 'x' END AS INT) AS v_safe,
        |  isinf(EXP(l_quantity * 20.0)) AS v_isinf,
        |  isnan(CASE WHEN l_linenumber = 1 THEN CAST('NaN' AS DOUBLE) ELSE l_discount END) AS v_isnan,
        |  GREATEST(l_tax, l_discount) AS v_gin,
        |  LEAST(l_tax, l_discount) AS v_lin,
        |  chr(65 + l_linenumber % 26) AS v_chr,
        |  CAST(length(l_linestatus) AS BIGINT) AS v_clen,
        |  l_returnflag ILIKE 'a%' AS v_ilike,
        |  ifnull(nullif(l_linenumber, 3), -1) AS v_ifnull,
        |  CAST(date_part('week', l_shipdate) AS BIGINT) AS v_wk
        |FROM lineitem WHERE l_orderkey <= 12000""".stripMargin) { (s, dir) =>
      graft.functions.Registry.registerAll(s)
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 12000).select(
        col("l_orderkey"), col("l_linenumber"),
        round(acos(col("l_discount")), 6).as("v_acos"),
        round(asin(col("l_discount")), 6).as("v_asin"),
        round(tan(col("l_discount")), 6).as("v_tan"),
        round(tanh(col("l_discount")), 6).as("v_tanh"),
        round(expr("acosh(1.0 + l_quantity)"), 6).as("v_acosh"),
        round(expr("asinh(l_quantity)"), 6).as("v_asinh"),
        round(expr("atanh(l_discount)"), 6).as("v_atanh"),
        bround(col("l_quantity") / 2, 0).as("v_bround"),
        expr("power(l_quantity, 3)").as("v_pow"),
        expr("truncate(l_extendedprice / 7.0, 2)").as("v_trunc"),
        expr("try_cast(CASE WHEN l_linenumber % 2 = 0 THEN '12' ELSE 'x' END AS INT)")
          .as("v_safe"),
        expr("is_inf(exp(l_quantity * 20.0))").as("v_isinf"),
        expr("is_nan(CASE WHEN l_linenumber = 1 THEN double('NaN') ELSE l_discount END)")
          .as("v_isnan"),
        expr("greatest_ignore_nulls(l_tax, l_discount)").as("v_gin"),
        expr("least_ignore_nulls(l_tax, l_discount)").as("v_lin"),
        expr("chr(65 + l_linenumber % 26)").as("v_chr"),
        expr("char_length(l_linestatus)").cast("long").as("v_clen"),
        expr("l_returnflag ILIKE 'a%'").as("v_ilike"),
        expr("ifnull(nullif(l_linenumber, 3), -1)").as("v_ifnull"),
        expr("date_part('week', l_shipdate)").cast("long").as("v_wk"))
    },

    // Array/map tail 2 (array.md, map.md): ARRAY_APPEND/PREPEND/CONCAT/
    // COMPACT/REMOVE/REVERSE/SIZE, CARDINALITY, ARRAY_MAX/MIN,
    // ARRAYS_OVERLAP, ARRAY_EXISTS, MAP_CONCAT, MAP_CONTAINS_KEY. DuckDB
    // spells these through list_* primitives; array outputs serialize
    // as '|'-joined strings for the compare.
    Q(
      "fn_array2",
      """SELECT p_partkey,
        |  array_to_string(list_append(words, 'zz'), '|') AS app,
        |  array_to_string(list_prepend('aa', words), '|') AS pre,
        |  array_to_string(list_concat(words, ['x', 'y']), '|') AS cat,
        |  array_to_string(list_filter([words[1], NULL, 'mid'], x -> x IS NOT NULL), '|') AS compacted,
        |  array_to_string(list_filter(words, x -> x <> 'green'), '|') AS removed,
        |  array_to_string(list_reverse(words), '|') AS rev,
        |  CAST(len(words) AS BIGINT) AS asize,
        |  list_max(words) AS amax,
        |  list_min(words) AS amin,
        |  list_has_any(words, ['green', 'spring']) AS overlap,
        |  len(list_filter(words, x -> x = 'green')) > 0 AS exists_green,
        |  CAST(cardinality(map_concat(MAP(['a'], [1]), MAP(['b'], [2]))) AS BIGINT) AS mlen,
        |  list_contains(map_keys(MAP(['green', 'blue'], [1, 2])), words[1]) AS mck
        |FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"), split(col("p_name"), " ").as("words"))
          .select(
            col("p_partkey"),
            array_join(array_append(col("words"), lit("zz")), "|").as("app"),
            array_join(array_prepend(col("words"), lit("aa")), "|").as("pre"),
            array_join(concat(col("words"), array(lit("x"), lit("y"))), "|")
              .as("cat"),
            array_join(array_compact(
              array(element_at(col("words"), 1),
                lit(null).cast("string"), lit("mid"))), "|").as("compacted"),
            array_join(array_remove(col("words"), "green"), "|").as("removed"),
            array_join(reverse(col("words")), "|").as("rev"),
            size(col("words")).cast("long").as("asize"),
            array_max(col("words")).as("amax"),
            array_min(col("words")).as("amin"),
            arrays_overlap(col("words"), array(lit("green"), lit("spring")))
              .as("overlap"),
            exists(col("words"), x => x === "green").as("exists_green"),
            expr("cardinality(map_concat(map('a', 1), map('b', 2)))")
              .cast("long").as("mlen"),
            map_contains_key(
              map(lit("green"), lit(1), lit("blue"), lit(2)),
              element_at(col("words"), 1)).as("mck"))
    },

    // VARIANT function tail (crates/sqllib/src/variant.rs; json.md:78-510):
    // both engines build the same JSON document from event columns, then
    // this side runs the real variant operators (graft.functions.Variants)
    // while the oracle — knowing the document's shape — states the results
    // directly. Object-valued results serialize as sorted `k=<json>` CSV so
    // the compare is order-independent.
    Q(
      "fn_variant",
      """SELECT event_id,
        |  'id,meta,note,type' AS keys_csv,
        |  'id,meta,meta.k,meta.src,note,type' AS deep_keys_csv,
        |  'id=' || event_id AS each_int,
        |  'type="' || event_type || '"' AS strs,
        |  'id=' || event_id || ',meta={"k":' || CAST(json_extract(props, '$.k') AS BIGINT)
        |    || '},note=null,type="' || event_type || '"' AS pruned,
        |  'extra=true,id=' || event_id || ',meta={"k":0,"src":"ev"},note=null,type="'
        |    || event_type || '"' AS merged
        |FROM events WHERE event_id < 2000""".stripMargin) { (s, dir) =>
      import graft.functions.Variants
      val j = concat(lit("{\"id\": "), col("event_id"),
        lit(", \"type\": \""), col("event_type"),
        lit("\", \"meta\": {\"k\": "),
        get_json_object(col("props"), "$.k"),
        lit(", \"src\": \"ev\"}, \"note\": null}"))
      val v = parse_json(j)
      def objCsv(c: org.apache.spark.sql.Column) = {
        val m = Variants.toObjectMap(c)
        array_join(transform(array_sort(map_keys(m)),
          k => concat(k, lit("="), to_json(element_at(m, k)))), ",")
      }
      def mapCsv(m: org.apache.spark.sql.Column) =
        array_join(transform(array_sort(map_keys(m)),
          k => concat(k, lit("="), element_at(m, k).cast("string"))), ",")
      t(s, dir, "events").filter(col("event_id") < 2000).select(
        col("event_id"),
        array_join(Variants.jsonObjectKeys(v), ",").as("keys_csv"),
        // the document is 2 levels deep — unrolling recursion further only
        // inflates the plan (codegen time dominated this query at depth 8)
        array_join(Variants.jsonKeys(v, depth = 3), ",").as("deep_keys_csv"),
        mapCsv(Variants.jsonEachBigint(v)).as("each_int"),
        objCsv(Variants.variantFilter(v,
          (_, x) => Variants.variantTypeof(x) === "VARCHAR")).as("strs"),
        objCsv(Variants.variantDeepFilter(v,
          (p, _) => p =!= "meta.src", depth = 3)).as("pruned"),
        objCsv(Variants.variantMerge(v,
          parse_json(lit("""{"meta": {"k": 0}, "extra": true}""")), depth = 3))
          .as("merged"))
    },

    // Runtime-recursive VARIANT_DEEP_MAP / VARIANT_DEEP_FILTER (the
    // unbounded-depth HigherOrderFunction, o.a.s.sql.graft.VariantDeep):
    // both engines build the same 3-level document; this side runs the
    // real operators, the oracle — knowing the shape — states the JSON
    // results directly (keys are alphabetical, matching variant
    // normalization).
    Q(
      "fn_variant_deep",
      """SELECT event_id,
        |  '{"a":{"b":{"c":' || (event_id * 2) || ',"d":"' || event_type
        |    || '"},"e":' || (CAST(json_extract(props, '$.k') AS BIGINT) * 2)
        |    || '},"arr":[' || (event_id * 2) || ',{"f":'
        |    || (CAST(json_extract(props, '$.k') AS BIGINT) * 2) || '}]}' AS mapped,
        |  '{"a":{"b":{"c":' || event_id || '},"e":'
        |    || CAST(json_extract(props, '$.k') AS BIGINT) || '},"arr":[{"f":'
        |    || CAST(json_extract(props, '$.k') AS BIGINT) || '}]}' AS filtered
        |FROM events WHERE event_id < 2000""".stripMargin) { (s, dir) =>
      import graft.functions.Variants
      val k = get_json_object(col("props"), "$.k")
      val v = parse_json(concat(
        lit("{\"a\":{\"b\":{\"c\":"), col("event_id"),
        lit(",\"d\":\""), col("event_type"),
        lit("\"},\"e\":"), k,
        lit("},\"arr\":["), col("event_id"),
        lit(",{\"f\":"), k, lit("}]}")))
      t(s, dir, "events").filter(col("event_id") < 2000).select(
        col("event_id"),
        // double every numeric leaf, at any depth; strings untouched
        to_json(Variants.variantDeepMapAll(v, (_, x) =>
          when(schema_of_variant(x) === "BIGINT",
            (x.cast("bigint") * 2).cast("variant")).otherwise(x)))
          .as("mapped"),
        // prune a deep object field and shrink the array (1-based path)
        to_json(Variants.variantDeepFilterAll(v, (p, _) =>
          p =!= "a.b.d" && p =!= "arr[1]")).as("filtered"))
    },

    // TIME type (types.md:19; sqllib timestamp.rs TIME section): Spark
    // 4.1's NATIVE TimeType, enabled via spark.sql.timeType.enabled —
    // construction (make_time), VARCHAR rendering (identical trimmed-
    // fraction form in both engines), EXTRACT, wrap-around interval
    // arithmetic (native add overflows past midnight, so the wrap is the
    // conditional ±24h form both engines agree on), parse/format round
    // trip, and date+time → timestamp composition. The BIGINT
    // nanos-of-day registry tail (parse_time/format_time/...) remains the
    // portable fallback for sessions without the flag.
    Q(
      "fn_time",
      """SELECT o_orderkey AS k,
        |  CAST(tt AS VARCHAR) AS t_str,
        |  EXTRACT(hour FROM tt) AS t_h,
        |  EXTRACT(minute FROM tt) AS t_m,
        |  CAST(EXTRACT(second FROM tt) AS BIGINT) AS t_s,
        |  CAST(tt + INTERVAL 97 MINUTES AS VARCHAR) AS t_plus,
        |  CAST(CAST(CAST(tt AS VARCHAR) AS TIME) AS VARCHAR) AS t_rt,
        |  CAST(CAST('2024-03-05' AS DATE) + tt AS VARCHAR) AS t_ts
        |FROM (
        |  SELECT o_orderkey, make_time(
        |    CAST(o_orderkey % 24 AS BIGINT),
        |    CAST(o_orderkey % 60 AS BIGINT),
        |    CAST(o_orderkey % 60 AS DOUBLE) + (o_orderkey % 1000) / 1000.0) AS tt
        |  FROM orders WHERE o_orderkey <= 12000)""".stripMargin) { (s, dir) =>
      s.conf.set("spark.sql.timeType.enabled", "true")
      t(s, dir, "orders").filter(col("o_orderkey") <= 12000)
        .select(col("o_orderkey").as("k"),
          expr("make_time(CAST(o_orderkey % 24 AS INT), " +
            "CAST(o_orderkey % 60 AS INT), " +
            "CAST(o_orderkey % 60 AS DOUBLE) + (o_orderkey % 1000) / 1000.0)")
            .as("tt"))
        .select(col("k"),
          expr("CAST(tt AS STRING)").as("t_str"),
          expr("EXTRACT(HOUR FROM tt)").cast("long").as("t_h"),
          expr("EXTRACT(MINUTE FROM tt)").cast("long").as("t_m"),
          expr("CAST(EXTRACT(SECOND FROM tt) AS BIGINT)").as("t_s"),
          // DuckDB's TIME + INTERVAL wraps mod 24h; Spark's native add
          // raises DATETIME_OVERFLOW past midnight — the conditional
          // ±(24h − 97min) form is the wrap both engines compute alike
          expr("CAST(CASE WHEN tt >= TIME'22:23:00' " +
            "THEN tt - INTERVAL 1343 MINUTES " +
            "ELSE tt + INTERVAL 97 MINUTES END AS STRING)").as("t_plus"),
          expr("CAST(CAST(CAST(tt AS STRING) AS TIME) AS STRING)")
            .as("t_rt"),
          expr("CAST(make_timestamp_ntz(DATE'2024-03-05', tt) AS STRING)")
            .as("t_ts"))
    },

    // GEOMETRY point type (crates/sqllib/src/geopoint.rs): MAKE_GEOPOINT /
    // ST_X / ST_Y / planar Euclidean ST_DISTANCE over STRUCT<x,y>. The
    // oracle re-derives the same points and the same closed-form distance.
    Q(
      "fn_geo",
      """SELECT n1.n_nationkey AS a, n2.n_nationkey AS b,
        |  CAST(n1.n_nationkey AS DOUBLE) / 7 AS ax,
        |  CAST(n1.n_nationkey % 5 AS DOUBLE) AS ay,
        |  ROUND(sqrt(
        |    (CAST(n1.n_nationkey AS DOUBLE) / 7 - CAST(n2.n_nationkey AS DOUBLE) / 7)
        |      * (CAST(n1.n_nationkey AS DOUBLE) / 7 - CAST(n2.n_nationkey AS DOUBLE) / 7)
        |    + (CAST(n1.n_nationkey % 5 AS DOUBLE) - CAST(n2.n_nationkey % 5 AS DOUBLE))
        |      * (CAST(n1.n_nationkey % 5 AS DOUBLE) - CAST(n2.n_nationkey % 5 AS DOUBLE))), 9) AS dist
        |FROM nation n1 JOIN nation n2 ON n1.n_nationkey < n2.n_nationkey""".stripMargin) {
      (s, dir) =>
        graft.functions.Registry.registerAll(s)
        val n = t(s, dir, "nation").select(col("n_nationkey"),
          expr("make_geopoint(CAST(n_nationkey AS DOUBLE) / 7, " +
            "CAST(n_nationkey % 5 AS DOUBLE))").as("p"))
        n.alias("n1").join(n.alias("n2"),
            col("n1.n_nationkey") < col("n2.n_nationkey"))
          .select(col("n1.n_nationkey").as("a"),
            col("n2.n_nationkey").as("b"),
            expr("st_x(n1.p)").as("ax"), expr("st_y(n1.p)").as("ay"),
            round(expr("st_distance(n1.p, n2.p)"), 9).as("dist"))
    }
  )
}
