package graft

import org.apache.spark.sql.functions._
import graft.ddl.Dialect
import graft.functions.{Registry, WeightedAggs}
import graft.types.SqlTypes

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("blackbox is an identity the optimizer cannot fold; writelog taps") {
    Registry.registerAll(spark)
    // value passes through unchanged for any type
    val r = spark.sql(
      "SELECT blackbox(2 + 3) AS a, blackbox('x') AS b, blackbox(NULL) AS c")
      .collect()(0)
    assert(r.getInt(0) === 5 && r.getString(1) === "x" && r.isNullAt(2))
    // the barrier survives optimization: a foldable argument is NOT
    // constant-folded through it
    val plan = spark.sql("SELECT blackbox(2 + 3) AS a")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("blackbox"),
      s"blackbox folded away in optimized plan:\n$plan")
    // writelog returns its argument (the print lands on the task's
    // stdout — a side effect by contract, not an output column)
    val v = spark.sql("SELECT writelog('row=%%\n', 41 + 1) AS v")
      .collect()(0).getInt(0)
    assert(v === 42)
    // null format: no print, value still passes through
    val vn = spark.sql("SELECT writelog(CAST(NULL AS STRING), 7) AS v")
      .collect()(0).getInt(0)
    assert(vn === 7)
  }

  test("SQL-bodied function registry: trig/div/alias surface") {
    Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT sec(0.0) AS sec0, div_null(1.0, 0.0) AS dn,
        |  finite_or_null(double('inf')) AS fin,
        |  xxhash('abc') = xxhash64('abc') AS xh,
        |  element(array('a')) AS el,
        |  safe_offset(array('a','b'), 5) AS so,
        |  bin2utf8(utf82bin('héllo')) AS rt""".stripMargin)
      .collect().head
    assert(r.getDouble(0) === 1.0)
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
    assert(r.getBoolean(3))
    assert(r.getString(4) === "a")
    assert(r.isNullAt(5))
    assert(r.getString(6) === "héllo")
  }

  test("gunzip UDF round-trips gzip bytes") {
    Registry.registerUdfs(spark)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write("hello graft".getBytes("UTF-8")); gz.close()
    val out = Seq(bos.toByteArray).toDF("b")
      .selectExpr("gunzip(b) AS s").as[String].head()
    assert(out === "hello graft")
  }

  test("uuid binary round-trip and canonicalization") {
    Registry.registerUdfs(spark)
    val u = "123e4567-e89b-12d3-a456-426614174000"
    val out = Seq(u).toDF("u")
      .selectExpr("uuid_from_binary(uuid_to_binary(u)) AS r").as[String]
      .head()
    assert(out === u)
    val canon = Seq("123E4567E89B12D3A456426614174000").toDF("x")
      .select(SqlTypes.toUuid(col("x")).as("u")).as[String].head()
    assert(canon === u)
  }

  test("weighted linear aggregator: retractions subtract") {
    val agg = WeightedAggs.linear[(String, Double, Long)](_._2, _._3)
    val ds = Seq(("a", 10.0, 1L), ("a", 20.0, 1L), ("a", 10.0, -1L)).toDS()
    val out = ds.groupByKey(_._1).agg(agg.toColumn.name("s")).collect()
    assert(out === Array(("a", 20.0)))
  }

  test("SINGLE_VALUE errors on multi-row group") {
    val agg = WeightedAggs.singleValueLong
    val ok = Seq(1L).toDS().select(agg.toColumn).head()
    assert(ok === 1L)
    val err = intercept[Exception] {
      Seq(1L, 2L).toDS().select(agg.toColumn).head()
    }
    assert(err.getMessage != null)
  }

  test("VectorDotFloat codegen expression matches HOF dot product") {
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(16)(d => (math.sin(i * 1.3 + d)).toFloat))
    }.toDF("id", "v")
    val both = vecs.select(
      graft.functions.VectorDot.dotF(col("v"), col("v")).as("fast"),
      graft.llm.Similarity.dot(col("v"), col("v")).as("ref"))
      .as[(Double, Double)].collect()
    // identical operation order (left-to-right accumulate) → bit equality
    both.foreach { case (fast, ref) => assert(fast === ref) }
    // null input → null out
    val n = vecs.limit(1)
      .select(graft.functions.VectorDot.dotF(lit(null)
        .cast("array<float>"), col("v")).as("d"))
      .collect().head
    assert(n.isNullAt(0))
    // type check rejects non-float arrays
    intercept[Exception] {
      vecs.select(graft.functions.VectorDot.dotF(
        array(lit(1.0)), array(lit(2.0)))).collect()
    }
  }

  test("unsigned range checks and CHAR(n) semantics") {
    assert(Seq(200).toDF("x").select(SqlTypes.toUnsigned(col("x"), 8))
      .head().getShort(0) === 200)
    intercept[Exception] {
      Seq(-1).toDF("x").select(SqlTypes.toUnsigned(col("x"), 8)).head()
    }
    assert(Seq("ab").toDF("x").select(SqlTypes.charN(col("x"), 5))
      .head().getString(0) === "ab   ")
    assert(SqlTypes.toSpark("MAP<VARCHAR, INT>")
      === org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType))
    assert(SqlTypes.toSpark("INT ARRAY")
      === org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType))
  }

  test("generic array tail works across element types") {
    import graft.functions.Registry.arrays._
    val df = Seq((Seq(3.5, 1.5), Seq(1.5), Seq("b", "a"), Seq("a")))
      .toDF("d1", "d2", "s1", "s2")
    val r = df.select(
      arrayLength(col("d1")), element(col("d2")),
      safeOffset(col("s1"), lit(1)), safeOffset(col("s1"), lit(9)),
      arrayExcept(col("d1"), col("d2")), arrayIntersect(col("s1"), col("s2")))
      .head()
    assert(r.getInt(0) === 2)
    assert(r.getDouble(1) === 1.5)
    assert(r.getString(2) === "a")
    assert(r.isNullAt(3))
    assert(r.getSeq[Double](4) === Seq(3.5))
    assert(r.getSeq[String](5) === Seq("a"))
  }

  test("VARIANT SQL spellings: VARIANTNULL and JSON_EACH family") {
    graft.functions.Registry.registerAll(spark)
    val r = spark.sql(
      """SELECT is_variant_null(variantnull()) AS vn,
        |  to_json(json_each_bigint(parse_json('{"a":1,"b":"x","c":2.5}'))) AS ints,
        |  to_json(json_each_string(parse_json('{"a":1,"b":"x"}'))) AS strs,
        |  to_json(json_each_date(parse_json('{"d":"2024-01-01","n":5}'))) AS dates
        |""".stripMargin).head()
    assert(r.getBoolean(0))
    assert(r.getString(1) === """{"a":1}""")
    assert(r.getString(2) === """{"b":"x"}""")
    assert(r.getString(3) === """{"d":"2024-01-01"}""")
  }

  test("json_get family: typed getters, arrays, existence, edge cases") {
    graft.functions.Registry.registerAll(spark)
    val doc = """'{"name":"Bob","scores":[8,10],"nil":null,"o":{"a b":7}}'"""
    val r = spark.sql(
      s"""SELECT json_get_int($doc, 'scores', 1) AS s1,
         |  json_get_str($doc, 'name') AS nm,
         |  json_get_array($doc, 'scores') AS arr,
         |  json_contains($doc, 'nil') AS has_nil,
         |  json_contains($doc, 'missing') AS has_missing,
         |  json_get_int($doc, 'o', 'a b') AS quoted_key,
         |  json_get_str('not json', 'k') AS bad_doc,
         |  json_get_int($doc, 'name') AS wrong_type,
         |  json_length($doc) AS root_len,
         |  json_get_json($doc, 'o') AS raw
         |""".stripMargin).head()
    assert(r.getLong(0) === 10L)
    assert(r.getString(1) === "Bob")
    assert(r.getSeq[String](2) === Seq("8", "10"))
    // a JSON null VALUE exists; a missing key does not
    assert(r.getBoolean(3) === true)
    assert(r.getBoolean(4) === false)
    assert(r.getLong(5) === 7L) // non-identifier key → bracket path
    assert(r.isNullAt(6)) // invalid document → NULL, never an error
    assert(r.isNullAt(7)) // type mismatch → NULL
    assert(r.getLong(8) === 4L) // object length at root path
    assert(r.getString(9) === """{"a b":7}""")
    // non-literal path steps are rejected loudly
    val e = intercept[Exception](spark.sql(
      s"SELECT json_get_str($doc, lower('NAME'))").collect())
    assert(e.getMessage.contains("literal"))
  }

  test("strftime family: TIME pair, ISO weeks, parse contract") {
    Registry.registerAll(spark)
    val r = spark.sql(
      "SELECT format_timestamp('%F %T', TIMESTAMP '2020-10-10 10:00:00')," +
        " format_time('%H-%M-%S', TIME '10:00:00')," +
        " CAST(parse_time('%H:%M', '10:10') AS STRING)," +
        // ISO-8601 weeks: 2021-01-01 is week 53 of ISO year 2020, a
        // Friday (ISO day 5) — the locale week letters would say 01/2021
        " format_date('%G-W%V-%u', DATE '2021-01-01')," +
        " CAST(parse_timestamp('%Y-%m-%d', '2020-10-01') AS STRING)")
      .collect()(0)
    assert(r.getString(0) === "2020-10-10 10:00:00")
    assert(r.getString(1) === "10-00-00")
    assert(r.getString(2) === "10:10:00")
    assert(r.getString(3) === "2020-W53-5")
    assert(r.getString(4) === "2020-10-01 00:00:00")
    // a string that fails to match the format is NULL (datetime.md:479);
    // only an unresolvable directive set raises (datetime.md:477-485)
    val nulls = spark.sql(
      "SELECT parse_date('%Y-%m-%d', 'nope')," +
        " parse_timestamp('%Y-%m-%d', '2024-13-99')," +
        " parse_time('%H:%M', 'junk')").head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
    val ampm = intercept[Exception](spark.sql(
      "SELECT parse_timestamp('%Y-%m-%d %I', '2024-03-05 07')").collect())
    assert(ampm.getMessage != null)
    val unsupported = intercept[Exception](spark.sql(
      "SELECT format_date('%Q', DATE '2024-01-01')").collect())
    assert(unsupported.getMessage.contains("%Q") ||
      unsupported.getCause != null)
  }

  test("strftime: %y pivot, %e/%k/%l space padding, %D") {
    Registry.registerAll(spark)
    val r = spark.sql(
      // chrono pivot: 69-99 → 19xx, 00-68 → 20xx (java's 'uu' would
      // read '85' as 2085); %e/%k/%l are space-padded per the reference
      "SELECT CAST(parse_date('%y-%m-%d', '85-03-04') AS STRING)," +
        " CAST(parse_date('%y-%m-%d', '68-03-04') AS STRING)," +
        " format_date('%y', DATE '1985-06-01')," +
        " format_date('%e', DATE '2024-01-08')," +
        " format_timestamp('%k|%l', TIMESTAMP '2024-01-08 08:05:00')," +
        " format_date('%D', DATE '1999-07-04')," +
        " CAST(parse_date('%D', '07/04/99') AS STRING)").head()
    assert(r.getString(0) === "1985-03-04")
    assert(r.getString(1) === "2068-03-04")
    assert(r.getString(2) === "85")
    assert(r.getString(3) === " 8")
    assert(r.getString(4) === " 8| 8")
    assert(r.getString(5) === "07/04/99")
    assert(r.getString(6) === "1999-07-04")
    // %y prints year MOD 100 for ALL years (chrono), matching the
    // fast path's 'yy' — not the full year outside 1969-2068
    assert(graft.functions.Strftime.format("%y",
      "1901-01-01 00:00:00") === "01")
    assert(graft.functions.Strftime.format("%y",
      "2199-06-01 00:00:00") === "99")
    assert(graft.functions.Strftime.parseDate("%y-%m-%d", "85-03-04")
      === "1985-03-04")
  }

  test("strftime constant-pattern fast path lowers to date_format") {
    Registry.registerAll(spark)
    // translatable literal pattern → native date_format, no UDF node
    // (the input must be a COLUMN — a literal argument constant-folds
    // the whole expression away and the plan assert would be vacuous)
    val fast = spark.range(2).selectExpr(
      "format_timestamp('%Y-%m-%d %H:%M:%S', " +
        "timestamp_seconds(id + 1709213130)) AS s")
    assert(!fast.queryExecution.optimizedPlan.toString
      .contains("__strftime"), fast.queryExecution.optimizedPlan.toString)
    assert(fast.queryExecution.optimizedPlan.toString
      .contains("date_format"))
    assert(fast.orderBy("s").head().getString(0) === "2024-02-29 13:25:30")
    // results agree with the UDF path across representative patterns
    for (p <- Seq("%F %T", "%d/%m/%y", "%I %p", "%j", "%B %Y", "%a%%x."))
      assert(spark.sql(
        s"SELECT format_timestamp('$p', TIMESTAMP '1999-07-04 06:30:15')")
        .head().getString(0) ===
        graft.functions.Strftime.format(p, "1999-07-04 06:30:15"), p)
    // ISO-week / space-padded directives stay on the UDF (no native
    // equivalent) and still answer correctly
    val iso = spark.range(1).selectExpr(
      "format_date('%G-W%V-%u', date_add(DATE '2021-01-01', " +
        "CAST(id AS INT))) AS s")
    assert(iso.queryExecution.optimizedPlan.toString
      .contains("__strftime"))
    assert(iso.head().getString(0) === "2020-W53-5")
    // a DATE source with time directives keeps the UDF's raise contract
    val e = intercept[Exception](spark.sql(
      "SELECT format_date('%H:%M', DATE '2024-01-01')").collect())
    assert(e.getMessage != null)
  }

  test("binary bit aggregates fold bytewise (pgcorpus bitwise_test)") {
    Registry.registerAll(spark)
    // the PostgresAggregatesTests fixture values: x'05', x'04', x'0C'
    val r = spark.sql(
      "SELECT hex(bit_and_binary(y)), hex(bit_or_binary(y)), " +
        "hex(bit_xor_binary(y)) FROM VALUES (x'05'), (x'04'), (x'0C') " +
        "AS t(y)").head()
    assert(r.getString(0) === "04")
    assert(r.getString(1) === "0D")
    assert(r.getString(2) === "0D")
    // empty input → NULL; unequal lengths raise (ByteArray::zip contract)
    val e = spark.sql("SELECT bit_and_binary(y) FROM VALUES (x'05') AS " +
      "t(y) WHERE FALSE").head()
    assert(e.isNullAt(0))
    val err = intercept[Exception](spark.sql(
      "SELECT bit_or_binary(y) FROM VALUES (x'05'), (x'0102') AS t(y)")
      .collect())
    assert(err.getMessage != null)
  }

  test("split_f: literal delimiter incl. regex metachars and \\E") {
    Registry.registerAll(spark)
    val q = Dialect.normalize(
      """SELECT SPLIT('a.b.c', '.'), SPLIT('x\Ey\Ez', '\E'),
        |SPLIT('p\\E\\Qq', '\\E\\Q')""".stripMargin)
    val r = spark.sql(q).head()
    assert(r.getSeq[String](0) === Seq("a", "b", "c"))
    // a delimiter containing \E must not end the \Q quoting early
    assert(r.getSeq[String](1) === Seq("x", "y", "z"))
    assert(r.getSeq[String](2) === Seq("p", "q"))
  }

  test("FLOOR/CEIL TO CENTURY use the calendar-zero base; " +
    "DATE_TRUNC keeps the century-number base") {
    Registry.registerAll(spark)
    // timestamp.rs floor_century: y/100*100 (2000-06-01 → 2000-01-01);
    // date_trunc century: (c-1)*100+1 (2000-06-01 → 1901-01-01)
    val r = spark.sql(Dialect.normalize(
      "SELECT CAST(FLOOR(DATE '2000-06-01' TO CENTURY) AS STRING), " +
        "CAST(DATE_TRUNC(DATE '2000-06-01', CENTURY) AS STRING), " +
        "CAST(CEIL(DATE '2000-06-01' TO CENTURY) AS STRING), " +
        "CAST(CEIL(DATE '2100-01-01' TO CENTURY) AS STRING), " +
        "CAST(FLOOR(DATE '2345-06-01' TO MILLENNIUM) AS STRING), " +
        "CAST(FLOOR(TIMESTAMP '1999-12-31 23:59:59' TO CENTURY) " +
        "AS STRING)")).head()
    assert(r.getString(0) === "2000-01-01")
    assert(r.getString(1) === "1901-01-01")
    assert(r.getString(2) === "2100-01-01")
    assert(r.getString(3) === "2100-01-01") // already at a boundary
    assert(r.getString(4) === "2000-01-01")
    assert(r.getString(5) === "1900-01-01 00:00:00")
  }

  test("dialect rewrites leave string-literal bodies untouched") {
    Registry.registerAll(spark)
    // EXTRACT(/DATE_TRUNC/SUBSTRING FROM shapes INSIDE a literal must
    // not be rewritten (would corrupt the literal and desync scans)
    val lit = "EXTRACT(EPOCH FROM x) DATE_TRUNC(d, MONTH) " +
      "SUBSTRING(s FROM 1 FOR 2) FLOOR(t TO WEEK) DATE_PART(dow, d)"
    val q = s"SELECT '$lit' AS s"
    assert(spark.sql(Dialect.normalize(q)).head().getString(0) === lit)
  }

  test("to_int: signed big-endian fold incl. MSB-set inputs") {
    Registry.registerAll(spark)
    // binary.rs to_int_ folds min(4, len) bytes into i32: x'FFFFFFFF'
    // is -1, x'80000000' is i32::MIN — ANSI CAST must not overflow
    val r = spark.sql(
      "SELECT to_int(x'FFFFFFFF'), to_int(x'80000000')," +
        " to_int(x'7FFFFFFF'), to_int(x'0001'), to_int(x'FFFFFFFF01')")
      .head()
    assert(r.getInt(0) === -1)
    assert(r.getInt(1) === Int.MinValue)
    assert(r.getInt(2) === Int.MaxValue)
    assert(r.getInt(3) === 1)
    assert(r.getInt(4) === -1) // only the first 4 bytes fold
  }
}
