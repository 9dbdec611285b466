package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** The codegen'd Karp–Rabin kernels (GraftPolyHash / GraftPolyHashArray /
  * GraftPolyFold / GraftRollingGrams) must be BIT-IDENTICAL to the
  * higher-order-function forms they replaced — the llm_* oracle SQL
  * mirrors the HOF math textually, so any divergence is a correctness
  * break, not just a perf delta.
  */
class HashKernelsSpec extends SparkSpec {

  private val samples = Seq(
    "", "a", "hello world", "The quick brown fox",
    "répétition über straße",          // 2-byte UTF-8
    "日本語のテキスト",                    // 3-byte UTF-8
    "clef 𝄞 g-clef",        // 4-byte UTF-8 (surrogate pair)
    "mixed é日𝄞 ascii",
    "  leading and trailing  ",
    "punct!@#$%^&*()[]{};:'\",.<>/?",
    "0123456789 numbers 42",
    (1 to 50).map(i => s"tok$i").mkString(" "))

  test("GraftPolyHash matches the HOF polyHash on unicode samples") {
    val df = spark.createDataFrame(
      samples.map(Tuple1(_))).toDF("s")
    val got = df.select(Dedup.polyHash(col("s")).as("native"),
      Dedup.polyHashHof(col("s")).as("hof")).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"polyHash split on row $r")
    }
    // null string → null on both forms
    val nulls = spark.sql("SELECT CAST(NULL AS STRING) AS s")
      .select(Dedup.polyHash(col("s")), Dedup.polyHashHof(col("s")))
      .collect()
    assert(nulls.head.isNullAt(0) && nulls.head.isNullAt(1))
  }

  test("rollingFingerprint matches its HOF form on token arrays") {
    val df = spark.createDataFrame(samples.map(Tuple1(_))).toDF("s")
      .select(split(col("s"), "\\s+").as("toks"))
    val got = df.select(
      Dedup.rollingFingerprint(col("toks")).as("native"),
      Dedup.rollingFingerprintHof(col("toks")).as("hof")).collect()
    got.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"rollingFingerprint split: $r")
    }
    // empty array → 7 (the fold's init) on both
    val empty = spark.sql("SELECT array() AS toks")
      .select(Dedup.rollingFingerprint(
        col("toks").cast("array<string>"))).collect()
    assert(empty.head.getLong(0) == 7L)
  }

  test("GraftRollingGrams matches the HOF window fold") {
    import org.apache.spark.sql.graft.{GraftPolyHashArray, GraftRollingGrams, Shims}
    for (n <- Seq(2, 3, 8)) {
      val df = spark.createDataFrame(
          samples.filter(_.split("\\s+").count(_.nonEmpty) >= n)
            .map(Tuple1(_))).toDF("s")
        .select(filter(split(col("s"), "\\s+"),
          t => length(t) > 0).as("toks"))
        .select(Shims.column(GraftPolyHashArray(
          Shims.expression(col("toks")))).as("th"))
      val got = df.select(
        Shims.column(GraftRollingGrams(Shims.expression(col("th")),
          n, 131L)).as("native"),
        Dedup.rollingGramsHof(col("th"), n).as("hof")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"rollingGrams(n=$n) split: $r")
      }
    }
  }

  test("null elements propagate like the SQL fold") {
    import org.apache.spark.sql.graft.{GraftPolyFold, GraftRollingGrams, Shims}
    val df = spark.sql(
      "SELECT CAST(array(1, NULL, 3) AS ARRAY<BIGINT>) AS th")
    // whole-array fold: any null element → null (SQL arithmetic carries
    // the null accumulator to the end)
    val fold = df.select(Shims.column(GraftPolyFold(
      Shims.expression(col("th")), 31L))).collect()
    assert(fold.head.isNullAt(0))
    // window fold: only windows containing the null are null
    val grams = df.select(Shims.column(GraftRollingGrams(
      Shims.expression(col("th")), 2, 131L)).as("g"))
      .selectExpr("g[0] IS NULL AS a", "g[1] IS NULL AS b").collect()
    assert(grams.head.getBoolean(0) && grams.head.getBoolean(1))
    val single = spark.sql(
        "SELECT CAST(array(5, NULL, 3, 9) AS ARRAY<BIGINT>) AS th")
      .select(Shims.column(GraftRollingGrams(
        Shims.expression(col("th")), 2, 131L)).as("g"))
      .selectExpr("g[0] IS NULL", "g[1] IS NULL", "g[2] IS NULL")
      .collect().head
    assert(single.getBoolean(0) && single.getBoolean(1) &&
      !single.getBoolean(2))
  }
}
