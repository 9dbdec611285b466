package graft

import org.apache.spark.sql.functions._

import graft.ddl.Ddl
import graft.sources.{Connectors, Datagen}
import graft.zset.ZSets

/** The datagen transport's plan/field-settings surface
  * (docs/connectors/sources/datagen.md): increment defaults, ranges,
  * values lists, uniform/zipf strategies, null_percentage, fake-string
  * families, multi-entry plans — all as deterministic pure column plans.
  */
class DatagenSpec extends SparkSpec {
  import spark.implicits._

  private def table(cols: String): Ddl.TableDef =
    Ddl.parse(s"CREATE TABLE t ($cols);").tables.head

  private def gen(cols: String, config: (String, String)*) =
    Datagen.generate(spark, table(cols), config.toMap)

  test("no config: incrementing values for every type (the doc example)") {
    val df = gen(
      "symbol VARCHAR NOT NULL, price_time BIGINT NOT NULL, price DOUBLE",
      "rows" -> "5")
    assert(df.orderBy("price_time").as[(String, Long, Double)].collect()
      .toSeq === Seq(("0", 0L, 0.0), ("1", 1L, 1.0), ("2", 2L, 2.0),
        ("3", 3L, 3.0), ("4", 4L, 4.0)))
  }

  test("plan: limit, range wrap-around, scale, values") {
    val plan =
      """[{"limit": 6, "fields": {
        |  "a": {"range": [10, 13]},
        |  "b": {"strategy": "increment", "scale": 2},
        |  "c": {"values": ["x", "y", "z"]}
        |}}]""".stripMargin
    val df = gen("a BIGINT, b BIGINT, c VARCHAR", "plan" -> plan)
    val rows = df.orderBy("b").as[(Long, Long, String)].collect().toSeq
    // a wraps within [10, 13); b steps by 2; c cycles the values list
    assert(rows.map(_._1) === Seq(10L, 11L, 12L, 10L, 11L, 12L))
    assert(rows.map(_._2) === Seq(0L, 2L, 4L, 6L, 8L, 10L))
    assert(rows.map(_._3) === Seq("x", "y", "z", "x", "y", "z"))
  }

  test("uniform stays in range and is deterministic; zipf skews low") {
    val plan =
      """[{"limit": 2000, "fields": {
        |  "a": {"strategy": "uniform", "range": [100, 200]},
        |  "z": {"strategy": "zipf", "range": [0, 50], "e": 1.7}
        |}}]""".stripMargin
    val d1 = gen("a BIGINT, z BIGINT", "plan" -> plan)
    val d2 = gen("a BIGINT, z BIGINT", "plan" -> plan)
    assert(d1.exceptAll(d2).isEmpty, "must be deterministic")
    val (lo, hi) = d1.agg(min("a"), max("a")).as[(Long, Long)].head()
    assert(lo >= 100L && hi < 200L)
    // zipf: rank 0 must dominate the tail half
    val z0 = d1.where("z = 0").count()
    val zTail = d1.where("z >= 25").count()
    assert(z0 > zTail, s"zipf head $z0 should outweigh tail $zTail")
    assert(d1.agg(max("z")).as[Long].head() < 50L)
  }

  test("null_percentage ~ requested rate; timestamps/dates honor range") {
    val plan =
      """[{"limit": 1000, "fields": {
        |  "s": {"null_percentage": 30},
        |  "ts": {"strategy": "uniform",
        |    "range": ["2021-01-01T00:00:00Z", "2021-01-02T00:00:00Z"]},
        |  "d": {"strategy": "uniform", "range": ["2024-05-01", "2024-05-08"]}
        |}}]""".stripMargin
    val df = gen("s VARCHAR, ts TIMESTAMP, d DATE", "plan" -> plan)
    val nulls = df.where("s IS NULL").count()
    assert(nulls > 200 && nulls < 400, s"~30% nulls expected, got $nulls")
    val (tlo, thi) = df.agg(min("ts").cast("string"),
      max("ts").cast("string")).as[(String, String)].head()
    assert(tlo >= "2021-01-01 00:00:00" && thi < "2021-01-02 00:00:00")
    val (dlo, dhi) = df.agg(min("d").cast("string"), max("d").cast("string"))
      .as[(String, String)].head()
    assert(dlo >= "2024-05-01" && dhi < "2024-05-08")
  }

  test("fake-string families and arrays generate plausible shapes") {
    val plan =
      """[{"limit": 50, "fields": {
        |  "w": {"strategy": "word"},
        |  "e": {"strategy": "email"},
        |  "ip": {"strategy": "ipv4"},
        |  "sent": {"strategy": "sentence", "range": [4, 8]},
        |  "arr": {"range": [1, 4]}
        |}}]""".stripMargin
    val df = gen(
      "w VARCHAR, e VARCHAR, ip VARCHAR, sent VARCHAR, arr BIGINT ARRAY",
      "plan" -> plan)
    val r = df.limit(50).collect()
    assert(r.forall(_.getAs[String]("e")
      .matches("[a-z]+\\.[a-z]+@example\\.[a-z]+")))
    assert(r.forall(_.getAs[String]("ip")
      .matches("\\d{1,3}(\\.\\d{1,3}){3}")))
    assert(r.forall(_.getAs[String]("sent").endsWith(".")))
    assert(r.forall { row =>
      val n = row.getAs[Seq[Long]]("arr").size; n >= 1 && n < 4 })
    // unknown strategies fail with the supported list, not a codegen error
    val bad = intercept[RuntimeException](gen("x VARCHAR",
      "plan" -> """[{"limit": 1, "fields": {"x": {"strategy": "isbn"}}}]"""))
    assert(bad.getMessage.contains("not implemented"))
  }

  test("streaming datagen is the batch plan's prefix at a bounded rate") {
    val tdef = table("a BIGINT, b VARCHAR")
    val plan =
      """[{"limit": 100000, "fields": {
        |  "a": {"strategy": "uniform", "range": [10, 20]},
        |  "b": {"strategy": "increment"}}}]""".stripMargin
    val sdf = Datagen.stream(spark, tdef,
      Map("rate" -> "400", "plan" -> plan))
    assert(sdf.isStreaming)
    val q = sdf.writeStream.format("memory").queryName("dg_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      var waited = 0
      while (spark.table("dg_stream").count() < 3 && waited < 100) {
        Thread.sleep(200); q.processAllAvailable(); waited += 1
      }
    } finally q.stop()
    val got = spark.table("dg_stream").as[(Long, String)].collect()
      .sortBy(_._2.toLong)
    assert(got.length >= 3)
    // the streamed rows are EXACTLY the batch plan's first n rows
    val batch = Datagen.generate(spark, tdef,
      Map("rows" -> got.length.toString, "plan" ->
        plan.replace("100000", got.length.toString)))
      .as[(Long, String)].collect().sortBy(_._2.toLong)
    assert(got.toSeq === batch.toSeq)
  }

  test("multi-entry plans concatenate; connector dispatch carries plan") {
    val json =
      """[{"transport": {"name": "datagen", "config": {"plan": [
        |  {"limit": 3, "fields": {"a": {"values": [1]}}},
        |  {"limit": 2, "fields": {"a": {"values": [2]}}}]}}}]"""
        .stripMargin
    val t = Ddl.parse("CREATE TABLE t (a BIGINT NOT NULL) " +
      s"WITH ('connectors' = '$json');").tables.head
    val out = Connectors.read(spark, t, Connectors.connectorsOf(t).head)
    assert(out.groupBy("a").count().as[(Long, Long)].collect().toSet
      === Set((1L, 3L), (2L, 2L)))
  }
}
