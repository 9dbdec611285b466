package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.runtime.{DurableRunner, Pipeline}
import graft.sources.Envelopes
import graft.zset.ZSets

/** End-to-end streaming program: file-stream transport, insert_delete
  * envelope decode, journaled steps, and kill/restart with exactly-once
  * view contents (the reference's checkpoint + journal FT contract).
  */
class DurableRunnerSpec extends SparkSpec {
  import spark.implicits._

  private val programSql =
    """CREATE TABLE orders (o_id BIGINT NOT NULL, o_cust BIGINT, o_amt DOUBLE);
      |CREATE VIEW totals AS
      |  SELECT o_cust, COUNT(*) AS n, SUM(o_amt) AS total
      |  FROM orders GROUP BY o_cust;""".stripMargin

  test("insert_delete / weighted / debezium / snowflake envelopes decode") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.StringType)))
    def dec(fmt: String, lines: String*): Set[(Long, String, Long)] =
      Envelopes.decodeJson(lines.toDF("value"), schema, fmt)
        .as[(Long, String, Long)].collect().toSet

    assert(dec("insert_delete",
      """{"insert": {"a": 1, "b": "x"}}""",
      """{"delete": {"a": 2, "b": "y"}}""")
      === Set((1L, "x", 1L), (2L, "y", -1L)))
    assert(dec("weighted",
      """{"weight": 3, "data": {"a": 5, "b": "z"}}""",
      """{"weight": -2, "data": {"a": 6, "b": "w"}}""")
      === Set((5L, "z", 3L), (6L, "w", -2L)))
    assert(dec("raw", """{"a": 9, "b": "r"}""") === Set((9L, "r", 1L)))
    assert(dec("snowflake",
      """{"a": 4, "b": "s", "__action": "insert"}""",
      """{"a": 5, "b": "t", "__action": "delete"}""")
      === Set((4L, "s", 1L), (5L, "t", -1L)))
    assert(dec("debezium",
      """{"payload": {"op": "c", "after": {"a": 1, "b": "n"}}}""",
      """{"payload": {"op": "d", "before": {"a": 2, "b": "o"}}}""",
      """{"payload": {"op": "u", "before": {"a": 3, "b": "p"}, "after": {"a": 3, "b": "q"}}}""")
      === Set((1L, "n", 1L), (2L, "o", -1L), (3L, "p", -1L), (3L, "q", 1L)))
  }

  test("envelope encode round-trips through decode (egress mirror)") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.StringType)))
    val delta = Seq((1L, "x", 2L), (2L, "y", -1L), (3L, "z", 1L))
      .toDF("a", "b", "_w")
    for (fmt <- Seq("insert_delete", "weighted", "snowflake")) {
      val wire = Envelopes.encodeJson(delta, fmt)
      val back = graft.zset.ZSets.consolidate(
        Envelopes.decodeJson(wire, schema, fmt))
        .as[(Long, String, Long)].collect().toSet
      assert(back === Set((1L, "x", 2L), (2L, "y", -1L), (3L, "z", 1L)),
        s"round trip failed for $fmt")
    }
    // unit-weight formats expand |w| copies on the wire
    assert(Envelopes.encodeJson(delta, "insert_delete").count() === 4)
    assert(Envelopes.encodeJson(delta, "weighted").count() === 3)
  }

  test("csv format decodes records as inserts; malformed lines drop") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.StringType)))
    val out = Envelopes.decode(Seq(
      "1,x", "2,\"quoted, comma\"", "not_a_number,y", "3,z")
      .toDF("value"), schema, "csv")
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set((1L, "x", 1L), (2L, "quoted, comma", 1L),
      (3L, "z", 1L)))
    // header skip
    val withHeader = Envelopes.decodeCsv(Seq("a,b", "7,h").toDF("value"),
      schema, headers = true).as[(Long, String, Long)].collect().toSet
    assert(withHeader === Set((7L, "h", 1L)))
    // avro without a writer schema fails fast with guidance (the decode
    // itself is real — ConnectorsSpec round-trips it)
    val ex = intercept[IllegalStateException] {
      Envelopes.decode(Seq("x").toDF("value"), schema, "avro")
    }
    assert(ex.getMessage.contains("avro_schema"))
  }

  test("malformed and partial envelope lines drop, valid ones survive") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType)))
    val out = Envelopes.decodeJson(Seq(
      """{"insert": {"a": 1}}""",
      """not json at all""",
      """{"unknown_key": {"a": 2}}""",
      """{"insert": null}""",
      """{}""").toDF("value"), schema, "insert_delete")
      .as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 1L)))
  }

  private def writeLines(dir: Path, table: String, file: String,
      lines: Seq[String]): Unit = {
    val d = dir.resolve(table)
    Files.createDirectories(d)
    Files.write(d.resolve(file), lines.mkString("\n").getBytes)
  }

  private def ins(id: Long, cust: Long, amt: Double): String =
    s"""{"insert": {"o_id": $id, "o_cust": $cust, "o_amt": $amt}}"""
  private def del(id: Long, cust: Long, amt: Double): String =
    s"""{"delete": {"o_id": $id, "o_cust": $cust, "o_amt": $amt}}"""

  private def runOnce(input: Path, ckpt: Path, state: Path): Unit = {
    val runner = new DurableRunner(spark, graft.ddl.Ddl.parse(programSql),
      state.toString)
    val q = runner.writer(input.toString)((_, _, _) => ())
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // keep this runner's pipeline registered for assertions
    DurableRunnerSpec.last = runner
  }

  test("completion tokens: complete only once outputs are acknowledged") {
    val state = Files.createTempDirectory("graft_tok")
    val runner = new DurableRunner(spark, graft.ddl.Ddl.parse(programSql),
      state.toString)
    assert(runner.completionToken() === -1L)
    assert(runner.isComplete(-1L)) // empty stream is trivially complete
    runner.step(1L, Map("orders" ->
      graft.zset.ZSets.lift(Seq((1L, 10L, 5.0))
        .toDF("o_id", "o_cust", "o_amt"))))
    val t1 = runner.completionToken()
    assert(t1 === 1L)
    // state is applied, but the sink has not acknowledged the outputs
    assert(!runner.isComplete(t1))
    // later batches never block an earlier token (overlapping execution)
    runner.step(2L, Map("orders" ->
      graft.zset.ZSets.lift(Seq((2L, 10L, 7.0))
        .toDF("o_id", "o_cust", "o_amt"))))
    runner.markDelivered(1L)
    assert(runner.isComplete(t1))
    assert(!runner.isComplete(runner.completionToken())) // batch 2 pending
    runner.markDelivered(2L)
    assert(runner.isComplete(runner.completionToken()))
  }

  test("file stream + journal survives kill/restart with exactly-once state") {
    val input = Files.createTempDirectory("graft_in")
    val ckpt = Files.createTempDirectory("graft_ckpt")
    val state = Files.createTempDirectory("graft_state")

    writeLines(input, "orders", "f1.jsonl",
      Seq(ins(1, 10, 5.0), ins(2, 10, 7.0), ins(3, 20, 1.0)))
    runOnce(input, ckpt, state)
    val after1 = DurableRunnerSpec.last.pipeline
      .adHoc("SELECT * FROM totals").as[(Long, Long, Double)].collect().toSet
    assert(after1 === Set((10L, 2L, 12.0), (20L, 1L, 1.0)))

    // "crash": discard the runner (in-memory state gone), add more files —
    // including a retraction — and restart with the same checkpoint+journal
    writeLines(input, "orders", "f2.jsonl",
      Seq(del(2, 10, 7.0), ins(4, 20, 2.5)))
    runOnce(input, ckpt, state)
    val after2 = DurableRunnerSpec.last.pipeline
      .adHoc("SELECT * FROM totals").as[(Long, Long, Double)].collect().toSet
    assert(after2 === Set((10L, 1L, 5.0), (20L, 2L, 3.5)))

    // restart with no new data: replay must be idempotent
    runOnce(input, ckpt, state)
    val after3 = DurableRunnerSpec.last.pipeline
      .adHoc("SELECT * FROM totals").as[(Long, Long, Double)].collect().toSet
    assert(after3 === after2)

    // batch recompute over all surviving rows agrees (journal = truth)
    val batch = Pipeline(spark, programSql).runBatch(Map("orders" ->
      Seq((1L, 10L, 5.0), (3L, 20L, 1.0), (4L, 20L, 2.5))
        .toDF("o_id", "o_cust", "o_amt")))("totals")
      .as[(Long, Long, Double)].collect().toSet
    assert(after2 === batch)
  }
  test("snapshot compaction truncates the journal; restart restores exactly") {
    val input = Files.createTempDirectory("graft_cmp_in")
    val ckpt = Files.createTempDirectory("graft_cmp_ckpt")
    val state = Files.createTempDirectory("graft_cmp_state")

    writeLines(input, "orders", "f1.jsonl",
      Seq(ins(1, 10, 5.0), ins(2, 10, 7.0)))
    runOnce(input, ckpt, state)
    // compact: snapshot state, truncate journal
    DurableRunnerSpec.last.compact()
    assert(!java.nio.file.Files.list(state.resolve("journal")).iterator()
      .hasNext, "journal should be truncated after compaction")

    // more data (with a retraction), then restart from snapshot + tail
    writeLines(input, "orders", "f2.jsonl", Seq(del(2, 10, 7.0), ins(3, 20, 1.0)))
    runOnce(input, ckpt, state)
    val got = DurableRunnerSpec.last.pipeline
      .adHoc("SELECT * FROM totals").as[(Long, Long, Double)].collect().toSet
    assert(got === Set((10L, 1L, 5.0), (20L, 1L, 1.0)))

    // idempotent restart again
    runOnce(input, ckpt, state)
    val again = DurableRunnerSpec.last.pipeline
      .adHoc("SELECT * FROM totals").as[(Long, Long, Double)].collect().toSet
    assert(again === got)
  }

  test("compaction preserves PRIMARY KEY upsert state across restart") {
    val state = Files.createTempDirectory("graft_pk_state")
    val prog = graft.ddl.Ddl.parse(
      """CREATE TABLE kv (k BIGINT NOT NULL PRIMARY KEY, v VARCHAR);
        |CREATE VIEW vals AS SELECT k, v FROM kv;""".stripMargin)
    val r1 = new DurableRunner(spark, prog, state.toString)
    r1.step(0L, Map("kv" ->
      Seq((1L, "a", false), (2L, "b", false)).toDF("k", "v", "_deleted")))
    r1.markDelivered(0L)
    r1.compact()
    // restart from the snapshot alone, then upsert a PRE-SNAPSHOT key:
    // the old row must still be retracted (upsert state was rebuilt)
    val r2 = new DurableRunner(spark, prog, state.toString)
    val out = r2.step(1L, Map("kv" ->
      Seq((1L, "z", false)).toDF("k", "v", "_deleted"))).get
    assert(out("vals").as[(Long, String, Long)].collect().toSet
      === Set((1L, "a", -1L), (1L, "z", 1L)))
    assert(r2.pipeline.adHoc("SELECT * FROM kv")
      .as[(Long, String)].collect().toSet === Set((1L, "z"), (2L, "b")))
    // and the restored state matches a batch recompute of survivors
    assert(r2.pipeline.adHoc("SELECT * FROM vals")
      .as[(Long, String)].collect().toSet === Set((1L, "z"), (2L, "b")))
  }

  test("committed-but-undelivered outputs re-deliver on restart") {
    val state = Files.createTempDirectory("graft_redeliver_state")
    val prog = graft.ddl.Ddl.parse(programSql)
    val r1 = new DurableRunner(spark, prog, state.toString)
    // step commits to the journal, but "crash" before delivery is acked
    r1.step(0L, Map("orders" ->
      Seq((1L, 10L, 5.0, 1L)).toDF("o_id", "o_cust", "o_amt", ZSets.W)))
    val r2 = new DurableRunner(spark, prog, state.toString)
    assert(r2.pendingOutputs.keySet === Set(0L))
    var seen = List.empty[(String, Long, Long)]
    r2.deliverPending((v, d, id) => seen :+= ((v, id, d.count())))
    assert(seen.map(x => (x._1, x._2)) === List(("totals", 0L)))
    assert(seen.head._3 === 1L)
    // acknowledged: a further restart has nothing pending
    val r3 = new DurableRunner(spark, prog, state.toString)
    assert(r3.pendingOutputs.isEmpty)
  }

  test("DDL LATENESS becomes a watermark on a real file-stream source") {
    val input = Files.createTempDirectory("graft_late_in")
    val ckpt = Files.createTempDirectory("graft_late_ckpt")
    val prog = graft.ddl.Ddl.parse(
      """CREATE TABLE events (ev_ts TIMESTAMP LATENESS INTERVAL 10 SECONDS,
        |  ev_val BIGINT);""".stripMargin)
    def row(s: Int, v: Long): String =
      s"""{"insert": {"ev_ts": "2024-01-01 00:00:${"%02d".format(s)}", "ev_val": $v}}"""

    Files.createDirectories(input.resolve("events"))
    val src = graft.sources.FileSource.tableStream(spark, input.toString,
      prog.tables.head)
    // watermark present on the decoded stream
    assert(src.queryExecution.analyzed.toString.contains("EventTimeWatermark"))

    val agg = graft.streaming.Streams.tumbleAgg(
      src.drop(ZSets.W), "ev_ts", "10 seconds", Nil,
      Seq(sum(col("ev_val")).as("s")))
    writeLines(input, "events", "b1.jsonl", Seq(row(1, 1), row(5, 2)))
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString).start()
    q.processAllAvailable()
    // advance watermark past the first window, then send a too-late row
    writeLines(input, "events", "b2.jsonl", Seq(row(40, 100)))
    q.processAllAvailable()
    writeLines(input, "events", "b3.jsonl", Seq(row(2, 50), row(55, 7)))
    q.processAllAvailable()
    q.stop()
    // first window emitted once, WITHOUT the too-late ev_val=50 row
    val s0 = spark.table("late_out")
      .filter(col("window_start") === "2024-01-01 00:00:00")
      .select("s").as[Long].collect()
    assert(s0 === Array(3L))
  }
}

object DurableRunnerSpec {
  @volatile var last: graft.runtime.DurableRunner = _
}
