package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.runtime.Pipeline
import graft.sources.{Connectors, Kafka}

class KafkaSpec extends SparkSpec {
  import spark.implicits._

  private def programSql(port: Int, topic: String,
      extra: String = ""): String = {
    val connectors =
      s"""[{"name": "k0", "transport": {"name": "kafka_input", "config": {
         |  "bootstrap.servers": "127.0.0.1:$port",
         |  "topic": "$topic"$extra
         |}}, "format": {"name": "json",
         |  "config": {"update_format": "insert_delete"}}}]"""
        .stripMargin.replaceAll("\n", " ")
    s"""CREATE TABLE ev (k BIGINT NOT NULL, v BIGINT)
       | WITH ('connectors' = '${connectors.replace("'", "''")}');
       |CREATE MATERIALIZED VIEW totals AS
       | SELECT k, SUM(v) AS s, COUNT(*) AS n FROM ev GROUP BY k;
       |""".stripMargin
  }

  test("rounds fetch exactly (cursor, high-watermark] per partition") {
    val srv = new graft.tools.KafkaMiniBroker("events", nPartitions = 2)
    try {
      srv.seed(0, Seq("""{"insert": {"k": 1, "v": 10}}""",
        """{"insert": {"k": 1, "v": 5}}"""))
      srv.seed(1, Seq("""{"insert": {"k": 2, "v": 7}}"""))
      val p = Pipeline(spark, programSql(srv.port, "events"))
      p.ingestConnectors()
      def state() = p.adHoc("SELECT * FROM totals")
        .as[(Long, Long, Long)].collect().toSet
      assert(state() === Set((1L, 15L, 2L), (2L, 7L, 1L)))
      // new commits on both partitions, incl. a retraction
      srv.seed(0, Seq("""{"delete": {"k": 1, "v": 5}}"""))
      srv.seed(1, Seq("""{"insert": {"k": 2, "v": 3}}"""))
      p.ingestConnectors()
      assert(state() === Set((1L, 10L, 1L), (2L, 10L, 2L)))
      // idle round: no-op
      p.ingestConnectors()
      assert(state() === Set((1L, 10L, 1L), (2L, 10L, 2L)))
    } finally srv.close()
  }

  test("distributed backfill: a backlog past the threshold fans out " +
      "as executor fetch tasks, each on its own connection") {
    val srv = new graft.tools.KafkaMiniBroker("big", nPartitions = 3)
    try {
      // 3 partitions × 40 records; threshold 0 forces the distributed
      // path and a 25-offset task cap splits each partition in two
      for (p <- 0 until 3)
        srv.seed(p, (0 until 40).map(i =>
          s"""{"insert": {"k": $p, "v": $i}}"""))
      val before = srv.connectionsAccepted.get()
      val p = Pipeline(spark, programSql(srv.port, "big",
        """, "distributed_fetch_threshold": "0",
          | "fetch_task_max_offsets": "25"""".stripMargin
          .replaceAll("\n", " ")))
      p.ingestConnectors()
      val got = p.adHoc("SELECT * FROM totals")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === (0 until 3).map(k =>
        (k.toLong, (0 until 40).sum.toLong, 40L)).toSet)
      // ≥ 6 fetch tasks (3 partitions × 2 chunks), each its own socket
      assert(srv.connectionsAccepted.get() - before >= 6,
        s"expected ≥6 fetch connections, saw " +
          s"${srv.connectionsAccepted.get() - before}")
      // tail rounds stay exactly-once after a distributed round
      srv.seed(1, Seq("""{"insert": {"k": 1, "v": 1000}}"""))
      p.ingestConnectors()
      val got2 = p.adHoc("SELECT * FROM totals")
        .as[(Long, Long, Long)].collect().toSet
      assert(got2.contains((1L, (0 until 40).sum.toLong + 1000L, 41L)))
    } finally srv.close()
  }

  test("all four codecs decode the same records; CRC corruption is " +
      "caught") {
    val srv = new graft.tools.KafkaMiniBroker("c")
    try {
      val values = Seq("a", "bb", "ccc")
      for (codec <- Seq(1, 2, 3, 4)) // gzip snappy lz4 zstd
        srv.seed(0, values, codec)
      val b = new Kafka.Broker("127.0.0.1", srv.port)
      try {
        val (recs, hw) = Kafka.fetch(b, "c", 0, 0L)
        assert(hw === 12L)
        assert(recs.map(r => new String(r.value.get, UTF_8)) ===
          (1 to 4).flatMap(_ => values).toVector)
        assert(recs.map(_.offset) === (0L until 12L).toVector)
        // mid-batch fetch offset: records below it are skipped
        val (tail, _) = Kafka.fetch(b, "c", 0, 4L)
        assert(tail.map(_.offset) === (4L until 12L).toVector)
      } finally b.close()
      // flip one payload byte → CRC32C verification fails loudly
      val batch = Kafka.buildRecordBatch(0L, 1L,
        Seq((None, Some("xyz".getBytes(UTF_8)))))
      batch(batch.length - 2) = (batch(batch.length - 2) ^ 0x01).toByte
      val err = intercept[IllegalArgumentException](
        Kafka.parseRecordSet(batch))
      assert(err.getMessage.contains("CRC"))
    } finally srv.close()
  }

  test("auto.offset.reset=latest skips the pre-existing backlog") {
    val srv = new graft.tools.KafkaMiniBroker("t2")
    try {
      srv.seed(0, Seq("""{"insert": {"k": 1, "v": 1}}"""))
      val p = Pipeline(spark, programSql(srv.port, "t2",
        """, "auto.offset.reset": "latest""""))
      p.ingestConnectors()
      assert(p.adHoc("SELECT * FROM totals").count() === 0)
      srv.seed(0, Seq("""{"insert": {"k": 9, "v": 2}}"""))
      p.ingestConnectors()
      assert(p.adHoc("SELECT * FROM totals").as[(Long, Long, Long)]
        .collect().toSet === Set((9L, 2L, 1L)))
    } finally srv.close()
  }

  test("exported cursors restore exactly-once resume across a restart") {
    val srv = new graft.tools.KafkaMiniBroker("r", nPartitions = 2)
    try {
      srv.seed(0, Seq("""{"insert": {"k": 1, "v": 10}}"""))
      srv.seed(1, Seq("""{"insert": {"k": 2, "v": 20}}"""))
      val p1 = Pipeline(spark, programSql(srv.port, "r"))
      p1.ingestConnectors()
      val saved = p1.exportConnectorCursors()
      assert(saved.keys.exists(_.startsWith("kafka|")))

      // "restart": the in-JVM cursor registry is wiped, a fresh pipeline
      // imports the persisted state — the next round must ingest ONLY
      // the records that arrived after the checkpoint
      graft.sources.Kafka.resetCursors("")
      srv.seed(0, Seq("""{"insert": {"k": 1, "v": 1}}"""))
      val p2 = Pipeline(spark, programSql(srv.port, "r"))
      p2.importConnectorCursors(saved)
      p2.ingestConnectors()
      assert(p2.adHoc("SELECT * FROM totals").as[(Long, Long, Long)]
        .collect().toSet === Set((1L, 1L, 1L)))

      // without the import, the same fresh pipeline would re-ingest the
      // full backlog (at-least-once duplicate) — proving the cursors
      // are what carries exactly-once
      graft.sources.Kafka.resetCursors("")
      val p3 = Pipeline(spark, programSql(srv.port, "r"))
      p3.ingestConnectors()
      assert(p3.adHoc("SELECT * FROM totals").as[(Long, Long, Long)]
        .collect().toSet === Set((1L, 11L, 2L), (2L, 20L, 1L)))
    } finally srv.close()
  }

  test("kafka_output delivers envelope lines; a reader round-trips them") {
    val srv = new graft.tools.KafkaMiniBroker("out", nPartitions = 2)
    try {
      val delta = Seq((1L, 10L, 1L), (2L, 20L, -2L))
        .toDF("a", "b", graft.zset.ZSets.W)
      Connectors.writeView(delta, Connectors.ConnectorConf(
        "kafka_output",
        Map("bootstrap.servers" -> s"127.0.0.1:${srv.port}",
          "topic" -> "out"),
        "json", Map("update_format" -> "insert_delete")))
      val wire = (0 until 2).flatMap(p => srv.batches(p))
        .flatMap(Kafka.parseRecordSet)
        .map(r => new String(r.value.get, UTF_8)).toSet
      assert(wire === Set("""{"insert":{"a":1,"b":10}}""",
        """{"delete":{"a":2,"b":20}}"""))
    } finally srv.close()
  }
}
