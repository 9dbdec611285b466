package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.runtime.Pipeline
import graft.sources.{Connectors, Kafka}

/** A live-socket stub Kafka broker implementing the protocol subset the
  * native client speaks — request framing plus Metadata v1, ListOffsets
  * v1, Fetch v4, and Produce v3 — over real RecordBatch v2 bytes (the
  * stub stores and serves the same wire batches a broker's log holds,
  * so CRC32C verification and codec decompression run against genuine
  * on-disk-format data).
  */
class KafkaStubServer(topic: String, nPartitions: Int = 1) {
  // per partition: (baseOffset, batchBytes); nextOffset advances by
  // record count
  private val logs = Array.fill(nPartitions)(
    mutable.Buffer[(Long, Array[Byte])]())
  private val nextOffsets = Array.fill(nPartitions)(0L)
  @volatile private var open = true
  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort

  /** Seed records directly (test helper) — builds a real v2 batch. */
  def seed(partition: Int, values: Seq[String], codec: Int = 0): Unit =
    appendBatch(partition, Kafka.buildRecordBatch(0L, 1700000000000L,
      values.map(v => (None, Some(v.getBytes(UTF_8)))), codec))

  def appendBatch(partition: Int, batch: Array[Byte]): Long =
    logs.synchronized {
      val base = nextOffsets(partition)
      val withBase = batch.clone()
      ByteBuffer.wrap(withBase).putLong(0, base)
      // recount from the batch header (record count at offset 57)
      val n = ByteBuffer.wrap(withBase).getInt(57)
      logs(partition) += ((base, withBase))
      nextOffsets(partition) = base + n
      base
    }

  def highWatermark(partition: Int): Long =
    logs.synchronized(nextOffsets(partition))

  def batches(partition: Int): Seq[Array[Byte]] =
    logs.synchronized(logs(partition).map(_._2).toSeq)

  private val acceptor = new Thread(() => {
    try while (open) {
      val sock = server.accept()
      val t = new Thread(() => handle(sock))
      t.setDaemon(true)
      t.start()
    } catch { case _: Throwable => () }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { open = false; server.close() }

  private def handle(sock: Socket): Unit = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream))

    def str(b: ByteBuffer): String = {
      val n = b.getShort
      if (n < 0) null else {
        val a = new Array[Byte](n); b.get(a); new String(a, UTF_8)
      }
    }
    def respond(corr: Int)(body: DataOutputStream => Unit): Unit = {
      val bos = new ByteArrayOutputStream()
      val p = new DataOutputStream(bos)
      p.writeInt(corr)
      body(p)
      p.flush()
      out.writeInt(bos.size())
      bos.writeTo(out)
      out.flush()
    }
    def wstr(p: DataOutputStream, s: String): Unit = {
      val b = s.getBytes(UTF_8); p.writeShort(b.length); p.write(b)
    }

    try while (true) {
      val size = in.readInt()
      val req = new Array[Byte](size)
      in.readFully(req)
      val buf = ByteBuffer.wrap(req)
      val apiKey = buf.getShort
      val version = buf.getShort
      val corr = buf.getInt
      str(buf) // client id
      apiKey match {
        case 3 => // Metadata v1
          val n = buf.getInt
          require(n == 1 && version == 1, s"stub: metadata v$version n=$n")
          val t = str(buf)
          respond(corr) { p =>
            p.writeInt(1) // brokers
            p.writeInt(0); wstr(p, "127.0.0.1"); p.writeInt(port)
            p.writeShort(-1) // rack null
            p.writeInt(0)    // controller
            p.writeInt(1)    // topics
            p.writeShort(if (t == topic) 0 else 3)
            wstr(p, t); p.writeByte(0)
            p.writeInt(if (t == topic) nPartitions else 0)
            (0 until (if (t == topic) nPartitions else 0)).foreach { pid =>
              p.writeShort(0); p.writeInt(pid); p.writeInt(0)
              p.writeInt(0); p.writeInt(0) // replicas, isr
            }
          }
        case 2 => // ListOffsets v1
          buf.getInt // replica id
          buf.getInt // topic count
          str(buf)
          buf.getInt // partition count
          val pid = buf.getInt
          val ts = buf.getLong
          respond(corr) { p =>
            p.writeInt(1); wstr(p, topic)
            p.writeInt(1); p.writeInt(pid); p.writeShort(0)
            p.writeLong(-1L)
            p.writeLong(if (ts == -2L) 0L else highWatermark(pid))
          }
        case 1 => // Fetch v4
          buf.getInt // replica
          buf.getInt // max wait
          buf.getInt // min bytes
          buf.getInt // max bytes
          buf.get()  // isolation
          buf.getInt // topic count
          str(buf)
          buf.getInt // partition count
          val pid = buf.getInt
          val offset = buf.getLong
          buf.getInt // partition max bytes
          val (hw, setBytes) = logs.synchronized {
            val serve = logs(pid).filter { case (base, b) =>
              base + ByteBuffer.wrap(b).getInt(57) > offset }
            val bos = new ByteArrayOutputStream()
            serve.foreach { case (_, b) => bos.write(b) }
            (nextOffsets(pid), bos.toByteArray)
          }
          respond(corr) { p =>
            p.writeInt(0) // throttle
            p.writeInt(1); wstr(p, topic)
            p.writeInt(1); p.writeInt(pid); p.writeShort(0)
            p.writeLong(hw); p.writeLong(hw)
            p.writeInt(0) // aborted txns
            p.writeInt(setBytes.length); p.write(setBytes)
          }
        case 0 => // Produce v3
          buf.getShort // txn id (null)
          buf.getShort // acks
          buf.getInt   // timeout
          buf.getInt   // topic count
          str(buf)
          buf.getInt   // partition count
          val pid = buf.getInt
          val setLen = buf.getInt
          val set = new Array[Byte](setLen)
          buf.get(set)
          val base = appendBatch(pid, set)
          respond(corr) { p =>
            p.writeInt(1); wstr(p, topic)
            p.writeInt(1); p.writeInt(pid); p.writeShort(0)
            p.writeLong(base); p.writeLong(-1L)
            p.writeInt(0) // throttle
          }
        case other => sys.error(s"stub: unsupported api $other")
      }
    } catch { case _: Throwable => () } finally sock.close()
  }
}

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
    val srv = new KafkaStubServer("events", nPartitions = 2)
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

  test("all four codecs decode the same records; CRC corruption is " +
      "caught") {
    val srv = new KafkaStubServer("c")
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
    val srv = new KafkaStubServer("t2")
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

  test("kafka_output delivers envelope lines; a reader round-trips them") {
    val srv = new KafkaStubServer("out", nPartitions = 2)
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
