package graft

import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.functions._

import graft.ddl.Ddl
import graft.runtime.Pipeline
import graft.sources.{Connectors, Nats}

/** A live-socket stub NATS server implementing the protocol subset the
  * connector speaks: the core text protocol (INFO/CONNECT/PING/SUB/
  * UNSUB/PUB/MSG/HMSG) plus the two JetStream API endpoints an ordered
  * pull consumer needs — `$JS.API.CONSUMER.CREATE.<stream>` (ephemeral
  * consumer at a deliver-policy-resolved position) and
  * `$JS.API.CONSUMER.MSG.NEXT.<stream>.<consumer>` (`no_wait` pull:
  * available messages as MSG frames with `$JS.ACK` reply subjects,
  * then a 404 status HMSG when fewer than the batch remain — the real
  * server's no_wait contract).
  *
  * Publishes whose subject matches a stream's subject filters append to
  * that stream's ordered message log (1-based stream sequences), exactly
  * the JetStream persistence model the consumer pulls from.
  */
class NatsStubServer(streams: Map[String, Seq[String]],
    requireUser: Option[(String, String)] = None) {
  private val mapper = new ObjectMapper()
  val log = TrieMap[String, mutable.ArrayBuffer[(String, Array[Byte])]](
    streams.keys.map(_ -> mutable.ArrayBuffer[(String, Array[Byte])]())
      .toSeq: _*)
  private val consumers = TrieMap[(String, String), AtomicInteger]()
  val consumerCreates = new AtomicInteger(0)
  val pullRequests = new AtomicInteger(0)
  @volatile private var open = true
  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort
  def url: String = s"nats://127.0.0.1:$port"

  /** Append directly (test seeding without a client connection). */
  def seed(stream: String, subject: String, payload: String): Unit =
    log(stream).synchronized {
      log(stream) += ((subject, payload.getBytes(UTF_8))) }

  private def matches(filter: String, subject: String): Boolean =
    if (filter == subject) true
    else if (filter.endsWith(".>"))
      subject.startsWith(filter.dropRight(1))
    else false

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
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    val subs = mutable.Map[String, String]() // subject -> sid
    var authed = requireUser.isEmpty

    def send(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.flush() }
    def sendMsg(subject: String, replyTo: Option[String],
        payload: Array[Byte]): Unit = subs.get(subject).foreach { sid =>
      val rt = replyTo.map(r => s" $r").getOrElse("")
      out.write(s"MSG $subject $sid$rt ${payload.length}\r\n".getBytes(UTF_8))
      out.write(payload)
      out.write("\r\n".getBytes(UTF_8))
      out.flush()
    }
    def sendStatus(subject: String, code: Int, text: String): Unit =
      subs.get(subject).foreach { sid =>
        val hdr = s"NATS/1.0 $code $text\r\n\r\n"
        out.write(s"HMSG $subject $sid ${hdr.length} ${hdr.length}\r\n"
          .getBytes(UTF_8))
        out.write(hdr.getBytes(UTF_8))
        out.write("\r\n".getBytes(UTF_8))
        out.flush()
      }

    def readLine(): String = {
      val sb = new java.lang.StringBuilder()
      var c = in.read()
      if (c < 0) return null
      while (c != '\r') { sb.append(c.toChar); c = in.read() }
      in.read()
      sb.toString
    }
    def readPayload(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) off += in.read(buf, off, n - off)
      readLine()
      buf
    }

    send("""INFO {"server_id":"stub","server_name":"stub","version":"2.10.0","proto":1,"max_payload":1048576}""" + "\r\n")
    try {
      var line = readLine()
      while (line != null) {
        val parts = line.split(" ")
        parts(0).toUpperCase match {
          case "CONNECT" =>
            val j = mapper.readTree(line.drop(8))
            requireUser.foreach { case (u, p) =>
              authed = j.get("user") != null && j.get("user").asText() == u &&
                j.get("pass") != null && j.get("pass").asText() == p
            }
            if (!authed) send("-ERR 'Authorization Violation'\r\n")
          case "PING" => send("PONG\r\n")
          case "PONG" => ()
          case "SUB" => subs(parts(1)) = parts.last
          case "UNSUB" =>
            subs.find(_._2 == parts(1)).foreach(kv => subs.remove(kv._1))
          case "PUB" =>
            val (subject, reply, n) =
              if (parts.length == 4) (parts(1), Some(parts(2)), parts(3).toInt)
              else (parts(1), None, parts(2).toInt)
            val payload = readPayload(n)
            if (subject.startsWith("$JS.API.CONSUMER.CREATE.")) {
              val stream = subject.stripPrefix("$JS.API.CONSUMER.CREATE.")
              val body = mapper.readTree(payload)
              val cfg = body.get("config")
              val name = cfg.get("name").asText()
              val len = log.get(stream).map(_.length).getOrElse(0)
              val pos = Option(cfg.get("deliver_policy"))
                .map(_.asText("all")).getOrElse("all") match {
                case "all" => 1
                case "new" => len + 1
                case "last" => math.max(len, 1)
                case "by_start_sequence" => cfg.get("opt_start_seq").asInt()
                case other => -1
              }
              if (!log.contains(stream))
                reply.foreach(r => sendMsg(r, None,
                  s"""{"error":{"code":404,"description":"stream not found"}}"""
                    .getBytes(UTF_8)))
              else if (pos < 0)
                reply.foreach(r => sendMsg(r, None,
                  s"""{"error":{"code":400,"description":"unsupported deliver policy"}}"""
                    .getBytes(UTF_8)))
              else {
                consumers((stream, name)) = new AtomicInteger(pos)
                consumerCreates.incrementAndGet()
                reply.foreach(r => sendMsg(r, None,
                  (s"""{"stream_name":"$stream","name":"$name","config":{},""" +
                    s""""delivered":{"consumer_seq":0,"stream_seq":${pos - 1}}}""")
                    .getBytes(UTF_8)))
              }
            } else if (subject.startsWith("$JS.API.CONSUMER.MSG.NEXT.")) {
              pullRequests.incrementAndGet()
              val rest = subject.stripPrefix("$JS.API.CONSUMER.MSG.NEXT.")
              val Array(stream, name) = rest.split("\\.", 2)
              val body = mapper.readTree(payload)
              val batch = Option(body.get("batch")).map(_.asInt()).getOrElse(1)
              val noWait = Option(body.get("no_wait"))
                .exists(_.asBoolean(false))
              val state = consumers((stream, name))
              val msgs = log(stream)
              var delivered = 0
              reply.foreach { r =>
                while (delivered < batch && state.get() <= msgs.length) {
                  val seq = state.getAndIncrement()
                  val (_, bytes) = msgs(seq - 1)
                  val pending = msgs.length - seq
                  val ack = s"$$JS.ACK.$stream.$name.1.$seq.$seq." +
                    s"${System.nanoTime()}.$pending"
                  sendMsg(r, Some(ack), bytes)
                  delivered += 1
                }
                if (delivered < batch && noWait)
                  sendStatus(r, 404, "No Messages")
              }
            } else {
              // plain publish: append to every stream whose filters match
              log.foreach { case (stream, buf) =>
                if (streams(stream).exists(matches(_, subject)))
                  buf.synchronized { buf += ((subject, payload)) }
              }
            }
          case _ => ()
        }
        line = readLine()
      }
    } catch { case _: Throwable => () } finally sock.close()
  }
}

class NatsSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def programSql(url: String, stream: String,
      deliver: String = "\"All\""): String = {
    val connectors =
      s"""[{"name": "n0", "transport": {"name": "nats_input", "config": {
         |  "connection_config": {"server_url": "$url"},
         |  "stream_name": "$stream",
         |  "consumer_config": {"deliver_policy": $deliver, "max_batch": 2}
         |}}, "format": {"name": "json",
         |  "config": {"update_format": "insert_delete"}}}]"""
        .stripMargin.replaceAll("\n", " ")
    s"""CREATE TABLE ev (k BIGINT NOT NULL, v BIGINT)
       | WITH ('connectors' = '${connectors.replace("'", "''")}');
       |CREATE MATERIALIZED VIEW totals AS
       | SELECT k, SUM(v) AS s, COUNT(*) AS n FROM ev GROUP BY k;
       |""".stripMargin
  }

  test("rounds resume from the sequence cursor: each ingest round " +
      "pulls exactly the messages since the last") {
    val srv = new NatsStubServer(Map("EVENTS" -> Seq("events.>")))
    try {
      // publish through a real client connection (socket round trip)
      val pub = new Nats.Connection(srv.url)
      pub.publish("events.a", """{"insert": {"k": 1, "v": 10}}""".getBytes(UTF_8))
      pub.publish("events.a", """{"insert": {"k": 1, "v": 5}}""".getBytes(UTF_8))
      pub.publish("events.b", """{"insert": {"k": 2, "v": 7}}""".getBytes(UTF_8))

      val p = Pipeline(spark, programSql(srv.url, "EVENTS"))
      p.ingestConnectors()
      assert(p.adHoc("SELECT * FROM totals").as[(Long, Long, Long)].collect().toSet ===
        Set((1L, 15L, 2L), (2L, 7L, 1L)))

      // next round: only the NEW messages (incl. a retraction)
      pub.publish("events.a", """{"delete": {"k": 1, "v": 5}}""".getBytes(UTF_8))
      pub.publish("events.b", """{"insert": {"k": 2, "v": 3}}""".getBytes(UTF_8))
      p.ingestConnectors()
      assert(p.adHoc("SELECT * FROM totals").as[(Long, Long, Long)].collect().toSet ===
        Set((1L, 10L, 1L), (2L, 10L, 2L)))

      // idle round: a no-op, and the cursor does not move
      p.ingestConnectors()
      assert(p.adHoc("SELECT * FROM totals").as[(Long, Long, Long)].collect().toSet ===
        Set((1L, 10L, 1L), (2L, 10L, 2L)))

      // the ordered-pull contract: every round recreated an ephemeral
      // consumer rather than trusting server-side consumer state
      assert(srv.consumerCreates.get() === 3)
      pub.close()
    } finally srv.close()
  }

  test("max_batch pages through a backlog larger than one pull") {
    val srv = new NatsStubServer(Map("S" -> Seq("s.>")))
    try {
      (1 to 5).foreach(i =>
        srv.seed("S", "s.x", s"""{"insert": {"k": $i, "v": 1}}"""))
      val p = Pipeline(spark, programSql(srv.url, "S"))
      p.ingestConnectors()
      assert(p.adHoc("SELECT * FROM totals").count() === 5)
      // batch=2 over 5 messages: 2+2+1(+404) = at least 3 pull requests
      assert(srv.pullRequests.get() >= 3)
    } finally srv.close()
  }

  test("deliver_policy New skips the pre-existing backlog") {
    val srv = new NatsStubServer(Map("S" -> Seq("s.>")))
    try {
      srv.seed("S", "s.x", """{"insert": {"k": 1, "v": 1}}""")
      val p = Pipeline(spark,
        programSql(srv.url, "S", deliver = "\"New\""))
      p.ingestConnectors()
      assert(p.adHoc("SELECT * FROM totals").count() === 0)
      srv.seed("S", "s.x", """{"insert": {"k": 2, "v": 2}}""")
      p.ingestConnectors()
      assert(p.adHoc("SELECT * FROM totals").as[(Long, Long, Long)].collect().toSet ===
        Set((2L, 2L, 1L)))
    } finally srv.close()
  }

  test("ByStartSequence starts mid-stream; user/password auth " +
      "reaches the CONNECT frame") {
    val srv = new NatsStubServer(Map("S" -> Seq("s.>")),
      requireUser = Some(("alice", "s3cret")))
    try {
      (1 to 4).foreach(i =>
        srv.seed("S", "s.x", s"""{"insert": {"k": $i, "v": $i}}"""))
      val connectors =
        s"""[{"name": "n0", "transport": {"name": "nats_input", "config": {
           |  "connection_config": {"server_url": "${srv.url}",
           |    "auth": {"user_and_password":
           |      {"user": "alice", "password": "s3cret"}}},
           |  "stream_name": "S",
           |  "consumer_config": {"deliver_policy":
           |    {"ByStartSequence": {"start_sequence": 3}}}
           |}}, "format": {"name": "json",
           |  "config": {"update_format": "insert_delete"}}}]"""
          .stripMargin.replaceAll("\n", " ")
      val sql =
        s"""CREATE TABLE ev (k BIGINT NOT NULL, v BIGINT)
           | WITH ('connectors' = '${connectors.replace("'", "''")}');
           |CREATE MATERIALIZED VIEW raw AS SELECT k, v FROM ev;
           |""".stripMargin
      val p = Pipeline(spark, sql)
      p.ingestConnectors()
      assert(p.adHoc("SELECT * FROM raw").select("k").as[Long].collect().toSet ===
        Set(3L, 4L))
    } finally srv.close()
  }

  test("missing stream fails with the server's error, not a hang") {
    val srv = new NatsStubServer(Map("S" -> Seq("s.>")))
    try {
      val p = Pipeline(spark, programSql(srv.url, "NOPE"))
      val err = intercept[Exception](p.ingestConnectors())
      assert(TestErrors.messageChain(err)
        .exists(_.contains("consumer create failed")))
    } finally srv.close()
  }

  test("ack-subject stream sequences parse in v1 and v2 forms") {
    assert(Nats.streamSeqOf("$JS.ACK.S.c.1.42.7.1234.0") === 42L)
    assert(Nats.streamSeqOf(
      "$JS.ACK.dom.acct.S.c.1.42.7.1234.0.rnd") === 42L)
    intercept[Exception](Nats.streamSeqOf("$JS.OOPS.S.c.1.2.3.4.5"))
  }
}
