package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.functions._

import graft.sources.{Connectors, DynamoDb}
import graft.zset.ZSets

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

class DynamoDbSpec extends SparkSpec {
  import spark.implicits._

  private def conf(endpoint: String, secret: String,
      extra: Map[String, String] = Map.empty) =
    Connectors.ConnectorConf("dynamodb_output",
      Map("table" -> "t", "region" -> "local",
        "endpoint_url" -> endpoint,
        "aws_access_key_id" -> "AKIATEST",
        "aws_secret_access_key" -> secret) ++ extra,
      "json", Map.empty, index = Some("ix"))

  test("batch mode converges the table through an insert/update/delete " +
      "schedule, retrying unprocessed items") {
    val srv = new DynamoStubServer(Seq("id"), "s3cr3t",
      unprocessedFirst = true)
    try {
      Connectors.writeView(
        Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
          .toDF("id", "v", ZSets.W),
        conf(srv.endpoint, "s3cr3t"), indexKeys = Some(Seq("id")))
      assert(srv.store.size === 3)
      // the first call held back one unprocessed item → a retry happened
      assert(srv.calls.get() >= 2)

      Connectors.writeView(
        Seq((1L, "a", -1L), (1L, "a2", 1L), (2L, "b", -1L))
          .toDF("id", "v", ZSets.W),
        conf(srv.endpoint, "s3cr3t"), indexKeys = Some(Seq("id")))
      assert(srv.store.size === 2)
      val item1 = srv.store(("""{"id":{"N":"1"}}"""))
      assert(item1.contains(""""S":"a2""""))
    } finally srv.close()
  }

  test("write_parallelism ships partitions from executor tasks " +
      "concurrently and still converges") {
    // 120 rows / batch_size 10 = 12 requests; 60ms of stub latency per
    // request means 4-way-parallel delivery MUST overlap (serial would
    // stay at maxInFlight 1)
    val srv = new DynamoStubServer(Seq("id"), "s3cr3t",
      responseDelayMs = 60L)
    try {
      val rows = (1L to 120L).map(i => (i, s"v$i", 1L))
      Connectors.writeView(
        rows.toDF("id", "v", ZSets.W).repartition(8),
        conf(srv.endpoint, "s3cr3t",
          Map("write_parallelism" -> "4", "batch_size" -> "10")),
        indexKeys = Some(Seq("id")))
      assert(srv.store.size === 120)
      assert(srv.maxInFlight.get() >= 2,
        s"expected overlapping requests, saw max ${srv.maxInFlight.get()}")
      // signatures verified server-side on every task's connection
      assert(srv.badSignatures.get() === 0)

      // deletes flow through the same parallel path
      Connectors.writeView(
        (1L to 60L).map(i => (i, s"v$i", -1L)).toDF("id", "v", ZSets.W)
          .repartition(8),
        conf(srv.endpoint, "s3cr3t",
          Map("write_parallelism" -> "4", "batch_size" -> "10")),
        indexKeys = Some(Seq("id")))
      assert(srv.store.size === 60)
    } finally srv.close()
  }

  test("SigV4 is verified server-side; a wrong secret is rejected") {
    val srv = new DynamoStubServer(Seq("id"), "right")
    try {
      val err = intercept[Exception] {
        Connectors.writeView(
          Seq((1L, "a", 1L)).toDF("id", "v", ZSets.W),
          conf(srv.endpoint, "wrong"), indexKeys = Some(Seq("id")))
      }
      assert(TestErrors.messageChain(err)
        .exists(_.contains("InvalidSignature")))
      assert(srv.badSignatures.get() === 1 && srv.store.isEmpty)
    } finally srv.close()
  }

  test("transactional mode: attribute_not_exists skips the replayed " +
      "insert, the rest of the transaction applies") {
    val srv = new DynamoStubServer(Seq("id"), "s")
    try {
      val c = conf(srv.endpoint, "s", Map(
        "write_mode" -> "transactional",
        "put_condition_expression" -> "attribute_not_exists(id)"))
      Connectors.writeView(Seq((1L, "orig", 1L)).toDF("id", "v", ZSets.W),
        c, indexKeys = Some(Seq("id")))
      assert(srv.store(("""{"id":{"N":"1"}}""")).contains("orig"))
      // replay key 1 with a different value + a new key 2: the guarded
      // put is skipped, key 2 lands
      Connectors.writeView(
        Seq((1L, "replayed", 1L), (2L, "new", 1L)).toDF("id", "v", ZSets.W),
        c, indexKeys = Some(Seq("id")))
      assert(srv.store(("""{"id":{"N":"1"}}""")).contains("orig"))
      assert(srv.store(("""{"id":{"N":"2"}}""")).contains("new"))
    } finally srv.close()
  }

  test("signing matches AWS's officially published SigV4 example") {
    // docs.aws.amazon.com "Signature Version 4 signing process" worked
    // example: GET https://iam.amazonaws.com/?Action=ListUsers&
    // Version=2010-05-08 at 20150830T123600Z with the documented demo
    // secret — expected signature published alongside it
    val now = java.time.LocalDateTime.parse("20150830T123600Z",
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
      .toInstant(java.time.ZoneOffset.UTC)
    val headers = scala.collection.immutable.TreeMap(
      "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
      "host" -> "iam.amazonaws.com",
      "x-amz-date" -> "20150830T123600Z")
    val (signed, signature, scope) = DynamoDb.signV4General("GET",
      java.net.URI.create(
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"),
      "us-east-1", "iam", Array.emptyByteArray,
      "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", headers, now)
    assert(signed === "content-type;host;x-amz-date")
    assert(scope === "20150830/us-east-1/iam/aws4_request")
    assert(signature ===
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("non-indexed views are rejected with the uniqueness contract") {
    val err = intercept[IllegalArgumentException] {
      Connectors.writeView(Seq((1L, "a")).toDF("id", "v"),
        conf("http://127.0.0.1:1", "s"))
    }
    assert(err.getMessage.contains("indexed view"))
  }
}
