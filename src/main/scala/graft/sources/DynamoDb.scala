package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.{DataFrame, Row}

import graft.zset.ZSets

/** DynamoDB output connector (docs/connectors/sinks/dynamodb.md;
  * reference `crates/adapters/src/integrated/dynamodb/output.rs`):
  * indexed views deliver each key's change as a PutItem (insert/update)
  * or DeleteItem (delete) through `BatchWriteItem` (25/request, the
  * default `batch` mode) or `TransactWriteItems` (100/request atomic
  * chunks, `transactional` mode, with optional put/delete condition
  * expressions — a false condition skips that change and the rest of
  * the transaction proceeds, the documented replay-hardening shape).
  *
  * The DynamoDB API is JSON over HTTPS with AWS Signature V4 request
  * signing — both implemented directly on the JDK HTTP client (the
  * SigV4 HMAC chain is ~30 lines), so no AWS SDK jar is needed.
  * `endpoint_url` points the connector at DynamoDB Local or any
  * compatible service, exactly as the reference supports.
  *
  * Scale note: like the reference's endpoint, delivery is bounded by
  * DynamoDB's own per-request limits — the delta (never the state)
  * streams off the cluster via toLocalIterator in 25/100-item chunks,
  * or, with `write_parallelism` > 1, ships from executor partition
  * tasks concurrently (the aggregate-bandwidth form for large
  * backfills — upsert keys are unique, so parallel order cannot race);
  * `UnprocessedItems` and cancelled-transaction retries are bounded by
  * `max_retries`.
  */
object DynamoDb {

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------- sigv4

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def sha256Hex(b: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(b))

  private val AmzDateFmt = DateTimeFormatter
    .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)
  private val DateFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd").withZone(ZoneOffset.UTC)

  /** AWS Signature V4 headers for one request (public signing spec:
    * canonical request → string-to-sign → HMAC key chain). The general
    * form (any method / query string / header set) is pinned against
    * the officially published AWS test vector in DynamoDbSpec; the
    * DynamoDB calls use the POST + x-amz-json-1.0 shape.
    */
  def signV4(method: String, uri: URI, region: String, service: String,
      payload: Array[Byte], accessKey: String, secret: String,
      target: String, now: Instant = Instant.now(),
      contentType: String = "application/x-amz-json-1.0",
      /** Extra SIGNED headers (e.g. x-amz-security-token for temporary
        * credentials) — lower-case names.
        */
      extraSigned: Map[String, String] = Map.empty)
      : Map[String, String] = {
    val amzDate = AmzDateFmt.format(now)
    val hostHeader = uri.getHost +
      (if (uri.getPort > 0) s":${uri.getPort}" else "")
    val headers = scala.collection.immutable.TreeMap(
      "content-type" -> contentType,
      "host" -> hostHeader,
      "x-amz-date" -> amzDate,
      "x-amz-target" -> target) ++ extraSigned
    val (signedHeaderNames, signature, scope) =
      signV4General(method, uri, region, service, payload, secret,
        headers, now)
    Map(
      "Content-Type" -> contentType,
      "X-Amz-Date" -> amzDate,
      "X-Amz-Target" -> target,
      "Authorization" -> (s"AWS4-HMAC-SHA256 Credential=$accessKey/" +
        s"$scope, SignedHeaders=$signedHeaderNames, " +
        s"Signature=$signature")) ++
      extraSigned.map { case (k, v) =>
        k.split('-').map(_.capitalize).mkString("-") -> v }
  }

  /** SigV4 headers for a bare REST call (no X-Amz-Target envelope) —
    * the shape of AWS's resource-path APIs (S3 Tables). Signed headers:
    * host, x-amz-date (+ extras). Per the SigV4 spec, every service
    * except S3 itself canonicalizes the path DOUBLE-encoded, so a
    * percent-encoded segment on the wire (an ARN's `%3A`) appears as
    * `%253A` in the canonical request (`doubleEncodePath = true`).
    */
  def signV4Rest(method: String, uri: URI, region: String,
      service: String, payload: Array[Byte], accessKey: String,
      secret: String, now: Instant = Instant.now(),
      extraSigned: Map[String, String] = Map.empty)
      : Map[String, String] = {
    val amzDate = AmzDateFmt.format(now)
    val hostHeader = uri.getHost +
      (if (uri.getPort > 0) s":${uri.getPort}" else "")
    val headers = scala.collection.immutable.TreeMap(
      "host" -> hostHeader, "x-amz-date" -> amzDate) ++ extraSigned
    val (signedHeaderNames, signature, scope) =
      signV4General(method, uri, region, service, payload, secret,
        headers, now, doubleEncodePath = true)
    Map(
      "X-Amz-Date" -> amzDate,
      "Authorization" -> (s"AWS4-HMAC-SHA256 Credential=$accessKey/" +
        s"$scope, SignedHeaders=$signedHeaderNames, " +
        s"Signature=$signature")) ++
      extraSigned.map { case (k, v) =>
        k.split('-').map(_.capitalize).mkString("-") -> v }
  }

  /** The signing core over an arbitrary header set and query string —
    * returns (signed-header names, hex signature, credential scope).
    */
  private[graft] def signV4General(method: String, uri: URI,
      region: String, service: String, payload: Array[Byte],
      secret: String,
      headers: scala.collection.immutable.TreeMap[String, String],
      now: Instant, doubleEncodePath: Boolean = false)
      : (String, String, String) = {
    val amzDate = AmzDateFmt.format(now)
    val date = DateFmt.format(now)
    val canonicalQuery = Option(uri.getRawQuery).map(
      _.split("&").map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
      }.sortBy(p => (p._1, p._2))
        .map { case (k, v) => s"$k=$v" }.mkString("&")).getOrElse("")
    val signedHeaderNames = headers.keys.mkString(";")
    // canonical URI: S3-style services sign the raw path; everything
    // else double-encodes (a `%3A` on the wire canonicalizes as `%253A`)
    val canonPath =
      if (doubleEncodePath) {
        val raw = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
        raw.replace("%", "%25")
      } else if (uri.getPath.isEmpty) "/" else uri.getPath
    val canonical = method + "\n" +
      canonPath + "\n" +
      canonicalQuery + "\n" +
      headers.map { case (k, v) => s"$k:$v\n" }.mkString + "\n" +
      signedHeaderNames + "\n" +
      sha256Hex(payload)
    val scope = s"$date/$region/$service/aws4_request"
    val toSign = "AWS4-HMAC-SHA256\n" + amzDate + "\n" + scope + "\n" +
      sha256Hex(canonical.getBytes(UTF_8))
    val kSigning = hmac(hmac(hmac(hmac(
      ("AWS4" + secret).getBytes(UTF_8), date), region), service),
      "aws4_request")
    (signedHeaderNames, hex(hmac(kSigning, toSign)), scope)
  }

  // -------------------------------------------- attribute-value encode

  /** Spark value → DynamoDB AttributeValue JSON. */
  def attrValue(v: Any): ObjectNode = {
    val node = mapper.createObjectNode()
    v match {
      case null => node.put("NULL", true)
      case s: String => node.put("S", s)
      case b: Boolean => node.put("BOOL", b)
      case b: Array[Byte] =>
        node.put("B", java.util.Base64.getEncoder.encodeToString(b))
      case n: java.math.BigDecimal => node.put("N", n.toPlainString)
      case n: BigDecimal => node.put("N", n.bigDecimal.toPlainString)
      case ts: java.sql.Timestamp => node.put("S", ts.toString)
      case d: java.sql.Date => node.put("S", d.toString)
      case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float |
          _: Double) => node.put("N", n.toString)
      case other => sys.error(
        s"dynamodb: unmapped value type ${other.getClass.getName}")
    }
    node
  }

  // -------------------------------------------------------- delivery

  private final case class Op(put: Boolean,
      item: ObjectNode, key: ObjectNode)

  /** Serializable delivery config — the write path runs either on the
    * driver (small per-round deltas streamed via toLocalIterator) or as
    * executor partition tasks (`write_parallelism` > 1, the
    * aggregate-bandwidth form for large backfills).
    */
  private final case class WriteConf(endpoint: String, region: String,
      table: String, accessKey: String, secret: String,
      transactional: Boolean, batchSize: Int, maxRetries: Int,
      putCond: Option[String], delCond: Option[String])
    extends Serializable

  private def toOp(r: Row, cols: Array[String], opIdx: Int,
      indexKeys: Seq[String]): Op = {
    val item = mapper.createObjectNode()
    val key = mapper.createObjectNode()
    cols.zipWithIndex.foreach { case (c, i) =>
      if (c != "_op") {
        val av = attrValue(r.get(i))
        item.set[JsonNode](c, av)
        if (indexKeys.contains(c)) key.set[JsonNode](c, av)
      }
    }
    Op(r.getString(opIdx) != "delete", item, key)
  }

  /** Deliver an indexed view delta. Returns the number of write ops.
    *
    * `write_parallelism` > 1 fans delivery out as executor partition
    * tasks, each with its own signed HTTP client — upsert-form deltas
    * have UNIQUE keys (enforced by [[Envelopes.upsertForm]]), so
    * cross-partition write order cannot race on a key and parallel
    * delivery preserves convergence; puts/deletes are idempotent per
    * key under task retry. Default (1) keeps the driver-streamed path:
    * one Spark partition plus one request batch resident at a time.
    */
  def writeUpserts(delta: DataFrame, indexKeys: Seq[String],
      config: Map[String, String]): Long = {
    val table = config.getOrElse("table",
      sys.error("dynamodb_output: table is required"))
    val region = config.getOrElse("region",
      sys.error("dynamodb_output: region is required"))
    val endpoint = config.getOrElse("endpoint_url",
      s"https://dynamodb.$region.amazonaws.com")
    val accessKey = config.getOrElse("aws_access_key_id",
      sys.env.getOrElse("AWS_ACCESS_KEY_ID", sys.error(
        "dynamodb_output: no aws_access_key_id (config or env)")))
    val secret = config.getOrElse("aws_secret_access_key",
      sys.env.getOrElse("AWS_SECRET_ACCESS_KEY", sys.error(
        "dynamodb_output: no aws_secret_access_key (config or env)")))
    val transactional =
      config.getOrElse("write_mode", "batch") == "transactional"
    val batchSize = config.get("batch_size").map(_.toInt)
      .getOrElse(if (transactional) 100 else 25)
    val maxRetries = config.get("max_retries").map(_.toInt).getOrElse(10)
    val putCond = config.get("put_condition_expression")
    val delCond = config.get("delete_condition_expression")
    require(putCond.isEmpty && delCond.isEmpty || transactional,
      "dynamodb_output: condition expressions need " +
        "write_mode=transactional")
    val parallelism =
      config.get("write_parallelism").map(_.toInt).getOrElse(1)

    val d = if (delta.columns.contains(ZSets.W)) delta else ZSets.lift(delta)
    val up = Envelopes.upsertForm(d, indexKeys)
    val cols = up.columns
    val opIdx = cols.indexOf("_op")
    val wc = WriteConf(endpoint, region, table, accessKey, secret,
      transactional, batchSize, maxRetries, putCond, delCond)

    if (parallelism > 1) {
      // executor-parallel delivery: repartition the upsert delta across
      // the requested task count; each task signs and ships its own
      // partition concurrently. The count is the SUM of the winning
      // attempts' results (an accumulator would double-count retried or
      // speculative tasks; the writes themselves are idempotent per key)
      val keysB = indexKeys
      return up.repartition(parallelism).rdd.mapPartitions {
        (it: Iterator[Row]) =>
          Iterator.single(deliver(it.map(toOp(_, cols, opIdx, keysB)), wc))
      }.sum().toLong
    }
    // stream the delta through the driver one partition at a time
    // (toLocalIterator): a first-snapshot backfill of a large view must
    // never materialize whole on the driver — only one request batch
    // plus one Spark partition is resident at any moment
    import scala.jdk.CollectionConverters._
    deliver(up.toLocalIterator().asScala.map(toOp(_, cols, opIdx,
      indexKeys)), wc)
  }

  /** Ship one op stream as signed batch/transaction requests. Runs on
    * the driver or inside an executor task (everything it touches is
    * either [[WriteConf]] or JVM-local).
    */
  private def deliver(ops: Iterator[Op], wc: WriteConf): Long = {
    import wc._
    val client = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    val uri = URI.create(endpoint)

    // transient service errors (throttling, 5xx) retry with linear
    // backoff up to max_retries — the most common failure mode under
    // load must not fail the batch outright
    val transientTypes = Seq("ProvisionedThroughputExceeded",
      "ThrottlingException", "LimitExceededException",
      "InternalServerError", "ServiceUnavailable",
      "RequestLimitExceeded")
    def call(target: String, body: ObjectNode): JsonNode = {
      val payload = body.toString.getBytes(UTF_8)
      var attempt = 0
      while (true) {
        val headers = signV4("POST", uri, region, "dynamodb", payload,
          accessKey, secret, target)
        val req = headers.foldLeft(HttpRequest.newBuilder().uri(uri)
            .POST(HttpRequest.BodyPublishers.ofByteArray(payload))) {
          case (b, (k, v)) => b.header(k, v)
        }.build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        val node = mapper.readTree(
          if (resp.body().isEmpty) "{}" else resp.body())
        val errType = Option(node.get("__type")).map(_.asText())
        val ok = resp.statusCode() == 200 ||
          errType.exists(_.contains("TransactionCanceledException"))
        val transient = !ok && (resp.statusCode() >= 500 ||
          errType.exists(t => transientTypes.exists(t.contains)))
        if (ok) return node
        require(transient && attempt < maxRetries,
          s"dynamodb: ${target.split('.').last} failed HTTP " +
            s"${resp.statusCode()}: ${resp.body().take(300)}" +
            (if (transient) s" (after $attempt retries)" else ""))
        attempt += 1
        Thread.sleep(math.min(100L * attempt, 2000L))
      }
      throw new IllegalStateException("unreachable")
    }

    var written = 0L
    ops.grouped(batchSize).foreach { group =>
      written += group.length
      if (transactional) {
        // TransactWriteItems: atomic chunk; condition-failed items are
        // dropped and the remainder retried (the documented skip)
        var pending = group.toSeq
        var attempts = 0
        while (pending.nonEmpty) {
          require(attempts <= maxRetries,
            s"dynamodb: transaction not applied after $maxRetries retries")
          attempts += 1
          val body = mapper.createObjectNode()
          val items = body.putArray("TransactItems")
          pending.foreach { op =>
            val wrap = mapper.createObjectNode()
            if (op.put) {
              val put = mapper.createObjectNode()
              put.put("TableName", table)
              put.set[JsonNode]("Item", op.item)
              putCond.foreach(c => put.put("ConditionExpression", c))
              wrap.set[JsonNode]("Put", put)
            } else {
              val del = mapper.createObjectNode()
              del.put("TableName", table)
              del.set[JsonNode]("Key", op.key)
              delCond.foreach(c => del.put("ConditionExpression", c))
              wrap.set[JsonNode]("Delete", del)
            }
            items.add(wrap)
          }
          val resp = call("DynamoDB_20120810.TransactWriteItems", body)
          val cancelled = Option(resp.get("CancellationReasons"))
          if (cancelled.isEmpty) pending = Nil
          else {
            val reasons = cancelled.get
            // condition failures are skipped permanently; every other
            // item of the cancelled transaction (code None, transient
            // conflicts) retries in the next attempt — a cancellation
            // with NO condition failure (pure conflict) retries the
            // whole chunk, bounded by max_retries
            pending = pending.zipWithIndex.filter { case (_, i) =>
              !Option(reasons.get(i))
                .flatMap(n => Option(n.get("Code"))).map(_.asText())
                .contains("ConditionalCheckFailed")
            }.map(_._1)
          }
        }
      } else {
        // BatchWriteItem: unprocessed items are echoed back as complete
        // WriteRequest objects — resend them VERBATIM (matching them
        // back to our own ops would depend on the service's attribute
        // serialization order)
        var pending: Seq[JsonNode] = group.toSeq.map { op =>
          val wrap = mapper.createObjectNode()
          if (op.put) {
            val put = mapper.createObjectNode()
            put.set[JsonNode]("Item", op.item)
            wrap.set[JsonNode]("PutRequest", put)
          } else {
            val del = mapper.createObjectNode()
            del.set[JsonNode]("Key", op.key)
            wrap.set[JsonNode]("DeleteRequest", del)
          }
          wrap
        }
        var attempts = 0
        while (pending.nonEmpty) {
          require(attempts <= maxRetries,
            s"dynamodb: unprocessed items after $maxRetries retries")
          attempts += 1
          val body = mapper.createObjectNode()
          val arr = body.putObject("RequestItems").putArray(table)
          pending.foreach(arr.add)
          val resp = call("DynamoDB_20120810.BatchWriteItem", body)
          pending = Option(resp.get("UnprocessedItems"))
            .flatMap(u => Option(u.get(table)))
            .map(u => (0 until u.size()).map(u.get).toSeq)
            .getOrElse(Nil)
        }
      }
    }
    written
  }
}
