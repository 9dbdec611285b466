package graft.sources

/** Confluent-compatible schema-registry resolution for the Avro wire
  * format (the reference's `avro` format `registry_urls` /
  * `schema_registry_config` connector settings —
  * crates/adapters/src/format/avro/ + its schema_registry_settings).
  *
  * The registry protocol needed for DECODE is one idempotent endpoint:
  * `GET {base}/schemas/ids/{id}` → `{"schema": "<escaped avro json>"}`.
  * That ships in the JDK (HttpClient) + Spark's bundled Jackson — no new
  * dependency.
  *
  * Scale discipline: writer schemas are IMMUTABLE by id, so resolution is
  * cached per JVM. Executors decoding a 100 TB Kafka backlog resolve each
  * distinct schema id once per executor (the standard Confluent
  * deserializer behaviour), never per record; the registry sees
  * O(executors × distinct ids) requests total. Multiple base URLs are
  * accepted comma-separated and tried in order (registry HA mirrors).
  */
object SchemaRegistry {

  /** Confluent wire framing: magic 0x00 + 4-byte big-endian schema id. */
  val WireHeaderLen = 5

  def schemaIdOf(bytes: Array[Byte]): Int = {
    require(bytes.length >= WireHeaderLen && bytes(0) == 0x00,
      s"not Confluent-framed avro: need magic byte 0x00 + 4-byte schema " +
        s"id, got ${bytes.take(1).map(b => f"0x$b%02x").mkString} " +
        s"(len ${bytes.length})")
    ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
  }

  // (urls, id) → writer schema json; per-JVM (driver and each executor
  // keep their own — exactly one fetch per id per JVM)
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()

  /** Resolve a writer schema by registry id, cached per JVM. `urls` is a
    * comma-separated base-URL list tried in order.
    */
  def schemaForId(urls: String, id: Int): String =
    cache.computeIfAbsent((urls, id), _ => fetch(urls, id))

  private[sources] def cachedCount: Int = cache.size()

  private def fetch(urls: String, id: Int): String = {
    val bases = urls.split(',').map(_.trim).filter(_.nonEmpty)
    require(bases.nonEmpty, "schema registry: empty url list")
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    var lastErr: Throwable = null
    bases.foreach { base =>
      try {
        val req = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(
            s"${base.stripSuffix("/")}/schemas/ids/$id"))
          .header("Accept",
            "application/vnd.schemaregistry.v1+json, application/json")
          .GET().build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"schema registry $base returned HTTP ${resp.statusCode()} " +
            s"for schema id $id: ${resp.body().take(200)}")
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(resp.body())
        val schema = node.get("schema")
        require(schema != null && schema.isTextual,
          s"schema registry $base: response for id $id has no 'schema' " +
            s"field: ${resp.body().take(200)}")
        return schema.asText()
      } catch {
        case scala.util.control.NonFatal(e) => lastErr = e
      }
    }
    throw new IllegalStateException(
      s"schema registry: could not resolve schema id $id from any of " +
        s"[${bases.mkString(", ")}]", lastErr)
  }

  // (urls, subject, schema) → registered id. Registration is idempotent
  // on the registry side (re-posting an identical schema returns the
  // existing id), so caching per JVM only saves round trips.
  private val registered = new java.util.concurrent.ConcurrentHashMap[
    (String, String, String), Integer]()

  private[sources] def registeredCount: Int = registered.size()

  /** Egress side (the reference's avro encoder `post_schema` step):
    * register a value schema under `subject` and return the id to frame
    * outgoing records with. POST `{base}/subjects/{subject}/versions`.
    */
  def registerSchema(urls: String, subject: String,
      schemaJson: String): Int =
    registered.computeIfAbsent((urls, subject, schemaJson),
      _ => post(urls, subject, schemaJson)).intValue()

  private def post(urls: String, subject: String,
      schemaJson: String): Int = {
    val bases = urls.split(',').map(_.trim).filter(_.nonEmpty)
    require(bases.nonEmpty, "schema registry: empty url list")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val bodyNode = mapper.createObjectNode()
    bodyNode.put("schema", schemaJson)
    val body = bodyNode.toString
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    var lastErr: Throwable = null
    bases.foreach { base =>
      try {
        val req = java.net.http.HttpRequest.newBuilder()
          .uri(java.net.URI.create(s"${base.stripSuffix("/")}/subjects/" +
            s"${java.net.URLEncoder.encode(subject, "UTF-8")}/versions"))
          .header("Content-Type",
            "application/vnd.schemaregistry.v1+json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"schema registry $base returned HTTP ${resp.statusCode()} " +
            s"registering subject $subject: ${resp.body().take(200)}")
        val node = mapper.readTree(resp.body())
        val id = node.get("id")
        require(id != null && id.canConvertToInt,
          s"schema registry $base: register response has no 'id': " +
            s"${resp.body().take(200)}")
        return id.asInt()
      } catch {
        case scala.util.control.NonFatal(e) => lastErr = e
      }
    }
    throw new IllegalStateException(
      s"schema registry: could not register subject $subject at any of " +
        s"[${bases.mkString(", ")}]", lastErr)
  }
}
