package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.DynamoDb

/** A live-socket stub AWS Glue data-catalog endpoint speaking the
  * `AWSGlue.GetTable` shape the Iceberg Glue catalog path uses —
  * re-deriving the SigV4 signature server-side from the wire bytes
  * (the DynamoDB stub's discipline) and serving the backing filesystem
  * table's CURRENT metadata location as the Iceberg `metadata_location`
  * table parameter.
  */
class GlueMiniServer(tables: Map[String, String], secret: String,
    sessionToken: Option[String] = None) {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  @volatile var calls = 0
  @volatile var badSignatures = 0

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"

  server.createContext("/", (ex: HttpExchange) => {
    calls += 1
    val payload = ex.getRequestBody.readAllBytes()
    def respond(code: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    val target = ex.getRequestHeaders.getFirst("X-Amz-Target")
    val amzDate = ex.getRequestHeaders.getFirst("X-Amz-Date")
    val auth = ex.getRequestHeaders.getFirst("Authorization")
    val token = Option(ex.getRequestHeaders.getFirst("X-Amz-Security-Token"))
    val now = java.time.LocalDateTime.parse(amzDate,
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
      .toInstant(java.time.ZoneOffset.UTC)
    val accessKey = auth.split("Credential=")(1).split("/")(0)
    val region = auth.split("Credential=")(1).split("/")(2)
    val expected = DynamoDb.signV4("POST",
      java.net.URI.create(endpoint + ex.getRequestURI.getPath),
      region, "glue", payload, accessKey, secret, target, now,
      contentType = "application/x-amz-json-1.1",
      extraSigned = token.map(t =>
        Map("x-amz-security-token" -> t)).getOrElse(Map.empty))(
      "Authorization")
    if (expected != auth || sessionToken != token) {
      badSignatures += 1
      respond(403,
        """{"__type":"InvalidSignatureException","Message":"bad sig"}""")
    } else if (target != "AWSGlue.GetTable") {
      respond(400, s"""{"__type":"UnknownOperationException"}""")
    } else {
      val body = mapper.readTree(payload)
      val name = body.get("DatabaseName").asText() + "." +
        body.get("Name").asText()
      tables.get(name) match {
        case Some(tableDir) =>
          val hint = java.nio.file.Paths.get(tableDir,
            "metadata", "version-hint.text")
          val v = new String(
            java.nio.file.Files.readAllBytes(hint), UTF_8).trim
          val loc = s"$tableDir/metadata/v$v.metadata.json"
          respond(200, s"""{"Table":{"Name":${
            mapper.writeValueAsString(body.get("Name").asText())
          },"Parameters":{"table_type":"ICEBERG","metadata_location":${
            mapper.writeValueAsString(loc)}}}}""")
        case None => respond(400,
          s"""{"__type":"EntityNotFoundException","Message":${
            mapper.writeValueAsString(s"Table $name not found")}}""")
      }
    }
  })

  server.start()
  def close(): Unit = server.stop(0)
}

/** A live-socket stub Amazon S3 Tables endpoint speaking the
  * `GetTableMetadataLocation` resource-path shape
  * (`GET /tables/{tableBucketARN}/{namespace}/{name}/metadata-location`)
  * — re-deriving the SigV4 signature server-side from the wire bytes
  * INCLUDING the double-encoded canonical path the spec requires for
  * non-S3 services, and serving the backing filesystem table's current
  * metadata location.
  */
class S3TablesMiniServer(arn: String, tables: Map[String, String],
    secret: String, sessionToken: Option[String] = None) {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  @volatile var calls = 0
  @volatile var badSignatures = 0

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://127.0.0.1:$port"

  server.createContext("/", (ex: HttpExchange) => {
    calls += 1
    def respond(code: Int, body: String): Unit = {
      val b = body.getBytes(UTF_8)
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    val amzDate = ex.getRequestHeaders.getFirst("X-Amz-Date")
    val auth = ex.getRequestHeaders.getFirst("Authorization")
    val token = Option(ex.getRequestHeaders.getFirst("X-Amz-Security-Token"))
    val now = java.time.LocalDateTime.parse(amzDate,
      java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'"))
      .toInstant(java.time.ZoneOffset.UTC)
    val accessKey = auth.split("Credential=")(1).split("/")(0)
    val region = auth.split("Credential=")(1).split("/")(2)
    // re-derive over the RAW (wire-encoded) path so the double-encoded
    // canonical form is exercised end to end
    val rawPath = ex.getRequestURI.getRawPath
    val expected = DynamoDb.signV4Rest("GET",
      java.net.URI.create(endpoint + rawPath), region, "s3tables",
      Array.emptyByteArray, accessKey, secret, now,
      extraSigned = token.map(t =>
        Map("x-amz-security-token" -> t)).getOrElse(Map.empty))(
      "Authorization")
    val segs = rawPath.stripPrefix("/tables/").split("/")
      .map(s => java.net.URLDecoder.decode(s, "UTF-8"))
    if (expected != auth || sessionToken != token) {
      badSignatures += 1
      respond(403, """{"message":"The request signature we calculated does not match"}""")
    } else if (segs.length != 4 || segs(3) != "metadata-location" ||
        segs(0) != arn) {
      respond(400, """{"message":"bad GetTableMetadataLocation path"}""")
    } else {
      val name = segs(1) + "." + segs(2)
      tables.get(name) match {
        case Some(tableDir) =>
          val hint = java.nio.file.Paths.get(tableDir,
            "metadata", "version-hint.text")
          val v = new String(
            java.nio.file.Files.readAllBytes(hint), UTF_8).trim
          val loc = s"$tableDir/metadata/v$v.metadata.json"
          respond(200, s"""{"metadataLocation":${
            mapper.writeValueAsString(loc)
          },"versionToken":"v$v"}""")
        case None => respond(404,
          s"""{"message":${
            mapper.writeValueAsString(s"Table $name not found")}}""")
      }
    }
  })

  server.start()
  def close(): Unit = server.stop(0)
}
