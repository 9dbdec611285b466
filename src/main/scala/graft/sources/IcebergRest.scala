package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Iceberg REST catalog client (the public Iceberg REST OpenAPI
  * surface; reference behavior: docs/connectors/sources/iceberg.md
  * "Rest catalog configuration", `crates/iceberg/src/input.rs`) — the
  * catalog path production Iceberg tables live behind.
  *
  * Implemented endpoints:
  *  - `POST {oauth2-server-uri | uri/v1/oauth/tokens}` — OAuth2 client
  *    credentials (`rest.credential` = "key:secret"), exchanged for a
  *    bearer token at catalog init;
  *  - `GET {uri}/v1/config?warehouse=…` — server-side overrides,
  *    including the route `prefix`;
  *  - `GET {uri}/v1/{prefix}/namespaces/{ns}/tables/{tbl}` — loadTable:
  *    the response's `metadata-location` is then read by the normal
  *    metadata-direct path (IcebergLake), so snapshot/follow semantics
  *    are IDENTICAL with and without a catalog; follow mode simply
  *    re-loads the table each round to discover the new snapshot head.
  *
  * Config keys mirror the reference: `rest.uri` (required),
  * `rest.warehouse`, `rest.token`, `rest.credential`,
  * `rest.oauth2-server-uri`, `rest.scope`, `rest.prefix`,
  * `rest.headers` (JSON object of extra headers).
  */
object IcebergRest {

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  final case class Catalog(uri: String, prefix: Option[String],
      token: Option[String], extraHeaders: Map[String, String]) {

    private def headers(b: HttpRequest.Builder): HttpRequest.Builder = {
      val withAuth = token.foldLeft(b)((b0, t) =>
        b0.header("Authorization", s"Bearer $t"))
      extraHeaders.foldLeft(withAuth) { case (b0, (k, v)) =>
        b0.header(k, v) }
    }

    private[sources] def get(path: String): JsonNode = {
      val req = headers(HttpRequest.newBuilder()
        .uri(URI.create(s"$uri/v1$path")).GET()).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200,
        s"iceberg rest catalog: GET /v1$path failed HTTP " +
          s"${resp.statusCode()}: ${resp.body().take(300)}")
      mapper.readTree(resp.body())
    }

    /** loadTable: the current metadata location of `ns.table`. */
    def tableMetadataLocation(tableName: String): String = {
      val (ns, tbl) = tableName.lastIndexOf('.') match {
        case -1 => sys.error(
          s"iceberg rest: table_name must be namespace.table: $tableName")
        case i => (tableName.substring(0, i), tableName.substring(i + 1))
      }
      val pfx = prefix.map(p => s"/$p").getOrElse("")
      val nsPath = ns.replace(".", "%1F") // multipart namespace separator
      val node = get(s"$pfx/namespaces/$nsPath/tables/$tbl")
      Option(node.get("metadata-location")).map(_.asText()).getOrElse(
        sys.error(s"iceberg rest: loadTable($tableName) returned no " +
          "metadata-location"))
    }
  }

  /** Initialize a catalog from connector config: token exchange (when
    * `rest.credential` is set and no explicit token), then `/v1/config`
    * for server-side overrides (route prefix).
    */
  def connect(cf: Map[String, String]): Catalog = {
    val uri = cf.getOrElse("rest.uri",
      sys.error("iceberg_input: catalog_type=rest needs rest.uri"))
      .stripSuffix("/")
    val extra = cf.get("rest.headers").map(h =>
      mapper.readTree(h).properties().asScalaPairs).getOrElse(Map.empty)
    val token = cf.get("rest.token").orElse(cf.get("rest.credential")
      .map(cred => oauthToken(
        cf.getOrElse("rest.oauth2-server-uri", s"$uri/v1/oauth/tokens"),
        cred, cf.getOrElse("rest.scope", "catalog"))))
    val boot = Catalog(uri, cf.get("rest.prefix"), token, extra)
    // /v1/config can override the prefix (and is where real servers
    // route multi-warehouse deployments)
    val conf = try boot.get("/config" +
      cf.get("rest.warehouse").map(w => s"?warehouse=" +
        java.net.URLEncoder.encode(w, "UTF-8")).getOrElse(""))
    catch { case _: Exception => null } // config endpoint is optional
    val prefix = Option(conf)
      .flatMap(c => Option(c.get("overrides")))
      .flatMap(o => Option(o.get("prefix")).map(_.asText()))
      .orElse(cf.get("rest.prefix"))
    boot.copy(prefix = prefix)
  }

  /** OAuth2 client-credentials exchange (`key:secret` or `:secret`). */
  private def oauthToken(tokenUri: String, credential: String,
      scope: String): String = {
    val (id, secret) = credential.split(":", 2) match {
      case Array(s) => ("", s)
      case Array(i, s) => (i, s)
    }
    val form = Seq(
      "grant_type" -> "client_credentials",
      "client_id" -> id, "client_secret" -> secret,
      "scope" -> scope)
      .map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }
      .mkString("&")
    val req = HttpRequest.newBuilder().uri(URI.create(tokenUri))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form, UTF_8)).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"iceberg rest: token exchange failed HTTP ${resp.statusCode()}: " +
        resp.body().take(300))
    Option(mapper.readTree(resp.body()).get("access_token"))
      .map(_.asText())
      .getOrElse(sys.error("iceberg rest: token response missing " +
        "access_token"))
  }

  private implicit class PropsOps(
      it: java.util.Set[java.util.Map.Entry[String, JsonNode]]) {
    def asScalaPairs: Map[String, String] = {
      import scala.jdk.CollectionConverters._
      it.asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }
  }
}

/** Amazon S3 Tables catalog client (the public S3 Tables REST API;
  * reference: `crates/iceberg/src/input.rs` open_table_s3tables via the
  * `iceberg-catalog-s3tables` crate, config keys
  * `crates/feldera-types/src/transport/iceberg.rs` "s3tables.*"): one
  * SigV4-signed `GetTableMetadataLocation` call —
  * `GET /tables/{tableBucketARN}/{namespace}/{name}/metadata-location`
  * against `s3tables.<region>.amazonaws.com`, service name `s3tables` —
  * returns the table's current `metadataLocation`, and the normal
  * metadata-direct reader takes over. Because the ARN rides inside the
  * path, the canonical request double-encodes it per the SigV4 spec
  * (`%3A` on the wire → `%253A` canonical; signV4Rest handles this).
  *
  * Config keys mirror the reference: `s3tables.table-bucket-arn`
  * (required), `s3tables.endpoint`, `s3tables.region`,
  * `s3tables.access-key-id`, `s3tables.secret-access-key`,
  * `s3tables.session-token`.
  */
object IcebergS3Tables {

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  /** URI-encode one path segment AWS-style (unreserved chars pass). */
  private[sources] def enc(seg: String): String =
    seg.flatMap { c =>
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c)) c.toString
      else c.toString.getBytes(UTF_8).map(b => f"%%${b & 0xff}%02X")
        .mkString
    }

  def tableMetadataLocation(cf: Map[String, String],
      tableName: String): String = {
    val arn = cf.getOrElse("s3tables.table-bucket-arn", sys.error(
      "iceberg_input: catalog_type=s3tables needs s3tables.table-bucket-arn"))
    // ARN format: arn:aws:s3tables:<region>:<acct>:bucket/<name> — the
    // region default comes from the ARN itself, as in the AWS SDK
    val region = cf.get("s3tables.region")
      .orElse(arn.split(":").lift(3).filter(_.nonEmpty))
      .getOrElse("us-east-1")
    val endpoint = cf.getOrElse("s3tables.endpoint",
      s"https://s3tables.$region.amazonaws.com").stripSuffix("/")
    val accessKey = cf.get("s3tables.access-key-id")
      .orElse(sys.env.get("AWS_ACCESS_KEY_ID")).getOrElse(sys.error(
        "iceberg_input: s3tables catalog needs s3tables.access-key-id"))
    val secret = cf.get("s3tables.secret-access-key")
      .orElse(sys.env.get("AWS_SECRET_ACCESS_KEY")).getOrElse(sys.error(
        "iceberg_input: s3tables catalog needs s3tables.secret-access-key"))
    val (ns, tbl) = tableName.lastIndexOf('.') match {
      case -1 => sys.error(
        s"iceberg s3tables: table_name must be namespace.table: $tableName")
      case i => (tableName.substring(0, i), tableName.substring(i + 1))
    }
    val uri = URI.create(
      s"$endpoint/tables/${enc(arn)}/${enc(ns)}/${enc(tbl)}/metadata-location")
    val headers = DynamoDb.signV4Rest("GET", uri, region, "s3tables",
      Array.emptyByteArray, accessKey, secret,
      extraSigned = cf.get("s3tables.session-token")
        .map(t => Map("x-amz-security-token" -> t)).getOrElse(Map.empty))
    val req = headers.foldLeft(
      HttpRequest.newBuilder().uri(uri).GET()) {
      case (b, (k, v)) => b.header(k, v)
    }.build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"iceberg s3tables: GetTableMetadataLocation failed HTTP " +
        s"${resp.statusCode()}: ${resp.body().take(300)}")
    Option(mapper.readTree(resp.body()).get("metadataLocation"))
      .map(_.asText()).getOrElse(sys.error(
        s"iceberg s3tables: table $tableName has no metadataLocation " +
          "(never written to?)"))
  }
}

/** AWS Glue catalog client for Iceberg tables (the public Glue data
  * catalog API; reference: docs/connectors/sources/iceberg.md "Glue
  * catalog configuration", `crates/iceberg/src/input.rs`
  * open_table_glue): one SigV4-signed `AWSGlue.GetTable` call resolves
  * the table's `metadata_location` parameter — the convention the
  * Iceberg Glue integration stores current metadata under — and the
  * normal metadata-direct reader takes over from there. Reuses the
  * SigV4 implementation pinned against AWS's published test vector.
  *
  * Config keys mirror the reference: `glue.region` (required unless
  * `glue.endpoint` is set), `glue.endpoint`, `glue.access-key-id`,
  * `glue.secret-access-key`, `glue.session-token`, `glue.id`
  * (CatalogId).
  */
object IcebergGlue {

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  def tableMetadataLocation(cf: Map[String, String],
      tableName: String): String = {
    val region = cf.getOrElse("glue.region", "us-east-1")
    val endpoint = cf.getOrElse("glue.endpoint",
      s"https://glue.$region.amazonaws.com")
    val accessKey = cf.get("glue.access-key-id")
      .orElse(sys.env.get("AWS_ACCESS_KEY_ID")).getOrElse(
        sys.error("iceberg_input: glue catalog needs glue.access-key-id"))
    val secret = cf.get("glue.secret-access-key")
      .orElse(sys.env.get("AWS_SECRET_ACCESS_KEY")).getOrElse(sys.error(
        "iceberg_input: glue catalog needs glue.secret-access-key"))
    val (db, tbl) = tableName.lastIndexOf('.') match {
      case -1 => sys.error(
        s"iceberg glue: table_name must be database.table: $tableName")
      case i => (tableName.substring(0, i), tableName.substring(i + 1))
    }
    val body = mapper.createObjectNode()
    body.put("DatabaseName", db).put("Name", tbl)
    cf.get("glue.id").foreach(body.put("CatalogId", _))
    val payload = body.toString.getBytes(UTF_8)
    val uri = URI.create(endpoint)
    val headers = DynamoDb.signV4("POST", uri, region, "glue", payload,
      accessKey, secret, "AWSGlue.GetTable",
      contentType = "application/x-amz-json-1.1",
      extraSigned = cf.get("glue.session-token")
        .map(t => Map("x-amz-security-token" -> t)).getOrElse(Map.empty))
    val req = headers.foldLeft(HttpRequest.newBuilder().uri(uri)
        .POST(HttpRequest.BodyPublishers.ofByteArray(payload))) {
      case (b, (k, v)) => b.header(k, v)
    }.build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"iceberg glue: GetTable failed HTTP ${resp.statusCode()}: " +
        resp.body().take(300))
    Option(mapper.readTree(resp.body()).get("Table"))
      .flatMap(t => Option(t.get("Parameters")))
      .flatMap(p => Option(p.get("metadata_location")))
      .map(_.asText()).getOrElse(sys.error(
        s"iceberg glue: table $tableName has no metadata_location " +
          "parameter (not an Iceberg table?)"))
  }
}
