package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** A live-socket stub Iceberg REST catalog (the public REST OpenAPI
  * subset the connector uses): `/v1/config` with a server-side route
  * prefix override, OAuth2 client-credentials token exchange, and
  * `loadTable` serving the CURRENT metadata location of a backing
  * filesystem table — so follow mode discovers new snapshots through
  * the catalog exactly like production, while the table itself evolves
  * on disk via the normal writer.
  */
class IcebergRestStub(tables: Map[String, String],
    credential: Option[String] = None,
    prefix: String = "wh1") {

  @volatile var configCalls = 0
  @volatile var loadTableCalls = 0
  private val issuedToken = "tok-" + java.util.UUID.randomUUID()

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  def port: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$port"

  private def reply(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def authorized(ex: HttpExchange): Boolean =
    credential.isEmpty || Option(
      ex.getRequestHeaders.getFirst("Authorization"))
      .contains(s"Bearer $issuedToken")

  server.createContext("/v1/oauth/tokens", (ex: HttpExchange) => {
    val form = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val params = form.split("&").map(_.split("=", 2)).collect {
      case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap
    val ok = credential.forall { cred =>
      val (id, secret) = cred.split(":", 2) match {
        case Array(s) => ("", s)
        case Array(i, s) => (i, s)
      }
      params.get("grant_type").contains("client_credentials") &&
        params.get("client_id").contains(id) &&
        params.get("client_secret").contains(secret)
    }
    if (ok) reply(ex, 200,
      s"""{"access_token":"$issuedToken","token_type":"bearer"}""")
    else reply(ex, 401, """{"error":"invalid_client"}""")
  })

  server.createContext("/v1/config", (ex: HttpExchange) => {
    configCalls += 1
    if (!authorized(ex)) reply(ex, 401, """{"error":"unauthorized"}""")
    else reply(ex, 200,
      s"""{"defaults":{},"overrides":{"prefix":"$prefix"}}""")
  })

  server.createContext("/v1/", (ex: HttpExchange) => {
    val path = ex.getRequestURI.getPath
    if (!authorized(ex)) { reply(ex, 401, """{"error":"unauthorized"}""") }
    else path.split("/").toList match {
      // /v1/{prefix}/namespaces/{ns}/tables/{tbl}
      case _ :: "v1" :: `prefix` :: "namespaces" :: ns :: "tables" ::
          tbl :: Nil =>
        loadTableCalls += 1
        tables.get(s"$ns.$tbl") match {
          case Some(tableDir) =>
            // serve the CURRENT metadata location (the follow contract)
            val hint = java.nio.file.Paths.get(tableDir,
              "metadata", "version-hint.text")
            val v = new String(
              java.nio.file.Files.readAllBytes(hint), UTF_8).trim
            val loc = s"$tableDir/metadata/v$v.metadata.json"
            reply(ex, 200, s"""{"metadata-location":${
              new com.fasterxml.jackson.databind.ObjectMapper()
                .writeValueAsString(loc)},"config":{}}""")
          case None => reply(ex, 404,
            s"""{"error":{"message":"table not found: $ns.$tbl",""" +
              """"type":"NoSuchTableException","code":404}}""")
        }
      case _ => reply(ex, 404, """{"error":"not found"}""")
    }
  })

  server.start()
  def close(): Unit = server.stop(0)
}
