package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.runtime.{HttpShim, Pipeline}

/** End-to-end HTTP surface: envelope ingress drives a real incremental
  * step, egress serves the integrated view, /query runs ad-hoc SQL —
  * over a live socket, no mocks.
  */
class HttpShimSpec extends SparkSpec {

  private val program =
    """CREATE TABLE item (id BIGINT NOT NULL, qty DOUBLE, tag VARCHAR);
      |CREATE MATERIALIZED VIEW qty_by_tag AS
      |  SELECT tag, CAST(SUM(CAST(qty AS DECIMAL(18,4))) AS DOUBLE) AS total, COUNT(*) AS n
      |  FROM item GROUP BY tag;""".stripMargin

  private def send(client: HttpClient, req: HttpRequest): (Int, String) = {
    val r = client.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("ingress -> step -> egress -> ad-hoc query over HTTP") {
    val shim = HttpShim.serve(Pipeline(spark, program))
    val client = HttpClient.newHttpClient()
    def url(p: String) = URI.create(s"http://127.0.0.1:${shim.port}$p")
    try {
      // 1. envelope ingress (insert + a same-batch delete cancelling id 3)
      val (c1, b1) = send(client, HttpRequest.newBuilder(url("/ingress/item"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"insert": {"id": 1, "qty": 2.5, "tag": "a"}}
            |{"insert": {"id": 2, "qty": 1.5, "tag": "a"}}
            |{"insert": {"id": 3, "qty": 9.0, "tag": "b"}}
            |{"delete": {"id": 3, "qty": 9.0, "tag": "b"}}""".stripMargin))
        .build())
      assert(c1 === 200 && b1 === """{"rows": 4}""")
      // 2. second batch: the view must update incrementally
      val (c2, _) = send(client, HttpRequest.newBuilder(url("/ingress/item"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"insert": {"id": 4, "qty": 6.0, "tag": "a"}}""")).build())
      assert(c2 === 200)
      // 3. egress: integrated snapshot as insert envelopes
      val (c3, b3) = send(client,
        HttpRequest.newBuilder(url("/egress/qty_by_tag")).GET().build())
      assert(c3 === 200)
      val lines = b3.split("\n").toSet
      assert(lines.exists(l => l.contains("\"insert\"") && l.contains("\"a\"")
        && l.contains("10.0") && l.contains("\"n\":3")), b3)
      assert(!lines.exists(_.contains("\"b\"")), b3) // cancelled group absent
      // 4. ad-hoc SELECT and INSERT through /query
      val (c4, b4) = send(client, HttpRequest.newBuilder(url("/query"))
        .POST(HttpRequest.BodyPublishers.ofString(
          "SELECT total FROM qty_by_tag WHERE tag = 'a'")).build())
      assert(c4 === 200 && b4.contains("10.0"), b4)
      val (c5, _) = send(client, HttpRequest.newBuilder(url("/query"))
        .POST(HttpRequest.BodyPublishers.ofString(
          "INSERT INTO item VALUES (9, 5.0, 'a')")).build())
      assert(c5 === 200)
      val (_, b6) = send(client, HttpRequest.newBuilder(url("/query"))
        .POST(HttpRequest.BodyPublishers.ofString(
          "SELECT total FROM qty_by_tag WHERE tag = 'a'")).build())
      assert(b6.contains("15.0"), b6)
      // 5. errors surface as 400 with a JSON error body
      val (c7, b7) = send(client, HttpRequest.newBuilder(url("/ingress/nope"))
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build())
      assert(c7 === 400 && b7.contains("unknown table"), b7)
    } finally shim.stop()
  }
}
