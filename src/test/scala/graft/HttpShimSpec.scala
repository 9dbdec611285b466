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
      assert(c1 === 200 && b1 === """{"rows": 4, "token": 1}""")
      // synchronous shim: the token completes as soon as it is issued
      val (_, bt) = send(client, HttpRequest
        .newBuilder(url("/completion_status?token=1")).GET().build())
      assert(bt === """{"complete": true}""")
      val (_, bt2) = send(client, HttpRequest
        .newBuilder(url("/completion_token")).GET().build())
      assert(bt2 === """{"token": 1}""")
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

  test("/metrics serves Prometheus exposition with step counters") {
    val shim = HttpShim.serve(Pipeline(spark, program))
    val client = HttpClient.newHttpClient()
    def url(p: String) = URI.create(s"http://127.0.0.1:${shim.port}$p")
    try {
      send(client, HttpRequest.newBuilder(url("/ingress/item"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"insert": {"id": 1, "qty": 1.0, "tag": "a"}}""")).build())
      val req = HttpRequest.newBuilder(url("/metrics")).GET().build()
      val r = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() === 200)
      assert(r.headers().firstValue("Content-Type").get()
        .startsWith("text/plain"))
      val lines = r.body().linesIterator.toSeq
      assert(lines.contains("# TYPE dbsp_steps_total counter"))
      assert(lines.exists(l => l.startsWith("dbsp_steps_total ")
        && l.split(" ")(1).toLong >= 1L))
      assert(lines.exists(_.startsWith("process_cpu_seconds_total ")))
      assert(lines.exists(_.startsWith("graft_transaction_open 0")))
      // /profile reports each view's IVM maintenance shape
      val pr = client.send(HttpRequest.newBuilder(url("/profile"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(pr.statusCode() === 200)
      assert(pr.body().contains(""""view": "qty_by_tag""""))
      assert(pr.body().contains("GroupAgg"))
    } finally shim.stop()
  }

  test("lifecycle: paused rejects ingress, query plane stays up") {
    val shim = HttpShim.serve(Pipeline(spark, program))
    val client = HttpClient.newHttpClient()
    def url(p: String) = URI.create(s"http://127.0.0.1:${shim.port}$p")
    def post(p: String, body: String = "") = send(client,
      HttpRequest.newBuilder(url(p))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build())
    try {
      val (_, st0) = send(client,
        HttpRequest.newBuilder(url("/status")).GET().build())
      assert(st0.contains(""""deployment_runtime_status": "running""""))
      post("/ingress/item", """{"insert": {"id": 1, "qty": 1.0, "tag": "a"}}""")
      assert(post("/pause")._2 === """{"status": "paused"}""")
      // data plane rejected while paused
      val (c, body) = post("/ingress/item",
        """{"insert": {"id": 2, "qty": 1.0, "tag": "a"}}""")
      assert(c === 400 && body.contains("paused"))
      // query/control planes stay available and show pre-pause state
      val (cq, q) = post("/query", "SELECT * FROM qty_by_tag")
      assert(cq === 200 && q.contains("\"n\""))
      assert(post("/resume")._2 === """{"status": "running"}""")
      val (c2, _) = post("/ingress/item",
        """{"insert": {"id": 2, "qty": 1.0, "tag": "a"}}""")
      assert(c2 === 200)
    } finally shim.stop()
  }

  test("connector orchestration: backfill paused, start, ingest rounds") {
    // two file connectors: historical backfill starts PAUSED, live starts
    // running — the orchestration example's switch-over, driven over HTTP
    val dir = java.nio.file.Files.createTempDirectory("orch")
    val hist = dir.resolve("hist"); val live = dir.resolve("live")
    java.nio.file.Files.createDirectories(hist)
    java.nio.file.Files.createDirectories(live)
    java.nio.file.Files.write(hist.resolve("h.jsonl"),
      """{"insert": {"id": 1, "qty": 100.0, "tag": "h"}}""".getBytes)
    java.nio.file.Files.write(live.resolve("l.jsonl"),
      """{"insert": {"id": 2, "qty": 1.0, "tag": "l"}}""".getBytes)
    val prog =
      s"""CREATE TABLE item (id BIGINT NOT NULL, qty DOUBLE, tag VARCHAR)
         |WITH ('connectors' = '[
         |  {"name": "hist", "paused": true,
         |   "transport": {"name": "file_input", "config": {"path": "$hist"}},
         |   "format": {"name": "json", "config": {"update_format": "insert_delete"}}},
         |  {"name": "live",
         |   "transport": {"name": "file_input", "config": {"path": "$live"}},
         |   "format": {"name": "json", "config": {"update_format": "insert_delete"}}}]');
         |CREATE MATERIALIZED VIEW tags AS
         |  SELECT tag, COUNT(*) AS n FROM item GROUP BY tag;""".stripMargin
    val pipe = Pipeline(spark, prog)
    assert(pipe.connectorState === Map(
      "item/hist" -> false, "item/live" -> true))
    val shim = HttpShim.serve(pipe)
    val client = HttpClient.newHttpClient()
    def url(p: String) = URI.create(s"http://127.0.0.1:${shim.port}$p")
    def post(p: String, body: String = "") = send(client,
      HttpRequest.newBuilder(url(p))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build())
    try {
      // round 1: only the live connector is active
      assert(post("/connectors/ingest")._2.contains("tags"))
      val (_, q1) = post("/query", "SELECT tag FROM tags ORDER BY tag")
      assert(q1.contains("\"l\"") && !q1.contains("\"h\""), q1)
      // activate the backfill, pause live; round 2 ingests history only
      assert(post("/connectors/item/hist/start")._2.contains("running"))
      assert(post("/connectors/item/live/pause")._2.contains("paused"))
      post("/connectors/ingest")
      val (_, q2) = post("/query",
        "SELECT tag, n FROM tags ORDER BY tag")
      assert(q2.contains("\"h\""), q2)
      // live stayed paused: its row was not re-ingested (n stays 1)
      assert(q2.contains("\"n\":1"), q2)
      // unknown connector → 400
      assert(post("/connectors/item/nope/start")._1 === 400)
      // observability snapshot: steps, relation sizes, connector states
      val (cs, bs) = send(client,
        HttpRequest.newBuilder(url("/stats")).GET().build())
      assert(cs === 200, bs)
      assert(bs.contains("\"steps\": 2"), bs)
      assert(bs.contains("\"item/hist\": \"running\""), bs)
      assert(bs.contains("\"item/live\": \"paused\""), bs)
      assert(bs.contains("\"item\": 2") && bs.contains("\"tags\": 2"), bs)
      assert(bs.contains("\"errors\": 0"), bs)
    } finally shim.stop()
  }

  test("transactions over HTTP: buffered ingress, one commit step") {
    val shim = HttpShim.serve(Pipeline(spark, program))
    val client = HttpClient.newHttpClient()
    def url(p: String) = URI.create(s"http://127.0.0.1:${shim.port}$p")
    def post(p: String, body: String = ""): (Int, String) = send(client,
      HttpRequest.newBuilder(url(p))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build())
    try {
      val (cs, bs) = post("/start_transaction")
      assert(cs === 200 && bs === """{"transaction_id": 1}""", bs)
      // a second start while one is open → 400
      assert(post("/start_transaction")._1 === 400)
      // two buffered chunks: view stays empty, tokens stay incomplete
      val (_, t1) = post("/ingress/item",
        """{"insert": {"id": 1, "qty": 2.0, "tag": "a"}}""")
      assert(t1.contains("\"token\": 1"), t1)
      post("/ingress/item",
        """{"insert": {"id": 2, "qty": 3.0, "tag": "a"}}""")
      val (_, q1) = post("/query", "SELECT COUNT(*) AS n FROM qty_by_tag")
      assert(q1.contains("\"n\":0"), q1)
      val (_, st1) = send(client, HttpRequest
        .newBuilder(url("/completion_status?token=1")).GET().build())
      assert(st1 === """{"complete": false}""", st1)
      // commit: one atomic step, view reflects both chunks, tokens done
      val (cc, bc) = post("/commit_transaction")
      assert(cc === 200 && bc.contains("qty_by_tag"), bc)
      val (_, q2) = post("/query",
        "SELECT total, n FROM qty_by_tag WHERE tag = 'a'")
      assert(q2.contains("5.0") && q2.contains("\"n\":2"), q2)
      val (_, st2) = send(client, HttpRequest
        .newBuilder(url("/completion_status?token=2")).GET().build())
      assert(st2 === """{"complete": true}""", st2)
      // stats shows no open transaction; abort without one → 400
      val (_, bstats) = send(client,
        HttpRequest.newBuilder(url("/stats")).GET().build())
      assert(bstats.contains("\"transaction\": null"), bstats)
      assert(post("/abort_transaction")._1 === 400)
    } finally shim.stop()
  }
}
