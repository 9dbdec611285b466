package graft.runtime

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._

import graft.sources.{Envelopes, FileSource}
import graft.zset.ZSets

/** Minimal HTTP ingress/egress/query surface over a [[Pipeline]] — the
  * reference's per-pipeline HTTP API shape (SURVEY §3.2;
  * docs.feldera.com: POST /ingress/{table}, GET /egress/{view},
  * POST /query), built on the JDK's bundled HttpServer so the library
  * keeps its zero-extra-dependency contract:
  *
  *   - POST /ingress/{table}[?update_format=fmt] — body is newline-
  *     delimited JSON update envelopes (insert_delete by default; any
  *     format [[Envelopes.decodeJson]] accepts). The batch is decoded to
  *     a Z-set delta and applied through ONE [[Pipeline.step]]; responds
  *     200 with {"rows": n} after the step commits.
  *   - GET /egress/{view} — the view's CURRENT integrated state as
  *     insert-envelope lines (the snapshot form of the reference's egress
  *     stream; a long-lived change subscription belongs to the streaming
  *     runner, not this shim).
  *   - POST /query — body is ad-hoc SQL (SELECT or INSERT INTO …,
  *     [[Pipeline.adHoc]]); responds with JSON rows.
  *
  * Requests execute on a SINGLE-threaded dispatcher: steps must apply in
  * arrival order (the reference serializes per-pipeline input the same
  * way), and a snapshot read between two steps sees a consistent state.
  *
  * This is a dev/edge shim, not a datacenter ingest tier — at scale bulk
  * data arrives through connectors (Kafka/files); the HTTP surface is
  * for control, tests, and low-volume pushes, which is also how the
  * reference positions it.
  */
final class HttpShim private (pipeline: Pipeline, server: HttpServer) {

  /** Bound port (useful with port = 0). */
  def port: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}

object HttpShim {

  def serve(pipeline: Pipeline, port: Int = 0): HttpShim = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // single thread: serialized steps + consistent reads (see class doc)
    server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor())
    // completion tokens (connectors/completion-tokens.md): the shim's
    // steps are synchronous — an /ingress response means the step has
    // fully evaluated — so a token is a monotone ingest counter and
    // completes as soon as it is issued. The API shape matches the
    // reference (token per ingress response; /completion_token for the
    // current stream position; /completion_status to poll).
    val ingested = new java.util.concurrent.atomic.AtomicLong(0L)
    // tokens issued while a transaction is open complete only at commit:
    // committedFloor trails `ingested` during the transaction window
    val committedFloor = new java.util.concurrent.atomic.AtomicLong(0L)
    // data-plane gate, bound below once the runtime-status machine exists
    var requireRunning: () => Unit = () => ()
    server.createContext("/ingress/", (ex: HttpExchange) =>
      handle(ex) { body =>
        require(ex.getRequestMethod == "POST", "ingress requires POST")
        requireRunning()
        val table = ex.getRequestURI.getPath.stripPrefix("/ingress/")
        val tdef = pipeline.program.tables.find(_.name == table)
          .getOrElse(sys.error(s"unknown table: $table"))
        val fmt = Option(ex.getRequestURI.getQuery)
          .flatMap(_.split("&").find(_.startsWith("update_format="))
            .map(_.stripPrefix("update_format=")))
          .getOrElse("insert_delete")
        val spark = pipeline.session
        val lines = body.split("\n").toSeq.filter(_.trim.nonEmpty)
        import spark.implicits._
        val delta = Envelopes.decodeJson(
          lines.toDF("value"), FileSource.schemaOf(tdef), fmt,
          defaults = graft.sources.Connectors.defaultsOf(tdef, Map.empty))
        pipeline.step(Map(table -> delta))
        val t = ingested.incrementAndGet()
        if (pipeline.transactionInProgress.isEmpty) committedFloor.set(t)
        s"""{"rows": ${lines.size}, "token": $t}"""
      })
    server.createContext("/completion_token", (ex: HttpExchange) =>
      handle(ex) { _ => s"""{"token": ${ingested.get()}}""" })
    server.createContext("/stats", (ex: HttpExchange) =>
      handle(ex) { _ => pipeline.stats() })
    // Runtime status (pipelines/lifecycle.md): the pipeline process's
    // own paused/running state machine. While PAUSED, data-plane calls
    // (ingress, connector ingest rounds) are rejected; the control and
    // query planes (ad-hoc /query, /stats, /metrics, egress of already-
    // computed state) stay available — the reference's paused semantics.
    val runtimeStatus =
      new java.util.concurrent.atomic.AtomicReference[String]("running")
    requireRunning = () => require(runtimeStatus.get() == "running",
      s"pipeline is ${runtimeStatus.get()}: resume it first (/resume)")
    server.createContext("/pause", (ex: HttpExchange) =>
      handle(ex) { _ =>
        require(ex.getRequestMethod == "POST", "pause requires POST")
        runtimeStatus.set("paused"); s"""{"status": "paused"}"""
      })
    server.createContext("/resume", (ex: HttpExchange) =>
      handle(ex) { _ =>
        require(ex.getRequestMethod == "POST", "resume requires POST")
        runtimeStatus.set("running"); s"""{"status": "running"}"""
      })
    server.createContext("/status", (ex: HttpExchange) =>
      handle(ex) { _ =>
        s"""{"deployment_runtime_status": "${runtimeStatus.get()}", """ +
          s""""steps": ${pipeline.stepCount}, """ +
          s""""transaction_open": ${
            pipeline.transactionInProgress.isDefined}}"""
      })
    // Circuit profile (the reference's profile dump surface,
    // operations/visualizing-profiles.md): how each view is MAINTAINED —
    // the IVM planner's shape classification (which exact delta rule
    // runs per step, or recompute-diff for Opaque) plus step count.
    // Pure metadata, no Spark jobs.
    server.createContext("/profile", (ex: HttpExchange) =>
      handle(ex) { _ =>
        val views = pipeline.program.views.map { v =>
          val shape = try pipeline.shapeOf(v.name).toString
            catch { case _: Throwable => "n/a" }
          s"""{"view": ${quote(v.name)}, "shape": ${quote(shape)}}"""
        }.mkString("[", ", ", "]")
        s"""{"steps": ${pipeline.stepCount}, "views": $views}"""
      })
    // Prometheus exposition (operations/metrics.md): the reference's
    // /metrics endpoint. Cheap counters/gauges only — no per-scrape
    // Spark jobs (relation row counts live on /stats, priced on demand).
    server.createContext("/metrics", (ex: HttpExchange) =>
      handle(ex, contentType = "text/plain; version=0.0.4") { _ =>
        val os = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean
        val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
        val mem = java.lang.management.ManagementFactory.getMemoryMXBean
        val threads = java.lang.management.ManagementFactory.getThreadMXBean
        val cpuSec = os match {
          case x: com.sun.management.OperatingSystemMXBean =>
            x.getProcessCpuTime / 1e9
          case _ => 0d
        }
        val fds = os match {
          case u: com.sun.management.UnixOperatingSystemMXBean => Seq(
            "# TYPE process_open_fds gauge",
            s"process_open_fds ${u.getOpenFileDescriptorCount}",
            "# TYPE process_max_fds gauge",
            s"process_max_fds ${u.getMaxFileDescriptorCount}")
          case _ => Seq.empty
        }
        val conns = pipeline.connectorState.toSeq.sorted.map {
          case (k, running) =>
            s"""graft_connector_running{connector="$k"} ${
              if (running) 1 else 0}"""
        }
        (Seq(
          "# HELP dbsp_steps_total Total number of steps executed.",
          "# TYPE dbsp_steps_total counter",
          s"dbsp_steps_total ${pipeline.stepCount}",
          "# TYPE process_cpu_seconds_total counter",
          f"process_cpu_seconds_total $cpuSec%.3f",
          "# TYPE process_start_time_seconds counter",
          s"process_start_time_seconds ${rt.getStartTime / 1000}",
          "# TYPE process_resident_memory_bytes gauge",
          s"process_resident_memory_bytes ${
            mem.getHeapMemoryUsage.getUsed}",
          "# TYPE process_threads gauge",
          s"process_threads ${threads.getThreadCount}",
          "# TYPE graft_transaction_open gauge",
          s"graft_transaction_open ${
            if (pipeline.transactionInProgress.isDefined) 1 else 0}",
          "# TYPE graft_connector_running gauge") ++ fds ++ conns)
          .mkString("", "\n", "\n")
      })
    // transactions (pipelines/transactions.md): start buffers subsequent
    // /ingress chunks; commit applies them as ONE atomic step; abort
    // discards. The single-threaded dispatcher serializes these against
    // in-flight ingests, like the reference's per-pipeline input lock.
    server.createContext("/start_transaction", (ex: HttpExchange) =>
      handle(ex) { _ =>
        require(ex.getRequestMethod == "POST",
          "start_transaction requires POST")
        s"""{"transaction_id": ${pipeline.startTransaction()}}"""
      })
    server.createContext("/commit_transaction", (ex: HttpExchange) =>
      handle(ex) { _ =>
        require(ex.getRequestMethod == "POST",
          "commit_transaction requires POST")
        val out = pipeline.commitTransaction()
        committedFloor.set(ingested.get())
        s"""{"views": [${out.keys.toSeq.sorted
          .map(v => s""""$v"""").mkString(", ")}]}"""
      })
    server.createContext("/abort_transaction", (ex: HttpExchange) =>
      handle(ex) { _ =>
        require(ex.getRequestMethod == "POST",
          "abort_transaction requires POST")
        val id = pipeline.transactionInProgress
          .getOrElse(sys.error("no transaction in progress"))
        pipeline.abortTransaction(id)
        // aborted inputs are RESOLVED (by discard): their tokens complete
        committedFloor.set(ingested.get())
        s"""{"aborted": $id}"""
      })
    server.createContext("/completion_status", (ex: HttpExchange) =>
      handle(ex) { _ =>
        val t = Option(ex.getRequestURI.getQuery)
          .flatMap(_.split("&").find(_.startsWith("token="))
            .map(_.stripPrefix("token=").toLong))
          .getOrElse(sys.error("completion_status requires ?token="))
        s"""{"complete": ${t <= committedFloor.get()}}"""
      })
    server.createContext("/egress/", (ex: HttpExchange) =>
      handle(ex) { _ =>
        require(ex.getRequestMethod == "GET", "egress requires GET")
        val view = ex.getRequestURI.getPath.stripPrefix("/egress/")
        require(pipeline.program.views.exists(_.name == view),
          s"unknown view: $view")
        // integrated snapshot as insert envelopes (unit weights)
        val snap = ZSets.lift(pipeline.adHoc(s"SELECT * FROM $view"))
        Envelopes.encodeJson(snap, "insert_delete")
          .collect().map(_.getString(0)).mkString("\n")
      })
    server.createContext("/query", (ex: HttpExchange) =>
      handle(ex) { body =>
        require(ex.getRequestMethod == "POST", "query requires POST")
        pipeline.adHoc(body.trim).toJSON.collect().mkString("\n")
      })
    // connector orchestration (connectors/orchestration.md): POST
    // /connectors/{table}/{name}/start|pause flips the Running/Paused
    // state; POST /connectors/ingest runs one ingestion round over the
    // currently-active connectors (one atomic step)
    server.createContext("/connectors/", (ex: HttpExchange) =>
      handle(ex) { _ =>
        require(ex.getRequestMethod == "POST", "connectors requires POST")
        val path = ex.getRequestURI.getPath.stripPrefix("/connectors/")
        if (path == "ingest") {
          requireRunning()
          val out = pipeline.ingestConnectors()
          s"""{"views": [${out.keys.toSeq.sorted
            .map(v => s""""$v"""").mkString(", ")}]}"""
        } else path.split("/") match {
          case Array(table, name, "start") =>
            pipeline.startConnector(s"$table/$name"); """{"state": "running"}"""
          case Array(table, name, "pause") =>
            pipeline.pauseConnector(s"$table/$name"); """{"state": "paused"}"""
          case _ => sys.error(
            "expected /connectors/{table}/{name}/start|pause or /connectors/ingest")
        }
      })
    server.start()
    new HttpShim(pipeline, server)
  }

  private def handle(ex: HttpExchange,
      contentType: String = "application/json")(
      f: String => String): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val (code, out) =
      try (200, f(body))
      catch {
        case e: Throwable =>
          (400, s"""{"error": ${quote(e.getMessage)}}""")
      }
    val bytes = out.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      if (code == 200) contentType else "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def quote(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
