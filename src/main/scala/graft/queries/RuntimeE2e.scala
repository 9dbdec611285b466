package graft.queries

import org.apache.spark.sql.functions._

import graft.runtime.{CheckpointSync, DurableRunner, HttpShim, Pipeline}
import graft.zset.ZSets
import QB._

/** Runtime-surface components graded through the DuckDB oracle — the
  * final-state-readback discipline the connector rows use (conn_kafka /
  * conn_redis): drive the REAL runtime surface (ad-hoc protocol, view
  * LATENESS, trace-backed state, journal replay, checkpoint sync,
  * resume cursors, HTTP shim, connector orchestration, standing
  * streaming join), read the resulting state back as a relation, and
  * let DuckDB re-derive it. Each row upgrades a SURVEY §2 component
  * from spec-only to oracle-graded.
  */
object RuntimeE2e {

  private val qtyProg =
    """CREATE TABLE lineitem (l_orderkey BIGINT, l_quantity DOUBLE,
      | l_returnflag VARCHAR);
      |CREATE MATERIALIZED VIEW qty_by_flag AS
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
      |    COUNT(*) AS n
      |  FROM lineitem GROUP BY l_returnflag;""".stripMargin

  val queries: Seq[Q] = Seq(
    // Ad-hoc SELECT / INSERT / PREPARE-EXECUTE (§2.7 #95, ad-hoc.md):
    // VALUES insert + INSERT..SELECT against the pipeline's own stepped
    // state + a positional-parameter PREPARE/EXECUTE read — the exact
    // surface the r10 linear-agg crash hit, now oracle-graded.
    Q(
      "pipeline_adhoc",
      """WITH base AS (
        |  SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem
        |  WHERE l_orderkey <= 3000),
        |ins AS (SELECT CAST(k AS BIGINT) AS l_orderkey, q AS l_quantity,
        |  f AS l_returnflag
        |  FROM (VALUES (9000001, 5.0, 'Z'), (9000002, 7.0, 'Z')) v(k, q, f)),
        |sel AS (SELECT l_orderkey + 10000000 AS l_orderkey, l_quantity,
        |  l_returnflag FROM base WHERE l_orderkey % 100 = 0),
        |allr AS (SELECT * FROM base UNION ALL SELECT * FROM ins
        |  UNION ALL SELECT * FROM sel)
        |SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
        |  COUNT(*) AS n
        |FROM allr WHERE l_returnflag <> 'X'
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val pipe = Pipeline(s, qtyProg)
      pipe.step(Map("lineitem" -> ZSets.lift(
        tRaw(s, dir, "lineitem").filter(col("l_orderkey") <= 3000)
          .select("l_orderkey", "l_quantity", "l_returnflag"))))
      pipe.adHoc(
        "INSERT INTO lineitem VALUES (9000001, 5.0, 'Z'), (9000002, 7.0, 'Z')")
      pipe.adHoc(
        "INSERT INTO lineitem SELECT l_orderkey + 10000000, l_quantity, " +
          "l_returnflag FROM lineitem WHERE l_orderkey % 100 = 0")
      pipe.adHoc(
        "PREPARE q AS SELECT l_returnflag, qty, n FROM qty_by_flag " +
          "WHERE l_returnflag <> $1; EXECUTE q('X')")
    },

    // LATENESS on a VIEW column (§2.7 #77, time-series.md:113-127): the
    // timestamp exists only after the view parses it from a raw payload,
    // so the gate rides the VIEW delta; the late third-chunk row is
    // discarded before the downstream aggregate. Literal fixture — the
    // oracle spells the surviving rows.
    Q(
      "pipeline_view_lateness",
      """SELECT k, CAST(SUM(amount) AS BIGINT) AS s, COUNT(*) AS n
        |FROM (VALUES ('a', 10), ('b', 20), ('a', 12), ('b', 7))
        |  v(k, amount)
        |GROUP BY k""".stripMargin) { (s, _) =>
      val pipe = Pipeline(s,
        """CREATE TABLE raw_ev (payload VARCHAR);
          |CREATE LOCAL VIEW parsed AS
          |  SELECT CAST(split_part(payload, '|', 1) AS TIMESTAMP) AS ts,
          |         CAST(split_part(payload, '|', 2) AS BIGINT) AS amount,
          |         split_part(payload, '|', 3) AS k
          |  FROM raw_ev;
          |LATENESS parsed.ts INTERVAL 1 HOUR;
          |CREATE VIEW tot AS
          |  SELECT k, SUM(amount) AS s, COUNT(*) AS n FROM parsed
          |  GROUP BY k;""".stripMargin)
      import s.implicits._
      def ins(rows: String*): Unit =
        pipe.step(Map("raw_ev" -> ZSets.lift(rows.toDF("payload"))))
      ins("2020-01-01 00:00:00|10|a", "2020-01-01 00:30:00|20|b")
      ins("2020-01-01 02:00:00|12|a") // waterline advances to 01:00
      // 00:20 is 40 min behind the waterline → discarded by the gate
      ins("2020-01-01 00:20:00|65|b", "2020-01-01 02:30:00|7|b")
      pipe.adHoc("SELECT * FROM tot")
    },

    // Trace-backed runner state (§2.7 #94): the table's integrated state
    // rides the LSM-tiered trace (memtable bound forced low so the run
    // set SPILLS to bucketed parquet mid-run); three chunks including a
    // retraction wave must still integrate exactly.
    Q(
      "pipeline_trace_backed",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_orderkey <= 6000 AND l_orderkey % 7 <> 0
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val pipe = Pipeline(s, qtyProg, traceBacked = Set("lineitem"),
        traceMemRows = 2000L)
      val li = tRaw(s, dir, "lineitem").filter(col("l_orderkey") <= 6000)
        .select("l_orderkey", "l_quantity", "l_returnflag")
      try {
        pipe.step(Map("lineitem" -> ZSets.lift(
          li.filter(col("l_orderkey") % 2 === 0))))
        pipe.step(Map("lineitem" -> ZSets.lift(
          li.filter(col("l_orderkey") % 2 === 1))))
        pipe.step(Map("lineitem" -> ZSets.negate(ZSets.lift(
          li.filter(col("l_orderkey") % 7 === 0)))))
        pipe.adHoc("SELECT * FROM qty_by_flag").localCheckpoint(true)
      } finally { pipe.close(); () }
    },

    // Checkpoint/journal FT (§2.7 #90): two journaled steps, the runner
    // is abandoned mid-flight ("crash"), and a FRESH runner over the same
    // state dir replays the journal and keeps stepping — the restored
    // final state is what the oracle re-derives.
    Q(
      "pipeline_ft",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |WHERE l_orderkey <= 4000 AND l_orderkey % 9 <> 0
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val state = java.nio.file.Files.createTempDirectory("graft_ft")
      val prog = graft.ddl.Ddl.parse(qtyProg)
      val li = tRaw(s, dir, "lineitem").filter(col("l_orderkey") <= 4000)
        .select("l_orderkey", "l_quantity", "l_returnflag")
      val r1 = new DurableRunner(s, prog, state.toString)
      r1.step(1L, Map("lineitem" -> ZSets.lift(
        li.filter(col("l_orderkey") % 2 === 0))))
      r1.step(2L, Map("lineitem" -> ZSets.lift(
        li.filter(col("l_orderkey") % 2 === 1))))
      // crash: r1 is simply abandoned; the journal is the truth
      val r2 = new DurableRunner(s, prog, state.toString)
      r2.step(3L, Map("lineitem" -> ZSets.negate(ZSets.lift(
        li.filter(col("l_orderkey") % 9 === 0)))))
      r2.pipeline.adHoc("SELECT * FROM qty_by_flag")
    },

    // Checkpoint sync to an object store (§2.1 #23,
    // pipelines/checkpoint-sync.md): push the journal+snapshot mirror,
    // lose the local state, pull into a fresh dir, and reopen — the
    // restored runner's view is the graded relation.
    Q(
      "conn_ckpt_sync",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
        |  COUNT(*) AS n
        |FROM lineitem WHERE l_orderkey <= 3000
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val state = java.nio.file.Files.createTempDirectory("graft_cks_a")
      val remote = java.nio.file.Files.createTempDirectory("graft_cks_r")
      val prog = graft.ddl.Ddl.parse(qtyProg)
      val li = tRaw(s, dir, "lineitem").filter(col("l_orderkey") <= 3000)
        .select("l_orderkey", "l_quantity", "l_returnflag")
      val r1 = new DurableRunner(s, prog, state.toString)
      r1.step(1L, Map("lineitem" -> ZSets.lift(
        li.filter(col("l_orderkey") % 2 === 0))))
      r1.compact() // snapshot + truncation: both layouts must sync
      r1.step(2L, Map("lineitem" -> ZSets.lift(
        li.filter(col("l_orderkey") % 2 === 1))))
      CheckpointSync.push(s, state.toString, remote.toString)
      val state2 = java.nio.file.Files.createTempDirectory("graft_cks_b")
      CheckpointSync.pull(s, remote.toString, state2.toString)
      new DurableRunner(s, prog, state2.toString)
        .pipeline.adHoc("SELECT * FROM qty_by_flag")
    },

    // Connector resume cursors (§2.1 #22): a second pipeline inherits the
    // first one's integrated state AND its exported lakehouse cursor;
    // its next ingest round picks up exactly the commit that arrived
    // after the export — re-ingesting the snapshot would double-count
    // every even key and hash-mismatch.
    Q(
      "pipeline_cursors",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS ksum
        |FROM orders WHERE o_orderkey <= 2000
        |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      val tdir = java.nio.file.Files
        .createTempDirectory("graft_cursors").toString
      val o = tRaw(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderstatus")
      graft.sources.DeltaLake.append(s, tdir,
        o.filter(col("o_orderkey") % 2 === 0))
      val json = s"""[{"name": "d", "transport": {"name": """ +
        s""""delta_table_input", "config": {"uri": "$tdir", """ +
        s""""mode": "snapshot_and_follow"}}}]"""
      val prog =
        s"""CREATE TABLE ord (o_orderkey BIGINT, o_orderstatus VARCHAR)
           | WITH ('connectors' = '$json');
           |CREATE MATERIALIZED VIEW st AS
           |  SELECT o_orderstatus, COUNT(*) AS n,
           |    SUM(o_orderkey) AS ksum
           |  FROM ord GROUP BY o_orderstatus;""".stripMargin
      val p1 = Pipeline(s, prog)
      p1.ingestConnectors() // snapshot round: the even keys
      val cursors = p1.exportConnectorCursors()
      // the odd-key commit lands AFTER the cursor export
      graft.sources.DeltaLake.append(s, tdir,
        o.filter(col("o_orderkey") % 2 === 1))
      // restart: new pipeline, carried state + imported cursors
      val p2 = Pipeline(s, prog)
      p2.step(Map("ord" -> ZSets.lift(p1.adHoc("SELECT * FROM ord"))))
      p2.importConnectorCursors(cursors)
      p2.ingestConnectors() // must ingest ONLY the new commit
      p2.adHoc("SELECT o_orderstatus, n, CAST(ksum AS BIGINT) AS ksum " +
        "FROM st")
    },

    // HTTP ingress/egress shim (§2.1 #16): envelope batches POSTed over
    // a live socket drive real incremental steps; the graded relation is
    // the view read back through GET /egress and decoded from its
    // insert-envelope lines.
    Q(
      "conn_http",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS ksum
        |FROM orders WHERE o_orderkey <= 2000 AND o_orderkey % 5 <> 0
        |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      val shim = HttpShim.serve(Pipeline(s,
        """CREATE TABLE ord (o_orderkey BIGINT, o_orderstatus VARCHAR);
          |CREATE MATERIALIZED VIEW st AS
          |  SELECT o_orderstatus, COUNT(*) AS n, SUM(o_orderkey) AS ksum
          |  FROM ord GROUP BY o_orderstatus;""".stripMargin))
      try {
        val client = java.net.http.HttpClient.newHttpClient()
        def post(path: String, body: String): Int =
          client.send(java.net.http.HttpRequest
            .newBuilder(java.net.URI.create(
              s"http://127.0.0.1:${shim.port}$path"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
            .build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
            .statusCode()
        val o = tRaw(s, dir, "orders").filter(col("o_orderkey") <= 2000)
          .select("o_orderkey", "o_orderstatus")
        val body = to_json(struct(col("o_orderkey"), col("o_orderstatus")))
        // bounded fixture collect (2400 envelope lines), the socket-
        // fixture discipline of the connector rows
        val inserts = o.select(concat(lit("""{"insert": """), body,
          lit("}")).as("l")).as[String](
          org.apache.spark.sql.Encoders.STRING).collect()
        val deletes = o.filter(col("o_orderkey") % 5 === 0)
          .select(concat(lit("""{"delete": """), body, lit("}")).as("l"))
          .as[String](org.apache.spark.sql.Encoders.STRING).collect()
        require(post("/ingress/ord", inserts.mkString("\n")) == 200)
        require(post("/ingress/ord", deletes.mkString("\n")) == 200)
        val resp = client.send(java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(
            s"http://127.0.0.1:${shim.port}/egress/st")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200)
        import s.implicits._
        val lines = resp.body().split("\n").toSeq.filter(_.nonEmpty)
          .toDF("value")
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("o_orderstatus",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("ksum",
            org.apache.spark.sql.types.LongType)))
        ZSets.toMultiset(ZSets.consolidate(
          graft.sources.Envelopes.decodeJson(lines, schema,
            "insert_delete"))).localCheckpoint(true)
      } finally shim.stop()
    },

    // Connector orchestration (§2.1 #21, orchestration.md): two named
    // file connectors on one table, one starting paused; round 1 ingests
    // only the active one, then the paused connector starts and the
    // active one pauses — round 2 ingests exactly the other file. Each
    // file lands exactly once.
    Q(
      "conn_orchestration",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS ksum
        |FROM orders WHERE o_orderkey <= 2000
        |GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      val base = java.nio.file.Files
        .createTempDirectory("graft_orch").toString
      val o = tRaw(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderstatus")
      val body = to_json(struct(col("o_orderkey"), col("o_orderstatus")))
      o.filter(col("o_orderkey") % 2 === 0)
        .select(concat(lit("""{"insert": """), body, lit("}")).as("value"))
        .write.text(s"$base/evens")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(concat(lit("""{"insert": """), body, lit("}")).as("value"))
        .write.text(s"$base/odds")
      val fmt = """"format": {"name": "json", "config": """ +
        """{"update_format": "insert_delete"}}"""
      val json = s"""[{"name": "a", "transport": {"name": "file_input", """ +
        s""""config": {"path": "$base/evens"}}, $fmt}, """ +
        s"""{"name": "b", "paused": true, "transport": {"name": """ +
        s""""file_input", "config": {"path": "$base/odds"}}, $fmt}]"""
      val prog =
        s"""CREATE TABLE ord (o_orderkey BIGINT, o_orderstatus VARCHAR)
           | WITH ('connectors' = '$json');
           |CREATE MATERIALIZED VIEW st AS
           |  SELECT o_orderstatus, COUNT(*) AS n,
           |    SUM(o_orderkey) AS ksum
           |  FROM ord GROUP BY o_orderstatus;""".stripMargin
      val pipe = Pipeline(s, prog)
      pipe.ingestConnectors() // only connector a (b is paused)
      pipe.pauseConnector("ord/a")
      pipe.startConnector("ord/b")
      pipe.ingestConnectors() // only connector b — a must not re-ingest
      pipe.adHoc("SELECT o_orderstatus, n, CAST(ksum AS BIGINT) AS ksum " +
        "FROM st")
    },

    // Standing stream-stream join (§2.3 #43): orders and customers
    // arrive as micro-batches through StreamingPipeline.standingJoin —
    // including a batch where both sides move and a retraction wave —
    // and the accumulated output deltas consolidate to the batch join of
    // the survivors, aggregated for the graded relation.
    Q(
      "inc_stream_join",
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS ksum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey <= 2000 AND o_orderkey % 7 <> 0
        |GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val o = tRaw(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_custkey")
        .as[(Long, Long)].collect()
      val c = tRaw(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .as[(Long, String)].collect()
      val lS = MemoryStream[(Long, Long, Long)] // (k=o_custkey, o_orderkey, w)
      val rS = MemoryStream[(Long, String, Long)] // (k=c_custkey, seg, w)
      val deltas = scala.collection.mutable.Buffer[
        org.apache.spark.sql.DataFrame]()
      val q = graft.runtime.StreamingPipeline.standingJoin(
        lS.toDF().toDF("k", "o_orderkey", ZSets.W),
        rS.toDF().toDF("k", "c_mktsegment", ZSets.W), Seq("k")) {
        (d, _) => deltas += d.localCheckpoint(true); () }
        .outputMode("update").start()
      try {
        // batch 1: even orders only — no matches yet
        lS.addData(o.filter(_._1 % 2 == 0)
          .map(r => (r._2, r._1, 1L)).toSeq)
        q.processAllAvailable()
        // batch 2: ALL customers + odd orders in one micro-batch
        rS.addData(c.map(r => (r._1, r._2, 1L)).toSeq)
        lS.addData(o.filter(_._1 % 2 == 1)
          .map(r => (r._2, r._1, 1L)).toSeq)
        q.processAllAvailable()
        // batch 3: retraction wave (%7 orders leave)
        lS.addData(o.filter(_._1 % 7 == 0)
          .map(r => (r._2, r._1, -1L)).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      ZSets.toMultiset(ZSets.consolidate(deltas.reduce(_ unionByName _)))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("ksum"))
        .localCheckpoint(true)
    }
  )
}
