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

  /** Run `body` with spark.sql.shuffle.partitions pinned to 8 for the
    * micro-batch fixtures: each micro-batch opens/commits one state
    * store instance PER state partition, so 32 partitions x batches is
    * pure instance churn on a ~1.5k-row fixture (measured ~50 task-s,
    * 4-13 pinned); the operators themselves scale with partitions on
    * real data. The previous value is restored even when fixture setup
    * or the stream start throws.
    */
  private def withStatePartitions[T](
      s: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val old = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try body
    finally s.conf.set("spark.sql.shuffle.partitions", old)
  }

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

    // soft_delete + DEFAULT + CONNECTOR_METADATA() (§2.1 #24,
    // connectors/#soft_delete): deletions arrive as flagged INSERTIONS
    // — the table is an append-only change log — with the change kind
    // landing in the column whose DEFAULT reads
    // CONNECTOR_METADATA()['is_delete']. The view reconstructs the
    // docs' "current rows" shape (latest seq per key, kept iff not a
    // delete); the oracle re-derives the same survivors statically.
    Q(
      "conn_soft_delete",
      """SELECT CASE WHEN o_orderkey % 20 = 0 THEN 'R'
        |    ELSE o_orderstatus END AS st,
        |  COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS ksum
        |FROM orders WHERE o_orderkey <= 2000
        |  AND (o_orderkey % 10 <> 0 OR o_orderkey % 20 = 0)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val base = java.nio.file.Files
        .createTempDirectory("graft_softdel").toString
      val o = tRaw(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"))
      def line(kind: String, df: org.apache.spark.sql.DataFrame,
          seq: Long, stCol: org.apache.spark.sql.Column) =
        df.select(concat(lit(s"""{"$kind": """),
          to_json(struct(col("k"), stCol.as("st"), lit(seq).as("seq"))),
          lit("}")).as("value"))
      line("insert", o, 1L, col("st"))
        .union(line("delete", o.filter(col("k") % 10 === 0), 2L, col("st")))
        .union(line("insert", o.filter(col("k") % 20 === 0), 3L, lit("R")))
        .write.text(s"$base/log")
      val json = s"""[{"name": "log", "soft_delete": true,
        | "transport": {"name": "file_input",
        |  "config": {"path": "$base/log"}},
        | "format": {"name": "json",
        |  "config": {"update_format": "insert_delete"}}}]"""
        .stripMargin.replaceAll("\n", "")
      val prog =
        s"""CREATE TABLE ord_log (k BIGINT, st VARCHAR, seq BIGINT,
           | is_delete BOOLEAN DEFAULT
           |  CAST(CONNECTOR_METADATA()['is_delete'] AS BOOLEAN))
           | WITH ('append_only' = 'true', 'connectors' = '$json');
           |CREATE MATERIALIZED VIEW cur AS
           |  SELECT st, COUNT(*) AS n, SUM(k) AS ksum FROM (
           |    SELECT k, st, is_delete,
           |      ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC)
           |        AS rk
           |    FROM ord_log) t WHERE rk = 1 AND NOT is_delete
           |  GROUP BY st;""".stripMargin
      val pipe = Pipeline(s, prog)
      pipe.ingestConnectors()
      pipe.adHoc("SELECT st, n, CAST(ksum AS BIGINT) AS ksum FROM cur")
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
    },

    // Streaming TopK under retraction (§2.6 #74, StatefulOps.topK —
    // reference DBSPIndexedTopKOperator.java:29 / group/topk.rs): three
    // micro-batches — evens, odds, then a retraction wave that removes
    // every group's current head (custkey <= 200), forcing the
    // refill-from-multiset path. The accumulated last emission per key
    // equals the batch top-3 of the survivors, which is the oracle.
    Q(
      "inc_stream_topk",
      """SELECT c_nationkey, rnk, c_custkey FROM (
        |  SELECT c_nationkey, c_custkey,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_custkey) AS rnk
        |  FROM customer WHERE c_custkey > 200)
        |WHERE rnk <= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      withStatePartitions(s) {
      val rows = tRaw(s, dir, "customer")
        .select(col("c_nationkey").cast("long"), col("c_custkey"))
        .as[(Long, Long)].collect()
      val in = MemoryStream[(Long, Long, Long)]
      val last = scala.collection.mutable.Map[Long, Seq[Long]]()
      val q = graft.streaming.StatefulOps.topK(
        in.toDS().map(r =>
          graft.streaming.StatefulOps.Change(r._1, r._2, r._3)), 3)
        .writeStream.outputMode("update")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[
            graft.streaming.StatefulOps.TopK[Long]], _: Long) =>
            b.collect().foreach(t => last(t.key) = t.topk); ()
        }.start()
      try {
        in.addData(rows.filter(_._2 % 2 == 0).map(r => (r._1, r._2, 1L)).toSeq)
        q.processAllAvailable()
        in.addData(rows.filter(_._2 % 2 == 1).map(r => (r._1, r._2, 1L)).toSeq)
        q.processAllAvailable()
        in.addData(rows.filter(_._2 <= 200).map(r => (r._1, r._2, -1L)).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      last.toSeq.flatMap { case (k, vs) =>
        vs.zipWithIndex.map { case (v, i) => (k, (i + 1).toLong, v) }
      }.toDF("c_nationkey", "rnk", "c_custkey")
      }
    },

    // Retractable streaming MIN/MAX (§2.7 #91, StatefulOps.minMax —
    // reference keeps the full group multiset for non-append streams,
    // dynamic/aggregate/min.rs): insert everything, then retract both
    // tails — the live min AND max of every group change, exercising
    // the multiset rescan. Final state equals the batch MIN/MAX of the
    // surviving band.
    Q(
      "inc_stream_minmax",
      """SELECT c_nationkey, MIN(c_custkey) AS mn, MAX(c_custkey) AS mx
        |FROM customer WHERE c_custkey > 200 AND c_custkey <= 1300
        |GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      withStatePartitions(s) {
      val rows = tRaw(s, dir, "customer")
        .select(col("c_nationkey").cast("long"), col("c_custkey"))
        .as[(Long, Long)].collect()
      val in = MemoryStream[(Long, Long, Long)]
      val last = scala.collection.mutable.Map[Long, (Long, Long, Boolean)]()
      val q = graft.streaming.StatefulOps.minMax(
        in.toDS().map(r =>
          graft.streaming.StatefulOps.Change(r._1, r._2, r._3)))
        .writeStream.outputMode("update")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[
            graft.streaming.StatefulOps.MinMax[Long]], _: Long) =>
            b.collect().foreach(m =>
              last(m.key) = (m.min, m.max, m.empty)); ()
        }.start()
      try {
        in.addData(rows.map(r => (r._1, r._2, 1L)).toSeq)
        q.processAllAvailable()
        in.addData(rows.filter(_._2 <= 200).map(r => (r._1, r._2, -1L)).toSeq)
        q.processAllAvailable()
        in.addData(rows.filter(_._2 > 1300).map(r => (r._1, r._2, -1L)).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      last.toSeq.collect { case (k, (mn, mx, false)) => (k, mn, mx) }
        .toDF("c_nationkey", "mn", "mx")
      }
    },

    // Streaming rolling RANGE aggregate with waterline (§2.7 #84,
    // RollingAgg — reference
    // DBSPPartitionedRollingAggregateOperator.java:30): second batch
    // arrives event-time-late (within the watermark), retroactively
    // correcting already-emitted later rows; the final emission per
    // (user, second) equals the batch RANGE frame over everything —
    // the oracle. Timestamps are second-truncated on both sides (the
    // operator keys state by epoch millis; seconds are the shared
    // cross-engine spelling).
    Q(
      "inc_stream_rolling",
      """SELECT DISTINCT user_id, es,
        |  CAST(SUM(v) OVER w AS DOUBLE) AS s,
        |  COUNT(*) OVER w AS c
        |FROM (SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS es,
        |        CAST(FLOOR(value) AS DOUBLE) AS v
        |      FROM events WHERE event_id <= 4000)
        |WINDOW w AS (PARTITION BY user_id ORDER BY es
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin) {
      (s, dir) =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      withStatePartitions(s) {
      val rows = tRaw(s, dir, "events").filter(col("event_id") <= 4000)
        .select(col("event_id"), col("user_id"),
          unix_timestamp(col("ts")).as("es"),
          floor(col("value")).cast("double").as("v"))
        .as[(Long, Long, Long, Double)].collect()
      val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val last = scala.collection.mutable.Map[(Long, Long), (Double, Long)]()
      val events = graft.streaming.Streams.withLateness(
        in.toDF().toDF("key", "ts", "value"), "ts", "3650 days")
        .as[graft.streaming.RollingAgg.RollEvent[Long]]
      val q = graft.streaming.RollingAgg
        .rollingSumCount(events, rangeMs = 3600L * 1000)
        .writeStream.outputMode("update")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[
            graft.streaming.RollingAgg.RollOut[Long]], _: Long) =>
            b.collect().foreach(o =>
              last((o.key, o.ts.getTime / 1000)) = (o.sum, o.cnt)); ()
        }.start()
      def ev(r: (Long, Long, Long, Double)) =
        (r._2, new java.sql.Timestamp(r._3 * 1000), r._4)
      try {
        // batch 1: two thirds of the stream, in whatever event order
        in.addData(rows.filter(_._1 % 3 != 0).map(ev).toSeq)
        q.processAllAvailable()
        // batch 2: the remaining third arrives event-time-LATE (within
        // the watermark) — later rows' windows are re-emitted corrected
        in.addData(rows.filter(_._1 % 3 == 0).map(ev).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      last.toSeq.map { case ((u, es), (sm, c)) => (u, es, sm, c) }
        .toDF("user_id", "es", "s", "c")
      }
    },

    // LATENESS → watermark drop + emit_final (§2.7 #75/#82, Streams —
    // streaming.md:12-18,46-56): append mode emits a window only when
    // the watermark closes it, and rows older than the watermark are
    // dropped. Batch 1 carries the final six days; batch 2 arrives
    // entirely before them — every row is beyond the 1-minute lateness
    // and is discarded. The appended output is exactly the closed
    // windows over batch 1, which the oracle derives with two static
    // time predicates.
    Q(
      "inc_stream_emit_final",
      """SELECT (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600) * 3600
        |    AS wstart,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(FLOOR(value) AS DOUBLE)) AS DOUBLE) AS sv
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-30 23:00:00'
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val cut = java.sql.Timestamp.valueOf("2024-01-25 00:00:00")
      withStatePartitions(s) {
      val rows = tRaw(s, dir, "events")
        .select(col("ts"), col("event_type"),
          floor(col("value")).cast("double").as("v"))
        .as[(java.sql.Timestamp, String, Double)].collect()
      val in = MemoryStream[(java.sql.Timestamp, String, Double)]
      val out = scala.collection.mutable.Buffer[
        (Long, String, Long, Double)]()
      val agg = graft.streaming.Streams.tumbleAgg(
        graft.streaming.Streams.withLateness(
          in.toDF().toDF("ts", "event_type", "v"), "ts", "1 minute"),
        "ts", "1 hour", Seq(col("event_type")),
        Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
      val q = agg.writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select(unix_timestamp(col("window_start")),
            col("event_type"), col("n"), col("sv"))
            .as[(Long, String, Long, Double)].collect()
            .foreach(out += _); ()
        }.start()
      try {
        in.addData(rows.filter(!_._1.before(cut)).toSeq)
        q.processAllAvailable()
        // everything here is > 1 minute behind the watermark — dropped
        in.addData(rows.filter(_._1.before(cut)).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      out.toSeq.toDF("wstart", "event_type", "n", "sv")
      }
    },

    // Multi-view atomic micro-batch fan-out (§2.7 #92,
    // StreamingPipeline.foreachBatchFanout): ONE input stream, two
    // views maintained inside a single foreachBatch so both always see
    // the same batches (the reference's atomic circuit step). Each view
    // accumulates per-batch partial aggregates; the graded relation is
    // both sinks' final contents, tagged and unioned.
    Q(
      "pipeline_fanout",
      """SELECT 'by_flag' AS v, l_returnflag AS k, COUNT(*) AS n,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS ksum
        |FROM lineitem WHERE l_orderkey <= 2000 GROUP BY l_returnflag
        |UNION ALL
        |SELECT 'by_mod', CAST(l_orderkey % 5 AS VARCHAR), COUNT(*),
        |  CAST(SUM(l_orderkey) AS BIGINT)
        |FROM lineitem WHERE l_orderkey <= 2000
        |GROUP BY l_orderkey % 5""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val rows = tRaw(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(col("l_orderkey"), col("l_returnflag"))
        .as[(Long, String)].collect()
      val in = MemoryStream[(Long, String)]
      val partials = scala.collection.mutable.Map[String,
        scala.collection.mutable.Buffer[org.apache.spark.sql.DataFrame]]()
      val views = Seq(
        "by_flag" -> ((b: org.apache.spark.sql.DataFrame) =>
          b.groupBy(col("l_returnflag").as("k"))
            .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("ksum"))),
        "by_mod" -> ((b: org.apache.spark.sql.DataFrame) =>
          b.groupBy((col("l_orderkey") % 5).cast("string").as("k"))
            .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("ksum"))))
      val q = graft.runtime.StreamingPipeline.foreachBatchFanout(
        in.toDF().toDF("l_orderkey", "l_returnflag"), views,
        (name, df, _) => {
          partials.getOrElseUpdate(name,
            scala.collection.mutable.Buffer()) += df.localCheckpoint(true)
          ()
        }).outputMode("update").start()
      try {
        Seq(0L, 1L, 2L).foreach { m =>
          in.addData(rows.filter(_._1 % 3 == m).toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
      views.map { case (name, _) =>
        partials(name).reduce(_ unionByName _)
          .groupBy("k").agg(sum(col("n")).as("n"),
            sum(col("ksum")).as("ksum"))
          .select(lit(name).as("v"), col("k"), col("n"), col("ksum"))
      }.reduce(_ unionByName _).localCheckpoint(true)
    }
  )
}
