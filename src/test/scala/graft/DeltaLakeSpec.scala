package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ddl.Ddl
import graft.sources.{Connectors, DeltaLake}
import graft.zset.ZSets

/** Native Delta Lake log protocol: append commits, snapshot/time-travel
  * reads, follow/cdc Z-set deltas, checkpoint compaction, partition
  * pruning, and the sink's change-log form — all without a delta jar
  * (docs/connectors/sources/delta.md, docs/connectors/sinks/delta.md).
  */
class DeltaLakeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("delta").toString

  test("append + snapshot round trip across two commits") {
    val dir = tmp()
    val v0 = DeltaLake.append(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val v1 = DeltaLake.append(spark, dir, Seq((3L, "c")).toDF("id", "s"))
    assert(v0 === 0L && v1 === 1L)
    assert(DeltaLake.snapshot(spark, dir).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))
    // time travel to version 0
    assert(DeltaLake.snapshot(spark, dir, version = Some(0L))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
  }

  test("deleteWhere removes rows; follow emits signed deltas") {
    val dir = tmp()
    DeltaLake.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    DeltaLake.append(spark, dir, Seq((3L, "c")).toDF("id", "s"))
    DeltaLake.deleteWhere(spark, dir, "id = 2")
    assert(DeltaLake.snapshot(spark, dir).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (3L, "c")))
    // follow after version 0: +3c (v1), then v2 rewrites the (1,2) file
    // into a survivor file: +1a −1a −2b net = {+3c, −2b}
    val delta = ZSets.consolidate(
      DeltaLake.changes(spark, dir, startVersion = 0L))
      .as[(Long, String, Long)].collect().toSet
    assert(delta === Set((3L, "c", 1L), (2L, "b", -1L)))
  }

  test("checkpoint bounds replay: reads work after early commits vanish") {
    val dir = tmp()
    DeltaLake.append(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    DeltaLake.append(spark, dir, Seq((2L, "b")).toDF("id", "s"))
    DeltaLake.checkpoint(spark, dir)
    DeltaLake.append(spark, dir, Seq((3L, "c")).toDF("id", "s"))
    // simulate log cleanup: drop the pre-checkpoint JSON commits
    val log = new java.io.File(dir, "_delta_log")
    Seq(0L, 1L).foreach { v =>
      assert(new java.io.File(log, f"$v%020d.json").delete())
    }
    assert(DeltaLake.snapshot(spark, dir).as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("partitioned table: values restored, filter prunes branches") {
    val dir = tmp()
    DeltaLake.append(spark, dir,
      Seq((1L, "us", 10.0), (2L, "eu", 20.0), (3L, "us", 30.0))
        .toDF("id", "region", "v"),
      partitionBy = Seq("region"))
    val all = DeltaLake.snapshot(spark, dir)
    assert(all.as[(Long, String, Double)].collect().toSet
      === Set((1L, "us", 10.0), (2L, "eu", 20.0), (3L, "us", 30.0)))
    // a partition-column predicate constant-folds per union branch: the
    // optimized plan must scan only the matching partition's files
    val pruned = DeltaLake.snapshot(spark, dir,
      filter = Some("region = 'eu'"))
    assert(pruned.as[(Long, String, Double)].collect().toSet
      === Set((2L, "eu", 20.0)))
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.inputFiles.length
      }).sum
    assert(scanned === 1, "non-matching partition branches must be pruned")
  }

  test("datetime pins the version by commit timestamp") {
    val dir = tmp()
    DeltaLake.append(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    val cut = java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC)
    Thread.sleep(20)
    DeltaLake.append(spark, dir, Seq((2L, "b")).toDF("id", "s"))
    val asOf = DeltaLake.snapshot(spark, dir,
      datetime = Some(cut.toString))
    assert(asOf.as[(Long, String)].collect().toSet === Set((1L, "a")))
  }

  test("cdc mode: delete filter weights, order lands in _seq") {
    val dir = tmp()
    // an append-only action log: op + seq + payload
    DeltaLake.append(spark, dir,
      Seq(("ins", 1L, 10L, "x"), ("ins", 2L, 20L, "y"))
        .toDF("op", "seq", "k", "s"))
    DeltaLake.append(spark, dir,
      Seq(("del", 3L, 10L, "x"), ("ins", 4L, 10L, "x2"))
        .toDF("op", "seq", "k", "s"))
    val d = DeltaLake.cdc(spark, dir, startVersion = -1L,
      deleteFilter = Some("op = 'del'"), orderBy = Some("seq"))
    val rows = d.select("k", "s", ZSets.W, "_seq")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(rows === Set((10L, "x", 1L, 1L), (20L, "y", 1L, 2L),
      (10L, "x", -1L, 3L), (10L, "x2", 1L, 4L)))
  }

  test("connector dispatch: snapshot, follow, snapshot_and_follow") {
    val dir = tmp()
    DeltaLake.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("a", "b"))
    DeltaLake.append(spark, dir, Seq((3L, "c")).toDF("a", "b"))
    def conf(extra: String) = {
      val json = s"""[{"transport": {"name": "delta_table_input", """ +
        s""""config": {"uri": "$dir"$extra}}}]"""
      val t = Ddl.parse("CREATE TABLE t (a BIGINT NOT NULL, b VARCHAR) " +
        s"WITH ('connectors' = '$json');").tables.head
      (t, Connectors.connectorsOf(t).head)
    }
    val (t1, c1) = conf(""", "mode": "snapshot"""")
    assert(Connectors.read(spark, t1, c1).as[(Long, String, Long)]
      .collect().toSet
      === Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)))
    val (t2, c2) = conf(""", "mode": "follow", "version": "0"""")
    assert(Connectors.read(spark, t2, c2).as[(Long, String, Long)]
      .collect().toSet === Set((3L, "c", 1L)))
    val (t3, c3) = conf(
      """, "mode": "snapshot_and_follow", "version": "0"""")
    assert(Connectors.read(spark, t3, c3).as[(Long, String, Long)]
      .collect().toSet
      === Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)))
    val (t4, c4) = conf(
      """, "mode": "snapshot", "snapshot_filter": "a >= 2"""")
    assert(Connectors.read(spark, t4, c4).as[(Long, String, Long)]
      .collect().toSet === Set((2L, "b", 1L), (3L, "c", 1L)))
  }

  test("pipeline follow-mode ingest advances a cursor per round") {
    val dir = tmp()
    DeltaLake.append(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val prog =
      s"""CREATE TABLE t (k BIGINT, v BIGINT) WITH ('connectors' = '[
         |  {"name": "d", "transport": {"name": "delta_table_input",
         |   "config": {"uri": "$dir", "mode": "snapshot_and_follow"}}}]');
         |CREATE VIEW s AS SELECT SUM(v) AS total, COUNT(*) AS n FROM t;
         |""".stripMargin
    val pipe = graft.runtime.Pipeline(spark, prog)
    // round 1: the snapshot
    pipe.ingestConnectors()
    def state() = pipe.adHoc("SELECT * FROM s").as[(Long, Long)]
      .collect().toSet
    assert(state() === Set((30L, 2L)))
    // round 2: nothing new — view unchanged, ingest is a no-op delta
    pipe.ingestConnectors()
    assert(state() === Set((30L, 2L)))
    // a new commit arrives; round 3 ingests exactly that commit
    DeltaLake.append(spark, dir, Seq((3L, 5L)).toDF("k", "v"))
    pipe.ingestConnectors()
    assert(state() === Set((35L, 3L)))
    // a delete commit follows; round 4 retracts those rows
    DeltaLake.deleteWhere(spark, dir, "k = 1")
    pipe.ingestConnectors()
    assert(state() === Set((25L, 2L)))
  }

  test("follow cursors survive migrate: no snapshot re-ingest") {
    val dir = tmp()
    DeltaLake.append(spark, dir, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    val prog =
      s"""CREATE TABLE t (k BIGINT, v BIGINT) WITH ('connectors' = '[
         |  {"name": "d", "transport": {"name": "delta_table_input",
         |   "config": {"uri": "$dir", "mode": "snapshot_and_follow"}}}]');
         |CREATE VIEW s AS SELECT CAST(SUM(v) AS BIGINT) AS total FROM t;
         |""".stripMargin
    val p1 = graft.runtime.Pipeline(spark, prog)
    p1.ingestConnectors()
    // migrate with an ADDED view; carried table keeps its state AND
    // its connector cursor
    val (p2, _) = p1.migrate(prog.replace(
      "CREATE VIEW s AS",
      "CREATE VIEW n AS SELECT COUNT(*) AS c FROM t;\nCREATE VIEW s AS"))
    def total() = p2.adHoc("SELECT * FROM s").as[Long].head()
    assert(total() === 30L)
    // an ingest round on the migrated pipeline must be a NO-OP (the
    // snapshot is already in the carried state) ...
    p2.ingestConnectors()
    assert(total() === 30L, "snapshot re-ingested after migrate")
    // ... while a genuinely new commit still flows
    DeltaLake.append(spark, dir, Seq((3L, 5L)).toDF("k", "v"))
    p2.ingestConnectors()
    assert(total() === 35L)
  }

  test("timestamp_column snapshot ingests in LATENESS-width ordered " +
      "chunks") {
    val dir = tmp()
    // 6 hours of events written UNORDERED into one Delta commit
    val rows = Seq(5, 2, 0, 4, 1, 3).map(h =>
      (h.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 0$h%d:30:00")))
    DeltaLake.append(spark, dir, rows.toDF("id", "ts"))
    val prog =
      s"""CREATE TABLE ev (id BIGINT,
         |  ts TIMESTAMP LATENESS INTERVAL 1 HOUR) WITH ('connectors' = '[
         |  {"name": "d", "transport": {"name": "delta_table_input",
         |   "config": {"uri": "$dir", "mode": "snapshot",
         |    "timestamp_column": "ts"}}}]');
         |CREATE VIEW agg AS SELECT COUNT(*) AS n, MAX(ts) AS hi FROM ev;
         |""".stripMargin
    val pipe = graft.runtime.Pipeline(spark, prog)
    val out = pipe.ingestConnectors()
    // every row survives: each 1-hour chunk arrives in ascending order,
    // so nothing is more than LATENESS behind the advancing waterline —
    // exactly the live-stream equivalence the ordered ingest guarantees
    assert(pipe.adHoc("SELECT COUNT(*) FROM ev").as[Long].head() === 6L)
    assert(pipe.errorView.count() === 0L)
    // the merged output delta across chunks nets to the final view row
    assert(out.contains("agg"))
    // an UNORDERED one-step ingest of the same data would have dropped
    // late rows: prove the waterline actually advanced per chunk by
    // ingesting an hour-0 row now — it must be discarded as late
    pipe.step(Map("ev" -> graft.zset.ZSets.lift(
      Seq((9L, java.sql.Timestamp.valueOf("2024-01-01 00:45:00")))
        .toDF("id", "ts"))))
    assert(pipe.adHoc("SELECT COUNT(*) FROM ev").as[Long].head() === 6L)
    assert(pipe.errorView.count() === 1L)
  }

  test("compactFiles merges small files; vacuum reclaims dead ones") {
    val dir = tmp()
    (0 until 4).foreach(i =>
      DeltaLake.append(spark, dir, Seq((i.toLong, s"v$i")).toDF("id", "s")))
    val before = DeltaLake.reconstruct(spark, dir).files.size
    assert(before >= 4)
    DeltaLake.compactFiles(spark, dir, targetFiles = 1)
    val snap = DeltaLake.reconstruct(spark, dir)
    assert(snap.files.size === 1)
    assert(DeltaLake.snapshot(spark, dir).as[(Long, String)].collect()
      .toSet === (0 until 4).map(i => (i.toLong, s"v$i")).toSet)
    // the pre-compaction files are dead: vacuum with zero retention
    // deletes them, and the snapshot still reads fine
    val reclaimed = DeltaLake.vacuum(spark, dir, retainMillis = 0L)
    assert(reclaimed >= 4)
    assert(DeltaLake.snapshot(spark, dir).count() === 4L)
  }

  test("v2 checkpoint round trip: UUID manifest + sidecar bound replay, " +
      "DVs and txns survive") {
    val dir = tmp()
    DeltaLake.append(spark, dir,
      (0L until 20L).map(i => (i, s"r$i")).toDF("id", "s").coalesce(1))
    DeltaLake.append(spark, dir, Seq((100L, "x")).toDF("id", "s"),
      txn = Some(("appA", 7L)))
    DeltaLake.deleteWhereDv(spark, dir, "id = 3") // DV into the checkpoint
    DeltaLake.checkpointV2(spark, dir)
    // the layout is the v2 one: a UUID-named manifest + a sidecar file
    val log = new java.io.File(dir, "_delta_log")
    val manifest = log.listFiles().map(_.getName)
      .filter(_.matches("\\d{20}\\.checkpoint\\.[0-9a-f-]{36}\\.parquet"))
    assert(manifest.length === 1)
    assert(new java.io.File(log, "_sidecars").listFiles()
      .count(_.getName.endsWith(".parquet")) === 1)
    DeltaLake.append(spark, dir, Seq((101L, "y")).toDF("id", "s"))
    // drop the pre-checkpoint JSON commits: replay must start at the
    // v2 checkpoint
    Seq(0L, 1L, 2L).foreach { v =>
      assert(new java.io.File(log, f"$v%020d.json").delete())
    }
    val got = DeltaLake.snapshot(spark, dir).as[(Long, String)]
      .collect().toSet
    assert(got === ((0L until 20L).filter(_ != 3L)
      .map(i => (i, s"r$i")).toSet ++ Set((100L, "x"), (101L, "y"))))
    val snap2 = DeltaLake.reconstruct(spark, dir, None)
    // txn bookkeeping survives the checkpoint
    assert(snap2.txns === Map("appA" -> 7L))
    // the protocol survives too: deleteWhereDv upgraded to reader 3 +
    // deletionVectors, and the checkpoint is the only place left that
    // records it after the commit cleanup above
    assert(snap2.minReaderVersion === 3)
    assert(snap2.readerFeatures.contains("deletionVectors"))
  }

  test("an incomplete multi-part checkpoint fails loudly") {
    val dir = tmp()
    DeltaLake.append(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    DeltaLake.append(spark, dir, Seq((2L, "b")).toDF("id", "s"))
    DeltaLake.checkpoint(spark, dir)
    val log = new java.io.File(dir, "_delta_log")
    // fake a 2-part layout with part 2 missing
    val classic = new java.io.File(log, f"${1L}%020d.checkpoint.parquet")
    assert(classic.renameTo(new java.io.File(log,
      f"${1L}%020d.checkpoint.${1}%010d.${2}%010d.parquet")))
    val e = intercept[IllegalArgumentException](
      DeltaLake.reconstruct(spark, dir, None))
    assert(e.getMessage.contains("incomplete"))
  }

  test("v2 checkpoint with a JSON manifest (foreign-writer layout) reads " +
      "correctly") {
    val dir = tmp()
    DeltaLake.append(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1))
    DeltaLake.append(spark, dir, Seq((3L, "c")).toDF("id", "s").coalesce(1))
    val snap = DeltaLake.reconstruct(spark, dir, None)
    val log = new java.io.File(dir, "_delta_log")
    // hand-build: sidecar parquet carries ONE add; the other add lives
    // inline in the manifest (both positions are legal in the spec)
    val Seq(a0, a1) = snap.files.sortBy(_.path).toSeq
    val addType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("partitionValues",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.types.StructField("size",
        org.apache.spark.sql.types.LongType)))
    val scRows = Seq(org.apache.spark.sql.Row(
      org.apache.spark.sql.Row(a1.path, a1.partitionValues, a1.size)))
    import scala.jdk.CollectionConverters._
    val tmpDir = new java.io.File(log, ".sc-build")
    spark.createDataFrame(scRows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("add", addType))))
      .repartition(1).write.mode("overwrite").parquet(tmpDir.toString)
    val part = tmpDir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val scDir = new java.io.File(log, "_sidecars"); scDir.mkdirs()
    val scName = java.util.UUID.randomUUID().toString + ".parquet"
    assert(part.renameTo(new java.io.File(scDir, scName)))
    org.apache.commons.io.FileUtils.deleteDirectory(tmpDir)
    val uuid = java.util.UUID.randomUUID().toString
    Files.write(new java.io.File(log,
      f"${1L}%020d.checkpoint.$uuid.json").toPath, (Seq(
      s"""{"checkpointMetadata":{"version":1}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],""" +
        """"writerFeatures":["v2Checkpoint"]}}""",
      s"""{"metaData":{"id":"m","schemaString":${mapperJson(
        snap.schema.json)},"partitionColumns":[],"configuration":{},""" +
        s""""format":{"provider":"parquet","options":{}}}}""",
      s"""{"txn":{"appId":"appB","version":9}}""",
      s"""{"add":{"path":"${a0.path}","partitionValues":{},""" +
        s""""size":${a0.size},"modificationTime":1,"dataChange":true}}""",
      s"""{"sidecar":{"path":"$scName","sizeInBytes":1,""" +
        s""""modificationTime":1}}""").mkString("\n") + "\n").getBytes)
    Files.write(new java.io.File(log, "_last_checkpoint").toPath,
      """{"version":1,"size":6}""".getBytes)
    // drop the replayed JSON commits entirely: only the v2 checkpoint
    // (with the v2Checkpoint protocol feature) can serve the read
    Seq(0L, 1L).foreach { v =>
      assert(new java.io.File(log, f"$v%020d.json").delete())
    }
    assert(DeltaLake.snapshot(spark, dir).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(DeltaLake.reconstruct(spark, dir, None).txns === Map("appB" -> 9L))
  }

  test("inCommitTimestamp is authoritative for datetime time travel") {
    val dir = tmp()
    DeltaLake.append(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    // a foreign writer with the inCommitTimestamp feature: commitInfo
    // carries BOTH stamps; the in-commit one (much earlier) must win
    val snap = DeltaLake.reconstruct(spark, dir, None)
    val add = snap.files.head
    appendCommit(dir, 1L, Seq(
      s"""{"commitInfo":{"timestamp":9999999999999,""" +
        s""""inCommitTimestamp":1000000000000,"operation":"WRITE"}}""",
      s"""{"add":{"path":"${add.path}x","partitionValues":{},""" +
        s""""size":1,"modificationTime":1,"dataChange":true}}"""))
    val stamps = DeltaLake.reconstruct(spark, dir, None).timestamps
    assert(stamps(1L) === 1000000000000L)
    // datetime just after the in-commit stamp resolves to version 1
    assert(DeltaLake.versionAt(spark, dir,
      "2001-09-09T01:46:41Z") === 1L)
  }

  test("multi-part classic checkpoint reads all parts") {
    val dir = tmp()
    DeltaLake.append(spark, dir, Seq((1L, "a")).toDF("id", "s").coalesce(1))
    DeltaLake.append(spark, dir, Seq((2L, "b")).toDF("id", "s").coalesce(1))
    val snap = DeltaLake.reconstruct(spark, dir, None)
    val log = new java.io.File(dir, "_delta_log")
    val Seq(a0, a1) = snap.files.sortBy(_.path).toSeq
    import scala.jdk.CollectionConverters._
    val addType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("partitionValues",
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.types.StructField("size",
        org.apache.spark.sql.types.LongType)))
    val metaType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("schemaString",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("partitionColumns",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    val partSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("add", addType),
      org.apache.spark.sql.types.StructField("metaData", metaType)))
    def writePart(rows: Seq[org.apache.spark.sql.Row], name: String): Unit = {
      val tmpDir = new java.io.File(log, ".mp-build")
      spark.createDataFrame(rows.asJava, partSchema).repartition(1)
        .write.mode("overwrite").parquet(tmpDir.toString)
      val p = tmpDir.listFiles().filter(_.getName.endsWith(".parquet")).head
      assert(p.renameTo(new java.io.File(log, name)))
      org.apache.commons.io.FileUtils.deleteDirectory(tmpDir)
    }
    // part 1 carries metaData + the first add, part 2 the second add
    writePart(Seq(
      org.apache.spark.sql.Row(null,
        org.apache.spark.sql.Row(snap.schema.json, Seq.empty[String])),
      org.apache.spark.sql.Row(
        org.apache.spark.sql.Row(a0.path, a0.partitionValues, a0.size),
        null)),
      f"${1L}%020d.checkpoint.${1}%010d.${2}%010d.parquet")
    writePart(Seq(org.apache.spark.sql.Row(
      org.apache.spark.sql.Row(a1.path, a1.partitionValues, a1.size), null)),
      f"${1L}%020d.checkpoint.${2}%010d.${2}%010d.parquet")
    Files.write(new java.io.File(log, "_last_checkpoint").toPath,
      """{"version":1,"size":3,"parts":2}""".getBytes)
    Seq(0L, 1L).foreach { v =>
      assert(new java.io.File(log, f"$v%020d.json").delete())
    }
    assert(DeltaLake.snapshot(spark, dir).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b")))
  }

  private def mapperJson(s: String): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.writeValueAsString(s)
  }

  test("unsupported reader features fail loudly, never mis-read") {
    val dir = tmp()
    DeltaLake.append(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    // forge a protocol upgrade to a feature this reader does not know
    val log = new java.io.File(dir, "_delta_log")
    Files.write(new java.io.File(log, f"${1L}%020d.json").toPath,
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["futureMagicEncoding"],""" +
        """"writerFeatures":["futureMagicEncoding"]}}""" + "\n").getBytes)
    val e = intercept[IllegalArgumentException](
      DeltaLake.snapshot(spark, dir))
    assert(e.getMessage.contains("futureMagicEncoding"))
  }

  private def hadoopFs(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def appendCommit(dir: String, version: Long,
      lines: Seq[String]): Unit = {
    val log = new java.io.File(dir, "_delta_log")
    Files.write(new java.io.File(log, f"$version%020d.json").toPath,
      (lines.mkString("\n") + "\n").getBytes)
  }

  test("deletion vectors: sidecar-marked rows vanish from snapshot, " +
      "and follow retracts exactly the newly-deleted rows") {
    import graft.sources.DeltaDv
    val dir = tmp()
    DeltaLake.append(spark, dir,
      Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("id", "s")
        .coalesce(1))
    val snap0 = DeltaLake.reconstruct(spark, dir, None)
    val add = snap0.files.head
    val (fsys, rootP) = hadoopFs(dir)
    // a modern-writer DELETE: sidecar DV marking physical rows 1 and 3,
    // commit re-adds the file with the DV and removes the DV-less one
    val dv = DeltaDv.writeSidecar(fsys, rootP, Array(1L, 3L))
    appendCommit(dir, 1L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      s"""{"add":{"path":"${add.path}","partitionValues":{},""" +
        s""""size":${add.size},"modificationTime":1,"dataChange":true,""" +
        s""""deletionVector":${DeltaDv.descriptorJson(dv)}}}""",
      s"""{"remove":{"path":"${add.path}","deletionTimestamp":1,""" +
        s""""dataChange":true}}"""))
    assert(DeltaLake.snapshot(spark, dir).as[(Long, String)]
      .collect().toSet === Set((0L, "a"), (2L, "c")))
    // time travel below the DML still sees all rows
    assert(DeltaLake.snapshot(spark, dir, version = Some(0L)).count() === 4)
    // follow mode: add(file∖dv) − remove(file) = −deleted rows only
    val ch = ZSets.consolidate(DeltaLake.changes(spark, dir, 0L))
      .as[(Long, String, Long)].collect().toSet
    assert(ch === Set((1L, "b", -1L), (3L, "d", -1L)))
    // checkpoint preserves the DV (no row resurrection)
    DeltaLake.checkpoint(spark, dir)
    appendCommit(dir, 2L,
      Seq("""{"commitInfo":{"timestamp":2,"operation":"NOOP"}}"""))
    assert(DeltaLake.snapshot(spark, dir).as[(Long, String)]
      .collect().toSet === Set((0L, "a"), (2L, "c")))
  }

  test("deletion vectors: inline storage and large bitmaps round-trip") {
    import graft.sources.DeltaDv
    // codec: array + bitmap containers, multiple 32-bit key spaces
    val big = (0L until 5000L).toArray ++
      Array(70000L, (1L << 32) | 7L, (1L << 32) | 99L)
    assert(DeltaDv.deserialize(DeltaDv.serialize(big)).toSeq
      === big.toSeq.sorted)
    assert(DeltaDv.z85Decode(DeltaDv.z85Encode(
      Array[Byte](0, 1, -1, 127, -128, 55, 0, 9))).toSeq
      === Seq[Byte](0, 1, -1, 127, -128, 55, 0, 9))
    val u = java.util.UUID.randomUUID()
    assert(DeltaDv.z85ToUuid(DeltaDv.uuidToZ85(u)) === u)

    val dir = tmp()
    DeltaLake.append(spark, dir,
      Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "s").coalesce(1))
    val snap0 = DeltaLake.reconstruct(spark, dir, None)
    val add = snap0.files.head
    val inline = DeltaDv.inlineDescriptor(Array(0L))
    appendCommit(dir, 1L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      s"""{"add":{"path":"${add.path}","partitionValues":{},""" +
        s""""size":${add.size},"modificationTime":1,"dataChange":true,""" +
        s""""deletionVector":${DeltaDv.descriptorJson(inline)}}}"""))
    assert(DeltaLake.snapshot(spark, dir).as[(Long, String)]
      .collect().toSet === Set((1L, "b"), (2L, "c")))
  }

  test("deleteWhereDv: DV fast-path DELETE merges vectors across DMLs " +
      "and never rewrites data files") {
    val dir = tmp()
    DeltaLake.append(spark, dir,
      (0L until 100L).map(i => (i, s"r$i")).toDF("id", "s"))
    val dataFiles0 = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    DeltaLake.deleteWhereDv(spark, dir, "id % 10 = 0")
    DeltaLake.deleteWhereDv(spark, dir, "id % 7 = 0")
    val got = DeltaLake.snapshot(spark, dir).as[(Long, String)]
      .collect().map(_._1).toSet
    assert(got === (0L until 100L).filter(i => i % 10 != 0 && i % 7 != 0)
      .toSet)
    // the original data files are untouched (only sidecars were added)
    val dataFiles1 = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(dataFiles1 === dataFiles0)
    // vacuum keeps live sidecars: reads still work afterwards
    DeltaLake.vacuum(spark, dir, retainMillis = 0L)
    assert(DeltaLake.snapshot(spark, dir).count() === got.size.toLong)
  }

  test("column mapping: physical parquet names resolve to the logical " +
      "schema, including partition values keyed by physical name") {
    val dir = tmp()
    val (fsys, rootP) = hadoopFs(dir)
    fsys.mkdirs(new org.apache.hadoop.fs.Path(dir, "_delta_log"))
    // parquet file with PHYSICAL names, the way a mapped writer lays
    // them down (data columns only; the partition column stays virtual)
    Seq((1L, "x"), (2L, "y")).toDF("col-a1", "col-b2").coalesce(1)
      .write.parquet(dir + "/data0")
    val part = new java.io.File(dir + "/data0").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val logical =
      """{"type":"struct","fields":[""" +
        """{"name":"id","type":"long","nullable":true,"metadata":""" +
        """{"delta.columnMapping.id":1,""" +
        """"delta.columnMapping.physicalName":"col-a1"}},""" +
        """{"name":"s","type":"string","nullable":true,"metadata":""" +
        """{"delta.columnMapping.id":2,""" +
        """"delta.columnMapping.physicalName":"col-b2"}},""" +
        """{"name":"region","type":"string","nullable":true,"metadata":""" +
        """{"delta.columnMapping.id":3,""" +
        """"delta.columnMapping.physicalName":"col-p9"}}]}"""
    appendCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      s"""{"metaData":{"id":"m1","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":${
          new com.fasterxml.jackson.databind.ObjectMapper()
            .writeValueAsString(logical)},""" +
        s""""partitionColumns":["region"],"configuration":""" +
        s"""{"delta.columnMapping.mode":"name"},"createdTime":1}}""",
      s"""{"add":{"path":"data0/${part.getName}",""" +
        s""""partitionValues":{"col-p9":"emea"},""" +
        s""""size":${part.length()},"modificationTime":1,""" +
        s""""dataChange":true}}"""))
    val got = DeltaLake.snapshot(spark, dir)
    assert(got.columns.toSeq === Seq("id", "s", "region"))
    assert(got.as[(Long, String, String)].collect().toSet
      === Set((1L, "x", "emea"), (2L, "y", "emea")))
    // predicate over the logical name still works (filter pushes to
    // the physical scan through the rename projection)
    assert(DeltaLake.snapshot(spark, dir, filter = Some("id = 2"))
      .as[(Long, String, String)].collect().toSet
      === Set((2L, "y", "emea")))
  }

  test("deleteWhere and compactFiles preserve partition values") {
    val dir = tmp()
    DeltaLake.append(spark, dir,
      Seq((1L, "us"), (2L, "eu"), (3L, "us"), (4L, "eu"))
        .toDF("id", "region"),
      partitionBy = Seq("region"))
    DeltaLake.deleteWhere(spark, dir, "id = 3")
    assert(DeltaLake.snapshot(spark, dir).as[(Long, String)].collect()
      .toSet === Set((1L, "us"), (2L, "eu"), (4L, "eu")))
    DeltaLake.compactFiles(spark, dir, targetFiles = 1)
    val snap = DeltaLake.snapshot(spark, dir)
    assert(snap.as[(Long, String)].collect().toSet
      === Set((1L, "us"), (2L, "eu"), (4L, "eu")))
    assert(snap.where("region IS NULL").count() === 0L)
  }

  test("txn actions make the sink idempotent across retries") {
    val dir = tmp()
    val d = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "s", ZSets.W)
    DeltaLake.writeDelta(spark, dir, d, ts = 1L, txn = Some("sink" -> 7L))
    // a retry of the SAME (appId, version) must be a no-op
    DeltaLake.writeDelta(spark, dir, d, ts = 1L, txn = Some("sink" -> 7L))
    assert(DeltaLake.snapshot(spark, dir).count() === 2L)
    // a later version lands; txn bookkeeping survives a checkpoint
    DeltaLake.writeDelta(spark, dir,
      Seq((3L, "c", 1L)).toDF("id", "s", ZSets.W), ts = 2L,
      txn = Some("sink" -> 8L))
    DeltaLake.checkpoint(spark, dir)
    val log = new java.io.File(dir, "_delta_log")
    log.listFiles().filter(_.getName.endsWith(".json"))
      .foreach(f => assert(f.delete()))
    assert(DeltaLake.reconstruct(spark, dir).txns === Map("sink" -> 8L))
    DeltaLake.writeDelta(spark, dir,
      Seq((9L, "x", 1L)).toDF("id", "s", ZSets.W), ts = 3L,
      txn = Some("sink" -> 8L)) // stale retry after restart: no-op
    assert(DeltaLake.snapshot(spark, dir).count() === 3L)
  }

  test("delta sink writes the change-log form; merge reconstructs") {
    val dir = tmp()
    val d1 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "s", ZSets.W)
    val d2 = Seq((2L, "b", -1L), (3L, "c", 2L)).toDF("id", "s", ZSets.W)
    DeltaLake.writeDelta(spark, dir, d1, ts = 100L)
    DeltaLake.writeDelta(spark, dir, d2, ts = 200L)
    val log = DeltaLake.snapshot(spark, dir)
    assert(log.columns.toSeq
      === Seq("id", "s", "__feldera_op", "__feldera_ts"))
    // |w|=2 expands to two records
    assert(log.where("id = 3").count() === 2L)
    assert(log.where("__feldera_op = 'd'").count() === 1L)
    val current = DeltaLake.integrateChangeLog(log)
      .select("id", "s", ZSets.W).as[(Long, String, Long)].collect().toSet
    assert(current === Set((1L, "a", 1L), (3L, "c", 2L)))
  }
}
