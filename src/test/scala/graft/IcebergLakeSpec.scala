package graft

import java.nio.file.Files

import graft.ddl.Ddl
import graft.sources.{Connectors, IcebergLake}
import graft.zset.ZSets

/** Native Iceberg metadata/manifest reads (JSON + Avro container files +
  * parquet, no iceberg jar): snapshot reads via metadata_location,
  * snapshot-id/datetime time travel, follow-mode change diffs over a
  * filesystem (version-hint) table, and the v2 delete-file guard
  * (docs/connectors/sources/iceberg.md).
  */
class IcebergLakeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("iceberg").toString

  test("append + snapshot round trip; time travel by snapshot id") {
    val dir = tmp()
    val s1 = IcebergLake.append(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val s2 = IcebergLake.append(spark, dir, Seq((3L, "c")).toDF("id", "s"))
    assert(s1 !== s2)
    val metaLoc = IcebergLake.currentMetadata(spark, dir)
    assert(IcebergLake.snapshot(spark, metaLoc).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(IcebergLake.snapshot(spark, metaLoc, snapshotId = Some(s1))
      .as[(Long, String)].collect().toSet === Set((1L, "a"), (2L, "b")))
  }

  test("delete commit drops files; follow emits signed deltas") {
    val dir = tmp()
    IcebergLake.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val meta1 = IcebergLake.readMetadata(spark,
      IcebergLake.currentMetadata(spark, dir))
    val firstFiles = IcebergLake.manifestEntries(spark, meta1,
      meta1.snapshots.head._2).map(_.path)
    val start = meta1.currentSnapshotId.get
    // commit 2: add (3,c) and delete the first commit's files
    IcebergLake.append(spark, dir, Seq((3L, "c")).toDF("id", "s"),
      deletePaths = firstFiles)
    assert(IcebergLake.snapshot(spark,
      IcebergLake.currentMetadata(spark, dir)).as[(Long, String)]
      .collect().toSet === Set((3L, "c")))
    val delta = ZSets.consolidate(
      IcebergLake.changes(spark, dir, Some(start)))
      .as[(Long, String, Long)].collect().toSet
    assert(delta === Set((3L, "c", 1L), (1L, "a", -1L), (2L, "b", -1L)))
  }

  test("datetime resolution picks the newest snapshot at or before") {
    val dir = tmp()
    IcebergLake.append(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    val cut = java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC)
    Thread.sleep(20)
    IcebergLake.append(spark, dir, Seq((2L, "b")).toDF("id", "s"))
    assert(IcebergLake.snapshot(spark,
      IcebergLake.currentMetadata(spark, dir),
      datetime = Some(cut.toString)).as[(Long, String)]
      .collect().toSet === Set((1L, "a")))
  }

  test("connector dispatch: metadata_location snapshot + follow modes") {
    val dir = tmp()
    IcebergLake.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("a", "b"))
    val start = IcebergLake.readMetadata(spark,
      IcebergLake.currentMetadata(spark, dir)).currentSnapshotId.get
    IcebergLake.append(spark, dir, Seq((3L, "c")).toDF("a", "b"))
    def conf(extra: String) = {
      val json = s"""[{"transport": {"name": "iceberg_input", """ +
        s""""config": {$extra}}}]"""
      val t = Ddl.parse("CREATE TABLE t (a BIGINT NOT NULL, b VARCHAR) " +
        s"WITH ('connectors' = '$json');").tables.head
      (t, Connectors.connectorsOf(t).head)
    }
    val metaLoc = IcebergLake.currentMetadata(spark, dir)
    val (t1, c1) = conf(
      s""""metadata_location": "$metaLoc", "mode": "snapshot"""")
    assert(Connectors.read(spark, t1, c1).as[(Long, String, Long)]
      .collect().toSet
      === Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)))
    val (t2, c2) = conf(
      s""""uri": "$dir", "mode": "follow", "snapshot_id": "$start"""")
    assert(Connectors.read(spark, t2, c2).as[(Long, String, Long)]
      .collect().toSet === Set((3L, "c", 1L)))
    val (t3, c3) = conf(
      s""""uri": "$dir", "mode": "snapshot_and_follow", """ +
        s""""snapshot_id": "$start"""")
    assert(Connectors.read(spark, t3, c3).as[(Long, String, Long)]
      .collect().toSet
      === Set((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)))
    // follow modes reject metadata_location (doc contract)
    val (t4, c4) = conf(
      s""""metadata_location": "$metaLoc", "mode": "follow"""")
    val e = intercept[IllegalArgumentException](
      Connectors.read(spark, t4, c4))
    assert(e.getMessage.contains("metadata_location"))
  }

  test("iceberg_output sink lands CDC records; integration reconstructs") {
    val dir = tmp()
    val conf = Connectors.ConnectorConf("iceberg_output",
      Map("uri" -> dir), "avro", Map("cdc_field" -> "op"))
    val d1 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "s", ZSets.W)
    val d2 = Seq((2L, "b", -1L), (3L, "c", 2L)).toDF("id", "s", ZSets.W)
    Connectors.writeView(d1, conf)
    Connectors.writeView(d2, conf)
    val log = IcebergLake.snapshot(spark,
      IcebergLake.currentMetadata(spark, dir))
    assert(log.columns.toSeq === Seq("id", "s", "op"))
    assert(log.where("op = 'D'").count() === 1L)
    assert(log.where("id = 3").count() === 2L) // |w|=2 expands
    // integrate the CDC log: Σ signed ops > 0 keeps the row
    val current = ZSets.positive(ZSets.consolidate(
      log.withColumn(ZSets.W,
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("op") === "D", -1L)
          .otherwise(1L)).drop("op")))
      .select("id", "s", ZSets.W).as[(Long, String, Long)].collect().toSet
    assert(current === Set((1L, "a", 1L), (3L, "c", 2L)))
  }

  test("avro egress cdc_field: I/D ops round-trip through binary records") {
    import graft.sources.Envelopes
    val schemaJson =
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":["null","long"],"default":null},
        |{"name":"s","type":["null","string"],"default":null}]}"""
        .stripMargin
    val delta = Seq((1L, "a", 2L), (2L, "b", -1L)).toDF("id", "s", ZSets.W)
    val wire = Envelopes.encodeAvro(delta, schemaJson,
      cdcField = Some("op"))
    val decoded = wire.collect().map { row =>
      val bytes = row.getAs[Array[Byte]](0)
      val parser = new org.apache.avro.Schema.Parser().parse(schemaJson)
      val fs = new java.util.ArrayList[org.apache.avro.Schema.Field]()
      parser.getFields.forEach(f => fs.add(
        new org.apache.avro.Schema.Field(f.name(), f.schema(),
          f.doc(), f.defaultVal())))
      fs.add(new org.apache.avro.Schema.Field("op",
        org.apache.avro.Schema.create(
          org.apache.avro.Schema.Type.STRING), null, null))
      val full = org.apache.avro.Schema.createRecord("r", null, null,
        false, fs)
      val reader = new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord](full)
      val rec = reader.read(null,
        org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytes, null))
      (rec.get("id").asInstanceOf[Long], rec.get("s").toString,
        rec.get("op").toString)
    }.toSeq
    // |w|=2 insert emits two records; the deletion carries op=D
    assert(decoded.sorted === Seq((1L, "a", "I"), (1L, "a", "I"),
      (2L, "b", "D")))
    // without cdc_field, negative weights still fail fast
    val e = intercept[Exception](
      Envelopes.encodeAvro(delta, schemaJson).collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(msgs.contains("insert-only"))
  }

  test("format-version 3 metadata is rejected, not mis-read") {
    val dir = tmp()
    IcebergLake.append(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    val metaLoc = IcebergLake.currentMetadata(spark, dir)
    val p = java.nio.file.Paths.get(metaLoc.stripPrefix("file:"))
    val patched = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replace("\"format-version\":2", "\"format-version\":3")
    java.nio.file.Files.write(p, patched.getBytes("UTF-8"))
    // the direct edit invalidates the local-FS checksum sidecar
    java.nio.file.Files.deleteIfExists(
      p.getParent.resolve("." + p.getFileName.toString + ".crc"))
    val e = intercept[IllegalArgumentException](
      IcebergLake.readMetadata(spark, metaLoc))
    assert(e.getMessage.contains("format-version 3"))
  }

  test("v2 equality deletes: sequence-scoped value matching — rows " +
      "re-inserted AFTER the delete survive; follow falls back to an " +
      "exact state diff") {
    val dir = tmp()
    IcebergLake.append(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    val s0 = IcebergLake.readMetadata(spark,
      IcebergLake.currentMetadata(spark, dir)).currentSnapshotId.get
    // CDC-style DELETE by key value
    IcebergLake.deleteRowsEqualityWhere(spark, dir, Seq("id"), "id <= 2")
    def state = IcebergLake.snapshot(spark,
        IcebergLake.currentMetadata(spark, dir))
      .as[(Long, String)].collect().toSet
    assert(state === Set((3L, "c")))
    // a LATER insert of a deleted key survives (sequence scoping): the
    // delete applies only to files with smaller sequence numbers
    IcebergLake.append(spark, dir, Seq((1L, "a2")).toDF("id", "s"))
    assert(state === Set((3L, "c"), (1L, "a2")))
    // a second equality delete layers on top of the re-insert
    IcebergLake.deleteRowsEqualityWhere(spark, dir, Seq("s"), "s = 'c'")
    assert(state === Set((1L, "a2")))
    // follow across the whole history: exact net delta vs empty start
    val ch = ZSets.consolidate(IcebergLake.changes(spark, dir, None))
      .filter(org.apache.spark.sql.functions.col(ZSets.W) =!= 0)
      .as[(Long, String, Long)].collect().toSet
    assert(ch === Set((1L, "a2", 1L)))
    // follow from after the first delete sees insert + delete of c
    val ch2 = ZSets.consolidate(
        IcebergLake.changes(spark, dir, Some(s0)))
      .filter(org.apache.spark.sql.functions.col(ZSets.W) =!= 0)
      .as[(Long, String, Long)].collect().toSet
    assert(ch2 === Set((1L, "a2", 1L), (1L, "a", -1L), (2L, "b", -1L),
      (3L, "c", -1L)))
  }

  test("v2 positional deletes: DML adds a delete file, snapshot applies " +
      "it, a second DML layers on top, follow retracts exactly the " +
      "deleted rows") {
    val dir = tmp()
    IcebergLake.append(spark, dir,
      (0L until 50L).map(i => (i, s"r$i")).toDF("id", "s"))
    val s0 = IcebergLake.readMetadata(spark,
      IcebergLake.currentMetadata(spark, dir)).currentSnapshotId.get
    val dataFiles0 = new java.io.File(dir, "data").listFiles()
      .map(_.getName).toSet
    IcebergLake.deleteRowsWhere(spark, dir, "id % 10 = 0")
    IcebergLake.deleteRowsWhere(spark, dir, "id % 7 = 0")
    def ids = IcebergLake.snapshot(spark,
        IcebergLake.currentMetadata(spark, dir))
      .as[(Long, String)].collect().map(_._1).toSet
    assert(ids === (0L until 50L)
      .filter(i => i % 10 != 0 && i % 7 != 0).toSet)
    // no data file was rewritten — only delete files appeared
    val dataFiles1 = new java.io.File(dir, "data").listFiles()
      .map(_.getName).toSet
    assert(dataFiles0.subsetOf(dataFiles1))
    // only delete files appeared (ignore Hadoop .crc sidecars)
    assert((dataFiles1 -- dataFiles0).filterNot(_.startsWith("."))
      .forall(_.startsWith("delete-")))
    // follow from the pre-DML snapshot: a pure retraction delta
    val ch = ZSets.consolidate(IcebergLake.changes(spark, dir, Some(s0)))
      .as[(Long, String, Long)].collect().toSet
    assert(ch === (0L until 50L).filter(i => i % 10 == 0 || i % 7 == 0)
      .map(i => (i, s"r$i", -1L)).toSet)
    // appends after a DML still follow cleanly
    IcebergLake.append(spark, dir, Seq((100L, "new")).toDF("id", "s"))
    val ch2 = ZSets.consolidate(IcebergLake.changes(spark, dir, Some(s0)))
      .as[(Long, String, Long)].collect().toSet
    assert(ch2.contains((100L, "new", 1L)) && ch2.size === ch.size + 1)
  }

  test("glue catalog: SigV4-signed GetTable resolves the metadata " +
      "location; wrong secret and wrong session token fail loudly") {
    val dir = tmp()
    IcebergLake.append(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    val stub = new graft.tools.GlueMiniServer(
      Map("analytics.orders" -> dir), secret = "glueSecret1",
      sessionToken = Some("sess-tok-9"))
    try {
      val cf = Map("catalog_type" -> "glue",
        "table_name" -> "analytics.orders",
        "glue.endpoint" -> stub.endpoint, "glue.region" -> "eu-west-1",
        "glue.access-key-id" -> "AKIDEXAMPLE",
        "glue.secret-access-key" -> "glueSecret1",
        "glue.session-token" -> "sess-tok-9")
      val loc = Connectors.resolveIcebergMetadata(spark, cf)
      assert(IcebergLake.snapshot(spark, loc).count() === 3)
      assert(stub.calls >= 1 && stub.badSignatures === 0)
      // follow via the glue catalog sees the next commit
      IcebergLake.append(spark, dir, Seq((9L, "z")).toDF("id", "s"))
      val loc2 = Connectors.resolveIcebergMetadata(spark, cf)
      assert(loc2 !== loc)
      assert(IcebergLake.snapshot(spark, loc2).count() === 4)

      val e1 = intercept[Exception](Connectors.resolveIcebergMetadata(
        spark, cf + ("glue.secret-access-key" -> "wrong")))
      assert(e1.getMessage.contains("403"))
      val e2 = intercept[Exception](Connectors.resolveIcebergMetadata(
        spark, cf - "glue.session-token"))
      assert(e2.getMessage.contains("403"))
      assert(stub.badSignatures === 2)
    } finally stub.close()
  }

  test("s3tables catalog: SigV4-signed GetTableMetadataLocation over " +
      "the double-encoded ARN path resolves the metadata location; " +
      "wrong secret fails loudly; region defaults from the ARN") {
    val dir = tmp()
    IcebergLake.append(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    val arn = "arn:aws:s3tables:us-east-2:123456789012:bucket/my-bucket"
    val stub = new graft.tools.S3TablesMiniServer(arn,
      Map("analytics.orders" -> dir), secret = "s3tSecret1",
      sessionToken = Some("sess-tok-3"))
    try {
      val cf = Map("catalog_type" -> "s3tables",
        "table_name" -> "analytics.orders",
        "s3tables.table-bucket-arn" -> arn,
        "s3tables.endpoint" -> stub.endpoint,
        "s3tables.access-key-id" -> "AKIDEXAMPLE",
        "s3tables.secret-access-key" -> "s3tSecret1",
        "s3tables.session-token" -> "sess-tok-3")
      // region omitted on purpose: defaults from the ARN (us-east-2) —
      // the stub re-derives with the region in the Credential scope, so
      // a wrong default would be a signature mismatch
      val loc = Connectors.resolveIcebergMetadata(spark, cf)
      assert(IcebergLake.snapshot(spark, loc).count() === 3)
      assert(stub.calls >= 1 && stub.badSignatures === 0)
      // follow: the catalog serves the next commit's location
      IcebergLake.append(spark, dir, Seq((9L, "z")).toDF("id", "s"))
      val loc2 = Connectors.resolveIcebergMetadata(spark, cf)
      assert(loc2 !== loc)
      assert(IcebergLake.snapshot(spark, loc2).count() === 4)

      val e1 = intercept[Exception](Connectors.resolveIcebergMetadata(
        spark, cf + ("s3tables.secret-access-key" -> "wrong")))
      assert(e1.getMessage.contains("403"))
      val e2 = intercept[Exception](Connectors.resolveIcebergMetadata(
        spark, cf - "s3tables.session-token"))
      assert(e2.getMessage.contains("403"))
      assert(stub.badSignatures === 2)
      // unknown table: loud 404, not a silent empty read
      val e3 = intercept[Exception](Connectors.resolveIcebergMetadata(
        spark, cf + ("table_name" -> "analytics.nope")))
      assert(e3.getMessage.contains("404"))
    } finally stub.close()
  }

  test("rest catalog: oauth token exchange, config prefix, loadTable " +
      "snapshot + follow with per-round cursor carry") {
    val dir = tmp()
    IcebergLake.append(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val stub = new graft.tools.IcebergRestStub(
      Map("analytics.orders" -> dir),
      credential = Some("svc:hunter2"))
    try {
      val connectors =
        s"""[{"name": "ib0", "transport": {"name": "iceberg_input",
           | "config": {"catalog_type": "rest",
           |  "table_name": "analytics.orders",
           |  "mode": "snapshot_and_follow",
           |  "rest.uri": "${stub.uri}",
           |  "rest.credential": "svc:hunter2",
           |  "rest.warehouse": "s3://wh"
           |}}}]""".stripMargin.replaceAll("\n", " ")
      val sql =
        s"""CREATE TABLE t (id BIGINT NOT NULL, s VARCHAR) WITH (
           | 'connectors' = '${connectors.replace("'", "''")}');
           |CREATE MATERIALIZED VIEW v AS
           | SELECT COUNT(*) AS n, SUM(id) AS total FROM t;
           |""".stripMargin
      val p = graft.runtime.Pipeline(spark, sql)
      p.ingestConnectors() // round 1: snapshot through the catalog
      def state() = p.adHoc("SELECT * FROM v").as[(Long, Long)].head()
      assert(state() === ((2L, 3L)))
      assert(stub.loadTableCalls >= 1)

      // table evolves on disk; the catalog serves the new location
      IcebergLake.append(spark, dir, Seq((10L, "c")).toDF("id", "s"))
      IcebergLake.deleteRowsWhere(spark, dir, "id = 1")
      p.ingestConnectors() // round 2: exactly the delta via the catalog
      assert(state() === ((2L, 12L)))
      p.ingestConnectors() // idle round: no change
      assert(state() === ((2L, 12L)))

      // wrong credential fails loudly at token exchange
      val bad = connectors.replace("svc:hunter2", "svc:wrong")
      val sqlBad = sql.replace(connectors.replace("'", "''"),
        bad.replace("'", "''"))
      graft.sources.IcebergLake // (no cursor state to reset; new name)
      val pBad = graft.runtime.Pipeline(spark,
        sqlBad.replace("TABLE t ", "TABLE t2 ")
          .replace("VIEW v ", "VIEW v2 ").replace("FROM t;", "FROM t2;"))
      val e = intercept[Exception](pBad.ingestConnectors())
      assert(TestErrors.messageChain(e)
        .exists(m => m.contains("token exchange") || m.contains("401")))
    } finally stub.close()
  }
}
