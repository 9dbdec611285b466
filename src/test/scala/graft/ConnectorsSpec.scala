package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ddl.Ddl
import graft.sources.Connectors
import graft.zset.ZSets

/** Connector dispatch: config parsing, the genuinely-runnable transports
  * (file / datagen / JDBC via embedded Derby), and the jar-gated error
  * contract for connectors whose jars are absent here.
  */
class ConnectorsSpec extends SparkSpec {
  import spark.implicits._

  private def tableWith(connectors: String, cols: String =
      "a BIGINT NOT NULL, b VARCHAR"): Ddl.TableDef =
    Ddl.parse(
      s"CREATE TABLE t ($cols) WITH ('connectors' = '$connectors');")
      .tables.head

  test("connectors JSON parses transport + format configs") {
    val t = tableWith(
      """[{"transport": {"name": "file_input", "config": {"path": "/x"}},
        |  "format": {"name": "json", "config": {"update_format": "insert_delete"}}}]"""
        .stripMargin.replace("'", "''"))
    val confs = Connectors.connectorsOf(t)
    assert(confs === Seq(Connectors.ConnectorConf("file_input",
      Map("path" -> "/x"), "json", Map("update_format" -> "insert_delete"))))
  }

  test("file_input + insert_delete decodes to a Z-set") {
    val dir = Files.createTempDirectory("conn_file")
    Files.write(dir.resolve("in.jsonl"),
      """{"insert": {"a": 1, "b": "x"}}
        |{"delete": {"a": 2, "b": "y"}}""".stripMargin.getBytes)
    val t = tableWith(
      s"""[{"transport": {"name": "file_input", "config": {"path": "$dir"}},
         |  "format": {"name": "json", "config": {"update_format": "insert_delete"}}}]"""
        .stripMargin.replace("'", "''"))
    val out = Connectors.read(spark, t, Connectors.connectorsOf(t).head)
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set((1L, "x", 1L), (2L, "y", -1L)))
  }

  test("kafka wire bytes decode end-to-end without a broker") {
    // recorded wire frames in the EXACT relation shape spark-sql-kafka
    // produces: key/value BINARY + topic/partition/offset/timestamp.
    // Payloads are the reference's insert_delete envelopes; the same
    // decodeKafkaBatch call is what the kafka_input transport runs on a
    // live stream, so the decode contract is proven broker-free.
    val frames = Seq(
      (Array[Byte](107), """{"insert": {"a": 1, "b": "x"}}""".getBytes("UTF-8"),
        "t", 0, 0L, new java.sql.Timestamp(1700000000000L)),
      (null.asInstanceOf[Array[Byte]],
        """{"insert": {"a": 2, "b": "y"}}""".getBytes("UTF-8"),
        "t", 1, 7L, new java.sql.Timestamp(1700000001000L)),
      (Array[Byte](108), """{"delete": {"a": 1, "b": "x"}}""".getBytes("UTF-8"),
        "t", 0, 1L, new java.sql.Timestamp(1700000002000L)))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val t = tableWith("[]")
    val out = Connectors.decodeKafkaBatch(frames,
        graft.sources.FileSource.schemaOf(t), "insert_delete")
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set((1L, "x", 1L), (2L, "y", 1L), (1L, "x", -1L)))
    // weighted envelopes ride the same wire path
    val wf = Seq((null.asInstanceOf[Array[Byte]],
      """{"weight": -3, "data": {"a": 9, "b": "z"}}""".getBytes("UTF-8"),
      "t", 0, 2L, new java.sql.Timestamp(1700000003000L)))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val wout = Connectors.decodeKafkaBatch(wf,
        graft.sources.FileSource.schemaOf(t), "weighted")
      .as[(Long, String, Long)].collect().toSet
    assert(wout === Set((9L, "z", -3L)))
  }

  test("datagen transport generates schema-driven deterministic rows") {
    val t = tableWith(
      """[{"transport": {"name": "datagen", "config": {"rows": "50"}}}]""",
      "a BIGINT NOT NULL, b VARCHAR, c DOUBLE, d TIMESTAMP")
    val conf = Connectors.connectorsOf(t).head
    val d1 = Connectors.read(spark, t, conf)
    val d2 = Connectors.read(spark, t, conf)
    assert(d1.count() === 50)
    assert(d1.schema.fieldNames.toSeq === Seq("a", "b", "c", "d", ZSets.W))
    assert(d1.exceptAll(d2).isEmpty, "datagen must be deterministic")
  }

  test("JDBC transport round-trips through embedded Derby") {
    val dbDir = Files.createTempDirectory("conn_derby")
    val url = s"jdbc:derby:${dbDir}/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE items (a BIGINT, b VARCHAR(20))")
      st.execute("INSERT INTO items VALUES (1, 'x'), (2, 'y')")
      st.close()
    } finally conn.close()

    val t = tableWith(
      s"""[{"transport": {"name": "jdbc_input",
         |   "config": {"url": "jdbc:derby:$dbDir/db", "table": "items"}}}]"""
        .stripMargin.replace("'", "''"))
    val got = Connectors.read(spark, t, Connectors.connectorsOf(t).head)
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "x", 1L), (2L, "y", 1L)))

    // sink side: write a view back, read it with plain JDBC
    Connectors.writeView(
      Seq((3L, "z")).toDF("a", "b"),
      Connectors.ConnectorConf("jdbc_output",
        Map("url" -> s"jdbc:derby:$dbDir/db", "table" -> "items"),
        "", Map.empty))
    val n = {
      val c2 = java.sql.DriverManager.getConnection(s"jdbc:derby:$dbDir/db")
      try {
        val rs = c2.createStatement()
          .executeQuery("SELECT COUNT(*) FROM items")
        rs.next(); rs.getLong(1)
      } finally c2.close()
    }
    assert(n === 3L)
  }

  test("kafka/delta/iceberg paths are jar-gated with a precise error") {
    for ((transport, key) <- Seq(
        "kafka_input" -> Map("bootstrap.servers" -> "h:9092", "topic" -> "t"),
        "delta_table_input" -> Map("uri" -> "/x"),
        "iceberg_input" -> Map("uri" -> "/x"))) {
      val cfgJson = key.map { case (k, v) => s""""$k": "$v"""" }
        .mkString("{", ", ", "}")
      val t = tableWith(
        s"""[{"transport": {"name": "$transport", "config": $cfgJson}}]""")
      val e = intercept[IllegalArgumentException] {
        Connectors.read(spark, t, Connectors.connectorsOf(t).head)
      }
      assert(e.getMessage.contains("jar"),
        s"$transport should fail with the jar-gating message, got: ${e.getMessage}")
    }
    // object-store + brokerless transports: precise guidance, not a raw
    // ClassNotFound mid-scan
    for ((transport, cfg, expect) <- Seq(
        ("s3_input", """{"uri": "s3a://bucket/prefix"}""", "hadoop-aws"),
        ("nats_input", "{}", "bridge via"),
        ("pub_sub_input", "{}", "bridge via"),
        ("redis_output", "{}", "bridge via"))) {
      val t = tableWith(
        s"""[{"transport": {"name": "$transport", "config": $cfg}}]""")
      val e = intercept[RuntimeException] {
        Connectors.read(spark, t, Connectors.connectorsOf(t).head)
      }
      assert(e.getMessage.contains(expect),
        s"$transport: got ${e.getMessage}")
    }
    // s3_input DISPATCH is real: a supported scheme routes through the
    // file reader (local file:// stands in for s3a://)
    val dir = java.nio.file.Files.createTempDirectory("conn_s3")
    java.nio.file.Files.write(dir.resolve("in.jsonl"),
      """{"insert": {"a": 5, "b": "s"}}""".getBytes)
    val t3 = tableWith(
      s"""[{"transport": {"name": "s3_input", "config": {"uri": "file://$dir"}},
         |  "format": {"name": "json", "config": {"update_format": "insert_delete"}}}]"""
        .stripMargin.replace("'", "''"))
    val out = Connectors.read(spark, t3, Connectors.connectorsOf(t3).head)
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set((5L, "s", 1L)))
  }
}
