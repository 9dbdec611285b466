package graft

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.runtime.Pipeline
import graft.sources.PgCdc

class PgCdcSpec extends SparkSpec {
  import spark.implicits._

  private def programSql(port: Int, auth: String = "u@"): String = {
    val connectors =
      s"""[{"name": "pg0", "transport": {"name": "postgres_cdc_input",
         | "config": {"uri": "postgres://${auth}127.0.0.1:$port/db",
         |  "publication": "pub", "source_table": "public.orders"
         |}}}]""".stripMargin.replaceAll("\n", " ")
    s"""CREATE TABLE orders (id BIGINT NOT NULL, customer VARCHAR,
       |  amount DECIMAL(10,2)) WITH (
       | 'connectors' = '${connectors.replace("'", "''")}');
       |CREATE MATERIALIZED VIEW totals AS
       | SELECT customer, SUM(amount) AS total, COUNT(*) AS n
       | FROM orders GROUP BY customer;
       |""".stripMargin
  }

  test("snapshot + change rounds maintain the view through " +
      "insert/update/delete, resuming from the confirmed LSN") {
    val srv = new graft.tools.PgMiniServer(Seq("id", "customer", "amount"))
    try {
      srv.snapshot += Seq("1", "Alice", "25.00")
      srv.snapshot += Seq("2", "Bob", "40.50")
      val p = Pipeline(spark, programSql(srv.port))
      p.ingestConnectors() // round 1: slot + snapshot
      def state() = p.adHoc("SELECT * FROM totals")
        .as[(String, java.math.BigDecimal, Long)].collect()
        .map(r => (r._1, r._2.toPlainString, r._3)).toSet
      assert(state() === Set(("Alice", "25.00", 1L), ("Bob", "40.50", 1L)))
      assert(srv.slotCreates.get() === 1)

      // live changes: update Alice, delete Bob, insert Carol
      srv.update(Seq("1", "Alice", "25.00"), Seq("1", "Alice", "30.00"))
      srv.delete("2", "Bob", "40.50")
      srv.insert("3", "Carol", "7.25")
      p.ingestConnectors() // round 2: streams the WAL tail
      assert(state() === Set(("Alice", "30.00", 1L), ("Carol", "7.25", 1L)))

      // idle round: keepalive-only, no change
      p.ingestConnectors()
      assert(state() === Set(("Alice", "30.00", 1L), ("Carol", "7.25", 1L)))
      // the client confirmed its flush position (WAL can be recycled)
      assert(srv.confirmedFlush.get() > 0)
      assert(srv.replicationStarts.get() === 2)

      // cursors participate in the durable-restart surface
      assert(p.exportConnectorCursors().keys.exists(_.startsWith("pgcdc|")))
    } finally srv.close()
  }

  test("rows committed between the consistent point and the snapshot " +
      "SELECT are seen exactly once (exported-snapshot copy)") {
    graft.sources.PgCdc.resetCursors()
    val srv = new graft.tools.PgMiniServer(Seq("id", "customer", "amount"))
    try {
      srv.snapshot += Seq("1", "Alice", "10.00")
      // the race: a row commits AFTER the slot's consistent point is
      // pinned but BEFORE the client's table copy runs. A live SELECT
      // would see it AND the stream would replay it (double count);
      // the exported-snapshot read must not.
      srv.onSlotCreate = () => srv.insert("2", "Bob", "5.00")
      val p = Pipeline(spark, programSql(srv.port))
      p.ingestConnectors() // round 1: slot + snapshot copy
      def state() = p.adHoc("SELECT * FROM totals")
        .as[(String, java.math.BigDecimal, Long)].collect()
        .map(r => (r._1, r._2.toPlainString, r._3)).toSet
      // snapshot sees only the pre-slot row
      assert(state() === Set(("Alice", "10.00", 1L)))
      p.ingestConnectors() // round 2: streams Bob's insert — once
      assert(state() === Set(("Alice", "10.00", 1L), ("Bob", "5.00", 1L)))
      p.ingestConnectors() // idle round: still exactly once
      assert(state() === Set(("Alice", "10.00", 1L), ("Bob", "5.00", 1L)))
    } finally { srv.onSlotCreate = () => (); srv.close() }
  }

  test("flush confirmation lags one committed round (crash-safe WAL " +
      "retention): round N confirms round N-1's cursor, never its own " +
      "head") {
    graft.sources.PgCdc.resetCursors()
    val srv = new graft.tools.PgMiniServer(Seq("id", "customer", "amount"))
    try {
      srv.snapshot += Seq("1", "Alice", "10.00")
      val p = Pipeline(spark, programSql(srv.port))
      p.ingestConnectors() // round 1: snapshot; nothing confirmed yet
      assert(srv.confirmedFlush.get() === -1L)
      srv.insert("2", "Bob", "5.00")
      p.ingestConnectors() // round 2: streams Bob; confirms R1's cursor
      val afterR2 = srv.confirmedFlush.get()
      val cursor2 = graft.sources.PgCdc.cursorsSnapshot.values.max
      assert(afterR2 >= 0 && afterR2 < cursor2,
        s"round 2 must confirm the pre-round cursor, got $afterR2 " +
          s"vs its own head $cursor2")
      p.ingestConnectors() // round 3: idle; NOW round 2's head confirms
      assert(srv.confirmedFlush.get() === cursor2)
    } finally srv.close()
  }

  test("md5 auth: correct password connects, wrong one fails loudly") {
    graft.sources.PgCdc.resetCursors()
    val srv = new graft.tools.PgMiniServer(Seq("id", "customer", "amount"),
      md5Password = Some("pw1"))
    try {
      srv.snapshot += Seq("1", "Alice", "1.00")
      val p = Pipeline(spark, programSql(srv.port, auth = "u:pw1@"))
      p.ingestConnectors()
      assert(p.adHoc("SELECT * FROM totals").count() === 1)

      graft.sources.PgCdc.resetCursors()
      val bad = Pipeline(spark, programSql(srv.port, auth = "u:nope@"))
      val err = intercept[Exception](bad.ingestConnectors())
      assert(TestErrors.messageChain(err)
        .exists(_.contains("authentication")))
    } finally srv.close()
  }

  test("updates without the old row demand REPLICA IDENTITY FULL") {
    val dec = new PgCdc.PgOutputDecoder
    // relation with one column
    val rel = {
      val bos = new ByteArrayOutputStream()
      val d = new DataOutputStream(bos)
      d.writeByte('R'); d.writeInt(5); d.write("public".getBytes(UTF_8))
      d.writeByte(0); d.write("t".getBytes(UTF_8)); d.writeByte(0)
      d.writeByte('d'); d.writeShort(1)
      d.writeByte(0); d.write("a".getBytes(UTF_8)); d.writeByte(0)
      d.writeInt(20); d.writeInt(-1)
      bos.toByteArray
    }
    dec.decode(rel)
    val updNoOld = {
      val bos = new ByteArrayOutputStream()
      val d = new DataOutputStream(bos)
      d.writeByte('U'); d.writeInt(5); d.writeByte('N')
      d.writeShort(1); d.writeByte('t'); d.writeInt(1)
      d.write("x".getBytes(UTF_8))
      bos.toByteArray
    }
    val err = intercept[RuntimeException](dec.decode(updNoOld))
    assert(err.getMessage.contains("REPLICA IDENTITY FULL"))
  }

  test("LSN text form round-trips") {
    for (l <- Seq(0L, 10L, 0x1234ABCDL, (5L << 32) | 0x10L))
      assert(PgCdc.parseLsn(PgCdc.lsnStr(l)) === l)
  }
}
