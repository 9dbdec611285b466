package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.runtime.Pipeline
import graft.zset.ZSets

/** Transactions (pipelines/transactions.md): between start and commit the
  * pipeline buffers inputs without maintaining views (ad-hoc reads keep
  * seeing the last committed state, no intermediate output deltas exist),
  * and commit applies the cumulative delta as ONE atomic step — the
  * backfill contract. PRIMARY KEY command batches must stay
  * last-write-wins in transaction arrival order across chunks.
  */
class TransactionSpec extends SparkSpec {

  private val programSql =
    """CREATE TABLE ev (k BIGINT NOT NULL, grp BIGINT, v DOUBLE);
      |CREATE VIEW agg AS
      |  SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM ev GROUP BY grp;"""
      .stripMargin

  private def chunk(lo: Int, hi: Int): DataFrame =
    spark.range(lo.toLong, hi.toLong).select(col("id").as("k"),
      (col("id") % 4).as("grp"), col("id").cast("double").as("v"))
      .withColumn(ZSets.W, lit(1L))

  test("commit applies N buffered chunks as one atomic step") {
    val pipe = Pipeline(spark, programSql)
    pipe.step(Map("ev" -> chunk(0, 40)))
    val stepsBefore = pipe.stepCount
    val before = pipe.adHoc("SELECT * FROM agg")
      .collect().map(_.toString).sorted

    val id = pipe.startTransaction()
    assert(pipe.transactionInProgress === Some(id))
    // buffered steps emit NO view deltas and leave views untouched
    (0 until 3).foreach { i =>
      val out = pipe.step(Map("ev" -> chunk(40 + i * 20, 60 + i * 20)))
      assert(out.isEmpty, "a buffered step must not emit output deltas")
    }
    assert(pipe.adHoc("SELECT * FROM agg")
      .collect().map(_.toString).sorted === before,
      "views must keep their last committed state during a transaction")
    assert(pipe.stepCount === stepsBefore, "buffering must not step")

    val out = pipe.commitTransaction(id)
    assert(pipe.transactionInProgress === None)
    assert(pipe.stepCount === stepsBefore + 1,
      "a transaction must commit as exactly one step")
    assert(out.contains("agg"))
    // final state equals the batch recompute over everything ingested
    val want = chunk(0, 100).drop(ZSets.W)
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(_.toString).sorted
    assert(pipe.adHoc("SELECT * FROM agg")
      .collect().map(_.toString).sorted === want)
  }

  test("abort discards buffered inputs; start-while-open fails") {
    val pipe = Pipeline(spark, programSql)
    pipe.step(Map("ev" -> chunk(0, 10)))
    val before = pipe.adHoc("SELECT * FROM agg")
      .collect().map(_.toString).sorted
    val id = pipe.startTransaction()
    intercept[IllegalArgumentException](pipe.startTransaction())
    pipe.step(Map("ev" -> chunk(10, 30)))
    pipe.abortTransaction(id)
    assert(pipe.transactionInProgress === None)
    assert(pipe.adHoc("SELECT * FROM agg")
      .collect().map(_.toString).sorted === before)
    // a fresh transaction starts cleanly after the abort
    val id2 = pipe.startTransaction()
    assert(pipe.commitTransaction(id2).isEmpty)
  }

  test("PRIMARY KEY upserts stay last-write-wins across chunks") {
    val prog =
      """CREATE TABLE kv (k BIGINT NOT NULL, v BIGINT, PRIMARY KEY (k));
        |CREATE VIEW cur AS SELECT k, v FROM kv;""".stripMargin
    val pipe = Pipeline(spark, prog)
    import spark.implicits._
    def cmds(rows: (Long, Long, Boolean)*): DataFrame =
      rows.toSeq.toDF("k", "v", "_deleted")
    // committed baseline: k=1 -> 10, k=2 -> 20
    pipe.step(Map("kv" -> cmds((1L, 10L, false), (2L, 20L, false))))
    val id = pipe.startTransaction()
    pipe.step(Map("kv" -> cmds((1L, 11L, false), (3L, 30L, false))))
    pipe.step(Map("kv" -> cmds((1L, 12L, false), (2L, 0L, true))))
    pipe.commitTransaction(id)
    val got = pipe.adHoc("SELECT * FROM cur")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // k=1 last write (chunk 2) wins; k=2 deleted; k=3 inserted
    assert(got === Seq((1L, 12L), (3L, 30L)))
  }

  test("multi-statement ad-hoc reads one snapshot captured at start") {
    // ad-hoc.md "Read-after-write": a trailing SELECT does NOT observe
    // earlier INSERTs of the same request, though they apply for later
    // requests
    val pipe = Pipeline(spark, programSql)
    pipe.step(Map("ev" -> chunk(0, 10)))
    val n0 = pipe.adHoc(
      """INSERT INTO ev VALUES (100, 1, 2.0);
        |SELECT CAST(SUM(n) AS BIGINT) AS total FROM agg""".stripMargin)
      .collect().head.getLong(0)
    assert(n0 === 10L, "the SELECT must see the pre-request snapshot")
    val n1 = pipe.adHoc("SELECT CAST(SUM(n) AS BIGINT) AS total FROM agg")
      .collect().head.getLong(0)
    assert(n1 === 11L, "the INSERT must apply for subsequent requests")
  }

  test("ad-hoc INSERT and connector ingest join an open transaction") {
    val pipe = Pipeline(spark, programSql)
    val id = pipe.startTransaction()
    pipe.adHoc("INSERT INTO ev VALUES (1, 1, 5.0), (2, 2, 7.0)")
    assert(pipe.adHoc("SELECT * FROM agg").count() === 0L,
      "insert inside a transaction must not be visible before commit")
    pipe.commitTransaction(id)
    assert(pipe.adHoc("SELECT * FROM agg").count() === 2L)
  }
}
