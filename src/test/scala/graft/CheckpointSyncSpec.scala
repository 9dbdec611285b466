package graft

import java.nio.file.Files

import graft.runtime.{CheckpointSync, DurableRunner}
import graft.zset.ZSets

/** Checkpoint sync to a remote location (pipelines/checkpoint-sync.md):
  * push a runner's journal+snapshot state, restore it into a fresh
  * local dir (disaster recovery), and catch a standby up with a second
  * incremental push.
  */
class CheckpointSyncSpec extends SparkSpec {
  import spark.implicits._

  private val programSql =
    """CREATE TABLE orders (o_id BIGINT, o_cust BIGINT, o_amt DOUBLE);
      |CREATE VIEW spend AS
      |  SELECT o_cust, CAST(SUM(CAST(o_amt AS DECIMAL(18,4))) AS DOUBLE)
      |    AS total, COUNT(*) AS n
      |  FROM orders GROUP BY o_cust;""".stripMargin

  private def batch(rows: (Long, Long, Double)*) =
    ZSets.lift(rows.toDF("o_id", "o_cust", "o_amt"))

  private def viewOf(r: DurableRunner) =
    r.pipeline.adHoc("SELECT * FROM spend")
      .as[(Long, Double, Long)].collect().toSet

  test("push, wipe, pull, replay: the restored runner equals the primary") {
    val prog = graft.ddl.Ddl.parse(programSql)
    val state = Files.createTempDirectory("cks_state")
    val remote = Files.createTempDirectory("cks_remote")
    val r1 = new DurableRunner(spark, prog, state.toString)
    r1.step(1L, Map("orders" -> batch((1L, 10L, 5.0), (2L, 20L, 3.0))))
    r1.step(2L, Map("orders" -> batch((3L, 10L, 2.0))))
    r1.compact() // snapshot + journal truncation — both layouts sync
    r1.step(3L, Map("orders" -> batch((4L, 30L, 9.0))))
    val want = viewOf(r1)
    val n1 = CheckpointSync.push(spark, state.toString, remote.toString)
    assert(n1 > 0)
    // a second push with no new state copies nothing (incremental)
    assert(CheckpointSync.push(spark, state.toString,
      remote.toString) === 0)

    // disaster: local state lost; restore from the remote and reopen
    val state2 = Files.createTempDirectory("cks_state2")
    CheckpointSync.pull(spark, remote.toString, state2.toString)
    val r2 = new DurableRunner(spark, prog, state2.toString)
    assert(viewOf(r2) === want)

    // standby catch-up: the primary advances, an incremental push +
    // pull brings a THIRD runner to the newer state
    r1.step(4L, Map("orders" -> batch((5L, 20L, 1.0))))
    CheckpointSync.push(spark, state.toString, remote.toString)
    val state3 = Files.createTempDirectory("cks_state3")
    CheckpointSync.pull(spark, remote.toString, state3.toString)
    val r3 = new DurableRunner(spark, prog, state3.toString)
    assert(viewOf(r3) === viewOf(r1))
    assert(viewOf(r3) !== want) // genuinely newer than the first restore
  }
}
