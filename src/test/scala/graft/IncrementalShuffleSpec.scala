package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.incremental.IncrementalOps
import graft.zset.ZSets

/** Proves the incremental steps' SCALE CONTRACT: per-step shuffle volume is
  * O(|delta|), independent of |state|. State rows may be scanned (broadcast
  * semi/anti probe) but must never be shuffled — the property that makes the
  * design survive 100× (reference: delta-probes-trace,
  * crates/dbsp/src/operator/dynamic/aggregate.rs:209, join.rs:1358).
  *
  * Method: a SparkListener sums shuffle-write records across the stages of
  * one metered step, run against a small state and a 20×-larger state with
  * the SAME delta; the shuffle volume must not grow with the state.
  */
class IncrementalShuffleSpec extends SparkSpec {
  import spark.implicits._

  private class ShuffleMeter extends SparkListener {
    @volatile var records: Long = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      records += sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
  }

  /** Run `action` with a fresh meter attached; return shuffle records. */
  private def meter(action: => Unit): Long = {
    val m = new ShuffleMeter
    spark.sparkContext.addSparkListener(m)
    try {
      action
      // listener events are posted asynchronously; drain the bus
      org.apache.spark.graft.TestShims.drainListenerBus(spark.sparkContext)
      m.records
    } finally spark.sparkContext.removeSparkListener(m)
  }

  /** Materialized Z-set state with n distinct keys. */
  private def mkState(n: Int): DataFrame =
    spark.range(n.toLong)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .withColumn(ZSets.W, lit(1L))
      .localCheckpoint(true)

  private val delta =
    Seq((3L, 999L, 1L), (7L, 998L, 1L), (11L, 997L, -1L))
      .toDF("k", "v", ZSets.W).localCheckpoint(true)

  test("linearAggStep shuffle volume is independent of state size") {
    // agg states keyed by k: one row per key
    def aggState(n: Int): DataFrame =
      spark.range(n.toLong).select(col("id").as("k"),
        lit(1L).as("_cnt"), (col("id") % 97).as("sv")).localCheckpoint(true)
    val specs = Seq(IncrementalOps.LinearAggSpec("sv", col("v")))
    def step(st: DataFrame): Unit =
      IncrementalOps.linearAggStep(Some(st), delta, Seq("k"), specs)
        .foreach(_ => ())
    val small = meter(step(aggState(2000)))
    val large = meter(step(aggState(40000)))
    assert(large <= small + 50,
      s"shuffle grew with state: small=$small large=$large")
    assert(large < 500, s"step shuffled too much: $large records")
  }

  test("generalAggStep shuffle volume is independent of state size") {
    def step(st: DataFrame): Unit = {
      val r = IncrementalOps.generalAggStep(Some(st), delta, Seq("k"),
        Seq(max(col("v")).as("mx")))
      r.rows.foreach(_ => ())
    }
    val small = meter(step(mkState(2000)))
    val large = meter(step(mkState(40000)))
    assert(large <= small + 50,
      s"shuffle grew with state: small=$small large=$large")
  }

  test("distinctStep shuffle volume is independent of state size") {
    def step(st: DataFrame): Unit = {
      val (_, out) = IncrementalOps.distinctStep(Some(st), delta)
      out.foreach(_ => ())
    }
    val small = meter(step(mkState(2000)))
    val large = meter(step(mkState(40000)))
    assert(large <= small + 50,
      s"shuffle grew with state: small=$small large=$large")
  }

  test("joinStep output-delta shuffle volume is independent of trace size") {
    def mkSide(n: Int, tag: String): DataFrame =
      spark.range(n.toLong).select(col("id").as("k"),
        concat(lit(tag), col("id")).as(s"p$tag"))
        .withColumn(ZSets.W, lit(1L)).localCheckpoint(true)
    val dA = Seq((3L, "a-new", 1L)).toDF("k", "pa", ZSets.W)
      .localCheckpoint(true)
    val dB = Seq((5L, "b-new", 1L)).toDF("k", "pb", ZSets.W)
      .localCheckpoint(true)
    def step(n: Int): Unit = {
      val (_, _, out) = IncrementalOps.joinStep(
        Some(mkSide(n, "a")), Some(mkSide(n, "b")), dA, dB, Seq("k"))
      out.foreach(_ => ())
    }
    val small = meter(step(2000))
    val large = meter(step(40000))
    assert(large <= small + 50,
      s"shuffle grew with trace: small=$small large=$large")
  }
}
