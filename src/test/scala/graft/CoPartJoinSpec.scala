package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.incremental.{BucketedTrace, CoPartTieredTrace, MemoryTrace, Trace}
import graft.zset.ZSets
import graft.zset.ZSets.W

/** Co-partitioned standing-join state: hash-partitioned memory runs whose
  * run-vs-run bilinear terms plan with ZERO exchanges — the only movement
  * per batch is each delta's own repartition at append. Correctness
  * through a retraction schedule with batch-boundary compaction, plus the
  * plan-shape assertion.
  */
class CoPartJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkTrace(template: DataFrame): MemoryTrace =
    new MemoryTrace(ZSets.lift(template).limit(0), Seq("k"),
      autoCompactRuns = Int.MaxValue, hashParts = Some(8))

  test("co-partitioned bilinear join: exact result, exchange-free terms") {
    val a = spark.range(600).select(col("id").as("k"),
      (col("id") * 2).as("av"))
    val b = spark.range(600).select((col("id") % 300).as("k"),
      (col("id") + 7).as("bv"))
    val aT = mkTrace(a)
    val bT = mkTrace(b)
    try {
      val aBatches = Seq(
        ZSets.lift(a.filter(col("k") % 3 === 0)),
        ZSets.lift(a.filter(col("k") % 3 === 1)),
        ZSets.lift(a.filter(col("k") % 3 === 2)).unionByName(
          ZSets.negate(ZSets.lift(a.filter(col("k") % 10 === 0)))))
      val bBatches = Seq(
        ZSets.lift(b.filter(col("k") % 3 === 1)),
        ZSets.lift(b.filter(col("k") % 3 === 2)),
        ZSets.lift(b.filter(col("k") % 3 === 0)))
      var out = Option.empty[DataFrame]
      aBatches.zip(bBatches).foreach { case (dA, dB) =>
        // maxRuns = 1 forces a batch-boundary compaction between steps —
        // the schedule exercises compaction without breaking captured
        // frames (it happens before this step captures run lists)
        val d0 = BucketedTrace.coPartJoinStep(aT, bT, dA, dB, Seq("k"),
          maxRuns = 1)
        // the step's whole output plan moves no data: runs are declared
        // hash-partitioned and every term is a run-vs-run co-partitioned
        // join (the deltas' own repartition happened at append, outside
        // this plan)
        d0.collect() // resolve AQE to the final physical plan first
        val plan = d0.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"expected exchange-free co-partitioned join terms, got:\n$plan")
        val d = graft.incremental.Trace.materialize(d0)
        out = Some(out.map(_.unionByName(d)).getOrElse(d))
      }
      val got = ZSets.toMultiset(ZSets.consolidate(out.get))
        .select("k", "av", "bv").as[(Long, Long, Long)].collect().sorted
      val want = a.filter(col("k") % 10 =!= 0).join(b, "k")
        .select("k", "av", "bv").as[(Long, Long, Long)].collect().sorted
      assert(got === want)
    } finally { aT.delete(); bT.delete() }
  }

  test("tiered co-partitioned trace: memtable spills to the bucketed " +
      "table without changing results or plan shape") {
    val a = spark.range(400).select(col("id").as("k"),
      (col("id") * 3).as("av"))
    val b = spark.range(400).select((col("id") % 200).as("k"),
      (col("id") + 1).as("bv"))
    // memRows tiny: every batch-boundary check drains the memtable into
    // the bucketed table, so later batches join memory runs AGAINST the
    // disk tier — both sides still co-partitioned, still no exchange
    def mk(t: org.apache.spark.sql.DataFrame) = new CoPartTieredTrace(
      ZSets.lift(t).limit(0), Seq("k"), nParts = 8, memRows = 50)
    val aT = mk(a)
    val bT = mk(b)
    try {
      val aBatches = Seq(
        ZSets.lift(a.filter(col("k") % 2 === 0)),
        ZSets.lift(a.filter(col("k") % 2 === 1)).unionByName(
          ZSets.negate(ZSets.lift(a.filter(col("k") % 8 === 0)))))
      val bBatches = Seq(
        ZSets.lift(b.filter(col("k") % 2 === 1)),
        ZSets.lift(b.filter(col("k") % 2 === 0)))
      var out = Option.empty[org.apache.spark.sql.DataFrame]
      aBatches.zip(bBatches).zipWithIndex.foreach { case ((dA, dB), i) =>
        val d0 = BucketedTrace.coPartJoinStep(aT, bT, dA, dB, Seq("k"))
        d0.collect()
        val plan = d0.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"step $i: expected exchange-free terms across tiers, got:\n$plan")
        val d = graft.incremental.Trace.materialize(d0)
        out = Some(out.map(_.unionByName(d)).getOrElse(d))
      }
      assert(aT.spilled && bT.spilled, "the tiny bound must have spilled")
      val got = ZSets.toMultiset(ZSets.consolidate(out.get))
        .select("k", "av", "bv").as[(Long, Long, Long)].collect().sorted
      val want = a.filter(col("k") % 8 =!= 0).join(b, "k")
        .select("k", "av", "bv").as[(Long, Long, Long)].collect().sorted
      assert(got === want)
    } finally { aT.delete(); bT.delete() }
  }

  test("standing join per-batch shuffle stays flat over 24 micro-batches") {
    // the streaming steady-state contract (q8's shape): constant-size
    // deltas, traces growing 24x, per-batch shuffle volume must track the
    // DELTA (append repartition + output), never the accumulated runs.
    // Periodic compaction (maxRuns = 8) consolidates state — an amortized
    // O(|state|/maxRuns) spike by design — so the flatness assertion
    // compares window MEDIANS, which skip the compaction batches.
    val batchRows = 512
    def dA(m: Int): DataFrame = spark.range(batchRows.toLong)
      .select((col("id") + m.toLong * batchRows).as("k"),
        (col("id") * 2).as("av")).withColumn(W, lit(1L))
    def dB(m: Int): DataFrame = spark.range(batchRows.toLong)
      .select((col("id") + m.toLong * batchRows).as("k"),
        (col("id") + 7).as("bv")).withColumn(W, lit(1L))
    val aT = mkTrace(spark.range(1).select(col("id").as("k"),
      col("id").as("av")))
    val bT = mkTrace(spark.range(1).select(col("id").as("k"),
      col("id").as("bv")))
    val meterListener =
      new org.apache.spark.scheduler.SparkListener {
        @volatile var records = 0L
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          records += sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
      }
    def metered(action: => Unit): Long = {
      meterListener.records = 0L
      spark.sparkContext.addSparkListener(meterListener)
      try {
        action
        org.apache.spark.graft.TestShims.drainListenerBus(spark.sparkContext)
        meterListener.records
      } finally spark.sparkContext.removeSparkListener(meterListener)
    }
    try {
      var total = 0L
      val perBatch = (0 until 24).map { m =>
        metered {
          val d = BucketedTrace.coPartJoinStep(aT, bT,
            dA(m).localCheckpoint(true), dB(m).localCheckpoint(true),
            Seq("k"), maxRuns = 8)
          total += d.count()
        }
      }
      def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
      val early = median(perBatch.slice(2, 10))
      val late = median(perBatch.slice(16, 24))
      assert(late <= early * 13 / 10 + 64,
        s"per-batch shuffle grew with trace size: early=$early late=$late " +
          s"(all: ${perBatch.mkString(",")})")
      // every pair joins exactly once across the schedule
      assert(total === 24L * batchRows)
    } finally { aT.delete(); bT.delete() }
  }
}
