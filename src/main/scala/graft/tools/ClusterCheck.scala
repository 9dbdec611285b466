package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.incremental.{BucketedTrace, CoPartTieredTrace, MemoryTrace, Trace}
import graft.zset.ZSets

/** Multi-executor validation (dev tool): runs the co-partitioned /
  * tiered / bucketed state layouts on a REAL multi-process cluster —
  * Spark's `local-cluster[2,2,...]` master spawns two separate executor
  * JVMs — so the layout claims the plan-shape specs assert (declared
  * hash partitioning on memory runs, exchange-free run-vs-run terms,
  * bucket-pruned disk probes) are exercised with genuine serialization,
  * remote broadcasts, and cross-process shuffles rather than the
  * in-process fast paths of `local[n]`.
  *
  * Prints `CLUSTERCHECK OK executors=N` and exits 0 on success; any
  * failure exits nonzero. Driven by LocalClusterSpec as a spawned
  * process (one SparkContext per JVM).
  */
object ClusterCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_CLUSTER_MASTER",
        "local-cluster[2,2,1500]"))
      .appName("graft-cluster-check")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ship this build's classes to the executor JVMs
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // 1. demand REAL executors (driver + 2): the point of the check
      val deadline = System.currentTimeMillis() + 120000
      def execs(): Int =
        spark.sparkContext.statusTracker.getExecutorInfos.length
      while (execs() < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(500)
      require(execs() >= 3, s"expected >=2 remote executors, got ${execs() - 1}")

      val a = spark.range(600).select(col("id").as("k"),
        (col("id") * 2).as("av"))
      val b = spark.range(600).select((col("id") % 300).as("k"),
        (col("id") + 7).as("bv"))
      val want = a.filter(col("k") % 10 =!= 0).join(b, "k")
        .select("k", "av", "bv").collect().map(_.toString).sorted
      val aBatches = Seq(
        ZSets.lift(a.filter(col("k") % 3 === 0)),
        ZSets.lift(a.filter(col("k") % 3 === 1)),
        ZSets.lift(a.filter(col("k") % 3 === 2)).unionByName(
          ZSets.negate(ZSets.lift(a.filter(col("k") % 10 === 0)))))
      val bBatches = Seq(
        ZSets.lift(b.filter(col("k") % 3 === 1)),
        ZSets.lift(b.filter(col("k") % 3 === 2)),
        ZSets.lift(b.filter(col("k") % 3 === 0)))

      def drive(aT: Trace with graft.incremental.CoPartitionedTrace,
          bT: Trace with graft.incremental.CoPartitionedTrace,
          assertNoExchange: Boolean): Array[String] = {
        var out = Option.empty[DataFrame]
        aBatches.zip(bBatches).foreach { case (dA, dB) =>
          val d0 = BucketedTrace.coPartJoinStep(aT, bT, dA, dB, Seq("k"),
            maxRuns = 1)
          d0.collect()
          if (assertNoExchange) {
            val plan = d0.queryExecution.executedPlan.toString
            require(!plan.contains("Exchange"),
              s"co-partitioned terms must stay exchange-free on a real " +
                s"cluster, got:\n$plan")
          }
          val d = Trace.materialize(d0)
          out = Some(out.map(_.unionByName(d)).getOrElse(d))
        }
        ZSets.toMultiset(ZSets.consolidate(out.get))
          .select("k", "av", "bv").collect().map(_.toString).sorted
      }

      // 2. co-partitioned memory runs: exchange-free across processes
      val aT = new MemoryTrace(ZSets.lift(a).limit(0), Seq("k"),
        autoCompactRuns = Int.MaxValue, hashParts = Some(8))
      val bT = new MemoryTrace(ZSets.lift(b).limit(0), Seq("k"),
        autoCompactRuns = Int.MaxValue, hashParts = Some(8))
      try require(drive(aT, bT, assertNoExchange = true).sameElements(want),
        "co-partitioned memory-run join diverged on local-cluster")
      finally { aT.delete(); bT.delete() }

      // 3. tiered: memtable spilling to the bucketed disk layout, read
      // back by whichever executor the task lands on (shared local FS)
      val aT2 = new CoPartTieredTrace(ZSets.lift(a).limit(0), Seq("k"),
        nParts = 8, memRows = 50)
      val bT2 = new CoPartTieredTrace(ZSets.lift(b).limit(0), Seq("k"),
        nParts = 8, memRows = 50)
      try require(drive(aT2, bT2, assertNoExchange = false).sameElements(want),
        "tiered co-partitioned join diverged on local-cluster")
      finally { aT2.delete(); bT2.delete() }

      // 4. bucketed disk trace: append as runs, key-pruned probe
      val cT = new BucketedTrace(ZSets.lift(a).limit(0), Seq("k"),
        nBuckets = 8)
      try {
        cT.append(ZSets.lift(a.filter(col("k") < 300)))
        cT.append(ZSets.lift(a.filter(col("k") >= 300)))
        val probe = spark.range(10).select((col("id") * 7).as("k"))
        val got = cT.probe(probe).select("k", "av")
          .collect().map(_.toString).sorted
        val exp = a.join(probe, "k").select("k", "av")
          .collect().map(_.toString).sorted
        require(got.sameElements(exp), "bucketed probe diverged")
      } finally cT.delete()

      // 5. full runner e2e: a DDL program with an aggregate-over-join
      // view stepped twice (with a retraction) must equal the batch
      // recompute — the IVM delta rules under real cross-process shuffles
      val pipe = graft.runtime.Pipeline(spark,
        """CREATE TABLE o (ok BIGINT, ck BIGINT, amt DOUBLE);
          |CREATE TABLE c (ck BIGINT, nm VARCHAR);
          |CREATE VIEW spend AS
          |  SELECT nm, COUNT(*) AS n,
          |    CAST(SUM(CAST(amt AS DECIMAL(18,4))) AS DOUBLE) AS total
          |  FROM o JOIN c ON o.ck = c.ck GROUP BY nm;""".stripMargin)
      val o = spark.range(500).select(col("id").as("ok"),
        (col("id") % 40).as("ck"), (col("id") * 1.5).as("amt"))
      val c = spark.range(40).select(col("id").as("ck"),
        concat(lit("c"), col("id")).as("nm"))
      pipe.step(Map(
        "o" -> ZSets.lift(o.filter(col("ok") % 2 === 0)),
        "c" -> ZSets.lift(c)))
      pipe.step(Map(
        "o" -> ZSets.lift(o.filter(col("ok") % 2 === 1)).unionByName(
          ZSets.negate(ZSets.lift(o.filter(col("ok") % 10 === 0))))))
      val gotV = pipe.adHoc("SELECT * FROM spend")
        .collect().map(_.toString).sorted
      val wantV = o.filter(col("ok") % 10 =!= 0).join(c, "ck")
        .groupBy("nm").agg(count(lit(1)).as("n"),
          sum(col("amt").cast("decimal(18,4)")).cast("double").as("total"))
        .select("nm", "n", "total").collect().map(_.toString).sorted
      require(gotV.sameElements(wantV),
        "pipeline step diverged from batch recompute on local-cluster")

      // 6. native lakehouse connectors under real executors: the log is
      // driver-side metadata, but part-file writes/reads and the
      // follow-mode delta scans run on the remote executor JVMs
      val lakeDir = java.nio.file.Files
        .createTempDirectory("cluster_delta").toString
      val rows = spark.range(400).select(col("id").as("k"),
        (col("id") * 3).as("v"))
      graft.sources.DeltaLake.append(spark, lakeDir,
        rows.filter(col("k") < 200))
      graft.sources.DeltaLake.append(spark, lakeDir,
        rows.filter(col("k") >= 200))
      graft.sources.DeltaLake.deleteWhere(spark, lakeDir, "k % 50 = 0")
      val gotD = graft.sources.DeltaLake.snapshot(spark, lakeDir)
        .collect().map(_.toString).sorted
      val wantD = rows.filter(col("k") % 50 =!= 0)
        .collect().map(_.toString).sorted
      require(gotD.sameElements(wantD),
        "delta round trip diverged on local-cluster")
      val iceDir = java.nio.file.Files
        .createTempDirectory("cluster_iceberg").toString
      graft.sources.IcebergLake.append(spark, iceDir,
        rows.filter(col("k") < 100))
      graft.sources.IcebergLake.append(spark, iceDir,
        rows.filter(col("k") >= 100 && col("k") < 150))
      val gotI = graft.sources.IcebergLake.snapshot(spark,
          graft.sources.IcebergLake.currentMetadata(spark, iceDir))
        .collect().map(_.toString).sorted
      val wantI = rows.filter(col("k") < 150)
        .collect().map(_.toString).sorted
      require(gotI.sameElements(wantI),
        "iceberg round trip diverged on local-cluster")

      // 7. spill-under-join: standing co-partitioned join whose state
      // grows far beyond the memtable bound, so every appended run
      // flushes to the bucketed parquet tier and the join reads the
      // SPILLED layout on whichever executor the task lands on. The
      // 100-TB property asserted: per-step shuffle WRITE tracks the
      // delta, not the accumulated state (state is scanned/bucket-probed
      // in place, never re-shuffled), and the final content equals the
      // batch join exactly.
      val spillBytes = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              st: org.apache.spark.scheduler.SparkListenerStageCompleted):
              Unit = {
            val m = st.stageInfo.taskMetrics
            if (m != null)
              spillBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ()
          }
        })
      val big = spark.range(240000).select(col("id").as("k"),
        (col("id") * 2).as("av"))
      val bigB = spark.range(240000).select((col("id") % 120000).as("k"),
        (col("id") + 7).as("bv"))
      val aT3 = new CoPartTieredTrace(ZSets.lift(big).limit(0), Seq("k"),
        nParts = 8, memRows = 2000) // state ≫ memtable: all runs spill
      val bT3 = new CoPartTieredTrace(ZSets.lift(bigB).limit(0), Seq("k"),
        nParts = 8, memRows = 2000)
      try {
        var acc = Option.empty[DataFrame]
        val stepBytes = (0 until 6).map { i =>
          val dA = ZSets.lift(big.filter(col("k") % 6 === i))
          val dB = ZSets.lift(bigB.filter(col("k") % 6 === i))
          val b0 = spillBytes.get
          val d = Trace.materialize(
            BucketedTrace.coPartJoinStep(aT3, bT3, dA, dB, Seq("k"),
              maxRuns = 1))
          acc = Some(acc.map(_.unionByName(d)).getOrElse(d))
          org.apache.spark.sql.graft.Shims.drainListeners(spark)
          spillBytes.get - b0
        }
        // flat per-step shuffle: the last step (state 6x the first's)
        // must not shuffle more than 3x the first step's bytes
        require(stepBytes.last <= stepBytes.head * 3 + (1 << 20),
          s"per-step shuffle grew with state: $stepBytes")
        val gotS = ZSets.toMultiset(ZSets.consolidate(acc.get))
          .groupBy().agg(count(lit(1)), sum(col("av")), sum(col("bv")))
          .collect().map(_.toString).sorted
        val wantS = big.join(bigB, "k")
          .groupBy().agg(count(lit(1)), sum(col("av")), sum(col("bv")))
          .collect().map(_.toString).sorted
        require(gotS.sameElements(wantS),
          "spilled co-partitioned join diverged from batch")
      } finally { aT3.delete(); bT3.delete() }

      println(s"CLUSTERCHECK OK executors=${execs() - 1} checks=7")
    } finally spark.stop()
  }
}
