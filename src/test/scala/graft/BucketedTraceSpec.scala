package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.incremental.{BucketedTableTrace, BucketedTrace}
import graft.zset.ZSets
import graft.zset.ZSets.W

/** The persistent bucketed state backend (spine analogue): correctness of
  * append/probe/compact, the O(|Δ|)-bytes-per-step append contract, and
  * partition-pruned probe reads.
  */
class BucketedTraceSpec extends SparkSpec {
  import spark.implicits._

  private def zset(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("k", "v", W)

  test("append + read integrates runs; probe matches only requested keys") {
    val t = new BucketedTrace(zset(Nil), Seq("k"), nBuckets = 8)
    try {
      t.append(zset(Seq((1L, "a", 1L), (2L, "b", 1L))))
      t.append(zset(Seq((1L, "a", 1L), (3L, "c", 1L))))
      t.append(zset(Seq((2L, "b", -1L)))) // retraction cancels key 2
      val st = t.read().as[(Long, String, Long)].collect().toSet
      assert(st === Set((1L, "a", 2L), (3L, "c", 1L)))
      val pr = t.probe(Seq(Tuple1(1L)).toDF("k"))
        .as[(Long, String, Long)].collect().toSet
      assert(pr === Set((1L, "a", 2L)))
      // probing a fully-cancelled key returns nothing
      assert(t.probe(Seq(Tuple1(2L)).toDF("k")).count() === 0L)
    } finally t.delete()
  }

  test("append writes O(|delta|) bytes, never O(|state|)") {
    val t = new BucketedTrace(zset(Nil), Seq("k"), nBuckets = 8,
      autoCompactRuns = 100)
    try {
      val big = spark.range(50000)
        .select(col("id").as("k"), concat(lit("v"), col("id")).as("v"),
          lit(1L).as(W))
      t.append(big)
      val afterInit = t.bytesOnDisk
      val tiny = spark.range(100)
        .select((col("id") + 1000000L).as("k"),
          concat(lit("d"), col("id")).as("v"), lit(1L).as(W))
      t.append(tiny)
      val grown = t.bytesOnDisk - afterInit
      // a full-state rewrite would re-write ~afterInit bytes; a run append
      // writes footers + 100 rows — orders of magnitude less
      assert(grown > 0 && grown < afterInit / 5,
        s"append grew the trace by $grown bytes against a " +
          s"$afterInit-byte state — not O(|delta|)")
    } finally t.delete()
  }

  test("probe reads are partition-pruned to the probe's buckets") {
    val t = new BucketedTrace(zset(Nil), Seq("k"), nBuckets = 16,
      autoCompactRuns = 100)
    try {
      t.append(spark.range(20000)
        .select(col("id").as("k"), lit("x").as("v"), lit(1L).as(W)))
      val bytesRead = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            bytesRead.addAndGet(m.inputMetrics.bytesRead); ()
          }
        }
      }
      def metered(f: => Unit): Long = {
        bytesRead.set(0L)
        spark.sparkContext.addSparkListener(listener)
        try { f; org.apache.spark.sql.graft.Shims.drainListeners(spark) }
        finally spark.sparkContext.removeSparkListener(listener)
        bytesRead.get
      }
      val fullBytes = metered { t.read().write.format("noop")
        .mode("overwrite").save() }
      // one key → one bucket of 16: the probe must scan a fraction of the
      // trace (its one bucket), not all of it
      val probeBytes = metered { t.probe(Seq(Tuple1(7L)).toDF("k"))
        .write.format("noop").mode("overwrite").save() }
      assert(probeBytes > 0 && probeBytes < fullBytes / 4,
        s"probe read $probeBytes of $fullBytes bytes — not pruned")
    } finally t.delete()
  }

  test("probe pushes the key range to the parquet scan (sorted-run pruning)") {
    val t = new BucketedTrace(zset(Nil), Seq("k"), nBuckets = 4,
      autoCompactRuns = 100)
    try {
      t.append(spark.range(5000)
        .select(col("id").as("k"), lit("x").as("v"), lit(1L).as(W)))
      val probed = t.probe(Seq(Tuple1(42L), Tuple1(43L)).toDF("k"))
      // correctness
      assert(probed.as[(Long, String, Long)].collect().toSet
        === Set((42L, "x", 1L), (43L, "x", 1L)))
      // plan: the scan carries pushed >= / <= filters on k, so key-sorted
      // row groups can be skipped by parquet min/max stats at scale
      val scan = probed.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("PushedFilters")).mkString("\n")
      assert(scan.contains("GreaterThanOrEqual(k,42)")
        && scan.contains("LessThanOrEqual(k,43)"),
        s"expected pushed key-range filters in:\n$scan")
    } finally t.delete()
  }

  test("compaction folds runs, preserves content, and bounds disk") {
    val t = new BucketedTrace(zset(Nil), Seq("k"), nBuckets = 4,
      autoCompactRuns = 3)
    try {
      // 6 appends with cancelling weights → 2 auto-compactions fire
      (1 to 6).foreach { i =>
        t.append(zset(Seq((1L, "a", 1L), (2L, "b", if (i % 2 == 0) -1L else 1L))))
      }
      val st = t.read().as[(Long, String, Long)].collect().toSet
      assert(st === Set((1L, "a", 6L)))
      t.compact()
      assert(t.read().as[(Long, String, Long)].collect().toSet === st)
    } finally t.delete()
  }

  test("bucketed joinStep equals the batch join under retractions") {
    val a = Seq((1L, "o1"), (2L, "o2"), (3L, "o3"), (10L, "o10"))
      .toDF("k", "av")
    val b = Seq((1L, "l1"), (1L, "l1b"), (2L, "l2"), (10L, "l10"))
      .toDF("k", "bv")
    // batches: a in 2 waves, b in 2 waves; last step retracts k=10 rows
    val aB = Seq(
      ZSets.lift(a.filter(col("k") <= 2)),
      ZSets.lift(a.filter(col("k") > 2))
        .unionByName(ZSets.negate(ZSets.lift(a.filter(col("k") === 10)))))
    val bB = Seq(
      ZSets.lift(b.filter(col("k") <= 1)),
      ZSets.lift(b.filter(col("k") > 1))
        .unionByName(ZSets.negate(ZSets.lift(b.filter(col("k") === 10)))))
    val aT = new BucketedTrace(aB.head.limit(0), Seq("k"), nBuckets = 4)
    val bT = new BucketedTrace(bB.head.limit(0), Seq("k"), nBuckets = 4)
    try {
      var out = Option.empty[DataFrame]
      aB.zip(bB).foreach { case (dA, dB) =>
        val d = BucketedTrace.joinStep(aT, bT, dA, dB, Seq("k"))
        out = Some(out.map(_.unionByName(d)).getOrElse(d))
      }
      val got = ZSets.toMultiset(ZSets.consolidate(out.get))
        .as[(Long, String, String)].collect().sorted.toSeq
      val want = a.filter(col("k") =!= 10)
        .join(b.filter(col("k") =!= 10), "k")
        .as[(Long, String, String)].collect().sorted.toSeq
      assert(got === want)
    } finally { aT.delete(); bT.delete() }
  }

  test("bucketed generalAggStep equals the in-memory rule under retraction") {
    import graft.incremental.IncrementalOps
    val rows = Seq(
      ("a", 10.0), ("a", 20.0), ("b", 5.0), ("b", 7.0), ("c", 9.0))
      .toDF("g", "v")
    // batch 1 inserts everything; batch 2 retracts group c entirely and
    // one of a's rows — group c must surface in deletedGroups
    val batches = Seq(
      ZSets.lift(rows),
      ZSets.negate(ZSets.lift(rows.filter(col("g") === "c" || col("v") === 20.0))))
    val aggs = Seq(min(col("v")).as("mn"), max(col("v")).as("mx"),
      count(lit(1)).as("n"))
    val trace = new BucketedTrace(batches.head.limit(0), Seq("g"),
      nBuckets = 4)
    try {
      var st = Option.empty[org.apache.spark.sql.DataFrame]
      batches.foreach { d =>
        // reference rule (in-memory state)
        val r = IncrementalOps.generalAggStep(st, d, Seq("g"), aggs)
        st = Some(r.state.localCheckpoint(false))
        // bucketed rule
        val (rows2, deleted2) = BucketedTrace.generalAggStep(
          trace, d, Seq("g"), aggs)
        val a = r.rows.as[(String, Double, Double, Long)].collect().toSet
        val b = rows2.as[(String, Double, Double, Long)].collect().toSet
        assert(a === b)
        assert(r.deletedGroups.as[String].collect().toSet
          === deleted2.select("g").as[String].collect().toSet)
      }
      // final state agrees too
      assert(trace.read().as[(String, Double, Long)].collect().toSet
        === st.get.as[(String, Double, Long)].collect().toSet)
    } finally trace.delete()
  }

  test("bucketed linearAggStep equals the in-memory rule; groups vanish at 0") {
    import graft.incremental.IncrementalOps
    import graft.incremental.IncrementalOps.LinearAggSpec
    val rows = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("c", 9L))
      .toDF("g", "v")
    val batches = Seq(
      ZSets.lift(rows),
      // retract all of c (group must vanish) and one of a's rows
      ZSets.negate(ZSets.lift(rows.filter(col("g") === "c" || col("v") === 20L))),
      ZSets.lift(Seq(("b", 100L)).toDF("g", "v")))
    val specs = Seq(LinearAggSpec("s", col("v")))
    val trace = BucketedTrace.linearAggTrace(batches.head, Seq("g"), specs,
      nBuckets = 4)
    try {
      var st = Option.empty[DataFrame]
      batches.foreach { d =>
        st = Some(IncrementalOps.linearAggStep(st, d, Seq("g"), specs)
          .localCheckpoint(false))
        BucketedTrace.linearAggStep(trace, d, Seq("g"), specs)
      }
      assert(ZSets.toMultiset(trace.read()).as[(String, Long, Long)]
        .collect().toSet
        === st.get.as[(String, Long, Long)].collect().toSet)
    } finally trace.delete()
  }

  test("bucketed chainAggStep equals the in-memory rule; no-move cancels") {
    import graft.incremental.IncrementalOps
    import graft.incremental.IncrementalOps.ChainSpec
    val specs = Seq(ChainSpec("mn", col("v"), isMax = false),
      ChainSpec("mx", col("v"), isMax = true))
    val batches = Seq(
      Seq(("a", 5L), ("a", 9L), ("b", 3L)),
      Seq(("a", 7L), ("b", 1L)),   // a unchanged → zero-byte contribution
      Seq(("a", 100L), ("c", 2L))
    ).map(_.toDF("g", "v"))
    val trace = BucketedTrace.chainAggTrace(batches.head, Seq("g"), specs,
      nBuckets = 4)
    try {
      var st = Option.empty[DataFrame]
      batches.foreach { b =>
        st = Some(IncrementalOps.chainAggStep(st, b, Seq("g"), specs)
          .localCheckpoint(false))
        BucketedTrace.chainAggStep(trace, b, Seq("g"), specs)
      }
      assert(ZSets.toMultiset(trace.read()).as[(String, Long, Long)]
        .collect().toSet
        === st.get.as[(String, Long, Long)].collect().toSet)
    } finally trace.delete()
  }

  test("bucketed distinctStep equals the in-memory rule across transitions") {
    import graft.incremental.IncrementalOps
    // schedule: appear → duplicate (no transition) → vanish → reappear
    val batches = Seq(
      Seq(("x", 1L), ("y", 1L)),
      Seq(("x", 1L), ("z", 1L)),          // x now weight 2 — no transition
      Seq(("x", -2L), ("y", -1L)),        // x and y vanish
      Seq(("x", 1L))                      // x reappears
    ).map(_.toDF("v", W))
    val trace = new BucketedTrace(batches.head.limit(0), Seq("v"),
      nBuckets = 4)
    try {
      var st = Option.empty[DataFrame]
      batches.foreach { d =>
        val (s2, outMem) = IncrementalOps.distinctStep(st, d)
        st = Some(s2.localCheckpoint(false))
        val outTrace = BucketedTrace.distinctStep(trace, d)
        assert(outMem.as[(String, Long)].collect().toSet
          === outTrace.as[(String, Long)].collect().toSet)
      }
      assert(trace.read().as[(String, Long)].collect().toSet
        === st.get.as[(String, Long)].collect().toSet)
    } finally trace.delete()
  }

  test("bucketed upsertStep equals the in-memory rule: overwrite + delete") {
    import graft.incremental.IncrementalOps
    val batches = Seq(
      Seq((1L, "a", false), (2L, "b", false), (3L, "c", false)),
      Seq((2L, "B", false), (3L, "c", false)),  // overwrite + no-op rewrite
      Seq((1L, null.asInstanceOf[String], true), (4L, "d", false))
    ).map(_.toDF("k", "v", "_deleted"))
    val trace = new BucketedTrace(
      Seq((0L, "t", 0L)).toDF("k", "v", W).limit(0), Seq("k"), nBuckets = 4)
    try {
      var st = Option.empty[DataFrame]
      batches.foreach { b =>
        val (s2, outMem) = IncrementalOps.upsertStep(st, b, Seq("k"),
          assumeUnique = true)
        st = Some(s2.localCheckpoint(false))
        val outTrace = BucketedTrace.upsertStep(trace, b, Seq("k"),
          assumeUnique = true)
        assert(outMem.as[(Long, String, Long)].collect().toSet
          === outTrace.as[(Long, String, Long)].collect().toSet)
      }
      // integrated trace = live PK rows
      assert(ZSets.toMultiset(trace.read()).as[(Long, String)]
        .collect().toSet === Set((2L, "B"), (3L, "c"), (4L, "d")))
    } finally trace.delete()
  }

  test("bucketed-TABLE trace joins exchange-free and matches the batch join") {
    // the cluster layout for standing joins: runs in a bucketBy table, so
    // the join shuffles ONLY the delta — assert both the values and the
    // plan shape (shuffle-hash join; no Exchange above the trace scan)
    val a = Seq((1L, "o1"), (2L, "o2"), (3L, "o3")).toDF("k", "av")
    val b = Seq((1L, "l1"), (1L, "l1b"), (3L, "l3")).toDF("k", "bv")
    val aB = Seq(ZSets.lift(a.filter(col("k") <= 2)),
      ZSets.lift(a.filter(col("k") > 2)))
    val bB = Seq(ZSets.lift(b.filter(col("k") <= 1)),
      ZSets.lift(b.filter(col("k") > 1)))
    val aT = new BucketedTableTrace(aB.head.limit(0), Seq("k"), nBuckets = 4)
    val bT = new BucketedTableTrace(bB.head.limit(0), Seq("k"), nBuckets = 4)
    try {
      var out = Option.empty[org.apache.spark.sql.DataFrame]
      aB.zip(bB).foreach { case (dA, dB) =>
        val d = BucketedTableTrace.joinStep(aT, bT, dA, dB, Seq("k"))
        out = Some(out.map(_.unionByName(d)).getOrElse(d))
      }
      val got = ZSets.toMultiset(ZSets.consolidate(out.get))
        .as[(Long, String, String)].collect().sorted.toSeq
      val want = a.join(b, "k").as[(Long, String, String)]
        .collect().sorted.toSeq
      assert(got === want)
      // plan shape: trace side scans the bucketed table with no Exchange
      // between scan and join; the delta side carries the only Exchange
      val plan = aT.runsRaw.withColumnRenamed(W, "_wt")
        .join(Seq((1L, "x", 1L)).toDF("k", "p", "_wd").hint("shuffle_hash"),
          Seq("k"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-hash join:\n$plan")
      val traceSide = plan.linesIterator
        .dropWhile(l => !l.contains("ShuffledHashJoin")).toSeq
        .takeWhile(l => !l.contains("Exchange")).mkString("\n")
      assert(traceSide.contains(aT.table),
        s"trace scan must sit under the join with no Exchange:\n$plan")
    } finally { aT.delete(); bT.delete() }
  }
}
