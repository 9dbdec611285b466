package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.incremental.{BucketedTrace, MemoryTrace, TieredTrace, Trace}
import graft.zset.ZSets
import graft.zset.ZSets.W

/** The LSM-tiered state backend: memtable-tier appends cost zero disk
  * bytes, spills cross to the bucketed parquet tier without changing
  * Z-set content, and the delta rules produce identical results on every
  * backend either side of a flush.
  */
class TieredTraceSpec extends SparkSpec {
  import spark.implicits._

  private def zset(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("k", "v", W)

  private def drive(t: Trace): Unit = {
    t.append(zset(Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))))
    t.append(zset(Seq((1L, "a", 1L), (4L, "d", 1L))))
    t.append(zset(Seq((2L, "b", -1L), (5L, "e", 1L)))) // cancels key 2
    t.append(zset(Seq((4L, "d", -1L), (4L, "d2", 1L))))
  }

  private def readSet(t: Trace): Set[(Long, String, Long)] =
    t.read().as[(Long, String, Long)].collect().toSet

  private val expected = Set(
    (1L, "a", 2L), (3L, "c", 1L), (4L, "d2", 1L), (5L, "e", 1L))

  test("memory, bucketed, and tiered backends agree through retractions") {
    val mem = new MemoryTrace(zset(Nil), Seq("k"))
    val disk = new BucketedTrace(zset(Nil), Seq("k"), nBuckets = 8)
    // memRows = 3 forces a flush mid-schedule: some runs live on disk,
    // some in the memtable when read() runs
    val tiered = new TieredTrace(zset(Nil), Seq("k"), memRows = 3,
      nBuckets = 8)
    try {
      Seq[Trace](mem, disk, tiered).foreach(drive)
      assert(readSet(mem) === expected)
      assert(readSet(disk) === expected)
      assert(readSet(tiered) === expected)
      assert(tiered.bytesOnDisk > 0, "the tiny bound must have spilled")
      // probes agree across tiers (key 4 has runs in both)
      val probe = Seq(Tuple1(4L)).toDF("k")
      val expect4 = Set((4L, "d2", 1L))
      assert(mem.probe(probe).as[(Long, String, Long)].collect().toSet
        === expect4)
      assert(tiered.probe(probe).as[(Long, String, Long)].collect().toSet
        === expect4)
      // fully-cancelled key probes empty on every backend
      assert(tiered.probe(Seq(Tuple1(2L)).toDF("k")).count() === 0L)
      // compaction folds both tiers and preserves content
      tiered.compact()
      assert(readSet(tiered) === expected)
    } finally {
      mem.delete(); disk.delete(); tiered.delete()
    }
  }

  test("a state that fits the memtable never touches disk") {
    val t = new TieredTrace(zset(Nil), Seq("k"), memRows = 1L << 20)
    try {
      drive(t)
      assert(t.bytesOnDisk === 0L,
        "memtable-resident state must not write parquet")
      assert(readSet(t) === expected)
      t.compact() // an explicit compact flushes to the disk tier...
      assert(t.bytesOnDisk > 0L)
      assert(readSet(t) === expected) // ...without changing content
    } finally t.delete()
  }

  test("delta rules cross a flush boundary unchanged (distinct + join)") {
    val li = spark.range(2000).select(
      (col("id") % 40).as("k"), concat(lit("v"), col("id") % 7).as("v"))
    val batches = Seq(
      ZSets.lift(li.filter(col("id") % 3 === 0)),
      ZSets.lift(li.filter(col("id") % 3 === 1)),
      ZSets.lift(li.filter(col("id") % 3 === 2))
        .unionByName(ZSets.negate(ZSets.lift(li.filter(col("id") % 10 === 0)))))
    // distinct: memRows small enough that batch 2 spills
    val dt = new TieredTrace(ZSets.lift(li).limit(0), Seq("k", "v"),
      memRows = 300, nBuckets = 8)
    try {
      var out = Option.empty[DataFrame]
      batches.foreach { d =>
        val o = BucketedTrace.distinctStep(dt, d)
        out = Some(out.map(_.unionByName(o)).getOrElse(o))
      }
      assert(dt.bytesOnDisk > 0, "schedule must cross the flush")
      val got = ZSets.positive(ZSets.consolidate(out.get)).drop(W)
        .as[(Long, String)].collect().toSet
      val want = li.filter(col("id") % 10 =!= 0).distinct()
        .as[(Long, String)].collect().toSet
      assert(got === want)
    } finally dt.delete()

    // bilinear join: both traces tiered, flush mid-schedule
    val a = spark.range(300).select(col("id").as("k"),
      (col("id") * 2).as("av"))
    val b = spark.range(300).select((col("id") % 150).as("k"),
      (col("id") + 100).as("bv"))
    val aT = new TieredTrace(ZSets.lift(a).limit(0), Seq("k"),
      memRows = 100, nBuckets = 8)
    val bT = new TieredTrace(ZSets.lift(b).limit(0), Seq("k"),
      memRows = 100, nBuckets = 8)
    try {
      val aBatches = Seq(ZSets.lift(a.filter(col("k") % 2 === 0)),
        ZSets.lift(a.filter(col("k") % 2 === 1)))
      val bBatches = Seq(ZSets.lift(b.filter(col("k") % 2 === 1)),
        ZSets.lift(b.filter(col("k") % 2 === 0)))
      var out = Option.empty[DataFrame]
      aBatches.zip(bBatches).foreach { case (dA, dB) =>
        // evaluate before the next step's append may flush the memtable
        // runs this delta's plan reads (the trace contract); a
        // localCheckpoint would leak origin constraints into the union
        val d = Trace.materialize(
          BucketedTrace.joinStep(aT, bT, dA, dB, Seq("k")))
        out = Some(out.map(_.unionByName(d)).getOrElse(d))
      }
      assert(aT.bytesOnDisk > 0 && bT.bytesOnDisk > 0)
      val got = ZSets.toMultiset(ZSets.consolidate(out.get))
        .select("k", "av", "bv").as[(Long, Long, Long)].collect().sorted
      val want = a.join(b, "k").select("k", "av", "bv")
        .as[(Long, Long, Long)].collect().sorted
      assert(got === want)
    } finally { aT.delete(); bT.delete() }
  }
}
