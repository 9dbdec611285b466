package graft.incremental

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.zset.ZSets
import graft.zset.ZSets.W

/** The Z-set trace contract shared by every state backend — the Spark
  * re-expression of the reference's trace/batch abstraction
  * (crates/dbsp/src/trace/mod.rs: a trace is a sequence of immutable
  * batches with amortized merging). Backends differ only in WHERE runs
  * live:
  *
  *   - [[MemoryTrace]]: cached-RDD runs (the memtable tier),
  *   - [[BucketedTrace]]: parquet runs partitioned by key bucket (the
  *     disk tier, partition/row-group-pruned probes),
  *   - [[TieredTrace]]: memory runs in front of disk runs with a bounded
  *     spill — the LSM shape of the reference's spine
  *     (crates/dbsp/src/trace/spine_async.rs), where fresh batches stay
  *     in memory and merge down as they accumulate.
  *
  * Shared contract (what the delta rules in [[BucketedTrace]]'s companion
  * rely on):
  *   - [[append]] costs O(|delta|), never O(|state|);
  *   - [[probe]]/[[probeRaw]] return rows matching the probe keys — probe
  *     consolidated, probeRaw as raw run rows (weights unmerged);
  *   - frames returned BEFORE an append keep reading the pre-append run
  *     set (runs are immutable); [[compact]] (and a tiered flush) may
  *     invalidate pinned frames, so callers evaluate step outputs before
  *     compaction — the same contract the reference's trace consolidation
  *     has with in-flight cursors.
  */
trait Trace {
  def keys: Seq[String]

  /** Append one delta as a new immutable run: O(|delta|). */
  def append(delta: DataFrame): Unit

  /** Full consolidated state (one shuffle over the trace — batch read). */
  def read(): DataFrame

  /** Consolidated rows whose key appears in `probeKeys` (per-step read). */
  def probe(probeKeys: DataFrame): DataFrame

  /** Key-matching run rows WITHOUT consolidation — for bilinear consumers
    * that consolidate their OUTPUT once instead of every probe.
    */
  def probeRaw(probeKeys: DataFrame): DataFrame

  /** All current run rows, unconsolidated — for consumers whose own join
    * probe already filters the scan (no semi pre-filter needed).
    */
  def runsRaw: DataFrame

  /** Fold runs together (amortized maintenance; may invalidate frames
    * returned before the call).
    */
  def compact(): Unit

  /** Release the backing storage. */
  def delete(): Unit
}

object Trace {
  /** Eagerly materialize a step output as a fresh cached Row-RDD frame —
    * the constraint-safe alternative to `localCheckpoint(true)` for
    * frames that later land in a Union: a localCheckpoint's LogicalRDD
    * carries the ORIGIN plan's constraints, which under AQE can reference
    * attributes absent from the output and crash Catalyst's union
    * constraint rewrite (NoSuchElementException in AttributeMap). A frame
    * built from the raw RDD carries no origin constraints. Also pins the
    * result against later trace flush/compaction.
    */
  def materialize(df: DataFrame): DataFrame =
    // INTERNAL-row snapshot (Shims.internalSnapshot): same barrier and
    // pinning, but rows stay UnsafeRow end to end — `df.rdd` +
    // `createDataFrame(rdd, schema)` deserialized every row to an external
    // Row on write and re-encoded it on every read (measured ~50 task-s of
    // a 62 task-s incremental query at sf0.1, vs ~0.1 s on this path).
    org.apache.spark.sql.graft.Shims.internalSnapshot(df)._1
}

/** A trace whose runs share one declared hash partitioning on [[Trace
  * keys]], so run-vs-run equi-joins plan with no exchange
  * ([[BucketedTrace.coPartJoinStep]]). `runFrames` exposes the
  * individual run frames (a union would lose the declared layout);
  * `compactIfOver` bounds run count at a batch boundary — never
  * mid-step, because maintenance may unpersist frames an in-flight
  * delta still reads.
  */
trait CoPartitionedTrace extends Trace {
  def hashParts: Option[Int]
  def runFrames: Vector[DataFrame]
  def compactIfOver(n: Int): Unit
}

/** Memory-tier trace: runs are cached-RDD frames. The memtable of the LSM
  * — appends cost one delta-sized cache+count job (no parquet encode, no
  * file listing on read), probes are broadcast-semi filters over the
  * cached runs. On a cluster the cache distributes across executors like
  * any storage-level memory, so "memory tier" is cluster memory, not
  * driver memory. No pruning: the tier is BOUNDED (see [[TieredTrace]]),
  * so a full scan of the memtable is the cheap path by construction.
  */
final class MemoryTrace(
    template: DataFrame,
    val keys: Seq[String],
    val autoCompactRuns: Int = 16,
    /** When set, every run is hash-partitioned by [[keys]] into this many
      * partitions AND the layout is declared on the run frame
      * (HashPartitioning), so run-vs-run equi-joins on the keys plan with
      * NO exchange — the co-partitioned standing-join layout
      * ([[BucketedTrace.coPartJoinStep]]). The append pays one O(|delta|)
      * shuffle instead of the join paying a broadcast collect or a trace
      * reshuffle per batch.
      */
    val hashParts: Option[Int] = None) extends CoPartitionedTrace {

  private val spark: SparkSession = template.sparkSession
  private var runList: Vector[DataFrame] = Vector.empty
  private var cached: Vector[org.apache.spark.rdd.RDD[_]] = Vector.empty
  private var rowCount: Long = 0L

  private def emptyFrame: DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), template.schema)

  /** Materialize as a fresh cached Row-RDD frame — an origin-constraint
    * barrier (see BucketedTrace.snapshot) whose eager count also returns
    * the run's size for the spill accounting.
    */
  /** Eager cached INTERNAL-row snapshot (no external-row conversion, no
    * parquet encode — the memtable write path). MEMORY_AND_DISK: an
    * evicted MEMORY_ONLY partition recomputes through lineage, and a run
    * built from a streaming micro-batch has no replayable lineage once
    * the batch ends — spill to local disk instead of recomputing.
    */
  private def snapshot(df: DataFrame): (DataFrame, Long, org.apache.spark.rdd.RDD[_]) =
    hashParts match {
      case Some(n) => org.apache.spark.sql.graft.Shims
        .internalSnapshotPartitioned(df, keys, n)
      case None => org.apache.spark.sql.graft.Shims.internalSnapshot(df)
    }

  def append(delta: DataFrame): Unit = {
    val (run, n, rdd) = snapshot(delta)
    runList :+= run
    cached :+= rdd
    rowCount += n
    if (runList.size >= autoCompactRuns) compact()
  }

  /** Rows across all current runs. The returned frame is built from the
    * CURRENT immutable run vector, so later appends never change it.
    */
  def runsRaw: DataFrame =
    if (runList.isEmpty) emptyFrame
    else runList.reduce(_ unionByName _)

  def read(): DataFrame =
    ZSets.consolidate(runsRaw).filter(col(W) =!= 0)

  private def semi(df: DataFrame, probeKeys: DataFrame): DataFrame = {
    val probe = IncrementalOps.maybeBroadcast(
      probeKeys.select(keys.map(k => col(k).as(s"_p_$k")): _*))
    val cond = keys.map(k => col(k) <=> col(s"_p_$k")).reduce(_ && _)
    df.join(probe, cond, "left_semi")
  }

  def probe(probeKeys: DataFrame): DataFrame =
    ZSets.consolidate(semi(runsRaw, probeKeys)).filter(col(W) =!= 0)

  def probeRaw(probeKeys: DataFrame): DataFrame = semi(runsRaw, probeKeys)

  def compact(): Unit = {
    if (runList.size <= 1) return
    val (folded, n, rdd) = snapshot(read())
    val old = cached
    runList = Vector(folded)
    cached = Vector(rdd)
    rowCount = n
    old.foreach(_.unpersist(false))
  }

  /** Rows currently held (pre-consolidation) — the spill accounting. */
  def heldRows: Long = rowCount

  /** The current immutable run frames (consumers doing per-run joins —
    * [[BucketedTrace.coPartJoinStep]] — iterate these; a union loses the
    * declared per-run partitioning).
    */
  def runFrames: Vector[DataFrame] = runList

  /** Compact if the run count exceeds `n` — for step loops that must
    * control WHEN compaction happens (a compact unpersists the old runs,
    * so frames captured before it would re-evaluate dead lineage; call
    * this at a batch boundary, before capturing run frames).
    */
  def compactIfOver(n: Int): Unit = if (runList.size > n) compact()

  /** Hand the current runs to a consumer and clear the tier. The caller
    * owns unpersisting the returned frames' RDDs once it has durably
    * consumed them ([[TieredTrace]] flush).
    */
  private[incremental] def drain(): Vector[(DataFrame, org.apache.spark.rdd.RDD[_])] = {
    val out = runList.zip(cached)
    runList = Vector.empty
    cached = Vector.empty
    rowCount = 0
    out
  }

  def delete(): Unit = {
    cached.foreach(_.unpersist(false))
    runList = Vector.empty
    cached = Vector.empty
    rowCount = 0
  }
}

/** LSM-tiered trace: a bounded [[MemoryTrace]] memtable in front of a
  * [[BucketedTrace]] disk tier — the closest Spark shape to the
  * reference's spine (fresh batches in memory, merged down to larger
  * on-disk batches as they accumulate; spine_async.rs). Appends go to
  * memory; when the memtable exceeds `memRows` (post-consolidation
  * estimate), its runs flush to the disk tier as ONE parquet run. Probes
  * and reads see both tiers.
  *
  * The result: a micro-batch step loop pays cache-speed appends and
  * memtable-scan probes while state is hot and small, and degrades
  * gracefully to the pruned parquet path exactly when state outgrows
  * memory — no configuration cliff, same outputs either side of the
  * flush (Z-set content is tier-invariant; TieredTraceSpec asserts it
  * across flush boundaries).
  *
  * Flush invalidates frames pinned before it (their cached runs
  * unpersist) — same caller contract as [[compact]]: evaluate step
  * outputs before the trace flushes or compacts. Flushes only happen
  * inside [[append]]/[[compact]]/[[flush]], never behind a read.
  */
final class TieredTrace(
    template: DataFrame,
    val keys: Seq[String],
    /** Memtable spill bound, in rows (held, pre-consolidation). Local
      * default sized for the test battery; production sizing is a
      * fraction of cluster storage memory.
      */
    val memRows: Long = 4L << 20,
    val nBuckets: Int = 32,
    val diskAutoCompactRuns: Int = 8,
    val sortRuns: Boolean = true,
    /** Merge weights when the memtable spills. Disable for append-only /
      * duplicate-free traces (standing-join sides with unique keys):
      * unconsolidated runs are correct Z-set content either way — merging
      * happens lazily at read — and skipping saves a memtable-sized
      * shuffle per flush.
      */
    val consolidateOnFlush: Boolean = true) extends Trace {

  /** Memtable self-compacts every 16 runs: a long append schedule below
    * the spill bound would otherwise union hundreds of run frames into
    * every probe plan (analysis cost grows with run count even when the
    * data is tiny).
    */
  val mem = new MemoryTrace(template, keys, autoCompactRuns = 16)
  /** Disk tier is created lazily: a state that never outgrows the
    * memtable never touches the filesystem.
    */
  private var diskOpt: Option[BucketedTrace] = None
  private def disk: BucketedTrace = diskOpt.getOrElse {
    val d = new BucketedTrace(template, keys, nBuckets,
      diskAutoCompactRuns, sortRuns = sortRuns)
    diskOpt = Some(d)
    d
  }

  def append(delta: DataFrame): Unit = {
    mem.append(delta)
    if (mem.heldRows > memRows) flush()
  }

  /** Spill the memtable down to the disk tier as one run. */
  def flush(): Unit = {
    if (mem.heldRows == 0) return
    val runs = mem.drain()
    val all = runs.map(_._1).reduce(_ unionByName _)
    val folded =
      if (consolidateOnFlush) ZSets.consolidate(all).filter(col(W) =!= 0)
      else all
    disk.append(folded) // parquet write evaluates `folded` eagerly...
    runs.foreach(_._2.unpersist(false)) // ...so the caches can go now
  }

  def runsRaw: DataFrame = diskOpt match {
    case None => mem.runsRaw
    case Some(d) => d.runsRaw.unionByName(mem.runsRaw)
  }

  def read(): DataFrame = diskOpt match {
    case None => mem.read()
    case Some(d) => ZSets.consolidate(
      d.runsRaw.unionByName(mem.runsRaw)).filter(col(W) =!= 0)
  }

  def probe(probeKeys: DataFrame): DataFrame = diskOpt match {
    case None => mem.probe(probeKeys)
    case Some(d) =>
      // raw matches from both tiers, consolidated ONCE. The disk side
      // keeps its dynamic bucket pruning (probeRaw); the memtable is a
      // bounded scan by construction.
      ZSets.consolidate(
        d.probeRaw(probeKeys).unionByName(mem.probeRaw(probeKeys)))
        .filter(col(W) =!= 0)
  }

  def probeRaw(probeKeys: DataFrame): DataFrame = diskOpt match {
    case None => mem.probeRaw(probeKeys)
    case Some(d) =>
      d.probeRaw(probeKeys).unionByName(mem.probeRaw(probeKeys))
  }

  def compact(): Unit = {
    flush()
    diskOpt.foreach(_.compact())
  }

  def delete(): Unit = {
    mem.delete()
    diskOpt.foreach(_.delete())
    diskOpt = None
  }

  /** Disk bytes currently held (0 while the state fits the memtable). */
  def bytesOnDisk: Long = diskOpt.map(_.bytesOnDisk).getOrElse(0L)
}

/** CO-PARTITIONED LSM-tiered trace — the standing-join state layout at
  * full scale: memory runs hash-partitioned by the join keys
  * ([[MemoryTrace]] with hashParts) in front of a Spark BUCKETED TABLE
  * tier ([[BucketedTableTrace]]) with the same bucket count. A bucketed
  * scan reports the same HashPartitioning the memory runs declare, so
  * EVERY run — memtable or disk — joins run-vs-run with no exchange;
  * spilling changes where bytes live, not the plan shape. The memtable
  * drains to the table as one run when it exceeds `memRows` (rows land
  * in the bucket their partition already is — the write re-hashes but
  * never shuffles), which is [[compactIfOver]]'s batch-boundary hook.
  */
final class CoPartTieredTrace(
    template: DataFrame,
    val keys: Seq[String],
    val nParts: Int,
    val memRows: Long = 32L << 20) extends CoPartitionedTrace {

  val mem = new MemoryTrace(template, keys,
    autoCompactRuns = Int.MaxValue, hashParts = Some(nParts))
  private var diskOpt: Option[BucketedTableTrace] = None
  private def disk: BucketedTableTrace = diskOpt.getOrElse {
    val d = new BucketedTableTrace(template, keys, nParts)
    diskOpt = Some(d)
    d
  }

  def hashParts: Option[Int] = Some(nParts)

  def append(delta: DataFrame): Unit = mem.append(delta)

  /** Drain the memtable into the bucketed table as one run. Eager (the
    * table write evaluates the runs) — only call at a batch boundary:
    * the drained frames unpersist afterwards.
    */
  def flush(): Unit = {
    if (mem.heldRows == 0) return
    val runs = mem.drain()
    disk.append(runs.map(_._1).reduce(_ unionByName _))
    runs.foreach(_._2.unpersist(false))
  }

  /** Memtable spill check — the batch-boundary maintenance hook
    * ([[BucketedTrace.coPartJoinStep]] calls this before capturing run
    * frames). Spills on HELD ROWS rather than run count: the disk tier
    * absorbs any number of runs as one co-partitioned frame.
    */
  def compactIfOver(n: Int): Unit =
    if (mem.heldRows > memRows || mem.runFrames.size > n) flush()

  def runFrames: Vector[DataFrame] =
    diskOpt.map(d => Vector(d.runsRaw)).getOrElse(Vector.empty) ++
      mem.runFrames

  def runsRaw: DataFrame = runFrames match {
    case Vector() => mem.runsRaw
    case fs => fs.reduce(_ unionByName _)
  }

  def read(): DataFrame =
    ZSets.consolidate(runsRaw).filter(col(W) =!= 0)

  private def semi(df: DataFrame, probeKeys: DataFrame): DataFrame = {
    val probe = IncrementalOps.maybeBroadcast(
      probeKeys.select(keys.map(k => col(k).as(s"_p_$k")): _*))
    val cond = keys.map(k => col(k) <=> col(s"_p_$k")).reduce(_ && _)
    df.join(probe, cond, "left_semi")
  }

  def probe(probeKeys: DataFrame): DataFrame =
    ZSets.consolidate(semi(runsRaw, probeKeys)).filter(col(W) =!= 0)

  def probeRaw(probeKeys: DataFrame): DataFrame = semi(runsRaw, probeKeys)

  def compact(): Unit = flush()

  def delete(): Unit = {
    mem.delete()
    diskOpt.foreach(_.delete())
    diskOpt = None
  }

  /** Rows currently in the memtable (0 right after a flush). */
  def memHeldRows: Long = mem.heldRows

  /** Whether the disk tier has been engaged. */
  def spilled: Boolean = diskOpt.nonEmpty
}
