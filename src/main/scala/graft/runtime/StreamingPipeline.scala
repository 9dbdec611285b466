package graft.runtime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.incremental.{BucketedTrace, IncrementalOps, MemoryTrace, TieredTrace, Trace}
import graft.zset.ZSets

/** Streaming program runner: ONE input stream fanned out to MULTIPLE view
  * sinks inside a single foreachBatch — the consistency-preserving pattern
  * for multi-view pipelines (SURVEY §4.2 CSE / §7.4: "Spark runs one
  * streaming query per sink — use single foreachBatch fan-out to keep
  * consistency"). Every view in a micro-batch sees the SAME input batch
  * (the reference's atomic circuit step), and the batch is persisted once
  * so shared subplans are evaluated once.
  */
object StreamingPipeline {

  /** DEFAULT standing-join state backend — CO-PARTITIONED memory runs:
    * every run is hash-partitioned by the join keys with the layout
    * declared per run (MEMORY_AND_DISK, so pressure spills partitions to
    * executor-local disk rather than recomputing dead streaming lineage),
    * and the bilinear terms join run-vs-run with NO exchange
    * ([[BucketedTrace.coPartJoinStep]]): each row moves exactly once —
    * its own append repartition — the trace is never reshuffled and the
    * driver never collects a batch for a broadcast. This is the
    * reference's sharded-trace layout (join workers own key ranges), and
    * it also measures fastest locally (q8: 1.69M vs 1.32M ev/s for the
    * broadcast form — a multi-million-row broadcast pays a driver-side
    * collect + single-threaded hash build even in-process). Runs compact
    * at batch boundaries (coPartJoinStep.maxRuns).
    */
  def defaultJoinTrace(template: DataFrame, keys: Seq[String],
      nBuckets: Int): Trace =
    new MemoryTrace(template, keys, autoCompactRuns = Int.MaxValue,
      hashParts = Some(nBuckets))

  /** Alias kept for call sites that name the layout explicitly. */
  def coPartJoinTrace(template: DataFrame, keys: Seq[String],
      nBuckets: Int): Trace = defaultJoinTrace(template, keys, nBuckets)

  /** The broadcast-probing LSM-tiered backend: deltas append as memory
    * runs and degrade to bucketed parquet past the spill bound; the
    * bilinear terms broadcast the delta against runs scanned in place.
    * Right when deltas are small (broadcast ≈ free) and state is huge
    * and cold (parquet tier + pruned probes); the co-partitioned default
    * is right when deltas are large. Run sorting and flush consolidation
    * are off: the bilinear terms full-scan runs.
    */
  def tieredJoinTrace(template: DataFrame, keys: Seq[String],
      nBuckets: Int): Trace =
    new TieredTrace(template, keys, memRows = 32L << 20, nBuckets = nBuckets,
      sortRuns = false, consolidateOnFlush = false)

  /** Attach `views` (name → transformation of the micro-batch) to a
    * streaming DataFrame; `emit` receives each view's result per batch
    * atomically (e.g. write to sinks / merge into Delta).
    *
    * Returns the StreamingQuery (caller controls trigger/termination).
    */
  def foreachBatchFanout(
      input: DataFrame,
      views: Seq[(String, DataFrame => DataFrame)],
      emit: (String, DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    input.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.persist()
      try views.foreach { case (name, f) => emit(name, f(batch), batchId) }
      finally batch.unpersist()
      ()
    }

  /** Standing stream-stream equi-join via the IVM path — the reference's
    * join architecture (delta probes the integrated trace,
    * crates/dbsp/src/operator/dynamic/join.rs:1358), NOT Spark's symmetric
    * stream-stream join, which buffers BOTH streams in durable state per
    * row (measured ~100k events/s; StreamBench scaladoc records why it is
    * excluded). Nexmark q8's shape runs through this instead.
    *
    * Inputs are Z-set change streams: payload columns + `_w` (use weight 1
    * rows for an insert-only stream; negative weights retract). The two
    * sides are tagged and UNIONED so one foreachBatch applies both sides'
    * deltas atomically per micro-batch — the reference's single circuit
    * step; two independent queries could interleave sides arbitrarily.
    * Payload column names must be disjoint (join output flattens both).
    *
    * `onDelta(outputDelta, batchId)` receives the join's Z-set output
    * delta per batch (weight = wL·wR). The integrated traces default to
    * the CO-PARTITIONED layout ([[defaultJoinTrace]]): every run is
    * hash-partitioned by the join keys, a micro-batch APPENDS its deltas
    * as runs (O(|Δ|) write — the delta's own repartition is the only
    * per-batch movement) and the bilinear terms join run-vs-run with no
    * exchange — a step never rewrites, re-encodes, reshuffles, or
    * driver-collects the trace, which is what keeps throughput flat as
    * the traces grow ([[graft.incremental.CoPartTieredTrace]] adds the
    * bucketed-table spill tier at the same plan shape). Small-delta /
    * huge-cold-state deployments swap in [[tieredJoinTrace]] (broadcast
    * delta probing LSM-tiered runs scanned in place). Restart recovery
    * comes from DurableRunner's journal replay.
    *
    * Returns the writer (caller sets trigger/checkpoint and starts).
    */
  def standingJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      nBuckets: Int = 16,
      /** Consolidate each batch's output delta into canonical Z-set form.
        * The reference's join operator emits UNCONSOLIDATED batches
        * (canonicalization happens in trace maintenance, not at operator
        * output — crates/dbsp/src/operator/dynamic/join.rs), and the two
        * bilinear terms cover disjoint pair spaces, so with duplicate-free
        * input deltas the output is already duplicate-free: disabling
        * skips an output-sized shuffle per micro-batch. Keep enabled when
        * input deltas may carry duplicate or cancelling rows and the
        * consumer needs canonical weights.
        */
      consolidateOutput: Boolean = true,
      /** State backend for the two integrated traces. Default: the
        * LSM-tiered backend with consolidation off at spill (standing
        * joins full-scan runs, so run sorting/merging buys nothing) —
        * fresh batches stay in cluster memory, large traces degrade to
        * bucketed parquet runs. See [[defaultJoinTrace]].
        */
      mkTrace: (DataFrame, Seq[String], Int) => Trace = defaultJoinTrace)(
      onDelta: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    val w = ZSets.W
    def payload(df: DataFrame): Seq[String] =
      df.columns.toSeq.filterNot(c => keys.contains(c) || c == w)
    val (lp, rp) = (payload(left), payload(right))
    require(lp.intersect(rp).isEmpty,
      s"payload columns must be disjoint: ${lp.intersect(rp).mkString(",")}")
    def structOf(df: DataFrame, cols: Seq[String]): StructType =
      StructType(cols.map(c => df.schema(c)))
    val (lt, rt) = (structOf(left, lp), structOf(right, rp))
    val tagged = left.select(
      keys.map(col) ++ Seq(lit("L").as("_side"),
        struct(lp.map(col): _*).as("_lp"),
        lit(null).cast(rt).as("_rp"), col(w)): _*)
      .unionByName(right.select(
        keys.map(col) ++ Seq(lit("R").as("_side"),
          lit(null).cast(lt).as("_lp"),
          struct(rp.map(col): _*).as("_rp"), col(w)): _*))
    var aTrace: Trace = null
    var bTrace: Trace = null
    tagged.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch.persist()
      try {
        val dA = batch.filter(col("_side") === "L")
          .select(keys.map(col) ++ lp.map(c => col(s"_lp.$c").as(c))
            :+ col(w): _*)
        val dB = batch.filter(col("_side") === "R")
          .select(keys.map(col) ++ rp.map(c => col(s"_rp.$c").as(c))
            :+ col(w): _*)
        if (aTrace == null) {
          aTrace = mkTrace(dA, keys, nBuckets)
          bTrace = mkTrace(dB, keys, nBuckets)
        }
        // the delta crosses to the consumer through a CONSTRAINT
        // BARRIER: Dataset.localCheckpoint (which delta consumers
        // legitimately call) captures the origin plan's constraints, and
        // under AQE that capture can keep references to attributes no
        // longer in the output — a later union of such checkpoints
        // crashes Catalyst's constraint rewrite (key-not-found in
        // AttributeMap). Shims.internalBarrier rebases the plan on its
        // internal-row RDD with no origin constraints — no per-row
        // external conversion, still lazy.
        val d0 = (aTrace, bTrace) match {
          // co-partitioned traces (memory or tiered-to-bucketed-table):
          // run-vs-run exchange-free terms
          case (a: graft.incremental.CoPartitionedTrace,
              b: graft.incremental.CoPartitionedTrace)
              if a.hashParts.isDefined =>
            BucketedTrace.coPartJoinStep(a, b, dA, dB, keys)
          case _ =>
            BucketedTrace.joinStep(aTrace, bTrace, dA, dB, keys)
        }
        val d = if (consolidateOutput) ZSets.consolidate(d0) else d0
        onDelta(org.apache.spark.sql.graft.Shims.internalBarrier(d), batchId)
      } finally { batch.unpersist(); () }
    }
  }

  /** [[standingJoin]] for the common case of ONE physical stream feeding
    * both join sides (self-join shapes like Nexmark q8): the micro-batch
    * is split by `splitSides` INSIDE foreachBatch, skipping the
    * tag/struct-pack/union/unpack round trip the two-stream form needs to
    * keep its sides atomic — here a single batch is atomic by definition.
    * `splitSides` must return Z-set sides (payloads + `_w`) with disjoint
    * payload names.
    */
  def standingJoinSingle(source: DataFrame,
      splitSides: DataFrame => (DataFrame, DataFrame), keys: Seq[String],
      nBuckets: Int = 16,
      /** See [[standingJoin]]'s consolidateOutput. */
      consolidateOutput: Boolean = true,
      /** Row-cache the micro-batch before splitting. Each side is
        * evaluated exactly ONCE (the trace append's internal-row
        * snapshot), so the cache only saves the second source scan — for
        * columnar file sources (pruned parquet scan) re-scanning is
        * cheaper than writing 10M-row Java objects through the block
        * manager, so file-backed streams should pass false. Keep true
        * for sources whose batch re-evaluation is expensive or
        * non-deterministic.
        */
      cacheBatch: Boolean = true,
      /** See [[standingJoin]]'s mkTrace. */
      mkTrace: (DataFrame, Seq[String], Int) => Trace = defaultJoinTrace)(
      onDelta: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    var aTrace: Trace = null
    var bTrace: Trace = null
    source.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (cacheBatch) batch.persist()
      try {
        val (dA, dB) = splitSides(batch)
        if (aTrace == null) {
          aTrace = mkTrace(dA, keys, nBuckets)
          bTrace = mkTrace(dB, keys, nBuckets)
        }
        // the delta crosses to the consumer through a CONSTRAINT
        // BARRIER: Dataset.localCheckpoint (which delta consumers
        // legitimately call) captures the origin plan's constraints, and
        // under AQE that capture can keep references to attributes no
        // longer in the output — a later union of such checkpoints
        // crashes Catalyst's constraint rewrite (key-not-found in
        // AttributeMap). Shims.internalBarrier rebases the plan on its
        // internal-row RDD with no origin constraints — no per-row
        // external conversion, still lazy.
        val d0 = (aTrace, bTrace) match {
          // co-partitioned traces (memory or tiered-to-bucketed-table):
          // run-vs-run exchange-free terms
          case (a: graft.incremental.CoPartitionedTrace,
              b: graft.incremental.CoPartitionedTrace)
              if a.hashParts.isDefined =>
            BucketedTrace.coPartJoinStep(a, b, dA, dB, keys)
          case _ =>
            BucketedTrace.joinStep(aTrace, bTrace, dA, dB, keys)
        }
        val d = if (consolidateOutput) ZSets.consolidate(d0) else d0
        onDelta(org.apache.spark.sql.graft.Shims.internalBarrier(d), batchId)
      } finally { if (cacheBatch) batch.unpersist(); () }
    }
  }
}
