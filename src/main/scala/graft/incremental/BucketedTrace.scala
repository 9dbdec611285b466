package graft.incremental

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.zset.ZSets
import graft.zset.ZSets.W

/** Persistent key-bucketed Z-set trace — the cluster-grade state backend
  * for the incremental operators (the piece the reference implements as its
  * LSM spine, crates/dbsp/src/trace/spine_async.rs).
  *
  * Layout: a parquet directory partitioned by `_b = hash(keys) mod
  * nBuckets`, holding one or more RUNS per bucket (one run file-set per
  * appended delta). The three operations mirror the spine contract:
  *
  *   - [[append]]: write the delta as a new run — I/O is O(|delta|),
  *     NEVER O(|state|). This is the per-step cost, replacing the
  *     full-trace rewrite a localCheckpoint-per-step loop pays.
  *   - [[probe]]: read the consolidated trace rows matching a probe key
  *     set. The scan is PARTITION-PRUNED to the probe's buckets (the
  *     driver knows the bucket ids from the probe — at most nBuckets
  *     values), then narrowed by a broadcast semi-join on the keys;
  *     consolidation happens on the matching rows only.
  *   - [[compact]]: fold all runs of every bucket into one (amortized
  *     O(|state| / steps-between-compactions) per step, exactly the LSM
  *     merge amortization). Auto-triggered every `autoCompactRuns`
  *     appends; callers with a natural quiet point can call it directly.
  *
  * Atomicity: compaction writes to a sibling temp dir and swaps via
  * directory rename — safe on a local/HDFS filesystem. An object-store
  * deployment would swap a manifest instead (the rename is the only
  * filesystem-specific line).
  *
  * Determinism: consolidated content is a Z-set (unordered, weighted), so
  * run boundaries and compaction timing never change what [[read]] /
  * [[probe]] return.
  */
final class BucketedTrace(
    template: DataFrame,
    val keys: Seq[String],
    val nBuckets: Int = 32,
    val autoCompactRuns: Int = 8,
    root: Option[Path] = None,
    /** Write runs key-sorted within each bucket so [[probe]]'s pushed
      * range filter can skip parquet row groups. Disable for traces whose
      * consumers only full-scan runs (e.g. standing-join bilinear terms)
      * — there the sort buys nothing and costs a per-append local sort.
      */
    val sortRuns: Boolean = true) extends Trace {

  import BucketedTrace.B

  private val spark: SparkSession = template.sparkSession
  val path: Path = root.getOrElse(
    Files.createTempDirectory("graft-trace-"))
  private var runs = 0
  private var appends = 0

  /** Empty frame with the trace schema and FRESH attribute ids — the
    * template's own ids usually belong to the caller's delta lineage, and
    * reusing them puts duplicate ids on both sides of downstream unions
    * (which trips Catalyst's union constraint rewrite).
    */
  private def empty: DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), template.schema)

  private def bucketOf: Column =
    pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong))

  /** Append one delta as a new run. Consolidate the delta FIRST if it may
    * carry duplicate rows — runs are merged lazily, so an unconsolidated
    * append is correct either way, just larger on disk.
    */
  def append(delta: DataFrame): Unit = {
    // runs are written KEY-SORTED within each bucket (a local sort of the
    // delta, no shuffle): parquet row-group min/max stats then line up
    // with the keys, so [[probe]]'s pushed key-range filter skips row
    // groups a point probe cannot match. Z-set content is unordered, so
    // the sort never changes what read()/probe() return.
    val bucketed = delta.withColumn(B, bucketOf)
    (if (sortRuns) bucketed.sortWithinPartitions(col(B) +: keys.map(col): _*)
     else bucketed)
      .write.mode("append").partitionBy(B)
      .parquet(path.toString)
    runs += 1
    appends += 1
    if (runs >= autoCompactRuns) compact()
  }

  // explicit read schema (data cols + bucket partition col): skips the
  // parquet schema-inference job every probe/read would otherwise pay
  private val readSchema = org.apache.spark.sql.types.StructType(
    template.schema.fields :+ org.apache.spark.sql.types.StructField(
      B, org.apache.spark.sql.types.LongType))

  /** All raw run rows (weights NOT yet consolidated), with the bucket
    * column still attached for pruning.
    */
  private def raw: DataFrame =
    if (runs == 0 && !Files.exists(path.resolve("_SUCCESS"))) {
      empty.withColumn(B, lit(0L))
    } else spark.read.schema(readSchema).parquet(path.toString)

  /** Full consolidated state (one shuffle over the whole trace — the
    * batch-read path, not the per-step path).
    */
  def read(): DataFrame =
    ZSets.consolidate(raw.drop(B)).filter(col(W) =!= 0)

  /** Consolidated trace rows whose key appears in `probeKeys`: the
    * per-step read path. Scans ONLY the probe's buckets — STATIC partition
    * pruning via the collected bucket-id set (bounded by nBuckets; one
    * tiny driver job) — and consolidates only the key-matching rows.
    */
  /** Key columns whose min/max can drive a pushed range filter (atomic
    * orderable types with meaningful parquet stats).
    */
  private val rangeKeys: Seq[String] = {
    import org.apache.spark.sql.types._
    template.schema.fields.filter(f => keys.contains(f.name)).collect {
      case f if f.dataType.isInstanceOf[NumericType] ||
        f.dataType == StringType || f.dataType == DateType ||
        f.dataType == TimestampType => f.name
    }.toSeq
  }

  def probe(probeKeys: DataFrame): DataFrame = {
    // ONE driver job collects the probe's bucket ids AND its per-key
    // min/max: the ids drive static partition pruning; the ranges become
    // pushed scan filters that, with key-sorted runs ([[append]]), prune
    // parquet row groups inside the surviving buckets.
    val aggs = collect_set(bucketOf).as("_bs") +:
      rangeKeys.flatMap(k => Seq(min(col(k)).as(s"_lo_$k"),
        max(col(k)).as(s"_hi_$k")))
    val st = probeKeys.agg(aggs.head, aggs.tail: _*).collect()(0)
    val ids = st.getSeq[Any](0).map(_.toString.toLong)
    if (ids.isEmpty || runs == 0) return ZSets.consolidate(empty)
    val ranged = rangeKeys.zipWithIndex.foldLeft(
      raw.filter(col(B).isin(ids: _*)).drop(B)) { case (df, (k, i)) =>
        val (lo, hi) = (st.get(1 + 2 * i), st.get(2 + 2 * i))
        if (lo == null) df // all-null probe keys match only null rows
        else df.filter(col(k).isNull ||
          (col(k) >= lit(lo) && col(k) <= lit(hi)))
      }
    val probe = IncrementalOps.maybeBroadcast(
      probeKeys.select(keys.map(k => col(k).as(s"_p_$k")): _*))
    val cond = keys.map(k => col(k) <=> col(s"_p_$k")).reduce(_ && _)
    ZSets.consolidate(ranged.join(probe, cond, "left_semi"))
      .filter(col(W) =!= 0)
  }

  /** Key-matching run rows WITHOUT consolidation — same partition-pruned
    * broadcast-semi scan as [[probe]], minus its merge shuffle. Right for
    * BILINEAR consumers (join terms): weight multiplication distributes
    * over the run decomposition, so consolidating the OUTPUT once replaces
    * consolidating every probe — one shuffle instead of three per step.
    *
    * The probe side carries its own bucket id and the semi-join condition
    * equates it with the scan's partition column, so the optimizer CAN
    * prune run files at runtime (dynamic partition pruning) without the
    * per-probe driver collect that [[probe]]'s static pruning pays — in a
    * tight step loop that collect is a scheduling-floor job per probe.
    * DPP firing is a planner cost decision; when it declines, the
    * semi-join still bounds the rows that leave the scan.
    */
  def probeRaw(probeKeys: DataFrame): DataFrame = {
    if (runs == 0) return empty
    // no distinct on the broadcast side: duplicates are harmless to the
    // semi-join and the dedup would cost a shuffle per probe
    val probe = IncrementalOps.maybeBroadcast(
      probeKeys.select(bucketOf.as("_p_b") +:
        keys.map(k => col(k).as(s"_p_$k")): _*))
    val cond = (col(B) === col("_p_b")) &&
      keys.map(k => col(k) <=> col(s"_p_$k")).reduce(_ && _)
    raw.join(probe, cond, "left_semi").drop(B)
  }

  /** Fold every bucket's runs into one; swap atomically. */
  def compact(): Unit = {
    if (runs <= 1) return
    val tmp = path.resolveSibling(path.getFileName.toString + ".compact")
    BucketedTrace.deleteRecursively(tmp)
    val folded = read().withColumn(B, bucketOf)
    (if (sortRuns) folded.sortWithinPartitions(col(B) +: keys.map(col): _*)
     else folded)
      .write.mode("overwrite").partitionBy(B)
      .parquet(tmp.toString)
    val old = path.resolveSibling(path.getFileName.toString + ".old")
    BucketedTrace.deleteRecursively(old)
    Files.move(path, old)
    Files.move(tmp, path)
    BucketedTrace.deleteRecursively(old)
    runs = 1
  }

  /** All current run rows, unconsolidated, bucket column dropped — the
    * zero-overhead read for BILINEAR consumers that already join against a
    * (broadcast) delta: the join's own hash probe filters the scan rows,
    * so a semi pre-filter on the same keys would duplicate that work (and
    * its broadcast build) for nothing.
    */
  def runsRaw: DataFrame = raw.drop(B)

  /** Total bytes currently on disk (spec/telemetry hook). */
  def bytesOnDisk: Long = BucketedTrace.sizeOf(path)

  /** Runs appended since construction (spec/telemetry hook). */
  def appendCount: Int = appends

  /** Drop the backing directory. */
  def delete(): Unit = BucketedTrace.deleteRecursively(path)
}

/** The EXCHANGE-FREE sibling of [[BucketedTrace]]: run appends go to a
  * Spark BUCKETED table (bucketBy on the join keys), so a scan reports
  * HashPartitioning and a shuffle-hash join against a delta moves ONLY the
  * delta — no broadcast collect of a large delta on the driver, and never
  * a shuffle of the trace. This is the co-located-join state layout for
  * standing stream-stream joins (the q8 shape), where deltas are large
  * and uniform so [[BucketedTrace]]'s pruned point probes don't pay off.
  *
  * The two layouts are complementary spine representations:
  * directory-partitioned runs for pruned, selective probes (inc_* loops);
  * bucketed-table runs for co-located full-delta joins (streaming).
  */
final class BucketedTableTrace(
    template: DataFrame,
    val keys: Seq[String],
    val nBuckets: Int = 16) extends Trace {

  private val spark: SparkSession = template.sparkSession
  /** Unique per JVM AND across runs: a crashed run leaves its managed
    * location behind in the warehouse even though the in-memory catalog
    * forgot the table, so a plain counter would collide with the corpse.
    */
  val table: String = "graft_trace_" +
    java.lang.Long.toHexString(System.nanoTime()) +
    s"_${BucketedTableTrace.nextId()}"
  private var runs = 0

  private def empty: DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), template.schema)

  /** Append one delta as a new run: bytes written O(|delta|); each
    * bucket's files accumulate and scan back as ONE partition.
    */
  def append(delta: DataFrame): Unit = {
    delta.write.mode("append")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)
    runs += 1
  }

  /** All run rows (unconsolidated), partitioned by the bucketing. */
  def runsRaw: DataFrame =
    if (runs == 0) empty else spark.table(table)

  /** Full consolidated state. */
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

  /** Rewrite the table as one consolidated run (amortized maintenance;
    * readers created before the call see the table continuously — the
    * swap is an INSERT OVERWRITE, atomic at the catalog level).
    */
  def compact(): Unit = {
    if (runs <= 1) return
    val folded = Trace.materialize(read())
    folded.write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)
    runs = 1
  }

  def delete(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table"); ()
  }
}

object BucketedTableTrace {
  private val counter = new java.util.concurrent.atomic.AtomicLong
  private def nextId(): Long = counter.incrementAndGet()

  /** Bilinear join step over two bucketed-table traces — identical delta
    * rule and phase structure to [[BucketedTrace.joinStep]], but each
    * term is a SHUFFLE-HASH join that builds on the (hinted) delta and
    * streams the bucketed runs in place: per-step movement is the delta's
    * exchange into the bucket partitioning, O(|Δ|); the trace is neither
    * shuffled nor collected for a broadcast.
    */
  def joinStep(
      aTrace: BucketedTableTrace, bTrace: BucketedTableTrace,
      dA: DataFrame, dB: DataFrame,
      joinKeys: Seq[String]): DataFrame = {
    val t1 = BucketedTrace.joined(dA.hint("shuffle_hash"), bTrace.runsRaw,
        joinKeys)
      .localCheckpoint(true)
    aTrace.append(dA)
    bTrace.append(dB)
    val term2 = BucketedTrace.joined(aTrace.runsRaw,
      dB.hint("shuffle_hash"), joinKeys)
    t1.unionByName(term2)
  }
}

object BucketedTrace {
  /** Bucket partition column (parquet directory key). */
  val B = "_b"

  private[incremental] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
    }

  private[incremental] def sizeOf(p: Path): Long =
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_))
        .mapToLong(Files.size(_)).sum()
      finally s.close()
    }

  /** Incremental inner equi-join over two persistent traces, in the FULL
    * bilinear expansion against the pre-step state:
    *   Δ(A⋈B) = ΔA⋈B  +  A⋈ΔB  +  ΔA⋈ΔB
    * — the same delta rule as [[IncrementalOps.joinStep]] (which uses the
    * equivalent (A+ΔA)⋈ΔB grouping), but the traces live on disk and each
    * step costs
    *   write O(|ΔA| + |ΔB|)                    (two run appends)
    *   read  O(touched buckets, key-filtered)  (two pruned probes)
    * instead of a full-trace rewrite. All three terms probe the PRE-append
    * trace, so the whole step delta evaluates at one point (a single
    * delta-sized localCheckpoint) before the runs are appended — no
    * ordering subtleties between probe evaluation and file appends.
    */
  def joinStep(
      aTrace: Trace, bTrace: Trace,
      dA: DataFrame, dB: DataFrame,
      joinKeys: Seq[String]): DataFrame = {
    // ΔA ⋈ B against the PRE-append trace. The delta side is broadcast
    // and the runs are scanned IN PLACE — the hash join itself filters
    // the scan to matching keys, so no semi pre-filter (probeRaw's use
    // case is consumers that need the matching rows as data). Both terms
    // stay LIVE plans: each run scan's file listing is pinned at creation
    // (InMemoryFileIndex), so t1 keeps reading the pre-append run set and
    // term2 this step's set even when the caller evaluates the delta
    // later. (A localCheckpoint barrier here would leak the origin plan's
    // constraints through the LogicalRDD and crash Catalyst's union
    // constraint rewrite in downstream delta unions.) CONTRACT: evaluate
    // or materialize the returned delta before the traces COMPACT —
    // compaction swaps run directories out from under a pinned listing
    // (autoCompactRuns appends away, or an explicit compact()).
    val t1 = joined(IncrementalOps.maybeBroadcast(dA), bTrace.runsRaw,
      joinKeys)
    aTrace.append(dA)
    bTrace.append(dB)
    val term2 = joined(aTrace.runsRaw, IncrementalOps.maybeBroadcast(dB),
      joinKeys)
    // NO output consolidation: the two terms cover disjoint pair spaces
    // (ΔA×B_pre vs (A+ΔA)×ΔB), so the union is already a valid Z-set;
    // canonicalizing it would cost an output-sized shuffle per step that
    // integrators pay once at read time instead
    t1.unionByName(term2)
  }

  /** Bilinear join step over two CO-PARTITIONED memory traces
    * ([[MemoryTrace]] with `hashParts` set): every run on both sides is
    * hash-partitioned by the join keys with the layout declared on the
    * frame, so each run-vs-run term plans with NO exchange — per batch
    * the only data movement is each delta's own O(|Δ|) repartition at
    * append. This is the layout for standing joins whose deltas outgrow
    * a broadcast: the broadcast form collects every batch to the driver;
    * the shuffle-hash-on-union form reshuffles the trace every batch;
    * this form moves each row exactly once, ever (the reference's
    * sharded trace layout — join workers own key ranges).
    *
    * Terms are per run PAIR (a union of co-partitioned runs loses the
    * declared partitioning): ΔA ⋈ r for r in B's pre-append runs, plus
    * r ⋈ ΔB for r in A's post-append runs — together the exact bilinear
    * delta. Run-count growth is bounded by compaction at the BATCH
    * boundary (never mid-step: frames captured by this step's terms must
    * not lose their caches before the caller evaluates the delta).
    */
  def coPartJoinStep(
      aTrace: CoPartitionedTrace, bTrace: CoPartitionedTrace,
      dA: DataFrame, dB: DataFrame,
      joinKeys: Seq[String],
      maxRuns: Int = 16): DataFrame = {
    require(aTrace.hashParts.isDefined &&
      aTrace.hashParts == bTrace.hashParts,
      "coPartJoinStep needs both traces hash-partitioned identically")
    Seq(aTrace, bTrace).foreach {
      case m: MemoryTrace => require(m.autoCompactRuns > maxRuns + 1,
        "trace auto-compaction would fire mid-step; compaction must " +
          "happen only at the batch boundary below")
      case _ => ()
    }
    aTrace.compactIfOver(maxRuns)
    bTrace.compactIfOver(maxRuns)
    val bPre = bTrace.runFrames
    aTrace.append(dA)
    bTrace.append(dB)
    val aRun = aTrace.runFrames.last
    val bRun = bTrace.runFrames.last
    val t1 = bPre.map(r => joined(aRun.hint("shuffle_hash"), r, joinKeys))
    val t2 = aTrace.runFrames.map(r =>
      joined(r, bRun.hint("shuffle_hash"), joinKeys))
    (t1 ++ t2).reduce(_ unionByName _)
  }

  /** General (fold) aggregation step over a persistent trace — the
    * bucketed form of [[IncrementalOps.generalAggStep]]: state is the
    * consolidated input Z-set, kept as appended runs; each step appends
    * the delta (O(|Δ|) write) and re-aggregates ONLY the groups the delta
    * touches, read back through the trace's pruned consolidated probe.
    * Returns (fresh aggregate rows for touched groups, touched groups
    * whose multiset emptied — the consumer must retract their previous
    * output rows).
    */
  def generalAggStep(
      trace: Trace, delta: DataFrame,
      groupKeys: Seq[String], aggs: Seq[Column]): (DataFrame, DataFrame) = {
    val touchedKeys = delta.select(groupKeys.map(col): _*).distinct()
      .localCheckpoint(true) // read twice (probe + deleted); delta-sized
    trace.append(delta)
    val newRows = ZSets.toMultiset(trace.probe(touchedKeys))
      .groupBy(groupKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val (_, deleted) = IncrementalOps.splitTouched(touchedKeys,
      newRows.select(groupKeys.map(col): _*), groupKeys)
    (newRows, deleted)
  }

  /** Materialize as a fresh cached Row-RDD frame: an origin-constraint
    * barrier (see StreamingPipeline — localCheckpoint frames leak
    * origin-plan constraints that crash Catalyst's union constraint
    * rewrite when step outputs are unioned) that also pins the result
    * against later run compaction.
    */
  private def snapshot(df: DataFrame): DataFrame = Trace.materialize(df)

  /** Incremental DISTINCT over a persistent trace — the bucketed form of
    * [[IncrementalOps.distinctStep]]: state = consolidated multiplicities
    * kept as appended runs. Each step probes the PRE-append trace for the
    * delta's rows (partition-pruned, O(|Δ| buckets) read), appends the
    * consolidated delta as a run (O(|Δ|) write — never a state rewrite),
    * and returns the sign transitions (appeared → +1, vanished → −1) as a
    * compaction-safe materialized frame.
    */
  def distinctStep(trace: Trace, delta: DataFrame): DataFrame = {
    val keys = ZSets.dataCols(delta)
    val dCon = ZSets.consolidate(delta).localCheckpoint(true)
    val oldW = trace.probe(dCon.select(keys.map(col): _*))
      .select(keys.map(k => col(k).as(s"_o_$k")) :+ col(W).as("_ow"): _*)
    val cond = keys.map(k => col(s"_o_$k") <=> col(k)).reduce(_ && _)
    val j = dCon.withColumnRenamed(W, "_dw")
      .join(IncrementalOps.maybeBroadcast(oldW), cond, "left_outer")
      .withColumn("_ow", coalesce(col("_ow"), lit(0L)))
      .withColumn("_nw", col("_ow") + col("_dw"))
    val out = snapshot(j.withColumn(W,
        when(col("_ow") <= 0 && col("_nw") > 0, 1L)
          .when(col("_ow") > 0 && col("_nw") <= 0, -1L)
          .otherwise(0L))
      .filter(col(W) =!= 0)
      .select(keys.map(col) :+ col(W): _*))
    trace.append(dCon)
    out
  }

  /** Incremental LINEAR aggregation (SUM/COUNT family) over a persistent
    * trace — the bucketed form of [[IncrementalOps.linearAggStep]]: state
    * = one row per live group (weight-1 Z-set). A step aggregates the
    * delta (O(|Δ|)), probes the pre-append trace for the touched groups'
    * old sums, merges, and appends retract-old ∪ insert-merged — groups
    * whose weight-count hits 0 vanish (AggregateZero), untouched groups
    * are never rewritten, and a numerically unchanged group cancels to
    * ZERO bytes in the run. Returns the fresh rows for touched groups;
    * the full view is `ZSets.toMultiset(trace.read())`.
    */
  /** Build a trace whose schema matches [[linearAggStep]]'s state rows —
    * derived from the same aggregate expressions so types (decimal
    * precision in particular) line up exactly.
    */
  def linearAggTrace(deltaTemplate: DataFrame, groupKeys: Seq[String],
      specs: Seq[IncrementalOps.LinearAggSpec],
      nBuckets: Int = 32): BucketedTrace =
    new BucketedTrace(
      linearAggTemplate(deltaTemplate, groupKeys, specs),
      groupKeys, nBuckets)

  /** Empty frame with [[linearAggStep]]'s state-row schema — shared by
    * every backend's trace constructor so types (decimal precision in
    * particular) line up exactly with the step's aggregate expressions.
    */
  def linearAggTemplate(deltaTemplate: DataFrame, groupKeys: Seq[String],
      specs: Seq[IncrementalOps.LinearAggSpec]): DataFrame =
    deltaTemplate.limit(0).groupBy(groupKeys.map(col): _*)
      .agg(sum(col(W)).as("_cnt"),
        specs.map(sp => sum(sp.valueExpr * col(W)).as(sp.name)): _*)
      .withColumn(W, lit(1L))

  /** [[chainAggStep]]'s state-schema twin of [[linearAggTrace]] (chain
    * deltas carry no weight column — append-only batches).
    */
  def chainAggTrace(deltaTemplate: DataFrame, groupKeys: Seq[String],
      specs: Seq[IncrementalOps.ChainSpec],
      nBuckets: Int = 32): BucketedTrace =
    new BucketedTrace(
      chainAggTemplate(deltaTemplate, groupKeys, specs),
      groupKeys, nBuckets)

  /** Empty frame with [[chainAggStep]]'s state-row schema. */
  def chainAggTemplate(deltaTemplate: DataFrame, groupKeys: Seq[String],
      specs: Seq[IncrementalOps.ChainSpec]): DataFrame =
    deltaTemplate.limit(0).groupBy(groupKeys.map(col): _*)
      .agg(IncrementalOps.pick(specs.head),
        specs.tail.map(IncrementalOps.pick): _*)
      .withColumn(W, lit(1L))

  def linearAggStep(
      trace: Trace, delta: DataFrame,
      groupKeys: Seq[String],
      specs: Seq[IncrementalOps.LinearAggSpec]): DataFrame = {
    val contrib = delta.groupBy(groupKeys.map(col): _*)
      .agg(sum(col(W)).as("_cnt"),
        specs.map(sp => sum(sp.valueExpr * col(W)).as(sp.name)): _*)
      .localCheckpoint(true)
    val old = ZSets.toMultiset(
      trace.probe(contrib.select(groupKeys.map(col): _*)))
    val merged = old.unionByName(contrib)
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col("_cnt")).as("_cnt"),
        specs.map(sp => sum(col(sp.name)).as(sp.name)): _*)
      .filter(col("_cnt") =!= 0)
    val out = snapshot(merged)
    trace.append(old.withColumn(W, lit(-1L))
      .unionByName(out.withColumn(W, lit(1L))))
    out
  }

  /** Append-only chain aggregate (MIN/MAX fast path) over a persistent
    * trace — the bucketed form of [[IncrementalOps.chainAggStep]]: same
    * state-as-Z-set encoding as [[linearAggStep]] with least/greatest
    * merge; a group whose extremum did not move cancels to zero bytes.
    */
  def chainAggStep(
      trace: Trace, delta: DataFrame,
      groupKeys: Seq[String],
      specs: Seq[IncrementalOps.ChainSpec]): DataFrame = {
    val contrib = delta.groupBy(groupKeys.map(col): _*)
      .agg(IncrementalOps.pick(specs.head),
        specs.tail.map(IncrementalOps.pick): _*)
      .localCheckpoint(true)
    val old = ZSets.toMultiset(
      trace.probe(contrib.select(groupKeys.map(col): _*)))
    val merged = old.unionByName(contrib)
      .groupBy(groupKeys.map(col): _*)
      .agg(IncrementalOps.pickMerge(specs.head),
        specs.tail.map(IncrementalOps.pickMerge): _*)
    val out = snapshot(merged)
    trace.append(old.withColumn(W, lit(-1L))
      .unionByName(out.withColumn(W, lit(1L))))
    out
  }

  /** PRIMARY-KEY upsert over a persistent trace — the bucketed form of
    * [[IncrementalOps.upsertStep]]: state = the live rows as a Z-set
    * (integrate(appended output deltas)), so a step appends exactly its
    * OUTPUT delta (retract replaced/deleted rows, insert new ones) and the
    * trace never rewrites untouched keys. Old rows come from the pruned
    * pre-append probe of the batch's keys. Returns the output delta
    * (compaction-safe materialized frame); the integrated view is
    * `ZSets.toMultiset(trace.read())`.
    */
  def upsertStep(
      trace: Trace, batchRaw: DataFrame, key: Seq[String],
      deletedCol: String = "_deleted",
      seqCol: Option[String] = None,
      assumeUnique: Boolean = false): DataFrame = {
    val batch = IncrementalOps
      .normalizeUpsertBatch(batchRaw, key, seqCol, assumeUnique)
      .localCheckpoint(true)
    val payload = batch.columns.toSeq.filterNot(c =>
      key.contains(c) || c == deletedCol)
    val old = ZSets.toMultiset(trace.probe(batch.select(key.map(col): _*)))
      .withColumn("_present", lit(true))
    val b = batch.select(
      key.map(col) ++ payload.map(c => col(c).as(s"_n_$c"))
        :+ col(deletedCol).as("_del"): _*)
    val joined = old.join(b, key, "full_outer")
    val oldLive = coalesce(col("_present"), lit(false))
    val isUpsert = col("_del") === false
    val retracts = joined.filter(oldLive)
      .select(key.map(col) ++ payload.map(col) :+ lit(-1L).as(W): _*)
    val inserts = joined.filter(isUpsert)
      .select(key.map(col) ++ payload.map(c => col(s"_n_$c").as(c))
        :+ lit(1L).as(W): _*)
    val out = snapshot(ZSets.consolidate(retracts.unionByName(inserts)))
    trace.append(out)
    out
  }

  /** Weight-multiplying inner equi-join of two Z-sets WITHOUT a USING
    * join: the right side's keys are renamed and joined by explicit
    * equality, then dropped. A USING join keeps the eliminated right keys
    * as hidden output, and constraints referencing them crash Catalyst's
    * union constraint rewrite when the result lands in a Union whose other
    * branch shares attribute ids (the streaming foreachBatch shape).
    */
  private[incremental] def joined(l: DataFrame, r: DataFrame,
      joinKeys: Seq[String]): DataFrame = {
    val lw = l.withColumnRenamed(W, "_wl")
    val rw0 = r.withColumnRenamed(W, "_wr")
    val rw = rw0.select(rw0.columns.map(c =>
      if (joinKeys.contains(c)) col(c).as(s"_rk_$c") else col(c)): _*)
    val cond = joinKeys.map(k => col(k) === col(s"_rk_$k")).reduce(_ && _)
    lw.join(rw, cond)
      .withColumn(W, col("_wl") * col("_wr"))
      .drop("_wl" +: "_wr" +: joinKeys.map(k => s"_rk_$k"): _*)
  }
}
