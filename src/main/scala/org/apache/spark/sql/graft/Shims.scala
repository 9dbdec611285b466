package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` Column↔Expression conversion — the
  * standard pattern for libraries that ship custom Catalyst expressions
  * (Spark 4 removed the public `Column(expr)` constructor).
  */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Spark's own ANSI CAST_OVERFLOW error (private[sql] factory) — thrown
    * by kernels replicating `cast(double as long)` bit-for-bit.
    */
  def castDoubleToLongOverflow(v: Double): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors
      .castingCauseOverflowError(v,
        org.apache.spark.sql.types.DoubleType,
        org.apache.spark.sql.types.LongType)

  /** Block until all queued listener events are delivered (private[spark]
    * listener bus) — used by Bench so per-query task-time attribution
    * doesn't bleed into the next query's window.
    */
  def drainListeners(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(30000)

  /** DataFrame from a logical plan (private[sql] Dataset.ofRows) — used by
    * the IVM planner to evaluate a sub-plan (e.g. an Aggregate's child)
    * under rebound temp-view bindings.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Snapshot a DataFrame's rows in INTERNAL form (attributes + copied
    * InternalRows) — session-portable without the external-row round
    * trip, which cannot carry every SQL type (Spark 4's TIME has no
    * external converter yet). Pair with [[fromInternalRows]].
    */
  def internalRows(df: org.apache.spark.sql.DataFrame)
      : (Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
         Array[org.apache.spark.sql.catalyst.InternalRow]) = {
    val classic =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    (classic.queryExecution.analyzed.output,
      classic.queryExecution.executedPlan.executeCollect())
  }

  /** Rebuild a [[internalRows]] snapshot as a LocalRelation DataFrame in
    * (any) session `spark` — a fully materialized leaf, no re-execution.
    */
  def fromInternalRows(spark: org.apache.spark.sql.SparkSession,
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      rows: Array[org.apache.spark.sql.catalyst.InternalRow])
      : org.apache.spark.sql.DataFrame =
    ofRows(spark,
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
        attrs, rows.toIndexedSeq))

  /** Plan barrier WITHOUT the external-row round trip:
    * `createDataFrame(df.rdd, schema)` severs origin-plan lineage (and its
    * constraints — see the streaming-delta constraint-bug workaround) but
    * converts every row InternalRow → Row → InternalRow. This wraps the
    * INTERNAL row RDD in a LogicalRDD constructed with no origin stats or
    * constraints: same barrier, zero per-row conversion. Lazy — the
    * underlying plan runs when (and each time) the result is consumed,
    * exactly like the external-row form.
    */
  def internalBarrier(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession
    val plan = org.apache.spark.sql.execution.LogicalRDD(
      classic.queryExecution.analyzed.output,
      classic.queryExecution.toRdd)(spark)
    org.apache.spark.sql.classic.Dataset.ofRows(spark, plan)
  }

  /** If the frame is a lazily-checkpointed barrier (`localCheckpoint
    * (eager = false)`) that has NOT yet materialized, run it once now
    * (internal-row count, no external-row decode) so later concurrent
    * consumers read the cached blocks instead of racing to compute the
    * plan on first touch. No-op (no job) on non-checkpoint frames and on
    * checkpoints a previous consumer already materialized. Returns
    * whether a job ran.
    */
  def warmCheckpoint(df: org.apache.spark.sql.DataFrame): Boolean =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD
          if l.rdd.getStorageLevel !=
            org.apache.spark.storage.StorageLevel.NONE &&
            !l.rdd.isCheckpointed =>
        l.rdd.count()
        true
      case _ => false
    }

  /** LAZY, CACHED barrier: `localCheckpoint(eager = false)` for the
    * caching (the plan runs once; later consumers read the persisted
    * rows) wrapped in [[internalBarrier]] to DROP the origin constraints
    * the checkpoint carries over (`LogicalRDD.fromDataset` rewrites the
    * origin plan's constraints onto the checkpoint's output, and a
    * constraint referencing an attribute outside that output — reachable
    * through reused expression ids — crashes any downstream Union's
    * cached-constraint rewrite with `key not found: <attr>`).
    */
  def cachedBarrier(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    internalBarrier(df.localCheckpoint(false))

  /** EAGER, CACHED internal-row snapshot — [[internalBarrier]] plus
    * persistence: runs the plan once, persists the internal rows at the
    * given storage level, and returns (frame over the cached RDD, row
    * count). Rows are copied before caching because the scan reuses one
    * UnsafeRow buffer per partition — caching the references without the
    * copy would alias every row to the last one read. Output attributes
    * are re-instanced so two snapshots of related plans never put
    * duplicate expression ids on both sides of a downstream union. This
    * is the memtable write path: no external-row conversion, no parquet
    * encode.
    */
  def internalSnapshot(df: org.apache.spark.sql.DataFrame,
      level: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK):
      (org.apache.spark.sql.DataFrame, Long, org.apache.spark.rdd.RDD[_]) = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession
    val rdd = classic.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    val n = rdd.count()
    val out = classic.queryExecution.analyzed.output.map(_.newInstance())
    val plan = org.apache.spark.sql.execution.LogicalRDD(out, rdd)(spark)
    (org.apache.spark.sql.classic.Dataset.ofRows(spark, plan), n, rdd)
  }

  /** [[internalSnapshot]] that first hash-partitions the rows by `keys`
    * into `nParts` partitions and DECLARES that layout on the returned
    * frame (LogicalRDD outputPartitioning = HashPartitioning) — so a
    * later equi-join on those keys against an identically-partitioned
    * frame plans with NO exchange on either side. This is the
    * co-partitioned run layout for standing-join traces: each micro-batch
    * delta pays one O(|delta|) shuffle into the bucket layout at append,
    * and every subsequent run-vs-run join is exchange-free — the delta is
    * never collected for a broadcast and the trace is never reshuffled.
    */
  def internalSnapshotPartitioned(df: org.apache.spark.sql.DataFrame,
      keys: Seq[String], nParts: Int,
      level: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK):
      (org.apache.spark.sql.DataFrame, Long, org.apache.spark.rdd.RDD[_]) = {
    import org.apache.spark.sql.functions.col
    val shuffled = df.repartition(nParts, keys.map(col): _*)
    val classic = shuffled.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession
    // .map preserves partition structure (same partitions, same rows), so
    // the declared HashPartitioning below still describes the layout
    val rdd = classic.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    val n = rdd.count()
    val origin = classic.queryExecution.analyzed.output
    val out = origin.map(_.newInstance())
    val keyAttrs = keys.map { k =>
      val i = origin.indexWhere(a =>
        spark.sessionState.analyzer.resolver(a.name, k))
      require(i >= 0, s"partition key $k not in snapshot output")
      out(i)
    }
    val part = org.apache.spark.sql.catalyst.plans.physical
      .HashPartitioning(keyAttrs, nParts)
    val plan = org.apache.spark.sql.execution.LogicalRDD(out, rdd, part)(spark)
    (org.apache.spark.sql.classic.Dataset.ofRows(spark, plan), n, rdd)
  }
}
