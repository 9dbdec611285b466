package graft.runtime

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ddl.Ddl
import graft.sources.{Envelopes, FileSource}
import graft.zset.ZSets

/** Fault-tolerant program runner: journaled micro-batch steps over a
  * replayable file-stream source — the Spark shape of the reference's
  * checkpoint + journal fault-tolerance
  * (crates/dbsp/src/circuit/checkpointer.rs, journal replay in the
  * controller; docs fault-tolerance).
  *
  * Protocol — STATE is exactly-once, OUTPUTS are at-least-once:
  *  1. Spark's file source + `checkpointLocation` re-delivers each batch
  *     with a stable `batchId` after a crash (at-least-once).
  *  2. `step(batchId, …)` first APPENDS the batch's table deltas to a
  *     journal directory and marks `_COMMIT`; a batchId whose commit
  *     marker already exists is skipped wholesale (idempotent replay).
  *  3. A restarted runner rebuilds pipeline state by replaying committed
  *     journal batches in order through the same IVM step — deterministic,
  *     so the rebuilt state equals the pre-crash state exactly.
  *  4. Output delivery is acknowledged separately: `writer` marks a batch
  *     `_DELIVERED` only after `onOutput` returns. A crash between
  *     `_COMMIT` and that acknowledgement leaves the batch committed to
  *     state but undelivered; the restarted runner captures its view
  *     deltas during journal replay ([[pendingOutputs]]) and `writer`
  *     re-delivers them before processing live batches. Sinks therefore
  *     see every batch at least once (dedup on (view, batchId) for
  *     exactly-once sinks). Call [[compact]] only after outputs are
  *     delivered: compaction drops the journal entries that redelivery
  *     reads from.
  *
  * Scale note: replay cost grows with journal length; the production path
  * is periodic state-snapshot compaction (write table/view Z-sets, truncate
  * the journal) exactly as the reference's checkpointer does — the journal
  * here IS that design with snapshot interval = ∞.
  */
final class DurableRunner(spark: SparkSession, program: Ddl.Program,
    stateDir: String) {

  val pipeline = new Pipeline(spark, program)
  private val journal = Paths.get(stateDir, "journal")
  Files.createDirectories(journal)

  private val snapshots = Paths.get(stateDir, "snapshots")
  Files.createDirectories(snapshots)

  /** Latest committed snapshot id, if any (written by [[compact]]). */
  private def latestSnapshot: Option[Long] = {
    val ids = Files.list(snapshots).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("upto="))
      .filter(p => Files.exists(p.resolve("_COMMIT")))
      .map(_.getFileName.toString.stripPrefix("upto=").toLong)
      .toSeq
    if (ids.isEmpty) None else Some(ids.max)
  }

  private val initialSnapshot: Option[Long] = latestSnapshot

  /** Replay = latest snapshot (loaded as one synthetic delta from empty)
    * + committed journal batches after it, ascending. Alongside state
    * rebuild this captures the view deltas of committed-but-undelivered
    * batches into [[pendingOutputs]].
    */
  private var pending = Map.empty[Long, Map[String, DataFrame]]

  val restoredBatches: Seq[Long] = {
    val snap = initialSnapshot
    snap.foreach { upTo =>
      val dir = snapshots.resolve(s"upto=$upTo")
      val tables = Files.list(dir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("table="))
        .map { p =>
          p.getFileName.toString.stripPrefix("table=") ->
            spark.read.parquet(p.toString)
        }.toMap
      pipeline.step(tables)
      // the snapshot bypasses upsertStep (plain Z-set delta): rebuild the
      // per-key liveness state for PRIMARY KEY tables so post-restart
      // upsert batches still retract pre-snapshot rows
      program.tables.filter(_.primaryKey.nonEmpty)
        .foreach(t => pipeline.rebuildUpsertState(t.name))
    }
    val ids = Files.list(journal).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("batch="))
      .filter(p => Files.exists(p.resolve("_COMMIT")))
      .map(_.getFileName.toString.stripPrefix("batch=").toLong)
      .toSeq.sorted
      .filter(id => snap.forall(id > _))
    ids.foreach { id =>
      val out = pipeline.step(readBatch(id))
      if (!Files.exists(batchDir(id).resolve("_DELIVERED")))
        pending += id -> out
    }
    snap.toSeq ++ ids
  }

  /** View deltas of batches committed to state whose outputs were never
    * acknowledged (crash between `_COMMIT` and `markDelivered`), keyed by
    * batchId. Deltas are materialized (localCheckpoint) during replay.
    */
  def pendingOutputs: Map[Long, Map[String, DataFrame]] = pending

  /** Acknowledge that a batch's outputs reached the sink. */
  def markDelivered(batchId: Long): Unit = {
    val dir = batchDir(batchId)
    if (Files.exists(dir))
      Files.write(dir.resolve("_DELIVERED"), Array.empty[Byte])
    pending -= batchId
  }

  /** Re-deliver [[pendingOutputs]] in batch order and acknowledge them. */
  def deliverPending(onOutput: (String, DataFrame, Long) => Unit): Unit =
    pending.keys.toSeq.sorted.foreach { id =>
      pending(id).foreach { case (v, d) => onOutput(v, d, id) }
      markDelivered(id)
    }

  private var committed: Set[Long] = restoredBatches.toSet

  /** Completion token (connectors/completion-tokens.md): an opaque handle
    * for the current end of the committed input stream. State application
    * is synchronous inside [[step]], so the only asynchronous stage this
    * runner tracks is sink delivery: the token completes once every batch
    * at or below it has its outputs acknowledged ([[markDelivered]]) —
    * compacted-away batches count as delivered (compaction only drops
    * entries redelivery no longer needs). New batches can keep arriving
    * while a client waits; they never block an earlier token.
    */
  def completionToken(): Long =
    if (committed.isEmpty) -1L else committed.max

  /** Has everything at or before `token` been processed AND delivered? */
  def isComplete(token: Long): Boolean =
    committed.filter(_ <= token).forall { id =>
      val dir = batchDir(id)
      !Files.exists(dir) || Files.exists(dir.resolve("_DELIVERED"))
    }

  private def batchDir(id: Long) = journal.resolve(s"batch=$id")

  private def readBatch(id: Long): Map[String, DataFrame] =
    Files.list(batchDir(id)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("table="))
      .map { p =>
        val name = p.getFileName.toString.stripPrefix("table=")
        name -> spark.read.parquet(p.toString)
      }.toMap

  /** One journaled step. Returns per-view output deltas, or None if the
    * batch was already committed (crash-replay duplicate).
    */
  def step(batchId: Long,
      deltas: Map[String, DataFrame]): Option[Map[String, DataFrame]] = {
    // a batch at or below the restored snapshot is committed by definition
    // even though its journal entry has been truncated away
    if (committed(batchId) || initialSnapshot.exists(batchId <= _)) None
    else {
      deltas.foreach { case (t, d) =>
        d.write.mode("overwrite")
          .parquet(batchDir(batchId).resolve(s"table=$t").toString)
      }
      Files.createDirectories(batchDir(batchId))
      Files.write(batchDir(batchId).resolve("_COMMIT"), Array.empty[Byte])
      committed += batchId
      // re-read from the journal so replay and live paths are identical
      Some(pipeline.step(readBatch(batchId)))
    }
  }

  /** Snapshot compaction — the reference checkpointer's design
    * (crates/dbsp/src/circuit/checkpointer.rs): persist every table's
    * integrated Z-set as of the highest committed batch, then truncate the
    * journal up to it. Restart cost becomes O(state) + O(journal tail)
    * instead of O(full history).
    */
  def compact(): Unit = {
    val upTo = committed.foldLeft(-1L)(math.max)
    if (upTo >= 0) {
      val dir = snapshots.resolve(s"upto=$upTo")
      program.tables.foreach { t =>
        pipeline.snapshot(t.name).foreach(_.write.mode("overwrite")
          .parquet(dir.resolve(s"table=${t.name}").toString))
      }
      Files.createDirectories(dir)
      Files.write(dir.resolve("_COMMIT"), Array.empty[Byte])
      def rm(p: java.nio.file.Path): Unit = {
        if (Files.isDirectory(p))
          Files.list(p).iterator().asScala.foreach(rm)
        Files.delete(p)
      }
      Files.list(journal).iterator().asScala
        .filter(_.getFileName.toString.startsWith("batch="))
        .filter(_.getFileName.toString.stripPrefix("batch=").toLong <= upTo)
        .toSeq.foreach(rm)
    }
  }

  /** Wire the combined program file-stream through journaled steps.
    * `onOutput(view, delta, batchId)` fires once per live (non-replayed)
    * batch per view.
    */
  def writer(inputDir: String, format: String = "insert_delete")(
      onOutput: (String, DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] = {
    val schemas = program.tables.map(t => t.name -> FileSource.schemaOf(t)).toMap
    // at-least-once: committed-but-unacknowledged outputs from before the
    // restart go out first, in batch order
    deliverPending(onOutput)
    FileSource.programStream(spark, inputDir, program)
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          val deltas = program.tables.flatMap { t =>
            val rows = batch.filter(col("_table") === t.name).drop("_table")
            if (rows.isEmpty) None
            else Some(t.name ->
              Envelopes.decode(rows, schemas(t.name), format))
          }.toMap
          if (deltas.nonEmpty)
            step(batchId, deltas).foreach { out =>
              out.foreach { case (v, d) => onOutput(v, d, batchId) }
              markDelivered(batchId)
            }
        } finally { batch.unpersist(); () }
      }
  }
}
