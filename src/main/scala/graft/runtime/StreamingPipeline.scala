package graft.runtime

import org.apache.spark.sql.DataFrame

/** Streaming program runner: ONE input stream fanned out to MULTIPLE view
  * sinks inside a single foreachBatch — the consistency-preserving pattern
  * for multi-view pipelines (SURVEY §4.2 CSE / §7.4: "Spark runs one
  * streaming query per sink — use single foreachBatch fan-out to keep
  * consistency"). Every view in a micro-batch sees the SAME input batch
  * (the reference's atomic circuit step), and the batch is persisted once
  * so shared subplans are evaluated once.
  */
object StreamingPipeline {

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
}
