package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-side operators (SURVEY §2.7): the reference's LATENESS /
  * window / emit_final surface mapped onto Structured Streaming.
  *
  * - `LATENESS col INTERVAL x` (streaming.md:12-18, waterline.rs:41) ↔
  *   `withWatermark(col, x)` — waterline = max(ts) − lateness in both.
  * - TUMBLE/HOP/SESSION (table.md) ↔ `window()` / `session_window()`.
  * - `emit_final` (streaming.md:46-56) ↔ Append output mode: rows emitted
  *   only when the watermark closes their window — never retracted.
  * - Continuous (update-mode) views emit upserts per micro-batch, the
  *   analogue of the reference's output deltas.
  *
  * State management (the reference's retain_keys/values GC,
  * DBSPIntegrateTraceRetainKeysOperator) is watermark-driven eviction in
  * Spark — automatic for windowed aggs, and RocksDB-backed at scale
  * (`spark.sql.streaming.stateStore.providerClass`).
  */
object Streams {

  /** Declare bounded out-of-orderness on an event-time column. */
  def withLateness(df: DataFrame, tsCol: String, lateness: String): DataFrame =
    df.withWatermark(tsCol, lateness)

  /** Tumbling-window aggregation. Emits (window_start, window_end, keys...,
    * aggs...). Append mode + watermark ⇒ emit_final semantics.
    */
  def tumbleAgg(df: DataFrame, tsCol: String, size: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), size) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Hopping-window aggregation (size, slide). */
  def hopAgg(df: DataFrame, tsCol: String, size: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), size, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Gap-based session-window aggregation. */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")

  /** Weighted (retraction-aware) streaming aggregation: the `value × weight`
    * trick (SURVEY §2.4) — deltas with a `_w` column stream through a
    * running SUM; deletes arrive as negative weights. Run in Update output
    * mode; groups reaching weight 0 are emitted with `_cnt = 0` so sinks
    * can delete.
    */
  def weightedLinearAgg(delta: DataFrame, keys: Seq[Column],
      sums: Seq[(String, Column)]): DataFrame =
    delta.groupBy(keys: _*)
      .agg(sum(col(graft.zset.ZSets.W)).as("_cnt"),
        sums.map { case (n, e) =>
          sum(e * col(graft.zset.ZSets.W)).as(n)
        }: _*)
}
