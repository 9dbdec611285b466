package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming partitioned rolling RANGE aggregate with waterline GC — the
  * Spark form of the reference's differentiating time-series operator
  * (DBSPPartitionedRollingAggregateOperator.java:30; runtime support
  * structure crates/dbsp/src/operator/dynamic/time_series/radix_tree.rs).
  *
  * Semantics: for `agg OVER (PARTITION BY key ORDER BY ts RANGE INTERVAL r
  * PRECEDING)`, every input row yields one output row carrying the
  * aggregate over that key's rows in `[ts − r, ts]`. A late row (within
  * the watermark) retroactively changes the windows of LATER rows that
  * already emitted — those rows are re-emitted with corrected values
  * (update mode), matching the reference's retract-and-replace output.
  *
  * State: MapState[ts → (sum, cnt)] per key — per-entry RocksDB I/O, the
  * flat analogue of the reference's per-key radix tree. Entries older than
  * `waterline − r` can no longer fall inside any admissible row's window
  * (rows older than the waterline are rejected upstream by the watermark),
  * so they are deleted each batch: state per key is bounded by
  * rate × (range + allowed lateness), the same retention bound the
  * reference derives from its waterline. Range sums here are a linear scan
  * of the key's live entries (bounded by that retention), where the radix
  * tree gives O(log n) — the scan is the honest Spark-side trade at this
  * state size.
  */
object RollingAgg {

  /** One input event; `ts` keeps TIMESTAMP type so the caller's
    * `withWatermark` column flows into the operator untouched.
    */
  final case class RollEvent[K](key: K, ts: Timestamp, value: Double)
  /** Rolling SUM/COUNT over [ts − range, ts] for the row at `ts`. */
  final case class RollOut[K](key: K, ts: Timestamp, sum: Double, cnt: Long)

  /** Per-timestamp partial aggregate (public so encoder codegen can
    * construct it; a private class forces interpreted fallback).
    */
  final case class TsAgg(sum: Double, cnt: Long)

  private final class RollingProcessor[K](rangeMs: Long)
      extends StatefulProcessor[K, RollEvent[K], RollOut[K]] {
    @transient private var buf: MapState[Long, TsAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getMapState[Long, TsAgg](
        "buf", Encoders.scalaLong, Encoders.product[TsAgg], TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[RollEvent[K]],
        tv: TimerValues): Iterator[RollOut[K]] = {
      val incoming = rows.map(e => e.ts.getTime -> e.value).toArray
      incoming.foreach { case (t, v) =>
        val cur = if (buf.containsKey(t)) buf.getValue(t) else TsAgg(0d, 0L)
        buf.updateValue(t, TsAgg(cur.sum + v, cur.cnt + 1))
      }
      // one scan of the key's live entries
      val entries = buf.iterator().map { case (t, a) => (t, a) }.toArray

      // rows whose window changed: each incoming ts, plus every existing
      // ts' in (ts, ts + range] (their windows now contain the new row)
      val affected = mutable.SortedSet[Long]()
      incoming.foreach { case (t, _) =>
        affected += t
        entries.foreach { case (t2, _) =>
          if (t2 > t && t2 <= t + rangeMs) affected += t2
        }
      }
      val out = affected.iterator.map { t =>
        var sum = 0d; var cnt = 0L
        entries.foreach { case (t2, a) =>
          if (t2 >= t - rangeMs && t2 <= t) { sum += a.sum; cnt += a.cnt }
        }
        RollOut(key, new Timestamp(t), sum, cnt)
      }.toArray

      // waterline GC: nothing admissible can reach back past wm − range
      val wm = tv.getCurrentWatermarkInMs
      if (wm > 0) entries.foreach { case (t, _) =>
        if (t < wm - rangeMs) buf.removeKey(t)
      }
      out.iterator
    }
  }

  /** Rolling SUM/COUNT per key over `[ts − range, ts]`; input must carry a
    * watermark on `ts` (that watermark is the waterline bounding both
    * lateness and state retention).
    */
  def rollingSumCount[K](events: Dataset[RollEvent[K]], rangeMs: Long)(
      implicit kEnc: Encoder[K],
      outEnc: Encoder[RollOut[K]]): Dataset[RollOut[K]] =
    events.groupByKey(_.key)
      .transformWithState(new RollingProcessor[K](rangeMs),
        TimeMode.EventTime(), OutputMode.Update())
}
