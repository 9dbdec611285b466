package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** PRIMARY KEY (upsert) input streams → retraction changelogs.
  *
  * Reference: tables with PRIMARY KEY turn their input into an upsert
  * stream; the runtime converts upserts/deletes into Z-set deltas
  * (crates/dbsp/src/operator/dynamic/input_upsert.rs:254,
  * DBSPUpsertFeedbackOperator.java:22). Here: keyed
  * flatMapGroupsWithState holding the latest row per key, emitting
  * (−1 old, +1 new) on replacement and (−1 old) on delete — downstream
  * weighted operators (Streams.weightedLinearAgg, IncrementalOps) consume
  * these deltas unchanged.
  *
  * Scale: state is one row per live key in the state store (RocksDB at
  * 100 TB), partitioned by key hash — the same layout as the reference's
  * upsert trace.
  */
object Upsert {

  /** One input command: Some(value) = upsert, None = delete-by-key. */
  final case class Input[K, V](key: K, value: Option[V])

  /** One emitted change. */
  final case class Change[K, V](key: K, value: V, weight: Long)

  /** Convert a keyed upsert stream into a change stream. Works on both
    * batch and streaming Datasets (same code path — Spark's unified API).
    */
  def toChangelog[K, V](ds: Dataset[Input[K, V]])(
      implicit kEnc: Encoder[K], vEnc: Encoder[V],
      chEnc: Encoder[Change[K, V]],
      optVEnc: Encoder[Option[V]]): Dataset[Change[K, V]] = {
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Option[V], Change[K, V]](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[Input[K, V]], state: GroupState[Option[V]]) =>
          var current: Option[V] = state.getOption.flatten
          val out = rows.flatMap { in =>
            val changes =
              (current, in.value) match {
                case (Some(old), Some(nw)) if old == nw => Seq.empty
                case (Some(old), Some(nw)) =>
                  Seq(Change(key, old, -1L), Change(key, nw, 1L))
                case (None, Some(nw)) => Seq(Change(key, nw, 1L))
                case (Some(old), None) => Seq(Change(key, old, -1L))
                case (None, None) => Seq.empty
              }
            current = in.value
            changes
          }.toVector
          state.update(current)
          out.iterator
      }
  }
}
