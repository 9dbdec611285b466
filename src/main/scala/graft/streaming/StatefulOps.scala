package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed stateful operators for the retraction-correct streaming cases the
  * built-in operators can't express (SURVEY §7.4 "hard parts"):
  *
  *  - streaming TopK per key under inserts AND deletes (reference:
  *    DBSPIndexedTopKOperator.java:29 / group/topk.rs) — state is a
  *    bounded sorted multiset per key;
  *  - retractable MIN/MAX (reference: chain_aggregate.rs is append-only;
  *    the general path keeps the group multiset — dynamic/aggregate/
  *    min.rs/max.rs) — state is a value→multiplicity map per key.
  *
  * Both consume weighted changes (value, ±weight) — the output of
  * `Upsert.toChangelog` or any Z-set delta stream — and emit the new
  * per-key result each time it changes. State lives in the Spark state
  * store (RocksDB-backed at scale), partitioned by key hash: the same
  * layout as the reference's per-key traces.
  *
  * For the unbounded-retraction TopK, the state keeps the FULL per-key
  * multiset (as the reference does — a deleted element can promote any
  * element back into the top k). Callers with append-only inputs should
  * use plain windowed rank (win_topk) instead.
  */
object StatefulOps {

  final case class Change[K](key: K, value: Long, weight: Long)
  final case class TopK[K](key: K, topk: Seq[Long])
  final case class MinMax[K](key: K, min: Long, max: Long, empty: Boolean)

  /** Streaming TopK (ascending) per key over a change stream. */
  def topK[K](changes: Dataset[Change[K]], k: Int)(
      implicit kEnc: Encoder[K],
      stEnc: Encoder[Map[Long, Long]],
      outEnc: Encoder[TopK[K]]): Dataset[TopK[K]] =
    changes.groupByKey(_.key)
      .mapGroupsWithState[Map[Long, Long], TopK[K]](
        GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[Change[K]], state: GroupState[Map[Long, Long]]) =>
          val mult = applyChanges(state.getOption.getOrElse(Map.empty), rows)
          state.update(mult)
          TopK(key, mult.keys.toSeq.sorted.flatMap(v =>
            Seq.fill(math.min(mult(v), k).toInt)(v)).take(k))
      }

  /** Streaming retractable MIN/MAX per key over a change stream. */
  def minMax[K](changes: Dataset[Change[K]])(
      implicit kEnc: Encoder[K],
      stEnc: Encoder[Map[Long, Long]],
      outEnc: Encoder[MinMax[K]]): Dataset[MinMax[K]] =
    changes.groupByKey(_.key)
      .mapGroupsWithState[Map[Long, Long], MinMax[K]](
        GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[Change[K]], state: GroupState[Map[Long, Long]]) =>
          val mult = applyChanges(state.getOption.getOrElse(Map.empty), rows)
          state.update(mult)
          if (mult.isEmpty) MinMax(key, 0L, 0L, empty = true)
          else MinMax(key, mult.keys.min, mult.keys.max, empty = false)
      }

  private def applyChanges[K](init: Map[Long, Long],
      rows: Iterator[Change[K]]): Map[Long, Long] =
    rows.foldLeft(init) { (m, c) =>
      val w = m.getOrElse(c.value, 0L) + c.weight
      if (w == 0) m - c.value else m.updated(c.value, w)
    }

  /** Output mode for these operators in streaming queries. */
  val outputMode: OutputMode = OutputMode.Update
}
