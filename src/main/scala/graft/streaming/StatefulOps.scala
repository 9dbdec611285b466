package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Keyed stateful operators for the retraction-correct streaming cases the
  * built-in operators can't express (SURVEY §7.4 "hard parts"):
  *
  *  - streaming TopK per key under inserts AND deletes (reference:
  *    DBSPIndexedTopKOperator.java:29 / group/topk.rs) — state is a
  *    value→multiplicity multiset per key;
  *  - retractable MIN/MAX (reference: chain_aggregate.rs is append-only;
  *    the general path keeps the group multiset — dynamic/aggregate/
  *    min.rs/max.rs).
  *
  * Both consume weighted changes (value, ±weight) — the output of
  * `Upsert.toChangelog` or any Z-set delta stream — and emit the new
  * per-key result each time it changes.
  *
  * Implementation: `transformWithState` with a [[MapState]] keyed by VALUE,
  * so state I/O is per-entry (RocksDB point put/delete per changed value),
  * not a whole-multiset blob rewrite per batch — the same trace layout as
  * the reference's per-key indexed Z-sets. An optional [[TTLConfig]] maps
  * the reference's state-retention conventions (retain_keys/values) onto
  * the state store's native TTL GC. Requires the RocksDB state store
  * provider (`spark.sql.streaming.stateStore.providerClass`), which is the
  * at-scale configuration anyway.
  */
object StatefulOps {

  final case class Change[K](key: K, value: Long, weight: Long)
  final case class TopK[K](key: K, topk: Seq[Long])
  final case class MinMax[K](key: K, min: Long, max: Long, empty: Boolean)

  /** value→multiplicity multiset in MapState; emits one O per batch per
    * touched key, computed from a single entry scan.
    */
  private final class MultisetProcessor[K, O](
      emit: (K, Array[(Long, Long)]) => O,
      ttl: TTLConfig)
      extends StatefulProcessor[K, Change[K], O] {
    @transient private var mult: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      mult = getHandle.getMapState[Long, Long](
        "mult", Encoders.scalaLong, Encoders.scalaLong, ttl)

    override def handleInputRows(key: K, rows: Iterator[Change[K]],
        tv: TimerValues): Iterator[O] = {
      // batch-local pre-aggregation: one state round trip per distinct
      // value, not per input row
      val delta = collection.mutable.LongMap.empty[Long]
      rows.foreach(c =>
        delta(c.value) = delta.getOrElse(c.value, 0L) + c.weight)
      delta.foreach { case (v, dw) =>
        if (dw != 0L) {
          val w = (if (mult.containsKey(v)) mult.getValue(v) else 0L) + dw
          if (w == 0L) mult.removeKey(v)
          else mult.updateValue(v, w)
        }
      }
      Iterator.single(emit(key, mult.iterator().toArray))
    }
  }

  /** TopK with a bounded head: the exact k-smallest multiset is cached in
    * a ValueState (flattened sorted (value, mult) pairs), so the per-batch
    * emit is O(k + distinct batch values), not a full scan of the key's
    * multiset. The full value→multiplicity map is still maintained for
    * retraction correctness; it is only SCANNED when a retraction shrinks
    * the head below k (rare: a delete touching the current top-k), where
    * the head is rebuilt from the map. Inserts ≥ the head boundary touch
    * only the map — at scale (reference trace layout) that is the hot
    * path, since a warm head's boundary is small relative to the value
    * distribution.
    */
  private final class TopKProcessor[K](k: Int, ttl: TTLConfig)
      extends StatefulProcessor[K, Change[K], TopK[K]] {
    @transient private var mult: MapState[Long, Long] = _
    @transient private var head: ValueState[Array[Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      mult = getHandle.getMapState[Long, Long](
        "mult", Encoders.scalaLong, Encoders.scalaLong, ttl)
      head = getHandle.getValueState[Array[Long]]("head",
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
        ttl)
    }

    override def handleInputRows(key: K, rows: Iterator[Change[K]],
        tv: TimerValues): Iterator[TopK[K]] = {
      val delta = collection.mutable.LongMap.empty[Long]
      rows.foreach(c =>
        delta(c.value) = delta.getOrElse(c.value, 0L) + c.weight)

      // head as a sorted map for the duration of the batch
      val h = collection.mutable.TreeMap.empty[Long, Long]
      val prev = head.get()
      if (prev != null) {
        var i = 0
        while (i < prev.length) { h(prev(i)) = prev(i + 1); i += 2 }
      }
      def headTotal: Long = h.valuesIterator.sum
      def boundary: Long = if (h.isEmpty) Long.MaxValue else h.lastKey
      // drop largest occurrences until the head holds exactly ≤ k
      def trim(): Unit = {
        var over = headTotal - k
        while (over > 0 && h.nonEmpty) {
          val (v, m) = h.last
          if (m <= over) { h.remove(v); over -= m }
          else { h(v) = m - over; over = 0 }
        }
      }

      var needRefill = false
      delta.foreach { case (v, dw) =>
        if (dw != 0L) {
          val old = if (mult.containsKey(v)) mult.getValue(v) else 0L
          val nw = old + dw
          if (nw == 0L) mult.removeKey(v) else mult.updateValue(v, nw)
          if (!needRefill) {
            if (dw > 0) {
              // a new occurrence enters the head iff it beats the
              // boundary or there is spare capacity
              if (headTotal < k || v < boundary) { h(v) = nw; trim() }
            } else if (v <= boundary) {
              // all of v's head occurrences must shrink to min(old, nw)
              val hc = h.getOrElse(v, 0L)
              if (hc > nw) {
                if (nw <= 0L) h.remove(v) else h(v) = nw
                needRefill = true // underflow: pull successors from map
              }
            }
          }
        }
      }
      if (needRefill) {
        h.clear()
        val entries = mult.iterator().toArray.sortBy(_._1)
        var left = k.toLong
        var i = 0
        while (left > 0 && i < entries.length) {
          val (v, m) = entries(i)
          val take = math.min(m, left)
          h(v) = take
          left -= take
          i += 1
        }
      }
      val flat = new Array[Long](h.size * 2)
      var i = 0
      h.foreach { case (v, m) => flat(i) = v; flat(i + 1) = m; i += 2 }
      if (flat.length == 0) head.clear() else head.update(flat)

      val out = Seq.newBuilder[Long]
      h.foreach { case (v, m) =>
        var j = 0L
        while (j < m) { out += v; j += 1 }
      }
      Iterator.single(TopK(key, out.result()))
    }
  }

  /** Streaming TopK (ascending) per key over a change stream. A retraction
    * can promote any element back into the top k, so the full per-key
    * multiset is retained (as the reference does); per-batch work is one
    * scan of the key's entries.
    */
  def topK[K](changes: Dataset[Change[K]], k: Int,
      ttl: TTLConfig = TTLConfig.NONE)(
      implicit kEnc: Encoder[K], outEnc: Encoder[TopK[K]]): Dataset[TopK[K]] =
    changes.groupByKey(_.key)
      .transformWithState(new TopKProcessor[K](k, ttl),
        TimeMode.None(), OutputMode.Update())

  /** Streaming retractable MIN/MAX per key over a change stream. */
  def minMax[K](changes: Dataset[Change[K]],
      ttl: TTLConfig = TTLConfig.NONE)(
      implicit kEnc: Encoder[K],
      outEnc: Encoder[MinMax[K]]): Dataset[MinMax[K]] =
    changes.groupByKey(_.key)
      .transformWithState(
        new MultisetProcessor[K, MinMax[K]]((key, entries) => {
          if (entries.isEmpty) MinMax(key, 0L, 0L, empty = true)
          else MinMax(key, entries.map(_._1).min, entries.map(_._1).max,
            empty = false)
        }, ttl),
        TimeMode.None(), OutputMode.Update())

  /** Output mode for these operators in streaming queries. */
  val outputMode: OutputMode = OutputMode.Update
}
