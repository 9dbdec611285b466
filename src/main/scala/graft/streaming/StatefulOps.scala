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
      rows.foreach { c =>
        val w = (if (mult.containsKey(c.value)) mult.getValue(c.value)
          else 0L) + c.weight
        if (w == 0L) mult.removeKey(c.value)
        else mult.updateValue(c.value, w)
      }
      Iterator.single(emit(key, mult.iterator().toArray))
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
      .transformWithState(
        new MultisetProcessor[K, TopK[K]]((key, entries) => {
          val sorted = entries.sortBy(_._1)
          val out = Seq.newBuilder[Long]
          var left = k
          var i = 0
          while (left > 0 && i < sorted.length) {
            val (v, m) = sorted(i)
            val take = math.min(m, left.toLong).toInt
            out ++= Seq.fill(take)(v)
            left -= take
            i += 1
          }
          TopK(key, out.result())
        }, ttl),
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
