package graft.incremental

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.zset.ZSets
import graft.zset.ZSets.W

/** Incremental (delta-driven) operators over Z-set DataFrames — the Spark
  * re-expression of DBSP's incrementalized circuit operators (SURVEY §2.7,
  * §4.2 IncrementalizeVisitor). Each operator exposes
  * `step(state..., delta...) => (newState, outputDelta)` so a micro-batch
  * runner can maintain views under inserts AND retractions, guaranteeing
  * final state equals the batch recompute (the reference's core contract,
  * README.md:67-70).
  *
  * Scale: every step touches only delta-adjacent state — deltas join/agg
  * against state on the group/join key (one shuffle, key-partitioned;
  * state would live bucketed-by-key in a real deployment so the join is
  * co-located and per-batch cost is O(|delta|), not O(|state|)).
  */
object IncrementalOps {

  // ---------------------------------------------------------------- linear

  /** Linear operators commute with differentiation: apply to deltas as-is
    * (reference: filter_map.rs — weight passes through untouched).
    */
  def mapDelta(delta: DataFrame)(f: DataFrame => DataFrame): DataFrame =
    f(delta)

  // ------------------------------------------------------------ aggregates

  /** Spec for one weighted linear aggregate: SUM(expr * weight) —
    * the reference's Weigh + linear-postprocess pipeline
    * (DBSPWeighOperator.java:20, aggregate.rs:209 aggregate_linear).
    */
  final case class LinearAggSpec(name: String, valueExpr: Column)

  /** Incremental linear aggregation (SUM/COUNT; AVG = SUM/COUNT in post).
    *
    * State schema: groupKeys ++ [name: sum-of-value*weight] ++ [_cnt: sum
    * of weights]. Groups whose weight-count reaches 0 are dropped (the
    * AggregateZero contract for grouped aggs: a group vanishes when its
    * multiset empties — DBSPAggregateZeroOperator.java:45).
    */
  def linearAggStep(
      state: Option[DataFrame],
      delta: DataFrame,
      groupKeys: Seq[String],
      specs: Seq[LinearAggSpec]): DataFrame = {
    val contrib = delta.groupBy(groupKeys.map(col): _*)
      .agg(sum(col(W)).as("_cnt"),
        specs.map(sp => sum(sp.valueExpr * col(W)).as(sp.name)): _*)
    val merged = state match {
      case None => contrib
      case Some(st) => st.unionByName(contrib)
          .groupBy(groupKeys.map(col): _*)
          .agg(sum(col("_cnt")).as("_cnt"),
            specs.map(sp => sum(col(sp.name)).as(sp.name)): _*)
    }
    merged.filter(col("_cnt") =!= 0)
  }

  /** General (fold) aggregation with retraction support — MIN/MAX/etc.
    * State = the consolidated input Z-set restricted to (groupKeys, value
    * columns); each step recomputes aggregates only for groups touched by
    * the delta (the reference's aggregate-over-integrated-trace,
    * DBSPAggregateOperator.java:43 / dynamic/aggregate/fold.rs).
    *
    * Returns (newState, newAggRowsForTouchedGroups).
    */
  def generalAggStep(
      state: Option[DataFrame],
      delta: DataFrame,
      groupKeys: Seq[String],
      aggs: Seq[Column]): (DataFrame, DataFrame) = {
    val newState = ZSets.consolidate(
      state.map(_.unionByName(delta)).getOrElse(delta))
    val touched = delta.select(groupKeys.map(col): _*).distinct()
    val touchedState = newState.join(touched, groupKeys, "left_semi")
    // weights are row multiplicities for the fold: expand (weights are
    // small positive after consolidation of insert-heavy streams; fold
    // aggs over true multisets)
    val newRows = ZSets.toMultiset(touchedState)
      .groupBy(groupKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    (newState, newRows)
  }

  // --------------------------------------------------------------- distinct

  /** Incremental DISTINCT: state = consolidated multiplicities; output
    * delta = sign transitions (appeared → +1, vanished → −1)
    * (reference: distinct.rs:38 incremental distinct).
    *
    * Returns (newState, outputDelta).
    */
  def distinctStep(
      state: Option[DataFrame],
      delta: DataFrame): (DataFrame, DataFrame) = {
    val keys = ZSets.dataCols(delta)
    val old = state.getOrElse(delta.limit(0))
    val newState = ZSets.consolidate(old.unionByName(delta))
    val oldW = old.groupBy(keys.map(col): _*).agg(sum(col(W)).as("_ow"))
    val newW = newState.join(delta.select(keys.map(col): _*).distinct(),
        keys, "left_semi")
      .select(keys.map(col) :+ col(W).as("_nw"): _*)
    val joined = oldW.join(newW, keys, "full_outer")
      .withColumn("_ow", coalesce(col("_ow"), lit(0L)))
      .withColumn("_nw", coalesce(col("_nw"), lit(0L)))
      // full-outer keeps untouched old rows; restrict to touched ones
      .join(delta.select(keys.map(col): _*).distinct(), keys, "left_semi")
    val out = joined.withColumn(W,
        when(col("_ow") <= 0 && col("_nw") > 0, 1L)
          .when(col("_ow") > 0 && col("_nw") <= 0, -1L)
          .otherwise(0L))
      .filter(col(W) =!= 0)
      .drop("_ow", "_nw")
    (newState, out)
  }

  // ---------------------------------------------------------------- upsert

  /** PRIMARY-KEY upsert step (reference: input_upsert.rs:254,
    * DBSPUpsertFeedbackOperator.java:22): each batch carries at most one
    * command per key — `_deleted = false` upserts the payload, `true`
    * deletes the key. State = latest row per key; output delta = retract
    * replaced/deleted rows, insert new ones. The streaming twin is
    * graft.streaming.Upsert (per-row ordered within a key).
    *
    * Returns (newState, outputDelta as Z-set over key+payload).
    */
  def upsertStep(
      state: Option[DataFrame],
      batch: DataFrame,
      key: Seq[String],
      deletedCol: String = "_deleted"): (DataFrame, DataFrame) = {
    val payload = batch.columns.toSeq.filterNot(c =>
      key.contains(c) || c == deletedCol)
    // state carries an explicit liveness marker so nullable payloads work
    val old = state match {
      case Some(st) => st
      case None => batch.drop(deletedCol)
        .withColumn("_present", lit(true)).limit(0)
    }
    val b = batch.select(
      key.map(col) ++ payload.map(c => col(c).as(s"_n_$c"))
        :+ col(deletedCol).as("_del"): _*)
    val joined = old.join(b, key, "full_outer")
    val oldLive = coalesce(col("_present"), lit(false))
    val isUpsert = col("_del") === false
    val newState = joined.select(
      key.map(col) ++ payload.map { c =>
        when(col("_del").isNull, col(c))              // untouched key
          .when(isUpsert, col(s"_n_$c"))              // upsert
          .otherwise(lit(null)).as(c)                 // delete
      } :+ when(col("_del").isNull, oldLive)
        .otherwise(isUpsert).as("_present"): _*)
      .filter(col("_present"))
    val touched = joined.filter(col("_del").isNotNull)
    val retracts = touched.filter(oldLive)
      .select(key.map(col) ++ payload.map(col) :+ lit(-1L).as(W): _*)
    val inserts = touched.filter(isUpsert)
      .select(key.map(col) ++ payload.map(c => col(s"_n_$c").as(c))
        :+ lit(1L).as(W): _*)
    (newState, ZSets.consolidate(retracts.unionByName(inserts)))
  }

  // ------------------------------------------------------------------ join

  /** Incremental inner equi-join: ΔOut = ΔA⋈B ∪ (A+ΔA)⋈ΔB, with output
    * weight = wA·wB (the bilinear form; reference join.rs:123 /
    * dynamic/join.rs:1358 JoinTrace).
    *
    * Inputs are the *integrated* sides A, B (consolidated Z-sets) plus the
    * deltas. Returns (newA, newB, outputDelta).
    */
  def joinStep(
      aState: Option[DataFrame], bState: Option[DataFrame],
      dA: DataFrame, dB: DataFrame,
      keys: Seq[String]): (DataFrame, DataFrame, DataFrame) = {
    def joined(l: DataFrame, r: DataFrame): DataFrame = {
      val lw = l.withColumnRenamed(W, "_wl")
      val rw = r.withColumnRenamed(W, "_wr")
      lw.join(rw, keys)
        .withColumn(W, col("_wl") * col("_wr"))
        .drop("_wl", "_wr")
    }
    val a = aState.getOrElse(dA.limit(0))
    val b = bState.getOrElse(dB.limit(0))
    val newA = ZSets.consolidate(a.unionByName(dA))
    val out = joined(dA, b).unionByName(joined(newA, dB))
    (newA, ZSets.consolidate(b.unionByName(dB)), ZSets.consolidate(out))
  }
}
