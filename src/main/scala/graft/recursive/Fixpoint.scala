package graft.recursive

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}

/** Semi-naive fixpoint driver for recursive views (reference:
  * DECLARE RECURSIVE VIEW — DBSPNestedOperator.java:30,
  * RecursiveComponents.java, runtime crates/dbsp/src/operator/recursive.rs:262;
  * docs recursion.mdx:14-60).
  *
  * Spark has no recursion primitive, so the driver iterates: each round
  * applies `step` to the latest delta only (semi-naive), unions new rows,
  * and stops when the delta is empty. Materializing each round truncates
  * the lineage — without it the plan doubles per iteration and planning
  * cost explodes; with it each round is a bounded join against the
  * accumulated set. Superseded round caches are unpersisted as soon as a
  * round no longer references them. At scale the accumulator would be
  * bucketed by the join key so each round's `except` and `step` are
  * co-partitioned.
  */
object Fixpoint {

  /** Cut lineage by materializing to a cached RDD (localCheckpoint trips a
    * Spark 4 attribute-mapping bug on EXCEPT plans; this is equivalent:
    * the plan behind `df` is evaluated once and iterations restart from a
    * LogicalRDD). Returns the cache handle so callers can unpersist.
    */
  private def materialize(df: DataFrame): (DataFrame, RDD[_]) = {
    val rdd = df.rdd
    rdd.cache()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** Least fixpoint of `base ∪ step(·)` under set semantics.
    *
    * @param step monotone rule body: given the NEW rows of the last round,
    *             produce candidate rows (may contain duplicates/known rows)
    */
  def semiNaive(base: DataFrame, step: DataFrame => DataFrame,
      maxIterations: Int = 1000): DataFrame =
    mutual(Map("v" -> base),
      Map("v" -> ((st: RoundState) => step(st.deltas("v")))),
      maxIterations)("v")

  /** Per-round bindings handed to each rule body: the accumulated totals
    * and the rows that are NEW since the previous round, per view.
    */
  final case class RoundState(totals: Map[String, DataFrame],
      deltas: Map[String, DataFrame])

  /** Joint least fixpoint of a VECTOR of mutually recursive views — the
    * reference's `DECLARE RECURSIVE VIEW` over several views stepped
    * together inside one nested circuit (DBSPNestedOperator.java:30;
    * recursion.mdx "mutually recursive"). All views advance in synchronous
    * rounds (Jacobi iteration); convergence = every view's delta empty in
    * the same round, checked on the deltas themselves (never inferred from
    * the iteration counter).
    *
    * @param bases non-recursive seed rows per view
    * @param steps monotone rule body per view; may read any view's totals
    *              or deltas (semi-naive callers join deltas against static
    *              relations and other views' totals)
    */
  def mutual(bases: Map[String, DataFrame],
      steps: Map[String, RoundState => DataFrame],
      maxIterations: Int = 1000): Map[String, DataFrame] = {
    require(bases.keySet == steps.keySet, "bases/steps views must match")
    // a from-scratch fixpoint IS a continuation from empty totals with the
    // bases as seeds, so small fixpoints ride the driver tier's
    // one-job-per-round floor. The smallness probe doubles as the seed
    // evaluation (bases re-enter as LocalRelations); big bases keep the
    // distributed loop below, whose per-round queries are large enough
    // that whole-stage codegen pays for itself.
    collectCapped(bases, DriverTierMaxRows) match {
      case None => mutualDistributed(bases, steps, maxIterations)
      case Some(rows) =>
        val spark = bases.head._2.sparkSession
        val seeds = bases.map { case (n, df) =>
          n -> spark.createDataFrame(rows(n).toSeq.asJava,
            org.apache.spark.sql.types.StructType(
              df.schema.fields.map(_.copy(nullable = true))))
        }
        val cont = continueFrom(
          bases.map { case (n, df) => n -> df.limit(0) },
          seeds, steps, maxIterations)
        // pure driver-tier totals are LocalRelations (self-contained); a
        // mid-loop bail leaves frames over round caches, which must be
        // materialized before release()
        val out = bases.keys.toSeq.map { n =>
          val df = cont.totals(n)
          n -> (if (df.queryExecution.logical
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]) df
            else { val (m, rdd) = materialize(df); rdd.count(); m })
        }.toMap
        cont.release()
        out
    }
  }

  /** Distributed from-scratch fixpoint loop — the large-bases tier of
    * [[mutual]].
    */
  private def mutualDistributed(bases: Map[String, DataFrame],
      steps: Map[String, RoundState => DataFrame],
      maxIterations: Int = 1000): Map[String, DataFrame] = {
    val names = bases.keys.toSeq
    // one cache slot per (view × {total, delta}); a superseded slot's RDD
    // is unpersisted once no other slot still points at it (round-1 totals
    // and deltas share their base cache)
    val totalRdds = scala.collection.mutable.Map[String, RDD[_]]()
    val deltaRdds = scala.collection.mutable.Map[String, RDD[_]]()
    def liveRdds: Set[RDD[_]] =
      (totalRdds.values ++ deltaRdds.values).toSet
    def mat(df: DataFrame): (DataFrame, RDD[_]) = {
      val (out, rdd) = materialize(df)
      rdd.count() // eager: the cache must be complete before any
      (out, rdd)  // predecessor cache is released
    }
    def retire(old: Option[RDD[_]]): Unit =
      old.filterNot(liveRdds.contains).foreach(_.unpersist(blocking = false))

    var totals = bases.map { case (n, df) =>
      val (out, rdd) = mat(df.distinct())
      totalRdds(n) = rdd; deltaRdds(n) = rdd
      n -> out
    }
    var deltas = totals
    var converged = names.forall(n => deltas(n).isEmpty)
    var i = 0
    while (i < maxIterations && !converged) {
      val state = RoundState(totals, deltas)
      // all candidates evaluate against the PREVIOUS round's state; old
      // delta caches stay live until every view's step has run
      val computed = names.map { n =>
        (n, mat(steps(n)(state).except(totals(n))))
      }
      val oldDeltas = names.map(deltaRdds.get)
      computed.foreach { case (n, (_, rdd)) => deltaRdds(n) = rdd }
      oldDeltas.foreach(retire)
      val next = computed.map { case (n, (out, _)) => n -> out }.toMap
      converged = names.forall(n => next(n).isEmpty)
      totals = names.map { n =>
        n -> (if (next(n).isEmpty) totals(n)
          else {
            val (out, rdd) = mat(totals(n).unionByName(next(n)))
            val old = totalRdds.get(n)
            totalRdds(n) = rdd
            retire(old)
            out
          })
      }.toMap
      deltas = next
      i += 1
    }
    require(converged, s"fixpoint did not converge in $maxIterations rounds")
    names.foreach(n => retire(deltaRdds.remove(n)))
    totals
  }

  /** Semi-naive CONTINUATION of an already-converged fixpoint under grown
    * inputs — the incremental-recursion path (the reference's nested
    * circuit maintains the inner fixpoint under outer deltas,
    * recursive.rs:262; exact here only for monotone growth, which the
    * caller guarantees by requiring insert-only deltas). Starts from
    * `initTotals` (the previous step's converged totals, NOT re-shuffled
    * or re-derived) with `seeds` = candidate rows derived from the input
    * deltas; each round fires `steps` on the newest rows only and keeps
    * the genuinely new ones.
    *
    * Per-round cost is O(|new rows|): candidates are deduped against
    * totals by a broadcast-probe semi join (totals scanned in place,
    * `IncrementalOps.splitTouched`) followed by an except of two
    * candidate-sized frames — never a full except against the
    * accumulated state.
    *
    * Returns the new totals and the rows added beyond initTotals per
    * view, plus a `release` callback freeing the round caches — call it
    * AFTER materializing (checkpointing) whatever results are kept.
    */
  final case class Continuation(totals: Map[String, DataFrame],
      newRows: Map[String, DataFrame], release: () => Unit)

  /** Row bound (summed over all views) under which the continuation runs
    * in the DRIVER TIER (see [[continueFromDriver]]); `0` disables the
    * tier (spec hook — both tiers must agree exactly).
    */
  val DriverTierMaxRows = 100000

  def continueFrom(initTotals: Map[String, DataFrame],
      seeds: Map[String, DataFrame],
      steps: Map[String, RoundState => DataFrame],
      maxIterations: Int = 1000,
      driverTierMaxRows: Int = DriverTierMaxRows): Continuation = {
    // each round plans + compiles a FRESH tiny query (new cached-RDD
    // leaves); Janino whole-stage compilation is a fixed ~50-100ms per
    // round that interpreted evaluation avoids — round deltas are small
    // by construction, so execution cost is planning-dominated
    val spark = initTotals.head._2.sparkSession
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val small = if (driverTierMaxRows > 0)
        collectCapped(initTotals, driverTierMaxRows) else None
      small match {
        case Some(rows) => continueFromDriver(initTotals, rows, seeds, steps,
          maxIterations, driverTierMaxRows)
        case None =>
          continueFromDistributed(initTotals, seeds, steps, maxIterations)
      }
    } finally spark.conf.set(key, prev)
  }

  // ------------------------------------------------------------ driver tier

  /** Collect every view's totals if they jointly fit `cap` rows; None as
    * soon as the budget is exceeded (each collect is bounded by the
    * remaining budget + 1, so driver memory never exceeds the cap by more
    * than one row per view).
    */
  private def collectCapped(totals: Map[String, DataFrame],
      cap: Int): Option[Map[String, Array[Row]]] = {
    var budget = cap
    val out = Map.newBuilder[String, Array[Row]]
    for ((n, df) <- totals) {
      val rows = df.limit(budget + 1).collect()
      if (rows.length > budget) return None
      budget -= rows.length
      out += n -> rows
    }
    Some(out.result())
  }

  /** Canonical value for driver-side row identity, matching SQL set
    * semantics (`<=>` / DISTINCT): binary compares by content, nested
    * rows/arrays recurse, and -0.0 folds onto 0.0 (boxed NaN already
    * equals itself, matching SQL).
    */
  private def canon(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => b.toSeq
    case r: Row => r.toSeq.map(canon)
    case s: scala.collection.Seq[_] => s.map(canon)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => (canon(k), canon(x)) }
    case d: java.lang.Double if d.doubleValue == 0.0d =>
      java.lang.Double.valueOf(0.0d)
    case f: java.lang.Float if f.floatValue == 0.0f =>
      java.lang.Float.valueOf(0.0f)
    case x => x
  }
  private def rowKey(r: Row): Seq[Any] = r.toSeq.map(canon)

  /** DRIVER-TIER continuation for small states: totals and deltas are
    * driver-local row sets, each round evaluates EVERY view's candidate
    * plan in one Spark job (an RDD union over the per-view plans, each
    * capped at the row budget), and candidates-minus-totals is a driver
    * hash-set lookup — no per-view broadcast-build or count jobs. Deltas
    * and totals re-enter step bodies as LocalRelations, which the
    * optimizer folds driver-side (ConvertToLocalRelation), so delta-side
    * broadcasts need no collect job either: the per-round floor is ONE
    * scheduled job instead of ~3 per view. Deep recursions over small
    * deltas are scheduling-floor-bound, which makes this the same
    * latency tier as the connected-components driver union-find
    * (llm/Dedup.scala); the moment a round's candidates or the
    * accumulated totals overflow the cap, the CURRENT state hands off to
    * [[continueFromDistributed]], which is exact at any size.
    */
  private def continueFromDriver(
      initTotals: Map[String, DataFrame],
      initRows: Map[String, Array[Row]],
      seeds: Map[String, DataFrame],
      steps: Map[String, RoundState => DataFrame],
      maxIterations: Int,
      cap: Int): Continuation = {
    val names = initTotals.keys.toSeq
    val spark = initTotals.head._2.sparkSession
    // top-level nullability relaxed: candidate plans routinely widen it,
    // and LocalRelation conversion validates the declared schema. Nested
    // types stay EXACTLY the totals' types — binding code compares
    // dataType (which includes nested nullability) when grafting these
    // frames onto analyzed plans.
    val schemas = names.map { n =>
      n -> org.apache.spark.sql.types.StructType(
        initTotals(n).schema.fields.map(_.copy(nullable = true)))
    }.toMap
    val seen = names.map { n =>
      n -> (mutable.HashSet.empty[Seq[Any]] ++= initRows(n).map(rowKey))
    }.toMap
    val totalRows = names.map { n =>
      n -> (mutable.ArrayBuffer.empty[Row] ++= initRows(n))
    }.toMap
    val addedRows = names.map(n => n -> mutable.ArrayBuffer.empty[Row]).toMap
    var totalCount = initRows.valuesIterator.map(_.length.toLong).sum

    def localDF(n: String, rows: Seq[Row]): DataFrame =
      spark.createDataFrame(rows.asJava, schemas(n))
    def totalsDFs: Map[String, DataFrame] =
      names.map(n => n -> localDF(n, totalRows(n).toSeq)).toMap

    // hand the CURRENT state to the distributed tier: its newOnly() takes
    // over the dedup of the in-flight candidates, and rows already added
    // here are prepended to the continuation's newRows
    def bail(cands: Map[String, DataFrame], remaining: Int): Continuation = {
      val cont = continueFromDistributed(totalsDFs, cands, steps, remaining)
      Continuation(cont.totals,
        names.map(n => n -> localDF(n, addedRows(n).toSeq)
          .unionByName(cont.newRows(n))).toMap,
        cont.release)
    }

    // ONE job for the whole round: candidates aligned to the view schema,
    // row-capped, tagged with the view index, and collected through an
    // RDD union. None = some view overflowed the cap (its collection is
    // incomplete and must be discarded).
    def evalRound(cands: Map[String, DataFrame]): Option[Map[String, Array[Row]]] = {
      val tagged = names.zipWithIndex.map { case (n, i) =>
        val df = cands(n)
        // align column order AND types to the view schema (unionByName in
        // the distributed tier coerces candidate types the same way —
        // e.g. an INT-typed rule branch feeding a BIGINT view)
        val aligned =
          if (df.columns.sameElements(schemas(n).fieldNames) &&
              df.schema.fields.map(_.dataType)
                .sameElements(schemas(n).fields.map(_.dataType))) df
          else df.select(schemas(n).fields.toSeq.map(f =>
            org.apache.spark.sql.functions.col(f.name)
              .cast(f.dataType).as(f.name)): _*)
        aligned.limit(cap + 1).rdd.map(r => (i, r))
      }
      val collected = spark.sparkContext.union(tagged).collect()
      val by = collected.groupBy(_._1)
      val out = names.zipWithIndex.map { case (n, i) =>
        n -> by.getOrElse(i, Array.empty[(Int, Row)]).map(_._2)
      }.toMap
      if (out.valuesIterator.exists(_.length > cap)) None else Some(out)
    }

    var cands: Map[String, DataFrame] = names.map(n =>
      n -> seeds.getOrElse(n, initTotals(n).limit(0))).toMap
    var i = 0
    var converged = false
    while (!converged) {
      evalRound(cands) match {
        case None => return bail(cands, maxIterations - i)
        case Some(collected) =>
          val fresh = names.map { n =>
            n -> collected(n).filter(r => seen(n).add(rowKey(r))).toSeq
          }.toMap
          names.foreach { n =>
            totalRows(n) ++= fresh(n); addedRows(n) ++= fresh(n)
          }
          totalCount += fresh.valuesIterator.map(_.size.toLong).sum
          converged = fresh.valuesIterator.forall(_.isEmpty)
          i += 1
          if (!converged) {
            require(i < maxIterations,
              s"fixpoint continuation did not converge in $maxIterations rounds")
            val state = RoundState(totalsDFs,
              names.map(n => n -> localDF(n, fresh(n))).toMap)
            cands = names.map(n => n -> steps(n)(state)).toMap
            if (totalCount > cap) return bail(cands, maxIterations - i)
          }
      }
    }
    Continuation(totalsDFs,
      names.map(n => n -> localDF(n, addedRows(n).toSeq)).toMap,
      () => ())
  }

  // ------------------------------------------------------- distributed tier

  private def continueFromDistributed(initTotals: Map[String, DataFrame],
      seeds: Map[String, DataFrame],
      steps: Map[String, RoundState => DataFrame],
      maxIterations: Int): Continuation = {
    require(initTotals.keySet == steps.keySet,
      "initTotals/steps views must match")
    val names = initTotals.keys.toSeq
    // every round's delta cache stays live until release(): totals are
    // LAZY unions over the cached delta RDDs (linear lineage — never a
    // full re-materialization of the accumulated state per round), so the
    // caches they reference cannot be retired mid-run
    val owned = scala.collection.mutable.ListBuffer[RDD[_]]()
    def mat(df: DataFrame): (DataFrame, Long) = {
      val (out, rdd) = materialize(df)
      val c = rdd.count()
      owned += rdd
      (out, c)
    }
    // candidates minus totals, with totals only broadcast-probed: the
    // matching totals rows (dup, candidate-sized) are extracted scan-side
    // (splitTouched), then a STATIC broadcast anti join + distinct
    // finishes the set difference. (`.except` would plan as anti join +
    // distinct too, but AQE materializes its two shuffle stages as
    // separate jobs per round before it can pick the broadcast — with
    // ~5 extra scheduler jobs per fixpoint round that dominated deep
    // recursions; the hand-broadcast form never shuffles the join.)
    def newOnly(cand: DataFrame, totals: DataFrame): DataFrame = {
      import org.apache.spark.sql.functions.col
      val cols = cand.columns.toSeq
      val dup = graft.incremental.IncrementalOps
        .splitTouched(totals, cand, cols)._1
        .select(cols.map(c => col(c).as(s"_d_$c")): _*)
      val cond = cols.map(c => col(c) <=> col(s"_d_$c")).reduce(_ && _)
      // dup is candidate-sized, but a round-0 candidate set of a huge
      // closure is unbounded — same size gate as the delta broadcasts
      cand.join(graft.incremental.IncrementalOps.maybeBroadcast(dup),
        cond, "left_anti").dropDuplicates()
    }

    var totals = initTotals
    val accParts = scala.collection.mutable.Map[String, List[DataFrame]]()
    var deltas: Map[String, (DataFrame, Long)] = names.map { n =>
      val s = seeds.getOrElse(n, initTotals(n).limit(0))
      n -> mat(newOnly(s, totals(n)))
    }.toMap
    def absorb(): Unit = names.foreach { n =>
      val (df, c) = deltas(n)
      if (c > 0) {
        totals += (n -> totals(n).unionByName(df))
        accParts(n) = df :: accParts.getOrElse(n, Nil)
      }
    }
    absorb()
    var converged = deltas.values.forall(_._2 == 0)
    var i = 0
    var sinceCompact = 0
    while (i < maxIterations && !converged) {
      val state = RoundState(totals,
        deltas.map { case (n, (df, _)) => n -> df })
      deltas = names.map(n =>
        n -> mat(newOnly(steps(n)(state), totals(n)))).toMap
      converged = deltas.values.forall(_._2 == 0)
      absorb()
      i += 1
      sinceCompact += 1
      // compact the totals lineage every few rounds: the lazy union chain
      // grows one cached-RDD leaf per round, so optimizer+codegen cost per
      // round grows with the round number (quadratic over a deep
      // recursion) — re-materializing into one cached RDD resets plan
      // depth for one amortized state-sized write
      if (sinceCompact >= 8 && !converged) {
        totals = names.map { n => n -> mat(totals(n))._1 }.toMap
        sinceCompact = 0
      }
    }
    require(converged,
      s"fixpoint continuation did not converge in $maxIterations rounds")
    val newRows = names.map { n =>
      n -> accParts.getOrElse(n, Nil).reduceOption(_ unionByName _)
        .getOrElse(initTotals(n).limit(0))
    }.toMap
    Continuation(totals, newRows,
      () => owned.foreach(_.unpersist(blocking = false)))
  }
}
