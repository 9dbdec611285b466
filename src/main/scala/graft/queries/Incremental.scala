package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.incremental.IncrementalOps
import graft.incremental.IncrementalOps.LinearAggSpec
import graft.recursive.Fixpoint
import graft.zset.ZSets
import QB._

/** Incremental-vs-batch equivalence, graded by the driver: each query runs
  * the DELTA path (multiple batches with ~10% retractions through
  * graft.incremental) and the oracle is the equivalent BATCH SQL over the
  * final snapshot — the reference's core guarantee (README.md:67-70,
  * SLT `-inc` mode) expressed as a DuckDB hash-match.
  *
  * Delta schedule (deterministic): rows arrive in 3 batches by
  * l_orderkey % 3; batch 3 also RETRACTS every row with l_orderkey % 10 = 0
  * (all inserted in earlier batches or batch 3 itself... those with mod 3
  * = 2 arrive and retract in the same step, exercising same-batch
  * cancellation). Final snapshot = rows with l_orderkey % 10 <> 0.
  */
object Incremental {
  /** Shadow QB.t with the un-rebalanced loader: these demos slice tables
    * into many small per-step deltas, where the single-row-group fan-out
    * exchange would be re-paid per step for no scan-side win.
    */
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.loadRaw(s, dir, name)

  private def deltaBatches(li: DataFrame): Seq[DataFrame] = {
    val z = (m: Int) => ZSets.lift(li.filter(col("l_orderkey") % 3 === m))
    val retract = ZSets.negate(
      ZSets.lift(li.filter(col("l_orderkey") % 10 === 0)))
    Seq(z(0), z(1), z(2).unionByName(retract))
  }

  val queries: Seq[Q] = Seq(
    Q(
      "inc_linear_agg",
      s"""SELECT l_returnflag,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  COUNT(*) AS n,
         |  ${sqlDavg("l_quantity")} AS avg_qty
         |FROM lineitem WHERE l_orderkey % 10 <> 0
         |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity")
      val specs = Seq(LinearAggSpec("_sum_q", dec(col("l_quantity"))))
      // group sums live in the LSM-tiered backend as weight-1 rows: each
      // step aggregates its delta, probes old sums for the touched
      // groups, and appends retract-old / insert-merged — untouched
      // groups are never rewritten. Runs stay in the memtable while the
      // state is small and spill to the bucketed parquet tier past the
      // bound (TieredTraceSpec drives both sides of the flush).
      val trace = new graft.incremental.TieredTrace(
        graft.incremental.BucketedTrace.linearAggTemplate(
          ZSets.lift(li), Seq("l_returnflag"), specs),
        Seq("l_returnflag"), nBuckets = 16)
      try {
        deltaBatches(li).foreach { delta =>
          graft.incremental.BucketedTrace.linearAggStep(
            trace, delta, Seq("l_returnflag"), specs)
        }
        ZSets.toMultiset(trace.read())
          .select(col("l_returnflag"),
            col("_sum_q").cast("double").as("sum_qty"),
            col("_cnt").as("n"),
            (col("_sum_q").cast("double") / col("_cnt")).as("avg_qty"))
          .localCheckpoint(true)
      } finally trace.delete()
    },

    Q(
      "inc_general_agg",
      """SELECT l_returnflag, MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q,
        |  MAX(l_extendedprice) AS max_p
        |FROM lineitem WHERE l_orderkey % 10 <> 0
        |GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity",
          "l_extendedprice")
      // state = the consolidated input Z-set, kept in the LSM-tiered
      // backend: each step appends the delta as a run (O(|Δ|) write,
      // memtable until the spill bound) and re-aggregates only the
      // touched groups through the probe — no per-step full-state rewrite
      val trace = new graft.incremental.TieredTrace(
        ZSets.lift(li.drop("l_orderkey")), Seq("l_returnflag"),
        nBuckets = 16)
      try {
        var lastOut: DataFrame = null
        deltaBatches(li).foreach { delta =>
          val (rows, _) = graft.incremental.BucketedTrace.generalAggStep(
            trace, delta.drop("l_orderkey"), Seq("l_returnflag"),
            Seq(min(col("l_quantity")).as("min_q"),
              max(col("l_quantity")).as("max_q"),
              max(col("l_extendedprice")).as("max_p")))
          lastOut = rows
        }
        // every group is touched in the last batch → lastOut is the
        // answer; materialize before the trace files are deleted
        lastOut.localCheckpoint(true)
      } finally trace.delete()
    },

    // append_only chain aggregate (chain_aggregate.rs): the 3 insert-only
    // batches flow through the O(groups)-state fast path; oracle = batch
    // MIN/MAX over everything inserted.
    Q(
      "inc_chain_agg",
      """SELECT l_returnflag, MIN(l_quantity) AS min_q, MAX(l_quantity) AS max_q
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_quantity")
      val appendBatches = (0 until 3).map(m =>
        li.filter(col("l_orderkey") % 3 === m).drop("l_orderkey"))
      val specs = Seq(
        IncrementalOps.ChainSpec("min_q", col("l_quantity"), isMax = false),
        IncrementalOps.ChainSpec("max_q", col("l_quantity"), isMax = true))
      // O(groups) extremum state in the tiered backend; a batch that
      // moves no extremum cancels to a zero-row run
      val trace = new graft.incremental.TieredTrace(
        graft.incremental.BucketedTrace.chainAggTemplate(
          appendBatches.head, Seq("l_returnflag"), specs),
        Seq("l_returnflag"), nBuckets = 16)
      try {
        appendBatches.foreach { b =>
          graft.incremental.BucketedTrace.chainAggStep(
            trace, b, Seq("l_returnflag"), specs)
        }
        ZSets.toMultiset(trace.read()).localCheckpoint(true)
      } finally trace.delete()
    },

    Q(
      "inc_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey
        |FROM lineitem WHERE l_orderkey % 10 <> 0""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_linestatus", "l_suppkey")
      // multiplicity state lives in the LSM-tiered backend: each step
      // appends the consolidated delta as a run (O(|Δ|) write) and probes
      // the old weights for the delta's rows — no per-step full-state
      // localCheckpoint rewrite, no parquet round trip while the state
      // fits the memtable
      val trace = new graft.incremental.TieredTrace(
        ZSets.lift(li.drop("l_orderkey")), Seq("l_returnflag",
          "l_linestatus", "l_suppkey"), nBuckets = 16)
      try {
        var result = Option.empty[DataFrame]
        deltaBatches(li).foreach { delta =>
          val out = graft.incremental.BucketedTrace.distinctStep(
            trace, delta.drop("l_orderkey"))
          // integrate the output deltas to materialize the distinct view
          result = Some(result.map(_.unionByName(out)).getOrElse(out))
        }
        ZSets.positive(ZSets.consolidate(result.get)).drop(ZSets.W)
          .localCheckpoint(true)
      } finally trace.delete()
    },

    Q(
      "inc_join",
      """SELECT o_orderkey, o_custkey, l_linenumber,
        |  l_extendedprice, o_totalprice
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderkey % 10 <> 0 AND o_orderkey % 7 < 2""".stripMargin) {
      (s, dir) =>
        // orders arrive in 2 batches; lineitem in 3 with the retraction
        // schedule; join key o_orderkey (renamed on lineitem side).
        val o = t(s, dir, "orders")
          .filter(col("o_orderkey") % 7 < 2)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val li = t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 7 < 2)
          .select(col("l_orderkey").as("o_orderkey"),
            col("l_linenumber"), col("l_extendedprice"))
        val oBatches = Seq(
          ZSets.lift(o.filter(col("o_orderkey") % 2 === 0)),
          ZSets.lift(o.filter(col("o_orderkey") % 2 === 1)),
          ZSets.lift(o).limit(0),
          // late retraction of the % 10 == 0 orders
          ZSets.negate(ZSets.lift(o.filter(col("o_orderkey") % 10 === 0))))
        val lBatches = Seq(
          ZSets.lift(li.filter(col("o_orderkey") % 3 === 0)),
          ZSets.lift(li.filter(col("o_orderkey") % 3 === 1)),
          ZSets.lift(li.filter(col("o_orderkey") % 3 === 2)),
          ZSets.negate(ZSets.lift(li.filter(col("o_orderkey") % 10 === 0))))
        // traces live in the LSM-tiered backend (the spine analogue):
        // each step APPENDS the delta as a run — O(|Δ|) write, cached
        // memtable runs until the spill bound, bucketed parquet after —
        // and the bilinear output terms probe the runs in place. No step
        // reads or rewrites the full trace (the localCheckpoint-per-step
        // form rewrote both traces through a row-encoder round trip every
        // batch). 16 buckets on the disk tier: below Spark's
        // parallel-listing threshold (32 paths), so run listings stay
        // driver-side. Production sizing scales nBuckets with the cluster.
        val aTrace = new graft.incremental.TieredTrace(
          ZSets.lift(o), Seq("o_orderkey"), nBuckets = 16)
        val bTrace = new graft.incremental.TieredTrace(
          ZSets.lift(li), Seq("o_orderkey"), nBuckets = 16)
        try {
          var out = Option.empty[DataFrame]
          oBatches.zip(lBatches).foreach { case (dA, dB) =>
            val d = graft.incremental.BucketedTrace.joinStep(
              aTrace, bTrace, dA, dB, Seq("o_orderkey"))
            out = Some(out.map(_.unionByName(d)).getOrElse(d))
          }
          ZSets.toMultiset(ZSets.consolidate(out.get))
            .select("o_orderkey", "o_custkey", "l_linenumber",
              "l_extendedprice", "o_totalprice")
            // the traces are deleted in the finally below, so the result
            // must not depend on their files: snapshot it first. The
            // snapshot is result-sized (the integrated view), not
            // trace-sized.
            .localCheckpoint(true)
        } finally {
          aTrace.delete()
          bTrace.delete()
        }
    },

    // PRIMARY KEY (upsert) table semantics: v1 for every order, v2
    // overwrite for keys % 3 = 0, delete for keys % 13 = 0 — the final
    // integrated view must equal the last-writer-wins snapshot.
    Q(
      "inc_upsert",
      """SELECT o_orderkey AS k,
        |  CASE WHEN o_orderkey % 3 = 0 THEN CAST(FLOOR(o_totalprice) AS BIGINT) + 7
        |       ELSE CAST(FLOOR(o_totalprice) AS BIGINT) END AS v
        |FROM orders WHERE o_orderkey % 13 <> 0 AND o_orderkey <= 60000""".stripMargin) {
      (s, dir) =>
        val o = t(s, dir, "orders").filter(col("o_orderkey") <= 60000)
          .select(col("o_orderkey").as("k"),
            floor(col("o_totalprice")).cast("long").as("v"))
        val batches = Seq(
          o.withColumn("_deleted", lit(false)),
          o.filter(col("k") % 3 === 0)
            .withColumn("v", col("v") + 7)
            .withColumn("_deleted", lit(false)),
          o.filter(col("k") % 13 === 0)
            .withColumn("v", lit(null).cast("long"))
            .withColumn("_deleted", lit(true)))
        // PK state as a Z-set trace in the tiered backend: each step
        // appends exactly its OUTPUT delta (retract replaced/deleted,
        // insert new) — untouched keys are never rewritten; old rows come
        // from the probe
        val trace = new graft.incremental.TieredTrace(
          ZSets.lift(o), Seq("k"), nBuckets = 16)
        try {
          var out = Option.empty[DataFrame]
          batches.foreach { batch =>
            // batches are filters of a PK table → structurally one row/key
            val delta = graft.incremental.BucketedTrace.upsertStep(
              trace, batch, Seq("k"), assumeUnique = true)
            out = Some(out.map(_.unionByName(delta)).getOrElse(delta))
          }
          // integrate output deltas → the materialized PK table
          ZSets.toMultiset(ZSets.consolidate(out.get)).select("k", "v")
            .localCheckpoint(true)
        } finally trace.delete()
    },

    // Recursive view: transitive closure of a chain graph derived from
    // nation (src → src+5), vs DuckDB WITH RECURSIVE.
    Q(
      "rec_closure",
      """WITH RECURSIVE edges AS (
        |  SELECT n_nationkey AS src, n_nationkey + 5 AS dst FROM nation WHERE n_nationkey + 5 <= 24),
        |closure(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src)
        |SELECT src, dst FROM closure""".stripMargin) { (s, dir) =>
      val edges = t(s, dir, "nation")
        .filter(col("n_nationkey") + 5 <= 24)
        .select(col("n_nationkey").as("src"),
          (col("n_nationkey") + 5).as("dst"))
      Fixpoint.semiNaive(edges, delta =>
        delta.alias("c")
          .join(edges.alias("e"), col("c.dst") === col("e.src"))
          .select(col("c.src").as("src"), col("e.dst").as("dst")))
    },

    // Mutually recursive views (DECLARE RECURSIVE VIEW over two views,
    // DBSPNestedOperator.java:30; recursion.mdx): even/odd-distance
    // reachability from node 0 over a two-generator edge set. The Spark
    // side runs a true two-view joint fixpoint; DuckDB can't express
    // mutual CTEs, so the oracle is the parity-tagged single-CTE encoding.
    Q(
      "rec_mutual",
      """WITH RECURSIVE edges AS (
        |  SELECT n_nationkey AS src, n_nationkey + 5 AS dst FROM nation WHERE n_nationkey + 5 <= 24
        |  UNION ALL
        |  SELECT n_nationkey, n_nationkey + 7 FROM nation WHERE n_nationkey + 7 <= 24),
        |reach(n, p) AS (
        |  SELECT CAST(0 AS BIGINT), 0
        |  UNION
        |  SELECT e.dst, 1 - r.p FROM reach r JOIN edges e ON r.n = e.src)
        |SELECT DISTINCT n, CASE WHEN p = 0 THEN 'even' ELSE 'odd' END AS parity FROM reach""".stripMargin) { (s, dir) =>
      val nk = t(s, dir, "nation").select(col("n_nationkey").as("src"))
      val edges = nk.filter(col("src") + 5 <= 24)
          .select(col("src"), (col("src") + 5).as("dst"))
        .unionByName(nk.filter(col("src") + 7 <= 24)
          .select(col("src"), (col("src") + 7).as("dst")))
        .localCheckpoint(true)
      def hop(from: DataFrame): DataFrame =
        from.join(edges, from("n") === edges("src"))
          .select(edges("dst").as("n"))
      val seed = s.range(1).select(lit(0L).as("n"))
      val fp = Fixpoint.mutual(
        Map("even" -> seed, "odd" -> seed.limit(0)),
        Map("even" -> (st => hop(st.deltas("odd"))),
          "odd" -> (st => hop(st.deltas("even")))))
      fp("even").select(col("n"), lit("even").as("parity"))
        .unionByName(fp("odd").select(col("n"), lit("odd").as("parity")))
    }
  )
}
