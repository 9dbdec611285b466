package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import QB._

/** Window functions, TopK, sort/limit (SURVEY §2.6). Reference:
  * visitWindow CalciteToDBSPCompiler.java:2670;
  * DBSPIndexedTopKOperator.java:29; group/row_number.rs, lag.rs, topk.rs.
  *
  * Determinism: every ORDER BY carries a unique tiebreaker so ranks and
  * frames are total-ordered. Window execution = one shuffle on the
  * partition key + sort within partitions; rank-filter TopK prunes with a
  * partial sort at scale (Spark's WindowGroupLimit pushes `rank <= k`
  * down — the same optimization as the reference's IndexedTopK).
  */
object Windows {

  val queries: Seq[Q] = Seq(
    // TopK per group: rank customers by balance within nation, keep top 3.
    Q(
      "win_topk",
      """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer) WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
    },

    // RANK / DENSE_RANK / PERCENT_RANK / NTILE / CUME_DIST with ties:
    // rank functions are order-deterministic even with ties; ntile needs
    // the unique tiebreaker.
    Q(
      "win_ranks",
      """SELECT o_orderkey,
        |  RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS rk,
        |  DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS drk,
        |  PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS prk,
        |  NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS tile,
        |  CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS cd
        |FROM orders WHERE o_orderkey <= 30000""".stripMargin) { (s, dir) =>
      val byStatus = Window.partitionBy("o_orderpriority")
        .orderBy("o_orderstatus")
      val byPrice = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      t(s, dir, "orders").filter(col("o_orderkey") <= 30000)
        .select(col("o_orderkey"),
          rank().over(byStatus).cast("long").as("rk"),
          dense_rank().over(byStatus).cast("long").as("drk"),
          percent_rank().over(byPrice).as("prk"),
          ntile(4).over(byPrice).cast("long").as("tile"),
          cume_dist().over(byPrice).as("cd"))
    },

    // LAG/LEAD with offsets and defaults (DBSPLagOperator.java:24).
    Q(
      "win_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice, 1, -1.0) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  LEAD(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next2_price
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
        "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1, -1.0).over(w).as("prev_price"),
          lead(col("o_totalprice"), 2).over(w).as("next2_price"))
    },

    // FIRST_VALUE / LAST_VALUE over explicit frames.
    Q(
      "win_first_last",
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_price,
        |  LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
        "o_orderkey")
      val wAll = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(wAll).as("last_price"))
    },

    // Running totals: ROWS frame, exact decimal prefix sums.
    Q(
      "win_running_sum",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow))
            .cast("double").as("running_spend"),
          row_number().over(w).cast("long").as("order_seq"))
    },

    // Rolling aggregate over RANGE INTERVAL PRECEDING (reference:
    // DBSPPartitionedRollingAggregateOperator.java:30,
    // time_series/rolling_aggregate.rs). RANGE frames include peers
    // regardless of row order → deterministic without a tiebreaker.
    Q(
      "win_rolling_range",
      """SELECT o_custkey, o_orderkey,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS n_90d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_90d
        |FROM orders""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_custkey, o_orderkey,
          |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
          |    RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS n_90d,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
          |    RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_90d
          |FROM orders""".stripMargin)
    },

    // Global ORDER BY + LIMIT (reference: TopK with unit partition,
    // DBSPIndexedTopKOperator doc:26-28). Spark plans TakeOrderedAndProject
    // — no full sort at scale.
    Q(
      "sort_limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
          .select("o_orderkey", "o_totalprice")
    },

    // Window aggregate mixing with group-level values (SUM OVER after
    // GROUP BY) — share-of-total per nation.
    Q(
      "win_share",
      """SELECT c_nationkey, n,
        |  n / CAST(SUM(n) OVER () AS DOUBLE) AS share
        |FROM (SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY c_nationkey)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").groupBy("c_nationkey")
          .agg(count(lit(1)).as("n"))
          .select(col("c_nationkey"), col("n"),
            (col("n") / sum(col("n")).over(Window.partitionBy())
              .cast("double")).as("share"))
    }
  )
}
