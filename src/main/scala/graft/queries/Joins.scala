package graft.queries

import org.apache.spark.sql.functions._
import QB._

/** Joins (SURVEY §2.3). Reference: visitJoin
  * CalciteToDBSPCompiler.java:1553, runtime crates/dbsp/src/operator/join.rs.
  *
  * Scale notes: dimension tables (region/nation/customer/supplier/part) are
  * broadcast — no shuffle of the fact side; fact-fact joins (lineitem ⋈
  * orders) shuffle once on the join key and AQE handles skew. Theta
  * conditions ride on an equi-join + post-filter, exactly the reference's
  * DBSPJoinFilterMapOperator shape.
  */
object Joins {

  val queries: Seq[Q] = Seq(
    Q(
      "join_inner",
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
         |  ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
    },

    // Outer joins (DBSPLeftJoinOperator.java:21; join.rs:215,396). The
    // customer side keeps rows with no orders → null-padded aggregates.
    Q(
      "join_left",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_spent
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("o_custkey") === col("c_custkey"),
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_spent"))
    },

    Q(
      "join_right",
      """SELECT c_custkey, c_name, o_orderkey
        |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey AND o_totalprice > 400000""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey")
              && col("o_totalprice") > 400000,
            "right_outer")
          .select("c_custkey", "c_name", "o_orderkey")
    },

    // Full outer over two disjoint-ish aggregated sides.
    Q(
      "join_full",
      """SELECT snk, cnk, n_supp, n_cust FROM
        |  (SELECT s_nationkey AS snk, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) a
        |FULL JOIN
        |  (SELECT c_nationkey AS cnk, COUNT(*) AS n_cust FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey) b
        |ON snk = cnk""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("n_supp"))
      val b = t(s, dir, "customer").filter(col("c_acctbal") > 9900)
        .groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("n_cust"))
      a.join(b, col("snk") === col("cnk"), "full_outer")
        .select("snk", "cnk", "n_supp", "n_cust")
    },

    // Semi/anti joins (semijoin.rs:28; DBSPAntiJoinOperator.java:19).
    Q(
      "join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").filter(col("o_totalprice") > 300000),
            col("o_custkey") === col("c_custkey"), "left_semi")
          .select("c_custkey", "c_name")
    },

    Q(
      "join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").filter(col("o_totalprice") > 350000),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .select("c_custkey", "c_name")
    },

    // Cross join (degenerate equi-join with unit key in the reference).
    Q(
      "join_cross",
      """SELECT r_name, n_name FROM region CROSS JOIN nation""".stripMargin) {
      (s, dir) =>
        t(s, dir, "region").crossJoin(t(s, dir, "nation"))
          .select("r_name", "n_name")
    },

    // Range join: equi-key + interval condition (nexmark q4 pattern,
    // SURVEY §2.3 "Range/interval join").
    Q(
      "join_range",
      """SELECT o_orderkey, COUNT(*) AS n_early,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_early
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate").between(col("o_orderdate"),
              col("o_orderdate") + expr("INTERVAL 30 DAY")))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_early"),
          dsum(col("l_extendedprice")).as("sum_early"))
    },

    // Pure theta (non-equi) join on small inputs.
    Q(
      "join_theta",
      """SELECT a.r_regionkey AS rk_lo, b.r_regionkey AS rk_hi
        |FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey""".stripMargin) {
      (s, dir) =>
        val a = t(s, dir, "region").select(col("r_regionkey").as("rk_lo"))
        val b = t(s, dir, "region").select(col("r_regionkey").as("rk_hi"))
        a.join(b, col("rk_lo") < col("rk_hi"))
    },

    // ASOF join: latest purchase at-or-before each error event per user.
    // Build side deduped to unique (user_id, ts). Oracle uses DuckDB's
    // native ASOF JOIN; ours is graft.ops.AsofJoin (single window pass).
    Q(
      "join_asof",
      """SELECT e.event_id, e.user_id, p.purchase_val
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS purchase_val
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
        |ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val probe = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val build = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max(dec(col("value"))).cast("double").as("purchase_val"))
      graft.ops.AsofJoin
        .backward(probe, build, Seq("user_id"), "ts", "ts",
          Seq("purchase_val"))
        .select("event_id", "user_id", "purchase_val")
    },

    // Star join (DBSPStarJoinOperator / CreateStarJoins — Catalyst
    // broadcast + join reorder): revenue by region and year.
    Q(
      "join_star",
      """SELECT r_name, CAST(YEAR(o_orderdate) AS INT) AS order_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, CAST(YEAR(o_orderdate) AS INT)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
          .agg(
            sum(dec(col("l_extendedprice"))
              * (lit(1) - dec(col("l_discount")))).cast("double")
              .as("revenue"),
            count(lit(1)).as("n_items"))
    },

    // Correlated subquery (decorrelated by Catalyst, as Calcite does in the
    // reference — InnerDecorrelator, CalciteOptimizer.java:335).
    Q(
      "join_correlated",
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (
        |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(o2.o_totalprice) * 1.8
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderkey, o_totalprice FROM orders o
            |WHERE o_totalprice > (
            |  SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(o2.o_totalprice) * 1.8
            |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)""".stripMargin)
    }
  )
}
