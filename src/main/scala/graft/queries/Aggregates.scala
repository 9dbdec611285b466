package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import QB._

/** Aggregations (SURVEY §2.4). Reference: visitAggregate
  * CalciteToDBSPCompiler.java:948, AggregateCompiler.java.
  * All run as hash aggregates with map-side partial aggregation in Spark —
  * a single shuffle on the group keys, which is the minimal movement at
  * 100 TB. Global (no-GROUP-BY) aggregates reduce to one row per partition
  * before the final single-partition reduce.
  *
  * Determinism: double sums go through DECIMAL (exact) and come back as
  * DOUBLE; variance/stddev are computed from exact moment sums via a fixed
  * formula, so both engines evaluate identical IEEE expressions.
  */
object Aggregates {

  val queries: Seq[Q] = Seq(
    // Flagship: TPC-H Q1-style pricing summary. Linear aggregates
    // (reference: DBSPAggregateLinearPostprocessOperator.java:21).
    Q(
      "agg_linear",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  CAST(ROUND(SUM(${sqlDec("l_extendedprice")} * (1 - ${sqlDec("l_discount")})), 4) AS DOUBLE) AS sum_disc_price,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          // ROUND the exact scale-8 decimal sum to scale 4 BEFORE the
          // double cast: a scale-4 decimal of this magnitude converts to
          // double exactly in both engines, where the raw scale-8 value
          // hit a one-ulp divergence at sf0.1 (DuckDB converts decimals
          // as int128/10^s in floating point — two roundings — while
          // Spark's BigDecimal conversion rounds once)
          round(sum(dec(col("l_extendedprice"))
              * (lit(1) - dec(col("l_discount")))), 4)
            .cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // Global aggregate over an empty input: the AggregateZero contract
    // (DBSPAggregateZeroOperator.java:45) — COUNT()=0, SUM()=NULL, one row.
    Q(
      "agg_empty_zero",
      """SELECT COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s,
        |  MAX(l_returnflag) AS m
        |FROM lineitem WHERE l_quantity < 0""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_quantity") < 0)
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("s"),
          max(col("l_returnflag")).as("m"))
    },

    Q(
      "agg_minmax",
      """SELECT o_orderstatus,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
        |  MIN(CAST(o_orderdate AS DATE)) AS min_date,
        |  MAX(o_orderpriority) AS max_prio
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderstatus")
        .agg(
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_orderdate").cast("date")).as("min_date"),
          max(col("o_orderpriority")).as("max_prio"))
    },

    // VAR_SAMP / STDDEV_SAMP from exact moment sums (SURVEY §2.4 "linear
    // aggregates ... STDDEV/VAR via sum-of-squares"): both engines evaluate
    // the same closed-form over exact decimals — order-independent.
    Q(
      "agg_stats",
      """SELECT l_returnflag,
        |  COUNT(l_quantity) AS n,
        |  (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) * COUNT(l_quantity)
        |   - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE))
        |   / (COUNT(l_quantity) * (COUNT(l_quantity) - 1.0)) AS var_qty,
        |  SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) * COUNT(l_quantity)
        |   - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE))
        |   / (COUNT(l_quantity) * (COUNT(l_quantity) - 1.0))) AS std_qty,
        |  (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) * COUNT(l_quantity)
        |   - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE))
        |   / (COUNT(l_quantity) * CAST(COUNT(l_quantity) AS DOUBLE)) AS var_pop_qty,
        |  SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) * COUNT(l_quantity)
        |   - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE))
        |   / (COUNT(l_quantity) * CAST(COUNT(l_quantity) AS DOUBLE))) AS std_pop_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      // closed-form exact moments: the same decimal sums yield both the
      // sample (n−1) and population (n) variants — STDDEV_POP/VAR_POP of
      // the reference's aggregate set (aggregates.md)
      val q = dec(col("l_quantity"))
      val n = count(col("l_quantity"))
      val s1 = sum(q).cast("double")
      val s2 = sum(q * q).cast("double")
      val variance = (s2 * n - s1 * s1) / (n * (n - lit(1.0)))
      val varPop = (s2 * n - s1 * s1) / (n * n.cast("double"))
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(n.as("n"), variance.as("var_qty"), sqrt(variance).as("std_qty"),
          varPop.as("var_pop_qty"), sqrt(varPop).as("std_pop_qty"))
    },

    // BIT_AND/OR/XOR + BOOL_AND/OR (AggregateCompiler.java:231-240;
    // bool via counts in the reference — native in both engines here).
    Q(
      "agg_bit_bool",
      """SELECT p_brand,
        |  BIT_AND(p_size) AS size_and, BIT_OR(p_size) AS size_or,
        |  BIT_XOR(p_size) AS size_xor,
        |  BOOL_AND(p_retailprice > 500) AS all_mid,
        |  BOOL_OR(p_size > 40) AS any_large
        |FROM part GROUP BY p_brand""".stripMargin) { (s, dir) =>
      t(s, dir, "part").groupBy("p_brand")
        .agg(
          expr("bit_and(p_size)").as("size_and"),
          expr("bit_or(p_size)").as("size_or"),
          expr("bit_xor(p_size)").as("size_xor"),
          expr("bool_and(p_retailprice > 500)").as("all_mid"),
          expr("bool_or(p_size > 40)").as("any_large"))
    },

    // ARG_MAX/ARG_MIN (AggregateCompiler.java:487-492) → max_by/min_by.
    // The `by` key (c_custkey) is unique per group, so ties are impossible
    // and the result is deterministic.
    Q(
      "agg_argminmax",
      """SELECT c_nationkey,
        |  ARG_MAX(c_name, c_custkey) AS latest_customer,
        |  ARG_MIN(c_name, c_custkey) AS first_customer,
        |  ARG_MAX(c_custkey, c_acctbal + c_custkey * 1e-9) AS richest_key
        |FROM customer GROUP BY c_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").groupBy("c_nationkey")
        .agg(
          max_by(col("c_name"), col("c_custkey")).as("latest_customer"),
          min_by(col("c_name"), col("c_custkey")).as("first_customer"),
          max_by(col("c_custkey"),
            col("c_acctbal") + col("c_custkey") * lit(1e-9)).as("richest_key"))
    },

    // ARRAY_AGG (AggregateCompiler.java:352) — sorted for determinism.
    // The array column is emitted as a joined string: the driver's pandas
    // compare cannot hash ndarray cells, so both engines serialize the
    // sorted list identically.
    Q(
      "agg_array",
      """SELECT n_regionkey,
        |  array_to_string(list_sort(list(n_name)), ',') AS nations,
        |  COUNT(*) AS n FROM nation GROUP BY n_regionkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "nation").groupBy("n_regionkey")
          .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
            .as("nations"),
            count(lit(1)).as("n"))
    },

    // DISTINCT aggregates (Calcite AGGREGATE_EXPAND_DISTINCT_AGGREGATES,
    // CalciteOptimizer.java:379-382 — native in Spark).
    Q(
      "agg_distinct",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_dq,
        |  COUNT(DISTINCT l_linestatus) AS n_status
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          sum_distinct(dec(col("l_quantity"))).cast("double").as("sum_dq"),
          countDistinct(col("l_linestatus")).as("n_status"))
    },

    // COUNTIF / FILTER-ed aggregation (AggregateCompiler COUNTIF path).
    Q(
      "agg_filtered",
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(
          count_if(col("o_totalprice") > 100000).as("n_big"),
          sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice"))))
            .cast("double").as("sum_f"))
    },

    // GROUPING SETS (visitAggregate rollup handling,
    // CalciteToDBSPCompiler.java:945-985; PostgresGroupingSetsTests).
    Q(
      "agg_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
            |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
            |  COUNT(*) AS n,
            |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())""".stripMargin)
    },

    Q(
      "agg_rollup",
      """SELECT n_regionkey, n_nationkey, COUNT(*) AS n
        |FROM nation GROUP BY ROLLUP (n_regionkey, n_nationkey)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "nation").rollup("n_regionkey", "n_nationkey")
          .agg(count(lit(1)).as("n"))
    },

    Q(
      "agg_cube",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem").cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"))
    },

    // SINGLE_VALUE guard via scalar subquery (AggregateCompiler.java:615).
    Q(
      "agg_scalar_subquery",
      s"""SELECT c_custkey, c_acctbal,
         |  c_acctbal - (SELECT ${sqlDavg("c_acctbal")} FROM customer) AS delta
         |FROM customer WHERE c_acctbal > 9000""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(
        s"""SELECT c_custkey, c_acctbal,
           |  c_acctbal - (SELECT ${sqlDavg("c_acctbal")} FROM customer) AS delta
           |FROM customer WHERE c_acctbal > 9000""".stripMargin)
    }
  )
}
