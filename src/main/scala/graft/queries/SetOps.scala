package graft.queries

import org.apache.spark.sql.functions._
import QB._

/** Set operations and DISTINCT (SURVEY §2.5). Reference:
  * DBSPSumOperator.java:41 (Z-set sum = UNION ALL),
  * DBSPSubtractOperator.java:40, DBSPDistinctOperator.java:39,
  * visitIntersect CalciteToDBSPCompiler.java:2450.
  * In Spark these are native operators; EXCEPT/INTERSECT [ALL] plan as
  * hash aggregates or sort-merge under one shuffle.
  */
object SetOps {

  private def custNations = """SELECT c_nationkey AS nk FROM customer"""
  private def suppNations = """SELECT s_nationkey AS nk FROM supplier"""

  val queries: Seq[Q] = Seq(
    Q(
      "setop_union_all",
      s"""SELECT nk, COUNT(*) AS n FROM ($custNations UNION ALL $suppNations) GROUP BY nk""") {
      (s, dir) =>
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        val su = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
        c.unionAll(su).groupBy("nk").agg(count(lit(1)).as("n"))
    },

    Q(
      "setop_union",
      s"""$custNations UNION $suppNations""") { (s, dir) =>
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.union(su).distinct()
    },

    Q(
      "setop_except",
      """SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000""".stripMargin) {
      (s, dir) =>
        val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .select(col("c_nationkey").as("nk"))
        val su = t(s, dir, "supplier").filter(col("s_acctbal") > 5000)
          .select(col("s_nationkey").as("nk"))
        c.except(su)
    },

    Q(
      "setop_except_all",
      """SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
        |EXCEPT ALL
        |SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'""".stripMargin) {
      (s, dir) =>
        val l = t(s, dir, "lineitem")
        val a = l.filter(col("l_returnflag") === "R")
          .select(col("l_suppkey").as("k"))
        val b = l.filter(col("l_returnflag") === "A")
          .select(col("l_suppkey").as("k"))
        a.exceptAll(b)
    },

    Q(
      "setop_intersect",
      s"""$custNations INTERSECT $suppNations""") { (s, dir) =>
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val su = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      c.intersect(su)
    },

    Q(
      "setop_intersect_all",
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'""".stripMargin) {
      (s, dir) =>
        val o = t(s, dir, "orders")
        val a = o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("k"))
        val b = o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("k"))
        a.intersectAll(b)
    },

    Q(
      "distinct_rows",
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer""") {
      (s, dir) =>
        t(s, dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
    }
  )
}
