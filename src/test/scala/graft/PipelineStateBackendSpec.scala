package graft

import org.apache.spark.sql.functions._

import graft.runtime.Pipeline
import graft.zset.ZSets

/** The runner's pluggable relation-state backend: a pipeline whose
  * table/view states ride the LSM-tiered trace produces step-for-step
  * identical output deltas to the default per-step-snapshot backend, and
  * its state writes spill past the memtable bound.
  */
class PipelineStateBackendSpec extends SparkSpec {
  import spark.implicits._

  private val programSql =
    """CREATE TABLE lineitem (
      |  l_orderkey BIGINT NOT NULL,
      |  l_quantity DOUBLE,
      |  l_returnflag VARCHAR
      |);
      |CREATE LOCAL VIEW restricted AS
      |  SELECT l_returnflag, l_quantity FROM lineitem WHERE l_quantity < 40;
      |CREATE MATERIALIZED VIEW qty_by_flag AS
      |  SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |         COUNT(*) AS n
      |  FROM restricted GROUP BY l_returnflag;""".stripMargin

  test("trace-backed relation state matches the default backend per step") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val deltas = Seq(
      ZSets.lift(li.filter(col("l_orderkey") % 2 === 0)),
      ZSets.lift(li.filter(col("l_orderkey") % 2 === 1)),
      ZSets.negate(ZSets.lift(li.filter(col("l_orderkey") % 10 === 0))))

    val default = Pipeline(spark, programSql)
    // traceMemRows tiny so the schedule CROSSES the spill: state lands in
    // bucketed parquet runs mid-run and reads keep working across tiers
    val traced = Pipeline(spark, programSql,
      Set("lineitem", "restricted", "qty_by_flag"), traceMemRows = 500L)
    try {
      deltas.zipWithIndex.foreach { case (d, i) =>
        val a = default.step(Map("lineitem" -> d))
        val b = traced.step(Map("lineitem" -> d))
        a.keySet.foreach { view =>
          val av = ZSets.consolidate(a(view)).collect().toSet
          val bv = ZSets.consolidate(b(view)).collect().toSet
          assert(av === bv, s"step $i view $view differs across backends")
        }
      }
      // final snapshots agree too (integration, not just deltas)
      val aSnap = default.snapshot("lineitem").get
      val bSnap = traced.snapshot("lineitem").get
      assert(ZSets.consolidate(aSnap).collect().toSet
        === ZSets.consolidate(bSnap).collect().toSet)
    } finally traced.close()
  }
}
