package graft

import org.apache.spark.sql.functions._

/** Plan hygiene for the round-2 queries: filters reach the parquet scan,
  * small sides broadcast, no stray cartesian products.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("fn_tail / fn_variant: pushed filters, single scan, codegen") {
    for (q <- Seq("fn_tail", "fn_variant")) {
      val p = plan(q)
      assert(p.contains("PushedFilters: [IsNotNull"), s"$q: filter not pushed")
      assert(!p.contains("CartesianProduct"), s"$q: unexpected cartesian")
      assert("\\*\\(\\d+\\)".r.findFirstIn(p).isDefined, s"$q: no codegen span")
    }
  }

  test("llm_embed_dups: banding equi-join, no cartesian, staged signatures") {
    val p = plan("llm_embed_dups")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"banding must be an equi-join, got:\n$p")
    assert(p.contains("InMemoryTableScan"), "signatures must be staged/persisted")
  }

  test("chainAggStep: broadcast split probe of prior state") {
    import spark.implicits._
    val st = Seq(("a", 1L, 9L)).toDF("k", "mn", "mx")
    val delta = Seq(("a", 5L), ("b", 2L)).toDF("k", "v")
    val p = graft.incremental.IncrementalOps.chainAggStep(Some(st), delta,
      Seq("k"), Seq(
        graft.incremental.IncrementalOps.ChainSpec("mn", col("v"), isMax = false),
        graft.incremental.IncrementalOps.ChainSpec("mx", col("v"), isMax = true)))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"touched-key probe should broadcast:\n$p")
  }
}
