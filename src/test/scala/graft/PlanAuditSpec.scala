package graft

import org.apache.spark.sql.functions._

/** Plan hygiene for the round-2 queries: filters reach the parquet scan,
  * small sides broadcast, no stray cartesian products.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("tpch suite: dims broadcast, date/brand filters pushed to scans, " +
      "no cartesians, top-k via TakeOrdered") {
    for (q <- Seq("tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q7",
      "tpch_q8", "tpch_q10", "tpch_q14", "tpch_q15", "tpch_q17",
      "tpch_q18", "tpch_q19")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: unexpected cartesian")
      assert(p.contains("PushedFilters: ["), s"$q: no pushed filters")
    }
    // the star-shaped queries must broadcast every dimension side
    for (q <- Seq("tpch_q5", "tpch_q7", "tpch_q8", "tpch_q10",
      "tpch_q14", "tpch_q19")) {
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q: dimension join should broadcast")
    }
    // date-range predicates reach the lineitem/orders parquet scans
    for (q <- Seq("tpch_q1", "tpch_q6"))
      assert(plan(q).contains("GreaterThan") || plan(q)
        .contains("LessThan"), s"$q: date filter not pushed")
    // q3/q10's LIMIT rides TakeOrderedAndProject, not a global sort
    for (q <- Seq("tpch_q3", "tpch_q10"))
      assert(plan(q).contains("TakeOrderedAndProject"),
        s"$q: top-k should be TakeOrderedAndProject")
  }

  test("tpch shape queries (q4/q11/q16/q21): semi/anti joins, " +
      "no cartesians, q21 top-k") {
    for (q <- Seq("tpch_q4", "tpch_q11", "tpch_q16", "tpch_q21",
      "tpch_q2", "tpch_q9", "tpch_q12", "tpch_q20")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: stray cartesian:\n$p")
      // q11's global threshold is a ONE-ROW broadcast compared non-equi
      // (the scalar-subquery shape — an O(n) probe of a 1-row build is
      // the right plan); everywhere else a nested-loop join is a bug
      if (q != "tpch_q11")
        assert(!p.contains("BroadcastNestedLoop"), s"$q: stray product:\n$p")
      assert(p.contains("PushedFilters: ["), s"$q: no pushed filters")
    }
    // the EXISTS/NOT-IN decorrelations must be semi/anti hash joins
    assert(plan("tpch_q4").contains("LeftSemi"),
      "q4: EXISTS should decorrelate to a semi join")
    val p16 = plan("tpch_q16")
    assert(p16.contains("LeftAnti"),
      "q16: NOT IN should be an anti join")
    val p21 = plan("tpch_q21")
    assert(p21.contains("LeftSemi") && p21.contains("LeftAnti"),
      "q21: EXISTS + NOT EXISTS should be semi + anti joins")
    assert(p21.contains("TakeOrderedAndProject"),
      "q21: top-100 should be TakeOrderedAndProject")
    // q2's correlated scalar-MIN decorrelates (no per-row subquery);
    // q20's nested IN chains become semi joins
    assert(plan("tpch_q2").contains("TakeOrderedAndProject"),
      "q2: top-100 should be TakeOrderedAndProject")
    assert(plan("tpch_q20").contains("LeftSemi"),
      "q20: IN chains should be semi joins")
  }

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

  test("llm_dsir: bucket table broadcasts onto the scan, no cartesian") {
    val p = plan("llm_dsir")
    assert(p.contains("BroadcastHashJoin"),
      s"the <=256-row bucket table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), s"llm_dsir: stray product:\n$p")
  }

  test("QUALIFY rank=1 lowering keeps the WindowGroupLimit pushdown") {
    import spark.implicits._
    Seq((1L, 1, 10.0), (2L, 1, 20.0), (3L, 2, 5.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
      .createOrReplaceTempView("qcust")
    val sql = graft.ddl.Dialect.normalize(
      """SELECT c_nationkey, c_custkey FROM qcust
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey) = 1""".stripMargin)
    val p = spark.sql(sql).queryExecution.executedPlan.toString
    // the lowered Filter(__q) must collapse back onto the rank so
    // Spark's WindowGroupLimit drops non-top rows BEFORE the full sort
    assert(p.contains("WindowGroupLimit"),
      s"QUALIFY rank filter lost the group-limit pushdown:\n$p")
  }

  test("llm_bm25: df table broadcasts, no cartesian from the totals join") {
    val p = plan("llm_bm25")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastExchange"),
      s"the |query|-row df table must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"llm_bm25: stray cartesian (the 1-row totals join must be a " +
        s"broadcast nested loop, never a shuffle product):\n$p")
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

  test("Tables.load rebalances only layout-starved single-row-group files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fanout").toString
    // single file, one row group, >=100k rows → rebalance fires
    (0L until 120000L).toDF("id").coalesce(1)
      .write.parquet(s"$dir/one.db")
    val f = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/one.db"))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    var pq: java.nio.file.Path = null
    while (f.hasNext) { val p = f.next()
      if (p.toString.endsWith(".parquet")) pq = p }
    java.nio.file.Files.copy(pq,
      java.nio.file.Paths.get(s"$dir/starved.parquet"))
    val starved = graft.Tables.load(spark, dir, "starved")
    assert(starved.queryExecution.optimizedPlan.toString
      .contains("RepartitionByExpression"),
      "single-row-group fact file should rebalance")
    // filters still reach the scan through the rebalance
    val filtered = starved.filter(col("id") === 5L)
      .queryExecution.executedPlan.toString
    assert(filtered.contains("PushedFilters: [IsNotNull(id), EqualTo(id,5)]"),
      s"pushdown must survive the rebalance:\n$filtered")
    // many row groups → production layout → NO exchange added
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1000")
    val manyDir = s"$dir/many.db"
    (0L until 120000L).toDF("id").coalesce(1)
      .write.option("parquet.block.size", "4096").parquet(manyDir)
    spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val f2 = java.nio.file.Files.list(java.nio.file.Paths.get(manyDir))
      .iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    var pq2: java.nio.file.Path = null
    while (f2.hasNext) { val p = f2.next()
      if (p.toString.endsWith(".parquet")) pq2 = p }
    java.nio.file.Files.copy(pq2,
      java.nio.file.Paths.get(s"$dir/healthy.parquet"))
    val healthy = graft.Tables.load(spark, dir, "healthy")
    assert(!healthy.queryExecution.optimizedPlan.toString
      .contains("RepartitionByExpression"),
      "a file with row groups >= cores must not pay an exchange")
  }

  test("windowing-TVF lowerings: TUMBLE narrow, HOP a generator, " +
      "SESSION at most two exchanges, no cartesians") {
    spark.range(0, 1000).selectExpr("id AS i", "CAST(id % 7 AS INT) AS k",
      "timestamp_seconds(1700000000 + id * 37) AS ts")
      .createOrReplaceTempView("e")
    def lowered(sql: String): String =
      spark.sql(graft.ddl.Dialect.normalize(sql))
        .queryExecution.executedPlan.toString
    // TUMBLE: a pure projection on the scan — no shuffle, no explode
    val pt = lowered("SELECT * FROM TABLE(TUMBLE(TABLE e, " +
      "DESCRIPTOR(ts), INTERVAL '1' HOUR))")
    assert(!pt.contains("Exchange") && !pt.contains("Generate"),
      s"tumble must stay a narrow projection:\n$pt")
    // HOP: the per-row window fan-out is a codegen'd Expand (inside the
    // same whole-stage span as the scan), still no shuffle
    val ph = lowered("SELECT * FROM TABLE(HOP(TABLE e, DESCRIPTOR(ts), " +
      "INTERVAL '30' MINUTE, INTERVAL '1' HOUR))")
    assert(!ph.contains("Exchange"), s"hop must not shuffle:\n$ph")
    assert(ph.contains("Expand"), "hop fan-out should be an Expand")
    // SESSION: one exchange per window tier (key, then key+sid), and
    // never a cartesian/nested-loop
    val ps = lowered("SELECT * FROM TABLE(SESSION(TABLE e, " +
      "DESCRIPTOR(ts), DESCRIPTOR(k), INTERVAL '30' SECOND))")
    assert(!ps.contains("CartesianProduct") &&
      !ps.contains("BroadcastNestedLoop"), s"session: stray join:\n$ps")
    assert("Exchange hashpartitioning".r.findAllIn(ps).size <= 2,
      s"session: more exchanges than the two window tiers:\n$ps")
  }
}
