package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.incremental.IncrementalOps
import graft.incremental.IncrementalOps.LinearAggSpec
import graft.zset.ZSets

/** Incremental-vs-batch equivalence on controlled inputs with interleaved
  * retractions (mirrors the reference's SLT `-inc` mode,
  * sql-to-dbsp-compiler/README.md:147).
  */
class IncrementalOpsSpec extends SparkSpec {
  import spark.implicits._

  // three delta batches over (k, v): inserts then a retraction of (a, 10)
  private def batches: Seq[DataFrame] = Seq(
    Seq(("a", 10L, 1L), ("a", 20L, 1L), ("b", 5L, 1L)),
    Seq(("b", 7L, 1L), ("a", 10L, 1L)), // duplicate row (a,10) again
    Seq(("a", 10L, -1L), ("c", 2L, 1L)) // retract one copy of (a,10)
  ).map(_.toDF("k", "v", ZSets.W))

  // final snapshot: a→{10,20}, b→{5,7}, c→{2}
  private val finalRows = Seq(("a", 10L), ("a", 20L), ("b", 5L),
    ("b", 7L), ("c", 2L))

  test("linearAggStep equals batch sum/count after retraction") {
    val state = batches.foldLeft(Option.empty[DataFrame]) { (st, d) =>
      Some(IncrementalOps.linearAggStep(st, d, Seq("k"),
        Seq(LinearAggSpec("s", col("v")))))
    }.get
    val got = state.select("k", "s", "_cnt").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val exp = finalRows.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.map(_._2).sum, vs.size.toLong))
    }
    assert(got === exp)
  }

  test("linearAggStep drops groups whose multiset empties") {
    val d1 = Seq(("x", 1L, 1L)).toDF("k", "v", ZSets.W)
    val d2 = Seq(("x", 1L, -1L)).toDF("k", "v", ZSets.W)
    val st1 = IncrementalOps.linearAggStep(None, d1, Seq("k"),
      Seq(LinearAggSpec("s", col("v"))))
    val st2 = IncrementalOps.linearAggStep(Some(st1), d2, Seq("k"),
      Seq(LinearAggSpec("s", col("v"))))
    assert(st2.count() === 0)
  }

  test("generalAggStep min/max correct under retraction of the extremum") {
    val d1 = Seq(("a", 10L, 1L), ("a", 99L, 1L)).toDF("k", "v", ZSets.W)
    val d2 = Seq(("a", 99L, -1L)).toDF("k", "v", ZSets.W) // retract the max
    val r1 = IncrementalOps.generalAggStep(None, d1, Seq("k"),
      Seq(min(col("v")).as("mn"), max(col("v")).as("mx")))
    assert(r1.rows.as[(String, Long, Long)].collect() === Array(("a", 10L, 99L)))
    val r2 = IncrementalOps.generalAggStep(Some(r1.state), d2, Seq("k"),
      Seq(min(col("v")).as("mn"), max(col("v")).as("mx")))
    assert(r2.rows.as[(String, Long, Long)].collect() === Array(("a", 10L, 10L)))
    assert(r2.deletedGroups.count() === 0)
  }

  test("generalAggStep reports groups whose multiset empties as deleted") {
    val d1 = Seq(("a", 10L, 1L), ("b", 5L, 1L)).toDF("k", "v", ZSets.W)
    val d2 = Seq(("a", 10L, -1L)).toDF("k", "v", ZSets.W) // empty group a
    val r1 = IncrementalOps.generalAggStep(None, d1, Seq("k"),
      Seq(max(col("v")).as("mx")))
    val r2 = IncrementalOps.generalAggStep(Some(r1.state), d2, Seq("k"),
      Seq(max(col("v")).as("mx")))
    assert(r2.rows.count() === 0) // no surviving rows for touched group a
    assert(r2.deletedGroups.as[String].collect() === Array("a"))
    // untouched group b is still in state
    assert(r2.state.filter(col("k") === "b").count() === 1)
  }

  test("chainAggStep: append-only min/max equals batch, one row per group") {
    val batches = Seq(
      Seq(("a", 5L), ("a", 9L), ("b", 2L)),
      Seq(("a", 1L), ("b", 7L)),
      Seq(("c", 4L)))
    val specs = Seq(
      IncrementalOps.ChainSpec("mn", col("v"), isMax = false),
      IncrementalOps.ChainSpec("mx", col("v"), isMax = true))
    val state = batches.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (st, rows) =>
        Some(IncrementalOps.chainAggStep(st, rows.toDF("k", "v"),
          Seq("k"), specs).localCheckpoint(true))
    }.get
    val got = state.orderBy("k").as[(String, Long, Long)].collect()
    assert(got === Array(("a", 1L, 9L), ("b", 2L, 7L), ("c", 4L, 4L)))
    // state is exactly one row per group — no multiset retained
    assert(state.count() === 3)
  }

  test("distinctStep emits only sign transitions") {
    val d1 = Seq(("a", 1L), ("a", 1L), ("b", 1L)).toDF("k", ZSets.W)
    val (st1, o1) = IncrementalOps.distinctStep(None, d1)
    assert(o1.as[(String, Long)].collect().toMap ===
      Map("a" -> 1L, "b" -> 1L))
    // removing ONE copy of a (still one left) emits nothing for a;
    // removing b emits -1
    val d2 = Seq(("a", -1L), ("b", -1L)).toDF("k", ZSets.W)
    val (_, o2) = IncrementalOps.distinctStep(Some(st1), d2)
    assert(o2.as[(String, Long)].collect().toMap === Map("b" -> -1L))
  }

  test("upsertStep: overwrite, delete, and delete-then-reinsert") {
    import org.apache.spark.sql.DataFrame
    def batch(rows: Seq[(Long, Option[Long], Boolean)]): DataFrame =
      rows.toDF("k", "v", "_deleted")
    var st = Option.empty[DataFrame]
    var deltas = List.empty[Set[(Long, Option[Long], Long)]]
    def step(rows: Seq[(Long, Option[Long], Boolean)]): Unit = {
      val (s2, d) = IncrementalOps.upsertStep(st, batch(rows), Seq("k"))
      st = Some(s2.localCheckpoint(true))
      deltas = deltas :+ d.as[(Long, Option[Long], Long)].collect().toSet
    }
    step(Seq((1L, Some(10L), false), (2L, Some(20L), false)))
    step(Seq((1L, Some(11L), false), (2L, None, true)))   // overwrite + delete
    step(Seq((2L, Some(22L), false)))                     // re-insert
    step(Seq((1L, Some(11L), false)))                     // no-op upsert
    assert(deltas(0) === Set((1L, Some(10L), 1L), (2L, Some(20L), 1L)))
    assert(deltas(1) === Set((1L, Some(10L), -1L), (1L, Some(11L), 1L),
      (2L, Some(20L), -1L)))
    assert(deltas(2) === Set((2L, Some(22L), 1L)))
    assert(deltas(3) === Set.empty)
    assert(st.get.select("k", "v").as[(Long, Long)].collect().toSet
      === Set((1L, 11L), (2L, 22L)))
  }

  test("joinStep integrates to the batch join") {
    val a1 = Seq((1L, "a1", 1L), (2L, "a2", 1L)).toDF("k", "av", ZSets.W)
    val b1 = Seq((1L, "b1", 1L)).toDF("k", "bv", ZSets.W)
    val a2 = Seq((3L, "a3", 1L), (1L, "a1", -1L)).toDF("k", "av", ZSets.W)
    val b2 = Seq((2L, "b2", 1L), (3L, "b3", 1L)).toDF("k", "bv", ZSets.W)
    var (ast, bst) = (Option.empty[DataFrame], Option.empty[DataFrame])
    var out = Option.empty[DataFrame]
    Seq((a1, b1), (a2, b2)).foreach { case (da, db) =>
      val (na, nb, d) = IncrementalOps.joinStep(ast, bst, da, db, Seq("k"))
      ast = Some(na); bst = Some(nb)
      out = Some(out.map(_.unionByName(d)).getOrElse(d))
    }
    val integrated = ZSets.consolidate(out.get)
      .select("k", "av", "bv", ZSets.W).as[(Long, String, String, Long)]
      .collect().toSet
    // final A = {(2,a2),(3,a3)}, B = {(1,b1),(2,b2),(3,b3)} → join on k
    assert(integrated === Set((2L, "a2", "b2", 1L), (3L, "a3", "b3", 1L)))
  }

  test("upsertStep: last-write-wins within a batch via seqCol") {
    val b1 = Seq((1L, "a", false, 1L), (1L, "b", false, 2L),
      (2L, "x", false, 1L)).toDF("k", "v", "_deleted", "_seq")
    val (st1, d1) = IncrementalOps.upsertStep(None, b1, Seq("k"),
      seqCol = Some("_seq"))
    assert(st1.select("k", "v").as[(Long, String)].collect().toSet
      === Set((1L, "b"), (2L, "x")))
    assert(d1.as[(Long, String, Long)].collect().toSet
      === Set((1L, "b", 1L), (2L, "x", 1L)))
    // update then delete the same key in one batch: the delete wins
    val b2 = Seq((1L, Some("c"), false, 1L), (1L, None, true, 2L))
      .toDF("k", "v", "_deleted", "_seq")
    val (st2, d2) = IncrementalOps.upsertStep(
      Some(st1.localCheckpoint(true)), b2, Seq("k"), seqCol = Some("_seq"))
    assert(st2.select("k", "v").as[(Long, String)].collect().toSet
      === Set((2L, "x")))
    assert(d2.as[(Long, Option[String], Long)].collect().toSet
      === Set((1L, Some("b"), -1L)))
  }

  test("upsertStep: duplicate keys without seqCol fail fast, unique pass") {
    val dup = Seq((1L, "a", false), (1L, "b", false)).toDF("k", "v", "_deleted")
    val ex = intercept[Throwable] {
      IncrementalOps.upsertStep(None, dup, Seq("k"))._1.count()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: chain(t.getCause)
    assert(chain(ex).exists(_.contains("upsert batch carries")),
      s"unexpected failure: ${chain(ex)}")
    // unique keys sail through the guard unchanged
    val ok = Seq((1L, "a", false), (2L, "b", false)).toDF("k", "v", "_deleted")
    val (st, _) = IncrementalOps.upsertStep(None, ok, Seq("k"))
    assert(st.count() === 2)
  }

  test("delta broadcast hint is size-gated: huge deltas fall back") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      IncrementalOps.maybeBroadcast(df).queryExecution.analyzed
        .collectFirst { case h: ResolvedHint => h }.nonEmpty
    assert(hinted(spark.range(10).toDF("k")))
    // a multi-GB LEAF estimate drops the hint; a derived plan over small
    // leaves keeps it even when the join-product estimate explodes
    assert(!hinted(spark.range(1L << 30).toDF("a")))
    assert(hinted(spark.range(1L << 10).toDF("a")
      .crossJoin(spark.range(1L << 10).toDF("b"))))
  }
}
