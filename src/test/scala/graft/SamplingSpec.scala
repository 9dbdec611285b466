package graft

import org.apache.spark.sql.functions._
import graft.llm.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong)
    .map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "src")

  test("hashSample is deterministic and partitioning-independent") {
    val df = ids(2000)
    val a = Sampling.hashSample(df, "id", 0.3).select("id")
      .as[Long].collect().sorted
    val b = Sampling.hashSample(df.repartition(13), "id", 0.3).select("id")
      .as[Long].collect().sorted
    assert(a.sameElements(b))
    // rate is approximately honored
    assert(math.abs(a.length / 2000.0 - 0.3) < 0.05)
  }

  test("stratifiedSample honors per-stratum rates") {
    val out = Sampling.stratifiedSample(ids(3000), "src", "id",
      rates = Map("a" -> 1.0), defaultRate = 0.1)
    val byStratum = out.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(byStratum("a") === 1000L) // rate 1.0 keeps every row
    assert(math.abs(byStratum("b") / 2000.0 - 0.1) < 0.05)
  }

  test("topKPerStratum returns exactly k rows per stratum, stable") {
    val out = Sampling.topKPerStratum(ids(500), "src", "id", k = 7)
    val counts = out.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(counts === Map("a" -> 7L, "b" -> 7L))
    val again = Sampling.topKPerStratum(ids(500).repartition(11),
      "src", "id", k = 7).select("id").as[Long].collect().sorted
    assert(again.sameElements(
      out.select("id").as[Long].collect().sorted))
  }

  test("sampling filters are stateless: no exchange in the plan") {
    val plan = Sampling.stratifiedSample(ids(100), "src", "id",
      rates = Map("a" -> 0.5), defaultRate = 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"stratified sample must not shuffle:\n$plan")
  }

  test("topKPerStratum compiles to WindowGroupLimit (rank pushdown)") {
    val plan = Sampling.topKPerStratum(ids(100), "src", "id", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"row_number <= k must push the group limit below the shuffle:\n$plan")
  }

  test("shardAssign: dense 0-based positions per shard, layout-independent") {
    val df = ids(200)
    val a = Sampling.shardAssign(df, "id", nShards = 4)
    val b = Sampling.shardAssign(df.repartition(13), "id", nShards = 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val byShard = a.select("shard", "pos").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    // positions are exactly 0..n-1 within every shard — the contract a
    // shard writer needs to lay rows out without gaps or collisions
    byShard.foreach { case (_, ps) => assert(ps === (0L until ps.length)) }
    assert(byShard.values.map(_.length).sum === 200)
  }

  test("unigramScore: exact integer corpus frequencies and rare fraction") {
    import graft.llm.TextAnalysis
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "zyx")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramScore(docs, "doc_id", "text", rareMax = 1L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "sum_cf", "rare_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // corpus cf: the=3, cat=1, sat=2, on=1, mat=1, dog=1, zyx=1
    assert(out === Seq(
      (1L, 6L, 3L + 1 + 2 + 1 + 3 + 1, 3.0 / 6),   // rare: cat, on, mat
      (2L, 3L, 3L + 1 + 2, 1.0 / 3),                // rare: dog
      (3L, 1L, 1L, 1.0)))
  }

  test("mixToProportions hits target mix, most-constrained stratum whole") {
    // 1000 "a" rows, 2000 "b" rows; target 50/50 -> all of "a", ~1000 of "b"
    val out = Sampling.mixToProportions(ids(3000), "src", "id",
      weightsPpm = Map("a" -> 500000L, "b" -> 500000L))
    val counts = out.groupBy("src").count().as[(String, Long)]
      .collect().toMap
    assert(counts("a") === 1000L)
    assert(math.abs(counts("b") - 1000L) < 100)
  }
}
