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

  test("bigramScore: exact bigram frequencies and pooled conditional p") {
    import graft.llm.TextAnalysis
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramScore(docs, "doc_id", "text", rareMax = 1L)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "sum_bf", "rare_frac", "cond_p")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // corpus bigram cf: (a b)=3, (b a)=1, (b c)=1; unigram cf: a=3, b=3,
    // c=1, x=1. doc 3 has one token -> no bigrams -> absent.
    assert(out === Seq(
      // doc 1: bigrams (a b),(b a),(a b): sum_bf 3+1+3; rare (b a);
      //   denom uf(a)+uf(b)+uf(a) = 9
      (1L, 3L, 7L, 1.0 / 3, 7.0 / 9),
      // doc 2: (a b),(b c): sum_bf 3+1; rare (b c); denom uf(a)+uf(b) = 6
      (2L, 2L, 4L, 1.0 / 2, 4.0 / 6)))
  }

  test("splitAssign: deterministic, layout-independent, quarantine wins") {
    val df = ids(2000).withColumn("flag", col("id") % 100 === 0)
    val a = Sampling.splitAssign(df, "id", seed = 3, trainPct = 80,
      valPct = 10, quarantine = col("flag"))
    val b = Sampling.splitAssign(df.repartition(17), "id", seed = 3,
      trainPct = 80, valPct = 10, quarantine = col("flag"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val rows = a.select("id", "bucket", "split")
      .as[(Long, Long, String)].collect()
    // flagged rows are quarantined regardless of their hash bucket
    assert(rows.filter(_._1 % 100 == 0).forall(_._3 == "quarantine"))
    // unflagged rows follow the bucket thresholds exactly
    rows.filterNot(_._1 % 100 == 0).foreach { case (_, bkt, s) =>
      val want = if (bkt < 80) "train" else if (bkt < 90) "val" else "test"
      assert(s === want)
    }
    // rough proportions hold (hash uniformity)
    val frac = rows.count(_._3 == "train") / 2000.0
    assert(math.abs(frac - 0.8 * 0.99) < 0.05)
    // growing the corpus never moves an existing row between splits
    val grown = Sampling.splitAssign(ids(4000).withColumn("flag",
        col("id") % 100 === 0), "id", seed = 3, trainPct = 80,
      valPct = 10, quarantine = col("flag"))
      .filter(col("id") <= 2000).select("id", "bucket", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(grown === rows.sortBy(_._1))
  }

  test("splitAssign is a stateless projection: no exchange in the plan") {
    val plan = Sampling.splitAssign(ids(100), "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"split assignment must not shuffle:\n$plan")
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

  test("mixToProportionsByWeight targets the token budget, not doc count") {
    // stratum a: 1000 docs × 10 tokens; stratum b: 2000 docs × 40 tokens.
    // Token mix 50/50 -> all of a (10k tokens), ~10k of b's 80k tokens —
    // i.e. ~1/8 of b's DOCS, where a doc-count mix would keep ~1/2.
    val df = ids(3000).withColumn("ntok",
      when(col("src") === "a", 10L).otherwise(40L))
    val out = Sampling.mixToProportionsByWeight(df, "src", "id", "ntok",
      weightsPpm = Map("a" -> 500000L, "b" -> 500000L))
    val kept = out.groupBy("src").agg(
        count(lit(1)).as("docs"), sum("ntok").as("toks"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(kept("a")._3 === 10000L) // most-constrained stratum kept whole
    assert(math.abs(kept("b")._3 - 10000L) < 1500)
    assert(kept("b")._2 < 400) // far fewer docs than a doc-count mix
  }
}
