package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

class LlmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different words about spark catalyst optimizer plans and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical canonical texts") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("sequence packing: deterministic bins that respect the budget rule") {
    import graft.llm.Packing
    val docs = spark.range(500).select(col("id").as("doc_id"),
      (col("id") % 97 + 10).as("n_tokens"))
    val p1 = Packing.packBins(docs, "doc_id", "n_tokens",
      budget = 256L, nBuckets = 4)
    // partitioning-independent: a different physical layout packs the same
    val p2 = Packing.packBins(docs.repartition(13), "doc_id", "n_tokens",
      budget = 256L, nBuckets = 4)
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty)
    val rows = p1.select("bucket", "bin", "n_tokens", "tok_before")
      .as[(Long, Long, Long, Long)].collect()
    // the defining invariant: bin = floor(tok_before / budget)
    assert(rows.forall { case (_, bin, _, before) => bin == before / 256 })
    // packing actually fills bins (more than one doc per bin on average)
    val binCount = rows.map { case (bu, bi, _, _) => (bu, bi) }.distinct.length
    assert(binCount < rows.length / 2, s"bins=$binCount docs=${rows.length}")
  }

  test("token chunking: sizes, overlap, and short-doc edge") {
    import graft.llm.Packing
    val toks = (1 to 100).map(i => s"t$i")
    val out = spark.range(1)
      .select(explode(Packing.chunkTokens(
        lit(toks.toArray), size = 30, overlap = 10)).as("c"))
      .select(col("c.chunk_id"), col("c.text")).as[(Long, String)]
      .collect().sortBy(_._1)
    // 100 tokens, size 30, step 20 → 1 + ceil(70/20) = 5 chunks
    assert(out.length === 5)
    assert(out.head._2.startsWith("t1 ") && out.head._2.endsWith(" t30"))
    assert(out(1)._2.startsWith("t21 ")) // 10-token overlap
    assert(out.last._2.endsWith(" t100")) // tail covered, shorter chunk
    // shorter than one chunk → exactly one chunk with everything
    val short = spark.range(1)
      .select(explode(Packing.chunkTokens(
        lit(Array("a", "b")), 30, 10)).as("c"))
      .select(col("c.text")).as[String].collect()
    assert(short.toSeq === Seq("a b"))
  }

  test("Karp-Rabin rolling fingerprint: order-sensitive, whitespace-stable") {
    def fp(txt: String): Long = spark.range(1)
      .select(Dedup.rollingFingerprint(TextAnalysis.tokens(lit(txt))))
      .head().getLong(0)
    assert(fp("a b c") !== fp("b a c"))   // order matters (vs set hashes)
    assert(fp("a b c") === fp("a  b \t c")) // tokenization absorbs runs
    assert(fp("") === 7L)                  // empty fold = init constant
    assert(fp("中文 token") === fp("中文  token")) // codepoint arithmetic
  }

  test("minhash estimate tracks true jaccard (near-dups high, unrelated low)") {
    val sigs = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 3, 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    def est(a: Long, b: Long) =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 64.0
    assert(est(1L, 4L) === 1.0)         // identical docs
    assert(est(1L, 2L) > 0.5)           // near-dup: one token differs
    assert(est(1L, 3L) < 0.2)           // unrelated
  }

  test("minhashDupPairs surfaces the near-dup and exact-dup pairs") {
    val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
      w = 3, numHashes = 16, bands = 8)
      .select("id_a", "id_b", "est_jaccard")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 4L)) === 1.0)
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    val fps = docs.select(col("doc_id"),
      Dedup.simhash(col("text"), 48).as("fp")).as[(Long, Long)]
      .collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fps(a) ^ fps(b))
    assert(ham(1L, 4L) === 0)
    assert(ham(1L, 2L) < 10)
    assert(ham(1L, 3L) > 10)
  }

  test("ngram jaccard: exact dup 1.0, near-dup high, unrelated 0") {
    val g = docs.select(col("doc_id"), Dedup.ngramSet(col("text"), 2).as("gs"))
    val a = g.select(col("doc_id").as("ia"), col("gs").as("ga"))
    val b = g.select(col("doc_id").as("ib"), col("gs").as("gb"))
    val jac = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        Dedup.jaccard(col("ga"), col("gb")).as("j"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(jac((1L, 4L)) === 1.0)
    assert(jac((1L, 2L)) > 0.8)
    assert(jac((1L, 3L)) === 0.0)
  }

  test("brute-force cosine topk: self is rank 1; lsh recall is sane") {
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val corpus = vecs.select(col("vec_id").as("corpus_id"), col("embedding"))
    val bf = Similarity.bruteForceTopK(probes, corpus, 3)
      .filter(col("rk") === 1)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toMap
    assert(bf === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    val lsh = Similarity.lshTopK(probes, corpus, 3, planes = 6)
      .filter(col("rk") === 1)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toMap
    // self always shares its own bucket → rank-1 self-match survives LSH
    assert(lsh === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("PQ/ADC: codes compress to m ints; self is rank 1; " +
      "layout-independent") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val codes = Similarity.pqEncode(vecs, m = 4, ksub = 8)
    assert(codes.count() === 40L)
    // the compressed form: exactly m codes per vector, ids < ksub
    assert(codes.select(size(col("codes"))).as[Int].collect().toSet
      === Set(4))
    assert(codes.select(explode(col("codes"))).as[Int].collect()
      .forall(c => c >= 0 && c < 8))
    val probes = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val corpus = vecs.select(col("vec_id").as("corpus_id"), col("embedding"))
    val pq = Similarity.pqTopK(probes, corpus, m = 4, ksub = 8, k = 3)
    // a probe's own PQ code has distance ≤ every other vector's to it in
    // each subspace it quantizes to — self must rank first (ties broken
    // by id keep self ahead)
    val self = pq.filter(col("rk") === 1)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toMap
    assert(self === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // exact-integer build ⇒ identical output under any input layout
    val shuffled = Similarity.pqTopK(probes,
      corpus.repartition(7, col("corpus_id")), m = 4, ksub = 8, k = 3)
    assert(pq.select("probe_id", "corpus_id", "ad2", "rk")
      .as[(Long, Long, Long, Long)].collect().toSet
      === shuffled.select("probe_id", "corpus_id", "ad2", "rk")
        .as[(Long, Long, Long, Long)].collect().toSet)
  }

  test("IVF-PQ: self is rank 1; nprobe=nCells equals plain PQ") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val corpus = vecs.select(col("vec_id").as("corpus_id"), col("embedding"))
    val out = Similarity.ivfPqTopK(probes, corpus, nCells = 4, m = 4,
      ksub = 8, k = 3, nprobe = 2)
    // a probe IS a corpus vector: identical routing and codes make the
    // self pair a candidate with the minimal ADC distance (ties break
    // toward the smaller id, which is the self id for probes 0-3 vs
    // their near-duplicates at +9k)
    val self = out.filter(col("rk") === 1)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toMap
    assert(self === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // routing-everywhere equivalence: with nprobe = nCells the coarse
    // router prunes nothing, so IVF-PQ must EQUAL plain PQ/ADC (same
    // codebooks, same distances, same ranking) — proving the composite
    // changes only the candidate set, never the scoring
    val everywhere = Similarity.ivfPqTopK(probes, corpus, nCells = 4,
      m = 4, ksub = 8, k = 3, nprobe = 4)
      .select("probe_id", "corpus_id", "ad2", "rk")
      .as[(Long, Long, Long, Long)].collect().toSet
    val plainPq = Similarity.pqTopK(probes, corpus, m = 4, ksub = 8, k = 3)
      .select("probe_id", "corpus_id", "ad2", "rk")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(everywhere === plainPq)
  }

  test("IVF ANN: self is rank 1; recall overlaps brute force") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val corpus = vecs.select(col("vec_id").as("corpus_id"), col("embedding"))
    val index = Similarity.ivfTrain(corpus, nCells = 4, iters = 2)
    val ivf = Similarity.ivfTopK(probes, corpus, index, k = 3, nprobe = 2)
      .select("probe_id", "corpus_id", "rk")
      .as[(Long, Long, Int)].collect()
    val self = ivf.filter(_._3 == 1).map(r => r._1 -> r._2).toMap
    assert(self === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    val bf = Similarity.bruteForceTopK(probes, corpus, 3)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect().toSet
    val hits = ivf.map(r => (r._1, r._2)).toSet
    // nprobe=2 of 4 cells → expect majority overlap with exact top-3
    assert(hits.intersect(bf).size >= bf.size / 2)
  }

  test("bucketed IVF corpus: same results, no corpus-side exchange") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val corpus = vecs.select(col("vec_id").as("corpus_id"), col("embedding"))
    val index = Similarity.ivfTrain(corpus, nCells = 4, iters = 1)
    spark.sql("DROP TABLE IF EXISTS ivf_corpus")
    // DROP leaves an orphaned location behind if a prior run died mid-write
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "ivf_corpus")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    Similarity.ivfWriteBucketed(corpus, index, "ivf_corpus", nBuckets = 4)
    val bucketed = Similarity.ivfTopKBucketed(probes, "ivf_corpus", index,
      k = 3, nprobe = 2)
    val direct = Similarity.ivfTopK(probes, corpus, index, k = 3, nprobe = 2)
    assert(bucketed.drop("rk").exceptAll(direct.drop("rk")).isEmpty
      && direct.drop("rk").exceptAll(bucketed.drop("rk")).isEmpty)
    // the corpus scan feeds the join with no Exchange (broadcast probe
    // side is the only data movement)
    val plan = bucketed.queryExecution.executedPlan.toString
    val corpusSection = plan.linesIterator
      .dropWhile(l => !l.contains("ivf_corpus"))
      .mkString("\n")
    assert(!corpusSection.contains("Exchange"),
      s"corpus side must be exchange-free, got:\n$plan")
  }

  test("quality score in [0,1]; langid picks the stopword-matching language") {
    val t = Seq(
      (1L, "the cat and the dog in the house for a while"),
      (2L, "der hund und die katze ist von dem haus"),
      (3L, "el perro y la casa es de un gato que")).toDF("id", "text")
    val out = t.select(col("id"), TextAnalysis.langId(col("text")).as("l"),
      TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, String, Double)].collect()
    assert(out.map(r => r._1 -> r._2).toMap ===
      Map(1L -> "en", 2L -> "de", 3L -> "es"))
    assert(out.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
  }

  test("multimodal stub plumbing: feature dims, resize, frame sampling") {
    val assets = docs.select(col("doc_id"),
      Multimodal.asset(col("text").cast("binary"), lit("image"), lit("png"),
        lit(1920), lit(1080), lit(0L), lit(95)).as("asset"))
    val out = Multimodal.extractFeatures(assets, "asset", dims = 16)
      .select(col("doc_id"), size(col("features")).as("nd"),
        Multimodal.resizeMeta(col("asset.meta"), 256).getField("width").as("rw"),
        Multimodal.resizeMeta(col("asset.meta"), 256).getField("height").as("rh"),
        size(Multimodal.frameSampleIndices(col("asset.meta.n_frames"), 10))
          .as("nf"))
      .as[(Long, Int, Int, Int, Int)].collect()
    out.foreach { case (_, nd, rw, rh, nf) =>
      assert(nd === 16)
      assert(rw === 256 && rh === 144) // aspect preserved
      assert(nf === 10)                // frames 0,10,...,90
    }
    // determinism: same bytes → same features
    val f = Multimodal.extractFeatures(assets, "asset", 4)
      .select("features").as[Seq[Double]].collect()
    assert(f(0) === f(3)) // doc 1 and 4 have identical text
  }

  test("real media codecs: PNG encode/decode/resize and WAV PCM " +
      "round-trip with exact stats") {
    import graft.llm.MediaCodecs
    // PNG: solid color survives the lossless round trip exactly
    val png = MediaCodecs.encodePngBytes(20, 10, 200, 100, 50)
    val st = MediaCodecs.decodeImageStats(png)
    assert((st.width, st.height, st.mean_r, st.mean_g, st.mean_b)
      === ((20, 10, 200, 100, 50)))
    // resize clamps the long side, preserves aspect, keeps color
    val small = MediaCodecs.decodeImageStats(
      MediaCodecs.resizeImageBytes(png, 8))
    assert((small.width, small.height) === ((8, 4)))
    assert((small.mean_r, small.mean_g, small.mean_b) === ((200, 100, 50)))
    // already-small images pass through untouched
    assert(MediaCodecs.resizeImageBytes(png, 64) eq png)
    // pooled features: solid gray image pools to a constant grid
    val gray = MediaCodecs.encodePngBytes(16, 16, 128, 128, 128)
    val feats = MediaCodecs.pooledFeaturesBytes(gray, 4)
    assert(feats.length === 16)
    assert(feats.forall(f => math.abs(f - 128.0 / 255.0) < 1e-9))
    // WAV: square wave decodes to exact amplitude-as-RMS + metadata
    val wav = MediaCodecs.encodeWavBytes(8000, 1600, 700, 10)
    val au = MediaCodecs.decodeWavStats(wav)
    assert((au.sample_rate, au.n_frames, au.duration_ms, au.rms)
      === ((8000, 1600L, 200L, 700L)))
  }

  test("real multi-frame GIF: animated encode, container stats from " +
      "per-frame delays, stride frame-sampling with exact colors") {
    import graft.llm.MediaCodecs
    // 7 frames, channels stepping by 17 per frame, 4cs delay each
    val gif = MediaCodecs.encodeGifBytes(12, 9, 7, 200, 60, 10, 17, 4)
    val vs = MediaCodecs.decodeGifStats(gif)
    assert((vs.width, vs.height, vs.n_frames, vs.duration_ms)
      === ((12, 9, 7, 280L)))
    // stride-2 sampling: frames 0,2,4,6 with exact stepped colors
    val fr = MediaCodecs.sampleGifFrames(gif, 2)
    assert(fr.map(_.frame_idx) === Seq(0, 2, 4, 6))
    fr.foreach { f =>
      assert((f.mean_r, f.mean_g, f.mean_b) ===
        (((200 + f.frame_idx * 17) % 256, (60 + f.frame_idx * 17) % 256,
          (10 + f.frame_idx * 17) % 256)))
    }
    // channel wrap-around past 255 stays exact (k*step crosses 256)
    val gif2 = MediaCodecs.encodeGifBytes(5, 5, 4, 250, 250, 250, 100, 2)
    val fr2 = MediaCodecs.sampleGifFrames(gif2, 1)
    assert(fr2.map(_.mean_r) === Seq(250, (350) % 256, (450) % 256,
      (550) % 256))
    // stride 1 and huge stride both behave
    assert(MediaCodecs.sampleGifFrames(gif, 100).map(_.frame_idx)
      === Seq(0))
  }

  test("connectedComponents groups dup pairs into min-rooted clusters") {
    // two chains and a singleton edge: {1,2,4,9}, {5,7}, {3,8} — run BOTH
    // execution tiers: driver union-find (small-graph tail) and the
    // distributed star rounds (threshold 0) must agree exactly
    val pairs = Seq((1L, 2L), (2L, 4L), (4L, 9L), (5L, 7L), (8L, 3L))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 9L -> 1L,
      5L -> 5L, 7L -> 5L, 3L -> 3L, 8L -> 3L)
    val local = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(local === expected)
    val dist = Dedup.connectedComponents(pairs, "id_a", "id_b",
      smallGraphThreshold = 0L).as[(Long, Long)].collect().toMap
    assert(dist === expected)
    // empty edge list → empty output, no failure (both tiers)
    val emptyDf = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(emptyDf, "id_a", "id_b").count() === 0L)
    assert(Dedup.connectedComponents(emptyDf, "id_a", "id_b",
      smallGraphThreshold = 0L).count() === 0L)
    // a long path exercises multi-round convergence (log-round contract)
    // on the DISTRIBUTED tier
    val path = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(path, "id_a", "id_b",
      smallGraphThreshold = 0L).as[(Long, Long)].collect()
    assert(comp.length === 40 && comp.forall(_._2 == 1L))
    // a non-orderable id type (struct) fails loudly at the gate, not
    // with a ClassCastException mid-fold on the driver tail
    val structIds = Seq(((1L, "a"), (2L, "b"))).toDF("id_a", "id_b")
    val guard = intercept[IllegalArgumentException](
      Dedup.connectedComponents(structIds, "id_a", "id_b").collect())
    assert(guard.getMessage.contains("orderable atomic id"))
  }

  test("contaminationScore flags overlap with the benchmark set") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val out = Dedup.contaminationScore(docs, "doc_id", "text",
      bench, "text", n = 3)
      .select("doc_id", "contamination").as[(Long, Double)]
      .collect().toMap
    assert(out(1L) > 0.4)  // shares a long prefix with the benchmark doc
    assert(out(3L) === 0.0) // unrelated text
  }

  test("bloomContaminationScore equals the exact rolling-gram score") {
    val bench = docs.filter($"doc_id" <= 2L).select($"doc_id" + 100L, $"text")
      .toDF("doc_id", "text")
    val exact = Dedup.contaminationScoreRolling(
      docs, "doc_id", "text", bench, "text", n = 3)
    val bloom = Dedup.bloomContaminationScore(
      docs, "doc_id", "text", bench, "text", n = 3)
    assert(exact.exceptAll(bloom).isEmpty && bloom.exceptAll(exact).isEmpty)
    // empty contamination set → all-zero scores, no crash on a null sketch
    val none = Dedup.bloomContaminationScore(
      docs, "doc_id", "text", bench.limit(0), "text", n = 3)
    assert(none.filter($"contamination" =!= 0.0).count() === 0L)
    assert(none.count() === docs.count())
  }

  test("spanDupPairs: shared exact spans pair, boilerplate df-capped") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "intro alpha beta gamma delta epsilon zeta outro"), // embeds doc 1's span
      (3L, "totally different content with no overlap at all"),
      // 4..9 share a "boilerplate" 5-token footer
      (4L, "aa bb cc dd ee unique4"), (5L, "aa bb cc dd ee unique5"),
      (6L, "aa bb cc dd ee unique6"), (7L, "aa bb cc dd ee unique7"),
      (8L, "aa bb cc dd ee unique8"), (9L, "aa bb cc dd ee unique9"))
      .toDF("doc_id", "text")
    val pairs = Dedup.spanDupPairs(corpus, "doc_id", "text", k = 5)
      .select("id_a", "id_b", "n_spans").as[(Long, Long, Long)]
      .collect().toSet
    // docs 1-2 share exactly two 5-token windows (alpha..epsilon shifted)
    assert(pairs.contains((1L, 2L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // the footer span (df=6) pairs all of 4..9 under the default cap...
    assert(pairs.contains((4L, 5L, 1L)) && pairs.contains((8L, 9L, 1L)))
    // ...and is dropped entirely when the cap is tightened below its df
    val capped = Dedup.spanDupPairs(corpus, "doc_id", "text", k = 5,
      maxDf = 5L).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped === Set((1L, 2L)))
  }

  test("topRun finds the most frequent n-gram; ties break lexicographically") {
    val rows = Seq(
      "a b a b a c",       // bigrams: a b ×2, b a ×2 → tie → "a b"
      "x y",               // single bigram
      "solo",              // no bigrams
      "").toDF("t")
      .select(TextAnalysis.topRun(
        TextAnalysis.wordBigrams(TextAnalysis.tokens(col("t")))).as("r"))
      .select(col("r.item"), col("r.cnt"))
      .as[(Option[String], Long)].collect()
    assert(rows(0) === ((Some("a b"), 2L)))
    assert(rows(1) === ((Some("x y"), 1L)))
    assert(rows(2) === ((None, 0L)))
    assert(rows(3) === ((None, 0L)))
  }

  test("wordTrigrams window the token stream; short docs yield none") {
    val tri = Seq("a b c d", "a b", "")
      .toDF("t")
      .select(TextAnalysis.wordTrigrams(TextAnalysis.tokens(col("t"))).as("g"))
      .as[Seq[String]].collect()
    assert(tri(0) === Seq("a b c", "b c d"))
    assert(tri(1) === Seq.empty)
    assert(tri(2) === Seq.empty)
  }

  test("incremental dedup admits first arrivals only, across a spill") {
    import graft.incremental.TieredTrace
    import graft.zset.ZSets
    // 300 rows over 100 fingerprints: each fp arrives 3 times, once per
    // batch — only the first arrival may be admitted, later re-sends of
    // an already-admitted fp must be rejected against the trace
    val rows = spark.range(300).select(
      col("id"), (col("id") % 100).as("fp"))
    val trace = new TieredTrace(
      rows.select(col("fp"), col("id")).limit(0)
        .withColumn(ZSets.W, lit(1L)),
      Seq("fp"), memRows = 40, nBuckets = 8) // tiny bound: forces spills
    try {
      val admitted = (0 until 3).map { b =>
        Dedup.incrementalDedup(trace,
          rows.filter(col("id") % 3 === b)
            .select(col("fp"), col("id")), "fp", "id")
      }
      assert(trace.bytesOnDisk > 0, "schedule must cross the spill")
      // batch 0 holds ids 0,3,..,297 = fps 0..99 each once → all admitted
      assert(admitted(0).count() === 100L)
      // batches 1 and 2 re-send the same 100 fps → nothing admitted
      assert(admitted(1).count() === 0L)
      assert(admitted(2).count() === 0L)
      val got = admitted(0).as[(Long, Long)].collect().toMap
      // winner per fp is the batch-0 id (id % 3 == 0) with that fp
      assert(got.forall { case (fp, id) => id % 3 === 0 && id % 100 === fp })
    } finally trace.delete()
  }

  test("incremental span dedup: overlap vs admitted state only, w/ spill") {
    import graft.incremental.TieredTrace
    import graft.zset.ZSets
    // batch 0 admits everything (empty state); batch 1 has a verbatim
    // partial copy (rejected: all spans seen) and a fresh doc; batch 2
    // tests that the REJECTED doc's unique spans did NOT enter state
    val b0 = Seq((1L, "p q r s t u v w")).toDF("doc_id", "text")
    val b1 = Seq(
      (2L, "p q r s t u"),              // spans ⊂ doc 1 → overlap 1.0
      (3L, "p q r completely new tail here x y z"), // partial overlap
      (4L, "totally fresh content nothing shared here")).toDF("doc_id", "text")
    val b2 = Seq(
      // doc 3's tail: admitted docs' spans are state → fully seen
      (5L, "completely new tail here x y z"),
      // copies the REJECTED doc 2 verbatim → still fully covered by doc 1
      (6L, "p q r s t u")).toDF("doc_id", "text")
    val trace = new TieredTrace(
      b0.select(lit(0L).as("_h")).limit(0).withColumn(ZSets.W, lit(1L)),
      Seq("_h"), memRows = 4, nBuckets = 4) // tiny bound: forces spills
    try {
      val r0 = Dedup.incrementalSpanDedup(trace, b0, "doc_id", "text")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
      assert(r0 === Seq((1L, 6L, 0L, 0.0, true)))
      val r1 = Dedup.incrementalSpanDedup(trace, b1, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4)))
        .toMap
      assert(r1(2L) === ((4L, false)))  // every span already in state
      assert(r1(3L)._1 === 1L && r1(3L)._2) // only "p q r" seen
      assert(r1(4L) === ((0L, true)))
      assert(trace.bytesOnDisk > 0, "schedule must cross the spill")
      val r2 = Dedup.incrementalSpanDedup(trace, b2, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4)))
        .toMap
      // doc 3 was admitted, so its tail spans are state → doc 5 rejected
      assert(r2(5L) === ((5L, false)))
      // doc 2 was REJECTED: its spans entered state only via doc 1's
      // admission — doc 6 (= doc 2) is still fully covered and rejected
      assert(r2(6L) === ((4L, false)))
    } finally trace.delete()
  }

  test("semantic dedup: cell-scoped near-dup removal keeps first arrival") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),   // seeds (ids < nCells)
      (2L, Seq(1.0f, 0.01f)),                          // near-dup of 0
      (3L, Seq(0.01f, 1.0f)),                          // near-dup of 1
      (4L, Seq(0.7f, 0.7f)),                           // dissimilar to both
      (5L, Seq(1.0f, 0.0f))                            // exact dup of 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, nCells = 2, threshold = 0.95)
      .orderBy("vec_id")
      .select("vec_id", "dup_of", "keep")
      .as[(Long, Option[Long], Boolean)].collect().toSeq
    assert(out === Seq(
      (0L, None, true), (1L, None, true), (2L, Some(0L), false),
      (3L, Some(1L), false), (4L, None, true), (5L, Some(0L), false)))
    // keep <=> dup_of IS NULL is the contract the downstream filter uses
    assert(out.forall { case (_, d, k) => k == d.isEmpty })
  }

  test("dropCommonSegments removes repeated segments, keeps order") {
    // 2-token segments; "the boilerplate" appears in 3 docs -> dropped
    // everywhere; unique tails survive in original order
    val docs = Seq(
      (1L, "the boilerplate alpha beta gamma delta"),
      (2L, "the boilerplate epsilon zeta"),
      (3L, "the boilerplate"),
      (4L, "totally unique words here"),
      (5L, "")).toDF("doc_id", "text")
    val out = graft.llm.Dedup
      .dropCommonSegments(docs, "doc_id", "text", segTokens = 2, maxDf = 2L)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((3L, 2L, "alpha beta gamma delta")))
    assert(out(2L) === ((2L, 1L, "epsilon zeta")))
    // every segment boilerplate: doc survives with empty text
    assert(out(3L) === ((1L, 0L, "")))
    assert(out(4L) === ((2L, 2L, "totally unique words here")))
    // empty document: zero segments, still one output row
    assert(out(5L) === ((0L, 0L, "")))
    // a segment repeated WITHIN one doc is not corpus boilerplate
    val intra = graft.llm.Dedup.dropCommonSegments(
      Seq((1L, "x y x y")).toDF("doc_id", "text"),
      "doc_id", "text", segTokens = 2, maxDf = 2L)
      .as[(Long, Long, Long, String)].head()
    assert(intra === ((1L, 2L, 2L, "x y x y")))
  }

  test("kmeansCellsQuantized: one cell per vector, agrees with IVF cells") {
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(4)(d => (math.sin(i * 131 + d) * 0.9).toFloat)))
      .toDF("vec_id", "embedding")
    val cells = graft.llm.Similarity
      .kmeansCellsQuantized(vecs, nCells = 4, scale = 1000)
      .as[(Long, Int)].collect()
    assert(cells.length === 40)
    assert(cells.map(_._1).toSet === (0L until 40L).toSet)
    assert(cells.forall { case (_, c) => c >= 0 && c < 4 })
    // the ivf corpus routing (nprobe=1 top-1 over the same index) lands
    // every vector in its own kmeans cell: self-search must stay in-cell
    val self = graft.llm.Similarity.ivfTopKQuantized(
      vecs.select(col("vec_id").as("probe_id"), col("embedding")),
      vecs.select(col("vec_id").as("corpus_id"), col("embedding")),
      nCells = 4, k = 1, nprobe = 1, scale = 1000)
      .select("probe_id", "corpus_id").as[(Long, Long)].collect()
    assert(self.forall { case (p, c) => p == c })
  }

  test("scrubPii replaces emails, phones, and IPs; clean text unchanged") {
    val rows = Seq(
      "mail bob.smith+x@corp.example.org now",
      "call (555) 123-4567 or 555 987 6543",
      "host 192.168.0.1 responded",
      "nothing sensitive here").toDF("t")
      .select(TextAnalysis.scrubPii(col("t")).as("c"))
      .as[String].collect()
    assert(rows(0) === "mail <EMAIL> now")
    assert(rows(1) === "call <PHONE> or <PHONE>")
    assert(rows(2) === "host <IP> responded")
    assert(rows(3) === "nothing sensitive here")
  }

  test("dsirScore ranks target-vocabulary docs above off-domain ones") {
    // keep>1 is calibrated for corpora with target tokens >> nBuckets
    // (the smoothing constant) — build one: 100 target docs on vocab A,
    // 100 raw-only docs on vocab B, plus two probe docs
    val base = spark.range(200).select(col("id").as("doc_id"),
      (col("id") < 100).as("is_t"),
      when(col("id") < 100, concat_ws(" ", (0 until 20).map(j =>
          concat(lit("tgt"), (col("id") * 20 + j) % 40)): _*))
        .otherwise(concat_ws(" ", (0 until 20).map(j =>
          concat(lit("raw"), (col("id") * 20 + j) % 40)): _*))
        .as("text"))
    val probes = Seq(
      (900L, false, (0 until 12).map(j => s"tgt${j % 40}").mkString(" ")),
      (901L, false, (0 until 12).map(j => s"raw${j % 40}").mkString(" ")))
      .toDF("doc_id", "is_t", "text")
    val d = base.unionByName(probes)
    val out = TextAnalysis.dsirScore(d, "doc_id", "text", col("is_t"))
      .select("doc_id", "ratio", "keep")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    // target-vocabulary probe kept, raw-vocabulary probe dropped
    assert(out(900L)._2 > 1.0 && out(900L)._3)
    assert(out(901L)._2 < 1.0 && !out(901L)._3)
    // and the margin is real: every target doc outranks every raw doc
    assert(out(0L)._2 > out(100L)._2)
    // broadcast and shuffle-join vocab tiers agree exactly
    val noB = TextAnalysis.dsirScore(d, "doc_id", "text", col("is_t"),
      broadcastVocab = false)
      .select("doc_id", "ratio", "keep")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(noB === out)
  }

  test("bm25Score: rare query terms outweigh common ones; misses score 0") {
    // 20 docs all containing 'common'; only doc 0 contains 'rare'; doc 19
    // has neither query term beyond 'common' repeated (tf saturation)
    val docs = Seq(
      (0L, "rare common alpha beta gamma"),
      (19L, "common common common common common")) ++
      (1L to 18L).map(i => (i, s"common filler$i x y z"))
    val d = docs.toDF("doc_id", "text")
    val out = TextAnalysis.bm25Score(d, "doc_id", "text",
      Seq("rare", "common", "absent"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // every doc matches 'common'; only doc 0 matches 'rare' too
    assert(out(0L)._2 === 2L)
    assert(out(5L)._2 === 1L)
    // the rare term dominates: doc 0 far outranks any common-only doc
    assert(out(0L)._3 > out(19L)._3)
    // tf saturation: five 'common's score more than one, but not 5x
    assert(out(19L)._3 > out(5L)._3)
    assert(out(19L)._3 < 5L * out(5L)._3)
    // scores are non-negative and score = score_q / quant
    out.values.foreach { r =>
      assert(r._3 >= 0L)
      assert(math.abs(r._4 - r._3.toDouble / 10000L) < 1e-12)
    }
  }
}
