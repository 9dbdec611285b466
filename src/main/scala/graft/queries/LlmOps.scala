package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, MediaCodecs, Multimodal, Packing, Sampling, Similarity, TextAnalysis}
import QB._

/** Training-data pipeline operators (beyond-reference; BASELINE.json north
  * star): dedup (exact / MinHash+LSH / SimHash / n-gram Jaccard), embedding
  * similarity search, text analysis, multimodal plumbing.
  *
  * Oracle-checked variants use the md5-derived 60-bit hash both engines
  * compute identically (`Dedup.md5Hash`); the `*_fast` variants use
  * xxhash64 (production path, rows-only check).
  */
object LlmOps {

  /** Scan fan-out width for the CPU-heavy per-row pipelines over the
    * single-row-group doc/embedding fixtures: the session's core count
    * (scale-adaptive, guide §2), not a local[32] constant — at the
    * bench's 32 cores the plans are unchanged; at other widths the
    * fan-out follows. Results are partitioning-independent by the QB
    * determinism discipline (exact integer/decimal aggregation only).
    */
  private def fan(s: org.apache.spark.sql.SparkSession): Int =
    s.sparkContext.defaultParallelism

  /** DuckDB fragments mirroring TextAnalysis.tokens / Dedup.shingles(3). */
  private val tk =
    """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
  private def md5h(seed: Int, e: String) =
    s"CAST(('0x' || substr(md5('$seed:' || $e), 1, 15)) AS BIGINT)"
  /** DuckDB fragment mirroring [[Dedup.polyHash]] — the pure-BIGINT
    * Karp–Rabin per-token hash (no crypto digest; ~4× cheaper than the
    * md5 tier measured on the span-gram pipelines, same engine-shared
    * dialect as llm_minhash_fast / llm_inc_dedup).
    */
  private def polyh(e: String) =
    s"list_reduce(list_prepend(CAST(7 AS BIGINT), " +
      s"list_transform(range(1, length($e) + 1), " +
      s"i -> CAST(ascii(substr($e, i, 1)) AS BIGINT))), " +
      s"(acc, c) -> (acc * 31 + c) % ${Dedup.FP_P})"
  // permuted-minhash oracle: ONE md5 per shingle, reduced mod 2^31-1,
  // then 8 exact affine permutations (products < 2^62 — DuckDB raises on
  // BIGINT overflow where Spark wraps, so staying in range is what keeps
  // the engines bit-identical). Mirrors Dedup.minhashPermuted.
  private val sigCtes =
    s"""WITH toks AS (
       |  SELECT doc_id, $tk AS tkn FROM documents),
       |sh AS (
       |  SELECT doc_id, list_filter(
       |    list_transform(range(1, len(tkn) + 1),
       |      i -> CASE WHEN i + 2 <= len(tkn)
       |           THEN tkn[i] || ' ' || tkn[i+1] || ' ' || tkn[i+2] END),
       |    s -> s IS NOT NULL) AS shs
       |  FROM toks WHERE len(tkn) >= 3),
       |e AS (SELECT doc_id, unnest(shs) AS s FROM sh),
       |bh AS (SELECT doc_id, ${md5h(0, "s")} % 2147483647 AS h FROM e),
       |sig AS (SELECT doc_id,
       |  ${(0 until 8).map(i =>
            s"MIN((${1103515245L + 2 * i} * h + ${12345 + 1259 * i}) % 2147483647) AS h$i")
           .mkString(", ")}
       |  FROM bh GROUP BY doc_id)""".stripMargin

  val queries: Seq[Q] = Seq(
    Q(
      "llm_text_stats",
      s"""SELECT doc_id,
         |  CAST(len($tk) AS BIGINT) AS n_tokens,
         |  CAST(length(text) AS BIGINT) AS n_chars_calc,
         |  CAST(length(text) - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
         |    / NULLIF(length(text), 0) AS clean_ratio,
         |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
         |    / NULLIF(length(text), 0) AS digit_ratio,
         |  CAST(len(list_distinct($tk)) AS DOUBLE) / NULLIF(len($tk), 0) AS uniq_ratio,
         |  GREATEST(0.0, LEAST(1.0,
         |    LEAST(CAST(len($tk) AS DOUBLE) / 20.0, 1.0) * 0.4
         |    + (CAST(len(list_distinct($tk)) AS DOUBLE) / NULLIF(len($tk), 0)) * 0.4
         |    + (CAST(length(text) - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
         |       / NULLIF(length(text), 0)) * 0.2)) AS quality,
         |  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |FROM documents""".stripMargin) { (s, dir) =>
      // token array staged once per row; every token-derived stat reads it
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextAnalysis.tokens(col("text")).as("_toks"))
        .select(
          col("doc_id"),
          size(col("_toks")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_calc"),
          TextAnalysis.charClassRatio(col("text"), "[a-zA-Z0-9\\s]")
            .as("clean_ratio"),
          TextAnalysis.charClassRatio(col("text"), "[0-9]").as("digit_ratio"),
          (size(array_distinct(col("_toks"))).cast("double")
            / nullif(size(col("_toks")), lit(0)))
            .as("uniq_ratio"),
          TextAnalysis.qualityScoreFromTokens(col("text"), col("_toks"))
            .as("quality"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
    },

    Q(
      "llm_langid",
      { // argmax CASE chain in sorted-key order == langId's tie-break
        val langs = TextAnalysis.stopwords.toSeq.sortBy(_._1)
        val scoreExprs = langs.map { case (lang, words) =>
          val inList = words.map(w => s"'$w'").mkString(", ")
          s"len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''), x -> list_contains([$inList], x))) AS s_$lang"
        }
        val caseChain = langs.map(_._1).zipWithIndex.map { case (l, i) =>
          val rest = langs.map(_._1).drop(i + 1)
          if (rest.isEmpty) s"ELSE '$l' END AS lang_guess"
          else s"WHEN ${rest.map(r => s"s_$l >= s_$r").mkString(" AND ")} THEN '$l'"
        }.mkString(" ")
        s"""SELECT doc_id, lang, s_en, CASE $caseChain FROM (
           |  SELECT doc_id, lang, ${scoreExprs.mkString(", ")} FROM documents)""".stripMargin
      }) { (s, dir) =>
      // tokens staged once, then the 5 score filters staged once, then the
      // argmax reads the score columns: one tokenize + 5 filters per row
      // (was ~10 tokenizations — HOFs re-evaluate captures per element).
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokens(lower(col("text"))).as("_toks"))
        .select(Seq(col("doc_id"), col("lang")) ++
          TextAnalysis.langScoresFromTokens(col("_toks"))
            .map { case (l, c) => c.as(s"_s_$l") }: _*)
        .select(
          col("doc_id"), col("lang"),
          col("_s_en").cast("long").as("s_en"),
          TextAnalysis.langIdFromScores(
            TextAnalysis.stopwords.keys.toSeq.sorted
              .map(l => l -> col(s"_s_$l"))).as("lang_guess"))
    },

    Q(
      "llm_dedup_exact",
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
    },

    // INCREMENTAL cross-corpus dedup: documents arrive in 3 batches
    // (doc_id % 3); each batch admits only fingerprints never seen by the
    // accumulated corpus state, which lives in the LSM-tiered trace
    // backend (memtable runs here; bucketed parquet with partition-pruned
    // probes at corpus scale — the continuous-crawl-ingest shape, where a
    // new increment never rescans the accumulated corpus). Oracle:
    // first-arrival winner per fingerprint under the same batch order,
    // over the identical Karp–Rabin rolling fingerprint.
    Q(
      "llm_inc_dedup",
      s"""WITH toks AS (SELECT doc_id, $tk AS tkn FROM documents),
         |fp AS (SELECT doc_id,
         |  list_reduce(list_prepend(CAST(7 AS BIGINT),
         |    list_transform(tkn, t -> list_reduce(
         |      list_prepend(CAST(7 AS BIGINT),
         |        list_transform(range(1, length(t) + 1),
         |          i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
         |      (acc, c) -> (acc * 31 + c) % ${Dedup.FP_P}))),
         |    (acc, h) -> (acc * 31 + h) % ${Dedup.FP_P}) AS fp
         |  FROM toks)
         |SELECT fp, doc_id AS keep_id FROM (
         |  SELECT fp, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id % 3, doc_id) AS rk
         |  FROM fp) WHERE rk = 1""".stripMargin) { (s, dir) =>
      val fps = t(s, dir, "documents").repartition(fan(s), col("doc_id"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          Dedup.rollingFingerprint(col("_toks")).as("fp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val trace = new graft.incremental.TieredTrace(
        fps.select(col("fp"), col("doc_id")).limit(0)
          .withColumn(graft.zset.ZSets.W, lit(1L)),
        Seq("fp"), nBuckets = 16)
      try {
        (0 until 3).map(m => Dedup.incrementalDedup(trace,
            fps.filter(col("doc_id") % 3 === m), "fp", "doc_id"))
          .reduce(_ unionByName _)
          .select(col("fp"), col("doc_id").as("keep_id"))
          .localCheckpoint(true)
      } finally { trace.delete(); fps.unpersist(); () }
    },

    // Incremental SPAN-level dedup: batches admit a document only while
    // its 3-token-span overlap with the accumulated state of previously
    // ADMITTED documents stays under 50%; admitted docs append only their
    // new span hashes to the tiered trace. The oracle replays the same
    // 3-batch schedule as chained CTEs (state0 = ∅ → admit → state1 → …),
    // including the rule that REJECTED documents contribute no spans.
    Q(
      "llm_inc_span_dedup",
      s"""WITH toks AS (SELECT doc_id, $tk AS tkn FROM documents),
         |th AS (SELECT doc_id,
         |    list_transform(tkn, t -> ${polyh("t")}) AS hs
         |  FROM toks WHERE len(tkn) >= 3),
         |dg AS (SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, len(hs) - 1),
         |      i -> list_reduce(list_prepend(CAST(7 AS BIGINT), hs[i:i+2]),
         |        (acc, h) -> (acc * 131 + h) % ${Dedup.FP_P})))) AS h
         |  FROM th),
         |out0 AS (SELECT doc_id, COUNT(*) AS n_spans, 0 AS n_seen
         |  FROM dg WHERE doc_id % 3 = 0 GROUP BY doc_id),
         |s1 AS (SELECT DISTINCT h FROM dg WHERE doc_id % 3 = 0),
         |out1 AS (SELECT doc_id, COUNT(*) AS n_spans,
         |    SUM(CASE WHEN h IN (SELECT h FROM s1) THEN 1 ELSE 0 END) AS n_seen
         |  FROM dg WHERE doc_id % 3 = 1 GROUP BY doc_id),
         |s2 AS (SELECT h FROM s1 UNION SELECT h FROM dg
         |  WHERE doc_id IN (SELECT doc_id FROM out1
         |                   WHERE n_seen * 1.0 / n_spans < 0.5)),
         |out2 AS (SELECT doc_id, COUNT(*) AS n_spans,
         |    SUM(CASE WHEN h IN (SELECT h FROM s2) THEN 1 ELSE 0 END) AS n_seen
         |  FROM dg WHERE doc_id % 3 = 2 GROUP BY doc_id)
         |SELECT doc_id, n_spans, CAST(n_seen AS BIGINT) AS n_seen,
         |  n_seen * 1.0 / n_spans AS overlap,
         |  n_seen * 1.0 / n_spans < 0.5 AS admitted
         |FROM (SELECT * FROM out0 UNION ALL SELECT * FROM out1
         |      UNION ALL SELECT * FROM out2)""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").repartition(fan(s), col("doc_id"))
        .select(col("doc_id"), col("text"))
      val trace = new graft.incremental.TieredTrace(
        docs.select(lit(0L).as("_h")).limit(0)
          .withColumn(graft.zset.ZSets.W, lit(1L)),
        Seq("_h"), nBuckets = 16)
      try {
        (0 until 3).map(m => Dedup.incrementalSpanDedup(trace,
            docs.filter(col("doc_id") % 3 === m), "doc_id", "text",
            k = 3, threshold = 0.5))
          .reduce(_ unionByName _)
          .localCheckpoint(true)
      } finally { trace.delete(); () }
    },

    Q(
      "llm_minhash",
      s"""$sigCtes SELECT * FROM sig""") { (s, dir) =>
      // staged columns: tokens/shingles/sig each computed once per row;
      // repartition = local fan-out of the one-row-group input before the
      // CPU-heavy interpreted HOF pipeline
      t(s, dir, "documents").repartition(fan(s), col("doc_id"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
        .filter(size(col("_toks")) >= 3)
        .select(col("doc_id"),
          Dedup.shinglesOfTokens(col("_toks"), 3).as("_sh"))
        .select(col("doc_id"),
          Dedup.minhashPermuted(col("_sh"), 8,
            s => Dedup.md5Hash(s, 0)).as("sig"))
        .select(col("doc_id") +: (0 until 8).map(i =>
          element_at(col("sig"), i + 1).as(s"h$i")): _*)
    },

    Q(
      "llm_dup_pairs",
      s"""$sigCtes,
         |banded AS (
         |  ${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, CAST(h${2*b} AS VARCHAR) || ',' || CAST(h${2*b+1} AS VARCHAR) AS bkey FROM sig")
             .mkString(" UNION ALL ")}),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
         |  WHERE a.doc_id < b.doc_id)
         |SELECT id_a, id_b,
         |  (${(0 until 8).map(i => s"(CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END)").mkString(" + ")}) / 8.0 AS est_jaccard
         |FROM pairs
         |JOIN sig sa ON sa.doc_id = id_a
         |JOIN sig sb ON sb.doc_id = id_b""".stripMargin) { (s, dir) =>
      Dedup.minhashDupPairs(
        t(s, dir, "documents").repartition(fan(s), col("doc_id"))
          .filter(size(TextAnalysis.tokens(col("text"))) >= 3),
        "doc_id", "text", w = 3, numHashes = 8, bands = 4,
        sigOf = Some(sh => Dedup.minhashPermuted(sh, 8,
          s0 => Dedup.md5Hash(s0, 0))))
    },

    // Duplicate-group clustering: connected components over the LSH
    // candidate pairs (alternating large/small-star), vs DuckDB's
    // recursive min-label closure over the identical pair set.
    Q(
      "llm_dup_groups",
      s"""${sigCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |banded AS (
         |  ${(0 until 4).map(b =>
             s"SELECT doc_id, $b AS band, CAST(h${2*b} AS VARCHAR) || ',' || CAST(h${2*b+1} AS VARCHAR) AS bkey FROM sig")
             .mkString(" UNION ALL ")}),
         |pairs AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
         |  WHERE a.doc_id < b.doc_id),
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(n, m) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT r.n, e.v FROM reach r JOIN edges e ON r.m = e.u)
         |SELECT n AS doc_id, MIN(m) AS group_id FROM reach GROUP BY n""".stripMargin) {
      (s, dir) =>
        val pairs = Dedup.minhashDupPairs(
          t(s, dir, "documents").repartition(fan(s), col("doc_id"))
            .filter(size(TextAnalysis.tokens(col("text"))) >= 3),
          "doc_id", "text", w = 3, numHashes = 8, bands = 4,
          sigOf = Some(sh => Dedup.minhashPermuted(sh, 8,
            s0 => Dedup.md5Hash(s0, 0))))
        Dedup.connectedComponents(pairs, "id_a", "id_b")
          .select(col("node").as("doc_id"), col("component").as("group_id"))
    },

    Q(
      "llm_simhash",
      s"""WITH toks AS (SELECT doc_id, $tk AS tkn FROM documents),
         |tok AS (SELECT doc_id, unnest(tkn) AS tok FROM toks WHERE len(tkn) >= 1),
         |h AS (SELECT doc_id, ${md5h(0, "tok")} AS hh FROM tok),
         |bits AS (
         |  SELECT doc_id, b,
         |    SUM(CASE WHEN (hh & (CAST(1 AS BIGINT) << b)) != 0 THEN 1 ELSE -1 END) AS cnt
         |  FROM h CROSS JOIN (SELECT unnest(range(0, 48)) AS b)
         |  GROUP BY doc_id, b)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN cnt > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sim_fp
         |FROM bits GROUP BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").repartition(fan(s), col("doc_id"))
        .filter(size(TextAnalysis.tokens(col("text"))) >= 1)
        .select(col("doc_id"),
          Dedup.simhash(col("text"), 48, Dedup.md5Hash).as("sim_fp"))
    },

    Q(
      "llm_ngram_jaccard",
      s"""WITH d AS (
         |  SELECT doc_id, list_distinct(list_filter(
         |    list_transform(range(1, len($tk) + 1),
         |      i -> CASE WHEN i + 1 <= len($tk)
         |           THEN ($tk)[i] || ' ' || ($tk)[i+1] END),
         |    s -> s IS NOT NULL)) AS gs
         |  FROM documents WHERE doc_id < 60)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
         |    / NULLIF(len(list_distinct(a.gs || b.gs)), 0) AS jac
         |FROM d a, d b WHERE a.doc_id < b.doc_id""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").filter(col("doc_id") < 60)
        .select(col("doc_id"), Dedup.ngramSet(col("text"), 2).as("gs"))
      val a = d.select(col("doc_id").as("id_a"), col("gs").as("ga"))
      val b = d.select(col("doc_id").as("id_b"), col("gs").as("gb"))
      broadcast(a).join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.jaccard(col("ga"), col("gb")).as("jac"))
    },

    Q(
      "llm_cosine_topk",
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |n AS (SELECT vec_id, qv,
        |  list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS nrm
        |  FROM q),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS corpus_id,
        |    CAST(list_reduce(list_transform(range(1, len(p.qv) + 1),
        |        i -> p.qv[i] * c.qv[i]), (a, b) -> a + b) AS DOUBLE)
        |      / NULLIF(sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE)), 0) AS sim
        |  FROM n p, n c WHERE p.vec_id < 10)
        |SELECT probe_id, corpus_id, sim, rk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, corpus_id) AS rk
        |  FROM scored) WHERE rk <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      // corpus fanned out past the one-row-group scan BEFORE the per-pair
      // scoring (the 1e5c6a1 idiom — a real scan at scale already has
      // thousands of partitions; this shuffle of 2k small rows is the
      // local stand-in). Quantization/norms are staged per row inside
      // bruteForceTopK; the pair loop is the codegen'd VectorDotLong.
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        emb.repartition(fan(s), col("vec_id"))
          .select(col("vec_id").as("corpus_id"), col("embedding")),
        k = 5, quantScale = 1000)
    },

    // Embedding-cosine near-duplicate pairs (the 5th dedup modality), the
    // SCALE shape end-to-end: integer sign-LSH band signatures → banding
    // equi-join for candidates → exact quantized cosine on candidates
    // only. No cross join anywhere; only (id, band, sig) rows shuffle.
    // The hyperplanes are pure-integer (Dedup.signBands), so DuckDB
    // re-derives the identical candidate set independently — the oracle
    // checks the whole LSH pipeline, not just the cosine.
    Q(
      "llm_embed_dups",
      s"""WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |sig AS (
        |  SELECT vec_id, band, SUM(CASE WHEN dot >= 0 THEN 1 << bit ELSE 0 END) AS sig
        |  FROM (
        |    SELECT q.vec_id, b.band, bt.bit,
        |      list_reduce(list_transform(range(1, len(q.qv) + 1),
        |        i -> q.qv[i] * ((1103515245 * ((b.band * 4 + bt.bit) * 1259 + (i - 1)) + 12345) % 2097152 - 1048576)),
        |        (x, y) -> x + y) AS dot
        |    FROM q, (SELECT unnest(generate_series(0, 11)) AS band) b,
        |         (SELECT unnest(generate_series(0, 3)) AS bit) bt)
        |  GROUP BY vec_id, band),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
        |    AND a.vec_id < b.vec_id),
        |n AS (SELECT vec_id, qv,
        |  list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS nrm
        |  FROM q)
        |SELECT c.id_a, c.id_b,
        |  CAST(list_reduce(list_transform(range(1, len(a.qv) + 1),
        |      i -> a.qv[i] * b.qv[i]), (x, y) -> x + y) AS DOUBLE)
        |    / NULLIF(sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)), 0) AS sim
        |FROM cand c JOIN n a ON c.id_a = a.vec_id JOIN n b ON c.id_b = b.vec_id
        |WHERE CAST(list_reduce(list_transform(range(1, len(a.qv) + 1),
        |      i -> a.qv[i] * b.qv[i]), (x, y) -> x + y) AS DOUBLE)
        |    / NULLIF(sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)), 0) > 0.3""".stripMargin) {
      (s, dir) =>
        // stage quantized vectors + signatures once (persist barrier: the
        // banding join would otherwise recompute the 48-plane signatures
        // per candidate pair). 12 bands x 4 bits: 16 buckets/band keeps
        // the candidate volume ~bucket-quadratic-small at this corpus
        // size with ~0.8 recall at the 0.3 threshold. repartition = local
        // fan-out of the one-row-group scan before the signature CPU.
        val q = t(s, dir, "embeddings").repartition(fan(s), col("vec_id"))
          .select(col("vec_id"),
            Similarity.quantize(col("embedding"), 1000).as("qv"))
          .select(col("vec_id"), col("qv"),
            graft.functions.VectorDot.dotL(col("qv"), col("qv")).as("nrm"),
            Dedup.signBands(col("qv"), bands = 12, bitsPerBand = 4)
              .as("bands"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sigs = q.select(col("vec_id"), explode(col("bands")).as("bs"))
          .select(col("vec_id"), col("bs.band").as("band"),
            col("bs.sig").as("sig"))
        val cand = sigs.alias("a").join(sigs.alias("b"),
            col("a.band") === col("b.band") && col("a.sig") === col("b.sig")
              && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
          .distinct()
        // codegen'd exact BIGINT dot (identical arithmetic to the
        // interpreted zip_with fold, which cost ~100M lambda invocations
        // across the candidate pairs — the dominant task time here)
        val dt = graft.functions.VectorDot.dotL(col("qa"), col("qb"))
        cand
          .join(q.select(col("vec_id").as("id_a"), col("qv").as("qa"),
            col("nrm").as("na")), "id_a")
          .join(q.select(col("vec_id").as("id_b"), col("qv").as("qb"),
            col("nrm").as("nb")), "id_b")
          .select(col("id_a"), col("id_b"),
            (dt.cast("double") / nullif(
              sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")),
              lit(0d))).as("sim"))
          .filter(col("sim") > 0.3)
    },

    // Semantic dedup (SemDeDup shape): cluster the corpus by embedding
    // (IVF cells), then drop near-duplicates WITHIN each cell — the pair
    // join is cell-scoped, never corpus-quadratic, and at scale the cells
    // are the bucketing keys (ivfWriteBucketed) so it runs exchange-free.
    // Deterministic seeds + exact integer arithmetic end-to-end: DuckDB
    // re-derives the identical cells, pairs, and keep/drop decisions.
    Q(
      "llm_semantic_dedup",
      s"""WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |seeds AS (SELECT CAST(vec_id AS INT) AS cell, qv AS cv
        |  FROM q WHERE vec_id < 8),
        |asg AS (
        |  SELECT vec_id, qv, cell FROM (
        |    SELECT q.vec_id, q.qv, s.cell,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(q.qv) + 1),
        |          i -> (q.qv[i] - s.cv[i]) * (q.qv[i] - s.cv[i])),
        |          (a, b) -> a + b), s.cell) AS rk
        |    FROM q, seeds s) WHERE rk = 1),
        |a AS (SELECT vec_id, qv, cell,
        |  list_reduce(list_transform(qv, x -> x * x), (x, y) -> x + y) AS n2
        |  FROM asg),
        |dup AS (
        |  SELECT y.vec_id AS id_b, MIN(x.vec_id) AS dup_of
        |  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
        |  WHERE CAST(list_reduce(list_transform(range(1, len(x.qv) + 1),
        |      i -> x.qv[i] * y.qv[i]), (p, r) -> p + r) AS DOUBLE)
        |    / NULLIF(sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE)), 0)
        |    > 0.85
        |  GROUP BY y.vec_id)
        |SELECT a.vec_id, a.cell, d.dup_of, d.dup_of IS NULL AS keep
        |FROM a LEFT JOIN dup d ON a.vec_id = d.id_b""".stripMargin) {
      (s, dir) =>
        Similarity.semanticDedup(
          t(s, dir, "embeddings").repartition(fan(s), col("vec_id")),
          nCells = 8, threshold = 0.85, scale = 1000)
    },

    // Fast-tier document fingerprint, oracle-checked: Karp–Rabin polynomial
    // rolling hash (pure BIGINT arithmetic — no crypto hash — so DuckDB
    // folds the identical recurrence). The xxhash64 minhash production path
    // is spec-graded (DedupSpec); the md5 minhash pipeline is llm_minhash.
    Q(
      "llm_minhash_fast",
      s"""WITH toks AS (SELECT doc_id, $tk AS tkn FROM documents),
         |th AS (SELECT doc_id, len(tkn) AS n_tokens,
         |  list_transform(tkn, t -> list_reduce(
         |    list_prepend(CAST(7 AS BIGINT),
         |      list_transform(range(1, length(t) + 1),
         |        i -> CAST(ascii(substr(t, i, 1)) AS BIGINT))),
         |    (acc, c) -> (acc * 31 + c) % ${Dedup.FP_P})) AS hs
         |  FROM toks)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  list_reduce(list_prepend(CAST(7 AS BIGINT), hs),
         |    (acc, h) -> (acc * 31 + h) % ${Dedup.FP_P}) AS rolling_fp
         |FROM th""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").repartition(fan(s), col("doc_id"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
        .select(col("doc_id"), size(col("_toks")).cast("long").as("n_tokens"),
          Dedup.rollingFingerprint(col("_toks")).as("rolling_fp"))
    },

    // Integer sign-LSH ANN, oracle-checked end-to-end: DuckDB re-derives
    // the identical quantization, LCG hyperplane buckets, candidate set,
    // and exact quantized cosine — the whole ANN pipeline is hash-graded
    // (the llm_embed_dups trick applied to top-k search). The float-tier
    // lshTopK stays the production path (SimilaritySpec).
    Q(
      "llm_lsh_topk",
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |sig AS (
        |  SELECT vec_id, SUM(CASE WHEN dot >= 0 THEN 1 << bit ELSE 0 END) AS sig
        |  FROM (
        |    SELECT q.vec_id, bt.bit,
        |      list_reduce(list_transform(range(1, len(q.qv) + 1),
        |        i -> q.qv[i] * ((1103515245 * (bt.bit * 1259 + (i - 1)) + 12345) % 2097152 - 1048576)),
        |        (x, y) -> x + y) AS dot
        |    FROM q, (SELECT unnest(generate_series(0, 7)) AS bit) bt)
        |  GROUP BY vec_id),
        |n AS (SELECT vec_id, qv,
        |  list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS nrm
        |  FROM q),
        |cand AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS corpus_id
        |  FROM sig p JOIN sig c ON p.sig = c.sig
        |  WHERE p.vec_id < 10),
        |scored AS (
        |  SELECT cand.probe_id, cand.corpus_id,
        |    CAST(list_reduce(list_transform(range(1, len(a.qv) + 1),
        |        i -> a.qv[i] * b.qv[i]), (x, y) -> x + y) AS DOUBLE)
        |      / NULLIF(sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)), 0) AS sim
        |  FROM cand JOIN n a ON cand.probe_id = a.vec_id
        |            JOIN n b ON cand.corpus_id = b.vec_id)
        |SELECT probe_id, corpus_id, sim, rk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, corpus_id) AS rk
        |  FROM scored) WHERE rk <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopKQuantized(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        emb.repartition(fan(s), col("vec_id"))
          .select(col("vec_id").as("corpus_id"), col("embedding")),
        k = 5, bands = 1, bitsPerBand = 8, scale = 1000)
    },

    // IVF ANN, oracle-checked end-to-end INCLUDING the index build: seeds =
    // quantized vectors with vec_id < 16, one exact-integer Lloyd round
    // (floor-mean centroids), nprobe=3 routing, quantized cosine. DuckDB
    // re-trains the identical index from scratch. The float ivfTrain/
    // ivfTopK/ivfWriteBucketed production path keeps its recall +
    // bucketed-plan specs (SimilaritySpec).
    Q(
      "llm_ivf_topk",
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |seed AS (SELECT CAST(vec_id AS INT) AS cell, qv AS cv FROM q WHERE vec_id < 16),
        |a1 AS (
        |  SELECT vec_id, qv, cell FROM (
        |    SELECT q.vec_id, q.qv, s.cell,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(q.qv) + 1),
        |          i -> (q.qv[i] - s.cv[i]) * (q.qv[i] - s.cv[i])),
        |          (a, b) -> a + b), s.cell) AS rk
        |    FROM q, seed s) WHERE rk = 1),
        |cexp AS (SELECT cell, unnest(range(1, len(qv) + 1)) AS i, unnest(qv) AS x FROM a1),
        |centd AS (SELECT cell, i, CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |  FROM cexp GROUP BY cell, i),
        |cent2 AS (SELECT cell, list(m ORDER BY i) AS cv FROM centd GROUP BY cell),
        |corpus AS (
        |  SELECT vec_id, qv, cell,
        |    list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS nrm
        |  FROM (
        |    SELECT q.vec_id, q.qv, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(q.qv) + 1),
        |          i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])),
        |          (a, b) -> a + b), c.cell) AS rk
        |    FROM q, cent2 c) WHERE rk = 1),
        |probes AS (
        |  SELECT vec_id, qv, cell,
        |    list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS nrm
        |  FROM (
        |    SELECT q.vec_id, q.qv, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(q.qv) + 1),
        |          i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])),
        |          (a, b) -> a + b), c.cell) AS rk
        |    FROM q, cent2 c WHERE q.vec_id < 10) WHERE rk <= 3),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS corpus_id,
        |    CAST(list_reduce(list_transform(range(1, len(p.qv) + 1),
        |        i -> p.qv[i] * c.qv[i]), (x, y) -> x + y) AS DOUBLE)
        |      / NULLIF(sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(c.nrm AS DOUBLE)), 0) AS sim
        |  FROM probes p JOIN corpus c ON p.cell = c.cell)
        |SELECT probe_id, corpus_id, sim, rk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY sim DESC, corpus_id) AS rk
        |  FROM scored) WHERE rk <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopKQuantized(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        emb.repartition(fan(s), col("vec_id"))
          .select(col("vec_id").as("corpus_id"), col("embedding")),
        nCells = 16, k = 5, nprobe = 3, scale = 1000)
    },

    // Product-quantization ANN (Jégou et al. 2011), oracle-checked
    // end-to-end INCLUDING the codebook training: vectors split into 4
    // subvectors, per-subspace codebooks (seeds = ids < 16, one exact
    // floor-mean Lloyd round), corpus stored as 4-code arrays only, and
    // probes score by Asymmetric Distance Computation (an m × ksub exact
    // lookup table per probe; corpus distance = 4 lookups summed).
    // DuckDB re-trains the codebooks and re-derives every code, lookup,
    // and rank — all integer arithmetic. The compression story: 64-dim
    // float32 → 4 codes is the representation an ADC scan serves at
    // 100 TB without touching raw vectors.
    Q(
      "llm_pq_topk",
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |subs AS (
        |  SELECT vec_id, j, qv[j*(len(qv)//4)+1 : (j+1)*(len(qv)//4)] AS sv
        |  FROM q, (SELECT unnest(range(0, 4)) AS j)),
        |seed AS (SELECT j, CAST(vec_id AS INT) AS cid, sv AS cv
        |  FROM subs WHERE vec_id < 16),
        |a1 AS (SELECT j, cid, sv FROM (
        |    SELECT s.vec_id, s.j, se.cid, s.sv,
        |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
        |        list_reduce(list_transform(range(1, len(s.sv) + 1),
        |          i -> (s.sv[i] - se.cv[i]) * (s.sv[i] - se.cv[i])),
        |          (a, b) -> a + b), se.cid) AS rk
        |    FROM subs s JOIN seed se ON s.j = se.j) WHERE rk = 1),
        |cexp AS (SELECT j, cid, unnest(range(1, len(sv) + 1)) AS d,
        |    unnest(sv) AS x FROM a1),
        |centd AS (SELECT j, cid, d,
        |    CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |  FROM cexp GROUP BY j, cid, d),
        |books AS (SELECT j, cid, list(m ORDER BY d) AS cv
        |  FROM centd GROUP BY j, cid),
        |codes AS (SELECT vec_id, j, code FROM (
        |    SELECT s.vec_id, s.j, b.cid AS code,
        |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
        |        list_reduce(list_transform(range(1, len(s.sv) + 1),
        |          i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i])),
        |          (a, b) -> a + b), b.cid) AS rk
        |    FROM subs s JOIN books b ON s.j = b.j) WHERE rk = 1),
        |lut AS (SELECT s.vec_id AS probe_id, s.j, b.cid AS code,
        |    list_reduce(list_transform(range(1, len(s.sv) + 1),
        |      i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i])),
        |      (a, b) -> a + b) AS d2
        |  FROM subs s JOIN books b ON s.j = b.j WHERE s.vec_id < 10),
        |scored AS (SELECT l.probe_id, c.vec_id AS corpus_id,
        |    CAST(SUM(l.d2) AS BIGINT) AS ad2
        |  FROM codes c JOIN lut l ON c.j = l.j AND c.code = l.code
        |  GROUP BY l.probe_id, c.vec_id)
        |SELECT probe_id, corpus_id, ad2, rk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY ad2, corpus_id) AS rk FROM scored)
        |WHERE rk <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        emb.repartition(fan(s), col("vec_id"))
          .select(col("vec_id").as("corpus_id"), col("embedding")),
        m = 4, ksub = 16, k = 5, scale = 1000)
    },

    // IVF-PQ composite (IVFADC minus residual re-centering): coarse
    // cells route each probe to nprobe=2 cells; candidates are scored
    // ONLY from their PQ codes via the probe's ADC lookup table. The
    // oracle re-trains BOTH quantizers (coarse k-means over full
    // vectors, per-subspace PQ codebooks) and re-derives every routing,
    // code, lookup, and rank — end to end in exact integers.
    Q(
      "llm_ivfpq_topk",
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |seedc AS (SELECT CAST(vec_id AS INT) AS cell, qv AS cv
        |  FROM q WHERE vec_id < 8),
        |ca1 AS (SELECT vec_id, qv, cell FROM (
        |    SELECT q.vec_id, q.qv, s.cell,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(q.qv) + 1),
        |          i -> (q.qv[i] - s.cv[i]) * (q.qv[i] - s.cv[i])),
        |          (a, b) -> a + b), s.cell) AS rk
        |    FROM q, seedc s) WHERE rk = 1),
        |cx AS (SELECT cell, unnest(range(1, len(qv) + 1)) AS i,
        |    unnest(qv) AS x FROM ca1),
        |cm AS (SELECT cell, i,
        |    CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |  FROM cx GROUP BY cell, i),
        |cent2 AS (SELECT cell, list(m ORDER BY i) AS cv
        |  FROM cm GROUP BY cell),
        |ccell AS (SELECT vec_id, cell FROM (
        |    SELECT q.vec_id, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(q.qv) + 1),
        |          i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])),
        |          (a, b) -> a + b), c.cell) AS rk
        |    FROM q, cent2 c) WHERE rk = 1),
        |pcell AS (SELECT vec_id, cell FROM (
        |    SELECT q.vec_id, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(q.qv) + 1),
        |          i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])),
        |          (a, b) -> a + b), c.cell) AS rk
        |    FROM q, cent2 c WHERE q.vec_id < 10) WHERE rk <= 2),
        |subs AS (
        |  SELECT vec_id, j, qv[j*(len(qv)//4)+1 : (j+1)*(len(qv)//4)] AS sv
        |  FROM q, (SELECT unnest(range(0, 4)) AS j)),
        |seedf AS (SELECT j, CAST(vec_id AS INT) AS cid, sv AS cv
        |  FROM subs WHERE vec_id < 16),
        |fa1 AS (SELECT j, cid, sv FROM (
        |    SELECT s.vec_id, s.j, se.cid, s.sv,
        |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
        |        list_reduce(list_transform(range(1, len(s.sv) + 1),
        |          i -> (s.sv[i] - se.cv[i]) * (s.sv[i] - se.cv[i])),
        |          (a, b) -> a + b), se.cid) AS rk
        |    FROM subs s JOIN seedf se ON s.j = se.j) WHERE rk = 1),
        |fx AS (SELECT j, cid, unnest(range(1, len(sv) + 1)) AS d,
        |    unnest(sv) AS x FROM fa1),
        |fm AS (SELECT j, cid, d,
        |    CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |  FROM fx GROUP BY j, cid, d),
        |books AS (SELECT j, cid, list(m ORDER BY d) AS cv
        |  FROM fm GROUP BY j, cid),
        |codes AS (SELECT vec_id, j, code FROM (
        |    SELECT s.vec_id, s.j, b.cid AS code,
        |      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j ORDER BY
        |        list_reduce(list_transform(range(1, len(s.sv) + 1),
        |          i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i])),
        |          (a, b) -> a + b), b.cid) AS rk
        |    FROM subs s JOIN books b ON s.j = b.j) WHERE rk = 1),
        |lut AS (SELECT s.vec_id AS probe_id, s.j, b.cid AS code,
        |    list_reduce(list_transform(range(1, len(s.sv) + 1),
        |      i -> (s.sv[i] - b.cv[i]) * (s.sv[i] - b.cv[i])),
        |      (a, b) -> a + b) AS d2
        |  FROM subs s JOIN books b ON s.j = b.j WHERE s.vec_id < 10),
        |scored AS (SELECT l.probe_id, c.vec_id AS corpus_id,
        |    CAST(SUM(l.d2) AS BIGINT) AS ad2
        |  FROM codes c
        |  JOIN ccell cc ON c.vec_id = cc.vec_id
        |  JOIN pcell p ON cc.cell = p.cell
        |  JOIN lut l ON l.probe_id = p.vec_id AND l.j = c.j
        |    AND l.code = c.code
        |  GROUP BY l.probe_id, c.vec_id)
        |SELECT probe_id, corpus_id, ad2, rk FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY ad2, corpus_id) AS rk FROM scored)
        |WHERE rk <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.ivfPqTopK(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("probe_id"), col("embedding")),
        emb.repartition(fan(s), col("vec_id"))
          .select(col("vec_id").as("corpus_id"), col("embedding")),
        nCells = 8, m = 4, ksub = 16, k = 5, nprobe = 2, scale = 1000)
    },

    // Benchmark decontamination: fraction of each document's distinct
    // 3-grams that appear in a "benchmark" set (docs 0-49 here). Corpus
    // and contamination set meet only through an n-gram-hash equi-join —
    // never all-pairs.
    // n-gram hashes via ONE Karp-Rabin fold per token + arithmetic fold
    // of the 3 token hashes per gram — no crypto digest anywhere, no gram
    // strings, and DuckDB folds the identical BIGINT recurrence (md5 per
    // token was the battery's dominant CPU line; pure-BIGINT per-char
    // folds measured ~4x cheaper inside the interpreted HOF lambda).
    Q(
      "llm_decontaminate",
      s"""WITH toks AS (SELECT doc_id, $tk AS tkn FROM documents),
         |th AS (SELECT doc_id,
         |    list_transform(tkn, t -> ${polyh("t")}) AS hs
         |  FROM toks WHERE len(tkn) >= 3),
         |dg AS (SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, len(hs) - 1),
         |      i -> list_reduce(list_prepend(CAST(7 AS BIGINT), hs[i:i+2]),
         |        (acc, h) -> (acc * 131 + h) % ${Dedup.FP_P})))) AS h
         |  FROM th),
         |cs AS (SELECT DISTINCT h FROM dg WHERE doc_id < 50),
         |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM dg GROUP BY doc_id),
         |hit AS (SELECT doc_id, COUNT(*) AS n_hit FROM dg
         |  WHERE h IN (SELECT h FROM cs) GROUP BY doc_id)
         |SELECT t.doc_id, n_grams, COALESCE(n_hit, 0) AS n_hit,
         |  COALESCE(n_hit, 0) * 1.0 / n_grams AS contamination
         |FROM tot t LEFT JOIN hit USING (doc_id)""".stripMargin) { (s, dir) =>
      // the local documents table is ONE parquet row group = one task;
      // fan out before the CPU-heavy hashing projection (a real scan
      // at scale already has thousands of partitions — this shuffle of
      // 5k short rows is the local stand-in, not a scale cost)
      val docs = t(s, dir, "documents").repartition(fan(s), col("doc_id"))
      Dedup.contaminationScoreRolling(
        docs, "doc_id", "text",
        docs.filter(col("doc_id") < 50), "text", n = 3)
    },

    // Bloom-prefiltered decontamination — same exact overlap contract
    // (the sketch only prunes join INPUT; the confirm join restores
    // exactness, so DuckDB grades the full pipeline with plain SQL).
    // The 100-TB shape: non-contaminated grams are dropped scan-side by
    // might_contain against a megabyte sketch instead of paying the
    // equi-join shuffle.
    Q(
      "llm_bloom_decontaminate",
      s"""WITH toks AS (SELECT doc_id, $tk AS tkn FROM documents),
         |th AS (SELECT doc_id,
         |    list_transform(tkn, t -> ${polyh("t")}) AS hs
         |  FROM toks WHERE len(tkn) >= 3),
         |dg AS (SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, len(hs) - 1),
         |      i -> list_reduce(list_prepend(CAST(7 AS BIGINT), hs[i:i+2]),
         |        (acc, h) -> (acc * 131 + h) % ${Dedup.FP_P})))) AS h
         |  FROM th),
         |cs AS (SELECT DISTINCT h FROM dg WHERE doc_id < 80),
         |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM dg GROUP BY doc_id),
         |hit AS (SELECT doc_id, COUNT(*) AS n_hit FROM dg
         |  WHERE h IN (SELECT h FROM cs) GROUP BY doc_id)
         |SELECT t.doc_id, n_grams, COALESCE(n_hit, 0) AS n_hit,
         |  COALESCE(n_hit, 0) * 1.0 / n_grams AS contamination
         |FROM tot t LEFT JOIN hit USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").repartition(fan(s), col("doc_id"))
      Dedup.bloomContaminationScore(
        docs, "doc_id", "text",
        docs.filter(col("doc_id") < 80), "text", n = 3)
    },

    // PII scrubbing: both engines synthesize the same deterministic PII
    // (email/phone/IP derived from doc_id), then this side runs the
    // scrubber while the oracle applies the identical regex chain.
    Q(
      "llm_pii_scrub",
      { val aug = "text || ' reach: user' || doc_id || " +
          "'@mail.example.com or (555) 123-' || " +
          "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || " +
          "' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
        // standard SQL strings pass backslashes through untouched — the
        // Scala-level pattern is already the literal regex
        val scrubbed = TextAnalysis.piiPatterns.foldLeft(aug) {
          case (t, (re, tag)) =>
            s"regexp_replace($t, '$re', '$tag', 'g')"
        }
        s"""SELECT doc_id, $scrubbed AS clean,
           |  CAST(len(regexp_extract_all($aug,
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails
           |FROM documents""".stripMargin
      }) { (s, dir) =>
      val aug = concat(col("text"), lit(" reach: user"), col("doc_id"),
        lit("@mail.example.com or (555) 123-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"))
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.scrubPii(aug).as("clean"),
        size(regexp_extract_all(aug,
          lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0)))
          .cast("long").as("n_emails"))
    },

    // Deterministic hash-bucket sampling: per-language rates, pure
    // stateless filter on the scan (the only reproducible sampling
    // discipline at 100 TB — no RNG state, partitioning-independent).
    Q(
      "llm_sample_stratified",
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${Sampling.sqlHashBucket("doc_id", 7)} <
         |  CASE lang WHEN 'en' THEN 250000 WHEN 'de' THEN 800000
         |            WHEN 'zh' THEN 1000000 ELSE 500000 END""".stripMargin) {
      (s, dir) =>
        Sampling.stratifiedSample(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id",
          rates = Map("en" -> 0.25, "de" -> 0.8, "zh" -> 1.0),
          defaultRate = 0.5)
    },

    // Exactly-k-per-stratum deterministic sample, chosen by hash order
    // (reservoir analogue; row_number <= k gets WindowGroupLimit pushdown).
    Q(
      "llm_sample_topk",
      s"""SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (
         |  SELECT doc_id, lang, ROW_NUMBER() OVER (
         |    PARTITION BY lang
         |    ORDER BY ${Sampling.sqlHashBucket("doc_id", 7)}, doc_id) AS rk
         |  FROM documents) WHERE rk <= 20""".stripMargin) { (s, dir) =>
      Sampling.topKPerStratum(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", k = 20)
    },

    // Source mixing to target proportions: tiny per-language count agg ->
    // integer-exact keep thresholds -> broadcast back onto the scan.
    Q(
      "llm_sample_mix",
      s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
         |w(lang, w) AS (VALUES ('en', CAST(400000 AS BIGINT)),
         |  ('de', 200000), ('fr', 150000), ('es', 150000), ('zh', 100000)),
         |cw AS (SELECT c.lang, n, w FROM c JOIN w ON c.lang = w.lang),
         |nn AS (SELECT MIN(n * 1000000 // w) AS ntot FROM cw),
         |r AS (SELECT lang, LEAST(1000000, w * ntot // n) AS thr FROM cw, nn)
         |SELECT d.doc_id, d.lang FROM documents d
         |JOIN r ON d.lang = r.lang
         |WHERE ${Sampling.sqlHashBucket("d.doc_id", 7)} < r.thr""".stripMargin) {
      (s, dir) =>
        Sampling.mixToProportions(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id",
          weightsPpm = Map("en" -> 400000L, "de" -> 200000L,
            "fr" -> 150000L, "es" -> 150000L, "zh" -> 100000L))
          .select(col("doc_id"), col("lang"))
    },

    // Token-weighted source mixing: the mixture is a TOKEN budget (the
    // unit training recipes use), so per-language thresholds derive from
    // exact BIGINT token sums instead of doc counts; same stateless
    // hash-filter keep decision.
    Q(
      "llm_sample_mix_tokens",
      s"""WITH c AS (SELECT lang, CAST(SUM(len($tk)) AS BIGINT) AS n
         |  FROM documents GROUP BY lang),
         |w(lang, w) AS (VALUES ('en', CAST(400000 AS BIGINT)),
         |  ('de', 200000), ('fr', 150000), ('es', 150000), ('zh', 100000)),
         |cw AS (SELECT c.lang, n, w FROM c JOIN w ON c.lang = w.lang),
         |nn AS (SELECT MIN(n * 1000000 // w) AS ntot FROM cw),
         |r AS (SELECT lang, LEAST(1000000, w * ntot // n) AS thr FROM cw, nn)
         |SELECT d.doc_id, d.lang, CAST(len($tk) AS BIGINT) AS n_tokens
         |FROM documents d
         |JOIN r ON d.lang = r.lang
         |WHERE ${Sampling.sqlHashBucket("d.doc_id", 7)} < r.thr""".stripMargin) {
      (s, dir) =>
        Sampling.mixToProportionsByWeight(
          t(s, dir, "documents").select(col("doc_id"), col("lang"),
            size(TextAnalysis.tokens(col("text"))).cast("long")
              .as("n_tokens")),
          "lang", "doc_id", "n_tokens",
          weightsPpm = Map("en" -> 400000L, "de" -> 200000L,
            "fr" -> 150000L, "es" -> 150000L, "zh" -> 100000L))
          .select(col("doc_id"), col("lang"), col("n_tokens"))
    },

    // Deterministic global shuffle into training shards: shard + position
    // derived only from (id, seed) — identical across partitionings,
    // retries, and cluster sizes (epoch reshuffle = a new seed). The one
    // exchange is on shard, which the shard-file write needs anyway.
    Q(
      "llm_shard_shuffle",
      s"""SELECT doc_id,
         |  (${Sampling.sqlHashBucket("doc_id", 7)}) % 8 AS shard,
         |  ROW_NUMBER() OVER (
         |    PARTITION BY (${Sampling.sqlHashBucket("doc_id", 7)}) % 8
         |    ORDER BY ${Sampling.sqlHashBucket("doc_id", 8)}, doc_id) - 1 AS pos
         |FROM documents""".stripMargin) { (s, dir) =>
      Sampling.shardAssign(
        t(s, dir, "documents").select(col("doc_id")), "doc_id", nShards = 8)
    },

    // BM25 retrieval scoring against a fixed query-term set — the
    // standard relevance scorer for retrieval-based curation (topic
    // selection, near-benchmark triage). Rational k1=12/10, b=3/4 and
    // the ln-free idf make every term contribution ONE exact integer
    // fraction; per-doc scores are exact BIGINT sums of quantized
    // contributions (order-independent — the ANN-cosine discipline),
    // which DuckDB re-derives term for term. 'dup' is the one rare term
    // (df~25 of 500) so the idf contrast is exercised.
    Q(
      "llm_bm25",
      s"""WITH d AS (SELECT doc_id, $tk AS tkn FROM documents),
         |dd AS (SELECT doc_id, CAST(len(tkn) AS BIGINT) AS dl, tkn FROM d),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(dl) AS BIGINT) AS t FROM dd),
         |e AS (SELECT doc_id, dl, unnest(tkn) AS term FROM dd),
         |tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tfv
         |  FROM e WHERE term IN ('join', 'filter', 'dup') GROUP BY 1, 2, 3),
         |dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dfv
         |  FROM tf GROUP BY 1),
         |c AS (SELECT tf.doc_id,
         |    ((2*n - 2*dfv + 1) * 22 * tfv * t * 10000) //
         |    ((2*dfv + 1) * (10*t*tfv + 3*t + 9*dl*n)) AS contrib
         |  FROM tf JOIN dfs USING (term) CROSS JOIN tot),
         |s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit,
         |  CAST(SUM(contrib) AS BIGINT) AS score_q FROM c GROUP BY 1)
         |SELECT dd.doc_id, COALESCE(n_hit, 0) AS n_hit,
         |  COALESCE(score_q, 0) AS score_q,
         |  CAST(COALESCE(score_q, 0) AS DOUBLE) / 10000 AS score
         |FROM dd LEFT JOIN s USING (doc_id)""".stripMargin) { (s, dir) =>
      TextAnalysis.bm25Score(
        t(s, dir, "documents").repartition(fan(s), col("doc_id"))
          .select(col("doc_id"), col("text")),
        "doc_id", "text", Seq("join", "filter", "dup"))
    },

    // Corpus unigram-frequency scoring — the LM-free CCNet/Gopher
    // commonness signal: vocab counts from a map-side-combined groupBy,
    // broadcast back onto the exploded scan, integer-exact per-doc sums;
    // the only doubles are two final single divisions per row.
    Q(
      "llm_unigram_lm",
      s"""WITH e AS (SELECT doc_id, unnest($tk) AS t FROM documents),
         |cf AS (SELECT t, COUNT(*) AS cf FROM e GROUP BY t)
         |SELECT e.doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(cf) AS BIGINT) AS sum_cf,
         |  CAST(SUM(cf) AS DOUBLE) / COUNT(*) AS mean_cf,
         |  CAST(SUM(CASE WHEN cf <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         |    AS rare_frac
         |FROM e JOIN cf USING (t) GROUP BY e.doc_id""".stripMargin) {
      (s, dir) =>
        TextAnalysis.unigramScore(
          t(s, dir, "documents").repartition(fan(s), col("doc_id"))
            .select(col("doc_id"), col("text")), "doc_id", "text")
    },

    // Bigram-LM fluency features — the word-ORDER commonness axis above
    // llm_unigram_lm: bigram + unigram vocab tables broadcast onto the
    // exploded scan; per-doc sums exact BIGINT; cond_p is the pooled
    // stupid-backoff Σcf(w1 w2)/Σcf(w1) with ONE IEEE division per row
    // (a per-bigram double mean would be partition-order-dependent).
    Q(
      "llm_bigram_lm",
      s"""WITH tok AS (SELECT doc_id, $tk AS tkn FROM documents),
         |e AS (SELECT doc_id, tkn[i] AS w1, tkn[i+1] AS w2
         |  FROM tok, UNNEST(range(1, len(tkn))) AS u(i)),
         |uf AS (SELECT t, COUNT(*) AS uf
         |  FROM (SELECT unnest(tkn) AS t FROM tok) GROUP BY t),
         |bf AS (SELECT w1, w2, COUNT(*) AS bf FROM e GROUP BY 1, 2)
         |SELECT doc_id, COUNT(*) AS n_bigrams,
         |  CAST(SUM(bf) AS BIGINT) AS sum_bf,
         |  CAST(SUM(CASE WHEN bf <= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         |    AS rare_frac,
         |  CAST(SUM(bf) AS DOUBLE) / SUM(uf) AS cond_p
         |FROM e JOIN bf USING (w1, w2) JOIN uf ON e.w1 = uf.t
         |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.bigramScore(
        t(s, dir, "documents").repartition(fan(s), col("doc_id"))
          .select(col("doc_id"), col("text")), "doc_id", "text")
    },

    // DSIR-style importance resampling (Xie et al. 2023): hashed-unigram
    // bucket profiles, target = the English slice, importance = pooled
    // (Σ(t+1)·(R+B))/(Σ(r+1)·(T+B)) — exact BIGINT sums/products, ONE
    // IEEE division (the paper's log-ratio sum linearized for
    // cross-engine determinism; add-one smoothing symmetric on both
    // distributions). keep = more-target-like than the corpus average.
    // The bucket table is ≤ 256 rows at ANY corpus size → broadcast.
    Q(
      "llm_dsir",
      s"""WITH e AS (SELECT doc_id, lang = 'en' AS is_t,
         |    ${md5h(5, "t")} % 256 AS b
         |  FROM (SELECT doc_id, lang, unnest($tk) AS t FROM documents)),
         |v AS (SELECT b, COUNT(*) AS r,
         |    SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc
         |  FROM e GROUP BY b),
         |tot AS (SELECT CAST(SUM(r) AS BIGINT) AS rtot,
         |    CAST(SUM(tc) AS BIGINT) AS ttot FROM v)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(tc + 1) AS BIGINT) AS s_target,
         |  CAST(SUM(r + 1) AS BIGINT) AS s_raw,
         |  CAST(CAST(SUM(tc + 1) AS BIGINT) * (MAX(rtot) + 256) AS DOUBLE)
         |    / CAST(CAST(SUM(r + 1) AS BIGINT) * (MAX(ttot) + 256) AS DOUBLE)
         |    AS ratio,
         |  CAST(CAST(SUM(tc + 1) AS BIGINT) * (MAX(rtot) + 256) AS DOUBLE)
         |    / CAST(CAST(SUM(r + 1) AS BIGINT) * (MAX(ttot) + 256) AS DOUBLE)
         |    > 1.0 AS keep
         |FROM e JOIN v USING (b) CROSS JOIN tot
         |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      TextAnalysis.dsirScore(
        t(s, dir, "documents").repartition(fan(s), col("doc_id"))
          .select(col("doc_id"), col("text"), col("lang")),
        "doc_id", "text", col("lang") === "en")
    },

    // Contamination-aware train/val/test split: assignment from
    // (doc_id, seed) only — stable across layouts/retries/growth — with
    // benchmark-contaminated docs (rolling-gram overlap vs the doc_id<50
    // "benchmark" set, as in llm_decontaminate) forced into a quarantine
    // lane so eval text cannot leak into training shards. Pure stateless
    // projection after the decontamination join.
    Q(
      "llm_split",
      s"""WITH toks AS (SELECT doc_id, $tk AS tkn FROM documents),
         |th AS (SELECT doc_id,
         |    list_transform(tkn, t -> ${polyh("t")}) AS hs
         |  FROM toks WHERE len(tkn) >= 3),
         |dg AS (SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, len(hs) - 1),
         |      i -> list_reduce(list_prepend(CAST(7 AS BIGINT), hs[i:i+2]),
         |        (acc, h) -> (acc * 131 + h) % ${Dedup.FP_P})))) AS h
         |  FROM th),
         |cs AS (SELECT DISTINCT h FROM dg WHERE doc_id < 50),
         |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM dg GROUP BY doc_id),
         |hit AS (SELECT doc_id, COUNT(*) AS n_hit FROM dg
         |  WHERE h IN (SELECT h FROM cs) GROUP BY doc_id),
         |c AS (SELECT t.doc_id,
         |    COALESCE(n_hit, 0) * 1.0 / n_grams AS contamination
         |  FROM tot t LEFT JOIN hit USING (doc_id)),
         |b AS (SELECT d.doc_id,
         |    (${Sampling.sqlHashBucket("d.doc_id", 11)}) % 100 AS bucket,
         |    COALESCE(c.contamination, 0) AS contamination
         |  FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id)
         |SELECT doc_id, bucket,
         |  CASE WHEN contamination >= 0.2 THEN 'quarantine'
         |       WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").repartition(fan(s), col("doc_id"))
      val contam = Dedup.contaminationScoreRolling(
        docs, "doc_id", "text",
        docs.filter(col("doc_id") < 50), "text", n = 3)
        .select(col("doc_id"), col("contamination"))
      Sampling.splitAssign(
        docs.select("doc_id").join(broadcast(contam), Seq("doc_id"), "left"),
        "doc_id", seed = 11, trainPct = 80, valPct = 10,
        quarantine = coalesce(col("contamination"), lit(0.0)) >= 0.2)
        .select(col("doc_id"), col("bucket"), col("split"))
    },

    // End-to-end curation pipeline as ONE graded unit: quality gate
    // (token-count window) → exact dedup (first arrival per canonical
    // fingerprint) → benchmark decontamination (drop rolling-3-gram
    // overlap ≥ 0.2 vs the doc_id<50 eval set) → deterministic split
    // assignment. Every stage is a library op used elsewhere; grading the
    // composition catches stage-interface drift (column renames, null
    // handling between stages) that per-stage oracles cannot.
    Q(
      "llm_curate_e2e",
      s"""WITH g AS (SELECT doc_id, text, CAST(len($tk) AS BIGINT) AS n_tokens
         |  FROM documents WHERE len($tk) BETWEEN 10 AND 90),
         |w AS (SELECT MIN(doc_id) AS doc_id FROM g
         |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
         |win AS (SELECT g.* FROM g JOIN w USING (doc_id)),
         |bh AS (SELECT doc_id,
         |    list_transform($tk, t -> ${polyh("t")}) AS hs
         |  FROM documents WHERE doc_id < 50 AND len($tk) >= 3),
         |cs AS (SELECT DISTINCT unnest(list_distinct(
         |    list_transform(range(1, len(hs) - 1),
         |      i -> list_reduce(list_prepend(CAST(7 AS BIGINT), hs[i:i+2]),
         |        (acc, h) -> (acc * 131 + h) % ${Dedup.FP_P})))) AS h
         |  FROM bh),
         |th AS (SELECT doc_id,
         |    list_transform($tk, t -> ${polyh("t")}) AS hs
         |  FROM win),
         |dg AS (SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, len(hs) - 1),
         |      i -> list_reduce(list_prepend(CAST(7 AS BIGINT), hs[i:i+2]),
         |        (acc, h) -> (acc * 131 + h) % ${Dedup.FP_P})))) AS h
         |  FROM th),
         |c AS (SELECT doc_id,
         |    SUM(CASE WHEN h IN (SELECT h FROM cs) THEN 1 ELSE 0 END) * 1.0
         |      / COUNT(*) AS contamination
         |  FROM dg GROUP BY doc_id),
         |k AS (SELECT win.doc_id, win.n_tokens,
         |    (${Sampling.sqlHashBucket("win.doc_id", 11)}) % 100 AS bucket
         |  FROM win LEFT JOIN c ON win.doc_id = c.doc_id
         |  WHERE COALESCE(c.contamination, 0) < 0.2)
         |SELECT doc_id, n_tokens, bucket,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM k""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents").repartition(fan(s), col("doc_id"))
      val gated = docs
        .withColumn("n_tokens",
          size(TextAnalysis.tokens(col("text"))).cast("long"))
        .filter(col("n_tokens").between(10, 90))
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val firsts = gated.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id"))
      // winners feeds the contamination scorer AND the clean-side probe —
      // snapshot so the tokenize+fingerprint+dedup lineage runs once
      val winners = gated.join(firsts, Seq("fp", "doc_id"))
        .select("doc_id", "text", "n_tokens")
        .localCheckpoint(true)
      val contam = Dedup.contaminationScoreRolling(
        winners, "doc_id", "text",
        docs.filter(col("doc_id") < 50), "text", n = 3)
        .select(col("doc_id"), col("contamination"))
      val clean = winners.join(broadcast(contam), Seq("doc_id"), "left")
        .filter(coalesce(col("contamination"), lit(0.0)) < 0.2)
      Sampling.splitAssign(clean.select("doc_id", "n_tokens"), "doc_id",
        seed = 11, trainPct = 80, valPct = 10)
        .select("doc_id", "n_tokens", "bucket", "split")
    },

    // Exact 5-token-span duplicate pairs (Lee et al. 2022 exact-substring
    // dedup, relational form): distinct (doc, span-hash) rows self-join on
    // the hash — never document all-pairs — behind a document-frequency
    // gate (df in [2, 50]) that drops unpairable singletons and caps the
    // boilerplate-span pair fan-out. DuckDB re-derives the identical
    // Karp-Rabin span hashes, gate, and pair counts.
    Q(
      "llm_span_dups",
      s"""WITH toks AS (SELECT doc_id, $tk AS tkn FROM documents),
         |th AS (SELECT doc_id,
         |    list_transform(tkn, t -> ${polyh("t")}) AS hs
         |  FROM toks WHERE len(tkn) >= 5),
         |dg AS (SELECT doc_id, unnest(list_distinct(
         |    list_transform(range(1, len(hs) - 3),
         |      i -> list_reduce(list_prepend(CAST(7 AS BIGINT), hs[i:i+4]),
         |        (acc, h) -> (acc * 131 + h) % ${Dedup.FP_P})))) AS h
         |  FROM th),
         |gate AS (SELECT h FROM dg GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 50),
         |g AS (SELECT doc_id, h FROM dg JOIN gate USING (h))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_spans
         |FROM g a JOIN g b USING (h) WHERE a.doc_id < b.doc_id
         |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Dedup.spanDupPairs(
        t(s, dir, "documents").repartition(fan(s), col("doc_id"))
          .select(col("doc_id"), col("text")),
        "doc_id", "text", k = 5, maxDf = 50L)
    },

    // Sequence packing: documents fill fixed token-budget training bins,
    // ordered by seeded content hash within hash-assigned buckets — the
    // deterministic, partition-independent packing discipline (a global
    // cumulative sum would be the unscalable form). DuckDB re-derives
    // the identical buckets, order, running totals, and bin ids.
    Q(
      "llm_pack",
      s"""WITH d AS (SELECT doc_id, CAST(len($tk) AS BIGINT) AS n FROM documents),
         |b AS (SELECT doc_id, n,
         |  (${Sampling.sqlHashBucket("doc_id", 7)}) % 8 AS bucket,
         |  ${Sampling.sqlHashBucket("doc_id", 8)} AS ord FROM d),
         |w AS (SELECT doc_id, bucket, n,
         |  CAST(COALESCE(SUM(n) OVER (PARTITION BY bucket ORDER BY ord, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_before
         |  FROM b)
         |SELECT doc_id, bucket, CAST(FLOOR(tok_before / 2048) AS BIGINT) AS bin,
         |  n AS n_tokens, tok_before FROM w""".stripMargin) { (s, dir) =>
      Packing.packBins(
        t(s, dir, "documents").select(col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budget = 2048L, nBuckets = 8, seed = 7)
    },

    // Context-length chunking: overlapping token windows (size 64,
    // overlap 16) — one row per chunk, boundaries by pure arithmetic both
    // engines share.
    Q(
      "llm_chunk",
      s"""WITH t AS (SELECT doc_id, $tk AS tkn FROM documents),
         |n AS (SELECT doc_id, tkn,
         |  1 + CAST(FLOOR((GREATEST(len(tkn) - 64, 0) + 47) / 48) AS INT) AS nch
         |  FROM t WHERE len(tkn) >= 1),
         |e AS (SELECT doc_id, tkn, unnest(range(0, nch)) AS chunk_id FROM n)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  array_to_string(tkn[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk
         |FROM e""".stripMargin) { (s, dir) =>
      t(s, dir, "documents").repartition(fan(s), col("doc_id"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
        .filter(size(col("_toks")) >= 1)
        .select(col("doc_id"),
          explode(Packing.chunkTokens(col("_toks"), 64, 16)).as("c"))
        .select(col("doc_id"), col("c.chunk_id").as("chunk_id"),
          col("c.text").as("chunk"))
    },

    // Repetition detection (the quality-filter dimension the plain stats
    // miss: heavily templated/looping documents): duplicate-token
    // fraction plus most-frequent word bigram/trigram and its share of
    // all n-gram slots. The Spark side never explodes — top n-gram is a
    // per-row sort + run-length fold on the scan — while the oracle
    // re-derives the same values relationally (unnest + group + window).
    Q(
      "llm_repetition",
      s"""WITH tkv AS (SELECT doc_id, $tk AS toks FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |  i -> toks[i] || ' ' || toks[i+1])) AS g FROM tkv),
         |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
         |b1 AS (SELECT doc_id, g, c FROM (SELECT doc_id, g, c,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) rn
         |  FROM bc) WHERE rn = 1),
         |tg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
         |  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS g FROM tkv),
         |tc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
         |t1 AS (SELECT doc_id, c FROM (SELECT doc_id, c,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) rn
         |  FROM tc) WHERE rn = 1)
         |SELECT tkv.doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
         |    / NULLIF(len(toks), 0) AS dup_token_frac,
         |  b1.g AS top_bigram,
         |  CAST(b1.c AS DOUBLE) / NULLIF(len(toks) - 1, 0) AS top_bigram_frac,
         |  CAST(t1.c AS DOUBLE) / NULLIF(len(toks) - 2, 0) AS top_trigram_frac
         |FROM tkv LEFT JOIN b1 ON b1.doc_id = tkv.doc_id
         |LEFT JOIN t1 ON t1.doc_id = tkv.doc_id""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
        .select(col("doc_id"), col("_toks"),
          TextAnalysis.topRun(TextAnalysis.wordBigrams(col("_toks")))
            .as("_b2"),
          TextAnalysis.topRun(TextAnalysis.wordTrigrams(col("_toks")))
            .as("_b3"))
        .select(
          col("doc_id"),
          size(col("_toks")).cast("long").as("n_tokens"),
          ((size(col("_toks")) - size(array_distinct(col("_toks"))))
            .cast("double") / nullif(size(col("_toks")), lit(0)))
            .as("dup_token_frac"),
          col("_b2").getField("item").as("top_bigram"),
          (col("_b2").getField("cnt").cast("double")
            / nullif(size(col("_toks")) - 1, lit(0))).as("top_bigram_frac"),
          (col("_b3").getField("cnt").cast("double")
            / nullif(size(col("_toks")) - 2, lit(0))).as("top_trigram_frac"))
    },

    // Composite curation gate: the keep/drop decision with the FIRST
    // failing rule as the reason — the filter a pipeline actually runs
    // over the per-doc stats (length window, repetition, quality floor).
    // Pure scan-side CASE over already-graded stat expressions.
    Q(
      "llm_quality_filter",
      s"""WITH tkv AS (SELECT doc_id, text, $tk AS toks FROM documents),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |  i -> toks[i] || ' ' || toks[i+1])) AS g FROM tkv),
         |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
         |b1 AS (SELECT doc_id, max(c) AS c FROM bc GROUP BY doc_id),
         |st AS (SELECT tkv.doc_id,
         |  len(toks) AS n_tok,
         |  CAST(b1.c AS DOUBLE) / NULLIF(len(toks) - 1, 0) AS big_frac,
         |  GREATEST(0.0, LEAST(1.0,
         |    LEAST(CAST(len(toks) AS DOUBLE) / 20.0, 1.0) * 0.4
         |    + (CAST(len(list_distinct(toks)) AS DOUBLE) / NULLIF(len(toks), 0)) * 0.4
         |    + (CAST(length(text) - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
         |       / NULLIF(length(text), 0)) * 0.2)) AS quality
         |  FROM tkv LEFT JOIN b1 ON b1.doc_id = tkv.doc_id)
         |SELECT doc_id,
         |  CASE WHEN n_tok < 20 THEN 'too_short'
         |       WHEN n_tok > 90 THEN 'too_long'
         |       WHEN big_frac > 0.08 THEN 'repetitive'
         |       WHEN quality < 0.72 THEN 'low_quality'
         |       ELSE 'ok' END AS reason,
         |  CASE WHEN n_tok >= 20 AND n_tok <= 90
         |        AND COALESCE(big_frac, 0) <= 0.08
         |        AND quality >= 0.72 THEN TRUE ELSE FALSE END AS keep
         |FROM st""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextAnalysis.tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          size(col("_toks")).as("_n"),
          (TextAnalysis.topRun(TextAnalysis.wordBigrams(col("_toks")))
            .getField("cnt").cast("double")
            / nullif(size(col("_toks")) - 1, lit(0))).as("_bf"),
          TextAnalysis.qualityScoreFromTokens(col("text"), col("_toks"))
            .as("_q"))
        .select(col("doc_id"),
          when(col("_n") < 20, "too_short")
            .when(col("_n") > 90, "too_long")
            .when(col("_bf") > 0.08, "repetitive")
            .when(col("_q") < 0.72, "low_quality")
            .otherwise("ok").as("reason"),
          (col("_n") >= 20 && col("_n") <= 90 &&
            coalesce(col("_bf"), lit(0.0)) <= 0.08 &&
            col("_q") >= 0.72).as("keep"))
    },

    // TF-IDF ranked terms: per-doc term frequency x inverse document
    // frequency, top 3 per document. The idf is the LINEAR form N/df —
    // plain IEEE division both engines compute bit-identically, where
    // ln(N/df) would hash-diverge on libm differences; the ordering it
    // induces per fixed tf is the same. Shape: explode → partial-agg
    // groupBy (map-side combine), df table broadcast back, rank via
    // window top-k (WindowGroupLimit).
    Q(
      "llm_tfidf",
      s"""WITH tkv AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
         |  FROM documents),
         |term AS (SELECT doc_id, unnest(toks) AS term FROM tkv),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM term GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
         |SELECT doc_id, term, tf, score, rnk FROM (
         |  SELECT tf.doc_id, tf.term, tf.tf,
         |    CAST(tf.tf AS DOUBLE) * (n.n / CAST(df.df AS DOUBLE)) AS score,
         |    row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY CAST(tf.tf AS DOUBLE) * (n.n / CAST(df.df AS DOUBLE)) DESC,
         |        tf.term ASC) AS rnk
         |  FROM tf JOIN df USING (term), n)
         |WHERE rnk <= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokens(lower(col("text"))).as("_toks"))
      val tf = docs.select(col("doc_id"), explode(col("_toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).cast("double").as("_n"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term").asc)
      tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(n))
        .withColumn("score",
          col("tf").cast("double") * (col("_n") / col("df").cast("double")))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("score"),
          col("rnk").cast("long").as("rnk"))
    },

    // Multimodal with REAL codecs (JDK ImageIO + javax.sound): solid
    // PNGs and square-wave WAVs are generated per document, decoded,
    // resized (Graphics2D), and pooled — and because PNG is lossless
    // and PCM is raw, every decoded stat is pure integer arithmetic of
    // the generator parameters, which the oracle re-derives in SQL. The
    // whole encode→decode→resize→decode→pool chain is hash-verified.
    Q(
      "llm_multimodal",
      """SELECT doc_id,
        | CAST(doc_id % 13 + 8 AS INT) AS width,
        | CAST(doc_id % 7 + 8 AS INT) AS height,
        | CAST(doc_id % 256 AS INT) AS mean_r,
        | CAST((doc_id * 7) % 256 AS INT) AS mean_g,
        | CAST((doc_id * 13) % 256 AS INT) AS mean_b,
        | CAST(CASE WHEN GREATEST(doc_id % 13 + 8, doc_id % 7 + 8) <= 8
        |   THEN doc_id % 13 + 8
        |   ELSE GREATEST(1, (doc_id % 13 + 8) * 8
        |     // GREATEST(doc_id % 13 + 8, doc_id % 7 + 8)) END AS INT)
        |   AS rw,
        | CAST(CASE WHEN GREATEST(doc_id % 13 + 8, doc_id % 7 + 8) <= 8
        |   THEN doc_id % 7 + 8
        |   ELSE GREATEST(1, (doc_id % 7 + 8) * 8
        |     // GREATEST(doc_id % 13 + 8, doc_id % 7 + 8)) END AS INT)
        |   AS rh,
        | 8000 AS sr,
        | CAST(doc_id % 5 * 80 + 800 AS BIGINT) AS n_frames,
        | CAST((doc_id % 5 * 80 + 800) * 1000 // 8000 AS BIGINT)
        |   AS duration_ms,
        | CAST(doc_id % 50 * 3 + 500 AS BIGINT) AS rms,
        | 16 AS n_dims
        |FROM documents WHERE doc_id < 200""".stripMargin) { (s, dir) =>
      val gen = t(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 200)
        .withColumn("w", (col("doc_id") % 13 + 8).cast("int"))
        .withColumn("h", (col("doc_id") % 7 + 8).cast("int"))
        .withColumn("r", (col("doc_id") % 256).cast("int"))
        .withColumn("g", (col("doc_id") * 7 % 256).cast("int"))
        .withColumn("b", (col("doc_id") * 13 % 256).cast("int"))
        .withColumn("frames", (col("doc_id") % 5 * 80 + 800).cast("int"))
        .withColumn("amp", (col("doc_id") % 50 * 3 + 500).cast("int"))
      val assets = gen
        .withColumn("png", MediaCodecs.encodePng(
          col("w"), col("h"), col("r"), col("g"), col("b")))
        .withColumn("wav", MediaCodecs.encodeWav(
          lit(8000), col("frames"), col("amp"), lit(10)))
      assets
        .withColumn("img", MediaCodecs.decodeImage(col("png")))
        .withColumn("rimg", MediaCodecs.decodeImage(
          MediaCodecs.resizeImage(col("png"), lit(8))))
        .withColumn("aud", MediaCodecs.decodeWav(col("wav")))
        .withColumn("feats", MediaCodecs.pooledFeaturesCol(col("png"), 4))
        .select(col("doc_id"),
          col("img.width").as("width"), col("img.height").as("height"),
          col("img.mean_r").as("mean_r"), col("img.mean_g").as("mean_g"),
          col("img.mean_b").as("mean_b"),
          col("rimg.width").as("rw"), col("rimg.height").as("rh"),
          col("aud.sample_rate").as("sr"),
          col("aud.n_frames").as("n_frames"),
          col("aud.duration_ms").as("duration_ms"),
          col("aud.rms").as("rms"),
          size(col("feats")).as("n_dims"))
    },

    // Video stage over a REAL multi-frame container: deterministic
    // animated GIFs (frame k's channels = (c0 + 17k) % 256, 4cs delay
    // per frame) are encoded, then DECODED — container stats from the
    // per-frame GraphicControlExtension delays, and stride-2 frame
    // sampling over actual pixel rasters. GIF palettes are lossless for
    // solid fills, so DuckDB re-derives every decoded value as integer
    // arithmetic of the generator parameters.
    Q(
      "llm_video_frames",
      """WITH fr AS (SELECT doc_id,
        |  unnest(range(0, doc_id % 6 + 4, 2)) AS f
        |  FROM documents WHERE doc_id < 120)
        |SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST((doc_id + f * 17) % 256 AS INT) AS mean_r,
        |  CAST((doc_id * 3 % 256 + f * 17) % 256 AS INT) AS mean_g,
        |  CAST((doc_id * 5 % 256 + f * 17) % 256 AS INT) AS mean_b,
        |  CAST(doc_id % 11 + 6 AS INT) AS width,
        |  CAST(doc_id % 5 + 6 AS INT) AS height,
        |  CAST(doc_id % 6 + 4 AS INT) AS n_frames,
        |  CAST((doc_id % 6 + 4) * 40 AS BIGINT) AS duration_ms
        |FROM fr""".stripMargin) { (s, dir) =>
      val gen = t(s, dir, "documents").select(col("doc_id"))
        .filter(col("doc_id") < 120)
        .withColumn("w", (col("doc_id") % 11 + 6).cast("int"))
        .withColumn("h", (col("doc_id") % 5 + 6).cast("int"))
        .withColumn("nf", (col("doc_id") % 6 + 4).cast("int"))
        .withColumn("r0", (col("doc_id") % 256).cast("int"))
        .withColumn("g0", (col("doc_id") * 3 % 256).cast("int"))
        .withColumn("b0", (col("doc_id") * 5 % 256).cast("int"))
      gen
        .withColumn("gif", MediaCodecs.encodeGif(col("w"), col("h"),
          col("nf"), col("r0"), col("g0"), col("b0"), lit(17), lit(4)))
        .withColumn("vs", MediaCodecs.decodeGif(col("gif")))
        .withColumn("fr",
          explode(MediaCodecs.sampleFrames(col("gif"), lit(2))))
        .select(col("doc_id"),
          col("fr.frame_idx").as("frame_idx"),
          col("fr.mean_r").as("mean_r"),
          col("fr.mean_g").as("mean_g"),
          col("fr.mean_b").as("mean_b"),
          col("vs.width").as("width"), col("vs.height").as("height"),
          col("vs.n_frames").as("n_frames"),
          col("vs.duration_ms").as("duration_ms"))
    },

    // Boilerplate removal by corpus-level segment dedup (the CCNet line-
    // dedup recipe with a fixed 5-token segmenter — this corpus has no
    // line structure): segments hashed scan-side with the pure-BIGINT
    // polynomial fold, document-frequency gate df >= 2, survivors
    // reassembled in original order. DuckDB re-derives the identical
    // segment hashes, gate, and reassembled text.
    Q(
      "llm_boilerplate",
      s"""WITH toks AS (SELECT doc_id, $tk AS tkn FROM documents),
         |seg AS (SELECT doc_id, i AS seg_idx,
         |    array_to_string(tkn[(i*5+1):(i*5+5)], ' ') AS seg
         |  FROM (SELECT doc_id, tkn, unnest(range(0,
         |      CASE WHEN len(tkn) < 1 THEN 0
         |           ELSE (len(tkn) - 1) // 5 + 1 END)) AS i FROM toks)),
         |hh AS (SELECT doc_id, seg_idx, seg, ${md5h(0, "seg")} AS h
         |  FROM seg),
         |dfc AS (SELECT h, COUNT(DISTINCT doc_id) AS df FROM hh GROUP BY h),
         |kept AS (SELECT hh.doc_id, hh.seg_idx, hh.seg
         |  FROM hh JOIN dfc USING (h) WHERE df < 2),
         |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
         |    string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT t.doc_id,
         |  CAST(CASE WHEN len(tkn) < 1 THEN 0
         |       ELSE (len(tkn) - 1) // 5 + 1 END AS BIGINT) AS n_segs,
         |  CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
         |  COALESCE(clean_text, '') AS clean_text
         |FROM toks t LEFT JOIN agg USING (doc_id)""".stripMargin) {
      (s, dir) =>
        Dedup.dropCommonSegments(
          t(s, dir, "documents").repartition(fan(s), col("doc_id")),
          "doc_id", "text", segTokens = 5, maxDf = 2L)
    },

    // Cluster-balanced sampling: k-means cells from the same
    // deterministic quantized index build as llm_ivf_topk, then a fixed
    // per-cell quota chosen by hash order — the diversity-preserving
    // subsample (SemDeDup/DCLM-style cluster balancing). DuckDB re-trains
    // the identical index and re-derives sizes, ranks, and the picks.
    Q(
      "llm_cluster_sample",
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |seed AS (SELECT CAST(vec_id AS INT) AS cell, qv AS cv FROM q WHERE vec_id < 16),
        |a1 AS (
        |  SELECT vec_id, qv, cell FROM (
        |    SELECT q.vec_id, q.qv, s.cell,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(q.qv) + 1),
        |          i -> (q.qv[i] - s.cv[i]) * (q.qv[i] - s.cv[i])),
        |          (a, b) -> a + b), s.cell) AS rk
        |    FROM q, seed s) WHERE rk = 1),
        |cexp AS (SELECT cell, unnest(range(1, len(qv) + 1)) AS i, unnest(qv) AS x FROM a1),
        |centd AS (SELECT cell, i, CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
        |  FROM cexp GROUP BY cell, i),
        |cent2 AS (SELECT cell, list(m ORDER BY i) AS cv FROM centd GROUP BY cell),
        |cells AS (
        |  SELECT vec_id, cell FROM (
        |    SELECT q.vec_id, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_transform(range(1, len(q.qv) + 1),
        |          i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])),
        |          (a, b) -> a + b), c.cell) AS rk
        |    FROM q, cent2 c) WHERE rk = 1),
        |sz AS (SELECT cell, COUNT(*) AS cell_size FROM cells GROUP BY cell),
        |r AS (SELECT c.vec_id, CAST(c.cell AS INT) AS cell, sz.cell_size,
        |    ROW_NUMBER() OVER (PARTITION BY c.cell
        |      ORDER BY CAST(('0x' || substr(md5('7:' || CAST(c.vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000, c.vec_id) AS rk
        |  FROM cells c JOIN sz USING (cell))
        |SELECT vec_id, cell, cell_size, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 20""".stripMargin) { (s, dir) =>
      // cells feeds the size aggregate AND the stratum sampler — snapshot
      // so the k-means assignment pipeline evaluates once
      val cells = Similarity.kmeansCellsQuantized(
        t(s, dir, "embeddings").repartition(fan(s), col("vec_id"))
          .select("vec_id", "embedding"),
        nCells = 16, scale = 1000)
        .localCheckpoint(true)
      val sized = cells.join(
        broadcast(cells.groupBy("cell").agg(count(lit(1)).as("cell_size"))),
        Seq("cell"))
      Sampling.topKPerStratum(sized, "cell", "vec_id", k = 20)
        .select(col("vec_id"), col("cell"), col("cell_size"), col("rk"))
    },

    // Perplexity-bucket assignment (the CCNet head/middle/tail split,
    // with the bigram-LM cond_p as the fluency score — higher = more
    // fluent = head): corpus tercile thresholds from ONE tiny aggregate
    // broadcast back onto the scan — never a global sort/NTILE, which
    // would single-partition at scale. Thresholds rounded to 6 decimals
    // in both engines (interpolated percentiles can differ in the last
    // bits across engines; the agg_quantiles convention).
    Q(
      "llm_ppl_buckets",
      s"""WITH tok AS (SELECT doc_id, $tk AS tkn FROM documents),
         |e AS (SELECT doc_id, tkn[i] AS w1, tkn[i+1] AS w2
         |  FROM tok, UNNEST(range(1, len(tkn))) AS u(i)),
         |uf AS (SELECT t, COUNT(*) AS uf
         |  FROM (SELECT unnest(tkn) AS t FROM tok) GROUP BY t),
         |bf AS (SELECT w1, w2, COUNT(*) AS bf FROM e GROUP BY 1, 2),
         |sc AS (SELECT doc_id,
         |    CAST(SUM(bf) AS DOUBLE) / SUM(uf) AS cond_p
         |  FROM e JOIN bf USING (w1, w2) JOIN uf ON e.w1 = uf.t
         |  GROUP BY doc_id),
         |thr AS (SELECT
         |    ROUND(quantile_cont(cond_p, 1.0/3), 6) AS t_lo,
         |    ROUND(quantile_cont(cond_p, 2.0/3), 6) AS t_hi
         |  FROM sc)
         |SELECT doc_id, cond_p,
         |  CASE WHEN cond_p >= t_hi THEN 'head'
         |       WHEN cond_p >= t_lo THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM sc, thr""".stripMargin) { (s, dir) =>
      // the score frame feeds the threshold aggregate AND the final
      // probe — snapshot it so the bigram-LM pipeline (3 tokenizations
      // per evaluation) runs once, not twice
      val sc = TextAnalysis.bigramScore(
        t(s, dir, "documents").repartition(fan(s), col("doc_id"))
          .select(col("doc_id"), col("text")), "doc_id", "text")
        .select(col("doc_id"), col("cond_p"))
        .localCheckpoint(true)
      val thr = sc.agg(
        round(expr("percentile(cond_p, 1.0D/3)"), 6).as("t_lo"),
        round(expr("percentile(cond_p, 2.0D/3)"), 6).as("t_hi"))
      sc.crossJoin(broadcast(thr))
        .select(col("doc_id"), col("cond_p"),
          when(col("cond_p") >= col("t_hi"), "head")
            .when(col("cond_p") >= col("t_lo"), "middle")
            .otherwise("tail").as("bucket"))
    }
  )
}
