package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure Catalyst expressions (codegen'd, no UDFs): at 100 TB these run
  * embarrassingly parallel over the scan with no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenizer (empty tokens removed). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word count: splits on word boundaries AND digit runs,
    * approximating tokenizer behavior (letters chunked ~4 chars).
    */
  def approxBpeCount(text: Column): Column =
    ceil(length(regexp_replace(text, "\\s+", "")).cast("double") / 4)
      .cast("long") + size(filter(split(text, "[^0-9]+"), t => length(t) > 0))

  /** Ratio of characters matching `pattern` (Java/RE2-safe class). */
  def charClassRatio(text: Column, pattern: String): Column =
    (length(text) - length(regexp_replace(text, pattern, ""))).cast("double") /
      nullif(length(text), lit(0))

  /** Heuristic quality score in [0,1]: rewards reasonable length, word
    * diversity, and clean (alphanumeric) text. Deterministic ratio
    * arithmetic over integer counts.
    */
  def qualityScore(text: Column,
      cleanPattern: String = "[a-zA-Z0-9\\s]"): Column =
    qualityScoreFromTokens(text, tokens(text), cleanPattern)

  /** Quality score over a pre-staged token column (tokenize once per row
    * when combined with other token-derived stats).
    */
  def qualityScoreFromTokens(text: Column, toks: Column,
      cleanPattern: String = "[a-zA-Z0-9\\s]"): Column = {
    val nTok = size(toks).cast("double")
    val uniqRatio = size(array_distinct(toks)).cast("double") /
      nullif(size(toks), lit(0))
    val cleanRatio = charClassRatio(text, cleanPattern)
    val lenScore = least(nTok / 20.0, lit(1.0))
    greatest(lit(0.0),
      least(lit(1.0),
        lenScore * 0.4 + uniqRatio * 0.4 + cleanRatio * 0.2))
  }

  /** Language-ID by stopword evidence: score per language = number of
    * tokens in that language's stopword list; argmax wins (ties broken by
    * list order). A cheap, deterministic n-gram-free heuristic.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "de", "un", "una", "que"),
    "it" -> Seq("il", "la", "gli", "e", "di", "un", "una", "che"))

  def langScores(text: Column): Seq[(String, Column)] =
    langScoresFromTokens(tokens(lower(text)))

  /** Scores over a pre-tokenized (lowercased) column. Stage the token array
    * as a real column first — CollapseProject keeps non-cheap multi-use
    * aliases materialized, so the split runs once per row instead of once
    * per language.
    */
  def langScoresFromTokens(toks: Column): Seq[(String, Column)] =
    stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(filter(toks,
        t => words.map(w => t === w).reduce(_ || _)))
    }

  /** Argmax over already-computed per-language score columns (ties broken
    * by sorted language order, matching the reference CASE chain).
    */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    // argmax via a packed (score, -ord) struct max
    val packed = scores.zipWithIndex.map { case ((lang, score), i) =>
      struct(score.as("s"), lit(-i).as("ord"), lit(lang).as("lang"))
    }
    greatest(packed: _*).getField("lang")
  }

  def langId(text: Column): Column =
    langIdFromScores(langScores(text))

  /** PII scrubbing patterns: (regex, placeholder). Portable syntax only
    * (no lookaround) so Java regex and RE2-based engines (the DuckDB
    * oracle) apply the identical rule.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"))

  /** Replace emails, phone numbers, and IPv4 addresses with typed
    * placeholders — a pure regexp_replace chain (codegen'd, zero
    * shuffle); order matters (IPs must not first be half-eaten by the
    * phone rule, hence most-specific first).
    */
  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (t, (re, tag)) =>
      regexp_replace(t, re, tag)
    }

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed
    * text — the exact-dedup key. (Reference-free; standard pipeline op.)
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Word bigrams (space-joined) from a token array — zip_with over
    * shifted slices: pure scan-side expression, no explode/shuffle.
    */
  def wordBigrams(toks: Column): Column = {
    val n = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Word trigrams, same shape. */
  def wordTrigrams(toks: Column): Column = {
    val n = greatest(size(toks) - 2, lit(0))
    zip_with(
      zip_with(slice(toks, lit(1), n), slice(toks, lit(2), n),
        (a, b) => concat(a, lit(" "), b)),
      slice(toks, lit(3), n), (ab, c) => concat(ab, lit(" "), c))
  }

  /** Most frequent element of a string array with its count, as
    * struct(item, cnt) — array_sort + one run-length fold: O(n log n) per
    * row ON THE SCAN (the explode → groupBy(doc, gram) alternative
    * shuffles every gram of every document, which at 100 TB is a shuffle
    * several times the corpus). Ties break to the lexicographically
    * smallest item (the sort's first maximal run — strict `>` keeps the
    * earliest). Empty array → (null, 0).
    */
  def topRun(arr: Column): Column = {
    val zero = struct(lit(null).cast("string").as("prev"),
      lit(0L).as("run"), lit(0L).as("best"),
      lit(null).cast("string").as("item"))
    aggregate(array_sort(arr), zero,
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1L))
        val better = run > acc.getField("best")
        struct(x.as("prev"), run.as("run"),
          when(better, run).otherwise(acc.getField("best")).as("best"),
          when(better, x).otherwise(acc.getField("item")).as("item"))
      },
      acc => struct(acc.getField("item").as("item"),
        acc.getField("best").as("cnt")))
  }

  /** Rolling (polynomial) content-defined fingerprint over tokens:
    * fold hash = hash*31 + tokenHash (mod 2^61) — order-sensitive, unlike
    * the bag-of-words md5. Pure higher-order-function expression.
    */
  def rollingFingerprint(text: Column): Column =
    // modulus < 2^50 keeps acc*31 + tokenHash within Long under ANSI mode
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(xxhash64(t), lit(1000003L)),
        lit(1125899906842597L)))

  /** Corpus unigram-frequency scoring — the LM-free core of the CCNet/
    * Gopher "commonness" quality signal: per document, the exact BIGINT
    * sum of each token's corpus frequency plus the rare-token fraction.
    * High mean_cf = boilerplate/common text; high rare_frac = noise,
    * OCR garbage, or genuinely novel content — both standard filter axes.
    *
    * All aggregation is integer (count/sum of BIGINT), so the result is
    * partitioning-independent and any engine re-derives it bit-exactly;
    * the only doubles are two final single divisions per row.
    *
    * Plan shape at 100 TB: explode → map-side-combined groupBy(token)
    * builds the vocab count table (output rows = |vocab|, far smaller
    * than the corpus); the count table joins back onto the exploded scan.
    * `broadcastVocab = true` (default) broadcasts it — right while the
    * vocab fits (~tens of millions of rows); set false to fall back to a
    * shuffle join on token, in which case the Zipf head ("the") is the
    * classic skew key — route through [[graft.ops.SkewJoin]] there.
    * Documents with zero tokens have no exploded rows and drop out, in
    * both engines.
    */
  def unigramScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, rareMax: Long = 2L,
      broadcastVocab: Boolean = true): org.apache.spark.sql.DataFrame = {
    val e = docs.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
    val cf0 = e.groupBy(col("__t")).agg(count(lit(1)).as("__cf"))
    val cf = if (broadcastVocab) broadcast(cf0) else cf0
    e.join(cf, "__t")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__cf")).as("sum_cf"),
        sum(when(col("__cf") <= rareMax, 1L).otherwise(0L)).as("__rare"))
      .select(col(idCol), col("n_tokens"), col("sum_cf"),
        (col("sum_cf").cast("double") / col("n_tokens")).as("mean_cf"),
        (col("__rare").cast("double") / col("n_tokens")).as("rare_frac"))
  }

  /** Corpus bigram-LM fluency features — the bigram tier above
    * [[unigramScore]] (the next CCNet/Gopher commonness axis: unigram
    * frequency says the WORDS are common; bigram frequency says the word
    * ORDER is, which is what separates fluent text from shuffled-token
    * spam). Per document:
    *   - n_bigrams — bigram positions (len - 1)
    *   - sum_bf — exact BIGINT sum of each bigram's corpus frequency
    *   - rare_frac — fraction of bigrams with corpus frequency <= rareMax
    *     (high = novel word order: noise, OCR garbage, or genuinely new
    *     prose)
    *   - cond_p — pooled conditional probability Σbf / Σuf(w1): the
    *     stupid-backoff p(w2|w1) = cf(w1 w2)/cf(w1) with numerator and
    *     denominator each summed EXACTLY per doc before ONE IEEE
    *     division (a per-bigram mean would sum doubles in partition
    *     order and lose cross-engine determinism).
    *
    * Plan shape at 100 TB mirrors [[unigramScore]]: the bigram and
    * unigram vocab tables are map-side-combined groupBys whose output is
    * |vocab| rows, broadcast back onto the exploded scan (shuffle-join
    * fallback via broadcastVocab = false; the Zipf head is the skew key
    * there). Documents with < 2 tokens have no bigrams and drop out, in
    * both engines.
    */
  def bigramScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, rareMax: Long = 2L,
      broadcastVocab: Boolean = true): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__tk"))
    val n = greatest(size(col("__tk")) - 1, lit(0))
    val pairs = zip_with(
      slice(col("__tk"), lit(1), n), slice(col("__tk"), lit(2), n),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val e = toks.select(col(idCol), explode(pairs).as("__p"))
      .select(col(idCol),
        col("__p.w1").as("__w1"), col("__p.w2").as("__w2"))
    val uni0 = docs.select(explode(tokens(col(textCol))).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__uf"))
    val bi0 = e.groupBy("__w1", "__w2").agg(count(lit(1)).as("__bf"))
    val (uf, bf) =
      if (broadcastVocab) (broadcast(uni0), broadcast(bi0)) else (uni0, bi0)
    e.join(bf, Seq("__w1", "__w2")).join(uf, Seq("__w1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__bf")).as("sum_bf"),
        sum(col("__uf")).as("__sum_uf"),
        sum(when(col("__bf") <= rareMax, 1L).otherwise(0L)).as("__rare"))
      .select(col(idCol), col("n_bigrams"), col("sum_bf"),
        (col("__rare").cast("double") / col("n_bigrams")).as("rare_frac"),
        (col("sum_bf").cast("double") / col("__sum_uf")).as("cond_p"))
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): rank raw-corpus
    * documents by how target-domain-like their HASHED-unigram profile
    * is. Tokens hash into `nBuckets` feature buckets; the target and raw
    * bucket distributions come from one map-side-combined groupBy over
    * the same exploded scan (the target rows are just the `isTarget`
    * slice); each document's importance is the pooled ratio
    *
    *   ratio = (Σ (t[b]+1) · (R + nBuckets)) / (Σ (r[b]+1) · (T + nBuckets))
    *
    * — numerator and denominator are EXACT BIGINT sums/products with ONE
    * IEEE division at the end (the paper's per-token log-ratio sum is
    * replaced by the pooled rational form for cross-engine determinism —
    * same ordering axis, no transcendental); add-one smoothing is applied
    * SYMMETRICALLY to both distributions, so target-unseen buckets drag
    * the ratio below 1 instead of zeroing it and the smoothing bias
    * cancels once T, R ≫ nBuckets (any real corpus). `keep` = ratio > 1:
    * the document looks more like the target domain than the average
    * corpus document.
    *
    * 100-TB shape: the bucket table is ≤ nBuckets rows regardless of
    * corpus size — broadcast onto the exploded scan, totals folded in by
    * a window over that tiny table; no shuffle larger than the per-doc
    * aggregate. Products stay < 2^63 while
    * max-doc-tokens · corpus-tokens < 9.2e18 — at larger scales widen
    * nBuckets (flattening bucket counts) or score per shard.
    */
  def dsirScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, isTarget: Column, nBuckets: Int = 256,
      seed: Int = 5, broadcastVocab: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    val e = docs.select(col(idCol), isTarget.as("__is_t"),
        explode(tokens(col(textCol))).as("__tok"))
      .select(col(idCol), col("__is_t"),
        (Dedup.md5Hash(col("__tok"), seed) % nBuckets).as("__b"))
    val vocab0 = e.groupBy("__b").agg(
      count(lit(1)).as("__r"),
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("__tc"))
    val allW = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val vocab1 = vocab0
      .withColumn("__rtot", sum(col("__r")).over(allW))
      .withColumn("__ttot", sum(col("__tc")).over(allW))
    val vocab = if (broadcastVocab) broadcast(vocab1) else vocab1
    val ratio =
      (col("s_target") * (col("__rm") + nBuckets.toLong)).cast("double") /
        (col("s_raw") * (col("__tm") + nBuckets.toLong)).cast("double")
    e.join(vocab, "__b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__tc") + 1L).as("s_target"),
        sum(col("__r") + 1L).as("s_raw"),
        max(col("__rtot")).as("__rm"),
        max(col("__ttot")).as("__tm"))
      .select(col(idCol), col("n_tokens"), col("s_target"), col("s_raw"),
        ratio.as("ratio"), (ratio > 1.0d).as("keep"))
  }

  /** BM25 relevance of every document against a fixed query-term set
    * (Robertson/Spärck Jones; the retrieval tier above [[unigramScore]]
    * / the TF-IDF top-terms op — the standard scorer for
    * retrieval-based curation: picking the corpus documents most
    * relevant to a target topic, or scoring near-benchmark text before
    * decontamination review). Parameters are the textbook k1 = 1.2,
    * b = 0.75, spelled as the rationals 12/10 and 3/4 so every term's
    * contribution is ONE exact integer fraction:
    *
    *   idf_t  = (2N − 2df + 1) / (2df + 1)   (the ln-free rational idf —
    *            ln() is not bit-identical across engines, the same
    *            reason llm_tfidf uses linear idf)
    *   tf_t   = 22·tf·T / (10·T·tf + 3·T + 9·dl·N)
    *            (= tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with
    *            avgdl = T/N cleared of fractions)
    *
    * and the per-document score is the EXACT BIGINT sum of
    * floor(quant · idf_t · tf_t) per matched term — quantized like the
    * ANN cosine tiers, so the sum is order-independent and both engines
    * hash-match; `score` = score_q / quant is the one IEEE operation.
    *
    * Plan shape at 100 TB: the query-term filter is a scan-side literal
    * IN (no join); tf = map-side-combined groupBy(doc, term); df is at
    * most |query| rows — broadcast; corpus totals are one 1-row
    * broadcast cross join. Nothing larger than the per-doc aggregate
    * shuffles. Exactness envelope: products stay < 2^63 while
    * 2N · 22 · tf · T · quant < 9.2e18 — past that (true corpus scale)
    * drop to DOUBLE contributions, where BM25 is a heuristic anyway.
    */
  def bm25Score(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], quant: Long = 10000L)
      : org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__tk"))
      .select(col(idCol), col("__tk"),
        size(col("__tk")).cast("long").as("__dl"))
    val totals = toks.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__t"))
    val e = toks
      .select(col(idCol), col("__dl"), explode(col("__tk")).as("__term"))
      .filter(col("__term").isin(queryTerms: _*))
    val tfs = e.groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfs = tfs.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val contrib = tfs
      .join(broadcast(dfs), Seq("__term"))
      .crossJoin(broadcast(totals))
      .withColumn("__num",
        (lit(2L) * col("__n") - lit(2L) * col("__df") + lit(1L)) *
          lit(22L) * col("__tf") * col("__t") * lit(quant))
      .withColumn("__den",
        (lit(2L) * col("__df") + lit(1L)) *
          (lit(10L) * col("__t") * col("__tf") + lit(3L) * col("__t") +
            lit(9L) * col("__dl") * col("__n")))
      .withColumn("__c", expr("__num DIV __den"))
    val perDoc = contrib.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit"), sum(col("__c")).as("score_q"))
    toks.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(col("score_q"), lit(0L)).as("score_q"),
        (coalesce(col("score_q"), lit(0L)).cast("double") / quant)
          .as("score"))
  }
}
