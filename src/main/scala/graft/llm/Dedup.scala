package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. Designed for 100 TB: every stage is
  * shuffle-minimal — signatures are computed scan-side (no shuffle), and
  * candidate generation goes through LSH band buckets (equi-join on band
  * hash) instead of any pairwise comparison.
  *
  * Hash functions are pluggable: production uses xxhash64 (codegen'd,
  * cheap); the DuckDB-oracle queries pass an md5-based hash both engines
  * can compute identically.
  */
object Dedup {

  /** Seeded 60-bit hash from md5 — reproducible in any SQL engine:
    * CAST(('0x' || substr(md5(seed || ':' || s), 1, 15)) AS BIGINT).
    */
  def md5Hash(s: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), s)), 1, 15), 16, 10)
      .cast("long")

  /** Seeded xxhash64 (fast path). */
  def xxHash(s: Column, seed: Int): Column = xxhash64(lit(seed), s)

  /** Fingerprint modulus: largest prime below 2^50 · 1024 — keeps
    * acc*31 + x < 2^63 for acc < FP_P and x < FP_P.
    */
  val FP_P = 1125899906842597L

  /** Karp–Rabin polynomial hash of a string: fold over Unicode code points
    * of acc·31 + codepoint (mod [[FP_P]]). Pure arithmetic — no crypto
    * hash — so it is the FAST fingerprint tier, yet any SQL engine computes
    * it identically (DuckDB: list_reduce over ascii(substr(...))).
    */
  def polyHash(s: Column): Column =
    // codegen'd kernel (one tight loop over code points per row) —
    // bit-identical to [[polyHashHof]], the original HOF form, whose
    // lambdas evaluated interpreted per character (guide §4); the
    // equivalence is property-tested in HashKernelsSpec
    org.apache.spark.sql.graft.Shims.column(
      org.apache.spark.sql.graft.GraftPolyHash(
        org.apache.spark.sql.graft.Shims.expression(s)))

  /** The HOF reference form of [[polyHash]] (equivalence-spec anchor;
    * also the shape the DuckDB oracle fragments mirror textually).
    */
  private[graft] def polyHashHof(s: Column): Column =
    // empty-string guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) while
    // DuckDB's range(1, 1) is empty — never let the fold see length 0
    when(length(s) < 1, lit(7L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(s)),
          i => ascii(s.substr(i, lit(1))).cast("long")),
        lit(7L), (acc, c) => (acc * 31L + c) % FP_P))

  /** Order-sensitive document fingerprint: the same polynomial fold rolled
    * over per-token [[polyHash]] values. Two docs share a fingerprint iff
    * they have the identical token sequence — the cheap first-pass exact
    * dedup key (vs [[TextAnalysis.fingerprint]]'s md5 canonical-text form).
    */
  def rollingFingerprint(toks: Column): Column = {
    import org.apache.spark.sql.graft.{GraftPolyFold, GraftPolyHashArray, Shims}
    Shims.column(GraftPolyFold(
      GraftPolyHashArray(Shims.expression(toks)), 31L))
  }

  /** HOF reference form of [[rollingFingerprint]] (equivalence spec). */
  private[graft] def rollingFingerprintHof(toks: Column): Column =
    aggregate(transform(toks, tk => polyHashHof(tk)),
      lit(7L), (acc, h) => (acc * 31L + h) % FP_P)

  /** Exact dedup: keep the lowest id per canonical-text fingerprint. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word w-shingles from a TOKEN ARRAY COLUMN (w consecutive tokens
    * joined by space). Pass an attribute (materialized column), not a
    * derived expression: sub-expressions referenced inside HOF lambdas are
    * re-evaluated per element, so a derived `tokens(text)` here would
    * re-split the text O(n²) times.
    */
  def shinglesOfTokens(toks: Column, w: Int): Column =
    filter(
      transform(toks,
        (_, i) => when(i <= size(toks) - w,
          array_join(slice(toks, i + 1, lit(w)), " "))),
      s => s.isNotNull)

  /** Word w-shingles of raw text (convenience; see [[shinglesOfTokens]]
    * for the staged fast path).
    */
  def shingles(text: Column, w: Int): Column =
    shinglesOfTokens(TextAnalysis.tokens(text), w)

  /** MinHash signature from a SHINGLE ARRAY COLUMN: ONE traversal computes
    * all seeds (fold with an array accumulator of per-seed minima) — the
    * hash work is exactly numHashes × |shingles|, nothing recomputed.
    * Empty shingle sets yield an all-null signature.
    */
  def minhashFromShingles(sh: Column, numHashes: Int,
      hashFn: (Column, Int) => Column = xxHash): Column =
    transform(
      aggregate(sh,
        array_repeat(lit(Long.MaxValue), numHashes),
        (acc, s) => zip_with(acc,
          array((0 until numHashes).map(seed => hashFn(s, seed)): _*),
          (a, b) => least(a, b))),
      m => when(m === Long.MaxValue, lit(null).cast("long")).otherwise(m))

  /** Modulus for the permuted minhash family: 2^31 - 1 (Mersenne prime).
    * Base hashes are reduced below it so every affine permutation's
    * product stays < 2^62 — exact in BIGINT on any engine (DuckDB raises
    * on 64-bit overflow where Spark wraps, so staying in range is what
    * keeps the two engines bit-identical).
    */
  val MH_P = 2147483647L

  /** MinHash from ONE base hash per shingle + exact affine permutations
    * h_i = (a_i·h + c_i) mod 2^31-1 — the textbook universal-hash minhash
    * construction, and ~numHashes× cheaper than hashing every shingle
    * per seed when the base hash is expensive (the md5 oracle tier: one
    * digest per shingle instead of eight). Same null sentinel contract
    * as [[minhashFromShingles]].
    */
  def minhashPermuted(sh: Column, numHashes: Int,
      base: Column => Column): Column = {
    val hs = transform(sh, s => base(s) % MH_P)
    transform(
      aggregate(hs,
        array_repeat(lit(Long.MaxValue), numHashes),
        (acc, h) => zip_with(acc,
          array((0 until numHashes).map(i =>
            (lit(1103515245L + 2L * i) * h + lit(12345L + 1259L * i))
              % MH_P): _*),
          (a, b) => least(a, b))),
      m => when(m === Long.MaxValue, lit(null).cast("long")).otherwise(m))
  }

  /** MinHash signature of raw text (convenience composition). */
  def minhashSignature(text: Column, w: Int, numHashes: Int,
      hashFn: (Column, Int) => Column = xxHash): Column =
    minhashFromShingles(shingles(text, w), numHashes, hashFn)

  /** LSH band key for a signature slice [b*rows, (b+1)*rows). */
  def bandKey(sig: Column, band: Int, rows: Int): Column =
    concat_ws(",",
      transform(slice(sig, band * rows + 1, rows), h => h.cast("string")))

  /** Candidate duplicate pairs via LSH banding: docs sharing any band
    * bucket. Output (id_a < id_b, est_jaccard = matching signature
    * fraction). The band join is an equi-join on (band, key) — at scale
    * this shuffles only (id, band_key) pairs, never text.
    */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      w: Int, numHashes: Int, bands: Int,
      hashFn: (Column, Int) => Column = xxHash,
      /** Override the shingle-array → signature construction (e.g.
        * [[minhashPermuted]] for the one-digest-per-shingle md5 tier).
        */
      sigOf: Option[Column => Column] = None): DataFrame = {
    val rows = numHashes / bands
    val sigExpr = sigOf.getOrElse(
      (sh: Column) => minhashFromShingles(sh, numHashes, hashFn))
    // Staged pipeline: tokens → shingles → signature as materialized
    // COLUMNS (each stage references the previous stage's attribute once;
    // CollapseProject keeps non-cheap multi-referenced exprs staged), then
    // persist BEFORE filtering — the cache is a pushdown barrier, so the
    // null-check filter reads the cached column instead of re-inlining the
    // whole signature expression. (id, sig) is tiny relative to the text
    // at any scale, so this is also the right 100 TB architecture: hash
    // the corpus once, then shuffle only signatures.
    val sigs = df
      .select(col(idCol).as("id"),
        TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col("id"), shinglesOfTokens(col("_toks"), w).as("_sh"))
      .select(col("id"), sigExpr(col("_sh")).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .filter(!array_contains(transform(col("sig"), s => s.isNull), true))
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandKey(col("sig"), b, rows).as("bkey"))): _*))
        .as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bkey"))
    val a = banded.select(col("band"), col("bkey"), col("id").as("id_a"),
      col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bkey"), col("id").as("id_b"),
      col("sig").as("sig_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b)).cast("double") / numHashes)
          .as("est_jaccard"))
      .distinct()
  }

  /** SimHash: sign-aggregated per-bit token hashes → `bits`-bit fingerprint
    * (bits ≤ 60 to stay in positive BIGINT range for cross-engine
    * compares). Near-dup docs differ in few bits (Hamming distance).
    * Pure higher-order-function expression: per-bit counters folded over
    * the token hashes (O(tokens × bits) scan-side work, no shuffle).
    */
  def simhash(text: Column, bits: Int,
      hashFn: (Column, Int) => Column = xxHash): Column = {
    require(bits <= 60, "bits must fit positive BIGINT")
    val masks = array((0 until bits).map(b => lit(1L << b)): _*)
    val hashes = transform(TextAnalysis.tokens(text), t => hashFn(t, 0))
    // counter(b) = sum over tokens of (bit b set ? +1 : -1)
    val counters = aggregate(
      hashes,
      array_repeat(lit(0), bits),
      (acc, h) => zip_with(acc,
        transform(masks, m => when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)),
        (a, x) => a + x))
    // recombine: bit b contributes 2^b when its counter is positive
    aggregate(
      zip_with(counters, masks,
        (cnt, m) => when(cnt > 0, m).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column, bits: Int): Column = {
    val masks = array((0 until bits).map(b0 => lit(1L << b0)): _*)
    aggregate(
      transform(masks,
        m => when(a.bitwiseAND(m) === b.bitwiseAND(m), 0).otherwise(1)),
      lit(0), (acc, x) => acc + x)
  }

  /** Exact n-gram Jaccard similarity between two token arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      nullif(size(array_union(a, b)), lit(0))

  /** Word n-gram sets per doc (distinct shingles) for Jaccard dedup. */
  /** Sign-LSH band signatures over an integer-quantized vector, built from
    * a pure-integer linear-congruential hyperplane: component(p, d) =
    * ((1103515245·(p·1259 + d) + 12345) mod 2^21) − 2^20. Everything stays
    * in BIGINT — dot products and signs are exact, so ANY engine computes
    * identical buckets (the property the graded oracle exploits: DuckDB
    * re-derives the same candidate pairs independently). Returns
    * array<struct<band,sig>>; candidates = pairs sharing any (band, sig) —
    * the same banding equi-join shape as minhashDupPairs, which is what
    * scales: only (id, band, sig) rows shuffle, never vector pairs.
    */
  def signBands(qv: Column, bands: Int, bitsPerBand: Int,
      dims: Int = 64): Column = {
    // hyperplane components precomputed host-side and inlined as literal
    // arrays — the per-element LCG would otherwise re-evaluate inside the
    // fold for every (vector × plane × dim)
    def component(p: Long, d: Long): Long =
      (1103515245L * (p * 1259L + d) + 12345L) % 2097152L - 1048576L
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        (0 until bitsPerBand).map { bit =>
          val p = (b * bitsPerBand + bit).toLong
          val plane = array((0L until dims.toLong).map(d =>
            lit(component(p, d))): _*)
          // codegen'd exact-long dot (guide §4) — the interpreted
          // zip_with+aggregate fold evaluated per (vector × plane × dim);
          // long adds are associative/exact, so the value is identical
          val dot = graft.functions.VectorDot.dotL(qv, plane)
          when(dot >= 0, lit(1L << bit)).otherwise(lit(0L))
        }.reduce(_ + _).as("sig"))
    }: _*)
  }

  def ngramSet(text: Column, n: Int): Column =
    array_distinct(shingles(text, n))

  /** One alternating-star round (see [[connectedComponents]]): for every
    * node u with neighborhood Γ(u), m = min(Γ(u) ∪ {u});
    *   large star: re-attach the strictly LARGER neighbors to m,
    *   small star: re-attach the smaller-or-equal neighbors (and u) to m.
    * One symmetrize + one groupBy(min) + one edge-sized equi-join —
    * shuffle is O(|E|), nothing accumulates per node.
    */
  private def starRound(edges: DataFrame, large: Boolean): DataFrame = {
    val sym = edges.unionByName(
      edges.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min(col("v")).as("_mv"))
      .select(col("u"), least(col("u"), col("_mv")).as("m"))
    val j = sym.join(mins, "u")
    val out =
      if (large) j.filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      else j.filter(col("v") <= col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins.select(col("u"), col("m").as("v")))
    out.filter(!(col("u") <=> col("v"))).distinct()
  }

  /** Connected components over a duplicate-pair edge list: groups
    * near-duplicates (from [[minhashDupPairs]] / [[signBands]] candidates)
    * into clusters so a pipeline can keep one canonical doc per cluster.
    *
    * Alternating large-star/small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): each round is one
    * groupBy + one edge-sized equi-join (shuffle O(|E|), never a per-node
    * adjacency list), and the edge set converges to disjoint min-rooted
    * stars in O(log n) rounds — the shape that survives 100 TB edge
    * lists, unlike diameter-bound label propagation. Rounds are cut from
    * the lineage via `materialize`; convergence = (count, order-free
    * checksum) of the edge set stable across a full large+small cycle.
    *
    * Small-graph tail: when the deduplicated edge count is at most
    * `smallGraphThreshold` (known for free from the first convergence
    * stamp), the rounds are pointless — each one costs a scheduling-floor
    * job to move a few KB. The edges are pulled to the driver (bounded:
    * threshold × 2 ids) and finished with a union-find in microseconds.
    * LSH candidate graphs are usually exactly this tail: dedup rates of a
    * few percent leave edge sets orders of magnitude smaller than the
    * corpus. Set the threshold to 0 to force the distributed path.
    *
    * Output: (node, component = min node id in the component), one row per
    * node that appears in `pairs` (singleton docs never enter the edge
    * list; left-join the corpus if they need rows).
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50,
      materialize: DataFrame => DataFrame = _.localCheckpoint(false),
      smallGraphThreshold: Long = 100000L): DataFrame = {
    var edges = materialize(
      pairs.select(col(aCol).as("u"), col(bCol).as("v"))
        .filter(!(col("u") <=> col("v"))).distinct())
    def stamp(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(sum(hash(col("u"),
        col("v")).cast("long")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var last = stamp(edges)
    if (last._1 <= smallGraphThreshold) return localUnionFind(edges)
    var round = 0
    var converged = last._1 == 0L
    while (!converged && round < maxRounds) {
      edges = materialize(starRound(starRound(edges, large = true),
        large = false))
      val cur = stamp(edges)
      converged = cur == last
      last = cur
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxRounds rounds")
    // at fixpoint the edges are min-rooted stars: component(u) =
    // min(u, min neighbor); roots map to themselves
    val sym = edges.unionByName(
      edges.select(col("v").as("u"), col("u").as("v")))
    sym.groupBy("u").agg(min(col("v")).as("_mv"))
      .select(col("u").as("node"),
        least(col("u"), col("_mv")).as("component"))
  }

  /** Driver-side union-find finish for the small-graph tail of
    * [[connectedComponents]]: same (node, min-member component) contract,
    * computed in one collect instead of log-n distributed rounds. Ordering
    * for the min label matches SQL LEAST via the catalyst row ordering of
    * the id column (ids are numeric/string in practice — Comparable).
    */
  private def localUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val idType = edges.schema("u").dataType
    // the min-label fold below compares ids via Comparable — a struct/
    // array/map id would CCE mid-fold; fail loudly at the gate instead
    val orderableAtomic = idType match {
      case _: org.apache.spark.sql.types.StructType |
           _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           org.apache.spark.sql.types.BinaryType => false
      case _ => true
    }
    require(orderableAtomic,
      s"localUnionFind needs an orderable atomic id column (numeric/" +
        s"string/date/timestamp), got ${idType.catalogString}")
    val rows = edges.collect()
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    rows.foreach { row =>
      val (u, v) = (row.get(0), row.get(1))
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(ru) = rv
    }
    implicit val anyOrd: Ordering[Any] =
      (a: Any, b: Any) => a.asInstanceOf[Comparable[Any]].compareTo(b)
    val label = parent.keys.toSeq.groupBy(find)
      .flatMap { case (_, members) =>
        val m = members.min
        members.map(n => n -> m)
      }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val list = new java.util.ArrayList[Row](label.size)
    label.foreach { case (n, m) => list.add(Row(n, m)) }
    spark.createDataFrame(list,
      StructType(Seq(StructField("node", idType),
        StructField("component", idType))))
  }

  /** [[contaminationScore]]'s FAST tier: grams are never materialized as
    * strings — each TOKEN is hashed once ([[polyHash]], the pure-BIGINT
    * Karp–Rabin fold), and an n-gram's hash is the arithmetic
    * combination of its n token hashes (fold of acc·131 + h mod
    * [[FP_P]]). One token-hash per token instead of one digest per gram
    * over a 3×-longer string, and no gram-string construction (slice +
    * array_join per position) at all — and any SQL engine still computes
    * identical hashes, so the DuckDB oracle re-derives the same overlap
    * exactly. (Measured head-to-head in a quiet window, r11: the
    * per-char Karp–Rabin fold edges out a per-token md5 on the
    * decontamination/span-pair pipelines — 6.4 vs 7.3 and 10.3 vs 13.3
    * task-s at sf0.1 — and ties within noise on the incremental-span and
    * curate composites, whose cost is job-count floor, not hashing.)
    */
  def contaminationScoreRolling(
      corpus: DataFrame, idCol: String, textCol: String,
      contam: DataFrame, contamTextCol: String,
      n: Int = 3): DataFrame = {
    def gramHashes(df: DataFrame, text: String,
        extra: Seq[Column]): DataFrame =
      rollingGramArrays(df, text, extra, n)
        .select(extra :+ explode(col("_g")).as("_h"): _*)
    val contamSet = gramHashes(contam, contamTextCol, Seq.empty).distinct()
    gramHashes(corpus, textCol, Seq(col(idCol)))
      .join(contamSet.withColumn("_hit", lit(1L)), Seq("_h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("_hit")), lit(0L)).as("n_hit"))
      .select(col(idCol), col("n_grams"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_grams"))
          .as("contamination"))
  }

  /** Per-document distinct rolling-gram-hash ARRAYS (the
    * [[contaminationScoreRolling]] fast tier staging, shared with the
    * Bloom variant). Token hashes are the pure-BIGINT Karp–Rabin
    * [[polyHash]] — inside a HOF lambda every expression evaluates
    * interpreted, and a per-char arithmetic fold measured ~4× cheaper
    * than a per-token md5 (digest + hex + base-16 parse per element);
    * same fast tier already graded green in llm_minhash_fast/llm_inc_dedup.
    * _toks and _th staged as real columns; the size filter
    * references ONLY _toks (predicate pushdown substitutes it into a
    * tokens-only re-evaluation — never the hash pipeline); the persist is a
    * pushdown barrier: a downstream Generate's derived isnotnull/size
    * filters would otherwise be substituted all the way down to the text
    * column, re-inlining the whole token-hash + gram pipeline into a
    * per-row Filter evaluated before the projections (measured 3× the
    * query's entire cost). Cached payload is (extra, gram-hash array) —
    * tiny relative to the text.
    */
  private def rollingGramArrays(df: DataFrame, text: String,
      extra: Seq[Column], n: Int): DataFrame = {
    import org.apache.spark.sql.graft.{GraftPolyHashArray, GraftRollingGrams, Shims}
    df.select(extra :+ TextAnalysis.tokens(col(text)).as("_toks"): _*)
      .filter(size(col("_toks")) >= n)
      .select(extra :+ Shims.column(GraftPolyHashArray(
        Shims.expression(col("_toks")))).as("_th"): _*)
      .select(extra :+ array_distinct(Shims.column(GraftRollingGrams(
        Shims.expression(col("_th")), n, 131L))).as("_g"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** HOF reference form of the gram pipeline's per-row kernels
    * (equivalence spec): token hashes and n-window folds.
    */
  private[graft] def rollingGramsHof(th: Column, n: Int): Column =
    transform(sequence(lit(1), size(th) - n + 1),
      i => aggregate(slice(th, i, lit(n)), lit(7L),
        (acc, h) => (acc * 131L + h) % FP_P))

  /** [[contaminationScoreRolling]] with a Bloom-sketch pre-filter — the
    * join-INPUT shape for 100 TB. The exact equi-join against the distinct
    * contamination set is what makes the score exact, but it shuffles (or
    * at best broadcast-probes) EVERY corpus gram; when the contamination
    * set outgrows broadcast range, the non-contaminated ~99.9% of corpus
    * grams pay a shuffle just to NOT match. Here a Bloom sketch of the
    * contamination hashes (megabytes for millions of grams — collected
    * once, an offline artifact like the IVF centroids, shipped in the task
    * binary) is applied SCAN-SIDE with `might_contain`: only Bloom
    * candidates (true hits + the fp-rate tail) ever reach the exact
    * confirm join, so the shuffled corpus volume drops from O(all grams)
    * to O(hits). False positives cost only a wasted probe — the confirm
    * join keeps the output exactly equal to [[contaminationScoreRolling]],
    * which is why the same DuckDB oracle grades it. Per-doc totals come
    * from the gram-array length before the explode — no aggregation of
    * unfiltered grams anywhere.
    *
    * Uses Spark's own runtime-filter machinery (`BloomFilterAggregate` /
    * `BloomFilterMightContain` — codegen'd, the sketch deserialized once
    * per task) rather than a hand-rolled bitset.
    */
  def bloomContaminationScore(
      corpus: DataFrame, idCol: String, textCol: String,
      contam: DataFrame, contamTextCol: String,
      n: Int = 3,
      expectedContamGrams: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Shims
    import org.apache.spark.sql.types.BinaryType
    val contamSet = rollingGramArrays(contam, contamTextCol, Seq.empty, n)
      .select(explode(col("_g")).as("_h")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sketchCol = Shims.column(
      new BloomFilterAggregate(Shims.expression(col("_h")),
        expectedContamGrams).toAggregateExpression())
    // one tiny driver artifact (null on an empty contamination set)
    val sketch = contamSet.select(sketchCol).head.get(0)
      .asInstanceOf[Array[Byte]]
    val corpusGrams = rollingGramArrays(corpus, textCol, Seq(col(idCol)), n)
    val totals = corpusGrams
      .select(col(idCol), size(col("_g")).cast("long").as("n_grams"))
    val hits =
      if (sketch == null)
        totals.select(col(idCol), lit(0L).as("n_hit")).limit(0)
      else
        corpusGrams.select(col(idCol), explode(col("_g")).as("_h"))
          .filter(Shims.column(BloomFilterMightContain(
            Literal(sketch, BinaryType), Shims.expression(col("_h")))))
          .join(contamSet, Seq("_h"))
          .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_grams"))
          .as("contamination"))
  }

  /** Exact k-token-span duplicate pairs — the exact-substring dedup
    * discipline of "Deduplicating Training Data Makes Language Models
    * Better" (Lee et al., 2022) re-expressed relationally: two documents
    * are span-duplicates when they share ANY exact k-token window, and a
    * pair carries the count of distinct shared spans. Complements the
    * approximate tiers (MinHash estimates whole-document similarity; this
    * catches verbatim partial overlap — quoted passages, mirrored
    * sections — that a low global Jaccard hides).
    *
    * Plan shape at 100 TB: distinct (doc, span-hash) rows self-equi-join
    * on the hash — document all-pairs never happens. The frequency gate
    * runs first: spans with document frequency < 2 cannot pair and spans
    * above `maxDf` (boilerplate headers/footers shared by thousands of
    * docs) are dropped, the standard cap that bounds the per-span pair
    * fan-out at maxDf² instead of letting one viral span go quadratic in
    * the corpus. Span hashes are the same Karp-Rabin token-hash fold as
    * [[contaminationScoreRolling]], so any engine re-derives them.
    */
  def spanDupPairs(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 8, maxDf: Long = 50L): DataFrame = {
    val g = rollingGramArrays(corpus, textCol, Seq(col(idCol)), k)
      .select(col(idCol).as("id"), explode(col("_g")).as("_h"))
    val gate = g.groupBy("_h").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= 2 && col("_df") <= maxDf)
      .select("_h")
    val gk = g.join(gate, Seq("_h"))
    val a = gk.select(col("_h"), col("id").as("id_a"))
    val b = gk.select(col("_h"), col("id").as("id_b"))
    a.join(b, Seq("_h")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_spans"))
  }

  /** Benchmark decontamination: per-document overlap with a contamination
    * set (eval/benchmark texts that must not leak into training data).
    * Score = fraction of the document's distinct n-grams that appear
    * anywhere in the contamination set — the standard n-gram-overlap
    * decontamination rule.
    *
    * Plan shape: both sides explode to (id, ngramHash) / (ngramHash)
    * rows; the contamination side is a DISTINCT hash set (one shuffle of
    * the small side); the overlap count is an equi-join on the hash — the
    * planner broadcasts when the set is small, falls back to a hash-
    * partitioned join when it is not. The corpus is never all-pairs
    * compared to anything; cost is O(corpus n-grams + contam n-grams).
    */
  def contaminationScore(
      corpus: DataFrame, idCol: String, textCol: String,
      contam: DataFrame, contamTextCol: String,
      n: Int = 3,
      hashFn: (Column, Int) => Column = xxHash): DataFrame = {
    // tokens staged as a real column with the size filter BETWEEN the
    // projections: the HOF lambda re-evaluates captured sub-expressions
    // per element, and CollapseProject would inline a once-used alias
    // back into the lambda (re-tokenizing per shingle position, O(L²));
    // an intervening Filter blocks the collapse — the llm_minhash idiom
    def gramHashes(df: DataFrame, text: String,
        extra: Seq[Column]): DataFrame =
      df.select(extra :+ TextAnalysis.tokens(col(text)).as("_toks"): _*)
        .filter(size(col("_toks")) >= n)
        .select(extra :+
          array_distinct(shinglesOfTokens(col("_toks"), n)).as("_grams"): _*)
        .select(extra :+ explode(col("_grams")).as("_g"): _*)
        .select(extra :+ hashFn(col("_g"), 0).as("_h"): _*)
    val contamSet = gramHashes(contam, contamTextCol, Seq.empty)
      .distinct()
    // single pass: mark hits with a left join against the distinct set
    // (multiplicity-safe), then ONE per-doc aggregation for both counts
    gramHashes(corpus, textCol, Seq(col(idCol)))
      .join(contamSet.withColumn("_hit", lit(1L)), Seq("_h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(col("_hit")), lit(0L)).as("n_hit"))
      .select(col(idCol), col("n_grams"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_grams"))
          .as("contamination"))
  }

  /** One step of INCREMENTAL cross-corpus exact dedup: admit the rows of
    * `batch` whose fingerprint has never been seen by the trace (ties
    * within the batch go to the lowest id), and record the admissions so
    * later batches dedup against them. This is the continuous-ingest
    * shape of a training-data pipeline — each crawl increment dedups
    * against the WHOLE accumulated corpus without rescanning it: the
    * trace probe is partition-pruned to the batch's fingerprint buckets
    * (memtable-resident while small, bucketed parquet at scale), and the
    * state write is an O(|admitted|) run append. The reference expresses
    * the same computation as an incremental DISTINCT/ARG_MIN view over an
    * append stream (SURVEY §2.5, distinct.rs); here the dedup key set IS
    * the operator state.
    *
    * Returns the admitted (fpCol, idCol) rows, eagerly materialized
    * (their plan must not see the trace's own append).
    */
  def incrementalDedup(trace: graft.incremental.Trace, batch: DataFrame,
      fpCol: String, idCol: String): DataFrame = {
    import graft.zset.ZSets
    // within-batch winner per fingerprint; read twice (probe + admit)
    val w = graft.incremental.Trace.materialize(
      batch.groupBy(col(fpCol)).agg(min(col(idCol)).as(idCol)))
    val seen = trace.probe(w.select(col(fpCol)))
    val admitted = graft.incremental.Trace.materialize(
      w.join(seen.select(col(fpCol)), Seq(fpCol), "left_anti"))
    trace.append(admitted.withColumn(ZSets.W, lit(1L)))
    admitted
  }

  /** Incremental SPAN-level dedup/decontamination — [[incrementalDedup]]
    * for partial overlap: a batch's documents are admitted only while the
    * fraction of their k-token spans already present in the accumulated
    * span state of PREVIOUSLY ADMITTED documents stays below `threshold`,
    * and an admitted document appends only its genuinely new span hashes
    * (O(|new spans|), never a state rescan — rejected documents, the
    * usual crawl majority, contribute nothing). This is the
    * continuous-ingest form of [[spanDupPairs]]: the batch equivalent
    * finds verbatim partial overlap inside a static corpus; this one
    * blocks it at the door as the corpus accumulates.
    *
    * Within a batch, overlap is measured against prior state only
    * (micro-batch semantics; intra-batch near-dups are [[spanDupPairs]]'s
    * concern). Returns one row per document with spans:
    * (idCol, n_spans, n_seen, overlap, admitted) — eagerly materialized
    * so the caller's plan never observes the trace's own append.
    */
  def incrementalSpanDedup(trace: graft.incremental.Trace,
      batch: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    import graft.zset.ZSets
    val grams = rollingGramArrays(batch, textCol, Seq(col(idCol)), k)
    val g = graft.incremental.Trace.materialize(
      grams.select(col(idCol), explode(col("_g")).as("_h")))
    grams.unpersist()
    // state hashes present in this batch — read twice (score + new-hash
    // anti-join), so pin the probe result
    val seen = graft.incremental.Trace.materialize(
      trace.probe(g.select("_h").distinct()).select("_h").distinct())
    val scored = graft.incremental.Trace.materialize(
      g.join(seen.withColumn("_hit", lit(1L)), Seq("_h"), "left")
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_spans"),
          coalesce(sum(col("_hit")), lit(0L)).as("n_seen"))
        .select(col(idCol), col("n_spans"), col("n_seen"),
          (col("n_seen").cast("double") / col("n_spans")).as("overlap"))
        .withColumn("admitted", col("overlap") < threshold))
    val newHashes = g
      .join(scored.filter(col("admitted")).select(idCol), Seq(idCol))
      .select("_h").distinct()
      .join(seen, Seq("_h"), "left_anti")
    trace.append(newHashes.withColumn(ZSets.W, lit(1L)))
    scored
  }

  /** Boilerplate removal by corpus-level SEGMENT dedup (the CCNet recipe:
    * drop paragraphs/lines whose hash repeats across documents — headers,
    * navigation chrome, license blurbs). The segmenter is pluggable; real
    * corpora segment on newlines, this form uses consecutive `segTokens`-
    * token windows (the driver corpus has no line structure). A segment
    * appearing in ≥ `maxDf` DISTINCT documents is dropped from every
    * document; survivors are reassembled in original order.
    *
    * 100-TB shape: segments are hashed scan-side ([[md5Hash]] — ONE
    * codegen'd digest per segment, any engine re-derives it; an
    * interpreted per-char fold measured ~10x slower here); the
    * document-frequency pass is a
    * map-side-combined groupBy on the hash; the common-segment set (tiny
    * by construction — boilerplate is the repeated FEW) broadcasts into a
    * left-anti join; reassembly groups by document. No all-pairs stage.
    *
    * Returns (idCol, n_segs, n_kept, clean_text) — one row per input
    * document, including documents whose every segment was dropped.
    */
  def dropCommonSegments(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 5, maxDf: Long = 2L): DataFrame = {
    val toks = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("_toks"))
    // Column `/` is fractional — floor back to the integer segment count
    val lastSeg = floor((size(col("_toks")) - 1) / lit(segTokens)).cast("int")
    val nSegs = when(size(col("_toks")) < 1, lit(0L))
      .otherwise((lastSeg + 1).cast("long"))
    val segArr = when(size(col("_toks")) < 1,
      array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), lastSeg),
        i => array_join(
          slice(col("_toks"), i * segTokens + 1, lit(segTokens)), " ")))
    // base feeds the hashed-segment frame AND the final n_segs join —
    // stage it so tokenize+segment runs once (same discipline as `segs`)
    val base = toks.select(col(idCol), nSegs.as("n_segs"), segArr.as("_segs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the hashed segment frame feeds BOTH the df-count and the keep join
    // (and the hash is the expensive projection) — stage it once, the
    // minhashDupPairs signature-persist discipline
    val segs = base
      .select(col(idCol), posexplode(col("_segs")).as(Seq("_i", "_seg")))
      .withColumn("_h", md5Hash(col("_seg"), 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val common = segs.groupBy("_h")
      .agg(countDistinct(col(idCol)).as("_df"))
      .filter(col("_df") >= maxDf).select("_h")
    val kept = segs.join(broadcast(common), Seq("_h"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("_i"), col("_seg")))),
            s => s.getField("_seg")),
          " ").as("clean_text"))
    base.select(col(idCol), col("n_segs"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
