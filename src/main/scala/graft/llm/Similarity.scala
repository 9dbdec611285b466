package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two tiers, as a training-data pipeline needs at 100 TB:
  *   - brute-force cosine top-k: broadcast the (small) probe set, scan the
  *     corpus once — exact, no corpus shuffle;
  *   - LSH-bucketed ANN: deterministic hash-derived random hyperplanes →
  *     sign signature → candidates share a bucket; corpus shuffles only
  *     (bucket, id, vec) and each probe compares against one bucket.
  * All arithmetic is sequential-fold (`aggregate`) in fixed order —
  * deterministic, codegen'd, no UDFs.
  */
object Similarity {

  /** Dot product of two equal-length numeric arrays (left-to-right fold,
    * element products in double — same arithmetic as the codegen'd
    * functions.VectorDotFloat fast path).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0d))

  /** Integer-quantized cosine: elements scaled by `scale` and rounded to
    * BIGINT, so dot/norms are exact integer sums — bit-identical across
    * engines and partitionings (used by the oracle-checked queries).
    */
  def quantize(a: Column, scale: Int): Column =
    transform(a, x => round(x.cast("double") * scale).cast("long"))

  def cosineQuantized(a: Column, b: Column, scale: Int): Column = {
    val (qa, qb) = (quantize(a, scale), quantize(b, scale))
    val idot = aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L),
      (acc, x) => acc + x)
    val na = aggregate(transform(qa, x => x * x), lit(0L), (acc, x) => acc + x)
    val nb = aggregate(transform(qb, x => x * x), lit(0L), (acc, x) => acc + x)
    idot.cast("double") / nullif(sqrt(na.cast("double")) * sqrt(nb.cast("double")), lit(0d))
  }

  /** Exact brute-force top-k: for each probe, the k nearest corpus vectors
    * by cosine. Probe set must be small (it is broadcast); the corpus is
    * scanned once with no shuffle of vectors — only (probe_id, corpus_id,
    * sim) pairs move, pruned by the rank filter's partial-sort pushdown.
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      probeId: String = "probe_id", corpusId: String = "corpus_id",
      vecCol: String = "embedding", quantScale: Int = 0): DataFrame = {
    val sim =
      if (quantScale > 0)
        cosineQuantized(col(s"p.$vecCol"), col(s"c.$vecCol"), quantScale)
      else cosine(col(s"p.$vecCol"), col(s"c.$vecCol"))
    val scored = broadcast(probes.alias("p"))
      .crossJoin(corpus.alias("c"))
      .select(col(s"p.$probeId").as("probe_id"),
        col(s"c.$corpusId").as("corpus_id"), sim.as("sim"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("corpus_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 mapped to [-1, 1). No RNG state — reproducible anywhere.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(1000003L)).cast("double")
      / 500001.5) - 1.0

  /** Sign-LSH bucket id from `planes` hyperplanes (bit b = sign of
    * dot(plane_b, vec)).
    */
  def lshBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Trained IVF coarse quantizer: the (tiny) centroid table. Built ONCE,
    * offline, like any vector index; queries embed the centroids as plan
    * literals and never collect anything.
    */
  final case class IvfIndex(centroids: Seq[(Int, Seq[Double])]) {
    /** nearest-`n` cells of a vector as a pure scan-side expression:
      * array<struct<d2,cell>>, centroids inlined as literals.
      */
    private[llm] def cellsExpr(vec: Column, n: Int): Column = {
      val centArr = array(centroids.map { case (cell, cv) =>
        struct(array(cv.map(lit): _*).as("cvec"), lit(cell).as("cell"))
      }: _*)
      val scored = transform(centArr, c => struct(
        aggregate(zip_with(vec, c.getField("cvec"),
          (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
          lit(0d), (acc, x) => acc + x).as("d2"),
        c.getField("cell").as("cell")))
      slice(array_sort(scored), 1, n)
    }
    def cellOf(vec: Column): Column =
      cellsExpr(vec, 1).getItem(0).getField("cell")
  }

  /** INDEX BUILD (offline, once): deterministic k-means-lite — centroids
    * seeded from hash-selected corpus vectors, refined by `iters` Lloyd
    * rounds. Each round is fully distributed: assignment is a scan-side
    * centroid-literal expression and the per-cell/dimension means are
    * partially aggregated map-side, so only nCells×dim partials shuffle.
    * The only driver transfer is the centroid table itself (nCells×dim
    * doubles) — the artifact being built.
    */
  def ivfTrain(corpus: DataFrame, nCells: Int, iters: Int = 2,
      corpusId: String = "corpus_id",
      vecCol: String = "embedding"): IvfIndex = {
    var index = IvfIndex(corpus
      .withColumn("__h", xxhash64(col(corpusId)))
      .orderBy("__h").limit(nCells)
      .select(transform(col(vecCol), _.cast("double")).as("cvec"))
      .collect().toSeq.zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0)) })
    (0 until iters).foreach { _ =>
      index = IvfIndex(corpus
        .withColumn("cell", index.cellOf(col(vecCol)))
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("d", "x")))
        .groupBy("cell", "d").agg(avg(col("x")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
        .select(col("cell"),
          transform(col("dm"), s => s.getField("m")).as("cvec"))
        .collect().toSeq
        .map(r => (r.getInt(0), r.getSeq[Double](1))))
    }
    index
  }

  /** IVF ANN query: probes search only their `nprobe` nearest cells of a
    * pre-trained index. Pure plan — no driver work: cell assignment is a
    * centroid-literal expression on both sides and the probe side is
    * broadcast, so the corpus is scanned, never shuffled. At 100 TB the
    * corpus is written bucketed by `cell` ([[ivfWriteBucketed]]) and the
    * scan prunes to nprobe/nCells of the data.
    */
  def ivfTopK(probes: DataFrame, corpus: DataFrame, index: IvfIndex, k: Int,
      nprobe: Int = 2, probeId: String = "probe_id",
      corpusId: String = "corpus_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpusCells = corpus.withColumn("cell", index.cellOf(col(vecCol)))
      .select(col("cell"), col(corpusId), col(vecCol).as("__cv"))
    ivfProbeJoin(probes, corpusCells, index, k, nprobe, probeId, corpusId,
      vecCol)
  }

  /** Write the corpus pre-assigned and bucketed by cell — the on-disk IVF
    * inverted-file layout. Queries against the bucketed table read only
    * matching buckets and the cell join needs no corpus-side exchange.
    */
  def ivfWriteBucketed(corpus: DataFrame, index: IvfIndex, table: String,
      nBuckets: Int, corpusId: String = "corpus_id",
      vecCol: String = "embedding"): Unit =
    corpus.withColumn("cell", index.cellOf(col(vecCol)))
      .select(col("cell"), col(corpusId), col(vecCol).as("__cv"))
      .write.mode("overwrite")
      .bucketBy(nBuckets, "cell").sortBy("cell")
      .format("parquet").saveAsTable(table)

  /** IVF query over a bucketed corpus table written by
    * [[ivfWriteBucketed]].
    */
  def ivfTopKBucketed(probes: DataFrame, bucketedTable: String,
      index: IvfIndex, k: Int, nprobe: Int = 2,
      probeId: String = "probe_id", corpusId: String = "corpus_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpusCells = probes.sparkSession.table(bucketedTable)
    ivfProbeJoin(probes, corpusCells, index, k, nprobe, probeId, corpusId,
      vecCol)
  }

  private def ivfProbeJoin(probes: DataFrame, corpusCells: DataFrame,
      index: IvfIndex, k: Int, nprobe: Int, probeId: String,
      corpusId: String, vecCol: String): DataFrame = {
    val probeCells = probes.withColumn("__cells",
      transform(index.cellsExpr(col(vecCol), nprobe),
        c => c.getField("cell")))
      .select(col(probeId), col(vecCol).as("__pv"),
        explode(col("__cells")).as("cell"))
    val scored = broadcast(probeCells).join(corpusCells, "cell")
      .select(col(probeId).as("probe_id"), col(corpusId).as("corpus_id"),
        cosine(col("__pv"), col("__cv")).as("sim"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("corpus_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** ANN top-k via sign-LSH: probes only compare corpus vectors in the
    * same bucket. Recall < 1 by construction; scale path for when the
    * corpus no longer fits a broadcast-probe cross product.
    */
  def lshTopK(probes: DataFrame, corpus: DataFrame, k: Int, planes: Int,
      probeId: String = "probe_id", corpusId: String = "corpus_id",
      vecCol: String = "embedding"): DataFrame = {
    val pb = probes.withColumn("bucket", lshBucket(col(vecCol), planes))
    val cb = corpus.withColumn("bucket", lshBucket(col(vecCol), planes))
    val scored = broadcast(pb.alias("p")).join(cb.alias("c"), "bucket")
      .select(col(s"p.$probeId").as("probe_id"),
        col(s"c.$corpusId").as("corpus_id"),
        cosine(col(s"p.$vecCol"), col(s"c.$vecCol")).as("sim"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sim").desc, col("corpus_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
