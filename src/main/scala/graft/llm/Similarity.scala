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

  /** Dot product of two equal-length numeric arrays (left-to-right fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)

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
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
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
