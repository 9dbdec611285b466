package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and source-mixing operators for training-data
  * pipelines (beyond-reference; companions to [[Dedup]]/[[TextAnalysis]]).
  *
  * All sampling decisions derive from a seeded content hash of the row id,
  * never from RNG state: the same row is kept or dropped regardless of
  * partitioning, retries, or cluster size — the only sampling discipline
  * that is reproducible (and auditable) at 100 TB. The filters are pure
  * stateless expressions evaluated on the scan (no shuffle); the mixing
  * planner adds one tiny per-source aggregate broadcast back onto the scan.
  *
  * Hash buckets use the md5-derived 60-bit hash ([[Dedup.md5Hash]]) reduced
  * mod 1e6, so any SQL engine re-derives identical keep/drop decisions.
  */
object Sampling {

  /** Bucket granularity: rates are expressed in parts-per-million. */
  val M = 1000000L

  /** Deterministic bucket in [0, 1e6) for a row id. */
  def hashBucket(id: Column, seed: Int): Column =
    pmod(Dedup.md5Hash(id.cast("string"), seed), lit(M))

  /** SQL fragment mirroring [[hashBucket]] (DuckDB/ANSI). */
  def sqlHashBucket(expr: String, seed: Int): String =
    s"CAST(('0x' || substr(md5('$seed:' || CAST($expr AS VARCHAR)), 1, 15)) AS BIGINT) % $M"

  /** Uniform deterministic sample: keeps ~`rate` of rows, exactly
    * reproducibly. A pure filter — pushed to the scan, zero shuffle.
    */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
      seed: Int = 7): DataFrame =
    df.filter(hashBucket(col(idCol), seed) < lit((rate * M).toLong))

  /** Per-stratum deterministic rates (e.g. downsample low-quality sources,
    * upweight rare languages). Unlisted strata get `defaultRate`.
    * Still a pure stateless filter.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      seed: Int = 7): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit((defaultRate * M).toLong)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit((r * M).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), seed) < thr)
  }

  /** Exactly `k` rows per stratum, chosen by hash order — a deterministic
    * "random" fixed-size sample (reservoir-sampling analogue without RNG
    * state). row_number ≤ k compiles to WindowGroupLimit: each map task
    * pre-prunes to its local top-k before the per-stratum shuffle, so the
    * exchange carries O(k × partitions), not the full table.
    */
  def topKPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, seed: Int = 7): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol), seed), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic global shuffle + shard assignment — the layout step
    * that turns a curated corpus into training shards: every row gets a
    * shard in [0, nShards) and a position within its shard, both derived
    * ONLY from the row id and the seed. The "shuffle" is hash order (a
    * content-derived total order), not an RNG permutation, so the result
    * is identical across partitionings, retries, and cluster sizes, and
    * any engine re-derives it. Epoch reshuffles = new seed.
    *
    * Plan shape: one exchange on shard (which the shard-file write needs
    * anyway) + a per-shard sort; row_number over (shard, hash) — with
    * nShards sized so a shard fits a writer task (the usual 100-TB shard
    * discipline: thousands of shards, not eight).
    */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
      seed: Int = 7): DataFrame = {
    val withShard = df.withColumn("shard",
      pmod(hashBucket(col(idCol), seed), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(hashBucket(col(idCol), seed + 1), col(idCol))
    withShard.withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** Deterministic train/val/test split assignment, with a contamination
    * quarantine lane: the split derives from (id, seed) ONLY — the same
    * row lands in the same split across input layouts, retries, epochs,
    * and cluster sizes, and adding data never moves existing rows between
    * splits (the property a random split lacks). Rows matching
    * `quarantine` (e.g. benchmark-contaminated docs from
    * [[Dedup.contaminationScoreRolling]]) are routed to 'quarantine'
    * regardless of bucket, so eval text can never leak into a training
    * shard even when the corpus is re-split.
    *
    * Percents are out of 100: train takes buckets [0, trainPct), val
    * [trainPct, trainPct+valPct), test the rest. Adds `bucket` (BIGINT in
    * [0,100)) and `split` (STRING); a pure stateless projection on the
    * scan — zero shuffle.
    */
  def splitAssign(df: DataFrame, idCol: String, seed: Int = 7,
      trainPct: Int = 90, valPct: Int = 5,
      quarantine: Column = lit(false)): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percents out of range: train=$trainPct val=$valPct")
    df.withColumn("bucket", pmod(hashBucket(col(idCol), seed), lit(100L)))
      .withColumn("split",
        when(quarantine, lit("quarantine"))
          .when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }

  /** Mix strata to target proportions (ppm weights), keeping the most
    * constrained stratum whole: achievable total N = min_s(n_s·M ÷ w_s),
    * per-stratum threshold = min(M, w_s·N ÷ n_s). All arithmetic is Long
    * floor-division so any engine derives the identical thresholds (swap
    * to DECIMAL(38,0) beyond ~1e11 rows per stratum).
    *
    * Plan shape: per-stratum count (map-side combined, one row per
    * stratum) → scalar min → broadcast of the tiny rate table back onto
    * the scan → stateless hash filter. One pass over the data.
    */
  def mixToProportions(df: DataFrame, stratumCol: String, idCol: String,
      weightsPpm: Map[String, Long], seed: Int = 7): DataFrame =
    mixImpl(df, stratumCol, idCol, count(lit(1)), weightsPpm, seed)

  /** [[mixToProportions]] measured in a weight column instead of row
    * count — token counts, the unit training mixtures are actually
    * specified in ("30% code tokens", not "30% code documents").
    * Thresholds derive from per-stratum exact BIGINT weight sums; the
    * keep decision is the same stateless hash filter, so the KEPT weight
    * per stratum matches the target in expectation (documents are atomic
    * — exact-to-the-token trimming would need a per-stratum running sum,
    * the shape [[topKPerStratum]] covers for fixed-size needs).
    */
  def mixToProportionsByWeight(df: DataFrame, stratumCol: String,
      idCol: String, weightCol: String, weightsPpm: Map[String, Long],
      seed: Int = 7): DataFrame =
    mixImpl(df, stratumCol, idCol, sum(col(weightCol)), weightsPpm, seed)

  private def mixImpl(df: DataFrame, stratumCol: String, idCol: String,
      measure: Column, weightsPpm: Map[String, Long],
      seed: Int): DataFrame = {
    val wdf = df.sparkSession.createDataFrame(
      weightsPpm.toSeq.sortBy(_._1)).toDF(stratumCol, "_w")
    val counts = df.groupBy(col(stratumCol))
      .agg(measure.as("_n"))
      .join(wdf, stratumCol)
    // scalar min over the tiny counts table via a global window (a
    // crossJoin of counts with its own aggregate trips Spark's self-join
    // attribute dedup; and column resolution is case-insensitive, so the
    // total must NOT be named "_N" — withColumn would replace "_n")
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = counts
      .withColumn("_ntot", min(expr("_n * 1000000 div _w")).over(all))
      .select(col(stratumCol),
        least(lit(M), expr("_w * _ntot div _n")).as("_thr"))
    df.join(broadcast(rates), stratumCol)
      .filter(hashBucket(col(idCol), seed) < col("_thr"))
      .drop("_thr")
  }
}
