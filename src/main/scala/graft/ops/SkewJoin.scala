package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware equi-joins. AQE's skew mitigation splits oversized shuffle
  * PARTITIONS, but a single hot key still lands every one of its rows in
  * one task — at 100 TB one viral key can hold a stage hostage. Salting
  * spreads a hot key over `factor` reducers: the probe side tags each row
  * with a deterministic salt in [0, factor), the build side is replicated
  * once per salt value, and the join key becomes (keys..., salt).
  *
  * Two forms:
  *  - [[salted]]: salt every key — right when the build side is small
  *    (replication cost = factor × |build|) and skew is broad.
  *  - [[saltedHot]]: the production two-path pattern — only the named hot
  *    keys are salted+replicated; the cold majority takes the normal join.
  *    Hot keys come from the caller (a prior count, a catalog statistic,
  *    or a previous run's skew report) so the plan stays action-free.
  *
  * The salt is a content hash (xxhash64 of the probe row), never a random
  * number: deterministic under task retry and speculative execution, which
  * random salting is not.
  */
object SkewJoin {

  private val SaltCol = "_salt"

  private def withSalt(df: DataFrame, factor: Int): DataFrame =
    df.withColumn(SaltCol,
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(factor.toLong)))

  private def replicate(df: DataFrame, factor: Int): DataFrame =
    df.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(factor.toLong - 1))))

  /** Inner equi-join with every probe row salted and the whole build side
    * replicated `factor` times.
    */
  def salted(probe: DataFrame, build: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    withSalt(probe, factor)
      .join(replicate(build, factor), keys :+ SaltCol)
      .drop(SaltCol)
  }

  /** Inner equi-join salting ONLY the rows whose first join-key value is
    * in `hotValues`; all other keys join unsalted. One probe scan feeds
    * both paths; the build side replicates only its hot rows.
    *
    * INNER-join only: rows whose first key is NULL fail both the `isHot`
    * and `!isHot` filters and are dropped from both paths — equivalent for
    * inner equi-joins (a NULL key never matches), but NOT valid for outer
    * joins, which must preserve the null-keyed rows.
    */
  def saltedHot(probe: DataFrame, build: DataFrame, keys: Seq[String],
      hotValues: Seq[Any], factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val isHot = col(keys.head).isin(hotValues: _*)
    val hot = salted(probe.filter(isHot), build.filter(isHot), keys, factor)
    val cold = probe.filter(!isHot).join(build.filter(!isHot), keys)
    hot.unionByName(cold)
  }
}
