package graft.zset

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-set (weighted multiset) conventions over DataFrames.
  *
  * Reference: the DBSP core collection type (`crates/dbsp/src/typed_batch.rs:52`
  * `BatchReader`/`ZSet`; SURVEY §1.1). A change relation is a DataFrame
  * carrying a `_w: Long` column: +n = n insertions, −n = n retractions —
  * also Feldera's wire format (`insert_delete`/`weighted` JSON,
  * crates/feldera-types/src/format/json.rs:148).
  *
  * Scale: `consolidate` is one hash-aggregate shuffle on the row key; all
  * linear operators (map/filter/flatMap/union/negate) touch only the
  * weight column and stay scan-side.
  */
object ZSets {
  /** The weight column name. */
  val W = "_w"

  def weight: Column = col(W)

  /** Lift a plain relation to a Z-set (each row weight +1). */
  def lift(df: DataFrame): DataFrame = df.withColumn(W, lit(1L))

  /** Data columns (everything but the weight). */
  def dataCols(df: DataFrame): Seq[String] =
    df.columns.toSeq.filterNot(_ == W)

  /** Z-set negation (reference: DBSPNegateOperator.java:39). */
  def negate(df: DataFrame): DataFrame = df.withColumn(W, -col(W))

  /** Merge equal rows, summing weights; drop zero-weight rows
    * (the canonical form every DBSP batch maintains).
    */
  def consolidate(df: DataFrame): DataFrame = {
    val keys = dataCols(df)
    df.groupBy(keys.map(col): _*)
      .agg(sum(col(W)).as(W))
      .filter(col(W) =!= 0)
  }

  /** Keep positive-weight rows (reference: DBSPPositiveOperator). */
  def positive(df: DataFrame): DataFrame = df.filter(col(W) > 0)

  /** Set-semantics DISTINCT: weight 1 where consolidated weight > 0
    * (reference: DBSPDistinctOperator.java:39, distinct.rs:20).
    */
  def distinctZ(df: DataFrame): DataFrame =
    positive(consolidate(df)).withColumn(W, lit(1L))

  /** Z-set sum = UNION ALL (reference: DBSPSumOperator.java:41). */
  def sumZ(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_ unionByName _)

  /** EXCEPT ALL in Z-set form: A + (−B), consolidated, positive part. */
  def exceptAllZ(a: DataFrame, b: DataFrame): DataFrame =
    positive(consolidate(sumZ(Seq(a, negate(b)))))

  /** Expand weights back to row multiplicity (for comparing against plain
    * relations in tests; weights must be positive and small).
    *
    * Non-positive weights are dropped FIRST: Spark's sequence(1, w) would
    * otherwise auto-reverse for w <= 0 (sequence(1,0) = [1,0]) and
    * fabricate phantom rows from over-retracted input. Over-retraction is
    * a caller bug; detect it with `assertNonNegative` where it matters.
    */
  def toMultiset(df: DataFrame): DataFrame = {
    val keys = dataCols(df)
    df.filter(col(W) > 0)
      .withColumn("__i", explode(sequence(lit(1), col(W).cast("int"))))
      .select(keys.map(col): _*)
  }

  /** Fail fast if any consolidated weight is negative (over-retraction). */
  def assertNonNegative(df: DataFrame): DataFrame = {
    val bad = df.filter(col(W) < 0).limit(1).count()
    require(bad == 0, s"Z-set contains negative weights (over-retraction)")
    df
  }
}
