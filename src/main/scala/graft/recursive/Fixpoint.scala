package graft.recursive

import org.apache.spark.sql.DataFrame

/** Semi-naive fixpoint driver for recursive views (reference:
  * DECLARE RECURSIVE VIEW — DBSPNestedOperator.java:30,
  * RecursiveComponents.java, runtime crates/dbsp/src/operator/recursive.rs:262;
  * docs recursion.mdx:14-60).
  *
  * Spark has no recursion primitive, so the driver iterates: each round
  * applies `step` to the latest delta only (semi-naive), unions new rows,
  * and stops when the delta is empty. `localCheckpoint` truncates the
  * lineage each round — without it the plan doubles per iteration and
  * planning cost explodes; with it each round is a bounded join against
  * the accumulated set. At scale the accumulator would be bucketed by the
  * join key so each round's `except` and `step` are co-partitioned.
  */
object Fixpoint {

  /** Least fixpoint of `base ∪ step(·)` under set semantics.
    *
    * @param step monotone rule body: given the NEW rows of the last round,
    *             produce candidate rows (may contain duplicates/known rows)
    */
  /** Cut lineage by materializing to a cached RDD (localCheckpoint trips a
    * Spark 4 attribute-mapping bug on EXCEPT plans; this is equivalent:
    * the plan behind `df` is evaluated once and iterations restart from a
    * LogicalRDD).
    */
  private def materialize(df: DataFrame): DataFrame = {
    val rdd = df.rdd
    rdd.cache()
    df.sparkSession.createDataFrame(rdd, df.schema)
  }

  def semiNaive(base: DataFrame, step: DataFrame => DataFrame,
      maxIterations: Int = 1000): DataFrame = {
    var total = materialize(base.distinct())
    var delta = total
    var i = 0
    while (i < maxIterations && !delta.isEmpty) {
      delta = materialize(step(delta).except(total))
      if (!delta.isEmpty) total = materialize(total.unionByName(delta))
      i += 1
    }
    require(i < maxIterations, s"fixpoint did not converge in $maxIterations")
    total
  }
}
