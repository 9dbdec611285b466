package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ASOF join (reference: DBSPAsofJoinOperator.java:25, lowered by
  * LowerAsof.java; runtime crates/dbsp/src/operator/asof_join.rs:37).
  *
  * Spark-first design: rather than a per-key nested-loop, we union the probe
  * and build sides and run ONE window pass partitioned by key and ordered by
  * (ts, side): each probe row picks up the last preceding build payload via
  * `last(..., ignoreNulls)`. Cost = one shuffle + one sort — the same as a
  * sort-merge join, with no build-side explosion; at 100 TB this is a single
  * exchange on the join key, and skewed keys are handled by AQE.
  *
  * Build rows must be unique per (key, ts) — pre-aggregate otherwise —
  * so the match is well-defined (mirrors the reference's requirement that
  * the TS is a key of the build side).
  */
object AsofJoin {

  /** Backward LEFT as-of: for each left row, the latest right row with
    * `right.tsCol <= left.tsCol` on equal keys; nulls when no match.
    * A tie (equal ts) matches, as in `MATCH_CONDITION l.ts >= r.ts`.
    *
    * @param payload right-side columns to attach (must not clash with left)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The whole payload travels as one struct: its null-ness marks "no
    // match yet", so legitimately-null payload FIELDS are preserved.
    val payloadType = StructType(payload.map(p => right.schema(p)))
    val probe = left
      .select((keys.map(col)
        ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"))
        ++ leftCols.filterNot(keys.contains).map(col)
        ++ Seq(lit(null).cast(payloadType).as("__p"))): _*)
    val build = right
      .select((keys.map(col)
        ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"))
        ++ leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))
        ++ Seq(struct(payload.map(col): _*).as("__p"))): _*)
    // Build sorts before probe at equal ts (side 0 < 1) → ties match.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probe.unionByName(build)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"__p.$p").as(p)): _*)
  }
}
