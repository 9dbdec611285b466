package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based session assignment (reference: SESSION table function,
  * SessionRewriteRule.java via CalciteOptimizer.java:232; doc
  * docs.feldera.com/docs/sql/table.md:122+).
  *
  * Batch implementation: the classic two-window sessionization — a session
  * boundary opens where the gap from the previous event exceeds
  * `gapSeconds`, and the session id is the running count of boundaries.
  * One shuffle on the key + one sort. The ordering must be TOTAL
  * (`tiebreaker` breaks time ties) or lag/running-sum results are
  * order-dependent. The streaming equivalent is `session_window()` in
  * graft.streaming.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key) to each row.
    *
    * @param epochCol   numeric event time (e.g. epoch seconds), the gap unit
    * @param tiebreaker unique-per-key column making the sort total
    */
  def assign(df: DataFrame, key: String, epochCol: String,
      gapSeconds: Long, tiebreaker: String): DataFrame = {
    val byTime = Window.partitionBy(key).orderBy(epochCol, tiebreaker)
    val prev = lag(col(epochCol), 1).over(byTime)
    val newSession =
      when(prev.isNull || col(epochCol) - prev > gapSeconds, 1).otherwise(0)
    df.withColumn("__new", newSession)
      .withColumn("session_seq",
        sum(col("__new")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }
}
