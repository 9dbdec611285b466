package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Controlled filter with error routing (reference:
  * crates/dbsp/src/operator/controlled_filter.rs,
  * DBSPControlledKeyFilterOperator.java): rows failing a validity predicate
  * are routed to a side error relation with a reason, instead of being
  * silently dropped — Feldera's runtime-error-view pattern.
  * Both outputs are filters over the same scan: Spark evaluates the scan
  * once per consumer, each with the predicate pushed down.
  */
object ControlledFilter {

  /** (valid rows, error rows + `error_reason`). Null predicate counts as
    * invalid (routed), matching SQL WHERE semantics on the valid side.
    */
  def route(df: DataFrame, valid: Column, reason: String)
      : (DataFrame, DataFrame) =
    (df.filter(valid),
      df.filter(!coalesce(valid, lit(false)))
        .withColumn("error_reason", lit(reason)))
}
