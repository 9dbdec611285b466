package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One graded query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the oracle.
  * Column names and value determinism must match exactly between the two
  * (the driver sorts columns by name and hashes values).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** Query with no SQL-expressible oracle (driver records rows-only check). */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}

/** Query-building helpers shared by the registry modules.
  *
  * Determinism discipline (critical for the DuckDB hash-match):
  *   - Floating-point SUM/AVG is order-dependent; we cast to DECIMAL first
  *     so the aggregation is exact integer arithmetic in both engines, and
  *     cast the final result back to DOUBLE so output schemas agree.
  *   - Window functions always order by a unique tiebreaker.
  *   - collect_list results are sorted.
  *   - Raw TIMESTAMP columns are never emitted (tz-naive vs instant
  *     mismatch between engines); we emit epoch seconds or DATE instead.
  */
object QB {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(spark, dir, name)

  /** [[t]] without the scan fan-out exchange — for consumers that slice
    * a table into small deltas (the incremental/pipeline demos), where
    * each slice is a pruned, filter-pushed parquet scan that no exchange
    * would amortize.
    */
  def tRaw(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.loadRaw(spark, dir, name)

  /** Exact fixed-point view of a double column: deterministic across engines. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact sum of a double column, emitted as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Deterministic average: exact decimal sum divided by count, in double. */
  def davg(c: Column): Column =
    sum(dec(c)).cast("double") / count(c)

  /** SQL fragment mirroring [[dec]]. */
  def sqlDec(expr: String): String = s"CAST($expr AS DECIMAL(18,4))"

  /** SQL fragment mirroring [[dsum]]. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(${sqlDec(expr)}) AS DOUBLE)"

  /** SQL fragment mirroring [[davg]]. */
  def sqlDavg(expr: String): String =
    s"CAST(SUM(${sqlDec(expr)}) AS DOUBLE) / COUNT($expr)"
}
