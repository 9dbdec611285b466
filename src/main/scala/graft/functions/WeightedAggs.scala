package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted (Z-set-aware) Aggregators — SURVEY §2.4: "a custom
  * Aggregator is needed for weighted variants of all aggregates (every agg
  * must multiply by the row's weight)". Reference: the Weigh operator +
  * linear aggregate machinery (DBSPWeighOperator.java:20,
  * crates/dbsp/src/operator/aggregate.rs:209 aggregate_linear).
  *
  * `linear` wraps ANY per-row numeric function into a retraction-correct
  * aggregate: agg(f) over a Z-set = Σ f(row)·w — the user-facing
  * `CREATE LINEAR AGGREGATE` surface (grammar.md:286-293).
  */
object WeightedAggs {

  /** Buffer: (weighted sum, weight count). */
  final case class LinBuf(sum: Double, cnt: Long)

  /** Generic linear aggregate of f(row) with weight extraction w(row). */
  def linear[IN](f: IN => Double, w: IN => Long): Aggregator[IN, LinBuf, Double] =
    new Aggregator[IN, LinBuf, Double] {
      def zero: LinBuf = LinBuf(0d, 0L)
      def reduce(b: LinBuf, a: IN): LinBuf =
        LinBuf(b.sum + f(a) * w(a), b.cnt + w(a))
      def merge(x: LinBuf, y: LinBuf): LinBuf =
        LinBuf(x.sum + y.sum, x.cnt + y.cnt)
      def finish(b: LinBuf): Double = b.sum
      def bufferEncoder: Encoder[LinBuf] = Encoders.product[LinBuf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Weighted average: Σ v·w / Σ w (NULL-free inputs; NaN when empty). */
  def weightedAvg[IN](f: IN => Double, w: IN => Long): Aggregator[IN, LinBuf, Double] =
    new Aggregator[IN, LinBuf, Double] {
      def zero: LinBuf = LinBuf(0d, 0L)
      def reduce(b: LinBuf, a: IN): LinBuf =
        LinBuf(b.sum + f(a) * w(a), b.cnt + w(a))
      def merge(x: LinBuf, y: LinBuf): LinBuf =
        LinBuf(x.sum + y.sum, x.cnt + y.cnt)
      def finish(b: LinBuf): Double =
        if (b.cnt == 0) Double.NaN else b.sum / b.cnt
      def bufferEncoder: Encoder[LinBuf] = Encoders.product[LinBuf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** SINGLE_VALUE guard buffer. */
  final case class SVBuf(n: Long, value: Long)

  /** SINGLE_VALUE: errors if the group holds more than one row — the
    * scalar-subquery guard (AggregateCompiler.java:615).
    */
  def singleValueLong: Aggregator[Long, SVBuf, Long] =
    new Aggregator[Long, SVBuf, Long] {
      def zero: SVBuf = SVBuf(0L, 0L)
      def reduce(b: SVBuf, a: Long): SVBuf = {
        if (b.n >= 1) throw new IllegalStateException(
          "SINGLE_VALUE: more than one row in group")
        SVBuf(b.n + 1, a)
      }
      def merge(x: SVBuf, y: SVBuf): SVBuf = {
        if (x.n + y.n > 1) throw new IllegalStateException(
          "SINGLE_VALUE: more than one row in group")
        if (x.n == 1) x else y
      }
      def finish(b: SVBuf): Long =
        if (b.n == 1) b.value
        else throw new IllegalStateException("SINGLE_VALUE: empty group")
      def bufferEncoder: Encoder[SVBuf] = Encoders.product[SVBuf]
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}
