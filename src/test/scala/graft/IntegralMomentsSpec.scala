package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.IntegerDivision
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Regression coverage for the integral-moments rewrite
  * (IntegerDivision.castIntegralMoments): the decomposition retypes
  * the aggregate's output slot (Calcite types AVG/VAR over INT as
  * INT), so the new type must PROPAGATE to every parent reference —
  * nested projections, ORDER BY, derived arithmetic. The in-place
  * rewrite this replaces kept the old exprId/type and corrupted any
  * non-top-level consumer (Double reference reading an Int slot).
  */
class IntegralMomentsSpec extends SparkSpec {

  private def run(q: String): DataFrame =
    IntegerDivision(spark.sql(graft.ddl.Dialect.normalize(q)))

  test("top-level integral AVG keeps Calcite typing") {
    val df = run("SELECT AVG(x) AS a FROM (VALUES (1),(2),(4)) t(x)")
    assert(df.schema("a").dataType == IntegerType)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("nested AVG referenced through a subquery + ORDER BY") {
    val df = run(
      """SELECT s.a FROM
        |  (SELECT AVG(x) AS a FROM (VALUES (1),(2),(4)) t(x)) s
        |ORDER BY s.a""".stripMargin)
    assert(df.schema("a").dataType == IntegerType)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("nested AVG consumed by derived arithmetic") {
    val df = run(
      """SELECT s.a + 0.5 AS v FROM
        |  (SELECT AVG(x) AS a FROM (VALUES (1),(2),(4)) t(x)) s""".stripMargin)
    val v = df.collect().head.getAs[Any]("v")
    assert(BigDecimal(v.toString) == BigDecimal("2.5"))
  }

  test("nested STDDEV_POP over INT is integral and propagates") {
    val df = run(
      """SELECT s.d, s.d * 2 AS d2 FROM
        |  (SELECT STDDEV_POP(x) AS d
        |   FROM (VALUES (10),(20),(50)) t(x)) s""".stripMargin)
    val r = df.collect().head
    assert(df.schema("d").dataType == IntegerType)
    // d2 was coerced to DOUBLE by the analyzer before the rewrite;
    // the propagated int attr feeds it through the coercion cast
    assert(r.getInt(0) == 17 && r.getDouble(1) == 34.0)
  }

  test("nested decimal STDDEV stays DOUBLE-typed (scale-truncated)") {
    val df = run(
      """SELECT s.d FROM
        |  (SELECT STDDEV(CAST(x AS DECIMAL(10,2))) AS d
        |   FROM (VALUES (300),(500),(1400)) t(x)) s
        |ORDER BY s.d""".stripMargin)
    assert(df.schema("d").dataType == DoubleType)
    assert(df.collect().head.getDouble(0) == 585.94)
  }

  test("window-form integral AVG referenced above the window project") {
    val df = run(
      """SELECT s.a, s.a - 1 AS am1 FROM
        |  (SELECT AVG(x) OVER (PARTITION BY g) AS a
        |   FROM (VALUES (1, 1),(2, 1),(4, 1)) t(x, g)) s
        |ORDER BY s.a""".stripMargin)
    val rows = df.collect()
    assert(df.schema("a").dataType == IntegerType)
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 2, 2))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.0, 1.0, 1.0))
  }
}
