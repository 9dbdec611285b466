package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** The codegen'd quantize kernel (QuantizeRoundLong) must be BIT-IDENTICAL
  * to the HOF form it replaced — `transform(a, x => round(x.cast("double")
  * * scale).cast("long"))` — including Spark's Round-on-DOUBLE HALF_UP
  * semantics at decimal half boundaries (the kernel skips BigDecimal via
  * the shortest-decimal argument documented on it, so the halves are the
  * adversarial cases) and `transform`'s null-element propagation.
  */
class QuantizeKernelSpec extends SparkSpec {

  // adversarial doubles: exact halves (positive/negative), the largest
  // double BELOW one half (0.49999999999999994), values whose shortest
  // decimal repr sits near a half (2.675 is binary 2.674999...), huge
  // magnitudes past 2^52 (already integral), tiny/denormal, and plain
  // values. Scales 1 and 10000 exercise the multiply.
  private val doubles: Seq[Double] = Seq(
    0.0, -0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 3.5, -3.5,
    0.49999999999999994, -0.49999999999999994,
    0.50000000000000011, -0.50000000000000011,
    2.675, -2.675, 1.005, -1.005,
    0.12345678901234567, -0.98765432109876543,
    1e-300, -1e-300, java.lang.Double.MIN_VALUE,
    4503599627370495.5, -4503599627370495.5, // 2^52 - 0.5
    9.007199254740992e15, -9.007199254740992e15, // 2^53
    1.23e10, -9.87e9, 42.42, -17.17)

  test("kernel matches HOF on adversarial doubles (codegen + interpreted)") {
    // ANSI is on (Spark 4 default): rows whose rounded product leaves
    // [-2^63, 2^63] must THROW CAST_OVERFLOW from BOTH forms — compare
    // per-row so value rows and throw rows are each checked.
    def outcome(df: org.apache.spark.sql.DataFrame): Either[String, Seq[Long]] =
      try Right(df.collect().head.getSeq[Long](0))
      catch { case e: Throwable =>
        // the task wrapper varies; the root SparkArithmeticException's
        // condition (e.g. CAST_OVERFLOW) is the comparable outcome
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).collectFirst {
          case a: ArithmeticException with org.apache.spark.SparkThrowable =>
            Left(a.getCondition)
        }.getOrElse(throw e)
      }
    for (scale <- Seq(1, 7, 10000)) {
      for (ws <- Seq("true", "false")) {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        try doubles.foreach { d =>
          val df = spark.createDataFrame(Seq(Tuple1(Array(d)))).toDF("v")
          val native = outcome(df.select(
            Similarity.quantize(col("v"), scale).as("o")))
          val hof = outcome(df.select(
            Similarity.quantizeHof(col("v"), scale).as("o")))
          assert(native == hof,
            s"quantize($d, scale=$scale, ws=$ws) split: $native vs $hof")
        } finally spark.conf.unset("spark.sql.codegen.wholeStage")
      }
    }
  }

  test("kernel matches HOF on float vectors (the embedding column type)") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 200).map { _ =>
      Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
    } ++ Seq(Array.empty[Float],
      Array(0.5f, -0.5f, 2.675f, 0.49999997f, -0.49999997f))
    val df = spark.createDataFrame(vecs.map(Tuple1(_))).toDF("v")
    val got = df.select(
      Similarity.quantize(col("v"), 10000).as("native"),
      Similarity.quantizeHof(col("v"), 10000).as("hof")).collect()
    got.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"float split on $r")
    }
  }

  test("null array and null elements propagate like transform") {
    val got = spark.sql(
      "SELECT CAST(NULL AS ARRAY<DOUBLE>) AS a, " +
        "array(CAST(1.5 AS DOUBLE), NULL, CAST(-2.5 AS DOUBLE)) AS b")
      .select(
        Similarity.quantize(col("a"), 3).as("na"),
        Similarity.quantizeHof(col("a"), 3).as("ha"),
        Similarity.quantize(col("b"), 3).as("nb"),
        Similarity.quantizeHof(col("b"), 3).as("hb")).collect().head
    assert(got.isNullAt(0) && got.isNullAt(1))
    assert(got.getSeq[java.lang.Long](2) == got.getSeq[java.lang.Long](3))
    assert(got.getSeq[java.lang.Long](2)(1) == null)
  }
}
