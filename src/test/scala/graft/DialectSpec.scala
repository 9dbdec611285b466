package graft

import graft.ddl.{Ddl, Dialect}
import graft.runtime.Pipeline
import graft.zset.ZSets

/** Reference-dialect spellings mapped onto Spark's surface
  * (grammar.md:403-444 `SELECT * EXCLUDE`, :482-497 UNPIVOT).
  */
class DialectSpec extends SparkSpec {
  import spark.implicits._

  test("normalize maps EXCLUDE/INCLUDING-NULLS spellings, not lookalikes") {
    assert(Dialect.normalize("SELECT * EXCLUDE (a, b) FROM t")
      === "SELECT * EXCEPT (a, b) FROM t")
    assert(Dialect.normalize("SELECT t.* EXCLUDE(a) FROM t")
      === "SELECT t.* EXCEPT(a) FROM t")
    assert(Dialect.normalize(
      "FROM t UNPIVOT INCLUDING NULLS (v FOR m IN (a, b))")
      === "FROM t UNPIVOT INCLUDE NULLS (v FOR m IN (a, b))")
    assert(Dialect.normalize(
      "FROM t UNPIVOT EXCLUDING NULLS (v FOR m IN (a))")
      === "FROM t UNPIVOT EXCLUDE NULLS (v FOR m IN (a))")
    // a function/column named exclude, and string literals, are untouched
    assert(Dialect.normalize("SELECT exclude(x) FROM t")
      === "SELECT exclude(x) FROM t")
    assert(Dialect.normalize("SELECT '* EXCLUDE (a)' FROM t")
      === "SELECT '* EXCLUDE (a)' FROM t")
  }

  test("SELECT * EXCLUDE view prunes columns through the pipeline") {
    val pipe = Pipeline(spark,
      """CREATE TABLE t (a BIGINT, b VARCHAR, c DOUBLE);
        |CREATE VIEW v AS SELECT * EXCLUDE (c) FROM t;""".stripMargin)
    pipe.step(Map("t" -> ZSets.lift(
      Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("a", "b", "c"))))
    val out = pipe.adHoc("SELECT * FROM v ORDER BY a")
    assert(out.columns.toSeq === Seq("a", "b"))
    assert(out.as[(Long, String)].collect().toSeq
      === Seq((1L, "x"), (2L, "y")))
  }

  test("UNPIVOT INCLUDING NULLS view keeps null-measure rows") {
    val pipe = Pipeline(spark,
      """CREATE TABLE t (id BIGINT, k1 BIGINT, k2 BIGINT);
        |CREATE VIEW u AS
        |  SELECT metric, COUNT(*) AS n, COUNT(val) AS nv FROM t
        |  UNPIVOT INCLUDING NULLS (val FOR metric IN (k1, k2))
        |  GROUP BY metric;
        |CREATE VIEW x AS
        |  SELECT metric, COUNT(*) AS n FROM t
        |  UNPIVOT EXCLUDING NULLS (val FOR metric IN (k1, k2))
        |  GROUP BY metric;""".stripMargin)
    pipe.step(Map("t" -> ZSets.lift(
      Seq((1L, Some(10L), None: Option[Long]),
        (2L, Some(20L), Some(30L))).toDF("id", "k1", "k2"))))
    val incl = pipe.adHoc("SELECT * FROM u ORDER BY metric")
      .as[(String, Long, Long)].collect().toSeq
    assert(incl === Seq(("k1", 2L, 2L), ("k2", 2L, 1L)))
    val excl = pipe.adHoc("SELECT * FROM x ORDER BY metric")
      .as[(String, Long)].collect().toSeq
    assert(excl === Seq(("k1", 2L), ("k2", 1L)))
  }

  test("SELECT * REPLACE swaps the expression in place, order preserved") {
    val pipe = Pipeline(spark,
      """CREATE TABLE t (a BIGINT, b VARCHAR, c BIGINT);
        |CREATE VIEW v AS SELECT * REPLACE (a + c AS a, upper(b) AS b)
        |  FROM t WHERE c > 0;""".stripMargin)
    pipe.step(Map("t" -> ZSets.lift(
      Seq((1L, "x", 10L), (2L, "y", -1L)).toDF("a", "b", "c"))))
    val out = pipe.adHoc("SELECT * FROM v")
    // replaced columns keep their ORIGINAL positions (a, b, c)
    assert(out.columns.toSeq === Seq("a", "b", "c"))
    assert(out.as[(Long, String, Long)].collect().toSeq
      === Seq((11L, "X", 10L)))
    // ad-hoc REPLACE against live state works too
    val ad = pipe.adHoc("SELECT * REPLACE (c * 2 AS c) FROM t WHERE a = 1")
    assert(ad.columns.toSeq === Seq("a", "b", "c"))
    assert(ad.as[(Long, String, Long)].head() === ((1L, "x", 20L)))
    // a REPLACE naming a column the star does not produce fails loudly
    val e = intercept[IllegalArgumentException](
      pipe.adHoc("SELECT * REPLACE (1 AS nope) FROM t"))
    assert(e.getMessage.contains("nope"))
  }

  test("ROW constructor maps to struct, including ROW(T.*)") {
    val pipe = Pipeline(spark,
      """CREATE TABLE t (a BIGINT, b VARCHAR);
        |CREATE VIEW v AS
        |  SELECT r.a AS ra, r.b AS rb FROM
        |    (SELECT ROW(t.*) AS r FROM t) x;
        |CREATE VIEW w AS
        |  SELECT ROW(a, b).a AS ra FROM t;""".stripMargin)
    pipe.step(Map("t" -> ZSets.lift(Seq((7L, "z")).toDF("a", "b"))))
    assert(pipe.adHoc("SELECT * FROM v").as[(Long, String)].head()
      === ((7L, "z")))
    assert(pipe.adHoc("SELECT * FROM w").as[Long].head() === 7L)
    // ROWS frames / ROW_NUMBER spellings survive untouched
    assert(Dialect.normalize(
      "SUM(x) OVER (ORDER BY y ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)")
      === "SUM(x) OVER (ORDER BY y ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)")
    assert(Dialect.normalize("ROW_NUMBER() OVER (ORDER BY y)")
      === "ROW_NUMBER() OVER (ORDER BY y)")
    assert(Dialect.normalize("SELECT ROW(a, b) FROM t")
      === "SELECT struct(a, b) FROM t")
  }

  test("CAST alias rewrite is anchored to CAST, not any 'AS name)'") {
    val prog = Ddl.parse(
      """CREATE TYPE money AS DECIMAL(18, 4);
        |CREATE TABLE t (a BIGINT);
        |CREATE FUNCTION f(x BIGINT) RETURNS DOUBLE AS
        |  CAST(CAST(x AS money) AS DOUBLE) +
        |  (SELECT CAST(0 AS DOUBLE) AS money);
        |CREATE VIEW v AS SELECT f(a) AS r FROM t;""".stripMargin)
    val pipe = new Pipeline(spark, prog)
    pipe.step(Map("t" -> ZSets.lift(Seq(7L).toDF("a"))))
    // the scalar-subquery projection alias `AS money)` must survive; only
    // the CAST-closing occurrence is rewritten to DECIMAL(18,4)
    assert(pipe.adHoc("SELECT r FROM v").as[Double].head() === 7.0)
  }
}
