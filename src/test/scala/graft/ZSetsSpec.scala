package graft

import org.apache.spark.sql.functions._
import graft.zset.ZSets

class ZSetsSpec extends SparkSpec {
  import spark.implicits._

  private def z(rows: (String, Long)*) =
    rows.toDF("k", ZSets.W)

  test("consolidate merges and drops zeros") {
    val out = ZSets.consolidate(z("a" -> 2L, "a" -> -1L, "b" -> 1L,
      "b" -> -1L, "c" -> 3L)).as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 1L, "c" -> 3L))
  }

  test("distinctZ gives set semantics for positive weights") {
    val out = ZSets.distinctZ(z("a" -> 5L, "b" -> 1L, "c" -> -2L))
      .as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 1L, "b" -> 1L))
  }

  test("negate is an involution under consolidation") {
    val in = z("a" -> 2L, "b" -> -3L)
    val out = ZSets.consolidate(ZSets.negate(ZSets.negate(in)))
      .as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 2L, "b" -> -3L))
  }

  test("exceptAllZ matches Spark exceptAll on plain multisets") {
    val a = Seq("x", "x", "x", "y", "z").toDF("k")
    val b = Seq("x", "y", "y").toDF("k")
    val expected = a.exceptAll(b).as[String].collect().sorted
    val got = ZSets.toMultiset(
      ZSets.exceptAllZ(ZSets.lift(a), ZSets.lift(b)))
      .as[String].collect().sorted
    assert(got === expected)
  }

  test("toMultiset expands weights") {
    val out = ZSets.toMultiset(z("a" -> 3L, "b" -> 1L))
      .as[String].collect().sorted
    assert(out === Array("a", "a", "a", "b"))
  }
}
