package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{AsofJoin, Sessionize}
import graft.recursive.Fixpoint

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("AsofJoin.backward picks latest at-or-before, ties match") {
    val probe = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:05:00")),
      (3L, "u1", ts("2024-01-01 09:00:00")), // before any build row
      (4L, "u2", ts("2024-01-01 12:00:00"))  // tie with build ts
    ).toDF("id", "user", "t")
    val build = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 100.0),
      ("u1", ts("2024-01-01 10:00:00"), 200.0), // tie with probe 1
      ("u2", ts("2024-01-01 12:00:00"), 300.0)
    ).toDF("user", "t", "v")
    val out = AsofJoin.backward(probe, build, Seq("user"), "t", "t", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(1L -> Some(200.0), 2L -> Some(200.0),
      3L -> None, 4L -> Some(300.0)))
  }

  test("AsofJoin.backward preserves legitimately-null payload fields") {
    val probe = Seq((1L, "k", 10L)).toDF("id", "key", "t")
    val build = Seq(("k", 5L, Option.empty[String]),
      ("k", 1L, Some("old"))).toDF("key", "t", "p")
    val out = AsofJoin.backward(probe, build, Seq("key"), "t", "t", Seq("p"))
      .select("id", "p").as[(Long, Option[String])].collect()
    // latest build row (t=5) has a NULL payload — must NOT fall back to t=1
    assert(out === Array((1L, None)))
  }

  test("Sessionize splits on gap and is tie-stable") {
    val df = Seq(
      ("u", 100L, 1L), ("u", 200L, 2L), ("u", 200L, 3L), // same second
      ("u", 5000L, 4L), ("u", 5100L, 5L)
    ).toDF("user", "es", "id")
    val out = Sessionize.assign(df, "user", "es", 1800, "id")
      .select("id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("Fixpoint.semiNaive computes transitive closure") {
    val edges = Seq((1, 2), (2, 3), (3, 4), (10, 11)).toDF("src", "dst")
    val closure = Fixpoint.semiNaive(edges, d =>
      d.select(col("src").as("s"), col("dst").as("mid"))
        .join(edges, col("mid") === col("src"))
        .select(col("s").as("src"), col("dst")))
    val got = closure.as[(Int, Int)].collect().toSet
    assert(got === Set((1, 2), (2, 3), (3, 4), (10, 11),
      (1, 3), (2, 4), (1, 4)))
  }

  test("Fixpoint.semiNaive converges when fixpoint lands on the last round") {
    // chain 1→2→3: closure needs exactly 2 productive rounds + 1 empty;
    // maxIterations=3 exercises the boundary (empty delta on the final
    // allowed round must count as convergence, not failure)
    val edges = Seq((1, 2), (2, 3)).toDF("src", "dst")
    val closure = Fixpoint.semiNaive(edges, d =>
      d.select(col("src").as("s"), col("dst").as("mid"))
        .join(edges, col("mid") === col("src"))
        .select(col("s").as("src"), col("dst")),
      maxIterations = 3)
    assert(closure.count() === 3)
  }

  test("Fixpoint.mutual solves two mutually recursive views jointly") {
    // even/odd distance from 0 over edges {0→1,1→2,2→3,3→1}
    val edges = Seq((0, 1), (1, 2), (2, 3), (3, 1)).toDF("src", "dst")
    def hop(from: org.apache.spark.sql.DataFrame) =
      from.join(edges, from("n") === edges("src"))
        .select(edges("dst").as("n"))
    val seed = Seq(0).toDF("n")
    val fp = Fixpoint.mutual(
      Map("even" -> seed, "odd" -> seed.limit(0)),
      Map("even" -> (st => hop(st.deltas("odd"))),
        "odd" -> (st => hop(st.deltas("even")))))
    // cycle 1→2→3→1 has odd length, so 1,2,3 reach both parities
    assert(fp("even").as[Int].collect().toSet === Set(0, 1, 2, 3))
    assert(fp("odd").as[Int].collect().toSet === Set(1, 2, 3))
  }

  test("Fixpoint.continueFrom: driver tier, bail path, and distributed agree") {
    // converged forward closure over chain 1→2→3, then continue from seed
    // edge (3,4): forward extension walks 4→5→6, one row per round
    val edges = Seq((1, 2), (2, 3), (3, 4), (4, 5), (5, 6)).toDF("src", "dst")
    val init = Seq((1, 2), (2, 3), (1, 3)).toDF("src", "dst")
    val seeds = Seq((3, 4)).toDF("src", "dst")
    def run(cap: Int) = {
      val cont = Fixpoint.continueFrom(
        Map("v" -> init), Map("v" -> seeds),
        Map("v" -> ((st: Fixpoint.RoundState) =>
          st.deltas("v").select(col("src").as("s"), col("dst").as("mid"))
            .join(edges, col("mid") === col("src"))
            .select(col("s").as("src"), col("dst")))),
        driverTierMaxRows = cap)
      val out = (cont.totals("v").as[(Int, Int)].collect().toSet,
        cont.newRows("v").as[(Int, Int)].collect().toSet)
      cont.release()
      out
    }
    val expNew = Set((3, 4), (3, 5), (3, 6))
    val expTotals = Set((1, 2), (2, 3), (1, 3)) ++ expNew
    for (cap <- Seq(100000, 0, 4)) { // driver tier / distributed / mid-loop bail
      val (totals, fresh) = run(cap)
      assert(totals === expTotals, s"totals diverged at cap=$cap")
      assert(fresh === expNew, s"newRows diverged at cap=$cap")
    }
  }
}
