package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.runtime.Pipeline
import graft.zset.ZSets

/** Incremental recursion: DECLARE RECURSIVE VIEW groups whose bodies are
  * sum-of-products (Linear/Multilinear UNION branches) continue the
  * previous fixpoint semi-naively under insert-only deltas instead of
  * recomputing it; retraction steps fall back to recompute-diff and both
  * paths interleave exactly.
  */
class PipelineRecIncSpec extends SparkSpec {
  import spark.implicits._

  private val closureSql =
    """CREATE TABLE edges (src INT, dst INT);
      |DECLARE RECURSIVE VIEW closure (src INT, dst INT);
      |CREATE VIEW closure AS
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src;"""
      .stripMargin

  test("insert-only steps continue the fixpoint incrementally") {
    val pipe = Pipeline(spark, closureSql)
    val d1 = pipe.step(Map("edges" ->
      ZSets.lift(Seq((0, 1), (1, 2)).toDF("src", "dst"))))
    assert(pipe.lastRecursiveMode === "incremental")
    assert(d1("closure").as[(Int, Int, Long)].collect().toSet
      === Set((0, 1, 1L), (1, 2, 1L), (0, 2, 1L)))
    // extending the chain yields exactly the paths through the new edge
    val d2 = pipe.step(Map("edges" ->
      ZSets.lift(Seq((2, 3)).toDF("src", "dst"))))
    assert(pipe.lastRecursiveMode === "incremental")
    assert(d2("closure").as[(Int, Int, Long)].collect().toSet
      === Set((2, 3, 1L), (1, 3, 1L), (0, 3, 1L)))
    assert(pipe.adHoc("SELECT * FROM closure").count() === 6)
  }

  test("a retraction step falls back to recompute-diff and stays exact") {
    val pipe = Pipeline(spark, closureSql)
    pipe.step(Map("edges" ->
      ZSets.lift(Seq((0, 1), (1, 2), (2, 3)).toDF("src", "dst"))))
    assert(pipe.lastRecursiveMode === "incremental")
    // sever 1→2: every path through it must retract
    val d2 = pipe.step(Map("edges" ->
      Seq((1, 2, -1L)).toDF("src", "dst", ZSets.W)))
    assert(pipe.lastRecursiveMode === "recompute")
    assert(d2("closure").as[(Int, Int, Long)].collect().toSet
      === Set((1, 2, -1L), (0, 2, -1L), (1, 3, -1L), (0, 3, -1L)))
    // re-adding goes incremental again from the corrected state
    val d3 = pipe.step(Map("edges" ->
      ZSets.lift(Seq((1, 2)).toDF("src", "dst"))))
    assert(pipe.lastRecursiveMode === "incremental")
    assert(d3("closure").as[(Int, Int, Long)].collect().toSet
      === Set((1, 2, 1L), (0, 2, 1L), (1, 3, 1L), (0, 3, 1L)))
  }

  test("mutually recursive group continues incrementally") {
    val sql =
      """CREATE TABLE e (src INT, dst INT);
        |DECLARE RECURSIVE VIEW odd_r (src INT, dst INT);
        |DECLARE RECURSIVE VIEW even_r (src INT, dst INT);
        |CREATE VIEW odd_r AS
        |  SELECT src, dst FROM e
        |  UNION
        |  SELECT v.src, e.dst FROM even_r v JOIN e ON v.dst = e.src;
        |CREATE VIEW even_r AS
        |  SELECT v.src, e.dst FROM odd_r v JOIN e ON v.dst = e.src;"""
        .stripMargin
    val pipe = Pipeline(spark, sql)
    pipe.step(Map("e" ->
      ZSets.lift(Seq((0, 1), (1, 2), (2, 3)).toDF("src", "dst"))))
    assert(pipe.lastRecursiveMode === "incremental")
    pipe.step(Map("e" -> ZSets.lift(Seq((3, 4)).toDF("src", "dst"))))
    assert(pipe.lastRecursiveMode === "incremental")
    val batch = Pipeline(spark, sql).runBatch(Map(
      "e" -> Seq((0, 1), (1, 2), (2, 3), (3, 4)).toDF("src", "dst")))
    for (v <- Seq("odd_r", "even_r")) {
      val inc = pipe.adHoc(s"SELECT * FROM $v")
      assert(inc.exceptAll(batch(v)).isEmpty
        && batch(v).exceptAll(inc).isEmpty, s"$v diverged")
    }
  }

  private class ShuffleMeter extends SparkListener {
    @volatile var records: Long = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      records += sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
  }

  private def meter(action: => Unit): Long = {
    val m = new ShuffleMeter
    spark.sparkContext.addSparkListener(m)
    try {
      action
      org.apache.spark.graft.TestShims.drainListenerBus(spark.sparkContext)
      m.records
    } finally spark.sparkContext.removeSparkListener(m)
  }

  test("incremental recursion shuffle independent of accumulated closure") {
    // many disjoint ≤4-node chain components: closure size grows with n,
    // but an insert touching a FRESH component must not shuffle the
    // accumulated state
    def edges(n: Int): DataFrame = spark.range(n.toLong).select(
      col("id").cast("int").as("src"),
      (col("id") + 1).cast("int").as("dst"))
      .filter(col("src") % 4 =!= 3)
    def seeded(n: Int): Pipeline = {
      val p = Pipeline(spark, closureSql)
      p.step(Map("edges" -> ZSets.lift(edges(n))))
      p
    }
    val delta = ZSets.lift(
      Seq((1000001, 1000002), (1000002, 1000003)).toDF("src", "dst"))
      .localCheckpoint(true)
    def one(p: Pipeline): Unit = p.step(Map("edges" -> delta))
    val small = { val p = seeded(2000); meter(one(p)) }
    val large = { val p = seeded(40000); meter(one(p)) }
    assert(large <= small + 100,
      s"recursive step shuffle grew with closure size: small=$small large=$large")
  }
}
