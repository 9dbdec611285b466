package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.runtime.Pipeline
import graft.zset.ZSets

/** Long-schedule steady-state contract: a continuously-running pipeline's
  * PER-STEP cost must stay flat while the integrated state grows. The
  * two-point state-size check (PipelineIvmSpec) pins shuffle volume at two
  * snapshot sizes; this spec drives one pipeline through 24 equal-size
  * delta steps — state grows 24× — and asserts the per-step metric
  * TRAJECTORY: late-step shuffle volume and Spark job/stage counts must
  * match early-step ones, i.e. nothing in the step path (trace appends,
  * delta rules, indicator maintenance, checkpoint discipline) accumulates
  * per-step work or per-step plan growth. This is the property that lets
  * the runner process an unbounded stream of micro-batches (reference: the
  * spine's amortized maintenance, crates/dbsp/src/trace/spine_async.rs —
  * a circuit step never pays O(|state|)).
  *
  * The table and the join view ride the trace backend (the 100-TB
  * deployment shape); the grouped aggregate keeps the default snapshot
  * backend (small hot state — 8 groups). Correctness is anchored by
  * comparing the final integrated views against a batch recompute over
  * the concatenated deltas.
  */
class PipelineSteadyStateSpec extends SparkSpec {

  private val programSql =
    """CREATE TABLE ev (k BIGINT NOT NULL, grp BIGINT, v DOUBLE);
      |CREATE TABLE dim (grp BIGINT NOT NULL, name VARCHAR);
      |CREATE LOCAL VIEW filt AS SELECT k, grp, v FROM ev WHERE v >= 0;
      |CREATE VIEW agg AS
      |  SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM filt GROUP BY grp;
      |CREATE VIEW j AS
      |  SELECT e.k, d.name, e.v FROM filt e JOIN dim d ON e.grp = d.grp;"""
      .stripMargin

  private val stepRows = 256
  private val nSteps = 24

  /** Step m's delta: fresh keys, constant row count, a few retractions of
    * step m-1's rows so the general (not append-only) path is exercised.
    */
  private def delta(m: Int): DataFrame = {
    val ins = spark.range(stepRows.toLong).select(
      (col("id") + m.toLong * stepRows).as("k"),
      (col("id") % 8).as("grp"),
      (col("id") % 100).cast("double").as("v"))
      .withColumn(ZSets.W, lit(1L))
    if (m == 0) ins
    else {
      val retract = spark.range(4L).select(
        (col("id") + (m - 1).toLong * stepRows).as("k"),
        (col("id") % 8).as("grp"),
        (col("id") % 100).cast("double").as("v"))
        .withColumn(ZSets.W, lit(-1L))
      ins.unionByName(retract)
    }
  }

  private class StepMeter extends SparkListener {
    @volatile var shuffleRecords = 0L
    @volatile var stages = 0
    @volatile var jobs = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages += 1
      shuffleRecords +=
        sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs += 1
  }

  private def metered(action: => Unit): (Long, Int, Int) = {
    val m = new StepMeter
    spark.sparkContext.addSparkListener(m)
    try {
      action
      org.apache.spark.graft.TestShims.drainListenerBus(spark.sparkContext)
      (m.shuffleRecords, m.stages, m.jobs)
    } finally spark.sparkContext.removeSparkListener(m)
  }

  test("per-step cost stays flat across 24 steps while state grows 24x") {
    val pipe = Pipeline(spark, programSql,
      traceBacked = Set("ev", "j"), traceMemRows = 4L << 20)
    try {
      val dims = spark.range(8L).select(col("id").as("grp"),
        concat(lit("g"), col("id")).as("name"))
        .withColumn(ZSets.W, lit(1L)).localCheckpoint(true)
      val deltas = (0 until nSteps)
        .map(m => delta(m).localCheckpoint(true))

      val metrics = (0 until nSteps).map { m =>
        val in: Map[String, DataFrame] =
          if (m == 0) Map("ev" -> deltas(m), "dim" -> dims)
          else Map("ev" -> deltas(m))
        metered {
          // consume every view delta (the sink side of a real deployment)
          pipe.step(in).values.foreach(
            _.write.format("noop").mode("overwrite").save())
        }
      }

      // warm-up window: first steps pay plan analysis + codegen + the
      // dim-side initial integration; compare mid-window vs the tail
      val early = metrics.slice(4, 12)
      val late = metrics.slice(16, 24)
      def mean(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size

      val earlyShuffle = mean(early.map(_._1))
      val lateShuffle = mean(late.map(_._1))
      assert(lateShuffle <= earlyShuffle * 1.3 + 64,
        s"per-step shuffle volume grew with accumulated state: " +
          s"early=$earlyShuffle late=$lateShuffle " +
          s"(all: ${metrics.map(_._1).mkString(",")})")

      val earlyStages = mean(early.map(_._2.toLong))
      val lateStages = mean(late.map(_._2.toLong))
      assert(lateStages <= earlyStages * 1.3 + 2,
        s"per-step stage count grew: early=$earlyStages late=$lateStages " +
          s"(all: ${metrics.map(_._2).mkString(",")})")

      val earlyJobs = mean(early.map(_._3.toLong))
      val lateJobs = mean(late.map(_._3.toLong))
      assert(lateJobs <= earlyJobs * 1.3 + 2,
        s"per-step job count grew: early=$earlyJobs late=$lateJobs " +
          s"(all: ${metrics.map(_._3).mkString(",")})")

      // correctness anchor: final integrated views equal batch recompute
      val all = deltas.reduce(_ unionByName _)
      val evAll = ZSets.toMultiset(ZSets.consolidate(all))
      evAll.createOrReplaceTempView("ev_all")
      dims.drop(ZSets.W).createOrReplaceTempView("dim_all")
      val wantAgg = spark.sql(
        """SELECT grp, COUNT(*) AS n, SUM(v) AS sv FROM ev_all
          |WHERE v >= 0 GROUP BY grp""".stripMargin)
        .collect().map(_.toString).sorted
      val gotAgg = pipe.adHoc("SELECT * FROM agg")
        .collect().map(_.toString).sorted
      assert(gotAgg === wantAgg)
      val wantJ = spark.sql(
        """SELECT e.k, d.name, e.v FROM ev_all e JOIN dim_all d
          |ON e.grp = d.grp WHERE e.v >= 0""".stripMargin)
        .collect().map(_.toString).sorted
      val gotJ = pipe.adHoc("SELECT * FROM j")
        .collect().map(_.toString).sorted
      assert(gotJ === wantJ)
    } finally pipe.close()
  }
}
