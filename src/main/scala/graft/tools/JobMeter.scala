package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one registered query and report Spark job/stage counts and
  * wall time — the feedback loop for trimming per-step fixed costs in the
  * multi-batch incremental demos (many tiny jobs = scheduling overhead).
  */
object JobMeter {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()

    args.foreach { name =>
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"METER $name%-20s ${sec}%8.2fs jobs=$jobs stages=$stages tasks=$tasks")
    }
    spark.stop()
  }
}
