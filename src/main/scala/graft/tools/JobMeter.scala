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
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var busyMs = 0L
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageRun = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; starts.put(j.jobId, j.time)
        if (sys.env.contains("SPARK_GRAFT_TRACE")) {
          val p = j.properties
          val eid = Option(p).map(_.getProperty(
            "spark.sql.execution.id", "-")).getOrElse("-")
          val desc = Option(p).map(_.getProperty(
            "spark.job.description", "")).getOrElse("")
          println(s"  JOB ${j.jobId} t=${j.time % 1000000} exec=$eid: " +
            desc.split("\n").head.take(110))
        }
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        if (sys.env.contains("SPARK_GRAFT_TRACE")) {
          val m = s.stageInfo.taskMetrics
          println(f"    stage ${s.stageInfo.stageId}%4d run=${m.executorRunTime / 1000.0}%7.2fs cpu=${m.executorCpuTime / 1e9}%7.2fs gc=${m.jvmGCTime / 1000.0}%6.2fs deser=${m.executorDeserializeTime / 1000.0}%6.2fs tasks=${s.stageInfo.numTasks}%3d  ${s.stageInfo.name.split("\n").head.take(90)}")
          val site = s.stageInfo.name.split("\n").head
          stageRun.merge(site, m.executorRunTime, (a, b) => a + b)
          ()
        }
      }
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { runMs.addAndGet(m.executorRunTime); () }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { t0 =>
          busyMs += j.time - t0
          if (sys.env.contains("SPARK_GRAFT_TRACE"))
            println(s"  JOBEND ${j.jobId} t=${j.time % 1000000} took=${j.time - t0}ms")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    // floor cost of a trivial job (scheduling + codegen + bus latency)
    (1 to 3).foreach { round =>
      val t = System.nanoTime()
      (1 to 10).foreach(i =>
        spark.range(2).repartition(2).selectExpr("sum(id)").collect())
      println(f"MICRO round$round: ${(System.nanoTime() - t) / 1e7 }%.0f ms/job (shuffle+agg)")
    }

    args.foreach { name =>
      jobs = 0; stages = 0; tasks = 0; busyMs = 0; runMs.set(0L)
      stageRun.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"METER $name%-20s ${sec}%8.2fs jobs=$jobs stages=$stages tasks=$tasks busy=${busyMs / 1000.0}%.2fs taskRun=${runMs.get / 1000.0}%.2fs")
      if (sys.env.contains("SPARK_GRAFT_TRACE")) {
        import scala.jdk.CollectionConverters._
        stageRun.asScala.toSeq.sortBy(-_._2).takeWhile(_._2 > 50)
          .foreach { case (site, ms) =>
            println(f"  STAGE ${ms / 1000.0}%8.2fs  $site")
          }
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
