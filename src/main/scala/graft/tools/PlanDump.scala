package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for named registered queries to
  * plans/<tag>/<name>_<suffix>.txt — the optimization-round evidence files
  * (plan shape: Exchange count, join strategy, PushedFilters/ReadSchema).
  *
  * Usage: runMain graft.tools.PlanDump <tag> <suffix> <query>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    // Pre-materialization evidence frames: queries whose REGISTERED form
    // ends in a checkpoint dump as `Scan ExistingRDD` (no expression
    // tree). These rebuild the hot pre-checkpoint projection with the
    // same builders, so the kernel-vs-HOF evidence is visible
    // (r15 verdict item 7 — llm_inc_dedup's dumps were useless).
    def evidence(n: String): Option[org.apache.spark.sql.DataFrame] =
      n match {
        case "llm_inc_dedup_fp" | "llm_inc_dedup_fp_hof" =>
          import org.apache.spark.sql.functions.col
          val fp =
            if (n.endsWith("_hof")) graft.llm.Dedup.rollingFingerprintHof _
            else graft.llm.Dedup.rollingFingerprint _
          Some(graft.Tables.load(spark, sfDir, "documents")
            .select(col("doc_id"),
              graft.llm.TextAnalysis.tokens(col("text")).as("_toks"))
            .select(col("doc_id"), fp(col("_toks")).as("fp")))
        case _ => None
      }
    names.foreach { name =>
      try {
        val df = evidence(name).getOrElse(
          graft.SparkEntry.queries(name)(spark, sfDir))
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          dir.resolve(s"${name}_$suffix.txt"), plan)
        println(s"PLAN $name -> ${dir.resolve(s"${name}_$suffix.txt")}")
      } catch {
        case e: Throwable =>
          System.err.println(s"PLAN $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
