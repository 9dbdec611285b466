ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "felderaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// per-test durations in the report (suite-balancing evidence for the
// forked test groups below)
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")

// ---- forked test groups ------------------------------------------------
// One sequential JVM ran the suite in ~27 min — dominated by a few
// corpus/pipeline/fuzz suites, and long enough to brush harness
// timeouts. Suites are greedy-packed into 4 forked JVMs that run
// CONCURRENTLY; within a group suites stay sequential. Isolation audit:
// each JVM builds its own SparkContext (SparkSpec.session is per-JVM),
// every test server binds an ephemeral port (ServerSocket(0)), suite
// scratch dirs come from Files.createTempDirectory, and the only shared
// warehouse writer (BucketingSpec) owns its table names. Weights below
// are measured wall seconds (scalatest -oD, 32-core host); an unlisted
// (new) suite defaults to 10 s — rebalance opportunistically when a
// heavy one appears.
val testSuiteSeconds: Map[String, Double] = Map(
  "VariantsSpec" -> 334, "StreamCorpusSpec" -> 144,
  "PgCorpusSpec" -> 119, "LocalClusterSpec" -> 101,
  "IvmFuzzSpec" -> 75, "PipelineSteadyStateSpec" -> 69,
  "PgCorpusIncSpec" -> 62, "PipelineSemiAntiSpec" -> 59,
  "PipelineIvmSpec" -> 53, "PipelineSpec" -> 48, "DeltaLakeSpec" -> 43,
  "IcebergLakeSpec" -> 40, "TieredTraceSpec" -> 31, "LlmSpec" -> 31,
  "CurationStreamSpec" -> 30, "DialectSpec" -> 27, "CoPartJoinSpec" -> 26,
  "BucketedTraceSpec" -> 23, "HttpShimSpec" -> 21,
  "PipelineMigrateSpec" -> 20, "DurableRunnerSpec" -> 20,
  "PgCdcSpec" -> 20, "IncrementalOpsSpec" -> 18,
  "PipelineRecIncSpec" -> 17, "StreamingSpec" -> 16, "PlanAuditSpec" -> 16,
  "ConnectorsSpec" -> 14, "CheckpointSyncSpec" -> 14,
  "PipelineStateBackendSpec" -> 13, "RuntimeSpec" -> 12, "PubSubSpec" -> 12,
  "TransactionSpec" -> 11, "KafkaSpec" -> 9, "SamplingSpec" -> 9,
  "NatsSpec" -> 8, "StatefulOpsSpec" -> 8, "RollingAggSpec" -> 6,
  "DatagenSpec" -> 5, "OpsSpec" -> 4, "FunctionsSpec" -> 4,
)
val testGroupCount = 4
Test / testGrouping := {
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
  val defs = (Test / definedTests).value
    .sortBy(t => -testSuiteSeconds.getOrElse(t.name.split('.').last, 10.0))
  val bins = Array.fill(testGroupCount)(
    (0.0, List.newBuilder[sbt.TestDefinition]))
  defs.foreach { t =>
    val i = bins.indices.minBy(bins(_)._1)
    val w = testSuiteSeconds.getOrElse(t.name.split('.').last, 10.0)
    bins(i)._2 += t
    bins(i) = (bins(i)._1 + w, bins(i)._2)
  }
  bins.toSeq.zipWithIndex.map { case ((_, ts), i) =>
    Tests.Group(s"g$i", ts.result(), Tests.SubProcess(opts))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(16),
)
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as
// JSON; sbt's "[success] Total time: …" trailer otherwise lands after it,
// and the logger would prefix forked-run output with "[info] ".
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
