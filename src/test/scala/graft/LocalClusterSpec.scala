package graft

import org.scalatest.funsuite.AnyFunSuite

/** Multi-executor validation: spawns [[graft.tools.ClusterCheck]] as a
  * separate JVM (one SparkContext per process) running Spark's
  * `local-cluster[2,2,...]` master — two REAL executor JVMs — and
  * asserts the co-partitioned / tiered / bucketed state layouts hold
  * there: genuine serialization, remote broadcasts, cross-process
  * shuffles, none of the in-process fast paths `local[n]` takes. This is
  * the guard NOTES flagged as missing ("multi-executor runs unproven").
  */
class LocalClusterSpec extends AnyFunSuite {

  test("state layouts hold on a real two-executor local-cluster") {
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new java.io.File(s"$sparkHome/jars").isDirectory,
      "needs a Spark distribution for local-cluster workers")
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val pb = new ProcessBuilder(
      javaBin, "-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.tools.ClusterCheck")
    pb.environment().put("SPARK_HOME", sparkHome)
    // plain-java launch skips load-spark-env.sh, so the worker's command
    // builder needs the scala line told explicitly
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val done = p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) p.destroyForcibly()
    assert(done, "ClusterCheck timed out")
    assert(p.exitValue() === 0, s"ClusterCheck failed:\n${out.takeRight(4000)}")
    assert(out.contains("CLUSTERCHECK OK executors=2"),
      out.linesIterator.filter(_.contains("CLUSTERCHECK")).mkString("\n"))
  }
}
