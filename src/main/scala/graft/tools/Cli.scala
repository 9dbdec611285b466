package graft.tools

import java.io.{BufferedReader, PrintWriter}

import org.apache.spark.sql.SparkSession

import graft.runtime.{HttpShim, Pipeline}

/** `fda`-style interactive shell (docs/interface/cli.md — the reference
  * CLI's `fda shell`): load a program, then run ad-hoc SQL
  * (SELECT / INSERT / PREPARE-EXECUTE) against the live pipeline state,
  * with dot-commands for the observability surfaces.
  *
  *   graft.tools.Cli program.sql [--serve]
  *
  * `--serve` additionally starts the HTTP shim and prints its port, so
  * the same session is reachable over REST while the shell runs.
  *
  * Dot commands: `.stats` (relation sizes + connector states),
  * `.profile` (per-view IVM maintenance shape), `.ingest` (run one
  * connector round), `.quit`. Everything else accumulates until a line
  * ends with `;` and executes as one ad-hoc request (multi-statement
  * requests follow the documented snapshot-at-start read semantics).
  */
object Cli {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.tools.Cli <program.sql> [--serve]")
    val sql = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(0))), "UTF-8")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pipeline = Pipeline(spark, sql)
    val shim = if (args.contains("--serve")) {
      val s = HttpShim.serve(pipeline)
      println(s"serving http on port ${s.port}")
      Some(s)
    } else None
    val out = new PrintWriter(System.out, true)
    try repl(pipeline,
      new BufferedReader(new java.io.InputStreamReader(System.in)), out)
    finally {
      shim.foreach(_.stop())
      spark.stop()
    }
  }

  /** The shell loop, factored for direct testing. Returns the number of
    * executed requests.
    */
  def repl(pipeline: Pipeline, in: BufferedReader, out: PrintWriter): Int = {
    var executed = 0
    val buf = new StringBuilder
    var line = in.readLine()
    while (line != null) {
      line.trim match {
        case ".quit" | ".exit" => line = null
        case ".stats" => out.println(pipeline.stats()); line = in.readLine()
        case ".profile" =>
          pipeline.viewNames.foreach { v =>
            val shape = try pipeline.shapeOf(v).toString
              catch { case _: Throwable => "n/a" }
            out.println(s"$v: $shape")
          }
          line = in.readLine()
        case ".ingest" =>
          val deltas = pipeline.ingestConnectors()
          out.println(s"ingested (step ${pipeline.stepCount}, " +
            s"${deltas.size} views changed)")
          line = in.readLine()
        case ".help" =>
          out.println("SQL ending with ';' executes ad-hoc; " +
            ".stats .profile .ingest .quit")
          line = in.readLine()
        case _ =>
          buf.append(line).append('\n')
          if (line.trim.endsWith(";")) {
            val req = buf.toString.trim.stripSuffix(";")
            buf.clear()
            try {
              val df = pipeline.adHoc(req)
              val rows = df.collect()
              out.println(df.columns.mkString("\t"))
              rows.foreach(r => out.println(r.toSeq.map {
                case null => "NULL"
                case x => x.toString
              }.mkString("\t")))
              out.println(s"(${rows.length} rows)")
            } catch {
              case scala.util.control.NonFatal(e) =>
                out.println(s"error: ${e.getMessage}")
            }
            executed += 1
          }
          line = in.readLine()
      }
    }
    executed
  }
}
