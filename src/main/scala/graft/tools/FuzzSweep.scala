package graft.tools

import org.apache.spark.sql.SparkSession

/** Cross-engine fuzz ROBUSTNESS sweep (dev tool, not graded): re-runs
  * every SltFuzz grammar under alternate seeds and dumps results in the
  * Verify layout, so `scripts/check.py <sf> <out>` compares each corpus
  * against DuckDB. The graded rows pin ONE seed each; this sweep is the
  * insurance that the grammars themselves — not just those seeds — stay
  * inside the engine-shared dialect (the round-8 decimal-tie escape
  * would have been caught by exactly this).
  *
  * Usage: runMain graft.tools.FuzzSweep <outDir> <seed> [seed ...]
  */
object FuzzSweep {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val seeds = args.tail.map(_.toLong)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    // the strftime corpus calls the registered FORMAT_* wrappers
    graft.functions.Registry.registerAll(spark)
    val oracle = scala.collection.mutable.LinkedHashMap[String, String]()
    seeds.foreach { seed =>
      graft.queries.SltFuzz.corpus(seed).foreach {
        case (name, sparkSql, duckSql) =>
          val full = s"${name}_$seed"
          try {
            spark.sql(sparkSql).repartition(1).write.mode("overwrite")
              .parquet(s"$outDir/$full")
            oracle(full) = duckSql
          } catch { case e: Throwable =>
            System.err.println(s"[fuzz-sweep] $full SPARK-side failed: " +
              e.getMessage.linesIterator.next())
          }
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "oracle_sql.json"), json)
    println(s"fuzz-sweep: ${oracle.size} corpora dumped to $outDir")
    spark.stop()
  }
}
