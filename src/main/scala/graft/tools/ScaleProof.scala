package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve spot proof (round-13 verdict ask #7): replicate the
  * driver's sf0.1 parquet N× with COORDINATED key offsets (each replica
  * joins only within itself, so join output scales ×N — a faithful
  * scale model, unlike a bare union which would square join degrees),
  * then time the heaviest graded rows at both scales and print one
  * JSON line per (query, scale). A near-linear wall-clock ratio at 10×
  * data on the same 32 threads is the measured form of the "would this
  * plan survive a scale-up" audit.
  *
  * Usage: runMain graft.tools.ScaleProof <sfDir> <outDir> <factor>
  */
object ScaleProof {

  /** table → columns to offset per replica (nation/region stay single —
    * they are dimension keys every replica shares).
    */
  private val offsets: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val copyOnly = Seq("nation", "region")

  def generate(spark: SparkSession, src: String, out: String,
      factor: Int): Unit = {
    for ((t, keys) <- offsets) {
      val base = graft.Tables.load(spark, src, t)
      val keyCols = keys.filter(base.columns.contains)
      val maxes = keyCols.map(k =>
        k -> (base.agg(max(col(k))).head().getLong(0) + 1L)).toMap
      val replicas = (0 until factor).map { i =>
        var df = base
        for (k <- keyCols)
          df = df.withColumn(k, col(k) + lit(i * maxes(k)))
        // keep text/vector content distinct across replicas so
        // similarity/dedup candidate sets scale like real data
        if (df.columns.contains("text") && i > 0)
          df = df.withColumn("text",
            concat(col("text"), lit(s" r$i")))
        df
      }
      replicas.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scale] $t x$factor written")
    }
    for (t <- copyOnly)
      graft.Tables.load(spark, src, t).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
  }

  /** The audited heavy rows (VERDICT r12 plan-audit list + the widest
    * llm shuffles). Each runs once to warm codegen/JIT, once timed.
    */
  private val audited = Seq("tpch_q1", "tpch_q5", "tpch_q9", "tpch_q18",
    "join_asof_sql", "join_star", "win_topk", "agg_linear",
    "llm_dup_pairs", "llm_minhash", "llm_dup_groups",
    "llm_token_stats", "sort_limit", "distinct_rows")

  /** SPARK_GRAFT_SCALE_QUERIES=a,b,c narrows the audited set (the 30×
    * second-derivative check re-measures just the minhash family).
    */
  private def auditedNow: Seq[String] =
    sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(audited)

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS) = args.take(3)
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$out/lineitem.parquet").exists()) {
      generate(spark, src, out, factor)
    }
    val qs = graft.SparkEntry.queries
    for (name <- auditedNow if qs.contains(name)) {
      for ((dir, label) <- Seq(src -> "sf0.1", out -> s"sf0.1x$factor")) {
        def run(): Long = {
          val t0 = System.nanoTime()
          qs(name)(spark, dir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1000000L
        }
        run() // warm
        val ms = run()
        println(s"""{"query":"$name","scale":"$label","ms":$ms}""")
      }
    }
    spark.stop()
  }
}
