package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * Tables mirror the reference's input-table concept
  * (feldera: crates/feldera-types/src/program_schema.rs:209 `Relation`);
  * here a table is simply a parquet-backed DataFrame. At 100 TB these
  * reads become distributed columnar scans with predicate pushdown and
  * column pruning handled by the parquet DataSource — queries should
  * select only needed columns so `ReadSchema` stays narrow.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** (path → (rowGroups, rows)) from the parquet footer, read once per
    * path on the driver. Parquet scans split at ROW-GROUP granularity, so
    * a large file written as one row group caps the whole scan stage —
    * and everything Spark evaluates scan-side: pushed filters, broadcast
    * probes, partial aggregates — at ONE task no matter the cluster.
    */
  private val footerMeta =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()

  private def footerOf(spark: SparkSession, path: String): (Int, Long) =
    footerMeta.computeIfAbsent(path, { p =>
      val conf = spark.sessionState.newHadoopConf()
      val hp = new org.apache.hadoop.fs.Path(p)
      val status = hp.getFileSystem(conf).getFileStatus(hp)
      if (status.isDirectory) {
        // multi-file datasets already parallelize by file — no rebalance
        (Int.MaxValue, 0L)
      } else {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(status, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = r.getFooter.getBlocks
          val rows = {
            var s = 0L; blocks.forEach(b => s += b.getRowCount); s
          }
          (blocks.size, rows)
        } finally r.close()
      }
    })

  /** Rebalance a scan whose INPUT LAYOUT under-parallelizes it: if the
    * file has materially fewer row groups than the session has cores (and
    * enough rows to matter), hash-repartition on the leading column so
    * downstream scan-side work fans out. At production scale inputs carry
    * row groups ≫ cores and this is a no-op — no exchange is added; the
    * condition only fires on small single-row-group files, where the
    * exchange moves a few MB. Hash (not round-robin) partitioning keeps
    * the layout deterministic across retries.
    */
  private def fanOut(spark: SparkSession, df: DataFrame,
      path: String): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    val (groups, rows) = footerOf(spark, path)
    if (rows >= 100000L && groups < math.max(2, cores / 2))
      df.repartition(cores,
        org.apache.spark.sql.functions.col(df.columns.head))
    else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    fanOut(spark, loadRaw(spark, dir, name), s"$dir/$name.parquet")

  /** [[load]] without the layout rebalance — for consumers that slice a
    * table into many SMALL deltas (the incremental demos): each slice
    * would re-pay the exchange per step, and a small delta needs no scan
    * fan-out. Also the right call when the first pass is a groupBy whose
    * map-side combine should run scan-side rather than after an exchange.
    */
  def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts arrives as parquet TIMESTAMP(NANOS) in some driver
      // generations (Spark's vectorized reader rejects it — read as raw
      // nanos and convert; µs truncation is lossless, sub-µs digits are
      // zero) and plain TIMESTAMP(MICROS) in others. Normalize both to
      // TimestampType (session tz is pinned UTC, so NTZ→TZ is wall-clock
      // identity and downstream epoch arithmetic is unchanged).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000L")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views (for spark.sql-based access). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
