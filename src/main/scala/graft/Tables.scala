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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
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
