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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read it as raw nanos and convert (µs truncation is
      // lossless on this data — sub-µs digits are zero; see TESTDATA.md).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000L")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views (for spark.sql-based access). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
