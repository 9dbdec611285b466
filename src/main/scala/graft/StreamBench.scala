package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-throughput benchmark (Nexmark-flavored; BASELINE.md context).
  * Generates a bid-like event table, then drives it through Structured
  * Streaming queries with Trigger.AvailableNow and reports events/s:
  *
  *   q1_map     — currency-conversion projection (Nexmark q1 analogue)
  *   q2_filter  — selective filter (q2)
  *   q5_window  — tumbling-window count per auction (q5-ish, stateful)
  *
  * Not part of the driver contract — extra evidence for the streaming
  * path's throughput. Prints one JSON line.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS", "5000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = Files.createTempDirectory("graft_stream").toString
    spark.range(n).select(
      col("id").as("bid_id"),
      timestamp_millis(lit(1700000000000L) + expr("id div 10")).as("date_time"),
      (col("id") % 1000).as("auction"),
      (col("id") % 5000).as("bidder"),
      (pmod(col("id") * 2654435761L, lit(10000L)) + 100).as("price"))
      .write.mode("overwrite").parquet(s"$dir/bid")

    def run(name: String)(build: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): (String, Double) = {
      val src = spark.readStream
        .schema(spark.read.parquet(s"$dir/bid").schema)
        .parquet(s"$dir/bid")
      val t0 = System.nanoTime()
      val q = build(src).writeStream.format("noop")
        .option("checkpointLocation", s"$dir/ckpt_$name")
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      name -> n / sec
    }

    val results = Seq(
      run("q1_map")(df => df.select(col("auction"), col("bidder"),
        (col("price") * 0.908).as("price_eur"), col("date_time"))),
      run("q2_filter")(df => df.filter(col("auction") % 123 === 0)
        .select("auction", "price")),
      run("q5_window")(df => df
        .withWatermark("date_time", "10 seconds")
        .groupBy(window(col("date_time"), "60 seconds"), col("auction"))
        .agg(count(lit(1)).as("n"))))

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.toLong }
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_events_per_sec","value":${results.map(_._2.toLong).max},"unit":"events/s","queries":$qs,"n":$n}""")
    spark.stop()
  }
}
