package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.RollingAgg
import graft.streaming.RollingAgg.{RollEvent, RollOut}

/** Streaming rolling RANGE aggregate vs the batch range-frame window, with
  * a late (within-watermark) row that must retro-correct later rows.
  */
class RollingAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int): Timestamp = new Timestamp(100000L + s * 1000L)

  test("streaming rolling sum/count equals batch RANGE frame incl. late rows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val events = in.toDF().toDF("key", "ts", "value")
      .withWatermark("ts", "60 seconds")
      .as[RollEvent[String]]
    val q = RollingAgg.rollingSumCount(events, rangeMs = 10000L)
      .writeStream.format("memory").queryName("roll_out")
      .outputMode(OutputMode.Update).start()

    in.addData(("a", ts(0), 1.0), ("a", ts(5), 2.0), ("a", ts(12), 4.0),
      ("b", ts(3), 10.0))
    q.processAllAvailable()
    // late row at ts(4): windows of a@ts(5) and a@ts(12) must be re-emitted
    in.addData(("a", ts(4), 8.0))
    q.processAllAvailable()
    q.stop()

    // latest emission per (key, ts) — memory sink preserves append order
    val got = spark.table("roll_out").as[RollOut[String]].collect()
      .zipWithIndex
      .groupBy(r => (r._1.key, r._1.ts.getTime))
      .map { case (_, rs) => rs.maxBy(_._2)._1 }
      .map(r => (r.key, r.ts.getTime, r.sum, r.cnt)).toSet

    val all = Seq(("a", ts(0), 1.0), ("a", ts(5), 2.0), ("a", ts(12), 4.0),
      ("b", ts(3), 10.0), ("a", ts(4), 8.0)).toDF("key", "ts", "value")
    val expected = all.select(col("key"), col("ts"),
        sum("value").over(org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("ts").cast("long"))
          .rangeBetween(-10, 0)).as("sum"),
        count("value").over(org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("ts").cast("long"))
          .rangeBetween(-10, 0)).as("cnt"))
      .as[(String, Timestamp, Double, Long)].collect()
      .map(r => (r._1, r._2.getTime, r._3, r._4)).toSet

    assert(got === expected)
  }

  test("waterline GC removes entries older than watermark minus range") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val events = in.toDF().toDF("key", "ts", "value")
      .withWatermark("ts", "5 seconds")
      .as[RollEvent[String]]
    val q = RollingAgg.rollingSumCount(events, rangeMs = 10000L)
      .writeStream.format("memory").queryName("roll_gc_out")
      .outputMode(OutputMode.Update).start()
    in.addData(("a", ts(0), 1.0))
    q.processAllAvailable()
    // advance the watermark far past ts(0) + range + lateness
    in.addData(("a", ts(100), 2.0))
    q.processAllAvailable()
    // ts(0) is GC'd: the window of ts(104) counts only ts(100)&ts(104)
    in.addData(("a", ts(104), 3.0))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("roll_gc_out").as[RollOut[String]].collect()
      .filter(_.ts.getTime == ts(104).getTime).last
    assert((last.sum, last.cnt) === (5.0, 2L))
  }
}
