package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Streams, Upsert}
import graft.zset.ZSets

/** Structured Streaming specs: LATENESS/watermark semantics, windowed aggs,
  * upsert changelogs, weighted streaming aggregation — the streaming half
  * of SURVEY §2.7.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private var n = 0
  private def nextName(): String = { n += 1; s"st_out_$n" }

  test("tumble agg with watermark: late row dropped, final windows correct") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val agg = Streams.tumbleAgg(
      Streams.withLateness(in.toDF().toDF("t", "v"), "t", "10 minutes"),
      "t", "1 hour", Seq.empty, Seq(sum(col("v")).as("s")))
    val name = nextName()
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    in.addData((ts("2024-01-01 10:05:00"), 1L), (ts("2024-01-01 10:20:00"), 2L))
    q.processAllAvailable()
    // advance watermark past 11:10 → closes the 10:00 window
    in.addData((ts("2024-01-01 11:30:00"), 10L))
    q.processAllAvailable()
    // this row is inside the closed 10:00 window → must be DROPPED
    in.addData((ts("2024-01-01 10:59:00"), 100L))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 13:00:00"), 5L)) // closes the 11:00 window
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name)
      .select(col("window_start").cast("string"), col("s"))
      .as[(String, Long)].collect().toMap
    assert(rows("2024-01-01 10:00:00") === 3L) // late 100 not included
    assert(rows("2024-01-01 11:00:00") === 10L)
  }

  test("session window agg merges within gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val agg = Streams.sessionAgg(
      Streams.withLateness(in.toDF().toDF("t", "u", "v"), "t", "5 minutes"),
      "t", "30 minutes", Seq(col("u")), Seq(count(lit(1)).as("n")))
    val name = nextName()
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    in.addData(
      (ts("2024-01-01 10:00:00"), "u1", 1L),
      (ts("2024-01-01 10:10:00"), "u1", 1L),  // same session
      (ts("2024-01-01 11:30:00"), "u1", 1L))  // new session
    q.processAllAvailable()
    in.addData((ts("2024-01-01 14:00:00"), "u2", 1L)) // advances watermark
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).select("u", "n").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(rows("u1") === Seq(1L, 2L))
  }

  test("upsert changelog emits retract+insert; weighted agg integrates it") {
    // batch-mode Dataset through the same flatMapGroupsWithState path
    val in = Seq[Upsert.Input[Long, Long]](
      Upsert.Input(1L, Some(10L)),
      Upsert.Input(2L, Some(20L)),
      Upsert.Input(1L, Some(15L)),  // overwrite key 1: -10, +15
      Upsert.Input(2L, None)        // delete key 2: -20
    ).toDS()
    val changes = Upsert.toChangelog(in)
    val got = changes.collect().map(c => (c.key, c.value, c.weight)).toList
    assert(got.filter(_._1 == 1L) ===
      List((1L, 10L, 1L), (1L, 10L, -1L), (1L, 15L, 1L)))
    assert(got.filter(_._1 == 2L) ===
      List((2L, 20L, 1L), (2L, 20L, -1L)))
    // integrate via weighted linear agg: value sum per live key
    val delta = changes.toDF().select(col("value").as("v"),
      col("weight").as(ZSets.W))
    val sums = Streams.weightedLinearAgg(delta, Seq.empty,
      Seq("s" -> col("v")))
    assert(sums.select("s").as[Long].head() === 15L)
  }

  test("streaming weighted agg equals batch under retractions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Long)]
    val agg = Streams.weightedLinearAgg(
      in.toDF().toDF("k", "v", ZSets.W), Seq(col("k")),
      Seq("s" -> col("v")))
    val name = nextName()
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    in.addData(("a", 10L, 1L), ("a", 20L, 1L), ("b", 5L, 1L))
    q.processAllAvailable()
    in.addData(("a", 10L, -1L), ("b", 7L, 1L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).select("k", "s", "_cnt")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(rows === Map("a" -> ((20L, 1L)), "b" -> ((12L, 2L))))
  }
}
