package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.Change

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("streaming topk survives retraction of a top element") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change[String]]
    val q = StatefulOps.topK(in.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode(OutputMode.Update).start()
    in.addData(Change("a", 5L, 1L), Change("a", 1L, 1L), Change("a", 3L, 1L))
    q.processAllAvailable()
    // retract the current minimum → 3 must be promoted back into top-2
    in.addData(Change("a", 1L, -1L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("topk_out").as[StatefulOps.TopK[String]]
      .collect()
    assert(rows.head.topk === Seq(1L, 3L)) // after first batch
    assert(rows.last.topk === Seq(3L, 5L)) // after retraction
  }

  test("streaming topk handles duplicate values via multiplicity") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change[String]]
    val q = StatefulOps.topK(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("topk_dup_out")
      .outputMode(OutputMode.Update).start()
    in.addData(Change("a", 2L, 2L), Change("a", 7L, 1L))
    q.processAllAvailable()
    in.addData(Change("a", 2L, -1L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("topk_dup_out").as[StatefulOps.TopK[String]]
      .collect()
    assert(rows.head.topk === Seq(2L, 2L, 7L))
    assert(rows.last.topk === Seq(2L, 7L))
  }

  test("streaming retractable min/max tracks extremum deletions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change[String]]
    val q = StatefulOps.minMax(in.toDS())
      .writeStream.format("memory").queryName("mm_out")
      .outputMode(OutputMode.Update).start()
    in.addData(Change("k", 10L, 1L), Change("k", 99L, 1L), Change("k", 50L, 1L))
    q.processAllAvailable()
    in.addData(Change("k", 99L, -1L), Change("k", 10L, -1L))
    q.processAllAvailable()
    in.addData(Change("k", 50L, -1L)) // group empties
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("mm_out").as[StatefulOps.MinMax[String]].collect()
    assert((rows(0).min, rows(0).max) === (10L, 99L))
    assert((rows(1).min, rows(1).max) === (50L, 50L))
    assert(rows(2).empty)
  }

  test("streaming topk matches a model under random insert/retract batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(42)
    val state = collection.mutable.Map.empty[Long, Long] // model multiset
    val batches = (0 until 12).map { _ =>
      val changes = (0 until 8).flatMap { _ =>
        val v = rnd.nextInt(10).toLong
        val canRetract = state.getOrElse(v, 0L) > 0
        val w = if (canRetract && rnd.nextBoolean()) -1L else 1L
        state(v) = state.getOrElse(v, 0L) + w
        if (state(v) == 0L) state.remove(v)
        Some(Change("g", v, w))
      }
      val expect = state.toSeq.sortBy(_._1)
        .flatMap { case (v, m) => Seq.fill(m.toInt)(v) }.take(3)
      (changes, expect)
    }

    val in = MemoryStream[Change[String]]
    val q = StatefulOps.topK(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("topk_rand_out")
      .outputMode(OutputMode.Update).start()
    val got = batches.map { case (changes, expect) =>
      in.addData(changes)
      q.processAllAvailable()
      val rows = spark.table("topk_rand_out")
        .as[StatefulOps.TopK[String]].collect()
      (rows.last.topk, expect)
    }
    q.stop()
    got.zipWithIndex.foreach { case ((actual, expect), i) =>
      assert(actual === expect, s"batch $i")
    }
  }
}
