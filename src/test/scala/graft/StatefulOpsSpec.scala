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
}
