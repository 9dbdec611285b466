package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.runtime.StreamingPipeline

import scala.collection.mutable

/** Runtime plumbing: multi-sink foreachBatch fan-out and file-format
  * round-trips (SURVEY §2.1 formats row).
  */
class RuntimeSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch fan-out: all views see the same batch atomically") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val results = mutable.Map[String, mutable.Buffer[(Long, Long)]]()
    val q = StreamingPipeline.foreachBatchFanout(
      in.toDF().toDF("k", "v"),
      Seq(
        "sums" -> (b => b.agg(sum("v").as("s"))),
        "counts" -> (b => b.agg(count(lit(1)).as("c")))),
      (name, df, batchId) => synchronized {
        results.getOrElseUpdate(name, mutable.Buffer()) +=
          ((batchId, df.collect().head.getLong(0)))
      }).start()
    in.addData(("a", 10L), ("b", 20L))
    q.processAllAvailable()
    in.addData(("c", 5L))
    q.processAllAvailable()
    q.stop()
    assert(results("sums").toList === List((0L, 30L), (1L, 5L)))
    assert(results("counts").toList === List((0L, 2L), (1L, 1L)))
  }

  test("csv/json format round-trips preserve the relation") {
    val dir = Files.createTempDirectory("graft_fmt").toString
    val src = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    src.write.mode("overwrite").json(s"$dir/json")
    val csvBack = spark.read.option("header", "true")
      .schema(src.schema).csv(s"$dir/csv")
    val jsonBack = spark.read.schema(src.schema).json(s"$dir/json")
    assert(csvBack.exceptAll(src).isEmpty && src.exceptAll(csvBack).isEmpty)
    assert(jsonBack.exceptAll(src).isEmpty && src.exceptAll(jsonBack).isEmpty)
  }

  test("standing join: streaming deltas through the IVM path, with retraction") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(Long, String, Long)] // (k, a, _w)
    val r = MemoryStream[(Long, String, Long)] // (k, b, _w)
    val deltas = mutable.Buffer[org.apache.spark.sql.DataFrame]()
    val q = StreamingPipeline.standingJoin(
      l.toDF().toDF("k", "a", "_w"), r.toDF().toDF("k", "b", "_w"),
      Seq("k")) { (d, _) => deltas += d.localCheckpoint(true); () }
      .outputMode("update").start()
    // batch 1: left-only — no matches yet
    l.addData((1L, "a1", 1L), (2L, "a2", 1L))
    q.processAllAvailable()
    // batch 2: right side arrives — (1,a1,b1) and (2,a2,b2) appear
    r.addData((1L, "b1", 1L), (2L, "b2", 1L), (3L, "b3", 1L))
    q.processAllAvailable()
    // batch 3: BOTH sides in one micro-batch + a retraction of (2,a2)
    l.addData((3L, "a3", 1L), (2L, "a2", -1L))
    r.addData((1L, "b1x", 1L))
    q.processAllAvailable()
    q.stop()
    // integrated output = batch join of the surviving sides
    val out = graft.zset.ZSets.toMultiset(graft.zset.ZSets.consolidate(
      deltas.reduce(_ unionByName _)))
    val expected = Seq(
      (1L, "a1", "b1"), (1L, "a1", "b1x"), (3L, "a3", "b3"))
      .toDF("k", "a", "b")
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
  }
}
