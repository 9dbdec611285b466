package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.incremental.TieredTrace
import graft.llm.{Dedup, TextAnalysis}
import graft.zset.ZSets

/** End-to-end STREAMING curation: a document stream flows through the
  * quality gate and trace-backed incremental cross-corpus dedup inside
  * one foreachBatch — the continuous-ingest training-data pipeline
  * (file stream here; the kafka decode path plugs into the same batch
  * contract). The curated output must equal the batch recompute: quality
  * gate, then first-arrival-wins dedup in stream order.
  */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed curation equals the batch recompute") {
    val dir = Files.createTempDirectory("curate").toString
    // three arrival waves; wave 2 and 3 re-send earlier texts under new
    // ids (dups to reject) plus fresh texts, and some low-quality rows
    // fixture texts are alphanumeric+spaces — no JSON escaping needed
    def doc(id: Long, text: String): String =
      s"""{"doc_id": $id, "text": "$text"}"""
    val good = (i: Long) => s"document $i with enough distinct tokens " +
      s"to pass the quality gate number ${i * 7} end"
    val waves = Seq(
      (0L until 6L).map(i => doc(i, good(i))) :+ doc(6L, "short"),
      (10L until 13L).map(i => doc(i, good(i - 10))) ++ // dup re-sends
        (13L until 16L).map(i => doc(i, good(i))),
      Seq(doc(20L, good(11L)), doc(21L, "x y"), doc(22L, good(22L))))
    waves.zipWithIndex.foreach { case (lines, i) =>
      val p = java.nio.file.Paths.get(dir, s"wave_$i.json")
      Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      // FileStreamSource orders by modification time; identical stamps
      // tie-break arbitrarily — force the arrival order
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

    def fingerprints(batch: DataFrame): DataFrame = batch
      .select(col("doc_id"), col("text"),
        TextAnalysis.tokens(col("text")).as("_toks"))
      .filter(TextAnalysis.qualityScoreFromTokens(col("text"),
        col("_toks")) >= 0.65)
      .select(col("doc_id"),
        Dedup.rollingFingerprint(col("_toks")).as("fp"))

    // corpus state across micro-batches: the LSM-tiered trace
    var trace: TieredTrace = null
    var curated = Vector.empty[(Long, Long)] // (fp, doc_id)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one wave per micro-batch
      .json(dir)
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        val fps = fingerprints(batch)
        if (trace == null) {
          trace = new TieredTrace(
            fps.select(col("fp"), col("doc_id")).limit(0)
              .withColumn(ZSets.W, lit(1L)),
            Seq("fp"), nBuckets = 8)
        }
        curated = curated ++ Dedup.incrementalDedup(trace, fps,
          "fp", "doc_id").as[(Long, Long)].collect()
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // batch oracle: same gate, first arrival per fingerprint in wave
    // order (wave = doc_id decade here), ties to the lowest id
    val all = spark.read.schema(schema).json(dir)
    val expected = fingerprints(all)
      .withColumn("_wave", (col("doc_id") / 10).cast("long"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")
          .orderBy(col("_wave"), col("doc_id"))))
      .filter(col("_rk") === 1)
      .select(col("fp"), col("doc_id")).as[(Long, Long)].collect().toSet

    assert(curated.toSet === expected)
    // the dup re-sends (10-12 carry wave-1 texts) and low-quality rows
    // (6 "short", 21 "x y") were rejected; fresh texts at any wave admit
    val ids = curated.map(_._2).toSet
    assert(!ids.exists(Set(6L, 10L, 11L, 12L, 21L)),
      s"rejected ids leaked into the curated set: $ids")
    assert(Set(0L, 5L, 13L, 15L, 20L, 22L).subsetOf(ids))
    trace.delete()
  }

  test("streamed span-overlap admission equals the sequential replay") {
    val dir = Files.createTempDirectory("spangate").toString
    def doc(id: Long, text: String): String =
      s"""{"doc_id": $id, "text": "$text"}"""
    val waves = Seq(
      Seq(doc(1L, "p q r s t u v w"),
        doc(2L, "m n o p distinct words here")),
      Seq(doc(3L, "p q r s t u"),                  // verbatim partial copy of 1
        doc(4L, "fresh second wave content appears now")),
      Seq(doc(5L, "second wave content appears now"), // tail of ADMITTED 4
        doc(6L, "p q r s t u"),                    // copy of REJECTED 3
        doc(7L, "entirely novel final wave text")))
    waves.zipWithIndex.foreach { case (lines, i) =>
      val p = java.nio.file.Paths.get(dir, s"wave_$i.json")
      Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def newTrace() = new TieredTrace(
      spark.range(0).select(lit(0L).as("_h")).limit(0)
        .withColumn(ZSets.W, lit(1L)),
      Seq("_h"), memRows = 8, nBuckets = 4) // tiny bound: forces spills
    var trace: TieredTrace = null
    var streamed = Vector.empty[(Long, Boolean)]
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .json(dir)
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        if (trace == null) trace = newTrace()
        streamed = streamed ++ Dedup.incrementalSpanDedup(trace,
            batch, "doc_id", "text")
          .select(col("doc_id"), col("admitted"))
          .as[(Long, Boolean)].collect()
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(trace.bytesOnDisk > 0, "schedule must cross the spill")

    // sequential replay over the same wave schedule on a fresh trace
    val replay = newTrace()
    val expected = waves.indices.flatMap { i =>
      val batch = spark.read.schema(schema)
        .json(java.nio.file.Paths.get(dir, s"wave_$i.json").toString)
      Dedup.incrementalSpanDedup(replay, batch, "doc_id", "text")
        .select(col("doc_id"), col("admitted"))
        .as[(Long, Boolean)].collect()
    }
    assert(streamed.toSet === expected.toSet)
    // the partial copy, the admitted-doc tail, and the rejected-doc copy
    // are all rejected; fresh docs admit at every wave
    val admitted = streamed.filter(_._2).map(_._1).toSet
    assert(admitted === Set(1L, 2L, 4L, 7L))
    trace.delete(); replay.delete()
  }
}
