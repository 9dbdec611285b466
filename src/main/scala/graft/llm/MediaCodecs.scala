package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** REAL media codecs over the JDK's bundled libraries — ImageIO
  * (PNG/JPEG/BMP/GIF, including multi-frame animated GIF) and
  * javax.sound.sampled (WAV/PCM) — upgrading the multimodal path from
  * an honest stub to an actual decode stage. The animated-GIF path
  * gives the video stage (frame count, duration from per-frame delays,
  * stride frame-sampling over real pixel rasters) a genuinely decoded
  * container; other video codecs (H.264 etc.) stay out of scope — the
  * JDK ships no codec for them.
  *
  * These are deliberately Scala UDFs, not Catalyst expressions: a codec
  * is irreducibly procedural JVM work (the same boundary a production
  * pipeline crosses into libjpeg/ffmpeg), and it runs scan-side on
  * executors — the plumbing around it stays columnar and distributed.
  *
  * Determinism contract (what lets the DuckDB oracle verify a REAL
  * codec end-to-end): PNG is lossless and WAV is raw PCM, so a
  * solid-color image decodes to exactly its fill color and a square
  * wave's RMS is exactly its amplitude — the decoded stats are pure
  * integer arithmetic of the generator parameters, re-derivable in SQL.
  */
object MediaCodecs {

  final case class ImageStats(width: Int, height: Int,
      mean_r: Int, mean_g: Int, mean_b: Int)

  final case class AudioStats(sample_rate: Int, n_frames: Long,
      duration_ms: Long, rms: Long)

  /** Encode a solid-color PNG (the deterministic generator side). */
  def encodePngBytes(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-supported image: dimensions + mean channel
    * values (rounded down — exact for solid fills).
    */
  def decodeImageStats(bytes: Array[Byte]): ImageStats = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "media: undecodable image bytes")
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    ImageStats(w, h, (sr / n).toInt, (sg / n).toInt, (sb / n).toInt)
  }

  /** Real resize through Graphics2D + PNG re-encode, preserving aspect
    * ratio with the long side clamped to `maxSide`.
    */
  def resizeImageBytes(bytes: Array[Byte], maxSide: Int): Array[Byte] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "media: undecodable image bytes")
    val long0 = math.max(img.getWidth, img.getHeight)
    if (long0 <= maxSide) return bytes
    val w = math.max(1, img.getWidth * maxSide / long0)
    val h = math.max(1, img.getHeight * maxSide / long0)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g2 = out.createGraphics()
    try g2.drawImage(img.getScaledInstance(w, h,
      java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
    finally g2.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Encode a 16-bit mono PCM WAV square wave: `nFrames` samples of
    * ±`amplitude` alternating every `halfPeriod` frames.
    */
  def encodeWavBytes(sampleRate: Int, nFrames: Int, amplitude: Int,
      halfPeriod: Int): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = if ((i / halfPeriod) % 2 == 0) amplitude else -amplitude
      pcm(2 * i) = (v & 0xff).toByte          // little-endian
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV: format metadata + integer RMS of the samples (exact
    * for square waves).
    */
  def decodeWavStats(bytes: Array[Byte]): AudioStats = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"media: only 16-bit mono PCM wav supported, got $fmt")
      val nFrames = ais.getFrameLength
      val data = ais.readAllBytes()
      var sumSq = 0.0
      var i = 0
      while (i + 1 < data.length) {
        val v = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toDouble
        sumSq += v * v
        i += 2
      }
      val n = data.length / 2
      val rms = if (n == 0) 0L else math.round(math.sqrt(sumSq / n))
      AudioStats(fmt.getSampleRate.toInt, nFrames,
        nFrames * 1000L / fmt.getSampleRate.toInt, rms)
    } finally ais.close()
  }

  // ------------------------------------------------- multi-frame GIF

  final case class FrameStats(frame_idx: Int, mean_r: Int, mean_g: Int,
      mean_b: Int)

  final case class VideoStats(width: Int, height: Int, n_frames: Int,
      duration_ms: Long)

  /** Encode a REAL animated GIF (the one multi-frame container the
    * JDK's ImageIO both reads and writes): `nFrames` solid-color full
    * frames where frame k's channels are `(c0 + k*step) % 256`, each
    * with a GraphicControlExtension `delayTime` of `delayCs`
    * centiseconds. GIF palettes are lossless for solid fills, so the
    * decoded per-frame stats are pure integer arithmetic of the
    * generator parameters — oracle-verifiable like the PNG/WAV paths.
    */
  def encodeGifBytes(w: Int, h: Int, nFrames: Int, r0: Int, g0: Int,
      b0: Int, step: Int, delayCs: Int): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var k = 0
    while (k < nFrames) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val rgb = (((r0 + k * step) % 256) << 16) |
        (((g0 + k * step) % 256) << 8) | ((b0 + k * step) % 256)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val meta = writer.getDefaultImageMetadata(
        new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = {
        var found: IIOMetadataNode = null
        var n = root.getFirstChild
        while (n != null && found == null) {
          if (n.getNodeName == "GraphicControlExtension")
            found = n.asInstanceOf[IIOMetadataNode]
          n = n.getNextSibling
        }
        if (found == null) {
          val g = new IIOMetadataNode("GraphicControlExtension")
          root.appendChild(g); g
        } else found
      }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("transparentColorIndex", "0")
      gce.setAttribute("delayTime", delayCs.toString)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
      k += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  private def gifReader(bytes: Array[Byte]) = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(
      ImageIO.createImageInputStream(new ByteArrayInputStream(bytes)))
    reader
  }

  /** Container-level stats: dimensions, frame count, and total duration
    * summed from each frame's GraphicControlExtension delay.
    */
  def decodeGifStats(bytes: Array[Byte]): VideoStats = {
    val reader = gifReader(bytes)
    try {
      val n = reader.getNumImages(true)
      require(n > 0, "media: gif with no frames")
      var durCs = 0L
      var i = 0
      while (i < n) {
        val meta = reader.getImageMetadata(i)
        val root = meta.getAsTree(meta.getNativeMetadataFormatName)
        var node = root.getFirstChild
        while (node != null) {
          if (node.getNodeName == "GraphicControlExtension")
            durCs += node.getAttributes.getNamedItem("delayTime")
              .getNodeValue.toLong
          node = node.getNextSibling
        }
        i += 1
      }
      VideoStats(reader.getWidth(0), reader.getHeight(0), n, durCs * 10L)
    } finally reader.dispose()
  }

  /** REAL frame sampling: decode every `stride`-th frame of the GIF and
    * return its per-frame mean channel stats — the multimodal
    * frame-sample stage operating on actual pixel rasters.
    */
  def sampleGifFrames(bytes: Array[Byte],
      stride: Int): Seq[FrameStats] = {
    val reader = gifReader(bytes)
    try {
      val n = reader.getNumImages(true)
      (0 until n by math.max(1, stride)).map { i =>
        val img = reader.read(i)
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val cnt = w.toLong * h
        FrameStats(i, (sr / cnt).toInt, (sg / cnt).toInt,
          (sb / cnt).toInt)
      }
    } finally reader.dispose()
  }

  // ------------------------------------------------------ column API

  val encodePng = udf(encodePngBytes _)
  val decodeImage = udf(decodeImageStats _)
  val resizeImage = udf(resizeImageBytes _)
  val encodeWav = udf(encodeWavBytes _)
  val decodeWav = udf(decodeWavStats _)
  val encodeGif = udf(encodeGifBytes _)
  val decodeGif = udf(decodeGifStats _)
  val sampleFrames = udf(sampleGifFrames _)

  /** Decoded-pixel pooled features: grayscale mean over a `grid`×`grid`
    * tiling of the REAL pixel raster — the standard cheap visual
    * embedding, bounded output size regardless of input dimensions.
    */
  def pooledFeaturesBytes(bytes: Array[Byte], grid: Int): Array[Double] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "media: undecodable image bytes")
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val gray = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 +
          (p & 0xff) * 114) / 1000
        val cell = math.min(grid - 1, y * grid / h) * grid +
          math.min(grid - 1, x * grid / w)
        sums(cell) += gray; counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(grid * grid)(i =>
      if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i) / 255.0)
  }

  val pooledFeatures = udf(pooledFeaturesBytes _)

  def pooledFeaturesCol(content: Column, grid: Int): Column =
    pooledFeatures(content, org.apache.spark.sql.functions.lit(grid))
}
