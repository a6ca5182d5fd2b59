package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (BASELINE.json north_star): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs batched per partition.
  *
  * The decode kernels are REAL for images and audio: [[decodeImage]] uses
  * `javax.imageio` (ships in the JDK — PNG/JPEG/GIF/BMP) to produce
  * (width, height, channel count, per-channel means); [[decodeAudio]] uses
  * `javax.sound.sampled` (WAV/AIFF/AU) to produce (sample rate, channels,
  * frames, RMS amplitude). Payloads neither codec reads fall back to
  * deterministic byte-histogram features ([[byteHistogramFeatures]]), so
  * the pipeline never throws on mixed-modality corpora. Video would slot
  * into the same kernel shape (no video codec ships in the JDK).
  *
  * Scale notes: payloads never pass through a shuffle in this pipeline —
  * decode is a narrow per-partition map; metadata-only operations
  * (filtering by media_type/size) prune on the struct without touching the
  * bytes, and Parquet stores the binary column separately so a
  * metadata-only query never reads payload pages.
  */
object Multimodal {

  /** Media metadata carried beside every payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  val FeatureDim = 8

  /** Decoded-raster budget: payloads whose header declares more pixels than
    * this are rejected before rasterizing. An untrusted crawl can carry
    * decompression bombs — a few-KB PNG declaring 100k×100k would otherwise
    * allocate a ~40 GB raster and take down the executor. 64 MPix ≈ 256 MB
    * of INT_RGB raster, comfortably inside an executor task's share. */
  val DefaultMaxPixels: Long = 64L * 1024 * 1024

  /** Wrap a binary column with its typed metadata struct. */
  def withMediaMetadata(df: DataFrame, binCol: String, mediaType: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("checksum")))

  /** Decoded-image summary: dimensions, raster band count, per-band means
    * normalized to [0, 1] (band order is the raster's — R,G,B[,A] for the
    * common types). */
  final case class ImageInfo(
      width: Int, height: Int, bands: Int, means: Array[Double])

  /** Real image decode via `javax.imageio` (JDK built-in readers: PNG, JPEG,
    * GIF, BMP, WBMP). Returns None for null/empty/non-image payloads —
    * ImageIO sniffs magic bytes, so text or audio bytes reject in O(1)
    * without a full parse. Corrupt/truncated images also map to None (a
    * 100 TB crawl WILL contain broken files; one bad payload must not kill
    * a 10k-partition stage) — but only via [[scala.util.control.NonFatal]]:
    * OutOfMemoryError and task-kill interrupts propagate, so a fatal error
    * fails the task instead of continuing on a corrupted heap.
    *
    * The header is peeked (`ImageReader.getWidth/getHeight` read metadata
    * only) and payloads declaring more than `maxPixels` pixels are rejected
    * BEFORE the O(w·h) rasterization — the decompression-bomb guard. */
  def decodeImage(bytes: Array[Byte],
      maxPixels: Long = DefaultMaxPixels): Option[ImageInfo] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
          val img = reader.read(0)
          if (img == null) return None
          val raster = img.getRaster
          val nb = raster.getNumBands
          val sums = new Array[Double](nb)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < nb) { sums(b) += raster.getSampleDouble(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          val n = w.toDouble * h * 255.0
          Some(ImageInfo(w, h, nb, sums.map(_ / n)))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Fallback kernel for payloads no installed codec understands:
    * deterministic byte-histogram moments. Keeps mixed-modality corpora
    * total — every payload yields a feature vector. */
  def byteHistogramFeatures(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(FeatureDim)(0f)
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255f
      i += 1
    }
    var d = 0
    while (d < FeatureDim) { out(d) /= bytes.length; d += 1 }
    out
  }

  /** Codec kernel: image payloads decode to
    * `[width, height, bands, mean_0, mean_1, ..]` (means in [0,1], zero-pad
    * to [[FeatureDim]]); everything else falls back to
    * [[byteHistogramFeatures]]. */
  def decodeFeatures(bytes: Array[Byte]): Array[Float] =
    decodeImage(bytes) match {
      case Some(info) =>
        val out = new Array[Float](FeatureDim)
        out(0) = info.width.toFloat
        out(1) = info.height.toFloat
        out(2) = info.bands.toFloat
        var i = 0
        val n = math.min(info.means.length, FeatureDim - 3)
        while (i < n) { out(3 + i) = info.means(i).toFloat; i += 1 }
        out
      case None => byteHistogramFeatures(bytes)
    }

  /** Batched per-partition feature extraction over a binary column — the
    * Scala analogue of a Pandas `mapInPandas` decode stage: one iterator
    * pass per partition, no per-row task overhead, payload stays off the
    * driver. Appends `features: array<float>`. */
  def extractFeatures(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        Row.fromSeq(row.toSeq :+ decodeFeatures(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Encode a solid-colour RGB PNG (test/fixture generator — the inverse of
    * [[decodeImage]], also pure JDK). */
  def encodeSolidPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Distributed PNG synthesis: append `outCol: binary` holding a solid
    * PNG of per-row (width, height, r, g, b) — executor-side via the same
    * per-partition batched map as [[extractFeatures]]. Exists so decode
    * pipelines can be driven at any SF without shipping image fixtures. */
  def synthesizePngs(df: DataFrame, widthCol: String, heightCol: String,
      rCol: String, gCol: String, bCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val Seq(wi, hi, ri, gi, bi) =
      Seq(widthCol, heightCol, rCol, gCol, bCol).map(df.schema.fieldIndex)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        Row.fromSeq(row.toSeq :+ encodeSolidPng(
          row.getInt(wi), row.getInt(hi),
          row.getInt(ri), row.getInt(gi), row.getInt(bi)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decoded-audio summary: format header + RMS amplitude over all PCM
    * samples. */
  final case class AudioInfo(
      sampleRate: Int, channels: Int, frames: Long, rms: Double)

  /** Real audio decode via `javax.sound.sampled` (JDK built-in readers:
    * WAV, AIFF, AU): header metadata + one pass over the PCM frames for
    * RMS amplitude. None for payloads no installed reader understands or
    * for non-PCM encodings; never throws (same total-function contract as
    * [[decodeImage]]). */
  def decodeAudio(bytes: Array[Byte]): Option[AudioInfo] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!signed || fmt.getSampleSizeInBits != 16) return None
        val channels = fmt.getChannels
        val frameBytes = fmt.getFrameSize
        val big = fmt.isBigEndian
        val buf = new Array[Byte](frameBytes * 1024)
        var sumSq = 0.0
        var nSamples = 0L
        var read = in.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 1 < read) {
            val s =
              if (big) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
              else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
            sumSq += s.toDouble * s
            nSamples += 1
            i += 2
          }
          read = in.read(buf)
        }
        if (nSamples == 0) return None
        Some(AudioInfo(fmt.getSampleRate.toInt, channels,
          nSamples / channels, math.sqrt(sumSq / nSamples)))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode 16-bit signed little-endian mono PCM as WAV (test/fixture
    * generator — the inverse of [[decodeAudio]], also pure JDK). */
  def encodePcmWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Batched per-partition audio decode: appends a nullable
    * `audio: struct(sample_rate, channels, n_frames, rms)` column (null
    * where the payload is not decodable audio). Same narrow
    * `mapPartitions` shape as [[extractFeatures]]. */
  def extractAudioInfo(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val audioType = StructType(Seq(
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val outSchema = StructType(df.schema.fields :+
      StructField("audio", audioType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val info = decodeAudio(row.getAs[Array[Byte]](binIdx))
          .map(a => Row(a.sampleRate, a.channels, a.frames, a.rms))
          .orNull
        Row.fromSeq(row.toSeq :+ info)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Distributed WAV synthesis: append `outCol: binary` holding constant-
    * amplitude mono PCM of per-row (sampleRate, nFrames, amplitude) —
    * executor-side, the audio twin of [[synthesizePngs]]. */
  def synthesizeWavs(df: DataFrame, rateCol: String, framesCol: String,
      ampCol: String, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, BinaryType, nullable = false))
    val Seq(ri, fi, ai) =
      Seq(rateCol, framesCol, ampCol).map(df.schema.fieldIndex)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val amp = row.getInt(ai).toShort
        Row.fromSeq(row.toSeq :+ encodePcmWav(
          row.getInt(ri), Array.fill(row.getInt(fi))(amp)))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling stub for video-like payloads: split the payload into
    * `frameSize`-byte "frames" and keep every `stride`-th — the plumbing
    * (explode to one row per sampled frame, frame index column) is the real
    * shape; the byte-slicing stands in for actual frame decode. */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col(binCol)) / frameSize).cast("int")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .withColumn("frame_bytes",
        expr(s"substring($binCol, frame_idx * $frameSize + 1, $frameSize)"))
  }
}
