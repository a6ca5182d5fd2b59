package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Checkpointer

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

  // javax.imageio defaults to a DISK-backed stream cache: every
  // createImageInputStream / ImageIO.write call materializes (and
  // deletes) a temp FILE, so each tiny in-memory decode/encode pays two
  // filesystem metadata round-trips. Every payload here is a bounded
  // in-memory byte array (the decompression-bomb budgets cap raster
  // size), so the memory cache is strictly better. JVM-global, set once
  // when this object loads — executors load it before any kernel runs.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Resampled-audio budget: outputs whose frame count exceeds this are
    * rejected before allocating — 64 M mono 16-bit frames ≈ 128 MB,
    * same order as the decoded-raster budget. Also keeps the frame count
    * far from Int overflow. */
  val DefaultMaxFrames: Long = 64L * 1024 * 1024

  /** Wrap a binary column with its typed metadata struct. */
  def withMediaMetadata(df: DataFrame, binCol: String, mediaType: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("checksum")))

  /** Ingest raw media FILES into the opaque-binary-column shape every
    * operator here consumes, via Spark's built-in `binaryFile` source
    * — the on-ramp from a crawl/export directory (no row-at-a-time
    * driver loop, no custom reader): one row per file with `path`,
    * `file_name`, `mtime_sec`, the payload `bytes`, and the
    * [[withMediaMetadata]] struct.
    *
    * Scale notes (100 TB): the `length <= maxBytes` guard is PUSHED
    * INTO THE SOURCE (binaryFile supports length/path pushdown), so
    * oversized files are skipped from directory metadata without
    * reading a byte — the ingest-side twin of the decoders'
    * decompression-bomb guards; `pathGlobFilter` prunes non-media
    * files the same way. Listing parallelizes across executors
    * (spark.sql.sources.parallelPartitionDiscovery), and each file
    * lands whole in one task — binary payloads never split or
    * shuffle here. */
  def ingestBinaryFiles(spark: SparkSession, dir: String,
      glob: String = "*", mediaType: String = "image",
      maxBytes: Long = 64L * 1024 * 1024): DataFrame = {
    require(maxBytes > 0, "maxBytes must be positive")
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .filter(col("length") <= maxBytes)
    withMediaMetadata(
      raw.select(col("path"),
        element_at(split(col("path"), "/"), -1).as("file_name"),
        col("modificationTime").cast("long").as("mtime_sec"),
        col("content").as("bytes")),
      "bytes", mediaType)
  }

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

  /** Real image resize: decode (same header-peek decompression-bomb guard
    * as [[decodeImage]]), scale to `width × height` with NEAREST-NEIGHBOR
    * interpolation (deterministic across JVMs — no filtering kernel
    * variation), re-encode as PNG onto an RGB raster (alpha is dropped).
    * None for null/non-image/corrupt/over-budget payloads — the same
    * total-function contract as every decoder here. */
  def resizeImage(bytes: Array[Byte], width: Int, height: Int,
      maxPixels: Long = DefaultMaxPixels): Option[Array[Byte]] = {
    require(width >= 1 && height >= 1, "target dimensions must be >= 1")
    require(width.toLong * height <= maxPixels,
      "target raster exceeds the pixel budget")
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
          val out = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
            g.drawImage(img, 0, 0, width, height, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed resize over a binary column: appends `outCol: binary`
    * holding the re-encoded PNG (null where the payload didn't decode).
    * Same stays-in-Catalyst UDF shape as [[extractFeatures]] — the
    * standard pre-processing step before a vision-model training
    * pipeline, so payload bytes shrink BEFORE any shuffle/export. */
  def resizeImages(df: DataFrame, binCol: String, width: Int, height: Int,
      outCol: String): DataFrame = {
    val resize = udf((bytes: Array[Byte]) => resizeImage(bytes, width, height))
    df.withColumn(outCol, resize(col(binCol)))
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

  /** Distributed feature extraction over a binary column — the decode
    * stage a Pandas `mapInPandas` would run, as a Scala UDF so the plan
    * STAYS inside Catalyst: no `df.rdd` round-trip, so column pruning and
    * filter pushdown flow through the decode (a downstream
    * `select(features)` still prunes the other source columns at the
    * scan), and the surrounding projections keep whole-stage codegen.
    * Appends `features: array<float>`.
    *
    * The UDF is DELIBERATELY left deterministic: marking it
    * nondeterministic would stop Catalyst duplicating the decode into a
    * filter that references `features`, but it would also block EVERY
    * filter (e.g. on an id or metadata column) from pushing through this
    * projection to the scan — decoding the whole corpus to answer a
    * filtered query, the far worse trade at 100 TB. If you filter
    * directly on decoded output, materialize (persist/checkpoint) the
    * result first so the decode runs once. Applies to every decode/encode
    * column in this object. */
  def extractFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("features", featuresUdf(col(binCol)))

  private val featuresUdf =
    udf((bytes: Array[Byte]) => decodeFeatures(bytes))

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
      rCol: String, gCol: String, bCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, pngUdf(
      col(widthCol), col(heightCol), col(rCol), col(gCol), col(bCol)))

  private val pngUdf = udf(
    (w: Int, h: Int, r: Int, g: Int, b: Int) => encodeSolidPng(w, h, r, g, b))

  /** 64-bit perceptual difference hash (dHash) of an image payload —
    * the missing dedup modality (text has MinHash/SimHash, embeddings
    * have SemDeDup; this covers the IMAGE bytes themselves). The
    * classic dHash: box-average the decoded raster onto a 9×8
    * luminance grid, then bit r·8+c = 1 iff cell (r, c+1) is brighter
    * than cell (r, c) — 8 horizontal gradient signs per row × 8 rows.
    * Gradient SIGNS survive re-encoding, uniform brightness/contrast
    * shifts, and small resizes, so near-identical images land within a
    * few Hamming bits while distinct images are ~32 bits apart — the
    * same fingerprint geometry as text SimHash, which is why the
    * banding machinery is shared ([[Dedup.simhashNearDups]]).
    *
    * Exact-integer discipline: cell luminance totals accumulate raw
    * band samples into a Long in fixed raster order, and the
    * brighter-than compare cross-multiplies totals by pixel counts
    * (`sumR·areaL > sumL·areaR`) — no float averages, so the hash is
    * bit-reproducible across JVMs and partitionings. Cells are the
    * floor-boundary grid `[⌊c·w/9⌋, ⌊(c+1)·w/9⌋)`; images narrower
    * than the grid re-sample the single spanning pixel (a degenerate
    * cell widens to one pixel). Same decompression-bomb guard and
    * total-function contract as [[decodeImage]]: None for
    * null/corrupt/over-budget payloads, never throws. */
  def dHash64(bytes: Array[Byte],
      maxPixels: Long = DefaultMaxPixels): Option[Long] = {
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
          // sums(r)(c): summed luminance of grid cell (r, c); areas: its
          // pixel count (cells differ by ±1 column/row of pixels when
          // w % 9 != 0 — the cross-multiplied compare stays exact)
          val sums = Array.ofDim[Long](8, 9)
          val areas = Array.ofDim[Long](8, 9)
          var gr = 0
          while (gr < 8) {
            val y0 = (gr.toLong * h / 8).toInt
            val y1 = math.max(y0 + 1, ((gr + 1).toLong * h / 8).toInt)
              .min(h)
            var gc = 0
            while (gc < 9) {
              val x0 = (gc.toLong * w / 9).toInt
              val x1 = math.max(x0 + 1, ((gc + 1).toLong * w / 9).toInt)
                .min(w)
              var s = 0L
              var y = y0
              while (y < math.max(y1, y0 + 1)) {
                val yy = math.min(y, h - 1)
                var x = x0
                while (x < math.max(x1, x0 + 1)) {
                  val xx = math.min(x, w - 1)
                  var b = 0
                  while (b < nb) { s += raster.getSample(xx, yy, b); b += 1 }
                  x += 1
                }
                y += 1
              }
              sums(gr)(gc) = s
              areas(gr)(gc) =
                (math.max(y1, y0 + 1) - y0).toLong *
                  (math.max(x1, x0 + 1) - x0)
              gc += 1
            }
            gr += 1
          }
          var hash = 0L
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              if (sums(r)(c + 1) * areas(r)(c) >
                  sums(r)(c) * areas(r)(c + 1))
                hash |= 1L << (r * 8 + c)
              c += 1
            }
            r += 1
          }
          Some(hash)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed [[dHash64]] over a binary column: (idCol, `simhash`) —
    * the output column is NAMED for [[Dedup.simhashNearDups]]'s banding
    * contract, because an image fingerprint IS a 64-bit Hamming-space
    * point exactly like a text SimHash. Payloads that don't decode are
    * dropped (no fingerprint — same rule as null-text docs in
    * [[Dedup.simhash64]]). Narrow per-partition decode; the payload
    * bytes never shuffle. */
  def imageHashes(df: DataFrame, binCol: String, idCol: String): DataFrame =
    df.select(col(idCol), dhashUdf(col(binCol)).as("simhash"))
      .filter(col("simhash").isNotNull)

  private val dhashUdf = udf((bytes: Array[Byte]) => dHash64(bytes))

  /** Image near-duplicate pairs: [[imageHashes]] →
    * [[Dedup.simhashNearDups]] Hamming blocking — lossless banded
    * candidate generation (pigeonhole over maxHamming+1 bands), never
    * all-pairs; output (id_a, id_b, hamming). The default radius 2 is
    * tighter than text's 3: 64 gradient signs flip more reluctantly
    * than token votes, so re-encoded/brightness-shifted copies sit at
    * Hamming 0-2 while unrelated images are ~32 apart. */
  def imageNearDups(df: DataFrame, binCol: String, idCol: String,
      maxHamming: Int = 2, materialize: Boolean = true,
      ckpt: Checkpointer = Checkpointer.Local): DataFrame =
    Dedup.simhashNearDups(imageHashes(df, binCol, idCol), idCol,
      maxHamming, materialize, ckpt)

  /** Encode the 9×8 gray PNG whose [[dHash64]] is EXACTLY `code` —
    * the oracle-expressible fixture generator for the image-dedup
    * queries (the [[encodeSolidPng]] discipline, but for dHash: a
    * solid image hashes to 0, so patterns carry the signal). Row r is
    * a brightness walk from 128 stepping ±8 per column as bit r·8+c
    * of `code` directs; the grid is exactly one pixel per dHash cell,
    * r=g=b keeps luminance proportional to the written value, and ±8
    * steps make every adjacent compare strict — so the hash reads the
    * code back bit-for-bit and near-dup structure becomes pure
    * integer arithmetic on the codes (DuckDB-checkable). */
  def encodeDhashPatternPng(code: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var v = 128
      img.setRGB(0, r, (v << 16) | (v << 8) | v)
      var c = 0
      while (c < 8) {
        v += (if (((code >>> (r * 8 + c)) & 1L) == 1L) 8 else -8)
        img.setRGB(c + 1, r, (v << 16) | (v << 8) | v)
        c += 1
      }
      r += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Distributed [[encodeDhashPatternPng]] over a long code column. */
  def synthesizeDhashPatternPngs(df: DataFrame, codeCol: String,
      outCol: String): DataFrame =
    df.withColumn(outCol, dhashPatternUdf(col(codeCol)))

  private val dhashPatternUdf =
    udf((code: Long) => encodeDhashPatternPng(code))

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

  /** Real audio resample to `targetRate` by nearest-neighbor frame
    * selection (output frame j reads input frame ⌊j·inRate/outRate⌋ —
    * deterministic integer arithmetic, no filter kernel), re-encoded as
    * 16-bit PCM WAV. Output frame count is ⌊frames·outRate/inRate⌋.
    * Multi-channel input is averaged to mono first (the common
    * speech-pipeline normalization). None for payloads [[decodeAudio]]
    * would reject, and for outputs whose frame count would exceed
    * `maxFrames` — the audio twin of [[DefaultMaxPixels]]: a small WAV
    * upsampled to an absurd rate must not allocate an unbounded buffer,
    * and the count itself is kept in Long so it cannot wrap. The INPUT
    * is budgeted too, from the header's declared frame count, before
    * any PCM materializes (same bound). The JDK's
    * own converters refuse arbitrary rate changes, so the mapping is
    * explicit — which is also what makes it reproducible anywhere. */
  def resampleAudio(bytes: Array[Byte], targetRate: Int,
      maxFrames: Long = DefaultMaxFrames): Option[Array[Byte]] = {
    require(targetRate >= 1, "targetRate must be >= 1")
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val signed =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!signed || fmt.getSampleSizeInBits != 16) return None
        val channels = fmt.getChannels
        val inRate = fmt.getSampleRate.toInt
        if (inRate <= 0) return None
        val big = fmt.isBigEndian
        // Input-side bomb guard (same budget as the output): reject
        // from the header's declared frame count before materializing.
        if (in.getFrameLength <= 0 || in.getFrameLength > maxFrames)
          return None
        val raw = in.readAllBytes()
        val nFrames = raw.length / fmt.getFrameSize
        if (nFrames == 0) return None
        // mono mix-down, then nearest-neighbor index map
        val mono = new Array[Short](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0L
          var c = 0
          while (c < channels) {
            val i = f * fmt.getFrameSize + c * 2
            val s =
              if (big) ((raw(i) << 8) | (raw(i + 1) & 0xff)).toShort
              else ((raw(i + 1) << 8) | (raw(i) & 0xff)).toShort
            acc += s
            c += 1
          }
          mono(f) = (acc / channels).toShort
          f += 1
        }
        val nOutL = (nFrames.toLong * targetRate) / inRate
        if (nOutL == 0 || nOutL > maxFrames) return None
        val nOut = nOutL.toInt
        val out = new Array[Short](nOut)
        var j = 0
        while (j < nOut) {
          out(j) = mono(((j.toLong * inRate) / targetRate).toInt)
          j += 1
        }
        Some(encodePcmWav(targetRate, out))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed resample over a binary column: appends `outCol: binary`
    * (null where not decodable) — the audio twin of [[resizeImages]],
    * same stays-in-Catalyst UDF shape. */
  def resampleAudios(df: DataFrame, binCol: String, targetRate: Int,
      outCol: String): DataFrame = {
    val resample = udf((bytes: Array[Byte]) => resampleAudio(bytes, targetRate))
    df.withColumn(outCol, resample(col(binCol)))
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

  /** Output-struct row of [[extractAudioInfo]] — field names are the
    * column contract. */
  final case class AudioColumn(
      sample_rate: Int, channels: Int, n_frames: Long, rms: Double)

  /** Distributed audio decode: appends a nullable
    * `audio: struct(sample_rate, channels, n_frames, rms)` column (null
    * where the payload is not decodable audio). Same stays-in-Catalyst
    * UDF shape as [[extractFeatures]]. */
  def extractAudioInfo(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("audio", audioUdf(col(binCol)))

  private val audioUdf = udf((bytes: Array[Byte]) =>
    decodeAudio(bytes).map(a =>
      AudioColumn(a.sampleRate, a.channels, a.frames, a.rms)))

  /** Distributed WAV synthesis: append `outCol: binary` holding constant-
    * amplitude mono PCM of per-row (sampleRate, nFrames, amplitude) —
    * executor-side, the audio twin of [[synthesizePngs]]. */
  def synthesizeWavs(df: DataFrame, rateCol: String, framesCol: String,
      ampCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, wavUdf(col(rateCol), col(framesCol), col(ampCol)))

  private val wavUdf = udf((rate: Int, frames: Int, amp: Int) =>
    encodePcmWav(rate, Array.fill(frames)(amp.toShort)))

  /** 64-bit audio perceptual fingerprint — the audio member of the
    * dedup-fingerprint family ([[dHash64]] for images,
    * [[Dedup.simhash64]] for text): an energy-envelope dHash over the
    * mono PCM. The signal is mixed to mono (the [[resampleAudio]]
    * normalization), cut into a row-major 8×9 grid of 72 equal time
    * slices (row r = coarse segment, column c = its 9 sub-windows in
    * time order), each cell accumulating the EXACT Long sum of
    * |sample|; bit r·8+c is the sign of the horizontal envelope
    * gradient, compared cross-multiplied by cell frame counts
    * (`sumR·nL > sumL·nR`) — no float averages, so the fingerprint is
    * bit-reproducible across JVMs and partitionings. The envelope
    * shape survives uniform gain (both sides of every compare scale
    * together) and nearest-neighbor resampling (frame duplication and
    * selection preserve per-slice means), so re-encoded / re-leveled /
    * resampled copies land within a few Hamming bits while unrelated
    * audio is ~32 apart — the same fingerprint geometry as text
    * SimHash, which is why the banding machinery is shared
    * ([[graft.operators.Dedup.simhashNearDups]]). Clips shorter than
    * the grid widen degenerate cells to one frame (the [[dHash64]]
    * rule). Same total-function contract as [[decodeAudio]]: None for
    * null / corrupt / non-16-bit-PCM payloads and for clips longer
    * than `maxFrames`; never throws. */
  def audioHash64(bytes: Array[Byte],
      maxFrames: Long = DefaultMaxFrames): Option[Long] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val signed =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!signed || fmt.getSampleSizeInBits != 16) return None
        val channels = fmt.getChannels
        val big = fmt.isBigEndian
        // Guard BEFORE materializing: the header's frame length is
        // known for the container formats the JDK reads (WAV/AIFF/AU),
        // so an over-budget payload is rejected without allocating its
        // PCM — the decodeImage bomb-guard discipline.
        val declared = in.getFrameLength
        if (declared <= 0 || declared > maxFrames) return None
        val raw = in.readAllBytes()
        val nFrames = raw.length / fmt.getFrameSize
        if (nFrames == 0 || nFrames.toLong > maxFrames) return None
        val mono = new Array[Long](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0L
          var c = 0
          while (c < channels) {
            val i = f * fmt.getFrameSize + c * 2
            val s =
              if (big) ((raw(i) << 8) | (raw(i + 1) & 0xff)).toShort
              else ((raw(i + 1) << 8) | (raw(i) & 0xff)).toShort
            acc += s
            c += 1
          }
          mono(f) = math.abs(acc / channels)
          f += 1
        }
        // sums(i)/ns(i): |amplitude| total and frame count of time
        // slice i of 72 (row-major 8 rows × 9 columns)
        val sums = new Array[Long](72)
        val ns = new Array[Long](72)
        var i = 0
        while (i < 72) {
          val x0 = (i.toLong * nFrames / 72).toInt
          val x1 = math.max(x0 + 1, ((i + 1).toLong * nFrames / 72).toInt)
            .min(nFrames)
          var s = 0L
          var x = x0
          while (x < math.max(x1, x0 + 1)) {
            s += mono(math.min(x, nFrames - 1))
            x += 1
          }
          sums(i) = s
          ns(i) = (math.max(x1, x0 + 1) - x0).toLong
          i += 1
        }
        var hash = 0L
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            val l = r * 9 + c
            if (sums(l + 1) * ns(l) > sums(l) * ns(l + 1))
              hash |= 1L << (r * 8 + c)
            c += 1
          }
          r += 1
        }
        Some(hash)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed [[audioHash64]] over a binary column: (idCol,
    * `simhash`) — output column NAMED for
    * [[graft.operators.Dedup.simhashNearDups]]'s banding contract (an
    * audio fingerprint IS a 64-bit Hamming-space point exactly like a
    * text SimHash or image dHash). Undecodable payloads are dropped;
    * narrow per-partition decode, the payload bytes never shuffle. */
  def audioHashes(df: DataFrame, binCol: String, idCol: String): DataFrame =
    df.select(col(idCol), audioHashUdf(col(binCol)).as("simhash"))
      .filter(col("simhash").isNotNull)

  private val audioHashUdf = udf((bytes: Array[Byte]) => audioHash64(bytes))

  /** Audio near-duplicate pairs: [[audioHashes]] →
    * [[graft.operators.Dedup.simhashNearDups]] Hamming blocking —
    * lossless banded candidate generation, never all-pairs; output
    * (id_a, id_b, hamming). Radius 2 matches [[imageNearDups]]: 64
    * envelope-gradient signs flip reluctantly, so re-encoded /
    * resampled copies sit at Hamming 0–2 while unrelated clips are
    * ~32 apart. */
  def audioNearDups(df: DataFrame, binCol: String, idCol: String,
      maxHamming: Int = 2, materialize: Boolean = true,
      ckpt: Checkpointer = Checkpointer.Local): DataFrame =
    Dedup.simhashNearDups(audioHashes(df, binCol, idCol), idCol,
      maxHamming, materialize, ckpt)

  /** Encode the mono WAV whose [[audioHash64]] is EXACTLY `code` — the
    * oracle-expressible fixture generator for the audio-dedup queries
    * (the [[encodeDhashPatternPng]] discipline for sound: constant
    * audio hashes to 0, so amplitude patterns carry the signal). Each
    * of the 8 rows is an amplitude walk from 1024 stepping ±64 per
    * column as bit r·8+c of `code` directs; every cell is
    * `framesPerCell` constant-amplitude frames aligned exactly with
    * the 72-slice grid, amplitudes stay in [512, 1536] (no clipping,
    * always positive so |s| = s), and ±64 steps make every adjacent
    * compare strict — the hash reads the code back bit-for-bit and
    * near-dup structure becomes pure integer arithmetic on the codes
    * (DuckDB-checkable). */
  def encodeAudioPatternWav(code: Long, framesPerCell: Int = 8,
      sampleRate: Int = 8000): Array[Byte] = {
    require(framesPerCell >= 1, "framesPerCell must be >= 1")
    val out = new Array[Short](72 * framesPerCell)
    var r = 0
    while (r < 8) {
      var v = 1024
      var c = 0
      while (c < 9) {
        if (c > 0)
          v += (if (((code >>> (r * 8 + c - 1)) & 1L) == 1L) 64 else -64)
        var k = 0
        while (k < framesPerCell) {
          out((r * 9 + c) * framesPerCell + k) = v.toShort
          k += 1
        }
        c += 1
      }
      r += 1
    }
    encodePcmWav(sampleRate, out)
  }

  /** Distributed [[encodeAudioPatternWav]] over a long code column. */
  def synthesizeAudioPatternWavs(df: DataFrame, codeCol: String,
      outCol: String): DataFrame =
    df.withColumn(outCol, audioPatternUdf(col(codeCol)))

  private val audioPatternUdf =
    udf((code: Long) => encodeAudioPatternWav(code))

  /** Output-struct row of [[extractAudioQuality]] — field names are
    * the column contract. All EXACT integer counts over the raw
    * 16-bit samples (every channel, no mixdown — clipping is a
    * per-sample event), so quality verdicts are bit-reproducible:
    * `n_clipped` counts full-scale samples (±32767/−32768 — a spike
    * means hot mastering or transcoding damage), `n_silent` counts
    * |s| ≤ threshold (silence/dropout fraction), `peak` is max |s|
    * (headroom), `sum_abs` the |amplitude| total (mean level =
    * sum_abs / n_samples, left to the caller — keeping the struct
    * integer-exact). */
  final case class AudioQuality(n_samples: Long, n_clipped: Long,
      n_silent: Long, peak: Long, sum_abs: Long)

  /** Per-payload audio quality triage stats — the decode-side
    * companion to [[decodeAudio]]'s RMS: one streaming pass over the
    * PCM, integer-exact counts only (see [[AudioQuality]]). Same
    * total-function contract: None for null / corrupt / non-16-bit
    * PCM payloads; never throws. */
  def audioQuality(bytes: Array[Byte],
      silenceThreshold: Int = 327): Option[AudioQuality] = {
    require(silenceThreshold >= 0, "silenceThreshold must be >= 0")
    if (bytes == null || bytes.length < 12) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val signed =
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!signed || fmt.getSampleSizeInBits != 16) return None
        val big = fmt.isBigEndian
        val buf = new Array[Byte](fmt.getFrameSize * 1024)
        var n = 0L; var clipped = 0L; var silent = 0L
        var peak = 0L; var sumAbs = 0L
        var read = in.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 1 < read) {
            val s =
              if (big) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
              else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
            val a = math.abs(s.toLong)
            n += 1
            if (s == Short.MaxValue || s == Short.MinValue) clipped += 1
            if (a <= silenceThreshold) silent += 1
            if (a > peak) peak = a
            sumAbs += a
            i += 2
          }
          read = in.read(buf)
        }
        if (n == 0) return None
        Some(AudioQuality(n, clipped, silent, peak, sumAbs))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed [[audioQuality]]: appends a nullable `audio_q` struct
    * (null where the payload is not decodable 16-bit PCM). Narrow
    * per-partition decode, payload bytes never shuffle. */
  def extractAudioQuality(df: DataFrame, binCol: String,
      silenceThreshold: Int = 327): DataFrame = {
    val qUdf = udf((bytes: Array[Byte]) =>
      audioQuality(bytes, silenceThreshold))
    df.withColumn("audio_q", qUdf(col(binCol)))
  }

  /** Output-struct row of [[extractImageQuality]] — field names are
    * the column contract. All EXACT integer counts over the decoded
    * pixels' integer luma (ITU-R BT.601 fixed-point:
    * `(299·r + 587·g + 114·b) div 1000`; gray payloads use the sample
    * directly — for r=g=b the two agree exactly, since
    * 1000·v div 1000 = v), so quality verdicts are bit-reproducible:
    * `n_over`/`n_under` count luma ≥/≤ the exposure thresholds
    * (blown highlights / crushed shadows), `luma_min`/`luma_max`
    * bound the histogram (spread = contrast; a narrow band means a
    * low-contrast scan), `n_modal` is the most frequent luma's count
    * (`n_modal == n_pixels` ⇔ solid; near-equality catches
    * letterboxed blanks and single-color placeholders). Width/height
    * ride along so extreme-aspect filters stay one select away. */
  final case class ImageQuality(width: Int, height: Int,
      n_pixels: Long, n_over: Long, n_under: Long, luma_min: Int,
      luma_max: Int, n_modal: Long)

  /** Per-payload image quality triage stats — the image twin of
    * [[audioQuality]] (X5k's decode-side gate, for pixels): one
    * streaming pass over the raster, integer-exact counts only (see
    * [[ImageQuality]]). Same total-function contract and
    * decompression-bomb guard as [[decodeImage]]: None for null /
    * corrupt / non-image / over-budget payloads; never throws. */
  def imageQuality(bytes: Array[Byte], overThreshold: Int = 250,
      underThreshold: Int = 5,
      maxPixels: Long = DefaultMaxPixels): Option[ImageQuality] = {
    require(overThreshold >= 0 && overThreshold <= 255,
      "overThreshold must be in [0, 255]")
    require(underThreshold >= 0 && underThreshold <= 255,
      "underThreshold must be in [0, 255]")
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
          val hist = new Array[Long](256)
          var over = 0L; var under = 0L
          var lMin = 255; var lMax = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val luma =
                if (nb >= 3)
                  (299 * raster.getSample(x, y, 0) +
                    587 * raster.getSample(x, y, 1) +
                    114 * raster.getSample(x, y, 2)) / 1000
                else raster.getSample(x, y, 0)
              val l = if (luma < 0) 0 else if (luma > 255) 255 else luma
              hist(l) += 1
              if (l >= overThreshold) over += 1
              if (l <= underThreshold) under += 1
              if (l < lMin) lMin = l
              if (l > lMax) lMax = l
              x += 1
            }
            y += 1
          }
          var modal = 0L
          var i = 0
          while (i < 256) {
            if (hist(i) > modal) modal = hist(i)
            i += 1
          }
          Some(ImageQuality(w, h, w.toLong * h, over, under, lMin,
            lMax, modal))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Distributed [[imageQuality]]: appends a nullable `image_q` struct
    * (null where the payload didn't decode). Narrow per-partition
    * decode, payload bytes never shuffle — the curation pattern is
    * extract → filter on the integer verdict columns → only THEN pay
    * for embedding/export on the survivors. */
  def extractImageQuality(df: DataFrame, binCol: String,
      overThreshold: Int = 250, underThreshold: Int = 5): DataFrame = {
    val qUdf = udf((bytes: Array[Byte]) =>
      imageQuality(bytes, overThreshold, underThreshold))
    df.withColumn("image_q", qUdf(col(binCol)))
  }

  /** Encode the `w`×`h` gray-gradient PNG with pixel value
    * `(base + x·stepX + y·stepY) mod 256` (written r=g=b) — the
    * oracle-expressible fixture generator for the image-QUALITY
    * queries (the [[encodeDhashPatternPng]] discipline, but with the
    * full 0–255 luma range in play so exposure/contrast/solid
    * verdicts all exercise: stepX=stepY=0 makes a solid, a wrapping
    * gradient crosses both exposure thresholds, and every pixel's
    * luma is pure integer arithmetic on (x, y) — DuckDB-checkable). */
  def encodeGradientPng(w: Int, h: Int, base: Int, stepX: Int,
      stepY: Int): Array[Byte] = {
    require(w >= 1 && h >= 1, "dimensions must be >= 1")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = java.lang.Math.floorMod(base + x * stepX + y * stepY, 256)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Distributed [[encodeGradientPng]] over integer spec columns. */
  def synthesizeGradientPngs(df: DataFrame, wCol: String, hCol: String,
      baseCol: String, stepXCol: String, stepYCol: String,
      outCol: String): DataFrame =
    df.withColumn(outCol, gradientPngUdf(col(wCol), col(hCol),
      col(baseCol), col(stepXCol), col(stepYCol)))

  private val gradientPngUdf =
    udf((w: Int, h: Int, base: Int, sx: Int, sy: Int) =>
      encodeGradientPng(w, h, base, sx, sy))

  // ---------------------------------------------------------------------
  // EXIF/ICC metadata triage (REAL — JPEG segment + TIFF IFD parsing, no
  // codec needed). The verdicts a curation pipeline filters on BEFORE
  // paying for decode live in plain header structures: orientation
  // (tag 0x0112 — a 90°-rotated photo poisons vision training unless
  // normalized), GPS IFD presence (tag 0x8825 — location PII that must
  // be stripped before the corpus ships), capture DateTime (0x0132 —
  // temporal dedup/filter key), embedded ICC profile mass (APP2 chunks
  // — color-managed sources), and SOF dimensions. Header-only: the
  // scan stops at SOS/EOI, so a 50 MB photo costs its first few KB.
  // ---------------------------------------------------------------------

  /** Header-level EXIF/ICC summary of a JPEG payload. `orientation`
    * is the raw EXIF value 1–8 (None when no APP1/orientation tag);
    * `iccBytes` sums the profile data across ALL APP2 chunks (large
    * profiles ship split). */
  final case class ExifInfo(width: Int, height: Int,
      orientation: Option[Int], hasGps: Boolean,
      exifDatetime: Option[String], iccBytes: Long)

  /** Parse the JPEG header segments: SOF dims, first APP1 Exif TIFF
    * block (both byte orders), APP2 ICC chunk mass. Returns None for
    * non-JPEG payloads, truncated headers, or malformed segment
    * structure — every offset is bounds-checked before the read (the
    * decodeVideoMeta bomb-guard discipline). */
  def parseExifHeader(bytes: Array[Byte]): Option[ExifInfo] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    try {
      var off = 2
      var w = -1; var h = -1
      var orientation: Option[Int] = None
      var hasGps = false
      var dt: Option[String] = None
      var icc = 0L
      var sawExif = false
      var done = false
      while (!done && off + 2 <= bytes.length) {
        if ((bytes(off) & 0xff) != 0xff) return None
        val marker = bytes(off + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) done = true
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8))
          off += 2
        else {
          if (off + 4 > bytes.length) return None
          val len = ((bytes(off + 2) & 0xff) << 8) |
            (bytes(off + 3) & 0xff)
          if (len < 2 || off + 2 + len > bytes.length) return None
          val p = off + 4
          val plen = len - 2
          if (marker == 0xe1 && plen >= 14 && !sawExif &&
              bytes(p) == 'E' && bytes(p + 1) == 'x' &&
              bytes(p + 2) == 'i' && bytes(p + 3) == 'f' &&
              bytes(p + 4) == 0 && bytes(p + 5) == 0) {
            sawExif = true
            val t = p + 6
            val tEnd = p + plen
            val le =
              if (bytes(t) == 'I' && bytes(t + 1) == 'I') Some(true)
              else if (bytes(t) == 'M' && bytes(t + 1) == 'M')
                Some(false)
              else None
            le.foreach { isLe =>
              def r16(o: Int): Int =
                if (o + 2 > tEnd) -1
                else if (isLe) (bytes(o) & 0xff) |
                  ((bytes(o + 1) & 0xff) << 8)
                else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
              def r32(o: Int): Long =
                if (o + 4 > tEnd) -1L
                else if (isLe) (bytes(o) & 0xffL) |
                  ((bytes(o + 1) & 0xffL) << 8) |
                  ((bytes(o + 2) & 0xffL) << 16) |
                  ((bytes(o + 3) & 0xffL) << 24)
                else ((bytes(o) & 0xffL) << 24) |
                  ((bytes(o + 1) & 0xffL) << 16) |
                  ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
              if (r16(t + 2) == 42) {
                val ifdOff = r32(t + 4)
                if (ifdOff >= 8 && t + ifdOff + 2 <= tEnd) {
                  val base = t + ifdOff.toInt
                  val n = r16(base)
                  var i = 0
                  while (i >= 0 && i < n) {
                    val e = base + 2 + i * 12
                    if (e + 12 > tEnd) i = -2 // truncated IFD: stop
                    else {
                      val tag = r16(e)
                      val typ = r16(e + 2)
                      val cnt = r32(e + 4)
                      if (tag == 0x0112 && typ == 3 && cnt == 1L)
                        orientation = Some(r16(e + 8))
                      else if (tag == 0x8825) hasGps = true
                      else if (tag == 0x0132 && typ == 2 &&
                          cnt >= 2L && cnt <= 64L) {
                        val vo =
                          if (cnt <= 4L) e + 8
                          else t + r32(e + 8).toInt
                        if (vo >= t && vo + cnt <= tEnd)
                          dt = Some(new String(bytes, vo,
                            cnt.toInt - 1,
                            java.nio.charset.StandardCharsets.US_ASCII))
                      }
                      i += 1
                    }
                  }
                }
              }
            }
          } else if (marker == 0xe2 && plen >= 14 &&
              new String(bytes, p, 11,
                java.nio.charset.StandardCharsets.US_ASCII) ==
                "ICC_PROFILE" && bytes(p + 11) == 0) {
            icc += (plen - 14)
          } else if ((marker == 0xc0 || marker == 0xc1 ||
              marker == 0xc2) && plen >= 5 && w < 0) {
            h = ((bytes(p + 1) & 0xff) << 8) | (bytes(p + 2) & 0xff)
            w = ((bytes(p + 3) & 0xff) << 8) | (bytes(p + 4) & 0xff)
          }
          off += 2 + len
        }
      }
      if (w <= 0 || h <= 0) None
      else Some(ExifInfo(w, h, orientation, hasGps, dt, icc))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Triage verdicts off [[parseExifHeader]] — the filter columns a
    * vision-corpus pipeline applies before decode: `needs_rotation`
    * (orientation 2–8), `has_gps` (location PII — strip before the
    * corpus ships), the capture timestamp, ICC mass. */
  final case class ExifTriage(width: Long, height: Long,
      orientation: Option[Long], needs_rotation: Boolean,
      has_gps: Boolean, exif_datetime: Option[String],
      icc_bytes: Long, has_icc: Boolean)

  def exifTriage(bytes: Array[Byte]): Option[ExifTriage] =
    parseExifHeader(bytes).map { i =>
      ExifTriage(i.width.toLong, i.height.toLong,
        i.orientation.map(_.toLong), i.orientation.exists(_ >= 2),
        i.hasGps, i.exifDatetime, i.iccBytes, i.iccBytes > 0L)
    }

  /** Distributed [[exifTriage]]: appends a nullable `exif_q` struct
    * (null where the payload is not a parseable JPEG header). Narrow
    * per-partition parse over the first header KBs; payload bytes
    * never shuffle — filter on the verdict columns BEFORE paying for
    * decode, rotation, or embedding. */
  def extractExifTriage(df: DataFrame, binCol: String): DataFrame = {
    val qUdf = udf((bytes: Array[Byte]) => exifTriage(bytes))
    df.withColumn("exif_q", qUdf(col(binCol)))
  }

  /** Encode a minimal JPEG whose EXIF/ICC header fields are exact
    * functions of the arguments — the oracle-expressible fixture for
    * the triage queries (the [[encodeGradientPng]] discipline): SOI,
    * one APP1 Exif TIFF block (ascending-tag IFD0: orientation 0x0112
    * inline, DateTime 0x0132 by offset when `dateTime != null`, GPS
    * IFD pointer 0x8825 to an empty GPS IFD when `hasGps`), the ICC
    * mass split across TWO APP2 chunks whenever it is ≥ 2 bytes (the
    * real-world multi-chunk shape — a single-chunk-only parser
    * undercounts), SOF0 with the dimensions, EOI. `littleEndian`
    * selects the TIFF byte order (both are legal and both occur in
    * the wild). */
  def encodeJpegExifStub(width: Int, height: Int, orientation: Int,
      hasGps: Boolean, iccBytes: Int, dateTime: String,
      littleEndian: Boolean): Array[Byte] = {
    require(width >= 1 && width <= 65535 &&
      height >= 1 && height <= 65535, "dims must be uint16")
    require(orientation >= 1 && orientation <= 8,
      "orientation must be the EXIF 1..8 range")
    require(iccBytes >= 0 && iccBytes <= 60000,
      "iccBytes must fit the two-chunk stub")
    require(dateTime == null || dateTime.length == 19,
      "dateTime must be the 19-char EXIF form or null")
    val le = littleEndian
    val nEntries = 1 + (if (dateTime != null) 1 else 0) +
      (if (hasGps) 1 else 0)
    val ifdSize = 2 + nEntries * 12 + 4
    val dtOff = 8 + ifdSize
    val gpsOff = dtOff + (if (dateTime != null) 20 else 0)
    val tiff = new Array[Byte](gpsOff + (if (hasGps) 6 else 0))
    def w16(o: Int, v: Int): Unit =
      if (le) { tiff(o) = v.toByte; tiff(o + 1) = (v >> 8).toByte }
      else { tiff(o) = (v >> 8).toByte; tiff(o + 1) = v.toByte }
    def w32(o: Int, v: Int): Unit =
      if (le) { tiff(o) = v.toByte; tiff(o + 1) = (v >> 8).toByte
        tiff(o + 2) = (v >> 16).toByte; tiff(o + 3) = (v >> 24).toByte }
      else { tiff(o) = (v >> 24).toByte; tiff(o + 1) = (v >> 16).toByte
        tiff(o + 2) = (v >> 8).toByte; tiff(o + 3) = v.toByte }
    tiff(0) = (if (le) 'I' else 'M').toByte
    tiff(1) = tiff(0)
    w16(2, 42); w32(4, 8)
    var o = 8
    w16(o, nEntries); o += 2
    w16(o, 0x0112); w16(o + 2, 3); w32(o + 4, 1); w16(o + 8, orientation)
    o += 12
    if (dateTime != null) {
      w16(o, 0x0132); w16(o + 2, 2); w32(o + 4, 20); w32(o + 8, dtOff)
      o += 12
      System.arraycopy(dateTime.getBytes(
        java.nio.charset.StandardCharsets.US_ASCII), 0, tiff, dtOff, 19)
    }
    if (hasGps) {
      w16(o, 0x8825); w16(o + 2, 4); w32(o + 4, 1); w32(o + 8, gpsOff)
      o += 12
      w16(gpsOff, 0); w32(gpsOff + 2, 0) // empty GPS IFD
    }
    w32(o, 0) // next-IFD terminator
    val bos = new java.io.ByteArrayOutputStream()
    def b1(v: Int): Unit = bos.write(v & 0xff)
    def b2(v: Int): Unit = { b1(v >> 8); b1(v) }
    b1(0xff); b1(0xd8)
    b1(0xff); b1(0xe1); b2(2 + 6 + tiff.length)
    bos.write("Exif".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)); b1(0); b1(0)
    bos.write(tiff, 0, tiff.length)
    if (iccBytes > 0) {
      val sizes =
        if (iccBytes >= 2) Seq(iccBytes / 2, iccBytes - iccBytes / 2)
        else Seq(iccBytes)
      sizes.zipWithIndex.foreach { case (sz, i) =>
        b1(0xff); b1(0xe2); b2(2 + 14 + sz)
        bos.write("ICC_PROFILE".getBytes(
          java.nio.charset.StandardCharsets.US_ASCII)); b1(0)
        b1(i + 1); b1(sizes.length)
        var j = 0
        while (j < sz) { b1(j % 251); j += 1 }
      }
    }
    b1(0xff); b1(0xc0); b2(17); b1(8); b2(height); b2(width); b1(3)
    var c = 1
    while (c <= 3) { b1(c); b1(0x11); b1(0); c += 1 }
    b1(0xff); b1(0xd9)
    bos.toByteArray
  }

  /** Distributed [[encodeJpegExifStub]] over spec columns (`dtCol`
    * may be null per row = no DateTime tag). */
  def synthesizeExifJpegs(df: DataFrame, wCol: String, hCol: String,
      orientCol: String, gpsCol: String, iccCol: String, dtCol: String,
      leCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, exifJpegUdf(col(wCol), col(hCol),
      col(orientCol), col(gpsCol), col(iccCol), col(dtCol), col(leCol)))

  private val exifJpegUdf = udf((w: Int, h: Int, or: Int, gps: Boolean,
      icc: Int, dt: String, le: Boolean) =>
    encodeJpegExifStub(w, h, or, gps, icc, dt, le))

  // ---------------------------------------------------------------------
  // Video container metadata (REAL — header parsing, no codec needed).
  // The JDK ships no video codec, so frame DECODE stays out of scope, but
  // the container metadata a pipeline filters on (dimensions, duration,
  // track count) lives in plain header structures: ISO base-media boxes
  // (ISO/IEC 14496-12 — MP4/MOV/M4V) and RIFF chunks (AVI). Both are
  // parsed directly from the payload bytes below.
  // ---------------------------------------------------------------------

  /** Video container summary: `container` is "mp4" (any ISO-BMFF brand) or
    * "avi"; `durationMs` from the movie header; `nTracks` counts all
    * tracks (audio + video). */
  final case class VideoInfo(
      container: String, width: Int, height: Int, durationMs: Long,
      nTracks: Int)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk ISO-BMFF boxes in `[from, to)`, invoking `f(boxType, bodyFrom,
    * bodyTo)` per box. Bounds-checked and loop-capped: a hostile header
    * claiming absurd sizes terminates the walk instead of spinning. */
  private def walkBoxes(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var off = from
    var guard = 0
    while (off + 8 <= to && guard < 4096) {
      guard += 1
      var size = be32(b, off)
      val typ = tag(b, off + 4)
      var hdr = 8
      if (size == 1 && off + 16 <= to) { size = be64(b, off + 8); hdr = 16 }
      else if (size == 0) size = (to - off).toLong // box runs to end
      if (size < hdr || off + size > to) return // corrupt/hostile: stop
      f(typ, off + hdr, off + size.toInt)
      off += size.toInt
    }
  }

  /** Parse an ISO base-media (MP4/MOV/M4V) header: mvhd → duration,
    * tkhd → dimensions (16.16 fixed point; max across tracks — audio
    * tracks carry 0×0), trak count. */
  private def parseMp4(b: Array[Byte]): Option[VideoInfo] = {
    var timescale = 0L; var duration = -1L
    var w = 0; var h = 0; var tracks = 0; var sawMoov = false
    walkBoxes(b, 0, b.length) { (typ, from, to) =>
      if (typ == "moov") {
        sawMoov = true
        walkBoxes(b, from, to) { (t2, f2, to2) =>
          if (t2 == "mvhd" && to2 - f2 >= 20) {
            val v = b(f2) & 0xff
            if (v == 1) {
              // a short v1 box must reject, not fall through to v0 offsets
              if (to2 - f2 >= 32) {
                timescale = be32(b, f2 + 20); duration = be64(b, f2 + 24)
              }
            } else {
              timescale = be32(b, f2 + 12); duration = be32(b, f2 + 16)
            }
          } else if (t2 == "trak") {
            tracks += 1
            walkBoxes(b, f2, to2) { (t3, f3, to3) =>
              if (t3 == "tkhd" && to3 - f3 >= 84) {
                val v = b(f3) & 0xff
                val dimOff = if (v == 1) f3 + 88 else f3 + 76
                if (dimOff + 8 <= to3) {
                  w = math.max(w, (be32(b, dimOff) >> 16).toInt)
                  h = math.max(h, (be32(b, dimOff + 4) >> 16).toInt)
                }
              }
            }
          }
        }
      }
    }
    // duration is bounded before the ×1000 so a hostile be64 value can't
    // overflow into a plausible-looking number
    if (!sawMoov || timescale <= 0 || duration < 0 ||
      duration > Long.MaxValue / 1000) None
    else Some(VideoInfo("mp4", w, h, duration * 1000 / timescale, tracks))
  }

  /** Parse a RIFF/AVI main header (`LIST hdrl` → `avih`): frame period ×
    * frame count → duration, declared stream count, dimensions. RIFF is
    * little-endian throughout. */
  private def parseAvi(b: Array[Byte]): Option[VideoInfo] = {
    var off = 12 // past "RIFF" + size + "AVI "
    var guard = 0
    while (off + 8 <= b.length && guard < 4096) {
      guard += 1
      val ck = tag(b, off)
      val size = le32(b, off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      if (ck == "LIST" && size >= 4 && tag(b, off + 8) == "hdrl") {
        // first child chunk of hdrl must be avih (56-byte main header)
        val a = off + 12
        if (a + 8 + 40 <= b.length && tag(b, a) == "avih") {
          val p = a + 8
          val usPerFrame = le32(b, p)
          val totalFrames = le32(b, p + 16)
          val streams = le32(b, p + 24)
          val w = le32(b, p + 32)
          val h = le32(b, p + 36)
          // all fields are untrusted le32 (up to 4.29e9): bound them so the
          // duration product can't overflow Long and dims/streams can't go
          // negative through .toInt — hostile values reject as corrupt
          if (usPerFrame > 1000000000L || totalFrames > 1000000000L ||
            w > Int.MaxValue || h > Int.MaxValue || streams > 1024)
            return None
          return Some(VideoInfo("avi", w.toInt, h.toInt,
            usPerFrame * totalFrames / 1000, streams.toInt))
        }
        return None
      }
      off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    None
  }

  /** Real video-container metadata decode: sniffs ISO-BMFF (`ftyp` at
    * offset 4) and RIFF/AVI magics, then parses the respective header
    * structures — dimensions, duration, track count — without any codec.
    * Same total-function contract as [[decodeImage]]: None for anything
    * unrecognized or corrupt, NonFatal-only so fatal errors still fail
    * the task. Header parsing touches a few hundred bytes regardless of
    * payload size — there is no decompression surface. */
  def decodeVideoMeta(bytes: Array[Byte]): Option[VideoInfo] = {
    if (bytes == null || bytes.length < 16) return None
    try {
      if (tag(bytes, 4) == "ftyp") parseMp4(bytes)
      else if (tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ")
        parseAvi(bytes)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Output-struct row of [[extractVideoMeta]] — field names are the
    * column contract. */
  final case class VideoColumn(
      container: String, width: Int, height: Int, duration_ms: Long,
      n_tracks: Int)

  /** Distributed video-metadata extraction: appends a nullable
    * `video: struct(container, width, height, duration_ms, n_tracks)`
    * column. Same stays-in-Catalyst UDF shape as [[extractFeatures]] —
    * payloads never shuffle, and only header bytes are read. */
  def extractVideoMeta(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("video", videoUdf(col(binCol)))

  private val videoUdf = udf((bytes: Array[Byte]) =>
    decodeVideoMeta(bytes).map(v =>
      VideoColumn(v.container, v.width, v.height, v.durationMs, v.nTracks)))

  /** Encode a minimal valid ISO-BMFF (MP4) header: `ftyp` + `moov(mvhd +
    * trak(tkhd))` + empty `mdat` (fixture generator — the inverse of
    * [[decodeVideoMeta]]'s MP4 branch; timescale 1000 so `durationMs`
    * round-trips exactly). */
  def encodeMp4Stub(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(20 + 216 + 8)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    // ftyp
    bb.putInt(20); bb.put("ftyp".getBytes); bb.put("isom".getBytes)
    bb.putInt(0); bb.put("isom".getBytes)
    // moov
    bb.putInt(216); bb.put("moov".getBytes)
    //   mvhd (v0, body 100)
    bb.putInt(108); bb.put("mvhd".getBytes)
    bb.putInt(0) // version + flags
    bb.putInt(0); bb.putInt(0) // creation, modification
    bb.putInt(1000) // timescale: ms
    bb.putInt(durationMs.toInt)
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
    bb.putLong(0) // reserved
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putInt(2) // next_track_id
    //   trak
    bb.putInt(100); bb.put("trak".getBytes)
    //     tkhd (v0, body 84)
    bb.putInt(92); bb.put("tkhd".getBytes)
    bb.putInt(7) // version 0, flags: enabled|in-movie|in-preview
    bb.putInt(0); bb.putInt(0) // creation, modification
    bb.putInt(1) // track id
    bb.putInt(0) // reserved
    bb.putInt(durationMs.toInt)
    bb.putLong(0) // reserved
    bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    bb.putInt(width << 16); bb.putInt(height << 16) // 16.16 fixed
    // mdat (empty)
    bb.putInt(8); bb.put("mdat".getBytes)
    bb.array()
  }

  /** Encode a minimal valid RIFF/AVI header (`LIST hdrl` → `avih`) —
    * fixture generator for [[decodeVideoMeta]]'s AVI branch. Duration is
    * `usPerFrame × totalFrames`. */
  def encodeAviStub(width: Int, height: Int, usPerFrame: Int,
      totalFrames: Int, streams: Int = 1): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + 12 + 8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(4 + 8 + (4 + 8 + 56)) // "AVI " + LIST
    bb.put("AVI ".getBytes)
    bb.put("LIST".getBytes); bb.putInt(4 + 8 + 56); bb.put("hdrl".getBytes)
    bb.put("avih".getBytes); bb.putInt(56)
    bb.putInt(usPerFrame)
    bb.putInt(0); bb.putInt(0); bb.putInt(0) // maxBytesPerSec, padding, flags
    bb.putInt(totalFrames)
    bb.putInt(0) // initial frames
    bb.putInt(streams)
    bb.putInt(0) // suggested buffer size
    bb.putInt(width); bb.putInt(height)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0) // reserved
    bb.array()
  }

  /** Distributed video-container synthesis: append `outCol: binary`
    * holding an MP4 header when `containerCol` = "mp4", else an AVI header
    * (25 fps) — executor-side, the video twin of [[synthesizePngs]]. */
  def synthesizeVideos(df: DataFrame, containerCol: String, widthCol: String,
      heightCol: String, durMsCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, videoStubUdf(
      col(containerCol), col(widthCol), col(heightCol), col(durMsCol)))

  private val videoStubUdf = udf(
    (container: String, w: Int, h: Int, durMs: Long) =>
      if (container == "mp4") encodeMp4Stub(w, h, durMs)
      else // 25 fps: 40 ms per frame
        encodeAviStub(w, h, 40000, (durMs / 40).toInt))

  /** MP4 sample table: absolute byte ranges of every media sample
    * ("frame"), recovered from the `stsz`/`stsc`/`stco` boxes. */
  final case class Mp4Samples(offsets: Array[Long], sizes: Array[Long])

  /** Parse an MP4's sample table (first track carrying one): `stsz` gives
    * per-sample sizes, `stco`/`co64` the chunk start offsets, `stsc` the
    * samples-per-chunk runs; together they locate every compressed frame's
    * exact byte range — no codec involved (ISO/IEC 14496-12 §8.7). Returns
    * None when any table is missing/corrupt or ranges fall outside the
    * payload. */
  def parseMp4Samples(bytes: Array[Byte]): Option[Mp4Samples] = {
    if (bytes == null || bytes.length < 16 || tag(bytes, 4) != "ftyp")
      return None
    try {
      var sizes: Array[Long] = null
      var chunkOffs: Array[Long] = null
      var stsc: Array[(Long, Long)] = null
      walkBoxes(bytes, 0, bytes.length) { (t1, f1, to1) =>
        if (t1 == "moov") walkBoxes(bytes, f1, to1) { (t2, f2, to2) =>
          if (t2 == "trak" && sizes == null) {
            // parse into per-track holders; COMMIT only a complete table,
            // so a first track with a partial stbl (hint/metadata tracks)
            // doesn't poison the parse and block later complete tracks
            var tSizes: Array[Long] = null
            var tChunks: Array[Long] = null
            var tRuns: Array[(Long, Long)] = null
            walkBoxes(bytes, f2, to2) { (t3, f3, to3) =>
              if (t3 == "mdia") walkBoxes(bytes, f3, to3) { (t4, f4, to4) =>
                if (t4 == "minf") walkBoxes(bytes, f4, to4) { (t5, f5, to5) =>
                  if (t5 == "stbl") walkBoxes(bytes, f5, to5) { (t6, f6, to6) =>
                    t6 match {
                      case "stsz" if to6 - f6 >= 12 =>
                        val uniform = be32(bytes, f6 + 4)
                        val n = be32(bytes, f6 + 8).toInt
                        if (n >= 0 && n < (1 << 20)) {
                          if (uniform != 0) tSizes = Array.fill(n)(uniform)
                          else if (to6 - f6 >= 12 + 4L * n)
                            tSizes = Array.tabulate(n)(i =>
                              be32(bytes, f6 + 12 + 4 * i))
                        }
                      case "stco" if to6 - f6 >= 8 =>
                        val n = be32(bytes, f6 + 4).toInt
                        if (n >= 0 && n < (1 << 20) && to6 - f6 >= 8 + 4L * n)
                          tChunks = Array.tabulate(n)(i =>
                            be32(bytes, f6 + 8 + 4 * i))
                      case "co64" if to6 - f6 >= 8 =>
                        val n = be32(bytes, f6 + 4).toInt
                        if (n >= 0 && n < (1 << 20) && to6 - f6 >= 8 + 8L * n)
                          tChunks = Array.tabulate(n)(i =>
                            be64(bytes, f6 + 8 + 8 * i))
                      case "stsc" if to6 - f6 >= 8 =>
                        val n = be32(bytes, f6 + 4).toInt
                        if (n >= 0 && n < (1 << 16) && to6 - f6 >= 8 + 12L * n)
                          tRuns = Array.tabulate(n)(i => (
                            be32(bytes, f6 + 8 + 12 * i),
                            be32(bytes, f6 + 12 + 12 * i)))
                      case _ => ()
                    }
                  }
                }
              }
            }
            if (tSizes != null && tChunks != null && tRuns != null &&
              tRuns.nonEmpty) {
              sizes = tSizes; chunkOffs = tChunks; stsc = tRuns
            }
          }
        }
      }
      if (sizes == null) return None
      // expand stsc runs → samples per chunk, then walk chunks assigning
      // consecutive samples their absolute offsets
      val offsets = new Array[Long](sizes.length)
      var sample = 0
      var run = 0
      var chunk = 1
      while (sample < sizes.length && chunk <= chunkOffs.length) {
        while (run + 1 < stsc.length && stsc(run + 1)._1 <= chunk) run += 1
        val perChunk = stsc(run)._2.toInt
        var off = chunkOffs(chunk - 1)
        var i = 0
        while (i < perChunk && sample < sizes.length) {
          offsets(sample) = off
          off += sizes(sample)
          sample += 1
          i += 1
        }
        chunk += 1
      }
      if (sample < sizes.length) return None // ran out of chunks
      // validate ranges against the actual payload
      var i = 0
      while (i < sizes.length) {
        if (offsets(i) < 0 || sizes(i) < 0 ||
          offsets(i) + sizes(i) > bytes.length) return None
        i += 1
      }
      Some(Mp4Samples(offsets, sizes))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** One sampled frame of [[sampleVideoFrames]] — field names are the
    * column contract. */
  final case class FrameSlice(frame_idx: Int, frame_bytes: Array[Byte])

  /** REAL frame sampling for MP4 payloads: resolve the sample table and
    * emit every `stride`-th sample's exact (compressed) bytes as one row —
    * `frame_idx` is the sample index, `frame_bytes` the codec payload.
    * Non-MP4 / table-less payloads produce no rows (compose with
    * [[sampleFrames]] for a byte-slicing fallback). A UDF produces the
    * per-payload frame array and a Catalyst `explode` fans it out —
    * stays in the plan, payloads never shuffle, each output row carries
    * only its own frame's bytes (the transient per-payload array is
    * bounded by the payload size, which already sat in one row). */
  def sampleVideoFrames(df: DataFrame, binCol: String,
      stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val slices = udf { (bytes: Array[Byte]) =>
      parseMp4Samples(bytes) match {
        case Some(st) =>
          (0 until st.sizes.length by stride).map { i =>
            FrameSlice(i, java.util.Arrays.copyOfRange(bytes,
              st.offsets(i).toInt, (st.offsets(i) + st.sizes(i)).toInt))
          }
        case None => Seq.empty[FrameSlice]
      }
    }
    df.withColumn("_graft_frame", explode(slices(col(binCol))))
      .withColumn("frame_idx", col("_graft_frame.frame_idx"))
      .withColumn("frame_bytes", col("_graft_frame.frame_bytes"))
      .drop("_graft_frame")
  }

  /** 48/64-bit video perceptual fingerprint — the video member of the
    * dedup-fingerprint family, completing the modality grid (text ✓
    * embeddings ✓ images ✓ audio ✓ video now ✓): a SimHash over the
    * hashes of the container's SAMPLE PAYLOADS ([[sampleVideoFrames]]
    * slices — no codec ships in the JDK, so the unit of identity is
    * the coded frame bytes, which is exactly what survives
    * re-containering, trimming, and frame-dropping transcodes that
    * keep the codec stream). Bit b of the fingerprint is the strict
    * majority vote of bit b across frame hashes, so the fingerprint
    * is frame-ORDER-invariant (set semantics) and a copy sharing most
    * coded frames lands a few Hamming bits away while unrelated
    * videos sit ~bits/2 apart — the shared
    * [[graft.operators.Dedup.simhashNearDups]] geometry.
    *
    * `portable = true` hashes frames with
    * [[graft.functions.PortableHash]] (48 bits) so a DuckDB/Trino
    * audit recomputes every fingerprint bit-identically; the default
    * is codegen'd xxhash64 (64 bits).
    *
    * Scale notes (100 TB): frame slicing is a narrow per-partition
    * map (payload bytes never shuffle — only (id, 64-bit hash) rows
    * do); the majority vote is ONE groupBy with `bits` map-side-
    * combinable sums, the text-SimHash aggregation shape. */
  def videoFingerprints(df: DataFrame, binCol: String, idCol: String,
      portable: Boolean = false, seed: Long = 42L): DataFrame = {
    val bits = if (portable) 48 else 64
    val frames = sampleVideoFrames(df, binCol)
    val hashed = frames.select(col(idCol),
      (if (portable)
        graft.functions.PortableHash.hash48(
          col("frame_bytes").cast("string"), seed)
      else xxhash64(col("frame_bytes"))).as("_fh"))
    val bitSums = (0 until bits).map(b =>
      sum(shiftright(col("_fh"), b).bitwiseAND(lit(1L))).as(s"_c$b"))
    val agg = hashed.groupBy(col(idCol))
      .agg(count(lit(1)).as("_n"), bitSums: _*)
    val fp = (0 until bits).map(b =>
      when(col(s"_c$b") * 2 > col("_n"), lit(1L << b))
        .otherwise(lit(0L))).reduce(_ + _) // disjoint bits: + is OR
    agg.select(col(idCol), fp.as("simhash"))
  }

  /** Video near-duplicate pairs: [[videoFingerprints]] →
    * [[graft.operators.Dedup.simhashNearDups]] Hamming blocking.
    * Radius defaults wider than images/audio (8): frame-set edits
    * (trim, drop, extend) move several majority bits at once, while
    * unrelated videos still sit ~bits/2 away. */
  def videoNearDups(df: DataFrame, binCol: String, idCol: String,
      maxHamming: Int = 8, portable: Boolean = false,
      materialize: Boolean = true,
      ckpt: Checkpointer = Checkpointer.Local): DataFrame =
    Dedup.simhashNearDups(
      videoFingerprints(df, binCol, idCol, portable), idCol,
      maxHamming, materialize, ckpt, bits = if (portable) 48 else 64)

  /** Distributed [[encodeMp4WithSamples]] over an `array<string>`
    * frame column (frames encode UTF-8) — the fixture generator that
    * makes video-dedup structure oracle-expressible: the oracle
    * rebuilds the same frame strings and replays the portable hash. */
  def synthesizeSampleVideos(df: DataFrame, framesCol: String,
      outCol: String): DataFrame =
    df.withColumn(outCol, sampleVideoUdf(col(framesCol)))

  private val sampleVideoUdf = udf((frames: Seq[String]) =>
    encodeMp4WithSamples(4, 4, 1000L,
      frames.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .toArray))

  /** Encode a minimal ISO-BMFF file whose `mdat` holds the given samples,
    * with a full `stbl` sample table (`stsz`/`stsc`/`stco`, one chunk) —
    * fixture generator for [[parseMp4Samples]]/[[sampleVideoFrames]]. */
  def encodeMp4WithSamples(width: Int, height: Int, durationMs: Long,
      samples: Array[Array[Byte]]): Array[Byte] = {
    val payloadLen = samples.map(_.length).sum
    val n = samples.length
    val stszLen = 20 + 4 * n
    val stscLen = 28
    val stcoLen = 20
    val stblLen = 8 + stszLen + stscLen + stcoLen
    val minfLen = 8 + stblLen
    val mdiaLen = 8 + minfLen
    val trakLen = 8 + 92 + mdiaLen
    val moovLen = 8 + 108 + trakLen
    val mdatPayloadOff = 20 + moovLen + 8
    val header = encodeMp4Stub(width, height, durationMs)
    val bb = java.nio.ByteBuffer.allocate(mdatPayloadOff + payloadLen)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(header, 0, 20) // ftyp
    bb.putInt(moovLen); bb.put("moov".getBytes)
    bb.put(header, 28, 108) // mvhd copied from the stub's moov
    bb.putInt(trakLen); bb.put("trak".getBytes)
    bb.put(header, 144, 92) // tkhd copied from the stub's trak
    bb.putInt(mdiaLen); bb.put("mdia".getBytes)
    bb.putInt(minfLen); bb.put("minf".getBytes)
    bb.putInt(stblLen); bb.put("stbl".getBytes)
    bb.putInt(stszLen); bb.put("stsz".getBytes)
    bb.putInt(0) // version/flags
    bb.putInt(0) // sample_size: 0 → per-sample table follows
    bb.putInt(n)
    samples.foreach(s => bb.putInt(s.length))
    bb.putInt(stscLen); bb.put("stsc".getBytes)
    bb.putInt(0); bb.putInt(1) // one run
    bb.putInt(1); bb.putInt(n); bb.putInt(1) // chunk 1 holds all n samples
    bb.putInt(stcoLen); bb.put("stco".getBytes)
    bb.putInt(0); bb.putInt(1)
    bb.putInt(mdatPayloadOff)
    bb.putInt(8 + payloadLen); bb.put("mdat".getBytes)
    samples.foreach(bb.put)
    bb.array()
  }

  /** Output-struct row of [[extractVideoQuality]] — field names are
    * the column contract. All EXACT integers: header metadata
    * (container/dimensions/duration/tracks) plus sample-table verdicts
    * — `n_samples`/`media_bytes` from the parsed `stsz` table,
    * `min_sample`/`max_sample` bound the coded-frame size distribution
    * (a max orders of magnitude over the median means a corrupt or
    * hostile table; a tiny max on a long duration means a stub),
    * `n_zero` counts zero-byte samples (table corruption), and
    * `bitrate_bps` = media_bytes·8·1000 div duration_ms — the
    * bitrate/duration sanity number a curation filter thresholds
    * (integer division; −1 when duration is 0). Payloads without a
    * parseable sample table (AVI, table-less MP4) keep the header
    * fields and report n_samples = 0, min/max = −1, bitrate = −1. */
  final case class VideoQuality(container: String, width: Int,
      height: Int, duration_ms: Long, n_tracks: Int, n_samples: Long,
      media_bytes: Long, min_sample: Long, max_sample: Long,
      n_zero: Long, bitrate_bps: Long)

  /** Per-payload video quality triage stats — the video member of the
    * per-modality quality grid (audio [[audioQuality]], image
    * [[imageQuality]]): header metadata + one pass over the parsed
    * sample-size table, integer-exact only (see [[VideoQuality]]).
    * Same total-function contract as [[decodeVideoMeta]]: None for
    * null / corrupt / non-video payloads; never throws. No codec is
    * involved — everything derives from the container structures
    * [[parseMp4Samples]] already recovers. */
  def videoQuality(bytes: Array[Byte]): Option[VideoQuality] =
    decodeVideoMeta(bytes).map { v =>
      val st =
        if (v.container == "mp4") parseMp4Samples(bytes) else None
      st match {
        case Some(t) if t.sizes.nonEmpty =>
          var mb = 0L; var mn = Long.MaxValue; var mx = -1L
          var nz = 0L
          t.sizes.foreach { sz =>
            mb += sz
            if (sz < mn) mn = sz
            if (sz > mx) mx = sz
            if (sz == 0L) nz += 1
          }
          val br =
            if (v.durationMs > 0) mb * 8L * 1000L / v.durationMs
            else -1L
          VideoQuality(v.container, v.width, v.height, v.durationMs,
            v.nTracks, t.sizes.length.toLong, mb, mn, mx, nz, br)
        case _ =>
          VideoQuality(v.container, v.width, v.height, v.durationMs,
            v.nTracks, 0L, 0L, -1L, -1L, 0L, -1L)
      }
    }

  /** Distributed [[videoQuality]]: appends a nullable `video_q` struct
    * (null where the payload is not a parseable container). Narrow
    * per-partition header parse, payload bytes never shuffle. */
  def extractVideoQuality(df: DataFrame, binCol: String): DataFrame = {
    val qUdf = udf((bytes: Array[Byte]) => videoQuality(bytes))
    df.withColumn("video_q", qUdf(col(binCol)))
  }

  /** Frame-sampling fallback for payloads WITHOUT a parseable sample
    * table: split the payload into `frameSize`-byte slices and keep every
    * `stride`-th — same output shape as [[sampleVideoFrames]], used when
    * the container gives no frame boundaries. */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col(binCol)) / frameSize).cast("int")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .withColumn("frame_bytes",
        expr(s"substring($binCol, frame_idx * $frameSize + 1, $frameSize)"))
  }
}
