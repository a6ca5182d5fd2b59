package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** X5 multimodal-column plumbing: binary payloads + typed metadata, batched
  * per-partition feature extraction (real `javax.imageio` decode for
  * images, byte-histogram fallback otherwise), frame sampling. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "hello world"),
    (2L, ""),
    (3L, "binary-ish payload ")).toDF("id", "s")
    .select(col("id"), encode(col("s"), "UTF-8").as("payload"))

  test("withMediaMetadata attaches typed struct") {
    val out = Multimodal.withMediaMetadata(media, "payload", "text/plain")
    assert(out.schema("media_meta").dataType.typeName == "struct")
    val r = out.filter(col("id") === 1).select(
      col("media_meta.media_type"), col("media_meta.n_bytes")).head()
    assert(r.getString(0) == "text/plain")
    assert(r.getLong(1) == 11L)
  }

  test("extractFeatures: batched mapPartitions keeps schema + adds vector") {
    val out = Multimodal.extractFeatures(media, "payload")
    assert(out.columns.toSeq == Seq("id", "payload", "features"))
    val feats = out.orderBy("id").select("features")
      .as[Seq[Float]].collect()
    assert(feats.forall(_.length == Multimodal.FeatureDim))
    assert(feats(1).forall(_ == 0f)) // empty payload -> zero features
    // deterministic: same payload, same features
    val again = Multimodal.extractFeatures(media, "payload")
      .orderBy("id").select("features").as[Seq[Float]].collect()
    assert(feats.toSeq == again.toSeq)
  }

  test("metadata-only queries never read payload pages (column pruning)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mm").toString
    Multimodal.withMediaMetadata(media, "payload", "application/octet-stream")
      .write.parquet(s"$tmp/media")
    val metaOnly = spark.read.parquet(s"$tmp/media")
      .select(col("id"), col("media_meta.n_bytes"))
      .filter(col("media_meta.n_bytes") > 0)
    val scan = metaOnly.queryExecution.executedPlan.toString
    // the parquet ReadSchema must not include the payload column — Parquet
    // stores it in separate column chunks, so pruning means payload bytes
    // are never read off disk for metadata queries
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(scan)
    assert(!readSchema.contains("payload"), readSchema)
    assert(metaOnly.count() == 2) // empty payload filtered
  }

  test("decodeImage: real PNG decode recovers dimensions and channel means") {
    val png = Multimodal.encodeSolidPng(12, 5, 200, 100, 50)
    val info = Multimodal.decodeImage(png).get
    assert(info.width == 12 && info.height == 5 && info.bands == 3)
    // solid colour, lossless codec: means are exactly channel/255
    assert(info.means(0) == 200.0 / 255)
    assert(info.means(1) == 100.0 / 255)
    assert(info.means(2) == 50.0 / 255)
  }

  test("decodeImage: real JPEG decode (lossy — means within tolerance)") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 16).foreach(x =>
      img.setRGB(x, y, (180 << 16) | (90 << 8) | 30)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val info = Multimodal.decodeImage(bos.toByteArray).get
    assert(info.width == 16 && info.height == 16 && info.bands == 3)
    assert(math.abs(info.means(0) - 180.0 / 255) < 0.05)
    assert(math.abs(info.means(2) - 30.0 / 255) < 0.05)
  }

  test("decodeImage: non-image and corrupt payloads reject as None") {
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    // valid PNG magic, garbage body — must not throw
    val broken = Multimodal.encodeSolidPng(4, 4, 1, 2, 3).take(20)
    assert(Multimodal.decodeImage(broken).isEmpty)
  }

  test("decodeImage: decompression-bomb guard rejects before rasterizing") {
    val png = Multimodal.encodeSolidPng(100, 100, 10, 20, 30)
    // under the cap: decodes fine
    assert(Multimodal.decodeImage(png, maxPixels = 100L * 100).isDefined)
    // header declares more pixels than the budget: rejected from the
    // header peek alone, no raster allocated
    assert(Multimodal.decodeImage(png, maxPixels = 100L * 100 - 1).isEmpty)
    // a header hand-patched to claim absurd dimensions (the actual bomb
    // shape: tiny payload, huge declared raster) must also reject — the
    // guard reads the declared size, not the payload size. IHDR width is
    // bytes 16-19, height 20-23 of a PNG.
    val bomb = png.clone()
    bomb(16) = 0x7f.toByte; bomb(17) = 0xff.toByte
    bomb(18) = 0xff.toByte; bomb(19) = 0xff.toByte
    assert(Multimodal.decodeImage(bomb).isEmpty)
  }

  test("extractFeatures on image payloads: [w, h, bands, means...] layout") {
    val imgs = Seq(
      (1L, Multimodal.encodeSolidPng(8, 3, 255, 0, 128)),
      (2L, "plain text, not an image".getBytes)).toDF("id", "payload")
    val feats = Multimodal.extractFeatures(imgs, "payload")
      .orderBy("id").select("features").as[Seq[Float]].collect()
    assert(feats(0).take(3) == Seq(8f, 3f, 3f))
    assert(feats(0)(3) == 1f) // mean_r = 255/255
    assert(feats(0)(5) == 128f / 255) // mean_b
    // non-image row fell back to byte histogram (never zero-length, no throw)
    assert(feats(1).length == Multimodal.FeatureDim)
    assert(feats(1).exists(_ != 0f))
  }

  test("synthesizePngs: distributed encode round-trips through decodeImage") {
    val spec = Seq((1L, 6, 4, 10, 20, 30), (2L, 3, 9, 250, 0, 5))
      .toDF("id", "w", "h", "r", "g", "b")
    val out = Multimodal.synthesizePngs(spec, "w", "h", "r", "g", "b", "png")
    val rows = Multimodal.extractFeatures(out, "png")
      .orderBy("id")
      .select(col("features")).as[Seq[Float]].collect()
    assert(rows(0).take(3) == Seq(6f, 4f, 3f))
    assert(math.round(rows(0)(3) * 255) == 10)
    assert(rows(1).take(3) == Seq(3f, 9f, 3f))
    assert(math.round(rows(1)(5) * 255) == 5)
  }

  test("resizeImage: real decode→scale→re-encode, solid colour exact") {
    val png = Multimodal.encodeSolidPng(16, 10, 40, 80, 120)
    val small = Multimodal.resizeImage(png, 4, 3).get
    val info = Multimodal.decodeImage(small).get
    assert(info.width == 4 && info.height == 3 && info.bands == 3)
    assert(info.means.map(m => math.round(m * 255)).toSeq == Seq(40, 80, 120))
    // upscale too — nearest-neighbor of a solid stays solid
    val big = Multimodal.decodeImage(Multimodal.resizeImage(png, 33, 21).get).get
    assert(big.width == 33 && big.height == 21)
    assert(big.means.map(m => math.round(m * 255)).toSeq == Seq(40, 80, 120))
    // non-image payloads map to None; hostile targets are rejected eagerly
    assert(Multimodal.resizeImage("not a png".getBytes, 4, 4).isEmpty)
    assert(Multimodal.resizeImage(null, 4, 4).isEmpty)
    intercept[IllegalArgumentException](Multimodal.resizeImage(png, 0, 4))
    intercept[IllegalArgumentException](
      Multimodal.resizeImage(png, 1 << 20, 1 << 20))
  }

  test("resizeImages: distributed column resize, nulls for non-images") {
    val df = Seq(
        (1L, Multimodal.encodeSolidPng(8, 8, 200, 100, 50)),
        (2L, "junk payload".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.resizeImages(df, "payload", 5, 6, "small")
      .orderBy("id").select(col("small")).collect()
    val info = Multimodal.decodeImage(out(0).getAs[Array[Byte]](0)).get
    assert(info.width == 5 && info.height == 6)
    assert(out(1).isNullAt(0))
  }

  test("resampleAudio: nearest-neighbor rate change, stereo mix-down") {
    // constant amplitude survives any frame selection exactly
    val wav = Multimodal.encodePcmWav(12000, Array.fill(300)(700.toShort))
    val down = Multimodal.decodeAudio(
      Multimodal.resampleAudio(wav, 6000).get).get
    assert(down.sampleRate == 6000 && down.frames == 150L && down.rms == 700.0)
    val up = Multimodal.decodeAudio(
      Multimodal.resampleAudio(wav, 18000).get).get
    assert(up.sampleRate == 18000 && up.frames == 450L && up.rms == 700.0)
    // exact 2:1 downsample of an alternating signal keeps only even frames
    val alt = Array.tabulate(100)(i => if (i % 2 == 0) 500.toShort
      else (-500).toShort)
    val half = Multimodal.decodeAudio(
      Multimodal.resampleAudio(Multimodal.encodePcmWav(8000, alt), 4000).get).get
    assert(half.frames == 50L && half.rms == 500.0)
    // stereo input mixes to mono before resampling: (100 + 300)/2 = 200
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = new Array[Byte](4 * 80)
    (0 until 80).foreach { f =>
      pcm(4 * f) = 100; pcm(4 * f + 1) = 0       // L = 100 (LE)
      pcm(4 * f + 2) = 44; pcm(4 * f + 3) = 1    // R = 300 (LE)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 80),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val mono = Multimodal.decodeAudio(
      Multimodal.resampleAudio(bos.toByteArray, 8000).get).get
    assert(mono.channels == 1 && mono.frames == 80L && mono.rms == 200.0)
    // rejections
    assert(Multimodal.resampleAudio("not audio".getBytes, 8000).isEmpty)
    assert(Multimodal.resampleAudio(null, 8000).isEmpty)
    intercept[IllegalArgumentException](Multimodal.resampleAudio(wav, 0))
  }

  test("decode stages stay inside Catalyst: no RDD scan barrier, and " +
      "metadata filters push through the decode to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-planshape")
    Seq((1L, Multimodal.encodeSolidPng(4, 4, 9, 9, 9)),
        (2L, Multimodal.encodeSolidPng(5, 5, 7, 7, 7)))
      .toDF("id", "payload").write.parquet(s"$dir/media")
    val decoded = Multimodal.extractFeatures(
      spark.read.parquet(s"$dir/media"), "payload")
      .filter(col("id") === 1L)
    val physical = decoded.queryExecution.executedPlan.toString
    // the old df.rdd round-trip materialized as "Scan ExistingRDD" and
    // severed pushdown; the UDF form must keep one parquet scan with the
    // id predicate pushed into it
    assert(!physical.contains("ExistingRDD"), physical)
    assert(physical.contains("PushedFilters: [IsNotNull(id), EqualTo(id,1)]"),
      physical)
    assert(decoded.count() == 1)
  }

  test("decodeAudio: real WAV decode recovers format and RMS") {
    // full-scale square wave: RMS is exactly the amplitude
    val wav = Multimodal.encodePcmWav(16000, Array.fill(200)(1200.toShort))
    val info = Multimodal.decodeAudio(wav).get
    assert(info.sampleRate == 16000 && info.channels == 1)
    assert(info.frames == 200L)
    assert(info.rms == 1200.0)
    // a sine's RMS ≈ amplitude/sqrt(2)
    val sine = Array.tabulate(16000)(i =>
      math.round(8000 * math.sin(2 * math.Pi * 440 * i / 16000)).toShort)
    val sInfo = Multimodal.decodeAudio(
      Multimodal.encodePcmWav(16000, sine)).get
    assert(math.abs(sInfo.rms - 8000 / math.sqrt(2)) < 20)
  }

  test("decodeAudio: non-audio and truncated payloads reject as None") {
    assert(Multimodal.decodeAudio(null).isEmpty)
    assert(Multimodal.decodeAudio("just some text".getBytes).isEmpty)
    val broken = Multimodal.encodePcmWav(8000, Array.fill(50)(5.toShort))
      .take(16)
    assert(Multimodal.decodeAudio(broken).isEmpty)
    // an image is not audio (and vice versa — codecs don't cross-fire)
    assert(Multimodal.decodeAudio(
      Multimodal.encodeSolidPng(4, 4, 1, 2, 3)).isEmpty)
    assert(Multimodal.decodeImage(
      Multimodal.encodePcmWav(8000, Array.fill(50)(5.toShort))).isEmpty)
  }

  test("synthesizeWavs + extractAudioInfo round-trip; non-audio rows null") {
    val spec = Seq((1L, 8000, 120, 300), (2L, 12000, 80, 7))
      .toDF("id", "rate", "frames", "amp")
    val wav = Multimodal.synthesizeWavs(spec, "rate", "frames", "amp", "payload")
    val out = Multimodal.extractAudioInfo(wav, "payload")
      .orderBy("id")
      .select(col("audio.sample_rate"), col("audio.n_frames"),
        col("audio.rms")).collect()
    assert(out(0).getInt(0) == 8000 && out(0).getLong(1) == 120L)
    assert(out(0).getDouble(2) == 300.0)
    assert(out(1).getDouble(2) == 7.0)
    val text = Seq((1L, "nope".getBytes)).toDF("id", "payload")
    assert(Multimodal.extractAudioInfo(text, "payload")
      .filter(col("audio").isNull).count() == 1)
  }

  test("decodeVideoMeta: MP4 header round-trips dimensions and duration") {
    val mp4 = Multimodal.encodeMp4Stub(640, 360, 12345L)
    val info = Multimodal.decodeVideoMeta(mp4).get
    assert(info.container == "mp4")
    assert(info.width == 640 && info.height == 360)
    assert(info.durationMs == 12345L && info.nTracks == 1)
  }

  test("decodeVideoMeta: AVI header round-trips dimensions and duration") {
    // 25 fps (40000 us/frame) × 250 frames = 10 s
    val avi = Multimodal.encodeAviStub(320, 240, 40000, 250, streams = 2)
    val info = Multimodal.decodeVideoMeta(avi).get
    assert(info.container == "avi")
    assert(info.width == 320 && info.height == 240)
    assert(info.durationMs == 10000L && info.nTracks == 2)
  }

  test("decodeVideoMeta: non-video, corrupt, and hostile payloads reject") {
    assert(Multimodal.decodeVideoMeta(null).isEmpty)
    assert(Multimodal.decodeVideoMeta("not a video at all!".getBytes).isEmpty)
    // image bytes are not a video container
    assert(Multimodal.decodeVideoMeta(
      Multimodal.encodeSolidPng(4, 4, 1, 2, 3)).isEmpty)
    // truncated mid-moov must not throw
    val mp4 = Multimodal.encodeMp4Stub(64, 64, 1000L)
    assert(Multimodal.decodeVideoMeta(mp4.take(40)).isEmpty)
    // hostile box size claiming past end-of-payload: walk stops cleanly
    val hostile = mp4.clone()
    hostile(20) = 0x7f.toByte // moov size now absurd
    assert(Multimodal.decodeVideoMeta(hostile).isEmpty)
  }

  test("synthesizeVideos + extractVideoMeta distributed round-trip") {
    val spec = Seq(
      (1L, "mp4", 1920, 1080, 5000L),
      (2L, "avi", 640, 480, 2000L),
      (3L, "mp4", 320, 180, 40L))
      .toDF("id", "container", "w", "h", "dur_ms")
    val out = Multimodal.extractVideoMeta(
      Multimodal.synthesizeVideos(spec, "container", "w", "h", "dur_ms",
        "payload"), "payload")
      .select("id", "video.container", "video.width", "video.height",
        "video.duration_ms")
      .orderBy("id").collect()
    assert(out(0).getString(1) == "mp4" && out(0).getInt(2) == 1920 &&
      out(0).getInt(3) == 1080 && out(0).getLong(4) == 5000L)
    assert(out(1).getString(1) == "avi" && out(1).getInt(2) == 640 &&
      out(1).getLong(4) == 2000L)
    assert(out(2).getLong(4) == 40L)
  }

  test("parseMp4Samples: sample table round-trips exact byte ranges") {
    val samples = Array(
      Array.fill(10)(1.toByte),
      Array.fill(25)(2.toByte),
      Array.fill(7)(3.toByte))
    val mp4 = Multimodal.encodeMp4WithSamples(64, 48, 500L, samples)
    val st = Multimodal.parseMp4Samples(mp4).get
    assert(st.sizes.toSeq == Seq(10L, 25L, 7L))
    // offsets are contiguous within the single chunk and inside the file
    assert(st.offsets(1) == st.offsets(0) + 10)
    assert(st.offsets(2) == st.offsets(1) + 25)
    // the located bytes ARE the samples
    samples.indices.foreach { i =>
      val got = java.util.Arrays.copyOfRange(mp4,
        st.offsets(i).toInt, (st.offsets(i) + st.sizes(i)).toInt)
      assert(got.toSeq == samples(i).toSeq, s"sample $i")
    }
    // the dimension/duration header still parses alongside the table
    val meta = Multimodal.decodeVideoMeta(mp4).get
    assert(meta.width == 64 && meta.durationMs == 500L)
    // header-only MP4 (no stbl) and garbage reject cleanly
    assert(Multimodal.parseMp4Samples(
      Multimodal.encodeMp4Stub(4, 4, 10L)).isEmpty)
    assert(Multimodal.parseMp4Samples("not an mp4".getBytes).isEmpty)
    // truncated file: table claims ranges past EOF → reject, don't slice
    assert(Multimodal.parseMp4Samples(
      mp4.take(mp4.length - 5)).isEmpty)
  }

  test("decodeVideoMeta: hostile AVI counters reject instead of overflowing") {
    val avi = Multimodal.encodeAviStub(320, 240, 40000, 250)
    // usPerFrame lives at byte 32 (RIFF 12 + LIST hdr 12 + avih hdr 8);
    // 0xFFFFFFFF × 0xFFFFFFFF would overflow Long into a "valid" duration
    val bomb = avi.clone()
    for (i <- 32 until 36) bomb(i) = 0xff.toByte // usPerFrame
    for (i <- 48 until 52) bomb(i) = 0xff.toByte // totalFrames
    assert(Multimodal.decodeVideoMeta(bomb).isEmpty)
    assert(Multimodal.decodeVideoMeta(avi).isDefined) // untouched still parses
  }

  test("parseMp4Samples: partial first track doesn't block a complete one") {
    // hand-rolled two-track file: trak1 has stsz but NO stco/stsc (the
    // hint/metadata-track shape); trak2 carries the full sample table
    def box(tag: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length); bb.put(tag.getBytes); bb.put(body)
      bb.array()
    }
    def be(vals: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 * vals.length)
      vals.foreach(bb.putInt); bb.array()
    }
    val samples = Array(Array.fill(6)(7.toByte), Array.fill(9)(8.toByte))
    val ftyp = box("ftyp", "isom".getBytes ++ be(0) ++ "isom".getBytes)
    val stszPartial = box("stsz", be(0, 0, 1, 4))
    val trak1 = box("trak", box("mdia", box("minf", box("stbl", stszPartial))))
    def trak2(mdatPayloadOff: Int): Array[Byte] = box("trak",
      box("mdia", box("minf", box("stbl",
        box("stsz", be(0, 0, 2, 6, 9)) ++
          box("stsc", be(0, 1, 1, 2, 1)) ++
          box("stco", be(0, 1, mdatPayloadOff))))))
    // assemble once with a dummy offset to measure, then for real
    val dryMoov = box("moov", trak1 ++ trak2(0))
    val off = ftyp.length + dryMoov.length + 8
    val file = ftyp ++ box("moov", trak1 ++ trak2(off)) ++
      box("mdat", samples.flatten)
    val st = Multimodal.parseMp4Samples(file).get
    assert(st.sizes.toSeq == Seq(6L, 9L))
    assert(java.util.Arrays.copyOfRange(file, st.offsets(0).toInt,
      st.offsets(0).toInt + 6).forall(_ == 7.toByte))
    assert(java.util.Arrays.copyOfRange(file, st.offsets(1).toInt,
      st.offsets(1).toInt + 9).forall(_ == 8.toByte))
  }

  test("sampleVideoFrames: stride-samples real frames, skips non-MP4 rows") {
    val df = Seq(
      (1L, Multimodal.encodeMp4WithSamples(8, 8, 100L,
        Array.tabulate(5)(i => Array.fill(4 + i)((i + 65).toByte)))),
      (2L, "definitely not a video".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.sampleVideoFrames(df, "payload", stride = 2)
      .select($"id", $"frame_idx", $"frame_bytes")
      .orderBy("id", "frame_idx").collect()
    // doc 1: samples 0, 2, 4; doc 2: nothing
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (1L, 2), (1L, 4)))
    assert(out(1).getAs[Array[Byte]](2).toSeq ==
      Array.fill(6)(67.toByte).toSeq) // sample 2: len 6, bytes 'C'
  }

  test("sampleFrames explodes payload into indexed frames") {
    val vid = Seq((1L, Array.fill[Byte](100)(7))).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(vid, "payload", frameSize = 10,
      stride = 2).select("frame_idx").as[Int].collect()
    assert(frames.toSeq == Seq(0, 2, 4, 6, 8))
  }

  test("dHash64: pattern PNG reads its code back bit-for-bit") {
    for (code <- Seq(0L, -1L, 0x0123456789ABCDEFL, 0x8000000000000001L,
        42L)) {
      assert(Multimodal.dHash64(
        Multimodal.encodeDhashPatternPng(code)).contains(code),
        s"code $code must round-trip")
    }
    // solid image: no gradients anywhere -> all-zero hash
    assert(Multimodal.dHash64(
      Multimodal.encodeSolidPng(30, 20, 77, 77, 77)).contains(0L))
    // total-function contract
    assert(Multimodal.dHash64(null).isEmpty)
    assert(Multimodal.dHash64("not an image".getBytes).isEmpty)
  }

  test("dHash64: scale- and box-average-invariant for replicated pixels") {
    // a 10x-upscaled copy (nearest neighbor replicates pixels, so every
    // 9x8 box average equals the source pixel) hashes identically — the
    // resized-copy near-dup case
    val code = 0xA5C3F00F12345678L
    val small = Multimodal.encodeDhashPatternPng(code)
    val big = Multimodal.resizeImage(small, 90, 80).get
    assert(Multimodal.dHash64(big).contains(code))
  }

  test("imageNearDups: near-identical images pair, distinct ones don't") {
    val base = 0x0F0F0F0F0F0F0F0FL
    val oneFlip = base ^ (1L << 17)
    val twoFlip = base ^ (1L << 3) ^ (1L << 40)
    val distinct = ~base // Hamming 64 from base
    val imgs = Seq(
      (1L, base), (2L, oneFlip), (3L, twoFlip), (4L, distinct))
      .toDF("id", "code")
    val pngs = Multimodal.synthesizeDhashPatternPngs(imgs, "code",
      "payload").select("id", "payload")
    val pairs = Multimodal.imageNearDups(pngs, "payload", "id",
        maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // 1-2 at hamming 1, 1-3 at 2; 2-3 is 3 bits (excluded at radius 2),
    // 4 pairs with nothing
    assert(pairs == Set((1L, 2L, 1), (1L, 3L, 2)))
    // undecodable rows drop out of the fingerprint frame entirely
    val withJunk = pngs.unionByName(Seq((9L, "junk".getBytes))
      .toDF("id", "payload"))
    assert(Multimodal.imageHashes(withJunk, "payload", "id")
      .count() == 4)
  }

  test("audioHash64: pattern WAV reads its code back bit-for-bit; " +
      "duration- and resample-invariant") {
    for (code <- Seq(0L, -1L, 0x0123456789ABCDEFL, 0x8000000000000001L,
        42L)) {
      assert(Multimodal.audioHash64(
        Multimodal.encodeAudioPatternWav(code)).contains(code),
        s"code $code must round-trip")
      // a longer clip with the same envelope (more frames per cell)
      // hashes identically — the re-encoded-copy near-dup case
      assert(Multimodal.audioHash64(
        Multimodal.encodeAudioPatternWav(code, framesPerCell = 5))
        .contains(code))
    }
    // constant audio: no envelope gradients -> all-zero hash
    assert(Multimodal.audioHash64(
      Multimodal.encodePcmWav(8000, Array.fill(400)(700.toShort)))
      .contains(0L))
    // nearest-neighbor resample preserves per-slice means exactly
    val code = 0xA5C3F00F12345678L
    val wav = Multimodal.encodeAudioPatternWav(code)
    val up = Multimodal.resampleAudio(wav, 16000).get
    assert(Multimodal.audioHash64(up).contains(code))
    // total-function contract
    assert(Multimodal.audioHash64(null).isEmpty)
    assert(Multimodal.audioHash64("not audio at all".getBytes).isEmpty)
    // bomb guard rejects from the DECLARED frame count, pre-allocation
    val wav576 = Multimodal.encodeAudioPatternWav(0L)
    assert(Multimodal.audioHash64(wav576, maxFrames = 100).isEmpty)
    assert(Multimodal.resampleAudio(wav576, 8000,
      maxFrames = 100).isEmpty)
  }

  test("videoFingerprints: strict-majority SimHash over frame-payload " +
      "hashes — order-invariant, portable twin matches, trims stay " +
      "near and strangers far") {
    def mp4(frames: Seq[String]) = Multimodal.encodeMp4WithSamples(
      4, 4, 1000L, frames.map(_.getBytes("UTF-8")).toArray)
    val base = (0 until 64).map(i => s"f:0:$i")
    val vids = Seq(
      (1L, mp4(base)),
      (2L, mp4(base.reverse)), // same set, different order
      (3L, mp4(base :+ "m:3:0")), // one extra coded frame
      (4L, mp4((0 until 64).map(i => s"f:9:$i")))) // different group
      .toDF("id", "payload")
    val fp = Multimodal.videoFingerprints(vids, "payload", "id",
        portable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L), "frame order must not matter")
    // hand-rolled majority vote over the JVM twin hashes
    val hs = base.map(s =>
      graft.functions.PortableHash.hash48(s, 42L))
    val expected = (0 until 48).map { b =>
      if (2 * hs.count(h => ((h >> b) & 1L) == 1L) > hs.size) 1L << b
      else 0L
    }.sum
    assert(fp(1L) == expected)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) <= 8, "trim/extend stays within radius")
    assert(ham(fp(1L), fp(4L)) > 8, "strangers stay far")
    // the pair surface: banding finds exactly the close pairs
    val pairs = Multimodal.videoNearDups(vids, "payload", "id",
        maxHamming = 8, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("audioQuality: exact clipping/silence/peak/level counts") {
    val wav = Multimodal.encodePcmWav(8000, Array[Short](0, 100, -327,
      328, 32767, -32768, -5000))
    val q = Multimodal.audioQuality(wav).get
    // silent: 0, 100, |-327| (<= 327); clipped: ±full scale; peak is
    // |-32768| = 32768; sum_abs exact
    assert(q == Multimodal.AudioQuality(7L, 2L, 3L, 32768L,
      0L + 100 + 327 + 328 + 32767 + 32768 + 5000))
    // threshold is a parameter
    assert(Multimodal.audioQuality(wav, silenceThreshold = 0).get
      .n_silent == 1L)
    // total-function contract
    assert(Multimodal.audioQuality(null).isEmpty)
    assert(Multimodal.audioQuality("junk".getBytes).isEmpty)
    // distributed: struct column, null for undecodable payloads
    val rows = Seq((1L, wav), (2L, "junk".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.extractAudioQuality(rows, "payload")
      .select(col("id"), col("audio_q.n_clipped")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out == Map(1L -> Some(2L), 2L -> None))
  }

  test("imageQuality: exact exposure/contrast/solid verdicts — " +
    "hand-computed pins on crafted rasters") {
    // solid 3×2 at luma 200: modal = every pixel, zero spread
    val solid = Multimodal.encodeGradientPng(3, 2, 200, 0, 0)
    assert(Multimodal.imageQuality(solid).get ==
      Multimodal.ImageQuality(3, 2, 6L, 0L, 0L, 200, 200, 6L))
    // 4×1 strip 250,252,254,0 (wraps at 256): three over-exposed, one
    // under-exposed, modal 1
    val strip = Multimodal.encodeGradientPng(4, 1, 250, 2, 0)
    assert(Multimodal.imageQuality(strip).get ==
      Multimodal.ImageQuality(4, 1, 4L, 3L, 1L, 0, 254, 1L))
    // thresholds are parameters: over ≥ 254 drops two of the three
    assert(Multimodal.imageQuality(strip, overThreshold = 254,
      underThreshold = 0).get.n_over == 1L)
    // 2×2 with sx=5, sy=5: values 10,15,15,20 — modal counts the tie
    val sq = Multimodal.encodeGradientPng(2, 2, 10, 5, 5)
    val q = Multimodal.imageQuality(sq).get
    assert(q.n_pixels == 4L && q.luma_min == 10 && q.luma_max == 20 &&
      q.n_modal == 2L && q.n_under == 0L)
    // total-function contract + bomb guard
    assert(Multimodal.imageQuality(null).isEmpty)
    assert(Multimodal.imageQuality("junk".getBytes).isEmpty)
    assert(Multimodal.imageQuality(solid, maxPixels = 4L).isEmpty)
    // distributed: struct column, null for undecodable payloads
    val rows = Seq((1L, strip), (2L, "junk".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.extractImageQuality(rows, "payload")
      .select(col("id"), col("image_q.n_over")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out == Map(1L -> Some(3L), 2L -> None))
    // the dHash pattern PNG (RGB path, r=g=b) agrees with the written
    // brightness walk: luma == v exactly under the BT.601 fixed point
    val pat = Multimodal.encodeDhashPatternPng(0L) // all-down walk
    val pq = Multimodal.imageQuality(pat).get
    assert(pq.width == 9 && pq.height == 8)
    assert(pq.luma_max == 128 && pq.luma_min == 64) // 128 − 8·8
  }

  test("videoQuality: exact sample-table verdicts, table-less " +
    "fallback, hand-computed pins") {
    // 3 samples of 5/0/7 bytes, 2000 ms: media = 12, one zero sample,
    // bitrate = 12·8000/2000 = 48
    val mp4 = Multimodal.encodeMp4WithSamples(320, 240, 2000L,
      Array(Array.fill(5)(1.toByte), Array.empty[Byte],
        Array.fill(7)(2.toByte)))
    assert(Multimodal.videoQuality(mp4).get ==
      Multimodal.VideoQuality("mp4", 320, 240, 2000L, 1, 3L, 12L,
        0L, 7L, 1L, 48L))
    // integer division truncates: 12 bytes over 7000 ms = 13 bps
    val odd = Multimodal.encodeMp4WithSamples(320, 240, 7000L,
      Array(Array.fill(12)(1.toByte)))
    assert(Multimodal.videoQuality(odd).get.bitrate_bps == 13L)
    // table-less containers keep header fields, report the fallback
    val avi = Multimodal.encodeAviStub(640, 480, 40000, 100, 1)
    assert(Multimodal.videoQuality(avi).get ==
      Multimodal.VideoQuality("avi", 640, 480, 4000L, 1, 0L, 0L,
        -1L, -1L, 0L, -1L))
    // total-function contract
    assert(Multimodal.videoQuality(null).isEmpty)
    assert(Multimodal.videoQuality("junk-not-a-container".getBytes)
      .isEmpty)
    // distributed: struct column, null for undecodable payloads
    val rows = Seq((1L, mp4), (2L, "junk".getBytes))
      .toDF("id", "payload")
    val out = Multimodal.extractVideoQuality(rows, "payload")
      .select(col("id"), col("video_q.n_zero")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out == Map(1L -> Some(1L), 2L -> None))
  }

  test("audioNearDups: near-identical clips pair, distinct ones don't") {
    val base = 0x0F0F0F0F0F0F0F0FL
    val clips = Seq(
      (1L, base), (2L, base ^ (1L << 17)),
      (3L, base ^ (1L << 3) ^ (1L << 40)), (4L, ~base))
      .toDF("id", "code")
    val wavs = Multimodal.synthesizeAudioPatternWavs(clips, "code",
      "payload").select("id", "payload")
    val pairs = Multimodal.audioNearDups(wavs, "payload", "id",
        maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(pairs == Set((1L, 2L, 1), (1L, 3L, 2)))
    // undecodable rows drop out of the fingerprint frame entirely
    val withJunk = wavs.unionByName(Seq((9L, "junk".getBytes))
      .toDF("id", "payload"))
    assert(Multimodal.audioHashes(withJunk, "payload", "id")
      .count() == 4)
  }

  test("exifTriage: orientation/GPS/DateTime/ICC verdicts from the " +
      "JPEG header in both byte orders; ICC sums across chunks; " +
      "tag-less JPEG parses with null orientation; truncation and " +
      "non-JPEG refuse") {
    val dt = "2024:01:05 00:00:00"
    val full = Multimodal.encodeJpegExifStub(20, 10, 6, hasGps = true,
      iccBytes = 128, dateTime = dt, littleEndian = false)
    val got = Multimodal.exifTriage(full).get
    assert(got == Multimodal.ExifTriage(20L, 10L, Some(6L),
      needs_rotation = true, has_gps = true, Some(dt), 128L,
      has_icc = true))
    // little-endian TIFF parses to the identical verdicts
    val le = Multimodal.encodeJpegExifStub(20, 10, 6, hasGps = true,
      iccBytes = 128, dateTime = dt, littleEndian = true)
    assert(Multimodal.exifTriage(le).get == got)
    // upright, no GPS, no DateTime, no ICC
    val plain = Multimodal.encodeJpegExifStub(8, 9, 1, hasGps = false,
      iccBytes = 0, dateTime = null, littleEndian = false)
    assert(Multimodal.exifTriage(plain).get ==
      Multimodal.ExifTriage(8L, 9L, Some(1L), needs_rotation = false,
        has_gps = false, None, 0L, has_icc = false))
    // hand-built JPEG with NO APP1 at all: dims parse, orientation null
    val noExif = Array[Int](0xff, 0xd8,
      0xff, 0xc0, 0x00, 0x11, 8, 0, 10, 0, 20, 3,
      1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0,
      0xff, 0xd9).map(_.toByte)
    assert(Multimodal.exifTriage(noExif).get ==
      Multimodal.ExifTriage(20L, 10L, None, needs_rotation = false,
        has_gps = false, None, 0L, has_icc = false))
    // refusals: truncated header, PNG magic, null
    assert(Multimodal.exifTriage(full.take(6)).isEmpty)
    assert(Multimodal.exifTriage(
      Array[Int](0x89, 0x50, 0x4e, 0x47, 0, 0, 0, 0)
        .map(_.toByte)).isEmpty)
    assert(Multimodal.exifTriage(null).isEmpty)
    intercept[IllegalArgumentException](
      Multimodal.encodeJpegExifStub(1, 1, 0, hasGps = false,
        iccBytes = 0, dateTime = null, littleEndian = false))
  }

  test("ingestBinaryFiles: binaryFile-source on-ramp — glob prunes " +
      "non-media files, the length guard skips oversized payloads " +
      "without reading them, and ingested bytes decode end to end") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_binfiles").toString
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), bytes): Unit
    put("a.png", Multimodal.encodeSolidPng(4, 3, 255, 0, 0))
    put("b.png", Multimodal.encodeSolidPng(7, 5, 0, 255, 0))
    put("big.png", Multimodal.encodeGradientPng(64, 64, 7, 3, 5))
    put("notes.txt", "not an image".getBytes("UTF-8"))
    val got = Multimodal.ingestBinaryFiles(spark, dir, glob = "*.png")
      .collect().map(r => r.getAs[String]("file_name") ->
        r.getAs[Array[Byte]]("bytes")).toMap
    assert(got.keySet == Set("a.png", "b.png", "big.png"),
      "glob admits only the media files")
    val info = Multimodal.decodeImage(got("b.png"))
    assert(info.exists(i => i.width == 7 && i.height == 5),
      "ingested bytes decode end to end")
    // metadata struct rides along: n_bytes equals the payload length
    val meta = Multimodal.ingestBinaryFiles(spark, dir, glob = "a.png")
      .select("media_meta.n_bytes", "media_meta.media_type")
      .head()
    assert(meta.getLong(0) == got("a.png").length.toLong &&
      meta.getString(1) == "image")
    // oversized payloads prune on the pushed length filter
    val cap = got("a.png").length
      .max(got("b.png").length).toLong
    val small = Multimodal.ingestBinaryFiles(spark, dir,
      glob = "*.png", maxBytes = cap)
      .collect().map(_.getAs[String]("file_name")).toSet
    assert(small == Set("a.png", "b.png"),
      s"length guard must drop big.png, kept $small")
    intercept[IllegalArgumentException](
      Multimodal.ingestBinaryFiles(spark, dir, maxBytes = 0L))
  }
}
