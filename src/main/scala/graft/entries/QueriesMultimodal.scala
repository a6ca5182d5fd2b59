package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.GraphConfig
import graft.functions.{GraftFunctions => GF, VectorFunctions => VF}
import graft.operators._
import graft.streaming.StreamingIngest

/** multimodal X5 (media metadata, decode, resize/resample, perceptual near-dups) — one slice of the [[SparkEntry]] driver contract
  * (12 queries). Chunks moved verbatim from SparkEntry.scala;
  * the assembled `queries`/`oracleSql` maps are unchanged. */
private[graft] object QueriesMultimodal {
  import EntryData._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- X5: multimodal metadata plumbing (binary + typed struct) ----
    "q_x5_media_meta" -> ((s, dir) => {
      val bin = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.withMediaMetadata(bin, "payload", "text/plain")
        .select(col("doc_id"),
          col("media_meta.media_type").as("media_type"),
          col("media_meta.n_bytes").as("n_bytes"),
          col("media_meta.checksum").as("checksum"))
        .orderBy("doc_id")
    }),

    // ---- X5b: batched per-partition feature extraction (stub codec) —
    // text payloads are no image, so the byte-histogram fallback runs;
    // the oracle reproduces its float32 accumulation step by step ----
    "q_x5b_media_features" -> ((s, dir) => {
      val bin = t(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.extractFeatures(bin, "payload")
        .select(col("doc_id"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
        .orderBy("doc_id")
    }),

    // ---- X5c: REAL image decode — distributed PNG synthesis (dimensions +
    // colour derived from doc_id) → javax.imageio decode → (w, h, bands,
    // channel means). The oracle recomputes the expected values purely
    // arithmetically, so the decode round-trip is hash-checked. ----
    "q_x5c_image_features" -> ((s, dir) => {
      val spec = t(s, dir, "documents").select(col("doc_id"),
        ((col("doc_id") % 16) + 1).cast("int").as("w"),
        ((col("doc_id") % 11) + 2).cast("int").as("h"),
        (col("doc_id") % 256).cast("int").as("r"),
        ((col("doc_id") * 7) % 256).cast("int").as("g"),
        ((col("doc_id") * 13) % 256).cast("int").as("b"))
      val png = Multimodal.synthesizePngs(spec, "w", "h", "r", "g", "b",
        "payload")
      Multimodal.extractFeatures(png, "payload")
        .select(col("doc_id"),
          element_at(col("features"), 1).cast("long").as("width"),
          element_at(col("features"), 2).cast("long").as("height"),
          element_at(col("features"), 3).cast("long").as("bands"),
          round(element_at(col("features"), 4) * 255).cast("long").as("mean_r"),
          round(element_at(col("features"), 5) * 255).cast("long").as("mean_g"),
          round(element_at(col("features"), 6) * 255).cast("long").as("mean_b"))
        .orderBy("doc_id")
    }),

    // ---- X5g: REAL image resize — synthesize solid PNGs, resize through
    // the nearest-neighbor decode→scale→re-encode kernel to a fixed 9×7,
    // then decode AGAIN: dimensions become the literal target and a solid
    // colour survives any interpolation exactly, so the oracle is pure
    // doc_id arithmetic (same scheme as q_x5c). ----
    "q_x5g_image_resize" -> ((s, dir) => {
      val spec = t(s, dir, "documents").select(col("doc_id"),
        ((col("doc_id") % 16) + 1).cast("int").as("w"),
        ((col("doc_id") % 11) + 2).cast("int").as("h"),
        (col("doc_id") % 256).cast("int").as("r"),
        ((col("doc_id") * 7) % 256).cast("int").as("g"),
        ((col("doc_id") * 13) % 256).cast("int").as("b"))
      val png = Multimodal.synthesizePngs(spec, "w", "h", "r", "g", "b",
        "payload")
      val resized = Multimodal.resizeImages(png, "payload", 9, 7, "small")
      Multimodal.extractFeatures(resized, "small")
        .select(col("doc_id"),
          element_at(col("features"), 1).cast("long").as("width"),
          element_at(col("features"), 2).cast("long").as("height"),
          element_at(col("features"), 3).cast("long").as("bands"),
          round(element_at(col("features"), 4) * 255).cast("long").as("mean_r"),
          round(element_at(col("features"), 5) * 255).cast("long").as("mean_g"),
          round(element_at(col("features"), 6) * 255).cast("long").as("mean_b"))
        .orderBy("doc_id")
    }),

    // ---- X5i: image near-duplicate detection — the missing dedup
    // modality (text MinHash/SimHash ✓, embeddings SemDeDup ✓, images
    // here): dHash64 perceptual fingerprints over REAL decoded PNGs,
    // then the shared SimHash Hamming-banding machinery. Fixture
    // images are dHash-pattern PNGs whose hash equals a code that is
    // pure doc_id arithmetic: groups of 4 docs share a 12-bit group
    // value spread over bits 4..63 at 5× repetition (cross-group
    // Hamming ≥ 5), member m = doc_id%4 sets bits 0..m-1 (in-group
    // Hamming = |Δm|) — so near-dup pairs at radius 2 are exactly the
    // equal-group-value pairs with |Δm| ≤ 2, DuckDB-checkable with no
    // image decode on the oracle side. ----
    "q_x5i_image_neardups" -> ((s, dir) => {
      val groupTerms = (0 until 12).map(j =>
        s"(shiftright((doc_id div 4) % 4096, $j) & 1) * ${31L << (4 + 5 * j)}L")
        .mkString(" + ")
      val spec = t(s, dir, "documents").select(col("doc_id"),
        expr(s"shiftleft(1L, cast(doc_id % 4 as int)) - 1L + $groupTerms")
          .as("code"))
      val pngs = Multimodal.synthesizeDhashPatternPngs(spec, "code",
        "payload").select("doc_id", "payload")
      Multimodal.imageNearDups(pngs, "payload", "doc_id", maxHamming = 2)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // ---- X5j: audio near-duplicate detection — the last dedup
    // modality (text ✓, embeddings ✓, images ✓, audio here):
    // energy-envelope fingerprints over REAL synthesized-and-decoded
    // WAVs, then the shared SimHash Hamming-banding machinery. Fixture
    // clips are amplitude-pattern WAVs whose fingerprint equals a code
    // that is the q_x5i doc_id arithmetic verbatim (groups of 4 share
    // a 12-bit group value at 5× repetition, member m = doc_id%4 sets
    // a nested bit prefix), so near-dup pairs at radius 2 are exactly
    // the equal-group pairs with |Δm| ≤ 2 — DuckDB-checkable with no
    // audio decode on the oracle side. ----
    "q_x5j_audio_neardups" -> ((s, dir) => {
      val groupTerms = (0 until 12).map(j =>
        s"(shiftright((doc_id div 4) % 4096, $j) & 1) * ${31L << (4 + 5 * j)}L")
        .mkString(" + ")
      val spec = t(s, dir, "documents").select(col("doc_id"),
        expr(s"shiftleft(1L, cast(doc_id % 4 as int)) - 1L + $groupTerms")
          .as("code"))
      val wavs = Multimodal.synthesizeAudioPatternWavs(spec, "code",
        "payload").select("doc_id", "payload")
      Multimodal.audioNearDups(wavs, "payload", "doc_id", maxHamming = 2)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // ---- X5l: video near-duplicate detection — completes the dedup
    // modality grid (text ✓ embeddings ✓ images ✓ audio ✓ video
    // here): SimHash of portable frame-payload hashes over REAL
    // ISO-BMFF sample tables, then the shared Hamming banding.
    // Fixture videos share 64 group-keyed coded frames with 0–3
    // member-keyed extras, so trimmed/extended copies land within
    // radius 8 while distinct groups sit ~24 bits apart; the oracle
    // rebuilds the frame strings, replays the 48-bit md5 hash and the
    // strict-majority vote, and computes all-pairs Hamming — a full
    // independent reimplementation, exact to the bit. ----
    "q_x5l_video_neardups" -> ((s, dir) => {
      val spec = t(s, dir, "documents").select(col("doc_id"),
        expr("concat(" +
          "transform(sequence(0, 63), i -> concat('f:', " +
          "cast(doc_id div 4 as string), ':', cast(i as string))), " +
          "filter(transform(sequence(0, 2), j -> if(j < doc_id % 4, " +
          "concat('m:', cast(doc_id as string), ':', " +
          "cast(j as string)), null)), x -> x is not null))")
          .as("frames"))
      val vids = Multimodal.synthesizeSampleVideos(spec, "frames",
        "payload").select("doc_id", "payload")
      Multimodal.videoNearDups(vids, "payload", "doc_id",
          maxHamming = 8, portable = true)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // ---- X5d: REAL audio decode — distributed WAV synthesis (format +
    // constant amplitude derived from doc_id) → javax.sound decode →
    // (sample_rate, channels, n_frames, rms). Constant-amplitude PCM has
    // RMS exactly equal to the amplitude, so the oracle is arithmetic. ----
    "q_x5d_audio_features" -> ((s, dir) => {
      val spec = t(s, dir, "documents").select(col("doc_id"),
        (lit(8000) + (col("doc_id") % 4) * 2000).cast("int").as("rate"),
        (lit(100) + col("doc_id") % 50).cast("int").as("frames"),
        ((col("doc_id") % 900) + 1).cast("int").as("amp"))
      val wav = Multimodal.synthesizeWavs(spec, "rate", "frames", "amp",
        "payload")
      Multimodal.extractAudioInfo(wav, "payload")
        .select(col("doc_id"),
          col("audio.sample_rate").cast("long").as("sample_rate"),
          col("audio.channels").cast("long").as("channels"),
          col("audio.n_frames").as("n_frames"),
          round(col("audio.rms")).cast("long").as("amp"))
        .orderBy("doc_id")
    }),

    // ---- X5k: audio quality triage — exact integer clipping /
    // silence / peak / level counts over the raw PCM samples; fixture
    // WAVs are constant-amplitude with every 7th doc pinned to full
    // scale (clipping) and small amps falling under the silence
    // threshold, so every stat is pure doc_id arithmetic. ----
    "q_x5k_audio_quality" -> ((s, dir) => {
      val spec = t(s, dir, "documents").select(col("doc_id"),
        (lit(8000) + (col("doc_id") % 4) * 2000).cast("int").as("rate"),
        (lit(100) + col("doc_id") % 50).cast("int").as("frames"),
        when(col("doc_id") % 7 === 0, lit(32767))
          .otherwise((col("doc_id") % 900) + 1).cast("int").as("amp"))
      val wav = Multimodal.synthesizeWavs(spec, "rate", "frames", "amp",
        "payload")
      Multimodal.extractAudioQuality(wav, "payload")
        .select(col("doc_id"),
          col("audio_q.n_samples").as("n_samples"),
          col("audio_q.n_clipped").as("n_clipped"),
          col("audio_q.n_silent").as("n_silent"),
          col("audio_q.peak").as("peak"),
          col("audio_q.sum_abs").as("sum_abs"))
        .orderBy("doc_id")
    }),

    // ---- X5m: image quality triage — the image twin of X5k: per-doc
    // gradient PNGs (w, h, base, steps all doc_id arithmetic; every
    // ninth doc a SOLID), REAL decode, then exact integer luma
    // verdicts: exposure counts at the 250/5 thresholds, histogram
    // bounds (contrast spread), modal count (solid detection). Gray
    // pixels make luma == the written value exactly (1000·v div 1000),
    // so the oracle re-derives every count from the (x, y) grid. ----
    "q_x5m_image_quality" -> ((s, dir) => {
      val spec = t(s, dir, "documents").select(col("doc_id"),
        (lit(4) + col("doc_id") % 13).cast("int").as("w"),
        (lit(2) + col("doc_id") % 7).cast("int").as("h"),
        (col("doc_id") % 200).cast("int").as("base"),
        when(col("doc_id") % 9 === 0, lit(0)).otherwise(lit(7))
          .cast("int").as("sx"),
        when(col("doc_id") % 9 === 0, lit(0)).otherwise(lit(13))
          .cast("int").as("sy"))
      val png = Multimodal.synthesizeGradientPngs(spec, "w", "h",
        "base", "sx", "sy", "payload")
      Multimodal.extractImageQuality(png, "payload")
        .select(col("doc_id"),
          col("image_q.width").cast("long").as("width"),
          col("image_q.height").cast("long").as("height"),
          col("image_q.n_pixels").as("n_pixels"),
          col("image_q.n_over").as("n_over"),
          col("image_q.n_under").as("n_under"),
          col("image_q.luma_min").cast("long").as("luma_min"),
          col("image_q.luma_max").cast("long").as("luma_max"),
          col("image_q.n_modal").as("n_modal"),
          when(col("image_q.n_modal") === col("image_q.n_pixels"),
            lit(1L)).otherwise(lit(0L)).as("is_solid"))
        .orderBy("doc_id")
    }),

    // ---- X5n: video quality triage — the video member of the
    // per-modality quality grid (X5k audio, X5m image): real MP4s
    // with full sample tables synthesized from doc_id arithmetic
    // (q_x5f's fixture shape; every 11th doc carries a ZERO-byte
    // first sample — the corruption counter must catch it), then
    // exact integer verdicts from the parsed stsz table: sample
    // count/bytes/bounds, zero-sample count, integer-division
    // bitrate. ----
    "q_x5n_video_quality" -> ((s, dir) => {
      import s.implicits._
      val withPayload = t(s, dir, "documents").select(col("doc_id"))
        .as[Long]
        .map { id =>
          val nf = (id % 4 + 2).toInt
          val samples = Array.tabulate(nf) { i =>
            val len =
              if (id % 11 == 0 && i == 0) 0
              else ((id + i) % 50 + 10).toInt
            Array.fill(len)(((id + i) % 256).toByte)
          }
          (id, Multimodal.encodeMp4WithSamples(64, 48,
            500L + (id % 10) * 100L, samples))
        }.toDF("doc_id", "payload")
      Multimodal.extractVideoQuality(withPayload, "payload")
        .select(col("doc_id"),
          col("video_q.container").as("container"),
          col("video_q.width").cast("long").as("width"),
          col("video_q.height").cast("long").as("height"),
          col("video_q.duration_ms").as("duration_ms"),
          col("video_q.n_tracks").cast("long").as("n_tracks"),
          col("video_q.n_samples").as("n_samples"),
          col("video_q.media_bytes").as("media_bytes"),
          col("video_q.min_sample").as("min_sample"),
          col("video_q.max_sample").as("max_sample"),
          col("video_q.n_zero").as("n_zero"),
          col("video_q.bitrate_bps").as("bitrate_bps"))
        .orderBy("doc_id")
    }),

    // ---- X5p: EXIF/ICC metadata triage — the header-only verdicts a
    // vision pipeline filters on BEFORE decode: orientation (needs
    // rotation), GPS presence (location PII), capture DateTime, ICC
    // profile mass (summed across the two APP2 chunks the encoder
    // always splits into), SOF dims. Fixtures are exact functions of
    // doc_id (both TIFF byte orders exercised via the %2 split);
    // every 13th payload truncates mid-header → null struct. ----
    "q_x5p_exif_triage" -> ((s, dir) => {
      val spec = t(s, dir, "documents").select(col("doc_id"),
        (col("doc_id") % 30 + 8).cast("int").as("w"),
        (col("doc_id") % 17 + 8).cast("int").as("h"),
        (col("doc_id") % 8 + 1).cast("int").as("orient"),
        (col("doc_id") % 5 === 0).as("gps"),
        ((col("doc_id") % 4) * 64).cast("int").as("icc"),
        when(col("doc_id") % 3 =!= 0,
          concat(lit("2024:01:"),
            lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
            lit(" 00:00:00"))).as("dt"),
        (col("doc_id") % 2 === 0).as("le"))
      val payload = Multimodal.synthesizeExifJpegs(spec, "w", "h",
          "orient", "gps", "icc", "dt", "le", "img")
        .withColumn("img",
          when(col("doc_id") % 13 === 0, expr("substring(img, 1, 6)"))
            .otherwise(col("img")))
      // nullable verdict BOOLEANS integerize to 0/1 BIGINT: a null
      // boolean round-trips as pandas None on the Spark side but NaN
      // on the DuckDB side, and the driver's string-hash compare
      // distinguishes them — numeric nulls are NaN on both
      Multimodal.extractExifTriage(payload, "img")
        .select(col("doc_id"),
          col("exif_q").isNotNull.as("decodable"),
          col("exif_q.width").as("width"),
          col("exif_q.height").as("height"),
          col("exif_q.orientation").as("orientation"),
          col("exif_q.needs_rotation").cast("long")
            .as("needs_rotation"),
          col("exif_q.has_gps").cast("long").as("has_gps"),
          col("exif_q.exif_datetime").as("exif_datetime"),
          col("exif_q.icc_bytes").as("icc_bytes"),
          col("exif_q.has_icc").cast("long").as("has_icc"))
        .orderBy("doc_id")
    }),

    // ---- X5h: REAL audio resample — synthesize WAVs (per-doc rate ∈
    // {8k..14k}, constant amplitude), resample all to 6 kHz by
    // nearest-neighbor frame selection, decode again: rate is the literal
    // target, frame count is exact integer arithmetic
    // ⌊frames·6000/rate⌋, and a constant-amplitude signal keeps RMS ==
    // amp through any frame selection — fully arithmetic oracle. ----
    "q_x5h_audio_resample" -> ((s, dir) => {
      val spec = t(s, dir, "documents").select(col("doc_id"),
        (lit(8000) + (col("doc_id") % 4) * 2000).cast("int").as("rate"),
        (lit(100) + col("doc_id") % 50).cast("int").as("frames"),
        ((col("doc_id") % 900) + 1).cast("int").as("amp"))
      val wav = Multimodal.synthesizeWavs(spec, "rate", "frames", "amp",
        "payload")
      val res = Multimodal.resampleAudios(wav, "payload", 6000, "resampled")
      Multimodal.extractAudioInfo(res, "resampled")
        .select(col("doc_id"),
          col("audio.sample_rate").cast("long").as("sample_rate"),
          col("audio.channels").cast("long").as("channels"),
          col("audio.n_frames").as("n_frames"),
          round(col("audio.rms")).cast("long").as("amp"))
        .orderBy("doc_id")
    }),

    // ---- X5e: REAL video-container metadata — distributed MP4/AVI header
    // synthesis (dimensions + duration derived from doc_id, container
    // alternating by parity) → ISO-BMFF / RIFF header parse → (container,
    // w, h, duration_ms, n_tracks). AVI synthesis runs at 25 fps, so its
    // recovered duration is frames×40 ms — the oracle mirrors both paths
    // arithmetically. ----
    "q_x5e_video_meta" -> ((s, dir) => {
      val spec = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("mp4")).otherwise(lit("avi"))
          .as("container"),
        ((col("doc_id") % 320) + 16).cast("int").as("w"),
        ((col("doc_id") % 240) + 16).cast("int").as("h"),
        (((col("doc_id") % 100) + 1) * 40).cast("long").as("dur_ms"))
      val vids = Multimodal.synthesizeVideos(spec, "container", "w", "h",
        "dur_ms", "payload")
      Multimodal.extractVideoMeta(vids, "payload")
        .select(col("doc_id"),
          col("video.container").as("container"),
          col("video.width").cast("long").as("width"),
          col("video.height").cast("long").as("height"),
          col("video.duration_ms").as("duration_ms"),
          col("video.n_tracks").cast("long").as("n_tracks"))
        .orderBy("doc_id")
    }),

    // ---- X5f: REAL MP4 frame sampling — per-row synthesis of an MP4 with
    // a full stsz/stsc/stco sample table (frame count + sizes derived from
    // doc_id), then every 2nd sample's exact byte range re-extracted via
    // the table. The oracle regenerates index + length arithmetically. ----
    "q_x5f_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val withPayload = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val nf = (id % 4 + 2).toInt
          val samples = Array.tabulate(nf) { i =>
            Array.fill(((id + i) % 50 + 10).toInt)(((id + i) % 256).toByte)
          }
          (id, Multimodal.encodeMp4WithSamples(64, 48, 1000, samples))
        }.toDF("doc_id", "payload")
      Multimodal.sampleVideoFrames(withPayload, "payload", stride = 2)
        .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
          length(col("frame_bytes")).cast("long").as("frame_len"))
        .orderBy("doc_id", "frame_idx")
    }),
  )

  def oracles: Map[String, String] = Map(
    // The stub-codec fallback feature, reproduced to the BIT: f0 is a
    // float32 sequential accumulation (bytes at positions ≡ 0 mod 8,
    // each /255f), so the oracle list_reduces with a CAST-to-FLOAT per
    // step — per-step rounding included — before the final /len and
    // ROUND.
    "q_x5b_media_features" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents
        |), e AS (
        |  SELECT doc_id, n, u.i,
        |    CAST(concat('0x', substr(hx, u.i * 2 - 1, 2)) AS INTEGER) AS byte
        |  FROM b, LATERAL (SELECT unnest(range(1, length(hx) // 2 + 1)) AS i) u
        |  WHERE (u.i - 1) % 8 = 0
        |), f AS (
        |  SELECT doc_id, any_value(n) AS n,
        |    list_reduce(list_prepend(CAST(0 AS FLOAT),
        |        list(CAST(CAST(byte AS FLOAT) / CAST(255 AS FLOAT) AS FLOAT)
        |          ORDER BY i)),
        |      (acc, x) -> CAST(acc + x AS FLOAT)) AS s
        |  FROM e GROUP BY doc_id
        |)
        |SELECT doc_id,
        |  ROUND(CAST(CAST(s / CAST(n AS FLOAT) AS FLOAT) AS DOUBLE), 4)
        |    AS f0
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_x5_media_meta" ->
      """SELECT doc_id, 'text/plain' AS media_type,
        |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |sha256(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Expected image features are pure doc_id arithmetic (solid-colour PNG:
    // decoded means are exactly the fill channels) — the Spark side really
    // encodes + ImageIO-decodes every payload.
    "q_x5c_image_features" ->
      """SELECT doc_id,
        |(doc_id % 16) + 1 AS width,
        |(doc_id % 11) + 2 AS height,
        |CAST(3 AS BIGINT) AS bands,
        |doc_id % 256 AS mean_r,
        |(doc_id * 7) % 256 AS mean_g,
        |(doc_id * 13) % 256 AS mean_b
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Near-dup pairs are pure doc_id arithmetic: the dHash of each
    // pattern PNG equals its code by construction (spec-verified
    // round-trip), codes share all 60 group bits iff the docs' 12-bit
    // group values match, and member bits are nested prefixes so
    // in-group Hamming is |Δm|. The oracle never decodes an image.
    "q_x5i_image_neardups" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id // 4) % 4096 AS gc, doc_id % 4 AS m
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(abs(a.m - b.m) AS BIGINT) AS hamming
        |FROM d a JOIN d b
        |  ON a.doc_id < b.doc_id AND a.gc = b.gc AND abs(a.m - b.m) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Same scheme as q_x5i, for sound: the audio fingerprint of each
    // pattern WAV equals its code by construction (spec-verified
    // round-trip), so near-dup pairs are the same pure doc_id
    // arithmetic — the oracle never decodes audio.
    "q_x5j_audio_neardups" ->
      """WITH d AS (
        |  SELECT doc_id, (doc_id // 4) % 4096 AS gc, doc_id % 4 AS m
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(abs(a.m - b.m) AS BIGINT) AS hamming
        |FROM d a JOIN d b
        |  ON a.doc_id < b.doc_id AND a.gc = b.gc AND abs(a.m - b.m) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Full independent rebuild: same frame strings, same 48-bit md5
    // hash (single-quoted SQL keeps nothing to escape here), same
    // strict-majority vote per bit position via a range(48) melt, then
    // all-pairs xor popcount — no banding needed at oracle scale, and
    // banding is lossless so the pair sets agree exactly.
    "q_x5l_video_neardups" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS m
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id,
        |    'f:' || g::VARCHAR || ':' || i::VARCHAR AS s
        |  FROM d, range(64) t(i)
        |  UNION ALL
        |  SELECT doc_id,
        |    'm:' || doc_id::VARCHAR || ':' || j::VARCHAR
        |  FROM d, range(3) t(j) WHERE j < m),
        |h AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5('42:' || s), 1, 12))
        |      AS BIGINT) AS fh
        |  FROM fr),
        |nb AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
        |bc AS (
        |  SELECT doc_id, b, sum((fh >> b) & 1) AS c
        |  FROM h, range(48) t(b) GROUP BY doc_id, b),
        |fp AS (
        |  SELECT bc.doc_id,
        |    CAST(sum(CASE WHEN 2 * c > n THEN (1::BIGINT << b)
        |      ELSE 0 END) AS BIGINT) AS f
        |  FROM bc JOIN nb ON nb.doc_id = bc.doc_id
        |  GROUP BY bc.doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.f, b.f)) <= 8
        |ORDER BY id_a, id_b""".stripMargin,

    // Resized dimensions are the literal 9×7 target; a solid colour is
    // interpolation-invariant, so means are the source doc_id arithmetic.
    "q_x5g_image_resize" ->
      """SELECT doc_id,
        |CAST(9 AS BIGINT) AS width,
        |CAST(7 AS BIGINT) AS height,
        |CAST(3 AS BIGINT) AS bands,
        |doc_id % 256 AS mean_r,
        |(doc_id * 7) % 256 AS mean_g,
        |(doc_id * 13) % 256 AS mean_b
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Constant-amplitude fixtures make every quality stat doc_id
    // arithmetic: full-scale docs clip on every sample, small-amp docs
    // sit entirely under the 327 silence threshold, peak IS the
    // amplitude and sum_abs its product with the frame count.
    "q_x5k_audio_quality" ->
      """SELECT doc_id,
        |CAST(100 + doc_id % 50 AS BIGINT) AS n_samples,
        |CAST(CASE WHEN doc_id % 7 = 0 THEN 100 + doc_id % 50 ELSE 0
        |  END AS BIGINT) AS n_clipped,
        |CAST(CASE WHEN doc_id % 7 <> 0 AND (doc_id % 900) + 1 <= 327
        |  THEN 100 + doc_id % 50 ELSE 0 END AS BIGINT) AS n_silent,
        |CAST(CASE WHEN doc_id % 7 = 0 THEN 32767
        |  ELSE (doc_id % 900) + 1 END AS BIGINT) AS peak,
        |CAST((CASE WHEN doc_id % 7 = 0 THEN 32767
        |  ELSE (doc_id % 900) + 1 END) * (100 + doc_id % 50)
        |  AS BIGINT) AS sum_abs
        |FROM documents ORDER BY doc_id""".stripMargin,

    // EXIF triage rebuild: the fixture is a pure function of doc_id,
    // so the oracle re-derives every verdict arithmetically — the
    // engine's parse must recover exactly the encoded header (the
    // q_x5n discipline); truncated payloads (%13) null every verdict.
    "q_x5p_exif_triage" ->
      """SELECT doc_id,
        |  (doc_id % 13 <> 0) AS decodable,
        |  CASE WHEN doc_id % 13 <> 0 THEN doc_id % 30 + 8 END AS width,
        |  CASE WHEN doc_id % 13 <> 0 THEN doc_id % 17 + 8 END AS height,
        |  CASE WHEN doc_id % 13 <> 0 THEN doc_id % 8 + 1 END
        |    AS orientation,
        |  CASE WHEN doc_id % 13 <> 0 THEN
        |    CAST((doc_id % 8 + 1) >= 2 AS BIGINT) END AS needs_rotation,
        |  CASE WHEN doc_id % 13 <> 0 THEN
        |    CAST(doc_id % 5 = 0 AS BIGINT) END AS has_gps,
        |  CASE WHEN doc_id % 13 <> 0 AND doc_id % 3 <> 0 THEN
        |    '2024:01:' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |      || ' 00:00:00' END AS exif_datetime,
        |  CASE WHEN doc_id % 13 <> 0 THEN (doc_id % 4) * 64 END
        |    AS icc_bytes,
        |  CASE WHEN doc_id % 13 <> 0 THEN
        |    CAST((doc_id % 4) * 64 > 0 AS BIGINT) END AS has_icc
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Every verdict re-derives from the fixture arithmetic: per-doc
    // sample sizes via a bounded range (nf ≤ 5), the zero-sample
    // override for every 11th doc, header constants, and the engine's
    // integer-division bitrate mirrored with DuckDB's `//`.
    "q_x5n_video_quality" ->
      """WITH d AS (SELECT doc_id, doc_id % 4 + 2 AS nf,
        |    500 + (doc_id % 10) * 100 AS dur
        |  FROM documents),
        |sz AS (SELECT d.doc_id, d.nf, d.dur,
        |    CASE WHEN d.doc_id % 11 = 0 AND i.i = 0 THEN 0
        |         ELSE (d.doc_id + i.i) % 50 + 10 END AS s
        |  FROM d, range(6) i(i) WHERE i.i < d.nf),
        |agg AS (SELECT doc_id, dur,
        |    CAST(count(*) AS BIGINT) AS n_samples,
        |    CAST(sum(s) AS BIGINT) AS media_bytes,
        |    CAST(min(s) AS BIGINT) AS min_sample,
        |    CAST(max(s) AS BIGINT) AS max_sample,
        |    CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_zero
        |  FROM sz GROUP BY 1, 2)
        |SELECT doc_id, 'mp4' AS container, CAST(64 AS BIGINT) AS width,
        |  CAST(48 AS BIGINT) AS height, CAST(dur AS BIGINT)
        |    AS duration_ms,
        |  CAST(1 AS BIGINT) AS n_tracks, n_samples, media_bytes,
        |  min_sample, max_sample, n_zero,
        |  CAST(media_bytes * 8000 // dur AS BIGINT) AS bitrate_bps
        |FROM agg ORDER BY doc_id""".stripMargin,

    // The gradient fixture's pixel luma is (base + x·sx + y·sy) mod 256
    // exactly (gray r=g=b makes the BT.601 fixed-point a no-op), so
    // every verdict re-derives from the (x, y) grid: cross join two
    // bounded ranges (max w = 16, max h = 8), aggregate per doc, modal
    // count from the per-value histogram.
    "q_x5m_image_quality" ->
      """WITH d AS (SELECT doc_id, 4 + doc_id % 13 AS w,
        |    2 + doc_id % 7 AS h, doc_id % 200 AS base,
        |    CASE WHEN doc_id % 9 = 0 THEN 0 ELSE 7 END AS sx,
        |    CASE WHEN doc_id % 9 = 0 THEN 0 ELSE 13 END AS sy
        |  FROM documents),
        |px AS (SELECT d.doc_id, d.w, d.h,
        |    CAST((d.base + x.x * d.sx + y.y * d.sy) % 256 AS BIGINT) AS v
        |  FROM d, range(17) x(x), range(9) y(y)
        |  WHERE x.x < d.w AND y.y < d.h),
        |agg AS (SELECT doc_id, w, h,
        |    CAST(count(*) AS BIGINT) AS n_pixels,
        |    CAST(sum(CASE WHEN v >= 250 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_over,
        |    CAST(sum(CASE WHEN v <= 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_under,
        |    min(v) AS luma_min, max(v) AS luma_max
        |  FROM px GROUP BY 1, 2, 3),
        |modal AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS n_modal
        |  FROM (SELECT doc_id, v, count(*) AS c FROM px
        |        GROUP BY doc_id, v) GROUP BY doc_id)
        |SELECT a.doc_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height, n_pixels, n_over, n_under,
        |  luma_min, luma_max, n_modal,
        |  CAST(CASE WHEN n_modal = n_pixels THEN 1 ELSE 0 END
        |    AS BIGINT) AS is_solid
        |FROM agg a JOIN modal USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // Resampled rate is the literal 6 kHz target; the frame count is the
    // integer expression the kernel computes; constant amplitude keeps
    // RMS == amp through nearest-neighbor frame selection.
    "q_x5h_audio_resample" ->
      """SELECT doc_id,
        |CAST(6000 AS BIGINT) AS sample_rate,
        |CAST(1 AS BIGINT) AS channels,
        |((100 + doc_id % 50) * 6000) // (8000 + (doc_id % 4) * 2000)
        |  AS n_frames,
        |(doc_id % 900) + 1 AS amp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Constant-amplitude PCM: RMS == amplitude exactly (sqrt of a perfect
    // square is exact in IEEE double), so every field is doc_id arithmetic.
    "q_x5d_audio_features" ->
      """SELECT doc_id,
        |8000 + (doc_id % 4) * 2000 AS sample_rate,
        |CAST(1 AS BIGINT) AS channels,
        |100 + doc_id % 50 AS n_frames,
        |(doc_id % 900) + 1 AS amp
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Both container paths recover header fields exactly, so every column
    // is doc_id arithmetic — the Spark side really encodes + parses the
    // ISO-BMFF / RIFF structures per row.
    "q_x5e_video_meta" ->
      """SELECT doc_id,
        |CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container,
        |(doc_id % 320) + 16 AS width,
        |(doc_id % 240) + 16 AS height,
        |((doc_id % 100) + 1) * 40 AS duration_ms,
        |CAST(1 AS BIGINT) AS n_tracks
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Frame indices 0, 2, ... below the per-doc frame count; lengths are
    // the same doc_id arithmetic the synthesis used — the Spark side
    // really writes and re-parses the ISO-BMFF sample table per row.
    "q_x5f_frame_sample" ->
      """WITH fx AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, doc_id % 4 + 1, 2)) AS i
        |  FROM documents)
        |SELECT doc_id, i AS frame_idx, (doc_id + i) % 50 + 10 AS frame_len
        |FROM fx ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
