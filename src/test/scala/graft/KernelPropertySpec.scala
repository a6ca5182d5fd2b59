package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{BitKernels, SampleK, TextKernels}

/** Property tests pinning the fused/bounded kernels against brute-force
  * reference implementations over seeded-random inputs — no Spark session
  * needed, so hundreds of cases run in milliseconds. */
class KernelPropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(20260812L)

  // ---- TextProfile vs the regex formulations it replaced ----

  private val alphabet: Array[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toArray ++
      Array(' ', ' ', ' ', '\t', '\n', '\r', '\f', '',
        '.', ',', '!', '?', ';', '@', '[', '`', '~', '-',
        'é', 'ß', '中', 'Ω')

  private def randomText(): String = {
    val len = rng.nextInt(60)
    Array.fill(len)(alphabet(rng.nextInt(alphabet.length))).mkString
  }

  test("textProfile matches regex-reference counters on 300 random texts") {
    for (_ <- 1 to 300) {
      val s = randomText()
      val row = TextKernels.textProfile(UTF8String.fromString(s))
      val trimmed = s.trim
      val toks =
        if (trimmed.isEmpty) Array.empty[String] else trimmed.split("\\s+")
      assert(row.getInt(0) == s.codePointCount(0, s.length), s"n_chars '$s'")
      assert(row.getInt(1) == toks.length, s"n_tokens '$s'")
      val nonws = "\\s+".r.replaceAllIn(s, "")
      assert(row.getInt(2) == nonws.codePointCount(0, nonws.length),
        s"n_nonws '$s'")
      assert(row.getInt(3) == "[\\p{Punct}]".r.findAllIn(s).size,
        s"n_punct '$s'")
      assert(row.getInt(4) == "[A-Z]".r.findAllIn(s).size, s"n_upper '$s'")
      val stopSet = TextKernels.EnglishStopwords.toSet
      assert(row.getInt(5) ==
        toks.count(t => stopSet.contains(t.toLowerCase)), s"n_stop '$s'")
      assert(row.getInt(6) ==
        "[A-Za-z0-9]+|[^A-Za-z0-9\\s]".r.findAllIn(s).size, s"n_bpeish '$s'")
    }
  }

  // ---- Morton interleave: bijectivity and block locality ----

  private def deinterleaveEven(z: Long): Long = {
    var x = z & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    (x | (x >>> 16)) & 0xFFFFFFFFL
  }

  test("morton2 is a bijection on 32-bit pairs (deinterleave inverts)") {
    for (_ <- 1 to 500) {
      val a = rng.nextLong() & 0xFFFFFFFFL
      val b = rng.nextLong() & 0xFFFFFFFFL
      val z = BitKernels.morton2(a, b)
      assert(deinterleaveEven(z) == a, s"even lane of morton2($a, $b)")
      assert(deinterleaveEven(z >>> 1) == b, s"odd lane of morton2($a, $b)")
    }
  }

  test("morton2 block locality: points in an aligned 2^k block share a z-range") {
    val k = 5 // 32×32 block starting at (96, 160)
    val (bx, by) = (96L, 160L)
    val base = BitKernels.morton2(bx, by)
    for (_ <- 1 to 200) {
      val z = BitKernels.morton2(bx + rng.nextInt(1 << k),
        by + rng.nextInt(1 << k))
      assert(z >= base && z < base + (1L << (2 * k)))
    }
  }

  // ---- SampleK vs brute-force bottom-k, across arbitrary merges ----

  test("SampleK state equals brute-force k-smallest-hash under splits+merges") {
    for (_ <- 1 to 200) {
      val n = rng.nextInt(60)
      val ids = List.fill(n)(rng.nextInt(2000).toLong - 1000L)
      val k = 1 + rng.nextInt(24) // > 16 exercises the buffer-growth path
      val cut = if (ids.isEmpty) 0 else rng.nextInt(ids.length + 1)
      val (p1, p2) = ids.splitAt(cut)
      val s1 = new SampleK.State(k)
      val s2 = new SampleK.State(k)
      p1.foreach(id => s1.offer(SampleK.hash64(id, 42L), id))
      p2.foreach(id => s2.offer(SampleK.hash64(id, 42L), id))
      s2.foreach((h, id) => s1.offer(h, id))
      val expected = ids.distinct
        .map(id => (SampleK.hash64(id, 42L), id)).sorted.take(k).map(_._2)
      assert(s1.sortedIds.toSeq == expected,
        s"ids=$ids k=$k cut=$cut")
    }
  }

  // ---- imageQuality: PNG round-trip vs the pixel-grid arithmetic ----

  test("imageQuality matches the gradient-grid arithmetic reference on " +
    "120 random (w, h, base, steps, thresholds)") {
    import graft.operators.Multimodal
    for (_ <- 1 to 120) {
      val w = 1 + rng.nextInt(20)
      val h = 1 + rng.nextInt(12)
      val base = rng.nextInt(512) - 128 // negative bases exercise floorMod
      val sx = rng.nextInt(40) - 20
      val sy = rng.nextInt(40) - 20
      val over = 200 + rng.nextInt(56)
      val under = rng.nextInt(40)
      val png = Multimodal.encodeGradientPng(w, h, base, sx, sy)
      val q = Multimodal.imageQuality(png, over, under).get
      val vals = for { y <- 0 until h; x <- 0 until w }
        yield java.lang.Math.floorMod(base + x * sx + y * sy, 256)
      val hist = vals.groupBy(identity).map(_._2.size)
      assert(q == Multimodal.ImageQuality(w, h, w.toLong * h,
        vals.count(_ >= over).toLong, vals.count(_ <= under).toLong,
        vals.min, vals.max, hist.max.toLong),
        s"w=$w h=$h base=$base sx=$sx sy=$sy over=$over under=$under")
    }
  }

  // ---- videoQuality: MP4 round-trip vs the sample-table arithmetic ----

  test("videoQuality matches the sample-table arithmetic reference on " +
    "120 random (sizes, duration) incl. zero-size samples") {
    import graft.operators.Multimodal
    for (_ <- 1 to 120) {
      val n = 1 + rng.nextInt(8)
      val sizes = Array.fill(n)(
        if (rng.nextInt(5) == 0) 0 else 1 + rng.nextInt(60))
      val dur = rng.nextInt(5000).toLong // 0 exercises the -1 bitrate
      val samples = sizes.map(sz => Array.fill(sz)(rng.nextInt.toByte))
      val mp4 = Multimodal.encodeMp4WithSamples(64, 48, dur, samples)
      val q = Multimodal.videoQuality(mp4).get
      val mb = sizes.map(_.toLong).sum
      assert(q == Multimodal.VideoQuality("mp4", 64, 48, dur, 1,
        n.toLong, mb, sizes.min.toLong, sizes.max.toLong,
        sizes.count(_ == 0).toLong,
        if (dur > 0) mb * 8L * 1000L / dur else -1L),
        s"sizes=${sizes.mkString(",")} dur=$dur")
    }
  }
}
