package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/** HDR-histogram quantile sketch: exact integer bucket math, guaranteed
  * relative error, merge-by-summing, loud exclusion audits. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("hdrHistogram: octave/sub-bucket closed form at k=1 and k=2; " +
      "lower bounds exact") {
    val df = Seq(1L, 2L, 3L, 4L, 12L).toDF("v")
    // k=1: whole octaves. 1→e0; 2,3→e1; 4→e2; 12→e3 (8..15)
    val h1 = Quantiles.hdrHistogram(df, "v", k = 1)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(h1 == Set((0, 0, 1L, 1L), (1, 0, 2L, 2L), (2, 0, 1L, 4L),
      (3, 0, 1L, 8L)))
    // k=2: octave e splits at 2^e + 2^e/2. 3 → (e1, sub1, lo 3);
    // 12 → (e3, sub1, lo 12)
    val h2 = Quantiles.hdrHistogram(df, "v", k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(h2 == Set((0, 0, 1L, 1L), (1, 0, 1L, 2L), (1, 1, 1L, 3L),
      (2, 0, 1L, 4L), (3, 1, 1L, 12L)))
  }

  test("hdrQuantiles: rank rule exact on a hand case; estimates bound " +
      "the true quantile within one bucket") {
    // 1,2,3,4 at k=1: buckets (e0:1) (e1:2) (e2:1); p50 rank=2 → the
    // e1 bucket, lower bound 2 (the true lower-median)
    val df = Seq(1L, 2L, 3L, 4L).toDF("v")
    val q = Quantiles.hdrQuantiles(df, "v", Seq(0.5), k = 1)
      .head()
    assert(q.getLong(0) == 500000L && q.getLong(1) == 2L &&
      q.getLong(2) == 4L)
    // error bound: 1..1000, several quantiles, est ≤ true < est·(1+1/k)+1
    val big = (1L to 1000L).toDF("v")
    val k = 16
    Quantiles.hdrQuantiles(big, "v", Seq(0.25, 0.5, 0.9, 0.99), k = k)
      .collect().foreach { r =>
        val (qe6, est) = (r.getLong(0), r.getLong(1))
        val rank = (qe6 * 1000L + 999999L) / 1000000L
        val truth = rank // values are exactly 1..1000
        assert(est <= truth && truth <= est + est / k + 1,
          s"q=$qe6 est=$est truth=$truth")
      }
  }

  test("hdrHistogram: merging slices by re-summing equals the full " +
      "histogram; partition-invariant") {
    val all = (1L to 500L).map(v => (v % 7, v * 13 % 1000 + 1))
      .toDF("g", "v")
    val full = Quantiles.hdrHistogram(all, "v", 8, Some("g"))
    val sliceA = all.filter($"v" <= 300)
    val sliceB = all.filter($"v" > 300)
    val merged = Quantiles.hdrHistogram(sliceA, "v", 8, Some("g"))
      .unionAll(Quantiles.hdrHistogram(sliceB, "v", 8, Some("g")))
      .groupBy("g", "e", "sub").agg(sum("n").as("n"), max("lo").as("lo"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(key(merged) == key(full))
    val re = Quantiles.hdrHistogram(all.repartition(13), "v", 8, Some("g"))
    assert(key(re) == key(full))
  }

  test("hdrQuantiles: nulls, zeros, and negatives excluded but counted") {
    val df = Seq[(String, java.lang.Long)](("a", 4L), ("a", 8L),
      ("a", null), ("a", 0L), ("a", -3L), ("b", 16L))
      .toDF("g", "v")
    val out = Quantiles.hdrQuantiles(df, "v", Seq(1.0), k = 4, Some("g"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // a: 2 positive values, est = max bucket lo (8); 1 null, 1 neg, 1 zero
    assert(out("a") == ((8L, 2L, 1L, 1L, 1L)))
    assert(out("b") == ((16L, 1L, 0L, 0L, 0L)))
    intercept[IllegalArgumentException](
      Quantiles.hdrQuantiles(df, "v", Seq(1.5), 4, Some("g")))
    intercept[IllegalArgumentException](
      Quantiles.hdrHistogram(df, "v", 0, Some("g")))
    intercept[IllegalArgumentException](
      Quantiles.hdrHistogram(df, "v", 3, Some("g"))) // not a power of 2
  }

  test("hdrQuantiles: a group with ONLY excluded rows still surfaces " +
      "(null estimate, audit counts filled) — never silently dropped") {
    val df = Seq[(String, java.lang.Long)](("a", 4L), ("a", 8L),
      ("c", null), ("c", 0L), ("c", -3L))
      .toDF("g", "v")
    val out = Quantiles.hdrQuantiles(df, "v", Seq(0.5, 1.0), k = 4,
      Some("g")).collect()
    val cRows = out.filter(_.getString(0) == "c")
    assert(cRows.length == 2, "one row per requested q for group c")
    cRows.foreach { r =>
      assert(r.isNullAt(2), "estimate is null, not fabricated")
      assert(r.getLong(3) == 0L) // n positive
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) == ((1L, 1L, 1L)))
    }
    // ungrouped all-excluded input: one row per q, not an empty frame
    val allEx = Seq[java.lang.Long](null, 0L).toDF("v")
    val ue = Quantiles.hdrQuantiles(allEx, "v", Seq(0.9), k = 4).collect()
    assert(ue.length == 1 && ue(0).isNullAt(1) && ue(0).getLong(2) == 0L &&
      ue(0).getLong(3) == 1L && ue(0).getLong(5) == 1L)
  }

  test("bucket math is overflow-safe across the full positive Long " +
      "range (epoch nanos, Long.MaxValue)") {
    // A multiply-then-divide sub-bucket wraps past v ≈ 2^63/k; the
    // shift form must place every value in a bucket whose bounds
    // actually contain it.
    val vs = Seq(1790000000000000000L, // epoch-nanos territory, e=60
      (1L << 62) + 1L, Long.MaxValue)  // e=62 extremes
    val df = vs.toDF("v")
    val h = Quantiles.hdrHistogram(df, "v", k = 16)
      .collect().map(r => (r.getInt(0), r.getLong(3))) // (e, lo)
    h.foreach { case (e, lo) =>
      assert(lo > 0L, s"lo wrapped negative at e=$e")
      val width = 1L << (e - 4)
      assert(vs.exists(v => lo <= v && v - lo < width),
        s"bucket (e=$e, lo=$lo) contains none of the inputs")
    }
    // per-value: single-row sketches put each v inside its own bucket
    vs.foreach { v =>
      val r = Quantiles.hdrQuantiles(Seq(v).toDF("v"), "v", Seq(1.0),
        k = 16).head()
      val est = r.getLong(1)
      assert(est > 0L && est <= v, s"v=$v est=$est")
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      assert(v - est < (1L << (e - 4)), s"v=$v est=$est outside bucket")
    }
  }
}
