package graft

import graft.operators.TimeSeries

/** Regular-grid resample + LOCF: grid construction, gap fill, bucket
  * averaging, per-entity isolation, partition invariance. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Seq(
    // entity A: buckets 0 and 7200 observed, 3600 is a gap
    ("a", 100L, 10.0), ("a", 200L, 20.0), ("a", 7300L, 40.0),
    // entity B: single bucket — no gaps, no carry
    ("b", 3700L, 7.0))
    .toDF("entity", "es", "value")

  test("grid spans each entity's range; gaps filled by carry-forward") {
    val out = TimeSeries.resampleLocf(events, "entity", "es", "value", 3600L)
      .orderBy("entity", "bucket_ts").collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getLong(1)).toSeq == Seq(0L, 3600L, 7200L))
    // bucket 0: two events, avg 15; gap bucket carries 15; bucket 7200: 40
    assert(a.map(_.getLong(2)).toSeq == Seq(2L, 0L, 1L))
    assert(a.map(_.getDouble(4)).toSeq == Seq(15.0, 15.0, 40.0))
    // gap row's own average is null, only the fill is carried
    assert(a(1).isNullAt(3))
    val b = out.filter(_.getString(0) == "b")
    assert(b.map(r => (r.getLong(1), r.getLong(2), r.getDouble(4))).toSeq ==
      Seq((3600L, 1L, 7.0)))
  }

  test("entities never leak into each other's grids; partition-invariant") {
    val out = TimeSeries.resampleLocf(events.repartition(7), "entity",
      "es", "value", 3600L)
      .orderBy("entity", "bucket_ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    val base = TimeSeries.resampleLocf(events, "entity", "es", "value",
      3600L).orderBy("entity", "bucket_ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    assert(out.toSeq == base.toSeq)
    // b's grid has exactly one bucket — a's span must not widen it
    assert(out.count(_._1 == "b") == 1)
  }

  test("interval validation fails fast") {
    intercept[IllegalArgumentException] {
      TimeSeries.resampleLocf(events, "entity", "es", "value", 0L)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.resampleInterp(events, "entity", "es", "value", 0L)
    }
  }

  test("interp: gap buckets get the lerp between bracketing observations") {
    // A's gap at 3600 sits exactly halfway between avg 15 (t=0) and
    // 40 (t=7200) → 27.5; observed buckets keep their own average.
    val out = TimeSeries.resampleInterp(events, "entity", "es", "value",
        3600L)
      .orderBy("entity", "bucket_ts").collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.map(_.getLong(1)).toSeq == Seq(0L, 3600L, 7200L))
    assert(a.map(_.getDouble(4)).toSeq == Seq(15.0, 27.5, 40.0))
    assert(a(1).isNullAt(3)) // gap row's own average stays null
    val b = out.filter(_.getString(0) == "b")
    assert(b.map(r => (r.getLong(1), r.getDouble(4))).toSeq ==
      Seq((3600L, 7.0)))
  }

  test("ewma: hand-computed chain, same-ts ties ordered by id, " +
      "partition-invariant, alpha validated") {
    // a: 10, 20, 40 → α=0.5: 10, 15, 27.5; the two t=1 rows order by id
    val ev = Seq(("a", 0L, 1L, 10.0), ("a", 1L, 2L, 20.0),
      ("a", 1L, 3L, 40.0), ("b", 5L, 4L, 7.0))
      .toDF("entity", "es", "eid", "v")
    val out = TimeSeries.ewma(ev, "entity", "es", "eid", "v", alpha = 0.5)
      .orderBy("entity", "es", "eid").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq == Seq(("a", 1L, 10.0), ("a", 2L, 15.0),
      ("a", 3L, 27.5), ("b", 4L, 7.0)))
    val re = TimeSeries.ewma(ev.repartition(7), "entity", "es", "eid",
        "v", alpha = 0.5)
      .orderBy("entity", "es", "eid").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(4)))
    assert(re.toSeq == out.toSeq)
    intercept[IllegalArgumentException] {
      TimeSeries.ewma(ev, "entity", "es", "eid", "v", alpha = 0.0)
    }
  }

  test("rollingMedian: odd/even frames, frame cap, tie order, " +
      "partition invariance") {
    // a: values 10, 30, 20, 90 with a 2-row frame: med = 10, 20, 25, 55
    val ev = Seq(("a", 0L, 1L, 10.0), ("a", 1L, 2L, 30.0),
      ("a", 2L, 3L, 20.0), ("a", 3L, 4L, 90.0))
      .toDF("entity", "es", "eid", "v")
    val two = TimeSeries.rollingMedian(ev, "entity", "es", "eid", "v", 2)
      .orderBy("es").collect().map(_.getDouble(4))
    assert(two.toSeq == Seq(10.0, 20.0, 25.0, 55.0))
    // 3-row frame: 10, 20, 20, 30 (middle of the sorted triple)
    val three = TimeSeries.rollingMedian(ev, "entity", "es", "eid", "v", 3)
      .orderBy("es").collect().map(_.getDouble(4))
    assert(three.toSeq == Seq(10.0, 20.0, 20.0, 30.0))
    val re = TimeSeries.rollingMedian(ev.repartition(7), "entity", "es",
        "eid", "v", 3).orderBy("es").collect().map(_.getDouble(4))
    assert(re.toSeq == three.toSeq)
    intercept[IllegalArgumentException] {
      TimeSeries.rollingMedian(ev, "entity", "es", "eid", "v", 0)
    }
  }

  test("ewmaAnomaly: spike flagged against the entity's own residual " +
      "spread; first event null residual and false flag; " +
      "partition invariance") {
    // entity a: a flat series with one huge spike — only the spike (and
    // the correction right after it) can exceed 3σ of the residuals
    val vals = Seq(10.0, 10.0, 10.0, 10.0, 10.0, 500.0, 10.0, 10.0,
      10.0, 10.0, 10.0, 10.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      ("a", i.toLong, i.toLong, v) }.toDF("entity", "es", "eid", "v")
    val out = TimeSeries.ewmaAnomaly(ev, "entity", "es", "eid", "v",
        alpha = 0.2, z = 3)
      .orderBy("es").collect()
    assert(out.head.isNullAt(4) && !out.head.getBoolean(5))
    val flagged = out.filter(_.getBoolean(5)).map(_.getLong(1)).toSet
    assert(flagged.contains(5L)) // the spike itself
    assert(!flagged.exists(_ > 6L)) // tail of the decay is not anomalous
    val re = TimeSeries.ewmaAnomaly(ev.repartition(5), "entity", "es",
        "eid", "v", alpha = 0.2, z = 3)
      .orderBy("es").collect().map(r => (r.getLong(1), r.getBoolean(5)))
    assert(re.toSeq == out.map(r => (r.getLong(1), r.getBoolean(5))).toSeq)
  }

  test("holt: hand-computed level/trend chain, forecast lag, " +
      "partition invariance") {
    // α=0.5, β=0.3 over [10,12,14,16]:
    //   l: 10, 11, 12.65, 14.6775;  b: 0, 0.3, 0.705, 1.10175
    //   forecast: null, 10, 11.3, 13.355
    val d = Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 12.0),
      ("a", 3L, 3L, 14.0), ("a", 4L, 4L, 16.0))
      .toDF("entity", "es", "eid", "v")
    val out = TimeSeries.holt(d, "entity", "es", "eid", "v",
        alpha = 0.5, beta = 0.3)
      .orderBy("es").collect()
    val ls = out.map(_.getDouble(4)).toSeq
    val bs = out.map(_.getDouble(5)).toSeq
    assert(ls.zip(Seq(10.0, 11.0, 12.65, 14.6775))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(bs.zip(Seq(0.0, 0.3, 0.705, 1.10175))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(out(0).isNullAt(6) && out(0).isNullAt(7))
    assert(math.abs(out(2).getDouble(6) - 11.3) < 1e-12)
    assert(math.abs(out(3).getDouble(7) - (16.0 - 13.355)) < 1e-12)
    val re = TimeSeries.holt(d.repartition(5), "entity", "es", "eid", "v",
        alpha = 0.5, beta = 0.3)
      .orderBy("es").collect().map(_.getDouble(4)).toSeq
    assert(re == ls) // exact: same fold order regardless of partitioning
  }

  test("crossCorrelation: a B-trails-A-by-one series peaks at lag +1 " +
      "with r exactly 1, edges shrink n_pairs, grid 0-fills") {
    // A at t=0..5 with values 1..6; B identical but shifted one bucket
    val a = (0L to 5L).map(t => ("u", t, "A", (t + 1).toDouble))
    val b = (1L to 6L).map(t => ("u", t, "B", t.toDouble))
    val d = (a ++ b).toDF("entity", "es", "etype", "v")
    val out = TimeSeries.crossCorrelation(d, "entity", "es", "v",
        "etype", typeA = "A", typeB = "B", intervalSec = 1L, maxLag = 1)
      .orderBy("lag").collect()
      .map(r => r.getLong(1) -> (r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // grid spans 0..6 (7 buckets, 0-filled at the missing ends)
    assert(out(0L)._1 == 7L && out(1L)._1 == 6L && out(-1L)._1 == 6L)
    assert(out(1L)._2 == Some(1.0)) // perfect line — exact moments
    assert(out(0L)._2.get < 1.0 && out(-1L)._2.get < 1.0)
    intercept[IllegalArgumentException] {
      TimeSeries.crossCorrelation(d, "entity", "es", "v", "etype",
        "A", "A", 1L, 1)
    }
  }

  test("dominantPeriod: alternator picks 2, integerized tie → smallest " +
      "lag, constant entity drops out, lag-1 excluded") {
    val alt = (1L to 6L).map(i => ("alt", i, i,
      if (i % 2 == 1) 5L else -5L))
    val ramp = (1L to 6L).map(i => ("ramp", i, i + 10, i))
    val const = (1L to 6L).map(i => ("const", i, i + 20, 3L))
    val d = (alt ++ ramp ++ const).toDF("entity", "es", "eid", "v")
    val out = TimeSeries.dominantPeriod(d, "entity", "es", "eid", "v",
        maxLag = 3, minLag = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("alt") == 2L)  // lag2 r=+1 beats lag3 r=−1
    assert(out("ramp") == 2L) // lag2 ≡ lag3 ≡ 1 → smallest-lag tie-break
    assert(!out.contains("const")) // zero variance at every lag
  }

  test("rollingZscore: exact window moments, partial-window null, " +
      "constant-window sd=0 with z null, partition invariance") {
    // window 3 over [1,2,3,10] then a constant tail [5,5,5] on key b
    val d = Seq(("a", 1L, 1L, 1L), ("a", 2L, 2L, 2L), ("a", 3L, 3L, 3L),
      ("a", 4L, 4L, 10L),
      ("b", 1L, 5L, 5L), ("b", 2L, 6L, 5L), ("b", 3L, 7L, 5L))
      .toDF("entity", "es", "eid", "v")
    val out = TimeSeries.rollingZscore(d, "entity", "es", "eid", "v",
        window = 3)
      .orderBy("entity", "es").collect()
    assert(out(0).isNullAt(4) && out(1).isNullAt(4)) // frame not full
    assert(out(2).getDouble(4) == 2.0 && out(2).getDouble(5) == 1.0 &&
      out(2).getDouble(6) == 1.0) // [1,2,3]: mean 2, sd 1, z 1 — exact
    assert(out(3).getDouble(4) == 5.0)
    // [2,3,10]: varNum = 3·113 − 15² = 114 → sd = sqrt(114/6) = sqrt(19)
    assert(math.abs(out(3).getDouble(5) - math.sqrt(19.0)) < 1e-12)
    assert(math.abs(out(3).getDouble(6) - 5.0 / out(3).getDouble(5))
      < 1e-12)
    val b3 = out(6) // third row of the constant key
    assert(b3.getDouble(5) == 0.0 && b3.isNullAt(6)) // sd 0, z undefined
    val re = TimeSeries.rollingZscore(d.repartition(5), "entity", "es",
        "eid", "v", window = 3)
      .orderBy("entity", "es").collect()
      .map(r => if (r.isNullAt(6)) None else Some(r.getDouble(6))).toSeq
    assert(re == out.map(r =>
      if (r.isNullAt(6)) None else Some(r.getDouble(6))).toSeq)
  }

  test("holtWinters: hand-computed level/trend/seasonal chain, " +
      "forecast uses the consumed slot, partition invariance") {
    // α=0.5, β=0.3, γ=0.4, m=2 over [10,12,14,16]:
    //   l: 10, 11, 12.65, 14.4775;  b: 0, 0.3, 0.705, 1.04175
    //   s: 0, 0.4, 0.54, 0.849;     fc: null, 10, 11.3, 13.755
    val d = Seq(("a", 1L, 1L, 10.0), ("a", 2L, 2L, 12.0),
      ("a", 3L, 3L, 14.0), ("a", 4L, 4L, 16.0))
      .toDF("entity", "es", "eid", "v")
    val out = TimeSeries.holtWinters(d, "entity", "es", "eid", "v",
        alpha = 0.5, beta = 0.3, gamma = 0.4, period = 2)
      .orderBy("es").collect()
    def near(a: Double, b: Double) = math.abs(a - b) < 1e-12
    val ls = out.map(_.getDouble(4))
    val bs = out.map(_.getDouble(5))
    val ss = out.map(_.getDouble(6))
    assert(ls.zip(Seq(10.0, 11.0, 12.65, 14.4775)).forall((near _).tupled))
    assert(bs.zip(Seq(0.0, 0.3, 0.705, 1.04175)).forall((near _).tupled))
    assert(ss.zip(Seq(0.0, 0.4, 0.54, 0.849)).forall((near _).tupled))
    assert(out(0).isNullAt(7) && out(0).isNullAt(8))
    assert(near(out(1).getDouble(7), 10.0))
    assert(near(out(3).getDouble(7), 13.755)) // consumed slot is s_2=0.4
    assert(near(out(3).getDouble(8), 16.0 - 13.755))
    val re = TimeSeries.holtWinters(d.repartition(5), "entity", "es",
        "eid", "v", alpha = 0.5, beta = 0.3, gamma = 0.4, period = 2)
      .orderBy("es").collect().map(_.getDouble(4)).toSeq
    assert(re == ls.toSeq) // exact: same fold order regardless
  }

  test("cusum: hand-computed level shift, clamp at zero, exact flags") {
    // A: three at 10 then two at 22 (n=5, Σ=74, e = c·5−74):
    //   e = −24,−24,−24,+36,+36; slack·n = 10; threshold·n = 50
    //   S⁺: 0,0,0,26,52 → only the last row crosses 50
    //   S⁻: 14,28,42,0,0 → never crosses
    val d = Seq(("a", 1L, 1L, 10L), ("a", 2L, 2L, 10L), ("a", 3L, 3L, 10L),
      ("a", 4L, 4L, 22L), ("a", 5L, 5L, 22L))
      .toDF("entity", "es", "eid", "c")
    val out = TimeSeries.cusum(d, "entity", "es", "eid", "c",
        slack = 2L, threshold = 10L)
      .orderBy("es").collect()
      .map(r => (r.getDecimal(4).longValueExact(),
        r.getDecimal(5).longValueExact(), r.getBoolean(6)))
    assert(out.toSeq == Seq((0L, 14L, false), (0L, 28L, false),
      (0L, 42L, false), (26L, 0L, false), (52L, 0L, true)))
    // a flat series never alarms and both statistics stay clamped at 0
    val flat = Seq(("b", 1L, 1L, 10L), ("b", 2L, 2L, 10L),
      ("b", 3L, 3L, 10L)).toDF("entity", "es", "eid", "c")
    val f = TimeSeries.cusum(flat, "entity", "es", "eid", "c", 0L, 1L)
      .collect().map(r => (r.getDecimal(4).longValueExact(),
        r.getDecimal(5).longValueExact(), r.getBoolean(6)))
    assert(f.forall(_ == ((0L, 0L, false))))
  }

  test("cusum is partition-invariant") {
    val d = Seq(("a", 1L, 1L, 10L), ("a", 2L, 2L, 30L), ("a", 3L, 3L, 50L),
      ("b", 1L, 4L, 5L), ("b", 2L, 5L, 500L))
      .toDF("entity", "es", "eid", "c")
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.cusum(df, "entity", "es", "eid", "c", 1L, 5L)
        .orderBy("entity", "es").collect()
        .map(r => (r.getString(0), r.getDecimal(4).longValueExact(),
          r.getDecimal(5).longValueExact(), r.getBoolean(6))).toSeq
    assert(run(d) == run(d.repartition(7)))
  }

  test("seasonalDecompose: alternating series splits into trend + " +
      "seasonal, edges null") {
    // period 2, halfWindow 1 over [10,20,10,20,10]: trend 40/3, 50/3,
    // 40/3 on interior rows; phase0 seasonal from row2 only, phase1
    // from rows 1 and 3.
    val d = Seq(("a", 1L, 1L, 10L), ("a", 2L, 2L, 20L), ("a", 3L, 3L, 10L),
      ("a", 4L, 4L, 20L), ("a", 5L, 5L, 10L))
      .toDF("entity", "es", "eid", "c")
    val out = TimeSeries.seasonalDecompose(d, "entity", "es", "eid", "c",
        period = 2, halfWindow = 1)
      .orderBy("es").collect()
    val phases = out.map(_.getLong(4)).toSeq
    assert(phases == Seq(0L, 1L, 0L, 1L, 0L))
    assert(out(0).isNullAt(5) && out(4).isNullAt(5)) // edge trend null
    // trend(r1)=(10+20+10)/3=40/3; trend(r2)=(20+10+20)/3=50/3;
    // trend(r3)=(10+20+10)/3=40/3
    assert(math.abs(out(1).getDouble(5) - 40.0 / 3) < 1e-12)
    assert(math.abs(out(2).getDouble(5) - 50.0 / 3) < 1e-12)
    // detrended e4: r1 → +66667, r2 → −66667, r3 → +66667
    val d1 = math.floor((20L - 40.0 / 3) * 1e4 + 0.5) // +66667
    val d2 = math.floor((10L - 50.0 / 3) * 1e4 + 0.5) // −66667
    val seas0 = d2 / 1 / 1e4
    val seas1 = (d1 + d1) / 2 / 1e4
    assert(math.abs(out(2).getDouble(6) - seas0) < 1e-12)
    assert(math.abs(out(1).getDouble(6) - seas1) < 1e-12)
    // resid = (v − trend) − seasonal on interior rows, null on edges
    assert(out(0).isNullAt(7))
    assert(math.abs(out(2).getDouble(7) -
      ((10L - 50.0 / 3) - seas0)) < 1e-12)
  }

  test("seasonalDecompose is partition-invariant") {
    val d = (1L to 30L).map(i => ("a", i, i, (i % 5) * 10 + i / 7))
      .toDF("entity", "es", "eid", "c")
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.seasonalDecompose(df, "entity", "es", "eid", "c", 5, 2)
        .orderBy("es").collect()
        .map(r => (r.getLong(1), r.getLong(4),
          if (r.isNullAt(7)) Long.MinValue
          else math.floor(r.getDouble(7) * 1e4 + 0.5).toLong)).toSeq
    assert(run(d) == run(d.repartition(9)))
  }

  test("interp: multi-bucket gap walks the line; partition-invariant") {
    // one observation at t=0 (v=0) and one at t=4h (v=40): interior
    // gaps at 1h/2h/3h must read 10/20/30.
    val line = Seq(("c", 10L, 0.0), ("c", 14500L, 40.0))
      .toDF("entity", "es", "value")
    val vals = TimeSeries.resampleInterp(line, "entity", "es", "value",
        3600L)
      .orderBy("bucket_ts").collect().map(_.getDouble(4)).toSeq
    assert(vals == Seq(0.0, 10.0, 20.0, 30.0, 40.0))
    val re = TimeSeries.resampleInterp(line.repartition(5), "entity",
        "es", "value", 3600L)
      .orderBy("bucket_ts").collect().map(_.getDouble(4)).toSeq
    assert(re == vals)
  }

  test("autocorrelation: linear ramp r=1, alternating r=-1, constant " +
      "null, <2 pairs null, missing pairs absent, partition-invariant") {
    val ramp = (1L to 5L).map(i => ("r", i, i, i)).toDF(
      "entity", "es", "eid", "v")
    val alt = (1L to 5L).map(i => ("a", i, i,
      if (i % 2 == 1) 1L else -1L)).toDF("entity", "es", "eid", "v")
    val const = (1L to 4L).map(i => ("c", i, i, 7L)).toDF(
      "entity", "es", "eid", "v")
    val short = Seq(("s", 1L, 1L, 1L), ("s", 2L, 2L, 9L)).toDF(
      "entity", "es", "eid", "v")
    val d = ramp.unionAll(alt).unionAll(const).unionAll(short)
    val out = TimeSeries.autocorrelation(d, "entity", "es", "eid", "v",
        maxLag = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(out(("r", 1L)) == ((4L, Some(1.0)))) // exact: all sums integer
    assert(out(("r", 2L)) == ((3L, Some(1.0))))
    assert(out(("a", 1L)) == ((4L, Some(-1.0))))
    assert(out(("a", 2L))._2 == Some(1.0))
    assert(out(("c", 1L))._2 == None) // zero variance
    assert(out(("s", 1L)) == ((1L, None))) // one pair — undefined
    assert(!out.contains(("s", 2L))) // no overlapping pairs at all
    val re = TimeSeries.autocorrelation(d.repartition(7), "entity", "es",
        "eid", "v", maxLag = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(re == out) // exact equality — moment sums are decimal
  }

  test("linearTrend: exact line recovered, constant-y slope 0 with r2 " +
      "null, n<2 null, no-x-spread null, partition-invariant") {
    // entity L: y = 7 + 3x on day offsets (es shifted by an arbitrary
    // base — centering must absorb it); all moments integer-exact
    val line = (0L to 4L).map(i =>
      ("L", 1234567L + i * 86400L, 7L + 3L * i)).toDF("e", "es", "v")
    val const = (0L to 3L).map(i => ("C", i * 86400L, 9L)).toDF(
      "e", "es", "v")
    val single = Seq(("S", 86400L, 5L)).toDF("e", "es", "v")
    val dupX = Seq(("D", 100L, 1L), ("D", 200L, 8L)).toDF("e", "es", "v")
    val d = line.unionAll(const).unionAll(single).unionAll(dupX)
    val out = TimeSeries.linearTrend(d, "e", "es", "v", xUnitSec = 86400L)
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(out("L") == ((5L, Some(3.0), Some(7.0), Some(1.0))))
    assert(out("C") == ((4L, Some(0.0), Some(9.0), None))) // y constant
    assert(out("S") == ((1L, None, None, None)))
    // D's two observations land in the same day bucket — x has no spread
    assert(out("D") == ((2L, None, None, None)))
    val re = TimeSeries.linearTrend(d.repartition(7), "e", "es", "v",
        xUnitSec = 86400L)
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(re == out) // exact — decimal moments, one double closed form
  }

  test("interArrival: periodic B=-1, bursty hand moments exact, " +
      "single-gap sentinel, gapless entities absent, " +
      "partition-invariant") {
    // P: perfectly periodic (all gaps 10) — sd 0, cv 0, B exactly −1
    val periodic = (0L to 4L).map(i => ("P", i * 10L, i))
    // B: gaps [1,1,1,97] — s1=100, s2=9412 → sd exactly 48, mean 25
    val bursty = Seq(0L, 1L, 2L, 3L, 100L).zipWithIndex.map {
      case (t, i) => ("B", t, i.toLong) }
    val one = Seq(("O", 0L, 0L), ("O", 7L, 1L)) // single gap
    val lone = Seq(("L", 5L, 0L))               // no gaps at all
    val d = (periodic ++ bursty ++ one ++ lone).toDF("e", "es", "eid")
    val out = TimeSeries.interArrival(d, "e", "es", "eid")
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out("P") == ((4L, 10.0, 0.0, 0.0, -1.0)))
    assert(out("B") == ((4L, 25.0, 48.0, 1.92, (48.0 - 25.0) / 73.0)))
    assert(out("O") == ((1L, 7.0, 0.0, 0.0, -1.0)))
    assert(!out.contains("L"))
    val re = TimeSeries.interArrival(d.repartition(7), "e", "es", "eid")
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(re == out) // exact — integer gaps, decimal moments
  }

  test("seasonalAnomaly: the planted spike is the only flag, edge rows " +
      "drop, constant residuals null out, partition-invariant") {
    // perfect alternation 10/20 with one 90 spike at position 5 —
    // residuals are ~0 everywhere else, so only the spike z-flags
    val vals = Seq(10L, 20L, 10L, 20L, 10L, 90L, 10L, 20L, 10L, 20L,
      10L)
    val d = vals.zipWithIndex.map { case (v, i) =>
      ("e", i.toLong, i.toLong, v) }.toDF("u", "es", "eid", "v")
    val out = TimeSeries.seasonalAnomaly(d, "u", "es", "eid", "v",
        period = 2, halfWindow = 1, zThreshold = 2.0)
      .collect().map(r => r.getLong(1) ->
        (r.isNullAt(5), r.getBoolean(6))).toMap
    // halfWindow=1 trims one row each end
    assert(!out.contains(0L) && !out.contains(10L))
    assert(out.size == 9)
    val flagged = out.filter(_._2._2).keySet
    assert(flagged.forall(es => es >= 4L && es <= 6L) && flagged.nonEmpty)
    assert(out.forall(!_._2._1)) // z defined everywhere (spread > 0)
    // an entity whose residuals are ALL identical has no spread → no z,
    // no flags
    val flat = (0L to 6L).map(i => ("f", i, i, 10L))
      .toDF("u", "es", "eid", "v")
    val fz = TimeSeries.seasonalAnomaly(flat, "u", "es", "eid", "v",
        period = 2, halfWindow = 1).collect()
    assert(fz.forall(r => r.isNullAt(5) && !r.getBoolean(6)))
    val re = TimeSeries.seasonalAnomaly(d.repartition(7), "u", "es",
        "eid", "v", period = 2, halfWindow = 1, zThreshold = 2.0)
      .collect().map(r => r.getLong(1) ->
        (r.isNullAt(5), r.getBoolean(6))).toMap
    assert(re == out)
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalAnomaly(d, "u", "es", "eid", "v", 2, 1,
        zThreshold = 0.0)
    }
  }

  test("theilSenTrend: outlier-immune slope, same-x pairs excluded, " +
      "pairless entities absent, cap reported, partition-invariant") {
    // R: y = x with one wild outlier — 6 of 10 pair slopes are exactly
    // 1, so the median shrugs off the spike (OLS would not)
    val robust = Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (4L, 100L))
      .map { case (x, y) => ("R", x * 86400L, y) }
    // S: two same-x points and one ahead — slopes [+2, -2], median 0
    val sameX = Seq(("S", 0L, 1L), ("S", 10L, 5L), ("S", 86400L, 3L))
    // P: single point — no pair, no row
    val single = Seq(("P", 0L, 7L))
    val d = (robust ++ sameX ++ single).toDF("e", "es", "v")
    val (tr, over) = TimeSeries.theilSenTrend(d, "e", "es", "v",
      xUnitSec = 86400L, maxPoints = 2000)
    val out = tr.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out("R") == ((5L, 10L, 1.0, 0.0)))
    assert(out("S") == ((3L, 2L, 0.0, 3.0))) // icept: med(1, 5, 3)
    assert(!out.contains("P"))
    assert(over.count() == 0)
    // cap: R has 5 points — excluded and reported at maxPoints = 4
    val (tr2, over2) = TimeSeries.theilSenTrend(d, "e", "es", "v",
      xUnitSec = 86400L, maxPoints = 4)
    assert(!tr2.collect().map(_.getString(0)).contains("R"))
    assert(over2.collect().map(r =>
      (r.getString(0), r.getLong(1))).toSeq == Seq(("R", 5L)))
    val (re, _) = TimeSeries.theilSenTrend(d.repartition(7), "e", "es",
      "v", xUnitSec = 86400L, maxPoints = 2000)
    assert(re.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap == out)
  }
}
