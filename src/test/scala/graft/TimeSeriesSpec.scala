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
}
