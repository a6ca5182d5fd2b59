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
  }
}
