package graft

import graft.operators.RangeJoin

/** Bucketed point-in-interval join: boundary semantics, multi-bucket
  * intervals, overlap, no duplicates. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("inclusive start, exclusive end, overlapping intervals, no dups") {
    val points = Seq((1L, 0.0), (2L, 99.9), (3L, 100.0), (4L, 119.9),
      (5L, 120.0), (6L, 999.9), (7L, 1000.0)).toDF("pid", "v")
    val intervals = Seq((10L, 0.0, 120.0), (20L, 100.0, 260.0),
      (30L, 250.0, 1000.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
      bucketWidth = 50.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 10L),            // start inclusive
      (2L, 10L),
      (3L, 10L), (3L, 20L), // overlap region matches both
      (4L, 10L), (4L, 20L),
      (5L, 20L),            // end of [0,120) exclusive
      (6L, 30L)))           // 1000.0 excluded entirely (7 matches nothing)
    // exactly one row per (point, containing interval)
    val n = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 50.0)
      .count()
    assert(n == 8)
  }

  test("tiny bucket width still correct (intervals span many buckets)") {
    val points = Seq((1L, 55.0)).toDF("pid", "v")
    val intervals = Seq((10L, 0.0, 120.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi",
      bucketWidth = 1.0).count()
    assert(out == 1)
  }

  test("intervalJoin: inclusive bounds, key isolation, no nested loop") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val clicks = Seq((1L, "u", 100L), (2L, "u", 50L), (3L, "v", 100L))
      .toDF("click_id", "k", "ts")
    val buys = Seq(("u", 40L, 1.0), ("u", 100L, 2.0), ("u", 101L, 3.0),
      ("v", 99L, 9.0))
      .toDF("k", "bts", "amt")
    val out = RangeJoin.intervalJoin(clicks, buys, Seq("k"), "ts", "bts",
      lit(60L)).orderBy("click_id", "bts").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    // click1@100: buys at 40 (=100-60, inclusive) and 100 (=ts, inclusive);
    // 101 is later; v's buy belongs to the other key
    assert(out.toSeq == Seq((1L, 40L, 1.0), (1L, 100L, 2.0),
      (2L, 40L, 1.0), (3L, 99L, 9.0)))
    // the key equality must plan as a real equi-join, not a nested loop
    val plan = RangeJoin.intervalJoin(clicks, buys, Seq("k"), "ts", "bts",
      lit(60L)).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("intervalOverlapJoin: exact closed-bound overlap semantics, " +
      "duplicate-free across shared buckets, clash fail-fast") {
    val a = Seq(
      (1L, 0.0, 100.0),   // spans many 10-wide buckets
      (2L, 35.0, 40.0),
      (3L, 200.0, 210.0)) // overlaps nothing on the right
      .toDF("a_id", "a_s", "a_e")
    val b = Seq(
      (10L, 50.0, 60.0),  // overlaps 1 in several buckets — must emit ONCE
      (11L, 40.0, 45.0),  // touches 2 at the closed bound 40
      (12L, 100.0, 120.0), // touches 1 exactly at 100
      (13L, 150.0, 160.0)) // overlaps nothing
      .toDF("b_id", "b_s", "b_e")
    val got = RangeJoin.intervalOverlapJoin(
        a, "a_s", "a_e", b, "b_s", "b_e", bucketWidth = 10.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    // brute-force truth: every (a, b) with a_s <= b_e && b_s <= a_e
    val truth = for {
      (ai, as_, ae) <- Seq((1L, 0.0, 100.0), (2L, 35.0, 40.0),
        (3L, 200.0, 210.0))
      (bi, bs, be) <- Seq((10L, 50.0, 60.0), (11L, 40.0, 45.0),
        (12L, 100.0, 120.0), (13L, 150.0, 160.0))
      if as_ <= be && bs <= ae
    } yield (ai, bi)
    assert(got.sorted == truth.sorted) // no dups (Seq compare), no misses
    assert(got.contains((1L, 12L))) // closed-bound touch kept
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlapJoin(a, "a_s", "a_e",
        b.withColumnRenamed("b_s", "a_s"), "a_s", "b_e", 10.0)
    }
  }
}
