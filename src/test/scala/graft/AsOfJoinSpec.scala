package graft

import org.apache.spark.sql.Row

import graft.operators.AsOfJoin

/** As-of join semantics: most-recent-prior match, inclusive ties,
  * null when nothing precedes, key isolation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 300L), (4L, "B", 150L))
    .toDF("trade_id", "sym", "ts")
  private lazy val quotes = Seq(
    ("A", 90L, 1.0), ("A", 200L, 2.0), ("A", 205L, 3.0), ("B", 400L, 9.0))
    .toDF("sym", "ts", "px")

  test("matches the most recent quote at or before each trade") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "ts", Seq("px"))
      .orderBy("trade_id").collect()
    assert(out(0) == Row(1L, "A", 100L, 1.0))  // quote@90
    assert(out(1) == Row(2L, "A", 205L, 3.0))  // tie: quote@205 counts (<=)
    assert(out(2) == Row(3L, "A", 300L, 3.0))  // carries forward
    assert(out(3) == Row(4L, "B", 150L, null)) // B's only quote is later
  }

  test("forward variant matches the first quote at or after each trade") {
    val out = AsOfJoin.asofJoinForward(trades, quotes, Seq("sym"), "ts",
        Seq("px"))
      .orderBy("trade_id").collect()
    assert(out(0) == Row(1L, "A", 100L, 2.0))  // next quote@200
    assert(out(1) == Row(2L, "A", 205L, 3.0))  // tie: quote@205 counts (<=)
    assert(out(2) == Row(3L, "A", 300L, null)) // nothing follows
    assert(out(3) == Row(4L, "B", 150L, 9.0))  // B's quote@400
  }

  test("nearest variant takes the smallest |Δts|; backward wins ties") {
    val out = AsOfJoin.asofJoinNearest(trades, quotes, Seq("sym"), "ts",
        Seq("px"))
      .orderBy("trade_id").collect()
    assert(out(0) == Row(1L, "A", 100L, 1.0))  // |100-90|=10 < |200-100|
    assert(out(1) == Row(2L, "A", 205L, 3.0))  // exact hit
    assert(out(2) == Row(3L, "A", 300L, 3.0))  // only backward exists
    assert(out(3) == Row(4L, "B", 150L, 9.0))  // only forward exists
    // exact-tie pin: backward candidate wins
    val l = Seq((1L, "K", 100L)).toDF("id", "k", "ts")
    val r = Seq(("K", 90L, 1.0), ("K", 110L, 2.0)).toDF("k", "ts", "px")
    assert(AsOfJoin.asofJoinNearest(l, r, Seq("k"), "ts", Seq("px"))
      .head() == Row(1L, "K", 100L, 1.0))
  }

  test("left rows are never dropped or duplicated") {
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "ts", Seq("px"))
    assert(out.count() == 4)
    assert(out.select("trade_id").distinct().count() == 4)
  }

  test("salted variant ≡ unsalted on a single hot key (the case it exists for)") {
    // ONE key, interleaved left/right rows with long right-free gaps so
    // carry-ins must cross empty buckets
    val left = (0 until 400).map(i => (i.toLong, "K", (i * 13L) % 4001))
      .toDF("event_id", "k", "ts")
    val right = (0 until 60).map(i => ("K", i * 67L % 4001, i * 1.5))
      .toDF("k", "ts", "v")
    val plain = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .orderBy("event_id").collect().toSeq
    for (buckets <- Seq(1, 7, 32)) {
      val salted = AsOfJoin.asofJoinSalted(left, right, Seq("k"), "ts",
        Seq("v"), numBuckets = buckets)
        .orderBy("event_id").collect().toSeq
      assert(salted == plain, s"numBuckets=$buckets diverged")
    }
  }

  test("salted variant with caller-supplied bounds ≡ computed bounds (lazy path)") {
    val left = (0 until 100).map(i => (i.toLong, "K", (i * 13L) % 997))
      .toDF("event_id", "k", "ts")
    val right = (0 until 20).map(i => ("K", i * 67L % 997, i * 1.5))
      .toDF("k", "ts", "v")
    val computed = AsOfJoin.asofJoinSalted(left, right, Seq("k"), "ts",
      Seq("v"), numBuckets = 8).orderBy("event_id").collect().toSeq
    // exact bounds
    val exact = AsOfJoin.asofJoinSalted(left, right, Seq("k"), "ts",
      Seq("v"), numBuckets = 8, bounds = Some((0.0, 996.0)))
      .orderBy("event_id").collect().toSeq
    assert(exact == computed)
    // over-wide bounds (the realistic case: caller knows ingest date range,
    // not the exact min/max) must still be correct — just worse bucketing
    val wide = AsOfJoin.asofJoinSalted(left, right, Seq("k"), "ts",
      Seq("v"), numBuckets = 8, bounds = Some((-1e6, 1e6)))
      .orderBy("event_id").collect().toSeq
    assert(wide == computed)
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asofJoinSalted(left, right, Seq("k"), "ts", Seq("v"),
        bounds = Some((10.0, 0.0)))
    }
  }

  test("salted variant: multi-key, empty right, and all-equal-ts edge cases") {
    val left = Seq((1L, "A", 5L), (2L, "A", 5L), (3L, "B", 5L))
      .toDF("id", "k", "ts")
    val rightEmpty = Seq.empty[(String, Long, Double)].toDF("k", "ts", "v")
    val outEmpty = AsOfJoin.asofJoinSalted(left, rightEmpty, Seq("k"), "ts",
      Seq("v"), numBuckets = 8).orderBy("id").collect()
    assert(outEmpty.forall(_.isNullAt(3)) && outEmpty.length == 3)
    // all rows share one ts → degenerate single bucket; inclusive tie match
    val right1 = Seq(("A", 5L, 1.0)).toDF("k", "ts", "v")
    val out1 = AsOfJoin.asofJoinSalted(left, right1, Seq("k"), "ts",
      Seq("v"), numBuckets = 8).orderBy("id").collect()
    assert(out1(0) == Row(1L, "A", 5L, 1.0))
    assert(out1(2) == Row(3L, "B", 5L, null))
  }

  test("matched right row stays atomic when its value columns hold nulls") {
    // the most recent quote has px=null, venue set: the joined row must take
    // BOTH columns from that row — not back-fill px from the older quote
    // (per-column carry-forward would emit (2.0, "late"), mixing two rows)
    val trades1 = Seq((1L, "A", 300L)).toDF("trade_id", "sym", "ts")
    val quotes1 = Seq(
      ("A", 100L, Some(2.0), "early"),
      ("A", 200L, None: Option[Double], "late"))
      .toDF("sym", "ts", "px", "venue")
    val out = AsOfJoin.asofJoin(trades1, quotes1, Seq("sym"), "ts",
      Seq("px", "venue")).collect()
    assert(out.toSeq == Seq(Row(1L, "A", 300L, null, "late")))
  }
}
