package graft

import graft.operators.Funnel

/** ST15 windowed funnel — anchored-greedy stage matching (see
  * [[Funnel.windowFunnel]] scaladoc for the contract). */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("view", "click", "purchase")

  private def run(rows: Seq[(Long, Long, Long, String)], window: Long = 100L) =
    Funnel.windowFunnel(
      rows.toDF("user", "es", "eid", "etype"),
      "user", "es", "eid", "etype", stages, window)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

  test("full funnel, partial funnels, and stage order enforcement") {
    val out = run(Seq(
      // u1 completes: view@10 → click@20 → purchase@30
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "purchase"),
      // u2 stalls at click; a purchase BEFORE the click can't count
      (2L, 5L, 4L, "purchase"), (2L, 10L, 5L, "view"),
      (2L, 15L, 6L, "click"),
      // u3 views only
      (3L, 50L, 7L, "view"),
      // u4 has clicks/purchases but never a view — no funnel row
      (4L, 1L, 8L, "click"), (4L, 2L, 9L, "purchase")))
    assert(out(1L) == ((3L, 10L, 30L, 20L)))
    assert(out(2L) == ((2L, 10L, 15L, 5L)))
    assert(out(3L) == ((1L, 50L, 50L, 0L)))
    assert(!out.contains(4L))
  }

  test("anchor is the EARLIEST stage-1 event and the window binds " +
      "later stages to it") {
    // anchor view@10; purchase@115 is outside 10+100 even though a
    // second view@50 would have admitted it — anchored semantics
    val out = run(Seq(
      (1L, 10L, 1L, "view"), (1L, 50L, 2L, "view"),
      (1L, 60L, 3L, "click"), (1L, 115L, 4L, "purchase")))
    assert(out(1L) == ((2L, 10L, 60L, 50L)))
    // widen the window: same events now complete
    val wide = run(Seq(
      (1L, 10L, 1L, "view"), (1L, 50L, 2L, "view"),
      (1L, 60L, 3L, "click"), (1L, 115L, 4L, "purchase")), window = 105L)
    assert(wide(1L) == ((3L, 10L, 115L, 105L)))
  }

  test("each stage matches its EARLIEST eligible event; ties break by " +
      "id; irrelevant types ignored; partition-invariant") {
    val rows = Seq(
      (1L, 10L, 2L, "view"), (1L, 10L, 1L, "view"), // tie → eid 1 first
      (1L, 12L, 3L, "error"), (1L, 20L, 4L, "click"),
      (1L, 25L, 5L, "click"), (1L, 30L, 6L, "purchase"))
    val out = Funnel.windowFunnel(rows.toDF("user", "es", "eid", "etype"),
      "user", "es", "eid", "etype", stages, 100L).collect()
    assert(out.length == 1)
    // stage_ts carries the per-stage matches: view@10, click@20 (not 25)
    val st = out.head.getAs[scala.collection.Seq[Any]]("stage_ts")
    assert(st.toSeq == Seq(10L, 20L, 30L))
    val re = Funnel.windowFunnel(
      rows.toDF("user", "es", "eid", "etype").repartition(5),
      "user", "es", "eid", "etype", stages, 100L).collect()
    assert(re.head.getAs[scala.collection.Seq[Any]]("stage_ts").toSeq ==
      st.toSeq)
  }

  test("fail-fast on duplicate stage types and empty stages") {
    val d = Seq((1L, 1L, 1L, "view")).toDF("user", "es", "eid", "etype")
    intercept[IllegalArgumentException] {
      Funnel.windowFunnel(d, "user", "es", "eid", "etype",
        Seq("view", "view"), 10L)
    }
    intercept[IllegalArgumentException] {
      Funnel.windowFunnel(d, "user", "es", "eid", "etype", Nil, 10L)
    }
  }

  test("cohortRetention: hand-built two-cohort matrix, same-bucket " +
    "dedup, null rows dropped, age-0 retention exactly 1.0") {
    val day = 86400L
    def at(d: Long, off: Long = 12L) = d * day + off
    val rows = Seq[(java.lang.Long, java.lang.Long)](
      // cohort day-0: A active d0,d1,d2 (d0 twice — must dedupe),
      // B active d0,d2; C active d0 only
      (1L, at(0)), (1L, at(0, 99L)), (1L, at(1)), (1L, at(2)),
      (2L, at(0)), (2L, at(2)),
      (3L, at(0)),
      // cohort day-1: D active d1,d3
      (4L, at(1)), (4L, at(3)),
      // noise: null entity / null ts rows are filtered out
      (null, at(0)), (5L, null))
      .toDF("user", "es")
    val out = Funnel.cohortRetention(rows, "user", "es", bucketSec = day)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      (0L, 0L) -> (3L, 1.0),
      (0L, 1L) -> (1L, 1.0 / 3.0),
      (0L, 2L) -> (2L, 2.0 / 3.0),
      (1L, 0L) -> (1L, 1.0),
      (1L, 2L) -> (1L, 1.0)))
    // user 5 (null ts only) contributes no cohort anywhere
    assert(!out.keySet.exists(_._1 > 1L))
    intercept[IllegalArgumentException] {
      Funnel.cohortRetention(rows, "user", "es", bucketSec = 0L)
    }
  }

  test("sessionize: gap splits, closed bound, ts-tie total order, " +
      "per-entity independence, partition invariance") {
    val rows = Seq(
      // u1: events at 0, 50, 100 (gaps ≤ 60 stay), then 200 (gap 100
      // opens session 2), then exactly-60 gap at 260 stays in-session
      (1L, 0L, 1L), (1L, 50L, 2L), (1L, 100L, 3L),
      (1L, 200L, 4L), (1L, 260L, 5L),
      // u2: single event
      (2L, 7L, 6L),
      // u1 ts-tie at 200: eid 40 < 4? no — use a distinct ts tie on u3
      (3L, 10L, 7L), (3L, 10L, 8L), (3L, 100L, 9L))
    val df = rows.toDF("user", "es", "eid")
    val stats = Funnel.sessionStats(df, "user", "es", "eid", gapSec = 60L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(stats == Map(
      (1L, 1L) -> (3L, 0L, 100L, 100L),
      (1L, 2L) -> (2L, 200L, 260L, 60L),
      (2L, 1L) -> (1L, 7L, 7L, 0L),
      (3L, 1L) -> (2L, 10L, 10L, 0L),
      (3L, 2L) -> (1L, 100L, 100L, 0L)))
    // row-level: session_seq assigned in (ts, id) order
    val seq = Funnel.sessionize(df, "user", "es", "eid", gapSec = 60L)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(seq((1L, 4L)) == 2L && seq((1L, 3L)) == 1L)
    // partition invariance: same result from a different layout
    val shuffled = Funnel.sessionStats(df.repartition(7, $"eid"),
        "user", "es", "eid", gapSec = 60L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(shuffled == stats)
    intercept[IllegalArgumentException] {
      Funnel.sessionize(df, "user", "es", "eid", gapSec = -1L)
    }
  }

  test("frequentSequences: counts n-grams per entity order, ties rank " +
      "lexicographically, topK cuts, runs never cross entities, " +
      "partition-invariant") {
    val d = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"),
      (1L, 4L, 40L, "b"), (1L, 5L, 50L, "a"),
      (2L, 6L, 10L, "c"), (2L, 7L, 20L, "c"), (2L, 8L, 30L, "c"),
      (2L, 9L, 40L, "c"),
      (3L, 10L, 5L, "z")) // single event — no 3-gram
      .toDF("u", "eid", "es", "tp")
    val out = Funnel.frequentSequences(d, "u", "es", "eid", "tp",
        n = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    // a>b>a ×2 and c>c>c ×2 tie — lexicographic break; b>a>b ×1 third;
    // nothing crosses u1's trailing 'a' into u2's 'c's or touches 'z'
    assert(out.toSeq == Seq(("a>b>a", 2L, 1L), ("c>c>c", 2L, 2L),
      ("b>a>b", 1L, 3L)))
    val cut = Funnel.frequentSequences(d, "u", "es", "eid", "tp",
      n = 3, topK = 2)
    assert(cut.count() == 2)
    val re = Funnel.frequentSequences(d.repartition(7), "u", "es",
        "eid", "tp", n = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    assert(re.toSeq == out.toSeq)
    intercept[IllegalArgumentException] {
      Funnel.frequentSequences(d, "u", "es", "eid", "tp", n = 1)
    }
  }

  test("transitionMatrix: per-state probabilities, entity boundaries " +
      "never pair, partition-invariant") {
    val d = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "a"),
      (1L, 4L, 40L, "b"),
      (2L, 5L, 10L, "a"), (2L, 6L, 20L, "c"))
      .toDF("u", "eid", "es", "tp")
    val out = Funnel.transitionMatrix(d, "u", "es", "eid", "tp")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // a→b ×2 and a→c ×1 share state a; u1's trailing b never pairs
    // with u2's leading a
    assert(out == Map(
      ("a", "b") -> ((2L, 2.0 / 3.0)),
      ("a", "c") -> ((1L, 1.0 / 3.0)),
      ("b", "a") -> ((1L, 1.0))))
    val re = Funnel.transitionMatrix(d.repartition(7), "u", "es",
        "eid", "tp")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(re == out)
  }

  test("attribution: first/last touch inside the lookback, same-second " +
      "touches eligible, dark conversions keep nulls, later touches " +
      "never credited, partition-invariant") {
    val d = Seq(
      // u1: view(1)@100, click(2)@200, purchase(3)@250 — both in window
      (1L, 1L, 100L, "view"), (1L, 2L, 200L, "click"),
      (1L, 3L, 250L, "purchase"),
      // u1 second purchase(4)@1150, lookback 1000 → window [150, 1150]
      // drops view@100, keeps click@200
      (1L, 4L, 1150L, "purchase"),
      // u2: touch at the SAME second as the purchase is eligible (RANGE
      // frame), and a later touch(7)@400 is not
      (2L, 5L, 300L, "view"), (2L, 6L, 300L, "purchase"),
      (2L, 7L, 400L, "click"),
      // u3: dark conversion — nearest touch outside the lookback
      (3L, 8L, 100L, "view"), (3L, 9L, 5000L, "purchase"),
      // noise type never participates
      (1L, 10L, 240L, "error"))
      .toDF("user", "eid", "es", "tp")
    val out = Funnel.attribution(d, "user", "es", "eid", "tp",
        "purchase", Seq("view", "click"), lookbackSec = 1000L)
      .collect().map(r => r.getLong(1) -> (r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(7)) -1L else r.getLong(7),
        if (r.isNullAt(6)) "-" else r.getString(6),
        if (r.isNullAt(9)) "-" else r.getString(9)))
      .toMap
    assert(out(3L) == ((2L, 1L, 2L, "view", "click")))
    assert(out(4L) == ((1L, 2L, 2L, "click", "click")))
    assert(out(6L) == ((1L, 5L, 5L, "view", "view"))) // same-second
    assert(out(9L) == ((0L, -1L, -1L, "-", "-")))     // dark
    val re = Funnel.attribution(d.repartition(7), "user", "es", "eid",
        "tp", "purchase", Seq("view", "click"), lookbackSec = 1000L)
      .collect().map(r => r.getLong(1) -> (r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(7)) -1L else r.getLong(7),
        if (r.isNullAt(6)) "-" else r.getString(6),
        if (r.isNullAt(9)) "-" else r.getString(9)))
      .toMap
    assert(re == out)
    intercept[IllegalArgumentException] {
      Funnel.attribution(d, "user", "es", "eid", "tp", "purchase",
        Seq("purchase"), 1000L)
    }
  }

  test("rfm: distinct metrics rank into bands, recency inverted, " +
      "boundary ties share the lower band, partition-invariant") {
    // five customers with strictly increasing activity: c5 is the most
    // recent, most frequent, highest-spend → 555; c1 the opposite → 111
    val orders = (1 to 5).flatMap { c =>
      (1 to c).map(k => (s"c$c", (c * 500 + k * 100).toLong, c * 10L))
    }.toDF("cust", "es", "amt")
    val out = Funnel.rfm(orders, "cust", "es", "amt", nTiles = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(7)))
      .toMap
    // asof = c5's last order (3000); recency strictly falls with c
    assert(out("c1") == ((2400L, 1L, 10L, 111L)))
    assert(out("c3") == ((1200L, 3L, 90L, 333L))) // 3 orders × 30
    assert(out("c5") == ((0L, 5L, 250L, 555L)))   // 5 orders × 50
    // boundary ties: monetary [10,10,20,30] at nTiles=2 → median 15,
    // both 10s share band 1, both above-median rows band 2
    val tied = Seq(("a", 10L, 10L), ("b", 20L, 10L), ("c", 30L, 20L),
      ("d", 40L, 30L)).toDF("cust", "es", "amt")
    val m2 = Funnel.rfm(tied, "cust", "es", "amt", nTiles = 2)
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(m2 == Map("a" -> 1L, "b" -> 1L, "c" -> 2L, "d" -> 2L))
    val re = Funnel.rfm(orders.repartition(7), "cust", "es", "amt",
        nTiles = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(7)))
      .toMap
    assert(re == out) // exact — integer metrics, broadcast cutoffs
    intercept[IllegalArgumentException] {
      Funnel.rfm(orders, "cust", "es", "amt", nTiles = 1)
    }
  }

  test("mergeIntervals: containment chains collapse via the running " +
      "max; touching merge at gap 0; keys isolate; bad rows throw") {
    def run(rows: Seq[(String, Long, Long)], gap: Long = 0L) =
      Funnel.mergeIntervals(rows.toDF("k", "s", "e"), "k", "s", "e", gap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // [1,10] contains [2,3]; [4,12] overlaps the RUNNING max (10), not
    // the previous end (3) — one island, the case a lag-based rule gets
    // wrong
    assert(run(Seq(("a", 1L, 10L), ("a", 2L, 3L), ("a", 4L, 12L))) ==
      Map(("a", 1L) -> ((1L, 12L, 3L))))
    // touching intervals coalesce at gap 0; a gap of 1 does not
    assert(run(Seq(("a", 1L, 3L), ("a", 3L, 5L), ("a", 7L, 9L))) ==
      Map(("a", 1L) -> ((1L, 5L, 2L)), ("a", 2L) -> ((7L, 9L, 1L))))
    // minGap bridges small holes
    assert(run(Seq(("a", 1L, 3L), ("a", 5L, 6L)), gap = 2L) ==
      Map(("a", 1L) -> ((1L, 6L, 2L))))
    // keys isolate; zero-length intervals are fine
    assert(run(Seq(("a", 1L, 1L), ("b", 1L, 2L))) ==
      Map(("a", 1L) -> ((1L, 1L, 1L)), ("b", 1L) -> ((1L, 2L, 1L))))
    // end < start fails fast instead of silently merging worlds
    intercept[Exception] { run(Seq(("a", 5L, 1L))) }
    // a null endpoint on a keyed row is corrupt too — dropping it would
    // silently shrink island coverage; null KEYS drop (unkeyed rows
    // belong to no world)
    def runN(rows: Seq[(String, java.lang.Long, java.lang.Long)]) =
      Funnel.mergeIntervals(rows.toDF("k", "s", "e"), "k", "s", "e", 0L)
        .collect()
    intercept[Exception] { runN(Seq(("a", 1L, null))) }
    intercept[Exception] { runN(Seq(("a", null, 3L))) }
    assert(Funnel.mergeIntervals(
        Seq((null.asInstanceOf[String], 1L, 3L), ("b", 1L, 2L))
          .toDF("k", "s", "e"), "k", "s", "e", 0L)
      .collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("absorbIntervals: delta absorption equals the full re-merge " +
      "bit-for-bit, n_merged included; bridges sum stored counts") {
    def m(rows: Seq[(String, Long, Long)], gap: Long) =
      Funnel.mergeIntervals(rows.toDF("k", "s", "e"), "k", "s", "e", gap)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val base = Seq(("a", 1L, 3L), ("a", 2L, 4L), ("a", 10L, 12L),
      ("b", 0L, 1L))
    val delta = Seq(("a", 6L, 9L), ("a", 30L, 31L), ("c", 5L, 6L))
    val absorbed = Funnel.absorbIntervals(m(base, 2L),
      delta.toDF("k", "s", "e"), "k", "s", "e", minGap = 2L)
    assert(toMap(absorbed) == toMap(m(base ++ delta, 2L)))
    // the bridge: [6,9] joins [1,4] (gap 2) and [10,12] — counts sum
    // 2 (stored) + 1 (stored) + 1 (delta) = 4
    assert(toMap(absorbed)(("a", 1L)) == ((1L, 12L, 4L)))
    // brand-new key in the delta islands on its own
    assert(toMap(absorbed)(("c", 1L)) == ((5L, 6L, 1L)))
  }

  test("deleteIntervals: splits, shrinks, and key removals equal the " +
      "full re-merge; untouched keys keep stored islands verbatim") {
    def m(rows: Seq[(String, Long, Long)], gap: Long) =
      Funnel.mergeIntervals(rows.toDF("k", "s", "e"), "k", "s", "e", gap)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val all = Seq(("a", 1L, 3L), ("a", 3L, 5L), ("a", 5L, 7L),
      ("b", 0L, 2L), ("b", 10L, 11L), ("c", 4L, 6L))
    // delete the middle of a's chain (island SPLITS), all of c (key
    // leaves the store); b untouched
    val deleted = Seq(("a", 3L, 5L), ("c", 4L, 6L))
    val remaining = all.filterNot(deleted.contains)
    val out = Funnel.deleteIntervals(m(all, 0L),
      remaining.toDF("k", "s", "e"), deleted.toDF("k", "s", "e"),
      "k", "s", "e", minGap = 0L)
    assert(toMap(out) == toMap(m(remaining, 0L)),
      "decremental ≡ full re-merge bit-for-bit")
    assert(toMap(out)(("a", 1L)) == ((1L, 3L, 1L)) &&
      toMap(out)(("a", 2L)) == ((5L, 7L, 1L)), "island split in two")
    assert(!toMap(out).contains(("c", 1L)), "fully-deleted key leaves")
    assert(toMap(out)(("b", 1L)) == ((0L, 2L, 1L)) &&
      toMap(out)(("b", 2L)) == ((10L, 11L, 1L)))
    // delete that only SHRINKS an end
    val d2 = Seq(("a", 5L, 7L))
    val r2 = all.filterNot(d2.contains)
    assert(toMap(Funnel.deleteIntervals(m(all, 0L),
        r2.toDF("k", "s", "e"), d2.toDF("k", "s", "e"),
        "k", "s", "e", 0L)) == toMap(m(r2, 0L)))
  }
}
