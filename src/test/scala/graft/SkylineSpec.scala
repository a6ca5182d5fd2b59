package graft

import graft.operators.Skyline

/** 2D Pareto skyline: dominance semantics (strict-somewhere, duplicates
  * survive), prune completeness across bucket resolutions, payload
  * passthrough, partition invariance. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def run(df: org.apache.spark.sql.DataFrame, buckets: Int) =
    Skyline.skyline2D(df, "x", "y", buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet

  test("hand-built frontier: dominated rows drop, equal-on-one-axis " +
      "dominance is strict on the other, duplicates both survive") {
    val pts = Seq(
      (1L, 5L, "a"), (2L, 3L, "b"), (3L, 4L, "c"), // c: beaten by b
      (4L, 1L, "d"), (5L, 1L, "e"),                // e: d ties y, wins x
      (2L, 3L, "b2"))                              // exact dup of b
      .toDF("x", "y", "tag")
    val out = run(pts, 1024)
    assert(out == Set((1L, 5L, "a"), (2L, 3L, "b"), (2L, 3L, "b2"),
      (4L, 1L, "d")))
    // same-x dominance is strict in y: (7,2) kills (7,3), not itself
    val sameX = Seq((7L, 2L, "p"), (7L, 3L, "q")).toDF("x", "y", "tag")
    assert(run(sameX, 1024) == Set((7L, 2L, "p")))
  }

  test("anti-correlated data keeps everything; bucket resolution and " +
      "partitioning never change the result") {
    val anti = (1L to 20L).map(i => (i, 21L - i, s"t$i"))
      .toDF("x", "y", "tag")
    val full = run(anti, 1024)
    assert(full.size == 20)
    // degenerate single bucket (prune does nothing) — same frontier
    assert(run(anti, 1) == full)
    val mixed = anti.unionAll(
      (1L to 20L).map(i => (i + 1L, 22L - i, s"d$i")) // each dominated
        .toDF("x", "y", "tag"))
    val expect = full
    assert(run(mixed, 1024) == expect)
    assert(run(mixed.repartition(7), 3) == expect)
    intercept[IllegalArgumentException] {
      Skyline.skyline2D(anti, "x", "y", buckets = 0)
    }
  }
}
