package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join via bucketing.
  *
  * Spark plans a bare non-equi join (`p >= lo AND p < hi`) as a
  * BroadcastNestedLoopJoin — per-row scans of the interval side, quadratic
  * at scale. The bucketed strategy turns it into an equi-join: intervals
  * explode into the fixed-width buckets they cover, points map to their one
  * bucket, the join runs hash/sort-merge on the bucket id, and an exact
  * predicate discards boundary overshoot. Each point lives in exactly one
  * bucket, so no dedup pass is needed. Pick `bucketWidth` near the typical
  * interval length: cost is |intervals|·(len/width) replicated rows versus
  * |points| lookups.
  */
object RangeJoin {

  /** Inner join of `points` to every interval containing them:
    * `startCol <= pointCol < endCol`. */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucket = "_graft_bucket"
    val bIntervals = intervals.withColumn(bucket,
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    val bPoints = points.withColumn(bucket,
      floor(col(pointCol) / bucketWidth).cast("long"))
    bPoints.join(bIntervals, Seq(bucket))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop(bucket)
  }

  /** Interval-OVERLAP join — both sides are intervals, matched when they
    * intersect: `aStart <= bEnd AND bStart <= aEnd` (closed bounds).
    * Same bucketing idea as [[pointInInterval]], but since BOTH sides
    * replicate into every bucket they cover, a pair meeting in several
    * buckets would duplicate — so each pair is emitted only from its
    * CANONICAL bucket, the one containing `max(aStart, bStart)` (the
    * first bucket where both are present). That makes the join
    * duplicate-free by construction: no distinct pass over the output,
    * which at scale would be a second full shuffle.
    *
    * Cost: |rows|·(len/width) replicated rows per side into a hash
    * equi-join on the bucket id; pick `bucketWidth` near the typical
    * interval length. Column names must be disjoint across the sides
    * (pre-rename one side). */
  def intervalOverlapJoin(
      left: DataFrame, lStartCol: String, lEndCol: String,
      right: DataFrame, rStartCol: String, rEndCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"column(s) ${clash.mkString(", ")} exist on both sides — rename " +
        "one side before joining")
    val bucket = "_graft_bucket"
    def buckets(df: DataFrame, s: String, e: String) =
      df.withColumn(bucket, explode(sequence(
        floor(col(s) / bucketWidth).cast("long"),
        floor(col(e) / bucketWidth).cast("long"))))
    buckets(left, lStartCol, lEndCol)
      .join(buckets(right, rStartCol, rEndCol), Seq(bucket))
      .filter(col(lStartCol) <= col(rEndCol) &&
        col(rStartCol) <= col(lEndCol))
      .filter(col(bucket) ===
        floor(greatest(col(lStartCol), col(rStartCol)) / bucketWidth)
          .cast("long"))
      .drop(bucket)
  }

  /** Keyed time-interval join: each left row pairs with every right row of
    * the same key whose timestamp falls in `[left.ts − lookback, left.ts]`
    * — "all purchases in the hour before each click". Columns other than
    * the keys must not collide (pre-rename on one side).
    *
    * This is NOT a nested-loop shape: the key equality makes it a plain
    * shuffled equi-join with the time window as a residual predicate — the
    * minimal shuffle for the semantics, and AQE handles key skew.
    *
    * The SAME plan is Structured Streaming's stream-stream join: give both
    * sides watermarks and a timestamp-typed ts with an interval `lookback`
    * (e.g. `expr("INTERVAL 1 HOUR")`), and the time bound is exactly what
    * lets Spark expire join state instead of buffering streams forever.
    * With numeric (epoch) ts, pass a numeric `lookback` for batch use.
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String, lookback: Column): DataFrame = {
    require(leftTsCol != rightTsCol,
      "rename ts columns apart so both survive in the output")
    // alias both sides so self-joins (both inputs derived from one source)
    // resolve key equality across the two join legs instead of to the same
    // attribute — without this Spark logs a "trivially true equals
    // predicate" warning on every such plan
    val l = left.alias("_graft_l")
    val r = right.alias("_graft_r")
    val keyCond =
      keyCols.map(k => col(s"_graft_l.$k") === col(s"_graft_r.$k"))
        .reduce(_ && _)
    val cond = keyCond &&
      col(s"_graft_r.$rightTsCol") >= col(s"_graft_l.$leftTsCol") - lookback &&
      col(s"_graft_r.$rightTsCol") <= col(s"_graft_l.$leftTsCol")
    val rightCols = right.columns.filterNot(keyCols.contains).toSeq
    l.join(r, cond, "inner")
      .select(left.columns.toSeq.map(c => col(s"_graft_l.$c")) ++
        rightCols.map(c => col(s"_graft_r.$c")): _*)
  }
}
