package graft.operators

import org.apache.spark.sql.DataFrame
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
}
