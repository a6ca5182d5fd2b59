package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling — the gap-filling step between
  * raw event streams and anything windowed/ML-shaped downstream (feature
  * grids, per-entity rate series, monitoring rollups): align each
  * entity's events to a fixed interval grid and carry the last
  * observation forward across empty buckets.
  *
  * Scale notes (100 TB event tables): the observed-bucket aggregation is
  * one partial-agg groupBy on (entity, bucket); the grid explode is
  * bounded per entity by span/interval (never event count); the
  * carry-forward is one window sort WITHIN each entity partition — the
  * same per-entity window shape as running totals, parallel across
  * entities, with AQE splitting skewed ones. Nothing driver-side.
  */
object TimeSeries {

  /** Resample to `intervalSec`-wide buckets with
    * last-observation-carried-forward. `tsSecCol` must be an epoch-
    * SECONDS numeric column (callers convert timestamps — keeps the
    * bucket arithmetic exact and engine-portable). Buckets span each
    * entity's own [min, max] range (no global clock assumption).
    *
    * @return (`entityCol`, `bucket_ts`, `n_events` — 0 on gap rows,
    *         `v_avg` — this bucket's mean or null, `v_filled` — LOCF:
    *         last non-null `v_avg` at or before the bucket). */
  def resampleLocf(df: DataFrame, entityCol: String, tsSecCol: String,
      valueCol: String, intervalSec: Long): DataFrame = {
    require(intervalSec >= 1, "intervalSec must be >= 1")
    val bucket = (floor(col(tsSecCol) / intervalSec) * intervalSec)
      .cast("long")
    val obs = df
      .filter(col(tsSecCol).isNotNull)
      .groupBy(col(entityCol), bucket.as("bucket_ts"))
      .agg(avg(col(valueCol)).as("v_avg"),
        count(lit(1)).as("n_events"))
    val span = obs.groupBy(col(entityCol))
      .agg(min(col("bucket_ts")).as("_lo"), max(col("bucket_ts")).as("_hi"))
    val grid = span.select(col(entityCol),
      explode(sequence(col("_lo"), col("_hi"), lit(intervalSec)))
        .as("bucket_ts"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(entityCol, "bucket_ts"), "left")
      .select(col(entityCol), col("bucket_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("v_avg"),
        last(col("v_avg"), ignoreNulls = true).over(w).as("v_filled"))
  }

  /** Resample to `intervalSec`-wide buckets with LINEAR interpolation
    * across gap buckets — the value-reconstruction twin of
    * [[resampleLocf]] (sensor grids, rate series where a step function
    * misstates the trend). Same grid construction; gap buckets get
    *
    *   prev + (next - prev) * (bucket - prevTs) / (nextTs - prevTs)
    *
    * between their bracketing observations. The per-entity grid starts
    * and ends ON an observed bucket, so every gap is interior and the
    * bracket always exists — no extrapolation policy to choose.
    *
    * Scale notes: identical shuffle shape to [[resampleLocf]] — one
    * partial-agg groupBy, a span-bounded grid explode, and per-entity
    * window sorts (two passes: carry-back needs the reverse frame).
    * The lerp itself is a narrow codegen projection.
    *
    * @return (`entityCol`, `bucket_ts`, `n_events`, `v_avg`,
    *         `v_interp` — observed mean on observed buckets, the lerp
    *         on gaps). */
  def resampleInterp(df: DataFrame, entityCol: String, tsSecCol: String,
      valueCol: String, intervalSec: Long): DataFrame = {
    require(intervalSec >= 1, "intervalSec must be >= 1")
    val bucket = (floor(col(tsSecCol) / intervalSec) * intervalSec)
      .cast("long")
    val obs = df
      .filter(col(tsSecCol).isNotNull)
      .groupBy(col(entityCol), bucket.as("bucket_ts"))
      .agg(avg(col(valueCol)).as("v_avg"),
        count(lit(1)).as("n_events"))
    val span = obs.groupBy(col(entityCol))
      .agg(min(col("bucket_ts")).as("_lo"), max(col("bucket_ts")).as("_hi"))
    val grid = span.select(col(entityCol),
      explode(sequence(col("_lo"), col("_hi"), lit(intervalSec)))
        .as("bucket_ts"))
    val back = Window.partitionBy(col(entityCol)).orderBy(col("bucket_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(entityCol)).orderBy(col("bucket_ts"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsTs = when(col("v_avg").isNotNull, col("bucket_ts"))
    grid.join(obs, Seq(entityCol, "bucket_ts"), "left")
      .select(col(entityCol), col("bucket_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("v_avg"),
        last(col("v_avg"), ignoreNulls = true).over(back).as("_pv"),
        last(obsTs, ignoreNulls = true).over(back).as("_pt"),
        first(col("v_avg"), ignoreNulls = true).over(fwd).as("_nv"),
        first(obsTs, ignoreNulls = true).over(fwd).as("_nt"))
      .select(col(entityCol), col("bucket_ts"), col("n_events"),
        col("v_avg"),
        when(col("v_avg").isNotNull, col("v_avg"))
          .otherwise(col("_pv") + (col("_nv") - col("_pv")) *
            (col("bucket_ts") - col("_pt")).cast("double") /
            (col("_nt") - col("_pt")).cast("double"))
          .as("v_interp"))
  }
}
