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

  /** Exponentially-weighted moving average per entity — the classic
    * smoothing/trend feature (monitoring baselines, feature-engineering
    * lag signals):
    *
    *   s₁ = x₁;   sₜ = α·xₜ + (1−α)·sₜ₋₁
    *
    * over each entity's events ordered by (`tsSecCol`, `idCol`) — the id
    * tie-break makes the fold a TOTAL order, so results are identical on
    * any partitioning and the oracle can replay the exact double chain
    * (`list_reduce` with the same operand shape).
    *
    * The recurrence is inherently sequential per entity, so it is
    * computed as ONE left fold inside Catalyst: `sort_array(collect_list
    * (struct))` per entity, then a higher-order `aggregate` that appends
    * each smoothed point — one pass, no O(n²) window-slicing.
    *
    * Scale notes (100 TB event tables): one hash shuffle on the entity
    * key (the minimum for an exact per-entity recurrence); per-entity
    * memory is the entity's own series (same bound as the resample
    * grid) — entities parallelize, a single entity does not. For
    * unbounded per-entity streams use the streaming tier's stateful
    * aggregation instead; for bounded-window smoothing downsample with
    * [[resampleLocf]] first.
    *
    * @return (`entityCol`, `tsSecCol`, `idCol`, `v` — the raw value,
    *         `ewma`). */
  def ewma(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val seq = df
      .filter(col(tsSecCol).isNotNull)
      .groupBy(col(entityCol))
      .agg(sort_array(collect_list(struct(
        col(tsSecCol).as("t"), col(idCol).as("i"),
        col(valueCol).cast("double").as("v")))).as("_seq"))
    // left fold appending struct(t, i, v, s): s = α·v + (1−α)·prev.s,
    // seeded by the first element's own value
    val folded = aggregate(
      col("_seq"),
      expr("CAST(array() AS ARRAY<STRUCT<t: BIGINT, i: BIGINT, " +
        "v: DOUBLE, s: DOUBLE>>)"),
      (acc, e) => concat(acc, array(struct(
        e.getField("t").as("t"), e.getField("i").as("i"),
        e.getField("v").as("v"),
        when(size(acc) === 0, e.getField("v"))
          .otherwise(lit(alpha) * e.getField("v") +
            lit(1.0 - alpha) * element_at(acc, -1).getField("s"))
          .as("s")))))
    seq.select(col(entityCol), explode(folded).as("_e"))
      .select(col(entityCol), col("_e.t").as(tsSecCol),
        col("_e.i").as(idCol), col("_e.v").as("v"),
        col("_e.s").as("ewma"))
  }
}
