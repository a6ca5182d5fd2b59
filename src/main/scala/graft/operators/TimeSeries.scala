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
    // forward anchors via a running `last` over the DESCENDING order —
    // NOT `first(...) over (currentRow, unboundedFollowing)`: Spark's
    // UnboundedFollowing frame re-scans the partition tail per row
    // (O(rows²) per entity; measured 22× on hour-grid resampling). Both
    // windows share the entity exchange; the second sort is O(n log n).
    val fwdRev = Window.partitionBy(col(entityCol))
      .orderBy(col("bucket_ts").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsTs = when(col("v_avg").isNotNull, col("bucket_ts"))
    grid.join(obs, Seq(entityCol, "bucket_ts"), "left")
      .select(col(entityCol), col("bucket_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("v_avg"),
        last(col("v_avg"), ignoreNulls = true).over(back).as("_pv"),
        last(obsTs, ignoreNulls = true).over(back).as("_pt"),
        last(col("v_avg"), ignoreNulls = true).over(fwdRev).as("_nv"),
        last(obsTs, ignoreNulls = true).over(fwdRev).as("_nt"))
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
  /** Exact rolling median over the last `nRows` events per entity
    * (ordered by `tsSecCol` with `idCol` tie-break — a TOTAL order, so
    * the frame content is partition-invariant). The robust twin of the
    * rolling mean: spike-immune baselines for monitoring and feature
    * grids.
    *
    * The median is computed EXPLICITLY — sort the frame, index the
    * middle, average the middle pair on even frames — rather than via an
    * engine `percentile`/`median` aggregate, so the interpolation
    * semantics are pinned by this code, not by whichever quantile
    * convention the engine ships (engines disagree on even-count
    * interpolation; explicit index math is portable). Feed an
    * integer-valued column (e.g. cents) and every median is exact at
    * .5 granularity — no float comparison anywhere.
    *
    * Scale notes (100 TB event tables): one hash shuffle on the entity
    * key, then a per-entity window sort — the same shape as running
    * totals. Per-row state is the `nRows`-element frame (collect +
    * sort_array inside codegen), so memory is O(nRows) per row, NOT
    * O(entity series); cost is O(n·w·log w) per entity — fine for the
    * small frames rolling stats use. Entities parallelize; AQE splits
    * skewed ones.
    *
    * @return (`entityCol`, `tsSecCol`, `idCol`, `v` — the raw value,
    *         `med` — exact rolling median as double). */
  def rollingMedian(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, valueCol: String, nRows: Int): DataFrame = {
    require(nRows >= 1, "nRows must be >= 1")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsSecCol), col(idCol))
      .rowsBetween(-(nRows - 1L), Window.currentRow)
    val vs = sort_array(collect_list(col(valueCol).cast("double")).over(w))
    val n = size(vs)
    val med = when(n % 2 === 1,
        element_at(vs, ((n + 1) / lit(2)).cast("int")))
      .otherwise((element_at(vs, (n / lit(2)).cast("int")) +
        element_at(vs, (n / lit(2) + 1).cast("int"))) / 2.0)
    df.select(col(entityCol), col(tsSecCol), col(idCol),
      col(valueCol).cast("double").as("v"), med.as("med"))
  }

  /** EWMA-residual anomaly detection per entity — the classic streaming
    * outlier flag (monitoring, sensor QC, fraud velocity): predict each
    * point with the PREVIOUS point's EWMA, then flag residuals beyond
    * `z` population standard deviations of the entity's own residuals.
    *
    * The flag is computed in EXACT integer/decimal arithmetic: residuals
    * are integerized at `scale` (default 1e4), and the threshold test
    *
    *   n²·r² > z²·(n·Σr² − (Σr)²)
    *
    * is evaluated in decimal(38,0) — no float comparison, so the flag is
    * bit-identical on any engine and any partitioning (a residual ulp
    * away from z·σ can never flip it).
    *
    * Scale notes (100 TB): one entity-key shuffle for the EWMA fold
    * (see [[ewma]]), a lag window in the same partitioning, one
    * partial-agg groupBy for the moment sums, and a broadcast-sized
    * per-entity stats join. Decimal moments cannot overflow below
    * ~10^19 events per entity.
    *
    * @return (`entityCol`, `tsSecCol`, `idCol`, `v`, `resid_e` — the
    *         scaled integer residual (null on each entity's first
    *         event, which has no prediction), `is_anom` — false on
    *         first events). */
  def ewmaAnomaly(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, valueCol: String, alpha: Double, z: Int = 3,
      scale: Double = 1e4): DataFrame = {
    require(z >= 1, "z must be >= 1")
    require(scale > 0, "scale must be > 0")
    val sm = ewma(df, entityCol, tsSecCol, idCol, valueCol, alpha)
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsSecCol), col(idCol))
    val resid = sm.select(col(entityCol), col(tsSecCol), col(idCol),
      col("v"),
      floor((col("v") - lag(col("ewma"), 1).over(w)) * scale + 0.5)
        .cast("long").as("resid_e"))
    val dec = "decimal(38,0)"
    val stats = resid.filter(col("resid_e").isNotNull)
      .groupBy(col(entityCol))
      .agg(count(lit(1)).cast(dec).as("_n"),
        sum(col("resid_e")).cast(dec).as("_s1"),
        sum(col("resid_e").cast(dec) * col("resid_e").cast(dec))
          .as("_s2"))
    resid.join(stats, Seq(entityCol), "left")
      .select(col(entityCol), col(tsSecCol), col(idCol), col("v"),
        col("resid_e"),
        // a first event has no prediction — not anomalous (false, not
        // null: a nullable boolean round-trips differently through
        // parquet/pandas on different engines)
        when(col("resid_e").isNull, lit(false))
          .otherwise(
            col("_n") * col("_n") * col("resid_e").cast(dec) *
              col("resid_e").cast(dec) >
            lit(z * z) * (col("_n") * col("_s2") -
              col("_s1") * col("_s1")))
          .as("is_anom"))
  }

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

  /** Holt's linear-trend double exponential smoothing per entity — the
    * forecasting step up from [[ewma]] when the series drifts (an EWMA
    * systematically lags a trending series; Holt tracks the slope):
    *
    *   l_t = α·x_t + (1−α)·(l_(t−1) + b_(t−1))
    *   b_t = β·(l_t − l_(t−1)) + (1−β)·b_(t−1)
    *
    * seeded l_1 = x_1, b_1 = 0. The one-step-ahead forecast for row t is
    * l_(t−1) + b_(t−1) (null on each entity's first row), and `resid`
    * is the forecast error — the input to a downstream anomaly rule.
    *
    * The fold deliberately RE-DERIVES l_t inside the b_t arm instead of
    * referencing the sibling struct field: oracle replays must spell
    * the recurrence the same way (a fold accumulator that lets one
    * field read its just-written sibling computes a DIFFERENT series —
    * DuckDB 1.0 struct folds do exactly that, which is why the oracle
    * uses a list accumulator), and the duplicated subexpression makes
    * both engines' IEEE chains identical term by term.
    *
    * Scale notes (100 TB): identical shape to [[ewma]] — one entity-key
    * shuffle, one in-Catalyst fold, plus a lag window in the SAME
    * (entity, time) partitioning for the forecast shift. Per-entity
    * memory = own series; use the streaming tier for unbounded keys. */
  def holt(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, valueCol: String, alpha: Double,
      beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(beta >= 0.0 && beta <= 1.0, "beta must be in [0, 1]")
    val seq = df
      .filter(col(tsSecCol).isNotNull)
      .groupBy(col(entityCol))
      .agg(sort_array(collect_list(struct(
        col(tsSecCol).as("t"), col(idCol).as("i"),
        col(valueCol).cast("double").as("v")))).as("_seq"))
    def lNew(acc: org.apache.spark.sql.Column,
        e: org.apache.spark.sql.Column) =
      lit(alpha) * e.getField("v") + lit(1.0 - alpha) *
        (element_at(acc, -1).getField("l") +
          element_at(acc, -1).getField("b"))
    val folded = aggregate(
      col("_seq"),
      expr("CAST(array() AS ARRAY<STRUCT<t: BIGINT, i: BIGINT, " +
        "v: DOUBLE, l: DOUBLE, b: DOUBLE>>)"),
      (acc, e) => concat(acc, array(struct(
        e.getField("t").as("t"), e.getField("i").as("i"),
        e.getField("v").as("v"),
        when(size(acc) === 0, e.getField("v"))
          .otherwise(lNew(acc, e)).as("l"),
        when(size(acc) === 0, lit(0.0))
          .otherwise(lit(beta) *
            (lNew(acc, e) - element_at(acc, -1).getField("l")) +
            lit(1.0 - beta) * element_at(acc, -1).getField("b"))
          .as("b")))))
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsSecCol), col(idCol))
    seq.select(col(entityCol), explode(folded).as("_e"))
      .select(col(entityCol), col("_e.t").as(tsSecCol),
        col("_e.i").as(idCol), col("_e.v").as("v"),
        col("_e.l").as("level"), col("_e.b").as("trend"))
      .withColumn("forecast",
        lag(col("level"), 1).over(w) + lag(col("trend"), 1).over(w))
      .withColumn("resid", col("v") - col("forecast"))
  }

  /** Rolling z-score (Bollinger-band reduction) per entity — "how far
    * is this point from its own recent window", the fixed-window
    * complement of [[ewmaAnomaly]]'s exponential memory: over the last
    * `window` rows, sample mean and sample std, z = (x − mean)/sd.
    * Null until the window fills and when the window is constant
    * (zero variance) — a partial window's z reads artificially hot.
    *
    * Engine-portable determinism: `valueCol` must be integer-valued
    * (the [[cusum]] convention); both frame sums are exact
    * decimal(38,0) (order-independent), and the variance guard tests
    * the exact-moment PRODUCT n·Σx² − (Σx)², not a sqrt — the
    * [[autocorrelation]] discipline.
    *
    * Scale notes (100 TB): ONE (entity, time) window partitioning
    * carries both frame sums and the count; per-partition state is the
    * `window`-row frame. No join, no second shuffle.
    *
    * @return (`entityCol`, `tsSecCol`, `idCol`, `v`, `mean`, `sd`,
    *         `z`) — mean/sd/z null until the frame holds `window`
    *         rows; z additionally null on zero variance. */
  def rollingZscore(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, valueCol: String, window: Int): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val dec = "decimal(38,0)"
    val frame = Window.partitionBy(col(entityCol))
      .orderBy(col(tsSecCol), col(idCol))
      .rowsBetween(-(window - 1), 0)
    val base = df
      .filter(col(tsSecCol).isNotNull)
      .select(col(entityCol), col(tsSecCol), col(idCol),
        col(valueCol).cast("long").as("v"))
      .withColumn("_n", count(lit(1)).over(frame))
      .withColumn("_s1",
        sum(col("v").cast(dec)).over(frame).cast("double"))
      .withColumn("_s2",
        sum((col("v") * col("v")).cast(dec)).over(frame).cast("double"))
    val nD = col("_n").cast("double")
    val mean = col("_s1") / nD
    val varNum = nD * col("_s2") - col("_s1") * col("_s1")
    val sd = sqrt(varNum / (nD * (nD - lit(1.0))))
    val full = col("_n") === window
    base.select(col(entityCol), col(tsSecCol), col(idCol), col("v"),
      when(full, mean).as("mean"),
      when(full && varNum >= 0.0, sd).as("sd"),
      when(full && varNum > 0.0, (col("v") - mean) / sd).as("z"))
  }

  /** Holt–Winters additive triple exponential smoothing per entity —
    * the seasonal step up from [[holt]] (which lags any series with a
    * repeating cycle): level, trend, and a rotating `period`-slot
    * seasonal state,
    *
    *   l_t = α·(x_t − s_(t−m)) + (1−α)·(l_(t−1) + b_(t−1))
    *   b_t = β·(l_t − l_(t−1)) + (1−β)·b_(t−1)
    *   s_t = γ·(x_t − l_t) + (1−γ)·s_(t−m)
    *
    * seeded l_1 = x_1, b_1 = 0, all seasonal slots 0 (the data-free
    * seed — the first cycle learns the profile from scratch, which
    * keeps the recurrence a pure fold the oracle can replay). The
    * one-step forecast for row t is l_(t−1) + b_(t−1) + s_(t−m) (null
    * on each entity's first row).
    *
    * l_t is derived ONCE per step and let-bound via a single-element
    * `transform` (the lambda variable), then referenced by the b/s/ss
    * arms — the IEEE chain is identical to inline re-derivation (same
    * ops on the same inputs), but the interpreted fold pays the level
    * recurrence once instead of four times, and the rotating seasonal
    * state lives ONCE in the accumulator struct instead of being
    * copied into (and re-copied with) every emitted row. r7's official
    * bench showed the old shape (per-row `ss` arrays → O(len²·m)
    * copies under the grow-by-concat accumulator) amplifying driver GC
    * pressure into an 8× outlier; this shape cuts the copied bytes to
    * O(len²) flat structs + O(len·m) seasonal slots.
    *
    * Scale notes (100 TB): identical shape to [[holt]] — one entity-key
    * shuffle, one in-Catalyst fold; the carried state is `period` + 2
    * doubles per fold step. Per-entity memory = own series; use the
    * streaming tier for unbounded keys. */
  def holtWinters(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, valueCol: String, alpha: Double, beta: Double,
      gamma: Double, period: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    require(beta >= 0.0 && beta <= 1.0, "beta must be in [0, 1]")
    require(gamma >= 0.0 && gamma <= 1.0, "gamma must be in [0, 1]")
    require(period >= 2, "period must be >= 2")
    val m = period
    val seq = df
      .filter(col(tsSecCol).isNotNull)
      .groupBy(col(entityCol))
      .agg(sort_array(collect_list(struct(
        col(tsSecCol).as("t"), col(idCol).as("i"),
        col(valueCol).cast("double").as("v")))).as("_seq"))
    val outT = "ARRAY<STRUCT<t: BIGINT, i: BIGINT, v: DOUBLE, " +
      "l: DOUBLE, b: DOUBLE, sv: DOUBLE, fc: DOUBLE>>"
    val folded = aggregate(
      col("_seq"),
      expr(s"named_struct('out', CAST(array() AS $outT), " +
        s"'ss', array_repeat(CAST(0.0 AS DOUBLE), $m))"),
      (acc, e) => {
        val out = acc.getField("out")
        val ss = acc.getField("ss")
        val first = size(out) === 0
        val prevRow = element_at(out, -1)
        val pl = prevRow.getField("l")
        val pb = prevRow.getField("b")
        val sU = element_at(ss, 1)
        val v = e.getField("v")
        val lN = when(first, v)
          .otherwise(lit(alpha) * (v - sU) + lit(1.0 - alpha) * (pl + pb))
        // let-bind l_t once: transform's lambda variable evaluates lN
        // a single time, every arm below reads the bound value
        element_at(transform(array(lN), lT => struct(
          concat(out, array(struct(
            e.getField("t").as("t"), e.getField("i").as("i"), v.as("v"),
            lT.as("l"),
            when(first, lit(0.0))
              .otherwise(lit(beta) * (lT - pl) + lit(1.0 - beta) * pb)
              .as("b"),
            when(first, lit(0.0))
              .otherwise(lit(gamma) * (v - lT) + lit(1.0 - gamma) * sU)
              .as("sv"),
            when(first, lit(null).cast("double"))
              .otherwise(pl + pb + sU).as("fc")))).as("out"),
          concat(slice(ss, 2, m - 1), array(
            when(first, lit(0.0))
              .otherwise(lit(gamma) * (v - lT) + lit(1.0 - gamma) * sU)))
            .as("ss"))), 1)
      })
    seq.select(col(entityCol), explode(folded.getField("out")).as("_e"))
      .select(col(entityCol), col("_e.t").as(tsSecCol),
        col("_e.i").as(idCol), col("_e.v").as("v"),
        col("_e.l").as("level"), col("_e.b").as("trend"),
        col("_e.sv").as("seasonal"), col("_e.fc").as("forecast"),
        (col("_e.v") - col("_e.fc")).as("resid"))
  }

  /** Two-sided CUSUM change detection (Page 1954) per entity — the
    * level-shift detector that catches slow drifts a point-anomaly flag
    * ([[ewmaAnomaly]]) misses: S⁺ accumulates evidence the series runs
    * ABOVE its reference mean, S⁻ below, both draining by the slack per
    * step and clamping at zero.
    *
    * Everything is EXACT integer arithmetic — no float ever enters:
    * `valueCol` must be integer-valued (callers pre-scale, the
    * [[rollingMedian]] convention), and the recurrences run scaled by
    * the entity's event count n so the reference mean needs no division:
    *
    *   e_i = v_i·n − Σv,   S±_i = max(0, S±_(i−1) ± e_i − slack·n)
    *
    * in decimal(38,0), with the alarm test `S± > threshold·n` — all
    * exact, so flags are bit-identical on any engine and partitioning.
    *
    * Scale notes (100 TB): one entity-key shuffle; each entity's fold is
    * a single in-Catalyst `aggregate` over its own (bounded) event
    * array — the same per-entity state shape as [[ewma]], parallel
    * across entities. Decimal moments cannot overflow below ~10^19
    * value·events per entity.
    *
    * @param slack drift allowance per step, in `valueCol` units
    * @param threshold alarm level, in `valueCol` units
    * @return (`entityCol`, `tsSecCol`, `idCol`, `v`, `sp`, `sn` — the
    *         n-scaled CUSUM statistics as decimal(38,0), `is_change`). */
  def cusum(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, valueCol: String, slack: Long,
      threshold: Long): DataFrame = {
    require(slack >= 0, "slack must be >= 0")
    require(threshold > 0, "threshold must be > 0")
    val dec = "decimal(38,0)"
    val seq = df
      .filter(col(tsSecCol).isNotNull)
      .groupBy(col(entityCol))
      .agg(
        sort_array(collect_list(struct(
          col(tsSecCol).as("t"), col(idCol).as("i"),
          col(valueCol).cast("long").as("c")))).as("_seq"),
        count(lit(1)).cast(dec).as("_n"),
        sum(col(valueCol).cast("long")).cast(dec).as("_s1"))
    val zero = lit(0).cast(dec)
    def e(x: org.apache.spark.sql.Column) =
      x.getField("c").cast(dec) * col("_n") - col("_s1")
    val kn = lit(slack).cast(dec) * col("_n")
    val folded = aggregate(
      col("_seq"),
      expr("CAST(array() AS ARRAY<STRUCT<t: BIGINT, i: BIGINT, " +
        "c: BIGINT, sp: DECIMAL(38,0), sn: DECIMAL(38,0)>>)"),
      (acc, x) => concat(acc, array(struct(
        x.getField("t").as("t"), x.getField("i").as("i"),
        x.getField("c").as("c"),
        greatest(zero,
          when(size(acc) === 0, zero)
            .otherwise(element_at(acc, -1).getField("sp")) +
          e(x) - kn).as("sp"),
        greatest(zero,
          when(size(acc) === 0, zero)
            .otherwise(element_at(acc, -1).getField("sn")) -
          e(x) - kn).as("sn")))))
    val hn = lit(threshold).cast(dec) * col("_n")
    seq.select(col(entityCol), col("_n"), col("_s1"),
        explode(folded).as("_e"))
      .select(col(entityCol), col("_e.t").as(tsSecCol),
        col("_e.i").as(idCol), col("_e.c").as("v"),
        col("_e.sp").as("sp"), col("_e.sn").as("sn"),
        (col("_e.sp") > hn || col("_e.sn") > hn).as("is_change"))
  }

  /** Classical seasonal decomposition (the moving-average STL
    * reduction): value = trend + seasonal + residual, per entity, on a
    * row-regular series (callers resample first — composes with
    * [[resampleLocf]]). Trend is the centered (2·`halfWindow`+1)-row
    * moving mean (null at the edges where the window is incomplete);
    * the seasonal term is the per-(entity, row-index mod `period`) mean
    * of the detrended series; the residual is what remains.
    *
    * Engine-portable determinism: `valueCol` must be integer-valued
    * (pre-scaled), so the trend is an exact-long window sum divided
    * once; the detrended value is e4-integerized BEFORE the seasonal
    * mean, so that mean is again an exact-long sum divided once —
    * no distributed double summation anywhere.
    *
    * Scale notes (100 TB): two windows in the SAME (entity, time)
    * partitioning (one frame sum, one row_number) and one broadcast-
    * sized per-(entity, phase) aggregate joined back — entities
    * parallelize, AQE splits skewed ones.
    *
    * @return (`entityCol`, `tsSecCol`, `idCol`, `v`, `phase`, `trend`,
    *         `seasonal`, `resid`) — trend/resid null on edge rows. */
  def seasonalDecompose(df: DataFrame, entityCol: String,
      tsSecCol: String, idCol: String, valueCol: String, period: Int,
      halfWindow: Int): DataFrame = {
    require(period >= 2, "period must be >= 2")
    require(halfWindow >= 1, "halfWindow must be >= 1")
    val span = 2 * halfWindow + 1
    val order = Window.partitionBy(col(entityCol))
      .orderBy(col(tsSecCol), col(idCol))
    val frame = order.rowsBetween(-halfWindow, halfWindow)
    val base = df
      .filter(col(tsSecCol).isNotNull)
      .select(col(entityCol), col(tsSecCol), col(idCol),
        col(valueCol).cast("long").as("v"))
      .withColumn("phase",
        pmod(row_number().over(order) - 1, lit(period)).cast("long"))
      .withColumn("trend",
        when(count(lit(1)).over(frame) === span,
          sum(col("v")).over(frame) / lit(span.toDouble)))
      .withColumn("_d_e4",
        floor((col("v") - col("trend")) * lit(1e4) + lit(0.5))
          .cast("long"))
    val seas = base
      .groupBy(col(entityCol), col("phase"))
      .agg(when(count(col("_d_e4")) > 0,
          sum(col("_d_e4")) / count(col("_d_e4")) / lit(1e4))
        .as("seasonal"))
    base.join(seas, Seq(entityCol, "phase"))
      .select(col(entityCol), col(tsSecCol), col(idCol), col("v"),
        col("phase"), col("trend"),
        col("seasonal"),
        (col("v") - col("trend") - col("seasonal")).as("resid"))
  }

  /** Per-entity autocorrelation function at lags 1..`maxLag` — the
    * periodicity probe that picks [[seasonalDecompose]]'s period and
    * flags self-similar (bot-like) event streams: Pearson correlation
    * between each entity's series and its own lag-h shift, over the
    * overlapping pairs.
    *
    * Engine-portable determinism: `valueCol` must be integer-valued
    * (pre-scaled, the [[cusum]] convention); all five moment sums are
    * then exact decimal(38,0) — order-independent across partitionings
    * — and the Pearson formula runs once in double over the exact sums
    * (the [[graft.operators.GraphOps.degreeAssortativity]] shape, so
    * no sum can wrap at hub scale and no float accumulates).
    *
    * Scale notes (100 TB): one (entity, time) window partitioning
    * carries ALL `maxLag` lag columns (one shuffle, not one per lag);
    * the lag pairs then partial-agg down to (entity, lag) — `maxLag`
    * rows per entity leave the map side. Nothing is ever entity-series
    * sized after the window.
    *
    * @return (`entityCol`, `lag`, `n_pairs`, `acf`) — `acf` null when
    *         either side of a lag pair set is constant (zero variance)
    *         or fewer than 2 pairs overlap. */
  def autocorrelation(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsSecCol), col(idCol))
    val lagged = df
      .filter(col(tsSecCol).isNotNull)
      .select(Seq(col(entityCol), col(valueCol).cast("long").as("_x")) ++
        (1 to maxLag).map(h =>
          lag(col(valueCol).cast("long"), h).over(w).as(s"_y$h")): _*)
    val pairs = lagged
      .select(col(entityCol), explode(array((1 to maxLag).map(h =>
        struct(lit(h).cast("long").as("lag"), col("_x").as("x"),
          col(s"_y$h").as("y"))): _*)).as("_p"))
      .select(col(entityCol), col("_p.lag").as("lag"),
        col("_p.x").as("x"), col("_p.y").as("y"))
      .filter(col("y").isNotNull)
    pearsonByLag(pairs, entityCol).withColumnRenamed("r", "acf")
  }

  /** Shared Pearson stage for the lag-pair family ([[autocorrelation]],
    * [[crossCorrelation]]): `pairs` = (`entityCol`, lag, x, y) with
    * integer x/y; one (entity, lag) partial agg of exact decimal(38,0)
    * moments, the correlation once in double, null-guard on the
    * variance PRODUCT (a zero-variance side makes it exactly 0, and a
    * >2^53 rounding artifact could make it tiny-negative — sqrt of
    * which is engine-divergent NaN territory). */
  private def pearsonByLag(pairs: DataFrame,
      entityCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val m = pairs.groupBy(col(entityCol), col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      count(lit(1)).cast("double").as("_n"),
      sum(col("x").cast(dec)).cast("double").as("_sx"),
      sum(col("y").cast(dec)).cast("double").as("_sy"),
      sum(col("x").cast(dec) * col("y").cast(dec)).cast("double").as("_sxy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).cast("double").as("_sxx"),
      sum(col("y").cast(dec) * col("y").cast(dec)).cast("double").as("_syy"))
    val prod =
      (col("_n") * col("_sxx") - col("_sx") * col("_sx")) *
        (col("_n") * col("_syy") - col("_sy") * col("_sy"))
    m.select(col(entityCol), col("lag"), col("n_pairs"),
      when(col("n_pairs") < 2 || prod <= 0.0, lit(null).cast("double"))
        .otherwise(
          (col("_n") * col("_sxy") - col("_sx") * col("_sy")) / sqrt(prod))
        .as("r"))
  }

  /** Per-entity ordinary-least-squares trend — "is this metric drifting,
    * and how fast?": slope, intercept, and r² of `valueCol` against time,
    * the scalar trend detector feeding drift dashboards and the seasonal
    * family ([[seasonalDecompose]], [[holtWinters]]).
    *
    * Exactness discipline (the [[autocorrelation]] contract): `valueCol`
    * must be integer-valued (pre-scaled by the caller); x is the epoch
    * offset from the ENTITY's first observation integer-divided by
    * `xUnitSec` (centering keeps x² sums small and makes the intercept
    * "level at entity start" — slope is unchanged by the shift); all five
    * moments accumulate exact in decimal(38,0); the closed-form slope /
    * intercept / r² run once in double; null-guards sit on the variance
    * terms, not post-hoc NaN checks (sqrt/division of a rounding artifact
    * is engine-divergent).
    *
    * Scale notes (100 TB): the per-entity x-origin rides a whole-frame
    * window on the SAME entity key the moment aggregation shuffles on, so
    * the exchange is reused — one shuffle total; moments partial-agg
    * map-side; output is entity-sized. Nothing driver-side.
    *
    * @return (`entityCol`, `n`, `slope` — value-units per `xUnitSec`,
    *         `intercept` — level at the entity's first observation,
    *         `r2`; slope/intercept null when n < 2 or x has no spread,
    *         r2 additionally null when y is constant). */
  def linearTrend(df: DataFrame, entityCol: String, tsSecCol: String,
      valueCol: String, xUnitSec: Long = 86400L): DataFrame = {
    require(xUnitSec >= 1L, "xUnitSec must be >= 1")
    val dec = "decimal(38,0)"
    val wAll = Window.partitionBy(col(entityCol))
    // Integer `div`, never float-divide-then-cast: Spark's double→long
    // cast truncates while DuckDB's rounds — the one arithmetic shape
    // that cannot be mirrored in an oracle.
    val xy = df
      .filter(col(tsSecCol).isNotNull && col(valueCol).isNotNull)
      .select(col(entityCol),
        (col(tsSecCol).cast("long") -
          min(col(tsSecCol).cast("long")).over(wAll)).as("_diff"),
        col(valueCol).cast("long").as("_y"))
      .select(col(entityCol), expr(s"_diff div ${xUnitSec}L").as("_x"),
        col("_y"))
    val m = xy.groupBy(col(entityCol)).agg(
      count(lit(1)).as("n"),
      count(lit(1)).cast("double").as("_n"),
      sum(col("_x").cast(dec)).cast("double").as("_sx"),
      sum(col("_y").cast(dec)).cast("double").as("_sy"),
      sum(col("_x").cast(dec) * col("_y").cast(dec)).cast("double").as("_sxy"),
      sum(col("_x").cast(dec) * col("_x").cast(dec)).cast("double").as("_sxx"),
      sum(col("_y").cast(dec) * col("_y").cast(dec)).cast("double").as("_syy"))
    val xVar = col("_n") * col("_sxx") - col("_sx") * col("_sx")
    val yVar = col("_n") * col("_syy") - col("_sy") * col("_sy")
    val cov = col("_n") * col("_sxy") - col("_sx") * col("_sy")
    val slope = cov / xVar
    m.select(col(entityCol), col("n"),
      when(col("n") < 2 || xVar <= 0.0, lit(null).cast("double"))
        .otherwise(slope).as("slope"),
      when(col("n") < 2 || xVar <= 0.0, lit(null).cast("double"))
        .otherwise((col("_sy") - slope * col("_sx")) / col("_n"))
        .as("intercept"),
      when(col("n") < 2 || xVar <= 0.0 || yVar <= 0.0,
          lit(null).cast("double"))
        .otherwise(cov * cov / (xVar * yVar)).as("r2"))
  }

  /** Per-entity inter-arrival statistics — "is this activity steady,
    * random, or bursty?": the gap-distribution summary behind bot
    * detection (machine-regular gaps → B ≈ −1), crawl scheduling, and
    * event-stream QC. For each entity the consecutive-event gaps (in
    * seconds, over the (ts, id) total order) aggregate to mean, sample
    * sd, coefficient of variation, and the Goh–Barabási burstiness
    * B = (σ−μ)/(σ+μ) — −1 perfectly periodic, 0 Poisson-random, →1
    * heavy-tailed bursts.
    *
    * Exactness: gaps are exact integer differences; moments accumulate
    * in decimal(38,0); the double closed forms run once with the
    * variance guard (zero-variance entities get sd/cv/B of exactly
    * 0 / 0 / −1, not a rounding accident — special-cased on the exact
    * integer variance numerator).
    *
    * Scale notes (100 TB): one (entity, ts, id) window for the lag and
    * one entity partial-agg in the same partitioning — the exchange is
    * reused; output is entity-sized.
    *
    * @return (`entityCol`, `n_gaps`, `gap_mean`, `gap_sd`, `cv`,
    *         `burstiness`; entities with < 2 events emit no row —
    *         they have no gaps). */
  def interArrival(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsSecCol).cast("long"), col(idCol))
    val gaps = df
      .filter(col(tsSecCol).isNotNull)
      .select(col(entityCol),
        (col(tsSecCol).cast("long") -
          lag(col(tsSecCol).cast("long"), 1).over(w)).as("_g"))
      .filter(col("_g").isNotNull)
    val m = gaps.groupBy(col(entityCol)).agg(
      count(lit(1)).as("n_gaps"),
      count(lit(1)).cast("double").as("_n"),
      sum(col("_g").cast(dec)).cast("double").as("_s1"),
      sum(col("_g").cast(dec) * col("_g").cast(dec)).cast("double").as("_s2"))
    val varNum = col("_n") * col("_s2") - col("_s1") * col("_s1")
    val mean = col("_s1") / col("_n")
    val sd = sqrt(varNum / (col("_n") * (col("_n") - 1.0)))
    m.select(col(entityCol), col("n_gaps"),
      mean.as("gap_mean"),
      when(col("n_gaps") < 2 || varNum <= 0.0, lit(0.0))
        .otherwise(sd).as("gap_sd"),
      when(col("n_gaps") < 2 || varNum <= 0.0 || mean === 0.0, lit(0.0))
        .otherwise(sd / mean).as("cv"),
      when(col("n_gaps") < 2 || varNum <= 0.0, lit(-1.0))
        .otherwise((sd - mean) / (sd + mean)).as("burstiness"))
  }

  /** Seasonally-adjusted anomaly detection — the composition every
    * monitoring pipeline actually wants: [[seasonalDecompose]] strips
    * trend + weekly shape, then each entity's RESIDUALS are z-scored
    * against their own spread — a Sunday dip is normal, a Sunday spike
    * flags. Residuals are e4-integerized BEFORE the moment aggregation
    * (the engine-wide exactness discipline: the z both engines compute
    * is over the identical integer series; z is scale-invariant so the
    * e4 unit cancels), moments exact decimal(38,0), the z once in
    * double with the [[rollingZscore]] sample-sd shapes and guards.
    *
    * Scale notes (100 TB): [[seasonalDecompose]]'s one (entity, time)
    * partitioning + the entity-keyed moment aggregate and join — the
    * moment table is entity-sized; nothing new shuffles.
    *
    * @return (`entityCol`, `tsSecCol`, `idCol`, `v`, `resid_e4`, `z` —
    *         null when the entity has < 2 usable residuals or zero
    *         spread, `is_anomaly` — false when z is null; edge rows
    *         whose residual is undefined are dropped). */
  def seasonalAnomaly(df: DataFrame, entityCol: String,
      tsSecCol: String, idCol: String, valueCol: String, period: Int,
      halfWindow: Int, zThreshold: Double = 3.0): DataFrame = {
    require(zThreshold > 0.0, s"zThreshold must be > 0 (got $zThreshold)")
    val dec = "decimal(38,0)"
    val r = seasonalDecompose(df, entityCol, tsSecCol, idCol, valueCol,
        period, halfWindow)
      .filter(col("resid").isNotNull)
      .withColumn("_r4",
        floor(col("resid") * lit(1e4) + lit(0.5)).cast("long"))
    val m = r.groupBy(col(entityCol)).agg(
      count(lit(1)).as("_n"),
      count(lit(1)).cast("double").as("_nd"),
      sum(col("_r4").cast(dec)).cast("double").as("_s1"),
      sum(col("_r4").cast(dec) * col("_r4").cast(dec)).cast("double").as("_s2"))
    val varNum = col("_nd") * col("_s2") - col("_s1") * col("_s1")
    val z = when(col("_n") < 2 || varNum <= 0.0,
        lit(null).cast("double"))
      .otherwise((col("_r4") - col("_s1") / col("_nd")) /
        sqrt(varNum / (col("_nd") * (col("_nd") - 1.0))))
    r.join(m, Seq(entityCol))
      .select(col(entityCol), col(tsSecCol), col(idCol), col("v"),
        col("_r4").as("resid_e4"), z.as("z"),
        coalesce(abs(z) > lit(zThreshold), lit(false)).as("is_anomaly"))
  }

  /** Per-entity Theil–Sen robust trend — the outlier-immune complement
    * to [[linearTrend]] (one wild value swings an OLS slope; the median
    * of pairwise slopes shrugs it off; breakdown point ≈ 29%).
    *
    * slope = median over all point pairs (x₁ < x₂) of (y₂−y₁)/(x₂−x₁);
    * intercept = median of (y − slope·x). Same input contract as
    * [[linearTrend]]: integer `valueCol`, x = epoch offset from the
    * entity's first observation integer-`div` `xUnitSec` (same-x pairs
    * are excluded — their slope is undefined). Medians are exact
    * interpolated percentiles — lo (odd n) or 0.5·lo + 0.5·hi over the
    * two middle ranks (even n), the identical association Spark's
    * `percentile` and DuckDB's `quantile_cont` interpolate at p = 0.5 —
    * and every per-pair double is a function of exact integers, so the
    * whole statistic is engine/partition-exact.
    *
    * Scale notes (100 TB): the pair expansion is quadratic PER ENTITY —
    * the [[graft.operators.RelPipeline.cooccurrenceEdges]] cap
    * discipline applies: entities wider than `maxPoints` observations
    * are EXCLUDED from the estimate and reported in the second frame
    * (first `maxPoints` in (x, y) order would silently change the
    * statistic; refusing loudly is the honest contract). The pair join
    * is entity-local (equi-join on the entity key); medians are SORT-
    * based (`row_number` + partition count over an entity-keyed window
    * picks the middle ranks) — a spillable, codegen'd sort with O(1)
    * per-row state, NOT the value-buffering `percentile` aggregate,
    * whose ~n²/2-doubles-per-entity aggregation buffers made this the
    * most allocation-intensive shape in the suite under memory
    * pressure.
    *
    * @return (trends (`entityCol`, `n_points`, `n_pairs`, `slope`,
    *         `intercept`) — entities with no valid pair (single point,
    *         or every observation in one x bucket) have no trend and
    *         emit no row, overflow (`entityCol`, `n_points`) for capped
    *         entities). */
  def theilSenTrend(df: DataFrame, entityCol: String, tsSecCol: String,
      valueCol: String, xUnitSec: Long = 86400L,
      maxPoints: Int = 2000): (DataFrame, DataFrame) = {
    require(xUnitSec >= 1L, "xUnitSec must be >= 1")
    require(maxPoints >= 2, s"maxPoints must be >= 2 (got $maxPoints)")
    val wAll = Window.partitionBy(col(entityCol))
    val xy = df
      .filter(col(tsSecCol).isNotNull && col(valueCol).isNotNull)
      .select(col(entityCol),
        (col(tsSecCol).cast("long") -
          min(col(tsSecCol).cast("long")).over(wAll)).as("_diff"),
        col(valueCol).cast("long").as("_y"))
      .select(col(entityCol), expr(s"_diff div ${xUnitSec}L").as("_x"),
        col("_y"))
    val sizes = xy.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_points"))
    val overflow = sizes.filter(col("n_points") > maxPoints)
      .select(col(entityCol), col("n_points"))
    val kept = xy.join(
      sizes.filter(col("n_points") <= maxPoints)
        .select(col(entityCol), col("n_points")),
      Seq(entityCol))
    val a = kept.select(col(entityCol), col("n_points"),
      col("_x").as("_x1"), col("_y").as("_y1"))
    val b = kept.select(col(entityCol), col("_x").as("_x2"),
      col("_y").as("_y2"))
    val slopes = a.join(b, Seq(entityCol))
      .filter(col("_x1") < col("_x2"))
      .select(col(entityCol), col("n_points"),
        ((col("_y2") - col("_y1")).cast("double") /
          (col("_x2") - col("_x1")).cast("double")).as("_s"))
    // Sort-based exact median: rank within the entity, keep the middle
    // one (odd n) or two (even n) rows — `_rn·2` is even, `_cnt+1` odd
    // exactly when n is even, so |_rn·2 − (_cnt+1)| ≤ 1 selects
    // precisely the middle rank(s); ties in the value order can swap
    // ROWS between the middle ranks but never the VALUES read there.
    // 0.5·lo + 0.5·hi is bit-equal to Spark `percentile(v, 0.5)`
    // ((higher−position)·lo + (position−lower)·hi with both weights
    // exactly 0.5) while the execution plan is shuffle + spillable sort
    // instead of an aggregation buffer holding every value.
    def sortMedian(values: DataFrame, vCol: String,
        out: String): DataFrame = {
      val wSort = Window.partitionBy(col(entityCol)).orderBy(col(vCol))
      val wPart = Window.partitionBy(col(entityCol))
      values
        .select(col(entityCol), col(vCol),
          row_number().over(wSort).as("_rn"),
          count(lit(1)).over(wPart).as("_cnt"))
        .filter(abs(col("_rn") * 2 - (col("_cnt") + 1)) <= 1)
        .groupBy(col(entityCol))
        .agg(max(col("_cnt")).as("_n"),
          min(col(vCol)).as("_lo"), max(col(vCol)).as("_hi"))
        .select(col(entityCol), col("_n"),
          when(col("_n") % 2 === 1, col("_lo"))
            .otherwise(lit(0.5) * col("_lo") + lit(0.5) * col("_hi"))
            .as(out))
    }
    val med = sortMedian(slopes.select(col(entityCol), col("_s")), "_s",
      "slope").withColumnRenamed("_n", "n_pairs")
    val resid = kept
      .join(med.select(col(entityCol), col("slope")), Seq(entityCol))
      .select(col(entityCol),
        (col("_y").cast("double") -
          col("slope") * col("_x").cast("double")).as("_r"))
    val icept = sortMedian(resid, "_r", "intercept").drop("_n")
    val trends = med
      .join(sizes.select(col(entityCol), col("n_points")), Seq(entityCol))
      .join(icept, Seq(entityCol))
      .select(col(entityCol), col("n_points"), col("n_pairs"),
        col("slope"), col("intercept"))
    (trends, overflow)
  }

  /** Lead–lag cross-correlation between two event types per entity —
    * "do purchases FOLLOW views, and by how many buckets?": both types'
    * values bucket onto one `intervalSec` grid (0-filled — absence is
    * signal for event intensity), then Pearson between x = `typeA` and
    * y = `typeB` shifted by each lag in [−`maxLag`, `maxLag`]. A peak
    * at positive lag means B trails A by that many buckets.
    *
    * Same exactness discipline as [[autocorrelation]]: integer-valued
    * `valueCol` (pre-scaled), exact bucket sums, decimal moments, one
    * double correlation, variance-product null guard.
    *
    * Scale notes (100 TB): the type filter and bucket partial-agg
    * collapse events to (entity, bucket) BEFORE any window; the grid
    * explode is bounded per entity by span/interval (the
    * [[resampleLocf]] bound, never event count); ONE (entity, bucket)
    * window carries all 2·maxLag+1 shift columns.
    *
    * @return (`entityCol`, `lag` −maxLag..maxLag, `n_pairs`, `ccf`). */
  def crossCorrelation(df: DataFrame, entityCol: String,
      tsSecCol: String, valueCol: String, typeCol: String,
      typeA: String, typeB: String, intervalSec: Long,
      maxLag: Int): DataFrame = {
    require(intervalSec > 0, "intervalSec must be > 0")
    require(maxLag >= 1, "maxLag must be >= 1")
    require(typeA != typeB, "typeA and typeB must differ")
    val buckets = df
      .filter(col(tsSecCol).isNotNull &&
        col(typeCol).isin(typeA, typeB))
      .select(col(entityCol),
        expr(s"$tsSecCol div $intervalSec").as("bucket"),
        col(typeCol).as("_t"), col(valueCol).cast("long").as("_v"))
      .groupBy(col(entityCol), col("bucket"))
      .agg(
        sum(when(col("_t") === typeA, col("_v")).otherwise(0L)).as("xa"),
        sum(when(col("_t") === typeB, col("_v")).otherwise(0L)).as("xb"))
    val span = buckets.groupBy(col(entityCol))
      .agg(min("bucket").as("_b0"), max("bucket").as("_b1"))
    val grid = span.select(col(entityCol),
      explode(sequence(col("_b0"), col("_b1"))).as("bucket"))
    val filled = grid.join(buckets, Seq(entityCol, "bucket"), "left")
      .select(col(entityCol), col("bucket"),
        coalesce(col("xa"), lit(0L)).as("xa"),
        coalesce(col("xb"), lit(0L)).as("xb"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("bucket"))
    def shifted(h: Int) =
      if (h > 0) lead(col("xb"), h).over(w)
      else if (h < 0) lag(col("xb"), -h).over(w)
      else col("xb")
    val lags = -maxLag to maxLag
    val pairs = filled
      .select(Seq(col(entityCol), col("xa")) ++
        lags.map(h => shifted(h).as(s"_y$h")): _*)
      .select(col(entityCol), explode(array(lags.map(h =>
        struct(lit(h).cast("long").as("lag"), col("xa").as("x"),
          col(s"_y$h").as("y"))): _*)).as("_p"))
      .select(col(entityCol), col("_p.lag").as("lag"),
        col("_p.x").as("x"), col("_p.y").as("y"))
      .filter(col("y").isNotNull)
    pearsonByLag(pairs, entityCol).withColumnRenamed("r", "ccf")
  }

  /** Dominant-period pick over [[autocorrelation]] — the automated
    * "what period should [[seasonalDecompose]] / [[holtWinters]] use"
    * answer: per entity, the lag in [`minLag`, `maxLag`] with the
    * highest autocorrelation. Lag 1 is excluded by default (`minLag` =
    * 2): any smooth series is trivially lag-1-correlated; a seasonal
    * period of 1 is no season.
    *
    * The argmax ranks on the e6-INTEGERIZED acf with smallest-lag
    * tie-break — a total order over exact longs (the [[Relevance
    * .topTerms]] discipline; a raw-double ORDER BY could flip the
    * pick on an ulp). Entities whose every candidate lag is null
    * (constant series, too few pairs) drop out.
    *
    * Scale notes: [[autocorrelation]]'s two shuffles plus one window
    * over the ≤ (maxLag − minLag + 1)-row per-entity candidates.
    *
    * @return (`entityCol`, `period`, `n_pairs`, `acf`). */
  def dominantPeriod(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, valueCol: String, maxLag: Int,
      minLag: Int = 2): DataFrame = {
    require(minLag >= 1 && minLag <= maxLag,
      s"need 1 <= minLag <= maxLag (got [$minLag, $maxLag])")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col("_acf_e6").desc, col("lag"))
    autocorrelation(df, entityCol, tsSecCol, idCol, valueCol, maxLag)
      .filter(col("lag") >= minLag && col("acf").isNotNull)
      .withColumn("_acf_e6",
        floor(col("acf") * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(entityCol), col("lag").as("period"), col("n_pairs"),
        col("acf"))
  }
}
