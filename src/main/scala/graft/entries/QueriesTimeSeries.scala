package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.GraphConfig
import graft.functions.{GraftFunctions => GF, VectorFunctions => VF}
import graft.operators._
import graft.streaming.StreamingIngest

/** time-series / event tier ST2-ST30 (windows, sessionization, forecasting, funnels, intervals) — one slice of the [[SparkEntry]] driver contract
  * (30 queries). Chunks moved verbatim from SparkEntry.scala;
  * the assembled `queries`/`oracleSql` maps are unchanged. */
private[graft] object QueriesTimeSeries {
  import EntryData._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- ST6: regular-grid resample + LOCF gap fill — per-user hourly
    // grid over the event stream; bucket arithmetic is exact longs, the
    // carried average e4-integerized ----
    "q_st6_resample_locf" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
      TimeSeries.resampleLocf(e, "user_id", "es", "value",
          intervalSec = 3600L)
        .select(col("user_id"), col("bucket_ts"), col("n_events"),
          floor(col("v_filled") * 1e4 + 0.5).cast("long").as("v_filled_e4"))
        .orderBy("user_id", "bucket_ts")
    }),

    // ---- ST7: regular-grid resample + LINEAR interpolation — same grid
    // as ST6, gap buckets get the lerp between bracketing observations;
    // the lerp expression shape is mirrored exactly in the oracle so the
    // IEEE double math is bit-identical, then e4-integerized ----
    "q_st7_resample_interp" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
      TimeSeries.resampleInterp(e, "user_id", "es", "value",
          intervalSec = 3600L)
        .select(col("user_id"), col("bucket_ts"), col("n_events"),
          floor(col("v_interp") * 1e4 + 0.5).cast("long").as("v_interp_e4"))
        .orderBy("user_id", "bucket_ts")
    }),

    // ---- ST8: per-entity EWMA — one in-Catalyst left fold per user;
    // the oracle replays the identical double chain with list_reduce
    // over the (es, event_id)-ordered values, e4-integerized ----
    "q_st8_ewma" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
      TimeSeries.ewma(e, "user_id", "es", "event_id", "value",
          alpha = 0.2)
        .select(col("user_id"), col("es"), col("event_id"), col("v"),
          floor(col("ewma") * lit(1e4) + lit(0.5)).cast("long")
            .as("ewma_e4"))
        .orderBy("user_id", "es", "event_id")
    }),

    // ---- ST9: exact rolling median over the last 10 events per user —
    // values pre-scaled to integer cents so every median (odd frame:
    // middle element; even: middle-pair mean) is exact at .5 granularity;
    // med_e1 = med·10 is pure integer on both engines, no float compare ----
    "q_st9_rolling_median" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      TimeSeries.rollingMedian(e, "user_id", "es", "event_id", "cents",
          nRows = 10)
        .select(col("user_id"), col("es"), col("event_id"),
          col("v").cast("long").as("cents"),
          (col("med") * 10).cast("long").as("med_e1"))
        .orderBy("user_id", "es", "event_id")
    }),

    // ---- ST10: EWMA-residual anomaly flag — prediction is the PREVIOUS
    // row's EWMA (q_st8's bit-exact fold), residual e4-integerized, and
    // the 3σ test runs in decimal(38,0) exact arithmetic (oracle uses
    // HUGEINT) so the boolean can never flip on a float ulp ----
    "q_st10_ewma_anomaly" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
      TimeSeries.ewmaAnomaly(e, "user_id", "es", "event_id", "value",
          alpha = 0.2, z = 3)
        .orderBy("user_id", "es", "event_id")
    }),

    // ---- ST11: classical seasonal decomposition (trend + seasonal +
    // residual) per user over integer cents — trend is an exact-long
    // 7-row centered window sum divided once; the detrended series is
    // e4-integerized BEFORE the per-(user, phase) seasonal mean, so no
    // distributed double summation exists anywhere in the plan ----
    "q_st11_seasonal" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      TimeSeries.seasonalDecompose(e, "user_id", "es", "event_id",
          "cents", period = 7, halfWindow = 3)
        .select(col("user_id"), col("es"), col("event_id"),
          col("v").as("cents"), col("phase"),
          floor(col("trend") * lit(1e4) + lit(0.5)).cast("long")
            .as("trend_e4"),
          floor(col("seasonal") * lit(1e4) + lit(0.5)).cast("long")
            .as("seasonal_e4"),
          floor(col("resid") * lit(1e4) + lit(0.5)).cast("long")
            .as("resid_e4"))
        .orderBy("user_id", "es", "event_id")
    }),

    // ---- ST26: seasonally-adjusted anomalies — the ST11 decomposition
    // with each entity's residuals z-scored against their own spread;
    // residuals e4-integerized before the moments so both engines score
    // the identical integer series ----
    "q_st26_seasonal_anomaly" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      TimeSeries.seasonalAnomaly(e, "user_id", "es", "event_id",
          "cents", period = 7, halfWindow = 3, zThreshold = 3.0)
        .select(col("user_id"), col("es"), col("event_id"), col("v"),
          col("resid_e4"),
          floor(col("z") * lit(1e4) + lit(0.5)).cast("long").as("z_e4"),
          col("is_anomaly"))
        .orderBy("user_id", "es", "event_id")
    }),

    // ---- ST27: inter-arrival burstiness per user — exact integer gaps
    // over the (ts, id) order, decimal moments, Goh–Barabási B ----
    "q_st27_interarrival" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"))
      TimeSeries.interArrival(e, "user_id", "es", "event_id")
        .select(col("user_id"), col("n_gaps"),
          floor(col("gap_mean") * lit(1e2) + lit(0.5)).cast("long")
            .as("mean_e2"),
          floor(col("gap_sd") * lit(1e2) + lit(0.5)).cast("long")
            .as("sd_e2"),
          floor(col("cv") * lit(1e6) + lit(0.5)).cast("long")
            .as("cv_e6"),
          floor(col("burstiness") * lit(1e6) + lit(0.5)).cast("long")
            .as("b_e6"))
        .orderBy("user_id")
    }),

    // ---- ST12: two-sided CUSUM change detection per user — the whole
    // statistic chain is exact integer/decimal arithmetic (values in
    // cents, recurrences n-scaled so the reference mean needs no
    // division), so every flag is bit-identical on any engine ----
    "q_st12_cusum" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      TimeSeries.cusum(e, "user_id", "es", "event_id", "cents",
          slack = 2000L, threshold = 20000L)
        .select(col("user_id"), col("es"), col("event_id"),
          col("v").as("cents"), col("sp").cast("long").as("sp_cn"),
          col("sn").cast("long").as("sn_cn"), col("is_change"))
        .orderBy("user_id", "es", "event_id")
    }),

    // ---- ST13: Holt double exponential smoothing — level + trend +
    // one-step forecast per user; the fold re-derives l_t inside the
    // trend arm (see TimeSeries.holt) so the oracle's list-accumulator
    // replay is term-by-term IEEE-identical, then e4-integerized ----
    "q_st13_holt" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
      TimeSeries.holt(e, "user_id", "es", "event_id", "value",
          alpha = 0.2, beta = 0.1)
        .select(col("user_id"), col("es"), col("event_id"), col("v"),
          floor(col("level") * lit(1e4) + lit(0.5)).cast("long")
            .as("level_e4"),
          floor(col("trend") * lit(1e4) + lit(0.5)).cast("long")
            .as("trend_e4"),
          floor(col("forecast") * lit(1e4) + lit(0.5)).cast("long")
            .as("forecast_e4"),
          floor(col("resid") * lit(1e4) + lit(0.5)).cast("long")
            .as("resid_e4"))
        .orderBy("user_id", "es", "event_id")
    }),

    // ---- ST16: Holt–Winters additive (α=0.3, β=0.2, γ=0.3, m=3) — the
    // oracle replays the fold with an [n, l, b, s1..s3] list accumulator
    // and spells every 1−x factor as the subtraction (1−0.3 is NOT the
    // 0.7 literal's double) ----
    "q_st16_holt_winters" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
      TimeSeries.holtWinters(e, "user_id", "es", "event_id", "value",
          alpha = 0.3, beta = 0.2, gamma = 0.3, period = 3)
        .select(col("user_id"), col("es"), col("event_id"), col("v"),
          floor(col("level") * lit(1e4) + lit(0.5)).cast("long")
            .as("level_e4"),
          floor(col("trend") * lit(1e4) + lit(0.5)).cast("long")
            .as("trend_e4"),
          floor(col("seasonal") * lit(1e4) + lit(0.5)).cast("long")
            .as("seasonal_e4"),
          floor(col("forecast") * lit(1e4) + lit(0.5)).cast("long")
            .as("forecast_e4"),
          floor(col("resid") * lit(1e4) + lit(0.5)).cast("long")
            .as("resid_e4"))
        .orderBy("user_id", "es", "event_id")
    }),

    // ---- ST14: per-entity autocorrelation at lags 1..3 — values milli-
    // integerized so all moment sums are exact (the g16 Pearson shape);
    // acf e4-integerized for the compare ----
    "q_st14_acf" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"),
        floor(col("value") * 1000 + 0.5).cast("long").as("v"))
      TimeSeries.autocorrelation(e, "user_id", "es", "event_id", "v",
          maxLag = 3)
        .select(col("user_id"), col("lag"), col("n_pairs"),
          floor(col("acf") * lit(1e4) + lit(0.5)).cast("long")
            .as("acf_e4"))
        .orderBy("user_id", "lag")
    }),

    // ---- ST15: view → click → purchase funnel, 30-day window from the
    // anchor; timestamps are epoch seconds so the whole fold is exact
    // integer arithmetic ----
    "q_st15_funnel" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("event_type"))
      Funnel.windowFunnel(e, "user_id", "es", "event_id", "event_type",
          Seq("view", "click", "purchase"), windowSec = 2592000L)
        .select(col("user_id"), col("max_stage"), col("t_first"),
          col("t_last"), col("dur_sec"))
        .orderBy("user_id")
    }),

    // ---- ST20: daily cohort retention over events — cohort/age/count
    // cells are pure integer epoch arithmetic; the retention ratio is the
    // single floating division, e6-integerized ----
    "q_st20_cohort" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"),
        unix_timestamp(col("ts")).as("es"))
      Funnel.cohortRetention(e, "user_id", "es", bucketSec = 86400L)
        .select(col("cohort"), col("age"), col("n_active"),
          floor(col("retention") * lit(1e6) + lit(0.5)).cast("long")
            .as("ret_e6"))
        .orderBy("cohort", "age")
    }),

    // ---- ST21: gap-based sessionization of the events stream (1-hour
    // silence closes a session) — boundaries, counts, and durations are
    // pure integer epoch arithmetic over a (ts, id) total order ----
    "q_st21_sessionize" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"))
      Funnel.sessionStats(e, "user_id", "es", "event_id", gapSec = 3600L)
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("t_start"), col("t_end"), col("dur_sec"))
        .orderBy("user_id", "session_seq")
    }),

    // ---- ST30: interval coalescing — gaps-and-islands over INTERVALS
    // (the interval-set twin of ST21's point-event sessionization):
    // order-key-derived integer intervals per customer bucket,
    // running-max-end island detection with a merge gap of 2. Exact
    // integer arithmetic throughout; the oracle replays the windowed
    // running max and the same strict boundary rule. ----
    "q_st30_interval_merge" -> ((s, dir) => {
      val iv = t(s, dir, "orders")
        .select((col("o_custkey") % 50).as("k"),
          (col("o_orderkey") % 997).cast("long").as("ivl_start"))
        .withColumn("ivl_end",
          col("ivl_start") + col("ivl_start") % 13)
      Funnel.mergeIntervals(iv, "k", "ivl_start", "ivl_end", minGap = 2)
        .orderBy("k", "island_seq")
    }),

    // ---- ST30b: EXACT incremental island maintenance — two thirds of
    // the intervals are merged first, the rest arrive as the delta and
    // absorb into the stored islands (islands+delta-sized work, the
    // history never re-read). Oracle: q_st30's full-merge SQL VERBATIM
    // — the absorbed store must be bit-identical to the full
    // recompute, n_merged included. ----
    "q_st30b_interval_absorb" -> ((s, dir) => {
      val iv = t(s, dir, "orders")
        .select((col("o_custkey") % 50).as("k"),
          (col("o_orderkey") % 997).cast("long").as("ivl_start"),
          col("o_orderkey"))
        .withColumn("ivl_end", col("ivl_start") + col("ivl_start") % 13)
      val base = iv.filter(col("o_orderkey") % 3 =!= 0)
      val delta = iv.filter(col("o_orderkey") % 3 === 0)
      Funnel.absorbIntervals(
          Funnel.mergeIntervals(base, "k", "ivl_start", "ivl_end",
            minGap = 2),
          delta, "k", "ivl_start", "ivl_end", minGap = 2)
        .orderBy("k", "island_seq")
    }),

    // ---- ST30c: decremental island maintenance — the takedown twin
    // of ST30b: every seventh order's interval is DELETED from the
    // stored islands; islands are per-key independent, so only the
    // touched keys re-merge from the post-delete raw store (deletes
    // can split islands — no islands-only composition exists). Oracle:
    // q_st30's full-merge SQL over the post-delete set — bit-identical
    // including n_merged. ----
    "q_st30c_interval_delete" -> ((s, dir) => {
      val iv = t(s, dir, "orders")
        .select((col("o_custkey") % 50).as("k"),
          (col("o_orderkey") % 997).cast("long").as("ivl_start"),
          col("o_orderkey"))
        .withColumn("ivl_end", col("ivl_start") + col("ivl_start") % 13)
      Funnel.deleteIntervals(
          Funnel.mergeIntervals(iv, "k", "ivl_start", "ivl_end",
            minGap = 2),
          iv.filter(col("o_orderkey") % 7 =!= 0),
          iv.filter(col("o_orderkey") % 7 === 0),
          "k", "ivl_start", "ivl_end", minGap = 2)
        .orderBy("k", "island_seq")
    }),

    // ---- ST22: per-entity OLS trend — slope/intercept/r² of the milli-
    // integerized value over day offsets from each entity's first
    // observation; moments exact decimal, one double closed form ----
    "q_st22_linear_trend" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"),
        unix_timestamp(col("ts")).as("es"),
        floor(col("value") * 1000 + 0.5).cast("long").as("v"))
      TimeSeries.linearTrend(e, "user_id", "es", "v", xUnitSec = 86400L)
        .select(col("user_id"), col("n"),
          floor(col("slope") * lit(1e4) + lit(0.5)).cast("long")
            .as("slope_e4"),
          floor(col("intercept") * lit(1e2) + lit(0.5)).cast("long")
            .as("icept_e2"),
          floor(col("r2") * lit(1e6) + lit(0.5)).cast("long")
            .as("r2_e6"))
        .orderBy("user_id")
    }),

    // ---- ST25: Theil–Sen robust trend — median pairwise slope per
    // entity on the same day-offset x as ST22; the cap (2000) never
    // binds at test SFs so the oracle needn't replicate it ----
    "q_st25_theil_sen" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"),
        unix_timestamp(col("ts")).as("es"),
        floor(col("value") * 1000 + 0.5).cast("long").as("v"))
      val (tr, _) = TimeSeries.theilSenTrend(e, "user_id", "es", "v",
        xUnitSec = 86400L, maxPoints = 2000)
      tr.select(col("user_id"), col("n_points"), col("n_pairs"),
          floor(col("slope") * lit(1e4) + lit(0.5)).cast("long")
            .as("slope_e4"),
          floor(col("intercept") * lit(1e2) + lit(0.5)).cast("long")
            .as("icept_e2"))
        .orderBy("user_id")
    }),

    // ---- ST23: RFM segmentation of customers over their orders —
    // recency anchored at the global max order date (pure function of
    // the data), monetary in exact cents, quantile-band scores ----
    "q_st23_rfm" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("es"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      Funnel.rfm(o, "o_custkey", "es", "cents", nTiles = 5)
        .orderBy("o_custkey")
    }),

    // ---- ST29: event-type transition matrix — per-state next-event
    // probabilities over each user's ordered stream ----
    "q_st29_transitions" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("event_type"))
      Funnel.transitionMatrix(e, "user_id", "es", "event_id",
          "event_type")
        .select(col("from_type"), col("to_type"), col("n"),
          floor(col("p") * lit(1e6) + lit(0.5)).cast("long").as("p_e6"))
        .orderBy("from_type", "to_type")
    }),

    // ---- ST28: top-20 frequent 3-event behavioral sequences — type
    // n-grams over each user's (ts, id)-ordered stream, deterministic
    // (count desc, sequence asc) ranking ----
    "q_st28_frequent_seqs" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("event_type"))
      Funnel.frequentSequences(e, "user_id", "es", "event_id",
          "event_type", n = 3, topK = 20)
        .orderBy("rank")
    }),

    // ---- ST24: first/last-touch attribution — every purchase credits
    // the first and last view/click inside a 14-day lookback; one RANGE
    // window per entity, exact epoch arithmetic ----
    "q_st24_attribution" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("event_type"))
      Funnel.attribution(e, "user_id", "es", "event_id", "event_type",
          convType = "purchase", touchTypes = Seq("view", "click"),
          lookbackSec = 1209600L)
        .orderBy("user_id", "conv_id")
    }),

    // ---- ST19: view→purchase lead-lag cross-correlation on a daily
    // grid, lags −2..2 — a positive-lag peak means purchases trail
    // views by that many days ----
    "q_st19_ccf" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"),
        unix_timestamp(col("ts")).as("es"), col("event_type"),
        floor(col("value") * 1000 + 0.5).cast("long").as("v"))
      TimeSeries.crossCorrelation(e, "user_id", "es", "v", "event_type",
          typeA = "view", typeB = "purchase", intervalSec = 86400L,
          maxLag = 2)
        .select(col("user_id"), col("lag"), col("n_pairs"),
          floor(col("ccf") * lit(1e4) + lit(0.5)).cast("long")
            .as("ccf_e4"))
        .orderBy("user_id", "lag")
    }),

    // ---- ST18: dominant ACF period per user (lags 2..3 of the ST14
    // moments) — the automated period pick for ST11/ST16 ----
    "q_st18_dominant_period" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"),
        floor(col("value") * 1000 + 0.5).cast("long").as("v"))
      TimeSeries.dominantPeriod(e, "user_id", "es", "event_id", "v",
          maxLag = 3, minLag = 2)
        .select(col("user_id"), col("period"), col("n_pairs"),
          floor(col("acf") * lit(1e4) + lit(0.5)).cast("long")
            .as("acf_e4"))
        .orderBy("user_id")
    }),

    // ---- ST17: rolling z-score over a 12-row window — exact decimal
    // frame moments, variance-product null guard (the ACF discipline),
    // cent-integerized input ----
    "q_st17_rolling_z" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"),
        floor(col("value") * 100 + 0.5).cast("long").as("v"))
      TimeSeries.rollingZscore(e, "user_id", "es", "event_id", "v",
          window = 12)
        .select(col("user_id"), col("es"), col("event_id"), col("v"),
          floor(col("mean") * lit(1e4) + lit(0.5)).cast("long")
            .as("mean_e4"),
          floor(col("sd") * lit(1e4) + lit(0.5)).cast("long")
            .as("sd_e4"),
          floor(col("z") * lit(1e4) + lit(0.5)).cast("long").as("z_e4"))
        .orderBy("user_id", "es", "event_id")
    }),

    // ---- ST3b/J5b: keyed time-interval join (batch twin of the
    // stream-stream join) — purchases in the hour before each click ----
    "q_st3_interval_join" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tsu"), col("event_type"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "tsu")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tsu").as("p_tsu"),
          round(col("value"), 2).as("p_value"))
      RangeJoin.intervalJoin(clicks, purchases, Seq("user_id"),
        "tsu", "p_tsu", lit(3600000000L))
        .orderBy("event_id", "p_tsu", "p_value")
    }),

    // ---- ST2 (batch mode): tumbling-window event aggregation ----
    "q_st2_events_window" -> ((s, dir) =>
      StreamingIngest.windowedEventAgg(
        events(s, dir), "ts", "event_type", "1 hour")
        .select(unix_timestamp(col("w_start")).as("w_start_epoch"),
          col("event_type"), col("n_events"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy("w_start_epoch", "event_type")),

    // ---- ST2c (batch mode): sliding-window event aggregation — every
    // event lands in duration/slide = 4 overlapping windows ----
    "q_st2c_events_sliding" -> ((s, dir) =>
      StreamingIngest.windowedEventAgg(
        events(s, dir), "ts", "event_type", "1 hour",
        slide = Some("15 minutes"))
        .select(unix_timestamp(col("w_start")).as("w_start_epoch"),
          col("event_type"), col("n_events"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy("w_start_epoch", "event_type")),

    // ---- ST2b (batch mode): session windows per user ----
    "q_st2b_events_session" -> ((s, dir) =>
      StreamingIngest.sessionAgg(events(s, dir), "ts", "user_id", "1 hour")
        .select(col("user_id"),
          unix_timestamp(col("w_start")).as("sess_start_epoch"),
          col("n_events"), round(col("sum_value"), 2).as("sum_value"))
        .orderBy("user_id", "sess_start_epoch")),
  )

  def oracles: Map[String, String] = Map(
    // Rolling z rebuild: same 12-row frame in the same (user, es,
    // event_id) order; HUGEINT frame sums cast to double, mirrored
    // mean/variance/z operand shapes, variance-product guard.
    "q_st17_rolling_z" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS es,
        |    CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS v
        |  FROM events),
        |f AS (
        |  SELECT user_id, es, event_id, v,
        |    count(*) OVER w AS n,
        |    CAST(sum(CAST(v AS HUGEINT)) OVER w AS DOUBLE) AS s1,
        |    CAST(sum(CAST(v AS HUGEINT) * v) OVER w AS DOUBLE) AS s2
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id
        |    ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
        |SELECT user_id, es, event_id, v,
        |  CASE WHEN n = 12 THEN
        |    CAST(floor(s1 / CAST(n AS DOUBLE) * 1e4
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS mean_e4,
        |  CASE WHEN n = 12
        |      AND CAST(n AS DOUBLE) * s2 - s1 * s1 >= CAST(0 AS DOUBLE)
        |    THEN CAST(floor(
        |      sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
        |        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |          - CAST(1 AS DOUBLE)))) * 1e4
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS sd_e4,
        |  CASE WHEN n = 12
        |      AND CAST(n AS DOUBLE) * s2 - s1 * s1 > CAST(0 AS DOUBLE)
        |    THEN CAST(floor(
        |      (v - s1 / CAST(n AS DOUBLE))
        |        / sqrt((CAST(n AS DOUBLE) * s2 - s1 * s1)
        |          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |            - CAST(1 AS DOUBLE)))) * 1e4
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS z_e4
        |FROM f
        |ORDER BY user_id, es, event_id""".stripMargin,

    "q_st3_interval_join" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tsu,
        |            event_type, value FROM events),
        |c AS (SELECT event_id, user_id, tsu FROM ev
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id, tsu AS p_tsu, ROUND(value, 2) AS p_value
        |      FROM ev WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.tsu, p.p_tsu, p.p_value
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.p_tsu >= c.tsu - 3600000000 AND p.p_tsu <= c.tsu
        |ORDER BY 1, 4, 5""".stripMargin,

    "q_st2_events_window" ->
      """SELECT CAST(date_part('epoch', date_trunc('hour', ts)) AS BIGINT)
        |  AS w_start_epoch,
        |event_type, count(*) AS n_events,
        |ROUND(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Sliding windows via explicit expansion: each event belongs to the 4
    // 15-min-aligned window starts in (ts - 1h, ts]. epoch_ns floors to
    // seconds with integer division (date_part('epoch') ROUNDS sub-second
    // timestamps — the trap from q_st2b).
    "q_st2c_events_sliding" ->
      """SELECT w_start_epoch, event_type, count(*) AS n_events,
        |ROUND(sum(value), 2) AS sum_value
        |FROM (
        |  SELECT ((epoch_ns(ts) // 1000000000) // 900) * 900 - k * 900
        |           AS w_start_epoch,
        |         event_type, value
        |  FROM events
        |  CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_st2b_events_session" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR ts - lag(ts) OVER w > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), sess AS (
        |  SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  CAST(floor(date_part('epoch', min(ts))) AS BIGINT) AS sess_start_epoch,
        |  count(*) AS n_events, ROUND(sum(value), 2) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_epoch""".stripMargin,

    // RANGE frame over integer epoch seconds (inclusive both ends on
    // both engines); ties (same second, same user) are frame peers.
    // Grid rebuild via per-entity range(); LOCF as IGNORE NULLS
    // last_value over the ordered grid. v_filled is never null (the
    // entity's first bucket is observed by construction).
    "q_st6_resample_locf" ->
      """WITH ev AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) AS es, value
        |  FROM events),
        |obs AS (
        |  SELECT user_id,
        |    CAST(floor(es / 3600.0) * 3600 AS BIGINT) AS bucket_ts,
        |    avg(value) AS v_avg, count(*) AS n_events
        |  FROM ev GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
        |  FROM obs GROUP BY 1),
        |grid AS (
        |  SELECT user_id, u.b AS bucket_ts
        |  FROM span, LATERAL (SELECT unnest(range(lo, hi + 3600, 3600))
        |    AS b) u)
        |SELECT g.user_id, g.bucket_ts,
        |  COALESCE(o.n_events, 0) AS n_events,
        |  CAST(floor(last_value(o.v_avg IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.bucket_ts
        |    ROWS UNBOUNDED PRECEDING) * 1e4 + CAST(0.5 AS DOUBLE))
        |    AS BIGINT) AS v_filled_e4
        |FROM grid g LEFT JOIN obs o
        |  ON o.user_id = g.user_id AND o.bucket_ts = g.bucket_ts
        |ORDER BY g.user_id, g.bucket_ts""".stripMargin,

    // ST7: identical CTE chain to q_st6; the gap-bucket lerp is written
    // with the same operand shape as the Spark projection (pv + (nv-pv)
    // * dt/span) so the double arithmetic matches bit-for-bit.
    "q_st7_resample_interp" ->
      """WITH ev AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) AS es, value
        |  FROM events),
        |obs AS (
        |  SELECT user_id,
        |    CAST(floor(es / 3600.0) * 3600 AS BIGINT) AS bucket_ts,
        |    avg(value) AS v_avg, count(*) AS n_events
        |  FROM ev GROUP BY 1, 2),
        |span AS (
        |  SELECT user_id, min(bucket_ts) AS lo, max(bucket_ts) AS hi
        |  FROM obs GROUP BY 1),
        |grid AS (
        |  SELECT user_id, u.b AS bucket_ts
        |  FROM span, LATERAL (SELECT unnest(range(lo, hi + 3600, 3600))
        |    AS b) u),
        |brk AS (
        |  SELECT g.user_id, g.bucket_ts,
        |    COALESCE(o.n_events, 0) AS n_events, o.v_avg,
        |    last_value(o.v_avg IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN o.v_avg IS NOT NULL
        |      THEN g.bucket_ts END IGNORE NULLS) OVER wb AS pt,
        |    first_value(o.v_avg IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN o.v_avg IS NOT NULL
        |      THEN g.bucket_ts END IGNORE NULLS) OVER wf AS nt
        |  FROM grid g LEFT JOIN obs o
        |    ON o.user_id = g.user_id AND o.bucket_ts = g.bucket_ts
        |  WINDOW wb AS (PARTITION BY g.user_id ORDER BY g.bucket_ts
        |      ROWS UNBOUNDED PRECEDING),
        |    wf AS (PARTITION BY g.user_id ORDER BY g.bucket_ts
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, bucket_ts, n_events,
        |  CAST(floor((CASE WHEN v_avg IS NOT NULL THEN v_avg
        |    ELSE pv + (nv - pv) * CAST(bucket_ts - pt AS DOUBLE)
        |      / CAST(nt - pt AS DOUBLE) END) * 1e4 + CAST(0.5 AS DOUBLE))
        |    AS BIGINT) AS v_interp_e4
        |FROM brk
        |ORDER BY user_id, bucket_ts""".stripMargin,

    // EWMA: the per-entity fold replayed as list_reduce over the
    // per-user value list sliced to each row's rank — same operand
    // shape (0.2*x + 0.8*acc) and same (es, event_id) total order, so
    // the double chain matches bit-for-bit before integerization.
    "q_st8_ewma" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    (epoch_ns(ts) // 1000000000) AS es, value
        |  FROM events),
        |ord AS (
        |  SELECT user_id, es, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS rn
        |  FROM ev),
        |ls AS (
        |  SELECT user_id, list(value ORDER BY es, event_id) AS vs
        |  FROM ev GROUP BY user_id)
        |SELECT o.user_id, o.es, o.event_id, o.value AS v,
        |  CAST(floor(list_reduce(l.vs[1:o.rn],
        |    (acc, x) -> 0.2*x + 0.8*acc) * 1e4 + CAST(0.5 AS DOUBLE))
        |    AS BIGINT) AS ewma_e4
        |FROM ord o JOIN ls l USING (user_id)
        |ORDER BY o.user_id, o.es, o.event_id""".stripMargin,

    // Rolling median over integer cents: same explicit index math as the
    // operator (sorted frame, middle element / middle-pair), so med_e1
    // (= med·10) is pure integer arithmetic on both engines.
    "q_st9_rolling_median" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS es,
        |    CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS cents
        |  FROM events),
        |win AS (
        |  SELECT user_id, es, event_id, cents,
        |    list_sort(list(cents) OVER (PARTITION BY user_id
        |      ORDER BY es, event_id
        |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) AS vs
        |  FROM ev)
        |SELECT user_id, es, event_id, cents,
        |  CASE WHEN len(vs) % 2 = 1 THEN vs[(len(vs) + 1) // 2] * 10
        |       ELSE (vs[len(vs) // 2] + vs[len(vs) // 2 + 1]) * 5
        |  END AS med_e1
        |FROM win ORDER BY user_id, es, event_id""".stripMargin,

    // EWMA-residual anomaly: prediction replays q_st8's fold over the
    // first rn−1 values; the 3σ test is exact HUGEINT arithmetic over
    // e4 residual moments (Spark side: decimal(38,0)) — output stays
    // BIGINT/BOOLEAN. LEFT JOIN keeps single-event users (null flag).
    "q_st10_ewma_anomaly" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    (epoch_ns(ts) // 1000000000) AS es, value
        |  FROM events),
        |ord AS (
        |  SELECT user_id, es, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS rn
        |  FROM ev),
        |ls AS (
        |  SELECT user_id, list(value ORDER BY es, event_id) AS vs
        |  FROM ev GROUP BY user_id),
        |sm AS (
        |  SELECT o.user_id, o.es, o.event_id, o.value AS v,
        |    CASE WHEN o.rn = 1 THEN NULL
        |      ELSE CAST(floor((o.value - list_reduce(l.vs[1:o.rn - 1],
        |        (acc, x) -> 0.2*x + 0.8*acc)) * 1e4
        |        + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS resid_e
        |  FROM ord o JOIN ls l USING (user_id)),
        |st AS (
        |  SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(resid_e) AS HUGEINT) AS s1,
        |    sum(CAST(resid_e AS HUGEINT) * resid_e) AS s2
        |  FROM sm WHERE resid_e IS NOT NULL GROUP BY user_id)
        |SELECT s.user_id, s.es, s.event_id, s.v, s.resid_e,
        |  CASE WHEN s.resid_e IS NULL THEN FALSE
        |    ELSE st.n * st.n * CAST(s.resid_e AS HUGEINT) * s.resid_e
        |      > 9 * (st.n * st.s2 - st.s1 * st.s1) END AS is_anom
        |FROM sm s LEFT JOIN st USING (user_id)
        |ORDER BY s.user_id, s.es, s.event_id""".stripMargin,

    // Holt replay: per-row fold over (es, event_id)-ordered value slices
    // with a LIST accumulator [l, b] — a struct accumulator would let the
    // trend arm read the just-written level in DuckDB 1.0 and compute a
    // different series; the engine-side fold re-derives l_t inline the
    // same way. Forecast/resid via lag in the same window.
    "q_st13_holt" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    (epoch_ns(ts) // 1000000000) AS es, value
        |  FROM events),
        |ord AS (
        |  SELECT user_id, es, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS rn
        |  FROM ev),
        |ls AS (
        |  SELECT user_id, list(value ORDER BY es, event_id) AS vs
        |  FROM ev GROUP BY user_id),
        |f AS (
        |  SELECT o.user_id, o.es, o.event_id, o.value AS v,
        |    list_reduce(list_transform(l.vs[1:o.rn],
        |        v -> [CAST(v AS DOUBLE), CAST(0 AS DOUBLE)]),
        |      (acc, x) -> [
        |        CAST(0.2 AS DOUBLE)*x[1]
        |          + CAST(0.8 AS DOUBLE)*(acc[1] + acc[2]),
        |        CAST(0.1 AS DOUBLE)*((CAST(0.2 AS DOUBLE)*x[1]
        |            + CAST(0.8 AS DOUBLE)*(acc[1] + acc[2])) - acc[1])
        |          + CAST(0.9 AS DOUBLE)*acc[2]
        |      ]) AS hw
        |  FROM ord o JOIN ls l USING (user_id)),
        |g AS (
        |  SELECT user_id, es, event_id, v,
        |    hw[1] AS level, hw[2] AS trend,
        |    lag(hw[1]) OVER w + lag(hw[2]) OVER w AS forecast
        |  FROM f
        |  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id))
        |SELECT user_id, es, event_id, v,
        |  CAST(floor(level * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS level_e4,
        |  CAST(floor(trend * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS trend_e4,
        |  CAST(floor(forecast * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS forecast_e4,
        |  CAST(floor((v - forecast) * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS resid_e4
        |FROM g
        |ORDER BY user_id, es, event_id""".stripMargin,

    // Holt–Winters replay: [n, l, b, s1, s2, s3, f] LIST accumulator
    // seeded by a prepended zero-state (n=0 selects the init branch ≡
    // the engine's empty-acc case); every arm re-derives l_t inline and
    // every 1−x factor is the spelled-out subtraction — the scala
    // double of 1−0.3 is NOT the 0.7 literal.
    "q_st16_holt_winters" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    (epoch_ns(ts) // 1000000000) AS es, value
        |  FROM events),
        |ord AS (
        |  SELECT user_id, es, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS rn
        |  FROM ev),
        |ls AS (
        |  SELECT user_id, list(value ORDER BY es, event_id) AS vs
        |  FROM ev GROUP BY user_id),
        |f AS (
        |  SELECT o.user_id, o.es, o.event_id, o.value AS v,
        |    list_reduce(list_prepend(
        |        [CAST(0 AS DOUBLE), 0, 0, 0, 0, 0, 0],
        |        list_transform(l.vs[1:o.rn], v -> [CAST(v AS DOUBLE)])),
        |      (acc, x) -> CASE WHEN acc[1] = 0 THEN
        |        [CAST(1 AS DOUBLE), x[1], 0, 0, 0, 0, NULL]
        |      ELSE [
        |        acc[1] + CAST(1 AS DOUBLE),
        |        CAST(0.3 AS DOUBLE)*(x[1] - acc[4])
        |          + (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE))
        |            *(acc[2] + acc[3]),
        |        CAST(0.2 AS DOUBLE)*((CAST(0.3 AS DOUBLE)*(x[1] - acc[4])
        |            + (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE))
        |              *(acc[2] + acc[3]))
        |            - acc[2])
        |          + (CAST(1 AS DOUBLE) - CAST(0.2 AS DOUBLE))*acc[3],
        |        acc[5], acc[6],
        |        CAST(0.3 AS DOUBLE)*(x[1]
        |            - (CAST(0.3 AS DOUBLE)*(x[1] - acc[4])
        |            + (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE))
        |              *(acc[2] + acc[3])))
        |          + (CAST(1 AS DOUBLE) - CAST(0.3 AS DOUBLE))*acc[4],
        |        acc[2] + acc[3] + acc[4]
        |      ] END) AS hw
        |  FROM ord o JOIN ls l USING (user_id))
        |SELECT user_id, es, event_id, v,
        |  CAST(floor(hw[2] * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS level_e4,
        |  CAST(floor(hw[3] * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS trend_e4,
        |  CAST(floor(hw[6] * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS seasonal_e4,
        |  CAST(floor(hw[7] * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS forecast_e4,
        |  CAST(floor((v - hw[7]) * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS resid_e4
        |FROM f
        |ORDER BY user_id, es, event_id""".stripMargin,

    // ACF rebuild: all lag pairs from ONE window partitioning, moment
    // sums HUGEINT-exact over the milli-integerized values, then the
    // g16 Pearson double formula; the null guard is on the variance
    // PRODUCT (zero or sub-ulp negative → null) on both sides.
    "q_st14_acf" ->
      s"""WITH $acfMomentCtes
        |SELECT user_id, CAST(lag AS BIGINT) AS lag,
        |  CAST(np AS BIGINT) AS n_pairs,
        |  CASE WHEN np < 2
        |      OR (n*sxx - sx*sx) * (n*syy - sy*sy) <= CAST(0 AS DOUBLE)
        |    THEN NULL
        |    ELSE CAST(floor((n*sxy - sx*sy)
        |      / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) * 1e4
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS acf_e4
        |FROM m
        |ORDER BY user_id, lag""".stripMargin,

    // Theil–Sen rebuild: same day-offset xy CTE as ST22, pair slopes by
    // entity-local self-join (x strictly increasing), exact-interpolated
    // medians (quantile_cont ≡ Spark percentile on identical doubles —
    // the q_o1 parity), intercept = median(y − slope·x).
    "q_st25_theil_sen" ->
      """WITH src AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) AS es,
        |    CAST(floor(value * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS v
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |xy AS (
        |  SELECT user_id,
        |    (es - min(es) OVER (PARTITION BY user_id)) // 86400 AS x,
        |    v AS y
        |  FROM src),
        |sz AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_points
        |       FROM xy GROUP BY 1),
        |k AS (SELECT xy.user_id, xy.x, xy.y, sz.n_points
        |      FROM xy JOIN sz USING (user_id)
        |      WHERE sz.n_points <= 2000),
        |p AS (
        |  SELECT a.user_id, a.n_points,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
        |  FROM k a JOIN k b ON a.user_id = b.user_id AND a.x < b.x),
        |med AS (
        |  SELECT user_id, max(n_points) AS n_points,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    quantile_cont(s, 0.5) AS slope
        |  FROM p GROUP BY 1),
        |ic AS (
        |  SELECT k.user_id,
        |    quantile_cont(k.y - med.slope * k.x, 0.5) AS intercept
        |  FROM k JOIN med USING (user_id) GROUP BY k.user_id)
        |SELECT med.user_id, med.n_points, med.n_pairs,
        |  CAST(floor(med.slope * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS slope_e4,
        |  CAST(floor(ic.intercept * 1e2 + CAST(0.5 AS DOUBLE))
        |    AS BIGINT) AS icept_e2
        |FROM med JOIN ic USING (user_id)
        |ORDER BY med.user_id""".stripMargin,

    // RFM rebuild: per-customer aggregate, global-max reference instant,
    // quantile_cont cutoffs (≡ Spark percentile interpolation, the
    // winsorize-proven parity), band = 1 + #cutoffs strictly below;
    // every sum BIGINT-cast (HUGEINT discipline).
    "q_st23_rfm" ->
      """WITH src AS (
        |  SELECT o_custkey,
        |    (epoch_ns(o_orderdate) // 1000000000) AS es,
        |    CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT) AS cents
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        |    AND o_totalprice IS NOT NULL),
        |per AS (
        |  SELECT o_custkey, max(es) AS last_es,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(cents) AS BIGINT) AS monetary
        |  FROM src GROUP BY 1),
        |base AS (
        |  SELECT o_custkey,
        |    (SELECT max(last_es) FROM per) - last_es AS recency_sec,
        |    frequency, monetary
        |  FROM per),
        |cuts AS (
        |  SELECT
        |    quantile_cont(recency_sec, 0.2) AS rc0,
        |    quantile_cont(recency_sec, 0.4) AS rc1,
        |    quantile_cont(recency_sec, 0.6) AS rc2,
        |    quantile_cont(recency_sec, 0.8) AS rc3,
        |    quantile_cont(frequency, 0.2) AS fc0,
        |    quantile_cont(frequency, 0.4) AS fc1,
        |    quantile_cont(frequency, 0.6) AS fc2,
        |    quantile_cont(frequency, 0.8) AS fc3,
        |    quantile_cont(monetary, 0.2) AS mc0,
        |    quantile_cont(monetary, 0.4) AS mc1,
        |    quantile_cont(monetary, 0.6) AS mc2,
        |    quantile_cont(monetary, 0.8) AS mc3
        |  FROM base),
        |scored AS (
        |  SELECT b.o_custkey, b.recency_sec, b.frequency, b.monetary,
        |    6 - (1
        |      + CASE WHEN CAST(b.recency_sec AS DOUBLE) > c.rc0
        |          THEN 1 ELSE 0 END
        |      + CASE WHEN CAST(b.recency_sec AS DOUBLE) > c.rc1
        |          THEN 1 ELSE 0 END
        |      + CASE WHEN CAST(b.recency_sec AS DOUBLE) > c.rc2
        |          THEN 1 ELSE 0 END
        |      + CASE WHEN CAST(b.recency_sec AS DOUBLE) > c.rc3
        |          THEN 1 ELSE 0 END) AS r_score,
        |    1
        |      + CASE WHEN CAST(b.frequency AS DOUBLE) > c.fc0
        |          THEN 1 ELSE 0 END
        |      + CASE WHEN CAST(b.frequency AS DOUBLE) > c.fc1
        |          THEN 1 ELSE 0 END
        |      + CASE WHEN CAST(b.frequency AS DOUBLE) > c.fc2
        |          THEN 1 ELSE 0 END
        |      + CASE WHEN CAST(b.frequency AS DOUBLE) > c.fc3
        |          THEN 1 ELSE 0 END AS f_score,
        |    1
        |      + CASE WHEN CAST(b.monetary AS DOUBLE) > c.mc0
        |          THEN 1 ELSE 0 END
        |      + CASE WHEN CAST(b.monetary AS DOUBLE) > c.mc1
        |          THEN 1 ELSE 0 END
        |      + CASE WHEN CAST(b.monetary AS DOUBLE) > c.mc2
        |          THEN 1 ELSE 0 END
        |      + CASE WHEN CAST(b.monetary AS DOUBLE) > c.mc3
        |          THEN 1 ELSE 0 END AS m_score
        |  FROM base b CROSS JOIN cuts c)
        |SELECT o_custkey, recency_sec, frequency, monetary,
        |  CAST(r_score AS BIGINT) AS r_score,
        |  CAST(f_score AS BIGINT) AS f_score,
        |  CAST(m_score AS BIGINT) AS m_score,
        |  CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
        |    AS rfm_code
        |FROM scored ORDER BY o_custkey""".stripMargin,

    // OLS trend rebuild: day offsets from each entity's first
    // observation via exact integer floor division, HUGEINT moments cast
    // to double, the same closed-form slope/intercept/r² shapes with
    // variance guards (never post-hoc NaN checks).
    "q_st22_linear_trend" ->
      """WITH src AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) AS es,
        |    CAST(floor(value * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS v
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |xy AS (
        |  SELECT user_id,
        |    (es - min(es) OVER (PARTITION BY user_id)) // 86400 AS x,
        |    v AS y
        |  FROM src),
        |m AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS nn,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
        |  FROM xy GROUP BY user_id)
        |SELECT user_id, nn AS n,
        |  CASE WHEN nn < 2 OR n*sxx - sx*sx <= CAST(0 AS DOUBLE)
        |    THEN NULL
        |    ELSE CAST(floor((n*sxy - sx*sy) / (n*sxx - sx*sx) * 1e4
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS slope_e4,
        |  CASE WHEN nn < 2 OR n*sxx - sx*sx <= CAST(0 AS DOUBLE)
        |    THEN NULL
        |    ELSE CAST(floor(
        |      (sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n * 1e2
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS icept_e2,
        |  CASE WHEN nn < 2 OR n*sxx - sx*sx <= CAST(0 AS DOUBLE)
        |      OR n*syy - sy*sy <= CAST(0 AS DOUBLE)
        |    THEN NULL
        |    ELSE CAST(floor(
        |      (n*sxy - sx*sy) * (n*sxy - sx*sy)
        |        / ((n*sxx - sx*sx) * (n*syy - sy*sy)) * 1e6
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS r2_e6
        |FROM m ORDER BY user_id""".stripMargin,

    // CCF rebuild: bucket sums BIGINT-cast, dense range() grid 0-filled,
    // one window carrying all five shift columns, then the shared
    // moment/Pearson shapes (HUGEINT-exact, product guard).
    "q_st19_ccf" ->
      """WITH ev AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) AS es, event_type,
        |    CAST(floor(value * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS v
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |bk AS (
        |  SELECT user_id, es // 86400 AS bucket,
        |    CAST(sum(CASE WHEN event_type = 'view' THEN v ELSE 0 END)
        |      AS BIGINT) AS xa,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN v ELSE 0 END)
        |      AS BIGINT) AS xb
        |  FROM ev GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |       FROM bk GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket
        |      FROM sp),
        |f AS (
        |  SELECT g.user_id, g.bucket,
        |    coalesce(xa, 0) AS xa, coalesce(xb, 0) AS xb
        |  FROM g LEFT JOIN bk USING (user_id, bucket)),
        |l AS (
        |  SELECT user_id, xa,
        |    lag(xb, 2) OVER w AS ym2, lag(xb, 1) OVER w AS ym1,
        |    xb AS y0,
        |    lead(xb, 1) OVER w AS yp1, lead(xb, 2) OVER w AS yp2
        |  FROM f
        |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
        |p AS (
        |  SELECT user_id, -2 AS lag, xa AS x, ym2 AS y FROM l
        |  WHERE ym2 IS NOT NULL
        |  UNION ALL SELECT user_id, -1, xa, ym1 FROM l
        |  WHERE ym1 IS NOT NULL
        |  UNION ALL SELECT user_id, 0, xa, y0 FROM l
        |  UNION ALL SELECT user_id, 1, xa, yp1 FROM l
        |  WHERE yp1 IS NOT NULL
        |  UNION ALL SELECT user_id, 2, xa, yp2 FROM l
        |  WHERE yp2 IS NOT NULL),
        |m AS (
        |  SELECT user_id, lag, count(*) AS np,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
        |  FROM p GROUP BY user_id, lag)
        |SELECT user_id, CAST(lag AS BIGINT) AS lag,
        |  CAST(np AS BIGINT) AS n_pairs,
        |  CASE WHEN np < 2
        |      OR (n*sxx - sx*sx) * (n*syy - sy*sy) <= CAST(0 AS DOUBLE)
        |    THEN NULL
        |    ELSE CAST(floor((n*sxy - sx*sy)
        |      / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) * 1e4
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS ccf_e4
        |FROM m
        |ORDER BY user_id, lag""".stripMargin,

    // Dominant period: the same moment CTEs, acf as a raw double, then
    // the argmax on the e6-integerized score with smallest-lag
    // tie-break — the engine's exact total order.
    "q_st18_dominant_period" ->
      s"""WITH $acfMomentCtes,
        |a AS (
        |  SELECT user_id, lag, np,
        |    (n*sxy - sx*sy)
        |      / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)) AS acf
        |  FROM m
        |  WHERE np >= 2
        |    AND (n*sxx - sx*sx) * (n*syy - sy*sy) > CAST(0 AS DOUBLE)),
        |r AS (
        |  SELECT user_id, lag, np, acf,
        |    row_number() OVER (PARTITION BY user_id ORDER BY
        |      CAST(floor(acf * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |        DESC, lag) AS rn
        |  FROM a WHERE lag >= 2)
        |SELECT user_id, CAST(lag AS BIGINT) AS period,
        |  CAST(np AS BIGINT) AS n_pairs,
        |  CAST(floor(acf * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS acf_e4
        |FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    // Funnel replay: per-user fold over the (es, event_id)-ordered
    // funnel-typed events with a LIST accumulator of 3 stage epochs
    // (-1 = unset), seeded by list_prepend (≡ the engine's init array);
    // each CASE reads the PREVIOUS accumulator — the list-literal
    // rebuild has no sibling-mutation hazard (the Holt lesson).
    "q_st15_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) AS es, event_id,
        |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |      ELSE 3 END AS k
        |  FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |ls AS (
        |  SELECT user_id,
        |    list_reduce(list_prepend(
        |      [CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)],
        |      list([es, event_id, CAST(k AS BIGINT)]
        |        ORDER BY es, event_id)),
        |      (acc, x) -> [
        |        CASE WHEN acc[1] != -1 THEN acc[1]
        |             WHEN x[3] = 1 THEN x[1] ELSE -1 END,
        |        CASE WHEN acc[2] != -1 THEN acc[2]
        |             WHEN x[3] = 2 AND acc[1] != -1
        |               AND x[1] - acc[1] <= 2592000 THEN x[1]
        |             ELSE -1 END,
        |        CASE WHEN acc[3] != -1 THEN acc[3]
        |             WHEN x[3] = 3 AND acc[2] != -1
        |               AND x[1] - acc[1] <= 2592000 THEN x[1]
        |             ELSE -1 END]) AS f
        |  FROM ev GROUP BY user_id)
        |SELECT user_id,
        |  CAST(CASE WHEN f[3] != -1 THEN 3 WHEN f[2] != -1 THEN 2
        |    ELSE 1 END AS BIGINT) AS max_stage,
        |  f[1] AS t_first,
        |  CASE WHEN f[3] != -1 THEN f[3] WHEN f[2] != -1 THEN f[2]
        |    ELSE f[1] END AS t_last,
        |  CASE WHEN f[3] != -1 THEN f[3] WHEN f[2] != -1 THEN f[2]
        |    ELSE f[1] END - f[1] AS dur_sec
        |FROM ls
        |WHERE f[1] != -1
        |ORDER BY user_id""".stripMargin,

    // Cohort rebuild: distinct (user, week) pairs, per-user min week,
    // exact cell counts; the age-0 cell is the denominator, one double
    // division, e6.
    "q_st20_cohort" ->
      """WITH b AS (
        |  SELECT DISTINCT user_id AS ent,
        |    ((epoch_ns(ts) // 1000000000) // 86400) AS bk
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT ent, min(bk) AS ck FROM b GROUP BY 1),
        |a AS (
        |  SELECT c.ck AS cohort, b.bk - c.ck AS age,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM b JOIN c USING (ent) GROUP BY 1, 2),
        |s AS (SELECT cohort, n_active AS n0 FROM a WHERE age = 0)
        |SELECT a.cohort, a.age, a.n_active,
        |  CAST(floor(CAST(a.n_active AS DOUBLE) / CAST(s.n0 AS DOUBLE)
        |    * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS ret_e6
        |FROM a JOIN s USING (cohort)
        |ORDER BY cohort, age""".stripMargin,

    // Sessionize rebuild: same (ts, id) total order, lag boundary flag
    // (strictly-greater gap), running sum session number, per-session
    // integer aggregates — exact arithmetic end to end.
    "q_st21_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    (epoch_ns(ts) // 1000000000) AS es
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |f AS (
        |  SELECT user_id, event_id, es,
        |    CASE WHEN lag(es) OVER w IS NULL
        |      OR es - lag(es) OVER w > 3600 THEN 1 ELSE 0 END AS nf
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |s AS (
        |  SELECT user_id, es,
        |    sum(nf) OVER (PARTITION BY user_id ORDER BY es, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_seq
        |  FROM f)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(es) AS BIGINT) AS t_start,
        |  CAST(max(es) AS BIGINT) AS t_end,
        |  CAST(max(es) - min(es) AS BIGINT) AS dur_sec
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    // Interval islands: the same running-max-of-previous-ends boundary
    // rule (ROWS … AND 1 PRECEDING), same strict > gap compare, same
    // (start, end) total order — exact integers end to end.
    "q_st30_interval_merge" ->
      """WITH iv AS (
        |  SELECT o_custkey % 50 AS k,
        |    o_orderkey % 997 AS s,
        |    (o_orderkey % 997) + (o_orderkey % 997) % 13 AS e
        |  FROM orders),
        |m AS (
        |  SELECT k, s, e,
        |    max(e) OVER (PARTITION BY k ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS pmax
        |  FROM iv),
        |f AS (
        |  SELECT k, s, e,
        |    CASE WHEN pmax IS NULL OR s - pmax > 2 THEN 1 ELSE 0 END
        |      AS nf
        |  FROM m),
        |isl AS (
        |  SELECT k, s, e,
        |    sum(nf) OVER (PARTITION BY k ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island_seq
        |  FROM f)
        |SELECT k, CAST(island_seq AS BIGINT) AS island_seq,
        |  CAST(min(s) AS BIGINT) AS island_start,
        |  CAST(max(e) AS BIGINT) AS island_end,
        |  CAST(count(*) AS BIGINT) AS n_merged
        |FROM isl GROUP BY k, island_seq
        |ORDER BY k, island_seq""".stripMargin,

    // The incremental absorb must equal the FULL merge — so the oracle
    // is q_st30's verbatim; any lost count or mis-bridged gap from the
    // stored-islands composition hash-mismatches here.
    "q_st30b_interval_absorb" ->
      """WITH iv AS (
        |  SELECT o_custkey % 50 AS k,
        |    o_orderkey % 997 AS s,
        |    (o_orderkey % 997) + (o_orderkey % 997) % 13 AS e
        |  FROM orders),
        |m AS (
        |  SELECT k, s, e,
        |    max(e) OVER (PARTITION BY k ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS pmax
        |  FROM iv),
        |f AS (
        |  SELECT k, s, e,
        |    CASE WHEN pmax IS NULL OR s - pmax > 2 THEN 1 ELSE 0 END
        |      AS nf
        |  FROM m),
        |isl AS (
        |  SELECT k, s, e,
        |    sum(nf) OVER (PARTITION BY k ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island_seq
        |  FROM f)
        |SELECT k, CAST(island_seq AS BIGINT) AS island_seq,
        |  CAST(min(s) AS BIGINT) AS island_start,
        |  CAST(max(e) AS BIGINT) AS island_end,
        |  CAST(count(*) AS BIGINT) AS n_merged
        |FROM isl GROUP BY k, island_seq
        |ORDER BY k, island_seq""".stripMargin,

    // The decremental result must equal the FULL merge over the
    // post-delete set — q_st30's SQL with the deleted rows excluded at
    // the source: an unsplit island, stale count, or lost key
    // hash-mismatches.
    "q_st30c_interval_delete" ->
      """WITH iv AS (
        |  SELECT o_custkey % 50 AS k,
        |    o_orderkey % 997 AS s,
        |    (o_orderkey % 997) + (o_orderkey % 997) % 13 AS e
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |m AS (
        |  SELECT k, s, e,
        |    max(e) OVER (PARTITION BY k ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS pmax
        |  FROM iv),
        |f AS (
        |  SELECT k, s, e,
        |    CASE WHEN pmax IS NULL OR s - pmax > 2 THEN 1 ELSE 0 END
        |      AS nf
        |  FROM m),
        |isl AS (
        |  SELECT k, s, e,
        |    sum(nf) OVER (PARTITION BY k ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island_seq
        |  FROM f)
        |SELECT k, CAST(island_seq AS BIGINT) AS island_seq,
        |  CAST(min(s) AS BIGINT) AS island_start,
        |  CAST(max(e) AS BIGINT) AS island_end,
        |  CAST(count(*) AS BIGINT) AS n_merged
        |FROM isl GROUP BY k, island_seq
        |ORDER BY k, island_seq""".stripMargin,

    // Transition-matrix rebuild: same lead window, per-state sum by a
    // second window over the tiny transition table; n exact, p one
    // double division of exact longs.
    "q_st29_transitions" ->
      """WITH src AS (
        |  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS es,
        |    event_type
        |  FROM events WHERE event_type IS NOT NULL),
        |s AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS to_type
        |  FROM src),
        |c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE to_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(floor(CAST(n AS DOUBLE)
        |    / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
        |    * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS p_e6
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    // Frequent-sequence rebuild: the same leads window, '>'-joined
    // n-grams, identical deterministic ranking.
    "q_st28_frequent_seqs" ->
      """WITH src AS (
        |  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS es,
        |    event_type
        |  FROM events WHERE event_type IS NOT NULL),
        |s AS (
        |  SELECT user_id, event_type AS t0,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2
        |  FROM src
        |  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |c AS (
        |  SELECT concat(t0, '>', t1, '>', t2) AS sequence,
        |    CAST(count(*) AS BIGINT) AS n_occ
        |  FROM s WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |  GROUP BY 1)
        |SELECT sequence, n_occ,
        |  CAST(row_number() OVER (ORDER BY n_occ DESC, sequence)
        |    AS BIGINT) AS rank
        |FROM c
        |ORDER BY n_occ DESC, sequence
        |LIMIT 20""".stripMargin,

    // Attribution rebuild: the struct min/max becomes a packed
    // HUGEINT es·10¹²+event_id sortable key (HUGEINT because
    // es·10¹² exceeds BIGINT; 10¹² leaves event_id headroom to a
    // trillion events — the silent-id-assumption class that bit
    // q_x2l's +1000 is structurally off the table), decoded by
    // integer div/mod and cast back to BIGINT; touch types rejoined
    // by unique event_id; the same RANGE frame. ts IS NOT NULL
    // mirrors the operator's null-ts drop.
    "q_st24_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS es,
        |    event_type
        |  FROM events
        |  WHERE ts IS NOT NULL
        |    AND event_type IN ('purchase', 'view', 'click')),
        |wnd AS (
        |  SELECT user_id, event_id, es, event_type,
        |    min(CASE WHEN event_type IN ('view', 'click')
        |      THEN CAST(es AS HUGEINT) * 1000000000000 + event_id
        |      END) OVER w AS fk,
        |    max(CASE WHEN event_type IN ('view', 'click')
        |      THEN CAST(es AS HUGEINT) * 1000000000000 + event_id
        |      END) OVER w AS lk,
        |    count(CASE WHEN event_type IN ('view', 'click')
        |      THEN 1 END) OVER w AS n_touches
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY es
        |    RANGE BETWEEN 1209600 PRECEDING AND CURRENT ROW)),
        |conv AS (
        |  SELECT user_id, event_id AS conv_id, es AS conv_ts,
        |    CAST(n_touches AS BIGINT) AS n_touches,
        |    CAST(fk % 1000000000000 AS BIGINT) AS first_id,
        |    CAST(fk // 1000000000000 AS BIGINT) AS first_ts,
        |    CAST(lk % 1000000000000 AS BIGINT) AS last_id,
        |    CAST(lk // 1000000000000 AS BIGINT) AS last_ts
        |  FROM wnd WHERE event_type = 'purchase')
        |SELECT c.user_id, c.conv_id, c.conv_ts, c.n_touches,
        |  c.first_id, c.first_ts, f.event_type AS first_type,
        |  c.last_id, c.last_ts, l.event_type AS last_type
        |FROM conv c
        |LEFT JOIN events f ON c.first_id = f.event_id
        |LEFT JOIN events l ON c.last_id = l.event_id
        |ORDER BY c.user_id, c.conv_id""".stripMargin,

    // ST11 rebuild: same windows in the same (user, es, event_id) order;
    // trend = HUGEINT frame sum / 7.0 (exact-to-double below 2^53),
    // detrended e4-integerized before the phase mean so both engines
    // divide identical exact longs; resid operand order mirrored.
    "q_st11_seasonal" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS es,
        |    CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS cents
        |  FROM events),
        |b AS (
        |  SELECT user_id, es, event_id, cents,
        |    CAST((row_number() OVER wo - 1) % 7 AS BIGINT) AS phase,
        |    CASE WHEN count(*) OVER wf = 7
        |      THEN sum(cents) OVER wf / CAST(7 AS DOUBLE) END AS trend
        |  FROM ev
        |  WINDOW wo AS (PARTITION BY user_id ORDER BY es, event_id),
        |    wf AS (PARTITION BY user_id ORDER BY es, event_id
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d AS (
        |  SELECT *, CAST(floor((cents - trend) * 1e4
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS d_e4 FROM b),
        |se AS (
        |  SELECT user_id, phase,
        |    CASE WHEN count(d_e4) > 0
        |      THEN CAST(sum(d_e4) AS BIGINT) / count(d_e4) / 1e4
        |    END AS seasonal
        |  FROM d GROUP BY user_id, phase)
        |SELECT d.user_id, d.es, d.event_id, d.cents, d.phase,
        |  CAST(floor(d.trend * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS trend_e4,
        |  CAST(floor(se.seasonal * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS seasonal_e4,
        |  CAST(floor((d.cents - d.trend - se.seasonal) * 1e4
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS resid_e4
        |FROM d JOIN se USING (user_id, phase)
        |ORDER BY user_id, es, event_id""".stripMargin,

    // Inter-arrival rebuild: lag gaps in the same (es, event_id) order,
    // HUGEINT moments, mirrored mean/sd/cv/B shapes with the guards
    // emitting the exact sentinel integers (0 / 0 / −1e6).
    "q_st27_interarrival" ->
      """WITH src AS (
        |  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS es
        |  FROM events WHERE ts IS NOT NULL),
        |g AS (
        |  SELECT user_id, es - lag(es) OVER (PARTITION BY user_id
        |    ORDER BY es, event_id) AS gp
        |  FROM src),
        |gg AS (SELECT user_id, gp FROM g WHERE gp IS NOT NULL),
        |m AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(gp AS HUGEINT)) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(gp AS HUGEINT) * gp) AS DOUBLE) AS s2
        |  FROM gg GROUP BY user_id)
        |SELECT user_id, n_gaps,
        |  CAST(floor(s1/n * 1e2 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS mean_e2,
        |  CASE WHEN n_gaps < 2 OR n*s2 - s1*s1 <= CAST(0 AS DOUBLE)
        |    THEN CAST(0 AS BIGINT)
        |    ELSE CAST(floor(sqrt((n*s2 - s1*s1)
        |      / (n*(n - CAST(1 AS DOUBLE)))) * 1e2
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS sd_e2,
        |  CASE WHEN n_gaps < 2 OR n*s2 - s1*s1 <= CAST(0 AS DOUBLE)
        |      OR s1/n = CAST(0 AS DOUBLE)
        |    THEN CAST(0 AS BIGINT)
        |    ELSE CAST(floor(sqrt((n*s2 - s1*s1)
        |      / (n*(n - CAST(1 AS DOUBLE)))) / (s1/n) * 1e6
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS cv_e6,
        |  CASE WHEN n_gaps < 2 OR n*s2 - s1*s1 <= CAST(0 AS DOUBLE)
        |    THEN CAST(-1000000 AS BIGINT)
        |    ELSE CAST(floor(
        |      (sqrt((n*s2 - s1*s1) / (n*(n - CAST(1 AS DOUBLE)))) - s1/n)
        |      / (sqrt((n*s2 - s1*s1) / (n*(n - CAST(1 AS DOUBLE))))
        |        + s1/n)
        |      * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS b_e6
        |FROM m ORDER BY user_id""".stripMargin,

    // Seasonal-anomaly rebuild: the ST11 CTE chain, residuals
    // e4-integerized, per-entity HUGEINT moments, the rollingZscore
    // sample-sd z shape, flag by the identical double comparison.
    "q_st26_seasonal_anomaly" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS es,
        |    CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS cents
        |  FROM events),
        |b AS (
        |  SELECT user_id, es, event_id, cents,
        |    CAST((row_number() OVER wo - 1) % 7 AS BIGINT) AS phase,
        |    CASE WHEN count(*) OVER wf = 7
        |      THEN sum(cents) OVER wf / CAST(7 AS DOUBLE) END AS trend
        |  FROM ev
        |  WINDOW wo AS (PARTITION BY user_id ORDER BY es, event_id),
        |    wf AS (PARTITION BY user_id ORDER BY es, event_id
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |d AS (
        |  SELECT *, CAST(floor((cents - trend) * 1e4
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS d_e4 FROM b),
        |se AS (
        |  SELECT user_id, phase,
        |    CASE WHEN count(d_e4) > 0
        |      THEN CAST(sum(d_e4) AS BIGINT) / count(d_e4) / 1e4
        |    END AS seasonal
        |  FROM d GROUP BY user_id, phase),
        |rz AS (
        |  SELECT d.user_id, d.es, d.event_id, d.cents,
        |    CAST(floor((d.cents - d.trend - se.seasonal) * 1e4
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) AS r4
        |  FROM d JOIN se USING (user_id, phase)
        |  WHERE d.trend IS NOT NULL AND se.seasonal IS NOT NULL),
        |m AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS nn,
        |    CAST(count(*) AS DOUBLE) AS nd,
        |    CAST(sum(CAST(r4 AS HUGEINT)) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(r4 AS HUGEINT) * r4) AS DOUBLE) AS s2
        |  FROM rz GROUP BY user_id)
        |SELECT rz.user_id, rz.es, rz.event_id, rz.cents AS v, rz.r4
        |    AS resid_e4,
        |  CASE WHEN nn < 2 OR nd*s2 - s1*s1 <= CAST(0 AS DOUBLE)
        |    THEN NULL
        |    ELSE CAST(floor((rz.r4 - s1/nd)
        |      / sqrt((nd*s2 - s1*s1) / (nd*(nd - CAST(1 AS DOUBLE))))
        |      * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS z_e4,
        |  coalesce(
        |    CASE WHEN nn < 2 OR nd*s2 - s1*s1 <= CAST(0 AS DOUBLE)
        |      THEN NULL
        |      ELSE abs((rz.r4 - s1/nd)
        |        / sqrt((nd*s2 - s1*s1)
        |          / (nd*(nd - CAST(1 AS DOUBLE)))))
        |        > CAST(3.0 AS DOUBLE) END,
        |    false) AS is_anomaly
        |FROM rz JOIN m USING (user_id)
        |ORDER BY rz.user_id, rz.es, rz.event_id""".stripMargin,

    // CUSUM replay: per-row fold over the (es, event_id)-ordered e-value
    // slice, seeded by a prepended 0 (≡ the engine's empty-accumulator
    // fold); all arithmetic HUGEINT-exact, alarm test n-scaled.
    "q_st12_cusum" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, (epoch_ns(ts) // 1000000000) AS es,
        |    CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS cents
        |  FROM events),
        |st AS (
        |  SELECT user_id, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(cents) AS HUGEINT) AS s1
        |  FROM ev GROUP BY user_id),
        |ord AS (
        |  SELECT user_id, es, event_id, cents,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS rn
        |  FROM ev),
        |ls AS (
        |  SELECT user_id,
        |    list(CAST(cents AS HUGEINT) ORDER BY es, event_id) AS cs
        |  FROM ev GROUP BY user_id),
        |r AS (
        |  SELECT o.user_id, o.es, o.event_id, o.cents, s.n,
        |    list_reduce([CAST(0 AS HUGEINT)] ||
        |        list_transform(l.cs[1:o.rn], x -> x * s.n - s.s1),
        |      (acc, x) -> greatest(CAST(0 AS HUGEINT),
        |        acc + x - 2000 * s.n)) AS sp,
        |    list_reduce([CAST(0 AS HUGEINT)] ||
        |        list_transform(l.cs[1:o.rn], x -> x * s.n - s.s1),
        |      (acc, x) -> greatest(CAST(0 AS HUGEINT),
        |        acc - x - 2000 * s.n)) AS sn
        |  FROM ord o JOIN ls l USING (user_id) JOIN st s USING (user_id))
        |SELECT user_id, es, event_id, cents,
        |  CAST(sp AS BIGINT) AS sp_cn, CAST(sn AS BIGINT) AS sn_cn,
        |  (sp > 20000 * n OR sn > 20000 * n) AS is_change
        |FROM r
        |ORDER BY user_id, es, event_id""".stripMargin,
  )
}
