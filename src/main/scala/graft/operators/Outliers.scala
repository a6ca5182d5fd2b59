package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric outlier detection — the data-cleaning signal that catches
  * corrupt measurements and degenerate documents (a 0-char or 10⁹-char
  * "text", a negative price) before they skew training statistics.
  * Two standard flavors:
  *
  *  - [[zscore]]: |x − μ| / σ, per group — parametric, cheap, fooled by
  *    the outliers themselves at high contamination.
  *  - [[iqr]]: Tukey fences at Q1 − k·IQR / Q3 + k·IQR — robust (the
  *    fences come from quantiles the outliers barely move), the default
  *    for skewed web-scale distributions.
  *
  * Both return the input plus diagnostic columns and an `is_outlier`
  * flag — filter or route on it (composes with
  * [[Validate.annotate]]-style quarantine).
  *
  * Scale: one partial-agg groupBy over the group keys to build the
  * per-group statistics (tiny: one row per group), broadcast-joined back
  * onto the corpus — the data rows never shuffle. `iqr` uses exact
  * interpolated percentiles; at extreme group cardinality swap in
  * `approx_percentile` via the `exact = false` flag — same plan shape,
  * sketch-bounded state.
  */
object Outliers {

  /** Per-group z-score flags. Groups with σ = 0 or a single row flag
    * nothing (no dispersion → no evidence of outliers). */
  def zscore(df: DataFrame, valueCol: String, groupCols: Seq[String],
      threshold: Double = 3.0): DataFrame = {
    require(threshold > 0, "threshold must be > 0")
    val stats = grouped(df, groupCols)
      .agg(avg(col(valueCol)).as("_mu"),
        stddev_samp(col(valueCol)).as("_sigma"))
    val joined = joinStats(df, stats, groupCols)
    joined
      .withColumn("zscore",
        when(col("_sigma").isNull || col("_sigma") === 0.0, lit(null))
          .otherwise((col(valueCol) - col("_mu")) / col("_sigma")))
      .withColumn("is_outlier",
        coalesce(abs(col("zscore")) > threshold, lit(false)))
      .drop("_mu", "_sigma")
  }

  /** Per-group Tukey-fence flags: outlier ⇔ x < Q1 − k·IQR or
    * x > Q3 + k·IQR (k = 1.5 classic, 3.0 "far out"). Null values are
    * never flagged. Exact `percentile` here is an oracle-parity choice
    * (DuckDB `quantile_cont` equivalence); at 100 TB the bounded-state
    * percentile path is [[Quantiles.hdrQuantiles]]. */
  def iqr(df: DataFrame, valueCol: String, groupCols: Seq[String],
      k: Double = 1.5, exact: Boolean = true): DataFrame = {
    require(k > 0, "k must be > 0")
    val quart =
      if (exact)
        grouped(df, groupCols).agg(
          expr(s"percentile($valueCol, 0.25)").as("_q1"),
          expr(s"percentile($valueCol, 0.75)").as("_q3"))
      else
        grouped(df, groupCols).agg(
          percentile_approx(col(valueCol), lit(0.25), lit(10000)).as("_q1"),
          percentile_approx(col(valueCol), lit(0.75), lit(10000)).as("_q3"))
    val joined = joinStats(df, quart, groupCols)
    joined
      .withColumn("lo_fence", col("_q1") - lit(k) * (col("_q3") - col("_q1")))
      .withColumn("hi_fence", col("_q3") + lit(k) * (col("_q3") - col("_q1")))
      .withColumn("is_outlier",
        coalesce(col(valueCol) < col("lo_fence") ||
          col(valueCol) > col("hi_fence"), lit(false)))
      .drop("_q1", "_q3")
  }

  /** Median/MAD robust outliers — the detector that survives what
    * breaks the other two: [[zscore]]'s mean AND sd are dragged by the
    * very outliers being hunted (masking), and [[iqr]]'s quartiles move
    * under 25% contamination; the median and the median absolute
    * deviation have the maximum 50% breakdown point. Flags
    * |0.6745·(v − med)/MAD| > `k` (0.6745 is the normal-consistency
    * constant, so `k` reads in σ-equivalents; Iglewicz–Hoaglin suggest
    * 3.5 for normal-ish data — heavy-tailed uniform mixes want lower).
    *
    * Exactness: both medians are exact interpolated percentiles (Spark
    * `percentile` ≡ DuckDB `quantile_cont` — the q_o1-proven parity);
    * every downstream op is the same double arithmetic on both engines.
    * A zero-MAD group (> 50% of values identical) yields null
    * `robust_z` and flags nothing — the degenerate case is explicit,
    * not a division artifact.
    *
    * Scale notes (100 TB): two percentile aggregates (the second pass
    * is inherent — deviations need the median first), each broadcast
    * back; the corpus never shuffles, mirroring [[iqr]]. Exact
    * `percentile` buffers each group's values — an oracle-parity
    * choice; swap in [[Quantiles.hdrQuantiles]] for the bounded-state
    * sketch when group cardinality is unbounded.
    *
    * @return input + (`med`, `mad`, `robust_z`, `is_outlier`). */
  def mad(df: DataFrame, valueCol: String, groupCols: Seq[String],
      k: Double = 3.5): DataFrame = {
    require(k > 0, "k must be > 0")
    val med = grouped(df, groupCols)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withMed = joinStats(df, med, groupCols)
    val madStats = grouped(
        withMed.withColumn("_adev", abs(col(valueCol) - col("med"))),
        groupCols)
      .agg(expr("percentile(_adev, 0.5)").as("mad"))
    val rz = lit(0.6745) * (col(valueCol) - col("med")) / col("mad")
    joinStats(withMed, madStats, groupCols)
      .withColumn("robust_z",
        when(col("mad") === 0.0, lit(null).cast("double")).otherwise(rz))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > lit(k), lit(false)))
  }

  /** Histogram-based outlier score (HBOS, Goldstein & Dengel 2012) —
    * the MULTIVARIATE flavor the per-column detectors can't express: a
    * row is suspicious when it sits in rare histogram bins across
    * several features at once, even if no single feature is extreme.
    * Per feature, an equal-width `bins`-bin histogram over [min, max];
    * the row's score is the inverse relative likelihood
    *
    *   hbos = Π_f maxcount_f / count_f(bin_f(v))
    *
    * — exp of the classic Σ log(max/count) formulation, hence the SAME
    * ranking and the same flags at `threshold` = exp(log-threshold),
    * but computable EXACTLY: both products are integers, carried in
    * decimal(38,0) (the ≤ 7-feature cap keeps 10^5-sized counts inside
    * 38 digits), with one double division at the end — no `log` in
    * either engine, so oracle parity never hangs on a libm ulp. The
    * modal row scores exactly 1.
    *
    * Conventions: a null feature value contributes a neutral factor 1
    * (scored by its other features, never flagged on missingness); a
    * constant feature (min = max) puts every row in bin 0 — factor 1
    * for all; `v = max` clamps into the top bin.
    *
    * Scale notes (100 TB): one global 1-row min/max aggregate
    * (broadcast back), then ONE melt-shaped (feature, bin) groupBy —
    * a narrow explode to F rows per input row that map-side-combines
    * down to ≤ F·bins rows per partition — builds every feature's bin
    * table in a single corpus scan (the previous per-feature groupBy
    * re-derived the binned frame F times), and per-feature BROADCAST
    * joins of those tiny tables score the rows — the corpus itself
    * never shuffles, mirroring the other detectors. The combined
    * count table (≤ 7·bins rows) is locally checkpointed so the F
    * broadcast sides read it instead of each re-running the melt scan.
    *
    * @return input + (`hbos` double, `is_outlier` = hbos ≥ threshold) */
  def hbos(df: DataFrame, featureCols: Seq[String], bins: Int = 10,
      threshold: Double = 1e4): DataFrame = {
    require(featureCols.nonEmpty && featureCols.size <= 7,
      "hbos needs 1..7 feature columns (decimal-exact product bound)")
    require(bins >= 1, "bins must be >= 1")
    require(threshold > 0, "threshold must be > 0")
    val aggs = featureCols.flatMap(f => Seq(
      min(col(f)).cast("double").as(s"_min_$f"),
      max(col(f)).cast("double").as(s"_max_$f")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    def binOf(f: String): Column = {
      val w = (col(s"_max_$f") - col(s"_min_$f")) / lit(bins)
      when(col(f).isNull, lit(null))
        .when(col(s"_max_$f") === col(s"_min_$f"), lit(0))
        .otherwise(least(
          floor((col(f).cast("double") - col(s"_min_$f")) / w),
          lit(bins - 1)).cast("int"))
    }
    val withBins = featureCols.foldLeft(df.crossJoin(broadcast(stats))) {
      (acc, f) => acc.withColumn(s"_bin_$f", binOf(f))
    }
    val binStructs = featureCols.zipWithIndex.map { case (f, i) =>
      struct(lit(i).as("fi"), col(s"_bin_$f").as("bin")) }
    val allCounts = withBins
      .select(explode(array(binStructs: _*)).as("_fb"))
      .select(col("_fb.fi").as("_fi"), col("_fb.bin").as("_bin"))
      .filter(col("_bin").isNotNull)
      .groupBy("_fi", "_bin").agg(count(lit(1)).as("_cnt"))
      .localCheckpoint()
    val maxPerFeature = allCounts.groupBy("_fi")
      .agg(max(col("_cnt")).as("_maxcnt"))
    val countsWithMax = allCounts.join(maxPerFeature, Seq("_fi"))
    val scored = featureCols.zipWithIndex.foldLeft(withBins) {
      case (acc, (f, i)) =>
        val t = countsWithMax.filter(col("_fi") === i)
          .select(col("_bin").as(s"_bin_$f"), col("_cnt").as(s"_cnt_$f"),
            col("_maxcnt").as(s"_maxcnt_$f"))
        acc.join(broadcast(t), Seq(s"_bin_$f"), "left")
    }
    val num = featureCols.map(f =>
        coalesce(col(s"_maxcnt_$f"), lit(1L)).cast("decimal(38,0)"))
      .reduce(_ * _)
    val den = featureCols.map(f =>
        coalesce(col(s"_cnt_$f"), lit(1L)).cast("decimal(38,0)"))
      .reduce(_ * _)
    scored
      .withColumn("hbos", num.cast("double") / den.cast("double"))
      .withColumn("is_outlier", col("hbos") >= lit(threshold))
      .drop(featureCols.flatMap(f => Seq(s"_min_$f", s"_max_$f",
        s"_bin_$f", s"_cnt_$f", s"_maxcnt_$f")): _*)
  }

  private def grouped(df: DataFrame, groupCols: Seq[String]) =
    if (groupCols.isEmpty) df.groupBy() else df.groupBy(groupCols.map(col): _*)

  private def joinStats(df: DataFrame, stats: DataFrame,
      groupCols: Seq[String]): DataFrame =
    if (groupCols.isEmpty) df.crossJoin(broadcast(stats))
    else df.join(broadcast(stats), groupCols)
}
