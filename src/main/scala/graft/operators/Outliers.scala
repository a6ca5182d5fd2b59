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

  private def grouped(df: DataFrame, groupCols: Seq[String]) =
    if (groupCols.isEmpty) df.groupBy() else df.groupBy(groupCols.map(col): _*)

  private def joinStats(df: DataFrame, stats: DataFrame,
      groupCols: Seq[String]): DataFrame =
    if (groupCols.isEmpty) df.crossJoin(broadcast(stats))
    else df.join(broadcast(stats), groupCols)
}
