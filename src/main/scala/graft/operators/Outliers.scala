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
    * never flagged. */
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

  private def grouped(df: DataFrame, groupCols: Seq[String]) =
    if (groupCols.isEmpty) df.groupBy() else df.groupBy(groupCols.map(col): _*)

  private def joinStats(df: DataFrame, stats: DataFrame,
      groupCols: Seq[String]): DataFrame =
    if (groupCols.isEmpty) df.crossJoin(broadcast(stats))
    else df.join(broadcast(stats), groupCols)
}
