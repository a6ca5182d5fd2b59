package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketches over non-negative integer columns — the
  * "p50/p95/p99 of token counts per source over 100 TB" primitive where
  * an exact sort-based percentile would shuffle the corpus.
  *
  * The sketch is an HDR-style base-2 log histogram: value `v > 0` lands
  * in octave `e = ⌊log₂ v⌋` and linear sub-bucket
  * `sub = ⌊(v − 2^e)·k / 2^e⌋`, so each bucket spans a `1/k` slice of
  * its octave and any quantile read from bucket LOWER BOUNDS
  * (`2^e + ⌈sub·2^e/k⌉`) is at most one bucket under the true value — a
  * guaranteed ~`1/k` relative error. Unlike t-digest/GK (whose state
  * depends on merge order) or a DDSketch (whose `ln`-ratio bucket
  * boundary can flip by one ulp across engines), every step here is
  * EXACT integer arithmetic — the octave comes from the binary string
  * length (`length(bin(v)) − 1`, a codegen'd builtin in both Spark and
  * DuckDB), so the sketch is partition-order independent, bit-identical
  * cross-engine, and mergeable by construction (it is a counts table:
  * merging two sketches is summing them).
  *
  * Scale notes (100 TB): the histogram is ONE map-side-combinable
  * groupBy — shuffle rows are (group, bucket, count) with at most
  * `64·k` buckets per group regardless of data volume; the quantile
  * read runs windows over that bounded bucket table only. Nulls,
  * negatives, and zeros are excluded from the value histogram but
  * COUNTED (`n_null`, `n_negative`, `n_zero` ride on every output row)
  * — dropped-loudly, never silently.
  */
object Quantiles {

  /** The bucket table: one row per (group, octave `e`, sub-bucket
    * `sub`) with exact count `n` and the bucket's inclusive integer
    * lower bound `lo`. `union`ing bucket tables from different data
    * slices and re-summing `n` IS the sketch merge. */
  def hdrHistogram(df: DataFrame, valueCol: String, k: Int = 16,
      groupCol: Option[String] = None): DataFrame = {
    require(k >= 1, "k (sub-buckets per octave) must be >= 1")
    val v = col(valueCol).cast("long")
    val gcols = groupCol.toSeq.map(col)
    val e = (length(bin(v)) - 1).cast("int")
    // All bucket arithmetic in integer `div` — a double division's
    // 2^52 mantissa would silently mis-bucket values past ~4·10^15.
    df.filter(v.isNotNull && v > 0)
      .select(gcols :+ v.as("_v") :+ e.as("_e"): _*)
      .withColumn("_sub", expr(
        s"cast(((_v - shiftleft(1L, _e)) * $k) div shiftleft(1L, _e)" +
          " as int)"))
      .groupBy(gcols :+ col("_e").as("e") :+ col("_sub").as("sub"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", expr(
        s"shiftleft(1L, e) + (sub * shiftleft(1L, e) + ${k - 1}) div $k"))
  }

  /** Quantile estimates from the sketch: for each requested `q`, the
    * lower bound of the first bucket whose cumulative count reaches
    * `⌈q·n⌉` — within one bucket (≤ ~1/k relative error) of the true
    * q-quantile, from exact integer ranks (no interpolation, no
    * floating accumulation). Output: one row per (group ×) q with the
    * estimate and the excluded-row audit counts. */
  def hdrQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      k: Int = 16, groupCol: Option[String] = None): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    val gcols = groupCol.toSeq.map(col)
    val gnames = groupCol.toSeq
    val v = col(valueCol).cast("long")
    val audit = df
      .groupBy(gcols: _*)
      .agg(sum(when(v.isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(v < 0, 1L).otherwise(0L)).as("n_negative"),
        sum(when(v === 0, 1L).otherwise(0L)).as("n_zero"))
    val hist = hdrHistogram(df, valueCol, k, groupCol)
    val wOrd = Window.partitionBy(gcols: _*).orderBy(col("e"), col("sub"))
    val cum = hist
      .withColumn("_cum", sum("n").over(wOrd))
      .withColumn("_n", sum("n").over(Window.partitionBy(gcols: _*)))
    val qdf = qs.map { q =>
      // rank = ⌈q·n⌉ in exact integer terms: (q_e6·n + 999999) div 1e6
      val qe6 = math.round(q * 1e6)
      val rank = expr(s"(${qe6}L * _n + 999999L) div 1000000L")
      val wq = Window.partitionBy(gcols: _*)
        .orderBy(col("e"), col("sub"))
      cum.filter(col("_cum") >= rank)
        .withColumn("_rn", row_number().over(wq))
        .filter(col("_rn") === 1)
        .select(gcols :+ lit(qe6).as("q_e6") :+ col("lo").as("est") :+
          col("_n").as("n"): _*)
    }.reduce(_ unionAll _)
    val joined =
      if (gnames.isEmpty) qdf.crossJoin(broadcast(audit))
      else qdf.join(audit, gnames)
    joined.select(gcols ++ Seq(col("q_e6"), col("est"), col("n"),
      col("n_null"), col("n_negative"), col("n_zero")): _*)
  }
}
