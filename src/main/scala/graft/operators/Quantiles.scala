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
  * DuckDB), and `k` is required to be a power of two so the sub-bucket
  * and lower bound are pure SHIFTS (`(v − 2^e) >> (e − log₂k)`), which
  * cannot overflow for ANY positive Long — a multiply-then-divide form
  * would wrap past `v ≈ 2^63/k` (epoch-nanosecond territory) and
  * silently mis-bucket. The sketch is partition-order independent,
  * bit-identical cross-engine, and mergeable by construction (it is a
  * counts table: merging two sketches is summing them).
  *
  * Scale notes (100 TB): the histogram is ONE map-side-combinable
  * groupBy — shuffle rows are (group, bucket, count) with at most
  * `64·k` buckets per group regardless of data volume; the quantile
  * read runs windows over that bounded bucket table only. Nulls,
  * negatives, and zeros are excluded from the value histogram but
  * COUNTED — they ride the SAME single scan as sentinel octaves
  * (`e = −1/−2/−3`), so a group consisting entirely of excluded rows
  * still surfaces in the output (null estimate, audit counts filled)
  * — dropped-loudly, never silently.
  */
object Quantiles {

  private def log2(k: Int): Int = 63 - java.lang.Long.numberOfLeadingZeros(k.toLong)

  private def requirePow2(k: Int): Int = {
    require(k >= 1 && (k & (k - 1)) == 0,
      s"k (sub-buckets per octave) must be a power of two, got $k")
    log2(k)
  }

  /** Sub-bucket of a positive `_v` with octave `_e`: a pure shift of
    * the offset `_v − 2^e` (left when the octave is narrower than `k`),
    * exact and overflow-free over the full positive Long range. */
  private def subExpr(b: Int): Column = expr(
    s"""cast(case when _e >= $b
       |  then shiftright(_v - shiftleft(1L, _e), _e - $b)
       |  else shiftleft(_v - shiftleft(1L, _e), $b - _e) end as int)
       |""".stripMargin)

  /** Inclusive integer lower bound of bucket (e, sub): `2^e` plus the
    * shifted sub offset (exact — `k` divides `2^e` when `e ≥ log₂k`;
    * the ceil-div form only runs for the tiny sub-`k` octaves). */
  private def loExpr(b: Int, k: Int): Column = expr(
    s"""shiftleft(1L, e) + case when e >= $b
       |  then shiftleft(cast(sub as bigint), e - $b)
       |  else (cast(sub as bigint) * shiftleft(1L, e) + ${k - 1}) div $k end
       |""".stripMargin)

  /** The bucket table: one row per (group, octave `e`, sub-bucket
    * `sub`) with exact count `n` and the bucket's inclusive integer
    * lower bound `lo`. `union`ing bucket tables from different data
    * slices and re-summing `n` IS the sketch merge. */
  def hdrHistogram(df: DataFrame, valueCol: String, k: Int = 16,
      groupCol: Option[String] = None): DataFrame = {
    val b = requirePow2(k)
    val v = col(valueCol).cast("long")
    val gcols = groupCol.toSeq.map(col)
    val e = (length(bin(v)) - 1).cast("int")
    df.filter(v.isNotNull && v > 0)
      .select(gcols :+ v.as("_v") :+ e.as("_e"): _*)
      .withColumn("_sub", subExpr(b))
      .groupBy(gcols :+ col("_e").as("e") :+ col("_sub").as("sub"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", loExpr(b, k))
  }

  /** Quantile estimates from the sketch: for each requested `q`, the
    * lower bound of the first bucket whose cumulative count reaches
    * `⌈q·n⌉` — within one bucket (≤ ~1/k relative error) of the true
    * q-quantile, from exact integer ranks (no interpolation, no
    * floating accumulation). Output: one row per (group ×) q with the
    * estimate (null when the group has no positive values — the group
    * still appears, with `n = 0`) and the excluded-row audit counts.
    * ONE corpus scan: excluded rows bucket into sentinel octaves of the
    * same groupBy that builds the histogram, so the audit costs no
    * second pass. */
  def hdrQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      k: Int = 16, groupCol: Option[String] = None): DataFrame = {
    val b = requirePow2(k)
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      "quantiles must be in (0, 1]")
    // q keys live as round(q·1e6): two qs that collide there (e.g.
    // 0.9999995 and 0.9999996) would silently merge, and literal
    // duplicates would duplicate every (group, q_e6) output row via the
    // crossJoin + left join below — reject both up front.
    require(qs.map(q => math.round(q * 1e6)).distinct.size == qs.size,
      "quantiles must be distinct after rounding to 1e-6")
    val gcols = groupCol.toSeq.map(col)
    val gnames = groupCol.toSeq
    val v = col(valueCol).cast("long")
    val e = when(v.isNull, lit(-1)).when(v < 0, lit(-2))
      .when(v === 0, lit(-3))
      .otherwise((length(bin(v)) - 1).cast("int"))
    val buckets = df
      .select(gcols :+ coalesce(v, lit(0L)).as("_v") :+ e.as("_e"): _*)
      .withColumn("_sub",
        when(col("_e") >= 0, subExpr(b)).otherwise(lit(0)))
      .groupBy(gcols :+ col("_e").as("e") :+ col("_sub").as("sub"): _*)
      .agg(count(lit(1)).as("n"))
    val audit = buckets.groupBy(gcols: _*).agg(
      coalesce(sum(when(col("e") === -1, col("n")).otherwise(0L)), lit(0L))
        .as("n_null"),
      coalesce(sum(when(col("e") === -2, col("n")).otherwise(0L)), lit(0L))
        .as("n_negative"),
      coalesce(sum(when(col("e") === -3, col("n")).otherwise(0L)), lit(0L))
        .as("n_zero"))
    val hist = buckets.filter(col("e") >= 0).withColumn("lo", loExpr(b, k))
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
    // Every group × q gets a row even when the group has zero positive
    // values: the audit table (which has a row for EVERY input group,
    // sentinel buckets included) crossed with the tiny q list is the
    // output shell; estimates left-join in.
    import df.sparkSession.implicits._
    val qframe = qs.map(q => math.round(q * 1e6)).toDF("q_e6")
    audit.crossJoin(broadcast(qframe))
      .join(qdf, gnames :+ "q_e6", "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .select(gcols ++ Seq(col("q_e6"), col("est"), col("n"),
        col("n_null"), col("n_negative"), col("n_zero")): _*)
  }
}
