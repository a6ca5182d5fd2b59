package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional DATA LAYOUT for scan pruning — the Z-order
  * (Morton) clustering that Delta `OPTIMIZE ZORDER BY` / Iceberg
  * sort-order rewrites apply before writing, plus the min/max
  * file-skipping math that makes it pay: co-locating rows that are
  * close in EVERY clustered dimension gives each written file a tight
  * min/max envelope per column, so a range predicate on ANY clustered
  * column prunes most files from the parquet footer stats alone — the
  * single highest-leverage knob for selective scans at 100 TB (a
  * single-column sort prunes one dimension and shreds the others).
  *
  * Everything here is EXACT integer arithmetic (normalization by
  * `div` — integral division, never a rounded double — interleave by
  * bit ops) so layouts are bit-reproducible across engines and
  * partitionings, and the whole pipeline is expressible in the DuckDB
  * oracle. Continuous values should be integerized by the caller
  * first (timestamps to epoch seconds, doubles to fixed-point) — the
  * layout needs ORDER, not magnitude.
  */
object Layout {

  /** Bit-interleave already-normalized coordinates into a Z-value.
    * Column j contributes its bit i at output position `i*k + j`
    * (k = number of columns) — the classic Morton code; inputs must
    * already sit in [0, 2^bits). Pure builtin bit ops (shift/and/or),
    * whole-stage-codegen'd, `k*bits` terms OR-folded. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1, "zValue needs at least one column")
    require(bits >= 1 && k * bits <= 62,
      s"k*bits must be in [1, 62], got $k*$bits")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Exact integral division (Spark's `div`; `/` on longs is a
    * ROUNDED double — casting it back can land one off the true
    * floor, and the DuckDB oracle's `//` is exact). */
  private def idiv(a: Column, b: Column): Column =
    call_function("div", a, b)

  /** Normalize an integral column into [0, 2^bits) against corpus
    * [min, max] by exact integer arithmetic:
    * `((v − min) · (2^bits − 1)) div (max − min)` (zero when the
    * domain is a single point). The caller supplies the min/max
    * columns (one corpus aggregate, broadcast) so several
    * normalizations share one stats pass. */
  def normalizeToBits(v: Column, minC: Column, maxC: Column,
      bits: Int): Column = {
    val span = maxC.cast("long") - minC.cast("long")
    when(span === 0L, lit(0L))
      .otherwise(idiv((v.cast("long") - minC.cast("long")) *
        lit((1L << bits) - 1L), span))
  }

  /** Assign every row a Z-value and a FIXED-RANGE bucket over the
    * named integral columns: one corpus stats aggregate (broadcast as
    * a 1-row frame), per-column integer normalization to `bits` bits,
    * Morton interleave, then `bucket = (z · nBuckets) div 2^(k·bits)`
    * — even slices of z-SPACE, deterministic and oracle-expressible
    * (a range-partitioner would sample, making file assignment
    * nondeterministic; fixed z-ranges trade perfectly even file sizes
    * for reproducibility, and AQE coalesces small buckets on write).
    *
    * Scale notes (100 TB): ONE stats scan (partial-agg min/max) + one
    * stateless projection — no shuffle at all until the caller
    * repartitions by `_bucket` to write
    * (`df.repartition(col("_bucket")).write.partitionBy("_bucket")`,
    * one exchange). Skew concentrates in z-dense buckets; AQE splits
    * them on the write exchange.
    *
    * @return input columns + `_z` (the Morton code) + `_bucket` */
  def zOrderLayout(df: DataFrame, cols: Seq[String], bits: Int,
      nBuckets: Int): DataFrame = {
    val k = cols.size
    require(nBuckets >= 1 && k * bits <= 40,
      "k*bits must be <= 40 so bucket math stays in long range")
    val statExprs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"_min_$c"),
      max(col(c)).cast("long").as(s"_max_$c")))
    val stats = df.agg(statExprs.head, statExprs.tail: _*)
    val normed = cols.map(c =>
      normalizeToBits(col(c), col(s"_min_$c"), col(s"_max_$c"), bits))
    df.crossJoin(broadcast(stats))
      .withColumn("_z", zValue(normed, bits))
      .withColumn("_bucket",
        idiv(col("_z") * lit(nBuckets.toLong),
          lit(1L << (k * bits))))
      .drop(cols.flatMap(c => Seq(s"_min_$c", s"_max_$c")): _*)
  }

  /** Per-bucket min/max/count over the named columns — exactly the
    * footer statistics a parquet writer would persist for each file
    * of a `partitionBy(_bucket)` layout, and therefore exactly what a
    * scan's file-skipping decision sees. One partial-agg groupBy. */
  def fileSkippingStats(laid: DataFrame, bucketCol: String,
      cols: Seq[String]): DataFrame =
    laid.groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          min(col(c)).cast("long").as(s"min_$c"),
          max(col(c)).cast("long").as(s"max_$c"))): _*)

  /** Mark which buckets a conjunctive box predicate
    * `AND_i (lo_i <= col_i <= hi_i)` can SKIP from stats alone: a
    * bucket is skippable iff ANY queried column's envelope misses its
    * range (`max < lo` or `min > hi`) — the parquet row-group pruning
    * rule. Returns the stats plus a 0/1 `skipped` verdict; the
    * selectivity story is `sum(skipped·n_rows) / sum(n_rows)`. */
  def skippingVerdicts(stats: DataFrame,
      ranges: Seq[(String, Long, Long)]): DataFrame = {
    require(ranges.nonEmpty, "skippingVerdicts needs at least one range")
    val miss = ranges.map { case (c, lo, hi) =>
      col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi)
    }.reduce(_ || _)
    stats.withColumn("skipped", when(miss, lit(1L)).otherwise(lit(0L)))
  }
}
