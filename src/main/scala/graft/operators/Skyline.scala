package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) extraction — "the options nothing else
  * beats on every axis": cheapest-for-their-size parts, best
  * quality-per-token documents, fastest-per-cost configurations. A row
  * survives iff NO other row is ≤ on both dimensions and < on at least
  * one (so exact duplicates dominate nothing and both survive). Both
  * dimensions MINIMIZE — callers negate a column to maximize it.
  *
  * Scale notes (100 TB): the naive formulation is an O(n²) self-join;
  * this is the standard two-phase distributed skyline instead —
  *
  *  1. PRUNE (complete, never drops a skyline row): x-range buckets;
  *     per-bucket min-y partial-aggs map-side to a `buckets`-row table;
  *     the strict-prefix cumulative min over that tiny table yields a
  *     per-bucket threshold, broadcast back — floor-bucketing is
  *     monotone, so an earlier bucket's min-y row has STRICTLY smaller
  *     x and any row at-or-above its bucket threshold is dominated by
  *     it. Random data keeps O(skyline + n/buckets) candidates.
  *  2. REFINE (exact): per-distinct-x min-y over the CANDIDATE set,
  *     then one window over that distinct-x table — candidate-sized,
  *     not corpus-sized — computes each x's strict-prefix min-y; a
  *     candidate survives iff it equals its x-group min (same-x
  *     dominance is strict in y) and beats every smaller x's min
  *     (strict-prefix dominance needs only ≤ in y).
  *
  * The refine window is the unavoidable sequential tail; its input is
  * the pruned candidate set, which for anti-correlated (all-skyline)
  * data degrades to the full input — the skyline is then genuinely that
  * large and no algorithm avoids materializing it.
  */
object Skyline {

  /** @param xCol,yCol numeric, both minimized, null rows dropped.
    * @param buckets   x-range prune resolution (more = tighter prune,
    *                  still one tiny aggregate either way).
    * @param ckpt      materializes the pruned CANDIDATE set (skyline-
    *                  sized, not corpus-sized) — it feeds both the
    *                  per-x refine aggregate and the final join, and
    *                  without the cut the whole scan+bucket+prune
    *                  subtree re-executes for each (the linkRecords
    *                  re-evaluation discipline, Dedup.scala).
    * @return the input rows (all columns) on the skyline. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 1024,
      ckpt: graft.Checkpointer = graft.Checkpointer.Local): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val span = rows.agg(min(col(xCol).cast("double")).as("_xlo"),
      max(col(xCol).cast("double")).as("_xhi"))
    val bucketed = rows.crossJoin(broadcast(span))
      .withColumn("_bk",
        when(col("_xhi") === col("_xlo"), lit(0L))
          .otherwise(least(
            floor((col(xCol).cast("double") - col("_xlo")) /
              (col("_xhi") - col("_xlo")) * buckets).cast("long"),
            lit(buckets - 1L))))
    val wPrefix = Window.orderBy(col("_bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val thr = bucketed.groupBy(col("_bk"))
      .agg(min(col(yCol).cast("double")).as("_bmin"))
      .select(col("_bk"), min(col("_bmin")).over(wPrefix).as("_thr"))
    val candidates = ckpt(bucketed
      .join(broadcast(thr), Seq("_bk"))
      .filter(col("_thr").isNull ||
        col(yCol).cast("double") < col("_thr")))
    // exact refine on the candidate set: per-x min-y, then the strict-
    // prefix min over distinct x only (candidate-sized window)
    val perX = candidates.groupBy(col(xCol).as("_x"))
      .agg(min(col(yCol).cast("double")).as("_gy"))
    val wX = Window.orderBy(col("_x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val gates = perX.select(col("_x"), col("_gy"),
      min(col("_gy")).over(wX).as("_strict"))
    candidates
      .join(broadcast(gates), candidates(xCol) === gates("_x"))
      .filter(col(yCol).cast("double") === col("_gy") &&
        (col("_strict").isNull ||
          col(yCol).cast("double") < col("_strict")))
      .drop("_bk", "_xlo", "_xhi", "_thr", "_x", "_gy", "_strict")
  }
}
