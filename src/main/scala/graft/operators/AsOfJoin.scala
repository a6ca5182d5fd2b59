package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (time-travel) join: match each left row to the most recent right
  * row with `right.ts <= left.ts` within the same partition key — the
  * standard point-in-time lookup (latest price before a trade, last
  * purchase before a click).
  *
  * Spark has no native as-of join; the scalable composition is the tagged
  * UNION + windowed last-non-null carry-forward:
  *
  *   1. union left and right rows, tagging origin;
  *   2. one window per key ordered by (ts, right-first-on-ties) carries the
  *      latest right-side values forward (`last(col, ignoreNulls=true)`);
  *   3. keep only left rows.
  *
  * Cost: ONE shuffle (the window partitioning on the key) over |L|+|R| rows
  * — versus a naive non-equi join's per-key quadratic BroadcastNestedLoop.
  * Ties at equal ts resolve right-before-left, giving inclusive `<=`
  * semantics (matches ANSI/DuckDB `ASOF JOIN ... ON l.ts >= r.ts`).
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto each left row
    *                  (nulls where no right row precedes the left row).
    *
    * The carried values ride in ONE struct with ONE `last(ignoreNulls)`:
    * per-column `last`s would let a column whose value is null in the most
    * recent right row back-fill from an OLDER right row, mixing columns
    * from different right rows — ASOF semantics are row-atomic (the DuckDB
    * native operator matches whole rows). A right row with all-null values
    * is still a non-null struct, so it correctly "wins" and contributes
    * its nulls. */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(right.columns.contains), "valueCols must exist in right")

    val isRight = "_graft_is_right"
    val rVals = "_graft_rvals"
    val rStructType = StructType(valueCols.map(c => right.schema(c)))

    val taggedLeft = left.withColumn(isRight, lit(0))
      .withColumn(rVals, lit(null).cast(rStructType))
    val taggedRight = {
      val base = right.select((keyCols :+ tsCol).map(col) :+
        struct(valueCols.map(col): _*).as(rVals): _*)
      leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
        .foldLeft(base.withColumn(isRight, lit(1))) { (df, c) =>
          df.withColumn(c, lit(null).cast(left.schema(c).dataType))
        }
    }

    val unioned = taggedLeft.unionByName(taggedRight)
    // right rows sort before left rows at equal ts → inclusive match
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(isRight).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn(rVals,
      last(col(rVals), ignoreNulls = true).over(w))
    carried.filter(col(isRight) === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"$rVals.$c").as(c)): _*)
  }
}
