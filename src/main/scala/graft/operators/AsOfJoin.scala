package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

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

  /** Forward as-of join — each left row takes the FIRST right row at or
    * after its timestamp (`l.ts <= r.ts`, inclusive), the
    * next-scheduled-event direction of [[asofJoin]]'s
    * latest-state-before: "the next maintenance window after this
    * alert", "the first price tick after this order". Same
    * union-plus-window reduction and the same single-shuffle cost —
    * the window just runs time-REVERSED (ts desc, right-before-left on
    * ties keeps the match inclusive), carrying the nearest FOLLOWING
    * right row backward onto each left row. Matches DuckDB
    * `ASOF JOIN ... ON l.ts <= r.ts` exactly (the oracle's form). */
  def asofJoinForward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(right.columns.contains),
      "valueCols must exist in right")
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
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(isRight).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn(rVals, last(col(rVals), ignoreNulls = true).over(w))
      .filter(col(isRight) === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"$rVals.$c").as(c)): _*)
  }

  /** Nearest as-of join — each left row takes the right row with the
    * SMALLEST |Δts| (backward wins exact ties, the pandas
    * `merge_asof(direction="nearest")` convention): sensor alignment,
    * closest-quote attribution. Both direction candidates come from
    * TWO windows over the SAME key partitioning, so Catalyst plans ONE
    * exchange with two sorts — still a single shuffle over |L|+|R|
    * rows; the pick between candidates is a codegen'd scalar compare.
    * `tsCol` must be numeric (epoch micros/millis — cast timestamps
    * first): nearest needs distance arithmetic, the
    * [[asofJoinSalted]] caveat. */
  def asofJoinNearest(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(right.columns.contains),
      "valueCols must exist in right")
    val isRight = "_graft_is_right"
    val rVals = "_graft_rvals"
    val rTs = "_graft_rts"
    val rStructType = StructType(
      valueCols.map(c => right.schema(c)) :+
        StructField(rTs, right.schema(tsCol).dataType))
    val taggedLeft = left.withColumn(isRight, lit(0))
      .withColumn(rVals, lit(null).cast(rStructType))
    val taggedRight = {
      val base = right.select((keyCols :+ tsCol).map(col) :+
        struct(valueCols.map(col) :+ col(tsCol).as(rTs): _*)
          .as(rVals): _*)
      leftCols.filterNot(c => keyCols.contains(c) || c == tsCol)
        .foldLeft(base.withColumn(isRight, lit(1))) { (df, c) =>
          df.withColumn(c, lit(null).cast(left.schema(c).dataType))
        }
    }
    val unioned = taggedLeft.unionByName(taggedRight)
    val back = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(isRight).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(isRight).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = unioned
      .withColumn("_graft_b", last(col(rVals), ignoreNulls = true).over(back))
      .withColumn("_graft_f", last(col(rVals), ignoreNulls = true).over(fwd))
      .withColumn(rVals,
        when(col("_graft_b").isNull, col("_graft_f"))
          .when(col("_graft_f").isNull, col("_graft_b"))
          // backward distance ts − b.ts vs forward f.ts − ts; <= keeps
          // the backward row on exact ties
          .when(col(tsCol) - col(s"_graft_b.$rTs") <=
            col(s"_graft_f.$rTs") - col(tsCol), col("_graft_b"))
          .otherwise(col("_graft_f")))
    picked.filter(col(isRight) === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"$rVals.$c").as(c)): _*)
  }

  /** Hot-key-hardened as-of join: identical semantics to [[asofJoin]], but
    * the window partitioning is (key, ts-range bucket) instead of (key), so
    * ONE key with millions of rows spreads over `numBuckets` tasks instead
    * of serializing in one (the plain window's sort within a single hot key
    * runs on a single task — the one residual scale caveat of [[asofJoin]]).
    *
    * Range salting needs a carry across bucket boundaries: a left row's
    * match may live in ANY earlier bucket. Per (key, bucket) the latest
    * right row is pre-aggregated (tiny: |keys|×buckets rows), a cumulative
    * window over that aggregate computes each bucket's carry-in, and the
    * carry-in joins back as one synthetic right row per (key, bucket) — so
    * the per-bucket window sees exactly the right state it needs. Extra
    * cost vs unsalted: one small aggregate + one spine window; same number
    * of shuffles over the big data.
    *
    * `tsCol` must be numeric (epoch micros/millis — cast timestamps first).
    *
    * EAGER unless `bounds` is supplied: bucketing needs the global ts
    * min/max, so composing this operator runs a 2-value aggregate over both
    * inputs immediately (and the inputs are scanned again when the result
    * evaluates, if uncached) — unlike every other lazily-composed operator
    * here. Callers that know the time range (ingest date bounds, partition
    * metadata) should pass `bounds = Some((lo, hi))` to stay fully lazy.
    */
  def asofJoinSalted(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      valueCols: Seq[String], numBuckets: Int = 32,
      bounds: Option[(Double, Double)] = None): DataFrame = {
    require(numBuckets >= 1, "numBuckets must be >= 1")
    require(bounds.forall(b => b._1 <= b._2),
      "bounds must satisfy lo <= hi")
    val bkt = "_graft_ts_bkt"
    val leftCols = left.columns.toSeq

    // Bucket width from the global ts range: supplied by the caller, or one
    // tiny 2-value aggregate (min/max over a numeric column — map-side
    // partials, no full shuffle) run eagerly at composition time.
    val (lo, hi) = bounds.getOrElse {
      val Seq(loAny, hiAny) = left.select(col(tsCol))
        .unionByName(right.select(col(tsCol)))
        .agg(min(col(tsCol)).cast("double"), max(col(tsCol)).cast("double"))
        .head().toSeq.map(v => Option(v).map(_.asInstanceOf[Double]))
      if (loAny.isEmpty) { // both sides empty of non-null ts: degenerate
        return asofJoin(left, right, keyCols, tsCol, valueCols)
      }
      (loAny.get, hiAny.get)
    }
    val width = math.max((hi - lo) / numBuckets, 1e-9)
    def bucketOf(ts: Column): Column =
      least(floor((ts.cast("double") - lit(lo)) / lit(width)),
        lit(numBuckets - 1)).cast("int")

    val lb = left.withColumn(bkt, bucketOf(col(tsCol)))
    val rb = right.withColumn(bkt, bucketOf(col(tsCol)))

    // Latest right row per (key, bucket): struct compares lexicographically,
    // ts-first, so max() picks the row with the greatest ts (value columns
    // break exact-ts ties deterministically).
    val rowStruct = struct((col(tsCol).as("_ts") +:
      valueCols.map(c => col(c))): _*)
    val latestPerBucket = rb
      .groupBy((keyCols :+ bkt).map(col): _*)
      .agg(max(rowStruct).as("_latest"))

    // Carry-in per (key, bucket): cumulative latest over all STRICTLY
    // earlier buckets, computed on the bucket spine (every (key, bucket)
    // either side touches) — tiny data, wide parallelism irrelevant here.
    val spine = lb.select((keyCols :+ bkt).map(col): _*)
      .unionByName(rb.select((keyCols :+ bkt).map(col): _*))
      .distinct()
    val wCarry = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(bkt))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = spine
      .join(latestPerBucket, keyCols :+ bkt, "left")
      .withColumn("_carry", max(col("_latest")).over(wCarry))
      .filter(col("_carry").isNotNull)
      .select((keyCols.map(col) :+ col(bkt) :+
        col("_carry._ts").as(tsCol)) ++
        valueCols.map(c => col(s"_carry.$c").as(c)): _*)

    // Per-bucket right side = real rows + the carry-in synthetic row (its
    // real ts < bucket start, so it naturally sorts before in-bucket rows).
    val rAug = rb.select((keyCols.map(col) :+ col(bkt) :+ col(tsCol)) ++
        valueCols.map(col): _*)
      .unionByName(carryIn)

    asofJoin(lb, rAug, keyCols :+ bkt, tsCol, valueCols)
      .drop(bkt)
  }
}
