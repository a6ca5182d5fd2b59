package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data-capture between two versions of a staged
  * table. The reference rebuilds its whole graph from scratch on every
  * run (`graph_db_builder.py:557-563` truncates and re-streams); an
  * incremental pipeline instead diffs the fresh extract against the
  * previous staging and ships only the delta. This is the batch
  * counterpart of [[GraphBuilder.upsertStagedNodes]] (which APPLIES new
  * rows): `diff` REPORTS what changed, for audit trails, incremental
  * downstream rebuilds, and change-rate monitoring.
  *
  * Output: one row per id present in either snapshot, classified
  * `added` (new id) / `removed` (id gone) / `changed` (id in both,
  * any non-key column differs) / `unchanged`. Comparison is null-safe
  * (`<=>`): a column going null↔non-null counts as a change, null==null
  * does not.
  *
  * Scale: ONE full outer shuffle join on the id — the minimum possible
  * for an exact diff; with both snapshots bucketed on the id
  * ([[graft.sources.Bucketing]]) even that shuffle disappears. Column
  * comparison happens AFTER the join as a codegen'd conjunction — no
  * row serialization, no UDF, and when `compareCols` is narrowed the
  * parquet scans prune to exactly id + compared columns.
  */
object SnapshotDiff {

  /** Diff `current` against `previous` on key `idCol`.
    *
    * @param compareCols columns whose change flips a row to `changed`;
    *   default = every shared non-id column. Columns present in only one
    *   snapshot (schema drift) are ignored — pair with
    *   [[graft.plans.SchemaMerge]] to reconcile schemas first.
    * @param keepUnchanged include `unchanged` rows (default false: the
    *   delta is what downstream consumers ship; unchanged rows at 100 TB
    *   are almost all rows).
    * @return `(id, change string)` rows, plus the CURRENT snapshot's
    *   compared columns for `added`/`changed` (null for `removed` — the
    *   apply-side payload of the delta).
    */
  def diff(previous: DataFrame, current: DataFrame, idCol: String,
      compareCols: Seq[String] = Nil,
      keepUnchanged: Boolean = false): DataFrame = {
    val shared = current.columns.toSeq.filter(previous.columns.contains)
    val cols =
      if (compareCols.nonEmpty) compareCols
      else shared.filterNot(_ == idCol)
    require(cols.nonEmpty, s"diff: no comparable columns besides $idCol")
    val missing = cols.filterNot(shared.contains)
    require(missing.isEmpty,
      s"diff: columns not in both snapshots: ${missing.mkString(", ")}")

    val prev = previous.select((idCol +: cols).map(col): _*).alias("_prev")
    val cur = current.select((idCol +: cols).map(col): _*).alias("_cur")
    val joined = prev.join(cur,
      col(s"_prev.$idCol") === col(s"_cur.$idCol"), "full_outer")

    val inPrev = col(s"_prev.$idCol").isNotNull
    val inCur = col(s"_cur.$idCol").isNotNull
    val sameVals = cols.map(c => col(s"_prev.$c") <=> col(s"_cur.$c"))
      .reduce(_ && _)
    val change = when(!inPrev, lit("added"))
      .when(!inCur, lit("removed"))
      .when(sameVals, lit("unchanged"))
      .otherwise(lit("changed"))

    val out = joined.select(
      coalesce(col(s"_cur.$idCol"), col(s"_prev.$idCol")).as(idCol) +:
        change.as("change") +:
        cols.map(c => col(s"_cur.$c").as(c)): _*)
    if (keepUnchanged) out else out.filter(col("change") =!= "unchanged")
  }

  /** Per-class change counts — the monitoring signal (alert when
    * `removed` spikes). One extra partial-agg groupBy over the diff. */
  def diffStats(previous: DataFrame, current: DataFrame, idCol: String,
      compareCols: Seq[String] = Nil): DataFrame =
    diff(previous, current, idCol, compareCols, keepUnchanged = true)
      .groupBy("change").agg(count(lit(1)).as("n"))

  /** SCD2 history build — collapse a (key, ts, attributes) observation
    * log into slowly-changing-dimension validity intervals: one row per
    * maximal run of consecutive identical attribute values (the
    * gaps-and-islands reduction), `valid_to` = the next run's start,
    * null on each key's current row. [[diff]] answers "what changed
    * between two snapshots"; this builds the full AS-OF dimension table
    * an [[AsOfJoin]] then queries.
    *
    * Change detection is null-safe (`<=>`): a null attribute value is a
    * distinct state, not a wildcard. Within a run the attributes are
    * constant by construction, so the emitted value is exact (`min` —
    * deterministic, no `first()` order sensitivity).
    *
    * Scale notes (100 TB logs): one key shuffle carries BOTH windows
    * (lag + running segment sum share the (key, ts, id) sort) and the
    * (key, segment) aggregation; the `valid_to` lead runs over the
    * already-collapsed runs — segment-count-sized, not observation-
    * sized. Keys parallelize; AQE splits hot ones.
    *
    * @return (`keyCol`, `run_seq` 1.., `valid_from`, `valid_to`,
    *         `n_obs`, attribute cols) — one row per run in observation
    *         order, `valid_to` null = still current. `run_seq` is the
    *         unambiguous per-key order even when ts ties straddle a run
    *         boundary (two runs CAN share a start second). */
  def scd2(df: DataFrame, keyCol: String, tsSecCol: String, idCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "scd2 needs at least one attribute column")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsSecCol), col(idCol))
    val chg = valueCols.map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) // first row: lag is null → not <=> → new run
    val seg = df
      .filter(col(tsSecCol).isNotNull)
      .withColumn("_seg",
        sum(when(chg, 1L).otherwise(0L)).over(w))
    val runs = seg.groupBy(col(keyCol), col("_seg"))
      .agg(min(col(tsSecCol)).as("valid_from"),
        count(lit(1)).as("n_obs") +:
          valueCols.map(c => min(col(c)).as(c)): _*)
    // order by the segment id, not valid_from: with ts ties across a
    // run boundary two runs can share a start second, and the segment
    // id is the observation order by construction
    val runW = Window.partitionBy(col(keyCol)).orderBy(col("_seg"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(runW))
      .withColumn("run_seq", row_number().over(runW).cast("long"))
      .select(Seq(col(keyCol), col("run_seq"), col("valid_from"),
        col("valid_to"), col("n_obs")) ++ valueCols.map(col): _*)
  }

  /** Two-sample Kolmogorov–Smirnov statistic between two snapshots of a
    * numeric column — the binning-free companion of [[psiDrift]] (PSI
    * answers "how much mass moved between my chosen bins"; KS answers
    * "how far apart are the raw distributions", no bins to pick):
    *
    *   D = max over pooled values of |F̂₁(v) − F̂₂(v)|
    *
    * computed EXACTLY: D = max |c₁·n₂ − c₂·n₁| / (n₁·n₂) where the
    * cumulative counts are integers and the cross-products accumulate
    * in decimal(38,0) — the argmax is a total order over exact values
    * (smallest v on ties), so the reported location can never flip on
    * a float ulp. The single division to double happens once, on the
    * 1-row result.
    *
    * Scale notes (100 TB): both inputs partial-agg to DISTINCT-VALUE-
    * sized count tables before anything global happens; the cumulative
    * window then runs over the merged distinct values on one partition
    * — bounded by the column's cardinality, not its row count.
    * Pre-quantize high-cardinality measures (milli-round) to bound it;
    * for binned-by-construction columns this is already tiny.
    *
    * @return one row: (`n_prev`, `n_cur`, `d_stat`, `at_value` — the
    *         pooled value where the gap peaks). */
  def ksTest(previous: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    def counts(df: DataFrame, out: String): DataFrame = df
      .select(col(valueCol).as("v")).filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as(out))
    val merged = counts(previous, "k1")
      .join(counts(current, "k2"), Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("k1"), lit(0L)).as("k1"),
        coalesce(col("k2"), lit(0L)).as("k2"))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = merged.agg(
      sum("k1").cast(dec).as("_n1"), sum("k2").cast(dec).as("_n2"))
    val gaps = merged
      .withColumn("_c1", sum(col("k1")).over(cum).cast(dec))
      .withColumn("_c2", sum(col("k2")).over(cum).cast(dec))
      .crossJoin(broadcast(tot))
      .withColumn("_gap",
        abs(col("_c1") * col("_n2") - col("_c2") * col("_n1")))
    val top = Window.orderBy(col("_gap").desc, col("v"))
    gaps.withColumn("_rn", row_number().over(top))
      .filter(col("_rn") === 1)
      .select(col("_n1").cast("long").as("n_prev"),
        col("_n2").cast("long").as("n_cur"),
        (col("_gap").cast("double") /
          (col("_n1").cast("double") * col("_n2").cast("double")))
          .as("d_stat"),
        col("v").as("at_value"))
  }

  /** Population Stability Index between two snapshots of a numeric
    * column — the standard distribution-drift gate ([[diff]] catches
    * row churn; this catches the subtler "same rows, shifted values"
    * regression that silently degrades a model trained on the corpus):
    *
    *   PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)
    *
    * over `nBins` fixed-width bins on [`lo`, `hi`) (outliers clamp into
    * the edge bins — they count as drift mass, not dropped rows), with
    * add-one smoothing so empty bins stay finite: p_i = (c_i + 1) /
    * (n + nBins). Conventional read: < 0.1 stable, 0.1–0.25 drifting,
    * > 0.25 shifted.
    *
    * Engine-portable determinism: bin assignment and counts are exact
    * integer ops; each bin's contribution is TWO double divisions, one
    * `ln` of a double ratio, and one product — no distributed float
    * summation (the final PSI total is the caller's `sum` over
    * `nBins` rows, driver-bounded).
    *
    * Scale notes (100 TB): each snapshot partial-aggs to ≤ `nBins` rows
    * map-side (bin id is a narrow projection); the join of two
    * ≤ `nBins`-row sides + the 1-row totals is broadcast-sized. The two
    * input scans are the only data-sized work, and they prune to one
    * column each.
    *
    * @return one row per bin: (`bin`, `n_prev`, `n_cur`, `p_prev`,
    *         `p_cur`, `psi` — this bin's contribution). */
  def psiDrift(previous: DataFrame, current: DataFrame, valueCol: String,
      nBins: Int, lo: Double, hi: Double,
      ckpt: graft.Checkpointer = graft.Checkpointer.Local): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    require(lo < hi, s"lo must be < hi (got [$lo, $hi))")
    def binned(df: DataFrame, out: String): DataFrame = df
      .select(least(greatest(
          floor((col(valueCol) - lit(lo)) * lit(nBins.toDouble) /
            lit(hi - lo)), lit(0.0)), lit((nBins - 1).toDouble))
        .cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    val spark = previous.sparkSession
    val bins = spark.range(nBins).select(col("id").as("bin"))
    // materialized once: both the totals row and the output consume it,
    // and its upstream is the two data-sized snapshot scans
    val joined = ckpt(bins
      .join(binned(previous, "n_prev"), Seq("bin"), "left")
      .join(binned(current, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur")))
    val totals = joined.agg(sum("n_prev").as("_tp"), sum("n_cur").as("_tc"))
    def share(n: String, t: String) =
      (col(n) + 1).cast("double") / (col(t) + lit(nBins.toLong)).cast("double")
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_prev"), col("n_cur"),
        share("n_prev", "_tp").as("p_prev"),
        share("n_cur", "_tc").as("p_cur"))
      .withColumn("psi",
        (col("p_prev") - col("p_cur")) * log(col("p_prev") / col("p_cur")))
  }

  /** Welch's unequal-variance t-test between two snapshots of a numeric
    * column — the mean-shift drift gate ([[ksTest]] catches any
    * distributional change; this answers the narrower "did the MEAN
    * move, given unequal variances?" with a classical test statistic).
    *
    * Engine-portable determinism: pass an INTEGER-valued column (the
    * repo convention — pre-integerize, e.g. `floor(x*1000 + 0.5)`).
    * Count, sum, and sum-of-squares then accumulate EXACTLY in
    * decimal(38,0) (partition-order-independent, no float summation);
    * mean, variance, t, and the Welch–Satterthwaite df are a fixed
    * handful of double ops on those exact moments, so an oracle
    * mirroring the operand shapes reproduces them bit-for-bit.
    *
    * Scale notes (100 TB): each snapshot partial-aggs to ONE row
    * map-side (no shuffle of data rows — the only exchanges move two
    * 1-row partials); scans prune to the value column.
    *
    * @return one row: (`n_prev`, `n_cur`, `mean_prev`, `mean_cur`,
    *         `t_stat`, `df`) — `t_stat`/`df` null when either side has
    *         < 2 rows or both sample variances are 0. */
  def welchT(previous: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    def moments(df: DataFrame, tag: String): DataFrame = df
      .select(col(valueCol).cast(dec).as("_v"))
      .filter(col("_v").isNotNull)
      .agg(count(lit(1)).cast(dec).as(s"_n$tag"),
        sum(col("_v")).cast(dec).as(s"_s$tag"),
        sum(col("_v") * col("_v")).cast(dec).as(s"_q$tag"))
    def d(name: String) = col(name).cast("double")
    // sample variance from exact moments: (q − s²/n) / (n − 1)
    def varOf(tag: String) =
      (d(s"_q$tag") - d(s"_s$tag") * d(s"_s$tag") / d(s"_n$tag")) /
        (d(s"_n$tag") - lit(1.0))
    // every division sits inside a lazily-evaluated `when` branch whose
    // condition proves the divisor non-zero — ANSI mode errors on ANY
    // numeric division by zero, including doubles
    moments(previous, "1").crossJoin(broadcast(moments(current, "2")))
      .withColumn("_se2",
        when(col("_n1") >= 2 && col("_n2") >= 2,
          varOf("1") / d("_n1") + varOf("2") / d("_n2")))
      .select(
        col("_n1").cast("long").as("n_prev"),
        col("_n2").cast("long").as("n_cur"),
        when(col("_n1") >= 1, d("_s1") / d("_n1")).as("mean_prev"),
        when(col("_n2") >= 1, d("_s2") / d("_n2")).as("mean_cur"),
        when(col("_se2").isNotNull && col("_se2") > 0,
          (d("_s1") / d("_n1") - d("_s2") / d("_n2")) / sqrt(col("_se2")))
          .as("t_stat"),
        when(col("_se2").isNotNull && col("_se2") > 0,
          col("_se2") * col("_se2") /
            ((varOf("1") / d("_n1")) * (varOf("1") / d("_n1")) /
              (d("_n1") - lit(1.0)) +
             (varOf("2") / d("_n2")) * (varOf("2") / d("_n2")) /
              (d("_n2") - lit(1.0))))
          .as("df"))
  }

  /** Mann–Whitney U rank test between two snapshots — the
    * distribution-free "did values shift?" companion to [[welchT]]
    * (no normality assumption; robust to the heavy tails that wreck a
    * t-test on web-scale quality scores).
    *
    * Exact rank arithmetic on the DISTINCT-VALUE histogram (the
    * [[graft.operators.Validate.gini]] rank-run discipline): equal
    * values occupy a contiguous rank run, so the rank sum of side 1 is
    * Σ c1·(2·lt + c + 1) / 2 over distinct values (`lt` = combined
    * count strictly below, `c` = combined count at the value) — kept
    * ×2 in decimal(38,0) so nothing is ever a .5 float. The normal
    * approximation's variance carries the standard tie correction
    * Σ(c³−c), also exact; `z` is the only float, computed last with
    * mirrored operand shapes.
    *
    * Scale notes (100 TB): both sides partial-agg to distinct-value
    * histograms before anything joins (the ksTest shape); the
    * cumulative window runs over the merged histogram, value-count-
    * sized, not row-count-sized.
    *
    * @return one row: (`n_prev`, `n_cur`, `u2_stat` — 2·U₁ exact,
    *         `z_stat` — null when the tie-corrected variance is 0). */
  def mannWhitneyU(previous: DataFrame, current: DataFrame,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    def counts(df: DataFrame, out: String): DataFrame = df
      .select(col(valueCol).as("v")).filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as(out))
    val merged = counts(previous, "k1")
      .join(counts(current, "k2"), Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("k1"), lit(0L)).cast(dec).as("k1"),
        coalesce(col("k2"), lit(0L)).cast(dec).as("k2"))
      .withColumn("c", (col("k1") + col("k2")).cast(dec))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = merged.withColumn("lt",
      coalesce(sum(col("c")).over(cum), lit(0L)).cast(dec))
    val agg = ranked.agg(
      sum(col("k1")).cast(dec).as("_n1"),
      sum(col("k2")).cast(dec).as("_n2"),
      // 2·R1 = Σ c1·(2·lt + c + 1) — exact
      sum(col("k1") * (col("lt") * 2 + col("c") + 1)).cast(dec).as("_r2"),
      // tie correction Σ(c³ − c) — exact
      sum(col("c") * col("c") * col("c") - col("c")).cast(dec).as("_tie"))
    def d(name: String) = col(name).cast("double")
    agg
      // 2·U1 = 2·R1 − n1·(n1+1); centered 2·(U1 − n1n2/2) = 2U1 − n1n2
      .withColumn("_u2", (col("_r2") - col("_n1") * (col("_n1") + 1))
        .cast(dec))
      .withColumn("_nn", (col("_n1") + col("_n2")).cast(dec))
      // 12·Var(U) = n1·n2·((n+1) − Σ(c³−c)/(n·(n−1)))  (as doubles);
      // guarded: ANSI errors on double division by zero when n < 2
      .withColumn("_var12",
        when(col("_nn") >= 2,
          d("_n1") * d("_n2") * ((d("_nn") + lit(1.0)) -
            d("_tie") / (d("_nn") * (d("_nn") - lit(1.0))))))
      .select(
        col("_n1").cast("long").as("n_prev"),
        col("_n2").cast("long").as("n_cur"),
        col("_u2").cast("long").as("u2_stat"),
        when(col("_var12") > 0,
          (d("_u2") - d("_n1") * d("_n2")) /
            (lit(2.0) * sqrt(col("_var12") / lit(12.0))))
          .as("z_stat"))
  }

  /** Schema drift report between two snapshots — the metadata
    * companion to [[diff]], which compares VALUES over the shared
    * schema and deliberately ignores drifted columns: one row per
    * added / removed / type-changed column (empty when the schemas
    * agree), ordered facts for the contract check every scheduled
    * ingest runs before trusting a new drop. Nullability flips are
    * intentionally ignored (Spark nullability is advisory — it
    * changes with join shapes, not source contracts).
    *
    * Runs on driver-side METADATA only (`StructType`, never data): no
    * scan, no shuffle — free at any corpus size. Pair a non-empty
    * report with [[graft.plans.SchemaMerge]] to reconcile before
    * [[diff]].
    *
    * @return (`col_name`, `change` ∈ added|removed|type_changed,
    *         `prev_type`, `cur_type`) */
  def schemaDrift(previous: DataFrame, current: DataFrame): DataFrame = {
    val spark = current.sparkSession
    import spark.implicits._
    val p = previous.schema.map(f => f.name -> f.dataType.simpleString)
    val c = current.schema.map(f => f.name -> f.dataType.simpleString)
    val pm = p.toMap
    val cm = c.toMap
    val added = c.collect { case (n, t) if !pm.contains(n) =>
      (n, "added", null: String, t) }
    val removed = p.collect { case (n, t) if !cm.contains(n) =>
      (n, "removed", t, null: String) }
    val changed = c.collect {
      case (n, t) if pm.contains(n) && pm(n) != t =>
        (n, "type_changed", pm(n), t) }
    (added ++ removed ++ changed)
      .toDF("col_name", "change", "prev_type", "cur_type")
  }
}
