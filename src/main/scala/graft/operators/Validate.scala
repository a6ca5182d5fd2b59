package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the QC gate an ETL engine runs
  * before promoting a staged table (the reference's pipeline has no
  * validation at all: a malformed source row surfaces as a KeyError deep
  * inside the staging loop, `graph_db_builder.py:491-543`; here the rules
  * are explicit, named, and reported).
  *
  * A [[Validate.Rule]] names a column-level expectation. [[Validate.report]]
  * evaluates ALL rules in ONE aggregation pass over the input and returns a
  * per-rule result frame `(rule, column, rows, violations, pass)` — the
  * artifact a pipeline gates on (`report.filter(!col("pass")).isEmpty`).
  * [[Validate.annotate]] is the row-level counterpart: it appends a
  * `violations array<string>` column naming each row-local rule the row
  * fails, so bad rows can be routed to a quarantine sink instead of
  * aborting the load.
  *
  * Scale: every rule except [[Validate.Unique]] is a row-local predicate —
  * the report is a single scan with map-side partial aggregation and a
  * 1-row result (no shuffle of data rows). `Unique` needs a distinct
  * count, which Catalyst plans as a two-phase aggregate on the checked
  * column only (the narrowest possible shuffle: one column, partial
  * distinct per partition). `annotate` is a pure narrow projection.
  * Regex patterns are validated to a portable subset so a rule written
  * here evaluates identically under Java regex and RE2-family engines.
  */
object Validate {

  /** A named expectation on one column. `name` must be unique per run. */
  sealed trait Rule {
    def name: String
    def column: String
    /** Row-level pass predicate, or None for dataset-level rules. */
    private[operators] def rowPredicate: Option[Column]
  }

  /** Column must contain no nulls. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
    private[operators] def rowPredicate = Some(col(column).isNotNull)
  }

  /** Non-null values must be unique (nulls don't count as duplicates —
    * pair with [[NotNull]] for a primary-key check). Violations = number
    * of surplus rows beyond one per distinct value. */
  final case class Unique(column: String) extends Rule {
    val name = s"unique($column)"
    private[operators] def rowPredicate = None
  }

  /** Non-null numeric values must satisfy `lo <= x <= hi` (null passes —
    * nullability is [[NotNull]]'s job, keeping each violation count
    * attributable to exactly one rule). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Rule {
    require(lo <= hi, s"InRange($column): lo $lo > hi $hi")
    val name = s"in_range($column)"
    private[operators] def rowPredicate =
      Some(col(column).isNull || (col(column) >= lo && col(column) <= hi))
  }

  /** Non-null values must be one of `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    require(values.nonEmpty, s"InSet($column): empty value set")
    val name = s"in_set($column)"
    private[operators] def rowPredicate =
      Some(col(column).isNull || col(column).isin(values: _*))
  }

  /** Non-null values must match `pattern` (unanchored find, like `rlike`
    * and RE2 `regexp_matches` — anchor with `^...$` for a full match).
    * The pattern is restricted to a portable subset (literals, character
    * classes, anchors, `.`, repetition, alternation, grouping) so the rule
    * means the same thing under Java regex and RE2: no backreferences, no
    * lookaround, no inline flags. */
  final case class Matches(column: String, pattern: String) extends Rule {
    require(!pattern.contains("(?") && !raw"\\\d".r.findFirstIn(pattern).isDefined,
      s"Matches($column): lookaround/backreferences are not portable " +
        s"across regex engines: $pattern")
    val name = s"matches($column)"
    private[operators] def rowPredicate =
      Some(col(column).isNull || col(column).rlike(pattern))
  }

  /** Escape hatch: any row-local boolean expression over the input's
    * columns. `label` keys the report row. */
  final case class Satisfies(label: String, column: String, predicate: Column)
      extends Rule {
    val name = s"satisfies($label)"
    private[operators] def rowPredicate = Some(predicate)
  }

  /** Evaluate every rule in one aggregation pass. Returns one row per
    * rule, in the given rule order:
    * `(rule string, column string, rows long, violations long,
    *   pass boolean)`. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "report: no rules given")
    val names = rules.map(_.name)
    require(names.distinct.size == names.size,
      s"report: duplicate rule names: ${names.diff(names.distinct).mkString(", ")}")

    // one conditional-sum (or distinct-count deficit) per rule, all in a
    // single agg → single scan, 1-row intermediate
    val violationCols = rules.zipWithIndex.map { case (r, i) =>
      (r.rowPredicate match {
        case Some(pred) =>
          coalesce(sum(when(pred, 0L).otherwise(1L)), lit(0L))
        case None => // Unique: surplus rows beyond one per distinct value
          coalesce(count(col(r.column)) -
            count_distinct(col(r.column)), lit(0L))
      }).as(s"_v$i")
    }
    val one = df.agg(count(lit(1)).as("_rows"), violationCols: _*)

    // explode the 1-row agg into one report row per rule (driver-free
    // pivot-to-rows over the aggregated columns)
    val ruleStructs = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), lit(r.column).as("column"),
        col(s"_v$i").as("violations"))
    }
    one.select(col("_rows").as("rows"),
        explode(array(ruleStructs: _*)).as("_r"))
      .select(col("_r.rule").as("rule"), col("_r.column").as("column"),
        col("rows"), col("_r.violations").as("violations"),
        (col("_r.violations") === 0L).as("pass"))
  }

  /** Append a `violations array<string>` column listing the name of each
    * ROW-LOCAL rule the row fails (empty array = clean row). Dataset-level
    * rules ([[Unique]]) are skipped — they have no per-row meaning without
    * a corpus-wide shuffle; check them via [[report]]. Narrow projection:
    * no shuffle, stays in whole-stage codegen. */
  def annotate(df: DataFrame, rules: Seq[Rule],
      outputCol: String = "violations"): DataFrame = {
    val rowRules = rules.flatMap(r => r.rowPredicate.map(p => (r.name, p)))
    val failed = rowRules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }
    df.withColumn(outputCol,
      if (failed.isEmpty) array().cast("array<string>")
      else filter(array(failed: _*), x => x.isNotNull))
  }

  /** Column profile — the exploratory twin of [[report]]: instead of
    * checking named expectations, MEASURE each column and return the
    * summary a pipeline author writes rules from (and a drift monitor
    * diffs run-over-run): per column `nulls` and `distinct`, plus
    * `min`/`max`/`mean` for numeric columns and `min_len`/`max_len`/
    * `avg_len` for strings; one `(_table, rows)` row for the total.
    *
    * All metrics are doubles (exact for the integer-derived ones); other
    * column types get the base metrics only.
    *
    * Scale: ONE scan. With `exact = true` the multi-column distinct
    * plans as Catalyst's Expand (one pass, rows × profiled columns wide
    * before partial aggregation) — fine for tens of columns; profile a
    * 1000-column table with `exact = false`, which swaps in
    * `approx_count_distinct` (HLL, no Expand) and keeps everything else
    * identical. Result is metric-count rows from a 1-row aggregate —
    * nothing driver-side.
    *
    * @return (`col_name`, `metric`, `value` double). */
  def profile(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    cols.foreach(c => require(df.columns.contains(c),
      s"profile: no such column '$c'"))
    import org.apache.spark.sql.types.{NumericType, StringType}
    val metrics: Seq[(String, String, Column)] = cols.flatMap { c =>
      val base = Seq(
        (c, "nulls",
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
            .cast("double")),
        (c, "distinct",
          (if (exact) count_distinct(col(c))
           else approx_count_distinct(col(c))).cast("double")))
      val typed = df.schema(c).dataType match {
        case _: NumericType => Seq(
          (c, "min", min(col(c)).cast("double")),
          (c, "max", max(col(c)).cast("double")),
          (c, "mean", avg(col(c)).cast("double")))
        case StringType => Seq(
          (c, "min_len", min(length(col(c))).cast("double")),
          (c, "max_len", max(length(col(c))).cast("double")),
          (c, "avg_len", avg(length(col(c))).cast("double")))
        case _ => Seq.empty
      }
      base ++ typed
    } :+ (("_table", "rows", count(lit(1)).cast("double")))
    val aggs = metrics.zipWithIndex.map { case ((_, _, m), i) =>
      m.as(s"_m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = metrics.zipWithIndex.map { case ((c, name, _), i) =>
      struct(lit(c).as("col_name"), lit(name).as("metric"),
        col(s"_m$i").as("value"))
    }
    one.select(explode(array(rows: _*)).as("_p"))
      .select(col("_p.col_name").as("col_name"),
        col("_p.metric").as("metric"), col("_p.value").as("value"))
  }

  /** Pearson χ² independence audit between two categorical columns —
    * "is the event mix stable across weekdays / sources / shards", the
    * categorical counterpart of [[benford]]: contingency cell counts,
    * expected under independence e = rowTot·colTot/N, per-cell
    * contribution (n − e)²/e. The caller sums `chi2` and compares to
    * the χ²((R−1)(C−1)) cutoff.
    *
    * All totals are exact longs from ONE materialized cell table (three
    * consumers — without the cut each re-runs the data-sized scan); the
    * expected value and contribution are double arithmetic on exact
    * integers, one cell at a time — no distributed float sum.
    *
    * Scale notes (100 TB): the scan partial-aggs to (cardinality A ×
    * cardinality B) cells map-side; the marginals derive from the CELLS
    * (cardinality-sized), never the data; totals are a 1-row broadcast.
    *
    * @return one row per OBSERVED cell: (`aCol`, `bCol`, `n`,
    *         `expected`, `chi2`). Unobserved cells are absent (their
    *         expected mass is the caller's structural-zero judgment,
    *         not silently added). */
  def chiSquareIndependence(df: DataFrame, aCol: String, bCol: String,
      ckpt: graft.Checkpointer = graft.Checkpointer.Local): DataFrame = {
    val cells = ckpt(df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("n")))
    val rowT = cells.groupBy(col(aCol)).agg(sum("n").as("_ra"))
    val colT = cells.groupBy(col(bCol)).agg(sum("n").as("_cb"))
    val tot = cells.agg(sum("n").as("_N"))
    val e = col("_ra").cast("double") * col("_cb").cast("double") /
      col("_N").cast("double")
    val dev = col("n").cast("double") - e
    cells.join(rowT, Seq(aCol)).join(colT, Seq(bCol))
      .crossJoin(broadcast(tot))
      .select(col(aCol), col(bCol), col("n"), e.as("expected"),
        (dev * dev / e).as("chi2"))
  }

  /** Benford's-law first-digit audit — the classic fabricated-data /
    * corrupted-feed tripwire for naturally-occurring positive amounts
    * (prices, populations, file sizes): the leading significant digit
    * of organic multi-scale data follows P(d) = log10(1 + 1/d); clerical
    * padding, unit bugs, and synthetic fills don't. Emits one row per
    * digit with observed count, both shares, and the Pearson χ²
    * contribution (n_d − N·p_d)²/(N·p_d) — the caller sums it and
    * compares against the χ²(8 df) cutoff of their chosen α.
    *
    * `valueCol` must be INTEGER-valued and is filtered to > 0 (the
    * pre-scaled convention — scaling by a power of ten never changes
    * the leading digit). The digit is taken from the integer's decimal
    * string — integer formatting is engine-portable where float
    * formatting and `log10`-near-power-boundaries are not.
    *
    * Scale notes (100 TB): one column-pruned scan partial-aggs to ≤ 9
    * rows map-side; the totals row is a 1-row broadcast. Nothing else
    * moves.
    *
    * @return (`digit` 1..9, `n`, `p_expected`, `p_observed`, `chi2`) —
    *         digits the data never hits still appear (n = 0, their full
    *         expected mass as χ²). */
  def benford(df: DataFrame, valueCol: String,
      ckpt: graft.Checkpointer = graft.Checkpointer.Local): DataFrame = {
    val spark = df.sparkSession
    val digits = spark.range(1, 10).select(col("id").as("digit"))
    val counts = ckpt(digits.join(
      df.filter(col(valueCol) > 0)
        .select(substring(col(valueCol).cast("long").cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n")),
      Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n")))
    val total = counts.agg(sum("n").as("_N"))
    val pExp = log10(lit(1.0) + lit(1.0) / col("digit"))
    val dev = col("n").cast("double") - col("_N").cast("double") * pExp
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"), pExp.as("p_expected"),
        (col("n").cast("double") / col("_N").cast("double"))
          .as("p_observed"),
        (dev * dev / (col("_N").cast("double") * pExp)).as("chi2"))
  }

  /** Gini coefficient of a non-negative integer-valued column — the
    * concentration audit ("do 1% of the domains own 90% of the tokens?")
    * that decides whether a corpus needs [[Sampling]] domain caps before
    * training. 0 = perfectly even, → 1 = one row owns everything.
    *
    * Uses the rank-sum identity `G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)`
    * but NEVER ranks the raw rows: equal values occupy a contiguous rank
    * run, so each distinct value `v` (count `c`, `lt` rows strictly
    * smaller) contributes `v·(c·lt + c(c+1)/2)` — an exact decimal(38,0)
    * sum over the value histogram. The single floating division happens
    * last, making the result partition-order independent and
    * oracle-reproducible. Ties need no tiebreak: any permutation within
    * an equal-value run has the same rank sum.
    *
    * Scale notes (100 TB): one map-side-combined groupBy collapses the
    * data onto its distinct-value histogram; the cumulative window runs
    * over THAT (thousands of rows for integer metrics, never data-sized
    * — same shape as the KS statistic's cumulative table). Callers with
    * fractional metrics pre-integerize (milli-scale) per the engine's
    * float convention.
    *
    * @return one row: (`n`, `total`, `gini`); gini is null for an empty
    *         input or an all-zero column (undefined mean). */
  def gini(df: DataFrame, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val hist = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("_v"))
      .groupBy("_v").agg(count(lit(1)).as("_c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("_v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = hist.withColumn("_lt",
      coalesce(sum(col("_c")).over(w), lit(0L)))
    val c = col("_c").cast(dec)
    val s1Term = col("_v").cast(dec) *
      (c * col("_lt").cast(dec) + (c * (c + lit(1))).cast(dec) / 2)
    val agg = ranked.agg(
      sum(col("_c").cast(dec)).cast("long").as("n"),
      sum(col("_c").cast(dec) * col("_v").cast(dec)).as("_t"),
      sum(s1Term.cast(dec)).as("_s1"))
    agg.select(col("n"), col("_t").cast("long").as("total"),
      when(col("n") === 0 || col("_t") === 0, lit(null).cast("double"))
        .otherwise(
          (lit(2).cast(dec) * col("_s1") -
            (col("n") + 1).cast(dec) * col("_t")).cast("double") /
          (col("n").cast(dec) * col("_t")).cast("double"))
        .as("gini"))
  }

  /** Join-key skew report — the pre-flight check before any big join or
    * aggregation at scale: "how concentrated is this key?" One row of
    * the numbers that decide between a plain hash join, salting, and a
    * broadcast: total rows, distinct keys, the heaviest key's count and
    * share, and the [[gini]] concentration of the per-key count
    * distribution (0 = perfectly uniform keys, →1 = one key owns the
    * table).
    *
    * Exactness: counts exact longs; `max_share` is one double division;
    * the Gini runs on the per-key count HISTOGRAM through [[gini]]'s
    * exact rank-run arithmetic.
    *
    * Scale notes (100 TB): one partial-agg to the per-key count table,
    * then two 1-row aggregates (the count histogram [[gini]] feeds on is
    * distinct-COUNT-VALUE-sized — tiny); nothing returns to the driver.
    *
    * @return one row: (`n_rows`, `n_keys`, `max_count`, `max_share`,
    *         `count_gini` — null when every key count is 0-mass). */
  /** Functional-dependency violation report — the profiling check
    * behind "should det → dep hold?": every determinant-column value
    * combination that maps to MORE than one dependent value, with the
    * dependent cardinality and the row count it covers. A null
    * dependent counts as its own value (a group with {null, 'x'} IS a
    * violation — the FD claims one value, the data shows two states);
    * rows with a null determinant are excluded (SQL-standard FD
    * semantics: nulls don't determine anything).
    *
    * Scale notes (100 TB): one groupBy on the determinant columns —
    * `count_distinct` is Spark's two-phase expand-aggregate, and the
    * null flag is a plain max, both map-side combinable; output is
    * violations only, so the frame that leaves the aggregation is the
    * (usually tiny) defect list, not the key space.
    *
    * @return (detCols…, `n_dep_values`, `n_rows`), violations only */
  def fdViolations(df: DataFrame, detCols: Seq[String],
      depCol: String): DataFrame = {
    require(detCols.nonEmpty, "fdViolations needs >= 1 determinant col")
    df.filter(detCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(detCols.map(col): _*)
      .agg((countDistinct(col(depCol)) +
          max(when(col(depCol).isNull, 1L).otherwise(0L)))
          .as("n_dep_values"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_dep_values") > 1)
  }

  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("_c"))
    val stats = counts.agg(
      sum(col("_c")).cast("long").as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("_c")).as("max_count"))
    stats.crossJoin(broadcast(
        gini(counts, "_c").select(col("gini").as("count_gini"))))
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        (col("max_count").cast("double") / col("n_rows").cast("double"))
          .as("max_share"),
        col("count_gini"))
  }

  /** Shannon entropy of a categorical column, per group — the
    * "how diverse is this source's language/domain mix?" audit, and the
    * balance check before mixture sampling (low entropy = one value
    * dominates; log₂ units, so a uniform 2ᵏ-way mix scores exactly k).
    *
    * H = ln(N) − (Σ c·ln c)/N over the per-value counts c — the
    * algebraically-identical regrouping of −Σ p·ln p that needs ONE
    * pass over the count table and no per-row p division. Each `ln c`
    * is 1e9-integerized and the c·ln c terms sum in decimal(38,0) (the
    * powerLawFit discipline — a raw double sum is partial-agg
    * merge-order dependent); the single division and the nats→bits
    * scale happen once at the end.
    *
    * Scale notes (100 TB): one partial-agg to (group, value) counts,
    * one partial-agg to group term-sums — the raw corpus never moves
    * twice; both tables are cardinality-bounded, not row-bounded.
    *
    * @return (`groupCol`, `n`, `n_distinct`, `entropy_bits` — 0 for a
    *         single-valued group; null rows are excluded). */
  def entropy(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val counts = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_c"))
    val lnE9 = floor(log(col("_c").cast("double")) * lit(1e9) +
      lit(0.5)).cast(dec)
    counts.groupBy(col(groupCol)).agg(
        sum(col("_c").cast(dec)).cast("double").as("_n"),
        sum(col("_c").cast(dec)).cast("long").as("n"),
        count(lit(1)).as("n_distinct"),
        sum(col("_c").cast(dec) * lnE9).as("_s_e9"))
      .select(col(groupCol), col("n"), col("n_distinct"),
        ((log(col("_n")) -
          col("_s_e9").cast("double") / lit(1e9) / col("_n")) /
          log(lit(2.0))).as("entropy_bits"))
  }

  /** Pairwise Pearson correlation matrix over `cols` — the one-scan
    * multicollinearity audit ("which signals are redundant?") feeding
    * feature selection and drift comparisons. Columns must be
    * integer-valued (pre-scaled by the caller — the engine-wide
    * exactness discipline): every moment accumulates exact in
    * decimal(38,0) in ONE aggregate over one scan, and each pair's
    * correlation runs once in double with the variance-PRODUCT null
    * guard (the [[graft.operators.TimeSeries.autocorrelation]]
    * contract). Rows with a null in ANY of `cols` are dropped
    * (listwise-complete — every pair sees the same n, so the matrix is
    * positive-semidefinite-consistent).
    *
    * Scale notes (100 TB): one narrow scan, one partial-agg to a single
    * row of k·(k+3)/2 moments; the pair explosion happens on that 1-row
    * frame — nothing shuffles but the aggregate tree.
    *
    * @return (`col_a`, `col_b`, `n`, `r`) for each pair in `cols` order
    *         (i < j), r null when either side has zero variance. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns (got ${cols.size})")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    val dec = "decimal(38,0)"
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c => col(c).cast("long").as(c)): _*)
    val singles = cols.flatMap(c => Seq(
      sum(col(c).cast(dec)).cast("double").as(s"_s_$c"),
      sum(col(c).cast(dec) * col(c).cast(dec)).cast("double").as(s"_q_$c")))
    val pairsIdx = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val crosses = pairsIdx.map { case (a, b) =>
      sum(col(a).cast(dec) * col(b).cast(dec)).cast("double").as(s"_x_${a}_$b") }
    val aggCols = count(lit(1)).as("_cnt") +:
      count(lit(1)).cast("double").as("_n") +: (singles ++ crosses)
    val m = complete.agg(aggCols.head, aggCols.tail: _*)
    val pairRows = pairsIdx.map { case (a, b) =>
      val va = col("_n") * col(s"_q_$a") - col(s"_s_$a") * col(s"_s_$a")
      val vb = col("_n") * col(s"_q_$b") - col(s"_s_$b") * col(s"_s_$b")
      val cov = col("_n") * col(s"_x_${a}_$b") -
        col(s"_s_$a") * col(s"_s_$b")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("_cnt").as("n"),
        when(col("_cnt") < 2 || va * vb <= 0.0,
            lit(null).cast("double"))
          .otherwise(cov / sqrt(va * vb)).as("r"))
    }
    m.select(explode(array(pairRows: _*)).as("_p"))
      .select(col("_p.col_a").as("col_a"), col("_p.col_b").as("col_b"),
        col("_p.n").as("n"), col("_p.r").as("r"))
  }

  /** Spearman rank correlation of two integer-valued columns — the
    * monotonic-association audit that survives outliers and nonlinear
    * scalings where Pearson ([[correlationMatrix]]) does not. Average
    * tie ranks are DOUBLED so they stay integers (`r₂ = 2·lt + cnt +
    * 1` for a value with `cnt` copies and `lt` smaller rows; the ×2
    * cancels inside the correlation), and come from the [[gini]]
    * rank-run trick: a cumulative window over the DISTINCT-VALUE
    * histogram, never a row-level rank — so no per-row window sort at
    * any scale. Moments then accumulate exactly in decimal(38,0)
    * (`r₂ ≤ 2n`, so `Σ r₂ᵤ·r₂ᵥ ≤ 4n³` — inside decimal range beyond
    * 10^11 rows) and rho runs once in double with the
    * variance-product null guard. Rows with a null in either column
    * drop (pairwise-complete).
    *
    * Scale notes (100 TB): two value-histogram aggregates (map-side
    * combined), two cumulative windows over those SMALL distinct
    * tables, two equi-joins back, one 1-row moment aggregate.
    *
    * @return one row: (`n`, `rho`); rho null when either side is
    *         constant. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val complete = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("_x"),
        col(yCol).cast("long").as("_y"))
    def rank2(c: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(c))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      complete.groupBy(col(c)).agg(count(lit(1)).as("_cnt"))
        .withColumn("_lt", coalesce(sum("_cnt").over(w), lit(0L)))
        .select(col(c), (col("_lt") * 2 + col("_cnt") + 1).as(s"_r$c"))
    }
    val ranked = complete
      .join(rank2("_x"), Seq("_x"))
      .join(rank2("_y"), Seq("_y"))
    val m = ranked.agg(
      count(lit(1)).as("_cnt"),
      count(lit(1)).cast("double").as("_n"),
      sum(col("_r_x").cast(dec)).cast("double").as("_su"),
      sum(col("_r_y").cast(dec)).cast("double").as("_sv"),
      sum(col("_r_x").cast(dec) * col("_r_y").cast(dec)).cast("double")
        .as("_suv"),
      sum(col("_r_x").cast(dec) * col("_r_x").cast(dec)).cast("double")
        .as("_suu"),
      sum(col("_r_y").cast(dec) * col("_r_y").cast(dec)).cast("double")
        .as("_svv"))
    val vu = col("_n") * col("_suu") - col("_su") * col("_su")
    val vv = col("_n") * col("_svv") - col("_sv") * col("_sv")
    val cov = col("_n") * col("_suv") - col("_su") * col("_sv")
    m.select(col("_cnt").as("n"),
      when(col("_cnt") < 2 || vu * vv <= 0.0, lit(null).cast("double"))
        .otherwise(cov / sqrt(vu * vv)).as("rho"))
  }

  /** Kendall τ-b rank correlation — the third association audit beside
    * Pearson ([[correlationMatrix]]) and Spearman: counts CONCORDANT
    * vs DISCORDANT pairs, with the tie-adjusted denominator
    * √((n₀−n₁)(n₀−n₂)). More robust than Spearman to a few wild ranks
    * (pair counts move by 1, squared rank gaps explode) and the
    * standard drift audit when both columns are ordinal.
    *
    * EXACT, with no O(n²) pass over rows: concordance depends only on
    * the JOINT (x, y) VALUE histogram — a pair of distinct cells
    * (c₁, c₂ rows) contributes c₁·c₂ pairs wholesale, same-cell pairs
    * tie in both. So the quadratic work runs over distinct-cell PAIRS
    * (output complexity: intended for aggregated/bounded-cardinality
    * frames — pre-bin raw measures, as every rank audit here does);
    * tie terms n₁/n₂ come from the marginal histograms. All counts
    * accumulate in decimal(38,0); τ runs once in double.
    *
    * Scale notes: one histogram aggregate (map-side combined), one
    * cell-pair nested-loop join (broadcast — the histogram is small
    * by contract), two marginal aggregates, a 1-row fold.
    *
    * @return one row: (`n`, `n_conc`, `n_disc`, `tau` — null when a
    *         side is constant) */
  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val h = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("_x"),
        col(yCol).cast("long").as("_y"))
      .groupBy("_x", "_y").agg(count(lit(1)).cast(dec).as("_c"))
      .localCheckpoint()
    val a = h.select(col("_x").as("_xa"), col("_y").as("_ya"),
      col("_c").as("_ca"))
    val b = h.select(col("_x").as("_xb"), col("_y").as("_yb"),
      col("_c").as("_cb"))
    val pairs = a.join(broadcast(b),
      struct(col("_xa"), col("_ya")) < struct(col("_xb"), col("_yb")))
    val cd = pairs.agg(
      sum(when((col("_xa") < col("_xb") && col("_ya") < col("_yb")) ||
          (col("_xa") > col("_xb") && col("_ya") > col("_yb")),
        col("_ca") * col("_cb")).otherwise(lit(0).cast(dec)))
        .as("_nc"),
      sum(when((col("_xa") < col("_xb") && col("_ya") > col("_yb")) ||
          (col("_xa") > col("_xb") && col("_ya") < col("_yb")),
        col("_ca") * col("_cb")).otherwise(lit(0).cast(dec)))
        .as("_nd"))
    def tiePairs(c: String) = h.groupBy(col(c))
      .agg(sum(col("_c")).as("_t"))
      .agg(coalesce(sum(col("_t") * (col("_t") - 1)),
        lit(0).cast(dec)).as("_tp2")) // 2× the tie pairs
    val nRow = h.agg(coalesce(sum(col("_c")), lit(0).cast(dec)).as("_n"))
    val m = nRow.crossJoin(cd)
      .crossJoin(tiePairs("_x").withColumnRenamed("_tp2", "_tx2"))
      .crossJoin(tiePairs("_y").withColumnRenamed("_tp2", "_ty2"))
    // everything ×2 until the end so the arithmetic stays integral:
    // 2n₀ = n(n−1), 2n₁ = Σtₓ(tₓ−1), 2n₂ = Σt_y(t_y−1)
    val n02 = col("_n") * (col("_n") - 1)
    val du = (n02 - col("_tx2")).cast("double")
    val dv = (n02 - col("_ty2")).cast("double")
    m.select(col("_n").cast("long").as("n"),
      coalesce(col("_nc"), lit(0).cast(dec)).cast("long").as("n_conc"),
      coalesce(col("_nd"), lit(0).cast(dec)).cast("long").as("n_disc"),
      when(du <= 0.0 || dv <= 0.0, lit(null).cast("double"))
        .otherwise(
          (coalesce(col("_nc"), lit(0).cast(dec)) -
            coalesce(col("_nd"), lit(0).cast(dec))).cast("double") * 2.0 /
            sqrt(du * dv)).as("tau"))
  }
}
