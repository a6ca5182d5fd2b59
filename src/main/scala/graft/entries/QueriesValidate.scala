package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.GraphConfig
import graft.functions.{GraftFunctions => GF, VectorFunctions => VF}
import graft.operators._
import graft.streaming.StreamingIngest

/** validation + outlier tiers V1-V17, O1-O5 (rules, drift, distribution stats, HBOS, skyline) — one slice of the [[SparkEntry]] driver contract
  * (23 queries). Chunks moved verbatim from SparkEntry.scala;
  * the assembled `queries`/`oracleSql` maps are unchanged. */
private[graft] object QueriesValidate {
  import EntryData._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- V3: PSI distribution drift between the even- and odd-id halves
    // of the events table (a deterministic two-snapshot split); per-bin
    // contribution e6-integerized, counts exact ----
    "q_v3_psi" -> ((s, dir) => {
      val e = events(s, dir)
      SnapshotDiff.psiDrift(
          e.filter(col("event_id") % 2 === 0),
          e.filter(col("event_id") % 2 === 1),
          "value", nBins = 10, lo = 0.0, hi = 500.0)
        .select(col("bin"), col("n_prev"), col("n_cur"),
          floor(col("psi") * lit(1e6) + lit(0.5)).cast("long")
            .as("psi_e6"))
        .orderBy("bin")
    }),

    // ---- O4: median/MAD robust outliers on event values per type —
    // the 50%-breakdown detector; k=1.3 suits the uniform-ish values
    // (3.5 is the normal-data convention) ----
    "q_o4_outliers_mad" -> ((s, dir) =>
      Outliers.mad(t(s, dir, "events")
          .select("event_id", "event_type", "value"),
        "value", Seq("event_type"), k = 1.3)
        .filter(col("is_outlier"))
        .select(col("event_id"), col("event_type"), col("value"),
          floor(col("med") * lit(1e4) + lit(0.5)).cast("long")
            .as("med_e4"),
          floor(col("mad") * lit(1e4) + lit(0.5)).cast("long")
            .as("mad_e4"),
          floor(col("robust_z") * lit(1e4) + lit(0.5)).cast("long")
            .as("rz_e4"))
        .orderBy("event_id")),

    // ---- V13: join-key skew report for lineitem's part key — the
    // pre-flight numbers (heaviest share, count Gini) that pick between
    // hash join, salting, and broadcast ----
    "q_v13_skew_report" -> ((s, dir) =>
      Validate.skewReport(t(s, dir, "lineitem"), "l_partkey")
        .select(col("n_rows"), col("n_keys"), col("max_count"),
          floor(col("max_share") * lit(1e6) + lit(0.5)).cast("long")
            .as("share_e6"),
          floor(col("count_gini") * lit(1e6) + lit(0.5)).cast("long")
            .as("gini_e6"))
        .orderBy("n_rows")),

    // ---- V14: mergeable HDR quantile sketch over price cents per
    // return flag — the bounded-state p50/p95/p99 (exact integer
    // octave/sub-bucket math from bin-string length, so the sketch is
    // partition-order independent AND engine-portable; contrast
    // q_x4d's exact sort-based percentiles) ----
    "q_v14_hdr_quantiles" -> ((s, dir) =>
      Quantiles.hdrQuantiles(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          (col("l_extendedprice") * 100).cast("long").as("cents")),
        "cents", Seq(0.5, 0.95, 0.99), k = 16,
        groupCol = Some("l_returnflag"))
        .orderBy("l_returnflag", "q_e6")),

    // ---- V12: per-source Shannon entropy of the language mix — the
    // diversity audit; 1e9-integerized ln terms in decimal so the sum
    // is partition-order independent ----
    "q_v12_entropy" -> ((s, dir) =>
      Validate.entropy(t(s, dir, "documents"), "source", "lang")
        .select(col("source"), col("n"), col("n_distinct"),
          floor(col("entropy_bits") * lit(1e6) + lit(0.5)).cast("long")
            .as("entropy_e6"))
        .orderBy("source")),

    // ---- V15: Spearman rank correlation of quantity vs price — the
    // outlier-proof monotonic-association audit; doubled average-tie
    // ranks from the distinct-value histogram (integers end to end),
    // exact decimal moments, one double division ----
    "q_v15_spearman" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("qty"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long")
          .as("price"))
      Validate.spearman(li, "qty", "price")
        .select(col("n"),
          floor(col("rho") * lit(1e6) + lit(0.5)).cast("long")
            .as("rho_e6"))
        .orderBy("n")
    }),

    // ---- V18: Kendall τ-b over per-bucket order aggregates (spend
    // vs order count) — the third association audit beside Pearson
    // and Spearman; concordance counted EXACTLY over the joint
    // value-histogram cell pairs (never an O(n²) row pass), ties
    // adjusted from the marginal histograms, everything integral
    // until one double division ----
    "q_v18_kendall" -> ((s, dir) => {
      val g = t(s, dir, "orders")
        .select((col("o_custkey") % 500).as("b"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("_cents"))
        .groupBy("b")
        .agg(expr("sum(_cents) div 100000").as("x"),
          count(lit(1)).as("y"))
      Validate.kendallTau(g, "x", "y")
        .select(col("n"), col("n_conc"), col("n_disc"),
          floor(col("tau") * lit(1e6) + lit(0.5)).cast("long")
            .as("tau_e6"))
        .orderBy("n")
    }),

    // ---- V11: pairwise correlation matrix over lineitem's numeric
    // columns — one scan, exact decimal moments, e6-integerized r ----
    "q_v11_corr_matrix" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("qty"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long")
          .as("price"),
        floor(col("l_discount") * 10000 + 0.5).cast("long").as("disc"),
        floor(col("l_tax") * 10000 + 0.5).cast("long").as("tax"))
      Validate.correlationMatrix(li, Seq("qty", "price", "disc", "tax"))
        .select(col("col_a"), col("col_b"), col("n"),
          floor(col("r") * lit(1e6) + lit(0.5)).cast("long").as("r_e6"))
        .orderBy("col_a", "col_b")
    }),

    // ---- O3: Pareto skyline of parts — cheapest-for-their-size
    // frontier (minimize price cents, maximize size via negation);
    // bucket-prune + exact refine, dominance on exact integers ----
    "q_o3_skyline" -> ((s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"),
        floor(col("p_retailprice") * 100 + 0.5).cast("long")
          .as("price_cents"),
        (-col("p_size")).cast("long").as("neg_size"))
      Skyline.skyline2D(p, "price_cents", "neg_size")
        .select(col("p_partkey"), col("price_cents"), col("neg_size"))
        .orderBy("p_partkey")
    }),

    // ---- O5: multivariate HBOS outliers over four lineitem features —
    // a row is flagged when it sits in rare histogram bins across
    // several features at once (no single feature need be extreme).
    // The score is the exact integer product Π maxcount/count carried
    // in decimal(38,0) with ONE double division at the end, so the
    // oracle (HUGEINT products, same single division) is bit-equal
    // without any libm log parity concerns. ----
    "q_o5_hbos" -> ((s, dir) =>
      Outliers.hbos(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          bins = 20, threshold = 4.5)
        .filter(col("is_outlier"))
        .select(col("l_orderkey"), col("l_linenumber").cast("long")
            .as("l_linenumber"),
          floor(col("hbos") * lit(1e6) + lit(0.5)).as("hbos_e6"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- V16: functional-dependency violation report — does
    // l_partkey determine l_suppkey? (No: parts ship from several
    // suppliers; every violating part surfaces with its supplier
    // cardinality and row coverage.) ----
    "q_v16_fd_violations" -> ((s, dir) =>
      Validate.fdViolations(t(s, dir, "lineitem"),
          Seq("l_partkey"), "l_suppkey")
        .orderBy("l_partkey")),

    // ---- V17: schema drift report — the metadata contract check a
    // scheduled ingest runs before trusting a new drop: one projection
    // plays "previous" (doc_id, n_chars bigint, text), the other
    // "current" (doc_id, n_chars double, lang) — one added, one
    // removed, one type-changed column; the oracle is the literal
    // expected report. ----
    "q_v17_schema_drift" -> ((s, dir) => {
      val prev = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), col("text"))
      val cur = t(s, dir, "documents").select(col("doc_id"),
        col("n_chars").cast("double").as("n_chars"), col("lang"))
      SnapshotDiff.schemaDrift(prev, cur).orderBy("col_name", "change")
    }),

    // ---- V5: SCD2 history — collapse each user's event_type log into
    // validity intervals (gaps-and-islands); run_seq disambiguates
    // same-second run boundaries ----
    "q_v5_scd2" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("event_type"))
      SnapshotDiff.scd2(e, "user_id", "es", "event_id",
          Seq("event_type"))
        .orderBy("user_id", "run_seq")
    }),

    // ---- V7: χ² independence of event_type × weekday — the weekday is
    // pure integer epoch arithmetic ((days + 4) % 7; 1970-01-01 was a
    // Thursday), never an engine-local calendar function ----
    "q_v7_chi2" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_type"),
        expr("(unix_timestamp(ts) div 86400 + 4) % 7").as("dow"))
      Validate.chiSquareIndependence(e, "event_type", "dow")
        .select(col("event_type"), col("dow"), col("n"),
          floor(col("expected") * lit(1e6) + lit(0.5)).as("exp_e6"),
          floor(col("chi2") * lit(1e6) + lit(0.5)).as("chi2_e6"))
        .orderBy("event_type", "dow")
    }),

    // ---- V6: exact two-sample KS between the even/odd event halves —
    // the statistic is pure integer arithmetic until ONE final
    // division; at_value is raw data passthrough ----
    "q_v6_ks" -> ((s, dir) => {
      val e = events(s, dir)
      SnapshotDiff.ksTest(
          e.filter(col("event_id") % 2 === 0),
          e.filter(col("event_id") % 2 === 1), "value")
        .select(col("n_prev"), col("n_cur"),
          floor(col("d_stat") * lit(1e6) + lit(0.5)).cast("long")
            .as("d_e6"),
          col("at_value"))
    }),

    // ---- V9: Welch unequal-variance t-test between the even/odd event
    // halves over milli-integerized values — moments exact in
    // decimal(38,0), t/df a fixed double-op chain, e4 ----
    "q_v9_welch_t" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"),
        floor(col("value") * 1000 + 0.5).cast("long").as("v"))
      SnapshotDiff.welchT(
          e.filter(col("event_id") % 2 === 0),
          e.filter(col("event_id") % 2 === 1), "v")
        .select(col("n_prev"), col("n_cur"),
          floor(col("mean_prev") * lit(1e4) + lit(0.5)).cast("long")
            .as("mp_e4"),
          floor(col("mean_cur") * lit(1e4) + lit(0.5)).cast("long")
            .as("mc_e4"),
          floor(col("t_stat") * lit(1e4) + lit(0.5)).cast("long")
            .as("t_e4"),
          floor(col("df") * lit(1e4) + lit(0.5)).cast("long")
            .as("df_e4"))
    }),

    // ---- V10: Mann–Whitney U rank test on the same split — rank-run
    // arithmetic exact on the distinct-value histogram (2·U1 is an
    // integer), z the single float, e4 ----
    "q_v10_mannwhitney" -> ((s, dir) => {
      val e = events(s, dir).select(col("event_id"),
        floor(col("value") * 1000 + 0.5).cast("long").as("v"))
      SnapshotDiff.mannWhitneyU(
          e.filter(col("event_id") % 2 === 0),
          e.filter(col("event_id") % 2 === 1), "v")
        .select(col("n_prev"), col("n_cur"), col("u2_stat"),
          floor(col("z_stat") * lit(1e4) + lit(0.5)).cast("long")
            .as("z_e4"))
    }),

    // ---- V8: Gini concentration of events-per-user — rank-sum moments
    // collapse onto the distinct-count histogram and sum exactly in
    // decimal(38,0); the coefficient is ONE double division, e6 ----
    "q_v8_gini" -> ((s, dir) => {
      val perUser = events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"))
      Validate.gini(perUser, "n_events")
        .select(col("n"), col("total"),
          floor(col("gini") * lit(1e6) + lit(0.5)).cast("long")
            .as("gini_e6"))
    }),

    // ---- V4: Benford first-digit audit over milli-integerized prices —
    // digit from the INTEGER's decimal string (portable where float
    // formatting and log10-at-power-boundaries are not) ----
    "q_v4_benford" -> ((s, dir) =>
      Validate.benford(
          t(s, dir, "lineitem").select(
            floor(col("l_extendedprice") * 1000 + 0.5).cast("long")
              .as("v")),
          "v")
        .select(col("digit"), col("n"),
          floor(col("p_expected") * lit(1e6) + lit(0.5)).as("p_exp_e6"),
          floor(col("p_observed") * lit(1e6) + lit(0.5)).as("p_obs_e6"),
          floor(col("chi2") * lit(1e6) + lit(0.5)).as("chi2_e6"))
        .orderBy("digit")),

    // ---- V1: declarative data-quality report — every rule evaluated in
    // ONE aggregation pass (map-side partials, 1-row intermediate); the
    // Unique rule is the only one needing a (single-column) shuffle. The
    // regex sticks to the portable subset so Java regex ≡ RE2. ----
    "q_v1_validate" -> ((s, dir) =>
      Validate.report(t(s, dir, "orders"), Seq(
        Validate.NotNull("o_orderkey"), Validate.Unique("o_orderkey"),
        Validate.NotNull("o_custkey"),
        Validate.InSet("o_orderstatus", Seq("O", "F", "P")),
        Validate.InRange("o_totalprice", 0.0, 1e6),
        Validate.Matches("o_orderpriority", "^[1-5]-[A-Z ]+$")))
        .orderBy("rule")),

    // ---- V2: column profiler — one-scan per-column summary (nulls,
    // distinct, numeric min/max/mean, string length stats); every value
    // derives from exact integer sums, so the e4 integerization is
    // lossless ----
    "q_v2_profile" -> ((s, dir) =>
      Validate.profile(t(s, dir, "documents"),
          Seq("doc_id", "text", "lang", "source", "n_chars"))
        .select(col("col_name"), col("metric"),
          floor(col("value") * lit(1e4) + lit(0.5)).cast("long")
            .as("value_e4"))
        .orderBy("col_name", "metric")),

    // ---- V1b: row-level quarantine tags — narrow projection appending
    // the failed-rule list per row; counts by tag-set certify the
    // annotate path against the SQL rebuild. ----
    "q_v1b_quarantine" -> ((s, dir) =>
      Validate.annotate(t(s, dir, "orders"), Seq(
        Validate.InSet("o_orderstatus", Seq("O", "F")),
        Validate.InRange("o_totalprice", 0.0, 150000.0)))
        .select(col("o_orderkey"),
          concat_ws(",", col("violations")).as("tags"))
        .orderBy("o_orderkey")),

    // ---- O1: robust (Tukey-fence) outlier flags on the long-tailed
    // event values per type — exact interpolated quartiles (percentile ≡
    // DuckDB quantile_cont, the q_x4d equivalence), fences integerized
    // e4; only flagged rows emitted ----
    "q_o1_outliers_iqr" -> ((s, dir) =>
      Outliers.iqr(t(s, dir, "events")
          .select("event_id", "event_type", "value"),
        "value", Seq("event_type"), k = 1.5)
        .filter(col("is_outlier"))
        .select(col("event_id"), col("event_type"), col("value"),
          floor(col("lo_fence") * lit(1e4) + lit(0.5)).as("lo_e4"),
          floor(col("hi_fence") * lit(1e4) + lit(0.5)).as("hi_e4"))
        .orderBy("event_id")),

    // ---- O2: z-score outliers on order totals per status — μ/σ drift
    // between engines' partial-agg merge orders is absorbed by e4
    // integerization; totals are ~uniform on [1e3, 5e5] so |z| caps near
    // 1.73 — 1.7 flags the tails (2.5 would be structurally empty) ----
    "q_o2_outliers_z" -> ((s, dir) =>
      Outliers.zscore(t(s, dir, "orders"), "o_totalprice",
        Seq("o_orderstatus"), threshold = 1.7)
        .filter(col("is_outlier"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          floor(col("zscore") * lit(1e4) + lit(0.5)).as("z_e4"))
        .orderBy("o_orderkey")),
  )

  def oracles: Map[String, String] = Map(
    // FD check rebuild: distinct dependent count + explicit null-state
    // flag, violations only.
    "q_v16_fd_violations" ->
      """SELECT l_partkey,
        |  (count(DISTINCT l_suppkey)
        |    + max(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END))
        |    AS n_dep_values,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_partkey IS NOT NULL
        |GROUP BY 1
        |HAVING (count(DISTINCT l_suppkey)
        |  + max(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)) > 1
        |ORDER BY l_partkey""".stripMargin,

    // The drift report is fully determined by the two projections, so
    // the oracle is the literal expected rows.
    "q_v17_schema_drift" ->
      """SELECT * FROM (VALUES
        |  ('lang', 'added', CAST(NULL AS VARCHAR), 'string'),
        |  ('n_chars', 'type_changed', 'bigint', 'double'),
        |  ('text', 'removed', 'string', CAST(NULL AS VARCHAR)))
        |  AS t(col_name, change, prev_type, cur_type)
        |ORDER BY col_name, change""".stripMargin,

    // SCD2 rebuild: the same gaps-and-islands — null-safe change flag
    // (IS DISTINCT FROM), running segment sum in the same (user, es,
    // event_id) order, lead over the per-key runs by segment id.
    "q_v5_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) AS es, event_id,
        |    event_type
        |  FROM events),
        |l AS (
        |  SELECT user_id, es, event_id, event_type,
        |    CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
        |      THEN 1 ELSE 0 END AS chg
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
        |s AS (
        |  SELECT user_id, es, event_id, event_type,
        |    sum(chg) OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS seg
        |  FROM l),
        |r AS (
        |  SELECT user_id, seg, min(es) AS valid_from,
        |    CAST(count(*) AS BIGINT) AS n_obs,
        |    min(event_type) AS event_type
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(row_number() OVER w2 AS BIGINT) AS run_seq,
        |  valid_from,
        |  lead(valid_from) OVER w2 AS valid_to,
        |  n_obs, event_type
        |FROM r
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY seg)
        |ORDER BY user_id, run_seq""".stripMargin,

    // χ² rebuild: same integer weekday, cell/marginal/total counts
    // exact, mirrored expected/χ² shapes.
    "q_v7_chi2" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    (((epoch_ns(ts) // 1000000000) // 86400) + 4) % 7 AS dow
        |  FROM events),
        |cells AS (
        |  SELECT event_type, dow, count(*) AS n FROM ev GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS ra
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT dow, CAST(sum(n) AS BIGINT) AS cb
        |       FROM cells GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
        |f AS (
        |  SELECT c.event_type, c.dow, c.n,
        |    CAST(rt.ra AS DOUBLE) * CAST(ct.cb AS DOUBLE)
        |      / CAST(t.nn AS DOUBLE) AS e
        |  FROM cells c JOIN rt USING (event_type) JOIN ct USING (dow), t)
        |SELECT event_type, dow, n,
        |  CAST(floor(e * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS exp_e6,
        |  CAST(floor((CAST(n AS DOUBLE) - e) * (CAST(n AS DOUBLE) - e)
        |    / e * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS chi2_e6
        |FROM f
        |ORDER BY event_type, dow""".stripMargin,

    // KS rebuild: distinct-value count tables, one cumulative window,
    // HUGEINT cross-products, argmax by (gap DESC, v) — exact until the
    // single final division.
    "q_v6_ks" ->
      """WITH c1 AS (
        |  SELECT value AS v, count(*) AS k1 FROM events
        |  WHERE event_id % 2 = 0 GROUP BY 1),
        |c2 AS (
        |  SELECT value AS v, count(*) AS k2 FROM events
        |  WHERE event_id % 2 = 1 GROUP BY 1),
        |m AS (
        |  SELECT v, coalesce(k1, 0) AS k1, coalesce(k2, 0) AS k2
        |  FROM c1 FULL OUTER JOIN c2 USING (v)),
        |t AS (
        |  SELECT CAST(sum(k1) AS HUGEINT) AS n1,
        |    CAST(sum(k2) AS HUGEINT) AS n2
        |  FROM m),
        |g AS (
        |  SELECT v,
        |    CAST(sum(k1) OVER w AS HUGEINT) AS c1,
        |    CAST(sum(k2) OVER w AS HUGEINT) AS c2
        |  FROM m
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |r AS (
        |  SELECT v, abs(c1 * t.n2 - c2 * t.n1) AS gap, t.n1, t.n2,
        |    row_number() OVER (ORDER BY abs(c1 * t.n2 - c2 * t.n1) DESC,
        |      v) AS rn
        |  FROM g, t)
        |SELECT CAST(n1 AS BIGINT) AS n_prev, CAST(n2 AS BIGINT) AS n_cur,
        |  CAST(floor(CAST(gap AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) * 1e6
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS d_e6,
        |  v AS at_value
        |FROM r WHERE rn = 1""".stripMargin,

    // Welch rebuild: identical milli-integerization, exact HUGEINT
    // moments per half, then the same double chain — (q − s²/n)/(n−1)
    // variances, se², t, Welch–Satterthwaite df — operand for operand.
    "q_v9_welch_t" ->
      """WITH v AS (
        |  SELECT event_id,
        |    CAST(floor(value * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS v
        |  FROM events),
        |m1 AS (
        |  SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS s,
        |    sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS q
        |  FROM v WHERE event_id % 2 = 0 AND v IS NOT NULL),
        |m2 AS (
        |  SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS s,
        |    sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS q
        |  FROM v WHERE event_id % 2 = 1 AND v IS NOT NULL),
        |d AS (
        |  SELECT CAST(m1.n AS BIGINT) AS n1, CAST(m2.n AS BIGINT) AS n2,
        |    CAST(m1.n AS DOUBLE) AS n1d, CAST(m1.s AS DOUBLE) AS s1d,
        |    CAST(m1.q AS DOUBLE) AS q1d,
        |    CAST(m2.n AS DOUBLE) AS n2d, CAST(m2.s AS DOUBLE) AS s2d,
        |    CAST(m2.q AS DOUBLE) AS q2d
        |  FROM m1, m2),
        |w AS (
        |  SELECT n1, n2, n1d, n2d, s1d, s2d,
        |    (q1d - s1d * s1d / n1d) / (n1d - 1.0) AS v1,
        |    (q2d - s2d * s2d / n2d) / (n2d - 1.0) AS v2
        |  FROM d),
        |w2 AS (SELECT *, v1 / n1d + v2 / n2d AS se2 FROM w)
        |SELECT n1 AS n_prev, n2 AS n_cur,
        |  CAST(floor(s1d / n1d * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS mp_e4,
        |  CAST(floor(s2d / n2d * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS mc_e4,
        |  CAST(floor((s1d / n1d - s2d / n2d) / sqrt(se2) * 1e4
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS t_e4,
        |  CAST(floor(se2 * se2
        |    / ((v1 / n1d) * (v1 / n1d) / (n1d - 1.0)
        |      + (v2 / n2d) * (v2 / n2d) / (n2d - 1.0)) * 1e4
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS df_e4
        |FROM w2""".stripMargin,

    // Mann–Whitney rebuild: distinct-value histogram with per-side
    // counts, strictly-smaller cumulative window, exact 2·R1 and tie
    // moments in HUGEINT, z's double shape mirrored.
    "q_v10_mannwhitney" ->
      """WITH v AS (
        |  SELECT event_id,
        |    CAST(floor(value * 1000 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS v
        |  FROM events),
        |h AS (
        |  SELECT v AS val,
        |    sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS k1,
        |    sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS k2
        |  FROM v WHERE v IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT CAST(k1 AS HUGEINT) AS k1,
        |    CAST(k1 + k2 AS HUGEINT) AS c,
        |    CAST(coalesce(sum(k1 + k2) OVER (ORDER BY val
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS HUGEINT) AS lt,
        |    CAST(k2 AS HUGEINT) AS k2
        |  FROM h),
        |a AS (
        |  SELECT sum(k1) AS n1, sum(k2) AS n2,
        |    sum(k1 * (lt * 2 + c + 1)) AS r2,
        |    sum(c * c * c - c) AS tie
        |  FROM r),
        |b AS (
        |  SELECT CAST(n1 AS BIGINT) AS n_prev, CAST(n2 AS BIGINT)
        |      AS n_cur,
        |    r2 - n1 * (n1 + 1) AS u2,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |    CAST(n1 + n2 AS DOUBLE) AS nnd, CAST(tie AS DOUBLE) AS tied
        |  FROM a),
        |f AS (
        |  SELECT *, n1d * n2d * ((nnd + 1.0)
        |    - tied / (nnd * (nnd - 1.0))) AS var12
        |  FROM b)
        |SELECT n_prev, n_cur, CAST(u2 AS BIGINT) AS u2_stat,
        |  CAST(floor((CAST(u2 AS DOUBLE) - n1d * n2d)
        |    / (2.0 * sqrt(var12 / 12.0)) * 1e4
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS z_e4
        |FROM f""".stripMargin,

    // Gini rebuild: per-user counts → value histogram → strictly-smaller
    // cumulative window, rank-run moments in HUGEINT ((c·lt + c(c+1)/2)
    // per distinct value), one double division, e6.
    "q_v8_gini" ->
      """WITH u AS (
        |  SELECT user_id, count(*) AS v FROM events GROUP BY 1),
        |h AS (SELECT v, count(*) AS c FROM u GROUP BY 1),
        |r AS (
        |  SELECT v, c,
        |    coalesce(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
        |  FROM h),
        |s AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n,
        |    sum(CAST(c AS HUGEINT) * CAST(v AS HUGEINT)) AS t,
        |    sum(CAST(v AS HUGEINT)
        |      * (CAST(c AS HUGEINT) * CAST(lt AS HUGEINT)
        |        + (CAST(c AS HUGEINT) * (CAST(c AS HUGEINT) + 1)) // 2))
        |      AS s1
        |  FROM r)
        |SELECT n, CAST(t AS BIGINT) AS total,
        |  CAST(floor(CAST(2 * s1 - (CAST(n AS HUGEINT) + 1) * t AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * t AS DOUBLE) * 1e6
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS gini_e6
        |FROM s""".stripMargin,

    // Benford rebuild: identical milli-integerization, leading digit
    // via integer-to-VARCHAR substr, expected/χ² operand shapes
    // mirrored ((n − N·p)·dup / (N·p)).
    "q_v4_benford" ->
      """WITH d AS (SELECT unnest(range(1, 10)) AS digit),
        |v AS (
        |  SELECT CAST(floor(l_extendedprice * 1000
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v
        |  FROM lineitem),
        |c0 AS (
        |  SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT)
        |      AS digit,
        |    count(*) AS n
        |  FROM v WHERE v > 0 GROUP BY 1),
        |j AS (
        |  SELECT d.digit, CAST(coalesce(n, 0) AS BIGINT) AS n
        |  FROM d LEFT JOIN c0 USING (digit)),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM j),
        |f AS (
        |  SELECT digit, n,
        |    log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / digit) AS p,
        |    CAST(n AS DOUBLE) AS nd, CAST(nn AS DOUBLE) AS big
        |  FROM j, t)
        |SELECT digit, n,
        |  CAST(floor(p * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS p_exp_e6,
        |  CAST(floor(nd / big * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS p_obs_e6,
        |  CAST(floor((nd - big * p) * (nd - big * p) / (big * p) * 1e6
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS chi2_e6
        |FROM f
        |ORDER BY digit""".stripMargin,

    // Each rule's violation count rebuilt as a conditional aggregate;
    // sums CAST AS BIGINT (DuckDB integer sums are HUGEINT). "column" and
    // "rows" quoted — both are keywords there.
    "q_v1_validate" ->
      """WITH agg AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v0,
        |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
        |      AS BIGINT) AS v1,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS v2,
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL
        |      OR o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
        |      AS BIGINT) AS v3,
        |    CAST(sum(CASE WHEN o_totalprice IS NULL
        |      OR (o_totalprice >= 0 AND o_totalprice <= 1000000)
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v4,
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL
        |      OR regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS v5
        |  FROM orders)
        |SELECT rule, "column", n AS "rows", violations,
        |  violations = 0 AS pass
        |FROM (
        |  SELECT 'not_null(o_orderkey)' AS rule, 'o_orderkey' AS "column",
        |    n, v0 AS violations FROM agg
        |  UNION ALL SELECT 'unique(o_orderkey)', 'o_orderkey', n, v1 FROM agg
        |  UNION ALL SELECT 'not_null(o_custkey)', 'o_custkey', n, v2 FROM agg
        |  UNION ALL SELECT 'in_set(o_orderstatus)', 'o_orderstatus', n, v3
        |    FROM agg
        |  UNION ALL SELECT 'in_range(o_totalprice)', 'o_totalprice', n, v4
        |    FROM agg
        |  UNION ALL SELECT 'matches(o_orderpriority)', 'o_orderpriority', n,
        |    v5 FROM agg)
        |ORDER BY rule""".stripMargin,

    // Profiler: per-column scalar aggregates UNIONed to rows; every
    // value is integer-derived (counts, lengths, exact sums / counts),
    // so the e4 view is lossless on both engines.
    "q_v2_profile" -> {
      def base(c: String) =
        s"""SELECT '$c' AS col_name, 'nulls' AS metric,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           |    AS value FROM documents
           |UNION ALL SELECT '$c', 'distinct',
           |  CAST(count(DISTINCT $c) AS DOUBLE) FROM documents""".stripMargin
      def num(c: String) =
        s"""${base(c)}
           |UNION ALL SELECT '$c', 'min', CAST(min($c) AS DOUBLE)
           |  FROM documents
           |UNION ALL SELECT '$c', 'max', CAST(max($c) AS DOUBLE)
           |  FROM documents
           |UNION ALL SELECT '$c', 'mean', CAST(avg($c) AS DOUBLE)
           |  FROM documents""".stripMargin
      def str(c: String) =
        s"""${base(c)}
           |UNION ALL SELECT '$c', 'min_len',
           |  CAST(min(length($c)) AS DOUBLE) FROM documents
           |UNION ALL SELECT '$c', 'max_len',
           |  CAST(max(length($c)) AS DOUBLE) FROM documents
           |UNION ALL SELECT '$c', 'avg_len',
           |  CAST(avg(length($c)) AS DOUBLE) FROM documents""".stripMargin
      s"""WITH m AS (
         |${num("doc_id")}
         |UNION ALL ${str("text")}
         |UNION ALL ${str("lang")}
         |UNION ALL ${str("source")}
         |UNION ALL ${num("n_chars")}
         |UNION ALL SELECT '_table', 'rows', CAST(count(*) AS DOUBLE)
         |  FROM documents)
         |SELECT col_name, metric,
         |  CAST(floor(value * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
         |    AS value_e4
         |FROM m ORDER BY col_name, metric""".stripMargin
    },

    "q_v1b_quarantine" ->
      """SELECT o_orderkey,
        |  concat_ws(',',
        |    CASE WHEN o_orderstatus IS NULL
        |      OR o_orderstatus IN ('O','F') THEN NULL
        |      ELSE 'in_set(o_orderstatus)' END,
        |    CASE WHEN o_totalprice IS NULL
        |      OR (o_totalprice >= 0 AND o_totalprice <= 150000)
        |      THEN NULL ELSE 'in_range(o_totalprice)' END) AS tags
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // PSI rebuild: identical bin expression (clamped fixed-width over
    // [0, 500)), add-one-smoothed shares as two double divisions, one
    // ln of the ratio — every operand shape mirrored.
    "q_v3_psi" ->
      """WITH b AS (SELECT unnest(range(10)) AS bin),
        |pc AS (
        |  SELECT CAST(least(greatest(floor(
        |      (value - CAST(0.0 AS DOUBLE)) * CAST(10.0 AS DOUBLE)
        |        / CAST(500.0 AS DOUBLE)),
        |      CAST(0.0 AS DOUBLE)), CAST(9.0 AS DOUBLE)) AS BIGINT)
        |      AS bin,
        |    sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS np,
        |    sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS nc
        |  FROM events GROUP BY 1),
        |j AS (
        |  SELECT b.bin,
        |    CAST(coalesce(np, 0) AS BIGINT) AS n_prev,
        |    CAST(coalesce(nc, 0) AS BIGINT) AS n_cur
        |  FROM b LEFT JOIN pc USING (bin)),
        |t AS (
        |  SELECT CAST(sum(n_prev) AS BIGINT) AS tp,
        |    CAST(sum(n_cur) AS BIGINT) AS tc
        |  FROM j),
        |f AS (
        |  SELECT bin, n_prev, n_cur,
        |    CAST(n_prev + 1 AS DOUBLE) / CAST(tp + 10 AS DOUBLE) AS pp,
        |    CAST(n_cur + 1 AS DOUBLE) / CAST(tc + 10 AS DOUBLE) AS pc
        |  FROM j, t)
        |SELECT bin, n_prev, n_cur,
        |  CAST(floor((pp - pc) * ln(pp / pc) * 1e6
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS psi_e6
        |FROM f
        |ORDER BY bin""".stripMargin,

    // MAD rebuild: two quantile_cont passes (median, then median of
    // deviations), the same 0.6745 consistency shape, flag on the
    // identical double comparison.
    "q_o4_outliers_mad" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |ad AS (
        |  SELECT e.event_type, abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m USING (event_type)),
        |md AS (
        |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM ad GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value,
        |  CAST(floor(m.med * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS med_e4,
        |  CAST(floor(d.mad * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS mad_e4,
        |  CAST(floor(0.6745 * (e.value - m.med) / d.mad * 1e4
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rz_e4
        |FROM events e
        |JOIN med m USING (event_type)
        |JOIN md d USING (event_type)
        |WHERE d.mad <> 0
        |  AND abs(0.6745 * (e.value - m.med) / d.mad)
        |    > CAST(1.3 AS DOUBLE)
        |ORDER BY e.event_id""".stripMargin,

    // HBOS rebuild: identical bin arithmetic (width computed first,
    // v = max clamps into the top bin), per-feature bin counts, then
    // the EXACT integer products — HUGEINT (the BIGINT product of four
    // 60k-scale maxcounts overflows int64) mirroring the engine's
    // decimal(38,0) — with the same single double division.
    "q_o5_hbos" ->
      """WITH st AS (
        |  SELECT CAST(min(l_quantity) AS DOUBLE) q0,
        |    CAST(max(l_quantity) AS DOUBLE) q1,
        |    CAST(min(l_extendedprice) AS DOUBLE) p0,
        |    CAST(max(l_extendedprice) AS DOUBLE) p1,
        |    CAST(min(l_discount) AS DOUBLE) d0,
        |    CAST(max(l_discount) AS DOUBLE) d1,
        |    CAST(min(l_tax) AS DOUBLE) t0,
        |    CAST(max(l_tax) AS DOUBLE) t1
        |  FROM lineitem),
        |b AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN q1 = q0 THEN 0 ELSE least(floor(
        |      (CAST(l_quantity AS DOUBLE) - q0) / ((q1 - q0) / 20)),
        |      19) END AS bq,
        |    CASE WHEN p1 = p0 THEN 0 ELSE least(floor(
        |      (CAST(l_extendedprice AS DOUBLE) - p0) / ((p1 - p0) / 20)),
        |      19) END AS bp,
        |    CASE WHEN d1 = d0 THEN 0 ELSE least(floor(
        |      (CAST(l_discount AS DOUBLE) - d0) / ((d1 - d0) / 20)),
        |      19) END AS bd,
        |    CASE WHEN t1 = t0 THEN 0 ELSE least(floor(
        |      (CAST(l_tax AS DOUBLE) - t0) / ((t1 - t0) / 20)),
        |      19) END AS bt
        |  FROM lineitem CROSS JOIN st),
        |cq AS (SELECT bq, count(*) c FROM b GROUP BY 1),
        |mq AS (SELECT max(c) m FROM cq),
        |cp AS (SELECT bp, count(*) c FROM b GROUP BY 1),
        |mp AS (SELECT max(c) m FROM cp),
        |cd AS (SELECT bd, count(*) c FROM b GROUP BY 1),
        |md AS (SELECT max(c) m FROM cd),
        |ct AS (SELECT bt, count(*) c FROM b GROUP BY 1),
        |mt AS (SELECT max(c) m FROM ct),
        |sc AS (
        |  SELECT b.l_orderkey, b.l_linenumber,
        |    CAST(CAST(mq.m AS HUGEINT) * CAST(mp.m AS HUGEINT)
        |      * CAST(md.m AS HUGEINT) * CAST(mt.m AS HUGEINT) AS DOUBLE)
        |    / CAST(CAST(cq.c AS HUGEINT) * CAST(cp.c AS HUGEINT)
        |      * CAST(cd.c AS HUGEINT) * CAST(ct.c AS HUGEINT) AS DOUBLE)
        |      AS hbos
        |  FROM b JOIN cq USING (bq) JOIN cp USING (bp)
        |    JOIN cd USING (bd) JOIN ct USING (bt)
        |  CROSS JOIN mq CROSS JOIN mp CROSS JOIN md CROSS JOIN mt)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(floor(hbos * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS hbos_e6
        |FROM sc WHERE hbos >= CAST(4.5 AS DOUBLE)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // Skew-report rebuild: per-key counts, then the v8 gini rank-run
    // shapes over the count HISTOGRAM plus the 1-row max/share stats.
    "q_v13_skew_report" ->
      """WITH k AS (
        |  SELECT l_partkey, count(*) AS c FROM lineitem
        |  WHERE l_partkey IS NOT NULL GROUP BY 1),
        |h AS (SELECT c AS v, count(*) AS hc FROM k GROUP BY 1),
        |r AS (
        |  SELECT v, hc,
        |    coalesce(sum(hc) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS lt
        |  FROM h),
        |s AS (
        |  SELECT CAST(sum(hc) AS BIGINT) AS n,
        |    sum(CAST(hc AS HUGEINT) * CAST(v AS HUGEINT)) AS t,
        |    sum(CAST(v AS HUGEINT)
        |      * (CAST(hc AS HUGEINT) * CAST(lt AS HUGEINT)
        |        + (CAST(hc AS HUGEINT) * (CAST(hc AS HUGEINT) + 1))
        |          // 2)) AS s1
        |  FROM r),
        |st AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(max(c) AS BIGINT) AS max_count
        |  FROM k)
        |SELECT st.n_rows, st.n_keys, st.max_count,
        |  CAST(floor(CAST(st.max_count AS DOUBLE)
        |    / CAST(st.n_rows AS DOUBLE) * 1e6 + CAST(0.5 AS DOUBLE))
        |    AS BIGINT) AS share_e6,
        |  CAST(floor(
        |    CAST(2 * s.s1 - (CAST(s.n AS HUGEINT) + 1) * s.t AS DOUBLE)
        |    / CAST(CAST(s.n AS HUGEINT) * s.t AS DOUBLE) * 1e6
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS gini_e6
        |FROM st CROSS JOIN s
        |ORDER BY n_rows""".stripMargin,

    // HDR sketch rebuild: identical integer bucket math — octave from
    // the bin-string length, linear sub-bucket and ceil-div lower
    // bound via `//`, rank = (q_e6·n + 999999) // 1e6, first bucket
    // with cum ≥ rank per (flag, q).
    "q_v14_hdr_quantiles" ->
      """WITH src AS (
        |  SELECT l_returnflag AS g,
        |    CAST(l_extendedprice * 100 AS BIGINT) AS v
        |  FROM lineitem),
        |b AS (
        |  SELECT g, e,
        |    CAST(CASE WHEN e >= 4
        |      THEN (v - (CAST(1 AS BIGINT) << e)) >> (e - 4)
        |      ELSE (v - (CAST(1 AS BIGINT) << e)) << (4 - e)
        |      END AS INTEGER) AS sub
        |  FROM (SELECT g, v, length(bin(v)) - 1 AS e
        |        FROM src WHERE v IS NOT NULL AND v > 0)),
        |hist AS (
        |  SELECT g, e, sub, CAST(count(*) AS BIGINT) AS n,
        |    (CAST(1 AS BIGINT) << e)
        |      + CASE WHEN e >= 4
        |        THEN CAST(sub AS BIGINT) << (e - 4)
        |        ELSE (sub * (CAST(1 AS BIGINT) << e) + 15) // 16
        |        END AS lo
        |  FROM b GROUP BY 1, 2, 3),
        |cum AS (
        |  SELECT g, e, sub, lo,
        |    CAST(sum(n) OVER (PARTITION BY g ORDER BY e, sub)
        |      AS BIGINT) AS cum,
        |    CAST(sum(n) OVER (PARTITION BY g) AS BIGINT) AS nt
        |  FROM hist),
        |qs AS (SELECT CAST(unnest([500000, 950000, 990000]) AS BIGINT)
        |       AS q_e6),
        |audit AS (
        |  SELECT g,
        |    CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_null,
        |    CAST(sum(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_negative,
        |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_zero
        |  FROM src GROUP BY 1),
        |pick AS (
        |  SELECT g, q_e6, lo, nt,
        |    row_number() OVER (PARTITION BY g, q_e6 ORDER BY e, sub)
        |      AS rn
        |  FROM cum CROSS JOIN qs
        |  WHERE cum >= (q_e6 * nt + 999999) // 1000000)
        |-- engine shape mirrored: the output shell is audit × qs (a
        |-- group whose rows are ALL excluded still emits est NULL,
        |-- n 0 with its audit counts), estimates LEFT JOIN in
        |SELECT a.g AS l_returnflag, q.q_e6 AS q_e6, p.lo AS est,
        |  coalesce(p.nt, CAST(0 AS BIGINT)) AS n,
        |  a.n_null, a.n_negative, a.n_zero
        |FROM audit a CROSS JOIN qs q
        |LEFT JOIN (SELECT * FROM pick WHERE rn = 1) p
        |  ON p.g = a.g AND p.q_e6 = q.q_e6
        |ORDER BY 1, 2""".stripMargin,

    // Entropy rebuild: (source, lang) counts, the same 1e9-integerized
    // ln(c) terms summed HUGEINT, H = (ln N − Σ/1e9/N)/ln 2 mirrored.
    "q_v12_entropy" ->
      """WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents
        |  WHERE source IS NOT NULL AND lang IS NOT NULL
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT source,
        |    CAST(sum(CAST(c AS HUGEINT)) AS DOUBLE) AS nd,
        |    CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum(CAST(c AS HUGEINT)
        |      * CAST(floor(ln(CAST(c AS DOUBLE)) * 1e9
        |          + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE) AS se9
        |  FROM c GROUP BY source)
        |SELECT source, n, n_distinct,
        |  CAST(floor((ln(nd) - se9 / 1e9 / nd) / ln(CAST(2.0 AS DOUBLE))
        |    * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS entropy_e6
        |FROM m ORDER BY source""".stripMargin,

    // Correlation-matrix rebuild: one HUGEINT moments CTE, six pair
    // rows by UNION ALL, the mirrored (n·q−s²) variance/covariance
    // shapes with the product guard.
    // Spearman rebuild: per-side distinct-value histogram + strictly-
    // smaller cumulative window (the gini/skew rank-run shape), the
    // Kendall rebuild: same joint-histogram cell-pair classification
    // (row-value comparison keeps each unordered cell pair once), the
    // same doubled-integer tie terms, HUGEINT products, and the same
    // final association: (nc − nd) · 2 / √(du·dv).
    "q_v18_kendall" ->
      """WITH o AS (
        |  SELECT o_custkey % 500 AS b,
        |    CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT) AS cents
        |  FROM orders),
        |g AS (
        |  SELECT b, CAST(sum(cents) // 100000 AS BIGINT) AS x,
        |    count(*) AS y
        |  FROM o GROUP BY b),
        |h AS (SELECT x, y, CAST(count(*) AS HUGEINT) AS c
        |  FROM g GROUP BY x, y),
        |cd AS (
        |  SELECT
        |    coalesce(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
        |        OR (a.x > b.x AND a.y > b.y)
        |      THEN a.c * b.c ELSE 0 END), 0) AS nc,
        |    coalesce(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
        |        OR (a.x > b.x AND a.y < b.y)
        |      THEN a.c * b.c ELSE 0 END), 0) AS nd
        |  FROM h a JOIN h b ON (a.x, a.y) < (b.x, b.y)),
        |nn AS (SELECT coalesce(sum(c), 0) AS n FROM h),
        |tx AS (SELECT coalesce(sum(t * (t - 1)), 0) AS tx2 FROM (
        |  SELECT sum(c) AS t FROM h GROUP BY x)),
        |ty AS (SELECT coalesce(sum(t * (t - 1)), 0) AS ty2 FROM (
        |  SELECT sum(c) AS t FROM h GROUP BY y))
        |SELECT CAST(n AS BIGINT) AS n, CAST(nc AS BIGINT) AS n_conc,
        |  CAST(nd AS BIGINT) AS n_disc,
        |  CAST(floor(CAST(nc - nd AS DOUBLE) * CAST(2 AS DOUBLE)
        |      / sqrt(CAST(n * (n - 1) - tx2 AS DOUBLE)
        |        * CAST(n * (n - 1) - ty2 AS DOUBLE)) * 1e6
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS tau_e6
        |FROM nn, cd, tx, ty ORDER BY n""".stripMargin,

    // SAME doubled tie rank 2·lt + cnt + 1, HUGEINT moments, and the
    // engine's double rho shape, e6.
    "q_v15_spearman" ->
      """WITH src AS (
        |  SELECT
        |    CAST(floor(l_quantity * 100 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |hx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM src
        |       GROUP BY 1),
        |rx AS (SELECT x,
        |    2 * coalesce(sum(cnt) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + cnt + 1 AS ru
        |  FROM hx),
        |hy AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM src
        |       GROUP BY 1),
        |ry AS (SELECT y,
        |    2 * coalesce(sum(cnt) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + cnt + 1 AS rv
        |  FROM hy),
        |j AS (SELECT rx.ru, ry.rv FROM src
        |      JOIN rx ON rx.x = src.x JOIN ry ON ry.y = src.y),
        |mm AS (SELECT
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(ru AS HUGEINT)) AS DOUBLE) AS su,
        |    CAST(sum(CAST(rv AS HUGEINT)) AS DOUBLE) AS sv,
        |    CAST(sum(CAST(ru AS HUGEINT) * CAST(rv AS HUGEINT))
        |      AS DOUBLE) AS suv,
        |    CAST(sum(CAST(ru AS HUGEINT) * CAST(ru AS HUGEINT))
        |      AS DOUBLE) AS suu,
        |    CAST(sum(CAST(rv AS HUGEINT) * CAST(rv AS HUGEINT))
        |      AS DOUBLE) AS svv
        |  FROM j)
        |SELECT cnt AS n,
        |  CAST(floor(
        |    (n * suv - su * sv)
        |      / sqrt((n * suu - su * su) * (n * svv - sv * sv)) * 1e6
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rho_e6
        |FROM mm ORDER BY n""".stripMargin,

    "q_v11_corr_matrix" ->
      """WITH src AS (
        |  SELECT
        |    CAST(floor(l_quantity * 100 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT) AS price,
        |    CAST(floor(l_discount * 10000 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT) AS disc,
        |    CAST(floor(l_tax * 10000 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT) AS tax
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(qty AS HUGEINT)) AS DOUBLE) AS s_qty,
        |    CAST(sum(CAST(qty AS HUGEINT) * qty) AS DOUBLE) AS q_qty,
        |    CAST(sum(CAST(price AS HUGEINT)) AS DOUBLE) AS s_price,
        |    CAST(sum(CAST(price AS HUGEINT) * price) AS DOUBLE)
        |      AS q_price,
        |    CAST(sum(CAST(disc AS HUGEINT)) AS DOUBLE) AS s_disc,
        |    CAST(sum(CAST(disc AS HUGEINT) * disc) AS DOUBLE) AS q_disc,
        |    CAST(sum(CAST(tax AS HUGEINT)) AS DOUBLE) AS s_tax,
        |    CAST(sum(CAST(tax AS HUGEINT) * tax) AS DOUBLE) AS q_tax,
        |    CAST(sum(CAST(qty AS HUGEINT) * price) AS DOUBLE) AS x_qp,
        |    CAST(sum(CAST(qty AS HUGEINT) * disc) AS DOUBLE) AS x_qd,
        |    CAST(sum(CAST(qty AS HUGEINT) * tax) AS DOUBLE) AS x_qt,
        |    CAST(sum(CAST(price AS HUGEINT) * disc) AS DOUBLE) AS x_pd,
        |    CAST(sum(CAST(price AS HUGEINT) * tax) AS DOUBLE) AS x_pt,
        |    CAST(sum(CAST(disc AS HUGEINT) * tax) AS DOUBLE) AS x_dt
        |  FROM src),
        |p AS (
        |  SELECT 'qty' AS col_a, 'price' AS col_b, cnt, n,
        |    s_qty AS sa, q_qty AS qa, s_price AS sb, q_price AS qb,
        |    x_qp AS xab FROM m
        |  UNION ALL SELECT 'qty', 'disc', cnt, n,
        |    s_qty, q_qty, s_disc, q_disc, x_qd FROM m
        |  UNION ALL SELECT 'qty', 'tax', cnt, n,
        |    s_qty, q_qty, s_tax, q_tax, x_qt FROM m
        |  UNION ALL SELECT 'price', 'disc', cnt, n,
        |    s_price, q_price, s_disc, q_disc, x_pd FROM m
        |  UNION ALL SELECT 'price', 'tax', cnt, n,
        |    s_price, q_price, s_tax, q_tax, x_pt FROM m
        |  UNION ALL SELECT 'disc', 'tax', cnt, n,
        |    s_disc, q_disc, s_tax, q_tax, x_dt FROM m)
        |SELECT col_a, col_b, cnt AS n,
        |  CASE WHEN cnt < 2
        |      OR (n*qa - sa*sa) * (n*qb - sb*sb) <= CAST(0 AS DOUBLE)
        |    THEN NULL
        |    ELSE CAST(floor((n*xab - sa*sb)
        |      / sqrt((n*qa - sa*sa) * (n*qb - sb*sb)) * 1e6
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT) END AS r_e6
        |FROM p ORDER BY col_a, col_b""".stripMargin,

    // Skyline rebuild: the textbook NOT EXISTS dominance predicate —
    // O(n²) is fine for the oracle at sf0.01; dominance compares exact
    // integers so the frontier membership is engine-independent.
    "q_o3_skyline" ->
      """WITH s AS (
        |  SELECT p_partkey,
        |    CAST(floor(p_retailprice * 100 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT) AS price_cents,
        |    CAST(-p_size AS BIGINT) AS neg_size
        |  FROM part)
        |SELECT p_partkey, price_cents, neg_size
        |FROM s r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM s o
        |  WHERE o.price_cents <= r.price_cents
        |    AND o.neg_size <= r.neg_size
        |    AND (o.price_cents < r.price_cents
        |      OR o.neg_size < r.neg_size))
        |ORDER BY p_partkey""".stripMargin,

    // Tukey fences from quantile_cont (≡ Spark percentile — same
    // interpolation formula, bit-equal); fence arithmetic mirrors the
    // Spark association q1 − k·(q3−q1) exactly.
    "q_o1_outliers_iqr" ->
      """WITH q AS (
        |  SELECT event_type, quantile_cont(value, 0.25) AS q1,
        |         quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY event_type),
        |f AS (
        |  SELECT event_type, q1 - CAST(1.5 AS DOUBLE) * (q3 - q1) AS lo,
        |         q3 + CAST(1.5 AS DOUBLE) * (q3 - q1) AS hi FROM q)
        |SELECT e.event_id, e.event_type, e.value,
        |  CAST(floor(f.lo * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lo_e4,
        |  CAST(floor(f.hi * 1e4 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS hi_e4
        |FROM events e JOIN f USING (event_type)
        |WHERE e.value < f.lo OR e.value > f.hi
        |ORDER BY e.event_id""".stripMargin,

    // z = (x − μ)/σ with sample stddev; e4-integerized to absorb
    // partial-agg merge-order ulps.
    "q_o2_outliers_z" ->
      """WITH s AS (
        |  SELECT o_orderstatus, avg(o_totalprice) AS mu,
        |         stddev_samp(o_totalprice) AS sigma
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
        |  CAST(floor((o.o_totalprice - s.mu) / s.sigma * 1e4
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS z_e4
        |FROM orders o JOIN s USING (o_orderstatus)
        |WHERE s.sigma IS NOT NULL AND s.sigma <> 0
        |  AND abs((o.o_totalprice - s.mu) / s.sigma) > CAST(1.7 AS DOUBLE)
        |ORDER BY o.o_orderkey""".stripMargin,
  )
}
