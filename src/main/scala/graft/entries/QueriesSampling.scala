package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.GraphConfig
import graft.functions.{GraftFunctions => GF, VectorFunctions => VF}
import graft.operators._
import graft.streaming.StreamingIngest

/** sampling/splits/packing X6 (hash sample, splits, mixtures, curriculum, length batching) — one slice of the [[SparkEntry]] driver contract
  * (19 queries). Chunks moved verbatim from SparkEntry.scala;
  * the assembled `queries`/`oracleSql` maps are unchanged. */
private[graft] object QueriesSampling {
  import EntryData._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- X6n: deterministic contrastive negatives — 3 hash-drawn
    // non-matching partners per doc over the dense id range; every draw
    // replayable (portable md5-48), self-hits and holes dropped ----
    "q_x6n_negative_pairs" -> ((s, dir) =>
      Sampling.negativePairs(t(s, dir, "documents"), "doc_id", k = 3,
          seed = 42L)
        .orderBy("doc_id", "j")),

    // ---- X6: stratified curation quota — keep the k best docs per
    // stratum under an explicit total ordering ----
    "q_x6_stratified_topk" -> ((s, dir) =>
      Sampling.stratifiedTopK(t(s, dir, "documents"), "lang", 5,
        Seq(col("n_chars").desc, col("doc_id")))
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")),

    // ---- X6i: per-domain cap — synthetic crawl URLs (host = source ×
    // doc_id%7), keep the 3 longest docs per host; the content-farm
    // throttle of a crawl-curation pipeline ----
    "q_x6i_domain_cap" -> ((s, dir) => {
      val withUrl = t(s, dir, "documents").select(
        col("doc_id"), col("n_chars"),
        concat(lit("https://"), col("source"), lit("-"),
          (col("doc_id") % 7).cast("string"), lit(".example.com/p/"),
          col("doc_id").cast("string")).as("url"))
      Curation.domainCap(withUrl, "url", 3,
          Seq(col("n_chars").desc, col("doc_id")))
        .select("doc_id", "host", "n_chars")
        .orderBy("host", "doc_id")
    }),

    // ---- X6u: URL canonicalization — the pre-dedup key normalizer:
    // fragment/case/default-port/tracking-param identities collapse
    // re-crawled variants of one page to ONE dedup key (portable
    // character-class regexes; remaining params keep their order) ----
    "q_x6u_canonical_url" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val id = col("doc_id").cast("string")
      val url = when(col("doc_id") % 4 === 0,
          concat(lit("HTTP://WWW."), upper(col("source")),
            lit(".COM:80/Doc/"), id,
            lit("?utm_source=feed&page=2&gclid=abc#top")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("https://"), col("source"), lit(".com:443#Sec-"), id))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://"), col("source"), lit(".com/doc/"), id,
            lit("?utm_medium=x&id="), id, lit("&fbclid=z")))
        .otherwise(concat(lit("http://"), col("source"),
          lit(".com:8080/doc/"), id))
      d.select(col("doc_id"),
          Curation.canonicalizeUrl(url).as("canonical"))
        .orderBy("doc_id")
    }),

    // ---- X6h: temperature-scaled per-language sampling weights
    // (alpha = 1/T = 0.5 → sqrt path, IEEE-exact on every engine) ----
    "q_x6h_temperature" -> ((s, dir) =>
      Sampling.temperatureWeights(t(s, dir, "documents"), "lang", 0.5, 1000L)
        .select(col("lang"), col("n"),
          floor(col("p") * 1e6 + 0.5).cast("long").as("p_e6"),
          floor(col("rate") * 1e6 + 0.5).cast("long").as("rate_e6"))
        .orderBy("lang")),

    // ---- X6k: percentile-rank score normalization per group — the
    // signal-calibration step before mixing sources; exact rank
    // arithmetic so the oracle matches bit-for-bit ----
    "q_x6k_score_normalize" -> ((s, dir) =>
      Sampling.percentileNormalize(t(s, dir, "documents"), "n_chars",
          Some("lang"))
        .select(col("doc_id"), col("lang"),
          floor(col("pr") * 1e6 + 0.5).cast("long").as("pr_e6"))
        .orderBy("doc_id")),

    // ---- X6b: deterministic content-id Bernoulli sample. The query runs
    // the engine-portable hash mode (md5-48bit — see PortableHash) so the
    // oracle recomputes the exact membership in DuckDB; the xxhash64
    // default path is pinned by SamplingSpec (determinism + fraction). ----
    "q_x6b_hash_sample" -> ((s, dir) =>
      Sampling.hashSample(t(s, dir, "documents"), "doc_id", 0.1,
          portable = true)
        .select("doc_id")
        .orderBy("doc_id")),

    // ---- X6d: deterministic per-group example sampling (custom bottom-k
    // typed aggregate), portable-hash mode → the oracle re-ranks by the
    // same md5-derived hash ----
    "q_x6d_sample_per_lang" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(GF.sample_k(col("doc_id"), 3, portable = true).as("sample_ids"))
        .select(col("lang"), concat_ws(",", col("sample_ids").cast("array<string>"))
          .as("sample_ids"))
        .orderBy("lang")),

    // ---- X6c: train/test split summary — disjoint + exhaustive by
    // construction (spec-pinned); portable-hash mode makes the split
    // sizes oracle-recomputable ----
    "q_x6c_train_test_split" -> ((s, dir) => {
      val (train, test) =
        Sampling.trainTestSplit(t(s, dir, "documents"), "doc_id", 0.2,
          portable = true)
      train.agg(count(lit(1)).as("n")).select(lit("train").as("split"), col("n"))
        .unionByName(
          test.agg(count(lit(1)).as("n")).select(lit("test").as("split"), col("n")))
        .orderBy("split")
    }),

    // ---- X6p: stratified train/val/test split — exact per-language
    // quotas (4 test + 3 val per lang, hash-ordered, rest train);
    // portable-hash mode so the oracle re-ranks the same md5-48 buckets.
    // SamplingSpec pins quota exactness, small-stratum fill order, and
    // the growth contract (quota SIZES stable; a better-ranked
    // newcomer displaces the largest-key incumbent). ----
    "q_x6p_stratified_split" -> ((s, dir) =>
      Sampling.stratifiedSplit(t(s, dir, "documents"), "lang", "doc_id",
          valK = 3, testK = 4, portable = true)
        .select("doc_id", "lang", "split")
        .orderBy("doc_id")),

    // ---- X6q: deterministic epoch-order shuffle — dense 0-based
    // training positions in (portable hash, id) order WITHOUT a
    // single-partition sort (order-aligned hash buckets + broadcast
    // prefix-sum offsets + per-bucket rank); the oracle is the naive
    // one-window form the engine must reproduce exactly. ----
    "q_x6q_epoch_order" -> ((s, dir) =>
      Sampling.epochOrder(
          t(s, dir, "documents").select(col("doc_id")),
          "doc_id", seed = 42L, portable = true)
        .select(col("doc_id"), col("pos"))
        .orderBy("pos")),

    // ---- X6r: the full shuffle-then-pack training-prep story — TWO
    // independent epoch orders in one pass (hash over (id, epoch)),
    // each epoch's ordered stream packed into 4096-char sequences by
    // cumulative budget. Oracle: naive per-epoch global window over
    // the replayed md5-48 keys + the same running-sum cuts. ----
    "q_x6r_epoch_pack" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        .filter(col("n_chars") > 0)
      val ordered = Sampling.epochOrderMulti(d, "doc_id", epochs = 2,
        seed = 42L, portable = true)
      Sampling.packByBudget(ordered, "epoch", "pos", "n_chars",
          budget = 4096)
        .select(col("epoch"), col("doc_id"), col("pos"),
          col("start_offset"), col("bin"), col("spans"))
        .orderBy("epoch", "pos")
    }),

    // ---- X6t: curriculum ordering — competence-based growing data
    // window (epoch e draws the easiest c(e) fraction by EXACT
    // difficulty rank, integer-arithmetic inclusion), seeded
    // decorrelated shuffle within each window. Composes the quality
    // tier with the shuffle-and-pack story; the oracle replays the
    // rank, every integer inclusion verdict, and the md5-48 order. ----
    "q_x6t_curriculum" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      Sampling.curriculumOrder(d, "doc_id", "n_chars", epochs = 3,
          startPermille = 250, seed = 42L, portable = true)
        .select(col("epoch"), col("doc_id"), col("difficulty_rank"),
          col("pos"))
        .orderBy("epoch", "pos")
    }),

    // ---- X6v: length-grouped batching — fixed-size batches cut along
    // the (length, id) order so pad-to-batch-max waste collapses; the
    // per-batch padding audit is the deliverable (padding_waste =
    // max_len·n_rows − sum_len). Distributed rank (no single-partition
    // sort); oracle replays the total order and every batch stat. ----
    "q_x6v_length_batches" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        length(col("text")).cast("long").as("len"))
      Sampling.paddingWaste(
          Sampling.lengthGroupedBatches(docs, "doc_id", "len", 32),
          "len")
        .orderBy("batch_id")
    }),

    // ---- X6w: TOKEN-BUDGET batching — the fixed-COMPUTE collator
    // contract (q_x6v cuts fixed-count batches): exact-integer length
    // buckets, per-bucket capacity = budget div bucket_max (every
    // batch's pad-to-max footprint provably fits), batches cut along
    // the (len, id) order within each bucket, numbering offset by a
    // broadcast-sized prefix sum. The per-batch padding audit is the
    // deliverable. ----
    "q_x6w_token_batches" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        length(col("text")).cast("long").as("len"))
      Sampling.paddingWaste(
          Sampling.tokenBudgetBatches(docs, "doc_id", "len",
            budget = 4096L, rankBuckets = 64),
          "len")
        .orderBy("batch_id")
    }),

    // ---- X6x: AUTO-REBATCH — pick the length-bucket granularity by
    // MEASURED padding waste instead of guessing: one assignment +
    // one audit per candidate, winner = argmin by (waste, batches,
    // buckets). Fully deterministic, so the report itself oracles. ----
    "q_x6x_auto_rebatch" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        length(col("text")).cast("long").as("len"))
      Sampling.autoRebatch(docs, "doc_id", "len", budget = 4096L,
          candidates = Seq(4, 32, 256))
        .orderBy("rank_buckets")
    }),

    // ---- X6s: leakage-safe split — the verdict hashes the dedup
    // CLUSTER id (here Dedup.exact keeper ids joined back on content
    // sha), so identical documents can never straddle train/test; a
    // row-hash split would let them (SamplingSpec pins the
    // counterexample). Portable hash → the oracle recomputes every
    // verdict. ----
    "q_x6s_leak_safe_split" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("content_sha256"))
      val clusters = Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
        .select(col("content_sha256"), col("keeper_id").as("cluster"))
      Sampling.splitByCluster(
          d.join(clusters, Seq("content_sha256")), "cluster", 0.2,
          portable = true)
        .select(col("doc_id"), col("cluster"), col("split"))
        .orderBy("doc_id")
    }),

    // ---- X6f: deterministic weighted sampling (Efraimidis–Spirakis
    // bottom-k) — 3 length-weighted winners per language, portable-hash
    // mode: the oracle rebuilds u = (h48+1)/2^48 and re-ranks by
    // −ln(u)/w. Only the SELECTION is compared (ids + integer weights,
    // never the float key), so libm ln differences can't flake the row. ----
    "q_x6f_weighted_sample" -> ((s, dir) =>
      Sampling.weightedSamplePerGroup(
        t(s, dir, "documents"), "lang", "doc_id", "n_chars", k = 3,
        portable = true)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")),

    // ---- X6g: sequence packing — concatenate each language's docs in id
    // order and cut every 4096 chars; each doc gets its start-offset bin
    // and how many bins it spans. Window cumsum → fully oracle-able. ----
    "q_x6g_pack_budget" -> ((s, dir) =>
      Sampling.packByBudget(t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", "doc_id", "n_chars", budget = 4096)
        .select(col("lang"), col("doc_id"), col("start_offset"),
          col("bin"), col("spans"))
        .orderBy("lang", "doc_id")),

    // ---- X6l: winsorize order prices into the [p05, p95] band — exact
    // percentile cutoffs (quantile_cont parity), narrow clamp ----
    "q_x6l_winsorize" -> ((s, dir) =>
      Sampling.winsorize(t(s, dir, "orders"), "o_totalprice",
          pLo = 0.05, pHi = 0.95)
        .select(col("o_orderkey"),
          floor(col("o_totalprice_w") * lit(1e4) + lit(0.5)).cast("long")
            .as("w_e4"))
        .orderBy("o_orderkey")),

    // ---- X6j: quantile-calibrated quality threshold — keep the top 30%
    // of docs by length; cutoff = ONE exact percentile (broadcast back),
    // corpus never shuffles ----
    "q_x6j_top_fraction" -> ((s, dir) =>
      Sampling.keepTopFraction(t(s, dir, "documents"), "n_chars", 0.3)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")),
  )

  /** Generated token-budget-batch CTE chain (budget 4096 over
    * `length(text)`) for each candidate granularity, ending at
    * `r<rb>(doc_id, len, batch_id)` — mirrors
    * [[graft.operators.Sampling.tokenBudgetBatches]] integer for
    * integer: exact `//` bucketing, per-bucket capacity
    * `greatest(budget // bmax, 1)`, ceil-div batch counts, the
    * prefix-sum offsets, the within-bucket (len, id) rank cut. */
  private def tokenBatchCtes(rbs: Seq[Int]): String = {
    val per = rbs.map { rb =>
      s"""b$rb AS (
         |  SELECT doc_id, len,
         |    CASE WHEN hi = lo THEN 0
         |      ELSE least(((len - lo) * $rb) // (hi - lo), ${rb - 1})
         |    END AS bk
         |  FROM d, ext),
         |bs$rb AS (
         |  SELECT bk, max(len) AS bmax, CAST(count(*) AS BIGINT) AS bn
         |  FROM b$rb GROUP BY bk),
         |bc$rb AS (
         |  SELECT bk, bn, greatest(4096 // bmax, 1) AS cap FROM bs$rb),
         |bo$rb AS (
         |  SELECT bk, cap,
         |    CAST(coalesce(sum((bn + cap - 1) // cap) OVER (
         |      ORDER BY bk ROWS BETWEEN UNBOUNDED PRECEDING AND
         |      1 PRECEDING), 0) AS BIGINT) AS boff
         |  FROM bc$rb),
         |r$rb AS (
         |  SELECT x.doc_id, x.len,
         |    o.boff + (row_number() OVER (PARTITION BY x.bk
         |      ORDER BY x.len, x.doc_id) - 1) // o.cap AS batch_id
         |  FROM b$rb x JOIN bo$rb o ON o.bk = x.bk)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len
       |  FROM documents),
       |ext AS (SELECT min(len) AS lo, max(len) AS hi FROM d),
       |$per""".stripMargin
  }

  private def tokenBatchOracle(rb: Int, finalSelect: String): String =
    tokenBatchCtes(Seq(rb)) + "\n" + finalSelect

  private def autoRebatchOracle(cands: Seq[Int]): String = {
    val ws = cands.map { rb =>
      s"""w$rb AS (
         |  SELECT CAST($rb AS BIGINT) AS rank_buckets,
         |    CAST(count(*) AS BIGINT) AS n_batches,
         |    CAST(coalesce(sum(mx * n - s), 0) AS BIGINT)
         |      AS total_waste
         |  FROM (SELECT batch_id, count(*) AS n, max(len) AS mx,
         |        sum(len) AS s FROM r$rb GROUP BY batch_id))"""
        .stripMargin
    }.mkString(",\n")
    val union = cands.map(rb => s"SELECT * FROM w$rb")
      .mkString("\nUNION ALL ")
    tokenBatchCtes(cands) + ",\n" + ws + s""",
       |rep AS ($union)
       |SELECT rank_buckets, n_batches, total_waste,
       |  CAST(CASE WHEN row_number() OVER (ORDER BY total_waste,
       |      n_batches, rank_buckets) = 1 THEN 1 ELSE 0 END AS BIGINT)
       |    AS chosen
       |FROM rep ORDER BY rank_buckets""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // percent_rank is exact small-integer arithmetic — ties share a rank
    // on both engines, no tie-break column needed.
    "q_x6k_score_normalize" ->
      """SELECT doc_id, lang,
        |  CAST(floor(PERCENT_RANK() OVER (PARTITION BY lang
        |    ORDER BY n_chars) * 1e6 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    AS pr_e6
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Same character-class regex (portable across Java regex / RE2),
    // same row_number cap.
    "q_x6i_domain_cap" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    'https://' || source || '-' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract(url,
        |      '^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)', 1)
        |      AS host
        |  FROM u)
        |SELECT doc_id, host, n_chars FROM (
        |  SELECT doc_id, host, n_chars,
        |    row_number() OVER (PARTITION BY host
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM h)
        |WHERE rn <= 3 ORDER BY host, doc_id""".stripMargin,

    // Canonicalization rebuilt step-for-step: same fragment strip,
    // lowercased scheme and host[:port] (userinfo case preserved per
    // RFC 3986 §3.2.1), default-port drops, tracking-param list_filter
    // (same character-class alternation), original param order
    // preserved, empty path → '/'.
    "q_x6u_canonical_url" ->
      """WITH src AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 4 AS INTEGER)
        |      WHEN 0 THEN 'HTTP://WWW.' || upper(source) || '.COM:80/Doc/'
        |        || CAST(doc_id AS VARCHAR)
        |        || '?utm_source=feed&page=2&gclid=abc#top'
        |      WHEN 1 THEN 'https://' || source || '.com:443#Sec-'
        |        || CAST(doc_id AS VARCHAR)
        |      WHEN 2 THEN 'https://' || source || '.com/doc/'
        |        || CAST(doc_id AS VARCHAR) || '?utm_medium=x&id='
        |        || CAST(doc_id AS VARCHAR) || '&fbclid=z'
        |      ELSE 'http://' || source || '.com:8080/doc/'
        |        || CAST(doc_id AS VARCHAR) END AS url
        |  FROM documents),
        |nf AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS u FROM src),
        |parts AS (
        |  SELECT doc_id,
        |    regexp_matches(u, '^[A-Za-z][A-Za-z0-9+.-]*://') AS hs,
        |    lower(regexp_extract(u,
        |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_extract(u,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS auth,
        |    regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
        |      AS rest
        |  FROM nf),
        |p1 AS (
        |  SELECT doc_id, hs, scheme, rest,
        |    regexp_extract(auth, '^([^@]*@)', 1) AS ui,
        |    lower(regexp_replace(auth, '^[^@]*@', '')) AS hp
        |  FROM parts),
        |p2 AS (
        |  SELECT doc_id,
        |    CASE WHEN hs THEN scheme || '://' || ui ||
        |      (CASE WHEN scheme = 'http'
        |          THEN regexp_replace(hp, ':80$', '')
        |        WHEN scheme = 'https'
        |          THEN regexp_replace(hp, ':443$', '')
        |        ELSE hp END)
        |      ELSE '' END AS np,
        |    regexp_replace(rest, '[?].*', '') AS path,
        |    CASE WHEN position('?' IN rest) > 0
        |      THEN regexp_replace(rest, '^[^?]*[?]', '') ELSE '' END AS q
        |  FROM p1),
        |p3 AS (
        |  SELECT doc_id, np, path,
        |    -- array_to_string of an EMPTY list is NULL in DuckDB (it
        |    -- would null the final concat): coalesce back to ''
        |    coalesce(array_to_string(list_filter(string_split(q, '&'),
        |      x -> x <> '' AND NOT regexp_matches(x,
        |        '^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid)=')),
        |      '&'), '') AS qs
        |  FROM p2)
        |SELECT doc_id,
        |  np || (CASE WHEN path = '' AND np <> '' THEN '/' ELSE path END)
        |     || (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS canonical
        |FROM p3 ORDER BY doc_id""".stripMargin,

    // sqrt is correctly rounded by IEEE-754 on both engines; the sums and
    // ratios are integerized ×1e6 so no raw double reaches the hash.
    "q_x6h_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |s AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS sc FROM c),
        |t AS (SELECT sum(sc) AS tot FROM s)
        |SELECT lang, n,
        |  CAST(floor(sc / tot * 1e6 + 0.5) AS BIGINT) AS p_e6,
        |  CAST(floor(least(CAST(1 AS DOUBLE), 1000 * sc / tot / n) * 1e6
        |    + 0.5) AS BIGINT) AS rate_e6
        |FROM s, t ORDER BY lang""".stripMargin,

    "q_x6_stratified_topk" ->
      """SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin,

    // The portable-hash oracles below recompute the engine's md5-48bit
    // seeded hash exactly: DuckDB parses '0x'-prefixed hex string casts,
    // so CAST(concat('0x', substr(md5('<seed>:<id>'),1,12)) AS BIGINT)
    // equals Spark's conv(substr(md5(...),1,12),16,10) bit-for-bit.
    // Epoch order rebuilt as the naive global window the engine's
    // bucketed two-phase form must equal row-for-row.
    "q_x6q_epoch_order" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    CAST(concat('0x',
        |        substr(md5(concat(42, ':', doc_id)), 1, 12)) AS BIGINT)
        |      % 1000000 AS key
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY key, doc_id) - 1 AS BIGINT)
        |    AS pos
        |FROM k ORDER BY pos""".stripMargin,

    // Multi-epoch shuffle + pack rebuilt: md5-48 over "<seed>:<id>:
    // <epoch>" (the negativePairs key shape), naive per-epoch global
    // window for pos, then packByBudget's running-sum cuts at 4096
    // replayed with integer window arithmetic.
    "q_x6r_epoch_pack" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars FROM documents WHERE n_chars > 0),
        |ep AS (
        |  SELECT doc_id, n_chars, unnest(range(0, 2)) AS epoch FROM d),
        |k AS (
        |  SELECT doc_id, n_chars, epoch,
        |    CAST(concat('0x', substr(md5(concat(
        |        42, ':', doc_id, ':', epoch)), 1, 12)) AS BIGINT)
        |      % 1000000 AS key
        |  FROM ep),
        |o AS (
        |  SELECT doc_id, n_chars, epoch,
        |    CAST(row_number() OVER (PARTITION BY epoch
        |      ORDER BY key, doc_id) - 1 AS BIGINT) AS pos
        |  FROM k),
        |p AS (
        |  SELECT epoch, doc_id, pos, n_chars,
        |    sum(n_chars) OVER (PARTITION BY epoch ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rend
        |  FROM o)
        |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id, pos,
        |  CAST(rend - n_chars AS BIGINT) AS start_offset,
        |  CAST((rend - n_chars) // 4096 AS BIGINT) AS bin,
        |  CAST((rend - 1) // 4096 - (rend - n_chars) // 4096 + 1
        |    AS BIGINT) AS spans
        |FROM p ORDER BY epoch, pos""".stripMargin,

    // Length batches: the same total order (len, doc_id) numbered and
    // cut every 32 rows; batch stats and the waste identity replayed
    // in BIGINT (sums cast back down — DuckDB promotes sum to
    // HUGEINT).
    "q_x6v_length_batches" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len
        |  FROM documents),
        |r AS (
        |  SELECT len,
        |    (row_number() OVER (ORDER BY len, doc_id) - 1) // 32
        |      AS batch_id
        |  FROM d)
        |SELECT batch_id, count(*) AS n_rows, max(len) AS max_len,
        |  CAST(sum(len) AS BIGINT) AS sum_len,
        |  CAST(max(len) * count(*) - sum(len) AS BIGINT)
        |    AS padding_waste
        |FROM r GROUP BY batch_id ORDER BY batch_id""".stripMargin,

    // Token-budget batches: exact-integer bucket, per-bucket capacity,
    // prefix-sum offsets, within-bucket rank cut — replayed end to end
    // (HUGEINT window sums cast back down).
    "q_x6w_token_batches" -> tokenBatchOracle(64,
      """SELECT CAST(batch_id AS BIGINT) AS batch_id,
        |  count(*) AS n_rows, max(len) AS max_len,
        |  CAST(sum(len) AS BIGINT) AS sum_len,
        |  CAST(max(len) * count(*) - sum(len) AS BIGINT)
        |    AS padding_waste
        |FROM r64 GROUP BY batch_id ORDER BY batch_id""".stripMargin),

    // Auto-rebatch report: the token-batch chain replayed per
    // candidate, waste totals unioned, argmin flagged by the same
    // (waste, batches, buckets) order.
    "q_x6x_auto_rebatch" -> autoRebatchOracle(Seq(4, 32, 256)),

    // Curriculum: exact difficulty rank by (n_chars, doc_id), integer
    // competence inclusion (rank·1000·E ≤ n·(250·E + 750·(e+1))), then
    // the replayed md5-48 per-epoch order — every verdict BIGINT-exact.
    "q_x6t_curriculum" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars FROM documents
        |  WHERE n_chars IS NOT NULL),
        |r AS (
        |  SELECT doc_id, n_chars,
        |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
        |      AS rk,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM d),
        |ep AS (SELECT *, unnest(range(0, 3)) AS epoch FROM r),
        |inc AS (
        |  SELECT * FROM ep
        |  WHERE rk * 3000 <= n * (750 + 750 * (epoch + 1))),
        |k AS (
        |  SELECT doc_id, rk, epoch,
        |    CAST(concat('0x', substr(md5(concat(
        |        42, ':', doc_id, ':', epoch)), 1, 12)) AS BIGINT)
        |      % 1000000 AS key
        |  FROM inc),
        |o AS (
        |  SELECT epoch, doc_id, rk,
        |    CAST(row_number() OVER (PARTITION BY epoch
        |      ORDER BY key, doc_id) - 1 AS BIGINT) AS pos
        |  FROM k)
        |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
        |  rk AS difficulty_rank, pos
        |FROM o ORDER BY epoch, pos""".stripMargin,

    // Leakage-safe split: the oracle rebuilds the dedup clusters (min
    // doc_id per identical text) and recomputes the md5-48 verdict of
    // the CLUSTER id — duplicates must land on one side by construction.
    "q_x6s_leak_safe_split" ->
      """WITH c AS (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cluster
        |  FROM documents)
        |SELECT doc_id, cluster,
        |  CASE WHEN CAST(concat('0x',
        |      substr(md5(concat(42, ':', cluster)), 1, 12)) AS BIGINT)
        |    % 1000000 < 200000 THEN 'test' ELSE 'train' END AS split
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_x6b_hash_sample" ->
      """SELECT doc_id FROM documents
        |WHERE CAST(concat('0x',
        |    substr(md5(concat(42, ':', doc_id)), 1, 12)) AS BIGINT)
        |  % 1000000 < 100000
        |ORDER BY doc_id""".stripMargin,

    "q_x6c_train_test_split" ->
      """WITH b AS (
        |  SELECT CAST(concat('0x',
        |      substr(md5(concat(42, ':', doc_id)), 1, 12)) AS BIGINT)
        |    % 1000000 AS bkt
        |  FROM documents)
        |SELECT 'test' AS split, count(*) AS n FROM b WHERE bkt < 200000
        |UNION ALL
        |SELECT 'train' AS split, count(*) AS n FROM b WHERE bkt >= 200000
        |ORDER BY split""".stripMargin,

    "q_x6p_stratified_split" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x',
        |      substr(md5(concat(42, ':', doc_id)), 1, 12)) AS BIGINT)
        |      % 1000000 AS bkt
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY bkt, doc_id) AS rn
        |  FROM h)
        |SELECT doc_id, lang,
        |  CASE WHEN rn <= 4 THEN 'test'
        |       WHEN rn <= 7 THEN 'val'
        |       ELSE 'train' END AS split
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_x6d_sample_per_lang" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |    CAST(concat('0x',
        |      substr(md5(concat(42, ':', doc_id)), 1, 12)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn
        |  FROM h)
        |SELECT lang, string_agg(doc_id, ',' ORDER BY h, doc_id) AS sample_ids
        |FROM r WHERE rn <= 3 GROUP BY lang ORDER BY lang""".stripMargin,

    // Selection-only compare (ids + integer weights; the float ES key is
    // never emitted): u = (h48+1)/2^48, key = -ln(u)/w, bottom-3 per lang.
    "q_x6f_weighted_sample" ->
      """WITH k AS (
        |  SELECT lang, doc_id, n_chars,
        |    -ln((CAST(concat('0x',
        |        substr(md5(concat(42, ':', doc_id)), 1, 12)) AS BIGINT) + 1)
        |      / 281474976710656.0) / n_chars AS wkey
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND n_chars > 0)
        |SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY wkey, doc_id) AS rn
        |  FROM k)
        |WHERE rn <= 3 ORDER BY lang, doc_id""".stripMargin,

    // Same window cumsum on both engines; bins are floor(offset/budget)
    // in double (offsets ≪ 2^53, so the division is exact enough to
    // floor identically).
    "q_x6g_pack_budget" ->
      """WITH p AS (
        |  SELECT lang, doc_id, n_chars,
        |    sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM documents)
        |SELECT lang, doc_id,
        |  CAST(run - n_chars AS BIGINT) AS start_offset,
        |  CAST(floor((run - n_chars) / CAST(4096 AS DOUBLE)) AS BIGINT)
        |    AS bin,
        |  CAST(floor((run - 1) / CAST(4096 AS DOUBLE)) AS BIGINT)
        |    - CAST(floor((run - n_chars) / CAST(4096 AS DOUBLE)) AS BIGINT)
        |    + 1 AS spans
        |FROM p ORDER BY lang, doc_id""".stripMargin,

    // Winsorize rebuild: quantile_cont cutoffs (≡ Spark percentile,
    // bit-equal interpolation), same least/greatest clamp.
    "q_x6l_winsorize" ->
      """WITH c AS (
        |  SELECT quantile_cont(o_totalprice, 0.05) AS lo,
        |    quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders)
        |SELECT o_orderkey,
        |  CAST(floor(least(greatest(o_totalprice, c.lo), c.hi) * 1e4
        |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS w_e4
        |FROM orders, c
        |ORDER BY o_orderkey""".stripMargin,

    // Negative-pair rebuild: the md5-48 draw replayed verbatim over the
    // observed id span; existence by join against the distinct ids,
    // self-hits dropped on the same predicate.
    "q_x6n_negative_pairs" ->
      """WITH ids AS (SELECT DISTINCT doc_id FROM documents),
        |span AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM ids),
        |d AS (
        |  SELECT doc_id, unnest(range(1, 4)) AS j FROM ids),
        |c AS (
        |  SELECT d.doc_id, CAST(d.j AS BIGINT) AS j,
        |    s.lo + (CAST(concat('0x', substr(md5(concat(
        |        42, ':', d.doc_id, ':', d.j)), 1, 12)) AS BIGINT)
        |      % (s.hi - s.lo + 1)) AS neg_id
        |  FROM d CROSS JOIN span s)
        |SELECT c.doc_id, c.j, c.neg_id
        |FROM c JOIN ids i ON i.doc_id = c.neg_id
        |WHERE c.neg_id <> c.doc_id
        |ORDER BY c.doc_id, c.j""".stripMargin,

    // Cutoff = quantile_cont(0.7) (≡ Spark exact percentile); ties at
    // the cutoff kept on both sides.
    "q_x6j_top_fraction" ->
      """WITH c AS (SELECT quantile_cont(n_chars, 0.7) AS cut
        |           FROM documents)
        |SELECT doc_id, lang, n_chars FROM documents, c
        |WHERE n_chars >= c.cut ORDER BY doc_id""".stripMargin,
  )
}
