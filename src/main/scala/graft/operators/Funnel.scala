package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event funnel analysis over the events table — "who reached
  * view → click → purchase, and how far did everyone else get?": the
  * conversion query behind product analytics and, for corpus curation,
  * the behavioral filter that keeps only entities exhibiting a full
  * interaction sequence (reference builds the graph these queries run
  * on; this runs them in-engine — graph_db_builder.py:28 positions the
  * staging output for exactly this kind of downstream traversal).
  *
  * Semantics (deterministic, anchored-greedy): events fold per entity in
  * (ts, id) order; stage 1 matches the entity's EARLIEST stage-1 event,
  * and stage k > 1 matches the earliest stages(k-1)-typed event at-or-
  * after the stage k−1 match (fold order breaks ts ties by `idCol`)
  * whose distance from the stage-1 anchor is ≤ `windowSec`. Anchoring at
  * the first stage-1 event makes the result independent of any later
  * candidate chains — the same contract as ClickHouse's windowFunnel
  * without its `strict_increase` option, and replayable as a plain
  * left-to-right fold in ANSI SQL.
  *
  * Scale notes (100 TB event tables): one entity-key shuffle; the fold
  * state is `stages.length` longs regardless of series length, carried
  * in-Catalyst (`aggregate`, no UDF). Irrelevant event types are
  * filtered BEFORE the shuffle — only funnel-typed events move. Entities
  * parallelize; per-entity memory is its own funnel-typed events.
  */
object Funnel {

  /** @param stages   distinct event-type names, funnel order.
    * @param windowSec max seconds between the stage-1 anchor and any
    *                  later stage match.
    * @return one row per entity having ≥1 stage-1 event:
    *         (`entityCol`, `max_stage`, `stage_ts` — array of matched
    *         epoch-second timestamps (null past `max_stage`), `t_first`,
    *         `t_last`, `dur_sec` — last−first, 0 for single-stage). */
  def windowFunnel(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, typeCol: String, stages: Seq[String],
      windowSec: Long): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    require(stages.distinct.size == stages.size,
      "stage types must be distinct (an event must match at most one stage)")
    require(windowSec >= 0, "windowSec must be >= 0")
    val L = stages.size
    // stage index is resolved BEFORE the shuffle: only funnel events move
    val typed = df
      .filter(col(tsSecCol).isNotNull && col(typeCol).isin(stages: _*))
      .select(col(entityCol),
        struct(col(tsSecCol).cast("long").as("t"),
          col(idCol).cast("long").as("i"),
          stages.zipWithIndex.foldLeft(lit(0L)) { case (acc, (s, k)) =>
            when(col(typeCol) === s, lit((k + 1).toLong)).otherwise(acc)
          }.as("k")).as("_e"))
    val unset = lit(-1L)
    val seq = typed.groupBy(col(entityCol))
      .agg(sort_array(collect_list(col("_e"))).as("_seq"))
    // acc = L matched epoch-seconds, -1 = unset; a fresh array is built
    // per event (no in-place mutation), so stage k's condition reads the
    // PREVIOUS acc — the same old-accumulator contract the oracle's
    // list_reduce list-literal replay has.
    val folded = aggregate(
      col("_seq"),
      array(Seq.fill(L)(unset): _*),
      (acc, e) => transform(acc, (t, i) => {
        val matches = e.getField("k") === (i + 1)
        val prevSet = i === 0 || element_at(acc, i) =!= unset
        val inWindow = i === 0 ||
          e.getField("t") - element_at(acc, 1) <= lit(windowSec)
        when(t =!= unset, t)
          .otherwise(when(matches && prevSet && inWindow,
            e.getField("t")).otherwise(unset))
      }))
    seq.select(col(entityCol), folded.as("_f"))
      .filter(element_at(col("_f"), 1) =!= unset)
      .select(col(entityCol),
        aggregate(col("_f"), lit(0L),
          (n, t) => when(t =!= unset, n + 1).otherwise(n)).as("max_stage"),
        transform(col("_f"), t =>
          when(t =!= unset, t)).as("stage_ts"))
      .withColumn("t_first", element_at(col("stage_ts"), 1))
      .withColumn("t_last",
        element_at(col("stage_ts"), col("max_stage").cast("int")))
      .withColumn("dur_sec", col("t_last") - col("t_first"))
  }

  /** Gap-based sessionization: split each entity's event stream into
    * sessions wherever the silence between consecutive events exceeds
    * `gapSec` — the batch twin of the streaming session windows
    * (`StreamingIngest.sessionAgg`), and the standard pre-aggregation
    * for dwell-time, bounce, and per-visit curation features.
    *
    * Semantics (deterministic): events order per entity by
    * (`tsSecCol`, `idCol`) — a TOTAL order, so ts ties cannot flip
    * session boundaries between runs or partitionings. A session starts
    * at the entity's first event and wherever `ts − prev_ts > gapSec`
    * (strictly greater: a gap of exactly `gapSec` stays in-session, the
    * same closed bound as the streaming session windows). `session_seq`
    * numbers an entity's sessions from 1 in time order.
    *
    * Scale notes (100 TB event tables): ONE entity-key shuffle; the
    * boundary lag and the running session count ride the SAME
    * (entity) window partitioning, and [[sessionStats]]' per-session
    * aggregation groups on a prefix of that key (partial-agg, map-side
    * combine). Per-entity memory is the window frame row, not the
    * series; entities parallelize.
    */
  def sessionize(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, gapSec: Long): DataFrame = {
    require(gapSec >= 0, "gapSec must be >= 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol))
      .orderBy(col(tsSecCol).cast("long"), col(idCol))
    val prev = lag(col(tsSecCol).cast("long"), 1).over(w)
    df.filter(col(entityCol).isNotNull && col(tsSecCol).isNotNull)
      .withColumn("_new_session",
        when(prev.isNull ||
          col(tsSecCol).cast("long") - prev > gapSec, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_new_session")).over(w))
      .drop("_new_session")
  }

  /** Per-session summary over [[sessionize]]'s output: event count,
    * start/end epoch-seconds, and duration (0 for single-event
    * sessions). One partial-agg groupBy on (entity, session_seq) — a
    * prefix-compatible regrouping of the sessionize shuffle. */
  def sessionStats(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, gapSec: Long): DataFrame =
    sessionize(df, entityCol, tsSecCol, idCol, gapSec)
      .groupBy(col(entityCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsSecCol).cast("long")).as("t_start"),
        max(col(tsSecCol).cast("long")).as("t_end"))
      .withColumn("dur_sec", col("t_end") - col("t_start"))

  /** Interval coalescing (gaps-and-islands over INTERVALS — the
    * interval-set twin of point-event [[sessionize]]): per key, merge
    * every group of transitively overlapping-or-touching intervals
    * into one island. The classic availability/maintenance-window/
    * validity-range consolidation: total covered time, booking
    * overlap, SLA union. Intervals within `minGap` of each other merge
    * too (`next_start − running_max_end ≤ minGap` stays in-island:
    * with the default 0, touching intervals [1,3],[3,5] coalesce).
    *
    * Semantics (deterministic): intervals order per key by
    * (`startCol`, `endCol`) — a new island begins where an interval's
    * start exceeds the running max of all previous ends by more than
    * `minGap`; the running max (not just the previous end) is what
    * makes containment chains like [1,10],[2,3],[4,12] ONE island.
    * Zero-length and contained intervals are fine. Corrupt rows fail
    * fast — `end < start` AND null `start`/`end` on a keyed row both
    * raise (a silently dropped null endpoint would remove coverage
    * from the islands, the same silent-world-change the `end < start`
    * guard exists to prevent); null-KEY rows are dropped (an unkeyed
    * interval belongs to no world — the [[sessionize]] rule).
    *
    * Scale notes (100 TB): ONE key shuffle; the running max, the
    * island numbering, and the final per-island aggregate all ride
    * the same (key) partitioning (the [[sessionize]] discipline).
    *
    * @return one row per (key, island): `island_seq` (1-based),
    *         `island_start`, `island_end`, `n_merged` */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String, minGap: Long = 0L): DataFrame =
    mergeIntervalsCore(df, keyCol, startCol, endCol, minGap, lit(1L))

  private def mergeIntervalsCore(df: DataFrame, keyCol: String,
      startCol: String, endCol: String, minGap: Long,
      weight: org.apache.spark.sql.Column): DataFrame = {
    require(minGap >= 0, "minGap must be >= 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(startCol).cast("long"), col(endCol).cast("long"))
    val s = col(startCol).cast("long")
    val e = col(endCol).cast("long")
    val prevMaxEnd = max(e).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    df.filter(col(keyCol).isNotNull)
      // a filter (not an unused column) so pruning can't elide the
      // check; null endpoints are corrupt (not droppable) — dropping
      // one would silently shrink island coverage
      .filter(when(s.isNull || e.isNull || e < s, raise_error(
        concat(lit("mergeIntervals: null endpoint or end < start for " +
          "key "), col(keyCol).cast("string")))).otherwise(lit(true)))
      .withColumn("_graft_w", weight)
      .withColumn("_new_island",
        when(prevMaxEnd.isNull || s - prevMaxEnd > minGap, 1L)
          .otherwise(0L))
      .withColumn("island_seq", sum(col("_new_island")).over(w))
      .groupBy(col(keyCol), col("island_seq"))
      .agg(min(s).as("island_start"), max(e).as("island_end"),
        sum(col("_graft_w")).as("n_merged"))
  }

  /** EXACT incremental maintenance of [[mergeIntervals]]'s island
    * store under APPEND-ONLY interval arrivals — the incremental-SCC
    * theorem shape, for time ranges: new intervals only ever MERGE
    * islands (coverage is monotone in the input set), and the stored
    * islands preserve coverage exactly, so re-merging
    * (stored islands ∪ delta) equals the full recompute over every
    * interval ever seen — bit-for-bit, `n_merged` included (each
    * stored island carries its original count; the delta's rows count
    * 1 each). Per-batch cost is islands+delta-sized; the accumulated
    * interval history is NEVER re-read. Re-absorbing an
    * already-absorbed delta is a fixpoint (a covered interval merges
    * into its own island and adds… nothing new topologically — but it
    * DOES increment `n_merged`, so at-least-once redelivery must be
    * deduplicated upstream when exact counts matter; the streaming
    * twin's edge append + distinct does this for exact replays).
    *
    * @param islands prior output: (`keyCol`, island_start, island_end,
    *                n_merged)
    * @param delta   newly arrived raw (`keyCol`, startCol, endCol) */
  def absorbIntervals(islands: DataFrame, delta: DataFrame,
      keyCol: String, startCol: String, endCol: String,
      minGap: Long = 0L): DataFrame = {
    val stored = islands.select(col(keyCol),
      col("island_start").as("_graft_s"),
      col("island_end").as("_graft_e"),
      col("n_merged").cast("long").as("_graft_n"))
    val fresh = delta.select(col(keyCol),
      col(startCol).cast("long").as("_graft_s"),
      col(endCol).cast("long").as("_graft_e"),
      lit(1L).as("_graft_n"))
    mergeIntervalsCore(stored.unionByName(fresh), keyCol, "_graft_s",
      "_graft_e", minGap, col("_graft_n"))
  }

  /** Decremental island maintenance under interval DELETIONS — the
    * takedown twin of [[absorbIntervals]] (the G26f discipline for
    * time ranges): removing an interval can SPLIT an island or shrink
    * its ends, so unlike the append side there is no islands-only
    * composition — but islands are per-key INDEPENDENT, so exactness
    * only costs recomputing the TOUCHED KEYS from the raw ground
    * truth: keys with no deleted interval keep their stored islands
    * verbatim; keys with one re-merge from `rawRemaining` (the
    * post-delete interval store — [[graft.streaming.StreamingIngest
    * .streamingIntervals]]'s `rawDir` is exactly this). Bit-identical
    * to a full [[mergeIntervals]] over the post-delete set, `n_merged`
    * included.
    *
    * Scale notes (100 TB): the touched-key frame is delta-sized and
    * broadcast; the raw store is scanned once with the touched-key
    * semi-join pushed into it (key-partitioned interval stores prune
    * to the touched partitions); the re-merge shuffles only the
    * touched keys' rows. A key whose every interval is deleted leaves
    * the island store entirely — matching the full recompute.
    *
    * @param islands      prior [[mergeIntervals]] output
    * @param rawRemaining the post-delete raw intervals — ground truth
    * @param deleted      the (`keyCol`, startCol, endCol) rows removed
    *                     (only `keyCol` decides which keys rebuild) */
  def deleteIntervals(islands: DataFrame, rawRemaining: DataFrame,
      deleted: DataFrame, keyCol: String, startCol: String,
      endCol: String, minGap: Long = 0L): DataFrame = {
    val touched = deleted.select(col(keyCol)).distinct()
    val kept = islands
      .join(broadcast(touched), Seq(keyCol), "left_anti")
      .select(col(keyCol), col("island_seq"), col("island_start"),
        col("island_end"), col("n_merged"))
    val rebuilt = mergeIntervals(
      rawRemaining.join(broadcast(touched), Seq(keyCol), "left_semi"),
      keyCol, startCol, endCol, minGap)
      .select(col(keyCol), col("island_seq"), col("island_start"),
        col("island_end"), col("n_merged"))
    kept.unionByName(rebuilt)
  }

  /** Cohort retention matrix: entities are cohorted by the time bucket
    * of their FIRST event (`cohort = min(ts div bucketSec)`), and each
    * cell counts how many of them were active again `age` buckets later
    * — the "week-N retention" table behind every activation dashboard,
    * and for corpus curation the recurrence filter ("keep entities
    * still active k periods after first sight").
    *
    * Everything is integer arithmetic (epoch-second `div`, exact
    * distinct counts); `retention = n_active / cohort_size` is the one
    * floating division, computed last. The age-0 cell is the cohort
    * size by construction (an entity is always active in its own first
    * bucket), so retention at age 0 is exactly 1.0.
    *
    * Scale notes (100 TB event tables): (entity, bucket) pairs dedupe
    * with a partial-aggregated distinct BEFORE anything joins, so the
    * shuffled volume is active-entity-buckets, not raw events; the
    * cohort min and the join back are both entity-keyed (one shuffle
    * partitioning reused), and the cohort-size denominator rides a
    * cohort-partitioned window over the already-aggregated matrix
    * (thousands of rows) — the raw table is scanned once.
    *
    * @param bucketSec cohort/activity bucket width in seconds (default
    *                  one week).
    * @return (`cohort`, `age`, `n_active`, `retention`) — `cohort` in
    *         bucket units (epoch-sec div `bucketSec`), one row per
    *         (cohort, age) with ≥1 active entity. */
  def cohortRetention(df: DataFrame, entityCol: String, tsSecCol: String,
      bucketSec: Long = 604800L): DataFrame = {
    require(bucketSec > 0, "bucketSec must be > 0")
    val b = df
      .filter(col(entityCol).isNotNull && col(tsSecCol).isNotNull)
      .select(col(entityCol).as("_ent"),
        expr(s"CAST($tsSecCol AS BIGINT) div $bucketSec").as("_bk"))
      .distinct()
    val cohort = b.groupBy("_ent").agg(min(col("_bk")).as("_ck"))
    val aged = b.join(cohort, Seq("_ent"))
      .groupBy(col("_ck").as("cohort"), (col("_bk") - col("_ck")).as("age"))
      .agg(count(lit(1)).as("n_active"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cohort")
    aged
      .withColumn("_n0",
        max(when(col("age") === 0, col("n_active"))).over(w))
      .select(col("cohort"), col("age"), col("n_active"),
        (col("n_active").cast("double") / col("_n0").cast("double"))
          .as("retention"))
  }

  /** Top-k frequent event-type sequences — "what do users actually DO,
    * in order?": every run of `n` consecutive events per entity (over
    * the (ts, id) total order) becomes a `>`-joined type n-gram, counted
    * corpus-wide — the behavioral-pattern mining that motivates funnel
    * definitions instead of assuming them. Ranking is deterministic:
    * (count desc, sequence asc).
    *
    * Scale notes (100 TB event tables): one entity-key window for the
    * leads (runs never cross entities), one partial-agg count; the
    * ranking window runs over the COUNT table, which is bounded by the
    * type-vocabulary to the n-th power (125 rows for 5 types at n = 3),
    * never by event volume.
    *
    * @return (`sequence`, `n_occ`, `rank` 1..topK). */
  def frequentSequences(df: DataFrame, entityCol: String,
      tsSecCol: String, idCol: String, typeCol: String, n: Int = 3,
      topK: Int = 20): DataFrame = {
    require(n >= 2 && n <= 8, s"n must be in [2, 8] (got $n)")
    require(topK >= 1, "topK must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol))
      .orderBy(col(tsSecCol).cast("long"), col(idCol))
    val leads = (1 until n).map(i => lead(col(typeCol), i).over(w))
    // null-typed events are dropped BEFORE the window: concat_ws skips
    // nulls, so a null head would silently count an (n−1)-gram as an
    // n-gram (and diverge from any SQL rebuild, where concat keeps the
    // separator)
    val counts = df
      .filter(col(typeCol).isNotNull)
      .select(concat_ws(">", col(typeCol) +: leads: _*).as("sequence"),
        leads.map(_.isNotNull).reduce(_ && _).as("_full"))
      .filter(col("_full"))
      .groupBy(col("sequence"))
      .agg(count(lit(1)).as("n_occ"))
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occ").desc, col("sequence"))
    counts
      .select(col("sequence"), col("n_occ"),
        row_number().over(rankW).cast("long").as("rank"))
      .filter(col("rank") <= topK)
  }

  /** Event-type transition matrix — the first-order Markov view of the
    * stream ("after a view, 31% click"): counts every consecutive
    * (current → next) type pair per entity over the (ts, id) total
    * order and normalizes per current state — the numbers behind Sankey
    * flows and next-event baselines, and the 2-gram special case of
    * [[frequentSequences]] WITH probabilities.
    *
    * Scale notes (100 TB): one entity-key window for the lead + one
    * partial-agg count; the per-state normalization window runs over
    * the transition table (type-vocabulary², e.g. 25 rows for 5 types),
    * never event volume.
    *
    * @return (`from_type`, `to_type`, `n`, `p` — n / Σ n over the same
    *         `from_type`). */
  def transitionMatrix(df: DataFrame, entityCol: String,
      tsSecCol: String, idCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol))
      .orderBy(col(tsSecCol).cast("long"), col(idCol))
    val counts = df
      .filter(col(typeCol).isNotNull) // the frequentSequences discipline
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wState = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    counts.select(col("from_type"), col("to_type"), col("n"),
      (col("n").cast("double") /
        sum(col("n")).over(wState).cast("double")).as("p"))
  }

  /** Conversion attribution — for every conversion event, which touch
    * gets the credit: the FIRST and LAST `touchTypes` event whose
    * timestamp falls in `[conversion − lookbackSec, conversion]`
    * (value-based window, so a same-second touch is eligible regardless
    * of id order; "first"/"last" break exact ts ties by `idCol` — ids
    * are the total-order tiebreak everywhere in this engine). Emits one
    * row per conversion with both attributions and the eligible-touch
    * count; conversions with no touch in the window keep nulls (they
    * are the "dark" conversions a marketing report must still count).
    *
    * Scale notes (100 TB event tables): non-participating event types
    * are filtered BEFORE the entity shuffle; both attributions and the
    * touch count ride ONE (entity, ts) RANGE window — the carried state
    * is two structs and a counter per frame, never the touch list. The
    * conversion filter happens after the window (a conversion needs its
    * preceding touches in-frame), so the shuffled volume is touches +
    * conversions — the funnel-relevant slice, not the raw stream.
    *
    * @return (`entityCol`, `conv_id`, `conv_ts`, `n_touches`,
    *         `first_id`, `first_ts`, `first_type`,
    *         `last_id`, `last_ts`, `last_type`). */
  def attribution(df: DataFrame, entityCol: String, tsSecCol: String,
      idCol: String, typeCol: String, convType: String,
      touchTypes: Seq[String], lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "touchTypes must be non-empty")
    require(!touchTypes.contains(convType),
      s"convType '$convType' must not also be a touch type")
    require(lookbackSec > 0, "lookbackSec must be > 0")
    // null-ts rows would otherwise enter the RANGE frame with
    // engine-specific null-ordering semantics (the interArrival /
    // linearTrend filter discipline)
    val relevant = df.filter(col(tsSecCol).isNotNull &&
      (col(typeCol) === convType || col(typeCol).isin(touchTypes: _*)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol))
      .orderBy(col(tsSecCol).cast("long"))
      .rangeBetween(-lookbackSec, 0)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col(tsSecCol).cast("long").as("ts"), col(idCol).as("id"),
        col(typeCol).as("tp")))
    relevant
      .select(col(entityCol), col(idCol), col(tsSecCol), col(typeCol),
        min(touch).over(w).as("_first"),
        max(touch).over(w).as("_last"),
        count(touch).over(w).as("n_touches"))
      .filter(col(typeCol) === convType)
      .select(col(entityCol), col(idCol).as("conv_id"),
        col(tsSecCol).cast("long").as("conv_ts"), col("n_touches"),
        col("_first.id").as("first_id"), col("_first.ts").as("first_ts"),
        col("_first.tp").as("first_type"),
        col("_last.id").as("last_id"), col("_last.ts").as("last_ts"),
        col("_last.tp").as("last_type"))
  }

  /** RFM segmentation — the classic customer-value tiling (recency /
    * frequency / monetary), and for corpus curation the same shape as
    * "segment sources by how fresh, prolific, and substantial they are".
    *
    * Per entity: `recency_sec` = reference instant − last activity
    * (reference = the GLOBAL max of `tsSecCol`, so the result is a pure
    * function of the data, not of the wall clock), `frequency` = event
    * count, `monetary` = exact integer sum of `amountCol` (caller
    * pre-scales floats — cents, not dollars-as-double: a double sum is
    * partition-order dependent). Scores tile each metric into `nTiles`
    * quantile bands via exact interpolated percentile cutoffs (Spark
    * `percentile` ≡ DuckDB `quantile_cont`); score `nTiles` is best —
    * most recent, most frequent, highest spend — and boundary ties land
    * on the LOWER band deterministically (value > cutoff moves up).
    *
    * Scale notes (100 TB order tables): one entity-key shuffle for the
    * per-entity aggregate; the reference instant and the 3·(nTiles−1)
    * cutoffs are 1-row aggregates broadcast back — the entity table is
    * never globally sorted and never single-partitions (the reason this
    * is percentile-cut, not corpus-wide ntile). Scoring is a narrow
    * codegen comparison chain.
    *
    * @return (`entityCol`, `recency_sec`, `frequency`, `monetary`,
    *         `r_score`, `f_score`, `m_score`, `rfm_code` = r·100+f·10+m). */
  def rfm(df: DataFrame, entityCol: String, tsSecCol: String,
      amountCol: String, nTiles: Int = 5): DataFrame = {
    require(nTiles >= 2 && nTiles <= 100,
      s"nTiles must be in [2, 100] (got $nTiles)")
    val per = df
      .filter(col(entityCol).isNotNull && col(tsSecCol).isNotNull &&
        col(amountCol).isNotNull)
      .groupBy(col(entityCol))
      .agg(max(col(tsSecCol).cast("long")).as("_last"),
        count(lit(1)).as("frequency"),
        sum(col(amountCol).cast("long")).as("monetary"))
    val asOf = per.agg(max(col("_last")).as("_asof"))
    val base = per.crossJoin(broadcast(asOf))
      .select(col(entityCol), (col("_asof") - col("_last")).as("recency_sec"),
        col("frequency"), col("monetary"))
    val ps = (1 until nTiles).map(k => k.toDouble / nTiles)
    val cutCols = ps.zipWithIndex.map { case (p, i) =>
      expr(s"percentile(recency_sec, $p)").as(s"_rc$i") } ++
      ps.zipWithIndex.map { case (p, i) =>
        expr(s"percentile(frequency, $p)").as(s"_fc$i") } ++
      ps.zipWithIndex.map { case (p, i) =>
        expr(s"percentile(monetary, $p)").as(s"_mc$i") }
    val cuts = base.agg(cutCols.head, cutCols.tail: _*)
    // band index = 1 + #cutoffs strictly below the value; recency
    // inverts (freshest = highest score)
    def band(v: String, pfx: String) = (ps.indices
      .map(i => when(col(v).cast("double") > col(s"_$pfx$i"), 1L)
        .otherwise(0L))
      .reduce(_ + _) + lit(1L)).cast("long")
    base.crossJoin(broadcast(cuts))
      .select(col(entityCol), col("recency_sec"), col("frequency"),
        col("monetary"),
        (lit(nTiles + 1L) - band("recency_sec", "rc")).as("r_score"),
        band("frequency", "fc").as("f_score"),
        band("monetary", "mc").as("m_score"))
      .withColumn("rfm_code",
        col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
  }
}
