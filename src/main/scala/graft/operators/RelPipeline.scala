package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relationship-table construction — the reference specified this entirely
  * in config grammar and dataclass fields but shipped a silent no-op (Quirk
  * Q2: graph_db_builder.py:344-345 shadowed by :404-405). We implement the
  * declared semantics (config.yml:35-54):
  *
  *  - J1 `foreign_key`: an edge (start → end) exists where
  *    `start.table.key = end.table.key` — an equi inner join.
  *  - J2 `join_table`: each row of the join table is an edge
  *    `from_field → to_field`; endpoints are validated against the node
  *    tables (left-semi), with the complement (left-anti) exposed as a
  *    dangling-edge QC report.
  *  - J3 endpoint resolution: edges reference nodes by the node's `id_key`
  *    (config.yml:20,:43,:46; graph_db_builder.py:463-466).
  *
  * Scale notes (100 TB): edge construction is join-bound. Node tables are
  * usually dimension-like relative to edge/fact tables, so callers can pass
  * `broadcastNodes = true` to broadcast-hash the validation joins and avoid
  * shuffling the (huge) edge side; otherwise Spark/AQE picks sort-merge and
  * both sides shuffle-partition on the join key — still the minimal shuffle
  * for the semantics. Output column naming is fixed (`start_id`, `end_id`,
  * edge props) so downstream sinks are schema-stable.
  */
object RelPipeline {

  val StartId = "start_id"
  val EndId = "end_id"

  /** J1: foreign-key edges. BOTH endpoints resolve to the owning node's
    * `id_key` (J3 contract, config.yml:20,:43,:46): the edge's `start_id` is
    * `startIdKey` from the start row — NOT the raw join key, which may be a
    * foreign key into a third table (e.g. CUSTOMER_IN_NATION joins on
    * c_nationkey but the Customer node's id is c_custkey). Edge properties
    * can come from either side (`startProps` / `endProps`). */
  def foreignKeyEdges(
      startDf: DataFrame, startKey: String, startIdKey: String,
      endDf: DataFrame, endKey: String, endIdKey: String,
      startProps: Seq[String] = Nil,
      endProps: Seq[String] = Nil,
      broadcastStart: Boolean = false): DataFrame = {
    val s = startDf.alias("s")
    val e = endDf.alias("e")
    val left = if (broadcastStart) broadcast(s) else s
    left.join(e, col(s"s.$startKey") === col(s"e.$endKey"), "inner")
      .select(
        (col(s"s.$startIdKey").as(StartId) +:
          col(s"e.$endIdKey").as(EndId) +:
          (startProps.map(p => col(s"s.$p").as(p)) ++
            endProps.map(p => col(s"e.$p").as(p)))): _*)
  }

  /** J2: join-table edges with endpoint validation. The semi-joins keep only
    * edges whose endpoints exist in the node tables. */
  def joinTableEdges(
      edgeTable: DataFrame, fromField: String, toField: String,
      startNodes: DataFrame, startIdKey: String,
      endNodes: DataFrame, endIdKey: String,
      props: Seq[String] = Nil,
      broadcastNodes: Boolean = true): DataFrame = {
    val projected = edgeTable.select(
      (col(fromField).as(StartId) +: col(toField).as(EndId) +:
        props.map(col)): _*)
    val sKeys = startNodes.select(col(startIdKey).as(StartId))
    val eKeys = endNodes.select(col(endIdKey).as(EndId))
    val (sv, ev) =
      if (broadcastNodes) (broadcast(sKeys), broadcast(eKeys))
      else (sKeys, eKeys)
    projected
      .join(sv, Seq(StartId), "left_semi")
      .join(ev, Seq(EndId), "left_semi")
      .select((col(StartId) +: col(EndId) +: props.map(col)): _*)
  }

  /** QC: edges whose start or end endpoint does NOT resolve to a node —
    * the anti-join complement of [[joinTableEdges]]'s validation. */
  def danglingEdges(
      edgeTable: DataFrame, fromField: String, toField: String,
      startNodes: DataFrame, startIdKey: String,
      endNodes: DataFrame, endIdKey: String,
      broadcastNodes: Boolean = true): DataFrame = {
    val projected = edgeTable
      .select(col(fromField).as(StartId), col(toField).as(EndId))
    val sKeys = startNodes.select(col(startIdKey).as(StartId))
    val eKeys = endNodes.select(col(endIdKey).as(EndId))
    val (sv, ev) =
      if (broadcastNodes) (broadcast(sKeys), broadcast(eKeys))
      else (sKeys, eKeys)
    val noStart = projected.join(sv, Seq(StartId), "left_anti")
      .select(lit("missing_start").as("reason"), col(StartId), col(EndId))
    val noEnd = projected.join(ev, Seq(EndId), "left_anti")
      .select(lit("missing_end").as("reason"), col(StartId), col(EndId))
    noStart.unionByName(noEnd)
  }

  /** J7: co-occurrence edge inference — derive item↔item edges from a
    * shared-group fact table (parts co-purchased in an order, tags
    * co-applied to a doc): the third edge strategy next to J1's key
    * joins and J2's explicit join tables, for when the relationship is
    * IMPLIED by transactions rather than declared by schema. Edges are
    * undirected, canonicalized `start_id < end_id`, weighted by the
    * number of distinct groups containing both items.
    *
    * Scale notes (100 TB fact tables): the quadratic step is bounded
    * BEFORE it happens — groups are deduped to distinct (group, item),
    * sized with one partial-agg count, and groups wider than
    * `maxGroupSize` are EXCLUDED from pairing (a 10⁶-item group would
    * emit 10¹² pairs; a size cap is the standard market-basket guard).
    * Excluded groups are reported, not silently dropped: the second
    * frame returns (group, n_items) for every skipped group — the
    * [[Dedup]] `minhashBucketOverflow` side-channel pattern. Pair
    * expansion is a bucket-local self-join on the group key; the pair
    * aggregation partial-aggs map-side. `minCount` prunes the long tail
    * of coincidental pairs at the reducer.
    *
    * @return (edges (`start_id`, `end_id`, `weight`),
    *         overflow (`group`, `n_items`)). */
  def cooccurrenceEdges(facts: DataFrame, groupCol: String,
      itemCol: String, maxGroupSize: Int, minCount: Long = 1L,
      ckpt: graft.Checkpointer = graft.Checkpointer.Local)
      : (DataFrame, DataFrame) = {
    require(maxGroupSize >= 2, "maxGroupSize must be >= 2")
    require(minCount >= 1, "minCount must be >= 1")
    val (kept, overflow) =
      gatedMembers(facts, groupCol, itemCol, maxGroupSize, ckpt)
    val a = kept.select(col("_g"), col("_i").as(StartId))
    val b = kept.select(col("_g"), col("_i").as(EndId))
    val edges = a.join(b, Seq("_g"))
      .filter(col(StartId) < col(EndId))
      .groupBy(col(StartId), col(EndId))
      .agg(count(lit(1)).as("weight"))
      .filter(col("weight") >= minCount)
    (edges, overflow)
  }

  /** Shared basket prep for [[cooccurrenceEdges]] / [[associationRules]]:
    * distinct (group, item) members, size-gated at `maxGroupSize` with
    * the excluded groups reported. Both frames checkpointed — members is
    * consumed by sizes AND the gate join, and the gated result by every
    * downstream consumer (without the cut the output-alias renames
    * defeat exchange reuse and the distinct subtree runs three times). */
  private def gatedMembers(facts: DataFrame, groupCol: String,
      itemCol: String, maxGroupSize: Int, ckpt: graft.Checkpointer)
      : (DataFrame, DataFrame) = {
    val members = ckpt(facts
      .select(col(groupCol).as("_g"), col(itemCol).as("_i"))
      .distinct())
    val sizes = members.groupBy("_g").agg(count(lit(1)).as("n_items"))
    val overflow = sizes.filter(col("n_items") > maxGroupSize)
      .select(col("_g").as("group"), col("n_items"))
    val kept = ckpt(members
      .join(sizes.filter(col("n_items") <= maxGroupSize).select("_g"),
        Seq("_g")))
    (kept, overflow)
  }

  /** Association-rule mining over the same gated baskets as
    * [[cooccurrenceEdges]] — the market-basket step AFTER co-occurrence:
    * not just "a and b appear together" but the directed "baskets with a
    * also contain b" with the three standard strengths — `support` =
    * P(a∧b), `confidence` = P(b|a), `lift` = P(a∧b)/(P(a)·P(b)) (> 1 ⇒
    * genuinely associated, < 1 ⇒ substitutes). Rules emit in BOTH
    * directions (a→b and b→a differ in confidence).
    *
    * The probability universe is the GATED baskets (groups wider than
    * `maxGroupSize` excluded AND reported) — counts, supports, and lifts
    * are all consistent with the pair counts, never mixed between the
    * raw and gated corpus.
    *
    * Exactness: all counts are exact longs; the lift cross-products run
    * in decimal(38,0) BEFORE the one double division (n_baskets·pair_n
    * overflows a long at ~10¹⁰ baskets); confidence/support are single
    * double divisions of exact longs — every shape mirrorable in ANSI
    * SQL.
    *
    * Scale notes (100 TB fact tables): the [[cooccurrenceEdges]] guards
    * verbatim (distinct → size gate → bucket-local pair join, partial-agg
    * everywhere); `n_baskets` is a 1-row aggregate broadcast back; the
    * item-count joins are item-dimension-sized equi-joins left to AQE.
    *
    * @return (rules (`antecedent`, `consequent`, `pair_n`, `ante_n`,
    *         `cons_n`, `n_baskets`, `support`, `confidence`, `lift`),
    *         overflow (`group`, `n_items`)). */
  def associationRules(facts: DataFrame, groupCol: String,
      itemCol: String, maxGroupSize: Int, minCount: Long = 1L,
      minConfidence: Double = 0.0,
      ckpt: graft.Checkpointer = graft.Checkpointer.Local)
      : (DataFrame, DataFrame) = {
    require(maxGroupSize >= 2, "maxGroupSize must be >= 2")
    require(minCount >= 1, "minCount must be >= 1")
    require(minConfidence >= 0.0 && minConfidence <= 1.0,
      s"minConfidence must be in [0, 1] (got $minConfidence)")
    val dec = "decimal(38,0)"
    val (kept, overflow) =
      gatedMembers(facts, groupCol, itemCol, maxGroupSize, ckpt)
    val nBaskets = kept.agg(countDistinct(col("_g")).as("n_baskets"))
    val itemC = kept.groupBy(col("_i")).agg(count(lit(1)).as("_ic"))
    val pairs = kept.select(col("_g"), col("_i").as("antecedent"))
      .join(kept.select(col("_g"), col("_i").as("consequent")), Seq("_g"))
      .filter(col("antecedent") =!= col("consequent"))
      .groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minCount)
    val confidence =
      col("pair_n").cast("double") / col("ante_n").cast("double")
    val rules = pairs
      .join(itemC.select(col("_i").as("antecedent"),
        col("_ic").as("ante_n")), Seq("antecedent"))
      .join(itemC.select(col("_i").as("consequent"),
        col("_ic").as("cons_n")), Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .filter(confidence >= lit(minConfidence))
      .select(col("antecedent"), col("consequent"), col("pair_n"),
        col("ante_n"), col("cons_n"), col("n_baskets"),
        (col("pair_n").cast("double") / col("n_baskets").cast("double"))
          .as("support"),
        confidence.as("confidence"),
        ((col("n_baskets").cast(dec) * col("pair_n").cast(dec))
          .cast("double") /
          (col("ante_n").cast(dec) * col("cons_n").cast(dec))
            .cast("double")).as("lift"))
    (rules, overflow)
  }
}
