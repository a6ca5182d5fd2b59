package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over built relationship tables — the queries the
  * reference defers to Neo4j after export (`neo4j-admin import`, then
  * Cypher), runnable in-engine on the same `(start_id, end_id)` frames
  * [[RelPipeline]] produces. Everything is joins + aggregations, so
  * Catalyst/AQE plan it like any relational workload.
  *
  * Scale notes (100 TB): [[degrees]] is one partial-aggregated groupBy on
  * the edge table (map-side combine — shuffle rows are (id, count), not
  * edges). [[kHop]] is `hops` iterations of frontier ⋈ edges; the frontier
  * is usually ≪ edges, so AQE broadcasts it and the edge table never
  * shuffles. Frontier dedup per round keeps the join input minimal, and
  * `localCheckpoint` truncates lineage so iteration depth never compounds
  * the plan.
  *
  * localCheckpoint caveats (shared by every iterative operator here):
  * checkpointed partitions live in executor block-manager storage and are
  * released by the ContextCleaner only after the referencing Datasets are
  * garbage-collected — a long-lived driver session running many iterative
  * jobs should expect intermediate rank/frontier snapshots to linger until
  * the next GC cycle. And the storage is non-fault-tolerant: losing an
  * executor mid-computation fails the job instead of recomputing (the same
  * trade documented on `Dedup.simhashNearDups`); for multi-hour cluster
  * runs, substitute a reliable `checkpoint()` via
  * `sparkContext.setCheckpointDir`.
  */
object GraphOps {

  import RelPipeline.{StartId, EndId}

  /** Per-node degree over an edge table: `out`, `in`, or `total`
    * (undirected) degree. One hash aggregation. */
  def degrees(edges: DataFrame, direction: String = "out"): DataFrame =
    direction match {
      case "out" =>
        edges.groupBy(col(StartId).as("id"))
          .agg(count(lit(1)).as("degree"))
      case "in" =>
        edges.groupBy(col(EndId).as("id"))
          .agg(count(lit(1)).as("degree"))
      case "total" =>
        edges.select(col(StartId).as("id"))
          .unionAll(edges.select(col(EndId).as("id")))
          .groupBy(col("id"))
          .agg(count(lit(1)).as("degree"))
      case other =>
        throw new IllegalArgumentException(
          s"direction must be out | in | total, got '$other'")
    }

  /** Connected components over an edge table (edge direction ignored):
    * each node labelled with the smallest node id in its component —
    * the graph-surface entry point for [[Dedup.connectedComponents]]'
    * min-label propagation + pointer jumping (O(log diameter) rounds).
    * Output: (`id`, `component`); isolated endpoints label themselves. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val vertices = edges.select(col(StartId).as("id"))
      .unionAll(edges.select(col(EndId).as("id"))).distinct()
    val pairs = edges.select(col(StartId).as("id_a"), col(EndId).as("id_b"))
    Dedup.connectedComponents(vertices, "id", pairs, maxIter)
      .select(col("id"), col("comp").as("component"))
  }

  /** PageRank over a directed edge table — power iteration with the
    * standard damping model and dangling-mass redistribution:
    *
    *   rank'(v) = (1−d)/N + d·( Σ_{u→v} rank(u)/outdeg(u) + dangling/N )
    *
    * where `dangling` is the total rank mass sitting on nodes with no
    * out-edges (without the redistribution term, mass leaks every
    * iteration and ranks stop summing to 1).
    *
    * Scale notes (100 TB edge table): each iteration is one equi-join of
    * the rank vector (|V| rows — small relative to edges) against the edge
    * table plus a partial-aggregated groupBy on the destination — AQE
    * broadcasts the rank side when it fits, so the edge table never
    * re-shuffles across iterations. The dangling sum is a 1-row aggregate
    * on the rank vector. `localCheckpoint` per iteration truncates the
    * lineage so plan depth stays constant; the edge/degree tables are
    * checkpointed once up front so they are not re-derived each round.
    * Skewed in-degree (a celebrity node) is a groupBy — map-side combine
    * absorbs it.
    *
    * Returns (`id`, `rank`); ranks sum to 1 over the node set (all
    * endpoints of `edges`, plus `nodes` if supplied for isolated
    * vertices). */
  def pageRank(edges: DataFrame, damping: Double = 0.85,
      iterations: Int = 10, nodes: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(damping >= 0 && damping < 1, "damping must be in [0, 1)")
    val e = edges.select(col(StartId).as("src"), col(EndId).as("dst"))
      .localCheckpoint()
    val endpoints = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
    val n = nodes.fold(endpoints)(extra =>
        endpoints.unionAll(extra.select(col(extra.columns.head).as("id"))))
      .distinct().localCheckpoint()
    val nNodes = n.count().toDouble
    val deg = e.groupBy("src").agg(count(lit(1)).as("_deg")).localCheckpoint()
    var ranks = n.withColumn("rank", lit(1.0 / nNodes)).localCheckpoint()
    var i = 0
    while (i < iterations) {
      // rank mass on dangling nodes (no out-edges) — redistributed uniformly
      val dangling = ranks.join(deg, ranks("id") === deg("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val inflow = ranks
        .join(e, ranks("id") === e("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("_deg")).as("_in"))
      ranks = n.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / nNodes) +
            lit(damping) * (coalesce(col("_in"), lit(0.0)) +
              lit(dangling / nNodes))).as("rank"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }

  /** Personalized PageRank: like [[pageRank]], but the (1−d) reset mass
    * and the dangling mass return to the SEED distribution (uniform over
    * `seeds`) instead of to all nodes —
    *
    *   rank'(v) = (1−d)·s(v) + d·( Σ_{u→v} rank(u)/outdeg(u) + dangling·s(v) )
    *
    * with s(v) = 1/|seeds| on seeds, 0 elsewhere. Ranks measure proximity
    * to the seed set (the "related items" / recommendation primitive);
    * they still sum to 1. Initial vector = s. Same per-iteration plan
    * shape and scale behaviour as [[pageRank]] — the seed indicator is one
    * extra column on the node table, joined once. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      damping: Double = 0.85, iterations: Int = 10): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(damping >= 0 && damping < 1, "damping must be in [0, 1)")
    val e = edges.select(col(StartId).as("src"), col(EndId).as("dst"))
      .localCheckpoint()
    val n = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
      .distinct()
    val seedSet = seeds.select(col(seeds.columns.head).as("id")).distinct()
      .localCheckpoint()
    val nSeeds = seedSet.count()
    require(nSeeds > 0, "seeds must be non-empty")
    // node table with the reset weight s(v), checkpointed once
    val ns = n.join(seedSet.withColumn("_s", lit(1.0 / nSeeds)), Seq("id"),
        "left")
      .select(col("id"), coalesce(col("_s"), lit(0.0)).as("_s"))
      .localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("_deg")).localCheckpoint()
    var ranks = ns.select(col("id"), col("_s").as("rank")).localCheckpoint()
    var i = 0
    while (i < iterations) {
      val dangling = ranks.join(deg, ranks("id") === deg("src"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val inflow = ranks
        .join(e, ranks("id") === e("src"))
        .join(deg, Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("_deg")).as("_in"))
      ranks = ns.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) * col("_s") +
            lit(damping) * (coalesce(col("_in"), lit(0.0)) +
              lit(dangling) * col("_s"))).as("rank"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }

  /** Per-vertex triangle counts over an UNDIRECTED graph (edge direction
    * in the input is ignored; parallel edges and self-loops are dropped).
    *
    * Degree-ordered ("compact-forward") enumeration: every edge is
    * oriented from its lower-(degree, id) endpoint to the higher, wedges
    * are generated only between a vertex's out-neighbours, and a wedge
    * closes iff its (ordered) third side exists in the oriented edge set —
    * so each triangle is found exactly once.
    *
    * Scale notes (100 TB edge table): naive wedge generation explodes on
    * hubs (Σ deg² — a celebrity vertex alone can emit 10¹² wedges). The
    * degree orientation caps out-degree at O(√m), making the wedge volume
    * O(m^1.5) worst case and far less on real skewed graphs — this is the
    * standard distributed triangle algorithm. Joins are plain equi-joins
    * (AQE handles residual skew); the oriented edge list is checkpointed
    * once and reused by both sides of the wedge join. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonical undirected edge list: a < b, dedup, no self-loops
    val canon = edges.select(
        least(col(StartId), col(EndId)).as("a"),
        greatest(col(StartId), col(EndId)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(col("a").as("id"))
      .unionAll(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("_d"))
    // orient low-(deg, id) → high-(deg, id); carry the dst's degree so the
    // wedge join can order out-neighbours without another lookup
    val oriented = canon
      .join(deg.withColumnRenamed("id", "a").withColumnRenamed("_d", "_da"),
        Seq("a"))
      .join(deg.withColumnRenamed("id", "b").withColumnRenamed("_d", "_db"),
        Seq("b"))
      .select(
        when(col("_da") < col("_db") ||
            (col("_da") === col("_db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst"), col("_db").as("_dd")))
          .otherwise(
            struct(col("b").as("src"), col("a").as("dst"), col("_da").as("_dd")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e._dd").as("_dd"))
      .localCheckpoint()
    val x = oriented.alias("x")
    val y = oriented.alias("y")
    // wedges (u; v, w) with v before w in (deg, id) order — the closing
    // edge, if present, is oriented exactly v → w
    val wedges = x.join(y, col("x.src") === col("y.src") &&
        (col("x._dd") < col("y._dd") ||
          (col("x._dd") === col("y._dd") && col("x.dst") < col("y.dst"))))
      .select(col("x.src").as("u"), col("x.dst").as("v"),
        col("y.dst").as("w"))
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    val triangles = wedges.join(closing, Seq("v", "w"))
    triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Nodes reachable from `seeds` in EXACTLY 1..`hops` directed steps,
    * with the minimum hop count at which each node is first reached —
    * BFS as iterated joins. Seed nodes themselves are emitted with hop 0.
    *
    * @param seeds one-column DataFrame of starting node ids (column name
    *              irrelevant; first column is used).
    */
  def kHop(edges: DataFrame, seeds: DataFrame, hops: Int): DataFrame = {
    require(hops >= 0, "hops must be >= 0")
    val e = edges.select(col(StartId), col(EndId))
    var reached = seeds.select(col(seeds.columns.head).as("id")).distinct()
      .withColumn("hop", lit(0))
      .localCheckpoint()
    var frontier = reached
    var h = 1
    while (h <= hops && !frontier.isEmpty) {
      // expand the PREVIOUS frontier only, then keep first-reach rows
      val next = frontier.join(e, frontier("id") === e(StartId))
        .select(col(EndId).as("id")).distinct()
        .join(reached.select("id"), Seq("id"), "left_anti")
        .withColumn("hop", lit(h))
        .localCheckpoint()
      reached = reached.unionByName(next).localCheckpoint()
      frontier = next
      h += 1
    }
    reached
  }
}
