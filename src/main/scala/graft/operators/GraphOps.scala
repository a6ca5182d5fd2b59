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
