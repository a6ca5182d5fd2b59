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
}
