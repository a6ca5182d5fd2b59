package graft.operators

import org.apache.spark.sql.DataFrame
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
}
