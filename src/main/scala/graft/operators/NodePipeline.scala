package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.SchemaMerge

/** Node-table construction: scan → field-alignment projection → multi-source
  * union → merge-by-id.
  *
  * Implements the reference's *documented* contract, not its bugs:
  *  - P1 field alignment / null-fill (graph_db_builder.py:253-290, contract
  *    :474-479; the reference's write loop ignored its own field map, Quirk
  *    Q4 — we implement the documented behavior).
  *  - A3 multi-source union (graph_db_builder.py:24-28, :338-342).
  *  - A2 merge-by-id (docstring graph_db_builder.py:493-497 — "maintains a
  *    record of already-seen nodes (based on the primary ID) and either
  *    merges data or creates a new entry"; never implemented there).
  *
  * Scale notes (100 TB): the projection is a pure narrow `select` that
  * Catalyst pushes into the parquet scan (column pruning); the union is a
  * plan-level concat (no shuffle); the only shuffle is the single hash
  * aggregation in [[mergeById]], partitioned by the node id — the minimum
  * possible for a dedup-by-key semantics. Merge precedence is expressed with
  * `max(when(rank === r, col))` + `coalesce`, which stays inside
  * whole-stage codegen and has a map-side partial aggregate.
  */
object NodePipeline {

  private[graft] val SrcRank = "_graft_src_rank"

  /** P1/P2: project `df` onto `target`, aligning fields by name, casting to
    * the merged type, and null-filling fields this source lacks. */
  def projectToSchema(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(target.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** A3: union all sources of one label onto the merged schema, tagging each
    * row with its source rank (config order) for deterministic merge
    * precedence. */
  def unionSources(sources: Seq[DataFrame]): DataFrame = {
    require(sources.nonEmpty, "node label needs at least one source")
    val target = SchemaMerge.mergeFields(sources.map(_.schema))
    sources.zipWithIndex
      .map { case (df, rank) =>
        projectToSchema(df, target).withColumn(SrcRank, lit(rank))
      }
      .reduce(_.unionByName(_))
  }

  /** A2: merge rows sharing `idKey` into one node. For each property the
    * value comes from the lowest-rank (first-in-config) source that has a
    * non-null value — "first source wins", made deterministic under shuffle
    * by ranking rather than arrival order (`first(ignoreNulls)` would be
    * shuffle-order-nondeterministic).
    *
    * Requires the input to carry [[SrcRank]] (added by [[unionSources]]).
    * Assumes each source contributes at most one row per id; if a source
    * itself has dup ids, rows collapse via `max` within that rank (the
    * `max(when(rank === r, col))` that implements precedence is also the
    * within-rank tie-break — deterministic, column-independent).
    */
  def mergeById(unioned: DataFrame, idKey: String, numSources: Int): DataFrame = {
    val props = unioned.columns.filter(c => c != idKey && c != SrcRank)
    val aggs: Seq[Column] = props.toIndexedSeq.map { c =>
      coalesce((0 until numSources).map { r =>
        max(when(col(SrcRank) === r, col(c)))
      }: _*).as(c)
    }
    unioned.groupBy(col(idKey)).agg(aggs.head, aggs.tail: _*)
  }

  /** One-shot convenience: union + merge. */
  def buildNodeTable(sources: Seq[DataFrame], idKey: String): DataFrame =
    mergeById(unionSources(sources), idKey, sources.length)
}
