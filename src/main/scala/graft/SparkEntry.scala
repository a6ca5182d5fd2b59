package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2 (+ the EXT LLM-pipeline operators), each with matching
  * DuckDB oracle SQL where the semantics are ANSI-SQL-expressible.
  *
  * Determinism rules (SURVEY.md §5/§7): every query ends in an explicit
  * orderBy over a key; float aggregates are rounded; timestamps are
  * emitted as epoch seconds to dodge µs-vs-ns parquet physical types.
  *
  * The query/oracle definitions live in per-tier objects under
  * `entries/` (QueriesEtl, QueriesGraph, ...); this object assembles
  * them into the two driver-facing maps. Tier maps are disjoint by
  * construction (names are prefixed per tier) — asserted in
  * SparkEntrySpec.
  */
object SparkEntry {

  /** Flagship: full config-compiled graph build (scan → project → union →
    * merge-by-id → fk/join-table edges) → per-label stats. */
  def entry(spark: SparkSession): DataFrame =
    EntryData.graphBuild(spark, "/root/testdata/sf0.001")

  /** The graph-spec fixture (FIXTURES.md §2) over the TPC-H-ish tables,
    * in the reference's config grammar. */
  def fixtureYaml(dir: String): String = EntryData.fixtureYaml(dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesEtl.queries ++
    QueriesGraph.queries ++
    QueriesTimeSeries.queries ++
    QueriesValidate.queries ++
    QueriesDedup.queries ++
    QueriesSimilarity.queries ++
    QueriesText.queries ++
    QueriesMultimodal.queries ++
    QueriesSampling.queries

  def oracleSql: Map[String, String] =
    QueriesEtl.oracles ++
    QueriesGraph.oracles ++
    QueriesTimeSeries.oracles ++
    QueriesValidate.oracles ++
    QueriesDedup.oracles ++
    QueriesSimilarity.oracles ++
    QueriesText.oracles ++
    QueriesMultimodal.oracles ++
    QueriesSampling.oracles
}
