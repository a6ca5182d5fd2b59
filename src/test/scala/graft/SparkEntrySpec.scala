package graft

/** Assembly invariants of the per-tier split: the driver-facing maps
  * must be exactly the disjoint union of the tier maps — a duplicated
  * query name across tiers would silently shadow one definition (Map ++
  * keeps the right operand), which is precisely the bug class a
  * mechanical split can introduce. */
class SparkEntrySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val tiers: Seq[(String, Map[String, _], Map[String, String])] =
    Seq(
      ("Etl", QueriesEtl.queries, QueriesEtl.oracles),
      ("Graph", QueriesGraph.queries, QueriesGraph.oracles),
      ("TimeSeries", QueriesTimeSeries.queries, QueriesTimeSeries.oracles),
      ("Validate", QueriesValidate.queries, QueriesValidate.oracles),
      ("Dedup", QueriesDedup.queries, QueriesDedup.oracles),
      ("Similarity", QueriesSimilarity.queries, QueriesSimilarity.oracles),
      ("Text", QueriesText.queries, QueriesText.oracles),
      ("Multimodal", QueriesMultimodal.queries, QueriesMultimodal.oracles),
      ("Sampling", QueriesSampling.queries, QueriesSampling.oracles))

  test("tier query maps are pairwise disjoint and sum to the contract") {
    val all = tiers.flatMap(_._2.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicated across tiers: $dups")
    assert(all.size == SparkEntry.queries.size,
      "++ must not shadow any tier entry")
  }

  test("tier oracle maps are pairwise disjoint; every oracle names an " +
      "implemented query") {
    val all = tiers.flatMap(_._3.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicated across tiers: $dups")
    assert(all.size == SparkEntry.oracleSql.size)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without a query: $orphans")
  }

  test("per-tier oracles stay with their tier's queries") {
    for ((name, qs, os) <- tiers) {
      val stray = os.keySet -- qs.keySet
      assert(stray.isEmpty, s"tier $name has oracles for foreign " +
        s"queries: $stray")
    }
  }
}
