package graft

import org.apache.spark.sql.Row

import graft.operators.RelPipeline

/** J1/J2/J3 edge construction + dangling-edge QC (SURVEY.md §2.3 — the
  * reference declared these semantics but shipped a no-op, Quirk Q2). */
class RelPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val customers = Seq((1L, "alice"), (2L, "bob"))
    .toDF("cust_id", "name")
  private lazy val orders = Seq((10L, 1L, 5.0), (11L, 1L, 7.0), (12L, 9L, 1.0))
    .toDF("order_id", "cust_fk", "total")

  test("foreignKeyEdges: inner equi-join, start/end ids + edge props") {
    val edges = RelPipeline.foreignKeyEdges(
      customers, "cust_id", "cust_id", orders, "cust_fk", "order_id",
      endProps = Seq("total"))
      .orderBy("start_id", "end_id").collect()
    // order 12 has no matching customer -> excluded (inner join)
    assert(edges.toSeq == Seq(Row(1L, 10L, 5.0), Row(1L, 11L, 7.0)))
  }

  test("foreignKeyEdges: start_id resolves to the node id when the join key" +
      " is a foreign key; props carried from both sides") {
    // customers carry a region fk; the edge must emit cust_id as start_id,
    // NOT the region key it joins on (region keys alias onto cust ids!)
    val custWithRegion = Seq((1L, "alice", 10L), (2L, "bob", 20L))
      .toDF("cust_id", "name", "region_fk")
    val regions = Seq((10L, "emea"), (20L, "apac"))
      .toDF("region_id", "region_name")
    val edges = RelPipeline.foreignKeyEdges(
      custWithRegion, "region_fk", "cust_id",
      regions, "region_id", "region_id",
      startProps = Seq("name"), endProps = Seq("region_name"))
      .orderBy("start_id").collect()
    assert(edges.toSeq == Seq(
      Row(1L, 10L, "alice", "emea"),
      Row(2L, 20L, "bob", "apac")))
  }

  test("joinTableEdges: semi-join validation drops dangling endpoints") {
    val joinTable = Seq((1L, 10L), (2L, 99L), (7L, 10L))
      .toDF("from_c", "to_o")
    val edges = RelPipeline.joinTableEdges(
      joinTable, "from_c", "to_o",
      customers, "cust_id", orders, "order_id")
      .orderBy("start_id").collect()
    // (2,99): end missing; (7,10): start missing -> only (1,10) survives
    assert(edges.toSeq == Seq(Row(1L, 10L)))
  }

  test("danglingEdges: anti-join complement reports both failure modes") {
    val joinTable = Seq((1L, 10L), (2L, 99L), (7L, 10L))
      .toDF("from_c", "to_o")
    val dang = RelPipeline.danglingEdges(
      joinTable, "from_c", "to_o",
      customers, "cust_id", orders, "order_id")
      .orderBy("reason", "start_id").collect()
    assert(dang.toSeq == Seq(
      Row("missing_end", 2L, 99L),
      Row("missing_start", 7L, 10L)))
  }

  test("cooccurrenceEdges: canonical pairs, duplicate facts dedup, " +
      "size cap reported not silently dropped, minCount prunes") {
    // group 1: items {10, 20, 30}; group 2: {10, 20} (10 twice — one
    // membership); group 3: {1..5} — over the cap of 4
    val facts = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 10L), (2L, 20L),
      (3L, 1L), (3L, 2L), (3L, 3L), (3L, 4L), (3L, 5L))
      .toDF("g", "item")
    val (edges, overflow) = RelPipeline.cooccurrenceEdges(
      facts, "g", "item", maxGroupSize = 4)
    val e = edges.orderBy("start_id", "end_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // (10,20) in groups 1 and 2; (10,30), (20,30) only in group 1;
    // nothing from the capped group 3
    assert(e.toSeq == Seq((10L, 20L, 2L), (10L, 30L, 1L), (20L, 30L, 1L)))
    assert(overflow.collect().map(r =>
      (r.getLong(0), r.getLong(1))).toSeq == Seq((3L, 5L)))
    val (strong, _) = RelPipeline.cooccurrenceEdges(
      facts, "g", "item", maxGroupSize = 4, minCount = 2L)
    assert(strong.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSeq == Seq((10L, 20L, 2L)))
  }

  test("associationRules: hand-computed support/confidence/lift, both " +
      "directions, gated universe, thresholds, partition-invariant") {
    // baskets: b1={A,B,C} b2={A,B} b3={A,C} b4={A}; b5 has 4 items —
    // excluded by the size gate, so the universe is 4 baskets with
    // item counts A=4, B=2, C=2
    val facts = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "A"),
      (5L, "B"), (5L, "D"), (5L, "E"), (5L, "F"))
      .toDF("g", "item")
    val (rules, overflow) = RelPipeline.associationRules(
      facts, "g", "item", maxGroupSize = 3)
    val r = rules.collect().map(x => (x.getString(0), x.getString(1)) ->
      (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
        x.getDouble(6), x.getDouble(7), x.getDouble(8))).toMap
    // A→B: pair 2 of 4 baskets, conf 2/4, lift 4·2/(4·2) = 1
    assert(r(("A", "B")) == ((2L, 4L, 2L, 4L, 0.5, 0.5, 1.0)))
    // B→A: same pair, conf 2/2 = 1
    assert(r(("B", "A")) == ((2L, 2L, 4L, 4L, 0.5, 1.0, 1.0)))
    // B→C: together only in b1 — conf 1/2, lift 4/(2·2) = 1
    assert(r(("B", "C")) == ((1L, 2L, 2L, 4L, 0.25, 0.5, 1.0)))
    assert(r.size == 6) // A↔B, A↔C, B↔C, both directions
    assert(overflow.collect().map(x =>
      (x.getLong(0), x.getLong(1))).toSeq == Seq((5L, 4L)))
    // confidence gate keeps only the certain antecedents (B→A, C→A)
    val (sure, _) = RelPipeline.associationRules(
      facts, "g", "item", maxGroupSize = 3, minConfidence = 0.6)
    assert(sure.collect().map(x => (x.getString(0), x.getString(1)))
      .toSet == Set(("B", "A"), ("C", "A")))
    // pair-count gate drops the single-basket B↔C
    val (freq, _) = RelPipeline.associationRules(
      facts, "g", "item", maxGroupSize = 3, minCount = 2L)
    assert(freq.count() == 4)
    val re = RelPipeline.associationRules(
      facts.repartition(7), "g", "item", maxGroupSize = 3)._1
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
          x.getDouble(6), x.getDouble(7), x.getDouble(8))).toMap
    assert(re == r) // exact — integer counts, decimal cross-products
  }
}
