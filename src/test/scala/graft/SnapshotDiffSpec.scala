package graft

import org.apache.spark.sql.functions._

import graft.operators.SnapshotDiff

/** CDC diff between staged snapshots: classification, null-safety,
  * schema-drift tolerance, partition invariance. */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def prev = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("b"), Some(20.0)),
    (3L, Some("c"), None),
    (4L, None, Some(40.0))
  ).toDF("id", "name", "score")

  private def cur = Seq(
    (1L, Some("a"), Some(10.0)),  // unchanged
    (2L, Some("B"), Some(20.0)),  // changed (name)
    (3L, Some("c"), Some(30.0)),  // changed (null -> value)
    (5L, Some("e"), Some(50.0))   // added; 4 removed
  ).toDF("id", "name", "score")

  test("diff: added/removed/changed classified, unchanged dropped") {
    val d = SnapshotDiff.diff(prev, cur, "id")
    val m = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("diff: payload carries CURRENT values, null for removed") {
    val d = SnapshotDiff.diff(prev, cur, "id")
    val byId = d.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(5L).getString(2) == "e" && byId(5L).getDouble(3) == 50.0)
    assert(byId(3L).getDouble(3) == 30.0)
    assert(byId(4L).isNullAt(2) && byId(4L).isNullAt(3))
  }

  test("diff: null==null is unchanged (null-safe compare)") {
    val p = Seq((1L, Option.empty[String])).toDF("id", "v")
    val c = Seq((1L, Option.empty[String])).toDF("id", "v")
    assert(SnapshotDiff.diff(p, c, "id").count() == 0)
  }

  test("diff: keepUnchanged + compareCols narrowing") {
    val all = SnapshotDiff.diff(prev, cur, "id", keepUnchanged = true)
    assert(all.count() == 5)
    // comparing only score: the name-only change on id 2 disappears
    val scoreOnly = SnapshotDiff.diff(prev, cur, "id",
      compareCols = Seq("score"))
    val m = scoreOnly.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!m.contains(2L) && m(3L) == "changed")
  }

  test("diff: schema drift — column only in current is ignored") {
    val c2 = cur.withColumn("extra", lit(1))
    val d = SnapshotDiff.diff(prev, c2, "id")
    assert(!d.columns.contains("extra"))
    assert(d.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L, 4L, 5L))
  }

  test("diff: fail-fast on unknown compare column / no shared columns") {
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(prev, cur, "id", compareCols = Seq("nope"))
    }
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(prev.select("id"), cur.select("id"), "id")
    }
  }

  test("diffStats: counts per class, partitioning-independent") {
    val s1 = SnapshotDiff.diffStats(prev.repartition(1), cur.repartition(7),
      "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = SnapshotDiff.diffStats(prev.repartition(5), cur.repartition(2),
      "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == Map("added" -> 1L, "removed" -> 1L, "changed" -> 2L,
      "unchanged" -> 1L))
    assert(s1 == s2)
  }

  test("scd2: runs collapse with null-safe change detection, " +
      "same-second boundaries keep order via run_seq, open row null") {
    // key 1: A@1 A@2 B@3 B@3(id tie) A@5 — runs A[1,3) B[3,5) A[5,∞)
    // key 2: null@1 null@2 C@3 — null is a STATE: runs null[1,3) C[3,∞)
    val d = Seq(
      (1L, 1L, 1L, Some("A")), (1L, 2L, 2L, Some("A")),
      (1L, 3L, 3L, Some("B")), (1L, 3L, 4L, Some("B")),
      (1L, 5L, 5L, Some("A")),
      (2L, 1L, 6L, None), (2L, 2L, 7L, None), (2L, 3L, 8L, Some("C")))
      .toDF("k", "es", "eid", "v")
    val out = SnapshotDiff.scd2(d, "k", "es", "eid", Seq("v"))
      .orderBy("k", "run_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4),
        Option(r.getString(5))))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 3L, 2L, Some("A")),
      (1L, 2L, 3L, 5L, 2L, Some("B")),
      (1L, 3L, 5L, -1L, 1L, Some("A")),
      (2L, 1L, 1L, 3L, 2L, None),
      (2L, 2L, 3L, -1L, 1L, Some("C"))))
    // partition invariance: the run structure is order-exact
    val re = SnapshotDiff.scd2(d.repartition(7), "k", "es", "eid",
        Seq("v"))
      .orderBy("k", "run_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.toSeq == out.map(t => (t._1, t._2, t._3)).toSeq)
    intercept[IllegalArgumentException] {
      SnapshotDiff.scd2(d, "k", "es", "eid", Nil)
    }
  }

  test("ksTest: hand-computed D with smallest-value tie-break, " +
      "identical samples D=0, exact statistic") {
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0).toDF("v")
    val r = SnapshotDiff.ksTest(a, b, "v").head()
    // cum gaps ×9: v=1:3, v=2:6, v=3:6, v=4:3, v=5:0 → D=6/9 at v=2
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 6.0 / 9.0)
    assert(r.getDouble(3) == 2.0) // tie with v=3 broken to smallest
    val same = SnapshotDiff.ksTest(a, a, "v").head()
    assert(same.getDouble(2) == 0.0 && same.getDouble(3) == 1.0)
  }

  test("psiDrift: identical snapshots score 0, a shifted bin pair " +
      "contributes symmetrically, outliers clamp into edge bins") {
    val a = Seq(1.0, 1.0, 5.0, 5.0, 9.0).toDF("v")
    val same = SnapshotDiff.psiDrift(a, a, "v", nBins = 5, lo = 0.0,
      hi = 10.0).collect()
    assert(same.length == 5)
    assert(same.forall(_.getDouble(5) == 0.0)) // p == q in every bin
    // shift the 9.0 to 1.0: bins 0 and 4 move by one count each
    val b = Seq(1.0, 1.0, 5.0, 5.0, 1.0).toDF("v")
    val drift = SnapshotDiff.psiDrift(a, b, "v", nBins = 5, lo = 0.0,
      hi = 10.0).orderBy("bin").collect()
    // bin 0: p=(2+1)/10, q=(3+1)/10; bin 4: p=(1+1)/10, q=(0+1)/10
    val psi0 = (0.3 - 0.4) * math.log(0.3 / 0.4)
    val psi4 = (0.2 - 0.1) * math.log(0.2 / 0.1)
    assert(math.abs(drift(0).getDouble(5) - psi0) < 1e-12)
    assert(math.abs(drift(4).getDouble(5) - psi4) < 1e-12)
    assert(drift(2).getDouble(5) == 0.0) // untouched bin
    // clamp: -100 joins bin 0, +100 joins bin 4 — not dropped
    val c = Seq(-100.0, 100.0).toDF("v")
    val edges = SnapshotDiff.psiDrift(c, c, "v", nBins = 5, lo = 0.0,
      hi = 10.0).orderBy("bin").collect()
    assert(edges(0).getLong(1) == 1L && edges(4).getLong(1) == 1L)
    assert((1 to 3).forall(edges(_).getLong(1) == 0L))
  }

  test("welchT: hand-computed t/df on unequal variances, degenerate " +
      "guards, partition invariance") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(2L, 4L, 6L, 8L, 10L).toDF("v")
    val r = SnapshotDiff.welchT(a, b, "v").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 5L)
    assert(math.abs(r.getDouble(2) - 2.5) < 1e-12)
    assert(math.abs(r.getDouble(3) - 6.0) < 1e-12)
    // var1 = 5/3, var2 = 10; se2 = 5/12 + 2 = 29/12
    assert(math.abs(r.getDouble(4) - (-3.5 / math.sqrt(29.0 / 12.0)))
      < 1e-12)
    val se2 = 29.0 / 12.0
    val dfExp = se2 * se2 /
      ((5.0 / 12.0) * (5.0 / 12.0) / 3.0 + 2.0 * 2.0 / 4.0)
    assert(math.abs(r.getDouble(5) - dfExp) < 1e-12)
    // single-row side → t/df null
    val tiny = SnapshotDiff.welchT(Seq(7L).toDF("v"), b, "v")
      .collect().head
    assert(tiny.isNullAt(4) && tiny.isNullAt(5))
    // zero variance on both sides → se2 = 0 → null
    val flat = SnapshotDiff.welchT(
      Seq(5L, 5L, 5L).toDF("v"), Seq(9L, 9L).toDF("v"), "v")
      .collect().head
    assert(flat.isNullAt(4) && flat.isNullAt(5))
    // partition invariance: exact decimal moments → identical doubles
    val rp = SnapshotDiff.welchT(a.repartition(7), b.repartition(5), "v")
      .collect().head
    assert(rp.getDouble(4) == r.getDouble(4) &&
      rp.getDouble(5) == r.getDouble(5))
  }

  test("mannWhitneyU: tie-free and tied rank runs hand-computed, " +
      "all-equal variance → null z, partition invariance") {
    // disjoint halves: U1 = 0, z = -9 / (2·sqrt(63/12))
    val r1 = SnapshotDiff.mannWhitneyU(
      Seq(1L, 2L, 3L).toDF("v"), Seq(4L, 5L, 6L).toDF("v"), "v")
      .collect().head
    assert(r1.getLong(0) == 3L && r1.getLong(1) == 3L)
    assert(r1.getLong(2) == 0L)
    assert(math.abs(r1.getDouble(3) -
      (-9.0 / (2.0 * math.sqrt(63.0 / 12.0)))) < 1e-12)
    // ties: [1,2,2] vs [2,3] → R1 = 7 (2s share rank 3), 2U1 = 2,
    // tie moment 24, var12 = 28.8
    val r2 = SnapshotDiff.mannWhitneyU(
      Seq(1L, 2L, 2L).toDF("v"), Seq(2L, 3L).toDF("v"), "v")
      .collect().head
    assert(r2.getLong(2) == 2L)
    assert(math.abs(r2.getDouble(3) -
      (-4.0 / (2.0 * math.sqrt(28.8 / 12.0)))) < 1e-12)
    // every value identical → tie correction zeroes the variance
    val r3 = SnapshotDiff.mannWhitneyU(
      Seq(4L, 4L).toDF("v"), Seq(4L, 4L, 4L).toDF("v"), "v")
      .collect().head
    assert(r3.isNullAt(3))
    // partition invariance: exact integer rank runs
    val rp = SnapshotDiff.mannWhitneyU(
      Seq(1L, 2L, 2L).toDF("v").repartition(4),
      Seq(2L, 3L).toDF("v").repartition(3), "v").collect().head
    assert(rp.getLong(2) == r2.getLong(2) &&
      rp.getDouble(3) == r2.getDouble(3))
  }

  test("schemaDrift: added/removed/type-changed columns; empty when " +
      "schemas agree; nullability ignored") {
    val prev = Seq((1L, "a", 2L)).toDF("id", "name", "n")
    val cur = Seq((1L, 2.0, true)).toDF("id", "n", "flag")
    val drift = SnapshotDiff.schemaDrift(prev, cur)
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(drift == Set(
      ("flag", "added", None, Some("boolean")),
      ("name", "removed", Some("string"), None),
      ("n", "type_changed", Some("bigint"), Some("double"))))
    // identical schemas -> empty report, even when VALUES differ
    assert(SnapshotDiff.schemaDrift(prev,
      Seq((9L, "z", 0L)).toDF("id", "name", "n")).count() == 0)
    // nullability flips alone do not report
    val nn = prev.select(col("id"),
      coalesce(col("name"), lit("x")).as("name"), col("n"))
    assert(SnapshotDiff.schemaDrift(prev, nn).count() == 0)
  }
}
