package graft

import org.apache.spark.sql.functions._

import graft.operators.Validate
import graft.operators.Validate._

/** Declarative QC rules: one-pass report + row-level quarantine tags. */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (Some(1L), Some("O"), Some(10.0), Some("1-URGENT")),
    (Some(2L), Some("F"), Some(-5.0), Some("2-HIGH")),   // range fail
    (Some(2L), Some("X"), Some(20.0), Some("bad")),      // dup id, bad set+regex
    (None,     None,      None,       None)              // nulls
  ).toDF("id", "status", "price", "prio")

  private def rules = Seq(
    NotNull("id"), Unique("id"),
    InSet("status", Seq("O", "F", "P")),
    InRange("price", 0.0, 100.0),
    Matches("prio", "^[1-5]-[A-Z]+$"))

  test("report: per-rule violation counts, one pass, rule order kept") {
    val rep = Validate.report(sample, rules)
    val rows = rep.collect().map(r =>
      r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
    assert(rows.map(_._1).toSeq == rules.map(_.name)) // input order
    val m = rows.toMap
    assert(m("not_null(id)") == ((4L, 1L, false)))
    assert(m("unique(id)") == ((4L, 1L, false)))   // 3 non-null, 2 distinct
    assert(m("in_set(status)") == ((4L, 1L, false)))  // "X"; null passes
    assert(m("in_range(price)") == ((4L, 1L, false))) // -5.0
    assert(m("matches(prio)") == ((4L, 1L, false)))   // "bad"
  }

  test("report: clean table passes every rule") {
    val clean = Seq((1L, "O"), (2L, "F")).toDF("id", "status")
    val rep = Validate.report(clean,
      Seq(NotNull("id"), Unique("id"), InSet("status", Seq("O", "F"))))
    assert(rep.collect().forall(_.getBoolean(4)))
    assert(rep.collect().forall(_.getLong(3) == 0L))
  }

  test("report: result is partitioning-independent") {
    val a = Validate.report(sample.repartition(1), rules).collect().toSeq
    val b = Validate.report(sample.repartition(7), rules).collect().toSeq
    assert(a == b)
  }

  test("annotate: rows tagged with exactly their failed row-local rules") {
    val out = Validate.annotate(sample, rules)
    assert(out.columns.contains("violations"))
    val tags = out.select(col("id"), col("violations"))
      .collect()
      .map(r => (Option(r.get(0)), r.getSeq[String](1).sorted.toList))
    // dup-id row: Unique is dataset-level → NOT tagged per-row
    assert(tags.count(_._2.contains("unique(id)")) == 0)
    val badRow = tags.find(t => t._2.contains("in_set(status)")).get
    assert(badRow._2 == List("in_set(status)", "matches(prio)"))
    val nullRow = tags.find(_._1.isEmpty).get
    assert(nullRow._2 == List("not_null(id)")) // null passes range/set/regex
    val cleanRow = tags.find(_._1.contains(1L)).get
    assert(cleanRow._2.isEmpty)
  }

  test("annotate: quarantine routing splits clean from dirty") {
    val out = Validate.annotate(sample, rules)
    val clean = out.filter(size(col("violations")) === 0)
    val dirty = out.filter(size(col("violations")) > 0)
    assert(clean.count() + dirty.count() == 4L)
    assert(clean.count() == 1L) // only (1, O, 10.0, 1-URGENT) is fully clean
  }

  test("Satisfies: arbitrary cross-column predicate") {
    val df = Seq((1L, 5.0, 4.0), (2L, 3.0, 9.0)).toDF("id", "hi", "lo")
    val rep = Validate.report(df,
      Seq(Satisfies("hi_ge_lo", "hi", col("hi") >= col("lo"))))
    assert(rep.collect().head.getLong(3) == 1L) // row 2 fails
  }

  test("fail-fast: duplicate rule names, empty rules, bad ranges") {
    intercept[IllegalArgumentException] {
      Validate.report(sample, Seq(NotNull("id"), NotNull("id")))
    }
    intercept[IllegalArgumentException] { Validate.report(sample, Nil) }
    intercept[IllegalArgumentException] { InRange("x", 5.0, 1.0) }
    intercept[IllegalArgumentException] { InSet("x", Nil) }
    intercept[IllegalArgumentException] { Matches("x", "(?i)abc") }
  }

  test("profile: typed metrics per column, nulls counted, rows row; " +
      "approx mode keeps the shape; unknown column fails fast") {
    val df = Seq((1L, Some("ab"), 2.0), (2L, None, 4.0),
      (3L, Some("wxyz"), 6.0)).toDF("id", "s", "x")
    val p = Validate.profile(df, Seq("id", "s", "x"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(p(("_table", "rows")) == 3.0)
    assert(p(("id", "nulls")) == 0.0 && p(("id", "distinct")) == 3.0)
    assert(p(("id", "min")) == 1.0 && p(("id", "max")) == 3.0 &&
      p(("id", "mean")) == 2.0)
    assert(p(("s", "nulls")) == 1.0 && p(("s", "distinct")) == 2.0)
    assert(p(("s", "min_len")) == 2.0 && p(("s", "max_len")) == 4.0 &&
      p(("s", "avg_len")) == 3.0)
    assert(p(("x", "mean")) == 4.0)
    val approx = Validate.profile(df, Seq("id"), exact = false)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(approx.keySet == p.keySet.filter {
      case (c, _) => c == "id" || c == "_table" })
    assert(approx(("id", "distinct")) == 3.0) // HLL exact at tiny n
    intercept[IllegalArgumentException] {
      Validate.profile(df, Seq("nope"))
    }
  }

  test("chiSquareIndependence: hand-computed 2x2 cells, exact " +
      "marginals, unobserved cells absent") {
    import spark.implicits._
    val df = Seq(("A", "X"), ("A", "X"), ("A", "Y"), ("A", "Y"),
      ("B", "X"), ("B", "X")).toDF("a", "b")
    val out = Validate.chiSquareIndependence(df, "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.size == 3) // (B, Y) never observed — absent
    // N=6, row A=4 B=2, col X=4 Y=2: e(A,X)=16/6, e(A,Y)=8/6, e(B,X)=8/6
    val eAX = 4.0 * 4.0 / 6.0
    assert(out(("A", "X"))._1 == 2L)
    assert(math.abs(out(("A", "X"))._2 - eAX) < 1e-12)
    assert(math.abs(out(("A", "X"))._3 -
      (2.0 - eAX) * (2.0 - eAX) / eAX) < 1e-12)
    assert(math.abs(out(("B", "X"))._2 - 8.0 / 6.0) < 1e-12)
  }

  test("benford: leading digit from the integer, non-positive filtered, " +
      "absent digits keep full expected mass, chi2 hand-checked") {
    import spark.implicits._
    // digits: 123→1, 19→1, 2→2, 999→9; 0 and −5 drop
    val df = Seq(123L, 19L, 2L, 999L, 0L, -5L).toDF("v")
    val out = Validate.benford(df, "v").orderBy("digit").collect()
    assert(out.length == 9)
    val byDigit = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDigit(1L) == 2L && byDigit(2L) == 1L && byDigit(9L) == 1L)
    assert((3L to 8L).forall(byDigit(_) == 0L))
    val r1 = out(0)
    val p1 = math.log10(1.0 + 1.0 / 1)
    assert(math.abs(r1.getDouble(2) - p1) < 1e-15)
    assert(r1.getDouble(3) == 0.5) // 2 of 4
    val dev = 2.0 - 4.0 * p1
    assert(math.abs(r1.getDouble(4) - dev * dev / (4.0 * p1)) < 1e-12)
    // a digit with n=0 contributes its whole expected mass N·p
    val p3 = math.log10(1.0 + 1.0 / 3)
    assert(math.abs(out(2).getDouble(4) - 4.0 * p3) < 1e-12)
  }

  test("gini: uniform is 0, single-owner is (n−1)/n, tied ranks exact, " +
    "all-zero column undefined") {
    import spark.implicits._
    def g(vs: Seq[Long]) =
      Validate.gini(vs.toDF("v"), "v").collect().head
    val even = g(Seq(5L, 5L, 5L, 5L))
    assert(even.getLong(0) == 4L && even.getLong(1) == 20L &&
      even.getDouble(2) == 0.0)
    // one row owns everything: G = (2·40 − 5·10)/(4·10) = 0.75
    val solo = g(Seq(0L, 0L, 0L, 10L))
    assert(solo.getDouble(2) == 0.75)
    // ties occupy a contiguous rank run: [1,1,2] → (2·9 − 4·4)/(3·4)
    assert(g(Seq(1L, 1L, 2L)).getDouble(2) == 2.0 / 12.0)
    // shuffling partitions cannot move the exact moments
    val shuffled = Validate.gini(
      Seq(1L, 1L, 2L).toDF("v").repartition(7), "v").collect().head
    assert(shuffled.getDouble(2) == 2.0 / 12.0)
    // all-zero mass: mean undefined → null
    assert(g(Seq(0L, 0L)).isNullAt(2))
  }

  test("entropy: uniform mix scores log2(k) bits, single value ~0, " +
      "nulls excluded, partition-invariant") {
    val d = (Seq.fill(2)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(2)("d")).map(("u", _)) ++
      Seq.fill(5)(("s", "only")) ++
      Seq(("n", "x"), ("n", null), (null, "y"))
    val df = d.toDF("g", "v")
    val out = Validate.entropy(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // uniform 4-way → 2 bits (±ln-integerization, ~1e-9)
    assert(out("u")._1 == 8L && out("u")._2 == 4L)
    assert(math.abs(out("u")._3 - 2.0) < 1e-8)
    // one value → ~0 (can be an ulp either side of 0; e6 rounds to 0)
    assert(out("s") == ((5L, 1L, out("s")._3)) &&
      math.abs(out("s")._3) < 1e-8)
    // null group rows and null values are both excluded
    assert(out("n")._1 == 1L && !out.contains(null))
    val re = Validate.entropy(df.repartition(7), "g", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(re == out) // exact — integerized terms in decimal sums
  }

  test("skewReport: hand-built skew, uniform keys gini 0, nulls " +
      "excluded, partition-invariant") {
    // keys: a×6, b×1, c×1 — 8 rows, heaviest share 6/8, count
    // histogram {1: 2 keys, 6: 1 key}
    val d = (Seq.fill(6)("a") ++ Seq("b", "c") ++
      Seq(null.asInstanceOf[String])).toDF("k")
    val r = Validate.skewReport(d, "k").head()
    assert(r.getLong(0) == 8L && r.getLong(1) == 3L &&
      r.getLong(2) == 6L && r.getDouble(3) == 0.75)
    // counts [1,1,6]: gini = (2·(1·0+... ) hand value via the gini op
    val g = Validate.gini(Seq(1L, 1L, 6L).toDF("v"), "v")
      .head().getDouble(2)
    assert(r.getDouble(4) == g)
    // perfectly uniform keys → count gini exactly 0
    val u = Validate.skewReport(
      (1 to 4).flatMap(i => Seq.fill(3)(s"k$i")).toDF("k"), "k").head()
    assert(u.getDouble(4) == 0.0 && u.getDouble(3) == 0.25)
    val re = Validate.skewReport(d.repartition(7), "k").head()
    assert(re.toSeq == r.toSeq)
  }

  test("correlationMatrix: exact ±1 on linear columns, null vs a " +
      "constant, listwise null drop, partition-invariant, fail-fast") {
    val base = (1L to 5L).map(i => (i, 2 * i, 10 - i, 7L))
      .toDF("x", "y", "z", "w")
    // a row with ANY null drops entirely (listwise) — n stays 5
    val withNull = base.unionAll(
      Seq((null.asInstanceOf[java.lang.Long], 99L, 99L, 99L))
        .toDF("x", "y", "z", "w")
        .select(col("x").cast("long"), col("y"), col("z"), col("w")))
    val out = Validate.correlationMatrix(withNull,
        Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(out.size == 6)
    assert(out(("x", "y")) == ((5L, Some(1.0))))  // y = 2x, exact
    assert(out(("x", "z")) == ((5L, Some(-1.0)))) // z = 10 - x
    assert(out(("y", "z")) == ((5L, Some(-1.0))))
    assert(out(("x", "w")) == ((5L, None)))       // w constant
    assert(out(("y", "w"))._2 == None)
    assert(out(("z", "w"))._2 == None)
    val re = Validate.correlationMatrix(withNull.repartition(7),
        Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(re == out) // exact — decimal moments
    intercept[IllegalArgumentException] {
      Validate.correlationMatrix(base, Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Validate.correlationMatrix(base, Seq("x", "x"))
    }
  }

  test("spearman: monotone ±1 under nonlinear scaling, permutation " +
      "closed form, tie ranks exact, nulls drop, constant null") {
    // y = x³ is nonlinear but monotone: Pearson < 1, Spearman = 1
    val cubes = Seq((1L, 1L), (2L, 8L), (3L, 27L), (4L, 64L), (5L, 125L))
      .toDF("x", "y")
    val r1 = Validate.spearman(cubes, "x", "y").head()
    assert(r1.getLong(0) == 5L && r1.getDouble(1) == 1.0)
    val rNeg = Validate.spearman(
      cubes.select($"x", (-$"y").as("y")), "x", "y").head()
    assert(rNeg.getDouble(1) == -1.0)
    // permutation (1,2,3)→(30,10,20): 1 − 6·Σd²/(n(n²−1)) = −0.5
    val perm = Seq((1L, 30L), (2L, 10L), (3L, 20L)).toDF("x", "y")
    assert(Validate.spearman(perm, "x", "y").head().getDouble(1) == -0.5)
    // ties: tied x values share the doubled average rank; identical
    // tie structure on both sides → exactly 1
    val ties = Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 40L))
      .toDF("x", "y")
    assert(Validate.spearman(ties, "x", "y").head().getDouble(1) == 1.0)
    // nulls drop pairwise; constant side → null rho
    val withNull = Seq[(java.lang.Long, java.lang.Long)]((1L, 1L),
      (2L, null), (3L, 3L)).toDF("x", "y")
    val rn = Validate.spearman(withNull, "x", "y").head()
    assert(rn.getLong(0) == 2L && rn.getDouble(1) == 1.0)
    val const = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
    assert(Validate.spearman(const, "x", "y").head().isNullAt(1))
    // partition invariance — exact decimal moments
    val re = Validate.spearman(cubes.repartition(7), "x", "y").head()
    assert(re.getDouble(1) == 1.0)
  }

  test("kendallTau: ±1 on monotone data, hand-counted tie case, " +
      "nulls drop, constant null, partition invariance") {
    val up = Seq((1L, 1L), (2L, 8L), (3L, 27L)).toDF("x", "y")
    val r1 = Validate.kendallTau(up, "x", "y").head()
    assert(r1.getLong(0) == 3L && r1.getLong(1) == 3L &&
      r1.getLong(2) == 0L && r1.getDouble(3) == 1.0)
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    assert(Validate.kendallTau(down, "x", "y").head().getDouble(3)
      == -1.0)
    // hand-counted τ-b with ties: cells (1,1)×1 (1,2)×1 (2,2)×2 —
    // nc = 2 (the (1,1)-(2,2) cell pair), nd = 0; 2n₀ = 12,
    // Σtx(tx−1) = 4, Σty(ty−1) = 6 → τ = 2·2/√(8·6)
    val ties = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 2L))
      .toDF("x", "y")
    val rt = Validate.kendallTau(ties, "x", "y").head()
    assert(rt.getLong(0) == 4L && rt.getLong(1) == 2L &&
      rt.getLong(2) == 0L)
    assert(rt.getDouble(3) == 2.0 * 2.0 / math.sqrt(8.0 * 6.0))
    // pairwise-complete; a constant side nulls tau but keeps counts
    val withNull = Seq[(java.lang.Long, java.lang.Long)]((1L, 1L),
      (2L, null), (3L, 3L)).toDF("x", "y")
    val rn = Validate.kendallTau(withNull, "x", "y").head()
    assert(rn.getLong(0) == 2L && rn.getDouble(3) == 1.0)
    assert(Validate.kendallTau(
      Seq((1L, 7L), (2L, 7L)).toDF("x", "y"), "x", "y")
      .head().isNullAt(3))
    // discordant counts are exact too: one swap in four
    val swap = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L))
      .toDF("x", "y")
    val rs = Validate.kendallTau(swap, "x", "y").head()
    assert(rs.getLong(1) == 5L && rs.getLong(2) == 1L)
    assert(Validate.kendallTau(ties.repartition(7), "x", "y")
      .head().getDouble(3) == rt.getDouble(3))
  }

  test("fdViolations: violating groups only, null semantics, multi-col") {
    val d = Seq(
      (Some("a"), "g1", Some("x")), (Some("a"), "g1", Some("x")),
      (Some("b"), "g1", Some("x")), (Some("b"), "g1", Some("y")),
      (Some("c"), "g1", Some("x")), (Some("c"), "g1", None),
      (None, "g1", Some("z")), (None, "g1", Some("w")))
      .toDF("det", "det2", "dep")
    val out = Validate.fdViolations(d, Seq("det"), "dep")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // a → {x}: holds; b → {x, y}: violated; c → {x, null}: the null is
    // a second observed state, so it violates; null determinants drop
    assert(out == Map("b" -> ((2L, 2L)), "c" -> ((2L, 2L))))
    // multi-column determinant: (det, det2) splits nothing new here
    val out2 = Validate.fdViolations(d, Seq("det", "det2"), "dep")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(out2 == Seq("b", "c"))
    // partition invariance
    assert(Validate.fdViolations(d.repartition(7), Seq("det"), "dep")
      .collect().map(_.getString(0)).toSet == Set("b", "c"))
    intercept[IllegalArgumentException] {
      Validate.fdViolations(d, Nil, "dep")
    }
  }
}
