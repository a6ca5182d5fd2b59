package graft

import org.apache.spark.sql.functions._

import graft.operators.Outliers

/** Outlier flagging: z-score and Tukey-fence semantics. */
class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("zscore: global group, known distribution") {
    // 0,10 repeated → mu=5, sigma≈5.13; 100 is the outlier
    val df = (Seq.fill(10)(0.0) ++ Seq.fill(10)(10.0) ++ Seq(100.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Outliers.zscore(df, "v", Nil, threshold = 3.0)
    val flagged = out.filter(col("is_outlier"))
      .select("v").as[Double].collect().toSeq
    assert(flagged == Seq(100.0))
    assert(out.count() == 21) // passthrough keeps every row
  }

  test("zscore: per-group stats are independent; zero-sigma group safe") {
    val df = Seq(
      ("a", 0.0), ("a", 0.0), ("a", 10.0), ("a", 0.1), ("a", -0.1),
      ("b", 5.0), ("b", 5.0), ("b", 5.0) // sigma = 0
    ).zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val out = Outliers.zscore(df, "v", Seq("g"), threshold = 1.5)
    assert(out.filter(col("g") === "b" && col("is_outlier")).count() == 0)
    assert(out.filter(col("g") === "b").count() == 3)
    val aFlagged = out.filter(col("g") === "a" && col("is_outlier"))
      .select("v").as[Double].collect().toSeq
    assert(aFlagged == Seq(10.0))
  }

  test("iqr: Tukey fences flag exactly the far value; nulls never flag") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, Some(v)) }
      .toDF("id", "v")
      .unionByName(Seq((99L, Option.empty[Double])).toDF("id", "v"))
    val out = Outliers.iqr(df, "v", Nil, k = 1.5)
    val flagged = out.filter(col("is_outlier"))
      .select("v").as[Double].collect().toSeq
    assert(flagged == Seq(100.0))
    assert(out.filter(col("id") === 99L).count() == 1)
    assert(out.filter(col("id") === 99L && col("is_outlier")).count() == 0)
  }

  test("iqr: approximate mode agrees on a clear-cut outlier") {
    val df = ((1 to 1000).map(_.toDouble) ++ Seq(1e9)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val ex = Outliers.iqr(df, "v", Nil).filter(col("is_outlier"))
      .select("v").as[Double].collect().toSet
    val ap = Outliers.iqr(df, "v", Nil, exact = false)
      .filter(col("is_outlier")).select("v").as[Double].collect().toSet
    assert(ex == Set(1e9) && ap == Set(1e9))
  }

  test("results are partitioning-independent") {
    val df = (Seq.fill(20)(1.0) ++ Seq(50.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    def run(parts: Int) = Outliers.iqr(df.repartition(parts), "v", Nil)
      .filter(col("is_outlier")).select("id").as[Long].collect().toSet
    assert(run(1) == run(7))
  }

  test("fail-fast on non-positive threshold/k") {
    val df = Seq((1L, 1.0)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Outliers.zscore(df, "v", Nil, threshold = 0.0)
    }
    intercept[IllegalArgumentException] { Outliers.iqr(df, "v", Nil, k = -1) }
  }

  test("mad: spike flags while the median ignores it, zero-MAD group " +
      "flags nothing, global mode, partition-invariant") {
    // g: med 3, MAD 1 → the 100 scores rz = 0.6745·97; everything else
    // stays within ±1.35
    val d = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("g", _)) ++
      Seq(5.0, 5.0, 5.0, 9.0).map(("z", _)))
      .toDF("grp", "v")
    val out = Outliers.mad(d, "v", Seq("grp"), k = 3.5)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5))).toMap
    assert(out(("g", 100.0)) == ((Some(0.6745 * 97.0), true)))
    assert(out(("g", 1.0)) == ((Some(0.6745 * -2.0), false)))
    assert(out(("g", 3.0)) == ((Some(0.0), false)))
    // z: >50% identical → MAD 0 → null rz, nothing flags (even the 9)
    assert(out(("z", 9.0)) == ((None, false)))
    // global mode: one corpus-wide median
    val g = Outliers.mad(d, "v", Nil, k = 3.5)
      .filter(col("is_outlier")).collect()
    assert(g.map(_.getDouble(1)).toSeq == Seq(100.0))
    val re = Outliers.mad(d.repartition(7), "v", Seq("grp"), k = 3.5)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5))).toMap
    assert(re == out) // exact — interpolated medians + pure double ops
    intercept[IllegalArgumentException] { Outliers.mad(d, "v", Nil, 0.0) }
  }

  test("hbos: exact inverse-likelihood products, clamp, multivariate") {
    // feature a: nine 0.0s + one 10.0 → bins [0,1):9 rows, top bin:1 row
    // feature b: mirrors a on the same rows → the (10,10) row is rare in
    // BOTH features: hbos = (9/1)·(9/1) = 81; modal rows = 1 exactly
    val d = ((1 to 9).map(i => (i.toLong, 0.0, 0.0)) :+ (10L, 10.0, 10.0))
      .toDF("id", "a", "b")
    val out = Outliers.hbos(d, Seq("a", "b"), bins = 10, threshold = 80.0)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("hbos"), r.getAs[Boolean]("is_outlier")))).toMap
    assert(out(10L) == ((81.0, true))) // v = max clamps into the top bin
    (1 to 9).foreach(i => assert(out(i.toLong) == ((1.0, false))))
  }

  test("hbos: null features are neutral, constant features score 1") {
    val d = Seq((1L, Some(0.0), 5.0), (2L, Some(0.0), 5.0),
        (3L, Some(9.0), 5.0), (4L, None, 5.0))
      .toDF("id", "a", "c")
    val out = Outliers.hbos(d, Seq("a", "c"), bins = 3, threshold = 2.0)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Double]("hbos")).toMap
    // a: [0,3):2 rows, top bin:1 row, max 2; c constant → factor 1
    assert(out(1L) == 1.0 && out(2L) == 1.0)
    assert(out(3L) == 2.0)
    assert(out(4L) == 1.0) // null a → neutral; constant c → neutral
  }

  test("hbos: partitioning-independent, fail-fast guards") {
    val d = (1 to 100).map(i => (i.toLong, (i % 13).toDouble,
      (i % 7).toDouble)).toDF("id", "x", "y")
    val one = Outliers.hbos(d.repartition(1), Seq("x", "y"), bins = 5)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Double]("hbos")).toMap
    val many = Outliers.hbos(d.repartition(17), Seq("x", "y"), bins = 5)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Double]("hbos")).toMap
    assert(one == many)
    intercept[IllegalArgumentException] { Outliers.hbos(d, Nil) }
    intercept[IllegalArgumentException] {
      Outliers.hbos(d, Seq.fill(8)("x"))
    }
    intercept[IllegalArgumentException] {
      Outliers.hbos(d, Seq("x"), bins = 0)
    }
  }
}
