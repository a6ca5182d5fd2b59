package graft

import org.apache.spark.sql.functions._

/** A4 extended aggregates: HLL sketch error bound vs exact. */
class AggregatesSpec extends SparkSpec {

  test("approx_count_distinct within default 5% rsd of exact") {
    val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).head()
    val approx = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.1,
      s"approx=$approx exact=$exact")
  }

  test("cube emits subtotals and a grand total") {
    val out = SparkEntry.queries("q_cube_orders")(spark, sf())
    val rows = out.collect()
    val grand = rows.filter(r =>
      r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == 1500L)
  }

  private def cmsSketchOf(items: Seq[String], depth: Int, width: Int,
      portable: Boolean): Seq[Seq[Long]] = {
    import spark.implicits._
    items.toDF("s")
      .agg(graft.functions.GraftFunctions.cms_sketch($"s", depth, width,
        seed = 7L, portable = portable).as("sk"))
      .collect().head.getSeq[scala.collection.Seq[Long]](0)
      .map(_.toSeq).toSeq
  }

  test("cms_sketch: exact in the collision-free regime, estimates are " +
      "upper bounds, total mass per row = stream length") {
    import spark.implicits._
    val items = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    // wide sketch, tiny domain → collisions vanishingly unlikely
    val wide = cmsSketchOf(items, depth = 4, width = 1024,
      portable = false)
    for ((item, n) <- Seq("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L))
      assert(graft.functions.CmsSketch.estimate(wide, item, 7L,
        portable = false) == n)
    assert(wide.forall(_.sum == items.length.toLong)) // mass conservation
    // width 2 forces collisions: still never an underestimate
    val narrow = cmsSketchOf(items, depth = 2, width = 2,
      portable = false)
    for ((item, n) <- Seq("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L))
      assert(graft.functions.CmsSketch.estimate(narrow, item, 7L,
        portable = false) >= n)
  }

  test("cms_sketch: merge = elementwise sum (partition-invariant), " +
      "portable rows match the md5-48 column hash") {
    import spark.implicits._
    val items = (1 to 200).map(i => s"tok${i % 17}")
    val one = items.toDF("s").coalesce(1)
      .agg(graft.functions.GraftFunctions.cms_sketch($"s", 3, 16,
        seed = 7L, portable = true).as("sk"))
      .collect().head.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq
    val many = items.toDF("s").repartition(13)
      .agg(graft.functions.GraftFunctions.cms_sketch($"s", 3, 16,
        seed = 7L, portable = true).as("sk"))
      .collect().head.getSeq[scala.collection.Seq[Long]](0).map(_.toSeq).toSeq
    assert(one == many)
    // rebuild row counters from the JVM twin of the portable hash
    val expected = (0 until 3).map { d =>
      val row = new Array[Long](16)
      items.foreach { s =>
        val b = (graft.functions.PortableHash.hash48(s, 7L + d) % 16).toInt
        row(b) += 1L
      }
      row.toSeq
    }
    assert(one == expected)
    // estimateCol (codegen probe) agrees with the JVM estimate
    val probed = items.distinct.toDF("s")
      .crossJoin(broadcast(items.toDF("s")
        .agg(graft.functions.GraftFunctions.cms_sketch($"s", 3, 16,
          seed = 7L, portable = true).as("sk"))))
      .select($"s", graft.functions.CmsSketch.estimateCol(
        $"sk", $"s", 3, 16, 7L, portable = true).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    items.distinct.foreach { s =>
      assert(probed(s) ==
        graft.functions.CmsSketch.estimate(one, s, 7L, portable = true))
    }
  }
}
