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
}
