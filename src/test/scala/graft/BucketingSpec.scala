package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Co-located (bucketed) joins: same key + same bucket count → equi-join
  * with no Exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("join of two same-bucketed tables plans without any Exchange") {
    val cust = spark.read.parquet(sf() + "/customer.parquet")
    val ord = spark.read.parquet(sf() + "/orders.parquet")
      .withColumnRenamed("o_custkey", "c_custkey")
    Bucketing.writeBucketed(cust, "b_customer", "c_custkey", 8)
    Bucketing.writeBucketed(ord, "b_orders", "c_custkey", 8)

    // model the 100 TB fact-fact case: broadcast is not an option (at toy
    // scale the planner would broadcast the 150-row side and skip the
    // bucketed scan entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readBucketed(spark, "b_customer")
        .join(Bucketing.readBucketed(spark, "b_orders"), Seq("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in plan:\n$plan")
      assert(joined.count() == 1500)

      // contrast: the same join over plain parquet shuffles both sides;
      // the bucketed layout is what removed the exchanges
      val plain = cust.join(ord, Seq("c_custkey"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key needs no exchange either") {
    val agg = Bucketing.readBucketed(spark, "b_orders")
      .groupBy("c_custkey").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in plan:\n$plan")
  }
}
