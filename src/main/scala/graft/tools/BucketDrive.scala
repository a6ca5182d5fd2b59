package graft.tools

import org.apache.spark.sql.SparkSession
import graft.config.GraphConfig
import graft.operators.GraphBuilder
import graft.sources.Bucketing

/** Drive bucketed staging + config validation through the public API. */
object BucketDrive {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(spark.read.parquet(s"$dir/customer.parquet"),
      "bc", "c_custkey", 8)
    Bucketing.writeBucketed(spark.read.parquet(s"$dir/orders.parquet")
      .withColumnRenamed("o_custkey", "c_custkey"), "bo", "c_custkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = Bucketing.readBucketed(spark, "bc")
      .join(Bucketing.readBucketed(spark, "bo"), Seq("c_custkey"))
    println("JOIN_ROWS=" + j.count())
    println("EXCHANGE_FREE=" + !j.queryExecution.executedPlan.toString.contains("Exchange"))
    // probe: mismatched bucket counts -> shuffle comes back (one side)
    Bucketing.writeBucketed(spark.read.parquet(s"$dir/orders.parquet")
      .withColumnRenamed("o_custkey", "c_custkey"), "bo16", "c_custkey", 16)
    val j2 = Bucketing.readBucketed(spark, "bc")
      .join(Bucketing.readBucketed(spark, "bo16"), Seq("c_custkey"))
    println("MISMATCH_HAS_EXCHANGE=" + j2.queryExecution.executedPlan.toString.contains("Exchange"))
    println("MISMATCH_ROWS=" + j2.count())
    // probe: invalid config error message through GraphBuilder.build
    val bad = """Database: { name: B, version: "1" }
                |Sources:
                |  P: { source type: parquet, path: /tmp }
                |Nodes:
                |  A:
                |    sources:
                |      GHOST: { table: t, id_key: k }
                |""".stripMargin
    try GraphBuilder.build(spark, GraphConfig.fromYaml(bad))
    catch { case e: IllegalArgumentException =>
      println("VALIDATION_ERROR=" + e.getMessage.linesIterator.mkString(" | ")) }
    spark.stop()
  }
}
