package graft.tools

import org.apache.spark.sql.SparkSession
import graft.config._
import graft.operators.GraphBuilder

/** Drive a relationship with TWO sources producing different prop sets —
  * the allowMissingColumns union path (dev tool). */
object MultiRelDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = GraphConfig.fromFile("/tmp/multirel.yml")
    // second source for TOUCHES: a foreign_key variant contributing the
    // same rel label with a different (empty) prop shape
    val twoSrc = base.copy(relationships = base.relationships.map { r =>
      r.copy(sources = r.sources :+ RelSourceConf("P",
        ForeignKeyMode("Customer", "customer", "c_custkey",
          "Order", "orders", "o_custkey")))
    })
    val g = GraphBuilder.build(spark, twoSrc)
    val rel = g.relationships("TOUCHES")
    println("REL_COLS=" + rel.columns.mkString(","))
    println("REL_ROWS=" + rel.count())
    spark.stop()
  }
}
