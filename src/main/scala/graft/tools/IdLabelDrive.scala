package graft.tools

import org.apache.spark.sql.SparkSession
import graft.config.GraphConfig
import graft.operators.GraphBuilder

/** Drive id_key_label renaming incl. edge construction against the renamed
  * node (dev tool). */
object IdLabelDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val yaml =
      """Database: { name: IdDrive, version: "1" }
        |Sources:
        |  P: { source type: parquet, path: /root/testdata/sf0.001 }
        |Nodes:
        |  Customer:
        |    id_key_label: customer_id
        |    sources:
        |      P: { table: customer, id_key: c_custkey, uri_key: c_name }
        |  Order:
        |    sources:
        |      P: { table: orders, id_key: o_orderkey }
        |Relationships:
        |  PLACED:
        |    sources:
        |      P:
        |        type: foreign_key
        |        start: { node: Customer, table: customer, key: c_custkey }
        |        end: { node: Order, table: orders, key: o_custkey }
        |""".stripMargin
    val g = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml))
    println("CUST_COLS=" + g.nodes("Customer").columns.mkString(","))
    println("EDGES=" + g.relationships("PLACED").count())
    g.stats(spark).show()
    spark.stop()
  }
}
