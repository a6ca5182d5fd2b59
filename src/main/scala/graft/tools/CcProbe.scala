package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal connected-components stall probe: plain in-memory vertices +
  * a handful of edges — distinguishes "CC is slow" from "CC's input
  * lineage is slow". Dev diagnostics only. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val vertices = (0L until 2080L).toDF("vec_id")
    val pairs = (0L until 40L).map(i => (i * 25, i * 25 + 1000))
      .toDF("id_a", "id_b")
    val t0 = System.nanoTime()
    val cc = graft.operators.Dedup.connectedComponents(vertices,
      "vec_id", pairs)
    println(s"cc=${cc.count()} in ${(System.nanoTime - t0) / 1e9}s")
    spark.stop()
  }
}
