package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Dev probe: time louvain at increasing round counts on the q_g23
  * graph (driver-parity session) to separate per-round fixed overhead
  * from data-size cost. Usage: runMain graft.tools.LouvainProbe <sfDir> */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = li.alias("a")
    val b = li.alias("b")
    val edges = a.join(b,
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("start_id"), col("b.pk").as("end_id"))
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // warm
    GraphOps.louvain(edges, rounds = 1).write.format("noop")
      .mode("overwrite").save()
    for (r <- Seq(1, 2, 4)) time(s"louvain rounds=$r") {
      GraphOps.louvain(edges, rounds = r).write.format("noop")
        .mode("overwrite").save()
    }
    time("multilevel 4+4") {
      GraphOps.louvainMultiLevel(edges).write.format("noop")
        .mode("overwrite").save()
    }
    spark.stop()
  }
}
