package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Drive multiprobe LSH through the public API on real embeddings. */
object ProbeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") < 300)
    val exact = Dedup.cosineNearDups(e, "embedding", "vec_id", 0.3,
      bruteForce = true).count()
    for (p <- Seq(0, 2, 4, 8)) {
      val n = Dedup.cosineNearDups(e, "embedding", "vec_id", 0.3,
        bits = 8, probes = p).count()
      println(f"PROBES=$p pairs=$n recall=${n.toDouble / exact}%.2f (exact=$exact)")
    }
    // probe: probes > bits must clamp, not crash
    val clamped = Dedup.cosineNearDups(e, "embedding", "vec_id", 0.3,
      bits = 4, probes = 99).count()
    println(s"CLAMPED_OK=$clamped")
    spark.stop()
  }
}
