package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the minhash pipeline stages (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"STAGE $name%-12s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("warmup") { docs.count() }
    time("shingles") { docs.select(explode(Dedup.shingles(col("text"), 3))).count() }
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3)
    time("signatures") { sigs.count() }
    time("signatures2") { sigs.count() }
    val cands = Dedup.minhashCandidates(sigs, "doc_id", 4)
    time("candidates") { cands.count() }
    val full = Dedup.minhashNearDups(docs, "text", "doc_id", 0.2)
    time("full") { full.count() }
    spark.stop()
  }
}
