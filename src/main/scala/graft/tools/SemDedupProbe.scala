package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Stage-by-stage probe of the q_x2l semantic-dedup pipeline at a given
  * SF dir — counts each intermediate so a scale stall can be localized.
  * Dev diagnostics only. */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.select(col("vec_id"), col("embedding")).unionByName(
      e.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000000L).as("vec_id"),
          transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
            .as("embedding")))
    println(s"corpus=${corpus.count()}")
    val (cents, assigned) = Similarity.ivfIndex(corpus, "embedding",
      "vec_id", 32)
    println(s"centroids=${cents.count()} assigned=${assigned.count()}")
    val cellSizes = assigned.groupBy("centroid_id").count()
      .orderBy(desc("count"))
    cellSizes.show(8, truncate = false)
    val a = assigned.select(col("centroid_id"), col("vec_id").as("id_a"),
      col("embedding").as("_va"))
    val b = assigned.select(col("centroid_id"), col("vec_id").as("id_b"),
      col("embedding").as("_vb"))
    val rawPairs = a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
    println(s"rawPairs=${rawPairs.count()}")
    val t0 = System.nanoTime()
    val pairs = rawPairs.filter(
      graft.functions.VectorFunctions.cosine(col("_va"), col("_vb"))
        >= 0.95)
      .select("id_a", "id_b")
    println(s"pairs=${pairs.count()} in ${(System.nanoTime - t0) / 1e9}s")
    val t1 = System.nanoTime()
    val cc = Dedup.connectedComponents(corpus.select(col("vec_id")),
      "vec_id", pairs)
    println(s"cc=${cc.count()} in ${(System.nanoTime - t1) / 1e9}s")
    spark.stop()
  }
}
