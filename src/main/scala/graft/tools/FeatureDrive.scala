package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.config.GraphConfig
import graft.operators.{GraphBuilder, Skew}
import graft.streaming.StreamingIngest

/** End-to-end drive of the library's newest public APIs, as a user program
  * would call them (dev tool). */
object FeatureDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("drive").toString

    // 1. csv-sourced graph build with ascii-fold ingest
    Seq((1L, "Müller Café"), (2L, "plain")).toDF("id", "name")
      .write.option("header", "true").csv(s"$tmp/people.csv")
    val yaml =
      s"""Database: { name: Drive, version: "1" }
         |Sources:
         |  C: { source type: csv, path: $tmp }
         |Nodes:
         |  Person:
         |    sources:
         |      C: { table: people, id_key: id }
         |""".stripMargin
    val g = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml), asciiFold = true)
    println("FOLDED=" + g.nodes("Person").orderBy("id")
      .select("name").as[String].collect().mkString("|"))

    // 2. salted join vs plain join on skewed data
    val big = (1 to 100000).map(i => (if (i % 10 != 0) 7L else i.toLong, 1))
      .toDF("k", "v")
    val dim = (1 to 200).map(i => (i.toLong, s"t$i")).toDF("k", "tag")
    val plain = big.join(dim, Seq("k")).count()
    val salted = Skew.saltedJoin(big, dim, "k", 16).count()
    println(s"JOIN plain=$plain salted=$salted match=${plain == salted}")
    val salted1 = Skew.saltedJoin(big, dim, "k", 1).count()
    println(s"JOIN saltBuckets=1 $salted1 match=${plain == salted1}")

    // 3. file-based streaming ingest (real readStream, not MemoryStream)
    val srcDir = s"$tmp/stream-src"
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "dup"),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00"), "b"))
      .toDF("id", "ts", "payload").write.parquet(srcDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(srcDir).schema).parquet(srcDir)
    val q = StreamingIngest.streamToStaging(stream, "id", "ts", "1 hour",
      s"$tmp/staged", s"$tmp/ckpt")
    q.processAllAvailable(); q.stop()
    println("STAGED_IDS=" + spark.read.parquet(s"$tmp/staged")
      .select("id").as[Long].collect().sorted.mkString(","))

    // probe: asciiFold build on a table with no string columns
    Seq((1L, 2.5), (2L, 3.5)).toDF("id", "x").write.parquet(s"$tmp/nums.parquet")
    val yaml2 =
      s"""Database: { name: Nums, version: "1" }
         |Sources:
         |  P: { source type: parquet, path: $tmp }
         |Nodes:
         |  Num:
         |    sources:
         |      P: { table: nums, id_key: id }
         |""".stripMargin
    val g2 = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml2), asciiFold = true)
    println("NUMS=" + g2.nodes("Num").count())
    spark.stop()
  }
}
