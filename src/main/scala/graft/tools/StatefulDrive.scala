package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.{StreamingIngest, UserEvent}

/** Drive runningUserTotals over a real file stream (dev tool). */
object StatefulDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("stateful").toString
    // batch 1 on disk before the stream starts
    Seq(UserEvent(1L, 10.0), UserEvent(1L, 5.0), UserEvent(2L, 1.0))
      .toDS().write.parquet(s"$tmp/src")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema)
      .parquet(s"$tmp/src").as[UserEvent]
    val q = StreamingIngest.runningUserTotals(stream)
      .writeStream.format("memory").queryName("totals")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("update").start()
    q.processAllAvailable()
    println("BATCH1=" + spark.table("totals").collect().sortBy(_.getLong(0))
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getDouble(2)}").mkString(" "))
    // batch 2: existing key + brand-new key
    Seq(UserEvent(1L, 2.0), UserEvent(99L, 7.0))
      .toDS().write.mode("append").parquet(s"$tmp/src")
    q.processAllAvailable()
    q.stop()
    println("ALL=" + spark.table("totals").collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getDouble(2)}")
      .sorted.mkString(" "))
    spark.stop()
  }
}
