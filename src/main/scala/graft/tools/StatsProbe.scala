package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val a = (0L until 1000L).map(i => (i, i % 7)).toDF("id", "k")
    val b = (0L until 1000L).map(i => (i, i % 5)).toDF("id", "v")
    var cur = a
    for (i <- 1 to 6) {
      val joined = cur.join(b, Seq("id")).join(
        cur.withColumnRenamed("k", "k2"), Seq("id"))
        .select(col("id"), col("k"))
      val raw = joined.localCheckpoint()
      println(s"STATS round$i raw analyzed=" +
        raw.queryExecution.analyzed.getClass.getSimpleName +
        " bits=" + raw.queryExecution.optimizedPlan.stats
          .sizeInBytes.bigInteger.bitLength())
      val reset = graft.Checkpointer.Local(joined)
      println(s"STATS round$i reset analyzed=" +
        reset.queryExecution.analyzed.getClass.getSimpleName +
        " bits=" + reset.queryExecution.optimizedPlan.stats
          .sizeInBytes.bigInteger.bitLength() +
        " rows=" + reset.count())
      cur = reset
    }
    spark.stop()
  }
}
