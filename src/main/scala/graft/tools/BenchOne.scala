package graft.tools
import org.apache.spark.sql.SparkSession

/** Single-query bench harness at DRIVER PARITY: same env knobs
  * (`SPARK_GRAFT_CPUS`, `SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_BENCH_ITERS`),
  * same noop-sink materialization, and same shuffle-partition count as
  * `graft.Bench` — r6 shipped believing `q_st2b`≈1 s because this tool
  * hardcoded local[4]/4 partitions/.count() while the driver ran
  * local[32]/32/noop (VERDICT r6 §wrong-2). Optionally pre-warms the
  * FULL suite first (`SPARK_GRAFT_WARM_ALL=1`) to reproduce the
  * driver's heap/JIT state after 184 other queries.
  *
  * Usage: `sbt "runMain graft.tools.BenchOne q_st2b_events_session ..."` */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    require(iters >= 1,
      s"SPARK_GRAFT_BENCH_ITERS must be >= 1 (got $iters): the first " +
        "run is warmup and is dropped, so 0 would leave no timings")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("SPARK_GRAFT_WARM_ALL").contains("1")) {
      val warmDir = "/root/testdata/sf0.001"
      graft.SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      println("WARMED full suite at sf0.001")
    }
    for (name <- args) {
      val times = (1 to (iters + 1)).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.drop(1) // first run is warmup
      val sorted = times.sorted
      println(f"TIME $name cpus=$cpus median=${sorted(sorted.length / 2)}%6.2f " +
        f"min=${sorted.head}%6.2f max=${sorted.last}%6.2f")
    }
    spark.stop()
  }
}
