package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup pass at the smallest SF: JIT-compiles the generated code for
    // every query plan so timed numbers measure the engine, not first-call
    // JVM warmup (standard benchmark hygiene; untimed).
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // Timed pass: materialize through the noop sink so every projected
    // column is computed — .count() would let Catalyst prune most of the
    // work for scan/window-shaped queries. A query that throws records -1,
    // never a plausible-looking wall-clock for work that didn't run.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val timing =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
          -1.0 }
      name -> timing
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val ok = results.values.filter(_ >= 0)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    // cpus + shuffle partitions ride in the JSON line so round-over-round
    // comparisons are config-matched
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"cpus":$cpus,"shuffle_partitions":$parts,"sf":"$sfDir"}""")
    spark.stop()
    if (results.values.exists(_ < 0)) sys.exit(1)
  }
}
