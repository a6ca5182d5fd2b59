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
    // work for scan/window-shaped queries. Each query runs `iters` times and
    // reports the MEDIAN (single-run numbers on a shared box swing 2-5× and
    // made r1→r2 comparisons unreadable); min/max ride along as the spread.
    // A query that throws records -1, never a plausible-looking wall-clock
    // for work that didn't run.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val results: Seq[(String, Double, Double, Double)] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        val times = (0 until iters).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9 }
          catch { case t: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
            -1.0 }
        }
        if (times.exists(_ < 0)) (name, -1.0, -1.0, -1.0)
        else {
          val sorted = times.sorted
          (name, sorted(sorted.length / 2), sorted.head, sorted.last)
        }
      }
    // Compact numbers: the driver's artifact keeps only 2000 chars, so
    // every byte in the queries map costs coverage. At 185+ queries even
    // 2-decimal seconds overflow, so per-query medians are INTEGER
    // CENTISECONDS (self-described by "qunit":"cs" — 0.24 s → 24), which
    // is also honest to the ~10 ms run-to-run noise floor; the total
    // stays in seconds per the driver contract, and the verbose
    // spread/config detail goes to target/bench_full.json.
    def sig3(x: Double): String =
      BigDecimal(x).round(new java.math.MathContext(3))
        .bigDecimal.toPlainString
    def fmtCs(x: Double): String = math.round(x * 100).toString
    // Locale.ROOT: the default-locale interpolator would emit "1,50" on
    // comma-decimal JVMs and corrupt the JSON line. Sub-second queries
    // keep 2 decimals; above 1 s run-to-run noise dwarfs the second
    // decimal, so 1 is plenty and the saved bytes buy map coverage.
    def fmt(x: Double): String = {
      val pattern = if (x < 0.5 && x > -0.5) "%.2f" else "%.1f"
      val s = String.format(java.util.Locale.ROOT, pattern, Double.box(x))
      if (s.contains('.'))
        s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
      else s
    }
    // Tier id alone ("x5g_image_resize" → "x5g") when that is unique
    // across the suite — at 107+ queries even tier+last-token keys push
    // the errors array past the artifact's 2000-char survival head. The
    // tier prefix is the stable identity (names' tails get reworded);
    // rare tier collisions fall back to tier_last, then the full name.
    def short(k: String): String = {
      val full = k.stripPrefix("q_")
      val toks = full.split('_')
      if (toks.length >= 2) toks.head else full
    }
    def shortLong(k: String): String = {
      val full = k.stripPrefix("q_")
      val toks = full.split('_')
      // 2 chars of the last token disambiguate every current collision
      // family (window_ru/ti/to, asof_sa/jo, cdc_st/di) at ~6 bytes per
      // key less than the full tail; the require below still catches a
      // future 2-char clash and demands a rename.
      if (toks.length >= 2) toks.head + "_" + toks.last.take(2) else full
    }
    val keyOf: Map[String, String] = {
      val names = results.map(_._1)
      val byTier = names.groupBy(short)
      val tierKeys = names.map { n =>
        n -> (if (byTier(short(n)).size == 1) short(n) else shortLong(n))
      }.toMap
      require(tierKeys.values.toSeq.distinct.size == names.size,
        "bench key abbreviation collided; lengthen the colliding names")
      tierKeys
    }
    val qs = results
      .map { case (k, med, _, _) => "\"" + keyOf(k) + "\":" + fmtCs(med) }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, _, lo, hi) =>
        "\"" + keyOf(k) + "\":[" + fmt(lo) + "," + fmt(hi) + "]" }
      .mkString("{", ",", "}")
    val errors = results
      .collect { case (k, med, _, _) if med < 0 => "\"" + keyOf(k) + "\"" }
      .mkString("[", ",", "]")
    val ok = results.collect { case (_, med, _, _) if med >= 0 => med }
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    // The driver's artifact keeps the LAST 2000 chars of stdout (tail
    // truncation — r5's artifact lost the line's head plus the errors
    // field and never parsed), and sbt's "[success] ..." footer rides in
    // that window too. So the whole line must fit ~1900 chars: the
    // verbose spread map goes to a local file instead of stdout, and
    // field order is reversed-importance so a future overflow sheds
    // config scalars, never errors/total/queries (the critical fields
    // sit nearest the END of the line, which is the surviving end).
    val sfName = sfDir.split('/').last
    val line = s"""{"metric":"total","unit":"sec","qunit":"cs","sf":"$sfName","queries":$qs,"errors":$errors,"value":${sig3(total)}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_full.json"),
      s"""{"sf":"$sfName","iters":$iters,"cpus":$cpus,""" +
        s""""shuffle_partitions":$parts,"total":${sig3(total)},""" +
        s""""spread":$spread}""")
    catch { case _: Throwable => () }
    if (line.length > 1900) System.err.println(
      s"[bench] WARNING json line ${line.length} chars > 1900 tail budget")
    // The line also lands UNPREFIXED in target/bench.json: sbt wraps
    // stdout in "[info] ", which left the driver's `parsed` field null
    // through r6 even when every key survived the tail (VERDICT r6 §2).
    // The file is the robust channel; stdout remains the contract one.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench.json"), line + "\n")
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
    if (results.exists(_._2 < 0)) sys.exit(1)
  }
}
