package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config._
import graft.operators.{Dedup, GraphBuilder, GraphOps, Similarity, Skew}
import graft.sources.Bucketing
import graft.streaming.{StreamingIngest, UserEvent}

/** One driver for every ad-hoc dev diagnostic, replacing the per-round
  * accumulation of single-purpose probe mains (CcProbe, LouvainProbe,
  * LeidenProbe/2, StatsProbe, …). Usage:
  *
  *   runMain graft.tools.Probe <subcommand> [args]
  *
  * Honors SPARK_GRAFT_CPUS (default 8) and SPARK_GRAFT_SF_DIR (default
  * /root/testdata/sf0.001; several subcommands take an explicit dir as
  * their first arg instead). These are throwaway diagnostics, not part
  * of the library surface — no output contract, println only.
  * `BenchOne`, `ExplainPlans`, and `EntrySmoke` stay standalone: the
  * driver/verify recipes invoke them by name. */
object Probe {

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("help")
    val rest = args.drop(1)
    if (cmd == "help" || !commands.contains(cmd)) {
      println("usage: runMain graft.tools.Probe <" +
        commands.keys.toSeq.sorted.mkString("|") + "> [args]")
      return
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val wh = java.nio.file.Files.createTempDirectory("probe_wh").toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try commands(cmd)(spark, rest)
    finally spark.stop()
  }

  private def sfDir(rest: Array[String], default: String): String =
    rest.headOption.orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(default)

  private val commands: Map[String, (SparkSession, Array[String]) => Unit] =
    Map(
      "cc" -> cc, "multirel" -> multirel, "lsh" -> lsh,
      "minhash" -> minhash, "stats" -> stats, "stateful" -> stateful,
      "idlabel" -> idlabel, "bucket" -> bucket, "louvain" -> louvain,
      "semdedup" -> semdedup, "leiden" -> leiden, "leiden2" -> leiden2,
      "feature" -> feature)

  /** The q_g23 co-occurrence benchmark graph (shared by the community
    * probes). */
  private def cooccurrenceEdges(spark: SparkSession,
      dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = li.alias("a"); val b = li.alias("b")
    a.join(b, col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("start_id"), col("b.pk").as("end_id"))
  }

  private def timed(tag: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"PROBE $tag%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
  }

  /** Minimal connected-components stall probe: plain in-memory vertices
    * + a handful of edges — distinguishes "CC is slow" from "CC's input
    * lineage is slow". */
  private def cc(spark: SparkSession, rest: Array[String]): Unit = {
    import spark.implicits._
    val vertices = (0L until 2080L).toDF("vec_id")
    val pairs = (0L until 40L).map(i => (i * 25, i * 25 + 1000))
      .toDF("id_a", "id_b")
    val t0 = System.nanoTime()
    val out = Dedup.connectedComponents(vertices, "vec_id", pairs)
    println(s"cc=${out.count()} in ${(System.nanoTime - t0) / 1e9}s")
  }

  /** Drive a relationship with TWO sources producing different prop
    * sets — the allowMissingColumns union path. Reads the base config
    * from /tmp/multirel.yml (or the first arg). */
  private def multirel(spark: SparkSession, rest: Array[String]): Unit = {
    val base = GraphConfig.fromFile(
      rest.headOption.getOrElse("/tmp/multirel.yml"))
    val twoSrc = base.copy(relationships = base.relationships.map { r =>
      r.copy(sources = r.sources :+ RelSourceConf("P",
        ForeignKeyMode("Customer", "customer", "c_custkey",
          "Order", "orders", "o_custkey")))
    })
    val g = GraphBuilder.build(spark, twoSrc)
    val rel = g.relationships("TOUCHES")
    println("REL_COLS=" + rel.columns.mkString(","))
    println("REL_ROWS=" + rel.count())
  }

  /** Multiprobe-LSH recall sweep on real embeddings. */
  private def lsh(spark: SparkSession, rest: Array[String]): Unit = {
    val e = spark.read
      .parquet(sfDir(rest, "/root/testdata/sf0.01") + "/embeddings.parquet")
      .filter(col("vec_id") < 300)
    val exact = Dedup.cosineNearDups(e, "embedding", "vec_id", 0.3,
      bruteForce = true).count()
    for (p <- Seq(0, 2, 4, 8)) {
      val n = Dedup.cosineNearDups(e, "embedding", "vec_id", 0.3,
        bits = 8, probes = p).count()
      println(
        f"PROBES=$p pairs=$n recall=${n.toDouble / exact}%.2f (exact=$exact)")
    }
    // probes > bits must clamp, not crash
    val clamped = Dedup.cosineNearDups(e, "embedding", "vec_id", 0.3,
      bits = 4, probes = 99).count()
    println(s"CLAMPED_OK=$clamped")
  }

  /** Stage-by-stage minhash pipeline profiler. */
  private def minhash(spark: SparkSession, rest: Array[String]): Unit = {
    val docs = spark.read
      .parquet(sfDir(rest, "/root/testdata/sf0.1") + "/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(
        f"STAGE $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup") { docs.count() }
    time("shingles") {
      docs.select(explode(Dedup.shingles(col("text"), 3))).count() }
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3)
    time("signatures") { sigs.count() }
    time("signatures2") { sigs.count() }
    val cands = Dedup.minhashCandidates(sigs, "doc_id", 4)
    time("candidates") { cands.count() }
    val full = Dedup.minhashNearDups(docs, "text", "doc_id", 0.2)
    time("full") { full.count() }
  }

  /** Checkpoint-stats growth probe: iterated self-joins, raw vs reset
    * sizeInBytes bit lengths per round. */
  private def stats(spark: SparkSession, rest: Array[String]): Unit = {
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
  }

  /** Drive runningUserTotals over a real file stream. */
  private def stateful(spark: SparkSession, rest: Array[String]): Unit = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("stateful").toString
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
    println("BATCH1=" + spark.table("totals").collect()
      .sortBy(_.getLong(0))
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getDouble(2)}")
      .mkString(" "))
    Seq(UserEvent(1L, 2.0), UserEvent(99L, 7.0))
      .toDS().write.mode("append").parquet(s"$tmp/src")
    q.processAllAvailable()
    q.stop()
    println("ALL=" + spark.table("totals").collect()
      .map(r => s"${r.getLong(0)}:${r.getLong(1)}:${r.getDouble(2)}")
      .sorted.mkString(" "))
  }

  /** Drive id_key_label renaming incl. edge construction against the
    * renamed node. */
  private def idlabel(spark: SparkSession, rest: Array[String]): Unit = {
    val yaml =
      """Database: { name: IdDrive, version: "1" }
        |Sources:
        |  P: { source type: parquet, path: /root/testdata/sf0.001 }
        |Nodes:
        |  Customer:
        |    id_key_label: customer_id
        |    sources:
        |      P: { table: customer, id_key: c_custkey, uri_key: c_name }
        |  Order:
        |    sources:
        |      P: { table: orders, id_key: o_orderkey }
        |Relationships:
        |  PLACED:
        |    sources:
        |      P:
        |        type: foreign_key
        |        start: { node: Customer, table: customer, key: c_custkey }
        |        end: { node: Order, table: orders, key: o_custkey }
        |""".stripMargin
    val g = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml))
    println("CUST_COLS=" + g.nodes("Customer").columns.mkString(","))
    println("EDGES=" + g.relationships("PLACED").count())
    g.stats(spark).show()
  }

  /** Bucketed staging: exchange-free equal-bucket join, shuffle back on
    * mismatch, config-validation error surface. */
  private def bucket(spark: SparkSession, rest: Array[String]): Unit = {
    val dir = sfDir(rest, "/root/testdata/sf0.001")
    Bucketing.writeBucketed(spark.read.parquet(s"$dir/customer.parquet"),
      "bc", "c_custkey", 8)
    Bucketing.writeBucketed(spark.read.parquet(s"$dir/orders.parquet")
      .withColumnRenamed("o_custkey", "c_custkey"), "bo", "c_custkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = Bucketing.readBucketed(spark, "bc")
      .join(Bucketing.readBucketed(spark, "bo"), Seq("c_custkey"))
    println("JOIN_ROWS=" + j.count())
    println("EXCHANGE_FREE=" +
      !j.queryExecution.executedPlan.toString.contains("Exchange"))
    Bucketing.writeBucketed(spark.read.parquet(s"$dir/orders.parquet")
      .withColumnRenamed("o_custkey", "c_custkey"), "bo16", "c_custkey", 16)
    val j2 = Bucketing.readBucketed(spark, "bc")
      .join(Bucketing.readBucketed(spark, "bo16"), Seq("c_custkey"))
    println("MISMATCH_HAS_EXCHANGE=" +
      j2.queryExecution.executedPlan.toString.contains("Exchange"))
    println("MISMATCH_ROWS=" + j2.count())
    val bad = """Database: { name: B, version: "1" }
                |Sources:
                |  P: { source type: parquet, path: /tmp }
                |Nodes:
                |  A:
                |    sources:
                |      GHOST: { table: t, id_key: k }
                |""".stripMargin
    try GraphBuilder.build(spark, GraphConfig.fromYaml(bad))
    catch { case e: IllegalArgumentException =>
      println("VALIDATION_ERROR=" +
        e.getMessage.linesIterator.mkString(" | ")) }
  }

  /** Louvain round-count timing sweep on the benchmark graph. */
  private def louvain(spark: SparkSession, rest: Array[String]): Unit = {
    val edges = cooccurrenceEdges(spark,
      sfDir(rest, "/root/testdata/sf0.1"))
    GraphOps.louvain(edges, rounds = 1).write.format("noop")
      .mode("overwrite").save() // warm
    for (r <- Seq(1, 2, 4)) timed(s"louvain r=$r") {
      GraphOps.louvain(edges, rounds = r).write.format("noop")
        .mode("overwrite").save()
    }
    timed("multilevel 4+4") {
      GraphOps.louvainMultiLevel(edges).write.format("noop")
        .mode("overwrite").save()
    }
  }

  /** Stage-by-stage q_x2l semantic-dedup pipeline counts. */
  private def semdedup(spark: SparkSession, rest: Array[String]): Unit = {
    val e = spark.read
      .parquet(sfDir(rest, "/root/testdata/sf0.1") + "/embeddings.parquet")
    val corpus = e.select(col("vec_id"), col("embedding")).unionByName(
      e.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000000L).as("vec_id"),
          transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
            .as("embedding")))
    println(s"corpus=${corpus.count()}")
    val (cents, assigned) = Similarity.ivfIndex(corpus, "embedding",
      "vec_id", 32)
    println(s"centroids=${cents.count()} assigned=${assigned.count()}")
    assigned.groupBy("centroid_id").count()
      .orderBy(desc("count")).show(8, truncate = false)
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
    val out = Dedup.connectedComponents(corpus.select(col("vec_id")),
      "vec_id", pairs)
    println(s"cc=${out.count()} in ${(System.nanoTime - t1) / 1e9}s")
  }

  /** Disconnected-community census + modularity across leiden variants
    * (schedule × seeding grid). */
  private def leiden(spark: SparkSession, rest: Array[String]): Unit = {
    val edges = cooccurrenceEdges(spark,
      sfDir(rest, "/root/testdata/sf0.001")).cache()
    def report(name: String, labels: DataFrame): Unit = {
      val lab = labels.cache()
      val nComm = lab.select("community").distinct().count()
      val split = GraphOps.leidenRefine(edges, lab)
        .withColumnRenamed("community", "part")
        .join(lab, Seq("id"))
        .groupBy("community").agg(countDistinct(col("part")).as("np"))
        .filter(col("np") > 1).count()
      val q = GraphOps.modularity(edges, lab)
        .agg(sum(col("q_c")).as("q")).head().getDouble(0)
      println(
        f"PROBE $name%-10s comms=$nComm%5d disconnected=$split%4d Q=$q%.6f")
    }
    report("louvain", GraphOps.louvainMultiLevel(edges))
    report("refined", GraphOps.leidenRefine(edges,
      GraphOps.louvainMultiLevel(edges)))
    import graft.Checkpointer
    val ckpt = Checkpointer.Local
    val fine = ckpt(GraphOps.louvain(edges, 4, 42L, None, ckpt,
      schedule = "ugug"))
    report("fine", fine)
    val refined = ckpt(GraphOps.leidenRefine(edges, fine, ckpt))
    report("fineRef", refined)
    val coarse = GraphOps.louvainCoarsen(edges, refined)
    val partHome = refined
      .join(fine.withColumnsRenamed(Map("community" -> "_home")),
        Seq("id"))
      .select(col("community").as("id"), col("_home").as("community"))
      .distinct()
    for ((name, schedU, seed) <- Seq(
        ("ugug_seed", "ugug", true), ("ugug_free", "ugug", false),
        ("gggg_seed", "gggg", true), ("gugu_seed", "gugu", false))) {
      val up = GraphOps.louvain(coarse, 4, 42L, Some("weight"), ckpt,
          schedule = schedU,
          initLabels = if (seed) Some(partHome) else None)
        .select(col("id").as("_cid"), col("community").as("_c2"))
      val proj = ckpt(refined
        .join(up, refined("community") === up("_cid"))
        .select(col("id"), col("_c2").as("community")))
      report(name, GraphOps.leidenRefine(edges, proj, ckpt))
    }
  }

  /** Timing breakdown of q_g24: multiLevel vs refinement CC, with
    * per-round CC timing, stat bit-lengths, and an optional stuck-main
    * stack dump. PROBE_AQE_OFF / PROBE_BC_OFF toggle the re-plan and
    * broadcast knobs. */
  private def leiden2(spark: SparkSession, rest: Array[String]): Unit = {
    val edges = cooccurrenceEdges(spark,
      sfDir(rest, "/root/testdata/sf0.1"))
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE2 $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (_ <- 1 to 2) {
      val lab = time("multiLevel") {
        val l = GraphOps.louvainMultiLevel(edges).localCheckpoint()
        l.count(); l
      }
      time("refine") {
        GraphOps.leidenRefine(edges, lab)
          .write.format("noop").mode("overwrite").save()
      }
      val canon = edges.select(
          least(col("start_id"), col("end_id")).as("a"),
          greatest(col("start_id"), col("end_id")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val intra = time("intra") {
        val i = canon
          .join(lab.withColumnsRenamed(
            Map("id" -> "a", "community" -> "_ca")), Seq("a"))
          .join(lab.withColumnsRenamed(
            Map("id" -> "b", "community" -> "_cb")), Seq("b"))
          .filter(col("_ca") === col("_cb"))
          .select(col("a").as("id_a"), col("b").as("id_b"))
          .localCheckpoint()
        println(s"PROBE2 intra_edges=${i.count()}")
        i
      }
      sys.env.get("PROBE_AQE_OFF").foreach(_ =>
        spark.conf.set("spark.sql.adaptive.enabled", "false"))
      sys.env.get("PROBE_BC_OFF").foreach(_ =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1"))
      time("cc_traced") {
        val ccEdges = intra
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(
            intra.select(col("id_b").as("src"), col("id_a").as("dst")))
          .distinct().localCheckpoint()
        var labels = lab.select(col("id"), col("id").as("comp"))
          .distinct().localCheckpoint()
        var prevSum = Option.empty[Any]
        var converged = false
        var i = 0
        while (!converged && i < 25) {
          val t0 = System.nanoTime()
          if (i >= 4) {
            val watcher = new Thread(() => {
              Thread.sleep(2500)
              import scala.jdk.CollectionConverters._
              Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
                if (t.getName == "main" &&
                    t.getState == Thread.State.RUNNABLE) {
                  println(s"PROBE2-STACK ${t.getName} (${t.getState}):")
                  st.take(60).foreach(f => println(s"PROBE2-STACK   $f"))
                }
              }
            })
            watcher.setDaemon(true)
            watcher.start()
          }
          val nbrMin = ccEdges
            .join(labels.withColumnsRenamed(
              Map("id" -> "dst", "comp" -> "_nc")), Seq("dst"))
            .groupBy(col("src").as("id")).agg(min(col("_nc")).as("_nbr"))
          val hopped = labels.join(nbrMin, Seq("id"), "left")
            .select(col("id"),
              least(col("comp"), coalesce(col("_nbr"), col("comp")))
                .as("comp"))
            .localCheckpoint()
          val jumped = hopped
            .join(hopped.select(col("id").as("comp"),
              col("comp").as("_cc")), Seq("comp"), "left")
            .select(col("id"), coalesce(col("_cc"), col("comp")).as("comp"))
            .localCheckpoint()
          val curSum = jumped.agg(sum(col("comp"))).head().get(0)
          converged = prevSum.contains(curSum)
          prevSum = Some(curSum)
          labels = jumped
          i += 1
          val bits = jumped.queryExecution.optimizedPlan.stats
            .sizeInBytes.bigInteger.bitLength()
          println(
            f"PROBE2 round$i%-3d ${(System.nanoTime() - t0) / 1e9}%5.2f s " +
              f"sum=$curSum statBits=$bits")
        }
      }
    }
  }

  /** End-to-end drive of newer public APIs as a user program would call
    * them: csv graph build with ascii-fold, salted join, file-based
    * streaming staging, no-string-columns fold build. */
  private def feature(spark: SparkSession, rest: Array[String]): Unit = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("drive").toString
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
    val g = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml),
      asciiFold = true)
    println("FOLDED=" + g.nodes("Person").orderBy("id")
      .select("name").as[String].collect().mkString("|"))

    val big = (1 to 100000)
      .map(i => (if (i % 10 != 0) 7L else i.toLong, 1)).toDF("k", "v")
    val dim = (1 to 200).map(i => (i.toLong, s"t$i")).toDF("k", "tag")
    val plain = big.join(dim, Seq("k")).count()
    val salted = Skew.saltedJoin(big, dim, "k", 16).count()
    println(s"JOIN plain=$plain salted=$salted match=${plain == salted}")
    val salted1 = Skew.saltedJoin(big, dim, "k", 1).count()
    println(s"JOIN saltBuckets=1 $salted1 match=${plain == salted1}")

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

    Seq((1L, 2.5), (2L, 3.5)).toDF("id", "x")
      .write.parquet(s"$tmp/nums.parquet")
    val yaml2 =
      s"""Database: { name: Nums, version: "1" }
         |Sources:
         |  P: { source type: parquet, path: $tmp }
         |Nodes:
         |  Num:
         |    sources:
         |      P: { table: nums, id_key: id }
         |""".stripMargin
    val g2 = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml2),
      asciiFold = true)
    println("NUMS=" + g2.nodes("Num").count())
  }
}
