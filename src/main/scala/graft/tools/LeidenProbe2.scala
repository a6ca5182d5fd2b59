package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Timing breakdown of q_g24: multiLevel vs the refinement CC. */
object LeidenProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = li.alias("a"); val b = li.alias("b")
    val edges = a.join(b,
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("start_id"), col("b.pk").as("end_id"))
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
      // breakdown: intra-edge derivation vs the CC rounds
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
      // inline CC with per-round timing (mirrors Dedup.connectedComponents)
      sys.env.get("PROBE_AQE_OFF").foreach(_ =>
        spark.conf.set("spark.sql.adaptive.enabled", "false"))
      sys.env.get("PROBE_BC_OFF").foreach(_ =>
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1"))
      time("cc_traced") {
        val ccEdges = intra.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(intra.select(col("id_b").as("src"), col("id_a").as("dst")))
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
            .join(labels.withColumnsRenamed(Map("id" -> "dst", "comp" -> "_nc")),
              Seq("dst"))
            .groupBy(col("src").as("id")).agg(min(col("_nc")).as("_nbr"))
          val hopped = labels.join(nbrMin, Seq("id"), "left")
            .select(col("id"),
              least(col("comp"), coalesce(col("_nbr"), col("comp"))).as("comp"))
            .localCheckpoint()
          val jumped = hopped
            .join(hopped.select(col("id").as("comp"), col("comp").as("_cc")),
              Seq("comp"), "left")
            .select(col("id"), coalesce(col("_cc"), col("comp")).as("comp"))
            .localCheckpoint()
          val curSum = jumped.agg(sum(col("comp"))).head().get(0)
          converged = prevSum.contains(curSum)
          prevSum = Some(curSum)
          labels = jumped
          i += 1
          val bits = jumped.queryExecution.optimizedPlan.stats
            .sizeInBytes.bigInteger.bitLength()
          println(f"PROBE2 round$i%-3d ${(System.nanoTime() - t0) / 1e9}%5.2f s " +
            f"sum=$curSum statBits=$bits")
        }
      }
    }
    spark.stop()
  }
}
