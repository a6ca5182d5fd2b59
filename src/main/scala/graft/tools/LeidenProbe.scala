package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** Diagnostic: does plain louvainMultiLevel leave internally
  * disconnected communities on the q_g23 benchmark graph, and does
  * [[GraphOps.leiden]] close the gap without losing modularity?
  * Prints per-method (n communities, n disconnected, whole-graph Q). */
object LeidenProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
      .cache()
    def report(name: String, labels: org.apache.spark.sql.DataFrame): Unit = {
      val lab = labels.cache()
      val nComm = lab.select("community").distinct().count()
      // a community is disconnected iff refine splits it
      val split = GraphOps.leidenRefine(edges, lab)
        .withColumnRenamed("community", "part")
        .join(lab, Seq("id"))
        .groupBy("community").agg(countDistinct(col("part")).as("np"))
        .filter(col("np") > 1).count()
      val q = GraphOps.modularity(edges, lab)
        .agg(sum(col("q_c")).as("q")).head().getDouble(0)
      println(f"PROBE $name%-10s comms=$nComm%5d disconnected=$split%4d Q=$q%.6f")
    }
    report("louvain", GraphOps.louvainMultiLevel(edges))
    report("refined", GraphOps.leidenRefine(edges,
      GraphOps.louvainMultiLevel(edges)))
    // variant grid: coarse schedule x seeding, refinement between phases
    import graft.Checkpointer
    val ckpt = Checkpointer.Local
    val fine = ckpt(GraphOps.louvain(edges, 4, 42L, None, ckpt,
      schedule = "ugug"))
    report("fine", fine)
    val refined = ckpt(GraphOps.leidenRefine(edges, fine, ckpt))
    report("fineRef", refined)
    val coarse = GraphOps.louvainCoarsen(edges, refined)
    val partHome = refined
      .join(fine.withColumnsRenamed(Map("community" -> "_home")), Seq("id"))
      .select(col("community").as("id"), col("_home").as("community"))
      .distinct()
    for ((name, schedU, seed) <- Seq(
        ("ugug_seed", "ugug", true), ("ugug_free", "ugug", false),
        ("gggg_seed", "gggg", true), ("gugu_seed", "gugu", false))) {
      val up = GraphOps.louvain(coarse, 4, 42L, Some("weight"), ckpt,
          schedule = schedU,
          initLabels = if (seed) Some(partHome) else None)
        .select(col("id").as("_cid"), col("community").as("_c2"))
      val proj = ckpt(refined.join(up, refined("community") === up("_cid"))
        .select(col("id"), col("_c2").as("community")))
      report(name, GraphOps.leidenRefine(edges, proj, ckpt))
    }
    spark.stop()
  }
}
