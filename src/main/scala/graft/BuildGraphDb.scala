package graft

import org.apache.spark.sql.SparkSession

import graft.config.GraphConfig
import graft.operators.GraphBuilder

/** CLI entry point — the drop-in equivalent of the reference's
  * `bin/build-graph-db -f config.yml` (bin/build-graph-db:7-16): parse the
  * YAML graph spec, build the property graph, write the parquet staging
  * store, optionally export Neo4j bulk-import CSVs, print the stats report.
  *
  * Usage:
  *   runMain graft.BuildGraphDb -f <config.yml> -o <outDir>
  *     [--csv] [--ascii-fold] [--master local[N]]
  */
object BuildGraphDb {

  private case class Args(
      configFile: String = "",
      outDir: String = "",
      csv: Boolean = false,
      asciiFold: Boolean = false,
      master: String = s"local[${Runtime.getRuntime.availableProcessors}]")

  private def parse(argv: List[String], acc: Args): Args = argv match {
    case Nil => acc
    case "-f" :: v :: rest => parse(rest, acc.copy(configFile = v))
    case "-o" :: v :: rest => parse(rest, acc.copy(outDir = v))
    case "--csv" :: rest => parse(rest, acc.copy(csv = true))
    case "--ascii-fold" :: rest => parse(rest, acc.copy(asciiFold = true))
    case "--master" :: v :: rest => parse(rest, acc.copy(master = v))
    case other :: _ =>
      throw new IllegalArgumentException(
        s"unknown argument '$other'; usage: -f <config.yml> -o <outDir> " +
          "[--csv] [--ascii-fold] [--master local[N]]")
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toList, Args())
    require(args.configFile.nonEmpty, "missing -f <config.yml>")
    require(args.outDir.nonEmpty, "missing -o <outDir>")

    val spark = SparkSession.builder()
      .master(args.master)
      .appName("graft-build-graph-db")
      .config("spark.sql.shuffle.partitions",
        math.max(Runtime.getRuntime.availableProcessors, 4).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val cfg = GraphConfig.fromFile(args.configFile).validated
      val graph = GraphBuilder.build(spark, cfg, asciiFold = args.asciiFold)
      graph.writeStaging(args.outDir)
      if (args.csv) {
        val idKeys = cfg.nodes.map(n =>
          n.label -> n.idKeyLabel.getOrElse(n.sources.head.idKey)).toMap
        graph.exportNeo4jCsv(args.outDir, idKeys)
      }
      println(s"[build-graph-db] staged ${graph.nodes.size} node tables and " +
        s"${graph.relationships.size} relationship tables under " +
        s"${args.outDir}/${cfg.database.outputStem}")
      graph.stats(spark).show(100, truncate = false)
    } finally spark.stop()
  }
}
