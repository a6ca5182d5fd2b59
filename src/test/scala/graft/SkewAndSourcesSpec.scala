package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.config.{GraphConfig, SourceConf}
import graft.operators.{GraphBuilder, Skew}
import graft.sources.SourceReader

/** Skew utilities, flat-file sources (S9), and ascii-fold-on-ingest (F1
  * applied in the node pipeline, reference graph_db_builder.py:521-527). */
class SkewAndSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join on skewed data") {
    // hot key 1 carries 90% of rows
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (950L, "cold")).toDF("k", "tag")
    val plain = big.join(small, Seq("k")).agg(count(lit(1)), sum("v")).head()
    val salted = Skew.saltedJoin(big, small, "k", saltBuckets = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(plain == salted)
  }

  test("saltedAgg matches plain aggregation") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", 1.0))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(df, "k", 8,
      partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
      merge = Seq(sum("ps").as("s"), sum("pn").as("n")))
    assert(plain.orderBy("k").collect().toSeq ==
      salted.orderBy("k").collect().toSeq)
  }

  test("csv and json sources round-trip through SourceReader") {
    val tmp = Files.createTempDirectory("graft-src").toString
    val nation = spark.read.parquet(sf() + "/nation.parquet")
    nation.write.option("header", "true").csv(s"$tmp/nation.csv")
    nation.write.json(s"$tmp/nation.json")

    val csvDf = SourceReader.readTable(spark,
      SourceConf("c", "csv", tmp), "nation")
    assert(csvDf.count() == 25)
    assert(csvDf.schema("n_nationkey").dataType.typeName == "integer")

    val jsonDf = SourceReader.readTable(spark,
      SourceConf("j", "json", tmp), "nation")
    assert(jsonDf.count() == 25)
    assert(jsonDf.columns.toSet == nation.columns.toSet)
  }

  test("unknown source type fails with a clear error") {
    val e = intercept[UnsupportedOperationException](
      SourceReader.readTable(spark, SourceConf("x", "hdf5", "/tmp"), "t"))
    assert(e.getMessage.contains("hdf5"))
  }

  test("graph build from a csv source (S9 declared-but-unbuilt in reference)") {
    val tmp = Files.createTempDirectory("graft-csv-src").toString
    spark.read.parquet(sf() + "/nation.parquet")
      .write.option("header", "true").csv(s"$tmp/nation.csv")
    val yaml =
      s"""Database: { name: CsvGraph, version: "1" }
         |Sources:
         |  CSV:
         |    source type: csv
         |    path: $tmp
         |Nodes:
         |  Nation:
         |    sources:
         |      CSV: { table: nation, id_key: n_nationkey }
         |""".stripMargin
    val g = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml))
    assert(g.nodes("Nation").count() == 25)
  }

  test("ascii-fold-on-ingest normalizes string properties") {
    val tmp = Files.createTempDirectory("graft-fold").toString
    Seq((1L, "Café"), (2L, "naïve")).toDF("id", "name")
      .write.parquet(s"$tmp/people.parquet")
    val yaml =
      s"""Database: { name: FoldGraph, version: "1" }
         |Sources:
         |  P: { source type: parquet, path: $tmp }
         |Nodes:
         |  Person:
         |    sources:
         |      P: { table: people, id_key: id }
         |""".stripMargin
    val cfg = GraphConfig.fromYaml(yaml)
    val folded = GraphBuilder.build(spark, cfg, asciiFold = true)
      .nodes("Person").orderBy("id").collect()
    assert(folded.toSeq == Seq(Row(1L, "Cafe"), Row(2L, "naive")))
    // default build leaves values untouched
    val rawRows = GraphBuilder.build(spark, cfg)
      .nodes("Person").orderBy("id").collect()
    assert(rawRows(0).getString(1) == "Café")
  }
}
