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

  test("orc source round-trips with schema intact (columnar sibling)") {
    val tmp = Files.createTempDirectory("graft-orc").toString
    val nation = spark.read.parquet(sf() + "/nation.parquet")
    nation.write.orc(s"$tmp/nation.orc")
    val orcDf = SourceReader.readTable(spark,
      SourceConf("o", "orc", tmp), "nation")
    assert(orcDf.count() == 25)
    assert(orcDf.schema == nation.schema) // ORC preserves types exactly
    // predicate pushdown reaches the ORC scan like parquet
    val plan = orcDf.filter(col("n_regionkey") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushed"))
  }

  test("jdbc source: Derby-backed read, schema peek, and full graph build (S1)") {
    // Embedded Derby (ships in /opt/spark/jars) stands in for the
    // reference's MySQL source (sql_io.py:4-13): same Spark JDBC relation,
    // different url. In-memory db lives for the JVM, so local[n] executor
    // threads all see it.
    val url = "jdbc:derby:memory:graftdb"
    val conn = java.sql.DriverManager.getConnection(url + ";create=true")
    try {
      val st = conn.createStatement()
      for (t <- Seq("CUSTOMER", "NATION"))
        try st.executeUpdate(s"DROP TABLE $t") catch { case _: Exception => () }
      st.executeUpdate(
        "CREATE TABLE NATION (N_NATIONKEY BIGINT PRIMARY KEY, N_NAME VARCHAR(32))")
      st.executeUpdate(
        "CREATE TABLE CUSTOMER (C_CUSTKEY BIGINT PRIMARY KEY, " +
          "C_NAME VARCHAR(32), C_NATIONKEY BIGINT)")
      st.executeUpdate("INSERT INTO NATION VALUES (0, 'FRANCE'), (1, 'KENYA')")
      st.executeUpdate(
        "INSERT INTO CUSTOMER VALUES (10, 'alice', 0), (11, 'bob', 0), " +
          "(12, 'carol', 1), (13, 'dave', 1), (14, 'erin', 0)")
      st.close()
    } finally conn.close()

    val src = SourceConf("DB", "jdbc", url,
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    // S2: schema from JDBC metadata, no data fetch
    val schema = SourceReader.peekSchema(spark, src, "CUSTOMER")
    assert(schema.fieldNames.toSeq == Seq("C_CUSTKEY", "C_NAME", "C_NATIONKEY"))
    // S3: full scan
    assert(SourceReader.readTable(spark, src, "CUSTOMER").count() == 5)

    // End-to-end: jdbc-sourced config-compiled graph build with an fk edge
    // whose join key (C_NATIONKEY) differs from the start node's id.
    val yaml =
      s"""Database: { name: JdbcGraph, version: "1" }
         |Sources:
         |  DB:
         |    source type: jdbc
         |    path: $url
         |    driver: org.apache.derby.jdbc.EmbeddedDriver
         |Nodes:
         |  Customer:
         |    sources:
         |      DB: { table: CUSTOMER, id_key: C_CUSTKEY }
         |  Nation:
         |    sources:
         |      DB: { table: NATION, id_key: N_NATIONKEY }
         |Relationships:
         |  CUSTOMER_IN_NATION:
         |    sources:
         |      DB:
         |        type: foreign_key
         |        start: { node: Customer, table: CUSTOMER, key: C_NATIONKEY }
         |        end: { node: Nation, table: NATION, key: N_NATIONKEY }
         |""".stripMargin
    val g = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml))
    assert(g.nodes("Customer").count() == 5)
    assert(g.nodes("Nation").count() == 2)
    val edges = g.relationships("CUSTOMER_IN_NATION")
      .orderBy("start_id").collect()
    assert(edges.map(_.getLong(0)).toSeq == Seq(10L, 11L, 12L, 13L, 14L))
    assert(edges.map(_.getLong(1)).toSeq == Seq(0L, 0L, 1L, 1L, 0L))
  }

  test("jdbc partitioned read: stride options split the scan (scale path)") {
    // At real scale a JDBC read must parallelize: partitionColumn +
    // bounds shard the table into per-executor range queries. Options
    // pass straight through SourceReader (same Derby db as above —
    // scalatest runs suite tests in declaration order).
    val src = SourceConf("DB", "jdbc", "jdbc:derby:memory:graftdb",
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
        "partitionColumn" -> "C_CUSTKEY",
        "lowerBound" -> "10", "upperBound" -> "15", "numPartitions" -> "3"))
    val df = SourceReader.readTable(spark, src, "CUSTOMER")
    assert(df.rdd.getNumPartitions == 3)
    assert(df.select("C_CUSTKEY").as[Long].collect().sorted.toSeq ==
      Seq(10L, 11L, 12L, 13L, 14L)) // range sharding never drops rows
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
