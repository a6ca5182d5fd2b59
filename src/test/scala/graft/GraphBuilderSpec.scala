package graft

import java.nio.file.Files

import graft.config._
import graft.operators.GraphBuilder

/** End-to-end config-compiled build over the sf0.001 fixtures + sinks
  * (SURVEY.md §5 item 4). */
class GraphBuilderSpec extends SparkSpec {

  private lazy val cfg = GraphConfig.fromYaml(SparkEntry.fixtureYaml(sf()))

  test("config parse: database, sources, nodes, relationships") {
    assert(cfg.database.name == "TpchGraph")
    assert(cfg.sources("TPCH").sourceType == "parquet")
    assert(cfg.nodes.map(_.label).toSet ==
      Set("Customer", "Order", "Part", "Nation"))
    val rels = cfg.relationships.map(r => r.label -> r).toMap
    assert(rels("CUSTOMER_PLACED_ORDER").sources.head.mode
      .isInstanceOf[ForeignKeyMode])
    assert(rels("ORDER_CONTAINS_PART").sources.head.mode
      .isInstanceOf[JoinTableMode])
    assert(rels("ORDER_CONTAINS_PART").startNode.contains("Order"))
  }

  test("reference-grammar config (mysql-style) also parses") {
    val yaml =
      """Database:
        |  name: ComptoxLike
        |  version: 0.2a
        |Sources:
        |  DB:
        |    source type: mysql
        |    database name: somedb
        |Nodes:
        |  Gene:
        |    id_key_label: entrez_gene_id
        |    sources:
        |      DB: { table: gene_info, id_key: entrez, uri_key: HUGO_id }
        |Relationships:
        |  AOP_INCLUDES_GENE:
        |    sources:
        |      DB:
        |        type: join_table
        |        table: aop_gene
        |        from_field: AOP_id
        |        to_field: entrez
        |""".stripMargin
    val c = GraphConfig.fromYaml(yaml)
    assert(c.database.version == "0.2a")
    assert(c.nodes.head.idKeyLabel.contains("entrez_gene_id"))
    assert(c.relationships.head.sources.head.mode ==
      JoinTableMode("aop_gene", "AOP_id", "entrez"))
  }

  test("build: node and edge counts match the fixtures") {
    val g = GraphBuilder.build(spark, cfg)
    assert(g.nodes("Customer").count() == 150)
    assert(g.nodes("Order").count() == 1500)
    assert(g.relationships("CUSTOMER_PLACED_ORDER").count() == 1500)
    assert(g.relationships("ORDER_CONTAINS_PART").count() == 6000)
    assert(g.relationships("CUSTOMER_IN_NATION").count() == 150)
    // edges expose the canonical start_id/end_id contract
    assert(g.relationships("CUSTOMER_PLACED_ORDER").columns.toSeq ==
      Seq("start_id", "end_id"))
  }

  test("fk edges resolve start_id to the start node's id, not the join key") {
    val g = GraphBuilder.build(spark, cfg)
    // CUSTOMER_IN_NATION joins on c_nationkey (0-24) but Customer's id is
    // c_custkey (0-149): start_id must span the full custkey range — the
    // raw-join-key bug would silently alias nation keys onto customer ids.
    val ids = g.relationships("CUSTOMER_IN_NATION")
      .agg(org.apache.spark.sql.functions.countDistinct("start_id"),
        org.apache.spark.sql.functions.max("start_id")).head()
    assert(ids.getLong(0) == 150)
    assert(ids.getLong(1) == 149L)
  }

  test("multi-source precedence follows config order, not alphabetical") {
    val tmp = Files.createTempDirectory("graft-order").toString
    import spark.implicits._
    // source named 'zzz' comes FIRST in config → its props must win
    Seq((1L, "from_zzz")).toDF("id", "val").write.parquet(s"$tmp/t_z.parquet")
    Seq((1L, "from_aaa")).toDF("id", "val").write.parquet(s"$tmp/t_a.parquet")
    val yaml =
      s"""Database: { name: Order, version: "1" }
         |Sources:
         |  zzz: { source type: parquet, path: $tmp }
         |  aaa: { source type: parquet, path: $tmp }
         |Nodes:
         |  N:
         |    sources:
         |      zzz: { table: t_z, id_key: id }
         |      aaa: { table: t_a, id_key: id }
         |""".stripMargin
    val g = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml))
    assert(g.nodes("N").head().getString(1) == "from_zzz")
  }

  test("staging + Neo4j CSV export write expected layouts") {
    val tmp = Files.createTempDirectory("graft-sink").toString
    val g = GraphBuilder.build(spark, cfg)
    val small = g.copy(
      nodes = g.nodes.view.filterKeys(_ == "Nation").toMap,
      relationships = Map.empty)
    small.writeStaging(tmp)
    val staged = spark.read.parquet(s"$tmp/TpchGraph-0.1/nodes/Nation")
    assert(staged.count() == 25)

    small.exportNeo4jCsv(tmp, Map("Nation" -> "n_nationkey"))
    val csvDir = new java.io.File(s"$tmp/TpchGraph-0.1-csv/nodes_Nation")
    val part = csvDir.listFiles().filter(_.getName.endsWith(".csv")).head
    val header = scala.io.Source.fromFile(part).getLines().next()
    assert(header.contains("n_nationkey:ID(Nation)"))
    assert(header.contains(":LABEL"))
  }

  test("validation: dangling source/node references fail fast with all errors") {
    val yaml =
      """Database: { name: Bad, version: "1" }
        |Sources:
        |  P: { source type: parquet, path: /tmp }
        |Nodes:
        |  A:
        |    sources:
        |      MISSING: { table: t, id_key: k }
        |Relationships:
        |  R:
        |    sources:
        |      P:
        |        type: foreign_key
        |        start: { node: A, table: t, key: k }
        |        end: { node: NOPE, table: u, key: k }
        |""".stripMargin
    val e = intercept[IllegalArgumentException](
      GraphConfig.fromYaml(yaml).validated)
    assert(e.getMessage.contains("unknown source 'MISSING'"))
    assert(e.getMessage.contains("unknown node 'NOPE'"))
  }

  test("id_key_label renames the canonical id; uri_key surfaces as _uri") {
    val yaml =
      s"""Database: { name: IdLabel, version: "1" }
         |Sources:
         |  P: { source type: parquet, path: ${sf()} }
         |Nodes:
         |  Customer:
         |    id_key_label: customer_id
         |    sources:
         |      P: { table: customer, id_key: c_custkey, uri_key: c_name }
         |""".stripMargin
    val g = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml))
    val cust = g.nodes("Customer")
    assert(cust.columns.contains("customer_id"))
    assert(!cust.columns.contains("c_custkey"))
    assert(cust.columns.contains("_uri"))
    assert(cust.count() == 150)
    val r = cust.orderBy("customer_id").select("customer_id", "_uri").head()
    assert(r.getLong(0) == 0L) // synthetic custkeys are 0-based
    assert(r.getString(1).nonEmpty) // uri carries c_name
  }

  test("nested array columns (embeddings) survive the node pipeline (X5)") {
    val yaml =
      s"""Database: { name: VecGraph, version: "1" }
         |Sources:
         |  P: { source type: parquet, path: ${sf()} }
         |Nodes:
         |  Vector:
         |    sources:
         |      P: { table: embeddings, id_key: vec_id }
         |""".stripMargin
    val g = GraphBuilder.build(spark, GraphConfig.fromYaml(yaml))
    val vec = g.nodes("Vector")
    assert(vec.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = true))
    assert(vec.count() == 500)
    // values intact after union+merge: spot-check one vector round-trips
    val orig = spark.read.parquet(sf() + "/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0)
    val merged = vec
      .filter(org.apache.spark.sql.functions.col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0)
    assert(orig == merged)
  }

  test("entry smoke: flagship stats >0 rows") {
    assert(SparkEntry.entry(spark).count() == 7)
  }
}
