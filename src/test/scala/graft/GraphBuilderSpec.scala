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

  test("Neo4j CSV export round-trips RFC-4180 pathological values") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-rfc").toString
    // embedded quote, newline, comma, and a `;`-bearing array element — the
    // exact cells that break a writer whose escape char is not the quote
    val nasty = Seq(
      (1L, "he said \"hi\"", Seq("a;b", "c,d")),
      (2L, "line one\nline two", Seq("plain")),
      (3L, "commas, everywhere,", Seq.empty[String]))
      .toDF("id", "txt", "tags")
    val g = operators.PropertyGraph(
      DatabaseMeta("Rfc", "1", None, None, None),
      nodes = Map("N" -> nasty), relationships = Map.empty)
    g.exportNeo4jCsv(tmp, Map("N" -> "id"))
    // re-read with an RFC-4180 parser (escape = quote, multiline cells)
    val back = spark.read
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true").option("inferSchema", "true")
      .csv(s"$tmp/Rfc-1-csv/nodes_N")
    val byId = back.collect().map(r => r.getInt(0).toLong -> r).toMap
    assert(byId(1L).getString(1) == "he said \"hi\"")
    assert(byId(2L).getString(1) == "line one\nline two")
    assert(byId(3L).getString(1) == "commas, everywhere,")
    // array props export `;`-joined under a name:type[] header
    assert(back.columns.contains("tags:string[]"))
    assert(byId(1L).getAs[String]("tags:string[]") == "a;b;c,d")
  }

  test("join_table props flow from config YAML onto edges") {
    val yaml =
      s"""Database: { name: EdgeProps, version: "1" }
         |Sources:
         |  P: { source type: parquet, path: ${sf()} }
         |Nodes:
         |  Order:
         |    sources:
         |      P: { table: orders, id_key: o_orderkey }
         |  Part:
         |    sources:
         |      P: { table: part, id_key: p_partkey }
         |Relationships:
         |  ORDER_CONTAINS_PART:
         |    start_node: Order
         |    end_node: Part
         |    sources:
         |      P:
         |        type: join_table
         |        table: lineitem
         |        from_field: l_orderkey
         |        to_field: l_partkey
         |        props: [l_linenumber, l_quantity]
         |""".stripMargin
    val cfg2 = GraphConfig.fromYaml(yaml)
    assert(cfg2.relationships.head.sources.head.mode
      .asInstanceOf[JoinTableMode].props == Seq("l_linenumber", "l_quantity"))
    val g = GraphBuilder.build(spark, cfg2)
    val edges = g.relationships("ORDER_CONTAINS_PART")
    assert(edges.columns.toSeq ==
      Seq("start_id", "end_id", "l_linenumber", "l_quantity"))
    assert(edges.count() == 6000)
  }

  test("fk id-key resolution failure names label/table/column, not an " +
      "AnalysisException") {
    // Node declared over a DIFFERENT table than the FK side references →
    // fallback id key (o_orderkey) is absent from the customer table
    val yaml =
      s"""Database: { name: BadFk, version: "1" }
         |Sources:
         |  P: { source type: parquet, path: ${sf()} }
         |Nodes:
         |  Order:
         |    sources:
         |      P: { table: orders, id_key: o_orderkey }
         |  Nation:
         |    sources:
         |      P: { table: nation, id_key: n_nationkey }
         |Relationships:
         |  BROKEN:
         |    sources:
         |      P:
         |        type: foreign_key
         |        start: { node: Order, table: customer, key: c_nationkey }
         |        end: { node: Nation, table: nation, key: n_nationkey }
         |""".stripMargin
    val e = intercept[IllegalArgumentException](
      GraphBuilder.build(spark, GraphConfig.fromYaml(yaml)))
    assert(e.getMessage.contains("BROKEN"))
    assert(e.getMessage.contains("o_orderkey"))
    assert(e.getMessage.contains("customer"))
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
