package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.NodePipeline

/** P1 projection/null-fill + A3 union + A2 merge-by-id semantics
  * (reference contract graph_db_builder.py:474-479, :493-497). */
class NodePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("projectToSchema aligns, casts, and null-fills") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "x")
    val target = graft.plans.SchemaMerge.mergeFields(Seq(
      df.schema,
      Seq((1L, 0.5)).toDF("id", "y").schema))
    val out = NodePipeline.projectToSchema(df, target)
    assert(out.columns.toSeq == Seq("id", "x", "y"))
    assert(out.schema("id").dataType.typeName == "long") // widened
    val rows = out.orderBy("id").collect()
    assert(rows(0) == Row(1L, "a", null))
  }

  test("buildNodeTable: first-source-wins merge precedence, null fill-in") {
    // src0 knows names; src1 knows scores and a conflicting name.
    val src0 = Seq((1, "alice", null.asInstanceOf[String]),
      (2, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("id", "name", "only0")
    val src1 = Seq((1, "ALICE-CONFLICT", 10.0), (3, "carol", 30.0))
      .toDF("id", "name", "score")
    val out = NodePipeline.buildNodeTable(Seq(src0, src1), "id")
      .orderBy("id").collect()
    // id=1: name from src0 (rank wins over src1's conflict), score from src1
    assert(out(0) == Row(1, "alice", null, 10.0))
    // id=2: src0 only; null name stays null (nothing to fall back to)
    assert(out(1) == Row(2, null, null, null))
    // id=3: src1 only
    assert(out(2) == Row(3, "carol", null, 30.0))
  }

  test("merge precedence falls back to later source when earlier is null") {
    val src0 = Seq((1, null.asInstanceOf[String])).toDF("id", "v")
    val src1 = Seq((1, "from-src1")).toDF("id", "v")
    val out = NodePipeline.buildNodeTable(Seq(src0, src1), "id").collect()
    assert(out(0) == Row(1, "from-src1"))
  }

  test("dup ids WITHIN one source collapse via max (documented tie-break)") {
    val src0 = Seq((1, "b"), (1, "a"), (2, "z")).toDF("id", "v")
    val out = NodePipeline.buildNodeTable(Seq(src0), "id")
      .orderBy("id").collect()
    // max(when(rank === 0, v)) over the two rank-0 rows picks the max value
    assert(out(0) == Row(1, "b"))
    assert(out(1) == Row(2, "z"))
    // and a within-source dup never outranks an earlier source
    val src1 = Seq((1, "later-src")).toDF("id", "v")
    val merged = NodePipeline.buildNodeTable(Seq(src0, src1), "id")
      .orderBy("id").collect()
    assert(merged(0) == Row(1, "b"))
  }

  test("merge is idempotent: merging a merged table changes nothing") {
    val src0 = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val src1 = Seq((2, "B"), (3, "c")).toDF("id", "v")
    val once = NodePipeline.buildNodeTable(Seq(src0, src1), "id")
    val twice = NodePipeline.buildNodeTable(Seq(once), "id")
    assert(once.orderBy("id").collect().toSeq ==
      twice.orderBy("id").collect().toSeq)
  }
}
