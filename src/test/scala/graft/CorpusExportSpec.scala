package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.config.DatabaseMeta
import graft.operators.{CorpusExport, GraphBuilder}

/** Corpus export sharding/manifest + incremental staging upsert. */
class CorpusExportSpec extends SparkSpec {
  import spark.implicits._

  test("writeSharded: contiguous disjoint ranges, sorted files, record cap") {
    val tmp = Files.createTempDirectory("graft-export").toString + "/corpus"
    val df = spark.read.parquet(sf() + "/documents.parquet") // 500 docs
    CorpusExport.writeSharded(df, tmp, "doc_id",
      numShards = 4, maxRecordsPerFile = 60)
    val manifest = CorpusExport.shardManifest(spark, tmp, "doc_id").collect()
    // 500 rows over 4 range shards with a 60-record cap → at least 9 files
    assert(manifest.length >= 9)
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == 500)
    assert(manifest.forall(_.getAs[Long]("n_rows") <= 60))
    // manifest is ordered by key_min; ranges must be disjoint & contiguous
    val ranges = manifest.map(r =>
      (r.getAs[Long]("key_min"), r.getAs[Long]("key_max")))
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"overlapping shard ranges: $hi >= $lo2")
    }
    assert(ranges.head._1 == 0L && ranges.last._2 == 499L)
    // rows inside one file are sorted (parquet row order == write order)
    val firstFile = manifest.head.getAs[String]("file")
    val inFile = spark.read.parquet(tmp)
      .withColumn("f", input_file_name())
      .filter(col("f") === firstFile)
      .select("doc_id").as[Long].collect()
    assert(inFile.toSeq == inFile.sorted.toSeq)
  }

  test("upsertStagedNodes: first-seen wins, null fill-in, new ids append") {
    val tmp = Files.createTempDirectory("graft-upsert").toString
    val meta = DatabaseMeta("Inc", "1", None, None, None)
    val batch1 = Seq((1L, "alice", null.asInstanceOf[String]),
      (2L, "bob", null.asInstanceOf[String]))
      .toDF("id", "name", "city")
    GraphBuilder.upsertStagedNodes(spark, tmp, meta, "Person", batch1, "id")
    // batch 2: conflicting name (must NOT win), null fill (city), new id
    val batch2 = Seq((1L, "ALICE-2", "paris"), (3L, "carol", "rome"))
      .toDF("id", "name", "city")
    GraphBuilder.upsertStagedNodes(spark, tmp, meta, "Person", batch2, "id")
    val staged = spark.read.parquet(s"$tmp/Inc-1/nodes/Person")
      .orderBy("id").collect()
    assert(staged.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(staged(0).getString(1) == "alice") // first-seen wins
    assert(staged(0).getString(2) == "paris") // null filled from update
    assert(staged(2).getString(1) == "carol") // new id appended
    // idempotent: replaying batch 2 changes nothing
    GraphBuilder.upsertStagedNodes(spark, tmp, meta, "Person", batch2, "id")
    val again = spark.read.parquet(s"$tmp/Inc-1/nodes/Person")
      .orderBy("id").collect()
    assert(again.toSeq == staged.toSeq)
    // no tmp droppings left behind
    assert(!new java.io.File(s"$tmp/Inc-1/nodes/Person._tmp").exists())
  }

  test("upsertStagedNodes: schema widening across batches (A1 lattice)") {
    val tmp = Files.createTempDirectory("graft-upsert2").toString
    val meta = DatabaseMeta("Inc", "2", None, None, None)
    GraphBuilder.upsertStagedNodes(spark, tmp, meta, "N",
      Seq((1, 10)).toDF("id", "v"), "id")
    GraphBuilder.upsertStagedNodes(spark, tmp, meta, "N",
      Seq((2L, 3.5)).toDF("id", "v"), "id")
    val staged = spark.read.parquet(s"$tmp/Inc-2/nodes/N")
    assert(staged.schema("id").dataType.typeName == "long")
    assert(staged.schema("v").dataType.typeName == "double")
    assert(staged.count() == 2)
  }
}
