package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.config.DatabaseMeta
import graft.operators.{CorpusExport, GraphBuilder}

/** Corpus export sharding/manifest + incremental staging upsert. */
class CorpusExportSpec extends SparkSpec {
  import spark.implicits._

  test("writeShardedJsonl: loader hand-off format keeps order and caps") {
    val tmp = Files.createTempDirectory("graft-jsonl").toString + "/corpus"
    val df = spark.read.parquet(sf() + "/documents.parquet") // 500 docs
    CorpusExport.writeShardedJsonl(df, tmp, "doc_id",
      numShards = 4, maxRecordsPerFile = 60)
    val files = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.length >= 9) // 500 rows / 60-cap over 4 range shards
    // each part is independently gzip-decompressable, one JSON doc per
    // line, sorted within the file
    val first = files.minBy(_.getName)
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(first))))
    val ids = Iterator.continually(in.readLine()).takeWhile(_ != null)
      .map(l => "\"doc_id\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(l).get
        .group(1).toLong)
      .toSeq
    in.close()
    assert(ids.nonEmpty && ids.size <= 60)
    assert(ids == ids.sorted)
    // full round-trip: nothing lost
    assert(spark.read.json(tmp).count() == 500)
    // the manifest contract holds for the jsonl hand-off too
    val manifest = CorpusExport.shardManifest(spark, tmp, "doc_id",
      format = "json").collect()
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == 500)
    assert(manifest.forall(_.getAs[Long]("n_rows") <= 60))
    val ranges = manifest.map(r =>
      (r.getAs[Long]("key_min"), r.getAs[Long]("key_max")))
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi < lo2, s"overlapping jsonl shard ranges: $hi >= $lo2")
    }
  }

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

  test("writeZOrdered: files are 2-D local — both columns prune") {
    val tmp = Files.createTempDirectory("graft-zorder").toString + "/z"
    // full 64×64 grid in 8 z-range shards: ideal shards are 2^9 Morton
    // blocks (32×16 rectangles), but repartitionByRange samples its
    // boundaries, so files can straddle a block — assert the AGGREGATE
    // locality the curve guarantees, not exact block geometry
    val grid = spark.range(4096)
      .select((col("id") / 64).cast("long").as("x"),
        (col("id") % 64).cast("long").as("y"))
    CorpusExport.writeZOrdered(grid, tmp, "x", "y",
      numShards = 8, maxRecordsPerFile = 1000)
    val spans = spark.read.parquet(tmp)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
    assert(spans.length >= 8)
    val avgDx = spans.map(_.getLong(1)).sum.toDouble / spans.length
    val avgDy = spans.map(_.getLong(2)).sum.toDouble / spans.length
    assert(avgDx < 50 && avgDy < 50,
      spans.map(r => (r.getLong(1), r.getLong(2))).mkString(","))
    // contrast: a plain x-sort leaves y unpruned (every file spans all of y)
    val tmp2 = Files.createTempDirectory("graft-xsort").toString + "/x"
    CorpusExport.writeSharded(grid, tmp2, "x", 8, 1000)
    val ySpans = spark.read.parquet(tmp2)
      .withColumn("f", input_file_name())
      .groupBy("f").agg((max("y") - min("y")).as("dy")).collect()
    assert(ySpans.forall(_.getLong(1) == 63L))
  }

  test("morton2 kernel: interleave round-trips known patterns") {
    import graft.functions.BitKernels
    assert(BitKernels.morton2(0L, 0L) == 0L)
    assert(BitKernels.morton2(1L, 0L) == 1L) // a on even bits
    assert(BitKernels.morton2(0L, 1L) == 2L) // b on odd bits
    assert(BitKernels.morton2(3L, 3L) == 15L)
    assert(BitKernels.morton2(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(BitKernels.morton2(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
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

  test("upsertStagedNodes: crash between renames self-heals on next run") {
    val tmp = Files.createTempDirectory("graft-crash").toString
    val meta = DatabaseMeta("Cr", "1", None, None, None)
    GraphBuilder.upsertStagedNodes(spark, tmp, meta, "N",
      Seq((1L, "alice")).toDF("id", "v"), "id")
    // simulate the crash window: live dir renamed aside, promotion never ran
    val base = new java.io.File(s"$tmp/Cr-1/nodes/N")
    val old = new java.io.File(s"$tmp/Cr-1/nodes/N._old")
    assert(base.renameTo(old))
    assert(!base.exists())
    // next run restores ._old and merges on top of it — nothing lost
    GraphBuilder.upsertStagedNodes(spark, tmp, meta, "N",
      Seq((2L, "bob")).toDF("id", "v"), "id")
    val staged = spark.read.parquet(s"$tmp/Cr-1/nodes/N").orderBy("id")
      .collect()
    assert(staged.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "alice", 2L -> "bob"))
    assert(!old.exists() && !new java.io.File(s"$tmp/Cr-1/nodes/N._tmp").exists())
  }

  test("replaceStagedTable: loss-proof swap for derived (relationship) tables") {
    val tmp = Files.createTempDirectory("graft-replace").toString
    val base = s"$tmp/rels/KNOWS"
    GraphBuilder.replaceStagedTable(spark, base,
      Seq((1L, 2L)).toDF("src", "dst"))
    assert(spark.read.parquet(base).count() == 1)
    // rebuild replaces wholesale (derived data — no merge)
    GraphBuilder.replaceStagedTable(spark, base,
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))
    assert(spark.read.parquet(base).count() == 3)
    assert(!new java.io.File(s"$base._tmp").exists())
    assert(!new java.io.File(s"$base._old").exists())
    // crash window (live dir set aside, promotion never ran) self-heals:
    // the previous edges are still recoverable, never destroyed
    assert(new java.io.File(base).renameTo(new java.io.File(s"$base._old")))
    GraphBuilder.replaceStagedTable(spark, base,
      Seq((7L, 8L)).toDF("src", "dst"))
    val rows = spark.read.parquet(base).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq(7L -> 8L))
    assert(!new java.io.File(s"$base._old").exists())
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
