package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** X5 multimodal-column plumbing: binary payloads + typed metadata, batched
  * per-partition feature extraction, frame sampling. The codec is a stub;
  * the schema/partitioning/batch shape under test is the real pipeline. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "hello world"),
    (2L, ""),
    (3L, "binary-ish payload ")).toDF("id", "s")
    .select(col("id"), encode(col("s"), "UTF-8").as("payload"))

  test("withMediaMetadata attaches typed struct") {
    val out = Multimodal.withMediaMetadata(media, "payload", "text/plain")
    assert(out.schema("media_meta").dataType.typeName == "struct")
    val r = out.filter(col("id") === 1).select(
      col("media_meta.media_type"), col("media_meta.n_bytes")).head()
    assert(r.getString(0) == "text/plain")
    assert(r.getLong(1) == 11L)
  }

  test("extractFeatures: batched mapPartitions keeps schema + adds vector") {
    val out = Multimodal.extractFeatures(media, "payload")
    assert(out.columns.toSeq == Seq("id", "payload", "features"))
    val feats = out.orderBy("id").select("features")
      .as[Seq[Float]].collect()
    assert(feats.forall(_.length == Multimodal.FeatureDim))
    assert(feats(1).forall(_ == 0f)) // empty payload -> zero features
    // deterministic: same payload, same features
    val again = Multimodal.extractFeatures(media, "payload")
      .orderBy("id").select("features").as[Seq[Float]].collect()
    assert(feats.toSeq == again.toSeq)
  }

  test("metadata-only queries never read payload pages (column pruning)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mm").toString
    Multimodal.withMediaMetadata(media, "payload", "application/octet-stream")
      .write.parquet(s"$tmp/media")
    val metaOnly = spark.read.parquet(s"$tmp/media")
      .select(col("id"), col("media_meta.n_bytes"))
      .filter(col("media_meta.n_bytes") > 0)
    val scan = metaOnly.queryExecution.executedPlan.toString
    // the parquet ReadSchema must not include the payload column — Parquet
    // stores it in separate column chunks, so pruning means payload bytes
    // are never read off disk for metadata queries
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(scan)
    assert(!readSchema.contains("payload"), readSchema)
    assert(metaOnly.count() == 2) // empty payload filtered
  }

  test("sampleFrames explodes payload into indexed frames") {
    val vid = Seq((1L, Array.fill[Byte](100)(7))).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(vid, "payload", frameSize = 10,
      stride = 2).select("frame_idx").as[Int].collect()
    assert(frames.toSeq == Seq(0, 2, 4, 6, 8))
  }
}
