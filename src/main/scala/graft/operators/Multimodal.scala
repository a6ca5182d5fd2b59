package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (BASELINE.json north_star): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs batched per partition.
  *
  * The Spark-side plumbing here is real and tested — schema, partitioning,
  * batch shape, and the `mapPartitions` execution path are exactly what a
  * production pipeline uses. ONLY the codec kernel is a STUB (this container
  * has no image/audio libraries): [[stubDecodeFeatures]] derives a
  * deterministic fake feature vector from the bytes. Swapping in a real
  * decoder (e.g. TwelveMonkeys/JavaCV) touches one function.
  *
  * Scale notes: payloads never pass through a shuffle in this pipeline —
  * decode is a narrow per-partition map; metadata-only operations
  * (filtering by media_type/size) prune on the struct without touching the
  * bytes, and Parquet stores the binary column separately so a
  * metadata-only query never reads payload pages.
  */
object Multimodal {

  /** Media metadata carried beside every payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false)))

  val FeatureDim = 8

  /** Wrap a binary column with its typed metadata struct. */
  def withMediaMetadata(df: DataFrame, binCol: String, mediaType: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"),
      length(col(binCol)).cast("long").as("n_bytes"),
      sha2(col(binCol), 256).as("checksum")))

  /** STUB codec kernel: deterministic fake "features" from raw bytes —
    * byte-histogram moments standing in for a real decode→embed step.
    * Replace this function (only) with a real decoder to productionize. */
  def stubDecodeFeatures(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(FeatureDim)(0f)
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      out(i % FeatureDim) += (bytes(i) & 0xff) / 255f
      i += 1
    }
    var d = 0
    while (d < FeatureDim) { out(d) /= bytes.length; d += 1 }
    out
  }

  /** Batched per-partition feature extraction over a binary column — the
    * Scala analogue of a Pandas `mapInPandas` decode stage: one iterator
    * pass per partition, no per-row task overhead, payload stays off the
    * driver. Appends `features: array<float>`. */
  def extractFeatures(df: DataFrame, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        Row.fromSeq(row.toSeq :+ stubDecodeFeatures(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling stub for video-like payloads: split the payload into
    * `frameSize`-byte "frames" and keep every `stride`-th — the plumbing
    * (explode to one row per sampled frame, frame index column) is the real
    * shape; the byte-slicing stands in for actual frame decode. */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int, stride: Int): DataFrame = {
    val nFrames = floor(length(col(binCol)) / frameSize).cast("int")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
      .withColumn("frame_bytes",
        expr(s"substring($binCol, frame_idx * $frameSize + 1, $frameSize)"))
  }
}
