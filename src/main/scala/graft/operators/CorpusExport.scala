package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus export — the final step of a curation pipeline: ship the cleaned
  * dataset as SORTED, SIZE-BOUNDED parquet shards plus a manifest.
  *
  * Why not a plain `df.write.parquet`: training jobs stream shards in
  * order, resume mid-corpus, and assign shards to workers — that needs (a)
  * each file to hold a contiguous key range (range partitioning, not hash),
  * (b) rows sorted inside each file (seekable, and parquet min/max stats
  * actually prune), and (c) a record cap so no shard outgrows a worker's
  * memory. All three are declarative here; the sort+shuffle is the same
  * single exchange any global sort pays.
  */
object CorpusExport {

  /** The sharding contract all exports share: range-partition on the sort
    * key, sort within each file, cap records per file, overwrite. One
    * builder so the parquet/jsonl/Z-order sinks cannot drift apart. */
  private def shardedWriter(df: DataFrame, sortCol: String,
      numShards: Int, maxRecordsPerFile: Long) = {
    require(numShards >= 1 && maxRecordsPerFile >= 1)
    df.repartitionByRange(numShards, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
  }

  /** Range-sharded, within-file-sorted parquet export. `numShards` sets
    * write parallelism; `maxRecordsPerFile` splits oversized ranges into
    * part files without breaking the global order. */
  def writeSharded(df: DataFrame, path: String, sortCol: String,
      numShards: Int, maxRecordsPerFile: Long): Unit =
    shardedWriter(df, sortCol, numShards, maxRecordsPerFile).parquet(path)

  /** Range-sharded, within-file-sorted JSON-Lines export — the same
    * ordering/sharding contract as [[writeSharded]] in the format most
    * training loaders stream natively (one JSON object per line, gzip per
    * part file so shards stay independently decompressible). Use parquet
    * for analytical re-reads; jsonl is the hand-off format. */
  def writeShardedJsonl(df: DataFrame, path: String, sortCol: String,
      numShards: Int, maxRecordsPerFile: Long,
      compress: Boolean = true): Unit = {
    val w = shardedWriter(df, sortCol, numShards, maxRecordsPerFile)
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  /** Z-ordered export: cluster files along the Morton curve of TWO key
    * columns, so parquet min/max footer stats prune files for predicates
    * on EITHER column — a plain sort only prunes its leading column.
    * Both columns are cast to long (non-negative domain assumed; shift
    * signed domains first). */
  def writeZOrdered(df: DataFrame, path: String,
      colA: String, colB: String,
      numShards: Int, maxRecordsPerFile: Long): Unit = {
    require(numShards >= 1 && maxRecordsPerFile >= 1)
    import org.apache.spark.sql.graftshim.ColumnShim
    val z = ColumnShim.column(graft.functions.Morton2(
      ColumnShim.expression(col(colA).cast("long")),
      ColumnShim.expression(col(colB).cast("long"))))
    val zCol = "_graft_z"
    df.withColumn(zCol, z)
      .repartitionByRange(numShards, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol) // projection after the sort — row order survives
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }

  /** Per-file manifest of an exported corpus: rows, key min/max per part
    * file — the index a training loader consumes to plan shard assignment
    * (and the audit that ranges are contiguous/disjoint). Pure metadata
    * aggregation: one scan of the key column only (for parquet, column
    * pruning drops the payload; for `format = "json"` — the
    * [[writeShardedJsonl]] hand-off — the files are read through, there
    * being no columnar footer). */
  def shardManifest(spark: SparkSession, path: String,
      sortCol: String, format: String = "parquet"): DataFrame =
    spark.read.format(format).load(path)
      .select(col(sortCol), input_file_name().as("file"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        min(col(sortCol)).as("key_min"),
        max(col(sortCol)).as("key_max"))
      .orderBy("key_min")
}
