package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed staging for co-located joins — the 100 TB answer to "this join
  * shuffles both sides every time".
  *
  * Writing two tables bucketed by the same key into the same number of
  * buckets lets every later equi-join/aggregation on that key run with NO
  * exchange on either side (Spark matches `HashPartitioning(key, n)` from
  * the bucket spec). For a graph store that is repeatedly joined on node
  * ids — edge endpoint resolution, neighborhood expansion, property
  * lookups — this converts the dominant recurring shuffle into a one-time
  * write-side cost. Verified by `BucketingSpec`: the join plan over two
  * bucketed tables contains no Exchange.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (parquet). Bucketing requires
    * the table catalog — plain `.parquet(path)` cannot carry a bucket spec. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides along from the
    * catalog, enabling shuffle-free joins on the bucket column). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
