package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.config.SourceConf

/** Source connectivity layer.
  *
  * The reference only ever implemented MySQL (sql_io.py:4-13; non-mysql
  * sources raise NotImplementedError at graph_db_builder.py:193-194,
  * :320-321) while declaring flat/tabular-file sources as a TODO
  * (graph_db_builder.py:14). We implement the declared surface: parquet /
  * csv / json flat files plus a JDBC branch mirroring the MySQL path
  * (S1, unused in this offline environment).
  *
  * Schema discovery (the reference's `SELECT * FROM t LIMIT 1` peek,
  * graph_db_builder.py:157/:173-178 — S2) is free here: parquet footers and
  * JDBC metadata resolve the schema without scanning data.
  */
object SourceReader {

  /** S2/S3: read one table of a source as a DataFrame (lazy scan). */
  def readTable(spark: SparkSession, src: SourceConf, table: String): DataFrame =
    src.sourceType.toLowerCase match {
      case "parquet" =>
        spark.read.parquet(s"${src.path}/$table.parquet")
      case "csv" =>
        spark.read.options(src.options)
          .option("header", src.options.getOrElse("header", "true"))
          .option("inferSchema", src.options.getOrElse("inferSchema", "true"))
          .csv(s"${src.path}/$table.csv")
      case "json" =>
        spark.read.options(src.options).json(s"${src.path}/$table.json")
      case "orc" =>
        // Columnar like parquet: predicate pushdown + column pruning work
        // the same way (ORC stripe/row-group statistics).
        spark.read.options(src.options).orc(s"${src.path}/$table.orc")
      case "jdbc" | "mysql" =>
        // Reference S1 (sql_io.py:4-13). Spark resolves the schema from JDBC
        // metadata without a data fetch; partitioned reads need the usual
        // partitionColumn/lowerBound/upperBound options at real scale.
        spark.read.format("jdbc")
          .options(src.options)
          .option("url", src.path)
          .option("dbtable", table)
          .load()
      case other =>
        throw new UnsupportedOperationException(
          s"source type '$other' not supported " +
            "(parquet | csv | json | orc | jdbc)")
    }

  /** M1-equivalent: a table's schema without reading data. */
  def peekSchema(spark: SparkSession, src: SourceConf, table: String): StructType =
    readTable(spark, src, table).schema
}
