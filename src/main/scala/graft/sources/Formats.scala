package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** File-format source/sink round trips.
  *
  * The reference ingests CSV files (real_data_etl.py:150-194
  * `process_csv_files`) and JSON payloads (S3 extracts,
  * database_etl.py:173-218) by hand; here both are first-class
  * Spark sources with explicit schemas — schema-on-read, predicate
  * pushdown where the format supports it, and partitioned output
  * on write.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.option("header", "true").schema(ddl).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(path)

  /** Partitioned parquet sink (the lake layout: one directory per
    * partition key value, enabling partition pruning on read).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
}
