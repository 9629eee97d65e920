package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins.
  *
  * At 100 TB the dominant cost of a repeated fact-fact join is the
  * shuffle; bucketing both tables on the join key at write time makes
  * every subsequent join shuffle-free (Spark reads matching buckets
  * pairwise). This is the Spark-native analog of the reference's
  * "partitioning strategies" optimization note (README.md:333).
  */
object Bucketed {

  /** Write a table bucketed by `key` into the session catalog. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
