package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata/catalog surface — the engine-side analog of the
  * reference's OpenMetadata ingestion DAG
  * (app_airflow/app/dags/metadata_ingestion.py + app_openmetadata/
  * *-metadata-ingest.json): enumerate datasets, their schemas and
  * row counts as a queryable DataFrame.
  */
object CatalogMeta {

  /** One row per (table, column): name, type, plus table row counts.
    * Row counts come from parquet metadata (no full scan).
    */
  def describeTables(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    // events.parquet carries TIMESTAMP(NANOS); surface it as bigint
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rows = Tables.names.flatMap { t =>
      val df = Tables.load(spark, dir, t)
      val n = df.count()
      df.schema.fields.zipWithIndex.map { case (f, i) =>
        (t, i, f.name, f.dataType.simpleString, n)
      }
    }
    rows.toDF("table_name", "ordinal", "column_name", "data_type", "n_rows")
      .orderBy(col("table_name"), col("ordinal"))
  }
}
