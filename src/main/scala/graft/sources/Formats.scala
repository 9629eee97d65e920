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

  /** ORC round trip — the second columnar lake format (Hive-ecosystem
    * interchange). Same pushdown/pruning properties as parquet; the
    * spec asserts filters reach the ORC scan.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw-file ingestion for multimodal corpora: each matched file
    * becomes one row (path, modificationTime, length, content) with
    * the payload as an opaque `binary` column — the entry point that
    * feeds [[graft.operators.Multimodal]]'s decode/feature pipeline
    * from real image/audio files. Column pruning applies: a query on
    * metadata only never reads file contents.
    */
  def readBinaryFiles(spark: SparkSession, globPath: String): DataFrame =
    spark.read.format("binaryFile").load(globPath)

  /** JDBC extract — the reference's database ETL surface
    * (database_etl.py:20-129: `pd.read_sql` from PostgreSQL/MySQL,
    * single-connection, whole-table into driver memory). Spark-first
    * form: a partitioned parallel read — `partitionColumn` +
    * lower/upper bound + `numPartitions` split the table into range
    * predicates executed as one task each, and Catalyst pushes
    * projections and filters into the generated SELECT, so the
    * database ships only the needed rows/columns and no single
    * connection is the bottleneck.
    *
    * Production knobs go through `props` verbatim (`fetchsize` for
    * row-streaming drivers, `sessionInitStatement`, `queryTimeout`,
    * `driver` to pin the class). Tested against embedded Derby (the
    * JDBC engine already on Spark's classpath); server databases are
    * the same code path plus their driver jar.
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitioning: Option[(String, Long, Long, Int)] = None,
               props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withPart = partitioning.fold(base) { case (column, lo, hi, n) =>
      base.option("partitionColumn", column)
        .option("lowerBound", lo)
        .option("upperBound", hi)
        .option("numPartitions", n)
    }
    props.foldLeft(withPart) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** JDBC load (append): batched inserts per partition. `props` as in
    * [[readJdbc]] (`batchsize` is the write-side throughput knob).
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: Map[String, String] = Map.empty): Unit =
    props.foldLeft(
      df.write.mode(SaveMode.Append).format("jdbc")
        .option("url", url)
        .option("dbtable", table)) { case (w, (k, v)) => w.option(k, v) }
      .save()

  /** Object-store / external-connector adapter seam.
    *
    * S3-style stores are a *path-scheme* concern in Spark: the same
    * parquet/csv/json readers accept `s3a://bucket/prefix` once the
    * hadoop-aws jar and a credentials provider are on the cluster —
    * the reference's hand-rolled boto3 listing + per-object fetch
    * (database_etl.py:131-175) collapses into one `spark.read` over
    * the prefix, with listing, parallel range reads, and retries
    * handled by the filesystem connector. Document databases
    * (pymongo, database_etl.py:177-218) enter through the same
    * DataSource V2 surface: vendor format name + options (e.g.
    * `format="mongodb"`, `connection.uri`/`database`/`collection`),
    * and predicate/projection pushdown is the connector's contract.
    *
    * Both reduce to this passthrough. No vendor jar ships in the
    * sandbox, so the spec exercises the identical code path on the
    * local file scheme; a deployment adds the connector jar and
    * changes only `format`/`options`.
    */
  def readSource(spark: SparkSession, format: String,
                 options: Map[String, String],
                 path: Option[String] = None): DataFrame = {
    val r = spark.read.format(format).options(options)
    path.fold(r.load())(r.load)
  }
}
