package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Loaders for the engine's canonical tables (one parquet per table).
  *
  * Mirrors the reference stack's source surface: the Druid datasources
  * (`druid-*-datasource.json`) define typed event tables keyed by a
  * timestamp column; here every table is a parquet directory so scans
  * get predicate pushdown + column pruning from Catalyst for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every declared query loads through here — the one choke point
    // where the session is guaranteed in hand, so the native-function
    // registry is ensured for the text kernels whose operators take
    // Column-level token arrays (no session handle of their own)
    graft.functions.Registry.ensure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so pure SQL text runs
    * against the engine — the surface a BI tool (the reference's
    * Superset, README.md:154-166) connects to.
    */
  def registerViews(s: SparkSession, d: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(s, d) else load(s, d, n)
      df.createOrReplaceTempView(n)
    }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")

  /** `events.parquet` has shipped with two physical types for `ts`:
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read as long via `nanosAsLong` and truncate ns→us, the
    * same truncation DuckDB applies on scan) and plain
    * TIMESTAMP(MICROS) (reads as a normal timestamp, no conversion).
    * Sniff the loaded dtype and normalize either way, so the engine
    * survives a regenerated dataset without a code change.
    *
    * SESSION-WIDE SIDE EFFECT, by design: `nanosAsLong` is flipped on
    * the shared session and left on, so any later parquet read of a
    * nanos-timestamp column in this session surfaces a long, not a
    * timestamp. It cannot be scoped: Spark consults the session conf
    * again at task time (per-read options don't reach the footer
    * converter — verified empirically), so a save/restore around the
    * lazy read breaks the scan at execution. Graft-canonical tables are
    * unaffected (`events` is the only possibly-nanos table, always
    * read through here).
    */
  private def eventsRaw(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(eventsRaw(s, d))

  /** Normalize `ts` to session-TZ TimestampType, the one dtype every
    * downstream consumer (unix_micros, withWatermark, window()) accepts:
    *   - LONG (nanos era, surfaced by `nanosAsLong`) → truncate ns→us;
    *   - TIMESTAMP_NTZ (micros era with isAdjustedToUTC=false) → cast;
    *     the session TZ is UTC, so the instant is bit-identical and
    *     oracle hashes are unchanged;
    *   - TIMESTAMP → as is.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", df("ts").cast("timestamp"))
      case _ => df
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
