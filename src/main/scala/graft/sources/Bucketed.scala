package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout for co-located joins.
  *
  * At 100 TB the dominant cost of a repeated fact-fact join is the
  * shuffle; bucketing both tables on the join key at write time makes
  * every subsequent join shuffle-free (Spark reads matching buckets
  * pairwise). This is the Spark-native analog of the reference's
  * "partitioning strategies" optimization note (README.md:333).
  */
object Bucketed {

  /** Write a table bucketed by `key` into the session catalog.
    *
    * r20 (guide §6): rows are hash-repartitioned on the bucket key
    * BEFORE the write — Spark's bucket id is the same Murmur3 pmod
    * family as `repartition(n, col)`, so each write task holds exactly
    * one bucket: the write runs `buckets`-wide (it ran 1-3 tasks off
    * the raw scan) and emits ONE file per bucket instead of
    * (tasks × buckets) small files. This is the standard pre-bucketed-
    * write distribution step at any scale; the shuffle it adds carries
    * only the projected join columns.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.repartition(buckets, col(key))
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Drop a catalog table AND its leftover warehouse directory.
    * Sessions share a warehouse dir across JVM runs while the
    * in-memory catalog does not survive them, so `saveAsTable`
    * overwrite can meet an orphaned path it refuses to replace.
    */
  def reset(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // the conf may be a plain path, file:/x, or file:///x (possibly
    // percent-encoded) — resolve through URI so the delete target is
    // the real directory in every form, not a stripPrefix guess
    val whConf = spark.conf.get("spark.sql.warehouse.dir")
    val wh =
      try {
        val uri = new java.net.URI(whConf)
        if (uri.getScheme == "file" && uri.getPath != null) uri.getPath
        else if (uri.getScheme == null) whConf
        else sys.error(s"non-local warehouse dir not supported here: $whConf")
      } catch {
        // a plain local path with spaces or other URI-illegal chars
        // isn't a URI at all — use it verbatim. But a value that
        // CLAIMS a scheme (file:..., s3a://...) and still fails to
        // parse must fail loudly: falling back to "treat as local
        // path" would silently skip the stale-table delete this
        // method exists for.
        case e: java.net.URISyntaxException
            if !whConf.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*") => whConf
      }
    val p = java.nio.file.Paths.get(wh, table)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists)
    }
  }

  /** Declared bucketed fact⋈fact join (q65): orders ⋈ lineitem
    * co-bucketed on the order key, revenue per order priority.
    *
    * Both fact tables are written bucketed+sorted on the join key, so
    * the join itself needs NO exchange — Spark pairs matching buckets
    * (SortMergeJoin over pre-sorted bucket files). At 100 TB this is
    * the difference between re-shuffling two fact tables per join and
    * paying the layout cost once at ingest; the only shuffle left here
    * is the 5-row priority rollup. The no-Exchange property is
    * asserted in ScaleTechniquesSpec.
    */
  def bucketedOrderRevenue(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact.{dec, dsumExpr}
    Seq("graft_orders_b", "graft_lineitem_b").foreach(reset(spark, _))
    writeBucketed(Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority")),
      "graft_orders_b", "o_orderkey")
    writeBucketed(Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      "graft_lineitem_b", "l_orderkey")
    val o = read(spark, "graft_orders_b")
    val l = read(spark, "graft_lineitem_b")
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        dsumExpr(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }
}
