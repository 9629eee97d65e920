package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is fully materialized through the `noop` sink — a
  * `count()` would let Catalyst prune/skip most of the work for
  * projection-only queries (parquet row-group counts), understating
  * real cost. A small warmup query first absorbs one-time JVM/codegen/
  * Hadoop-client init so per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Engine.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup with a known-cheap query: parquet footer + codegen +
    // shuffle machinery init (an arbitrary Map.head could pick an
    // expensive self-join and run it twice)
    try materialize(SparkEntry.queries("q02_filter_pushdown")(spark, sfDir))
    catch { case _: Throwable => () }

    // dev-loop filter: SPARK_GRAFT_ONLY=q32_lang_id,q63_fuzzy_join
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => only.contains(k) }

    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try materialize(fn(spark, sfDir))
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // millisecond precision keeps the whole line under ~2 KB for 75+
    // queries — the driver captures a bounded stdout tail and a line
    // whose start falls outside it is unparseable (full-precision
    // doubles overflowed the window in round 2)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
