package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Growth-curve probe: times a small set of structurally-heavy
  * queries at one scale point and prints one JSON line per query,
  * so consecutive runs against sf0.1 / /tmp/sf1 / /tmp/sf10 yield the
  * 1×/10×/100× growth table recorded in SURVEY §7.
  *
  * This is a measurement harness, not part of the library surface.
  * It differs from Bench deliberately:
  *   - it runs a handful of queries in ISOLATION (fresh measurements,
  *     no 100-query suite sharing the heap), because growth exponents
  *     are only meaningful on times that aren't inherited GC debt;
  *   - it records the result cardinality alongside the time, because
  *     the scaladoc claims under test are of the form "output-bound"
  *     / "layout-write-bound" / "rounds×join" — checking an exponent
  *     needs rows(SF) next to sec(SF).
  *
  * Output rows are captured with `df.observe(count)` — the
  * observation rides the noop write and is delivered through a
  * QueryExecutionListener, so counting costs no second run (the V2
  * noop write exec exposes no numOutputRows metric of its own).
  *
  * Env:
  *   SPARK_GRAFT_SF_DIR   scale point (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_ONLY     comma list of query names (default: the
  *                        heavy tier q24/q63/q65/q66)
  *   SPARK_GRAFT_CPUS     local[N] (default 32)
  *   SPARK_GRAFT_PASSES   timed passes per query, graded min (default
  *                        2; use 1 at the 100× point where a pass is
  *                        minutes long and the plan is cold anyway)
  *
  * Probe-only variants (not in SparkEntry.queries) are addressable
  * here so the 100× path of an operator can be measured against its
  * default: `q63_fuzzy_join_largedict` runs fuzzyPartNames with
  * largeDict=true (PassJoin dictionary stage, no broadcast).
  */
object ScaleProbe {

  private final class RowsListener extends QueryExecutionListener {
    @volatile var lastRows: Long = -1L
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.get("probe_rows")
        .foreach(r => lastRows = r.getLong(0))
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val defaultSet = Seq("q24_dedup_ngram_jaccard", "q63_fuzzy_join",
      "q65_bucketed_join", "q66_dup_clusters")
    val names = sys.env.get("SPARK_GRAFT_ONLY").filter(_.nonEmpty)
      .map(_.split(",").toSeq).getOrElse(defaultSet)

    val spark = Engine.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    val listener = new RowsListener
    spark.listenerManager.register(listener)

    val extras: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map(
        "q63_fuzzy_join_largedict" -> ((s, d) =>
          operators.Analytics.fuzzyPartNames(sources.Tables.part(s, d),
            largeDict = Some(true))),
        // plan-stats dictionary pick at this scale point, readable
        // off the probe line: rows=1 → PassJoin, rows=0 → broadcast.
        // With the per-copy name suffixes in gen_sf1.py the pick
        // flips NATURALLY between sf0.1 (64-name dictionary,
        // broadcast) and the 10×/100× points (640/6400 names across
        // 200k+ rows — the projection outgrows the 10 MB budget).
        "q63_fuzzy_dict_pick" -> ((s, d) => {
          val pick =
            operators.Analytics.fuzzyDictLarge(sources.Tables.part(s, d))
          s.range(1).filter(org.apache.spark.sql.functions.lit(pick))
            .toDF("large_dict")
        }),
        // ANN trainer cost curves (round 17): full-corpus Lloyd vs the
        // bounded hash-gated sample at the q126 operating point
        // (16 cells, 3 iters). Probed at sf0.1 / /tmp/sf1 / /tmp/sf10,
        // the pair shows full growing ∝ corpus × iters while sampled
        // pays one gate scan + iters rounds over ~4k rows.
        "ann_train_full" -> ((s, d) =>
          operators.Similarity.kmeansTrain(
            sources.Tables.embeddings(s, d), kCents = 16, iters = 3)),
        "ann_train_sampled" -> ((s, d) =>
          operators.Similarity.kmeansTrainSampled(
            sources.Tables.embeddings(s, d), kCents = 16, iters = 3)))
    val catalog = SparkEntry.queries ++ extras

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))

    for (name <- names) {
      catalog.get(name) match {
        case None =>
          println(s"""{"query":"$name","err":"unknown query"}""")
        case Some(fn) =>
          val times = (1 to passes).map { _ =>
            listener.lastRows = -1L
            val t0 = System.nanoTime()
            fn(spark, sfDir)
              .observe("probe_rows",
                org.apache.spark.sql.functions.count(
                  org.apache.spark.sql.functions.lit(1)))
              .write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            // listener delivery is async (internal bus, no public
            // flush); poll briefly so rows land before the next pass
            var waited = 0
            while (listener.lastRows < 0 && waited < 40) {
              Thread.sleep(50); waited += 1
            }
            sec
          }
          val line = s"""{"query":"$name","sf_dir":"$sfDir",""" +
            s""""sec":${fmt(times.min)},""" +
            s""""passes":[${times.map(fmt).mkString(",")}],""" +
            s""""rows":${listener.lastRows}}"""
          println(line)
      }
    }
    spark.stop()
  }
}
