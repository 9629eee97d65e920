package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's tuned defaults.
  *
  * Local runs use `local[N]`; on a real cluster the same conf applies
  * except parallelism-related knobs scale with the executor count
  * (AQE coalesces shuffle partitions at runtime, so an over-provisioned
  * `spark.sql.shuffle.partitions` is corrected automatically).
  */
object Engine {

  /** Shared tuning applied to every session (batch, streaming, tests). */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // (r20 measured-and-rejected: lowering
      // spark.sql.adaptive.coalescePartitions.minPartitionSize to 256k
      // to give CPU-dense small shuffles more post-shuffle tasks was a
      // full-suite LOSS — geomean 1.045× slower, the extra per-task
      // fixed cost on byte-light aggregation stages outweighed the
      // pair-join parallelism it bought. The stock 1m floor stands.)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // InferFiltersFromGenerate re-inlines the full generator input
      // expression into a pushed-down Filter; for expensive array
      // builders (shingling) that doubles-to-quadruples per-row cost.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", math.max(cores, 4)).getOrCreate()
}
