package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

package object operators {
  /** `$"name"` Column shorthand without a SparkSession-bound
    * `spark.implicits._` import (operators are session-agnostic).
    */
  implicit class ColInterp(val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}

package operators {
  /** Scale-adaptive partition counts for EXPLICIT repartitions
    * (r20, guide §2 "make partitioning scale-adaptive").
    *
    * Context: an explicit `repartitionByRange(n, k)` is the only way
    * to keep a CPU-dense post-exchange stage parallel — AQE's
    * coalescing reasons in BYTES, so a stage whose rows are cheap to
    * ship but expensive to compute (regex scans, tokenizers, shingle
    * kernels over a few MB of text) gets coalesced down to 1-2 tasks
    * and runs serially. But a CONSTANT n would be tuned to either the
    * local box or the cluster (the thing the round brief forbids), so
    * the count is derived from the session and the input: at least
    * `defaultParallelism` (use every core — the local lever), growing
    * with the optimizer's size estimate so partitions approach the
    * advisory partition size at scale (the cluster lever, same target
    * AQE itself coalesces toward).
    */
  object Par {
    val MaxParts = 1 << 18

    /** Conditional fan-out for a CPU-dense per-row stage right after a
      * scan (guide §2.5 "input skew: one huge unsplittable file …
      * repartition immediately after the read"): when the input is too
      * small for the scan itself to parallelize (fewer splits than
      * cores — locally the single-row-group test files produce ONE
      * scan task, so every tokenizer/regex/shingle kernel ran
      * serially), hash-repartition on the row key so the heavy work
      * uses every core. When the scan is already at least
      * core-parallel (any at-scale corpus), this is the identity — no
      * extra corpus shuffle is ever introduced at scale.
      */
    def fan(df: DataFrame, key: Column): DataFrame = {
      val spark = df.sparkSession
      val p = spark.sparkContext.defaultParallelism
      val maxPart = spark.sessionState.conf.filesMaxPartitionBytes
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      // one fanned task per FanGranularity of (compressed) input, so
      // tasks stay big enough to amortize per-task fixed costs —
      // measured on the local corpus: 8-16 tasks beat both 1 (serial
      // kernel) and 32 (fixed costs dominate the sub-ms rows)
      val parts = (bytes / FanGranularity)
        .min(BigInt(p)).max(BigInt(1)).toInt
      if (bytes >= BigInt(maxPart) * p || parts <= 1) df
      else df.repartition(parts, key)
    }

    /** Compressed-input bytes per fanned task (~0.5 MB of raw text at
      * typical parquet text compression).
      */
    val FanGranularity: Long = 64L * 1024

    def parts(df: DataFrame): Int = {
      val spark = df.sparkSession
      val floor = spark.sparkContext.defaultParallelism
      val advisory = math.max(1L,
        spark.sessionState.conf.getConf(
          org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val byData =
        (bytes / advisory).min(BigInt(MaxParts)).max(BigInt(1)).toInt
      math.max(floor, byData)
    }
  }
}
