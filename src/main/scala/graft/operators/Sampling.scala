package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * All sampling here is *content-hash gated*, never RNG-gated: a row's
  * membership is a pure function of its key, so the same sample comes
  * out on every run, every cluster size, and after any retry — the same
  * property the q50 hash splitter relies on. (A `rand()`-based sample
  * changes under task retry and partitioning, which silently breaks
  * train/eval hygiene — the SPARK-23207 class of bug.)
  */
object Sampling {

  /** Per-stratum deterministic sample: keep a row iff the first 4 hex
    * chars of md5(salt ‖ key) fall below the stratum's threshold
    * (threshold = fraction × 0x10000, as a zero-padded hex string, so
    * the gate is a plain string compare that any engine reproduces).
    *
    * Scale: the gate is a narrow per-row filter fused into the scan —
    * no shuffle, no per-stratum pass; thresholds ride in a broadcast
    * map join. Down-weighting over-represented strata (e.g. capping
    * English web text) is exactly this operator with per-language
    * fractions.
    */
  def stratifiedSample(documents: DataFrame,
                       fractions: Map[String, Double],
                       salt: String = "smpl"): DataFrame = {
    val thresholds = fractions.toSeq.sortBy(_._1)
      .map { case (lang, f) =>
        require(f >= 0.0 && f <= 1.0, s"fraction out of range for $lang: $f")
        // "g" sorts above every hex digit, so f=1.0 keeps all rows (a
        // 5-char "10000" would lexicographically EXCLUDE everything)
        val t = math.round(f * 0x10000)
        (lang, if (t >= 0x10000) "g" else f"$t%04x")
      }
    val lookup = broadcast(
      documents.sparkSession.createDataFrame(thresholds)
        .toDF("lang", "threshold"))
    documents
      .withColumn("sample_key",
        substring(md5(concat(lit(salt), $"doc_id".cast("string"))), 1, 4))
      .join(lookup, Seq("lang"))
      .filter($"sample_key" < $"threshold")
      .select($"doc_id", $"lang", $"sample_key")
      .orderBy($"doc_id")
  }
}
