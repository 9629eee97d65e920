package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — SURVEY.md §2 block G.
  *
  * Pattern: media payloads travel as opaque `binary` columns with a
  * typed metadata struct alongside; decode / feature-extraction runs
  * batched per partition so a real codec (image/audio library) can
  * amortize model/codec init per partition, not per row.
  *
  * The decode step itself is a STUB — the container has no media
  * libraries — implemented as a deterministic byte-level feature
  * extractor with the same shape a real decoder would have (see
  * [[MediaDecoder.decodeBatch]]). The Spark-side plumbing (schema,
  * binary payloads, partition batching, feature output) is real.
  */
object Multimodal {

  /** A decoded media record: id + fixed-width feature vector. */
  final case class MediaFeatures(
      doc_id: Long, modality: String, n_bytes: Long,
      features: Array[Double])

  /** STUB decoder — stands in for the image/audio codec. Deterministic
    * byte statistics shaped like a tiny feature embedding. A real
    * deployment replaces ONLY this function (e.g. JNI to a codec or a
    * batched model call); the pipeline around it is unchanged.
    */
  object MediaDecoder {
    val FeatureDim = 8

    def decodeBatch(rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaFeatures] = {
      // per-partition "codec init" would happen here, once
      rows.map { case (id, modality, payload) =>
        val n = payload.length
        val hist = new Array[Long](256)
        payload.foreach(b => hist(b & 0xFF) += 1)
        val nz = hist.count(_ > 0).toDouble
        val mean = if (n > 0) payload.map(b => (b & 0xFF).toLong).sum.toDouble / n else 0.0
        val features = Array[Double](
          n.toDouble, nz, mean,
          hist.max.toDouble,
          if (n > 0) hist(32).toDouble / n else 0.0,      // space density
          if (n > 0) hist('e'.toInt).toDouble / n else 0.0,
          if (nz > 0) n / nz else 0.0,
          (id % 97).toDouble)                              // deterministic salt
        MediaFeatures(id, modality, n.toLong, features)
      }
    }
  }

  /** Wrap documents as a multimodal table: payload as `binary` +
    * metadata struct — the schema a mixed image/audio/text corpus
    * would use (payload column stays opaque; scans prune it unless
    * the query touches it).
    */
  def asMultimodal(documents: DataFrame): DataFrame =
    documents.select(
      $"doc_id",
      lit("text").as("modality"),
      encode($"text", "UTF-8").as("payload"),
      struct($"source", $"n_chars", $"lang").as("meta"))

  /** Batched per-partition decode → feature table. `mapPartitions`
    * keeps the codec's per-partition init cost amortized; upstream
    * repartition controls batch size on a real cluster.
    */
  def decodeFeatures(multimodal: DataFrame): Dataset[MediaFeatures] = {
    val spark = multimodal.sparkSession
    import spark.implicits.{newProductEncoder, newProductArrayEncoder}
    multimodal
      .select("doc_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions(MediaDecoder.decodeBatch)
  }

  /** End-to-end: wrap → decode → per-modality feature aggregation
    * (feature means via exact integer sums of the byte statistics).
    */
  def featurePipeline(documents: DataFrame): DataFrame =
    decodeFeatures(asMultimodal(documents))
      .select($"doc_id", $"modality", $"n_bytes",
        element_at($"features", 1).as("f_len"),
        element_at($"features", 2).as("f_distinct_bytes"),
        element_at($"features", 3).as("f_mean_byte"))
      .orderBy($"doc_id")
}
