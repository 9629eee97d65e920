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

  /** Frame sampling: split each payload into fixed-width frames and
    * keep every `stride`-th one — the video keyframe-sampling access
    * pattern (decode only the frames you keep). The frame generator is
    * a per-row explode over an index sequence, so payloads never
    * concatenate or shuffle whole; each sampled frame is fingerprinted.
    * Payloads here are the UTF-8 text stand-in (ASCII ⇒ char == byte),
    * so frame extraction is an exact substring either engine computes.
    */
  def frameSample(documents: DataFrame, frameChars: Int = 64,
                  stride: Int = 4): DataFrame =
    documents
      .filter(length($"text") > 0)
      .withColumn("n_frames",
        expr(s"CAST(((length(text) - 1) div $frameChars) + 1 AS INT)"))
      .select($"doc_id", $"text",
        explode(sequence(lit(0), $"n_frames" - 1, lit(stride))).as("frame_idx"))
      .withColumn("frame",
        expr(s"substring(text, frame_idx * $frameChars + 1, $frameChars)"))
      .select($"doc_id", $"frame_idx",
        length($"frame").as("frame_len"), md5($"frame").as("frame_md5"))
      .orderBy($"doc_id", $"frame_idx")

  /** Resize-to-fixed-resolution: 1-D average pooling of the payload's
    * byte signal into `buckets` cells (the image-resize analog on the
    * byte stand-in). Bucket assignment is pure integer math
    * ((pos·buckets) div len), sums are exact longs — results identical
    * on any partitioning, any engine. Output is long-form
    * (doc_id, bucket, mean) like the centroid tables.
    */
  def resizePool(documents: DataFrame, buckets: Int = 16): DataFrame =
    documents
      .filter(length($"text") > 0)
      .withColumn("len", length($"text"))
      .select($"doc_id", $"len", posexplode(split($"text", "")).as(Seq("pos", "c")))
      .filter($"c" =!= "")  // guard against a regex-split trailing empty
      .withColumn("bucket", expr(s"(pos * $buckets) div len"))
      .groupBy($"doc_id", $"bucket")
      .agg(sum(ascii($"c").cast("long")).as("sum_b"), count(lit(1)).as("n"))
      .withColumn("mean_b", $"sum_b" * 1.0 / $"n")
      .select($"doc_id", $"bucket", $"sum_b", $"n", $"mean_b")
      .orderBy($"doc_id", $"bucket")
}
