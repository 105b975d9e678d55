package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A media blob: how image/audio/video travel through the engine —
  * an opaque binary column plus typed metadata.
  */
final case class MediaFile(media_id: Long, payload: Array[Byte],
                           mime: String)

/** Features extracted from a decoded media blob. */
final case class MediaFeatures(media_id: Long, mime: String,
                               n_bytes: Int, width: Int, height: Int,
                               brightness: Double)

/** Multimodal column plumbing (SURVEY.md §2.11): image/audio/video as
  * opaque `binary` columns with typed metadata. The Spark-side shape —
  * schema, partition-level batch iteration, feature schema — is real
  * and tested; the codec itself is STUBBED (no image/audio libraries in
  * this container) with a deterministic fake so tests are reproducible.
  *
  * Scale posture: decode runs per partition over an iterator
  * (`mapPartitions`) — a real decoder would amortize codec init across
  * the partition's rows, and no row or batch ever reaches the driver.
  */
object Multimodal {

  /** Manufacture a binary-media table from the documents table (the
    * container ships no real media): payload = UTF-8 bytes, plus a
    * metadata struct. At 100 TB the payload column stays columnar
    * parquet binary and is pruned unless referenced.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(lit("text/plain").as("mime"), lit("synthetic").as("origin"))
        .as("meta"))

  /** STUB decoder: a real implementation would decode the image/audio
    * codec here (e.g. via a JNI/javax.imageio call per blob). The fake
    * derives deterministic pseudo-features from the raw bytes so the
    * pipeline shape — partition-iterator in, typed features out — is
    * fully exercised and testable.
    */
  def decodeFeatures(files: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      // per-partition "codec init" would happen here, once
      it.map { m =>
        val n = m.payload.length
        val headSum = m.payload.take(16).map(_ & 0xff).sum
        MediaFeatures(
          media_id = m.media_id,
          mime = m.mime,
          n_bytes = n,
          width = 64 + n % 64,
          height = 64 + (n / 2) % 64,
          brightness = (headSum % 256) / 255.0)
      }
    }
  }

  /** Frame sampling stub: one row per sampled "frame", frame count
    * derived deterministically from payload size (real impl: codec
    * frame index). Exercises the generator/explode path over binary
    * columns — SQL-expressible, so oracle-checked.
    */
  def sampleFrames(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")))
      .select(col("media_id"), col("meta.mime").as("mime"), col("n_bytes"),
        explode(sequence(lit(0), pmod(col("n_bytes"), lit(3))))
          .as("frame_idx"))
      .withColumn("frame_signature",
        pmod(col("n_bytes") * 31 + col("frame_idx"), lit(997)))
}
