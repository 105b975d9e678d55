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

  /** REAL-codec media table: each document's UTF-8 bytes become the
    * RGB raster of an 8-pixel-wide binary PPM (P6) image, zero-padded
    * to fill the last row — the payload is a genuine encoded file
    * ([[MediaCodec.encodePpm]] writes the actual header+raster bytes),
    * so the decode side genuinely parses. Encoding runs per partition;
    * nothing reaches the driver.
    */
  def toPpmMedia(docs: DataFrame): Dataset[MediaFile] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val data = text.getBytes("UTF-8")
          val w = 8
          val h = data.length / (w * 3) + 1
          val pixels = java.util.Arrays.copyOf(data, w * h * 3)
          MediaFile(id, MediaCodec.encodePpm(w, h, pixels),
            "image/x-portable-pixmap")
        }
      }
  }

  /** REAL image decode: parses the P6 header ([[MediaCodec.decodePpm]]
    * — magic, comments, dimensions, maxval, exact raster length),
    * dimensions and brightness come from the DECODED image, not from
    * byte heuristics. Corrupt payloads are dropped (decodePpm's reason
    * is available to quarantine flows; MultimodalSpec covers the
    * rejection paths) instead of decoding to garbage. Partition
    * iterator in, typed features out — the same 100 TB shape as the
    * stub path, now with a working codec.
    */
  def decodeImageFeatures(files: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.flatMap { m =>
        MediaCodec.decodePpm(m.payload) match {
          case Right(img) =>
            var sum = 0L
            img.pixels.foreach(b => sum += (b & 0xff))
            Some(MediaFeatures(m.media_id, m.mime, m.payload.length,
              img.width, img.height,
              sum.toDouble / (img.pixels.length * 255.0)))
          case Left(_) => None
        }
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
