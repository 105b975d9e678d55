package graft

import org.apache.spark.sql.functions._

import graft.operators.{MediaFile, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeFeatures is deterministic and schema-typed") {
    val payload = "0123456789abcdef-rest-of-payload".getBytes("UTF-8")
    val ds = Seq(MediaFile(7L, payload, "image/png")).toDS()
    val f = Multimodal.decodeFeatures(ds).head()
    assert(f.media_id == 7L && f.mime == "image/png")
    assert(f.n_bytes == payload.length)
    assert(f.width == 64 + payload.length % 64)
    assert(f.height == 64 + (payload.length / 2) % 64)
    val expectedBrightness =
      (payload.take(16).map(_ & 0xff).sum % 256) / 255.0
    assert(math.abs(f.brightness - expectedBrightness) < 1e-12)
  }

  test("fromDocuments produces binary payload + typed metadata struct") {
    val docs = Seq((1L, "hello world", "en", "srcA", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Multimodal.fromDocuments(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val row = m.select(col("media_id"), col("meta.mime"),
      length(col("payload"))).head()
    assert(row.getLong(0) == 1L)
    assert(row.getString(1) == "text/plain")
    assert(row.getInt(2) == 11)
  }

  test("sampleFrames emits deterministic frame rows per payload") {
    val docs = Seq((1L, "abcdef", "en", "s", 6L)) // 6 bytes → 6%3+1 = 1 frame
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.sampleFrames(Multimodal.fromDocuments(docs))
      .collect()
    assert(frames.length == 1)
    val r = frames.head
    assert(r.getAs[Int]("frame_idx") == 0)
    assert(r.getAs[Int]("frame_signature") == (6 * 31 + 0) % 997)
  }
}
