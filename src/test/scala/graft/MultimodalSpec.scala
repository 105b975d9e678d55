package graft

import org.apache.spark.sql.functions._

import graft.operators.{MediaCodec, MediaFile, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("PPM codec round-trips pixels and parses comments") {
    val pixels = Array.tabulate(2 * 3 * 3)(i => (i * 7 % 256).toByte)
    val enc = MediaCodec.encodePpm(2, 3, pixels)
    val dec = MediaCodec.decodePpm(enc)
    assert(dec.isRight)
    val img = dec.toOption.get
    assert(img.width == 2 && img.height == 3)
    assert(img.pixels.toSeq == pixels.toSeq)
    // header comments are part of the format; a real parser must skip them
    val withComment = ("P6\n# a comment\n2 3\n255\n").getBytes("US-ASCII") ++ pixels
    assert(MediaCodec.decodePpm(withComment).toOption.get.pixels.toSeq
      == pixels.toSeq)
  }

  test("PPM decode rejects corrupt payloads with a reason, never garbage") {
    val good = MediaCodec.encodePpm(2, 2, new Array[Byte](12))
    assert(MediaCodec.decodePpm("JFIF-not-ppm".getBytes).isLeft)
    assert(MediaCodec.decodePpm(good.dropRight(1)).isLeft)   // truncated raster
    assert(MediaCodec.decodePpm(
      "P6\n2 2\n65535\n".getBytes ++ new Array[Byte](12)).isLeft) // bad maxval
    assert(MediaCodec.decodePpm(Array[Byte]('P', '6')).isLeft)
    // the single byte after maxval must BE whitespace: an exact-length
    // payload with 'X' as the separator must not decode
    assert(MediaCodec.decodePpm(
      "P6\n2 2\n255X".getBytes ++ new Array[Byte](12)).isLeft)
  }

  test("WAV codec round-trips PCM samples and rejects non-PCM") {
    val samples = Array.tabulate(100)(i => (math.sin(i / 7.0) * 8000).toShort)
    val enc = MediaCodec.encodeWavPcm16(16000, samples)
    val dec = MediaCodec.decodeWav(enc)
    assert(dec.isRight)
    assert(dec.toOption.get.sampleRate == 16000)
    assert(dec.toOption.get.samples.toSeq == samples.toSeq)
    // flip the audio-format field to 2 (ADPCM) → must be rejected
    val bad = enc.clone(); bad(20) = 2
    assert(MediaCodec.decodeWav(bad).isLeft)
    assert(MediaCodec.decodeWav("RIFFxxxx".getBytes).isLeft)
  }

  test("real PPM pipeline: encode docs, decode features from parsed headers") {
    val docs = Seq((1L, "hello world", "en", "srcA", 11L),
                   (2L, "x" * 50, "en", "srcA", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.decodeImageFeatures(Multimodal.toPpmMedia(docs))
      .collect().map(f => f.media_id -> f).toMap
    // 11 bytes → h = 11/24 + 1 = 1; 50 bytes → h = 50/24 + 1 = 3
    assert(out(1L).width == 8 && out(1L).height == 1)
    assert(out(2L).width == 8 && out(2L).height == 3)
    val sum = "hello world".getBytes("UTF-8").map(_ & 0xff).sum
    assert(math.abs(out(1L).brightness - sum / (24.0 * 255.0)) < 1e-12)
    // corrupt payloads are dropped, not decoded to garbage
    val corrupt = Seq(MediaFile(9L, "not a ppm at all".getBytes, "image/x-portable-pixmap")).toDS()
    assert(Multimodal.decodeImageFeatures(corrupt).count() == 0)
  }

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
