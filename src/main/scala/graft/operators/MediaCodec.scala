package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal pipeline: binary PPM (P6)
  * images and PCM WAV (RIFF) audio — real encode/decode with header
  * validation, no external libraries (this container ships none; both
  * formats are fully specified byte layouts, so a dependency would buy
  * nothing).
  *
  * These give the multimodal operators a GENUINE codec path: headers
  * are parsed, dimensions come from the file (not from heuristics),
  * and corrupt payloads are rejected with a reason instead of decoding
  * to garbage. Compressed formats (JPEG/MP3/H.264) remain out of
  * scope, stubbed in [[Multimodal.decodeFeatures]].
  */
object MediaCodec {

  final case class PpmImage(width: Int, height: Int, pixels: Array[Byte])
  final case class WavAudio(sampleRate: Int, samples: Array[Short])

  /** Binary PPM (P6): `P6\n<w> <h>\n<maxval>\n<raw RGB bytes>`. */
  def encodePpm(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"P6 needs w*h*3 bytes, got ${pixels.length} for ${width}x$height")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Real P6 parser: magic check, `#` comments, whitespace-separated
    * header ints, maxval 255, exact payload length — anything else is
    * a `Left(reason)`, never a garbage decode.
    */
  def decodePpm(bytes: Array[Byte]): Either[String, PpmImage] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
      return Left("not a P6 ppm (bad magic)")
    var i = 2
    def skipSpaceAndComments(): Unit = {
      var going = true
      while (going && i < bytes.length) {
        val c = bytes(i)
        if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
        else if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else going = false
      }
    }
    def readInt(): Either[String, Int] = {
      skipSpaceAndComments()
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0')
        if (v > Int.MaxValue) return Left("header int overflow")
        i += 1
      }
      if (i == start) Left(s"expected header int at offset $start") else Right(v.toInt)
    }
    for {
      w <- readInt()
      h <- readInt()
      maxval <- readInt()
      _ <- if (maxval != 255) Left(s"unsupported maxval $maxval") else Right(())
      _ <- if (i >= bytes.length) Left("truncated after header")
           // exactly ONE whitespace byte before raster — and it must BE
           // whitespace ('P6\n2 2\n255X…' with an exact-length payload
           // must not decode)
           else bytes(i) match {
             case ' ' | '\n' | '\r' | '\t' => Right { i += 1 }
             case c => Left(s"expected whitespace after maxval, got byte $c")
           }
      _ <- if (w <= 0 || h <= 0) Left(s"bad dimensions ${w}x$h") else Right(())
      // Long arithmetic: crafted dimensions like 65536x65536 overflow
      // Int (w*h*3 wraps to 0) and would accept an empty raster
      _ <- if ((bytes.length - i).toLong != w.toLong * h.toLong * 3L)
             Left(s"raster length ${bytes.length - i} != ${w.toLong * h * 3}")
           else Right(())
    } yield PpmImage(w, h, java.util.Arrays.copyOfRange(bytes, i, bytes.length))
  }

  /** Minimal canonical PCM WAV: RIFF/WAVE, one `fmt ` chunk (PCM,
    * mono, 16-bit little-endian), one `data` chunk.
    */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Real RIFF parser: walks chunks (tolerating extras like `LIST`),
    * validates the PCM/mono/16-bit `fmt `, extracts `data` samples.
    */
  def decodeWav(bytes: Array[Byte]): Either[String, WavAudio] = {
    if (bytes.length < 44) return Left("too short for a wav header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return Left("bad RIFF magic")
    buf.getInt // riff size (trusted length is the array itself)
    if (tag() != "WAVE") return Left("bad WAVE magic")
    var sampleRate = -1
    var ok = false
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = tag()
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return Left(s"bad chunk length $len in '$id'")
      id match {
        case "fmt " =>
          if (len < 16) return Left("fmt chunk too short")
          val fmtEnd = buf.position() + len
          val audioFormat = buf.getShort
          val channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          val bits = buf.getShort
          if (audioFormat != 1) return Left(s"not PCM (format $audioFormat)")
          if (channels != 1) return Left(s"not mono ($channels channels)")
          if (bits != 16) return Left(s"not 16-bit ($bits)")
          buf.position(fmtEnd)
          ok = true
        case "data" =>
          if (!ok) return Left("data chunk before fmt")
          if (len % 2 != 0) return Left("odd data length for 16-bit PCM")
          val out = new Array[Short](len / 2)
          var j = 0
          while (j < out.length) { out(j) = buf.getShort; j += 1 }
          samples = out
        case _ => // skip unknown chunk (word-aligned; the pad byte may
          // be absent when the chunk ends the file — clamp, don't throw)
          buf.position(math.min(buf.position() + len + (len & 1), buf.limit()))
      }
    }
    if (samples == null) Left("no data chunk")
    else Right(WavAudio(sampleRate, samples))
  }
}
