package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.pages.PageGen

/** Multimodal column plumbing: media payloads travel as opaque BINARY
  * columns with typed metadata; decode / feature-extraction runs as
  * batched per-partition transforms (the mapInPandas batch shape, in
  * Scala).
  *
  * The decode step is REAL binary parsing of three genuine container
  * formats, none of which needs a codec library:
  *  - PNG: 8-byte signature + IHDR chunk (width/height big-endian,
  *    bit depth, color type → channel count);
  *  - WAV: RIFF/WAVE header + fmt chunk (channels, sample rate, bits
  *    per sample, all little-endian);
  *  - BMP: BM magic + BITMAPINFOHEADER (width/height little-endian,
  *    bits per pixel).
  * The format is SNIFFED from magic bytes, never trusted from the kind
  * column. Only pixel/PCM *content* decoding (which would need codecs)
  * is out of scope — `features` stands in for the embedding model with a
  * deterministic rolling projection over the payload bytes.
  *
  * MediaMeta field semantics per format: png/bmp → (width, height,
  * channels); wav → (sampleRate, bitsPerSample, channels).
  */
case class MediaItem(media_id: Long, kind: String, payload: Array[Byte])
case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                     channels: Int, n_bytes: Long)

object Media {
  private val Kinds = Array("png", "wav", "bmp")

  private def be32(bb: java.nio.ByteBuffer, v: Int) = bb.putInt(v)

  /** Real PNG prefix: signature + IHDR (CRC left zero — not validated by
    * the parser, as with most fast-path header sniffers). */
  private def pngBytes(w: Int, h: Int, colorType: Int, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 25 + body.length)
    bb.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    be32(bb, 13); bb.put("IHDR".getBytes("US-ASCII"))
    be32(bb, w); be32(bb, h)
    bb.put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    be32(bb, 0) // CRC placeholder
    bb.put(body)
    bb.array()
  }

  private def wavBytes(channels: Int, sampleRate: Int, bits: Int,
                       body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + body.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * channels * bits / 8)
    bb.putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(body.length)
    bb.put(body)
    bb.array()
  }

  private def bmpBytes(w: Int, h: Int, bpp: Int, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + body.length)
    bb.putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h)
    bb.putShort(1.toShort).putShort(bpp.toShort)
    bb.putInt(0).putInt(body.length).putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.put(body)
    bb.array()
  }

  /** Deterministic synthetic payload table (media_id, kind, payload):
    * format-correct PNG/WAV/BMP bytes, a pure function of (seed, id). */
  def payloads(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Kinds((PageGen.mix(seed ^ i) >>> 8).toInt.abs % Kinds.length)
      val a = 16 + (PageGen.mix(seed ^ (i * 3 + 1)) & 0xFF).toInt
      val b = 16 + (PageGen.mix(seed ^ (i * 3 + 2)) & 0xFF).toInt
      val body = new Array[Byte](64)
      var j = 0
      while (j < body.length) { body(j) = (PageGen.mix(seed ^ (i * 131 + j)) & 0xFF).toByte; j += 1 }
      val payload = kind match {
        case "png" =>
          val colorType = Array(0, 2, 6)((PageGen.mix(seed ^ (i * 3 + 3)) & 0x3).toInt % 3)
          pngBytes(a, b, colorType, body)
        case "wav" =>
          val ch = 1 + (PageGen.mix(seed ^ (i * 3 + 3)) & 0x1).toInt
          wavBytes(ch, 8000 * (1 + (a & 0x3)), 16, body)
        case "bmp" =>
          val bpp = Array(8, 24, 32)((PageGen.mix(seed ^ (i * 3 + 3)) & 0x3).toInt % 3)
          bmpBytes(a, b, bpp, body)
      }
      MediaItem(i, kind, payload)
    }
  }

  /** Real header decode with format sniffing from magic bytes. */
  private[graft] def decodeOne(item: MediaItem): MediaMeta = {
    val p = item.payload
    val n = p.length.toLong
    def u16le(o: Int) = ((p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8))
    def i32le(o: Int) = (p(o) & 0xFF) | ((p(o + 1) & 0xFF) << 8) |
      ((p(o + 2) & 0xFF) << 16) | ((p(o + 3) & 0xFF) << 24)
    def i32be(o: Int) = ((p(o) & 0xFF) << 24) | ((p(o + 1) & 0xFF) << 16) |
      ((p(o + 2) & 0xFF) << 8) | (p(o + 3) & 0xFF)
    if (p.length >= 33 && (p(0) & 0xFF) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') {
      // PNG: IHDR at offset 16; color type at 25 → channels
      val channels = p(25).toInt match {
        case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => 0
      }
      MediaMeta(item.media_id, "png", i32be(16), i32be(20), channels, n)
    } else if (p.length >= 44 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F'
        && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') {
      // WAV: fmt chunk at 12 → channels@22, sampleRate@24, bits@34
      MediaMeta(item.media_id, "wav", i32le(24), u16le(34), u16le(22), n)
    } else if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') {
      // BMP: BITMAPINFOHEADER → width@18, height@22, bpp@28
      MediaMeta(item.media_id, "bmp", i32le(18), i32le(22),
        math.max(1, u16le(28) / 8), n)
    } else {
      MediaMeta(item.media_id, "unknown", 0, 0, 0, n)
    }
  }

  /** Batched decode: mapPartitions so per-batch init (a real pixel codec,
    * a model handle) amortizes exactly like a Pandas-UDF batch. */
  def decodeMeta(items: Dataset[MediaItem]): Dataset[MediaMeta] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it => it.map(decodeOne) }
  }

  /** Feature extraction stand-in: fixed-dim float vector per item from a
    * strided byte-histogram projection of the payload — a real embedding
    * model slots in here; the (media_id, features array<float>) contract is
    * the real one. Accumulation is INTEGER (sum of unsigned bytes per
    * dimension slot, exact) with a single double divide + float round at
    * the end, so the result is bit-identically re-derivable by the DuckDB
    * oracle from the raw payload bytes (gate query `media_features`). */
  def features(items: Dataset[MediaItem], dim: Int = 16): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val s = new Array[Long](dim)
        var i = 0
        while (i < m.payload.length) {
          s(i % dim) += (m.payload(i) & 0xFF)
          i += 1
        }
        val f = new Array[Float](dim)
        var d = 0
        while (d < dim) { f(d) = (s(d) / 255.0).toFloat; d += 1 }
        (m.media_id, f)
      }
    }.toDF("media_id", "features")
  }

  /** Per-kind size/shape stats over the decoded metadata. */
  def kindStats(meta: Dataset[MediaMeta]): DataFrame =
    meta.groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum("n_bytes").as("bytes"),
      avg(col("width") * col("height")).as("avg_pixels"))
}
