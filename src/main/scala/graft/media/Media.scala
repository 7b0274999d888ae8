package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.pages.PageGen

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * BINARY columns with typed metadata; decode / feature-extraction runs as
  * batched per-partition transforms.
  *
  * The decode step itself is a STUB — image/audio codecs are not available
  * in this container — implemented as a deterministic pseudo-header parse
  * so the Spark-side contract (schema, partitioning, batch shape,
  * per-element purity) is real and tested. Swapping in a real codec
  * changes ONLY the body of `decodeOne` / `featuresOf`.
  */
case class MediaItem(media_id: Long, kind: String, payload: Array[Byte])
case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                     channels: Int, n_bytes: Long)

object Media {
  private val Kinds = Array("image", "audio", "video")

  /** Deterministic synthetic payload table (media_id, kind, payload):
    * a 12-byte pseudo-header (w, h, c as big-endian ints) + content bytes,
    * all a pure function of (seed, id). */
  def payloads(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Kinds((PageGen.mix(seed ^ i) >>> 8).toInt.abs % Kinds.length)
      val w = 16 + (PageGen.mix(seed ^ (i * 3 + 1)) & 0xFF).toInt
      val h = 16 + (PageGen.mix(seed ^ (i * 3 + 2)) & 0xFF).toInt
      val c = 1 + (PageGen.mix(seed ^ (i * 3 + 3)) & 0x3).toInt
      val body = new Array[Byte](64)
      var j = 0
      while (j < body.length) { body(j) = (PageGen.mix(seed ^ (i * 131 + j)) & 0xFF).toByte; j += 1 }
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      bb.putInt(w).putInt(h).putInt(c).put(body)
      MediaItem(i, kind, bb.array())
    }
  }

  /** STUB decode: parses the pseudo-header. A real implementation would
    * hand `payload` to a codec here; everything around it stays. */
  private def decodeOne(item: MediaItem): MediaMeta = {
    val bb = java.nio.ByteBuffer.wrap(item.payload)
    MediaMeta(item.media_id, item.kind, bb.getInt, bb.getInt, bb.getInt,
      item.payload.length.toLong)
  }

  /** Batched decode: mapPartitions so a real codec could amortize per-batch
    * init (model load, decoder context) exactly like a Pandas-UDF batch. */
  def decodeMeta(items: Dataset[MediaItem]): Dataset[MediaMeta] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it => it.map(decodeOne) }
  }

  /** STUB feature extraction: fixed-dim float vector per item from a
    * rolling hash of the payload — stands in for an embedding model; the
    * (media_id, features array<float>) contract is the real one. */
  def features(items: Dataset[MediaItem], dim: Int = 16): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val f = new Array[Float](dim)
        var i = 0
        while (i < m.payload.length) {
          f(i % dim) += (m.payload(i) & 0xFF) / 255.0f
          i += 1
        }
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
