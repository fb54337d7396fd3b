package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Fixtures.mix

/**
 * Multimodal column handling (driver instructions): image/audio/video as
 * opaque BINARY columns with typed metadata. The Spark-side plumbing —
 * schema, partition-preserving batch shape, typed Dataset boundaries — is
 * real and tested; the media KERNELS are STUBS (this container has no
 * image/audio codecs): each stub is a clearly-marked deterministic fake
 * keyed on the media bytes, so pipelines are testable end-to-end and the
 * kernel can be swapped for a real decoder without touching the plumbing.
 *
 * Batch shape: one typed mapPartitions per operator (the Scala analogue
 * of mapInPandas) — per-partition batching is what a real codec wants
 * (amortized init), and it is the ONLY place in the engine that drops out
 * of pure DataFrame expressions (allowed: genuine per-partition
 * imperative logic).
 */
object Multimodal {

  final case class Media(key: Long, mediaType: String, payload: Array[Byte])
  final case class ImageMeta(key: Long, width: Int, height: Int, format: String)
  final case class Frame(key: Long, frameIdx: Int, offsetMs: Long, payload: Array[Byte])
  final case class Embedding(key: Long, vec: Array[Float])

  /** ======== STUB KERNELS (deterministic fakes; replace with codecs) ==== */

  /** STUB: "decode" image header. Real impl: javax.imageio / libvips. */
  private def decodeImageStub(payload: Array[Byte]): (Int, Int, String) = {
    val h = mix(payload.foldLeft(0L)((a, b) => a * 31 + b))
    val w = 64 + (h & 0x3ff).toInt            // 64..1087 "pixels"
    val ht = 64 + ((h >>> 10) & 0x3ff).toInt
    val fmt = Vector("png", "jpeg", "webp")(((h >>> 20) & 0x7fffffff).toInt % 3)
    (w, ht, fmt)
  }

  /** STUB: sample frame offsets from a "video". Real impl: ffmpeg. */
  private def frameOffsetsStub(payload: Array[Byte], everyMs: Long): Seq[Long] = {
    val durMs = 1000L + (mix(payload.length.toLong) & 0xffffL) // fake duration
    0L.until(durMs, everyMs)
  }

  /** STUB: media → embedding. Real impl: an ONNX/vision encoder. */
  private def embedStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val seed = payload.foldLeft(0L)((a, b) => a * 131 + b)
    Array.tabulate(dim)(i => ((mix(seed ^ i) >>> 11).toFloat / (1L << 53).toFloat) - 0.0001f)
  }

  /** ======== REAL PLUMBING ============================================== */

  /** Decode metadata per image, batched per partition. */
  def imageMeta(media: Dataset[Media]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.mediaType == "image").mapPartitions { it =>
      // per-partition init goes here in a real codec (amortized)
      it.map { m =>
        val (w, h, fmt) = decodeImageStub(m.payload)
        ImageMeta(m.key, w, h, fmt)
      }
    }
  }

  /** Sample frames: one media row → many frame rows (generator shape). */
  def sampleFrames(media: Dataset[Media], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.mediaType == "video").flatMap { m =>
      frameOffsetsStub(m.payload, everyMs).zipWithIndex.map { case (off, i) =>
        // STUB frame payload: first 16 bytes of the source as a stand-in
        Frame(m.key, i, off, m.payload.take(16))
      }
    }
  }

  /** Embed media; output feeds Similarity.bruteTopK / ivfTopK unchanged. */
  def embed(media: Dataset[Media], dim: Int): Dataset[Embedding] = {
    import media.sparkSession.implicits._
    media.mapPartitions(it => it.map(m => Embedding(m.key, embedStub(m.payload, dim))))
  }

  /** Deterministic synthetic media fixture (no external data). */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n).map { i =>
      val kind = Vector("image", "video", "audio")((i % 3).toInt)
      val len = 32 + (mix(i) & 0xffL).toInt
      val payload = Array.tabulate(len)(j => (mix(i * 1000003L + j) & 0xff).toByte)
      Media(i, kind, payload)
    }
  }
}
