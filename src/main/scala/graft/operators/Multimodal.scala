package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Fixtures.mix

/**
 * Multimodal column handling (driver instructions): image/audio/video as
 * opaque BINARY columns with typed metadata. The Spark-side plumbing —
 * schema, partition-preserving batch shape, typed Dataset boundaries — is
 * real and tested. Kernels come in two honest tiers:
 *
 *  - REAL codecs for the codec-free byte formats: binary PPM (P6) images
 *    (decode, per-channel stats, nearest-neighbour resize + re-encode)
 *    and RIFF/WAVE PCM-16 mono audio (decode, duration + amplitude
 *    stats). These are complete from-scratch parsers — PPM and WAV are
 *    plain byte layouts, no external library needed — and both are
 *    oracle-checked end-to-end (encode → decode → stats vs closed-form
 *    SQL, queries q70-q72).
 *  - STUBS for formats whose codecs this container lacks (jpeg/png
 *    decode, video frame extraction, learned embeddings): each is a
 *    clearly-marked deterministic fake keyed on the media bytes, so
 *    pipelines are testable end-to-end and the kernel can be swapped for
 *    a real decoder without touching the plumbing.
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
  final case class ImageStats(key: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)
  final case class AudioStats(key: Long, sample_rate: Int, n_samples: Long,
      duration_ms: Long, sum_abs: Long)

  /** ======== REAL KERNELS: binary PPM (P6) ============================= */

  /** Encode an RGB image as binary PPM (P6): `P6\n<w> <h>\n255\n` +
   * row-major RGB bytes. A real interchange format (netpbm) whose codec
   * is pure byte arithmetic. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"rgb length ${rgb.length} != $w*$h*3")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Real P6 decoder (full netpbm header grammar: `#` comments and any
   * whitespace between tokens; exactly ONE whitespace byte after maxval,
   * then raw samples). Returns (w, h, rgb) for well-formed 8-bit P6;
   * None for anything else — malformed media must never kill a 10^12-row
   * job, the row just drops out of the typed result. */
  def decodePpm(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload.length < 9 || payload(0) != 'P' || payload(1) != '6') return None
    var i = 2
    def skipWs(): Boolean = { // whitespace and #-comments between tokens
      var progressed = false
      var looping = true
      while (looping && i < payload.length) {
        val b = payload(i)
        if (b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 11) {
          i += 1; progressed = true
        } else if (b == '#') {
          while (i < payload.length && payload(i) != '\n') i += 1
          progressed = true
        } else looping = false
      }
      progressed
    }
    def token(): Option[Int] = {
      if (!skipWs()) return None
      var v = 0L
      var any = false
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0'); any = true; i += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- token(); h <- token(); maxv <- token()
      if w > 0 && h > 0 && maxv == 255
      // exactly one whitespace byte separates maxval from the raster
      if i < payload.length && payload(i).toChar.isWhitespace
      start = i + 1
      if (payload.length - start).toLong == w.toLong * h * 3 // Long: w*h*3 can wrap Int
    } yield (w, h, java.util.Arrays.copyOfRange(payload, start, payload.length))
  }

  /** Per-channel pixel sums + dimensions — the feature-extraction stage,
   * REAL for P6 payloads (rows that fail decode drop out). */
  def rgbStats(media: Dataset[Media]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.filter(_.mediaType == "image").mapPartitions { it =>
      it.flatMap { m =>
        decodePpm(m.payload).map { case (w, h, rgb) =>
          var r = 0L; var g = 0L; var b = 0L
          var p = 0
          while (p < rgb.length) {
            r += rgb(p) & 0xff; g += rgb(p + 1) & 0xff; b += rgb(p + 2) & 0xff
            p += 3
          }
          ImageStats(m.key, w, h, r, g, b)
        }
      }
    }
  }

  /** Nearest-neighbour resize, re-encoded as P6 — REAL resample kernel
   * (src pixel (x·w/w2, y·h/h2), the canonical integer mapping). */
  def resizeNearest(media: Dataset[Media], w2: Int, h2: Int): Dataset[Media] = {
    require(w2 > 0 && h2 > 0)
    import media.sparkSession.implicits._
    media.filter(_.mediaType == "image").mapPartitions { it =>
      it.flatMap { m =>
        decodePpm(m.payload).map { case (w, h, rgb) =>
          val out = new Array[Byte](w2 * h2 * 3)
          var y = 0
          while (y < h2) {
            val sy = (y.toLong * h / h2).toInt
            var x = 0
            while (x < w2) {
              val sx = (x.toLong * w / w2).toInt
              val s = (sy * w + sx) * 3
              val d = (y * w2 + x) * 3
              out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
              x += 1
            }
            y += 1
          }
          Media(m.key, "image", encodePpm(w2, h2, out))
        }
      }
    }
  }

  /** ======== REAL KERNELS: RIFF/WAVE PCM-16 mono ======================== */

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rdLe16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Canonical 44-byte-header WAV, PCM-16 mono little-endian. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0)
    val dataLen = samples.length * 2
    val bb = new java.io.ByteArrayOutputStream(44 + dataLen)
    bb.write("RIFF".getBytes("US-ASCII")); bb.write(le32(36 + dataLen))
    bb.write("WAVE".getBytes("US-ASCII"))
    bb.write("fmt ".getBytes("US-ASCII")); bb.write(le32(16))
    bb.write(le16(1)) // PCM
    bb.write(le16(1)) // mono
    bb.write(le32(sampleRate))
    bb.write(le32(sampleRate * 2)) // byte rate
    bb.write(le16(2)) // block align
    bb.write(le16(16)) // bits/sample
    bb.write("data".getBytes("US-ASCII")); bb.write(le32(dataLen))
    samples.foreach(s => bb.write(le16(s & 0xffff)))
    bb.toByteArray
  }

  /** Real RIFF walker: finds `fmt ` and `data` chunks wherever they sit
   * (chunks are padded to even sizes per spec), requires PCM-16 mono.
   * None on anything else. */
  def decodeWavPcm16(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload.length < 12) return None
    if (!(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F')) return None
    if (!(payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E')) return None
    var i = 12
    var rate = -1
    var data: Array[Short] = null
    while (i + 8 <= payload.length) {
      val id = new String(payload, i, 4, "US-ASCII")
      val sz = rdLe32(payload, i + 4)
      if (sz < 0 || i.toLong + 8L + sz > payload.length) return None // Long: sz near 2^31 wraps
      if (id == "fmt ") {
        if (sz < 16) return None
        val fmt = rdLe16(payload, i + 8)
        val ch = rdLe16(payload, i + 10)
        val bits = rdLe16(payload, i + 22)
        if (fmt != 1 || ch != 1 || bits != 16) return None
        rate = rdLe32(payload, i + 12)
      } else if (id == "data") {
        if (sz % 2 != 0) return None
        data = Array.tabulate(sz / 2)(j => rdLe16(payload, i + 8 + 2 * j).toShort)
      }
      i += 8 + sz + (sz & 1) // chunks pad to even length
    }
    if (rate > 0 && data != null) Some((rate, data)) else None
  }

  /** Duration + amplitude stats — REAL for PCM-16 mono WAV payloads. */
  def audioStats(media: Dataset[Media]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.filter(_.mediaType == "audio").mapPartitions { it =>
      it.flatMap { m =>
        decodeWavPcm16(m.payload).map { case (rate, samples) =>
          var sumAbs = 0L
          var j = 0
          while (j < samples.length) { sumAbs += math.abs(samples(j).toLong); j += 1 }
          AudioStats(m.key, rate, samples.length.toLong,
            samples.length.toLong * 1000L / rate, sumAbs)
        }
      }
    }
  }

  final case class AudioFrame(key: Long, frame_idx: Int, offset_ms: Long,
      n: Int, sum_abs: Long, peak: Int, sum_sq: Long)

  /**
   * Frame-sample a PCM-16 WAV column: fixed windows of `frameSamples`
   * samples (the last frame may be short), each reduced to integer
   * features — sum|x| (mean-amplitude numerator), peak |x| (clipping /
   * silence detection) and Σx² (the RMS-energy numerator). REAL kernel
   * (the driver's multimodal frame-sample step, done on the codec-free
   * format); all-integer outputs so the oracle replays it closed-form.
   *
   * Scale shape: mapPartitions row-local expansion — frames per row =
   * ceil(n/frameSamples), no shuffle; downstream aggregations see narrow
   * fixed-width rows instead of megabyte payloads. Overflow: Σx² ≤
   * 2³⁰·frame length — safe for any realistic clip (< 2³³ samples/frame).
   */
  def audioFrames(media: Dataset[Media], frameSamples: Int): Dataset[AudioFrame] = {
    require(frameSamples >= 1, s"frameSamples must be >= 1 (got $frameSamples)")
    import media.sparkSession.implicits._
    media.filter(_.mediaType == "audio").mapPartitions { it =>
      it.flatMap { m =>
        decodeWavPcm16(m.payload).toSeq.flatMap { case (rate, samples) =>
          (0 until samples.length by frameSamples).iterator.map { start =>
            val end = math.min(start + frameSamples, samples.length)
            var sumAbs = 0L; var sumSq = 0L; var peak = 0
            var j = start
            while (j < end) {
              val a = math.abs(samples(j).toInt)
              sumAbs += a; sumSq += a.toLong * a
              if (a > peak) peak = a
              j += 1
            }
            AudioFrame(m.key, start / frameSamples,
              start.toLong * 1000L / rate, end - start, sumAbs, peak, sumSq)
          }
        }
      }
    }
  }

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

  /** Decode metadata per image, batched per partition: REAL for P6
   * payloads, stub otherwise (the real-codec swap point). */
  def imageMeta(media: Dataset[Media]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.filter(_.mediaType == "image").mapPartitions { it =>
      // per-partition init goes here in a real codec (amortized)
      it.map { m =>
        decodePpm(m.payload) match {
          case Some((w, h, _)) => ImageMeta(m.key, w, h, "ppm")
          case None =>
            val (w, h, fmt) = decodeImageStub(m.payload)
            ImageMeta(m.key, w, h, fmt)
        }
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

  /** Deterministic synthetic P6 images whose pixels are CLOSED-FORM in
   * (key, x, y) — integer arithmetic a SQL oracle reproduces exactly, so
   * the full encode → decode → stats loop is hash-checkable (q70/q71):
   * r = (3k+7x+13y) mod 256, g = (5k+11x+17y) mod 256,
   * b = (7k+13x+19y) mod 256. */
  def syntheticPpm(spark: SparkSession, n: Long, w: Int, h: Int): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n).map { k =>
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val d = (y * w + x) * 3
          rgb(d) = ((3 * k + 7 * x + 13 * y) % 256).toByte
          rgb(d + 1) = ((5 * k + 11 * x + 17 * y) % 256).toByte
          rgb(d + 2) = ((7 * k + 13 * x + 19 * y) % 256).toByte
          x += 1
        }
        y += 1
      }
      Media(k, "image", encodePpm(w, h, rgb))
    }
  }

  /** Deterministic synthetic PCM-16 WAV with closed-form samples
   * s_i = ((31k + 17i) mod 65536) − 32768 (q72's oracle recomputes the
   * sum in SQL). */
  def syntheticWav(spark: SparkSession, n: Long, sampleRate: Int,
      nSamples: Int): Dataset[Media] = {
    import spark.implicits._
    spark.range(0, n).map { k =>
      val samples = Array.tabulate(nSamples)(i => (((31 * k + 17 * i) % 65536) - 32768).toShort)
      Media(k, "audio", encodeWavPcm16(sampleRate, samples))
    }
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
