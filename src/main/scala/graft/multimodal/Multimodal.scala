package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: images/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, encoders, partitioning, batch
  * shape, determinism — is real and tested (MultimodalSpec). ALL THREE
  * modality kernels are now REAL:
  *   - images: `javax.imageio.ImageIO` (JDK built-in PNG/BMP/GIF/JPEG
  *     readers) → exact width/height + per-channel mean/stddev;
  *   - audio: hand-parsed RIFF/WAVE PCM-16 → rate/frames/RMS/peak off
  *     exact int64 sums;
  *   - video: hand-parsed YUV4MPEG2 (.y4m — the mplayer/ffmpeg raw
  *     interchange container: one ASCII header line, then
  *     `FRAME\n` + raw planar YUV per frame; no codec library needed,
  *     a hand demuxer is deterministic by construction) → geometry,
  *     fps, frame count, exact luma mean/std, and an inter-frame
  *     |ΔY| motion statistic. `sampleFrames` demuxes REAL frames out
  *     of the container.
  * `stubDecode` (deterministic sha-256 feature expansion) remains only
  * as the fallback for payloads no parser recognizes — a decode
  * failure degrades, never throws. A production deployment adds
  * compressed-codec demuxers at the same boundary; nothing else
  * changes, which is the point of the boundary.
  *
  * Scale: payloads stay columnar-binary end to end (no driver collect);
  * decode runs as mapPartitions so one task amortizes codec init over a
  * whole partition — the same batching contract as a Python
  * mapInPandas/Arrow pipeline, expressed natively in Scala.
  */
object Multimodal {
  case class MediaMeta(width: Int, height: Int, format: String)
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, dim: Int, features: Array[Float])
  case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])

  /** STUB codec: deterministic bytes → FEATURE_DIM floats in [-1, 1).
    * Stands in for image decode + embedding; see class doc. */
  val FeatureDim = 16
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val md = MessageDigest.getInstance("SHA-256")
    val h = md.digest(payload)
    (0 until FeatureDim).map { i =>
      val b0 = h(2 * i) & 0xff
      val b1 = h(2 * i + 1) & 0xff
      ((b0 * 256 + b1).toFloat / 32768f) - 1f
    }.toArray
  }

  /** REAL image decode via the JDK's ImageIO: [width, height,
    * nChannels, meanR, meanG, meanB, stdR, stdG, stdB, 0…] padded to
    * [[FeatureDim]] so every modality shares one feature schema.
    * Channel stats accumulate in exact int64 sums (pixel values are
    * 8-bit ints), so the means/stds are bit-deterministic regardless
    * of partitioning. Returns None for bytes no installed reader
    * recognizes (caller falls back to the stub). */
  private def decodeImage(payload: Array[Byte]): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sum = new Array[Long](3)
        val sq = new Array[Long](3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            var c = 0
            while (c < 3) {
              val v = (rgb >> (16 - 8 * c)) & 0xff
              sum(c) += v
              sq(c) += v.toLong * v
              c += 1
            }
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        val out = new Array[Float](FeatureDim)
        out(0) = w.toFloat; out(1) = h.toFloat; out(2) = 3f
        var c = 0
        while (c < 3) {
          val mean = sum(c) / n
          out(3 + c) = mean.toFloat
          out(6 + c) = math.sqrt(sq(c) / n - mean * mean).toFloat
          c += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** REAL audio decode: RIFF/WAVE PCM-16 parsed directly from the
    * bytes (a WAV container is a length-prefixed chunk list — no
    * codec library needed, and a hand parser is deterministic by
    * construction). Features: [sampleRate, channels, nSamples,
    * durationSec, rms_ch0, rms_ch1, peak_ch0, peak_ch1, 0…] padded to
    * [[FeatureDim]]. RMS accumulates exact int64 sums of squares
    * (16-bit samples: n·2³⁰ fits int64 up to ~2³³ samples — 26 hours
    * of 44.1 kHz stereo; longer payloads should be chunked upstream
    * anyway). Returns None for anything that is not PCM-16 WAV
    * (caller falls back to the stub). */
  private def decodeWav(p: Array[Byte]): Option[Array[Float]] = {
    def u16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def u32(i: Int) = (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
    def tag(i: Int) = new String(p, i, 4, "US-ASCII")
    try {
      if (p.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var channels = 0; var rate = 0L; var bits = 0; var fmt = 0
      var dataOff = -1; var dataLen = 0L
      while (off + 8 <= p.length) {
        val id = tag(off); val len = u32(off + 4)
        if (id == "fmt ") {
          fmt = u16(off + 8); channels = u16(off + 10)
          rate = u32(off + 12); bits = u16(off + 22)
        } else if (id == "data") { dataOff = off + 8; dataLen = len }
        off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
      }
      if (fmt != 1 || bits != 16 || channels < 1 || channels > 2 ||
        dataOff < 0 || dataOff + dataLen > p.length) return None
      val nFrames = dataLen / (2 * channels)
      val sq = new Array[Long](2)
      val peak = new Array[Long](2)
      var i = 0L
      while (i < nFrames) {
        var c = 0
        while (c < channels) {
          val base = dataOff + (i * channels + c) * 2
          val s = (u16(base.toInt) << 16) >> 16 // sign-extend
          sq(c) += s.toLong * s
          if (math.abs(s.toLong) > peak(c)) peak(c) = math.abs(s.toLong)
          c += 1
        }
        i += 1
      }
      val out = new Array[Float](FeatureDim)
      out(0) = rate.toFloat; out(1) = channels.toFloat; out(2) = nFrames.toFloat
      out(3) = (nFrames.toDouble / rate).toFloat
      var c = 0
      while (c < channels) {
        out(4 + c) = math.sqrt(sq(c).toDouble / nFrames).toFloat
        out(6 + c) = peak(c).toFloat
        c += 1
      }
      Some(out)
    } catch { case _: Exception => None }
  }

  /** Parsed Y4M container: geometry + frame-data offsets (each frame's
    * planar YUV run inside the original byte array, zero-copy). */
  private case class Y4m(w: Int, h: Int, fpsNum: Long, fpsDen: Long,
                         frameBytes: Int, frameOffsets: Array[Int])

  /** REAL video demux: YUV4MPEG2. Header = `YUV4MPEG2 W<w> H<h>
    * F<num>:<den> [Ip A.. C<space>]\n`; each frame = `FRAME[params]\n`
    * followed by the raw planar YUV bytes (C420 ⇒ w·h·3/2, C422 ⇒
    * w·h·2, C444 ⇒ w·h·3, Cmono ⇒ w·h; luma plane first in all of
    * them). Returns None unless the container parses EXACTLY — every
    * declared frame fully present. */
  private def parseY4m(p: Array[Byte]): Option[Y4m] =
    try {
      val magic = "YUV4MPEG2"
      if (p.length < magic.length + 1 ||
        new String(p, 0, magic.length, "US-ASCII") != magic) return None
      val nl = p.indexOf('\n'.toByte)
      if (nl < 0) return None
      val params = new String(p, 0, nl, "US-ASCII").split(' ').drop(1)
      var w = 0; var h = 0; var num = 0L; var den = 1L; var cs = "420"
      params.foreach { t =>
        if (t.nonEmpty) t.charAt(0) match {
          case 'W' => w = t.drop(1).toInt
          case 'H' => h = t.drop(1).toInt
          case 'F' =>
            val parts = t.drop(1).split(':')
            num = parts(0).toLong; den = parts(1).toLong
          case 'C' => cs = t.drop(1)
          case _   => () // Ip/A../X.. metadata — irrelevant to demux
        }
      }
      if (w <= 0 || h <= 0 || num <= 0 || den <= 0) return None
      val luma = w * h
      val frameBytes =
        if (cs.startsWith("420")) luma * 3 / 2
        else if (cs.startsWith("422")) luma * 2
        else if (cs.startsWith("444")) luma * 3
        else if (cs == "mono") luma
        else return None
      val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
      var off = nl + 1
      while (off < p.length) {
        // frame header: "FRAME" + optional params, newline-terminated
        if (off + 5 > p.length ||
          new String(p, off, 5, "US-ASCII") != "FRAME") return None
        var e = off + 5
        while (e < p.length && p(e) != '\n'.toByte) e += 1
        if (e >= p.length || e + 1 + frameBytes > p.length) return None
        offsets += e + 1
        off = e + 1 + frameBytes
      }
      if (offsets.isEmpty) None
      else Some(Y4m(w, h, num, den, frameBytes, offsets.toArray))
    } catch { case _: Exception => None }

  /** REAL video decode: features off the demuxed Y4M luma planes —
    * [width, height, fps, nFrames, durationSec, meanY, stdY,
    * meanY_first, meanY_last, motion (mean |ΔY| between consecutive
    * frames), 0…] padded to [[FeatureDim]]. All sums are exact int64
    * over 8-bit samples (w·h·frames·255 and the squared sum fit int64
    * up to ~10⁸ pixels·frames per payload), so the stats are
    * bit-deterministic regardless of partitioning. */
  private def decodeY4m(p: Array[Byte]): Option[Array[Float]] =
    parseY4m(p).map { v =>
      val luma = v.w * v.h
      val n = v.frameOffsets.length
      var sum = 0L; var sq = 0L; var motion = 0L
      var f = 0
      while (f < n) {
        val base = v.frameOffsets(f)
        val prev = if (f > 0) v.frameOffsets(f - 1) else -1
        var i = 0
        while (i < luma) {
          val y = p(base + i) & 0xff
          sum += y; sq += y.toLong * y
          if (prev >= 0) motion += math.abs(y - (p(prev + i) & 0xff)).toLong
          i += 1
        }
        f += 1
      }
      def meanOf(frame: Int): Float = {
        val base = v.frameOffsets(frame)
        var s = 0L; var i = 0
        while (i < luma) { s += p(base + i) & 0xff; i += 1 }
        (s.toDouble / luma).toFloat
      }
      val total = luma.toDouble * n
      val mean = sum / total
      val out = new Array[Float](FeatureDim)
      out(0) = v.w.toFloat; out(1) = v.h.toFloat
      out(2) = (v.fpsNum.toDouble / v.fpsDen).toFloat
      out(3) = n.toFloat
      out(4) = (n.toDouble * v.fpsDen / v.fpsNum).toFloat
      out(5) = mean.toFloat
      out(6) = math.sqrt(sq / total - mean * mean).toFloat
      out(7) = meanOf(0); out(8) = meanOf(n - 1)
      out(9) = if (n > 1) (motion.toDouble / (luma.toDouble * (n - 1))).toFloat else 0f
      out
    }

  /** decode + feature-extract, batched per partition (codec init once
    * per task, not per row): images through the real ImageIO codec,
    * audio through the real WAV parser, video through the real Y4M
    * demuxer; any payload its modality's decoder rejects degrades to
    * the stub (never throws). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-task codec init: disk-cache off so executors never write
      // ImageIO temp files under the working dir
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val feats = r.kind match {
          case "image" => decodeImage(r.payload).getOrElse(stubDecode(r.payload))
          case "audio" => decodeWav(r.payload).getOrElse(stubDecode(r.payload))
          case "video" => decodeY4m(r.payload).getOrElse(stubDecode(r.payload))
          case _       => stubDecode(r.payload)
        }
        MediaFeatures(r.media_id, r.kind, FeatureDim, feats)
      }
    }
  }

  /** Resize: metadata transform with payload pass-through (STUB — a
    * real impl re-encodes the payload). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map(r => r.copy(meta = MediaMeta(w, h, r.meta.format)))
  }

  /** Frame sampling for video payloads: REAL demux for Y4M containers
    * (every k-th frame's full planar YUV run, sliced out of the
    * container at its parsed offset); non-Y4M payloads fall back to
    * fixed-size byte slices so opaque/compressed containers still flow
    * through the same pipeline shape. */
  def sampleFrames(media: Dataset[MediaRow], every: Int, frameBytes: Int = 64): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      parseY4m(r.payload) match {
        case Some(v) =>
          v.frameOffsets.iterator.zipWithIndex
            .filter(_._2 % every == 0)
            .map { case (off, i) =>
              Frame(r.media_id, i, java.util.Arrays.copyOfRange(r.payload, off, off + v.frameBytes))
            }
        case None =>
          r.payload.grouped(frameBytes).zipWithIndex
            .filter(_._2 % every == 0)
            .map { case (bytes, i) => Frame(r.media_id, i, bytes) }
      }
    }
  }

  /** Join features to the embeddings table co-partitioned on id — at
    * scale, both sides pre-bucketed by id so the join is shuffle-free. */
  def joinWithEmbeddings(features: Dataset[MediaFeatures], embeddings: DataFrame): DataFrame =
    features.toDF().join(embeddings, col("media_id") === col("vec_id"))

  /** Deterministic 8×8 RGB PNG payload (JDK encoder): the synthetic
    * table's image rows carry REAL decodable bytes so the ImageIO
    * path, not just the stub, is exercised end to end. */
  def syntheticPng(seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        img.setRGB(x, y, (((seed * 131 + y * 8 + x) * 2654435761L) >>> 8).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic PCM-16 mono WAV payload (hand-built RIFF header +
    * a seed-keyed sawtooth) so the WAV parser, not just the stub, is
    * exercised end to end. */
  def syntheticWav(seed: Long, nFrames: Int = 64, rate: Int = 8000): Array[Byte] = {
    val dataLen = nFrames * 2
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { var i = 0; while (i < 4) { bos.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    bos.write("RIFF".getBytes("US-ASCII")); w32(36L + dataLen)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(1); w32(rate.toLong); w32(rate.toLong * 2); w16(2); w16(16)
    bos.write("data".getBytes("US-ASCII")); w32(dataLen.toLong)
    var i = 0
    while (i < nFrames) { w16((((seed * 7919 + i * 1031) % 20000) - 10000).toInt); i += 1 }
    bos.toByteArray
  }

  /** Deterministic C420 Y4M payload (hand-built header + seed-keyed
    * planar frames) so the video demuxer, not just the stub, is
    * exercised end to end. Luma ramps per frame (real inter-frame
    * motion); chroma planes are a flat seed-keyed value. */
  def syntheticY4m(seed: Long, w: Int = 8, h: Int = 8, frames: Int = 4, fps: Int = 25): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F$fps:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    val luma = w * h
    var f = 0
    while (f < frames) {
      bos.write("FRAME\n".getBytes("US-ASCII"))
      var i = 0
      while (i < luma) { bos.write((((seed * 37 + f * 11 + i) % 251) & 0xff).toInt); i += 1 }
      var c = 0
      while (c < luma / 2) { bos.write(((seed * 53 + 128) % 256).toInt & 0xff); c += 1 }
      f += 1
    }
    bos.toByteArray
  }

  /** Synthetic in-memory media table for tests/demos (deterministic);
    * image rows are real PNGs, audio rows real PCM-16 WAVs, video rows
    * real Y4M containers — all three modality parsers are exercised
    * end to end. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = if (i % 3 == 0) "video" else if (i % 3 == 1) "image" else "audio"
      val payload = kind match {
        case "image" => syntheticPng(i)
        case "audio" => syntheticWav(i)
        case _       => syntheticY4m(i)
      }
      MediaRow(i, kind, payload,
        MediaMeta(640, 480, kind match { case "image" => "png"; case "audio" => "wav"; case _ => "y4m" }))
    }
  }
}
