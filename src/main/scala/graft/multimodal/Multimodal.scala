package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: images/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, encoders, partitioning, batch
  * shape, determinism — is real and tested (MultimodalSpec). The IMAGE
  * codec is REAL: `javax.imageio.ImageIO` ships with the JDK
  * (PNG/BMP/GIF/JPEG readers, zero added dependencies), so image
  * payloads decode to exact width/height + per-channel mean/stddev
  * features. Audio/video kernels remain STUBS (no codec libraries in
  * this container): `stubDecode` derives a deterministic fake feature
  * vector from the bytes (sha-256 expansion), and any image payload
  * ImageIO cannot parse falls back to the same stub rather than
  * failing the pipeline. A production deployment swaps the stub for a
  * real demuxer; nothing else changes, which is the point of the
  * boundary.
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

  /** decode + feature-extract, batched per partition (codec init once
    * per task, not per row): images through the real ImageIO codec,
    * everything else (and unparseable images) through the stub. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-task codec init: disk-cache off so executors never write
      // ImageIO temp files under the working dir
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val feats =
          if (r.kind == "image") decodeImage(r.payload).getOrElse(stubDecode(r.payload))
          else stubDecode(r.payload)
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

  /** Frame sampling for video payloads: every k-th fixed-size slice as
    * a frame (STUB boundary — a real impl demuxes the container). */
  def sampleFrames(media: Dataset[MediaRow], every: Int, frameBytes: Int = 64): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter(_._2 % every == 0)
        .map { case (bytes, i) => Frame(r.media_id, i, bytes) }
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

  /** Synthetic in-memory media table for tests/demos (deterministic);
    * image rows are real PNGs, audio/video opaque byte runs. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = if (i % 3 == 0) "video" else if (i % 3 == 1) "image" else "audio"
      val payload =
        if (kind == "image") syntheticPng(i)
        else Array.tabulate[Byte](256)(j => ((i * 131 + j * 17) % 251).toByte)
      MediaRow(i, kind, payload, MediaMeta(640, 480, if (kind == "image") "png" else "raw"))
    }
  }
}
