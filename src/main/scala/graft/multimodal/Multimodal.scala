package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: images/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, encoders, partitioning, batch
  * shape, determinism — is real and tested (MultimodalSpec). The codec
  * kernels are STUBS: this container has no image/audio libraries, so
  * `decode` derives a deterministic fake feature vector from the bytes
  * (sha-256 expansion). A production deployment swaps `stubDecode` for
  * a real codec; nothing else changes, which is the point of the
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

  /** decode + feature-extract, batched per partition (codec init once
    * per task, not per row). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize the codec/model HERE, once per partition
      rows.map(r => MediaFeatures(r.media_id, r.kind, FeatureDim, stubDecode(r.payload)))
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

  /** Synthetic in-memory media table for tests/demos (deterministic). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val payload = Array.tabulate[Byte](256)(j => ((i * 131 + j * 17) % 251).toByte)
      val kind = if (i % 3 == 0) "video" else if (i % 3 == 1) "image" else "audio"
      MediaRow(i, kind, payload, MediaMeta(640, 480, "raw"))
    }
  }
}
