package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema, batch shape, determinism of the
  * mapPartitions pipeline (codec kernels are stubs — §brief; the
  * plumbing is the tested surface). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("feature extraction: right dim, deterministic across runs and partitionings") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.forall(_.features.length == Multimodal.FeatureDim))
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.features.sameElements(b.features))
    }
  }

  test("real image codec: exact dimensions and channel stats from a pinned PNG") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(0L, "image", bos.toByteArray, Multimodal.MediaMeta(2, 2, "png"))))
    val f = Multimodal.extractFeatures(media).collect().head.features
    assert(f.take(3).toSeq == Seq(2f, 2f, 3f))
    // every channel's pixel multiset is {255, 0, 0, 128} (in different
    // positions): mean = 383/4 = 95.75 exactly (int sums / n); std via
    // the same exact-int-sum formula the codec computes
    assert(f.slice(3, 6).toSeq == Seq(95.75f, 95.75f, 95.75f))
    val expectedStd = math.sqrt(81409.0 / 4 - 95.75 * 95.75).toFloat
    assert(f.slice(6, 9).toSeq == Seq(expectedStd, expectedStd, expectedStd))
    assert(f.drop(9).forall(_ == 0f)) // padding to the uniform FeatureDim
  }

  test("golden bytes: undecodable image payloads fall back to the frozen stub") {
    // payload = bytes 0..63 — declared kind "image" but NOT a parseable
    // PNG, so ImageIO returns null and the sha-256 stub takes over;
    // expected = ((b₂ᵢ·256 + b₂ᵢ₊₁)/32768 − 1) per the documented stub
    // contract. Freezing the exact floats pins the codec boundary AND
    // the fallback rule: a decode failure degrades, never throws.
    import spark.implicits._
    val payload = Array.tabulate[Byte](64)(_.toByte)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(0L, "image", payload, Multimodal.MediaMeta(8, 8, "raw"))))
    val got = Multimodal.extractFeatures(media).collect().head.features
    val golden = Array(
      0.98370361328125f, 0.4505615234375f, 0.901885986328125f, -0.97357177734375f,
      0.47772216796875f, -0.306243896484375f, 0.57525634765625f, 0.238739013671875f,
      0.222320556640625f, -0.001495361328125f, 0.188018798828125f, -0.24822998046875f,
      0.0958251953125f, -0.024871826171875f, 0.695953369140625f, -0.866943359375f)
    assert(got.toSeq == golden.toSeq)
  }

  test("real WAV codec: exact rate/frames/RMS/peak from a constant-amplitude tone") {
    import spark.implicits._
    // hand-built PCM-16 mono WAV, every sample = +1000: RMS and peak
    // are EXACTLY 1000, duration exactly nFrames/rate
    val n = 32; val rate = 8000
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write("RIFF".getBytes("US-ASCII")); w32(36 + n * 2)
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(1); w16(1); w32(rate); w32(rate * 2); w16(2); w16(16)
    bos.write("data".getBytes("US-ASCII")); w32(n * 2)
    (0 until n).foreach(_ => w16(1000))
    val media = Seq(Multimodal.MediaRow(0L, "audio", bos.toByteArray,
      Multimodal.MediaMeta(0, 0, "wav"))).toDS()
    val f = Multimodal.extractFeatures(media).collect().head.features
    assert(f(0) == rate.toFloat, "sample rate")
    assert(f(1) == 1f, "channels")
    assert(f(2) == n.toFloat, "frames")
    assert(f(3) == (n.toDouble / rate).toFloat, "duration")
    assert(f(4) == 1000f, s"rms ${f(4)}")
    assert(f(6) == 1000f, s"peak ${f(6)}")
  }

  test("synthetic WAV rows decode through the parser, not the stub") {
    // id 2 is an audio row; recompute RMS from the same generator
    val media = Multimodal.syntheticMedia(spark, 3)
    val f = Multimodal.extractFeatures(media).collect()
      .find(_.media_id == 2L).get.features
    val samples = (0 until 64).map(i => (2L * 7919 + i * 1031) % 20000 - 10000)
    val rms = math.sqrt(samples.map(s => s * s).sum.toDouble / 64).toFloat
    val peak = samples.map(math.abs).max.toFloat
    assert(f(0) == 8000f && f(2) == 64f)
    assert(f(4) == rms, s"rms ${f(4)} vs $rms")
    assert(f(6) == peak, s"peak ${f(6)} vs $peak")
  }

  test("resize rewrites metadata and preserves payloads") {
    val media = Multimodal.syntheticMedia(spark, 5)
    val out = Multimodal.resize(media, 224, 224).collect().sortBy(_.media_id)
    assert(out.forall(r => r.meta.width == 224 && r.meta.height == 224))
    val orig = media.collect().sortBy(_.media_id)
    out.zip(orig).foreach { case (a, b) => assert(a.payload.sameElements(b.payload)) }
  }

  test("frame sampling yields every k-th fixed-size slice of video payloads") {
    val media = Multimodal.syntheticMedia(spark, 9) // 3 videos (ids 0,3,6)
    val frames = Multimodal.sampleFrames(media, every = 2, frameBytes = 64).collect()
    // 256-byte payload / 64 = 4 slices; every 2nd -> 2 frames per video
    assert(frames.length == 3 * 2)
    assert(frames.forall(_.payload.length == 64))
    assert(frames.map(_.frame_no).toSet == Set(0, 2))
  }

  test("features join against the embeddings table on id") {
    val media = Multimodal.syntheticMedia(spark, 20)
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
    val joined = Multimodal.joinWithEmbeddings(Multimodal.extractFeatures(media), emb)
    assert(joined.count() == 20) // ids 0..19 all present in embeddings
    assert(joined.columns.contains("features") && joined.columns.contains("embedding"))
  }
}
