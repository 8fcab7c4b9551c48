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

  test("the gated multimodal_bytes_profile payload IS syntheticWav, byte for byte, and the real parser decodes it") {
    // the round-15 gated byte-tier row builds its binary column from
    // doc_id IN-QUERY (DuckDB can't decode media, but it can hash
    // bytes); this test closes the loop the gate can't: the expression
    // emits a REAL RIFF/WAVE container equal to the codec fixture
    // generator, and decodeWav (via extractFeatures) parses it — rate,
    // channels, sample count all land where the generator put them.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = spark.range(0, 8).toDF("doc_id")
      .select(col("doc_id"), expr(graft.ops.LlmOps.wavPayloadSqlExpr).as("payload"))
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = 16 * (1 + (id % 4).toInt)
      assert(r.getAs[Array[Byte]](1).sameElements(
        Multimodal.syntheticWav(id, nFrames = n)), s"doc $id bytes differ")
    }
    val media = spark.createDataset(rows.toSeq.map(r =>
      Multimodal.MediaRow(r.getLong(0), "audio", r.getAs[Array[Byte]](1),
        Multimodal.MediaMeta(0, 0, "wav"))))
    Multimodal.extractFeatures(media).collect().sortBy(_.media_id).foreach { f =>
      val n = 16 * (1 + (f.media_id % 4).toInt)
      assert(f.features(0) == 8000f && f.features(1) == 1f &&
        f.features(2) == n.toFloat, s"media ${f.media_id} did not decode as PCM-16 WAV")
    }
  }

  test("the gated wav-decode expression equals the REAL decodeWav on the same bytes") {
    // multimodal_wav_decode reconstructs PCM-16 samples from the
    // payload BYTES in SQL (round-16 verdict item 2); this ties that
    // expression to the real parser: frames, RMS, and peak computed
    // from the SQL-decoded samples must land exactly where
    // Multimodal.decodeWav (via extractFeatures) puts them.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val decoded = spark.range(0, 8).toDF("doc_id")
      .select(col("doc_id"), expr(graft.ops.LlmOps.wavPayloadSqlExpr).as("payload"))
      .select(col("doc_id"), col("payload"),
        expr(graft.ops.LlmOps.wavDecodeSamplesExpr).as("smp"))
      .select(col("doc_id"), col("payload"),
        expr("cast(size(smp) as bigint)").as("nf"),
        expr("aggregate(smp, cast(0 as bigint), (acc, x) -> acc + x * x)").as("sq"),
        expr("array_max(transform(smp, x -> abs(x)))").as("pk"))
      .collect().sortBy(_.getLong(0))
    val media = spark.createDataset(decoded.toSeq.map(r =>
      Multimodal.MediaRow(r.getLong(0), "audio", r.getAs[Array[Byte]](1),
        Multimodal.MediaMeta(0, 0, "wav"))))
    val real = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    decoded.foreach { r =>
      val (id, nf, sq, pk) = (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
      val f = real(id)
      assert(f.features(2) == nf.toFloat, s"doc $id: frame count differs")
      // decodeWav's RMS is the float of the same exact-int64 sqrt
      assert(f.features(4) == math.sqrt(sq.toDouble / nf).toFloat,
        s"doc $id: RMS differs")
      assert(f.features(6) == pk.toFloat, s"doc $id: peak differs")
    }
  }

  test("the wav-decode expression yields an EMPTY sample list for a data-less payload") {
    // round-16 review: Spark's sequence(0, -1) is the DESCENDING
    // [0, -1] — without the octet-length guard a 44-byte header-only
    // payload would decode two header bytes as samples while DuckDB's
    // range(0, 0) is empty
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val headerOnly = Multimodal.syntheticWav(1L, nFrames = 0)
    assert(headerOnly.length == 44)
    val smp = spark.createDataset(Seq(headerOnly)).toDF("payload")
      .select(expr(graft.ops.LlmOps.wavDecodeSamplesExpr).as("smp"))
      .head().getSeq[Long](0)
    assert(smp.isEmpty, s"expected no samples, got $smp")
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

  test("real video codec: exact geometry/luma/motion from a pinned Y4M") {
    import spark.implicits._
    // hand-built C420 container: 4x2, 30fps, frame0 all Y=100,
    // frame1 all Y=150 -> mean 125, std 25, motion 50, all EXACT
    val w = 4; val h = 2
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F30:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    Seq(100, 150).foreach { y =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      (0 until w * h).foreach(_ => bos.write(y))
      (0 until w * h / 2).foreach(_ => bos.write(128)) // U+V planes
    }
    val media = Seq(Multimodal.MediaRow(0L, "video", bos.toByteArray,
      Multimodal.MediaMeta(w, h, "y4m"))).toDS()
    val f = Multimodal.extractFeatures(media).collect().head.features
    assert(f(0) == 4f && f(1) == 2f, "geometry")
    assert(f(2) == 30f, "fps")
    assert(f(3) == 2f, "frames")
    assert(f(4) == (2.0 / 30).toFloat, "duration")
    assert(f(5) == 125f, s"meanY ${f(5)}")
    assert(f(6) == 25f, s"stdY ${f(6)}")
    assert(f(7) == 100f && f(8) == 150f, "first/last frame luma")
    assert(f(9) == 50f, s"motion ${f(9)}")
  }

  test("synthetic video rows decode through the Y4M parser, not the stub") {
    // id 0 is a video row: 8x8 C420, 4 frames, 25 fps per the generator
    val media = Multimodal.syntheticMedia(spark, 3)
    val f = Multimodal.extractFeatures(media).collect()
      .find(_.media_id == 0L).get.features
    assert(f(0) == 8f && f(1) == 8f && f(2) == 25f && f(3) == 4f)
    // recompute exact luma mean from the generator's ramp formula
    val lumas = for (fr <- 0 until 4; i <- 0 until 64) yield (0L * 37 + fr * 11 + i) % 251
    assert(f(5) == (lumas.sum.toDouble / lumas.length).toFloat, s"meanY ${f(5)}")
  }

  test("frame sampling demuxes every k-th REAL frame out of Y4M containers") {
    val media = Multimodal.syntheticMedia(spark, 9) // 3 videos (ids 0,3,6)
    val frames = Multimodal.sampleFrames(media, every = 2).collect()
    // 4 frames per container; every 2nd -> frames 0 and 2 per video,
    // each the full C420 planar run: 8*8*3/2 = 96 bytes
    assert(frames.length == 3 * 2)
    assert(frames.forall(_.payload.length == 96))
    assert(frames.map(_.frame_no).toSet == Set(0, 2))
    // frame payloads are the generator's exact bytes: Y plane of video
    // id 3, frame 2 starts with ((3*37 + 2*11 + 0) % 251) = 133
    val f32 = frames.find(f => f.media_id == 3L && f.frame_no == 2).get
    assert((f32.payload(0) & 0xff) == 133)
  }

  test("non-Y4M video payloads fall back to fixed-size slice sampling") {
    import spark.implicits._
    val media = Seq(Multimodal.MediaRow(7L, "video",
      Array.tabulate[Byte](256)(_.toByte), Multimodal.MediaMeta(0, 0, "raw"))).toDS()
    val frames = Multimodal.sampleFrames(media, every = 2, frameBytes = 64).collect()
    assert(frames.length == 2 && frames.forall(_.payload.length == 64))
  }

  test("features join against the embeddings table on id") {
    val media = Multimodal.syntheticMedia(spark, 20)
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
    val joined = Multimodal.joinWithEmbeddings(Multimodal.extractFeatures(media), emb)
    assert(joined.count() == 20) // ids 0..19 all present in embeddings
    assert(joined.columns.contains("features") && joined.columns.contains("embedding"))
  }
}
