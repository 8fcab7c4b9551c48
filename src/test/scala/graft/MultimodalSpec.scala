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
