package graft

import graft.vec.KMeans
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd's invariants (no oracle exists for iterative refinement):
  * valid assignments, non-increasing inertia with more iterations,
  * determinism under repartitioning. */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)

  test("assignments are valid and every cluster is represented") {
    val (assigned, centroids, _) = KMeans.fit(emb, k = 4, iters = 3)
    val rows = assigned.collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.length == emb.count())
    assert(rows.forall { case (_, c) => c >= 0 && c < 4 })
    assert(rows.map(_._2).distinct.length == 4)
    assert(centroids.length == 4 && centroids.forall(_.length == 64))
  }

  test("inertia does not increase with more iterations") {
    val (_, _, i1) = KMeans.fit(emb, k = 4, iters = 1)
    val (_, _, i3) = KMeans.fit(emb, k = 4, iters = 3)
    val (_, _, i6) = KMeans.fit(emb, k = 4, iters = 6)
    assert(i3 <= i1 + 1e-9 && i6 <= i3 + 1e-9, s"$i1 -> $i3 -> $i6")
  }

  test("deterministic under repartitioning") {
    val a = KMeans.fit(emb.repartition(7), k = 4, iters = 3)._1
      .collect().map(_.toString).sorted
    val b = KMeans.fit(emb.repartition(2), k = 4, iters = 3)._1
      .collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }
}
