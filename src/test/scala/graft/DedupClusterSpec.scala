package graft

import graft.text.DedupCluster
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components over near-dup pairs: labels must equal the
  * true components (checked vs a driver-side union-find on small
  * graphs), and survivors keep exactly one doc per cluster. */
class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  test("clusters equal a union-find reference on a chained graph") {
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L))
    val got = DedupCluster.clusters(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == unionFind(pairs))
  }

  test("randomized graphs match union-find") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 3) {
      val pairs = (1 to 60).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
      val got = DedupCluster.clusters(pairs.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == unionFind(pairs))
    }
  }

  test("pointer doubling converges a 40-node chain within the default rounds") {
    // worst case for plain propagation: diameter 39 needs 39 plain
    // rounds; doubling covers it in ~6 (distance squares per round)
    val pairs = (1L until 40L).map(i => (40L - i, 41L - i)) // reversed chain 40..1
    val got = DedupCluster.clusters(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 40L).map(_ -> 1L).toMap)
  }

  test("fixed-rounds mode (no convergence checks) equals the checked mode") {
    val pairs = (1L until 40L).map(i => (40L - i, 41L - i)) // diameter-39 chain
    val fixed = DedupCluster.clusters(pairs.toDF("a", "b"), checkConvergence = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed == (1L to 40L).map(_ -> 1L).toMap)
    // and on a random graph
    val rnd = new scala.util.Random(17)
    val rp = (1 to 50).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).distinct
    val a = DedupCluster.clusters(rp.toDF("a", "b"), checkConvergence = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == unionFind(rp.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))))
  }

  test("on a plain chain the label-of-label jump accelerates: 3 lazy rounds cover diameter 8") {
    // typical-case behavior of the accelerator (chains have no pendant
    // dead-ends). NOT a worst-case guarantee — see the next test.
    val pairs = (1L until 9L).map(i => (i, i + 1)) // chain 1-…-9, diameter 8
    val got = DedupCluster.clusters(pairs.toDF("a", "b"),
        iters = 3, checkConvergence = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 9L).map(_ -> 1L).toMap)
  }

  test("declared HYBRID setting (minRounds=3 lazy, then checked) is exact on the pendant worst case") {
    // adversarial topology for the jump: a long chain whose interior
    // nodes each carry a LOW-id pendant — every node's label becomes
    // its pendant (whose own ball is tiny), so L(L(u)) dead-ends and
    // guaranteed progress is only +1 hop/round. A pure lazy iters=3
    // run can emit stale labels here; the declared hybrid setting
    // keeps iterating until a round changes nothing, so it must agree
    // with union-find exactly.
    val chain = (0 until 8).map(i =>
      (if (i == 0) 0L else 99L + i, 100L + i)) // 0-100-101-…-107
    val pendants = (1 to 7).map(i => (i + 1L, 100L + i)) // 2-101, 3-102, …
    val pairs = (chain ++ pendants).toDF("a", "b")
    val got = DedupCluster.clusters(pairs, iters = 20, minRounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = (chain ++ pendants).map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
    assert(got == unionFind(edges))
    assert(got.values.toSet == Set(0L), "one component, min id 0")
  }

  test("survivors keep exactly one doc per duplicate cluster") {
    val docs = (1L to 30L).map(i => (i, s"text$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val kept = DedupCluster.survivors(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // clusters {1,2,3} -> keep 1; {10,11} -> keep 10; all others kept
    assert(kept == ((1L to 30L).toSet -- Set(2L, 3L, 11L)))
  }

  test("end-to-end: LSH pairs from the documents table collapse the known dup texts") {
    val pairs = ops.Registry.queries("dedup_minhash_lsh")(spark, TestSpark.sfSmoke)
      .select("a", "b")
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
    val kept = DedupCluster.survivors(docs, "doc_id", pairs).cache()
    val exactDistinct = docs.select("text").distinct().count()
    // dups exist, so something must be dropped; exact dups (jaccard
    // 1.0 pairs) are always clustered, so kept ≤ distinct texts
    assert(kept.count() < docs.count())
    assert(kept.count() <= exactDistinct)
    // the defining invariant: no near-dup edge survives with BOTH
    // endpoints kept (each cluster keeps exactly its min-id member)
    val keptIds = kept.select(col("doc_id"))
    val survivingEdges = pairs
      .join(keptIds.withColumnRenamed("doc_id", "a"), Seq("a"))
      .join(keptIds.withColumnRenamed("doc_id", "b"), Seq("b"))
      .count()
    assert(survivingEdges == 0, s"$survivingEdges near-dup pairs fully survived")
  }
}
