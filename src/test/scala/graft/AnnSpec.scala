package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN vs brute force: the IVF-style cell search must (a) be a subset
  * scan, (b) agree with brute force on every vector it does score, and
  * (c) keep reasonable recall on the top-k (same-cell neighbors). */
class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sim_cosine_ivf results are a subset of brute-force scores with identical values") {
    val brute = ops.Registry.queries("sim_cosine_topk")(spark, TestSpark.sfSmoke)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivfTop = ops.Registry.queries("sim_cosine_ivf")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ivfTop.nonEmpty)
    // every ivf hit that ALSO appears in the brute top-10 must carry the
    // exact same rounded score
    ivfTop.foreach { case (id, cos) =>
      brute.get(id).foreach(b => assert(b == cos, s"vec $id: $b vs $cos"))
    }
    // the embeddings are near-isotropic, so a 4-bit sign quantizer has
    // genuinely low top-10 recall — the honest ANN trade-off; what must
    // hold is in-cell exactness: the ivf top-k equals a brute-force
    // ranking restricted to the query's cell
    val inCell = {
      import org.apache.spark.sql.functions._
      val emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
      def cell = expr("cast((CASE WHEN e[0] > 0 THEN 1 ELSE 0 END) + (CASE WHEN e[1] > 0 THEN 2 ELSE 0 END) + (CASE WHEN e[2] > 0 THEN 4 ELSE 0 END) + (CASE WHEN e[3] > 0 THEN 8 ELSE 0 END) as bigint)")
      val withCell = emb.withColumn("cell", cell)
      val qcell = withCell.filter(col("vec_id") === 0).select("cell").head().getLong(0)
      withCell.filter(col("cell") === qcell).count()
    }
    assert(ivfTop.size == math.min(10, inCell - 1), s"ivf returned ${ivfTop.size} of ${inCell - 1} in-cell candidates")
  }

  test("learned-centroid IVF (nprobe=3/8) recall beats the sign-quantizer cell (nprobe=1/16)") {
    val brute = ops.Registry.queries("sim_cosine_topk")(spark, TestSpark.sfSmoke)
      .collect().map(_.getLong(0)).toSet
    val sign = ops.Registry.queries("sim_cosine_ivf")(spark, TestSpark.sfSmoke)
      .collect().map(_.getLong(0)).toSet
    val learned = ops.Registry.queries("sim_cosine_ivf_kmeans")(spark, TestSpark.sfSmoke)
      .collect().map(_.getLong(0)).toSet
    val rSign = (sign & brute).size
    val rLearned = (learned & brute).size
    assert(learned.nonEmpty && rLearned >= rSign,
      s"learned-IVF recall $rLearned < sign-quantizer recall $rSign")
  }

  test("dedup_embed_lsh pairs are a subset of all-pairs truth with exact scores, at usable recall") {
    import org.apache.spark.sql.functions._
    // unblocked all-pairs truth at the same τ — tractable at test size
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
    def dot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    val a = emb.select(col("vec_id").as("ka"), col("e").as("ea"))
    val b = emb.select(col("vec_id").as("kb"), col("e").as("eb"))
    val truth = a.crossJoin(b).filter(col("ka") < col("kb"))
      .select(col("ka"), col("kb"),
        round(dot("ea", "eb") / (sqrt(dot("ea", "ea")) * sqrt(dot("eb", "eb"))), 4).as("cos"))
      .filter(col("cos") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = ops.Registry.queries("dedup_embed_lsh")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every LSH pair must exist in the truth with the identical score
    lsh.foreach { case (k, cos) =>
      assert(truth.contains(k), s"pair $k not in all-pairs truth")
      assert(truth(k) == cos, s"pair $k: ${truth(k)} vs $cos")
    }
    // declared query = ADAPTIVE bands (round 18; 4 × 8 bits at this
    // corpus size): at the τ=0.4 boundary (θ ≈ 66°, p = 1 − θ/π ≈
    // 0.63) expected pair recall is 1 − (1 − p⁸)⁴ ≈ 0.1 — measured
    // 2/66 on this fixture under the round-18 per-band plane rows
    // (7/66 under the round-11 contiguous rows; both within binomial
    // noise of the expectation at 66 trials). Wide bands keep only
    // truly-close pairs, the deliberate trade for bounded buckets at
    // scale. Floor: ≥ 1 surviving pair — a broken bucket key (zero
    // collisions) fails loudly without pinning a statistical draw.
    if (truth.nonEmpty)
      assert(lsh.nonEmpty,
        s"recall ${lsh.size}/${truth.size}: zero collisions — bucket key broken")

    // the retired 16-bucket BASE family lives on as this test-only
    // fixture: same pipeline, 4 × 4-bit bands — expected recall
    // 1 − (1 − p⁴)⁴ ≈ 0.5, floored at 0.2 (the pre-swap assertion), so
    // the narrow-band construction stays correctness-covered even
    // though no declared query runs it anymore
    val sigBase = emb.select(col("vec_id"),
      posexplode(array((0 until graft.vec.LshPlanes.nBands)
        .map(b => expr(graft.vec.LshPlanes.bandSparkG(
          b, graft.vec.LshPlanes.bitsPerBand))): _*)).as(Seq("band", "bucket")))
    val candBase = sigBase.select(col("vec_id").as("ka"), col("band"), col("bucket"))
      .join(sigBase.select(col("vec_id").as("kb"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("ka") < col("kb")).select("ka", "kb").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseHits = truth.keySet.count(candBase.contains)
    if (truth.nonEmpty)
      assert(baseHits.toDouble / truth.size >= 0.2,
        s"base-band fixture recall $baseHits/${truth.size} below floor")
  }

  test("nprobe=5 recall is at least nprobe=1 recall (more cells, superset candidates)") {
    val brute = ops.Registry.queries("sim_cosine_topk")(spark, TestSpark.sfSmoke)
      .collect().map(_.getLong(0)).toSet
    val np1 = ops.Registry.queries("sim_cosine_ivf")(spark, TestSpark.sfSmoke)
      .collect().map(_.getLong(0)).toSet
    val np5 = ops.Registry.queries("sim_cosine_ivf_nprobe")(spark, TestSpark.sfSmoke)
      .collect().map(_.getLong(0)).toSet
    val r1 = (np1 & brute).size
    val r5 = (np5 & brute).size
    assert(np5.nonEmpty && r5 >= r1, s"nprobe=5 recall $r5 < nprobe=1 recall $r1")
  }

  test("scale-band LSH bounds buckets 16x tighter than the base family (the sf1 fix)") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
    // the quantity that blew up at sf1 is the within-bucket candidate
    // pair count Σ C(bucket, 2) — measure exactly that for both bands
    def candPairs(bands: Int, bits: Int): Long = emb
      .select(posexplode(array((0 until bands)
        .map(b => expr(graft.vec.LshPlanes.bandSparkG(b, bits))): _*)).as(Seq("band", "bucket")))
      .groupBy("band", "bucket").count()
      .agg(sum(expr("count * (count - 1)"))).collect()(0).getLong(0) / 2
    val base = candPairs(graft.vec.LshPlanes.nBands, graft.vec.LshPlanes.bitsPerBand)
    val scale = candPairs(graft.vec.LshPlanes.Scale.nBands, graft.vec.LshPlanes.Scale.bitsPerBand)
    // 16 vs 256 buckets/band: ~16x fewer candidate pairs in theory;
    // assert a conservative 5x so data noise can't flap the test while
    // a broken band key (everything in one bucket) still fails loudly
    assert(scale * 5 <= base, s"scale candidate pairs $scale vs base $base")

    // and the scale query's pairs are still a subset of all-pairs truth
    val lsh = ops.Registry.queries("dedup_embed_lsh_scale")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def dot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    val a = emb.select(col("vec_id").as("ka"), col("e").as("ea"))
    val b = emb.select(col("vec_id").as("kb"), col("e").as("eb"))
    val truth = a.crossJoin(b).filter(col("ka") < col("kb"))
      .select(col("ka"), col("kb"),
        round(dot("ea", "eb") / (sqrt(dot("ea", "ea")) * sqrt(dot("eb", "eb"))), 4).as("cos"))
      .filter(col("cos") >= 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty, "scale LSH returned no pairs at smoke size")
    lsh.foreach { case (k, cos) =>
      assert(truth.contains(k), s"pair $k not in all-pairs truth")
      assert(truth(k) == cos, s"pair $k: ${truth(k)} vs $cos")
    }
  }

  test("nprobe recall knob is monotone: recall@10(np=5) >= recall@10(np=1) per query") {
    val rows = ops.Registry.queries("sim_recall_nprobe")(spark, TestSpark.sfSmoke)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (np1, np5) = (r.getDouble(1), r.getDouble(2))
      assert(np5 >= np1, s"qid ${r.getLong(0)}: recall_np5 $np5 < recall_np1 $np1")
    }
  }

  test("truncation norm retention: in (0,1] at dims=16, exactly 1.0 at full width") {
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
    val d16 = graft.vec.VecOps
      .truncateRenormOf(emb, "vec_id", "label", "embedding", dims = 16)
      .collect()
    assert(d16.nonEmpty)
    d16.foreach { r =>
      val (mean, min) = (r.getDouble(2), r.getDouble(3))
      assert(min > 0.0 && min <= mean && mean <= 1.0,
        s"label ${r.getInt(0)}: min $min mean $mean out of (0,1]")
    }
    // dims = the vector width: the prefix IS the vector, so every
    // per-vector kept is exactly 1.0 — mean and min both 1.0, proving
    // the fold/round machinery introduces no drift
    val full = graft.vec.VecOps
      .truncateRenormOf(emb, "vec_id", "label", "embedding", dims = 64)
      .collect()
    full.foreach { r =>
      assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0,
        s"label ${r.getInt(0)}: full-width kept != 1.0")
    }
  }

  test("truncated-dim recall: valid at dims=16, exactly 1.0 at full width") {
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
    val d16 = graft.vec.VecOps
      .truncatedRecallOf(emb, "vec_id", "embedding", dims = 16).collect()
    assert(d16.length == 5)
    d16.foreach { r =>
      val (k, nHit, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(k == 10 && nHit >= 0 && nHit <= k)
      assert(recall == BigDecimal(nHit.toDouble / k)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // full width: truncated ranking IS the ground-truth ranking
    graft.vec.VecOps
      .truncatedRecallOf(emb, "vec_id", "embedding", dims = 64).collect()
      .foreach(r => assert(r.getDouble(3) == 1.0,
        s"qid ${r.getLong(0)}: full-width recall ${r.getDouble(3)} != 1.0"))
  }

  test("int8 recall: 8-bit round-trip barely perturbs the 64-dim ranking") {
    val rows = ops.Registry.queries("sim_recall_int8")(spark, TestSpark.sfSmoke)
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (k, nHit, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(k == 10 && nHit <= k)
      // int8 over 64 dims is a ~0.4% per-coordinate perturbation — a
      // ranking that loses most of the top-10 would mean the quantizer
      // (or the scoring) is broken, not that the dial is honest
      assert(recall >= 0.5, s"qid ${r.getLong(0)}: int8 recall $recall < 0.5")
    }
  }

  test("centroid drift: identical cohorts read exactly 1.0; valid on the corpus") {
    import spark.implicits._
    // every label's even/odd cohorts carry the SAME two vectors →
    // equal centroids → r4'd cosine exactly 1.0 (sqrt(d)·sqrt(d) sits
    // within an ulp of d; the 4-dp round absorbs it)
    val fix = Seq(
      (0L, 1, Seq(1.0f, 2.0f, 3.0f, 4.0f)), (1L, 1, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, 1, Seq(-1.0f, 0.5f, 2.0f, 0.0f)), (3L, 1, Seq(-1.0f, 0.5f, 2.0f, 0.0f)),
      (4L, 2, Seq(5.0f, 1.0f, 0.0f, 2.0f)), (5L, 2, Seq(5.0f, 1.0f, 0.0f, 2.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = graft.vec.VecOps
      .centroidDriftOf(fix, "vec_id", "label", "embedding", dims = 4)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1) == ((2L, 2L, 1.0)) && out(2) == ((1L, 1L, 1.0)))
    // corpus: one row per label, cosine in [-1, 1], cohorts tile the table
    val rows = ops.Registry.queries("vec_centroid_drift")(spark, TestSpark.sfSmoke)
      .collect()
    assert(rows.nonEmpty)
    val total = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
    rows.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0))
  }

  test("knn label vote equals a driver-side re-derivation, query for query") {
    // the embeddings are near-isotropic (see the sign-quantizer test
    // above), so labels carry NO geometric signal and the honest
    // accuracy sits at the uniform prior — what the eval op must get
    // RIGHT is the vote accounting, asserted here by full independent
    // re-derivation in plain Scala
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val all = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
      .selectExpr("vec_id", "label", "transform(embedding, x -> cast(x as double)) AS e")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]) = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    val expected = all.filter(_._1 < 50).map { case (qid, qlabel, qe) =>
      val top10 = all.filter(_._1 != qid)
        .map { case (id, lbl, e) =>
          (id, lbl, r4(dot(e, qe) / (math.sqrt(dot(e, e)) * math.sqrt(dot(qe, qe)))))
        }
        .sortBy { case (id, _, cos) => (-cos, id) }.take(10)
      val pred = top10.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (lbl, n) => (-n, lbl) }.head._1
      (qlabel, pred)
    }
    val perLabel = expected.groupBy(_._1).view.mapValues { ps =>
      (ps.length.toLong, ps.count { case (t, p) => t == p }.toLong)
    }.toMap
    val rows = ops.Registry.queries("sim_knn_classify")(spark, TestSpark.sfSmoke)
      .collect()
    assert(rows.map(_.getLong(1)).sum == 50L, "panel must be exactly 50 queries")
    assert(rows.length == perLabel.size)
    rows.foreach { r =>
      val (lbl, nQ, nC, acc) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val (eQ, eC) = perLabel(lbl)
      assert(nQ == eQ && nC == eC, s"label $lbl: ($nQ,$nC) != expected ($eQ,$eC)")
      assert(acc == r4(nC.toDouble / nQ))
    }
  }

  test("IVF-pruned knn vote equals a cell-pruned re-derivation and measures against the full eval") {
    // sim_knn_classify_ivf (round-15): the same leave-self-out vote
    // over nprobe=5 sign-quantizer cells. Re-derive every vote with
    // the pruning applied, then read the accuracy DIAL against the
    // full eval — on near-isotropic embeddings both sit at the uniform
    // prior, and what must be exact is the accounting.
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val all = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
      .selectExpr("vec_id", "label", "transform(embedding, x -> cast(x as double)) AS e")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def dot(a: Array[Double], b: Array[Double]) = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }; acc
    }
    def cell(e: Array[Double]): Int =
      (0 until 4).map(i => if (e(i) > 0) 1 << i else 0).sum
    var candRows = 0L
    val expected = all.filter(_._1 < 50).map { case (qid, qlabel, qe) =>
      val probes = Set(0, 1, 2, 4, 8).map(_ ^ cell(qe))
      val cands = all.filter(v => v._1 != qid && probes.contains(cell(v._3)))
      candRows += cands.length
      val top10 = cands
        .map { case (id, lbl, e) =>
          (id, lbl, r4(dot(e, qe) / (math.sqrt(dot(e, e)) * math.sqrt(dot(qe, qe)))))
        }
        .sortBy { case (id, _, cos) => (-cos, id) }.take(10)
      val pred = top10.groupBy(_._2).view.mapValues(_.length).toSeq
        .sortBy { case (lbl, n) => (-n, lbl) }.head._1
      (qlabel, pred)
    }
    val perLabel = expected.groupBy(_._1).view.mapValues { ps =>
      (ps.length.toLong, ps.count { case (t, p) => t == p }.toLong)
    }.toMap
    val rows = ops.Registry.queries("sim_knn_classify_ivf")(spark, TestSpark.sfSmoke)
      .collect()
    assert(rows.map(_.getLong(1)).sum == 50L, "panel must be exactly 50 queries")
    assert(rows.length == perLabel.size)
    rows.foreach { r =>
      val (lbl, nQ, nC, acc) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val (eQ, eC) = perLabel(lbl)
      assert(nQ == eQ && nC == eC, s"label $lbl: ($nQ,$nC) != expected ($eQ,$eC)")
      assert(acc == r4(nC.toDouble / nQ))
    }
    // the pruning is REAL: nprobe=5/16 cells reads well under half of
    // the full eval's corpus×panel candidate mass
    assert(candRows < 50L * all.length / 2,
      s"cell pruning did not engage ($candRows candidate rows)")
    // and the accuracy dial sits near the full eval (uniform prior on
    // this corpus): overall |ivf − full| within 0.2
    val full = ops.Registry.queries("sim_knn_classify")(spark, TestSpark.sfSmoke)
      .collect()
    def overall(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getLong(2)).sum.toDouble / rs.map(_.getLong(1)).sum
    assert(math.abs(overall(rows) - overall(full)) <= 0.2)
  }

  test("MMR top-5 replays the greedy diversify loop exactly") {
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val vecs = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS e")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) { s += a(j) * b(j); j += 1 }
      s
    }
    val qe = vecs.find(_._1 == 0L).get._2
    val qn = math.sqrt(dot(qe, qe))
    val panel = vecs.filter(_._1 != 0L)
      .map { case (id, e) =>
        (id, e, math.sqrt(dot(e, e)), dot(e, qe) / (math.sqrt(dot(e, e)) * qn))
      }
      .sortBy(r => (-r._4, r._1)).take(12)
    var surv = panel.toSeq
    var sel = Seq.empty[(Array[Double], Double)]
    val want = (1 to 5).map { it =>
      val scored = surv.map { case (id, e, nrm, rel) =>
        val mmr =
          if (sel.isEmpty) 0.7 * rel
          else 0.7 * rel - 0.3 * sel.map { case (se, snrm) =>
            dot(e, se) / (nrm * snrm) }.max
        (id, rel, mmr, e, nrm)
      }
      val top = scored.minBy(r => (-r._3, r._1))
      sel :+= ((top._4, top._5))
      surv = surv.filterNot(_._1 == top._1)
      (it, top._1, r4(top._2), r4(top._3))
    }
    val got = graft.ops.Registry.queries("sim_mmr_topk")(spark, TestSpark.sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == want)
    // the diversity penalty must bind after round 1: mmr ≠ λ·rel
    // (a zero max-cos across a 12-near-neighbor panel would mean the
    // scoring never saw the selected set)
    assert(got.tail.forall(r => math.abs(r._4 - r4(0.7 * r._3)) > 0.0))
    assert(got.map(_._2).distinct.length == 5)
  }
}
