package graft

import graft.vec.{IvfPq, KMeans, PqCodebooks, PqResidualCodebooks}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ invariants beyond the DuckDB gate: residual codebooks are
  * reproducible training output, residual quantization beats raw PQ at
  * the same code budget (the reason IVF-PQ exists), and the plan keeps
  * the one-broadcast one-shuffle shape. */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
  private def q(name: String) =
    graft.ops.Registry.queries(name)(spark, TestSpark.sfSmoke)

  test("PqResidualCodebooks constants are exactly per-subspace k-means on residuals") {
    val res = IvfPq.residuals(emb)
      .select(col("vec_id"), col("r").as("embedding"))
    for (s <- 0 until PqResidualCodebooks.m) {
      val sub = res.select(col("vec_id"),
        expr(s"slice(embedding, ${s * PqResidualCodebooks.subDim + 1}, ${PqResidualCodebooks.subDim})")
          .as("embedding"))
      val (_, cents, _) = KMeans.fit(sub, PqResidualCodebooks.ksub, 3)
      assert(cents.map(_.toSeq).toSeq ==
        PqResidualCodebooks.codebooks(s).map(_.toSeq).toSeq,
        s"subspace $s residual codebook drifted from training output")
    }
  }

  test("residual quantization beats raw PQ at the same code budget") {
    // qerr(IVF-PQ) = ||e - (c(cell) + decode(codes))||²;
    // qerr(raw PQ)  = ||e - decode(codes)||². Same m×ksub budget; the
    // coarse stage should strictly reduce mean error.
    val ivfpq = q("vec_ivfpq_encode").agg(avg("qerr")).head().getDouble(0)
    val raw = q("vec_pq_encode").agg(avg("qerr")).head().getDouble(0)
    assert(ivfpq < raw, s"residual PQ did not help: ivfpq=$ivfpq raw=$raw")
  }

  test("cells and residual codes are in range") {
    val rows = q("vec_ivfpq_encode").collect()
    assert(rows.length == emb.count())
    for (r <- rows) {
      val cell = r.getLong(1)
      assert(cell >= 0 && cell < graft.vec.IvfCentroids.centroids.length)
      for (s <- 0 until PqResidualCodebooks.m) {
        val c = r.getLong(2 + s)
        assert(c >= 0 && c < PqResidualCodebooks.ksub)
      }
      assert(r.getDouble(2 + PqResidualCodebooks.m) >= -1e-12)
    }
  }

  test("encode plan: one broadcast for cells, one map-side-partial shuffle per vector") {
    // the RAW pipeline: the gated query memoizes it to a parquet codes
    // artifact (round 14), which would hide the build shape
    val plan = graft.vec.IvfPq
      .ivfPqEncodeRawOf(graft.core.Tables.embeddings(spark, TestSpark.sfSmoke))
      .orderBy("vec_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"cells not broadcast:\n${plan.take(2000)}")
    // exchanges: the vec_id hash agg + the final sort range partition —
    // the corpus must shuffle at most once before the sort
    val exchanges = "Exchange (?:hash|range|SinglePartition)".r.findAllIn(plan).size
    assert(exchanges <= 2, s"too many exchanges ($exchanges):\n${plan.take(3000)}")
  }

  test("ADC picks are genuinely near (p25 property, the PqSpec standard)") {
    val adc = q("sim_ivfpq_adc_topk").collect().map(_.getLong(0)).toSet
    val d2 = emb
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
      .crossJoin(
        emb.filter(col("vec_id") === 0)
          .select(expr("transform(embedding, x -> cast(x as double))").as("qe")))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        expr("aggregate(zip_with(e, qe, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)")
          .as("d2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sorted = d2.values.toArray.sorted
    val p25 = sorted((sorted.length * 0.25).toInt)
    val meanPick = adc.toSeq.map(d2).sum / adc.size
    assert(meanPick < p25, s"IVF-ADC picks not near: mean=$meanPick p25=$p25")
  }

  test("IVF-ADC approximates true distance better than raw ADC (residual advantage)") {
    // mean |adc - true| over the top-10 of each method
    def err(key: String): Double = {
      val picks = q(key).collect().map(r => r.getLong(0) -> r.getDouble(1))
      val ids = picks.map(_._1).toSeq
      val d2 = emb
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))
        .crossJoin(emb.filter(col("vec_id") === 0)
          .select(expr("transform(embedding, x -> cast(x as double))").as("qe")))
        .filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id"),
          expr("aggregate(zip_with(e, qe, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)")
            .as("d2"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      picks.map { case (id, adc) => math.abs(adc - d2(id)) }.sum / picks.length
    }
    val ivf = err("sim_ivfpq_adc_topk")
    val raw = err("sim_pq_adc_topk")
    assert(ivf < raw, s"residual ADC not more accurate: ivfpq=$ivf raw=$raw")
  }
}
