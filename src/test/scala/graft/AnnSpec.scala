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
}
