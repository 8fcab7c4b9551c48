package graft

import graft.api.syntax._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parameterized-API coverage for the round-11 batch-3 curation ops —
  * toy-frame properties the fixed gated demos can't reach, plus the
  * API≡gated-query equivalences. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)

  test("tokenBudgetSample keeps a per-group prefix under the budget") {
    val out = docs.tokenBudgetSample("source", "doc_id", "text", 500L).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) <= 500L), "cum_tok exceeded the budget")
    // per group, kept docs are a PREFIX of the hash order: the max kept
    // cum_tok plus any dropped doc's n_tok must exceed the budget OR
    // every doc of the group is kept
    val keptByGroup = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val allByGroup = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptByGroup.keySet.subsetOf(allByGroup.keySet))
  }

  test("tokenBudgetSample is deterministic across repartitionings") {
    val a = docs.tokenBudgetSample("source", "doc_id", "text", 1500L).collect().toSeq
    val b = docs.repartition(7).tokenBudgetSample("source", "doc_id", "text", 1500L)
      .collect().toSeq
    assert(a == b)
  }

  test("temperatureWeights: target shares sum to 1 and rare groups upsample") {
    val rows = docs.temperatureWeights("lang", "text").collect()
    val qsum = rows.map(_.getDouble(4)).sum
    assert(math.abs(qsum - 1.0) < 1e-12, s"target shares sum to $qsum")
    val psum = rows.map(_.getDouble(3)).sum
    assert(math.abs(psum - 1.0) < 1e-12)
    // α=0.5 upsamples below-average groups, downsamples above-average:
    // weight ordering is the REVERSE of share ordering
    val byShare = rows.sortBy(_.getDouble(3)).map(_.getDouble(5))
    assert(byShare.zip(byShare.tail).forall { case (w1, w2) => w1 >= w2 },
      s"weights not antitone in share: ${byShare.toSeq}")
  }

  test("chunkBoilerplate: exact-duplicate docs are 100% boilerplate, unique docs 0%") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (1 to 30).map(i => s"x$i").mkString(" ")
    val toy = Seq((1L, words), (2L, words), (3L, other)).toDF("id", "t")
    val out = toy.chunkBoilerplate("id", "t", chunkWords = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0 && out(2L) == 1.0 && out(3L) == 0.0, out.toString)
  }

  test("chunkBoilerplate drops docs shorter than one chunk") {
    val toy = Seq((1L, "a b c"), (2L, (1 to 12).map(_ => "z").mkString(" ")))
      .toDF("id", "t")
    val ids = toy.chunkBoilerplate("id", "t", chunkWords = 10)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L))
  }

  test("token_budget_sample TVF output equals the DataFrame form") {
    docs.createOrReplaceTempView("cur_docs_tvf")
    val viaSql = spark.sql(
      """SELECT * FROM token_budget_sample('cur_docs_tvf', 'source', 'doc_id', 'text', 1500)
        |ORDER BY source, doc_id""".stripMargin).collect().toSeq
    val viaDf = docs.tokenBudgetSample("source", "doc_id", "text", 1500L)
      .collect().toSeq
    assert(viaSql == viaDf)
  }

  test("classBalance keeps exactly the min class count per group, deterministically") {
    val out = docs.classBalance("lang", "doc_id")
    val perGroup = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minClass = docs.groupBy("lang").count()
      .agg(org.apache.spark.sql.functions.min("count")).head().getLong(0)
    assert(perGroup.values.toSet == Set(minClass), perGroup.toString)
    val again = docs.repartition(5).classBalance("lang", "doc_id").collect().toSeq
    assert(again == out.collect().toSeq)
  }

  test("pqAdcSearch(single query) reproduces the gated sim_pq_adc_topk") {
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
    val viaApi = emb.pqAdcSearch(emb.filter(col("vec_id") === 0), "vec_id", "embedding", 10)
      .select("vec_id", "adc_dist").orderBy("adc_dist", "vec_id")
      .collect().toSeq
    val gated = graft.ops.Registry.queries("sim_pq_adc_topk")(spark, TestSpark.sfSmoke)
      .collect().toSeq
    assert(viaApi == gated)
  }

  test("changepoint finds the regime boundary on a step series") {
    // 1,1,1,9,9: mean 4.2, S_k = -3.2,-6.4,-9.6,-4.8,0 → argmax|S| at
    // k=3, the last row of the low regime (the classic CUSUM estimate)
    val toy = Seq((1L, 1L, 1.0), (1L, 2L, 1.0), (1L, 3L, 1.0),
      (1L, 4L, 9.0), (1L, 5L, 9.0)).toDF("uid", "i", "v")
    val r = toy.changepoint("v", "i", Seq("uid")).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 3L && r(0).getLong(2) == 3L, r(0).toString)
    assert(math.abs(r(0).getDouble(3) - 9.6) < 1e-12, r(0).toString)
    // global (by = Nil) form agrees
    val g = toy.changepoint("v", "i", Nil).collect()
    assert(g.length == 1 && g(0).getLong(0) == 3L)
  }

  test("pqEncode accepts a non-default codebook family") {
    val emb = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
    // 2 subspaces × 32 dims × 2 codes: zero vs all-ones centroids —
    // codes must be valid and qerr finite for every row
    val books: graft.vec.Pq.Books = Array.fill(2)(Array(
      Array.fill(32)(0.0), Array.fill(32)(1.0)))
    val rows = emb.pqEncode("vec_id", "embedding", books).collect()
    assert(rows.length == emb.count())
    assert(rows.forall { r =>
      (1 to 2).forall { s => val c = r.getLong(s); c == 0L || c == 1L } &&
        !r.getDouble(3).isNaN
    })
    // embeddings are small-magnitude vectors: the zero centroid should
    // win every subspace against all-ones
    assert(rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }
}
