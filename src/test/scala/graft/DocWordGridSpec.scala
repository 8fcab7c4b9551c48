package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shared word-tier tokenization artifact (round 17):
  * TextOps.docWordGrid is ONE disk-memoized per-(doc, source, lang,
  * word) count grid consumed by every declared full-corpus word
  * statistic. The driver's hash gate certifies each consumer against
  * its UNCHANGED DuckDB oracle; these tests pin the unit-level claim
  * the rewrites rest on — every grid-fed spelling is row-for-row
  * identical to its explode twin — so a drift shows up here before
  * the gate run. */
class DocWordGridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
  private lazy val grid = graft.text.TextOps.docWordGrid(docs)

  // sorted Seq, NOT Set: parity here must be MULTISET equality — a
  // grid-fed spelling that duplicated or dropped repeated rows would
  // still pass a Set compare
  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("grid totals reproduce the raw token stream (cnt sums, pair distinctness)") {
    val tokens = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("w"))
    assert(grid.agg(sum("cnt")).head.getLong(0) === tokens.count())
    // one grid row per distinct (doc, word) — the df-as-plain-count
    // derivation tfidf/keyword_extract rely on
    assert(grid.count() === tokens.distinct().count())
    // source/lang are doc-determined: carrying them added NO rows
    assert(grid.select("doc_id", "w").distinct().count() === grid.count())
  }

  test("ttrFromCounts over the grid equals the explode ttrOf") {
    val viaGrid = graft.text.TextOps.ttrFromCounts(
      grid.select(col("source"), col("doc_id").as("_doc"), col("w"),
        col("cnt").as("c")),
      "source")
    val direct = graft.text.TextOps.ttrOf(docs, "source", "doc_id", "text")
    assert(rows(viaGrid).nonEmpty && rows(viaGrid) === rows(direct))
  }

  test("zipf/js FromCounts over per-source grid sums equal the explode forms") {
    val zGrid = graft.text.TextOps.zipfSlopeFromCounts(
      grid.groupBy("source", "w").agg(sum("cnt").as("_zn"))
        .select(col("source"), col("w").as("_zw"), col("_zn")),
      "source")
    val zDirect = graft.text.TextOps.zipfSlopeOf(docs, "source", "text")
    assert(rows(zGrid).nonEmpty && rows(zGrid) === rows(zDirect))
    val jGrid = graft.text.TextOps.jsDivergenceFromCounts(
      grid.groupBy("source", "w").agg(sum("cnt").as("_jns"))
        .select(col("source"), col("w").as("_jw"), col("_jns")),
      "source")
    val jDirect = graft.text.TextOps.jsDivergenceOf(docs, "source", "text")
    assert(rows(jGrid).nonEmpty && rows(jGrid) === rows(jDirect))
  }

  test("quality model FromCounts over the grid equals the explode batch2 form") {
    val viaGrid = graft.text.TextOps.qualityModelScoreFromCounts(
      grid.select("doc_id", "w", "cnt"))
    val direct = graft.text.TextOps.qualityModelScoreBatch2Of(
      docs, "doc_id", "text")
    assert(rows(viaGrid).nonEmpty && rows(viaGrid) === rows(direct))
  }

  test("BPE grid-fed counts and budget sampler equal the explode twins") {
    val viaGrid = graft.text.Bpe.bpeTokenCountsFromGrid(grid)
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
    val direct = graft.text.Bpe.bpeTokenCountsOf(docs, "doc_id", "text")
      .select("doc_id", "n_ws_tokens", "n_bpe_tokens")
    assert(rows(viaGrid).nonEmpty && rows(viaGrid) === rows(direct))
    val sGrid = graft.text.Bpe.tokenBudgetSampleBpeFromGrid(grid, 5000L)
    val sDirect = graft.text.Bpe.tokenBudgetSampleBpe(
      docs, "source", "doc_id", "text", 5000L)
    assert(rows(sGrid).nonEmpty && rows(sGrid) === rows(sDirect))
  }

  test("hash-embed cnt-weighted grid sums equal the per-token signed sums") {
    // the declared text_hash_embed derivation: sha16_bits per DISTINCT
    // (doc, word), ±cnt weights — must match ±1 per raw token
    val viaGrid = grid.withColumn("b", expr("sha16_bits(w)"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        (0 until 8).map(i =>
          sum(when(expr(s"(shiftright(b, $i) & 1) = 1"), col("cnt"))
            .otherwise(-col("cnt"))).as(s"h$i")): _*)
    val direct = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("b", expr("sha16_bits(t)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (0 until 8).map(i =>
          sum(when(expr(s"(shiftright(b, $i) & 1) = 1"), 1L).otherwise(-1L))
            .as(s"h$i")): _*)
    assert(rows(viaGrid).nonEmpty && rows(viaGrid) === rows(direct))
  }
}
