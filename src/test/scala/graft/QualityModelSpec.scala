package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.TrainQuality
import graft.text.QualityModel

/** The trained template/spam classifier: literal re-derivation (the
  * PcaSpec pattern), fixture separation through the REAL gated scorer,
  * and formula-vs-Scala replay. */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("TrainQuality.fit on the shipped fixture reproduces the inlined weights bit-exactly") {
    val data = TrainQuality.fixture()
      .map(d => (TrainQuality.featuresOf(d.tokens), if (d.spam) 1.0 else 0.0))
    val w = TrainQuality.fit(data, iters = 4000, lr = 0.5)
    assert(w.toSeq == QualityModel.weights.toSeq)
  }

  test("the shipped weights separate the training fixture perfectly") {
    val data = TrainQuality.fixture()
      .map(d => (TrainQuality.featuresOf(d.tokens), d.spam))
    val acc = data.count { case (x, spam) =>
      val z = x.zip(QualityModel.weights).map { case (a, b) => a * b }.sum
      (z > 0.0) == spam
    }.toDouble / data.length
    assert(acc == 1.0)
  }

  test("the gated scorer separates a HELD-OUT template/spam fixture (different seed and shapes)") {
    // held out: a different seed drives entirely different docs
    // through the same deterministic generator — none of these rows
    // (or their feature vectors) were seen by the trainer.
    val held = TrainQuality.fixture(seed = 777L, nPerClass = 40)
    import scala.jdk.CollectionConverters._
    val rows = held.zipWithIndex.map { case (d, i) =>
      org.apache.spark.sql.Row(i.toLong, d.tokens.mkString(" "), d.spam)
    }
    val df = spark.createDataFrame(
      rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("spam",
          org.apache.spark.sql.types.BooleanType))))
    val scored = graft.text.TextOps.qualityModelScoreOf(df, "doc_id", "text")
      .join(df.select(col("doc_id"), col("spam")), "doc_id")
      .select(col("is_spam"), col("spam"), col("spam_prob"))
      .collect()
    assert(scored.length == held.length)
    val acc = scored.count(r => r.getBoolean(0) == r.getBoolean(1)).toDouble /
      scored.length
    assert(acc >= 0.95, s"held-out accuracy $acc")
    // probabilities are probabilities
    assert(scored.forall { r =>
      val p = r.getDouble(2); p >= 0.0 && p <= 1.0
    })
  }

  test("batch explode+agg spelling equals the row-local streaming form row for row") {
    // round 16: the declared key runs qualityModelScoreBatchOf (codegen
    // per-token work, one hash agg); the stateless row-local form stays
    // as the streaming path — both aggregate the SAME exact integers,
    // so every column is bit-identical
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    val rowLocal = keyed(graft.text.TextOps.qualityModelScoreOf(docs, "doc_id", "text"))
    val batch = keyed(graft.text.TextOps.qualityModelScoreBatchOf(docs, "doc_id", "text"))
    assert(rowLocal.nonEmpty && rowLocal == batch)
    // round 17: the DECLARED key runs the Expand-free per-(doc,word)
    // pre-agg spelling — same exact count-weighted integers, so it
    // too is bit-identical to both earlier forms
    val batch2 = keyed(graft.text.TextOps.qualityModelScoreBatch2Of(docs, "doc_id", "text"))
    assert(batch2 == batch)
  }

  test("NULL-text docs drop from the scorer, matching langIdOf and the oracle's unnest") {
    // ADVICE round 14: a NULL text made split() emit a NULL array and
    // the row survived with all-NULL aggregates, while the DuckDB
    // oracle's unnest emits no rows for it — a latent gated-parity
    // divergence on any corpus with NULL text.
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, "the quick brown fox"),
      org.apache.spark.sql.Row(2L, null),
      org.apache.spark.sql.Row(3L, "a of to the spam spam spam")).asJava, schema)
    val out = graft.text.TextOps.qualityModelScoreOf(df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L))
  }

  test("the Spark formula replays the trainer's feature arithmetic on the smoke corpus") {
    // pull the exact-integer aggregates for a handful of docs and
    // re-evaluate z in plain Scala via featuresOf on the raw tokens;
    // the decision bits must agree (z itself may differ by float
    // ASSOCIATION order — the formula is a fixed left-to-right sum,
    // featuresOf dot-product likewise, so they agree exactly here).
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .filter(col("doc_id") < 20)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = graft.ops.Registry.queries("text_quality_model")(spark, TestSpark.sfSmoke)
      .filter(col("doc_id") < 20)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    docs.foreach { case (id, text) =>
      val x = TrainQuality.featuresOf(text.split(" ").toSeq)
      var z = 0.0
      var j = 0
      while (j < x.length) { z += QualityModel.weights(j) * x(j); j += 1 }
      val p = math.rint(1.0 / (1.0 + math.exp(-z)) * 10000.0) / 10000.0
      val (gp, gflag) = got(id)
      assert(gflag == (z > 0.0), s"doc $id flag")
      assert(math.abs(gp - p) <= 1e-4 + 1e-12, s"doc $id prob: got $gp want $p")
    }
  }
}
