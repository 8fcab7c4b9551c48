package graft.tools

/** Offline document-quality (template/spam vs natural) classifier
  * trainer — the TrainBpe/TrainPca pattern: train ONCE offline with no
  * RNG-from-wall-clock and no corpus leakage, inline the learned
  * weights as literals ([[graft.text.QualityModel]]), and replay the
  * identical scoring math in the gated query AND its DuckDB oracle.
  *
  * MODEL: logistic regression on 13 row-local features
  *   [1, ln n_tokens, distinct_ratio, avg_token_len, stop_ratio,
  *    (h0/n)², …, (h7/n)²]
  * where h0..h7 are the text_hash_embed signed bit-sums (each token
  * contributes ±1 to dim i by bit i of its 4-hex sha-256 prefix).
  * The squared bit-balance ratios are the template detector's core
  * signal: a doc dominated by one repeated token drives every h_i/n
  * toward ±1 (all its tokens share one bit pattern), while diverse
  * natural text mixes bit patterns and the signed sums cancel toward
  * 0 — a VOCABULARY-INDEPENDENT repetition measure, so weights
  * trained on the synthetic fixture transfer to any corpus.
  *
  * TRAINING-DATA PROVENANCE (the full note: docs/quality_model.md):
  * the fixture is generated HERE, deterministically (fixed-seed LCG),
  * from first-principles templates of the two classes — natural docs
  * sample a diverse vocabulary with ~15% stopwords and varied lengths;
  * template/spam docs repeat a short phrase, a single token, or a
  * phrase with sparse noise. NO rows of the benchmark corpus and no
  * third-party data enter training, so the gated query is never
  * predicting its own training set and there is nothing to
  * decontaminate.
  *
  * Usage: runMain graft.tools.TrainQuality [iters] [lr]
  * Prints the QualityModel weight literals + fixture accuracy.
  *
  * SCALE POLICY: the model is 13 doubles — scoring is row-local
  * (scan-fused after one token-level hash agg); training is
  * driver-side over the bounded fixture, independent of corpus size.
  */
object TrainQuality {

  val stopwords: Seq[String] = Seq("the", "a", "of", "to")

  /** Diverse "natural" vocabulary — plain lowercase words of varied
    * length (the features never read the word identities, only
    * lengths, distinctness, stopword membership and sha bit
    * patterns). */
  val vocab: Seq[String] = Seq(
    "data", "query", "table", "window", "stream", "batch", "merge",
    "filter", "column", "vector", "partition", "shuffle", "executor",
    "catalyst", "parquet", "schema", "join", "scan", "sort", "hash",
    "group", "order", "value", "key", "row", "small", "big", "fast",
    "slow", "line", "part", "spark", "customer", "agg", "dup",
    "analytics", "pipeline", "cluster", "storage", "memory", "index",
    "buffer", "commit", "ingest", "rollup", "sketch", "sample")

  final case class Doc(tokens: Vector[String], spam: Boolean)

  /** Deterministic 64-bit LCG (Knuth MMIX constants) — no wall-clock,
    * no java.util.Random (its algorithm is JDK-specified but seeding
    * discipline here makes determinism explicit). */
  final class Lcg(seed: Long) {
    private var s: Long = seed
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    /** Uniform int in [0, n). */
    def nextInt(n: Int): Int = (((nextLong() >>> 33) % n).toInt + n) % n
  }

  /** The training fixture: `nPerClass` natural + `nPerClass`
    * template/spam docs, fully determined by `seed`. */
  def fixture(seed: Long = 20260815L, nPerClass: Int = 300): Seq[Doc] = {
    val rng = new Lcg(seed)
    def naturalDoc(): Doc = {
      val len = 25 + rng.nextInt(96)
      val toks = Vector.fill(len) {
        if (rng.nextInt(100) < 15) stopwords(rng.nextInt(stopwords.length))
        else vocab(rng.nextInt(vocab.length))
      }
      Doc(toks, spam = false)
    }
    def spamDoc(): Doc = {
      val len = 25 + rng.nextInt(96)
      val kind = rng.nextInt(3)
      val toks: Vector[String] = kind match {
        case 0 => // short template phrase repeated to fill
          val t = Vector.fill(2 + rng.nextInt(5))(vocab(rng.nextInt(vocab.length)))
          Vector.tabulate(len)(i => t(i % t.length))
        case 1 => // one token hammered
          val w = vocab(rng.nextInt(vocab.length))
          Vector.fill(len)(w)
        case _ => // template with ~10% noise words
          val t = Vector.fill(3 + rng.nextInt(4))(vocab(rng.nextInt(vocab.length)))
          Vector.tabulate(len) { i =>
            if (rng.nextInt(100) < 10) vocab(rng.nextInt(vocab.length))
            else t(i % t.length)
          }
      }
      Doc(toks, spam = true)
    }
    // interleaved so a prefix of the fixture is still balanced
    (0 until nPerClass).flatMap(_ => Seq(naturalDoc(), spamDoc()))
  }

  /** 13-dim feature vector — the EXACT arithmetic the gated query's
    * shared formula text performs on (n_tokens, n_distinct, sum_len,
    * n_stop, h0..h7): same divisions in the same order, sha-256 hex
    * prefix identical to Spark's sha2(t, 256). */
  def featuresOf(tokens: Seq[String]): Array[Double] = {
    val n = tokens.length.toDouble
    val nd = tokens.distinct.length.toDouble
    val sl = tokens.map(_.length.toLong).sum.toDouble
    val ns = tokens.count(stopwords.contains).toDouble
    val h = new Array[Double](8)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    tokens.foreach { t =>
      val b2 = md.digest(t.getBytes("UTF-8")).take(2)
      val b = ((b2(0) & 0xff) << 8) | (b2(1) & 0xff) // first 4 hex chars
      var i = 0
      while (i < 8) {
        h(i) += (if (((b >> i) & 1) == 1) 1.0 else -1.0); i += 1
      }
    }
    Array(1.0, math.log(n), nd / n, sl / n, ns / n) ++
      (0 until 8).map(i => (h(i) / n) * (h(i) / n))
  }

  /** Full-batch logistic-regression gradient descent — sequential
    * left folds in fixture order, fixed iteration count: the same
    * fixture always yields the same weight bits. */
  def fit(data: Seq[(Array[Double], Double)], iters: Int = 4000,
          lr: Double = 0.5): Array[Double] = {
    val d = data.head._1.length
    val w = new Array[Double](d)
    val m = data.length.toDouble
    var it = 0
    while (it < iters) {
      val g = new Array[Double](d)
      data.foreach { case (x, y) =>
        var z = 0.0
        var j = 0
        while (j < d) { z += w(j) * x(j); j += 1 }
        val e = 1.0 / (1.0 + math.exp(-z)) - y
        j = 0
        while (j < d) { g(j) += e * x(j); j += 1 }
      }
      var j = 0
      while (j < d) { w(j) -= lr * g(j) / m; j += 1 }
      it += 1
    }
    w
  }

  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(4000)
    val lr = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val docs = fixture()
    val data = docs.map(dc => (featuresOf(dc.tokens), if (dc.spam) 1.0 else 0.0))
    val w = fit(data, iters, lr)
    val acc = data.count { case (x, y) =>
      val z = x.zip(w).map { case (a, b) => a * b }.sum
      (z > 0.0) == (y == 1.0)
    }.toDouble / data.length
    println(s"// trained by TrainQuality (fixture seed=20260815, n=${data.length}, " +
      s"iters=$iters, lr=$lr, fixture accuracy=$acc)")
    println("val weights: Array[Double] = Array(")
    println(w.map(v => s"  $v").mkString(",\n"))
    println(")")
  }
}
