package graft

import graft.functions.{CosineRewrite, CosineSim, DotProduct, DotProductRewrite}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom-Expression tier (§2.L): the native codegen dot product
  * must be bit-identical to the HOF fold used by the declared queries,
  * and the optimizer rule must rewrite the HOF pattern into it. */
class NativeFunctionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    // the shared test session was built without extensions; register the
    // same builder GraftExtensions injects
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction("dot_native",
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotProduct(args.head, args(1)), "built-in")
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction("cosine_native",
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineSim(args.head, args(1)), "built-in")
    s
  }

  private def vecs = graft.core.Tables.embeddings(spark, TestSpark.sfSmoke)
    .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("e"))

  private val hofDot = "aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"

  test("native DotProduct is bit-identical to the HOF fold") {
    val df = vecs.selectExpr("vec_id", s"$hofDot AS hof", "dot_native(e, e) AS native")
    assert(df.filter(col("hof") =!= col("native")).count() == 0)
    assert(df.filter(col("native") > 0).count() > 0) // non-degenerate
  }

  test("codegen path evaluates inside whole-stage codegen") {
    val df = vecs.selectExpr("dot_native(e, e) AS d")
    // the starred prefix marks operators fused into a WholeStageCodegen
    // stage; dot_native's Project must carry it (no eval fallback)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("dot_native") && l.contains("*(")), plan)
    assert(df.agg(sum("d")).head().getDouble(0) > 0.0)
  }

  test("optimizer rule rewrites the HOF pattern to DotProduct") {
    val plan = DotProductRewrite(vecs.selectExpr(s"$hofDot AS d").queryExecution.analyzed)
    assert(plan.toString.contains("dot_native"), plan.toString)
    // a fold that is NOT a dot product is left alone
    val other = DotProductRewrite(
      vecs.selectExpr("aggregate(e, 0D, (acc, x) -> acc + x) AS s").queryExecution.analyzed)
    assert(!other.toString.contains("dot_native"))
  }

  test("rule does NOT rewrite look-alike folds that are not dot products") {
    // each of these matches the old (unsound) shape but is semantically
    // different; rewriting any of them would silently corrupt results
    val lookAlikes = Seq(
      // multiply ignores one bound var / uses the same var twice
      "aggregate(zip_with(e, e, (x, y) -> x * x), 0D, (acc, x) -> acc + x)",
      // multiply against a constant
      "aggregate(zip_with(e, e, (x, y) -> x * 2D), 0D, (acc, x) -> acc + x)",
      // add ignores the element (sums nothing)
      "aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, x) -> acc + acc)",
      // non-identity finish lambda
      "aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, x) -> acc + x, acc -> acc * 2D)")
    for (sqlExpr <- lookAlikes) {
      val plan = DotProductRewrite(
        vecs.selectExpr(s"$sqlExpr AS d").queryExecution.analyzed)
      assert(!plan.toString.contains("dot_native"), s"wrongly rewrote: $sqlExpr")
    }
    // commuted operands ARE still a dot product (IEEE * and + commute)
    val commuted = DotProductRewrite(vecs.selectExpr(
      "aggregate(zip_with(e, e, (x, y) -> y * x), 0D, (acc, x) -> x + acc) AS d")
      .queryExecution.analyzed)
    assert(commuted.toString.contains("dot_native"), commuted.toString)
  }

  test("rewritten plan returns the same values as the HOF plan") {
    val hof = vecs.selectExpr("vec_id", s"$hofDot AS d").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = vecs.selectExpr("vec_id", "dot_native(e, e) AS d").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hof == native)
  }

  // pairs (e, q) with q = the element-wise reversed vector — a cheap
  // second operand that still exercises every accumulator
  private def pairs = vecs.selectExpr("vec_id", "e", "reverse(e) AS q")

  test("fused CosineSim is bit-identical to the composed dot/sqrt form") {
    val df = pairs.selectExpr("vec_id",
      "dot_native(e, q) / (sqrt(dot_native(e, e)) * sqrt(dot_native(q, q))) AS composed",
      "cosine_native(e, q) AS fused")
    assert(df.filter(col("composed") =!= col("fused")).count() == 0)
    assert(df.filter(col("fused").isNotNull).count() > 0)
  }

  test("CosineSim zero-norm semantics track the Divide eval mode") {
    val z = spark.sql(
      """SELECT cast(array(0D, 0D) as array<double>) AS e,
        |       cast(array(1D, 2D) as array<double>) AS q""".stripMargin)
    // the session runs Spark 4's ANSI default: the composed Divide
    // THROWS on the zero-norm row…
    intercept[Exception] {
      z.selectExpr(
        "dot_native(e, q) / (sqrt(dot_native(e, e)) * sqrt(dot_native(q, q))) AS c")
        .head()
    }
    // …and so must the fused form the rewrite produces (failOnError
    // captured from the matched Divide's ANSI mode)
    intercept[Exception] {
      org.apache.spark.sql.graftshim.GraftShims.ofRows(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        graft.functions.CosineRewrite(DotProductRewrite(
          z.selectExpr(
            "dot_native(e, q) / (sqrt(dot_native(e, e)) * sqrt(dot_native(q, q))) AS c")
            .queryExecution.analyzed))).head()
    }
    // the SQL-registered function defaults to NULL-on-zero (try_divide
    // discipline) for direct users
    assert(z.selectExpr("cosine_native(e, q) AS c").head().isNullAt(0))
  }

  test("CosineRewrite fuses the composed pattern after DotProductRewrite") {
    val composed = pairs.selectExpr(
      s"""aggregate(zip_with(e, q, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
         | / (sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, x) -> acc + x))
         |    * sqrt(aggregate(zip_with(q, q, (x, y) -> x * y), 0D, (acc, x) -> acc + x))) AS c""".stripMargin)
    val afterDot = DotProductRewrite(composed.queryExecution.analyzed)
    val fused = CosineRewrite(afterDot)
    assert(fused.toString.contains("cosine_native"), fused.toString)
    // a cross-term denominator is NOT a cosine — left untouched
    val notCos = CosineRewrite(DotProductRewrite(pairs.selectExpr(
      s"""aggregate(zip_with(e, q, (x, y) -> x * y), 0D, (acc, x) -> acc + x)
         | / (sqrt(aggregate(zip_with(e, q, (x, y) -> x * y), 0D, (acc, x) -> acc + x))
         |    * sqrt(aggregate(zip_with(q, q, (x, y) -> x * y), 0D, (acc, x) -> acc + x))) AS c""".stripMargin)
      .queryExecution.analyzed))
    assert(!notCos.toString.contains("cosine_native"), notCos.toString)
  }

  test("fused cosine evaluates inside whole-stage codegen") {
    val df = pairs.selectExpr("cosine_native(e, q) AS c")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("cosine_native") && l.contains("*(")), plan)
    assert(df.filter(col("c").isNotNull).count() > 0)
  }

  test("sha16_bits equals the composite sha2/conv spelling on real tokens") {
    // the feature-hashing kernel (text_hash_embed/text_quality_model):
    // first two digest bytes ≡ first four hex chars, token by token —
    // including empty strings and non-ASCII (UTF-8 bytes hashed)
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
    val toks = docs
      .selectExpr("explode(split(text, ' ')) AS t")
      .unionAll(spark.sql("SELECT '' AS t UNION ALL SELECT 'Čafé ☃' AS t"))
    val diff = toks.selectExpr("t", "sha16_bits(t) AS a",
        "cast(conv(substring(sha2(t, 256), 1, 4), 16, 10) as int) AS b")
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty, diff.limit(5).collect().mkString(", "))
    // both eval modes agree: interpreted (inside a HOF) vs codegen'd
    val viaHof = docs.limit(50)
      .selectExpr("doc_id", "transform(split(text, ' '), w -> sha16_bits(w)) AS bs")
      .selectExpr("doc_id", "aggregate(bs, 0L, (a, b) -> a + b) AS s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExplode = docs.limit(50)
      .selectExpr("doc_id", "explode(split(text, ' ')) AS t")
      .selectExpr("doc_id", "cast(sha16_bits(t) as bigint) AS b")
      .groupBy("doc_id").agg(sum("b").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaHof == viaExplode)
  }

  test("pii_scan equals the chained regex spelling on the gated corpus") {
    // the round-17 kernel replays the WHOLE email→ip→phone chain
    // (counts on partially-redacted text) in one native expression;
    // parity is checked on exactly the text the declared query scans —
    // the corpus with the deterministic doc_id-derived contact tail
    val seeded = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .selectExpr("doc_id",
        """text || ' reach user' || doc_id || '@example.com or 10.0.'
          | || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
          | || ' call +1-555-' || lpad(cast(doc_id % 10000 as string), 4, '0')
          | AS text""".stripMargin.replaceAll("\n", ""))
    val native = graft.ops.LlmOps.piiRedactOf(seeded, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val chain = graft.ops.LlmOps.piiRedactChainOf(seeded, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(native.size == chain.size && native.keySet == chain.keySet)
    native.foreach { case (id, got) =>
      assert(got == chain(id), s"doc $id: $got != ${chain(id)}") }
  }

  test("pii_scan matches java.util.regex on adversarial edge cases") {
    // each string stresses one backtracking/boundary subtlety the
    // byte scanners reimplement by hand
    val cases = Seq(
      "", " ", "plain text no pii at all",
      "a@b.com", "a@b.com.", "a@b.co.uk", "x@y", "a@b@c.com", "a@_b@c.com",
      "%%%a@b.com", ".a@b.com", "a@b.c1.com", "a@b-c.org extra", "a@@b.com",
      "user.name+tag@sub.domain-x.example.travel trailing",
      "1.2.3.user@x.com4.5.6.7", "5@x.com5",
      "1.2.3.4", "1234.5.6.7", "1.2.3.4567", "a1.2.3.4", "1.2.3.4a",
      "1.2.3.4.5.6.7.8", "10.0.0.1 and 255.255.255.255", "1.23.456.7.8",
      "ip 1.2.3.4, done", "v1.2.3.4", "x 1.2.3.4_y",
      "é1.2.3.4", "☃1.2.3.4☃", "_1.2.3.4_", "1.2.3.4é end", "😀 1.2.3.4 😀",
      "+1-555-0123", "call 12345678 now", "call 123456789 now",
      "123 456 7890", "5+12345678901", "12+34567890", "+x 123",
      "num 1 2 3 4 5 6 7 8 9 end", "-- 555-123-4567 --",
      "+12345678 9", "9876543210- -x", "++12345678901",
      "mixed a@b.com 1.2.3.4 +1-555-0123 a@b.com",
      "émail é@b.com naïve 1.2.3.4é +1 555 0123 4",
      "Čafé ☃ user@host.org ☃ 8.8.8.8 ☃ 00 11 22 33 44")
    import spark.implicits._
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = graft.ops.LlmOps.piiRedactOf(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val chain = graft.ops.LlmOps.piiRedactChainOf(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    cases.indices.foreach { i =>
      assert(native(i.toLong) == chain(i.toLong),
        s"case '${cases(i)}': ${native(i.toLong)} != ${chain(i.toLong)}")
    }
    // the full redacted text (not just the 80-char prefix) also agrees
    // with the java chain, via the raw struct
    val full = df.selectExpr("doc_id", "pii_scan(text).redacted AS r")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val re = graft.ops.LlmOps.PiiPatterns
    val javaFull = cases.zipWithIndex.map { case (t, i) =>
      i.toLong -> re.foldLeft(t) { case (s, (_, p, tok)) => s.replaceAll(p, tok) }
    }.toMap
    assert(full == javaFull)
  }

  test("pii_scan fuzz parity: 4000 seeded random strings over a hostile alphabet") {
    // deterministic fuzz locking the hand-rolled scanners to the java
    // chain for future rounds — the alphabet is weighted toward the
    // pattern-relevant chars (digits, '.', '-', ' ', '+', '@', '%',
    // '_', letters) plus multi-byte Unicode word/non-word chars
    val alphabet: IndexedSeq[String] =
      ("0123456789" * 3 + "..--  ++@@%_" * 2 + "abcXYZ").map(_.toString) ++
        Seq("é", "☃", "😀", "ß")
    val rnd = new scala.util.Random(4242)
    val cases = (0 until 4000).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString)
    }
    import spark.implicits._
    val df = cases.toDF("doc_id", "text")
    val native = graft.ops.LlmOps.piiRedactOf(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val chain = graft.ops.LlmOps.piiRedactChainOf(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val bad = cases.filter { case (id, _) => native(id) != chain(id) }
    assert(bad.isEmpty, bad.take(5).map { case (id, t) =>
      s"'$t': ${native(id)} != ${chain(id)}" }.mkString("; "))
    // the fuzz corpus is non-vacuous: some matches of every class fire
    val sums = chain.values.toSeq
    assert(sums.exists(_.head.asInstanceOf[Long] > 0) ||
      sums.exists(r => r(1).asInstanceOf[Long] > 0) ||
      sums.exists(r => r(2).asInstanceOf[Long] > 0))
  }

  test("pii_scan evaluates inside whole-stage codegen") {
    val df = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .selectExpr("pii_scan(text) AS p")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("pii_scan") && l.contains("*(")), plan)
    assert(df.limit(3).collect().length == 3)
  }

  test("wav_profile equals the HOF decode spelling on the gated payloads") {
    // the round-17 kernel computes (n_frames, sum_sq, peak) in one
    // byte scan; parity on exactly the synthetic payloads the declared
    // multimodal_wav_decode scans — all-int64 arithmetic, so equality
    // is exact
    val docs = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .selectExpr("doc_id", s"${graft.ops.LlmOps.wavPayloadSqlExpr} AS payload")
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val native = keyed(graft.ops.LlmOps.wavProfileOf(docs, "doc_id", "payload"))
    val fold = keyed(graft.ops.LlmOps.wavProfileFoldOf(docs, "doc_id", "payload"))
    assert(native.nonEmpty && native == fold)
  }

  test("wav_profile degenerate payloads: header-only, odd tail, extreme samples") {
    import spark.implicits._
    // bytes: empty, header-only (44), header+1 stray byte (45 — still
    // no full frame), one frame (46), one frame + odd tail (47),
    // extreme samples (-32768 = 00 80, 32767 = ff 7f), all-zero frames
    val mk = (n: Int, tail: Seq[Int]) =>
      (Array.fill(n)(0.toByte) ++ tail.map(_.toByte)).toArray
    val cases: Seq[(Long, Array[Byte])] = Seq(
      1L -> mk(0, Nil),
      2L -> mk(44, Nil),
      3L -> mk(45, Nil),
      4L -> mk(44, Seq(0x34, 0x12)),            // frame 0x1234 = 4660
      5L -> mk(44, Seq(0x34, 0x12, 0x56)),      // + ignored odd tail
      6L -> mk(44, Seq(0x00, 0x80)),            // -32768
      7L -> mk(44, Seq(0xff, 0x7f)),            // 32767
      8L -> mk(44, Seq(0x00, 0x80, 0xff, 0x7f, 0x00, 0x00)))
    val df = cases.toDF("doc_id", "payload")
    def keyed(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val native = keyed(graft.ops.LlmOps.wavProfileOf(df, "doc_id", "payload"))
    val fold = keyed(graft.ops.LlmOps.wavProfileFoldOf(df, "doc_id", "payload"))
    assert(native == fold, s"$native != $fold")
    // spot-check the arithmetic the parity rides on
    assert(native(4L) == Seq(1L, 4660L * 4660L, 4660L))
    assert(native(6L) == Seq(1L, 32768L * 32768L, 32768L))
    assert(native(8L) == Seq(3L,
      32768L * 32768L + 32767L * 32767L, 32768L))
    assert(native(2L) == Seq(0L, 0L, null))
  }

  test("wav_profile evaluates inside whole-stage codegen") {
    // the kernel itself codegens (defineCodeGen). NOTE the declared
    // key's payload SYNTHESIS (wavPayloadSqlExpr) contains lambda
    // transforms, which are CodegenFallback — that Project runs
    // interpreted with or without the kernel; the kernel's win there
    // is the one-pass byte scan replacing the hex-render + per-sample
    // conv chain, not the codegen span. Here a plain binary cast
    // keeps the whole span codegen'd so the kernel's own path is
    // exercised.
    val df = graft.core.Tables.documents(spark, TestSpark.sfSmoke)
      .selectExpr("wav_profile(cast(text as binary)) AS p")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("wav_profile") && l.contains("*(")), plan)
    assert(df.limit(3).collect().length == 3)
  }
}
