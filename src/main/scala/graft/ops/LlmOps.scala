package graft.ops

import graft.core.{Policy => P, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** §2.J LLM-data-pipeline operators over `documents` / `embeddings`.
  *
  * Scale notes (the whole point of these ops at 100 TB):
  *  - dedup is groupBy(key)+min — shuffles one row per distinct key,
  *    never materializes pairs; the hash variant shuffles 32-byte
  *    digests instead of full documents (dedup_hash), which is how you
  *    dedup a 100 TB corpus without moving it;
  *  - tf-idf is two hash aggregations + a broadcast of the tiny
  *    per-word df table — no self-join of the token stream;
  *  - brute-force cosine top-k broadcasts ONE query vector and reduces
  *    via TakeOrderedAndProject (per-partition top-k, O(k) to driver);
  *  - all-pairs similarity is bounded by a selective label filter
  *    before the self-join (the declared-query stand-in for LSH
  *    bucketing; the MinHash/LSH capability tier lives in
  *    graft.text.MinHash and is exercised by tests);
  *  - float32 embeddings are element-wise cast to double BEFORE any
  *    arithmetic on both engines; similarity scores rounded to 4 dp.
  *
  * Spark's `dropDuplicates` keeps an arbitrary row — never used here;
  * the deterministic survivor is always min(doc_id) (SURVEY §2.0.5).
  */
object LlmOps {
  /** Ordered left-fold dot product over double arrays — matches DuckDB
    * list_inner_product / list_sum accumulation (probed bit-equal). */
  private def dot(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")

  private def toDouble(c: String) = expr(s"transform($c, x -> cast(x as double))")

  /** Add-one-smoothed bigram-LM self-perplexity per document (docs
    * with `idCol` < `docLimit` reported) — the reusable form behind
    * text_bigram_perplexity. The vocab²-bounded LM table is
    * DISK-memoized: its plan holds a corpus explode feeding two
    * consumers (the join and the context-count derivation). */
  /** `vocab`: optionally a precomputed 1-row (v: bigint) distinct-word
    * count — the declared key feeds it off the shared docWordGrid
    * artifact (round-18 optimization: countDistinct(w) over the grid
    * is integer-identical to countDistinct over the corpus explode,
    * and the grid is already materialized for the 13-key word-stats
    * family, so the third full-corpus explode in this plan becomes a
    * tiny artifact agg). Default: derived from the corpus (the
    * generic-API path, unchanged). */
  def bigramPerplexityOf(df: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, docLimit: Long,
                         vocab: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val bi = df
      .select(col(idCol).as("_doc"), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("_doc"), explode(expr(
        "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
        .as("bigram"))
    val tf = bi.groupBy("_doc", "bigram").agg(count(lit(1)).as("tf"))
    val cb = graft.core.DiskMemo.persist(
      bi.groupBy("bigram").agg(count(lit(1)).as("cb"))
        .withColumn("w1", expr("split_part(bigram, ' ', 1)")),
      "bigram_lm")
    // context counts DERIVED from the (vocab-bounded) bigram table
    // — c(w1·) = Σ_w2 c(w1,w2) — not a second corpus explode
    val cu = cb.groupBy("w1").agg(sum(col("cb")).as("cu"))
    val vocabDf = vocab.getOrElse(
      df.select(explode(split(col(textCol), " ")).as("word"))
        .agg(countDistinct(col("word")).as("v")))
    tf.join(broadcast(cb.join(cu, "w1").crossJoin(vocabDf)), Seq("bigram"))
      .filter(col("_doc") < docLimit)
      .withColumn("term",
        expr("""-cast(tf as double)
               |  * ln((cast(cb as double) + 1.0)
               |      / (cast(cu as double) + cast(v as double)))""".stripMargin))
      .groupBy("_doc")
      .agg(
        sum(col("tf")).as("n_bigrams"),
        (expr(
          """aggregate(
            |  transform(array_sort(collect_list(struct(bigram, term))), s -> s.term),
            |  0D, (acc, x) -> acc + x)""".stripMargin) /
          sum(col("tf")).cast("double")).as("nll"))
      .select(col("_doc").as(idCol), col("n_bigrams").cast("bigint").as("n_bigrams"),
        round(col("nll"), 4).as("avg_nll"),
        round(exp(col("nll")), 4).as("ppl"))
      .orderBy(idCol)
  }

  /** ONE normalization definition for the whole pipeline family
    * (text_normalize + pipeline_dedup_clean use the same transform by
    * construction): lower -> strip non-[a-z0-9 ] -> collapse space
    * runs -> trim. DuckDB regexp_replace is first-match-only by
    * default; the 'g' flag makes it global like Spark's. */
  private val normCol =
    trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "  +", " "))
  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), '  +', ' ', 'g'))"

  /** Spark-SQL text of the doc_id-seeded REAL RIFF/WAVE payload behind
    * multimodal_bytes_profile — byte-identical to
    * `Multimodal.syntheticWav(doc_id, nFrames = 16·(1 + doc_id % 4))`
    * (MultimodalSpec asserts it and round-trips the bytes through the
    * real decodeWav parser). Header hex is fixed but for the two
    * little-endian length bytes; samples are PCM-16 LE two's
    * complement of (doc_id·7919 + i·1031) % 20000 − 10000. Shared so
    * the gated query and the spec can never drift apart. */
  private[graft] val wavPayloadSqlExpr: String =
    """unhex(concat('52494646',
      |  format_string('%02x', cast(36 + 32 * (1 + doc_id % 4) as int)), '000000',
      |  '57415645666d74201000000001000100401f0000803e000002001000',
      |  '64617461',
      |  format_string('%02x', cast(32 * (1 + doc_id % 4) as int)), '000000',
      |  array_join(transform(sequence(0, cast(16 * (1 + doc_id % 4) as int) - 1),
      |    i -> format_string('%02x%02x',
      |      cast(((doc_id * 7919 + i * 1031) % 20000 - 10000 + 65536) % 65536 % 256 as int),
      |      cast(((doc_id * 7919 + i * 1031) % 20000 - 10000 + 65536) % 65536 div 256 as int))), '')))"""
      .stripMargin

  /** DECODE of the RIFF/WAVE payload above, as pure Spark SQL over a
    * binary `payload` column (round-16 verdict item 2 — the codec
    * tier's decode step, hash-gated): skip the fixed 44-byte header,
    * read each PCM-16 LE frame as two hex pairs (low, high), two's-
    * complement back to a signed int16, as bigint. hex() is bound ONCE
    * per row via the transform(array(x), v -> body) LET-device; the
    * raw u16 binds through a second LET so conv runs once per sample.
    * MultimodalSpec asserts these samples reproduce
    * Multimodal.decodeWav's frames/RMS/peak on the same bytes. */
  private[graft] val wavDecodeSamplesExpr: String =
    """if(octet_length(payload) < 46,
      |  slice(array(cast(0 as bigint)), 1, 0),
      |  element_at(transform(array(hex(payload)), h ->
      |    transform(
      |      transform(sequence(0, cast((octet_length(payload) - 44) div 2 as int) - 1),
      |        i -> cast(conv(substring(h, 91 + 4 * i, 2) ||
      |                       substring(h, 89 + 4 * i, 2), 16, 10) as int)),
      |      u -> cast(u - if(u >= 32768, 65536, 0) as bigint))), 1))"""
      .stripMargin
  // ^ the < 46 guard (header + at least one 2-byte frame): a data-less
  //   44-byte payload would make Spark's sequence(0, -1) produce the
  //   DESCENDING [0, -1] and decode two header bytes as samples, while
  //   DuckDB's range(0, 0) is empty — an engine split on exactly the
  //   degenerate payload (round-16 review); the typed-empty slice
  //   matches DuckDB's empty list on both engines.

  /** Row-local per-item WAV profile — PCM-16 samples reconstructed
    * from the payload bytes (the [[wavDecodeSamplesExpr]] codec), then
    * (n_frames, Σx², peak) as exact int64s. STATELESS select ⇒
    * streaming-safe: this is the live twin of the decode stage of the
    * declared `multimodal_wav_decode` (which feeds it into the
    * label join + 10-row hash agg); StreamingSpec asserts stream ==
    * batch bit-exactly across a micro-batch boundary (round 17 —
    * round-16 verdict item 6). */
  def wavProfileOf(docs: DataFrame, idCol: String,
                   payloadCol: String): DataFrame =
    // NATIVE since round 17: one codegen'd byte scan
    // (graft.functions.WavProfile) replaces the hex-render +
    // per-sample substring/conv HOF chain — 72.7 s at the sf10 stress
    // was pure constant factor. The HOF spelling survives as the
    // parity witness ([[wavProfileFoldOf]], NativeFunctionSpec) and
    // the oracle still recomputes from raw bytes in SQL, so the gate
    // proves the kernel every round. Still a stateless select —
    // streaming-safe, same twin contract.
    docs.select(col(idCol), col(payloadCol).as("payload"))
      .select(col(idCol), expr("wav_profile(payload)").as("_wp"))
      .select(col(idCol),
        col("_wp.n_frames").as("n_frames"),
        col("_wp.sum_sq").as("sum_sq"),
        col("_wp.peak").as("peak"))

  /** The HOF spelling of [[wavProfileOf]] — retained as the
    * registration-free fallback and the parity witness for the native
    * kernel (NativeFunctionSpec asserts equality on the gated corpus
    * plus degenerate payloads). */
  private[graft] def wavProfileFoldOf(docs: DataFrame, idCol: String,
                                      payloadCol: String): DataFrame =
    docs.select(col(idCol), col(payloadCol).as("payload"))
      .select(col(idCol), expr(wavDecodeSamplesExpr).as("smp"))
      .select(col(idCol),
        expr("cast(size(smp) as bigint)").as("n_frames"),
        expr("aggregate(smp, cast(0 as bigint), (acc, x) -> acc + x * x)")
          .as("sum_sq"),
        expr("array_max(transform(smp, x -> abs(x)))").as("peak"))

  /** PII redaction patterns — the Java-regex ∩ RE2 common subset (no
    * backrefs, no lookaround), so Spark and DuckDB match identically.
    * Application order matters and is FIXED (email → IPv4 → phone):
    * each replacement's token cannot be re-matched by a later
    * pattern, and the IPv4 dots keep an address out of the phone
    * pattern's digit/space/hyphen class. */
  private[graft] val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\+?\\d[\\d -]{7,}\\d", "<PHONE>"))

  /** PII REDACTION — the curation pass every shipped-corpus pipeline
    * runs (emails, IPv4 addresses, phone-shaped numbers → typed
    * tokens): per doc, match counts per class + the redacted text.
    * ROW-LOCAL and scan-fused; since round 17 the whole chain runs in
    * ONE native codegen'd expression ([[graft.functions.PiiScan]] —
    * three hand-rolled linear byte scans) instead of six interpreted
    * java.util.regex passes (135.8 s at the sf10 stress, the worst
    * single key on the 100× axis). Bit-parity with the chained regex
    * spelling ([[piiRedactChainOf]]) is asserted in
    * NativeFunctionSpec; the DuckDB oracle still replays the regex
    * chain, so the gate proves the kernel every round. */
  def piiRedactOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        call_function("pii_scan", col(textCol)).as("_pii"))
      .select(col(idCol),
        col("_pii.n_email").as("n_email"),
        col("_pii.n_ip").as("n_ip"),
        col("_pii.n_phone").as("n_phone"),
        substring(col("_pii.redacted"), 1, 80).as("redacted_prefix"))

  /** The chained-regex spelling of [[piiRedactOf]] — six interpreted
    * regex passes. Retained as the parity witness for the native
    * kernel (NativeFunctionSpec) and as the registration-free
    * fallback; not on any declared path. */
  private[graft] def piiRedactChainOf(docs: DataFrame, idCol: String,
                                      textCol: String): DataFrame = {
    val redacted = PiiPatterns.foldLeft(col(textCol)) {
      case (c, (_, re, tok)) => regexp_replace(c, re, tok)
    }
    val counts = PiiPatterns.zipWithIndex.foldLeft(Seq.empty[Column]) {
      // counts run on the PARTIALLY redacted text (classes already
      // replaced), mirroring the replacement chain exactly
      case (acc, ((name, re, _), i)) =>
        val base = PiiPatterns.take(i).foldLeft(col(textCol)) {
          case (c, (_, r, t)) => regexp_replace(c, r, t)
        }
        acc :+ regexp_count(base, lit(re)).cast("bigint").as(s"n_$name")
    }
    docs.select(col(idCol) +: counts :+
      substring(redacted, 1, 80).as("redacted_prefix"): _*)
  }

  val ops: Seq[OpSpec] = Seq(
    OpSpec(
      "dedup_exact",
      (s, d) =>
        T.documents(s, d)
          .groupBy("text")
          .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
          .select("doc_id", "n_dups")
          .orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_dups
             |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin),
    ),
    // Content-hash dedup: shuffle 32-byte digests, not documents.
    OpSpec(
      "dedup_hash",
      (s, d) =>
        T.documents(s, d)
          .groupBy(sha2(col("text"), 256).as("content_hash"))
          .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
          .orderBy("doc_id"),
      Some("""SELECT sha256(text) AS content_hash, min(doc_id) AS doc_id, count(*) AS n_dups
             |FROM documents GROUP BY sha256(text) ORDER BY doc_id""".stripMargin),
    ),
    OpSpec(
      "text_tokenize_count",
      // corpus word totals = Σ cnt over the shared docWordGrid
      // artifact (round 17) — same integers, no corpus re-tokenize
      (s, d) =>
        graft.text.TextOps.docWordGrid(T.documents(s, d))
          .groupBy(col("w").as("word")).agg(sum("cnt").as("n"))
          .orderBy(desc("n"), col("word"))
          .limit(20),
      Some("""SELECT word, count(*) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
             |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin),
    ),
    // Bigrams via positional transform (Spark) ≡ list_zip shift (DuckDB).
    OpSpec(
      "text_ngram",
      (s, d) =>
        T.documents(s, d)
          .select(split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
            .as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("bigram"))
          .limit(20),
      Some("""SELECT p[1] || ' ' || p[2] AS bigram, count(*) AS n
             |FROM (SELECT unnest(list_zip(w, w[2:])) AS p
             |      FROM (SELECT string_split(text, ' ') AS w FROM documents)
             |      WHERE len(w) >= 2)
             |WHERE p[2] IS NOT NULL
             |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""".stripMargin),
    ),
    // N-gram NOVELTY — per document, the fraction of its distinct
    // trigrams whose global FIRST occurrence (min doc_id over the
    // corpus) is this document: the "how much new text does each doc
    // add" curation metric (the dedup family's complement — high
    // containment ⇒ low novelty). Distinct (doc, trigram) pairs are
    // the only corpus-sized shuffle (on the trigram key, exactly
    // text_tfidf's shape); the min-doc table joins back on the same
    // key, so at 100 TB both sides co-partition. All counts — exact;
    // one r4 division out.
    // PII REDACTION end-to-end (the curation pass shipped corpora run
    // before release — C4/Dolma-class scrubbing): email / IPv4 /
    // phone-shaped matches become typed tokens, with per-class match
    // counts. The corpus carries no natural PII, so the gated query
    // SEEDS each doc with a deterministic doc_id-derived contact tail
    // (both engines build the identical string), proving the match +
    // replace + count machinery on text where the answer is known.
    // Patterns live in the Java-regex ∩ RE2 common subset; counts run
    // on the partially-redacted text, mirroring the fixed replacement
    // chain (email → IPv4 → phone) exactly.
    OpSpec(
      "text_pii_redact",
      (s, d) => {
        val seeded = T.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            lit(" reach user"), col("doc_id").cast("string"),
            lit("@example.com or 10.0."),
            (col("doc_id") % 256).cast("string"), lit("."),
            ((col("doc_id") * 7) % 256).cast("string"), lit(" call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
        piiRedactOf(seeded, "doc_id", "text").orderBy("doc_id")
      },
      Some {
        val Seq((_, reE, tokE), (_, reI, tokI), (_, reP, tokP)) = PiiPatterns
        s"""WITH seeded AS (
           |  SELECT doc_id,
           |    text || ' reach user' || doc_id || '@example.com or 10.0.'
           |      || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
           |      || ' call +1-555-' || lpad(cast(doc_id % 10000 as varchar), 4, '0') AS t
           |  FROM documents),
           |r1 AS (SELECT doc_id, t, regexp_replace(t, '$reE', '$tokE', 'g') AS t1 FROM seeded),
           |r2 AS (SELECT doc_id, t, t1, regexp_replace(t1, '$reI', '$tokI', 'g') AS t2 FROM r1),
           |r3 AS (SELECT doc_id, t, t1, t2, regexp_replace(t2, '$reP', '$tokP', 'g') AS t3 FROM r2)
           |SELECT doc_id,
           |  cast(len(regexp_extract_all(t, '$reE')) as bigint) AS n_email,
           |  cast(len(regexp_extract_all(t1, '$reI')) as bigint) AS n_ip,
           |  cast(len(regexp_extract_all(t2, '$reP')) as bigint) AS n_phone,
           |  substr(t3, 1, 80) AS redacted_prefix
           |FROM r3 ORDER BY doc_id""".stripMargin
      },
    ),
    OpSpec(
      "text_ngram_novelty",
      (s, d) => {
        val tg = T.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 3)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(w) - 2),
              |  i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ', element_at(w, i + 2)))""".stripMargin))
            .as("t"))
          .distinct()
        val first = tg.groupBy("t").agg(min(col("doc_id")).as("first_doc"))
        tg.join(first, Seq("t"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tg"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
          .filter(col("doc_id") < 50)
          .select(col("doc_id"), col("n_tg"), col("n_novel"),
            P.r4(col("n_novel").cast("double") / col("n_tg").cast("double")).as("novelty"))
          .orderBy("doc_id")
      },
      Some("""WITH tg AS (
             |  SELECT DISTINCT doc_id,
             |    unnest(list_transform(range(1, len(w) - 1),
             |      i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS t
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
             |  WHERE len(w) >= 3),
             |fst AS (SELECT t, min(doc_id) AS first_doc FROM tg GROUP BY t)
             |SELECT doc_id, count(*) AS n_tg,
             |  cast(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) as bigint) AS n_novel,
             |  round(cast(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) as double)
             |        / cast(count(*) as double), 4) AS novelty
             |FROM tg JOIN fst USING (t)
             |WHERE doc_id < 50
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),
    // tf·idf: two hash aggs + broadcast df join; idf = ln(N/df).
    OpSpec(
      "text_tfidf",
      (s, d) => {
        // shared docWordGrid artifact (round 17): tf IS the grid row;
        // df = one grid row per (doc, word) ⇒ a plain count per word —
        // the countDistinct Expand over the token stream is GONE
        val grid = graft.text.TextOps.docWordGrid(T.documents(s, d))
        val tf = grid.select(col("doc_id"), col("w").as("word"),
          col("cnt").as("tf"))
        val df = grid.groupBy(col("w").as("word"))
          .agg(count(lit(1)).as("df"))
        val n = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
        tf.join(broadcast(df), Seq("word"))
          .crossJoin(broadcast(n))
          .filter(col("doc_id") < 20)
          .select(col("doc_id"), col("word"), col("tf"),
            P.r4(col("tf") * log(col("n_docs").cast("double") / col("df")))
              .as("tfidf"))
          .orderBy("doc_id", "word")
      },
      Some("""WITH tokens AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
             |tf AS (SELECT doc_id, word, count(*) AS tf FROM tokens GROUP BY 1, 2),
             |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents)
             |SELECT doc_id, tf.word AS word, tf,
             |  round(tf * ln(cast(n_docs as double) / df), 4) AS tfidf
             |FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
             |WHERE doc_id < 20 ORDER BY doc_id, word""".stripMargin),
    ),
    // Keyword extraction — top-3 TF-IDF terms per document, the
    // summarization/tagging staple built on the text_tfidf frame: rank
    // over the ROUNDED score (r4 absorbs the engines' ln() last-ulp
    // split) with the word as tie-break — the cutoff is pinned, the
    // sim_cosine_topk device applied to text. Same tf/df shuffles as
    // tfidf; the rank window partitions by doc (bounded frames).
    OpSpec(
      "text_keyword_extract",
      (s, d) => {
        // same shared-grid tf/df derivation as text_tfidf (round 17)
        val grid = graft.text.TextOps.docWordGrid(T.documents(s, d))
        val tf = grid.select(col("doc_id"), col("w").as("word"),
          col("cnt").as("tf"))
        val df = grid.groupBy(col("w").as("word"))
          .agg(count(lit(1)).as("df"))
        val n = T.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val byDoc = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(desc("tfidf"), col("word"))
        tf.join(broadcast(df), Seq("word"))
          .crossJoin(broadcast(n))
          .filter(col("doc_id") < 50)
          .select(col("doc_id"), col("word"),
            P.r4(col("tf") * log(col("n_docs").cast("double") / col("df")))
              .as("tfidf"))
          .withColumn("rk", row_number().over(byDoc).cast("bigint"))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("word"), col("tfidf"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH tokens AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
             |tf AS (SELECT doc_id, word, count(*) AS tf FROM tokens GROUP BY 1, 2),
             |df AS (SELECT word, count(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT doc_id, tf.word AS word,
             |    round(tf * ln(cast(n_docs as double) / df), 4) AS tfidf
             |  FROM tf JOIN df ON tf.word = df.word CROSS JOIN n
             |  WHERE doc_id < 50)
             |SELECT doc_id, rk, word, tfidf
             |FROM (
             |  SELECT doc_id, word, tfidf,
             |    cast(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) as bigint) AS rk
             |  FROM scored)
             |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin),
    ),
    // Language-ID'd corpus stats (lang is the metadata column the
    // driver ships; heuristic n-gram language ID lives in graft.text).
    OpSpec(
      "text_lang_topk",
      (s, d) =>
        T.documents(s, d)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            sum(col("n_chars")).as("total_chars"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
          .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
             |  cast(sum(n_chars) as bigint) AS total_chars,
             |  cast(sum(n_chars) as double) / count(*) AS avg_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    ),
    // Brute-force cosine top-k against the vec_id=0 query vector:
    // broadcast 1 row, TakeOrderedAndProject reduction. Ordering uses
    // the ROUNDED score so the cutoff is identical in both engines.
    OpSpec(
      "sim_cosine_topk",
      (s, d) => {
        val v = T.embeddings(s, d)
          .select(col("vec_id"), toDouble("embedding").as("e"))
          // cosine contract: zero vectors excluded (under ANSI a
          // zero-norm denominator throws — hostile-corpus sweep)
          .filter(graft.vec.VecOps.nonZeroVec("e"))
        val q = v.filter(col("vec_id") === 0)
          .select(col("e").as("qe"))
        v.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"),
            P.r4(dot("e", "qe") /
              (sqrt(dot("e", "e")) * sqrt(dot("qe", "qe")))).as("cos_sim"))
          .orderBy(desc("cos_sim"), col("vec_id"))
          .limit(10)
      },
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
             |q AS (SELECT e AS qe FROM v WHERE vec_id = 0)
             |SELECT vec_id,
             |  round(list_inner_product(e, qe) /
             |        (sqrt(list_inner_product(e, e)) * sqrt(list_inner_product(qe, qe))), 4) AS cos_sim
             |FROM v, q WHERE vec_id <> 0
             |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin),
    ),
    // Pairwise similarity over a label-filtered subset, blocked on the
    // IVF sign-quantizer cell (the same 16-cell coarse quantizer as
    // sim_cosine_ivf): candidates are generated by an EQUI-join on the
    // cell, so pair generation is quadratic only within a cell — at
    // 100 TB the cell is the shuffle/partition key and no all-pairs
    // product ever forms. The label filter is a demo bound, not the
    // safety mechanism.
    OpSpec(
      "sim_pairs_threshold",
      (s, d) => {
        val v = T.embeddings(s, d).filter(col("label") === 3)
          .select(col("vec_id"), expr(graft.vec.VecOps.cellExpr).as("cell"),
            toDouble("embedding").as("e"))
        val a = v.select(col("vec_id").as("id_a"), col("cell"), col("e").as("ea"))
        val b = v.select(col("vec_id").as("id_b"), col("cell"), col("e").as("eb"))
        a.join(b, Seq("cell"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            P.r4(dot("ea", "eb") /
              (sqrt(dot("ea", "ea")) * sqrt(dot("eb", "eb")))).as("cos_sim"))
          .filter(col("cos_sim") >= 0.25)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH v AS (SELECT vec_id, ${graft.vec.VecOps.cellSql} AS cell,
             |            embedding::DOUBLE[] AS e FROM embeddings WHERE label = 3)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_inner_product(a.e, b.e) /
             |        (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))), 4) AS cos_sim
             |FROM v a JOIN v b ON a.cell = b.cell AND a.vec_id < b.vec_id
             |WHERE round(list_inner_product(a.e, b.e) /
             |        (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))), 4) >= 0.25
             |ORDER BY id_a, id_b""".stripMargin),
    ),
    // Embedding-cosine near-dup (the vector-space member of the dedup
    // family): candidate pairs from the same IVF sign-cell, scored
    // exactly, survivor = the lower vec_id. Same cell-blocked shape as
    // sim_pairs_threshold but over ALL vectors.
    //
    // SCALE CONTRACT (round 18, pinned after the full-registry 100×
    // sweep): this key is QUADRATIC BY DESIGN — the 16-cell sign
    // blocking has no knob, so per-cell occupancy is n/16 and
    // within-cell pair mining is Θ(n²/16) (measured 29.6 s → 275.8 s
    // = 9.3× at 3.33× data, BASELINE r17). It stays declared because
    // its oracle is the EXACT all-pairs-within-cell rule — the
    // ground-truth reference the LSH tier's recall is judged against.
    // Its scale twin is dedup_embed_lsh: the same pairs semantics
    // under the ADAPTIVE band family whose bucket count tracks
    // count(*) (bits ≈ log₂(n/16)), which holds per-bucket work
    // constant as n grows. Run THAT at 100 TB; run THIS to certify it
    // at oracle-tractable size. No pair cap is applied here — a cap
    // exact enough to keep the oracle byte-identical would have to be
    // rank-based per cell, which is the LSH family's job, not a
    // bolt-on.
    OpSpec(
      "dedup_embed_cosine",
      (s, d) => {
        // norms precomputed per VECTOR, not per pair — bit-identical to
        // the oracle's per-pair sqrt (same IEEE ops) at 1/3 the flops
        val v = T.embeddings(s, d)
          .select(col("vec_id"), expr(graft.vec.VecOps.cellExpr).as("cell"),
            toDouble("embedding").as("e"))
          .withColumn("nrm", sqrt(dot("e", "e")))
        val a = v.select(col("vec_id").as("keep_id"), col("cell"),
          col("e").as("ea"), col("nrm").as("na"))
        val b = v.select(col("vec_id").as("dup_id"), col("cell"),
          col("e").as("eb"), col("nrm").as("nb"))
        a.join(b, Seq("cell"))
          .filter(col("keep_id") < col("dup_id"))
          .select(col("keep_id"), col("dup_id"),
            P.r4(dot("ea", "eb") / (col("na") * col("nb"))).as("cos_sim"))
          .filter(col("cos_sim") >= 0.4)
          .orderBy("keep_id", "dup_id")
      },
      Some(s"""WITH v AS (SELECT vec_id, ${graft.vec.VecOps.cellSql} AS cell,
             |            embedding::DOUBLE[] AS e FROM embeddings)
             |SELECT a.vec_id AS keep_id, b.vec_id AS dup_id,
             |  round(list_inner_product(a.e, b.e) /
             |        (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))), 4) AS cos_sim
             |FROM v a JOIN v b ON a.cell = b.cell AND a.vec_id < b.vec_id
             |WHERE round(list_inner_product(a.e, b.e) /
             |        (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))), 4) >= 0.4
             |ORDER BY keep_id, dup_id""".stripMargin),
    ),
    // L2-normalize; emit norm + first 4 normalized components.
    OpSpec(
      "embed_norm",
      (s, d) =>
        T.embeddings(s, d)
          .filter(col("vec_id") % 50 === 0)
          .select(col("vec_id"), toDouble("embedding").as("e"))
          .select(col("vec_id"),
            P.r4(sqrt(dot("e", "e"))).as("l2_norm"),
            P.r4(element_at(col("e"), 1) / sqrt(dot("e", "e"))).as("u1"),
            P.r4(element_at(col("e"), 2) / sqrt(dot("e", "e"))).as("u2"),
            P.r4(element_at(col("e"), 3) / sqrt(dot("e", "e"))).as("u3"),
            P.r4(element_at(col("e"), 4) / sqrt(dot("e", "e"))).as("u4"))
          .orderBy("vec_id"),
      Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id % 50 = 0)
             |SELECT vec_id, round(sqrt(list_inner_product(e, e)), 4) AS l2_norm,
             |  round(e[1] / sqrt(list_inner_product(e, e)), 4) AS u1,
             |  round(e[2] / sqrt(list_inner_product(e, e)), 4) AS u2,
             |  round(e[3] / sqrt(list_inner_product(e, e)), 4) AS u3,
             |  round(e[4] / sqrt(list_inner_product(e, e)), 4) AS u4
             |FROM v ORDER BY vec_id""".stripMargin),
    ),
    // Multimodal: text metadata ⋈ vector metadata (doc_id ≡ vec_id).
    OpSpec(
      "multimodal_join",
      (s, d) =>
        T.documents(s, d)
          .join(T.embeddings(s, d), col("doc_id") === col("vec_id"))
          .groupBy("label", "lang")
          .agg(count(lit(1)).as("n"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
          .orderBy("label", "lang"),
      Some("""SELECT label, lang, count(*) AS n,
             |  cast(sum(n_chars) as double) / count(*) AS avg_chars
             |FROM documents JOIN embeddings ON doc_id = vec_id
             |GROUP BY label, lang ORDER BY label, lang""".stripMargin),
    ),
    // Multimodal BYTE tier, hash-gated (round-14 verdict item 5 — the
    // codec tier's one gateable row): per-label payload count, byte
    // volume, distinct count and a sha-256 digest envelope over a
    // BINARY column. No binary ships in test data and DuckDB can't
    // decode media, so the payload is built IN-QUERY from doc_id (the
    // PII-seed device) — and it is a REAL RIFF/WAVE container:
    // byte-identical to Multimodal.syntheticWav(doc_id, nFrames =
    // 16·(1 + doc_id % 4)), fixed 44-byte header with the two
    // little-endian length fields + PCM-16 LE samples
    // ((doc_id·7919 + i·1031) % 20000 − 10000, two's complement), all
    // spelled as hex text both engines unhex identically.
    // MultimodalSpec ties the loop: the same expression's bytes
    // round-trip through the real decodeWav parser. sha runs over the
    // UPPERCASE hex of the payload (this DuckDB's sha256 is
    // varchar-only); row-local build + one label agg — nothing
    // shuffles but (label, 172-byte max payload).
    OpSpec(
      "multimodal_bytes_profile",
      (s, d) => {
        T.documents(s, d)
          .select(col("doc_id"), expr(wavPayloadSqlExpr).as("payload"))
          .join(T.embeddings(s, d).select(col("vec_id"), col("label")),
            col("doc_id") === col("vec_id"))
          .groupBy(col("label").cast("int").as("label"))
          .agg(count(lit(1)).as("n_items"),
            sum(expr("octet_length(payload)")).as("total_bytes"),
            countDistinct(col("payload")).as("n_distinct"),
            min(sha2(hex(col("payload")), 256)).as("min_sha"),
            max(sha2(hex(col("payload")), 256)).as("max_sha"))
          .orderBy("label")
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    unhex('52494646' || printf('%02x', cast(36 + 32 * (1 + doc_id % 4) as int)) || '000000'
             |       || '57415645666d74201000000001000100401f0000803e000002001000'
             |       || '64617461' || printf('%02x', cast(32 * (1 + doc_id % 4) as int)) || '000000'
             |       || array_to_string(list_transform(range(0, cast(16 * (1 + doc_id % 4) as int)),
             |            i -> printf('%02x%02x',
             |              cast(((doc_id * 7919 + i * 1031) % 20000 - 10000 + 65536) % 65536 % 256 as int),
             |              cast(((doc_id * 7919 + i * 1031) % 20000 - 10000 + 65536) % 65536 // 256 as int))), '')) AS payload
             |  FROM documents),
             |j AS (SELECT e.label, p.payload FROM p JOIN embeddings e ON e.vec_id = p.doc_id)
             |SELECT cast(label as int) AS label, count(*) AS n_items,
             |  cast(sum(octet_length(payload)) as bigint) AS total_bytes,
             |  cast(count(DISTINCT payload) as bigint) AS n_distinct,
             |  min(sha256(hex(payload))) AS min_sha, max(sha256(hex(payload))) AS max_sha
             |FROM j GROUP BY label ORDER BY label""".stripMargin),
    ),
    // Multimodal DECODE tier, hash-gated (round-16 verdict item 2):
    // multimodal_bytes_profile proved the CONTAINER (checksums over
    // the bytes); this key proves the CODEC — the PCM-16 samples are
    // reconstructed FROM THE PAYLOAD BYTES (unhex → LE byte pairs →
    // two's-complement int16; never from the generator formula), then
    // per-label frames / RMS / peak off exact int64 Σ/Σ². The DuckDB
    // oracle does the same byte arithmetic on the same bytes (hex-char
    // strpos in place of conv — the same integers). Every aggregate is
    // an exact int64 until the one final divide+sqrt (IEEE-exact on
    // exact operands both engines), so nothing is rounded. Row-local
    // decode fused into the scan; nothing shuffles but (label, three
    // int64s) — at 100 TB the decode cost is embarrassingly parallel
    // and the agg is a 10-row hash agg. MultimodalSpec ties the gated
    // expression to the REAL Multimodal.decodeWav parser on the same
    // bytes.
    OpSpec(
      "multimodal_wav_decode",
      (s, d) => {
        // the decode stage IS wavProfileOf — the streaming twin rides
        // the same transform, so the gate certifies both
        wavProfileOf(
          T.documents(s, d)
            .select(col("doc_id"), expr(wavPayloadSqlExpr).as("payload")),
          "doc_id", "payload")
          .join(T.embeddings(s, d).select(col("vec_id"), col("label")),
            col("doc_id") === col("vec_id"))
          .groupBy(col("label").cast("int").as("label"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("n_frames")).as("total_frames"),
            sum(col("sum_sq")).as("total_sq"),
            sqrt(sum(col("sum_sq")).cast("double") /
              sum(col("n_frames")).cast("double")).as("rms"),
            max(col("peak")).as("peak"))
          .orderBy("label")
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    unhex('52494646' || printf('%02x', cast(36 + 32 * (1 + doc_id % 4) as int)) || '000000'
             |       || '57415645666d74201000000001000100401f0000803e000002001000'
             |       || '64617461' || printf('%02x', cast(32 * (1 + doc_id % 4) as int)) || '000000'
             |       || array_to_string(list_transform(range(0, cast(16 * (1 + doc_id % 4) as int)),
             |            i -> printf('%02x%02x',
             |              cast(((doc_id * 7919 + i * 1031) % 20000 - 10000 + 65536) % 65536 % 256 as int),
             |              cast(((doc_id * 7919 + i * 1031) % 20000 - 10000 + 65536) % 65536 // 256 as int))), '')) AS payload
             |  FROM documents),
             |h AS (SELECT doc_id, hex(payload) AS h,
             |        cast((octet_length(payload) - 44) / 2 as int) AS nf FROM p),
             |s AS (
             |  SELECT doc_id, nf,
             |    list_transform(
             |      list_transform(range(0, nf), i ->
             |          (strpos('0123456789ABCDEF', h[cast(91 + 4 * i as int)]) - 1) * 4096
             |        + (strpos('0123456789ABCDEF', h[cast(92 + 4 * i as int)]) - 1) * 256
             |        + (strpos('0123456789ABCDEF', h[cast(89 + 4 * i as int)]) - 1) * 16
             |        + (strpos('0123456789ABCDEF', h[cast(90 + 4 * i as int)]) - 1)),
             |      u -> cast(u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END as bigint)) AS smp
             |  FROM h),
             |d AS (
             |  SELECT doc_id, cast(nf as bigint) AS nf,
             |    cast(list_sum(list_transform(smp, x -> x * x)) as bigint) AS sq,
             |    cast(list_max(list_transform(smp, x -> abs(x))) as bigint) AS pk
             |  FROM s),
             |j AS (SELECT e.label, d.nf, d.sq, d.pk
             |      FROM d JOIN embeddings e ON e.vec_id = d.doc_id)
             |SELECT cast(label as int) AS label, count(*) AS n_items,
             |  cast(sum(nf) as bigint) AS total_frames,
             |  cast(sum(sq) as bigint) AS total_sq,
             |  sqrt(cast(sum(sq) as double) / cast(sum(nf) as double)) AS rms,
             |  cast(max(pk) as bigint) AS peak
             |FROM j GROUP BY label ORDER BY label""".stripMargin),
    ),
    // Training-pipeline text normalization: lower → strip non-[a-z0-9 ]
    // → collapse runs of spaces → trim. Row-local, codegen'd; emitted as
    // (hash, length) so the verify dump stays slim even on long docs.
    // DuckDB regexp_replace is first-match-only by default — the 'g'
    // flag makes it global like Spark's. Pattern is Java∩RE2-safe.
    OpSpec(
      "text_normalize",
      (s, d) =>
        T.documents(s, d)
          .filter(col("doc_id") < 200)
          .select(col("doc_id"),
            sha2(normCol, 256).as("norm_hash"),
            length(normCol).cast("bigint").as("norm_len"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  sha256($normSql) AS norm_hash,
              |  cast(len($normSql) as bigint) AS norm_len
              |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin),
    ),
    // Unicode NFKC + casefold normalization — the C4/Dolma-class
    // pre-tokenization pass text_normalize lacks (round-14 verdict
    // "missing" item 1): full-width Ａ→a, ligature ﬁ→fi, circled ①→1,
    // ½→1⁄2, combining sequences compose (e+◌́→é). Spark side is the
    // native nfkc_casefold expression (java.text.Normalizer NFKC +
    // Locale.ROOT lower, codegen'd — row-local, scan-fused, zero
    // shuffle at 100 TB). The corpus is ASCII, so the gated query
    // SEEDS each doc with a deterministic doc_id-picked tail from a
    // 6-element non-ASCII alphabet (the text_pii_redact device — both
    // engines build the identical string). DuckDB has only NFC
    // (nfc_normalize), not NFKC — the oracle applies lower∘NFC plus
    // the FINITE compatibility replacements the seeded alphabet can
    // produce (full-width/ligature/circled/fraction), which equals
    // lower∘NFKC exactly on this input by construction; CurationSpec
    // proves the expression itself on combining-char and width-variant
    // fixtures beyond the seeded set.
    OpSpec(
      "text_normalize_nfkc",
      (s, d) => {
        val alpha = array(
          lit("Café"), lit("ＡＢ"), lit("ﬁsh"),
          lit("Ångström"), lit("①②"), lit("½"))
        T.documents(s, d)
          .select(col("doc_id"),
            concat(col("text"), lit(" "),
              element_at(alpha, (col("doc_id") % 6 + 1).cast("int")), lit(" "),
              element_at(alpha, ((col("doc_id") * 7) % 6 + 1).cast("int"))).as("t"))
          .select(col("doc_id"), expr("nfkc_casefold(t)").as("nt"))
          .select(col("doc_id"),
            sha2(col("nt"), 256).as("norm_hash"),
            length(col("nt")).cast("bigint").as("norm_len"),
            expr("right(nt, 24)").as("norm_tail"))
          .orderBy("doc_id")
      },
      // chr() spellings keep this source ASCII: 769 = U+0301 combining
      // acute, 65313/65314 = ＡＢ, 64257 = ﬁ, 778/776 = combining
      // ring/diaeresis, 9312/9313 = ①②, 189 = ½, 65345/65346 = ａｂ
      // (lower() of full-width is full-width), 8260 = ⁄ fraction slash
      Some("""WITH a AS (SELECT ['Cafe' || chr(769), chr(65313) || chr(65314),
             |  chr(64257) || 'sh', 'A' || chr(778) || 'ngstro' || chr(776) || 'm',
             |  chr(9312) || chr(9313), chr(189)] AS al),
             |seeded AS (
             |  SELECT doc_id,
             |    text || ' ' || al[cast(doc_id % 6 as int) + 1]
             |         || ' ' || al[cast((doc_id * 7) % 6 as int) + 1] AS t
             |  FROM documents, a),
             |n AS (SELECT doc_id,
             |  replace(replace(replace(replace(replace(replace(
             |    lower(nfc_normalize(t)),
             |    chr(65345), 'a'), chr(65346), 'b'), chr(64257), 'fi'),
             |    chr(9312), '1'), chr(9313), '2'), chr(189), '1' || chr(8260) || '2') AS nt
             |  FROM seeded)
             |SELECT doc_id, sha256(nt) AS norm_hash,
             |  cast(length(nt) as bigint) AS norm_len,
             |  right(nt, 24) AS norm_tail
             |FROM n ORDER BY doc_id""".stripMargin),
    ),
    // Prefix dedup — the cheap first pass of a crawl pipeline: docs
    // sharing their first 40 chars collapse to the min-doc_id survivor.
    // Shuffles a 40-char key per doc, not the doc.
    OpSpec(
      "dedup_prefix",
      (s, d) =>
        T.documents(s, d)
          .groupBy(substring(col("text"), 1, 40).as("prefix40"))
          .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
          .select("doc_id", "n_dups")
          .orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_dups
             |FROM documents GROUP BY substr(text, 1, 40) ORDER BY doc_id""".stripMargin),
    ),
    // END-TO-END pipeline pass — what a crawl→training-corpus job runs
    // as its first stage, composed from the proven devices in ONE
    // declared plan: normalize (row-local regex) → quality filter
    // (≥ 5 words, row-local) → exact dedup on the sha256 of the
    // NORMALIZED text → per-(lang, source) surviving counts + exact avg
    // length. SINGLE-PASS survivor selection: the dedup groupBy carries
    // the whole survivor row as min(struct(doc_id, …)) — doc_id leads
    // the struct, so the struct-min IS the min-doc_id survivor — which
    // means documents is scanned and regex-normalized EXACTLY ONCE and
    // there is no join-back shuffle (the old plan self-joined the
    // normalized subtree: 2 scans + 2 normalize passes + an extra
    // doc_id shuffle — a genuine 100 TB scale-killer). Two shuffles
    // total: digest dedup, final stats agg. PlanShapeSpec pins the
    // single-scan / single-sha2 shape.
    OpSpec(
      "pipeline_dedup_clean",
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"), normCol.as("ntext"))
          .filter(size(split(col("ntext"), " ")) >= 5)
          .select(col("doc_id"), col("lang"), col("source"),
            sha2(col("ntext"), 256).as("h"),
            length(col("ntext")).cast("bigint").as("nlen"))
          .groupBy("h")
          .agg(min(struct(col("doc_id"), col("lang"), col("source"), col("nlen")))
            .as("s"))
          .groupBy(col("s.lang").as("lang"), col("s.source").as("source"))
          .agg(count(lit(1)).as("n_docs"),
            (sum(col("s.nlen")).cast("double") / count(lit(1))).as("avg_len"))
          .orderBy("lang", "source"),
      // the oracle mirrors the one-pass shape: $normSql appears ONCE
      // (n0 CTE), survivors via min_by on the unique doc_id key
      Some(s"""WITH n0 AS (
              |  SELECT doc_id, lang, source, $normSql AS ntext FROM documents),
             |normed AS (
             |  SELECT doc_id, lang, source, sha256(ntext) AS h,
             |    cast(len(ntext) as bigint) AS nlen
             |  FROM n0 WHERE len(string_split(ntext, ' ')) >= 5),
             |surv AS (
             |  SELECT min_by(lang, doc_id) AS lang,
             |    min_by(source, doc_id) AS source,
             |    min_by(nlen, doc_id) AS nlen
             |  FROM normed GROUP BY h)
             |SELECT lang, source, count(*) AS n_docs,
             |  cast(sum(nlen) as double) / count(*) AS avg_len
             |FROM surv GROUP BY lang, source ORDER BY lang, source""".stripMargin),
    ),
    // df.duplicated() [P core/frame.py] — per-ROW duplicate flag
    // (keep='first' semantics: later copies flagged), the marking form
    // of dedup_exact: window count per text, first occurrence by
    // doc_id unflagged. Shuffles on the text key once.
    OpSpec(
      "dedup_flag_duplicated",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("text").orderBy("doc_id")
        T.documents(s, d)
          .select(col("doc_id"),
            (row_number().over(w) > 1).as("is_dup"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  row_number() OVER (PARTITION BY text ORDER BY doc_id) > 1 AS is_dup
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),
    // df.duplicated(keep=False) [P core/frame.py] — flag EVERY member
    // of a duplicate group (keep='first' above leaves the first copy
    // unflagged; keep=False marks them all — the form a curation audit
    // uses to count total duplicated mass). Plain per-text window
    // count, no ordering needed.
    OpSpec(
      "dedup_flag_dup_all",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("text")
        T.documents(s, d)
          .select(col("doc_id"),
            (count(lit(1)).over(w) > 1).as("is_dup"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  count(*) OVER (PARTITION BY text) > 1 AS is_dup
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),
    // drop_duplicates(keep='last') — the max-key survivor variant of
    // dedup_exact (pandas' keep parameter; SURVEY §2.0.5 pins keep to a
    // deterministic key, never arbitrary-row dropDuplicates).
    OpSpec(
      "dedup_keep_last",
      (s, d) =>
        T.documents(s, d)
          .groupBy("text")
          .agg(max("doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
          .select("doc_id", "n_dups")
          .orderBy("doc_id"),
      Some("""SELECT max(doc_id) AS doc_id, count(*) AS n_dups
             |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin),
    ),
    // Cross-source contamination MATRIX — which source pairs share
    // duplicate content (the question behind every train/test
    // decontamination pass). The key is the 40-char prefix fingerprint
    // (the dedup_prefix device — exact sha256 digests NEVER cross a
    // source boundary in this corpus, so the exact-key matrix would be
    // vacuously empty; the prefix key is what binds, 24 shared keys at
    // sf0.01). Distinct (key, source) rows self-join on the KEY: the
    // shuffle carries 40-char keys, never documents, one row per
    // source after the distinct.
    OpSpec(
      "dedup_contamination_matrix",
      (s, d) => {
        val hs = T.documents(s, d)
          .select(substring(col("text"), 1, 40).as("h"), col("source")).distinct()
        hs.as("a").join(hs.as("b"),
            col("a.h") === col("b.h") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
          .agg(count(lit(1)).as("n_shared"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH hs AS (SELECT DISTINCT substr(text, 1, 40) AS h, source FROM documents)
             |SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
             |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    ),
    // Train/test DECONTAMINATION — drop from the training corpus every
    // document whose prefix fingerprint appears in the held-out source
    // (src0 plays the benchmark), report surviving per-source counts.
    // The benchmark key set is tiny relative to the corpus, so it
    // BROADCASTS into a left_anti hash join: the 100 TB training side
    // is filtered in place, never shuffled.
    OpSpec(
      "text_decontaminate",
      (s, d) => {
        val docs = T.documents(s, d)
        val bench = docs.filter(col("source") === "src0")
          .select(substring(col("text"), 1, 40).as("h")).distinct()
        docs.filter(col("source") =!= "src0")
          .withColumn("h", substring(col("text"), 1, 40))
          .join(broadcast(bench), Seq("h"), "left_anti")
          .groupBy("source")
          .agg(count(lit(1)).as("n_clean"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      },
      Some("""WITH bench AS (SELECT DISTINCT substr(text, 1, 40) AS h
             |               FROM documents WHERE source = 'src0')
             |SELECT source, count(*) AS n_clean,
             |  cast(sum(n_chars) as bigint) AS sum_chars
             |FROM documents
             |WHERE source <> 'src0'
             |  AND substr(text, 1, 40) NOT IN (SELECT h FROM bench)
             |GROUP BY source ORDER BY source""".stripMargin),
    ),
    // The curation DASHBOARD row — per-source corpus health in ONE
    // pass: doc count, exact-duplicate count (docs − distinct digests),
    // quality-rule failures, mean length. Every metric is a conditional
    // aggregate over the same scan, so the whole report is one
    // partial+final hash agg on source — at 100 TB, one shuffle of
    // per-source partials, the cheapest possible corpus report.
    OpSpec(
      "pipeline_curation_report",
      (s, d) =>
        T.documents(s, d)
          .select(col("source"), col("n_chars"),
            sha2(col("text"), 256).as("h"),
            size(split(col("text"), " ")).as("nw"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            (count(lit(1)) - countDistinct(col("h"))).as("n_exact_dups"),
            sum(when(col("nw") < 5 || col("nw") > 200, 1L).otherwise(0L))
              .as("n_len_fail"),
            (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars"))
          .orderBy("source"),
      Some("""SELECT source, count(*) AS n_docs,
             |  count(*) - count(DISTINCT sha256(text)) AS n_exact_dups,
             |  cast(sum(CASE WHEN len(string_split(text, ' ')) < 5
             |                  OR len(string_split(text, ' ')) > 200
             |                THEN 1 ELSE 0 END) as bigint) AS n_len_fail,
             |  cast(sum(n_chars) as double) / count(*) AS mean_chars
             |FROM documents GROUP BY source ORDER BY source""".stripMargin),
    ),
    // Unigram log-prob quality score — the cheapest perplexity proxy a
    // curation pipeline runs: avg over a doc's tokens of ln(corpus
    // unigram probability). Plan: one explode → corpus freq table
    // (tiny — the vocabulary) broadcast back onto (doc, word, tf) →
    // per-doc sum of tf·ln(p). The per-doc sum is over DOUBLES, so it
    // uses the text_lang_entropy ordered-fold device: collect the
    // ≤|vocab| (word, term) structs, array_sort, fold in word order —
    // bit-identical accumulation in both engines, then ONE division
    // and r4. At 100 TB: two hash aggs + a broadcast join; only
    // (doc, word, tf) triples shuffle.
    OpSpec(
      "text_unigram_logprob",
      (s, d) => {
        // shared docWordGrid artifact (round 17): tf = grid rows,
        // corpus unigram freq = Σ cnt per word, total = Σ cnt — the
        // THREE corpus tokenizations this key ran all collapse into
        // grid reads
        val grid = graft.text.TextOps.docWordGrid(T.documents(s, d))
        val tf = grid.select(col("doc_id"), col("w").as("word"),
          col("cnt").as("tf"))
        val freq = grid.groupBy(col("w").as("word"))
          .agg(sum("cnt").as("wc"))
          .crossJoin(broadcast(grid.agg(sum("cnt").as("total"))))
        tf.join(broadcast(freq), Seq("word"))
          .filter(col("doc_id") < 20)
          .withColumn("term",
            col("tf").cast("double") *
              log(col("wc").cast("double") / col("total").cast("double")))
          .groupBy("doc_id")
          .agg(
            sum(col("tf")).as("n_tokens"),
            P.r4(expr(
              """aggregate(
                |  transform(array_sort(collect_list(struct(word, term))), s -> s.term),
                |  0D, (acc, x) -> acc + x)""".stripMargin) /
              sum(col("tf")).cast("double")).as("avg_logprob"))
          .orderBy("doc_id")
      },
      Some("""WITH tokens AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
             |tf AS (SELECT doc_id, word, count(*) AS tf FROM tokens GROUP BY 1, 2),
             |freq AS (SELECT word, count(*) AS wc FROM tokens GROUP BY 1),
             |tot AS (SELECT count(*) AS total FROM tokens),
             |terms AS (
             |  SELECT doc_id, tf.word AS word, tf,
             |    cast(tf as double) * ln(cast(wc as double) / cast(total as double)) AS term
             |  FROM tf JOIN freq ON tf.word = freq.word CROSS JOIN tot
             |  WHERE doc_id < 20)
             |SELECT doc_id, cast(sum(tf) as bigint) AS n_tokens,
             |  round(list_sum(list(term ORDER BY word)) / cast(sum(tf) as double), 4) AS avg_logprob
             |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),
    // BIGRAM-LM PERPLEXITY per document (the unigram op's conditional
    // big brother — the quality score that actually penalizes
    // improbable word ORDER, not just rare words): add-one-smoothed
    // p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V), NLL = −Σ tf·ln p / n, ppl =
    // exp(NLL). The LM tables are the corpus's OWN bigram/context
    // counts (self-perplexity — the novelty/templated-text signal).
    // Counts exact; the per-doc float sum rides the ordered fold
    // keyed by the bigram text (the text_unigram_logprob device);
    // ln/exp on bit-identical doubles. Context counts and V are
    // vocab-bounded (≤ |V|² rows), broadcast back onto the per-doc
    // frame — at 100 TB only the bigram explode is corpus-sized.
    OpSpec(
      "text_bigram_perplexity",
      (s, d) => bigramPerplexityOf(T.documents(s, d), "doc_id", "text", 20L,
        // V from the shared word grid (one artifact agg, not a third
        // corpus explode) — integer-identical countDistinct
        vocab = Some(graft.text.TextOps.docWordGrid(T.documents(s, d))
          .agg(countDistinct(col("w")).as("v")))),
      Some("""WITH bi AS (
             |  SELECT doc_id, p[1] || ' ' || p[2] AS bigram, p[1] AS w1
             |  FROM (SELECT doc_id, unnest(list_zip(w, w[2:])) AS p
             |        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
             |        WHERE len(w) >= 2)
             |  WHERE p[2] IS NOT NULL),
             |tf AS (SELECT doc_id, bigram, count(*) AS tf FROM bi GROUP BY 1, 2),
             |cb AS (SELECT bigram, string_split(bigram, ' ')[1] AS w1, count(*) AS cb
             |       FROM bi GROUP BY 1, 2),
             |cu AS (SELECT w1, cast(sum(cb) as bigint) AS cu FROM cb GROUP BY 1),
             |vocab AS (
             |  SELECT count(DISTINCT word) AS v
             |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)),
             |terms AS (
             |  SELECT doc_id, tf.bigram AS bigram, tf,
             |    -cast(tf as double)
             |      * ln((cast(cb as double) + 1.0)
             |          / (cast(cu as double) + cast(v as double))) AS term
             |  FROM tf JOIN cb ON tf.bigram = cb.bigram
             |  JOIN cu ON cb.w1 = cu.w1 CROSS JOIN vocab
             |  WHERE doc_id < 20),
             |docs AS (
             |  SELECT doc_id, cast(sum(tf) as bigint) AS n_bigrams,
             |    list_sum(list(term ORDER BY bigram)) / cast(sum(tf) as double) AS nll
             |  FROM terms GROUP BY doc_id)
             |SELECT doc_id, n_bigrams, round(nll, 4) AS avg_nll,
             |  round(exp(nll), 4) AS ppl
             |FROM docs ORDER BY doc_id""".stripMargin),
    ),
  )
}
