package graft.text

import graft.core.{Tables => T}
import graft.ops.OpSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting
  * (whitespace + regex tokenizers), heuristic language ID, quality
  * scoring, and content fingerprinting (rolling hash).
  *
  * All are row-local or single hash-agg shapes — at 100 TB they fuse
  * into the scan (codegen) or shuffle one row per document. The
  * cross-engine hash primitive is sha256(token) hex-prefix → bigint,
  * identical in Spark (conv base16) and DuckDB (0x-cast).
  */
object TextOps {

  /** Deterministic 32-bit token hash as a column expression. */
  def tokenNumExpr(tok: String): String =
    s"cast(conv(substring(sha2($tok, 256), 1, 8), 16, 10) as bigint)"

  def tokenNumSql(tok: String): String =
    s"('0x' || substr(sha256($tok), 1, 8))::BIGINT"

  /** 60-bit variant (15 hex chars — the widest that stays inside a
    * signed int64 on both engines): feeds the 60-bit SimHash sketch,
    * whose width must grow ~log₂(corpus) to keep the Hamming graph
    * sparse (NearDup.simhashDf). */
  def tokenNumExpr60(tok: String): String =
    s"cast(conv(substring(sha2($tok, 256), 1, 15), 16, 10) as bigint)"

  // ----------------------------------------------------------------
  // Parameterized text-metric API (round 11) — arbitrary columns and
  // thresholds; the graft.api entry points and the thin bodies behind
  // the gated text_* queries. Identifier args that reach generated
  // expression text are validated first (the TvfSql discipline).
  // ----------------------------------------------------------------

  private val identRe = "[A-Za-z_][A-Za-z0-9_]*".r
  private def ident(s: String): String = {
    require(identRe.matches(s), s"not a plain identifier: '$s'")
    s
  }
  private def word(s: String): String = {
    require("[A-Za-z']+".r.matches(s), s"not a plain word: '$s'")
    s
  }

  /** Append whitespace- and regex-tokenizer counts (row-local —
    * scan-fused at 100 TB). */
  def tokenCountsOf(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_ws_tokens", size(split(col(textCol), " ")).cast("bigint"))
      .withColumn("n_re_tokens",
        regexp_count(col(textCol), lit("[a-z]+")).cast("bigint"))

  /** Per-document stopword-ratio language ID: (doc_id, stop_ratio,
    * lang_pred). ROW-LOCAL (round-14 — was explode + hash agg): the
    * stopword count is a size(filter(...)) over the split array, so
    * at 100 TB this fuses into the scan with zero shuffle. Same
    * exact-integer ratio, same output; null-text rows drop like the
    * old explode form. */
  def langIdOf(docs: DataFrame, idCol: String, textCol: String,
               stopwords: Seq[String] = Seq("the", "a"),
               minStopRatio: Double = 0.03): DataFrame = {
    val stopList = stopwords.map(w => s"'${word(w)}'").mkString(", ")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_ws"))
      .filter(col("_ws").isNotNull)
      .select(col("doc_id"),
        size(col("_ws")).cast("bigint").as("n"),
        expr(s"size(filter(_ws, w -> w in ($stopList)))").cast("bigint").as("n_stop"))
      .select(col("doc_id"),
        (col("n_stop").cast("double") / col("n")).as("stop_ratio"),
        when(col("n_stop").cast("double") / col("n") >= minStopRatio, "en")
          .otherwise("und").as("lang_pred"))
  }

  /** Per-document lexical-quality aggregates: (doc_id, n_tokens,
    * distinct_ratio, avg_token_len, quality) — the curation-score
    * formula the survivor-selection queries also use. ROW-LOCAL
    * (round-14 — was explode + hash agg with countDistinct): counts
    * come from size/array_distinct and one length fold over the split
    * array — zero shuffle at any corpus size; same exact integers,
    * same output. */
  def qualityOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_ws"))
      .filter(col("_ws").isNotNull)
      .select(col("doc_id"),
        size(col("_ws")).cast("bigint").as("n_tokens"),
        size(array_distinct(col("_ws"))).cast("bigint").as("n_distinct"),
        expr("aggregate(_ws, 0L, (a, w) -> a + length(w))").as("sum_len"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"),
        (col("sum_len").cast("double") / col("n_tokens")).as("avg_token_len"),
        (col("n_distinct").cast("double") / col("n_tokens") * 0.5 +
          col("sum_len").cast("double") / col("n_tokens") * 0.05).as("quality"))

  /** TRAINED template/spam classifier scores: (doc_id, n_tokens,
    * spam_prob, is_spam) — logistic regression on the text_hash_embed
    * bit-balance squares + length/diversity/stopword signals, weights
    * trained offline by graft.tools.TrainQuality and inlined in
    * [[QualityModel]] (provenance: docs/quality_model.md).
    *
    * Fully ROW-LOCAL (round-14 rewrite of the first explode+groupBy
    * spelling): every per-doc aggregate — token count, distinct
    * count, length sum, stopword count, the 8 signed sha-bit sums —
    * comes from one HOF fold over the split array (sha once per token
    * via the transform-array let-device), so at 100 TB the scorer
    * fuses into the scan with ZERO shuffle — and the same function
    * scores an unbounded STREAM (stateless select; StreamingSpec
    * asserts stream == batch). The score formula evaluates the same
    * exact integers the oracle aggregates relationally. No sort here
    * (streams can't sort) — the gated query adds its own orderBy. */
  def qualityModelScoreOf(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val bitsInit = (0 until 8).map(i => s"'h$i', 0L").mkString(", ")
    val bitsUpd = (0 until 8).map(i =>
      s"'h$i', a.h$i + if((shiftright(b, $i) & 1) = 1, 1L, -1L)").mkString(",\n          ")
    // HOFs never enter codegen, so every per-token expression here is
    // INTERPRETED — the round-16 honest-basis stress caught the
    // original one-fold spelling (sha + a 10-field struct + an
    // array/transform/element_at LET wrapper allocated PER TOKEN) at
    // 205 s for sf10's 27.5 M tokens. Two fixes, same exact integers:
    // the fold is restructured into lean passes (sha once per token in
    // a bare transform, the bit fold over plain ints, sum_len/n_stop
    // as their own cheap folds — 205 → 164 s, the struct overhead),
    // and the per-token hash is the NATIVE sha16_bits kernel
    // (thread-local digest, two bytes read directly — no MessageDigest
    // alloc, no 64-char hex render, no conv re-parse; bit-identical by
    // NativeFunctionSpec). Still row-local and stateless — the
    // streaming twin's contract (stream == batch in StreamingSpec) is
    // untouched.
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_ws"))
      // NULL-text docs drop, matching langIdOf/qualityOf and the
      // oracle's unnest (which emits no rows for a NULL array) — a
      // NULL _ws would otherwise carry all-NULL aggregates downstream.
      .filter(col("_ws").isNotNull)
      .withColumn("_bits", expr("transform(_ws, w -> sha16_bits(w))"))
      .withColumn("_st", expr(
        s"""aggregate(_bits, named_struct($bitsInit),
           |  (a, b) -> named_struct($bitsUpd))""".stripMargin))
      .select(col("doc_id") +:
        size(col("_ws")).cast("bigint").as("n_tokens") +:
        size(array_distinct(col("_ws"))).cast("bigint").as("n_distinct") +:
        expr("aggregate(_ws, cast(0 as bigint), (a, w) -> a + length(w))")
          .as("sum_len") +:
        expr("cast(size(filter(_ws, w -> w in ('the', 'a', 'of', 'to'))) as bigint)")
          .as("n_stop") +:
        (0 until 8).map(i => col(s"_st.h$i").as(s"h$i")): _*)
      .selectExpr("doc_id", "n_tokens",
        s"${QualityModel.probText} AS spam_prob",
        s"${QualityModel.flagText} AS is_spam")
  }

  /** BATCH twin of [[qualityModelScoreOf]] — the explode + hash-agg
    * spelling (the oracle's own relational shape): per-token work runs
    * CODEGEN'D on the exploded column instead of interpreted inside
    * HOFs, and the agg carries 12 small ints per doc (map-side
    * combine). Same exact integers ⇒ same doubles; QualityModelSpec
    * asserts batch ≡ row-local row for row. The row-local form above
    * remains the STREAMING path (stateless select — a stream can't
    * shuffle-agg without a watermark); this one is what the declared
    * key and any 100 TB batch pipeline should run (round-16
    * honest-basis stress at sf10's 27.5 M tokens: 205 s original fold
    * → 127 s restructured+native-sha → 36.6 s this spelling; the
    * remaining cost is dominated by countDistinct's expand). */
  def qualityModelScoreBatchOf(docs: DataFrame, idCol: String,
                               textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_ws"))
      .filter(col("_ws").isNotNull)
      .select(col("doc_id"), explode(col("_ws")).as("w"))
      .withColumn("b", expr("sha16_bits(w)"))
    toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (countDistinct(col("w")).as("n_distinct") +:
          sum(length(col("w")).cast("bigint")).as("sum_len") +:
          sum(when(col("w").isin("the", "a", "of", "to"), 1L).otherwise(0L))
            .as("n_stop") +:
          (0 until 8).map(i =>
            sum(when(expr(s"(shiftright(b, $i) & 1) = 1"), 1L).otherwise(-1L))
              .as(s"h$i"))): _*)
      .selectExpr("doc_id", "n_tokens",
        s"${QualityModel.probText} AS spam_prob",
        s"${QualityModel.flagText} AS is_spam")
  }

  /** EXPAND-FREE twin of [[qualityModelScoreBatchOf]] (round 17;
    * round-16 verdict item 3): mixing `countDistinct(w)` with plain
    * aggregates makes Catalyst rewrite the agg through an Expand that
    * DOUBLES every token row before the shuffle — the dominant
    * residual of the batch spelling at the sf10 stress. This spelling
    * pre-aggregates per (doc, word) first — one extra hash agg, no
    * Expand, and `sha16_bits` runs once per DISTINCT (doc, word)
    * instead of once per token — then folds the per-doc moments as
    * count-weighted sums. Same exact integers ⇒ same doubles;
    * QualityModelSpec asserts all three spellings row-for-row.
    * Measured at sf10 (27.5 M tokens): 36.6 s (countDistinct batch)
    * → see BASELINE round-17 for this spelling's number; the faster
    * one is the declared key. */
  def qualityModelScoreBatch2Of(docs: DataFrame, idCol: String,
                                textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("_ws"))
      .filter(col("_ws").isNotNull)
      .select(col("doc_id"), explode(col("_ws")).as("w"))
    qualityModelScoreFromCounts(
      toks.groupBy("doc_id", "w").agg(count(lit(1)).as("cnt")))
  }

  /** [[qualityModelScoreBatch2Of]]'s post-tokenization core, factored
    * out so the declared key can feed it the SHARED [[docWordGrid]]
    * artifact (round 17) instead of re-tokenizing the corpus: input is
    * any per-(doc_id, w) occurrence-count frame (columns doc_id, w,
    * cnt); the count-weighted sums below are the same exact integers
    * whichever producer built the counts. */
  def qualityModelScoreFromCounts(perWordCnt: DataFrame): DataFrame = {
    val perWord = perWordCnt.select(col("doc_id"), col("w"), col("cnt"))
      .withColumn("b", expr("sha16_bits(w)"))
    perWord.groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        (count(lit(1)).as("n_distinct") +:
          sum(length(col("w")).cast("bigint") * col("cnt")).as("sum_len") +:
          sum(when(col("w").isin("the", "a", "of", "to"), col("cnt")).otherwise(0L))
            .as("n_stop") +:
          (0 until 8).map(i =>
            sum(when(expr(s"(shiftright(b, $i) & 1) = 1"), col("cnt"))
              .otherwise(-col("cnt"))).as(s"h$i"))): _*)
      .selectExpr("doc_id", "n_tokens",
        s"${QualityModel.probText} AS spam_prob",
        s"${QualityModel.flagText} AS is_spam")
  }

  /** THE word-tier tokenization artifact (round 17): ONE disk-memoized
    * per-(doc_id, source, lang, w) occurrence grid over the documents
    * corpus, shared by every declared full-corpus word statistic.
    * Before this, THIRTEEN declared keys each re-ran the identical
    * corpus explode + map-side combine (quality model, ttr, tfidf,
    * keyword extract, unigram logprob, hash embed, tokenize count,
    * zipf, JS divergence, jaccard matrix, dedup_survivors_quality,
    * and the two BPE keys via bpeTokenCountsFromGrid) — the
    * BPE-family lesson (round-16 verdict item 5) applied to the
    * raw-word tier. Consumers derive
    * their frames by projection / re-aggregation of the grid, and
    * every derivation is integer-exact (tf = cnt; df = one row per
    * (doc, w); corpus freq = Σ cnt; per-source counts = Σ cnt within
    * source; distinct (source, w) = projection), so each key's
    * UNCHANGED DuckDB oracle certifies its rewrite every round.
    *
    * source/lang are doc-determined, so carrying them adds ZERO rows —
    * they ride along so per-source/per-lang consumers never join back
    * to the corpus. Cardinality: Σ_doc |vocab(doc)| — bounded by
    * min(total tokens, docs × |vocab|); the artifact is ints + one
    * word per row, far slimmer than the text it replaces re-scanning.
    * At 100 TB this is the tokenize-once materialization a curation
    * pipeline would schedule ahead of its word-statistics stage.
    *
    * DiskMemo contract (same as the span-dedup / BPE artifacts): the
    * build is EAGER at construction — the FIRST consumer pays the
    * tokenize honestly, siblings read the parquet artifact; streaming
    * paths keep their row-local spellings (DiskMemo passes streaming
    * frames through, and no streaming twin routes here). */
  def docWordGrid(docs: DataFrame): DataFrame =
    graft.core.DiskMemo.persist(
      docs.select(col("doc_id"), col("source"), col("lang"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "source", "lang", "w")
        .agg(count(lit(1)).as("cnt")),
      "doc_word_grid")

  /** Append Gopher-style quality-filter flags (Rae et al. 2021 §A1.1):
    * n_words, mean_word_len, has_stop, keep. Row-local HOF folds —
    * no explode, no shuffle; the whole filter fuses into the scan. */
  def gopherFlagsOf(docs: DataFrame, textCol: String,
                    minWords: Long = 5, maxWords: Long = 200,
                    minMeanLen: Double = 2.0, maxMeanLen: Double = 10.0,
                    stopwords: Seq[String] = Seq("the", "a", "of", "to")): DataFrame = {
    val stopList = stopwords.map(w => s"'${word(w)}'").mkString(", ")
    docs
      .withColumn("_w", split(col(textCol), " "))
      .withColumn("n_words", size(col("_w")).cast("bigint"))
      .withColumn("mean_word_len",
        expr("""cast(aggregate(transform(_w, x -> length(x)), 0L, (a, b) -> a + b)
               | as double) / size(_w)""".stripMargin))
      .withColumn("has_stop", expr(s"exists(_w, x -> x in ($stopList))"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) && col("has_stop"))
      .drop("_w")
  }

  /** Append the polynomial rolling-hash content fingerprint,
    * h = (31·h + ord(c)) mod 1e9+7 — row-local left fold. */
  def fingerprintOf(docs: DataFrame, textCol: String,
                    as: String = "fingerprint"): DataFrame =
    docs.withColumn(as,
      expr(s"""aggregate(
              |  transform(split(${ident(textCol)}, ''), c -> cast(ascii(c) as bigint)),
              |  0L, (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin))

  /** Append PII-style scrubbing: the redacted text plus the match
    * count (global replace — row-local, scan-fused). */
  def redactOf(docs: DataFrame, textCol: String,
               pattern: String = "[0-9]+", replacement: String = "<num>",
               as: String = "redacted", countAs: String = "n_redactions"): DataFrame =
    docs
      .withColumn(countAs, regexp_count(col(textCol), lit(pattern)).cast("bigint"))
      .withColumn(as, regexp_replace(col(textCol), pattern, replacement))

  /** Per-group Zipf-law fit: OLS slope of ln(freq) on ln(rank) over
    * each group's word-frequency table → (byCol, n_vocab, zipf_slope).
    * The freq table is VOCAB-sized, so the per-group rank sort never
    * touches corpus rows; rank ties break by word; the four
    * transcendental sums fold rank-sorted (the ordered-fold device). */
  def zipfSlopeOf(docs: DataFrame, byCol: String, textCol: String): DataFrame =
    // every intermediate is _zipf-prefixed so NO user byCol/textCol
    // name can collide (an internal alias `k` once shadowed a group
    // column named k — caught by ApiSpec)
    zipfSlopeFromCounts(
      docs.select(col(byCol), explode(split(col(textCol), " ")).as("_zw"))
        .groupBy(byCol, "_zw").agg(count(lit(1)).as("_zn")),
      byCol)

  /** [[zipfSlopeOf]]'s post-tokenization core: input is any
    * per-(byCol, _zw) count frame (column `_zn`) — the declared key
    * feeds it per-source sums of the shared [[docWordGrid]] artifact
    * (round 17); the generic API above tokenizes inline. */
  def zipfSlopeFromCounts(counts: DataFrame, byCol: String): DataFrame = {
    val freq = counts
      .withColumn("_zrank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(byCol).orderBy(desc("_zn"), col("_zw"))).cast("bigint"))
      .select(col(byCol), col("_zrank"),
        expr("ln(cast(_zrank as double))").as("_zx"),
        expr("ln(cast(_zn as double))").as("_zy"))
    def fold(v: String) = expr(
      s"""aggregate(
         |  transform(array_sort(collect_list(struct(_zrank, $v AS v))), s -> s.v),
         |  0D, (acc, t) -> acc + t)""".stripMargin)
    freq.groupBy(byCol)
      .agg(count(lit(1)).cast("double").as("_zk"),
        fold("_zx").as("_zsx"), fold("_zy").as("_zsy"),
        fold("_zx * _zy").as("_zsxy"), fold("_zx * _zx").as("_zsxx"))
      .select(col(byCol), col("_zk").cast("bigint").as("n_vocab"),
        // null-guarded OLS denominator (Policy.div): a single-word
        // vocabulary yields k·sxx = sx² exactly (one rank ⇒ x = ln 1
        // = 0 on both sides), and an unguarded 0/0 is NaN in Spark vs
        // potentially NULL in DuckDB — the cross-engine divergence the
        // guard device exists to prevent (ADVICE round 11)
        round(graft.core.Policy.div(
          col("_zk") * col("_zsxy") - col("_zsx") * col("_zsy"),
          col("_zk") * col("_zsxx") - col("_zsx") * col("_zsx")), 4).as("zipf_slope"))
  }

  /** Per-group Jensen-Shannon divergence of the group's word mix from
    * the WHOLE frame's word mix → (byCol, js_div, n_words). Support is
    * completed to the full vocabulary through a broadcast groups×vocab
    * grid (absent words keep the q-side term only), so the grid is
    * vocab-sized — never corpus-sized; p/q/m are exact-count
    * divisions; the transcendental terms fold word-sorted. */
  def jsDivergenceOf(docs: DataFrame, byCol: String, textCol: String): DataFrame =
    // _js-prefixed intermediates: collision-proof against user columns
    // (the zipfSlopeOf lesson)
    jsDivergenceFromCounts(
      docs.select(col(byCol), explode(split(col(textCol), " ")).as("_jw"))
        .groupBy(byCol, "_jw").agg(count(lit(1)).as("_jns")),
      byCol)

  /** [[jsDivergenceOf]]'s post-tokenization core: input is any
    * per-(byCol, _jw) count frame (column `_jns`) — the declared key
    * feeds it per-source sums of the shared [[docWordGrid]] artifact
    * (round 17); the generic API above tokenizes inline. */
  def jsDivergenceFromCounts(counts: DataFrame, byCol: String): DataFrame = {
    // ONE corpus-sized aggregation: the global word distribution and
    // the total token count both derive from the per-group counts
    // (vocab×groups rows), so the token stream is scanned ONCE — the
    // first cut recomputed them from the corpus and paid three full
    // scans (plan-audited; at 100 TB that is the whole cost)
    val byGrp = counts
      .withColumn("_jstot", sum(col("_jns")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(byCol)))
      // vocab×groups rows; referenced from 4 subplans below.
      // DISK-memoized, not `.cache()`d: an eviction on the contended
      // bench box re-paid the corpus token scan once per subplan
      // (measured 9× inflation — round-12 verdict item 1); a parquet
      // artifact read cannot be evicted. Streaming frames pass through.
      .transform(f => graft.core.DiskMemo.persist(f, "js_bygrp"))
    val global = byGrp.groupBy("_jw").agg(sum(col("_jns")).as("_jnw"))
      .crossJoin(broadcast(
        byGrp.agg(sum(col("_jns")).as("_jntot"))))
    val grpTot = byGrp.select(byCol, "_jstot").distinct()
    grpTot.crossJoin(broadcast(global))
      .join(byGrp.select(col(byCol), col("_jw"), col("_jns")), Seq(byCol, "_jw"), "left")
      .na.fill(0L, Seq("_jns"))
      .select(col(byCol), col("_jw"),
        (col("_jns").cast("double") / col("_jstot").cast("double")).as("_jp"),
        (col("_jnw").cast("double") / col("_jntot").cast("double")).as("_jq"))
      .withColumn("_jm", (col("_jp") + col("_jq")) / 2)
      .withColumn("_jt", expr(
        "CASE WHEN _jp > 0 THEN 0.5 * _jp * ln(_jp / _jm) ELSE 0D END + 0.5 * _jq * ln(_jq / _jm)"))
      .groupBy(byCol)
      .agg(expr(
        """round(aggregate(
          |  transform(array_sort(collect_list(struct(_jw, _jt))), s -> s._jt),
          |  0D, (acc, x) -> acc + x) + 0D, 4)""".stripMargin).as("js_div"),
        sum(when(col("_jp") > 0, 1L).otherwise(0L)).as("n_words"))
  }

  /** Per-`byCol` lexical diversity (micro-averaged type-token ratio +
    * hapax fraction over exact integer totals) — the reusable form
    * behind text_ttr. */
  def ttrOf(df: DataFrame, byCol: String, idCol: String,
            textCol: String): DataFrame =
    ttrFromCounts(
      df.select(col(byCol), col(idCol).as("_doc"),
          explode(split(col(textCol), " ")).as("w"))
        .groupBy(col(byCol), col("_doc"), col("w"))
        .agg(count(lit(1)).as("c")),
      byCol)

  /** [[ttrOf]]'s post-tokenization core: input is any per-(byCol,
    * _doc, w) occurrence-count frame (column `c`) — the declared key
    * feeds it the shared [[docWordGrid]] artifact (round 17); the
    * generic API above tokenizes inline. Counts-only derivation ⇒
    * identical integers either way. */
  def ttrFromCounts(counts: DataFrame, byCol: String): DataFrame = {
    val perDoc = counts
      .groupBy(byCol, "_doc")
      .agg(
        sum(col("c")).as("n_tok"),
        count(lit(1)).as("n_type"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
    perDoc.groupBy(byCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tok"),
        sum(col("n_type")).as("typ"),
        sum(col("n_hapax")).as("hap"))
      .selectExpr(byCol,
        "cast(n_docs as bigint) AS n_docs",
        "cast(tok as bigint) AS tok_total",
        "cast(typ as bigint) AS type_total",
        "cast(hap as bigint) AS hapax_total",
        "round(cast(typ as double) / nullif(cast(tok as double), 0D), 4) AS ttr_micro",
        "round(cast(hap as double) / nullif(cast(tok as double), 0D), 4) AS hapax_frac")
      .orderBy(byCol)
  }

  val ops: Seq[OpSpec] = Seq(
    // Whitespace tokenizer vs a BPE-ish lowercase-run regex tokenizer.
    OpSpec(
      "text_token_count",
      // thin call into the parameterized API (tokenCountsOf)
      (s, d) =>
        tokenCountsOf(T.documents(s, d).filter(col("doc_id") < 50), "text")
          .select(col("doc_id"), col("n_ws_tokens"), col("n_re_tokens"),
            col("n_chars"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, cast(len(string_split(text, ' ')) as bigint) AS n_ws_tokens,
             |  cast(len(regexp_extract_all(text, '[a-z]+')) as bigint) AS n_re_tokens,
             |  n_chars
             |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin),
    ),
    // Heuristic language ID: function-word ratio (the classic n-gram/
    // stopword signal; the corpus vocabulary makes 'the'/'a' the
    // function words). Ratio is an int/int division — identical IEEE.
    OpSpec(
      "text_lang_id",
      // thin call into the parameterized API (langIdOf, default
      // stopword set + 0.03 cutoff)
      (s, d) =>
        langIdOf(T.documents(s, d).filter(col("doc_id") < 100),
          "doc_id", "text")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, cast(n_stop as double) / n AS stop_ratio,
             |  CASE WHEN cast(n_stop as double) / n >= 0.03 THEN 'en' ELSE 'und' END AS lang_pred
             |FROM (
             |  SELECT doc_id, count(*) AS n,
             |    cast(sum(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END) as bigint) AS n_stop
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |        FROM documents WHERE doc_id < 100)
             |  GROUP BY doc_id)
             |ORDER BY doc_id""".stripMargin),
    ),
    // Label-quality audit: agreement rate between the SHIPPED lang
    // metadata column and the heuristic predictor — per metadata
    // label, how often the classifier concurs. The audit every corpus
    // with vendor labels needs before trusting either side. Reuses the
    // text_lang_id stop-ratio rule verbatim (same formula text, same
    // 0.03 cutoff — the comparison is between an exact rational and a
    // decimal literal, engine-safe); one token agg + one tiny lang agg.
    OpSpec(
      "text_language_consistency",
      (s, d) => {
        val pred = T.documents(s, d)
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n"),
            sum(when(col("w").isin("the", "a"), 1L).otherwise(0L)).as("n_stop"))
          .select(col("lang"),
            when(col("n_stop").cast("double") / col("n") >= 0.03, "en")
              .otherwise("und").as("lang_pred"))
        pred.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("lang") === col("lang_pred"), 1L).otherwise(0L)).as("n_agree"))
          .select(col("lang"), col("n_docs"), col("n_agree"),
            round(col("n_agree").cast("double") / col("n_docs").cast("double"), 4)
              .as("agreement"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |  cast(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END) as bigint) AS n_agree,
             |  round(cast(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END) as double)
             |        / cast(count(*) as double), 4) AS agreement
             |FROM (
             |  SELECT lang,
             |    CASE WHEN cast(n_stop as double) / n >= 0.03 THEN 'en' ELSE 'und' END AS lang_pred
             |  FROM (
             |    SELECT doc_id, lang, count(*) AS n,
             |      cast(sum(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END) as bigint) AS n_stop
             |    FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
             |          FROM documents WHERE doc_id < 100)
             |    GROUP BY doc_id, lang))
             |GROUP BY lang ORDER BY lang""".stripMargin),
    ),
    // Cross-SOURCE vocabulary Jaccard matrix — which corpus slices
    // speak the same language (the source-mix diagnostic next to
    // text_lang_topk). Distinct (source, word) pairs shuffle once on
    // the word key; the pair join is word-blocked (5×5 sources max
    // per word — never an all-pairs product); set sizes broadcast
    // back (≤5 rows). All counts, one r4 division.
    OpSpec(
      "text_jaccard_matrix",
      (s, d) => {
        // distinct (source, word) pairs are a PROJECTION of the shared
        // docWordGrid artifact (round 17) — no corpus re-tokenize
        val vocab = docWordGrid(T.documents(s, d))
          .select(col("source"), col("w"))
          .distinct()
        val sizes = vocab.groupBy("source").agg(count(lit(1)).as("nv"))
        val inter = vocab.select(col("source").as("sa"), col("w"))
          .join(vocab.select(col("source").as("sb"), col("w")), Seq("w"))
          .filter(col("sa") < col("sb"))
          .groupBy("sa", "sb").agg(count(lit(1)).as("ni"))
        inter
          .join(broadcast(sizes.select(col("source").as("sa"), col("nv").as("na"))), Seq("sa"))
          .join(broadcast(sizes.select(col("source").as("sb"), col("nv").as("nb"))), Seq("sb"))
          .select(col("sa"), col("sb"), col("ni"),
            round(col("ni").cast("double") /
              (col("na") + col("nb") - col("ni")).cast("double"), 4).as("jaccard"))
          .orderBy("sa", "sb")
      },
      Some("""WITH vocab AS (
             |  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |sizes AS (SELECT source, count(*) AS nv FROM vocab GROUP BY source),
             |inter AS (
             |  SELECT a.source AS sa, b.source AS sb, count(*) AS ni
             |  FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT sa, sb, ni,
             |  round(cast(ni as double) / cast(x.nv + y.nv - ni as double), 4) AS jaccard
             |FROM inter
             |JOIN sizes x ON x.source = sa
             |JOIN sizes y ON y.source = sb
             |ORDER BY sa, sb""".stripMargin),
    ),
    // Quality score: lexical diversity + mean token length, combined
    // with fixed weights. Pure int-sum arithmetic → identical IEEE.
    OpSpec(
      "text_quality_score",
      // thin call into the parameterized API (qualityOf)
      (s, d) =>
        qualityOf(T.documents(s, d).filter(col("doc_id") < 50),
          "doc_id", "text")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n_tokens,
             |  cast(n_distinct as double) / n_tokens AS distinct_ratio,
             |  cast(sum_len as double) / n_tokens AS avg_token_len,
             |  cast(n_distinct as double) / n_tokens * 0.5 +
             |    cast(sum_len as double) / n_tokens * 0.05 AS quality
             |FROM (
             |  SELECT doc_id, count(*) AS n_tokens, count(DISTINCT w) AS n_distinct,
             |    cast(sum(length(w)) as bigint) AS sum_len
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |        FROM documents WHERE doc_id < 50)
             |  GROUP BY doc_id)
             |ORDER BY doc_id""".stripMargin),
    ),
    // TRAINED document-quality model (the production complement of the
    // fixed-weight text_quality_score): logistic regression over the
    // text_hash_embed bit-balance squares + ln-length + diversity +
    // token-length + stopword ratios, weights trained OFFLINE on a
    // deterministic synthetic fixture (graft.tools.TrainQuality — the
    // TrainPca/TrainBpe inlined-literal pattern; provenance note in
    // docs/quality_model.md; QualityModelSpec re-derives every weight
    // bit-exactly and proves the model separates template/spam from
    // natural text). Both engines aggregate the SAME exact integers
    // and evaluate ONE shared formula text; the sigmoid is r4-rounded
    // and the decision bit is exp-free (z > 0).
    OpSpec(
      "text_quality_model",
      // the EXPAND-FREE batch spelling (round 17: per-(doc, word)
      // pre-agg — no countDistinct Expand, sha16_bits per distinct
      // pair; 19.1 s vs 28.1 s countDistinct-batch at the sf10
      // stress), fed from the SHARED docWordGrid artifact (round 17:
      // the tokenize itself now builds once for the whole word-stats
      // family); the row-local qualityModelScoreOf remains the
      // streaming path and QualityModelSpec pins all three spellings
      // row-for-row
      (s, d) => qualityModelScoreFromCounts(
          docWordGrid(T.documents(s, d)).select("doc_id", "w", "cnt"))
        .orderBy("doc_id"),
      Some(s"""WITH t AS (
              |  SELECT doc_id, w, ('0x' || substr(sha256(w), 1, 4))::INT AS b
              |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              |        FROM documents)),
              |agg AS (
              |  SELECT doc_id, count(*) AS n_tokens,
              |    count(DISTINCT w) AS n_distinct,
              |    cast(sum(length(w)) as bigint) AS sum_len,
              |    cast(sum(CASE WHEN w IN ('the', 'a', 'of', 'to') THEN 1 ELSE 0 END) as bigint) AS n_stop,
              |    ${(0 until 8).map(i =>
                     s"cast(sum(CASE WHEN ((b >> $i) & 1) = 1 THEN 1 ELSE -1 END) as bigint) AS h$i")
                     .mkString(",\n              |    ")}
              |  FROM t GROUP BY doc_id)
              |SELECT doc_id, n_tokens,
              |  ${QualityModel.probText} AS spam_prob,
              |  ${QualityModel.flagText} AS is_spam
              |FROM agg ORDER BY doc_id""".stripMargin),
    ),
    // Polynomial rolling hash over characters, h = (31·h + ord(c)) mod
    // FEATURE-HASHING doc embedding (the hashing trick, Weinberger et
    // al. 2009): 8 signed-sum dimensions per doc — every token
    // contributes ±1 to dim i by bit i of its sha-256 prefix. The
    // text→vector bridge that needs NO trained model: exact integer
    // vectors (bit-identical trivially), one explode + one hash agg
    // keyed on doc_id (map-side combine; at 100 TB the agg carries 8
    // small ints per doc, never the tokens).
    OpSpec(
      "text_hash_embed",
      (s, d) => {
        // shared docWordGrid artifact (round 17): the native
        // sha16_bits kernel (round 16 — same value as
        // cast(conv(substring(sha2(t,256),1,4),16,10) as int) with no
        // digest alloc / hex render / conv re-parse) now runs once per
        // DISTINCT (doc, word) with ±cnt weights instead of once per
        // token — identical integer sums
        val toks = docWordGrid(T.documents(s, d))
          .withColumn("b", expr("sha16_bits(w)"))
        toks.groupBy("doc_id")
          .agg(sum(col("cnt")).as("n_tokens"),
            (0 until 8).map(i =>
              sum(when(expr(s"(shiftright(b, $i) & 1) = 1"), col("cnt"))
                .otherwise(-col("cnt"))).as(s"h$i")): _*)
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id,
              |    ('0x' || substr(sha256(unnest(string_split(text, ' '))), 1, 4))::INT AS b
              |  FROM documents)
              |SELECT doc_id, count(*) AS n_tokens,
              |  ${(0 until 8).map(i =>
                   s"cast(sum(CASE WHEN ((b >> $i) & 1) = 1 THEN 1 ELSE -1 END) as bigint) AS h$i")
                   .mkString(",\n              |  ")}
              |FROM t GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    ),
    // 1e9+7 — the classic content fingerprint, folded left in both
    // engines (Spark aggregate ≡ DuckDB list_reduce with prepended 0).
    OpSpec(
      "text_fingerprint",
      // thin call into the parameterized API (fingerprintOf)
      (s, d) =>
        fingerprintOf(T.documents(s, d).filter(col("doc_id") < 100), "text")
          .select("doc_id", "fingerprint")
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(cast(0 as bigint),
             |      list_transform(string_split(text, ''), c -> cast(ascii(c) as bigint))),
             |    (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
             |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin),
    ),
    // Shannon entropy of the language mix per source — the corpus-
    // diversity metric every curation dashboard shows. The per-lang
    // terms (n/N)·ln(n/N) are transcendental, so exact-decimal sums
    // can't apply; instead both engines fold the terms in the SAME
    // lang order (Spark: aggregate over a lang-sorted collect_list;
    // DuckDB: list_reduce over `list_prepend(0.0, list(t ORDER BY
    // lang))` — a strict left fold from the same 0.0 seed), removing
    // within-engine association nondeterminism; the final r4 then
    // absorbs the engines' ln() last-ulp skew. Round-11 note: the
    // terms are NOT bit-identical across engines (libm ln differs in
    // the last ulp — measured at sf0.01 even under the strict fold),
    // so per §2.0 the r4 is required, not a latent tie-split.
    OpSpec(
      "text_lang_entropy",
      (s, d) => {
        val counts = T.documents(s, d)
          .groupBy("source", "lang").agg(count(lit(1)).as("n"))
          .withColumn("tot", sum(col("n")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("source")))
          .withColumn("t", expr("(n / tot) * ln(n / tot)"))
        // `+ 0D` guard: a single-language source folds to -0.0; IEEE
        // negative zero hashes differently from 0.0 cross-engine.
        counts.groupBy("source")
          .agg(expr(
            """round(-aggregate(
              |  transform(array_sort(collect_list(struct(lang, t))), s -> s.t),
              |  0D, (acc, x) -> acc + x) + 0D, 4)""".stripMargin).as("entropy"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy("source")
      },
      // Root cause of the r5 red row: DuckDB identifiers are
      // case-insensitive, so alias `N` collided with column `n` and
      // `n / N` resolved both sides to `n` (ratio 1, entropy 0).
      // Fix: non-colliding alias `tot`, computed in its own CTE level.
      Some("""WITH c AS (
             |  SELECT source, lang, count(*) AS n
             |  FROM documents GROUP BY source, lang),
             |cn AS (SELECT *, sum(n) OVER (PARTITION BY source) AS tot FROM c),
             |t AS (SELECT source, lang, (n / tot) * ln(n / tot) AS t FROM cn)
             |SELECT source,
             |  round(-list_reduce(list_prepend(0.0, list(t ORDER BY lang)),
             |                     (acc, x) -> acc + x) + 0.0, 4) AS entropy,
             |  cast(count(lang) as bigint) AS n_langs
             |FROM t GROUP BY source ORDER BY source""".stripMargin),
    ),
    // Gopher-style quality-filter flags (Rae et al. 2021 §A1.1, public
    // rule set): word-count bounds, mean-word-length bounds, stopword
    // presence, and the combined keep flag. Every term is a row-local
    // HOF fold over the token list (exact int sums; the one division
    // is int→double, identical IEEE), so at 100 TB the whole filter
    // fuses into the parquet scan — no explode, no shuffle.
    OpSpec(
      "text_gopher_rules",
      // thin call into the parameterized API (gopherFlagsOf, the
      // published Gopher bounds as defaults)
      (s, d) =>
        gopherFlagsOf(T.documents(s, d).filter(col("doc_id") < 100), "text")
          .select("doc_id", "n_words", "mean_word_len", "has_stop", "keep")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n_words, mean_word_len, has_stop,
             |  (n_words BETWEEN 5 AND 200 AND mean_word_len BETWEEN 2.0 AND 10.0
             |   AND has_stop) AS keep
             |FROM (
             |  SELECT doc_id, cast(len(w) as bigint) AS n_words,
             |    cast(list_reduce(list_prepend(cast(0 as bigint),
             |      list_transform(w, x -> cast(length(x) as bigint))),
             |      (a, b) -> a + b) as double) / len(w) AS mean_word_len,
             |    len(list_filter(w, x -> x in ('the', 'a', 'of', 'to'))) > 0 AS has_stop
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w
             |        FROM documents WHERE doc_id < 100))
             |ORDER BY doc_id""".stripMargin),
    ),
    // PII-style scrubbing: mask every digit run and count the masks —
    // the replace-ALL device (Spark regexp_replace is global by
    // default; DuckDB needs the explicit 'g' flag — a real dialect
    // split this row pins). Row-local → scan-fused at 100 TB.
    OpSpec(
      "text_redact",
      // thin call into the parameterized API (redactOf)
      (s, d) =>
        redactOf(T.documents(s, d).filter(col("doc_id") < 100), "text")
          .select(col("doc_id"),
            col("n_redactions").as("n_digit_runs"),
            substring(col("redacted"), 1, 80).as("redacted_prefix"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  cast(len(regexp_extract_all(text, '[0-9]+')) as bigint) AS n_digit_runs,
             |  substr(regexp_replace(text, '[0-9]+', '<num>', 'g'), 1, 80) AS redacted_prefix
             |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin),
    ),
    // Gopher's duplicate-n-gram rule: the fraction of a document's
    // bigrams taken by its single most frequent bigram. Shape: explode
    // → ONE per-(doc, bigram) hash agg → per-doc agg with max(struct)
    // — the argmax carries (count, bigram) so ties break on bigram
    // text deterministically, and there is NO window sort (at 100 TB
    // the per-doc agg is a map-side combine on the doc_id key).
    OpSpec(
      "text_top_ngram_frac",
      (s, d) =>
        T.documents(s, d)
          .filter(col("doc_id") < 50)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(w) - 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
            .as("bg"))
          .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum(col("c")).as("n_bigrams"),
            max(struct(col("c"), col("bg"))).as("m"))
          .select(col("doc_id"), col("n_bigrams"),
            col("m.bg").as("top_bigram"),
            (col("m.c").cast("double") / col("n_bigrams")).as("top_frac"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, cast(n_bigrams as bigint) AS n_bigrams, bg AS top_bigram,
             |  cast(c as double) / cast(n_bigrams as bigint) AS top_frac
             |FROM (
             |  SELECT doc_id, bg, c,
             |    sum(c) OVER (PARTITION BY doc_id) AS n_bigrams,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bg DESC) AS rn
             |  FROM (
             |    SELECT doc_id, p[1] || ' ' || p[2] AS bg, count(*) AS c
             |    FROM (SELECT doc_id, unnest(list_zip(w, w[2:])) AS p
             |          FROM (SELECT doc_id, string_split(text, ' ') AS w
             |                FROM documents WHERE doc_id < 50)
             |          WHERE len(w) >= 2)
             |    WHERE p[2] IS NOT NULL
             |    GROUP BY 1, 2))
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin),
    ),
    // Zipf law fit per source: OLS slope of ln(freq) on ln(rank) over
    // the source's word-frequency table — the classic natural-text
    // diagnostic (synthetic/templated corpora flatten the slope;
    // natural text sits near −1). Shape at 100 TB: the freq table is
    // VOCAB-sized, so ranking is a per-source sort of vocab rows (not
    // corpus rows) and the fold runs over ≤|vocab| terms per source —
    // two hash aggs on the token stream is the only corpus-sized work.
    // Determinism: rank ties broken by word; the four transcendental
    // sums each fold a rank-SORTED term list left-to-right in both
    // engines (the text_lang_entropy device), r4 on the final slope
    // (ln last-ulp skew — see agg_entropy's StrictMath note).
    OpSpec(
      "text_zipf_slope",
      // thin call into the parameterized API (zipfSlopeOf)
      (s, d) => zipfSlopeFromCounts(
        docWordGrid(T.documents(s, d))
          .groupBy("source", "w").agg(sum("cnt").as("_zn"))
          .select(col("source"), col("w").as("_zw"), col("_zn")),
        "source").orderBy("source"),
      Some("""WITH f AS (
             |  SELECT source, w, count(*) AS n
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
             |  GROUP BY 1, 2),
             |r AS (
             |  SELECT source,
             |    cast(row_number() OVER (PARTITION BY source ORDER BY n DESC, w) as bigint) AS rank,
             |    n FROM f),
             |t AS (SELECT source, rank, ln(cast(rank as double)) AS x, ln(cast(n as double)) AS y FROM r),
             |s AS (
             |  SELECT source, cast(count(*) as double) AS k,
             |    list_reduce(list_prepend(0.0, list(x ORDER BY rank)), (a, b) -> a + b) AS sx,
             |    list_reduce(list_prepend(0.0, list(y ORDER BY rank)), (a, b) -> a + b) AS sy,
             |    list_reduce(list_prepend(0.0, list(x * y ORDER BY rank)), (a, b) -> a + b) AS sxy,
             |    list_reduce(list_prepend(0.0, list(x * x ORDER BY rank)), (a, b) -> a + b) AS sxx
             |  FROM t GROUP BY source)
             |SELECT source, cast(k as bigint) AS n_vocab,
             |  round((k * sxy - sx * sy) / nullif(k * sxx - sx * sx, 0), 4) AS zipf_slope
             |FROM s ORDER BY source""".stripMargin),
    ),
    // Jensen-Shannon divergence of each source's word distribution
    // from the global corpus distribution — the corpus-drift /
    // source-mix diagnostic next to text_lang_entropy (0 = identical
    // mix, ln 2 = disjoint). Per-source support is completed to the
    // FULL vocabulary (absent words contribute the q-side term only),
    // so the grid is sources × vocab — vocab-sized, broadcast-built,
    // never corpus-sized; the token stream pays two hash aggs total.
    // Determinism: p, q, m are double divisions of exact counts
    // (identical IEEE); the transcendental term list folds word-sorted
    // in both engines; r4 out.
    OpSpec(
      "text_js_divergence",
      // thin call into the parameterized API (jsDivergenceOf)
      (s, d) => jsDivergenceFromCounts(
        docWordGrid(T.documents(s, d))
          .groupBy("source", "w").agg(sum("cnt").as("_jns"))
          .select(col("source"), col("w").as("_jw"), col("_jns")),
        "source").orderBy("source"),
      Some("""WITH tok AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
             |g AS (SELECT w, count(*) AS nw FROM tok GROUP BY w),
             |gt AS (SELECT count(*) AS ntot FROM tok),
             |bs AS (SELECT source, w, count(*) AS ns FROM tok GROUP BY 1, 2),
             |st AS (SELECT source, sum(ns) AS stot FROM bs GROUP BY source),
             |grid AS (
             |  SELECT st.source, g.w,
             |    cast(coalesce(bs.ns, 0) as double) / cast(st.stot as double) AS p,
             |    cast(g.nw as double) / cast(gt.ntot as double) AS q
             |  FROM st CROSS JOIN g CROSS JOIN gt
             |  LEFT JOIN bs ON bs.source = st.source AND bs.w = g.w),
             |t AS (
             |  SELECT source, w, p,
             |    CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0.0 END
             |      + 0.5 * q * ln(q / ((p + q) / 2)) AS t
             |  FROM grid)
             |SELECT source,
             |  round(list_reduce(list_prepend(0.0, list(t ORDER BY w)), (a, b) -> a + b) + 0.0, 4) AS js_div,
             |  cast(sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) as bigint) AS n_words
             |FROM t GROUP BY source ORDER BY source""".stripMargin),
    ),
    // LEXICAL DIVERSITY per source — type-token ratio + hapax fraction,
    // the repetitiveness signals a curation pipeline reads next to
    // text_top_ngram_frac (low TTR / low hapax = template or spam).
    // MICRO-averaged by design: per-doc type/token/hapax counts are
    // exact integers, per-source totals are exact integer sums
    // (order-free at any corpus size — no per-doc float ratio is ever
    // averaged), and the two ratios are single final divisions. Plan:
    // token explode → (doc, token) hash agg → doc agg → source agg,
    // all partial+final — the explode is the only corpus-linear stage.
    OpSpec(
      "text_ttr",
      // RE-PLAN MEASURED AND REJECTED (round 17): a fully row-local
      // spelling (size/array_distinct + a sorted-neighbors hapax
      // filter, zero token shuffle) lost to this relational form at
      // the sf10 stress — 26.9 s vs 18.9 s — because the hapax HOF is
      // interpreted per element while the (doc, word) pre-agg rides
      // codegen + map-side combine. The r16 lesson cuts both ways:
      // per-token work belongs on exploded codegen'd columns even
      // when that costs a shuffle.
      (s, d) => ttrFromCounts(
        docWordGrid(T.documents(s, d))
          .select(col("source"), col("doc_id").as("_doc"), col("w"),
            col("cnt").as("c")),
        "source"),
      Some("""WITH tok AS (
             |  SELECT source, doc_id, unnest(string_split(text, ' ')) AS w
             |  FROM documents),
             |cell AS (SELECT source, doc_id, w, count(*) AS c
             |         FROM tok GROUP BY 1, 2, 3),
             |perdoc AS (
             |  SELECT source, doc_id, sum(c) AS n_tok, count(*) AS n_type,
             |    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
             |  FROM cell GROUP BY 1, 2)
             |SELECT source, count(*) AS n_docs,
             |  cast(sum(n_tok) as bigint) AS tok_total,
             |  cast(sum(n_type) as bigint) AS type_total,
             |  cast(sum(n_hapax) as bigint) AS hapax_total,
             |  round(cast(sum(n_type) as double) / nullif(cast(sum(n_tok) as double), 0.0), 4) AS ttr_micro,
             |  round(cast(sum(n_hapax) as double) / nullif(cast(sum(n_tok) as double), 0.0), 4) AS hapax_frac
             |FROM perdoc GROUP BY source ORDER BY source""".stripMargin),
    ),
  )
}
