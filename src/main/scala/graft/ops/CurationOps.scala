package graft.ops

import graft.core.{Tables => T}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between
  * dedup and tokenization: budgeted subsampling, mixture re-weighting,
  * and boilerplate detection (reference scope: SURVEY §2.J's pipeline
  * tier; the ops themselves are the standard curation recipes from the
  * public LLM-data literature — C4/Gopher-style rules live in
  * text/TextOps, these are their corpus-level companions).
  *
  * Scale notes (the 100 TB shapes):
  *  - token-budget sampling is ONE window per source partition — no
  *    self-join, no driver state; the deterministic shuffle key is a
  *    Knuth multiplicative hash so the "random" subset is stable
  *    across engines and reruns (SURVEY §2.0.6 bans RNG). At real
  *    corpus scale (doc_id beyond 2^32) the key becomes
  *    xxhash64(doc_id) — same plan, different key expression;
  *  - temperature re-weighting aggregates to ONE ROW PER LANG before
  *    any double math — the corpus scan is a pure integer token
  *    count, and every double op after it is on a lang-cardinality
  *    frame (exact integer totals, correctly-rounded sqrt, one
  *    ordered fold for the normalizer — all bit-identical across
  *    engines, so the output doubles are emitted UNROUNDED);
  *  - boilerplate detection shuffles one row per 10-word chunk
  *    instance keyed by the chunk text (at 100 TB: by xxhash64 of the
  *    chunk — 8-byte keys, same plan); the per-doc fraction is an
  *    exact rational emitted through the integer half-up round device
  *    (the dedup_survivors_quality lesson: round(double, 4) splits
  *    engines on exact 4-dp half-ties).
  */
object CurationOps {

  private def nTok(c: String) = size(split(col(c), " ")).cast("bigint")

  val ops: Seq[OpSpec] = Seq(
    // Budgeted subsample: keep a deterministic pseudo-random prefix of
    // each source's docs until the per-source token budget is spent.
    // This is how a mixture spec ("at most B tokens from source X")
    // turns into a scan: window-cumsum per source, one shuffle total.
    OpSpec(
      "sample_token_budget",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy("shuf", "doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        T.documents(s, d)
          .select(col("source"), col("doc_id"), nTok("text").as("n_tok"),
            // Knuth multiplicative hash: deterministic, portable
            // (plain int64 arithmetic both engines; doc_id·2654435761
            // stays under 2^63 for any doc_id < 3.4e9 — beyond that,
            // swap in xxhash64(doc_id)).
            ((col("doc_id") * 2654435761L) % 4294967296L).as("shuf"))
          .withColumn("cum_tok", sum(col("n_tok")).over(w))
          .filter(col("cum_tok") <= 1500)
          .select("source", "doc_id", "n_tok", "cum_tok")
          .orderBy("source", "doc_id")
      },
      Some("""WITH t AS (
             |  SELECT source, doc_id,
             |    cast(len(string_split(text, ' ')) as bigint) AS n_tok,
             |    (doc_id * 2654435761) % 4294967296 AS shuf
             |  FROM documents)
             |SELECT source, doc_id, n_tok, cum_tok FROM (
             |  SELECT source, doc_id, n_tok,
             |    cast(sum(n_tok) OVER (PARTITION BY source ORDER BY shuf, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_tok
             |  FROM t)
             |WHERE cum_tok <= 1500 ORDER BY source, doc_id""".stripMargin),
    ),
    // Temperature (α=0.5) mixture re-weighting — the multilingual
    // up/down-sampling recipe: sampled share q_i ∝ p_i^α. α is HALF
    // by design: p^0.5 = sqrt(p) is IEEE-correctly-rounded on both
    // engines, unlike pow's libm-vs-Math.pow last-ulp split, so the
    // whole chain (int token totals → int/int division → sqrt →
    // ordered-fold normalizer → divisions) is bit-identical and the
    // doubles go out unrounded (the agg_entropy rule).
    OpSpec(
      "mix_temperature_weights",
      (s, d) => {
        // ONE corpus scan (the js_divergence plan lesson): everything
        // after the per-lang agg runs as whole-frame windows over the
        // lang-cardinality result — total is an exact integer window
        // sum (order-independent), the sqrt normalizer is an
        // array_sort'd window collect + ordered fold (deterministic
        // regardless of window accumulation order).
        val w = org.apache.spark.sql.expressions.Window
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        T.documents(s, d)
          .select(col("lang"), nTok("text").as("n_tok"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"))
          .withColumn("total_tok", sum("tokens").over(w))
          .withColumn("share", col("tokens") / col("total_tok"))
          .withColumn("sq", sqrt(col("share")))
          .withColumn("sqs", array_sort(collect_list(struct(col("lang"), col("sq"))).over(w)))
          .withColumn("denom",
            expr("aggregate(transform(sqs, x -> x.sq), 0D, (acc, x) -> acc + x)"))
          .select(col("lang"), col("n_docs"), col("tokens"), col("share"),
            (col("sq") / col("denom")).as("target_share"),
            (col("sq") / col("denom") / col("share")).as("weight"))
          .orderBy("lang")
      },
      Some("""WITH c AS (
             |  SELECT lang, cast(count(*) as bigint) AS n_docs,
             |    cast(sum(cast(len(string_split(text, ' ')) as bigint)) as bigint) AS tokens
             |  FROM documents GROUP BY lang),
             |p AS (
             |  SELECT lang, n_docs, tokens,
             |    tokens / cast((SELECT sum(tokens) FROM c) as bigint) AS share,
             |    sqrt(tokens / cast((SELECT sum(tokens) FROM c) as bigint)) AS sq
             |  FROM c),
             |d AS (
             |  SELECT list_reduce(list_prepend(0.0, list(sq ORDER BY lang)),
             |    (acc, x) -> acc + x) AS denom FROM p)
             |SELECT lang, n_docs, tokens, share,
             |  sq / denom AS target_share,
             |  sq / denom / share AS weight
             |FROM p, d ORDER BY lang""".stripMargin),
    ),
    // Boilerplate detection: non-overlapping 10-word chunks hashed
    // corpus-wide; a chunk seen in ≥2 distinct docs is boilerplate and
    // each doc reports its boilerplate fraction (the per-doc signal
    // behind C4-style repeated-line stripping, at chunk granularity
    // because the corpus has no line structure).
    OpSpec(
      "dedup_chunk_boilerplate",
      (s, d) => {
        // ONE scan + ONE explode: aggregate instances to the
        // (chunk, doc) grid first, get each chunk's distinct-doc count
        // as a window count over that grid (cheaper than re-deriving
        // the explode for a frequency join — at 100 TB the explode IS
        // the expensive part), then roll up per doc.
        val grid = T.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .withColumn("nch", expr("size(ws) div 10"))
          .filter(col("nch") >= 1)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, nch - 1), i -> array_join(slice(ws, cast(i*10+1 as int), 10), ' '))"))
            .as("chunk"))
          .groupBy("chunk", "doc_id")
          .agg(count(lit(1)).as("n_inst"))
        grid
          .withColumn("nd", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("chunk")))
          .groupBy("doc_id")
          .agg(sum("n_inst").as("n_chunks"),
            sum(when(col("nd") >= 2, col("n_inst")).otherwise(0L)).as("n_boiler"))
          .select(col("doc_id"), col("n_chunks"), col("n_boiler"),
            // exact half-up round(n_boiler/n_chunks, 4) in integers
            (expr("cast((n_boiler * 20000 + n_chunks) div (2 * n_chunks) as double)")
              / 10000.0).as("boiler_frac"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |e AS (SELECT doc_id, ws, unnest(range(0, len(ws) // 10)) AS i
             |      FROM w WHERE len(ws) // 10 >= 1),
             |ch AS (SELECT doc_id,
             |         array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS chunk FROM e),
             |f AS (SELECT chunk, count(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk),
             |per AS (SELECT c.doc_id, cast(count(*) as bigint) AS n_chunks,
             |          cast(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) as bigint) AS n_boiler
             |        FROM ch c JOIN f USING (chunk) GROUP BY c.doc_id)
             |SELECT doc_id, n_chunks, n_boiler,
             |  cast((n_boiler * 20000 + n_chunks) // (2 * n_chunks) as double) / 10000.0
             |    AS boiler_frac
             |FROM per ORDER BY doc_id""".stripMargin),
    ),
  )
}
