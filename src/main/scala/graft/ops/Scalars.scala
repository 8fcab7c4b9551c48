package graft.ops

import graft.api.syntax._
import graft.core.{Policy => P, Tables => T}
import org.apache.spark.sql.functions._

/** §2.I scalar function families (pandas .str / .dt accessors, numpy
  * ufuncs, json/array handling). One declared query per family, several
  * functions each; all row-local → fused into whole-stage codegen, no
  * shuffle except the final determinism orderBy.
  *
  * Cross-engine pins (SURVEY §7.3.4):
  *  - regex restricted to the Java∩RE2-safe subset (no lookaround,
  *    no backrefs) — probed literally against DuckDB 1.0;
  *  - transcendentals (ln/exp/pow) rounded to 4 dp: libm vs JVM can
  *    differ in the last ulp (sqrt is IEEE-exact, left raw);
  *  - float32 embeddings cast element-wise to double BEFORE any
  *    arithmetic on both engines;
  *  - day-difference via Spark datediff ≡ DuckDB date_diff('day',…)
  *    (midnight-aligned data, verified identical).
  */
object Scalars {
  val ops: Seq[OpSpec] = Seq(
    OpSpec(
      "str_basic",
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey"),
            upper(col("c_name")).as("name_up"),
            lower(col("c_mktsegment")).as("seg_lo"),
            length(col("c_name")).cast("bigint").as("name_len"),
            lpad(col("c_name"), 25, "*").as("name_pad"),
            trim(lit("  padded  ")).as("trimmed"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, upper(c_name) AS name_up, lower(c_mktsegment) AS seg_lo,
             |  cast(length(c_name) as bigint) AS name_len,
             |  lpad(c_name, 25, '*') AS name_pad, trim('  padded  ') AS trimmed
             |FROM customer WHERE c_custkey % 100 = 0 ORDER BY c_custkey""".stripMargin),
    ),
    OpSpec(
      "str_substr_concat",
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey"),
            substring(col("c_name"), 1, 8).as("name_prefix"),
            concat_ws("-", col("c_mktsegment"), col("c_name")).as("seg_name"),
            concat(col("c_name"), lit("!")).as("name_bang"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, substring(c_name, 1, 8) AS name_prefix,
             |  concat_ws('-', c_mktsegment, c_name) AS seg_name,
             |  concat(c_name, '!') AS name_bang
             |FROM customer WHERE c_custkey % 100 = 0 ORDER BY c_custkey""".stripMargin),
    ),
    // LIKE + regex family on part's word-ish columns; pattern subset is
    // identical in Java regex and DuckDB RE2.
    OpSpec(
      "str_like_regex",
      (s, d) =>
        T.part(s, d)
          .filter(col("p_name").like("%e%") && col("p_name").rlike("^[a-z]+ [a-z]+$"))
          .select(col("p_partkey"),
            regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
            regexp_replace(col("p_brand"), "#", "_").as("brand_u"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, regexp_extract(p_type, '^(\w+)', 1) AS type_head,
             |  regexp_replace(p_brand, '#', '_') AS brand_u
             |FROM part
             |WHERE p_name LIKE '%e%' AND regexp_matches(p_name, '^[a-z]+ [a-z]+$')
             |ORDER BY p_partkey""".stripMargin),
    ),
    // split + explode → Generator (the UDTF surface, §2.L).
    OpSpec(
      "str_split_explode",
      (s, d) =>
        T.part(s, d)
          .filter(col("p_partkey") % 200 === 0)
          .select(col("p_partkey"), explode(split(col("p_type"), " ")).as("token"))
          .orderBy("p_partkey", "token"),
      Some("""SELECT p_partkey, unnest(string_split(p_type, ' ')) AS token
             |FROM part WHERE p_partkey % 200 = 0
             |ORDER BY p_partkey, token""".stripMargin),
    ),
    OpSpec(
      "math_funcs",
      (s, d) =>
        T.orders(s, d)
          .filter(col("o_orderkey") % 200 === 0)
          .select(col("o_orderkey"),
            abs(col("o_totalprice") * -1).as("abs_v"),
            sqrt(col("o_totalprice")).as("sqrt_v"),
            P.r4(log(col("o_totalprice"))).as("ln_v"),
            P.r4(exp(col("o_totalprice") / 100000)).as("exp_v"),
            P.r4(pow(col("o_totalprice") / 100000, 2)).as("pow_v"),
            floor(col("o_totalprice") / 100).cast("double").as("floor_v"),
            ceil(col("o_totalprice") / 100).cast("double").as("ceil_v"),
            (col("o_orderkey") % 7).as("mod_v"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, abs(o_totalprice * -1) AS abs_v, sqrt(o_totalprice) AS sqrt_v,
             |  round(ln(o_totalprice), 4) AS ln_v,
             |  round(exp(o_totalprice / 100000), 4) AS exp_v,
             |  round(pow(o_totalprice / 100000, 2), 4) AS pow_v,
             |  floor(o_totalprice / 100) AS floor_v, ceil(o_totalprice / 100) AS ceil_v,
             |  o_orderkey % 7 AS mod_v
             |FROM orders WHERE o_orderkey % 200 = 0 ORDER BY o_orderkey""".stripMargin),
    ),
    OpSpec(
      "date_math",
      (s, d) =>
        T.orders(s, d)
          .filter(col("o_orderkey") % 200 === 0)
          .select(col("o_orderkey"),
            P.tsOut(col("o_orderdate")).as("od"),
            P.tsOut(col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("od_plus7"),
            P.tsOut(date_trunc("month", col("o_orderdate"))).as("od_month"),
            datediff(lit("2000-01-01").cast("timestamp"), col("o_orderdate"))
              .cast("bigint").as("days_to_y2k"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderdate AS od,
             |  o_orderdate + INTERVAL 7 DAY AS od_plus7,
             |  date_trunc('month', o_orderdate) AS od_month,
             |  cast(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') as bigint) AS days_to_y2k
             |FROM orders WHERE o_orderkey % 200 = 0 ORDER BY o_orderkey""".stripMargin),
    ),
    // pandas BDay business-day offset [P tseries/offsets] — the most
    // common pandas-tsdb resample ask previously scoped out. Semantics
    // MEASURED against pandas 2.2.2 (probe in-session): a weekend
    // start rolls BACK to Friday, then n business days are added
    // (Sat+BDay(1) = Sun+BDay(1) = Fri+BDay(1) = Monday). Closed-form
    // integer arithmetic, no calendar table and no iteration:
    //   e = start rolled back to the previous business day,
    //   w = weekday(e)  (Mon=0; Spark weekday ≡ DuckDB isodow−1, the
    //       pinned cross-engine encoding from ts_dt_extract),
    //   shift = ((w+n) div 5)·7 + ((w+n) mod 5) − w   days.
    // Row-local, scan-fused, zero shuffle — the 100 TB-safe form of a
    // "next business day" column (holidays would come from a
    // broadcast calendar join at the same spot).
    OpSpec(
      "date_math_bday",
      (s, d) =>
        T.orders(s, d)
          .filter(col("o_orderkey") % 200 === 0)
          .withColumn("e", expr(
            """o_orderdate - (CASE WHEN weekday(o_orderdate) = 5 THEN 1
              |  WHEN weekday(o_orderdate) = 6 THEN 2 ELSE 0 END) * INTERVAL 1 DAY""".stripMargin))
          .select(col("o_orderkey"),
            P.tsOut(col("o_orderdate")).as("od"),
            P.tsOut(expr(
              """e + (((weekday(e) + 3) div 5) * 7 + ((weekday(e) + 3) % 5)
                |  - weekday(e)) * INTERVAL 1 DAY""".stripMargin)).as("od_bday3"),
            P.tsOut(expr(
              """e + (((weekday(e) + 1) div 5) * 7 + ((weekday(e) + 1) % 5)
                |  - weekday(e)) * INTERVAL 1 DAY""".stripMargin)).as("od_bday1"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderdate AS od,
             |  e + (((w + 3) // 5) * 7 + ((w + 3) % 5) - w) * INTERVAL 1 DAY AS od_bday3,
             |  e + (((w + 1) // 5) * 7 + ((w + 1) % 5) - w) * INTERVAL 1 DAY AS od_bday1
             |FROM (
             |  SELECT o_orderkey, o_orderdate, e, isodow(e) - 1 AS w
             |  FROM (
             |    SELECT o_orderkey, o_orderdate,
             |      o_orderdate - (CASE WHEN isodow(o_orderdate) = 6 THEN 1
             |        WHEN isodow(o_orderdate) = 7 THEN 2 ELSE 0 END) * INTERVAL 1 DAY AS e
             |    FROM orders WHERE o_orderkey % 200 = 0))
             |ORDER BY o_orderkey""".stripMargin),
    ),
    // props is JSON text '{"k": <int>}' — extract + cast (pandas
    // json_normalize analogue).
    OpSpec(
      "json_get",
      (s, d) =>
        T.events(s, d)
          .filter(col("user_id") < 3)
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("bigint").as("k"))
          .orderBy("event_id"),
      Some("""SELECT event_id, cast(json_extract_string(props, '$.k') as bigint) AS k
             |FROM events WHERE user_id < 3 ORDER BY event_id""".stripMargin),
    ),
    // Array surface on the embeddings: size / index / max / ordered
    // fold-sum, all on element-wise double-cast values (float32 rule).
    OpSpec(
      "arr_ops",
      (s, d) =>
        T.embeddings(s, d)
          .filter(col("vec_id") % 50 === 0)
          .select(col("vec_id"),
            size(col("embedding")).cast("bigint").as("dim"),
            element_at(col("embedding"), 1).cast("double").as("first_elem"),
            array_max(expr("transform(embedding, x -> cast(x as double))")).as("max_elem"),
            expr("aggregate(transform(embedding, x -> cast(x as double)), 0D, (acc, x) -> acc + x)")
              .as("sum_elems"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id, cast(len(embedding) as bigint) AS dim,
             |  embedding[1]::DOUBLE AS first_elem,
             |  list_max(embedding::DOUBLE[]) AS max_elem,
             |  list_sum(embedding::DOUBLE[]) AS sum_elems
             |FROM embeddings WHERE vec_id % 50 = 0 ORDER BY vec_id""".stripMargin),
    ),
    // collect_list is unordered in Spark — always sort_array (rule
    // 2.0.5). Output is the joined string, not the raw array: the
    // driver's hasher sees scalar cells (array-valued cells are the one
    // pandas dtype with undefined hashing) while the op surface —
    // grouped collection with deterministic order — is identical.
    OpSpec(
      "arr_collect",
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 100 === 0)
          .groupBy("c_nationkey")
          .agg(
            concat_ws(",", sort_array(collect_list(col("c_name")))).as("names"),
            count(lit(1)).as("n"))
          .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, string_agg(c_name, ',' ORDER BY c_name) AS names, count(*) AS n
             |FROM customer WHERE c_custkey % 100 = 0
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
    ),
    // Fuzzy string matching (edit distance ≤ 3 name pairs) — the
    // string-similarity half of near-dup; both engines implement plain
    // Levenshtein. Candidates come from a length-band EQUI-join: dist ≤ 3
    // forces |len(a) − len(b)| ≤ 3, so with band width 4 a matching pair's
    // bands differ by at most 1 — exploding one side into its band ±1
    // covers every true pair exactly once (each pair shares exactly one
    // of the three exploded band values). The oracle stays the all-pairs
    // SQL, so the hash gate proves the blocking is lossless. No
    // nested-loop product anywhere (asserted in PlanShapeSpec).
    //
    // SCALE CONTRACT (round 18, found by the sf3→sf10 receipt once
    // part shipped in the stress fixtures): the %50 sample grows
    // LINEARLY with the corpus and short names span only ~3 length
    // bands, so candidate pairs grow QUADRATICALLY in the sample —
    // the same exact-pairwise shape as dedup_embed_cosine, kept for
    // the same reason (the oracle is the exact all-pairs rule; the
    // blocking is lossless, not lossy). At 100 TB you do not
    // Levenshtein-join whole corpora: bound one side (a dimension
    // lexicon / a fixed sample), or use the declared SCALABLE near-dup
    // tier (dedup_ngram_jaccard / minhash banding) whose candidate
    // mass tracks real similarity instead of length.
    OpSpec(
      "str_fuzzy_match",
      (s, d) => {
        val names = T.part(s, d).filter(col("p_partkey") % 50 === 0)
          .select(col("p_partkey"), col("p_name"),
            (length(col("p_name")).cast("bigint") / 4).cast("bigint").as("band"))
        val a = names.select(col("p_partkey").as("key_a"), col("p_name").as("name_a"),
          explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"))
        val b = names.select(col("p_partkey").as("key_b"), col("p_name").as("name_b"),
          col("band"))
        a.join(b, Seq("band"))
          .filter(col("key_a") < col("key_b"))
          // bounded form: levenshtein(l, r, k) runs the k-banded DP and
          // early-exits with -1 past the threshold — O(k·n) per pair vs
          // the full O(n·m) table; for kept pairs (≥ 0) it IS the true
          // distance, so the hash vs the oracle's unbounded form holds
          .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 3).cast("bigint"))
          .filter(col("dist") >= 0)
          .select("key_a", "key_b", "name_a", "name_b", "dist")
          .orderBy("key_a", "key_b")
      },
      Some("""SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
             |  a.p_name AS name_a, b.p_name AS name_b,
             |  cast(levenshtein(a.p_name, b.p_name) as bigint) AS dist
             |FROM (SELECT * FROM part WHERE p_partkey % 50 = 0) a
             |JOIN (SELECT * FROM part WHERE p_partkey % 50 = 0) b
             |  ON a.p_partkey < b.p_partkey
             |WHERE levenshtein(a.p_name, b.p_name) <= 3
             |ORDER BY key_a, key_b""".stripMargin),
    ),
    // pandas melt(): wide → long (Spark Dataset.unpivot ≡ DuckDB UNPIVOT).
    OpSpec(
      "reshape_melt",
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey"), col("c_acctbal"),
            col("c_nationkey").cast("double").as("nk"))
          .unpivot(Array(col("c_custkey")),
            Array(col("c_acctbal"), col("nk")), "metric", "val")
          .orderBy("c_custkey", "metric"),
      Some("""SELECT * FROM (
             |  SELECT c_custkey, c_acctbal, cast(c_nationkey as double) AS nk
             |  FROM customer WHERE c_custkey % 100 = 0)
             |UNPIVOT (val FOR metric IN (c_acctbal, nk))
             |ORDER BY c_custkey, metric""".stripMargin),
    ),
    // pandas stack() [P core/reshape/reshape.py] — wide → long with
    // the column labels becoming an index level. Differs from melt in
    // ONE semantic: stack DROPS NA cells by default (dropna=True),
    // melt keeps them. Demonstrated on a manufactured NULL (negative
    // acctbals blanked): those cells vanish from the long output in
    // both engines (explicit IS NOT NULL on the Spark side; DuckDB
    // UNPIVOT excludes NULLs by default — spelled anyway for parity).
    // Row-local projection + explode shape — scan-fused, no shuffle.
    OpSpec(
      "reshape_stack",
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey"),
            when(col("c_acctbal") >= 0, col("c_acctbal")).as("acctbal_pos"),
            col("c_nationkey").cast("double").as("nk"))
          .unpivot(Array(col("c_custkey")),
            Array(col("acctbal_pos"), col("nk")), "level", "value")
          .filter(col("value").isNotNull) // stack's dropna=True default
          .orderBy("c_custkey", "level"),
      Some("""SELECT * FROM (
             |  SELECT * FROM (
             |    SELECT c_custkey,
             |      CASE WHEN c_acctbal >= 0 THEN c_acctbal END AS acctbal_pos,
             |      cast(c_nationkey as double) AS nk
             |    FROM customer WHERE c_custkey % 100 = 0)
             |  UNPIVOT (value FOR level IN (acctbal_pos, nk)))
             |WHERE value IS NOT NULL
             |ORDER BY c_custkey, level""".stripMargin),
    ),
    // pandas unstack(fill_value=0) [P core/reshape/reshape.py] — the
    // inverse: an index level pivots OUT into columns. fill_value=0
    // is pinned (rather than the NULL default) so the output dtype is
    // plain int64 at EVERY corpus size — a NULL cell would float-ify
    // the pandas read on one engine side and dtype-split the gate
    // (the same trap as decimal sums). Level values are enumerated
    // literals (the o_orderpriority domain), so the output schema is
    // static — the same contract as pandas, where unstack columns
    // come from the observed level values. One hash agg on the group
    // key; at 100 TB this is a map-side partial + one shuffle of
    // 5-column partials.
    OpSpec(
      "reshape_unstack",
      (s, d) => {
        val long = T.orders(s, d)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
        val prios = Seq("1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high",
          "3-MEDIUM" -> "p3_medium", "4-NOT SPECIFIED" -> "p4_not_specified",
          "5-LOW" -> "p5_low")
        long.groupBy("o_orderstatus")
          .agg(
            coalesce(sum(when(col("o_orderpriority") === prios.head._1, col("n"))), lit(0L))
              .as(prios.head._2),
            prios.tail.map { case (v, a) =>
              coalesce(sum(when(col("o_orderpriority") === v, col("n"))), lit(0L)).as(a)
            }: _*)
          .orderBy("o_orderstatus")
      },
      Some {
        val prios = Seq("1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high",
          "3-MEDIUM" -> "p3_medium", "4-NOT SPECIFIED" -> "p4_not_specified",
          "5-LOW" -> "p5_low")
        val cols = prios.map { case (v, a) =>
          s"cast(coalesce(sum(CASE WHEN o_orderpriority = '$v' THEN n END), 0) as bigint) AS $a"
        }.mkString(",\n  ")
        s"""SELECT o_orderstatus,
           |  $cols
           |FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS n
           |      FROM orders GROUP BY 1, 2)
           |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
      },
    ),
    // pandas get_dummies(): one-hot indicator projection.
    OpSpec(
      "reshape_dummies",
      // thin call into graft.api (getDummies, explicit category list)
      (s, d) => {
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        T.customer(s, d)
          .filter(col("c_custkey") % 100 === 0)
          .getDummies("c_mktsegment", segs, prefix = "seg")
          .select("c_custkey", segs.map(v => s"seg_${v.toLowerCase}"): _*)
          .orderBy("c_custkey")
      },
      Some {
        val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        val inds = segs.map(v =>
          s"cast(CASE WHEN c_mktsegment = '$v' THEN 1 ELSE 0 END as bigint) AS seg_${v.toLowerCase}")
          .mkString(", ")
        s"""SELECT c_custkey, $inds
           |FROM customer WHERE c_custkey % 100 = 0 ORDER BY c_custkey""".stripMargin
      },
    ),
    // Series.map / replace(dict) — dictionary value mapping with a
    // default: a CASE chain (shared text, codegen'd; a broadcast map
    // join at dictionary scale).
    OpSpec(
      "str_map_replace",
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey"), col("c_mktsegment"),
            when(col("c_mktsegment") === "AUTOMOBILE", "AUTO")
              .when(col("c_mktsegment") === "BUILDING", "BLDG")
              .when(col("c_mktsegment") === "MACHINERY", "MACH")
              .otherwise("OTHER").as("seg_code"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_mktsegment,
             |  CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'AUTO'
             |       WHEN c_mktsegment = 'BUILDING' THEN 'BLDG'
             |       WHEN c_mktsegment = 'MACHINERY' THEN 'MACH'
             |       ELSE 'OTHER' END AS seg_code
             |FROM customer WHERE c_custkey % 100 = 0 ORDER BY c_custkey""".stripMargin),
    ),
    // groupby string concatenation (pandas ' '.join per group) — the
    // §2.0.5 ordered form: sort the collected list, then join. One
    // ObjectHashAggregate; group sizes bounded by the filter here, by
    // the key's cardinality contract at scale.
    OpSpec(
      "agg_string_agg",
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") < 60)
          .groupBy("c_mktsegment")
          .agg(concat_ws(",",
            array_sort(collect_list(col("c_custkey").cast("string")))).as("keys_csv"))
          .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment,
             |  string_agg(cast(c_custkey as varchar), ',' ORDER BY cast(c_custkey as varchar)) AS keys_csv
             |FROM customer WHERE c_custkey < 60
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
    ),
    // explode with position (pandas explode + reset_index / enumerate):
    // Spark posexplode (0-based) ≡ DuckDB parallel unnest +
    // generate_subscripts (1-based, −1). Row-local fan-out, no shuffle.
    OpSpec(
      "arr_posexplode",
      (s, d) =>
        T.documents(s, d)
          .filter(col("doc_id") < 20)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .filter(col("pos") < 5)
          .select(col("doc_id"), col("pos").cast("bigint").as("pos"), col("tok"))
          .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, pos, tok FROM (
             |  SELECT doc_id,
             |    generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             |    unnest(string_split(text, ' ')) AS tok
             |  FROM documents WHERE doc_id < 20)
             |WHERE pos < 5 ORDER BY doc_id, pos""".stripMargin),
    ),
    // pandas multi-column explode — df.explode(['a','b']) (pandas
    // 1.3+): two ALIGNED list columns unnest in lockstep, one output
    // row per position with both elements side by side. Spark:
    // arrays_zip pairs the arrays into one struct array, a single
    // explode preserves alignment (two independent explodes would
    // cross-product). DuckDB: parallel unnest of sibling lists zips
    // positionally (probed). Row-local generator — scan-fused, no
    // shuffle; the second list here is derived (per-token length) so
    // alignment is by construction.
    OpSpec(
      "arr_explode_zip",
      (s, d) =>
        T.documents(s, d)
          .filter(col("doc_id") < 20)
          .select(col("doc_id"),
            explode(arrays_zip(
              split(col("text"), " ").as("tok"),
              expr("transform(split(text, ' '), x -> cast(length(x) as bigint))").as("tok_len")))
              .as("z"))
          .select(col("doc_id"), col("z.tok").as("tok"), col("z.tok_len").as("tok_len"))
          .filter(col("tok_len") >= 6)
          .orderBy("doc_id", "tok"),
      Some("""SELECT doc_id, tok, tok_len FROM (
             |  SELECT doc_id,
             |    unnest(string_split(text, ' ')) AS tok,
             |    unnest(list_transform(string_split(text, ' '),
             |           x -> cast(length(x) as bigint))) AS tok_len
             |  FROM documents WHERE doc_id < 20)
             |WHERE tok_len >= 6 ORDER BY doc_id, tok""".stripMargin),
    ),
    // pandas clip(lower, upper) / numpy clip — least∘greatest, row-local,
    // no value arithmetic so no float policy needed.
    OpSpec(
      "math_clip",
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey"), col("c_acctbal"),
            least(greatest(col("c_acctbal"), lit(0.0)), lit(5000.0)).as("bal_clip"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_acctbal,
             |  least(greatest(c_acctbal, 0.0), 5000.0) AS bal_clip
             |FROM customer WHERE c_custkey % 100 = 0 ORDER BY c_custkey""".stripMargin),
    ),
    // pandas str.pad/zfill + str.extract: lpad and a capture-group
    // regexp_extract (Java∩RE2-safe pattern — digits only).
    OpSpec(
      "str_pad_extract",
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 100 === 0)
          .select(col("c_custkey"),
            lpad(col("c_custkey").cast("string"), 10, "0").as("key_z10"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
            rpad(col("c_mktsegment"), 12, ".").as("seg_pad"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  lpad(cast(c_custkey as varchar), 10, '0') AS key_z10,
             |  regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
             |  rpad(c_mktsegment, 12, '.') AS seg_pad
             |FROM customer WHERE c_custkey % 100 = 0 ORDER BY c_custkey""".stripMargin),
    ),
    // pd.qcut(x, 4) — quartile bucketing. ntile() splits the ordered
    // partition into equal-count buckets exactly like qcut on distinct
    // values; the (c_acctbal, c_custkey) order is total, so bucket
    // assignment is deterministic in both engines. At 100 TB the same
    // result comes from approx quantile boundaries + a broadcast range
    // lookup; the rank-based form here is the exact-semantics contract.
    OpSpec(
      "reshape_qcut",
      // thin call into graft.api (qcut, exact global-rank form)
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 10 === 0)
          .qcut("c_acctbal", 4, tieCol = "c_custkey", as = "bal_quartile")
          .select("c_custkey", "c_acctbal", "bal_quartile")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_acctbal,
             |  ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS bal_quartile
             |FROM customer WHERE c_custkey % 10 = 0 ORDER BY c_custkey""".stripMargin),
    ),
    // The SCALE form of qcut: quantile BOUNDARIES from a tiny
    // aggregate, broadcast back, bucket = a 3-compare range lookup —
    // map-side except the one boundary agg, vs reshape_qcut's global
    // ntile sort (one partition at the limit). At 100 TB swap
    // percentile for approx_percentile: identical plan shape, bounded
    // memory; exact percentile is used HERE so the DuckDB oracle
    // (quantile_cont — the same p·(n−1) linear interpolation) agrees.
    // Tie safety: a boundary is either exactly a data value (both
    // engines pick the element bit-identically, no arithmetic) or
    // strictly between two data values ≥ 0.01 apart, so a last-ulp
    // interpolation skew can never flip an x > b comparison. Buckets
    // are right-closed (x = boundary stays in the lower bucket), the
    // pandas qcut convention.
    OpSpec(
      "reshape_qcut_approx",
      // thin call into graft.api (qcutApprox, the broadcast-boundary
      // scale form)
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 10 === 0)
          .select("c_custkey", "c_acctbal")
          .qcutApprox("c_acctbal", 4, as = "bal_quartile")
          .orderBy("c_custkey"),
      Some("""WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 10 = 0),
             |b AS (SELECT quantile_cont(c_acctbal, 0.25) AS b1,
             |             quantile_cont(c_acctbal, 0.5)  AS b2,
             |             quantile_cont(c_acctbal, 0.75) AS b3 FROM c)
             |SELECT c_custkey, c_acctbal,
             |  1 + cast(c_acctbal > b1 as bigint) + cast(c_acctbal > b2 as bigint)
             |    + cast(c_acctbal > b3 as bigint) AS bal_quartile
             |FROM c, b ORDER BY c_custkey""".stripMargin),
    ),
    // pd.cut(x, bins=[...], labels=[...]) [P core/reshape/tile.py] —
    // EXPLICIT-edge binning (qcut's fixed-boundary sibling): pandas
    // right-closed intervals (lo, hi], values outside the edges → NULL.
    // ONE CASE-ladder text shared verbatim by both engines — row-local,
    // codegen'd, zero shuffles; at 100 TB this is a free map-side
    // projection (vs qcut's global rank).
    OpSpec(
      "reshape_cut",
      // thin call into graft.api (cut; same edges/labels as cutCase)
      (s, d) =>
        T.customer(s, d)
          .filter(col("c_custkey") % 10 === 0)
          .cut("c_acctbal", Seq(-1000, 0, 3000, 7000, 10000),
            Seq("neg", "low", "mid", "high"), as = "bal_bin")
          .select("c_custkey", "c_acctbal", "bal_bin")
          .orderBy("c_custkey"),
      Some(s"""SELECT c_custkey, c_acctbal,
              |  $cutCase AS bal_bin
              |FROM customer WHERE c_custkey % 10 = 0 ORDER BY c_custkey""".stripMargin),
    ),
    // pd.factorize — dense integer codes in FIRST-APPEARANCE order
    // (not sorted: the code of a category is the order its first row
    // appears, pinned here by min(event_id)). Shape: tiny distinct
    // agg → row_number over the handful of categories → BROADCAST
    // join-back, the same two-pass discipline as agg_mad — the
    // single-partition window touches only the category table, never
    // the fact rows.
    OpSpec(
      "reshape_factorize",
      // thin call into graft.api (factorize, first-appearance codes)
      (s, d) =>
        T.events(s, d).filter(col("user_id") < 5)
          .select("event_id", "event_type")
          .factorize("event_type", orderCol = "event_id")
          .select("event_id", "event_type", "code")
          .orderBy("event_id"),
      Some("""WITH e AS (SELECT event_id, event_type FROM events WHERE user_id < 5),
             |c AS (SELECT event_type,
             |        row_number() OVER (ORDER BY min(event_id)) - 1 AS code
             |      FROM e GROUP BY event_type)
             |SELECT e.event_id, e.event_type, cast(c.code as bigint) AS code
             |FROM e JOIN c USING (event_type) ORDER BY event_id""".stripMargin),
    ),
  )

  /** pd.cut edges [-1000, 0, 3000, 7000, 10000] as a right-closed CASE
    * ladder — one text, both engines (c_acctbal spans [-999.99,
    * 9999.99], so every row lands in a bin; the ladder still NULLs
    * out-of-range values per pandas). Lazy: referenced from `ops`
    * above, which initializes first. */
  private lazy val cutCase: String =
    """CASE WHEN c_acctbal > -1000 AND c_acctbal <= 0 THEN 'neg'
      |     WHEN c_acctbal > 0 AND c_acctbal <= 3000 THEN 'low'
      |     WHEN c_acctbal > 3000 AND c_acctbal <= 7000 THEN 'mid'
      |     WHEN c_acctbal > 7000 AND c_acctbal <= 10000 THEN 'high'
      |END""".stripMargin
}
