package graft

import graft.ops.Registry
import org.scalatest.funsuite.AnyFunSuite

/** Verifies the "free from Catalyst" claims of SURVEY §4.1 actually hold
  * in the physical plans — the 100 TB story depends on them. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def plan(key: String): String =
    Registry.queries(key)(spark, TestSpark.sfSmoke)
      .queryExecution.executedPlan.toString

  test("scan_pushdown_range pushes the ts range to the parquet reader") {
    val p = plan("scan_pushdown_range")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,") ||
      p.contains("PushedFilters: [GreaterThanOrEqual(ts,"), p)
  }

  test("proj_select_rename prunes to the three referenced columns") {
    val p = plan("proj_select_rename")
    assert(p.contains("ReadSchema") &&
      p.contains("c_custkey") && p.contains("c_mktsegment") &&
      !p.contains("c_acctbal"), p)
  }

  test("join_broadcast compiles to BroadcastHashJoin") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("sort_topk compiles to TakeOrderedAndProject (per-partition top-k)") {
    assert(plan("sort_topk").contains("TakeOrderedAndProject"))
  }

  test("agg_groupby_multi uses two-phase hash aggregation") {
    val p = plan("agg_groupby_multi")
    assert(p.contains("HashAggregate") && p.contains("partial"), p)
  }

  test("join_inner is a shuffled join, not a broadcast of the fact table") {
    val p = plan("join_inner")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p) // orders may auto-broadcast at tiny sf
  }

  test("str_fuzzy_match and sim_pairs_threshold are blocked equi-joins, not products") {
    for (k <- Seq("str_fuzzy_match", "sim_pairs_threshold")) {
      val p = plan(k)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$k still compiles to a nested-loop product:\n$p")
    }
  }

  test("join_range_binned is a bucket equi-join, not the BNLJ a keyless range predicate defaults to") {
    val p = plan("join_range_binned")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("dedup_simhash_pairs is a bucket equi-join, not an all-pairs product") {
    val p = plan("dedup_simhash_pairs")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("dedup_simhash_pairs2 blocks on the pigeonhole split, not an all-pairs product") {
    val p = plan("dedup_simhash_pairs2")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("sim_cosine_ivf_kmeans broadcasts the centroid table and the 1-row query side") {
    val p = plan("sim_cosine_ivf_kmeans")
    // cell assignment = corpus ⨯ BROADCAST centroid table (data, not a
    // generated K-way argmin CASE) reduced by a PARTIAL min(struct)
    // aggregate — one shuffled row per vector at any nlist; the 1-row
    // query side also rides a broadcast, never a shuffle of the corpus
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_min") || (p.contains("HashAggregate") && p.contains("partial")), p)
    assert(!p.contains("d1 <= d2"), p) // the old codegen argmin forest is gone
    assert(p.contains("TakeOrderedAndProject"), p) // top-10 never sorts the corpus
  }

  test("join_asof_tvf plans through AsofJoinExec") {
    assert(plan("join_asof_tvf").contains("AsofJoin ts"))
  }

  test("win_rolling_median shares one WindowExec with its count guard") {
    // same window spec ⇒ Spark fuses percentile + count into a single
    // Window operator: exactly one Window node in the plan
    val p = plan("win_rolling_median")
    assert("(?m)^\\s*[+:]?-?\\s*Window ".r.findAllIn(p).size <= 2, p)
  }

  test("pipeline_dedup_clean scans + normalizes documents exactly once (no survivor join-back)") {
    val p = plan("pipeline_dedup_clean")
    // the round-6/7 plan self-joined the normalized subtree: two parquet
    // scans, two regex-normalize passes, an extra doc_id shuffle. The
    // re-planned single-pass min(struct) survivor must show ONE scan and
    // ONE sha2 computation.
    assert("Scan parquet".r.findAllIn(p).size == 1, s"expected a single documents scan:\n$p")
    assert("sha2".r.findAllIn(p).size <= 1, s"normalize subtree appears more than once:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("HashJoin"), s"join-back still present:\n$p")
  }

  test("dedup_embed_lsh and sim_knn_lsh are banded bucket equi-joins, not all-pairs products") {
    for (k <- Seq("dedup_embed_lsh", "dedup_embed_lsh_scale", "sim_knn_lsh")) {
      val p = plan(k)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$k compiles to a nested-loop product:\n$p")
      assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), s"$k:\n$p")
    }
  }

  test("the DotProductRewrite is live in declared query plans (extension session)") {
    // the session carries GraftExtensions (as Verify/Bench do), so the
    // HOF dot-product folds in the vector queries compile to the native
    // codegen Expression — and still hash-match the oracle (the rewrite
    // is bit-identical, NativeFunctionSpec)
    val p = plan("sim_pairs_threshold_kmeans")
    assert(p.contains("dot_native"), p)
  }

  test("the CosineRewrite fuses declared cosine compositions into cosine_native") {
    // the full dot/sqrt cosine composition collapses to ONE fused
    // codegen expression — each array child evaluated once, not five
    // times (CosineSim scaladoc)
    for (k <- Seq("sim_cosine_ivf", "sim_cosine_topk")) {
      val p = plan(k)
      assert(p.contains("cosine_native"), s"$k:\n$p")
    }
  }

  test("agg_mad join-back broadcasts the tiny stats side (no fact-table window)") {
    val p = plan("agg_mad")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), s"MAD must not sort the fact table into a window:\n$p")
  }

  test("resample spine queries broadcast the bucket aggregates onto the generated spine") {
    for (k <- Seq("ts_resample_spine", "ts_resample_last_ffill")) {
      val p = plan(k)
      assert(p.contains("BroadcastHashJoin"), s"$k:\n$p")
    }
  }

  test("reshape_factorize broadcasts the category code table back onto the fact rows") {
    val p = plan("reshape_factorize")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("agg_winsorized_mean broadcasts the tiny boundary table (no fact-table re-shuffle)") {
    val p = plan("agg_winsorized_mean")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("the recall-report queries run on the fused native cosine") {
    for (k <- Seq("sim_recall_report", "sim_recall_nprobe")) {
      assert(plan(k).contains("cosine_native"), k)
    }
  }

  test("agg_iqr_outliers broadcasts the quartile-fence table back onto the fact rows") {
    val p = plan("agg_iqr_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("win_bollinger fuses mean/std/breach into ONE WindowExec (same frame spec)") {
    val p = plan("win_bollinger")
    val windows = "Window \\[".r.findAllIn(p).length
    assert(windows == 1, s"expected one fused WindowExec, got $windows:\n$p")
  }

  test("ts_seasonal_decompose broadcasts the 24-row seasonal table (fact table shuffles once)") {
    val p = plan("ts_seasonal_decompose")
    assert(p.contains("BroadcastHashJoin"), p)
    // the 25h trend window must run over the HOURLY aggregate, after
    // the hash agg — i.e. exactly one Exchange feeds it from raw rows
    assert(p.contains("HashAggregate"), p)
  }

  test("text_decontaminate_fuzzy broadcasts the benchmark band side (train never all-pairs)") {
    val p = plan("text_decontaminate_fuzzy")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("the round-10 scalar ops are scan-fused projections (no Exchange before the sort)") {
    // date_math_bday / ts_tz_convert / reshape_stack are row-local: the
    // only exchange allowed is the final presentation orderBy
    for (k <- Seq("date_math_bday", "ts_tz_convert", "reshape_stack")) {
      val p = plan(k)
      val exchanges = "Exchange ".r.findAllIn(p).size
      assert(exchanges <= 1, s"$k should shuffle only for the final sort, got $exchanges:\n$p")
      assert(!p.contains("HashJoin") && !p.contains("SortMergeJoin"), s"$k grew a join:\n$p")
    }
  }

  test("win_rolling_apply and win_rank_first ride one window pass each") {
    for (k <- Seq("win_rolling_apply", "win_rank_first")) {
      val p = plan(k)
      assert("(?m)Window ".r.findAllIn(p).size <= 2, s"$k:\n$p")
    }
  }

  test("round-11 batch-2 queries keep their designed shapes") {
    // ts_resample_quantile: one shuffle on the bucket key (+ the
    // presentation sort) — percentile aggregates two-phase
    val rq = plan("ts_resample_quantile")
    assert(rq.contains("partial"), rq)
    assert("Exchange ".r.findAllIn(rq).size <= 2, rq)
    // zipf: the rank window partitions by source (vocab-sized groups) —
    // never an unpartitioned whole-corpus window
    val zs = plan("text_zipf_slope")
    assert(zs.contains("Window") && !zs.contains("Window [row_number() windowspecdefinition(sort"), zs)
    assert(!zs.contains("CartesianProduct"), zs)
    // js divergence: the grid build broadcasts (vocab + totals) — the
    // corpus-sized token stream is never on both sides of a join
    val js = plan("text_js_divergence")
    assert(js.contains("Broadcast"), js)
    assert(!js.contains("CartesianProduct") && !js.contains("SortMergeJoin"), js)
    // the simhash TVF joins on the (pid, pv) block keys — an equi-join,
    // not the all-pairs product its oracle runs
    val tv = plan("dedup_simhash_pairs_tvf")
    assert(!tv.contains("BroadcastNestedLoopJoin") && !tv.contains("CartesianProduct"), tv)
  }

  test("round-11 batch-3 queries keep their designed shapes") {
    // token budget: ONE hash exchange (the source window) + the
    // presentation sort — no join at all
    val tb = plan("sample_token_budget")
    assert("Exchange ".r.findAllIn(tb).size <= 2, tb)
    assert(!tb.contains("Join"), tb)
    // temperature weights: ONE corpus scan (the round-11 crossJoin
    // re-derivation fix) — the documents parquet appears exactly once
    val tw = plan("mix_temperature_weights")
    assert("documents\\.parquet".r.findAllIn(tw).size == 1, tw)
    // boilerplate: one scan + chunk-grid window, no broadcast of a
    // corpus-sized side and no second explode
    val cb = plan("dedup_chunk_boilerplate")
    assert("documents\\.parquet".r.findAllIn(cb).size == 1, cb)
    // changepoint: two fused window specs over ONE user_id shuffle,
    // then a partial+final argmax — three exchanges max with the sort
    val cp = plan("ts_changepoint")
    assert("Exchange ".r.findAllIn(cp).size <= 2, cp)
    assert(cp.contains("partial_max"), cp)
    // IVF-ADC: the LUT side is broadcast; the corpus side never sorts
    // globally before the top-k
    val ia = plan("sim_ivfpq_adc_topk")
    assert(ia.contains("Broadcast"), ia)
  }

  test("store_read_pruned prunes day partitions at the scan (PartitionFilters)") {
    // the §1.1 store-tier claim: the event_date range filter must reach
    // the parquet scan as a PARTITION filter (directories skipped before
    // any file opens), not a post-scan Filter over all days
    val p = plan("store_read_pruned")
    assert(p.contains("PartitionFilters") && p.contains("event_date"), p)
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_date"),
      s"event_date range not pushed as a partition filter:\n$p")
  }

  test("store_upsert_latest is one hash aggregation, not a window/sort pass") {
    val p = plan("store_upsert_latest")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("WindowExec") && !p.contains("Window "), p)
  }

  test("ts_resample_15min is the same two-phase hash agg as the calendar form") {
    val p = plan("ts_resample_15min")
    assert(p.contains("HashAggregate") && p.contains("partial"), p)
  }

  test("round-13 queries keep their designed shapes") {
    // time travel: the version filter reaches the parquet scan
    // (row-group stats prune), resolution stays one hash agg, no window
    val av = plan("store_read_asof_version")
    assert(av.contains("PushedFilters") && av.contains("event_id"), av)
    assert(!av.contains("WindowExec") && !av.contains("Window "), av)
    // retention: the gated read has NO date filter anywhere — the
    // expired partitions are GONE from the directory tree, which is
    // the whole point of the metadata-only drop (match the Filter
    // OPERATOR node, not the scan's empty PartitionFilters metadata)
    val re = plan("store_retention_expire")
    assert(!re.contains("+- Filter") && re.contains("PartitionFilters: []"), re)
    // rollup read: the aggregation was MATERIALIZED at write time —
    // the gated read must carry no aggregate at all, just scan + sort
    val ro = plan("store_rollup_hourly")
    assert(!ro.contains("HashAggregate"), ro)
    // weighted rolling: five same-spec lags fuse into ONE WindowExec
    val ww = plan("win_rolling_weighted")
    assert("Window ".r.findAllIn(ww).size == 1, ww)
    // substring dedup: in-group pair explode — no join node anywhere
    val sd = plan("dedup_substring_exact")
    assert(!sd.contains("Join"), sd)
    // BPE counting: since round 17 the per-doc count frame is a
    // DiskMemo artifact scan (the tokenizer chain — whose word-token
    // table is broadcast, never shuffled against the corpus — runs
    // once at build time, shared with sample_token_budget_bpe); the
    // declared plan must be that slim scan, with no join and no
    // corpus re-tokenization
    val bp = plan("text_token_count_bpe")
    assert(bp.contains("graft_diskmemo") && !bp.contains("Join"), bp)
    // panel evals: the query panel is the BROADCAST side (corpus
    // streams once past it — never a shuffled or cartesian pair build)
    Seq("sim_knn_classify", "sim_recall_int8", "sim_recall_truncated")
      .foreach { k =>
        val p = plan(k)
        assert(p.contains("BroadcastNestedLoopJoin"), s"$k: no broadcast panel\n$p")
        assert(!p.contains("CartesianProduct"), s"$k: cartesian pair build\n$p")
      }
    // vacuum dry-run: a READ-side report — distinct-pair count + hash
    // agg per partition, no window/sort pass over the store
    val vr = plan("store_vacuum_report")
    assert(!vr.contains("WindowExec") && !vr.contains("Window "), vr)
    // moment-closed-form stats: pure partial+final hash aggs, no window
    Seq("agg_ols_normal_eq", "agg_ols_tvf", "agg_partial_corr",
      "text_hash_embed").foreach { k =>
      val p = plan(k)
      assert(p.contains("HashAggregate") && !p.contains("Window "),
        s"$k: expected windowless hash-agg plan\n$p")
    }
    // round-16 (verdict item 4 + nit 1): every declared single-series
    // recursion runs the LINEAR flatMapGroups path — no window pass,
    // no collect_list prefix explosion anywhere in the plan
    Seq("ts_ewm_adjust_false", "ts_holt_linear", "ts_holt_winters",
      "ts_kalman_level", "ts_cusum_page", "ts_ewma_chart").foreach { k =>
      val p = plan(k)
      assert(!p.contains("Window "), s"$k: unexpected window pass\n$p")
      assert(!p.contains("collect_list") && !p.contains("CollectList"),
        s"$k: prefix-fold explosion crept back\n$p")
      assert(p.contains("MapGroups"), s"$k: no flatMapGroups pass\n$p")
    }
    // backtest: forecasts come from the same udaf passes (two
    // MapGroups, broadcast-joined back); it keeps its ONE lag window
    // and ONE bounded per-model collect (the exact-MAE fold) — but no
    // per-row prefix window remains
    val bt16 = plan("ts_backtest_report")
    assert(bt16.contains("MapGroups"), bt16)
    assert("Window ".r.findAllIn(bt16).size == 1, bt16)
    assert(bt16.contains("BroadcastHashJoin") && !bt16.contains("SortMergeJoin"), bt16)
  }

  test("the stats-panel queries keep their designed shapes") {
    // ANOVA: pure partial+final hash aggs + the ordered fold — no
    // window, no join; the fact table is scanned exactly once
    val an = plan("agg_anova_oneway")
    assert(!an.contains("Window ") && !an.contains("Join"), an)
    // Cohen's d: k-row frame self-joined via BROADCAST nested loop on
    // type_a < type_b — never a shuffled or cartesian pair build
    val cd = plan("agg_cohens_d")
    assert(cd.contains("BroadcastNestedLoopJoin") &&
      !cd.contains("CartesianProduct"), cd)
    // Kendall: the pair explode is the bounded daily frame (broadcast
    // NL on ia < ib), the fact table never self-joins; windowless
    val kt = plan("agg_kendall_tau")
    assert(kt.contains("BroadcastNestedLoopJoin") &&
      !kt.contains("Window ") && !kt.contains("CartesianProduct"), kt)
    // Kruskal-Wallis: the rank window runs over the bounded distinct-
    // cents grid ONCE, and the cell⋈ranked join is broadcast-hash
    val kw = plan("agg_kruskal_wallis")
    assert("Window ".r.findAllIn(kw).size == 1, kw)
    assert(kw.contains("BroadcastHashJoin"), kw)
    // KPSS: the cumsum + four lags share one (partition, order) spec
    // and fuse into ONE WindowExec over the 31-row daily frame
    val kp = plan("ts_kpss")
    assert("Window ".r.findAllIn(kp).size == 1, kp)
  }

  test("the inference-panel queries keep their designed shapes") {
    // Bartlett: pure partial+final hash aggs + three ordered folds —
    // windowless, joinless, one fact scan
    val bt = plan("agg_bartlett_test")
    assert(!bt.contains("Window ") && !bt.contains("Join"), bt)
    // Brown–Forsythe: the doubled-median windows run over the bounded
    // distinct-cents grid, and the k-row median frame broadcasts back
    // onto the fact scan — the fact table itself never enters a window
    val lv = plan("agg_levene_bf")
    assert(lv.contains("BroadcastHashJoin"), lv)
    assert(!lv.contains("SortMergeJoin"), lv)
    // Friedman: complete-day filter + rank join are broadcasts over
    // the ≤31·k cell frame; one bounded per-day rank window
    val fr = plan("agg_friedman_test")
    assert(fr.contains("BroadcastHashJoin") && !fr.contains("CartesianProduct"), fr)
    // DW + Granger: moments broadcast / lag over the bounded daily
    // frame — exactly one window pass each, no shuffled join
    Seq("ts_dw_stat", "ts_granger_f").foreach { k =>
      val p = plan(k)
      assert("Window ".r.findAllIn(p).size == 1, s"$k: window count != 1\n$p")
      assert(!p.contains("SortMergeJoin"), s"$k\n$p")
    }
    // Period detection: windowless — the candidate explode and both
    // phase aggs are hash aggregations over the bounded hourly frame
    val pd = plan("ts_period_detect")
    assert(!pd.contains("Window ") && !pd.contains("Join"), pd)
    // Proportion z: ONE hash agg over the fact scan, nothing else
    val pz = plan("agg_prop_ztest")
    assert(!pz.contains("Window ") && !pz.contains("Join") &&
      !pz.contains("Exchange hashpartitioning"), pz)
    // t family: windowless joinless hash aggs
    Seq("agg_ttest_1samp", "agg_ttest_paired", "agg_cochran_q").foreach { k =>
      val p = plan(k)
      assert(!p.contains("Window "), s"$k\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), s"$k\n$p")
    }
    // Wilcoxon: the rank window runs over the bounded |d| grid ONCE;
    // the grid joins back by broadcast
    val wx = plan("agg_wilcoxon_signed")
    assert(wx.contains("BroadcastHashJoin") && !wx.contains("SortMergeJoin"), wx)
    // PCA: projections are scan-fused row-local folds — the per-label
    // report is hash aggs with NO window, NO join, NO collect fold
    Seq("vec_pca_project", "vec_pca_var_report").foreach { k =>
      val p = plan(k)
      assert(!p.contains("Window ") && !p.contains("Join"), s"$k\n$p")
      assert(!p.contains("CollectList"), s"$k: ordered fold crept in\n$p")
    }
  }

  test("sim_knn_classify_ivf candidates come from a broadcast HASH join on the cell key") {
    // the probe rows are exploded (qid × 5 cells) precisely so the
    // candidate join hashes on cell — an OR-of-equalities predicate
    // would compile to a BroadcastNestedLoopJoin over corpus×panel
    val p = plan("sim_knn_classify_ivf")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("agg_spearman_grid has no group-partitioned fact-table rank sort") {
    // round-16 verdict item 1: the grid spelling's whole point is that
    // NO window sorts the fact table partitioned by the group key
    // alone (parallelism = group count). The serial spelling's rank
    // windows are windowspecdefinition(l_returnflag, q|p ASC …); the
    // grid plan must contain none of those, and must carry the
    // bucketed (group, _b)-partitioned cumsum instead.
    val p = plan("agg_spearman_grid")
    val serialRank = """windowspecdefinition\(l_returnflag#\d+, [qp]#\d+""".r
    assert(serialRank.findFirstIn(p).isEmpty,
      s"group-partitioned fact-table rank sort crept back in:\n$p")
    val bucketed = """windowspecdefinition\(l_returnflag#\d+, _b#\d+""".r
    assert(bucketed.findFirstIn(p).isDefined ||
      p.contains("_b#"), s"bucketed rank windows missing:\n$p")
  }

  test("filter_top_percent_grid has no group-partitioned fact-table rank sort") {
    // the agg_spearman_grid assertion applied to the filter tier
    // (round 17): the window spelling's percent_rank is
    // windowspecdefinition(o_orderstatus, o_totalprice ASC …) — a
    // 3-task sort of the orders table. Since the round-18 ranked-grid
    // memo, the bucketed machinery lives in the ARTIFACT BUILD plan
    // (asserted separately below); the declared plan must still be
    // free of the serial fact sort.
    val p = plan("filter_top_percent_grid")
    val serialRank = """windowspecdefinition\(o_orderstatus#\d+, o_totalprice#\d+""".r
    assert(serialRank.findFirstIn(p).isEmpty,
      s"group-partitioned fact-table rank sort crept back in:\n$p")
  }

  test("agg_trimmed_mean_grid / agg_lorenz_curve_grid have no group-partitioned fact sort") {
    // round-18 window-parallelism census: these two were the only
    // census-LOW windows whose 100× sweep growth exceeded 2× — both
    // sort orders in 3 o_orderstatus partitions. Their grid twins
    // read the memoized ranked artifact (build plan asserted below).
    for (k <- Seq("agg_trimmed_mean_grid", "agg_lorenz_curve_grid",
        "agg_gini_grid")) {
      val p = plan(k)
      val serialRank = """windowspecdefinition\(o_orderstatus#\d+, o_totalprice#\d+""".r
      assert(serialRank.findFirstIn(p).isEmpty,
        s"$k: group-partitioned fact-table rank sort crept back in:\n$p")
    }
  }

  test("the ranked-grid ARTIFACT BUILD carries the bucketed cumsum, not a serial sort") {
    // Round 18 moved the ParallelRank machinery of the four
    // orders-twins (filter_top_percent_grid + the trimmed/lorenz/gini
    // trio) into ONE memoized ranked-grid artifact keyed on the count
    // grid — the declared plans are now artifact scans, so the
    // scale claim ("rank parallelism = groups × buckets, never a
    // 3-task fact sort") must be asserted on the BUILD plan itself:
    // same machinery the memo materializes on first call.
    import org.apache.spark.sql.functions._
    val counts = Registry.queries("scan_parquet")(spark, TestSpark.sfSmoke)
      .sparkSession.read.parquet(s"${TestSpark.sfSmoke}/orders.parquet")
      .select(col("o_orderstatus"), col("o_totalprice"))
      .groupBy(col("o_orderstatus"), col("o_totalprice"))
      .agg(count(lit(1)).as("_c"))
    val build = graft.core.ParallelRank.fromCounts(
      counts, Seq("o_orderstatus"), "o_totalprice", "_c", "dr")
    val p = build.queryExecution.executedPlan.toString
    val serialRank = """windowspecdefinition\(o_orderstatus#\d+, o_totalprice#\d+""".r
    assert(serialRank.findFirstIn(p).isEmpty,
      s"serial fact-ordered rank sort in the ranked-grid build:\n$p")
    assert(p.contains("_b#"), s"bucketed rank windows missing from the build:\n$p")
  }

  test("exchange budget of the 25 most expensive bench keys (regression guard)") {
    // round-14 verdict item 7 (top-10), widened to the top-25 in
    // round 16 (verdict item 5): the re-plan rounds kept proving
    // these shapes by hand — pin them. Budgets are the MEASURED
    // Exchange counts of the round-16 plans (graft.tools.PlanAudit on
    // the smoke corpus); an added shuffle anywhere in these pipelines
    // fails this test by design. (Counts are plan-shape, not
    // data-size: broadcasts, DiskMemo artifact scans and in-group
    // pair explodes contribute zero.)
    val budget = Seq(
      "dedup_ngram_jaccard" -> 1,
      "dedup_substring_exact" -> 3,
      "dedup_substring_survivors" -> 2,
      "store_rollup_incremental" -> 1,
      "store_read_pruned" -> 2,
      "dedup_substring_tvf" -> 3,
      "sample_token_budget_bpe" -> 4,
      "dedup_simhash_pairs_tvf" -> 2,
      "sim_mmr_topk" -> 0,
      "dedup_minhash_lsh" -> 4,
      // round-16 widening: the rest of the bench top-25
      "dedup_cluster_resolve" -> 1,
      "text_token_count_bpe" -> 3,
      "dedup_simhash" -> 1,
      "store_compact" -> 2,
      "dedup_embed_survivors" -> 2,
      "text_bigram_perplexity" -> 6,
      "pipeline_dedup_clean" -> 3,
      "store_rollup_hourly" -> 1,
      "store_schema_evolution" -> 2,
      "dedup_simhash_pairs" -> 2,
      "dedup_simhash_pairs2" -> 2,
      "sim_pq_recall_report" -> 6,
      "dedup_embed_lsh" -> 2,
      "ts_funnel_stateful" -> 2,
      "text_strip_dup_spans" -> 5,
      "text_decontaminate_fuzzy" -> 7,
      "scan_sample_hash" -> 2,
      // round 17: the new top bench key — 14 exchanges, but the CORPUS
      // shuffles exactly once (into the memoized joint grid at build);
      // everything else operates on grid/marginal frames (PlanAudit
      // r17). The declared window twin stays at 2.
      "agg_spearman_grid" -> 14,
      "agg_spearman" -> 2)
    val over = budget.flatMap { case (k, n) =>
      // SHUFFLE exchanges only (round-16 review: a bare "Exchange "
      // count also matched Broadcast/ReusedExchange, inflating the
      // ruler the budgets were measured with)
      val got = graft.tools.PlanAudit.shuffleExchanges(plan(k))
      if (got > n) Some(s"$k: $got exchanges > budget $n") else None
    }
    assert(over.isEmpty, over.mkString("; "))
  }

  test("no single-partition WindowExec outside the declared bounded-frame allowlist") {
    // round-16 verdict item 5's inverse assertion: an UNPARTITIONED
    // window (windowspecdefinition that starts with an ordering, no
    // partition keys) serializes the whole input through one task at
    // scale. Every allowlisted key runs its global window over a
    // BOUNDED frame by documented design (interpolation/upsample
    // spines over one user's series, stats-test rank grids over
    // bounded distinct-cents/daily frames, the single-series
    // backtest lag) or declares the global-ordering as-of spelling
    // whose scale twin is the physical/pushdown plan. A by-less
    // window appearing anywhere else fails this test by design.
    val allowed = Set(
      "join_asof_backward", "join_asof_global",
      "agg_mannwhitney_u", "agg_ks_test", "agg_kruskal_wallis",
      "agg_wilcoxon_signed", "agg_prop_ztest_bh",
      // global NO-ORDER windows over already-aggregated bounded
      // frames (grand-total ratios on value/digit/contingency grids,
      // per-source mix reports) — caught by the round-16 stricter
      // probe, which also sees frame-only specs
      "agg_value_counts_norm", "agg_benford", "agg_chi2_independence",
      "agg_cramers_v", "mix_temperature_weights", "mix_epoch_report",
      "ts_upsample_ffill", "ts_upsample_15min",
      "ts_interpolate_linear", "ts_interpolate_limit",
      "ts_interpolate_backward", "ts_interpolate_both",
      "ts_interpolate_time", "ts_interpolate_nearest",
      "ts_resample_last_ffill", "ts_resample_interpolate",
      "ts_adf_test", "ts_runs_test", "ts_backtest_report",
      "ts_downsample_lttb", "ts_wow_growth",
      "ts_seasonal_decompose", "ts_seasonal_strength",
      "ts_kpss", "ts_dw_stat", "ts_granger_f",
      "reshape_qcut", "reshape_factorize",
      // round 18: the describe grid device ranks ONE global column, so
      // ParallelRank's bucket-totals prefix window has no group key —
      // it runs over the ≤ numBuckets-row (32) bucket-totals frame,
      // the same bounded-frame class as the report keys above
      "agg_describe")
    val offenders = Registry.all
      .filterNot(op => allowed.contains(op.key))
      .filter(op => graft.tools.PlanAudit.unpartitionedWindow(plan(op.key)))
      .map(_.key)
    assert(offenders.isEmpty, s"unpartitioned windows crept in: $offenders")
  }

  test("no CartesianProduct outside the deliberate cross/pairs queries") {
    val allowed = Set("join_cross", "sim_cosine_topk", "text_tfidf")
    val offenders = Registry.all
      .filterNot(op => allowed.contains(op.key))
      .filter { op =>
        val p = Registry.queries(op.key)(spark, TestSpark.sfSmoke)
          .queryExecution.executedPlan.toString
        p.contains("CartesianProduct")
      }
      .map(_.key)
    assert(offenders.isEmpty, s"unexpected cartesian products: $offenders")
  }
}
