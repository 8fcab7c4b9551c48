package graft

import graft.ops.Registry
import org.scalatest.funsuite.AnyFunSuite

/** Double-run byte-level determinism (SURVEY §2.0): catches unordered
  * collect_list, nondeterministic survivors, unstable orderings — the
  * class of bug the driver's hash gate fails on but a single local run
  * can't see. Exercises the order-sensitive queries. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sensitive = Seq(
    "arr_collect", "agg_min_max_by", "dedup_exact", "dedup_hash",
    "join_asof_backward", "join_asof_by", "join_asof_tolerance",
    "win_row_number", "ts_sessionize", "ts_resample_ohlc",
    "sim_cosine_topk", "sort_topk", "agg_value_counts",
    "agg_mode", "win_topk_per_group", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "sim_cosine_ivf", "str_fuzzy_match",
    // round 5: capped-collect pair explode, Hamming-bucket pairs,
    // iterative label propagation, learned-IVF nprobe membership,
    // strict frames, TVF routing
    "dedup_simhash_pairs", "dedup_cluster_resolve",
    "sim_cosine_ivf_kmeans", "join_asof_strict", "join_asof_tvf",
    "win_rolling_median",
    // round 6: cluster family under LAZY fixed-rounds (iters=3, no
    // convergence action — guards label-propagation order effects),
    // plus the new rank/ewm/expanding windows
    "dedup_survivors", "win_rank_average", "ts_ewm_std",
    "win_expanding_corr",
    // round 6 batch 2: ordered-fold product, global-ntile qcut,
    // frame percentile
    "agg_product", "reshape_qcut", "win_rolling_quantile",
    "dedup_ngram_containment", "sim_knn_join", "dedup_flag_duplicated",
    "dedup_simhash_pairs2", "join_range_binned",
    "pipeline_dedup_clean", "join_asof_tolerance_fwd",
    // round 7/8 queries: map-backed replace + ordered string agg
    // (commit 21cef21), the min(struct) survivor re-plan, the banded
    // vector LSH (pair distinct), nearest+tolerance as-of, and the
    // unordered-sum associative product
    "str_map_replace", "agg_string_agg",
    "dedup_embed_lsh", "join_asof_nearest_tol", "agg_product_assoc",
    // batch 3: quantile-sketch range partitioning (bounds environmental
    // but result invariant), banded candidate dedup + rank, whole-frame
    // proportion window
    "join_asof_global", "sim_knn_lsh", "agg_value_counts_norm",
    // batch 4: argmax-struct tie-break (top bigram), broadcast
    // join-back MAD (partial-sum order must not leak)
    "text_top_ngram_frac", "agg_mad",
    // batch 5: the embedding-side cluster pipeline (label propagation
    // + banded candidates), bucket-last pick + ffill carry
    "dedup_embed_survivors", "ts_resample_last_ffill",
    // batch 6: prefix-list recurrence fold (frame-order collect),
    // first-appearance coding (min-id window over the category table)
    "ts_ewm_adjust_false", "reshape_factorize",
    // batch 7: growing-frame percentile
    "win_expanding_median",
    // batch 12: transcendental time-decay prefix fold
    "ts_ewm_halflife_time",
    // round 9: wide-band LSH candidates + threshold histogram, rank-
    // boundary winsorize + rank-sum gini (window-position devices),
    // LTTB bucket argmax tie-break, ordered-fold log-prob, ACF stack
    "dedup_embed_lsh_scale", "dedup_threshold_profile",
    "agg_winsorized_mean", "agg_gini", "ts_downsample_lttb",
    "text_unigram_logprob", "ts_acf_profile", "win_streak",
    "ts_retention", "win_rolling_slope",
    // round 9 last: struct-max argmax tie, stacked cum/max windows,
    // rank-over-customer-totals top-N share (rev-tie broken by custkey)
    "win_rolling_argmax", "win_drawdown", "agg_topn_share",
    // round 9 final: rank-based Tukey fences (value-at-rank invariant
    // under tie order), spine prev/next interpolation windows
    "agg_iqr_outliers", "ts_resample_interpolate",
    // round 9 staples 2: kept-rank-set trimmed mean, cluster + struct-
    // min quality survivor, ordered-fold seasonal decomposition
    "agg_trimmed_mean", "dedup_survivors_quality", "ts_seasonal_decompose",
    // round 9 staples 3: decimal-cumsum CUSUM, dual-ranking recall
    "ts_cusum_flag", "sim_recall_report",
    // round 9 staples 4: rank+cumsum-over-totals Pareto cutoff,
    // r4-tfidf rank keywords
    "agg_pareto_8020", "text_keyword_extract", "sim_recall_nprobe",
    // round 9 batch 7: integer-max KS, ordered-fold chi-square
    "agg_ks_test", "agg_chi2_independence",
    // round 9 batch 9: ntile-decile Lorenz (tie-sum invariance)
    "agg_lorenz_curve",
    // round 9 batch 10: doubled-rank nonparametrics
    "agg_mannwhitney_u", "agg_spearman",
    // round 9 batch 13: broadcast-baseline join-back (partial-sum
    // order must not leak, the agg_mad concern), coupled struct-fold
    "ts_seasonal_anomaly", "ts_holt_linear", "ts_holt_linear_keyed",
    // round 9 last: banded candidates + dual-score sketch report,
    // ordered-fold effect size
    "dedup_minhash_quality", "agg_cramers_v",
    // round 11: full-corpus 60-bit simhash sketch (sign of a 60-way
    // partial-sum race), TVF-expanded window sessionization, scale-band
    // swap of the declared embed-LSH query
    "dedup_simhash", "ts_sessionize_tvf", "ts_resample_tvf",
    "dedup_embed_lsh",
    // round 11 batch 2: rank-sorted OLS folds, vocab-grid divergence
    // folds, 4th-moment window sums, the wide MinHash band family
    "text_zipf_slope", "text_js_divergence", "win_rolling_kurt",
    "dedup_minhash_lsh_scale",
    // round 13: vector-state struct fold (rotating 24-slot seasonal),
    // Cramer determinants from exact moments
    "ts_holt_winters", "ts_holt_winters_keyed", "agg_ols_normal_eq",
    "ts_cusum_page", "agg_partial_corr", "ts_ewma_chart",
    // round-13 batch 4: event-order autocovariance folds, Cramer
    // determinant cascades, order-statistic window composites
    "ts_pacf", "ts_ljung_box", "ts_adf_test", "agg_grubbs_stat",
    "agg_jarque_bera", "ts_theil_sen", "win_hampel_filter",
    // round-13 batch 5: ordered cross-group folds (ANOVA/KW), the
    // distinct-grid doubled ranks, pair-concordance counting, and the
    // exact-demeaned partial-sum cascade
    "agg_anova_oneway", "agg_kruskal_wallis", "agg_cohens_d",
    "agg_kendall_tau", "ts_kpss",
    // round-13 batch 6: Bartlett/B-F/periodogram ordered folds, the
    // doubled-median grid, per-day doubled ranks, D·n·e residual
    // cascade, det3 Cramer over the lagged daily frame
    "agg_bartlett_test", "agg_levene_bf", "agg_friedman_test",
    "ts_dw_stat", "ts_granger_f", "ts_period_detect",
    // round-13 batch 7: literal-rotation projections with quantized
    // exact sums; the Kalman prefix fold
    "vec_pca_project", "vec_pca_var_report", "ts_kalman_level",
    // round-13 batch 8: the |d| doubled-rank grid, exact incidence
    // squares, per-doc token grids
    "agg_wilcoxon_signed", "agg_cochran_q", "text_ttr",
    "agg_prop_ztest_bh", "store_rollup_incremental",
    "agg_ttest_1samp", "agg_ttest_paired",
    "agg_mcnemar", "text_bigram_perplexity", "ts_esd_outliers",
    "sim_mmr_topk",
    // round 15: cell-pruned vote (rank + vote ties under a hash-join
    // candidate order), binary-payload sha envelope + distinct count,
    // the artifact-backed TVF pair spellings
    "sim_knn_classify_ivf", "multimodal_bytes_profile",
    "dedup_substring_tvf", "dedup_simhash_pairs_tvf")

  test("order-sensitive queries return identical results across runs") {
    val failures = sensitive.flatMap { key =>
      val build = Registry.queries(key)
      val a = build(spark, TestSpark.sfSmoke).collect().map(_.toString).toSeq
      val b = build(spark, TestSpark.sfSmoke).collect().map(_.toString).toSeq
      if (a == b) None else Some(key)
    }
    assert(failures.isEmpty, s"nondeterministic: ${failures.mkString(", ")}")
  }
}
