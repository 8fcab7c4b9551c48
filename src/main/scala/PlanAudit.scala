import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (k <- Seq("filter_compare", "join_inner", "join_asof_by", "text_tfidf",
        "sim_cosine_topk", "ts_resample_agg",
        // round-4 additions worth re-auditing each round
        "join_asof_backward", "join_asof_nearest", "join_asof_physical",
        "dedup_ngram_jaccard", "sim_pairs_threshold", "str_fuzzy_match",
        "ts_merge_ordered", "agg_groupby_salted", "ts_funnel",
        // round-5 additions
        "join_asof_strict", "join_asof_by2", "join_asof_tvf", "join_asof_physical_fwd",
        "dedup_simhash_pairs", "dedup_cluster_resolve", "dedup_survivors",
        "sim_cosine_ivf_kmeans", "sim_pairs_threshold_kmeans",
        "win_rolling_median", "win_topk_udaf", "ts_funnel_stateful",
        "scan_sample_stratified", "text_lang_entropy",
        // round-6 additions
        "dedup_minhash_lsh", "win_rank_average", "ts_ewm_std",
        "win_rolling_time_sum", "win_expanding_corr",
        // round-6 batch 2
        "join_indicator", "set_intersect_all", "agg_product",
        "text_normalize", "dedup_prefix", "join_range_binned",
        "sim_knn_join", "dedup_ngram_containment", "pipeline_dedup_clean",
        "dedup_simhash_pairs2",
        // round-11 additions: TVF-expanded plans, scale-band embed LSH,
        // full-corpus simhash sketch
        "ts_resample_tvf", "ts_sessionize_tvf", "dedup_embed_lsh",
        "dedup_simhash", "sim_knn_lsh",
        // round-11 batch 2
        "win_rolling_kurt", "text_zipf_slope", "text_js_divergence",
        "dedup_simhash_pairs_tvf", "ts_resample_quantile",
        // round-11 batch 3
        "sample_token_budget", "mix_temperature_weights",
        "dedup_chunk_boilerplate", "vec_pq_encode", "sim_pq_adc_topk",
        "vec_pq_mse", "vec_ivfpq_encode", "sim_ivfpq_adc_topk",
        "sample_token_budget_tvf", "sample_class_balance",
        "sim_pq_recall_report", "ts_changepoint",
        // round-12 additions: store tier, offset resample/upsample
        "store_read_pruned", "store_upsert_latest", "store_compact",
        "ts_resample_15min", "ts_resample_tvf15", "ts_upsample_15min")) {
      println(s"===== $k =====")
      val df = graft.ops.Registry.queries(k)(spark, d)
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Scan") || l.contains("Join") || l.contains("Exchange") ||
          l.contains("Aggregate") || l.contains("Window") || l.contains("Sort") ||
          l.contains("PushedFilters") || l.contains("ReadSchema")).take(25).mkString("\n"))
    }
    spark.stop()
  }
}
