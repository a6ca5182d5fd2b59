package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for headline queries (dev tool for the
  * 100 TB design review: pushdown, broadcast, codegen coverage). */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_revenue_per_nation", "q_j2_jointable_edges", "q_q1_agg",
        "q_x2c_simhash_neardups", "q_x7_decontaminate", "q_x6b_hash_sample",
        "q_g3_pagerank", "q_x9_tfidf", "q_x7b_decontaminate_hashed",
        "q_st3_interval_join", "q_g1_degrees", "q_g6_shortest_paths",
        "q_g3c_pagerank_weighted", "q_x5g_image_resize",
        "q_x5h_audio_resample", "q_g8_link_prediction", "q_x4j_chunking",
        "q_x7d_decontaminate_bloom", "q_x4p_quality_model",
        "q_x2j_simhash_portable", "q_x6k_score_normalize",
        "q_g14_betweenness", "q_st6_resample_locf", "q_x2k_containment",
        // round-6 additions
        "q_x2l_semantic_dedup", "q_x2m_dup_span_removal",
        "q_x2n_incr_semantic", "q_x3h_pq_topk", "q_x3i_ivfpq_topk",
        "q_x4q_ppl_buckets", "q_j6_interval_overlap",
        "q_g17_random_walks", "q_x10b_curate_temperature",
        // round-6 second-wave additions
        "q_st7_resample_interp", "q_st8_ewma", "q_g17b_node2vec_walks",
        "q_g18_hits", "q_g19_mis", "q_x11_dsir", "q_v2_profile",
        // round-6 third-wave additions
        "q_x12_cluster_topics", "q_x13_bpe_merges", "q_x13b_bpe_encode",
        "q_st11_seasonal", "q_st12_cusum", "q_st13_holt",
        // round-6 fourth-wave additions
        "q_st14_acf", "q_st15_funnel", "q_v3_psi", "q_x9d_keywords",
        "q_j7_cooccurrence", "q_st16_holt_winters", "q_x14_kn_ppl",
        "q_v4_benford", "q_v5_scd2", "q_st17_rolling_z",
        "q_st18_dominant_period", "q_v6_ks", "q_v7_chi2",
        "q_x6l_winsorize", "q_st19_ccf",
        // round-6 sixth-wave additions
        "q_g21_modularity", "q_g22_powerlaw", "q_st20_cohort",
        "q_v8_gini", "q_x4s_readability",
        // round-9 additions
        "q_x3j_index_reuse", "q_x3k_index_update", "q_x3l_recall_audit",
        "q_x6r_epoch_pack", "q_g24b_leiden_weighted",
        "q_g25_incr_communities", "q_g26_scc", "q_x4t_pii_scrub",
        "q_x3m_ivfpq_residual", "q_o5_hbos",
        "q_x7e_contamination_report", "q_v16_fd_violations",
        "q_x6s_leak_safe_split", "q_x3o_rerank_topk",
        "q_x1d_best_keeper", "q_x9e_hashed_vectors",
        // round-10 additions
        "q_x5i_image_neardups", "q_x5j_audio_neardups",
        "q_x5k_audio_quality", "q_x5l_video_neardups",
        "q_x4u_html_extract", "q_x6v_length_batches",
        "q_x6t_curriculum", "q_x3p_compacted_index",
        "q_g26c_topo_levels", "q_g26d_incr_scc", "q_g26e_desc_counts",
        "q_g27_landmark_reach", "q_v17_schema_drift",
        "q_asof_forward", "q_asof_nearest", "q_x3q_deleted_index",
        "q_st30_interval_merge",
        // round-11 additions
        "q_g26f_decr_scc", "q_g28_neighbor_agg", "q_g29_bridges",
        "q_g29b_articulation", "q_x3s_retrained_index",
        "q_st30c_interval_delete", "q_x4v_code_extract", "q_x4w_zipf",
        "q_x13c_unigram_candidates",
        // round-13 additions
        "q_x9f_lex_maintenance", "q_x14d_lm_maintenance",
        "q_x14e_lm_maintained_mkn", "q_l1_zorder_layout",
        "q_l2_skipping_stats", "q_l3_hilbert_layout",
        "q_l4_pruned_scan", "q_l5_layout_append",
        "q_l6_layout_erasure",
        // round-14 additions
        "q_l9_hilbert3_append", "q_x3w_opq_ivfpq", "q_x2p_dup_spans",
        "q_x14c_mkn_trigram_ppl", "q_x9i_lex_cdc",
        "q_x6w_token_batches", "q_x6x_auto_rebatch",
        "q_x13e_bpe_maintained", "q_x13f_unigram_maintained",
        // round-15 additions
        "q_l10_bloom_point_lookup", "q_x3x_rotated_lifecycle",
        "q_x3z_streaming_search_composition", "q_x2r_scrub_keep_one",
        "q_x2s_autotuned_neardups", "q_x3y_moments_maintained",
        // round-16 additions (snapshot-isolation tier)
        "q_l11_versioned_scan", "q_l12_versioned_point",
        "q_g3d_pagerank_incremental", "q_g3e_rankstore_roundtrip",
        "q_x3se_era_retrain", "q_x9j_lex_store_versioned",
        "q_x2t_sigindex_roundtrip", "q_x3wz_opq_residual_lifecycle",
        "q_x3xm_matrix_lifecycle", "q_x3n_policy_benign")
    names.foreach { n =>
      println(s"==== $n ====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
