"""Headline query suite — one entry per operator family in SURVEY.md §2.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable in ``QUERIES`` with
a DuckDB-runnable ANSI-SQL oracle in ``ORACLE_SQL`` (same column names, same
values). Non-SQL-expressible ops (MinHash LSH, streaming state) have no
oracle entry and get the driver's rows-only check.

Float determinism contract (so value-hashes match the oracle bit-for-bit):

- Money/quantity doubles are 2-decimal values → cast to DECIMAL before
  summing (exact, order-independent), then the FINAL result is cast back to
  DOUBLE (decimal→double is correctly rounded in both engines).
- Averages are computed as ``CAST(exact_decimal_sum AS DOUBLE) / count`` so
  both engines perform the identical single IEEE division — and emitted
  UNROUNDED. Never round an already-engine-identical double: rounding
  adds nothing and reintroduces a grid-boundary class (a 2-decimal money
  mean CAN terminate exactly on the x.xxxx5 grid, where Spark rounds the
  exact binary expansion via BigDecimal while DuckDB rounds after a
  float multiply — the q203 seed-twin catch, round 10). ``round(d)`` is
  for genuinely float-accumulated values only.
- Genuinely float-accumulated results (cosine similarity) are rounded to 4
  decimals; ranking gaps in the synthetic data are far wider than the
  engines' accumulation-order differences.
- Timestamps that could differ in wall-clock rendering are either grouped to
  day granularity or emitted as epoch microseconds (exact integers).
"""

from __future__ import annotations

from pyveb_spark.queries import (  # noqa: E402
    _helpers,
    dedup,
    etl,
    funnel,
    graph,
    layout,
    multimodal,
    profile,
    relational,
    sampling,
    similarity,
    sketches,
    streaming,
    text,
    timeseries,
)

# Re-export every query function and oracle-SQL constant at package level:
# the registry below (and external imports like
# ``from pyveb_spark.queries import q17_near_dup_pairs``) keep working
# exactly as they did against the monolith.
for _m in (
    _helpers, relational, streaming, etl, dedup, similarity, text,
    sampling, sketches, profile, timeseries, funnel, graph, multimodal,
    layout,
):
    globals().update(
        {k: v for k, v in vars(_m).items() if not k.startswith("__")}
    )
del _m



# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_shipping_priority": q02_shipping_priority,
    "q03_revenue_by_nation": q03_revenue_by_nation,
    "q04_anti_join": q04_customers_without_urgent_orders,
    "q05_semi_join": q05_segments_with_urgent_orders,
    "q06_window_topn": q06_top3_orders_per_customer,
    "q07_window_running": q07_running_user_value,
    "q08_rollup": q08_acctbal_rollup,
    "q09_sort_topk": q09_top10_parts,
    "q10_set_ops": q10_status_set_ops,
    "q11_distinct_agg": q11_event_type_stats,
    "q12_json_props": q12_props_json,
    "q13_argmax_maxby": q13_best_order_per_customer,
    "q14_asof_join": q14_purchase_after_view,
    "q15_tumbling_window": q15_daily_event_windows,
    "q16_dedup_keep_first": q16_dedup_keep_first,
    "q17_near_dup_pairs": q17_near_dup_pairs,
    "q18_text_stats": q18_text_stats,
    "q19_knn_cosine": q19_knn_cosine,
    "q20_clean_old_dates": q20_orders_clamped_years,
    "q21_upsert_merge": q21_upsert_equivalence,
    "q22_cube": q22_lineitem_cube,
    "q23_grouping_sets": q23_grouping_sets,
    "q24_string_funcs": q24_string_functions,
    "q25_sessionize": q25_user_sessions,
    "q26_stream_upsert": q26_stream_upsert,
    "q27_quality_score": q27_quality_scores,
    "q28_minhash_pairs": q28_minhash_lsh_pairs,
    "q29_simhash": q29_simhash_fingerprints,
    "q30_lsh_ann": q30_lsh_ann_topk,
    "q31_session_windows": q31_session_windows,
    "q32_pipeline_e2e": q32_pipeline_e2e,
    "q33_pivot": q33_pivot,
    "q34_product_profit": q34_product_profit,
    "q35_range_join": q35_range_join,
    "q36_embedding_pairs": q36_embedding_pairs,
    "q37_ivf_ann": q37_ivf_ann,
    "q38_multimodal_decode": q38_multimodal_decode,
    "q39_unpivot": q39_unpivot,
    "q40_stream_replay": q40_stream_replay,
    "q41_dup_clusters": q41_dup_clusters,
    "q42_hash_sample": q42_hash_sample,
    "q43_source_mix": q43_source_mix,
    "q44_bm25_search": q44_bm25_search,
    "q45_incremental_dedup": q45_incremental_dedup,
    "q46_stream_dedup": q46_stream_stateful_dedup,
    "q47_stream_enrich": q47_stream_enrich,
    "q48_last_shipper": q48_last_shipper,
    "q49_stream_attribution": q49_stream_attribution,
    "q50_hll_rollup": q50_hll_rollup,
    "q51_part_value_concentration": q51_part_value_concentration,
    "q52_top_supplier": q52_top_supplier,
    "q53_idle_rich_customers": q53_idle_rich_customers,
    "q54_sequence_packing": q54_sequence_packing,
    "q55_chunk_dedup": q55_chunk_dedup,
    "q56_cms_heavy_hitters": q56_cms_heavy_hitters,
    "q57_kmeans_clusters": q57_kmeans_clusters,
    "q58_order_count_distribution": q58_order_count_distribution,
    "q59_disjunctive_revenue": q59_disjunctive_revenue,
    "q60_large_orders": q60_large_orders,
    "q61_classifier_scores": q61_classifier_scores,
    "q62_embedding_dedup": q62_embedding_dedup,
    "q63_variant_props": q63_variant_props,
    "q64_simhash_pairs": q64_simhash_pairs,
    "q65_contamination": q65_contamination,
    "q66_temperature_mix": q66_temperature_mix,
    "q67_frame_features": q67_frame_features,
    "q68_promo_revenue_share": q68_promo_revenue_share,
    "q69_supplier_part_counts": q69_supplier_part_counts,
    "q70_bilateral_volume": q70_bilateral_volume,
    "q71_shipmode_priority": q71_shipmode_priority,
    "q72_local_supplier_volume": q72_local_supplier_volume,
    "q73_returned_item_customers": q73_returned_item_customers,
    "q74_market_share": q74_market_share,
    "q75_percentiles": q75_percentiles,
    "q76_forecast_revenue": q76_forecast_revenue,
    "q77_cheapest_supplier": q77_cheapest_supplier,
    "q78_epoch_weighting": q78_epoch_weighting,
    "q79_excess_stock": q79_excess_stock_suppliers,
    "q80_winnow_pairs": q80_winnow_pairs,
    "q81_repetition": q81_repetition,
    "q82_redact_pii": q82_redact_pii,
    "q83_small_qty_revenue": q83_small_qty_revenue,
    "q84_token_freq": q84_token_frequencies,
    "q85_language_id": q85_language_id,
    "q86_fingerprint_dups": q86_fingerprint_dups,
    "q87_pq_ann": q87_pq_ann,
    "q88_ivfpq_ann": q88_ivfpq_ann,
    "q89_exact_substring_pairs": q89_exact_substring_pairs,
    "q90_substring_coverage": q90_substring_coverage,
    "q91_semdedup": q91_semdedup,
    "q92_profile_orders": q92_profile_orders,
    "q93_value_histogram": q93_value_histogram,
    "q94_llm_data_pipeline": q94_llm_data_pipeline,
    "q95_value_outliers": q95_value_outliers,
    "q96_hourly_gap_fill": q96_hourly_gap_fill,
    "q97_audio_stats": q97_audio_stats,
    "q98_funnel": q98_funnel,
    "q99_bpe_merge_pairs": q99_bpe_merge_pairs,
    "q100_iqr_outliers": q100_iqr_outliers,
    "q101_rolling_activity": q101_rolling_activity,
    "q102_trigram_counts": q102_trigram_counts,
    "q103_lm_quality_scores": q103_lm_quality_scores,
    "q104_join_key_skew": q104_join_key_skew,
    "q105_price_deciles": q105_price_deciles,
    "q106_measure_correlations": q106_measure_correlations,
    "q107_document_chunks": q107_document_chunks,
    "q108_join_size_estimate": q108_join_size_estimate,
    "q109_trade_pagerank": q109_trade_pagerank,
    "q110_copurchase_triangles": q110_copurchase_triangles,
    "q111_quality_score_auc": q111_quality_score_auc,
    "q112_cdc_apply": q112_cdc_apply,
    "q113_asof_snapshot": q113_asof_snapshot,
    "q114_daily_ohlc": q114_daily_ohlc,
    "q115_fuzzy_name_pairs": q115_fuzzy_name_pairs,
    "q116_tfidf_search": q116_tfidf_search,
    "q117_vocab_encode": q117_vocab_encode,
    "q118_ewma_baseline": q118_ewma_baseline,
    "q119_stream_sliding_windows": q119_stream_sliding_windows,
    "q120_brand_affinity": q120_brand_affinity,
    "q121_event_transitions": q121_event_transitions,
    "q122_fk_integrity": q122_fk_integrity,
    "q123_weighted_sample": q123_weighted_sample,
    "q124_length_calibration": q124_length_calibration,
    "q125_source_signatures": q125_source_signatures,
    "q126_weekly_retention": q126_weekly_retention,
    "q127_type_weekday_mi": q127_type_weekday_mi,
    "q128_split_audit": q128_split_audit,
    "q129_daily_trend": q129_daily_trend,
    "q130_measure_pca": q130_measure_pca,
    "q131_incremental_rollup": q131_incremental_rollup,
    "q132_salted_revenue": q132_salted_revenue,
    "q133_snapshot_diff": q133_snapshot_diff,
    "q134_length_pr_curve": q134_length_pr_curve,
    "q135_image_dhash_dups": q135_image_dhash_dups,
    "q136_system_reconciliation": q136_system_reconciliation,
    "q137_ab_conversion_test": q137_ab_conversion_test,
    "q138_bpe_merges": q138_bpe_merges,
    "q139_nation_communities": q139_nation_communities,
    "q140_sq8_ann": q140_sq8_ann,
    "q141_bloom_admission": q141_bloom_admission,
    "q142_winsorized_prices": q142_winsorized_prices,
    "q143_order_expectations": q143_order_expectations,
    "q144_bpe_tokenize": q144_bpe_tokenize,
    "q145_gopher_rules": q145_gopher_rules,
    "q146_hard_negatives": q146_hard_negatives,
    "q147_mlm_masking": q147_mlm_masking,
    "q148_training_shards": q148_training_shards,
    "q149_source_overlap": q149_source_overlap,
    "q150_pretrain_pipeline_v2": q150_pretrain_pipeline_v2,
    "q151_bloom_pruned_join": q151_bloom_pruned_join,
    "q152_k_anonymity": q152_k_anonymity,
    "q153_audio_fingerprint_dups": q153_audio_fingerprint_dups,
    "q154_c4_line_clean": q154_c4_line_clean,
    "q155_source_kl_drift": q155_source_kl_drift,
    "q156_span_trim": q156_span_trim,
    "q157_dp_release": q157_dp_release,
    "q158_phrase_search": q158_phrase_search,
    "q159_source_diversity": q159_source_diversity,
    "q160_dsir_weights": q160_dsir_weights,
    "q161_chat_sft_prep": q161_chat_sft_prep,
    "q162_ann_recall_audit": q162_ann_recall_audit,
    "q163_curriculum_schedule": q163_curriculum_schedule,
    "q164_stream_admission": q164_stream_admission,
    "q165_incremental_embedding_dedup": q165_incremental_embedding_dedup,
    "q166_tokenizer_fertility": q166_tokenizer_fertility,
    "q167_corrupt_payload_audit": q167_corrupt_payload_audit,
    "q168_repeat_weighting": q168_repeat_weighting,
    "q169_hybrid_retrieval": q169_hybrid_retrieval,
    "q170_fim_transform": q170_fim_transform,
    "q171_copurchase_kcore": q171_copurchase_kcore,
    # q172 is registered OUTSIDE the 50-slot window deliberately: round 6
    # already carries 20 first-time certifications; q172 soaks under
    # selfcheck this round and rotates in as a round-7 head (the same
    # staging the round-4 second-half operators used).
    "q172_fuzzy_decontamination": q172_fuzzy_decontamination,
    # q173/q174 likewise soak outside the window as round-7 heads
    # (registered late round 6; least-certified by construction).
    "q173_temperature_mix": q173_temperature_mix,
    "q174_leakage_split": q174_leakage_split,
    "q175_ccnet_perplexity_tiers": q175_ccnet_perplexity_tiers,
    "q176_token_budget_allocation": q176_token_budget_allocation,
    "q177_packing_budget_sweep": q177_packing_budget_sweep,
    "q178_t5_span_corruption": q178_t5_span_corruption,
    "q179_cluster_balanced_sample": q179_cluster_balanced_sample,
    # the composed new-batch ingest recipe (round 7): quarantine ->
    # dedup-admit -> decontaminate -> pack, one status per doc
    "q180_ingest_recipe": q180_ingest_recipe,
    # round-8 heads, registered OUTSIDE the window deliberately: round 7
    # already carries 30 first-time certifications; these soak under
    # selfcheck + the seed twins first (the q172 playbook)
    "q181_dpo_pairs": q181_dpo_pairs,
    "q182_ul2_denoiser_mix": q182_ul2_denoiser_mix,
    "q183_mmr_diverse_topk": q183_mmr_diverse_topk,
    "q184_rag_context_assembly": q184_rag_context_assembly,
    "q185_quality_survivorship": q185_quality_survivorship,
    "q186_dedup_threshold_sweep": q186_dedup_threshold_sweep,
    "q187_zorder_pruning_audit": q187_zorder_pruning_audit,
    "q188_kmv_set_algebra": q188_kmv_set_algebra,
    "q189_bitext_margin_mining": q189_bitext_margin_mining,
    "q190_gdpr_cascade_audit": q190_gdpr_cascade_audit,
    "q191_compaction_plan": q191_compaction_plan,
    "q192_embedding_drift": q192_embedding_drift,
    "q193_embedding_ood": q193_embedding_ood,
    "q194_padding_waste_audit": q194_padding_waste_audit,
    "q195_dedup_signal_agreement": q195_dedup_signal_agreement,
    "q196_jl_distortion_audit": q196_jl_distortion_audit,
    "q197_batch_knn_join": q197_batch_knn_join,
    "q198_prototype_assignment": q198_prototype_assignment,
    "q199_prefix_cache_grouping": q199_prefix_cache_grouping,
    # round-9 head (built round 8), registered OUTSIDE the window to soak
    # under selfcheck + seed twins first (the q172/q181 playbook):
    # q189's production shape — margin mining over the LSH candidate tier
    "q200_bitext_lsh_mining": q200_bitext_lsh_mining,
    # preference-data analytics: Bradley-Terry source leaderboard + the
    # reward length-bias audit over the same match stream
    "q201_bradley_terry_sources": q201_bradley_terry_sources,
    "q202_preference_length_bias": q202_preference_length_bias,
    # GRPO-style group-relative reward normalization over the rollout
    # stream (events as rollouts, user_id as the prompt group)
    "q203_group_advantage": q203_group_advantage,
    # mergeable KMV quantile estimation with built-in exact-error audit
    "q204_kmv_quantiles": q204_kmv_quantiles,
    # q186's production shape: the threshold sweep over banded-LSH
    # candidates (exact prefix-join kernel kept as the recall yardstick)
    "q205_threshold_sweep_lsh": q205_threshold_sweep_lsh,
    # round-10 heads (built round 9), registered OUTSIDE the window to
    # soak under selfcheck + seed twins first (the standing playbook):
    # durable-index tranche — streaming admission against a PERSISTED
    # LSH index, IVF search over a saved/reloaded partition-pruned
    # index, and MinHash admission from a bucketed catalog table + its
    # persisted skew blacklist
    "q206_stream_lsh_admission": q206_stream_lsh_admission,
    "q207_ivf_persisted_search": q207_ivf_persisted_search,
    "q208_minhash_persisted_admission": q208_minhash_persisted_admission,
    # the index LIFECYCLE halves: admit→append→re-admit over the bucketed
    # MinHash table (the evolving-index ingest cycle) and frozen-quantizer
    # IVF admission (assign against existing centroids, append postings,
    # search the union)
    "q209_minhash_index_evolution": q209_minhash_index_evolution,
    "q210_ivf_incremental_admission": q210_ivf_incremental_admission,
    # the monitoring half of the frozen-quantizer contract: per-list
    # drift audit over the grown persisted postings (the re-cluster
    # decision table)
    "q211_ivf_index_health": q211_ivf_index_health,
    # the per-source "datasheet for datasets" release summary: volumes,
    # language spread, modal language, Gopher pass rate in one scan
    "q212_dataset_datasheet": q212_dataset_datasheet,
    # round-11 heads (built round 10), registered OUTSIDE the window to
    # soak under selfcheck + seed twins first (the standing playbook):
    # the index_store durability story extended to the remaining ANN
    # quantizer tiers — persisted PQ codebooks + codes table, persisted
    # SQ8 stats, and the fully durable IVF-PQ composition (persisted
    # coarse lists × persisted codebooks)
    "q213_pq_persisted_search": q213_pq_persisted_search,
    "q214_sq8_persisted_ann": q214_sq8_persisted_ann,
    "q215_ivfpq_persisted_serving": q215_ivfpq_persisted_serving,
    # the index-lifecycle COMPACTION halves: the q209 MinHash cycle and
    # the q210 IVF cycle with compaction inserted — certified against
    # the UNCOMPACTED oracles (compaction must be semantically
    # invisible; file-count/layout properties pinned in tests)
    "q216_minhash_compacted_evolution": q216_minhash_compacted_evolution,
    "q217_ivf_compacted_search": q217_ivf_compacted_search,
    # round-12 head (built round 11), soaking OUTSIDE the window: the
    # streaming×durable-index composition q206 proved for sign-LSH,
    # extended to the ANN serving stack — frozen-quantizer encode +
    # idempotent append + threshold-triggered compaction INSIDE the
    # stream lifecycle, then q215's serve from reloaded artifacts
    "q218_stream_ivfpq_admission": q218_stream_ivfpq_admission,
    # the fingerprint family joins the durable-index program: persisted
    # banded SimHash postings (lossless pigeonhole blocking, no skew
    # blacklist needed), full admit→append→compact→probe lifecycle
    # through the shared bucketed-table machinery + manifest pattern
    "q219_simhash_persisted_admission": q219_simhash_persisted_admission,
    # round-13 heads (built round 12), soaking OUTSIDE the window: the
    # LEXICAL retrieval family joins the durable-index program — BM25
    # token postings bucketed by token with manifest collection stats
    # (df derived exactly from matched postings, so appends are purely
    # additive), and the positional n-gram phrase index, both through
    # the SHARED crash-safe compact_bucketed_index lifecycle
    "q220_bm25_persisted_lifecycle": q220_bm25_persisted_lifecycle,
    "q221_phrase_persisted_lifecycle": q221_phrase_persisted_lifecycle,
    # the acting half of q211's health audit: rebuild_ivf_index
    # retrains the coarse quantizer (oracle-replayable Lloyd unroll) on
    # the grown population, re-assigns by id-join, rename-aside swaps
    # the artifact version, and serves q207's probe from the reload
    "q222_ivf_rebuild_lifecycle": q222_ivf_rebuild_lifecycle,
    # q169's hybrid production shape with BOTH legs served from durable
    # artifacts (persisted BM25 tier + persisted IVF tier, RRF-fused) —
    # zero session state beyond two model-sized reloads
    "q223_hybrid_persisted_serving": q223_hybrid_persisted_serving,
}

ORACLE_SQL = {
    "q01_pricing_summary": _Q01_SQL,
    "q02_shipping_priority": _Q02_SQL,
    "q03_revenue_by_nation": _Q03_SQL,
    "q04_anti_join": _Q04_SQL,
    "q05_semi_join": _Q05_SQL,
    "q06_window_topn": _Q06_SQL,
    "q07_window_running": _Q07_SQL,
    "q08_rollup": _Q08_SQL,
    "q09_sort_topk": _Q09_SQL,
    "q10_set_ops": _Q10_SQL,
    "q11_distinct_agg": _Q11_SQL,
    "q12_json_props": _Q12_SQL,
    "q13_argmax_maxby": _Q13_SQL,
    "q14_asof_join": _Q14_SQL,
    "q15_tumbling_window": _Q15_SQL,
    "q16_dedup_keep_first": _Q16_SQL,
    "q17_near_dup_pairs": _Q17_SQL,
    "q18_text_stats": _Q18_SQL,
    "q19_knn_cosine": _Q19_SQL,
    "q20_clean_old_dates": _Q20_SQL,
    "q21_upsert_merge": _Q21_SQL,
    "q22_cube": _Q22_SQL,
    "q23_grouping_sets": _Q23_SQL,
    "q24_string_funcs": _Q24_SQL,
    "q25_sessionize": _Q25_SQL,
    "q26_stream_upsert": _Q26_SQL,
    "q27_quality_score": _Q27_SQL,
    "q28_minhash_pairs": _Q28_SQL,
    "q29_simhash": _Q29_SQL,
    "q30_lsh_ann": _Q30_SQL,
    "q31_session_windows": _Q31_SQL,
    "q32_pipeline_e2e": _Q32_SQL,
    "q33_pivot": _Q33_SQL,
    "q34_product_profit": _Q34_SQL,
    "q35_range_join": _Q35_SQL,
    "q36_embedding_pairs": _Q36_SQL,
    "q37_ivf_ann": _Q37_SQL,
    "q38_multimodal_decode": _Q38_SQL,
    "q39_unpivot": _Q39_SQL,
    "q40_stream_replay": _Q40_SQL,
    "q41_dup_clusters": _Q41_SQL,
    "q42_hash_sample": _Q42_SQL,
    "q43_source_mix": _Q43_SQL,
    "q44_bm25_search": _Q44_SQL,
    "q45_incremental_dedup": _Q45_SQL,
    "q46_stream_dedup": _Q46_SQL,
    "q47_stream_enrich": _Q47_SQL,
    "q48_last_shipper": _Q48_SQL,
    "q49_stream_attribution": _Q49_SQL,
    "q50_hll_rollup": _Q50_SQL,
    "q51_part_value_concentration": _Q51_SQL,
    "q52_top_supplier": _Q52_SQL,
    "q53_idle_rich_customers": _Q53_SQL,
    "q54_sequence_packing": _Q54_SQL,
    "q55_chunk_dedup": _Q55_SQL,
    "q56_cms_heavy_hitters": _Q56_SQL,
    "q57_kmeans_clusters": _Q57_SQL,
    "q58_order_count_distribution": _Q58_SQL,
    "q59_disjunctive_revenue": _Q59_SQL,
    "q60_large_orders": _Q60_SQL,
    "q61_classifier_scores": _Q61_SQL,
    "q62_embedding_dedup": _Q62_SQL,
    "q63_variant_props": _Q63_SQL,
    "q64_simhash_pairs": _Q64_SQL,
    "q65_contamination": _Q65_SQL,
    "q66_temperature_mix": _Q66_SQL,
    "q67_frame_features": _Q67_SQL,
    "q68_promo_revenue_share": _Q68_SQL,
    "q69_supplier_part_counts": _Q69_SQL,
    "q70_bilateral_volume": _Q70_SQL,
    "q71_shipmode_priority": _Q71_SQL,
    "q72_local_supplier_volume": _Q72_SQL,
    "q73_returned_item_customers": _Q73_SQL,
    "q74_market_share": _Q74_SQL,
    "q75_percentiles": _Q75_SQL,
    "q76_forecast_revenue": _Q76_SQL,
    "q77_cheapest_supplier": _Q77_SQL,
    "q78_epoch_weighting": _Q78_SQL,
    "q79_excess_stock": _Q79_SQL,
    "q80_winnow_pairs": _Q80_SQL,
    "q81_repetition": _Q81_SQL,
    "q82_redact_pii": _Q82_SQL,
    "q83_small_qty_revenue": _Q83_SQL,
    "q84_token_freq": _Q84_SQL,
    "q85_language_id": _Q85_SQL,
    "q86_fingerprint_dups": _Q86_SQL,
    "q87_pq_ann": _Q87_SQL,
    "q88_ivfpq_ann": _Q88_SQL,
    "q89_exact_substring_pairs": _Q89_SQL,
    "q90_substring_coverage": _Q90_SQL,
    "q91_semdedup": _Q91_SQL,
    "q92_profile_orders": _Q92_SQL,
    "q93_value_histogram": _Q93_SQL,
    "q94_llm_data_pipeline": _Q94_SQL,
    "q95_value_outliers": _Q95_SQL,
    "q96_hourly_gap_fill": _Q96_SQL,
    "q97_audio_stats": _Q97_SQL,
    "q98_funnel": _Q98_SQL,
    "q99_bpe_merge_pairs": _Q99_SQL,
    "q100_iqr_outliers": _Q100_SQL,
    "q101_rolling_activity": _Q101_SQL,
    "q102_trigram_counts": _Q102_SQL,
    "q103_lm_quality_scores": _Q103_SQL,
    "q104_join_key_skew": _Q104_SQL,
    "q105_price_deciles": _Q105_SQL,
    "q106_measure_correlations": _q106_sql(),
    "q107_document_chunks": _Q107_SQL,
    "q108_join_size_estimate": _Q108_SQL,
    "q109_trade_pagerank": _Q109_SQL,
    "q110_copurchase_triangles": _Q110_SQL,
    "q111_quality_score_auc": _Q111_SQL,
    "q112_cdc_apply": _Q112_SQL,
    "q113_asof_snapshot": _Q113_SQL,
    "q114_daily_ohlc": _Q114_SQL,
    "q115_fuzzy_name_pairs": _Q115_SQL,
    "q116_tfidf_search": _Q116_SQL,
    "q117_vocab_encode": _Q117_SQL,
    "q118_ewma_baseline": _Q118_SQL,
    "q119_stream_sliding_windows": _Q119_SQL,
    "q120_brand_affinity": _Q120_SQL,
    "q121_event_transitions": _Q121_SQL,
    "q122_fk_integrity": _Q122_SQL,
    "q123_weighted_sample": _Q123_SQL,
    "q124_length_calibration": _Q124_SQL,
    "q125_source_signatures": _Q125_SQL,
    "q126_weekly_retention": _Q126_SQL,
    "q127_type_weekday_mi": _Q127_SQL,
    "q128_split_audit": _q128_sql(),
    "q129_daily_trend": _Q129_SQL,
    "q130_measure_pca": _q130_sql(),
    "q131_incremental_rollup": _Q131_SQL,
    "q132_salted_revenue": _Q132_SQL,
    "q133_snapshot_diff": _Q133_SQL,
    "q134_length_pr_curve": _Q134_SQL,
    "q135_image_dhash_dups": _q135_sql(),
    "q136_system_reconciliation": _Q136_SQL,
    "q137_ab_conversion_test": _q137_sql(),
    "q138_bpe_merges": _q138_sql(),
    "q139_nation_communities": _q139_sql(),
    "q140_sq8_ann": _Q140_SQL,
    "q141_bloom_admission": _Q141_SQL,
    "q142_winsorized_prices": _Q142_SQL,
    "q143_order_expectations": _Q143_SQL,
    "q144_bpe_tokenize": _q144_sql(),
    "q145_gopher_rules": _Q145_SQL,
    "q146_hard_negatives": _Q146_SQL,
    "q147_mlm_masking": _Q147_SQL,
    "q148_training_shards": _Q148_SQL,
    "q149_source_overlap": _Q149_SQL,
    "q150_pretrain_pipeline_v2": _Q150_SQL,
    "q151_bloom_pruned_join": _Q151_SQL,
    "q152_k_anonymity": _Q152_SQL,
    "q153_audio_fingerprint_dups": _q153_sql(),
    "q154_c4_line_clean": _Q154_SQL,
    "q155_source_kl_drift": _Q155_SQL,
    "q156_span_trim": _Q156_SQL,
    "q157_dp_release": _Q157_SQL,
    "q158_phrase_search": _Q158_SQL,
    "q159_source_diversity": _Q159_SQL,
    "q160_dsir_weights": _Q160_SQL,
    "q161_chat_sft_prep": _Q161_SQL,
    "q162_ann_recall_audit": _Q162_SQL,
    "q163_curriculum_schedule": _Q163_SQL,
    "q164_stream_admission": _Q164_SQL,
    "q165_incremental_embedding_dedup": _Q165_SQL,
    "q166_tokenizer_fertility": _q166_sql(),
    "q167_corrupt_payload_audit": _Q167_SQL,
    "q168_repeat_weighting": _Q168_SQL,
    "q169_hybrid_retrieval": _Q169_SQL,
    "q170_fim_transform": _Q170_SQL,
    "q171_copurchase_kcore": _q171_sql(),
    "q172_fuzzy_decontamination": _Q172_SQL,
    "q173_temperature_mix": _Q173_SQL,
    "q174_leakage_split": _Q174_SQL,
    "q175_ccnet_perplexity_tiers": _Q175_SQL,
    "q176_token_budget_allocation": _Q176_SQL,
    "q177_packing_budget_sweep": _Q177_SQL,
    "q178_t5_span_corruption": _Q178_SQL,
    "q179_cluster_balanced_sample": _Q179_SQL,
    "q180_ingest_recipe": _Q180_SQL,
    "q181_dpo_pairs": _Q181_SQL,
    "q182_ul2_denoiser_mix": _Q182_SQL,
    "q183_mmr_diverse_topk": _Q183_SQL,
    "q184_rag_context_assembly": _Q184_SQL,
    "q185_quality_survivorship": _Q185_SQL,
    "q186_dedup_threshold_sweep": _Q186_SQL,
    "q187_zorder_pruning_audit": _Q187_SQL,
    "q188_kmv_set_algebra": _Q188_SQL,
    "q189_bitext_margin_mining": _Q189_SQL,
    "q190_gdpr_cascade_audit": _Q190_SQL,
    "q191_compaction_plan": _Q191_SQL,
    "q192_embedding_drift": _Q192_SQL,
    "q193_embedding_ood": _Q193_SQL,
    "q194_padding_waste_audit": _Q194_SQL,
    "q195_dedup_signal_agreement": _Q195_SQL,
    "q196_jl_distortion_audit": _q196_sql(),
    "q197_batch_knn_join": _Q197_SQL,
    "q198_prototype_assignment": _Q198_SQL,
    "q199_prefix_cache_grouping": _Q199_SQL,
    "q200_bitext_lsh_mining": _Q200_SQL,
    "q201_bradley_terry_sources": _q201_sql(),
    "q202_preference_length_bias": _Q202_SQL,
    "q203_group_advantage": _Q203_SQL,
    "q204_kmv_quantiles": _Q204_SQL,
    "q205_threshold_sweep_lsh": _Q205_SQL,
    "q206_stream_lsh_admission": _Q206_SQL,
    "q207_ivf_persisted_search": _Q207_SQL,
    "q208_minhash_persisted_admission": _Q208_SQL,
    "q209_minhash_index_evolution": _Q209_SQL,
    "q210_ivf_incremental_admission": _Q210_SQL,
    "q211_ivf_index_health": _Q211_SQL,
    "q212_dataset_datasheet": _Q212_SQL,
    "q213_pq_persisted_search": _Q213_SQL,
    "q214_sq8_persisted_ann": _Q214_SQL,
    "q215_ivfpq_persisted_serving": _Q215_SQL,
    "q216_minhash_compacted_evolution": _Q216_SQL,
    "q217_ivf_compacted_search": _Q217_SQL,
    "q218_stream_ivfpq_admission": _Q218_SQL,
    "q219_simhash_persisted_admission": _Q219_SQL,
    "q220_bm25_persisted_lifecycle": _Q220_SQL,
    "q221_phrase_persisted_lifecycle": _Q221_SQL,
    "q222_ivf_rebuild_lifecycle": _Q222_SQL,
    "q223_hybrid_persisted_serving": _Q223_SQL,
}

# ---------------------------------------------------------------------------
# Gate-window ordering
#
# The driver's CORRECTNESS artifact records only the FIRST 50 registry
# entries; the rest are verified by selfcheck.py. Registration order is
# therefore a certification decision: the window must hold one
# representative of EVERY operator family, rotating the newest (least
# soaked) family heads in. Round 4 rotates the round-3 families
# (q88/q90-q96: IVF-PQ ANN, exact-substring coverage, SemDeDup,
# profiler, histogram, admission pipeline, z-score screen, gap fill) into
# the window, displacing near-duplicates whose family keeps an in-window
# sibling: q05 (anti/semi kept by q04), q07 (windows by q06),
# q11/q22/q23/q39 (grouping/pivot family by q08 + q33), q25 (sessions by
# q31), q40/q49 (streaming by q15/q26/q31/q46/q47), q43 (sampling by
# q42). The round-4 second half frees three more ANN slots — q37
# IVF-flat and q87 PQ are both composed inside in-window q88 IVF-PQ
# (whose tests pin composition == restriction), and q89's
# exact-substring pair machinery is q90's first stage — to certify three
# round-4 family heads: q109 (iterative graph), q135 (vision dedup),
# q138 (BPE tokenizer training). Query NAMES are stable — only dict
# insertion order changes.
#
# Round 5 continues the playbook one generation later: the round-4 hard
# artifact (CORRECTNESS_r04.json) certified q90/q91/q93/q94/q95, so they
# rotate out — q90 substring coverage (q89 sibling machinery, certified
# r04), q91 SemDeDup (embedding-dedup family keeps q36/q88 in-window),
# q93 histogram + q95 z-score outliers (profiler family keeps its head
# q92), and q94 admission pipeline v1 (directly SUPERSEDED by in-window
# q150 pipeline v2, the same composition plus Gopher/MLM/shard/audit
# stages). Their five slots certify five round-4-second-half family
# heads never yet seen by the driver: q139 (label propagation — the
# second iterative-graph algorithm), q144 (BPE apply — closes the
# train→apply round trip with in-window q138), q150 (admission pipeline
# v2), q151 (Bloom-pruned join — the certified-equivalence discipline),
# q153 (audio fingerprint dedup — the acoustic twin of in-window q135).
# ---------------------------------------------------------------------------

_ROTATED_OUT = [
    "q05_semi_join",
    "q07_window_running",
    "q11_distinct_agg",
    "q22_cube",
    "q23_grouping_sets",
    "q25_sessionize",
    "q37_ivf_ann",
    "q39_unpivot",
    "q40_stream_replay",
    "q43_source_mix",
    "q49_stream_attribution",
]
_ROTATED_IN = [
    "q88_ivfpq_ann",
    "q90_substring_coverage",
    "q91_semdedup",
    "q92_profile_orders",
    "q93_value_histogram",
    "q94_llm_data_pipeline",
    "q95_value_outliers",
    "q96_hourly_gap_fill",
    "q109_trade_pagerank",
    "q135_image_dhash_dups",
    "q138_bpe_merges",
]
_R5_OUT = [
    "q90_substring_coverage",
    "q91_semdedup",
    "q93_value_histogram",
    "q94_llm_data_pipeline",
    "q95_value_outliers",
]
_R5_IN = [
    "q139_nation_communities",
    "q144_bpe_tokenize",
    "q150_pretrain_pipeline_v2",
    "q151_bloom_pruned_join",
    "q153_audio_fingerprint_dups",
]
# The five operators built new THIS round (q154-q158) take window slots
# too — they are the least-soaked heads by definition. Displaced:
# q88/q92/q109/q135/q138, all certified green in CORRECTNESS_r04 and each
# with an in-window family sibling (ANN keeps q30/q36; profiling keeps
# q157 + the q142/q143 selfcheck siblings; graph keeps q139; multimodal
# keeps q153; BPE keeps q144).
_R5B_OUT = [
    "q88_ivfpq_ann",
    "q92_profile_orders",
    "q109_trade_pagerank",
    "q135_image_dhash_dups",
    "q138_bpe_merges",
    # second r5 wave: r04-certified, families keep in-window siblings
    # (retrieval keeps q158; dedup keeps q16/q17/q28/q45/q156; the
    # similarity slots pass to the q162 audit + q165 lookup in the
    # later waves below)
    "q36_embedding_pairs",
    "q44_bm25_search",
    "q29_simhash",
    # third r5 wave (ANN family keeps q19 + the q162 audit itself;
    # sampling keeps q163)
    "q30_lsh_ann",
    "q42_hash_sample",
    # streaming family keeps q26/q31/q46/q47 + the new q164 head
    "q15_tumbling_window",
    # ANN family keeps q162 + q165 (the exact kNN baseline lives inside
    # the q162 audit)
    "q19_knn_cosine",
    # sketches family keeps in-window q151 (Bloom-pruned join)
    "q50_hll_rollup",
]
_R5B_IN = [
    "q154_c4_line_clean",
    "q155_source_kl_drift",
    "q156_span_trim",
    "q157_dp_release",
    "q158_phrase_search",
    "q159_source_diversity",
    "q160_dsir_weights",
    "q161_chat_sft_prep",
    "q162_ann_recall_audit",
    "q163_curriculum_schedule",
    "q164_stream_admission",
    "q165_incremental_embedding_dedup",
    "q166_tokenizer_fertility",
]
# Round 6 burns down the certification debt head-on: every r5-window
# query is now r05-certified, so sixteen of them cede their slots to the
# fifteen NEVER-driver-certified heads the round-5 verdict ranked
# riskiest, plus the new q167 corrupt-payload decode audit. Displaced
# (each r05-certified, family keeps an in-window sibling):
#   q02 join+agg+top-k (q03 join-agg, q06 top-n stay)
#   q04 anti join      (q48 NOT-EXISTS anti with non-equi conjuncts)
#   q09 sort/top-k     (q06 window top-n, q158 heap top-k)
#   q16 keep-first     (dedup keeps q17 + incoming q64/q89/q149)
#   q20 date clamp     (q32 pipeline e2e runs the same clamp stage)
#   q21 upsert         (q32 e2e upsert + incoming q112/q113 merge family)
#   q24 string funcs   (q18 text stats, q154 line-cleaning HOFs)
#   q27 quality score  (q18/q159 + q150's Gopher quality gates)
#   q28 minhash LSH    (banding kept by q165's LSH-bucketed lookup + q17)
#   q33 pivot          (q08 rollup — same precedent as r4's q22/q23/q39)
#   q34 product profit (q01/q03 relational agg)
#   q35 range join     (q14 as-of + incoming q132 salted join)
#   q41 CC clusters    (graph keeps q139 + incoming q110; dedup keeps q17)
#   q45 incr. minhash  (q165 is the same admission shape, in-window)
#   q46/q47 streaming  (q26/q31/q164 stay)
# Incoming, first driver certification for each: q57 k-means, q64
# SimHash pairs, q87 PQ, q89 exact-substring pairs, q102 trigram tables,
# q110 triangles, q112 CDC apply, q113 SCD2 snapshot, q116 TF-IDF, q123
# weighted sampling, q126 retention (funnel family's first hard row),
# q130 PCA, q132 salted-join equivalence, q140 SQ8 (the ADVICE-fixed
# boundary), q149 overlap matrix, q167 corrupt-payload routing (new).
_R6_OUT = [
    "q02_shipping_priority",
    "q04_anti_join",
    "q09_sort_topk",
    "q16_dedup_keep_first",
    "q20_clean_old_dates",
    "q21_upsert_merge",
    "q24_string_funcs",
    "q27_quality_score",
    "q28_minhash_pairs",
    "q33_pivot",
    "q34_product_profit",
    "q35_range_join",
    "q41_dup_clusters",
    "q45_incremental_dedup",
    "q46_stream_dedup",
    "q47_stream_enrich",
]
_R6_IN = [
    "q57_kmeans_clusters",
    "q64_simhash_pairs",
    "q87_pq_ann",
    "q89_exact_substring_pairs",
    "q102_trigram_counts",
    "q110_copurchase_triangles",
    "q112_cdc_apply",
    "q113_asof_snapshot",
    "q116_tfidf_search",
    "q123_weighted_sample",
    "q126_weekly_retention",
    "q130_measure_pca",
    "q132_salted_revenue",
    "q140_sq8_ann",
    "q149_source_overlap",
    "q167_corrupt_payload_audit",
]
# Second r6 wave: the four operators built new this round take window
# slots too (least-soaked by definition). Displaced — each r05-certified
# with in-window family siblings: q154 C4 line cleaning + q159 lexical
# diversity (text family keeps q18/q155/q156/q160/q161/q166), q163
# curriculum schedule (sampling family keeps the newly rotated-in q123),
# q139 label propagation (graph family keeps rotated-in q110 triangles
# plus the new q171 k-core).
_R6B_OUT = [
    "q154_c4_line_clean",
    "q159_source_diversity",
    "q163_curriculum_schedule",
    "q139_nation_communities",
]
_R6B_IN = [
    "q168_repeat_weighting",
    "q169_hybrid_retrieval",
    "q170_fim_transform",
    "q171_copurchase_kcore",
]
# Third r6 wave — accelerated debt burn-down. Fourteen more r05-certified
# members cede slots to fourteen never-driver-certified heads; after this
# wave the window carries 34 first-time slots, cutting the remaining
# backlog to two rotation rounds. Displaced → incoming with the family
# sibling that keeps each displaced family represented:
#   q96 gap fill        → q101 rolling / q114 OHLC (timeseries stays 2-deep)
#   q13 argmax          → (nested family keeps q12 json/VARIANT)
#   q144 BPE apply      → q99 BPE merge pairs (q166 fertility still
#                         composes train→apply in-window)
#   q157 DP release     → q152 k-anonymity (the privacy sibling)
#   q151 Bloom join     → q141 Bloom admission (sketch family swap)
#   q155 KL drift       → q84 token frequencies (token-distribution)
#   q160 DSIR           → q103 bigram-LM quality scores (same family)
#   q162 recall audit   → q62 embedding-dedup pipeline (ANN keeps
#                         q87 PQ / q140 SQ8 / q165 admission)
#   q38 BMP decode      → q67 frame features (multimodal keeps q153/q167)
#   q17 ngram pairs     → q86 fingerprint dups (dedup keeps q64/q89/
#                         q149/q156)
#   q32 pipeline e2e    → q148 training shards (pipeline keeps q150)
#   q14 as-of join      → q115 fuzzy name pairs (joins keep q48/q132)
#   q26 stream upsert   → q119 sliding windows (streaming keeps q31/q164)
#   q18 text stats      → q85 language id (text keeps q102/q156/q161/q166)
_R6C_OUT = [
    "q96_hourly_gap_fill",
    "q13_argmax_maxby",
    "q144_bpe_tokenize",
    "q157_dp_release",
    "q151_bloom_pruned_join",
    "q155_source_kl_drift",
    "q160_dsir_weights",
    "q162_ann_recall_audit",
    "q38_multimodal_decode",
    "q17_near_dup_pairs",
    "q32_pipeline_e2e",
    "q14_asof_join",
    "q26_stream_upsert",
    "q18_text_stats",
]
_R6C_IN = [
    "q101_rolling_activity",
    "q114_daily_ohlc",
    "q99_bpe_merge_pairs",
    "q152_k_anonymity",
    "q141_bloom_admission",
    "q84_token_freq",
    "q103_lm_quality_scores",
    "q62_embedding_dedup",
    "q67_frame_features",
    "q86_fingerprint_dups",
    "q148_training_shards",
    "q115_fuzzy_name_pairs",
    "q119_stream_sliding_windows",
    "q85_language_id",
]

# Round 7 carries the largest first-time wave yet — 30 slots — because
# every member of the round-6 window earned its hard CORRECTNESS_r06 row,
# so all 50 are rotation-eligible. Incoming, never driver-certified:
# the nine round-7 heads (q172-q179 soaked under selfcheck + two
# seed-varied twins since round 6; q180 is the new composed ingest
# recipe), the ten analytics-residue queries with real algorithmic
# content the r6 verdict named (q106 correlations, q111 AUC, q117 vocab
# encode, q131 incremental rollup, q133 snapshot diff, q142 winsorize,
# q143 expectations, q145 Gopher, q146 hard negatives, q147 MLM), and
# eleven members of the q51-q104 block (packing, chunk dedup, CMS,
# exact decontamination, temperature mix v1, epoch weighting, winnowing,
# repetition, PII redaction, funnel, join-skew). Displaced → sibling:
#   q153 audio dups      → q167 multimodal stays
#   q156 span trim       → q89 exact-substring stays
#   q158 phrase search   → q116 TF-IDF + q169 RRF stay
#   q161 chat SFT        → q85/q103 text stay; q81/q82 incoming
#   q164 stream admission→ q31 sessions stays
#   q165 embed admission → q140 ANN stays; q180 carries admission
#   q166 fertility       → q99 BPE pairs stays; q117 incoming
#   q57 k-means          → q179 incoming composes the same fit
#   q64 simhash          → q89/q86 stay; q55/q80 incoming
#   q87 PQ ANN           → q140 SQ8 stays
#   q102 trigrams        → q103 LM scores stays
#   q110 triangles       → q171 k-core stays
#   q112 CDC + q113 SCD2 → q131/q133 incoming (merge family)
#   q123 weighted sample → q173/q176/q177/q179 incoming
#   q126 retention       → q98 funnel incoming
#   q130 PCA             → q106/q111/q142/q143 incoming (profile)
#   q132 salted join     → q48 stays; q104 skew incoming
#   q149 source overlap  → q86 fingerprints stays
#   q168 repeat weight   → q86 stays; q78 epoch weighting incoming
#   q170 FIM             → q147 MLM + q178 T5 incoming (transforms)
#   q101 rolling         → q114 OHLC stays (timeseries)
#   q152 k-anonymity     → q82 PII redaction incoming (privacy)
#   q141 bloom admission → q56 CMS incoming (sketches)
#   q84 token freq       → q103 stays; q66/q117 incoming
#   q62 embedding dedup  → q140 stays; q179 incoming
#   q67 frame features   → q167 multimodal stays
#   q148 shards          → q150 stays; q54/q180 incoming
#   q115 fuzzy names     → q48 stays (joins)
#   q119 sliding windows → q31 stays (streaming)
_R7_OUT = [
    "q153_audio_fingerprint_dups",
    "q156_span_trim",
    "q158_phrase_search",
    "q161_chat_sft_prep",
    "q164_stream_admission",
    "q165_incremental_embedding_dedup",
    "q166_tokenizer_fertility",
    "q57_kmeans_clusters",
    "q64_simhash_pairs",
    "q87_pq_ann",
    "q102_trigram_counts",
    "q110_copurchase_triangles",
    "q112_cdc_apply",
    "q113_asof_snapshot",
    "q123_weighted_sample",
    "q126_weekly_retention",
    "q130_measure_pca",
    "q132_salted_revenue",
    "q149_source_overlap",
    "q168_repeat_weighting",
    "q170_fim_transform",
    "q101_rolling_activity",
    "q152_k_anonymity",
    "q141_bloom_admission",
    "q84_token_freq",
    "q62_embedding_dedup",
    "q67_frame_features",
    "q148_training_shards",
    "q115_fuzzy_name_pairs",
    "q119_stream_sliding_windows",
]
_R7_IN = [
    "q172_fuzzy_decontamination",
    "q173_temperature_mix",
    "q174_leakage_split",
    "q175_ccnet_perplexity_tiers",
    "q176_token_budget_allocation",
    "q177_packing_budget_sweep",
    "q178_t5_span_corruption",
    "q179_cluster_balanced_sample",
    "q180_ingest_recipe",
    "q106_measure_correlations",
    "q111_quality_score_auc",
    "q117_vocab_encode",
    "q131_incremental_rollup",
    "q133_snapshot_diff",
    "q142_winsorized_prices",
    "q143_order_expectations",
    "q145_gopher_rules",
    "q146_hard_negatives",
    "q147_mlm_masking",
    "q54_sequence_packing",
    "q55_chunk_dedup",
    "q56_cms_heavy_hitters",
    "q65_contamination",
    "q66_temperature_mix",
    "q78_epoch_weighting",
    "q80_winnow_pairs",
    "q81_repetition",
    "q82_redact_pii",
    "q98_funnel",
    "q104_join_key_skew",
]

# Round 8 is the certification-debt payoff round: every round-7 window
# member except q117 earned its hard CORRECTNESS_r07 row, so 41 slots are
# rotation-eligible. The window keeps ONLY the eight ever-standing heads
# (q01/q03/q06/q08/q10/q12/q31/q48 — certified every round since r01/r03,
# the cross-round regression anchors for scan/join/agg/window/set/nested/
# streaming) plus q117 (round-7's one red, now emitting driver-canonical
# scalar ids — the retry). All 41 incoming slots are never-certified:
# the 19 round-8 heads q181–q199 (soaked under selfcheck + three
# seed-varied twins since round 7) and 22 of the 37 pre-r7 residue
# queries, preferring distinct algorithmic content (percentile/forecast/
# MI/AB-test/PR-curve/EWMA/chunking/signatures) over TPC-H join-agg
# variants whose families keep in-window siblings. Displaced → sibling:
#   q150/q180 pipelines   → certified r05–r07 twice over; q128 split audit
#                           + q136 reconciliation carry the audit family
#   q89/q86/q55/q80/q65/q172 dedup → q185/q186/q195 incoming (dedup)
#   q140/q116/q169 ANN/retrieval   → q183/q184/q189/q196/q197 incoming
#   q167 multimodal       → q97 audio stats incoming (multimodal)
#   q171 k-core           → q121 event transitions incoming (graph-ish);
#                           k-core certified r06+r07
#   q114 OHLC             → q118 EWMA + q129 daily trend incoming
#   q99/q85/q103 text     → q117 stays; q124/q125/q134/q199 incoming
#   q147/q178 transforms  → q181/q182 incoming (DPO, UL2)
#   q173–q177/q179 mix/sample → q194 padding audit incoming; all have r07
#   q106/q111/q142/q143/q145/q146 profile → q100/q105/q122/q127/q137 in
#   q131/q133 merge/diff  → q136 system reconciliation incoming
#   q56 CMS sketch        → q188 KMV incoming (sketches)
#   q82 PII privacy       → q190 GDPR cascade incoming
#   q54 packing           → q194 incoming (packing)
#   q104 skew join        → q48 stays (joins)
#   q98/q66/q78/q81       → families keep q08 rollup / q173-class mixes
#                           outside-window soak; all r07-certified
# Deferred residue (15, next round's window): q51/q52/q53/q58/q59/q60/
# q68/q69/q70/q71/q72/q73/q77/q79/q83 — TPC-H join-agg variants whose
# shapes q01/q03/q48/q74 cover in-window this round.
_R8_OUT = [
    "q150_pretrain_pipeline_v2",
    "q89_exact_substring_pairs",
    "q116_tfidf_search",
    "q140_sq8_ann",
    "q167_corrupt_payload_audit",
    "q169_hybrid_retrieval",
    "q171_copurchase_kcore",
    "q114_daily_ohlc",
    "q99_bpe_merge_pairs",
    "q103_lm_quality_scores",
    "q86_fingerprint_dups",
    "q85_language_id",
    "q172_fuzzy_decontamination",
    "q173_temperature_mix",
    "q174_leakage_split",
    "q175_ccnet_perplexity_tiers",
    "q176_token_budget_allocation",
    "q177_packing_budget_sweep",
    "q178_t5_span_corruption",
    "q179_cluster_balanced_sample",
    "q180_ingest_recipe",
    "q106_measure_correlations",
    "q111_quality_score_auc",
    "q131_incremental_rollup",
    "q133_snapshot_diff",
    "q142_winsorized_prices",
    "q143_order_expectations",
    "q145_gopher_rules",
    "q146_hard_negatives",
    "q147_mlm_masking",
    "q54_sequence_packing",
    "q55_chunk_dedup",
    "q56_cms_heavy_hitters",
    "q65_contamination",
    "q66_temperature_mix",
    "q78_epoch_weighting",
    "q80_winnow_pairs",
    "q81_repetition",
    "q82_redact_pii",
    "q98_funnel",
    "q104_join_key_skew",
]
_R8_IN = [
    "q181_dpo_pairs",
    "q182_ul2_denoiser_mix",
    "q183_mmr_diverse_topk",
    "q184_rag_context_assembly",
    "q185_quality_survivorship",
    "q186_dedup_threshold_sweep",
    "q187_zorder_pruning_audit",
    "q188_kmv_set_algebra",
    "q189_bitext_margin_mining",
    "q190_gdpr_cascade_audit",
    "q191_compaction_plan",
    "q192_embedding_drift",
    "q193_embedding_ood",
    "q194_padding_waste_audit",
    "q195_dedup_signal_agreement",
    "q196_jl_distortion_audit",
    "q197_batch_knn_join",
    "q198_prototype_assignment",
    "q199_prefix_cache_grouping",
    "q74_market_share",
    "q61_classifier_scores",
    "q63_variant_props",
    "q75_percentiles",
    "q76_forecast_revenue",
    "q97_audio_stats",
    "q100_iqr_outliers",
    "q105_price_deciles",
    "q107_document_chunks",
    "q108_join_size_estimate",
    "q118_ewma_baseline",
    "q120_brand_affinity",
    "q121_event_transitions",
    "q122_fk_integrity",
    "q124_length_calibration",
    "q125_source_signatures",
    "q127_type_weekday_mi",
    "q128_split_audit",
    "q129_daily_trend",
    "q134_length_pr_curve",
    "q136_system_reconciliation",
    "q137_ab_conversion_test",
]

# Round 9 drives never-certified to ZERO: the only 21 registered queries
# without a hard CORRECTNESS row anywhere in r01–r08 are the six round-9
# heads q200–q205 (soaked under selfcheck + FOUR seed/size-varied twins
# since round 8) and the 15-query q51–q83 TPC-H join-agg residue the r8
# rotation deferred. All 21 rotate in. The window keeps the eight
# ever-standing heads (q01/q03/q06/q08/q10/q12/q31/q48), q117 (the
# former red, now twice green), the 19 round-8 heads q181–q199 (their
# second consecutive certification round — the soak-then-anchor
# pattern), and q74 market share (the in-window TPC-H join-agg anchor
# for the incoming residue's family). Displaced — every one earned its
# first hard row in r08 and keeps a family sibling in-window:
#   q61/q100/q105/q75/q76 profile/percentile → q08 rollup + q105's
#       decile shape lives on in incoming q58's distribution
#   q97 audio stats        → multimodal family certified r06–r08
#   q107 chunks, q124/q125/q134 text calib → q199 prefix-cache stays
#   q108 join estimate     → q48 joins stay; q70/q72 joins incoming
#   q118 EWMA / q129 trend → q06 window family stays
#   q120/q121/q127 affinity/transitions/MI → q03/q74 join-agg stay
#   q122 FK integrity      → q48 anti-join stays; q73 incoming
#   q128 split audit / q136 reconciliation / q137 AB test →
#       q194 padding audit + q195 agreement matrix stay (audit family)
#   q63 variant props      → q12 JSON/VARIANT stays
_R9_OUT = [
    "q61_classifier_scores",
    "q63_variant_props",
    "q75_percentiles",
    "q76_forecast_revenue",
    "q97_audio_stats",
    "q100_iqr_outliers",
    "q105_price_deciles",
    "q107_document_chunks",
    "q108_join_size_estimate",
    "q118_ewma_baseline",
    "q120_brand_affinity",
    "q121_event_transitions",
    "q122_fk_integrity",
    "q124_length_calibration",
    "q125_source_signatures",
    "q127_type_weekday_mi",
    "q128_split_audit",
    "q129_daily_trend",
    "q134_length_pr_curve",
    "q136_system_reconciliation",
    "q137_ab_conversion_test",
]
_R9_IN = [
    "q200_bitext_lsh_mining",
    "q201_bradley_terry_sources",
    "q202_preference_length_bias",
    "q203_group_advantage",
    "q204_kmv_quantiles",
    "q205_threshold_sweep_lsh",
    "q51_part_value_concentration",
    "q52_top_supplier",
    "q53_idle_rich_customers",
    "q58_order_count_distribution",
    "q59_disjunctive_revenue",
    "q60_large_orders",
    "q68_promo_revenue_share",
    "q69_supplier_part_counts",
    "q70_bilateral_volume",
    "q71_shipmode_priority",
    "q72_local_supplier_volume",
    "q73_returned_item_customers",
    "q77_cheapest_supplier",
    "q79_excess_stock",
    "q83_small_qty_revenue",
]

# Round 10 takes never-certified to ZERO for the first time: the only
# registered queries without a hard CORRECTNESS row anywhere in r01–r09
# are the seven round-10 heads q206–q212 (the durable-index tranche +
# the dataset datasheet, soaked under selfcheck + FOUR seed/size/dup
# twins since round 9). All seven rotate in. The window keeps the eight
# ever-standing heads (q01/q03/q06/q08/q10/q12/q31/q48), q117, the 19
# round-8 heads q181–q199 (third consecutive certification), q74, the
# six round-9 heads q200–q205 (second consecutive — the soak-then-
# anchor pattern), and 8 of the 15 TPC-H residue queries. Displaced —
# every one earned its first hard row in r09 and keeps a family
# sibling in-window:
#   q51 value concentration → q01 pricing agg + q58 distribution stay
#   q52 top supplier        → q77 cheapest supplier stays (same
#                             correlated-min shape)
#   q59 disjunctive revenue → q68 promo share stays (OR-filter agg)
#   q60 large orders        → q53 idle-rich stays (HAVING-agg gate)
#   q70 bilateral volume    → q72 local supplier volume stays (same
#                             multi-join volume shape)
#   q71 shipmode priority   → q08 rollup + q73 returned-items stay
#   q83 small-qty revenue   → q79 excess stock stays (nested-agg
#                             threshold filter)
_R10_OUT = [
    "q51_part_value_concentration",
    "q52_top_supplier",
    "q59_disjunctive_revenue",
    "q60_large_orders",
    "q70_bilateral_volume",
    "q71_shipmode_priority",
    "q83_small_qty_revenue",
]
_R10_IN = [
    "q206_stream_lsh_admission",
    "q207_ivf_persisted_search",
    "q208_minhash_persisted_admission",
    "q209_minhash_index_evolution",
    "q210_ivf_incremental_admission",
    "q211_ivf_index_health",
    "q212_dataset_datasheet",
]

# Round 11 takes never-certified back to ZERO: the only registered
# queries without a hard CORRECTNESS row anywhere in r01–r10 are the
# five round-10 heads q213–q217 (the durable-PQ/SQ8/compaction tranche,
# soaked under selfcheck + FIVE seed/size/dup twins since round 10).
# All five rotate in. The window keeps the eight ever-standing heads,
# q117, q74, 14 of the 19 round-8 heads, q200–q205 (third consecutive),
# the 8 TPC-H residue anchors, and q206–q212 (second consecutive — the
# soak-then-anchor pattern). Displaced — every one has THREE
# consecutive hard rows (r08/r09/r10) and keeps a family sibling
# in-window:
#   q186 dedup threshold sweep → q205 threshold_sweep_lsh stays (its
#       certified production tier, same sweep semantics)
#   q188 KMV set algebra       → q204 kmv_quantiles stays (KMV sketch)
#   q189 bitext margin mining  → q200 bitext_lsh_mining stays (bitext)
#   q191 compaction plan       → incoming q216/q217 EXECUTE the
#       compaction lifecycle the plan query only recommends
#   q197 batch kNN join        → q183 MMR + q198 prototype assignment
#       stay; incoming q213/q215 are the ANN serving family
_R11_OUT = [
    "q186_dedup_threshold_sweep",
    "q188_kmv_set_algebra",
    "q189_bitext_margin_mining",
    "q191_compaction_plan",
    "q197_batch_knn_join",
]
_R11_IN = [
    "q213_pq_persisted_search",
    "q214_sq8_persisted_ann",
    "q215_ivfpq_persisted_serving",
    "q216_minhash_compacted_evolution",
    "q217_ivf_compacted_search",
]

# Round 12 takes never-certified back to ZERO again: the only registered
# queries without a hard CORRECTNESS row anywhere in r01–r11 are the two
# round-11 heads q218 (streaming IVF-PQ admission lifecycle) and q219
# (durable SimHash tier lifecycle), soaked under selfcheck + SIX
# seed/size/dup twins since round 11. Both rotate in. Displaced — each
# has FOUR consecutive hard rows (r08–r11) and keeps a family sibling
# in-window:
#   q192 embedding drift   → q193 embedding_ood stays (same
#       embedding-distribution-audit family, same KL/centroid machinery)
#   q196 JL distortion audit → q214 sq8_persisted_ann stays (the
#       quantization/compression-distortion-audit family)
_R12_OUT = [
    "q192_embedding_drift",
    "q196_jl_distortion_audit",
]
_R12_IN = [
    "q218_stream_ivfpq_admission",
    "q219_simhash_persisted_admission",
]

_ALL = list(QUERIES)
# reconstruct the round-5 window exactly as shipped, then apply the
# round-6 and round-7 waves on top of it
_OUT5 = _ROTATED_OUT + _R5_OUT + _R5B_OUT
_IN5 = [q for q in _ROTATED_IN + _R5_IN if q not in _OUT5] + _R5B_IN
_WINDOW5 = [q for q in _ALL[:50] if q not in _OUT5] + _IN5
assert len(_WINDOW5) == 50
_WINDOW6 = [q for q in _WINDOW5 if q not in _R6_OUT] + _R6_IN
_WINDOW6B = [q for q in _WINDOW6 if q not in _R6B_OUT] + _R6B_IN
_WINDOW6C = [q for q in _WINDOW6B if q not in _R6C_OUT] + _R6C_IN
_WINDOW7 = [q for q in _WINDOW6C if q not in _R7_OUT] + _R7_IN
_WINDOW8 = [q for q in _WINDOW7 if q not in _R8_OUT] + _R8_IN
_WINDOW9 = [q for q in _WINDOW8 if q not in _R9_OUT] + _R9_IN
_WINDOW10 = [q for q in _WINDOW9 if q not in _R10_OUT] + _R10_IN
_WINDOW11 = [q for q in _WINDOW10 if q not in _R11_OUT] + _R11_IN
_WINDOW = [q for q in _WINDOW11 if q not in _R12_OUT] + _R12_IN
GATE_ORDER = _WINDOW + [q for q in _ALL if q not in _WINDOW]
assert len(GATE_ORDER) == len(_ALL) and set(GATE_ORDER) == set(_ALL)
assert len(_WINDOW) == 50

QUERIES = {k: QUERIES[k] for k in GATE_ORDER}
ORACLE_SQL = {k: ORACLE_SQL[k] for k in GATE_ORDER}
