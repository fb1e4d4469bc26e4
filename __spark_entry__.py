"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from icecube_spark.queries import analytics
from icecube_spark.queries import datacube_queries as dq
from icecube_spark.queries import llm_queries as lq
from icecube_spark.queries import pipeline_queries as pq
from icecube_spark.queries import timeseries_queries as tsq
from icecube_spark.queries.llm_oracles import ORACLES as LLM_ORACLES
from icecube_spark.queries.pipeline_oracles import ORACLES as PIPELINE_ORACLES
from icecube_spark.queries.analytics_oracles import ORACLES as ANALYTICS_ORACLES
from icecube_spark.queries.datacube_oracles import ORACLES as DATACUBE_ORACLES
from icecube_spark.queries.timeseries_oracles import ORACLES as TIMESERIES_ORACLES

# Registration ORDER matters: the driver grades a ~50-key sample from
# the head. Round-3 order: the keys ADDED this round lead (newest
# first), then the keys repaired this round (survival_km /
# order_backlog hash fixes, the two latent HUGEINT-drift oracles, the
# D2 collapse-affected family), then the keys with no driver evidence
# yet, and the r1/r2 driver-green keys close the dict.
_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- wave 20 (B50, C86, E32, F43, P57) ---
    "cms_heavy_hitters": pq.cms_heavy_hitters,
    "knn_reciprocity": lq.knn_reciprocity,
    "normalization_impact": lq.normalization_impact,
    "revenue_theil": analytics.revenue_theil,
    "interarrival_fit": tsq.interarrival_fit,
    # --- wave 19 (A40-A41, B49, C85, G8) ---
    "cube_cfar_detect": dq.cube_cfar_detect,
    "cube_aspect_octant": dq.cube_aspect_octant,
    "lorenz_curve": analytics.lorenz_curve,
    "kruskal_wallis": tsq.kruskal_wallis,
    "media_scene_cuts": lq.media_scene_cuts,
    # --- wave 18 (A39, C84) ---
    "cube_enl": dq.cube_enl,
    "value_at_risk": tsq.value_at_risk,
    # --- wave 17 (P55-P56, E31) ---
    "packing_curve": pq.packing_curve,
    "erasure_impact": pq.erasure_impact,
    "uncertainty_sampling": lq.uncertainty_sampling,
    # --- wave 16 (D14, E30, F41) ---
    "bbit_minhash_eval": lq.bbit_minhash_eval,
    "label_silhouette": lq.label_silhouette,
    "license_notice_rate": lq.license_notice_rate,
    # --- wave 15 (A37-A38, F40) ---
    "cube_rgb_composite": dq.cube_rgb_composite,
    "cube_hist_match": dq.cube_hist_match,
    "rake_keywords": lq.rake_keywords,
    # --- wave 14 (C81-C83, F39) ---
    "multitouch_attribution": tsq.multitouch_attribution,
    "markov_accuracy": tsq.markov_accuracy,
    "haar_energy": tsq.haar_energy,
    "readability_scores": lq.readability_scores,
    # --- wave 13 (B47-B48, E29, F38) ---
    "weighted_median_price": analytics.weighted_median_price,
    "croston_forecast": analytics.croston_forecast,
    "hamming_recall": lq.hamming_recall,
    "boilerplate_prefixes": lq.boilerplate_prefixes,
    # --- wave 12 (A36, B45-B46, C79, P54) ---
    "cube_baseline_pairs": dq.cube_baseline_pairs,
    "abc_xyz_classes": analytics.abc_xyz_classes,
    "supplier_hhi": analytics.supplier_hhi,
    "diff_in_diff": tsq.diff_in_diff,
    "k_anonymity": pq.k_anonymity,
    # --- wave 11 (B44, C78, E27-E28, F37, P52-P53) ---
    "price_index": analytics.price_index,
    "period_detect": tsq.period_detect,
    "matryoshka_recall": lq.matryoshka_recall,
    "translation_pairs": lq.translation_pairs,
    "mojibake_score": lq.mojibake_score,
    "table_diff": pq.table_diff,
    "stratified_kfold": pq.stratified_kfold,
    # --- wave 10 (B43, C77, F36, P50-P51, A34-A35) ---
    "nation_affinity": analytics.nation_affinity,
    "sax_symbols": tsq.sax_symbols,
    "stupid_backoff_logprob": lq.stupid_backoff_logprob,
    "bloom_filter_eval": pq.bloom_filter_eval,
    "quantile_normalize": pq.quantile_normalize,
    "cube_hillshade": dq.cube_hillshade,
    "cube_mask_components": dq.cube_mask_components,
    # --- wave 9 (B42, C76, D12-D13, E26, F35, A33, P49) ---
    "supplier_scorecard": analytics.supplier_scorecard,
    "window_funnel_strict": tsq.window_funnel_strict,
    "tfidf_cosine_pairs": lq.tfidf_cosine_pairs,
    "repeated_substrings": lq.repeated_substrings,
    "label_noise_knn": lq.label_noise_knn,
    "bpe_merge_candidates": lq.bpe_merge_candidates,
    "cube_local_moran": dq.cube_local_moran,
    "zorder_plan": pq.zorder_plan,
    # --- wave 8 (B40-B41, P47-P48, C75, E25, A30-A32) ---
    "customer_churn": analytics.customer_churn,
    "price_elasticity": analytics.price_elasticity,
    "mann_whitney": pq.mann_whitney,
    "dsir_weights": pq.dsir_weights,
    "psi_drift": tsq.psi_drift,
    "hard_negatives": lq.hard_negatives,
    "cube_lee_filter": dq.cube_lee_filter,
    "cube_otsu_threshold": dq.cube_otsu_threshold,
    "cube_morph_open": dq.cube_morph_open,
    # --- new this round (F28-F31) ---
    "bigram_logprob": lq.bigram_logprob,
    "heaps_fit": lq.heaps_fit,
    "code_detect": lq.code_detect,
    "stopword_profile": lq.stopword_profile,
    # --- new this round (E21-E23) ---
    "pq_adc_topk": lq.pq_adc_topk,
    "embed_drift": lq.embed_drift,
    "cosine_adjacent_hist": lq.cosine_adjacent_hist,
    # --- new this round (P40-P41) ---
    "truncation_loss": pq.truncation_loss,
    "shard_skew_report": pq.shard_skew_report,
    # --- new this round (C69-C70, F32, P43) ---
    "mean_shift_split": tsq.mean_shift_split,
    "dow_anova": tsq.dow_anova,
    "tokenizer_fertility": lq.tokenizer_fertility,
    "epoch_plan": pq.epoch_plan,
    # --- new this round (G7, E24, P45-P46) ---
    "media_frame_dedup": lq.media_frame_dedup,
    "pq_recall_eval": lq.pq_recall_eval,
    "quality_length_corr": pq.quality_length_corr,
    "split_leakage_check": pq.split_leakage_check,
    # --- new this round (B37, C71, F33, A27) ---
    "order_gap_stats": analytics.order_gap_stats,
    "active_streaks": tsq.active_streaks,
    "perplexity_buckets": lq.perplexity_buckets,
    "cube_coherence": dq.cube_coherence,
    # --- new this round (D11, B39, F34) ---
    "lsh_bucket_profile": lq.lsh_bucket_profile,
    "discount_uplift": analytics.discount_uplift,
    "blocklist_fuzzy": lq.blocklist_fuzzy,
    # --- new this round (C65-C68) ---
    "theil_sen_trend": tsq.theil_sen_trend,
    "ks_drift": tsq.ks_drift,
    "benford_deviation": tsq.benford_deviation,
    "record_days": tsq.record_days,
    # --- repaired/affected this round: driver must re-grade ---
    "survival_km": tsq.survival_km,
    "order_backlog": tsq.order_backlog,
    "vocab_stats": lq.vocab_stats,
    "dup_ngram_fraction": pq.dup_ngram_fraction,
    "dedup_minhash_lsh": lq.dedup_minhash_lsh,
    "dedup_clusters": pq.dedup_clusters,
    "cross_source_leakage": pq.cross_source_leakage,
    "dup_rate_by_source": pq.dup_rate_by_source,
    "curation_waterfall": pq.curation_waterfall,
    "vocab_coverage": lq.vocab_coverage,
    # --- no driver evidence yet ---
    "mmr_diversify": lq.mmr_diversify,
    "embed_pca_top": lq.embed_pca_top,
    "m4_downsample": tsq.m4_downsample,
    "pit_join_orders": tsq.pit_join_orders,
    "near_dup_diff": lq.near_dup_diff,
    "mad_outliers": tsq.mad_outliers,
    "dedup_threshold_curve": lq.dedup_threshold_curve,
    "part_pagerank": pq.part_pagerank,
    "zipf_fit": lq.zipf_fit,
    "chunk_dedup": lq.chunk_dedup,
    "acf_daily_value": tsq.acf_daily_value,
    "burst_detection": tsq.burst_detection,
    "seasonal_decompose": tsq.seasonal_decompose,
    "rollup_revenue": analytics.rollup_revenue,
    "sales_cube": analytics.sales_cube,
    "revenue_share_window": analytics.revenue_share_window,
    "asof_join": tsq.asof_join_orders,
    "asof_join_forward": tsq.asof_join_forward,
    "asof_join_nearest": tsq.asof_join_nearest,
    "gap_stats": tsq.gap_stats,
    "time_weighted_avg": tsq.time_weighted_avg,
    "conversion_lag": tsq.conversion_lag,
    "rapid_repeat_events": tsq.rapid_repeat_events,
    "scd2_intervals": tsq.scd2_intervals,
    "q12_ship_delay": analytics.q12_ship_delay,
    "q2_min_cost_supplier": analytics.q2_min_cost_supplier,
    "cube_completeness": dq.cube_completeness,
    "spatial_overlap_polygon": dq.spatial_overlap_polygon,
    "ewma_smooth": tsq.ewma_smooth,
    "event_paths": tsq.event_paths,
    "interval_coverage": tsq.interval_coverage,
    "changepoint_cusum": tsq.changepoint_cusum,
    "cube_change_detection": dq.cube_change_detection,
    "sequence_packing": pq.sequence_packing,
    "quality_gate_funnel": pq.quality_gate_funnel,
    "dedup_survivorship": pq.dedup_survivorship,
    "class_weights": pq.class_weights,
    "shard_manifest": pq.shard_manifest,
    "ngram_novelty": lq.ngram_novelty,
    "ann_recall_eval": lq.ann_recall_eval,
    "downsample_lttb": tsq.downsample_lttb,
    "weighted_sample": pq.weighted_sample,
    "embed_standardize": lq.embed_standardize,
    "seasonal_dow": tsq.seasonal_dow,
    "pareto_report": analytics.pareto_report,
    "cube_mosaic": dq.cube_mosaic,
    "feature_pivot": tsq.feature_pivot,
    "cdc_merge": tsq.cdc_merge,
    "dataset_card": pq.dataset_card,
    "dedup_exact": lq.dedup_exact,
    "dedup_ngram_jaccard": lq.dedup_ngram_jaccard,
    "dedup_simhash": lq.dedup_simhash,
    "dedup_embedding_cosine": lq.dedup_embedding_cosine,
    "dedup_containment": lq.dedup_containment,
    "fuzzy_name_pairs": lq.fuzzy_name_pairs,
    "embed_cosine_topk": lq.embed_cosine_topk,
    "embed_knn_label": lq.embed_knn_label,
    "embed_ann_lsh": lq.embed_ann_lsh,
    "embed_label_centroids": lq.embed_label_centroids,
    "embed_quantize": lq.embed_quantize,
    "centroid_similarity": lq.centroid_similarity,
    "embed_dim_stats": lq.embed_dim_stats,
    "embed_norm_outliers": lq.embed_norm_outliers,
    "embed_top_dims": lq.embed_top_dims,
    "lang_id": lq.lang_id,
    "quality_score": lq.quality_score,
    "token_count": lq.token_count,
    "doc_fingerprint": lq.doc_fingerprint,
    "repetition_stats": lq.repetition_stats,
    "gopher_quality": lq.gopher_quality,
    "term_commonness": lq.term_commonness,
    "bigram_lift": lq.bigram_lift,
    "doc_top_tfidf": lq.doc_top_tfidf,
    "langid_confusion": lq.langid_confusion,
    "sentence_stats": lq.sentence_stats,
    "char_profile": lq.char_profile,
    "multimodal_frames": lq.multimodal_frames,
    "multimodal_meta": lq.multimodal_meta,
    "train_test_split": pq.train_test_split,
    "stratified_sample": pq.stratified_sample,
    "pii_redact": pq.pii_redact,
    "topk_terms": pq.topk_terms,
    "doc_length_stats": pq.doc_length_stats,
    "decontaminate": pq.decontaminate,
    "temperature_resample": pq.temperature_resample,
    "source_mix": pq.source_mix,
    "topk_terms_per_lang": pq.topk_terms_per_lang,
    "length_histogram": pq.length_histogram,
    "dup_cluster_sizes": pq.dup_cluster_sizes,
    "sample_per_group": pq.sample_per_group,
    "profile_table": pq.profile_table,
    "corpus_matrix": pq.corpus_matrix,
    "source_balance_gini": pq.source_balance_gini,
    "length_deciles": pq.length_deciles,
    "user_features": pq.user_features,
    "skew_report": pq.skew_report,
    "hypertable_rollup": tsq.hypertable_rollup,
    "ohlc_bars": tsq.ohlc_bars,
    "anomaly_zscore": tsq.anomaly_zscore,
    "trend_slope": tsq.trend_slope,
    "cohort_retention": tsq.cohort_retention,
    "funnel_conversion": tsq.funnel_conversion,
    "value_percentiles": tsq.value_percentiles,
    "calendar_lag_features": tsq.calendar_lag_features,
    "running_total": tsq.running_total,
    "event_transitions": tsq.event_transitions,
    "rolling_active_users": tsq.rolling_active_users,
    "activity_heatmap": tsq.activity_heatmap,
    "coverage_report": tsq.coverage_report,
    "props_extract": tsq.props_extract,
    "value_histogram": tsq.value_histogram,
    "purchase_attribution": tsq.purchase_attribution,
    "approx_quantiles": tsq.approx_quantiles,
    "embed_ann_ivf": lq.embed_ann_ivf,
    "text_features": lq.text_features,
    "approx_profile": pq.approx_profile,
    "multimodal_features": lq.multimodal_features,
    # --- driver-green in r1/r2 ---
    "js_divergence_langs": lq.js_divergence_langs,
    "series_lead_lag": tsq.series_lead_lag,
    "dedup_incremental": lq.dedup_incremental,
    "cube_band_index": dq.cube_band_index,
    "bounce_rate": tsq.bounce_rate,
    "pq_code_balance": lq.pq_code_balance,
    "shard_checksums": pq.shard_checksums,
    "segment_migration": analytics.segment_migration,
    "max_drawdown": tsq.max_drawdown,
    "bollinger_bands": tsq.bollinger_bands,
    "label_agreement": lq.label_agreement,
    "embed_bucket_stats": lq.embed_bucket_stats,
    "peak_detection": tsq.peak_detection,
    "mix_drift": pq.mix_drift,
    "cube_hist_equalize": dq.cube_hist_equalize,
    "blocklist_filter": lq.blocklist_filter,
    "media_chunk_windows": lq.media_chunk_windows,
    "cube_coregister": dq.cube_coregister,
    "forecast_baseline_eval": tsq.forecast_baseline_eval,
    "quota_rebalance": pq.quota_rebalance,
    "embed_pq_codes": lq.embed_pq_codes,
    "cube_gradient": dq.cube_gradient,
    "minhash_eval_f1": lq.minhash_eval_f1,
    "focal_mean": dq.focal_mean,
    "corr_matrix": analytics.corr_matrix,
    "feature_binning": pq.feature_binning,
    "entropy_by_source": lq.entropy_by_source,
    "winsorize_values": tsq.winsorize_values,
    "zonal_stats": dq.zonal_stats,
    "cube_downsample": dq.cube_downsample,
    "bm25_topk": lq.bm25_topk,
    "skyline_parts": analytics.skyline_parts,
    "part_triangles": analytics.part_triangles,
    "mi_lang_source": lq.mi_lang_source,
    "chi2_terms": lq.chi2_terms,
    "media_prefix_dedup": lq.media_prefix_dedup,
    "unigram_logprob": lq.unigram_logprob,
    "curriculum_shards": pq.curriculum_shards,
    "multimodal_tiles": lq.multimodal_tiles,
    "minhash_accuracy": lq.minhash_accuracy,
    "kmeans_refine": lq.kmeans_refine,
    "cube_composite": dq.cube_composite,
    "cohort_ltv": analytics.cohort_ltv,
    "q1_pricing_summary": analytics.q1_pricing_summary,
    "q3_shipping_priority": analytics.q3_shipping_priority,
    "q5_local_supplier": analytics.q5_local_supplier,
    "q6_forecast_revenue": analytics.q6_forecast_revenue,
    "top_parts_by_revenue": analytics.top_parts_by_revenue,
    "q4_order_priority": analytics.q4_order_priority,
    "q10_returned_items": analytics.q10_returned_items,
    "q13_customer_distribution": analytics.q13_customer_distribution,
    "q14_promo_revenue": analytics.q14_promo_revenue,
    "q18_large_orders": analytics.q18_large_orders,
    "q7_volume_shipping": analytics.q7_volume_shipping,
    "q8_market_share": analytics.q8_market_share,
    "q15_top_supplier": analytics.q15_top_supplier,
    "q17_small_quantity": analytics.q17_small_quantity,
    "q19_disjunctive_revenue": analytics.q19_disjunctive_revenue,
    "q21_waiting_supplier": analytics.q21_waiting_supplier,
    "q22_global_sales": analytics.q22_global_sales,
    "q9_product_profit": analytics.q9_product_profit,
    "q11_important_stock": analytics.q11_important_stock,
    "q16_supplier_count": analytics.q16_supplier_count,
    "q20_excess_stock": analytics.q20_excess_stock,
    "rfm_segments": analytics.rfm_segments,
    "revenue_growth": analytics.revenue_growth,
    "basket_pairs": analytics.basket_pairs,
    "brand_spearman": analytics.brand_spearman,
    "ship_latency_quantiles": analytics.ship_latency_quantiles,
    "basket_lift": analytics.basket_lift,
    "metadata_summary": dq.metadata_summary,
    "spatial_bbox_join": dq.spatial_bbox_join,
    "cube_config_filter": dq.cube_config_filter,
    "cube_temporal_dedup": dq.cube_temporal_dedup,
    "cube_resample_gapfill": dq.cube_resample_gapfill,
    "cube_resample_interpolate": dq.cube_resample_interpolate,
    "cube_pivot": dq.cube_pivot,
    "metadata_concat": dq.metadata_concat,
    "spatial_overlap_1d": dq.spatial_overlap_1d,
    "labels_align": dq.labels_align,
    "labels_vector_align": dq.labels_vector_align,
    "cube_merge": dq.cube_merge,
    "sar_band_math": dq.sar_band_math,
    "sessionize": tsq.sessionize_events,
    "window_tumbling": tsq.window_tumbling,
    "rolling_daily_revenue": tsq.rolling_daily_revenue,
    "range_join_clicks": tsq.range_join_clicks,
}

_ORACLES: dict[str, str] = {}
_ORACLES.update(ANALYTICS_ORACLES)
_ORACLES.update(DATACUBE_ORACLES)
_ORACLES.update(TIMESERIES_ORACLES)
_ORACLES.update(LLM_ORACLES)
_ORACLES.update(PIPELINE_ORACLES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return analytics.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
