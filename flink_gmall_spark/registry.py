"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY §2 (plus the LLM-data-pipeline
operators) registers here as a (DataFrame builder, DuckDB oracle SQL)
pair. ``__spark_entry__.py`` re-exports this; tests/test_parity.py runs
every pair side-by-side exactly like the driver does.

Registration ORDER matters operationally: the external driver samples the
first 50 registrations for its per-round correctness run. The effective
order is set by ``_SAMPLE_PRIORITY`` at the bottom of this module (the
per-round evidence strategy lives there); the blocks below keep their
historical grouping. Local parity (tests/test_parity.py) always runs
every entry regardless of order.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from flink_gmall_spark import pipeline
from flink_gmall_spark.operators import ann, curation, dedup, multimodal, retrieval, scale, textstats, udaf
from flink_gmall_spark.plans import ads, dwd, dwm, dws, tpch
from flink_gmall_spark.streaming import jobs as stream_jobs
from flink_gmall_spark.streaming import state as stream_state

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # None => non-SQL-expressible, rows-only check
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

# SURVEY §2 traceability: every operator ID from the inventory appears in
# some entry's tags, with two deliberate exceptions —
# - S1-S4 (Kafka source/sink/DDL): implemented in sources/kafka.py but
#   environment-gated (no broker or kafka jars in this image; the probe
#   and its error contract are covered by tests/test_sinks.py).
# - S9/S10 (HTTP log collector, Redis dim cache): explicit non-goals
#   (SURVEY §7.4) — replaced by the test driver and broadcast joins.


def _register(
    name: str,
    fn: QueryFn,
    oracle: Optional[str],
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> None:
    assert name not in _REGISTRY, f"duplicate query name: {name}"
    _REGISTRY[name] = Query(name, fn, oracle, bench, tags)


# =============================================================================
# BLOCK A — never driver-verified before round 3 (sample-priority order).
# =============================================================================

# --- TPC-H showcase (standard-benchmark face over the same tables) ----------
_register("tpch_q1", tpch.q1_pricing_summary, tpch.ORACLE_Q1, bench=True, tags=("tpch",))
_register("tpch_q3", tpch.q3_shipping_priority, tpch.ORACLE_Q3, tags=("tpch", "topk"))
_register("tpch_q4", tpch.q4_order_priority, tpch.ORACLE_Q4, tags=("tpch", "semi-join"))
_register("tpch_q5", tpch.q5_local_supplier_volume, tpch.ORACLE_Q5, tags=("tpch",))
_register("tpch_q6", tpch.q6_forecast_revenue, tpch.ORACLE_Q6, tags=("tpch", "pushdown"))
_register("tpch_q7", tpch.q7_volume_shipping, tpch.ORACLE_Q7, tags=("tpch",))
_register("tpch_q8", tpch.q8_market_share, tpch.ORACLE_Q8, tags=("tpch",))
_register("tpch_q10", tpch.q10_returned_items, tpch.ORACLE_Q10, tags=("tpch", "topk"))
_register("tpch_q13", tpch.q13_customer_distribution, tpch.ORACLE_Q13, tags=("tpch", "outer-join"))
_register("tpch_q14", tpch.q14_promo_effect, tpch.ORACLE_Q14, tags=("tpch",))
_register("tpch_q15", tpch.q15_top_supplier, tpch.ORACLE_Q15, tags=("tpch", "scalar-subquery"))
_register("tpch_q17", tpch.q17_small_quantity_revenue, tpch.ORACLE_Q17, tags=("tpch", "correlated-agg"))
_register("tpch_q18", tpch.q18_large_orders, tpch.ORACLE_Q18, tags=("tpch", "having"))
_register("tpch_q19", tpch.q19_discounted_revenue, tpch.ORACLE_Q19, tags=("tpch", "disjunctive"))

# --- Corpus curation (training-data pipeline) -------------------------------
_register("curation_length_buckets", curation.length_buckets, curation.ORACLE_LENGTH_BUCKETS, tags=("curation",))
_register("curation_pack_chunks", curation.pack_chunks, curation.ORACLE_PACK_CHUNKS, bench=True, tags=("curation", "packing"))
_register("curation_sample_stratified", curation.sample_stratified, curation.ORACLE_SAMPLE_STRATIFIED, tags=("curation", "sampling"))
_register("curation_decontaminate", curation.decontaminate, curation.ORACLE_DECONTAMINATE, bench=True, tags=("curation", "dedup"))
_register("curation_tfidf_top_terms", curation.tfidf_top_terms, curation.ORACLE_TFIDF_TOP_TERMS, bench=True, tags=("curation", "text"))
_register("curation_mixture_sample", curation.mixture_sample, curation.ORACLE_MIXTURE_SAMPLE, tags=("curation", "sampling", "mixing"))
_register("curation_bigram_counts", curation.bigram_counts, curation.ORACLE_BIGRAM_COUNTS, tags=("curation", "text", "lm-counts"))
_register("curation_pipeline_e2e", curation.curation_pipeline, curation.ORACLE_CURATION_PIPELINE, tags=("curation", "e2e", "dedup", "packing"))
_register("dedup_keep_best", curation.keep_best_dedup, curation.ORACLE_KEEP_BEST, tags=("curation", "dedup"))
_register("dedup_bag_of_words", dedup.bag_of_words_dedup, dedup.ORACLE_BAG_OF_WORDS, tags=("dedup",))

# --- Similarity / clustering -------------------------------------------------
_register("sim_block_topk", ann.block_topk, ann.ORACLE_BLOCK_TOPK, bench=True, tags=("similarity", "pandas-udf"))
_register("sim_label_centroids", ann.label_centroids, ann.ORACLE_LABEL_CENTROIDS, tags=("similarity", "clustering"))
_register("sim_kmeans_assign", ann.kmeans_assign, ann.ORACLE_KMEANS_ASSIGN, tags=("similarity", "clustering", "iterative"))

# --- Text / multimodal -------------------------------------------------------
_register("text_fingerprints", textstats.fingerprints, textstats.ORACLE_FINGERPRINTS, tags=("text",))
_register("text_pii_scrub", textstats.pii_scrub, textstats.ORACLE_PII_SCRUB, tags=("text",))
_register("text_repetition", textstats.repetition_scores, textstats.ORACLE_REPETITION_SCORES, tags=("text", "quality"))
_register("text_rare_token_ratio", textstats.rare_token_ratio, textstats.ORACLE_RARE_TOKEN_RATIO, tags=("text", "quality", "corpus-stats"))
_register("multimodal_binary_features", multimodal.binary_features, multimodal.ORACLE_BINARY_FEATURES, tags=("multimodal",))
_register("multimodal_frame_sample", multimodal.frame_sample, multimodal.ORACLE_FRAME_SAMPLE, tags=("multimodal",))
_register("multimodal_resize", multimodal.resize, multimodal.ORACLE_RESIZE, tags=("multimodal",))
_register("multimodal_embed_stub", multimodal.embed_stub, multimodal.ORACLE_EMBED_STUB, tags=("multimodal", "similarity"))

# --- ADS extensions / joins / scale ------------------------------------------
_register("ads_top_sku_per_brand", ads.top_sku_per_brand, ads.ORACLE_TOP_SKU_PER_BRAND, tags=("topk",))
_register("ads_customer_retention", ads.customer_retention, ads.ORACLE_CUSTOMER_RETENTION, tags=("set-ops",))
_register("ads_region_nation_rollup", ads.region_nation_rollup, ads.ORACLE_REGION_NATION_ROLLUP, tags=("rollup", "grouping-sets"))
_register("ads_customers_no_orders", ads.customers_without_orders, ads.ORACLE_CUSTOMERS_WITHOUT_ORDERS, tags=("anti-join",))
_register("ads_yoy_spend_full_outer", ads.yoy_spend_full_outer, ads.ORACLE_YOY_SPEND_FULL_OUTER, tags=("full-outer-join",))
_register("ads_conversion_funnel", ads.conversion_funnel, ads.ORACLE_CONVERSION_FUNNEL, tags=("funnel", "cep"))
_register("ads_user_activity_similarity", ads.user_activity_similarity, ads.ORACLE_USER_ACTIVITY_SIMILARITY, tags=("similarity", "time-series", "featurization"))
_register("ads_copurchase_pairs", ads.copurchase_pairs, ads.ORACLE_COPURCHASE_PAIRS, tags=("recommendation", "market-basket", "topk"))
_register("ads_cohort_retention", ads.cohort_retention, ads.ORACLE_COHORT_RETENTION, tags=("cohort", "retention", "product-analytics"))
_register("ads_event_transitions", ads.event_transitions, ads.ORACLE_EVENT_TRANSITIONS, tags=("path-analysis", "markov", "T3-generalized"))
_register("ads_rfm_segments", ads.rfm_segments, ads.ORACLE_RFM_SEGMENTS, tags=("rfm", "segmentation", "ntile", "product-analytics"))
_register("ads_rfm_segments_approx", ads.rfm_segments_approx, ads.ORACLE_RFM_SEGMENTS_APPROX, tags=("rfm", "segmentation", "histogram-quantile", "product-analytics", "scale"))
_register("ads_association_rules", ads.association_rules, ads.ORACLE_ASSOCIATION_RULES, bench=True, tags=("recommendation", "market-basket", "association-rules"))
_register("ads_timed_funnel", ads.timed_funnel, ads.ORACLE_TIMED_FUNNEL, tags=("funnel", "cep", "within", "attribution"))
_register("ads_part_pagerank", ads.part_pagerank, ads.ORACLE_PART_PAGERANK, tags=("graph", "pagerank", "iterative", "topk"))
_register("ads_part_pagerank_deep", ads.part_pagerank_deep, ads.ORACLE_PART_PAGERANK_DEEP, bench=True, tags=("graph", "pagerank", "iterative", "topk", "persisted-iteration", "scale"))
_register("ads_part_triangles", ads.part_triangles, ads.ORACLE_PART_TRIANGLES, bench=True, tags=("graph", "triangle-counting", "degree-orientation", "topk"))
_register("ads_part_bfs_distances", ads.part_bfs_distances, ads.ORACLE_PART_BFS_DISTANCES, tags=("graph", "bfs", "frontier-propagation", "iterative"))
_register("ads_pit_features", ads.pit_feature_join, ads.ORACLE_PIT_FEATURE_JOIN, tags=("feature-store", "asof", "point-in-time", "ml-training"))
_register("ads_last_touch_attribution", ads.last_touch_attribution, ads.ORACLE_LAST_TOUCH_ATTRIBUTION, tags=("attribution", "funnel", "path-analysis", "marketing", "carry-window"))
_register("ads_negative_samples", ads.negative_samples, ads.ORACLE_NEGATIVE_SAMPLES, tags=("recommendation", "ml-training", "negative-sampling", "anti-join", "deterministic"))
_register("ads_top_event_paths", ads.top_event_paths, ads.ORACLE_TOP_EVENT_PATHS, tags=("path-analysis", "markov", "topk", "T3-generalized"))
_register("ads_session_transitions", ads.session_transitions, ads.ORACLE_SESSION_TRANSITIONS, tags=("path-analysis", "markov", "sessionization", "T3-generalized"))
_register("curation_weighted_sample", curation.weighted_sample, curation.ORACLE_WEIGHTED_SAMPLE, tags=("curation", "sampling", "weighted", "topk", "map-only"))
_register("scale_salted_status_rollup", scale.salted_status_rollup, scale.ORACLE_SALTED_STATUS_ROLLUP, tags=("skew", "scale"))
_register("scale_bucketed_join", scale.bucketed_orders_join, scale.ORACLE_BUCKETED_ORDERS_JOIN, bench=True, tags=("bucketing", "scale"))
_register("scale_skew_join_aqe", scale.skewed_part_join, scale.ORACLE_SKEWED_PART_JOIN, tags=("skew", "scale", "aqe"))
_register("scale_binned_range_join", scale.binned_range_join, scale.ORACLE_BINNED_RANGE_JOIN, tags=("range-join", "non-equi", "scale"))
_register("stream_binned_range_join", stream_jobs.stream_binned_range_join, stream_jobs.ORACLE_STREAM_BINNED_RANGE, tags=("range-join", "non-equi", "streaming", "T4"))
_register("scale_partition_pruned_read", scale.partition_pruned_read, scale.ORACLE_PARTITION_PRUNED_READ, tags=("partition-pruning", "scale"))
_register("scale_runtime_bloom_join", scale.runtime_bloom_join, scale.ORACLE_RUNTIME_BLOOM_JOIN, tags=("runtime-filter", "bloom", "scale"))
_register("scale_dynamic_partition_pruning", scale.dynamic_partition_pruning, scale.ORACLE_DYNAMIC_PARTITION_PRUNING, tags=("partition-pruning", "dpp", "scale", "star-schema"))
_register("scale_epoch_compaction", scale.epoch_compaction, scale.ORACLE_EPOCH_COMPACTION, tags=("scale", "maintenance", "small-files", "T9"))
_register("scale_data_quality_report", scale.data_quality_report, scale.ORACLE_DATA_QUALITY_REPORT, tags=("scale", "data-quality", "constraints", "single-pass"))
_register("udaf_activity_streaks", udaf.activity_streaks, udaf.ORACLE_ACTIVITY_STREAKS, tags=("udaf", "pandas"))
_register("pipeline_e2e_hourly", pipeline.pipeline_e2e_hourly, pipeline.ORACLE_PIPELINE_E2E_HOURLY, tags=("pipeline", "e2e", "S6", "T9", "A7"))

# --- Streaming variants ------------------------------------------------------
_register("stream_dedup_distinct", stream_jobs.stream_event_distinct, stream_jobs.ORACLE_EVENT_DISTINCT, tags=("dedup", "streaming", "T2"))
_register("stream_dedup_within_watermark", stream_jobs.stream_dedup_within_watermark, stream_jobs.ORACLE_DEDUP_WITHIN_WATERMARK, tags=("dedup", "streaming", "T8", "state-bounded"))
_register("stream_dedup_fingerprints", stream_jobs.stream_dedup_fingerprints, stream_jobs.ORACLE_DEDUP_FINGERPRINTS, tags=("dedup", "streaming", "ingestion"))
_register("stream_config_routing", stream_jobs.stream_config_routing, dwd.ORACLE_CONFIG_ROUTING, tags=("J4", "P5", "streaming", "broadcast-state"))
_register("stream_j2_payment_wide", stream_jobs.stream_payment_wide, dwm.ORACLE_PAYMENT_WIDE, tags=("J2", "T4", "streaming"))
# demoted past the 50-sample boundary in favor of stream_j2_payment_wide
# (judge-named); the batch twin dws_province_stats is driver-verified (r2)
# and this variant shares its transform + oracle verbatim.
_register("stream_province_stats", stream_jobs.stream_province_stats, dws.ORACLE_PROVINCE_STATS, tags=("A3", "streaming", "sql-entry"))
_register("stream_pipeline_payment_province", stream_jobs.stream_pipeline_payment_province, stream_jobs.ORACLE_PIPELINE_PAYMENT_PROVINCE, tags=("J1", "J2", "J3", "A3", "T4", "streaming", "e2e", "multi-stateful"))
_register("stream_ads_hourly_from_sink", stream_jobs.stream_ads_hourly_from_sink, stream_jobs.ORACLE_ADS_HOURLY_FROM_SINK, tags=("T5", "T7", "T9", "S6", "streaming", "e2e", "chained-queries"))

# --- round-3 additions: full TPC-H coverage (Q2/9/11/12/16/20/21/22 -------
# adapted to the driver schema — see plans/tpch.py). Registered directly
# after the 50-sample block: locally parity-checked now, sampled next round.
_register("tpch_q2", tpch.q2_min_cost_supplier, tpch.ORACLE_Q2, tags=("tpch", "correlated-min", "topk"))
_register("tpch_q9", tpch.q9_product_type_profit, tpch.ORACLE_Q9, tags=("tpch",))
_register("tpch_q11", tpch.q11_important_parts, tpch.ORACLE_Q11, tags=("tpch", "having-global"))
_register("tpch_q12", tpch.q12_late_shipments, tpch.ORACLE_Q12, tags=("tpch", "conditional-agg"))
_register("tpch_q16", tpch.q16_parts_supplier_counts, tpch.ORACLE_Q16, tags=("tpch", "not-in", "distinct-count"))
_register("tpch_q20", tpch.q20_concentrated_suppliers, tpch.ORACLE_Q20, tags=("tpch", "nested-semi-join"))
_register("tpch_q21", tpch.q21_last_shippers, tpch.ORACLE_Q21, tags=("tpch", "multi-exists", "topk"))
_register("tpch_q22", tpch.q22_idle_customers, tpch.ORACLE_Q22, tags=("tpch", "anti-join", "scalar-avg"))
_register("curation_domain_cap", curation.domain_cap, curation.ORACLE_DOMAIN_CAP, tags=("curation", "window-group-limit", "per-key-topk"))
_register("stream_full_outer_join", stream_jobs.stream_full_outer_interval_join, stream_jobs.ORACLE_FULL_OUTER_INTERVAL, tags=("J1", "T4", "streaming", "outer-join", "two-sided-eviction"))
_register("stream_sliding_windows", stream_jobs.stream_sliding_windows, dws.ORACLE_SLIDING_VISITOR_WINDOWS, tags=("T6", "sliding-window", "streaming"))

# =============================================================================
# BLOCK B — driver-verified in rounds 1-2 (CORRECTNESS_r01/r02 green rows).
# New round-3 entries append at the END: they rotate into the sample window
# in a later round without displacing Block A.
# =============================================================================

# --- DWD (SURVEY §2.2 P1-P5, §2.4 J4) --------------------------------------
_register("dwd_page_views", dwd.page_views, dwd.ORACLE_PAGE_VIEWS, bench=True, tags=("P1", "P3", "P4"))
_register("dwd_clean_dirty_split", dwd.clean_dirty_split, dwd.ORACLE_CLEAN_DIRTY_SPLIT, tags=("P2",))
_register("dwd_config_routing", dwd.config_routing, dwd.ORACLE_CONFIG_ROUTING, tags=("J4", "P5"))
_register("dwd_cdc_dim_upsert", dwd.cdc_dim_upsert, dwd.ORACLE_CDC_DIM_UPSERT, bench=True, tags=("S5", "S7", "S8", "P1"))
_register("source_pyds_cdc_upsert", dwd.cdc_dim_upsert_pysource, dwd.ORACLE_CDC_DIM_UPSERT, tags=("S5", "connector", "python-datasource"))
_register("sink_pyds_dim_roundtrip", dwd.cdc_dim_upsert_sink_roundtrip, dwd.ORACLE_CDC_DIM_UPSERT, tags=("S6", "S7", "T9", "connector", "python-datasource"))
_register("stream_pyds_cdc_upsert", dwd.cdc_dim_upsert_stream_source, dwd.ORACLE_CDC_DIM_UPSERT, tags=("S5", "connector", "python-datasource", "streaming"))
_register("stream_pyds_cdc_dist", dwd.cdc_dim_upsert_dist_stream, dwd.ORACLE_CDC_DIM_UPSERT, tags=("S5", "connector", "python-datasource", "streaming", "scale"))
_register("dwd_cdc_scd2_history", dwd.cdc_scd2_history, dwd.ORACLE_CDC_SCD2_HISTORY, tags=("S5", "scd2"))
_register("dwd_props_variant_stats", dwd.props_variant_stats, dwd.ORACLE_PROPS_VARIANT_STATS, tags=("P1", "variant", "semi-structured"))
_register("dwd_cdc_asof_join", dwd.cdc_asof_join, dwd.ORACLE_CDC_ASOF_JOIN, tags=("asof", "scd2"))

# --- DWM (SURVEY §2.4 J1-J3, §2.6 T1-T3) ------------------------------------
_register("dwm_order_wide", dwm.order_wide, dwm.ORACLE_ORDER_WIDE, bench=True, tags=("J3", "P8"))
_register("dwm_order_detail_wide", dwm.order_detail_wide, dwm.ORACLE_ORDER_DETAIL_WIDE, bench=True, tags=("J1",))
_register("dwm_payment_wide", dwm.payment_wide, dwm.ORACLE_PAYMENT_WIDE, tags=("J2",))
_register("t1_visit_flag", dwm.visit_flag, dwm.ORACLE_VISIT_FLAG, tags=("T1",))
_register("t2_daily_uv", dwm.daily_uv, dwm.ORACLE_DAILY_UV, tags=("T2",))
_register("t3_jump_out", dwm.jump_out, dwm.ORACLE_JUMP_OUT, bench=True, tags=("T3",))

# --- DWS (SURVEY §2.5 A1-A4, §2.7 U1/U2, §2.3 F1/F2) ------------------------
_register("dws_visitor_stats", dws.visitor_stats, dws.ORACLE_VISITOR_STATS, bench=True, tags=("A1", "U1", "P6", "P7", "J5", "T6"))
_register("dws_product_stats", dws.product_stats, dws.ORACLE_PRODUCT_STATS, bench=True, tags=("A2", "U2"))
_register("dws_province_stats", dws.province_stats, dws.ORACLE_PROVINCE_STATS, bench=True, tags=("A3",))
_register("dws_keyword_stats", dws.keyword_stats, dws.ORACLE_KEYWORD_STATS, bench=True, tags=("F1", "F2", "A4"))
_register("dws_supplier_stats", dws.supplier_stats, dws.ORACLE_SUPPLIER_STATS, tags=("A2", "J3"))
_register("dws_keyword_stats_udtf", dws.keyword_stats_udtf, dws.ORACLE_KEYWORD_STATS, tags=("F1", "F2", "A4", "udtf", "python-table-function"))

# --- ADS (SURVEY §2.5 A5-A12, §2.8) -----------------------------------------
_register("ads_gmv_by_date", ads.gmv_by_date, ads.ORACLE_GMV_BY_DATE, tags=("A5",))
_register("ads_top_brands", ads.top_brands, ads.ORACLE_TOP_BRANDS, bench=True, tags=("A6",))
_register("ads_hourly_stats", ads.hourly_stats, ads.ORACLE_HOURLY_STATS, tags=("A7",))
_register("ads_status_stats", ads.status_stats, ads.ORACLE_STATUS_STATS, tags=("A8",))
_register("ads_user_scores", ads.user_scores, ads.ORACLE_USER_SCORES, tags=("A9",))
_register("ads_keyword_weighted", ads.keyword_weighted, ads.ORACLE_KEYWORD_WEIGHTED, tags=("A9",))
_register("ads_totals", ads.totals, ads.ORACLE_TOTALS, tags=("A10",))
_register("ads_province_rollup", ads.province_rollup, ads.ORACLE_PROVINCE_ROLLUP, tags=("A11",))
_register("ads_visitor_ratios", ads.visitor_ratios, ads.ORACLE_VISITOR_RATIOS, tags=("A12",))
_register("ads_monthly_status_pivot", ads.monthly_status_pivot, ads.ORACLE_MONTHLY_STATUS_PIVOT, tags=("pivot",))
_register("ads_status_priority_cube", ads.status_priority_cube, ads.ORACLE_STATUS_PRIORITY_CUBE, tags=("cube",))
_register("ads_approx_stats", ads.approx_stats, ads.ORACLE_APPROX_STATS, tags=("approx",))  # self-validating: in-engine error-bound booleans pinned TRUE by the oracle
_register("ads_gmv_moving_avg", ads.gmv_moving_avg, ads.ORACLE_GMV_MOVING_AVG, tags=("window-frame",))
_register("ads_amount_percentiles", ads.amount_percentiles, ads.ORACLE_AMOUNT_PERCENTILES, tags=("quantiles",))
_register("ads_amount_quartiles", ads.amount_quartiles, ads.ORACLE_AMOUNT_QUARTILES, tags=("quantiles", "ntile"))
_register("dws_session_stats", dws.session_stats, dws.ORACLE_SESSION_STATS, bench=True, tags=("sessionization",))
_register("dws_sliding_windows", dws.sliding_visitor_windows, dws.ORACLE_SLIDING_VISITOR_WINDOWS, tags=("sliding-window", "T6"))
_register("dws_session_windows", dws.session_windows, dws.ORACLE_SESSION_WINDOWS, tags=("sessionization", "T6"))


# --- Structured Streaming surface (SURVEY §2.6, §3.1) -----------------------
# Same transforms as the batch plans, executed by the incremental engine
# (file stream → state store → memory sink, availableNow); oracles shared
# with the batch entries prove engine parity. t3's CEP variant (SURVEY
# §7.3 rank 1) carries its own horizon-aware oracle: the watermark-open
# tail is excluded by an exact, engine-verified boundary rule.
_register("stream_visitor_stats", stream_jobs.stream_visitor_stats, dws.ORACLE_VISITOR_STATS, tags=("A1", "T5", "T6", "streaming"))
_register("stream_product_stats", stream_jobs.stream_product_stats, dws.ORACLE_PRODUCT_STATS, tags=("A2", "streaming"))
_register("stream_j1_order_detail_wide", stream_jobs.stream_order_detail_wide, dwm.ORACLE_ORDER_DETAIL_WIDE, tags=("J1", "T4", "streaming"))
_register("stream_t1_visit_flag", stream_state.visit_flag_stream, dwm.ORACLE_VISIT_FLAG, tags=("T1", "streaming"))
_register("stream_t2_daily_uv", stream_state.daily_uv_stream, dwm.ORACLE_DAILY_UV, tags=("T2", "T8", "streaming"))
# stream_t2_daily_uv_tws (transformWithStateInPandas) is implemented in
# streaming.state but NOT registered: the API's state-server protocol
# needs google.protobuf, absent from this image. tests/test_streaming.py
# runs it against the same oracle whenever protobuf is importable.
_register("stream_t3_jump_out", stream_state.jump_out_stream, stream_state.ORACLE_JUMP_OUT_STREAM, tags=("T3", "T4", "U3", "streaming", "cep"))
_register("stream_session_windows", stream_jobs.stream_session_windows, dws.ORACLE_SESSION_WINDOWS, tags=("sessionization", "streaming"))
_register("stream_keyword_stats", stream_jobs.stream_keyword_stats, dws.ORACLE_KEYWORD_STATS, tags=("F2", "A4", "streaming"))
_register("stream_windowed_append", stream_jobs.stream_windowed_append, stream_jobs.ORACLE_WINDOWED_APPEND, tags=("T5", "T6", "T7", "streaming", "append-mode"))
_register("stream_left_outer_join", stream_jobs.stream_left_outer_interval_join, stream_jobs.ORACLE_LEFT_OUTER_INTERVAL, tags=("J1", "T4", "streaming", "outer-join"))
_register("stream_intra_doc_chunks", stream_jobs.stream_intra_doc_chunks, dedup.ORACLE_INTRA_DOC_CHUNKS, tags=("dedup", "streaming", "ingestion", "map-only"))
_register("stream_pq_encode", stream_jobs.stream_pq_encode, ann.ORACLE_PQ_ENCODE, tags=("similarity", "quantization", "streaming", "stream-static", "train-serve"))
_register("stream_pq_index_serve", stream_jobs.stream_pq_index_serve, ann.ORACLE_PQ_ADC_TOPK, tags=("similarity", "quantization", "streaming", "T9", "S6", "e2e", "chained-queries"))
_register("stream_event_transitions", stream_state.event_transitions_stream, ads.ORACLE_EVENT_TRANSITIONS, tags=("path-analysis", "markov", "streaming", "T3-generalized", "stateful"))
_register("stream_last_touch_attribution", stream_state.last_touch_attribution_stream, ads.ORACLE_LAST_TOUCH_ATTRIBUTION, tags=("attribution", "path-analysis", "streaming", "stateful", "carry-window"))
_register("stream_pit_features", stream_state.pit_features_stream, ads.ORACLE_PIT_FEATURE_JOIN, tags=("feature-store", "asof", "point-in-time", "ml-training", "streaming", "stateful", "stream-union"))
_register("stream_session_transitions", stream_state.session_transitions_stream, ads.ORACLE_SESSION_TRANSITIONS, tags=("path-analysis", "markov", "sessionization", "streaming", "stateful"))
_register("stream_cohort_retention", stream_state.cohort_retention_stream, ads.ORACLE_COHORT_RETENTION, tags=("cohort", "retention", "product-analytics", "streaming", "stateful", "T2"))
_register("stream_timed_funnel", stream_state.timed_funnel_stream, ads.ORACLE_TIMED_FUNNEL, tags=("funnel", "cep", "within", "attribution", "streaming", "stateful", "T3"))

# --- LLM-data-pipeline operators (BASELINE.json north star) -----------------
_register("dedup_exact", dedup.exact_dedup, dedup.ORACLE_EXACT_DEDUP, bench=True, tags=("dedup",))
_register("dedup_ngram_jaccard", dedup.ngram_jaccard_pairs, dedup.ORACLE_NGRAM_JACCARD, tags=("dedup",))
_register("dedup_minhash_lsh", dedup.minhash_lsh_pairs, dedup.ORACLE_MINHASH_LSH, bench=True, tags=("dedup",))
_register("dedup_simhash", dedup.simhash_fingerprints, dedup.ORACLE_SIMHASH, bench=True, tags=("dedup",))
_register("dedup_simhash_pairs", dedup.simhash_pairs, dedup.ORACLE_SIMHASH_PAIRS, tags=("dedup",))
_register("dedup_apply_near", dedup.apply_near_dedup, dedup.ORACLE_APPLY_NEAR_DEDUP, tags=("dedup",))
_register("dedup_connected_components", dedup.connected_components, dedup.ORACLE_CONNECTED_COMPONENTS, tags=("dedup", "iterative"))
_register("dedup_chunk_first_occurrence", dedup.chunk_dedup, dedup.ORACLE_CHUNK_DEDUP, tags=("dedup", "line-level"))
_register("dedup_cluster_representatives", dedup.cluster_representatives, dedup.ORACLE_CLUSTER_REPRESENTATIVES, tags=("dedup", "iterative", "e2e"))
_register("dedup_intra_doc_chunks", dedup.intra_doc_chunk_dedup, dedup.ORACLE_INTRA_DOC_CHUNKS, tags=("dedup", "line-level", "map-only"))
_register("dedup_incremental_minhash", dedup.incremental_minhash_dedup, dedup.ORACLE_INCREMENTAL_MINHASH, tags=("dedup", "incremental", "ingestion"))
_register("dedup_lsh_recall_report", dedup.lsh_recall_report, dedup.ORACLE_LSH_RECALL_REPORT, tags=("dedup", "evaluation", "recall", "self-measurement"))
_register("curation_bpe_pair_counts", curation.bpe_pair_counts, curation.ORACLE_BPE_PAIR_COUNTS, tags=("curation", "text", "tokenizer-training", "topk"))
_register("curation_lm_score", curation.lm_commonness_score, curation.ORACLE_LM_COMMONNESS, tags=("curation", "text", "quality", "lm-counts"))
_register("curation_bpe_train", curation.bpe_train_merges, curation.ORACLE_BPE_TRAIN, tags=("curation", "text", "tokenizer-training", "iterative"))
_register("curation_adaptive_quality_filter", curation.adaptive_quality_filter, curation.ORACLE_ADAPTIVE_QUALITY, tags=("curation", "quality", "histogram-quantile", "per-language"))
_register("curation_collocations_lift", curation.collocations_lift, curation.ORACLE_COLLOCATIONS_LIFT, tags=("curation", "text", "pmi", "topk"))
_register("curation_bpe_encode", curation.bpe_encode_corpus, curation.ORACLE_BPE_ENCODE, tags=("curation", "text", "tokenizer-training", "train-serve"))
_register("curation_multimodal_dedup_pipeline", curation.multimodal_dedup_pipeline, curation.ORACLE_MULTIMODAL_PIPELINE, tags=("curation", "e2e", "cross-modal", "quality", "dedup", "clustering"))
_register("curation_bpe_token_budget", curation.bpe_token_budget, curation.ORACLE_BPE_TOKEN_BUDGET, tags=("curation", "text", "tokenizer-training", "train-serve", "token-accounting"))
_register("curation_train_val_test_split", curation.train_val_test_split, curation.ORACLE_TRAIN_VAL_TEST_SPLIT, tags=("curation", "sampling", "split", "map-only"))
_register("curation_boilerplate_lines", curation.boilerplate_lines, curation.ORACLE_BOILERPLATE_LINES, tags=("curation", "boilerplate", "template-stripping", "quality"))
_register("sim_ann_topk", ann.ann_topk, ann.ORACLE_ANN_TOPK, bench=True, tags=("similarity",))
_register("sim_embedding_neardup_lsh", ann.embedding_neardup_lsh, ann.ORACLE_EMBEDDING_NEARDUP, bench=True, tags=("similarity",))
_register("sim_ivf_topk", ann.ivf_topk, ann.ORACLE_IVF_TOPK, bench=True, tags=("similarity",))
_register("sim_ivf_topk_trained", ann.ivf_topk_trained, ann.ORACLE_IVF_TOPK_TRAINED, tags=("similarity", "clustering", "iterative", "train-serve"))
_register("sim_semantic_dedup", ann.semantic_dedup, ann.ORACLE_SEMANTIC_DEDUP, tags=("similarity", "dedup", "clustering"))
_register("sim_semantic_dedup_trained", ann.semantic_dedup_trained, ann.ORACLE_SEMANTIC_DEDUP_TRAINED, tags=("similarity", "dedup", "clustering", "train-serve"))
_register("sim_pq_encode", ann.pq_encode, ann.ORACLE_PQ_ENCODE, tags=("similarity", "quantization", "map-only"))
_register("sim_pq_adc_topk", ann.pq_adc_topk, ann.ORACLE_PQ_ADC_TOPK, tags=("similarity", "quantization", "lut-join"))
_register("sim_ivfpq_topk", ann.ivfpq_topk, ann.ORACLE_IVFPQ_TOPK, tags=("similarity", "quantization", "ivf", "e2e"))
_register("sim_ann_recall_report", ann.ann_recall_report, ann.ORACLE_ANN_RECALL_REPORT, tags=("similarity", "evaluation", "recall", "self-measurement"))
_register("text_lang_id", textstats.lang_id, textstats.ORACLE_LANG_ID, tags=("text",))
_register("text_quality_scores", textstats.quality_scores, textstats.ORACLE_QUALITY_SCORES, bench=True, tags=("text",))
_register("text_token_counts", textstats.token_counts, textstats.ORACLE_TOKEN_COUNTS, tags=("text",))
_register("text_hll_union_rollup", textstats.hll_union_rollup, textstats.ORACLE_HLL_UNION_ROLLUP, tags=("text", "approx", "mergeable-sketch", "corpus-stats"))
_register("text_hashed_classifier", textstats.hashed_classifier_scores, textstats.ORACLE_HASHED_CLASSIFIER, tags=("text", "quality", "feature-hashing", "map-only"))
_register("text_lang_id_confusion", textstats.lang_id_confusion, textstats.ORACLE_LANG_ID_CONFUSION, tags=("text", "evaluation", "confusion-matrix", "self-measurement"))
_register("text_sparse_topk_pairs", textstats.sparse_topk_pairs, textstats.ORACLE_SPARSE_TOPK_PAIRS, tags=("text", "similarity", "sparse-retrieval", "inverted-index", "topk"))

# --- Round-7 additions (queue for the round-8 sample window; each was
# subset-simmed MATCH under the hostile config at commit time) ---------------
_register("scale_zorder_layout", scale.zorder_layout, scale.ORACLE_ZORDER_LAYOUT, tags=("scale", "zorder", "layout", "file-pruning", "maintenance"))
_register("scale_join_preflight", scale.join_preflight, scale.ORACLE_JOIN_PREFLIGHT, tags=("scale", "planning", "cardinality", "skew", "self-measurement"))
_register("curation_decontaminate_bloom", curation.decontaminate_bloom, curation.ORACLE_DECONTAMINATE_BLOOM, tags=("curation", "dedup", "bloom-filter", "broadcast"))
_register("curation_mixture_temperature", curation.mixture_temperature, curation.ORACLE_MIXTURE_TEMPERATURE, tags=("curation", "sampling", "mixing", "temperature"))
_register("curation_filter_funnel", curation.filter_funnel, curation.ORACLE_FILTER_FUNNEL, tags=("curation", "quality", "observability", "single-pass"))
_register("text_frequent_terms", textstats.frequent_terms_twopass, textstats.ORACLE_FREQUENT_TERMS, tags=("text", "heavy-hitters", "two-pass", "topk", "corpus-stats"))
_register("ads_kanon_export", ads.kanon_export, ads.ORACLE_KANON_EXPORT, tags=("privacy", "suppression", "rollup"))
_register("stream_filter_funnel", stream_jobs.stream_filter_funnel, curation.ORACLE_FILTER_FUNNEL, tags=("streaming", "curation", "observability", "complete-mode"))
_register("stream_kanon_export", stream_jobs.stream_kanon_export, ads.ORACLE_KANON_EXPORT, tags=("streaming", "privacy", "suppression", "complete-mode"))
_register("dwd_cdc_delete_aware_agg", dwd.cdc_delete_aware_agg, dwd.ORACLE_CDC_DELETE_AWARE_AGG, tags=("cdc", "retraction", "aggregate-maintenance"))
_register("ads_rolling_activity_7d", ads.rolling_activity_7d, ads.ORACLE_ROLLING_ACTIVITY_7D, tags=("featurization", "range-window", "time-series"))
_register("curation_source_overlap", curation.source_overlap_matrix, curation.ORACLE_SOURCE_OVERLAP, tags=("curation", "provenance", "dedup", "self-measurement"))
_register("stream_rolling_activity_7d", stream_state.rolling_activity_stream, ads.ORACLE_ROLLING_ACTIVITY_7D, tags=("streaming", "featurization", "bounded-state", "time-series"))
_register("stream_decontaminate_bloom", stream_jobs.stream_decontaminate_bloom, curation.ORACLE_DECONTAMINATE_BLOOM, tags=("streaming", "curation", "bloom-filter", "stream-static-join"))
_register("curation_recipe_v2", curation.recipe_v2, curation.ORACLE_RECIPE_V2, tags=("curation", "e2e", "quality", "bloom-filter", "mixing"))

# --- Round-8 additions (queue for the round-9 sample window; each
# subset-simmed MATCH under the hostile config at commit time) ----------------
_register("stream_pit_features_gated", stream_state.pit_features_gated_stream, stream_state.ORACLE_PIT_GATED, tags=("feature-store", "asof", "point-in-time", "streaming", "stateful", "watermark-gated", "T5"))
_register("stream_zorder_compaction", stream_jobs.stream_zorder_compaction, scale.ORACLE_ZORDER_LAYOUT, tags=("streaming", "scale", "zorder", "maintenance", "small-files", "T9", "e2e"))
_register("stream_cdc_delete_aware_agg", stream_state.cdc_retract_stream, dwd.ORACLE_CDC_DELETE_AWARE_AGG, tags=("streaming", "cdc", "retraction", "aggregate-maintenance", "stateful", "S5"))
_register("ads_ldiversity_export", ads.ldiversity_export, ads.ORACLE_LDIVERSITY_EXPORT, tags=("privacy", "suppression", "l-diversity", "rollup"))
_register("sim_hard_negatives", ann.hard_negatives, ann.ORACLE_HARD_NEGATIVES, tags=("similarity", "ml-training", "negative-sampling", "contrastive", "topk"))
_register("curation_bpe_greedy_drift", curation.bpe_greedy_drift, curation.ORACLE_BPE_GREEDY_DRIFT, tags=("curation", "text", "tokenizer-training", "train-serve", "self-measurement", "pandas-udf"))

# --- Round-9 additions (queue for the round-10 sample window; each
# subset-simmed MATCH under the hostile config at commit time) ----------------
_register("sim_hard_negatives_ivf", ann.hard_negatives_ivf, ann.ORACLE_HARD_NEGATIVES_IVF, tags=("similarity", "ml-training", "negative-sampling", "contrastive", "topk", "ivf", "recall-ledger"))
_register("dedup_containment_prefix", dedup.containment_prefix_pairs, dedup.ORACLE_CONTAINMENT_PREFIX, tags=("dedup", "containment", "prefix-filter", "set-similarity", "exact-filter"))
_register("sim_mrl_truncation_recall", ann.mrl_truncation_recall, ann.ORACLE_MRL_TRUNCATION_RECALL, tags=("similarity", "matryoshka", "truncation", "recall-ledger", "self-measurement"))
_register("sim_ivf_cell_balance", ann.ivf_cell_balance, ann.ORACLE_IVF_CELL_BALANCE, tags=("similarity", "ivf", "index-health", "self-measurement", "imbalance"))
_register("dedup_funnel_report", dedup.dedup_funnel_report, dedup.ORACLE_DEDUP_FUNNEL, tags=("dedup", "observability", "funnel", "e2e", "self-measurement"))
_register("stream_containment_probe", stream_jobs.stream_containment_probe, dedup.ORACLE_CONTAINMENT_PROBE, tags=("streaming", "dedup", "containment", "stream-static-join", "complete-mode"))
_register("text_quality_threshold_sweep", textstats.quality_threshold_sweep, textstats.ORACLE_QUALITY_THRESHOLD_SWEEP, tags=("text", "curation", "quality", "calibration", "single-pass", "self-measurement"))
_register("sim_pq_distortion", ann.pq_distortion_report, ann.ORACLE_PQ_DISTORTION, tags=("similarity", "pq", "index-health", "self-measurement", "decimal-exact"))
_register("curation_span_corruption", curation.span_corruption_spec, curation.ORACLE_SPAN_CORRUPTION, tags=("curation", "ml-training", "denoising", "deterministic", "map-only"))
_register("stream_quality_threshold_sweep", stream_jobs.stream_quality_threshold_sweep, textstats.ORACLE_QUALITY_THRESHOLD_SWEEP, tags=("streaming", "text", "curation", "calibration", "complete-mode"))
_register("sim_ivf_nprobe_sweep", ann.ivf_nprobe_sweep, ann.ORACLE_IVF_NPROBE_SWEEP, tags=("similarity", "ivf", "calibration", "recall-ledger", "self-measurement"))
_register("stream_span_corruption", stream_jobs.stream_span_corruption, curation.ORACLE_SPAN_CORRUPTION, tags=("streaming", "curation", "ml-training", "denoising", "map-only", "append-mode"))
_register("curation_bpe_fertility", curation.bpe_fertility_by_lang, curation.ORACLE_BPE_FERTILITY, tags=("curation", "text", "tokenizer-training", "fertility", "mixing", "self-measurement"))
_register("dedup_dup_ngram_coverage", dedup.dup_ngram_coverage, dedup.ORACLE_DUP_NGRAM_COVERAGE, tags=("dedup", "quality", "corpus-stats", "observability"))
_register("curation_dataset_card", curation.dataset_card_report, curation.ORACLE_DATASET_CARD, tags=("curation", "observability", "e2e", "single-pass", "self-measurement"))
_register("dedup_minhash_band_tuning", dedup.minhash_band_tuning, dedup.ORACLE_MINHASH_BAND_TUNING, bench=True, tags=("dedup", "minhash", "lsh", "calibration", "recall-ledger", "self-measurement"))
_register("curation_global_shuffle", curation.global_shuffle_shards, curation.ORACLE_GLOBAL_SHUFFLE, tags=("curation", "ml-training", "shuffle", "deterministic", "sharding"))
_register("curation_padding_waste", curation.padding_waste, curation.ORACLE_PADDING_WASTE, tags=("curation", "ml-training", "batching", "packing", "observability"))
_register("stream_padding_waste", stream_jobs.stream_padding_waste, curation.ORACLE_PADDING_WASTE, tags=("streaming", "curation", "ml-training", "batching", "complete-mode"))
_register("sim_ann_filtered_topk", ann.ann_filtered_topk, ann.ORACLE_ANN_FILTERED_TOPK, tags=("similarity", "ann", "filtered-search", "topk", "brute-force-baseline"))
_register("sim_ivf_filtered_topk", ann.ivf_filtered_topk, ann.ORACLE_IVF_FILTERED_TOPK, bench=True, tags=("similarity", "ann", "filtered-search", "topk", "ivf", "pre-filter"))
_register("curation_chunk_overlap", curation.chunk_overlap_spec, curation.ORACLE_CHUNK_OVERLAP, tags=("curation", "ml-training", "chunking", "rag", "map-only", "deterministic"))
_register("curation_repeat_epochs", curation.repeat_epochs_ledger, curation.ORACLE_REPEAT_EPOCHS, tags=("curation", "ml-training", "mixing", "up-sampling", "observability"))
_register("stream_global_shuffle", stream_jobs.stream_global_shuffle, curation.ORACLE_GLOBAL_SHUFFLE, tags=("streaming", "curation", "ml-training", "shuffle", "complete-mode"))
_register("stream_chunk_overlap", stream_jobs.stream_chunk_overlap, curation.ORACLE_CHUNK_OVERLAP, tags=("streaming", "curation", "ml-training", "chunking", "map-only", "append-mode"))
_register("stream_repeat_epochs", stream_jobs.stream_repeat_epochs, curation.ORACLE_REPEAT_EPOCHS, tags=("streaming", "curation", "ml-training", "mixing", "complete-mode"))
_register("dedup_jaccard_prefix", dedup.jaccard_prefix_pairs, dedup.ORACLE_NGRAM_JACCARD, tags=("dedup", "jaccard", "prefix-filter", "set-similarity", "exact-filter"))
_register("curation_pretrain_build", curation.pretrain_build, curation.ORACLE_PRETRAIN_BUILD, tags=("curation", "ml-training", "e2e", "dedup", "chunking", "sharding", "deterministic"))
_register("text_classifier_roc", textstats.classifier_roc_sweep, textstats.ORACLE_CLASSIFIER_ROC, tags=("text", "quality", "calibration", "learned-filter", "single-pass", "self-measurement"))
_register("dedup_containment_apply", dedup.apply_containment_dedup, dedup.ORACLE_APPLY_CONTAINMENT, tags=("dedup", "containment", "prefix-filter", "corpus-filtering"))
_register("stream_classifier_roc", stream_jobs.stream_classifier_roc, textstats.ORACLE_CLASSIFIER_ROC, tags=("streaming", "text", "quality", "calibration", "learned-filter", "complete-mode"))

# --- Round-10 additions (VERDICT r9 asks + coverage widening) ----------------
_register("stream_pretrain_build", stream_jobs.stream_pretrain_build, curation.ORACLE_PRETRAIN_BUILD, tags=("streaming", "curation", "ml-training", "e2e", "dedup", "chunking", "sharding", "complete-mode"))
_register("dedup_winnowing_fingerprints", dedup.winnowing_fingerprints, dedup.ORACLE_WINNOW_FINGERPRINTS, tags=("dedup", "fingerprinting", "winnowing", "map-only"))
_register("dedup_winnowing_pairs", dedup.winnowing_pairs, dedup.ORACLE_WINNOW_PAIRS, bench=True, tags=("dedup", "fingerprinting", "winnowing", "near-dup"))
_register("stream_winnowing_fingerprints", stream_jobs.stream_winnowing_fingerprints, dedup.ORACLE_WINNOW_FINGERPRINTS, tags=("streaming", "dedup", "fingerprinting", "winnowing", "map-only", "append-mode"))
_register("sim_range_search", ann.range_search, ann.ORACLE_RANGE_SEARCH, tags=("similarity", "range-query", "exact", "audit-twin"))
_register("sim_ivf_range_search", ann.ivf_range_search, ann.ORACLE_IVF_RANGE_SEARCH, bench=True, tags=("similarity", "range-query", "ivf", "recall-ledger"))
_register("text_token_diversity", textstats.token_diversity, textstats.ORACLE_TOKEN_DIVERSITY, tags=("text", "quality", "diversity", "map-only"))
_register("stream_token_diversity", stream_jobs.stream_token_diversity, textstats.ORACLE_TOKEN_DIVERSITY, tags=("streaming", "text", "quality", "diversity", "map-only", "append-mode"))
_register("curation_curriculum_stages", curation.curriculum_stages, curation.ORACLE_CURRICULUM_STAGES, tags=("curation", "ml-training", "curriculum", "distributed-ntile"))
_register("sim_hard_negatives_ivf_sampled", ann.hard_negatives_ivf_sampled, ann.ORACLE_HARD_NEGATIVES_IVF_SAMPLED, tags=("similarity", "mining", "ivf", "sampled-audit", "recall-ledger"))
_register("stream_ivf_range_serve", stream_jobs.stream_ivf_range_serve, ann.ORACLE_IVF_RANGE_SEARCH, tags=("streaming", "similarity", "range-query", "ivf", "serving", "append-mode"))
_register("curation_preference_pairs", curation.preference_pairs, curation.ORACLE_PREFERENCE_PAIRS, tags=("curation", "ml-training", "preference-pairs", "distributed-rank"))
_register("dedup_winnowing_recall_report", dedup.winnowing_recall_report, dedup.ORACLE_WINNOW_RECALL_REPORT, tags=("dedup", "winnowing", "recall-ledger", "self-measurement"))

# --- Round-11 additions (VERDICT r10 asks) -----------------------------------
_register("sim_ivf_range_search_sampled", ann.ivf_range_search_sampled, ann.ORACLE_IVF_RANGE_SEARCH_SAMPLED, tags=("similarity", "range-query", "ivf", "sampled-audit", "recall-ledger"))
_register("stream_curriculum_stages", stream_jobs.stream_curriculum_stages, curation.ORACLE_CURRICULUM_STAGES, tags=("streaming", "curation", "ml-training", "curriculum", "distributed-ntile", "append-mode"))
_register("stream_preference_pairs", stream_jobs.stream_preference_pairs, curation.ORACLE_PREFERENCE_PAIRS, tags=("streaming", "curation", "ml-training", "preference-pairs", "distributed-rank", "append-mode"))
_register("dedup_winnowing_w_sweep", dedup.winnowing_w_sweep, dedup.ORACLE_WINNOW_W_SWEEP, bench=True, tags=("dedup", "winnowing", "calibration", "recall-ledger", "self-measurement"))
_register("stream_ivf_range_serve_sampled", stream_jobs.stream_ivf_range_serve_sampled, ann.ORACLE_IVF_RANGE_SEARCH_SAMPLED, tags=("streaming", "similarity", "range-query", "ivf", "serving", "sampled-audit", "append-mode"))
_register("curation_seq_len_sweep", curation.seq_len_sweep, curation.ORACLE_SEQ_LEN_SWEEP, tags=("curation", "ml-training", "packing", "calibration", "single-pass"))
_register("stream_seq_len_sweep", stream_jobs.stream_seq_len_sweep, curation.ORACLE_SEQ_LEN_SWEEP, tags=("streaming", "curation", "ml-training", "packing", "calibration", "complete-mode"))
_register("curation_dsir_weights", curation.dsir_weights, curation.ORACLE_DSIR_WEIGHTS, tags=("curation", "ml-training", "importance-sampling", "feature-hashing", "calibration"))
_register("curation_importance_resample", curation.importance_resample, curation.ORACLE_IMPORTANCE_RESAMPLE, bench=True, tags=("curation", "ml-training", "importance-sampling", "sampling", "deterministic"))
_register("stream_importance_resample", stream_jobs.stream_importance_resample, curation.ORACLE_IMPORTANCE_RESAMPLE, tags=("streaming", "curation", "ml-training", "importance-sampling", "serving", "complete-mode"))
_register("stream_dsir_weights", stream_jobs.stream_dsir_weights, curation.ORACLE_DSIR_WEIGHTS, tags=("streaming", "curation", "ml-training", "importance-sampling", "feature-hashing", "complete-mode"))
_register("text_bm25_topk", retrieval.bm25_topk, retrieval.ORACLE_BM25_TOPK, bench=True, tags=("text-analysis", "retrieval", "lexical", "bm25", "top-n"))
_register("sim_hybrid_rrf", retrieval.hybrid_rrf, retrieval.ORACLE_HYBRID_RRF, tags=("similarity", "retrieval", "hybrid", "rank-fusion", "top-n"))
_register("stream_bm25_serve", stream_jobs.stream_bm25_serve, retrieval.ORACLE_BM25_TOPK, tags=("streaming", "retrieval", "lexical", "bm25", "serving", "append-mode"))
_register("text_bm25_param_sweep", retrieval.bm25_param_sweep, retrieval.ORACLE_BM25_PARAM_SWEEP, bench=True, tags=("text-analysis", "retrieval", "bm25", "calibration", "self-measurement", "single-pass"))
_register("stream_hybrid_rrf_serve", stream_jobs.stream_hybrid_rrf_serve, retrieval.ORACLE_HYBRID_RRF, tags=("streaming", "retrieval", "hybrid", "rank-fusion", "serving", "append-mode"))
_register("scale_bucketed_postings_serve", scale.bucketed_postings_serve, retrieval.ORACLE_BM25_TOPK, tags=("scale", "retrieval", "bm25", "bucketing", "zero-shuffle-join", "serving"))
_register("text_query_expansion_prf", retrieval.query_expansion_prf, retrieval.ORACLE_QUERY_EXPANSION_PRF, tags=("text-analysis", "retrieval", "query-expansion", "relevance-feedback", "top-n"))
_register("sim_fusion_gain_report", retrieval.fusion_gain_report, retrieval.ORACLE_FUSION_GAIN, tags=("similarity", "retrieval", "hybrid", "rank-fusion", "evaluation", "self-measurement"))
_register("stream_query_expansion_prf", stream_jobs.stream_query_expansion_prf, retrieval.ORACLE_QUERY_EXPANSION_PRF, tags=("streaming", "retrieval", "query-expansion", "relevance-feedback", "serving", "append-mode"))
_register("curation_retrieval_triplets", retrieval.retrieval_triplets, retrieval.ORACLE_RETRIEVAL_TRIPLETS, tags=("curation", "retrieval", "ml-training", "triplet-mining", "sampling", "deterministic"))
_register("stream_retrieval_triplets", stream_jobs.stream_retrieval_triplets, retrieval.ORACLE_RETRIEVAL_TRIPLETS, tags=("streaming", "curation", "retrieval", "ml-training", "triplet-mining", "serving", "append-mode"))

# --- Round-12 additions (VERDICT r11 asks) -----------------------------------
_register("text_bm25_topk_logidf", retrieval.bm25_topk_logidf, retrieval.ORACLE_BM25_TOPK_LOGIDF, bench=True, tags=("text-analysis", "retrieval", "lexical", "bm25", "logged-idf", "top-n"))
_register("sim_rrf_k_sweep", retrieval.rrf_k_sweep, retrieval.ORACLE_RRF_K_SWEEP, tags=("similarity", "retrieval", "hybrid", "rank-fusion", "calibration", "self-measurement", "single-pass"))
_register("scale_bucketed_prf_serve", scale.bucketed_prf_serve, retrieval.ORACLE_QUERY_EXPANSION_PRF, tags=("scale", "retrieval", "query-expansion", "bucketing", "zero-shuffle-join", "serving"))
_register("scale_bucketed_triplets_serve", scale.bucketed_triplets_serve, retrieval.ORACLE_RETRIEVAL_TRIPLETS, tags=("scale", "retrieval", "triplet-mining", "bucketing", "zero-shuffle-join", "serving"))
_register("stream_bm25_logidf_serve", stream_jobs.stream_bm25_logidf_serve, retrieval.ORACLE_BM25_TOPK_LOGIDF, tags=("streaming", "retrieval", "lexical", "bm25", "logged-idf", "serving", "append-mode"))
_register("stream_rrf_k_sweep", stream_jobs.stream_rrf_k_sweep, retrieval.ORACLE_RRF_K_SWEEP, tags=("streaming", "retrieval", "hybrid", "rank-fusion", "calibration", "serving", "append-mode"))
_register("sim_retrieval_eval", retrieval.retrieval_eval, retrieval.ORACLE_RETRIEVAL_EVAL, tags=("similarity", "retrieval", "evaluation", "mrr", "ndcg", "self-measurement"))
_register("stream_retrieval_eval", stream_jobs.stream_retrieval_eval, retrieval.ORACLE_RETRIEVAL_EVAL, tags=("streaming", "retrieval", "evaluation", "mrr", "ndcg", "serving", "append-mode"))
_register("text_zipf_slope", textstats.zipf_slope, textstats.ORACLE_ZIPF_SLOPE, tags=("text", "quality", "corpus-stats", "zipf", "observability", "self-measurement"))
_register("stream_zipf_slope", stream_jobs.stream_zipf_slope, textstats.ORACLE_ZIPF_SLOPE, tags=("streaming", "text", "quality", "corpus-stats", "zipf", "complete-mode"))
_register("curation_lm_logprob", curation.lm_logprob_score, curation.ORACLE_LM_LOGPROB, bench=True, tags=("curation", "text", "quality", "perplexity-filter", "lm-scoring", "log-prob"))
_register("stream_lm_logprob", stream_jobs.stream_lm_logprob, curation.ORACLE_LM_LOGPROB, tags=("streaming", "curation", "text", "quality", "perplexity-filter", "lm-scoring", "serving", "append-mode"))
_register("text_token_entropy", textstats.token_entropy, textstats.ORACLE_TOKEN_ENTROPY, tags=("text", "quality", "diversity", "entropy", "map-only"))
_register("stream_token_entropy", stream_jobs.stream_token_entropy, textstats.ORACLE_TOKEN_ENTROPY, tags=("streaming", "text", "quality", "diversity", "entropy", "append-mode"))
_register("text_phrase_search", retrieval.phrase_search, retrieval.ORACLE_PHRASE_SEARCH, bench=True, tags=("text-analysis", "retrieval", "lexical", "phrase", "positional-index", "plan-variant", "top-n"))
_register("stream_phrase_serve", stream_jobs.stream_phrase_serve, retrieval.ORACLE_PHRASE_SEARCH, tags=("streaming", "retrieval", "lexical", "phrase", "positional-index", "serving", "append-mode"))
_register("sim_rrf_weighted", retrieval.rrf_weighted, retrieval.ORACLE_RRF_WEIGHTED, tags=("similarity", "retrieval", "hybrid", "rank-fusion", "weighted", "three-system"))
_register("stream_rrf_weighted_serve", stream_jobs.stream_rrf_weighted_serve, retrieval.ORACLE_RRF_WEIGHTED, tags=("streaming", "retrieval", "hybrid", "rank-fusion", "weighted", "serving", "append-mode"))
_register("sim_bm25_hard_negatives", retrieval.bm25_hard_negatives, retrieval.ORACLE_BM25_HARD_NEGATIVES, tags=("similarity", "retrieval", "ml-training", "hard-negatives", "recall-report", "self-measurement"))
_register("stream_bm25_hard_negatives", stream_jobs.stream_bm25_hard_negatives, retrieval.ORACLE_BM25_HARD_NEGATIVES, tags=("streaming", "retrieval", "ml-training", "hard-negatives", "serving", "append-mode"))
_register("stream_bm25_param_sweep", stream_jobs.stream_bm25_param_sweep, retrieval.ORACLE_BM25_PARAM_SWEEP, tags=("streaming", "retrieval", "lexical", "bm25", "calibration", "serving", "append-mode"))
_register("scale_bucketed_phrase_serve", scale.bucketed_phrase_serve, retrieval.ORACLE_PHRASE_SEARCH, tags=("scale", "retrieval", "lexical", "phrase", "positional-index", "bucketing", "zero-shuffle-join", "serving"))

# --- round 13: proximity retrieval + exact-substring dedup -------------------
_register("text_proximity_topk", retrieval.proximity_topk, retrieval.ORACLE_PROXIMITY_TOPK, bench=True, tags=("text-analysis", "retrieval", "lexical", "proximity", "positional-index", "band-join", "top-n"))
_register("stream_proximity_serve", stream_jobs.stream_proximity_serve, retrieval.ORACLE_PROXIMITY_TOPK, tags=("streaming", "retrieval", "lexical", "proximity", "positional-index", "serving", "append-mode"))
_register("text_proximity_unordered", retrieval.proximity_unordered_topk, retrieval.ORACLE_PROXIMITY_UNORDERED, tags=("text-analysis", "retrieval", "lexical", "proximity", "unordered-window", "positional-index", "band-join", "top-n"))
_register("stream_proximity_unordered_serve", stream_jobs.stream_proximity_unordered_serve, retrieval.ORACLE_PROXIMITY_UNORDERED, tags=("streaming", "retrieval", "lexical", "proximity", "unordered-window", "serving", "append-mode"))
_register("dedup_exact_substring_runs", dedup.exact_substring_runs, dedup.ORACLE_EXACT_SUBSTRING_RUNS, bench=True, tags=("dedup", "exact-substring", "positional-index", "islands"))
_register("dedup_exact_substring_ledger", dedup.exact_substring_ledger, dedup.ORACLE_EXACT_SUBSTRING_LEDGER, tags=("dedup", "exact-substring", "interval-merge", "quality"))
_register("dedup_substring_coverage_audit", dedup.substring_coverage_audit, dedup.ORACLE_SUBSTRING_COVERAGE_AUDIT, tags=("dedup", "exact-substring", "evaluation", "recall-report", "self-measurement"))
_register("stream_exact_substring_probe", stream_jobs.stream_exact_substring_probe, dedup.ORACLE_EXACT_SUBSTRING_RUNS, tags=("streaming", "dedup", "exact-substring", "serving", "append-mode"))
_register("scale_bucketed_substring_serve", scale.bucketed_substring_serve, dedup.ORACLE_EXACT_SUBSTRING_RUNS, tags=("scale", "dedup", "exact-substring", "bucketing", "zero-shuffle-join", "serving"))
_register("curation_strip_dup_spans", dedup.strip_dup_spans, dedup.ORACLE_STRIP_DUP_SPANS, tags=("curation", "dedup", "exact-substring", "corpus-rewrite", "e2e"))
_register("text_sdm_topk", retrieval.sdm_topk, retrieval.ORACLE_SDM_TOPK, bench=True, tags=("text-analysis", "retrieval", "lexical", "proximity", "sdm", "rank-fusion", "positional-index", "top-n"))

# --- round 14: unigram-LM tokenizer training (SentencePiece-style
# Viterbi-EM, Kudo 2018) — the standard counterpart to the BPE trio ---
_register("curation_unigram_train", curation.unigram_train, curation.ORACLE_UNIGRAM_TRAIN, bench=True, tags=("curation", "text", "tokenizer-training", "iterative", "viterbi-em"))
_register("curation_unigram_encode", curation.unigram_encode_corpus, curation.ORACLE_UNIGRAM_ENCODE, tags=("curation", "text", "tokenizer-training", "train-serve", "viterbi-em"))
_register("curation_unigram_fertility", curation.unigram_fertility_vs_bpe, curation.ORACLE_UNIGRAM_FERTILITY, tags=("curation", "text", "tokenizer-training", "fertility", "evaluation", "self-measurement"))
_register("scale_bucketed_sdm_serve", scale.bucketed_sdm_serve, retrieval.ORACLE_SDM_TOPK, tags=("scale", "retrieval", "lexical", "proximity", "sdm", "positional-index", "bucketing", "zero-shuffle-join", "serving"))
_register("curation_unigram_budget", curation.unigram_token_budget, curation.ORACLE_UNIGRAM_BUDGET, tags=("curation", "text", "tokenizer-training", "train-serve", "token-accounting"))
_register("curation_unigram_vocab_sweep", curation.unigram_vocab_sweep, curation.ORACLE_UNIGRAM_SWEEP, tags=("curation", "text", "tokenizer-training", "calibration", "evaluation", "self-measurement"))
_register("stream_sdm_serve", stream_jobs.stream_sdm_serve, retrieval.ORACLE_SDM_TOPK, tags=("streaming", "retrieval", "lexical", "proximity", "sdm", "rank-fusion", "serving", "append-mode"))
_register("curation_blocklist_scrub", curation.blocklist_scrub, curation.ORACLE_BLOCKLIST_SCRUB, tags=("curation", "text", "policy-filter", "phrase-match", "corpus-rewrite"))
_register("stream_blocklist_scrub", stream_jobs.stream_blocklist_scrub, curation.ORACLE_BLOCKLIST_SCRUB, tags=("streaming", "curation", "policy-filter", "phrase-match", "serving", "append-mode"))

# --- round 15: intra-document exact-substring branch (VERDICT r14 ask #3;
# depth-over-breadth round — ≤5 net-new entries, see _SAMPLE_PRIORITY) ---
_register("dedup_intra_doc_spans", dedup.intra_doc_spans, dedup.ORACLE_INTRA_DOC_SPANS, tags=("dedup", "exact-substring", "intra-document", "interval-merge", "quality"))
_register("curation_strip_all_spans", dedup.strip_all_dup_spans, dedup.ORACLE_STRIP_ALL_SPANS, tags=("curation", "dedup", "exact-substring", "intra-document", "corpus-rewrite", "e2e"))
# tokenizer serving at ingest (VERDICT r14 ask #4): the missing twin —
# every other family already serves at ingest.
_register("stream_unigram_encode", stream_jobs.stream_unigram_encode, curation.ORACLE_UNIGRAM_ENCODE, tags=("streaming", "curation", "tokenizer-training", "train-serve", "viterbi-em", "serving", "append-mode"))


# =============================================================================
# Per-round sample window (the driver samples the FIRST 50 registrations,
# so ordering is evidence strategy). Ever-green union covers every
# pre-round-13 entry (CORRECTNESS_r01-r12), so FRESHNESS is the operative
# invariant. From round 13 the window is MACHINE-DERIVED, not hand-staged
# (VERDICT r12 ask #5): window = never-driver-verified entries (new
# additions) + _REVERIFY_HEAD (entries whose expressions changed since
# their last green row - the same-round re-verification discipline,
# declared explicitly here) + the STALEST remaining entries by
# (last-green round, registration order) up to 50.
# tools/coverage_report.py implements the rule (staged_window) and emits
# the per-entry last-green ledger into COVERAGE.md;
# tests/test_freshness.py asserts this list matches the rule against the
# committed CORRECTNESS_r*.json - restaging each round is forced by CI,
# not by comment discipline.
# =============================================================================

# Registration (file) order BEFORE the window reorder below - the
# tie-break among equally-stale entries, stable across rounds.
_REGISTRATION_ORDER = tuple(_REGISTRY)

# Entries whose expressions changed this round AFTER their last green
# driver row (same-round re-verification). NOTE the cross-round
# coupling (ADVICE r13): landing a new CORRECTNESS_r*.json ledger file
# advances the derived window, so the ledger, a restaged
# _SAMPLE_PRIORITY, and a cleared/updated _REVERIFY_HEAD must land in
# ONE commit or tests/test_freshness.py fails in between.
# Round 16 (VERDICT r15 "what's wrong" #2): the 7 entries whose
# expressions changed in the r15 optimization session (fb58517: the
# copurchase basket/edge rewrite + union-aggregate PageRank rounds;
# 32fad19: the SDM window-leg fusion) were NOT restaged in r15 — their
# only green evidence is test_parity. Restage them at the head so the
# r16 driver verify covers them. vocab_sweep re-greened in r15
# (CORRECTNESS_r15) — cleared. Plus the r16 optimization session's own
# changed entries, landed in the same commits as the changes: the
# simhash fingerprint 64-conditional-sum rewrite (simhash + its two
# consumers) and the sweep count/hit aggregation fusions.
_REVERIFY_HEAD = (
    "ads_part_pagerank_deep", "ads_part_pagerank", "ads_copurchase_pairs",
    "ads_association_rules", "ads_part_triangles", "ads_part_bfs_distances",
    "text_sdm_topk",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_keep_best",
    "dedup_minhash_band_tuning", "dedup_winnowing_w_sweep",
)

# Round-16 window, derived by the rule above. Optimization round: zero
# net-new registrations (no never-green entries — CORRECTNESS_r15
# greened all of its 50); the window is the 12-entry re-verify head
# plus pure stalest fill (r9 then r10 cohorts, registration order).
# Restaged whenever an r16 shape change lands —
# tests/test_freshness.py holds it to the rule.
_SAMPLE_PRIORITY = [
    # changed-code re-verification (_REVERIFY_HEAD): r15 optimization
    # commits fb58517 + 32fad19, then this round's dedup changes
    "ads_part_pagerank_deep", "ads_part_pagerank", "ads_copurchase_pairs",
    "ads_association_rules", "ads_part_triangles", "ads_part_bfs_distances",
    "text_sdm_topk",
    "dedup_simhash", "dedup_simhash_pairs", "dedup_keep_best",
    "dedup_minhash_band_tuning", "dedup_winnowing_w_sweep",
    # stalest fill: last green r9, registration order
    "ads_top_brands", "ads_hourly_stats", "ads_status_stats",
    "ads_user_scores", "ads_keyword_weighted", "ads_totals",
    "ads_province_rollup", "ads_visitor_ratios",
    "ads_monthly_status_pivot", "ads_gmv_moving_avg",
    "ads_amount_percentiles", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_connected_components",
    "dedup_chunk_first_occurrence", "curation_bpe_pair_counts",
    "curation_lm_score", "sim_ann_topk", "sim_embedding_neardup_lsh",
    "sim_ivf_topk", "text_lang_id", "text_quality_scores",
    "text_token_counts", "stream_pit_features_gated",
    "stream_zorder_compaction", "stream_cdc_delete_aware_agg",
    "ads_ldiversity_export", "sim_hard_negatives",
    "curation_bpe_greedy_drift",
    # stalest fill: last green r10, registration order
    "sim_kmeans_assign", "stream_binned_range_join",
    "stream_config_routing", "dedup_apply_near",
    "sim_ivf_topk_trained", "sim_hard_negatives_ivf",
    "dedup_containment_prefix", "sim_mrl_truncation_recall",
]
assert len(_SAMPLE_PRIORITY) == 50, len(_SAMPLE_PRIORITY)
assert len(set(_SAMPLE_PRIORITY)) == 50
_missing = [n for n in _SAMPLE_PRIORITY if n not in _REGISTRY]
assert not _missing, f"sample priority names not registered: {_missing}"
_REGISTRY = {
    **{n: _REGISTRY[n] for n in _SAMPLE_PRIORITY},
    **{n: q for n, q in _REGISTRY.items() if n not in _SAMPLE_PRIORITY},
}


def registry() -> dict[str, Query]:
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle}


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in _REGISTRY.items() if q.bench}
