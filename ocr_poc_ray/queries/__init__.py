"""Query registry: every implemented operator exposed as a named
pipeline callable (sf_dir -> result) with, where SQL-expressible, the
ANSI-SQL oracle DuckDB runs on the same parquet tables.

This is the engine's public correctness surface (driver contract in
``__ray_entry__.py``): one entry per operator family from SURVEY.md §2
plus the large-scale training-data operations.  Keys with a ``None``
oracle are genuinely non-SQL-expressible (MinHash/SimHash/LSH, the
synthetic-transcript extraction pipelines) and get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ocr_poc_ray.queries import documents as _docs
from ocr_poc_ray.queries import relational as _rel
from ocr_poc_ray.queries import training as _train
from ocr_poc_ray.queries import transcripts as _xs
from ocr_poc_ray.queries import vectors as _vec

#: name -> (pipeline callable, oracle SQL or None)
_ALL: dict[str, tuple[Callable[[str], Any], str | None]] = {}
_ALL.update(_docs.REGISTRY)
_ALL.update(_vec.REGISTRY)
_ALL.update(_rel.REGISTRY)
_ALL.update(_xs.REGISTRY)
_ALL.update(_train.REGISTRY)

#: The driver's per-round correctness run covers a fixed-size window from
#: the FRONT of this dict's iteration order (50 entries per round).  Rounds
#: 1-3 together covered 102 of the 141 registered queries; this round's
#: front is rotated to be exactly the 39 queries that have never had a
#: driver row (all green in the independent 141-query battery) plus the
#: 11 flagship pipelines, so that after round 4 EVERY registered query has
#: appeared in at least one driver CORRECTNESS_r*.json.
#: ROUND-5 NOTE: rotate the non-flagship window slots to the round-4
#: additions that have never had a driver row — doc_pack_interleaved,
#: doc_length_ntile, doc_lang_source_cube, vec_label_medoid,
#: rel_customer_name_fuzzy_pairs, xs_conv_pack, rel_skew_join_segments,
#: doc_mixture_allocate, doc_chunk_overlap, xs_dialogue_pairs,
#: rel_event_pivot, rel_regr_slope, mm_exact_dup, doc_bm25_topk,
#: rel_mad_outliers, vec_semantic_dedup, mm_phash_neardup,
#: rel_value_histogram, doc_heavy_tokens_mg, rel_nation_trade_matrix,
#: doc_gopher_rules, doc_near_dedup_corpus, doc_k_anonymity,
#: doc_pareto_frontier, doc_dup_triangles, vec_knn_hnsw,
#: vec_knn_hnsw_index, vec_hnsw_ef_curve, doc_extract_json,
#: doc_incremental_dedup, rel_window_dedup, xs_tool_runs,
#: vec_contrastive_pairs, doc_snapshot_diff, rel_value_psi,
#: vec_knn_ivf_index, rel_cohort_ltv, doc_source_ttr,
#: rel_linear_attribution, mm_phash_components,
#: doc_winnow_fingerprints, xs_truncate_to_budget, doc_dsir_weights,
#: doc_soft_dedup_weights, doc_bpe_top_pairs, rel_value_ks_drift,
#: doc_bpe_learn, doc_ngram_novelty, rel_value_tdigest, vec_knn_recall,
#: doc_kwic, doc_anchor_spans, xs_turn_overlap, doc_fim_split,
#: doc_span_corruption, vec_int8_quantize, doc_boolean_search,
#: doc_containment_pairs, doc_lsh_quality_report, doc_normalize_dedup,
#: doc_shard_balance, vec_mmr_topk, vec_dim_truncation_recall,
#: doc_cluster_cap_sample, rel_event_unpivot, doc_curation_funnel,
#: doc_pack_efficiency, rel_value_equidepth, vec_ivf_probe_curve,
#: doc_dup_threshold_curve, doc_split_leakage_audit,
#: doc_source_contamination_sketch, rel_late_events, xs_role_balance,
#: vec_logreg_train, doc_quality_classifier,
#: rel_promo_revenue, rel_small_qty_revenue, rel_supplier_value_share,
#: rel_disjunctive_parts, rel_top_supplier, rel_balance_audit,
#: xs_first_turn_dedup, xs_window_export, rel_brand_supplier_distinct,
#: vec_pca_project, xs_template_safe_split, xs_curation_pipeline,
#: vec_dbscan, doc_langid_confusion, xs_window_export_text,
#: rel_sole_late_supplier, rel_order_count_histogram, rel_bulk_orders,
#: xs_tool_latency, rel_user_coverage_time, rel_market_share,
#: rel_nation_profit, rel_returned_topk_customers, xs_tool_transitions,
#: rel_shipmode_priority, rel_forecast_revenue, rel_local_supplier_volume,
#: rel_min_cost_supplier, rel_supplier_part_counts,
#: rel_excess_quantity_suppliers, doc_cdc_chunk_stats,
#: rel_daily_gapfill — plus a spread of the rounds-1/2 queries whose
#: driver rows are oldest.
_PRIORITY: list[str] = [
    # flagships (keep a driver row every round)
    "xs_extract_documents",
    "xs_conv_docs_documents",
    "xs_extract_spans_documents",
    "xs_extract_synth",
    "xs_training_pipeline",
    "fields_extract_synth",
    "doc_extract_plain",
    "doc_exact_dedup",
    "doc_minhash_pairs",
    "vec_knn_cosine",
    "rel_agg_lineitem",
    # the 39 never-driver-checked queries (rounds 1-3 union excluded these)
    "xs_role_stats",
    "xs_conv_turn_offsets",
    "doc_pii_redact",
    "doc_top_tokens_per_source",
    "doc_source_contamination",
    "doc_weighted_sample_per_lang",
    "doc_quality_blend",
    "doc_filter_report",
    "vec_top_eigen",
    "vec_norm_outliers",
    "rel_decayed_user_value",
    "rel_click_purchase_full_outer",
    "rel_lineitem_profile",
    "rel_event_props_scrub",
    "rel_region_supplier_balance",
    "rel_brand_revenue",
    "rel_supplier_nation_topk",
    "rel_priority_returned_orders",
    "rel_median_value_by_type",
    "rel_event_lag_delta",
    "rel_event_streaks",
    "rel_cm_user_counts",
    "rel_customer_order_counts",
    "rel_session_spans",
    "rel_winsorized_stats",
    "rel_hourly_profile",
    "rel_sample_per_user",
    "rel_props_json",
    "rel_user_funnel",
    "rel_user_mode_event",
    "rel_rolling_active_users",
    "rel_corr_value_k",
    "rel_cumulative_users",
    "rel_viewers_never_purchased",
    "rel_user_retention",
    "rel_value_percent_rank",
    "rel_value_quantiles_by_type",
    "rel_topk_events_per_user",
    "rel_hopping_window",
]

REGISTRY: dict[str, tuple[Callable[[str], Any], str | None]] = {}
for _name in _PRIORITY:
    REGISTRY[_name] = _ALL[_name]
for _name, _entry in _ALL.items():
    if _name not in REGISTRY:
        REGISTRY[_name] = _entry


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
