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
from ocr_poc_ray.queries import transcripts as _xs
from ocr_poc_ray.queries import vectors as _vec

#: name -> (pipeline callable, oracle SQL or None)
_ALL: dict[str, tuple[Callable[[str], Any], str | None]] = {}
_ALL.update(_docs.REGISTRY)
_ALL.update(_vec.REGISTRY)
_ALL.update(_rel.REGISTRY)
_ALL.update(_xs.REGISTRY)

#: The driver's per-round correctness run covers a fixed-size window from
#: the FRONT of this dict's iteration order (50 entries in round 2), so the
#: front must span every operator family — extraction (xs_/fields_),
#: relational joins/windows/quantiles (rel_), vectors (vec_), multimodal
#: (mm_) — before the long doc_* tail, or whole families get no driver row.
_PRIORITY: list[str] = [
    # SURVEY §2 flagship extraction + conversation assembly
    "xs_extract_documents",
    "xs_conv_docs_documents",
    "xs_extract_synth",
    "xs_training_pipeline",
    "xs_extract_spans_documents",
    "xs_conv_stats",
    "xs_turn_gaps",
    "xs_extract_lang_stats",
    "xs_context_window_chars",
    "xs_conv_dedup",
    "fields_extract_synth",
    "fields_postprocessed",
    # multimodal plumbing
    "mm_decode",
    "mm_resize",
    "mm_frame_sample",
    "mm_audio_windows",
    # vectors
    "vec_knn_cosine",
    "vec_knn_lsh",
    "vec_knn_ivf",
    "vec_near_dup",
    "vec_kmeans",
    "rel_scrub_customer_names",
    "vec_cluster_exemplars",
    "vec_knn_pq",
    "vec_group_centroids",
    "vec_quality_centroids",
    "vec_dim_stats",
    "xs_role_transitions",
    # relational: aggregates, joins, windows, quantiles, sketches
    "rel_agg_lineitem",
    "rel_mktsegment_revenue",
    "rel_user_gini",
    "rel_nation_revenue",
    "rel_customers_without_orders",
    "rel_asof_purchase_click",
    "rel_range_join_click_error",
    "rel_sessionize",
    "rel_rolling_value",
    "rel_running_value_by_user",
    "rel_first_touch_attribution",
    "rel_value_quantiles_exact",
    "rel_bloom_semijoin",
    "rel_hll_distinct_users",
    # strongest doc_* representatives (dedup family + curation)
    "doc_extract_plain",
    "doc_exact_dedup",
    "doc_minhash_pairs",
    "doc_jaccard_pairs_prefix",
    "doc_curation_pipeline",
    "doc_near_dup_components",
    "doc_chunk_dedup",
    "doc_substring_dedup",
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
