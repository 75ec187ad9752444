"""The driver-contract surface: every queries() entry runs; a fast
subset is verified against its DuckDB oracle exactly the way the
driver does (row count + columns + order-insensitive values).

Full-registry oracle runs live in tools/check_correctness.py; here we
keep the suite fast by checking the cheap oracles at sf0.001 and just
executing the rest.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# oracle-checked here (cheap at sf0.001); the rest still must RUN
FAST_ORACLE = [
    "doc_gopher_rules",
    "doc_near_dedup_corpus",
    "doc_k_anonymity",
    "doc_extract_json",
    "doc_pareto_frontier",
    "doc_dup_triangles",
    "xs_turn_overlap",
    "doc_kwic",
    "doc_anchor_spans",
    "doc_token_counts",
    "doc_quality",
    "doc_langid",
    "doc_fingerprint",
    "doc_exact_dedup",
    "doc_sample_per_lang",
    "doc_pack_sequences",
    "doc_shuffled_order",
    "doc_chunk_tokens",
    "doc_top_tokens",
    "doc_repetition",
    "doc_chunk_dedup",
    "doc_chunk_dup_histogram",
    "doc_mixture_sample",
    "doc_temperature_sample",
    "doc_jaccard_pairs_prefix",
    "vec_semantic_dedup",
    "mm_phash_neardup",
    "mm_phash_components",
    "rel_value_histogram",
    "doc_heavy_tokens_mg",
    "rel_nation_trade_matrix",
    "doc_incremental_dedup",
    "rel_window_dedup",
    "xs_tool_runs",
    "vec_contrastive_pairs",
    "doc_snapshot_diff",
    "rel_value_psi",
    "rel_cohort_ltv",
    "rel_linear_attribution",
    "doc_source_ttr",
    "doc_winnow_fingerprints",
    "xs_truncate_to_budget",
    "rel_agg_lineitem",
    "rel_promo_revenue",
    "rel_small_qty_revenue",
    "rel_supplier_value_share",
    "rel_disjunctive_parts",
    "rel_top_supplier",
    "rel_balance_audit",
    "rel_market_share",
    "rel_nation_profit",
    "rel_returned_topk_customers",
    "rel_shipmode_priority",
    "rel_order_priority_exists",
    "rel_forecast_revenue",
    "rel_local_supplier_volume",
    "rel_min_cost_supplier",
    "rel_supplier_part_counts",
    "rel_excess_quantity_suppliers",
    "rel_daily_gapfill",
    "rel_topk_orders",
    "rel_event_type_stats",
    "rel_sessionize",
    "rel_asof_purchase_click",
    "rel_range_join_click_error",
    "rel_daily_events",
    "rel_distinct_users",
    "rel_top_revenue_orders",
    "rel_bloom_semijoin",
    "rel_running_value_by_user",
    "rel_event_lag_delta",
    "rel_sample_per_user",
    "rel_value_percent_rank",
    "rel_props_json",
    "rel_user_funnel",
    "rel_user_mode_event",
    "rel_rolling_active_users",
    "doc_source_lang_matrix",
    "doc_dedup_keep_best",
    "doc_decontaminate",
    "doc_source_entropy",
    "rel_corr_value_k",
    "rel_priority_returned_orders",
    "rel_median_value_by_type",
    "rel_value_quantiles_exact",
    "rel_cumulative_users",
    "rel_viewers_never_purchased",
    "rel_user_retention",
    "vec_dim_stats",
    "doc_token_cooccurrence",
    "doc_token_zipf",
    "doc_adaptive_stopwords",
    "vec_knn_cosine",
    "xs_extract_documents",
    "xs_conv_docs_documents",
    "xs_turn_gaps",
    "doc_length_pct_rank_by_lang",
    "doc_unigram_logprob",
    "doc_weighted_sample",
    "rel_event_streaks",
    "xs_extract_lang_stats",
    "xs_context_window_chars",
    "doc_bigram_logprob",
    "doc_token_entropy",
    "doc_lang_source_rollup",
    "mm_audio_windows",
    "doc_zorder_layout",
    "xs_conv_dedup",
    "doc_train_split",
    "rel_customer_order_counts",
    "mm_resize",
    "doc_dup_ngram_fraction",
    "doc_corpus_card",
    "doc_interleaved_order",
    "doc_source_kl",
    "vec_norm_outliers",
    "doc_weighted_sample_per_lang",
    "doc_quality_blend",
    "rel_session_spans",
    "rel_first_touch_attribution",
    "xs_role_stats",
    "rel_winsorized_stats",
    "rel_hourly_profile",
    "doc_filter_report",
    "xs_dialogue_pairs",
    "rel_event_pivot",
    "rel_regr_slope",
    "mm_exact_dup",
    "doc_bm25_topk",
    "rel_mad_outliers",
    "doc_dsir_weights",
    "doc_soft_dedup_weights",
    "doc_bpe_top_pairs",
    "rel_value_ks_drift",
    "doc_ngram_novelty",
    "rel_late_events",
    "xs_role_balance",
    "xs_first_turn_dedup",
    "xs_window_export",
    "rel_brand_supplier_distinct",
    "xs_template_safe_split",
    "xs_curation_pipeline",
    "doc_langid_confusion",
    "xs_window_export_text",
    "rel_sole_late_supplier",
    "rel_order_count_histogram",
    "rel_bulk_orders",
    "xs_tool_latency",
    "xs_tool_transitions",
    "rel_user_coverage_time",
    "doc_fim_split",
    "doc_span_corruption",
    "vec_int8_quantize",
    "doc_boolean_search",
    "doc_containment_pairs",
    "doc_normalize_dedup",
    "doc_shard_balance",
    "doc_cluster_cap_sample",
    "rel_event_unpivot",
    "doc_curation_funnel",
    "doc_pack_efficiency",
    "rel_value_equidepth",
    "doc_dup_threshold_curve",
    "doc_split_leakage_audit",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_registry_has_oracles_for_sql_expressible():
    from ocr_poc_ray.queries import oracle_sql, queries

    q, o = queries(), oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
    assert len(o) >= 14


@pytest.mark.parametrize("name", FAST_ORACLE)
def test_query_matches_oracle(ray_session, oracle_con, name):
    from ocr_poc_ray.queries import REGISTRY

    fn, sql = REGISTRY[name]
    assert sql is not None
    mine = _canon(fn(SF_DIR))
    oracle = _canon(oracle_con.execute(sql).fetchdf())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle)
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, atol=1e-9)


def test_unchecked_queries_run(ray_session):
    """EVERY registry entry not oracle-checked above still executes and
    returns rows at sf0.001 — rows-only queries AND the slow-oracle
    ones excluded from FAST_ORACLE for suite-speed reasons.  No query
    can be registered without at least running in CI."""
    from ocr_poc_ray.queries import REGISTRY

    fast = set(FAST_ORACLE)
    for name, (fn, sql) in REGISTRY.items():
        if name in fast:
            continue
        out = fn(SF_DIR)
        assert len(out) > 0, name


def test_unigram_logprob_capped_vocab(ray_session):
    """top_v caps the broadcast model; OOV tokens score at the add-one
    floor so every doc still gets a finite score."""
    from ocr_poc_ray.queries.documents import doc_unigram_logprob

    full = doc_unigram_logprob(SF_DIR)
    capped = doc_unigram_logprob(SF_DIR, top_v=16)
    assert len(capped) == len(full)
    merged = full.merge(capped, on="doc_id", suffixes=("_f", "_c"))
    assert (merged["n_toks_f"] == merged["n_toks_c"]).all()
    # capping can only lower a doc's average log-prob (OOV floor is
    # below every real in-vocab probability)
    assert (merged["avg_logprob_c"] <= merged["avg_logprob_f"] + 1e-9).all()
    assert (capped["avg_logprob"] > -100).all()


def test_compress_ratio_invariants(ray_session):
    """Repetitive text compresses much better than varied text, and
    ratios live in (0, ~1.1] (zlib header overhead on tiny docs)."""
    from ocr_poc_ray.queries.documents import doc_compress_ratio

    out = doc_compress_ratio(SF_DIR)
    assert len(out) > 0
    assert (out["compress_ratio"] > 0).all()
    assert (out["compress_ratio"] <= 1.2).all()
    import hashlib
    import zlib
    rep = ("spam " * 200).encode()
    # deterministic pseudo-random bytes (sha256 chain) — incompressible
    var = b""
    h = b"seed"
    for _ in range(32):
        h = hashlib.sha256(h).digest()
        var += h
    assert len(zlib.compress(rep, 6)) / len(rep) < 0.1
    assert len(zlib.compress(var, 6)) / len(var) > 0.9


def test_corpus_is_ascii(ray_session):
    """Guard for the CLAUDE.md tokenization-parity assumption: Python
    str.split()/strip() and RE2 \\s agree because the corpus is ASCII.
    If the driver's testdata ever grows unicode whitespace, this fails
    FIRST, before some subtle oracle hash mismatch does."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    for chunk in t["text"].chunks:
        for s in chunk.to_pylist():
            assert s is None or s.isascii()


def test_conv_turn_offsets_slice_doc_text(ray_session):
    """Composition invariant: slicing the assembled conversation
    document at each turn's [start_c, end_c) reproduces that turn's
    extracted text exactly."""
    from ocr_poc_ray.queries.transcripts import (
        xs_conv_docs_documents,
        xs_conv_turn_offsets,
        xs_extract_documents,
    )

    sf = "/root/testdata/sf0.001"
    docs = xs_conv_docs_documents(sf).set_index("conv_id")
    turns = xs_extract_documents(sf)
    turns = turns[turns["success"]].set_index(["conv_id", "turn_idx"])
    offs = xs_conv_turn_offsets(sf)
    assert len(offs) == len(turns)
    for r in offs.itertuples():
        doc = docs.loc[r.conv_id, "doc_text"]
        expect = turns.loc[(r.conv_id, r.turn_idx), "extracted_text"]
        assert doc[r.start_c : r.end_c] == expect


def test_contamination_sketch_matches_exact(ray_session, tmp_path):
    """Bottom-k contamination estimates vs the exact matrix on planted
    overlap: exact when signatures are complete (k > universe), within
    the 1/√k band when truncated."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_poc_ray.queries.documents import (
        doc_source_contamination,
        doc_source_contamination_sketch,
    )

    rng = np.random.default_rng(5)
    shared = [" ".join(f"s{rng.integers(0, 500)}" for _ in range(40))
              for _ in range(25)]
    only_a = [" ".join(f"a{rng.integers(0, 500)}" for _ in range(40))
              for _ in range(25)]
    only_b = [" ".join(f"b{rng.integers(0, 500)}" for _ in range(40))
              for _ in range(25)]
    texts = shared + only_a + shared + only_b
    srcs = ["srcA"] * 50 + ["srcB"] * 50
    pq.write_table(
        pa.table({"source": srcs, "text": texts}),
        str(tmp_path / "documents.parquet"),
    )

    exact = doc_source_contamination(str(tmp_path))
    true_j = float(exact["jaccard"].iloc[0])
    assert true_j > 0.2  # the plant is real

    # complete signatures (k beyond the shingle universe) → exact
    full = doc_source_contamination_sketch(str(tmp_path), k=100_000)
    assert abs(float(full["est_jaccard"].iloc[0]) - true_j) < 1e-9

    # truncated signatures → within the sampling band
    small = doc_source_contamination_sketch(str(tmp_path), k=256)
    err = abs(float(small["est_jaccard"].iloc[0]) - true_j)
    assert err < 4.0 / np.sqrt(256), (true_j, float(small["est_jaccard"].iloc[0]))


def test_returned_topk_tie_break(ray_session, tmp_path):
    """Planted exact revenue tie AT the top-k boundary: customers 20/21/22
    share one revenue; the deterministic (−revenue, custkey) tie-break must
    admit exactly custkey 20 — LIMIT-with-ties is the classic place a Ray
    result and a SQL oracle silently disagree."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_poc_ray.queries.relational import (
        RETURNED_TOPK,
        rel_returned_topk_customers,
    )

    n_cust = 25
    custkeys = np.arange(1, n_cust + 1, dtype=np.int64)
    pq.write_table(
        pa.table({
            "c_custkey": custkeys,
            "c_name": [f"Customer#{k:09d}" for k in custkeys],
            "c_nationkey": (custkeys % 3).astype(np.int64),
        }),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table({
            "n_nationkey": np.arange(3, dtype=np.int64),
            "n_name": [f"NATION_{i}" for i in range(3)],
        }),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table({
            "o_orderkey": custkeys,  # one order per customer
            "o_custkey": custkeys,
            "o_orderdate": pa.array(
                [np.datetime64("1996-03-01", "us")] * n_cust,
                type=pa.timestamp("us"),
            ),
        }),
        str(tmp_path / "orders.parquet"),
    )
    # revenue: cust 1..19 descending and distinct; 20/21/22 EXACTLY tied
    # just below cust 19; 23..25 lower.  Plus an 'N' line per customer
    # that must be excluded entirely.
    price = np.where(custkeys <= 19, 1000.0 - 10.0 * custkeys,
                     np.where(custkeys <= 22, 750.0, 100.0 + custkeys))
    pq.write_table(
        pa.table({
            "l_orderkey": np.concatenate([custkeys, custkeys]),
            "l_returnflag": ["R"] * n_cust + ["N"] * n_cust,
            "l_extendedprice": np.concatenate([price, price * 100]),
            "l_discount": np.zeros(2 * n_cust),
        }),
        str(tmp_path / "lineitem.parquet"),
    )

    out = rel_returned_topk_customers(str(tmp_path))
    assert len(out) == RETURNED_TOPK
    assert sorted(out["c_custkey"].tolist()) == list(range(1, 21)), (
        "tie at the boundary must resolve to the lowest custkey"
    )
    tied = out[out["c_custkey"] == 20]
    assert int(tied["revenue_micents"].iloc[0]) == 750_00 * 100
    # the N-line revenue (100× bigger) never leaks in
    assert int(out["revenue_micents"].max()) == 990_00 * 100
