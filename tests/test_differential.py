"""Randomized differential harness: GENERATED documents/events tables
(seeded, schema-conformant, adversarially spiced) run through a subset
of oracle-checked queries on BOTH engines.  The fixed testdata can
mask bugs its distributions never hit (empty zero buckets, noise-line
extraction corners, timestamp ties, duplicate texts); random tables
hunt those.  Only integer/string/2-dp-total outputs participate — the
float-rounding-boundary rule from CLAUDE.md — and generated `value`s
are exact binary quarters so 2-dp totals cannot sit on a boundary.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = ("documents", "events")

#: queries safe for random inputs: integer/string outputs (or 2-dp
#: totals over exact-quarter values), no fixture-specific constants
DIFF_QUERIES = [
    "rel_daily_events",
    "rel_event_type_stats",
    "rel_hourly_profile",
    "rel_event_streaks",
    "rel_session_spans",
    "rel_window_dedup",
    "rel_user_mode_event",
    "rel_late_events",
    "rel_user_coverage_time",
    "rel_daily_gapfill",
    "doc_exact_dedup",
    "doc_train_split",
    "doc_langid",
    "doc_langid_confusion",
    "xs_role_balance",
    "xs_window_export",
    "xs_window_export_text",
    "xs_first_turn_dedup",
    "xs_template_safe_split",
    "xs_conv_dedup",
    "xs_tool_runs",
    "xs_tool_latency",
    "xs_tool_transitions",
    "xs_conv_turn_offsets",
    "xs_extract_documents",
    # second wave — integer/string outputs over the generated tables
    "doc_source_lang_matrix",
    "doc_fingerprint",
    "doc_dup_components_exact",
    "doc_length_ntile",
    "doc_lang_source_rollup",
    "doc_lang_source_cube",
    "rel_user_funnel",
    "rel_viewers_never_purchased",
    "rel_cumulative_users",
    "rel_rolling_active_users",
    "rel_distinct_users",
    "rel_props_json",
    "xs_dialogue_pairs",
    "xs_role_transitions",
    "xs_conv_pack",
    "xs_truncate_to_budget",
    # round-4 wave — integer/boolean outputs, exact-division thresholds
    "doc_gopher_rules",
    "doc_k_anonymity",
    "doc_l_diversity",
    "doc_t_closeness",
    "doc_pareto_frontier",
    "doc_dup_triangles",
    "doc_near_dedup_corpus",
    "doc_curation_funnel",
    "doc_extract_json",
]

#: TPC-H-family queries over GENERATED relational tables (third wave).
#: All outputs are integers, strings, or exact-integer micents/ppm, so
#: random money (exact quarters) can never hit a rounding boundary.
DIFF_TPCH_QUERIES = [
    "rel_forecast_revenue",
    "rel_local_supplier_volume",
    "rel_min_cost_supplier",
    "rel_supplier_part_counts",
    "rel_excess_quantity_suppliers",
    "rel_sole_late_supplier",
    "rel_order_priority_exists",
    "rel_shipmode_priority",
    "rel_agg_lineitem",
    "rel_mktsegment_revenue",
    "rel_nation_revenue",
    "rel_customers_without_orders",
    "rel_order_count_histogram",
    "rel_bulk_orders",
    "rel_brand_supplier_distinct",
    "rel_market_share",
    "rel_nation_profit",
    "rel_returned_topk_customers",
    "rel_topk_orders",
    "rel_top_supplier",
    "rel_customer_name_fuzzy_pairs",
]

#: vector + multimodal queries over GENERATED embeddings/documents
#: (round-5 wave).  The vec oracles are generic over any
#: (vec_id, embedding, label) table; the mm oracles re-derive the
#: planted media rules relationally from doc_id, so any documents table
#: works.  Planted structure: label clusters (tight -> semantic-dedup +
#: contrastive pairs fire), exact duplicate vectors (cosine exactly 1,
#: tie-broken by vec_id identically on both engines), near-duplicate
#: perturbations, and vec_ids divisible by 100 (the knn query-set rule).
DIFF_VEC_MM_QUERIES = [
    "vec_knn_cosine",
    "vec_near_dup",
    "vec_semantic_dedup",
    "vec_contrastive_pairs",
    "vec_norm_outliers",
    "vec_label_medoid",
    "vec_group_centroids",
    "mm_decode",
    "mm_frame_sample",
    "mm_audio_windows",
    "mm_resize",
    "mm_exact_dup",
    "mm_phash_neardup",
    "mm_phash_components",
]

_STOP = {
    "en": ["the", "and", "with", "from"],
    "fr": ["le", "et", "dans", "pour"],
    "de": ["der", "und", "mit", "nicht"],
    "es": ["el", "los", "para", "como"],
}
_NOISE = ["I<FRA<<X", "a<<<b", "ABC", "", "  "]
_WORDS = ["alpha", "beta", "gamma", "delta", "sort", "merge", "table", "row"]


def _gen_documents(rng: np.random.Generator, n: int) -> pd.DataFrame:
    langs = np.asarray(["en", "fr", "de", "es", "zh"], dtype=object)
    sources = np.asarray([f"s{i}" for i in range(rng.integers(2, 7))], dtype=object)
    texts = []
    for _ in range(n):
        lines = []
        for _l in range(rng.integers(1, 5)):
            k = rng.integers(0, 10)
            if k < 2:  # noise line the extractor must drop
                lines.append(_NOISE[rng.integers(0, len(_NOISE))])
            else:
                pool = _WORDS + _STOP[
                    ["en", "fr", "de", "es"][rng.integers(0, 4)]
                ]
                lines.append(
                    " ".join(
                        pool[rng.integers(0, len(pool))]
                        for _w in range(rng.integers(1, 7))
                    )
                )
        texts.append("\n".join(lines))
    # plant exact duplicates (dedup must fire)
    for _ in range(max(2, n // 10)):
        i, j = rng.integers(0, n, 2)
        texts[i] = texts[j]
    # *7+1 cycles every residue mod 3/37/40/50 — the media-kind and
    # mm-dup-group rules all fire (with *3+1 every doc was ≡1 mod 3:
    # no videos existed, which masked mm_frame_sample's 0-row schema
    # loss until the vec/mm wave hit it)
    ids = rng.permutation(np.arange(n, dtype=np.int64) * 7 + 1)
    return pd.DataFrame(
        {
            "doc_id": ids,
            "text": pd.Series(texts, dtype=object),
            "lang": langs[rng.integers(0, len(langs), n)],
            "source": sources[rng.integers(0, len(sources), n)],
            "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
        }
    )


def _gen_events(rng: np.random.Generator, n: int) -> pd.DataFrame:
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 20 * 86_400_000_000
    ts = base + rng.integers(0, span_us, n).astype("timedelta64[us]")
    # plant timestamp ties inside users (ordering tie-break stress)
    for _ in range(n // 20):
        i, j = rng.integers(0, n, 2)
        ts[i] = ts[j]
    types = np.asarray(["view", "click", "purchase", "error", "signup"], dtype=object)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "event_type": types[rng.integers(0, len(types), n)],
            # exact binary quarters: 2-dp totals can't hit a boundary
            "value": rng.integers(0, 2000, n).astype(np.float64) / 4.0,
            "props": pd.Series(['{"k": %d}' % int(x) for x in rng.integers(0, 97, n)],
                               dtype=object),
        }
    )


def _gen_embeddings(rng: np.random.Generator, n: int) -> "pa.Table":
    """Seeded (vec_id, embedding, label) table with planted structure:
    4 label clusters (center + 0.3σ noise at dim 12), ~n/10 EXACT
    duplicate vectors, ~n/10 near-duplicates (1e-3 perturbation), and
    the first ids forced to multiples of 100 (the knn query-set rule).
    float32 storage matches the driver testdata schema."""
    import pyarrow as pa

    dim, k = 12, 4
    centers = rng.normal(size=(k, dim)) * 2.0
    labels = rng.integers(0, k, n)
    X = centers[labels] + rng.normal(size=(n, dim)) * 0.3
    # exact duplicates (same label): cosine exactly 1.0 on both engines
    for _ in range(max(2, n // 10)):
        i, j = rng.integers(0, n, 2)
        X[i] = X[j]
        labels[i] = labels[j]
    # near duplicates: tiny perturbation, cosine ~0.9999
    for _ in range(max(2, n // 10)):
        i, j = rng.integers(0, n, 2)
        X[i] = X[j] + rng.normal(size=dim) * 1e-3
        labels[i] = labels[j]
    # ids ≡ 3 (mod 7); the forced knn-query ids are multiples of 700
    # (≡ 0 mod 7) so they can NEVER collide with the bulk ids — seed 44
    # once produced a duplicate vec_id 500, and with a duplicated key
    # the engine (row-pair) and the SQL (vec_id < vec_id) legitimately
    # disagree about the self-pair
    ids = np.arange(n, dtype=np.int64) * 7 + 3
    ids[: max(3, n // 20)] = np.arange(max(3, n // 20), dtype=np.int64) * 700
    assert len(np.unique(ids)) == n
    X32 = X.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                [row for row in X32.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def _quarters(rng, n, lo, hi):
    """Exact binary quarters in [lo, hi) — 2-dp money that can't sit on
    a float rounding boundary."""
    return rng.integers(int(lo * 4), int(hi * 4), n).astype(np.float64) / 4.0


def _gen_tpch(rng: np.random.Generator, d: str) -> None:
    """Random TPC-H-shaped tables with adversarial plants: lateness
    boundary ties (ship == orderdate + exactly 30/60 days), discount
    band edges (0.05/0.07 inclusive), quantity exactly at the < 24
    cutoff, p_size at the < 10 edge, zero/negative supplier balances,
    customers without orders, orders without lineitems, one hot order
    with enough lines to cross the bulk threshold, and duplicate
    (order, supplier) pairs with MIXED lateness (the EXISTS/OR stress)."""
    region = pd.DataFrame(
        {"r_regionkey": np.arange(5, dtype=np.int32),
         "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}
    )
    nation = pd.DataFrame(
        {"n_nationkey": np.arange(25, dtype=np.int32),
         "n_name": [f"NATION_{i}" for i in range(25)],
         "n_regionkey": (np.arange(25) % 5).astype(np.int32)}
    )
    n_s = int(rng.integers(8, 25))
    supplier = pd.DataFrame(
        {"s_suppkey": np.arange(1, n_s + 1, dtype=np.int64),
         "s_name": [f"Supplier#{k:09d}" for k in range(1, n_s + 1)],
         "s_nationkey": rng.integers(0, 25, n_s).astype(np.int32),
         "s_acctbal": _quarters(rng, n_s, -500, 5000)}
    )
    supplier.loc[0, "s_acctbal"] = 0.0       # >= 0 boundary
    supplier.loc[1, "s_acctbal"] = -0.25     # excluded side
    n_c = int(rng.integers(25, 70))
    # VARIABLE-length noisy names: stresses the fuzzy join's
    # deletion-signature scheme across length groups (insertions and
    # deletions, not just same-length substitutions)
    _alpha = list("abcdefgh")
    base_names = [
        "".join(rng.choice(_alpha, size=rng.integers(5, 13)))
        for _ in range(n_c)
    ]
    for i in range(0, n_c - 1, 7):  # plant near-misses: 1-2 edits apart
        s = list(base_names[i])
        op = int(rng.integers(0, 3))
        if op == 0:
            s[rng.integers(0, len(s))] = str(rng.integers(0, 9))
        elif op == 1 and len(s) > 2:
            del s[rng.integers(0, len(s))]
        else:
            s.insert(int(rng.integers(0, len(s))), "z")
        base_names[i + 1] = "".join(s)
    customer = pd.DataFrame(
        {"c_custkey": rng.permutation(np.arange(n_c, dtype=np.int64) * 3 + 1),
         "c_name": base_names,
         "c_nationkey": rng.integers(0, 25, n_c).astype(np.int32),
         "c_acctbal": _quarters(rng, n_c, -100, 8000),
         "c_mktsegment": np.asarray(
             ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"],
             dtype=object)[rng.integers(0, 5, n_c)]}
    )
    n_p = int(rng.integers(20, 55))
    sizes = rng.integers(1, 51, n_p).astype(np.int32)
    sizes[:4] = [9, 10, 1, 50]  # the < 10 edge, both sides
    part = pd.DataFrame(
        {"p_partkey": np.arange(1, n_p + 1, dtype=np.int64),
         "p_name": [f"part {k}" for k in range(n_p)],
         "p_brand": np.asarray([f"Brand#{b}" for b in range(1, 26)],
                               dtype=object)[rng.integers(0, 25, n_p)],
         "p_type": np.asarray(["ECONOMY", "LARGE", "STANDARD", "MEDIUM",
                               "SMALL", "PROMO"], dtype=object)[
             rng.integers(0, 6, n_p)],
         "p_size": sizes,
         "p_retailprice": _quarters(rng, n_p, 100, 2000)}
    )
    part.loc[:2, "p_type"] = "STANDARD"  # market-share predicate must hit
    n_o = int(rng.integers(80, 180))
    base = np.datetime64("1995-01-01", "us")
    span_us = int(5.5 * 365 * 86_400_000_000)  # through mid-2000
    odate = base + rng.integers(0, span_us, n_o).astype("timedelta64[us]")
    odate[:2] = [np.datetime64("1996-01-01", "us"),   # window lo edge
                 np.datetime64("1996-03-31", "us")]   # inside Q4 quarter
    orders = pd.DataFrame(
        {"o_orderkey": rng.permutation(np.arange(n_o, dtype=np.int64) * 7 + 3),
         "o_custkey": customer["c_custkey"].to_numpy()[
             rng.integers(0, max(n_c - 5, 1), n_o)],  # last 5 custs orderless
         "o_orderstatus": np.asarray(["O", "F", "P"], dtype=object)[
             rng.integers(0, 3, n_o)],
         "o_totalprice": _quarters(rng, n_o, 1000, 400_000),
         "o_orderdate": odate,
         "o_orderpriority": np.asarray(
             ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
             dtype=object)[rng.integers(0, 5, n_o)]}
    )
    n_l = int(rng.integers(300, 700))
    oi = rng.integers(0, max(n_o - 3, 1), n_l)      # last 3 orders lineless
    oi[:30] = 0                                      # hot order (bulk + skew)
    okeys = orders["o_orderkey"].to_numpy()[oi]
    odates = orders["o_orderdate"].to_numpy()[oi]
    ship_lag_days = rng.integers(0, 120, n_l)
    ship_lag_days[:8] = [30, 30, 60, 60, 29, 31, 59, 61]  # lateness edges
    qty = rng.integers(1, 51, n_l).astype(np.float64)
    qty[:6] = [24.0, 24.0, 23.0, 25.0, 50.0, 50.0]   # < 24 cutoff edges
    disc = rng.integers(0, 11, n_l).astype(np.float64) / 100.0
    disc[:6] = [0.05, 0.07, 0.04, 0.08, 0.05, 0.07]  # band edges
    lineitem = pd.DataFrame(
        {"l_orderkey": okeys,
         "l_partkey": part["p_partkey"].to_numpy()[rng.integers(0, n_p, n_l)],
         "l_suppkey": supplier["s_suppkey"].to_numpy()[
             rng.integers(0, n_s, n_l)],
         "l_linenumber": np.arange(n_l, dtype=np.int32) % 7 + 1,
         "l_quantity": qty,
         "l_extendedprice": _quarters(rng, n_l, 900, 105_000),
         "l_discount": disc,
         "l_tax": rng.integers(0, 9, n_l).astype(np.float64) / 100.0,
         "l_returnflag": np.asarray(["R", "A", "N"], dtype=object)[
             rng.integers(0, 3, n_l)],
         "l_linestatus": np.asarray(["O", "F"], dtype=object)[
             rng.integers(0, 2, n_l)],
         "l_shipdate": odates
         + (ship_lag_days * 86_400_000_000).astype("timedelta64[us]")}
    )
    # duplicate (order, supplier) with mixed lateness: one early, one late
    dup = lineitem.iloc[:4].copy()
    dup["l_shipdate"] = dup["l_shipdate"] + np.timedelta64(90 * 86_400_000_000, "us")
    lineitem = pd.concat([lineitem, dup], ignore_index=True)
    for name, df in [("region", region), ("nation", nation),
                     ("supplier", supplier), ("customer", customer),
                     ("part", part), ("orders", orders),
                     ("lineitem", lineitem)]:
        df.to_parquet(os.path.join(d, f"{name}.parquet"), index=False)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


#: override with e.g. DIFF_SEEDS=7,8,9 for a wider local shakeout sweep
_SEEDS = [int(s) for s in os.environ.get("DIFF_SEEDS", "101,202,303").split(",")]
_TPCH_SEEDS = [
    int(s) for s in os.environ.get("DIFF_TPCH_SEEDS", "404,505").split(",")
]


@pytest.fixture(scope="module", params=_SEEDS)
def random_sf_dir(request, tmp_path_factory):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(request.param)
    d = tmp_path_factory.mktemp(f"diff_{request.param}")
    _gen_documents(rng, int(rng.integers(40, 160))).to_parquet(
        os.path.join(d, "documents.parquet"), index=False
    )
    _gen_events(rng, int(rng.integers(100, 500))).to_parquet(
        os.path.join(d, "events.parquet"), index=False
    )
    pq.write_table(
        _gen_embeddings(rng, int(rng.integers(60, 140))),
        os.path.join(d, "embeddings.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module", params=_TPCH_SEEDS)
def random_tpch_dir(request, tmp_path_factory):
    rng = np.random.default_rng(request.param)
    d = tmp_path_factory.mktemp(f"difftpch_{request.param}")
    _gen_tpch(rng, str(d))
    return str(d)


@pytest.mark.parametrize("name", DIFF_TPCH_QUERIES)
def test_differential_random_tpch(ray_session, random_tpch_dir, name):
    from ocr_poc_ray.queries import REGISTRY

    fn, sql = REGISTRY[name]
    assert sql is not None
    con = duckdb.connect()
    for t in ("region", "nation", "supplier", "customer", "part",
              "orders", "lineitem"):
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{random_tpch_dir}/{t}.parquet')"
        )
    mine = _canon(fn(random_tpch_dir))
    oracle = _canon(con.execute(sql).fetchdf())
    assert list(mine.columns) == list(oracle.columns), name
    assert len(mine) == len(oracle), f"{name}: {len(mine)} vs {len(oracle)}"
    if len(mine):
        oracle = oracle.astype(mine.dtypes.to_dict())
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


@pytest.mark.parametrize("name", DIFF_VEC_MM_QUERIES)
def test_differential_random_vec_mm(ray_session, random_sf_dir, name):
    from ocr_poc_ray.queries import REGISTRY

    fn, sql = REGISTRY[name]
    assert sql is not None
    con = duckdb.connect()
    for t in TABLES + ("embeddings",):
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{random_sf_dir}/{t}.parquet')"
        )
    mine = _canon(fn(random_sf_dir))
    oracle = _canon(con.execute(sql).fetchdf())
    assert list(mine.columns) == list(oracle.columns), name
    assert len(mine) == len(oracle), f"{name}: {len(mine)} vs {len(oracle)}"
    if len(mine):
        oracle = oracle.astype(mine.dtypes.to_dict())
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)


@pytest.mark.parametrize("name", DIFF_QUERIES)
def test_differential_random_tables(ray_session, random_sf_dir, name):
    from ocr_poc_ray.queries import REGISTRY

    fn, sql = REGISTRY[name]
    assert sql is not None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{random_sf_dir}/{t}.parquet')"
        )
    mine = _canon(fn(random_sf_dir))
    oracle = _canon(con.execute(sql).fetchdf())
    assert list(mine.columns) == list(oracle.columns), name
    assert len(mine) == len(oracle), f"{name}: {len(mine)} vs {len(oracle)}"
    if len(mine):
        oracle = oracle.astype(mine.dtypes.to_dict())
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
