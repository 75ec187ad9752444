"""Adversarial-input checks for the per-user bucketed analytics
operators (funnel / mode / rolling actives / cumulative / retention /
set-difference / correlation / props extraction): a synthetic events
table with one hot user, duplicated timestamps, bucket-aliased user
ids (u and u+32 land in the same hash bucket) and empty-type strata —
each query compared cell-by-cell against DuckDB over the same parquet
file, exactly like the driver's gate.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

QUERIES = [
    "rel_user_funnel",
    "rel_user_mode_event",
    "rel_rolling_active_users",
    "rel_cumulative_users",
    "rel_user_retention",
    "rel_viewers_never_purchased",
    "rel_corr_value_k",
    "rel_props_json",
]


@pytest.fixture(scope="module")
def adversarial_events(tmp_path_factory):
    """events.parquet with engineered edge cases."""
    rng = np.random.RandomState(7)
    rows = []
    base = pd.Timestamp("2024-03-01")
    types = ["view", "purchase", "click", "error", "signup"]
    eid = 0

    def add(user, ts, etype, value):
        nonlocal eid
        rows.append((eid, ts, user, etype, value, '{"k": %d}' % (eid % 97)))
        eid += 1

    # hot user 0: 500 events over 40 days, duplicated timestamps
    for i in range(500):
        ts = base + pd.Timedelta(days=int(rng.randint(0, 40)))
        add(0, ts, types[i % 5], float(rng.uniform(0, 500)))
    # bucket-aliased users 3 and 35 (3 % 32 == 35 % 32): same bucket,
    # distinct first days, view-only vs purchase-only
    for d in (1, 2, 9):
        add(3, base + pd.Timedelta(days=d), "view", 10.0)
    for d in (2, 5):
        add(35, base + pd.Timedelta(days=d), "purchase", 200.0)
    # user 4: single event, view then nothing (never purchased)
    add(4, base, "view", 1.0)
    # user 5: purchase BEFORE first view (funnel must not count it)
    add(5, base + pd.Timedelta(days=1), "purchase", 160.0)
    add(5, base + pd.Timedelta(days=2), "view", 1.0)
    # user 6: equal-count mode tie between two types (lexicographic win)
    for _ in range(3):
        add(6, base + pd.Timedelta(days=3), "click", 5.0)
        add(6, base + pd.Timedelta(days=3), "error", 5.0)
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path_factory.mktemp("adversarial_sf")
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES)
def test_adversarial_matches_duckdb(ray_session, adversarial_events, name):
    from ocr_poc_ray.queries import REGISTRY

    fn, sql = REGISTRY[name]
    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"read_parquet('{adversarial_events}/events.parquet')"
    )
    mine = _canon(fn(adversarial_events))
    oracle = _canon(con.execute(sql).fetchdf())
    assert list(mine.columns) == list(oracle.columns)
    assert len(mine) == len(oracle), f"{name}: {len(mine)} vs {len(oracle)}"
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False, atol=1e-9)


def test_funnel_semantics(ray_session, adversarial_events):
    """User 5 purchased before viewing → counted as viewer+purchaser
    but NOT converted; user 4 viewed only."""
    from ocr_poc_ray.queries.relational import rel_user_funnel

    out = rel_user_funnel(adversarial_events)
    row = out.iloc[0]
    assert row["n_users"] == 6
    assert row["n_converted"] < row["n_purchasers"]  # user 5 excluded


def test_user_gini_matches_numpy(ray_session, tmp_path):
    """Gini + top-share equal a direct numpy computation on a skewed
    synthetic event table."""
    import numpy as np
    import pandas as pd

    from ocr_poc_ray.queries.relational import rel_user_gini

    rng = np.random.RandomState(3)
    users = np.repeat(np.arange(40), rng.zipf(1.6, size=40) % 97 + 1)
    df = pd.DataFrame({
        "user_id": users,
        "ts": pd.to_datetime("2024-01-01"),
        "event_type": "view",
        "event_id": np.arange(len(users)),
        "value": 1.0,
        "props": "{}",
    })
    df.to_parquet(tmp_path / "events.parquet", index=False)

    out = rel_user_gini(str(tmp_path))
    counts = np.sort(np.bincount(users))
    counts = counts[counts > 0]
    n, tot = len(counts), counts.sum()
    rk = np.arange(1, n + 1)
    gini = (2.0 * (rk * counts).sum() - (n + 1) * tot) / (n * tot)
    assert out["n_users"].iloc[0] == n
    assert out["total_events"].iloc[0] == tot
    assert out["gini"].iloc[0] == round(float(gini), 6)
    assert out["top_share"].iloc[0] == round(counts.max() / tot, 6)
