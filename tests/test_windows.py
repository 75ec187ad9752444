"""Deterministic edge-boundary tests for the sort-based windowed
operators: tiny corpora forced through MANY small blocks so keys are
guaranteed to split across batches, compared against a pure-pandas
oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _events(n_users: int = 6, per_user: int = 40, seed: int = 3) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    eid = 0
    for u in range(n_users):
        t = pd.Timestamp("2024-01-01")
        for _ in range(per_user):
            t = t + pd.Timedelta(seconds=int(rng.randint(60, 4000)))
            rows.append(
                {
                    "user_id": u,
                    "ts": t,
                    "event_id": eid,
                    "event_type": rng.choice(["purchase", "click", "view", "error"]),
                }
            )
            eid += 1
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=seed).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def events_df():
    return _events()


def _oracle_sessions(df: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    out = []
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        gaps = g["ts"].diff().dt.total_seconds()
        out.append(
            {
                "user_id": u,
                "n_events": len(g),
                "n_sessions": int((gaps.isna() | (gaps > gap_s)).sum()),
            }
        )
    return pd.DataFrame(out)


def _oracle_asof(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for u, g in df.groupby("user_id"):
        p = g[g.event_type == "purchase"].sort_values(["ts", "event_id"])
        c = g[g.event_type == "click"].sort_values(["ts", "event_id"])
        for _, row in p.iterrows():
            prior = c[c.ts <= row.ts]
            if len(prior):
                out.append(
                    {
                        "event_id": row.event_id,
                        "user_id": u,
                        "click_event_id": prior.iloc[-1].event_id,
                    }
                )
    return pd.DataFrame(out)


@pytest.mark.parametrize("nblocks", [2, 7, 16])
def test_sessionize_split_boundaries(ray_session, events_df, nblocks):
    import ray.data as rd

    from ocr_poc_ray.functions.windows import sessionize

    ds = rd.from_pandas(events_df)
    got = (
        sessionize(ds, gap_s=1800.0, sort_num_blocks=nblocks)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
        .astype({"n_events": "int64", "n_sessions": "int64"})
    )
    exp = _oracle_sessions(events_df, 1800.0)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("nblocks", [2, 7, 16])
def test_asof_split_boundaries(ray_session, events_df, nblocks):
    import ray.data as rd

    from ocr_poc_ray.functions.windows import asof_match

    ds = rd.from_pandas(events_df)
    got = (
        asof_match(ds, sort_num_blocks=nblocks)
        .to_pandas()
        .astype({"event_id": "int64", "user_id": "int64", "click_event_id": "int64"})
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = _oracle_asof(events_df).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _oracle_range(df: pd.DataFrame, window_s: float) -> pd.DataFrame:
    out = []
    for u, g in df.groupby("user_id"):
        left = g[g.event_type == "click"]
        right = g[g.event_type == "error"]
        for _, row in left.iterrows():
            hits = right[(right.ts >= row.ts) & (right.ts < row.ts + pd.Timedelta(seconds=window_s))]
            for _, h in hits.iterrows():
                out.append({"event_id": row.event_id, "user_id": u, "matched_event_id": h.event_id})
    return pd.DataFrame(out, columns=["event_id", "user_id", "matched_event_id"])


@pytest.mark.parametrize("nblocks", [2, 7, 16])
def test_range_join_split_boundaries(ray_session, events_df, nblocks):
    import ray.data as rd

    from ocr_poc_ray.functions.windows import range_join_window

    ds = rd.from_pandas(events_df)
    got = (
        range_join_window(ds, window_s=3600.0, sort_num_blocks=nblocks)
        .to_pandas()
        .astype({"event_id": "int64", "user_id": "int64", "matched_event_id": "int64"})
        .sort_values(["event_id", "matched_event_id"])
        .reset_index(drop=True)
    )
    exp = (
        _oracle_range(events_df, 3600.0)
        .sort_values(["event_id", "matched_event_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("nblocks", [2, 7, 16])
def test_rolling_mean_split_boundaries(ray_session, events_df, nblocks):
    import ray.data as rd

    from ocr_poc_ray.functions.windows import rolling_mean

    df = events_df.assign(value=np.arange(len(events_df), dtype="float64"))
    ds = rd.from_pandas(df)
    got = (
        rolling_mean(ds, window_rows=3, sort_num_blocks=nblocks)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp_rows = []
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        avg = g["value"].rolling(3, min_periods=1).mean().round(6)
        for eid, a in zip(g["event_id"], avg):
            exp_rows.append({"event_id": eid, "user_id": u, "rolling_avg": a})
    exp = pd.DataFrame(exp_rows).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rolling_and_asof_with_timestamp_ties(ray_session):
    """Equal timestamps within a key: the order tiebreak (event_id)
    must agree with the SQL rows-frame ordering."""
    import ray.data as rd

    from ocr_poc_ray.functions.windows import asof_match, rolling_mean

    t = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1] * 6,
            "ts": [t, t, t + pd.Timedelta(seconds=10), t + pd.Timedelta(seconds=10),
                   t + pd.Timedelta(seconds=20), t + pd.Timedelta(seconds=20)],
            "event_id": [3, 1, 2, 5, 4, 6],
            "event_type": ["click", "click", "purchase", "purchase", "purchase", "click"],
            "value": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
        }
    )
    got = (
        rolling_mean(rd.from_pandas(df), window_rows=2, sort_num_blocks=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # order by (ts, event_id): e1(20), e3(10), e2(30), e5(40), e4(50), e6(60)
    exp = {1: 20.0, 3: 15.0, 2: 20.0, 5: 35.0, 4: 45.0, 6: 55.0}
    for _, row in got.iterrows():
        assert row["rolling_avg"] == exp[row["event_id"]], row.to_dict()

    asof = asof_match(rd.from_pandas(df), sort_num_blocks=2).to_pandas()
    m = dict(zip(asof["event_id"], asof["click_event_id"]))
    # ASOF semantics: greatest click ts <= purchase ts, exact ties
    # included — purchase 4 (ts+20) matches click 6 (also ts+20),
    # matching DuckDB's ASOF JOIN (the oracle for this operator)
    assert m[2] == 3 and m[5] == 3 and m[4] == 6


@pytest.mark.parametrize("nblocks", [2, 5, 13])
def test_sessionize_duplicate_timestamps(ray_session, nblocks):
    """Block splits landing BETWEEN equal timestamps must not mis-merge
    sessions: partials of one key sharing first_ts are ordered by the
    (first_ts, last_ts) tie-break in the edge merge."""
    import ray.data as rd

    from ocr_poc_ray.functions.windows import sessionize

    rng = np.random.RandomState(11)
    rows, eid = [], 0
    for u in range(4):
        t = pd.Timestamp("2024-01-01")
        for _ in range(30):
            # heavy duplication: 60% of steps repeat the same timestamp
            step = rng.choice([0, 0, 0, 120, 2500])
            t = t + pd.Timedelta(seconds=int(step))
            rows.append({"user_id": u, "ts": t, "event_id": eid})
            eid += 1
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=1).reset_index(drop=True)

    got = (
        sessionize(rd.from_pandas(df), gap_s=1800.0, sort_num_blocks=nblocks)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
        .astype({"n_events": "int64", "n_sessions": "int64"})
    )
    exp = _oracle_sessions(df, 1800.0)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("nblocks", [2, 7, 16])
def test_running_sum_split_boundaries(ray_session, events_df, nblocks):
    """Per-key cumulative sum equals the pandas oracle at every forced
    block split (keys straddling blocks exercise the edge merge)."""
    from ocr_poc_ray.functions.windows import keyed_running_sum

    import ray.data as rd

    df = events_df.assign(value=(events_df["event_id"] % 17).astype(float) + 0.25)
    ds = rd.from_pandas(df)
    out = (
        keyed_running_sum(ds, sort_num_blocks=nblocks)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    g = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    expect = (
        pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "running_value": g.groupby("user_id", sort=False)["value"]
                .cumsum()
                .round(6)
                .to_numpy(),
            }
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_series_equal(
        out["running_value"], expect["running_value"], atol=1e-9
    )


@pytest.mark.parametrize("nblocks", [2, 7, 16])
def test_lag_delta_split_boundaries(ray_session, events_df, nblocks):
    from ocr_poc_ray.functions.windows import keyed_lag_delta

    import ray.data as rd

    ds = rd.from_pandas(events_df)
    out = (
        keyed_lag_delta(ds, sort_num_blocks=nblocks)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    g = events_df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    us = g["ts"].astype("datetime64[us]").astype("int64")
    expect = (
        pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "delta_us": (us - us.groupby(g["user_id"], sort=False).shift())
                .fillna(-1)
                .astype("int64")
                .to_numpy(),
            }
        )
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["delta_us"].tolist() == expect["delta_us"].tolist()


def _oracle_streaks(df: pd.DataFrame) -> pd.DataFrame:
    out = []
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        labels = g["event_type"].tolist()
        runs = []
        for lab in labels:
            if runs and runs[-1][0] == lab:
                runs[-1][1] += 1
            else:
                runs.append([lab, 1])
        max_run = max(r[1] for r in runs)
        out.append(
            {
                "user_id": u,
                "n_runs": len(runs),
                "max_run": max_run,
                "top_type": min(r[0] for r in runs if r[1] == max_run),
            }
        )
    return pd.DataFrame(out)


@pytest.mark.parametrize("nblocks", [2, 7, 16])
def test_streaks_split_boundaries(ray_session, events_df, nblocks):
    """Runs that straddle block boundaries must merge in the edge
    combine, not double-count as separate runs."""
    import ray.data as rd

    from ocr_poc_ray.functions.windows import keyed_streaks

    ds = rd.from_pandas(events_df)
    got = (
        keyed_streaks(ds, sort_num_blocks=nblocks)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
        .astype({"user_id": "int64", "n_runs": "int64", "max_run": "int64"})
    )
    exp = _oracle_streaks(events_df)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_streaks_single_long_run(ray_session):
    """One key whose entire history is a single run spanning every
    block: n_runs must be 1, max_run the full count."""
    import ray.data as rd

    from ocr_poc_ray.functions.windows import keyed_streaks

    df = pd.DataFrame(
        {
            "user_id": [1] * 30,
            "ts": pd.date_range("2024-01-01", periods=30, freq="1min"),
            "event_id": range(30),
            "event_type": ["view"] * 30,
        }
    )
    got = keyed_streaks(rd.from_pandas(df), sort_num_blocks=5).to_pandas()
    assert got.to_dict("records") == [
        {"user_id": 1, "n_runs": 1, "max_run": 30, "top_type": "view"}
    ]


def _oracle_spans(df: pd.DataFrame, gap_s: float) -> pd.DataFrame:
    rows = []
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        start = 0
        idx = 0
        for i in range(1, len(us) + 1):
            if i == len(us) or us[i] - us[i - 1] > gap_s * 1e6:
                rows.append(
                    {"user_id": u, "session_idx": idx,
                     "start_us": int(us[start]), "end_us": int(us[i - 1]),
                     "n_events": i - start}
                )
                start, idx = i, idx + 1
    return pd.DataFrame(rows)


@pytest.mark.parametrize("nblocks", [2, 7, 16])
def test_session_spans_split_boundaries(ray_session, events_df, nblocks):
    """A session straddling a block boundary must merge into ONE span
    with a correct 0-based session_idx."""
    import ray.data as rd

    from ocr_poc_ray.functions.windows import session_spans

    got = (
        session_spans(rd.from_pandas(events_df), gap_s=1800.0,
                      sort_num_blocks=nblocks)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
        .astype({"user_id": "int64", "session_idx": "int64",
                 "start_us": "int64", "end_us": "int64", "n_events": "int64"})
    )
    exp = _oracle_spans(events_df, 1800.0)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hot_key_spanning_every_block(ray_session):
    """One Zipf-hot key whose rows span EVERY sorted block: the edge
    combine must stay exact (it now runs as a distributed bucketed
    groupby — a hot key costs one task, not a driver collect)."""
    import ray.data as rd

    from ocr_poc_ray.functions.windows import keyed_running_sum

    n = 120_000
    rng = np.random.RandomState(11)
    # user 0 owns ~95% of rows → guaranteed to touch all 16 blocks
    users = np.where(rng.rand(n) < 0.95, 0, rng.randint(1, 8, size=n))
    df = pd.DataFrame(
        {
            "user_id": users.astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
            "event_id": np.arange(n, dtype=np.int64),
            "value": rng.rand(n).round(3),
        }
    )
    got = (
        keyed_running_sum(rd.from_pandas(df), sort_num_blocks=16)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["user_id", "ts", "event_id"]).copy()
    exp["running_value"] = exp.groupby("user_id")["value"].cumsum().round(6)
    exp = exp.sort_values("event_id")[
        ["event_id", "user_id", "running_value"]
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "running_value"]], exp, check_dtype=False
    )


def _oracle_linear_attribution(df: pd.DataFrame, window_s: float) -> pd.DataFrame:
    win_us = int(window_s * 1_000_000)
    out = {}
    for u, g in df.groupby("user_id"):
        conv = g[g["event_type"] == "purchase"]
        touch = g[g["event_type"] == "click"]
        for row in conv.itertuples():
            cts = row.ts.value // 1000
            cents = int(round(row.value * 100))
            hits = [
                t for t in touch.itertuples()
                if 0 <= cts - t.ts.value // 1000 <= win_us
            ]
            for t in hits:
                key = (t.event_id, u)
                cr, n = out.get(key, (0, 0))
                out[key] = (cr + cents * 1_000_000 // len(hits), n + 1)
    rows = [
        {"touch_event_id": k[0], "user_id": k[1],
         "credit_ucents": v[0], "n_conversions": v[1]}
        for k, v in out.items()
    ]
    return (
        pd.DataFrame(rows)
        .sort_values("touch_event_id")
        .reset_index(drop=True)
        .astype("int64")
    )


@pytest.mark.parametrize("nblocks", [2, 7, 16])
def test_linear_attribution_split_boundaries(ray_session, nblocks):
    """Linear multi-touch credit survives keys straddling sort blocks;
    integer micro-cent credit matches a pure-python fold exactly."""
    import ray.data as rd

    from ocr_poc_ray.functions.windows import attribution_linear

    df = _events(seed=5)
    rng = np.random.RandomState(5)
    df["value"] = np.round(rng.uniform(1, 100, len(df)), 2)
    got = (
        attribution_linear(rd.from_pandas(df), window_s=7200.0,
                           sort_num_blocks=nblocks)
        .to_pandas()
        .sort_values("touch_event_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    exp = _oracle_linear_attribution(df, 7200.0)
    pd.testing.assert_frame_equal(got, exp)
    assert (exp["n_conversions"] >= 1).all() and len(exp) > 5
