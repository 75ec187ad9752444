"""Windowed / order-sensitive operators over keyed event streams.

The scalable shape for per-key sequential logic (sessionization,
as-of matching, windowed range joins) when keys are MANY: a grouped
pass per key would pay Ray's per-group overhead per key, so instead

  1. range-sort by (key, ts) — equal keys become contiguous, and a
     key spans multiple blocks only at block boundaries;
  2. one vectorized pass per sorted batch handles keys wholly inside
     the batch and ships RAW rows only for the (at most two) keys
     touching the batch's edges;
  3. the edge rows — O(num_batches) keys' worth, not O(num_keys) —
     are combined in one small final pass.

Exact for any key cardinality; the all-to-all is the one sort.  The
plumbing lives in ``keyed_sorted_match``; each operator contributes a
multi-key-safe vectorized ``match_fn``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

from ocr_poc_ray.stages.ordering import default_sort_blocks


# ---------------------------------------------------------------------------
# Generic interior-final / edge-raw plumbing
# ---------------------------------------------------------------------------


def keyed_sorted_match(
    ds: Dataset,
    *,
    key_col: str,
    sort_cols: list[str],
    in_cols: list[str],
    match_fn,
    out_meta: dict[str, str],
    sort_num_blocks: int | None = None,
) -> Dataset:
    """Apply a vectorized multi-key ``match_fn`` to every complete key.

    ``match_fn(df) -> df`` must be correct for a frame holding ANY set
    of complete keys (it may not assume one key).  Keys wholly inside a
    sorted batch are matched there; the first/last key of each batch
    ships its raw ``in_cols`` rows to one small combine.

    On batch format: ``block_pass`` runs ``batch_format="pandas"`` by
    design, not oversight — every ``match_fn`` is a pandas kernel, and
    interior+edge together cover the whole batch, so an Arrow-side
    split would convert the same bytes to pandas anyway (one conversion
    either way; measured no win, unlike conversation assembly where the
    whole partial path went Arrow — see stages/ordering.py).
    """
    raw_cols = [f"_raw_{c}" for c in in_cols]

    def _nullable(dtype) -> str:
        """Raw columns must hold NA on final rows: widen ints/bools to
        their nullable pandas dtypes (Arrow round-trips them cleanly)."""
        kind = getattr(dtype, "kind", "O")
        if kind == "i":
            return "Int64"
        if kind == "u":
            return "UInt64"
        if kind == "b":
            return "boolean"
        return str(dtype)  # float (NaN), datetime (NaT), object (None)

    def _out_filler(dt: str):
        return 0 if dt.lower().startswith(("int", "uint")) else (
            False if dt == "bool" else None
        )

    def block_pass(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch[key_col]
        if batch.empty:
            interior = edge = batch
        else:
            first_key, last_key = keys.iloc[0], keys.iloc[-1]
            interior = batch[(keys != first_key) & (keys != last_key)]
            edge = batch[(keys == first_key) | (keys == last_key)]
        out = match_fn(interior) if not interior.empty else pd.DataFrame(
            {name: pd.Series([], dtype=dt) for name, dt in out_meta.items()}
        )
        for c in in_cols:
            out[f"_raw_{c}"] = pd.Series(
                [None] * len(out), dtype=_nullable(batch[c].dtype), index=out.index
            )
        out["_is_raw"] = False
        if not edge.empty:
            raw = pd.DataFrame(
                {f"_raw_{c}": edge[c].astype(_nullable(edge[c].dtype)) for c in in_cols}
            )
            for name, dt in out_meta.items():
                raw[name] = pd.Series(
                    [_out_filler(dt)] * len(raw), dtype=dt, index=raw.index
                )
            raw["_is_raw"] = True
            out = pd.concat([out, raw], ignore_index=True)
        return out

    nb = sort_num_blocks or default_sort_blocks()
    narrow = ds.select_columns(in_cols)
    ordered = (
        narrow.repartition(nb).sort([key_col, *sort_cols])
        if nb
        else narrow.sort([key_col, *sort_cols])
    )
    # ONE pinned execution: batch slicing is not bit-stable across
    # re-executions, so the finals and edges branches must read the
    # same pass (lazy branching here once produced duplicate/missing
    # keys — caught by the DuckDB oracle).
    passed = ordered.map_batches(block_pass, batch_format="pandas").materialize()

    finals = passed.map_batches(
        lambda b: b.loc[~b["_is_raw"], list(out_meta)], batch_format="pandas"
    )

    # Distributed edge combine: the raw edge rows go through a BOUNDED
    # hash-bucket groupby (all rows of a key land in one bucket; 32
    # buckets, never one Ray group per key) and match_fn runs inside
    # each bucket task — a hot key spanning every block costs one task
    # its rows, and NOTHING is collected to the driver.
    _narrow = {"Int64": "int64", "UInt64": "uint64", "boolean": "bool"}
    _EB = 32

    def _renarrow(col: pd.Series) -> pd.Series:
        dt = str(col.dtype)
        return col.astype(_narrow[dt]) if dt in _narrow else col

    def edge_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["_is_raw"]]
        keys_arr = _renarrow(b[f"_raw_{key_col}"]).to_numpy()
        return b.assign(
            _eb=(pd.util.hash_array(keys_arr) % _EB).astype("int64")
        )

    def edge_match(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {name: pd.Series([], dtype=dt) for name, dt in out_meta.items()}
        )
        if group.empty:
            return empty
        edges = pd.DataFrame(
            {c: _renarrow(group[f"_raw_{c}"]) for c in in_cols}
        )
        edges = edges.sort_values([key_col, *sort_cols], kind="mergesort")
        merged = match_fn(edges)
        if merged is None or merged.empty:
            return empty
        return merged[list(out_meta)].reset_index(drop=True)

    merged = (
        passed.map_batches(edge_bucket, batch_format="pandas")
        .groupby("_eb")
        .map_groups(edge_match, batch_format="pandas")
    )
    return finals.union(merged)


# ---------------------------------------------------------------------------
# Sessionization (aggregate shape: per-key partials, not row matches)
# ---------------------------------------------------------------------------


def sessionize(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: float = 1800.0,
    sort_num_blocks: int | None = None,
) -> Dataset:
    """(key, n_events, n_sessions): a session break is a gap > gap_s.

    Aggregate variant of the edge pattern: per-batch partials carry
    (count, sessions, first_ts, last_ts); interior keys finalize in
    their batch, edge-key partials merge with a boundary adjustment
    (a run continuing across the boundary is not a new session).
    """
    narrow = ds.select_columns([key_col, ts_col, order_col])
    nb = sort_num_blocks or default_sort_blocks()
    ordered = (
        narrow.repartition(nb).sort([key_col, ts_col, order_col])
        if nb
        else narrow.sort([key_col, ts_col, order_col])
    )

    def block_pass(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return pd.DataFrame(
                columns=[key_col, "n_events", "n_sessions", "first_ts", "last_ts", "edge"]
            )
        gaps = batch[ts_col].diff().dt.total_seconds()
        new_key = batch[key_col] != batch[key_col].shift()
        starts = new_key | (gaps > gap_s)
        g = batch.assign(_start=starts).groupby(key_col, sort=False)
        out = pd.DataFrame(
            {
                key_col: g[key_col].first(),
                "n_events": g[ts_col].size(),
                "n_sessions": g["_start"].sum(),
                "first_ts": g[ts_col].first(),
                "last_ts": g[ts_col].last(),
            }
        ).reset_index(drop=True)
        out["edge"] = False
        out.loc[out.index[[0, -1]], "edge"] = True
        return out

    # ONE pinned execution (see keyed_sorted_match).
    partials = ordered.map_batches(block_pass, batch_format="pandas").materialize()

    finals = partials.map_batches(
        lambda b: b.loc[~b["edge"], [key_col, "n_events", "n_sessions"]],
        batch_format="pandas",
    )

    # Distributed edge merge over the O(blocks) edge partials: bounded
    # hash-bucket groupby (all partials of a key share a bucket), then a
    # vectorized in-bucket merge — no driver collect, no iterrows.
    _EB = 32

    def edge_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["edge"]]
        return b.assign(
            _eb=(pd.util.hash_array(b[key_col].to_numpy()) % _EB).astype("int64")
        )

    def merge_edges(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pd.DataFrame(
                {key_col: pd.Series([], dtype="int64"),
                 "n_events": pd.Series([], dtype="int64"),
                 "n_sessions": pd.Series([], dtype="int64")}
            )
        # Partial order: block A precedes B iff A.last_ts ≤ B.first_ts
        # (the input is ts-sorted), which implies (first_ts, last_ts)
        # lexicographic order — the last_ts tie-break makes the merge
        # deterministic when two partials of one key share first_ts (a
        # block split between equal timestamps); remaining full ties are
        # symmetric under the gap test.  A session run continuing across
        # a block boundary (gap ≤ gap_s) cancels one counted start.
        g = group.sort_values([key_col, "first_ts", "last_ts"], kind="mergesort")
        prev_last = g.groupby(key_col, sort=False)["last_ts"].shift()
        cont = (
            (g["first_ts"] - prev_last).dt.total_seconds() <= gap_s
        ).fillna(False)
        agg = (
            g.assign(_cont=cont)
            .groupby(key_col, sort=False)
            .agg(n_events=("n_events", "sum"),
                 n_sessions=("n_sessions", "sum"),
                 _c=("_cont", "sum"))
            .reset_index()
        )
        return pd.DataFrame(
            {key_col: agg[key_col],
             "n_events": agg["n_events"].astype("int64"),
             "n_sessions": (agg["n_sessions"] - agg["_c"]).astype("int64")}
        )

    merged = (
        partials.map_batches(edge_bucket, batch_format="pandas")
        .groupby("_eb")
        .map_groups(merge_edges, batch_format="pandas")
    )
    return finals.union(merged)


# ---------------------------------------------------------------------------
# Backward as-of match
# ---------------------------------------------------------------------------


def asof_match(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    left_filter_col: str = "event_type",
    left_value: str = "purchase",
    right_value: str = "click",
    sort_num_blocks: int | None = None,
) -> Dataset:
    """Per-key backward as-of: each `left_value` row matched to the most
    recent `right_value` row with right.ts ≤ left.ts (inner join).

    Output: (order_col, key_col, click_<order_col>).
    """
    click_col = "click_" + order_col

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        """merge_asof(by=key): ONE global ts sort serves every key."""
        left = group[group[left_filter_col] == left_value]
        right = group[group[left_filter_col] == right_value]
        if left.empty or right.empty:
            return pd.DataFrame({order_col: [], key_col: [], click_col: []})
        m = pd.merge_asof(
            left[[order_col, key_col, ts_col]].sort_values(
                [ts_col, order_col], kind="mergesort"
            ),
            right[[order_col, key_col, ts_col]]
            .rename(columns={order_col: click_col})
            .sort_values([ts_col, click_col], kind="mergesort"),
            on=ts_col, by=key_col, direction="backward", allow_exact_matches=True,
        ).dropna(subset=[click_col])
        return m[[order_col, key_col, click_col]]

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[left_filter_col].isin((left_value, right_value))]

    filtered = ds.select_columns(
        [key_col, ts_col, order_col, left_filter_col]
    ).map_batches(keep, batch_format="pandas")

    return keyed_sorted_match(
        filtered,
        key_col=key_col,
        sort_cols=[ts_col, order_col],
        in_cols=[key_col, ts_col, order_col, left_filter_col],
        match_fn=_match,
        out_meta={order_col: "int64", key_col: "int64", click_col: "float64"},
        sort_num_blocks=sort_num_blocks,
    )


# ---------------------------------------------------------------------------
# Bounded-preceding rolling aggregate (per-key moving average)
# ---------------------------------------------------------------------------


def rolling_mean(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    window_rows: int = 3,
    sort_num_blocks: int | None = None,
) -> Dataset:
    """Per-key moving average over the current + (window_rows−1)
    preceding rows in (ts, order) order — SQL ``avg(value) over
    (partition by key order by ts, order rows between k-1 preceding
    and current row)``.  Rides ``keyed_sorted_match``: interior keys
    compute in-block with one vectorized pandas groupby-rolling, edge
    keys' raw rows go to the small combine.

    Output: (order_col, key_col, rolling_avg) rounded to 6 dp.
    """

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, order_col], kind="mergesort")
        avg = (
            g.groupby(key_col, sort=False)[value_col]
            .rolling(window_rows, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
        )
        return pd.DataFrame(
            {
                order_col: g[order_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                "rolling_avg": avg.round(6).to_numpy(),
            }
        )

    return keyed_sorted_match(
        ds.select_columns([key_col, ts_col, order_col, value_col]),
        key_col=key_col,
        sort_cols=[ts_col, order_col],
        in_cols=[key_col, ts_col, order_col, value_col],
        match_fn=_match,
        out_meta={order_col: "int64", key_col: "int64", "rolling_avg": "float64"},
        sort_num_blocks=sort_num_blocks,
    )


# ---------------------------------------------------------------------------
# Windowed range join (self-join: right rows within [left.ts, left.ts+w))
# ---------------------------------------------------------------------------


def range_join_window(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    filter_col: str = "event_type",
    left_value: str = "click",
    right_value: str = "error",
    window_s: float = 600.0,
    sort_num_blocks: int | None = None,
) -> Dataset:
    """All (left, right) pairs with the same key and
    ``left.ts ≤ right.ts < left.ts + window_s`` — the interval/range
    join Ray Data lacks natively, in the same edge-pattern shape.

    Output: (order_col, key_col, matched_<order_col>).
    """
    matched_col = "matched_" + order_col

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group[filter_col] == left_value]
        right = group[group[filter_col] == right_value]
        if left.empty or right.empty:
            return pd.DataFrame({order_col: [], key_col: [], matched_col: []})
        m = left[[order_col, key_col, ts_col]].merge(
            right[[order_col, key_col, ts_col]].rename(
                columns={order_col: matched_col, ts_col: ts_col + "_r"}
            ),
            on=key_col,
        )
        dt = (m[ts_col + "_r"] - m[ts_col]).dt.total_seconds()
        m = m[(dt >= 0) & (dt < window_s)]
        return m[[order_col, key_col, matched_col]]

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[filter_col].isin((left_value, right_value))]

    filtered = ds.select_columns(
        [key_col, ts_col, order_col, filter_col]
    ).map_batches(keep, batch_format="pandas")

    return keyed_sorted_match(
        filtered,
        key_col=key_col,
        sort_cols=[ts_col, order_col],
        in_cols=[key_col, ts_col, order_col, filter_col],
        match_fn=_match,
        out_meta={order_col: "int64", key_col: "int64", matched_col: "int64"},
        sort_num_blocks=sort_num_blocks,
    )


# ---------------------------------------------------------------------------
# Per-key cumulative scan (running total) — the keyed counterpart of
# functions/prefix.py's global prefix sum, expressed in the edge
# pattern: a cumsum only depends on rows of its own key, so interior
# keys finalize in-block and edge keys' raw rows merge once.
# ---------------------------------------------------------------------------


def keyed_running_sum(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
    sort_num_blocks: int | None = None,
) -> Dataset:
    """SQL ``sum(value) over (partition by key order by ts, order rows
    unbounded preceding)``.  Output: (order_col, key_col, running_value)
    rounded to 6 dp; the float64 accumulation order matches the SQL
    engine's sequential per-key sum, so 6-dp rounding is hash-stable."""

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, order_col], kind="mergesort")
        run = g.groupby(key_col, sort=False)[value_col].cumsum()
        return pd.DataFrame(
            {
                order_col: g[order_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                "running_value": run.round(6).to_numpy(),
            }
        )

    return keyed_sorted_match(
        ds.select_columns([key_col, ts_col, order_col, value_col]),
        key_col=key_col,
        sort_cols=[ts_col, order_col],
        in_cols=[key_col, ts_col, order_col, value_col],
        match_fn=_match,
        out_meta={order_col: "int64", key_col: "int64", "running_value": "float64"},
        sort_num_blocks=sort_num_blocks,
    )


# ---------------------------------------------------------------------------
# Per-key lag delta (time since previous event) — SQL lag() in the
# same edge pattern.
# ---------------------------------------------------------------------------

LAG_FIRST_SENTINEL = -1  # first event of a key has no predecessor; an
# integer sentinel (not NaN/null) keeps the output hash-stable


def keyed_lag_delta(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    sort_num_blocks: int | None = None,
    key_dtype: str = "int64",
) -> Dataset:
    """Microseconds between each event and its key's previous event in
    (ts, order) order — SQL ``date_diff('microsecond', lag(ts) over
    (partition by key order by ts, order), ts)``.  Output: (order_col,
    key_col, delta_us int64), first-in-key = LAG_FIRST_SENTINEL.
    Integer microseconds, never float seconds: float rounding and SQL
    millisecond truncation disagree at boundaries.  ``key_dtype`` is
    the key column's pandas dtype (``object`` for string keys)."""

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, order_col], kind="mergesort")
        us = g[ts_col].astype("datetime64[us]").astype("int64")
        prev = us.groupby(g[key_col], sort=False).shift()
        delta = (us - prev).fillna(LAG_FIRST_SENTINEL).astype("int64")
        return pd.DataFrame(
            {
                order_col: g[order_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                "delta_us": delta.to_numpy(),
            }
        )

    return keyed_sorted_match(
        ds.select_columns([key_col, ts_col, order_col]),
        key_col=key_col,
        sort_cols=[ts_col, order_col],
        in_cols=[key_col, ts_col, order_col],
        match_fn=_match,
        out_meta={order_col: "int64", key_col: key_dtype, "delta_us": "int64"},
        sort_num_blocks=sort_num_blocks,
    )


# ---------------------------------------------------------------------------
# Per-key run-length analysis (gaps-and-islands) — streak detection in
# the same one-sort edge pattern.
# ---------------------------------------------------------------------------


def keyed_streaks(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    label_col: str = "event_type",
    sort_num_blocks: int | None = None,
    key_dtype: str = "int64",
) -> Dataset:
    """SQL gaps-and-islands per key: runs of consecutive equal
    ``label_col`` values in (ts, order) order.  Output one row per key:
    (key_col, n_runs, max_run, top_type) where top_type is the
    lexicographically smallest label among the longest runs (the
    deterministic tie-break both engines share).  Everything is one
    range-sort + vectorized per-block run detection; only the first /
    last key of each block ships raw rows to the edge combine — key
    cardinality never appears as a group count."""

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, order_col], kind="mergesort")
        brk = g[label_col].ne(g[label_col].shift()) | g[key_col].ne(
            g[key_col].shift()
        )
        runs = (
            pd.DataFrame(
                {
                    "key": g[key_col].to_numpy(),
                    "label": g[label_col].to_numpy(),
                    "grp": brk.cumsum().to_numpy(),
                }
            )
            .groupby(["key", "grp"], sort=False)
            .agg(label=("label", "first"), run_len=("label", "size"))
            .reset_index()
        )
        per_key = runs.groupby("key", sort=False).agg(
            n_runs=("run_len", "size"), max_run=("run_len", "max")
        )
        top = (
            runs.merge(
                per_key["max_run"], left_on="key", right_index=True
            )
            .query("run_len == max_run")
            .groupby("key", sort=False)["label"]
            .min()
        )
        out = per_key.join(top.rename("top_type")).reset_index()
        return pd.DataFrame(
            {
                key_col: out["key"].to_numpy(),
                "n_runs": out["n_runs"].to_numpy(np.int64),
                "max_run": out["max_run"].to_numpy(np.int64),
                "top_type": out["top_type"].to_numpy(dtype=object),
            }
        )

    return keyed_sorted_match(
        ds.select_columns([key_col, ts_col, order_col, label_col]),
        key_col=key_col,
        sort_cols=[ts_col, order_col],
        in_cols=[key_col, ts_col, order_col, label_col],
        match_fn=_match,
        out_meta={
            key_col: key_dtype,  # "object" for string keys (cf. keyed_lag_delta)
            "n_runs": "int64",
            "max_run": "int64",
            "top_type": "object",
        },
        sort_num_blocks=sort_num_blocks,
    )


def session_spans(
    ds: Dataset,
    *,
    gap_s: float = 1800.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    sort_num_blocks: int | None = None,
) -> Dataset:
    """One row PER SESSION (not per key): (key, session_idx, start_us,
    end_us, n_events) where a session breaks when the inter-event gap
    exceeds ``gap_s`` — the span-emitting sibling of ``sessionize``'s
    per-key rollup, in the same one-sort edge pattern.  session_idx is
    0-based in (ts, order) order; timestamps are integer microseconds
    (hash-stable, no float seconds)."""
    gap_us = int(gap_s * 1_000_000)

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_col, ts_col, order_col], kind="mergesort")
        us = g[ts_col].astype("datetime64[us]").astype("int64")
        prev = us.groupby(g[key_col], sort=False).shift()
        brk = prev.isna() | ((us - prev) > gap_us)
        sess = brk.cumsum()  # globally increasing; unique per (key, session)
        spans = (
            pd.DataFrame(
                {"key": g[key_col].to_numpy(), "sess": sess.to_numpy(),
                 "us": us.to_numpy()}
            )
            .groupby(["key", "sess"], sort=False)
            .agg(start_us=("us", "min"), end_us=("us", "max"),
                 n_events=("us", "size"))
            .reset_index()
        )
        spans["session_idx"] = spans.groupby("key", sort=False).cumcount()
        return pd.DataFrame(
            {
                key_col: spans["key"].to_numpy(),
                "session_idx": spans["session_idx"].to_numpy(np.int64),
                "start_us": spans["start_us"].to_numpy(np.int64),
                "end_us": spans["end_us"].to_numpy(np.int64),
                "n_events": spans["n_events"].to_numpy(np.int64),
            }
        )

    return keyed_sorted_match(
        ds.select_columns([key_col, ts_col, order_col]),
        key_col=key_col,
        sort_cols=[ts_col, order_col],
        in_cols=[key_col, ts_col, order_col],
        match_fn=_match,
        out_meta={
            key_col: "int64",
            "session_idx": "int64",
            "start_us": "int64",
            "end_us": "int64",
            "n_events": "int64",
        },
        sort_num_blocks=sort_num_blocks,
    )


def attribution_first_touch(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    filter_col: str = "event_type",
    touch_value: str = "click",
    conversion_value: str = "purchase",
    window_s: float = 21600.0,
    sort_num_blocks: int | None = None,
) -> Dataset:
    """Marketing-style FIRST-TOUCH attribution: each conversion is
    credited to the EARLIEST touch event of the same key within the
    preceding ``window_s`` — the windowed-argmin sibling of the as-of
    join's last-prior match.  Same one-sort edge pattern; integer-µs
    gap (float seconds and SQL µs disagree at boundaries).

    Output: (order_col, key_col, first_touch_<order_col>, gap_us)."""
    touch_col = "first_touch_" + order_col
    win_us = int(window_s * 1_000_000)

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        conv = group[group[filter_col] == conversion_value]
        touch = group[group[filter_col] == touch_value]
        if conv.empty or touch.empty:
            return pd.DataFrame(
                {order_col: pd.Series([], dtype="int64"),
                 key_col: pd.Series([], dtype="int64"),
                 touch_col: pd.Series([], dtype="int64"),
                 "gap_us": pd.Series([], dtype="int64")}
            )
        c = conv[[order_col, key_col, ts_col]].copy()
        t = touch[[order_col, key_col, ts_col]].rename(
            columns={order_col: touch_col, ts_col: "_tts"}
        )
        m = c.merge(t, on=key_col)
        gap = (
            m[ts_col].astype("datetime64[us]").astype("int64")
            - m["_tts"].astype("datetime64[us]").astype("int64")
        )
        m = m.assign(gap_us=gap)
        m = m[(m["gap_us"] >= 0) & (m["gap_us"] <= win_us)]
        if m.empty:
            return pd.DataFrame(
                {order_col: pd.Series([], dtype="int64"),
                 key_col: pd.Series([], dtype="int64"),
                 touch_col: pd.Series([], dtype="int64"),
                 "gap_us": pd.Series([], dtype="int64")}
            )
        m = m.sort_values(["_tts", touch_col], kind="mergesort")
        w = m.groupby(order_col, sort=False).head(1)
        return pd.DataFrame(
            {
                order_col: w[order_col].to_numpy(np.int64),
                key_col: w[key_col].to_numpy(np.int64),
                touch_col: w[touch_col].to_numpy(np.int64),
                "gap_us": w["gap_us"].to_numpy(np.int64),
            }
        )

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[filter_col].isin((touch_value, conversion_value))]

    filtered = ds.select_columns(
        [key_col, ts_col, order_col, filter_col]
    ).map_batches(keep, batch_format="pandas")

    return keyed_sorted_match(
        filtered,
        key_col=key_col,
        sort_cols=[ts_col, order_col],
        in_cols=[key_col, ts_col, order_col, filter_col],
        match_fn=_match,
        out_meta={order_col: "int64", key_col: "int64",
                  touch_col: "int64", "gap_us": "int64"},
        sort_num_blocks=sort_num_blocks,
    )


def attribution_linear(
    ds: Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    filter_col: str = "event_type",
    value_col: str = "value",
    touch_value: str = "click",
    conversion_value: str = "purchase",
    window_s: float = 21600.0,
    sort_num_blocks: int | None = None,
) -> Dataset:
    """LINEAR multi-touch attribution: every conversion's value splits
    EQUALLY across all touch events of the same key inside the
    preceding window; a touch accumulates credit from every conversion
    it assisted.  Same one-sort edge pattern as the first-touch
    variant.  Credit is exact integer MICRO-CENTS with floor division
    (cents × 1e6 // n_touches) — both engines floor identically on
    positive operands, so no float division or summation order can
    diverge.  Output: (touch_<order_col>, key_col, credit_ucents,
    n_conversions)."""
    touch_col = "touch_" + order_col
    win_us = int(window_s * 1_000_000)

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {touch_col: pd.Series([], dtype="int64"),
             key_col: pd.Series([], dtype="int64"),
             "credit_ucents": pd.Series([], dtype="int64"),
             "n_conversions": pd.Series([], dtype="int64")}
        )

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        conv = group[group[filter_col] == conversion_value]
        touch = group[group[filter_col] == touch_value]
        if conv.empty or touch.empty:
            return _empty()
        c = conv[[order_col, key_col, ts_col, value_col]].copy()
        c["_cents"] = np.rint(c[value_col].to_numpy() * 100).astype(np.int64)
        t = touch[[order_col, key_col, ts_col]].rename(
            columns={order_col: touch_col, ts_col: "_tts"}
        )
        m = c.merge(t, on=key_col)
        gap = (
            m[ts_col].astype("datetime64[us]").astype("int64")
            - m["_tts"].astype("datetime64[us]").astype("int64")
        )
        m = m[(gap >= 0) & (gap <= win_us)]
        if m.empty:
            return _empty()
        n = m.groupby(order_col, sort=False)[touch_col].transform("size")
        m = m.assign(
            _ucents=(m["_cents"].to_numpy() * 1_000_000) // n.to_numpy()
        )
        w = m.groupby([touch_col, key_col], as_index=False).agg(
            credit_ucents=("_ucents", "sum"), n_conversions=("_ucents", "size")
        )
        return w.astype(
            {touch_col: "int64", key_col: "int64",
             "credit_ucents": "int64", "n_conversions": "int64"}
        )

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[filter_col].isin((touch_value, conversion_value))]

    filtered = ds.select_columns(
        [key_col, ts_col, order_col, filter_col, value_col]
    ).map_batches(keep, batch_format="pandas")

    return keyed_sorted_match(
        filtered,
        key_col=key_col,
        sort_cols=[ts_col, order_col],
        in_cols=[key_col, ts_col, order_col, filter_col, value_col],
        match_fn=_match,
        out_meta={touch_col: "int64", key_col: "int64",
                  "credit_ucents": "int64", "n_conversions": "int64"},
        sort_num_blocks=sort_num_blocks,
    )
