"""Windowed / order-sensitive aggregates over keyed event streams.

The scalable shape for per-key sequential logic (sessionization,
as-of matching, gap detection) when keys are MANY: a grouped pass per
key would pay Ray's per-group overhead per user, so instead

  1. range-sort by (key, ts) — equal keys become contiguous, and a
     key spans multiple blocks only at block boundaries;
  2. one vectorized pass per sorted block emits FINAL rows for keys
     wholly inside the block and tiny PARTIAL rows for the (at most
     two) keys touching the block's edges;
  3. the edge partials — O(num_blocks), not O(num_keys) — are merged
     in one small combine.

Exact for any key cardinality; the all-to-all is the one sort.
"""

from __future__ import annotations

import pandas as pd

from ray.data import Dataset

from ocr_poc_ray.stages.ordering import default_sort_blocks


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

    Returns one row per key with the event count and session count,
    matching ``lag(ts) over (partition by key order by ts, order)``
    semantics.
    """
    narrow = ds.select_columns([key_col, ts_col, order_col])
    nb = sort_num_blocks or default_sort_blocks()
    ordered = narrow.repartition(nb).sort([key_col, ts_col, order_col]) if nb else narrow.sort(
        [key_col, ts_col, order_col]
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
        # first/last key of the block may continue in neighbor blocks
        out["edge"] = False
        out.loc[out.index[[0, -1]], "edge"] = True
        return out

    # ONE execution, pinned: branching a lazy dataset would re-execute
    # the sort per branch, and batch slicing is not bit-stable across
    # executions — the finals and edges branches would disagree about
    # which keys sat on batch edges.  The partials are one row per key
    # per touching batch (tiny next to the events), so pinning is cheap.
    partials = ordered.map_batches(block_pass, batch_format="pandas").materialize()

    # Interior keys are final; edge keys (O(blocks)) merge in one pass.
    finals = partials.map_batches(
        lambda b: b.loc[~b["edge"], [key_col, "n_events", "n_sessions"]],
        batch_format="pandas",
    )
    edges = partials.map_batches(
        lambda b: b[b["edge"]], batch_format="pandas"
    ).to_pandas()

    merged_rows = []
    for key, grp in edges.sort_values([key_col, "first_ts"]).groupby(key_col, sort=False):
        n_events = int(grp["n_events"].sum())
        n_sessions = int(grp["n_sessions"].sum())
        last = None
        for _, row in grp.iterrows():
            if last is not None and (row["first_ts"] - last).total_seconds() <= gap_s:
                n_sessions -= 1  # run continues across the block boundary
            last = row["last_ts"]
        merged_rows.append({key_col: key, "n_events": n_events, "n_sessions": n_sessions})

    if not merged_rows:
        return finals
    import ray.data as rd

    merged = rd.from_pandas(
        pd.DataFrame(merged_rows, columns=[key_col, "n_events", "n_sessions"])
    )
    return finals.union(merged)


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
    recent `right_value` row with right.ts ≤ left.ts (inner: unmatched
    left rows drop).  Same scalable shape as ``sessionize``: keys wholly
    inside a sorted batch match locally; only the O(num_batches) edge
    keys' raw rows travel to one small combine.

    Output: (event_id, key, click_event_id) with ``event_id`` the left
    row's order column.
    """
    narrow = ds.select_columns([key_col, ts_col, order_col, left_filter_col])

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[left_filter_col].isin((left_value, right_value))]

    filtered = narrow.map_batches(keep, batch_format="pandas")
    nb = sort_num_blocks or default_sort_blocks()
    ordered = (
        filtered.repartition(nb).sort([key_col, ts_col, order_col])
        if nb
        else filtered.sort([key_col, ts_col, order_col])
    )

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        """Vectorized per-key backward as-of over any number of keys:
        merge_asof(by=key) needs ONE global ts sort, not a pass per key."""
        left = group[group[left_filter_col] == left_value]
        right = group[group[left_filter_col] == right_value]
        if left.empty or right.empty:
            return pd.DataFrame(
                {order_col: [], key_col: [], "click_" + order_col: []}
            )
        m = pd.merge_asof(
            left[[order_col, key_col, ts_col]].sort_values([ts_col, order_col], kind="mergesort"),
            right[[order_col, key_col, ts_col]]
            .rename(columns={order_col: "click_" + order_col})
            .sort_values([ts_col, "click_" + order_col], kind="mergesort"),
            on=ts_col, by=key_col, direction="backward", allow_exact_matches=True,
        ).dropna(subset=["click_" + order_col])
        return m[[order_col, key_col, "click_" + order_col]]

    click_col = "click_" + order_col
    _empty = pd.DataFrame(
        {
            order_col: pd.Series([], dtype="int64"),
            key_col: pd.Series([], dtype="int64"),
            click_col: pd.Series([], dtype="float64"),
            "_raw_ts": pd.Series([], dtype="datetime64[us]"),
            "_raw_kind": pd.Series([], dtype="object"),
        }
    )

    def block_pass(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return _empty.copy()
        keys = batch[key_col]
        first_key, last_key = keys.iloc[0], keys.iloc[-1]
        interior = batch[(keys != first_key) & (keys != last_key)]
        edge = batch[(keys == first_key) | (keys == last_key)]
        out = _match(interior)
        out["_raw_ts"] = pd.NaT
        out["_raw_kind"] = None
        if not edge.empty:
            # ship the edge keys' RAW rows (bounded by O(batches) keys)
            raw = pd.DataFrame(
                {
                    order_col: edge[order_col],
                    key_col: edge[key_col],
                    click_col: float("nan"),
                    "_raw_ts": edge[ts_col],
                    "_raw_kind": edge[left_filter_col],
                }
            )
            out = pd.concat([out, raw], ignore_index=True)
        return out if not out.empty else _empty.copy()

    # ONE pinned execution (see sessionize: batch slicing is not stable
    # across re-executions, so both branches must read the same pass).
    passed = ordered.map_batches(block_pass, batch_format="pandas").materialize()

    finals = passed.map_batches(
        lambda b: b.loc[b["_raw_kind"].isna(), [order_col, key_col, click_col]],
        batch_format="pandas",
    )
    edges_raw = passed.map_batches(
        lambda b: b[b["_raw_kind"].notna()], batch_format="pandas"
    ).to_pandas()

    import ray.data as rd

    if edges_raw.empty:
        return finals
    edges = pd.DataFrame(
        {
            key_col: edges_raw[key_col],
            order_col: edges_raw[order_col],
            ts_col: edges_raw["_raw_ts"],
            left_filter_col: edges_raw["_raw_kind"],
        }
    ).sort_values([key_col, ts_col, order_col], kind="mergesort")
    parts = [
        _match(grp) for _key, grp in edges.groupby(key_col, sort=False)
    ]
    merged = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
    if merged.empty:
        return finals
    return finals.union(rd.from_pandas(merged))
