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
