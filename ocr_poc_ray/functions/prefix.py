"""Global ordered prefix sums / row numbers — the distributed scan.

Sequence packing (greedy token-budget bins), global row numbering for a
deterministic training shuffle, and cumulative corpus statistics all
need ``sum(v) over (order by k rows unbounded preceding)`` — a global
SCAN, which Ray Data has no native operator for.  The classic two-pass
shape (one range-sort, then local scans stitched with per-partition
offsets) parallelizes it exactly:

  1. range-sort by ``sort_cols`` (the one all-to-all);
  2. pinned pass: each sorted batch computes its LOCAL inclusive
     cumsum and tags every row with the batch's first ``unique_col``
     value (a value-level tag — later re-slicing cannot corrupt it);
  3. the per-batch totals — O(num_batches) rows, not O(rows) — come
     back to the driver, which orders them by the batches' first sort
     keys and takes an exclusive cumsum: each batch's global offset;
  4. one streaming pass adds ``offset[tag]`` to the local cumsums via
     a broadcast sorted-numpy ``searchsorted`` lookup (zero-copy from
     the object store, per CLAUDE.md's broadcast rule).

At 100 TB the driver combine holds one row per sorted batch (~bytes /
block size); if that ever outgrows the driver, the offsets themselves
are a tiny prefix sum that can tree-reduce — noted here, not needed at
any realistic block count (1 PB / 64 MB ≈ 16 M rows of 3 scalars).

The batch tag requires ``unique_col`` to be globally unique (a doc /
event id) — two batches can then never share a tag, and ordering tags
by their batch's first sort key reproduces batch order exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from ray.data import Dataset

from ocr_poc_ray.stages.ordering import default_sort_blocks

_LOCAL = "_psum_local"
_TAG = "_psum_tag"
_TOT = "_psum_tot"


def ordered_prefix_sum(
    ds: Dataset,
    *,
    sort_cols: list[str],
    value_col: str | None,
    out_col: str,
    unique_col: str | None = None,
    sort_num_blocks: int | None = None,
    op: str = "sum",
) -> Dataset:
    """Inclusive global prefix scan of ``value_col`` in ``sort_cols``
    order (``value_col=None`` → 1-based global row number).

    ``op`` picks the (associative) scan operator: ``"sum"`` (default)
    or ``"max"`` — the latter is the streaming-watermark primitive
    (``max(ts) over (order by arrival rows unbounded preceding)``);
    same two-pass shape, the per-batch stitch just switches from
    ``local + offset`` to ``max(local, offset)`` with an int64-min
    identity.

    ``unique_col`` (default: last sort col) must be globally unique.
    Output keeps the input columns plus ``out_col`` (int64); row order
    is the sorted order up to Ray's block interleaving.
    """
    if op not in ("sum", "max"):
        raise ValueError(f"op must be 'sum' or 'max', got {op!r}")
    if op == "max" and value_col is None:
        raise ValueError("op='max' requires a value_col")
    unique_col = unique_col or sort_cols[-1]
    sk_cols = [f"_psum_sk{j}" for j in range(len(sort_cols))]

    nb = sort_num_blocks or default_sort_blocks()
    ordered = ds.repartition(nb).sort(sort_cols) if nb else ds.sort(sort_cols)

    def block_pass(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            batch[_LOCAL] = pd.Series([], dtype="int64")
            batch[_TAG] = batch[unique_col]
            batch[_TOT] = pd.Series([], dtype="int64")
            for j, c in enumerate(sort_cols):
                batch[sk_cols[j]] = batch[c]
            return batch
        if value_col is None:
            local = np.arange(1, len(batch) + 1, dtype=np.int64)
        elif op == "max":
            local = np.maximum.accumulate(batch[value_col].to_numpy(np.int64))
        else:
            local = np.cumsum(batch[value_col].to_numpy(np.int64))
        batch[_LOCAL] = local
        batch[_TAG] = batch[unique_col].iloc[0]
        batch[_TOT] = local[-1]
        for j, c in enumerate(sort_cols):
            batch[sk_cols[j]] = batch[c].iloc[0]
        return batch

    # ONE pinned execution: the tag is the batch's first row, so the
    # tagging pass must never re-execute with different batch slicing
    # (see CLAUDE.md / windows.keyed_sorted_match).
    pinned = ordered.map_batches(block_pass, batch_format="pandas").materialize()

    # O(num_batches) driver combine → exclusive per-batch offsets.
    groups = pinned.map_batches(
        lambda b: b[[_TAG, _TOT, *sk_cols]].drop_duplicates(_TAG),
        batch_format="pandas",
    ).to_pandas()
    if groups.empty:
        # Empty input: a 0-row to_pandas drops its columns (CLAUDE.md),
        # so the sort below would KeyError; there are no offsets to add.
        groups = pd.DataFrame({_TAG: [], _TOT: [],
                               **{c: [] for c in sk_cols}})
    groups = groups.drop_duplicates(_TAG).sort_values(
        [*sk_cols, _TAG], kind="mergesort"
    )
    if op == "max":
        # exclusive running max with the int64-min identity: batch 0
        # has no predecessor, so its offset must never win the stitch.
        tots = groups[_TOT].to_numpy(np.int64)
        offsets = np.concatenate(
            [[np.iinfo(np.int64).min], np.maximum.accumulate(tots)[:-1]]
        ).astype(np.int64)
    else:
        offsets = np.concatenate(
            [[0], np.cumsum(groups[_TOT].to_numpy(np.int64))[:-1]]
        ).astype(np.int64)
    tags = groups[_TAG].to_numpy()
    order = np.argsort(tags, kind="stable")
    tags_ref = ray.put(tags[order])
    offs_ref = ray.put(offsets[order])

    drop = [_LOCAL, _TAG, _TOT, *sk_cols]

    def add_offset(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            batch[out_col] = pd.Series([], dtype="int64")
            return batch.drop(columns=drop)
        tags_s = ray.get(tags_ref)
        offs = ray.get(offs_ref)
        idx = np.searchsorted(tags_s, batch[_TAG].to_numpy())
        local = batch[_LOCAL].to_numpy(np.int64)
        if op == "max":
            batch[out_col] = np.maximum(local, offs[idx])
        else:
            batch[out_col] = local + offs[idx]
        return batch.drop(columns=drop)

    return pinned.map_batches(add_offset, batch_format="pandas")
