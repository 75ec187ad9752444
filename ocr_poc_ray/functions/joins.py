"""Skew-aware equi-join — the "salt the hot keys" pattern as a named
operator.

A partitioned hash join sends every row of a key to ONE aggregator
partition; a power-law key (one user with 10 % of events, one hot
conv_id) therefore serializes the join on a single task no matter how
many CPUs the cluster has.  ``skew_join`` splits the work by measured
frequency instead:

  1. per-batch partial key counts on the PROBE side, summed in a
     bounded hash-bucket combine → the hot keys (count > threshold),
     a handful by definition;
  2. COLD rows take the normal partitioned hash join (capped at
     cluster CPUs — `_join_parallelism`);
  3. HOT rows never enter the shuffle: the build side's hot-key rows
     are broadcast once (`ray.put`, zero-copy per worker) and joined
     map-side inside `map_batches`, so a key with a billion probe rows
     costs every task a vectorized merge against a small broadcast
     frame instead of one task a billion-row partition.

Exact for inner equi-joins (every probe row lands in exactly one of
the two paths); the build side's hot slice must fit the object store —
it is dimension-sized in the intended use (facts ⋈ dimension with a
skewed foreign key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

#: probe-side rows of one key above which it is routed to the
#: broadcast path (tune to ~rows-per-block so no join partition is
#: dominated by a single key)
DEFAULT_HOT_THRESHOLD = 100_000


def _hot_keys(probe: Dataset, on: str, threshold: int, n_buckets: int = 64) -> pd.DataFrame:
    """Keys whose probe-side row count exceeds ``threshold`` — partial
    counts per batch, bounded-bucket combine; only the (few, by
    definition) hot keys reach the driver."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(on, as_index=False).size()
        g["_kb"] = (
            pd.util.hash_array(g[on].to_numpy()) % n_buckets
        ).astype("int64")
        return g

    def hot(group: pd.DataFrame) -> pd.DataFrame:
        t = group.groupby(on, as_index=False)["size"].sum()
        return t.loc[t["size"] > threshold, [on, "size"]]

    out = (
        probe.select_columns([on])
        .map_batches(partial, batch_format="pandas")
        .groupby("_kb")
        .map_groups(hot, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or on not in out.columns:
        return pd.DataFrame({on: pd.Series([], dtype="object"), "size": []})
    return out


def skew_join(
    probe: Dataset,
    build: Dataset,
    *,
    on: str,
    hot_threshold: int = DEFAULT_HOT_THRESHOLD,
    num_partitions: int = 8,
) -> Dataset:
    """Inner equi-join of ``probe`` (big, possibly skewed) with
    ``build`` (small/dimension side) on column ``on``; identical result
    to ``probe.join(build)`` at any skew, without a hot key serializing
    one partition."""
    import ray

    from ocr_poc_ray.functions.dedup import _join_parallelism

    hot = _hot_keys(probe, on, hot_threshold)
    build = build.materialize()  # read by the hot filter AND the cold join

    if len(hot):
        # broadcast as a sorted numpy array (zero-copy per worker;
        # CLAUDE.md broadcast rule), membership via vectorized isin
        hot_ref = ray.put(np.sort(hot[on].to_numpy()))

        def split_mask(b: pd.DataFrame, keep_hot: bool) -> pd.DataFrame:
            mask = b[on].isin(ray.get(hot_ref)).to_numpy()
            return b[mask] if keep_hot else b[~mask]

        build_hot_df = build.map_batches(
            lambda b: split_mask(b, True), batch_format="pandas"
        ).to_pandas()
        bh_ref = ray.put(build_hot_df)

        def hot_join(b: pd.DataFrame) -> pd.DataFrame:
            return split_mask(b, True).merge(ray.get(bh_ref), on=on)

        hot_out = probe.map_batches(hot_join, batch_format="pandas")
        probe_cold = probe.map_batches(
            lambda b: split_mask(b, False), batch_format="pandas"
        )
        build_cold = build.map_batches(
            lambda b: split_mask(b, False), batch_format="pandas"
        )
    else:
        hot_out = None
        probe_cold, build_cold = probe, build

    jp = _join_parallelism(num_partitions)
    cold_out = probe_cold.repartition(jp).join(
        build_cold.repartition(jp), "inner", num_partitions=jp, on=(on,)
    )
    return cold_out.union(hot_out) if hot_out is not None else cold_out
