"""Exact distributed order statistics over continuous measures.

``exact_group_quantile_disc`` finds, per group, the element at 0-based
rank ``floor((n-1)*q)`` (DuckDB ``quantile_disc`` semantics) without
ever sorting the fact table or collecting a group to the driver.  The
histogram-combine trick (queries.relational.rel_quantity_quantiles)
needs low-cardinality values; this works for CONTINUOUS values via
iterative range refinement — the classic distributed selection
algorithm:

  pass 0   per-batch (key, count, min, max) partials → tiny combine
  pass i   histogram each unresolved key's values into ``n_bins`` fixed
           bins between its current [lo, hi] (per-batch bincount
           partials; the combine is bounded by keys × bins, NEVER by
           rows), walk the cumulative histogram to the bin holding the
           target rank, recurse into it
  final    a bin that holds ≤ ``collect_threshold`` values is collected
           and the rank picked exactly

Each pass is one streaming read of the (key, value) projection — the
refinement predicate is value-based, so lazy re-execution is safe (the
batch-slicing pitfall in CLAUDE.md only bites positional logic).
Convergence: every pass divides the candidate count by ~n_bins, so
even a 10^12-row group resolves in ≤ 5 passes; a bin whose edges have
collapsed to equal floats is a run of one repeated value and resolves
immediately.  Key cardinality must be modest (state is keys × bins on
the driver and in the broadcast); for millions of groups use a
mergeable sketch instead (functions.sketches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset


def _target_rank(n: int, q: float) -> int:
    return int(np.floor((n - 1) * q))


def exact_group_quantile_disc(
    ds: Dataset,
    *,
    key_col: str,
    value_col: str,
    q: float,
    n_bins: int = 128,
    collect_threshold: int = 8192,
    max_rounds: int = 64,
) -> pd.DataFrame:
    """(key_col, value) with value = the group's exact q-th discrete
    quantile.  Groups with no rows simply don't appear."""
    import ray as _ray

    def stats_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key_col)[value_col].agg(["count", "min", "max"])
        return g.reset_index()

    parts = ds.map_batches(stats_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({key_col: pd.Series([], dtype=object),
                             "value": pd.Series([], dtype="float64")})
    stats = parts.groupby(key_col).agg(
        n=("count", "sum"), lo=("min", "min"), hi=("max", "max")
    )

    # per-key mutable search state
    keys = list(stats.index)
    state = {
        k: {
            "rank": _target_rank(int(stats.loc[k, "n"]), q),
            "lo": float(stats.loc[k, "lo"]),
            "hi": float(stats.loc[k, "hi"]),
            "remaining": int(stats.loc[k, "n"]),
            "value": None,
        }
        for k in keys
    }
    for s in state.values():  # single-value range: already exact
        if s["lo"] == s["hi"]:
            s["value"] = s["lo"]

    def unresolved():
        return [k for k in keys if state[k]["value"] is None
                and state[k]["remaining"] > collect_threshold]

    def hist_pass(active: list) -> None:
        act_keys = np.asarray(active, dtype=object)
        edges = np.stack(
            [np.linspace(state[k]["lo"], state[k]["hi"], n_bins + 1)
             for k in active]
        )
        # each round counts ONLY the values inside the key's current
        # candidate range — [lo, hi) for an interior bin, [lo, hi] for
        # the initial range / a last bin — or the rank arithmetic would
        # include already-eliminated values
        closed = np.asarray(
            [bool(state[k].get("last_bin", True)) for k in active]
        )
        ref = _ray.put((act_keys, edges, closed))

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            ak, ed, cl = _ray.get(ref)
            rows_k, rows_b, rows_c = [], [], []
            kv = b[key_col].to_numpy()
            vv = b[value_col].to_numpy(dtype="float64")
            for i, k in enumerate(ak):
                vals = vv[kv == k]
                lo_i, hi_i = ed[i][0], ed[i][-1]
                vals = vals[(vals >= lo_i) & (
                    (vals <= hi_i) if cl[i] else (vals < hi_i)
                )]
                if not len(vals):
                    continue
                bins = np.clip(
                    np.searchsorted(ed[i], vals, side="right") - 1, 0, n_bins - 1
                )
                cnt = np.bincount(bins, minlength=n_bins)
                nz = np.nonzero(cnt)[0]
                rows_k.extend([i] * len(nz))
                rows_b.extend(nz.tolist())
                rows_c.extend(cnt[nz].tolist())
            return pd.DataFrame(
                {"ki": pd.Series(rows_k, dtype="int64"),
                 "bi": pd.Series(rows_b, dtype="int64"),
                 "cnt": pd.Series(rows_c, dtype="int64")}
            )

        hp = ds.map_batches(partial, batch_format="pandas").to_pandas()
        agg = hp.groupby(["ki", "bi"])["cnt"].sum()
        for i, k in enumerate(act_keys):
            s = state[k]
            counts = np.zeros(n_bins, dtype="int64")
            if i in agg.index.get_level_values(0):
                sub = agg.loc[i]
                counts[sub.index.to_numpy()] = sub.to_numpy()
            cum = counts.cumsum()
            b_idx = int(np.searchsorted(cum, s["rank"] + 1))
            s["rank"] -= int(cum[b_idx - 1]) if b_idx else 0
            s["remaining"] = int(counts[b_idx])
            new_lo, new_hi = float(edges[i][b_idx]), float(edges[i][b_idx + 1])
            s["last_bin"] = b_idx == n_bins - 1
            if new_lo == new_hi:  # run of one repeated value
                s["value"] = new_lo
            else:
                s["lo"], s["hi"] = new_lo, new_hi

    rounds = 0
    while unresolved() and rounds < max_rounds:
        hist_pass(unresolved())
        rounds += 1

    # final exact pick over the (≤ threshold per key) surviving ranges;
    # the filter reproduces the binning predicate: [lo, hi) except a
    # last bin / round-0 range, which is [lo, hi].
    pending = [k for k in keys if state[k]["value"] is None]
    if pending:
        pk = np.asarray(pending, dtype=object)
        plo = np.asarray([state[k]["lo"] for k in pending])
        phi = np.asarray([state[k]["hi"] for k in pending])
        pclosed = np.asarray([bool(state[k].get("last_bin", True)) for k in pending])
        ref = _ray.put((pk, plo, phi, pclosed))

        def collect(b: pd.DataFrame) -> pd.DataFrame:
            k_, lo_, hi_, cl_ = _ray.get(ref)
            kv = b[key_col].to_numpy()
            vv = b[value_col].to_numpy(dtype="float64")
            frames = []
            for i, k in enumerate(k_):
                m = (kv == k) & (vv >= lo_[i]) & (
                    (vv <= hi_[i]) if cl_[i] else (vv < hi_[i])
                )
                if m.any():
                    frames.append(pd.DataFrame({key_col: [k] * int(m.sum()),
                                                "v": vv[m]}))
            if not frames:
                # slice the input so the empty block keeps the key
                # column's real dtype (an object-dtype empty defeats
                # Ray's block-size accounting)
                return b.iloc[:0][[key_col]].assign(
                    v=pd.Series([], dtype="float64")
                )
            return pd.concat(frames, ignore_index=True)

        got = ds.map_batches(collect, batch_format="pandas").to_pandas()
        for k in pending:
            vals = np.sort(got.loc[got[key_col] == k, "v"].to_numpy())
            s = state[k]
            assert len(vals) == s["remaining"], (k, len(vals), s["remaining"])
            s["value"] = float(vals[s["rank"]])

    return pd.DataFrame(
        {key_col: keys, "value": [float(state[k]["value"]) for k in keys]}
    )
