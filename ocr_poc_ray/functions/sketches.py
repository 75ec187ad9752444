"""Mergeable sketches for approximate aggregates at corpus scale.

HyperLogLog: each batch builds a local register array (a partial —
kilobytes regardless of batch size), registers merge by elementwise
max (associative + commutative, so any combine tree is correct), and
the estimate comes from the standard bias-corrected harmonic mean with
linear-counting fallback in the small range.  Deterministic across
processes: value hashing is blake2b, never Python's seeded ``hash``.

Bottom-k quantile sketch: each row gets a deterministic priority (a
siphash of its identity); the k lowest-priority rows form a uniform
sample of the stream, and two partial samples merge by re-taking the k
lowest — associative, commutative, idempotent, so the combine shape is
free.  Quantiles read off the merged sample with rank error
≈ 1/√k (~1.6 % at k=4096).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ray.data import Dataset


def _hash64(value) -> int:
    return int.from_bytes(
        hashlib.blake2b(str(value).encode("utf-8", "ignore"), digest_size=8).digest(),
        "big",
    )


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _batch_registers(values, p: int) -> np.ndarray:
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    for v in values:
        h = _hash64(v)
        idx = h >> (64 - p)
        rest = h & ((1 << (64 - p)) - 1)
        # rank = position of the leftmost 1-bit in the remaining 64-p bits
        rank = (64 - p) - rest.bit_length() + 1
        if rank > reg[idx]:
            reg[idx] = rank
    return reg


def _estimate(reg: np.ndarray) -> float:
    m = len(reg)
    est = _alpha(m) * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting (small range)
    return est


def hll_count_distinct(ds: Dataset, col: str, *, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col); relative error ≈ 1.04/√(2^p)
    (~1.6 % at p=12).  One streaming pass; partials are 2^p bytes."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        reg = _batch_registers(batch[col], p)
        return pd.DataFrame({"registers": [reg.tobytes()]})

    partials = ds.select_columns([col]).map_batches(partial, batch_format="pandas")
    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in partials.iter_batches(batch_format="pandas"):
        for blob in b["registers"]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
    return int(round(_estimate(merged)))


def hll_count_distinct_by(
    ds: Dataset, key_col: str, col: str, *, p: int = 12
) -> pd.DataFrame:
    """Approximate distinct `col` per `key_col` value (few keys): one
    register array per key per batch, merged per key."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in batch.groupby(key_col, sort=False):
            rows.append({key_col: key, "registers": _batch_registers(grp[col], p).tobytes()})
        return pd.DataFrame(rows)

    partials = (
        ds.select_columns([key_col, col])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    out = []
    for key, grp in partials.groupby(key_col, sort=False):
        merged = np.zeros(1 << p, dtype=np.uint8)
        for blob in grp["registers"]:
            merged = np.maximum(merged, np.frombuffer(blob, dtype=np.uint8))
        out.append({key_col: key, "approx_distinct": int(round(_estimate(merged)))})
    return pd.DataFrame(out).sort_values(key_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bottom-k priority sample → approximate quantiles (per key)
# ---------------------------------------------------------------------------


def _priorities(batch: pd.DataFrame, id_cols: list[str]) -> np.ndarray:
    """Deterministic per-row uint64 priorities from the row identity —
    one vectorized siphash call, stable across processes and runs."""
    ident = batch[id_cols[0]].astype(str)
    for c in id_cols[1:]:
        ident = ident + "\x1f" + batch[c].astype(str)
    return pd.util.hash_array(ident.to_numpy(dtype=object))


def quantile_sketch_by(
    ds: Dataset,
    key_col: str,
    value_col: str,
    *,
    id_cols: list[str] | None = None,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    k: int = 4096,
) -> pd.DataFrame:
    """Approximate quantiles of `value_col` per `key_col` (few keys) via
    a mergeable bottom-k priority sample — the continuous-value
    counterpart of the exact histogram-combine quantiles (which need a
    low-cardinality measure).  One streaming pass; each partial is ≤ k
    (priority, value) pairs per key; rank error ≈ 1/√k.

    Output: one row per (key, q) with columns (key_col, q, value).
    """
    id_cols = id_cols or [value_col]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        prio = _priorities(batch, id_cols)
        b = pd.DataFrame(
            {key_col: batch[key_col], "_prio": prio, "_val": batch[value_col]}
        )
        return (
            b.sort_values("_prio", kind="mergesort")
            .groupby(key_col, sort=False)
            .head(k)
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("_prio", kind="mergesort").head(k)

    merged = (
        ds.select_columns(list(dict.fromkeys([key_col, value_col] + id_cols)))
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)  # few keys → few groups; merge = re-take bottom-k
        .map_groups(combine, batch_format="pandas")
        .to_pandas()  # ≤ k rows per key reach the driver
    )
    out = []
    for key, grp in merged.groupby(key_col, sort=False):
        sample = grp["_val"].to_numpy()
        for q in qs:
            out.append(
                {key_col: key, "q": q, "value": float(np.quantile(sample, q))}
            )
    return pd.DataFrame(out).sort_values([key_col, "q"]).reset_index(drop=True)
