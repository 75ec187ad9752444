"""Mergeable sketches for approximate aggregates at corpus scale.

HyperLogLog: each batch builds a local register array (a partial —
kilobytes regardless of batch size), registers merge by elementwise
max (associative + commutative, so any combine tree is correct), and
the estimate comes from the standard bias-corrected harmonic mean with
linear-counting fallback in the small range.  Deterministic across
processes: value hashing is blake2b, never Python's seeded ``hash``.
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
