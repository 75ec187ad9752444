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


# ---------------------------------------------------------------------------
# Bloom filter: a mergeable bit array for scale-safe semi-joins.  Each
# batch of the build side sets its keys' bits in a LOCAL bitmap (a
# partial — m/8 bytes regardless of batch size); partials merge by
# bitwise OR (associative + commutative + idempotent: any combine tree
# is correct, so the driver OR here tree-reduces trivially at scale).
# The probe side broadcasts the finished words once (zero-copy numpy
# via the object store) and tests membership fully vectorized.
#
# Hashing is a splitmix64 finalizer over the int64 key — deterministic
# across processes — with double hashing (h1 + i·h2 mod m) for the k
# probes.  False-positive rate ≈ (1 − e^{−kn/m})^k; with the default
# m=2^20, k=4 it stays under 1 % to ~90k keys.  The filter only
# PREscreens: an exact verify (distributed hash join on the survivors)
# removes false positives, so results are exact at any fill level.
# ---------------------------------------------------------------------------

_SM64_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray, seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(seed) * _SM64_GAMMA
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _bloom_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing."""
    h1 = _splitmix64(keys, 1)
    h2 = _splitmix64(keys, 2) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)).astype(np.int64)


def bloom_build(
    ds: Dataset, col: str, *, m_bits: int = 1 << 20, k: int = 4
) -> np.ndarray:
    """Build a bloom filter over an int64 key column; returns the
    uint64 word array (length m_bits/64), ready to broadcast."""
    n_words = m_bits // 64

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        words = np.zeros(n_words, dtype=np.uint64)
        keys = batch[col].to_numpy(np.int64)
        if len(keys):
            pos = _bloom_positions(keys, m_bits, k).ravel()
            np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63)))
        return pd.DataFrame({"words": [words.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = np.zeros(n_words, dtype=np.uint64)
    for blob in parts["words"]:
        out |= np.frombuffer(blob, dtype=np.uint64)
    return out


def bloom_contains(
    words: np.ndarray, keys: np.ndarray, *, m_bits: int | None = None, k: int = 4
) -> np.ndarray:
    """Vectorized membership test (no false negatives)."""
    m_bits = m_bits if m_bits is not None else len(words) * 64
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(np.asarray(keys, dtype=np.int64), m_bits, k)
    bits = (words[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=0).astype(bool)


# ---------------------------------------------------------------------------
# Count-min sketch — approximate frequencies in fixed memory, completing
# the mergeable-sketch family (HLL = distinct, bloom = membership,
# bottom-k = quantiles, count-min = frequency).  One-sided error:
# estimate >= true count always; estimate <= true + eps*N with
# probability 1 - delta for width = e/eps, depth = ln(1/delta).
#
# Shape: per-batch partial sketches (depth x width int64 — a few hundred
# kB) add elementwise, so the combine is sketch-sized regardless of
# corpus size; the finished sketch broadcasts for row-local probing.
# ---------------------------------------------------------------------------


def _cm_rows(keys: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(depth, n) column indices via double hashing (splitmix64 pair)."""
    h1 = _splitmix64(keys, 11)
    h2 = _splitmix64(keys, 12) | np.uint64(1)
    d = np.arange(depth, dtype=np.uint64)[:, None]
    return ((h1[None, :] + d * h2[None, :]) % np.uint64(width)).astype(np.int64)


def cm_build(
    ds: Dataset, col: str, *, width: int = 2048, depth: int = 4
) -> np.ndarray:
    """Count-min sketch (depth, width) int64 over an int64 key column;
    counts every occurrence (not distinct).  Mergeable: sketches of
    shards ADD."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sk = np.zeros((depth, width), dtype=np.int64)
        keys = batch[col].to_numpy(np.int64)
        if len(keys):
            cols = _cm_rows(keys, width, depth)
            for d in range(depth):
                # bincount beats np.add.at ~10x for a plain histogram
                sk[d] += np.bincount(cols[d], minlength=width)
        return pd.DataFrame({"sk": [sk.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = np.zeros((depth, width), dtype=np.int64)
    for blob in parts["sk"]:
        out += np.frombuffer(blob, dtype=np.int64).reshape(depth, width)
    return out


def cm_estimate(sketch: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Estimated counts for int64 keys: min over the depth rows."""
    depth, width = sketch.shape
    keys = np.asarray(keys, dtype=np.int64)
    if not len(keys):
        return np.zeros(0, dtype=np.int64)
    cols = _cm_rows(keys, width, depth)
    ests = np.stack([sketch[d][cols[d]] for d in range(depth)])
    return ests.min(axis=0)


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitter summary (mergeable form, Agarwal et al. 2012)
# ---------------------------------------------------------------------------


def _mg_compress(tokens: np.ndarray, counts: np.ndarray, k: int):
    """Compress exact (token, count) rows to ≤ k Misra-Gries counters:
    subtract the (k+1)-th largest count from all and drop non-positive.
    Each compression of a summary covering n items loses ≤ n/(k+1) per
    item; the loss bound survives arbitrary merges (mergeable-summary
    property), so est(f) ≥ f − n_total/(k+1) always."""
    if len(tokens) <= k:
        return tokens, counts
    order = np.argsort(counts, kind="mergesort")[::-1]
    dec = counts[order[k]]
    keep = order[:k]
    adj = counts[keep] - dec
    pos = adj > 0
    return tokens[keep][pos], adj[pos]


def mg_heavy_hitters(
    ds, col: str, *, k: int = 511, text_tokens: bool = False
) -> "pd.DataFrame":
    """Misra-Gries candidate summary of ``ds[col]`` (or of lowercase
    whitespace tokens of a text column when ``text_tokens``): ≤ k
    (token, est) rows with est ≥ true − n/(k+1) — a guaranteed
    SUPERSET of every item with frequency > n/(k+1).

    Scale shape: one exact value_counts + MG compression per batch
    (partial rows bounded by k, never by batch rows or vocabulary),
    then one driver-side merge of the ≤ k×blocks partial counters —
    the driver never sees the corpus or the vocabulary, only k rows
    per block.  Pair with an exact distributed recount of the ≤ k
    candidates for exact heavy-hitter queries."""
    import pyarrow.compute as pc

    def partial(batch) -> pd.DataFrame:
        if text_tokens:
            text = pc.utf8_trim_whitespace(pc.utf8_lower(batch[col]))
            vc = pc.list_flatten(pc.utf8_split_whitespace(text)).value_counts()
        else:
            vc = batch[col].combine_chunks().value_counts()
        toks = vc.field("values").to_pandas().to_numpy(dtype=object)
        cnts = vc.field("counts").to_pandas().to_numpy().astype(np.int64)
        mask = toks != ""
        t2, c2 = _mg_compress(toks[mask], cnts[mask], k)
        return pd.DataFrame({"token": t2, "est": c2})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("token", as_index=False)["est"].sum()
    toks = agg["token"].to_numpy(dtype=object)
    cnts = agg["est"].to_numpy().astype(np.int64)
    t, c = _mg_compress(toks, cnts, k)
    out = pd.DataFrame({"token": t, "est": c})
    return out.sort_values(
        ["est", "token"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# t-digest (the merging variant, Dunning & Ertl, "Computing Extremely
# Accurate Quantiles Using t-Digests"): a mergeable centroid summary
# whose k-scale clustering makes rank error shrink toward the TAILS —
# the complement of the uniform bottom-k sample above (whose error is
# flat in q).  Deterministic: clustering is a greedy scan over sorted
# input, no randomness, so partials are reproducible across processes.
# Merging two digests = re-clustering the concatenated centroid lists;
# associativity holds only approximately, which is why the grouped
# query is rows-only and tests bound the RANK error instead.
# ---------------------------------------------------------------------------

TDIGEST_DELTA = 100


def _k1_inv(k: np.ndarray, delta: int) -> np.ndarray:
    """Inverse of the k_1 scale function k(q) = δ/2π · asin(2q−1)."""
    return (np.sin(k * (2.0 * np.pi / delta)) + 1.0) / 2.0


def tdigest_build(
    values: np.ndarray,
    weights: np.ndarray | None = None,
    *,
    delta: int = TDIGEST_DELTA,
) -> np.ndarray:
    """(2, C) float64 array [means; weights], means ascending.

    Greedy k-scale clustering over the sorted input: a cluster closes
    when its cumulative quantile would cross the next k-boundary, so
    clusters are O(1/δ) wide mid-distribution and single-point narrow
    at the extremes."""
    values = np.asarray(values, dtype=np.float64)
    if weights is None:
        weights = np.ones(len(values), dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    if len(values) == 0:
        return np.zeros((2, 0))
    order = np.argsort(values, kind="mergesort")
    v, w = values[order], weights[order]
    total = w.sum()
    means, wts = [], []
    c_sum, c_w = v[0] * w[0], w[0]
    q0 = 0.0  # cumulative quantile at the open cluster's left edge
    k0 = (delta / (2.0 * np.pi)) * np.arcsin(2.0 * min(max(q0, 0.0), 1.0) - 1.0)
    q_limit = _k1_inv(np.asarray(k0 + 1.0), delta)
    for i in range(1, len(v)):
        if (q0 * total + c_w + w[i]) <= q_limit * total + 1e-12:
            c_sum += v[i] * w[i]
            c_w += w[i]
        else:
            means.append(c_sum / c_w)
            wts.append(c_w)
            q0 += c_w / total
            k0 = (delta / (2.0 * np.pi)) * np.arcsin(
                2.0 * min(max(q0, 0.0), 1.0) - 1.0
            )
            q_limit = _k1_inv(np.asarray(k0 + 1.0), delta)
            c_sum, c_w = v[i] * w[i], w[i]
    means.append(c_sum / c_w)
    wts.append(c_w)
    return np.vstack([np.array(means), np.array(wts)])


def tdigest_merge(sketches: list[np.ndarray], *, delta: int = TDIGEST_DELTA) -> np.ndarray:
    """Merge digests by re-clustering the concatenated centroids."""
    parts = [s for s in sketches if s.shape[1]]
    if not parts:
        return np.zeros((2, 0))
    allc = np.hstack(parts)
    return tdigest_build(allc[0], allc[1], delta=delta)


def tdigest_quantile(sketch: np.ndarray, qs) -> np.ndarray:
    """Quantile estimates by linear interpolation between centroid
    means at their half-weight cumulative positions (the standard
    t-digest read-out)."""
    qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
    means, wts = sketch[0], sketch[1]
    if len(means) == 0:
        return np.full(len(qs), np.nan)
    total = wts.sum()
    centers = np.cumsum(wts) - wts / 2.0
    targets = qs * total
    return np.interp(targets, centers, means)


def tdigest_by(
    ds: Dataset,
    *,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    delta: int = TDIGEST_DELTA,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Per-key approximate quantiles via mergeable t-digests.

    Scale shape: one digest per key per batch (≤ 2·δ floats — batch
    partials are key-count-sized, never row-count-sized), serialized
    to bytes and combined in hash buckets (every key lives wholly in
    one bucket task, digests merge associatively enough for the rank
    bound); the driver sees keys × qs result rows only."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out_k, out_b = [], []
        for k, grp in batch.groupby(key_col, sort=False):
            sk = tdigest_build(grp[value_col].to_numpy(np.float64), delta=delta)
            out_k.append(k)
            out_b.append(sk.tobytes())
        df = pd.DataFrame({key_col: out_k, "_sk": out_b})
        df["_hb"] = (
            pd.util.hash_array(df[key_col].to_numpy(dtype=object)) % n_buckets
        ).astype("int64")
        return df

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, grp in g.groupby(key_col, sort=False):
            sks = [
                np.frombuffer(b, dtype=np.float64).reshape(2, -1)
                for b in grp["_sk"]
            ]
            merged = tdigest_merge(sks, delta=delta)
            est = tdigest_quantile(merged, qs)
            for q, v in zip(qs, est):
                rows.append({key_col: k, "q": float(q), "value": float(v)})
        return pd.DataFrame(rows, columns=[key_col, "q", "value"])

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_merge, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {key_col: pd.Series([], dtype=object),
             "q": pd.Series([], dtype="float64"),
             "value": pd.Series([], dtype="float64")}
        )
    return out.sort_values([key_col, "q"], kind="mergesort").reset_index(drop=True)
