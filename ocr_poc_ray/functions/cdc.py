"""Content-defined chunking (CDC) dedup — the gear-hash rolling-window
chunker used by dedup storage systems (LBFS/Rabin lineage; gear hash per
Xia et al., FastCDC, USENIX ATC'16) applied to corpus text.

Why CDC for training data: byte-identical passages shared between
documents land on the SAME chunk boundaries no matter where they sit in
the document (an insertion upstream shifts fixed-size blocks but not
content-defined ones), so a distinct-count over chunk hashes measures
cross-corpus duplicated BYTES without any pairwise comparison — one
embarrassingly-parallel pass + a bounded distinct combine.

Determinism spec (golden-tested, do not change without bumping):
- GEAR: 256 uint64 values from ``numpy`` PCG64 seeded with _GEAR_SEED.
- Rolling hash over a W=16-byte window:
  ``h(i) = sum_{k=0..15} GEAR[byte[i-k]] << k  (mod 2^64)``
  (the classic ``h = (h << 1) + GEAR[b]`` recurrence truncated to a
  16-tap window so one batch is 16 vectorized shift-adds, not a byte
  loop).
- A chunk boundary is cut AFTER byte ``i`` iff ``(h(i) >> 8) & 0xFF == 0``
  (average chunk ≈ 256 bytes) and the in-document position of ``i+1`` is
  ≥ MIN_POS (window purity + minimum chunk size).  No
  "min-bytes-since-last-boundary" rule: boundaries stay purely
  content-local, which keeps the kernel fully vectorized AND makes the
  boundary set of a shared passage independent of surrounding edits.

The 100-TB shape: the chunk pass is row-local (zero-copy Arrow string
buffers; chunks are built as one BinaryArray view over the batch's flat
byte buffer, never per-chunk Python slices); the only exchange is the
(chunk-hash, source) distinct, bucketed by hash so no bucket exceeds
~1/n_buckets of the distinct set.  Reference analogue: none (beyond the
reference's scope) — CDC is the substring-dedup complement for binary /
shifted payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_GEAR_SEED = 0x9E3779B9
GEAR = np.random.default_rng(_GEAR_SEED).integers(
    0, 2**63, size=256, dtype=np.int64
).astype(np.uint64)
CDC_WINDOW = 16
MIN_POS = 64  # first legal cut position inside a document
_MASK_SHIFT = np.uint64(8)
_MASK = np.uint64(0xFF)


def _flat_utf8(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat_bytes uint8, doc_offsets int64) for a string column —
    zero-copy views over the Arrow buffers."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    flat = data[offs[0] : offs[-1]]
    return flat, offs - offs[0]


def gear_hashes(flat: np.ndarray) -> np.ndarray:
    """16-tap gear rolling hash at every byte position (vectorized)."""
    gv = GEAR[flat]
    h = gv.copy()
    n = len(flat)
    for k in range(1, min(CDC_WINDOW, n)):
        h[k:] += gv[: n - k] << np.uint64(k)
    return h


def chunk_offsets(flat: np.ndarray, doc_offs: np.ndarray) -> np.ndarray:
    """All chunk boundary offsets (int64, ascending, including every doc
    edge) for concatenated docs.  A cut at global position p means a
    chunk ends at p; cuts never cross doc edges and never land within
    MIN_POS bytes of a doc start."""
    if len(flat) == 0:
        return np.unique(doc_offs)
    h = gear_hashes(flat)
    cand = np.flatnonzero(((h >> _MASK_SHIFT) & _MASK) == 0) + 1  # cut AFTER i
    cand = cand[cand < doc_offs[-1]]  # a cut at the very end IS a doc edge
    if len(cand):
        di = np.searchsorted(doc_offs, cand, side="right") - 1
        rel = cand - doc_offs[di]
        # rel == doclen means "cut at doc end" — already a doc edge
        keep = (rel >= MIN_POS) & (cand < doc_offs[di + 1])
        cand = cand[keep]
    return np.unique(np.concatenate([doc_offs, cand]))


def cdc_chunk_table(batch: pa.Table, text_col: str = "text") -> pd.DataFrame:
    """Per-chunk rows for one Arrow batch: (chunk_hash int64, n_bytes
    int64, doc_row int64 — the batch-local row index).  Chunk contents
    are materialized as ONE BinaryArray view over the flat buffer."""
    flat, doc_offs = _flat_utf8(batch[text_col])
    bounds = chunk_offsets(flat, doc_offs)
    starts = bounds[:-1]
    # empty docs contribute zero-length duplicate offsets → drop
    nz = bounds[1:] > starts
    starts, ends = starts[nz], bounds[1:][nz]
    if len(starts) == 0:
        return pd.DataFrame(
            {"chunk_hash": pd.Series([], dtype="int64"),
             "n_bytes": pd.Series([], dtype="int64"),
             "doc_row": pd.Series([], dtype="int64")}
        )
    offs32 = np.empty(len(starts) + 1, dtype=np.int32)
    offs32[:-1] = starts
    offs32[-1] = ends[-1]
    chunks = pa.Array.from_buffers(
        pa.binary(), len(starts),
        [None, pa.py_buffer(offs32), pa.py_buffer(np.ascontiguousarray(flat))],
    )
    hashes = pd.util.hash_array(chunks.to_numpy(zero_copy_only=False)).view(np.int64)
    doc_row = np.searchsorted(doc_offs, starts, side="right") - 1
    return pd.DataFrame(
        {"chunk_hash": hashes,
         "n_bytes": (ends - starts).astype(np.int64),
         "doc_row": doc_row.astype(np.int64)}
    )


def cdc_source_stats(
    ds: "ray.data.Dataset",
    *,
    text_col: str = "text",
    source_col: str = "source",
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Per-source CDC dedup accounting: total vs distinct chunks/bytes.

    Stage 1 (row-local): chunk each batch, hash chunks, and pre-combine
    to one row per DISTINCT (source, chunk_hash) in the batch carrying
    (count, bytes).  Stage 2: a ``n_buckets``-way hash-bucket combine
    dedups (source, chunk_hash) globally — sums counts, keeps one
    length — and emits per-bucket per-source partials.  The driver folds
    O(n_buckets × n_sources) rows.
    """

    def partial(t: pa.Table) -> pd.DataFrame:
        ch = cdc_chunk_table(t, text_col)
        if len(ch) == 0:
            return pd.DataFrame(
                {"mix": pd.Series([], dtype="int64"),
                 "source": pd.Series([], dtype=object),
                 "n_bytes": pd.Series([], dtype="int64"),
                 "cnt": pd.Series([], dtype="int64"),
                 "_hb": pd.Series([], dtype="int64")}
            )
        src = t[source_col].to_numpy(zero_copy_only=False)[ch["doc_row"].to_numpy()]
        mix = (
            ch["chunk_hash"].to_numpy().view(np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)
            + pd.util.hash_array(src.astype(object))
        ).view(np.int64)
        g = pd.DataFrame(
            {"mix": mix, "source": src, "n_bytes": ch["n_bytes"].to_numpy()}
        ).groupby("mix", as_index=False).agg(
            source=("source", "first"),
            n_bytes=("n_bytes", "first"),
            cnt=("n_bytes", "size"),
        )
        g["_hb"] = (g["mix"].to_numpy().view(np.uint64) % n_buckets).astype(np.int64)
        return g

    def bucket_combine(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("mix", as_index=False).agg(
            source=("source", "first"),
            n_bytes=("n_bytes", "first"),
            cnt=("cnt", "sum"),
        )
        d["total_bytes"] = d["n_bytes"] * d["cnt"]
        out = d.groupby("source", as_index=False).agg(
            n_chunks=("cnt", "sum"),
            n_distinct_chunks=("cnt", "size"),
            total_bytes=("total_bytes", "sum"),
            distinct_bytes=("n_bytes", "sum"),
        )
        return out

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(bucket_combine, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty or "source" not in parts.columns:
        return pd.DataFrame(
            {"source": pd.Series([], dtype=object),
             "n_chunks": pd.Series([], dtype="int64"),
             "n_distinct_chunks": pd.Series([], dtype="int64"),
             "total_bytes": pd.Series([], dtype="int64"),
             "distinct_bytes": pd.Series([], dtype="int64"),
             "dup_byte_ratio": pd.Series([], dtype="float64")}
        )
    agg = parts.groupby("source", as_index=False).agg(
        n_chunks=("n_chunks", "sum"),
        n_distinct_chunks=("n_distinct_chunks", "sum"),
        total_bytes=("total_bytes", "sum"),
        distinct_bytes=("distinct_bytes", "sum"),
    )
    agg["dup_byte_ratio"] = (
        1.0 - agg["distinct_bytes"] / agg["total_bytes"]
    ).round(6)
    return (
        agg.sort_values("source", kind="mergesort")
        .reset_index(drop=True)
        .astype(
            {"source": object, "n_chunks": "int64",
             "n_distinct_chunks": "int64", "total_bytes": "int64",
             "distinct_bytes": "int64", "dup_byte_ratio": "float64"}
        )
    )
