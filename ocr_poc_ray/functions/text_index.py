"""Persisted inverted text index: build once / query many, with
partition-pruned reads.

The text-retrieval sibling of ``functions/ann_index.py``'s persisted IVF
index (reference analog: the load-once model registry
``ocr/id_card_data_extractor.py:25-35`` builds an artifact once and serves
many lookups).  Build writes postings ``(token, doc_id)`` hive-partitioned
by a token-hash bucket; a boolean AND query reads ONLY the buckets its
terms hash to — at a 100-TB corpus the query cost is proportional to the
probed buckets' postings, never the index size.  ``probed_bucket_paths``
exposes the pruning contract so a test can assert untouched partitions
stay unread (the same testability hook ``ann_index.probed_list_paths``
established).

Scale shape:

- Build: one distributed pass tokenizes per batch (Arrow split →
  per-doc dedup via the sorted (hash, doc) trick), emits ``(token,
  doc_id, bucket)`` rows, and ``write_parquet(partition_cols=
  ["bucket"])`` lays them out for pruned reads.  No exchange beyond the
  write's partition routing; postings for one token live in exactly one
  bucket directory.
- Query: terms hash to buckets driver-side (tiny); only those hive
  directories are read (``read_parquet`` on the pruned paths), filtered
  to the exact terms, and the AND is a per-doc distinct-term count ==
  n_terms — per-batch partial counts then one bounded combine, never a
  corpus-sized structure on the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

N_INDEX_BUCKETS = 64


def _token_hash(tokens: np.ndarray) -> np.ndarray:
    """Deterministic uint64 token hashes (the repo-wide siphash
    convention — stable across processes, unlike Python's seeded hash)."""
    if len(tokens) == 0:
        return np.array([], dtype=np.uint64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object))


def _token_bucket(tokens: np.ndarray) -> np.ndarray:
    """Stable token → bucket assignment."""
    if len(tokens) == 0:
        return np.array([], dtype=np.int64)
    return (_token_hash(tokens) % np.uint64(N_INDEX_BUCKETS)).astype(np.int64)


def build_inverted_index(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Tokenize ``text_col`` (lowercase whitespace split), dedup tokens
    per document, and persist ``(token, doc_id)`` postings partitioned by
    ``bucket=<token hash % N_INDEX_BUCKETS>``.

    Returns ``out_dir``.  Layout: ``out_dir/bucket=K/*.parquet``.
    """
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch[text_col]), r"\s+"
        )
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        parts = []
        ids_np = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        arrs = flat.chunks if isinstance(flat, pa.ChunkedArray) else [flat]
        row0 = 0
        for arr in arrs:
            off = arr.offsets.to_numpy(zero_copy_only=False)
            vals = arr.values.to_numpy(zero_copy_only=False).astype(object)
            counts = np.diff(off)
            doc = np.repeat(ids_np[row0 : row0 + len(arr)], counts)
            row0 += len(arr)
            keep = vals != ""  # \s+ split leaves empty edge tokens
            vals, doc = vals[keep], doc[keep]
            # per-doc distinct: sort by (doc, token-hash) and drop equal
            # neighbours — no Python set per row
            h = _token_hash(vals)
            order = np.lexsort((h, doc))
            vals, doc, h = vals[order], doc[order], h[order]
            first = np.ones(len(vals), dtype=bool)
            first[1:] = (doc[1:] != doc[:-1]) | (h[1:] != h[:-1])
            vals, doc = vals[first], doc[first]
            parts.append((vals, doc))
        if not parts:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int64())}
            )
        tok = np.concatenate([p[0] for p in parts])
        doc = np.concatenate([p[1] for p in parts])
        return pa.table(
            {
                "token": pa.array(tok.astype(str)),
                "doc_id": pa.array(doc),
                "bucket": pa.array(_token_bucket(tok)),
            }
        )

    ds.map_batches(explode, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return out_dir


def probed_bucket_paths(index_dir: str, terms: list[str]) -> list[str]:
    """The hive directories a query for ``terms`` reads — the pruning
    contract (every other ``bucket=K`` directory stays untouched)."""
    terms_arr = np.asarray([t.lower() for t in terms], dtype=object)
    buckets = sorted(set(_token_bucket(terms_arr).tolist()))
    paths = [os.path.join(index_dir, f"bucket={b}") for b in buckets]
    return [p for p in paths if os.path.isdir(p)]


def append_index_delta(
    ds: ray.data.Dataset,
    index_dir: str,
    delta_name: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Incremental index maintenance: index NEW documents into
    ``index_dir/deltas/<delta_name>/bucket=K/`` with the SAME bucket
    assignment as the base — queries union base + deltas per probed
    bucket, so daily ingest never rewrites the base index.  Compact by
    re-running ``build_inverted_index`` over the full corpus when the
    delta count grows (same trade as LSM levels / the compaction CLI).

    Token → bucket is a pure hash (no learned vocabulary), so a delta
    built independently is bucket-compatible by construction.
    """
    delta_dir = os.path.join(index_dir, "deltas", delta_name)
    return build_inverted_index(ds, delta_dir, id_col=id_col, text_col=text_col)


def _probed_with_deltas(index_dir: str, terms: list[str]) -> list[str]:
    """Base + every delta's probed buckets (the union a query reads)."""
    paths = probed_bucket_paths(index_dir, terms)
    deltas_root = os.path.join(index_dir, "deltas")
    if os.path.isdir(deltas_root):
        for d in sorted(os.listdir(deltas_root)):
            paths.extend(
                probed_bucket_paths(os.path.join(deltas_root, d), terms)
            )
    return paths


def boolean_search(index_dir: str, terms: list[str]) -> pd.DataFrame:
    """Doc ids containing ALL ``terms`` (conjunctive boolean retrieval)
    via the persisted index: reads only the probed buckets, filters to
    the exact terms, then AND = per-doc distinct-term count == n_terms.

    Returns a one-column ``doc_id`` frame (ascending).
    """
    terms_l = sorted({t.lower() for t in terms})
    if not terms_l:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    paths = _probed_with_deltas(index_dir, terms_l)
    if not paths:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    n_terms = len(terms_l)
    terms_arr = np.asarray(terms_l, dtype=object)

    # a LIST of hive directories trips Ray's file-vs-dir detection —
    # enumerate the parquet files explicitly (still only probed buckets)
    files = [
        os.path.join(p, f)
        for p in paths
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    if not files:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    postings = ray.data.read_parquet(files, columns=["token", "doc_id"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        tok = batch["token"].to_numpy(zero_copy_only=False)
        keep = np.isin(tok, terms_arr)
        if not keep.any():
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)[keep]
        # postings are distinct (token, doc) by construction, so a plain
        # count per doc IS the distinct-term count within this batch
        u, c = np.unique(doc, return_counts=True)
        return pd.DataFrame({"doc_id": u, "n": c})

    partials = postings.map_batches(partial, batch_format="pyarrow")

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("doc_id", as_index=False)["n"].sum()
        hit = g[g["n"] == n_terms][["doc_id"]]
        return hit

    # bounded combine: partials are ≤ |matching docs| rows per batch;
    # bucket by doc-id hash so no task sees the whole corpus
    out = (
        partials.map_batches(
            lambda b: b.assign(_hb=b["doc_id"].to_numpy() % 16),
            batch_format="pandas",
        )
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    return (
        out[["doc_id"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64"})
    )
