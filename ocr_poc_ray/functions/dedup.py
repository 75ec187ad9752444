"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale shape (ray_guide patterns + SURVEY.md §2.5):

- **exact**: vectorized content-hash column → ``groupby(hash)`` →
  per-group first (deterministic min-id winner).  One shuffle over
  (hash, id) pairs only — the text column is projected away first.
- **MinHash-LSH**: per-batch shingling + k-permutation MinHash
  (numpy, deterministic blake2b base hashes — never Python's seeded
  ``hash``), explode to (band_id, band_hash, doc_id) rows, one
  ``groupby`` over band buckets → candidate pairs → signature-overlap
  verify.  The signatures travel with the bucket rows so verification
  needs no second pass over the corpus.
- **SimHash**: 64-bit signature per doc from token hashes; bucket by
  4×16-bit bands (any pair within Hamming distance ≤ 3 shares ≥1
  band); verify Hamming distance within buckets.
- **n-gram Jaccard**: exact verification kernel for candidate pairs.

Connected components run a path-compressed union-find over the
candidate-pair edge list — pairs are the OUTPUT of the LSH passes,
orders of magnitude smaller than the corpus, so the exact in-memory
pass is the right tool (see the function docstring for the
corpus-scale dataflow alternative).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

# --------------------------------------------------------------------------
# Deterministic base hashing (stable across processes and runs).
# --------------------------------------------------------------------------


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8", "ignore"), digest_size=8).digest(), "big")


def _shingles(text: str, n: int = 3) -> set[str]:
    """Word n-gram shingles of a lowercased text (exact-verify kernel)."""
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


# Vectorized batch tokenizer+hasher shared by MinHash and SimHash: ONE
# pd.util.hash_array call (deterministic siphash, fixed key — stable
# across processes, unlike Python's seeded hash) over the whole batch's
# flattened tokens.  This replaced a per-shingle Python blake2b loop
# that dominated dedup_minhash wall time (VERDICT r1 item 6).

_SHINGLE_MULT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _batch_token_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint64 token hashes, doc offsets) for a batch of texts."""
    from itertools import chain

    token_lists = texts.fillna("").str.lower().str.split()
    lens = np.asarray([len(t) for t in token_lists], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    flat = np.fromiter(
        chain.from_iterable(token_lists), dtype=object, count=int(offsets[-1])
    )
    hashes = pd.util.hash_array(flat) if len(flat) else np.array([], dtype=np.uint64)
    return hashes, offsets


def _doc_shingle_hashes(th: np.ndarray, n: int = 3) -> np.ndarray:
    """Distinct uint64 word-n-gram hashes from one doc's token hashes,
    via a vectorized positional polynomial (no n-gram strings built)."""
    m = len(th)
    if m == 0:
        return th
    with np.errstate(over="ignore"):
        if m < n:
            acc = np.uint64(0xCBF29CE484222325)
            for v in th:
                acc = acc * _SHINGLE_MULT + v
            return np.array([acc], dtype=np.uint64)
        k = m - n + 1
        acc = np.zeros(k, dtype=np.uint64)
        for i in range(n):
            acc = acc * _SHINGLE_MULT + th[i : i + k]
    return np.unique(acc)


# --------------------------------------------------------------------------
# Scale-safe membership filter (broadcast ↔ bloom semi-join switch)
# --------------------------------------------------------------------------

_SCALED_BUCKETS_WARNED = False


def _scaled_buckets(
    ds,
    floor: int = 32,
    bytes_per_bucket: int = 64 << 20,
    bytes_hint: int | None = None,
) -> int:
    """Bucket count for the bounded-bucket combine pattern, scaled to
    DATA bytes (~64 MB of rows per bucket task, `floor` when the size
    is unknown).  Group-per-bucket overhead is trivial up to thousands
    of buckets, while a FIXED count hands each combine task size/32 of
    a corpus-volume projection at 100 TB.

    Reads ONLY plan metadata — ``Dataset.size_bytes()`` silently
    EXECUTES the whole plan when metadata inference fails (measured:
    any ``select_columns``/``map_batches`` after a read), which would
    double-run the pipeline just to pick a bucket count.  Metadata is
    available for bare/column-pruned parquet reads and materialized
    datasets; anything else falls back to ``floor``.  Capped at 4096:
    per-group overhead is measurable by the tens of thousands
    (CLAUDE.md: 55 s at 80 k groups), and a 4096-way combine already
    bounds per-task data at ~256 GB-per-TB-of-projection.

    ``bytes_hint`` sidesteps the plan probe entirely: callers that know
    the projection's size (input file bytes × an expansion factor —
    the ``_paths_bytes`` pattern) pass it so the dataset never has to
    be MATERIALIZED just to expose metadata — at 100 TB that
    materialize is a corpus-sized object-store/spill round-trip paid
    purely to pick an integer."""
    if bytes_hint is not None:
        return min(4096, max(floor, int(bytes_hint // bytes_per_bucket)))
    try:
        # Ray private internals (verified on 2.49.x): a Ray upgrade that
        # moves the accessor must NOT silently pin every caller at the
        # floor — log once so the lost scale behavior is observable.
        n = ds._logical_plan.dag.infer_metadata().size_bytes
        if n is None:
            return floor
        return min(4096, max(floor, int(n // bytes_per_bucket)))
    except Exception:
        global _SCALED_BUCKETS_WARNED
        if not _SCALED_BUCKETS_WARNED:
            _SCALED_BUCKETS_WARNED = True
            import logging

            logging.getLogger(__name__).warning(
                "_scaled_buckets: plan-metadata probe failed (Ray %s "
                "moved _logical_plan.dag.infer_metadata?); falling back "
                "to floor=%d buckets — bucket counts will no longer "
                "scale with data size",
                getattr(__import__("ray"), "__version__", "?"), floor,
            )
        return floor


def _paths_bytes(source) -> int:
    """On-disk bytes of a file/dir/list — the cheap input-footprint
    estimate behind every ``bytes_hint`` (same shape as
    ``pipelines.extraction._paths_bytes``)."""
    import os

    total = 0
    for path in [source] if isinstance(source, str) else source:
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        elif os.path.exists(path):
            total += os.path.getsize(path)
    return total


def _join_parallelism(requested: int) -> int:
    """Hash-join partition count capped at cluster CPUs: the join's
    aggregator pool reserves a slot per partition, and asking for more
    partitions than CPUs deadlocks the streaming executor on a small
    cluster (measured: 32 partitions on 8 CPUs hang; 8 run).  On a big
    cluster `requested` wins — partitions should track DATA, not CPUs.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(2, min(requested, cpus))


#: keys at or below this broadcast as a driver-held set / sorted array;
#: above it the driver never holds the keys (bloom + exact verify join).
#: 1M int64 keys ≈ 8 MB — comfortably an object-store broadcast; a
#: 50%-duplicate web crawl blows far past it and takes the bloom path.
BROADCAST_KEY_LIMIT = 1_000_000


def _key64(vals: pd.Series) -> np.ndarray:
    """int64 bloom key for any column: ints pass through, everything
    else goes through deterministic siphash (stable across processes)."""
    arr = vals.to_numpy()
    if arr.dtype.kind in "iu":
        return arr.astype(np.int64)
    return pd.util.hash_array(vals.to_numpy(dtype=object)).view(np.int64)


def membership_flag(
    ds: Dataset,
    col: str,
    keys_ds: Dataset,
    key_col: str,
    *,
    limit: int | None = None,
    num_partitions: int = 8,
) -> Dataset:
    """Add a bool ``_in_set`` column: ``ds[col] ∈ keys_ds[key_col]`` — exact.

    The scale switch of VERDICT r2 #4: a small key set broadcasts once
    (sorted numpy for ints, set for strings — zero-copy / cached per
    worker); above ``limit`` the driver NEVER holds the keys — a
    fixed-size bloom filter broadcasts instead (no false negatives, so
    unflagged rows are definitively out), and the bloom-flagged rows go
    through an exact partitioned hash join that removes the false
    positives.  ``keys_ds`` is materialized here (it is read twice on
    the bloom path); callers should pass a duplicate-bounded key set.
    """
    import ray
    limit = BROADCAST_KEY_LIMIT if limit is None else limit
    keys_ds = keys_ds.materialize()
    n = keys_ds.count()
    if n == 0:
        return ds.map_batches(
            lambda b: b.assign(_in_set=np.zeros(len(b), dtype=bool)),
            batch_format="pandas",
        )
    if n <= limit:
        kdf = keys_ds.to_pandas()
        # drop null keys BEFORE the dtype/width probe: np.sort(...,
        # dtype=str) would stringify NaN/None into the literal 'nan' /
        # 'None', which a probe value equal to those strings would then
        # false-positively match (null ∈ set is False in every engine)
        vals = kdf[key_col].dropna()
        if len(vals) == 0:
            return ds.map_batches(
                lambda b: b.assign(_in_set=np.zeros(len(b), dtype=bool)),
                batch_format="pandas",
            )
        if vals.to_numpy().dtype.kind in "iu":
            keys = np.sort(vals.to_numpy(np.int64))
            kref = ray.put(keys)

            def flag(b: pd.DataFrame) -> pd.DataFrame:
                k = ray.get(kref)
                ids = b[col].to_numpy(np.int64)
                pos = np.minimum(np.searchsorted(k, ids), len(k) - 1)
                return b.assign(_in_set=(k[pos] == ids) if len(ids) else
                                np.zeros(0, dtype=bool))
        elif len(vals) and vals.map(lambda v: len(v) if isinstance(v, str) else 0).max() <= 256:
            # sorted fixed-width unicode array: buffer-backed, so the
            # plasma read is zero-copy per worker — a broadcast SET
            # re-unpickles every string on every ray.get (CLAUDE.md
            # broadcast rule).  Width-capped: '<U' pads to the longest
            # key, so pathological long keys fall through to the set.
            keys = np.sort(vals.to_numpy(dtype=str))
            kref = ray.put(keys)

            def flag(b: pd.DataFrame) -> pd.DataFrame:
                k = ray.get(kref)
                vals_b = b[col]
                if not len(vals_b):
                    return b.assign(_in_set=np.zeros(0, dtype=bool))
                na = vals_b.isna().to_numpy()
                ids = vals_b.fillna("").to_numpy(dtype=str)
                pos = np.minimum(np.searchsorted(k, ids), len(k) - 1)
                return b.assign(_in_set=(k[pos] == ids) & ~na)
        else:
            kref = ray.put(set(vals))

            def flag(b: pd.DataFrame) -> pd.DataFrame:
                k = ray.get(kref)
                return b.assign(_in_set=b[col].isin(k).to_numpy())

        return ds.map_batches(flag, batch_format="pandas")

    # bloom path: fixed-size filter broadcast + exact verify join
    from ocr_poc_ray.functions.sketches import bloom_build, bloom_contains

    m_bits = 1 << max(20, int(np.ceil(np.log2(max(n, 2) * 16))))
    keys64 = keys_ds.map_batches(
        lambda b: pd.DataFrame({"k64": _key64(b[key_col])}), batch_format="pandas"
    )
    words = bloom_build(keys64, "k64", m_bits=m_bits)
    wref = ray.put(words)

    def bloom_flag(b: pd.DataFrame) -> pd.DataFrame:
        w = ray.get(wref)
        return b.assign(_maybe=bloom_contains(w, _key64(b[col])))

    # NOT materialized: the clean/maybe branches re-execute the flag
    # pass, but it is value-based (deterministic per row — immune to
    # the batch-slicing branch hazard, CLAUDE.md) and recomputing a
    # cheap bloom probe twice beats pinning a corpus-sized input in
    # the object store; callers pin their own expensive upstreams.
    flagged = ds.map_batches(bloom_flag, batch_format="pandas")
    clean = flagged.map_batches(
        lambda b: b[~b["_maybe"]].drop(columns=["_maybe"]).assign(
            _in_set=np.zeros(int((~b["_maybe"]).sum()), dtype=bool)
        ),
        batch_format="pandas",
    )
    maybe = flagged.map_batches(
        lambda b: b[b["_maybe"]].drop(columns=["_maybe"]), batch_format="pandas"
    )
    marks = keys_ds.map_batches(
        lambda b: pd.DataFrame(
            {"_msk_key": b[key_col], "_mk": np.ones(len(b), dtype=np.int8)}
        ),
        batch_format="pandas",
    )
    # joins reject 0-row blocks (CLAUDE.md): repartition both inputs
    jp = _join_parallelism(num_partitions)
    joined = maybe.repartition(jp).join(
        marks.repartition(jp),
        "left_outer",
        num_partitions=jp,
        on=(col,),
        right_on=("_msk_key",),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(_in_set=b["_mk"].notna().to_numpy())
        return b.drop(columns=[c for c in ("_mk", "_msk_key") if c in b.columns])

    return clean.union(joined.map_batches(finish, batch_format="pandas"))


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_dedup(ds: Dataset, *, id_col: str = "doc_id", text_col: str = "text") -> Dataset:
    """Keep the min-`id_col` row per identical `text_col` value.

    Returns the surviving (id, hash) pairs; join back to the full table
    if the payload is needed (keeps the shuffle narrow — hash+id only).

    Shape: a grouped pass over EVERY hash would pay per-group overhead
    for mostly-unique content, so the duplicate hashes are found first
    with the partial-count pattern (vectorized per batch, one combine of
    the per-batch distincts); unique-hash rows are their own winners and
    pass straight through, and only the (duplicate-bounded) hot rows go
    through a min-combine.  Exact at any duplication rate; the hot set
    is bounded by the true duplicate count — the quantity dedup exists
    to remove.
    """

    def hash_batch(batch: pa.Table) -> pa.Table:
        # Arrow in/out: the md5 loop needs Python strings either way,
        # but nothing else of the corpus batch gets copied to pandas.
        import pyarrow.compute as pc

        texts = pc.fill_null(batch[text_col], "").to_pylist()
        return pa.table(
            {
                id_col: batch[id_col],
                "content_hash": pa.array(
                    [hashlib.md5(t.encode("utf-8", "ignore")).hexdigest() for t in texts],
                    pa.string(),
                ),
            }
        )

    # pinned: three branches read this (counts, uniques, dup-mins);
    # unpinned they would each re-hash the corpus
    hashed = ds.map_batches(hash_batch, batch_format="pyarrow").materialize()

    # duplicate hashes + their min-id winners in ONE bounded pass: per
    # batch, (hash → count, min id) partials (corpus-sized for a mostly-
    # unique corpus, so NEVER collected raw to the driver); a bounded
    # bucket groupby (data-scaled count — never one per hash) combines
    # them and emits only the TRUE duplicates with their winners — the
    # quantity dedup exists to remove, small by construction.
    _N_BUCKETS = _scaled_buckets(hashed)

    def partial_stats(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("content_hash", as_index=False).agg(
            size=(id_col, "size"), win=(id_col, "min")
        )
        g["bucket"] = (
            pd.util.hash_array(g["content_hash"].to_numpy(dtype=object)) % _N_BUCKETS
        ).astype("int64")
        return g

    def find_dup_winners(group: pd.DataFrame) -> pd.DataFrame:
        t = group.groupby("content_hash", as_index=False).agg(
            size=("size", "sum"), win=("win", "min")
        )
        return t.loc[t["size"] > 1, ["content_hash", "win"]]

    # SMALL-PROJECTION FAST PATH (same gate as _filter_hot_buckets):
    # below _DRIVER_COMBINE_LIMIT rows the bounded distributed combine
    # is pure stage latency — collect the per-batch (hash, size, min)
    # partials and combine in pandas; semantics identical.  Gated on
    # BROADCAST_KEY_LIMIT too so the bloom-path equality tests (which
    # monkeypatch the limit to 0) still run the distributed discovery.
    if hashed.count() <= min(_DRIVER_COMBINE_LIMIT, BROADCAST_KEY_LIMIT):
        import ray.data as _rd

        parts = hashed.map_batches(partial_stats, batch_format="pandas").to_pandas()
        if parts.empty:  # 0-row to_pandas drops columns (CLAUDE.md)
            return hashed
        t = parts.groupby("content_hash", as_index=False).agg(
            size=("size", "sum"), win=("win", "min")
        )
        dups_df = t.loc[t["size"] > 1, ["content_hash", "win"]].reset_index(drop=True)
        if dups_df.empty:
            return hashed
        dups_ds = _rd.from_pandas(dups_df)
    else:
        dups_ds = (
            hashed.map_batches(partial_stats, batch_format="pandas")
            .groupby("bucket")
            .map_groups(find_dup_winners, batch_format="pandas")
            .materialize()
        )
        # a fully-unique corpus yields zero rows here
        if dups_ds.count() == 0:
            return hashed

    # dup-hash membership: broadcast when small, bloom semi-join when the
    # duplicate volume is web-crawl-sized (the driver never holds the set)
    flagged = membership_flag(hashed, "content_hash", dups_ds, "content_hash")
    uniques = flagged.map_batches(
        lambda b: b.loc[~b["_in_set"], [id_col, "content_hash"]],
        batch_format="pandas",
    )
    winners = dups_ds.map_batches(
        lambda b: pd.DataFrame(
            {id_col: b["win"].astype("int64"), "content_hash": b["content_hash"]}
        ),
        batch_format="pandas",
    )
    return uniques.union(winners)


# --------------------------------------------------------------------------
# Hot-bucket pre-filter shared by the LSH families
# --------------------------------------------------------------------------


def _filter_hot_buckets(
    exploded: Dataset, key_cols: list[str]
) -> tuple[Dataset | None, pd.DataFrame]:
    """Keep only rows whose bucket key appears more than once.

    Most LSH buckets are singletons; a per-group Python call for each
    would dominate wall time (measured 55 s vs 0.2 s on 80 k buckets),
    and collecting the per-batch partial counts to the driver would be
    O(corpus × bands) rows.  So: vectorized partial counts per batch,
    summed inside a BOUNDED hash-bucket groupby (32 groups — never one
    per LSH bucket), with only the colliding keys — the near-duplicate
    signal itself, small by construction — reaching the driver for the
    broadcast filter.  Returns ``(filtered, hot_sizes)`` where
    ``hot_sizes`` has ``key_cols + ["size"]`` for every colliding key
    (callers use the sizes to sub-salt oversized buckets), or
    ``(None, empty)`` when no bucket collides at all.

    Scale switch: up to ``BROADCAST_KEY_LIMIT`` colliding keys the hot
    set broadcasts (sorted mixed-key array, zero-copy searchsorted per
    batch) and ``hot_sizes`` is a driver DataFrame; above it — a
    50 %-dup crawl has a corpus-ordered hot set — membership runs
    through the bloom + exact-join switch, ``hot_sizes`` stays a
    DATASET, and the salting/meta-bucket consumers join/aggregate it
    distributed (the driver never holds a key on that path).
    """
    import ray

    # meta-bucket count scales with DATA (64 MB of partial rows per
    # bucket, floor 32): a fixed 32 would hand each combine task 1/32
    # of a token-volume projection at 100 TB.  Callers pass `exploded`
    # materialized, so size_bytes() is metadata.
    _N_META_BUCKETS = _scaled_buckets(exploded)

    def partial_counts(batch: pa.Table) -> pa.Table:
        # Arrow hash-count over the corpus×bands projection (measured
        # 2× pandas groupby.size at 2M-row batches: 264 vs 536 ms);
        # the meta-bucket mix stays pd.util.hash_array on the (already
        # collapsed) group keys so bucket assignment is unchanged.
        g = batch.group_by(key_cols).aggregate([([], "count_all")])
        g = g.rename_columns(key_cols + ["size"])
        mix = pd.util.hash_array(g[key_cols[0]].to_numpy(zero_copy_only=False))
        for c in key_cols[1:]:
            mix = mix ^ pd.util.hash_array(g[c].to_numpy(zero_copy_only=False))
        return g.append_column(
            "_mb", pa.array((mix % _N_META_BUCKETS).astype(np.int64))
        )

    def find_hot(group: pd.DataFrame) -> pd.DataFrame:
        t = group.groupby(key_cols, as_index=False)["size"].sum()
        return t.loc[t["size"] > 1, key_cols + ["size"]]

    # SMALL-PROJECTION FAST PATH: when the whole exploded projection is
    # driver-trivial, the bounded distributed combine is pure stage
    # overhead (measured 1.7 s of scheduler latency for 40 k rows / 303
    # hot keys at sf0.1 — it was the dominant cost of the dHash pair
    # path).  Collect the per-batch partials (≤ exploded rows) and
    # combine in pandas; semantics identical.  Gated on
    # BROADCAST_KEY_LIMIT too, so monkeypatching the limit to 0 still
    # forces the crawl-scale branch in the equality tests.
    n_rows = exploded.count()  # metadata: callers pass it materialized
    if n_rows <= min(_DRIVER_COMBINE_LIMIT, BROADCAST_KEY_LIMIT):
        parts = (
            exploded.select_columns(key_cols)
            .map_batches(partial_counts, batch_format="pyarrow")
            .to_pandas()
        )
        if parts.empty:  # 0-row to_pandas drops columns (CLAUDE.md)
            return None, pd.DataFrame(columns=key_cols + ["size"])
        t = parts.groupby(key_cols, as_index=False)["size"].sum()
        hot_df = t.loc[t["size"] > 1, key_cols + ["size"]].reset_index(drop=True)
        if hot_df.empty:
            return None, pd.DataFrame(columns=key_cols + ["size"])
        return _broadcast_hot_filter(exploded, key_cols, hot_df), hot_df

    hot_ds = (
        exploded.select_columns(key_cols)
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("_mb")
        .map_groups(find_hot, batch_format="pandas")
        .materialize()
    )
    n_hot = hot_ds.count()
    if n_hot == 0:
        return None, pd.DataFrame(columns=key_cols + ["size"])

    if n_hot > BROADCAST_KEY_LIMIT:
        # Crawl-scale duplicate volume (a 50 %-dup web crawl has a
        # corpus-ordered hot set): the driver NEVER holds the keys.
        # Membership goes through membership_flag's bloom + exact-join
        # switch on a mixed int key, and the sizes stay a DATASET that
        # ``_salt_oversized`` joins on and ``_salted_row_count``
        # aggregates.  A mixed-key collision only admits an extra row
        # (pair kernels segment on the real key columns).
        def add_hk(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(_hk=_mixed_int_key(b, key_cols).view(np.int64))

        # distinct _hk: two HOT keys colliding to one mixed key would
        # otherwise put duplicate rows into membership_flag's verify
        # join and REPLICATE exploded rows (self/duplicate pairs) —
        # bounded hash-bucket distinct, same shape as _distinct_pairs
        def _hk_local(b: pd.DataFrame) -> pd.DataFrame:
            g = b[["_hk"]].drop_duplicates()
            return g.assign(_kb=(g["_hk"].to_numpy().view(np.uint64)
                                 % np.uint64(256)).astype("int64"))

        keys_only = (
            hot_ds.map_batches(add_hk, batch_format="pandas")
            .map_batches(_hk_local, batch_format="pandas")
            .groupby("_kb")
            .map_groups(
                lambda g: g[["_hk"]].drop_duplicates(), batch_format="pandas"
            )
        )
        flagged = membership_flag(
            exploded.map_batches(add_hk, batch_format="pandas"), "_hk", keys_only, "_hk"
        )
        filtered = flagged.map_batches(
            lambda b: b[b["_in_set"]].drop(columns=["_in_set", "_hk"]),
            batch_format="pandas",
        )
        # MATERIALIZE at the branch boundary: left lazy, the bloom
        # verify join would fuse into ONE streaming plan with the
        # downstream salting joins + pair-grid sorts, and that
        # mega-plan intermittently LIVELOCKS Ray 2.49's streaming
        # executor (measured at 1M docs / 20% dups: 2 of 4 runs
        # stalled >10 min at ~1 busy core in the Join+Union stage;
        # with the plan split here, 5/5 runs complete in ~80 s).  The
        # cost is one object-store round trip of the HOT projection —
        # dup-volume-sized, the data the later sorts must move anyway.
        return filtered.materialize(), hot_ds

    hot_df = hot_ds.to_pandas()
    return _broadcast_hot_filter(exploded, key_cols, hot_df), hot_df


#: above this many exploded rows the hot-key combine runs distributed;
#: below it the per-batch partials collect to the driver (bounded by the
#: row count itself) — the distributed combine's ~1-2 s of stage latency
#: dominated small-corpus LSH queries (measured: 1.7 s for 40 k rows)
_DRIVER_COMBINE_LIMIT = 2_000_000


def _broadcast_hot_filter(
    exploded: Dataset, key_cols: list[str], hot_df: pd.DataFrame
) -> Dataset:
    """Filter ``exploded`` to rows whose key is in the driver-held hot
    set (broadcast once via ``ray.put``)."""
    import ray

    all_int = all(hot_df[c].dtype.kind in "iu" for c in key_cols)
    if all_int:
        # integer key(s): sorted uint64 (mixed) key array + searchsorted
        # — vectorized and zero-copy, where a broadcast set of tuples
        # costs a Python loop per row.  For multi-column keys the mixed
        # hash can collide (~n²/2⁶⁴): a collision only ADMITS an extra
        # row past this pre-filter — the pair kernels segment on the
        # real key columns, so correctness is unaffected.
        keys_arr = np.sort(_mixed_int_key(hot_df, key_cols))
        hot_ref = ray.put(keys_arr)

        def only_hot(batch: pd.DataFrame) -> pd.DataFrame:
            k = ray.get(hot_ref)
            ids = _mixed_int_key(batch, key_cols)
            if not len(ids):
                return batch
            pos = np.minimum(np.searchsorted(k, ids), len(k) - 1)
            return batch[k[pos] == ids]
    else:
        hot = set(map(tuple, hot_df[key_cols].itertuples(index=False, name=None)))
        hot_ref = ray.put(hot)

        def only_hot(batch: pd.DataFrame) -> pd.DataFrame:
            h = ray.get(hot_ref)
            mask = [key in h for key in zip(*(batch[c] for c in key_cols))]
            return batch[pd.Series(mask, index=batch.index)]

    return exploded.map_batches(only_hot, batch_format="pandas")


def _mixed_int_key(df: pd.DataFrame, key_cols: list[str]) -> np.ndarray:
    """uint64 key per row: the raw value for one integer column, a
    hash mix for several (order-sensitive multiplicative mix)."""
    if len(key_cols) == 1:
        arr = df[key_cols[0]].to_numpy()
        return arr.view(np.uint64) if arr.dtype.itemsize == 8 else arr.astype(np.uint64)
    mix = pd.util.hash_array(df[key_cols[0]].to_numpy())
    with np.errstate(over="ignore"):
        for c in key_cols[1:]:
            mix = mix * np.uint64(0x9E3779B97F4A7C15) + pd.util.hash_array(
                df[c].to_numpy()
            )
    return mix


#: per-task side bound for the grid cells a hot LSH bucket is salted into
_BUCKET_CHUNK = 512


def _salt_oversized(
    exploded: Dataset,
    key_cols: list[str],
    hot_sizes: pd.DataFrame,
    chunk_target: int = _BUCKET_CHUNK,
) -> Dataset:
    """Spread every oversized LSH bucket over a k×k chunk grid so ALL
    its pairs are found with bounded per-task memory (no silent cap).

    Each doc in a bucket of size s > ``chunk_target`` gets a
    deterministic chunk ``hash(doc_id) % k`` (k = ceil(s/chunk_target))
    and is replicated into the k grid cells its chunk participates in,
    adding ``(_ci, _cj, _chunk)`` columns; the pair kernel then runs per
    ``key_cols + (_ci, _cj)`` group — within-chunk pairs on the diagonal
    cells, cross-chunk pairs off-diagonal — so each unordered doc pair
    appears in exactly ONE cell.  A giant duplicate cluster costs
    k(k+1)/2 bounded tasks instead of dropping pairs (pair output is
    inherently quadratic in cluster size; the grid distributes it).
    Docs in normal-size buckets pass through with a single (0, 0) cell.

    ``hot_sizes`` may be the crawl-scale hot-keys DATASET (see
    ``_filter_hot_buckets``): the oversized subset's (mixed key → k)
    then attaches via a partitioned left join instead of a broadcast —
    the driver never holds any hot keys.
    """
    import logging

    import ray

    if isinstance(hot_sizes, Dataset):
        return _salt_oversized_distributed(exploded, key_cols, hot_sizes, chunk_target)

    big = hot_sizes[hot_sizes["size"] > chunk_target] if len(hot_sizes) else hot_sizes
    if big is None or big.empty:
        return exploded.map_batches(
            lambda b: b.assign(_ci=np.int64(0), _cj=np.int64(0), _chunk=np.int64(0)),
            batch_format="pandas",
        )

    logging.getLogger(__name__).info(
        "salting %d oversized LSH buckets (max size %d) into chunk grids",
        len(big), int(big["size"].max()),
    )
    # sorted mixed-key + chunk-count arrays: vectorized searchsorted
    # lookup per batch (a dict of tuples costs a Python loop per row).
    # A mixed-key collision can only RAISE a bucket's k (spreading it
    # over more grid cells than needed) — never drop pairs.
    big_keys = _mixed_int_key(big, key_cols)
    order = np.argsort(big_keys)
    big_keys = big_keys[order]
    big_ks = np.ceil(big["size"].to_numpy()[order] / chunk_target).astype(np.int64)
    kref = ray.put((big_keys, big_ks))

    def add_cells(batch: pd.DataFrame) -> pd.DataFrame:
        keys_sorted, ks_sorted = ray.get(kref)
        ids = _mixed_int_key(batch, key_cols)
        pos = np.minimum(np.searchsorted(keys_sorted, ids), len(keys_sorted) - 1)
        ks = np.where(keys_sorted[pos] == ids, ks_sorted[pos], 1).astype(np.int64)
        return _cells_from_ks(batch, ks)

    return exploded.map_batches(add_cells, batch_format="pandas")


def _cells_from_ks(batch: pd.DataFrame, ks: np.ndarray) -> pd.DataFrame:
    """Replicate each row into the k grid cells its chunk participates
    in (shared by the broadcast and join salting paths)."""
    if (ks == 1).all():
        return batch.assign(_ci=np.int64(0), _cj=np.int64(0), _chunk=np.int64(0))
    chunk = (
        pd.util.hash_array(batch["doc_id"].to_numpy()) % ks.astype(np.uint64)
    ).astype(np.int64)
    idx = np.repeat(np.arange(len(batch)), ks)
    out = batch.iloc[idx].reset_index(drop=True)
    c_rep = np.repeat(chunk, ks)
    other = np.concatenate([np.arange(k, dtype=np.int64) for k in ks])
    out["_ci"] = np.minimum(c_rep, other)
    out["_cj"] = np.maximum(c_rep, other)
    out["_chunk"] = c_rep
    return out


def _salt_oversized_distributed(
    exploded: Dataset, key_cols: list[str], hot_ds: Dataset, chunk_target: int
) -> Dataset:
    """Join-based chunk-count attachment for crawl-scale hot sets: the
    oversized buckets' (mixed key → k) rows — deduped to unique keys in
    a bounded hash-bucket combine, keeping the MAX k on a collision,
    which can only widen a grid, never drop pairs — left-join onto the
    exploded rows; keys that don't match default to k=1.  The driver
    never holds a hot key."""
    big = hot_ds.map_batches(
        lambda b: b[b["size"] > chunk_target], batch_format="pandas"
    ).materialize()
    if big.count() == 0:
        return exploded.map_batches(
            lambda b: b.assign(_ci=np.int64(0), _cj=np.int64(0), _chunk=np.int64(0)),
            batch_format="pandas",
        )

    def big_key(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"_hk": _mixed_int_key(b, key_cols).view(np.int64),
             "_kk": np.ceil(
                 b["size"].to_numpy(np.int64) / chunk_target
             ).astype(np.int64)}
        )
        g["_kb"] = (g["_hk"].to_numpy().view(np.uint64) % np.uint64(256)).astype(
            "int64"
        )
        return g

    bigk = (
        big.map_batches(big_key, batch_format="pandas")
        .groupby("_kb")
        .map_groups(
            lambda g: g.groupby("_hk", as_index=False)["_kk"].max(),
            batch_format="pandas",
        )
    )

    def add_hk(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_hk=_mixed_int_key(b, key_cols).view(np.int64))

    jp = _join_parallelism(8)  # joins reject 0-row blocks: repartition both
    joined = (
        exploded.map_batches(add_hk, batch_format="pandas")
        .repartition(jp)
        .join(bigk.repartition(jp), "left_outer", num_partitions=jp, on=("_hk",))
    )

    def add_cells(batch: pd.DataFrame) -> pd.DataFrame:
        if "_kk" in batch.columns:
            ks = batch["_kk"].astype("float64").fillna(1.0).to_numpy(np.int64)
        else:
            ks = np.ones(len(batch), np.int64)
        batch = batch.drop(
            columns=[c for c in ("_hk", "_kk") if c in batch.columns]
        )
        return _cells_from_ks(batch, ks)

    return joined.map_batches(add_cells, batch_format="pandas")


def _distinct_pairs(
    pairs: Dataset, cols: list[str], *, n_buckets: int = 256
) -> Dataset:
    """Exact distinct over candidate-pair rows whose values are
    identical for every duplicate occurrence: local drop_duplicates per
    batch (the combiner), then a BOUNDED hash-bucket groupby finishes
    the distinct — never one Ray group per pair (many-singleton
    groupbys dominate wall time, measured) and never a driver-side
    collect (a web-scale dup set can be billions of pairs; the result
    stays a streamable Dataset).  ``n_buckets`` bounds per-task group
    size (pairs/n_buckets rows each); callers that can bound the pair
    volume upstream should scale it (group-per-bucket overhead is
    trivial up to thousands of buckets)."""
    _B = n_buckets

    def local(b: pd.DataFrame) -> pd.DataFrame:
        g = b.drop_duplicates(cols)
        mix = pd.util.hash_array(g["doc_a"].to_numpy()) ^ pd.util.hash_array(
            g["doc_b"].to_numpy()
        )
        return g.assign(_db=(mix % _B).astype("int64"))

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates(cols)[cols]

    return (
        pairs.map_batches(local, batch_format="pandas")
        .groupby("_db")
        .map_groups(finish, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# Multi-bucket vectorized pair generation (shared by the LSH families)
# --------------------------------------------------------------------------

#: pair rows compared per numpy slab — bounds the per-task transient at
#: ~chunk × num_perm × 8 B (≈128 MB for 64-perm minhash)
_PAIR_CHUNK = 1 << 18

#: per-byte popcount lookup (Hamming distance of XORed 64-bit simhashes)
_POPCOUNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8).reshape(-1, 1), axis=1
).sum(axis=1).astype(np.int64)


def _salted_row_count(hot_sizes, chunk_target: int = _BUCKET_CHUNK) -> int:
    """Exact exploded-row count AFTER `_salt_oversized` replication
    (each doc in a k-chunk bucket lands in k grid cells).  ``hot_sizes``
    is the driver-held DataFrame on the broadcast path (no plan
    metadata, no materialize needed) or the hot-keys Dataset on the
    crawl-scale path (a one-number distributed aggregate)."""
    if hot_sizes is None:
        return 0
    if isinstance(hot_sizes, Dataset):
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            s = b["size"].to_numpy(np.int64)
            k = np.ceil(s / chunk_target).astype(np.int64)
            return pd.DataFrame({"rows": [int((s * k).sum())]})

        total = hot_sizes.map_batches(partial, batch_format="pandas").sum("rows")
        return int(total or 0)
    if hot_sizes.empty:
        return 0
    sizes = hot_sizes["size"].to_numpy()
    ks = np.ceil(sizes / chunk_target).astype(np.int64)
    return int((sizes * ks).sum())


def _pair_meta_buckets(
    exploded_hot: Dataset, key_cols: list[str], n_rows: int, row_bytes: int
) -> Dataset:
    """Assign each bucket row a BOUNDED meta-bucket id `_pb` (hash of
    the full bucket key incl. grid cell, data-scaled count).

    A crawl has millions of small dup buckets, and a map_groups keyed
    on the bucket itself pays Ray's per-group overhead per bucket
    (measured: 55 s at 80 k groups vs 0.2 s bounded).  All rows of a
    bucket share one meta bucket, so each of the O(data/64 MB) group
    tasks can emit pairs for EVERY contained bucket in a few vectorized
    passes (`_grid_pair_indices` + one slab comparison)."""
    nb = max(32, min(4096, (n_rows * row_bytes) // (64 << 20)))

    def add_mb(batch: pd.DataFrame) -> pd.DataFrame:
        mix = pd.util.hash_array(batch[key_cols[0]].to_numpy())
        for c in list(key_cols[1:]) + ["_ci", "_cj"]:
            mix = mix ^ pd.util.hash_array(batch[c].to_numpy())
        return batch.assign(_pb=(mix % nb).astype("int64"))

    return exploded_hot.map_batches(add_mb, batch_format="pandas")


def _grid_pair_indices(
    bucket_keys: list[np.ndarray],
    ci: np.ndarray,
    cj: np.ndarray,
    chunk: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """(iu, ju) row-index pairs for every bucket segment of a frame
    sorted by the bucket key columns: upper-triangle pairs on diagonal
    grid cells, chunk-A × chunk-B cross pairs off-diagonal.  The Python
    loop is per SEGMENT and builds only index arrays (~µs each, vs a
    Ray group round-trip per bucket); callers run the heavy per-pair
    comparison in one chunked numpy pass over the returned indices."""
    n = len(ci)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for arr in list(bucket_keys) + [ci, cj]:
        new[1:] |= arr[1:] != arr[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], n)
    iu_parts: list[np.ndarray] = []
    ju_parts: list[np.ndarray] = []
    for s, e in zip(starts, ends):
        m = e - s
        if m < 2:
            continue
        if ci[s] == cj[s]:
            iu, ju = np.triu_indices(m, k=1)
            iu_parts.append(iu.astype(np.int64) + s)
            ju_parts.append(ju.astype(np.int64) + s)
        else:
            in_a = chunk[s:e] == ci[s]
            a_idx = np.flatnonzero(in_a).astype(np.int64) + s
            b_idx = np.flatnonzero(~in_a).astype(np.int64) + s
            if len(a_idx) and len(b_idx):
                iu_parts.append(np.repeat(a_idx, len(b_idx)))
                ju_parts.append(np.tile(b_idx, len(a_idx)))
    if not iu_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(iu_parts), np.concatenate(ju_parts)


# --------------------------------------------------------------------------
# MinHash-LSH near-dup candidate pairs
# --------------------------------------------------------------------------

_MERSENNE_P = (1 << 61) - 1


class _MinHasher:
    """k-permutation MinHash with fixed seeded parameters (actor state)."""

    def __init__(self, num_perm: int = 64, seed: int = 42, ngram: int = 3):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE_P, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE_P, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.ngram = ngram

    def signatures(self, texts: pd.Series) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix for a whole batch —
        one vectorized token-hash pass, numpy permutation mins per doc."""
        th, offsets = _batch_token_hashes(texts)
        out = np.full((len(texts), self.num_perm), np.uint64(_MERSENNE_P), dtype=np.uint64)
        p = np.uint64(_MERSENNE_P)
        for d in range(len(texts)):
            base = _doc_shingle_hashes(th[offsets[d] : offsets[d + 1]], self.ngram)
            if len(base) == 0:
                continue
            with np.errstate(over="ignore"):
                vals = (self.a[:, None] * (base[None, :] % p) + self.b[:, None]) % p
            out[d] = vals.min(axis=1)
        return out


class _MinHashBands:
    """Batch → exploded (band_id, band_hash, doc_id, signature) rows."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int, seed: int):
        assert num_perm % bands == 0
        self.hasher = _MinHasher(num_perm=num_perm, seed=seed)
        self.id_col, self.text_col = id_col, text_col
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sig = self.hasher.signatures(batch[self.text_col])  # (n, num_perm)
        # band hash: vectorized polynomial over the band's signature
        # values for ALL docs at once (replaced per-band blake2b calls)
        bh = np.zeros((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for b in range(self.bands):
                acc = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
                for k in range(self.rows_per_band):
                    acc = acc * _SHINGLE_MULT + sig[:, b * self.rows_per_band + k]
                bh[:, b] = acc >> np.uint64(1)  # keep in int64 range
        sig_bytes = [s.tobytes() for s in sig]
        ids = batch[self.id_col].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, self.bands),
                "band_id": np.tile(np.arange(self.bands, dtype=np.int64), n),
                "band_hash": bh.reshape(-1).astype(np.int64),
                "signature": [sb for sb in sig_bytes for _ in range(self.bands)],
            }
        )


def minhash_lsh_pairs(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
) -> Dataset:
    """Candidate near-dup pairs with estimated Jaccard ≥ `threshold`.

    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b, deduplicated
    across bands.  Signature travels with the bucket row so the verify
    step happens inside the bucket group — no second corpus pass.
    """
    exploded = ds.map_batches(
        _MinHashBands(id_col, text_col, num_perm, bands, seed),
        batch_format="pandas",
        batch_size=1024,
        concurrency=None,
    ).materialize()  # pinned: the count branch and the pair branch both read it

    exploded_hot, hot_sizes = _filter_hot_buckets(exploded, ["band_id", "band_hash"])
    if exploded_hot is None:
        import ray

        return ray.data.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "est_jaccard": pa.array([], pa.float64())})
        )
    # oversized buckets → k×k chunk grid: every pair found, per-task
    # memory bounded by _BUCKET_CHUNK² signature comparisons
    exploded_hot = _salt_oversized(exploded_hot, ["band_id", "band_hash"], hot_sizes)

    num_perm_ = num_perm
    _empty = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64"),
         "est_jaccard": pd.Series([], dtype="float64")}
    )

    def grouped_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """All pairs of EVERY bucket in this meta-group: one sort, one
        segment-index build, one chunked signature comparison — no
        per-bucket Ray group, no per-bucket pandas call."""
        if len(group) < 2:
            return _empty
        g = group.sort_values(["band_id", "band_hash", "_ci", "_cj"], kind="mergesort")
        iu, ju = _grid_pair_indices(
            [g["band_id"].to_numpy(), g["band_hash"].to_numpy()],
            g["_ci"].to_numpy(), g["_cj"].to_numpy(), g["_chunk"].to_numpy(),
        )
        if not len(iu):
            return _empty
        sigs = np.frombuffer(b"".join(g["signature"]), dtype=np.uint64).reshape(
            len(g), num_perm_
        )
        ids = g["doc_id"].to_numpy()
        out_a, out_b, out_e = [], [], []
        for s in range(0, len(iu), _PAIR_CHUNK):
            i, j = iu[s : s + _PAIR_CHUNK], ju[s : s + _PAIR_CHUNK]
            est = (sigs[i] == sigs[j]).mean(axis=1)
            keep = est >= threshold
            a, b = ids[i[keep]], ids[j[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_e.append(est[keep])
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a),
             "doc_b": np.concatenate(out_b),
             "est_jaccard": np.concatenate(out_e)}
        )

    # signature travels with the row: ~num_perm×8 B + key/grid columns
    meta = _pair_meta_buckets(
        exploded_hot, ["band_id", "band_hash"],
        _salted_row_count(hot_sizes), num_perm * 8 + 128,
    )
    pairs = meta.groupby("_pb").map_groups(grouped_pairs, batch_format="pandas")
    # distinct across bands: a pair's estimate is computed from the full
    # signatures, so every occurrence is identical → pure distinct.
    # materialize (distributed blocks, output-sized) so the empty case
    # can fall back to a typed Dataset without re-running the pipeline.
    out = _distinct_pairs(pairs, ["doc_a", "doc_b", "est_jaccard"]).materialize()
    if out.count() == 0:
        import ray

        return ray.data.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "est_jaccard": pa.array([], pa.float64())})
        )
    return out


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------


class _SimHasher:
    _SHIFTS = np.arange(64, dtype=np.uint64)
    _POWERS = np.left_shift(np.uint64(1), _SHIFTS)

    def __init__(self, id_col: str, text_col: str):
        self.id_col, self.text_col = id_col, text_col

    @classmethod
    def simhash_batch(cls, texts: pd.Series) -> np.ndarray:
        """(n_docs,) uint64 simhash signatures — vectorized token
        hashing for the whole batch, numpy bit-vote per doc."""
        th, offsets = _batch_token_hashes(texts)
        sigs = np.zeros(len(texts), dtype=np.uint64)
        for d in range(len(texts)):
            u = np.unique(th[offsets[d] : offsets[d + 1]])  # distinct tokens
            if len(u) == 0:
                continue
            bits = (u[:, None] >> cls._SHIFTS[None, :]) & np.uint64(1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            sigs[d] = ((votes > 0) * cls._POWERS).sum(dtype=np.uint64)
        return sigs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sig = self.simhash_batch(batch[self.text_col])
        ids = batch[self.id_col].to_numpy()
        bands = np.arange(4, dtype=np.uint64)  # 4×16-bit bands → Hamming ≤ 3
        keys = (sig[:, None] >> (np.uint64(16) * bands[None, :])) & np.uint64(0xFFFF)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, 4),
                "band_id": np.tile(bands.astype(np.int64), n),
                "band_key": keys.reshape(-1).astype(np.int64),
                # stored as sig - 2^63 to stay in int64 (Arrow-friendly)
                "simhash": np.repeat(
                    (sig ^ np.uint64(1 << 63)).view(np.int64), 4
                ),
            }
        )


def simhash_pairs(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> Dataset:
    """Near-dup pairs with Hamming(simhash) ≤ `max_hamming` (doc_a < doc_b)."""
    exploded = ds.map_batches(
        _SimHasher(id_col, text_col), batch_format="pandas"
    ).materialize()  # pinned: count branch + pair branch
    exploded, hot_sizes = _filter_hot_buckets(exploded, ["band_id", "band_key"])
    if exploded is None:
        import ray

        return ray.data.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
        )
    # oversized buckets → chunk grid (all pairs, bounded per-task memory)
    exploded = _salt_oversized(exploded, ["band_id", "band_key"], hot_sizes)

    _empty = pd.DataFrame(
        {"doc_a": pd.Series([], dtype="int64"),
         "doc_b": pd.Series([], dtype="int64"),
         "hamming": pd.Series([], dtype="int64")}
    )

    def grouped_pairs(group: pd.DataFrame) -> pd.DataFrame:
        """Pairs of every bucket in the meta-group: segment indices from
        one sort, Hamming distances via a byte-popcount LUT over the
        XORed signatures — all buckets in a handful of numpy passes."""
        if len(group) < 2:
            return _empty
        g = group.sort_values(["band_id", "band_key", "_ci", "_cj"], kind="mergesort")
        iu, ju = _grid_pair_indices(
            [g["band_id"].to_numpy(), g["band_key"].to_numpy()],
            g["_ci"].to_numpy(), g["_cj"].to_numpy(), g["_chunk"].to_numpy(),
        )
        if not len(iu):
            return _empty
        ids = g["doc_id"].to_numpy()
        # stored value is sig - 2^63; XOR of the top bit restores sig bits
        u = g["simhash"].to_numpy().astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
        out_a, out_b, out_h = [], [], []
        for s in range(0, len(iu), _PAIR_CHUNK):
            i, j = iu[s : s + _PAIR_CHUNK], ju[s : s + _PAIR_CHUNK]
            xor = u[i] ^ u[j]
            ham = _POPCOUNT8[xor.view(np.uint8).reshape(-1, 8)].sum(axis=1)
            keep = ham <= max_hamming
            a, b = ids[i[keep]], ids[j[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_h.append(ham[keep])
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a),
             "doc_b": np.concatenate(out_b),
             "hamming": np.concatenate(out_h).astype(np.int64)}
        )

    meta = _pair_meta_buckets(
        exploded, ["band_id", "band_key"], _salted_row_count(hot_sizes), 64
    )
    pairs = meta.groupby("_pb").map_groups(grouped_pairs, batch_format="pandas")
    # Hamming distance is a property of the pair, identical in every
    # band that surfaces it → pure distinct.
    out = _distinct_pairs(pairs, ["doc_a", "doc_b", "hamming"]).materialize()
    if out.count() == 0:
        import ray

        return ray.data.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "hamming": pa.array([], pa.int64())})
        )
    return out


# --------------------------------------------------------------------------
# Exact n-gram Jaccard verification for candidate pairs
# --------------------------------------------------------------------------


def ngram_jaccard_verify(
    pairs: Dataset,
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    num_partitions: int = 8,
) -> Dataset:
    """Exact Jaccard for (doc_a, doc_b) candidate pairs — distributed.

    The candidate ID set (pair-output-sized, ids only — never texts)
    pre-filters the corpus down to candidate rows through
    ``membership_flag`` (broadcast when small, bloom semi-join + exact
    verify join at scale — the driver never holds the candidate set);
    candidate rows are shingled ONCE each, and the packed sorted
    shingle hashes are attached to the pair rows with two partitioned
    hash joins on doc id, the per-pair kernel being a vectorized
    sorted-array intersection.  No driver-side text materialization at
    any point; size ``num_partitions`` to the verified-pair volume at
    scale.
    """
    import ray

    pairs_mat = pairs.materialize()
    n_pairs = pairs_mat.count()
    if n_pairs == 0:
        return pairs_mat.map_batches(
            lambda b: b.assign(jaccard=pd.Series([], dtype="float64")),
            batch_format="pandas",
        )

    if n_pairs <= BROADCAST_KEY_LIMIT:
        # small candidate volume: one driver pass over the (ids-only)
        # pair projection + a broadcast sorted array — pair-output-
        # sized driver state, cheaper than a distinct shuffle here
        need: set = set()
        for b in pairs_mat.select_columns(["doc_a", "doc_b"]).iter_batches(
            batch_format="pandas"
        ):
            need.update(b["doc_a"])
            need.update(b["doc_b"])
        ids_arr = np.sort(np.fromiter(need, dtype=np.int64, count=len(need)))
        ids_ref = ray.put(ids_arr)

        def flag_small(b: pd.DataFrame) -> pd.DataFrame:
            k = ray.get(ids_ref)
            ids = b[id_col].to_numpy(np.int64)
            pos = np.minimum(np.searchsorted(k, ids), len(k) - 1)
            return b.assign(_in_set=(k[pos] == ids))

        flagged = docs.select_columns([id_col, text_col]).map_batches(
            flag_small, batch_format="pandas"
        )
    else:
        # web-scale pair volume: distinct candidate ids as a DATASET
        # (bounded-bucket distinct — duplicate keys would multiply rows
        # through the semi-join's mark join and the two shingle joins),
        # then the bloom semi-join; the driver never holds the set.
        # Bucket count scales with the (materialized) pair volume —
        # this branch only runs above 1 M pairs.
        _KB = _scaled_buckets(pairs_mat)

        def local_ids(b: pd.DataFrame) -> pd.DataFrame:
            u = pd.unique(
                np.concatenate(
                    [b["doc_a"].to_numpy(np.int64), b["doc_b"].to_numpy(np.int64)]
                )
            )
            return pd.DataFrame({"_cid": u, "_kb": (u % _KB).astype(np.int64)})

        def finish_ids(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"_cid": pd.unique(g["_cid"].to_numpy(np.int64))})

        ids_ds = (
            pairs_mat.select_columns(["doc_a", "doc_b"])
            .map_batches(local_ids, batch_format="pandas")
            .groupby("_kb")
            .map_groups(finish_ids, batch_format="pandas")
        )

        flagged = membership_flag(
            docs.select_columns([id_col, text_col]), id_col, ids_ds, "_cid",
            num_partitions=num_partitions,
        )

    def pack(batch: pd.DataFrame) -> pa.Table:
        # Arrow output with explicit types: an empty pandas block would
        # type its columns as null and break the hash join's schema
        # unify.  Shingle ONCE per candidate doc, ship packed sorted
        # uint64 hashes through the joins — a doc appears in ~pairs/doc
        # joined rows, and re-shingling its text per PAIR was the
        # verify hot spot (measured ~55 µs/pair string sets vs
        # ~5 µs/pair packed intersections at sf0.1)
        sub = batch[batch["_in_set"]]
        texts = sub[text_col].fillna("")
        th, offsets = _batch_token_hashes(texts)
        packed = [
            _doc_shingle_hashes(th[offsets[d] : offsets[d + 1]], ngram).tobytes()
            for d in range(len(texts))
        ]
        return pa.table(
            {"_jid": pa.array(sub[id_col].to_numpy(np.int64), pa.int64()),
             "_jsh": pa.array(packed, pa.binary())}
        )

    # repartition merges away 0-row blocks — Ray's hash join (2.49)
    # raises FieldRef errors when an input block is empty.  materialize:
    # this dataset feeds BOTH joins, and a lazy branch would re-run the
    # corpus scan + per-doc shingling once per side (CLAUDE.md pitfall).
    # join width capped at cluster CPUs — more partitions than CPUs
    # deadlocks the streaming executor (CLAUDE.md, measured).
    jp = _join_parallelism(num_partitions)
    cand_texts = flagged.map_batches(pack, batch_format="pandas").repartition(
        jp
    ).materialize()

    # SMALL-CANDIDATE FAST PATH: with a bounded packed-shingle
    # projection (size_bytes() is metadata on the materialized
    # dataset), the two hash joins are pure exchange-stage latency —
    # broadcast the sorted (id → packed shingles) arrays once and
    # attach + verify in ONE pass over the pair rows.  Semantics match
    # the inner joins exactly (pairs with a dangling doc id drop).
    # Gated on BROADCAST_KEY_LIMIT so the limit-0 monkeypatch tests
    # still force the join dataflow.
    if (
        n_pairs <= BROADCAST_KEY_LIMIT
        and cand_texts.size_bytes() <= _VERIFY_BROADCAST_BYTES
    ):
        cd = cand_texts.to_pandas()
        if cd.empty:  # 0-row to_pandas drops columns: every pair dangles
            return pairs_mat.limit(0).map_batches(
                lambda b: b.assign(jaccard=pd.Series([], dtype="float64")),
                batch_format="pandas",
            )
        order = np.argsort(cd["_jid"].to_numpy(np.int64), kind="mergesort")
        jids = cd["_jid"].to_numpy(np.int64)[order]
        blobs = cd["_jsh"].to_numpy(object)[order]
        blob_ref = ray.put((jids, blobs))

        def attach_verify(batch: pd.DataFrame) -> pd.DataFrame:
            k, bl = ray.get(blob_ref)
            a = batch["doc_a"].to_numpy(np.int64)
            b = batch["doc_b"].to_numpy(np.int64)
            pa_ = np.minimum(np.searchsorted(k, a), len(k) - 1)
            pb_ = np.minimum(np.searchsorted(k, b), len(k) - 1)
            keep = (k[pa_] == a) & (k[pb_] == b)  # inner-join semantics
            batch = batch[keep]
            pa_, pb_ = pa_[keep], pb_[keep]
            jac = _jaccard_from_blobs(bl[pa_], bl[pb_])
            out = batch.copy()
            out["jaccard"] = jac
            return out

        return pairs_mat.map_batches(attach_verify, batch_format="pandas")

    j1 = pairs_mat.join(
        cand_texts, "inner", num_partitions=jp,
        on=("doc_a",), right_on=("_jid",),
    ).map_batches(
        # the join consumes the right key column (_jid); only the
        # packed shingles survive
        lambda b: b.rename(columns={"_jsh": "_sh_a"}),
        batch_format="pandas",
    ).repartition(jp)
    j2 = j1.join(
        cand_texts, "inner", num_partitions=jp,
        on=("doc_b",), right_on=("_jid",),
    ).map_batches(
        lambda b: b.rename(columns={"_jsh": "_sh_b"}),
        batch_format="pandas",
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        jac = _jaccard_from_blobs(
            batch["_sh_a"].to_numpy(object), batch["_sh_b"].to_numpy(object)
        )
        out = batch.drop(columns=["_sh_a", "_sh_b"]).copy()
        out["jaccard"] = jac
        return out

    return j2.map_batches(verify, batch_format="pandas")


#: packed-shingle projection size below which ngram_jaccard_verify
#: broadcasts the candidate blobs instead of running two hash joins
#: (the joins are ~2 s of exchange-stage latency at toy pair volumes;
#: 256 MB is one object-store copy per node on a real cluster)
_VERIFY_BROADCAST_BYTES = 256 << 20


def _jaccard_from_blobs(blobs_a: np.ndarray, blobs_b: np.ndarray) -> np.ndarray:
    """Exact Jaccard per (packed sorted-unique uint64 shingle blob)
    pair — the shared verify kernel of the broadcast and join paths."""
    n = len(blobs_a)
    jac = np.zeros(n, dtype=np.float64)
    for i in range(n):
        a = np.frombuffer(blobs_a[i], dtype=np.uint64)
        b = np.frombuffer(blobs_b[i], dtype=np.uint64)
        if len(a) > len(b):
            a, b = b, a
        if len(b):
            # both sorted-unique (np.unique contract): count hits
            idx = np.searchsorted(b, a)
            idx[idx == len(b)] = 0
            inter = int((b[idx] == a).sum())
            union = len(a) + len(b) - inter
            jac[i] = inter / union if union else 0.0
    return jac


# --------------------------------------------------------------------------
# Exact all-pairs n-gram Jaccard similarity join (blocked pair-grid)
# --------------------------------------------------------------------------


def _pack_shingles(batch: pd.DataFrame, id_col: str, text_col: str, ngram: int) -> pd.DataFrame:
    """One row per doc: sorted distinct shingle hashes packed as bytes."""
    th, offsets = _batch_token_hashes(batch[text_col])
    sh_bytes, counts = [], []
    for d in range(len(batch)):
        sh = _doc_shingle_hashes(th[offsets[d] : offsets[d + 1]], ngram)
        sh_bytes.append(np.sort(sh).tobytes())
        counts.append(len(sh))
    return pd.DataFrame(
        {"ids_": batch[id_col], "sh": sh_bytes, "n_sh": np.asarray(counts, dtype=np.int64)}
    )


def _unpack_shingles(t) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(ids, flat_hashes, doc_index_per_hash, shingle_counts)."""
    ids = np.asarray(t["ids_"].to_pandas())
    shl = [np.frombuffer(b, dtype=np.uint64) for b in t["sh"].to_pylist()]
    lens = np.asarray([len(x) for x in shl], dtype=np.int64)
    flat = np.concatenate(shl) if shl else np.array([], dtype=np.uint64)
    return ids, flat, np.repeat(np.arange(len(shl)), lens), lens


def ngram_jaccard_pairs(
    ds: Dataset,
    *,
    threshold: float = 0.5,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_rows: int = 2048,
    score: str = "jaccard",
) -> Dataset:
    """EXACT all-pairs word-n-gram similarity join:
    (id_a, id_b, <score>) with score ≥ threshold and id_a < id_b.

    ``score="jaccard"`` divides the shared-shingle count by the union
    size; ``score="containment"`` divides by the SMALLER set (Broder's
    max-containment — the quote/subset detector: a short doc fully
    embedded in a long one scores 1.0 where its Jaccard is tiny).

    The no-LSH exact counterpart of ``minhash_lsh_pairs`` (DuckDB-
    oracle-verifiable), using the blocked pair-grid shape from
    ``similarity.embedding_near_dup_pairs``: each Ray task holds TWO
    row-chunks and counts shared shingles with one vectorized pandas
    hash-merge (never a per-pair Python loop).  Quadratic work is
    inherent to exact all-pairs — use the MinHash path at corpus scale.
    """
    import ray
    import ray.data as rd

    if score not in ("jaccard", "containment"):
        raise ValueError(f"unknown score {score!r}")
    score_col = score

    packed = ds.map_batches(
        lambda b: _pack_shingles(b, id_col, text_col, ngram), batch_format="pandas"
    ).materialize()
    n = packed.count()
    if n == 0:
        return rd.from_arrow(
            pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      score_col: pa.array([], pa.float64())})
        )
    n_chunks = max(1, -(-n // chunk_rows))
    blocks = packed.repartition(n_chunks).to_arrow_refs()

    @ray.remote
    def pair_block(ta, tb, same: bool) -> pd.DataFrame:
        ids_a, fa, da, la = _unpack_shingles(ta)
        if same:
            order = np.argsort(ids_a, kind="mergesort")
            rank = np.empty_like(order)
            rank[order] = np.arange(len(order))
            ids_a, la = ids_a[order], la[order]
            da = rank[da]  # doc indices now in id order → ia < ib ⇒ id_a < id_b
            ids_b, fb, db, lb = ids_a, fa, da, la
        else:
            ids_b, fb, db, lb = _unpack_shingles(tb)
        if len(fa) == 0 or len(fb) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], score_col: []})
        nb = len(ids_b)
        m = pd.DataFrame({"h": fa, "ia": da}).merge(
            pd.DataFrame({"h": fb, "ib": db}), on="h"
        )
        # shingles are distinct within a doc → one merge row per
        # (pair, shared shingle); pair intersection = key multiplicity
        key = m["ia"].to_numpy() * nb + m["ib"].to_numpy()
        uniq, inter = np.unique(key, return_counts=True)
        ia, ib = uniq // nb, uniq % nb
        if same:
            keep = ia < ib  # drop self pairs + mirrored duplicates
            ia, ib, inter = ia[keep], ib[keep], inter[keep]
        if score_col == "containment":
            denom = np.minimum(la[ia], lb[ib])
        else:
            denom = la[ia] + lb[ib] - inter  # union
        jac = inter / denom
        keep = jac >= threshold
        a0, b0 = ids_a[ia[keep]], ids_b[ib[keep]]
        if not same:
            swap = a0 > b0
            a0, b0 = np.where(swap, b0, a0), np.where(swap, a0, b0)
        return pd.DataFrame(
            {"id_a": a0, "id_b": b0, score_col: np.round(jac[keep], 6)}
        )

    refs = [
        pair_block.remote(blocks[i], blocks[j] if j != i else blocks[i], i == j)
        for i in range(len(blocks))
        for j in range(i, len(blocks))
    ]
    out = rd.from_pandas_refs(refs).materialize()
    if out.count() == 0:
        # all-empty pandas blocks lose their schema; an Arrow table
        # keeps its types at zero rows
        return rd.from_arrow(
            pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 score_col: pa.array([], pa.float64())}
            )
        )
    return out


def ngram_containment_pairs(ds, **kw):
    """Max-containment similarity join: inter / min(|A|, |B|) — the
    quote/subset detector (a contained document scores 1.0 regardless of
    the length gap).  Same pair-grid as ``ngram_jaccard_pairs``."""
    return ngram_jaccard_pairs(ds, score="containment", **kw)


# --------------------------------------------------------------------------
# Prefix-filtered exact similarity join (PPJoin-style candidates)
# --------------------------------------------------------------------------

#: common-shingle set bounds: a shingle enters the demoted set when its
#: (batch-pruned) document frequency reaches _PREFIX_MIN_DF; the set is
#: capped at _PREFIX_CAP highest-DF entries (≈16 MB broadcast worst case)
_PREFIX_MIN_DF = 4
_PREFIX_CAP = 1 << 20


def _common_shingle_ranks(
    ds: Dataset,
    *,
    text_col: str,
    ngram: int,
    min_df: int = _PREFIX_MIN_DF,
    cap: int = _PREFIX_CAP,
) -> tuple[np.ndarray, np.ndarray]:
    """(hash_sorted_common, df_rank) for the high-document-frequency
    shingles — the bounded-vocabulary combine of the ``top_tokens``
    machinery: per-batch partial DFs (per-doc-distinct shingles, so
    counts are document frequencies) pruned to the batch's REPEATED
    shingles (batch-df ≥ 2 — singletons can never make a hot bucket),
    summed inside 32 hash buckets, kept at global df ≥ ``min_df`` and
    capped per bucket.  The pruning makes the set approximate on its
    low-DF fringe; the truly hot shingles — the only ones demotion
    needs — are repeated in every batch and always surface.
    Correctness never depends on WHICH shingles are in the set, only on
    the order being fixed for the whole run, which the single broadcast
    guarantees.  ``df_rank`` is ascending (rank 0 = least frequent of
    the common set), aligned with ``hash_sorted_common``.
    """
    _B = 32
    per_bucket = max(1, cap // _B)

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        th, offsets = _batch_token_hashes(batch[text_col])
        hs = [
            _doc_shingle_hashes(th[offsets[d] : offsets[d + 1]], ngram)
            for d in range(len(batch))
        ]
        hs = [h for h in hs if len(h)]
        if not hs:
            return pd.DataFrame(
                {"h": pd.Series([], dtype="int64"),
                 "df": pd.Series([], dtype="int64"),
                 "_b": pd.Series([], dtype="int64")}
            )
        flat = np.concatenate(hs)  # per-doc distinct → counts are DFs
        u, c = np.unique(flat, return_counts=True)
        rep = c >= 2  # batch-repeated only: bounds every later stage
        u, c = u[rep], c[rep]
        return pd.DataFrame(
            {"h": u.view(np.int64), "df": c.astype(np.int64),
             "_b": (u % np.uint64(_B)).astype(np.int64)}
        )

    def hot_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("h", as_index=False)["df"].sum()
        t = t[t["df"] >= min_df]
        if len(t) > per_bucket:
            t = t.nlargest(per_bucket, "df")
        return t[["h", "df"]]

    df = (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("_b")
        .map_groups(hot_bucket, batch_format="pandas")
        .to_pandas()
    )
    if df.empty or "h" not in df.columns:
        return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
    # ascending-DF rank (hash tiebreak keeps the order total)
    top = df.sort_values(["df", "h"], kind="mergesort").reset_index(drop=True)
    hashes = top["h"].to_numpy(np.int64).view(np.uint64)
    ranks = np.arange(len(top), dtype=np.int64)
    order = np.argsort(hashes)
    return hashes[order], ranks[order]


def ngram_jaccard_pairs_prefix(
    ds: Dataset,
    *,
    threshold: float = 0.5,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
) -> Dataset:
    """EXACT (id_a, id_b, jaccard ≥ threshold) similarity join via
    prefix filtering — the near-linear candidate path that replaces
    ``ngram_jaccard_pairs``'s quadratic pair-grid when near-duplicates
    are sparse (cf. SSJoin/PPJoin prefix-filtering principle: under any
    fixed total order of shingles, two sets with overlap ≥ α must share
    an element within their first ``len - α + 1`` shingles, and
    Jaccard ≥ t ⇒ overlap ≥ ceil(t·len) for each side).

    Shape: one pass emits each doc's prefix shingles (a (hash, id)
    projection — ~(1-t)·|shingles| rows per doc, never the text); the
    hot-bucket pre-filter keeps only shingles seen twice (singleton
    prefixes are the overwhelming majority); per-bucket all-pairs emit
    candidates; a bounded-bucket distinct dedups across shingles; the
    exact Jaccard is attached by ``ngram_jaccard_verify``'s distributed
    text joins.

    The global shingle order is ASCENDING DOCUMENT FREQUENCY (the
    PPJoin/SSJoin production order): shingles outside the broadcast
    top-64k common set sort first by raw hash, the common set sorts
    after them by ascending DF rank — one fixed total order shared by
    every doc, so correctness is unchanged, while prefixes now consist
    of each doc's RAREST shingles and the corpus-hot shingles (the
    quadratic prefix buckets) only enter a prefix when a doc has
    nothing rarer.
    """
    import ray
    import ray.data as rd

    t = float(threshold)

    common_h, common_rank = _common_shingle_ranks(ds, text_col=text_col, ngram=ngram)
    common_ref = ray.put((common_h, common_rank))

    def explode_prefix(batch: pd.DataFrame) -> pd.DataFrame:
        ch, cr = ray.get(common_ref)
        th, offsets = _batch_token_hashes(batch[text_col])
        ids = batch[id_col].to_numpy()
        out_ps, out_id, out_m, out_pos = [], [], [], []
        for d in range(len(batch)):
            sh = _doc_shingle_hashes(th[offsets[d] : offsets[d + 1]], ngram)
            m = len(sh)
            if m == 0:
                continue
            plen = m - int(np.ceil(t * m)) + 1
            # total order: rare (primary 0, hash tiebreak) before common
            # (primary 1 + ascending DF rank; ranks unique → no ties)
            if len(ch):
                pos = np.minimum(np.searchsorted(ch, sh), len(ch) - 1)
                is_common = ch[pos] == sh
                primary = np.where(is_common, 1 + cr[pos], 0)
            else:
                primary = np.zeros(m, dtype=np.int64)
            order = np.lexsort((sh, primary))
            out_ps.append(sh[order[:plen]])
            out_id.append(np.full(plen, ids[d], dtype=np.int64))
            out_m.append(np.full(plen, m, dtype=np.int64))
            out_pos.append(np.arange(plen, dtype=np.int64))
        if not out_ps:
            return pd.DataFrame(
                {"ps": pd.Series([], dtype="int64"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "m": pd.Series([], dtype="int64"),
                 "pos": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"ps": np.concatenate(out_ps).view(np.int64),
             "doc_id": np.concatenate(out_id),
             "m": np.concatenate(out_m),
             "pos": np.concatenate(out_pos)}
        )

    empty = pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )
    exploded = ds.map_batches(explode_prefix, batch_format="pandas").materialize()
    hot, _ps_sizes = _filter_hot_buckets(exploded, ["ps"])
    if hot is None:
        return rd.from_arrow(empty)

    # pairs are generated inside BOUNDED meta-buckets (ps % 32), one
    # vectorized self-merge per meta-bucket — never one Ray group per
    # hot shingle (the many-group map_groups pitfall, CLAUDE.md)
    _MB = 32

    def add_mb(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_mb=(b["ps"].to_numpy() % _MB).astype("int64"))

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["ps", "doc_id"])[["ps", "doc_id", "m", "pos"]]
        mm = g.merge(g, on="ps", suffixes=("_a", "_b"))
        mm = mm[mm["doc_id_a"] < mm["doc_id_b"]]
        # PPJoin length filter (exact, no false negatives): Jaccard ≥ t
        # implies |smaller| ≥ t·|larger| — prunes incompatible-length
        # candidates before the verify joins ever see them
        ma = mm["m_a"].to_numpy(np.float64)
        mb = mm["m_b"].to_numpy(np.float64)
        ok = np.minimum(ma, mb) >= t * np.maximum(ma, mb)
        # PPJoin positional filter (exact): Jaccard ≥ t needs overlap
        # ≥ t·(ma+mb)/(1+t), and a pair sharing a prefix shingle at
        # (DF-order) positions pa/pb can still reach at most
        # min(ma-pa, mb-pb) overlap; per-occurrence pruning is safe —
        # the earliest shared occurrence carries the loosest bound, so
        # a qualifying pair always survives through it
        pa = mm["pos_a"].to_numpy(np.float64)
        pb = mm["pos_b"].to_numpy(np.float64)
        ubound = np.minimum(ma - pa, mb - pb)
        ok &= ubound + 1e-9 >= t * (ma + mb) / (1.0 + t)
        mm = mm[ok]
        return pd.DataFrame(
            {"doc_a": mm["doc_id_a"].to_numpy(),
             "doc_b": mm["doc_id_b"].to_numpy()}
        )

    cand = (
        hot.map_batches(add_mb, batch_format="pandas")
        .groupby("_mb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    cand = _distinct_pairs(cand, ["doc_a", "doc_b"]).repartition(
        num_partitions
    ).materialize()
    if cand.count() == 0:
        return rd.from_arrow(empty)
    verified = ngram_jaccard_verify(
        cand, ds, id_col=id_col, text_col=text_col, ngram=ngram,
        num_partitions=num_partitions,
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["jaccard"] >= t]
        return pd.DataFrame(
            {"id_a": b["doc_a"].astype("int64"),
             "id_b": b["doc_b"].astype("int64"),
             "jaccard": b["jaccard"].round(6)}
        )

    out = verified.map_batches(finish, batch_format="pandas").materialize()
    if out.count() == 0:
        return rd.from_arrow(empty)
    return out


# --------------------------------------------------------------------------
# Connected components over candidate pairs.
#
# Candidate pairs are the OUTPUT of the LSH passes — orders of
# magnitude smaller than the corpus (they are the near-duplicates
# themselves), and already collected once by the distinct step.  A
# path-compressed union-find over that output-sized edge list is exact
# and effectively linear; running grouped min-label-propagation rounds
# through the Ray scheduler here would pay per-group overhead per node
# per round for no added scalability (the edge list either fits one
# machine or LSH thresholds need raising).  For a corpus-scale graph
# (edges >> memory) substitute iterative hash-partitioned min-label
# joins — the same dataflow as _filter_hot_buckets' scale path.
# --------------------------------------------------------------------------


def connected_components(pairs: Dataset) -> Dataset:
    """(doc_id, component) from (doc_a, doc_b) pairs; component = min id."""
    import ray.data as rd

    edges = pairs.select_columns(["doc_a", "doc_b"]).to_pandas()

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-id root convention

    nodes = sorted(set(edges["doc_a"]) | set(edges["doc_b"]))
    out = pd.DataFrame(
        {"doc_id": nodes, "component": [find(n) for n in nodes]}
    )
    return rd.from_pandas(out)


def connected_components_auto(
    pairs: Dataset, *, limit: int = BROADCAST_KEY_LIMIT, num_buckets: int = 32
) -> Dataset:
    """Size-switched components: the union-find for output-sized edge
    lists (≤ ``limit`` pairs — effectively linear, no per-round Ray
    stages), the hash-partitioned min-label dataflow above it.  Both
    paths emit identical exact (doc_id, component=min id) labels, so
    callers — including DuckDB-oracle-checked queries — can switch on
    size alone.  The same shape as ``membership_flag``'s broadcast ↔
    bloom switch: pay the driver path only while the data provably
    fits it."""
    pairs = pairs.materialize()  # counted, then read by either path
    if pairs.count() <= limit:
        return connected_components(pairs)
    return connected_components_distributed(pairs, num_buckets=num_buckets)


def connected_components_distributed(
    pairs: Dataset, *, num_buckets: int = 32, max_rounds: int = 64
) -> Dataset:
    """(doc_id, component=min id) via hash-partitioned min-label
    propagation — the corpus-scale dataflow the driver union-find's
    docstring promises (edges >> one machine's memory).

    Each round: every edge sends its endpoints' current labels to the
    opposite endpoint, and each node takes the min over its own label
    and the received ones — a bucketed co-group (``num_buckets`` groups,
    never one per node).  Converges in O(component diameter) rounds;
    the only driver-side value per round is one scalar checksum.
    """
    import ray.data as rd

    def to_directed(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"src": batch["doc_a"], "dst": batch["doc_b"]})
        rev = pd.DataFrame({"src": batch["doc_b"], "dst": batch["doc_a"]})
        return pd.concat([fwd, rev], ignore_index=True)

    # repartition before the per-round join: Ray 2.49 Dataset.join
    # raises ArrowInvalid ("No match ... FieldRef") when an input has
    # 0-row blocks (CLAUDE.md pitfall) — merging blocks removes them.
    edges = pairs.select_columns(["doc_a", "doc_b"]).map_batches(
        to_directed, batch_format="pandas"
    ).repartition(num_buckets).materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())})
        )

    def init_labels(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.drop_duplicates("src")
        return pd.DataFrame({"node": g["src"], "label": g["src"]})

    def dedup_min(ds_labels: Dataset) -> Dataset:
        def bucketed(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(bucket=(pd.util.hash_array(b["node"].to_numpy()) %
                                    num_buckets).astype("int64"))

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", as_index=False)["label"].min()

        return (
            ds_labels.map_batches(bucketed, batch_format="pandas")
            .groupby("bucket")
            .map_groups(combine, batch_format="pandas")
        )

    labels = dedup_min(edges.map_batches(init_labels, batch_format="pandas")).materialize()

    def checksum(ds_labels: Dataset) -> int:
        # labels only ever decrease → the sum strictly decreases while
        # anything still propagates; equal sums ⇒ fixpoint
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"s": [int(b["label"].sum())]})

        parts = ds_labels.map_batches(partial, batch_format="pandas").to_pandas()
        return int(parts["s"].sum())

    prev = checksum(labels)
    for _ in range(max_rounds):
        # messages: for edge (src,dst), dst receives label(src)
        msgs = edges.join(
            labels.map_batches(
                lambda b: b.rename(columns={"node": "src", "label": "src_label"}),
                batch_format="pandas",
            ).repartition(num_buckets),
            "inner",
            num_partitions=num_buckets,
            on=("src",),
        ).map_batches(
            lambda b: pd.DataFrame({"node": b["dst"], "label": b["src_label"]}),
            batch_format="pandas",
        ).repartition(num_buckets)
        labels = dedup_min(labels.union(msgs)).materialize()
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur

    return labels.map_batches(
        lambda b: pd.DataFrame({"doc_id": b["node"], "component": b["label"]}),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Exact repeated-substring removal (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): any `window`-token
# sequence occurring ≥2 times anywhere in the corpus (across OR within
# documents) is a duplicated substring; every occurrence except the
# global first — min (doc_id, pos) — is masked, masked windows' token
# ranges union per doc, and each document is rebuilt from its unmasked
# tokens.  The suffix-array of the paper becomes, in Ray Data terms, a
# linear overlapping-window hash projection (stride 1): corpus-token-
# volume rows of (window_hash, packed doc/pos key), the hot-window
# filter (df ≥ 2, the same bounded-bucket discovery every dedup op
# here uses), a bounded-bucket loser selection, and a row-local rebuild
# keyed by (doc, pos) ranges — broadcast when the loser volume is
# small, per-doc blobs through partitioned joins at crawl scale.
# ---------------------------------------------------------------------------

_SUBSTR_POS_BITS = 32  # packed key = doc_id << 32 | window pos: exact for
# docs up to 2^32 tokens and ids below 2^31 (beyond that, use a
# (doc_id, pos) struct key instead of the packed int64)


def _doc_window_hashes(th: np.ndarray, window: int) -> np.ndarray:
    """uint64 polynomial hash of EVERY `window`-token window (stride 1)
    in positional order — the pre-unique sibling of _doc_shingle_hashes."""
    m = len(th) - window + 1
    if m <= 0:
        return np.array([], dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = np.zeros(m, dtype=np.uint64)
        for i in range(window):
            acc = acc * _SHINGLE_MULT + th[i : i + m]
    return acc


def substring_dedup(
    ds: Dataset,
    *,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> Dataset:
    """(id, kept_text, n_tokens, n_windows, n_lost, n_masked): documents
    with every non-first occurrence of a repeated `window`-token
    substring removed (whitespace tokens, lowercased for matching,
    original case kept in the rebuilt text)."""
    narrow = ds.select_columns([id_col, text_col])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        th, offsets = _batch_token_hashes(batch[text_col])
        ids = batch[id_col].to_numpy(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= np.int64(1) << (63 - _SUBSTR_POS_BITS)):
            raise ValueError(
                f"substring_dedup: {id_col} must be in [0, 2^"
                f"{63 - _SUBSTR_POS_BITS}) — the packed (doc_id << "
                f"{_SUBSTR_POS_BITS} | pos) winner key would overflow "
                f"int64 and silently corrupt winner selection"
            )
        out_h, out_k = [], []
        for d in range(len(batch)):
            wh = _doc_window_hashes(th[offsets[d] : offsets[d + 1]], window)
            if len(wh) == 0:
                continue
            if len(wh) >= 1 << _SUBSTR_POS_BITS:
                raise ValueError(
                    f"substring_dedup: document {ids[d]} has {len(wh)} "
                    f"windows (≥ 2^{_SUBSTR_POS_BITS}); the packed "
                    "position field would wrap into the doc-id bits"
                )
            out_h.append(wh)
            out_k.append(
                (ids[d] << _SUBSTR_POS_BITS) + np.arange(len(wh), dtype=np.int64)
            )
        if not out_h:
            return pd.DataFrame(
                {"wh": pd.Series([], dtype="int64"),
                 "key": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"wh": np.concatenate(out_h).view(np.int64),
             "key": np.concatenate(out_k)}
        )

    exploded = narrow.map_batches(explode, batch_format="pandas").materialize()
    hot, _sizes = _filter_hot_buckets(exploded, ["wh"])

    def rebuild_with(loser_pos_of_doc):
        """Shared rebuild kernel factory: ``loser_pos_of_doc(doc_id,
        n_windows, blob) -> int64 positions`` supplies each doc's masked
        window starts (``blob`` is the joined per-doc loser bytes on the
        crawl-scale path, None otherwise).  The loop is per DOCUMENT —
        each iteration is numpy range-union + one join over the doc's
        tokens, the same work a vectorized kernel would do per row."""

        def rebuild(batch: pd.DataFrame) -> pd.DataFrame:
            ids_arr = batch[id_col].to_numpy(np.int64)
            token_lists = batch[text_col].fillna("").str.split().tolist()
            blobs = (
                batch["_lose"].tolist()
                if "_lose" in batch.columns
                else [None] * len(batch)
            )
            ids, kept, n_tok, n_win, n_lost, n_masked = [], [], [], [], [], []
            for doc_id, toks, blob in zip(ids_arr, token_lists, blobs):
                doc_id = int(doc_id)
                nt = len(toks)
                nw = max(nt - window + 1, 0)
                pos = loser_pos_of_doc(doc_id, nw, blob)
                if len(pos):
                    delta = np.zeros(nt + 1, dtype=np.int64)
                    np.add.at(delta, pos, 1)
                    np.add.at(delta, np.minimum(pos + window, nt), -1)
                    cover = np.cumsum(delta[:-1]) > 0
                    kept_toks = [t for t, c in zip(toks, cover) if not c]
                    masked = int(cover.sum())
                else:
                    kept_toks, masked = toks, 0
                ids.append(doc_id)
                kept.append(" ".join(kept_toks))
                n_tok.append(nt)
                n_win.append(nw)
                n_lost.append(len(pos))
                n_masked.append(masked)
            return pd.DataFrame(
                {
                    id_col: np.asarray(ids, dtype=np.int64),
                    "kept_text": pd.Series(kept, dtype=object),
                    "n_tokens": np.asarray(n_tok, dtype=np.int64),
                    "n_windows": np.asarray(n_win, dtype=np.int64),
                    "n_lost": np.asarray(n_lost, dtype=np.int64),
                    "n_masked": np.asarray(n_masked, dtype=np.int64),
                }
            )

        return rebuild

    _empty_pos = np.array([], dtype=np.int64)
    if hot is None:  # fully-unique corpus: pure passthrough stats
        return narrow.map_batches(
            rebuild_with(lambda _d, _n, _r: _empty_pos), batch_format="pandas"
        )

    wb = _scaled_buckets(exploded, floor=n_buckets)

    def add_wb(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            _wb=(b["wh"].to_numpy().view(np.uint64) % np.uint64(wb)).astype(
                np.int64
            )
        )

    def losers_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        win = g.groupby("wh")["key"].transform("min")
        return g.loc[g["key"] != win, ["key"]]

    losers_ds = (
        hot.map_batches(add_wb, batch_format="pandas")
        .groupby("_wb")
        .map_groups(losers_in_bucket, batch_format="pandas")
        .materialize()
    )
    n_losers = losers_ds.count()
    import ray as _ray

    if n_losers <= BROADCAST_KEY_LIMIT:
        losers_df = losers_ds.to_pandas()
        keys = (
            np.sort(losers_df["key"].to_numpy(np.int64))
            if len(losers_df)
            else np.empty(0, np.int64)
        )
        ref = _ray.put(keys)

        def pos_small(doc_id: int, _nw: int, _blob) -> np.ndarray:
            lose = _ray.get(ref)
            lo = np.searchsorted(lose, doc_id << _SUBSTR_POS_BITS)
            hi = np.searchsorted(lose, (doc_id + 1) << _SUBSTR_POS_BITS)
            return (lose[lo:hi] - (doc_id << _SUBSTR_POS_BITS)).astype(np.int64)

        return narrow.map_batches(rebuild_with(pos_small), batch_format="pandas")

    # crawl-scale loser volume: pack per-doc loser positions into blobs
    # and LEFT-join them to the docs (the chunk_dedup bloom-path shape;
    # the loser set here is exact already, so no bloom round is needed)
    jp = _join_parallelism(n_buckets)

    def pack_partial(b: pd.DataFrame) -> pd.DataFrame:
        key = b["key"].to_numpy(np.int64)
        doc = key >> _SUBSTR_POS_BITS
        return pd.DataFrame(
            {"_doc": doc, "key": key, "_pb": (doc % n_buckets).astype(np.int64)}
        )

    def pack_docs(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("_doc", sort=False)["key"].apply(
            lambda s: np.sort(s.to_numpy(np.int64)).tobytes()
        )
        return pd.DataFrame(
            {id_col: gg.index.to_numpy(np.int64),
             "_lose": gg.to_numpy(dtype=object)}
        )

    packed = (
        losers_ds.map_batches(pack_partial, batch_format="pandas")
        .groupby("_pb")
        .map_groups(pack_docs, batch_format="pandas")
    )
    joined = narrow.repartition(jp).join(
        packed.repartition(jp), "left_outer", num_partitions=jp, on=(id_col,)
    )

    def pos_blob(doc_id: int, _nw: int, blob) -> np.ndarray:
        if not isinstance(blob, (bytes, bytearray)):
            return _empty_pos
        keys = np.frombuffer(blob, dtype=np.int64)
        return (keys - (doc_id << _SUBSTR_POS_BITS)).astype(np.int64)

    return joined.map_batches(rebuild_with(pos_blob), batch_format="pandas")
# of C4-style curation, expressed over fixed token windows because the
# corpus is single-line).  Every later occurrence of an already-seen
# chunk is dropped; the first occurrence — min (doc_id, chunk_idx) —
# survives, and each document is rebuilt from its surviving chunks.
#
# Scale shape: the all-to-all ships only (chunk_text, encoded_key)
# projections; duplicate-winner discovery is a bucketed groupby whose
# group cardinality is bounded by n_buckets (size n_buckets so one
# bucket's chunks fit a task: ~total_chunk_bytes / 64 MB); the loser
# set — bounded by the TRUE duplicate count, not the corpus — is
# broadcast once as a sorted numpy array, and reassembly is a pure
# row-local second pass over the original docs (chunking is
# deterministic, so re-deriving beats shuffling chunk rows back
# together: no corpus-wide groupby/string-agg ever happens).
# ---------------------------------------------------------------------------

_CHUNK_KEY_BITS = 20  # encoded key = doc_id << 20 | chunk_idx: exact for
# docs up to 2^20 chunks (~8M tokens at chunk_size=8); beyond that use a
# (doc_id, chunk_idx) struct sort key instead of the packed int64


def chunk_dedup(
    ds: Dataset,
    *,
    chunk_size: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> Dataset:
    """(id, kept_text, n_chunks, n_removed): documents with duplicate
    `chunk_size`-token windows removed, first occurrence kept."""
    from ocr_poc_ray.functions.textstats import _chunk_kernel, chunk_tokens

    narrow = ds.select_columns([id_col, text_col])
    # discovery-bucket count tracks the text volume — sized from the
    # CALLER's dataset (a column-pruned parquet read has file-metadata
    # size; the select_columns projection does not, and sizing it would
    # fall back to the floor)
    n_buckets = _scaled_buckets(ds, floor=n_buckets)
    chunks = chunk_tokens(
        narrow, chunk_size=chunk_size, text_col=text_col, id_col=id_col
    )

    def project(b: pd.DataFrame) -> pd.DataFrame:
        key = (
            b[id_col].to_numpy(np.int64) << _CHUNK_KEY_BITS
        ) + b["chunk_idx"].to_numpy(np.int64)
        out = pd.DataFrame({"ct": b["chunk_text"], "key": key})
        out["_hb"] = (
            pd.util.hash_array(out["ct"].to_numpy(dtype=object)) % n_buckets
        ).astype("int64")
        return out

    def losers_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("ct")["key"].transform("size")
        dups = g[sizes > 1]
        winners = dups.groupby("ct")["key"].transform("min")
        return dups.loc[dups["key"] != winners, ["key"]]

    losers_ds = (
        chunks.map_batches(project, batch_format="pandas")
        .groupby("_hb")
        .map_groups(losers_in_bucket, batch_format="pandas")
        .materialize()
    )
    n_losers = losers_ds.count()
    import ray as _ray

    def _chunk_keys(batch: pd.DataFrame):
        tbl = pa.Table.from_pandas(
            batch[[id_col, text_col]], preserve_index=False
        )
        ch = _chunk_kernel(tbl, text_col, id_col, chunk_size).to_pandas()
        key = (
            ch[id_col].to_numpy(np.int64) << _CHUNK_KEY_BITS
        ) + ch["chunk_idx"].to_numpy(np.int64)
        return ch, key

    def _reassemble(
        batch: pd.DataFrame, ch: pd.DataFrame, hit: np.ndarray
    ) -> pd.DataFrame:
        ch["_hit"] = hit
        per_doc = ch.groupby(id_col, sort=False)["_hit"].agg(["size", "sum"])
        kept_text = (
            ch[~hit]
            .groupby(id_col, sort=False)["chunk_text"]
            .agg(" ".join)  # chunk order preserved: kernel emits in order
        )
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(np.int64)})
        out = out.merge(
            kept_text.rename("kept_text"), left_on=id_col, right_index=True, how="left"
        ).merge(per_doc, left_on=id_col, right_index=True, how="left")
        out["kept_text"] = out["kept_text"].fillna("")
        out["n_chunks"] = out["size"].fillna(0).astype("int64")
        out["n_removed"] = out["sum"].fillna(0).astype("int64")
        return out[[id_col, "kept_text", "n_chunks", "n_removed"]]

    if n_losers <= BROADCAST_KEY_LIMIT:
        losers_df = losers_ds.to_pandas()
        loser_keys = (
            np.sort(losers_df["key"].to_numpy(np.int64))
            if len(losers_df)
            else np.empty(0, np.int64)
        )
        ref = _ray.put(loser_keys)

        def rebuild(batch: pd.DataFrame) -> pd.DataFrame:
            lose = _ray.get(ref)
            ch, key = _chunk_keys(batch)
            if len(lose):
                pos = np.minimum(np.searchsorted(lose, key), len(lose) - 1)
                hit = lose[pos] == key
            else:
                hit = np.zeros(len(key), dtype=bool)
            return _reassemble(batch, ch, hit)

        return narrow.map_batches(rebuild, batch_format="pandas")

    # Bloom path (web-crawl duplicate volume): the driver never holds
    # the loser keys.  A fixed-size bloom flags candidate chunks (no
    # false negatives → unflagged chunks definitively survive); an
    # exact join against the loser Dataset removes the bloom's false
    # positives; the verified hits pack into per-doc sorted key blobs
    # that join back to the docs for a row-local rebuild.
    from ocr_poc_ray.functions.sketches import bloom_build, bloom_contains

    m_bits = 1 << max(20, int(np.ceil(np.log2(n_losers * 16))))
    words = bloom_build(losers_ds, "key", m_bits=m_bits)
    wref = _ray.put(words)

    def candidate_keys(batch: pd.DataFrame) -> pd.DataFrame:
        w = _ray.get(wref)
        _, key = _chunk_keys(batch)
        return pd.DataFrame({"key": key[bloom_contains(w, key)]})

    cands = narrow.map_batches(candidate_keys, batch_format="pandas")
    # every loser key exists in the corpus, so hits is exactly the
    # loser set (nonempty here) — the join only strips bloom FPs
    jp = _join_parallelism(n_buckets)
    hits = cands.repartition(jp).join(
        losers_ds.map_batches(
            lambda b: pd.DataFrame({"_lk": b["key"].to_numpy(np.int64)}),
            batch_format="pandas",
        ).repartition(jp),
        "inner",
        num_partitions=jp,
        on=("key",),
        right_on=("_lk",),
    )

    def pack_partial(b: pd.DataFrame) -> pd.DataFrame:
        key = b["key"].to_numpy(np.int64)
        doc = key >> _CHUNK_KEY_BITS
        return pd.DataFrame(
            {"_doc": doc, "key": key, "_pb": (doc % n_buckets).astype(np.int64)}
        )

    def pack_docs(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("_doc", sort=False)["key"].apply(
            lambda s: np.sort(s.to_numpy(np.int64)).tobytes()
        )
        return pd.DataFrame(
            {id_col: gg.index.to_numpy(np.int64),
             "_hits": gg.to_numpy(dtype=object)}
        )

    packed = (
        hits.map_batches(pack_partial, batch_format="pandas")
        .groupby("_pb")
        .map_groups(pack_docs, batch_format="pandas")
    )
    joined = narrow.repartition(jp).join(
        packed.repartition(jp),
        "left_outer",
        num_partitions=jp,
        on=(id_col,),
    )

    def rebuild_blob(batch: pd.DataFrame) -> pd.DataFrame:
        ch, key = _chunk_keys(batch)
        blobs = [
            np.frombuffer(bl, dtype=np.int64)
            for bl in batch["_hits"]
            if isinstance(bl, (bytes, bytearray))
        ]
        if blobs:
            # keys are globally unique → one sorted batch-level array
            lose = np.sort(np.concatenate(blobs))
            pos = np.minimum(np.searchsorted(lose, key), len(lose) - 1)
            hit = lose[pos] == key
        else:
            hit = np.zeros(len(key), dtype=bool)
        return _reassemble(batch, ch, hit)

    return joined.map_batches(rebuild_blob, batch_format="pandas")
