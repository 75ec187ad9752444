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
    """Word n-gram shingles of a lowercased text."""
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


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

    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "content_hash": [
                    hashlib.md5(t.encode("utf-8", "ignore")).hexdigest()
                    for t in batch[text_col].fillna("")
                ],
            }
        )

    # pinned: three branches read this (counts, uniques, dup-mins);
    # unpinned they would each re-hash the corpus
    hashed = ds.map_batches(hash_batch, batch_format="pandas").materialize()

    # duplicate hashes via per-batch partial counts (hash appears twice
    # in one batch OR in two different batches)
    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("content_hash", as_index=False).size()

    partials = hashed.map_batches(partial_counts, batch_format="pandas").to_pandas()
    totals = partials.groupby("content_hash")["size"].sum()
    dup_hashes = set(totals[totals > 1].index)

    if not dup_hashes:
        return hashed

    import ray

    dup_ref = ray.put(dup_hashes)

    def keep_unique(batch: pd.DataFrame) -> pd.DataFrame:
        dup = ray.get(dup_ref)
        return batch[~batch["content_hash"].isin(dup)]

    def partial_min_dups(batch: pd.DataFrame) -> pd.DataFrame:
        dup = ray.get(dup_ref)
        b = batch[batch["content_hash"].isin(dup)]
        return b.groupby("content_hash", as_index=False)[id_col].min()

    uniques = hashed.map_batches(keep_unique, batch_format="pandas")
    dup_partials = hashed.map_batches(partial_min_dups, batch_format="pandas").to_pandas()
    winners = dup_partials.groupby("content_hash", as_index=False)[id_col].min()
    import ray.data as rd

    return uniques.union(rd.from_pandas(winners[[id_col, "content_hash"]]))


# --------------------------------------------------------------------------
# Hot-bucket pre-filter shared by the LSH families
# --------------------------------------------------------------------------


def _filter_hot_buckets(exploded: Dataset, key_cols: list[str]) -> Dataset | None:
    """Keep only rows whose bucket key appears more than once.

    Most LSH buckets are singletons; a per-group Python call for each
    would dominate wall time.  One vectorized count aggregate over the
    narrow key projection finds the collision buckets; the (small) hot
    set is broadcast once and applied as a batch filter.  Returns None
    when no bucket collides at all.
    """
    import ray

    # Partial count per batch (vectorized pandas), tiny partials
    # combined once — NOT a grouped Ray aggregate: with one group per
    # bucket the per-group overhead dwarfs the work (measured 55 s vs
    # 0.2 s on 80 k buckets).  The combined partials are one row per
    # distinct bucket — bounded by the corpus's bucket count, which
    # must stay broadcastable for LSH to work at all; at extreme scale
    # substitute a tree reduce over the partials.
    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(key_cols, as_index=False).size()

    partials = exploded.select_columns(key_cols).map_batches(
        partial_counts, batch_format="pandas"
    ).to_pandas()
    totals = partials.groupby(key_cols)["size"].sum()
    hot_keys = totals[totals > 1].index
    if len(hot_keys) == 0:
        return None
    hot = set(hot_keys)
    hot_ref = ray.put(hot)

    def only_hot(batch: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hot_ref)
        mask = [key in h for key in zip(*(batch[c] for c in key_cols))]
        return batch[pd.Series(mask, index=batch.index)]

    return exploded.map_batches(only_hot, batch_format="pandas")


def _distinct_pairs(pairs: Dataset, cols: list[str]) -> Dataset:
    """Exact distinct over candidate-pair rows whose values are
    identical for every duplicate occurrence: local drop_duplicates per
    batch, then one combine of the (output-sized) survivors.  Candidate
    pairs are the dedup RESULT — orders of magnitude smaller than the
    corpus — so the combine is cheap by construction; a grouped Ray
    aggregate here would pay per-group overhead for every pair
    (measured: many-singleton groupbys dominate wall time)."""
    import ray.data as rd

    local = pairs.map_batches(
        lambda b: b.drop_duplicates(cols), batch_format="pandas"
    ).to_pandas()
    out = local.drop_duplicates(cols).reset_index(drop=True)
    return rd.from_pandas(out)


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

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.ngram)
        if not sh:
            return np.full(self.num_perm, np.uint64(_MERSENNE_P), dtype=np.uint64)
        base = np.array([_stable_hash64(s) for s in sh], dtype=np.uint64)
        # (a*x + b) mod p, per permutation — vectorized (num_perm, n_shingles)
        with np.errstate(over="ignore"):
            vals = (
                self.a[:, None] * (base[None, :] % _MERSENNE_P) + self.b[:, None]
            ) % np.uint64(_MERSENNE_P)
        return vals.min(axis=1)


class _MinHashBands:
    """Batch → exploded (band_id, band_hash, doc_id, signature) rows."""

    def __init__(self, id_col: str, text_col: str, num_perm: int, bands: int, seed: int):
        assert num_perm % bands == 0
        self.hasher = _MinHasher(num_perm=num_perm, seed=seed)
        self.id_col, self.text_col = id_col, text_col
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hashes, sigs = [], [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            sig = self.hasher.signature(text)
            sig_bytes = sig.tobytes()
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(
                    int.from_bytes(
                        hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(), "big"
                    )
                    >> 1  # keep in int64 range
                )
                sigs.append(sig_bytes)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "band_id": band_ids,
                "band_hash": band_hashes,
                "signature": sigs,
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

    exploded_hot = _filter_hot_buckets(exploded, ["band_id", "band_hash"])
    if exploded_hot is None:
        import ray

        return ray.data.from_items(
            [{"doc_a": 0, "doc_b": 0, "est_jaccard": 0.0}]
        ).limit(0)

    num_perm_ = num_perm

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        # bound worst-case hot buckets (salting guidance: SURVEY.md §7.4.3)
        g = group.sort_values("doc_id").head(256)
        sigs = np.vstack([np.frombuffer(s, dtype=np.uint64) for s in g["signature"]])
        ids = list(g["doc_id"])
        # vectorized all-pairs signature overlap: (n, n) fraction matrix
        eq = (sigs[:, None, :] == sigs[None, :, :]).sum(axis=2) / num_perm_
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = eq[iu, ju] >= threshold
        ids_arr = np.asarray(ids)
        return pd.DataFrame(
            {
                "doc_a": ids_arr[iu[keep]],
                "doc_b": ids_arr[ju[keep]],
                "est_jaccard": eq[iu[keep], ju[keep]],
            }
        )

    pairs = exploded_hot.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # distinct across bands: a pair's estimate is computed from the full
    # signatures, so every occurrence is identical → pure distinct.
    return _distinct_pairs(pairs, ["doc_a", "doc_b", "est_jaccard"])


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------


class _SimHasher:
    def __init__(self, id_col: str, text_col: str):
        self.id_col, self.text_col = id_col, text_col

    @staticmethod
    def simhash64(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in set(text.lower().split()):
            h = _stable_hash64(tok)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        sig = 0
        for i in range(64):
            if acc[i] > 0:
                sig |= 1 << i
        return sig

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_id, out_band, out_key, out_sig = [], [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            sig = self.simhash64(text)
            for b in range(4):  # 4×16-bit bands → catches Hamming ≤ 3
                out_id.append(doc_id)
                out_band.append(b)
                out_key.append((sig >> (16 * b)) & 0xFFFF)
                out_sig.append(sig - (1 << 63))  # int64 range
        return pd.DataFrame(
            {"doc_id": out_id, "band_id": out_band, "band_key": out_key, "simhash": out_sig}
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
    exploded = _filter_hot_buckets(exploded, ["band_id", "band_key"])
    if exploded is None:
        import ray

        return ray.data.from_items([{"doc_a": 0, "doc_b": 0, "hamming": 0}]).limit(0)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        g = group.sort_values("doc_id").head(256)
        ids = g["doc_id"].to_numpy()
        # stored value is sig - 2^63; XOR of the top bit restores sig bits
        u = g["simhash"].to_numpy().astype(np.int64).view(np.uint64) ^ np.uint64(1 << 63)
        n = len(ids)
        xor = u[:, None] ^ u[None, :]  # (n, n) uint64
        ham = np.unpackbits(xor.view(np.uint8).reshape(n, n, 8), axis=2).sum(axis=2)
        iu, ju = np.triu_indices(n, k=1)
        keep = ham[iu, ju] <= max_hamming
        return pd.DataFrame(
            {
                "doc_a": ids[iu[keep]],
                "doc_b": ids[ju[keep]],
                "hamming": ham[iu[keep], ju[keep]].astype(np.int64),
            }
        )

    pairs = exploded.groupby(["band_id", "band_key"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # Hamming distance is a property of the pair, identical in every
    # band that surfaces it → pure distinct.
    return _distinct_pairs(pairs, ["doc_a", "doc_b", "hamming"])


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
) -> Dataset:
    """Exact Jaccard for (doc_a, doc_b) candidate pairs.

    Broadcast-joins the candidate docs' texts (candidates are a tiny
    fraction of the corpus — this is the "small side broadcast" rule;
    at extreme scale swap for a partitioned hash join on doc id).
    """
    import ray

    need_ids = set()
    pairs_mat = pairs.materialize()
    for batch in pairs_mat.iter_batches(batch_format="pandas"):
        need_ids.update(batch["doc_a"])
        need_ids.update(batch["doc_b"])
    need_ids_ref = ray.put(need_ids)

    def collect(batch: pd.DataFrame) -> pd.DataFrame:
        need = ray.get(need_ids_ref)
        sub = batch[batch[id_col].isin(need)]
        return pd.DataFrame({id_col: sub[id_col], text_col: sub[text_col]})

    texts: dict = {}
    for batch in docs.map_batches(collect, batch_format="pandas").iter_batches(
        batch_format="pandas"
    ):
        texts.update(zip(batch[id_col], batch[text_col]))
    texts_ref = ray.put(texts)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        tx = ray.get(texts_ref)
        jac = []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            sa, sb = _shingles(tx.get(a, ""), ngram), _shingles(tx.get(b, ""), ngram)
            union = len(sa | sb)
            jac.append(len(sa & sb) / union if union else 0.0)
        batch = batch.copy()
        batch["jaccard"] = jac
        return batch

    return pairs_mat.map_batches(verify, batch_format="pandas")


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
