"""HNSW approximate nearest neighbors (Malkov & Yashunin 2016),
sharded for Ray Data.

The graph algorithm is the published one — geometric level assignment
(mL = 1/ln(M)), greedy descent through the upper layers, an ef-bounded
best-first beam per layer, and neighbor lists pruned back to M by
similarity — implemented clean-room over numpy (gathered-row matmuls
for every distance evaluation; the only Python-level loop is the
inherently sequential insert/beam order that every HNSW
implementation has).

Scale shape: one GLOBAL graph cannot be built distributively, so the
corpus is hash-repartitioned into shards sized for one worker
(``shard_rows``), each shard builds its own graph in parallel (a
one-block ``map_batches`` call — build cost is per-shard, paid once),
the query matrix broadcasts via ``ray.put``, every shard answers every
query from its local graph, and a tiny per-query merge keeps the
global top-k.  This is the standard production layout (per-segment
HNSW + scatter-gather): no all-to-all, recall ≥ single-graph recall
(each shard search is exact over its own candidates), and the merge
is output-sized.  A persisted variant would write one graph file per
shard next to the vectors (cf. ``functions/ann_index.py``'s IVF
layout).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ocr_poc_ray.functions.similarity import _normalize, _to_matrix, _topk_merge_fn

_MAX_LEVEL = 8  # geometric tail above this is vanishingly rare at shard sizes


def _search_layer(
    X: np.ndarray,
    layer: list,
    q: np.ndarray,
    eps: list[int],
    ef: int,
    sims_full: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """ef-bounded best-first beam over one layer (CONSTRUCTION path —
    neighbor lists are still mutating Python lists); returns (ids,
    sims) sorted by similarity descending.  Neighbor distance
    evaluations are one gathered matmul per expanded node, or a pure
    gather when the caller precomputed the whole-shard ``X @ q``."""
    visited = set(eps)
    sims0 = sims_full[eps] if sims_full is not None else X[eps] @ q
    cand = [(-float(s), int(e)) for s, e in zip(sims0, eps)]
    heapq.heapify(cand)
    best = [(float(s), int(e)) for s, e in zip(sims0, eps)]
    heapq.heapify(best)
    while cand:
        neg_s, c = heapq.heappop(cand)
        if len(best) >= ef and -neg_s < best[0][0]:
            break
        nbs = [n for n in layer[c] if n not in visited]
        if not nbs:
            continue
        visited.update(nbs)
        s_arr = sims_full[nbs] if sims_full is not None else X[nbs] @ q
        for s, nb in zip(s_arr, nbs):
            s = float(s)
            if len(best) < ef or s > best[0][0]:
                heapq.heappush(cand, (-s, int(nb)))
                heapq.heappush(best, (s, int(nb)))
                if len(best) > ef:
                    heapq.heappop(best)
    best.sort(key=lambda t: (-t[0], t[1]))
    return (
        np.array([e for _s, e in best], dtype=np.int64),
        np.array([s for s, _e in best], dtype=np.float64),
    )


#: below this shard size the query path precomputes ONE whole-shard
#: matvec (X @ q, BLAS, ~30 µs at 4096×64) instead of a gathered matmul
#: per expanded node (~ef numpy dispatches per query, the measured
#: floor); above it the beam touches ~ef·M rows ≪ n and gathers win
_SIMS_PRECOMPUTE_LIMIT = 16_384


def _search_layer_csr(
    X: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    q: np.ndarray,
    ep: int,
    ef: int,
    visited: np.ndarray,
    stamp: int,
    sims_full: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """QUERY-path twin of ``_search_layer`` over a frozen CSR adjacency:
    numpy neighbor slices, a stamp-versioned visited array (no per-query
    set, no clearing), and a threshold pre-filter before the heap pushes
    (the push condition itself is unchanged, so results are identical to
    the list version — the pre-filter only skips items the inner check
    would reject anyway, since best[0] can only rise).  ``sims_full``
    (the precomputed whole-shard X @ q) turns every per-expansion
    distance evaluation into a pure gather."""
    visited[ep] = stamp
    s0 = float(sims_full[ep]) if sims_full is not None else float(X[ep] @ q)
    cand = [(-s0, ep)]
    best = [(s0, ep)]
    while cand:
        neg_s, c = heapq.heappop(cand)
        if len(best) >= ef and -neg_s < best[0][0]:
            break
        nbs = indices[indptr[c] : indptr[c + 1]]
        nbs = nbs[visited[nbs] != stamp]
        if not len(nbs):
            continue
        visited[nbs] = stamp
        s_arr = sims_full[nbs] if sims_full is not None else X[nbs] @ q
        if len(best) >= ef:
            m = s_arr > best[0][0]
            s_arr, nbs = s_arr[m], nbs[m]
        for s, nb in zip(s_arr.tolist(), nbs.tolist()):
            if len(best) < ef or s > best[0][0]:
                heapq.heappush(cand, (-s, nb))
                heapq.heappush(best, (s, nb))
                if len(best) > ef:
                    heapq.heappop(best)
    best.sort(key=lambda t: (-t[0], t[1]))
    return (
        np.array([e for _s, e in best], dtype=np.int64),
        np.array([s for s, _e in best], dtype=np.float64),
    )


class HnswGraph:
    """In-memory HNSW over L2-normalized rows of ``X`` (cosine = dot)."""

    def __init__(
        self,
        X: np.ndarray,
        *,
        M: int = 8,
        ef_construction: int = 64,
        seed: int = 42,
    ) -> None:
        self.X = np.ascontiguousarray(X, dtype=np.float64)
        self.M = M
        n = len(X)
        rng = np.random.default_rng(seed)
        mL = 1.0 / np.log(M)
        self.levels = np.minimum(
            (-np.log(rng.random(n) + 1e-300) * mL).astype(np.int64), _MAX_LEVEL
        )
        top = int(self.levels.max()) if n else 0
        # layers[l][i]: list of neighbor ids (only meaningful when
        # levels[i] >= l); lists stay tiny (<= M or 2M at level 0)
        self.layers = [[[] for _ in range(n)] for _ in range(top + 1)]
        self.entry = 0
        self.entry_level = int(self.levels[0]) if n else 0
        m_max0 = 2 * M
        # block-precomputed insert similarities: one (n × 512) dgemm per
        # 512 inserts replaces a gathered matmul per expanded node (the
        # measured per-insert numpy-dispatch floor); bounded to ~n×512×8 B
        # transient.  Columns for rows ≥ i exist but the beam only ever
        # visits already-inserted nodes.
        _B = 512
        precompute = 0 < n <= _SIMS_PRECOMPUTE_LIMIT
        Sblock: np.ndarray | None = None
        blk_start = blk_end = 0
        for i in range(1, n):
            li = int(self.levels[i])
            q = self.X[i]
            if precompute:
                if i >= blk_end:
                    blk_start, blk_end = i, min(i + _B, n)
                    Sblock = self.X @ self.X[blk_start:blk_end].T
                sims_i = Sblock[:, i - blk_start]
            else:
                sims_i = None
            ep = self.entry
            for l in range(self.entry_level, li, -1):
                ids, _ = _search_layer(
                    self.X, self.layers[l], q, [ep], 1, sims_i
                )
                ep = int(ids[0])
            for l in range(min(li, self.entry_level), -1, -1):
                ids, _sims = _search_layer(
                    self.X, self.layers[l], q, [ep], ef_construction, sims_i
                )
                sel = ids[:M]
                lay = self.layers[l]
                lay[i] = [int(j) for j in sel]
                cap = m_max0 if l == 0 else M
                for j in sel:
                    nb = lay[j]
                    nb.append(i)
                    if len(nb) > cap:
                        arr = np.asarray(nb, dtype=np.int64)
                        s = self.X[arr] @ self.X[j]
                        keep = arr[np.argsort(-s, kind="stable")[:cap]]
                        lay[j] = [int(x) for x in keep]
                if len(sel):
                    ep = int(sel[0])
            if li > self.entry_level:
                self.entry, self.entry_level = i, li

    def _freeze(self) -> None:
        """Flatten the per-level neighbor lists into CSR (indptr,
        indices) arrays and allocate the stamp-versioned visited buffer
        — the query path never touches a Python list after this."""
        csr = []
        for layer in self.layers:
            lens = np.fromiter(
                (len(x) for x in layer), dtype=np.int64, count=len(layer)
            )
            indptr = np.zeros(len(layer) + 1, dtype=np.int64)
            np.cumsum(lens, out=indptr[1:])
            indices = np.empty(int(indptr[-1]), dtype=np.int64)
            p = 0
            for x in layer:
                ln = len(x)
                if ln:
                    indices[p : p + ln] = x
                    p += ln
            csr.append((indptr, indices))
        self._csr = csr
        self._visited = np.zeros(len(self.X), dtype=np.int64)
        self._stamp = 0

    def search(self, q: np.ndarray, k: int, *, ef: int = 64) -> tuple[np.ndarray, np.ndarray]:
        """(row_indices, cosines) of the approximate top-k for one
        normalized query vector."""
        if not len(self.X):
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        if getattr(self, "_csr", None) is None:
            self._freeze()
        sims_full = (
            self.X @ q if len(self.X) <= _SIMS_PRECOMPUTE_LIMIT else None
        )
        ep = self.entry
        for l in range(self.entry_level, 0, -1):
            self._stamp += 1
            indptr, indices = self._csr[l]
            ids, _ = _search_layer_csr(
                self.X, indptr, indices, q, ep, 1,
                self._visited, self._stamp, sims_full,
            )
            ep = int(ids[0])
        self._stamp += 1
        indptr, indices = self._csr[0]
        ids, sims = _search_layer_csr(
            self.X, indptr, indices, q, ep, max(ef, k),
            self._visited, self._stamp, sims_full,
        )
        return ids[:k], sims[:k]


_EMPTY_SHARD_RESULT = {
    "query_id": pd.Series([], dtype="int64"),
    "neighbor_id": pd.Series([], dtype="int64"),
    "cosine": pd.Series([], dtype="float64"),
}


def _assemble_shard_results(
    g: HnswGraph,
    ids: np.ndarray,
    qids: np.ndarray,
    Q: np.ndarray,
    kk: int,
    ef: int,
    exclude_self: bool,
) -> pd.DataFrame:
    """Run every query against one shard graph and assemble the
    (query_id, neighbor_id, cosine) rows with numpy block writes —
    the beam search is inherently per-query, but the result assembly
    (and the self-hit filter) is vectorized over the whole shard."""
    n_q = Q.shape[0]
    row_parts: list[np.ndarray] = []
    sim_parts: list[np.ndarray] = []
    counts = np.empty(n_q, dtype=np.int64)
    for qi in range(n_q):
        rows, sims = g.search(Q[qi], kk, ef=ef)
        row_parts.append(rows)
        sim_parts.append(sims)
        counts[qi] = len(rows)
    if not counts.sum():
        return pd.DataFrame(_EMPTY_SHARD_RESULT)
    qid_rep = np.repeat(qids, counts)
    nid = ids[np.concatenate(row_parts)]
    sims = np.concatenate(sim_parts)
    if exclude_self:
        keep = nid != qid_rep
        qid_rep, nid, sims = qid_rep[keep], nid[keep], sims[keep]
    return pd.DataFrame(
        {"query_id": qid_rep, "neighbor_id": nid, "cosine": sims}
    )


def knn_hnsw(
    ds: Dataset,
    query_ids: list,
    query_vecs: np.ndarray,
    *,
    k: int = 10,
    M: int = 8,
    ef_construction: int = 64,
    ef_search: int = 64,
    shard_rows: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> Dataset:
    """Sharded HNSW top-k: repartition into worker-sized shards,
    build one graph per shard (parallel, one-time), answer every
    broadcast query per shard, merge per-query partials globally.
    Approximate by design — recall vs ``knn_brute_force`` is asserted
    in tests."""
    n = ds.count()  # parquet metadata only
    num_shards = max(2, -(-n // shard_rows))
    q_mat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    state_ref = ray.put({"ids": np.asarray(query_ids), "mat": q_mat})

    def shard_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:  # repartition pads with empty blocks when n < shards
            return pd.DataFrame(_EMPTY_SHARD_RESULT)
        st = ray.get(state_ref)
        qids, Q = st["ids"], st["mat"]
        ids = batch[id_col].to_numpy()
        X = _normalize(_to_matrix(batch[vec_col]))
        g = HnswGraph(X, M=M, ef_construction=ef_construction, seed=seed)
        # ask for k+1 so a dropped self-hit still leaves k rows
        kk = k + 1 if exclude_self else k
        return _assemble_shard_results(
            g, ids, qids, Q, kk, max(ef_search, kk), exclude_self
        )

    partial = ds.repartition(num_shards).map_batches(
        shard_topk, batch_format="pandas", batch_size=None
    )

    merge = _topk_merge_fn(k)

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# Persisted sharded HNSW: build once / query many — the graph sibling
# of functions/ann_index.py's IVF layout and functions/text_index.py's
# inverted index.  HNSW is scatter-gather (every shard answers every
# query), so unlike IVF the win is not read pruning but BUILD reuse:
# the O(n log n) graph construction is paid once at build time and the
# query path only deserializes (np.frombuffer views, no insertion
# loop).
#
# Layout under ``index_dir``::
#
#     meta.json                  {n_shards, dim, M, ef_construction,
#                                 n_rows, seed, version}
#     shards/*.parquet           one row per shard: (shard_id, n, dim,
#                                 ids, vecs, levels, graph) — binary
#                                 blobs, int64/float64 little-endian
# ---------------------------------------------------------------------------

_HNSW_INDEX_VERSION = 2  # v2: shard_id column, typed empty shards, dim in meta


def _ser_graph(g: HnswGraph) -> bytes:
    """Flat int64 stream: [n, top, entry, entry_level], levels[n], then
    per level l=0..top, per node i: [len, ids...]."""
    n = len(g.X)
    top = len(g.layers) - 1
    parts = [
        np.array([n, top, g.entry, g.entry_level], dtype=np.int64),
        np.asarray(g.levels, dtype=np.int64),
    ]
    for layer in g.layers:
        for nbrs in layer:
            parts.append(np.array([len(nbrs)], dtype=np.int64))
            if nbrs:
                parts.append(np.asarray(nbrs, dtype=np.int64))
    return np.concatenate(parts).tobytes()


def _deser_graph(blob: bytes, X: np.ndarray) -> HnswGraph:
    """Deserialize straight into the frozen CSR form the query path
    uses — the byte format is unchanged ([n, top, entry, entry_level],
    levels[n], then per level per node [len, ids...]); the Python
    list-of-lists intermediate is gone (it was only ever re-flattened
    by the search loop)."""
    a = np.frombuffer(blob, dtype=np.int64)
    n, top, entry, entry_level = (int(a[0]), int(a[1]), int(a[2]), int(a[3]))
    g = HnswGraph.__new__(HnswGraph)
    g.X = X
    g.levels = a[4 : 4 + n].copy()
    g.M = 0  # unused after build
    g.entry, g.entry_level = entry, entry_level
    pos = 4 + n
    csr = []
    al = a.tolist()  # scalar reads from a list are ~10x a numpy scalar read
    for _l in range(top + 1):
        lens = np.empty(n, dtype=np.int64)
        p = pos
        for i in range(n):
            ln = al[p]
            lens[i] = ln
            p += 1 + ln
        indptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=indptr[1:])
        indices = np.empty(int(indptr[-1]), dtype=np.int64)
        p = pos
        for i in range(n):
            ln = lens[i]
            indices[indptr[i] : indptr[i + 1]] = a[p + 1 : p + 1 + ln]
            p += 1 + ln
        csr.append((indptr, indices))
        pos = p
    g.layers = None  # query-only object: adjacency lives in _csr
    g._csr = csr
    g._visited = np.zeros(n, dtype=np.int64)
    g._stamp = 0
    return g


def build_hnsw_index(
    ds: Dataset,
    index_dir: str,
    *,
    M: int = 8,
    ef_construction: int = 64,
    shard_rows: int = 4096,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Build the per-shard graphs in parallel and persist them; returns
    the meta dict.  Vectors are stored L2-normalized (cosine = dot).

    ATOMIC + IDEMPOTENT: shards and meta.json are written into a
    sibling temp directory which is os.rename'd into place only after
    meta.json exists — a crashed build leaves no half-generation under
    ``index_dir``, a rebuild never appends a second generation of shard
    files (which the reader would merge into duplicate neighbor rows),
    and meta.json presence implies exactly one complete generation."""
    import hashlib
    import json
    import os
    import shutil

    n = ds.count()
    num_shards = max(2, -(-n // shard_rows))
    # dim recorded in meta (documented layout): one-row peek, build-time only
    dim = int(len(ds.take(1)[0][vec_col])) if n else 0

    _schema = pa.schema(
        [("shard_id", pa.int64()), ("n", pa.int64()), ("dim", pa.int64()),
         ("ids", pa.binary()), ("vecs", pa.binary()), ("graph", pa.binary())]
    )

    def build_shard(batch: pd.DataFrame) -> pa.Table:
        if batch.empty:  # repartition pads with empty blocks when n < shards
            # typed empty: parquet schema stays binary/int64, never null
            return _schema.empty_table()
        ids = batch[id_col].to_numpy(np.int64)
        X = _normalize(_to_matrix(batch[vec_col]))
        g = HnswGraph(X, M=M, ef_construction=ef_construction, seed=seed)
        ids_blob = ids.tobytes()
        sid = int(
            np.frombuffer(hashlib.md5(ids_blob).digest()[:8], dtype="<i8")[0]
        )
        return pa.table(
            {
                "shard_id": pa.array([sid], pa.int64()),
                "n": pa.array([len(ids)], pa.int64()),
                "dim": pa.array([X.shape[1]], pa.int64()),
                "ids": pa.array([ids_blob], pa.binary()),
                "vecs": pa.array(
                    [np.ascontiguousarray(X, dtype=np.float64).tobytes()],
                    pa.binary(),
                ),
                "graph": pa.array([_ser_graph(g)], pa.binary()),
            },
            schema=_schema,
        )

    tmp_dir = index_dir.rstrip("/") + ".building"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(os.path.join(tmp_dir, "shards"), exist_ok=True)
    ds.repartition(num_shards).map_batches(
        build_shard, batch_format="pandas", batch_size=None
    ).write_parquet(os.path.join(tmp_dir, "shards"))
    meta = {
        "n_shards": num_shards, "n_rows": int(n), "dim": dim, "M": M,
        "ef_construction": ef_construction, "seed": seed,
        "version": _HNSW_INDEX_VERSION,
    }
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp_dir, index_dir)
    return meta


def knn_hnsw_index(
    index_dir: str,
    query_ids: list,
    query_vecs: np.ndarray,
    *,
    k: int = 10,
    ef_search: int = 64,
    exclude_self: bool = True,
) -> Dataset:
    """Query the persisted index: one task per shard file deserializes
    (frombuffer views — no graph construction) and beam-searches; the
    merge is output-sized.  Same result contract as ``knn_hnsw``."""
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("version") != _HNSW_INDEX_VERSION:
        raise ValueError(
            f"hnsw index version {meta.get('version')} != "
            f"{_HNSW_INDEX_VERSION}; rebuild the index"
        )
    q_mat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    state_ref = ray.put({"ids": np.asarray(query_ids), "mat": q_mat})

    def search_shard(batch: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(state_ref)
        qids, Q = st["ids"], st["mat"]
        kk = k + 1 if exclude_self else k
        if not batch.empty:
            batch = batch[batch["n"] > 0]
        parts = []
        for _, row in batch.iterrows():  # rows are whole-shard blobs
            n, dim = int(row["n"]), int(row["dim"])
            ids = np.frombuffer(row["ids"], dtype=np.int64)
            X = np.frombuffer(row["vecs"], dtype=np.float64).reshape(n, dim)
            g = _deser_graph(row["graph"], X)
            parts.append(
                _assemble_shard_results(
                    g, ids, qids, Q, kk, max(ef_search, kk), exclude_self
                )
            )
        if not parts:
            return pd.DataFrame(_EMPTY_SHARD_RESULT)
        return pd.concat(parts, ignore_index=True)

    partial = rd.read_parquet(
        os.path.join(index_dir, "shards"),
        columns=["n", "dim", "ids", "vecs", "graph"],
    ).map_batches(search_shard, batch_format="pandas")

    merge = _topk_merge_fn(k)

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")
