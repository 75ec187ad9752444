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

import ray
from ray.data import Dataset

from ocr_poc_ray.functions.similarity import _normalize, _to_matrix

_MAX_LEVEL = 8  # geometric tail above this is vanishingly rare at shard sizes


def _search_layer(
    X: np.ndarray,
    layer: list,
    q: np.ndarray,
    eps: list[int],
    ef: int,
) -> tuple[np.ndarray, np.ndarray]:
    """ef-bounded best-first beam over one layer; returns (ids, sims)
    sorted by similarity descending.  Neighbor distance evaluations are
    one gathered matmul per expanded node."""
    visited = set(eps)
    sims0 = X[eps] @ q
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
        s_arr = X[nbs] @ q
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
        for i in range(1, n):
            li = int(self.levels[i])
            q = self.X[i]
            ep = self.entry
            for l in range(self.entry_level, li, -1):
                ids, _ = _search_layer(self.X, self.layers[l], q, [ep], 1)
                ep = int(ids[0])
            for l in range(min(li, self.entry_level), -1, -1):
                ids, _sims = _search_layer(
                    self.X, self.layers[l], q, [ep], ef_construction
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

    def search(self, q: np.ndarray, k: int, *, ef: int = 64) -> tuple[np.ndarray, np.ndarray]:
        """(row_indices, cosines) of the approximate top-k for one
        normalized query vector."""
        if not len(self.X):
            return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
        ep = self.entry
        for l in range(self.entry_level, 0, -1):
            ids, _ = _search_layer(self.X, self.layers[l], q, [ep], 1)
            ep = int(ids[0])
        ids, sims = _search_layer(self.X, self.layers[0], q, [ep], max(ef, k))
        return ids[:k], sims[:k]


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
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        st = ray.get(state_ref)
        qids, Q = st["ids"], st["mat"]
        ids = batch[id_col].to_numpy()
        X = _normalize(_to_matrix(batch[vec_col]))
        g = HnswGraph(X, M=M, ef_construction=ef_construction, seed=seed)
        out_q, out_n, out_s = [], [], []
        # ask for k+1 so a dropped self-hit still leaves k rows
        kk = k + 1 if exclude_self else k
        for qi in range(Q.shape[0]):
            rows, sims = g.search(Q[qi], kk, ef=max(ef_search, kk))
            for r, s in zip(rows, sims):
                nid = ids[r]
                if exclude_self and nid == qids[qi]:
                    continue
                out_q.append(qids[qi])
                out_n.append(nid)
                out_s.append(float(s))
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
        )

    partial = ds.repartition(num_shards).map_batches(
        shard_topk, batch_format="pandas", batch_size=None
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = g["cosine"].round(4)
        return g

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

_HNSW_INDEX_VERSION = 1


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
    a = np.frombuffer(blob, dtype=np.int64)
    n, top, entry, entry_level = (int(a[0]), int(a[1]), int(a[2]), int(a[3]))
    g = HnswGraph.__new__(HnswGraph)
    g.X = X
    g.levels = a[4 : 4 + n].copy()
    g.M = 0  # unused after build
    g.entry, g.entry_level = entry, entry_level
    pos = 4 + n
    layers = []
    for _l in range(top + 1):
        layer = []
        for _i in range(n):
            ln = int(a[pos]); pos += 1
            layer.append([int(x) for x in a[pos : pos + ln]])
            pos += ln
        layers.append(layer)
    g.layers = layers
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
    the meta dict.  Vectors are stored L2-normalized (cosine = dot)."""
    import json
    import os

    n = ds.count()
    num_shards = max(2, -(-n // shard_rows))

    def build_shard(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:  # repartition pads with empty blocks when n < shards
            return pd.DataFrame(
                {"n": pd.Series([], dtype="int64"),
                 "dim": pd.Series([], dtype="int64"),
                 "ids": pd.Series([], dtype=object),
                 "vecs": pd.Series([], dtype=object),
                 "graph": pd.Series([], dtype=object)}
            )
        ids = batch[id_col].to_numpy(np.int64)
        X = _normalize(_to_matrix(batch[vec_col]))
        g = HnswGraph(X, M=M, ef_construction=ef_construction, seed=seed)
        return pd.DataFrame(
            {
                "n": pd.Series([len(ids)], dtype="int64"),
                "dim": pd.Series([X.shape[1]], dtype="int64"),
                "ids": [ids.tobytes()],
                "vecs": [np.ascontiguousarray(X, dtype=np.float64).tobytes()],
                "graph": [_ser_graph(g)],
            }
        )

    os.makedirs(index_dir, exist_ok=True)
    ds.repartition(num_shards).map_batches(
        build_shard, batch_format="pandas", batch_size=None
    ).write_parquet(os.path.join(index_dir, "shards"))
    meta = {
        "n_shards": num_shards, "n_rows": int(n), "M": M,
        "ef_construction": ef_construction, "seed": seed,
        "version": _HNSW_INDEX_VERSION,
    }
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
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
        out_q, out_n, out_s = [], [], []
        kk = k + 1 if exclude_self else k
        if not batch.empty:
            batch = batch[batch["n"] > 0]
        for _, row in batch.iterrows():
            n, dim = int(row["n"]), int(row["dim"])
            ids = np.frombuffer(row["ids"], dtype=np.int64)
            X = np.frombuffer(row["vecs"], dtype=np.float64).reshape(n, dim)
            g = _deser_graph(row["graph"], X)
            for qi in range(Q.shape[0]):
                rows, sims = g.search(Q[qi], kk, ef=max(ef_search, kk))
                for r, s in zip(rows, sims):
                    nid = ids[r]
                    if exclude_self and nid == qids[qi]:
                        continue
                    out_q.append(qids[qi])
                    out_n.append(nid)
                    out_s.append(float(s))
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n, "cosine": out_s}
        )

    partial = rd.read_parquet(os.path.join(index_dir, "shards")).map_batches(
        search_shard, batch_format="pandas"
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["cosine"] = g["cosine"].round(4)
        return g

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")
