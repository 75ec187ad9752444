"""Distributed iterative k-means over an embedding column.

The broadcast-refine loop every iterative-ML-on-Ray-Data job uses:
centroids live on the driver (k × d floats — tiny), each iteration
broadcasts them once via ``ray.put`` and runs ONE streaming pass of
per-batch partials (assign by a single matmul, emit per-cluster count +
packed coordinate sums — k rows per batch, never the corpus), and the
driver combine is O(k·d).  Nothing corpus-sized is ever collected,
sorted, or grouped; iterations scale with data size only through the
streaming pass.

Init is deterministic on any engine/partitioning: the k vectors whose
ids have the smallest seeded blake2b priority (the per-key deterministic
sample pattern), fetched with one broadcast-filter pass.  Empty clusters
keep their previous centroid.

Exact parity with a single-process run is only up to float summation
order (partials combine in a different order than one flat sum), so
tests assert on well-separated data / tolerances, and the registered
query is rows-only by design.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ray.data import Dataset


def _priority(seed: int, ids: np.ndarray) -> np.ndarray:
    return np.asarray(
        [
            int.from_bytes(
                hashlib.blake2b(
                    f"{seed}:{i}".encode(), digest_size=8
                ).digest(),
                "big",
            )
            for i in ids
        ],
        dtype=np.uint64,
    )


class _KmeansShard:
    """One shard of the (id, vec) projection pinned as a dense matrix;
    every k-means round becomes one actor call instead of a Ray Data
    job launch (~0.3 s/job regardless of data — the fit loop is
    11 jobs at n_iters=8).  Same math as the streaming partials."""

    def __init__(self, table_refs, id_col: str, vec_col: str):
        import ray as _ray

        from ocr_poc_ray.functions.similarity import _to_matrix

        tables = _ray.get(list(table_refs))
        dfs = [t.to_pandas() for t in tables]
        df = pd.concat(dfs, ignore_index=True) if dfs else None
        if df is None or len(df) == 0:
            self.ids = np.zeros(0, dtype=np.int64)
            self.X = np.zeros((0, 0), dtype=np.float64)
            return
        self.ids = df[id_col].to_numpy()
        self.X = _to_matrix(df[vec_col]).astype(np.float64)

    def topk_priority(self, seed: int, k: int):
        pri = _priority(seed, self.ids)
        order = np.argsort(pri, kind="stable")[:k]
        return self.ids[order], pri[order]

    def fetch_vecs(self, want: np.ndarray):
        m = np.isin(self.ids, want)
        return self.ids[m], self.X[m]

    def assign(self, C: np.ndarray, want_sums: bool):
        if len(self.ids) == 0:
            z = np.zeros(len(C), dtype="int64")
            return (z, np.zeros((len(C), C.shape[1]))) if want_sums else (
                z, np.zeros(len(C)))
        X = self.X
        d2 = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        counts = np.bincount(a, minlength=len(C)).astype("int64")
        if want_sums:
            sums = np.zeros((len(C), X.shape[1]), dtype=np.float64)
            np.add.at(sums, a, X)
            return counts, sums
        sse = np.zeros(len(C), dtype=np.float64)
        np.add.at(sse, a, d2[np.arange(len(X)), a])
        return counts, sse


def _kmeans_fit_actors(
    ds: Dataset, *, k: int, n_iters: int, id_col: str, vec_col: str,
    seed: int,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Actor-pool fast path of ``kmeans_fit`` (same init rule, same
    per-round math; float sums group per shard instead of per block)."""
    import ray as _ray

    from ocr_poc_ray.functions.trainer import _FIT_ACTOR_POOL

    refs = ds.to_arrow_refs()
    n_shards = max(1, min(_FIT_ACTOR_POOL, len(refs)))
    shard_refs: list[list] = [[] for _ in range(n_shards)]
    for i, r in enumerate(refs):
        shard_refs[i % n_shards].append(r)
    actor_cls = _ray.remote(_KmeansShard)
    actors = [actor_cls.remote(rs, id_col, vec_col) for rs in shard_refs]
    try:
        tops = _ray.get([a.topk_priority.remote(seed, k) for a in actors])
        cand = pd.DataFrame(
            {"id_": np.concatenate([t[0] for t in tops]),
             "pri": np.concatenate([t[1] for t in tops])}
        ).sort_values(["pri", "id_"], kind="mergesort").head(k)
        init_ids = np.sort(cand["id_"].to_numpy())
        got = _ray.get([a.fetch_vecs.remote(init_ids) for a in actors])
        ids = np.concatenate([g[0] for g in got])
        vecs = np.concatenate([g[1] for g in got]) if len(ids) else np.zeros((0, 0))
        order = np.argsort(ids, kind="stable")
        centroids = vecs[order]
        k = len(centroids)

        for _ in range(n_iters):
            parts = _ray.get([a.assign.remote(centroids, True) for a in actors])
            counts = sum(p[0] for p in parts)
            sums = sum(p[1] for p in parts)
            nonempty = counts > 0
            centroids = centroids.copy()
            centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

        parts = _ray.get([a.assign.remote(centroids, False) for a in actors])
        counts = sum(p[0] for p in parts)
        sse = sum(p[1] for p in parts)
    finally:
        for a in actors:
            _ray.kill(a)
    summary = pd.DataFrame(
        {"cluster": np.arange(k, dtype="int64"),
         "n_points": counts.astype("int64"),
         "sse": sse.astype(np.float64)}
    )
    return centroids, summary


def kmeans_fit(
    ds: Dataset,
    *,
    k: int = 8,
    n_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> tuple[np.ndarray, pd.DataFrame]:
    """Returns (centroids (k, d) float64, per-cluster summary with
    columns cluster/n_points/sse)."""
    import ray as _ray

    from ocr_poc_ray.functions.similarity import _to_matrix

    # pin the (id, vec) projection in the object store once — every
    # iteration re-scans it; re-reading the source per pass pays the
    # full read stage ~n_iters times (measured ~2.5 s/pass overhead on
    # small corpora).  Spill-backed, so this holds at corpus scale too.
    ds = ds.materialize()

    if ds.count() == 0:  # typed empty result, mirroring ngram_jaccard_pairs
        return (
            np.zeros((0, 0), dtype=np.float64),
            pd.DataFrame(
                {
                    "cluster": pd.Series([], dtype="int64"),
                    "n_points": pd.Series([], dtype="int64"),
                    "sse": pd.Series([], dtype="float64"),
                }
            ),
        )

    from ocr_poc_ray.functions.trainer import _FIT_ACTOR_BYTES_LIMIT

    if ds.size_bytes() <= _FIT_ACTOR_BYTES_LIMIT:
        return _kmeans_fit_actors(
            ds, k=k, n_iters=n_iters, id_col=id_col, vec_col=vec_col,
            seed=seed,
        )

    # --- deterministic init: bottom-k priorities, local partials ---
    def prio_partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        pri = _priority(seed, ids)
        order = np.argsort(pri, kind="stable")[:k]
        return pd.DataFrame({"id_": ids[order], "pri": pri[order]})

    cand = ds.map_batches(prio_partial, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["pri", "id_"], kind="mergesort").head(k)
    init_ids = np.sort(cand["id_"].to_numpy())
    ids_ref = _ray.put(init_ids)

    def fetch_init(b: pd.DataFrame) -> pd.DataFrame:
        want = _ray.get(ids_ref)
        m = np.isin(b[id_col].to_numpy(), want)
        sub = b.loc[m]
        return pd.DataFrame(
            {
                "id_": sub[id_col].to_numpy(),
                "vec": [np.asarray(v, dtype=np.float64).tobytes()
                        for v in sub[vec_col]],
            }
        )

    got = ds.map_batches(fetch_init, batch_format="pandas").to_pandas()
    got = got.sort_values("id_", kind="mergesort")
    centroids = np.vstack(
        [np.frombuffer(bts, dtype=np.float64) for bts in got["vec"]]
    )
    k = len(centroids)  # corpus smaller than k ⇒ fewer clusters
    d = centroids.shape[1]

    # --- broadcast-refine iterations ---
    def make_assign_partial(cref, want_sums: bool):
        def assign_partial(b: pd.DataFrame) -> pd.DataFrame:
            C = _ray.get(cref)
            X = _to_matrix(b[vec_col])
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * (X @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            counts = np.bincount(a, minlength=len(C)).astype("int64")
            rows = {"cluster": np.arange(len(C), dtype="int64"),
                    "n": counts}
            if want_sums:
                sums = np.zeros((len(C), X.shape[1]), dtype=np.float64)
                np.add.at(sums, a, X)
                rows["sum_"] = [s.tobytes() for s in sums]
            else:
                sse = np.zeros(len(C), dtype=np.float64)
                np.add.at(sse, a, d2[np.arange(len(X)), a])
                rows["sse"] = sse
            out = pd.DataFrame(rows)
            return out[out["n"] > 0] if want_sums else out

        return assign_partial

    for _ in range(n_iters):
        cref = _ray.put(centroids)
        parts = ds.map_batches(
            make_assign_partial(cref, want_sums=True), batch_format="pandas"
        ).to_pandas()
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype="int64")
        for c, grp in parts.groupby("cluster"):
            counts[c] = int(grp["n"].sum())
            sums[c] = np.sum(
                [np.frombuffer(bts, dtype=np.float64) for bts in grp["sum_"]],
                axis=0,
            )
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

    # --- final summary pass ---
    cref = _ray.put(centroids)
    parts = ds.map_batches(
        make_assign_partial(cref, want_sums=False), batch_format="pandas"
    ).to_pandas()
    summary = (
        parts.groupby("cluster", as_index=False)
        .agg(n_points=("n", "sum"), sse=("sse", "sum"))
        .astype({"cluster": "int64", "n_points": "int64", "sse": "float64"})
    )
    return centroids, summary


def kmeans_predict(
    ds: Dataset,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """(id, cluster) assignments against fixed broadcast centroids."""
    import ray as _ray

    from ocr_poc_ray.functions.similarity import _to_matrix

    cref = _ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        C = _ray.get(cref)
        X = _to_matrix(b[vec_col])
        d2 = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "cluster": np.argmin(d2, axis=1).astype("int64"),
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


# ---------------------------------------------------------------------------
# Density-based clustering (DBSCAN) over cosine neighborhoods — the
# non-parametric sibling of k-means for corpus structure discovery:
# no k, arbitrary cluster shapes, an explicit noise label for the
# isolated tail.  Composition of existing scale primitives:
#
#   1. ε-neighbor pairs  = `embedding_near_dup_pairs` (blocked exact
#      grid, or LSH buckets via nbits for the 100-TB path);
#   2. degrees           = per-batch endpoint counts + bounded
#      hash-bucket combine (never vocabulary-sized on the driver);
#   3. core flags        = `membership_flag`'s broadcast ↔ bloom switch;
#   4. clusters          = `connected_components_auto` over core-core
#      edges (union-find below 1 M edges, min-label dataflow above);
#   5. border attach     = min core-neighbor cluster per non-core id —
#      a bounded-bucket min combine over (non-core, core-cluster) rows.
#
# Rules (deterministic): core iff ≥ min_neighbors ε-neighbors
# (excluding self); cluster id = min core vec_id in the component;
# border point = non-core with ≥1 core neighbor, labeled with the MIN
# cluster id among its core neighbors; everything else noise = -1.
# ---------------------------------------------------------------------------


def dbscan_cosine(
    ds: Dataset,
    *,
    threshold: float,
    min_neighbors: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 0,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """(vec_id, cluster, is_core) for every input id; noise = -1."""
    import ray as _ray

    from ocr_poc_ray.functions.dedup import (
        connected_components_auto,
        membership_flag,
    )
    from ocr_poc_ray.functions.similarity import embedding_near_dup_pairs

    pairs = embedding_near_dup_pairs(
        ds, threshold=threshold, nbits=nbits, id_col=id_col, vec_col=vec_col
    ).materialize()  # read by the degree, core-core, and border passes

    # --- degrees (neighbor counts, self excluded by pair construction)
    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate(
            [b["id_a"].to_numpy(np.int64), b["id_b"].to_numpy(np.int64)]
        )
        u, c = np.unique(ids, return_counts=True)
        return pd.DataFrame(
            {"vec_id": u, "n": c, "_hb": u % num_buckets}
        )

    def deg_combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("vec_id", as_index=False)["n"].sum()
        return agg[agg["n"] >= min_neighbors][["vec_id"]]

    core_ds = (
        pairs.map_batches(deg_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(deg_combine, batch_format="pandas")
    )

    # --- flag pair endpoints against the core set (broadcast↔bloom)
    flagged = membership_flag(pairs, "id_a", core_ds, "vec_id").map_batches(
        lambda b: b.rename(columns={"_in_set": "a_core"}), batch_format="pandas"
    )
    flagged = membership_flag(flagged, "id_b", core_ds, "vec_id").map_batches(
        lambda b: b.rename(columns={"_in_set": "b_core"}), batch_format="pandas"
    ).materialize()  # read by the core-core and border passes

    # --- clusters over core-core edges (component = min core id)
    core_edges = flagged.map_batches(
        lambda b: b.loc[b["a_core"] & b["b_core"], ["id_a", "id_b"]].rename(
            columns={"id_a": "doc_a", "id_b": "doc_b"}
        ),
        batch_format="pandas",
    )
    comp = connected_components_auto(core_edges).to_pandas()
    if comp.empty:
        comp = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "component": pd.Series([], dtype="int64")}
        )
    # an isolated core point (all neighbors border) forms its own
    # cluster: components only sees EDGES, so add singletons explicitly
    core_all = core_ds.to_pandas()
    core_ids = (
        core_all["vec_id"].to_numpy(np.int64) if len(core_all)
        else np.array([], dtype=np.int64)
    )
    missing = np.setdiff1d(core_ids, comp["doc_id"].to_numpy(np.int64))
    if len(missing):
        comp = pd.concat(
            [comp, pd.DataFrame({"doc_id": missing, "component": missing})],
            ignore_index=True,
        )
    comp_sorted = comp.sort_values("doc_id")
    comp_ids = comp_sorted["doc_id"].to_numpy(np.int64)
    comp_lbl = comp_sorted["component"].to_numpy(np.int64)
    cref = _ray.put(comp_ids)
    lref = _ray.put(comp_lbl)

    # --- border attach: min core-neighbor cluster per non-core id
    def border_partial(b: pd.DataFrame) -> pd.DataFrame:
        ci = _ray.get(cref)
        cl = _ray.get(lref)
        rows = []
        for nc, co in (("id_a", "id_b"), ("id_b", "id_a")):
            m = (~b[f"{nc[3]}_core"].to_numpy()) & b[f"{co[3]}_core"].to_numpy()
            if not m.any():
                continue
            non = b[nc].to_numpy(np.int64)[m]
            cor = b[co].to_numpy(np.int64)[m]
            pos = np.searchsorted(ci, cor)
            rows.append(pd.DataFrame({"vec_id": non, "cluster": cl[pos]}))
        if not rows:
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "cluster": pd.Series([], dtype="int64"),
                 "_hb": pd.Series([], dtype="int64")}
            )
        out = pd.concat(rows, ignore_index=True)
        out = out.groupby("vec_id", as_index=False)["cluster"].min()
        out["_hb"] = out["vec_id"].to_numpy(np.int64) % num_buckets
        return out

    def border_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("vec_id", as_index=False)["cluster"].min()

    border = (
        flagged.map_batches(border_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(border_combine, batch_format="pandas")
        .to_pandas()
    )
    if border.empty:
        border = pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "cluster": pd.Series([], dtype="int64")}
        )
    border = border[~border["vec_id"].isin(comp_ids)]

    # --- assemble full labeling over every input id
    all_ids = ds.select_columns([id_col]).to_pandas()[id_col].to_numpy(np.int64)
    out = pd.DataFrame({"vec_id": np.sort(all_ids)})
    lbl = np.full(len(out), -1, dtype=np.int64)
    pos = np.searchsorted(out["vec_id"].to_numpy(), comp_ids)
    lbl[pos] = comp_lbl
    is_core = np.zeros(len(out), dtype=bool)
    is_core[np.searchsorted(out["vec_id"].to_numpy(), core_ids)] = True
    if len(border):
        bpos = np.searchsorted(out["vec_id"].to_numpy(), border["vec_id"].to_numpy(np.int64))
        lbl[bpos] = border["cluster"].to_numpy(np.int64)
    out["cluster"] = lbl
    out["is_core"] = is_core
    return out.astype({"vec_id": "int64", "cluster": "int64", "is_core": "bool"})
