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
