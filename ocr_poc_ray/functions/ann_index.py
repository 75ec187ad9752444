"""Persisted IVF index: build once, query many, read only probed lists.

The in-pipeline ANN variants (`similarity.knn_ivf` etc.) re-scan the
whole corpus per query batch.  Production retrieval builds the index
ONCE as a partitioned layout and then answers every later query by
reading only the probed inverted lists — at 100 TB that is the
difference between a corpus scan and `nprobe/nlist` of one.

Layout under ``index_dir``::

    meta.json                      {nlist, dim, n_rows, version}
    centroids.parquet              (list_id, centroid: list<double>)
    lists/list_id=K/*.parquet      (list_id, id, vec: binary float64)

Vectors are stored L2-normalized and packed as fixed-width float64
binary (list columns don't survive hash joins and unpack slower);
``lists/`` is hive-partitioned by ``list_id`` so a query's read plan
names exactly its probed directories — partition pruning is the entire
point of the layout.  Citation: the reference loads its model once and
serves many requests (`ocr/paddle_extractor.py:21-34`); this is the
same build-once/serve-many economics applied to retrieval state.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

import ray
from ray.data import Dataset

from ocr_poc_ray.functions.similarity import (
    _kmeans_lite,
    _normalize,
    _to_matrix,
    _topk_merge_fn,
)

INDEX_VERSION = "1.0.0"


def build_ivf_index(
    ds: Dataset,
    index_dir: str,
    *,
    nlist: int = 16,
    train_size: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Train the coarse quantizer on a bounded seeded sample, assign
    every vector in one streaming pass, and persist the partitioned
    layout.  Returns the meta dict."""
    n = ds.count()
    frac = min(1.0, (train_size * 1.2) / max(n, 1))
    sample = ds.random_sample(frac, seed=seed).limit(train_size).to_pandas()
    if sample.empty:
        sample = ds.limit(train_size).to_pandas()
    X_train = _normalize(_to_matrix(sample[vec_col]))
    C = _kmeans_lite(X_train, nlist, seed=seed)
    dim = C.shape[1]
    c_ref = ray.put(C)

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        cc = ray.get(c_ref)
        X = _normalize(_to_matrix(batch[vec_col]))
        return pd.DataFrame(
            {
                "list_id": np.argmax(X @ cc.T, axis=1).astype("int64"),
                "id": batch[id_col].to_numpy(),
                "vec": [row.tobytes() for row in X],
            }
        )

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pandas").write_parquet(
        os.path.join(index_dir, "lists"), partition_cols=["list_id"]
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "list_id": pa.array(range(len(C)), pa.int64()),
                "centroid": pa.array([row.tolist() for row in C],
                                     pa.list_(pa.float64())),
            }
        ),
        os.path.join(index_dir, "centroids.parquet"),
    )
    meta = {"nlist": int(len(C)), "dim": int(dim), "n_rows": int(n),
            "version": INDEX_VERSION}
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def probed_list_paths(index_dir: str, probe_lists: np.ndarray) -> list[str]:
    """The partition directories a query set will read — exposed so the
    pruning contract is testable."""
    return [
        os.path.join(index_dir, "lists", f"list_id={int(k)}")
        for k in sorted(set(int(x) for x in probe_lists.ravel()))
        if os.path.isdir(os.path.join(index_dir, "lists", f"list_id={int(k)}"))
    ]


def knn_ivf_index(
    index_dir: str,
    query_ids: list,
    query_vecs: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    exclude_self: bool = True,
) -> Dataset:
    """Query a persisted index: read ONLY the probed list partitions,
    score per batch, merge local top-k partials — identical ranking
    rules to the in-pipeline ANN family (cosine desc, neighbor asc)."""
    import pyarrow.parquet as pq

    import ray.data as rd

    C = np.vstack(
        pq.read_table(os.path.join(index_dir, "centroids.parquet"))["centroid"]
        .to_pylist()
    )
    q_mat = _normalize(np.asarray(query_vecs, dtype=np.float64))
    probe = np.argsort(-(q_mat @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    paths = probed_list_paths(index_dir, probe)
    state_ref = ray.put(
        {"ids": np.asarray(query_ids), "mat": q_mat, "probe": probe}
    )

    # partition-pruned read: only probed lists.  Ray's multi-path
    # read_parquet wants FILES (a path list skips directory expansion),
    # so expand each probed partition dir explicitly.
    files = [
        os.path.join(p, f)
        for p in paths
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    ds = rd.read_parquet(files)

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(state_ref)
        qids, Q, probe = st["ids"], st["mat"], st["probe"]
        X = np.vstack([np.frombuffer(v, dtype=np.float64) for v in batch["vec"]])
        ids = batch["id"].to_numpy()
        lists = batch["list_id"].to_numpy().astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for qi in range(Q.shape[0]):
            mask = np.isin(lists, probe[qi])
            if not mask.any():
                continue
            sub_ids = ids[mask]
            sims = X[mask] @ Q[qi]
            kk = min(k + 1, len(sub_ids))
            top = (
                np.argpartition(-sims, kk - 1)[:kk]
                if kk < len(sub_ids)
                else np.arange(len(sub_ids))
            )
            for t in top:
                if exclude_self and sub_ids[t] == qids[qi]:
                    continue
                out_q.append(qids[qi])
                out_n.append(sub_ids[t])
                out_s.append(sims[t])
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n, "cosine": out_s})

    partial = ds.map_batches(partial_topk, batch_format="pandas", batch_size=4096)

    merge = _topk_merge_fn(k)

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")
