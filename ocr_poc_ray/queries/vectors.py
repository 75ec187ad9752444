"""Embedding-column queries: ANN / similarity search with DuckDB oracles.

The brute-force top-k is the exact baseline the oracle can verify
(`list_cosine_similarity` over DOUBLE-cast lists ≡ our normalized
float64 matmul to well below the 4-dp rounding); the LSH variant is
approximate by design → rows-only.  Query vectors are the rows with
``vec_id % 100 = 0`` — deterministic, scale-proportional, and
selectable by both engines without a side channel.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ocr_poc_ray.functions.similarity import (
    embedding_near_dup_pairs,
    knn_brute_force,
    knn_ivf,
    knn_lsh,
)

KNN_K = 10
NEAR_DUP_THRESHOLD = 0.35


def _emb_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def _query_vectors(sf_dir: str) -> tuple[list[int], np.ndarray]:
    """The broadcast small side: query rows fetched once on the driver."""
    import pyarrow.parquet as pq

    t = pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    mask = np.asarray(t["vec_id"].to_numpy()) % 100 == 0
    t = t.filter(pa.array(mask))
    ids = t["vec_id"].to_pylist()
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, vecs


def vec_knn_cosine(sf_dir: str) -> pd.DataFrame:
    ids, vecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    out = knn_brute_force(ds, ids, vecs, k=KNN_K).to_pandas()
    out = out[["query_id", "neighbor_id", "cosine", "rank"]]
    return out.astype(
        {"query_id": "int64", "neighbor_id": "int64", "cosine": "float64", "rank": "int64"}
    )


VEC_KNN_COSINE_SQL = f"""
with q as (
  select vec_id as qid, embedding::DOUBLE[] as qe from embeddings where vec_id % 100 = 0
), s as (
  select q.qid, e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qe) as sim
  from embeddings e, q
  where e.vec_id <> q.qid
)
select qid as query_id, vec_id as neighbor_id, round(sim, 4) as cosine,
       row_number() over (partition by qid order by sim desc, vec_id) as rank
from s
qualify rank <= {KNN_K}
"""


def vec_knn_lsh(sf_dir: str) -> pd.DataFrame:
    """Approximate (bucketed) variant — rows-only check; recall vs the
    brute-force baseline is asserted in tests/test_functions.py."""
    ids, vecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    out = knn_lsh(ds, ids, vecs, k=KNN_K, nbits=4).to_pandas()
    out = out[["query_id", "neighbor_id", "cosine", "rank"]]
    return out.astype(
        {"query_id": "int64", "neighbor_id": "int64", "cosine": "float64", "rank": "int64"}
    )


def vec_near_dup(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    out = embedding_near_dup_pairs(ds, threshold=NEAR_DUP_THRESHOLD).to_pandas()
    out = out[["id_a", "id_b", "cosine"]]
    return out.astype({"id_a": "int64", "id_b": "int64", "cosine": "float64"})


VEC_NEAR_DUP_SQL = f"""
select a.vec_id as id_a, b.vec_id as id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) as cosine
from embeddings a join embeddings b on a.vec_id < b.vec_id
where list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= {NEAR_DUP_THRESHOLD}
"""


def vec_knn_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed ANN — rows-only; recall vs brute force is asserted
    in tests/test_functions.py."""
    ids, vecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    out = knn_ivf(ds, ids, vecs, k=KNN_K, nlist=16, nprobe=6).to_pandas()
    out = out[["query_id", "neighbor_id", "cosine", "rank"]]
    return out.astype(
        {"query_id": "int64", "neighbor_id": "int64", "cosine": "float64", "rank": "int64"}
    )


CENTROID_GROUPS = 4


def vec_group_centroids(sf_dir: str) -> pd.DataFrame:
    """Grouped vector-mean aggregate (cluster centroids / per-source
    embedding statistics): per-batch partial SUM matrices + counts per
    group (one numpy add per batch — the vector analog of partial
    aggregation), one tiny combine over groups × dim values.  Output is
    flattened (grp, dim_idx, centroid) rows so the driver's value hash
    covers every component."""
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        g = (batch["vec_id"].to_numpy() % CENTROID_GROUPS).astype(np.int64)
        rows = []
        for grp in np.unique(g):
            sub = X[g == grp]
            rows.append(
                {"grp": int(grp), "n": len(sub), "sums": sub.sum(axis=0).tobytes()}
            )
        return pd.DataFrame(rows)

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = []
    for grp, grpdf in partials.groupby("grp"):
        total = np.sum(
            [np.frombuffer(b, dtype=np.float64) for b in grpdf["sums"]], axis=0
        )
        n = int(grpdf["n"].sum())
        cent = np.round(total / n, 6)
        for i, c in enumerate(cent):
            out.append({"grp": int(grp), "dim_idx": i + 1, "centroid": float(c)})
    return pd.DataFrame(out).astype(
        {"grp": "int64", "dim_idx": "int64", "centroid": "float64"}
    )


VEC_GROUP_CENTROIDS_SQL = f"""
with u as (
  select vec_id % {CENTROID_GROUPS} as grp,
         generate_subscripts(embedding, 1) as dim_idx,
         unnest(embedding)::DOUBLE as e
  from embeddings
)
select grp, dim_idx, round(avg(e), 6) as centroid
from u
group by grp, dim_idx
"""


REGISTRY = {
    "vec_group_centroids": (vec_group_centroids, VEC_GROUP_CENTROIDS_SQL),
    "vec_knn_cosine": (vec_knn_cosine, VEC_KNN_COSINE_SQL),
    "vec_knn_lsh": (vec_knn_lsh, None),
    "vec_knn_ivf": (vec_knn_ivf, None),
    "vec_near_dup": (vec_near_dup, VEC_NEAR_DUP_SQL),
}
