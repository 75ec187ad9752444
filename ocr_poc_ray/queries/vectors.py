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
    contrastive_pairs,
    knn_pq,
    semantic_dedup,
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
       row_number() over (
         partition by qid order by round(sim, 4) desc, vec_id
       ) as rank
from s
qualify rank <= {KNN_K}
"""


def vec_knn_lsh(sf_dir: str) -> pd.DataFrame:
    """Approximate (bucketed) variant — rows-only check; recall vs the
    brute-force baseline is asserted in tests/test_functions.py."""
    ids, vecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    out = knn_lsh(ds, ids, vecs, k=KNN_K, nbits=4, n_tables=16).to_pandas()
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


def vec_knn_hnsw(sf_dir: str) -> pd.DataFrame:
    """Sharded HNSW graph ANN (Malkov & Yashunin 2016) — rows-only;
    recall vs brute force is asserted in tests/test_functions.py.
    Completes the ANN family: brute (exact) / LSH / IVF / PQ / HNSW."""
    from ocr_poc_ray.functions.hnsw import knn_hnsw

    ids, vecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    out = knn_hnsw(ds, ids, vecs, k=KNN_K, M=8, ef_search=64).to_pandas()
    out = out[["query_id", "neighbor_id", "cosine", "rank"]]
    return out.astype(
        {"query_id": "int64", "neighbor_id": "int64", "cosine": "float64", "rank": "int64"}
    )


def vec_knn_pq(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN with exact refinement — rows-only;
    recall vs brute force is asserted in tests/test_functions.py."""
    ids, vecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    out = knn_pq(ds, ids, vecs, k=KNN_K, m=16, nbits=4).to_pandas()
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


def vec_label_medoid(sf_dir: str) -> pd.DataFrame:
    """Centroid-nearest representative per label — the semantic-dedup
    "keep one per cluster" selection, as a distributed argmin-by-group:
    pass 1 builds per-label centroids from per-batch partial sum
    matrices (labels × dim, tiny, broadcast once); pass 2 is a per-batch
    local argmin against the broadcast centroids (one vectorized
    distance per row) with a bounded final combine over the
    O(batches × labels) local winners.  Label count never becomes a Ray
    group count and no vector leaves a task except the winners."""
    import ray as _ray

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding", "label"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        lab = batch["label"].to_numpy(np.int64)
        rows = []
        for lb in np.unique(lab):
            sub = X[lab == lb]
            rows.append(
                {"label": int(lb), "n": len(sub), "sums": sub.sum(axis=0).tobytes()}
            )
        return pd.DataFrame(rows)

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if partials.empty:
        return pd.DataFrame(
            {"label": pd.Series([], dtype="int64"),
             "vec_id": pd.Series([], dtype="int64"),
             "dist": pd.Series([], dtype="float64")}
        )
    cents = []
    labels_sorted = np.sort(partials["label"].unique()).astype(np.int64)
    for lb in labels_sorted:
        sub = partials[partials["label"] == lb]
        total = np.sum(
            [np.frombuffer(b, dtype=np.float64) for b in sub["sums"]], axis=0
        )
        cents.append(total / int(sub["n"].sum()))
    C = np.vstack(cents)
    cref = _ray.put((labels_sorted, C))

    def local_min(batch: pd.DataFrame) -> pd.DataFrame:
        labs, cent = _ray.get(cref)
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        lab = batch["label"].to_numpy(np.int64)
        idx = np.searchsorted(labs, lab)
        d2 = ((X - cent[idx]) ** 2).sum(axis=1)
        out = pd.DataFrame(
            {"label": lab, "vec_id": batch["vec_id"].to_numpy(np.int64), "d2": d2}
        )
        out = out.sort_values(["label", "d2", "vec_id"], kind="mergesort")
        return out.groupby("label", sort=False).head(1)

    local = ds.map_batches(local_min, batch_format="pandas").to_pandas()
    win = (
        local.sort_values(["label", "d2", "vec_id"], kind="mergesort")
        .groupby("label", sort=False)
        .head(1)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {"label": win["label"].astype("int64"),
         "vec_id": win["vec_id"].astype("int64"),
         "dist": np.round(np.sqrt(win["d2"].to_numpy(np.float64)), 4)}
    )


VEC_LABEL_MEDOID_SQL = """
with v as (
  select vec_id, label,
         generate_subscripts(embedding, 1) as dim_idx,
         unnest(embedding)::DOUBLE as x
  from embeddings
), c as (
  select label, dim_idx, avg(x) as m from v group by label, dim_idx
), d as (
  select v.vec_id, v.label, sum((v.x - c.m) * (v.x - c.m)) as d2
  from v join c on v.label = c.label and v.dim_idx = c.dim_idx
  group by v.vec_id, v.label
)
select label::BIGINT as label, vec_id, round(sqrt(d2), 4) as dist
from d
qualify row_number() over (partition by label order by d2, vec_id) = 1
"""


def _partial_moments(batch: pd.DataFrame) -> pd.DataFrame:
    """(n, Σx per dim, Σxᵀx) for one batch, flattened to bytes — the
    mergeable second-moment partial shared by vec_dim_stats and
    vec_top_eigen.  One matmul per batch; a d×d float64 matrix is
    ~32 kB at d=64, so a partial is KB-sized regardless of corpus."""
    X = np.vstack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
    return pd.DataFrame(
        [
            {
                "n": len(X),
                "sums": X.sum(axis=0).tobytes(),
                "xtx": (X.T @ X).tobytes(),
            }
        ]
    )


def _combined_moments(sf_dir: str) -> tuple[int, np.ndarray, np.ndarray]:
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["embedding"])
    partials = ds.map_batches(_partial_moments, batch_format="pandas").to_pandas()
    n = int(partials["n"].sum())
    s = np.sum([np.frombuffer(b, dtype=np.float64) for b in partials["sums"]], axis=0)
    d = len(s)
    xtx = np.sum(
        [np.frombuffer(b, dtype=np.float64).reshape(d, d) for b in partials["xtx"]],
        axis=0,
    )
    return n, s, xtx


def vec_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension mean and population variance of the embedding
    column — distributed moments: each batch collapses to one
    (n, Σx, Σx²-diagonal) partial; the driver folds O(blocks) KB-sized
    partials.  Oracle: DuckDB parallel-unnest + avg/var_pop."""
    n, s, xtx = _combined_moments(sf_dir)
    mean = s / n
    var = np.diag(xtx) / n - mean * mean
    return pd.DataFrame(
        {
            "dim_idx": np.arange(1, len(s) + 1, dtype=np.int64),
            "mean": np.round(mean, 6),
            "var_pop": np.round(var, 6),
        }
    ).astype({"dim_idx": "int64", "mean": "float64", "var_pop": "float64"})


VEC_DIM_STATS_SQL = """
with u as (
  select generate_subscripts(embedding, 1) as dim_idx,
         unnest(embedding)::DOUBLE as e
  from embeddings
)
select dim_idx, round(avg(e), 6) as mean, round(var_pop(e), 6) as var_pop
from u
group by dim_idx
"""


TOP_EIGEN_COMPONENTS = 8


def vec_top_eigen(sf_dir: str) -> pd.DataFrame:
    """Top principal-component spectrum of the embedding covariance
    (the PCA precursor): the SAME mergeable (n, Σx, Σxᵀx) partials as
    ``vec_dim_stats`` reduce to one d×d covariance on the driver, where
    ``numpy.linalg.eigh`` is exact and cheap (d², not corpus-sized).
    Output is the sign-free spectrum — eigenvalue + explained-variance
    share per component — so the result is deterministic.  Rows-only:
    no SQL engine exposes eigendecomposition."""
    n, s, xtx = _combined_moments(sf_dir)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    evals = np.linalg.eigh(cov)[0][::-1]  # descending
    total = float(evals.sum())
    k = min(TOP_EIGEN_COMPONENTS, len(evals))
    return pd.DataFrame(
        {
            "component": np.arange(1, k + 1, dtype=np.int64),
            "eigenvalue": np.round(evals[:k], 6),
            "explained_share": np.round(evals[:k] / total, 6),
        }
    ).astype(
        {"component": "int64", "eigenvalue": "float64", "explained_share": "float64"}
    )


DBSCAN_COS_THRESHOLD = 0.34
DBSCAN_MIN_NEIGHBORS = 3


def vec_dbscan(sf_dir: str) -> pd.DataFrame:
    """Density-based clustering (DBSCAN) over cosine neighborhoods —
    non-parametric corpus structure: no k, arbitrary shapes, explicit
    noise labels (22 clusters / 219 clustered / 281 noise at sf0.01).
    Composition of scale primitives: blocked ε-pair grid → bucketed
    degree combine → `membership_flag` core flags →
    `connected_components_auto` clusters → bounded border attach.
    Rows-only (graph algorithm); rule-equivalence vs a single-process
    numpy DBSCAN is pinned in tests/test_transcript_exports.py."""
    from ocr_poc_ray.functions.clustering import dbscan_cosine

    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    return dbscan_cosine(
        ds,
        threshold=DBSCAN_COS_THRESHOLD,
        min_neighbors=DBSCAN_MIN_NEIGHBORS,
    )


PCA_COMPONENTS = 2


def vec_pca_project(sf_dir: str) -> pd.DataFrame:
    """Distributed PCA projection: every embedding mapped onto the top
    ``PCA_COMPONENTS`` principal axes — the dimensionality-reduction
    step before visualization / cheap clustering at corpus scale.

    Scale shape: the covariance comes from the same mergeable
    (n, Σx, Σxᵀx) partials as ``vec_top_eigen`` (KB-sized per block);
    ``eigh`` runs once on the driver (d×d); mean + basis broadcast via
    ``ray.put`` (zero-copy numpy) and the projection is one matmul per
    batch.  Nothing corpus-sized leaves the workers.

    Determinism: eigenvectors are sign-ambiguous, so each axis is
    canonicalized to have its largest-|coordinate| entry positive.
    Rows-only driver check (no SQL eigendecomposition); exactness vs a
    single-process numpy PCA is pinned by
    tests/test_transcript_exports.py::test_pca_project_matches_numpy."""
    n, s, xtx = _combined_moments(sf_dir)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    k = min(PCA_COMPONENTS, len(evals))
    V = evecs[:, ::-1][:, :k]  # descending eigenvalue order
    # sign canon: largest-|entry| coordinate of each axis is positive
    flip = V[np.argmax(np.abs(V), axis=0), np.arange(k)] < 0
    V = V * np.where(flip, -1.0, 1.0)
    state = ray.put({"mean": mean, "V": V})

    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(state)
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
        P = (X - st["mean"]) @ st["V"]
        out = {"vec_id": batch["vec_id"].to_numpy(np.int64)}
        for j in range(P.shape[1]):
            out[f"pc{j + 1}"] = np.round(P[:, j], 6)
        return pd.DataFrame(out)

    out = ds.map_batches(project, batch_format="pandas").to_pandas()
    cast = {"vec_id": "int64"}
    cast.update({f"pc{j + 1}": "float64" for j in range(k)})
    return out.sort_values("vec_id").reset_index(drop=True).astype(cast)


JOIN_PARTS = 8


def vec_quality_centroids(sf_dir: str) -> pd.DataFrame:
    """Cross-table big-big join: per-label embedding centroids over
    ONLY the documents that pass the text quality gate — the
    embeddings table hash-joined to the quality-filtered doc ids.

    Scale shape: at 100 TB the filtered id set is corpus-sized, so
    broadcasting it is wrong; both sides hash-partition on the id via
    ``Dataset.join`` (each input ``repartition``-ed first — the Ray
    2.49 empty-block ArrowInvalid pitfall), then the joined stream
    collapses to per-label partial sum-vectors exactly like
    ``vec_group_centroids``."""
    import os as _os

    from ocr_poc_ray.functions.textstats import add_quality

    docs = ray.data.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    q = (
        add_quality(docs)
        .map_batches(
            lambda b: b.loc[b["is_quality"], ["doc_id"]].rename(
                columns={"doc_id": "vec_id"}
            ),
            batch_format="pandas",
        )
        .repartition(JOIN_PARTS)
    )
    def pack(batch: pd.DataFrame) -> pd.DataFrame:
        # Acero hash joins reject list<float> payload columns — carry
        # the vector across the exchange as fixed-width binary instead.
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"],
                "label": batch["label"],
                "emb": [
                    np.asarray(v, dtype=np.float64).tobytes()
                    for v in batch["embedding"]
                ],
            }
        )

    emb = (
        ray.data.read_parquet(
            _emb_path(sf_dir), columns=["vec_id", "embedding", "label"]
        )
        .map_batches(pack, batch_format="pandas")
        .repartition(JOIN_PARTS)
    )
    joined = emb.join(q, "inner", num_partitions=JOIN_PARTS, on=("vec_id",))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        X = np.vstack(
            [np.frombuffer(b, dtype=np.float64) for b in batch["emb"]]
        )
        lab = batch["label"].to_numpy()
        rows = []
        for g in np.unique(lab):
            sub = X[lab == g]
            rows.append(
                {"label": int(g), "n": len(sub), "sums": sub.sum(axis=0).tobytes()}
            )
        return pd.DataFrame(rows)

    partials = joined.map_batches(partial, batch_format="pandas").to_pandas()
    out = []
    for g, gdf in partials.groupby("label"):
        total = np.sum(
            [np.frombuffer(b, dtype=np.float64) for b in gdf["sums"]], axis=0
        )
        cent = np.round(total / int(gdf["n"].sum()), 6)
        for i, c in enumerate(cent):
            out.append({"label": int(g), "dim_idx": i + 1, "centroid": float(c)})
    return pd.DataFrame(out).astype(
        {"label": "int64", "dim_idx": "int64", "centroid": "float64"}
    )


def _quality_ids_subquery() -> str:
    from ocr_poc_ray.queries.documents import _STOP_EN_PATTERN, _STRIP

    return rf"""
  select doc_id from (
    select doc_id,
           length(text)::DOUBLE as n_chars,
           len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE as n_punct,
           case when {_STRIP('text')} = '' then 0
                else len(regexp_extract_all(text, '\S+')) end as ws_tokens
    from documents
  )
  where n_chars >= 50
    and (case when n_chars > 0 then n_punct / n_chars else 0.0 end) <= 0.20
    and ws_tokens >= 10
"""


def _vec_quality_centroids_sql() -> str:
    return f"""
with q as ({_quality_ids_subquery()}),
u as (
  select e.label, generate_subscripts(e.embedding, 1) as dim_idx,
         unnest(e.embedding)::DOUBLE as v
  from embeddings e join q on e.vec_id = q.doc_id
)
select label, dim_idx, round(avg(v), 6) as centroid
from u
group by label, dim_idx
"""


def vec_kmeans(sf_dir: str) -> pd.DataFrame:
    """Distributed k-means over the embedding corpus (broadcast-refine:
    centroids broadcast per iteration, per-batch matmul assignment +
    k-row packed-sum partials, O(k·d) driver combine).  Rows-only by
    design: parity with a single-process run holds only up to float
    summation order, so the verification is the well-separated-blob
    recovery test in tests/test_functions.py."""
    from ocr_poc_ray.functions.clustering import kmeans_fit

    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    _centroids, summary = kmeans_fit(ds, k=8, n_iters=8, seed=7)
    summary["sse"] = summary["sse"].round(4)
    return summary.sort_values("cluster", kind="mergesort").reset_index(drop=True)



NORM_OUTLIER_MULT = 1.5  # flag norms > p90 * 1.5 or < p10 / 1.5


def vec_norm_outliers(sf_dir: str) -> pd.DataFrame:
    """Embedding-norm outlier detection: vectors whose L2 norm falls
    outside [p10/1.5, p90*1.5] — the degenerate-embedding screen
    (all-zeros, exploding activations, truncated rows) a vector corpus
    needs before indexing.  Norms are row-local; the exact p10/p90 of
    the CONTINUOUS norm distribution come from the iterative
    range-refinement selection (functions.selection — no sort of the
    corpus, bounded combines); flagging is a second row-local pass."""
    from ocr_poc_ray.functions.selection import exact_group_quantiles_disc

    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])

    def norms(b: pd.DataFrame) -> pd.DataFrame:
        from ocr_poc_ray.functions.similarity import _to_matrix

        X = _to_matrix(b["embedding"])
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].astype("int64"),
                "norm": np.sqrt((X * X).sum(axis=1)),
                "_g": np.zeros(len(b), dtype=np.int64),
            }
        )

    with_norms = ds.map_batches(norms, batch_format="pandas").materialize()
    qs = exact_group_quantiles_disc(
        with_norms, key_col="_g", value_col="norm", qs=[0.1, 0.9]
    )
    p10 = float(qs.loc[qs["q"] == 0.1, "value"].iloc[0])
    p90 = float(qs.loc[qs["q"] == 0.9, "value"].iloc[0])
    lo, hi = p10 / NORM_OUTLIER_MULT, p90 * NORM_OUTLIER_MULT

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        n = b["norm"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "vec_id": b["vec_id"].astype("int64"),
                "norm": np.round(n, 6),
                "is_outlier": (n < lo) | (n > hi),
            }
        )

    out = with_norms.map_batches(flag, batch_format="pandas").to_pandas()
    return out[["vec_id", "norm", "is_outlier"]].astype(
        {"vec_id": "int64", "norm": "float64", "is_outlier": "bool"}
    )


VEC_NORM_OUTLIERS_SQL = f"""
with n as (
  select vec_id,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
           as norm
  from embeddings
), q as (
  select quantile_disc(norm, 0.1) as p10, quantile_disc(norm, 0.9) as p90
  from n
)
select vec_id, round(norm, 6) as norm,
       (norm < q.p10 / {NORM_OUTLIER_MULT}
        or norm > q.p90 * {NORM_OUTLIER_MULT}) as is_outlier
from n, q
"""


EXEMPLARS_PER_CLUSTER = 3


def vec_cluster_exemplars(sf_dir: str) -> pd.DataFrame:
    """Cluster representative selection: the 3 vectors closest to their
    k-means centroid per cluster — the diverse-exemplar pick a
    semantic-dedup or visualization step consumes after clustering.
    Centroids broadcast once; per-batch local bottom-k per cluster (the
    combiner) → bounded-bucket final; cluster count never becomes a Ray
    group count.  Rows-only like vec_kmeans (float iteration order)."""
    import ray as _ray

    from ocr_poc_ray.functions.clustering import kmeans_fit
    from ocr_poc_ray.functions.similarity import _to_matrix

    k = EXEMPLARS_PER_CLUSTER
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    centroids, _summary = kmeans_fit(ds, k=8, n_iters=6, seed=7)
    cref = _ray.put(centroids)

    def local_bottomk(b: pd.DataFrame) -> pd.DataFrame:
        C = _ray.get(cref)
        X = _to_matrix(b["embedding"])
        d2 = (
            (X * X).sum(axis=1)[:, None]
            - 2.0 * (X @ C.T)
            + (C * C).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        out = pd.DataFrame(
            {
                "cluster": a.astype("int64"),
                "vec_id": b["vec_id"].to_numpy(np.int64),
                "dist2": d2[np.arange(len(b)), a],
            }
        )
        out = out.sort_values(["cluster", "dist2", "vec_id"], kind="mergesort")
        return out.groupby("cluster", sort=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster", "dist2", "vec_id"], kind="mergesort")
        w = g.groupby("cluster", sort=False).head(k).copy()
        w["rank"] = w.groupby("cluster", sort=False).cumcount()
        return pd.DataFrame(
            {
                "cluster": w["cluster"].astype("int64"),
                "rank": w["rank"].astype("int64"),
                "vec_id": w["vec_id"].astype("int64"),
                "dist": np.round(np.sqrt(w["dist2"].to_numpy(np.float64)), 6),
            }
        )

    out = (
        ds.map_batches(local_bottomk, batch_format="pandas")
        .map_batches(
            lambda b: b.assign(_hb=(b["cluster"] % 4).astype("int64")),
            batch_format="pandas",
        )
        .groupby("_hb")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["cluster", "rank"]).reset_index(drop=True)

SEM_DEDUP_THRESHOLD = 0.35


def vec_semantic_dedup(sf_dir: str) -> pd.DataFrame:
    """SemDeDup-style survivors: drop a vector iff a lower-id SAME-label
    vector is cosine-0.35 close (per-label near-dup pair set -> distinct
    losers -> membership anti-join; rule documented in
    ``functions/similarity.py::semantic_dedup``)."""
    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding", "label"]
    )
    out = semantic_dedup(ds, threshold=SEM_DEDUP_THRESHOLD).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"vec_id": pd.Series(dtype="int64"),
                             "label": pd.Series(dtype="int64")})
    out = out.sort_values("vec_id").reset_index(drop=True)
    return out[["vec_id", "label"]].astype({"vec_id": "int64", "label": "int64"})


VEC_SEMANTIC_DEDUP_SQL = f"""
select e.vec_id, e.label::BIGINT as label
from embeddings e
where not exists (
  select 1 from embeddings a
  where a.label = e.label and a.vec_id < e.vec_id
    and list_cosine_similarity(a.embedding::DOUBLE[], e.embedding::DOUBLE[])
        >= {SEM_DEDUP_THRESHOLD}
)
order by e.vec_id
"""


def vec_contrastive_pairs(sf_dir: str) -> pd.DataFrame:
    """Hard-pair mining for contrastive/metric training: per vector the
    hardest positive (max-cosine same-label neighbor) and hardest
    negative (max-cosine other-label neighbor), ties to the smallest
    neighbor id (rule in ``functions/similarity.py::contrastive_pairs``)."""
    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding", "label"]
    )
    out = contrastive_pairs(ds).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64" if c.endswith("id") else "float64")
                             for c in ["vec_id", "pos_id", "pos_cos", "neg_id", "neg_cos"]})
    out = out.sort_values("vec_id").reset_index(drop=True)
    return out[["vec_id", "pos_id", "pos_cos", "neg_id", "neg_cos"]].astype(
        {"vec_id": "int64", "pos_id": "int64", "pos_cos": "float64",
         "neg_id": "int64", "neg_cos": "float64"}
    )


VEC_CONTRASTIVE_PAIRS_SQL = """
with s as (
  select a.vec_id, b.vec_id as nid, (a.label = b.label) as same,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) as sim
  from embeddings a join embeddings b on a.vec_id <> b.vec_id
), r as (
  select vec_id, same, nid, sim,
         row_number() over (
           partition by vec_id, same order by round(sim, 4) desc, nid
         ) as rn
  from s
)
select p.vec_id, p.nid as pos_id, round(p.sim, 4) as pos_cos,
       n.nid as neg_id, round(n.sim, 4) as neg_cos
from r p join r n on p.vec_id = n.vec_id
where p.rn = 1 and n.rn = 1 and p.same and not n.same
order by p.vec_id
"""


def vec_knn_ivf_index(sf_dir: str) -> pd.DataFrame:
    """Build-once/query-many ANN: the persisted partitioned IVF index
    (``functions/ann_index.py``) built under /tmp per corpus, then
    queried reading ONLY the probed list partitions."""
    import hashlib
    import os as _os
    import tempfile

    from ocr_poc_ray.functions.ann_index import build_ivf_index, knn_ivf_index

    emb = _emb_path(sf_dir)
    tag = hashlib.md5(
        f"{emb}:{_os.path.getmtime(emb)}:{_os.path.getsize(emb)}".encode()
    ).hexdigest()[:12]
    idx = _os.path.join(tempfile.gettempdir(), f"ocr_poc_ray_ivf_{tag}")
    if not _os.path.exists(_os.path.join(idx, "meta.json")):
        ds = ray.data.read_parquet(emb, columns=["vec_id", "embedding"])
        build_ivf_index(ds, idx, nlist=16)
    ids, vecs = _query_vectors(sf_dir)
    out = knn_ivf_index(idx, ids, vecs, k=KNN_K, nprobe=8).to_pandas()
    out = out[["query_id", "neighbor_id", "cosine", "rank"]]
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True).astype(
        {"query_id": "int64", "neighbor_id": "int64",
         "cosine": "float64", "rank": "int64"}
    )


def vec_knn_hnsw_index(sf_dir: str) -> pd.DataFrame:
    """Build-once/query-many HNSW: the persisted sharded graph index
    (``functions/hnsw.py``) built under /tmp per corpus, then queried
    by deserializing each shard's graph — no insertion loop on the
    query path (the IVF-index economics applied to graph ANN)."""
    import hashlib
    import json as _json
    import os as _os
    import tempfile

    from ocr_poc_ray.functions.hnsw import (
        _HNSW_INDEX_VERSION,
        build_hnsw_index,
        knn_hnsw_index,
    )

    emb = _emb_path(sf_dir)
    tag = hashlib.md5(
        f"{emb}:{_os.path.getmtime(emb)}:{_os.path.getsize(emb)}".encode()
    ).hexdigest()[:12]
    idx = _os.path.join(tempfile.gettempdir(), f"ocr_poc_ray_hnsw_{tag}")
    meta_path = _os.path.join(idx, "meta.json")
    cached = False
    if _os.path.exists(meta_path):  # meta presence == one complete generation
        with open(meta_path) as f:
            cached = _json.load(f).get("version") == _HNSW_INDEX_VERSION
    if not cached:
        ds = ray.data.read_parquet(emb, columns=["vec_id", "embedding"])
        build_hnsw_index(ds, idx)
    ids, vecs = _query_vectors(sf_dir)
    out = knn_hnsw_index(idx, ids, vecs, k=KNN_K, ef_search=64).to_pandas()
    out = out[["query_id", "neighbor_id", "cosine", "rank"]]
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True).astype(
        {"query_id": "int64", "neighbor_id": "int64",
         "cosine": "float64", "rank": "int64"}
    )


def vec_knn_recall(sf_dir: str) -> pd.DataFrame:
    """ANN quality report: recall@k of every approximate path (LSH /
    IVF / PQ) against the brute-force baseline on the SAME query set —
    the measurement a corpus owner reads before trusting an index at
    scale.  Both sides are deterministic, so the report is stable; it
    is a cross-algorithm comparison, not a relational expression →
    rows-only (the per-path recall floors are pinned by
    tests/test_functions.py's ANN tests)."""
    ids, vecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    exact = knn_brute_force(ds, ids, vecs, k=KNN_K).to_pandas()
    truth = exact.groupby("query_id")["neighbor_id"].agg(set)

    rows = []
    for method, got in (
        ("lsh", knn_lsh(ds, ids, vecs, k=KNN_K, nbits=4, n_tables=16)),
        ("ivf", knn_ivf(ds, ids, vecs, k=KNN_K, nlist=16, nprobe=6)),
        ("pq", knn_pq(ds, ids, vecs, k=KNN_K, m=16, nbits=4)),
    ):
        g = got.to_pandas().groupby("query_id")["neighbor_id"].agg(set)
        rec = np.array(
            [len(g.get(q, set()) & truth[q]) / max(len(truth[q]), 1)
             for q in truth.index]
        )
        rows.append(
            {"method": method,
             "n_queries": int(len(truth)),
             "mean_recall": round(float(rec.mean()), 4),
             "min_recall": round(float(rec.min()), 4)}
        )
    return pd.DataFrame(rows).astype(
        {"n_queries": "int64", "mean_recall": "float64", "min_recall": "float64"}
    )


def vec_logreg_train(sf_dir: str) -> pd.DataFrame:
    """Distributed supervised training: multinomial logistic regression
    over the embedding corpus predicting ``label`` (broadcast-refine
    full-batch GD — parameters broadcast per epoch, per-batch packed
    gradient partials, tree-reduced combine; functions/trainer.py).
    The learn-then-score analog of the reference's load-once model
    stage (`ocr/paddle_extractor.py:21-34`), with the weights produced
    BY the engine instead of shipped to it.  Returns the per-label
    training report (n / correct / accuracy).  Rows-only like
    vec_kmeans: parity with one process holds only up to float
    summation order; the equality + partition-invariance +
    blob-recovery contract lives in tests/test_trainer.py."""
    import ray as _ray

    from ocr_poc_ray.functions.similarity import _to_matrix
    from ocr_poc_ray.functions.trainer import (
        softmax_logreg_fit,
    )

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding", "label"]
    )
    n_classes = 10  # testdata label alphabet (embeddings.label in 0..9)
    # lr/epochs tuned against the single-process ceiling on this table
    # (nearest-centroid 0.41, 300-epoch linear 0.44; this lands ~0.40)
    W, _hist = softmax_logreg_fit(ds, n_classes=n_classes, n_epochs=40, lr=10.0)
    wref = _ray.put(W)

    def label_report(b: pd.DataFrame) -> pd.DataFrame:
        Wc = _ray.get(wref)
        X = _to_matrix(b["embedding"]).astype(np.float64)
        X = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        y = b["label"].to_numpy().astype(np.int64)
        pred = (X @ Wc.T).argmax(axis=1)
        n = np.bincount(y, minlength=n_classes)
        ok = np.bincount(y[pred == y], minlength=n_classes)
        return pd.DataFrame(
            {
                "label": np.arange(n_classes, dtype="int64"),
                "n": n.astype("int64"),
                "correct": ok.astype("int64"),
            }
        )

    parts = ds.map_batches(label_report, batch_format="pandas").to_pandas()
    rep = parts.groupby("label", as_index=False).agg(
        n_points=("n", "sum"), correct=("correct", "sum")
    )
    rep = rep[rep["n_points"] > 0].copy()
    rep["accuracy"] = (rep["correct"] / rep["n_points"]).round(4)
    return (
        rep.astype(
            {"label": "int64", "n_points": "int64", "correct": "int64"}
        )
        .sort_values("label", kind="mergesort")
        .reset_index(drop=True)
    )


MMR_LAMBDA = 0.7
MMR_POOL = 50
MMR_K = 10


def vec_mmr_topk(sf_dir: str) -> pd.DataFrame:
    """Maximal Marginal Relevance diverse top-k (Carbonell & Goldstein
    1998): greedy selection trading query relevance against similarity
    to already-selected results — the diverse-retrieval exit for RAG /
    training-example selection.  Shape: the candidate pool per query is
    the DISTRIBUTED brute-force top-``MMR_POOL``; only pool-sized id
    lists and a pool-sized vector fetch reach the driver, where the
    O(k·pool) greedy loop runs (k and pool are constants — never
    corpus-sized).  Rows-only: greedy argmax chains are not SQL; the
    selection is pinned by a numpy-equivalence unit."""
    ids, vecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    cand = knn_brute_force(ds, ids, vecs, k=MMR_POOL).to_pandas()

    # one bounded vector fetch for every candidate id (pool × queries)
    need = np.unique(cand["neighbor_id"].to_numpy(np.int64))

    def fetch(b: pd.DataFrame) -> pd.DataFrame:
        m = b[b["vec_id"].isin(need)]
        return m[["vec_id", "embedding"]]

    got = ds.map_batches(fetch, batch_format="pandas").to_pandas()
    vmat = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in got.itertuples()
    }
    qmat = {int(q): v / np.linalg.norm(v) for q, v in zip(ids, vecs)}

    rows = []
    for qid, grp in cand.groupby("query_id"):
        pool = grp.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True]
        )["neighbor_id"].to_numpy(np.int64)
        P = np.stack([vmat[int(i)] for i in pool])
        P = P / np.linalg.norm(P, axis=1, keepdims=True)
        rel = P @ qmat[int(qid)]
        max_sim = np.full(len(pool), -np.inf)
        avail = np.ones(len(pool), dtype=bool)
        for rank in range(1, MMR_K + 1):
            if rank == 1:
                score = rel.copy()
            else:
                score = MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * max_sim
            score[~avail] = -np.inf
            # deterministic tie-break: highest score, then smallest id
            best = np.lexsort((pool, -score))[0]
            avail[best] = False
            max_sim = np.maximum(max_sim, P @ P[best])
            rows.append(
                {
                    "query_id": int(qid),
                    "sel_rank": rank,
                    "vec_id": int(pool[best]),
                    "relevance": round(float(rel[best]), 4),
                }
            )
    out = pd.DataFrame(rows)
    return out.astype(
        {"query_id": "int64", "sel_rank": "int64", "vec_id": "int64",
         "relevance": "float64"}
    )


TRUNC_DIMS = (8, 16, 32, 64)


def vec_dim_truncation_recall(sf_dir: str) -> pd.DataFrame:
    """Matryoshka-style truncation audit: recall@k of cosine search
    using only the first d dimensions against the full-width baseline —
    the storage/latency-vs-quality curve read before shipping truncated
    embeddings.  Each truncated pass is the same distributed brute-force
    top-k over `pc.list_slice` views (zero-copy Arrow prefix slices);
    recall is integer-exact ppm.  Rows-only (cross-run comparison); the
    d=full row is pinned to recall 1.0 by the unit test."""
    import pyarrow.compute as pc

    ids, vecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    full = knn_brute_force(ds, ids, vecs, k=KNN_K).to_pandas()
    truth = full.groupby("query_id")["neighbor_id"].agg(set)

    rows = []
    for d in TRUNC_DIMS:
        def trunc(t, _d=d):
            return t.set_column(
                t.schema.get_field_index("embedding"),
                "embedding",
                pc.list_slice(t["embedding"], 0, _d),
            )

        got = knn_brute_force(
            ds.map_batches(trunc, batch_format="pyarrow"),
            ids,
            vecs[:, :d],
            k=KNN_K,
        ).to_pandas()
        g = got.groupby("query_id")["neighbor_id"].agg(set)
        hits = sum(len(g.get(q, set()) & truth[q]) for q in truth.index)
        total = sum(len(truth[q]) for q in truth.index)
        rows.append(
            {
                "dim": d,
                "n_queries": len(truth),
                "recall_ppm": (hits * 1_000_000) // total if total else 1_000_000,
            }
        )
    return pd.DataFrame(rows).astype(
        {"dim": "int64", "n_queries": "int64", "recall_ppm": "int64"}
    )


PROBE_CURVE = (1, 2, 4, 8, 16)


def vec_ivf_probe_curve(sf_dir: str) -> pd.DataFrame:
    """IVF tuning curve: recall@k against the brute-force baseline at
    nprobe ∈ {1,2,4,8,16} (nlist=16, so nprobe=16 scans every list and
    must hit recall 1.0 — the built-in sanity pin).  The measurement
    that picks the probe count before an index ships; integer-ppm.
    Rows-only (cross-run comparison, same contract as vec_knn_recall)."""
    ids, vecs = _query_vectors(sf_dir)
    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    exact = knn_brute_force(ds, ids, vecs, k=KNN_K).to_pandas()
    truth = exact.groupby("query_id")["neighbor_id"].agg(set)

    rows = []
    for nprobe in PROBE_CURVE:
        got = knn_ivf(ds, ids, vecs, k=KNN_K, nlist=16, nprobe=nprobe).to_pandas()
        g = got.groupby("query_id")["neighbor_id"].agg(set)
        hits = sum(len(g.get(q, set()) & truth[q]) for q in truth.index)
        total = sum(len(truth[q]) for q in truth.index)
        rows.append(
            {"nprobe": nprobe,
             "n_queries": len(truth),
             "recall_ppm": (hits * 1_000_000) // total if total else 1_000_000}
        )
    return pd.DataFrame(rows).astype(
        {"nprobe": "int64", "n_queries": "int64", "recall_ppm": "int64"}
    )


HNSW_EF_CURVE = (4, 8, 16, 64, 512)


def vec_hnsw_ef_curve(sf_dir: str) -> pd.DataFrame:
    """HNSW tuning curve: recall@k vs ef_search — the beam-width
    counterpart of vec_ivf_probe_curve (the measurement that picks
    ef before an index ships).  ef=512 exceeds every shard's size at
    the checked scales, so the beam degenerates to an exact scan and
    recall pins to 1.0 — the built-in sanity row.  Integer-ppm,
    rows-only (approximate by design)."""
    from ocr_poc_ray.functions.hnsw import knn_hnsw

    ids, vecs = _query_vectors(sf_dir)
    # materialize once: the brute-force pass plus five knn_hnsw calls
    # would otherwise each re-read (and possibly re-slice) the corpus,
    # so every ef point searches IDENTICAL shard compositions and the
    # parquet is scanned a single time
    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    ).materialize()
    exact = knn_brute_force(ds, ids, vecs, k=KNN_K).to_pandas()
    truth = exact.groupby("query_id")["neighbor_id"].agg(set)

    rows = []
    for ef in HNSW_EF_CURVE:
        got = knn_hnsw(ds, ids, vecs, k=KNN_K, ef_search=ef, shard_rows=512).to_pandas()
        g = got.groupby("query_id")["neighbor_id"].agg(set)
        hits = sum(len(g.get(q, set()) & truth[q]) for q in truth.index)
        total = sum(len(truth[q]) for q in truth.index)
        rows.append(
            {"ef_search": ef,
             "n_queries": len(truth),
             "recall_ppm": (hits * 1_000_000) // total if total else 1_000_000}
        )
    return pd.DataFrame(rows).astype(
        {"ef_search": "int64", "n_queries": "int64", "recall_ppm": "int64"}
    )


REGISTRY = {
    "vec_mmr_topk": (vec_mmr_topk, None),
    "vec_hnsw_ef_curve": (vec_hnsw_ef_curve, None),
    "vec_ivf_probe_curve": (vec_ivf_probe_curve, None),
    "vec_dim_truncation_recall": (vec_dim_truncation_recall, None),
    "vec_kmeans": (vec_kmeans, None),
    "vec_logreg_train": (vec_logreg_train, None),
    "vec_knn_recall": (vec_knn_recall, None),
    "vec_group_centroids": (vec_group_centroids, VEC_GROUP_CENTROIDS_SQL),
    "vec_dim_stats": (vec_dim_stats, VEC_DIM_STATS_SQL),
    "vec_top_eigen": (vec_top_eigen, None),
    "vec_pca_project": (vec_pca_project, None),
    "vec_dbscan": (vec_dbscan, None),
    "vec_quality_centroids": (vec_quality_centroids, _vec_quality_centroids_sql()),
    "vec_knn_cosine": (vec_knn_cosine, VEC_KNN_COSINE_SQL),
    "vec_knn_lsh": (vec_knn_lsh, None),
    "vec_knn_ivf": (vec_knn_ivf, None),
    "vec_knn_ivf_index": (vec_knn_ivf_index, None),
    "vec_knn_pq": (vec_knn_pq, None),
    "vec_knn_hnsw": (vec_knn_hnsw, None),
    "vec_knn_hnsw_index": (vec_knn_hnsw_index, None),
    "vec_near_dup": (vec_near_dup, VEC_NEAR_DUP_SQL),
    "vec_semantic_dedup": (vec_semantic_dedup, VEC_SEMANTIC_DEDUP_SQL),
    "vec_contrastive_pairs": (vec_contrastive_pairs, VEC_CONTRASTIVE_PAIRS_SQL),
    "vec_norm_outliers": (vec_norm_outliers, VEC_NORM_OUTLIERS_SQL),
    "vec_cluster_exemplars": (vec_cluster_exemplars, None),
    "vec_label_medoid": (vec_label_medoid, VEC_LABEL_MEDOID_SQL),
}
