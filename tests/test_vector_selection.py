"""MMR diverse top-k and dimension-truncation recall — numpy-equivalence
and structural pins for the rows-only vector-selection reports."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _table() -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat


def _mmr_reference(ids, mat, qid, lam, pool_k, k):
    """Single-process MMR over the whole table — the oracle."""
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = n[ids == qid][0]
    sims = n @ q
    mask = ids != qid
    cand_idx = np.arange(len(ids))[mask]
    order = np.lexsort((ids[cand_idx], -sims[cand_idx]))[:pool_k]
    pool_idx = cand_idx[order]
    pool_ids, P = ids[pool_idx], n[pool_idx]
    rel = P @ q
    max_sim = np.full(len(pool_ids), -np.inf)
    avail = np.ones(len(pool_ids), dtype=bool)
    out = []
    for rank in range(1, k + 1):
        score = rel.copy() if rank == 1 else lam * rel - (1 - lam) * max_sim
        score[~avail] = -np.inf
        best = np.lexsort((pool_ids, -score))[0]
        avail[best] = False
        max_sim = np.maximum(max_sim, P @ P[best])
        out.append(int(pool_ids[best]))
    return out


def test_mmr_matches_numpy_reference(ray_session):
    from ocr_poc_ray.queries.vectors import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
        vec_mmr_topk,
    )

    ids, mat = _table()
    out = vec_mmr_topk(SF_DIR)
    assert set(out.columns) == {"query_id", "sel_rank", "vec_id", "relevance"}
    for qid, grp in out.groupby("query_id"):
        got = grp.sort_values("sel_rank")["vec_id"].tolist()
        want = _mmr_reference(ids, mat, qid, MMR_LAMBDA, MMR_POOL, MMR_K)
        assert got == want, f"query {qid}"
    # every query from the % 100 == 0 set is present with exactly K rows
    n_queries = int((ids % 100 == 0).sum())
    assert out.groupby("query_id").size().eq(MMR_K).all()
    assert out["query_id"].nunique() == n_queries


def test_mmr_first_pick_is_top1(ray_session):
    """Rank-1 MMR selection is pure relevance — must equal brute top-1."""
    from ocr_poc_ray.queries.vectors import vec_knn_cosine, vec_mmr_topk

    mmr = vec_mmr_topk(SF_DIR)
    knn = vec_knn_cosine(SF_DIR)
    first = mmr[mmr["sel_rank"] == 1].set_index("query_id")["vec_id"]
    top1 = knn[knn["rank"] == 1].set_index("query_id")["neighbor_id"]
    for q in first.index:
        assert first[q] == top1[q]


def test_ivf_probe_curve_pins(ray_session):
    """nprobe = nlist scans every list → recall exactly 1.0; recall is
    monotone non-decreasing in nprobe (probed lists only ever grow)."""
    from ocr_poc_ray.queries.vectors import PROBE_CURVE, vec_ivf_probe_curve

    out = vec_ivf_probe_curve(SF_DIR)
    assert list(out["nprobe"]) == list(PROBE_CURVE)
    assert out.iloc[-1]["recall_ppm"] == 1_000_000  # nprobe == nlist
    rec = out["recall_ppm"].tolist()
    assert rec == sorted(rec)
    assert (out["recall_ppm"] > 0).all()


def test_hnsw_ef_curve_pins(ray_session):
    """ef >= shard size degenerates the beam to an exact scan → the
    last row pins recall at exactly 1.0; the curve never falls far as
    ef grows (greedy entry points can jitter a hair between efs)."""
    from ocr_poc_ray.queries.vectors import HNSW_EF_CURVE, vec_hnsw_ef_curve

    out = vec_hnsw_ef_curve(SF_DIR)
    assert list(out["ef_search"]) == list(HNSW_EF_CURVE)
    assert out.iloc[-1]["recall_ppm"] == 1_000_000
    rec = out["recall_ppm"].tolist()
    assert all(b >= a - 50_000 for a, b in zip(rec, rec[1:]))
    assert (out["recall_ppm"] > 0).all()


def test_dim_truncation_recall_pins(ray_session):
    from ocr_poc_ray.queries.vectors import TRUNC_DIMS, vec_dim_truncation_recall

    out = vec_dim_truncation_recall(SF_DIR)
    assert list(out["dim"]) == list(TRUNC_DIMS)
    full = out[out["dim"] == 64].iloc[0]
    assert full["recall_ppm"] == 1_000_000  # full width IS the baseline
    assert (out["recall_ppm"] <= 1_000_000).all()
    assert (out["recall_ppm"] > 0).all()
    assert out["n_queries"].nunique() == 1
