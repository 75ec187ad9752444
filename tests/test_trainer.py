"""Distributed-trainer contract (functions/trainer.py): equality with a
single-process numpy reference, partition invariance, planted-signal
learnability, and the tree reduce — the verification shape of
kmeans_fit (rows-only registered queries, tolerance tests)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _softmax(Z: np.ndarray) -> np.ndarray:
    Z = Z - Z.max(axis=1, keepdims=True)
    E = np.exp(Z)
    return E / E.sum(axis=1, keepdims=True)


def _blob_rows(n_per: int, seed: int = 3):
    """3 well-separated 8-dim gaussian blobs with labels."""
    rng = np.random.RandomState(seed)
    centers = np.array(
        [[6.0] + [0.0] * 7, [0.0, 6.0] + [0.0] * 6, [0.0, 0.0, 6.0] + [0.0] * 5]
    )
    rows = []
    for c in range(3):
        X = centers[c] + rng.standard_normal((n_per, 8)) * 0.5
        for i in range(n_per):
            rows.append(
                {
                    "vec_id": c * n_per + i,
                    "embedding": X[i].astype(np.float32),
                    "label": c,
                }
            )
    return rows


def _marker_docs(n: int):
    """Deterministic docs where y=1 docs contain the marker tokens —
    a linearly separable planted signal."""
    rows = []
    for i in range(n):
        base = [f"tok{(i * 7 + j) % 50}" for j in range(20)]
        y = i % 2
        if y:
            base[3] = "zzmarker"
            base[11] = "zzmarker"
        rows.append({"doc_id": i, "text": " ".join(base), "y": y})
    return rows


def _fit_text_reference(df: pd.DataFrame, *, dim, n_epochs, lr, reg):
    """Flat single-process run of the exact same GD recipe."""
    from ocr_poc_ray.functions.dedup import _batch_token_hashes
    from ocr_poc_ray.functions.trainer import LEN_SCALE

    th, offsets = _batch_token_hashes(df["text"])
    bucket = (th % np.uint64(dim)).astype(np.int64)
    lens = np.diff(offsets)
    y = df["y"].to_numpy().astype(np.float64)
    w = np.zeros(dim + 2)
    for _ in range(n_epochs):
        margins = w[dim + 1] + (lens / LEN_SCALE) * w[dim]
        ne = lens > 0
        if ne.any():
            margins[ne] += np.add.reduceat(w[bucket], offsets[:-1][ne])
        p = 1.0 / (1.0 + np.exp(-np.clip(margins, -30.0, 30.0)))
        r = p - y
        g = np.zeros(dim + 2)
        if ne.any():
            g[:dim] = np.bincount(bucket, weights=np.repeat(r, lens), minlength=dim)
        g[dim] = float((r * (lens / LEN_SCALE)).sum())
        g[dim + 1] = r.sum()
        g /= len(y)
        g[:dim] += reg * w[:dim]
        w -= lr * g
    return w


def test_text_logreg_matches_single_process(ray_session):
    from ocr_poc_ray.functions.trainer import text_logreg_fit

    rows = _marker_docs(120)
    df = pd.DataFrame(rows)
    ds = rd.from_items(rows).repartition(4)
    kw = dict(dim=512, n_epochs=12, lr=0.05, reg=1e-6)
    w_dist, hist = text_logreg_fit(ds, **kw)
    w_ref = _fit_text_reference(df, **kw)
    # partials combine in a different order than one flat sum — that is
    # the ONLY permitted divergence
    np.testing.assert_allclose(w_dist, w_ref, rtol=1e-9, atol=1e-12)
    assert len(hist) == 12
    assert hist["accuracy"].iloc[-1] >= hist["accuracy"].iloc[0]


def test_text_logreg_partition_invariance(ray_session):
    from ocr_poc_ray.functions.trainer import text_logreg_fit

    rows = _marker_docs(90)
    kw = dict(dim=512, n_epochs=8, lr=0.05, reg=0.0)
    w1, _ = text_logreg_fit(rd.from_items(rows).repartition(1), **kw)
    w7, _ = text_logreg_fit(rd.from_items(rows).repartition(7), **kw)
    np.testing.assert_allclose(w1, w7, rtol=1e-9, atol=1e-12)


def test_text_logreg_learns_planted_signal(ray_session):
    from ocr_poc_ray.functions.trainer import (
        text_logreg_fit,
        text_logreg_score,
    )

    rows = _marker_docs(200)
    ds = rd.from_items(rows).repartition(3)
    w, hist = text_logreg_fit(ds, dim=512, n_epochs=30, lr=0.5)
    assert hist["accuracy"].iloc[-1] == 1.0  # separable by construction
    scored = text_logreg_score(ds, w, dim=512).to_pandas()
    truth = pd.DataFrame(rows)[["doc_id", "y"]]
    m = scored.merge(truth, on="doc_id")
    assert (m["pred"] == m["y"]).all()
    # scores are calibrated probabilities, marker docs score higher
    assert m.loc[m["y"] == 1, "score"].min() > m.loc[m["y"] == 0, "score"].max()


def test_text_logreg_empty_and_empty_docs(ray_session):
    from ocr_poc_ray.functions.trainer import text_logreg_fit

    w, hist = text_logreg_fit(
        rd.from_items([{"doc_id": 0, "text": "a", "y": 1}]).limit(0),
        dim=64,
    )
    assert w.shape == (66,) and len(hist) == 0
    # empty-text docs train without NaNs (zero tokens ⇒ bias-only row)
    rows = _marker_docs(40) + [
        {"doc_id": 1000 + i, "text": "", "y": 0} for i in range(5)
    ]
    w, hist = text_logreg_fit(
        rd.from_items(rows).repartition(3), dim=512, n_epochs=5, lr=0.05
    )
    assert np.isfinite(w).all()


def test_softmax_recovers_blobs_and_matches_reference(ray_session):
    from ocr_poc_ray.functions.trainer import (
        softmax_logreg_fit,
        softmax_logreg_predict,
    )

    rows = _blob_rows(40)
    ds = rd.from_items(rows).repartition(5)
    W, hist = softmax_logreg_fit(ds, n_classes=3, n_epochs=20, lr=2.0, reg=1e-4)
    assert hist["accuracy"].iloc[-1] >= 0.99  # well-separated blobs

    # flat numpy reference with the identical recipe
    df = pd.DataFrame(rows)
    X = np.vstack(df["embedding"].to_numpy()).astype(np.float64)
    Xa = np.concatenate([X, np.ones((len(X), 1))], axis=1)
    y = df["label"].to_numpy()
    Wr = np.zeros((3, 9))
    for _ in range(20):
        P = _softmax(Xa @ Wr.T)
        R = P
        R[np.arange(len(y)), y] -= 1.0
        G = R.T @ Xa / len(y)
        G[:, :-1] += 1e-4 * Wr[:, :-1]
        Wr -= 2.0 * G
    np.testing.assert_allclose(W, Wr, rtol=1e-9, atol=1e-12)

    pred = softmax_logreg_predict(ds, W).to_pandas()
    m = pred.merge(df[["vec_id", "label"]], on="vec_id")
    assert (m["pred"] == m["label"]).mean() >= 0.99


def test_softmax_partition_invariance(ray_session):
    from ocr_poc_ray.functions.trainer import softmax_logreg_fit

    rows = _blob_rows(25, seed=11)
    kw = dict(n_classes=3, n_epochs=8, lr=2.0)
    W1, _ = softmax_logreg_fit(rd.from_items(rows).repartition(1), **kw)
    W6, _ = softmax_logreg_fit(rd.from_items(rows).repartition(6), **kw)
    np.testing.assert_allclose(W1, W6, rtol=1e-9, atol=1e-12)


def test_reduce_partials_tree_equals_flat_sum(ray_session):
    """The tree reduce (what keeps the driver pull bounded at 10^6
    blocks) sums exactly like one flat pass, across several levels."""
    from ocr_poc_ray.functions.trainer import _reduce_partials

    rng = np.random.RandomState(5)
    grads = rng.standard_normal((200, 17))
    rows = [
        {
            "grad": grads[i].tobytes(),
            "loss": float(i),
            "n": 2,
            "correct": 1,
        }
        for i in range(200)
    ]
    red = _reduce_partials(rd.from_items(rows).repartition(40), width=8)
    np.testing.assert_allclose(red["grad"], grads.sum(axis=0), rtol=1e-12)
    assert red["loss"] == pytest.approx(sum(range(200)))
    assert red["n"] == 400 and red["correct"] == 200


def test_quality_classifier_band_monotone(ray_session):
    """The registered distillation query: agreement must be ~perfect
    far from the rule's threshold and only degrade at the boundary."""
    from ocr_poc_ray.queries.documents import doc_quality_classifier

    rep = doc_quality_classifier("/root/testdata/sf0.001")
    assert list(rep.columns) == [
        "band", "band_lo", "n_docs", "agree", "agreement"
    ]
    assert rep["n_docs"].sum() == 500
    far = rep[rep["band_lo"] >= 0.05]["agreement"]
    assert (far >= 0.95).all()
    near = rep[rep["band_lo"] == 0.0]["agreement"].iloc[0]
    assert far.min() >= near  # disagreements concentrate at the boundary
