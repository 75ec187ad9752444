"""Distributed model TRAINING over Ray Data — the learn-then-score loop.

The reference's stage one is a learned model served per record
(`ocr/paddle_extractor.py:21-34` loads weights once and predicts per
document); the engine's model seats (`stages/embed.py`,
`stages/postprocess.py`) already exercise load-once *inference* with
genuine weight files.  This module closes the remaining third of the
model story: producing those weights FROM the corpus with a
distributed trainer, the way a crawl pipeline trains its quality /
language classifiers (fastText-style linear models trained on a
labeled slice, then applied to the full corpus).

Both trainers use the broadcast-refine shape (`clustering.kmeans_fit`):
parameters live on the driver (k×d floats — tiny), every epoch
broadcasts them once via ``ray.put`` and runs ONE streaming pass of
per-batch partial gradients; nothing corpus-sized is collected.  The
partial-gradient rows are combined by a TREE reduce
(`_reduce_partials`): each level sums ``width`` partial rows into one
with a ``map_batches`` pass, so the driver only ever sees O(width)
rows no matter how many blocks the corpus has (at 100 TB the partials
dataset itself has ~10^6 rows of dim-sized gradients — a driver
``to_pandas`` there would be a multi-GB pull; the tree keeps every
transfer bounded).

Full-batch gradient descent is used deliberately: it is DETERMINISTIC
given (data, seed, epochs, lr) up to float summation order, so tests
can assert equality with a single-process numpy reference and
partition invariance — the same verification contract as
``kmeans_fit`` (rows-only registered queries, tolerance tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

__all__ = [
    "softmax_logreg_fit",
    "softmax_logreg_predict",
    "text_logreg_fit",
    "text_logreg_score",
    "TEXT_FEATURE_DIM",
]

#: hashed-token feature width for the text classifier (fastText uses
#: 2**21 buckets at web scale; 2**13 keeps each per-block gradient
#: partial at 64 KB while leaving hash collisions <1% on the synthetic
#: ~1k-token vocabulary).
TEXT_FEATURE_DIM = 8192

#: token-count scale for the explicit length feature (median synthetic
#: doc is ~56 tokens; /100 keeps the length coordinate O(1) like the
#: count coordinates, so one global lr conditions the whole problem).
LEN_SCALE = 100.0


def _sum_partial_rows(b: pd.DataFrame) -> pd.DataFrame:
    """Combine a batch of packed gradient-partial rows into one row."""
    grads = np.sum(
        [np.frombuffer(g, dtype=np.float64) for g in b["grad"]], axis=0
    )
    return pd.DataFrame(
        {
            "grad": [grads.tobytes()],
            "loss": [float(b["loss"].sum())],
            "n": [int(b["n"].sum())],
            "correct": [int(b["correct"].sum())],
        }
    )


def _reduce_partials(parts: Dataset, width: int = 64) -> dict:
    """Tree-reduce packed gradient partials to one driver-side dict.

    Each level is a ``map_batches(batch_size=width)`` pass that sums
    ``width`` rows into one; levels recurse until ≤ ``width`` rows
    remain, so the driver pull is O(width × gradient bytes) regardless
    of input block count.  Summation ORDER differs from a flat sum —
    callers document the float-order caveat (same as kmeans_fit).
    """
    parts = parts.materialize()
    while parts.count() > width:
        parts = parts.map_batches(
            _sum_partial_rows, batch_size=width, batch_format="pandas"
        ).materialize()
    pdf = parts.to_pandas()
    if len(pdf) == 0:
        return {"grad": None, "loss": 0.0, "n": 0, "correct": 0}
    agg = _sum_partial_rows(pdf)
    return {
        "grad": np.frombuffer(agg["grad"][0], dtype=np.float64).copy(),
        "loss": float(agg["loss"][0]),
        "n": int(agg["n"][0]),
        "correct": int(agg["correct"][0]),
    }


def _softmax(Z: np.ndarray) -> np.ndarray:
    Z = Z - Z.max(axis=1, keepdims=True)
    E = np.exp(Z)
    return E / E.sum(axis=1, keepdims=True)


def softmax_logreg_fit(
    ds: Dataset,
    *,
    n_classes: int,
    n_epochs: int = 40,
    lr: float = 2.0,
    reg: float = 1e-4,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> tuple[np.ndarray, pd.DataFrame]:
    """Multinomial logistic regression over a dense embedding column.

    Returns ``(W, history)``: ``W`` is ``(n_classes, d+1)`` float64
    (bias in the last column); ``history`` has one row per epoch with
    mean ``loss`` and training ``accuracy``.

    Full-batch GD, epochs × one streaming pass each; per-batch partial
    is the packed ``(n_classes × (d+1))`` gradient + loss/n/correct
    scalars, tree-reduced.  The input projection is pinned once with
    ``materialize`` (multi-pass consumer — same rationale as
    ``kmeans_fit``; spill-backed at scale).
    """
    import ray as _ray

    from ocr_poc_ray.functions.similarity import _to_matrix

    ds = ds.materialize()
    if ds.count() == 0:
        return (
            np.zeros((n_classes, 1), dtype=np.float64),
            pd.DataFrame(
                {
                    "epoch": pd.Series([], dtype="int64"),
                    "loss": pd.Series([], dtype="float64"),
                    "accuracy": pd.Series([], dtype="float64"),
                }
            ),
        )
    first = ds.take_batch(1, batch_format="pandas")
    d = len(np.asarray(first[vec_col].iloc[0], dtype=np.float64))
    k = int(n_classes)
    W = np.zeros((k, d + 1), dtype=np.float64)

    def make_grad_partial(wref):
        def grad_partial(b: pd.DataFrame) -> pd.DataFrame:
            Wc = _ray.get(wref)
            X = _to_matrix(b[vec_col]).astype(np.float64)
            X = np.concatenate([X, np.ones((len(X), 1))], axis=1)
            y = b[label_col].to_numpy().astype(np.int64)
            P = _softmax(X @ Wc.T)
            # cross-entropy on the true-class probabilities
            eps = 1e-12
            loss = float(-np.log(P[np.arange(len(y)), y] + eps).sum())
            correct = int((P.argmax(axis=1) == y).sum())
            R = P
            R[np.arange(len(y)), y] -= 1.0
            G = R.T @ X  # (k, d+1)
            return pd.DataFrame(
                {
                    "grad": [G.ravel().tobytes()],
                    "loss": [loss],
                    "n": [len(y)],
                    "correct": [correct],
                }
            )

        return grad_partial

    # same epoch-driver size switch as text_logreg_fit: per-epoch Ray
    # Data jobs cost ~0.3 s each regardless of data, so small/medium
    # embedding matrices pin in a gradient-actor pool (decoded to one
    # (n, d+1) numpy block per shard) and each epoch is a ray.get
    # fan-out; above the heap limit the streaming loop below runs.
    hist: list[dict] = []
    if ds.size_bytes() <= _FIT_ACTOR_BYTES_LIMIT:
        refs = ds.to_arrow_refs()
        n_shards = max(1, min(_FIT_ACTOR_POOL, len(refs)))
        shard_refs: list[list] = [[] for _ in range(n_shards)]
        for i, r in enumerate(refs):
            shard_refs[i % n_shards].append(r)
        actor_cls = _ray.remote(_DenseGradShard)
        actors = [
            actor_cls.remote(rs, vec_col, label_col) for rs in shard_refs
        ]
        try:
            for epoch in range(n_epochs):
                parts = _ray.get([a.grad.remote(W) for a in actors])
                n = sum(p[2] for p in parts)
                G = sum(p[0] for p in parts) / n
                G[:, :-1] += reg * W[:, :-1]
                W = W - lr * G
                hist.append(
                    {
                        "epoch": epoch,
                        "loss": sum(p[1] for p in parts) / n,
                        "accuracy": sum(p[3] for p in parts) / n,
                    }
                )
        finally:
            for a in actors:
                _ray.kill(a)
        return W, pd.DataFrame(hist)

    for epoch in range(n_epochs):
        wref = _ray.put(W)
        parts = ds.map_batches(
            make_grad_partial(wref), batch_format="pandas"
        )
        red = _reduce_partials(parts)
        n = red["n"]
        G = red["grad"].reshape(k, d + 1) / n
        G[:, :-1] += reg * W[:, :-1]  # L2 on weights, not bias
        W = W - lr * G
        hist.append(
            {
                "epoch": epoch,
                "loss": red["loss"] / n,
                "accuracy": red["correct"] / n,
            }
        )
    return W, pd.DataFrame(hist)


def softmax_logreg_predict(
    ds: Dataset,
    W: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """(id, pred) against fixed broadcast weights — the trained-model
    inference seat: weights ``ray.put`` once, zero-copy ``ray.get`` per
    worker, one matmul per batch."""
    import ray as _ray

    from ocr_poc_ray.functions.similarity import _to_matrix

    wref = _ray.put(np.asarray(W, dtype=np.float64))

    def predict(b: pd.DataFrame) -> pd.DataFrame:
        Wc = _ray.get(wref)
        X = _to_matrix(b[vec_col]).astype(np.float64)
        X = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        return pd.DataFrame(
            {
                id_col: b[id_col].to_numpy(),
                "pred": (X @ Wc.T).argmax(axis=1).astype("int64"),
            }
        )

    return ds.map_batches(predict, batch_format="pandas")


def _text_margins(
    texts: pd.Series, w: np.ndarray, dim: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(margin per doc, bucket ids, per-doc token counts, offsets) for a
    batch — the shared forward pass of the hashed-token linear model.

    The feature map is RAW token counts (x_j = count_j) plus one
    explicit scaled-length coordinate (n_tokens / LEN_SCALE) and a
    bias: any count-RATIO threshold (stopword ratio, symbol ratio …)
    stays an exact halfspace (count − thr·len ≥ 0), and counts are
    O(1)-conditioned where mean-normalized features need ~10× more
    epochs (measured).  Weight layout: ``w[:dim]`` token buckets,
    ``w[dim]`` length, ``w[dim+1]`` bias.  The margin is computed as a
    segmented sum of per-occurrence bucket weights — no (n × dim)
    matrix ever exists.
    """
    from ocr_poc_ray.functions.dedup import _batch_token_hashes

    th, offsets = _batch_token_hashes(texts)
    bucket = (th % np.uint64(dim)).astype(np.int64)
    lens = np.diff(offsets)
    margins = w[dim + 1] + (lens / LEN_SCALE) * w[dim]
    nonempty = lens > 0
    if nonempty.any():
        margins[nonempty] += np.add.reduceat(
            w[bucket], offsets[:-1][nonempty]
        )
    return margins, bucket, lens, offsets


#: heap budget for pinning the feature projection in actors (fast path);
#: above this the per-epoch streaming Dataset loop runs instead
_FIT_ACTOR_BYTES_LIMIT = 2 << 30
_FIT_ACTOR_POOL = 8


def _feature_grad(y, lens, bucket, offsets, wc, dim):
    """(grad, loss, n, correct) for one shard of hashed-token features —
    the shared inner kernel of both the streaming and the actor epoch
    drivers (identical math, so the size switch can't change results
    beyond float-sum grouping)."""
    margins = wc[dim + 1] + (lens / LEN_SCALE) * wc[dim]
    nonempty = lens > 0
    if nonempty.any():
        margins[nonempty] += np.add.reduceat(wc[bucket], offsets[:-1][nonempty])
    p = 1.0 / (1.0 + np.exp(-np.clip(margins, -30.0, 30.0)))
    eps = 1e-12
    loss = float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())
    correct = int(((p >= 0.5) == (y >= 0.5)).sum())
    r = p - y
    g = np.zeros(dim + 2, dtype=np.float64)
    if nonempty.any():
        # d(margin)/d(w_j) = count_j  ⇒ repeat each doc's residual over
        # its occurrences, one bincount
        g[:dim] = np.bincount(bucket, weights=np.repeat(r, lens), minlength=dim)
    g[dim] = float((r * (lens / LEN_SCALE)).sum())
    g[dim + 1] = r.sum()
    return g, loss, len(y), correct


class _DenseGradShard:
    """One shard of the (embedding, label) projection pinned as a dense
    (n, d+1) numpy block; ``grad(W)`` is one matmul round."""

    def __init__(self, table_refs, vec_col: str, label_col: str):
        import ray as _ray

        from ocr_poc_ray.functions.similarity import _to_matrix

        tables = _ray.get(list(table_refs))
        dfs = [t.to_pandas() for t in tables]
        df = pd.concat(dfs, ignore_index=True) if dfs else None
        if df is None or len(df) == 0:
            self.X = np.zeros((0, 1), dtype=np.float64)
            self.y = np.zeros(0, dtype=np.int64)
            return
        X = _to_matrix(df[vec_col]).astype(np.float64)
        self.X = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        self.y = df[label_col].to_numpy().astype(np.int64)

    def grad(self, W: np.ndarray):
        if len(self.y) == 0:
            return np.zeros_like(W), 0.0, 0, 0
        P = _softmax(self.X @ W.T)
        eps = 1e-12
        loss = float(-np.log(P[np.arange(len(self.y)), self.y] + eps).sum())
        correct = int((P.argmax(axis=1) == self.y).sum())
        R = P
        R[np.arange(len(self.y)), self.y] -= 1.0
        return R.T @ self.X, loss, len(self.y), correct


class _TextGradShard:
    """Holds one shard of the feature projection decoded to numpy;
    ``grad(w)`` is one vectorized pass — no tokenization, no pandas,
    no per-epoch job launch."""

    def __init__(self, table_refs):
        import ray as _ray

        # refs ride inside a list so Ray does NOT inline-resolve them;
        # the get here is a local zero-copy plasma read on the actor
        tables = _ray.get(list(table_refs))
        dfs = [t.to_pandas() for t in tables]
        df = (
            pd.concat(dfs, ignore_index=True)
            if dfs
            else pd.DataFrame({"_fb": [], "_len": [], "_y": []})
        )
        self.lens = df["_len"].to_numpy().astype(np.int64)
        blob = b"".join(df["_fb"].tolist())
        self.bucket = np.frombuffer(blob, dtype=np.uint32).astype(np.int64)
        self.offsets = np.empty(len(self.lens) + 1, dtype=np.int64)
        self.offsets[0] = 0
        np.cumsum(self.lens, out=self.offsets[1:])
        self.y = df["_y"].to_numpy().astype(np.float64)

    def grad(self, w: np.ndarray, dim: int):
        return _feature_grad(self.y, self.lens, self.bucket, self.offsets, w, dim)


def text_logreg_fit(
    ds: Dataset,
    *,
    dim: int = TEXT_FEATURE_DIM,
    n_epochs: int = 40,
    lr: float = 0.03,
    reg: float = 1e-6,
    text_col: str = "text",
    label_col: str = "y",
) -> tuple[np.ndarray, pd.DataFrame]:
    """Binary logistic regression over hashed-token count features —
    the fastText-style linear classifier a crawl pipeline trains for
    quality / language gating.

    Returns ``(w, history)``: ``w`` is ``(dim+2,)`` float64 (token
    buckets, then length coefficient at ``w[dim]``, bias at
    ``w[dim+1]`` — see ``_text_margins``); history has per-epoch mean
    loss + accuracy.  Labels in ``label_col`` must be 0/1.  Per-batch
    partial: one ``np.bincount`` of per-occurrence residuals into
    ``dim`` buckets (64 KB at the default width) — tree-reduced,
    never collected.
    """
    import ray as _ray

    # Tokenize + hash ONCE: the hashed-bucket features are static across
    # epochs (only w changes), so the epoch loop iterates over a
    # materialized FEATURE projection (per-row uint32 bucket blob +
    # token count + label) instead of re-tokenizing the corpus text
    # n_epochs times (measured: doc_quality_classifier 12 s → ~4 s at
    # sf0.1/32 CPUs, identical gradients bit-for-bit).  The feature
    # projection is also ~smaller than the text (4 B/token).
    def featurize(b: pd.DataFrame) -> pd.DataFrame:
        from ocr_poc_ray.functions.dedup import _batch_token_hashes

        th, offsets = _batch_token_hashes(b[text_col])
        bucket = (th % np.uint64(dim)).astype(np.uint32)
        lens = np.diff(offsets).astype(np.int64)
        blobs = [
            bucket[offsets[i] : offsets[i + 1]].tobytes()
            for i in range(len(lens))
        ]
        return pd.DataFrame(
            {"_fb": pd.Series(blobs, dtype=object),
             "_len": lens,
             "_y": b[label_col].to_numpy().astype(np.float64)}
        )

    ds = ds.map_batches(featurize, batch_format="pandas").materialize()
    if ds.count() == 0:
        return (
            np.zeros(dim + 2, dtype=np.float64),
            pd.DataFrame(
                {
                    "epoch": pd.Series([], dtype="int64"),
                    "loss": pd.Series([], dtype="float64"),
                    "accuracy": pd.Series([], dtype="float64"),
                }
            ),
        )
    w = np.zeros(dim + 2, dtype=np.float64)

    def make_grad_partial(wref):
        def grad_partial(b: pd.DataFrame) -> pd.DataFrame:
            wc = _ray.get(wref)
            y = b["_y"].to_numpy()
            lens = b["_len"].to_numpy()
            blob = b"".join(b["_fb"].tolist())
            bucket = np.frombuffer(blob, dtype=np.uint32).astype(np.int64)
            offsets = np.empty(len(lens) + 1, dtype=np.int64)
            offsets[0] = 0
            np.cumsum(lens, out=offsets[1:])
            g, loss, n, correct = _feature_grad(y, lens, bucket, offsets, wc, dim)
            return pd.DataFrame(
                {
                    "grad": [g.tobytes()],
                    "loss": [loss],
                    "n": [n],
                    "correct": [correct],
                }
            )

        return grad_partial

    # Epoch driver: a full-batch GD step needs ONE global gradient per
    # epoch, so each epoch is a round trip.  A Ray Data job costs
    # ~0.3 s to launch regardless of data size (measured: 40 no-op
    # map_batches jobs = 12.4 s), which DOMINATES small/medium corpora
    # at 40 epochs.  Below _FIT_ACTOR_BYTES_LIMIT the features are
    # pinned once in a small actor pool (decoded to numpy in __init__)
    # and each epoch is a millisecond-scale ray.get fan-out — the
    # parameter-server shape, the canonical "Dataset API can't express
    # it" case.  Above the limit (features won't fit cluster heap) the
    # Dataset-per-epoch streaming loop below is the scale path: blocks
    # stream from the object store and can spill.
    hist: list[dict] = []
    if ds.size_bytes() <= _FIT_ACTOR_BYTES_LIMIT:
        refs = ds.to_arrow_refs()
        n_shards = max(1, min(_FIT_ACTOR_POOL, len(refs)))
        shard_refs: list[list] = [[] for _ in range(n_shards)]
        for i, r in enumerate(refs):
            shard_refs[i % n_shards].append(r)
        actor_cls = _ray.remote(_TextGradShard)
        actors = [actor_cls.remote(rs) for rs in shard_refs]
        try:
            for epoch in range(n_epochs):
                parts = _ray.get([a.grad.remote(w, dim) for a in actors])
                n = sum(p[2] for p in parts)
                g = sum(p[0] for p in parts) / n
                g[:dim] += reg * w[:dim]
                w = w - lr * g
                hist.append(
                    {
                        "epoch": epoch,
                        "loss": sum(p[1] for p in parts) / n,
                        "accuracy": sum(p[3] for p in parts) / n,
                    }
                )
        finally:
            for a in actors:
                _ray.kill(a)
        return w, pd.DataFrame(hist)

    for epoch in range(n_epochs):
        wref = _ray.put(w)
        parts = ds.map_batches(
            make_grad_partial(wref), batch_format="pandas"
        )
        red = _reduce_partials(parts)
        n = red["n"]
        g = red["grad"] / n
        g[:dim] += reg * w[:dim]
        w = w - lr * g
        hist.append(
            {
                "epoch": epoch,
                "loss": red["loss"] / n,
                "accuracy": red["correct"] / n,
            }
        )
    return w, pd.DataFrame(hist)


def text_logreg_score(
    ds: Dataset,
    w: np.ndarray,
    *,
    dim: int = TEXT_FEATURE_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> Dataset:
    """(id, score, pred[, keep_cols]) against fixed broadcast weights —
    corpus-wide application of the trained gate (score = P(y=1))."""
    import ray as _ray

    wref = _ray.put(np.asarray(w, dtype=np.float64))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        wc = _ray.get(wref)
        margins, _, _, _ = _text_margins(b[text_col], wc, dim)
        p = 1.0 / (1.0 + np.exp(-np.clip(margins, -30.0, 30.0)))
        out = {
            id_col: b[id_col].to_numpy(),
            "score": p,
            "pred": (p >= 0.5).astype("int64"),
        }
        for c in keep_cols:
            out[c] = b[c].to_numpy()
        return pd.DataFrame(out)

    return ds.map_batches(score, batch_format="pandas")
