"""Batched text-embedding stage — the model-inference slot for the
training-data path (extract → assemble → embed → ANN/near-dup).

The real encoder (a sentence-transformer) is not in this container, so
``use_real_model=True`` raises and the default is a DETERMINISTIC
hashed bag-of-words projection: each token's stable 64-bit hash seeds
a fixed random projection row, the document vector is the L2-normed
sum.  Deterministic across processes (no Python ``hash``), batched
(one matmul per batch), and shaped exactly like the real thing — the
actor pool, batch sizing, and output schema don't change when a model
replaces ``_encode``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ray.data import Dataset

EMBED_DIM = 64


def _token_rows(tokens: list[str], dim: int) -> np.ndarray:
    """One fixed pseudorandom projection row per distinct token."""
    out = np.empty((len(tokens), dim), dtype=np.float64)
    for i, tok in enumerate(tokens):
        seed = int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8", "ignore"), digest_size=4).digest(), "big"
        )
        out[i] = np.random.RandomState(seed).standard_normal(dim)
    return out


class TextEmbedder:
    """Actor-pool embedding stage: vocab projection cache lives for the
    actor's lifetime (the model-weights slot)."""

    def __init__(self, *, dim: int = EMBED_DIM, use_real_model: bool = False):
        if use_real_model:
            raise NotImplementedError(
                "no encoder runtime in this environment; load the model here "
                "(once per actor) and replace _encode with a batched forward pass"
            )
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}

    def _encode(self, texts: list[str]) -> np.ndarray:
        vecs = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, text in enumerate(texts):
            toks = (text or "").lower().split()
            if not toks:
                continue
            missing = [t for t in set(toks) if t not in self._cache]
            if missing:
                rows = _token_rows(missing, self.dim)
                for t, r in zip(missing, rows):
                    self._cache[t] = r
            v = np.sum([self._cache[t] for t in toks], axis=0)
            n = np.linalg.norm(v)
            vecs[i] = v / n if n > 0 else v
        return vecs

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = self._encode(list(batch["text"]))
        out = batch.drop(columns=["text"]).copy()
        out["embedding"] = [row.astype(np.float32) for row in vecs]
        return out


def embed_text(
    ds: Dataset,
    *,
    text_col: str = "text",
    dim: int = EMBED_DIM,
    batch_size: int = 256,
    concurrency: int | tuple[int, int] = (1, 8),
) -> Dataset:
    """(…, text) → (…, embedding list<float32>); batched actor pool."""
    if text_col != "text":
        ds = ds.map_batches(
            lambda b: b.rename(columns={text_col: "text"}), batch_format="pandas"
        )
    return ds.map_batches(
        TextEmbedder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
