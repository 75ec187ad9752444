"""Batched text-embedding stage — the model-inference slot for the
training-data path (extract → assemble → embed → ANN/near-dup).

A sentence-transformer runtime is not in this container; two honest
stand-ins share the exact actor-pool shape a real encoder would use:

- default: a DETERMINISTIC hashed bag-of-words projection — each
  token's stable 64-bit hash seeds a fixed random projection row, the
  document vector is the L2-normed sum (no weight file, per-actor
  vocab cache).
- ``use_real_model=True``: a GENUINE on-disk weight file (a hashed
  embedding table from ``ocr_poc_ray.models``) np.load-ed ONCE per
  actor, with a fully vectorized gather/reduceat forward pass — the
  load-once amortization and batch-size economics of a real model,
  exercised end-to-end (see BASELINE.md model-seat note).

Either way the actor pool, batch sizing, and output schema don't
change when a real encoder replaces the forward pass.
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
    actor's lifetime (the model-weights slot).

    ``use_real_model=True`` loads a GENUINE weight file once per actor
    (``models.hashed_embedding_path`` — an on-disk ``.npz`` embedding
    table, loaded with ``np.load`` like any downloaded artifact) and
    replaces ``_encode`` with its batched forward pass: hash-bucket
    gather + per-doc ``reduceat`` sum + L2 norm.  Init cost (file read
    + table residency) is paid once per actor; batches pay only the
    vectorized forward (measured in BASELINE.md's model-seat note).
    """

    def __init__(
        self,
        *,
        dim: int = EMBED_DIM,
        use_real_model: bool = False,
        buckets: int = 8192,
        init_log_dir: str | None = None,
    ):
        self.dim = dim
        self._cache: dict[str, np.ndarray] = {}
        self.E: np.ndarray | None = None
        if use_real_model:
            from ocr_poc_ray.models import hashed_embedding_path

            self.E = np.load(hashed_embedding_path(buckets=buckets, dim=dim))["E"]
            assert self.E.shape == (buckets, dim)
        if init_log_dir:
            # load-once evidence for tests: one marker file per ACTOR
            # init (batch calls never touch this) — lets a test assert
            # init count == actor count at the 200 MB-artifact size
            import os
            import uuid

            os.makedirs(init_log_dir, exist_ok=True)
            with open(
                os.path.join(init_log_dir, f"init-{uuid.uuid4().hex}"), "w"
            ) as f:
                f.write(str(os.getpid()))

    def _encode_weights(self, texts: list[str]) -> np.ndarray:
        """Batched forward pass over the loaded embedding table."""
        from ocr_poc_ray.functions.dedup import _batch_token_hashes

        th, offsets = _batch_token_hashes(pd.Series(texts))
        vecs = np.zeros((len(texts), self.dim), dtype=np.float64)
        if len(th):
            rows = self.E[(th % np.uint64(self.E.shape[0])).astype(np.int64)]
            starts = offsets[:-1]
            nonempty = offsets[1:] > starts
            if nonempty.any():
                sums = np.add.reduceat(
                    rows.astype(np.float64), starts[nonempty], axis=0
                )
                norms = np.linalg.norm(sums, axis=1, keepdims=True)
                np.divide(sums, norms, out=sums, where=norms > 0)
                vecs[nonempty] = sums
        return vecs

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
        encode = self._encode if self.E is None else self._encode_weights
        vecs = encode(list(batch["text"]))
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
    use_real_model: bool = False,
    buckets: int = 8192,
    init_log_dir: str | None = None,
) -> Dataset:
    """(…, text) → (…, embedding list<float32>); batched actor pool."""
    if text_col != "text":
        ds = ds.map_batches(
            lambda b: b.rename(columns={text_col: "text"}), batch_format="pandas"
        )
    return ds.map_batches(
        TextEmbedder,
        fn_constructor_kwargs={
            "dim": dim, "use_real_model": use_real_model,
            "buckets": buckets, "init_log_dir": init_log_dir,
        },
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
