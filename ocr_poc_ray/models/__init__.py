"""Deterministic numpy weight artifacts — the model-file slot.

Real deployments download weight files at deploy time (the reference
loads PaddleOCR weights once per process, ``ocr/paddle_extractor.py:
21-34``; 30–60 s startup per ``README.md:216``).  This container has no
network and no model runtime, so the registry materializes SEEDED,
VERSIONED weight files on first use and every later load goes through
``np.load`` of an on-disk ``.npz`` exactly like a downloaded artifact:
the actor-side file I/O, memory residency, once-per-actor
amortization, and version pinning are the real thing — only the
training run that produced the numbers is synthetic.

Artifacts:

- ``hashed_embedding``: a (buckets × dim) float32 embedding table; the
  forward pass is hash-bucket gather + per-doc sum + L2 norm (a real
  hashed embedding layer, one gather/reduceat per batch).
- ``ngram_logistic``: (buckets,) float32 weights + bias for a hashed
  token-unigram logistic scorer (sigmoid(W·x + b)).
"""

from __future__ import annotations

import os

import numpy as np

MODELS_VERSION = 1

_DIR = os.environ.get(
    "OCR_POC_RAY_MODEL_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "ocr_poc_ray", "models"),
)


def _materialize(name: str, seed: int, arrays_fn) -> str:
    """Write the artifact once (atomic rename — concurrent actors on a
    node may race) and return its path."""
    os.makedirs(_DIR, exist_ok=True)
    path = os.path.join(_DIR, f"{name}_v{MODELS_VERSION}.npz")
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays_fn(np.random.RandomState(seed)))
        os.replace(tmp, path)
    return path


def hashed_embedding_path(buckets: int = 8192, dim: int = 64) -> str:
    return _materialize(
        f"hashed_embedding_{buckets}x{dim}",
        seed=0x5EED ^ buckets ^ dim,
        arrays_fn=lambda rng: {
            "E": (rng.standard_normal((buckets, dim)) / np.sqrt(dim)).astype(
                np.float32
            )
        },
    )


def ngram_logistic_path(buckets: int = 4096) -> str:
    return _materialize(
        f"ngram_logistic_{buckets}",
        seed=0x10615 ^ buckets,
        arrays_fn=lambda rng: {
            "W": (rng.standard_normal(buckets) * 0.1).astype(np.float32),
            "b": np.float32(0.0),
        },
    )
