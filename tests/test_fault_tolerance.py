"""Fault tolerance (north_rule: preempted/failed runs at cluster scale):
a worker process dying mid-pipeline — task pool or actor pool — must be
retried by Ray with NO lost or duplicated rows.  The crash is a real
process kill (os._exit → SYSTEM_ERROR), not an application exception."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

import ray.data as rd


def test_task_worker_death_recovers(ray_session):
    marker = tempfile.mktemp(prefix="crash_task_")

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        if (batch["doc_id"] == 42).any() and not os.path.exists(marker):
            open(marker, "w").write("x")
            os._exit(1)
        return batch.assign(y=batch["doc_id"] * 2)

    df = pd.DataFrame({"doc_id": range(1000)})
    out = (
        rd.from_pandas(df).repartition(8)
        .map_batches(kernel, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert os.path.exists(marker)  # the kill DID happen
    assert len(out) == 1000
    assert (out["y"].to_numpy() == df["doc_id"].to_numpy() * 2).all()


def test_actor_worker_death_recovers(ray_session):
    marker = tempfile.mktemp(prefix="crash_actor_")

    class Kernel:
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if (batch["doc_id"] == 7).any() and not os.path.exists(marker):
                open(marker, "w").write("x")
                os._exit(1)
            return batch.assign(y=batch["doc_id"] + 1)

    df = pd.DataFrame({"doc_id": range(400)})
    out = (
        rd.from_pandas(df).repartition(4)
        .map_batches(Kernel, batch_format="pandas", concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert os.path.exists(marker)
    assert len(out) == 400
    assert (out["y"].to_numpy() == df["doc_id"].to_numpy() + 1).all()


def test_extraction_pipeline_survives_worker_death(ray_session):
    """The flagship extract stage itself, with a one-shot saboteur
    wrapped around the input: the final ordered output must equal the
    undisturbed run byte-for-byte."""
    from ocr_poc_ray.pipelines.extraction import extract_transcripts
    from ocr_poc_ray.synth import generate_transcripts

    transcripts, _ = generate_transcripts(4000, 40, seed=17)
    marker = tempfile.mktemp(prefix="crash_extract_")

    def saboteur(batch: pd.DataFrame) -> pd.DataFrame:
        if (batch["turn_idx"] == 3).any() and not os.path.exists(marker):
            open(marker, "w").write("x")
            os._exit(1)
        return batch

    base = rd.from_arrow(transcripts).repartition(8)
    clean = extract_transcripts(base, ordered=True).to_pandas()
    hit = extract_transcripts(
        base.map_batches(saboteur, batch_format="pandas"), ordered=True
    ).to_pandas()
    assert os.path.exists(marker)
    pd.testing.assert_frame_equal(clean, hit)


def test_minhash_distributed_path_survives_worker_death(ray_session, monkeypatch):
    """The crawl-scale LSH route (bloom membership + join-based grid
    salting) under a one-shot worker kill mid-pipeline: the pair set
    must equal the undisturbed distributed run exactly."""
    import numpy as np

    import ocr_poc_ray.functions.dedup as dd

    rng = np.random.RandomState(11)
    words = np.array([f"w{i}" for i in range(1000)])
    texts = []
    for _ in range(60):
        t = " ".join(rng.choice(words, 20))
        texts.extend([t, t])
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    base = rd.from_pandas(df).repartition(5)

    monkeypatch.setattr(dd, "BROADCAST_KEY_LIMIT", 0)  # force distributed path
    clean = (
        dd.minhash_lsh_pairs(base, threshold=0.7)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )

    marker = tempfile.mktemp(prefix="crash_minhash_")

    def saboteur(batch: pd.DataFrame) -> pd.DataFrame:
        if (batch["doc_id"] == 30).any() and not os.path.exists(marker):
            open(marker, "w").write("x")
            os._exit(1)
        return batch

    hit = (
        dd.minhash_lsh_pairs(
            base.map_batches(saboteur, batch_format="pandas"), threshold=0.7
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert os.path.exists(marker)
    pd.testing.assert_frame_equal(clean, hit)


def test_hnsw_build_survives_worker_death(ray_session):
    """Sharded HNSW under a one-shot worker kill during the build pass:
    Ray retries the dead shard task and the merged top-k equals the
    undisturbed run exactly (builds are deterministic per shard)."""
    import numpy as np

    from ocr_poc_ray.functions.hnsw import knn_hnsw

    rng = np.random.RandomState(5)
    X = rng.randn(120, 8)
    df = pd.DataFrame(
        {"vec_id": np.arange(120, dtype=np.int64),
         "embedding": [row.tolist() for row in X]}
    )
    base = rd.from_pandas(df).repartition(4)
    qids = [0, 50]
    qvecs = X[[0, 50]]

    clean = (
        knn_hnsw(base, qids, qvecs, k=5, shard_rows=30)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )

    marker = tempfile.mktemp(prefix="crash_hnsw_")

    def saboteur(batch: pd.DataFrame) -> pd.DataFrame:
        if (batch["vec_id"] == 77).any() and not os.path.exists(marker):
            open(marker, "w").write("x")
            os._exit(1)
        return batch

    hit = (
        knn_hnsw(
            base.map_batches(saboteur, batch_format="pandas"),
            qids, qvecs, k=5, shard_rows=30,
        )
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert os.path.exists(marker)
    pd.testing.assert_frame_equal(clean, hit)
