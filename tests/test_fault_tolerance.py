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
