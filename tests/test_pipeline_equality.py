"""Golden E2E equality: distributed pipeline vs expected table & oracle.

SURVEY.md §5.2: the per-turn text-equality gate.  Keyed by
``(conv_id, turn_idx)``, byte-for-byte on ``extracted_text``, and
cardinality-exact (no dropped or duplicated turns), at multiple batch
sizes — equality must hold at any parallelism.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_poc_ray.extractors import extract_turn
from ocr_poc_ray.pipelines.extraction import extract_transcripts


def _key_sorted(table: pa.Table) -> pa.Table:
    return table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def oracle_extract(transcripts: pa.Table) -> pa.Table:
    """Single-process oracle: the same pure function, no distribution."""
    rows = sorted(
        zip(
            transcripts["conv_id"].to_pylist(),
            transcripts["turn_idx"].to_pylist(),
            transcripts["text"].to_pylist(),
            transcripts["tool"].to_pylist(),
        )
    )
    out = [(c, i, extract_turn(t, tool).extracted_text, extract_turn(t, tool).success)
           for c, i, t, tool in rows]
    return pa.table(
        {
            "conv_id": [r[0] for r in out],
            "turn_idx": pa.array([r[1] for r in out], pa.int32()),
            "extracted_text": [r[2] for r in out],
            "success": [r[3] for r in out],
        }
    )


@pytest.mark.parametrize("batch_size", [32, 512])
def test_pipeline_matches_golden(fixture_dir, batch_size):
    expected = pq.read_table(fixture_dir["expected"])
    result = extract_transcripts(
        fixture_dir["transcripts"], batch_size=batch_size, ordered=True
    ).to_arrow_refs()
    import ray

    got = _key_sorted(pa.concat_tables([ray.get(r) for r in result]))

    assert got.num_rows == expected.num_rows  # no dropped/dup turns
    assert got["conv_id"].to_pylist() == expected["conv_id"].to_pylist()
    assert got["turn_idx"].to_pylist() == expected["turn_idx"].to_pylist()
    assert got["extracted_text"].to_pylist() == expected["extracted_text"].to_pylist()
    assert got["success"].to_pylist() == expected["success"].to_pylist()


def test_pipeline_matches_oracle_and_is_permutation_invariant(fixture_dir):
    """Property (SURVEY.md §5.4): input row order must not change output."""
    transcripts = pq.read_table(fixture_dir["transcripts"])
    oracle = oracle_extract(transcripts)

    # permute input rows deterministically
    import random

    idx = list(range(transcripts.num_rows))
    random.Random(7).shuffle(idx)
    permuted = transcripts.take(idx)

    import ray.data

    ds = ray.data.from_arrow(permuted)
    got = _key_sorted(
        pa.concat_tables(
            [pa.Table.from_pandas(extract_transcripts(ds, batch_size=128).to_pandas())]
        )
    )
    assert got["extracted_text"].to_pylist() == oracle["extracted_text"].to_pylist()
    assert got["success"].to_pylist() == oracle["success"].to_pylist()


def test_actor_pool_path_equal(fixture_dir):
    """Actor-pool deployment shape produces identical bytes."""
    expected = pq.read_table(fixture_dir["expected"])
    ds = extract_transcripts(
        fixture_dir["transcripts"], batch_size=256, concurrency=2, ordered=True
    )
    got = _key_sorted(pa.Table.from_pandas(ds.to_pandas()))
    assert got["extracted_text"].to_pylist() == expected["extracted_text"].to_pylist()


def test_dedup_turns_idempotence(fixture_dir):
    """Duplicated input turns (retried upstream writes) collapse to one
    deterministic winner per (conv_id, turn_idx); a clean corpus passes
    through unchanged."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_poc_ray.stages.validate import dedup_turns

    t = pq.read_table(fixture_dir["transcripts"])
    clean = rd.from_arrow(t)
    assert dedup_turns(clean).count() == t.num_rows

    # duplicate a 10% slice (same rows re-appended, shuffled in)
    dup = rd.from_arrow(t.slice(0, t.num_rows // 10))
    noisy = clean.union(dup)
    out = dedup_turns(noisy).to_pandas()
    assert len(out) == t.num_rows
    key = out["conv_id"] + "\x1f" + out["turn_idx"].astype(str)
    assert not key.duplicated().any()


def test_dedup_turns_bloom_path(fixture_dir, monkeypatch):
    """With the broadcast limit forced to 0, dedup_turns must take the
    bloom-semi-join path (the driver never holds the dup-key set) and
    produce the identical winner set."""
    import pyarrow.parquet as pq
    import ray.data as rd

    import ocr_poc_ray.functions.dedup as dd
    from ocr_poc_ray.stages.validate import dedup_turns

    t = pq.read_table(fixture_dir["transcripts"])
    clean = rd.from_arrow(t)
    dup = rd.from_arrow(t.slice(0, t.num_rows // 10))
    noisy = clean.union(dup)

    base = dedup_turns(noisy).to_pandas()
    monkeypatch.setattr(dd, "BROADCAST_KEY_LIMIT", 0)
    bloom = dedup_turns(noisy).to_pandas()

    key_cols = ["conv_id", "turn_idx"]
    b = base.sort_values(key_cols).reset_index(drop=True)
    g = bloom.sort_values(key_cols).reset_index(drop=True)
    assert len(g) == t.num_rows
    pd.testing.assert_frame_equal(
        b[sorted(b.columns)], g[sorted(g.columns)], check_dtype=False
    )


def test_jsonl_source_matches_parquet(fixture_dir):
    """The same corpus via the JSONL source extracts identically to the
    parquet path (source-format parity, S1)."""
    import json

    import pyarrow.parquet as pq

    from ocr_poc_ray.pipelines.extraction import extract_transcripts
    from ocr_poc_ray.sources.jsonl import read_transcripts_jsonl

    t = pq.read_table(fixture_dir["transcripts"]).slice(0, 400)
    import tempfile, os

    d = tempfile.mkdtemp(prefix="jsonl_src_")
    with open(os.path.join(d, "part-0.jsonl"), "w") as f:
        for row in t.to_pylist():
            row["ts"] = row["ts"].strftime("%Y-%m-%dT%H:%M:%S")
            f.write(json.dumps(row) + "\n")

    via_jsonl = (
        extract_transcripts(read_transcripts_jsonl(d), ordered=True)
        .to_pandas()[["conv_id", "turn_idx", "extracted_text", "success"]]
    )
    import ray.data as rd

    via_parquet = (
        extract_transcripts(rd.from_arrow(t), ordered=True)
        .to_pandas()[["conv_id", "turn_idx", "extracted_text", "success"]]
    )
    assert via_jsonl.equals(via_parquet)


def test_csv_source_matches_parquet(fixture_dir):
    import csv as _csv
    import os
    import tempfile

    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_poc_ray.pipelines.extraction import extract_transcripts
    from ocr_poc_ray.sources.jsonl import read_transcripts_csv

    t = pq.read_table(fixture_dir["transcripts"]).slice(0, 200)
    d = tempfile.mkdtemp(prefix="csv_src_")
    rows = t.to_pylist()
    with open(os.path.join(d, "part-0.csv"), "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
        w.writeheader()
        for row in rows:
            row["ts"] = row["ts"].strftime("%Y-%m-%dT%H:%M:%S")
            w.writerow(row)

    via_csv = (
        extract_transcripts(read_transcripts_csv(d), ordered=True)
        .to_pandas()[["conv_id", "turn_idx", "extracted_text", "success"]]
    )
    via_parquet = (
        extract_transcripts(rd.from_arrow(t), ordered=True)
        .to_pandas()[["conv_id", "turn_idx", "extracted_text", "success"]]
    )
    assert via_csv.equals(via_parquet)
