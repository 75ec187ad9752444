"""Checkpoint/resume semantics (SURVEY.md §5.3–5.4): kill after k
partitions → rerun skips them and completes; output identical to an
uninterrupted run; a further rerun is a no-op (idempotence)."""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from ocr_poc_ray.pipelines.extraction import resumable_extract
from ocr_poc_ray.synth import write_fixtures


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("resume_fix")
    return write_fixtures(str(out), n_turns=4_000, n_convs=80, seed=11, row_group_size=250)


def _rows(out_dir: str):
    con = duckdb.connect()
    return con.execute(
        f"select conv_id, turn_idx, extracted_text, success "
        f"from read_parquet('{out_dir}/partition=*/*.parquet') order by conv_id, turn_idx"
    ).fetchall()


def test_kill_resume_identical_and_idempotent(ray_session, corpus, tmp_path):
    interrupted = str(tmp_path / "interrupted")
    uninterrupted = str(tmp_path / "clean")

    r1 = resumable_extract(
        corpus["transcripts"], interrupted,
        num_partitions=6, shard_rows=500, max_partitions_this_run=2,
    )
    assert len(r1["partitions_ran"]) == 2

    r2 = resumable_extract(
        corpus["transcripts"], interrupted, num_partitions=6, shard_rows=500
    )
    assert sorted(r2["partitions_skipped"]) == sorted(r1["partitions_ran"])
    assert not set(r2["partitions_ran"]) & set(r1["partitions_ran"])

    r3 = resumable_extract(
        corpus["transcripts"], uninterrupted, num_partitions=6, shard_rows=500
    )
    assert _rows(interrupted) == _rows(uninterrupted)

    # idempotence: nothing left to do
    r4 = resumable_extract(
        corpus["transcripts"], interrupted, num_partitions=6, shard_rows=500
    )
    assert r4["partitions_ran"] == []
    assert len(r4["partitions_skipped"]) == r3["partitions_total"]


def test_manifest_lineage(ray_session, corpus, tmp_path):
    out = str(tmp_path / "lineage")
    resumable_extract(corpus["transcripts"], out, num_partitions=4, shard_rows=500)
    manifest = os.path.join(out, "_manifest.jsonl")
    records = [json.loads(l) for l in open(manifest) if l.strip()]
    assert records
    for rec in records:
        assert rec["extractor_version"]
        assert rec["row_count"] > 0
        assert rec["input_lineage"], "each partition must record its input fragments"
        assert rec["metrics"]["rows"] == rec["row_count"]
        assert rec["wall_time_s"] > 0
    # partitions ids unique and cover the run
    pids = [r["partition_id"] for r in records]
    assert len(pids) == len(set(pids))


def test_expected_matches_resumed_output(ray_session, corpus, tmp_path):
    """Golden equality THROUGH the resume path (per-turn byte equality)."""
    out = str(tmp_path / "golden")
    resumable_extract(
        corpus["transcripts"], out, num_partitions=5, shard_rows=500,
        max_partitions_this_run=3,
    )
    resumable_extract(corpus["transcripts"], out, num_partitions=5, shard_rows=500)
    con = duckdb.connect()
    n = con.execute(
        f"""
        select count(*) from read_parquet('{out}/partition=*/*.parquet') g
        full outer join read_parquet('{corpus["expected"]}') e using (conv_id, turn_idx)
        where g.extracted_text is distinct from e.extracted_text
           or g.success is distinct from e.success
        """
    ).fetchone()[0]
    assert n == 0


def test_version_bump_invalidates_partitions(ray_session, corpus, tmp_path):
    """Manifest entries from an older extractor version must NOT be
    reused — a semantic change reprocesses everything."""
    import json as _json

    out = str(tmp_path / "vers")
    resumable_extract(corpus["transcripts"], out, num_partitions=3, shard_rows=800)
    manifest = os.path.join(out, "_manifest.jsonl")
    records = [_json.loads(l) for l in open(manifest) if l.strip()]
    # rewrite the manifest as if an older extractor produced it
    with open(manifest, "w") as f:
        for rec in records:
            rec["extractor_version"] = "0.0.1"
            f.write(_json.dumps(rec) + "\n")
    r = resumable_extract(corpus["transcripts"], out, num_partitions=3, shard_rows=800)
    assert r["partitions_skipped"] == []
    assert len(r["partitions_ran"]) == r["partitions_total"]


def test_engine_config_roundtrip_and_cli(ray_session, corpus, tmp_path):
    from ocr_poc_ray.config import EngineConfig

    cfg = EngineConfig(num_partitions=3, shard_rows=700, extract_actors=2)
    back = EngineConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.extract_concurrency == (1, 2)

    # CLI honors the config (same process: reuse the session fixture)
    from ocr_poc_ray.__main__ import main as cli_main

    cfg_path = tmp_path / "engine.json"
    cfg_path.write_text(cfg.to_json())
    out = str(tmp_path / "cfg_out")
    rc = cli_main([
        "extract", "--input", corpus["transcripts"], "--output", out,
        "--config", str(cfg_path),
    ])
    assert rc == 0
    import duckdb as _duck

    n = _duck.sql(
        f"select count(*) from read_parquet('{out}/partition=*/*.parquet')"
    ).fetchone()[0]
    assert n == 4000


def test_cli_fields_and_run_extraction(ray_session, corpus, tmp_path):
    import pyarrow.parquet as pq

    from ocr_poc_ray.__main__ import main as cli_main
    from ocr_poc_ray.pipelines.extraction import run_extraction
    from ocr_poc_ray.synth import generate_span_docs

    spans, expected = generate_span_docs(n_docs=60, seed=17)
    spans_path = str(tmp_path / "spans.parquet")
    pq.write_table(spans, spans_path)
    out = str(tmp_path / "fields_out")
    assert cli_main(["fields", "--input", spans_path, "--output", out]) == 0
    import duckdb as _duck

    n = _duck.sql(f"select count(*) from read_parquet('{out}/*.parquet')").fetchone()[0]
    assert n == 60

    summary = run_extraction(
        corpus["transcripts"], str(tmp_path / "one_shot"),
        failed_json_dir=str(tmp_path / "failures"),
    )
    assert summary["rows"] == 4000
    assert summary["success"] + summary["failed"] == 4000
    assert summary["turns_per_sec"] > 0
    # the failures debug sink holds exactly the failed envelopes
    import glob as _glob
    import json as _json

    failure_lines = []
    for f in _glob.glob(str(tmp_path / "failures" / "*.json")):
        failure_lines += [_json.loads(l) for l in open(f) if l.strip()]
    assert len(failure_lines) == summary["failed"]
    assert all(rec["error"] for rec in failure_lines)


def test_resumable_dedup_input(ray_session, corpus, tmp_path):
    """A corpus with duplicated turns (retried upstream writes) still
    produces exactly one output row per (conv_id, turn_idx)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(corpus["transcripts"])
    doubled = pa.concat_tables([t, t.slice(0, t.num_rows // 5)])
    src = str(tmp_path / "doubled.parquet")
    pq.write_table(doubled, src, row_group_size=500)

    out = str(tmp_path / "dedup_out")
    resumable_extract(src, out, num_partitions=4, shard_rows=800, dedup_input=True)
    import duckdb as _duck

    n, dup = _duck.sql(
        f"""select count(*),
                   count(*) - count(distinct conv_id || chr(31) || turn_idx)
            from read_parquet('{out}/partition=*/*.parquet')"""
    ).fetchone()
    assert dup == 0
    assert n == t.num_rows  # every original turn exactly once


def test_jsonl_sink_resume_and_parity(ray_session, corpus, tmp_path):
    """The jsonl sink honors the same manifest contract (kill → resume
    skips committed partitions) and its rows equal the parquet run's."""
    jdir = str(tmp_path / "jsonl_out")
    pdir = str(tmp_path / "pq_out")

    r1 = resumable_extract(
        corpus["transcripts"], jdir, num_partitions=4, shard_rows=500,
        max_partitions_this_run=2, output_format="jsonl",
    )
    assert len(r1["partitions_ran"]) == 2
    r2 = resumable_extract(
        corpus["transcripts"], jdir, num_partitions=4, shard_rows=500,
        output_format="jsonl",
    )
    assert sorted(r2["partitions_skipped"]) == sorted(r1["partitions_ran"])

    resumable_extract(
        corpus["transcripts"], pdir, num_partitions=4, shard_rows=500
    )

    con = duckdb.connect()
    jrows = con.execute(
        f"select conv_id, turn_idx, extracted_text, success "
        f"from read_json_auto('{jdir}/partition=*/*.json') "
        f"order by conv_id, turn_idx"
    ).fetchall()
    assert jrows == _rows(pdir)

    # manifest records the format and real success metrics
    with open(os.path.join(jdir, "_manifest.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert all(r["metrics"]["format"] == "jsonl" for r in recs)
    assert sum(r["metrics"]["rows"] for r in recs) == len(jrows)
    assert sum(r["metrics"]["success"] for r in recs) == sum(
        1 for row in jrows if row[3]
    )


def test_resume_refuses_format_mismatch(ray_session, corpus, tmp_path):
    """A partially-complete jsonl run resumed as parquet (or vice versa)
    must fail loudly instead of mixing formats in one output dir."""
    out = str(tmp_path / "mixed")
    resumable_extract(
        corpus["transcripts"], out, num_partitions=4, shard_rows=500,
        max_partitions_this_run=1, output_format="jsonl",
    )
    with pytest.raises(ValueError, match="jsonl"):
        resumable_extract(
            corpus["transcripts"], out, num_partitions=4, shard_rows=500
        )
