"""Small-file compaction: row preservation, resume compatibility,
idempotence, and crash-window recovery of the intent-marker protocol."""

import json
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_poc_ray import synth
from ocr_poc_ray.pipelines.extraction import resumable_extract
from ocr_poc_ray.state.compaction import (
    MARKER,
    compact_output,
    compact_partition,
    recover,
)


@pytest.fixture(scope="module")
def extracted(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("compact")
    inp = str(root / "in")
    out = str(root / "out")
    synth.write_fixtures(inp, n_turns=4000, n_convs=40, seed=11, row_group_size=250)
    resumable_extract(
        os.path.join(inp, "transcripts.parquet"), out,
        num_partitions=4, shard_rows=500,
    )
    return out


def _rows(out_dir):
    return duckdb.sql(
        f"select conv_id, turn_idx, extracted_text, success "
        f"from read_parquet('{out_dir}/partition=*/*.parquet') "
        f"order by conv_id, turn_idx"
    ).fetchall()


def _file_count(out_dir):
    n = 0
    for d in os.listdir(out_dir):
        p = os.path.join(out_dir, d)
        if d.startswith("partition=") and os.path.isdir(p):
            n += sum(1 for f in os.listdir(p) if f.endswith(".parquet"))
    return n


def test_compaction_preserves_rows_and_resume(extracted):
    before = _rows(extracted)
    n_before = _file_count(extracted)
    assert n_before > 4, "fixture must produce multiple files per partition"

    rep = compact_output(extracted, target_bytes=1 << 30)
    assert rep.files_after == 4  # one file per partition
    assert rep.files_before == n_before
    assert _rows(extracted) == before

    # resume sees all partitions committed — nothing reprocesses
    r = resumable_extract(
        os.path.join(os.path.dirname(extracted), "in", "transcripts.parquet"),
        extracted, num_partitions=4, shard_rows=500,
    )
    assert r["partitions_ran"] == []
    assert _rows(extracted) == before

    # idempotent: a second compaction is a no-op
    rep2 = compact_output(extracted, target_bytes=1 << 30)
    assert all(p["skipped"] for p in rep2.partitions)


def _mk_partition(tmp_path, n_files=3):
    pdir = tmp_path / "partition=0"
    pdir.mkdir()
    for i in range(n_files):
        pq.write_table(
            pa.table({"x": list(range(i * 10, i * 10 + 10))}),
            str(pdir / f"part-{i}.parquet"),
        )
    return str(pdir)


def test_recover_completes_after_rename_crash(tmp_path):
    """Marker + compacted files + originals all present (crash between
    steps 4 and 5): recovery deletes the originals exactly once."""
    pdir = _mk_partition(tmp_path)
    originals = sorted(os.listdir(pdir))
    merged = pa.concat_tables(
        [pq.read_table(os.path.join(pdir, f)) for f in originals]
    )
    pq.write_table(merged, os.path.join(pdir, "compact-00000.parquet"))
    with open(os.path.join(pdir, MARKER), "w") as f:
        json.dump({"originals": originals, "compacted": ["compact-00000.parquet"]}, f)

    assert recover(pdir) == "completed"
    left = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    assert left == ["compact-00000.parquet"]
    assert duckdb.sql(
        f"select count(*) from read_parquet('{pdir}/*.parquet')"
    ).fetchone()[0] == 30


def test_recover_rolls_back_before_rename_crash(tmp_path):
    """Marker written but no compacted file landed: originals intact,
    marker and tmps dropped."""
    pdir = _mk_partition(tmp_path)
    originals = sorted(os.listdir(pdir))
    with open(os.path.join(pdir, "compact-00000.parquet.tmp"), "w") as f:
        f.write("partial")
    with open(os.path.join(pdir, MARKER), "w") as f:
        json.dump({"originals": originals, "compacted": ["compact-00000.parquet"]}, f)

    assert recover(pdir) == "rolled_back"
    left = sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))
    assert left == originals
    assert not os.path.exists(os.path.join(pdir, MARKER))


def test_compact_partition_respects_target_bytes(tmp_path):
    """Tiny target → several output bins, still all rows."""
    pdir = _mk_partition(tmp_path, n_files=6)
    sz = os.path.getsize(os.path.join(pdir, "part-0.parquet"))
    stats = compact_partition(pdir, target_bytes=2 * sz + sz // 2)
    assert not stats["skipped"]
    assert 1 < stats["files_after"] < 6
    assert duckdb.sql(
        f"select count(*) from read_parquet('{pdir}/*.parquet')"
    ).fetchone()[0] == 60
