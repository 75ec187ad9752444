"""Sharded tar sink: roundtrip fidelity, block-structure independence,
byte determinism, and commit-skip resume."""

from __future__ import annotations

import hashlib
import os
import tarfile

import numpy as np
import pandas as pd
import pytest

import ray.data

from ocr_poc_ray.pipelines.shards import iter_tar_samples, write_tar_shards


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.default_rng(21)
    n = 200
    df = pd.DataFrame(
        {
            "doc_id": [f"doc{i:04d}" for i in range(n)],
            "text": ["word " * int(rng.integers(5, 60)) + str(i) for i in range(n)],
            "blob": [rng.bytes(int(rng.integers(10, 400))) for i in range(n)],
        }
    )
    p = tmp_path / "corpus.parquet"
    df.to_parquet(p)
    return df, str(p)


def _dir_hashes(d):
    return {
        f: hashlib.md5(open(os.path.join(d, f), "rb").read()).hexdigest()
        for f in sorted(os.listdir(d))
        if f.endswith(".tar")
    }


def test_roundtrip(ray_session, corpus, tmp_path):
    df, p = corpus
    out = str(tmp_path / "shards")
    ds = ray.data.read_parquet(p)
    man = write_tar_shards(
        ds, out, key_col="doc_id",
        payload_cols={"text": "txt", "blob": "bin"}, n_shards=7,
    )
    assert man["n_samples"].sum() == len(df)
    assert len(man) == 7 or man["shard_id"].nunique() == len(man)
    got = {k: files for k, files in iter_tar_samples(out)}
    assert len(got) == len(df)
    for _, row in df.iterrows():
        files = got[row["doc_id"]]
        assert files["txt"] == row["text"].encode()
        assert files["bin"] == row["blob"]


def test_block_structure_independent(ray_session, corpus, tmp_path):
    """Same corpus through different block layouts → identical shard
    bytes (assignment is keyed, not positional)."""
    _, p = corpus
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_tar_shards(
        ray.data.read_parquet(p), a, key_col="doc_id",
        payload_cols={"text": "txt"}, n_shards=5,
    )
    write_tar_shards(
        ray.data.read_parquet(p).repartition(11), b, key_col="doc_id",
        payload_cols={"text": "txt"}, n_shards=5,
    )
    assert _dir_hashes(a) == _dir_hashes(b)


def test_resume_skips_committed_shards(ray_session, corpus, tmp_path):
    """Delete one shard, rerun: the missing shard is rebuilt
    byte-identically and the survivors are not rewritten."""
    _, p = corpus
    out = str(tmp_path / "shards")
    ds = ray.data.read_parquet(p)
    kw = dict(key_col="doc_id", payload_cols={"text": "txt"}, n_shards=5)
    man1 = write_tar_shards(ds, out, **kw)
    before = _dir_hashes(out)
    victim = os.path.join(out, "shard-00002.tar")
    os.remove(victim)
    survivors = {
        f: os.path.getmtime(os.path.join(out, f))
        for f in os.listdir(out) if f.endswith(".tar")
    }
    man2 = write_tar_shards(ds, out, **kw)
    after = _dir_hashes(out)
    assert after == before
    pd.testing.assert_frame_equal(man1, man2)
    for f, mtime in survivors.items():
        assert os.path.getmtime(os.path.join(out, f)) == mtime, f


def test_member_metadata_is_normalized(ray_session, corpus, tmp_path):
    """Tar bytes are a pure function of content: mtimes/uids zeroed."""
    _, p = corpus
    out = str(tmp_path / "shards")
    write_tar_shards(
        ray.data.read_parquet(p), out, key_col="doc_id",
        payload_cols={"text": "txt"}, n_shards=3,
    )
    with tarfile.open(os.path.join(out, "shard-00000.tar")) as tf:
        for m in tf:
            assert m.mtime == 0 and m.uid == 0 and m.gid == 0
