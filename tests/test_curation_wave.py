"""Second round-4 wave: containment join, LSH quality audit,
normalization-keyed dedup, snake-order shard balancing — planted-case
semantics the sf-table oracles can't exercise."""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _write_docs(rows: list[tuple[int, str]]) -> str:
    d = tempfile.mkdtemp(prefix="curation_wave_")
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s0"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return d


def test_containment_catches_embedded_quote(ray_session):
    """A 12-token excerpt embedded verbatim in a 120-token host scores
    containment 1.0 but Jaccard ~0.1 — the pair must appear in the
    containment join and NOT in the Jaccard join."""
    from ocr_poc_ray.queries.documents import (
        doc_containment_pairs,
        doc_jaccard_pairs,
    )

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(300)]
    host_toks = [vocab[rng.randint(300)] for _ in range(120)]
    host = " ".join(host_toks)
    quote = " ".join(host_toks[40:52])  # contiguous → shingles ⊂ host's
    other = " ".join(vocab[200 + i % 100] for i in range(60))
    d = _write_docs([(1, host), (2, quote), (3, other)])

    cont = doc_containment_pairs(d)
    jac = doc_jaccard_pairs(d)
    pairs_c = set(zip(cont["id_a"], cont["id_b"]))
    pairs_j = set(zip(jac["id_a"], jac["id_b"])) if len(jac) else set()
    assert (1, 2) in pairs_c
    row = cont[(cont["id_a"] == 1) & (cont["id_b"] == 2)].iloc[0]
    assert row["containment"] == 1.0
    assert (1, 2) not in pairs_j
    assert (1, 3) not in pairs_c and (2, 3) not in pairs_c


def test_normalize_dedup_groups_reformatted_copies(ray_session):
    """Case/punctuation/whitespace variants share one normalized
    fingerprint; a distinct doc stays a singleton."""
    from ocr_poc_ray.queries.documents import doc_normalize_dedup

    d = _write_docs(
        [
            (10, "Hello, World! This is FINE."),
            (11, "hello world this is fine"),
            (12, "HELLO   world;  this is fine..."),
            (13, "a completely different document"),
        ]
    )
    out = doc_normalize_dedup(d)
    assert len(out) == 2
    grp = out[out["n_docs"] == 3]
    assert len(grp) == 1
    assert grp.iloc[0]["keeper"] == 10
    assert out[out["n_docs"] == 1].iloc[0]["keeper"] == 13


def test_shard_balance_bound(ray_session):
    """Snake assignment: all docs covered, 8 shards, and the token-total
    spread is bounded by the largest single document."""
    import duckdb

    from ocr_poc_ray.queries.documents import N_BALANCE_SHARDS, doc_shard_balance

    out = doc_shard_balance(SF_DIR)
    assert len(out) == N_BALANCE_SHARDS
    n_docs = duckdb.sql(
        f"select count(*) from read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert out["n_docs"].sum() == n_docs
    biggest = duckdb.sql(
        f"select max(len(regexp_extract_all(text, '\\S+'))) "
        f"from read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    spread = out["total_tokens"].max() - out["total_tokens"].min()
    assert spread <= biggest
    # snake is far tighter than a random split in practice
    assert spread <= max(4, out["total_tokens"].mean() * 0.05)


def test_cluster_cap_sample_planted(ray_session):
    """A 5-copy cluster keeps exactly DUP_CAP members (the two smallest
    md5(doc_id) priorities), singletons keep rank 1."""
    import hashlib

    from ocr_poc_ray.queries.documents import DUP_CAP, doc_cluster_cap_sample

    dup_ids = [100, 101, 102, 103, 104]
    d = _write_docs(
        [(i, "the same duplicated text body") for i in dup_ids]
        + [(200, "a unique document")]
    )
    out = doc_cluster_cap_sample(d)
    grp = out[out["n_docs"] == 5]
    assert len(grp) == DUP_CAP
    want = sorted(dup_ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[
        :DUP_CAP
    ]
    assert sorted(grp["doc_id"]) == sorted(want)
    assert set(grp["kept_rank"]) == set(range(1, DUP_CAP + 1))
    single = out[out["doc_id"] == 200].iloc[0]
    assert single["n_docs"] == 1 and single["kept_rank"] == 1


def test_split_leakage_audit_planted(ray_session):
    """A dup group whose members land on both sides of the md5 split
    must count as straddling; a same-side group must not."""
    import hashlib

    from ocr_poc_ray.queries.documents import (
        SPLIT_TRAIN_PCT,
        doc_split_leakage_audit,
    )

    def side(i: int) -> bool:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 < SPLIT_TRAIN_PCT

    ids = list(range(1000, 1400))
    train_ids = [i for i in ids if side(i)]
    test_ids = [i for i in ids if not side(i)]
    assert len(train_ids) >= 2 and len(test_ids) >= 1
    rows = [
        (train_ids[0], "straddling duplicate text"),
        (test_ids[0], "straddling duplicate text"),
        (train_ids[1], "same side duplicate text"),
        (train_ids[2], "same side duplicate text"),
        (9999, "a singleton document"),
    ]
    d = _write_docs(rows)
    out = doc_split_leakage_audit(d).iloc[0]
    assert out["dup_groups"] == 2
    assert out["straddling_groups"] == 1
    assert out["docs_in_dup_groups"] == 4


def test_lsh_quality_report_consistency(ray_session):
    """Verified-LSH pairs are exactly re-scored, so fp must be 0 and the
    partition tp + fn must cover the exact pair set; recall_ppm is the
    integer-exact ratio."""
    from ocr_poc_ray.queries.documents import doc_lsh_quality_report

    r = doc_lsh_quality_report(SF_DIR).iloc[0]
    assert r["fp"] == 0
    assert r["tp"] + r["fn"] == r["n_exact"]
    assert r["n_verified"] <= r["n_candidates"]
    if r["n_exact"]:
        assert r["recall_ppm"] == (r["tp"] * 1_000_000) // r["n_exact"]
