"""Content-defined chunking: golden parity with a pure-python reference,
the insertion-stability property that justifies CDC over fixed blocks,
and the distributed per-source stats rollup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_poc_ray.functions import cdc

SF_DIR = "/root/testdata/sf0.001"


def _ref_chunks(s: str) -> list[bytes]:
    """Per-document scalar reference for the vectorized kernel."""
    raw = s.encode()
    b = np.frombuffer(raw, dtype=np.uint8)
    if len(b) == 0:
        return []
    h = cdc.gear_hashes(b)
    cuts = [
        int(p)
        for p in np.flatnonzero(((h >> np.uint64(8)) & np.uint64(0xFF)) == 0) + 1
        if p >= cdc.MIN_POS and p < len(b)
    ]
    bounds = [0] + cuts + [len(b)]
    return [raw[bounds[i] : bounds[i + 1]] for i in range(len(bounds) - 1)]


def _rand_text(rng, n: int) -> str:
    return "".join(rng.choice(list("abcdefghij KLMNOP.qrstuv\n"), size=n))


def test_chunk_table_matches_scalar_reference():
    rng = np.random.default_rng(11)
    texts = [_rand_text(rng, n) for n in (0, 1, 63, 64, 65, 500, 3000)]
    t = pa.table({"text": texts, "source": ["s"] * len(texts)})
    got = cdc.cdc_chunk_table(t)
    ref_rows = []
    for i, s in enumerate(texts):
        for c in _ref_chunks(s):
            ref_rows.append(
                (i, len(c), pd.util.hash_array(np.array([c], dtype=object))[0])
            )
    ref = pd.DataFrame(ref_rows, columns=["doc_row", "n_bytes", "h"])
    mine = pd.DataFrame(
        {"doc_row": got["doc_row"], "n_bytes": got["n_bytes"],
         "h": got["chunk_hash"].to_numpy().view(np.uint64)}
    )
    key = ["doc_row", "n_bytes", "h"]
    a = ref.sort_values(key).reset_index(drop=True)
    b = mine.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a.to_numpy() == b.to_numpy().astype(a.to_numpy().dtype)).all()
    # every doc's chunk bytes must cover the doc exactly
    per_doc = mine.groupby("doc_row")["n_bytes"].sum()
    for i, s in enumerate(texts):
        if len(s):
            assert per_doc[i] == len(s.encode())


def test_insertion_stability():
    """The CDC property: inserting a prefix shifts every byte position,
    but all chunks beyond the first window's reach are unchanged."""
    rng = np.random.default_rng(12)
    body = _rand_text(rng, 20_000)
    edited = _rand_text(rng, 137) + body
    t = pa.table({"text": [body, edited], "source": ["s", "s"]})
    ch = cdc.cdc_chunk_table(t)
    h0 = ch[ch["doc_row"] == 0]["chunk_hash"].tolist()
    h1 = ch[ch["doc_row"] == 1]["chunk_hash"].tolist()
    shared = len(set(h0) & set(h1))
    # all but the first couple of chunks of each doc survive the shift
    assert shared >= len(h0) - 3, (shared, len(h0), len(h1))
    # a fixed-size blocker would share ~0 chunks after a 137-byte shift
    assert len(h0) > 20


def test_cross_batch_and_doc_isolation():
    """Chunks never cross document boundaries: chunking two docs
    concatenated in one batch equals chunking them in separate batches."""
    rng = np.random.default_rng(13)
    a, b = _rand_text(rng, 4000), _rand_text(rng, 4000)
    both = cdc.cdc_chunk_table(pa.table({"text": [a, b], "source": ["x", "x"]}))
    solo_a = cdc.cdc_chunk_table(pa.table({"text": [a], "source": ["x"]}))
    solo_b = cdc.cdc_chunk_table(pa.table({"text": [b], "source": ["x"]}))
    assert sorted(both[both["doc_row"] == 0]["chunk_hash"]) == sorted(
        solo_a["chunk_hash"]
    )
    assert sorted(both[both["doc_row"] == 1]["chunk_hash"]) == sorted(
        solo_b["chunk_hash"]
    )


def test_source_stats_golden(ray_session):
    """The distributed per-source rollup equals a pure-python recompute
    over the real sf0.001 documents table."""
    import ray.data

    from ocr_poc_ray.queries.documents import doc_cdc_chunk_stats

    got = doc_cdc_chunk_stats(SF_DIR)
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text", "source"])
    rows = []
    for src, text in zip(docs["source"], docs["text"]):
        for c in _ref_chunks(text):
            rows.append((src, c, len(c)))
    ref = pd.DataFrame(rows, columns=["source", "chunk", "n"])
    exp = (
        ref.groupby("source")
        .apply(
            lambda g: pd.Series(
                {
                    "n_chunks": len(g),
                    "n_distinct_chunks": g["chunk"].nunique(),
                    "total_bytes": g["n"].sum(),
                    "distinct_bytes": g.drop_duplicates("chunk")["n"].sum(),
                }
            ),
            include_groups=False,
        )
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert list(got["source"]) == list(exp["source"])
    for c in ["n_chunks", "n_distinct_chunks", "total_bytes", "distinct_bytes"]:
        assert (got[c].to_numpy() == exp[c].to_numpy().astype(np.int64)).all(), c
    exp_ratio = (1.0 - exp["distinct_bytes"] / exp["total_bytes"]).round(6)
    assert np.allclose(got["dup_byte_ratio"], exp_ratio)


def test_planted_duplication_raises_ratio(ray_session, tmp_path):
    """A source whose docs all share one big passage shows a higher
    dup_byte_ratio than a source of independent docs."""
    import ray.data

    from ocr_poc_ray.functions.cdc import cdc_source_stats

    rng = np.random.default_rng(14)
    shared = _rand_text(rng, 5000)
    dup_docs = [shared + _rand_text(rng, 200) for _ in range(10)]
    uniq_docs = [_rand_text(rng, 5200) for _ in range(10)]
    df = pd.DataFrame(
        {"text": dup_docs + uniq_docs,
         "source": ["dup"] * 10 + ["uniq"] * 10}
    )
    p = tmp_path / "docs.parquet"
    df.to_parquet(p)
    ds = ray.data.read_parquet(str(p), columns=["text", "source"])
    out = cdc_source_stats(ds).set_index("source")
    assert out.loc["dup", "dup_byte_ratio"] > 0.8
    assert out.loc["uniq", "dup_byte_ratio"] < 0.05
