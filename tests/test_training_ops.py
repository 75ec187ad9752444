"""Training-example transforms (queries/training.py) — structural
invariants beyond the DuckDB oracles: FIM reassembly, span-corruption
mask reconstruction, int8 code bounds/saturation, and the inverted
index's partition-pruning contract."""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _texts() -> dict[int, str]:
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def test_fim_reassembles_original(ray_session):
    """fim_text = P + <SUF> + S + <MID> + M must reassemble to the
    original doc as P + M + S, and the cut points must bound the pieces."""
    from ocr_poc_ray.queries.training import doc_fim_split

    texts = _texts()
    out = doc_fim_split(SF_DIR)
    assert len(out) == len(texts)
    for r in out.itertuples():
        orig = texts[r.doc_id]
        assert 0 <= r.cut_lo <= r.cut_hi <= len(orig)
        head, rest = r.fim_text.split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert head == orig[: r.cut_lo]
        assert mid == orig[r.cut_lo : r.cut_hi]
        assert suf == orig[r.cut_hi :]
        assert head + mid + suf == orig


def test_span_corruption_reconstructs(ray_session):
    """Re-derive the mask from the same md5 draws in pure Python and
    check n_masked, the target tokens, and the corrupted sentinel runs
    all agree with the distributed kernel."""
    from ocr_poc_ray.queries.training import (
        SPAN_LEN,
        SPAN_START_PCT,
        doc_span_corruption,
    )

    texts = _texts()
    out = doc_span_corruption(SF_DIR).set_index("doc_id")
    n_checked = 0
    for doc_id, text in texts.items():
        toks = text.split()
        if not toks:
            assert doc_id not in out.index
            continue
        starts = [
            int(hashlib.md5(f"{doc_id}:{p}".encode()).hexdigest()[:8], 16) % 100
            < SPAN_START_PCT
            for p in range(1, len(toks) + 1)
        ]
        masked = [
            any(starts[j] for j in range(max(0, i - SPAN_LEN + 1), i + 1))
            for i in range(len(toks))
        ]
        row = out.loc[doc_id]
        assert row["n_masked"] == sum(masked)
        expect_target = " ".join(t for t, m in zip(toks, masked) if m)
        assert row["target"] == expect_target
        corrupted = []
        for i, (t, m) in enumerate(zip(toks, masked)):
            if not m:
                corrupted.append(t)
            elif i == 0 or not masked[i - 1]:
                corrupted.append("<X>")
        assert row["corrupted"] == " ".join(corrupted)
        n_checked += 1
    assert n_checked == len(out)


def test_int8_quantize_bounds(ray_session):
    """Codes live in [0, 255]; the min and max carriers of every live
    dimension quantize to exactly 0 and 255, so n_saturated >= 2."""
    from ocr_poc_ray.queries.training import vec_int8_quantize

    out = vec_int8_quantize(SF_DIR)
    n = pq.read_metadata(f"{SF_DIR}/embeddings.parquet").num_rows
    assert len(out) > 0
    assert (out["dmax"] > out["dmin"]).all()
    assert (out["sum_codes"] >= 0).all()
    assert (out["sum_codes"] <= 255 * n).all()
    assert (out["n_saturated"] >= 2).all()
    assert (out["n_saturated"] <= n).all()


def test_inverted_index_pruning_contract(ray_session):
    """Build the persisted index; a query must (a) read only the buckets
    its terms hash to, (b) leave the other hive directories untouched,
    and (c) return exactly the brute-force answer."""
    import ray

    from ocr_poc_ray.functions.text_index import (
        N_INDEX_BUCKETS,
        boolean_search,
        build_inverted_index,
        probed_bucket_paths,
    )

    idx = tempfile.mkdtemp(prefix="ti_test_")
    try:
        ds = ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        )
        build_inverted_index(ds, idx)
        all_buckets = {d for d in os.listdir(idx) if d.startswith("bucket=")}
        assert len(all_buckets) > 8  # corpus vocabulary spreads over buckets

        terms = ["spark", "window"]
        probed = probed_bucket_paths(idx, terms)
        assert 1 <= len(probed) <= len(terms)
        assert set(os.path.basename(p) for p in probed) < all_buckets

        got = boolean_search(idx, terms)["doc_id"].tolist()
        texts = _texts()
        want = sorted(
            i
            for i, t in texts.items()
            if all(term in t.lower().split() for term in terms)
        )
        assert got == want
        assert len(want) > 0

        # a term absent from the corpus must yield the empty result
        empty = boolean_search(idx, ["spark", "zzzznotaword"])
        assert len(empty) == 0
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_index_delta_append(ray_session):
    """Incremental maintenance: docs indexed later via a delta are
    found by the same query without touching the base index's files."""
    import ray

    import pyarrow as pa

    from ocr_poc_ray.functions.text_index import (
        append_index_delta,
        boolean_search,
        build_inverted_index,
    )

    idx = tempfile.mkdtemp(prefix="ti_delta_")
    try:
        base = ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([1, 2], pa.int64()),
                 "text": pa.array(["alpha beta gamma", "beta gamma delta"])}
            )
        )
        build_inverted_index(base, idx)
        before = boolean_search(idx, ["beta", "gamma"])["doc_id"].tolist()
        assert before == [1, 2]

        base_files = {
            os.path.join(r, f)
            for r, _, fs in os.walk(idx)
            for f in fs
        }
        base_mtimes = {p: os.path.getmtime(p) for p in base_files}

        delta = ray.data.from_arrow(
            pa.table(
                {"doc_id": pa.array([7], pa.int64()),
                 "text": pa.array(["gamma beta epsilon"])}
            )
        )
        append_index_delta(delta, idx, "day1")

        after = boolean_search(idx, ["beta", "gamma"])["doc_id"].tolist()
        assert after == [1, 2, 7]
        # base files untouched (append never rewrites the base)
        for p, m in base_mtimes.items():
            assert os.path.getmtime(p) == m
        # term only in the delta
        assert boolean_search(idx, ["epsilon"])["doc_id"].tolist() == [7]
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def test_curation_funnel_monotone(ray_session):
    """Funnel counts never increase stage over stage."""
    from ocr_poc_ray.queries.documents import doc_curation_funnel

    out = doc_curation_funnel(SF_DIR).sort_values("stage_idx")
    n = out["n_docs"].tolist()
    assert n == sorted(n, reverse=True)
    assert out.iloc[0]["stage"] == "total" and n[0] == 500


def test_boolean_search_empty_terms(ray_session):
    from ocr_poc_ray.functions.text_index import boolean_search

    out = boolean_search("/nonexistent", [])
    assert list(out.columns) == ["doc_id"]
    assert len(out) == 0
