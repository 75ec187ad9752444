"""Streaming data-loader exit (pipelines/loader.py).

The contract: the iterator path is the SAME pipeline as the written-
parquet path — identical rows, identical bytes — and training packs
respect the budget, cover every document exactly once, and follow the
language-interleaved order regardless of input partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray


# ---------------------------------------------------------------------------
# iter_extracted ≡ run_extraction's parquet output (byte equality)
# ---------------------------------------------------------------------------


def test_iter_extracted_matches_written_parquet(ray_session, fixture_dir, tmp_path):
    import duckdb

    from ocr_poc_ray.pipelines.extraction import run_extraction
    from ocr_poc_ray.pipelines.loader import iter_extracted

    out = str(tmp_path / "written")
    run_extraction(fixture_dir["transcripts"], out)

    batches = list(iter_extracted(fixture_dir["transcripts"], batch_size=257))
    assert len(batches) > 1, "expected multiple streamed batches"
    streamed = pa.concat_tables(batches).to_pandas()

    written = duckdb.sql(
        f"select * from read_parquet('{out}/*.parquet')"
    ).df()[list(streamed.columns)]

    key = ["conv_id", "turn_idx"]
    s = streamed.sort_values(key, kind="mergesort").reset_index(drop=True)
    w = written.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, w)
    # ordered=True: the stream itself arrives in stable turn order
    assert streamed[key].equals(s[key])


# ---------------------------------------------------------------------------
# iter_training_packs: budget, coverage, order, determinism
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def doc_table():
    rng = np.random.RandomState(3)
    langs = np.array(["en", "fr", "de"], dtype=object)
    n = 400
    texts = [
        " ".join(f"w{rng.randint(100)}" for _ in range(rng.randint(0, 120)))
        for _ in range(n)
    ]
    texts[7] = " ".join(f"big{i}" for i in range(900))  # oversized single doc
    texts[11] = ""  # empty doc
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(langs[rng.randint(3, size=n)]),
            "text": pa.array(texts, pa.string()),
        }
    )


def _packs(doc_table, budget=512, **kw):
    from ocr_poc_ray.pipelines.loader import iter_training_packs

    ds = ray.data.from_arrow(doc_table).repartition(7)
    return list(iter_training_packs(ds, budget=budget, batch_rows=64, **kw))


def test_packs_cover_budget_and_order(doc_table):
    packs = _packs(doc_table)
    # every doc exactly once
    all_ids = np.concatenate([p["doc_ids"] for p in packs])
    assert sorted(all_ids.tolist()) == doc_table["doc_id"].to_pylist()
    # pack ids strictly increasing in stream order
    pids = [p["pack_id"] for p in packs]
    assert pids == sorted(pids) and len(set(pids)) == len(pids)
    # token budget: only packs containing a single oversized doc exceed it
    for p in packs:
        assert p["n_tokens"] == len(p["tokens"])
        if p["n_tokens"] > 512:
            assert len(p["doc_ids"]) == 1 or p["n_tokens"] - 512 < 512
    # tokens are the whitespace tokens of member docs, in order, and
    # doc_offsets are the loss-masking boundaries: slicing tokens at
    # [offset[i], offset[i+1]) reproduces each member doc's tokens
    texts = dict(zip(doc_table["doc_id"].to_pylist(), doc_table["text"].to_pylist()))
    for p in packs[:10]:
        expect = [tok for d in p["doc_ids"] for tok in texts[int(d)].split()]
        assert p["tokens"] == expect
        offs = p["doc_offsets"].tolist() + [p["n_tokens"]]
        assert len(offs) == len(p["doc_ids"]) + 1
        for i, d in enumerate(p["doc_ids"]):
            assert p["tokens"][offs[i]: offs[i + 1]] == texts[int(d)].split()


def test_packs_match_oracle_assignment(doc_table):
    """The streamed pack layout equals the SQL-window definition
    (doc_pack_interleaved's oracle, run here directly in DuckDB)."""
    import duckdb

    from ocr_poc_ray.queries.documents import DOC_PACK_INTERLEAVED_SQL

    con = duckdb.connect()
    con.register("documents", doc_table)
    oracle = con.sql(DOC_PACK_INTERLEAVED_SQL).df()
    want = oracle.sort_values("interleave_key").groupby("pack_id")["doc_id"].apply(list)

    packs = _packs(doc_table)
    got = {p["pack_id"]: [int(i) for i in p["doc_ids"]] for p in packs}
    assert got == dict(want)


def test_packs_partition_invariant(doc_table):
    from ocr_poc_ray.pipelines.loader import iter_training_packs

    a = _packs(doc_table)
    ds = ray.data.from_arrow(doc_table).repartition(2)
    b = list(iter_training_packs(ds, budget=512, batch_rows=512))
    assert [p["pack_id"] for p in a] == [p["pack_id"] for p in b]
    for pa_, pb in zip(a, b):
        assert pa_["doc_ids"].tolist() == pb["doc_ids"].tolist()
        assert pa_["tokens"] == pb["tokens"]


def test_pack_cli_jsonl(ray_session, doc_table, tmp_path):
    """The pack CLI streams the same layout the library iterator yields."""
    import json

    import pyarrow.parquet as pq

    from ocr_poc_ray.__main__ import main as cli_main
    from ocr_poc_ray.pipelines.loader import iter_training_packs

    src = str(tmp_path / "docs.parquet")
    pq.write_table(doc_table, src)
    out = str(tmp_path / "packs.jsonl")
    assert cli_main(["pack", "--input", src, "--output", out]) == 0
    got = [json.loads(l) for l in open(out)]
    want = list(iter_training_packs(ray.data.from_arrow(doc_table)))
    assert [g["pack_id"] for g in got] == [w["pack_id"] for w in want]
    assert [g["doc_ids"] for g in got] == [w["doc_ids"].tolist() for w in want]
    assert [g["n_tokens"] for g in got] == [w["n_tokens"] for w in want]


def test_packs_without_lang_column(doc_table):
    packs = _packs(doc_table.drop_columns(["lang"]), lang_col=None)
    all_ids = np.concatenate([p["doc_ids"] for p in packs])
    assert sorted(all_ids.tolist()) == doc_table["doc_id"].to_pylist()
    # without interleaving the member ids are globally ordered
    assert all_ids.tolist() == sorted(all_ids.tolist())
