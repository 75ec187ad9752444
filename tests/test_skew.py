"""Skew stress (SURVEY.md §7.4.3 / north_rule): a conversation holding
most of the corpus must flow through the ordering sort and the
conversation assembly without one task receiving the whole key — and
the output must still be byte-identical to the single-process oracle."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def skewed_corpus():
    """3 conversations; Zipf(1.1) over 3 → conv-0 holds ~60% of 30k turns."""
    from ocr_poc_ray.synth import generate_transcripts

    transcripts, expected = generate_transcripts(n_turns=30_000, n_convs=3, seed=21)
    return transcripts, expected.to_pandas()


def test_ordered_extraction_under_skew(ray_session, skewed_corpus):
    import ray.data as rd

    from ocr_poc_ray.pipelines.extraction import extract_transcripts

    transcripts, expected = skewed_corpus
    ds = rd.from_arrow(transcripts).repartition(16)
    got = extract_transcripts(ds, ordered=True, sort_num_blocks=8).to_pandas()
    # output is globally ordered despite one conv dominating
    key = list(zip(got["conv_id"], got["turn_idx"]))
    assert key == sorted(key)
    merged = expected.merge(
        got[["conv_id", "turn_idx", "extracted_text", "success"]],
        on=["conv_id", "turn_idx"],
        suffixes=("_e", "_g"),
    )
    assert len(merged) == len(expected)
    assert (merged["extracted_text_e"] == merged["extracted_text_g"]).all()
    assert (merged["success_e"] == merged["success_g"]).all()


def test_conversation_docs_under_skew(ray_session, skewed_corpus):
    """The giant conversation's document must equal the oracle concat —
    the range-salt (block boundaries on turn_idx ranges) must never
    reorder or drop a chunk."""
    import ray.data as rd

    from ocr_poc_ray.pipelines.extraction import extract_transcripts
    from ocr_poc_ray.stages.ordering import conversation_docs

    transcripts, expected = skewed_corpus
    ds = rd.from_arrow(transcripts).repartition(16)
    ext = extract_transcripts(ds, ordered=False)
    docs = conversation_docs(ext, sort_num_blocks=8).to_pandas()

    exp_ok = expected[expected["success"]]
    oracle = (
        exp_ok.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")
        .agg(n_turns=("turn_idx", "size"), doc_text=("extracted_text", " ".join))
        .reset_index()
    )
    merged = oracle.merge(docs, on="conv_id", suffixes=("_e", "_g"))
    assert len(merged) == len(oracle)
    assert (merged["n_turns_e"] == merged["n_turns_g"]).all()
    assert (merged["doc_text_e"] == merged["doc_text_g"]).all()
    # conv-0 really is giant (the test is vacuous otherwise)
    share = oracle.set_index("conv_id")["n_turns"].max() / oracle["n_turns"].sum()
    assert share > 0.5


def test_one_conversation_spans_every_block(ray_session):
    """The degenerate skew: ONE conversation owns the whole corpus, so
    every sorted block is an edge partial of the same key.  The
    distributed edge merge (bucketed groupby, no driver text collect)
    must reassemble the document exactly."""
    import ray.data as rd

    from ocr_poc_ray.pipelines.extraction import extract_transcripts
    from ocr_poc_ray.stages.ordering import conversation_docs
    from ocr_poc_ray.synth import generate_transcripts

    transcripts, expected = generate_transcripts(n_turns=12_000, n_convs=1, seed=5)
    exp = expected.to_pandas()
    ds = rd.from_arrow(transcripts).repartition(16)
    ext = extract_transcripts(ds, ordered=False)
    docs = conversation_docs(ext, sort_num_blocks=8).to_pandas()

    exp_ok = exp[exp["success"]].sort_values(["conv_id", "turn_idx"])
    assert len(docs) == 1
    assert docs["n_turns"].iloc[0] == len(exp_ok)
    assert docs["doc_text"].iloc[0] == " ".join(exp_ok["extracted_text"])
