"""BPE trainer: golden merges vs an independent brute-force trainer,
partition invariance of the distributed word-frequency pass, and the
encoder round-trip."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data

from ocr_poc_ray.functions.bpe import (
    END_OF_WORD,
    bpe_encode,
    bpe_train,
    word_frequency_table,
)

# the Sennrich et al. (2016) worked example, as raw text
_CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def _brute_force_merges(word_counts: dict[str, int], n: int) -> list[tuple]:
    """Independent reference trainer: dict-based, no shared code with
    ocr_poc_ray.functions.bpe beyond the published algorithm."""
    vocab = {tuple(w) + (END_OF_WORD,): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n):
        pairs: dict[tuple, int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((l, r, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_bpe_train_matches_brute_force(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": _CORPUS})).repartition(4)
    wf = word_frequency_table(ds)
    got = bpe_train(wf, 8)
    want = _brute_force_merges(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 8
    )
    assert list(zip(got["left"], got["right"], got["pair_count"])) == want
    # hand-checked first merge of the worked example: ('e','s') count 9
    assert (got.loc[0, "left"], got.loc[0, "right"], got.loc[0, "pair_count"]) == (
        "e", "s", 9,
    )


def test_word_frequency_partition_invariant(ray_session):
    df = pd.DataFrame({"text": _CORPUS})
    wf1 = word_frequency_table(ray.data.from_pandas(df).repartition(1))
    wf7 = word_frequency_table(ray.data.from_pandas(df).repartition(7))
    pd.testing.assert_frame_equal(wf1, wf7)
    assert int(wf1.loc[wf1["token"] == "newest", "cnt"].iloc[0]) == 6


def test_bpe_train_stops_when_no_pair_repeats(ray_session):
    wf = pd.DataFrame({"token": ["ab", "cd"], "cnt": [1, 1]})
    got = bpe_train(wf, 10)
    assert len(got) == 0  # every pair count is 1 < min_pair_count


def test_bpe_encode_uses_learned_merges(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"text": _CORPUS}))
    merges = bpe_train(word_frequency_table(ds), 10)
    segs = bpe_encode("lowest", merges)
    # merges learned on the corpus must reassemble the pieces exactly
    assert "".join(segs) == "lowest" + END_OF_WORD
    assert len(segs) < len("lowest") + 1  # at least one merge applied
    # 'est</w>' is a learned unit (from newest/widest)
    assert any(s.startswith("est") for s in segs)


def test_top_v_caps_driver_table(ray_session):
    ds = ray.data.from_pandas(
        pd.DataFrame({"text": [f"tok{i} tok{i}" for i in range(200)]})
    ).repartition(4)
    wf = word_frequency_table(ds, top_v=32)
    assert len(wf) <= 32


def test_bpe_tokenizer_actor_matches_driver_encode(ray_session):
    """The actor-pool application stage (per-actor word cache across
    batches) must count exactly what a driver-side bpe_encode of every
    word counts — cache reuse can never change a count."""
    import numpy as np
    import ray as _ray

    from ocr_poc_ray.functions.bpe import BpeTokenizer

    texts = [
        "low lower newest",
        "widest low low newest",
        "",  # empty doc → 0/0/0 row
        "newest newest widest lower",
        "unseenword low",  # word outside the trained vocab still encodes
    ] * 6  # repeats across blocks exercise the cache
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts,
                       "source": ["s0", "s1"] * (len(texts) // 2)})
    ds = ray.data.from_pandas(df).repartition(4)
    merges = bpe_train(
        word_frequency_table(ds), 10
    )
    out = (
        ds.map_batches(
            BpeTokenizer,
            fn_constructor_kwargs={"merges_ref": _ray.put(merges),
                                   "keep_cols": ("source",)},
            batch_format="pandas",
            concurrency=(1, 2),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        words = texts[int(row["doc_id"])].lower().split()
        assert row["n_words"] == len(words)
        assert row["n_chars"] == sum(len(w) for w in words)
        assert row["n_bpe_tokens"] == sum(
            len(bpe_encode(w, merges)) for w in words
        )
    assert (out.loc[out["n_words"] == 0, "n_bpe_tokens"] == 0).all()


def test_bpe_tokenize_report_invariants(ray_session):
    """Registered query: per-source totals are integer-exact and every
    word costs between 1 and len+1 tokens (EOW sentinel bound)."""
    from ocr_poc_ray.queries.documents import doc_bpe_tokenize

    rep = doc_bpe_tokenize("/root/testdata/sf0.001")
    assert list(rep.columns) == [
        "source", "n_docs", "n_words", "n_bpe_tokens", "tokens_per_word"
    ]
    assert rep["n_docs"].sum() == 500
    assert (rep["tokens_per_word"] >= 1.0).all()
    assert (rep["n_bpe_tokens"] >= rep["n_words"]).all()
