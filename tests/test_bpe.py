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
