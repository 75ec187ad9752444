"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

The textbook trainer never touches the corpus per merge: it reduces the
corpus ONCE to a word-frequency table (distributed — the only
corpus-sized step, the same bounded-bucket vocabulary combine every
textstats operator uses), then runs the merge loop locally over that
table (vocabulary-sized, not corpus-sized).  That split is exactly how
the reference implementation and every production trainer scale: the
cluster pays one pass; the driver pays O(n_merges × vocab).

``top_v`` caps the table to the most frequent words (per-bucket top
shard, the ``doc_unigram_logprob`` bounded-model pattern) so a 100-TB
crawl with an unbounded typo/URL tail cannot send an unbounded
vocabulary to the driver.  The cap is a visible parameter, logged in
the result metadata column — never a silent drop: merges learned on a
frequency-capped table differ from the uncapped ones only through the
dropped tail's counts, and callers choose the cap.
"""

from __future__ import annotations

import pandas as pd

from ray.data import Dataset

END_OF_WORD = "</w>"


def word_frequency_table(
    ds: Dataset,
    *,
    text_col: str = "text",
    n_buckets: int = 16,
    top_v: int | None = None,
) -> pd.DataFrame:
    """Corpus → (word, n) frequency table, lowercased whitespace words.

    One pass: per-batch Arrow value_counts partials (batch-vocabulary
    sized) → hash-bucket combine (every word lives wholly in one
    bucket task) → driver merge of the per-bucket results.  With
    ``top_v``, each bucket keeps its top ``top_v // n_buckets`` shard
    (count desc, word asc) — a superset-of-winners bound identical to
    ``top_tokens``, so the driver-side table is capped at ``top_v``
    regardless of corpus vocabulary.
    """
    from ocr_poc_ray.functions.dedup import _scaled_buckets
    from ocr_poc_ray.functions.textstats import _vocab_partial

    n_buckets = _scaled_buckets(ds, floor=n_buckets)
    partial = _vocab_partial(text_col, n_buckets)

    def bucket_sum(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("token", as_index=False)["cnt"].sum()
        if top_v is not None:
            agg = agg.sort_values(
                ["cnt", "token"], ascending=[False, True], kind="mergesort"
            ).head(max(1, top_v // n_buckets))
        return agg

    wf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(bucket_sum, batch_format="pandas")
        .to_pandas()
    )
    if wf.empty:  # 0-row to_pandas drops columns (CLAUDE.md)
        return pd.DataFrame(
            {"token": pd.Series([], dtype=object),
             "cnt": pd.Series([], dtype="int64")}
        )
    if top_v is not None and len(wf) > top_v:
        wf = wf.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(top_v)
    return wf.sort_values(
        ["cnt", "token"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)


def bpe_train(
    word_freq: pd.DataFrame,
    n_merges: int,
    *,
    min_pair_count: int = 2,
) -> pd.DataFrame:
    """Classic BPE merge loop over a (token, cnt) frequency table.

    Deterministic: each round merges the adjacent symbol pair with the
    highest corpus count, ties broken by the pair's lexicographic
    order ``(left, right)`` ascending.  Stops early when no pair
    reaches ``min_pair_count``.  Returns one row per learned merge:
    ``(rank, left, right, pair_count)``.
    """
    words: list[tuple[list[str], int]] = [
        (list(t) + [END_OF_WORD], int(c))
        for t, c in zip(word_freq["token"], word_freq["cnt"])
        if isinstance(t, str) and t
    ]
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < min_pair_count:
            break
        merges.append(
            {"rank": rank, "left": left, "right": right, "pair_count": n}
        )
        joined = left + right
        for syms, _c in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i : i + 2] = [joined]
                else:
                    i += 1
    out = pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])
    return out.astype({"rank": "int64", "pair_count": "int64"})


def bpe_encode(word: str, merges: pd.DataFrame) -> list[str]:
    """Apply learned merges to one word, in rank order — the standard
    greedy BPE segmenter (row-local; batch application is a plain
    ``map_batches`` over this)."""
    syms = list(word) + [END_OF_WORD]
    for left, right in zip(merges["left"], merges["right"]):
        i = 0
        while i < len(syms) - 1:
            if syms[i] == left and syms[i + 1] == right:
                syms[i : i + 2] = [left + right]
            else:
                i += 1
    return syms
