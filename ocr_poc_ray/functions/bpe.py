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

import numpy as np
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


class BpeTokenizer:
    """Actor-pool BPE application stage: the learned merge table is
    fetched once per actor (zero-copy broadcast ref) and a
    distinct-word → token-count cache lives for the actor's lifetime —
    the same load-once / state-amortization seat a real tokenizer
    (sentencepiece, tiktoken) occupies in a training-data pipeline.
    Corpus words repeat heavily, so each actor encodes a given word at
    most once across ALL the batches it sees.

    Emits per-doc ``(doc_id, <keep_cols...>, n_chars, n_words,
    n_bpe_tokens)`` — ``n_bpe_tokens`` counts the greedy segmentation
    of each word + the end-of-word sentinel, the standard BPE
    accounting.
    """

    def __init__(self, merges_ref, *, keep_cols: tuple[str, ...] = ()):
        import ray as _ray

        m = _ray.get(merges_ref)
        self._merges = m
        self._cache: dict[str, int] = {}
        self._keep = tuple(keep_cols)

    def _n_tokens(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(bpe_encode(word, self._merges))
            self._cache[word] = n
        return n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        words_per_doc = (
            batch["text"].fillna("").str.lower().str.split()
        )
        flat: list[str] = [w for ws in words_per_doc for w in ws]
        lens = np.asarray([len(ws) for ws in words_per_doc], dtype=np.int64)
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        per_unique = np.asarray(
            [self._n_tokens(w) for w in uniques], dtype=np.int64
        )
        tok_counts = (
            per_unique[codes] if len(flat) else np.zeros(0, dtype=np.int64)
        )
        char_counts = (
            np.asarray([len(w) for w in flat], dtype=np.int64)
            if flat
            else np.zeros(0, dtype=np.int64)
        )
        offsets = np.concatenate(([0], np.cumsum(lens)))
        n_tok = np.zeros(len(batch), dtype=np.int64)
        n_chr = np.zeros(len(batch), dtype=np.int64)
        ne = lens > 0
        if ne.any():
            n_tok[ne] = np.add.reduceat(tok_counts, offsets[:-1][ne])
            n_chr[ne] = np.add.reduceat(char_counts, offsets[:-1][ne])
        out = {"doc_id": batch["doc_id"].to_numpy()}
        for c in self._keep:
            out[c] = batch[c].to_numpy()
        out["n_chars"] = n_chr
        out["n_words"] = lens
        out["n_bpe_tokens"] = n_tok
        return pd.DataFrame(out)
