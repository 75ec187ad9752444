"""Streaming data-loader exit — the ``predict_iter`` analog.

The reference serves per-record results over HTTP/gRPC and exposes a
lazy iterator for many-document consumption (``extract_many`` returns
``self.ocr.predict_iter(image_paths)``, ``ocr/paddle_extractor.py:49-57``).
The Ray-Data-native analog is ``Dataset.iter_batches``: the SAME lazy
pipeline that ``write_parquet`` would run streams Arrow batches to the
consumer with backpressure — no parquet round-trip, no corpus
materialization, blocks are pipelined while the consumer trains.

Two exits:

- ``iter_extracted``   — extraction envelopes in stable turn order
  (byte-identical content to the written-parquet path; tested).
- ``iter_training_packs`` — tokenized documents in language-interleaved
  order, greedily packed to a token budget (the ``doc_pack_sequences``
  / ``doc_interleaved_order`` semantics as one streamed pipeline);
  each yielded pack is a ready model batch.

Neither owns a Ray session (driver/bench/CLI init; library code never
does) and nothing here collects the corpus to the driver: the only
driver-side state is the ≤1-pack regroup buffer in the iterator.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from ray.data import Dataset

#: greedy packing budget — must match queries.documents.PACK_TOKEN_BUDGET
#: (the oracle-checked definition of a pack)
PACK_TOKEN_BUDGET = 512


# ---------------------------------------------------------------------------
# Extraction envelope stream
# ---------------------------------------------------------------------------


def iter_extracted(
    source,
    *,
    batch_size: int = 4096,
    ordered: bool = True,
    **extract_kw,
) -> Iterator[pa.Table]:
    """Stream extraction envelopes as Arrow batches.

    ``source`` is a parquet path/dir or an existing transcript Dataset;
    the full extraction pipeline (validate → extract → ordering sort)
    runs under the streaming executor and batches arrive in stable
    ``(conv_id, turn_idx)`` order when ``ordered=True`` — the same rows,
    same order, same bytes as ``run_extraction``'s parquet output.
    """
    from ocr_poc_ray.pipelines.extraction import extract_transcripts

    ds = extract_transcripts(source, ordered=ordered, **extract_kw)
    yield from ds.iter_batches(batch_size=batch_size, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Interleave + pack (one range-sort, one prefix scan)
# ---------------------------------------------------------------------------


def interleaved_pack_ids(
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    budget: int = PACK_TOKEN_BUDGET,
) -> Dataset:
    """Token counts + interleaved order + greedy pack assignment.

    Returns the input columns plus ``n_ws_tokens``, ``interleave_key``
    and ``pack_id``, in interleave order.  The k-th document of every
    language gets adjacent interleave keys (round-robin by language —
    the balanced multilingual schedule); packs are greedy in-order
    token bins: ``pack_id = exclusive-cumsum(n_tokens) // budget``.

    Shape: ONE range-sort by ``(lang, id)`` drives a global row-number
    scan (``ordered_prefix_sum``); per-language base ranks are a
    languages-sized driver table; the interleave key is then row-local,
    and the pack scan rides a second ordered prefix sum.  With
    ``lang_col=None`` the interleave degenerates to plain ``id`` order
    (= ``doc_pack_sequences`` semantics) and skips the first scan.
    """
    import pandas as pd

    from ocr_poc_ray.functions.prefix import ordered_prefix_sum
    from ocr_poc_ray.functions.textstats import add_token_counts

    toks = add_token_counts(docs, text_col=text_col).drop_columns(
        ["n_chars_computed", "n_bpe_tokens"]
    )

    if lang_col is None:
        keyed = toks.map_batches(
            lambda t: t.append_column(
                "interleave_key", t[id_col].combine_chunks().cast(pa.int64())
            ),
            batch_format="pyarrow",
        )
    else:
        ranked = ordered_prefix_sum(
            toks,
            sort_cols=[lang_col, id_col],
            value_col=None,
            out_col="_rk",
            unique_col=id_col,
        ).materialize()  # branched: per-lang bases + the keying pass

        def base_partial(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(lang_col, as_index=False)["_rk"].min()
            return g.rename(columns={"_rk": "base"})

        bases = (
            ranked.map_batches(base_partial, batch_format="pandas")
            .to_pandas()
            .groupby(lang_col)["base"]
            .min()
            .sort_index()
        )
        langs = np.asarray(bases.index.to_numpy(), dtype=object)
        base_arr = bases.to_numpy(np.int64)
        n_langs = max(len(langs), 1)

        def add_key(b: pd.DataFrame) -> pd.DataFrame:
            code = np.searchsorted(langs, b[lang_col].to_numpy(dtype=object))
            within = b["_rk"].to_numpy(np.int64) - base_arr[code]
            return b.assign(interleave_key=within * n_langs + code).drop(
                columns=["_rk"]
            )

        keyed = ranked.map_batches(add_key, batch_format="pandas")

    packed = ordered_prefix_sum(
        keyed,
        sort_cols=["interleave_key"],
        value_col="n_ws_tokens",
        out_col="_cum",
        unique_col=id_col,
    )

    def assign_pack(b: pd.DataFrame) -> pd.DataFrame:
        c = b["_cum"].to_numpy(np.int64)
        n = b["n_ws_tokens"].to_numpy(np.int64)
        return b.assign(pack_id=(c - n) // budget).drop(columns=["_cum"])

    return packed.map_batches(assign_pack, batch_format="pandas")


def iter_training_packs(
    docs: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    budget: int = PACK_TOKEN_BUDGET,
    batch_rows: int = 8192,
) -> Iterator[dict]:
    """Stream ready-to-train packs off the live pipeline.

    Yields one dict per pack, in pack order:
    ``{"pack_id", "doc_ids" (int64 array), "doc_offsets" (int64 array,
    each member doc's first-token index — with ``n_tokens`` these are
    the loss-masking boundaries), "tokens" (list[str], whitespace
    tokens of all member docs in order), "n_tokens"}``.
    Pack membership is the oracle-pinned exclusive-cumsum rule (a doc
    belongs to the pack where it STARTS: ``(cum - n) // budget``), so a
    document never splits and a pack can overflow ``budget`` by less
    than its last member's length — consumers that need a hard cap
    truncate or re-chunk member docs upstream.

    The regroup buffer holds at most one partial pack across Arrow
    batch boundaries; everything upstream streams with backpressure.
    """
    packed = interleaved_pack_ids(
        docs, id_col=id_col, text_col=text_col, lang_col=lang_col, budget=budget
    )
    cur_pid: int | None = None
    cur_ids: list[int] = []
    cur_offsets: list[int] = []
    cur_tokens: list[str] = []

    def _emit() -> dict:
        return {
            "pack_id": cur_pid,
            "doc_ids": np.asarray(cur_ids, dtype=np.int64),
            "doc_offsets": np.asarray(cur_offsets, dtype=np.int64),
            "tokens": cur_tokens,
            "n_tokens": len(cur_tokens),
        }

    for t in packed.iter_batches(batch_size=batch_rows, batch_format="pyarrow"):
        pids = t["pack_id"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        if len(pids) == 0:
            continue
        # segment on pack boundaries within the batch
        starts = np.concatenate([[0], np.flatnonzero(pids[1:] != pids[:-1]) + 1])
        ends = np.append(starts[1:], len(pids))
        for s, e in zip(starts, ends):
            pid = int(pids[s])
            if cur_pid is not None and pid != cur_pid:
                yield _emit()
                cur_ids, cur_offsets, cur_tokens = [], [], []
            cur_pid = pid
            for i, txt in zip(ids[s:e], texts[s:e]):
                cur_ids.append(int(i))
                cur_offsets.append(len(cur_tokens))
                if txt:
                    cur_tokens.extend(txt.split())
    if cur_pid is not None:
        yield _emit()
