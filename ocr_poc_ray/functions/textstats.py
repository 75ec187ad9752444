"""Text analysis over document tables: token counts, quality, lang-ID,
fingerprints.

All transforms are column-appending ``map_batches`` kernels —
vectorized with ``pyarrow.compute`` where a kernel exists, pandas str
ops otherwise; no Python loop over rows in any hot path except the
hashlib fingerprint (a per-row digest by definition, like the
reference's per-document model call).

Every formula here is deliberately mirrorable in ANSI SQL so the
DuckDB oracle can verify it (see ``ocr_poc_ray.queries.documents``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# --------------------------------------------------------------------------
# Token counting: whitespace tokens + a BPE-ish word/punct regex.
# SQL mirror: len(regexp_split_to_array(trim(text), '\s+')) and
# len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')).
# --------------------------------------------------------------------------
BPE_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def _token_count_kernel(batch: pa.Table, text_col: str) -> pa.Table:
    text = batch[text_col]
    ws_tokens = pc.list_value_length(pc.utf8_split_whitespace(pc.utf8_trim_whitespace(text)))
    # empty string → split gives [""] (length 1); force 0
    empty = pc.equal(pc.utf8_trim_whitespace(text), "")
    ws_tokens = pc.if_else(empty, pa.scalar(0, pa.int32()), pc.cast(ws_tokens, pa.int32()))
    bpe_tokens = pc.cast(pc.count_substring_regex(text, BPE_TOKEN_RE), pa.int32())
    n_chars = pc.cast(pc.utf8_length(text), pa.int32())
    batch = batch.append_column("n_chars_computed", n_chars)
    batch = batch.append_column("n_ws_tokens", ws_tokens)
    batch = batch.append_column("n_bpe_tokens", bpe_tokens)
    return batch


def add_token_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        lambda b: _token_count_kernel(b, text_col), batch_format="pyarrow"
    )


# --------------------------------------------------------------------------
# Quality scoring: length / punctuation / stopword / uppercase ratios.
# SQL mirror in queries.documents (same thresholds, same regexes).
# --------------------------------------------------------------------------
STOPWORDS_EN = (
    "the", "and", "of", "a", "to", "in", "is", "that", "it", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
)
PUNCT_RE = r"[^\w\s]"
QUALITY_MIN_CHARS = 50
QUALITY_MAX_PUNCT_RATIO = 0.20
QUALITY_MIN_WS_TOKENS = 10


def _quality_kernel(batch: pa.Table, text_col: str) -> pa.Table:
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.float64())
    punct_ratio = pc.if_else(
        pc.greater(n_chars, 0), pc.divide(n_punct, n_chars), pa.scalar(0.0)
    )
    trimmed = pc.utf8_trim_whitespace(text)
    ws_tokens = pc.list_value_length(pc.utf8_split_whitespace(trimmed))
    ws_tokens = pc.if_else(
        pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), pc.cast(ws_tokens, pa.int32())
    )
    stop_pattern = r"(?i)\b(" + "|".join(STOPWORDS_EN) + r")\b"
    n_stop = pc.cast(pc.count_substring_regex(text, stop_pattern), pa.float64())
    stop_ratio = pc.if_else(
        pc.greater(pc.cast(ws_tokens, pa.float64()), 0),
        pc.divide(n_stop, pc.cast(ws_tokens, pa.float64())),
        pa.scalar(0.0),
    )
    is_quality = pc.and_(
        pc.and_(
            pc.greater_equal(n_chars, QUALITY_MIN_CHARS),
            pc.less_equal(punct_ratio, QUALITY_MAX_PUNCT_RATIO),
        ),
        pc.greater_equal(ws_tokens, QUALITY_MIN_WS_TOKENS),
    )
    batch = batch.append_column("punct_ratio", pc.round(punct_ratio, 6))
    batch = batch.append_column("stopword_ratio", pc.round(stop_ratio, 6))
    batch = batch.append_column("is_quality", is_quality)
    return batch


def add_quality(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(lambda b: _quality_kernel(b, text_col), batch_format="pyarrow")


# --------------------------------------------------------------------------
# Language ID: stopword-hit heuristic over 4 languages; argmax with a
# fixed priority order on ties.  SQL mirror uses the same regex counts.
# --------------------------------------------------------------------------
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "fr": ("le", "la", "les", "de", "des", "et", "est", "une", "dans", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für"),
    "es": ("el", "los", "las", "de", "y", "es", "una", "en", "por", "que"),
}
LANG_PRIORITY = ("en", "fr", "de", "es")  # tie-break order


def _lang_pattern(lang: str) -> str:
    return r"(?i)\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"


def _langid_kernel(batch: pa.Table, text_col: str) -> pa.Table:
    text = batch[text_col]
    counts = {
        lang: pc.cast(pc.count_substring_regex(text, _lang_pattern(lang)), pa.int64())
        for lang in LANG_PRIORITY
    }
    n = len(batch)
    count_mat = np.stack([counts[lang].to_numpy(zero_copy_only=False) for lang in LANG_PRIORITY])
    best = np.argmax(count_mat, axis=0)  # first max wins = LANG_PRIORITY order
    total = count_mat.sum(axis=0)
    labels = np.array(LANG_PRIORITY, dtype=object)[best]
    labels[total == 0] = "und"
    batch = batch.append_column("lang_pred", pa.array(labels.tolist(), pa.string()))
    for lang in LANG_PRIORITY:
        batch = batch.append_column(f"stop_hits_{lang}", counts[lang])
    return batch


def add_langid(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(lambda b: _langid_kernel(b, text_col), batch_format="pyarrow")


# --------------------------------------------------------------------------
# Fingerprints: md5 content hash (SQL-mirrorable: DuckDB md5()) + a
# 64-bit rolling polynomial hash (engine-side only — deterministic
# across processes, unlike Python's seeded hash()).
# --------------------------------------------------------------------------
_ROLL_BASE = np.uint64(1_000_003)


def _rolling_hash(texts: pd.Series) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.uint64)
    base = _ROLL_BASE
    for i, t in enumerate(texts):
        h = np.uint64(1469598103934665603)  # FNV offset basis
        for b in t.encode("utf-8", "ignore"):
            h = h * base + np.uint64(b)
        out[i] = h
    return out


def _fingerprint_kernel(batch: pd.DataFrame, text_col: str) -> pd.DataFrame:
    texts = batch[text_col].fillna("")
    batch["md5_fp"] = [hashlib.md5(t.encode("utf-8", "ignore")).hexdigest() for t in texts]
    with np.errstate(over="ignore"):
        batch["roll_fp"] = _rolling_hash(texts).view(np.int64)  # two's-complement view
    return batch


def add_fingerprints(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        lambda b: _fingerprint_kernel(b, text_col), batch_format="pandas"
    )


# --------------------------------------------------------------------------
# Fixed-size token chunking: split each document into consecutive
# windows of `chunk_size` whitespace tokens (training-sample prep).
# Fully vectorized flat-map: one Arrow whitespace split per batch, then
# numpy offset math + one gather builds every chunk's token list, and
# `pc.binary_join` re-joins them — no Python loop over rows or chunks.
# SQL mirror: regexp_extract_all(text, '\S+') + generate_series +
# 1-based-inclusive list slices (see queries.documents).
# --------------------------------------------------------------------------


def _chunk_kernel(
    batch: pa.Table, text_col: str, id_col: str, chunk_size: int,
    stride: int | None = None,
) -> pa.Table:
    stride = chunk_size if stride is None else stride
    out_schema = pa.schema(
        [
            (id_col, batch.schema.field(id_col).type),
            ("chunk_idx", pa.int64()),
            ("chunk_text", pa.string()),
            ("n_chunk_tokens", pa.int64()),
        ]
    )
    if len(batch) == 0:
        return out_schema.empty_table()
    text = pc.utf8_trim_whitespace(batch[text_col])
    toks = pc.utf8_split_whitespace(text)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy().astype(np.int64)
    values = toks.values
    counts = np.diff(offsets)
    # trimmed-empty text splits to [""]: zero tokens, zero chunks
    empty = pc.equal(text, "").to_numpy(zero_copy_only=False)
    counts = np.where(empty, 0, counts)

    n_chunks = (counts + stride - 1) // stride
    total_chunks = int(n_chunks.sum())
    if total_chunks == 0:
        return out_schema.empty_table()
    doc_idx = np.repeat(np.arange(len(counts)), n_chunks)
    excl_chunks = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    chunk_idx = np.arange(total_chunks) - excl_chunks[doc_idx]
    starts = offsets[:-1][doc_idx] + chunk_idx * stride
    lens = np.minimum(counts[doc_idx] - chunk_idx * stride, chunk_size)

    # gather the chunks' token ranges into one contiguous values array
    total_toks = int(lens.sum())
    excl_toks = np.concatenate([[0], np.cumsum(lens)[:-1]])
    flat_idx = np.arange(total_toks) + np.repeat(starts - excl_toks, lens)
    chunk_vals = values.take(pa.array(flat_idx, pa.int64()))
    chunk_offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(pa.array(chunk_offsets, pa.int32()), chunk_vals)

    return pa.table(
        {
            id_col: batch[id_col].take(pa.array(doc_idx, pa.int64())),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "chunk_text": pc.binary_join(lists, " "),
            "n_chunk_tokens": pa.array(lens, pa.int64()),
        }
    )


def chunk_tokens(
    ds: Dataset, *, text_col: str = "text", id_col: str = "doc_id",
    chunk_size: int = 32, stride: int | None = None,
) -> Dataset:
    """(id, chunk_idx, chunk_text, n_chunk_tokens) — each document split
    into `chunk_size`-token windows starting every `stride` tokens
    (default stride = chunk_size → consecutive non-overlapping windows;
    stride < chunk_size → the overlapping RAG chunker).  Empty docs
    emit none; fully vectorized flat-map (offset math + one
    binary_join per batch)."""
    return ds.map_batches(
        lambda b: _chunk_kernel(b, text_col, id_col, chunk_size, stride),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------------------
# Corpus heavy hitters: exact global top-k tokens by total count.
# Shape: per-batch Arrow value_counts (the combiner — output is the
# batch's VOCABULARY, not its rows), hash-bucketed exact combine (every
# token lives wholly in one bucket, so per-bucket top-k is a superset
# of the global winners), then a k×buckets driver merge.  The all-to-all
# moves only (token, count) partials — per-batch-vocabulary sized.
# --------------------------------------------------------------------------


def _vocab_partial(text_col: str, n_buckets: int):
    """Per-batch vocabulary combiner shared by the corpus-vocabulary
    statistics: one Arrow lower+split+value_counts per batch, output
    sized by the batch's vocabulary (never its rows), hash-bucketed so
    every token lives wholly in one downstream group."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        text = pc.utf8_trim_whitespace(pc.utf8_lower(batch[text_col]))
        toks = pc.utf8_split_whitespace(text)
        vc = pc.list_flatten(toks).value_counts()
        df = pd.DataFrame(
            {
                "token": vc.field("values").to_pandas(),
                "cnt": vc.field("counts").to_pandas().astype("int64"),
            }
        )
        df = df[df["token"] != ""]  # trimmed-empty docs split to [""]
        df["_hb"] = (
            pd.util.hash_array(df["token"].to_numpy(dtype=object)) % n_buckets
        ).astype("int64")
        return df

    return partial


def top_tokens(
    ds: Dataset, *, k: int = 10, text_col: str = "text", n_buckets: int = 16
) -> pd.DataFrame:
    """Global top-`k` lowercase whitespace tokens by occurrence count,
    ties broken token-ascending.  Exact at any vocabulary size: the
    bucket count bounds the combine's group cardinality (vocabulary /
    n_buckets per group), never the corpus size."""

    from ocr_poc_ray.functions.dedup import _scaled_buckets

    n_buckets = _scaled_buckets(ds, floor=n_buckets)
    partial = _vocab_partial(text_col, n_buckets)

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("token", as_index=False)["cnt"].sum()
        return agg.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(k)

    cands = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    out = (
        cands.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
        .rename(columns={"cnt": "n"})
    )
    return out[["token", "n"]].astype({"n": "int64"})


def token_freq_spectrum(
    ds: Dataset, *, text_col: str = "text", n_buckets: int = 16
) -> pd.DataFrame:
    """Zipf spectrum of the corpus vocabulary: for each occurrence
    count `freq`, how many distinct tokens occur exactly that often —
    the count-of-counts curve used to size tokenizer vocabularies and
    spot synthetic/boilerplate corpora (natural text is ~power-law).

    Exact at any vocabulary size with nothing vocabulary-sized ever
    leaving a task: per-batch vocabulary partials → hash-bucketed exact
    token counts (each token wholly in one bucket) → per-bucket
    count-of-counts partial → one tiny combine over distinct frequency
    values (≪ vocabulary; bounded by the largest token count)."""

    from ocr_poc_ray.functions.dedup import _scaled_buckets

    partial = _vocab_partial(text_col, _scaled_buckets(ds, floor=n_buckets))
    return _freq_spectrum_finish(ds.map_batches(partial, batch_format="pyarrow"))


def value_freq_spectrum(
    ds: Dataset, *, col: str, n_buckets: int = 16
) -> pd.DataFrame:
    """Count-of-counts over a whole COLUMN's values (e.g. passage-
    duplication cluster sizes over chunk_text) — same bounded shape as
    the token spectrum, with the per-batch combiner a plain
    value_counts of the column."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts()
        df = pd.DataFrame(
            {
                "token": vc.index.to_numpy(dtype=object),
                "cnt": vc.to_numpy().astype("int64"),
            }
        )
        df["_hb"] = (
            pd.util.hash_array(df["token"].to_numpy(dtype=object)) % n_buckets
        ).astype("int64")
        return df

    return _freq_spectrum_finish(ds.map_batches(partial, batch_format="pandas"))


def _freq_spectrum_finish(partials: Dataset) -> pd.DataFrame:
    """Bucketed exact counts → per-bucket count-of-counts → one tiny
    combine over distinct frequency values."""

    def bucket_spectrum(group: pd.DataFrame) -> pd.DataFrame:
        freq = group.groupby("token")["cnt"].sum()
        vc = freq.value_counts()
        return pd.DataFrame(
            {
                "freq": vc.index.to_numpy(dtype="int64"),
                "n_tokens": vc.to_numpy(dtype="int64"),
            }
        )

    parts = (
        partials.groupby("_hb")
        .map_groups(bucket_spectrum, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({"freq": pd.Series([], dtype="int64"),
                             "n_tokens": pd.Series([], dtype="int64")})
    out = (
        parts.groupby("freq", as_index=False)["n_tokens"]
        .sum()
        .sort_values("freq", kind="mergesort")
        .reset_index(drop=True)
    )
    return out.astype({"freq": "int64", "n_tokens": "int64"})


# --------------------------------------------------------------------------
# Repetition scoring (Gopher-style): fraction of a document's bigrams
# taken by its single most frequent bigram.  Row-local and vectorized:
# one Arrow lower+split per batch, numpy offset math builds every
# bigram, one in-batch pandas groupby finds each doc's max count.
# SQL mirror: list comprehension bigrams + unnest (queries.documents).
# --------------------------------------------------------------------------

REPETITION_THRESHOLD = 0.05  # strict > ; both engines compare the raw
# IEEE double mx/(nt-1), so the boundary is bit-identical


def _repetition_kernel(batch: pa.Table, text_col: str) -> pa.Table:
    n = len(batch)
    if n == 0:
        return batch.append_column(
            "top_bigram_frac", pa.array([], pa.float64())
        ).append_column("is_repetitive", pa.array([], pa.bool_()))
    text = pc.utf8_trim_whitespace(pc.utf8_lower(batch[text_col]))
    toks = pc.utf8_split_whitespace(text)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy().astype(np.int64)
    counts = np.diff(offsets)
    empty = pc.equal(text, "").to_numpy(zero_copy_only=False)
    counts = np.where(empty, 0, counts)

    nbg = np.maximum(counts - 1, 0)
    total = int(nbg.sum())
    frac = np.zeros(n, dtype=np.float64)
    if total:
        vals = toks.values.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n), nbg)
        excl = np.concatenate([[0], np.cumsum(nbg)[:-1]])
        pos = np.arange(total) - excl[doc_idx] + offsets[:-1][doc_idx]
        bigrams = pd.Series(vals[pos], dtype=object) + " " + pd.Series(
            vals[pos + 1], dtype=object
        )
        mx = (
            pd.DataFrame({"d": doc_idx, "bg": bigrams})
            .groupby(["d", "bg"], sort=False)
            .size()
            .groupby(level=0)
            .max()
        )
        d = mx.index.to_numpy()
        frac[d] = mx.to_numpy(np.float64) / (counts[d] - 1)
    batch = batch.append_column("top_bigram_frac", pa.array(np.round(frac, 6)))
    batch = batch.append_column(
        "is_repetitive", pa.array(frac > REPETITION_THRESHOLD)
    )
    return batch


def add_repetition(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        lambda b: _repetition_kernel(b, text_col), batch_format="pyarrow"
    )
