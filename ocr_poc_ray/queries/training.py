"""Training-example transforms: the operators that turn a curated
corpus into model-ready training data — fill-in-middle splits
(Bavarian et al. 2022), T5-style span corruption (Raffel et al. 2020),
int8 embedding quantization (the storage/serving compression path), and
boolean retrieval over a persisted inverted index.

Reference analogs: these are the data-side counterparts of the
reference's post-extraction consumers (``api_server.py:259-269`` hands
the envelope to a downstream trainer); the engine materializes the
training views itself.

Parity rules (CLAUDE.md): md5-fraction determinism everywhere a "random"
choice is made — both engines derive the SAME integer from
``md5(key)[:8]``, so cut points and mask decisions are bit-equal; string
surgery is plain char arithmetic (ASCII corpus ⇒ Python slicing ==
DuckDB substr); float expressions are written with identical operation
order so IEEE results match bit-for-bit.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _emb_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def _md5_pct(key: str) -> int:
    """First-8-hex-digit md5 integer — the cross-engine deterministic
    'random' draw (same convention as doc_train_split)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# Fill-in-middle split (Bavarian et al. 2022): two deterministic cut
# points per doc; emit PSM-order training text prefix|<SUF>|suffix|<MID>|middle
# ---------------------------------------------------------------------------


def doc_fim_split(sf_dir: str) -> pd.DataFrame:
    """Fill-in-middle transform: deterministic (md5-derived) cut points
    ``lo <= hi`` over each document's char range; the training example is
    the PSM reordering ``prefix <SUF> suffix <MID> middle`` so the model
    learns infilling from a plain next-token objective.  Row-local, zero
    exchange; md5 is per DOC (2 calls), not per token, so the kernel
    stays cheap at corpus scale."""

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        texts = batch["text"].fillna("").tolist()
        lo_l, hi_l, fim = [], [], []
        for i, t in zip(ids, texts):
            L = len(t)
            r1 = _md5_pct(f"{i}:fim1") % (L + 1)
            r2 = _md5_pct(f"{i}:fim2") % (L + 1)
            lo, hi = (r1, r2) if r1 <= r2 else (r2, r1)
            lo_l.append(lo)
            hi_l.append(hi)
            fim.append(t[:lo] + "<SUF>" + t[hi:] + "<MID>" + t[lo:hi])
        return pd.DataFrame(
            {"doc_id": ids, "cut_lo": lo_l, "cut_hi": hi_l, "fim_text": fim}
        )

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "cut_lo": pd.Series([], dtype="int64"),
             "cut_hi": pd.Series([], dtype="int64"),
             "fim_text": pd.Series([], dtype=object)}
        )
    return out.astype({"doc_id": "int64", "cut_lo": "int64", "cut_hi": "int64"})


DOC_FIM_SPLIT_SQL = """
with c as (
  select doc_id, text,
    ('0x' || substr(md5(doc_id::VARCHAR || ':fim1'), 1, 8))::BIGINT
      % (length(text) + 1) as r1,
    ('0x' || substr(md5(doc_id::VARCHAR || ':fim2'), 1, 8))::BIGINT
      % (length(text) + 1) as r2
  from documents
)
select doc_id,
       least(r1, r2)::BIGINT as cut_lo,
       greatest(r1, r2)::BIGINT as cut_hi,
       substr(text, 1, least(r1, r2)) || '<SUF>'
         || substr(text, greatest(r1, r2) + 1) || '<MID>'
         || substr(text, least(r1, r2) + 1, greatest(r1, r2) - least(r1, r2))
         as fim_text
from c
"""


# ---------------------------------------------------------------------------
# T5 span corruption (Raffel et al. 2020): ~15% of token positions start
# a 3-token mask span; masked runs collapse to one sentinel in the input,
# masked tokens join into the target
# ---------------------------------------------------------------------------

SPAN_START_PCT = 15  # P(position starts a mask span), percent
SPAN_LEN = 3


def doc_span_corruption(sf_dir: str) -> pd.DataFrame:
    """Span-corruption training pairs: deterministic per-position mask
    draws (md5 of ``doc_id:pos`` — bit-equal in both engines), each start
    masking ``SPAN_LEN`` tokens; consecutive masked tokens collapse to a
    single ``<X>`` sentinel in the corrupted input and concatenate into
    the target.  Row-local.  NOTE: per-token md5 is the ORACLE-parity
    choice; the 100-TB path swaps the draw for the vectorized siphash
    (`pd.util.hash_array`) with identical span logic — the run-collapse
    kernel below is already batch-vectorized numpy."""

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        token_lists = [t.split() for t in batch["text"].fillna("").tolist()]
        lens = np.asarray([len(t) for t in token_lists], dtype=np.int64)
        keep = lens > 0
        ids, lens = ids[keep], lens[keep]
        token_lists = [t for t, k in zip(token_lists, keep) if k]
        if len(ids) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "n_masked": pd.Series([], dtype="int64"),
                 "corrupted": pd.Series([], dtype=object),
                 "target": pd.Series([], dtype=object)}
            )
        offsets = np.concatenate(([0], np.cumsum(lens)))
        flat = np.fromiter(
            (tok for toks in token_lists for tok in toks),
            dtype=object, count=int(offsets[-1]),
        )
        pos = np.arange(int(offsets[-1]), dtype=np.int64) - np.repeat(
            offsets[:-1], lens
        ) + 1  # 1-based within doc
        did = np.repeat(ids, lens)
        st = np.fromiter(
            (
                _md5_pct(f"{d}:{p}") % 100 < SPAN_START_PCT
                for d, p in zip(did, pos)
            ),
            dtype=bool, count=len(flat),
        )
        # masked = any start within the previous SPAN_LEN-1 positions
        masked = st.copy()
        for back in range(1, SPAN_LEN):
            sh = np.concatenate((np.zeros(back, dtype=bool), st[:-back]))
            sh[pos <= back] = False  # never cross a doc boundary
            masked |= sh
        prev_m = np.concatenate(([False], masked[:-1]))
        prev_m[pos == 1] = False
        new_run = masked & ~prev_m
        n_masked = np.add.reduceat(masked.astype(np.int64), offsets[:-1])
        corrupted, target = [], []
        for k in range(len(ids)):
            s, e = offsets[k], offsets[k + 1]
            toks, m, nr = flat[s:e], masked[s:e], new_run[s:e]
            corrupted.append(
                " ".join(
                    "<X>" if nr[j] else toks[j]
                    for j in range(len(toks))
                    if not m[j] or nr[j]
                )
            )
            target.append(" ".join(toks[j] for j in range(len(toks)) if m[j]))
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_masked": n_masked,
                "corrupted": corrupted,
                "target": target,
            }
        )

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "n_masked": pd.Series([], dtype="int64"),
             "corrupted": pd.Series([], dtype=object),
             "target": pd.Series([], dtype=object)}
        )
    return out.astype({"doc_id": "int64", "n_masked": "int64"})


DOC_SPAN_CORRUPTION_SQL = rf"""
with toks as (
  select doc_id, unnest(regexp_extract_all(text, '\S+')) as tok,
         generate_subscripts(regexp_extract_all(text, '\S+'), 1) as pos
  from documents
), f as (
  select doc_id, tok, pos,
    case when ('0x' || substr(md5(doc_id::VARCHAR || ':' || pos::VARCHAR),
                               1, 8))::BIGINT % 100 < {SPAN_START_PCT}
         then 1 else 0 end as st
  from toks
), m as (
  select doc_id, tok, pos, st,
    max(st) over (partition by doc_id order by pos
                  rows between {SPAN_LEN - 1} preceding and current row)
      as masked
  from f
), r as (
  select doc_id, tok, pos, masked,
    case when masked = 1 and coalesce(
           lag(masked) over (partition by doc_id order by pos), 0) = 0
         then 1 else 0 end as new_run
  from m
)
select doc_id,
  sum(masked)::BIGINT as n_masked,
  coalesce(string_agg(
    case when masked = 0 then tok when new_run = 1 then '<X>' end,
    ' ' order by pos), '') as corrupted,
  coalesce(string_agg(case when masked = 1 then tok end,
                      ' ' order by pos), '') as target
from r
group by doc_id
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization of the embedding table: per-dim affine codes,
# integer-exact audit columns (the compression path for vector serving)
# ---------------------------------------------------------------------------


def vec_int8_quantize(sf_dir: str) -> pd.DataFrame:
    """Per-dimension int8 scalar quantization audit: global per-dim
    min/max (one partial pass, 2×d floats per block), then
    ``code = floor((x - dmin) * 255.0 / (dmax - dmin) + 0.5)`` per value.
    Emits per-dim (dmin, dmax, sum of codes, saturated count) — the code
    sums are integer-exact, so the oracle pins the ENTIRE quantization
    arithmetic, not a rounded summary.  Two scans, zero exchange beyond
    d-row combines; the (dmin, scale) table is the broadcast-once model."""
    from ocr_poc_ray.functions.similarity import _to_matrix

    ds = ray.data.read_parquet(_emb_path(sf_dir), columns=["embedding"])

    def mm_partial(batch: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(batch["embedding"])
        return pd.DataFrame(
            {
                "dim": np.arange(1, mat.shape[1] + 1, dtype=np.int64),
                "dmin": mat.min(axis=0),
                "dmax": mat.max(axis=0),
            }
        )

    mm = ds.map_batches(mm_partial, batch_format="pandas").to_pandas()
    if mm.empty:
        return pd.DataFrame(
            {"dim": pd.Series([], dtype="int64"),
             "dmin": pd.Series([], dtype="float64"),
             "dmax": pd.Series([], dtype="float64"),
             "sum_codes": pd.Series([], dtype="int64"),
             "n_saturated": pd.Series([], dtype="int64")}
        )
    g = mm.groupby("dim")
    dmin = g["dmin"].min().sort_index().to_numpy()
    dmax = g["dmax"].max().sort_index().to_numpy()
    live = dmax > dmin  # degenerate dims are excluded on BOTH engines

    def code_partial(batch: pd.DataFrame) -> pd.DataFrame:
        mat = _to_matrix(batch["embedding"])
        # identical operation order to the SQL mirror:
        # ((x - dmin) * 255.0) / (dmax - dmin) + 0.5, floored
        with np.errstate(divide="ignore", invalid="ignore"):
            codes = np.floor((mat - dmin) * 255.0 / (dmax - dmin) + 0.5)
        sat = (codes == 0.0) | (codes == 255.0)
        return pd.DataFrame(
            {
                "dim": np.arange(1, mat.shape[1] + 1, dtype=np.int64),
                "sum_codes": codes.sum(axis=0).astype(np.int64),
                "n_saturated": sat.sum(axis=0).astype(np.int64),
            }
        )

    parts = ds.map_batches(code_partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("dim", as_index=False)[["sum_codes", "n_saturated"]].sum()
    agg = agg.sort_values("dim").reset_index(drop=True)
    out = pd.DataFrame(
        {
            "dim": agg["dim"].to_numpy(np.int64),
            "dmin": dmin,
            "dmax": dmax,
            "sum_codes": agg["sum_codes"].to_numpy(np.int64),
            "n_saturated": agg["n_saturated"].to_numpy(np.int64),
        }
    )
    return out[live].reset_index(drop=True).astype(
        {"dim": "int64", "dmin": "float64", "dmax": "float64",
         "sum_codes": "int64", "n_saturated": "int64"}
    )


VEC_INT8_QUANTIZE_SQL = """
with e as (
  select unnest(embedding::DOUBLE[]) as x,
         generate_subscripts(embedding, 1) as dim
  from embeddings
), mm as (
  select dim, min(x) as dmin, max(x) as dmax from e group by dim
)
select e.dim::BIGINT as dim, mm.dmin, mm.dmax,
       sum(floor((x - mm.dmin) * 255.0 / (mm.dmax - mm.dmin) + 0.5))::BIGINT
         as sum_codes,
       sum(case when floor((x - mm.dmin) * 255.0 / (mm.dmax - mm.dmin) + 0.5)
                     in (0.0, 255.0)
                then 1 else 0 end)::BIGINT as n_saturated
from e join mm using (dim)
where mm.dmax > mm.dmin
group by e.dim, mm.dmin, mm.dmax
"""


# ---------------------------------------------------------------------------
# Boolean retrieval over the persisted inverted index (AND of 3 terms)
# ---------------------------------------------------------------------------

SEARCH_TERMS = ("spark", "vector", "window")


def doc_boolean_search(sf_dir: str) -> pd.DataFrame:
    """Conjunctive retrieval through the persisted inverted index: build
    the hive-bucketed postings once under /tmp, then answer the AND query
    reading ONLY the probed buckets (`text_index.probed_bucket_paths` is
    the testable pruning contract).  At corpus scale the build is the
    one-off indexing job; each query touches terms/64ths of the index."""
    from ocr_poc_ray.functions.text_index import (
        boolean_search,
        build_inverted_index,
    )

    idx_dir = tempfile.mkdtemp(prefix="ocr_poc_text_index_")
    try:
        ds = ray.data.read_parquet(
            _docs_path(sf_dir), columns=["doc_id", "text"]
        )
        build_inverted_index(ds, idx_dir)
        return boolean_search(idx_dir, list(SEARCH_TERMS))
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


DOC_BOOLEAN_SEARCH_SQL = rf"""
with toks as (
  select doc_id, regexp_extract_all(lower(text), '\S+') as t from documents
)
select doc_id from toks
where list_contains(t, '{SEARCH_TERMS[0]}')
  and list_contains(t, '{SEARCH_TERMS[1]}')
  and list_contains(t, '{SEARCH_TERMS[2]}')
order by doc_id
"""


REGISTRY = {
    "doc_fim_split": (doc_fim_split, DOC_FIM_SPLIT_SQL),
    "doc_span_corruption": (doc_span_corruption, DOC_SPAN_CORRUPTION_SQL),
    "vec_int8_quantize": (vec_int8_quantize, VEC_INT8_QUANTIZE_SQL),
    "doc_boolean_search": (doc_boolean_search, DOC_BOOLEAN_SEARCH_SQL),
}
