"""Document-table queries: extraction + text-analysis + dedup with
DuckDB-mirrorable semantics.

Every Ray pipeline here reads only the columns it needs
(``read_parquet(columns=[...])``), stays in ``map_batches`` kernels,
and shuffles only narrow (id, hash) projections.  The SQL strings are
exact semantic mirrors — same regexes (both engines use RE2), same
thresholds, same rounding — so the driver's value-hash compare is
byte-stable.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ocr_poc_ray.extractors.plain import extract_plain
from ocr_poc_ray.functions.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs
from ocr_poc_ray.functions.dedup import (
    connected_components,
    connected_components_distributed,
    ngram_jaccard_pairs,
    ngram_jaccard_verify,
)
from ocr_poc_ray.functions.textstats import (
    add_fingerprints,
    add_langid,
    add_quality,
    add_token_counts,
    LANG_PRIORITY,
    LANG_STOPWORDS,
    STOPWORDS_EN,
)


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


# SQL helper: Python str.strip() equivalent (trim all ASCII whitespace;
# the corpus is ASCII so unicode-whitespace divergence cannot occur).
_WS_CHARS = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"
_STRIP = lambda col: f"trim({col}, {_WS_CHARS})"  # noqa: E731


# ---------------------------------------------------------------------------
# Plain-path extraction over documents (P2 noise filter + frozen
# whitespace join; cf. reference ocr/id_card_data_extractor.py:44).
# ---------------------------------------------------------------------------

def doc_extract_plain(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def kernel(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_pylist()
        rows = [extract_plain(t or "") for t in batch["text"].to_pylist()]
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "extracted_text": [r.extracted_text for r in rows],
                "success": [r.success for r in rows],
                "n_blocks": pd.Series([r.n_blocks for r in rows], dtype="int64"),
                "n_kept": pd.Series([r.n_kept for r in rows], dtype="int64"),
                "confidence": [round(float(r.confidence), 6) for r in rows],
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow").to_pandas()


_KEPT = (
    f"list_filter(str_split(text, chr(10)), l -> not ("
    f"{_STRIP('l')} = '' or starts_with({_STRIP('l')}, 'I<') "
    f"or contains(l, '<<<') or regexp_matches({_STRIP('l')}, '^[A-Z]{{3}}$')))"
)

DOC_EXTRACT_PLAIN_SQL = rf"""
with f as (
  select doc_id,
         {_KEPT} as kept,
         len(list_filter(str_split(text, chr(10)), l -> {_STRIP('l')} <> '')) as n_blocks
  from documents
), e as (
  select doc_id, n_blocks, len(kept) as n_kept,
         coalesce(regexp_replace(trim(array_to_string(kept, ' '), {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '')
           as extracted_text
  from f
)
select doc_id, extracted_text,
       extracted_text <> '' as success,
       n_blocks,
       case when extracted_text <> '' then n_kept else 0 end as n_kept,
       case when extracted_text = '' then 0.0
            when n_blocks = 0 then 1.0
            else round(n_kept / n_blocks, 6) end as confidence
from e
"""


def doc_extract_json(sf_dir: str) -> pd.DataFrame:
    """The JSON tool-envelope program (extractors/json_tool.py) under
    the ORACLE gate: each document wrapped as a deterministic tool
    result ({"id", "content", "meta"}) and extracted — json.dumps ∘
    json.loads round-trips exactly, so the extraction is the frozen
    whitespace normalization of the text when it clears the
    MIN_CONTENT_CHARS block rule, else a failure envelope.  Row-local,
    zero shuffle."""
    import json as _json

    from ocr_poc_ray.extractors.json_tool import extract_json

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def kernel(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_pylist()
        rows = [
            extract_json(_json.dumps(
                {"id": "x1", "content": t or "", "meta": {"node": "w1"}}
            ))
            for t in batch["text"].to_pylist()
        ]
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "extracted_text": [r.extracted_text for r in rows],
                "success": [r.success for r in rows],
                "n_blocks": pd.Series([r.n_blocks for r in rows], dtype="int64"),
                "n_kept": pd.Series([r.n_kept for r in rows], dtype="int64"),
                "confidence": [round(float(r.confidence), 6) for r in rows],
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow").to_pandas()


# mirrors extractors/json_tool.py over the deterministic 3-string-leaf
# envelope: content survives iff its normalized form has >= 24 chars
# (the "id"/"node" noise leaves never do).
_JSON_NORM = _STRIP(r"regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')")

DOC_EXTRACT_JSON_SQL = rf"""
with n as (
  select doc_id,
         {_JSON_NORM} as norm
  from documents
)
select doc_id,
       case when length(norm) >= 24 then norm else '' end as extracted_text,
       length(norm) >= 24 as success,
       3::BIGINT as n_blocks,
       case when length(norm) >= 24 then 1 else 0 end::BIGINT as n_kept,
       case when length(norm) >= 24 then round(1.0 / 3, 6) else 0.0 end
         as confidence
from n
"""


# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

def doc_token_counts(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = add_token_counts(ds).to_pandas()
    out = out[["doc_id", "n_chars_computed", "n_ws_tokens", "n_bpe_tokens"]]
    return out.astype(
        {"doc_id": "int64", "n_chars_computed": "int64", "n_ws_tokens": "int64", "n_bpe_tokens": "int64"}
    )


DOC_TOKEN_COUNTS_SQL = rf"""
select doc_id,
       length(text) as n_chars_computed,
       case when {_STRIP('text')} = '' then 0
            else len(regexp_extract_all(text, '\S+')) end as n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) as n_bpe_tokens
from documents
"""


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

def doc_quality(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = add_quality(ds).to_pandas()
    out = out[["doc_id", "punct_ratio", "stopword_ratio", "is_quality"]]
    return out.astype({"doc_id": "int64", "punct_ratio": "float64", "stopword_ratio": "float64"})


_STOP_EN_PATTERN = r"\b(" + "|".join(STOPWORDS_EN) + r")\b"

DOC_QUALITY_SQL = rf"""
with m as (
  select doc_id,
         length(text)::DOUBLE as n_chars,
         len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE as n_punct,
         case when {_STRIP('text')} = '' then 0
              else len(regexp_extract_all(text, '\S+')) end as ws_tokens,
         len(regexp_extract_all(lower(text), '{_STOP_EN_PATTERN}'))::DOUBLE as n_stop
  from documents
)
select doc_id,
       round(case when n_chars > 0 then n_punct / n_chars else 0.0 end, 6) as punct_ratio,
       round(case when ws_tokens > 0 then n_stop / ws_tokens else 0.0 end, 6) as stopword_ratio,
       (n_chars >= 50 and (case when n_chars > 0 then n_punct / n_chars else 0.0 end) <= 0.20
        and ws_tokens >= 10) as is_quality
from m
"""


# ---------------------------------------------------------------------------
# Language ID (stopword-hit argmax with fixed priority tie-break)
# ---------------------------------------------------------------------------

def doc_langid(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = add_langid(ds).to_pandas()
    cols = ["doc_id", "lang_pred"] + [f"stop_hits_{lang}" for lang in LANG_PRIORITY]
    out = out[cols]
    return out.astype({"doc_id": "int64", **{f"stop_hits_{l}": "int64" for l in LANG_PRIORITY}})


def _lang_hits_sql(lang: str) -> str:
    pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))"


DOC_LANGID_SQL = f"""
with m as (
  select doc_id,
         {_lang_hits_sql('en')} as stop_hits_en,
         {_lang_hits_sql('fr')} as stop_hits_fr,
         {_lang_hits_sql('de')} as stop_hits_de,
         {_lang_hits_sql('es')} as stop_hits_es
  from documents
)
select doc_id,
       case when stop_hits_en + stop_hits_fr + stop_hits_de + stop_hits_es = 0 then 'und'
            when stop_hits_en >= stop_hits_fr and stop_hits_en >= stop_hits_de
                 and stop_hits_en >= stop_hits_es then 'en'
            when stop_hits_fr >= stop_hits_de and stop_hits_fr >= stop_hits_es then 'fr'
            when stop_hits_de >= stop_hits_es then 'de'
            else 'es' end as lang_pred,
       stop_hits_en, stop_hits_fr, stop_hits_de, stop_hits_es
from m
"""


# ---------------------------------------------------------------------------
# Fingerprints + exact dedup
# ---------------------------------------------------------------------------

def doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = add_fingerprints(ds).to_pandas()
    return out[["doc_id", "md5_fp"]].astype({"doc_id": "int64"})


DOC_FINGERPRINT_SQL = "select doc_id, md5(text) as md5_fp from documents"


def doc_langid_confusion(sf_dir: str) -> pd.DataFrame:
    """Language-ID evaluation matrix: labeled lang × predicted lang
    with counts — the classifier-quality audit every labeled corpus
    gets before the predictor is trusted on unlabeled data.  Per-batch
    (label, pred) partial counts (≤ |langs|² rows per batch), one tiny
    combine; row-local prediction, zero exchange beyond the partials."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text", "lang"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["lang", "lang_pred"], as_index=False).agg(
            n=("doc_id", "size")
        )

    parts = add_langid(ds).map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype=object),
             "lang_pred": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(["lang", "lang_pred"], as_index=False)["n"].sum()
    return (
        out.sort_values(["lang", "lang_pred"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"n": "int64"})
    )


DOC_LANGID_CONFUSION_SQL = f"""
with m as (
  select doc_id, lang,
         {_lang_hits_sql('en')} as stop_hits_en,
         {_lang_hits_sql('fr')} as stop_hits_fr,
         {_lang_hits_sql('de')} as stop_hits_de,
         {_lang_hits_sql('es')} as stop_hits_es
  from documents
), p as (
  select lang,
         case when stop_hits_en + stop_hits_fr + stop_hits_de + stop_hits_es = 0 then 'und'
              when stop_hits_en >= stop_hits_fr and stop_hits_en >= stop_hits_de
                   and stop_hits_en >= stop_hits_es then 'en'
              when stop_hits_fr >= stop_hits_de and stop_hits_fr >= stop_hits_es then 'fr'
              when stop_hits_de >= stop_hits_es then 'de'
              else 'es' end as lang_pred
  from m
)
select lang, lang_pred, count(*)::BIGINT as n
from p group by lang, lang_pred
"""


def doc_exact_dedup(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()
    return out[["content_hash", "doc_id"]].astype({"doc_id": "int64"})


DOC_EXACT_DEDUP_SQL = (
    "select md5(text) as content_hash, min(doc_id) as doc_id from documents group by md5(text)"
)


# ---------------------------------------------------------------------------
# Near-dup families (non-SQL-expressible: rows-only checks)
# ---------------------------------------------------------------------------

def doc_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    out = out[["doc_a", "doc_b", "est_jaccard"]]
    out["est_jaccard"] = out["est_jaccard"].round(4)
    return out.astype({"doc_a": "int64", "doc_b": "int64"})


def doc_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = simhash_pairs(ds, max_hamming=3).to_pandas()
    return out[["doc_a", "doc_b", "hamming"]].astype(
        {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
    )


JACCARD_THRESHOLD = 0.5
JACCARD_MAX_DOC_ID = 500  # absolute id range (not a mod filter — that
# would break up near-dup pairs): the whole corpus at sf0.01, and a
# bounded subset at larger sf so the O(n²) oracle cross-join stays
# tractable at every scale the checker runs


def _docs_jaccard_subset(sf_dir: str) -> "ray.data.Dataset":
    """Column-pruned + PREDICATE-PUSHED read of the oracle-tractable
    doc subset: the ``doc_id < JACCARD_MAX_DOC_ID`` cut rides into
    ``read_parquet(filter=...)`` so parquet row-group statistics prune
    at the READ — at 100 TB the subset pipelines touch only matching
    row groups instead of scanning the corpus and masking afterwards
    (was a post-read ``map_batches`` mask at 8 call sites)."""
    import pyarrow.compute as pc

    return ray.data.read_parquet(
        _docs_path(sf_dir),
        columns=["doc_id", "text"],
        filter=(pc.field("doc_id") < JACCARD_MAX_DOC_ID),
    )


def doc_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """EXACT all-pairs n-gram Jaccard join (blocked pair-grid) over a
    deterministic doc subset — the oracle-verified exact counterpart of
    the MinHash candidate path (same shingle semantics)."""
    ds = _docs_jaccard_subset(sf_dir)
    out = ngram_jaccard_pairs(ds, threshold=JACCARD_THRESHOLD, chunk_rows=256).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    return out.astype({"id_a": "int64", "id_b": "int64", "jaccard": "float64"})


# Same shingles relationally: tokens = \S+ runs of lower(text) (mirrors
# Python .split()), word 3-grams (docs shorter than 3 tokens collapse to
# one whole-doc shingle), distinct; jaccard over list_intersect/union.
DOC_JACCARD_PAIRS_SQL = rf"""
with t as (
  select doc_id, toks,
         case when len(toks) = 0 then []::VARCHAR[]
              when len(toks) < 3 then [array_to_string(toks, ' ')]
              else list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  for i in generate_series(1, len(toks) - 2)]) end as sh
  from (
    select doc_id, regexp_extract_all(lower(text), '\S+') as toks
    from documents where doc_id < {JACCARD_MAX_DOC_ID}
  )
)
select a.doc_id as id_a, b.doc_id as id_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(a.sh || b.sh)), 6) as jaccard
from t a join t b on a.doc_id < b.doc_id
where len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(a.sh || b.sh)) >= {JACCARD_THRESHOLD}
"""


def doc_jaccard_pairs_prefix(sf_dir: str) -> pd.DataFrame:
    """Identical result to doc_jaccard_pairs, produced by the PPJoin-
    style prefix-filtered candidate path instead of the quadratic
    pair-grid — near-linear when near-duplicates are sparse, which is
    the 100-TB regime.  Shares the same DuckDB oracle."""
    from ocr_poc_ray.functions.dedup import ngram_jaccard_pairs_prefix

    ds = _docs_jaccard_subset(sf_dir)
    out = ngram_jaccard_pairs_prefix(ds, threshold=JACCARD_THRESHOLD).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    return out.astype({"id_a": "int64", "id_b": "int64", "jaccard": "float64"})


def doc_near_dup_components(sf_dir: str) -> pd.DataFrame:
    """MinHash candidates → exact Jaccard verify ≥0.5 → connected
    components.  The final step uses the in-memory union-find (the
    verified pair set is the dedup OUTPUT — tiny here); when the edge
    list outgrows one machine, swap in
    ``functions.dedup.connected_components_distributed`` (bucketed
    min-label propagation, tested equal on random graphs)."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    cand = minhash_lsh_pairs(ds, threshold=0.5)
    verified = ngram_jaccard_verify(cand, ds)
    verified = verified.map_batches(
        lambda b: b[b["jaccard"] >= 0.5], batch_format="pandas"
    )
    comp = connected_components(verified).to_pandas()
    if len(comp) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})
    return comp.astype({"doc_id": "int64", "component": "int64"})


def doc_dup_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank over the near-duplicate graph: which documents are the
    HUBS of duplication (high rank = similar to many/central dups —
    the canonical-copy pick for a keep-one policy).  Pairs from the
    prefix-filtered exact Jaccard join; ranks via the size-switched
    power iteration (functions.graph.pagerank: one numpy loop while
    the OUTPUT-sized dup graph fits the driver, the bucketed
    join-dataflow above it — node state is graph-sized, never a
    broadcast).  Float summation order makes this rows-only; the two
    paths and a numpy power iteration agree within tolerance on
    random graphs."""
    from ocr_poc_ray.functions.dedup import ngram_jaccard_pairs_prefix
    from ocr_poc_ray.functions.graph import pagerank

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs_prefix(ds, threshold=0.5)
    pairs = pairs.map_batches(
        lambda b: b.rename(columns={"id_a": "doc_a", "id_b": "doc_b"}),
        batch_format="pandas",
    )
    # 4 iterations: the ranking (hub ordering) stabilizes in 2-3 rounds
    # on dup-cluster graphs; every extra round costs 2 bucketed joins
    out = pagerank(pairs, n_iters=4, num_buckets=8).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="float64")})
    return out.astype({"doc_id": "int64", "rank": "float64"})


def doc_dup_components_exact(sf_dir: str) -> pd.DataFrame:
    """Oracle-verified connected components: the exact n-gram Jaccard
    pair set (same subset/threshold as ``doc_jaccard_pairs``) fed to
    the DISTRIBUTED min-label propagation
    (``connected_components_distributed`` — bucketed co-group rounds,
    never a driver union-find), checked cell-by-cell against a DuckDB
    ``WITH RECURSIVE`` transitive closure."""
    ds = _docs_jaccard_subset(sf_dir)
    pairs = ngram_jaccard_pairs(ds, threshold=JACCARD_THRESHOLD, chunk_rows=256)
    pairs = pairs.map_batches(
        lambda b: b.rename(columns={"id_a": "doc_a", "id_b": "doc_b"})[
            ["doc_a", "doc_b"]
        ],
        batch_format="pandas",
    )
    comp = connected_components_distributed(pairs, num_buckets=8).to_pandas()
    if len(comp) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})
    return comp.astype({"doc_id": "int64", "component": "int64"})


def doc_near_dedup_corpus(sf_dir: str) -> pd.DataFrame:
    """END-TO-END near-deduplication — the operation every web-scale
    curation run actually ships: exact n-gram Jaccard pairs (PPJoin
    prefix path, the near-linear scale route) → distributed connected
    components → keep ONE representative per cluster (min doc_id, the
    closure's own component label) plus all singletons.  Returns the
    kept corpus as (doc_id, cluster_size, was_deduped).

    Scale shape: losers leave via ``membership_flag`` (broadcast ↔
    bloom+verify size switch — the corpus is never collected); cluster
    sizes are per-batch partials combined on the driver (dup-CLUSTER-
    count-sized, i.e. dedup-output-sized — swap to the hash-bucket
    combine if clusters ever outnumber driver memory)."""
    from ocr_poc_ray.functions.dedup import (
        connected_components_distributed,
        membership_flag,
        ngram_jaccard_pairs_prefix,
    )
    import ray as _ray

    ds = _docs_jaccard_subset(sf_dir)
    pairs = ngram_jaccard_pairs_prefix(ds, threshold=JACCARD_THRESHOLD)
    pairs = pairs.map_batches(
        lambda b: b.rename(columns={"id_a": "doc_a", "id_b": "doc_b"})[
            ["doc_a", "doc_b"]
        ],
        batch_format="pandas",
    )
    comp = connected_components_distributed(pairs, num_buckets=8).materialize()

    # cluster sizes: per-batch partial counts -> one driver combine
    # (bounded by the number of distinct clusters, not docs)
    parts = comp.map_batches(
        lambda b: b.groupby("component", as_index=False).size(),
        batch_format="pandas",
    ).to_pandas()
    if len(parts):
        sizes = parts.groupby("component")["size"].sum()
        comp_ids = np.sort(sizes.index.to_numpy(np.int64))
        comp_n = sizes.reindex(comp_ids).to_numpy(np.int64)
    else:
        comp_ids = np.array([], dtype=np.int64)
        comp_n = np.array([], dtype=np.int64)
    sizes_ref = _ray.put((comp_ids, comp_n))

    losers = comp.map_batches(
        lambda b: b[b["doc_id"] != b["component"]][["doc_id"]],
        batch_format="pandas",
    )
    flagged = membership_flag(
        ds.select_columns(["doc_id"]), "doc_id", losers, "doc_id"
    )

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        ids_s, n_s = _ray.get(sizes_ref)
        k = b[~b["_in_set"]]
        ids = k["doc_id"].to_numpy(np.int64)
        pos = np.searchsorted(ids_s, ids)
        hit = (pos < len(ids_s)) & (ids_s[np.minimum(pos, max(len(ids_s) - 1, 0))] == ids) if len(ids_s) else np.zeros(len(ids), dtype=bool)
        csize = np.ones(len(ids), dtype=np.int64)
        csize[hit] = n_s[pos[hit]]
        return pd.DataFrame(
            {"doc_id": ids, "cluster_size": csize, "was_deduped": csize > 1}
        )

    out = flagged.map_batches(keep, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "cluster_size": pd.Series([], dtype="int64"),
             "was_deduped": pd.Series([], dtype="bool")}
        )
    return out.astype(
        {"doc_id": "int64", "cluster_size": "int64", "was_deduped": "bool"}
    )


# Transitive closure via WITH RECURSIVE (UNION dedups, so the closure
# is bounded per component); component = min reachable id.
DOC_DUP_COMPONENTS_SQL = f"""
with recursive
p as ({DOC_JACCARD_PAIRS_SQL}),
edges as (select id_a as a, id_b as b from p
          union all
          select id_b as a, id_a as b from p),
reach(node, r) as (
  select a, b from edges
  union
  select reach.node, e.b from reach join edges e on e.a = reach.r
)
select node as doc_id, least(node, min(r))::BIGINT as component
from reach group by node
"""


def doc_dup_triangles(sf_dir: str) -> pd.DataFrame:
    """Per-doc triangle membership over the exact near-dup graph — the
    transitivity audit: clique-like clusters (high triangle counts) are
    safe to collapse to one representative; chain-like components
    (members with 0 triangles) link distinct documents through weak
    middle nodes and deserve a higher verify threshold."""
    from ocr_poc_ray.functions.graph import triangle_counts

    ds = _docs_jaccard_subset(sf_dir)
    pairs = ngram_jaccard_pairs(ds, threshold=JACCARD_THRESHOLD, chunk_rows=256)
    pairs = pairs.map_batches(
        lambda b: b.rename(columns={"id_a": "doc_a", "id_b": "doc_b"})[
            ["doc_a", "doc_b"]
        ],
        batch_format="pandas",
    )
    out = triangle_counts(pairs).to_pandas()
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_triangles": pd.Series([], dtype="int64")})
    return out.astype({"doc_id": "int64", "n_triangles": "int64"})


DOC_DUP_TRIANGLES_SQL = f"""
with p as ({DOC_JACCARD_PAIRS_SQL}),
e as (select id_a as a, id_b as b from p),
tri as (
  select e1.a as x, e1.b as y, e2.b as z
  from e e1 join e e2 on e2.a = e1.b
  join e e3 on e3.a = e1.a and e3.b = e2.b
),
m as (
  select x as doc_id from tri
  union all select y from tri
  union all select z from tri
)
select doc_id, count(*)::BIGINT as n_triangles from m group by doc_id
"""


# Same closure; keep = singleton (no pair row) OR cluster representative
# (node == component, the minimum id — identical pick on both engines).
DOC_NEAR_DEDUP_CORPUS_SQL = f"""
with recursive
p as ({DOC_JACCARD_PAIRS_SQL}),
edges as (select id_a as a, id_b as b from p
          union all
          select id_b as a, id_a as b from p),
reach(node, r) as (
  select a, b from edges
  union
  select reach.node, e.b from reach join edges e on e.a = reach.r
),
comp as (
  select node as doc_id, least(node, min(r)) as component
  from reach group by node
),
sz as (select component, count(*) as n from comp group by component),
kept as (
  select d.doc_id, c.component
  from (select doc_id from documents where doc_id < {JACCARD_MAX_DOC_ID}) d
  left join comp c using (doc_id)
  where c.doc_id is null or c.doc_id = c.component
)
select k.doc_id, coalesce(sz.n, 1)::BIGINT as cluster_size,
       coalesce(sz.n, 1) > 1 as was_deduped
from kept k left join sz on k.component = sz.component
"""


DECON_SOURCE_MOD = 50  # every 50th doc seeds the blocklist (keeps the
# oracle's shingle join tractable at every checked sf)
DECON_GRAM_TOKENS = 8


def _window_hashes(th: np.ndarray, n: int) -> np.ndarray:
    """Distinct uint64 hashes of every token-aligned n-token window of
    one doc (same positional polynomial as the dedup shinglers); empty
    for docs shorter than n tokens."""
    from ocr_poc_ray.functions.dedup import _SHINGLE_MULT

    m = len(th)
    if m < n:
        return np.array([], dtype=np.uint64)
    k = m - n + 1
    acc = np.zeros(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(n):
            acc = acc * _SHINGLE_MULT + th[i : i + k]
    return np.unique(acc)


def doc_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: count, per document, how many
    blocklist n-grams occur as token-aligned 8-token windows of its
    text (the leading shingle of every ``DECON_SOURCE_MOD``-th doc
    stands in for an eval suite's contamination grams).

    Scale shape: grams are never compared as strings — both sides hash
    8-token windows with the dedup shinglers' positional polynomial
    (one vectorized siphash pass per batch + a rolling combine), the
    distinct gram hashes broadcast once as a SORTED numpy array
    (zero-copy ``ray.get`` per worker), and each doc's window set
    membership-tests via one ``np.searchsorted`` — cost per doc is
    O(tokens + windows·log bl), independent of blocklist size, where
    the old per-gram substring scan was O(blocklist) passes per
    batch."""
    from ocr_poc_ray.functions.dedup import _batch_token_hashes

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def seed_grams(batch: pd.DataFrame) -> pd.DataFrame:
        sel = batch[batch["doc_id"] % DECON_SOURCE_MOD == 0]
        th, off = _batch_token_hashes(sel["text"])
        out = []
        for i in range(len(sel)):
            toks = th[off[i] : off[i + 1]]
            lead = _window_hashes(toks[:DECON_GRAM_TOKENS], DECON_GRAM_TOKENS)
            if len(lead):
                out.append(lead[0])
        return pd.DataFrame({"gh": pd.Series(out, dtype="uint64")})

    bl = np.unique(
        ds.map_batches(seed_grams, batch_format="pandas")
        .to_pandas()["gh"]
        .to_numpy(dtype=np.uint64)
    )
    bl_ref = ray.put(bl)  # sorted distinct gram hashes — the small side

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        blist = ray.get(bl_ref)  # zero-copy plasma read, cached per worker
        th, off = _batch_token_hashes(batch["text"])
        hits = np.zeros(len(batch), dtype=np.int64)
        for i in range(len(batch)):
            wh = _window_hashes(th[off[i] : off[i + 1]], DECON_GRAM_TOKENS)
            if len(wh) and len(blist):
                pos = np.searchsorted(blist, wh)
                pos[pos == len(blist)] = len(blist) - 1
                hits[i] = int((blist[pos] == wh).sum())
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_hits": hits,
                "contaminated": hits > 0,
            }
        )

    out = ds.map_batches(flag, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "n_hits": "int64", "contaminated": "bool"})


DOC_DECONTAMINATE_SQL = rf"""
with toks as (
  select doc_id, regexp_extract_all(lower(text), '\S+') as t from documents
),
bl as (
  select distinct array_to_string(t[1:{DECON_GRAM_TOKENS}], ' ') as gram
  from toks where doc_id % {DECON_SOURCE_MOD} = 0
    and len(t) >= {DECON_GRAM_TOKENS}
),
sh as (
  select doc_id, array_to_string(t[i:i+{DECON_GRAM_TOKENS - 1}], ' ') as gram
  from toks
  cross join unnest(generate_series(1, len(t) - {DECON_GRAM_TOKENS - 1}))
    as u(i)
),
hits as (
  select s.doc_id, count(distinct s.gram)::BIGINT as n_hits
  from (select distinct doc_id, gram from sh) s
  join bl using (gram)
  group by s.doc_id
)
select d.doc_id, coalesce(h.n_hits, 0)::BIGINT as n_hits,
       coalesce(h.n_hits, 0) > 0 as contaminated
from documents d left join hits h using (doc_id)
"""


SAMPLE_PER_LANG = 5


def doc_sample_per_lang(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sample: first `SAMPLE_PER_LANG` doc_ids
    per language.  Per-batch local heads (the combiner) shrink the
    candidate set to ≤ n·langs per batch before one tiny merge."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "lang"])

    def local_heads(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values("doc_id")
            .groupby("lang", as_index=False, sort=False)
            .head(SAMPLE_PER_LANG)
        )

    cands = ds.map_batches(local_heads, batch_format="pandas").to_pandas()
    out = (
        cands.sort_values("doc_id")
        .groupby("lang", as_index=False, sort=False)
        .head(SAMPLE_PER_LANG)
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    return out[["lang", "doc_id"]].astype({"doc_id": "int64"})


DOC_SAMPLE_PER_LANG_SQL = f"""
select lang, doc_id from documents
qualify row_number() over (partition by lang order by doc_id) <= {SAMPLE_PER_LANG}
"""


def doc_lang_quality_stats(sf_dir: str) -> pd.DataFrame:
    """Composite: token counting + quality scoring chained, then a
    per-language rollup (partial agg per batch, tiny combine) — the
    'corpus report' a training-data pipeline emits."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text", "lang"])
    ds = add_token_counts(ds)
    ds = add_quality(ds)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("lang", as_index=False).agg(
            n_docs=("doc_id", "size"),
            n_quality=("is_quality", "sum"),
            sum_ws_tokens=("n_ws_tokens", "sum"),
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        n = int(group["n_docs"].sum())
        return pd.DataFrame(
            {
                "lang": [group["lang"].iloc[0]],
                "n_docs": [n],
                "n_quality": [int(group["n_quality"].sum())],
                "avg_ws_tokens": [round(group["sum_ws_tokens"].sum() / n, 6)],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"n_docs": "int64", "n_quality": "int64"})


DOC_LANG_QUALITY_STATS_SQL = rf"""
with m as (
  select doc_id, lang,
         length(text)::DOUBLE as n_chars,
         len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE as n_punct,
         case when {_STRIP('text')} = '' then 0
              else len(regexp_extract_all(text, '\S+')) end as ws_tokens
  from documents
)
select lang, count(*) as n_docs,
       sum(case when n_chars >= 50
                 and (case when n_chars > 0 then n_punct / n_chars else 0.0 end) <= 0.20
                 and ws_tokens >= 10 then 1 else 0 end)::BIGINT as n_quality,
       round(sum(ws_tokens) / count(*), 6) as avg_ws_tokens
from m
group by lang
"""


CURATION_SAMPLE_PER_LANG = 5


def doc_curation_pipeline(sf_dir: str) -> pd.DataFrame:
    """End-to-end training-data curation, fully oracle-verified:
    quality scoring → language ID → quality filter → exact dedup
    (keep min doc per identical text) → deterministic stratified
    sample per language.

    Scale shape: annotation is chained row-local map_batches; dedup
    LOSERS (duplicate rows that are not the min-id winner — bounded by
    the true duplicate count) are found with the bounded-bucket
    discovery and broadcast as the small side; the sample uses the
    local-heads combiner.  No corpus-sized driver state at any step."""
    import ray as _ray

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    annotated = add_langid(add_quality(ds)).map_batches(
        lambda b: b.loc[b["is_quality"], ["doc_id", "text", "lang_pred"]],
        batch_format="pandas",
    ).materialize()  # read by the hash pass AND the survivor filter

    import hashlib as _hl

    from ocr_poc_ray.functions.dedup import _scaled_buckets

    _B = _scaled_buckets(annotated)

    def hash_ids(batch: pd.DataFrame) -> pd.DataFrame:
        h = [_hl.md5(t.encode("utf-8", "ignore")).hexdigest() for t in batch["text"]]
        g = pd.DataFrame({"doc_id": batch["doc_id"], "h": h})
        g["_hb"] = (pd.util.hash_array(g["h"].to_numpy(dtype=object)) % _B).astype("int64")
        return g

    hashed = annotated.map_batches(hash_ids, batch_format="pandas").materialize()

    def losers_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # all rows of each duplicated hash except the min-id winner
        counts = group.groupby("h")["doc_id"].transform("size")
        dups = group[counts > 1]
        winners = dups.groupby("h")["doc_id"].transform("min")
        return dups.loc[dups["doc_id"] != winners, ["doc_id"]]

    losers_ds = (
        hashed.groupby("_hb").map_groups(losers_in_bucket, batch_format="pandas")
        .materialize()
    )

    def local_heads(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values("doc_id")
            .groupby("lang_pred", as_index=False, sort=False)
            .head(CURATION_SAMPLE_PER_LANG)
        )

    # loser membership: broadcast when small, bloom semi-join at
    # web-crawl duplicate volume (functions/dedup.py::membership_flag)
    from ocr_poc_ray.functions.dedup import membership_flag

    flagged = membership_flag(annotated, "doc_id", losers_ds, "doc_id")
    cands = (
        flagged.map_batches(
            lambda b: b.loc[~b["_in_set"], ["lang_pred", "doc_id"]],
            batch_format="pandas",
        )
        .map_batches(local_heads, batch_format="pandas")
        .to_pandas()
    )
    out = (
        cands.sort_values("doc_id")
        .groupby("lang_pred", as_index=False, sort=False)
        .head(CURATION_SAMPLE_PER_LANG)
        .sort_values(["lang_pred", "doc_id"])
        .reset_index(drop=True)
    )
    return out[["lang_pred", "doc_id"]].astype({"doc_id": "int64"})


DOC_CURATION_SQL = rf"""
with m as (
  select doc_id, text,
         length(text)::DOUBLE as n_chars,
         len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE as n_punct,
         case when {_STRIP('text')} = '' then 0
              else len(regexp_extract_all(text, '\S+')) end as ws_tokens,
         {{hits_en}} as he, {{hits_fr}} as hf, {{hits_de}} as hd, {{hits_es}} as hs
  from documents
),
q as (
  select doc_id, text,
         case when he + hf + hd + hs = 0 then 'und'
              when he >= hf and he >= hd and he >= hs then 'en'
              when hf >= hd and hf >= hs then 'fr'
              when hd >= hs then 'de'
              else 'es' end as lang_pred
  from m
  where n_chars >= 50
    and (case when n_chars > 0 then n_punct / n_chars else 0.0 end) <= 0.20
    and ws_tokens >= 10
),
w as (select md5(text) as h, min(doc_id) as win from q group by md5(text))
select lang_pred, doc_id from q
join w on md5(q.text) = w.h and q.doc_id = w.win
qualify row_number() over (partition by lang_pred order by doc_id)
        <= {CURATION_SAMPLE_PER_LANG}
"""

DOC_CURATION_SQL = DOC_CURATION_SQL.format(
    hits_en=_lang_hits_sql("en"), hits_fr=_lang_hits_sql("fr"),
    hits_de=_lang_hits_sql("de"), hits_es=_lang_hits_sql("es"),
)


HASH_SAMPLE_PREFIX = "1a"  # md5 hex prefix bound → ~10.2% of rows


def doc_hash_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic hash-based sampling — the repeatable-corpus-subset
    op of a training pipeline: a row is in the sample iff
    md5(str(doc_id)) < '1a', so the SAME subset falls out on any engine,
    any run, any partitioning (unlike seeded RNG sampling, which is
    execution-order-dependent).  md5 (not siphash) because both engines
    can compute it identically."""
    import hashlib as _hl

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        keep = [
            _hl.md5(str(i).encode()).hexdigest() < HASH_SAMPLE_PREFIX
            for i in batch["doc_id"]
        ]
        return batch.loc[keep, ["doc_id"]]

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    if out.empty:
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    return out.astype({"doc_id": "int64"})


DOC_HASH_SAMPLE_SQL = f"""
select doc_id from documents
where md5(cast(doc_id as varchar)) < '{HASH_SAMPLE_PREFIX}'
"""


# Per-language keep rates as md5 hex-prefix bounds (hex 'cc'/256 ≈ 80%
# …)— the deterministic mixture weights of a training-data blend.
MIXTURE_RATES = {"en": "cc", "fr": "99", "de": "66", "es": "33"}
MIXTURE_DEFAULT_RATE = "1a"  # any other language ≈ 10%


MIXTURE_TOTAL_N = 120  # exact total sample size across all languages


def doc_mixture_allocate(sf_dir: str) -> pd.DataFrame:
    """Exact-total mixture construction: sample EXACTLY N documents,
    allocated across languages proportionally to their counts by the
    largest-remainder (Hamilton) apportionment — the "build a training
    mix of exactly N docs" primitive where per-stratum rates or fixed
    per-stratum k cannot hit an exact global budget.  All allocation
    arithmetic is integer (base = N·n // tot, remainders ranked by
    N·n % tot) so both engines agree bit-for-bit; within a stratum the
    deterministic md5 priority picks the members (partition-invariant).
    Shape: a languages-sized count combine → driver-side apportionment
    (dimension-sized) → per-batch local heads per lang → tiny merge."""
    import hashlib as _hl

    N = MIXTURE_TOTAL_N
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "lang"])

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("lang", as_index=False).size()

    counts = (
        ds.map_batches(count_partial, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "lang": pd.Series([], dtype="object")}
    )
    if counts.empty:
        return empty
    counts = counts.groupby("lang", as_index=False)["size"].sum().rename(
        columns={"size": "n"}
    )
    tot = int(counts["n"].sum())
    n_arr = counts["n"].to_numpy(np.int64)
    base = (N * n_arr) // tot
    rem = (N * n_arr) % tot
    extra = N - int(base.sum())
    # largest remainders get +1 (ties broken by lang, ascending)
    order = np.lexsort((counts["lang"].to_numpy(), -rem))
    alloc = base.copy()
    alloc[order[:extra]] += 1
    alloc_map = dict(zip(counts["lang"], alloc.astype(int)))
    max_alloc = int(alloc.max()) if len(alloc) else 0
    if max_alloc == 0:
        return empty

    def local_heads(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            _pri=[
                _hl.md5(str(d).encode()).hexdigest() for d in b["doc_id"]
            ]
        )
        return (
            b.sort_values(["_pri", "doc_id"])
            .groupby("lang", as_index=False, sort=False)
            .head(max_alloc)
        )

    cands = ds.map_batches(local_heads, batch_format="pandas").to_pandas()
    cands = cands.sort_values(["_pri", "doc_id"]).reset_index(drop=True)
    keep = []
    for lang, grp in cands.groupby("lang", sort=False):
        keep.append(grp.head(alloc_map.get(lang, 0)))
    out = pd.concat(keep, ignore_index=True)[["doc_id", "lang"]]
    return (
        out.sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64"})
    )


DOC_MIXTURE_ALLOCATE_SQL = f"""
with c as (
  select lang, count(*) as n from documents group by lang
), t as (
  select sum(n) as tot from c
), a as (
  select lang, n,
         ({MIXTURE_TOTAL_N} * n) // tot as base,
         ({MIXTURE_TOTAL_N} * n) % tot as rem
  from c cross join t
), al as (
  select lang,
         base + case when row_number() over (order by rem desc, lang)
                      <= {MIXTURE_TOTAL_N} - (select sum(base) from a)
                 then 1 else 0 end as alloc
  from a
), r as (
  select doc_id, lang,
         row_number() over (
           partition by lang
           order by md5(cast(doc_id as varchar)), doc_id
         ) as rk
  from documents
)
select r.doc_id, r.lang from r join al using (lang) where r.rk <= al.alloc
"""


def doc_mixture_sample(sf_dir: str) -> pd.DataFrame:
    """Weighted dataset mixing: downsample each language stratum at its
    own deterministic hash rate (same subset on any engine / run /
    partitioning — seeded RNG sampling is execution-order-dependent).
    Row-local: the tiny rate table is a plain task-closure constant."""
    import hashlib as _hl

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "lang"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        bounds = batch["lang"].map(MIXTURE_RATES).fillna(MIXTURE_DEFAULT_RATE)
        keep = [
            _hl.md5(str(i).encode()).hexdigest() < b
            for i, b in zip(batch["doc_id"], bounds)
        ]
        return batch.loc[keep, ["lang", "doc_id"]]

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {"lang": pd.Series([], dtype="object"),
             "doc_id": pd.Series([], dtype="int64")}
        )
    return out.astype({"doc_id": "int64"})


DOC_MIXTURE_SAMPLE_SQL = f"""
select lang, doc_id from documents
where md5(cast(doc_id as varchar)) <
      case lang {' '.join(f"when '{k}' then '{v}'" for k, v in MIXTURE_RATES.items())}
           else '{MIXTURE_DEFAULT_RATE}' end
"""


def doc_temperature_sample(sf_dir: str) -> pd.DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-LLM data
    blend, α = 0.5): per-language keep rate sqrt(n_min / n_lang), i.e.
    keep probability ∝ n^(α-1) normalized so the smallest language is
    kept whole — rates DERIVED from the data (two passes), unlike
    doc_mixture_sample's fixed weights.  Membership is a deterministic
    md5 fraction, so the subset is identical on any engine / run /
    partitioning.  Both engines compute rate and fraction as IEEE
    doubles (sqrt and division are exactly rounded), so the boundary is
    bit-identical.

    Shape: pass 1 is a per-batch language-count partial + tiny combine
    (languages are few); the rate table broadcasts as a closure
    constant; pass 2 is row-local."""
    import hashlib as _hl
    import math as _math

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "lang"])

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("lang", as_index=False).size()

    counts = (
        ds.map_batches(count_partial, batch_format="pandas")
        .to_pandas()
        .groupby("lang")["size"]
        .sum()
    )
    n_min = int(counts.min())
    rates = {lang: _math.sqrt(n_min / int(n)) for lang, n in counts.items()}

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        bounds = batch["lang"].map(rates)
        keep = [
            int(_hl.md5(str(i).encode()).hexdigest()[:8], 16) / 4294967296.0 < b
            for i, b in zip(batch["doc_id"], bounds)
        ]
        return batch.loc[keep, ["lang", "doc_id"]]

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {"lang": pd.Series([], dtype="object"),
             "doc_id": pd.Series([], dtype="int64")}
        )
    return out.astype({"doc_id": "int64"})


DOC_TEMPERATURE_SAMPLE_SQL = """
with c as (
  select lang, count(*) as n from documents group by lang
), r as (
  select lang, sqrt(cast((select min(n) from c) as double) / n) as rate from c
)
select d.lang, d.doc_id
from documents d join r on d.lang = r.lang
where ('0x' || substr(md5(cast(d.doc_id as varchar)), 1, 8))::BIGINT
        / 4294967296.0 < r.rate
"""


# ---------------------------------------------------------------------------
# Global-scan training-data ops: sequence packing, deterministic global
# shuffle, token chunking.  The first two ride functions/prefix.py's
# distributed prefix sum (one sort + O(batches) offset combine).
# ---------------------------------------------------------------------------

PACK_TOKEN_BUDGET = 512  # tokens per training pack


def doc_pack_sequences(sf_dir: str) -> pd.DataFrame:
    """Greedy in-order sequence packing: docs in doc_id order fill
    512-token packs; pack_id = exclusive-cumsum(n_tokens) // budget —
    the SQL window-scan, parallelized as a distributed prefix sum."""
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    toks = add_token_counts(ds).select_columns(["doc_id", "n_ws_tokens"])
    cum = ordered_prefix_sum(
        toks, sort_cols=["doc_id"], value_col="n_ws_tokens", out_col="cum_tokens"
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        c = b["cum_tokens"].to_numpy(np.int64)
        n = b["n_ws_tokens"].to_numpy(np.int64)
        b["n_ws_tokens"] = n
        b["pack_id"] = (c - n) // PACK_TOKEN_BUDGET
        return b[["doc_id", "n_ws_tokens", "pack_id"]]

    out = cum.map_batches(finish, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "n_ws_tokens": "int64", "pack_id": "int64"})


DOC_PACK_SEQUENCES_SQL = rf"""
with t as (
  select doc_id,
         case when {_STRIP('text')} = '' then 0
              else len(regexp_extract_all(text, '\S+')) end as n_ws_tokens
  from documents
)
select doc_id, n_ws_tokens,
       ((sum(n_ws_tokens) over (order by doc_id))::BIGINT - n_ws_tokens)
         // {PACK_TOKEN_BUDGET} as pack_id
from t
"""


def doc_pack_efficiency(sf_dir: str) -> pd.DataFrame:
    """Per-pack packing audit over the greedy in-order layout: docs per
    pack, tokens whose sequence STARTS in the pack, and integer-ppm
    utilization vs the budget (straddling docs push a pack past 10⁶ —
    that is the straddle signal, not an error).  Partial per-batch sums
    (packs straddle batch edges) combine in 16 pack-hash buckets;
    output is pack-count sized."""
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    toks = add_token_counts(ds).select_columns(["doc_id", "n_ws_tokens"])
    cum = ordered_prefix_sum(
        toks, sort_cols=["doc_id"], value_col="n_ws_tokens", out_col="cum_tokens"
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b["cum_tokens"].to_numpy(np.int64)
        n = b["n_ws_tokens"].to_numpy(np.int64)
        pid = (c - n) // PACK_TOKEN_BUDGET
        g = (
            pd.DataFrame({"pack_id": pid, "n_docs": 1, "fill_tokens": n})
            .groupby("pack_id", as_index=False)
            .sum()
        )
        g["_hb"] = g["pack_id"] % 16
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("pack_id", as_index=False)[["n_docs", "fill_tokens"]].sum()
        out["util_ppm"] = (
            out["fill_tokens"] * 1_000_000 // PACK_TOKEN_BUDGET
        )
        return out

    out = (
        cum.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "pack_id" not in out.columns:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("pack_id", "n_docs", "fill_tokens", "util_ppm")}
        )
    return (
        out.sort_values("pack_id")
        .reset_index(drop=True)
        .astype({"pack_id": "int64", "n_docs": "int64",
                 "fill_tokens": "int64", "util_ppm": "int64"})
    )


DOC_PACK_EFFICIENCY_SQL = rf"""
with t as (
  select doc_id,
         case when {_STRIP('text')} = '' then 0
              else len(regexp_extract_all(text, '\S+')) end as n_ws_tokens
  from documents
), p as (
  select doc_id, n_ws_tokens,
         ((sum(n_ws_tokens) over (order by doc_id))::BIGINT - n_ws_tokens)
           // {PACK_TOKEN_BUDGET} as pack_id
  from t
)
select pack_id, count(*)::BIGINT as n_docs,
       sum(n_ws_tokens)::BIGINT as fill_tokens,
       (sum(n_ws_tokens)::BIGINT * 1000000 // {PACK_TOKEN_BUDGET})
         as util_ppm
from p group by pack_id
"""


def doc_pack_interleaved(sf_dir: str) -> pd.DataFrame:
    """The data-loader's pack layout: greedy 512-token packs over the
    LANGUAGE-INTERLEAVED order (k-th doc of every language adjacent) —
    exactly what ``pipelines.loader.iter_training_packs`` streams, so
    the oracle pins the loader's distributed interleave + prefix-scan
    pack assignment, not just the row-order variant."""
    from ocr_poc_ray.pipelines.loader import interleaved_pack_ids

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "lang", "text"])
    out = (
        interleaved_pack_ids(ds)
        .select_columns(["doc_id", "n_ws_tokens", "interleave_key", "pack_id"])
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "n_ws_tokens", "interleave_key", "pack_id")}
        )
    return out.astype(
        {"doc_id": "int64", "n_ws_tokens": "int64",
         "interleave_key": "int64", "pack_id": "int64"}
    )


DOC_PACK_INTERLEAVED_SQL = rf"""
with t as (
  select doc_id, lang,
         case when {_STRIP('text')} = '' then 0
              else len(regexp_extract_all(text, '\S+')) end as n_ws_tokens
  from documents
), w as (
  select doc_id, n_ws_tokens,
         (row_number() over (partition by lang order by doc_id) - 1)
           * (select count(distinct lang) from t)
         + (dense_rank() over (order by lang) - 1) as interleave_key
  from t
)
select doc_id, n_ws_tokens, interleave_key::BIGINT as interleave_key,
       ((sum(n_ws_tokens) over (order by interleave_key))::BIGINT - n_ws_tokens)
         // {PACK_TOKEN_BUDGET} as pack_id
from w
"""


def doc_shuffled_order(sf_dir: str) -> pd.DataFrame:
    """Deterministic global training shuffle: rank docs by
    md5(doc_id) — the same permutation on any engine, any run, any
    partitioning (seeded RNG shuffles are execution-order-dependent).
    The global row number is the prefix sum of ones over the sorted
    hash order."""
    import hashlib as _hl

    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id"])

    def add_key(b: pd.DataFrame) -> pd.DataFrame:
        b["shuffle_key"] = [
            _hl.md5(str(i).encode()).hexdigest() for i in b["doc_id"]
        ]
        return b

    keyed = ds.map_batches(add_key, batch_format="pandas")
    ranked = ordered_prefix_sum(
        keyed,
        sort_cols=["shuffle_key", "doc_id"],
        value_col=None,
        out_col="shuffle_rank",
        unique_col="doc_id",
    )
    out = ranked.map_batches(
        lambda b: b[["doc_id", "shuffle_rank"]], batch_format="pandas"
    ).to_pandas()
    return out.astype({"doc_id": "int64", "shuffle_rank": "int64"})


DOC_SHUFFLED_ORDER_SQL = """
select doc_id,
       row_number() over (order by md5(cast(doc_id as varchar)), doc_id) as shuffle_rank
from documents
"""


CHUNK_SIZE_TOKENS = 32


def doc_chunk_tokens(sf_dir: str) -> pd.DataFrame:
    """Fixed-size token chunking (training-sample prep): each doc →
    consecutive 32-token windows, vectorized flat-map (one Arrow split
    + numpy offset math + binary_join per batch)."""
    from ocr_poc_ray.functions.textstats import chunk_tokens

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = chunk_tokens(ds, chunk_size=CHUNK_SIZE_TOKENS).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "chunk_idx": pd.Series([], dtype="int64"),
                "chunk_text": pd.Series([], dtype="object"),
                "n_chunk_tokens": pd.Series([], dtype="int64"),
            }
        )
    return out.astype(
        {"doc_id": "int64", "chunk_idx": "int64", "n_chunk_tokens": "int64"}
    )


CHUNK_OVERLAP_STRIDE = 24  # 32-token windows every 24 tokens (8 overlap)


def doc_chunk_overlap(sf_dir: str) -> pd.DataFrame:
    """Overlapping sliding-window chunking — the RAG/retrieval chunker:
    32-token windows starting every 24 tokens, so consecutive chunks
    share an 8-token overlap and no boundary sentence is lost.  Same
    vectorized flat-map kernel as doc_chunk_tokens with a stride."""
    from ocr_poc_ray.functions.textstats import chunk_tokens

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = chunk_tokens(
        ds, chunk_size=CHUNK_SIZE_TOKENS, stride=CHUNK_OVERLAP_STRIDE
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "chunk_idx": pd.Series([], dtype="int64"),
                "chunk_text": pd.Series([], dtype="object"),
                "n_chunk_tokens": pd.Series([], dtype="int64"),
            }
        )
    return out.astype(
        {"doc_id": "int64", "chunk_idx": "int64", "n_chunk_tokens": "int64"}
    )


DOC_CHUNK_OVERLAP_SQL = rf"""
with t as (
  select doc_id, regexp_extract_all(text, '\S+') as toks from documents
), e as (
  select doc_id, toks,
         unnest(generate_series(0, (len(toks) + {CHUNK_OVERLAP_STRIDE} - 1)
                                   // {CHUNK_OVERLAP_STRIDE} - 1)) as chunk_idx
  from t
)
select doc_id, chunk_idx,
       array_to_string(
         toks[chunk_idx * {CHUNK_OVERLAP_STRIDE} + 1
              : chunk_idx * {CHUNK_OVERLAP_STRIDE} + {CHUNK_SIZE_TOKENS}], ' '
       ) as chunk_text,
       least({CHUNK_SIZE_TOKENS},
             len(toks) - chunk_idx * {CHUNK_OVERLAP_STRIDE})::BIGINT
         as n_chunk_tokens
from e
"""


DOC_CHUNK_TOKENS_SQL = rf"""
with t as (
  select doc_id, regexp_extract_all(text, '\S+') as toks from documents
), e as (
  select doc_id, toks,
         unnest(generate_series(0, (len(toks) + {CHUNK_SIZE_TOKENS} - 1)
                                   // {CHUNK_SIZE_TOKENS} - 1)) as chunk_idx
  from t
)
select doc_id, chunk_idx,
       array_to_string(
         toks[chunk_idx * {CHUNK_SIZE_TOKENS} + 1
              : chunk_idx * {CHUNK_SIZE_TOKENS} + {CHUNK_SIZE_TOKENS}], ' '
       ) as chunk_text,
       least({CHUNK_SIZE_TOKENS}, len(toks) - chunk_idx * {CHUNK_SIZE_TOKENS})::BIGINT
         as n_chunk_tokens
from e
"""


CHUNK_DEDUP_SIZE = 8


def doc_chunk_dedup(sf_dir: str) -> pd.DataFrame:
    """Passage-level exact dedup: duplicate 8-token windows removed
    corpus-wide (first occurrence by (doc_id, chunk_idx) survives),
    documents rebuilt from their surviving chunks."""
    from ocr_poc_ray.functions.dedup import chunk_dedup

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = chunk_dedup(ds, chunk_size=CHUNK_DEDUP_SIZE).to_pandas()
    return out.astype({"doc_id": "int64", "n_chunks": "int64", "n_removed": "int64"})


_CS = CHUNK_DEDUP_SIZE

DOC_CHUNK_DEDUP_SQL = rf"""
with t as (
  select doc_id, regexp_extract_all(text, '\S+') as toks from documents
), e as (
  select doc_id, toks,
         unnest(generate_series(0, (len(toks) + {_CS} - 1) // {_CS} - 1)) as ci
  from t
), c as (
  select doc_id, ci,
         array_to_string(toks[ci * {_CS} + 1 : ci * {_CS} + {_CS}], ' ') as ct,
         doc_id * {1 << 20} + ci as key
  from e
), w as (
  select ct, min(key) as wkey from c group by ct
), kept as (
  select c.doc_id, c.ci, c.ct from c join w on c.ct = w.ct and c.key = w.wkey
), a as (
  select doc_id, count(*) as n_chunks from c group by doc_id
), g as (
  select doc_id, string_agg(ct, ' ' order by ci) as kept_text,
         count(*) as n_kept
  from kept group by doc_id
)
select d.doc_id,
       coalesce(g.kept_text, '') as kept_text,
       coalesce(a.n_chunks, 0)::BIGINT as n_chunks,
       (coalesce(a.n_chunks, 0) - coalesce(g.n_kept, 0))::BIGINT as n_removed
from documents d
left join a on d.doc_id = a.doc_id
left join g on d.doc_id = g.doc_id
"""


# Mirrors the chunker exactly: trimmed \S+ tokens, 8-token slices,
# space-joined; cluster size = corpus-wide occurrence count of the
# chunk string.
DOC_CHUNK_DUP_HISTOGRAM_SQL = rf"""
with t as (
  select doc_id, regexp_extract_all(text, '\S+') as toks from documents
), e as (
  select doc_id, toks,
         unnest(generate_series(0, (len(toks) + {_CS} - 1) // {_CS} - 1)) as ci
  from t where len(toks) > 0
), c as (
  select array_to_string(toks[ci * {_CS} + 1 : ci * {_CS} + {_CS}], ' ') as ct
  from e
)
select cnt::BIGINT as cluster_size, count(*)::BIGINT as n_chunks
from (select ct, count(*) as cnt from c group by ct)
group by cnt order by cluster_size
"""


TOP_TOKENS_K = 10


def doc_top_tokens(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide heavy hitters: exact global top-k tokens (vocabulary
    statistics for tokenizer/filter design).  Per-batch vocabulary
    partials → hash-bucketed exact combine → k×buckets driver merge."""
    from ocr_poc_ray.functions.textstats import top_tokens

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["text"])
    return top_tokens(ds, k=TOP_TOKENS_K)


DOC_TOP_TOKENS_SQL = rf"""
with tok as (
  select unnest(regexp_extract_all(lower(text), '\S+')) as token from documents
), c as (
  select token, count(*)::BIGINT as n from tok group by token
)
select token, n from c order by n desc, token limit {TOP_TOKENS_K}
"""


HEAVY_DIVISOR = 256


def doc_heavy_tokens_mg(sf_dir: str) -> pd.DataFrame:
    """Exact corpus heavy hitters (count × 256 > total tokens) found
    the SKETCH way: a Misra-Gries candidate pass (k=1023 mergeable
    counters — ≤ k rows per block reach the driver, never the
    vocabulary) guarantees a superset of the heavy set (est ≥ true −
    n/(k+1), and even the conservative two-stage loss bound 2n/1024 is
    under the n/256 threshold), then an exact distributed recount of
    ONLY the candidates.  Oracle = the direct SQL heavy-hitter query:
    candidate pruning provably cannot lose a heavy token.  The integer
    comparison n*256 > total avoids any division-rounding divergence."""
    import pyarrow.compute as pc

    from ocr_poc_ray.functions.sketches import mg_heavy_hitters

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["text"])
    summary = mg_heavy_hitters(ds, "text", k=1023, text_tokens=True)
    cands = set(summary["token"])

    def recount(batch: pa.Table) -> pd.DataFrame:
        text = pc.utf8_trim_whitespace(pc.utf8_lower(batch["text"]))
        vc = pc.list_flatten(pc.utf8_split_whitespace(text)).value_counts()
        df = pd.DataFrame(
            {
                "token": vc.field("values").to_pandas(),
                "cnt": vc.field("counts").to_pandas().astype("int64"),
            }
        )
        df = df[df["token"] != ""]
        total = int(df["cnt"].sum())
        df = df[df["token"].isin(cands)]
        return pd.concat(
            [df, pd.DataFrame({"token": ["\x00__total__"], "cnt": [total]})],
            ignore_index=True,
        )

    parts = ds.map_batches(recount, batch_format="pyarrow").to_pandas()
    total = int(parts.loc[parts["token"] == "\x00__total__", "cnt"].sum())
    counts = (
        parts[parts["token"] != "\x00__total__"]
        .groupby("token", as_index=False)["cnt"].sum()
    )
    heavy = counts[counts["cnt"] * HEAVY_DIVISOR > total]
    out = heavy.sort_values(
        ["cnt", "token"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    return pd.DataFrame({"token": out["token"], "n": out["cnt"].astype("int64")})


DOC_HEAVY_TOKENS_MG_SQL = rf"""
with tok as (
  select unnest(regexp_extract_all(lower(text), '\S+')) as token from documents
), c as (
  select token, count(*)::BIGINT as n from tok group by token
)
select token, n from c
where n * {HEAVY_DIVISOR} > (select count(*) from tok)
order by n desc, token
"""


def doc_chunk_dup_histogram(sf_dir: str) -> pd.DataFrame:
    """Passage-duplication profile: for every cluster size c, how many
    distinct 8-token chunks occur exactly c times corpus-wide — the
    dedup-planning histogram (how much would chunk dedup remove?).
    Shape: the vectorized Arrow chunker feeds a bucketed exact
    value-count combine; nothing chunk-vocabulary-sized leaves a task."""
    from ocr_poc_ray.functions.textstats import chunk_tokens, value_freq_spectrum

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    chunks = chunk_tokens(ds, chunk_size=CHUNK_DEDUP_SIZE)
    out = value_freq_spectrum(chunks, col="chunk_text")
    return out.rename(columns={"freq": "cluster_size", "n_tokens": "n_chunks"})


def doc_token_zipf(sf_dir: str) -> pd.DataFrame:
    """Vocabulary Zipf spectrum: n_tokens per exact occurrence count —
    the count-of-counts curve a tokenizer-vocabulary design reads."""
    from ocr_poc_ray.functions.textstats import token_freq_spectrum

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["text"])
    return token_freq_spectrum(ds)


DOC_TOKEN_ZIPF_SQL = rf"""
with tok as (
  select unnest(regexp_extract_all(lower(text), '\S+')) as token from documents
), c as (
  select token, count(*) as n from tok group by token
)
select n::BIGINT as freq, count(*)::BIGINT as n_tokens
from c group by n order by freq
"""



def _flat_tokens(text_series: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat, lens, doc_idx) for a batch's texts: lowercased whitespace
    tokens concatenated across rows, per-row token counts, and the row
    index of every token.  THE tokenization shared by every LM /
    entropy / vocabulary query — one place to change if the corpus ever
    grows unicode whitespace (CLAUDE.md RE2-parity note)."""
    toks = text_series.fillna("").str.lower().str.split()
    lens = toks.str.len().to_numpy(np.int64)
    if int(lens.sum()):
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    else:
        flat = np.array([], dtype=object)
    return flat, lens, np.repeat(np.arange(len(lens)), lens)


# Corpus-adaptive stopword induction + removal (the CCNet-style
# corpus-frequency filter, applied at token granularity because this
# corpus has no line structure): a token present in ≥ STOPWORD_DF_PCT%
# of all documents is boilerplate vocabulary; strip it everywhere.
# Both engines compare df*100 >= PCT*N in exact integer arithmetic, so
# the boundary is bit-identical.
STOPWORD_DF_PCT = 78


def doc_adaptive_stopwords(sf_dir: str) -> pd.DataFrame:
    """Two passes, nothing corpus-sized on the driver: (1) per-batch
    DISTINCT (token, doc) document-frequency partials — output is the
    batch vocabulary — hash-bucketed exact combine that ALSO applies
    the df*100 >= STOPWORD_DF_PCT*N filter in-bucket, so only the tiny
    stop list (near-universal tokens) ever reaches the driver, never
    the vocabulary; (2) stop set broadcast once via ray.put as a
    sorted numpy array, vectorized np.isin removal per batch."""
    import ray as _ray

    pct = STOPWORD_DF_PCT
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    n_total = ds.count()  # parquet metadata only — no read

    n_buckets = 16

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        flat, lens, doc_idx = _flat_tokens(batch["text"])
        pairs = pd.DataFrame(
            {
                "doc": batch["doc_id"].to_numpy()[doc_idx],
                "token": flat,
            }
        ).drop_duplicates()
        out = pairs.groupby("token", as_index=False).size()
        out = out.rename(columns={"size": "df"})
        out["_hb"] = (
            pd.util.hash_array(out["token"].to_numpy(dtype=object)) % n_buckets
        ).astype("int64")
        return out

    def bucket_df(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("token", as_index=False).agg(df=("df", "sum"))
        return agg[agg["df"] * 100 >= pct * n_total]

    stop = (
        ds.map_batches(df_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_df, batch_format="pandas")
        .to_pandas()
    )
    stop_arr = (
        np.sort(stop["token"].to_numpy(dtype=object))
        if "token" in stop.columns and len(stop)
        else np.array([], dtype=object)
    )
    stop_ref = _ray.put(stop_arr)

    def strip(batch: pd.DataFrame) -> pd.DataFrame:
        sw = _ray.get(stop_ref)
        n = len(batch)
        toks = batch["text"].fillna("").str.split()
        lens = toks.str.len().to_numpy(dtype="int64")
        clean = np.full(n, "", dtype=object)
        removed = np.zeros(n, dtype="int64")
        if int(lens.sum()):
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            keep = ~np.isin(np.char.lower(flat.astype(str)), sw.astype(str))
            doc_idx = np.repeat(np.arange(n), lens)
            kept_counts = np.bincount(doc_idx[keep], minlength=n).astype("int64")
            removed = lens - kept_counts
            if keep.any():  # one vectorized join per batch, no row loop
                joined = pd.Series(flat[keep]).groupby(doc_idx[keep]).agg(" ".join)
                clean[joined.index.to_numpy()] = joined.to_numpy()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "clean_text": clean,
                "n_removed": pd.Series(removed, dtype="int64"),
            }
        )

    out = ds.map_batches(strip, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "n_removed": "int64"})


DOC_ADAPTIVE_STOPWORDS_SQL = rf"""
with t as (
  select doc_id, regexp_extract_all(text, '\S+') as toks from documents
), d as (
  select distinct doc_id, lower(unnest(toks)) as tok from t
), s as (
  select coalesce(list(tok), []) as sl
  from (
    select tok from d group by tok
    having count(*) * 100 >= {STOPWORD_DF_PCT} * (select count(*) from documents)
  )
)
select t.doc_id,
       coalesce(array_to_string(
         list_filter(toks, x -> not list_contains(sl, lower(x))), ' '
       ), '') as clean_text,
       (len(toks) - len(list_filter(toks, x -> not list_contains(sl, lower(x)))))::BIGINT
         as n_removed
from t, s
"""


def doc_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition filter signal: per-doc fraction of
    bigrams taken by the most frequent bigram + the filter verdict."""
    from ocr_poc_ray.functions.textstats import add_repetition

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = add_repetition(ds).to_pandas()
    out = out[["doc_id", "top_bigram_frac", "is_repetitive"]]
    return out.astype({"doc_id": "int64", "top_bigram_frac": "float64"})


from ocr_poc_ray.functions.textstats import REPETITION_THRESHOLD as _REP_T

DOC_REPETITION_SQL = rf"""
with t as (
  select doc_id, regexp_extract_all(lower(text), '\S+') as toks from documents
), b as (
  select doc_id, len(toks) as nt,
         unnest([toks[i] || ' ' || toks[i+1]
                 for i in generate_series(1, len(toks) - 1)]) as bg
  from t where len(toks) >= 2
), c as (
  select doc_id, nt, bg, count(*) as cnt from b group by doc_id, nt, bg
), m as (
  select doc_id, any_value(nt) as nt, max(cnt) as mx from c group by doc_id
)
select d.doc_id,
       round(coalesce(m.mx / (m.nt - 1), 0.0), 6) as top_bigram_frac,
       coalesce(m.mx / (m.nt - 1) > {_REP_T}, false) as is_repetitive
from documents d left join m on d.doc_id = m.doc_id
"""


TFIDF_TERMS = ("spark", "window", "stream")


def doc_tfidf_scores(sf_dir: str) -> pd.DataFrame:
    """TF-IDF relevance of every document to a fixed term set — the
    search-scoring pass of a retrieval pipeline.  Two passes: partial
    per-batch document-frequency counts combined once (terms are few),
    the tiny IDF vector rides into the scoring pass as a plain
    broadcast; score = Σ tf(term) · ln(N / df(term)), 0 when df = 0."""
    import math

    import ray as _ray

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def partial_df(batch: pd.DataFrame) -> pd.DataFrame:
        row = {"n_docs": len(batch)}
        for t in TFIDF_TERMS:
            row[f"df_{t}"] = int(batch["text"].str.contains(t, regex=False).sum())
        return pd.DataFrame([row])

    partials = ds.map_batches(partial_df, batch_format="pandas").to_pandas()
    n_total = int(partials["n_docs"].sum())
    idf = {
        t: (math.log(n_total / int(partials[f"df_{t}"].sum()))
            if int(partials[f"df_{t}"].sum()) else 0.0)
        for t in TFIDF_TERMS
    }
    idf_ref = _ray.put(idf)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        w = _ray.get(idf_ref)
        total = None
        for t in TFIDF_TERMS:
            tf = batch["text"].str.count(t)
            part = tf * w[t]
            total = part if total is None else total + part
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "tfidf": total.round(6)}
        )

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "tfidf": "float64"})


def _tfidf_sql() -> str:
    df_ctes = ", ".join(
        f"df_{t} as (select count(*) c from documents where contains(text, '{t}'))"
        for t in TFIDF_TERMS
    )
    n = "(select count(*) from documents)"
    terms = " + ".join(
        f"len(regexp_extract_all(text, '{t}')) * "
        f"(case when (select c from df_{t}) = 0 then 0.0 "
        f"else ln({n}::DOUBLE / (select c from df_{t})) end)"
        for t in TFIDF_TERMS
    )
    return f"with {df_ctes} select doc_id, round({terms}, 6) as tfidf from documents"


DOC_TFIDF_SQL = _tfidf_sql()


BM25_TERMS = ("merge", "window", "vector")
BM25_K = 20
_BM25_K1 = 1.2
_BM25_B = 0.75


def doc_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 retrieval against a fixed query — the text-search twin of
    ``vec_knn_cosine``: one stats pass (N, Σdl, per-term df; one tiny
    row per batch, combined on the driver), stats broadcast via
    ``ray.put``, then a scoring pass with per-batch local top-k and a
    bounded final merge (k × blocks rows ever leave a task).  Term
    counts use RE2 word boundaries in BOTH engines; the score
    expression is interpolated from the same constants so the float
    arithmetic is order-identical."""
    import math

    import pyarrow.compute as pc

    import ray as _ray

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def partial_stats(batch: pa.Table) -> pd.DataFrame:
        txt = batch["text"]
        row = {
            "n_docs": len(batch),
            "sum_dl": int(pc.sum(pc.count_substring_regex(txt, r"\S+")).as_py() or 0),
        }
        for t in BM25_TERMS:
            cnt = pc.count_substring_regex(txt, rf"\b{t}\b")
            row[f"df_{t}"] = int(
                pc.sum(pc.cast(pc.greater(cnt, 0), pa.int64())).as_py() or 0
            )
        return pd.DataFrame([row])

    parts = ds.map_batches(partial_stats, batch_format="pyarrow").to_pandas()
    n = float(parts["n_docs"].sum())
    avgdl = float(parts["sum_dl"].sum()) / n
    idf = {
        t: math.log((n - float(parts[f"df_{t}"].sum()) + 0.5)
                    / (float(parts[f"df_{t}"].sum()) + 0.5) + 1.0)
        for t in BM25_TERMS
    }
    stats_ref = _ray.put((avgdl, idf))

    def score_topk(batch: pa.Table) -> pd.DataFrame:
        avgdl_, idf_ = _ray.get(stats_ref)
        txt = batch["text"]
        dl = pc.count_substring_regex(txt, r"\S+").to_numpy().astype("float64")
        score = np.zeros(len(batch))
        for t in BM25_TERMS:
            tf = pc.count_substring_regex(txt, rf"\b{t}\b").to_numpy().astype("float64")
            score = score + idf_[t] * (
                tf * (_BM25_K1 + 1.0)
                / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl_))
            )
        keep = score > 0
        d = pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy()[keep], "score": score[keep]}
        )
        return d.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(BM25_K)

    cand = ds.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(BM25_K).reset_index(drop=True)
    cand["score"] = cand["score"].round(6)
    if len(cand) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    return cand.astype({"doc_id": "int64", "score": "float64"})


def _bm25_sql() -> str:
    tf_cols = ",\n         ".join(
        rf"len(regexp_extract_all(text, '\b{t}\b'))::DOUBLE as tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"sum((tf_{t} > 0)::INT)::DOUBLE as df_{t}" for t in BM25_TERMS
    )
    # exact mirror of the numpy expression, same constants, same op order
    terms = "\n       + ".join(
        f"ln((s.n - s.df_{t} + 0.5) / (s.df_{t} + 0.5) + 1.0)"
        f" * (d.tf_{t} * ({_BM25_K1!r} + 1.0)"
        f" / (d.tf_{t} + {_BM25_K1!r} * (1.0 - {_BM25_B!r}"
        f" + {_BM25_B!r} * d.dl / s.avgdl)))"
        for t in BM25_TERMS
    )
    return rf"""
with d as (
  select doc_id,
         len(regexp_extract_all(text, '\S+'))::DOUBLE as dl,
         {tf_cols}
  from documents
),
s as (
  select count(*)::DOUBLE as n,
         sum(dl) / count(*) as avgdl,
         {df_cols}
  from d
)
select doc_id, round(score, 6) as score
from (
  select d.doc_id, {terms} as score
  from d, s
)
where score > 0
order by score desc, doc_id
limit {BM25_K}
"""


DOC_BM25_SQL = _bm25_sql()


TOP_TFIDF_K = 3


def doc_top_tfidf_per_lang(sf_dir: str) -> pd.DataFrame:
    """Grouped top-k over a computed score: TF-IDF per doc (broadcast
    IDF), per-batch local top-k per language, one tiny merge — the
    retrieval 'best hits per shard' composite."""
    import math

    import ray as _ray

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text", "lang"])

    def partial_df(batch: pd.DataFrame) -> pd.DataFrame:
        row = {"n_docs": len(batch)}
        for t in TFIDF_TERMS:
            row[f"df_{t}"] = int(batch["text"].str.contains(t, regex=False).sum())
        return pd.DataFrame([row])

    partials = ds.map_batches(partial_df, batch_format="pandas").to_pandas()
    n_total = int(partials["n_docs"].sum())
    idf = {
        t: (math.log(n_total / int(partials[f"df_{t}"].sum()))
            if int(partials[f"df_{t}"].sum()) else 0.0)
        for t in TFIDF_TERMS
    }
    idf_ref = _ray.put(idf)

    def score_and_local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        w = _ray.get(idf_ref)
        total = None
        for t in TFIDF_TERMS:
            part = batch["text"].str.count(t) * w[t]
            total = part if total is None else total + part
        b = pd.DataFrame({"lang": batch["lang"], "doc_id": batch["doc_id"], "tfidf": total})
        return (
            b.sort_values(["tfidf", "doc_id"], ascending=[False, True], kind="mergesort")
            .groupby("lang", as_index=False, sort=False)
            .head(TOP_TFIDF_K)
        )

    cands = ds.map_batches(score_and_local_topk, batch_format="pandas").to_pandas()
    out = (
        cands.sort_values(["tfidf", "doc_id"], ascending=[False, True], kind="mergesort")
        .groupby("lang", as_index=False, sort=False)
        .head(TOP_TFIDF_K)
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    out["tfidf"] = out["tfidf"].round(6)
    return out.astype({"doc_id": "int64", "tfidf": "float64"})


def _top_tfidf_sql() -> str:
    df_ctes = ", ".join(
        f"df_{t} as (select count(*) c from documents where contains(text, '{t}'))"
        for t in TFIDF_TERMS
    )
    n = "(select count(*) from documents)"
    terms = " + ".join(
        f"len(regexp_extract_all(text, '{t}')) * "
        f"(case when (select c from df_{t}) = 0 then 0.0 "
        f"else ln({n}::DOUBLE / (select c from df_{t})) end)"
        for t in TFIDF_TERMS
    )
    return (
        f"with {df_ctes}, scored as "
        f"(select lang, doc_id, {terms} as tfidf from documents) "
        f"select lang, doc_id, round(tfidf, 6) as tfidf from scored "
        f"qualify row_number() over (partition by lang order by tfidf desc, doc_id) "
        f"<= {TOP_TFIDF_K}"
    )


DOC_TOP_TFIDF_SQL = _top_tfidf_sql()


# ---------------------------------------------------------------------------
# Source-provenance operators: pivot matrix + keep-best dedup
# ---------------------------------------------------------------------------

PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


def doc_source_lang_matrix(sf_dir: str) -> pd.DataFrame:
    """Pivot / crosstab: one row per source, one count column per
    language (plus a row total).  Shape: per-batch (source, lang)
    partial counts → a grouped combine over ~|sources| groups (the
    pivot's row cardinality, small by construction — provenance
    catalogs are thousands of rows, not corpus-sized).  Languages
    outside ``PIVOT_LANGS`` count only toward ``n_total`` (both
    engines)."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["source", "lang"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["source", "lang"], as_index=False).agg(
            n=("lang", "size")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        row: dict[str, list] = {"source": [group["source"].iloc[0]]}
        for lang in PIVOT_LANGS:
            row[f"n_{lang}"] = [int(group.loc[group["lang"] == lang, "n"].sum())]
        row["n_total"] = [int(group["n"].sum())]
        return pd.DataFrame(row)

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(combine, batch_format="pandas")
    )
    cast = {f"n_{lang}": "int64" for lang in PIVOT_LANGS}
    cast["n_total"] = "int64"
    return out.to_pandas().astype(cast)


_PIVOT_COLS_SQL = ",\n       ".join(
    f"sum(case when lang = '{lang}' then 1 else 0 end)::BIGINT as n_{lang}"
    for lang in PIVOT_LANGS
)
DOC_SOURCE_LANG_MATRIX_SQL = f"""
select source,
       {_PIVOT_COLS_SQL},
       count(*)::BIGINT as n_total
from documents
group by source
"""


KEEP_BEST_BUCKETS = 32


def doc_dedup_keep_best(sf_dir: str) -> pd.DataFrame:
    """Exact dedup with a provenance policy: among identical texts keep
    the copy from the lexicographically smallest source (doc_id breaks
    ties), reporting how many copies it absorbed.

    Shape (mirrors ``functions.dedup.exact_dedup``): texts are hashed
    per batch and collapsed to one (hash, winner, count) partial row
    per distinct hash per batch; partials co-group in
    ``KEEP_BEST_BUCKETS`` hash buckets (never one group per hash)
    where a vectorized sort + first-row-per-hash picks the winner of
    winners and sums the counts."""
    import hashlib

    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text", "source"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "h": [
                    hashlib.md5(t.encode("utf-8", "ignore")).hexdigest()
                    for t in batch["text"]
                ],
                "doc_id": batch["doc_id"].to_numpy(),
                "source": batch["source"].to_numpy(),
            }
        )
        df = df.sort_values(["h", "source", "doc_id"], kind="mergesort")
        g = df.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "first"), source=("source", "first"),
            n=("doc_id", "size"),
        )
        g["bucket"] = (
            pd.util.hash_array(g["h"].to_numpy(dtype=object)) % KEEP_BEST_BUCKETS
        ).astype(np.int64)
        return g

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        t = group.sort_values(["h", "source", "doc_id"], kind="mergesort")
        w = t.groupby("h", as_index=False).agg(
            doc_id=("doc_id", "first"), source=("source", "first")
        )
        n = group.groupby("h", as_index=False).agg(n_copies=("n", "sum"))
        return w.merge(n, on="h")[["doc_id", "source", "n_copies"]]

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"doc_id": "int64", "n_copies": "int64"})


DOC_DEDUP_KEEP_BEST_SQL = """
select doc_id, source, (count(*) over (partition by text))::BIGINT as n_copies
from documents
qualify row_number() over (partition by text order by source, doc_id) = 1
"""


def doc_source_entropy(sf_dir: str) -> pd.DataFrame:
    """Language-mix diversity per source: Shannon entropy (natural
    log) of each source's language distribution plus the distinct-lang
    count — the mixture-health metric of a multi-source corpus.  Same
    shape as the pivot: (source, lang) partial counts, one vectorized
    combine per source group."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["source", "lang"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(["source", "lang"], as_index=False).agg(
            n=("lang", "size")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("lang", as_index=False).agg(n=("n", "sum"))
        tot = float(g["n"].sum())
        p = g["n"].to_numpy(dtype=np.float64) / tot
        return pd.DataFrame(
            {
                "source": [group["source"].iloc[0]],
                "n_docs": [int(tot)],
                "n_langs": [len(g)],
                "lang_entropy": [round(float(-(p * np.log(p)).sum()), 6)],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype(
        {"n_docs": "int64", "n_langs": "int64", "lang_entropy": "float64"}
    )


DOC_SOURCE_ENTROPY_SQL = """
with c as (
  select source, lang, count(*) as n from documents group by 1, 2
),
t as (select source, sum(n) as tot from c group by 1)
select c.source, max(t.tot)::BIGINT as n_docs, count(*)::BIGINT as n_langs,
       round(sum(-(c.n / t.tot) * ln(c.n / t.tot)), 6) as lang_entropy
from c join t using (source)
group by c.source
"""


COOC_TOP_K = 12


def doc_token_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Document-level co-occurrence matrix for the corpus's top tokens
    (the embedding/PMI precursor): how many documents contain BOTH
    tokens of each pair.

    Shape: pass 1 reuses the exact heavy-hitter top-k
    (``textstats.top_tokens`` — hash-bucketed vocabulary combine);
    the k winners broadcast via ``ray.put``.  Pass 2 builds one
    docs×k 0/1 presence matrix per batch and emits a single k×k
    matmul partial (``Mᵀ·M`` — co-occurrence as linear algebra, kB
    per block regardless of corpus); the driver sums O(blocks) tiny
    matrices.  Capping at top-k is the standard scale bound for
    co-occurrence (uncapped vocab² is quadratic)."""
    vocab, C, _n = _cooc_matrix(sf_dir)
    ia, ib = np.triu_indices(len(vocab), k=1)
    out = pd.DataFrame(
        {"tok_a": vocab[ia], "tok_b": vocab[ib], "n_docs": C[ia, ib]}
    )
    out = out[out["n_docs"] > 0].reset_index(drop=True)
    return out.astype({"n_docs": "int64"})


def _cooc_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray, int]:
    """(sorted top-k vocab, k×k doc-level co-occurrence count matrix,
    total doc count) — the shared two-pass backbone of
    ``doc_token_cooccurrence`` and ``doc_token_pmi``.  The matrix
    diagonal is each token's document frequency."""
    from ocr_poc_ray.functions.textstats import top_tokens

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["text"])
    top = top_tokens(ds, k=COOC_TOP_K)["token"].tolist()
    vocab = np.asarray(sorted(top), dtype=object)
    vref = ray.put(vocab)

    def presence_matmul(batch: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vref)
        b = batch.reset_index(drop=True)
        e = b["text"].str.lower().str.split().explode().dropna()
        cat = pd.Categorical(e, categories=v)
        mask = cat.codes >= 0
        M = np.zeros((len(b), len(v)), dtype=np.float64)
        M[e.index.to_numpy()[mask], cat.codes[mask]] = 1.0
        return pd.DataFrame([{"c": (M.T @ M).tobytes(), "n": len(b)}])

    parts = ds.map_batches(presence_matmul, batch_format="pandas").to_pandas()
    k = len(vocab)
    C = np.sum(
        [np.frombuffer(b, dtype=np.float64).reshape(k, k) for b in parts["c"]],
        axis=0,
    ).astype(np.int64)
    return vocab, C, int(parts["n"].sum())


DOC_TOKEN_COOC_SQL = rf"""
with tok as (
  select doc_id, unnest(regexp_extract_all(lower(text), '\S+')) as token
  from documents
),
c as (select token, count(*) as n from tok group by token),
top as (select token from c order by n desc, token limit {COOC_TOP_K}),
dt as (
  select distinct doc_id, token from tok
  where token in (select token from top)
)
select a.token as tok_a, b.token as tok_b, count(*)::BIGINT as n_docs
from dt a join dt b using (doc_id)
where a.token < b.token
group by 1, 2
"""


def doc_token_pmi(sf_dir: str) -> pd.DataFrame:
    """Pointwise mutual information over the top-token pairs —
    PMI(a,b) = ln(p(a,b) / (p(a)·p(b))) with doc-level presence
    probabilities.  Zero extra distributed work beyond
    ``doc_token_cooccurrence``: the co-occurrence matrix DIAGONAL is
    each token's document frequency and the batch partials carry the
    doc count, so the whole statistic falls out of the same k×k
    matmul partials."""
    vocab, C, n_docs = _cooc_matrix(sf_dir)
    df = np.diag(C).astype(np.float64)
    ia, ib = np.triu_indices(len(vocab), k=1)
    n_ab = C[ia, ib].astype(np.float64)
    keep = n_ab > 0
    ia, ib, n_ab = ia[keep], ib[keep], n_ab[keep]
    pmi = np.log(n_ab * float(n_docs) / (df[ia] * df[ib]))
    return pd.DataFrame(
        {
            "tok_a": vocab[ia],
            "tok_b": vocab[ib],
            "n_docs": n_ab.astype(np.int64),
            "pmi": np.round(pmi, 6),
        }
    ).astype({"n_docs": "int64", "pmi": "float64"})


DOC_TOKEN_PMI_SQL = rf"""
with tok as (
  select doc_id, unnest(regexp_extract_all(lower(text), '\S+')) as token
  from documents
),
c as (select token, count(*) as n from tok group by token),
top as (select token from c order by n desc, token limit {COOC_TOP_K}),
dt as (
  select distinct doc_id, token from tok
  where token in (select token from top)
),
df as (select token, count(*)::DOUBLE as nd from dt group by token),
tot as (select count(*)::DOUBLE as n_total from documents)
select a.token as tok_a, b.token as tok_b, count(*)::BIGINT as n_docs,
       round(ln(count(*) * max(tot.n_total) / (max(da.nd) * max(db.nd))), 6)
         as pmi
from dt a
join dt b using (doc_id)
join df da on da.token = a.token
join df db on db.token = b.token
cross join tot
where a.token < b.token
group by a.token, b.token
"""


# ---------------------------------------------------------------------------
# NTILE length bucketing: equal-count length-quantile buckets (the
# padding-efficiency primitive — batch docs of similar length together
# so a fixed-shape model batch wastes minimal pad tokens).  One global
# row-number scan in (n_tokens, doc_id) order; the tile is then a
# ROW-LOCAL closed form of SQL NTILE (first n%k tiles take one extra
# row), so no second exchange and nothing corpus-sized on the driver.
# ---------------------------------------------------------------------------

NTILE_K = 8


def doc_length_ntile(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    k = NTILE_K
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    toks = add_token_counts(ds).select_columns(["doc_id", "n_ws_tokens"])
    ranked = ordered_prefix_sum(
        toks,
        sort_cols=["n_ws_tokens", "doc_id"],
        value_col=None,
        out_col="rk",
        unique_col="doc_id",
    ).materialize()  # read twice: the scalar count and the tile pass
    n = ranked.count()
    if n == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "n_ws_tokens", "tile")}
        )
    big = n % k
    small = n // k

    def assign_tile(b: pd.DataFrame) -> pd.DataFrame:
        r = b["rk"].to_numpy(np.int64) - 1  # 0-based rank
        cut = big * (small + 1)
        tile = np.where(
            r < cut,
            r // (small + 1),
            big + (r - cut) // max(small, 1),
        )
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(np.int64),
             "n_ws_tokens": b["n_ws_tokens"].to_numpy(np.int64),
             "tile": (tile + 1).astype(np.int64)}
        )

    out = ranked.map_batches(assign_tile, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "n_ws_tokens": "int64", "tile": "int64"})


DOC_LENGTH_NTILE_SQL = rf"""
with t as (
  select doc_id,
         case when {_STRIP('text')} = '' then 0
              else len(regexp_extract_all(text, '\S+')) end as n_ws_tokens
  from documents
)
select doc_id, n_ws_tokens,
       ntile({NTILE_K}) over (order by n_ws_tokens, doc_id) as tile
from t
"""


def doc_length_pct_rank_by_lang(sf_dir: str) -> pd.DataFrame:
    """Exact per-group percent_rank of n_chars within each language —
    the grouped window-rank family (global variant:
    rel_value_percent_rank).  Shape: per-batch (lang, n_chars) count
    partials → a combine bounded by languages × distinct lengths
    (n_chars is a bounded int; a continuous measure would use
    functions.selection's range refinement instead), strictly-below
    cumulative counts packed into flat numpy arrays broadcast once
    (zero-copy), one row-local searchsorted pass maps every doc.  No
    per-group sort, nothing corpus-sized on the driver."""
    import ray as _ray

    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "lang", "n_chars"]
    )

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["lang", "n_chars"], as_index=False).size()

    parts = ds.map_batches(hist_partial, batch_format="pandas").to_pandas()
    agg = (
        parts.groupby(["lang", "n_chars"], as_index=False)["size"].sum()
        .sort_values(["lang", "n_chars"], kind="mergesort")
    )
    langs = np.asarray(sorted(agg["lang"].unique()), dtype=object)
    lang_codes = np.searchsorted(langs, agg["lang"].to_numpy(dtype=object))
    offsets = np.searchsorted(lang_codes, np.arange(len(langs) + 1))
    values = agg["n_chars"].to_numpy(np.int64)
    cnts = agg["size"].to_numpy(np.int64)
    below = np.empty_like(cnts)
    n_per = np.empty(len(langs), dtype=np.int64)
    for li in range(len(langs)):
        lo, hi = offsets[li], offsets[li + 1]
        c = cnts[lo:hi]
        below[lo:hi] = np.concatenate([[0], np.cumsum(c[:-1])])
        n_per[li] = c.sum()
    ref = _ray.put((langs, offsets, values, below, n_per))

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        L, off, V, B, N = _ray.get(ref)
        lc = np.searchsorted(L, b["lang"].to_numpy(dtype=object))
        x = b["n_chars"].to_numpy(np.int64)
        pr = np.empty(len(b), dtype=np.float64)
        for li in np.unique(lc):
            m = lc == li
            lo, hi = off[li], off[li + 1]
            idx = np.searchsorted(V[lo:hi], x[m])  # exact hit by construction
            pr[m] = B[lo:hi][idx] / max(int(N[li]) - 1, 1)
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(np.int64),
             "pct_rank": np.round(pr, 6)}
        )

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "pct_rank": "float64"})


# percent_rank = (rank-1)/(n-1) with rank = 1 + count(strictly smaller):
# exactly the broadcast strictly-below count; single-row groups are 0 on
# both sides.
DOC_LENGTH_PCT_RANK_SQL = """
select doc_id,
       round(percent_rank() over (partition by lang order by n_chars), 6)
         as pct_rank
from documents
"""


def doc_unigram_logprob(sf_dir: str, top_v: int | None = None) -> pd.DataFrame:
    """Corpus-LM quality scoring (the CCNet perplexity-filter analog
    with the corpus itself as the LM): per-doc mean unigram
    log-probability.  Pass 1 builds the model — global token counts via
    the hash-bucketed exact combine; the model IS vocabulary-sized, so
    collecting it collects the model, and a web-scale run bounds it
    with ``top_v`` (per-bucket top-k inside the combine, OOV scored at
    the add-one floor 1/(total+1)).  Pass 2 broadcasts (sorted tokens,
    log-probs, total) as numpy arrays (zero-copy) and scores every doc
    row-locally.  The registered query runs top_v=None for exact SQL
    parity; the capped path is unit-tested."""
    import ray as _ray

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    n_buckets = 16

    def cnt_partial(batch: pd.DataFrame) -> pd.DataFrame:
        flat, _lens, _di = _flat_tokens(batch["text"])
        if not len(flat):
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "_hb": pd.Series([], dtype="int64")})
        vc = pd.Series(flat).value_counts()
        out = pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                            "n": vc.to_numpy(np.int64)})
        out["_hb"] = (
            pd.util.hash_array(out["token"].to_numpy(dtype=object)) % n_buckets
        ).astype("int64")
        return out

    def bucket_cnt(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby("token", as_index=False)["n"].sum()
        # the pre-cap bucket total rides along on one token=None marker
        # row so the model normalizes by the TRUE corpus token count
        # even when the vocabulary is capped
        total_row = pd.DataFrame({"token": [None], "n": [int(agg["n"].sum())]})
        if top_v is not None:  # bounded model: keep the bucket's top shard
            agg = agg.nlargest(max(1, top_v // n_buckets), "n")
        return pd.concat([agg, total_row], ignore_index=True)

    vocab = (
        ds.map_batches(cnt_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_cnt, batch_format="pandas")
        .to_pandas()
    )
    if vocab.empty or "token" not in vocab.columns:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_toks": pd.Series([], dtype="int64"),
                             "avg_logprob": pd.Series([], dtype="float64")})
    total = int(vocab.loc[vocab["token"].isna(), "n"].sum())
    vocab = vocab[vocab["token"].notna()].sort_values("token", kind="mergesort")
    if total == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_toks": pd.Series([], dtype="int64"),
                             "avg_logprob": pd.Series([], dtype="float64")})
    tok_arr = vocab["token"].to_numpy(dtype=object)
    logp = np.log(vocab["n"].to_numpy(np.float64) / total)
    oov_logp = np.log(1.0 / (total + 1))
    ref = _ray.put((tok_arr, logp))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        T, LP = _ray.get(ref)
        flat, lens, doc_idx = _flat_tokens(batch["text"])
        n = len(batch)
        sums = np.zeros(n, dtype=np.float64)
        if len(flat):
            idx = np.searchsorted(T, flat)
            idx_c = np.clip(idx, 0, len(T) - 1)
            hit = T[idx_c] == flat
            lp = np.where(hit, LP[idx_c], oov_logp)
            sums = np.bincount(doc_idx, weights=lp, minlength=n)
        keep = lens > 0  # SQL's tok join drops token-less docs
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64)[keep],
                "n_toks": lens[keep],
                "avg_logprob": np.round(sums[keep] / lens[keep], 6),
            }
        )

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.astype(
        {"doc_id": "int64", "n_toks": "int64", "avg_logprob": "float64"}
    )


DOC_UNIGRAM_LOGPROB_SQL = r"""
with tok as (
  select doc_id, unnest(regexp_extract_all(lower(text), '\S+')) as token
  from documents
), c as (
  select token, count(*) as n from tok group by token
), tot as (
  select count(*) as t from tok
)
select doc_id, count(*)::BIGINT as n_toks,
       round(avg(ln(c.n / (select t from tot))), 6) as avg_logprob
from tok join c using (token)
group by doc_id
"""


WEIGHTED_STRATUM_K = 10


def doc_weighted_sample_per_lang(sf_dir: str) -> pd.DataFrame:
    """Weighted reservoir PER STRATUM: the top-k Efraimidis–Spirakis
    priorities within each language — weighted × stratified, the
    combination a mixture-building pipeline actually draws with
    (longer docs more likely, every language represented).  Per-batch
    local top-k per language (the combiner) → one bounded-bucket final
    top-k per language; language count never becomes a Ray group
    count."""
    import hashlib as _hl

    k = WEIGHTED_STRATUM_K
    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "lang", "n_chars"]
    )

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        w = np.maximum(b["n_chars"].to_numpy(np.float64), 1.0)
        u = np.asarray(
            [
                (int(_hl.md5(str(i).encode()).hexdigest()[:8], 16) + 1)
                / 4294967296.0
                for i in ids
            ]
        )
        out = pd.DataFrame(
            {"lang": b["lang"], "doc_id": ids, "priority": np.log(u) / w}
        )
        out = out.sort_values(
            ["lang", "priority", "doc_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        return out.groupby("lang", sort=False).head(k)

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            _hb=(pd.util.hash_array(b["lang"].to_numpy(dtype=object)) % 8
                 ).astype("int64")
        )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["lang", "priority", "doc_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        w = g.groupby("lang", sort=False).head(k)
        return pd.DataFrame(
            {
                "lang": w["lang"],
                "doc_id": w["doc_id"].astype("int64"),
                "priority": w["priority"].round(6),
            }
        )

    out = (
        ds.map_batches(local_topk, batch_format="pandas")
        .map_batches(bucket, batch_format="pandas")
        .groupby("_hb")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    return out.astype({"doc_id": "int64", "priority": "float64"})


DOC_WEIGHTED_SAMPLE_PER_LANG_SQL = f"""
with p as (
  select lang, doc_id,
         ln((('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::BIGINT + 1)
            / 4294967296.0) / greatest(n_chars, 1) as pri
  from documents
)
select lang, doc_id, round(pri, 6) as priority
from p
qualify row_number() over (partition by lang order by pri desc, doc_id)
        <= {WEIGHTED_STRATUM_K}
"""


def doc_bigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Conditional bigram LM scoring: per-doc mean ln p(w2 | w1) with
    p = c(w1 w2) / c(w1) estimated from the corpus itself — one step up
    the n-gram ladder from doc_unigram_logprob (fluency, not just
    vocabulary rarity).  Same shape: both count tables build in one
    streaming pass each through the hash-bucketed exact combine (the
    bigram model is vocabulary²-bounded, in practice corpus-bigram
    sized; a web-scale run caps it top-V like the unigram path), the
    model broadcasts once as sorted numpy arrays, scoring is row-local.
    Docs with < 2 tokens have no bigrams and are absent (SQL join
    semantics)."""
    import ray as _ray

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    n_buckets = 16

    def gram_partial(batch: pd.DataFrame) -> pd.DataFrame:
        flat, _lens, doc_idx = _flat_tokens(batch["text"])
        if not len(flat):
            return pd.DataFrame({"gram": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "_hb": pd.Series([], dtype="int64")})
        same = doc_idx[:-1] == doc_idx[1:]
        bi = np.char.add(
            np.char.add(flat[:-1][same].astype(str), " "),
            flat[1:][same].astype(str),
        ).astype(object)
        vc_u = pd.Series(flat).value_counts()
        vc_b = pd.Series(bi).value_counts()
        out = pd.DataFrame(
            {
                # unigram keys ("w") and bigram keys ("w1 w2") cannot
                # collide — \S+ tokens never contain the space the
                # bigram key embeds — and `kind` disambiguates anyway
                "gram": np.concatenate(
                    [vc_u.index.to_numpy(dtype=object),
                     vc_b.index.to_numpy(dtype=object)]
                ),
                "n": np.concatenate(
                    [vc_u.to_numpy(np.int64), vc_b.to_numpy(np.int64)]
                ),
                "kind": np.concatenate(
                    [np.zeros(len(vc_u), dtype=np.int64),
                     np.ones(len(vc_b), dtype=np.int64)]
                ),
            }
        )
        out["_hb"] = (
            pd.util.hash_array(out["gram"].to_numpy(dtype=object)) % n_buckets
        ).astype("int64")
        return out

    def bucket_cnt(group: pd.DataFrame) -> pd.DataFrame:
        return group.groupby(["gram", "kind"], as_index=False)["n"].sum()

    model = (
        ds.map_batches(gram_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_cnt, batch_format="pandas")
        .to_pandas()
    )
    if model.empty or "gram" not in model.columns:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_bigrams": pd.Series([], dtype="int64"),
                             "avg_logprob": pd.Series([], dtype="float64")})
    uni = model[model["kind"] == 0].sort_values("gram", kind="mergesort")
    big = model[model["kind"] == 1].sort_values("gram", kind="mergesort")
    u_tok = uni["gram"].to_numpy(dtype=object)
    u_cnt = uni["n"].to_numpy(np.float64)
    b_tok = big["gram"].to_numpy(dtype=object)
    b_cnt = big["n"].to_numpy(np.float64)
    ref = _ray.put((u_tok, u_cnt, b_tok, b_cnt))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        UT, UC, BT, BC = _ray.get(ref)
        flat, _lens, doc_idx = _flat_tokens(batch["text"])
        n = len(batch)
        if not len(flat):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_bigrams": pd.Series([], dtype="int64"),
                                 "avg_logprob": pd.Series([], dtype="float64")})
        same = doc_idx[:-1] == doc_idx[1:]
        w1 = flat[:-1][same]
        bi = np.char.add(np.char.add(w1.astype(str), " "),
                         flat[1:][same].astype(str)).astype(object)
        bdoc = doc_idx[:-1][same]
        cb = BC[np.searchsorted(BT, bi)]   # every corpus bigram exists
        cu = UC[np.searchsorted(UT, w1)]
        lp = np.log(cb / cu)
        sums = np.bincount(bdoc, weights=lp, minlength=n)
        counts = np.bincount(bdoc, minlength=n)
        keep = counts > 0
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64)[keep],
                "n_bigrams": counts[keep].astype(np.int64),
                "avg_logprob": np.round(sums[keep] / counts[keep], 6),
            }
        )

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.astype(
        {"doc_id": "int64", "n_bigrams": "int64", "avg_logprob": "float64"}
    )


# DuckDB 1-based inclusive slices: toks[1:-2] = w1..w_{n-1},
# toks[2:-1] = w2..w_n — zipped they are exactly the bigram pairs.
DOC_BIGRAM_LOGPROB_SQL = r"""
with t as (
  select doc_id, regexp_extract_all(lower(text), '\S+') as toks from documents
), tok as (
  select doc_id, unnest(toks) as w from t
), u as (
  select w, count(*) as cu from tok group by w
), zipped as (
  select doc_id, unnest(list_zip(toks[1:-2], toks[2:-1])) as p from t
), pairs as (
  select doc_id, p[1] as w1, p[2] as w2 from zipped
), b as (
  select w1, w2, count(*) as cb from pairs group by w1, w2
)
select doc_id, count(*)::BIGINT as n_bigrams,
       round(avg(ln(b.cb / u.cu)), 6) as avg_logprob
from pairs
join b using (w1, w2)
join u on u.w = pairs.w1
group by doc_id
"""


def doc_token_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document Shannon entropy of the token distribution — low
    entropy = repetitive/template text (the distributional cousin of
    doc_repetition's max-frequency rule).  Entirely row-local: one
    vectorized pandas groupby per batch, no global state, no shuffle.
    Token-less docs are absent (SQL group-by semantics)."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        flat, lens, doc_idx = _flat_tokens(batch["text"])
        n = len(batch)
        if not len(flat):
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "entropy": pd.Series([], dtype="float64")})
        cnt = (
            pd.DataFrame({"d": doc_idx, "w": flat})
            .groupby(["d", "w"], sort=False)
            .size()
        )
        d = cnt.index.get_level_values(0).to_numpy()
        p = cnt.to_numpy(np.float64) / lens[d]
        ent = -np.bincount(d, weights=p * np.log(p), minlength=n)
        keep = lens > 0
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64)[keep],
                "entropy": np.round(ent[keep], 6),
            }
        )

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "entropy": "float64"})


DOC_TOKEN_ENTROPY_SQL = r"""
with tok as (
  select doc_id, unnest(regexp_extract_all(lower(text), '\S+')) as w
  from documents
), c as (
  select doc_id, w, count(*) as n from tok group by doc_id, w
), t as (
  select doc_id, count(*) as tot from tok group by doc_id
)
select c.doc_id,
       round(-sum((c.n / t.tot) * ln(c.n / t.tot)), 6) as entropy
from c join t using (doc_id)
group by c.doc_id
"""


def doc_lang_source_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP(lang, source) in ONE streaming pass: only the finest
    (lang, source) cells are aggregated distributed (per-batch partials
    + tiny combine — cell count is bounded by the dimension product);
    the coarser levels are exact integer sums of those cells, derived
    driver-side at no extra read.  Rollup margin keys surface as 'ALL'
    (coalesce in the oracle).  Contract: rows with a NULL dimension are
    EXCLUDED on both sides (SQL ``where lang is not null``, pandas
    groupby dropna) — a genuine NULL cell would otherwise render as
    'ALL' and collide with the margin labels, making the rollup output
    ambiguous; filter or sentinel-fill NULL dims upstream instead."""
    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["lang", "source", "n_chars"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
        )

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["lang", "source"], as_index=False)
        .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
    )
    by_lang = cells.groupby("lang", as_index=False).agg(
        n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")
    )
    by_lang["source"] = "ALL"
    grand = pd.DataFrame(
        {
            "lang": ["ALL"],
            "source": ["ALL"],
            "n_docs": [int(cells["n_docs"].sum())],
            "total_chars": [int(cells["total_chars"].sum())],
        }
    )
    out = pd.concat(
        [cells, by_lang[["lang", "source", "n_docs", "total_chars"]], grand],
        ignore_index=True,
    )
    return out.astype({"n_docs": "int64", "total_chars": "int64"})


DOC_LANG_SOURCE_ROLLUP_SQL = """
select coalesce(lang, 'ALL') as lang, coalesce(source, 'ALL') as source,
       count(*)::BIGINT as n_docs, sum(n_chars)::BIGINT as total_chars
from documents
where lang is not null and source is not null
group by rollup (lang, source)
"""


def doc_lang_source_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE(lang, source): every grouping-set margin, still ONE
    streaming pass — the distributed work is only the finest cells
    (same as the rollup); the (source)-only margin CUBE adds over
    ROLLUP is one more exact integer sum of those cells, derived
    driver-side.  Same NULL-dimension contract as the rollup."""
    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["lang", "source", "n_chars"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
        )

    cells = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["lang", "source"], as_index=False)
        .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
    )

    def margin(by: str, other: str) -> pd.DataFrame:
        m = cells.groupby(by, as_index=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum")
        )
        m[other] = "ALL"
        return m[["lang", "source", "n_docs", "total_chars"]]

    grand = pd.DataFrame(
        {"lang": ["ALL"], "source": ["ALL"],
         "n_docs": [int(cells["n_docs"].sum())],
         "total_chars": [int(cells["total_chars"].sum())]}
    )
    out = pd.concat(
        [cells, margin("lang", "source"), margin("source", "lang"), grand],
        ignore_index=True,
    )
    return out.astype({"n_docs": "int64", "total_chars": "int64"})


DOC_LANG_SOURCE_CUBE_SQL = """
select coalesce(lang, 'ALL') as lang, coalesce(source, 'ALL') as source,
       count(*)::BIGINT as n_docs, sum(n_chars)::BIGINT as total_chars
from documents
where lang is not null and source is not null
group by cube (lang, source)
"""


FILTER_MIN_CHARS = 50
FILTER_MIN_ENTROPY = 2.7  # ~p10 of the corpus entropy distribution


def doc_filter_report(sf_dir: str) -> pd.DataFrame:
    """EXPLAINABLE multi-rule filtering: per document, WHICH rules
    failed (too_short / low_entropy / repetitive, comma-joined in
    fixed order) and the final keep decision — the reject-reason
    report a curation run ships alongside the kept corpus, so rule
    tuning sees per-rule hit rates instead of one opaque drop count.
    All three signals are row-local (the repetition kernel is the
    oracle-proven one from doc_repetition); comparisons use UNROUNDED
    values on both engines."""
    from ocr_poc_ray.functions.textstats import add_repetition

    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text", "n_chars"]
    )
    ds = add_repetition(ds)

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        flat, lens, doc_idx = _flat_tokens(b["text"])
        ent = np.zeros(len(b), dtype=np.float64)
        if len(flat):
            cnt = (
                pd.DataFrame({"d": doc_idx, "w": flat})
                .groupby(["d", "w"], sort=False)
                .size()
            )
            d = cnt.index.get_level_values(0).to_numpy()
            p = cnt.to_numpy(np.float64) / lens[d]
            ent = -np.bincount(d, weights=p * np.log(p), minlength=len(b))
        short = b["n_chars"].to_numpy(np.int64) < FILTER_MIN_CHARS
        lowent = ent < FILTER_MIN_ENTROPY
        rep = b["is_repetitive"].to_numpy(bool)
        reasons = []
        for s_, e_, r_ in zip(short, lowent, rep):
            rs = []
            if s_:
                rs.append("too_short")
            if e_:
                rs.append("low_entropy")
            if r_:
                rs.append("repetitive")
            reasons.append(",".join(rs))
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "reasons": pd.Series(reasons, dtype=object),
                "is_kept": ~(short | lowent | rep),
            }
        )

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "is_kept": "bool"})


DOC_FILTER_REPORT_SQL = rf"""
with t as (
  select doc_id, regexp_extract_all(lower(text), '\S+') as toks from documents
), tok as (
  select doc_id, unnest(toks) as w from t
), c as (
  select doc_id, w, count(*) as n from tok group by doc_id, w
), tt as (
  select doc_id, count(*) as tot from tok group by doc_id
), ent as (
  select c.doc_id, -sum((c.n / tt.tot) * ln(c.n / tt.tot)) as e
  from c join tt using (doc_id) group by c.doc_id
), b as (
  select doc_id, len(toks) as nt,
         unnest([toks[i] || ' ' || toks[i+1]
                 for i in generate_series(1, len(toks) - 1)]) as bg
  from t where len(toks) >= 2
), bc as (
  select doc_id, nt, bg, count(*) as cnt from b group by doc_id, nt, bg
), rep as (
  select doc_id, max(cnt) / (any_value(nt) - 1) as frac from bc group by doc_id
), sig as (
  select d.doc_id, d.n_chars,
         coalesce(ent.e, 0) as e, coalesce(rep.frac, 0) as frac
  from documents d
  left join ent using (doc_id) left join rep using (doc_id)
)
select doc_id,
       concat_ws(',',
         case when n_chars < {FILTER_MIN_CHARS} then 'too_short' end,
         case when e < {FILTER_MIN_ENTROPY} then 'low_entropy' end,
         case when frac > {_REP_T} then 'repetitive' end) as reasons,
       (n_chars >= {FILTER_MIN_CHARS} and e >= {FILTER_MIN_ENTROPY}
        and frac <= {_REP_T}) as is_kept
from sig
"""


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021 §A1.1) — the published heuristic
# rule set for web-scale pretraining corpora, adapted to this corpus's
# ranges (word counts 10-99; the canonical 50-100k band would pass
# everything).  Every signal is INTEGER arithmetic so the pass/keep
# booleans are bit-identical between engines: "mean word length in
# [4,10]" is evaluated as 4*n <= total_chars <= 10*n, never as a float
# mean (CLAUDE.md rounding-boundary note).
# ---------------------------------------------------------------------------

GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 90
# canonical Gopher list ∩-friendly extension: this corpus's function
# words are 'the' and 'a'; the published "≥2 distinct stopword hits"
# rule needs a list the vocabulary can hit twice.
GOPHER_STOPS = ("the", "a", "and", "of", "to", "is", "in", "that")


def doc_gopher_rules(sf_dir: str) -> pd.DataFrame:
    """Per-document Gopher rule report: the four signals, one pass flag
    per rule, and the composite keep decision.  Entirely row-local —
    one zero-shuffle map_batches pass; at 100 TB this is the cheapest
    possible shape (embarrassingly parallel, no exchange)."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    stops = np.array(sorted(GOPHER_STOPS), dtype=object)

    def kernel(b: pd.DataFrame) -> pd.DataFrame:
        flat, lens, doc_idx = _flat_tokens(b["text"])
        n = len(b)
        tok = pd.Series(flat, dtype=object)
        tlen = tok.str.len().to_numpy(np.int64) if len(flat) else np.array([], dtype=np.int64)
        total_chars = np.bincount(doc_idx, weights=tlen, minlength=n).astype(np.int64)
        alpha = (
            tok.str.contains("[a-z]", regex=True).to_numpy()
            if len(flat) else np.array([], dtype=bool)
        )
        n_alpha = np.bincount(doc_idx[alpha], minlength=n).astype(np.int64)
        # distinct stopword hits per doc: filter to the 8-word list,
        # dedup (doc, word), count — bounded at 8 rows per doc.
        hits = np.zeros(n, dtype=np.int64)
        if len(flat):
            m = np.isin(flat, stops)
            if m.any():
                hp = pd.DataFrame({"d": doc_idx[m], "w": flat[m]}).drop_duplicates()
                hits = np.bincount(hp["d"].to_numpy(), minlength=n).astype(np.int64)
        nw = lens
        p_count = (nw >= GOPHER_MIN_WORDS) & (nw <= GOPHER_MAX_WORDS)
        p_len = (total_chars >= 4 * nw) & (total_chars <= 10 * nw)
        p_alpha = 5 * n_alpha >= 4 * nw
        p_stop = hits >= 2
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_words": nw,
                "total_word_chars": total_chars,
                "n_alpha_words": n_alpha,
                "n_stop_hits": hits,
                "pass_wordcount": p_count,
                "pass_wordlen": p_len,
                "pass_alpha": p_alpha,
                "pass_stop": p_stop,
                "is_kept": p_count & p_len & p_alpha & p_stop,
            }
        )

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    return out.astype(
        {
            "doc_id": "int64", "n_words": "int64", "total_word_chars": "int64",
            "n_alpha_words": "int64", "n_stop_hits": "int64",
            "pass_wordcount": "bool", "pass_wordlen": "bool",
            "pass_alpha": "bool", "pass_stop": "bool", "is_kept": "bool",
        }
    )


_GOPHER_STOPS_SQL = ", ".join(f"'{w}'" for w in sorted(GOPHER_STOPS))

DOC_GOPHER_RULES_SQL = rf"""
with t as (
  select doc_id, regexp_extract_all(lower(text), '\S+') as toks from documents
), s as (
  select doc_id,
         len(toks) as n_words,
         coalesce(list_sum(list_transform(toks, w -> length(w))), 0)::BIGINT
           as total_word_chars,
         len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))::BIGINT
           as n_alpha_words,
         len(list_distinct(list_filter(
           toks, w -> list_contains([{_GOPHER_STOPS_SQL}], w))))::BIGINT
           as n_stop_hits
  from t
)
select doc_id, n_words::BIGINT as n_words, total_word_chars, n_alpha_words,
       n_stop_hits,
       (n_words >= {GOPHER_MIN_WORDS} and n_words <= {GOPHER_MAX_WORDS})
         as pass_wordcount,
       (total_word_chars >= 4 * n_words and total_word_chars <= 10 * n_words)
         as pass_wordlen,
       (5 * n_alpha_words >= 4 * n_words) as pass_alpha,
       (n_stop_hits >= 2) as pass_stop,
       ((n_words >= {GOPHER_MIN_WORDS} and n_words <= {GOPHER_MAX_WORDS})
        and (total_word_chars >= 4 * n_words
             and total_word_chars <= 10 * n_words)
        and (5 * n_alpha_words >= 4 * n_words)
        and (n_stop_hits >= 2)) as is_kept
from s
"""


# ---------------------------------------------------------------------------
# Pareto frontier (skyline query, Börzsönyi et al. 2001): the documents
# not dominated under (maximize distinct-token vocabulary, minimize
# character cost) — the "most signal per byte" shortlist a curation run
# hand-reviews.  Distribution relies on the skyline algebra
# skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)): each batch emits
# its LOCAL skyline (for random 2-D data that is O(log batch) points),
# and one output-sized final pass merges them.  Both criteria are
# integers, so dominance is bit-identical across engines.
# ---------------------------------------------------------------------------


def _skyline_2d(df: pd.DataFrame) -> pd.DataFrame:
    """Rows not dominated under (min n_chars, max n_distinct); ties on
    both axes are all kept (dominance requires one STRICT inequality).
    Kept iff d == max(d | same c) and d > max(d | smaller c)."""
    md = df.groupby("n_chars")["n_distinct"].max().sort_index()
    prior = md.cummax().shift(fill_value=np.iinfo(np.int64).min)
    at_max = df["n_distinct"].to_numpy() == md.reindex(df["n_chars"]).to_numpy()
    beats_prior = df["n_distinct"].to_numpy() > prior.reindex(df["n_chars"]).to_numpy()
    return df[at_max & beats_prior]


def doc_pareto_frontier(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text", "n_chars"]
    )

    def local(b: pd.DataFrame) -> pd.DataFrame:
        flat, lens, doc_idx = _flat_tokens(b["text"])
        nd = np.zeros(len(b), dtype=np.int64)
        if len(flat):
            nd = (
                pd.DataFrame({"d": doc_idx, "w": flat})
                .drop_duplicates()
                .groupby("d")
                .size()
                .reindex(range(len(b)), fill_value=0)
                .to_numpy(np.int64)
            )
        cand = pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "n_chars": b["n_chars"].to_numpy(np.int64),
                "n_distinct": nd,
            }
        )
        return _skyline_2d(cand)

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    if cand.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "n_chars": pd.Series([], dtype="int64"),
             "n_distinct": pd.Series([], dtype="int64")}
        )
    out = _skyline_2d(cand).sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": "int64", "n_chars": "int64", "n_distinct": "int64"})


DOC_PARETO_FRONTIER_SQL = r"""
with s as (
  select doc_id, n_chars,
         len(list_distinct(regexp_extract_all(lower(text), '\S+')))::BIGINT
           as n_distinct
  from documents
)
select a.doc_id, a.n_chars::BIGINT as n_chars, a.n_distinct
from s a
where not exists (
  select 1 from s b
  where b.n_distinct >= a.n_distinct and b.n_chars <= a.n_chars
    and (b.n_distinct > a.n_distinct or b.n_chars < a.n_chars)
)
"""


# ---------------------------------------------------------------------------
# k-anonymity audit (Sweeney 2002) — the privacy counterpart of the PII
# regex scrub: docs whose quasi-identifier combination (lang, source,
# length bucket) is shared by fewer than K corpus documents are
# re-identifiable through metadata alone, even after text-level PII
# removal.  A release gate runs this per shipped corpus slice.
# ---------------------------------------------------------------------------

K_ANONYMITY = 3
K_ANON_LEN_BUCKET = 100  # chars per length bucket


def doc_k_anonymity(sf_dir: str) -> pd.DataFrame:
    """Per quasi-identifier cell: member count and the k-anonymity
    flag.  Shape: per-batch partial counts (cell-bounded: langs ×
    sources × length buckets, never doc-bounded) → 8-bucket hash
    combine — nothing corpus-sized moves."""
    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["lang", "source", "n_chars"]
    )
    n_buckets = 8

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cells = pd.DataFrame(
            {
                "lang": b["lang"].to_numpy(object),
                "source": b["source"].to_numpy(object),
                "len_bucket": (b["n_chars"].to_numpy(np.int64)
                               // K_ANON_LEN_BUCKET),
            }
        ).groupby(["lang", "source", "len_bucket"], as_index=False).size()
        hb = pd.util.hash_pandas_object(
            cells[["lang", "source", "len_bucket"]], index=False
        ).to_numpy(np.uint64)
        return cells.assign(_hb=(hb % n_buckets).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["lang", "source", "len_bucket"], as_index=False).agg(
            group_n=("size", "sum")
        )
        t["is_k_anon"] = t["group_n"] >= K_ANONYMITY
        return t

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype=object),
             "source": pd.Series([], dtype=object),
             "len_bucket": pd.Series([], dtype="int64"),
             "group_n": pd.Series([], dtype="int64"),
             "is_k_anon": pd.Series([], dtype="bool")}
        )
    return out[["lang", "source", "len_bucket", "group_n", "is_k_anon"]].astype(
        {"lang": object, "source": object, "len_bucket": "int64",
         "group_n": "int64", "is_k_anon": "bool"}
    )


# n_chars is positive, so DuckDB's truncating // equals Python's floor
# (CLAUDE.md pre-1970 caveat does not apply to counts).
DOC_K_ANONYMITY_SQL = f"""
select lang, source, (n_chars // {K_ANON_LEN_BUCKET})::BIGINT as len_bucket,
       count(*)::BIGINT as group_n,
       count(*) >= {K_ANONYMITY} as is_k_anon
from documents
group by lang, source, len_bucket
"""


L_DIVERSITY = 3


def doc_l_diversity(sf_dir: str) -> pd.DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    stronger sibling: a quasi-identifier group that is k-anonymous can
    still leak when every member shares ONE sensitive value, so each
    (lang, len_bucket) group must contain ≥ L DISTINCT sensitive values
    (``source`` stands in as the sensitive attribute).

    Shape: per-batch DISTINCT (lang, len_bucket, source, n) partials
    (cell-bounded: langs × buckets × sources, never doc-bounded) →
    hash buckets keyed on the QUASI-IDENTIFIER only, so every source of
    a group co-locates and ``nunique`` is exact — nothing corpus-sized
    moves."""
    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["lang", "source", "n_chars"]
    )
    n_buckets = 8

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cells = pd.DataFrame(
            {
                "lang": b["lang"].to_numpy(object),
                "source": b["source"].to_numpy(object),
                "len_bucket": (b["n_chars"].to_numpy(np.int64)
                               // K_ANON_LEN_BUCKET),
            }
        ).groupby(["lang", "len_bucket", "source"], as_index=False).size()
        # bucket on the quasi-identifier ONLY: a group's sources must
        # land in one combine task for the exact distinct count
        hb = pd.util.hash_pandas_object(
            cells[["lang", "len_bucket"]], index=False
        ).to_numpy(np.uint64)
        return cells.assign(_hb=(hb % n_buckets).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["lang", "len_bucket"], as_index=False).agg(
            group_n=("size", "sum"), distinct_sources=("source", "nunique")
        )
        t["is_l_diverse"] = t["distinct_sources"] >= L_DIVERSITY
        return t

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype=object),
             "len_bucket": pd.Series([], dtype="int64"),
             "group_n": pd.Series([], dtype="int64"),
             "distinct_sources": pd.Series([], dtype="int64"),
             "is_l_diverse": pd.Series([], dtype="bool")}
        )
    return out[
        ["lang", "len_bucket", "group_n", "distinct_sources", "is_l_diverse"]
    ].astype(
        {"lang": object, "len_bucket": "int64", "group_n": "int64",
         "distinct_sources": "int64", "is_l_diverse": "bool"}
    )


DOC_L_DIVERSITY_SQL = f"""
select lang, (n_chars // {K_ANON_LEN_BUCKET})::BIGINT as len_bucket,
       count(*)::BIGINT as group_n,
       count(distinct source)::BIGINT as distinct_sources,
       count(distinct source) >= {L_DIVERSITY} as is_l_diverse
from documents
group by lang, len_bucket
"""


#: t-closeness threshold — numerator comparison is INTEGER-exact at
#: t = 1/2: TVD ≤ 1/2 ⟺ Σ|n_gs·N − gn_s·Gn| ≤ Gn·N
T_CLOSENESS_NUM = 1
T_CLOSENESS_DEN = 2


def doc_t_closeness(sf_dir: str) -> pd.DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    of the classic privacy triple: an l-diverse group can still leak
    when its sensitive-value DISTRIBUTION is skewed vs the corpus, so
    each quasi-identifier group's total-variation distance to the
    global ``source`` distribution must be ≤ t.

    TVD is computed over a COMMON integer denominator —
    ``Σ_s |n_gs·N − gn_s·Gn| / (2·Gn·N)`` — so the flag comparison
    ``Σ ≤ (num/den)·2·Gn·N`` is integer-exact at t = 1/2 (no float can
    sit on the boundary); only the reported ``tvd`` column rounds (6 dp).

    Shape: the l-diversity bucketed combine plus a BROADCAST global
    (source → count) table (sources are few); absent sources contribute
    their full global mass — the per-group kernel iterates the global
    source vector, never documents."""
    import ray as _ray

    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["lang", "source", "n_chars"]
    )
    n_buckets = 8

    # global source counts: partial agg + driver fold (sources are few)
    glob = (
        ds.map_batches(
            lambda b: b.groupby("source", as_index=False).size(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("source", as_index=False)["size"].sum()
        .sort_values("source")
    )
    g_sources = glob["source"].to_numpy(object)
    g_counts = glob["size"].to_numpy(np.int64)
    big_n = int(g_counts.sum())
    gref = _ray.put((g_sources, g_counts))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cells = pd.DataFrame(
            {
                "lang": b["lang"].to_numpy(object),
                "source": b["source"].to_numpy(object),
                "len_bucket": (b["n_chars"].to_numpy(np.int64)
                               // K_ANON_LEN_BUCKET),
            }
        ).groupby(["lang", "len_bucket", "source"], as_index=False).size()
        hb = pd.util.hash_pandas_object(
            cells[["lang", "len_bucket"]], index=False
        ).to_numpy(np.uint64)
        return cells.assign(_hb=(hb % n_buckets).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        src_all, cnt_all = _ray.get(gref)
        t = g.groupby(["lang", "len_bucket", "source"], as_index=False)[
            "size"
        ].sum()
        rows = []
        for (lang, lb), grp in t.groupby(["lang", "len_bucket"], sort=False):
            gn = int(grp["size"].sum())
            # per-source group counts aligned to the global source vector
            pos = np.searchsorted(src_all, grp["source"].to_numpy(object))
            n_gs = np.zeros(len(src_all), dtype=np.int64)
            n_gs[pos] = grp["size"].to_numpy(np.int64)
            num = int(np.abs(n_gs * big_n - cnt_all * gn).sum())
            rows.append(
                {
                    "lang": lang, "len_bucket": int(lb), "group_n": gn,
                    "tvd": round(num / (2.0 * gn * big_n), 6),
                    "is_t_close": num * T_CLOSENESS_DEN
                    <= 2 * T_CLOSENESS_NUM * gn * big_n,
                }
            )
        return pd.DataFrame(rows)

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype=object),
             "len_bucket": pd.Series([], dtype="int64"),
             "group_n": pd.Series([], dtype="int64"),
             "tvd": pd.Series([], dtype="float64"),
             "is_t_close": pd.Series([], dtype="bool")}
        )
    return out[["lang", "len_bucket", "group_n", "tvd", "is_t_close"]].astype(
        {"lang": object, "len_bucket": "int64", "group_n": "int64",
         "tvd": "float64", "is_t_close": "bool"}
    )


DOC_T_CLOSENESS_SQL = f"""
with cell as (
  select lang, (n_chars // {K_ANON_LEN_BUCKET})::BIGINT as len_bucket,
         source, count(*)::BIGINT as n
  from documents group by 1, 2, 3
), grp as (
  select lang, len_bucket, sum(n)::BIGINT as group_n from cell group by 1, 2
), gsum as (
  select source, count(*)::BIGINT as gn from documents group by source
), tot as (
  select count(*)::BIGINT as big_n from documents
), terms as (
  -- every (group, GLOBAL source) pair: absent sources contribute
  -- their full global mass |0 - gn*group_n|
  select g.lang, g.len_bucket, g.group_n, t.big_n,
         abs(coalesce(c.n, 0) * t.big_n - s.gn * g.group_n) as term
  from grp g cross join gsum s cross join tot t
  left join cell c
    on c.lang = g.lang and c.len_bucket = g.len_bucket
   and c.source = s.source
)
select lang, len_bucket, group_n,
       round(sum(term) / (2.0 * group_n * big_n), 6) as tvd,
       sum(term) * {T_CLOSENESS_DEN}
         <= 2 * {T_CLOSENESS_NUM} * group_n * big_n as is_t_close
from terms
group by lang, len_bucket, group_n, big_n
"""


def doc_quality_blend(sf_dir: str) -> pd.DataFrame:
    """Percentile-normalized score ensembling: blend two quality
    signals on incommensurable scales (length, token entropy) by
    converting each to its exact global percent-rank and averaging —
    the standard way curation pipelines combine heuristic scores.
    Shape: signals are row-local; each rank is one prefix-scan
    range-sort; the two ranked datasets meet in a distributed hash
    join on doc_id (repartitioned per the 0-row-block pitfall)."""
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text", "n_chars"]
    )
    n = ds.count()

    def signals(b: pd.DataFrame) -> pd.DataFrame:
        flat, lens, doc_idx = _flat_tokens(b["text"])
        ent = np.zeros(len(b), dtype=np.float64)
        if len(flat):
            cnt = (
                pd.DataFrame({"d": doc_idx, "w": flat})
                .groupby(["d", "w"], sort=False)
                .size()
            )
            d = cnt.index.get_level_values(0).to_numpy()
            p = cnt.to_numpy(np.float64) / lens[d]
            ent = -np.bincount(d, weights=p * np.log(p), minlength=len(b))
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "m1": b["n_chars"].to_numpy(np.float64),
                "m2": np.round(ent, 9),
            }
        )

    sigs = ds.map_batches(signals, batch_format="pandas").materialize()
    r1 = ordered_prefix_sum(
        sigs.select_columns(["doc_id", "m1"]),
        sort_cols=["m1", "doc_id"], value_col=None, out_col="rk1",
        unique_col="doc_id",
    ).map_batches(
        lambda b: b[["doc_id", "rk1"]], batch_format="pandas"
    ).repartition(8)
    r2 = ordered_prefix_sum(
        sigs.select_columns(["doc_id", "m2"]),
        sort_cols=["m2", "doc_id"], value_col=None, out_col="rk2",
        unique_col="doc_id",
    ).map_batches(
        lambda b: b.rename(columns={"doc_id": "doc_id2"})[["doc_id2", "rk2"]],
        batch_format="pandas",
    ).repartition(8)
    joined = r1.join(
        r2, "inner", num_partitions=8, on=("doc_id",), right_on=("doc_id2",)
    )

    def blend(b: pd.DataFrame) -> pd.DataFrame:
        pr1 = (b["rk1"].to_numpy(np.int64) - 1) / max(n - 1, 1)
        pr2 = (b["rk2"].to_numpy(np.int64) - 1) / max(n - 1, 1)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "blend": np.round((pr1 + pr2) / 2.0, 6),
            }
        )

    out = joined.map_batches(blend, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "blend": "float64"})


# (metric, doc_id) is unique → rank == row_number on both sides; the
# entropy signal is rounded to 9 dp BEFORE ranking on both engines so
# float-summation-order ties cannot reorder neighbors.
DOC_QUALITY_BLEND_SQL = r"""
with tok as (
  select doc_id, unnest(regexp_extract_all(lower(text), '\S+')) as w
  from documents
), c as (
  select doc_id, w, count(*) as n from tok group by doc_id, w
), t as (
  select doc_id, count(*) as tot from tok group by doc_id
), ent as (
  select c.doc_id, round(-sum((c.n / t.tot) * ln(c.n / t.tot)), 9) as m2
  from c join t using (doc_id) group by c.doc_id
), sig as (
  select d.doc_id, d.n_chars as m1, coalesce(ent.m2, 0) as m2
  from documents d left join ent using (doc_id)
)
select doc_id,
       round((percent_rank() over (order by m1, doc_id)
              + percent_rank() over (order by m2, doc_id)) / 2, 6) as blend
from sig
"""


def doc_compress_ratio(sf_dir: str) -> pd.DataFrame:
    """zlib compression ratio per document — the classic cheap
    boilerplate/repetition detector (highly compressible text is
    template-like; near-incompressible text is noise/binary junk).
    Row-local; DuckDB has no zlib, so this is rows-only with the
    invariant tests in tests/test_queries.py (repetitive text
    compresses far better than varied text; ratio bounds hold)."""
    import zlib

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ratios = []
        for t in batch["text"].fillna(""):
            raw = t.encode()
            ratios.append(
                round(len(zlib.compress(raw, 6)) / len(raw), 6) if raw else 1.0
            )
        return pd.DataFrame(
            {"doc_id": batch["doc_id"].astype("int64"),
             "compress_ratio": pd.Series(ratios, dtype="float64")}
        )

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "compress_ratio": "float64"})


def doc_source_kl(sf_dir: str) -> pd.DataFrame:
    """Vocabulary drift per source: KL(P_source ‖ P_corpus) over the
    unigram distributions — which slices of the corpus are
    distributionally unusual (drifted scrape, foreign boilerplate).
    One bucketed combine builds (source, token) and global counts
    together (the model is vocabulary × sources sized — the same
    collecting-the-model contract as the LM scorers); the KL sum per
    source is a driver fold over that model table."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["source", "text"])
    n_buckets = 16

    def cnt_partial(batch: pd.DataFrame) -> pd.DataFrame:
        flat, lens, doc_idx = _flat_tokens(batch["text"])
        if not len(flat):
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "token": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "_hb": pd.Series([], dtype="int64")})
        src = batch["source"].to_numpy(dtype=object)[doc_idx]
        g = (
            pd.DataFrame({"source": src, "token": flat})
            .groupby(["source", "token"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["_hb"] = (
            pd.util.hash_array(g["token"].to_numpy(dtype=object)) % n_buckets
        ).astype("int64")
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["source", "token"], as_index=False)["n"].sum()

    model = (
        ds.map_batches(cnt_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if model.empty or "token" not in model.columns:
        return pd.DataFrame({"source": pd.Series([], dtype=object),
                             "kl": pd.Series([], dtype="float64")})
    tot = float(model["n"].sum())
    corpus = model.groupby("token")["n"].sum() / tot
    out_rows = []
    for src, g in model.groupby("source"):
        ps = g.set_index("token")["n"] / float(g["n"].sum())
        pc = corpus.loc[ps.index]
        out_rows.append(
            {"source": src,
             "kl": round(float((ps * np.log(ps / pc)).sum()), 6)}
        )
    out = pd.DataFrame(out_rows).sort_values("source").reset_index(drop=True)
    return out


DOC_SOURCE_KL_SQL = r"""
with tok as (
  select source, unnest(regexp_extract_all(lower(text), '\S+')) as token
  from documents
), st as (
  select source, token, count(*) as n from tok group by source, token
), s_tot as (
  select source, sum(n) as sn from st group by source
), c as (
  select token, sum(n) as cn from st group by token
), tot as (
  select sum(n) as t from st
)
select st.source,
       round(sum((st.n / s_tot.sn) *
                 ln((st.n / s_tot.sn) / (c.cn / (select t from tot)))), 6)
         as kl
from st
join s_tot using (source)
join c using (token)
group by st.source
"""


def doc_leakage_safe_split(sf_dir: str) -> pd.DataFrame:
    """Train/val/test split that keeps every near-duplicate CLUSTER in
    one split — the train/test contamination guard a plain per-doc
    hash split lacks: duplicated content straddling the split boundary
    leaks test data into training.  Composes the exact similarity join
    → distributed components (same subset/threshold as
    doc_dup_components_exact so the recursive-CTE oracle stays
    tractable) with the md5 split keyed on the COMPONENT id; singleton
    docs are their own component.  The component table is
    dup-cluster-sized (the dedup output, small by construction) and
    broadcasts once; everything else is row-local."""
    import hashlib as _hl

    import ray as _ray

    comp = doc_dup_components_exact(sf_dir)
    comp_ids = comp["doc_id"].to_numpy(np.int64)
    comp_lbl = comp["component"].to_numpy(np.int64)
    order = np.argsort(comp_ids, kind="mergesort")
    ref = _ray.put((comp_ids[order], comp_lbl[order]))

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ids_s, lbl_s = _ray.get(ref)
        ids = batch["doc_id"].to_numpy(np.int64)
        keep = ids < JACCARD_MAX_DOC_ID
        ids = ids[keep]
        component = ids.copy()
        if len(ids_s):
            idx = np.searchsorted(ids_s, ids)
            idx_c = np.clip(idx, 0, len(ids_s) - 1)
            hit = ids_s[idx_c] == ids
            component[hit] = lbl_s[idx_c[hit]]
        frac = np.asarray(
            [
                int(_hl.md5(str(c).encode()).hexdigest()[:8], 16) % 100
                for c in component
            ]
        )
        split = np.where(
            frac < SPLIT_TRAIN_PCT,
            "train",
            np.where(frac < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val", "test"),
        )
        return pd.DataFrame(
            {"doc_id": ids, "component": component,
             "split": split.astype(object)}
        )

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "component": "int64"})


def _leakage_split_sql() -> str:
    md5c = ("('0x' || substr(md5(cast(coalesce(c.component, d.doc_id) as varchar)), 1, 8))::BIGINT % 100")
    return f"""
with recursive
p as ({{jac}}),
edges as (select id_a as a, id_b as b from p
          union all
          select id_b as a, id_a as b from p),
reach(node, r) as (
  select a, b from edges
  union
  select reach.node, e.b from reach join edges e on e.a = reach.r
),
comp as (
  select node as doc_id, least(node, min(r)) as component
  from reach group by node
)
select d.doc_id,
       coalesce(c.component, d.doc_id)::BIGINT as component,
       case when {md5c} < {SPLIT_TRAIN_PCT} then 'train'
            when {md5c} < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} then 'val'
            else 'test' end as split
from documents d left join comp c using (doc_id)
where d.doc_id < {JACCARD_MAX_DOC_ID}
"""


def doc_corpus_card(sf_dir: str) -> pd.DataFrame:
    """The dataset-card summary in ONE streaming pass: doc count,
    whitespace-token total, distinct languages/sources, and length
    min/max/mean — per-batch partials (count/sum/min/max + in-batch
    distinct dim values) combine to a single row on the driver.
    Nothing corpus-sized moves: the only non-scalar partial state is
    the distinct dimension values (languages × sources, tiny)."""
    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["text", "lang", "source", "n_chars"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.split().str.len()
        return pd.DataFrame(
            {
                "n_docs": [len(b)],
                "n_tokens": [int(toks.sum())],
                "langs": ["\x1f".join(sorted(set(b["lang"])))],
                "sources": ["\x1f".join(sorted(set(b["source"])))],
                "min_chars": [int(b["n_chars"].min())],
                "max_chars": [int(b["n_chars"].max())],
                "sum_chars": [int(b["n_chars"].sum())],
            }
        )

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    langs = set()
    sources = set()
    for ls in p["langs"]:
        langs.update(ls.split("\x1f"))
    for ss in p["sources"]:
        sources.update(ss.split("\x1f"))
    n_docs = int(p["n_docs"].sum())
    return pd.DataFrame(
        {
            "n_docs": pd.Series([n_docs], dtype="int64"),
            "n_tokens": pd.Series([int(p["n_tokens"].sum())], dtype="int64"),
            "n_langs": pd.Series([len(langs)], dtype="int64"),
            "n_sources": pd.Series([len(sources)], dtype="int64"),
            "min_chars": pd.Series([int(p["min_chars"].min())], dtype="int64"),
            "max_chars": pd.Series([int(p["max_chars"].max())], dtype="int64"),
            "avg_chars": pd.Series(
                [round(int(p["sum_chars"].sum()) / n_docs, 2)], dtype="float64"
            ),
        }
    )


DOC_CORPUS_CARD_SQL = r"""
select count(*)::BIGINT as n_docs,
       sum(len(regexp_extract_all(text, '\S+')))::BIGINT as n_tokens,
       count(distinct lang)::BIGINT as n_langs,
       count(distinct source)::BIGINT as n_sources,
       min(n_chars)::BIGINT as min_chars,
       max(n_chars)::BIGINT as max_chars,
       round(sum(n_chars) / count(*), 2) as avg_chars
from documents
"""


def doc_interleaved_order(sf_dir: str) -> pd.DataFrame:
    """Language-interleaved training order: the k-th document of every
    language gets adjacent positions (round-robin by language) — the
    balanced data-loader schedule for multilingual training.  The
    within-language rank rides ONE range-sort via the prefix-scan
    machinery; each language's global base rank (a languages-sized
    table) is subtracted row-locally, and interleave_key =
    within_rank · n_langs + lang_code needs no second exchange."""
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "lang"])

    ranked = ordered_prefix_sum(
        ds,
        sort_cols=["lang", "doc_id"],
        value_col=None,
        out_col="rk",
        unique_col="doc_id",
    ).materialize()  # branched below (per-lang bases + final map)

    def base_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("lang", as_index=False)["rk"].min()
        return g.rename(columns={"rk": "base"})

    bases = (
        ranked.map_batches(base_partial, batch_format="pandas")
        .to_pandas()
        .groupby("lang")["base"].min()
        .sort_index()
    )
    langs = np.asarray(bases.index.to_numpy(), dtype=object)
    base_arr = bases.to_numpy(np.int64)
    n_langs = len(langs)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        code = np.searchsorted(langs, b["lang"].to_numpy(dtype=object))
        within = b["rk"].to_numpy(np.int64) - base_arr[code]
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "interleave_key": within * n_langs + code,
            }
        )

    out = ranked.map_batches(finish, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "interleave_key": "int64"})


DOC_INTERLEAVED_ORDER_SQL = """
select doc_id,
       (row_number() over (partition by lang order by doc_id) - 1)
         * (select count(distinct lang) from documents)
       + (dense_rank() over (order by lang) - 1) as interleave_key
from documents
"""


def doc_dup_ngram_fraction(sf_dir: str) -> pd.DataFrame:
    """RefinedWeb-style duplicate-n-gram fraction: per document, the
    share of its DISTINCT 3-gram shingles that also occur in another
    document — the graded cousin of binary near-dup detection.  Fully
    distributed, nothing broadcast: pass 1 explodes per-doc-distinct
    shingle hashes (a (hash, doc_id) projection, never text); the
    hot-shingle filter marks rows whose shingle has corpus df ≥ 2
    (bounded-bucket counting, the dedup machinery); both the total and
    the duplicated shingle counts per doc then combine in one bounded
    bucket pass.  Docs with < 3 tokens have no 3-grams and are absent
    (both engines).  Hashes stand in for shingle strings exactly as in
    the similarity joins (64-bit collisions negligible, same contract
    the jaccard oracles already verify)."""
    from ocr_poc_ray.functions.dedup import (
        _batch_token_hashes,
        _doc_shingle_hashes,
        _filter_hot_buckets,
    )

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        th, offsets = _batch_token_hashes(batch["text"])
        ids = batch["doc_id"].to_numpy(np.int64)
        out_ps, out_id = [], []
        for d in range(len(batch)):
            tok = th[offsets[d] : offsets[d + 1]]
            if len(tok) < 3:  # no 3-grams — absent on both engines
                continue
            sh = _doc_shingle_hashes(tok, 3)
            out_ps.append(sh)
            out_id.append(np.full(len(sh), ids[d], dtype=np.int64))
        if not out_ps:
            return pd.DataFrame({"ps": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"ps": np.concatenate(out_ps).view(np.int64),
             "doc_id": np.concatenate(out_id)}
        )

    exploded = ds.map_batches(explode, batch_format="pandas").materialize()
    hot, _sizes = _filter_hot_buckets(exploded, ["ps"])

    def count_all(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("doc_id", as_index=False).size()
        return pd.DataFrame({"doc_id": g["doc_id"], "m": g["size"],
                             "dup": np.zeros(len(g), dtype=np.int64)})

    def count_hot(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("doc_id", as_index=False).size()
        return pd.DataFrame({"doc_id": g["doc_id"],
                             "m": np.zeros(len(g), dtype=np.int64),
                             "dup": g["size"]})

    parts = exploded.map_batches(count_all, batch_format="pandas")
    if hot is not None:
        parts = parts.union(hot.map_batches(count_hot, batch_format="pandas"))

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_hb=(b["doc_id"] % 16).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", as_index=False).agg(
            m=("m", "sum"), dup=("dup", "sum")
        )
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"].astype("int64"),
                "n_shingles": agg["m"].astype("int64"),
                "dup_frac": np.round(
                    agg["dup"].to_numpy(np.float64)
                    / agg["m"].to_numpy(np.float64), 6
                ),
            }
        )

    out = (
        parts.map_batches(bucket, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "doc_id" not in out.columns:
        # 0-row to_pandas drops columns (CLAUDE.md pitfall): a corpus
        # with no ≥3-token docs still needs the typed empty frame
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_shingles": pd.Series([], dtype="int64"),
                             "dup_frac": pd.Series([], dtype="float64")})
    return out.astype(
        {"doc_id": "int64", "n_shingles": "int64", "dup_frac": "float64"}
    )


DOC_DUP_NGRAM_FRACTION_SQL = r"""
with t as (
  select doc_id, regexp_extract_all(lower(text), '\S+') as toks from documents
), g as (
  select doc_id, unnest(list_zip(toks[1:-3], toks[2:-2], toks[3:-1])) as tri
  from t where len(toks) >= 3
), d as (
  select distinct doc_id, tri from g
), df as (
  select tri, count(*) as df from d group by tri
)
select d.doc_id, count(*)::BIGINT as n_shingles,
       round(sum(case when df.df >= 2 then 1 else 0 end) / count(*), 6)
         as dup_frac
from d join df using (tri)
group by d.doc_id
"""


SPLIT_TRAIN_PCT, SPLIT_VAL_PCT = 90, 5  # train/val/test = 90/5/5


def doc_train_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test assignment by md5 fraction of
    doc_id — the split that stays stable across engines, runs,
    partitionings, and corpus growth (a doc's split never changes when
    other docs are added, unlike a seeded global shuffle).  Row-local;
    both engines compare the SAME integer md5 prefix against integer
    percent thresholds, so the boundary is exact."""
    import hashlib as _hl

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id"])

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        frac = np.asarray(
            [
                int(_hl.md5(str(i).encode()).hexdigest()[:8], 16) % 100
                for i in ids
            ]
        )
        split = np.where(
            frac < SPLIT_TRAIN_PCT,
            "train",
            np.where(frac < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val", "test"),
        )
        return pd.DataFrame({"doc_id": ids, "split": split.astype(object)})

    out = ds.map_batches(kernel, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64"})


DOC_TRAIN_SPLIT_SQL = f"""
select doc_id,
       case when ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::BIGINT
                 % 100 < {SPLIT_TRAIN_PCT} then 'train'
            when ('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::BIGINT
                 % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} then 'val'
            else 'test' end as split
from documents
"""


ZORDER_ROWS_PER_FILE = 100


def doc_zorder_layout(sf_dir: str) -> pd.DataFrame:
    """Z-order (Morton curve) data-layout assignment: interleave the
    bits of (length bucket, language code) so rows close in BOTH
    dimensions land in the same output file — the multi-dimensional
    clustering a lakehouse OPTIMIZE ZORDER performs, here as the write
    partitioner for a corpus re-layout.  Shape: the z-value is pure
    row-local bit math (language codes from a tiny broadcast of the
    sorted distinct languages); the file index is the global rank by
    (z, doc_id) — the one legitimate all-to-all, ridden on the
    prefix-scan machinery (one range-sort + O(blocks) offset combine).
    At 100 TB the file assignment IS the write plan: rows_per_file
    bounds every output file."""
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "lang", "n_chars"]
    )

    def lang_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b[["lang"]].drop_duplicates()

    langs = np.asarray(
        sorted(
            ds.map_batches(lang_partial, batch_format="pandas")
            .to_pandas()["lang"].drop_duplicates()
        ),
        dtype=object,
    )

    def add_z(b: pd.DataFrame) -> pd.DataFrame:
        x = np.minimum(b["n_chars"].to_numpy(np.int64) // 16, 255)
        y = np.searchsorted(langs, b["lang"].to_numpy(dtype=object)).astype(
            np.int64
        )
        z = np.zeros(len(b), dtype=np.int64)
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(np.int64), "zval": z}
        )

    ranked = ordered_prefix_sum(
        ds.map_batches(add_z, batch_format="pandas"),
        sort_cols=["zval", "doc_id"],
        value_col=None,
        out_col="rk",
        unique_col="doc_id",
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        rk = b["rk"].to_numpy(np.int64) - 1
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(np.int64),
                "zval": b["zval"].to_numpy(np.int64),
                "file_id": rk // ZORDER_ROWS_PER_FILE,
            }
        )

    out = ranked.map_batches(finish, batch_format="pandas").to_pandas()
    return out.astype({"doc_id": "int64", "zval": "int64", "file_id": "int64"})


def _zorder_sql() -> str:
    terms = " + ".join(
        f"((((least(n_chars // 16, 255)) >> {i}) & 1) << {2 * i})"
        f" + ((((dense_rank() over (order by lang) - 1)) >> {i} & 1) << {2 * i + 1})"
        for i in range(8)
    )
    return f"""
with z as (
  select doc_id, ({terms})::BIGINT as zval
  from documents
)
select doc_id, zval,
       ((row_number() over (order by zval, doc_id)) - 1)
         // {ZORDER_ROWS_PER_FILE} as file_id
from z
"""


DOC_ZORDER_SQL = _zorder_sql()


WEIGHTED_SAMPLE_K = 50


def doc_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES
    keys): each doc gets priority ln(u)/w with a deterministic
    md5-fraction u and weight w = n_chars; the global top-k by priority
    is exactly a weighted reservoir draw.  Shape: priorities are
    row-local, each batch keeps a local top-k, one k×blocks merge picks
    the final k — never a global sort, identical on any partitioning.
    Both engines compute u and the division as IEEE doubles on the same
    md5 bytes, so the selected set is bit-identical."""
    import hashlib as _hl

    k = WEIGHTED_SAMPLE_K
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "n_chars"])

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        w = np.maximum(b["n_chars"].to_numpy(np.float64), 1.0)
        u = np.asarray(
            [
                (int(_hl.md5(str(i).encode()).hexdigest()[:8], 16) + 1)
                / 4294967296.0
                for i in ids
            ]
        )
        pri = np.log(u) / w
        out = pd.DataFrame({"doc_id": ids, "priority": pri})
        return out.sort_values(
            ["priority", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    parts = ds.map_batches(local_topk, batch_format="pandas").to_pandas()
    out = parts.sort_values(
        ["priority", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out = out.reset_index(drop=True)
    out["priority"] = out["priority"].round(6)
    return out.astype({"doc_id": "int64", "priority": "float64"})


DOC_WEIGHTED_SAMPLE_SQL = f"""
select doc_id,
       round(ln((('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::BIGINT + 1)
                / 4294967296.0) / greatest(n_chars, 1), 6) as priority
from documents
order by ln((('0x' || substr(md5(cast(doc_id as varchar)), 1, 8))::BIGINT + 1)
            / 4294967296.0) / greatest(n_chars, 1) desc, doc_id
limit {WEIGHTED_SAMPLE_K}
"""


def doc_cdc_chunk_stats(sf_dir: str) -> pd.DataFrame:
    """Content-defined-chunking dedup accounting per source: total vs
    distinct gear-hash chunks and the duplicated-byte ratio.  Rows-only
    (the 16-tap rolling hash has no SQL mirror); golden-tested against a
    pure-python per-document reference in tests/test_cdc.py.  See
    ocr_poc_ray.functions.cdc for the determinism spec and the 100-TB
    shape (row-local chunk pass + bucketed distinct combine)."""
    from ocr_poc_ray.functions.cdc import cdc_source_stats

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["text", "source"])
    return cdc_source_stats(ds)


def doc_substring_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact repeated-substring removal (Lee et al. 2022) over 8-token
    overlapping windows: every non-first occurrence of a repeated
    window is masked and the document rebuilt from unmasked tokens —
    the suffix-array dedup of the paper as a linear window-hash
    projection + hot-window discovery + bounded loser selection
    (functions/dedup.py::substring_dedup).  The oracle re-derives the
    windows, the global first-occurrence rule, the per-doc coverage
    union AND the rebuilt text relationally (window hashing matches
    window text: 64-bit collisions negligible — the jaccard-oracle
    contract)."""
    from ocr_poc_ray.functions.dedup import substring_dedup

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = substring_dedup(ds, window=8).to_pandas()
    out = out[["doc_id", "n_tokens", "n_windows", "n_lost", "n_masked", "kept_text"]]
    return out.astype(
        {"doc_id": "int64", "n_tokens": "int64", "n_windows": "int64",
         "n_lost": "int64", "n_masked": "int64"}
    )


DOC_SUBSTRING_DEDUP_SQL = r"""
with toks as (
  select doc_id,
         regexp_extract_all(text, '\S+') as t_orig,
         regexp_extract_all(lower(text), '\S+') as t_low
  from documents
),
w as (
  select doc_id, unnest(generate_series(1, greatest(len(t_low) - 7, 0))) as i
  from toks
),
wins as (
  select w.doc_id, i, array_to_string(t.t_low[i:i+7], ' ') as win
  from w join toks t using (doc_id)
),
marked as (
  select doc_id, i,
         count(*) over (partition by win) as c,
         row_number() over (partition by win order by doc_id, i) as rn
  from wins
),
losers as (select doc_id, i from marked where c >= 2 and rn > 1),
cov as (
  select doc_id,
         list_sort(list_distinct(flatten(list(generate_series(i, i + 7))))) as cix
  from losers group by doc_id
)
select t.doc_id,
       len(t.t_orig)::BIGINT as n_tokens,
       greatest(len(t.t_orig) - 7, 0)::BIGINT as n_windows,
       coalesce(l.n_lost, 0)::BIGINT as n_lost,
       coalesce(len(c.cix), 0)::BIGINT as n_masked,
       coalesce(
           case when c.cix is null then array_to_string(t.t_orig, ' ')
                else array_to_string(
                    [t.t_orig[j] for j in generate_series(1, len(t.t_orig))
                     if not list_contains(c.cix, j)], ' ')
           end, '') as kept_text
from toks t
left join (
  select doc_id, count(*)::BIGINT as n_lost from losers group by doc_id
) l using (doc_id)
left join cov c using (doc_id)
"""


# ---------------------------------------------------------------------------
# PII scrub: redact emails / IPv4 / long digit runs, count per category
# (standard C4/RefinedWeb-style curation stage; row-local Arrow RE2
# projection, zero exchange).  The word-salad corpus contains no PII, so
# the oracle here is a full-text byte-equality identity check; the
# non-vacuous legs run over customer.c_name and events.props
# (queries/relational.py) and the synthetic-PII unit fixture.
# ---------------------------------------------------------------------------

def doc_pii_redact(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.pii import pii_scrub

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = pii_scrub(ds, "text", keep_cols=["doc_id"]).to_pandas()
    return out.astype(
        {"n_email": "int64", "n_ipv4": "int64", "n_id_digits": "int64"}
    )


def _doc_pii_redact_sql() -> str:
    from ocr_poc_ray.functions.pii import sql_count_exprs, sql_scrub_expr

    return f"""
select doc_id, {sql_scrub_expr('text')} as clean_text,
       {sql_count_exprs('text')}
from documents
"""


DOC_PII_REDACT_SQL = _doc_pii_redact_sql()


# ---------------------------------------------------------------------------
# Cross-source contamination matrix: pairwise Jaccard of the DISTINCT
# 3-gram shingle sets of every source pair — the corpus-level overlap
# audit that pairs with doc_decontaminate (is source A leaking into
# source B's "held-out" slice?).  Shape: one (shingle_hash, source)
# distinct projection (never text), hash-bucketed so each bucket task
# counts its per-source sizes and per-pair intersections with a
# vectorized self-merge; the driver only sees buckets × (S + S²/2)
# integer partial rows.  Hashes stand in for shingle strings under the
# same negligible-collision contract the jaccard oracles verify.
# ---------------------------------------------------------------------------

def doc_source_contamination(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.dedup import (
        _batch_token_hashes,
        _doc_shingle_hashes,
        _scaled_buckets,
    )

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["source", "text"])

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        th, offsets = _batch_token_hashes(batch["text"])
        srcs = batch["source"].to_numpy()
        out_ps, out_src = [], []
        for d in range(len(batch)):
            tok = th[offsets[d] : offsets[d + 1]]
            if len(tok) < 3:  # no 3-grams — absent on both engines
                continue
            sh = _doc_shingle_hashes(tok, 3)
            out_ps.append(sh)
            out_src.append(np.full(len(sh), srcs[d], dtype=object))
        if not out_ps:
            return pd.DataFrame(
                {"ps": pd.Series([], dtype="int64"),
                 "source": pd.Series([], dtype=object)}
            )
        b = pd.DataFrame(
            {"ps": np.concatenate(out_ps).view(np.int64),
             "source": np.concatenate(out_src)}
        )
        # measured no-win (r5 A/B): arrow dict-encoded group-by distinct
        # 283 ms vs this 295 ms at 2M rows — pandas stays
        return b.drop_duplicates()  # local (shingle, source) dedup

    # bucket count from an input-footprint hint (parquet bytes × ~8:
    # ~2× decompression × ~4× shingle-row expansion) — never a
    # corpus-sized materialize just to expose size metadata
    from ocr_poc_ray.functions.dedup import _paths_bytes

    exploded = ds.map_batches(explode, batch_format="pandas")
    nb = _scaled_buckets(exploded, bytes_hint=_paths_bytes(_docs_path(sf_dir)) * 8)

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_hb=(b["ps"] % nb).astype("int64"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["ps", "source"])
        sizes = d.groupby("source").size()
        size_rows = pd.DataFrame(
            {"source_a": sizes.index, "source_b": "", "n": sizes.to_numpy()}
        )
        pairs = d.merge(d, on="ps")
        pairs = pairs[pairs["source_x"] < pairs["source_y"]]
        inter = pairs.groupby(["source_x", "source_y"], as_index=False).size()
        pair_rows = pd.DataFrame(
            {"source_a": inter["source_x"], "source_b": inter["source_y"],
             "n": inter["size"]}
        )
        return pd.concat([size_rows, pair_rows], ignore_index=True)

    empty = pd.DataFrame(
        {"source_a": pd.Series([], dtype=object),
         "source_b": pd.Series([], dtype=object),
         "n_a": pd.Series([], dtype="int64"),
         "n_b": pd.Series([], dtype="int64"),
         "n_common": pd.Series([], dtype="int64"),
         "jaccard": pd.Series([], dtype="float64")}
    )
    partials = (
        exploded.map_batches(bucket, batch_format="pandas")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # buckets × (S + S²/2) integer rows — result-sized
    )
    if partials.empty:  # no doc had 3 tokens (0-row to_pandas drops cols)
        return empty
    agg = partials.groupby(["source_a", "source_b"], as_index=False)["n"].sum()
    sizes = agg[agg["source_b"] == ""].set_index("source_a")["n"]
    inter = {
        (r.source_a, r.source_b): int(r.n)
        for r in agg[agg["source_b"] != ""].itertuples()
    }
    srcs = sorted(sizes.index)
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            n_a, n_b = int(sizes[a]), int(sizes[b])
            n_common = inter.get((a, b), 0)
            rows.append(
                {
                    "source_a": a,
                    "source_b": b,
                    "n_a": n_a,
                    "n_b": n_b,
                    "n_common": n_common,
                    "jaccard": round(n_common / (n_a + n_b - n_common), 6),
                }
            )
    if not rows:  # fewer than two sources with any 3-gram docs
        return empty
    return pd.DataFrame(rows).astype(
        {"n_a": "int64", "n_b": "int64", "n_common": "int64",
         "jaccard": "float64"}
    )


DOC_SOURCE_CONTAMINATION_SQL = r"""
with t as (
  select source, regexp_extract_all(lower(text), '\S+') as toks from documents
), g as (
  select source, unnest(list_zip(toks[1:-3], toks[2:-2], toks[3:-1])) as tri
  from t where len(toks) >= 3
), d as (
  select distinct source, tri from g
), sz as (
  select source, count(*) as n from d group by source
), inter as (
  select a.source as source_a, b.source as source_b, count(*) as n_common
  from d a join d b on a.tri = b.tri and a.source < b.source
  group by a.source, b.source
)
select sa.source as source_a, sb.source as source_b,
       sa.n::BIGINT as n_a, sb.n::BIGINT as n_b,
       coalesce(i.n_common, 0)::BIGINT as n_common,
       round(coalesce(i.n_common, 0)
             / (sa.n + sb.n - coalesce(i.n_common, 0)), 6) as jaccard
from sz sa
join sz sb on sa.source < sb.source
left join inter i on i.source_a = sa.source and i.source_b = sb.source
"""


# ---------------------------------------------------------------------------
# Grouped heavy hitters: exact top-k tokens PER SOURCE (per-stratum
# vocabulary audit).  Tokens hash-bucket as in top_tokens, so each
# bucket task holds vocabulary/n_buckets rows of EVERY source and emits
# a per-source candidate top-k; the final per-source rank sees only
# buckets × sources × k candidate rows.
# ---------------------------------------------------------------------------

TOP_TOKENS_PER_SOURCE_K = 5


def doc_top_tokens_per_source(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.dedup import _scaled_buckets

    k = TOP_TOKENS_PER_SOURCE_K
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["source", "text"])
    nb = _scaled_buckets(ds, floor=16)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split()
        lens = toks.str.len().to_numpy()
        flat = np.concatenate(toks.to_numpy()) if lens.sum() else np.array([], object)
        g = pd.DataFrame(
            {"source": batch["source"].to_numpy().repeat(lens), "token": flat}
        ).groupby(["source", "token"], as_index=False).size()
        g = g.rename(columns={"size": "cnt"})
        g["_hb"] = (
            pd.util.hash_array(g["token"].to_numpy(object)) % nb
        ).astype("int64")
        return g

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(["source", "token"], as_index=False)["cnt"].sum()
        return (
            agg.sort_values(
                ["source", "cnt", "token"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("source")
            .head(k)
        )

    cands = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()  # buckets × sources × k candidate rows
    )
    if cands.empty:  # 0-row to_pandas drops columns (CLAUDE.md)
        return pd.DataFrame(
            {"source": pd.Series([], dtype=object),
             "rank": pd.Series([], dtype="int64"),
             "token": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64")}
        )
    out = (
        cands.sort_values(
            ["source", "cnt", "token"], ascending=[True, False, True],
            kind="mergesort",
        )
        .groupby("source")
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("source").cumcount() + 1
    out = out.rename(columns={"cnt": "n"})
    return out[["source", "rank", "token", "n"]].astype(
        {"rank": "int64", "n": "int64"}
    )


DOC_TOP_TOKENS_PER_SOURCE_SQL = rf"""
with t as (
  select source, unnest(regexp_extract_all(lower(text), '\S+')) as token
  from documents
), c as (
  select source, token, count(*)::BIGINT as n from t group by 1, 2
)
select source,
       row_number() over (partition by source order by n desc, token)
           as rank,
       token, n
from c
qualify rank <= {TOP_TOKENS_PER_SOURCE_K}
"""


def doc_source_ttr(sf_dir: str) -> pd.DataFrame:
    """Vocabulary-richness audit per source: token count, distinct
    tokens, hapax count (tokens occurring once IN THAT SOURCE) and the
    type-token ratio — the cheap lexical-diversity screen that flags
    template-stamped or looped scrapes (low TTR) next to organic text.
    One (source, token) count projection, hash-bucketed so every token
    lives wholly in one combine task; per-source scalars leave each
    bucket as 4-column partials (nothing vocabulary-sized reaches the
    driver).  TTR reported ×1e6 as an exact integer ratio floor to
    avoid any float-division rounding divergence."""
    import pyarrow.compute as pc

    from ocr_poc_ray.functions.dedup import _scaled_buckets

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["source", "text"])
    nb = _scaled_buckets(ds, floor=16)

    def partial(batch: pa.Table) -> pd.DataFrame:
        text = pc.utf8_trim_whitespace(pc.utf8_lower(batch["text"]))
        toks = pc.utf8_split_whitespace(text)
        n_tok = pc.list_value_length(toks).to_numpy()
        src = batch["source"].to_pandas().to_numpy(dtype=object)
        flat = pd.DataFrame(
            {
                "source": np.repeat(src, n_tok),
                "token": pc.list_flatten(toks).to_pandas(),
            }
        )
        flat = flat[flat["token"] != ""]
        g = flat.groupby(["source", "token"], as_index=False).size()
        mix = pd.util.hash_array(g["token"].to_numpy(dtype=object))
        return g.rename(columns={"size": "n"}).assign(
            _hb=(mix % nb).astype("int64")
        )

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["source", "token"], as_index=False)["n"].sum()
        out = agg.groupby("source", as_index=False).agg(
            n_tokens=("n", "sum"),
            n_types=("n", "size"),
            n_hapax=("n", lambda x: int((x == 1).sum())),
        )
        return out

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(bucket_stats, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("source", as_index=False).agg(
        n_tokens=("n_tokens", "sum"), n_types=("n_types", "sum"),
        n_hapax=("n_hapax", "sum")
    )
    agg["ttr_ppm"] = (agg["n_types"] * 1_000_000) // agg["n_tokens"]
    for c in ("n_tokens", "n_types", "n_hapax", "ttr_ppm"):
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("source").reset_index(drop=True)


DOC_SOURCE_TTR_SQL = r"""
with tok as (
  select source, unnest(regexp_extract_all(lower(text), '\S+')) as token
  from documents
), st as (
  select source, token, count(*) as n from tok group by source, token
)
select source,
       sum(n)::BIGINT as n_tokens,
       count(*)::BIGINT as n_types,
       count(*) filter (where n = 1)::BIGINT as n_hapax,
       ((count(*) * 1000000) // sum(n))::BIGINT as ttr_ppm
from st group by source
order by source
"""


WINNOW_K, WINNOW_W = 5, 4


def doc_winnow_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): md5 the K=5-token k-grams, slide a W=4 window over the
    hash sequence, select the RIGHTMOST minimal hash per window — the
    guarantee-bearing local fingerprint scheme (any match of length
    ≥ K+W-1 tokens shares a selected fingerprint, with bounded density
    ~2/(W+1)).  Entirely row-local — the 100-TB shape is embarrassingly
    parallel hashing; overlap detection downstream is a (fp, doc)
    projection into the existing contamination machinery.  Docs with
    fewer hashes than the window select their global min (the standard
    short-document rule, mirrored in SQL)."""
    import hashlib

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def winnow(batch: pa.Table) -> pd.DataFrame:
        out_id, out_g, out_s, out_d, out_m = [], [], [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_numpy(), batch["text"].to_pylist()
        ):
            toks = text.lower().split()
            m = len(toks) - WINNOW_K + 1
            if m < 1:
                continue
            hs = [
                hashlib.md5(" ".join(toks[i : i + WINNOW_K]).encode()).hexdigest()
                for i in range(m)
            ]
            sel = set()
            for j in range(max(m - WINNOW_W + 1, 1)):
                win = hs[j : j + WINNOW_W]
                mn = min(win)
                # rightmost occurrence of the window minimum
                idx = len(win) - 1 - win[::-1].index(mn)
                sel.add(j + idx)
            fps = [hs[p] for p in sel]
            out_id.append(int(doc_id))
            out_g.append(m)
            out_s.append(len(sel))
            out_d.append(len(set(fps)))
            out_m.append(min(fps))
        return pd.DataFrame(
            {
                "doc_id": pd.array(out_id, dtype="int64"),
                "n_grams": pd.array(out_g, dtype="int64"),
                "n_selected": pd.array(out_s, dtype="int64"),
                "n_distinct_fps": pd.array(out_d, dtype="int64"),
                "min_fp": pd.array(out_m, dtype=object),
            }
        )

    out = ds.map_batches(winnow, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_WINNOW_FINGERPRINTS_SQL = r"""
with tok as (
  select doc_id, regexp_extract_all(lower(text), '\S+') as t from documents
), g as (
  select doc_id,
         list_transform(generate_series(1, len(t) - 4),
                        i -> md5(array_to_string(t[i:i+4], ' '))) as hs
  from tok where len(t) >= 5
), sel as (
  select doc_id, hs,
         list_distinct(list_transform(generate_series(1, greatest(len(hs) - 3, 1)),
            j -> j + len(hs[j:j+3])
                 - list_position(list_reverse(hs[j:j+3]),
                                 list_aggregate(hs[j:j+3], 'min')))) as pos
  from g
)
select doc_id,
       len(hs)::BIGINT as n_grams,
       len(pos)::BIGINT as n_selected,
       len(list_distinct(list_transform(pos, p -> hs[p])))::BIGINT as n_distinct_fps,
       list_aggregate(list_transform(pos, p -> hs[p]), 'min') as min_fp
from sel order by doc_id
"""


def doc_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """Corpus snapshot diff — the between-crawls audit: which docs were
    added, removed, changed, or untouched per source.  The two
    snapshots derive deterministically from the documents table (OLD
    drops doc_id % 11 == 0, NEW drops % 13 == 0 and rewrites the text
    of % 7 == 0) but flow through the engine as two INDEPENDENT
    fingerprinted datasets co-grouped on doc_id in bounded hash buckets
    — the honest distributed diff shape that works when the snapshots
    are two different 100-TB file sets, never a row-local shortcut.
    Per-source counts leave each bucket as 4-column partials; the
    combine is source-cardinality sized."""
    import hashlib

    from ocr_poc_ray.functions.dedup import _scaled_buckets

    base = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "source", "text"]
    )
    nb = _scaled_buckets(base, floor=16)

    def old_rows(b: pa.Table) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        keep = ids % 11 != 0
        return pd.DataFrame(
            {
                "doc_id": ids[keep],
                "source": b["source"].to_pandas().to_numpy(dtype=object)[keep],
                "fp": [
                    hashlib.md5(t.encode()).hexdigest()
                    for t, k in zip(b["text"].to_pylist(), keep) if k
                ],
                "side": 0,
            }
        )

    def new_rows(b: pa.Table) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        keep = ids % 13 != 0
        texts = [
            (t + " v2") if i % 7 == 0 else t
            for t, i, k in zip(b["text"].to_pylist(), ids, keep) if k
        ]
        return pd.DataFrame(
            {
                "doc_id": ids[keep],
                "source": b["source"].to_pandas().to_numpy(dtype=object)[keep],
                "fp": [hashlib.md5(t.encode()).hexdigest() for t in texts],
                "side": 1,
            }
        )

    tagged = base.map_batches(old_rows, batch_format="pyarrow").union(
        base.map_batches(new_rows, batch_format="pyarrow")
    )

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_hb=(b["doc_id"] % nb).astype("int64"))

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["doc_id", "source", "fp"]]
        n = g[g["side"] == 1][["doc_id", "source", "fp"]]
        m = o.merge(n, on="doc_id", how="outer", suffixes=("_o", "_n"))
        src = m["source_o"].where(m["source_o"].notna(), m["source_n"])
        added = m["fp_o"].isna()
        removed = m["fp_n"].isna()
        changed = ~added & ~removed & (m["fp_o"] != m["fp_n"])
        unchanged = ~added & ~removed & ~changed
        d = pd.DataFrame(
            {"source": src, "n_added": added, "n_removed": removed,
             "n_changed": changed, "n_unchanged": unchanged}
        )
        return d.groupby("source", as_index=False).sum()

    parts = (
        tagged.map_batches(bucket, batch_format="pandas")
        .groupby("_hb")
        .map_groups(diff_bucket, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("source", as_index=False).sum()
    for c in ("n_added", "n_removed", "n_changed", "n_unchanged"):
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("source").reset_index(drop=True)


DOC_SNAPSHOT_DIFF_SQL = """
with old as (
  select doc_id, source, md5(text) as fp from documents where doc_id % 11 <> 0
), new as (
  select doc_id, source,
         md5(case when doc_id % 7 = 0 then text || ' v2' else text end) as fp
  from documents where doc_id % 13 <> 0
)
select coalesce(o.source, n.source) as source,
       count(*) filter (where o.doc_id is null)::BIGINT as n_added,
       count(*) filter (where n.doc_id is null)::BIGINT as n_removed,
       count(*) filter (where o.doc_id is not null and n.doc_id is not null
                        and o.fp <> n.fp)::BIGINT as n_changed,
       count(*) filter (where o.fp = n.fp)::BIGINT as n_unchanged
from old o full outer join new n on o.doc_id = n.doc_id
group by 1
order by 1
"""


def doc_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Incremental-ingest dedup — the append-mode operation a crawl
    pipeline runs every batch: new shard docs are kept only if their
    content fingerprint is UNSEEN in the existing corpus.  Base corpus
    = doc_id % 5 != 0, incoming shard = doc_id % 5 == 0 (a fixed split
    of the same table so the oracle can re-derive it).  Both sides
    fingerprint row-locally (md5 of the text); the incoming side is
    anti-joined against the base fingerprints through
    ``membership_flag``'s broadcast-vs-bloom size switch — at crawl
    scale the base fingerprint set never reaches the driver."""
    import hashlib

    from ocr_poc_ray.functions.dedup import membership_flag

    def fp(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        dg = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()]
        return pd.DataFrame({"doc_id": ids, "fp": dg})

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    fps = ds.map_batches(fp, batch_format="pyarrow").materialize()  # feeds both sides

    base = fps.map_batches(
        lambda b: b.loc[b["doc_id"] % 5 != 0, ["fp"]].drop_duplicates(),
        batch_format="pandas",
    )
    incoming = fps.map_batches(
        lambda b: b[b["doc_id"] % 5 == 0], batch_format="pandas"
    )
    flagged = membership_flag(incoming, "fp", base, "fp")
    out = flagged.map_batches(
        lambda b: b.loc[~b["_in_set"], ["doc_id"]], batch_format="pandas"
    ).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64"})


DOC_INCREMENTAL_DEDUP_SQL = """
select i.doc_id
from documents i
where i.doc_id % 5 = 0
  and not exists (
    select 1 from documents b
    where b.doc_id % 5 <> 0 and md5(b.text) = md5(i.text)
  )
order by i.doc_id
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling"): score every document by the
# log-likelihood ratio of a hashed-unigram bag-of-words model of a
# TARGET distribution (here: the lang='en' slice) against the raw
# corpus.  Selection then resamples by weight — the standard
# pretraining-mix targeting operator.
#
# Scale shape: one pass builds the two B-bucket count vectors (per-batch
# partials → a native groupby over exactly B keys — bounded regardless
# of corpus size); the B-float log-ratio table broadcasts once
# (``ray.put``) and the second pass scores each doc row-locally.  Both
# engines hash tokens with the md5-prefix rule (CLAUDE.md md5-parity).
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def _md5_buckets(tokens: np.ndarray, n_buckets: int) -> np.ndarray:
    """md5-prefix bucket id per token — hash DISTINCT tokens once per
    batch (the batch vocabulary), then map back via the inverse index."""
    import hashlib as _hl

    if len(tokens) == 0:
        return np.zeros(0, dtype=np.int64)
    uniq, inv = np.unique(tokens, return_inverse=True)
    ub = np.fromiter(
        (
            int(_hl.md5(t.encode("utf-8", "ignore")).hexdigest()[:8], 16) % n_buckets
            for t in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    return ub[inv]


def doc_dsir_weights(sf_dir: str) -> pd.DataFrame:
    import ray as _ray

    B = DSIR_BUCKETS
    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text", "lang"]
    )

    def _flat_tokens(batch: pd.DataFrame):
        toks = batch["text"].str.lower().str.split()
        lens = toks.str.len().to_numpy()
        flat = (
            np.concatenate(toks.to_numpy())
            if lens.sum()
            else np.array([], dtype=object)
        )
        return flat, lens

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        flat, lens = _flat_tokens(batch)
        is_tgt = np.repeat(
            batch["lang"].to_numpy(dtype=object) == DSIR_TARGET_LANG, lens
        )
        b = _md5_buckets(flat, B)
        g = pd.DataFrame(
            {"b": b, "n_raw": np.ones(len(b), dtype=np.int64),
             "n_tgt": is_tgt.astype(np.int64)}
        )
        return g.groupby("b", as_index=False).sum()

    counts = (
        ds.map_batches(count_partial, batch_format="pandas")
        .groupby("b")
        .sum(["n_raw", "n_tgt"])
        .to_pandas()
    )
    n_raw = np.zeros(B, dtype=np.float64)
    n_tgt = np.zeros(B, dtype=np.float64)
    if len(counts):
        n_raw[counts["b"].to_numpy(np.int64)] = counts["sum(n_raw)"].to_numpy()
        n_tgt[counts["b"].to_numpy(np.int64)] = counts["sum(n_tgt)"].to_numpy()
    nr, nt = n_raw.sum(), n_tgt.sum()
    llr = np.log((n_tgt + 1.0) / (nt + B)) - np.log((n_raw + 1.0) / (nr + B))
    llr_ref = _ray.put(llr)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        lr = _ray.get(llr_ref)
        flat, lens = _flat_tokens(batch)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        w = np.zeros(len(lens), dtype=np.float64)
        np.add.at(w, doc_idx, lr[_md5_buckets(flat, B)])
        m = lens > 0  # docs with no tokens drop (SQL inner-join semantics)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(np.int64)[m],
                "dsir_logw": np.round(w[m], 2),
            }
        )

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "dsir_logw": pd.Series([], dtype="float64")}
        )
    return out.astype({"doc_id": "int64", "dsir_logw": "float64"})


DOC_DSIR_WEIGHTS_SQL = rf"""
with tok as (
  select doc_id, lang, unnest(regexp_extract_all(lower(text), '\S+')) as token
  from documents
), tb as (
  select doc_id,
         lang,
         ('0x' || substr(md5(token), 1, 8))::BIGINT % {DSIR_BUCKETS} as b
  from tok
), cnt as (
  select b,
         count(*)::DOUBLE as n_raw,
         count(*) filter (where lang = '{DSIR_TARGET_LANG}')::DOUBLE as n_tgt
  from tb group by b
), tot as (
  select sum(n_raw) as nr, sum(n_tgt) as nt from cnt
), lr as (
  select b,
         ln((n_tgt + 1) / (nt + {DSIR_BUCKETS}))
           - ln((n_raw + 1) / (nr + {DSIR_BUCKETS})) as llr
  from cnt cross join tot
)
select tb.doc_id, round(sum(lr.llr), 2) as dsir_logw
from tb join lr using (b)
group by tb.doc_id
"""


# ---------------------------------------------------------------------------
# Soft deduplication (inverse-multiplicity reweighting): instead of
# DROPPING exact duplicates, every document keeps sampling weight 1/n
# where n is its md5(text) duplicate-group size — the "SoftDedup"
# reweighting scheme (She et al. 2024) that preserves high-quality
# repeated text at reduced emphasis instead of deleting it.
#
# Scale shape: duplicate-group sizes come from the same bounded-bucket
# discovery exact_dedup uses (only hashes with n >= 2 survive — the
# true-duplicate volume, small relative to the corpus); the weight
# attach broadcasts the (hash, n) table when it fits and switches to a
# capped partitioned left join above BROADCAST_KEY_LIMIT.
# ---------------------------------------------------------------------------


def doc_soft_dedup_weights(sf_dir: str) -> pd.DataFrame:
    import hashlib as _hl

    import ray as _ray

    from ocr_poc_ray.functions.dedup import (
        BROADCAST_KEY_LIMIT,
        _join_parallelism,
        _scaled_buckets,
    )

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    nb = _scaled_buckets(ds, floor=16)

    def _hashes(texts: list) -> np.ndarray:
        return np.array(
            [_hl.md5((t or "").encode("utf-8", "ignore")).hexdigest() for t in texts],
            dtype="U32",
        )

    def hash_partial(batch: pa.Table) -> pd.DataFrame:
        g = (
            pd.DataFrame({"h": _hashes(batch["text"].to_pylist())})
            .groupby("h", as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        g["_hb"] = (
            pd.util.hash_array(g["h"].to_numpy(dtype=object)) % nb
        ).astype("int64")
        return g

    def bucket_dups(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("h", as_index=False)["c"].sum()
        return agg[agg["c"] >= 2]

    dups = (
        ds.map_batches(hash_partial, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(bucket_dups, batch_format="pandas")
        .materialize()  # counted, then read by whichever attach path runs
    )
    n_dup_hashes = dups.count()

    def _finish(ids: np.ndarray, n: np.ndarray) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": ids.astype(np.int64),
                "dup_count": n.astype(np.int64),
                "soft_weight": np.round(1.0 / n.astype(np.float64), 6),
            }
        )

    if n_dup_hashes <= BROADCAST_KEY_LIMIT:
        dup_df = dups.to_pandas()
        keys = (
            dup_df["h"].to_numpy(dtype="U32")
            if len(dup_df)
            else np.array([], dtype="U32")
        )
        cnts = (
            dup_df["c"].to_numpy(np.int64) if len(dup_df) else np.array([], np.int64)
        )
        order = np.argsort(keys)
        kref = _ray.put(keys[order])
        cref = _ray.put(cnts[order])

        def attach(batch: pa.Table) -> pd.DataFrame:
            k, c = _ray.get(kref), _ray.get(cref)
            h = _hashes(batch["text"].to_pylist())
            n = np.ones(len(h), dtype=np.int64)
            if len(k) and len(h):
                pos = np.minimum(np.searchsorted(k, h), len(k) - 1)
                hit = k[pos] == h
                n[hit] = c[pos[hit]]
            return _finish(batch["doc_id"].to_numpy(), n)

        out = ds.map_batches(attach, batch_format="pyarrow").to_pandas()
    else:
        jp = _join_parallelism(nb)
        keyed = ds.map_batches(
            lambda b: pd.DataFrame(
                {"doc_id": b["doc_id"].to_numpy(),
                 "h": _hashes(b["text"].to_pylist())}
            ),
            batch_format="pyarrow",
        )
        joined = keyed.repartition(jp).join(
            dups.repartition(jp), "left_outer", num_partitions=jp, on=("h",)
        )
        out = joined.map_batches(
            lambda b: _finish(
                b["doc_id"].to_numpy(), b["c"].fillna(1).to_numpy(np.int64)
            ),
            batch_format="pandas",
        ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "dup_count": pd.Series([], dtype="int64"),
             "soft_weight": pd.Series([], dtype="float64")}
        )
    return out.astype(
        {"doc_id": "int64", "dup_count": "int64", "soft_weight": "float64"}
    )


DOC_SOFT_DEDUP_WEIGHTS_SQL = """
with c as (
  select md5(text) as h, count(*)::BIGINT as n from documents group by 1
)
select d.doc_id, c.n as dup_count, round(1.0 / c.n, 6) as soft_weight
from documents d join c on md5(d.text) = c.h
"""


# ---------------------------------------------------------------------------
# First-iteration BPE merge census (Sennrich et al. 2016 operate on
# characters; over a whitespace-pretokenized corpus the same counting
# step ranks ADJACENT TOKEN PAIRS): the global top-K bigram merges a
# tokenizer trainer would apply first.  Per-batch pair counts →
# hash-bucketed combine (every pair lives wholly in one bucket task) →
# per-bucket top-K partials → one K × buckets driver merge.  Nothing
# vocabulary-sized leaves a task.
# ---------------------------------------------------------------------------

BPE_TOP_PAIRS_K = 30


def doc_bpe_top_pairs(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.dedup import _scaled_buckets

    k = BPE_TOP_PAIRS_K
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["text"])
    nb = _scaled_buckets(ds, floor=16)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split()
        lens = toks.str.len().to_numpy()
        flat = (
            np.concatenate(toks.to_numpy())
            if lens.sum()
            else np.array([], dtype=object)
        )
        empty = pd.DataFrame(
            {"t1": pd.Series([], dtype=object), "t2": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64"), "_hb": pd.Series([], dtype="int64")}
        )
        if len(flat) < 2:
            return empty
        # a position pairs with its successor unless it ends a document
        last = np.zeros(len(flat), dtype=bool)
        ends = np.cumsum(lens)
        last[ends[lens > 0] - 1] = True
        sel = ~last[:-1]
        if not sel.any():
            return empty
        g = (
            pd.DataFrame({"t1": flat[:-1][sel], "t2": flat[1:][sel]})
            .groupby(["t1", "t2"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        # separator only affects BUCKETING (collisions are harmless)
        mix = pd.util.hash_array(
            (g["t1"] + "\x1f" + g["t2"]).to_numpy(dtype=object)
        )
        return g.assign(_hb=(mix % nb).astype("int64"), n=g["n"].astype("int64"))

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        agg = group.groupby(["t1", "t2"], as_index=False)["n"].sum()
        return agg.sort_values(
            ["n", "t1", "t2"], ascending=[False, True, True], kind="mergesort"
        ).head(k)

    cands = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    if cands.empty:  # 0-row to_pandas drops columns (CLAUDE.md)
        return pd.DataFrame(
            {"rank": pd.Series([], dtype="int64"),
             "t1": pd.Series([], dtype=object),
             "t2": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64")}
        )
    out = (
        cands.sort_values(
            ["n", "t1", "t2"], ascending=[False, True, True], kind="mergesort"
        )
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "t1", "t2", "n"]].astype({"rank": "int64", "n": "int64"})


DOC_BPE_TOP_PAIRS_SQL = rf"""
with l as (
  select regexp_extract_all(lower(text), '\S+') as toks from documents
), p as (
  select unnest(list_zip(toks[1:length(toks)-1], toks[2:length(toks)])) as pr
  from l where length(toks) >= 2
), c as (
  select pr[1] as t1, pr[2] as t2, count(*)::BIGINT as n from p group by 1, 2
)
select row_number() over (order by n desc, t1, t2) as rank, t1, t2, n
from c
qualify rank <= {BPE_TOP_PAIRS_K}
"""


# ---------------------------------------------------------------------------
# Full BPE tokenizer training over the corpus: ONE distributed pass
# reduces the corpus to a word-frequency table (bounded-bucket
# vocabulary combine, per-bucket top-shard cap so the driver table is
# capped at BPE_TOP_V regardless of crawl vocabulary), then the classic
# Sennrich merge loop runs locally over that table — vocabulary-sized
# work, never corpus-sized.  Iterative and therefore not
# SQL-expressible (rows-only); the golden tests pin the learned merges
# against an independent brute-force trainer and partition invariance.
# ---------------------------------------------------------------------------

BPE_N_MERGES = 30
BPE_TOP_V = 4096


def doc_bpe_learn(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.bpe import bpe_train, word_frequency_table

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["text"])
    wf = word_frequency_table(ds, top_v=BPE_TOP_V)
    return bpe_train(wf, BPE_N_MERGES)


def doc_bpe_tokenize(sf_dir: str) -> pd.DataFrame:
    """Learn-then-APPLY tokenizer loop: train the BPE merge table on
    the corpus word-frequency census (doc_bpe_learn's path), broadcast
    it once, and tokenize the whole corpus with a stateful ACTOR POOL
    (`functions/bpe.py::BpeTokenizer` — merge table fetched once per
    actor, distinct-word → token-count cache lives across batches,
    the seat a real sentencepiece/tiktoken tokenizer occupies).
    Returns the per-source tokenization economics (docs / words / BPE
    tokens / tokens-per-word) — the table that drives token-budget
    planning for a training mixture.  Deterministic (greedy BPE is
    exact, integer counts), but the merge LEARNING isn't
    SQL-expressible, so rows-only; the per-word exactness contract
    (actor output == driver-side bpe_encode recomputation) is in
    tests/test_bpe.py."""
    import ray as _ray

    from ocr_poc_ray.functions.bpe import (
        BpeTokenizer,
        bpe_train,
        word_frequency_table,
    )

    ds = ray.data.read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text", "source"]
    )
    wf = word_frequency_table(ds, top_v=BPE_TOP_V)
    merges_ref = _ray.put(bpe_train(wf, BPE_N_MERGES))
    per_doc = ds.map_batches(
        BpeTokenizer,
        fn_constructor_kwargs={
            "merges_ref": merges_ref,
            "keep_cols": ("source",),
        },
        batch_format="pandas",
        concurrency=(1, 4),
    )

    def source_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("source", as_index=False).agg(
            n_docs=("doc_id", "size"),
            n_words=("n_words", "sum"),
            n_bpe_tokens=("n_bpe_tokens", "sum"),
        )

    parts = per_doc.map_batches(
        source_partial, batch_format="pandas"
    ).to_pandas()
    rep = parts.groupby("source", as_index=False).agg(
        n_docs=("n_docs", "sum"),
        n_words=("n_words", "sum"),
        n_bpe_tokens=("n_bpe_tokens", "sum"),
    )
    rep["tokens_per_word"] = np.where(
        rep["n_words"] > 0, rep["n_bpe_tokens"] / rep["n_words"], 0.0
    ).round(4)
    return (
        rep.astype(
            {"source": object, "n_docs": "int64", "n_words": "int64",
             "n_bpe_tokens": "int64", "tokens_per_word": "float64"}
        )
        .sort_values("source", kind="mergesort")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Per-document n-gram novelty: the fraction of a document's distinct
# 3-token shingles whose FIRST corpus occurrence (min doc_id) is this
# document — the incremental-contribution profile that separates
# original content from remixes during curation.  Shingles hash to
# int64 (the same negligible-collision contract the jaccard oracles
# verify); each shingle lives wholly in one bucket task, which sees
# every (doc, shingle) holder and emits per-doc (n_shingles, n_novel)
# partials; a second doc-bucketed combine sums them.  Nothing
# vocabulary- or corpus-sized reaches the driver before the per-doc
# result itself.
# ---------------------------------------------------------------------------


def doc_ngram_novelty(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.dedup import (
        _batch_token_hashes,
        _doc_shingle_hashes,
        _paths_bytes,
        _scaled_buckets,
    )

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    nb = _scaled_buckets(ds, bytes_hint=_paths_bytes(_docs_path(sf_dir)) * 8,
                         floor=16)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        th, offsets = _batch_token_hashes(batch["text"])
        ids = batch["doc_id"].to_numpy(np.int64)
        out_ps, out_id = [], []
        for d in range(len(batch)):
            tok = th[offsets[d] : offsets[d + 1]]
            if len(tok) < 3:  # no 3-grams — absent on both engines
                continue
            sh = np.unique(_doc_shingle_hashes(tok, 3))
            out_ps.append(sh)
            out_id.append(np.full(len(sh), ids[d], dtype=np.int64))
        if not out_ps:
            return pd.DataFrame(
                {"ps": pd.Series([], dtype="int64"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "_hb": pd.Series([], dtype="int64")}
            )
        b = pd.DataFrame(
            {"ps": np.concatenate(out_ps).view(np.int64),
             "doc_id": np.concatenate(out_id)}
        )
        return b.assign(_hb=(b["ps"] % nb).astype("int64"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        win = g.groupby("ps")["doc_id"].transform("min")
        part = pd.DataFrame(
            {"doc_id": g["doc_id"],
             "n_sh": np.ones(len(g), dtype=np.int64),
             "n_novel": (g["doc_id"].to_numpy() == win.to_numpy()).astype(np.int64)}
        ).groupby("doc_id", as_index=False).sum()
        part["_db"] = (part["doc_id"].to_numpy() % nb).astype(np.int64)
        return part

    def doc_combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", as_index=False).agg(
            n_shingles=("n_sh", "sum"), n_novel=("n_novel", "sum")
        )
        agg["novelty"] = np.round(
            agg["n_novel"].to_numpy(np.float64)
            / agg["n_shingles"].to_numpy(np.float64),
            6,
        )
        return agg

    out = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("_hb")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("_db")
        .map_groups(doc_combine, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:  # 0-row to_pandas drops columns (CLAUDE.md)
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "n_shingles": pd.Series([], dtype="int64"),
             "n_novel": pd.Series([], dtype="int64"),
             "novelty": pd.Series([], dtype="float64")}
        )
    out = out[["doc_id", "n_shingles", "n_novel", "novelty"]]
    return out.astype(
        {"doc_id": "int64", "n_shingles": "int64", "n_novel": "int64",
         "novelty": "float64"}
    )


DOC_NGRAM_NOVELTY_SQL = r"""
with t as (
  select doc_id, regexp_extract_all(lower(text), '\S+') as toks from documents
), g as (
  select doc_id, unnest(list_zip(toks[1:-3], toks[2:-2], toks[3:-1])) as tri
  from t where len(toks) >= 3
), d as (
  select distinct doc_id, tri from g
), w as (
  select tri, min(doc_id) as win from d group by tri
)
select d.doc_id,
       count(*)::BIGINT as n_shingles,
       count(*) filter (where w.win = d.doc_id)::BIGINT as n_novel,
       round(count(*) filter (where w.win = d.doc_id)::DOUBLE / count(*), 6)
           as novelty
from d join w using (tri)
group by d.doc_id
"""


# ---------------------------------------------------------------------------
# Sketched cross-source contamination (bottom-k set signatures): the
# scale path paired with the exact matrix above.  The exact
# ``doc_source_contamination`` ships every distinct (shingle, source)
# row through the bucketed self-merge — correct, but the exchange is
# shingle-volume sized.  The sketch ships ONE k-hash signature per
# source per batch (k·8 bytes, merge = re-take the k smallest —
# associative, so any combine tree is exact), and the driver estimates
# each pair's Jaccard from the k-min of the signature union.  Error
# ≈ 1/√k; tolerance-tested against the exact matrix on planted
# overlaps, rows-only in the registry (approximate by construction).
# ---------------------------------------------------------------------------

CONTAM_SKETCH_K = 4096


def doc_source_contamination_sketch(
    sf_dir: str, *, k: int = CONTAM_SKETCH_K
) -> pd.DataFrame:
    from ocr_poc_ray.functions.dedup import (
        _batch_token_hashes,
        _doc_shingle_hashes,
    )

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["source", "text"])

    def sig_partial(batch: pd.DataFrame) -> pd.DataFrame:
        th, offsets = _batch_token_hashes(batch["text"])
        srcs = batch["source"].to_numpy()
        per_src: dict = {}
        for d in range(len(batch)):
            tok = th[offsets[d] : offsets[d + 1]]
            if len(tok) < 3:
                continue
            per_src.setdefault(srcs[d], []).append(_doc_shingle_hashes(tok, 3))
        rows = []
        for s, parts in per_src.items():
            u = np.unique(np.concatenate(parts))  # uint64 ascending
            rows.append({"source": s, "_sig": u[:k].tobytes()})
        return pd.DataFrame(rows, columns=["source", "_sig"])

    def sig_merge(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(
            np.concatenate(
                [np.frombuffer(b, dtype=np.uint64) for b in g["_sig"]]
            )
        )
        return pd.DataFrame(
            {"source": [g["source"].iloc[0]], "_sig": [u[:k].tobytes()]}
        )

    sigs = (
        ds.map_batches(sig_partial, batch_format="pandas")
        .groupby("source")  # sources are bounded — safe per-key groups
        .map_groups(sig_merge, batch_format="pandas")
        .to_pandas()
    )
    if sigs.empty:
        return pd.DataFrame(
            {"source_a": pd.Series([], dtype=object),
             "source_b": pd.Series([], dtype=object),
             "est_jaccard": pd.Series([], dtype="float64")}
        )
    sig_map = {
        s: np.frombuffer(b, dtype=np.uint64)
        for s, b in zip(sigs["source"], sigs["_sig"])
    }
    srcs = sorted(sig_map)
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            sa, sb = sig_map[a], sig_map[b]
            union_kmin = np.unique(np.concatenate([sa, sb]))[:k]
            inter = np.isin(union_kmin, sa) & np.isin(union_kmin, sb)
            est = float(inter.sum()) / max(len(union_kmin), 1)
            rows.append(
                {"source_a": a, "source_b": b, "est_jaccard": round(est, 6)}
            )
    return pd.DataFrame(rows).astype({"est_jaccard": "float64"})


#: stopword-ratio gate the learned classifier is distilled from —
#: near the corpus median so both classes carry real mass.
GATE_DISTILL_THRESHOLD = 0.06

#: |stopword_ratio − threshold| band edges for the agreement report.
GATE_DISTILL_BANDS = (0.0, 0.01, 0.02, 0.05, float("inf"))


def doc_quality_classifier(sf_dir: str) -> pd.DataFrame:
    """Quality-gate DISTILLATION — the crawl-pipeline loop where a
    rule-based gate labels the corpus and a fastText-style linear
    model is trained to imitate it (CCNet / LLaMA-data shape), run
    entirely inside the engine: label with the Arrow stopword-ratio
    kernel (textstats._quality_kernel's ratio ≥ 0.06), TRAIN the
    hashed-token logistic regression distributed (broadcast-refine
    full-batch GD, packed 64 KB gradient partials, tree-reduced —
    functions/trainer.py), then score the corpus with broadcast
    weights.  The learn-then-score analog of the reference's
    load-once model stage (`ocr/paddle_extractor.py:21-34`), with the
    weights produced BY the engine instead of shipped to it.

    Returns the agreement report per |ratio − threshold| band: the
    distilled gate should agree ~everywhere off the boundary and
    disagree only where the rule itself is within noise of its
    threshold (measured: band [0.05,∞) accuracy 1.0, band [0,0.01)
    ~0.7-0.8).  Rows-only like vec_kmeans (float summation order);
    the single-process-equality / partition-invariance /
    planted-signal contract is in tests/test_trainer.py."""
    from ocr_poc_ray.functions.textstats import add_quality
    from ocr_poc_ray.functions.trainer import (
        text_logreg_fit,
        text_logreg_score,
    )

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def add_label(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["y"] = (
            b["stopword_ratio"] >= GATE_DISTILL_THRESHOLD
        ).astype("int64")
        return b[["doc_id", "text", "stopword_ratio", "y"]]

    labeled = add_quality(ds).map_batches(add_label, batch_format="pandas")
    w, _hist = text_logreg_fit(labeled)
    scored = text_logreg_score(
        labeled, w, keep_cols=("stopword_ratio", "y")
    )

    edges = np.asarray(GATE_DISTILL_BANDS)

    def band_partial(b: pd.DataFrame) -> pd.DataFrame:
        dist = (b["stopword_ratio"] - GATE_DISTILL_THRESHOLD).abs().to_numpy()
        band = np.searchsorted(edges[1:-1], dist, side="right")
        ok = (b["pred"].to_numpy() == b["y"].to_numpy()).astype(np.int64)
        nb = len(edges) - 1
        return pd.DataFrame(
            {
                "band": np.arange(nb, dtype="int64"),
                "n": np.bincount(band, minlength=nb).astype("int64"),
                "agree": np.bincount(
                    band, weights=ok, minlength=nb
                ).astype("int64"),
            }
        )

    parts = scored.map_batches(band_partial, batch_format="pandas").to_pandas()
    rep = parts.groupby("band", as_index=False).agg(
        n_docs=("n", "sum"), agree=("agree", "sum")
    )
    rep = rep[rep["n_docs"] > 0].copy()
    rep["band_lo"] = edges[rep["band"].to_numpy()]
    rep["agreement"] = (rep["agree"] / rep["n_docs"]).round(4)
    return (
        rep[["band", "band_lo", "n_docs", "agree", "agreement"]]
        .astype(
            {"band": "int64", "band_lo": "float64", "n_docs": "int64",
             "agree": "int64", "agreement": "float64"}
        )
        .sort_values("band", kind="mergesort")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Keyword-in-context (KWIC) window extraction — the corpus-scale analog
# of the reference's anchor detection + proximity value lookup
# (cni_extractor_18_f.py:681,713): find an anchor token, extract the
# surrounding context window.  Pure row-local map_batches; the window
# slice is one vectorized multi-arange + take + binary_join per batch
# (never a per-row join loop).
# ---------------------------------------------------------------------------

KWIC_KEYWORDS = ("spark", "merge", "window")
KWIC_WINDOW = 3


def _multi_arange(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenation of arange(s, s+l) for each (s, l) — vectorized."""
    lens = lens.astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    idx = np.ones(total, dtype=np.int64)
    idx[0] = starts[0]
    cs = np.cumsum(lens)[:-1]
    idx[cs] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(idx)


def _kwic_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = len(batch)
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    toks = pc.split_pattern_regex(pc.utf8_lower(batch["text"]), r"\s+")
    la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    off = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # align values with offsets: for a sliced ListArray the raw values
    # buffer starts before off[0]
    vals = la.values.slice(int(off[0]), int(off[-1] - off[0]))
    off = off - off[0]
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    # split('', \s+) yields [''] — drop empty tokens so positions match
    # regexp_extract_all(text, '\S+') exactly
    keep = np.flatnonzero(pc.not_equal(vals, "").to_numpy(zero_copy_only=False))
    fvals = vals.take(pa.array(keep)) if len(keep) < len(vals) else vals
    row_of = row_of[keep] if len(keep) < len(vals) else row_of
    counts = np.bincount(row_of, minlength=n)
    noff = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)

    ids_out, kw_out, pos_out, ctx_out = [], [], [], []
    for kw in KWIC_KEYWORDS:
        m = pc.equal(fvals, kw).to_numpy(zero_copy_only=False)
        hit = np.flatnonzero(m)
        if len(hit) == 0:
            continue
        hit_row = row_of[hit]
        ur, first_i = np.unique(hit_row, return_index=True)
        pos_flat = hit[first_i]
        lo = np.maximum(noff[ur], pos_flat - KWIC_WINDOW)
        hi = np.minimum(noff[ur + 1], pos_flat + KWIC_WINDOW + 1)
        lens = hi - lo
        take_idx = _multi_arange(lo, lens)
        ctx_offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
        ctx_list = pa.ListArray.from_arrays(
            pa.array(ctx_offsets, pa.int32()), fvals.take(pa.array(take_idx))
        )
        ids_out.append(doc_id[ur])
        kw_out.extend([kw] * len(ur))
        pos_out.append(pos_flat - noff[ur] + 1)  # 1-based (= list_position)
        ctx_out.append(pc.binary_join(ctx_list, " "))
    if not ids_out:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "keyword": pa.array([], pa.string()),
             "pos": pa.array([], pa.int64()), "context": pa.array([], pa.string())}
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(ids_out).astype(np.int64)),
            "keyword": pa.array(kw_out, pa.string()),
            "pos": pa.array(np.concatenate(pos_out).astype(np.int64)),
            "context": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                 for c in ctx_out]
            ),
        }
    )


def doc_kwic(sf_dir: str) -> pd.DataFrame:
    """First occurrence of each anchor keyword per doc with its ±3-token
    context window.  Row-local (no shuffle); windows never cross docs."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = ds.map_batches(_kwic_batch, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "keyword": pd.Series([], dtype=object),
             "pos": pd.Series([], dtype="int64"),
             "context": pd.Series([], dtype=object)}
        )
    return out.astype({"doc_id": "int64", "pos": "int64"})


_KWIC_VALUES = ",".join(f"('{k}')" for k in KWIC_KEYWORDS)

DOC_KWIC_SQL = rf"""
with toks as (
  select doc_id, regexp_extract_all(lower(text), '\S+') as t from documents
), hit as (
  select doc_id, k.keyword, t, list_position(t, k.keyword) as pos
  from toks cross join (values {_KWIC_VALUES}) k(keyword)
)
select doc_id, keyword, pos::BIGINT as pos,
       array_to_string(t[greatest(1, pos - {KWIC_WINDOW}) : pos + {KWIC_WINDOW}], ' ')
         as context
from hit where pos > 0
"""


# ---------------------------------------------------------------------------
# Anchor span offsets — char-level first/last occurrence spans per
# keyword (the span-contract analog of P6 anchor detection, done as
# three Arrow substring kernels per batch, zero shuffle)
# ---------------------------------------------------------------------------

ANCHOR_KEYWORDS = ("spark", "vector", "customer")


def _anchor_spans_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    txt = pc.utf8_lower(batch["text"])
    rtxt = pc.utf8_reverse(txt)
    tlen = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    ids, kws, firsts, lasts, occs = [], [], [], [], []
    for kw in ANCHOR_KEYWORDS:
        f0 = pc.find_substring(txt, kw).to_numpy(zero_copy_only=False).astype(np.int64)
        present = np.flatnonzero(f0 >= 0)
        if len(present) == 0:
            continue
        r0 = pc.find_substring(rtxt, kw[::-1]).to_numpy(zero_copy_only=False).astype(np.int64)
        n_occ = pc.count_substring(txt, kw).to_numpy(zero_copy_only=False).astype(np.int64)
        ids.append(doc_id[present])
        kws.extend([kw] * len(present))
        firsts.append(f0[present] + 1)  # 1-based (= strpos)
        lasts.append(tlen[present] - r0[present] - len(kw) + 1)
        occs.append(n_occ[present])
    if not ids:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "keyword": pa.array([], pa.string()),
             "first_char": pa.array([], pa.int64()), "last_char": pa.array([], pa.int64()),
             "n_occ": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(ids).astype(np.int64)),
            "keyword": pa.array(kws, pa.string()),
            "first_char": pa.array(np.concatenate(firsts)),
            "last_char": pa.array(np.concatenate(lasts)),
            "n_occ": pa.array(np.concatenate(occs)),
        }
    )


def doc_anchor_spans(sf_dir: str) -> pd.DataFrame:
    """Char-offset span (first/last occurrence, 1-based) and
    non-overlapping occurrence count of each anchor keyword per doc."""
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = ds.map_batches(_anchor_spans_batch, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "keyword": pd.Series([], dtype=object),
             "first_char": pd.Series([], dtype="int64"),
             "last_char": pd.Series([], dtype="int64"),
             "n_occ": pd.Series([], dtype="int64")}
        )
    return out.astype(
        {"doc_id": "int64", "first_char": "int64", "last_char": "int64", "n_occ": "int64"}
    )


_ANCHOR_VALUES = ",".join(f"('{k}')" for k in ANCHOR_KEYWORDS)

DOC_ANCHOR_SPANS_SQL = rf"""
select doc_id, keyword,
       strpos(lower(text), keyword)::BIGINT as first_char,
       (length(text) - strpos(reverse(lower(text)), reverse(keyword))
        - length(keyword) + 2)::BIGINT as last_char,
       len(regexp_extract_all(lower(text), keyword))::BIGINT as n_occ
from documents cross join (values {_ANCHOR_VALUES}) k(keyword)
where strpos(lower(text), keyword) > 0
"""


# ---------------------------------------------------------------------------
# Containment similarity join — Broder's max-containment (inter/min):
# the quote/subset detector exact Jaccard misses (a short doc embedded
# verbatim in a long one scores 1.0 here, near 0 by Jaccard)
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.8


def doc_containment_pairs(sf_dir: str) -> pd.DataFrame:
    """EXACT all-pairs n-gram max-containment join over the bounded doc
    subset (same pair-grid as doc_jaccard_pairs, denominator = smaller
    shingle set).  The asymmetric-dup detector for quotes, excerpts and
    boilerplate inclusions."""
    from ocr_poc_ray.functions.dedup import ngram_containment_pairs

    ds = _docs_jaccard_subset(sf_dir)
    out = ngram_containment_pairs(
        ds, threshold=CONTAINMENT_THRESHOLD, chunk_rows=256
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "containment": pd.Series([], dtype="float64")}
        )
    return out.astype(
        {"id_a": "int64", "id_b": "int64", "containment": "float64"}
    )


DOC_CONTAINMENT_PAIRS_SQL = rf"""
with t as (
  select doc_id, toks,
         case when len(toks) = 0 then []::VARCHAR[]
              when len(toks) < 3 then [array_to_string(toks, ' ')]
              else list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  for i in generate_series(1, len(toks) - 2)]) end as sh
  from (
    select doc_id, regexp_extract_all(lower(text), '\S+') as toks
    from documents where doc_id < {JACCARD_MAX_DOC_ID}
  )
)
select a.doc_id as id_a, b.doc_id as id_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / least(len(a.sh), len(b.sh)), 6) as containment
from t a join t b on a.doc_id < b.doc_id
where len(list_intersect(a.sh, b.sh)) > 0
  and len(list_intersect(a.sh, b.sh))::DOUBLE
      / least(len(a.sh), len(b.sh)) >= {CONTAINMENT_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# LSH quality report — recall of the MinHash-LSH candidate path against
# the exact Jaccard join on the same subset (the honesty audit every
# approximate dedup deployment needs before trusting it at 100 TB)
# ---------------------------------------------------------------------------


def doc_lsh_quality_report(sf_dir: str) -> pd.DataFrame:
    """One-row audit: exact-pair count vs LSH candidates vs exactly-
    verified LSH pairs at the same threshold.  fp is 0 by construction
    (candidates are re-scored exactly); fn counts the pairs LSH's
    banding missed; recall_ppm is the integer-exact recall.  Driver-side
    set ops touch only pair-id lists (dedup OUTPUT, never the corpus)."""
    ds = _docs_jaccard_subset(sf_dir).materialize()  # feeds three passes below

    exact = ngram_jaccard_pairs(
        ds, threshold=JACCARD_THRESHOLD, chunk_rows=256
    ).to_pandas()
    cand = minhash_lsh_pairs(ds, threshold=JACCARD_THRESHOLD)
    n_candidates = cand.count()
    verified = ngram_jaccard_verify(cand, ds).to_pandas()
    verified = verified[verified["jaccard"] >= JACCARD_THRESHOLD]

    def _keys(df: pd.DataFrame, a: str, b: str) -> set[tuple[int, int]]:
        lo = np.minimum(df[a].to_numpy(np.int64), df[b].to_numpy(np.int64))
        hi = np.maximum(df[a].to_numpy(np.int64), df[b].to_numpy(np.int64))
        return set(zip(lo.tolist(), hi.tolist()))

    ex = _keys(exact, "id_a", "id_b") if len(exact) else set()
    vf = _keys(verified, "doc_a", "doc_b") if len(verified) else set()
    tp, fn, fp = len(ex & vf), len(ex - vf), len(vf - ex)
    recall_ppm = (tp * 1_000_000) // len(ex) if ex else 1_000_000
    return pd.DataFrame(
        {
            "n_exact": pd.Series([len(ex)], dtype="int64"),
            "n_candidates": pd.Series([n_candidates], dtype="int64"),
            "n_verified": pd.Series([len(vf)], dtype="int64"),
            "tp": pd.Series([tp], dtype="int64"),
            "fn": pd.Series([fn], dtype="int64"),
            "fp": pd.Series([fp], dtype="int64"),
            "recall_ppm": pd.Series([recall_ppm], dtype="int64"),
        }
    )


# ---------------------------------------------------------------------------
# Normalization-keyed dedup — CCNet-style: dedup on the NORMALIZED text
# (lowercase, punctuation → space, whitespace collapse) so trivially
# reformatted copies land in one group where raw fingerprints miss them
# ---------------------------------------------------------------------------

_NORM_PUNCT_RE = r"[^a-z0-9\s]"
_NORM_WS_RE = r"\s+"


def doc_normalize_dedup(sf_dir: str) -> pd.DataFrame:
    """Duplicate groups keyed on md5 of the NORMALIZED text.  The
    normalization chain runs in Arrow RE2 kernels (byte-identical
    regexes in the SQL mirror); per-batch (fingerprint, count, min_doc)
    partials combine in 16 hash buckets — group cardinality never
    appears as a Ray group count.  Output: every group (n_docs ≥ 1) —
    the oracle then verifies the full normalization chain fingerprint-
    by-fingerprint, and dup groups surface as n_docs ≥ 2 rows."""
    import hashlib as _hl

    import pyarrow.compute as pc

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.replace_substring_regex(
                    pc.utf8_lower(batch["text"]), _NORM_PUNCT_RE, " "
                ),
                _NORM_WS_RE,
                " ",
            )
        )
        fps = np.asarray(
            [_hl.md5(s.encode()).hexdigest() for s in norm.to_pylist()],
            dtype=object,
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"fp": fps, "doc_id": ids})
        g = df.groupby("fp", as_index=False).agg(
            n=("doc_id", "size"), min_doc=("doc_id", "min")
        )
        g["_hb"] = [int(f[:4], 16) % 16 for f in g["fp"]]
        return g

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("fp", as_index=False).agg(
            n_docs=("n", "sum"), keeper=("min_doc", "min")
        )
        return g[["fp", "n_docs", "keeper"]]

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("_hb")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "fp" not in out.columns:
        return pd.DataFrame(
            {"fp": pd.Series([], dtype=object),
             "n_docs": pd.Series([], dtype="int64"),
             "keeper": pd.Series([], dtype="int64")}
        )
    return out.astype({"n_docs": "int64", "keeper": "int64"})


DOC_NORMALIZE_DEDUP_SQL = rf"""
with n as (
  select doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
             '{_NORM_PUNCT_RE}', ' ', 'g'), '{_NORM_WS_RE}', ' ', 'g'))) as fp
  from documents
)
select fp, count(*)::BIGINT as n_docs, min(doc_id)::BIGINT as keeper
from n group by fp
"""


# ---------------------------------------------------------------------------
# Snake-order shard balancing — boustrophedon assignment after a
# length-descending rank: near-equal token totals per output shard
# (the balanced-training-shard writer)
# ---------------------------------------------------------------------------

N_BALANCE_SHARDS = 8


def doc_shard_balance(sf_dir: str) -> pd.DataFrame:
    """Assign docs to N shards in snake order of token-count rank
    (longest first; odd passes reverse direction) so shard token totals
    stay within one document of each other — the deterministic
    data-parallel shard balancer.  One global rank (the prefix-scan
    machinery's range sort) then row-local arithmetic; output is the
    N-row shard audit."""
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    N = N_BALANCE_SHARDS
    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    toks = add_token_counts(ds).select_columns(["doc_id", "n_ws_tokens"])
    toks = toks.map_batches(
        lambda b: b.assign(neg=-b["n_ws_tokens"].to_numpy(np.int64)),
        batch_format="pandas",
    )
    ranked = ordered_prefix_sum(
        toks,
        sort_cols=["neg", "doc_id"],
        value_col=None,
        out_col="rk",
        unique_col="doc_id",
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        r = b["rk"].to_numpy(np.int64) - 1  # 0-based length-desc rank
        pos = r % N
        shard = np.where((r // N) % 2 == 0, pos, N - 1 - pos)
        return (
            pd.DataFrame(
                {"shard": shard, "n": 1,
                 "tok": b["n_ws_tokens"].to_numpy(np.int64)}
            )
            .groupby("shard", as_index=False)
            .sum()
        )

    parts = ranked.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"shard": pd.Series([], dtype="int64"),
             "n_docs": pd.Series([], dtype="int64"),
             "total_tokens": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("shard", as_index=False).sum()
    out = out.rename(columns={"n": "n_docs", "tok": "total_tokens"})
    return out.sort_values("shard").reset_index(drop=True).astype(
        {"shard": "int64", "n_docs": "int64", "total_tokens": "int64"}
    )


DOC_SHARD_BALANCE_SQL = rf"""
with t as (
  select doc_id,
         case when {_STRIP('text')} = '' then 0
              else len(regexp_extract_all(text, '\S+')) end as n_ws_tokens
  from documents
), r as (
  select doc_id, n_ws_tokens,
         row_number() over (order by n_ws_tokens desc, doc_id) - 1 as r
  from t
)
select (case when (r // {N_BALANCE_SHARDS}) % 2 = 0
             then r % {N_BALANCE_SHARDS}
             else {N_BALANCE_SHARDS} - 1 - r % {N_BALANCE_SHARDS} end)::BIGINT
         as shard,
       count(*)::BIGINT as n_docs,
       sum(n_ws_tokens)::BIGINT as total_tokens
from r
group by 1
"""


# ---------------------------------------------------------------------------
# Quota dedup — keep at most CAP copies per exact-dup cluster (the
# multiplicity-capping policy: duplication signal is useful at low
# multiplicity, harmful at crawl multiplicity — cap it, don't keep-one)
# ---------------------------------------------------------------------------

DUP_CAP = 2


def doc_cluster_cap_sample(sf_dir: str) -> pd.DataFrame:
    """Per-exact-dup-cluster quota sample: within each md5(text) group,
    rank members by md5(doc_id) (the deterministic shuffle priority) and
    keep ranks ≤ DUP_CAP.  Per-batch (fp, prio, doc) projections combine
    in 16 fp-hash buckets; within a bucket ALL groups rank in one
    lexsort + segment-boundary pass — group multiplicity never becomes a
    Ray group count (the crawl regime is few huge clusters)."""
    import hashlib as _hl

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        fps = np.asarray(
            [_hl.md5(t.encode()).hexdigest() for t in batch["text"].fillna("")],
            dtype=object,
        )
        prio = np.asarray(
            [_hl.md5(str(i).encode()).hexdigest() for i in ids], dtype=object
        )
        hb = np.asarray([int(f[:4], 16) % 16 for f in fps], dtype=np.int64)
        return pd.DataFrame({"fp": fps, "prio": prio, "doc_id": ids, "_hb": hb})

    def rank_bucket(b: pd.DataFrame) -> pd.DataFrame:
        fp = b["fp"].to_numpy(object)
        prio = b["prio"].to_numpy(object)
        ids = b["doc_id"].to_numpy(np.int64)
        order = np.lexsort((ids, prio, fp))
        fp, prio, ids = fp[order], prio[order], ids[order]
        starts = np.ones(len(fp), dtype=bool)
        starts[1:] = fp[1:] != fp[:-1]
        seg = np.cumsum(starts) - 1
        seg_start = np.flatnonzero(starts)
        rk = np.arange(len(fp)) - seg_start[seg] + 1
        counts = np.diff(np.append(seg_start, len(fp)))
        n_docs = counts[seg]
        keep = rk <= DUP_CAP
        return pd.DataFrame(
            {"doc_id": ids[keep],
             "n_docs": n_docs[keep].astype(np.int64),
             "kept_rank": rk[keep].astype(np.int64)}
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(rank_bucket, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "n_docs", "kept_rank")}
        )
    return out.astype({"doc_id": "int64", "n_docs": "int64", "kept_rank": "int64"})


DOC_CLUSTER_CAP_SAMPLE_SQL = f"""
with g as (
  select doc_id, md5(text) as fp from documents
), s as (
  select doc_id,
         count(*) over (partition by fp) as n_docs,
         row_number() over (partition by fp
                            order by md5(doc_id::VARCHAR), doc_id) as rk
  from g
)
select doc_id, n_docs::BIGINT as n_docs, rk::BIGINT as kept_rank
from s where rk <= {DUP_CAP}
"""


# ---------------------------------------------------------------------------
# Dup-threshold sensitivity curve — pair counts at rising Jaccard cuts
# (the sweep a corpus owner reads before fixing the dedup threshold)
# ---------------------------------------------------------------------------

DUP_THRESHOLDS_PCT = (50, 60, 70, 80, 90)


def doc_dup_threshold_curve(sf_dir: str) -> pd.DataFrame:
    """Near-dup pair counts at each candidate threshold, from ONE exact
    pair-grid run at the lowest cut (higher cuts are row-local filters
    of its output — the sweep costs one join, not five).  Both engines
    compare the 6-dp-rounded jaccard against thr/100.0, so the bucket
    edges are bit-identical."""
    ds = _docs_jaccard_subset(sf_dir)
    pairs = ngram_jaccard_pairs(
        ds, threshold=min(DUP_THRESHOLDS_PCT) / 100.0, chunk_rows=256
    ).to_pandas()
    j = pairs["jaccard"].to_numpy(np.float64) if len(pairs) else np.array([])
    rows = [
        {"thr_pct": t, "n_pairs": int((j >= t / 100.0).sum())}
        for t in DUP_THRESHOLDS_PCT
    ]
    return pd.DataFrame(rows).astype({"thr_pct": "int64", "n_pairs": "int64"})


DOC_DUP_THRESHOLD_CURVE_SQL = rf"""
with t as (
  select doc_id, toks,
         case when len(toks) = 0 then []::VARCHAR[]
              when len(toks) < 3 then [array_to_string(toks, ' ')]
              else list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                  for i in generate_series(1, len(toks) - 2)]) end as sh
  from (
    select doc_id, regexp_extract_all(lower(text), '\S+') as toks
    from documents where doc_id < {JACCARD_MAX_DOC_ID}
  )
), p as (
  select round(len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(a.sh || b.sh)), 6) as j
  from t a join t b on a.doc_id < b.doc_id
  where len(list_intersect(a.sh, b.sh))::DOUBLE
        / len(list_distinct(a.sh || b.sh)) >= {min(DUP_THRESHOLDS_PCT) / 100.0}
)
select thr.thr_pct::BIGINT as thr_pct,
       count(*) filter (p.j >= thr.thr_pct / 100.0)::BIGINT as n_pairs
from (values {', '.join(f'({t})' for t in DUP_THRESHOLDS_PCT)}) thr(thr_pct)
left join p on true
group by thr.thr_pct
"""


# ---------------------------------------------------------------------------
# Split leakage audit — do exact-dup groups straddle the train/eval
# boundary of the NAIVE per-doc split?  (The number that motivates
# doc_leakage_safe_split: any straddling group leaks eval content into
# training.)
# ---------------------------------------------------------------------------


def doc_split_leakage_audit(sf_dir: str) -> pd.DataFrame:
    """One-row audit: exact-dup groups (md5 text, n≥2), and how many
    straddle train vs non-train under the doc-keyed md5 split.  Per-
    batch (hash, side) projections combine in 16 hash buckets; group
    multiplicity never becomes a Ray group count."""
    import hashlib as _hl

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        h = np.asarray(
            [_hl.md5(t.encode()).hexdigest() for t in b["text"].fillna("")],
            dtype=object,
        )
        frac = np.asarray(
            [int(_hl.md5(str(i).encode()).hexdigest()[:8], 16) % 100 for i in ids]
        )
        is_train = frac < SPLIT_TRAIN_PCT
        g = pd.DataFrame({"h": h, "n": 1,
                          "n_train": is_train.astype(np.int64)})
        g = g.groupby("h", as_index=False).sum()
        g["_hb"] = [int(x[:4], 16) % 16 for x in g["h"]]
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby("h", as_index=False)[["n", "n_train"]].sum()
        dup = d[d["n"] >= 2]
        straddle = dup[(dup["n_train"] > 0) & (dup["n_train"] < dup["n"])]
        return pd.DataFrame(
            {"dup_groups": [len(dup)],
             "straddling_groups": [len(straddle)],
             "docs_in_dup_groups": [int(dup["n"].sum())]}
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    tot = out.sum() if len(out) else None
    return pd.DataFrame(
        {
            "dup_groups": pd.Series(
                [int(tot["dup_groups"]) if tot is not None else 0], dtype="int64"
            ),
            "straddling_groups": pd.Series(
                [int(tot["straddling_groups"]) if tot is not None else 0],
                dtype="int64",
            ),
            "docs_in_dup_groups": pd.Series(
                [int(tot["docs_in_dup_groups"]) if tot is not None else 0],
                dtype="int64",
            ),
        }
    )


DOC_SPLIT_LEAKAGE_AUDIT_SQL = f"""
with s as (
  select md5(text) as h,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100
           < {SPLIT_TRAIN_PCT} as is_train
  from documents
), g as (
  select h, count(*) as n, sum(case when is_train then 1 else 0 end) as n_train
  from s group by h having count(*) >= 2
)
select coalesce(count(*), 0)::BIGINT as dup_groups,
       coalesce(count(*) filter (n_train > 0 and n_train < n), 0)::BIGINT
         as straddling_groups,
       coalesce(sum(n), 0)::BIGINT as docs_in_dup_groups
from g
"""


# ---------------------------------------------------------------------------
# Curation funnel — per-stage survivor counts for the curation pipeline
# (the observability report a corpus owner reads before/after each run)
# ---------------------------------------------------------------------------


def doc_curation_funnel(sf_dir: str) -> pd.DataFrame:
    """Survivorship counts through the curation chain: total → quality
    gate → exact dedup (distinct quality texts) → per-language sample
    cap.  One annotation pass materializes a 3-column projection
    (flag, lang, text-hash — tens of bytes/doc); counts are per-batch
    partials plus one bucketed distinct over (lang, hash).  All four
    numbers are exact integers — the oracle is bit-stable."""
    import hashlib as _hl

    ds = ray.data.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def project(b: pd.DataFrame) -> pd.DataFrame:
        h = [
            _hl.md5(t.encode("utf-8", "ignore")).hexdigest() if q else ""
            for t, q in zip(b["text"], b["is_quality"])
        ]
        return pd.DataFrame(
            {"is_quality": b["is_quality"].to_numpy(bool),
             "lang_pred": b["lang_pred"].to_numpy(object),
             "h": h}
        )

    ann = (
        add_langid(add_quality(ds))
        .map_batches(project, batch_format="pandas")
        .materialize()  # read by the count pass AND the distinct pass
    )

    counts = ann.map_batches(
        lambda b: pd.DataFrame(
            {"total": [len(b)], "quality": [int(b["is_quality"].sum())]}
        ),
        batch_format="pandas",
    ).to_pandas()
    n_total = int(counts["total"].sum())
    n_quality = int(counts["quality"].sum())

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        q = b[b["is_quality"]]
        p = q[["lang_pred", "h"]].drop_duplicates()
        p = p.assign(
            _hb=(pd.util.hash_array(p["h"].to_numpy(object)) % 16).astype("int64")
        )
        return p

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["lang_pred", "h"]].drop_duplicates()
        return d.groupby("lang_pred", as_index=False).agg(n=("h", "size"))

    per_lang = (
        ann.map_batches(pair_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()
    )
    if per_lang.empty or "lang_pred" not in per_lang.columns:
        n_dedup = n_sample = 0
    else:
        lang_n = per_lang.groupby("lang_pred")["n"].sum()
        n_dedup = int(lang_n.sum())
        n_sample = int(lang_n.clip(upper=CURATION_SAMPLE_PER_LANG).sum())
    return pd.DataFrame(
        {
            "stage_idx": pd.Series([1, 2, 3, 4], dtype="int64"),
            "stage": ["total", "quality", "deduped", "sampled"],
            "n_docs": pd.Series(
                [n_total, n_quality, n_dedup, n_sample], dtype="int64"
            ),
        }
    )


_CURATION_FUNNEL_TEMPLATE = r"""
with m as (
  select doc_id, text,
         length(text)::DOUBLE as n_chars,
         len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE as n_punct,
         case when {strip} = '' then 0
              else len(regexp_extract_all(text, '\S+')) end as ws_tokens,
         {hits_en} as he, {hits_fr} as hf, {hits_de} as hd, {hits_es} as hs
  from documents
),
q as (
  select doc_id, text,
         case when he + hf + hd + hs = 0 then 'und'
              when he >= hf and he >= hd and he >= hs then 'en'
              when hf >= hd and hf >= hs then 'fr'
              when hd >= hs then 'de'
              else 'es' end as lang_pred
  from m
  where n_chars >= 50
    and (case when n_chars > 0 then n_punct / n_chars else 0.0 end) <= 0.20
    and ws_tokens >= 10
),
d as (
  select lang_pred, count(distinct md5(text)) as n from q group by lang_pred
)
select 1::BIGINT as stage_idx, 'total' as stage,
       (select count(*) from documents)::BIGINT as n_docs
union all
select 2, 'quality', (select count(*) from q)::BIGINT
union all
select 3, 'deduped', coalesce((select sum(n) from d), 0)::BIGINT
union all
select 4, 'sampled',
       coalesce((select sum(least(n, {cap})) from d), 0)::BIGINT
"""


REGISTRY = {
    "doc_cluster_cap_sample": (doc_cluster_cap_sample, DOC_CLUSTER_CAP_SAMPLE_SQL),
    "doc_dup_threshold_curve": (
        doc_dup_threshold_curve, DOC_DUP_THRESHOLD_CURVE_SQL,
    ),
    "doc_split_leakage_audit": (
        doc_split_leakage_audit, DOC_SPLIT_LEAKAGE_AUDIT_SQL,
    ),
    "doc_curation_funnel": (
        doc_curation_funnel,
        _CURATION_FUNNEL_TEMPLATE.format(
            strip=_STRIP("text"),
            hits_en=_lang_hits_sql("en"), hits_fr=_lang_hits_sql("fr"),
            hits_de=_lang_hits_sql("de"), hits_es=_lang_hits_sql("es"),
            cap=CURATION_SAMPLE_PER_LANG,
        ),
    ),
    "doc_containment_pairs": (doc_containment_pairs, DOC_CONTAINMENT_PAIRS_SQL),
    "doc_lsh_quality_report": (doc_lsh_quality_report, None),
    "doc_normalize_dedup": (doc_normalize_dedup, DOC_NORMALIZE_DEDUP_SQL),
    "doc_shard_balance": (doc_shard_balance, DOC_SHARD_BALANCE_SQL),
    "doc_kwic": (doc_kwic, DOC_KWIC_SQL),
    "doc_anchor_spans": (doc_anchor_spans, DOC_ANCHOR_SPANS_SQL),
    "doc_quality_classifier": (doc_quality_classifier, None),
    "doc_dsir_weights": (doc_dsir_weights, DOC_DSIR_WEIGHTS_SQL),
    "doc_source_contamination_sketch": (doc_source_contamination_sketch, None),
    "doc_bpe_learn": (doc_bpe_learn, None),
    "doc_bpe_tokenize": (doc_bpe_tokenize, None),
    "doc_ngram_novelty": (doc_ngram_novelty, DOC_NGRAM_NOVELTY_SQL),
    "doc_soft_dedup_weights": (
        doc_soft_dedup_weights, DOC_SOFT_DEDUP_WEIGHTS_SQL,
    ),
    "doc_bpe_top_pairs": (doc_bpe_top_pairs, DOC_BPE_TOP_PAIRS_SQL),
    "doc_pii_redact": (doc_pii_redact, DOC_PII_REDACT_SQL),
    "doc_top_tokens_per_source": (
        doc_top_tokens_per_source, DOC_TOP_TOKENS_PER_SOURCE_SQL,
    ),
    "doc_source_contamination": (
        doc_source_contamination, DOC_SOURCE_CONTAMINATION_SQL,
    ),
    "doc_substring_dedup": (doc_substring_dedup, DOC_SUBSTRING_DEDUP_SQL),
    "doc_cdc_chunk_stats": (doc_cdc_chunk_stats, None),
    "doc_extract_plain": (doc_extract_plain, DOC_EXTRACT_PLAIN_SQL),
    "doc_extract_json": (doc_extract_json, DOC_EXTRACT_JSON_SQL),
    "doc_tfidf_scores": (doc_tfidf_scores, DOC_TFIDF_SQL),
    "doc_bm25_topk": (doc_bm25_topk, DOC_BM25_SQL),
    "doc_top_tfidf_per_lang": (doc_top_tfidf_per_lang, DOC_TOP_TFIDF_SQL),
    "doc_sample_per_lang": (doc_sample_per_lang, DOC_SAMPLE_PER_LANG_SQL),
    "doc_lang_quality_stats": (doc_lang_quality_stats, DOC_LANG_QUALITY_STATS_SQL),
    "doc_token_counts": (doc_token_counts, DOC_TOKEN_COUNTS_SQL),
    "doc_quality": (doc_quality, DOC_QUALITY_SQL),
    "doc_langid": (doc_langid, DOC_LANGID_SQL),
    "doc_langid_confusion": (doc_langid_confusion, DOC_LANGID_CONFUSION_SQL),
    "doc_fingerprint": (doc_fingerprint, DOC_FINGERPRINT_SQL),
    "doc_exact_dedup": (doc_exact_dedup, DOC_EXACT_DEDUP_SQL),
    "doc_incremental_dedup": (doc_incremental_dedup, DOC_INCREMENTAL_DEDUP_SQL),
    "doc_snapshot_diff": (doc_snapshot_diff, DOC_SNAPSHOT_DIFF_SQL),
    "doc_source_ttr": (doc_source_ttr, DOC_SOURCE_TTR_SQL),
    "doc_winnow_fingerprints": (doc_winnow_fingerprints, DOC_WINNOW_FINGERPRINTS_SQL),
    "doc_minhash_pairs": (doc_minhash_pairs, None),
    "doc_simhash_pairs": (doc_simhash_pairs, None),
    "doc_jaccard_pairs": (doc_jaccard_pairs, DOC_JACCARD_PAIRS_SQL),
    "doc_jaccard_pairs_prefix": (doc_jaccard_pairs_prefix, DOC_JACCARD_PAIRS_SQL),
    "doc_curation_pipeline": (doc_curation_pipeline, DOC_CURATION_SQL),
    "doc_hash_sample": (doc_hash_sample, DOC_HASH_SAMPLE_SQL),
    "doc_mixture_sample": (doc_mixture_sample, DOC_MIXTURE_SAMPLE_SQL),
    "doc_mixture_allocate": (doc_mixture_allocate, DOC_MIXTURE_ALLOCATE_SQL),
    "doc_temperature_sample": (doc_temperature_sample, DOC_TEMPERATURE_SAMPLE_SQL),
    "doc_pack_sequences": (doc_pack_sequences, DOC_PACK_SEQUENCES_SQL),
    "doc_pack_efficiency": (doc_pack_efficiency, DOC_PACK_EFFICIENCY_SQL),
    "doc_pack_interleaved": (doc_pack_interleaved, DOC_PACK_INTERLEAVED_SQL),
    "doc_length_ntile": (doc_length_ntile, DOC_LENGTH_NTILE_SQL),
    "doc_shuffled_order": (doc_shuffled_order, DOC_SHUFFLED_ORDER_SQL),
    "doc_chunk_tokens": (doc_chunk_tokens, DOC_CHUNK_TOKENS_SQL),
    "doc_chunk_overlap": (doc_chunk_overlap, DOC_CHUNK_OVERLAP_SQL),
    "doc_top_tokens": (doc_top_tokens, DOC_TOP_TOKENS_SQL),
    "doc_heavy_tokens_mg": (doc_heavy_tokens_mg, DOC_HEAVY_TOKENS_MG_SQL),
    "doc_chunk_dedup": (doc_chunk_dedup, DOC_CHUNK_DEDUP_SQL),
    "doc_chunk_dup_histogram": (doc_chunk_dup_histogram, DOC_CHUNK_DUP_HISTOGRAM_SQL),
    "doc_repetition": (doc_repetition, DOC_REPETITION_SQL),
    "doc_near_dup_components": (doc_near_dup_components, None),
    "doc_dup_components_exact": (doc_dup_components_exact, DOC_DUP_COMPONENTS_SQL),
    "doc_decontaminate": (doc_decontaminate, DOC_DECONTAMINATE_SQL),
    "doc_source_lang_matrix": (doc_source_lang_matrix, DOC_SOURCE_LANG_MATRIX_SQL),
    "doc_dedup_keep_best": (doc_dedup_keep_best, DOC_DEDUP_KEEP_BEST_SQL),
    "doc_source_entropy": (doc_source_entropy, DOC_SOURCE_ENTROPY_SQL),
    "doc_token_cooccurrence": (doc_token_cooccurrence, DOC_TOKEN_COOC_SQL),
    "doc_token_pmi": (doc_token_pmi, DOC_TOKEN_PMI_SQL),
    "doc_token_zipf": (doc_token_zipf, DOC_TOKEN_ZIPF_SQL),
    "doc_adaptive_stopwords": (doc_adaptive_stopwords, DOC_ADAPTIVE_STOPWORDS_SQL),
    "doc_length_pct_rank_by_lang": (
        doc_length_pct_rank_by_lang, DOC_LENGTH_PCT_RANK_SQL,
    ),
    "doc_unigram_logprob": (doc_unigram_logprob, DOC_UNIGRAM_LOGPROB_SQL),
    "doc_weighted_sample": (doc_weighted_sample, DOC_WEIGHTED_SAMPLE_SQL),
    "doc_bigram_logprob": (doc_bigram_logprob, DOC_BIGRAM_LOGPROB_SQL),
    "doc_dup_pagerank": (doc_dup_pagerank, None),
    "doc_token_entropy": (doc_token_entropy, DOC_TOKEN_ENTROPY_SQL),
    "doc_lang_source_rollup": (
        doc_lang_source_rollup, DOC_LANG_SOURCE_ROLLUP_SQL,
    ),
    "doc_lang_source_cube": (doc_lang_source_cube, DOC_LANG_SOURCE_CUBE_SQL),
    "doc_zorder_layout": (doc_zorder_layout, DOC_ZORDER_SQL),
    "doc_train_split": (doc_train_split, DOC_TRAIN_SPLIT_SQL),
    "doc_dup_ngram_fraction": (
        doc_dup_ngram_fraction, DOC_DUP_NGRAM_FRACTION_SQL,
    ),
    "doc_corpus_card": (doc_corpus_card, DOC_CORPUS_CARD_SQL),
    "doc_leakage_safe_split": (
        doc_leakage_safe_split,
        _leakage_split_sql().format(jac=DOC_JACCARD_PAIRS_SQL),
    ),
    "doc_interleaved_order": (
        doc_interleaved_order, DOC_INTERLEAVED_ORDER_SQL,
    ),
    "doc_compress_ratio": (doc_compress_ratio, None),
    "doc_source_kl": (doc_source_kl, DOC_SOURCE_KL_SQL),
    "doc_weighted_sample_per_lang": (
        doc_weighted_sample_per_lang, DOC_WEIGHTED_SAMPLE_PER_LANG_SQL,
    ),
    "doc_quality_blend": (doc_quality_blend, DOC_QUALITY_BLEND_SQL),
    "doc_filter_report": (doc_filter_report, DOC_FILTER_REPORT_SQL),
    "doc_gopher_rules": (doc_gopher_rules, DOC_GOPHER_RULES_SQL),
    "doc_near_dedup_corpus": (doc_near_dedup_corpus, DOC_NEAR_DEDUP_CORPUS_SQL),
    "doc_k_anonymity": (doc_k_anonymity, DOC_K_ANONYMITY_SQL),
    "doc_l_diversity": (doc_l_diversity, DOC_L_DIVERSITY_SQL),
    "doc_t_closeness": (doc_t_closeness, DOC_T_CLOSENESS_SQL),
    "doc_pareto_frontier": (doc_pareto_frontier, DOC_PARETO_FRONTIER_SQL),
    "doc_dup_triangles": (doc_dup_triangles, DOC_DUP_TRIANGLES_SQL),
}
