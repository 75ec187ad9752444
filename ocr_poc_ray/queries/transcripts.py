"""Transcript-extraction queries — the flagship pipeline surface.

The transcript table (BASELINE.json ``input_hint`` shape) is
synthesized deterministically per scale (FIXTURES.md; seeded, no
external data), so these run at any sf_dir.  HTML/PDF extraction and
the ordering shuffle are not SQL-expressible → rows-only driver
checks; their CORRECTNESS story is the golden-equality pytest suite
(tests/test_pipeline_equality.py) where the oracle is the
single-process extractor applied to the generator's expected table.

``xs_extract_documents`` additionally runs the *plain* flagship path
over the real ``documents`` table reshaped into transcript rows, WITH
a full SQL oracle — extraction + ordering verified relationally.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ocr_poc_ray.pipelines.extraction import extract_transcripts
from ocr_poc_ray.stages.ordering import conversation_docs
from ocr_poc_ray.synth import BASE_TS_US, generate_transcripts

#: scale → synthetic corpus size (kept modest: these run inside the
#: driver's per-query correctness loop, not the benchmark).
_SYNTH_TURNS = 3_000
_SYNTH_CONVS = 120
_SYNTH_SEED = 7


def _synth_ds() -> ray.data.Dataset:
    transcripts, _expected = generate_transcripts(_SYNTH_TURNS, _SYNTH_CONVS, _SYNTH_SEED)
    return ray.data.from_arrow(transcripts)


def xs_extract_synth(sf_dir: str) -> pd.DataFrame:
    """Full pipeline (validate → actor-pool extract → ordering shuffle)."""
    ds = extract_transcripts(_synth_ds(), concurrency=(1, 4), ordered=True)
    out = ds.to_pandas()
    return out.astype(
        {
            "turn_idx": "int64",
            "quality_score": "float64",
            "confidence": "float64",
            "n_blocks": "int64",
            "n_kept": "int64",
        }
    )


def xs_conversation_docs(sf_dir: str) -> pd.DataFrame:
    """Order-sensitive consolidation (P5 analog) over the synth corpus."""
    ds = extract_transcripts(_synth_ds(), ordered=False)
    docs = conversation_docs(ds)
    return docs.to_pandas().astype({"n_turns": "int64"})


def _documents_as_transcripts(sf_dir: str) -> ray.data.Dataset:
    """Reshape the real documents table into transcript rows.

    conv_id = source, turn_idx = doc_id (unique ⇒ valid turn key),
    tool = "" (plain path), ts synthesized from doc_id — all row-local,
    so the reshape is a pure ``map_batches``.
    """
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source", "text"]
    )

    def reshape(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        doc_id = batch["doc_id"]
        return pa.table(
            {
                "conv_id": batch["source"],
                "turn_idx": pc.cast(doc_id, pa.int32()),
                "role": pa.array(["user"] * n, pa.string()),
                "text": batch["text"],
                "tool": pa.array([""] * n, pa.string()),
                "ts": pc.cast(
                    pc.add(pa.scalar(BASE_TS_US, pa.int64()),
                           pc.multiply(pc.cast(doc_id, pa.int64()), 1_000_000)),
                    pa.timestamp("us"),
                ),
            }
        )

    return ds.map_batches(reshape, batch_format="pyarrow")


def xs_extract_documents(sf_dir: str) -> pd.DataFrame:
    """Flagship pipeline over real data, SQL-verifiable end to end."""
    ds = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=True)
    out = ds.to_pandas()[["conv_id", "turn_idx", "extracted_text", "success", "error"]]
    return out.astype({"turn_idx": "int64"})


# Mirrors extractors/plain.py over the reshaped rows (text has no
# newlines in this corpus, but the full noise-filter mirror is kept so
# the oracle stays honest if the corpus changes).
_WS_CHARS = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"
_STRIP_L = f"trim(l, {_WS_CHARS})"
_KEPT = (
    f"list_filter(str_split(text, chr(10)), l -> not ("
    f"{_STRIP_L} = '' or starts_with({_STRIP_L}, 'I<') "
    f"or contains(l, '<<<') or regexp_matches({_STRIP_L}, '^[A-Z]{{3}}$')))"
)

XS_EXTRACT_DOCUMENTS_SQL = rf"""
with e as (
  select source as conv_id, doc_id as turn_idx,
         coalesce(regexp_replace(trim(array_to_string({_KEPT}, ' '),
                                      {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '') as extracted_text
  from documents
)
select conv_id, turn_idx, extracted_text,
       extracted_text <> '' as success,
       case when extracted_text <> '' then '' else 'empty_after_filter' end as error
from e
"""


def xs_conv_docs_documents(sf_dir: str) -> pd.DataFrame:
    """Order-sensitive consolidation over REAL data with a SQL oracle:
    per-conversation document assembly (chunked two-pass groupby) must
    equal DuckDB's ``string_agg(... order by turn_idx)`` — the
    relational proof that the ordering shuffle is stable."""
    ds = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)
    docs = conversation_docs(ds, chunk_size=64)
    return docs.to_pandas().astype({"n_turns": "int64"})


XS_CONV_DOCS_DOCUMENTS_SQL = rf"""
with e as (
  select source as conv_id, doc_id as turn_idx,
         coalesce(regexp_replace(trim(array_to_string({_KEPT}, ' '),
                                      {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '') as extracted_text
  from documents
)
select conv_id, count(*) as n_turns,
       string_agg(extracted_text, ' ' order by turn_idx) as doc_text
from e
where extracted_text <> ''
group by conv_id
"""


def xs_conv_pack(sf_dir: str) -> pd.DataFrame:
    """End-to-end training-data composition with one oracle: extract →
    assemble conversation documents → tokenize → greedy 512-token pack
    assignment in conv_id order (the loader's layout applied to whole
    conversations — a conversation never splits across packs)."""
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum
    from ocr_poc_ray.functions.textstats import add_token_counts
    from ocr_poc_ray.pipelines.loader import PACK_TOKEN_BUDGET

    ds = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)
    docs = conversation_docs(ds, chunk_size=64)
    toks = add_token_counts(docs, text_col="doc_text").select_columns(
        ["conv_id", "n_ws_tokens"]
    )
    cum = ordered_prefix_sum(
        toks, sort_cols=["conv_id"], value_col="n_ws_tokens", out_col="cum"
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        c = b["cum"].to_numpy(np.int64)
        n = b["n_ws_tokens"].to_numpy(np.int64)
        return pd.DataFrame(
            {"conv_id": b["conv_id"],
             "n_ws_tokens": n,
             "pack_id": (c - n) // PACK_TOKEN_BUDGET}
        )

    out = cum.map_batches(finish, batch_format="pandas").to_pandas()
    return out.astype({"n_ws_tokens": "int64", "pack_id": "int64"})


XS_CONV_PACK_SQL = rf"""
with e as (
  select source as conv_id, doc_id as turn_idx,
         coalesce(regexp_replace(trim(array_to_string({_KEPT}, ' '),
                                      {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '') as extracted_text
  from documents
), d as (
  select conv_id,
         string_agg(extracted_text, ' ' order by turn_idx) as doc_text
  from e
  where extracted_text <> ''
  group by conv_id
), t as (
  select conv_id, len(regexp_extract_all(doc_text, '\S+')) as n_ws_tokens
  from d
)
select conv_id, n_ws_tokens,
       ((sum(n_ws_tokens) over (order by conv_id))::BIGINT - n_ws_tokens)
         // 512 as pack_id
from t
"""


# ---------------------------------------------------------------------------
# Multimodal plumbing (stubbed decode kernels — deterministic fake
# payloads; the Ray-side schema/actor/batch shape is the real thing).
# ---------------------------------------------------------------------------

def _media_ds(sf_dir: str) -> ray.data.Dataset:
    """Deterministic media table derived from document ids."""
    import pyarrow.parquet as pq

    from ocr_poc_ray.functions.multimodal import make_fake_payload, make_image_payload

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    kinds = ("image", "audio", "video")
    img_fmts = ("png", "bmp", "ppm")
    rows = {"media_id": [], "kind": [], "payload": [],
            "content_type": [], "width": [], "height": [], "duration_ms": []}
    for doc_id in t["doc_id"].to_pylist():
        kind = kinds[doc_id % 3]
        mid = f"m-{doc_id:08d}"
        w, h = 64 + (doc_id % 7) * 16, 48 + (doc_id % 5) * 16
        if kind == "video":
            dur = 3_000 + (doc_id % 11) * 500
        elif kind == "audio":
            dur = 2_000 + (doc_id % 13) * 250
        else:
            dur = 0
        rows["media_id"].append(mid)
        rows["kind"].append(kind)
        # every 37th payload is corrupt → decode_ok=False path; images
        # are REAL encoded files (PNG/BMP/PPM rotating by doc_id),
        # audio/video keep the stub header (no ffmpeg in container)
        if doc_id % 37 == 0:
            payload = b"corrupt"
            ctype = f"{kind}/fake"
        elif kind == "image":
            fmt = img_fmts[(doc_id // 3) % 3]
            payload = make_image_payload(mid, w, h, fmt=fmt)
            ctype = f"image/{fmt}"
        else:
            payload = make_fake_payload(mid, kind, w, h, dur)
            ctype = f"{kind}/fake"
        rows["payload"].append(payload)
        rows["content_type"].append(ctype)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    import pyarrow as pa_

    from ocr_poc_ray.functions.multimodal import MEDIA_SCHEMA

    tbl = pa_.Table.from_pydict(rows).cast(MEDIA_SCHEMA)
    return ray.data.from_arrow(tbl)


def mm_decode(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.multimodal import decode_media

    out = decode_media(_media_ds(sf_dir)).to_pandas()
    out = out[["media_id", "kind", "decode_ok", "width", "height", "duration_ms"]]
    return out.astype({"width": "int64", "height": "int64", "duration_ms": "int64"})


# The media table is deterministic from documents.doc_id (_media_ds
# above), so the decode stage's metadata IS SQL-expressible: the oracle
# re-derives media_id/kind/dimensions and the corrupt-payload rule
# (every 37th payload → decode_ok = false, -1 dims) relationally.
MM_DECODE_SQL = """
select printf('m-%08d', doc_id) as media_id,
       case doc_id % 3 when 0 then 'image' when 1 then 'audio' else 'video' end as kind,
       doc_id % 37 <> 0 as decode_ok,
       case when doc_id % 37 <> 0 then 64 + (doc_id % 7) * 16 else -1 end as width,
       case when doc_id % 37 <> 0 then 48 + (doc_id % 5) * 16 else -1 end as height,
       case when doc_id % 37 = 0 then -1
            when doc_id % 3 = 2 then 3000 + (doc_id % 11) * 500
            when doc_id % 3 = 1 then 2000 + (doc_id % 13) * 250
            else 0 end as duration_ms
from documents
"""


def mm_frame_sample(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.multimodal import sample_frames

    out = sample_frames(_media_ds(sf_dir), every_ms=1000).to_pandas()
    if len(out) == 0:  # no decodable videos: 0-row to_pandas drops columns
        return pd.DataFrame({"media_id": pd.Series([], dtype=object),
                             "frame_idx": pd.Series([], dtype="int64"),
                             "ts_ms": pd.Series([], dtype="int64")})
    return out.astype({"frame_idx": "int64", "ts_ms": "int64"})


MM_FRAME_SAMPLE_SQL = """
with v as (
  select printf('m-%08d', doc_id) as media_id,
         3000 + (doc_id % 11) * 500 as dur
  from documents
  where doc_id % 3 = 2 and doc_id % 37 <> 0
)
select media_id, ts_ms // 1000 as frame_idx, ts_ms
from (select media_id, unnest(range(0, dur, 1000)) as ts_ms from v)
"""


def mm_audio_windows(sf_dir: str) -> pd.DataFrame:
    """Audio modality leg of the multimodal plumbing: overlapping
    1000 ms / 500 ms-hop analysis windows per audio row — the
    actor-pool segmentation stage a transcription or audio-embedding
    pipeline feeds (decode kernel stubbed; schema/batching real).
    Metadata is deterministic from doc_id, so the oracle re-derives the
    windows relationally."""
    from ocr_poc_ray.functions.multimodal import window_audio

    out = window_audio(_media_ds(sf_dir), window_ms=1000, hop_ms=500).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"media_id": pd.Series([], dtype=object),
                             "window_idx": pd.Series([], dtype="int64"),
                             "start_ms": pd.Series([], dtype="int64"),
                             "end_ms": pd.Series([], dtype="int64")})
    return out.astype(
        {"window_idx": "int64", "start_ms": "int64", "end_ms": "int64"}
    )


MM_AUDIO_WINDOWS_SQL = """
with a as (
  select printf('m-%08d', doc_id) as media_id,
         2000 + (doc_id % 13) * 250 as dur
  from documents
  where doc_id % 3 = 1 and doc_id % 37 <> 0
)
select media_id, start_ms // 500 as window_idx, start_ms,
       least(start_ms + 1000, dur) as end_ms
from (select media_id, dur, unnest(range(0, dur, 500)) as start_ms from a)
"""


def mm_exact_dup(sf_dir: str) -> pd.DataFrame:
    """Binary-payload exact dedup — the image-corpus dedup every crawl
    pipeline runs before training.  Payloads here are REAL encoded
    images planted so content depends only on ``doc_id % 50`` (50 dup
    groups); the engine sees only opaque bytes: digest per row, then
    per-batch (digest → min id, count) partials and a per-digest
    combine — group count is bounded by distinct contents, never rows.
    The oracle re-derives winners relationally from the planted rule
    (same style as the other mm_ oracles)."""
    import hashlib

    from ocr_poc_ray.functions.multimodal import make_image_payload

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    _payloads: dict[int, bytes] = {}

    def _group_payload(gid: int) -> bytes:
        p = _payloads.get(gid)
        if p is None:
            fmt = ("png", "bmp", "ppm")[gid % 3]
            p = make_image_payload(
                f"g-{gid:04d}", 32 + (gid % 5) * 8, 24 + (gid % 3) * 8, fmt=fmt
            )
            _payloads[gid] = p
        return p

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return pa.table(
            {
                "media_id": pa.array([f"m-{i:08d}" for i in ids], pa.string()),
                "payload": pa.array(
                    [_group_payload(int(i) % 50) for i in ids], pa.binary()
                ),
            }
        )

    def digest_partial(batch: pa.Table) -> pd.DataFrame:
        dg = [hashlib.md5(p).hexdigest() for p in batch["payload"].to_pylist()]
        d = pd.DataFrame(
            {"digest": dg, "media_id": batch["media_id"].to_pylist()}
        )
        g = d.groupby("digest", as_index=False).agg(
            kept_media_id=("media_id", "min"), n_copies=("media_id", "size")
        )
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "kept_media_id": [g["kept_media_id"].min()],
                "n_copies": [int(g["n_copies"].sum())],
            }
        )

    out = (
        ds.map_batches(build, batch_format="pyarrow")
        .map_batches(digest_partial, batch_format="pyarrow")
        .groupby("digest")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    return out.astype({"n_copies": "int64"})


MM_EXACT_DUP_SQL = """
select printf('m-%08d', min(doc_id)) as kept_media_id,
       count(*)::BIGINT as n_copies
from documents
group by doc_id % 50
"""


_PHASH_GROUPS = 40


def _phash_media_ds(sf_dir: str) -> ray.data.Dataset:
    """Planted perceptual-dup media table (see mm_phash_neardup's
    docstring for the construction) — shared by the pair and the
    component pipelines."""
    import hashlib

    from ocr_poc_ray.functions.imagecodec import encode_png, resize_nn

    _cache: dict[tuple[int, int], bytes] = {}

    def _payload(gid: int, shift: int) -> bytes:
        key = (gid, shift)
        p = _cache.get(key)
        if p is None:
            bits = np.unpackbits(
                np.frombuffer(
                    hashlib.md5(f"phash-{gid}".encode()).digest()[:8], dtype=np.uint8
                )
            ).reshape(8, 8)
            luma = np.empty((8, 9), dtype=np.int32)
            luma[:, 0] = 128
            for c in range(8):
                luma[:, c + 1] = luma[:, c] + np.where(bits[:, c] == 1, 10, -10)
            rgb = np.repeat(luma[:, :, None], 3, axis=2).astype(np.uint8)
            big = resize_nn(rgb, 36, 32)
            p = encode_png(
                np.clip(big.astype(np.int32) + shift, 0, 255).astype(np.uint8)
            )
            _cache[key] = p
        return p

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(
                    [
                        _payload(int(i) % _PHASH_GROUPS, (int(i) // _PHASH_GROUPS) % 3)
                        for i in ids
                    ],
                    pa.binary(),
                ),
            }
        )

    return ds.map_batches(build, batch_format="pyarrow")


def mm_phash_neardup(sf_dir: str) -> pd.DataFrame:
    """Perceptual (dHash) image near-dup — the near-duplicate image
    screen a multimodal crawl runs after exact digest dedup: re-encoded
    or brightness-shifted copies share a dHash even though every byte
    differs.  Payloads are REAL PNGs planted so each ``doc_id % 40``
    group renders one md5-derived 8x8 gradient pattern, with a
    per-member uniform brightness shift (+0/+1/+2) that changes the
    bytes (and the md5 digest) but never flips a gradient sign — so the
    engine's decode -> luma -> 9x8 downsample -> gradient-sign hash
    lands identical within a group, and the md5-random cross-group
    hashes stay far apart (min pairwise hamming asserted in tests).
    The oracle re-derives the pair set relationally from the planted
    rule, same style as the other mm_ oracles."""
    from ocr_poc_ray.functions.multimodal import dhash_near_dup_pairs, image_dhash

    hashes = image_dhash(_phash_media_ds(sf_dir))
    out = dhash_near_dup_pairs(hashes, max_hamming=7, id_col="media_id").to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "hamming": pd.Series(dtype="int64")})
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return out.astype({"id_a": "int64", "id_b": "int64", "hamming": "int64"})


MM_PHASH_NEARDUP_SQL = f"""
select a.doc_id as id_a, b.doc_id as id_b, 0::BIGINT as hamming
from documents a join documents b
  on a.doc_id % {_PHASH_GROUPS} = b.doc_id % {_PHASH_GROUPS}
 and a.doc_id < b.doc_id
order by id_a, id_b
"""


def mm_phash_components(sf_dir: str) -> pd.DataFrame:
    """Multimodal → graph composition: decode → dHash → banded hamming
    pairs → DISTRIBUTED connected components → cluster roll-up (min id
    + size per perceptual-dup cluster).  Exactly the keep-one-per-
    cluster reduction an image-corpus dedup ships; the oracle re-derives
    clusters from the planted doc_id % 40 rule.  Isolated images (none
    here — every group has ≥2 members at sf ≥ 0.001) would be absent
    from the pair set and therefore from components, matching the SQL's
    HAVING count ≥ 2 guard."""
    from ocr_poc_ray.functions.dedup import connected_components_auto
    from ocr_poc_ray.functions.multimodal import dhash_near_dup_pairs, image_dhash

    hashes = image_dhash(_phash_media_ds(sf_dir))
    pairs = dhash_near_dup_pairs(hashes, max_hamming=7, id_col="media_id")
    pairs = pairs.map_batches(
        lambda b: b.rename(columns={"id_a": "doc_a", "id_b": "doc_b"}),
        batch_format="pandas",
    )
    comp = connected_components_auto(pairs).to_pandas()
    agg = comp.groupby("component", as_index=False).agg(
        n_members=("doc_id", "size")
    )
    out = pd.DataFrame(
        {
            "component": agg["component"].astype("int64"),
            "n_members": agg["n_members"].astype("int64"),
        }
    )
    return out.sort_values("component").reset_index(drop=True)


MM_PHASH_COMPONENTS_SQL = f"""
select min(doc_id)::BIGINT as component, count(*)::BIGINT as n_members
from documents
group by doc_id % {_PHASH_GROUPS}
having count(*) >= 2
order by component
"""


def fields_extract_synth(sf_dir: str) -> pd.DataFrame:
    """Typed-field extraction (the reference's 8-stage heuristic
    pipeline: regex parse, fuzzy anchors, spatial proximity, positional
    fallback) over the seeded span-doc corpus.  Golden equality is
    asserted in tests/test_fields.py; here the driver gets rows-only."""
    from ocr_poc_ray.stages.fields import extract_fields_ds
    from ocr_poc_ray.synth import generate_span_docs

    spans, _expected = generate_span_docs(n_docs=500, seed=99)
    ds = ray.data.from_arrow(spans).repartition(8)
    out = extract_fields_ds(ds, concurrency=(1, 4)).to_pandas()
    return out.astype({"quality_score": "float64", "confidence": "float64", "n_anchors": "int64"})


def fields_postprocessed(sf_dir: str) -> pd.DataFrame:
    """M4 slot end-to-end: typed-field extraction → actor-pool
    LLMPostProcessor (deterministic rule-based cleaner; the stage where
    a Qwen-style model would load once per actor — config.yaml:2-11).
    Rows-only: the cleaner's canonicalization is asserted against the
    pure function in tests/test_fields.py."""
    from ocr_poc_ray.stages.fields import extract_fields_ds
    from ocr_poc_ray.stages.postprocess import postprocess_fields
    from ocr_poc_ray.synth import generate_span_docs

    spans, _expected = generate_span_docs(n_docs=300, seed=99)
    ds = extract_fields_ds(ray.data.from_arrow(spans).repartition(4))
    out = postprocess_fields(ds).to_pandas()
    out = out[["doc_id", "layout", "success", "nom", "prenom", "postprocessed"]]
    return out.astype({"postprocessed": "bool"})


def xs_training_pipeline(sf_dir: str) -> pd.DataFrame:
    """The full training-data composite over real data: reshape →
    extract (actor pool) → conversation assembly (ordering) → batched
    embedding (actor-pool stub model) → embedding-cosine near-dup
    pairs.  Rows-only (the stub encoder has no SQL equivalent); every
    constituent stage is oracle- or golden-verified on its own."""
    from ocr_poc_ray.functions.similarity import embedding_near_dup_pairs
    from ocr_poc_ray.stages.embed import embed_text

    ds = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)
    docs = conversation_docs(ds)
    embedded = embed_text(docs, text_col="doc_text")
    pairs = embedding_near_dup_pairs(
        embedded, threshold=0.5, id_col="conv_id", vec_col="embedding"
    ).to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {"id_a": pd.Series([], dtype=object), "id_b": pd.Series([], dtype=object),
             "cosine": pd.Series([], dtype="float64")}
        )
    return pairs.astype({"cosine": "float64"})


def xs_conv_stats(sf_dir: str) -> pd.DataFrame:
    """Per-conversation rollup over real data with a SQL oracle:
    turn counts, success counts, and extracted-character totals —
    partial-agg per batch, tiny combine per conversation."""
    ds = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(n_chars=batch["extracted_text"].str.len())
        return b.groupby("conv_id", as_index=False).agg(
            n_turns=("turn_idx", "size"),
            n_success=("success", "sum"),
            total_chars=("n_chars", "sum"),
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": [group["conv_id"].iloc[0]],
                "n_turns": [int(group["n_turns"].sum())],
                "n_success": [int(group["n_success"].sum())],
                "total_chars": [int(group["total_chars"].sum())],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("conv_id")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype(
        {"n_turns": "int64", "n_success": "int64", "total_chars": "int64"}
    )


XS_CONV_STATS_SQL = rf"""
with e as (
  select source as conv_id,
         coalesce(regexp_replace(trim(array_to_string({_KEPT}, ' '),
                                      {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '') as extracted_text
  from documents
)
select conv_id, count(*) as n_turns,
       sum(case when extracted_text <> '' then 1 else 0 end)::BIGINT as n_success,
       sum(length(extracted_text))::BIGINT as total_chars
from e
group by conv_id
"""


def xs_turn_gaps(sf_dir: str) -> pd.DataFrame:
    """Per-conversation inter-turn timing over the transcript `ts`
    column: turn count, mean and max gap seconds — the cadence profile
    an agent-transcript curation pass reads (e.g. to find stalled or
    machine-generated conversations).

    Shape: the lag itself is the sort-based interior-final/edge-raw
    window (keyed_lag_delta over conv_id — exact across block splits);
    the rollup is per-batch partials + a hash-bucketed combine, so
    group cardinality (conversations) never becomes a task count.
    All gap math stays integer microseconds until the final division —
    the sums are exact in int64 and in SQL, so avg is bit-identical."""
    from ocr_poc_ray.functions.windows import keyed_lag_delta

    lag = keyed_lag_delta(
        _documents_as_transcripts(sf_dir),
        key_col="conv_id",
        ts_col="ts",
        order_col="turn_idx",
        key_dtype="object",
    )
    n_buckets = 8

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch.groupby("conv_id").agg(n_turns=("delta_us", "size"))
        gaps = batch[batch["delta_us"] >= 0].groupby("conv_id")["delta_us"].agg(
            n_gaps="count", sum_us="sum", max_us="max"
        )
        out = n.join(gaps, how="left").reset_index()
        out[["n_gaps", "sum_us"]] = out[["n_gaps", "sum_us"]].fillna(0)
        out["_hb"] = (
            pd.util.hash_array(out["conv_id"].to_numpy(dtype=object)) % n_buckets
        ).astype("int64")
        return out

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("conv_id", as_index=False).agg(
            n_turns=("n_turns", "sum"),
            n_gaps=("n_gaps", "sum"),
            sum_us=("sum_us", "sum"),
            max_us=("max_us", "max"),
        )
        has = g["n_gaps"] > 0
        g["avg_gap_s"] = np.where(
            has, ((g["sum_us"] / g["n_gaps"]) / 1_000_000).round(6), np.nan
        )
        g["max_gap_s"] = np.where(has, (g["max_us"] / 1_000_000.0).round(6), np.nan)
        return g[["conv_id", "n_turns", "avg_gap_s", "max_gap_s"]]

    out = (
        lag.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values("conv_id", kind="mergesort").reset_index(drop=True)
    return out.astype({"n_turns": "int64"})


# ts is BASE_TS_US + doc_id seconds (see _documents_as_transcripts), so
# the gap microseconds are (doc_id - lag(doc_id)) * 1e6 exactly.
XS_TURN_GAPS_SQL = """
with l as (
  select source as conv_id,
         (doc_id - lag(doc_id) over (partition by source order by doc_id))
           * 1000000 as gap_us
  from documents
)
select conv_id, count(*)::BIGINT as n_turns,
       round(avg(gap_us) / 1000000, 6) as avg_gap_s,
       round(max(gap_us) / 1000000.0, 6) as max_gap_s
from l group by conv_id order by conv_id
"""


def xs_extract_lang_stats(sf_dir: str) -> pd.DataFrame:
    """Pipeline composition over real data: the extraction output
    hash-joined back to the documents dimension (lang) — a distributed
    big-big join (the doc→lang map is corpus-sized, so NO broadcast),
    then a per-language partial-agg rollup (languages are few).  Joins
    follow the 0-row-block pitfall rule: repartition both inputs
    first (CLAUDE.md)."""
    ex = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)
    ex = ex.map_batches(
        lambda b: pd.DataFrame(
            {
                "turn_idx": b["turn_idx"].astype("int64"),
                "extracted_text": b["extracted_text"],
                "success": b["success"],
            }
        ),
        batch_format="pandas",
    ).repartition(8)
    langs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
    ).repartition(8)
    joined = ex.join(
        langs, "inner", num_partitions=8, on=("turn_idx",), right_on=("doc_id",)
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(n_chars=b["extracted_text"].str.len())
        return b.groupby("lang", as_index=False).agg(
            n_turns=("turn_idx", "size"),
            n_success=("success", "sum"),
            total_chars=("n_chars", "sum"),
        )

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("lang", as_index=False).agg(
        n_turns=("n_turns", "sum"),
        n_success=("n_success", "sum"),
        total_chars=("total_chars", "sum"),
    )
    return out.astype(
        {"n_turns": "int64", "n_success": "int64", "total_chars": "int64"}
    )


XS_EXTRACT_LANG_STATS_SQL = rf"""
with e as (
  select doc_id as turn_idx,
         coalesce(regexp_replace(trim(array_to_string({_KEPT}, ' '),
                                      {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '') as extracted_text
  from documents
)
select d.lang, count(*)::BIGINT as n_turns,
       sum(case when e.extracted_text <> '' then 1 else 0 end)::BIGINT
         as n_success,
       sum(length(e.extracted_text))::BIGINT as total_chars
from e join documents d on e.turn_idx = d.doc_id
group by d.lang
"""


def xs_role_stats(sf_dir: str) -> pd.DataFrame:
    """Per-role extraction rollup (turn counts, success, extracted
    characters) — transcripts' role balance is a first-order
    training-data measure.  The role dimension is deterministic from
    turn_idx (doc_id % 3 → user/assistant/tool), recomputed row-locally
    after extraction; partial-agg per batch, tiny combine (three
    roles)."""
    ds = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)
    roles = np.asarray(["user", "assistant", "tool"], dtype=object)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(
            role=roles[batch["turn_idx"].to_numpy(np.int64) % 3],
            n_chars=batch["extracted_text"].str.len(),
        )
        return b.groupby("role", as_index=False).agg(
            n_turns=("turn_idx", "size"),
            n_success=("success", "sum"),
            total_chars=("n_chars", "sum"),
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("role", as_index=False).agg(
        n_turns=("n_turns", "sum"),
        n_success=("n_success", "sum"),
        total_chars=("total_chars", "sum"),
    )
    return out.astype(
        {"n_turns": "int64", "n_success": "int64", "total_chars": "int64"}
    )


XS_ROLE_STATS_SQL = rf"""
with e as (
  select doc_id,
         case doc_id % 3 when 0 then 'user' when 1 then 'assistant'
              else 'tool' end as role,
         coalesce(regexp_replace(trim(array_to_string({_KEPT}, ' '),
                                      {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '') as extracted_text
  from documents
)
select role, count(*)::BIGINT as n_turns,
       sum(case when extracted_text <> '' then 1 else 0 end)::BIGINT
         as n_success,
       sum(length(extracted_text))::BIGINT as total_chars
from e
group by role
"""


def mm_resize(sf_dir: str) -> pd.DataFrame:
    """Image-resize leg of the multimodal plumbing: aspect-preserving
    fit into a 64-px box with integer-exact dimension math (the resize
    kernel itself is the stubbed codec slot; the actor-pool batching,
    binary payload output, and failure-skip protocol are real).  The
    query returns the metadata columns only — payload bytes stay inside
    the pipeline."""
    from ocr_poc_ray.functions.multimodal import resize_images

    out = resize_images(_media_ds(sf_dir), box=64).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"media_id": pd.Series([], dtype=object),
                             "new_width": pd.Series([], dtype="int64"),
                             "new_height": pd.Series([], dtype="int64")})
    out = out[["media_id", "new_width", "new_height"]]
    return out.astype({"new_width": "int64", "new_height": "int64"})


MM_RESIZE_SQL = """
with i as (
  select printf('m-%08d', doc_id) as media_id,
         64 + (doc_id % 7) * 16 as w, 48 + (doc_id % 5) * 16 as h
  from documents
  where doc_id % 3 = 0 and doc_id % 37 <> 0
)
select media_id,
       greatest(w * 64 // greatest(w, h), 1) as new_width,
       greatest(h * 64 // greatest(w, h), 1) as new_height
from i
"""


def xs_conv_dedup(sf_dir: str) -> pd.DataFrame:
    """Conversation-level exact dedup: fingerprint each conversation by
    the md5 of its ORDER-STABLE assembled document (the repeated-chat
    case of training-log curation — turn order matters, so this
    composes the ordering-shuffle assembly with hash dedup), keep the
    min conv_id per fingerprint.  Winner discovery is a bounded-bucket
    combine over (fingerprint, conv_id) pairs — conversation-count
    sized, never turn-sized."""
    import hashlib as _hl

    ds = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)
    docs = conversation_docs(ds)

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        # a conversation whose every turn extracted empty assembles to
        # doc_text '' — the SQL mirror's `extracted_text <> ''` filter
        # drops it before grouping, so drop it here too (latent on the
        # current corpus, but one fixture change would flip the oracle)
        batch = batch[batch["doc_text"] != ""]
        return pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "fp": [
                    _hl.md5(t.encode()).hexdigest() for t in batch["doc_text"]
                ],
            }
        )

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            _hb=(pd.util.hash_array(b["fp"].to_numpy(dtype=object)) % 16
                 ).astype("int64")
        )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        w = g.sort_values("conv_id", kind="mergesort").drop_duplicates("fp")
        return w[["conv_id", "fp"]]

    out = (
        docs.map_batches(fp, batch_format="pandas")
        .map_batches(bucket, batch_format="pandas")
        .groupby("_hb")
        .map_groups(keep_min, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                             "fp": pd.Series([], dtype=object)})
    return out


XS_CONV_DEDUP_SQL = rf"""
with e as (
  select source as conv_id, doc_id as turn_idx,
         coalesce(regexp_replace(trim(array_to_string({_KEPT}, ' '),
                                      {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '') as extracted_text
  from documents
), d as (
  select conv_id,
         string_agg(extracted_text, ' ' order by turn_idx) as doc_text
  from e where extracted_text <> '' group by conv_id
)
select conv_id, md5(doc_text) as fp from d
qualify row_number() over (partition by md5(doc_text) order by conv_id) = 1
"""


CTX_WINDOW_TURNS = 4


def xs_context_window_chars(sf_dir: str) -> pd.DataFrame:
    """Per-turn context-window budget: how many extracted characters
    the previous ≤4 turns of the same conversation contribute — the
    chat-template context-assembly measure, a keyed LAGGED rolling sum
    (rows between 4 preceding and 1 preceding).  One range-sort +
    vectorized per-block shift/rolling via keyed_sorted_match; string
    keys ride the object dtype path."""
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    k = CTX_WINDOW_TURNS
    ex = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)
    ex = ex.map_batches(
        lambda b: pd.DataFrame(
            {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].astype("int64"),
                "extracted_text": b["extracted_text"],
            }
        ),
        batch_format="pandas",
    )

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        lens = g["extracted_text"].str.len().astype("float64")
        sh = lens.groupby(g["conv_id"], sort=False).shift().fillna(0.0)
        ctx = (
            sh.groupby(g["conv_id"], sort=False)
            .rolling(k, min_periods=1)
            .sum()
            .reset_index(level=0, drop=True)
        )
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"].to_numpy(dtype=object),
                "turn_idx": g["turn_idx"].to_numpy(np.int64),
                "ctx_chars": ctx.to_numpy(np.int64),
            }
        )

    out = keyed_sorted_match(
        ex,
        key_col="conv_id",
        sort_cols=["turn_idx"],
        in_cols=["conv_id", "turn_idx", "extracted_text"],
        match_fn=_match,
        out_meta={"conv_id": "object", "turn_idx": "int64",
                  "ctx_chars": "int64"},
    ).to_pandas()
    return out.astype({"turn_idx": "int64", "ctx_chars": "int64"})


XS_CONTEXT_WINDOW_SQL = rf"""
with e as (
  select source as conv_id, doc_id as turn_idx,
         coalesce(regexp_replace(trim(array_to_string({_KEPT}, ' '),
                                      {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '') as extracted_text
  from documents
)
select conv_id, turn_idx,
       coalesce(sum(length(extracted_text)) over (
         partition by conv_id order by turn_idx
         rows between {CTX_WINDOW_TURNS} preceding and 1 preceding
       ), 0)::BIGINT as ctx_chars
from e
"""


# ---------------------------------------------------------------------------
# Span oracle: the per-turn kept-block spans of the flagship extractor,
# re-derived relationally — running char offsets over the normalized
# kept lines.  Proves the north-star "extracted text/spans match per
# turn" claim cell-by-cell in SQL, not just via the python invariant.
# ---------------------------------------------------------------------------

def xs_extract_spans_documents(sf_dir: str) -> pd.DataFrame:
    ds = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)
    out = ds.to_pandas()[["conv_id", "turn_idx", "extracted_text", "spans"]]
    return out.astype({"turn_idx": "int64"})


_NORM_L = rf"regexp_replace(trim(l, {_WS_CHARS}), '\s+', ' ', 'g')"

XS_EXTRACT_SPANS_SQL = rf"""
with e as (
  select source as conv_id, doc_id as turn_idx,
         list_filter(list_transform({_KEPT}, l -> {_NORM_L}),
                     x -> x <> '') as ks
  from documents
), u as (
  select conv_id, turn_idx,
         generate_subscripts(ks, 1) as i, unnest(ks) as k
  from e
), w as (
  select conv_id, turn_idx, i, k,
         sum(length(k) + 1) over (
             partition by conv_id, turn_idx order by i
             rows unbounded preceding
         ) - length(k) - 1 as s
  from u
), agg as (
  select conv_id, turn_idx,
         string_agg(k, ' ' order by i) as extracted_text,
         string_agg(s::VARCHAR || ':' || (s + length(k))::VARCHAR,
                    ';' order by i) as spans
  from w
  group by conv_id, turn_idx
)
select e.conv_id, e.turn_idx,
       coalesce(a.extracted_text, '') as extracted_text,
       coalesce(a.spans, '') as spans
from e
left join agg a using (conv_id, turn_idx)
"""


# ---------------------------------------------------------------------------
# Turn offsets inside the assembled conversation document: for every
# successful turn, the [start, end) char range its text occupies in
# the conversation_docs doc_text — the loss-masking / attribution
# primitive a training pipeline reads next to the assembled documents.
# One keyed integer cumsum (the edge-raw sorted window); exact int64,
# no float rounding.  Invariant vs xs_conv_docs_documents:
# doc_text[start_c:end_c] == extracted_text (asserted in tests).
# ---------------------------------------------------------------------------

def xs_conv_turn_offsets(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    ds = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["success"]]
        return pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(),
                "turn_idx": b["turn_idx"].to_numpy(np.int64),
                "w": b["extracted_text"].str.len().to_numpy(np.int64) + 1,
            }
        )

    narrow = ds.map_batches(project, batch_format="pandas")

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        cum = g.groupby("conv_id", sort=False)["w"].cumsum().to_numpy(np.int64)
        w = g["w"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"].to_numpy(),
                "turn_idx": g["turn_idx"].to_numpy(),
                "start_c": cum - w,
                "end_c": cum - 1,
            }
        )

    out = keyed_sorted_match(
        narrow,
        key_col="conv_id",
        sort_cols=["turn_idx"],
        in_cols=["conv_id", "turn_idx", "w"],
        match_fn=_match,
        out_meta={"conv_id": "object", "turn_idx": "int64",
                  "start_c": "int64", "end_c": "int64"},
    )
    return out.to_pandas().astype(
        {"turn_idx": "int64", "start_c": "int64", "end_c": "int64"}
    )


XS_CONV_TURN_OFFSETS_SQL = rf"""
with e as (
  select source as conv_id, doc_id as turn_idx,
         coalesce(regexp_replace(trim(array_to_string({_KEPT}, ' '),
                                      {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '') as extracted_text
  from documents
), s as (
  select conv_id, turn_idx, length(extracted_text) + 1 as w
  from e where extracted_text <> ''
)
select conv_id, turn_idx,
       (sum(w) over (partition by conv_id order by turn_idx
                     rows unbounded preceding) - w)::BIGINT as start_c,
       (sum(w) over (partition by conv_id order by turn_idx
                     rows unbounded preceding) - 1)::BIGINT as end_c
from s
"""


# ---------------------------------------------------------------------------
# Role-transition matrix: who speaks after whom.  The turn-taking
# structure audit of an agent-transcript corpus (e.g. tool→tool runs
# flag mis-threaded conversations).  The lag is the sort-based
# interior-final/edge-raw window over a 2-column projection (roles are
# deterministic from the order column itself, so only the previous
# turn_idx ships); transition counting is row-local with a 9-cell
# combine.
# ---------------------------------------------------------------------------

TOOLS = ("", "browse", "code", "search")


CTX_BUDGET_CHARS = 2000


def xs_truncate_to_budget(sf_dir: str) -> pd.DataFrame:
    """Right-aligned context truncation: per conversation keep the LAST
    turns whose cumulative character count fits the 2000-char budget —
    the context-trimming pass a chat-template data loader runs before
    tokenization (the newest turns survive, history drops).  A keyed
    suffix-cumsum: one range-sort, per-block reverse cumulative sums
    via keyed_sorted_match, string conversation keys on the object
    path.  Emits every turn with its tail_sum so the kept mask is
    auditable (not just the survivors)."""
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )

    def derive(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        return pd.DataFrame(
            {
                "conv_id": batch["source"].to_pandas().to_numpy(dtype=object),
                "turn_idx": batch["doc_id"].to_numpy(),
                "n_chars": pc.utf8_length(batch["text"]).to_numpy().astype("int64"),
            }
        )

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        # suffix sums: sort turn DESC inside each conversation, cumsum,
        # then emit in natural order
        g = group.sort_values(
            ["conv_id", "turn_idx"], ascending=[True, False], kind="mergesort"
        )
        tail = g.groupby("conv_id", sort=False)["n_chars"].cumsum()
        out = pd.DataFrame(
            {
                "conv_id": g["conv_id"].to_numpy(dtype=object),
                "turn_idx": g["turn_idx"].to_numpy(np.int64),
                "n_chars": g["n_chars"].to_numpy(np.int64),
                "tail_chars": tail.to_numpy(np.int64),
            }
        )
        out["kept"] = out["tail_chars"] <= CTX_BUDGET_CHARS
        return out

    out = keyed_sorted_match(
        ds.map_batches(derive, batch_format="pyarrow"),
        key_col="conv_id",
        sort_cols=["turn_idx"],
        in_cols=["conv_id", "turn_idx", "n_chars"],
        match_fn=_match,
        out_meta={"conv_id": "object", "turn_idx": "int64",
                  "n_chars": "int64", "tail_chars": "int64", "kept": "bool"},
    ).to_pandas()
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).astype(
        {"turn_idx": "int64", "n_chars": "int64",
         "tail_chars": "int64", "kept": "bool"}
    )


XS_TRUNCATE_TO_BUDGET_SQL = f"""
with t as (
  select source as conv_id, doc_id as turn_idx, length(text)::BIGINT as n_chars
  from documents
)
select conv_id, turn_idx, n_chars,
       sum(n_chars) over (partition by conv_id order by turn_idx desc
                          rows unbounded preceding)::BIGINT as tail_chars,
       sum(n_chars) over (partition by conv_id order by turn_idx desc
                          rows unbounded preceding) <= {CTX_BUDGET_CHARS} as kept
from t
order by conv_id, turn_idx
"""


def xs_tool_runs(sf_dir: str) -> pd.DataFrame:
    """Agent-loop detection: per-conversation runs of consecutive
    IDENTICAL tool calls in turn order — the transcript-quality signal
    that flags an agent stuck re-invoking one tool (long max_run) vs
    healthy tool mixing (many short runs).  Tool values derive from
    doc_id via the same Knuth multiplicative hash the role matrix uses
    (exact int64 arithmetic in both engines); runs via the
    ``keyed_streaks`` edge pattern — one range-sort, block-local run
    detection, per-key edge rows only in the bounded combine."""
    from ocr_poc_ray.functions.windows import keyed_streaks

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    tools = np.asarray(TOOLS, dtype=object)

    def derive(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "conv_id": batch["source"].to_pandas().to_numpy(dtype=object),
                "doc_id": ids,
                "turn_idx": ids,
                "tool": tools[(ids * 2654435761) % 4294967296 % 4],
            }
        )

    out = keyed_streaks(
        ds.map_batches(derive, batch_format="pyarrow"),
        key_col="conv_id",
        ts_col="doc_id",
        order_col="turn_idx",
        label_col="tool",
        key_dtype="object",
    ).to_pandas()
    out = out.rename(columns={"top_type": "top_tool"})
    return out.sort_values("conv_id").reset_index(drop=True).astype(
        {"n_runs": "int64", "max_run": "int64"}
    )


XS_TOOL_RUNS_SQL = """
with t as (
  select source as conv_id, doc_id,
         list_value('', 'browse', 'code', 'search')[
           (((doc_id * 2654435761) % 4294967296) % 4)::INT + 1] as tool
  from documents
), o as (
  select conv_id, doc_id, tool,
         case when lag(tool) over (partition by conv_id order by doc_id)
              is distinct from tool then 1 else 0 end as brk
  from t
), g as (
  select conv_id, tool,
         sum(brk) over (partition by conv_id order by doc_id
                        rows unbounded preceding) as grp
  from o
), r as (
  select conv_id, tool, count(*) as run_len from g group by conv_id, tool, grp
), m as (
  select conv_id, count(*)::BIGINT as n_runs, max(run_len)::BIGINT as max_run
  from r group by conv_id
)
select m.conv_id, m.n_runs, m.max_run, min(r.tool) as top_tool
from m join r on r.conv_id = m.conv_id and r.run_len = m.max_run
group by m.conv_id, m.n_runs, m.max_run
"""


def xs_role_transitions(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["source", "doc_id"], kind="mergesort")
        prev = g.groupby("source", sort=False)["doc_id"].shift()
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "prev_id": prev.fillna(-1).astype("int64").to_numpy(),
            }
        )

    lag = keyed_sorted_match(
        ds,
        key_col="source",
        sort_cols=["doc_id"],
        in_cols=["source", "doc_id"],
        match_fn=_match,
        out_meta={"doc_id": "int64", "prev_id": "int64"},
    )
    roles = np.asarray(["user", "assistant", "tool"], dtype=object)

    # Knuth multiplicative hash decorrelates role from the fixed
    # doc_id stride inside a source (plain doc_id % 3 collapses the
    # matrix to 3 cells); exact int64 arithmetic in both engines.
    def _role_idx(ids: np.ndarray) -> np.ndarray:
        return (ids * 2654435761) % 4294967296 % 3

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["prev_id"] >= 0]
        if b.empty:
            return pd.DataFrame(
                {"prev_role": pd.Series([], dtype=object),
                 "role": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        d = pd.DataFrame(
            {"prev_role": roles[_role_idx(b["prev_id"].to_numpy())],
             "role": roles[_role_idx(b["doc_id"].to_numpy())]}
        )
        g = d.groupby(["prev_role", "role"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    parts = lag.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby(["prev_role", "role"], as_index=False)["n"].sum()
    return out.astype({"n": "int64"})


XS_ROLE_TRANSITIONS_SQL = """
with t as (
  select doc_id,
         lag(doc_id) over (partition by source order by doc_id) as prev_id
  from documents
)
select case (prev_id * 2654435761) % 4294967296 % 3
            when 0 then 'user' when 1 then 'assistant'
            else 'tool' end as prev_role,
       case (doc_id * 2654435761) % 4294967296 % 3
            when 0 then 'user' when 1 then 'assistant'
            else 'tool' end as role,
       count(*)::BIGINT as n
from t
where prev_id is not null
group by 1, 2
"""


def xs_dialogue_pairs(sf_dir: str) -> pd.DataFrame:
    """Instruction-tuning pair mining: adjacent (user → assistant)
    turns per conversation become (prompt, response) training pairs —
    the SFT-pair extraction every chat-data pipeline runs.  Roles come
    from the same Knuth hash ``xs_role_stats`` uses; adjacency is a
    per-conversation lag through the distributed ``keyed_sorted_match``
    (interior batches vectorized, one bounded edge combine), so no
    conversation is ever collected whole on the driver."""
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )

    def tlen(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "source": batch["source"],
                "doc_id": batch["doc_id"],
                # corpus is ASCII (CLAUDE.md) so chars == bytes == DuckDB length()
                "tlen": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            }
        )

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["source", "doc_id"], kind="mergesort")
        by = g.groupby("source", sort=False)
        return pd.DataFrame(
            {
                "source": g["source"].to_numpy(),
                "doc_id": g["doc_id"].to_numpy(),
                "tlen": g["tlen"].to_numpy(),
                "prev_id": by["doc_id"].shift().fillna(-1).astype("int64").to_numpy(),
                "prev_len": by["tlen"].shift().fillna(-1).astype("int64").to_numpy(),
            }
        )

    lag = keyed_sorted_match(
        ds.map_batches(tlen, batch_format="pyarrow"),
        key_col="source",
        sort_cols=["doc_id"],
        in_cols=["source", "doc_id", "tlen"],
        match_fn=_match,
        out_meta={"source": "object", "doc_id": "int64", "tlen": "int64",
                  "prev_id": "int64", "prev_len": "int64"},
    )

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        prev = batch["prev_id"].to_numpy()
        cur = batch["doc_id"].to_numpy()
        keep = (
            (prev >= 0)
            & ((prev * 2654435761) % 4294967296 % 3 == 0)  # prompt: user
            & ((cur * 2654435761) % 4294967296 % 3 == 1)  # response: assistant
        )
        b = batch[keep]
        return pd.DataFrame(
            {
                "conv_id": b["source"].to_numpy(),
                "prompt_id": b["prev_id"].to_numpy(),
                "response_id": b["doc_id"].to_numpy(),
                "prompt_chars": b["prev_len"].to_numpy(),
                "response_chars": b["tlen"].to_numpy(),
            }
        )

    out = lag.map_batches(pairs, batch_format="pandas").to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {"conv_id": pd.Series([], dtype=object)}
            | {c: pd.Series([], dtype="int64")
               for c in ("prompt_id", "response_id", "prompt_chars", "response_chars")}
        )
    return out.astype(
        {c: "int64" for c in ("prompt_id", "response_id", "prompt_chars", "response_chars")}
    )


XS_DIALOGUE_PAIRS_SQL = """
with t as (
  select source, doc_id, length(text) as tlen,
         lag(doc_id) over (partition by source order by doc_id) as prev_id,
         lag(length(text)) over (partition by source order by doc_id) as prev_len
  from documents
)
select source as conv_id,
       prev_id as prompt_id, doc_id as response_id,
       prev_len as prompt_chars, tlen as response_chars
from t
where prev_id is not null
  and (prev_id * 2654435761) % 4294967296 % 3 = 0
  and (doc_id * 2654435761) % 4294967296 % 3 = 1
"""


# ---------------------------------------------------------------------------
# Role balance — the degenerate-conversation gate.  A healthy agent
# transcript has comparable user and assistant character volume; a
# conversation where one side is >10× the other is a training-data
# smell (prompt spam, runaway generation, scraped monologue).  Pure
# integer arithmetic end to end (no float ratio → no rounding-boundary
# risk at the oracle): per-batch (conv, role) partial char sums, one
# bounded combine (convs × 3 rows), row-local pivot + flag.
# ---------------------------------------------------------------------------

ROLE_BALANCE_FACTOR = 10  # degenerate when one side exceeds 10× the other


def xs_role_balance(sf_dir: str) -> pd.DataFrame:
    """Per-conversation user/assistant/tool char volume and an
    integer-exact degeneracy flag.  Roles derive from doc_id via the
    Knuth permutation (the dialogue-pairs derivation)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source", "text"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        role = (ids * 2654435761) % 4294967296 % 3
        b = pd.DataFrame(
            {
                "conv_id": batch["source"].to_numpy(dtype=object),
                "role": role,
                "nc": batch["text"].str.len().to_numpy(np.int64),
            }
        )
        g = b.groupby(["conv_id", "role"], as_index=False).agg(nc=("nc", "sum"))
        g["_hb"] = (
            pd.util.hash_array(g["conv_id"].to_numpy(dtype=object)) % 16
        ).astype("int64")
        return g

    def combine(grp: pd.DataFrame) -> pd.DataFrame:
        return grp.groupby(["conv_id", "role"], as_index=False).agg(
            nc=("nc", "sum")
        )

    # conv-count-sized combine stays DISTRIBUTED (hash buckets partition
    # conversations); only the final per-conv result is collected — the
    # query's own output.
    g = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if g.empty:  # 0-row to_pandas drops columns (CLAUDE.md pitfall)
        return pd.DataFrame(
            {"conv_id": pd.Series([], dtype=object),
             "user_chars": pd.Series([], dtype="int64"),
             "assistant_chars": pd.Series([], dtype="int64"),
             "tool_chars": pd.Series([], dtype="int64"),
             "degenerate": pd.Series([], dtype="bool")}
        )
    wide = g.pivot_table(
        index="conv_id", columns="role", values="nc", aggfunc="sum", fill_value=0
    )
    out = pd.DataFrame({"conv_id": wide.index.to_numpy(dtype=object)})
    for j, name in enumerate(["user", "assistant", "tool"]):
        col = wide.get(j)
        out[f"{name}_chars"] = (
            col.to_numpy(np.int64) if col is not None else np.zeros(len(out), np.int64)
        )
    u = out["user_chars"].to_numpy(np.int64)
    a = out["assistant_chars"].to_numpy(np.int64)
    out["degenerate"] = (a > u * ROLE_BALANCE_FACTOR) | (u > a * ROLE_BALANCE_FACTOR)
    return (
        out.sort_values("conv_id")
        .reset_index(drop=True)
        .astype(
            {"user_chars": "int64", "assistant_chars": "int64",
             "tool_chars": "int64", "degenerate": "bool"}
        )
    )


XS_ROLE_BALANCE_SQL = f"""
with t as (
  select source as conv_id,
         (doc_id * 2654435761) % 4294967296 % 3 as role,
         length(text) as nc
  from documents
), g as (
  select conv_id,
         sum(case when role = 0 then nc else 0 end)::BIGINT as user_chars,
         sum(case when role = 1 then nc else 0 end)::BIGINT as assistant_chars,
         sum(case when role = 2 then nc else 0 end)::BIGINT as tool_chars
  from t group by conv_id
)
select conv_id, user_chars, assistant_chars, tool_chars,
       (assistant_chars > user_chars * {ROLE_BALANCE_FACTOR}
        or user_chars > assistant_chars * {ROLE_BALANCE_FACTOR}) as degenerate
from g
"""


# ---------------------------------------------------------------------------
# First-turn (prompt-template) dedup — conversations opening with an
# identical first turn share a prompt template; at crawl scale the
# template census drives both dedup (keep k per template) and mixture
# design.  Shape: per-batch (conv, min turn) partials → bounded
# combine → broadcast sorted (conv → first-turn) arrays → one filtered
# scan md5s ONLY the first turns → tiny template groupby.  Nothing
# text-sized shuffles; the broadcast is O(conversations).
# ---------------------------------------------------------------------------


def _first_turn_hashes(sf_dir: str) -> pd.DataFrame:
    """(conv_id, template_hash) — md5 of each conversation's first-turn
    text.  Shared by the template census and the leakage-safe split."""
    import hashlib

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source", "text"]
    )

    def partial_min(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "conv_id": batch["source"].to_numpy(dtype=object),
                    "doc_id": batch["doc_id"].to_numpy(np.int64),
                }
            )
            .groupby("conv_id", as_index=False)
            .agg(first_id=("doc_id", "min"))
            .assign(
                _hb=lambda g: (
                    pd.util.hash_array(g["conv_id"].to_numpy(dtype=object)) % 16
                ).astype("int64")
            )
        )

    def combine_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("conv_id", as_index=False).agg(
            first_id=("first_id", "min")
        )

    # conv-count-sized min combine stays distributed (buckets partition
    # conversations); the collected result feeds the broadcast below —
    # at crawl scale that broadcast is the membership_flag size switch.
    firsts = (
        ds.map_batches(partial_min, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine_min, batch_format="pandas")
        .to_pandas()
    )
    if firsts.empty:  # 0-row to_pandas drops columns (CLAUDE.md pitfall)
        firsts = pd.DataFrame(
            {"conv_id": pd.Series([], dtype=object),
             "first_id": pd.Series([], dtype="int64")}
        )
    convs = firsts["conv_id"].to_numpy(dtype=object)
    order = np.argsort(convs, kind="stable")
    convs_ref = ray.put(convs[order])
    ids_ref = ray.put(firsts["first_id"].to_numpy(np.int64)[order])

    def hash_first_turns(batch: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(convs_ref)
        fid = ray.get(ids_ref)
        conv = batch["source"].to_numpy(dtype=object)
        ids = batch["doc_id"].to_numpy(np.int64)
        idx = np.searchsorted(cs, conv)
        keep = fid[idx] == ids
        b = batch[keep]
        return pd.DataFrame(
            {
                "conv_id": b["source"].to_numpy(dtype=object),
                # explicit object dtype: an all-filtered batch must not
                # degrade the column to float64 (schema flip-flop)
                "template_hash": pd.Series(
                    [
                        hashlib.md5(t.encode("utf-8", "ignore")).hexdigest()
                        for t in b["text"].to_list()
                    ],
                    dtype=object,
                ),
            }
        )

    out = ds.map_batches(hash_first_turns, batch_format="pandas").to_pandas()
    if out.empty:  # 0-row to_pandas drops columns (CLAUDE.md pitfall)
        return pd.DataFrame(
            {"conv_id": pd.Series([], dtype=object),
             "template_hash": pd.Series([], dtype=object)}
        )
    return out


def xs_first_turn_dedup(sf_dir: str) -> pd.DataFrame:
    """Template census: md5 of each conversation's first turn text,
    with conversation counts and the lexicographically first conv_id
    as the representative."""
    hashed = _first_turn_hashes(sf_dir)
    out = hashed.groupby("template_hash", as_index=False).agg(
        n_convs=("conv_id", "size"), first_conv=("conv_id", "min")
    )
    return (
        out.sort_values("template_hash")
        .reset_index(drop=True)
        .astype({"n_convs": "int64"})
    )


XS_FIRST_TURN_DEDUP_SQL = """
with m as (
  select source as conv_id, min(doc_id) as first_id
  from documents group by source
)
select md5(d.text) as template_hash,
       count(*)::BIGINT as n_convs,
       min(d.source) as first_conv
from documents d join m on d.source = m.conv_id and d.doc_id = m.first_id
group by md5(d.text)
"""


# ---------------------------------------------------------------------------
# Template-safe train/val split — the leakage unit for transcripts is
# the prompt template, not the conversation: two conversations opening
# with the same template share enough structure that putting one in
# train and one in val leaks.  Split assignment is a pure function of
# the template hash (an integer md5-prefix fraction, the
# doc_train_split idiom), so same-template conversations land on the
# same side BY CONSTRUCTION, the split is stable under corpus growth,
# and both engines compare the same integers.
# ---------------------------------------------------------------------------

TEMPLATE_TRAIN_PCT = 90


def xs_template_safe_split(sf_dir: str) -> pd.DataFrame:
    """Per-conversation train/val assignment keyed on the first-turn
    template hash."""
    hashed = _first_turn_hashes(sf_dir)
    frac = np.asarray(
        [int(h[:8], 16) % 100 for h in hashed["template_hash"]], dtype=np.int64
    )
    out = pd.DataFrame(
        {
            "conv_id": hashed["conv_id"].to_numpy(dtype=object),
            "template_hash": hashed["template_hash"].to_numpy(dtype=object),
            "split": np.where(frac < TEMPLATE_TRAIN_PCT, "train", "val").astype(
                object
            ),
        }
    )
    return out.sort_values("conv_id").reset_index(drop=True)


XS_TEMPLATE_SAFE_SPLIT_SQL = f"""
with m as (
  select source as conv_id, min(doc_id) as first_id
  from documents group by source
)
select d.source as conv_id, md5(d.text) as template_hash,
       case when ('0x' || substr(md5(d.text), 1, 8))::BIGINT % 100
                 < {TEMPLATE_TRAIN_PCT} then 'train' else 'val' end as split
from documents d join m on d.source = m.conv_id and d.doc_id = m.first_id
"""


# ---------------------------------------------------------------------------
# Sliding window export — overlapping fixed-size turn windows (window
# 8, stride 4) per conversation: the training-data shape for long
# conversations that exceed the context budget (each window is one
# training example; the overlap preserves cross-boundary turns).  One
# range-sort; each complete conversation is windowed inside
# `keyed_sorted_match` (rank → the ≤2 windows a turn belongs to →
# in-kernel aggregate), so output is O(turns / stride) window rows and
# nothing per-turn shuffles twice.
# ---------------------------------------------------------------------------

WINDOW_TURNS = 8
WINDOW_STRIDE = 4


def xs_window_export(sf_dir: str) -> pd.DataFrame:
    """Per (conversation, window) spans: start/end turn ids, turn count
    and char volume, windows anchored every ``WINDOW_STRIDE`` ranks."""
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source", "text"]
    )

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": batch["source"].to_numpy(dtype=object),
                "turn_idx": batch["doc_id"].to_numpy(np.int64),
                "nc": batch["text"].str.len().to_numpy(np.int64),
            }
        )

    narrow = ds.map_batches(project, batch_format="pandas")

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        r = g.groupby("conv_id", sort=False).cumcount().to_numpy(np.int64)
        w0 = r // WINDOW_STRIDE
        frames = []
        for w in (w0, w0 - 1):
            keep = w >= 0
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": g["conv_id"].to_numpy(dtype=object)[keep],
                        "window_id": w[keep],
                        "turn_idx": g["turn_idx"].to_numpy(np.int64)[keep],
                        "nc": g["nc"].to_numpy(np.int64)[keep],
                    }
                )
            )
        e = pd.concat(frames, ignore_index=True)
        return e.groupby(["conv_id", "window_id"], as_index=False).agg(
            start_turn=("turn_idx", "min"),
            end_turn=("turn_idx", "max"),
            n_turns=("turn_idx", "size"),
            n_chars=("nc", "sum"),
        )

    out = keyed_sorted_match(
        narrow,
        key_col="conv_id",
        sort_cols=["turn_idx"],
        in_cols=["conv_id", "turn_idx", "nc"],
        match_fn=_match,
        out_meta={
            "conv_id": "object", "window_id": "int64", "start_turn": "int64",
            "end_turn": "int64", "n_turns": "int64", "n_chars": "int64",
        },
    ).to_pandas()
    if out.empty:  # 0-row to_pandas drops columns (CLAUDE.md pitfall)
        return pd.DataFrame(
            {"conv_id": pd.Series([], dtype=object),
             "window_id": pd.Series([], dtype="int64"),
             "start_turn": pd.Series([], dtype="int64"),
             "end_turn": pd.Series([], dtype="int64"),
             "n_turns": pd.Series([], dtype="int64"),
             "n_chars": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values(["conv_id", "window_id"])
        .reset_index(drop=True)
        .astype(
            {"window_id": "int64", "start_turn": "int64", "end_turn": "int64",
             "n_turns": "int64", "n_chars": "int64"}
        )
    )


XS_WINDOW_EXPORT_SQL = f"""
with r as (
  select source as conv_id, doc_id as turn_idx, length(text) as nc,
         row_number() over (partition by source order by doc_id) - 1 as r
  from documents
), e as (
  select conv_id, turn_idx, nc,
         unnest(list_value(r // {WINDOW_STRIDE}, r // {WINDOW_STRIDE} - 1)) as w
  from r
)
select conv_id, w as window_id,
       min(turn_idx)::BIGINT as start_turn,
       max(turn_idx)::BIGINT as end_turn,
       count(*)::BIGINT as n_turns,
       sum(nc)::BIGINT as n_chars
from e
where w >= 0
group by conv_id, w
"""


def xs_window_export_text(sf_dir: str) -> pd.DataFrame:
    """The materializing sibling of ``xs_window_export``: each window's
    TRAINING EXAMPLE TEXT — member turns joined with a single space in
    turn order.  The ≤ window/stride duplication of overlap export is
    inherent; everything else is the same one-sort kernel, so output
    bytes ≈ 2× corpus and still O(turns/stride) rows."""
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source", "text"]
    )

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": batch["source"].to_numpy(dtype=object),
                "turn_idx": batch["doc_id"].to_numpy(np.int64),
                "text": batch["text"].to_numpy(dtype=object),
            }
        )

    narrow = ds.map_batches(project, batch_format="pandas")

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        r = g.groupby("conv_id", sort=False).cumcount().to_numpy(np.int64)
        w0 = r // WINDOW_STRIDE
        frames = []
        for w in (w0, w0 - 1):
            keep = w >= 0
            frames.append(
                pd.DataFrame(
                    {
                        "conv_id": g["conv_id"].to_numpy(dtype=object)[keep],
                        "window_id": w[keep],
                        "turn_idx": g["turn_idx"].to_numpy(np.int64)[keep],
                        "text": g["text"].to_numpy(dtype=object)[keep],
                    }
                )
            )
        e = pd.concat(frames, ignore_index=True).sort_values(
            ["conv_id", "window_id", "turn_idx"], kind="mergesort"
        )
        return e.groupby(["conv_id", "window_id"], as_index=False).agg(
            window_text=("text", " ".join)
        )

    out = keyed_sorted_match(
        narrow,
        key_col="conv_id",
        sort_cols=["turn_idx"],
        in_cols=["conv_id", "turn_idx", "text"],
        match_fn=_match,
        out_meta={
            "conv_id": "object", "window_id": "int64", "window_text": "object",
        },
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"conv_id": pd.Series([], dtype=object),
             "window_id": pd.Series([], dtype="int64"),
             "window_text": pd.Series([], dtype=object)}
        )
    return (
        out.sort_values(["conv_id", "window_id"])
        .reset_index(drop=True)
        .astype({"window_id": "int64"})
    )


XS_WINDOW_EXPORT_TEXT_SQL = f"""
with r as (
  select source as conv_id, doc_id as turn_idx, text,
         row_number() over (partition by source order by doc_id) - 1 as r
  from documents
), e as (
  select conv_id, turn_idx, text,
         unnest(list_value(r // {WINDOW_STRIDE}, r // {WINDOW_STRIDE} - 1)) as w
  from r
)
select conv_id, w as window_id,
       string_agg(text, ' ' order by turn_idx) as window_text
from e
where w >= 0
group by conv_id, w
"""


# ---------------------------------------------------------------------------
# Transcript curation composite — the end-to-end "what ships to
# training" pipeline for conversations, one oracle: extract every turn
# → drop degenerate conversations (role balance) → drop duplicate
# conversations (order-stable assembled fingerprint, min-conv winner)
# → keep the template-safe TRAIN side → per-conversation rollup of the
# surviving extracted turns.  The conv-level gates are each
# conversation-count sized (every stage's own query returns them to
# the driver anyway); the final pass broadcasts the sorted survivor
# array and aggregates turn partials in one scan.  At crawl scale the
# driver intersect becomes the `membership_flag` broadcast↔bloom
# switch — the same size-switch every other gate in the repo uses.
# ---------------------------------------------------------------------------


def xs_curation_pipeline(sf_dir: str) -> pd.DataFrame:
    """Surviving conversations with extracted-turn counts and char
    volume after the role gate, exact conv dedup, and train-side
    template split."""
    balance = xs_role_balance(sf_dir)
    ok_balance = set(balance.loc[~balance["degenerate"], "conv_id"])
    winners = set(xs_conv_dedup(sf_dir)["conv_id"])
    split = xs_template_safe_split(sf_dir)
    train = set(split.loc[split["split"] == "train", "conv_id"])
    survivors = np.sort(
        np.asarray(list(ok_balance & winners & train), dtype=object)
    )
    surv_ref = ray.put(survivors)

    ds = extract_transcripts(_documents_as_transcripts(sf_dir), ordered=False)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["success"]]
        conv = b["conv_id"].to_numpy(dtype=object)
        sv = ray.get(surv_ref)
        if len(sv):
            idx = np.searchsorted(sv, conv)
            idx = np.minimum(idx, len(sv) - 1)
            b = b[sv[idx] == conv]
        else:
            b = b.iloc[:0]
        g = pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(dtype=object),
                "nc": b["extracted_text"].str.len().to_numpy(np.int64),
            }
        )
        return g.groupby("conv_id", as_index=False).agg(
            n_turns=("nc", "size"), total_chars=("nc", "sum")
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"conv_id": pd.Series([], dtype=object),
             "n_turns": pd.Series([], dtype="int64"),
             "total_chars": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("conv_id", as_index=False).agg(
        n_turns=("n_turns", "sum"), total_chars=("total_chars", "sum")
    )
    return (
        out.sort_values("conv_id")
        .reset_index(drop=True)
        .astype({"n_turns": "int64", "total_chars": "int64"})
    )


XS_CURATION_PIPELINE_SQL = rf"""
with t as (
  select source as conv_id, doc_id,
         (doc_id * 2654435761) % 4294967296 % 3 as role, text
  from documents
), bal as (
  select conv_id
  from (
    select conv_id,
           sum(case when role = 0 then length(text) else 0 end) as uc,
           sum(case when role = 1 then length(text) else 0 end) as ac
    from t group by conv_id
  )
  where not (ac > uc * {ROLE_BALANCE_FACTOR} or uc > ac * {ROLE_BALANCE_FACTOR})
), e as (
  select source as conv_id, doc_id as turn_idx,
         coalesce(regexp_replace(trim(array_to_string({_KEPT}, ' '),
                                      {_WS_CHARS}),
                                 '\s+', ' ', 'g'), '') as extracted_text
  from documents
), d as (
  select conv_id,
         string_agg(extracted_text, ' ' order by turn_idx) as doc_text
  from e where extracted_text <> '' group by conv_id
), win as (
  select conv_id from d
  qualify row_number() over (partition by md5(doc_text) order by conv_id) = 1
), m as (
  select source as conv_id, min(doc_id) as first_id from documents group by source
), tr as (
  select d2.source as conv_id
  from documents d2 join m on d2.source = m.conv_id and d2.doc_id = m.first_id
  where ('0x' || substr(md5(d2.text), 1, 8))::BIGINT % 100 < {TEMPLATE_TRAIN_PCT}
)
select e.conv_id, count(*)::BIGINT as n_turns,
       sum(length(e.extracted_text))::BIGINT as total_chars
from e
join bal on e.conv_id = bal.conv_id
join win on e.conv_id = win.conv_id
join tr on e.conv_id = tr.conv_id
where e.extracted_text <> ''
group by e.conv_id
"""


# ---------------------------------------------------------------------------
# Tool latency audit — how long each tool keeps the conversation
# waiting: for every tool turn, the gap to the NEXT turn in the
# conversation (the tool's wall-cost as the transcript records it).
# The lead is the one-sort edge pattern; totals stay integer seconds
# (ts spacing is integral in the fixture shape), so no float crosses
# the oracle boundary.
# ---------------------------------------------------------------------------


def xs_tool_latency(sf_dir: str) -> pd.DataFrame:
    """(tool, n_calls, total_gap_s) over tool turns that have a next
    turn; tools derive from doc_id via the Knuth permutation (the
    xs_tool_runs derivation)."""
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    tools = np.asarray(TOOLS, dtype=object)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "conv_id": batch["source"].to_numpy(dtype=object),
                "turn_idx": ids,
                "tool_code": (ids * 2654435761) % 4294967296 % 4,
            }
        )

    narrow = ds.map_batches(project, batch_format="pandas")

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy(dtype=object)
        t = g["turn_idx"].to_numpy(np.int64)
        code = g["tool_code"].to_numpy(np.int64)
        nxt_same = np.empty(len(g), dtype=bool)
        nxt_same[:-1] = conv[1:] == conv[:-1]
        if len(g):
            nxt_same[-1] = False
        gap = np.empty(len(g), dtype=np.int64)
        gap[:-1] = t[1:] - t[:-1]  # ts spacing = 1 s per doc_id unit
        keep = nxt_same & (code != 0)
        return pd.DataFrame({"tool_code": code[keep], "gap_s": gap[keep]})

    emitted = keyed_sorted_match(
        narrow,
        key_col="conv_id",
        sort_cols=["turn_idx"],
        in_cols=["conv_id", "turn_idx", "tool_code"],
        match_fn=_match,
        out_meta={"tool_code": "int64", "gap_s": "int64"},
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("tool_code", as_index=False).agg(
            n_calls=("gap_s", "size"), total_gap_s=("gap_s", "sum")
        )

    parts = emitted.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"tool": pd.Series([], dtype=object),
             "n_calls": pd.Series([], dtype="int64"),
             "total_gap_s": pd.Series([], dtype="int64")}
        )
    g = parts.groupby("tool_code", as_index=False).agg(
        n_calls=("n_calls", "sum"), total_gap_s=("total_gap_s", "sum")
    )
    out = pd.DataFrame(
        {
            "tool": tools[g["tool_code"].to_numpy(np.int64)],
            "n_calls": g["n_calls"].to_numpy(np.int64),
            "total_gap_s": g["total_gap_s"].to_numpy(np.int64),
        }
    )
    return (
        out.sort_values("tool", kind="mergesort")
        .reset_index(drop=True)
        .astype({"n_calls": "int64", "total_gap_s": "int64"})
    )


XS_TOOL_LATENCY_SQL = """
with t as (
  select source as conv_id, doc_id,
         list_value('', 'browse', 'code', 'search')[
           (((doc_id * 2654435761) % 4294967296) % 4)::INT + 1] as tool,
         lead(doc_id) over (partition by source order by doc_id) as nxt
  from documents
)
select tool, count(*)::BIGINT as n_calls,
       sum(nxt - doc_id)::BIGINT as total_gap_s
from t
where tool <> '' and nxt is not null
group by tool
"""


def xs_tool_transitions(sf_dir: str) -> pd.DataFrame:
    """Tool-chain Markov counts: (tool_from, tool_to, n) over successive
    TOOL turns inside a conversation — the agent-trace audit that shows
    which tool tends to follow which (search→browse→code chains, tight
    self-loops).  Non-tool turns are dropped BEFORE the lag, so the
    transition is between consecutive tool invocations, not adjacent
    rows; the lag runs through the distributed ``keyed_sorted_match``
    (interior batches vectorized, one bounded edge combine) and the
    combine is a ≤9-cell groupby.  Tools derive from doc_id via the
    ``xs_tool_runs`` Knuth permutation."""
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    tools = np.asarray(TOOLS, dtype=object)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(np.int64)
        code = (ids * 2654435761) % 4294967296 % 4
        keep = code != 0  # tool turns only — the lag is over tool calls
        return pd.DataFrame(
            {
                "conv_id": batch["source"].to_numpy(dtype=object)[keep],
                "turn_idx": ids[keep],
                "tool_code": code[keep],
            }
        )

    narrow = ds.map_batches(project, batch_format="pandas")

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy(dtype=object)
        code = g["tool_code"].to_numpy(np.int64)
        same = np.empty(len(g), dtype=bool)
        same[:1] = False
        same[1:] = conv[1:] == conv[:-1]
        prev = np.empty(len(g), dtype=np.int64)
        prev[:1] = -1
        prev[1:] = code[:-1]
        return pd.DataFrame({"from_code": prev[same], "to_code": code[same]})

    emitted = keyed_sorted_match(
        narrow,
        key_col="conv_id",
        sort_cols=["turn_idx"],
        in_cols=["conv_id", "turn_idx", "tool_code"],
        match_fn=_match,
        out_meta={"from_code": "int64", "to_code": "int64"},
    )

    parts = (
        emitted.map_batches(
            lambda b: b.groupby(["from_code", "to_code"], as_index=False).size()
            .rename(columns={"size": "n"}),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame(
            {"tool_from": pd.Series([], dtype=object),
             "tool_to": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64")}
        )
    g = parts.groupby(["from_code", "to_code"], as_index=False)["n"].sum()
    out = pd.DataFrame(
        {
            "tool_from": tools[g["from_code"].to_numpy(np.int64)],
            "tool_to": tools[g["to_code"].to_numpy(np.int64)],
            "n": g["n"].to_numpy(np.int64),
        }
    )
    return (
        out.sort_values(["tool_from", "tool_to"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"n": "int64"})
    )


XS_TOOL_TRANSITIONS_SQL = """
with t as (
  select source as conv_id, doc_id,
         list_value('', 'browse', 'code', 'search')[
           (((doc_id * 2654435761) % 4294967296) % 4)::INT + 1] as tool
  from documents
), tool_turns as (
  select conv_id, doc_id, tool,
         lag(tool) over (partition by conv_id order by doc_id) as prev_tool
  from t
  where tool <> ''
)
select prev_tool as tool_from, tool as tool_to, count(*)::BIGINT as n
from tool_turns
where prev_tool is not null
group by 1, 2
"""


# ---------------------------------------------------------------------------
# Consecutive-turn token overlap — retry/loop detection: distinct-token
# Jaccard between each turn and its predecessor in the conversation.
# One range sort (keyed_sorted_match), then a per-pair packed-sorted-hash
# intersection (the ngram_jaccard_verify kernel shape, ~5 µs/pair);
# turn token sets are hashed/packed ONCE per turn, never per pair.
# ---------------------------------------------------------------------------


def xs_turn_overlap(sf_dir: str) -> pd.DataFrame:
    """Distinct-token Jaccard of each turn vs its previous turn (same
    conversation).  jaccard is emitted UNROUNDED: n_inter/n_union are
    exact ints on both engines, and IEEE division of identical ints is
    bit-identical, so no rounding boundary can flip (CLAUDE.md)."""
    from ocr_poc_ray.functions.dedup import _batch_token_hashes
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )

    def pack(batch: pd.DataFrame) -> pd.DataFrame:
        th, offsets = _batch_token_hashes(batch["text"])
        packed = [
            np.unique(th[offsets[d] : offsets[d + 1]]).tobytes()
            for d in range(len(batch))
        ]
        return pd.DataFrame(
            {"source": batch["source"].to_numpy(),
             "doc_id": batch["doc_id"].to_numpy(), "_th": packed}
        )

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["source", "doc_id"], kind="mergesort")
        by = g.groupby("source", sort=False)
        prev_th = by["_th"].shift().to_numpy()
        prev_id = by["doc_id"].shift()
        mask = prev_id.notna().to_numpy()
        cur_th = g["_th"].to_numpy()
        n = len(g)
        inter = np.zeros(n, dtype=np.int64)
        union = np.zeros(n, dtype=np.int64)
        for i in np.flatnonzero(mask):
            a = np.frombuffer(prev_th[i], dtype=np.uint64)
            b = np.frombuffer(cur_th[i], dtype=np.uint64)
            k = np.intersect1d(a, b, assume_unique=True).size
            inter[i] = k
            union[i] = a.size + b.size - k
        u = union[mask]
        k = inter[mask]
        jac = np.where(u > 0, k / np.maximum(u, 1), 1.0)
        return pd.DataFrame(
            {
                "conv_id": g["source"].to_numpy()[mask],
                "prev_turn_idx": prev_id.to_numpy()[mask].astype("int64"),
                "turn_idx": g["doc_id"].to_numpy()[mask],
                "n_inter": k,
                "n_union": u,
                "jaccard": jac,
            }
        )

    out = keyed_sorted_match(
        ds.map_batches(pack, batch_format="pandas"),
        key_col="source",
        sort_cols=["doc_id"],
        in_cols=["source", "doc_id", "_th"],
        match_fn=_match,
        out_meta={"conv_id": "object", "prev_turn_idx": "int64",
                  "turn_idx": "int64", "n_inter": "int64",
                  "n_union": "int64", "jaccard": "float64"},
    ).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {"conv_id": pd.Series([], dtype=object),
             "prev_turn_idx": pd.Series([], dtype="int64"),
             "turn_idx": pd.Series([], dtype="int64"),
             "n_inter": pd.Series([], dtype="int64"),
             "n_union": pd.Series([], dtype="int64"),
             "jaccard": pd.Series([], dtype="float64")}
        )
    return out.astype(
        {"prev_turn_idx": "int64", "turn_idx": "int64",
         "n_inter": "int64", "n_union": "int64", "jaccard": "float64"}
    )


XS_TURN_OVERLAP_SQL = r"""
with t as (
  select source, doc_id,
         list_distinct(regexp_extract_all(lower(text), '\S+')) as toks
  from documents
), lagged as (
  select source, doc_id, toks,
         lag(doc_id) over w as prev_id,
         lag(toks) over w as prev_toks
  from t window w as (partition by source order by doc_id)
)
select source as conv_id, prev_id as prev_turn_idx, doc_id as turn_idx,
       len(list_intersect(toks, prev_toks))::BIGINT as n_inter,
       (len(toks) + len(prev_toks) - len(list_intersect(toks, prev_toks)))::BIGINT
         as n_union,
       case when len(toks) + len(prev_toks) = 0 then 1.0
            else len(list_intersect(toks, prev_toks))::DOUBLE /
                 (len(toks) + len(prev_toks) - len(list_intersect(toks, prev_toks)))
       end as jaccard
from lagged where prev_id is not null
"""


REGISTRY = {
    "xs_turn_overlap": (xs_turn_overlap, XS_TURN_OVERLAP_SQL),
    "xs_extract_synth": (xs_extract_synth, None),
    "xs_curation_pipeline": (xs_curation_pipeline, XS_CURATION_PIPELINE_SQL),
    "xs_tool_latency": (xs_tool_latency, XS_TOOL_LATENCY_SQL),
    "xs_tool_transitions": (xs_tool_transitions, XS_TOOL_TRANSITIONS_SQL),
    "xs_training_pipeline": (xs_training_pipeline, None),
    "fields_extract_synth": (fields_extract_synth, None),
    "fields_postprocessed": (fields_postprocessed, None),
    "xs_conversation_docs": (xs_conversation_docs, None),
    "xs_extract_documents": (xs_extract_documents, XS_EXTRACT_DOCUMENTS_SQL),
    "xs_conv_docs_documents": (xs_conv_docs_documents, XS_CONV_DOCS_DOCUMENTS_SQL),
    "xs_conv_pack": (xs_conv_pack, XS_CONV_PACK_SQL),
    "xs_conv_stats": (xs_conv_stats, XS_CONV_STATS_SQL),
    "xs_turn_gaps": (xs_turn_gaps, XS_TURN_GAPS_SQL),
    "xs_extract_lang_stats": (xs_extract_lang_stats, XS_EXTRACT_LANG_STATS_SQL),
    "xs_context_window_chars": (
        xs_context_window_chars, XS_CONTEXT_WINDOW_SQL,
    ),
    "xs_conv_dedup": (xs_conv_dedup, XS_CONV_DEDUP_SQL),
    "mm_decode": (mm_decode, MM_DECODE_SQL),
    "mm_frame_sample": (mm_frame_sample, MM_FRAME_SAMPLE_SQL),
    "mm_audio_windows": (mm_audio_windows, MM_AUDIO_WINDOWS_SQL),
    "mm_resize": (mm_resize, MM_RESIZE_SQL),
    "mm_exact_dup": (mm_exact_dup, MM_EXACT_DUP_SQL),
    "mm_phash_neardup": (mm_phash_neardup, MM_PHASH_NEARDUP_SQL),
    "xs_tool_runs": (xs_tool_runs, XS_TOOL_RUNS_SQL),
    "mm_phash_components": (mm_phash_components, MM_PHASH_COMPONENTS_SQL),
    "xs_truncate_to_budget": (xs_truncate_to_budget, XS_TRUNCATE_TO_BUDGET_SQL),
    "xs_role_stats": (xs_role_stats, XS_ROLE_STATS_SQL),
    "xs_role_transitions": (xs_role_transitions, XS_ROLE_TRANSITIONS_SQL),
    "xs_dialogue_pairs": (xs_dialogue_pairs, XS_DIALOGUE_PAIRS_SQL),
    "xs_extract_spans_documents": (
        xs_extract_spans_documents, XS_EXTRACT_SPANS_SQL,
    ),
    "xs_conv_turn_offsets": (xs_conv_turn_offsets, XS_CONV_TURN_OFFSETS_SQL),
    "xs_role_balance": (xs_role_balance, XS_ROLE_BALANCE_SQL),
    "xs_first_turn_dedup": (xs_first_turn_dedup, XS_FIRST_TURN_DEDUP_SQL),
    "xs_template_safe_split": (xs_template_safe_split, XS_TEMPLATE_SAFE_SPLIT_SQL),
    "xs_window_export_text": (xs_window_export_text, XS_WINDOW_EXPORT_TEXT_SQL),
    "xs_window_export": (xs_window_export, XS_WINDOW_EXPORT_SQL),
}
