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
         regexp_replace(trim(array_to_string({_KEPT}, ' '), {_WS_CHARS}),
                        '\s+', ' ', 'g') as extracted_text
  from documents
)
select conv_id, turn_idx, extracted_text,
       extracted_text <> '' as success,
       case when extracted_text <> '' then '' else 'empty_after_filter' end as error
from e
"""


REGISTRY = {
    "xs_extract_synth": (xs_extract_synth, None),
    "xs_conversation_docs": (xs_conversation_docs, None),
    "xs_extract_documents": (xs_extract_documents, XS_EXTRACT_DOCUMENTS_SQL),
}
