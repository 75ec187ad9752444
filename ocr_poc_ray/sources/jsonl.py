"""JSONL transcript source — the wire format agent frameworks dump.

``ray.data.read_json`` handles sharded ``*.jsonl`` natively (one read
task per file); this wrapper casts to the canonical TRANSCRIPTS_SCHEMA
at the batch boundary (ts accepted as ISO-8601 strings or epoch
micros) so everything downstream sees exactly the parquet shape.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from ocr_poc_ray.schemas import TRANSCRIPTS_SCHEMA


def _canonicalize(batch: pa.Table) -> pa.Table:
    cols = {}
    for field in TRANSCRIPTS_SCHEMA:
        if field.name not in batch.column_names:
            cols[field.name] = pa.nulls(len(batch), field.type)
            continue
        arr = batch[field.name].combine_chunks()
        if field.name == "ts" and pa.types.is_string(arr.type):
            arr = pc.strptime(arr, format="%Y-%m-%dT%H:%M:%S", unit="us")
        elif field.name == "ts" and pa.types.is_integer(arr.type):
            arr = arr.cast(pa.timestamp("us"))
        if arr.type != field.type:
            arr = arr.cast(field.type)
        cols[field.name] = arr
    return pa.Table.from_arrays(
        [cols[f.name] for f in TRANSCRIPTS_SCHEMA], schema=TRANSCRIPTS_SCHEMA
    )


def read_transcripts_jsonl(path: str | list[str]) -> Dataset:
    """JSONL file(s)/dir → Dataset in the canonical transcript schema."""
    ds = ray.data.read_json(path)
    return ds.map_batches(_canonicalize, batch_format="pyarrow")


def read_transcripts_csv(path: str | list[str]) -> Dataset:
    """CSV file(s)/dir → Dataset in the canonical transcript schema
    (same canonicalization as the JSONL source; ts as ISO strings)."""
    ds = ray.data.read_csv(path)
    return ds.map_batches(_canonicalize, batch_format="pyarrow")
