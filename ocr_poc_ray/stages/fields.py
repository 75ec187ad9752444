"""Actor-pool stage for typed-field extraction over span records.

The spans table (SPANS_SCHEMA: parallel texts/scores/polys list
columns — the OCR-record analog, ``cni_extractor_18_f.py:465-467``)
maps through ``extract_fields`` one row at a time inside a zero-copy
Arrow batch; output is FIELDS_SCHEMA (flat nullable fields +
envelope).  Same load-once / per-batch shape as ExtractTurns.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from ocr_poc_ray.extractors.fields import ALL_FIELDS, extract_fields
from ocr_poc_ray.schemas import FIELDS_SCHEMA


class ExtractFields:
    """map_batches class: ``ds.map_batches(ExtractFields,
    batch_format="pyarrow", concurrency=N)``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_fields_batch(batch)


def extract_fields_batch(batch: pa.Table) -> pa.Table:
    from ocr_poc_ray.extractors.fields import BACK_FIELDS, FIELD_LAYOUTS, FRONT_LAYOUT

    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["texts"].to_pylist()
    scores = batch["scores"].to_pylist()
    polys = batch["polys"].to_pylist()
    layouts = (
        batch["layout"].to_pylist()
        if "layout" in batch.column_names
        else ["front"] * len(doc_ids)
    )

    field_cols = tuple(ALL_FIELDS) + tuple(BACK_FIELDS)
    cols: dict[str, list] = {name: [] for name in FIELDS_SCHEMA.names}
    for i in range(len(doc_ids)):
        # M2 registry dispatch — unknown layouts become failure rows,
        # never exceptions (P12 rule).
        layout = FIELD_LAYOUTS.get(layouts[i] or "front")
        if layout is None:
            cols["doc_id"].append(doc_ids[i])
            cols["layout"].append(layouts[i])
            cols["success"].append(False)
            for f in field_cols:
                cols[f].append(None)
            cols["quality_score"].append(0.0)
            cols["confidence"].append(0.0)
            cols["n_anchors"].append(0)
            cols["error"].append(f"unknown_layout:{layouts[i]}")
            continue
        r = extract_fields(texts[i] or [], scores[i] or [], polys[i] or [], layout=layout)
        cols["doc_id"].append(doc_ids[i])
        # echo the INPUT registry key ("front" aliases front_18 etc.)
        # so goldens keyed on the input layout stay joinable
        cols["layout"].append(layouts[i] or "front")
        cols["success"].append(r.success)
        for f in field_cols:
            cols[f].append(r.fields.get(f))
        cols["quality_score"].append(r.quality_score)
        cols["confidence"].append(r.confidence)
        cols["n_anchors"].append(sum(1 for v in r.anchors_detected.values() if v))
        cols["error"].append(r.error)

    return pa.Table.from_arrays(
        [pa.array(cols[name], type=FIELDS_SCHEMA.field(name).type) for name in FIELDS_SCHEMA.names],
        schema=FIELDS_SCHEMA,
    )


def extract_fields_ds(
    ds: Dataset, *, concurrency: int | tuple[int, int] | None = None
) -> Dataset:
    if concurrency is None:
        return ds.map_batches(ExtractFields(), batch_format="pyarrow")
    return ds.map_batches(ExtractFields, batch_format="pyarrow", concurrency=concurrency)
