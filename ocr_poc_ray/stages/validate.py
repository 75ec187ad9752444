"""Input validation stage (P12 analog, ``api_server.py:193-248``).

Vectorized over Arrow batches: asserts the transcript schema, fills
null ``tool``/``role``/``text`` so downstream stages never see nulls.
Unknown enum values are NOT rejected here — they flow through and the
extraction stage emits structured ``unknown_tool:*`` failure rows, so
one bad row never fails a block (SURVEY.md §7.4.4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_poc_ray.schemas import TRANSCRIPTS_SCHEMA, validate_table


def validate_transcripts_batch(batch: pa.Table) -> pa.Table:
    batch = validate_table(batch, TRANSCRIPTS_SCHEMA, where="validate_transcripts")
    out = batch
    for col in ("tool", "role", "text"):
        arr = out[col]
        if arr.null_count:
            out = out.set_column(
                out.schema.get_field_index(col),
                col,
                pc.fill_null(arr, "" if col != "role" else "unknown"),
            )
    return out
