"""The stateful extraction stage — an actor-pool ``map_batches`` class.

Mirrors the reference's load-once model + registry dispatch
(PaddleOCR init ``ocr/paddle_extractor.py:21-25`` once per process;
2x2 registry dispatch ``ocr/id_card_data_extractor.py:25-35,49``):

- ``ExtractTurns.__init__`` runs ONCE per actor — it builds the
  extractor registry (and is where a learned model / LLM
  post-processor would load; our heuristic extractors are cheap, but
  the actor-pool architecture is what the north_rule mandates and
  what scales when they are not).
- ``ExtractTurns.__call__`` runs per Arrow batch (zero-copy from the
  object store), dispatching each row on its ``tool`` value and
  emitting the flat extraction envelope columns.

The per-row Python call is the payload parse itself (an HTML/PDF parse
is inherently per-document work — the "model inference" of this
pipeline); everything around it (column access, array building,
validation) is Arrow-native.  Per-row failures are envelope rows,
never exceptions, so a pathological document cannot poison a block.

Use:  ``ds.map_batches(ExtractTurns, batch_format="pyarrow",
batch_size=B, concurrency=N)``.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_poc_ray.extractors.registry import EXTRACTORS, extract_turn
from ocr_poc_ray.schemas import EXTRACTION_SCHEMA

#: Version stamp recorded in lineage entries; bump on any semantic
#: change to an extractor (manifest entries from older versions are
#: not reused on resume).
EXTRACTOR_VERSION = "1.2.0"  # 1.2.0: kept-block span output (text unchanged)


def extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless batch transform (plain-function variant of the stage).

    Used for cheap paths and unit tests; the actor-pool class below is
    the deployment shape.
    """
    conv_id = batch["conv_id"]
    turn_idx = batch["turn_idx"]
    role = batch["role"]
    tools = batch["tool"].to_pylist()
    texts = batch["text"].to_pylist()

    n = len(texts)
    extracted = [""] * n
    success = [False] * n
    quality = [0.0] * n
    confidence = [0.0] * n
    n_blocks = [0] * n
    n_kept = [0] * n
    error = [""] * n
    spans = [""] * n
    for i in range(n):
        r = extract_turn(texts[i], tools[i])
        extracted[i] = r.extracted_text
        success[i] = r.success
        quality[i] = r.quality_score
        confidence[i] = r.confidence
        n_blocks[i] = r.n_blocks
        n_kept[i] = r.n_kept
        error[i] = r.error
        spans[i] = r.spans

    return pa.Table.from_arrays(
        [
            conv_id.combine_chunks() if isinstance(conv_id, pa.ChunkedArray) else conv_id,
            turn_idx.combine_chunks() if isinstance(turn_idx, pa.ChunkedArray) else turn_idx,
            role.combine_chunks() if isinstance(role, pa.ChunkedArray) else role,
            batch["tool"].combine_chunks() if isinstance(batch["tool"], pa.ChunkedArray) else batch["tool"],
            pa.array(extracted, type=pa.string()),
            pa.array(success, type=pa.bool_()),
            pa.array(quality, type=pa.float32()),
            pa.array(confidence, type=pa.float32()),
            pa.array(n_blocks, type=pa.int32()),
            pa.array(n_kept, type=pa.int32()),
            pa.array(error, type=pa.string()),
            pa.array(spans, type=pa.string()),
        ],
        schema=EXTRACTION_SCHEMA,
    )


class ExtractTurns:
    """Actor-pool extraction stage (M1/M2 analog: load-once, per-batch work)."""

    def __init__(self) -> None:
        # Once per actor: materialize the registry (model-load slot).
        self._registry = dict(EXTRACTORS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch)
