"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported — no
``ray.init`` / ``ray.shutdown`` anywhere under here.  The real registry
lives in ``ocr_poc_ray.queries`` (one entry per operator family from
SURVEY.md §2 + the training-data ops); this module just re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship extraction pipeline over real sf0.001 data.

    documents.parquet reshaped into the transcript `input_hint` shape
    (row-local map), then validate → actor-pool extraction →
    (conv_id, turn_idx) ordering shuffle.  Returns the lazy Dataset;
    the driver consumes it.
    """
    from ocr_poc_ray.pipelines.extraction import extract_transcripts
    from ocr_poc_ray.queries.transcripts import _documents_as_transcripts

    return extract_transcripts(
        _documents_as_transcripts(SF0001), concurrency=(1, 4), ordered=True
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_poc_ray import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from ocr_poc_ray import queries as q

    return q.oracle_sql()
