"""JSON tool-output path: extract prose payloads from structured tool
results.

The fifth content-extraction program in the registry (SURVEY.md §2 M2 —
the reference dispatches one of four card programs,
``ocr/id_card_data_extractor.py:25-35``; we dispatch on the ``tool``
column).  Agent transcripts carry tool turns whose text is a JSON
envelope (search results, API responses); the training-relevant content
is the handful of long prose string fields, and everything else —
status codes, ids, scores, cursors, booleans — is structural noise.

Rule (the JSON analog of readability's minimum-text-length block
classification): depth-first walk in DOCUMENT order (dict insertion
order, list order), every string leaf is a block, and a block is
content iff its whitespace-normalized form has at least
``MIN_CONTENT_CHARS`` characters.  Kept blocks join with single spaces
under the frozen normalization of ``extractors/base.py``; malformed
JSON fails as data (``json_parse``), never as an exception.
"""

from __future__ import annotations

import json

from ocr_poc_ray.extractors.base import ExtractionResult, normalize_ws, spans_of

MIN_CONTENT_CHARS = 24


def _string_leaves(node, out: list) -> None:
    if isinstance(node, str):
        out.append(node)
    elif isinstance(node, dict):
        for v in node.values():
            _string_leaves(v, out)
    elif isinstance(node, (list, tuple)):
        for v in node:
            _string_leaves(v, out)


def extract_json(text: str) -> ExtractionResult:
    try:
        doc = json.loads(text)
    except (ValueError, RecursionError):
        return ExtractionResult.failure("json_parse")
    leaves: list[str] = []
    _string_leaves(doc, leaves)
    n_blocks = len(leaves)
    kept_norm = []
    for s in leaves:
        norm = normalize_ws(s)
        if len(norm) >= MIN_CONTENT_CHARS:
            kept_norm.append(norm)
    out = " ".join(kept_norm)
    if not out:
        return ExtractionResult.failure("no_content_strings", n_blocks=n_blocks)
    n_kept = len(kept_norm)
    return ExtractionResult(
        extracted_text=out,
        success=True,
        quality_score=1.0,
        confidence=n_kept / n_blocks if n_blocks else 1.0,
        n_blocks=n_blocks,
        n_kept=n_kept,
        spans=spans_of(kept_norm),
    )
