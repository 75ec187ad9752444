"""Extractor registry + dispatch on the ``tool`` column.

The analog of the reference's pre-built 2x2 extractor registry and its
per-request dispatch (``ocr/id_card_data_extractor.py:25-35`` build,
``:49`` dispatch), with the request validators (P12,
``api_server.py:193-248``) folded in: an unknown tool value or null
text yields a structured failure row, never an exception.
"""

from __future__ import annotations

from collections.abc import Callable

from ocr_poc_ray.extractors.base import MAX_TEXT_CHARS, ExtractionResult
from ocr_poc_ray.extractors.html import extract_html
from ocr_poc_ray.extractors.json_tool import extract_json
from ocr_poc_ray.extractors.markdown import extract_markdown
from ocr_poc_ray.extractors.pdf import extract_pdf
from ocr_poc_ray.extractors.plain import extract_plain

EXTRACTORS: dict[str, Callable[[str], ExtractionResult]] = {
    "": extract_plain,
    "html": extract_html,
    "json": extract_json,
    "md": extract_markdown,
    "pdf": extract_pdf,
}


def register_extractor(
    tool: str, fn: Callable[[str], ExtractionResult], *, replace: bool = False
) -> None:
    """User-extension surface (SURVEY.md §2.5: the reference's registry
    is extended by adding a (version, side) entry,
    ``ocr/id_card_data_extractor.py:25-35``): register an extraction
    program for a new ``tool`` value.  Must be called before the stage
    actors are constructed (each actor snapshots the registry in
    ``__init__``); registrations are process-local, so pass a module
    that performs registration at import into the job's code bundle.
    """
    if not replace and tool in EXTRACTORS:
        raise ValueError(f"extractor for tool {tool!r} already registered")
    if not callable(fn):
        raise TypeError("extractor must be callable(text) -> ExtractionResult")
    EXTRACTORS[tool] = fn


def extract_turn(text: str | None, tool: str | None) -> ExtractionResult:
    """Pure per-turn extraction: validate → dispatch → envelope."""
    if text is None:
        return ExtractionResult.failure("null_text")
    if len(text) > MAX_TEXT_CHARS:
        return ExtractionResult.failure("oversized")
    tool = tool or ""
    fn = EXTRACTORS.get(tool)
    if fn is None:
        return ExtractionResult.failure(f"unknown_tool:{tool}")
    try:
        return fn(text)
    except Exception as exc:  # per-row failure containment (SURVEY.md §7.4.4)
        return ExtractionResult.failure(f"extractor_error:{type(exc).__name__}")
