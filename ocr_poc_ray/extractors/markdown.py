"""Markdown path: strip markup + boilerplate, keep prose lines.

The third content-extraction program in the registry (SURVEY.md §2 M2:
the reference dispatches one of four card programs,
``ocr/id_card_data_extractor.py:25-35``; we dispatch on the ``tool``
column).  Mirrors the html extractor's philosophy — line-level
furniture classification, then inline-markup strip — for
markdown-bearing turns:

- fenced code blocks (``` ... ```) are boilerplate, dropped whole
  (the md analog of html <script>/<style>);
- heading (#...), horizontal-rule (---/***), and image (![...]) lines
  are furniture;
- bullet lines that are ONLY link markup are navigation, dropped
  (link-density classification, the P2/trafilatura analog);
- surviving lines get inline markup stripped — [text](url) → text,
  **b** → b, *i* → i, `c` → c — then the frozen whitespace
  normalization and single-space join of extractors/base.py.
"""

from __future__ import annotations

import re

from ocr_poc_ray.extractors.base import ExtractionResult, normalize_ws, spans_of

_FENCE_RE = re.compile(r"^\s*```")
_HEADING_RE = re.compile(r"^\s*#{1,6}\s")
_RULE_RE = re.compile(r"^\s*(-{3,}|\*{3,}|_{3,})\s*$")
_IMAGE_RE = re.compile(r"^\s*!\[")
_BULLET_RE = re.compile(r"^\s*[-*+]\s+")
_NAV_LINE_RE = re.compile(r"(\[[^\]]*\]\([^)]*\)[\s,|-]*)+$")

_LINK_RE = re.compile(r"\[([^\]]*)\]\([^)]*\)")
_BOLD_RE = re.compile(r"\*\*([^*]+)\*\*")
_ITALIC_RE = re.compile(r"\*([^*]+)\*")
_CODE_SPAN_RE = re.compile(r"`([^`]+)`")


def _strip_inline(line: str) -> str:
    line = _LINK_RE.sub(r"\1", line)
    line = _BOLD_RE.sub(r"\1", line)
    line = _ITALIC_RE.sub(r"\1", line)
    return _CODE_SPAN_RE.sub(r"\1", line)


def extract_markdown(text: str) -> ExtractionResult:
    kept_norm: list[str] = []
    n_blocks = 0
    in_fence = False
    for line in text.split("\n"):
        if _FENCE_RE.match(line):
            in_fence = not in_fence
            continue
        if in_fence:
            continue
        if not line.strip():
            continue
        n_blocks += 1
        if _HEADING_RE.match(line) or _RULE_RE.match(line) or _IMAGE_RE.match(line):
            continue
        rest = _BULLET_RE.sub("", line, count=1).strip()
        if rest and _NAV_LINE_RE.fullmatch(rest):
            continue  # pure-link bullet/nav line
        norm = normalize_ws(_strip_inline(rest))
        if norm:
            kept_norm.append(norm)
    out = " ".join(kept_norm)
    if not out:
        return ExtractionResult.failure("no_content_lines", n_blocks=n_blocks)
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
