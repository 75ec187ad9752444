"""Plain-text path: noise filter + whitespace normalization.

The identity-ish extractor of SURVEY.md §7.1 — line-level noise filter
(P2 analog) followed by the frozen whitespace join
(``ocr/id_card_data_extractor.py:44`` analog).
"""

from __future__ import annotations

from ocr_poc_ray.extractors.base import (
    ExtractionResult,
    is_noise_line,
    normalize_ws,
    spans_of,
)


def extract_plain(text: str) -> ExtractionResult:
    lines = text.split("\n")
    kept = [ln for ln in lines if not is_noise_line(ln)]
    # Per-line normalization; the single-space join of the non-empty
    # normalized lines is byte-identical to normalize_ws(" ".join(kept))
    # (whitespace runs never merge tokens across the join), and gives
    # the kept-block spans for free.
    kept_norm = [n for n in (normalize_ws(ln) for ln in kept) if n]
    out = " ".join(kept_norm)
    n_blocks = sum(1 for ln in lines if ln.strip())
    if not out:
        # Quality gate (P1 analog, cni_extractor_18_f.py:84-87): nothing
        # survived the noise filter → structured failure, not an exception.
        return ExtractionResult.failure("empty_after_filter", n_blocks=n_blocks)
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
