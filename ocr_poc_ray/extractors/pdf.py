"""PDF-layout parser: span geometry → reading order → joined text.

Re-targets the reference's geometric stages at a serialized span layout
(SURVEY.md §7.2 step 4).  Input payload is one span per line:

    x0,y0,x1,y1|glyph-run-text

in arbitrary (scrambled) order — the analog of the reference's
``rec_polys`` polygon geometry (``ocr/paddle_extractor.py:34``,
centroids ``cni_extractor_18_f.py:353-357``).  Stages:

- parse + validity accounting (malformed lines are counted, not fatal);
- margin-furniture filter: spans in the header/footer bands (running
  heads, page numbers) are dropped — noise filter P2 analog;
- MRZ/noise line filter (``cni_extractor_25_b.py:121-129`` analog);
- adaptive column detection (1-D gap clustering of span left edges —
  any number of columns), then reading-order sort (column, y0, x0) —
  the positional y-sort fallback P9 analog
  (``cni_extractor_18_f.py:417-438``) generalized to N columns;
- consolidation with the frozen whitespace join.

The sort is row-local (tens-to-thousands of spans per turn), so it
stays inside ``map_batches`` — no shuffle.
"""

from __future__ import annotations

from ocr_poc_ray.extractors.base import (
    ExtractionResult,
    is_noise_line,
    normalize_ws,
    spans_of,
)

# Letter-page geometry constants shared with the synthetic generator.
PAGE_WIDTH = 612.0
PAGE_MID = PAGE_WIDTH / 2.0  # legacy 2-column split (generator constant)
MARGIN_TOP_Y = 50.0  # y0 < this → running head / furniture
MARGIN_BOTTOM_Y = 720.0  # y0 > this → footer / page number

#: a horizontal gap this wide between span left-edges starts a new
#: column (per-line x jitter in real layouts is tens of points; real
#: column gutters are ≥100) — the adaptive analog of the reference's
#: template zones (main.ipynb cell 2).
COLUMN_GAP = 60.0


def _column_starts(x0s: list[float]) -> list[float]:
    """1-D gap clustering of span left edges → column start positions."""
    xs = sorted(set(x0s))
    starts = [xs[0]]
    for a, b in zip(xs, xs[1:]):
        if b - a > COLUMN_GAP:
            starts.append(b)
    return starts


def _column_of(x0: float, starts: list[float]) -> int:
    col = 0
    for i, s in enumerate(starts):
        if x0 >= s - COLUMN_GAP / 2:
            col = i
    return col


def extract_pdf(text: str) -> ExtractionResult:
    """Span lines are ``x0,y0,x1,y1|text`` (page 0) or
    ``page,x0,y0,x1,y1|text`` (multi-page).  Reading order:
    page → column (clustered per page) → y → x."""
    parsed: list[tuple[int, float, float, str]] = []
    n_lines = 0
    n_invalid = 0
    for raw in text.split("\n"):
        raw = raw.strip()
        if not raw:
            continue
        n_lines += 1
        head, sep, body = raw.partition("|")
        if not sep:
            n_invalid += 1
            continue
        parts = head.split(",")
        if len(parts) == 4:
            page_s, coords = "0", parts
        elif len(parts) == 5:
            page_s, coords = parts[0], parts[1:]
        else:
            n_invalid += 1
            continue
        try:
            page = int(page_s)
            x0, y0, _x1, _y1 = (float(p) for p in coords)
        except ValueError:
            n_invalid += 1
            continue
        t = body.strip()
        if not t or is_noise_line(t):
            continue
        if y0 < MARGIN_TOP_Y or y0 > MARGIN_BOTTOM_Y:
            continue  # margin furniture
        parsed.append((page, x0, y0, t))

    spans: list[tuple[int, int, float, float, str]] = []
    if parsed:
        pages = sorted({p[0] for p in parsed})
        starts_by_page = {
            pg: _column_starts([x for p, x, _y, _t in parsed if p == pg])
            for pg in pages
        }
        for page, x0, y0, t in parsed:
            spans.append((page, _column_of(x0, starts_by_page[page]), y0, x0, t))

    if not spans:
        # Quality gate (P1 analog): no valid content spans.
        reason = "no_valid_spans" if n_invalid else "no_content_spans"
        return ExtractionResult.failure(reason, n_blocks=n_lines)

    spans.sort(key=lambda s: (s[0], s[1], s[2], s[3]))
    # span texts are stripped and non-empty; normalize each so the
    # single-space join is the normalized text and the char spans are
    # exact reading-order block boundaries
    kept_norm = [normalize_ws(s[4]) for s in spans]
    out = " ".join(kept_norm)
    valid = n_lines - n_invalid
    return ExtractionResult(
        extracted_text=out,
        success=True,
        quality_score=valid / n_lines if n_lines else 0.0,
        confidence=len(spans) / valid if valid else 0.0,
        n_blocks=n_lines,
        n_kept=len(spans),
        spans=spans_of(kept_norm),
    )
