"""Shared extraction primitives: envelope, whitespace normalizer, noise filter.

Envelope mirrors the reference's result envelope
``{success, quality_score, confidence, data}``
(``cni_extractor_18_f.py:514-520``; failure variant ``:456-462``).
The noise filter is the P2 analog (``cni_extractor_25_b.py:121-129``:
MRZ lines ``I<…`` / ``<<<`` and bare country codes are dropped).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Single place where whitespace semantics are frozen (SURVEY.md §7.4.1:
# byte-for-byte equality requires one normalization rule everywhere).
_WS_RE = re.compile(r"\s+")

#: Request-size validator threshold — P12 analog of the reference's
#: 16 MB ``MAX_CONTENT_LENGTH`` (``api_server.py:48``).  Oversized turns
#: fail as data, never as exceptions.
MAX_TEXT_CHARS = 262_144


def normalize_ws(s: str) -> str:
    """Collapse all whitespace runs to single spaces and strip.

    The analog of the reference's ``" ".join(rec_texts)`` flattening
    (``ocr/id_card_data_extractor.py:44``).  Must be bit-identical
    between the single-process oracle and every distributed path.
    """
    return _WS_RE.sub(" ", s).strip()


_MRZ_PREFIX = "I<"
_MRZ_FILLER = "<<<"
_COUNTRY_CODE_RE = re.compile(r"^[A-Z]{3}$")

#: Watermark / country-word vocabulary dropped by the 25F-style noise
#: filter (``cni_extractor_25_f.py:42-48``: ``ignore_words``).  Consumed
#: per layout (``extractors/fields.FieldLayout.noise_words``) — the
#: plain transcript path deliberately does NOT apply it, mirroring the
#: reference where only the 25F preprocess filters watermarks.
WATERMARK_WORDS: frozenset[str] = frozenset(
    {
        "TRAVAIL", "PATRIE", "WORK", "FATHERLAND",
        "CMR", "CAMEROUN", "CAMEROON",
        "REPUBLIQUE", "REPUBLIC", "DU", "OF",
        "CARTE", "NATIONALE", "IDENTITE",
        "NATIONAL", "IDENTITY", "CARD",
    }
)


def is_noise_line(line: str, *, noise_words: frozenset[str] = frozenset()) -> bool:
    """Line-level noise predicate (P2 analog).

    Drops machine-readable-zone-style lines and bare 3-letter country
    codes — cf. ``cni_extractor_25_b.py:121-129`` (``startswith('I<')``,
    ``'<<<' in text``, bare ``CMR``).  Pass ``noise_words`` (e.g.
    ``WATERMARK_WORDS``) to also drop known single-word watermarks
    (``cni_extractor_25_f.py:130-138``).
    """
    s = line.strip()
    if not s:
        return True
    if s.startswith(_MRZ_PREFIX) or _MRZ_FILLER in s:
        return True
    if _COUNTRY_CODE_RE.match(s):
        return True
    if noise_words and s.upper() in noise_words:
        return True
    return False


def spans_of(kept_norm: list[str]) -> str:
    """Character spans of each kept block inside the joined extracted
    text ("0:12;13:40"): block i covers ``extracted_text[s:e]`` and
    blocks are separated by exactly one space.  Inputs must be the
    normalized, non-empty kept-block texts in output order — the same
    list whose single-space join IS the extracted text, so the spans
    are byte-exact by construction (invariant tested in
    tests/test_properties.py)."""
    parts = []
    pos = 0
    for k in kept_norm:
        parts.append(f"{pos}:{pos + len(k)}")
        pos += len(k) + 1
    return ";".join(parts)


@dataclass(frozen=True)
class ExtractionResult:
    """Per-turn extraction envelope (always produced, even on failure)."""

    extracted_text: str
    success: bool
    quality_score: float  # mean per-block content score (P1 analog)
    confidence: float  # kept/total ratio (P10 analog, :504-506)
    n_blocks: int
    n_kept: int
    error: str = ""
    #: kept-block boundaries inside extracted_text ("s:e;s:e"), "" on
    #: failure — the per-turn span output of the north-star contract
    spans: str = ""

    @staticmethod
    def failure(error: str, *, n_blocks: int = 0, quality_score: float = 0.0) -> "ExtractionResult":
        return ExtractionResult(
            extracted_text="",
            success=False,
            quality_score=quality_score,
            confidence=0.0,
            n_blocks=n_blocks,
            n_kept=0,
            error=error,
        )
