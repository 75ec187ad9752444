"""Per-turn extraction programs, keyed by the ``tool`` dispatch column.

The reference holds a 2x2 registry of extractor programs keyed by
(CardVersion, CardSide) (``ocr/id_card_data_extractor.py:25-35``); we
hold a registry keyed by the ``tool`` column value — "" (plain text),
"html" (boilerplate-strip main-content extractor), "pdf" (span-layout
reading-order parser).  Every program is a pure function
``str -> ExtractionResult``; failures are data (a ``success=False``
envelope, cf. ``cni_extractor_18_f.py:456-462``), never exceptions.
"""

from ocr_poc_ray.extractors.base import ExtractionResult, is_noise_line, normalize_ws
from ocr_poc_ray.extractors.fields import FieldExtractorConfig, extract_fields, fuzzy_similarity
from ocr_poc_ray.extractors.registry import EXTRACTORS, extract_turn, register_extractor

__all__ = [
    "ExtractionResult",
    "EXTRACTORS",
    "extract_turn",
    "register_extractor",
    "FieldExtractorConfig",
    "extract_fields",
    "fuzzy_similarity",
    "is_noise_line",
    "normalize_ws",
]
