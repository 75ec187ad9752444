"""Ray Data stages: validation, actor-pool extraction, ordering shuffle."""

from ocr_poc_ray.stages.extract import ExtractTurns, extract_batch
from ocr_poc_ray.stages.ordering import conversation_docs, sort_by_turn
from ocr_poc_ray.stages.validate import validate_transcripts_batch

__all__ = [
    "ExtractTurns",
    "extract_batch",
    "conversation_docs",
    "sort_by_turn",
    "validate_transcripts_batch",
]
