"""Ray Data stages: validation, actor-pool extraction stages, ordering
shuffle + conversation assembly, optional post-processing."""

from ocr_poc_ray.stages.extract import ExtractTurns, extract_batch
from ocr_poc_ray.stages.fields import ExtractFields, extract_fields_ds
from ocr_poc_ray.stages.ordering import conversation_docs, sort_by_turn
from ocr_poc_ray.stages.postprocess import LLMPostProcessor, postprocess_fields
from ocr_poc_ray.stages.validate import validate_transcripts_batch

__all__ = [
    "ExtractTurns",
    "ExtractFields",
    "extract_batch",
    "extract_fields_ds",
    "conversation_docs",
    "sort_by_turn",
    "LLMPostProcessor",
    "postprocess_fields",
    "validate_transcripts_batch",
]
