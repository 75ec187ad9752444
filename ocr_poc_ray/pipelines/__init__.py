"""End-to-end pipelines."""

from ocr_poc_ray.pipelines.extraction import (
    extract_transcripts,
    resumable_extract,
    run_extraction,
)

__all__ = ["extract_transcripts", "resumable_extract", "run_extraction"]
