"""Checkpoint manifest + resumable partitioned execution."""

from ocr_poc_ray.state.manifest import Manifest, PartitionRecord

__all__ = ["Manifest", "PartitionRecord"]
