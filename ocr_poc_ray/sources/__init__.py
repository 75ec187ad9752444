"""Sources: shard-aware parquet (the checkpoint unit) + JSONL."""

from ocr_poc_ray.sources.jsonl import read_transcripts_csv, read_transcripts_jsonl
from ocr_poc_ray.sources.parquet_shards import ParquetShard, plan_shards, read_shards

__all__ = ["ParquetShard", "plan_shards", "read_shards", "read_transcripts_jsonl", "read_transcripts_csv"]
