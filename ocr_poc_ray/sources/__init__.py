"""Sources: shard-aware Parquet reading for resumable partitioned runs."""

from ocr_poc_ray.sources.parquet_shards import ParquetShard, plan_shards, read_shards

__all__ = ["ParquetShard", "plan_shards", "read_shards"]
