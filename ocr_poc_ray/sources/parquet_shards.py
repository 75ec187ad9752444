"""Shard-aware Parquet source.

``ray.data.read_parquet`` reads whole files; for resumable partitioned
runs we need *deterministic, row-group-granular* shards with recorded
lineage (which file, which row groups) so a resume can skip exactly the
work already committed (north_rule: per-partition lineage).

``plan_shards`` walks Parquet footers (metadata only — no data I/O) and
packs row groups into shards of ~``target_rows``.  ``read_shards``
turns a shard list into a streaming ``ray.data.Dataset``: one tiny
descriptor row per shard fans out to one read task per shard
(``map_batches`` with ``batch_size=1``), each task reading its row
groups directly from storage with pyarrow — no driver-side data
movement, and downstream stages pipeline behind the reads.

At 100 TB this is the same plan shape Ray's native parquet reader
produces (fragment → read task), with the shard boundary made explicit
and stable across runs so it can serve as the checkpoint unit.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


@dataclass(frozen=True)
class ParquetShard:
    shard_id: int
    path: str
    row_groups: tuple[int, ...]
    num_rows: int

    def lineage(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "path": self.path,
            "row_groups": list(self.row_groups),
            "num_rows": self.num_rows,
        }


def _expand(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
        else:
            out.append(p)
    return out


def plan_shards(paths: str | list[str], target_rows: int = 250_000) -> list[ParquetShard]:
    """Deterministic shard plan: row groups packed to ~target_rows each."""
    shards: list[ParquetShard] = []
    sid = 0
    for path in _expand(paths):
        meta = pq.read_metadata(path)
        cur: list[int] = []
        cur_rows = 0
        for rg in range(meta.num_row_groups):
            n = meta.row_group(rg).num_rows
            cur.append(rg)
            cur_rows += n
            if cur_rows >= target_rows:
                shards.append(ParquetShard(sid, path, tuple(cur), cur_rows))
                sid += 1
                cur, cur_rows = [], 0
        if cur:
            shards.append(ParquetShard(sid, path, tuple(cur), cur_rows))
            sid += 1
    return shards


class _ReadShard:
    """One read task per shard descriptor row."""

    def __init__(self, columns: list[str] | None = None):
        self._columns = columns

    def __call__(self, batch: dict) -> pa.Table:
        tables = []
        for path, rgs in zip(batch["path"], batch["row_groups"]):
            f = pq.ParquetFile(path)
            tables.append(f.read_row_groups(list(rgs), columns=self._columns))
        return pa.concat_tables(tables)


def read_shards(
    shards: list[ParquetShard],
    *,
    columns: list[str] | None = None,
) -> "ray.data.Dataset":
    """Streaming Dataset over a shard plan (one read task per shard)."""
    if not shards:
        raise ValueError("empty shard list")
    descriptors = [
        {"path": s.path, "row_groups": list(s.row_groups)} for s in shards
    ]
    ds = ray.data.from_items(descriptors)
    return ds.map_batches(
        _ReadShard(columns),
        batch_size=1,
        batch_format="numpy",
        num_cpus=0.5,
    )
