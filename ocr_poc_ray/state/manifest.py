"""Checkpoint manifest: per-partition lineage + metrics, atomic commits.

The reference's lineage/metrics are request-scoped (uuid + CSV metrics
log + process-global counters, ``api_server.py:40-91``) and lost on
worker recycle; ours are partition-scoped and durable (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

Protocol (SURVEY.md §7.4.6 — exactly-once partition commit):

1. a partition's output is written to ``<out>/.tmp-partition=<id>/``;
2. the directory is atomically renamed to ``<out>/partition=<id>/``;
3. a manifest line ``{partition_id, input lineage, extractor_version,
   row_count, metrics, wall_time_s}`` is appended (write-temp +
   ``os.replace`` of the whole manifest, so a crash mid-append can
   never corrupt it).

Resume = read manifest → skip partitions whose entry exists AND whose
output dir exists AND whose extractor_version matches; everything else
is (re)processed.  A partition interrupted mid-write leaves only a
``.tmp-*`` dir, which is ignored and overwritten.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionRecord:
    partition_id: int
    input_lineage: list[dict]  # [{shard_id, path, row_groups, num_rows}, ...]
    extractor_version: str
    row_count: int
    metrics: dict = field(default_factory=dict)
    wall_time_s: float = 0.0
    committed_at: float = 0.0


class Manifest:
    """JSONL manifest of committed partitions for one output directory."""

    FILENAME = "_manifest.jsonl"

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, self.FILENAME)
        os.makedirs(out_dir, exist_ok=True)

    # -- reading ----------------------------------------------------------
    def records(self) -> dict[int, PartitionRecord]:
        recs: dict[int, PartitionRecord] = {}
        if not os.path.exists(self.path):
            return recs
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                recs[d["partition_id"]] = PartitionRecord(**d)
        return recs

    def partition_dir(self, partition_id: int) -> str:
        return os.path.join(self.out_dir, f"partition={partition_id}")

    def tmp_dir(self, partition_id: int) -> str:
        return os.path.join(self.out_dir, f".tmp-partition={partition_id}")

    def completed(self, extractor_version: str) -> set[int]:
        done: set[int] = set()
        for pid, rec in self.records().items():
            if rec.extractor_version == extractor_version and os.path.isdir(
                self.partition_dir(pid)
            ):
                done.add(pid)
        self._sweep_stale_tmp(done)
        return done

    def _sweep_stale_tmp(self, done: set[int]) -> None:
        """Remove .tmp dirs left by crashed runs of already-committed work."""
        for name in os.listdir(self.out_dir):
            if name.startswith(".tmp-partition="):
                try:
                    pid = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if pid in done:
                    shutil.rmtree(os.path.join(self.out_dir, name), ignore_errors=True)

    # -- committing -------------------------------------------------------
    def begin(self, partition_id: int) -> str:
        """Return a clean tmp dir for the partition's output."""
        tmp = self.tmp_dir(partition_id)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        return tmp

    def commit(self, rec: PartitionRecord) -> None:
        """Atomically promote tmp dir → final dir and append the record."""
        tmp = self.tmp_dir(rec.partition_id)
        final = self.partition_dir(rec.partition_id)
        if os.path.isdir(final):
            shutil.rmtree(final)  # stale output from an older version
        os.replace(tmp, final)
        rec.committed_at = time.time()
        # Rewrite-then-replace keeps the manifest valid under crashes.
        existing = self.records()
        existing[rec.partition_id] = rec
        tmp_manifest = self.path + ".tmp"
        with open(tmp_manifest, "w") as f:
            for pid in sorted(existing):
                f.write(json.dumps(asdict(existing[pid])) + "\n")
        os.replace(tmp_manifest, self.path)

    def output_files(self) -> list[str]:
        """All committed partition parquet files, in partition order."""
        files: list[str] = []
        for pid in sorted(self.records()):
            pdir = self.partition_dir(pid)
            if os.path.isdir(pdir):
                files.extend(
                    sorted(
                        os.path.join(pdir, f)
                        for f in os.listdir(pdir)
                        if f.endswith(".parquet")
                    )
                )
        return files
