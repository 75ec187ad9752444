"""Small-file compaction for committed output partitions.

The resumable sink writes one directory per partition, but each
partition's rows arrive as one parquet file PER RAY WRITE TASK — at
cluster widths that is the classic small-file problem (a 100 TB run at
256 nodes × many blocks/partition produces millions of KB-scale files
that crush the downstream reader's open/plan cost).  Compaction
rewrites a committed partition's files into ~``target_bytes`` outputs
without touching the manifest's lineage contract: resume still skips
the partition, row content is byte-identical, and the rewrite is
crash-safe at every step.

Crash-safety protocol (single-writer, same assumption as the sink):

1. write the compacted output to ``.compact-<n>.parquet.tmp``
2. write an INTENT MARKER ``.compact_commit`` (JSON: the original file
   names and the final compacted names) — fsync'd before any visible
   mutation
3. ``os.replace`` each tmp → final ``compact-<n>.parquet``
4. delete the original small files
5. remove the marker

``recover(partition_dir)`` finishes an interrupted run: marker present
and every compacted file in place → redo steps 4–5 (idempotent);
marker present but compacted files missing → the crash hit before any
rename, so drop the marker and tmp files (originals are intact).
Readers glob ``partition=*/*.parquet``; dot-prefixed tmp/marker names
are invisible to the glob, and the only window where BOTH old and new
files are glob-visible is inside steps 3–4, which only a concurrent
reader could observe — the single-writer contract the sink already has.

Per-partition rewrites run as parallel Ray tasks (one task per
partition — the rare case where raw tasks beat a Dataset: the unit of
work is "a directory", not "a batch", and partition bytes are bounded
by the sink's partition sizing).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

MARKER = ".compact_commit"
COMPACT_PREFIX = "compact-"
DEFAULT_TARGET_BYTES = 128 << 20


def _data_files(pdir: str) -> list[str]:
    return sorted(
        f
        for f in os.listdir(pdir)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def recover(pdir: str) -> str | None:
    """Finish or roll back an interrupted compaction; 'completed',
    'rolled_back' or None (no marker)."""
    mpath = os.path.join(pdir, MARKER)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        intent = json.load(f)
    finals = intent["compacted"]
    if all(os.path.exists(os.path.join(pdir, f)) for f in finals):
        # crash after the renames: finish deleting the originals
        for f in intent["originals"]:
            p = os.path.join(pdir, f)
            if os.path.exists(p):
                os.remove(p)
        os.remove(mpath)
        return "completed"
    # crash before all renames landed: originals are intact — drop
    # marker, partial renames and tmps
    for f in finals:
        p = os.path.join(pdir, f)
        if os.path.exists(p):
            os.remove(p)
        t = os.path.join(pdir, f + ".tmp")
        if os.path.exists(t):
            os.remove(t)
    os.remove(mpath)
    return "rolled_back"


def compact_partition(
    pdir: str, *, target_bytes: int = DEFAULT_TARGET_BYTES,
    row_group_size: int = 128 * 1024,
) -> dict:
    """Rewrite one committed partition directory; returns stats."""
    import pyarrow.parquet as pq

    recover(pdir)
    files = _data_files(pdir)
    if len(files) <= 1:
        return {"dir": pdir, "files_before": len(files), "files_after": len(files),
                "skipped": True}
    sizes = [os.path.getsize(os.path.join(pdir, f)) for f in files]
    total = sum(sizes)
    n_out = max(1, -(-total // target_bytes))
    if n_out >= len(files):
        return {"dir": pdir, "files_before": len(files), "files_after": len(files),
                "skipped": True}

    # bin the ORIGINAL files greedily in name order (row order inside a
    # partition is per-file; compaction preserves per-file order and
    # concatenation order, so a sorted read of the partition is stable)
    bins: list[list[str]] = [[]]
    acc = 0
    for f, sz in zip(files, sizes):
        if bins[-1] and acc + sz > target_bytes:
            bins.append([])
            acc = 0
        bins[-1].append(f)
        acc += sz
    finals = [f"{COMPACT_PREFIX}{i:05d}.parquet" for i in range(len(bins))]

    rows = 0
    for i, group in enumerate(bins):
        tables = [pq.read_table(os.path.join(pdir, f)) for f in group]
        import pyarrow as pa

        merged = pa.concat_tables(tables, promote_options="none")
        rows += merged.num_rows
        pq.write_table(
            merged,
            os.path.join(pdir, finals[i] + ".tmp"),
            row_group_size=row_group_size,
        )

    # intent marker BEFORE any visible mutation
    mpath = os.path.join(pdir, MARKER)
    with open(mpath + ".tmp", "w") as f:
        json.dump({"originals": files, "compacted": finals}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(mpath + ".tmp", mpath)

    for f in finals:
        os.replace(os.path.join(pdir, f + ".tmp"), os.path.join(pdir, f))
    for f in files:
        os.remove(os.path.join(pdir, f))
    os.remove(mpath)
    return {"dir": pdir, "files_before": len(files), "files_after": len(finals),
            "rows": rows, "bytes": total, "skipped": False}


@dataclass
class CompactionReport:
    partitions: list[dict]

    @property
    def files_before(self) -> int:
        return sum(p["files_before"] for p in self.partitions)

    @property
    def files_after(self) -> int:
        return sum(p["files_after"] for p in self.partitions)


def compact_output(
    out_dir: str, *, target_bytes: int = DEFAULT_TARGET_BYTES,
    parallelism: int | None = None,
) -> CompactionReport:
    """Compact every committed partition of a resumable-extract output.

    Partitions rewrite in parallel Ray tasks; uncommitted/tmp partition
    dirs are untouched (they belong to the sink's own commit protocol).
    """
    import ray

    pdirs = sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("partition=") and os.path.isdir(os.path.join(out_dir, d))
    )

    @ray.remote
    def _one(pdir: str, tb: int) -> dict:
        return compact_partition(pdir, target_bytes=tb)

    if not pdirs:
        return CompactionReport(partitions=[])
    refs = [_one.remote(p, target_bytes) for p in pdirs]
    return CompactionReport(partitions=ray.get(refs))
