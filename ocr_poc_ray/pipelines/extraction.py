"""The flagship pipeline: read → validate → extract → order → write.

Streaming end-to-end (SURVEY.md §7.1): the only materialization points
are the sinks; the only all-to-all exchange is the optional final sort.
Two deployment shapes:

- ``extract_transcripts``: composable Dataset → Dataset transform.
- ``resumable_extract``:  the checkpointed driver loop — shard plan →
  per-partition streaming runs with atomic commit + manifest lineage
  (north_rule resume semantics).  Each partition is a group of shards
  large enough to keep the whole cluster busy, so partitions run
  sequentially while everything inside a partition is parallel.
"""

from __future__ import annotations

import time

import pyarrow.parquet as pq

import ray.data
from ray.data import Dataset

from ocr_poc_ray.sources.parquet_shards import ParquetShard, plan_shards, read_shards
from ocr_poc_ray.stages.extract import EXTRACTOR_VERSION, ExtractTurns
from ocr_poc_ray.stages.ordering import default_sort_blocks, sort_by_turn
from ocr_poc_ray.stages.validate import validate_transcripts_batch
from ocr_poc_ray.state.manifest import Manifest, PartitionRecord

#: rows per extraction batch.  ``None`` = one zero-copy batch per block
#: (the fast path for our cheap heuristic extractors — no cross-block
#: coalescing, no slicing).  Pass a few hundred when the per-row work is
#: heavy (a learned model) so the actor pool stays load-balanced.
DEFAULT_BATCH_SIZE: int | None = None


def extract_transcripts(
    source: str | list[str] | Dataset,
    *,
    batch_size: int | None = DEFAULT_BATCH_SIZE,
    concurrency: int | tuple[int, int] | None = None,
    ordered: bool = False,
    sort_num_blocks: int | None = None,
) -> Dataset:
    """Transcripts (path or Dataset) → extraction-envelope Dataset.

    ``sort_num_blocks``: block coalesce width for the ordering sort;
    defaults to 2× cluster CPUs (right for partition-bounded inputs —
    a resumable-run partition or a bench corpus).  Pass explicitly for
    a one-shot global sort of unbounded data.
    """
    bytes_hint: int | None = None
    if isinstance(source, Dataset):
        ds = source
    else:
        ds = ray.data.read_parquet(source)
        # Size the ordering sort from the input footprint (extracted
        # text is ~1/4 of the raw payload after boilerplate stripping).
        bytes_hint = _paths_bytes(source) // 4 or None
    ds = ds.map_batches(validate_transcripts_batch, batch_format="pyarrow")
    if concurrency is None:
        # Stateless tasks: elastic, no pool sizing to get wrong.  Pass a
        # concurrency to switch to the actor-pool shape (model slot).
        ds = ds.map_batches(
            ExtractTurns(), batch_format="pyarrow", batch_size=batch_size
        )
    else:
        ds = ds.map_batches(
            ExtractTurns,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    if ordered:
        ds = sort_by_turn(
            ds, num_blocks=sort_num_blocks or default_sort_blocks(bytes_hint)
        )
    return ds


def _paths_bytes(source: str | list[str]) -> int:
    import os

    total = 0
    for path in [source] if isinstance(source, str) else source:
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        elif os.path.exists(path):
            total += os.path.getsize(path)
    return total


def run_extraction(
    input_path: str | list[str],
    output_dir: str,
    *,
    batch_size: int | None = DEFAULT_BATCH_SIZE,
    concurrency: int | tuple[int, int] | None = None,
    ordered: bool = True,
    failed_json_dir: str | None = None,
) -> dict:
    """One-shot (non-checkpointed) run; returns summary metrics
    (rows, success/failure counts, throughput) read back from the
    written files' ``success`` column — the S5 metrics record for runs
    that skip the manifest.

    ``failed_json_dir``: also write the failure envelopes as JSON (the
    S3 debug-artifact sink — human-greppable triage of every turn that
    produced ``success=false``, keyed by its error class).
    """
    import os

    t0 = time.perf_counter()
    ds = extract_transcripts(
        input_path, batch_size=batch_size, concurrency=concurrency, ordered=ordered
    )
    ds.write_parquet(output_dir)
    wall = time.perf_counter() - t0
    if failed_json_dir:
        import pyarrow.compute as pc

        failed = ray.data.read_parquet(
            output_dir, columns=["conv_id", "turn_idx", "tool", "error", "success"]
        ).map_batches(
            lambda b: b.filter(pc.invert(b["success"].combine_chunks())).drop_columns(
                ["success"]
            ),
            batch_format="pyarrow",
        )
        failed.write_json(failed_json_dir)
    files = sorted(
        os.path.join(output_dir, f)
        for f in os.listdir(output_dir)
        if f.endswith(".parquet")
    )
    metrics = _partition_metrics(files)
    return {
        "output_dir": output_dir,
        "wall_time_s": round(wall, 3),
        "rows": metrics["rows"],
        "success": metrics["success"],
        "failed": metrics["failed"],
        "turns_per_sec": round(metrics["rows"] / wall, 1) if wall > 0 else 0.0,
    }


def _partition_metrics(files: list[str]) -> dict:
    """Success/failure counts from the written files' `success` column
    (columnar read of one bool column — no recompute)."""
    n_rows = 0
    n_success = 0
    for f in files:
        t = pq.read_table(f, columns=["success"])
        n_rows += t.num_rows
        n_success += t["success"].combine_chunks().sum().as_py() or 0
    return {"rows": n_rows, "success": n_success, "failed": n_rows - n_success}


def _jsonl_partition_metrics(files: list[str]) -> dict:
    """Success/failure counts for JSONL output: one distributed pass
    over the written files (a row format has no columnar footer to
    project — the documented cost of the jsonl sink)."""
    import pandas as pd

    import ray.data as _rd

    parts = (
        _rd.read_json(files)
        .map_batches(
            lambda b: pd.DataFrame(
                [{"rows": len(b), "success": int(b["success"].sum())}]
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    n_rows = int(parts["rows"].sum())
    n_success = int(parts["success"].sum())
    return {"rows": n_rows, "success": n_success, "failed": n_rows - n_success}


def resumable_extract(
    input_path: str | list[str],
    output_dir: str,
    *,
    num_partitions: int = 16,
    shard_rows: int = 250_000,
    batch_size: int | None = DEFAULT_BATCH_SIZE,
    concurrency: int | tuple[int, int] | None = None,
    max_partitions_this_run: int | None = None,
    dedup_input: bool = False,
    output_format: str = "parquet",
) -> dict:
    """Checkpointed extraction: skip committed partitions, commit atomically.

    ``max_partitions_this_run`` exists for the kill/resume test: stop
    after k commits and a rerun finishes the rest without reprocessing.
    ``dedup_input`` collapses duplicated (conv_id, turn_idx) rows per
    partition before extraction (stages.validate.dedup_turns) — the
    hygiene guard for corpora assembled from retried upstream writes.
    ``output_format="jsonl"`` writes newline-delimited JSON shards
    instead of parquet (the wire format downstream agent frameworks
    consume), under the same manifest/atomic-commit contract.  Note the
    honest cost of a row format: partition metrics need one extra
    distributed pass over the written files (parquet gets them from a
    single-column footer read).
    """
    if output_format not in ("parquet", "jsonl"):
        raise ValueError(f"unknown output_format: {output_format!r}")
    shards = plan_shards(input_path, target_rows=shard_rows)
    # Deterministic partition assignment: contiguous shard ranges.
    parts: dict[int, list[ParquetShard]] = {}
    np_ = min(num_partitions, len(shards)) or 1
    for s in shards:
        parts.setdefault(s.shard_id % np_, []).append(s)

    manifest = Manifest(output_dir)
    done = manifest.completed(EXTRACTOR_VERSION)
    # Resume must not silently mix formats in one output dir: committed
    # partitions record their sink format, and a resume with a different
    # one is a caller error, not a skip.
    committed_formats = {
        (rec.metrics or {}).get("format", "parquet")
        for pid, rec in manifest.records().items()
        if pid in done
    }
    if committed_formats - {output_format}:
        raise ValueError(
            f"output_dir {output_dir!r} has partitions committed as "
            f"{sorted(committed_formats)}; resume with the same "
            f"output_format, not {output_format!r}"
        )
    ran: list[int] = []
    skipped = sorted(done)
    for pid in sorted(parts):
        if pid in done:
            continue
        if max_partitions_this_run is not None and len(ran) >= max_partitions_this_run:
            break
        t0 = time.perf_counter()
        tmp = manifest.begin(pid)
        ds = read_shards(parts[pid])
        if dedup_input:
            from ocr_poc_ray.stages.validate import dedup_turns

            ds = dedup_turns(ds)
        ds = extract_transcripts(
            ds, batch_size=batch_size, concurrency=concurrency, ordered=False
        )
        # Order within the partition so output files are deterministic.
        ds = sort_by_turn(ds, num_blocks=default_sort_blocks())
        import os

        if output_format == "jsonl":
            ds.write_json(tmp)
            ext, metrics_fn = ".json", _jsonl_partition_metrics
        else:
            ds.write_parquet(tmp)
            ext, metrics_fn = ".parquet", _partition_metrics
        files = sorted(
            os.path.join(tmp, f) for f in os.listdir(tmp) if f.endswith(ext)
        )
        metrics = metrics_fn(files)
        metrics["format"] = output_format
        manifest.commit(
            PartitionRecord(
                partition_id=pid,
                input_lineage=[s.lineage() for s in parts[pid]],
                extractor_version=EXTRACTOR_VERSION,
                row_count=metrics["rows"],
                metrics=metrics,
                wall_time_s=time.perf_counter() - t0,
            )
        )
        ran.append(pid)
    return {
        "output_dir": output_dir,
        "partitions_total": len(parts),
        "partitions_ran": ran,
        "partitions_skipped": skipped,
        "manifest": manifest.path,
    }
