"""Conversation-ordering shuffle + per-conversation consolidation.

The one true all-to-all exchange in the pipeline (SURVEY.md §7.3): the
reference relies on OCR line order for its first/second-occurrence
rules (P5, ``cni_extractor_18_b.py:206-210``); our analog is that any
cross-turn logic (conversation document assembly, per-conv aggregates)
is only correct under stable ``(conv_id, turn_idx)`` order.

Skew handling (north_rule: explicit skew breaking at 10^12-turn
scale): ``conversation_docs`` never gives one task a whole
conversation.  The range sort splits a giant conversation across
blocks on *turn_idx range* boundaries (a deterministic range salt —
unlike a hash salt it cannot break within-conversation order); the
per-block pass collapses each contiguous run to ONE bounded partial
row, and only those pre-shrunk partials flow into the final
``groupby(conv_id)`` merge — the partial-aggregation pattern for
wide ops.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ocr_poc_ray.schemas import CONVERSATION_DOC_SCHEMA


def sort_by_turn(ds: Dataset, *, num_blocks: int | None = None) -> Dataset:
    """Global stable order by (conv_id, turn_idx) — a range-partitioned sort.

    ``num_blocks``: coalesce to this many blocks before sorting.  The
    range-sort's fixed cost (boundary sampling + all-to-all exchange)
    grows with input block count, so upstream stages that emit many
    small blocks (a fine-grained extraction fan-out) should be
    coalesced to ~cluster-CPU-count blocks first; leave ``None`` when
    blocks are already near the target block size (the large-scale
    case, where an extra repartition would itself be an all-to-all).
    """
    if num_blocks:
        ds = ds.repartition(num_blocks)
    return ds.sort(["conv_id", "turn_idx"])


#: target bytes per sorted output block — the knob that makes the sort
#: width scale with DATA, not CPUs (measured: the range-sort's cost is
#: dominated by output width × exchange-task overhead, so a small
#: corpus wants few wide blocks, a 100-TB partition wants bytes/64MB).
SORT_TARGET_BLOCK_BYTES = 64 << 20


def default_sort_blocks(bytes_hint: int | None = None) -> int | None:
    """Sort coalesce width: ``max(floor, bytes_hint / 64 MB)``.

    The floor (8, or CPUs/4 when larger) keeps the reduce parallel
    enough on small partitions without paying a wide exchange; with a
    ``bytes_hint`` the width grows linearly with the data so blocks
    stay near the target size at any scale.
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    floor = max(8, cpus // 4)
    if bytes_hint:
        return max(floor, int(bytes_hint // SORT_TARGET_BLOCK_BYTES))
    return floor


def _block_partials(batch: pa.Table) -> pa.Table:
    """Within one SORTED block, concat each conversation's contiguous
    run of turns into a single partial row.  Pure Arrow kernels over the
    zero-copy batch (run boundaries via a shifted not_equal, the join
    via ``pc.binary_join`` on a ListArray view) — this pass touches the
    whole corpus, so the former pandas conversion + per-run Python
    ``" ".join`` was a measurable constant factor.  The first/last
    conversation of the block may continue in a neighbor block → edge."""
    import numpy as np
    import pyarrow.compute as pc

    n = batch.num_rows
    if n == 0:
        return pa.table(
            {"conv_id": pa.array([], batch.schema.field("conv_id").type),
             "first_turn": pa.array([], batch.schema.field("turn_idx").type),
             "n_turns": pa.array([], pa.int64()),
             "text": pa.array([], pa.string()),
             "edge": pa.array([], pa.bool_())}
        )
    conv = batch["conv_id"].combine_chunks()
    neq = pc.not_equal(conv.slice(1), conv.slice(0, n - 1))
    starts = np.concatenate(
        [[0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1]
    ).astype(np.int64)
    ends = np.append(starts[1:], n)
    text = pc.fill_null(batch["text"].combine_chunks(), "")
    # join only non-empty turn texts, but count EVERY turn in n_turns
    nonempty = pc.not_equal(text, "").to_numpy(zero_copy_only=False)
    seg_of_row = np.repeat(np.arange(len(starts)), ends - starts)
    kept_rows = np.flatnonzero(nonempty)
    kept_counts = np.bincount(seg_of_row[kept_rows], minlength=len(starts))
    offsets = np.concatenate([[0], np.cumsum(kept_counts)])
    joined = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), text.take(pa.array(kept_rows))
        ),
        " ",
    )
    edge = np.zeros(len(starts), dtype=bool)
    edge[[0, -1]] = True
    take_starts = pa.array(starts)
    return pa.table(
        {"conv_id": conv.take(take_starts),
         "first_turn": batch["turn_idx"].combine_chunks().take(take_starts),
         "n_turns": pa.array(ends - starts, pa.int64()),
         "text": joined,
         "edge": pa.array(edge)}
    )


def conversation_docs(
    ds: Dataset,
    *,
    text_col: str = "extracted_text",
    chunk_size: int = 512,  # kept for API compat; block size bounds runs now
    success_only: bool = True,
    sort_num_blocks: int | None = None,
) -> Dataset:
    """Assemble one document per conversation in stable turn order.

    Shape: narrow projection → ONE range-partitioned sort on
    ``(conv_id, turn_idx)`` → per-block partial concatenation (each
    conversation's contiguous run collapses to one row, vectorized).
    Conversations wholly inside a block finalize there; only the at
    most two conversations touching each block's edges — O(num_blocks)
    rows, not O(num_conversations) — travel to one small ordered
    combine.  Skew handling falls out of the sort's range
    partitioning: a giant conversation spans several blocks, each
    partial bounded by block size; conversation count never appears as
    a group count anywhere (a grouped pass per conversation would pay
    Ray per-group overhead × 10^9 at corpus scale).
    """

    def project(batch: pa.Table) -> pa.Table:
        cols = {
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "text": batch[text_col],
        }
        tbl = pa.table(cols)
        if success_only and "success" in batch.column_names:
            tbl = tbl.filter(batch["success"].combine_chunks())
        return tbl

    projected = ds.map_batches(project, batch_format="pyarrow")
    ordered = sort_by_turn(projected, num_blocks=sort_num_blocks or default_sort_blocks())
    # ONE pinned execution: the finals and edges branches must see the
    # same batch slicing (see functions/windows.py for the bug class).
    partials = ordered.map_batches(_block_partials, batch_format="pyarrow").materialize()

    def finals_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = t.filter(pc.invert(t["edge"].combine_chunks()))
        return pa.table(
            {"conv_id": f["conv_id"], "n_turns": f["n_turns"], "doc_text": f["text"]}
        )

    finals = partials.map_batches(finals_batch, batch_format="pyarrow")
    # Distributed edge merge: edge partials (each carrying up to one
    # block's concatenated run text) go through a BOUNDED hash-bucket
    # groupby — all partials of a conversation share a bucket — and the
    # ordered concat runs inside each bucket TASK.  The driver never
    # holds any text; a conversation spanning k blocks costs one task
    # its k partials (its output document is that size by definition).
    _EB = 32

    def edge_bucket(t: pa.Table) -> pd.DataFrame:
        # Arrow filter first: only the O(2-per-block) edge rows — never
        # the block's full partial text — get converted to pandas.
        b = t.filter(t["edge"].combine_chunks()).to_pandas()
        return b.assign(
            _eb=(pd.util.hash_array(b["conv_id"].to_numpy()) % _EB).astype("int64")
        )

    def merge_edges(group: pd.DataFrame) -> pd.DataFrame:
        if group.empty:
            return pd.DataFrame(
                {"conv_id": pd.Series([], dtype="object"),
                 "n_turns": pd.Series([], dtype="int64"),
                 "doc_text": pd.Series([], dtype="object")}
            )
        g = group.sort_values(["conv_id", "first_turn"], kind="mergesort")
        agg = (
            g.groupby("conv_id", sort=False)
            .agg(n_turns=("n_turns", "sum"),
                 doc_text=("text", lambda s: " ".join(t for t in s if t)))
            .reset_index()
        )
        agg["n_turns"] = agg["n_turns"].astype("int64")
        return agg[["conv_id", "n_turns", "doc_text"]]

    merged = (
        partials.map_batches(edge_bucket, batch_format="pyarrow")
        .groupby("_eb")
        .map_groups(merge_edges, batch_format="pandas")
    )
    docs = finals.union(merged)
    return docs.map_batches(
        lambda t: t.select(CONVERSATION_DOC_SCHEMA.names).cast(CONVERSATION_DOC_SCHEMA),
        batch_format="pyarrow",
    )
