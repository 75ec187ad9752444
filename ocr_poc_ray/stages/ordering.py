"""Conversation-ordering shuffle + per-conversation consolidation.

The one true all-to-all exchange in the pipeline (SURVEY.md §7.3): the
reference relies on OCR line order for its first/second-occurrence
rules (P5, ``cni_extractor_18_b.py:206-210``); our analog is that any
cross-turn logic (conversation document assembly, per-conv aggregates)
is only correct under stable ``(conv_id, turn_idx)`` order.

Skew handling (north_rule: explicit salted keys at 10^12-turn scale):
``conversation_docs`` runs TWO grouped passes —

  pass 1: group by ``(conv_id, chunk)`` where ``chunk = turn_idx //
          chunk_size`` — a deterministic *range* salt that splits a
          giant conversation into bounded sub-groups WITHOUT breaking
          order (unlike a hash salt, chunk boundaries respect
          ``turn_idx`` ranges); each sub-group sorts its turns and
          concatenates its text.
  pass 2: group by ``conv_id`` over the (much smaller) chunk rows,
          sort by ``chunk`` and concatenate — at most
          ``ceil(max_turns / chunk_size)`` rows per conversation.

Both passes pre-shrink the data before the shuffle (text is already
reduced to per-chunk strings in pass 1), which is the partial-
aggregation pattern for wide ops.
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


def default_sort_blocks() -> int | None:
    """2× cluster CPUs — the coalesce width for partition-bounded sorts.

    Used where the sorted data is bounded (a resumable-run partition,
    a bench corpus): enough blocks to keep every core busy in the
    reduce, few enough that sampling overhead is negligible.
    """
    try:
        import ray

        if ray.is_initialized():
            return max(2 * int(ray.cluster_resources().get("CPU", 8)), 8)
    except Exception:
        pass
    return None


def _chunk_concat(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("turn_idx", kind="mergesort")
    return pd.DataFrame(
        {
            "conv_id": [group["conv_id"].iloc[0]],
            "chunk": [group["chunk"].iloc[0]],
            "n_turns": [len(group)],
            "text": [" ".join(t for t in group["text"] if t)],
        }
    )


def _conv_concat(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("chunk", kind="mergesort")
    return pd.DataFrame(
        {
            "conv_id": [group["conv_id"].iloc[0]],
            "n_turns": [int(group["n_turns"].sum())],
            "doc_text": [" ".join(t for t in group["text"] if t)],
        }
    )


def conversation_docs(
    ds: Dataset,
    *,
    text_col: str = "extracted_text",
    chunk_size: int = 512,
    success_only: bool = True,
) -> Dataset:
    """Assemble one document per conversation in stable turn order.

    `ds` must carry ``conv_id``/``turn_idx``/`text_col` columns (the
    extraction output).  Returns CONVERSATION_DOC_SCHEMA rows.
    """

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"],
            "chunk": pc.divide(batch["turn_idx"], chunk_size),
            "text": batch[text_col],
        }
        tbl = pa.table(cols)
        if success_only and "success" in batch.column_names:
            tbl = tbl.filter(batch["success"].combine_chunks())
        return tbl

    projected = ds.map_batches(project, batch_format="pyarrow")
    chunked = projected.groupby(["conv_id", "chunk"]).map_groups(
        _chunk_concat, batch_format="pandas"
    )
    docs = chunked.groupby("conv_id").map_groups(_conv_concat, batch_format="pandas")
    return docs.map_batches(
        lambda t: t.select(CONVERSATION_DOC_SCHEMA.names).cast(CONVERSATION_DOC_SCHEMA),
        batch_format="pyarrow",
    )
