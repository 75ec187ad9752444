"""Input validation stage (P12 analog, ``api_server.py:193-248``).

Vectorized over Arrow batches: asserts the transcript schema, fills
null ``tool``/``role``/``text`` so downstream stages never see nulls.
Unknown enum values are NOT rejected here — they flow through and the
extraction stage emits structured ``unknown_tool:*`` failure rows, so
one bad row never fails a block (SURVEY.md §7.4.4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ocr_poc_ray.schemas import TRANSCRIPTS_SCHEMA, validate_table


def validate_transcripts_batch(batch: pa.Table) -> pa.Table:
    batch = validate_table(batch, TRANSCRIPTS_SCHEMA, where="validate_transcripts")
    out = batch
    for col in ("tool", "role", "text"):
        arr = out[col]
        if arr.null_count:
            out = out.set_column(
                out.schema.get_field_index(col),
                col,
                pc.fill_null(arr, "" if col != "role" else "unknown"),
            )
    return out


def dedup_turns(ds):
    """Exact dedup on the (conv_id, turn_idx) turn key — the
    idempotence guard for corpora assembled from retried upstream
    writes (SURVEY.md §2.5).  Same shape as functions.dedup.exact_dedup:
    unique keys pass straight through; only the duplicate-bounded hot
    set pays a combine, where the winner is the row with the smallest
    (md5(text), ts) — deterministic under any input order.
    """
    import hashlib

    import pandas as pd
    import ray
    import ray.data as rd

    def key_batch(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["_turn_key"] = b["conv_id"] + "\x1f" + b["turn_idx"].astype(str)
        return b

    keyed = ds.map_batches(key_batch, batch_format="pandas").materialize()

    # duplicate keys via per-batch partial counts summed in a BOUNDED
    # bucket groupby (32 groups, never one per key): only the true
    # duplicates — retry noise, small by construction — reach the
    # driver for broadcast (same shape as functions.dedup.exact_dedup).
    _B = 32

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[["_turn_key"]].groupby("_turn_key", as_index=False).size()
        g["_kb"] = (
            pd.util.hash_array(g["_turn_key"].to_numpy(dtype=object)) % _B
        ).astype("int64")
        return g

    def find_dups(group: pd.DataFrame) -> pd.DataFrame:
        t = group.groupby("_turn_key", as_index=False)["size"].sum()
        return t.loc[t["size"] > 1, ["_turn_key"]]

    dup_df = (
        keyed.map_batches(partial_counts, batch_format="pandas")
        .groupby("_kb")
        .map_groups(find_dups, batch_format="pandas")
        .to_pandas()
    )
    dup_keys = (
        set(dup_df["_turn_key"]) if "_turn_key" in dup_df.columns else set()
    )

    if not dup_keys:
        return keyed.drop_columns(["_turn_key"])

    dup_ref = ray.put(dup_keys)

    def keep_unique(batch: pd.DataFrame) -> pd.DataFrame:
        dup = ray.get(dup_ref)
        return batch[~batch["_turn_key"].isin(dup)].drop(columns=["_turn_key"])

    def dup_rows(batch: pd.DataFrame) -> pd.DataFrame:
        dup = ray.get(dup_ref)
        return batch[batch["_turn_key"].isin(dup)]

    uniques = keyed.map_batches(keep_unique, batch_format="pandas")
    dups = keyed.map_batches(dup_rows, batch_format="pandas").to_pandas()
    dups["_rank"] = [
        hashlib.md5((t or "").encode("utf-8", "ignore")).hexdigest() for t in dups["text"]
    ]
    winners = (
        dups.sort_values(["_turn_key", "_rank", "ts"], kind="mergesort")
        .groupby("_turn_key", as_index=False)
        .head(1)
        .drop(columns=["_turn_key", "_rank"])
        .reset_index(drop=True)
    )
    return uniques.union(rd.from_pandas(winners))
