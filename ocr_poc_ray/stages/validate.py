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

    def key_batch(batch: pa.Table) -> pa.Table:
        # Arrow string kernel over the zero-copy batch: this pass reads
        # the whole corpus, so the former pandas conversion + Python
        # string concat was pure overhead.
        key = pc.binary_join_element_wise(
            batch["conv_id"], pc.cast(batch["turn_idx"], pa.string()), "\x1f"
        )
        return batch.append_column("_turn_key", key)

    keyed = ds.map_batches(key_batch, batch_format="pyarrow").materialize()

    # duplicate keys via per-batch partial counts summed in a BOUNDED
    # bucket groupby (data-scaled count, never one per key): only the
    # true duplicates — retry noise, small by construction — go to the
    # membership switch (same shape as functions.dedup.exact_dedup).
    from ocr_poc_ray.functions.dedup import _scaled_buckets

    _B = _scaled_buckets(keyed)

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("_turn_key", as_index=False).size()
        g["_kb"] = (
            pd.util.hash_array(g["_turn_key"].to_numpy(dtype=object)) % _B
        ).astype("int64")
        return g

    def find_dups(group: pd.DataFrame) -> pd.DataFrame:
        t = group.groupby("_turn_key", as_index=False)["size"].sum()
        return t.loc[t["size"] > 1, ["_turn_key"]]

    dup_ds = (
        keyed.select_columns(["_turn_key"])  # never pandas-convert the payload
        .map_batches(partial_counts, batch_format="pandas")
        .groupby("_kb")
        .map_groups(find_dups, batch_format="pandas")
        .materialize()
    )
    if dup_ds.count() == 0:
        return keyed.drop_columns(["_turn_key"])

    # dup-key membership: broadcast when small, bloom semi-join at
    # scale (functions/dedup.py::membership_flag — the driver never
    # holds a crawl-sized dup set); pinned so both branches read one
    # flag pass.
    from ocr_poc_ray.functions.dedup import membership_flag

    flagged = membership_flag(keyed, "_turn_key", dup_ds, "_turn_key").materialize()
    uniques = flagged.map_batches(
        lambda b: b[~b["_in_set"]].drop(columns=["_turn_key", "_in_set"]),
        batch_format="pandas",
    )

    # winner per duplicated key — smallest (md5(text), ts) — selected
    # INSIDE a bounded hash-bucket groupby (all rows of a key share a
    # bucket): the duplicate rows never collect to the driver.  Bucket
    # count scales with the corpus (flagged is materialized → metadata;
    # a conservative over-estimate of the dup volume, which is what
    # actually flows here) — a fixed 32 hands each task 1/32 of a
    # crawl-scale dup set on exactly the corpora the bloom branch
    # exists for.
    _WB = _scaled_buckets(flagged)

    def dup_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["_in_set"]].drop(columns=["_in_set"])
        b = b.assign(
            _rank=[
                hashlib.md5((t or "").encode("utf-8", "ignore")).hexdigest()
                for t in b["text"]
            ],
            _wb=(pd.util.hash_array(b["_turn_key"].to_numpy(dtype=object)) % _WB
                 ).astype("int64"),
        )
        return b

    def pick_winners(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.sort_values(["_turn_key", "_rank", "ts"], kind="mergesort")
            .groupby("_turn_key", as_index=False)
            .head(1)
            .drop(columns=["_turn_key", "_rank", "_wb"])
            .reset_index(drop=True)
        )

    winners = (
        flagged.map_batches(dup_bucket, batch_format="pandas")
        .groupby("_wb")
        .map_groups(pick_winners, batch_format="pandas")
    )
    return uniques.union(winners)
