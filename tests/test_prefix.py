"""Distributed prefix-sum / row-number vs a single-process pandas scan."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray

from ocr_poc_ray.functions import ordered_prefix_sum


def _frame(n: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": rng.permutation(n).astype("int64"),
            "v": rng.integers(0, 100, n).astype("int64"),
            "grp": rng.integers(0, 5, n).astype("int64"),
        }
    )


@pytest.mark.parametrize("n,blocks", [(1, 1), (97, 3), (5000, 16)])
def test_prefix_sum_matches_pandas(ray_session, n, blocks):
    df = _frame(n, seed=n)
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = (
        ordered_prefix_sum(
            ds, sort_cols=["id"], value_col="v", out_col="cum", sort_num_blocks=blocks
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = df.sort_values("id").reset_index(drop=True)
    exp["cum"] = exp["v"].cumsum()
    pd.testing.assert_frame_equal(out[["id", "v", "cum"]], exp[["id", "v", "cum"]])


def test_row_number_with_duplicate_sort_prefix(ray_session):
    """Sorting by (grp, id): grp has heavy duplicates spanning blocks —
    the unique tiebreak column keeps the global rank exact."""
    df = _frame(4000, seed=7)
    ds = ray.data.from_pandas(df).repartition(8)
    out = (
        ordered_prefix_sum(
            ds,
            sort_cols=["grp", "id"],
            value_col=None,
            out_col="rank",
            unique_col="id",
            sort_num_blocks=8,
        )
        .to_pandas()
        .sort_values(["grp", "id"])
        .reset_index(drop=True)
    )
    assert (out["rank"].to_numpy() == np.arange(1, len(df) + 1)).all()


@pytest.mark.parametrize("n,blocks", [(1, 1), (97, 3), (5000, 16)])
def test_prefix_max_matches_numpy(ray_session, n, blocks):
    """op='max' — the watermark scan: running max including negatives
    (the int64-min identity must not leak into batch 0's rows)."""
    rng = np.random.default_rng(n + 1)
    df = pd.DataFrame(
        {
            "id": rng.permutation(n).astype("int64"),
            "v": rng.integers(-(10**6), 10**6, n).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = (
        ordered_prefix_sum(
            ds, sort_cols=["id"], value_col="v", out_col="wm",
            sort_num_blocks=blocks, op="max",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = df.sort_values("id").reset_index(drop=True)
    exp["wm"] = np.maximum.accumulate(exp["v"].to_numpy())
    pd.testing.assert_frame_equal(out[["id", "v", "wm"]], exp[["id", "v", "wm"]])


def test_prefix_max_rejects_row_number():
    with pytest.raises(ValueError):
        ordered_prefix_sum(
            None, sort_cols=["id"], value_col=None, out_col="x", op="max"
        )


def test_prefix_sum_string_sort_key(ray_session):
    """Rank by a string key (the deterministic-shuffle use case)."""
    df = pd.DataFrame({"id": np.arange(300, dtype="int64")})
    df["key"] = [f"k{(i * 37) % 300:04d}" for i in df["id"]]
    ds = ray.data.from_pandas(df).repartition(5)
    out = (
        ordered_prefix_sum(
            ds,
            sort_cols=["key", "id"],
            value_col=None,
            out_col="rank",
            unique_col="id",
            sort_num_blocks=4,
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert (out["rank"].to_numpy() == np.arange(1, 301)).all()
