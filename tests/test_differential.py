"""Randomized differential harness: GENERATED documents/events tables
(seeded, schema-conformant, adversarially spiced) run through a subset
of oracle-checked queries on BOTH engines.  The fixed testdata can
mask bugs its distributions never hit (empty zero buckets, noise-line
extraction corners, timestamp ties, duplicate texts); random tables
hunt those.  Only integer/string/2-dp-total outputs participate — the
float-rounding-boundary rule from CLAUDE.md — and generated `value`s
are exact binary quarters so 2-dp totals cannot sit on a boundary.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

TABLES = ("documents", "events")

#: queries safe for random inputs: integer/string outputs (or 2-dp
#: totals over exact-quarter values), no fixture-specific constants
DIFF_QUERIES = [
    "rel_daily_events",
    "rel_event_type_stats",
    "rel_hourly_profile",
    "rel_event_streaks",
    "rel_session_spans",
    "rel_window_dedup",
    "rel_user_mode_event",
    "rel_late_events",
    "rel_user_coverage_time",
    "doc_exact_dedup",
    "doc_train_split",
    "doc_langid",
    "doc_langid_confusion",
    "xs_role_balance",
    "xs_window_export",
    "xs_window_export_text",
    "xs_first_turn_dedup",
    "xs_template_safe_split",
    "xs_conv_dedup",
    "xs_tool_runs",
    "xs_tool_latency",
    "xs_tool_transitions",
    "xs_conv_turn_offsets",
    "xs_extract_documents",
    # second wave — integer/string outputs over the generated tables
    "doc_source_lang_matrix",
    "doc_fingerprint",
    "doc_dup_components_exact",
    "doc_length_ntile",
    "doc_lang_source_rollup",
    "doc_lang_source_cube",
    "rel_user_funnel",
    "rel_viewers_never_purchased",
    "rel_cumulative_users",
    "rel_rolling_active_users",
    "rel_distinct_users",
    "rel_props_json",
    "xs_dialogue_pairs",
    "xs_role_transitions",
    "xs_conv_pack",
    "xs_truncate_to_budget",
]

_STOP = {
    "en": ["the", "and", "with", "from"],
    "fr": ["le", "et", "dans", "pour"],
    "de": ["der", "und", "mit", "nicht"],
    "es": ["el", "los", "para", "como"],
}
_NOISE = ["I<FRA<<X", "a<<<b", "ABC", "", "  "]
_WORDS = ["alpha", "beta", "gamma", "delta", "sort", "merge", "table", "row"]


def _gen_documents(rng: np.random.Generator, n: int) -> pd.DataFrame:
    langs = np.asarray(["en", "fr", "de", "es", "zh"], dtype=object)
    sources = np.asarray([f"s{i}" for i in range(rng.integers(2, 7))], dtype=object)
    texts = []
    for _ in range(n):
        lines = []
        for _l in range(rng.integers(1, 5)):
            k = rng.integers(0, 10)
            if k < 2:  # noise line the extractor must drop
                lines.append(_NOISE[rng.integers(0, len(_NOISE))])
            else:
                pool = _WORDS + _STOP[
                    ["en", "fr", "de", "es"][rng.integers(0, 4)]
                ]
                lines.append(
                    " ".join(
                        pool[rng.integers(0, len(pool))]
                        for _w in range(rng.integers(1, 7))
                    )
                )
        texts.append("\n".join(lines))
    # plant exact duplicates (dedup must fire)
    for _ in range(max(2, n // 10)):
        i, j = rng.integers(0, n, 2)
        texts[i] = texts[j]
    ids = rng.permutation(np.arange(n, dtype=np.int64) * 3 + 1)
    return pd.DataFrame(
        {
            "doc_id": ids,
            "text": pd.Series(texts, dtype=object),
            "lang": langs[rng.integers(0, len(langs), n)],
            "source": sources[rng.integers(0, len(sources), n)],
            "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
        }
    )


def _gen_events(rng: np.random.Generator, n: int) -> pd.DataFrame:
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 20 * 86_400_000_000
    ts = base + rng.integers(0, span_us, n).astype("timedelta64[us]")
    # plant timestamp ties inside users (ordering tie-break stress)
    for _ in range(n // 20):
        i, j = rng.integers(0, n, 2)
        ts[i] = ts[j]
    types = np.asarray(["view", "click", "purchase", "error", "signup"], dtype=object)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "event_type": types[rng.integers(0, len(types), n)],
            # exact binary quarters: 2-dp totals can't hit a boundary
            "value": rng.integers(0, 2000, n).astype(np.float64) / 4.0,
            "props": pd.Series(['{"k": %d}' % int(x) for x in rng.integers(0, 97, n)],
                               dtype=object),
        }
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module", params=[101, 202, 303])
def random_sf_dir(request, tmp_path_factory):
    rng = np.random.default_rng(request.param)
    d = tmp_path_factory.mktemp(f"diff_{request.param}")
    _gen_documents(rng, int(rng.integers(40, 160))).to_parquet(
        os.path.join(d, "documents.parquet"), index=False
    )
    _gen_events(rng, int(rng.integers(100, 500))).to_parquet(
        os.path.join(d, "events.parquet"), index=False
    )
    return str(d)


@pytest.mark.parametrize("name", DIFF_QUERIES)
def test_differential_random_tables(ray_session, random_sf_dir, name):
    from ocr_poc_ray.queries import REGISTRY

    fn, sql = REGISTRY[name]
    assert sql is not None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{random_sf_dir}/{t}.parquet')"
        )
    mine = _canon(fn(random_sf_dir))
    oracle = _canon(con.execute(sql).fetchdf())
    assert list(mine.columns) == list(oracle.columns), name
    assert len(mine) == len(oracle), f"{name}: {len(mine)} vs {len(oracle)}"
    if len(mine):
        oracle = oracle.astype(mine.dtypes.to_dict())
    pd.testing.assert_frame_equal(mine, oracle, check_dtype=False)
