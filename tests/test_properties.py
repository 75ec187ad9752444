"""Property-based robustness (SURVEY.md §5.4 + §7.4.4): extraction is
total — ANY input yields a well-formed envelope, never an exception —
and the frozen whitespace normalization is idempotent and stable."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_poc_ray.extractors.base import normalize_ws
from ocr_poc_ray.extractors.fields import extract_fields
from ocr_poc_ray.extractors.registry import extract_turn

_tools = st.sampled_from(["", "html", "pdf", "md", "json", "img", "weird", "HTML"])


@settings(max_examples=300, deadline=None)
@given(text=st.text(max_size=2000), tool=_tools)
def test_extract_turn_is_total(text, tool):
    r = extract_turn(text, tool)
    assert isinstance(r.extracted_text, str)
    assert isinstance(r.success, bool)
    assert 0.0 <= r.confidence <= 1.0 or r.quality_score >= 0.0
    if not r.success:
        assert r.error  # failures always carry a reason
    # the envelope's text is always fully normalized
    assert r.extracted_text == normalize_ws(r.extracted_text)


@settings(max_examples=200, deadline=None)
@given(text=st.text(max_size=500))
def test_normalize_ws_idempotent(text):
    once = normalize_ws(text)
    assert normalize_ws(once) == once
    assert once == once.strip()


@settings(max_examples=100, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.text(max_size=40),
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
            st.floats(min_value=-1000, max_value=1000, allow_nan=False),
            st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        ),
        max_size=20,
    )
)
def test_extract_fields_is_total(rows):
    texts = [r[0] for r in rows]
    scores = [r[1] for r in rows]
    polys = [
        [[r[2], r[3]], [r[2] + 10, r[3]], [r[2] + 10, r[3] + 5], [r[2], r[3] + 5]]
        for r in rows
    ]
    res = extract_fields(texts, scores, polys)
    assert isinstance(res.success, bool)
    assert set(res.fields) == {
        "nom", "prenom", "date_naissance", "lieu_naissance", "sexe", "taille", "profession",
    }


# ---------------------------------------------------------------------------
# Window operators: random corpora through forced splits must equal the
# pandas oracle (the interior/edge machinery is the most intricate code
# in the engine — fuzz it).
# ---------------------------------------------------------------------------

import pandas as pd
from hypothesis import HealthCheck


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_users=st.integers(min_value=1, max_value=5),
    per_user=st.integers(min_value=1, max_value=25),
    nblocks=st.integers(min_value=2, max_value=6),
)
def test_sessionize_random_corpora(ray_session, seed, n_users, per_user, nblocks):
    import numpy as np
    import ray.data as rd

    from ocr_poc_ray.functions.windows import sessionize

    rng = np.random.RandomState(seed)
    rows = []
    eid = 0
    for u in range(n_users):
        t = pd.Timestamp("2024-01-01")
        for _ in range(per_user):
            # zero-second steps are drawn often: duplicate timestamps
            # exercise the edge-merge (first_ts, last_ts) tie-break
            t = t + pd.Timedelta(seconds=int(rng.choice([0, 0, 1, 120, 1800, 2500, 3900])))
            rows.append({"user_id": u, "ts": t, "event_id": eid})
            eid += 1
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=seed).reset_index(drop=True)

    got = (
        sessionize(rd.from_pandas(df), gap_s=1800.0, sort_num_blocks=nblocks)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp_rows = []
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        gaps = g["ts"].diff().dt.total_seconds()
        exp_rows.append(
            {"user_id": u, "n_events": len(g),
             "n_sessions": int((gaps.isna() | (gaps > 1800.0)).sum())}
        )
    exp = pd.DataFrame(exp_rows)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_registered_extractor_exceptions_are_contained():
    """An extractor that raises becomes a failure ROW via extract_turn's
    containment — the registry guarantee plugins inherit."""
    from ocr_poc_ray.extractors.registry import EXTRACTORS, extract_turn, register_extractor

    def exploding(_text: str):
        raise RuntimeError("boom")

    try:
        register_extractor("exploding", exploding)
        r = extract_turn("anything", "exploding")
        assert not r.success
        assert r.error == "extractor_error:RuntimeError"
    finally:
        EXTRACTORS.pop("exploding", None)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.floats(-1e6, 1e6, allow_nan=False, width=64),
        ),
        min_size=1,
        max_size=200,
    ),
    q=st.floats(0.0, 1.0),
)
def test_exact_quantile_matches_duckdb(ray_session, data, q):
    """The range-refinement selection must reproduce DuckDB's
    quantile_disc bit-for-bit on arbitrary floats, duplicates, and any
    q — the oracle semantics themselves, not a reimplementation."""
    import duckdb
    import ray.data

    from ocr_poc_ray.functions.selection import exact_group_quantile_disc

    df = pd.DataFrame(data, columns=["k", "v"])
    ds = ray.data.from_pandas(df).repartition(3)
    got = exact_group_quantile_disc(
        ds, key_col="k", value_col="v", q=q, n_bins=8, collect_threshold=4
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        f"select k, quantile_disc(v, {q!r}) as value from t group by k"
    ).fetchdf()
    merged = got.merge(exp, on="k", suffixes=("_got", "_exp"))
    assert len(merged) == df["k"].nunique()
    assert (merged["value_got"] == merged["value_exp"]).all(), merged


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_users=st.integers(min_value=1, max_value=4),
    per_user=st.integers(min_value=1, max_value=25),
    nblocks=st.integers(min_value=2, max_value=6),
)
def test_streaks_random_corpora(ray_session, seed, n_users, per_user, nblocks):
    """keyed_streaks equals a sequential run-length scan on any corpus
    — duplicate timestamps and tiny blocks force runs across every
    block boundary."""
    import numpy as np
    import ray.data as rd

    from ocr_poc_ray.functions.windows import keyed_streaks

    rng = np.random.RandomState(seed)
    rows = []
    eid = 0
    for u in range(n_users):
        t = pd.Timestamp("2024-01-01")
        for _ in range(per_user):
            t = t + pd.Timedelta(seconds=int(rng.choice([0, 0, 1, 300])))
            rows.append(
                {"user_id": u, "ts": t, "event_id": eid,
                 "event_type": str(rng.choice(["a", "b"]))}
            )
            eid += 1
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=seed).reset_index(drop=True)

    got = (
        keyed_streaks(rd.from_pandas(df), sort_num_blocks=nblocks)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp_rows = []
    for u, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        labels = g["event_type"].tolist()
        runs = []
        for lab in labels:
            if runs and runs[-1][0] == lab:
                runs[-1][1] += 1
            else:
                runs.append([lab, 1])
        mx = max(r[1] for r in runs)
        exp_rows.append(
            {"user_id": u, "n_runs": len(runs), "max_run": mx,
             "top_type": min(r[0] for r in runs if r[1] == mx)}
        )
    exp = pd.DataFrame(exp_rows)
    pd.testing.assert_frame_equal(
        got.astype({"user_id": "int64", "n_runs": "int64", "max_run": "int64"}),
        exp.astype({"user_id": "int64", "n_runs": "int64", "max_run": "int64"}),
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_docs=st.integers(min_value=2, max_value=30),
)
def test_dup_ngram_fraction_matches_pure_python(ray_session, seed, n_docs):
    """The distributed duplicate-3-gram fraction equals a sequential
    set-based computation on corpora with planted duplication."""
    import numpy as np
    import ray.data as rd

    rng = np.random.RandomState(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = []
    for i in range(n_docs):
        n = rng.randint(0, 12)
        texts.append(" ".join(rng.choice(vocab, n)))
    if n_docs >= 2:
        texts[1] = texts[0]  # planted exact dup

    df = pd.DataFrame({"doc_id": range(n_docs), "text": texts})
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        import pyarrow as pa, pyarrow.parquet as pq
        pq.write_table(pa.Table.from_pandas(df), os.path.join(d, "documents.parquet"))
        from ocr_poc_ray.queries.documents import doc_dup_ngram_fraction
        got = doc_dup_ngram_fraction(d).sort_values("doc_id").reset_index(drop=True)

    # sequential oracle over distinct word-trigram sets
    shingle_sets = {}
    for i, t in enumerate(texts):
        toks = t.lower().split()
        if len(toks) < 3:
            continue
        shingle_sets[i] = {tuple(toks[j:j + 3]) for j in range(len(toks) - 2)}
    from collections import Counter
    df_count = Counter(s for ss in shingle_sets.values() for s in ss)
    exp = []
    for i, ss in sorted(shingle_sets.items()):
        dup = sum(1 for s in ss if df_count[s] >= 2)
        exp.append({"doc_id": i, "n_shingles": len(ss),
                    "dup_frac": round(dup / len(ss), 6)})
    exp_df = pd.DataFrame(exp)
    if exp_df.empty:
        assert len(got) == 0
    else:
        pd.testing.assert_frame_equal(
            got.astype({"doc_id": "int64", "n_shingles": "int64"}),
            exp_df.astype({"doc_id": "int64", "n_shingles": "int64"}),
            check_dtype=False,
        )


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(0, 10_000), n_docs=st.integers(4, 20))
def test_substring_dedup_matches_bruteforce(ray_session, seed, n_docs):
    """substring_dedup over random tiny-alphabet corpora (forcing
    repeated windows) equals a pure-Python first-occurrence oracle."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_poc_ray.functions import substring_dedup

    W = 4  # small window so repeats actually occur
    rng = np.random.RandomState(seed)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(0, 30)))
        for _ in range(n_docs)
    ]
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})

    # brute-force oracle: global first occurrence per window tuple
    first: dict = {}
    for d, t in enumerate(texts):
        toks = t.lower().split()
        for p in range(max(len(toks) - W + 1, 0)):
            first.setdefault(tuple(toks[p : p + W]), (d, p))
    expected = {}
    for d, t in enumerate(texts):
        toks = t.split()
        low = t.lower().split()
        losers = [
            p
            for p in range(max(len(low) - W + 1, 0))
            if first[tuple(low[p : p + W])] != (d, p)
        ]
        cover = np.zeros(len(toks), dtype=bool)
        for p in losers:
            cover[p : p + W] = True
        expected[d] = (
            " ".join(tok for tok, c in zip(toks, cover) if not c),
            len(losers),
            int(cover.sum()),
        )

    out = (
        substring_dedup(rd.from_pandas(df), window=W)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == n_docs
    for d in range(n_docs):
        kept, n_lost, n_masked = expected[d]
        assert out.loc[d, "kept_text"] == kept, (seed, d)
        assert out.loc[d, "n_lost"] == n_lost, (seed, d)
        assert out.loc[d, "n_masked"] == n_masked, (seed, d)


# PII scrub: the pyarrow-RE2 kernel and the DuckDB-RE2 SQL mirror must
# agree byte-for-byte on arbitrary ASCII text (the whole oracle-parity
# contract of functions/pii.py rests on this).
_pii_alphabet = st.sampled_from(
    list("abcXYZ019@._%+-{}\"': \t\n/\\()[]#!?,;")
)


@settings(max_examples=150, deadline=None)
@given(texts=st.lists(st.text(alphabet=_pii_alphabet, max_size=80),
                      min_size=1, max_size=8))
def test_pii_scrub_matches_duckdb(texts):
    import duckdb
    import pyarrow as pa

    from ocr_poc_ray.functions.pii import (
        scrub_arrays,
        sql_count_exprs,
        sql_scrub_expr,
    )

    red, counts = scrub_arrays(pa.array(texts, pa.string()))
    con = duckdb.connect()
    con.execute("create table t(i integer, s varchar)")
    con.executemany(
        "insert into t values (?, ?)", list(enumerate(texts))
    )
    rows = con.execute(
        f"select {sql_scrub_expr('s')}, {sql_count_exprs('s')} "
        f"from t order by i"
    ).fetchall()
    for i in range(len(texts)):
        got = (red[i].as_py(),) + tuple(
            counts[k][i].as_py() for k in ("email", "ipv4", "id_digits")
        )
        assert got == rows[i], (texts[i], got, rows[i])


# Span invariant: for ANY input and tool, the spans partition
# extracted_text into the kept blocks — extracted_text[s:e] joined by
# single spaces reproduces extracted_text byte-for-byte, and the span
# count equals n_kept.
@settings(max_examples=300, deadline=None)
@given(text=st.text(max_size=2000), tool=_tools)
def test_extraction_spans_partition_text(text, tool):
    r = extract_turn(text, tool)
    if not r.success:
        assert r.spans == ""
        return
    ranges = [tuple(map(int, p.split(":"))) for p in r.spans.split(";")]
    assert len(ranges) == r.n_kept
    pos = 0
    blocks = []
    for s, e in ranges:
        assert s == pos and e > s, (s, e, pos)
        blocks.append(r.extracted_text[s:e])
        pos = e + 1
    assert pos - 1 == len(r.extracted_text)
    assert " ".join(blocks) == r.extracted_text
    # no block starts/ends with whitespace (blocks are normalized)
    assert all(b == b.strip() and b for b in blocks)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_docs=st.integers(min_value=1, max_value=120),
    n_langs=st.integers(min_value=1, max_value=4),
    budget=st.sampled_from([32, 128, 512]),
    nblocks=st.integers(min_value=1, max_value=5),
)
def test_training_packs_random_corpora(
    ray_session, seed, n_docs, n_langs, budget, nblocks
):
    """Pack-rule invariants on random corpora at any partitioning:
    (1) every doc appears exactly once; (2) the global token stream is
    the concatenation of docs in interleave order; (3) doc_offsets
    slice each member's tokens back out; (4) a pack's start-cumsum bin
    matches the exclusive-cumsum rule."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocr_poc_ray.pipelines.loader import iter_training_packs

    rng = np.random.RandomState(seed)
    langs = [f"l{i}" for i in range(n_langs)]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "lang": [langs[rng.randint(n_langs)] for _ in range(n_docs)],
            "text": [
                " ".join(f"t{rng.randint(50)}" for _ in range(rng.randint(0, 40)))
                for _ in range(n_docs)
            ],
        }
    )
    ds = rd.from_pandas(df).repartition(nblocks)
    packs = list(iter_training_packs(ds, budget=budget, batch_rows=16))

    seen = np.concatenate([p["doc_ids"] for p in packs]) if packs else np.array([])
    assert sorted(seen.tolist()) == df["doc_id"].tolist()

    # interleave order: k-th doc of each lang round-robins by lang
    by_lang = {
        lang: sorted(df.loc[df["lang"] == lang, "doc_id"]) for lang in set(df["lang"])
    }
    lang_sorted = sorted(by_lang)
    order = []
    for k in range(max(len(v) for v in by_lang.values())):
        for lang in lang_sorted:
            if k < len(by_lang[lang]):
                order.append(by_lang[lang][k])
    assert seen.tolist() == order

    texts = dict(zip(df["doc_id"], df["text"]))
    n_tok = {d: len(texts[d].split()) for d in texts}
    cum = 0
    for p in packs:
        offs = p["doc_offsets"].tolist() + [p["n_tokens"]]
        for i, d in enumerate(p["doc_ids"]):
            assert p["tokens"][offs[i]: offs[i + 1]] == texts[int(d)].split()
            # exclusive-cumsum bin rule, checked doc by doc
            assert cum // budget == p["pack_id"]
            cum += n_tok[int(d)]
