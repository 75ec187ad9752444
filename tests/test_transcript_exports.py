"""Planted-edge-case tests for the transcript export/gate operators
(xs_role_balance, xs_first_turn_dedup, xs_window_export) and the
watermark quarantine (rel_late_events) — engineered inputs the oracle
tables can't produce: shared prompt templates, degenerate role
balances on the exact 10× boundary, 1-turn conversations, a conv
spanning every block, and an in-order arrival stream (zero late)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from ocr_poc_ray.queries.transcripts import (
    XS_FIRST_TURN_DEDUP_SQL,
    XS_ROLE_BALANCE_SQL,
    XS_WINDOW_EXPORT_SQL,
    xs_first_turn_dedup,
    xs_role_balance,
    xs_window_export,
)


def _write_docs(dirpath: str, df: pd.DataFrame) -> str:
    df.to_parquet(os.path.join(dirpath, "documents.parquet"), index=False)
    return dirpath


def _oracle(dirpath: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{dirpath}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def planted_docs(tmp_path_factory):
    """30 conversations: convs p0..p9 share first-turn text 'TEMPLATE A',
    q0..q4 share 'TEMPLATE B', the rest are unique.  Conv 'solo' has a
    single turn; conv 'giant' has 40 turns (spans blocks when
    repartitioned).  doc_ids interleave conversations so batch-local
    assumptions break."""
    rows = []
    did = 0

    def add(conv, text):
        nonlocal did
        rows.append((did, text, "en", conv, len(text)))
        did += 3  # non-contiguous ids; min-per-conv still first-added

    for i in range(10):
        add(f"p{i}", "TEMPLATE A")
        add(f"p{i}", f"followup {i}")
    for i in range(5):
        add(f"q{i}", "TEMPLATE B")
    for i in range(12):
        add(f"u{i:02d}", f"unique opener {i}")
        add(f"u{i:02d}", f"body {i} " * (i + 1))
    add("solo", "just one turn")
    for t in range(40):
        add("giant", f"turn {t} of the giant conversation")
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = tmp_path_factory.mktemp("planted_docs")
    return _write_docs(str(d), df)


def test_first_turn_dedup_counts_templates(ray_session, planted_docs):
    out = xs_first_turn_dedup(planted_docs)
    by_rep = out.set_index("first_conv")["n_convs"]
    assert by_rep["p0"] == 10
    assert by_rep["q0"] == 5
    # every other conversation opens uniquely: 10+5+12+1+1 convs total
    assert (out["n_convs"].sum()) == 29
    assert len(out) == 1 + 1 + 12 + 1 + 1  # 16 distinct templates
    exp = _oracle(planted_docs, XS_FIRST_TURN_DEDUP_SQL)
    pd.testing.assert_frame_equal(
        _canon(out), _canon(exp).astype({"n_convs": "int64"})
    )


def test_role_balance_integer_boundary(ray_session, tmp_path):
    """Degeneracy is a strict > on exact integers: assistant == 10×user
    must NOT flag; one char more must."""
    # doc_ids chosen so knuth(id) % 3 gives role 0 (user) / 1 (assistant)
    ids = np.arange(2000)
    role = (ids * 2654435761) % 4294967296 % 3
    u_ids = ids[role == 0]
    a_ids = ids[role == 1]
    rows = [
        # conv 'edge': user 10 chars, assistant exactly 100 → NOT degenerate
        (int(u_ids[0]), "u" * 10, "en", "edge", 10),
        (int(a_ids[0]), "a" * 100, "en", "edge", 100),
        # conv 'over': user 10 chars, assistant 101 → degenerate
        (int(u_ids[1]), "u" * 10, "en", "over", 10),
        (int(a_ids[1]), "a" * 101, "en", "over", 101),
        # conv 'mono': assistant only (user_chars 0) → degenerate
        (int(a_ids[2]), "a" * 5, "en", "mono", 5),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = _write_docs(str(tmp_path), df)
    out = xs_role_balance(d).set_index("conv_id")
    assert not out.loc["edge", "degenerate"]
    assert out.loc["over", "degenerate"]
    assert out.loc["mono", "degenerate"]
    exp = _oracle(d, XS_ROLE_BALANCE_SQL)
    pd.testing.assert_frame_equal(
        _canon(out.reset_index()),
        _canon(exp).astype(
            {"user_chars": "int64", "assistant_chars": "int64",
             "tool_chars": "int64", "degenerate": "bool"}
        ),
    )


def test_window_export_spans_and_overlap(ray_session, planted_docs):
    out = xs_window_export(planted_docs)
    # solo conv: one window, rank 0 only
    solo = out[out["conv_id"] == "solo"]
    assert len(solo) == 1 and solo.iloc[0]["n_turns"] == 1
    assert solo.iloc[0]["window_id"] == 0
    # giant conv: 40 turns, stride 4 → windows 0..9, interior full at 8
    giant = out[out["conv_id"] == "giant"].sort_values("window_id")
    assert list(giant["window_id"]) == list(range(10))
    assert (giant["n_turns"].to_numpy()[:-1] == 8).all()
    assert giant["n_turns"].to_numpy()[-1] == 4  # tail window
    # consecutive windows overlap by stride: window w starts 4 ranks in
    g_turns = giant[["start_turn", "end_turn"]].to_numpy()
    assert (g_turns[1:, 0] > g_turns[:-1, 0]).all()
    assert (g_turns[1:, 0] <= g_turns[:-1, 1]).all()  # genuine overlap
    exp = _oracle(planted_docs, XS_WINDOW_EXPORT_SQL)
    pd.testing.assert_frame_equal(
        _canon(out),
        _canon(exp).astype(
            {"window_id": "int64", "start_turn": "int64", "end_turn": "int64",
             "n_turns": "int64", "n_chars": "int64"}
        ),
    )


def test_late_events_in_order_stream_is_empty(ray_session, tmp_path):
    """An arrival stream whose event-times are non-decreasing in the
    PERMUTED arrival order has lateness 0 everywhere — the regression
    that caught the original ns-vs-us timestamp bug."""
    from ocr_poc_ray.queries.relational import rel_late_events

    n = 500
    ids = np.arange(n, dtype=np.int64)
    arrival = np.argsort((ids * 2654435761) % 4294967296, kind="stable")
    ts = np.empty(n, dtype="datetime64[us]")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # assign increasing timestamps along the arrival sequence
    ts[arrival] = base + np.arange(n).astype("timedelta64[s]")
    df = pd.DataFrame(
        {
            "event_id": ids,
            "ts": ts,
            "user_id": ids % 7,
            "event_type": "view",
            "value": 1.0,
            "props": "{}",
        }
    )
    df.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = rel_late_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["event_id", "event_type", "late_s"]


def test_pca_project_matches_numpy(ray_session):
    """Distributed moments + broadcast projection == single-process
    numpy PCA with the same sign canon, to float64 round-off."""
    from ocr_poc_ray.queries.vectors import PCA_COMPONENTS, vec_pca_project

    sf = "/root/testdata/sf0.001"
    out = vec_pca_project(sf)
    t = pd.read_parquet(os.path.join(sf, "embeddings.parquet"))
    X = np.vstack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    V = evecs[:, ::-1][:, :PCA_COMPONENTS]
    flip = V[np.argmax(np.abs(V), axis=0), np.arange(V.shape[1])] < 0
    V = V * np.where(flip, -1.0, 1.0)
    P = (X - mean) @ V
    ref = pd.DataFrame(
        {"vec_id": t["vec_id"].to_numpy(np.int64),
         "pc1": P[:, 0], "pc2": P[:, 1]}
    ).sort_values("vec_id").reset_index(drop=True)
    assert len(out) == len(ref)
    np.testing.assert_allclose(
        out[["pc1", "pc2"]].to_numpy(), ref[["pc1", "pc2"]].to_numpy(),
        atol=1.5e-6,  # the 6-dp output rounding
    )
    # variance along pc1 ≈ top eigenvalue (population)
    assert abs(out["pc1"].var(ddof=0) - evals[::-1][0]) < 1e-6


def test_template_safe_split_no_leakage(ray_session, planted_docs):
    """Every conversation sharing a first-turn template lands on the
    same side — the leakage invariant, by construction but asserted."""
    from ocr_poc_ray.queries.transcripts import (
        XS_TEMPLATE_SAFE_SPLIT_SQL,
        xs_template_safe_split,
    )

    out = xs_template_safe_split(planted_docs)
    assert len(out) == 29
    per_template = out.groupby("template_hash")["split"].nunique()
    assert (per_template == 1).all()
    # the two planted template clusters are intact groups
    a = out[out["conv_id"].str.startswith("p")]
    b = out[out["conv_id"].str.startswith("q")]
    assert a["template_hash"].nunique() == 1 and a["split"].nunique() == 1
    assert b["template_hash"].nunique() == 1 and b["split"].nunique() == 1
    exp = _oracle(planted_docs, XS_TEMPLATE_SAFE_SPLIT_SQL)
    pd.testing.assert_frame_equal(_canon(out), _canon(exp))


def test_curation_pipeline_gates(ray_session, tmp_path):
    """Composite: the dedup loser, the role-degenerate conv, and
    val-side convs are all absent; output matches the one-SQL mirror."""
    import hashlib

    from ocr_poc_ray.queries.transcripts import (
        XS_CURATION_PIPELINE_SQL,
        TEMPLATE_TRAIN_PCT,
        xs_curation_pipeline,
    )

    ids = np.arange(4000)
    role = (ids * 2654435761) % 4294967296 % 3
    u_ids = list(map(int, ids[role == 0]))
    a_ids = list(map(int, ids[role == 1]))
    rows = []

    def conv(name, texts, id_pool_pairs):
        for text, did in zip(texts, id_pool_pairs):
            rows.append((did, text, "en", name, len(text)))

    used = set()

    def a_after(u):
        # assembled text follows doc_id order: the reply id must exceed
        # the opener id or the two dup convs fingerprint differently
        a = next(x for x in a_ids if x > u and x not in used)
        used.add(a)
        return a

    # adup/bdup: identical balanced conversations → winner = min conv_id
    dup_texts = ["shared duplicate opener", "shared duplicate reply"]
    conv("adup", dup_texts, [u_ids[0], a_after(u_ids[0])])
    conv("bdup", dup_texts, [u_ids[1], a_after(u_ids[1])])
    # mono: assistant-only → degenerate
    conv("mono", ["unbalanced monologue text"], [a_ids[20]])
    # norm: balanced unique conversation
    conv("norm", ["hello agent please help", "certainly here is the answer"],
         [u_ids[2], a_after(u_ids[2])])
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = _write_docs(str(tmp_path), df)

    out = xs_curation_pipeline(d)
    got = set(out["conv_id"])

    def in_train(first_text):
        return int(hashlib.md5(first_text.encode()).hexdigest()[:8], 16) % 100 \
            < TEMPLATE_TRAIN_PCT

    assert "bdup" not in got            # dedup loser
    assert "mono" not in got            # degenerate
    assert ("adup" in got) == in_train("shared duplicate opener")
    assert ("norm" in got) == in_train("hello agent please help")
    assert "norm" in got                # fraction 36 — pinned train

    exp = _oracle(d, XS_CURATION_PIPELINE_SQL).astype(
        {"n_turns": "int64", "total_chars": "int64"}
    )
    pd.testing.assert_frame_equal(_canon(out), _canon(exp))


def test_new_ops_empty_inputs(ray_session, tmp_path):
    """Every operator added this wave returns a typed empty frame on an
    empty table (the Ray 2.49 empty-to_pandas column-drop pitfall)."""
    from ocr_poc_ray.queries.transcripts import (
        xs_curation_pipeline,
        xs_first_turn_dedup,
        xs_role_balance,
        xs_template_safe_split,
        xs_window_export,
    )
    from ocr_poc_ray.queries.relational import rel_late_events

    docs = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "text": pd.Series([], dtype=object),
         "lang": pd.Series([], dtype=object),
         "source": pd.Series([], dtype=object),
         "n_chars": pd.Series([], dtype="int64")}
    )
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
    ev = pd.DataFrame(
        {"event_id": pd.Series([], dtype="int64"),
         "ts": pd.Series([], dtype="datetime64[us]"),
         "user_id": pd.Series([], dtype="int64"),
         "event_type": pd.Series([], dtype=object),
         "value": pd.Series([], dtype="float64"),
         "props": pd.Series([], dtype=object)}
    )
    ev.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    d = str(tmp_path)

    for fn, cols in [
        (xs_role_balance,
         ["conv_id", "user_chars", "assistant_chars", "tool_chars", "degenerate"]),
        (xs_first_turn_dedup, ["template_hash", "n_convs", "first_conv"]),
        (xs_window_export,
         ["conv_id", "window_id", "start_turn", "end_turn", "n_turns", "n_chars"]),
        (xs_template_safe_split, ["conv_id", "template_hash", "split"]),
        (xs_curation_pipeline, ["conv_id", "n_turns", "total_chars"]),
        (rel_late_events, ["event_id", "event_type", "late_s"]),
    ]:
        out = fn(d)
        assert len(out) == 0, fn.__name__
        assert list(out.columns) == cols, (fn.__name__, list(out.columns))


def _dbscan_numpy(X, ids, threshold, min_neighbors):
    """Single-process reference with the exact dbscan_cosine rules."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -1.0)
    adj = S >= threshold
    deg = adj.sum(axis=1)
    core = deg >= min_neighbors
    # components over core-core edges, label = min core id
    lbl = {int(ids[i]): int(ids[i]) for i in np.where(core)[0]}

    def find(x):
        while lbl[x] != x:
            lbl[x] = lbl[lbl[x]]
            x = lbl[x]
        return x

    ci = np.where(core)[0]
    for i in ci:
        for j in ci:
            if j > i and adj[i, j]:
                ra, rb = find(int(ids[i])), find(int(ids[j]))
                if ra != rb:
                    hi, lo = max(ra, rb), min(ra, rb)
                    lbl[hi] = lo
    cluster = {}
    for i in ci:
        cluster[int(ids[i])] = find(int(ids[i]))
    out = np.full(len(ids), -1, dtype=np.int64)
    for k, i in enumerate(range(len(ids))):
        if core[i]:
            out[k] = cluster[int(ids[i])]
        else:
            cc = [cluster[int(ids[j])] for j in np.where(adj[i] & core)[0]]
            if cc:
                out[k] = min(cc)
    return out, core


def test_dbscan_matches_bruteforce(ray_session, tmp_path):
    """Distributed DBSCAN == single-process reference on planted blobs:
    two dense clusters, a bridge border point, and far noise — margins
    keep every pair far from the cosine threshold."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ocr_poc_ray.functions.clustering import dbscan_cosine

    rng = np.random.default_rng(11)
    d = 16
    c1 = rng.normal(0, 1, d); c1 /= np.linalg.norm(c1)
    c2 = rng.normal(0, 1, d); c2 /= np.linalg.norm(c2)
    rows = []
    for c in (c1, c2):
        for _ in range(12):
            v = c + rng.normal(0, 0.05, d)  # tight blob: cos ≈ 0.99
            rows.append(v)
    for _ in range(8):  # isotropic noise
        rows.append(rng.normal(0, 1, d))
    X = np.vstack(rows)
    ids = np.arange(len(X), dtype=np.int64) * 7 + 3  # non-contiguous
    tbl = pa.table(
        {"vec_id": ids,
         "embedding": pa.array([r.astype(np.float32) for r in X],
                               type=pa.list_(pa.float32())),
         "label": np.zeros(len(X), dtype=np.int32)}
    )
    pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"))

    import ray
    ds = ray.data.read_parquet(
        os.path.join(tmp_path, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).repartition(5)
    got = dbscan_cosine(ds, threshold=0.9, min_neighbors=3)
    # reference on the same float32-rounded vectors the engine reads
    exp_lbl, exp_core = _dbscan_numpy(
        X.astype(np.float32).astype(np.float64), ids, 0.9, 3
    )
    order = np.argsort(ids)
    assert (got["vec_id"].to_numpy() == ids[order]).all()
    assert (got["cluster"].to_numpy() == exp_lbl[order]).all()
    assert (got["is_core"].to_numpy() == exp_core[order]).all()
    # structure: exactly 2 clusters, all 8 noise points labeled -1
    assert got[got["cluster"] >= 0]["cluster"].nunique() == 2
    assert int((got["cluster"] == -1).sum()) == 8


def test_dbscan_deterministic_across_partitionings(ray_session):
    from ocr_poc_ray.queries.vectors import vec_dbscan

    a = vec_dbscan("/root/testdata/sf0.001")
    b = vec_dbscan("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert set(a.columns) == {"vec_id", "cluster", "is_core"}


def test_dbscan_lsh_path_no_cross_blob_merge(ray_session, tmp_path):
    """nbits>0 routes pair generation through LSH buckets (the 100-TB
    path): recall near the threshold may drop, but any cluster found
    must stay inside one true blob — LSH can only LOSE edges, never
    invent cross-blob ones."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    from ocr_poc_ray.functions.clustering import dbscan_cosine

    rng = np.random.default_rng(23)
    d = 16
    blobs = []
    for _ in range(3):
        c = rng.normal(0, 1, d)
        c /= np.linalg.norm(c)
        blobs.append(c)
    rows, truth = [], []
    for bi, c in enumerate(blobs):
        for _ in range(15):
            rows.append(c + rng.normal(0, 0.04, d))
            truth.append(bi)
    X = np.vstack(rows)
    ids = np.arange(len(X), dtype=np.int64)
    tbl = pa.table(
        {"vec_id": ids,
         "embedding": pa.array([r.astype(np.float32) for r in X],
                               type=pa.list_(pa.float32())),
         "label": np.zeros(len(X), dtype=np.int32)}
    )
    pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"))
    ds = ray.data.read_parquet(
        os.path.join(tmp_path, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).repartition(4)
    out = dbscan_cosine(ds, threshold=0.9, min_neighbors=3, nbits=6)
    truth = np.asarray(truth)
    clustered = out[out["cluster"] >= 0]
    assert len(clustered) > 0  # the buckets keep enough density to cluster
    for _, grp in clustered.groupby("cluster"):
        assert len(set(truth[grp["vec_id"].to_numpy()])) == 1


def test_window_export_text_slices(ray_session, planted_docs):
    """Window text == the space-joined member turns, windows overlap by
    construction, and the text version agrees with the count version."""
    from ocr_poc_ray.queries.transcripts import (
        XS_WINDOW_EXPORT_TEXT_SQL,
        xs_window_export,
        xs_window_export_text,
    )

    txt = xs_window_export_text(planted_docs)
    agg = xs_window_export(planted_docs)
    m = txt.merge(agg, on=["conv_id", "window_id"])
    assert len(m) == len(agg) == len(txt)
    # n_chars counts turn chars; joined text adds (n_turns-1) spaces
    exp_len = m["n_chars"] + (m["n_turns"] - 1)
    assert (m["window_text"].str.len() == exp_len).all()
    giant = txt[txt["conv_id"] == "giant"].sort_values("window_id")
    assert giant.iloc[0]["window_text"].startswith("turn 0 of")
    assert giant.iloc[1]["window_text"].startswith("turn 4 of")  # stride 4
    exp = _oracle(planted_docs, XS_WINDOW_EXPORT_TEXT_SQL).astype(
        {"window_id": "int64"}
    )
    pd.testing.assert_frame_equal(_canon(txt), _canon(exp))


def test_window_export_hot_conv_spans_blocks(ray_session, tmp_path):
    """One conversation holding nearly every turn (5000 of 5040) spans
    every sorted block — the edge combine must window it exactly once
    and exactly right (reference: direct numpy windowing)."""
    from ocr_poc_ray.queries.transcripts import (
        WINDOW_STRIDE,
        WINDOW_TURNS,
        xs_window_export,
    )

    rng = np.random.default_rng(5)
    rows = [(int(i * 2 + 1), f"t{i}", "en", "hot", 2 + len(str(i)))
            for i in range(5000)]
    for j in range(40):  # a handful of cold convs interleaved
        rows.append((int(j * 250 * 2), f"cold{j}", "en", f"c{j % 8}", 5))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    df = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    d = _write_docs(str(tmp_path), df)

    out = xs_window_export(d)
    hot = out[out["conv_id"] == "hot"].sort_values("window_id").reset_index(drop=True)
    n = 5000
    n_windows = (n - 1) // WINDOW_STRIDE + 1
    assert len(hot) == n_windows
    # every interior window holds exactly WINDOW_TURNS turns
    assert (hot["n_turns"].to_numpy()[:-2] == WINDOW_TURNS).all()
    # reference: turn ids of conv 'hot' sorted, windowed directly
    ids = np.sort(df.loc[df["source"] == "hot", "doc_id"].to_numpy(np.int64))
    for w in (0, 1, n_windows // 2, n_windows - 1):
        lo = w * WINDOW_STRIDE
        members = ids[lo : lo + WINDOW_TURNS]
        row = hot.iloc[w]
        assert row["start_turn"] == members[0] and row["end_turn"] == members[-1]
        assert row["n_turns"] == len(members)
    # cold convs intact: 8 convs × 5 turns → 2 windows each
    cold = out[out["conv_id"] != "hot"]
    assert cold["conv_id"].nunique() == 8
    assert (cold.groupby("conv_id").size() == 2).all()


def test_order_count_histogram_zero_bucket(ray_session, tmp_path):
    """Order-less customers must surface as the k=0 bucket — the
    left-outer rows the oracle fixture never exercises."""
    from ocr_poc_ray.queries.relational import rel_order_count_histogram

    pd.DataFrame({"c_custkey": np.arange(10, dtype=np.int64),
                  "c_name": [f"c{i}" for i in range(10)],
                  "c_nationkey": np.zeros(10, dtype=np.int64),
                  "c_acctbal": np.zeros(10),
                  "c_mktsegment": ["A"] * 10}).to_parquet(
        os.path.join(tmp_path, "customer.parquet"), index=False)
    # customers 0..5 get 1,1,2,2,3,3 orders; 6..9 get none
    custs = [0, 1, 2, 2, 3, 3, 4, 4, 4, 5, 5, 5]
    pd.DataFrame({"o_orderkey": np.arange(len(custs), dtype=np.int64),
                  "o_custkey": np.asarray(custs, dtype=np.int64),
                  "o_orderstatus": ["O"] * len(custs),
                  "o_totalprice": np.ones(len(custs)),
                  "o_orderdate": pd.to_datetime(["2024-01-01"] * len(custs)),
                  "o_orderpriority": ["1-URGENT"] * len(custs)}).to_parquet(
        os.path.join(tmp_path, "orders.parquet"), index=False)

    out = rel_order_count_histogram(str(tmp_path)).set_index("n_orders")
    assert out.loc[0, "n_customers"] == 4
    assert out.loc[1, "n_customers"] == 2
    assert out.loc[2, "n_customers"] == 2
    assert out.loc[3, "n_customers"] == 2
    assert out["n_customers"].sum() == 10


def test_user_coverage_interval_union(ray_session, tmp_path):
    """Dense engineered overlaps: chained, nested, touching, and
    disjoint intervals — coverage equals the hand-computed union."""
    from ocr_poc_ray.queries.relational import rel_user_coverage_time

    base = pd.Timestamp("2024-01-01")
    rows = []

    def add(user, start_s, dur_s):
        rows.append((len(rows), base + pd.Timedelta(seconds=start_s),
                     user, "view", float(dur_s), "{}"))

    # user 1: chain 0-10, 5-15, 14-20 → one island [0,20]=20s
    add(1, 0, 10); add(1, 5, 10); add(1, 14, 6)
    # user 1: disjoint 100-103 → second island 3s
    add(1, 100, 3)
    # user 2: nested 0-100, 10-20, 30-40 → one island 100s
    add(2, 0, 100); add(2, 10, 10); add(2, 30, 10)
    # user 3: touching endpoints 0-10, 10-20 → s == prev_max merges → 20s
    add(3, 0, 10); add(3, 10, 10)
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = rel_user_coverage_time(str(tmp_path)).set_index("user_id")
    assert out.loc[1, "n_islands"] == 2 and out.loc[1, "covered_s"] == 23
    assert out.loc[2, "n_islands"] == 1 and out.loc[2, "covered_s"] == 100
    assert out.loc[3, "n_islands"] == 1 and out.loc[3, "covered_s"] == 20
