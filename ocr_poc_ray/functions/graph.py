"""Distributed PageRank over an undirected pair graph — the iterative
graph-algorithm family alongside connected components (min-label
propagation, functions/dedup.py) and k-means (broadcast-refine,
functions/clustering.py).

Why a dataflow and not a broadcast loop: the node state (node, degree,
rank) is GRAPH-sized, so unlike k-means' k×d centroids it cannot ride
``ray.put``.  Every iteration is therefore expressed over Datasets:
contributions rank/degree ship along edges via a bucketed hash join,
the receiving side sums them in a bucketed combine (``num_buckets``
groups — never one per node), and the new rank is a row-local map.
Nothing graph-sized ever reaches the driver; rounds scale with data
only through the join/combine exchanges.

Exact parity with a single-process run holds only up to float summation
order, so the registered query is rows-only and tests compare against a
numpy power iteration with tolerance.

Join inputs are repartitioned first: Ray 2.49 ``Dataset.join`` raises
ArrowInvalid on 0-row blocks (CLAUDE.md pitfall).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def pagerank(
    pairs: Dataset,
    *,
    damping: float = 0.85,
    n_iters: int = 8,
    num_buckets: int = 16,
    id_cols: tuple[str, str] = ("doc_a", "doc_b"),
    local_max_edges: int | None = 1_000_000,
) -> Dataset:
    """(doc_id, rank) over the undirected graph given as id pairs.

    Ranks sum to ~1 over the nodes that appear in at least one pair
    (an undirected graph has no dangling nodes: every node has
    degree ≥ 1, so no leaked mass beyond float error).

    Size switch: dup graphs are OUTPUT-sized (the near-duplicates
    themselves) — at or below ``local_max_edges`` directed edges the
    power iteration runs as one numpy loop on the driver (identical
    update rule; float summation order differs, which is why the
    registered query is rows-only and tests use tolerance).  Above it,
    every round is the bucketed join/combine dataflow: node state is
    graph-sized, so unlike k-means' k×d centroids it cannot ride
    ``ray.put``.  ``local_max_edges=None`` forces the dataflow (used
    by the equivalence tests).
    """
    import ray.data as rd

    a, b = id_cols

    def to_directed(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"src": batch[a], "dst": batch[b]})
        rev = pd.DataFrame({"src": batch[b], "dst": batch[a]})
        return pd.concat([fwd, rev], ignore_index=True)

    edges = (
        pairs.select_columns([a, b])
        .map_batches(to_directed, batch_format="pandas")
        .repartition(num_buckets)
        .materialize()
    )
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.float64())})
        )

    if local_max_edges is not None and n_edges <= local_max_edges:
        import numpy as np

        e = edges.to_pandas()
        src, dst = e["src"].to_numpy(), e["dst"].to_numpy()
        nodes, src_i = np.unique(src, return_inverse=True)
        dst_i = np.searchsorted(nodes, dst)  # every dst is also a src
        deg = np.bincount(src_i, minlength=len(nodes)).astype(np.float64)
        n = len(nodes)
        r = np.full(n, 1.0 / n)
        base_l = (1.0 - damping) / n
        for _ in range(n_iters):
            sums = np.zeros(n)
            np.add.at(sums, dst_i, (r / deg)[src_i])
            r = base_l + damping * sums
        return rd.from_pandas(
            pd.DataFrame({"doc_id": nodes, "rank": np.round(r, 6)})
        )

    def bucket_combine(ds: Dataset, value_col: str) -> Dataset:
        """Exact per-node sum of ``value_col`` in ``num_buckets`` groups."""

        def bucketed(bt: pd.DataFrame) -> pd.DataFrame:
            return bt.assign(
                bucket=(pd.util.hash_array(bt["node"].to_numpy()) %
                        num_buckets).astype("int64")
            )

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", as_index=False)[value_col].sum()

        return (
            ds.map_batches(bucketed, batch_format="pandas")
            .groupby("bucket")
            .map_groups(combine, batch_format="pandas")
        )

    def deg_partial(bt: pd.DataFrame) -> pd.DataFrame:
        g = bt.groupby("src", as_index=False).size()
        return pd.DataFrame({"node": g["src"], "deg": g["size"].astype("int64")})

    deg = bucket_combine(
        edges.map_batches(deg_partial, batch_format="pandas"), "deg"
    ).repartition(num_buckets).materialize()
    n_nodes = deg.count()
    base = (1.0 - damping) / n_nodes

    ranks = deg.map_batches(
        lambda bt: bt.assign(rank=1.0 / n_nodes), batch_format="pandas"
    ).repartition(num_buckets).materialize()

    for _ in range(n_iters):
        contrib = ranks.map_batches(
            lambda bt: pd.DataFrame(
                {"src": bt["node"], "contrib": bt["rank"] / bt["deg"]}
            ),
            batch_format="pandas",
        ).repartition(num_buckets)
        msgs = edges.join(
            contrib, "inner", num_partitions=num_buckets, on=("src",)
        ).map_batches(
            lambda bt: pd.DataFrame({"node": bt["dst"], "c": bt["contrib"]}),
            batch_format="pandas",
        ).repartition(num_buckets)
        sums = bucket_combine(msgs, "c").repartition(num_buckets)
        ranks = deg.join(
            sums, "inner", num_partitions=num_buckets, on=("node",)
        ).map_batches(
            lambda bt: pd.DataFrame(
                {"node": bt["node"], "deg": bt["deg"],
                 "rank": base + damping * bt["c"]}
            ),
            batch_format="pandas",
        ).repartition(num_buckets).materialize()

    import numpy as np

    return ranks.map_batches(
        lambda bt: pd.DataFrame(
            {"doc_id": bt["node"],
             "rank": np.round(bt["rank"].to_numpy(np.float64), 6)}
        ),
        batch_format="pandas",
    )


def triangle_counts(
    pairs: Dataset,
    *,
    num_partitions: int = 8,
    id_cols: tuple[str, str] = ("doc_a", "doc_b"),
) -> Dataset:
    """(doc_id, n_triangles) over the undirected pair graph — the
    transitivity audit of a near-dup pass (clique-like dup clusters are
    safe to collapse; chain-like ones mix distinct documents through
    weak links).

    The classic two-join dataflow (Cohen 2009 / Suri & Vassilvitskii
    2011): canonicalize edges a<b, wedge join e1(a,b) ⋈ e2(b,c) on the
    middle node, then close each wedge against the edge set on the
    packed (a,c) key — both joins hash-partitioned and capped at
    cluster CPUs (CLAUDE.md deadlock pitfall), inputs repartitioned
    to merge 0-row blocks away.  Per-node counts are per-batch
    partials + one bounded combine.  Node ids must fit 31 bits (the
    packed closing key) — asserted, the same bound as substring
    dedup's winner key."""
    import numpy as np
    import ray.data as rd

    from ocr_poc_ray.functions.dedup import _join_parallelism

    a, b = id_cols
    jp = _join_parallelism(num_partitions)

    def canon(bt: pd.DataFrame) -> pd.DataFrame:
        x = bt[a].to_numpy(np.int64)
        y = bt[b].to_numpy(np.int64)
        if len(x) and (min(x.min(), y.min()) < 0 or max(x.max(), y.max()) >= 1 << 31):
            raise ValueError("triangle_counts: node ids must fit 31 bits")
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        keep = lo != hi
        return pd.DataFrame({"u": lo[keep], "v": hi[keep]}).drop_duplicates()

    # global distinct: per-batch drop_duplicates only dedups WITHIN a
    # block — the same edge arriving in two blocks would double-count
    # every wedge through it, so finish with a bucketed exact distinct
    # (dup-graph-sized, bounded buckets).
    edges = (
        pairs.map_batches(canon, batch_format="pandas")
        .map_batches(
            lambda bt: bt.assign(
                _hb=((bt["u"].to_numpy(np.int64) * 0x9E3779B1)
                     + bt["v"].to_numpy(np.int64)) % jp
            ),
            batch_format="pandas",
        )
        .groupby("_hb")
        .map_groups(
            lambda g: g.drop_duplicates(["u", "v"])[["u", "v"]],
            batch_format="pandas",
        )
        .repartition(jp)
        .materialize()  # feeds THREE consumers (wedge x2 + close) — one scan
    )

    def _empty() -> Dataset:
        import ray.data as _rd

        return _rd.from_pandas(
            pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "n_triangles": pd.Series([], dtype="int64")}
            )
        )

    # an ALL-empty pandas dataset loses its schema through repartition
    # (Ray 2.49) and the hash join then raises ArrowInvalid on the key
    # FieldRef — guard the degenerate graphs out before each join.
    # count() on a materialized dataset is metadata-only.
    if edges.count() == 0:
        return _empty()

    # wedge join on the middle node: (u<v) x (v<w) -> (u, v, w)
    left = edges.map_batches(
        lambda bt: pd.DataFrame({"wu": bt["u"], "mid": bt["v"]}),
        batch_format="pandas",
    ).repartition(jp)
    right = edges.map_batches(
        lambda bt: pd.DataFrame({"mid": bt["u"], "ww": bt["v"]}),
        batch_format="pandas",
    ).repartition(jp)
    wedges = left.join(right, "inner", num_partitions=jp, on=("mid",))

    def pack_close(bt: pd.DataFrame) -> pd.DataFrame:
        u = bt["wu"].to_numpy(np.int64)
        w = bt["ww"].to_numpy(np.int64)
        return pd.DataFrame(
            {"wu": u, "mid": bt["mid"].to_numpy(np.int64), "ww": w,
             "_ck": (u << 31) | w}
        )

    closing = edges.map_batches(
        lambda bt: pd.DataFrame(
            {"_ck": (bt["u"].to_numpy(np.int64) << 31)
                    | bt["v"].to_numpy(np.int64)}
        ),
        batch_format="pandas",
    ).repartition(jp)
    packed = wedges.map_batches(pack_close, batch_format="pandas").repartition(
        jp
    ).materialize()
    if packed.count() == 0:  # no wedges → no triangles (schema guard)
        return _empty()
    tris = packed.join(closing, "inner", num_partitions=jp, on=("_ck",))

    def role_partial(bt: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate(
            [bt["wu"].to_numpy(np.int64), bt["mid"].to_numpy(np.int64),
             bt["ww"].to_numpy(np.int64)]
        )
        u, c = np.unique(ids, return_counts=True)
        return pd.DataFrame(
            {"doc_id": u, "n": c.astype(np.int64),
             "_hb": (u % 8).astype(np.int64)}
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("doc_id", as_index=False).agg(n_triangles=("n", "sum"))
        return t

    return (
        tris.map_batches(role_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
    )
