"""Relational pipelines over the TPC-H-ish tables — the engine's
groupby / sort / filter / join / window operator surface, expressed
with the 100-TB patterns:

- **partial aggregation**: every groupby here first combines inside
  ``map_batches`` (per-batch pandas groupby → a few rows per batch),
  then reduces the tiny partials with ``groupby().map_groups`` — the
  all-to-all exchange moves kilobytes, not the fact table.
- **broadcast join**: the customer/nation small sides are fetched once,
  ``ray.put`` once, and looked up inside the batch kernel — no shuffle
  join of the orders table.
- **top-k without a global sort**: per-batch local top-k partials, then
  one final merge of ``k × num_blocks`` rows.
- **windowed / order-sensitive ops** (sessionization, as-of, range
  join, rolling mean): the sort-based interior-final / edge-raw shape
  from ``ocr_poc_ray.functions.windows`` — key cardinality never
  appears as a group count.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray
import ray.data


def _path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ---------------------------------------------------------------------------
# Q1-style aggregate over lineitem (filter → partial agg → combine)
# ---------------------------------------------------------------------------

Q1_CUTOFF = "1998-09-02"


def rel_agg_lineitem(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_shipdate",
        ],
    )
    cutoff = pd.Timestamp(Q1_CUTOFF)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["l_shipdate"] <= cutoff]
        if len(b) == 0:
            return pd.DataFrame(
                columns=["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                         "sum_disc_price", "count_order"]
            )
        b = b.assign(disc_price=b["l_extendedprice"] * (1.0 - b["l_discount"]))
        g = b.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        sum_qty = group["sum_qty"].sum()
        count = int(group["count_order"].sum())
        return pd.DataFrame(
            {
                "l_returnflag": [group["l_returnflag"].iloc[0]],
                "l_linestatus": [group["l_linestatus"].iloc[0]],
                "sum_qty": [round(sum_qty, 2)],
                "sum_base_price": [round(group["sum_base_price"].sum(), 2)],
                "sum_disc_price": [round(group["sum_disc_price"].sum(), 2)],
                "avg_qty": [round(sum_qty / count, 6)],
                "count_order": [count],
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        combine, batch_format="pandas"
    )
    return out.to_pandas().astype({"count_order": "int64"})


REL_AGG_LINEITEM_SQL = f"""
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) as sum_qty,
       round(sum(l_extendedprice), 2) as sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
       round(sum(l_quantity) / count(*), 6) as avg_qty,
       count(*) as count_order
from lineitem
where l_shipdate <= timestamp '{Q1_CUTOFF} 00:00:00'
group by l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Top-k orders by total price (local top-k partials → single merge)
# ---------------------------------------------------------------------------

TOPK_N = 20


def rel_topk_orders(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    )

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(TOPK_N)

    partials = ds.map_batches(local_topk, batch_format="pandas")
    # the surviving candidate set is k × num_blocks rows — tiny; one
    # constant-key group merges it (NOT a sort of the full table).
    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(TOPK_N)

    merged = (
        partials.map_batches(
            lambda b: b.assign(_k=0), batch_format="pandas"
        )
        .groupby("_k")
        .map_groups(merge, batch_format="pandas")
    )
    out = merged.to_pandas()[["o_orderkey", "o_totalprice"]]
    return out.astype({"o_orderkey": "int64", "o_totalprice": "float64"})


REL_TOPK_ORDERS_SQL = f"""
select o_orderkey, o_totalprice
from orders
order by o_totalprice desc, o_orderkey
limit {TOPK_N}
"""


# ---------------------------------------------------------------------------
# Broadcast joins: orders ⋈ customer (⋈ nation)
# ---------------------------------------------------------------------------

def _broadcast_lookup(sf_dir: str, table: str, key: str, val: str):
    """Broadcast a key→value map as (sorted keys, value codes, categories)
    numpy arrays.  ``ray.get`` of numpy arrays is a true zero-copy plasma
    read cached per worker; a broadcast dict would be re-unpickled on
    every task invocation (pickle deserialization is NOT zero-copy for
    Python objects — only the array buffers ride out-of-band)."""
    import pyarrow.parquet as pq

    t = pq.read_table(_path(sf_dir, table), columns=[key, val])
    keys = t[key].to_numpy()
    order = np.argsort(keys, kind="mergesort")
    vals = t[val].to_pandas()
    if vals.dtype == object:
        cat = pd.Categorical(vals)
        codes = cat.codes.astype(np.int64)[order]
        cats = np.asarray(cat.categories, dtype=object)  # tiny (dim values)
    else:
        codes = vals.to_numpy()[order]
        cats = None
    return ray.put({"keys": keys[order], "codes": codes, "cats": cats})


def _lookup(state, arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(values, hit_mask) for `arr` against a `_broadcast_lookup` state —
    one vectorized searchsorted over the zero-copy key array."""
    keys, codes, cats = state["keys"], state["codes"], state["cats"]
    pos = np.minimum(np.searchsorted(keys, arr), len(keys) - 1)
    hit = keys[pos] == arr
    c = codes[pos]
    vals = cats[c] if cats is not None else c
    return vals, hit


def rel_mktsegment_revenue(sf_dir: str) -> pd.DataFrame:
    seg_ref = _broadcast_lookup(sf_dir, "customer", "c_custkey", "c_mktsegment")
    ds = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def annotate_and_partial(batch: pd.DataFrame) -> pd.DataFrame:
        # the ref holds numpy arrays → ray.get is a zero-copy plasma
        # read cached per worker; a plain task avoids actor spin-up.
        seg, hit = _lookup(ray.get(seg_ref), batch["o_custkey"].to_numpy())
        b = pd.DataFrame(
            {"c_mktsegment": seg[hit], "o_totalprice": batch["o_totalprice"].to_numpy()[hit]}
        )
        return b.groupby("c_mktsegment", as_index=False).agg(
            total_revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
        )

    partials = ds.map_batches(annotate_and_partial, batch_format="pandas")

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": [group["c_mktsegment"].iloc[0]],
                "total_revenue": [round(group["total_revenue"].sum(), 2)],
                "n_orders": [int(group["n_orders"].sum())],
            }
        )

    out = partials.groupby("c_mktsegment").map_groups(combine, batch_format="pandas")
    return out.to_pandas().astype({"n_orders": "int64"})


REL_MKTSEGMENT_REVENUE_SQL = """
select c.c_mktsegment,
       round(sum(o.o_totalprice), 2) as total_revenue,
       count(*) as n_orders
from orders o join customer c on o.o_custkey = c.c_custkey
group by c.c_mktsegment
"""


def rel_nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Two chained broadcast lookups: custkey → nationkey → nation name."""
    nat_ref = _broadcast_lookup(sf_dir, "customer", "c_custkey", "c_nationkey")
    name_ref = _broadcast_lookup(sf_dir, "nation", "n_nationkey", "n_name")
    ds = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def annotate_and_partial(batch: pd.DataFrame) -> pd.DataFrame:
        nat, hit1 = _lookup(ray.get(nat_ref), batch["o_custkey"].to_numpy())
        name, hit2 = _lookup(ray.get(name_ref), nat[hit1])
        b = pd.DataFrame(
            {
                "n_name": name[hit2],
                "o_totalprice": batch["o_totalprice"].to_numpy()[hit1][hit2],
            }
        )
        return b.groupby("n_name", as_index=False).agg(
            total_revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
        )

    partials = ds.map_batches(annotate_and_partial, batch_format="pandas")

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_name": [group["n_name"].iloc[0]],
                "total_revenue": [round(group["total_revenue"].sum(), 2)],
                "n_orders": [int(group["n_orders"].sum())],
            }
        )

    out = partials.groupby("n_name").map_groups(combine, batch_format="pandas")
    return out.to_pandas().astype({"n_orders": "int64"})


REL_NATION_REVENUE_SQL = """
select n.n_name,
       round(sum(o.o_totalprice), 2) as total_revenue,
       count(*) as n_orders
from orders o
join customer c on o.o_custkey = c.c_custkey
join nation n on c.c_nationkey = n.n_nationkey
group by n.n_name
"""


# ---------------------------------------------------------------------------
# Windowed aggregate: sessionization of the events stream
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800


def rel_sessionize(sf_dir: str) -> pd.DataFrame:
    """Sessionization via the scalable sort-based windowed aggregate
    (ocr_poc_ray.functions.windows.sessionize: interior keys finalize
    per block, only O(num_blocks) edge keys merge)."""
    from ocr_poc_ray.functions.windows import sessionize

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "ts", "event_id"]
    )
    out = sessionize(ds, gap_s=SESSION_GAP_S).to_pandas()
    return out.astype(
        {"user_id": "int64", "n_events": "int64", "n_sessions": "int64"}
    )


REL_SESSIONIZE_SQL = f"""
select user_id, count(*) as n_events,
       sum(case when prev is null or epoch(ts - prev) > {SESSION_GAP_S}
                then 1 else 0 end)::BIGINT as n_sessions
from (
  select user_id, ts,
         lag(ts) over (partition by user_id order by ts, event_id) as prev
  from events
)
group by user_id
"""


# ---------------------------------------------------------------------------
# Event-type stats (partial agg) + filter/project pushdown
# ---------------------------------------------------------------------------

def rel_event_type_stats(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("event_type", as_index=False).agg(
            n=("value", "size"), total_value=("value", "sum")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        n = int(group["n"].sum())
        total = group["total_value"].sum()
        return pd.DataFrame(
            {
                "event_type": [group["event_type"].iloc[0]],
                "n": [n],
                "total_value": [round(total, 2)],
                "avg_value": [round(total / n, 6)],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"n": "int64"})


REL_EVENT_TYPE_STATS_SQL = """
select event_type, count(*) as n,
       round(sum(value), 2) as total_value,
       round(sum(value) / count(*), 6) as avg_value
from events
group by event_type
"""


PURCHASE_MIN_VALUE = 100.0


def rel_big_purchases(sf_dir: str) -> pd.DataFrame:
    """Filter + projection with column pruning AND predicate pushdown
    at the read: the WHERE rides into ``read_parquet(filter=...)`` so
    row-group statistics prune before any byte leaves storage (the
    same pyarrow expression the kernel used to apply after a full
    scan — identical semantics, verified by the same oracle)."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "value"],
        filter=(
            (pc.field("event_type") == "purchase")
            & (pc.field("value") > PURCHASE_MIN_VALUE)
        ),
    )

    def kernel(batch: "pa.Table") -> "pa.Table":
        return batch.select(["event_id", "user_id", "value"])

    out = ds.map_batches(kernel, batch_format="pyarrow").to_pandas()
    if out.empty:
        out = pd.DataFrame(columns=["event_id", "user_id", "value"])
    return out.astype({"event_id": "int64", "user_id": "int64", "value": "float64"})


REL_BIG_PURCHASES_SQL = f"""
select event_id, user_id, value
from events
where event_type = 'purchase' and value > {PURCHASE_MIN_VALUE}
"""


# ---------------------------------------------------------------------------
# As-of join: each purchase matched to the user's most recent prior
# click — the windowed custom operator Ray Data lacks natively,
# expressed as one per-key shuffle + an in-group pandas merge_asof
# (partitioning assumption: one user's events fit in a group; salt by
# time range if a user ever exceeds block size).
# ---------------------------------------------------------------------------

def rel_asof_purchase_click(sf_dir: str) -> pd.DataFrame:
    """Backward as-of via the scalable sort-based operator
    (ocr_poc_ray.functions.windows.asof_match: interior keys match
    per block, only O(num_blocks) edge keys' rows travel)."""
    from ocr_poc_ray.functions.windows import asof_match

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )
    out = asof_match(ds).to_pandas()
    if out.empty:
        out = pd.DataFrame(columns=["event_id", "user_id", "click_event_id"])
    return out.astype({"event_id": "int64", "user_id": "int64", "click_event_id": "int64"})


REL_ASOF_SQL = """
select p.event_id, p.user_id, c.event_id as click_event_id
from (select * from events where event_type = 'purchase') p
asof join (select * from events where event_type = 'click') c
  on p.user_id = c.user_id and p.ts >= c.ts
"""


def rel_mktsegment_revenue_hashjoin(sf_dir: str) -> pd.DataFrame:
    """Same result as rel_mktsegment_revenue but via Ray Data's native
    partitioned hash join — the shuffle-join operator surface (the
    broadcast variant above is the 100-TB default for small sides)."""
    orders = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )
    customer = ray.data.read_parquet(
        _path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    joined = orders.join(
        customer, "inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("c_mktsegment", as_index=False).agg(
            total_revenue=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_mktsegment": [group["c_mktsegment"].iloc[0]],
                "total_revenue": [round(group["total_revenue"].sum(), 2)],
                "n_orders": [int(group["n_orders"].sum())],
            }
        )

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"n_orders": "int64"})


def rel_nation_trade_matrix(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: revenue flow between (customer nation, supplier
    nation) pairs across lineitem⋈orders⋈customer⋈supplier⋈nation².
    The only big-big exchange is lineitem⋈orders on orderkey (capped
    partitioned hash join); every dimension attaches via zero-copy
    broadcast lookups, and the lineitem side is projected down to
    (orderkey, revenue, supp_nation) BEFORE the shuffle — prune at the
    exchange, not after."""
    sup = _broadcast_lookup(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    cus = _broadcast_lookup(sf_dir, "customer", "c_custkey", "c_nationkey")
    nat = _broadcast_lookup(sf_dir, "nation", "n_nationkey", "n_name")

    li = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_project(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(sup)
        nk, _ = _lookup(st, b["l_suppkey"].to_numpy())
        names, _ = _lookup(ray.get(nat), nk)
        # EXACT integer revenue in 1e-4-dollar units: price and discount
        # are 2-dp decimals stored as doubles, so cents = rint(x*100) is
        # exact on both engines (never near a .5 tie), and the integer
        # sum cannot hit a float rounding boundary — the first float
        # appears only in the final division, computed from the SAME
        # integer by both engines (a 2-dp SUM still flipped a boundary
        # here: 4156627.685 summed in different orders)
        cents = np.rint(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_pct = np.rint(b["l_discount"].to_numpy() * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"],
                "rev_e4": cents * (100 - disc_pct),
                "supp_nation": names,
            }
        )

    orders = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    )
    joined = li.map_batches(li_project, batch_format="pandas").join(
        orders, "inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ck, _ = _lookup(ray.get(cus), b["o_custkey"].to_numpy())
        names, _ = _lookup(ray.get(nat), ck)
        d = pd.DataFrame(
            {"cust_nation": names, "supp_nation": b["supp_nation"],
             "rev_e4": b["rev_e4"]}
        )
        d = d[d["cust_nation"] != d["supp_nation"]]
        return d.groupby(["cust_nation", "supp_nation"], as_index=False).agg(
            rev_e4=("rev_e4", "sum"), n_items=("rev_e4", "size")
        )

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby(["cust_nation", "supp_nation"], as_index=False).agg(
        rev_e4=("rev_e4", "sum"), n_items=("n_items", "sum")
    )
    agg["revenue"] = (agg["rev_e4"] / 10000.0).astype("float64")
    agg["n_items"] = agg["n_items"].astype("int64")
    return agg[["cust_nation", "supp_nation", "revenue", "n_items"]]


REL_NATION_TRADE_MATRIX_SQL = """
select cn.n_name as cust_nation, sn.n_name as supp_nation,
       sum(round(l.l_extendedprice * 100)::BIGINT
           * (100 - round(l.l_discount * 100)::BIGINT)) / 10000.0 as revenue,
       count(*)::BIGINT as n_items
from lineitem l
join orders o on l.l_orderkey = o.o_orderkey
join customer c on o.o_custkey = c.c_custkey
join supplier s on l.l_suppkey = s.s_suppkey
join nation cn on c.c_nationkey = cn.n_nationkey
join nation sn on s.s_nationkey = sn.n_nationkey
where cn.n_name <> sn.n_name
group by 1, 2
"""


def rel_window_dedup(sf_dir: str) -> pd.DataFrame:
    """Windowed streaming dedup: first event per (user, event_type) per
    tumbling hour — the at-least-once ingest guard that collapses
    upstream retries/replays inside a bounded time horizon.  Window
    assignment is row-local integer math (timestamps are post-1970 so
    floor division == date_trunc, CLAUDE.md); winners via per-batch
    partial (lexicographic-min (ts, event_id) + count per key) and a
    bounded hash-bucket combine — group count is never a Ray group
    count, and nothing key-set-sized reaches the driver."""
    HOUR_US = 3_600_000_000
    _B = 256
    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["ts", "user_id", "event_type", "event_id"]
    )

    KEYS = ["user_id", "event_type", "window_start_us"]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "event_type": b["event_type"].to_numpy(),
                "window_start_us": (us // HOUR_US) * HOUR_US,
                "_ts": us,
                "event_id": b["event_id"].to_numpy(),
            }
        )
        d = d.sort_values(["_ts", "event_id"], kind="mergesort")
        n = d.groupby(KEYS, as_index=False).size().rename(columns={"size": "n_in_window"})
        first = d.drop_duplicates(KEYS, keep="first")
        out = first.merge(n, on=KEYS)
        mix = (
            pd.util.hash_array(out["user_id"].to_numpy())
            ^ pd.util.hash_array(out["window_start_us"].to_numpy())
            ^ pd.util.hash_array(out["event_type"].to_numpy(dtype=object))
        )
        return out.assign(_hb=(mix % _B).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_ts", "event_id"], kind="mergesort")
        n = g.groupby(KEYS, as_index=False)["n_in_window"].sum()
        first = g.drop_duplicates(KEYS, keep="first")[KEYS + ["event_id"]]
        return first.merge(n, on=KEYS).rename(columns={"event_id": "first_event_id"})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    return out[["user_id", "event_type", "window_start_us", "first_event_id", "n_in_window"]].astype(
        {"user_id": "int64", "window_start_us": "int64",
         "first_event_id": "int64", "n_in_window": "int64"}
    )


REL_WINDOW_DEDUP_SQL = """
with r as (
  select user_id, event_type,
         epoch_us(date_trunc('hour', ts)) as window_start_us,
         event_id,
         row_number() over (
           partition by user_id, event_type, date_trunc('hour', ts)
           order by ts, event_id
         ) as rn,
         count(*) over (
           partition by user_id, event_type, date_trunc('hour', ts)
         ) as n_in_window
  from events
)
select user_id, event_type, window_start_us,
       event_id as first_event_id, n_in_window::BIGINT as n_in_window
from r where rn = 1
"""


def rel_cohort_ltv(sf_dir: str) -> pd.DataFrame:
    """Cohort LTV triangle: users grouped by first-activity week, purchase
    revenue accumulated per week-age — the lifetime-value matrix every
    growth team reads.  First-touch per user via bounded-bucket min
    partials (the same winner shape as rel_window_dedup), broadcast of
    the (user → cohort-week) map is avoided: cohort assignment joins
    back through a second bounded-bucket co-group, so nothing user-set
    sized reaches the driver.  Weeks are integer epoch-day // 7 — exact
    in both engines for post-1970 data."""
    DAY_US = 86_400_000_000
    _B = 256
    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["ts", "user_id", "event_type", "value"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        week = us // DAY_US // 7
        d = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "week": week,
                # exact integer cents (value is a 2-dp decimal): the
                # trade-matrix lesson — a 2-dp SUM can land on a
                # rounding boundary that summation order flips
                "rev": np.where(
                    (b["event_type"] == "purchase").to_numpy(),
                    np.rint(b["value"].to_numpy() * 100).astype(np.int64),
                    np.int64(0),
                ),
            }
        )
        # per (user, week): min week partial rides along as the user's
        # batch-local first week; revenue partials per (user, week)
        g = d.groupby(["user_id", "week"], as_index=False).agg(
            rev=("rev", "sum")
        )
        first = d.groupby("user_id", as_index=False)["week"].min().rename(
            columns={"week": "first_week"}
        )
        out = g.merge(first, on="user_id")
        return out.assign(_hb=(out["user_id"].to_numpy() % _B).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("user_id", as_index=False)["first_week"].min()
        rev = g.groupby(["user_id", "week"], as_index=False)["rev"].sum()
        m = rev.merge(first, on="user_id")
        m["age_weeks"] = (m["week"] - m["first_week"]).astype("int64")
        return m.groupby(["first_week", "age_weeks"], as_index=False).agg(
            revenue=("rev", "sum"), n_user_weeks=("rev", "size")
        )

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby(["first_week", "age_weeks"], as_index=False).agg(
        revenue=("revenue", "sum"), n_user_weeks=("n_user_weeks", "sum")
    )
    return pd.DataFrame(
        {
            "cohort_week": agg["first_week"].astype("int64"),
            "age_weeks": agg["age_weeks"].astype("int64"),
            "revenue": (agg["revenue"] / 100.0).astype("float64"),
            "n_user_weeks": agg["n_user_weeks"].astype("int64"),
        }
    )


REL_COHORT_LTV_SQL = """
with e as (
  select user_id,
         epoch_us(ts) // 86400000000 // 7 as week,
         case when event_type = 'purchase'
              then round(value * 100)::BIGINT else 0 end as rev
  from events
), f as (
  select user_id, min(week) as first_week from e group by user_id
), uw as (
  select e.user_id, f.first_week, e.week, sum(e.rev) as rev
  from e join f using (user_id)
  group by e.user_id, f.first_week, e.week
)
select first_week::BIGINT as cohort_week,
       (week - first_week)::BIGINT as age_weeks,
       sum(rev) / 100.0 as revenue,
       count(*)::BIGINT as n_user_weeks
from uw group by 1, 2
"""


def rel_linear_attribution(sf_dir: str) -> pd.DataFrame:
    """LINEAR multi-touch attribution: each purchase's value splits
    equally across the user's clicks in the preceding 6 h; a click sums
    credit from every purchase it assisted
    (functions.windows.attribution_linear).  Credit is exact integer
    micro-cents (cents × 1e6 // n_touches) — positive-operand floor
    division is identical in numpy and DuckDB, and the integer sum
    cannot hit a float boundary."""
    from ocr_poc_ray.functions.windows import attribution_linear

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    out = attribution_linear(
        ds, window_s=float(ATTRIBUTION_WINDOW_S)
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            columns=["touch_event_id", "user_id", "credit_ucents", "n_conversions"]
        )
    out = out.sort_values("touch_event_id").reset_index(drop=True)
    return out.astype(
        {"touch_event_id": "int64", "user_id": "int64",
         "credit_ucents": "int64", "n_conversions": "int64"}
    )


REL_LINEAR_ATTRIBUTION_SQL = """
with c as (
  select event_id, user_id, ts, round(value * 100)::BIGINT as cents
  from events where event_type = 'purchase'
), t as (
  select event_id as touch_event_id, user_id, ts as tts
  from events where event_type = 'click'
), m as (
  select c.event_id, c.user_id, t.touch_event_id, c.cents,
         count(*) over (partition by c.event_id) as n_touches
  from c join t on c.user_id = t.user_id
   and epoch_us(c.ts) - epoch_us(t.tts) between 0 and 21600000000
)
select touch_event_id, user_id,
       sum(cents * 1000000 // n_touches)::BIGINT as credit_ucents,
       count(*)::BIGINT as n_conversions
from m group by touch_event_id, user_id
order by touch_event_id
"""  # 21600000000 us = ATTRIBUTION_WINDOW_S (6 h), defined below


PSI_WIDTH = 25
PSI_SPLIT = "2024-01-16 00:00:00"


def rel_value_psi(sf_dir: str) -> pd.DataFrame:
    """Population-stability-index drift monitor: compare the event-value
    distribution before/after a fixed date over the width-25 bins, with
    Laplace +1 smoothing over the OBSERVED bucket set (zero-count bins
    would blow up the log ratio).  Per-batch (bucket, half) count
    partials; the combine and the PSI fold are bucket-cardinality sized
    driver arithmetic — ln parity with DuckDB is already proven by the
    entropy/KL oracles (same libm)."""
    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["ts", "value"])
    split_us = pd.Timestamp(PSI_SPLIT).value // 1000

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = pd.DataFrame(
            {
                "bucket": np.floor(b["value"].to_numpy() / PSI_WIDTH).astype("int64"),
                "cur": us >= split_us,
            }
        )
        g = d.groupby(["bucket"], as_index=False).agg(
            n_cur=("cur", "sum"), n_tot=("cur", "size")
        )
        g["n_ref"] = g["n_tot"] - g["n_cur"]
        return g[["bucket", "n_ref", "n_cur"]]

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("bucket", as_index=False).agg(
        n_ref=("n_ref", "sum"), n_cur=("n_cur", "sum")
    ).sort_values("bucket").reset_index(drop=True)
    k = len(agg)
    tr = float(agg["n_ref"].sum() + k)
    tc = float(agg["n_cur"].sum() + k)
    p = (agg["n_ref"].to_numpy() + 1) / tr
    q = (agg["n_cur"].to_numpy() + 1) / tc
    return pd.DataFrame(
        {
            "bucket": agg["bucket"].astype("int64"),
            "n_ref": agg["n_ref"].astype("int64"),
            "n_cur": agg["n_cur"].astype("int64"),
            "contrib": np.round((p - q) * np.log(p / q), 6),
        }
    )


REL_VALUE_PSI_SQL = f"""
with b as (
  select floor(value / {{w}})::BIGINT as bucket,
         (ts >= timestamp '{{split}}') as cur
  from events
), c as (
  select bucket,
         count(*) filter (where not cur)::BIGINT as n_ref,
         count(*) filter (where cur)::BIGINT as n_cur
  from b group by bucket
), t as (
  select (sum(n_ref) + count(*))::DOUBLE as tr,
         (sum(n_cur) + count(*))::DOUBLE as tc
  from c
)
select bucket, n_ref, n_cur,
       round( ((n_ref + 1) / (select tr from t) - (n_cur + 1) / (select tc from t))
            * ln( ((n_ref + 1) / (select tr from t))
                / ((n_cur + 1) / (select tc from t)) ), 6) as contrib
from c order by bucket
""".format(w=PSI_WIDTH, split=PSI_SPLIT)


# ---------------------------------------------------------------------------
# Tumbling-window aggregate + distinct count
# ---------------------------------------------------------------------------

def rel_daily_events(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-day windows: bucket assignment is row-local (a pure
    projection), so the only exchange is the tiny partial-agg combine."""
    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame({"day": batch["ts"].dt.floor("D"), "value": batch["value"]})
        return b.groupby("day", as_index=False).agg(
            n=("value", "size"), total_value=("value", "sum")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": [group["day"].iloc[0]],
                "n": [int(group["n"].sum())],
                "total_value": [round(group["total_value"].sum(), 2)],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"n": "int64"})


REL_DAILY_EVENTS_SQL = """
select date_trunc('day', ts) as day, count(*) as n,
       round(sum(value), 2) as total_value
from events
group by date_trunc('day', ts)
"""


# ---------------------------------------------------------------------------
# Hopping-window aggregate (overlapping windows): 6-hour windows
# advancing every 3 hours, so each event lands in exactly
# size/hop = 2 windows.  Window replication is a row-local flat
# projection (k-fold fan-out of a narrow (start, value) pair), so —
# like the tumbling case — the only exchange is the tiny combine over
# O(corpus_days * windows_per_day) partial rows.
# ---------------------------------------------------------------------------

HOP_SECONDS = 10_800  # 3 h
HOP_WINDOWS_PER_EVENT = 2  # window size = 2 hops = 6 h


def rel_hopping_window(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        es = batch["ts"].astype("datetime64[us]").astype("int64") // 1_000_000
        s0 = (es // HOP_SECONDS * HOP_SECONDS).to_numpy()
        vals = batch["value"].to_numpy()
        b = pd.DataFrame(
            {
                "window_start_epoch": np.concatenate(
                    [s0 - k * HOP_SECONDS for k in range(HOP_WINDOWS_PER_EVENT)]
                ),
                "value": np.tile(vals, HOP_WINDOWS_PER_EVENT),
            }
        )
        return b.groupby("window_start_epoch", as_index=False).agg(
            n=("value", "size"), total_value=("value", "sum")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "window_start_epoch": [int(group["window_start_epoch"].iloc[0])],
                "n": [int(group["n"].sum())],
                "total_value": [round(group["total_value"].sum(), 2)],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("window_start_epoch")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype(
        {"window_start_epoch": "int64", "n": "int64"}
    )


REL_HOPPING_WINDOW_SQL = f"""
-- floor (not truncating) divisions via double-mod so pre-1970 (negative
-- epoch) events bin identically to the pandas kernel's // floor
with e as (
  select (epoch_us(ts) - ((epoch_us(ts) % 1000000) + 1000000) % 1000000)
           // 1000000 as es,
         value
  from events
), f as (
  select es - ((es % {HOP_SECONDS}) + {HOP_SECONDS}) % {HOP_SECONDS} as s0,
         value
  from e
),
w as (
  select unnest([s0, s0 - {HOP_SECONDS}]) as window_start_epoch, value
  from f
)
select window_start_epoch, count(*)::BIGINT as n,
       round(sum(value), 2) as total_value
from w
group by window_start_epoch
"""


def rel_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Distinct users per event type: per-batch local distinct (the
    combiner) then an exact distinct-count over the shrunken pairs."""
    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "user_id"]
    )

    def local_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop_duplicates(["event_type", "user_id"])

    def count_users(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [group["event_type"].iloc[0]],
                "n_users": [int(group["user_id"].nunique())],
            }
        )

    out = (
        ds.map_batches(local_distinct, batch_format="pandas")
        .groupby("event_type")
        .map_groups(count_users, batch_format="pandas")
    )
    return out.to_pandas().astype({"n_users": "int64"})


REL_DISTINCT_USERS_SQL = """
select event_type, count(distinct user_id) as n_users
from events
group by event_type
"""


# ---------------------------------------------------------------------------
# Q3-style composite: filter + broadcast join + partial agg + top-k
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_TOPK = 10


Q3_BUCKETS = 32


def rel_top_revenue_orders(sf_dir: str) -> pd.DataFrame:
    """Top revenue orders for one market segment, with no driver-side
    fact-table read: broadcast ONLY the segment custkeys (a sorted
    int64 numpy array — true zero-copy plasma reads in the tasks),
    derive qualifying orderkeys with a distributed scan of orders,
    partial-aggregate lineitem revenue per batch, then co-group the
    (orderkey, partial) rows with the qualifying keys in Q3_BUCKETS
    hash buckets — each bucket finishes its orders' sums, semi-joins
    against its qualifying keys, and emits a local top-k.  The driver
    only ever sees Q3_BUCKETS × k candidate rows."""
    import pyarrow.parquet as pq_

    cust = pq_.read_table(
        _path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    seg_mask = pd.Series(cust["c_mktsegment"].to_pandas()) == Q3_SEGMENT
    seg_keys = np.sort(cust["c_custkey"].to_numpy()[seg_mask.to_numpy()])
    seg_ref = ray.put(seg_keys)

    orders = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    )

    def qualifying(batch: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(seg_ref)  # zero-copy numpy view of the plasma buffer
        ok = batch["o_custkey"].to_numpy()
        pos = np.searchsorted(keys, ok)
        hit = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == ok)
        q = batch.loc[hit, ["o_orderkey"]].rename(columns={"o_orderkey": "l_orderkey"})
        return q.assign(revenue=0.0, src=np.int8(0))

    qual = orders.map_batches(qualifying, batch_format="pandas")

    lineitem = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def partial_fn(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(revenue=batch["l_extendedprice"] * (1.0 - batch["l_discount"]))
        g = b.groupby("l_orderkey", as_index=False)["revenue"].sum()
        return g.assign(src=np.int8(1))

    partials = lineitem.map_batches(partial_fn, batch_format="pandas")

    def bucketed(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.assign(bucket=(batch["l_orderkey"] % Q3_BUCKETS).astype("int64"))

    both = qual.union(partials).map_batches(bucketed, batch_format="pandas")

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        quals = group.loc[group["src"] == 0, "l_orderkey"].unique()
        sums = (
            group[group["src"] == 1]
            .groupby("l_orderkey", as_index=False)["revenue"].sum()
        )
        sums = sums[sums["l_orderkey"].isin(quals)]
        return sums.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(Q3_TOPK)

    cands = (
        both.groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    out = cands.sort_values(
        ["revenue", "l_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(Q3_TOPK)
    out = out.reset_index(drop=True)
    out["revenue"] = out["revenue"].round(2)
    return out[["l_orderkey", "revenue"]].astype(
        {"l_orderkey": "int64", "revenue": "float64"}
    )


REL_TOP_REVENUE_ORDERS_SQL = f"""
select l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue
from lineitem l
join orders o on l.l_orderkey = o.o_orderkey
join customer c on o.o_custkey = c.c_custkey
where c.c_mktsegment = '{Q3_SEGMENT}'
group by l.l_orderkey
order by sum(l.l_extendedprice * (1 - l.l_discount)) desc, l.l_orderkey
limit {Q3_TOPK}
"""


RANGE_WINDOW_S = 1800


def rel_range_join_click_error(sf_dir: str) -> pd.DataFrame:
    """Windowed range self-join: error events within 30 minutes after a
    click by the same user (functions.windows.range_join_window)."""
    from ocr_poc_ray.functions.windows import range_join_window

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_id", "user_id", "event_type", "ts"]
    )
    out = range_join_window(ds, window_s=float(RANGE_WINDOW_S)).to_pandas()
    if out.empty:
        out = pd.DataFrame(columns=["event_id", "user_id", "matched_event_id"])
    return out.astype(
        {"event_id": "int64", "user_id": "int64", "matched_event_id": "int64"}
    )


REL_RANGE_JOIN_SQL = f"""
select a.event_id, a.user_id, b.event_id as matched_event_id
from events a join events b
  on a.user_id = b.user_id
 and b.ts >= a.ts
 and b.ts < a.ts + interval {RANGE_WINDOW_S} second
where a.event_type = 'click' and b.event_type = 'error'
"""


QUANTILES = (0.25, 0.5, 0.75, 0.9)


def rel_quantity_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT distributed quantiles of a low-cardinality measure via the
    histogram-combine pattern: per-batch value counts (vectorized),
    one tiny combine (distinct-value-bounded), then interpolated
    quantile_cont semantics computed from the cumulative histogram —
    no sort of the fact table at any point."""
    ds = ray.data.read_parquet(_path(sf_dir, "lineitem"), columns=["l_quantity"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("l_quantity", as_index=False).size()

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("l_quantity")["size"]
        .sum()
        .sort_index()
    )
    values = hist.index.to_numpy(dtype="float64")
    counts = hist.to_numpy(dtype="int64")
    cum = counts.cumsum()
    n = int(cum[-1])

    rows = []
    for q in QUANTILES:
        pos = (n - 1) * q  # quantile_cont: linear interpolation
        lo_idx = int(np.searchsorted(cum, int(np.floor(pos)) + 1))
        hi_idx = int(np.searchsorted(cum, int(np.ceil(pos)) + 1))
        frac = pos - np.floor(pos)
        val = values[lo_idx] + frac * (values[hi_idx] - values[lo_idx])
        rows.append({"q": q, "value": round(float(val), 6)})
    return pd.DataFrame(rows)


REL_QUANTITY_QUANTILES_SQL = " union all ".join(
    f"select {q} as q, round(quantile_cont(l_quantity, {q}), 6) as value from lineitem"
    for q in QUANTILES
)


def rel_rolling_value(sf_dir: str) -> pd.DataFrame:
    """Per-user 3-row moving average (bounded-preceding rolling window
    via functions.windows.rolling_mean)."""
    from ocr_poc_ray.functions.windows import rolling_mean

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
    )
    out = rolling_mean(ds).to_pandas()
    return out.astype(
        {"event_id": "int64", "user_id": "int64", "rolling_avg": "float64"}
    )


REL_ROLLING_VALUE_SQL = """
select event_id, user_id,
       round(avg(value) over (partition by user_id order by ts, event_id
                              rows between 2 preceding and current row), 6)
         as rolling_avg
from events
"""


ANTI_JOIN_BUCKETS = 32
ANTI_JOIN_MIN_PRICE = 300_000.0


def rel_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Distributed anti-join (NOT EXISTS): customers with no order above
    ANTI_JOIN_MIN_PRICE (the filter keeps the result non-trivial — every
    customer in this corpus has SOME order).

    Neither side is collected or broadcast: both are projected to the
    key column, per-batch pre-shrunk (order custkeys filtered + deduped
    in the batch — the combiner), tagged, and co-grouped in
    ANTI_JOIN_BUCKETS hash buckets; each bucket emits its customer keys
    absent from its order-key set.  The exchange moves only distinct
    keys."""

    def tag_cust(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": batch["c_custkey"],
                "src": np.int8(0),
                "bucket": (batch["c_custkey"] % ANTI_JOIN_BUCKETS).astype("int64"),
            }
        )

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch.loc[
            batch["o_totalprice"] > ANTI_JOIN_MIN_PRICE, "o_custkey"
        ].drop_duplicates()
        return pd.DataFrame(
            {"k": k, "src": np.int8(1), "bucket": (k % ANTI_JOIN_BUCKETS).astype("int64")}
        )

    cust = ray.data.read_parquet(
        _path(sf_dir, "customer"), columns=["c_custkey"]
    ).map_batches(tag_cust, batch_format="pandas")
    orders = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(tag_orders, batch_format="pandas")

    def anti(group: pd.DataFrame) -> pd.DataFrame:
        have = group.loc[group["src"] == 1, "k"].unique()
        keys = group.loc[group["src"] == 0, "k"]
        return pd.DataFrame({"c_custkey": keys[~keys.isin(have)]})

    out = (
        cust.union(orders)
        .groupby("bucket")
        .map_groups(anti, batch_format="pandas")
        .to_pandas()
    )
    if "c_custkey" not in out.columns:  # every customer had an order
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return out.astype({"c_custkey": "int64"})


REL_CUSTOMERS_WITHOUT_ORDERS_SQL = f"""
select c_custkey from customer c
where not exists (select 1 from orders o
                  where o.o_custkey = c.c_custkey
                    and o.o_totalprice > {ANTI_JOIN_MIN_PRICE})
"""


TOPK_PER_USER = 3


def rel_topk_events_per_user(sf_dir: str) -> pd.DataFrame:
    """Grouped top-k (the many-group window rank): top-3 events by value
    per user.  Per-batch local top-k per user is the combiner (≤ k rows
    per (batch, user) survive); the final per-user rank runs in a
    bounded number of hash buckets — user count never appears as a Ray
    group count."""
    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_id", "user_id", "value"]
    )

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.sort_values(["value", "event_id"], ascending=[False, True],
                              kind="mergesort")
            .groupby("user_id", sort=False)
            .head(TOPK_PER_USER)
        )
        return g.assign(bucket=(g["user_id"] % ANTI_JOIN_BUCKETS).astype("int64"))

    def final_rank(group: pd.DataFrame) -> pd.DataFrame:
        g = (
            group.sort_values(["user_id", "value", "event_id"],
                              ascending=[True, False, True], kind="mergesort")
            .groupby("user_id", sort=False)
            .head(TOPK_PER_USER)
        )
        g = g.copy()
        g["rank"] = g.groupby("user_id", sort=False).cumcount() + 1
        return g[["user_id", "event_id", "value", "rank"]]

    out = (
        ds.map_batches(local_topk, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final_rank, batch_format="pandas")
        .to_pandas()
    )
    return out.astype(
        {"user_id": "int64", "event_id": "int64", "value": "float64", "rank": "int64"}
    )


REL_TOPK_EVENTS_PER_USER_SQL = f"""
select user_id, event_id, value,
       row_number() over (partition by user_id order by value desc, event_id) as rank
from events
qualify rank <= {TOPK_PER_USER}
"""


def rel_hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users per event type via mergeable HLL
    registers (functions.sketches) — rows-only: the estimate is within
    ~1.6% of exact by construction, asserted with tolerance in tests."""
    from ocr_poc_ray.functions.sketches import hll_count_distinct_by

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "user_id"]
    )
    out = hll_count_distinct_by(ds, "event_type", "user_id")
    return out.astype({"approx_distinct": "int64"})


def rel_value_quantiles_by_type(sf_dir: str) -> pd.DataFrame:
    """Approximate per-event-type value quantiles via the mergeable
    bottom-k priority-sample sketch (functions.sketches) — the
    continuous-measure counterpart of rel_quantity_quantiles' exact
    histogram combine.  Rows-only: rank error ≈ 1/√k, tolerance-
    asserted in tests/test_functions.py."""
    from ocr_poc_ray.functions.sketches import quantile_sketch_by

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "value", "event_id"]
    )
    out = quantile_sketch_by(
        ds, "event_type", "value", id_cols=["event_id"], k=4096
    )
    out["value"] = out["value"].round(6)
    return out.astype({"q": "float64", "value": "float64"})


def rel_running_value_by_user(sf_dir: str) -> pd.DataFrame:
    """Per-user cumulative value scan over events — the keyed window
    counterpart of doc_pack_sequences' global prefix sum."""
    from ocr_poc_ray.functions.windows import keyed_running_sum

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )
    out = keyed_running_sum(ds).to_pandas()
    return out.astype(
        {"event_id": "int64", "user_id": "int64", "running_value": "float64"}
    )


REL_RUNNING_VALUE_SQL = """
select event_id, user_id,
       round(sum(value) over (partition by user_id order by ts, event_id
                              rows unbounded preceding), 6) as running_value
from events
"""


def rel_event_lag_delta(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-event time (lag window) — the session-gap /
    activity-cadence feature of an event pipeline."""
    from ocr_poc_ray.functions.windows import keyed_lag_delta

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "ts", "event_id"]
    )
    out = keyed_lag_delta(ds).to_pandas()
    return out.astype({"event_id": "int64", "user_id": "int64", "delta_us": "int64"})


REL_EVENT_LAG_DELTA_SQL = """
select event_id, user_id,
       coalesce(date_diff('microsecond',
                lag(ts) over (partition by user_id order by ts, event_id),
                ts), -1)::BIGINT as delta_us
from events
"""


SAMPLE_PER_USER_K = 2


def rel_sample_per_user(sf_dir: str) -> pd.DataFrame:
    """Deterministic per-key sample: the k events with the lowest
    md5(event_id) per user — the distributed equivalent of a per-key
    reservoir sample, but reproducible on any engine / run /
    partitioning.  Same shape as rel_topk_events_per_user: per-batch
    local bottom-k per user (the combiner), bounded-bucket final."""
    import hashlib as _hl

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_id", "user_id"]
    )

    def local_bottomk(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["pri"] = [
            _hl.md5(str(e).encode()).hexdigest() for e in batch["event_id"]
        ]
        g = (
            batch.sort_values(["pri", "event_id"], kind="mergesort")
            .groupby("user_id", sort=False)
            .head(SAMPLE_PER_USER_K)
        )
        return g.assign(bucket=(g["user_id"] % ANTI_JOIN_BUCKETS).astype("int64"))

    def final_bottomk(group: pd.DataFrame) -> pd.DataFrame:
        g = (
            group.sort_values(["user_id", "pri", "event_id"], kind="mergesort")
            .groupby("user_id", sort=False)
            .head(SAMPLE_PER_USER_K)
        )
        return g[["user_id", "event_id"]]

    out = (
        ds.map_batches(local_bottomk, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final_bottomk, batch_format="pandas")
        .to_pandas()
    )
    return out.astype({"user_id": "int64", "event_id": "int64"})


REL_SAMPLE_PER_USER_SQL = f"""
select user_id, event_id from events
qualify row_number() over (partition by user_id
        order by md5(cast(event_id as varchar)), event_id) <= {SAMPLE_PER_USER_K}
"""


def rel_value_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Global percent_rank of every event by value — a full-corpus
    ranking expressed as the distributed prefix scan (one range-sort +
    O(blocks) offset combine), never a driver-side sort."""
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_id", "value"]
    )
    n = ds.count()  # parquet metadata count — no data pass
    ranked = ordered_prefix_sum(
        ds,
        sort_cols=["value", "event_id"],
        value_col=None,
        out_col="rk",
        unique_col="event_id",
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        pr = (b["rk"].to_numpy(np.int64) - 1) / max(n - 1, 1)
        return pd.DataFrame(
            {"event_id": b["event_id"], "pct_rank": np.round(pr, 6)}
        )

    out = ranked.map_batches(finish, batch_format="pandas").to_pandas()
    return out.astype({"event_id": "int64", "pct_rank": "float64"})


# (value, event_id) is unique, so rank == row_number and DuckDB's
# percent_rank matches the (rk-1)/(n-1) scan exactly.
REL_VALUE_PERCENT_RANK_SQL = """
select event_id,
       round(percent_rank() over (order by value, event_id), 6) as pct_rank
from events
"""


def rel_props_json(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: pull the integer field ``k`` out of
    the JSON ``props`` string with ONE vectorized RE2 pass
    (``pc.extract_regex`` — no per-row json.loads), then the standard
    partial-agg + tiny-combine rollup per event_type."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "props"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        ks = pc.struct_field(
            pc.extract_regex(batch["props"], '"k": (?P<k>\\d+)'), "k"
        )
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "k": pc.cast(ks, pa.int64()).to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        n = int(group["n"].sum())
        s = int(group["sum_k"].sum())
        return pd.DataFrame(
            {
                "event_type": [group["event_type"].iloc[0]],
                "n": [n],
                "sum_k": [s],
                "avg_k": [round(s / n, 6)],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"n": "int64", "sum_k": "int64"})


REL_PROPS_JSON_SQL = r"""
select event_type, count(*) as n,
       sum(cast(regexp_extract(props, '"k": (\d+)', 1) as bigint))::BIGINT as sum_k,
       round(sum(cast(regexp_extract(props, '"k": (\d+)', 1) as bigint))::DOUBLE
             / count(*), 6) as avg_k
from events
group by event_type
"""


# ---------------------------------------------------------------------------
# Per-user analytics: funnel conversion, modal event, rolling actives
# ---------------------------------------------------------------------------

USER_BUCKETS = 32  # hash-bucket count for per-user combines: the
# exchange always moves (bucket, partial) rows and the grouped combine
# runs over USER_BUCKETS groups — NEVER one group per user (CLAUDE.md:
# per-group overhead dominates many-group map_groups).


def rel_user_funnel(sf_dir: str) -> pd.DataFrame:
    """view→purchase funnel: how many users viewed, purchased, and
    purchased at-or-after their first view.

    Shape: per-batch pandas groupby collapses each batch to one
    (user, first_view, first_purchase) partial row; partials co-group
    in ``USER_BUCKETS`` hash buckets where a vectorized min-merge
    finishes each user and the bucket emits FOUR counters; the driver
    sums ≤32 counter rows.  No per-user group ever exists."""
    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["ts", "user_id", "event_type"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch[["user_id"]].drop_duplicates()
        v = (
            batch[batch["event_type"] == "view"]
            .groupby("user_id", as_index=False)
            .agg(first_view=("ts", "min"))
        )
        p = (
            batch[batch["event_type"] == "purchase"]
            .groupby("user_id", as_index=False)
            .agg(first_purchase=("ts", "min"))
        )
        m = u.merge(v, on="user_id", how="left").merge(p, on="user_id", how="left")
        m["bucket"] = (m["user_id"].to_numpy() % USER_BUCKETS).astype(np.int64)
        return m

    def bucket_stats(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("user_id", as_index=False).agg(
            first_view=("first_view", "min"),
            first_purchase=("first_purchase", "min"),
        )
        viewed = g["first_view"].notna()
        purchased = g["first_purchase"].notna()
        converted = viewed & purchased & (g["first_purchase"] >= g["first_view"])
        return pd.DataFrame(
            {
                "n_users": [len(g)],
                "n_viewers": [int(viewed.sum())],
                "n_purchasers": [int(purchased.sum())],
                "n_converted": [int(converted.sum())],
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .to_pandas()
    )
    out = pd.DataFrame(
        {c: [int(parts[c].sum())] for c in
         ["n_users", "n_viewers", "n_purchasers", "n_converted"]}
    )
    return out.astype("int64")


REL_USER_FUNNEL_SQL = """
with u as (
  select user_id,
         min(case when event_type = 'view' then ts end) as first_view,
         min(case when event_type = 'purchase' then ts end) as first_purchase
  from events group by user_id
)
select count(*)::BIGINT as n_users,
       count(first_view)::BIGINT as n_viewers,
       count(first_purchase)::BIGINT as n_purchasers,
       sum(case when first_purchase >= first_view then 1 else 0 end)::BIGINT
         as n_converted
from u
"""


def rel_user_mode_event(sf_dir: str) -> pd.DataFrame:
    """Most frequent event type per user (grouped mode), ties broken
    by lexicographically smallest type.

    Shape: per-batch (user, type, n) partial counts → hash-bucket
    combine (sum counts, vectorized sort + drop_duplicates argmax) —
    the output is one row per user but no stage ever groups per
    user."""
    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "event_type"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("event_type", "size")
        )
        g["bucket"] = (g["user_id"].to_numpy() % USER_BUCKETS).astype(np.int64)
        return g

    def bucket_mode(group: pd.DataFrame) -> pd.DataFrame:
        t = group.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("n", "sum")
        )
        t = t.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        w = t.drop_duplicates("user_id", keep="first")
        return w.rename(columns={"event_type": "top_event"})[
            ["user_id", "top_event", "n"]
        ]

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_mode, batch_format="pandas")
    )
    return out.to_pandas().astype({"user_id": "int64", "n": "int64"})


REL_USER_MODE_EVENT_SQL = """
with c as (
  select user_id, event_type, count(*) as n from events group by 1, 2
)
select user_id, event_type as top_event, n::BIGINT as n
from c
qualify row_number() over (partition by user_id order by n desc, event_type) = 1
"""


ROLLING_WINDOW_DAYS = 7


def rel_rolling_active_users(sf_dir: str) -> pd.DataFrame:
    """Exact 7-day rolling distinct-user count per day.

    Rolling DISTINCT doesn't decompose as a sum of daily counts, so the
    shape is: per-batch distinct (day, user) pairs → hash-bucket by
    user (buckets PARTITION users, so per-bucket distinct counts add) →
    inside each bucket a vectorized 7× fan-out (activity on day d
    contributes to windows d..d+6) + dedup + per-day count → the
    driver sums ≤ buckets × (days+6) tiny counter rows and keeps days
    that really occur.  Work scales with distinct pairs × 7, never
    with raw events, and no stage holds more than one bucket."""
    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["ts", "user_id"])

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {"day": batch["ts"].dt.floor("D"), "user_id": batch["user_id"]}
        ).drop_duplicates()
        b["bucket"] = (b["user_id"].to_numpy() % USER_BUCKETS).astype(np.int64)
        return b

    def bucket_counts(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["day", "user_id"])
        w = ROLLING_WINDOW_DAYS
        days = g["day"].to_numpy().repeat(w) + np.tile(
            np.arange(w), len(g)
        ) * np.timedelta64(1, "D")
        fan = pd.DataFrame(
            {"day": days, "user_id": g["user_id"].to_numpy().repeat(w)}
        ).drop_duplicates()
        c = fan.groupby("day", as_index=False).agg(n=("user_id", "size"))
        real = set(g["day"])
        c["real"] = c["day"].isin(real)
        return c

    parts = (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("day", as_index=False).agg(
        active_7d=("n", "sum"), real=("real", "any")
    )
    out = out.loc[out["real"], ["day", "active_7d"]].reset_index(drop=True)
    return out.astype({"active_7d": "int64"})


REL_ROLLING_ACTIVE_SQL = f"""
with du as (
  select distinct date_trunc('day', ts) as day, user_id from events
),
days as (select distinct day from du)
select d.day, count(distinct u.user_id)::BIGINT as active_7d
from days d
join du u on u.day between d.day - interval {ROLLING_WINDOW_DAYS - 1} day and d.day
group by d.day
"""


def rel_corr_value_k(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation between ``value`` and the JSON-extracted
    ``k`` per event type, via the classic mergeable-moment partial
    (n, Σx, Σy, Σx², Σy², Σxy): each batch collapses to one 6-number
    row per event type, the combine sums a handful of partials — the
    textbook distributed-statistics shape (nothing wide ever moves)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "value", "props"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        ks = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch["props"], '"k": (?P<k>\\d+)'), "k"
            ),
            pa.float64(),
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "x": batch["value"].to_numpy(),
                "y": ks,
            }
        )
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        df["xy"] = df["x"] * df["y"]
        g = df.groupby("event_type", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), syy=("yy", "sum"), sxy=("xy", "sum"),
        )
        return g

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        n = float(group["n"].sum())
        sx, sy = float(group["sx"].sum()), float(group["sy"].sum())
        sxx, syy = float(group["sxx"].sum()), float(group["syy"].sum())
        sxy = float(group["sxy"].sum())
        num = n * sxy - sx * sy
        den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        return pd.DataFrame(
            {
                "event_type": [group["event_type"].iloc[0]],
                "n": [int(n)],
                "corr_value_k": [round(num / den, 6) if den > 0 else None],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"n": "int64", "corr_value_k": "float64"})


REL_CORR_VALUE_K_SQL = r"""
select event_type, count(*) as n,
       round(corr(value,
                  cast(regexp_extract(props, '"k": (\d+)', 1) as bigint)), 6)
         as corr_value_k
from events
group by event_type
"""


def rel_cumulative_users(sf_dir: str) -> pd.DataFrame:
    """New-user curve: first-seen day per user, new-user count per day,
    and the cumulative distinct-user total over time.

    Shape: per-batch (user, min day) partials → hash-bucket min-merge
    (buckets partition users, so per-bucket first-day histograms ADD)
    → each bucket emits a per-day new-user count → the driver sums
    ≤ buckets × days tiny rows and runs the cumsum over the day axis
    (days scale with calendar time, not data volume)."""
    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["ts", "user_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {"day": batch["ts"].dt.floor("D"), "user_id": batch["user_id"]}
        )
        g = b.groupby("user_id", as_index=False).agg(day=("day", "min"))
        g["bucket"] = (g["user_id"].to_numpy() % USER_BUCKETS).astype(np.int64)
        return g

    def bucket_newusers(group: pd.DataFrame) -> pd.DataFrame:
        first = group.groupby("user_id", as_index=False).agg(day=("day", "min"))
        return first.groupby("day", as_index=False).agg(n_new=("user_id", "size"))

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_newusers, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("day", as_index=False).agg(n_new=("n_new", "sum"))
    out = out.sort_values("day", kind="mergesort").reset_index(drop=True)
    out["cum_users"] = out["n_new"].cumsum()
    return out.astype({"n_new": "int64", "cum_users": "int64"})


REL_CUMULATIVE_USERS_SQL = """
with f as (
  select user_id, min(date_trunc('day', ts)) as first_day from events group by 1
),
d as (select first_day as day, count(*) as n_new from f group by 1)
select day, n_new::BIGINT as n_new,
       (sum(n_new) over (order by day))::BIGINT as cum_users
from d
"""


HIGH_PURCHASE_VALUE = 150.0


def rel_viewers_never_purchased(sf_dir: str) -> pd.DataFrame:
    """Self set-difference: users with at least one view and NO
    high-value purchase (value > ``HIGH_PURCHASE_VALUE``), with their
    view counts — the EXCEPT/anti-join pattern done as one streaming
    pass (per-batch per-user partial counts + flag) and a hash-bucket
    combine; no second read of the table and no shuffle of raw
    events."""
    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "event_type", "value"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "v": (batch["event_type"] == "view").astype(np.int64),
                "p": (
                    (batch["event_type"] == "purchase")
                    & (batch["value"] > HIGH_PURCHASE_VALUE)
                ).astype(np.int64),
            }
        )
        g = df.groupby("user_id", as_index=False).agg(
            n_views=("v", "sum"), n_purch=("p", "sum")
        )
        g["bucket"] = (g["user_id"].to_numpy() % USER_BUCKETS).astype(np.int64)
        return g

    def bucket_filter(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("user_id", as_index=False).agg(
            n_views=("n_views", "sum"), n_purch=("n_purch", "sum")
        )
        keep = g.loc[(g["n_views"] > 0) & (g["n_purch"] == 0)]
        return keep[["user_id", "n_views"]]

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_filter, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:  # typed empty: all viewers purchased
        out = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_views": pd.Series([], dtype="int64"),
            }
        )
    return out.astype({"user_id": "int64", "n_views": "int64"})


REL_VIEWERS_NEVER_PURCHASED_SQL = f"""
with v as (
  select user_id, count(*) as n_views from events
  where event_type = 'view' group by user_id
),
p as (select distinct user_id from events
      where event_type = 'purchase' and value > {HIGH_PURCHASE_VALUE})
select v.user_id, v.n_views::BIGINT as n_views
from v anti join p using (user_id)
"""


def rel_user_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention: users cohorted by first-seen day; for each
    (cohort day, day offset) the count of cohort members active at
    that offset — the canonical distributed SELF-JOIN done by
    co-partitioning instead of a shuffle join: one streaming pass
    emits per-batch (user, day) distinct pairs AND (user, min day)
    partials into the SAME user-hash buckets; each bucket derives its
    users' first days and joins its own activity pairs locally
    (buckets partition users, so (cohort, offset) counts add across
    buckets).  The raw events table is read once and never
    shuffled."""
    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["ts", "user_id"])

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {"day": batch["ts"].dt.floor("D"), "user_id": batch["user_id"]}
        ).drop_duplicates()
        b["bucket"] = (b["user_id"].to_numpy() % USER_BUCKETS).astype(np.int64)
        return b

    def bucket_retention(group: pd.DataFrame) -> pd.DataFrame:
        du = group.drop_duplicates(["user_id", "day"])
        first = du.groupby("user_id", as_index=False).agg(cohort_day=("day", "min"))
        j = du.merge(first, on="user_id")
        j["day_offset"] = (
            (j["day"] - j["cohort_day"]).dt.days.astype(np.int64)
        )
        return j.groupby(["cohort_day", "day_offset"], as_index=False).agg(
            n_active=("user_id", "size")
        )

    parts = (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_retention, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby(["cohort_day", "day_offset"], as_index=False).agg(
        n_active=("n_active", "sum")
    )
    return out.astype({"day_offset": "int64", "n_active": "int64"})


REL_USER_RETENTION_SQL = """
with f as (
  select user_id, min(date_trunc('day', ts)) as cohort_day
  from events group by user_id
),
du as (select distinct date_trunc('day', ts) as day, user_id from events)
select f.cohort_day, datediff('day', f.cohort_day, du.day)::BIGINT as day_offset,
       count(*)::BIGINT as n_active
from du join f using (user_id)
group by 1, 2
"""


BLOOM_PRICE_CUTOFF = 400_000.0
BLOOM_M_BITS = 1 << 20
BLOOM_K = 4


def rel_bloom_semijoin(sf_dir: str) -> pd.DataFrame:
    """Large-large semi-join via bloom prefilter + exact verify: count
    and sum lineitem quantity for orders above a price cutoff.

    The 100-TB shape when the build side's key set is too big to
    broadcast exactly: a fixed-size mergeable bloom (built with
    per-batch OR-partials) broadcasts instead and prescreens the probe
    side, shrinking the real shuffle join to the survivors (true
    matches + a ~<1% false-positive sliver); the distributed hash join
    then removes the false positives, so the result is exact at any
    fill level."""
    import ray as _ray

    from ocr_poc_ray.functions.sketches import bloom_build, bloom_contains

    qualifying = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda b: b.loc[b["o_totalprice"] > BLOOM_PRICE_CUTOFF, ["o_orderkey"]],
        batch_format="pandas",
    )
    words = bloom_build(qualifying, "o_orderkey", m_bits=BLOOM_M_BITS, k=BLOOM_K)
    words_ref = _ray.put(words)

    def prescreen(batch: pd.DataFrame) -> pd.DataFrame:
        w = _ray.get(words_ref)  # zero-copy numpy from the object store
        hit = bloom_contains(w, batch["l_orderkey"].to_numpy(np.int64), k=BLOOM_K)
        return batch.loc[hit, ["l_orderkey", "l_returnflag", "l_quantity"]]

    survivors = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_quantity"],
    ).map_batches(prescreen, batch_format="pandas")

    # exact verify: Ray 2.49 join raises on 0-row blocks (a prescreen
    # can empty some) — repartition both inputs first (see CLAUDE.md)
    verified = survivors.repartition(8).join(
        qualifying.repartition(8),
        "inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("l_returnflag", as_index=False).agg(
            n_items=("l_quantity", "size"), sum_qty=("l_quantity", "sum")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": [group["l_returnflag"].iloc[0]],
                "n_items": [int(group["n_items"].sum())],
                "sum_qty": [round(group["sum_qty"].sum(), 2)],
            }
        )

    out = (
        verified.map_batches(partial, batch_format="pandas")
        .groupby("l_returnflag")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"n_items": "int64", "sum_qty": "float64"})


REL_BLOOM_SEMIJOIN_SQL = f"""
select l_returnflag,
       count(*)::BIGINT as n_items,
       round(sum(l_quantity), 2) as sum_qty
from lineitem
where l_orderkey in (
  select o_orderkey from orders where o_totalprice > {BLOOM_PRICE_CUTOFF}
)
group by l_returnflag
"""


# ---------------------------------------------------------------------------
# EXISTS semi-join grouped count (TPC-H Q4 shape): orders with at least
# one returned lineitem, counted by priority.  Both sides are fact-sized
# at 100 TB (no broadcast): distinct is taken with per-batch unique
# partials + a hash-bucketed exact combine (bounded groups, never one
# per key), then a partitioned hash join carries only (orderkey,
# priority), and the final count is a partial-agg + tiny combine.
# ---------------------------------------------------------------------------

def rel_priority_returned_orders(sf_dir: str) -> pd.DataFrame:
    n_buckets = 16
    returned = ray.data.read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_orderkey", "l_returnflag"]
    )

    def local_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        keys = batch.loc[batch["l_returnflag"] == "R", ["l_orderkey"]]
        keys = keys.drop_duplicates()
        keys["_hb"] = (keys["l_orderkey"].to_numpy() % n_buckets).astype("int64")
        return keys

    def bucket_distinct(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates("l_orderkey")[["l_orderkey"]]

    distinct_keys = (
        returned.map_batches(local_distinct, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_distinct, batch_format="pandas")
    )
    orders = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )
    # semi-join via the size-switched membership filter (sorted-numpy
    # broadcast below BROADCAST_KEY_LIMIT distinct keys, bloom + exact
    # verify join above): no hash-join pool for a one-bit question
    from ocr_poc_ray.functions.dedup import membership_flag

    joined = membership_flag(orders, "o_orderkey", distinct_keys, "l_orderkey")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["_in_set"]].groupby(
            "o_orderpriority", as_index=False
        ).size()

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    out = (
        parts.groupby("o_orderpriority", as_index=False)["size"]
        .sum()
        .rename(columns={"size": "n_orders"})
        .sort_values("o_orderpriority", kind="mergesort")
        .reset_index(drop=True)
    )
    return out.astype({"n_orders": "int64"})


REL_PRIORITY_RETURNED_SQL = """
select o_orderpriority, count(*)::BIGINT as n_orders
from orders
where o_orderkey in (select l_orderkey from lineitem where l_returnflag = 'R')
group by o_orderpriority
order by o_orderpriority
"""


# ---------------------------------------------------------------------------
# Exact per-group median of a CONTINUOUS measure (quantile_disc
# semantics: the element at 0-based rank max(0, ceil(n·q)-1)) — no sort of
# the fact table and nothing fact-sized on the driver.  The histogram
# trick rel_quantity_quantiles uses needs low-cardinality values;
# events.value is continuous, so this uses iterative range refinement
# (functions.selection.exact_group_quantile_disc): each pass histograms
# the unresolved keys' values into fixed bins (bounded combine), narrows
# to the bin holding the target rank, and only a ≤threshold-sized final
# bin is ever collected.
# ---------------------------------------------------------------------------

def rel_median_value_by_type(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.selection import exact_group_quantile_disc

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "value"]
    )
    out = exact_group_quantile_disc(ds, key_col="event_type", value_col="value", q=0.5)
    out = out.rename(columns={"value": "median_value"})
    out["median_value"] = out["median_value"].round(6)
    return out.sort_values("event_type", kind="mergesort").reset_index(drop=True)


REL_MEDIAN_VALUE_SQL = """
select event_type, round(quantile_disc(value, 0.5), 6) as median_value
from events group by event_type order by event_type
"""


QUANTILES_EXACT_QS = (0.1, 0.5, 0.9)


def rel_value_quantiles_exact(sf_dir: str) -> pd.DataFrame:
    """EXACT per-type p10/p50/p90 of the continuous measure — the
    multi-quantile variant of rel_median_value_by_type: one range-
    refinement search per (type, q), every distributed pass serving all
    searches at once.  The oracle-verified complement of the rows-only
    sketch in rel_value_quantiles_by_type."""
    from ocr_poc_ray.functions.selection import exact_group_quantiles_disc

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "value"]
    )
    out = exact_group_quantiles_disc(
        ds, key_col="event_type", value_col="value", qs=QUANTILES_EXACT_QS
    )
    out["value"] = out["value"].round(6)
    return (
        out.sort_values(["event_type", "q"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"q": "float64", "value": "float64"})
    )


REL_VALUE_QUANTILES_EXACT_SQL = "\nunion all\n".join(
    f"select event_type, {q} as q, round(quantile_disc(value, {q}), 6) as value "
    "from events group by event_type"
    for q in QUANTILES_EXACT_QS
) + "\norder by event_type, q"


def rel_event_streaks(sf_dir: str) -> pd.DataFrame:
    """Per-user streak analysis (gaps-and-islands): runs of consecutive
    identical event_type in time order — the repeated-action /
    bot-behaviour signal of an event pipeline.  One range-sort +
    vectorized run detection per block; only block-edge keys reach the
    combine (functions.windows.keyed_streaks)."""
    from ocr_poc_ray.functions.windows import keyed_streaks

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    out = keyed_streaks(ds).to_pandas()
    return out.astype(
        {"user_id": "int64", "n_runs": "int64", "max_run": "int64"}
    )


# classic gaps-and-islands: a run breaks when the label changes;
# top_type = lexicographically smallest label among the longest runs.
REL_EVENT_STREAKS_SQL = """
with o as (
  select user_id, event_type, ts, event_id,
         case when lag(event_type) over
                (partition by user_id order by ts, event_id)
              is distinct from event_type then 1 else 0 end as brk
  from events
), g as (
  select user_id, event_type,
         sum(brk) over (partition by user_id order by ts, event_id
                        rows unbounded preceding) as grp
  from o
), r as (
  select user_id, event_type, count(*) as run_len
  from g group by user_id, event_type, grp
), m as (
  select user_id, count(*)::BIGINT as n_runs, max(run_len)::BIGINT as max_run
  from r group by user_id
)
select m.user_id, m.n_runs, m.max_run, min(r.event_type) as top_type
from m join r on r.user_id = m.user_id and r.run_len = m.max_run
group by m.user_id, m.n_runs, m.max_run
"""


def rel_cm_user_counts(sf_dir: str) -> pd.DataFrame:
    """Count-min-sketch event counts per user — the fixed-memory
    frequency estimate (mergeable per-batch partial sketches; the
    probe list is the distinct-user set, output-sized).  One-sided
    error by construction (never undercounts); tolerance vs exact is
    asserted in tests/test_functions.py, so rows-only here (a sketch
    has no SQL equivalent)."""
    from ocr_poc_ray.functions.sketches import cm_build, cm_estimate

    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["user_id"])
    sketch = cm_build(ds, "user_id", width=4096, depth=4)

    def distinct_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates("user_id")

    users = (
        ds.map_batches(distinct_partial, batch_format="pandas")
        .to_pandas()["user_id"].drop_duplicates().sort_values()
        .to_numpy(np.int64)
    )
    return pd.DataFrame(
        {"user_id": users,
         "est_events": cm_estimate(sketch, users).astype("int64")}
    )


def rel_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER join aggregate: every customer with its order count
    and total spend — zero rows for order-less customers must SURVIVE
    (the outer-join family member next to the inner hash join and the
    anti-join).  Shape: orders pre-aggregate per batch to (custkey,
    partial n, partial spend) — the combiner — then Ray's distributed
    left_outer hash join attaches them to customers; nulls from the
    outer side become 0 row-locally.  Both inputs repartitioned first
    (0-row-block join pitfall)."""
    orders = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    )

    def agg_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False).agg(
            pn=("o_totalprice", "size"), ps=("o_totalprice", "sum")
        )
        return g

    # bounded-bucket exact combine so each custkey appears once before
    # the join (join inputs stay distributed; no broadcast)
    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_hb=(b["o_custkey"] % 16).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_custkey", as_index=False).agg(
            pn=("pn", "sum"), ps=("ps", "sum")
        )

    counts = (
        orders.map_batches(agg_partial, batch_format="pandas")
        .map_batches(bucket, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .repartition(8)
    )
    cust = ray.data.read_parquet(
        _path(sf_dir, "customer"), columns=["c_custkey"]
    ).repartition(8)
    joined = cust.join(
        counts, "left_outer", num_partitions=8,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].astype("int64"),
                "n_orders": b["pn"].fillna(0).astype("int64"),
                "total_spend": b["ps"].fillna(0.0).round(2).astype("float64"),
            }
        )

    out = joined.map_batches(finish, batch_format="pandas").to_pandas()
    return out.astype(
        {"c_custkey": "int64", "n_orders": "int64", "total_spend": "float64"}
    )


REL_CUSTOMER_ORDER_COUNTS_SQL = """
select c.c_custkey,
       count(o.o_orderkey)::BIGINT as n_orders,
       round(coalesce(sum(o.o_totalprice), 0), 2) as total_spend
from customer c left join orders o on o.o_custkey = c.c_custkey
group by c.c_custkey
"""


def rel_session_spans(sf_dir: str) -> pd.DataFrame:
    """Per-session span rows (start/end/µs duration/event count) — the
    windowed-OUTPUT shape the per-user sessionize rollup cannot give a
    downstream consumer (session-duration distributions, session-level
    sampling).  Same one-sort edge pattern
    (functions.windows.session_spans)."""
    from ocr_poc_ray.functions.windows import session_spans

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "ts", "event_id"]
    )
    out = session_spans(ds, gap_s=1800.0).to_pandas()
    out["duration_us"] = out["end_us"] - out["start_us"]
    return out.astype(
        {"user_id": "int64", "session_idx": "int64", "start_us": "int64",
         "end_us": "int64", "n_events": "int64", "duration_us": "int64"}
    )


REL_SESSION_SPANS_SQL = """
with o as (
  select user_id, ts, event_id,
         case when lag(ts) over w is null
                   or date_diff('microsecond', lag(ts) over w, ts) > 1800000000
              then 1 else 0 end as brk
  from events window w as (partition by user_id order by ts, event_id)
), g as (
  select user_id, ts,
         sum(brk) over (partition by user_id order by ts, event_id
                        rows unbounded preceding) as sess
  from o
)
select user_id, (sess - 1)::BIGINT as session_idx,
       epoch_us(min(ts))::BIGINT as start_us,
       epoch_us(max(ts))::BIGINT as end_us,
       count(*)::BIGINT as n_events,
       (epoch_us(max(ts)) - epoch_us(min(ts)))::BIGINT as duration_us
from g group by user_id, sess
"""


ATTRIBUTION_WINDOW_S = 21600  # 6 h touch window


def rel_first_touch_attribution(sf_dir: str) -> pd.DataFrame:
    """First-touch attribution: each purchase credited to the user's
    EARLIEST click within the preceding 6 h — the windowed-argmin
    sibling of rel_asof_purchase_click's last-prior match
    (functions.windows.attribution_first_touch)."""
    from ocr_poc_ray.functions.windows import attribution_first_touch

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"),
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    out = attribution_first_touch(
        ds, window_s=float(ATTRIBUTION_WINDOW_S)
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            columns=["event_id", "user_id", "first_touch_event_id", "gap_us"]
        )
    return out.astype(
        {"event_id": "int64", "user_id": "int64",
         "first_touch_event_id": "int64", "gap_us": "int64"}
    )


REL_FIRST_TOUCH_SQL = f"""
with p as (
  select event_id, user_id, ts from events where event_type = 'purchase'
), c as (
  select event_id as cid, user_id, ts as cts from events
  where event_type = 'click'
), j as (
  select p.event_id, p.user_id, c.cid, c.cts,
         date_diff('microsecond', c.cts, p.ts) as gap_us
  from p join c on c.user_id = p.user_id
  where c.cts <= p.ts
    and date_diff('microsecond', c.cts, p.ts) <= {ATTRIBUTION_WINDOW_S}::BIGINT * 1000000
)
select event_id, user_id, cid as first_touch_event_id, gap_us
from j
qualify row_number() over (partition by event_id order by cts, cid) = 1
"""


def rel_winsorized_stats(sf_dir: str) -> pd.DataFrame:
    """Robust (winsorized) statistics of the continuous event value:
    exact p01/p99 bounds from the iterative range-refinement selection,
    then one partial-agg pass over the trimmed rows — outlier-proof
    count/mean/stddev without ever sorting or collecting the fact
    table."""
    from ocr_poc_ray.functions.selection import exact_group_quantiles_disc

    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["value"])

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_g=np.zeros(len(b), dtype=np.int64))

    tagged = ds.map_batches(tag, batch_format="pandas").materialize()
    qs = exact_group_quantiles_disc(
        tagged, key_col="_g", value_col="value", qs=[0.01, 0.99]
    )
    lo = float(qs.loc[qs["q"] == 0.01, "value"].iloc[0])
    hi = float(qs.loc[qs["q"] == 0.99, "value"].iloc[0])

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(np.float64)
        v = v[(v >= lo) & (v <= hi)]
        return pd.DataFrame(
            {"n": [len(v)], "s": [float(v.sum())], "ss": [float((v * v).sum())]}
        )

    m = tagged.map_batches(moments, batch_format="pandas").to_pandas()
    n = int(m["n"].sum())
    sm, ss = float(m["s"].sum()), float(m["ss"].sum())
    mean = sm / n
    # naive E[x²]−E[x]² is fine for this well-conditioned measure
    # (measured 2e-14 off the two-pass value at sf0.1); data with
    # |mean| ≫ std needs per-batch Welford partials instead
    var = ss / n - mean * mean
    return pd.DataFrame(
        {
            "n_kept": pd.Series([n], dtype="int64"),
            "lo": pd.Series([round(lo, 6)], dtype="float64"),
            "hi": pd.Series([round(hi, 6)], dtype="float64"),
            "mean_value": pd.Series([round(mean, 6)], dtype="float64"),
            "stddev_value": pd.Series(
                [round(float(np.sqrt(max(var, 0.0))), 6)], dtype="float64"
            ),
        }
    )


# stddev_pop (not sample): mirrors the engine's n-denominator moments.
REL_WINSORIZED_STATS_SQL = """
with q as (
  select quantile_disc(value, 0.01) as lo, quantile_disc(value, 0.99) as hi
  from events
), t as (
  select value from events, q where value between q.lo and q.hi
)
select count(*)::BIGINT as n_kept,
       round((select lo from q), 6) as lo,
       round((select hi from q), 6) as hi,
       round(avg(value), 6) as mean_value,
       round(stddev_pop(value), 6) as stddev_value
from t
"""


def rel_hourly_profile(sf_dir: str) -> pd.DataFrame:
    """Hour-of-day seasonality profile: event count and mean value per
    hour — the time-dimension rollup next to rel_daily_events.
    Row-local hour extraction, 24-group partial-agg combine."""
    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        h = b["ts"].dt.hour.astype("int64")
        g = b.assign(hour=h).groupby("hour", as_index=False).agg(
            n=("value", "size"), s=("value", "sum")
        )
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("hour", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
    # report the 2-dp TOTAL, not a 6-dp mean: a mean can land exactly on
    # a rounding boundary (hit at sf0.001: 40.1940625) where a 1-ulp
    # summation-order difference flips the digit; the total's 2-dp
    # boundary is ~1e13 ulps away from any float-order noise
    return pd.DataFrame(
        {
            "hour": agg["hour"].astype("int64"),
            "n_events": agg["n"].astype("int64"),
            "total_value": agg["s"].round(2).astype("float64"),
        }
    )


REL_HOURLY_PROFILE_SQL = """
select date_part('hour', ts)::BIGINT as hour,
       count(*)::BIGINT as n_events,
       round(sum(value), 2) as total_value
from events group by hour
"""


HIST_WIDTH = 25


EQUIDEPTH_K = 10


def rel_value_equidepth(sf_dir: str) -> pd.DataFrame:
    """Equi-DEPTH histogram of event value (NTILE(10) buckets): equal
    row counts per bucket with exact value boundaries — the optimizer
    statistics complement of the equi-width histogram (depth buckets
    track quantiles, width buckets track ranges).  One global rank via
    the prefix-scan machinery (ties broken by event_id, so both engines
    order identically); bucket assignment is NTILE's closed form
    row-locally; per-batch (bucket, count, min, max) partials combine
    driver-side at K×blocks rows."""
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    k = EQUIDEPTH_K
    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["event_id", "value"])
    ranked = ordered_prefix_sum(
        ds,
        sort_cols=["value", "event_id"],
        value_col=None,
        out_col="rk",
        unique_col="event_id",
    ).materialize()  # read twice: the scalar count and the bucket pass
    n = ranked.count()
    if n == 0:
        return pd.DataFrame(
            {"bucket": pd.Series([], dtype="int64"),
             "n_values": pd.Series([], dtype="int64"),
             "vmin": pd.Series([], dtype="float64"),
             "vmax": pd.Series([], dtype="float64")}
        )
    big, small = n % k, n // k

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        r = b["rk"].to_numpy(np.int64) - 1
        cut = big * (small + 1)
        bucket = np.where(
            r < cut, r // (small + 1), big + (r - cut) // max(small, 1)
        ) + 1
        v = b["value"].to_numpy(np.float64)
        return (
            pd.DataFrame({"bucket": bucket, "v": v})
            .groupby("bucket")
            .agg(n_values=("v", "size"), vmin=("v", "min"), vmax=("v", "max"))
            .reset_index()
        )

    parts = ranked.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("bucket", as_index=False).agg(
        n_values=("n_values", "sum"), vmin=("vmin", "min"), vmax=("vmax", "max")
    )
    return (
        out.sort_values("bucket")
        .reset_index(drop=True)
        .astype({"bucket": "int64", "n_values": "int64",
                 "vmin": "float64", "vmax": "float64"})
    )


REL_VALUE_EQUIDEPTH_SQL = f"""
with r as (
  select value,
         ntile({EQUIDEPTH_K}) over (order by value, event_id) as bucket
  from events
)
select bucket::BIGINT as bucket, count(*)::BIGINT as n_values,
       min(value) as vmin, max(value) as vmax
from r group by bucket
"""


def rel_value_histogram(sf_dir: str) -> pd.DataFrame:
    """Equi-width histogram of event value (width-25 bins): exact count
    and 2-dp total per bin — the profiling primitive behind range
    pruning and skew diagnosis.  Row-local binning (values are
    positive, so floor division is identical in numpy and DuckDB),
    per-batch partial agg, ≤ range/width-group combine."""
    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy()
        bucket = np.floor(v / HIST_WIDTH).astype("int64")
        return (
            b.assign(bucket=bucket)
            .groupby("bucket", as_index=False)
            .agg(n=("value", "size"), s=("value", "sum"))
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("bucket", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
    return pd.DataFrame(
        {
            "bucket": agg["bucket"].astype("int64"),
            "lo": (agg["bucket"] * HIST_WIDTH).astype("float64"),
            "n_events": agg["n"].astype("int64"),
            "total_value": agg["s"].round(2).astype("float64"),
        }
    )


REL_VALUE_HISTOGRAM_SQL = f"""
select floor(value / {HIST_WIDTH})::BIGINT as bucket,
       (floor(value / {HIST_WIDTH}) * {HIST_WIDTH})::DOUBLE as lo,
       count(*)::BIGINT as n_events,
       round(sum(value), 2) as total_value
from events group by 1, 2
"""


def rel_region_supplier_balance(sf_dir: str) -> pd.DataFrame:
    """Region rollup of the supplier dimension — two chained broadcast
    lookups (s_nationkey → n_regionkey → r_name; the dim tables are
    tiny at any TPC-H scale, so this is a broadcast join, never a
    shuffle) + per-batch partial agg and a ≤5-group combine."""
    reg_ref = _broadcast_lookup(sf_dir, "nation", "n_nationkey", "n_regionkey")
    name_ref = _broadcast_lookup(sf_dir, "region", "r_regionkey", "r_name")
    ds = ray.data.read_parquet(
        _path(sf_dir, "supplier"), columns=["s_nationkey", "s_acctbal"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rk, hit1 = _lookup(ray.get(reg_ref), batch["s_nationkey"].to_numpy())
        rn, hit2 = _lookup(ray.get(name_ref), rk[hit1])
        b = pd.DataFrame(
            {"r_name": rn[hit2],
             "s_acctbal": batch["s_acctbal"].to_numpy()[hit1][hit2]}
        )
        return b.groupby("r_name", as_index=False).agg(
            n_suppliers=("s_acctbal", "size"), total_acctbal=("s_acctbal", "sum")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"r_name": [group["r_name"].iloc[0]],
             "n_suppliers": [int(group["n_suppliers"].sum())],
             "total_acctbal": [round(group["total_acctbal"].sum(), 2)]}
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("r_name")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"n_suppliers": "int64", "total_acctbal": "float64"})


REL_REGION_SUPPLIER_SQL = """
select r_name,
       count(*)::BIGINT as n_suppliers,
       round(sum(s_acctbal), 2) as total_acctbal
from supplier
join nation on s_nationkey = n_nationkey
join region on n_regionkey = r_regionkey
group by r_name
"""


def rel_brand_revenue(sf_dir: str) -> pd.DataFrame:
    """Fact ⋈ dimension revenue rollup over the part table: p_brand via
    a broadcast partkey lookup inside the lineitem scan (part is the
    ~1/30-of-fact dimension side; at 100 TB it would flip to the
    partitioned hash join of rel_mktsegment_revenue_hashjoin), then
    the partial-agg + bounded-combine shape of rel_agg_lineitem."""
    brand_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_brand")
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        brand, hit = _lookup(ray.get(brand_ref), batch["l_partkey"].to_numpy())
        b = pd.DataFrame(
            {
                "p_brand": brand[hit],
                "qty": batch["l_quantity"].to_numpy()[hit],
                "rev": (
                    batch["l_extendedprice"].to_numpy()
                    * (1.0 - batch["l_discount"].to_numpy())
                )[hit],
            }
        )
        return b.groupby("p_brand", as_index=False).agg(
            sum_qty=("qty", "sum"), revenue=("rev", "sum"), n_lines=("rev", "size")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"p_brand": [group["p_brand"].iloc[0]],
             "sum_qty": [round(group["sum_qty"].sum(), 2)],
             "revenue": [round(group["revenue"].sum(), 2)],
             "n_lines": [int(group["n_lines"].sum())]}
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("p_brand")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"n_lines": "int64"})


REL_BRAND_REVENUE_SQL = """
select p_brand,
       round(sum(l_quantity), 2) as sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
       count(*)::BIGINT as n_lines
from lineitem
join part on l_partkey = p_partkey
group by p_brand
"""


def rel_supplier_nation_topk(sf_dir: str) -> pd.DataFrame:
    """Top-3 suppliers per nation by (acctbal desc, suppkey asc — the
    deterministic tie-break both engines share): the local-heads
    combiner (each batch keeps its own per-nation top-3) followed by a
    per-nation final head; nation names via broadcast lookup.  The
    nation dimension is bounded (25), so per-key groups are safe here."""
    name_ref = _broadcast_lookup(sf_dir, "nation", "n_nationkey", "n_name")
    ds = ray.data.read_parquet(
        _path(sf_dir, "supplier"),
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )

    def local_heads(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.sort_values(
            ["s_nationkey", "s_acctbal", "s_suppkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        return b.groupby("s_nationkey", as_index=False).head(3)

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["s_acctbal", "s_suppkey"], ascending=[False, True], kind="mergesort"
        ).head(3)
        name, _hit = _lookup(ray.get(name_ref), g["s_nationkey"].to_numpy())
        return pd.DataFrame(
            {
                "n_name": name,
                "rk": np.arange(1, len(g) + 1, dtype=np.int64),
                "s_suppkey": g["s_suppkey"].to_numpy(np.int64),
                "s_name": g["s_name"].to_numpy(dtype=object),
                "s_acctbal": np.round(g["s_acctbal"].to_numpy(np.float64), 2),
            }
        )

    out = (
        ds.map_batches(local_heads, batch_format="pandas")
        .groupby("s_nationkey")
        .map_groups(finish, batch_format="pandas")
    )
    return out.to_pandas().astype({"rk": "int64", "s_suppkey": "int64"})


REL_SUPPLIER_NATION_TOPK_SQL = """
select n_name,
       row_number() over (
           partition by s_nationkey order by s_acctbal desc, s_suppkey
       )::BIGINT as rk,
       s_suppkey, s_name,
       round(s_acctbal, 2) as s_acctbal
from supplier
join nation on s_nationkey = n_nationkey
qualify rk <= 3
"""


# ---------------------------------------------------------------------------
# PII scrub legs that actually FIRE on the testdata (see functions/pii.py):
# every c_name carries a 9-digit id run; every events.props carries a
# short numeric value.  Pure row-local Arrow RE2 projections.
# ---------------------------------------------------------------------------

def rel_scrub_customer_names(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.pii import pii_scrub

    ds = ray.data.read_parquet(
        _path(sf_dir, "customer"), columns=["c_custkey", "c_name"]
    )
    out = pii_scrub(
        ds, "c_name", keep_cols=["c_custkey"], out_text_col="clean_name"
    ).to_pandas()
    return out.astype(
        {"n_email": "int64", "n_ipv4": "int64", "n_id_digits": "int64"}
    )


def _rel_scrub_customer_names_sql() -> str:
    from ocr_poc_ray.functions.pii import sql_count_exprs, sql_scrub_expr

    return f"""
select c_custkey, {sql_scrub_expr('c_name')} as clean_name,
       {sql_count_exprs('c_name')}
from customer
"""


REL_SCRUB_CUSTOMER_NAMES_SQL = _rel_scrub_customer_names_sql()


# ---------------------------------------------------------------------------
# Edit-distance fuzzy self-join (entity resolution): all name pairs with
# Levenshtein ≤ 2 — the corpus-scale analog of the extractor's P3 fuzzy
# matcher.  Shape: the blocked pair-grid (each Ray task holds two row
# chunks — quadratic work is inherent to the EXACT operator; LSH/shingle
# paths are the corpus-text route), with the DP fully vectorized: pairs
# are grouped by (len_a, len_b) — after the |la−lb| ≤ k length filter
# there are only a handful of length-pair groups — and each group runs
# one (P, La×Lb)-cell dynamic program in numpy, sliced into bounded
# slabs.  Never a Python loop over pairs.
# ---------------------------------------------------------------------------

LEV_MAX_DIST = 2
_LEV_CHUNK_ROWS = 2048
_LEV_PAIR_SLAB = 1 << 16


def _lev_group(
    a_codes: np.ndarray, b_codes: np.ndarray, k: int = LEV_MAX_DIST
) -> np.ndarray:
    """Banded Levenshtein with cutoff ``k`` for P pairs of FIXED
    lengths: ``a_codes`` (P, La) / ``b_codes`` (P, Lb) uint8 char
    matrices → (P,) int32.  Cells with |i−j| > k are ≥ |i−j| > k, so
    only the (2k+1)-wide diagonal band is computed and values saturate
    at k+1 (saturation can only touch paths whose true cost already
    exceeds k — distances ≤ k are EXACT, larger ones report ≥ k+1,
    which is all the ≤ k join filter reads).  Vectorized over the pair
    axis: per row ~2 band-wide numpy ops plus a (2k+1)-step insert
    scan, vs a full Lb-wide grid."""
    P, La = a_codes.shape
    Lb = b_codes.shape[1]
    BIG = np.int32(k + 1)
    if abs(La - Lb) > k:
        return np.full(P, BIG, dtype=np.int32)
    prev = np.full((P, Lb + 1), BIG, dtype=np.int32)
    w = min(k, Lb) + 1
    prev[:, :w] = np.arange(w, dtype=np.int32)[None, :]
    for i in range(1, La + 1):
        cur = np.full((P, Lb + 1), BIG, dtype=np.int32)
        lo = max(1, i - k)
        hi = min(Lb, i + k)
        if i <= k:
            cur[:, 0] = i
        if lo > hi:
            prev = cur
            continue
        mismatch = (a_codes[:, i - 1][:, None] != b_codes[:, lo - 1 : hi]).astype(
            np.int32
        )
        band = np.minimum(prev[:, lo - 1 : hi] + mismatch, prev[:, lo : hi + 1] + 1)
        np.minimum(band, BIG, out=band)
        cur[:, lo : hi + 1] = band
        for j in range(lo, hi + 1):  # insert transition: left-to-right scan
            np.minimum(cur[:, j], cur[:, j - 1] + 1, out=cur[:, j])
        prev = cur
    return prev[:, Lb]


_LEV_SIG_SEED = 0xFEED
_LEV_SIG_BUCKETS = 64


def _deletion_signatures(
    names: list[str], ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(variant-hash uint64, id) rows for every ≤k-deletion variant of
    every name — the SymSpell candidate scheme.  COMPLETE for
    Levenshtein ≤ k: an optimal alignment with s substitutions, i
    insertions, d deletions (s+i+d ≤ k) leaves equal remainders after
    deleting s+d ≤ k chars from one string and s+i ≤ k from the other,
    so every true pair shares a variant.  Hash collisions only ADD
    candidates (the DP verify rejects them).  Vectorized: per length
    group, three prefix-sum matrices of position-keyed products give
    every single/double-deletion hash as one O(n) vector expression —
    1 + L + C(L,2) expressions, no per-variant string builds."""
    if k > 2:
        raise ValueError("deletion signatures implemented for k <= 2")
    # uint64 hash arithmetic wraps by design; silence numpy's scalar
    # overflow RuntimeWarning (would spam worker logs)
    np_err = np.seterr(over="ignore")
    try:
        return _deletion_signatures_inner(names, ids, k)
    finally:
        np.seterr(**np_err)


def _deletion_signatures_inner(
    names: list[str], ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    lens = np.asarray([len(s) for s in names], dtype=np.int64)
    Lmax = int(lens.max()) if len(lens) else 0
    R = (
        np.random.default_rng(_LEV_SIG_SEED)
        .integers(1, 2**62, size=Lmax + 2)
        .astype(np.uint64)
        | np.uint64(1)
    )
    len_r = np.uint64(0x9E3779B97F4A7C15)
    one = np.uint64(1)
    out_h: list[np.ndarray] = []
    out_i: list[np.ndarray] = []
    for L in np.unique(lens):
        L = int(L)
        sel = np.flatnonzero(lens == L)
        sid = ids[sel]
        if L == 0:
            out_h.append(np.full(len(sel), len_r * np.uint64(0)))
            out_i.append(sid)
            continue
        codes = np.zeros((len(sel), L), dtype=np.uint8)
        for r, si in enumerate(sel):
            codes[r] = np.frombuffer(
                names[si].encode("utf-8", "ignore")[:L].ljust(L), dtype=np.uint8
            )
        c = codes.astype(np.uint64)
        s0 = c * R[:L]
        s1 = c * np.concatenate([[one], R[: L - 1]])
        s2 = c * np.concatenate([[one, one], R[: max(L - 2, 0)]])

        def _csum(s):
            return np.concatenate(
                [np.zeros((len(sel), 1), np.uint64),
                 np.cumsum(s, axis=1, dtype=np.uint64)],
                axis=1,
            )

        c0, c1, c2 = _csum(s0), _csum(s1), _csum(s2)
        out_h.append(c0[:, L] + len_r * np.uint64(L))
        out_i.append(sid)
        if k >= 1:
            for i in range(L):
                out_h.append(
                    c0[:, i] + (c1[:, L] - c1[:, i + 1])
                    + len_r * np.uint64(L - 1)
                )
                out_i.append(sid)
        if k >= 2:
            for i in range(L):
                for j in range(i + 1, L):
                    out_h.append(
                        c0[:, i] + (c1[:, j] - c1[:, i + 1])
                        + (c2[:, L] - c2[:, j + 1])
                        + len_r * np.uint64(L - 2)
                    )
                    out_i.append(sid)
    return np.concatenate(out_h), np.concatenate(out_i)


def rel_customer_name_fuzzy_pairs(sf_dir: str) -> pd.DataFrame:
    """All customer pairs within Levenshtein distance ≤ 2 — fuzzy
    record linkage as SymSpell deletion-neighborhood blocking + exact
    banded-DP verification (NOT the all-pairs grid: at sf0.1 the grid
    is 1.1×10⁸ DP pairs / 63 s, the signature path verifies 1.7×10⁷
    candidates — and on realistic sparse name sets the gap grows
    quadratically; this corpus of SEQUENTIAL zero-padded ids is the
    dense worst case, with 4×10⁶ true pairs at sf0.1).

    Stages: (1) row-local vectorized signature rows; (2) 64-way
    hash-bucket pair generation (sorted segments, global pair-index
    expansion — the `_grid_pair_indices` shape, never per-variant
    groups); (3) packed-key global pair dedup in buckets; (4) verify
    against a broadcast code matrix with the banded ≤k DP in slabs.
    Names over BROADCAST_KEY_LIMIT would switch stage 4 to a hash-join
    fetch (the membership_flag rule).
    """
    import pyarrow.parquet as pq

    k = LEV_MAX_DIST
    nb = _LEV_SIG_BUCKETS
    empty = pd.DataFrame(
        {"id_a": pd.Series([], dtype="int64"),
         "id_b": pd.Series([], dtype="int64"),
         "dist": pd.Series([], dtype="int64")}
    )
    ds = ray.data.read_parquet(
        _path(sf_dir, "customer"), columns=["c_custkey", "c_name"]
    )

    def signature_rows(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["c_custkey"].to_numpy(np.int64)
        if len(ids) == 0:
            return pd.DataFrame(
                {"h": pd.Series([], dtype="uint64"),
                 "id": pd.Series([], dtype="int64"),
                 "_hb": pd.Series([], dtype="int64")}
            )
        if ids.max() >= (1 << 32):
            raise ValueError("fuzzy pairs: custkey >= 2^32 breaks pair packing")
        H, I = _deletion_signatures(b["c_name"].tolist(), ids, k)
        # per-(name, hash) dedup: one variant can arise from deleting
        # different positions of the same name
        with np.errstate(over="ignore"):
            mix = H ^ (I.astype(np.uint64) * np.uint64(0xD1B54A32D192ED03))
        _, first = np.unique(mix, return_index=True)
        H, I = H[first], I[first]
        return pd.DataFrame(
            {"h": H, "id": I, "_hb": (H % np.uint64(nb)).astype(np.int64)}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        H = g["h"].to_numpy()
        I = g["id"].to_numpy()
        order = np.argsort(H, kind="stable")
        H, I = H[order], I[order]
        new = np.concatenate([[True], H[1:] != H[:-1]])
        seg_id = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(H)))
        reps = sizes[seg_id] - (np.arange(len(H)) - starts[seg_id]) - 1
        a_idx = np.repeat(np.arange(len(H)), reps)
        within = np.arange(len(a_idx)) - np.repeat(np.cumsum(reps) - reps, reps)
        b_idx = a_idx + 1 + within
        pa_, pb_ = I[a_idx], I[b_idx]
        lo = np.minimum(pa_, pb_)
        hi = np.maximum(pa_, pb_)
        packed = (lo.astype(np.uint64) << np.uint64(32)) | hi.astype(np.uint64)
        packed = np.unique(packed[lo != hi])
        return pd.DataFrame(
            {"p": packed.view(np.int64),
             "_pb": (packed % np.uint64(nb)).astype(np.int64)}
        )

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"p": np.unique(g["p"].to_numpy())})

    # broadcast the code matrix once (dim-sized; the bloom/join switch
    # is the documented scale path for a >limit dimension)
    t = pq.read_table(_path(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    all_ids = t["c_custkey"].to_numpy()
    names = t["c_name"].to_pylist()
    if len(all_ids) == 0:
        return empty
    lens_all = np.asarray([len(s) for s in names], dtype=np.int64)
    Lmax = int(lens_all.max())
    codes_all = np.zeros((len(names), Lmax), dtype=np.uint8)
    for r, s in enumerate(names):
        raw = s.encode("utf-8", "ignore")[:Lmax]
        codes_all[r, : len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    order = np.argsort(all_ids, kind="stable")
    code_ref = ray.put(
        {"ids": all_ids[order], "lens": lens_all[order],
         "codes": codes_all[order]}
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(code_ref)
        packed = g["p"].to_numpy().view(np.uint64)
        ia = (packed >> np.uint64(32)).astype(np.int64)
        ib = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
        ra = np.searchsorted(st["ids"], ia)
        rb = np.searchsorted(st["ids"], ib)
        la, lb = st["lens"][ra], st["lens"][rb]
        out_a, out_b, out_d = [], [], []
        grp = pd.DataFrame({"la": la, "lb": lb})
        for (ga, gb), sub in grp.groupby(["la", "lb"], sort=False):
            if abs(int(ga) - int(gb)) > k:
                continue
            idx = sub.index.to_numpy()
            for s in range(0, len(idx), _LEV_PAIR_SLAB):
                sl = idx[s : s + _LEV_PAIR_SLAB]
                d = _lev_group(
                    st["codes"][ra[sl], : int(ga)],
                    st["codes"][rb[sl], : int(gb)],
                )
                ok = d <= k
                out_a.append(ia[sl][ok])
                out_b.append(ib[sl][ok])
                out_d.append(d[ok].astype(np.int64))
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64"),
                 "dist": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b),
             "dist": np.concatenate(out_d)}
        )

    out = (
        ds.map_batches(signature_rows, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("_pb")
        .map_groups(bucket_dedup, batch_format="pandas")
        .map_batches(verify, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "id_a" not in out.columns:
        return empty
    return (
        out.astype({"id_a": "int64", "id_b": "int64", "dist": "int64"})
        .sort_values(["id_a", "id_b"], kind="mergesort")
        .reset_index(drop=True)
    )


REL_CUSTOMER_NAME_FUZZY_SQL = f"""
select a.c_custkey as id_a, b.c_custkey as id_b,
       levenshtein(a.c_name, b.c_name)::BIGINT as dist
from customer a
join customer b
  on a.c_custkey < b.c_custkey
 and abs(len(a.c_name) - len(b.c_name)) <= {LEV_MAX_DIST}
where levenshtein(a.c_name, b.c_name) <= {LEV_MAX_DIST}
"""


# ---------------------------------------------------------------------------
# Skew-aware join: facts ⋈ dimension where measured-hot probe keys are
# routed to a map-side broadcast join and only the cold tail enters the
# partitioned hash join (functions/joins.py::skew_join — the "salt the
# hot keys" pattern as a named operator).  The aggregate after the join
# makes any lost/duplicated row visible to the oracle.
# ---------------------------------------------------------------------------

SKEW_JOIN_HOT_THRESHOLD = 70  # several testdata users exceed this


def rel_skew_join_segments(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.joins import skew_join

    ev = ray.data.read_parquet(_path(sf_dir, "events"), columns=["user_id", "value"])
    cust = ray.data.read_parquet(
        _path(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: b.rename(columns={"c_custkey": "user_id"}), batch_format="pandas"
    )
    joined = skew_join(ev, cust, on="user_id", hot_threshold=SKEW_JOIN_HOT_THRESHOLD)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("c_mktsegment", as_index=False).agg(
            n_events=("value", "size"), total_value=("value", "sum")
        )

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"segment": pd.Series([], dtype="object"),
             "n_events": pd.Series([], dtype="int64"),
             "total_value": pd.Series([], dtype="float64")}
        )
    agg = parts.groupby("c_mktsegment", as_index=False).agg(
        n_events=("n_events", "sum"), total_value=("total_value", "sum")
    )
    return pd.DataFrame(
        {"segment": agg["c_mktsegment"],
         "n_events": agg["n_events"].astype("int64"),
         "total_value": agg["total_value"].round(2)}
    )


REL_SKEW_JOIN_SEGMENTS_SQL = """
select c.c_mktsegment as segment, count(*)::BIGINT as n_events,
       round(sum(e.value), 2) as total_value
from events e
join customer c on e.user_id = c.c_custkey
group by c.c_mktsegment
"""


#: numeric literals inside the props JSON blobs (any digit run)
_PROPS_PATTERNS = (("num", r"\d+", "[N]"),)


def rel_event_props_scrub(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.pii import pii_scrub

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_id", "props"]
    )
    out = pii_scrub(
        ds,
        "props",
        keep_cols=["event_id"],
        out_text_col="clean_props",
        patterns=_PROPS_PATTERNS,
    ).to_pandas()
    return out.astype({"n_num": "int64"})


def _rel_event_props_scrub_sql() -> str:
    from ocr_poc_ray.functions.pii import sql_count_exprs, sql_scrub_expr

    return f"""
select event_id,
       {sql_scrub_expr('props', _PROPS_PATTERNS)} as clean_props,
       {sql_count_exprs('props', _PROPS_PATTERNS)}
from events
"""


REL_EVENT_PROPS_SCRUB_SQL = _rel_event_props_scrub_sql()


# ---------------------------------------------------------------------------
# FULL OUTER join: per-(user, day) click activity ⋈ purchase activity,
# rows surviving from EITHER side with zero-fill + presence markers
# (completes the join family: inner/broadcast, hash, left-outer, semi,
# anti, as-of, range, and now full-outer).  Both sides are partial
# per-batch counts of a narrow projection; the co-group is a bounded
# hash-bucket combine — full-outer semantics come free because any key
# with either side's partials appears in its bucket.
# ---------------------------------------------------------------------------

def rel_click_purchase_full_outer(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.dedup import _scaled_buckets

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "ts", "event_type"]
    )
    nb = _scaled_buckets(ds, floor=16)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["event_type"].isin(("click", "purchase"))]
        if b.empty:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "day_epoch": pd.Series([], dtype="int64"),
                 "n_clicks": pd.Series([], dtype="int64"),
                 "n_purchases": pd.Series([], dtype="int64")}
            )
        day = (
            b["ts"].astype("datetime64[us]").dt.floor("D").astype("int64")
            // 1_000_000
        )
        g = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(), "day_epoch": day.to_numpy(),
             "is_click": (b["event_type"] == "click").to_numpy()}
        )
        agg = g.groupby(["user_id", "day_epoch"], as_index=False).agg(
            n_clicks=("is_click", "sum"), n_total=("is_click", "size")
        )
        agg["n_purchases"] = agg["n_total"] - agg["n_clicks"]
        return agg[["user_id", "day_epoch", "n_clicks", "n_purchases"]]

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_hb=(b["user_id"] % nb).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["user_id", "day_epoch"], as_index=False).agg(
            n_clicks=("n_clicks", "sum"), n_purchases=("n_purchases", "sum")
        )
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].astype("int64"),
                "day_epoch": agg["day_epoch"].astype("int64"),
                "n_clicks": agg["n_clicks"].astype("int64"),
                "n_purchases": agg["n_purchases"].astype("int64"),
                "has_click": agg["n_clicks"].to_numpy() > 0,
                "has_purchase": agg["n_purchases"].to_numpy() > 0,
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(bucket, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas()


REL_CLICK_PURCHASE_FULL_OUTER_SQL = """
with cl as (
  select user_id, epoch_us(date_trunc('day', ts)) // 1000000 as day_epoch,
         count(*) as n
  from events where event_type = 'click' group by 1, 2
), pu as (
  select user_id, epoch_us(date_trunc('day', ts)) // 1000000 as day_epoch,
         count(*) as n
  from events where event_type = 'purchase' group by 1, 2
)
select coalesce(cl.user_id, pu.user_id) as user_id,
       coalesce(cl.day_epoch, pu.day_epoch) as day_epoch,
       coalesce(cl.n, 0)::BIGINT as n_clicks,
       coalesce(pu.n, 0)::BIGINT as n_purchases,
       (cl.user_id is not null) as has_click,
       (pu.user_id is not null) as has_purchase
from cl full outer join pu
  on cl.user_id = pu.user_id and cl.day_epoch = pu.day_epoch
"""


# ---------------------------------------------------------------------------
# Column profiler: one streaming pass over the fact table emitting
# per-column (rows, nulls, min, max) — the ingest-time data-quality
# audit.  Per-batch partials are COLUMNS × 4 scalars; the combine is a
# single tiny groupby.
# ---------------------------------------------------------------------------

PROFILE_COLUMNS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def rel_lineitem_profile(sf_dir: str) -> pd.DataFrame:
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"), columns=list(PROFILE_COLUMNS)
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in PROFILE_COLUMNS:
            v = batch[c]
            rows.append(
                {
                    "column": c,
                    "n_rows": len(v),
                    "n_null": int(v.isna().sum()),
                    "min_value": float(v.min()),
                    "max_value": float(v.max()),
                }
            )
        return pd.DataFrame(rows)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "column": [g["column"].iloc[0]],
                "n_rows": [int(g["n_rows"].sum())],
                "n_null": [int(g["n_null"].sum())],
                "min_value": [float(g["min_value"].min())],
                "max_value": [float(g["max_value"].max())],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("column")
        .map_groups(combine, batch_format="pandas")
    )
    return out.to_pandas().astype({"n_rows": "int64", "n_null": "int64"})


REL_LINEITEM_PROFILE_SQL = "\nunion all\n".join(
    f"""select '{c}' as column, count(*)::BIGINT as n_rows,
       (count(*) - count({c}))::BIGINT as n_null,
       min({c})::DOUBLE as min_value, max({c})::DOUBLE as max_value
from lineitem"""
    for c in PROFILE_COLUMNS
)


# ---------------------------------------------------------------------------
# Key-skew diagnostic: Gini coefficient + heaviest-key share of the
# per-user event distribution — the pre-shuffle audit that says whether
# a groupby/join key needs salting.  Per-user counts come from the
# bounded-bucket combine; the rank is ONE range-sort prefix scan
# (functions/prefix.py); the final fold sees only O(blocks) partial
# rows.  Integer moments are exact while n_users · total_events
# < 2^63 (past that the SQL side widens to HUGEINT and this partial
# would need a float64 or split accumulator).
# ---------------------------------------------------------------------------

def rel_user_gini(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.dedup import _scaled_buckets
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    ds = ray.data.read_parquet(_path(sf_dir, "events"), columns=["user_id"])
    nb = _scaled_buckets(ds, floor=16)

    def partial_counts(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("user_id", as_index=False).size()
        g["_hb"] = (g["user_id"] % nb).astype("int64")
        return g.rename(columns={"size": "n"})

    def combine_counts(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("user_id", as_index=False)["n"].sum()
        return agg.astype({"user_id": "int64", "n": "int64"})

    counts = (
        ds.map_batches(partial_counts, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine_counts, batch_format="pandas")
    )
    ranked = ordered_prefix_sum(
        counts, sort_cols=["n", "user_id"], value_col=None, out_col="rk"
    )

    def moments(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n"].to_numpy(np.int64)
        rk = batch["rk"].to_numpy(np.int64)
        return pd.DataFrame(
            [{"cnt": len(n), "sum_x": int(n.sum()),
              "sum_rx": int((rk * n).sum()),
              "max_n": int(n.max()) if len(n) else 0}]
        )

    p = ranked.map_batches(moments, batch_format="pandas").to_pandas()
    if p.empty:  # empty events table → no distribution to report
        return pd.DataFrame(
            {"n_users": pd.Series([], dtype="int64"),
             "total_events": pd.Series([], dtype="int64"),
             "gini": pd.Series([], dtype="float64"),
             "top_share": pd.Series([], dtype="float64")}
        )
    n_users = int(p["cnt"].sum())
    total = int(p["sum_x"].sum())
    sum_rx = int(p["sum_rx"].sum())
    gini = (2.0 * sum_rx - (n_users + 1) * total) / (n_users * total)
    return pd.DataFrame(
        [{"n_users": n_users, "total_events": total,
          "gini": round(gini, 6),
          "top_share": round(int(p["max_n"].max()) / total, 6)}]
    ).astype({"n_users": "int64", "total_events": "int64"})


REL_USER_GINI_SQL = """
with c as (
  select user_id, count(*)::BIGINT as n from events group by user_id
), r as (
  select n, row_number() over (order by n, user_id) as rk from c
)
select count(*)::BIGINT as n_users, sum(n)::BIGINT as total_events,
       round((2.0 * sum(rk * n) - (count(*) + 1) * sum(n))
             / (count(*) * sum(n)), 6) as gini,
       round(max(n)::DOUBLE / sum(n), 6) as top_share
from r
"""


# ---------------------------------------------------------------------------
# Time-decayed per-user value (recency-weighted engagement): weight
# 2^-days halves per elapsed day.  Exact cross-engine parity trick:
# powers of two are exact float64s and `value / (1 << d)` is one
# correctly-rounded IEEE division in BOTH engines — no libm pow() in
# the comparison path.  Row-local weighting + the usual partial-agg
# combine; 2-dp totals absorb summation-order ULPs (CLAUDE.md).
# ---------------------------------------------------------------------------

DECAY_REF = "2024-02-01"  # strictly after every corpus ts (Jan 2024)
_DECAY_REF_US = 1_706_745_600_000_000  # epoch_us('2024-02-01')
_DECAY_MAX_SHIFT = 62  # clamp so 1 << d stays in int64


def rel_decayed_user_value(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.dedup import _scaled_buckets

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "ts", "value"]
    )
    nb = _scaled_buckets(ds, floor=16)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        # clip BOTH sides: a ts after DECAY_REF would otherwise produce a
        # negative shift (numpy raises on negative <<; DuckDB diverges)
        d = np.clip(
            (_DECAY_REF_US - ts_us) // 86_400_000_000, 0, _DECAY_MAX_SHIFT
        )
        w = batch["value"].to_numpy() / (np.int64(1) << d)
        g = pd.DataFrame({"user_id": batch["user_id"].to_numpy(), "dv": w})
        agg = g.groupby("user_id", as_index=False)["dv"].sum()
        agg["_hb"] = (agg["user_id"] % nb).astype("int64")
        return agg

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("user_id", as_index=False)["dv"].sum()
        return pd.DataFrame(
            {
                "user_id": agg["user_id"].astype("int64"),
                "decayed_value": agg["dv"].round(2),
            }
        )

    res = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if res.empty:  # 0-row to_pandas drops columns (CLAUDE.md)
        res = pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"),
             "decayed_value": pd.Series([], dtype="float64")}
        )
    return res


REL_DECAYED_USER_VALUE_SQL = f"""
select user_id,
       round(sum(value / (1::BIGINT << least(greatest(
           (epoch_us(timestamp '{DECAY_REF}') - epoch_us(ts))
               // 86400000000, 0),
           {_DECAY_MAX_SHIFT}))), 2) as decayed_value
from events
group by user_id
"""


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def rel_event_pivot(sf_dir: str) -> pd.DataFrame:
    """Wide pivot (long → one column per event type): one row per user
    with its count of every event type plus total purchase spend — the
    feature-matrix reshape every per-entity ML table needs.  Partial
    per-batch crosstab, then the bounded hash-bucket exact combine (no
    per-user groups; bucket count is fixed, users inside a bucket are
    summed vectorized)."""
    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "event_type", "value"]
    )
    cnt_cols = [f"n_{t}" for t in _PIVOT_TYPES]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        piv = (
            b.pivot_table(index="user_id", columns="event_type",
                          values="value", aggfunc="size", fill_value=0)
            .reindex(columns=list(_PIVOT_TYPES), fill_value=0)
        )
        piv.columns = cnt_cols
        spend = (
            b[b["event_type"] == "purchase"].groupby("user_id")["value"].sum()
        )
        piv["purchase_value"] = spend.reindex(piv.index, fill_value=0.0)
        return piv.reset_index()

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(_hb=(b["user_id"] % 16).astype("int64"))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False)[
            cnt_cols + ["purchase_value"]
        ].sum()
        out["purchase_value"] = out["purchase_value"].round(2)
        return out

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(bucket, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    out = out[["user_id"] + cnt_cols + ["purchase_value"]]
    return out.astype({c: "int64" for c in ["user_id"] + cnt_cols})


REL_EVENT_PIVOT_SQL = f"""
select user_id,
       {', '.join(f"count(*) filter (event_type = '{t}')::BIGINT as n_{t}"
                  for t in _PIVOT_TYPES)},
       round(coalesce(sum(value) filter (event_type = 'purchase'), 0),
             2) as purchase_value
from events
group by user_id
"""


def rel_event_unpivot(sf_dir: str) -> pd.DataFrame:
    """Wide → long reshape (the UNPIVOT primitive): melt the per-user
    event-count matrix back to (user_id, event_type, n) rows, dropping
    zero cells.  The melt runs on the pivot's OUTPUT (user-sized — the
    bounded query result, never the fact table); the distributed work is
    the pivot pipeline it composes."""
    wide = rel_event_pivot(sf_dir)
    cnt_cols = [f"n_{t}" for t in _PIVOT_TYPES]
    long = wide.melt(
        id_vars=["user_id"], value_vars=cnt_cols,
        var_name="event_type", value_name="n",
    )
    long["event_type"] = long["event_type"].str[2:]
    long = long[long["n"] > 0]
    return (
        long.sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
        .astype({"user_id": "int64", "event_type": object, "n": "int64"})
    )


REL_EVENT_UNPIVOT_SQL = f"""
select user_id, event_type, count(*)::BIGINT as n
from events
where event_type in ({', '.join(f"'{t}'" for t in _PIVOT_TYPES)})
group by user_id, event_type
"""


_MAD_SCALE = 1.4826  # normal-consistency constant
_MAD_SIGMAS = 3.0


def rel_mad_outliers(sf_dir: str) -> pd.DataFrame:
    """Robust per-type outlier audit (median/MAD z-score — the skew-
    and heavy-tail-proof cousin of the winsorized stats): exact
    distributed median of the value, exact distributed median of the
    absolute deviation (both via the iterative range-refinement
    selection, no full sort), then one counting pass against the
    3·1.4826·MAD fence.  Keys are few (event types) but every pass
    over the values is partial-agg shaped, so the same code holds at
    any row count."""
    from ocr_poc_ray.functions.selection import exact_group_quantile_disc

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "value"]
    )
    med = exact_group_quantile_disc(
        ds, key_col="event_type", value_col="value", q=0.5
    )
    med_keys = np.sort(med["event_type"].to_numpy(object))
    med_vals = (
        med.set_index("event_type")["value"].loc[med_keys].to_numpy("float64")
    )

    def dev(b: pd.DataFrame) -> pd.DataFrame:
        idx = np.searchsorted(med_keys, b["event_type"].to_numpy(object))
        return pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(),
                "absdev": np.abs(b["value"].to_numpy("float64") - med_vals[idx]),
            }
        )

    # value-based transform: safe to recompute on the second (counting)
    # scan — no positional logic, so lazy-branch re-execution is exact
    dev_ds = ds.map_batches(dev, batch_format="pandas")
    mad = exact_group_quantile_disc(
        dev_ds, key_col="event_type", value_col="absdev", q=0.5
    )
    mad_vals = (
        mad.set_index("event_type")["value"].loc[med_keys].to_numpy("float64")
    )
    fence = _MAD_SIGMAS * _MAD_SCALE * mad_vals

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        idx = np.searchsorted(med_keys, b["event_type"].to_numpy(object))
        out = np.abs(b["value"].to_numpy("float64") - med_vals[idx]) > fence[idx]
        d = pd.DataFrame({"event_type": b["event_type"].to_numpy(),
                          "n_outliers": out.astype("int64"), "n": 1})
        return d.groupby("event_type", as_index=False).sum()

    parts = ds.map_batches(count_partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("event_type", as_index=False)[["n_outliers", "n"]].sum()
    agg = agg.merge(
        pd.DataFrame({"event_type": med_keys,
                      "median_value": np.round(med_vals, 6),
                      "mad": np.round(mad_vals, 6)}),
        on="event_type",
    )
    out = agg[["event_type", "median_value", "mad", "n_outliers", "n"]]
    return out.astype({"n_outliers": "int64", "n": "int64"})


REL_MAD_OUTLIERS_SQL = f"""
with med as (
  select event_type, quantile_disc(value, 0.5) as med
  from events group by event_type
),
dev as (
  select e.event_type, e.value, abs(e.value - m.med) as absdev, m.med
  from events e join med m using (event_type)
),
mad as (
  select event_type, quantile_disc(absdev, 0.5) as mad
  from dev group by event_type
)
select d.event_type,
       round(min(d.med), 6) as median_value,
       round(min(a.mad), 6) as mad,
       sum((d.absdev > {_MAD_SIGMAS!r} * {_MAD_SCALE!r} * a.mad)::INT)::BIGINT
           as n_outliers,
       count(*)::BIGINT as n
from dev d join mad a using (event_type)
group by d.event_type
"""


#: x for the per-type trend regression: whole days since this epoch —
#: small magnitudes keep the normal-equation products exact-ish in
#: float64 on both engines (CLAUDE.md: compute in float64, round sums).
_REGR_X0 = "2024-01-01"
_REGR_X0_US = pd.Timestamp(_REGR_X0).value // 1_000


def rel_regr_slope(sf_dir: str) -> pd.DataFrame:
    """Distributed simple linear regression (value vs event-day) per
    event type via mergeable sufficient statistics (n, Σx, Σy, Σxy,
    Σx²) — the normal-equation shape every distributed OLS/trend fit
    uses; nothing wider than 5 numbers per (batch, type) ever moves.
    Slope/intercept are derived FROM THE 2-DP-ROUNDED sums in both
    engines, so the division sees bit-identical inputs and the 6-dp
    outputs cannot diverge on summation order."""
    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "ts", "value"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = (
            (b["ts"].to_numpy("datetime64[us]").view("int64") - _REGR_X0_US)
            // 86_400_000_000
        ).astype("float64")
        y = b["value"].to_numpy("float64")
        d = pd.DataFrame(
            {"event_type": b["event_type"].to_numpy(),
             "n": 1, "sx": x, "sy": y, "sxy": x * y, "sxx": x * x}
        )
        return d.groupby("event_type", as_index=False).sum()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        n = float(g["n"].sum())
        sx, sy = round(g["sx"].sum(), 2), round(g["sy"].sum(), 2)
        sxy, sxx = round(g["sxy"].sum(), 2), round(g["sxx"].sum(), 2)
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / den
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [int(n)],
                "sum_x": [sx], "sum_y": [sy],
                "sum_xy": [sxy], "sum_xx": [sxx],
                "slope": [round(slope, 6)],
                "intercept": [round((sy - slope * sx) / n, 6)],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    return out.astype({"n": "int64"})


REL_REGR_SLOPE_SQL = f"""
with s as (
  select event_type, count(*)::BIGINT as n,
         round(sum(((epoch_us(ts) - epoch_us(timestamp '{_REGR_X0}'))
                    // 86400000000)::DOUBLE), 2) as sx,
         round(sum(value), 2) as sy,
         round(sum(((epoch_us(ts) - epoch_us(timestamp '{_REGR_X0}'))
                    // 86400000000)::DOUBLE * value), 2) as sxy,
         round(sum((((epoch_us(ts) - epoch_us(timestamp '{_REGR_X0}'))
                     // 86400000000)::DOUBLE) ^ 2), 2) as sxx
  from events
  group by event_type
)
select event_type, n, sx as sum_x, sy as sum_y, sxy as sum_xy, sxx as sum_xx,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) as slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
             6) as intercept
from s
"""


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov–Smirnov statistic between the value
# distributions of two event types — the distribution-shift gate that,
# unlike PSI (rel_value_psi), needs no binning choice: it is the max
# gap between the two empirical CDFs over the POOLED distinct values.
#
# Scale shape: per-batch (value → count_a, count_b) partials →
# value-hash-bucket combine to one row per DISTINCT value (each value
# lives wholly in one bucket, so bucket counts add) → the global
# ordered CDF via ``ordered_prefix_sum`` (one range-sort + O(blocks)
# offsets, run once per side) → per-batch max-gap partials → a
# driver max over O(blocks) scalars.  Raw events never shuffle; only
# the distinct-value projection does.
# ---------------------------------------------------------------------------

KS_TYPE_A, KS_TYPE_B = "click", "purchase"


def rel_value_ks_drift(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.dedup import _scaled_buckets
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "value"]
    )
    nb = _scaled_buckets(ds, floor=16)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["event_type"].isin((KS_TYPE_A, KS_TYPE_B))]
        df = pd.DataFrame(
            {
                "value": b["value"].to_numpy(np.float64),
                "ca": (b["event_type"] == KS_TYPE_A).to_numpy().astype(np.int64),
                "cb": (b["event_type"] == KS_TYPE_B).to_numpy().astype(np.int64),
            }
        )
        g = df.groupby("value", as_index=False).agg(
            ca=("ca", "sum"), cb=("cb", "sum")
        )
        g["_hb"] = (
            pd.util.hash_array(g["value"].to_numpy()) % nb
        ).astype(np.int64)
        return g

    def bucket_combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("value", as_index=False).agg(
            ca=("ca", "sum"), cb=("cb", "sum")
        )

    distinct = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_combine, batch_format="pandas")
        .materialize()  # read by both totals and both prefix scans
    )
    na, nb_tot = int(distinct.sum("ca")), int(distinct.sum("cb"))
    if na == 0 or nb_tot == 0:
        return pd.DataFrame(
            {"na": pd.Series([na], dtype="int64"),
             "nb": pd.Series([nb_tot], dtype="int64"),
             "ks_stat": pd.Series([0.0], dtype="float64")}
        )
    cum = ordered_prefix_sum(
        distinct, sort_cols=["value"], value_col="ca", out_col="cuma",
        unique_col="value",
    )
    cum = ordered_prefix_sum(
        cum, sort_cols=["value"], value_col="cb", out_col="cumb",
        unique_col="value",
    )

    def gap_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = np.abs(
            b["cuma"].to_numpy(np.float64) / na
            - b["cumb"].to_numpy(np.float64) / nb_tot
        )
        return pd.DataFrame({"g": [float(d.max()) if len(d) else 0.0]})

    gaps = cum.map_batches(gap_partial, batch_format="pandas").to_pandas()
    ks = float(gaps["g"].max()) if len(gaps) else 0.0
    return pd.DataFrame(
        {"na": pd.Series([na], dtype="int64"),
         "nb": pd.Series([nb_tot], dtype="int64"),
         "ks_stat": pd.Series([round(ks, 6)], dtype="float64")}
    )


REL_VALUE_KS_DRIFT_SQL = f"""
with g as (
  select value,
         count(*) filter (where event_type = '{KS_TYPE_A}')::BIGINT as ca,
         count(*) filter (where event_type = '{KS_TYPE_B}')::BIGINT as cb
  from events
  where event_type in ('{KS_TYPE_A}', '{KS_TYPE_B}')
  group by value
), c as (
  select value,
         sum(ca) over (order by value) as cuma,
         sum(cb) over (order by value) as cumb
  from g
), t as (
  select sum(ca)::BIGINT as na, sum(cb)::BIGINT as nb from g
)
select t.na, t.nb,
       round(max(abs(c.cuma::DOUBLE / t.na - c.cumb::DOUBLE / t.nb)), 6)
           as ks_stat
from c cross join t
group by t.na, t.nb
"""


# ---------------------------------------------------------------------------
# Per-type approximate quantiles via mergeable t-digests — the sketch
# path for quantiles at 100 TB (exact grouped quantiles need the value
# column to shuffle; digests ship ≤ 2δ floats per key per block).
# Approximate by construction → rows-only; rank error is bounded by
# the t-digest tests (tests/test_functions.py::test_tdigest_*).
# ---------------------------------------------------------------------------


def rel_value_tdigest(sf_dir: str) -> pd.DataFrame:
    from ocr_poc_ray.functions.sketches import tdigest_by

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_type", "value"]
    )
    out = tdigest_by(
        ds, key_col="event_type", value_col="value", qs=(0.5, 0.9, 0.99)
    )
    out = out.rename(columns={"value": "est_value"})
    out["est_value"] = np.round(out["est_value"].to_numpy(np.float64), 4)
    return out.astype({"q": "float64", "est_value": "float64"})


# ---------------------------------------------------------------------------
# Watermark late-data quarantine — the streaming-ingest guard.  The
# watermark is the running max event-time seen so far in ARRIVAL order
# minus a fixed allowed lateness; events whose timestamp falls behind
# it would miss their (already-closed) window and must be quarantined
# for backfill.  The fixture's events are written pre-sorted by ts, so
# arrival order is synthesized as the Knuth multiplicative permutation
# of event_id (odd multiplier mod 2^32 is a bijection → unique arrival
# keys; the same derivation idiom as the role/tool columns) — a
# deterministic stand-in for shuffled multi-source ingest.  The running
# max is `ordered_prefix_sum(op="max")` — one range-sort by arrival +
# an O(blocks) stitch; the watermark test and lateness are row-local.
# At 100 TB arrival order is the real ingest file/offset sequence and
# the same two-pass scan applies.
# ---------------------------------------------------------------------------

LATE_WATERMARK_S = 14 * 86_400  # allowed lateness: 14 days (corpus spans 30)


def rel_late_events(sf_dir: str) -> pd.DataFrame:
    """Events later than the watermark (running max ts over arrival
    order minus ``LATE_WATERMARK_S``), with integer lateness seconds.
    Lateness is (runmax − ts) − W, both positive by the filter, so
    DuckDB's truncating ``//`` and numpy's flooring ``//`` agree."""
    from ocr_poc_ray.functions.prefix import ordered_prefix_sum

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["event_id", "ts", "event_type"]
    )

    def to_us(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["event_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_id": ids,
                "arrival": (ids * 2654435761) % 4294967296,
                "event_type": batch["event_type"].to_numpy(dtype=object),
                "ts_us": batch["ts"]
                .to_numpy(dtype="datetime64[us]")
                .astype(np.int64),
            }
        )

    scanned = ordered_prefix_sum(
        ds.map_batches(to_us, batch_format="pandas"),
        sort_cols=["arrival"],
        value_col="ts_us",
        out_col="wm_us",
        op="max",
    )

    w_us = LATE_WATERMARK_S * 1_000_000

    def quarantine(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts_us"].to_numpy(np.int64)
        wm = batch["wm_us"].to_numpy(np.int64)
        late = ts < wm - w_us
        b = batch[late]
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(np.int64),
                "event_type": b["event_type"].to_numpy(dtype=object),
                "late_s": (wm[late] - ts[late] - w_us) // 1_000_000,
            }
        )

    out = scanned.map_batches(quarantine, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"event_id": pd.Series([], dtype="int64"),
             "event_type": pd.Series([], dtype="object"),
             "late_s": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values("event_id")
        .reset_index(drop=True)
        .astype({"event_id": "int64", "late_s": "int64"})
    )


REL_LATE_EVENTS_SQL = f"""
with w as (
  select event_id, event_type, epoch_us(ts) as ts_us,
         max(epoch_us(ts)) over (order by (event_id * 2654435761) % 4294967296
                                 rows unbounded preceding) as wm_us
  from events
)
select event_id, event_type,
       ((wm_us - ts_us - {LATE_WATERMARK_S * 1_000_000}::BIGINT)
          // 1000000)::BIGINT as late_s
from w
where ts_us < wm_us - {LATE_WATERMARK_S * 1_000_000}::BIGINT
"""


# ---------------------------------------------------------------------------
# Exact grouped count-distinct — the pattern the sketches (HLL / CM)
# approximate, done exactly: distinct (group, member) pairs via
# per-batch local dedup + a hash-bucket distinct (buckets partition
# members, so per-bucket counts ADD per group), then a bounded per-group
# sum.  Nothing member-cardinality-sized is broadcast or collected; at
# 100 TB the bucket count scales with `_scaled_buckets`.  The group
# dimension (brand) attaches via a broadcast lookup, not a join.
# ---------------------------------------------------------------------------


PACK_SUPP_BASE = 1 << 40  # suppkey < 2^40; brand codes tiny — no overflow


def rel_brand_supplier_distinct(sf_dir: str) -> pd.DataFrame:
    """Per part-brand EXACT distinct supplier count over lineitem (the
    supply-base concentration audit; TPC-H Q16 shape without the
    exclusion filters)."""
    from ocr_poc_ray.functions.dedup import _scaled_buckets

    brand_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_brand")
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"]
    )
    nb = _scaled_buckets(ds, floor=16)

    def local_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        # dedup on INTEGER (brand code, suppkey) — np.unique over a
        # packed int64, no object-string hashing in the corpus pass
        st = ray.get(brand_ref)
        keys = st["keys"]
        pos = np.minimum(
            np.searchsorted(keys, batch["l_partkey"].to_numpy()), len(keys) - 1
        )
        code = st["codes"][pos]
        supp = batch["l_suppkey"].to_numpy(np.int64)
        packed = np.unique(code * PACK_SUPP_BASE + supp)
        return pd.DataFrame(
            {
                "_code": packed // PACK_SUPP_BASE,
                "l_suppkey": packed % PACK_SUPP_BASE,
                "_hb": (packed % PACK_SUPP_BASE) % nb,
            }
        )

    def bucket_count(group: pd.DataFrame) -> pd.DataFrame:
        packed = np.unique(
            group["_code"].to_numpy(np.int64) * PACK_SUPP_BASE
            + group["l_suppkey"].to_numpy(np.int64)
        )
        codes, counts = np.unique(packed // PACK_SUPP_BASE, return_counts=True)
        return pd.DataFrame({"_code": codes, "n": counts})

    parts = (
        ds.map_batches(local_pairs, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_count, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("_code", as_index=False)["n"].sum()
    cats = ray.get(brand_ref)["cats"]
    out = pd.DataFrame(
        {
            "p_brand": cats[agg["_code"].to_numpy(np.int64)],
            "n_suppliers": agg["n"].to_numpy(np.int64),
        }
    )
    return (
        out.sort_values("p_brand", kind="mergesort")
        .reset_index(drop=True)
        .astype({"n_suppliers": "int64"})
    )


REL_BRAND_SUPPLIER_DISTINCT_SQL = """
select p_brand, count(distinct l_suppkey)::BIGINT as n_suppliers
from lineitem join part on l_partkey = p_partkey
group by p_brand
"""


# ---------------------------------------------------------------------------
# Sole-late-supplier audit — the TPC-H Q21 shape (EXISTS + NOT EXISTS
# against the same fact table) on the columns this schema has: credit
# a supplier for every multi-supplier order where THEY shipped late
# (ship > orderdate + 30 days) and every other supplier shipped on
# time.  The only big-big exchange is the lineitem⋈orders hash join
# (orderdate attach); per-order logic runs in hash buckets of
# orderkey — (order, supplier, late) pairs packed into one int64, so
# the dual-exists reduces to np.unique + reduceat segment scans, no
# per-order pandas groups.
# ---------------------------------------------------------------------------

# NOTE: this constant must NOT be named LATE_SHIP_DAYS — a later section
# defines LATE_SHIP_DAYS = 60 (shipmode priority), and the kernel reads
# module globals at CALL time while the SQL f-string bakes the value at
# IMPORT time; the shadow silently desynced kernel (60) from oracle (30).
SOLE_LATE_DAYS = 30
_PACK_SUPP_BITS = 20  # suppkey < 2^20; orderkey < 2^43 — packs in int64


def rel_sole_late_supplier(sf_dir: str) -> pd.DataFrame:
    """(s_name, n_waiting): per supplier, the count of orders with ≥2
    distinct suppliers where they were the ONLY late shipper."""
    name_ref = _broadcast_lookup(sf_dir, "supplier", "s_suppkey", "s_name")
    n_buckets = 16
    late_us = SOLE_LATE_DAYS * 86_400_000_000

    li = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"]
    )

    def li_project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
                "ship_us": b["l_shipdate"]
                .to_numpy(dtype="datetime64[us]")
                .astype(np.int64),
            }
        )

    joined = li.map_batches(li_project, batch_format="pandas").join(
        orders, "inner", num_partitions=8,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        ok = b["l_orderkey"].to_numpy(np.int64)
        sk = b["l_suppkey"].to_numpy(np.int64)
        late = (
            b["ship_us"].to_numpy(np.int64)
            - b["o_orderdate"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        ) > late_us
        # one row per (order, supplier) with the batch-local late max:
        # pack pair into int64, unique, OR lateness via reduceat on the
        # sorted pack order
        pack = (ok << _PACK_SUPP_BITS) | sk
        order_idx = np.argsort(pack, kind="stable")
        ps, ls = pack[order_idx], late[order_idx]
        u, starts = np.unique(ps, return_index=True)
        any_late = np.maximum.reduceat(ls.astype(np.int64), starts)
        return pd.DataFrame(
            {
                "pair": u,
                "late": any_late,
                "_hb": (u >> _PACK_SUPP_BITS) % n_buckets,
            }
        )

    def bucket_winners(g: pd.DataFrame) -> pd.DataFrame:
        pack = g["pair"].to_numpy(np.int64)
        late = g["late"].to_numpy(np.int64)
        order_idx = np.argsort(pack, kind="stable")
        ps, ls = pack[order_idx], late[order_idx]
        u, starts = np.unique(ps, return_index=True)
        pair_late = np.maximum.reduceat(ls, starts)  # cross-batch OR
        okey = u >> _PACK_SUPP_BITS
        o_starts = np.unique(okey, return_index=True)[1]
        n_supp = np.diff(np.append(o_starts, len(okey)))
        n_late = np.add.reduceat(pair_late, o_starts)
        # qualifying orders: ≥2 suppliers, exactly one of them late
        good = (n_supp >= 2) & (n_late == 1)
        if not good.any():
            return pd.DataFrame({"l_suppkey": pd.Series([], dtype="int64")})
        # the late pair inside each qualifying order's segment
        seg_id = np.repeat(np.arange(len(o_starts)), n_supp)
        take = pair_late.astype(bool) & good[seg_id]
        return pd.DataFrame(
            {"l_suppkey": (u[take] & ((1 << _PACK_SUPP_BITS) - 1))}
        )

    winners = (
        joined.map_batches(pair_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_winners, batch_format="pandas")
        .to_pandas()
    )
    if winners.empty:
        return pd.DataFrame(
            {"s_name": pd.Series([], dtype=object),
             "n_waiting": pd.Series([], dtype="int64")}
        )
    sk = winners["l_suppkey"].to_numpy(np.int64)
    u, c = np.unique(sk, return_counts=True)
    names, _ = _lookup(ray.get(name_ref), u)
    out = pd.DataFrame({"s_name": names, "n_waiting": c.astype(np.int64)})
    return (
        out.sort_values("s_name", kind="mergesort")
        .reset_index(drop=True)
        .astype({"n_waiting": "int64"})
    )


REL_SOLE_LATE_SUPPLIER_SQL = f"""
with l as (
  select l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + interval {SOLE_LATE_DAYS} day) as late
  from lineitem join orders on l_orderkey = o_orderkey
), per as (
  select l_orderkey, l_suppkey, max(late::int) as late
  from l group by l_orderkey, l_suppkey
), o as (
  select l_orderkey, count(*) as n_supp, sum(late) as n_late
  from per group by l_orderkey
), w as (
  select per.l_suppkey
  from per join o using (l_orderkey)
  where o.n_supp >= 2 and o.n_late = 1 and per.late = 1
)
select s_name, count(*)::BIGINT as n_waiting
from w join supplier on l_suppkey = s_suppkey
group by s_name
"""


# ---------------------------------------------------------------------------
# Customer order-count distribution — TPC-H Q13: how many customers
# placed exactly k orders, INCLUDING k = 0 (the left-outer zero rows
# are the point of the query).  Same join shape as
# rel_customer_order_counts; the histogram is a second per-batch
# partial (count-of-counts ≤ max-k rows per batch) + a tiny combine,
# so the per-customer counts never reach the driver.
# ---------------------------------------------------------------------------


def rel_order_count_histogram(sf_dir: str) -> pd.DataFrame:
    """(n_orders, n_customers) distribution with the zero bucket."""
    orders = ray.data.read_parquet(_path(sf_dir, "orders"), columns=["o_custkey"])

    def agg_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False).size().rename(columns={"size": "pn"})
        g["_hb"] = (g["o_custkey"] % 16).astype("int64")
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_custkey", as_index=False)["pn"].sum()

    counts = (
        orders.map_batches(agg_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(combine, batch_format="pandas")
        .repartition(8)
    )
    cust = ray.data.read_parquet(
        _path(sf_dir, "customer"), columns=["c_custkey"]
    ).repartition(8)
    joined = cust.join(
        counts, "left_outer", num_partitions=8,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b["pn"].fillna(0).astype("int64").to_numpy()
        u, c = np.unique(k, return_counts=True)
        return pd.DataFrame({"n_orders": u, "n_customers": c})

    parts = joined.map_batches(hist_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"n_orders": pd.Series([], dtype="int64"),
             "n_customers": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("n_orders", as_index=False)["n_customers"].sum()
    return (
        out.sort_values("n_orders", kind="mergesort")
        .reset_index(drop=True)
        .astype({"n_orders": "int64", "n_customers": "int64"})
    )


REL_ORDER_COUNT_HISTOGRAM_SQL = """
with c as (
  select c_custkey, count(o_orderkey) as n_orders
  from customer left join orders on c_custkey = o_custkey
  group by c_custkey
)
select n_orders::BIGINT as n_orders, count(*)::BIGINT as n_customers
from c group by n_orders
"""


# ---------------------------------------------------------------------------
# Bulk orders — TPC-H Q18 (large-volume customers): orders whose total
# line quantity exceeds a threshold, with the customer attached.  The
# HAVING-over-a-fact-groupby shape: per-batch (orderkey, qty) partials
# → bounded-bucket exact combine → the row-local HAVING filter shrinks
# the set to the tail BEFORE the orders join — prune at the exchange.
# Quantities are small integers stored as doubles, so float64 sums are
# exact and the > comparison cannot sit on a rounding boundary.
# ---------------------------------------------------------------------------

BULK_ORDER_MIN_QTY = 250


def rel_bulk_orders(sf_dir: str) -> pd.DataFrame:
    """(c_name, o_orderkey, o_totalprice, sum_qty) for orders with
    total quantity > ``BULK_ORDER_MIN_QTY``."""
    li = ray.data.read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"]
    )

    def qty_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("l_orderkey", as_index=False).agg(q=("l_quantity", "sum"))
        g["_hb"] = (g["l_orderkey"] % 16).astype("int64")
        return g

    def qty_combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("l_orderkey", as_index=False)["q"].sum()
        return agg[agg["q"] > BULK_ORDER_MIN_QTY]  # HAVING before the join

    bulky = (
        li.map_batches(qty_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(qty_combine, batch_format="pandas")
        .repartition(8)
    )
    orders = ray.data.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).repartition(8)
    name_ref = _broadcast_lookup(sf_dir, "customer", "c_custkey", "c_name")
    joined = orders.join(
        bulky, "inner", num_partitions=8,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        names, _ = _lookup(ray.get(name_ref), b["o_custkey"].to_numpy())
        return pd.DataFrame(
            {
                "c_name": names,
                "o_orderkey": b["o_orderkey"].to_numpy(np.int64),
                "o_totalprice": np.round(b["o_totalprice"].to_numpy(), 2),
                "sum_qty": np.rint(b["q"].to_numpy()).astype(np.int64),
            }
        )

    out = joined.map_batches(finish, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"c_name": pd.Series([], dtype=object),
             "o_orderkey": pd.Series([], dtype="int64"),
             "o_totalprice": pd.Series([], dtype="float64"),
             "sum_qty": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values("o_orderkey", kind="mergesort")
        .reset_index(drop=True)
        .astype({"o_orderkey": "int64", "o_totalprice": "float64",
                 "sum_qty": "int64"})
    )


REL_BULK_ORDERS_SQL = f"""
with q as (
  select l_orderkey, sum(l_quantity) as sq
  from lineitem group by l_orderkey
  having sum(l_quantity) > {BULK_ORDER_MIN_QTY}
)
select c_name, o_orderkey,
       round(o_totalprice, 2) as o_totalprice,
       sq::BIGINT as sum_qty
from q join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Interval-union coverage — per user, the total wall-time covered by
# the UNION of their activity intervals (event start, duration =
# `value` seconds) and the island count: the classic sweep (sort by
# start, running max of ends, new island when a start clears the
# running max) that session windows can't express because intervals
# OVERLAP.  One range-sort; islands and coverage are vectorized pandas
# group cummax/shift inside the edge kernel; everything integer µs
# (duration = cents × 10⁴, exact on both engines).
# ---------------------------------------------------------------------------


def rel_user_coverage_time(sf_dir: str) -> pd.DataFrame:
    """(user_id, n_islands, covered_s) over the interval union."""
    from ocr_poc_ray.functions.windows import keyed_sorted_match

    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "ts", "value"]
    )

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        dur = np.rint(batch["value"].to_numpy() * 100).astype(np.int64) * 10_000
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(np.int64),
                "s_us": s,
                "e_us": s + dur,
            }
        )

    narrow = ds.map_batches(project, batch_format="pandas")

    def _match(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["user_id", "s_us", "e_us"], kind="mergesort")
        by = g.groupby("user_id", sort=False)
        prev_max = by["e_us"].cummax().groupby(g["user_id"], sort=False).shift(1)
        brk = prev_max.isna() | (g["s_us"] > prev_max)
        island = brk.cumsum()  # global ids; unique per user by the start-break
        gi = g.assign(_island=island).groupby(
            ["user_id", "_island"], as_index=False, sort=False
        ).agg(s=("s_us", "min"), e=("e_us", "max"))
        gi["c"] = gi["e"] - gi["s"]
        out = gi.groupby("user_id", as_index=False, sort=False).agg(
            n_islands=("_island", "size"), covered_us=("c", "sum")
        )
        return pd.DataFrame(
            {
                "user_id": out["user_id"].to_numpy(np.int64),
                "n_islands": out["n_islands"].to_numpy(np.int64),
                "covered_s": out["covered_us"].to_numpy(np.int64) // 1_000_000,
            }
        )

    out = keyed_sorted_match(
        narrow,
        key_col="user_id",
        sort_cols=["s_us", "e_us"],
        in_cols=["user_id", "s_us", "e_us"],
        match_fn=_match,
        out_meta={"user_id": "int64", "n_islands": "int64", "covered_s": "int64"},
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"),
             "n_islands": pd.Series([], dtype="int64"),
             "covered_s": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values("user_id", kind="mergesort")
        .reset_index(drop=True)
        .astype({"user_id": "int64", "n_islands": "int64", "covered_s": "int64"})
    )


REL_USER_COVERAGE_TIME_SQL = """
with iv as (
  select user_id, epoch_us(ts) as s,
         epoch_us(ts) + round(value * 100)::BIGINT * 10000 as e
  from events
), o as (
  select user_id, s, e,
         max(e) over (partition by user_id order by s, e
                      rows between unbounded preceding and 1 preceding)
           as prev_max
  from iv
), g as (
  select user_id, s, e,
         sum(case when prev_max is null or s > prev_max then 1 else 0 end)
           over (partition by user_id order by s, e
                 rows unbounded preceding) as island
  from o
), i as (
  select user_id, island, max(e) - min(s) as cov
  from g group by user_id, island
)
select user_id, count(*)::BIGINT as n_islands,
       (sum(cov) // 1000000)::BIGINT as covered_s
from i group by user_id
"""


# ---------------------------------------------------------------------------
# TPC-H shape wave 4: Q14 / Q17 / Q11 / Q19 / Q15 / Q22 analogs over the
# driver tables (no partsupp in the corpus, so Q2/Q11/Q20's partsupp side
# is re-expressed over lineitem).  All follow the engine's fact-scan
# shapes: broadcast dimension lookups inside the lineitem scan, per-batch
# partial aggregation, one bounded combine; money totals use the
# integer-cents convention where the oracle compares an argmax/HAVING
# boundary (summation-order noise must not flip a comparison).
# ---------------------------------------------------------------------------


def rel_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: per ship-month, promotional revenue vs total.

    (ym, promo_revenue, total_revenue, n_lines) with ym = year*100+month.
    p_type arrives via the broadcast partkey lookup inside the lineitem
    scan; months are a bounded dimension (~84), so the final combine is
    a tiny per-month groupby.
    """
    type_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_type")
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ptype, hit = _lookup(ray.get(type_ref), batch["l_partkey"].to_numpy())
        idx = pd.DatetimeIndex(batch["l_shipdate"])
        ym = (idx.year.to_numpy() * 100 + idx.month.to_numpy()).astype(np.int64)
        # exact integer micents: cents x (100 - discount_pct) — a 2-dp
        # rounded float SUM hit a boundary here (52659.425), so the money
        # path is integer end-to-end
        cents = np.rint(batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(batch["l_discount"].to_numpy() * 100).astype(np.int64)
        mc = cents * (100 - dpct)
        b = pd.DataFrame(
            {
                "ym": ym[hit],
                "promo": np.where(ptype[hit] == "PROMO", mc[hit], 0),
                "mc": mc[hit],
            }
        )
        return b.groupby("ym", as_index=False).agg(
            promo=("promo", "sum"), mc=("mc", "sum"), n=("mc", "size")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "ym": [int(group["ym"].iloc[0])],
                "promo_micents": [int(group["promo"].sum())],
                "total_micents": [int(group["mc"].sum())],
                "n_lines": [int(group["n"].sum())],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("ym")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"ym": pd.Series([], dtype="int64"),
             "promo_micents": pd.Series([], dtype="int64"),
             "total_micents": pd.Series([], dtype="int64"),
             "n_lines": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values("ym", kind="mergesort").reset_index(drop=True)
        .astype({"ym": "int64", "promo_micents": "int64",
                 "total_micents": "int64", "n_lines": "int64"})
    )


REL_PROMO_REVENUE_SQL = """
select (year(l_shipdate) * 100 + month(l_shipdate))::BIGINT as ym,
       sum(case when p_type = 'PROMO'
                then cast(round(l_extendedprice * 100) as bigint)
                     * (100 - cast(round(l_discount * 100) as bigint))
                else 0 end)::BIGINT as promo_micents,
       sum(cast(round(l_extendedprice * 100) as bigint)
           * (100 - cast(round(l_discount * 100) as bigint)))::BIGINT
         as total_micents,
       count(*)::BIGINT as n_lines
from lineitem join part on l_partkey = p_partkey
group by 1
"""


def rel_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below 20 %
    of the part's average ordered quantity, rolled up per brand.

    Pass 1 builds the per-part (sum_qty, n) via per-batch partials and a
    bounded hash-bucket combine; the result is part-dimension-sized, so
    it broadcasts (at 100 TB with a fact-sized part dimension this flips
    to the partitioned-join shape of rel_mktsegment_revenue_hashjoin).
    The 0.2*avg comparison is float64-exact on both engines: quantity
    sums are integer-valued doubles, so sum/count is bit-identical
    regardless of summation order.
    """
    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    ds = ray.data.read_parquet(_path(sf_dir, "lineitem"), columns=li_cols)

    def qty_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("l_partkey", as_index=False).agg(
            sq=("l_quantity", "sum"), n=("l_quantity", "size")
        )
        g["_hb"] = (g["l_partkey"] % 16).astype("int64")
        return g

    def qty_combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("l_partkey", as_index=False).agg(
            sq=("sq", "sum"), n=("n", "sum")
        )
        agg["avg_qty"] = agg["sq"] / agg["n"]
        return agg[["l_partkey", "avg_qty"]]

    avg_df = (
        ds.map_batches(qty_partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(qty_combine, batch_format="pandas")
        .to_pandas()
    )
    pk = avg_df["l_partkey"].to_numpy(np.int64)
    order = np.argsort(pk, kind="stable")
    avg_ref = ray.put((pk[order], avg_df["avg_qty"].to_numpy(np.float64)[order]))
    brand_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_brand")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys, avgs = ray.get(avg_ref)
        part = batch["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(keys, part)
        pos = np.clip(pos, 0, len(keys) - 1)
        avg = np.where(keys[pos] == part, avgs[pos], np.inf)
        small = batch["l_quantity"].to_numpy() < 0.2 * avg
        brand, hit = _lookup(ray.get(brand_ref), part)
        m = small & hit
        b = pd.DataFrame(
            {"p_brand": brand[m],
             "price": batch["l_extendedprice"].to_numpy()[m]}
        )
        return b.groupby("p_brand", as_index=False).agg(
            price=("price", "sum"), n=("price", "size")
        )

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_brand": [group["p_brand"].iloc[0]],
                "small_qty_price": [round(group["price"].sum(), 2)],
                "n_lines": [int(group["n"].sum())],
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("p_brand")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"p_brand": pd.Series([], dtype=object),
             "small_qty_price": pd.Series([], dtype="float64"),
             "n_lines": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values("p_brand", kind="mergesort").reset_index(drop=True)
        .astype({"small_qty_price": "float64", "n_lines": "int64"})
    )


REL_SMALL_QTY_REVENUE_SQL = """
with pa as (
  select l_partkey as pk, sum(l_quantity) / count(*) as avg_qty
  from lineitem group by 1
)
select p_brand,
       round(sum(l_extendedprice), 2) as small_qty_price,
       count(*)::BIGINT as n_lines
from lineitem
join pa on l_partkey = pk
join part on l_partkey = p_partkey
where l_quantity < 0.2 * avg_qty
group by p_brand
"""


def rel_supplier_value_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 shape: suppliers whose lineitem value exceeds half the
    even share of the corpus total (HAVING vs a global scalar).

    Value is integer cents (round(price*100) is exact for 2-dp money),
    so the HAVING comparison and the ppm share are immune to
    summation-order noise.  The supplier dimension is bounded, so the
    combined frame is dimension-sized; the global total is its sum.
    """
    n_suppliers = int(
        ray.data.read_parquet(
            _path(sf_dir, "supplier"), columns=["s_suppkey"]
        ).count()
    )
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_suppkey", "l_extendedprice"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame({"s": b["l_suppkey"].to_numpy(np.int64), "c": cents})
        g = g.groupby("s", as_index=False)["c"].sum()
        g["_hb"] = (g["s"] % 16).astype("int64")
        return g

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("s", as_index=False)["c"].sum()

    sup = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(comb, batch_format="pandas")
        .to_pandas()
    )
    if sup.empty:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"),
             "value": pd.Series([], dtype="float64"),
             "share_ppm": pd.Series([], dtype="int64")}
        )
    total = int(sup["c"].sum())
    keep = sup[sup["c"].to_numpy() * np.int64(2 * n_suppliers) > total]
    out = pd.DataFrame(
        {
            "s_suppkey": keep["s"].to_numpy(np.int64),
            "value": np.round(keep["c"].to_numpy(np.int64) / 100.0, 2),
            "share_ppm": keep["c"].to_numpy(np.int64) * 1_000_000 // total,
        }
    )
    return (
        out.sort_values("s_suppkey", kind="mergesort").reset_index(drop=True)
        .astype({"s_suppkey": "int64", "value": "float64", "share_ppm": "int64"})
    )


REL_SUPPLIER_VALUE_SHARE_SQL = """
with v as (
  select l_suppkey,
         sum(cast(round(l_extendedprice * 100) as bigint)) as c
  from lineitem group by 1
), t as (select sum(c) as total from v),
     ns as (select count(*) as n from supplier)
select l_suppkey as s_suppkey,
       round(c / 100.0, 2) as value,
       (c * 1000000 // total)::BIGINT as share_ppm
from v, t, ns
where c * 2 * n > total
"""


# Q19-shape disjunctive branches: (brand, size range, quantity range)
DISJUNCTIVE_BRANCHES = (
    ("Brand#11", 1, 15, 1, 20),
    ("Brand#21", 10, 30, 5, 30),
    ("Brand#23", 20, 50, 10, 40),
)


def rel_disjunctive_parts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: one global (revenue, n_lines) over an OR of
    three (brand AND size-range AND quantity-range) conjunctions.

    Part attributes (brand, size) ride broadcast lookups into the
    lineitem scan; the disjunction is a vectorized mask, and the final
    combine is a single-row sum — zero exchange beyond the partials.
    """
    brand_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_brand")
    size_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_size")
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        part = batch["l_partkey"].to_numpy(np.int64)
        brand, hit_b = _lookup(ray.get(brand_ref), part)
        size, hit_s = _lookup(ray.get(size_ref), part)
        size = size.astype(np.int64, copy=False)
        qty = batch["l_quantity"].to_numpy()
        mask = np.zeros(len(part), dtype=bool)
        for br, s_lo, s_hi, q_lo, q_hi in DISJUNCTIVE_BRANCHES:
            mask |= (
                (brand == br)
                & (size >= s_lo) & (size <= s_hi)
                & (qty >= q_lo) & (qty <= q_hi)
            )
        mask &= hit_b & hit_s
        rev = (
            batch["l_extendedprice"].to_numpy()
            * (1.0 - batch["l_discount"].to_numpy())
        )[mask]
        return pd.DataFrame({"rev": [rev.sum()], "n": [int(mask.sum())]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return pd.DataFrame(
        {
            "revenue": [round(float(parts["rev"].sum()), 2)],
            "n_lines": [int(parts["n"].sum())],
        }
    ).astype({"revenue": "float64", "n_lines": "int64"})


_DISJ_PRED = " or ".join(
    f"(p_brand = '{br}' and p_size between {s_lo} and {s_hi}"
    f" and l_quantity between {q_lo} and {q_hi})"
    for br, s_lo, s_hi, q_lo, q_hi in DISJUNCTIVE_BRANCHES
)

REL_DISJUNCTIVE_PARTS_SQL = f"""
select round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
       count(*)::BIGINT as n_lines
from lineitem join part on l_partkey = p_partkey
where {_DISJ_PRED}
"""


TOP_SUPPLIER_SHIP_CUTOFF = "2000-01-01"


def rel_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over the
    recent ship window (ties all returned — the reason Q15 is a view,
    not a LIMIT 1).

    Revenue is exact integer micents (cents x (100 - discount_pct)), so
    the argmax can never be flipped by float summation order.  The
    supplier dimension is bounded; names ride a broadcast lookup.
    """
    name_ref = _broadcast_lookup(sf_dir, "supplier", "s_suppkey", "s_name")
    cutoff = np.datetime64(TOP_SUPPLIER_SHIP_CUTOFF, "us")
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keep = b["l_shipdate"].to_numpy(dtype="datetime64[us]") >= cutoff
        cents = np.rint(
            b["l_extendedprice"].to_numpy()[keep] * 100
        ).astype(np.int64)
        dpct = np.rint(b["l_discount"].to_numpy()[keep] * 100).astype(np.int64)
        g = pd.DataFrame(
            {
                "s": b["l_suppkey"].to_numpy(np.int64)[keep],
                "mc": cents * (100 - dpct),
            }
        )
        g = g.groupby("s", as_index=False)["mc"].sum()
        g["_hb"] = (g["s"] % 16).astype("int64")
        return g

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("s", as_index=False)["mc"].sum()

    sup = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(comb, batch_format="pandas")
        .to_pandas()
    )
    if sup.empty:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"),
             "s_name": pd.Series([], dtype=object),
             "revenue_micents": pd.Series([], dtype="int64")}
        )
    best = int(sup["mc"].max())
    top = sup[sup["mc"] == best]
    names, _ = _lookup(ray.get(name_ref), top["s"].to_numpy(np.int64))
    out = pd.DataFrame(
        {
            "s_suppkey": top["s"].to_numpy(np.int64),
            "s_name": names,
            "revenue_micents": top["mc"].to_numpy(np.int64),
        }
    )
    return (
        out.sort_values("s_suppkey", kind="mergesort").reset_index(drop=True)
        .astype({"s_suppkey": "int64", "revenue_micents": "int64"})
    )


REL_TOP_SUPPLIER_SQL = f"""
with r as (
  select l_suppkey,
         sum(cast(round(l_extendedprice * 100) as bigint)
             * (100 - cast(round(l_discount * 100) as bigint))) as mc
  from lineitem
  where l_shipdate >= timestamp '{TOP_SUPPLIER_SHIP_CUTOFF}'
  group by 1
)
select l_suppkey as s_suppkey, s_name, mc::BIGINT as revenue_micents
from r join supplier on l_suppkey = s_suppkey
where mc = (select max(mc) from r)
"""


BAL_AUDIT_MIN_PRICE = 400_000.0


def rel_balance_audit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape: per nation, the count and total balance of
    above-average-balance customers with no large order.

    The global positive-balance average is two scalars (cents sum +
    count) from a partial pass; the comparison runs as integer cents x
    count > total-cents, so it cannot be flipped by float noise.  The
    anti-join is the engine's bucketed co-group (neither side is
    collected or broadcast); acctbal rides the customer keys.
    """
    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    cust_ds = ray.data.read_parquet(_path(sf_dir, "customer"), columns=cust_cols)

    def bal_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["c_acctbal"].to_numpy() * 100).astype(np.int64)
        pos = cents[cents > 0]
        return pd.DataFrame({"tot": [int(pos.sum())], "n": [len(pos)]})

    scal = cust_ds.map_batches(bal_partial, batch_format="pandas").to_pandas()
    total_cents, n_pos = int(scal["tot"].sum()), int(scal["n"].sum())
    if n_pos == 0:
        return pd.DataFrame(
            {"c_nationkey": pd.Series([], dtype="int64"),
             "n_custs": pd.Series([], dtype="int64"),
             "total_acctbal": pd.Series([], dtype="float64")}
        )

    def tag_cust(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(batch["c_acctbal"].to_numpy() * 100).astype(np.int64)
        rich = cents * np.int64(n_pos) > total_cents
        return pd.DataFrame(
            {
                "k": batch["c_custkey"].to_numpy(np.int64)[rich],
                "nat": batch["c_nationkey"].to_numpy(np.int64)[rich],
                "cents": cents[rich],
                "src": np.int8(0),
                "bucket": (
                    batch["c_custkey"].to_numpy(np.int64)[rich] % ANTI_JOIN_BUCKETS
                ),
            }
        )

    def tag_orders(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch.loc[
            batch["o_totalprice"] > BAL_AUDIT_MIN_PRICE, "o_custkey"
        ].drop_duplicates()
        return pd.DataFrame(
            {
                "k": k.to_numpy(np.int64),
                "nat": np.int64(-1),
                "cents": np.int64(0),
                "src": np.int8(1),
                "bucket": (k.to_numpy(np.int64) % ANTI_JOIN_BUCKETS),
            }
        )

    cust = cust_ds.map_batches(tag_cust, batch_format="pandas")
    orders = ray.data.read_parquet(
        _path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(tag_orders, batch_format="pandas")

    def anti(group: pd.DataFrame) -> pd.DataFrame:
        have = group.loc[group["src"] == 1, "k"].unique()
        keep = group[(group["src"] == 0) & ~group["k"].isin(have)]
        return keep.groupby("nat", as_index=False).agg(
            n_custs=("k", "size"), cents=("cents", "sum")
        )

    out = (
        cust.union(orders)
        .groupby("bucket")
        .map_groups(anti, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "nat" not in out.columns:
        return pd.DataFrame(
            {"c_nationkey": pd.Series([], dtype="int64"),
             "n_custs": pd.Series([], dtype="int64"),
             "total_acctbal": pd.Series([], dtype="float64")}
        )
    fin = out.groupby("nat", as_index=False).agg(
        n_custs=("n_custs", "sum"), cents=("cents", "sum")
    )
    res = pd.DataFrame(
        {
            "c_nationkey": fin["nat"].to_numpy(np.int64),
            "n_custs": fin["n_custs"].to_numpy(np.int64),
            "total_acctbal": np.round(fin["cents"].to_numpy(np.int64) / 100.0, 2),
        }
    )
    return (
        res.sort_values("c_nationkey", kind="mergesort").reset_index(drop=True)
        .astype({"c_nationkey": "int64", "n_custs": "int64",
                 "total_acctbal": "float64"})
    )


REL_BALANCE_AUDIT_SQL = f"""
with cb as (
  select c_custkey, c_nationkey,
         cast(round(c_acctbal * 100) as bigint) as cents
  from customer
), avgp as (
  select sum(cents) as total, count(*) as n from cb where cents > 0
)
select c_nationkey::BIGINT as c_nationkey,
       count(*)::BIGINT as n_custs,
       round(sum(cents) / 100.0, 2) as total_acctbal
from cb, avgp
where cents * n > total
  and not exists (select 1 from orders o
                  where o.o_custkey = cb.c_custkey
                    and o.o_totalprice > {BAL_AUDIT_MIN_PRICE})
group by c_nationkey
"""


def _broadcast_orders_cust_year(sf_dir: str):
    """Broadcast o_orderkey → (o_custkey, order year) as sorted numpy
    arrays — ONE driver-side read of the three columns serves both Q8/Q9
    lookups.  At test scale orders broadcasts like any dimension; at
    100 TB orders is fact-sized and this flips to the partitioned-join
    shape of ``rel_mktsegment_revenue_hashjoin`` (see MIGRATION.md)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        _path(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    keys = t["o_orderkey"].to_numpy()
    order = np.argsort(keys, kind="mergesort")
    years = pd.DatetimeIndex(t["o_orderdate"].to_pandas()).year.to_numpy()
    return ray.put(
        {
            "keys": keys[order],
            "cust": t["o_custkey"].to_numpy()[order],
            "year": years.astype(np.int64)[order],
        }
    )


def _orders_lookup(state, arr: np.ndarray):
    """(custkey, year, hit_mask) for orderkeys against the broadcast."""
    keys = state["keys"]
    pos = np.searchsorted(keys, arr)
    pos = np.clip(pos, 0, len(keys) - 1)
    hit = keys[pos] == arr
    return state["cust"][pos], state["year"][pos], hit


MKT_SHARE_REGION = "ASIA"
MKT_SHARE_PTYPE = "STANDARD"
MKT_SHARE_NATION = "NATION_3"


def rel_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape: per order year, the share of STANDARD-part revenue
    in the ASIA customer market supplied from NATION_3.

    All five dimension hops (orderkey→cust/year, cust→nation,
    nation→region→name, supp→nation→name, part→type) are broadcast
    sorted-array lookups inside the lineitem scan; years are a ~7-value
    dimension so the combine is tiny.  share_ppm is exact integer
    arithmetic (micents × 1e6 // micents) — no float rounding boundary.
    """
    ord_ref = _broadcast_orders_cust_year(sf_dir)
    cnat_ref = _broadcast_lookup(sf_dir, "customer", "c_custkey", "c_nationkey")
    nreg_ref = _broadcast_lookup(sf_dir, "nation", "n_nationkey", "n_regionkey")
    rname_ref = _broadcast_lookup(sf_dir, "region", "r_regionkey", "r_name")
    snat_ref = _broadcast_lookup(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    nname_ref = _broadcast_lookup(sf_dir, "nation", "n_nationkey", "n_name")
    ptype_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_type")
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ptype, hp = _lookup(ray.get(ptype_ref), b["l_partkey"].to_numpy())
        keep = hp & (ptype == MKT_SHARE_PTYPE)
        if not keep.any():
            return pd.DataFrame(
                {"o_year": pd.Series([], dtype="int64"),
                 "num": pd.Series([], dtype="int64"),
                 "den": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        okey = b["l_orderkey"].to_numpy()[keep]
        cust, year, h1 = _orders_lookup(ray.get(ord_ref), okey)
        cnat, h2 = _lookup(ray.get(cnat_ref), cust)
        creg, h3 = _lookup(ray.get(nreg_ref), cnat)
        rname, h4 = _lookup(ray.get(rname_ref), creg)
        in_mkt = h1 & h2 & h3 & h4 & (rname == MKT_SHARE_REGION)
        snat, h5 = _lookup(ray.get(snat_ref), b["l_suppkey"].to_numpy()[keep])
        sname, h6 = _lookup(ray.get(nname_ref), snat)
        cents = np.rint(b["l_extendedprice"].to_numpy()[keep] * 100).astype(np.int64)
        dpct = np.rint(b["l_discount"].to_numpy()[keep] * 100).astype(np.int64)
        mc = cents * (100 - dpct)
        sel = in_mkt & h5 & h6
        g = pd.DataFrame(
            {
                "o_year": year[sel],
                "num": np.where(sname[sel] == MKT_SHARE_NATION, mc[sel], 0),
                "den": mc[sel],
            }
        )
        return g.groupby("o_year", as_index=False).agg(
            num=("num", "sum"), den=("den", "sum"), n=("den", "size")
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("o_year")
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "o_year": [int(g["o_year"].iloc[0])],
                    "num_micents": [int(g["num"].sum())],
                    "den_micents": [int(g["den"].sum())],
                    "n_lines": [int(g["n"].sum())],
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if out.empty or "o_year" not in out.columns:
        return pd.DataFrame(
            {"o_year": pd.Series([], dtype="int64"),
             "num_micents": pd.Series([], dtype="int64"),
             "den_micents": pd.Series([], dtype="int64"),
             "share_ppm": pd.Series([], dtype="int64"),
             "n_lines": pd.Series([], dtype="int64")}
        )
    # exact integer ppm via Python ints (no int64 overflow on num * 1e6)
    out["share_ppm"] = [
        int(n) * 1_000_000 // int(d) for n, d in zip(out["num_micents"], out["den_micents"])
    ]
    return (
        out[["o_year", "num_micents", "den_micents", "share_ppm", "n_lines"]]
        .sort_values("o_year", kind="mergesort").reset_index(drop=True)
        .astype("int64")
    )


REL_MARKET_SHARE_SQL = f"""
with mkt as (
  select year(o_orderdate)::BIGINT as o_year,
         cast(round(l_extendedprice * 100) as bigint)
           * (100 - cast(round(l_discount * 100) as bigint)) as mc,
         sn.n_name as supp_nation
  from lineitem
  join part on l_partkey = p_partkey
  join orders on l_orderkey = o_orderkey
  join customer on o_custkey = c_custkey
  join nation cn on c_nationkey = cn.n_nationkey
  join region on cn.n_regionkey = r_regionkey
  join supplier on l_suppkey = s_suppkey
  join nation sn on s_nationkey = sn.n_nationkey
  where p_type = '{MKT_SHARE_PTYPE}' and r_name = '{MKT_SHARE_REGION}'
)
select o_year,
       sum(case when supp_nation = '{MKT_SHARE_NATION}' then mc else 0 end)::BIGINT
         as num_micents,
       sum(mc)::BIGINT as den_micents,
       ((sum(case when supp_nation = '{MKT_SHARE_NATION}' then mc else 0 end)::HUGEINT
         * 1000000) // sum(mc)::HUGEINT)::BIGINT as share_ppm,
       count(*)::BIGINT as n_lines
from mkt
group by o_year
"""


def rel_nation_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year.

    The corpus has no partsupp, so unit cost is proxied as 10 % of
    p_retailprice (the Q9 analog documented in SURVEY §2): profit =
    extendedprice×(1−discount) − 0.1×retailprice×quantity, carried as
    exact integer micents end-to-end (quantities are integer-valued).
    ~25 nations × ~7 years keeps the combine bounded.
    """
    ord_ref = _broadcast_orders_cust_year(sf_dir)
    snat_ref = _broadcast_lookup(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    nname_ref = _broadcast_lookup(sf_dir, "nation", "n_nationkey", "n_name")
    price_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_retailprice")
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        _, year, h1 = _orders_lookup(ray.get(ord_ref), b["l_orderkey"].to_numpy())
        snat, h2 = _lookup(ray.get(snat_ref), b["l_suppkey"].to_numpy())
        sname, h3 = _lookup(ray.get(nname_ref), snat)
        retail, h4 = _lookup(ray.get(price_ref), b["l_partkey"].to_numpy())
        sel = h1 & h2 & h3 & h4
        cents = np.rint(b["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        dpct = np.rint(b["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = np.rint(b["l_quantity"].to_numpy()).astype(np.int64)
        rcents = np.rint(retail * 100).astype(np.int64)
        profit = cents * (100 - dpct) - rcents * qty * 10
        g = pd.DataFrame(
            {"n_name": sname[sel], "o_year": year[sel], "profit": profit[sel]}
        )
        return g.groupby(["n_name", "o_year"], as_index=False).agg(
            profit=("profit", "sum"), n=("profit", "size")
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["n_name", "o_year"])
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "n_name": [g["n_name"].iloc[0]],
                    "o_year": [int(g["o_year"].iloc[0])],
                    "profit_micents": [int(g["profit"].sum())],
                    "n_lines": [int(g["n"].sum())],
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if out.empty or "n_name" not in out.columns:
        return pd.DataFrame(
            {"n_name": pd.Series([], dtype="object"),
             "o_year": pd.Series([], dtype="int64"),
             "profit_micents": pd.Series([], dtype="int64"),
             "n_lines": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values(["n_name", "o_year"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"o_year": "int64", "profit_micents": "int64", "n_lines": "int64"})
    )


REL_NATION_PROFIT_SQL = """
select sn.n_name as n_name,
       year(o_orderdate)::BIGINT as o_year,
       sum(cast(round(l_extendedprice * 100) as bigint)
             * (100 - cast(round(l_discount * 100) as bigint))
           - cast(round(p_retailprice * 100) as bigint)
             * cast(round(l_quantity) as bigint) * 10)::BIGINT as profit_micents,
       count(*)::BIGINT as n_lines
from lineitem
join orders on l_orderkey = o_orderkey
join supplier on l_suppkey = s_suppkey
join nation sn on s_nationkey = sn.n_nationkey
join part on l_partkey = p_partkey
group by 1, 2
"""


LATE_SHIP_DAYS = 60
_LATE_SHIP_US = LATE_SHIP_DAYS * 86_400_000_000


def rel_shipmode_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape: order-priority mix per shipment-lateness bucket
    (the corpus has no l_shipmode/commitdate, so the Q12 predicate is
    re-expressed as late = shipdate > orderdate + 60 days).

    One lineitem scan; orderkey→(orderdate, priority) is a single
    broadcast of two parallel numpy arrays; the combine is 2 rows.
    Integer-µs timestamp comparison on both engines.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    okeys = t["o_orderkey"].to_numpy()
    order = np.argsort(okeys, kind="mergesort")
    odate_us = (
        t["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
    )
    prio = t["o_orderpriority"].to_pandas().to_numpy(dtype=object)
    high = np.isin(prio, ["1-URGENT", "2-HIGH"]).astype(np.int64)
    ref = ray.put(
        {"keys": okeys[order], "odate": odate_us[order], "high": high[order]}
    )
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        okey = b["l_orderkey"].to_numpy()
        pos = np.clip(np.searchsorted(st["keys"], okey), 0, len(st["keys"]) - 1)
        hit = st["keys"][pos] == okey
        ship_us = (
            b["l_shipdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        late = ship_us > st["odate"][pos] + _LATE_SHIP_US
        h = st["high"][pos]
        g = pd.DataFrame({"late": late[hit], "high": h[hit]})
        return g.groupby("late", as_index=False).agg(
            high_lines=("high", "sum"), n_lines=("high", "size")
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("late")
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "late": [bool(g["late"].iloc[0])],
                    "high_lines": [int(g["high_lines"].sum())],
                    "low_lines": [int(g["n_lines"].sum() - g["high_lines"].sum())],
                    "n_lines": [int(g["n_lines"].sum())],
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if out.empty or "late" not in out.columns:
        return pd.DataFrame(
            {"late": pd.Series([], dtype="bool"),
             "high_lines": pd.Series([], dtype="int64"),
             "low_lines": pd.Series([], dtype="int64"),
             "n_lines": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values("late", kind="mergesort").reset_index(drop=True)
        .astype({"late": "bool", "high_lines": "int64",
                 "low_lines": "int64", "n_lines": "int64"})
    )


REL_SHIPMODE_PRIORITY_SQL = f"""
select (l_shipdate > o_orderdate + interval {LATE_SHIP_DAYS} day) as late,
       sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                then 1 else 0 end)::BIGINT as high_lines,
       sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                then 0 else 1 end)::BIGINT as low_lines,
       count(*)::BIGINT as n_lines
from lineitem join orders on l_orderkey = o_orderkey
group by 1
"""


#: Q4-analog window + lateness (the corpus has no commit/receipt dates,
#: so "late" is shipdate > orderdate + 30 days, as in rel_event rows).
Q4_WINDOW = ("1996-01-01", "1996-04-01")
Q4_LATE_DAYS = 30


def rel_order_priority_exists(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape: order-priority checking — count orders in one
    quarter that have AT LEAST ONE late lineitem (the EXISTS
    correlated-semi-join pattern, the one TPC-H shape the registry
    lacked).

    Distributed EXISTS: the quarter's orders ship as one broadcast of
    sorted parallel arrays (window cut first, so the broadcast is
    quarter-sized, not table-sized; above BROADCAST_KEY_LIMIT the
    membership_flag bloom switch is the drop-in replacement); ONE
    lineitem scan emits per-batch DISTINCT matching orderkeys with
    their priority code; a 16-way hash-bucket combine dedups
    orderkeys globally (EXISTS = first hit wins, never a count) and
    emits ≤5-row per-bucket priority counts; driver final is ≤80 rows.
    """
    import pyarrow.parquet as pq

    t = pq.read_table(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    odate_us = (
        t["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
    )
    lo_us, hi_us = (
        np.datetime64(d, "us").astype(np.int64) for d in Q4_WINDOW
    )
    in_win = (odate_us >= lo_us) & (odate_us < hi_us)
    okeys = t["o_orderkey"].to_numpy()[in_win]
    odate_us = odate_us[in_win]
    prio = t["o_orderpriority"].to_pandas().to_numpy(dtype=object)[in_win]
    prios, prio_code = np.unique(prio, return_inverse=True)
    order = np.argsort(okeys, kind="mergesort")
    ref = ray.put(
        {
            "keys": okeys[order],
            "odate": odate_us[order],
            "pcode": prio_code[order].astype(np.int64),
        }
    )
    late_us = Q4_LATE_DAYS * 86_400_000_000
    nb = 16

    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        okey = b["l_orderkey"].to_numpy()
        if len(st["keys"]) == 0:
            return pd.DataFrame(
                {"okey": pd.Series([], dtype="int64"),
                 "pcode": pd.Series([], dtype="int64"),
                 "_hb": pd.Series([], dtype="int64")}
            )
        pos = np.clip(np.searchsorted(st["keys"], okey), 0, len(st["keys"]) - 1)
        hit = st["keys"][pos] == okey
        ship_us = (
            b["l_shipdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        late = hit & (ship_us > st["odate"][pos] + late_us)
        # EXISTS semantics: one row per matching order per batch
        uo, first = np.unique(okey[late], return_index=True)
        pc = st["pcode"][pos[late]][first]
        return pd.DataFrame(
            {"okey": uo.astype("int64"), "pcode": pc,
             "_hb": (uo % nb).astype("int64")}
        )

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        uo, first = np.unique(g["okey"].to_numpy(), return_index=True)
        pc = g["pcode"].to_numpy()[first]
        cnt = np.bincount(pc, minlength=len(prios))
        nz = cnt > 0
        return pd.DataFrame(
            {"pcode": np.flatnonzero(nz).astype("int64"),
             "n": cnt[nz].astype("int64")}
        )

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_count, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty or "pcode" not in parts.columns:
        return pd.DataFrame(
            {"o_orderpriority": pd.Series([], dtype=object),
             "order_count": pd.Series([], dtype="int64")}
        )
    agg = parts.groupby("pcode", as_index=False)["n"].sum()
    return (
        pd.DataFrame(
            {"o_orderpriority": prios[agg["pcode"].to_numpy()],
             "order_count": agg["n"].to_numpy().astype("int64")}
        )
        .sort_values("o_orderpriority", kind="mergesort")
        .reset_index(drop=True)
        .astype({"o_orderpriority": object, "order_count": "int64"})
    )


REL_ORDER_PRIORITY_EXISTS_SQL = f"""
select o_orderpriority, count(*)::BIGINT as order_count
from orders
where o_orderdate >= date '{Q4_WINDOW[0]}'
  and o_orderdate < date '{Q4_WINDOW[1]}'
  and exists (select 1 from lineitem
              where l_orderkey = o_orderkey
                and l_shipdate > o_orderdate + interval {Q4_LATE_DAYS} day)
group by 1
order by 1
"""


RETURNED_TOPK = 20


def rel_returned_topk_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue on RETURNED lines.

    Per-batch partial sums keyed on custkey (via the orderkey broadcast),
    a 16-way hash-bucket combine (customer-dimension group count never
    becomes a Ray group count), per-bucket top-20, then a ≤320-row
    driver-side final top-k with the deterministic (−revenue, custkey)
    tie-break mirrored in the SQL's ORDER BY.
    """
    ord_ref = _broadcast_orders_cust_year(sf_dir)
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    _EMPTY_PARTIAL = pd.DataFrame(
        {"c_custkey": pd.Series([], dtype="int64"),
         "mc": pd.Series([], dtype="int64"),
         "n": pd.Series([], dtype="int64"),
         "_hb": pd.Series([], dtype="int64")}
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ret = b["l_returnflag"].to_numpy() == "R"
        if not ret.any():
            return _EMPTY_PARTIAL
        okey = b["l_orderkey"].to_numpy()[ret]
        cust, _, hit = _orders_lookup(ray.get(ord_ref), okey)
        cents = np.rint(b["l_extendedprice"].to_numpy()[ret] * 100).astype(np.int64)
        dpct = np.rint(b["l_discount"].to_numpy()[ret] * 100).astype(np.int64)
        mc = (cents * (100 - dpct))[hit]
        g = pd.DataFrame({"c_custkey": cust[hit], "mc": mc})
        g = g.groupby("c_custkey", as_index=False).agg(
            mc=("mc", "sum"), n=("mc", "size")
        )
        g["_hb"] = (g["c_custkey"] % 16).astype("int64")
        return g

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("c_custkey", as_index=False).agg(
            revenue_micents=("mc", "sum"), n_lines=("n", "sum")
        )
        return agg.sort_values(
            ["revenue_micents", "c_custkey"],
            ascending=[False, True], kind="mergesort",
        ).head(RETURNED_TOPK)

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "c_custkey" not in out.columns:
        return pd.DataFrame(
            {"c_custkey": pd.Series([], dtype="int64"),
             "c_name": pd.Series([], dtype="object"),
             "n_name": pd.Series([], dtype="object"),
             "revenue_micents": pd.Series([], dtype="int64"),
             "n_lines": pd.Series([], dtype="int64")}
        )
    top = (
        out.sort_values(
            ["revenue_micents", "c_custkey"],
            ascending=[False, True], kind="mergesort",
        )
        .head(RETURNED_TOPK)
        .reset_index(drop=True)
    )
    # decorate the ≤20 winners with name + nation (tiny driver-side joins)
    cname = ray.get(_broadcast_lookup(sf_dir, "customer", "c_custkey", "c_name"))
    cnat = ray.get(_broadcast_lookup(sf_dir, "customer", "c_custkey", "c_nationkey"))
    nname = ray.get(_broadcast_lookup(sf_dir, "nation", "n_nationkey", "n_name"))
    names, _ = _lookup(cname, top["c_custkey"].to_numpy())
    nats, _ = _lookup(cnat, top["c_custkey"].to_numpy())
    natnames, _ = _lookup(nname, nats)
    return pd.DataFrame(
        {
            "c_custkey": top["c_custkey"].to_numpy(np.int64),
            "c_name": names.astype(object),
            "n_name": natnames.astype(object),
            "revenue_micents": top["revenue_micents"].to_numpy(np.int64),
            "n_lines": top["n_lines"].to_numpy(np.int64),
        }
    )


REL_RETURNED_TOPK_SQL = f"""
select c_custkey::BIGINT as c_custkey, c_name, n_name,
       sum(cast(round(l_extendedprice * 100) as bigint)
           * (100 - cast(round(l_discount * 100) as bigint)))::BIGINT
         as revenue_micents,
       count(*)::BIGINT as n_lines
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
join nation on c_nationkey = n_nationkey
where l_returnflag = 'R'
group by 1, 2, 3
order by revenue_micents desc, c_custkey
limit {RETURNED_TOPK}
"""


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: forecast-revenue change — pure filter + global sum,
# the cheapest possible distributed shape (no exchange at all).
# ---------------------------------------------------------------------------

Q6_WINDOW = ("1996-01-01", "1997-01-01")
Q6_DISCOUNT_PCT = (5, 7)  # inclusive band, integer percent
Q6_MAX_QTY = 24.0


def rel_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6: revenue delta from dropping a discount band —
    ``sum(l_extendedprice * l_discount)`` under shipdate-year,
    discount-band and quantity filters.

    Scale shape: the read is pruned to 4 columns; each batch emits ONE
    partial row through zero-copy pyarrow kernels; the driver folds
    O(blocks) rows.  Money stays integer (price-cents × discount-percent
    = "micents") so summation order can never move a rounded digit.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = np.datetime64(Q6_WINDOW[0], "us")
    hi = np.datetime64(Q6_WINDOW[1], "us")

    def partial(t: "pa.Table") -> "pa.Table":
        ship = pc.cast(t["l_shipdate"], pa.int64())
        dp = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(ship, int(lo.astype(np.int64))),
                pc.less(ship, int(hi.astype(np.int64))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(dp, Q6_DISCOUNT_PCT[0]),
                    pc.less_equal(dp, Q6_DISCOUNT_PCT[1]),
                ),
                pc.less(t["l_quantity"], Q6_MAX_QTY),
            ),
        )
        f = t.filter(keep)
        cents = pc.cast(pc.round(pc.multiply(f["l_extendedprice"], 100.0)), pa.int64())
        dpk = pc.cast(pc.round(pc.multiply(f["l_discount"], 100.0)), pa.int64())
        rev = pc.sum(pc.multiply(cents, dpk)).as_py() or 0
        return pa.table(
            {"revenue_micents": pa.array([rev], pa.int64()),
             "n_lines": pa.array([f.num_rows], pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame(
        {"revenue_micents": [int(parts["revenue_micents"].sum()) if len(parts) else 0],
         "n_lines": [int(parts["n_lines"].sum()) if len(parts) else 0]}
    ).astype({"revenue_micents": "int64", "n_lines": "int64"})


REL_FORECAST_REVENUE_SQL = f"""
select coalesce(sum(cast(round(l_extendedprice * 100) as bigint)
                    * cast(round(l_discount * 100) as bigint)), 0)::BIGINT
         as revenue_micents,
       count(*)::BIGINT as n_lines
from lineitem
where l_shipdate >= date '{Q6_WINDOW[0]}' and l_shipdate < date '{Q6_WINDOW[1]}'
  and cast(round(l_discount * 100) as bigint)
        between {Q6_DISCOUNT_PCT[0]} and {Q6_DISCOUNT_PCT[1]}
  and l_quantity < {Q6_MAX_QTY}
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: local-supplier volume — revenue per nation where the
# CUSTOMER's nation equals the SUPPLIER's nation, orders in one year.
# ---------------------------------------------------------------------------

Q5_WINDOW = ("1996-01-01", "1997-01-01")


def rel_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5: revenue grouped by nation restricted to lineitems whose
    customer and supplier share a nation, order date in one year.

    Distributed shape: two dim broadcasts (custkey→nationkey,
    suppkey→nationkey; above BROADCAST_KEY_LIMIT the membership_flag
    bloom switch is the drop-in) plus ONE window-cut orders map built by
    a Ray-side scan (year-sized, collected only after the cut — the
    driver never reads the full orders table), then a single lineitem
    scan emitting ≤25 partial rows per batch.  The combine moves
    kilobytes.
    """
    import pyarrow.parquet as pq

    cust_ref = _broadcast_lookup(sf_dir, "customer", "c_custkey", "c_nationkey")
    supp_ref = _broadcast_lookup(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    lo = pd.Timestamp(Q5_WINDOW[0])
    hi = pd.Timestamp(Q5_WINDOW[1])

    ods = ray.data.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def window_cut(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)
        b = b[m]
        nat, hit = _lookup(ray.get(cust_ref), b["o_custkey"].to_numpy())
        return pd.DataFrame(
            {"okey": b["o_orderkey"].to_numpy()[hit].astype("int64"),
             "cnat": nat[hit].astype("int64")}
        )

    cut = ods.map_batches(window_cut, batch_format="pandas").to_pandas()
    order = np.argsort(cut["okey"].to_numpy(), kind="mergesort")
    oref = ray.put(
        {"keys": cut["okey"].to_numpy()[order],
         "cnat": cut["cnat"].to_numpy()[order]}
    )

    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(oref)
        if len(st["keys"]) == 0:
            return pd.DataFrame(
                {"nat": pd.Series([], dtype="int64"),
                 "mc": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            )
        ok = b["l_orderkey"].to_numpy()
        pos = np.minimum(np.searchsorted(st["keys"], ok), len(st["keys"]) - 1)
        hit = st["keys"][pos] == ok
        cnat = st["cnat"][pos]
        snat, shit = _lookup(ray.get(supp_ref), b["l_suppkey"].to_numpy())
        keep = hit & shit & (cnat == snat)
        cents = np.rint(b["l_extendedprice"].to_numpy()[keep] * 100).astype(np.int64)
        dpct = np.rint(b["l_discount"].to_numpy()[keep] * 100).astype(np.int64)
        mc = cents * (100 - dpct)
        g = pd.DataFrame({"nat": cnat[keep].astype("int64"), "mc": mc})
        out = g.groupby("nat", as_index=False).agg(mc=("mc", "sum"), n=("mc", "size"))
        return out.astype({"nat": "int64", "mc": "int64", "n": "int64"})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {"n_name": pd.Series([], dtype=object),
             "revenue_micents": pd.Series([], dtype="int64"),
             "n_lines": pd.Series([], dtype="int64")}
        )
    agg = parts.groupby("nat", as_index=False).agg(
        revenue_micents=("mc", "sum"), n_lines=("n", "sum")
    )
    names = pq.read_table(
        _path(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nm = dict(zip(names["n_nationkey"].astype("int64"), names["n_name"]))
    return (
        pd.DataFrame(
            {"n_name": [nm[k] for k in agg["nat"]],
             "revenue_micents": agg["revenue_micents"].astype("int64"),
             "n_lines": agg["n_lines"].astype("int64")}
        )
        .sort_values("n_name", kind="mergesort")
        .reset_index(drop=True)
        .astype({"n_name": object, "revenue_micents": "int64", "n_lines": "int64"})
    )


REL_LOCAL_SUPPLIER_VOLUME_SQL = f"""
select n_name,
       sum(cast(round(l_extendedprice * 100) as bigint)
           * (100 - cast(round(l_discount * 100) as bigint)))::BIGINT
         as revenue_micents,
       count(*)::BIGINT as n_lines
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
join supplier on l_suppkey = s_suppkey
join nation on c_nationkey = n_nationkey
where s_nationkey = c_nationkey
  and o_orderdate >= date '{Q5_WINDOW[0]}' and o_orderdate < date '{Q5_WINDOW[1]}'
group by n_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: min-cost supplier per part (correlated-min subquery).
# ---------------------------------------------------------------------------

MIN_COST_MAX_SIZE = 10  # parts with p_size < 10 (Q2's size predicate)


def rel_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2 shape: for every small part, the supplier offering the
    minimum observed unit price (ties → smallest suppkey) — the
    correlated ``= (select min(...))`` subquery pattern.

    Unit price is integer micro-cents via FLOOR, not round:
    ``extprice*1e6/qty`` is an exact-rational with denominator ≤ 50, so
    ties at .5 exist (numpy rounds half-to-even, DuckDB half-away —
    measured divergence at sf0.01), while floor is stable: an integer
    rational divides exactly in float64 and a non-integer one sits
    ≥ 0.02 from the boundary, ~1e3 ULPs of slack.
    Shape: per-batch partial min per (part, supp) pair, a 32-way
    part-hash bucket combine (each part's pairs co-locate), per-bucket
    argmin; no stage ever groups per part in Ray.
    """
    size_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_size")
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )
    nb = 32
    _EMPTY = pd.DataFrame(
        {"p_partkey": pd.Series([], dtype="int64"),
         "s_suppkey": pd.Series([], dtype="int64"),
         "unit_ucents": pd.Series([], dtype="int64"),
         "_hb": pd.Series([], dtype="int64")}
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pk = b["l_partkey"].to_numpy()
        size, hit = _lookup(ray.get(size_ref), pk)
        keep = hit & (size < MIN_COST_MAX_SIZE)
        if not keep.any():
            return _EMPTY
        ucents = np.floor(
            b["l_extendedprice"].to_numpy()[keep] * 1_000_000
            / b["l_quantity"].to_numpy()[keep]
        ).astype(np.int64)
        g = pd.DataFrame(
            {"p_partkey": pk[keep].astype("int64"),
             "s_suppkey": b["l_suppkey"].to_numpy()[keep].astype("int64"),
             "unit_ucents": ucents}
        ).groupby(["p_partkey", "s_suppkey"], as_index=False)["unit_ucents"].min()
        g["_hb"] = (g["p_partkey"] % nb).astype("int64")
        return g

    def best(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby(["p_partkey", "s_suppkey"], as_index=False)[
            "unit_ucents"
        ].min()
        gg = gg.sort_values(
            ["p_partkey", "unit_ucents", "s_suppkey"], kind="mergesort"
        )
        top = gg.drop_duplicates("p_partkey", keep="first")
        return top[["p_partkey", "s_suppkey", "unit_ucents"]]

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(best, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "p_partkey" not in out.columns:
        return pd.DataFrame(
            {"p_partkey": pd.Series([], dtype="int64"),
             "s_suppkey": pd.Series([], dtype="int64"),
             "unit_ucents": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values("p_partkey", kind="mergesort")
        .reset_index(drop=True)
        .astype({"p_partkey": "int64", "s_suppkey": "int64",
                 "unit_ucents": "int64"})
    )


REL_MIN_COST_SUPPLIER_SQL = f"""
with unit as (
  select l_partkey, l_suppkey,
         min(cast(floor(l_extendedprice * 1000000 / l_quantity) as bigint))
           as unit_ucents
  from lineitem join part on l_partkey = p_partkey
  where p_size < {MIN_COST_MAX_SIZE}
  group by 1, 2
), ranked as (
  select l_partkey as p_partkey, l_suppkey as s_suppkey, unit_ucents,
         row_number() over (partition by l_partkey
                            order by unit_ucents, l_suppkey) as rn
  from unit
)
select p_partkey, s_suppkey, unit_ucents from ranked where rn = 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: supplier counts per (brand, size) with a NOT-IN
# supplier exclusion — grouped count-distinct over a derived join.
# ---------------------------------------------------------------------------

def rel_supplier_part_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (p_brand, p_size) from the
    lineitem part-supplier pairs, EXCLUDING suppliers with a negative
    account balance (the "complaints" NOT IN list of Q16).

    Distinct triples are packed to one int64 per row
    (suppkey «12 | brand-code «6 | size — brands ≤25, sizes ≤50) so
    per-batch AND per-bucket dedup is a single np.unique over int64,
    never an object-tuple hash.  32-way key-hash buckets bound the
    combine; output is dim-sized.
    """
    brand_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_brand")
    size_ref = _broadcast_lookup(sf_dir, "part", "p_partkey", "p_size")
    bal_ref = _broadcast_lookup(sf_dir, "supplier", "s_suppkey", "s_acctbal")
    brands = ray.get(brand_ref)["cats"]
    nb = 32

    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"]
    )
    _EMPTY = pd.DataFrame({"packed": pd.Series([], dtype="int64"),
                           "_hb": pd.Series([], dtype="int64")})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pk = b["l_partkey"].to_numpy()
        sk = b["l_suppkey"].to_numpy()
        bstate = ray.get(brand_ref)
        pos = np.minimum(np.searchsorted(bstate["keys"], pk), len(bstate["keys"]) - 1)
        phit = bstate["keys"][pos] == pk
        bcode = bstate["codes"][pos]
        size, _ = _lookup(ray.get(size_ref), pk)
        bal, shit = _lookup(ray.get(bal_ref), sk)
        keep = phit & shit & (bal >= 0)
        if not keep.any():
            return _EMPTY
        skk = sk[keep].astype(np.int64)
        if len(skk) and skk.max() >= (1 << 51):
            raise ValueError(
                "rel_supplier_part_counts: suppkey >= 2^51 would overflow "
                "the (suppkey<<12 | brand<<6 | size) packed key"
            )
        packed = (
            (skk << 12)
            | (bcode[keep].astype(np.int64) << 6)
            | size[keep].astype(np.int64)
        )
        u = np.unique(packed)
        return pd.DataFrame(
            {"packed": u, "_hb": (u % nb).astype("int64")}
        )

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["packed"].to_numpy())
        bs = u & 0xFFF  # brand-code«6 | size
        ub, cnt = np.unique(bs, return_counts=True)
        return pd.DataFrame(
            {"bcode": (ub >> 6).astype("int64"),
             "p_size": (ub & 0x3F).astype("int64"),
             "n": cnt.astype("int64")}
        )

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_count, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty or "bcode" not in parts.columns:
        return pd.DataFrame(
            {"p_brand": pd.Series([], dtype=object),
             "p_size": pd.Series([], dtype="int64"),
             "n_suppliers": pd.Series([], dtype="int64")}
        )
    agg = parts.groupby(["bcode", "p_size"], as_index=False)["n"].sum()
    return (
        pd.DataFrame(
            {"p_brand": brands[agg["bcode"].to_numpy()],
             "p_size": agg["p_size"].astype("int64"),
             "n_suppliers": agg["n"].astype("int64")}
        )
        .sort_values(["p_brand", "p_size"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"p_brand": object, "p_size": "int64", "n_suppliers": "int64"})
    )


REL_SUPPLIER_PART_COUNTS_SQL = """
select p_brand, p_size::BIGINT as p_size,
       count(distinct l_suppkey)::BIGINT as n_suppliers
from lineitem
join part on l_partkey = p_partkey
join supplier on l_suppkey = s_suppkey
where s_acctbal >= 0
group by 1, 2
"""


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers shipping an excess share of a part —
# nested aggregate (per-pair sums vs per-part totals) then distinct.
# ---------------------------------------------------------------------------

def rel_excess_quantity_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 shape: suppliers whose shipped quantity of some part
    exceeds TWICE the average per-supplier share of that part
    (`qty * n_suppliers > 2 * total` — a relative threshold that stays
    non-degenerate as supplier fan-out grows with scale, unlike Q20's
    absolute 50 % which this uniform corpus never reaches), with how
    many parts they dominate.  The nested-aggregate semi-join becomes:
    per-batch partial (part, supp) quantity sums, a 32-way part-hash
    bucket combine where each part's rows co-locate (total, supplier
    count and share test are bucket-local), then a dim-sized supplier
    rollup on the driver.  Quantities are integral → int64 sums are
    exact; the share test is pure integer arithmetic (no float).
    """
    ds = ray.data.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )
    nb = 32

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"p": b["l_partkey"].to_numpy().astype("int64"),
             "s": b["l_suppkey"].to_numpy().astype("int64"),
             "q": np.rint(b["l_quantity"].to_numpy()).astype("int64")}
        ).groupby(["p", "s"], as_index=False)["q"].sum()
        g["_hb"] = (g["p"] % nb).astype("int64")
        return g

    def bucket_excess(g: pd.DataFrame) -> pd.DataFrame:
        ps = g.groupby(["p", "s"], as_index=False)["q"].sum()
        tot = ps.groupby("p")["q"].transform("sum")
        nsupp = ps.groupby("p")["q"].transform("size")
        ex = ps[ps["q"].to_numpy() * nsupp.to_numpy() > 2 * tot.to_numpy()]
        cnt = ex.groupby("s", as_index=False).size()
        return pd.DataFrame(
            {"s_suppkey": cnt["s"].astype("int64"),
             "n_parts": cnt["size"].astype("int64")}
        )

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_excess, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty or "s_suppkey" not in parts.columns:
        return pd.DataFrame(
            {"s_suppkey": pd.Series([], dtype="int64"),
             "n_parts": pd.Series([], dtype="int64")}
        )
    agg = parts.groupby("s_suppkey", as_index=False)["n_parts"].sum()
    return (
        agg.sort_values("s_suppkey", kind="mergesort")
        .reset_index(drop=True)
        .astype({"s_suppkey": "int64", "n_parts": "int64"})
    )


REL_EXCESS_QTY_SUPPLIERS_SQL = """
with ps as (
  select l_partkey, l_suppkey,
         sum(cast(round(l_quantity) as bigint)) as qty
  from lineitem group by 1, 2
), tot as (
  select l_partkey, sum(qty) as total, count(*)::BIGINT as nsupp
  from ps group by 1
)
select ps.l_suppkey as s_suppkey, count(*)::BIGINT as n_parts
from ps join tot on ps.l_partkey = tot.l_partkey
where ps.qty * tot.nsupp > 2 * tot.total
group by 1
"""


# ---------------------------------------------------------------------------
# Gap-filled per-user daily series — the resample op feature pipelines
# need: one row per (user, day) for EVERY day in the user's active
# span, missing days zero-filled.
# ---------------------------------------------------------------------------

def rel_daily_gapfill(sf_dir: str) -> pd.DataFrame:
    """Dense daily activity per user with zero-filled gaps.

    Shape: per-batch (user, day) partials (count + value sum) → 16-way
    user-hash bucket combine where each user's full span is
    bucket-local; the dense range materializes vectorized inside the
    bucket (one np.arange over the bucket's total span, aligned by
    repeat/cumsum offsets — no per-user Python loop).  Output size is
    Σ user spans; nothing wider ever exists.  Day index is
    ``datetime64[D]`` (exact integer division of µs — the epoch-binning
    rule from CLAUDE.md; corpus is 2024+ so trunc == floor).
    """
    ds = ray.data.read_parquet(
        _path(sf_dir, "events"), columns=["user_id", "ts", "value"]
    )
    nb = 16

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (
            b["ts"].to_numpy(dtype="datetime64[us]")
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        g = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(np.int64), "day": day,
             "value": b["value"].to_numpy(np.float64)}
        ).groupby(["user_id", "day"], as_index=False).agg(
            n=("value", "size"), v=("value", "sum")
        )
        g["_hb"] = (g["user_id"] % nb).astype("int64")
        return g

    def bucket_fill(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["user_id", "day"], as_index=False).agg(
            n=("n", "sum"), v=("v", "sum")
        ).sort_values(["user_id", "day"], kind="mergesort")
        uid = d["user_id"].to_numpy()
        day = d["day"].to_numpy()
        # per-user span boundaries from the sorted frame
        new_u = np.empty(len(d), dtype=bool)
        new_u[0] = True
        new_u[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new_u)
        ends = np.append(starts[1:], len(d))
        lo = day[starts]
        hi = day[ends - 1]
        span = hi - lo + 1
        total = int(span.sum())
        # dense (user, day) grid: one arange over the whole bucket
        u_out = np.repeat(uid[starts], span)
        pos = np.cumsum(span) - span  # grid offset per user segment
        day_out = np.arange(total) - np.repeat(pos, span) + np.repeat(lo, span)
        # scatter the observed days into the dense grid
        seg_id = np.repeat(np.arange(len(starts)), ends - starts)
        idx = pos[seg_id] + (day - lo[seg_id])
        n_out = np.zeros(total, np.int64)
        v_out = np.zeros(total, np.float64)
        n_out[idx] = d["n"].to_numpy()
        v_out[idx] = d["v"].to_numpy()
        return pd.DataFrame(
            {"user_id": u_out, "day": day_out,
             "n_events": n_out, "total_value": np.round(v_out, 2)}
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_hb")
        .map_groups(bucket_fill, batch_format="pandas")
        .to_pandas()
    )
    if out.empty or "user_id" not in out.columns:
        return pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"),
             "day": pd.Series([], dtype="int64"),
             "n_events": pd.Series([], dtype="int64"),
             "total_value": pd.Series([], dtype="float64")}
        )
    return (
        out.sort_values(["user_id", "day"], kind="mergesort")
        .reset_index(drop=True)
        .astype({"user_id": "int64", "day": "int64",
                 "n_events": "int64", "total_value": "float64"})
    )


REL_DAILY_GAPFILL_SQL = """
with d as (
  select user_id,
         (epoch_us(date_trunc('day', ts)) // 86400000000)::BIGINT as day,
         count(*)::BIGINT as n_events, sum(value) as total_value
  from events group by 1, 2
), span as (
  select user_id, min(day) as lo, max(day) as hi from d group by 1
)
select s.user_id, gs.day::BIGINT as day,
       coalesce(d.n_events, 0)::BIGINT as n_events,
       round(coalesce(d.total_value, 0), 2) as total_value
from span s
cross join unnest(generate_series(s.lo, s.hi)) as gs(day)
left join d on d.user_id = s.user_id and d.day = gs.day
"""


REGISTRY = {
    "rel_daily_gapfill": (rel_daily_gapfill, REL_DAILY_GAPFILL_SQL),
    "rel_forecast_revenue": (rel_forecast_revenue, REL_FORECAST_REVENUE_SQL),
    "rel_local_supplier_volume": (
        rel_local_supplier_volume, REL_LOCAL_SUPPLIER_VOLUME_SQL,
    ),
    "rel_min_cost_supplier": (rel_min_cost_supplier, REL_MIN_COST_SUPPLIER_SQL),
    "rel_supplier_part_counts": (
        rel_supplier_part_counts, REL_SUPPLIER_PART_COUNTS_SQL,
    ),
    "rel_excess_quantity_suppliers": (
        rel_excess_quantity_suppliers, REL_EXCESS_QTY_SUPPLIERS_SQL,
    ),
    "rel_market_share": (rel_market_share, REL_MARKET_SHARE_SQL),
    "rel_nation_profit": (rel_nation_profit, REL_NATION_PROFIT_SQL),
    "rel_returned_topk_customers": (
        rel_returned_topk_customers, REL_RETURNED_TOPK_SQL,
    ),
    "rel_shipmode_priority": (rel_shipmode_priority, REL_SHIPMODE_PRIORITY_SQL),
    "rel_order_priority_exists": (
        rel_order_priority_exists,
        REL_ORDER_PRIORITY_EXISTS_SQL,
    ),
    "rel_promo_revenue": (rel_promo_revenue, REL_PROMO_REVENUE_SQL),
    "rel_small_qty_revenue": (rel_small_qty_revenue, REL_SMALL_QTY_REVENUE_SQL),
    "rel_supplier_value_share": (
        rel_supplier_value_share, REL_SUPPLIER_VALUE_SHARE_SQL,
    ),
    "rel_disjunctive_parts": (rel_disjunctive_parts, REL_DISJUNCTIVE_PARTS_SQL),
    "rel_top_supplier": (rel_top_supplier, REL_TOP_SUPPLIER_SQL),
    "rel_balance_audit": (rel_balance_audit, REL_BALANCE_AUDIT_SQL),
    "rel_late_events": (rel_late_events, REL_LATE_EVENTS_SQL),
    "rel_sole_late_supplier": (
        rel_sole_late_supplier, REL_SOLE_LATE_SUPPLIER_SQL,
    ),
    "rel_order_count_histogram": (
        rel_order_count_histogram, REL_ORDER_COUNT_HISTOGRAM_SQL,
    ),
    "rel_bulk_orders": (rel_bulk_orders, REL_BULK_ORDERS_SQL),
    "rel_user_coverage_time": (
        rel_user_coverage_time, REL_USER_COVERAGE_TIME_SQL,
    ),
    "rel_brand_supplier_distinct": (
        rel_brand_supplier_distinct, REL_BRAND_SUPPLIER_DISTINCT_SQL,
    ),
    "rel_value_ks_drift": (rel_value_ks_drift, REL_VALUE_KS_DRIFT_SQL),
    "rel_value_tdigest": (rel_value_tdigest, None),
    "rel_agg_lineitem": (rel_agg_lineitem, REL_AGG_LINEITEM_SQL),
    "rel_event_pivot": (rel_event_pivot, REL_EVENT_PIVOT_SQL),
    "rel_event_unpivot": (rel_event_unpivot, REL_EVENT_UNPIVOT_SQL),
    "rel_regr_slope": (rel_regr_slope, REL_REGR_SLOPE_SQL),
    "rel_mad_outliers": (rel_mad_outliers, REL_MAD_OUTLIERS_SQL),
    "rel_decayed_user_value": (
        rel_decayed_user_value, REL_DECAYED_USER_VALUE_SQL,
    ),
    "rel_user_gini": (rel_user_gini, REL_USER_GINI_SQL),
    "rel_click_purchase_full_outer": (
        rel_click_purchase_full_outer,
        REL_CLICK_PURCHASE_FULL_OUTER_SQL,
    ),
    "rel_lineitem_profile": (rel_lineitem_profile, REL_LINEITEM_PROFILE_SQL),
    "rel_scrub_customer_names": (
        rel_scrub_customer_names,
        REL_SCRUB_CUSTOMER_NAMES_SQL,
    ),
    "rel_customer_name_fuzzy_pairs": (
        rel_customer_name_fuzzy_pairs,
        REL_CUSTOMER_NAME_FUZZY_SQL,
    ),
    "rel_skew_join_segments": (rel_skew_join_segments, REL_SKEW_JOIN_SEGMENTS_SQL),
    "rel_event_props_scrub": (rel_event_props_scrub, REL_EVENT_PROPS_SCRUB_SQL),
    "rel_region_supplier_balance": (
        rel_region_supplier_balance,
        REL_REGION_SUPPLIER_SQL,
    ),
    "rel_brand_revenue": (rel_brand_revenue, REL_BRAND_REVENUE_SQL),
    "rel_supplier_nation_topk": (
        rel_supplier_nation_topk,
        REL_SUPPLIER_NATION_TOPK_SQL,
    ),
    "rel_priority_returned_orders": (
        rel_priority_returned_orders,
        REL_PRIORITY_RETURNED_SQL,
    ),
    "rel_median_value_by_type": (rel_median_value_by_type, REL_MEDIAN_VALUE_SQL),
    "rel_value_quantiles_exact": (
        rel_value_quantiles_exact,
        REL_VALUE_QUANTILES_EXACT_SQL,
    ),
    "rel_bloom_semijoin": (rel_bloom_semijoin, REL_BLOOM_SEMIJOIN_SQL),
    "rel_running_value_by_user": (rel_running_value_by_user, REL_RUNNING_VALUE_SQL),
    "rel_event_lag_delta": (rel_event_lag_delta, REL_EVENT_LAG_DELTA_SQL),
    "rel_event_streaks": (rel_event_streaks, REL_EVENT_STREAKS_SQL),
    "rel_cm_user_counts": (rel_cm_user_counts, None),
    "rel_customer_order_counts": (rel_customer_order_counts, REL_CUSTOMER_ORDER_COUNTS_SQL),
    "rel_session_spans": (rel_session_spans, REL_SESSION_SPANS_SQL),
    "rel_first_touch_attribution": (rel_first_touch_attribution, REL_FIRST_TOUCH_SQL),
    "rel_winsorized_stats": (rel_winsorized_stats, REL_WINSORIZED_STATS_SQL),
    "rel_hourly_profile": (rel_hourly_profile, REL_HOURLY_PROFILE_SQL),
    "rel_value_histogram": (rel_value_histogram, REL_VALUE_HISTOGRAM_SQL),
    "rel_value_equidepth": (rel_value_equidepth, REL_VALUE_EQUIDEPTH_SQL),
    "rel_nation_trade_matrix": (rel_nation_trade_matrix, REL_NATION_TRADE_MATRIX_SQL),
    "rel_window_dedup": (rel_window_dedup, REL_WINDOW_DEDUP_SQL),
    "rel_value_psi": (rel_value_psi, REL_VALUE_PSI_SQL),
    "rel_cohort_ltv": (rel_cohort_ltv, REL_COHORT_LTV_SQL),
    "rel_linear_attribution": (rel_linear_attribution, REL_LINEAR_ATTRIBUTION_SQL),
    "rel_sample_per_user": (rel_sample_per_user, REL_SAMPLE_PER_USER_SQL),
    "rel_props_json": (rel_props_json, REL_PROPS_JSON_SQL),
    "rel_user_funnel": (rel_user_funnel, REL_USER_FUNNEL_SQL),
    "rel_user_mode_event": (rel_user_mode_event, REL_USER_MODE_EVENT_SQL),
    "rel_rolling_active_users": (rel_rolling_active_users, REL_ROLLING_ACTIVE_SQL),
    "rel_corr_value_k": (rel_corr_value_k, REL_CORR_VALUE_K_SQL),
    "rel_cumulative_users": (rel_cumulative_users, REL_CUMULATIVE_USERS_SQL),
    "rel_viewers_never_purchased": (
        rel_viewers_never_purchased,
        REL_VIEWERS_NEVER_PURCHASED_SQL,
    ),
    "rel_user_retention": (rel_user_retention, REL_USER_RETENTION_SQL),
    "rel_value_percent_rank": (rel_value_percent_rank, REL_VALUE_PERCENT_RANK_SQL),
    "rel_top_revenue_orders": (rel_top_revenue_orders, REL_TOP_REVENUE_ORDERS_SQL),
    "rel_range_join_click_error": (rel_range_join_click_error, REL_RANGE_JOIN_SQL),
    "rel_rolling_value": (rel_rolling_value, REL_ROLLING_VALUE_SQL),
    "rel_quantity_quantiles": (rel_quantity_quantiles, REL_QUANTITY_QUANTILES_SQL),
    "rel_value_quantiles_by_type": (rel_value_quantiles_by_type, None),
    "rel_hll_distinct_users": (rel_hll_distinct_users, None),
    "rel_customers_without_orders": (
        rel_customers_without_orders,
        REL_CUSTOMERS_WITHOUT_ORDERS_SQL,
    ),
    "rel_topk_events_per_user": (
        rel_topk_events_per_user,
        REL_TOPK_EVENTS_PER_USER_SQL,
    ),
    "rel_asof_purchase_click": (rel_asof_purchase_click, REL_ASOF_SQL),
    "rel_daily_events": (rel_daily_events, REL_DAILY_EVENTS_SQL),
    "rel_hopping_window": (rel_hopping_window, REL_HOPPING_WINDOW_SQL),
    "rel_distinct_users": (rel_distinct_users, REL_DISTINCT_USERS_SQL),
    "rel_mktsegment_revenue_hashjoin": (
        rel_mktsegment_revenue_hashjoin,
        REL_MKTSEGMENT_REVENUE_SQL,
    ),
    "rel_topk_orders": (rel_topk_orders, REL_TOPK_ORDERS_SQL),
    "rel_mktsegment_revenue": (rel_mktsegment_revenue, REL_MKTSEGMENT_REVENUE_SQL),
    "rel_nation_revenue": (rel_nation_revenue, REL_NATION_REVENUE_SQL),
    "rel_sessionize": (rel_sessionize, REL_SESSIONIZE_SQL),
    "rel_event_type_stats": (rel_event_type_stats, REL_EVENT_TYPE_STATS_SQL),
    "rel_big_purchases": (rel_big_purchases, REL_BIG_PURCHASES_SQL),
}
