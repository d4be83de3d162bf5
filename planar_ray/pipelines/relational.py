"""Relational pipelines over the TPC-H-ish testdata tables.

These widen SURVEY.md §2.4 ("global/grouped aggs, scalar fns, joins")
with three classic shapes a reference user runs daily, each expressed
Ray-Data-first and each with an exact DuckDB twin:

* ``lineitem_pricing`` — TPC-H Q1-style grouped aggregate: a scalar
  projection inside ``map_batches`` (disc price) followed by ONE small
  ``groupby`` (6 output groups). Ray's aggregate does map-side partials
  per block, so the shuffle carries only per-block partials — the
  pre-aggregate pattern that holds at 100 TB.
* ``orders_enrich`` — big-big hash-bucket join (orders x customer) plus
  a BROADCAST of the genuinely small dimensions (nation x region, 25
  rows) resolved map-side via a ``ray.put`` lookup: the canonical
  "don't shuffle the small side" plan.
* ``events_pivot`` — per-user wide pivot of event-type counts: the
  window assignment is a vectorised selector inside ``map_batches``
  emitting one 0/1 column per (fixed, known) type, then ONE grouped
  sum; no per-row Python, no per-type pass over the table.

No counterpart files in the reference (it is a graph engine); these
cover the data-processing surface SURVEY.md §2.4 maps onto Ray Data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _read(sf_dir: str, table: str, columns):
    from ..util import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, f"{table}.parquet"),
                              columns=columns)


def q_lineitem_pricing(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count, Sum

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def project(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].combine_chunks()
        disc = t["l_discount"].combine_chunks()
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": t["l_quantity"].cast(pa.float64()),
            "base": price.cast(pa.float64()),
            "disc_price": pc.multiply(
                price.cast(pa.float64()),
                pc.subtract(pa.scalar(1.0), disc.cast(pa.float64()))),
        })

    out = (li.map_batches(project, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum(on="qty", alias_name="sum_qty"),
                        Sum(on="base", alias_name="sum_base_price"),
                        Sum(on="disc_price", alias_name="sum_disc_price"),
                        Count(alias_name="count_order"))
             .to_pandas())
    return pa.table({
        "l_returnflag": pa.array(out["l_returnflag"]),
        "l_linestatus": pa.array(out["l_linestatus"]),
        "sum_qty": pa.array(np.round(out["sum_qty"].to_numpy(), 2)),
        "sum_base_price": pa.array(
            np.round(out["sum_base_price"].to_numpy(), 2)),
        "sum_disc_price": pa.array(
            np.round(out["sum_disc_price"].to_numpy(), 2)),
        "count_order": pa.array(out["count_order"].astype("int64")),
    })


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(CAST(l_quantity AS DOUBLE)), 2) AS sum_qty,
       ROUND(SUM(CAST(l_extendedprice AS DOUBLE)), 2) AS sum_base_price,
       ROUND(SUM(CAST(l_extendedprice AS DOUBLE)
                 * (1.0 - CAST(l_discount AS DOUBLE))), 2) AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem GROUP BY 1, 2
"""


def q_orders_enrich(sf_dir: str) -> pa.Table:
    """Revenue by (region, nation): orders |x| customer (bucket join),
    then nation/region resolved from ONE broadcast ``ray.put`` array —
    at any scale the dimensions stay 25/5 rows, so they ship once per
    actor, never per batch, and never shuffle."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..joins import hash_bucket_join

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    reg_of = dict(zip(reg["r_regionkey"].astype(int), reg["r_name"]))
    # dense nationkey -> (n_name, r_name) lookup, broadcast once
    nkeys = nat["n_nationkey"].astype(int).to_numpy()
    lut = np.empty(int(nkeys.max()) + 1, dtype=object)
    lut_r = np.empty_like(lut)
    for k, nm, rk in zip(nkeys, nat["n_name"], nat["n_regionkey"].astype(int)):
        lut[k] = nm
        lut_r[k] = reg_of[rk]
    lut_ref = ray.put((lut, lut_r))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = hash_bucket_join(orders, cust,
                              left_on="o_custkey", right_on="c_custkey")

    def resolve(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lnm, lrg = ray.get(lut_ref)
        return pa.table({
            "r_name": pa.array(lrg[nk].astype(str)),
            "n_name": pa.array(lnm[nk].astype(str)),
            "rev": t["o_totalprice"].cast(pa.float64()),
        })

    out = (joined.map_batches(resolve, batch_format="pyarrow")
                 .groupby(["r_name", "n_name"])
                 .aggregate(Count(alias_name="n_orders"),
                            Sum(on="rev", alias_name="revenue"))
                 .to_pandas())
    return pa.table({
        "r_name": pa.array(out["r_name"]),
        "n_name": pa.array(out["n_name"]),
        "n_orders": pa.array(out["n_orders"].astype("int64")),
        "revenue": pa.array(np.round(out["revenue"].to_numpy(), 2)),
    })


SQL_ORDERS_ENRICH = """
SELECT r.r_name, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(CAST(o.o_totalprice AS DOUBLE)), 2) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY 1, 2
"""


def q_events_pivot(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def widen(t: pa.Table) -> pa.Table:
        et = t["event_type"].combine_chunks()
        cols = {"user_id": t["user_id"].cast(pa.int64())}
        for name in EVENT_TYPES:
            cols[f"n_{name}"] = pc.equal(et, name).cast(pa.int64())
        return pa.table(cols)

    aggs = [Sum(on=f"n_{n}", alias_name=f"n_{n}") for n in EVENT_TYPES]
    out = (ev.map_batches(widen, batch_format="pyarrow")
             .groupby("user_id").aggregate(*aggs).to_pandas())
    data = {"user_id": pa.array(out["user_id"].astype("int64"))}
    for n in EVENT_TYPES:
        data[f"n_{n}"] = pa.array(out[f"n_{n}"].astype("int64"))
    return pa.table(data)


SQL_EVENTS_PIVOT = """
SELECT CAST(user_id AS BIGINT) AS user_id,
""" + ",\n".join(
    f"       CAST(COUNT(*) FILTER (WHERE event_type = '{n}') AS BIGINT)"
    f" AS n_{n}" for n in EVENT_TYPES
) + """
FROM events GROUP BY 1
"""


QUERIES = {
    "lineitem_pricing": q_lineitem_pricing,
    "orders_enrich": q_orders_enrich,
    "events_pivot": q_events_pivot,
}

ORACLES = {
    "lineitem_pricing": SQL_LINEITEM_PRICING,
    "orders_enrich": SQL_ORDERS_ENRICH,
    "events_pivot": SQL_EVENTS_PIVOT,
}
