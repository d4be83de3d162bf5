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

    # all money in integer cents / 10^-4 dollars: the grouped sums are
    # exact int64 on both sides and the one closing division of the SAME
    # integer yields bit-identical doubles (float sums would differ in
    # association order between Ray partials and DuckDB — a hash risk)
    def project(t: pa.Table) -> pa.Table:
        price_c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        disc_c = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": pa.array(np.rint(
                t["l_quantity"].to_numpy(zero_copy_only=False)
            ).astype(np.int64)),
            "base_c": pa.array(price_c),
            "disc_e4": pa.array(price_c * (100 - disc_c)),
        })

    out = (li.map_batches(project, batch_format="pyarrow")
             .groupby(["l_returnflag", "l_linestatus"])
             .aggregate(Sum(on="qty", alias_name="sum_qty"),
                        Sum(on="base_c", alias_name="base_c"),
                        Sum(on="disc_e4", alias_name="disc_e4"),
                        Count(alias_name="count_order"))
             .to_pandas())
    d4 = out["disc_e4"].to_numpy().astype(np.int64)
    return pa.table({
        "l_returnflag": pa.array(out["l_returnflag"]),
        "l_linestatus": pa.array(out["l_linestatus"]),
        "sum_qty": pa.array(out["sum_qty"].to_numpy().astype(np.float64)),
        "sum_base_price": pa.array(
            out["base_c"].to_numpy().astype(np.int64) / 100.0),
        "sum_disc_price": pa.array(((d4 + 50) // 100) / 100.0),
        "count_order": pa.array(out["count_order"].astype("int64")),
    })


SQL_LINEITEM_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0
         AS sum_base_price,
       ((SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) + 50) // 100)
         / 100.0 AS sum_disc_price,
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
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "r_name": pa.array(lrg[nk].astype(str)),
            "n_name": pa.array(lnm[nk].astype(str)),
            "rev_c": pa.array(cents),
        })

    out = (joined.map_batches(resolve, batch_format="pyarrow")
                 .groupby(["r_name", "n_name"])
                 .aggregate(Count(alias_name="n_orders"),
                            Sum(on="rev_c", alias_name="rev_c"))
                 .to_pandas())
    return pa.table({
        "r_name": pa.array(out["r_name"]),
        "n_name": pa.array(out["n_name"]),
        "n_orders": pa.array(out["n_orders"].astype("int64")),
        "revenue": pa.array(
            out["rev_c"].to_numpy().astype(np.int64) / 100.0),
    })


SQL_ORDERS_ENRICH = """
SELECT r.r_name, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
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


Q3_CUTOFF = "1998-06-01"
Q3_SEGMENT = "BUILDING"
Q3_TOPK = 10


def q_q3_shipping(sf_dir: str) -> pa.Table:
    """TPC-H Q3-style shipping-priority: customer(segment) |x| orders
    (ordered before the cutoff) |x| lineitem (shipped after it), revenue
    per order, top-10 by revenue.

    Scale shape: two hash-bucket joins on the join keys (custkey then
    orderkey — each ONE bounded shuffle of only the pruned columns),
    revenue in integer CENTS (``round(price*100) * (100 - round(disc*100))``)
    so the per-order sum is exact int64 arithmetic and the top-k ordering
    is bit-deterministic on both the Ray and DuckDB sides, then a per-block
    top-k combiner before the driver-side final k-merge (the limit never
    shuffles the full aggregate)."""
    import datetime

    from ray.data.aggregate import Sum

    from ..joins import hash_bucket_join

    cutoff = datetime.datetime.fromisoformat(Q3_CUTOFF)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], Q3_SEGMENT))
                   .select(["c_custkey"]),
        batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff))),
        batch_format="pyarrow")
    owned = hash_bucket_join(orders, cust,
                             left_on="o_custkey", right_on="c_custkey")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"])

    def cents(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff)))
        price_c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        disc_c = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "l_orderkey": t["l_orderkey"].cast(pa.int64()),
            "rev_c": pa.array(price_c * (100 - disc_c)),
        })

    joined = hash_bucket_join(li.map_batches(cents, batch_format="pyarrow"),
                              owned.map_batches(
                                  lambda t: t.select(
                                      ["o_orderkey", "o_orderdate",
                                       "o_orderpriority"]),
                                  batch_format="pyarrow"),
                              left_on="l_orderkey", right_on="o_orderkey")
    per_order = (joined.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
                       .aggregate(Sum(on="rev_c", alias_name="rev_c")))

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= Q3_TOPK:
            return t
        rev = t["rev_c"].to_numpy(zero_copy_only=False)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        keep = np.lexsort((ok, -rev))[:Q3_TOPK]
        return t.take(pa.array(np.sort(keep)))

    # per-block top-k partials, then ONE bounded driver-side merge
    out = per_order.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["rev_c", "l_orderkey"],
                          ascending=[False, True]).head(Q3_TOPK)
    return pa.table({
        "l_orderkey": pa.array(out["l_orderkey"].astype("int64")),
        "o_orderdate": pa.array(
            out["o_orderdate"].dt.strftime("%Y-%m-%d")),
        "o_orderpriority": pa.array(out["o_orderpriority"].astype(str)),
        # exact half-away-from-zero to cents, then one shared division
        "revenue": pa.array(
            ((out["rev_c"].to_numpy().astype(np.int64) + 50) // 100)
            / 100.0),
    })


SQL_Q3_SHIPPING = f"""
SELECT CAST(l.l_orderkey AS BIGINT) AS l_orderkey,
       STRFTIME(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o.o_orderpriority,
       ((SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) + 50)
        // 100) / 100.0 AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) DESC,
         l.l_orderkey ASC
LIMIT {Q3_TOPK}
"""


BLOOM_BITS = 1 << 17  # 16 KiB per partial — ships to the driver bounded
BLOOM_ACCT_MIN = 9000.0


def _bloom_positions(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two splitmix64-derived bit positions per key (k=2 Bloom)."""
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (keys.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & mask
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & mask
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & mask
    z = z ^ (z >> np.uint64(31))
    h1 = (z & np.uint64(BLOOM_BITS - 1)).astype(np.int64)
    h2 = ((z >> np.uint64(32)) & np.uint64(BLOOM_BITS - 1)).astype(np.int64)
    return h1, h2


def q_orders_semijoin(sf_dir: str) -> pa.Table:
    """Semi-join with a distributed-Bloom prefilter: orders whose customer
    has ``c_acctbal > 9000``, aggregated per order status.

    Scale shape: the filter-side key set is summarised into per-block
    16 KiB Bloom partials (map side), OR-combined on the driver (bounded:
    blocks x 16 KiB), and broadcast ONCE via ``ray.put``; the big orders
    table is pre-filtered map-side by the Bloom (no false negatives by
    construction), and only the survivors — a ~10% slice plus Bloom false
    positives — enter the ONE exact hash-bucket join that removes the
    false positives. The aggregate result is exact; the Bloom only prunes
    shuffle volume, never changes the answer."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..joins import hash_bucket_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    hot = cust.map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], BLOOM_ACCT_MIN))
                   .select(["c_custkey"]),
        batch_format="pyarrow")

    def bloom_partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        for h in _bloom_positions(keys):
            np.bitwise_or.at(bits, h >> 3, (1 << (h & 7)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    # bounded driver combine: one 16 KiB row per block
    partials = hot.map_batches(bloom_partial, batch_format="pyarrow").take_all()
    bloom = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    for row in partials:
        bloom |= np.frombuffer(row["bits"], dtype=np.uint8)
    bloom_ref = ray.put(bloom)

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderstatus", "o_totalprice"])

    def prefilter(t: pa.Table) -> pa.Table:
        b = ray.get(bloom_ref)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        h1, h2 = _bloom_positions(keys)
        hit = (b[h1 >> 3] >> (h1 & 7) & 1) & (b[h2 >> 3] >> (h2 & 7) & 1)
        return t.filter(pa.array(hit.astype(bool)))

    maybe = orders.map_batches(prefilter, batch_format="pyarrow")
    exact = hash_bucket_join(maybe, hot, left_on="o_custkey",
                             right_on="c_custkey", how="semi")

    def project(t: pa.Table) -> pa.Table:
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({"o_orderstatus": t["o_orderstatus"],
                         "price_c": pa.array(cents)})

    out = (exact.map_batches(project, batch_format="pyarrow")
                .groupby("o_orderstatus")
                .aggregate(Count(alias_name="n_orders"),
                           Sum(on="price_c", alias_name="price_c"))
                .to_pandas())
    return pa.table({
        "o_orderstatus": pa.array(out["o_orderstatus"]),
        "n_orders": pa.array(out["n_orders"].astype("int64")),
        "revenue": pa.array(
            out["price_c"].to_numpy().astype(np.int64) / 100.0),
    })


SQL_ORDERS_SEMIJOIN = f"""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders o
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey
                AND c.c_acctbal > {BLOOM_ACCT_MIN})
GROUP BY 1
"""


ANTI_CUTOFF = "2000-01-01"  # every customer has SOME order in the
                            # testdata, so "lapsed since cutoff" keeps
                            # the anti-join non-degenerate


def q_cust_antijoin(sf_dir: str) -> pa.Table:
    """TPC-H Q22-style: customers with above-average (positive) account
    balance who placed NO order since ANTI_CUTOFF (lapsed big-balance
    accounts), counted + summed per nation — the classic anti-join.

    Scale shape: pass 1 reduces customer to TWO integers (sum of
    positive balances in cents, their count) via per-batch partials; the
    above-average filter then runs map-side as an exact integer
    cross-multiplication (``cents * n > sum`` — no float threshold, so
    Ray and DuckDB agree bit-for-bit on borderline rows). The anti-join
    ships only ``o_custkey`` from orders into ONE bounded hash-bucket
    exchange (``how='anti'`` — Acero left-anti per bucket), and the
    closing groupby is #nations rows."""
    from ray.data.aggregate import Count, Sum

    from ..joins import hash_bucket_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def cents_tab(t: pa.Table) -> pa.Table:
        c = np.rint(
            t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "c_custkey": t["c_custkey"].cast(pa.int64()),
            "c_nationkey": t["c_nationkey"].cast(pa.int64()),
            "cents": pa.array(c),
        })

    cc = cust.map_batches(cents_tab, batch_format="pyarrow")

    def stat_partial(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        pos = c[c > 0]
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    parts = cc.map_batches(stat_partial, batch_format="pyarrow").take_all()
    s = sum(r["s"] for r in parts)
    n = max(1, sum(r["n"] for r in parts))

    hot = cc.map_batches(
        lambda t, _s=s, _n=n: t.filter(pa.array(
            t["cents"].to_numpy(zero_copy_only=False) * _n > _s)),
        batch_format="pyarrow")
    import datetime

    cutoff = datetime.datetime.fromisoformat(ANTI_CUTOFF)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    recent = orders.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["o_orderdate"], pa.scalar(cutoff))
        ).select(["o_custkey"]),
        batch_format="pyarrow")
    lonely = hash_bucket_join(hot, recent, left_on="c_custkey",
                              right_on="o_custkey", how="anti")
    out = (lonely.groupby("c_nationkey")
                 .aggregate(Count(alias_name="n_cust"),
                            Sum(on="cents", alias_name="cents"))
                 .to_pandas())
    return pa.table({
        "c_nationkey": pa.array(out["c_nationkey"].astype("int64")),
        "n_cust": pa.array(out["n_cust"].astype("int64")),
        "total_acctbal": pa.array(
            out["cents"].to_numpy().astype(np.int64) / 100.0),
    })


SQL_CUST_ANTIJOIN = f"""
WITH cc AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer),
stats AS (
  SELECT SUM(cents) AS s, COUNT(*) AS n FROM cc WHERE cents > 0)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       SUM(cents) / 100.0 AS total_acctbal
FROM cc, stats
WHERE cents * n > s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = cc.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{ANTI_CUTOFF}')
GROUP BY 1
"""


def q_q9_profit(sf_dir: str) -> pa.Table:
    """TPC-H Q9-style product profit: lineitem |x| part |x| supplier,
    revenue per (supplier nation, part brand) — the widest join shape in
    the suite, covering the two remaining tables (part, supplier).

    Scale shape: both dimension sides ship ONLY their pruned columns
    (partkey+brand, suppkey+nationkey) through two bounded hash-bucket
    joins against the fact table; nation names resolve from a 25-row
    broadcast lookup map-side (never shuffled); revenue accumulates in
    integer 10^-4 dollars so the grouped sums are exact int64 on both
    the Ray and DuckDB sides."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..joins import hash_bucket_join

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nkeys = nat["n_nationkey"].astype(int).to_numpy()
    lut = np.empty(int(nkeys.max()) + 1, dtype=object)
    for k, nm in zip(nkeys, nat["n_name"]):
        lut[k] = nm
    lut_ref = ray.put(lut)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def cents(t: pa.Table) -> pa.Table:
        price_c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        disc_c = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table({
            "l_partkey": t["l_partkey"].cast(pa.int64()),
            "l_suppkey": t["l_suppkey"].cast(pa.int64()),
            "rev_c": pa.array(price_c * (100 - disc_c)),
        })

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j1 = hash_bucket_join(li.map_batches(cents, batch_format="pyarrow"),
                          part, left_on="l_partkey", right_on="p_partkey")
    j2 = hash_bucket_join(j1, supp,
                          left_on="l_suppkey", right_on="s_suppkey")

    def resolve(t: pa.Table) -> pa.Table:
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = ray.get(lut_ref)
        return pa.table({
            "n_name": pa.array(names[nk].astype(str)),
            "p_brand": t["p_brand"],
            "rev_c": t["rev_c"],
        })

    out = (j2.map_batches(resolve, batch_format="pyarrow")
             .groupby(["n_name", "p_brand"])
             .aggregate(Count(alias_name="n_items"),
                        Sum(on="rev_c", alias_name="rev_c"))
             .to_pandas())
    return pa.table({
        "n_name": pa.array(out["n_name"]),
        "p_brand": pa.array(out["p_brand"]),
        "n_items": pa.array(out["n_items"].astype("int64")),
        "revenue": pa.array(
            ((out["rev_c"].to_numpy().astype(np.int64) + 50) // 100)
            / 100.0),
    })


SQL_Q9_PROFIT = """
SELECT n.n_name, p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ((SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) + 50)
        // 100) / 100.0 AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2
"""


QUERIES = {
    "lineitem_pricing": q_lineitem_pricing,
    "orders_enrich": q_orders_enrich,
    "events_pivot": q_events_pivot,
    "q3_shipping": q_q3_shipping,
    "orders_semijoin": q_orders_semijoin,
    "cust_antijoin": q_cust_antijoin,
    "q9_profit": q_q9_profit,
}

ORACLES = {
    "lineitem_pricing": SQL_LINEITEM_PRICING,
    "orders_enrich": SQL_ORDERS_ENRICH,
    "events_pivot": SQL_EVENTS_PIVOT,
    "q3_shipping": SQL_Q3_SHIPPING,
    "orders_semijoin": SQL_ORDERS_SEMIJOIN,
    "cust_antijoin": SQL_CUST_ANTIJOIN,
    "q9_profit": SQL_Q9_PROFIT,
}
