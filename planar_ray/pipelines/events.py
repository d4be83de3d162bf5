"""Stream-shaped operators over the ``events`` table (batch log semantics).

Ray Data has no event-time/watermark runtime; per the streaming mapping in
SURVEY.md §2.4 these treat ``events`` as an ordered, partitioned log:

* ``events_window`` — tumbling 1-hour windows per event_type
  (GROUP BY is the window assignment; no state needed).
* ``events_sessionize`` — 30-minute-gap session windows per user:
  ``groupby(user_id).map_groups`` sorts each user's log by (ts,
  event_id) and cuts sessions with a vectorised gap scan. Ordering
  assumption: per-user logs fit a group (true for keyed logs; a user's
  events co-locate under the hash shuffle at any scale).

Both have exact SQL oracles (epoch microseconds, integer arithmetic only
— no float timestamps anywhere).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
from ray.data import Dataset

WINDOW_US = 3_600_000_000  # 1 hour
GAP_US = 1_800_000_000     # 30 min session gap


def _read_events(sf_dir: str, columns) -> Dataset:
    from ..util import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                              columns=columns)


def q_events_window(sf_dir: str) -> pa.Table:
    ev = _read_events(sf_dir, ["event_type", "ts", "value"])

    def win(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_id": pa.array(us // WINDOW_US),
                "value": t["value"],
            }
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ev.map_batches(win, batch_format="pyarrow")
        .groupby(["event_type", "window_id"])
        .aggregate(Count(alias_name="n"), Sum(on="value", alias_name="sv"))
        .to_pandas()
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"]),
            "window_id": pa.array(out["window_id"].astype("int64")),
            "n": pa.array(out["n"].astype("int64")),
            "sum_value": pa.array(np.round(out["sv"].to_numpy(), 6)),
        }
    )


SQL_EVENTS_WINDOW = f"""
SELECT event_type,
       CAST(epoch_us(ts) // {WINDOW_US} AS BIGINT) AS window_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


SESSION_BUCKETS = 64


def q_events_sessionize(sf_dir: str) -> pa.Table:
    """30-minute-gap sessions per user. Users are hash-bucketed into a
    BOUNDED number of shuffle groups and each group runs ONE vectorised
    scan over all its users (sorted (user, ts, event_id) + break mask) —
    not one Python call per user."""
    from ..util import splitmix64

    ev = _read_events(sf_dir, ["user_id", "event_id", "ts"])

    def cast_us(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (splitmix64(u.astype(np.uint64))
             % np.uint64(SESSION_BUCKETS)).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "us": t["ts"].cast(pa.int64()),
                "bucket": pa.array(b),
            }
        )

    def sessions(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = t["us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.schema([
                ("user_id", pa.int64()), ("session_id", pa.int64()),
                ("n_events", pa.int64()), ("start_us", pa.int64()),
                ("end_us", pa.int64())]).empty_table()
        order = np.lexsort((eid, us, u))
        u, us = u[order], us[order]
        new_user = np.zeros(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        brk = new_user.copy()
        brk[1:] |= np.diff(us) > GAP_US
        sid = np.cumsum(brk)
        # per-user 1-based session ids: subtract the sid at the user's head
        ustarts = np.flatnonzero(new_user)
        per_user_base = np.repeat(sid[ustarts],
                                  np.diff(np.concatenate([ustarts, [n]])))
        local_sid = sid - per_user_base + 1
        gstart = np.flatnonzero(brk)
        gend = np.concatenate([gstart[1:], [n]]) - 1
        return pa.table(
            {
                "user_id": pa.array(u[gstart]),
                "session_id": pa.array(local_sid[gstart]),
                "n_events": pa.array((gend - gstart + 1).astype(np.int64)),
                "start_us": pa.array(us[gstart]),
                "end_us": pa.array(us[gend]),
            }
        )

    out = (
        ev.map_batches(cast_us, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pyarrow")
        .to_pandas()
    )
    out = out.astype({c: "int64" for c in out.columns})
    return pa.Table.from_pandas(
        out.sort_values(["user_id", "session_id"]).reset_index(drop=True),
        preserve_index=False,
    )


SQL_EVENTS_SESSIONIZE = f"""
WITH seq AS MATERIALIZED (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {GAP_US}
               OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
sess AS (
  SELECT user_id, event_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM seq)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(us) AS BIGINT) AS start_us,
       CAST(MAX(us) AS BIGINT) AS end_us
FROM sess GROUP BY user_id, session_id
"""


HOP_US = 900_000_000  # 15-min hop; window = WINDOW_US (1 h) -> 4 windows/event
HOPS = WINDOW_US // HOP_US


def q_events_hopping(sf_dir: str) -> pa.Table:
    """Hopping (sliding) 1-hour windows every 15 min per event_type: each
    event lands in WINDOW/HOP windows — a vectorised 1->4 flat map, then
    the same aggregate shuffle as the tumbling window."""
    ev = _read_events(sf_dir, ["event_type", "ts", "value"])

    def explode(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_pylist()
        n = len(us)
        # window w (indexed by start hop) contains ts iff
        # w*HOP <= ts < w*HOP + WINDOW  =>  w in (ts-WINDOW, ts] / HOP
        last = us // HOP_US
        wid = np.repeat(last, HOPS) - np.tile(np.arange(HOPS, dtype=np.int64), n)
        keep = wid >= 0
        return pa.table(
            {
                "event_type": pa.array(np.repeat(np.asarray(et, object), HOPS)[keep]),
                "window_start_id": pa.array(wid[keep]),
                "value": pa.array(np.repeat(val, HOPS)[keep]),
            }
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ev.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_start_id"])
        .aggregate(Count(alias_name="n"), Sum(on="value", alias_name="sv"))
        .to_pandas()
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"]),
            "window_start_id": pa.array(out["window_start_id"].astype("int64")),
            "n": pa.array(out["n"].astype("int64")),
            "sum_value": pa.array(np.round(out["sv"].to_numpy(), 6)),
        }
    )


SQL_EVENTS_HOPPING = f"""
WITH hops AS MATERIALIZED (
  SELECT e.event_type, e.value,
         epoch_us(e.ts) // {HOP_US} - h.k AS window_start_id
  FROM events e CROSS JOIN (SELECT UNNEST(range({HOPS})) AS k) h
  WHERE epoch_us(e.ts) // {HOP_US} - h.k >= 0)
SELECT event_type, CAST(window_start_id AS BIGINT) AS window_start_id,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 6) AS sum_value
FROM hops GROUP BY 1, 2
"""


def q_events_asof_orders(sf_dir: str) -> pa.Table:
    """Point-in-time join: each event paired with the most recent order
    of the same customer at or before the event (joins.asof_bucket_join
    — one bucketed shuffle, vectorised merge_asof per bucket; right side
    deduped per (custkey, orderdate) by min orderkey for determinism).
    Timestamps leave as epoch microseconds (integer hash-stable)."""
    from ..joins import asof_bucket_join
    from ..util import read_parquet_clean

    ev = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = asof_bucket_join(ev, orders, left_by="user_id",
                           right_by="o_custkey", left_ts="ts",
                           right_ts="o_orderdate",
                           right_tiebreak="o_orderkey")

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "event_ts_us": pc.cast(t["ts"], pa.int64()),
            "o_orderkey": t["o_orderkey"],
            "order_ts_us": pc.cast(t["o_orderdate"], pa.int64()),
            "o_totalprice": t["o_totalprice"],
        })

    tabs = [finish(b) for b in out.iter_batches(batch_format="pyarrow")]
    empty = finish(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "o_orderkey": pa.array([], pa.int64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
        "o_totalprice": pa.array([], pa.float64()),
    }))
    return pa.concat_tables(tabs) if tabs else empty


SQL_EVENTS_ASOF_ORDERS = """
WITH o AS (
  SELECT * FROM (
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                              ORDER BY o_orderkey) AS rn
    FROM orders) WHERE rn = 1)
SELECT e.event_id, e.user_id,
       epoch_us(e.ts) AS event_ts_us,
       o.o_orderkey,
       epoch_us(o.o_orderdate) AS order_ts_us,
       o.o_totalprice
FROM events e ASOF JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


# ---------------------------------------------------------------------------
# exact distributed quantiles (round 5): two bounded passes, NO global
# sort — the scale-right selection pattern
# ---------------------------------------------------------------------------

QUANTILES = (0.5, 0.9, 0.99)
Q_BINS = 4096


def q_events_quantiles(sf_dir: str) -> pa.Table:
    """Exact per-event_type quantiles of ``value`` (the sorted element
    at index floor(q*(n-1)) — numpy 'lower' interpolation) computed in
    TWO streaming passes instead of a global sort:

      pass 1: per-batch (type, bin) histogram partials over the value
              range (driver merges types x Q_BINS counts — bounded);
      pass 2: for each (type, quantile) locate the bin holding the
              target rank, then collect that bin's DISTINCT values
              with counts (bounded: one bin's distinct values) and
              pick the exact element by residual rank.

    At 100 TB this is two map_batches scans + two tiny driver merges;
    a pathological bin (huge distinct count) would add one recursive
    refinement, not a sort."""
    ev = _read_events(sf_dir, ["event_type", "value"]).materialize()

    # min/max + counts per type: one pass of tiny partials
    def mm(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "value": t["value"].to_numpy(zero_copy_only=False)})
        g = df.groupby("event_type")["value"].agg(["min", "max", "count"])
        g = g.reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = ev.map_batches(mm, batch_format="pyarrow").to_pandas()
    stats = stats.groupby("event_type").agg(
        {"min": "min", "max": "max", "count": "sum"})
    types = sorted(stats.index)
    lo = {ty: float(stats.loc[ty, "min"]) for ty in types}
    span = {ty: max(float(stats.loc[ty, "max"]) - lo[ty], 1e-300)
            for ty in types}
    n_of = {ty: int(stats.loc[ty, "count"]) for ty in types}

    def binof(ty, vals):
        b = ((vals - lo[ty]) / span[ty] * Q_BINS).astype(np.int64)
        return np.clip(b, 0, Q_BINS - 1)

    def hist(t: pa.Table) -> pa.Table:
        tys = t["event_type"].to_pandas().to_numpy()
        vals = t["value"].to_numpy(zero_copy_only=False)
        outs = {"event_type": [], "bin": [], "n": []}
        for ty in np.unique(tys):
            m = tys == ty
            c = np.bincount(binof(ty, vals[m]), minlength=Q_BINS)
            nz = np.flatnonzero(c)
            outs["event_type"].extend([ty] * len(nz))
            outs["bin"].extend(nz.tolist())
            outs["n"].extend(c[nz].tolist())
        return pa.table({"event_type": pa.array(outs["event_type"]),
                         "bin": pa.array(outs["bin"], pa.int64()),
                         "n": pa.array(outs["n"], pa.int64())})

    hp = ev.map_batches(hist, batch_format="pyarrow").to_pandas()
    hp = hp.groupby(["event_type", "bin"])["n"].sum()

    # locate the bin of each (type, q) target rank
    need: dict[tuple, list] = {}
    for ty in types:
        counts = np.zeros(Q_BINS, np.int64)
        sub = hp.loc[ty]
        counts[sub.index.to_numpy()] = sub.to_numpy()
        cum = np.cumsum(counts)
        for q in QUANTILES:
            r = int(np.floor(q * (n_of[ty] - 1)))  # target sorted index
            b = int(np.searchsorted(cum, r + 1))
            below = int(cum[b - 1]) if b > 0 else 0
            need.setdefault((ty, b), []).append((q, r - below))

    keys = set(need)

    def collect(t: pa.Table) -> pa.Table:
        import pandas as pd

        tys = t["event_type"].to_pandas().to_numpy()
        vals = t["value"].to_numpy(zero_copy_only=False)
        rows = {"event_type": [], "value": [], "n": []}
        for ty in np.unique(tys):
            m = tys == ty
            v = vals[m]
            b = binof(ty, v)
            want = np.isin(b, [bb for (t2, bb) in keys if t2 == ty])
            if not want.any():
                continue
            vv = v[want]
            uq, cnt = np.unique(vv, return_counts=True)
            rows["event_type"].extend([ty] * len(uq))
            rows["value"].extend(uq.tolist())
            rows["n"].extend(cnt.tolist())
        return pa.Table.from_pandas(pd.DataFrame(rows),
                                    preserve_index=False)

    cand = ev.map_batches(collect, batch_format="pyarrow").to_pandas()
    if len(cand):
        cand = (cand.groupby(["event_type", "value"])["n"].sum()
                .reset_index())
    out = {"event_type": [], "q": [], "value": []}
    for (ty, b), wants in sorted(need.items()):
        sub = cand[cand["event_type"] == ty]
        v = sub["value"].to_numpy()
        c = sub["n"].to_numpy(dtype=np.int64)
        inbin = binof(ty, v) == b
        v, c = v[inbin], c[inbin]
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        for q, resid in wants:
            i = int(np.searchsorted(cum, resid + 1))
            out["event_type"].append(ty)
            out["q"].append(q)
            out["value"].append(float(v[i]))
    tab = pa.table({"event_type": pa.array(out["event_type"]),
                    "q": pa.array(out["q"], pa.float64()),
                    "value": pa.array(out["value"], pa.float64())})
    return tab


SQL_EVENTS_QUANTILES = f"""
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) - 1
           AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT r.event_type, qs.q, r.value
FROM ranked r
JOIN (VALUES {", ".join(f"({q})" for q in QUANTILES)}) qs(q)
  ON r.rk = CAST(floor(qs.q * (r.n - 1)) AS BIGINT)
"""


TOPN_K = 10


def q_events_topn(sf_dir: str) -> pa.Table:
    """Per-event_type top-{TOPN_K} users by summed ``value`` with their
    dense rank — the grouped top-n pattern.

    Plan (scale shape): each batch pre-aggregates (type, user) partial
    sums (the combiner — raw event rows never enter the shuffle), ONE
    groupby on event_type finishes the per-user totals and keeps only
    its local top-K, so the driver sees <= types * K rows. Totals are
    rounded to 6 before ranking so the float tie-break is stable
    against the SQL twin."""
    import pandas as pd

    ev = _read_events(sf_dir, ["event_type", "user_id", "value"])

    def combine(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "value": t["value"].to_numpy(zero_copy_only=False)})
        g = df.groupby(["event_type", "user_id"], sort=True)["value"].sum()
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    parts = ev.map_batches(combine, batch_format="pyarrow")

    def topk(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        tot = df.groupby(["event_type", "user_id"], sort=True)["value"] \
                .sum().reset_index()
        tot["total"] = np.round(tot["value"].to_numpy(), 6)
        tot = tot.sort_values(["total", "user_id"],
                              ascending=[False, True]).head(TOPN_K)
        tot["rk"] = np.arange(1, len(tot) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            tot[["event_type", "user_id", "total", "rk"]],
            preserve_index=False)

    out = parts.groupby("event_type").map_groups(
        topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["event_type", "rk"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


SQL_EVENTS_TOPN = f"""
WITH agg AS (
  SELECT event_type, user_id, ROUND(SUM(value), 6) AS total
  FROM events GROUP BY event_type, user_id),
r AS (
  SELECT event_type, user_id, total,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY total DESC, user_id) AS rk
  FROM agg)
SELECT event_type, user_id, total, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= {TOPN_K}
ORDER BY event_type, rk
"""


FUNNEL = ("signup", "view", "purchase")  # ordered stages


def q_events_funnel(sf_dir: str) -> pa.Table:
    """Per-user funnel progression through FUNNEL's ordered stages:
    stage k is reached at the EARLIEST event of that type strictly
    after the stage-(k-1) timestamp (min-chaining — the deterministic
    greedy funnel), missing stages report -1.

    Scale shape: users hash into SESSION_BUCKETS shuffle groups (one
    bounded groupby); each group computes ALL its users' chains with
    per-stage ``np.minimum.at`` scatters into a users-in-bucket array —
    no Python loop over users or events, and nothing but the per-user
    result rows leaves the group."""
    from ..util import splitmix64

    ev = _read_events(sf_dir, ["user_id", "event_type", "ts"])

    def cast_us(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (splitmix64(u.astype(np.uint64))
             % np.uint64(SESSION_BUCKETS)).astype(np.int64)
        return pa.table({
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "us": t["ts"].cast(pa.int64()),
            "bucket": pa.array(b),
        })

    NONE = np.int64(2**62)

    def chains(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) == 0:
            return pa.schema(
                [("user_id", pa.int64()), ("stage", pa.int64())]
                + [(f"t_{s}", pa.int64()) for s in FUNNEL]).empty_table()
        us = t["us"].to_numpy(zero_copy_only=False)
        if len(us) and us.min() < 0:
            # the -1 missing-stage sentinel (and the stage-1 gate's -1
            # floor) would collide with pre-epoch timestamps — refuse
            # loudly rather than silently diverge from the SQL twin
            raise ValueError(
                "events_funnel requires non-negative epoch timestamps")
        typ = t["event_type"].to_numpy(zero_copy_only=False)
        users, uidx = np.unique(u, return_inverse=True)
        n = len(users)
        prev = np.full(n, -np.int64(1), dtype=np.int64)  # stage-0 gate: -1
        stage_ts = []
        for s in FUNNEL:
            best = np.full(n, NONE, dtype=np.int64)
            m = (typ == s) & (us > prev[uidx]) & (prev[uidx] != NONE)
            np.minimum.at(best, uidx[m], us[m])
            stage_ts.append(best)
            prev = best
        stage = np.sum(np.stack(stage_ts) != NONE, axis=0).astype(np.int64)
        cols = {"user_id": pa.array(users), "stage": pa.array(stage)}
        for s, ts_arr in zip(FUNNEL, stage_ts):
            cols[f"t_{s}"] = pa.array(np.where(ts_arr == NONE, -1, ts_arr))
        return pa.table(cols)

    out = (ev.map_batches(cast_us, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(chains, batch_format="pyarrow")
             .to_pandas())
    out = out.astype({c: "int64" for c in out.columns})
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True),
        preserve_index=False)


def _funnel_sql() -> str:
    ctes = ["e AS MATERIALIZED (SELECT user_id, event_type, "
            "epoch_us(ts) AS us FROM events)"]
    prev = None
    for i, s in enumerate(FUNNEL, start=1):
        if prev is None:
            ctes.append(f"s{i} AS (SELECT user_id, MIN(us) AS t{i} FROM e "
                        f"WHERE event_type = '{s}' GROUP BY 1)")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, MIN(us) AS t{i} FROM e "
                f"JOIN s{i - 1} p ON p.user_id = e.user_id "
                f"WHERE e.event_type = '{s}' AND e.us > p.t{i - 1} "
                f"GROUP BY 1)")
        prev = s
    k = len(FUNNEL)
    sel = [f"COALESCE(s{i}.t{i}, -1) AS t_{s}"
           for i, s in enumerate(FUNNEL, start=1)]
    stage = " + ".join(
        f"CASE WHEN s{i}.t{i} IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(1, k + 1))
    joins = "\n".join(f"LEFT JOIN s{i} ON s{i}.user_id = u.user_id"
                      for i in range(1, k + 1))
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
u AS (SELECT DISTINCT user_id FROM e)
SELECT CAST(u.user_id AS BIGINT) AS user_id,
       CAST({stage} AS BIGINT) AS stage,
       {", ".join(sel)}
FROM u
{joins}
"""


SQL_EVENTS_FUNNEL = _funnel_sql()


QUERIES = {
    "events_window": q_events_window,
    "events_sessionize": q_events_sessionize,
    "events_hopping": q_events_hopping,
    "events_asof_orders": q_events_asof_orders,
    "events_quantiles": q_events_quantiles,
    "events_topn": q_events_topn,
    "events_funnel": q_events_funnel,
}

ORACLES = {
    "events_window": SQL_EVENTS_WINDOW,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "events_hopping": SQL_EVENTS_HOPPING,
    "events_asof_orders": SQL_EVENTS_ASOF_ORDERS,
    "events_quantiles": SQL_EVENTS_QUANTILES,
    "events_topn": SQL_EVENTS_TOPN,
    "events_funnel": SQL_EVENTS_FUNNEL,
}
