"""Maximal independent set — deterministic-priority Luby peeling.

Not a reference app — a north-rule-family addition in the same
vertex-kernel style as LPA/coloring (SURVEY.md §7.5). Each vertex gets
a fixed priority p(v) = splitmix64(v) (a bijection on uint64, so
priorities are distinct); a vertex joins the MIS exactly when every
smaller-priority neighbor has decided (joined or been excluded) and
none of its neighbors joined. With FIXED priorities the parallel
peeling converges to the unique greedy-by-priority MIS — the same set
at any parallelism, round schedule, or message latency — which is what
makes the splitmix64-in-SQL oracle possible (parallel-round unroll and
BSP both reach the same fixpoint).

Message flow is decision-driven: a vertex decided in superstep s sends
each neighbor one (mis, sm) pair — ``mis``: did the source join (any
MIS neighbor excludes an undecided target), ``sm``: does the source's
priority beat the target's (counts toward the target's
all-smaller-decided gate). Work per superstep is O(edges incident to
just-decided vertices); progress is guaranteed because the
minimum-priority undecided vertex always clears its gate.

Expects a graph whose stored ``fwd`` direction is ALREADY symmetric and
deduplicated with self-loops dropped (the g2 co-occurrence graph and
``sym_dedup_edges`` both are), like kernels/kcore.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ..graph import CSRPart, Graph
from ..superstep import Engine, Kernel
from ..util import splitmix64

UNDECIDED, IN_MIS, EXCLUDED = 0, 1, 2


class MISKernel(Kernel):
    name = "mis"
    direction = "fwd"  # pass an already-symmetric deduped graph
    columns = {
        "val": pa.int64(),      # 0 undecided / 1 in MIS / 2 excluded
        "smaller": pa.int64(),  # S(v): #neighbors with smaller priority
        "sd": pa.int64(),       # decided smaller-priority neighbors so far
        "mis": pa.int64(),      # wire: #newly-MIS neighbors this superstep
        "sm": pa.int64(),       # wire: #newly-decided smaller-prio nbrs
        "active": pa.int8(),    # just decided -> notifies neighbors next
        "decided": pa.int64(),
        "in_msgs": pa.int64(),
    }

    @property
    def message_columns(self):
        return ["mis", "sm"]

    def init_cols(self, part, begin, end, csr: CSRPart):
        n = end - begin
        v = np.arange(begin, end, dtype=np.int64)
        counts, nbrs = csr.neighbors_flat(v)
        pv = splitmix64(v.astype(np.uint64))
        pn = splitmix64(nbrs.astype(np.uint64))
        lt = (pn < np.repeat(pv, counts)).astype(np.int64)
        ends = np.cumsum(counts)
        cs = np.concatenate([[0], np.cumsum(lt)])
        smaller = cs[ends] - cs[ends - counts]
        # local minima (no smaller-priority neighbor) join immediately
        # and form the first scatter frontier
        join = smaller == 0
        return {"val": join.astype(np.int64),
                "smaller": smaller,
                "sd": np.zeros(n, np.int64),
                "mis": np.zeros(n, np.int64),
                "sm": np.zeros(n, np.int64),
                "active": join.astype(np.int8),
                "decided": join.astype(np.int64),
                "in_msgs": np.zeros(n, np.int64)}

    def scatter(self, csr: CSRPart, v, cols):
        counts, nbrs = csr.neighbors_flat(v)
        if len(nbrs) == 0:
            return None
        src = np.repeat(v, counts)
        mis_e = np.repeat((cols["val"] == IN_MIS).astype(np.int64), counts)
        sm_e = (splitmix64(src.astype(np.uint64))
                < splitmix64(nbrs.astype(np.uint64))).astype(np.int64)
        order = np.argsort(nbrs, kind="stable")
        tgt = nbrs[order]
        uniq, starts = np.unique(tgt, return_index=True)
        return {"v": uniq,
                "mis": np.add.reduceat(mis_e[order], starts),
                "sm": np.add.reduceat(sm_e[order], starts)}

    def apply(self, begin, end, state, msgs, ctx):
        n = end - begin
        mis_in = np.zeros(n, np.int64)
        sm_in = np.zeros(n, np.int64)
        in_msgs = np.zeros(n, np.int64)
        if len(msgs["v"]):
            loc = (msgs["v"] - begin).astype(np.int64)
            np.add.at(mis_in, loc, msgs["mis"].astype(np.int64))
            np.add.at(sm_in, loc, msgs["sm"].astype(np.int64))
            np.add.at(in_msgs, loc, 1)
        v = state["v"]
        lv = v - begin
        val = state["val"].astype(np.int64)
        sd = state["sd"] + sm_in[lv]
        und = val == UNDECIDED
        excl_new = und & (mis_in[lv] > 0)
        join_new = und & ~excl_new & (sd == state["smaller"])
        val = np.where(join_new, IN_MIS, np.where(excl_new, EXCLUDED, val))
        newly = join_new | excl_new
        return {"v": v, "val": val, "smaller": state["smaller"], "sd": sd,
                "mis": mis_in[lv], "sm": sm_in[lv],
                "active": newly.astype(np.int8),
                "decided": newly.astype(np.int64),
                "in_msgs": in_msgs[lv]}

    stats_spec = [("decided", "decided", "sum"), ("in_msgs", "in_msgs", "sum")]

    def converged(self, stats, superstep):
        return int(stats.get("decided") or 0) == 0


def mis(graph: Graph, max_supersteps: int = 200, run_dir=None,
        checkpoint_every=0, resume=False, check_input: bool = True,
        **engine_kw):
    """Run the MIS peel to fixpoint; returns (state, engine). ``val`` is
    1 for MIS members, 2 for excluded vertices (0 never survives
    convergence on a nonempty graph).

    ``check_input`` runs the sampled symmetry/self-loop gate
    (kcore.assert_symmetric_sample) so a directed store fails loudly
    instead of peeling with one-sided exclusions."""
    if check_input:
        from .kcore import assert_symmetric_sample

        assert_symmetric_sample(graph)
    eng = Engine(graph, MISKernel(), run_dir=run_dir,
                 checkpoint_every=checkpoint_every, **engine_kw)
    state = eng.run(max_supersteps=max_supersteps, resume=resume)
    return state, eng


def mis_oracle(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Sequential greedy-by-priority oracle: returns a bool mask of MIS
    membership over vertices 0..n-1 of the symmetric edge list."""
    order = np.argsort(splitmix64(np.arange(n, dtype=np.uint64)),
                       kind="stable")
    adj = [[] for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
    in_mis = np.zeros(n, bool)
    blocked = np.zeros(n, bool)
    for v in order:
        if not blocked[v]:
            in_mis[v] = True
            for u in adj[v]:
                blocked[u] = True
    return in_mis
