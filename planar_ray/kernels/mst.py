"""Minimum spanning forest — Borůvka rounds, reference-style.

Capability parity with the reference's MST app
(/root/reference/core/apps/mst_app_op.h:101-235): the graph is
unweighted, so "minimum" means minimum edge KEY — the reference uses the
CSR edge index, which for its (src,dst)-sorted CSR is exactly the
lexicographic (src,dst) order; we key edges as ``src * V + dst`` to get
the identical total order. Each round every component picks its
minimum-key crossing edge (FindMinEdge), merge chains are resolved by
pointer jumping with deterministic 2-cycle breaking (Graft/PointJump),
and merged edges drop out (Contract). Deterministic at any parallelism;
the NumPy oracle replays the same rounds exactly.

Dataset shape per round: two label joins + per-component min
(groupby.map_groups) + a pointer-jump join loop (log rounds on the
component table, which shrinks geometrically).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..graph import Graph
from ..joins import hash_bucket_join
from ..util import splitmix64


def _crossing(edges: Dataset, labs: Dataset) -> Dataset:
    """Edges whose endpoints are in different components, with labels."""
    e = hash_bucket_join(edges, labs, left_on="src", right_on="v")
    e = e.map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"], "ekey": t["ekey"],
                            "ls": t["label"]}),
        batch_format="pyarrow",
    )
    e = hash_bucket_join(e, labs, left_on="dst", right_on="v")
    return e.map_batches(
        lambda t: t.filter(
            pa.compute.not_equal(t["ls"], t["label"])
        ).select(["src", "dst", "ekey", "ls", "label"]).rename_columns(
            ["src", "dst", "ekey", "ls", "ld"]
        ),
        batch_format="pyarrow",
    )


MIN_CHOICE_BUCKETS = 64


def _pick_min(t: pa.Table) -> pa.Table:
    """Vectorised per-component min-(ekey, to): lexsort + first-per-group
    (the combine_min idiom) — one numpy pass, not one Python call per
    component."""
    comp = t["comp"].to_numpy(zero_copy_only=False)
    to = t["to"].to_numpy(zero_copy_only=False)
    ekey = t["ekey"].to_numpy(zero_copy_only=False)
    if len(comp) == 0:
        return pa.schema([("comp", pa.int64()), ("to", pa.int64()),
                          ("ekey", pa.int64())]).empty_table()
    order = np.lexsort((to, ekey, comp))
    comp, to, ekey = comp[order], to[order], ekey[order]
    first = np.ones(len(comp), dtype=bool)
    first[1:] = comp[1:] != comp[:-1]
    return pa.table({"comp": pa.array(comp[first]), "to": pa.array(to[first]),
                     "ekey": pa.array(ekey[first])})


def _min_choice(crossing: Dataset) -> Dataset:
    """(comp, to, ekey): each component's minimum-key crossing edge.
    Per-batch combiner first, then a bounded-bucket shuffle with the same
    vectorised pick per bucket."""
    both = crossing.map_batches(
        lambda t: _pick_min(pa.table({
            "comp": pa.concat_arrays([t["ls"].combine_chunks(),
                                      t["ld"].combine_chunks()]),
            "to": pa.concat_arrays([t["ld"].combine_chunks(),
                                    t["ls"].combine_chunks()]),
            "ekey": pa.concat_arrays([t["ekey"].combine_chunks(),
                                      t["ekey"].combine_chunks()]),
        })),
        batch_format="pyarrow",
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        c = t["comp"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # shared mixer; bucket choice only places work, min-choice result
        # is bucket-invariant (each comp lands wholly in one bucket)
        b = (splitmix64(c) % np.uint64(MIN_CHOICE_BUCKETS)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    return both.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "bucket"
    ).map_groups(
        lambda t: _pick_min(t.drop_columns(["bucket"])), batch_format="pyarrow"
    )


def _resolve_roots(choice: pd.DataFrame) -> pd.DataFrame:
    """Pointer-jump the merge forest (driver-side: the CHOICE table has one
    row per component and shrinks geometrically; at 10^12 scale these
    rounds would run as dataset self-joins — same algorithm)."""
    parent = dict(zip(choice["comp"].astype(int), choice["to"].astype(int)))
    # deterministic 2-cycle break: the smaller id becomes the root
    for c, t in list(parent.items()):
        if parent.get(t) == c:
            r = min(c, t)
            parent[c] = r
            parent[t] = r
    # pointer jumping
    changed = True
    while changed:
        changed = False
        for c, p in parent.items():
            pp = parent.get(p, p)
            if pp != p:
                parent[c] = pp
                changed = True
    return pd.DataFrame({"comp": list(parent), "root": [parent[c] for c in parent]})


BROADCAST_V_MAX = 50_000_000  # dense label array broadcast cap (400 MB)


def boruvka(graph: Graph, max_rounds: int = 50,
            broadcast_threshold: int = BROADCAST_V_MAX,
            run_dir: str | None = None, resume: bool = False):
    """Returns (labels DataFrame (v, label), forest edge list DataFrame).

    Two physical plans with identical results:
    * V <= broadcast_threshold — labels live in one dense array that is
      ``ray.put`` once per round; the crossing filter is a stateless map
      against it and the label update is a vectorised driver-side apply
      (the same documented driver-array trade-off as
      pagerank_reference). One small min-choice shuffle per round.
    * beyond the threshold — labels stay a dataset and each round runs
      the two label joins (_crossing) + the min-choice shuffle; the only
      driver-side table is the per-component choice (shrinks
      geometrically), as before.

    ``run_dir`` checkpoints every completed round (labels + live edges +
    forest so far, checkpoint.PhaseLog); ``resume=True`` continues after
    the last complete round.
    """
    import ray.data as rd

    from ..checkpoint import PhaseLog
    from .triangle import canonical_edges

    plog = PhaseLog(run_dir) if run_dir else None
    V = graph.num_vertices

    # canonical (a<b) distinct pairs via the bucketed vectorised unique —
    # Ray's multi-key sort-aggregate sorted the full edge table by
    # (src,dst) and dominated MST end-to-end (32 s of 35 s at 2.4M edges);
    # self-loops drop here (they can never cross components anyway)
    def add_ekey(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(a), "dst": pa.array(b),
                         "ekey": pa.array(a * V + b)})

    edges = canonical_edges(graph.edges_dataset()).map_batches(
        add_ekey, batch_format="pyarrow").materialize()

    if V <= broadcast_threshold:
        return _boruvka_broadcast(edges, V, max_rounds, plog=plog,
                                  resume=resume)

    labs = rd.range(V).map_batches(
        lambda t: pa.table({"v": t["id"].combine_chunks().cast(pa.int64()),
                            "label": t["id"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow",
    ).materialize()

    forest: list[pd.DataFrame] = []
    start_round, done = 0, False
    if resume and plog is not None and plog.latest() is not None:
        rdone, meta = plog.latest()
        labs = plog.load(rdone, "labels").materialize()
        edges = plog.load(rdone, "edges").materialize()
        f = plog.load(rdone, "forest").to_pandas()
        if len(f):
            forest.append(f)
        start_round, done = rdone + 1, bool(meta.get("done"))
    for rnd in range(start_round, max_rounds):
        if done:
            break
        crossing = _crossing(edges, labs).materialize()
        if crossing.count() == 0:
            if plog is not None:
                plog.complete(rnd, _boruvka_ckpt(labs, edges, forest),
                              {"done": True})
            break
        # CONTRACT (reference wcc/mst Contract, mutable_block_csr_graph.h:
        # 168-263): edges inside a merged component can never cross again,
        # so the next round scans only this round's crossing set — the
        # live edge table shrinks geometrically with the components.
        edges = crossing.select_columns(["src", "dst", "ekey"])
        choice = _min_choice(crossing).to_pandas()
        # selected forest edges = distinct chosen ekeys
        sel = choice.drop_duplicates("ekey")[["ekey"]]
        forest.append(pd.DataFrame({
            "src": (sel["ekey"] // V).astype("int64"),
            "dst": (sel["ekey"] % V).astype("int64"),
        }))
        roots = _resolve_roots(choice)
        # pa.table() from typed columns: from_pandas would attach the
        # pandas schema-metadata dict that defeats Ray's schema hashing
        roots_ds = rd.from_arrow(pa.table({
            "comp": pa.array(roots["comp"].to_numpy().astype(np.int64)),
            "root": pa.array(roots["root"].to_numpy().astype(np.int64)),
        }))
        labs = hash_bucket_join(labs, roots_ds, left_on="label", right_on="comp",
                                how="left")
        labs = labs.map_batches(
            lambda t: pa.table({
                "v": t["v"],
                "label": pa.array(np.where(
                    np.isnan(t["root"].to_numpy(zero_copy_only=False).astype(np.float64)),
                    t["label"].to_numpy(zero_copy_only=False),
                    t["root"].to_numpy(zero_copy_only=False),
                ).astype(np.int64)),
            }),
            batch_format="pyarrow",
        ).materialize()
        if plog is not None:
            plog.complete(rnd, _boruvka_ckpt(labs, edges, forest),
                          {"done": False})

    labels = labs.to_pandas().sort_values("v").reset_index(drop=True)
    fedges = (
        pd.concat(forest).drop_duplicates().sort_values(["src", "dst"]).reset_index(drop=True)
        if forest else pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                     "dst": pd.Series([], dtype="int64")})
    )
    return labels, fedges


def _label_table(label: np.ndarray) -> pa.Table:
    return pa.table({"v": pa.array(np.arange(len(label), dtype=np.int64)),
                     "label": pa.array(label.astype(np.int64))})


def _boruvka_ckpt(labs, edges, forest: list) -> dict:
    """PhaseLog payload for one completed Borůvka round."""
    if forest:
        f = pd.concat(forest)[["src", "dst"]].astype("int64")
        ftab = pa.table({"src": pa.array(f["src"].to_numpy()),
                         "dst": pa.array(f["dst"].to_numpy())})
    else:
        ftab = pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    return {"labels": labs, "edges": edges, "forest": ftab}


def _boruvka_broadcast(edges: "Dataset", V: int, max_rounds: int,
                       plog=None, resume: bool = False):
    """Broadcast-label Borůvka (see boruvka): same rounds, same choices,
    same forest — the label table is a dense array updated driver-side."""
    import ray

    label = np.arange(V, dtype=np.int64)
    forest: list[pd.DataFrame] = []
    start_round, done = 0, False
    if resume and plog is not None and plog.latest() is not None:
        rdone, meta = plog.latest()
        lt = plog.load(rdone, "labels").to_pandas()
        label[lt["v"].to_numpy(dtype=np.int64)] = lt["label"].to_numpy(
            dtype=np.int64)
        edges = plog.load(rdone, "edges").materialize()
        f = plog.load(rdone, "forest").to_pandas()
        if len(f):
            forest.append(f)
        start_round, done = rdone + 1, bool(meta.get("done"))
    for rnd in range(start_round, max_rounds):
        if done:
            break
        ref = ray.put(label)

        def crossing_fn(t: pa.Table) -> pa.Table:
            lab = ray.get(ref)
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            ls, ld = lab[s], lab[d]
            keep = ls != ld
            return pa.table({
                "src": pa.array(s[keep]), "dst": pa.array(d[keep]),
                "ekey": t["ekey"].filter(pa.array(keep)),
                "ls": pa.array(ls[keep]), "ld": pa.array(ld[keep]),
            })

        crossing = edges.map_batches(crossing_fn,
                                     batch_format="pyarrow").materialize()
        if crossing.count() == 0:
            if plog is not None:
                plog.complete(rnd, _boruvka_ckpt(_label_table(label), edges,
                                                 forest), {"done": True})
            break
        edges = crossing.select_columns(["src", "dst", "ekey"])  # contract
        # per-batch combiner then a DRIVER-side final pick: the combined
        # partials are bounded by components-per-batch and the choice
        # table lands on the driver anyway (for _resolve_roots) — this
        # saves the per-round bucket shuffle of the dataset path
        partial = crossing.map_batches(
            lambda t: _pick_min(pa.table({
                "comp": pa.concat_arrays([t["ls"].combine_chunks(),
                                          t["ld"].combine_chunks()]),
                "to": pa.concat_arrays([t["ld"].combine_chunks(),
                                        t["ls"].combine_chunks()]),
                "ekey": pa.concat_arrays([t["ekey"].combine_chunks(),
                                          t["ekey"].combine_chunks()]),
            })),
            batch_format="pyarrow",
        ).to_pandas()
        choice = (
            partial.sort_values(["comp", "ekey", "to"])
            .drop_duplicates("comp", keep="first").reset_index(drop=True)
        )
        sel = choice.drop_duplicates("ekey")[["ekey"]]
        forest.append(pd.DataFrame({
            "src": (sel["ekey"] // V).astype("int64"),
            "dst": (sel["ekey"] % V).astype("int64"),
        }))
        roots = _resolve_roots(choice)
        # vectorised label apply: comp -> root via sorted lookup
        comp = roots["comp"].to_numpy(dtype=np.int64)
        root = roots["root"].to_numpy(dtype=np.int64)
        order = np.argsort(comp)
        comp, root = comp[order], root[order]
        pos = np.searchsorted(comp, label)
        pos = np.minimum(pos, max(len(comp) - 1, 0))
        hit = (len(comp) > 0) & (comp[np.minimum(pos, len(comp) - 1)] == label)
        label = np.where(hit, root[np.minimum(pos, len(comp) - 1)], label)
        if plog is not None:
            plog.complete(rnd, _boruvka_ckpt(_label_table(label), edges,
                                             forest), {"done": False})

    labels = pd.DataFrame({"v": np.arange(V, dtype=np.int64), "label": label})
    fedges = (
        pd.concat(forest).drop_duplicates().sort_values(["src", "dst"]).reset_index(drop=True)
        if forest else pd.DataFrame({"src": pd.Series([], dtype="int64"),
                                     "dst": pd.Series([], dtype="int64")})
    )
    return labels, fedges


def boruvka_oracle(edges: np.ndarray, n: int):
    """Same rounds in pure Python/NumPy."""
    und = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                  for a, b in edges if a != b})
    label = np.arange(n, dtype=np.int64)
    forest = set()
    for _ in range(50):
        choice: dict[int, tuple[int, int]] = {}
        for a, b in und:
            la, lb = int(label[a]), int(label[b])
            if la == lb:
                continue
            ekey = a * n + b
            for c, t in ((la, lb), (lb, la)):
                cur = choice.get(c)
                if cur is None or (ekey, t) < cur:
                    choice[c] = (ekey, t)
        if not choice:
            break
        parent = {c: t for c, (k, t) in choice.items()}
        for c, (k, t) in choice.items():
            forest.add((k // n, k % n))
        for c, t in list(parent.items()):
            if parent.get(t) == c:
                r = min(c, t)
                parent[c] = r
                parent[t] = r
        changed = True
        while changed:
            changed = False
            for c, p in parent.items():
                pp = parent.get(p, p)
                if pp != p:
                    parent[c] = pp
                    changed = True
        label = np.array([parent.get(int(l), int(l)) for l in label], dtype=np.int64)
    return label, sorted(forest)
