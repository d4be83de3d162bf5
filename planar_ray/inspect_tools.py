"""On-disk graph validation — parity with the reference's manual
checkers (`/root/reference/planar/planar_check.cpp:41-128`, which dumps
subgraph/block CSR files for eyeballing, and
`/root/reference/nvme/run/check_pram_block.cpp:1-161`).

``check_graph`` validates a partitioned graph root the way those tools
validate bins, but against OUR on-disk contract (meta_<dir>.json +
per-partition src-sorted parquet):

* manifest integrity — boundaries strictly increasing, cover [0, V];
  per-partition row counts sum to num_edges;
* per-partition payloads — parquet row count matches the manifest,
  src within the partition's vertex range, src monotone non-decreasing
  (the CSR build precondition), dst within [0, V);
* CSR reconstruction — degree sum equals the row count (offset array
  consistency, the reference's GetOutOffset rebuild invariant).

Offline single-machine tool (like the reference executables): it reads
each partition file sequentially; at cluster scale run it per-partition
inside ``map_batches`` instead. Returns a report dict; ``errors`` empty
means the graph is sound.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from .util import read_json


def check_graph(root: str, direction: str | None = None) -> dict:
    """Validate one graph root. ``direction=None`` checks every stored
    direction (meta_*.json present)."""
    directions = []
    if direction is not None:
        directions = [direction]
    else:
        for f in sorted(os.listdir(root)):
            if f.startswith("meta_") and f.endswith(".json"):
                directions.append(f[len("meta_"):-len(".json")])
    report: dict = {"root": root, "directions": {}, "errors": []}
    err = report["errors"].append
    if not directions:
        err(f"{root}: no meta_<direction>.json manifests found")
    for d in directions:
        meta = read_json(os.path.join(root, f"meta_{d}.json"))
        V = int(meta["num_vertices"])
        E = int(meta["num_edges"])
        bounds = np.asarray(meta["boundaries"], dtype=np.int64)
        dres: dict = {"num_vertices": V, "num_edges": E,
                      "num_parts": len(bounds) - 1, "parts": []}
        report["directions"][d] = dres
        if bounds[0] != 0 or bounds[-1] != V:
            err(f"{d}: boundaries must cover [0, {V}], got "
                f"[{bounds[0]}, {bounds[-1]}]")
        if not np.all(np.diff(bounds) > 0):
            err(f"{d}: boundaries not strictly increasing")
        part_rows = {int(k): int(v) for k, v in meta["part_rows"].items()}
        if sum(part_rows.values()) != E:
            err(f"{d}: manifest part_rows sum {sum(part_rows.values())} "
                f"!= num_edges {E}")
        for p in range(len(bounds) - 1):
            begin, end = int(bounds[p]), int(bounds[p + 1])
            path = os.path.join(root, d, f"part={p:05d}", "edges.parquet")
            claimed = part_rows.get(p, 0)
            pstat = {"part": p, "begin": begin, "end": end, "rows": 0,
                     "max_degree": 0}
            dres["parts"].append(pstat)
            if not os.path.exists(path):
                if claimed:
                    err(f"{d}/part{p}: manifest claims {claimed} edges "
                        f"but edges.parquet is missing")
                continue
            try:
                tab = pq.read_table(path)
            except Exception as e:  # corrupt file
                err(f"{d}/part{p}: unreadable parquet ({e})")
                continue
            src = tab["src"].to_numpy()
            dst = tab["dst"].to_numpy()
            pstat["rows"] = len(src)
            if len(src) != claimed:
                err(f"{d}/part{p}: row count {len(src)} != manifest "
                    f"{claimed}")
            if len(src):
                if src.min() < begin or src.max() >= end:
                    err(f"{d}/part{p}: src outside vertex range "
                        f"[{begin}, {end})")
                if not np.all(np.diff(src) >= 0):
                    err(f"{d}/part{p}: src not sorted (CSR precondition)")
                if dst.min() < 0 or dst.max() >= V:
                    err(f"{d}/part{p}: dst outside [0, {V})")
                deg = np.bincount(src - begin, minlength=end - begin)
                pstat["max_degree"] = int(deg.max())
                if int(deg.sum()) != len(src):
                    err(f"{d}/part{p}: degree sum != rows (offset rebuild "
                        f"would be inconsistent)")
            bdir = os.path.join(root, d, f"part={p:05d}", "blockbin")
            if os.path.isdir(bdir):
                # S8 payload beside the parquet: self-verify (degree
                # prefix sums vs sampled index) AND cross-check the
                # vertex range + edge count against the manifest — a
                # stale payload is the failure the engine loader rejects
                from .blockbin import read_block_bin

                pstat["blockbin"] = True
                try:
                    bb, be, _ip, bix = read_block_bin(
                        os.path.join(root, d, f"part={p:05d}"))
                    if (bb, be) != (begin, end):
                        err(f"{d}/part{p}: blockbin range [{bb},{be}) != "
                            f"manifest [{begin},{end}) (stale payload)")
                    if len(bix) != claimed:
                        err(f"{d}/part{p}: blockbin edge count {len(bix)} "
                            f"!= manifest {claimed}")
                except Exception as e:
                    err(f"{d}/part{p}: blockbin invalid ({e})")
    report["ok"] = not report["errors"]
    return report
