"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself before importing this module:
nothing here (or in planar_ray) calls ``ray.init`` / ``ray.shutdown``.

* ``entry()`` — flagship pipeline: synthetic source-code corpus (the
  BASELINE.json input_hint schema) -> import-edge extraction -> dense-id
  partitioned graph -> PageRank to convergence; returns the per-vertex
  rank table.
* ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2): graph kernels over two deterministic graphs derived
  from the testdata tables (with SQL oracles), the corpus pipelines
  (rows-only), and the training-data ops (dedup / text / ANN / events).
* ``oracle_sql()`` — DuckDB-equivalent SQL for every oracle-checkable
  query, column names matched exactly.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    import ray.data as rd

    from planar_ray import corpus, graph as G, ingest
    from planar_ray.kernels import pagerank

    # per-process dir: two concurrent drivers must not collide
    root = f"/tmp/planar_ray_cache/entry_flagship_{os.getpid()}"
    ds = corpus.corpus_dataset(corpus.TINY)
    files = ingest.extract_files(ds, concurrency=4)
    edges = ingest.build_edges(files, num_partitions=4)
    g, vdict = G.build_graph(edges, root, num_parts=4)
    state, _eng = pagerank(g, max_supersteps=100)
    ranks = state.select_columns(["v", "val"])
    from planar_ray.joins import hash_bucket_join

    keyed = hash_bucket_join(ranks, vdict.select_columns(["key", "v"]),
                             left_on="v", right_on="v")
    return keyed.select_columns(["key", "val"])


def queries() -> dict[str, Callable[[str], Any]]:
    from planar_ray.pipelines import testdata_graph as tg

    out: dict[str, Callable[[str], Any]] = {}
    out.update(tg.QUERIES)

    try:
        from planar_ray.pipelines import docs as _docs

        out.update(_docs.QUERIES)
    except ImportError:
        pass
    try:
        from planar_ray.pipelines import ann as _ann

        out.update(_ann.QUERIES)
    except ImportError:
        pass
    try:
        from planar_ray.pipelines import events as _events

        out.update(_events.QUERIES)
    except ImportError:
        pass
    try:
        from planar_ray.pipelines import multimodal as _mm

        out.update(_mm.QUERIES)
    except ImportError:
        pass
    try:
        from planar_ray.pipelines import corpus_queries as _cq

        out.update(_cq.QUERIES)
    except ImportError:
        pass
    try:
        from planar_ray.pipelines import relational as _rel

        out.update(_rel.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from planar_ray.pipelines import testdata_graph as tg

    out: dict[str, str] = {}
    out.update(tg.ORACLES)
    try:
        from planar_ray.pipelines import docs as _docs

        out.update(_docs.ORACLES)
    except ImportError:
        pass
    try:
        from planar_ray.pipelines import ann as _ann

        out.update(_ann.ORACLES)
    except ImportError:
        pass
    try:
        from planar_ray.pipelines import events as _events

        out.update(_events.ORACLES)
    except ImportError:
        pass
    try:
        from planar_ray.pipelines import multimodal as _mm

        out.update(_mm.ORACLES)
    except ImportError:
        pass
    try:
        from planar_ray.pipelines import relational as _rel

        out.update(_rel.ORACLES)
    except ImportError:
        pass
    return out
