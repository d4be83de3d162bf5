"""Ingest: edge extraction parity vs pure-Python oracle + sha256 invariant."""

from __future__ import annotations

import hashlib

import ray.data as rd

from planar_ray import corpus, ingest


def _pipeline_edges(spec):
    ds = rd.from_arrow(corpus.corpus_table(spec)).repartition(4)
    files = ingest.extract_files(ds, concurrency=2)
    edges = ingest.build_edges(files, num_partitions=4)
    return files, edges


def test_edges_match_oracle_tiny():
    files, edges = _pipeline_edges(corpus.TINY)
    got = {
        (r["src_key"], r["dst_key"], r["kind"])
        for r in edges.to_pandas().to_dict("records")
    }
    want = ingest.oracle_edges(corpus.corpus_table(corpus.TINY))
    assert got == want
    kinds = {k for _, _, k in got}
    assert kinds == {"contain", "file", "stdlib", "xrepo"}


def test_sha256_invariant_preserved():
    tab = corpus.corpus_table(corpus.TINY)
    files, _ = _pipeline_edges(corpus.TINY)
    got = files.to_pandas().set_index(["repo", "path"])["content_sha"].to_dict()
    for row in tab.to_pylist():
        want = hashlib.sha256(row["content"].encode()).hexdigest()
        assert got[(row["repo"], row["path"])] == want


def test_self_loops_and_ghosts_dropped():
    _, edges = _pipeline_edges(corpus.TINY)
    df = edges.to_pandas()
    assert (df["src_key"] != df["dst_key"]).all()
    assert not df["dst_key"].str.contains("ghost_").any()
