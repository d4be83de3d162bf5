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


def test_multi_require_per_line_matches_oracle():
    """A js line with SEVERAL require() calls must yield every edge the
    findall oracle sees (the unanchored-pattern extract loop), plus an
    anchored-language control that still emits exactly one."""
    import pyarrow as pa

    tab = pa.table({
        "repo": ["orgX/projY"] * 4,
        "path": ["src/pkg_a/mod_b.js", "src/pkg_a/mod_c.js",
                 "src/pkg_a/multi.js", "src/pkg_a/solo.py"],
        "commit": ["c0"] * 4,
        "lang": ["js", "js", "js", "py"],
        "content": [
            "exports.b = 1\n",
            "exports.c = 1\n",
            # two requires on ONE line + one on its own line
            "const b = require('pkg_a/mod_b'); const c = require('pkg_a/mod_c')\n"
            "const s = require('std_fs')\n",
            "import pkg_a.mod_b\nimport pkg_a.mod_b\n",
        ],
    })
    ds = rd.from_arrow(tab)
    files = ingest.extract_files(ds, concurrency=2)
    edges = ingest.build_edges(files, num_partitions=2)
    got = {
        (r["src_key"], r["dst_key"], r["kind"])
        for r in edges.to_pandas().to_dict("records")
    }
    want = ingest.oracle_edges(tab)
    assert got == want
    multi = {(s, d) for s, d, _ in got if s.endswith("multi.js")}
    assert multi == {
        ("orgX/projY/src/pkg_a/multi.js", "orgX/projY/src/pkg_a/mod_b.js"),
        ("orgX/projY/src/pkg_a/multi.js", "orgX/projY/src/pkg_a/mod_c.js"),
        ("orgX/projY/src/pkg_a/multi.js", "stdlib/std_fs"),
    }


def test_unanchored_rescan_cannot_fabricate_match():
    """findall resumes scanning AFTER a match; splicing the match out
    instead would concatenate the surrounding text and fabricate a match
    the oracle never sees (e.g. 'requi<match>re(..)' -> 'require(..)').
    The extractor must agree with the findall oracle on such content."""
    import pyarrow as pa

    tab = pa.table({
        "repo": ["orgX/projY"] * 2,
        "path": ["src/pkg_a/adv.js", "src/pkg_a/mod_b.js"],
        "commit": ["c0"] * 2,
        "lang": ["js", "js"],
        "content": [
            # splice-out would fabricate require('pkg_a/mod_c');
            # findall sees only pkg_a/mod_b
            "requirequire('pkg_a/mod_b')re('pkg_a/mod_c')\n"
            # nested-quote shape: match is the INNER require
            "require('a require('pkg_a/mod_b') b')\n",
            "exports.b = 1\n",
        ],
    })
    ds = rd.from_arrow(tab)
    files = ingest.extract_files(ds, concurrency=1)
    edges = ingest.build_edges(files, num_partitions=2)
    got = {
        (r["src_key"], r["dst_key"], r["kind"])
        for r in edges.to_pandas().to_dict("records")
    }
    want = ingest.oracle_edges(tab)
    assert got == want
    dsts = {d for s, d, _ in got if s.endswith("adv.js")}
    assert dsts == {"orgX/projY/src/pkg_a/mod_b.js"}
