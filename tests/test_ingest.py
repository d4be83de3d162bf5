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


def test_extractor_equals_findall_oracle_property():
    """PROPERTY: for arbitrary content, the vectorised per-line extractor
    emits exactly the (kind, dst) sequence of the full-content findall
    oracle, in order. Holds because the IMPORT_RE classes exclude \\n (a
    match can never span lines) and the unanchored rescan keeps the
    suffix past each match (findall's continue-after-match)."""
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from planar_ray.ingest import IMPORT_RE, ImportExtractor, _resolve_token

    FRAGS = [
        "require('", "')", "re('", "'", ")", "(", "import ", "import",
        " ", "\n", "\t", ";", '"', "use ", "requi", "x", ".", "/", ":",
        "std_fs", "pkg_a.mod_b", "pkg_a/mod_b", "ext__orgA__projB",
        "ghost_m", "a.b.c", "\r\n", "\v", "\f",
    ]

    @given(st.lists(st.sampled_from(FRAGS), max_size=25),
           st.sampled_from(["js", "py", "go", "rs", "java"]))
    @settings(max_examples=300, deadline=None)
    def check(frags, lang):
        content = "".join(frags)
        tab = pa.table({
            "repo": ["r/p"], "path": ["f"], "commit": ["c0"],
            "lang": [lang], "content": [content],
        })
        got = ImportExtractor()(tab)["imports"][0].as_py()
        want = []
        for tok in IMPORT_RE[lang].findall(content):
            res = _resolve_token(tok, lang)
            if res is not None:
                want.append({"kind": res[0], "dst": res[1]})
        assert got == want, (content, got, want)

    check()
