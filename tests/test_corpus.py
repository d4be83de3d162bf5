"""Corpus generator: determinism, schema, skew shape."""

from __future__ import annotations

import hashlib

import pyarrow as pa

from planar_ray import corpus


def test_schema_matches_input_hint():
    t = corpus.corpus_table(corpus.TINY)
    assert t.schema.names == ["repo", "path", "commit", "lang", "content"]
    assert t.schema.field("content").type == pa.large_string()
    assert t.num_rows >= corpus.TINY.files_target * 0.9


def test_deterministic_across_calls():
    a = corpus.corpus_table(corpus.TINY)
    b = corpus.corpus_table(corpus.TINY)
    ha = hashlib.sha256(b"".join(s.encode() for s in a["content"].to_pylist()))
    hb = hashlib.sha256(b"".join(s.encode() for s in b["content"].to_pylist()))
    assert ha.hexdigest() == hb.hexdigest()


def test_ray_path_equals_pandas_path():
    ds = corpus.corpus_dataset(corpus.TINY)
    got = ds.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    want = (
        corpus.corpus_table(corpus.TINY)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_zipf_skew():
    sizes = corpus.repo_sizes(corpus.SMALL)
    assert sizes[0] > 4 * sizes[-1]  # head repo much larger than tail


def test_langs_and_imports_present():
    t = corpus.corpus_table(corpus.TINY)
    langs = set(t["lang"].to_pylist())
    assert langs == {"py", "js", "java", "go", "rs"}
    joined = "\n".join(t["content"].to_pylist())
    assert "import " in joined and "require(" in joined and "use " in joined
    assert "std_" in joined and "ext__" in joined and "ghost_" in joined
