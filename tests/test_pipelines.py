"""Training-data pipeline ops: dedup suite, ANN, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_groups_are_consistent():
    from planar_ray.pipelines.docs import q_doc_minhash_dedup

    tab = q_doc_minhash_dedup(SF).to_pandas()
    assert len(tab) == 500
    # representative is a member of the corpus and <= every member's id
    assert (tab["group_rep"] <= tab["doc_id"]).all()


def test_simhash_similar_docs_close():
    """SimHash of a doc vs itself with one word changed: small hamming."""
    import pyarrow as pa

    from planar_ray.pipelines.docs import SimHasher

    sh = SimHasher()
    base = "the quick brown fox jumps over the lazy dog " * 20
    var = base.replace("lazy", "sleepy")
    t = sh(pa.table({"doc_id": [1, 2], "text": [base, var]}))
    a, b = t["simhash"].to_pylist()
    ham = bin(np.uint64(a).astype(np.int64) ^ np.uint64(b).astype(np.int64)).count("1")
    assert ham <= 16
    other = sh(pa.table({"doc_id": [3], "text": ["completely different words entirely"]}))
    ham2 = bin(int(np.uint64(a)) ^ int(np.uint64(other["simhash"][0].as_py()))).count("1")
    assert ham2 > ham


def test_lsh_topk_recall_against_brute_force():
    from planar_ray.pipelines.ann import q_ann_lsh_topk, q_ann_topk

    brute = q_ann_topk(SF).to_pandas()
    approx = q_ann_lsh_topk(SF).to_pandas()
    # every approx hit must be a real vector, and per-query top-1 should
    # appear when the query's own bucket contains it (self-sim = 1.0)
    assert set(approx.columns) == {"query_id", "vec_id", "sim"}
    for q in approx["query_id"].unique():
        a = approx[approx["query_id"] == q]
        assert (a["sim"] <= 1.0 + 1e-9).all()
        # the query itself lives in its own bucket -> rank-1 recall
        assert q in set(a["vec_id"])
    assert len(brute) == 50


def test_mm_feature_schema_and_determinism():
    from planar_ray.pipelines.multimodal import FeatureExtractor, q_mm_features

    tab = q_mm_features(SF)
    assert tab.column_names == ["doc_id", "n_bytes", "feature"]
    feats = tab["feature"].to_pylist()
    assert all(len(f) == 8 for f in feats)
    tab2 = q_mm_features(SF)
    assert tab.equals(tab2)

    import pytest as _pt

    from planar_ray.pipelines.multimodal import decode_image

    with _pt.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_real_decode_stage():
    """Round 5: decode_image is REAL (codecs.py). The real-decode
    feature path decodes PPM/BMP payloads and histograms the pixels;
    compressed formats still raise naming the missing codec."""
    import numpy as np
    import pyarrow as pa

    from planar_ray.codecs import encode_ppm
    from planar_ray.pipelines.multimodal import FeatureExtractor

    img = np.arange(3 * 4 * 3, dtype=np.uint8).reshape(3, 4, 3)
    fx = FeatureExtractor(use_real_decode=True)
    out = fx(pa.table({"doc_id": [1], "payload": [encode_ppm(img)]}))
    assert out.num_rows == 1
    assert len(out["feature"][0].as_py()) == 8
    with pytest.raises(NotImplementedError, match="JPEG"):
        fx(pa.table({"doc_id": [2], "payload": [b"\xff\xd8 fake"]}))
    with pytest.raises(ValueError, match="unrecognised"):
        fx(pa.table({"doc_id": [3], "payload": [b"zz"]}))