"""Regression tests for the second round-4 review pass (docs / events /
checkpoint / ingest / util / multimodal / partition_quality): nested
join payloads, phase-log staleness, empty-batch guards, shared BFS."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# hash_bucket_join must carry list-typed payload columns (Acero rejects
# nested non-key columns; they ride a row-index take around the join)
# ---------------------------------------------------------------------------

def test_hash_bucket_join_list_payloads_both_sides():
    import ray.data as rd

    from planar_ray.joins import hash_bucket_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 3], pa.int64()),
        "lv": pa.array([[1, 10], [2], [3, 30], [33]], pa.list_(pa.int64())),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 3, 4], pa.int64()),
        "rv": pa.array([[20], [300, 3000], [4]], pa.list_(pa.int64())),
        "flat": pa.array([200, 333, 444], pa.int64()),
    }))
    out = hash_bucket_join(left, right, left_on="k", right_on="rk"
                           ).to_pandas().sort_values(
        ["k", "flat"]).reset_index(drop=True)
    rows = [(r.k, list(r.lv), list(r.rv), r.flat) for r in out.itertuples()]
    assert sorted(rows) == [
        (2, [2], [20], 200),
        (3, [3, 30], [300, 3000], 333),
        (3, [33], [300, 3000], 333),
    ]


def test_hash_bucket_join_list_payload_left_outer():
    import ray.data as rd

    from planar_ray.joins import hash_bucket_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "lv": pa.array([[7], [8, 9]], pa.list_(pa.int64())),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2], pa.int64()),
        "rv": pa.array([[5]], pa.list_(pa.int64())),
    }))
    out = hash_bucket_join(left, right, left_on="k", right_on="rk",
                           how="left").to_pandas().sort_values(
        "k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2]
    assert list(out["lv"][0]) == [7] and list(out["lv"][1]) == [8, 9]
    assert out["rv"][0] is None or (
        not isinstance(out["rv"][0], (list, np.ndarray)))
    assert list(out["rv"][1]) == [5]


def test_pair_jaccards_distributed_matches_broadcast(monkeypatch):
    """Force the at-scale (join) verify path and pin it to the broadcast
    path's results — this was the runtime-confirmed crash."""
    import ray.data as rd

    from planar_ray.pipelines import docs

    cand = rd.from_arrow(pa.table({
        "doc_a": pa.array([0, 1, 2], pa.int64()),
        "doc_b": pa.array([1, 2, 3], pa.int64()),
    }))
    want = docs.pair_jaccards(SF, cand).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    monkeypatch.setattr(docs, "BROADCAST_VERIFY_MAX", 0)
    got = docs.pair_jaccards(SF, cand).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    assert got["doc_a"].tolist() == want["doc_a"].tolist()
    assert got["doc_b"].tolist() == want["doc_b"].tolist()
    np.testing.assert_allclose(got["jaccard"], want["jaccard"])


# ---------------------------------------------------------------------------
# PhaseLog: committing phase k drops a previous run's later phases
# ---------------------------------------------------------------------------

def test_phaselog_complete_invalidates_later_phases(tmp_path):
    from planar_ray.checkpoint import PhaseLog

    d = str(tmp_path / "run")
    t0 = pa.table({"x": pa.array([1], pa.int64())})
    log = PhaseLog(d)
    log.complete(0, {"a": t0}, {"run": "old"})
    log.complete(1, {"a": t0}, {"run": "old"})
    assert log.latest()[0] == 1

    # fresh run over the same dir re-commits phase 0 then dies: latest()
    # must NOT resume the old run's phase 1
    log2 = PhaseLog(d)
    log2.complete(0, {"a": t0}, {"run": "new"})
    phase, meta = log2.latest()
    assert phase == 0 and meta["run"] == "new"


# ---------------------------------------------------------------------------
# multimodal: empty batches and the shared decode/weights 'model'
# ---------------------------------------------------------------------------

def test_feature_extractor_empty_batch():
    from planar_ray.pipelines.multimodal import FeatureExtractor

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "payload": pa.array([], pa.binary())})
    out = FeatureExtractor()(empty)
    assert out.num_rows == 0
    assert out.schema.field("feature").type == pa.list_(pa.float64())


def test_frame_sampler_first_frame_matches_feature_extractor():
    """A payload shorter than one frame has exactly one frame == the
    whole payload, so its frame feature must equal the doc feature —
    the two stages share one decode signal and one weight matrix."""
    from planar_ray.pipelines.multimodal import (FeatureExtractor,
                                                 FrameSampler)

    payload = b"short payload under one frame"
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "payload": pa.array([payload], pa.binary())})
    doc_feat = FeatureExtractor()(t)["feature"][0].as_py()
    frames = FrameSampler()(t)
    assert frames.num_rows == 1
    assert frames["frame_idx"][0].as_py() == 0
    assert frames["feature"][0].as_py() == doc_feat


# ---------------------------------------------------------------------------
# corpus cache: a crashed (marker-less) partial write is replaced, not
# appended to
# ---------------------------------------------------------------------------

def test_write_corpus_replaces_partial_dir(tmp_path):
    import os

    import pyarrow.parquet as pq

    from planar_ray.corpus import TINY, corpus_table, write_corpus

    want = corpus_table(TINY).num_rows
    partial = str(tmp_path / "corpus" / TINY.tag)
    os.makedirs(partial)
    # a previous run died after writing data but before the marker
    pq.write_table(pa.table({"repo": pa.array(["junk"])}),
                   os.path.join(partial, "corpus-0.parquet"))
    out = write_corpus(TINY, str(tmp_path), use_ray=False)
    got = pq.read_table(out)
    assert got.num_rows == want
    assert "content" in got.schema.names  # stale junk file gone
    # idempotent: marker present, second call reuses
    assert write_corpus(TINY, str(tmp_path), use_ray=False) == out


# ---------------------------------------------------------------------------
# partition_quality: one shared BFS run, same assignments
# ---------------------------------------------------------------------------

def test_bfs_assigns_accept_shared_rank(tmp_path):
    import ray.data as rd

    from planar_ray.graph import partition_edges
    from planar_ray.partition_quality import (_bfs_rank_deg, bfs_assign,
                                              bfs_capped_assign)

    rng = np.random.default_rng(5)
    src = rng.integers(0, 80, 500)
    dst = rng.integers(0, 80, 500)
    keep = src != dst
    g = partition_edges(
        rd.from_arrow(pa.table({"src": pa.array(src[keep].astype(np.int64)),
                                "dst": pa.array(dst[keep].astype(np.int64))})),
        str(tmp_path / "g"), 80, 4, "fwd")
    rank, deg = _bfs_rank_deg(g)
    ids = np.arange(80, dtype=np.int64)
    np.testing.assert_array_equal(
        bfs_assign(g, 4)(ids), bfs_assign(g, 4, rank, deg)(ids))
    np.testing.assert_array_equal(
        bfs_capped_assign(g, 20)(ids), bfs_capped_assign(g, 20, rank)(ids))
