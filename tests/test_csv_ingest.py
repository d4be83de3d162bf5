"""CSV edge-list ingest (S1/S2 user surface): reference-converter
semantics — self-loop drop, dense order-preserving id compaction,
multi-edges kept — checked against a pure-Python oracle."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest

from planar_ray import ingest


# vertices {0,1,3,7,9,40}; one self-loop (7,7); one duplicated edge (0,1);
# vertex 40 appears ONLY via a real edge, vertex 5 ONLY via a self-loop
LINES = [
    "0,1", "0,3", "1,2", "1,3", "2,1", "2,3", "3,2", "3,0",  # simple.csv
    "7,7", "5,5", "9,40", "40,7", "0,1",
]


def _oracle(lines):
    """(edges-after-self-loop-drop as key pairs, dense order-preserving
    id map over surviving endpoints)."""
    pairs = []
    for ln in lines:
        s, d = (int(x) for x in ln.split(","))
        if s != d:
            pairs.append((s, d))
    keys = sorted({v for e in pairs for v in e})
    vid = {k: i for i, k in enumerate(keys)}
    return pairs, vid


def _graph_edge_pairs(g):
    df = g.edges_dataset().to_pandas()
    return list(zip(df["src"].tolist(), df["dst"].tolist()))


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "edges.csv"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_graph_from_csv_matches_oracle(csv_file, tmp_path):
    g = ingest.graph_from_csv(csv_file, str(tmp_path / "g"), num_parts=3)
    want_pairs, vid = _oracle(LINES)
    # dense [0,n): exactly the surviving endpoints, order-preserving
    assert g.num_vertices == len(vid)
    got = _graph_edge_pairs(g)
    want = sorted((vid[s], vid[d]) for s, d in want_pairs)
    assert sorted(got) == want  # multi-edge (0,1) kept twice
    assert g.num_edges == len(want_pairs)
    # self-loop-only vertex 5 got no id
    ids = {v for e in got for v in e}
    assert ids == set(range(len(vid)))


def test_graph_from_csv_no_reorder(csv_file, tmp_path):
    g = ingest.graph_from_csv(csv_file, str(tmp_path / "g"), num_parts=3,
                              reorder=False)
    want_pairs, _ = _oracle(LINES)
    # raw ids, holes preserved: ranges span to max id 40
    assert g.num_vertices == 41
    assert sorted(_graph_edge_pairs(g)) == sorted(want_pairs)


def test_edges_from_csv_header_sep_and_bound(tmp_path):
    p = tmp_path / "edges.tsv"
    p.write_text("from\tto\n" + "\n".join(
        ln.replace(",", "\t") for ln in LINES) + "\n")
    ds = ingest.edges_from_csv(str(p), sep="\t", header=True)
    assert ds.schema().names == ["src", "dst"]
    assert ds.count() == len(LINES)
    bounded = ingest.edges_from_csv(str(p), sep="\t", header=True, n_edges=4)
    assert bounded.count() == 4


def test_csv_graph_runs_kernels(csv_file, tmp_path):
    """The CSV-built graph is a first-class Graph: degrees + PageRank run."""
    from planar_ray.graph import degrees_dataset
    from planar_ray.kernels import pagerank

    g = ingest.graph_from_csv(csv_file, str(tmp_path / "g"), num_parts=2)
    deg = degrees_dataset(g).to_pandas()
    assert int(deg["outdeg"].sum()) == g.num_edges
    state, eng = pagerank(g, fixed_iters=3)
    vals = state.to_pandas()
    assert len(vals) == g.num_vertices
    assert np.isfinite(vals["val"]).all()
    eng.close()


def test_cli_ingest_csv(csv_file, tmp_path, capsys):
    from planar_ray import cli

    out = str(tmp_path / "gc")
    cli.main(["ingest-csv", "--i", csv_file, "--out", out, "--parts", "2"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    _, vid = _oracle(LINES)
    assert rep["num_vertices"] == len(vid)
    assert rep["reordered"] is True
    cli.main(["check", out])
    chk = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert chk["ok"] is True


def test_cli_ingest_csv_store_strategy(csv_file, tmp_path, capsys):
    """store_strategy=unconstrained also materialises the in-edge (rev)
    CSRs; rev out-degrees are the fwd in-degrees (total edge count equal)."""
    from planar_ray import cli
    from planar_ray.graph import Graph, degrees_dataset

    out = str(tmp_path / "gs")
    cli.main(["ingest-csv", "--i", csv_file, "--out", out, "--parts", "2",
              "--store-strategy", "unconstrained"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["directions"] == ["fwd", "rev"]
    fwd, rev = Graph.load(out, "fwd"), Graph.load(out, "rev")
    assert rev.num_edges == fwd.num_edges
    fdeg = degrees_dataset(fwd).to_pandas().set_index("v")["outdeg"]
    rdeg = degrees_dataset(rev).to_pandas().set_index("v")["outdeg"]
    edges = fwd.edges_dataset().to_pandas()
    indeg = edges["dst"].value_counts()
    for v, n in indeg.items():
        assert rdeg[v] == n
    assert int(fdeg.sum()) == int(rdeg.sum())


def test_graph_from_csv_negative_and_sparse_ids(tmp_path):
    """Dense compaction must handle negative ids (order-preserving, no
    bucket wraparound) and huge sparse ids (driver memory scales with
    observed buckets, not max id)."""
    p = tmp_path / "neg.csv"
    p.write_text("-5,3\n-5,10000000000000\n3,-5\n")
    g = ingest.graph_from_csv(str(p), str(tmp_path / "g"), num_parts=2)
    assert g.num_vertices == 3  # keys -5 < 3 < 1e13 -> ids 0,1,2
    got = sorted(_graph_edge_pairs(g))
    assert got == [(0, 1), (0, 2), (1, 0)]
    # raw-id mode cannot represent negatives: clear error, not corruption
    with pytest.raises(ValueError, match="non-negative"):
        ingest.graph_from_csv(str(p), str(tmp_path / "g2"), num_parts=2,
                              reorder=False)


def test_graph_from_csv_all_self_loops_empty_graph(tmp_path):
    p = tmp_path / "loops.csv"
    p.write_text("5,5\n7,7\n")
    g = ingest.graph_from_csv(str(p), str(tmp_path / "g"), num_parts=2)
    assert g.num_vertices == 0
    assert g.num_edges == 0


def test_cli_ingest_csv_incoming_only(csv_file, tmp_path, capsys):
    """incoming = in-edge CSRs ONLY (the fwd build intermediate removed),
    matching the reference's store_strategy semantics."""
    import os

    from planar_ray import cli
    from planar_ray.graph import Graph

    out = str(tmp_path / "gi")
    cli.main(["ingest-csv", "--i", csv_file, "--out", out, "--parts", "2",
              "--store-strategy", "incoming"])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["directions"] == ["rev"]
    assert not os.path.exists(os.path.join(out, "meta_fwd.json"))
    assert not os.path.isdir(os.path.join(out, "fwd"))
    g = Graph.load(out, "rev")
    want_pairs, vid = _oracle(LINES)
    assert g.num_edges == len(want_pairs)
    cli.main(["check", out])
    chk = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert chk["ok"] is True and list(chk["directions"]) == ["rev"]


def test_edges_from_csv_gzip(tmp_path):
    """Compressed edge lists (.csv.gz — the common public-dump format)
    stream through the same reader transparently."""
    import gzip

    p = tmp_path / "edges.csv.gz"
    with gzip.open(str(p), "wt") as f:
        f.write("\n".join(LINES) + "\n")
    g = ingest.graph_from_csv(str(p), str(tmp_path / "g"), num_parts=2)
    want_pairs, vid = _oracle(LINES)
    assert g.num_vertices == len(vid)
    assert g.num_edges == len(want_pairs)
