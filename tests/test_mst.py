"""Borůvka spanning forest vs NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from planar_ray.kernels.mst import boruvka, boruvka_oracle
from tests.test_kernels import CASES, make_graph, wcc_oracle


@pytest.mark.parametrize("name", ["simple", "two_cliques", "tri_tail", "star"])
def test_boruvka_matches_oracle(name, tmp_root):
    edges, n = CASES[name]
    g = make_graph(edges, f"{tmp_root}/mst_{name}")
    labels, forest = boruvka(g)
    want_labels, want_forest = boruvka_oracle(edges, n)
    got_forest = sorted(map(tuple, forest[["src", "dst"]].to_numpy()))
    assert got_forest == [tuple(map(int, e)) for e in want_forest], name
    assert (labels["label"].to_numpy() == want_labels).all(), name
    # structural invariants: forest spans each weak component
    comp = wcc_oracle(edges, n)
    n_comps = len(set(comp.tolist()))
    assert len(got_forest) == n - n_comps