"""Delta-message coreness (CorenessDeltaKernel): same fixpoint as the
dense h-index kernel, validated against the independent NumPy peel
oracle, across both exchange modes, the grouped wire, and
checkpoint/resume — plus the traffic claim itself (post-bootstrap
message volume strictly below the dense kernel's rounds x 2E)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from tests.test_round5d import _directed_random_graph, _sym_random_graph


@pytest.mark.parametrize("seed", [5, 23])
def test_coreness_delta_matches_oracle(tmp_root, seed):
    from planar_ray.kernels.coreness import coreness, coreness_oracle

    g, edges, V = _sym_random_graph(tmp_root, seed, tag="symg5e")
    state, eng = coreness(g, mode="delta")
    assert eng.metrics[-1].changed == 0
    tab = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    got = tab["val"].to_numpy().astype(np.int64)
    assert np.array_equal(got, coreness_oracle(edges, V))


def test_coreness_delta_ships_less_than_dense(tmp_root):
    """The design claim: identical values, and total post-bootstrap
    message volume well under the dense kernel's (which rescatters all
    2E estimates every round)."""
    from planar_ray.kernels.coreness import coreness

    g, edges, V = _sym_random_graph(tmp_root, seed=11, tag="symg5e_traffic")
    dstate, deng = coreness(g, mode="dense")
    sstate, seng = coreness(g, mode="delta")
    dt = dstate.select_columns(["v", "val"]).to_pandas().sort_values("v")
    st = sstate.select_columns(["v", "val"]).to_pandas().sort_values("v")
    assert np.array_equal(dt["val"].to_numpy(), st["val"].to_numpy())
    dense_msgs = sum(m.in_msgs for m in deng.metrics)
    # skip the bootstrap superstep (full-cache fill, = one dense round)
    delta_tail = sum(m.in_msgs for m in seng.metrics[1:])
    E = len(edges)
    assert seng.metrics[0].in_msgs == E  # bootstrap fills every slot
    assert delta_tail < dense_msgs / 2
    # the tail claim: late rounds ship only the changed frontier's
    # edges, a small fraction of E (the dense kernel ships E per round)
    assert all(m.in_msgs < E / 4 for m in seng.metrics[-2:])


def test_coreness_delta_dataset_mode_parity(tmp_root):
    from planar_ray.kernels.coreness import coreness, coreness_oracle

    g, edges, V = _sym_random_graph(tmp_root, seed=31, V=300, E=900,
                                    tag="symg5e_ds")
    state, eng = coreness(g, mode="delta", exchange="dataset")
    tab = state.select_columns(["v", "val"]).to_pandas().sort_values("v")
    got = tab["val"].to_numpy().astype(np.int64)
    assert np.array_equal(got, coreness_oracle(edges, V))


def test_coreness_delta_grouped_wire_parity(tmp_root):
    from planar_ray.kernels.coreness import coreness

    g, edges, V = _sym_random_graph(tmp_root, seed=37, num_parts=4,
                                    tag="symg5e_grp")
    flat, _ = coreness(g, mode="delta")
    grp, _ = coreness(g, mode="delta", node_groups=2)
    ft = flat.select_columns(["v", "val"]).to_pandas().sort_values("v")
    gt = grp.select_columns(["v", "val"]).to_pandas().sort_values("v")
    assert np.array_equal(ft["val"].to_numpy(), gt["val"].to_numpy())


def test_coreness_delta_checkpoint_resume(tmp_root, tmp_path):
    """Interrupt after 2 supersteps; resume must reach the
    uninterrupted fixpoint — the list-typed cache column survives the
    parquet round-trip and re-aligns with the CSR on adoption."""
    from planar_ray.kernels.coreness import coreness

    g, edges, V = _sym_random_graph(tmp_root, seed=53, tag="symg5e_ckpt")
    full, _ = coreness(g, mode="delta")
    want = full.select_columns(["v", "val"]).to_pandas().sort_values("v")

    run_dir = str(tmp_path / "coreness_delta_run")
    coreness(g, mode="delta", max_iters=2, checkpoint_every=1,
             run_dir=run_dir)
    res, _ = coreness(g, mode="delta", checkpoint_every=1, run_dir=run_dir,
                      resume=True)
    got = res.select_columns(["v", "val"]).to_pandas().sort_values("v")
    assert np.array_equal(got["val"].to_numpy(), want["val"].to_numpy())


def test_coreness_delta_rejects_directed_store(tmp_root):
    from planar_ray.kernels.coreness import coreness

    g, edges, V = _directed_random_graph(tmp_root, seed=7,
                                         tag="dirg5e_gate")
    with pytest.raises(ValueError, match="symmetric|self-loops"):
        coreness(g, mode="delta")


def test_edge_slot_index_rejects_duplicate_adjacency():
    from planar_ray.graph import CSRPart
    from planar_ray.kernels.coreness import _edge_slot_index

    csr = CSRPart(0, 2, np.array([0, 2, 3], np.int64),
                  np.array([1, 1, 0], np.uint32))
    with pytest.raises(ValueError, match="DEDUPED"):
        _edge_slot_index(csr)


def test_nested_state_column_roundtrip():
    """Engine-level contract the delta kernel rides on: list-typed
    kernel columns pass through Kernel.rows as Arrow arrays (no
    per-row Python objects) and mask/extract correctly."""
    from planar_ray.superstep import Kernel, _col_value, _mask_col

    class K(Kernel):
        name = "nested_probe"
        columns = {"val": pa.int64(), "lst": pa.list_(pa.int32())}

    k = K()
    lst = pa.ListArray.from_arrays(
        pa.array(np.array([0, 2, 3], np.int32)),
        pa.array(np.array([7, 8, 9], np.int32)))
    t = k.rows(np.zeros(2, np.int64), np.arange(2), 0,
               {"val": np.array([1, 2]), "lst": lst})
    assert t.schema.field("lst").type == pa.list_(pa.int32())
    back = _col_value(t["lst"], pa.list_(pa.int32()))
    assert isinstance(back, pa.Array)
    sub = _mask_col(back, np.array([False, True]))
    assert sub.to_pylist() == [[9]]
