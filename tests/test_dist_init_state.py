"""Distributed (per-partition worker task) initial-state build vs the
driver-side assembly: bit-equal state AND identical downstream runs.

The distributed path is the default above
``superstep._DIST_INIT_MIN_V`` vertices for programs declaring
``partitionwise_init = True`` (PR/CC/LP); these tests force it on small
graphs by monkeypatching the threshold so CI exercises both code paths
on the same input.
"""

import numpy as np
import pytest

import essentials_rd.superstep as ss
from essentials_rd.algorithms.cc import ConnectedComponentsProgram
from essentials_rd.algorithms.lp import LabelPropagationProgram
from essentials_rd.algorithms.pagerank import PageRankProgram

from .conftest import small_graph


def _random_edges(n=40, m=120, seed=11):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(src[keep] * np.int64(n) + dst[keep])
    return pairs // n, pairs % n


def _state_rows(ds, cols):
    """(vid-sorted state rows, per-part metric rows) from an init state
    Dataset, as plain comparable dicts."""
    rows = ds.take_all()
    state = sorted(
        ({c: r[c] for c in ["vid", "part"] + cols}
         for r in rows if r["kind"] == 0),
        key=lambda r: r["vid"],
    )
    metrics = sorted(
        ({"part": r["part"], "sp": r["sp"], "nmsg": r["nmsg"],
          "delta": r["delta"], "vid": r["vid"]}
         for r in rows if r["kind"] == 3),
        key=lambda r: r["part"],
    )
    return state, metrics


@pytest.mark.parametrize("mk_prog,cols", [
    (lambda g: PageRankProgram(g.n_vertices), ["value", "outdeg"]),
    (lambda g: ConnectedComponentsProgram(), ["label", "active"]),
    (lambda g: LabelPropagationProgram(), ["label"]),
])
def test_init_state_paths_bit_equal(tmp_path, monkeypatch, mk_prog, cols):
    src, dst = _random_edges()
    # isolated vertex 1000 exercises the degree-miss branch both ways
    vids = np.unique(np.concatenate([src, dst, [1000]]))
    g = small_graph(tmp_path, src, dst, P=4, vertex_ids=vids)
    prog = mk_prog(g)
    prog._i32_dst = True

    drv = _state_rows(ss._make_init_state_driver(prog, g), cols)
    dist = _state_rows(ss._make_init_state_distributed(prog, g), cols)
    assert drv == dist
    # the distributed build is exactly one block per partition
    assert ss._make_init_state_distributed(prog, g).num_blocks() == 4


def test_pagerank_identical_under_forced_distributed_init(tmp_path, monkeypatch):
    from essentials_rd.algorithms import connected_components, pagerank
    from essentials_rd.algorithms.cc import components_table
    from essentials_rd.algorithms.pagerank import pagerank_table

    src, dst = _random_edges(seed=7)
    g = small_graph(tmp_path, src, dst, P=3)

    res0 = pagerank(g, tol=1e-10, max_iters=40, checkpoint_every=0)
    t0 = pagerank_table(res0)
    c0 = components_table(
        connected_components(g, max_iters=50, checkpoint_every=0))

    monkeypatch.setattr(ss, "_DIST_INIT_MIN_V", 0)
    res1 = pagerank(g, tol=1e-10, max_iters=40, checkpoint_every=0)
    t1 = pagerank_table(res1)
    c1 = components_table(
        connected_components(g, max_iters=50, checkpoint_every=0))

    assert res0.supersteps == res1.supersteps
    assert np.asarray(t0["vid"]).tolist() == np.asarray(t1["vid"]).tolist()
    assert np.asarray(t0["pagerank"]).tolist() == np.asarray(t1["pagerank"]).tolist()
    assert np.asarray(c0["label"]).tolist() == np.asarray(c1["label"]).tolist()


def test_driver_path_still_default_below_threshold(tmp_path):
    src, dst = _random_edges(seed=5)
    g = small_graph(tmp_path, src, dst, P=2)
    prog = PageRankProgram(g.n_vertices)
    # tiny graph, partitionwise-capable program -> driver path
    assert g.n_vertices < ss._DIST_INIT_MIN_V
    assert prog.partitionwise_init is True
