"""ALT landmark lower bounds: admissibility (lb <= true distance) and
tightness on a path graph, via the BFS engine on small graphs."""

import numpy as np

from essentials_rd.algorithms import bfs
from essentials_rd.algorithms.bfs import depths_table
from essentials_rd.util import np_col

from .conftest import small_graph


def _depths(g, src):
    res = bfs(g, src, max_iters=64, checkpoint_every=0)
    t = depths_table(res)
    return (np_col(t, "vid").astype(np.int64),
            np_col(t, "depth").astype(np.int64))


def _alt(g, s, landmarks):
    vid, ds = _depths(g, s)
    si = int(np.searchsorted(vid, s))
    lbs = np.zeros(len(vid), np.int64)
    ok = ds >= 0
    for l in landmarks:
        _, dl = _depths(g, l)
        ok &= dl >= 0
        lbs = np.maximum(lbs, np.abs(dl - dl[si]))
    return ds, lbs, ok


def test_admissible_on_random_graph(tmp_path):
    rng = np.random.default_rng(47)
    n = 30
    src, dst = [], []
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < 0.12:
                src.append(u)
                dst.append(v)
    g = small_graph(tmp_path, src, dst, symmetrize=True)
    ds, lbs, ok = _alt(g, 0, [int(max(max(src), max(dst))), n // 2])
    assert ok.any()
    assert (lbs[ok] <= ds[ok]).all()


def test_exact_on_path_graph(tmp_path):
    # path 0-1-...-9 with landmark at the far end: the ALT bound is
    # EXACT everywhere (|d(l,v) - d(l,s)| = d(s,v) on a line)
    n = 10
    g = small_graph(tmp_path, list(range(n - 1)), list(range(1, n)),
                    symmetrize=True)
    ds, lbs, ok = _alt(g, 0, [n - 1])
    assert ok.all()
    assert (lbs == ds).all()
