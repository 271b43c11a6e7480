"""Gonzalez k-center selection (ann.kcenter_select) vs a brute-force
reference with the same quantize/seed/tie-break contract, planted
far-apart clusters (the greedy must pick one exemplar per cluster
before any second member), and block-layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ann import kcenter_select


def _ds(ids, mat, blocks=1):
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([list(map(float, r))
                                         for r in mat],
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _brute(ids, mat, k, scale=1_000_000):
    q = np.floor(np.asarray(mat, np.float32).astype(np.float64)
                 * float(scale)).astype(np.int64)
    ids = np.asarray(ids, np.int64)
    sel = [int(np.argmin(ids))]
    rows = [(0, int(ids[sel[0]]), 0)]
    for r in range(1, k):
        d2 = np.full(len(ids), np.iinfo(np.int64).max, np.int64)
        for s in sel:
            diff = q - q[s]
            d2 = np.minimum(d2, (diff * diff).sum(1))
        mask = np.ones(len(ids), bool)
        mask[sel] = False
        cand = np.flatnonzero(mask)
        best = cand[np.lexsort((ids[cand], -d2[cand]))[0]]
        sel.append(int(best))
        rows.append((r, int(ids[best]), int(d2[best])))
    return rows


def test_kcenter_matches_brute_force_and_layout():
    rng = np.random.default_rng(2)
    ids = rng.permutation(80).astype(np.int64) + 10
    mat = rng.normal(0, 0.3, (80, 8)).astype(np.float32)
    want = _brute(ids, mat, 5)
    got1 = kcenter_select(_ds(ids, mat, 1), k=5).to_pylist()
    got6 = kcenter_select(_ds(ids, mat, 6), k=5).to_pylist()
    t1 = [(r["sel_round"], r["vec_id"], r["d2"]) for r in got1]
    assert t1 == want
    assert got1 == got6


def test_kcenter_planted_clusters_one_each():
    # 3 tight clusters far apart; k=3 must take one from each
    rng = np.random.default_rng(7)
    centers = np.array([[0.0] * 4, [5.0] * 4, [-5.0, 5, -5, 5]])
    mat, ids, owner = [], [], []
    for ci, c in enumerate(centers):
        for i in range(10):
            mat.append(c + rng.normal(0, 0.01, 4))
            ids.append(ci * 100 + i)
            owner.append(ci)
    got = kcenter_select(_ds(np.array(ids), np.array(mat,
                                                     np.float32)),
                         k=3).to_pylist()
    picked_owner = sorted(r["vec_id"] // 100 for r in got)
    assert picked_owner == [0, 1, 2]
    assert got[0]["d2"] == 0 and got[1]["d2"] > got[2]["d2"] > 0
