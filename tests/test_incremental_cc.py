"""cc_incremental (algorithms/cc.py) vs scratch recompute: bit-exact
label equality over base ∪ delta for merges, untouched components, new
vertices, self-loops and the empty delta; bucket-count invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.algorithms.cc import cc_incremental
from essentials_rd.reference_impl import cc_ref


def _edges(src, dst):
    return rd.from_arrow(pa.table({
        "src": pa.array(np.asarray(src, np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, np.int64), pa.int64()),
    }))


def _labels_ds(vids, src, dst):
    lab = cc_ref(np.asarray(vids, np.int64),
                 np.asarray(src, np.int64), np.asarray(dst, np.int64))
    return rd.from_arrow(pa.table({
        "vid": pa.array(np.asarray(vids, np.int64), pa.int64()),
        "label": pa.array(lab, pa.int64()),
    }))


def _collect(ds) -> dict[int, int]:
    rows = ds.take_all()
    assert len({r["vid"] for r in rows}) == len(rows)  # one row per vid
    return {r["vid"]: r["label"] for r in rows}


def _scratch(vids, bs, bd, ds_, dd):
    s = np.r_[np.asarray(bs, np.int64), np.asarray(ds_, np.int64)]
    d = np.r_[np.asarray(bd, np.int64), np.asarray(dd, np.int64)]
    lab = cc_ref(np.asarray(vids, np.int64), s, d)
    return dict(zip([int(v) for v in vids], [int(x) for x in lab]))


def test_incremental_matches_scratch_random():
    rng = np.random.default_rng(7)
    n = 60
    bs = rng.integers(0, n, 70).astype(np.int64)
    bd = rng.integers(0, n, 70).astype(np.int64)
    keep = bs != bd
    bs, bd = bs[keep], bd[keep]
    vids = np.arange(n, dtype=np.int64)
    ds_, dd = rng.integers(0, n, 25).astype(np.int64), \
        rng.integers(0, n, 25).astype(np.int64)
    out = cc_incremental(_labels_ds(vids, bs, bd), _edges(ds_, dd),
                         num_buckets=4)
    allv = np.unique(np.r_[vids, ds_, dd])
    assert _collect(out) == _scratch(allv, bs, bd, ds_, dd)


def test_incremental_new_vertices_and_self_loops():
    vids = np.array([0, 1, 2, 3], np.int64)
    bs, bd = np.array([0], np.int64), np.array([1], np.int64)
    # delta: bridge 2-3, attach NEW vertices 10-11 to 3, lone new
    # vertex via self-loop 20-20, and a new-new edge 30-31
    ds_ = np.array([2, 10, 11, 20, 30], np.int64)
    dd = np.array([3, 3, 10, 20, 31], np.int64)
    out = cc_incremental(_labels_ds(vids, bs, bd), _edges(ds_, dd),
                         num_buckets=3)
    allv = np.unique(np.r_[vids, ds_, dd])
    assert _collect(out) == _scratch(allv, bs, bd, ds_, dd)


def test_incremental_empty_delta_is_identity():
    vids = np.array([5, 6, 7], np.int64)
    bs, bd = np.array([5], np.int64), np.array([6], np.int64)
    out = cc_incremental(_labels_ds(vids, bs, bd),
                         _edges(np.array([], np.int64),
                                np.array([], np.int64)))
    assert _collect(out) == {5: 5, 6: 5, 7: 7}


def test_incremental_bucket_invariance():
    rng = np.random.default_rng(9)
    n = 40
    bs = rng.integers(0, n, 50).astype(np.int64)
    bd = rng.integers(0, n, 50).astype(np.int64)
    keep = bs != bd
    bs, bd = bs[keep], bd[keep]
    vids = np.arange(n, dtype=np.int64)
    ds_ = rng.integers(0, n + 10, 20).astype(np.int64)
    dd = rng.integers(0, n + 10, 20).astype(np.int64)
    a = cc_incremental(_labels_ds(vids, bs, bd), _edges(ds_, dd),
                       num_buckets=2)
    b = cc_incremental(_labels_ds(vids, bs, bd),
                       _edges(ds_, dd).repartition(5), num_buckets=16)
    assert _collect(a) == _collect(b)
