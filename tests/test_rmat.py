"""rmat_edges (sources.py): independent NumPy re-derivation of the
nibble recursion, parallelism invariance, bounds, skew sanity."""

import numpy as np

from essentials_rd.sources import rmat_edges
from essentials_rd.util import hash64


def _ref(scale, n, seed):
    mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    i = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = hash64((i + mix).view(np.int64)).view(np.uint64)
    src = np.zeros(n, np.int64)
    dst = np.zeros(n, np.int64)
    for lvl in range(scale):
        nib = ((z >> np.uint64(4 * lvl)) & np.uint64(15)).astype(np.int64)
        src += (nib >= 12) << (scale - 1 - lvl)
        dst += (((nib >= 9) & (nib < 12)) | (nib >= 15)) \
            << (scale - 1 - lvl)
    return src, dst


def _collect(ds):
    rows = ds.take_all()
    rows.sort(key=lambda r: r["i"])
    return (np.array([r["src"] for r in rows], np.int64),
            np.array([r["dst"] for r in rows], np.int64))


def test_rmat_matches_independent_derivation():
    s, d = _collect(rmat_edges(6, 500, seed=9))
    rs, rd_ = _ref(6, 500, 9)
    assert np.array_equal(s, rs) and np.array_equal(d, rd_)


def test_rmat_parallelism_invariance_bounds_and_skew():
    a = _collect(rmat_edges(8, 3000, seed=5, parallelism=2))
    b = _collect(rmat_edges(8, 3000, seed=5, parallelism=31))
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    assert a[0].min() >= 0 and a[0].max() < 256
    assert a[1].min() >= 0 and a[1].max() < 256
    # R-MAT skew: the low-id quadrant dominates — vertex ids below
    # N/4 must hold well over their uniform share of endpoints
    frac = ((a[0] < 64).sum() + (a[1] < 64).sum()) / (2 * len(a[0]))
    assert frac > 0.45  # uniform would be 0.25


def test_rmat_scale_guard():
    import pytest

    with pytest.raises(ValueError):
        rmat_edges(17, 10)
