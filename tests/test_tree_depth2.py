"""tree_depth2 / _best_split (mlfit.py) vs an independent sklearn-free
reference: exhaustive float-gini argmin agreement on random bounded
features, planted two-level structure recovered exactly, pure-side
NULL leaf, single-band root NULL, layout invariance."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from essentials_rd.mlfit import _best_split, tree_depth2


def _run(b1, b2, y, parts=1):
    t = pa.table({"b1": pa.array(b1, pa.int64()),
                  "b2": pa.array(b2, pa.int64()),
                  "y": pa.array(y, pa.int64())})
    ds = rd.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return tree_depth2(
        ds,
        lambda t: t.column("b1").to_numpy(),
        lambda t: t.column("b2").to_numpy(),
        lambda t: t.column("y").to_numpy(),
    ).to_pandas().set_index("node")


def _ref_split(b, y):
    """Exhaustive float weighted-gini argmin (independent formula)."""
    bands = np.sort(np.unique(b))
    if len(bands) < 2:
        return None
    best, best_t = None, None
    n = len(b)
    for t in bands[:-1]:
        l, r = y[b <= t], y[b > t]
        gl = 1 - (l.mean()) ** 2 - (1 - l.mean()) ** 2
        gr = 1 - (r.mean()) ** 2 - (1 - r.mean()) ** 2
        g = (len(l) * gl + len(r) * gr) / n
        if best is None or g < best - 1e-12:
            best, best_t = g, int(t)
    return best_t, best


def test_tree_matches_float_reference():
    rng = np.random.default_rng(5)
    b1 = rng.integers(0, 8, 2000)
    b2 = rng.integers(0, 6, 2000)
    y = ((b1 >= 5).astype(int) ^ (b2 >= 3).astype(int)
         | (rng.random(2000) < 0.1)).astype(np.int64)
    got = _run(b1, b2, y)
    rt, rg = _ref_split(b1, y)
    assert int(got.loc["root", "thr"]) == rt
    assert abs(got.loc["root", "gini"]
               - math.floor(rg * 1e6 + 0.5) / 1e6) <= 1e-6
    for name, mask in (("left", b1 <= rt), ("right", b1 > rt)):
        st, sg = _ref_split(b2[mask], y[mask])
        assert int(got.loc[name, "thr"]) == st
        assert int(got.loc[name, "n"]) == int(mask.sum())
        assert int(got.loc[name, "n_pos"]) == int(y[mask].sum())


def test_tree_planted_structure():
    # y = 1 exactly when b1 > 4 and b2 > 2: root must split at 4,
    # right child at 2, left child is pure-0 (any split scores equal
    # -> smallest threshold picked, gini stays 0)
    rng = np.random.default_rng(8)
    b1 = rng.integers(0, 10, 3000)
    b2 = rng.integers(0, 6, 3000)
    y = ((b1 > 4) & (b2 > 2)).astype(np.int64)
    got = _run(b1, b2, y)
    assert int(got.loc["root", "thr"]) == 4
    assert int(got.loc["right", "thr"]) == 2
    assert got.loc["left", "gini"] == 0.0 or np.isnan(
        got.loc["left", "gini"])


def test_tree_single_band_root_null():
    y = np.array([0, 1, 0, 1], np.int64)
    got = _run(np.zeros(4, np.int64), np.arange(4) % 2, y)
    assert len(got) == 1  # unsplit root emits no children
    assert np.isnan(got.loc["root", "thr"]) or got.loc[
        "root", "thr"] is None or pd.isna(got.loc["root", "thr"])


def test_tree_layout_invariance():
    rng = np.random.default_rng(21)
    b1 = rng.integers(0, 12, 4000)
    b2 = rng.integers(0, 12, 4000)
    y = rng.integers(0, 2, 4000)
    one = _run(b1, b2, y, parts=1)
    many = _run(b1, b2, y, parts=9)
    pd.testing.assert_frame_equal(one, many)


def test_best_split_exact_rational_ordering():
    # two candidates whose float ginis agree to ~1e-17 but whose exact
    # rationals differ: the integer criterion must pick the truly
    # smaller one deterministically
    items = [(0, 3, 1), (1, 3, 2), (2, 3, 1)]
    pick = _best_split(items)
    assert pick is not None
    thr, num, den = pick
    # recompute both candidate keys by hand and confirm the min won
    keys = {}
    N = 9
    P = 4
    nl = pl = 0
    for band, n, p in items[:-1]:
        nl += n
        pl += p
        nr, pr = N - nl, P - pl
        ql, qr = nl - pl, nr - pr
        nm = nl * (nr * nr - pr * pr - qr * qr) \
            + nr * (nl * nl - pl * pl - ql * ql)
        keys[band] = ((nm << 40) // (nl * nr), band)
    assert thr == min(keys.values())[1]
