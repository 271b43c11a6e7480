"""kendall_tau_b (mlfit.py) vs an O(n^2) sign-product brute force:
exact conc/disc/tie counts under heavy ties, perfect-monotone ±1,
constant-column NULL, block-layout invariance, empty input."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.mlfit import kendall_tau_b


def _ref(x: np.ndarray, y: np.ndarray):
    sx = np.sign(x[:, None] - x[None, :])
    sy = np.sign(y[:, None] - y[None, :])
    iu = np.triu_indices(len(x), 1)
    prod = sx[iu] * sy[iu]
    conc = int((prod > 0).sum())
    disc = int((prod < 0).sum())
    n = len(x)
    n0 = n * (n - 1) // 2
    ties_x = int((sx[iu] == 0).sum())
    ties_y = int((sy[iu] == 0).sum())
    if n0 == ties_x or n0 == ties_y:
        tau = None
    else:
        tau = math.floor(
            float(conc - disc)
            / math.sqrt(float(n0 - ties_x) * float(n0 - ties_y))
            * 1e6 + 0.5) / 1e6
    return n, conc, disc, ties_x, ties_y, tau


def _run(x, y, parts=1):
    t = pa.table({"x": pa.array(x, pa.int64()),
                  "y": pa.array(y, pa.int64())})
    ds = rd.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    return kendall_tau_b(ds, "x", "y").to_pandas().iloc[0]


def test_kendall_matches_bruteforce_heavy_ties():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 6, 400).astype(np.int64)
    y = (x // 2 + rng.integers(0, 3, 400)).astype(np.int64)  # dependence
    n, conc, disc, tx, ty, tau = _ref(x, y)
    got = _run(x, y)
    assert (int(got.n), int(got.conc), int(got.disc),
            int(got.ties_x), int(got.ties_y)) == (n, conc, disc, tx, ty)
    assert got.tau == tau
    assert got.tau > 0.3  # the planted dependence is visible


def test_kendall_perfect_monotone():
    x = np.arange(50, dtype=np.int64)
    assert _run(x, x * 3 + 1).tau == 1.0
    assert _run(x, -x).tau == -1.0


def test_kendall_constant_column_null():
    x = np.arange(20, dtype=np.int64)
    y = np.zeros(20, np.int64)
    assert np.isnan(_run(x, y).tau)


def test_kendall_layout_invariance():
    rng = np.random.default_rng(23)
    x = rng.integers(0, 9, 600).astype(np.int64)
    y = rng.integers(0, 4, 600).astype(np.int64)
    one = _run(x, y, parts=1)
    many = _run(x, y, parts=7)
    assert one.equals(many)


def test_kendall_empty():
    got = _run(np.zeros(0, np.int64), np.zeros(0, np.int64))
    assert int(got.n) == 0 and np.isnan(got.tau)
