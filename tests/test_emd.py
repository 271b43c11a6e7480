"""emd_profile (ops.py) vs brute-force step-integral reference:
exact integer Wasserstein-1 numerator, identical inputs (W1 = 0),
constant shift (W1 = shift), layout invariance."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import emd_profile


def _ds(vals):
    return rd.from_arrow(pa.table({
        "c": pa.array(np.asarray(vals, np.int64), pa.int64())}))


def _w1_num(a, b):
    """Reference: n_a*n_b*W1 via the step integral over the union grid
    (independent implementation — per-point CDF scan, no cumsum)."""
    a, b = np.asarray(a, np.int64), np.asarray(b, np.int64)
    vals = np.unique(np.r_[a, b])
    tot = 0
    for x, nxt in zip(vals[:-1], vals[1:]):
        ca = int((a <= x).sum())
        cb = int((b <= x).sum())
        tot += abs(ca * len(b) - cb * len(a)) * int(nxt - x)
    return tot


def _got_num(t):
    return int(np.asarray(t.column("contrib"), np.int64).sum())


def test_emd_matches_brute_force():
    rng = np.random.default_rng(61)
    a = rng.integers(0, 50, 300)
    b = rng.integers(10, 80, 200)
    t = emd_profile(_ds(a), _ds(b), "c")
    assert _got_num(t) == _w1_num(a, b)
    # cum columns really are the per-side CDF counts at each value
    v = np.asarray(t.column("v"), np.int64)
    ca = np.asarray(t.column("cum_a"), np.int64)
    cb = np.asarray(t.column("cum_b"), np.int64)
    assert (v == np.unique(np.r_[a, b])).all()
    assert ca[-1] == len(a) and cb[-1] == len(b)
    assert int(t.column("gap")[-1].as_py()) == 0


def test_emd_identical_is_zero_and_shift_is_exact():
    a = np.array([1, 2, 2, 3, 9])
    assert _got_num(emd_profile(_ds(a), _ds(a), "c")) == 0
    # W1 between X and X + s is exactly s: numerator = s * n_a * n_b
    s = 7
    t = emd_profile(_ds(a), _ds(a + s), "c")
    assert _got_num(t) == s * len(a) * len(a)


def test_emd_layout_invariance():
    rng = np.random.default_rng(62)
    a = rng.integers(0, 30, 500)
    b = rng.integers(0, 30, 400)
    t1 = emd_profile(_ds(a), _ds(b), "c", num_buckets=2)
    t2 = emd_profile(_ds(a).repartition(7), _ds(b).repartition(3),
                     "c", num_buckets=16)
    assert t1.equals(t2)
    assert _got_num(t1) == _w1_num(a, b)


def test_emd_empty_sides():
    t = emd_profile(_ds([]), _ds([]), "c")
    assert t.num_rows == 0
