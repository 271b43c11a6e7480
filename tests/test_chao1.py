"""chao1_estimate (ops.py) vs a Python brute force over the same
deterministic sample: exact d/f1/f2/n_sample, formula agreement,
layout invariance, full-sample degeneracy (frac=1 => chao1 >= d with
f1 from true singletons), no-doubleton denominator guard, empty
sample."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import chao1_estimate, deterministic_sample
from essentials_rd.util import np_col

FRAC, SEED = 0.3, 7


def _key(t: pa.Table) -> np.ndarray:
    return np_col(t, "rid")


def _ds(vals, parts=1):
    t = pa.table({
        "v": pa.array(np.asarray(vals, np.int64), pa.int64()),
        "rid": pa.array(np.arange(len(vals), dtype=np.int64), pa.int64()),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _brute(vals, frac=FRAC, seed=SEED):
    samp = deterministic_sample(_ds(vals), frac, _key, seed=seed)
    kept = np_col(pa.Table.from_pandas(samp.to_pandas()), "v")
    uniq, cnt = np.unique(kept, return_counts=True)
    n, d = int(cnt.sum()), len(uniq)
    f1, f2 = int((cnt == 1).sum()), int((cnt == 2).sum())
    chao1 = math.floor(
        (float(d) + float(f1 * (f1 - 1)) / float(2 * (f2 + 1)))
        * 1e6 + 0.5) / 1e6
    return n, d, f1, f2, chao1


def _got(vals, frac=FRAC, seed=SEED, parts=1):
    t = chao1_estimate(_ds(vals, parts), "v", frac, _key, seed=seed)
    r = t.to_pylist()[0]
    return (r["n_sample"], r["d"], r["f1"], r["f2"], r["chao1"])


def test_chao1_matches_bruteforce():
    rng = np.random.default_rng(11)
    vals = rng.zipf(1.6, 3000).astype(np.int64) % 500
    assert _got(vals) == _brute(vals)


def test_chao1_layout_invariant():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 200, 2500).astype(np.int64)
    assert _got(vals, parts=1) == _got(vals, parts=13)


def test_chao1_full_sample_counts_exact():
    # frac=1: the sample IS the population, so d equals the exact
    # distinct count and f1/f2 are the true singleton/doubleton counts
    vals = np.repeat(np.arange(10, dtype=np.int64),
                     [1, 1, 1, 2, 2, 3, 4, 5, 6, 7])
    n, d, f1, f2, chao1 = _got(vals, frac=1.0)
    assert (n, d, f1, f2) == (32, 10, 3, 2)
    assert chao1 == math.floor((10 + 3 * 2 / (2 * 3)) * 1e6 + 0.5) / 1e6


def test_chao1_no_doubletons_guard():
    # all-singleton sample: f2=0 must not divide by zero
    # (bias-corrected denominator 2*(f2+1))
    vals = np.arange(50, dtype=np.int64)
    n, d, f1, f2, chao1 = _got(vals, frac=1.0)
    assert (d, f1, f2) == (50, 50, 0)
    assert chao1 == float(50 + 50 * 49 / 2)


def test_chao1_empty_sample():
    n, d, f1, f2, chao1 = _got(np.arange(20, dtype=np.int64), frac=0.0)
    assert (n, d, f1, f2, chao1) == (0, 0, 0, 0, 0.0)
