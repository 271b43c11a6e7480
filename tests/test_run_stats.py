"""sorted_run_stats (ops.py) vs a Python brute force: run counts
under the global order with partition-border and empty-partition
stitching, ndv, layout invariance, constant and all-distinct
extremes."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import sorted_run_stats
from essentials_rd.util import np_col


def _ds(key, vals, parts=1):
    t = pa.table({
        "k": pa.array(np.asarray(key, np.int64)),
        "v": pa.array(np.asarray(vals, np.int64)),
    })
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts > 1 else ds


def _got(key, vals, parts=1, n_parts=8):
    t = sorted_run_stats(_ds(key, vals, parts), "k", ["v"],
                         n_parts=n_parts)
    r = t.to_pylist()[0]
    return r["n"], r["ndv"], r["runs"]


def _brute(key, vals):
    o = np.argsort(np.asarray(key))
    v = np.asarray(vals)[o]
    runs = 1 + int((v[1:] != v[:-1]).sum()) if len(v) else 0
    return len(v), len(np.unique(v)), runs


def test_matches_bruteforce_random():
    rng = np.random.default_rng(3)
    key = rng.permutation(2000).astype(np.int64)
    vals = rng.integers(0, 7, 2000).astype(np.int64)
    assert _got(key, vals, parts=9) == _brute(key, vals)


def test_runs_span_partition_borders():
    # a single constant column: exactly ONE run no matter how many
    # range partitions the order splits into
    key = np.arange(1000, dtype=np.int64)
    vals = np.zeros(1000, np.int64)
    assert _got(key, vals, parts=7, n_parts=16) == (1000, 1, 1)


def test_all_distinct():
    key = np.arange(500, dtype=np.int64)
    vals = np.arange(500, dtype=np.int64) * 3
    assert _got(key, vals) == (500, 500, 500)


def test_layout_invariant():
    rng = np.random.default_rng(9)
    key = rng.permutation(1500).astype(np.int64)
    vals = (np.sin(key / 50) * 3).astype(np.int64)
    a = _got(key, vals, parts=1, n_parts=4)
    b = _got(key, vals, parts=13, n_parts=4)
    c = _got(key, vals, parts=13, n_parts=16)
    assert a == b == c == _brute(key, vals)
