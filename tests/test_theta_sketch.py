"""bottom_k_hashes: equality with the direct bottom-k over all
distinct keys, block-layout invariance, and KMV estimator accuracy."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import bottom_k_hashes
from essentials_rd.util import hash64


def _ds(keys, parallelism=1):
    d = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())}))
    if parallelism > 1:
        d = d.repartition(parallelism)
    return d


def _kf(b):
    return b.column("k").to_numpy(zero_copy_only=False)


def test_matches_direct_bottom_k():
    rng = np.random.default_rng(53)
    keys = rng.integers(0, 10**9, 5000).tolist()
    got = bottom_k_hashes(_ds(keys, 5), _kf, 32)
    want = np.unique(hash64(np.unique(np.array(keys, np.int64))))[:32]
    assert np.array_equal(got, want)


def test_layout_invariance_and_short_sets():
    keys = list(range(10))
    a = bottom_k_hashes(_ds(keys, 1), _kf, 64)
    b = bottom_k_hashes(_ds(keys * 3, 4), _kf, 64)  # dups collapse
    assert np.array_equal(a, b)
    assert len(a) == 10  # set smaller than k -> whole set


def test_kmv_estimate_accuracy():
    n = 20000
    keys = np.arange(n, dtype=np.int64)
    k = 256
    sk = bottom_k_hashes(_ds(keys.tolist(), 3), _kf, k)
    est = (k - 1) * 2.0 ** 64 / float(int(sk[-1]))
    assert abs(est - n) / n < 0.15  # ~1/sqrt(k) relative error
