"""AMS tug-of-war F₂ sketch (ops.ams_f2): counters must equal the
brute-force sign sums, be invariant to block layout, merge by plain
addition, and the estimator must track exact F₂ = Σ c² within the
√(2/k) statistical envelope on a skewed planted distribution."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.ops import ams_f2, exact_f2, _CM_SEED
from essentials_rd.util import hash64


def _brute_sketch(keys: np.ndarray, k: int):
    out = np.zeros(k, np.int64)
    x = keys.astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = hash64((x + np.uint64((j * _CM_SEED) % (1 << 64)))
                       .view(np.int64))
            out[j] = int(np.where(h >> np.uint64(63), 1, -1).sum())
    return out


def _tbl(keys):
    return pa.table({"user_id": pa.array(keys, pa.int64())})


def test_ams_matches_bruteforce_and_layout_invariant():
    rng = np.random.default_rng(3)
    # zipf-ish skew: few heavy users dominate F2
    keys = rng.zipf(1.5, 5000) % 400
    ref = _brute_sketch(keys, 16)
    for nparts in (1, 4, 13):
        ds = rd.from_arrow(_tbl(keys)).repartition(nparts)
        sk = ams_f2(ds, "user_id", k=16)
        assert np.array_equal(np.asarray(sk["zj"]), ref), nparts
        est = int(sk["f2_est"][0].as_py())
        assert est == sum(int(z) * int(z) for z in ref) // 16


def test_ams_mergeable_by_addition():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 50, 800)
    b = rng.integers(0, 50, 1200)
    sa = np.asarray(ams_f2(rd.from_arrow(_tbl(a)), "user_id", k=8)["zj"])
    sb = np.asarray(ams_f2(rd.from_arrow(_tbl(b)), "user_id", k=8)["zj"])
    sab = np.asarray(ams_f2(rd.from_arrow(_tbl(np.concatenate([a, b]))),
                            "user_id", k=8)["zj"])
    assert np.array_equal(sa + sb, sab)


def test_ams_estimator_tracks_exact_f2():
    rng = np.random.default_rng(11)
    keys = rng.zipf(1.3, 20000) % 1000
    ds = rd.from_arrow(_tbl(keys))
    ex = exact_f2(ds, "user_id", num_buckets=8)
    counts = np.unique(keys, return_counts=True)[1]
    assert ex == int(np.sum(counts.astype(np.int64) ** 2))
    est = int(ams_f2(ds, "user_id", k=32)["f2_est"][0].as_py())
    # deterministic for this fixed input; 3σ ≈ 3·√(2/32) = 0.75
    assert abs(est - ex) <= 0.75 * ex, (est, ex)


def test_ams_empty_and_singleton():
    empty = ams_f2(rd.from_arrow(_tbl(np.array([], np.int64))),
                   "user_id", k=4)
    assert np.array_equal(np.asarray(empty["zj"]), np.zeros(4, np.int64))
    assert int(empty["f2_est"][0].as_py()) == 0
    one = ams_f2(rd.from_arrow(_tbl(np.array([42], np.int64))),
                 "user_id", k=4)
    # a single row has F2 = 1; every z_j = ±1, so the estimate is exact
    assert int(one["f2_est"][0].as_py()) == 1
