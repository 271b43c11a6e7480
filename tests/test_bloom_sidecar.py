"""write_bloom_sidecars / read_partitioned_bloom (sinks.py): no false
negatives for any present key, real partition skipping for absent
keys, exact row filtering of false positives, all-skip returns
None."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from essentials_rd.sinks import (
    read_partitioned_bloom,
    write_bloom_sidecars,
    write_partitioned,
)
from essentials_rd.util import np_col

P = 8


def _build(tmp, n=400, seed=3):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "c": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        "v": pa.array(rng.integers(0, 100, n).astype(np.int64)),
    })
    d = str(tmp / "part")
    write_partitioned(rd.from_arrow(t), d,
                      lambda b: np_col(b, "k"), P)
    write_bloom_sidecars(d, P, "c")
    return d, t


def test_no_false_negatives_and_exact_rows(tmp_path):
    d, t = _build(tmp_path)
    c = np.asarray(t["c"])
    v = np.asarray(t["v"])
    for val in np.unique(c)[:10]:
        ds, n_open, n_skip = read_partitioned_bloom(d, P, "c", int(val))
        assert ds is not None
        got = sorted(ds.to_pandas()["v"].tolist())
        want = sorted(v[c == val].tolist())
        assert got == want  # exact filter prunes false positives
        assert n_open + n_skip == P


def test_absent_key_skips_partitions(tmp_path):
    d, _ = _build(tmp_path)
    opened = []
    for val in range(1000, 1040):  # absent values
        ds, n_open, n_skip = read_partitioned_bloom(d, P, "c", val)
        opened.append(n_open)
        if ds is not None:
            assert len(ds.to_pandas()) == 0  # false positive -> 0 rows
    # with 8k bits over ~50 keys/partition, most probes skip everything
    assert sum(opened) < 40 * P // 4
    assert min(opened) == 0  # at least one full skip happened


def test_all_skip_returns_none(tmp_path):
    # one-partition layout with a single value: any other value gives
    # a clean None at reasonable false-positive odds over many tries
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "c": pa.array([7], pa.int64())})
    d = str(tmp_path / "one")
    write_partitioned(rd.from_arrow(t), d, lambda b: np_col(b, "k"), 1)
    write_bloom_sidecars(d, 1, "c")
    hits = sum(
        1 for val in range(100, 200)
        if read_partitioned_bloom(d, 1, "c", val)[0] is not None)
    assert hits <= 2  # ~8 bits set of 8192: fp rate ~ (8/8192)^8 ≈ 0
