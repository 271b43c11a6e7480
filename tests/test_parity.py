"""write_parity / recover_partition (sinks.py): byte-identical
single-shard recovery for every partition, double-loss refused,
recovered file is readable parquet with the right rows."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from essentials_rd.sinks import (
    _part_dir,
    recover_partition,
    write_parity,
    write_partitioned,
)
from essentials_rd.util import np_col

P = 6


def _build(tmp, n=500):
    rng = np.random.default_rng(2)
    t = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
    })
    d = str(tmp / "lay")
    write_partitioned(rd.from_arrow(t), d, lambda b: np_col(b, "k"), P)
    write_parity(d, P)
    return d


def _sha(path):
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_every_partition_recovers_byte_identical(tmp_path):
    d = _build(tmp_path)
    for p in range(P):
        f = os.path.join(_part_dir(d, p), "data.parquet")
        if not os.path.exists(f):
            continue
        want = _sha(f)
        rows_want = pq.read_table(f).num_rows
        os.remove(f)
        got = recover_partition(d, P, p)
        assert _sha(got) == want
        assert pq.read_table(got).num_rows == rows_want


def test_double_loss_refused(tmp_path):
    d = _build(tmp_path)
    a = os.path.join(_part_dir(d, 0), "data.parquet")
    b = os.path.join(_part_dir(d, 1), "data.parquet")
    os.remove(a)
    os.remove(b)
    with pytest.raises(ValueError, match="exactly one"):
        recover_partition(d, P, 0)
