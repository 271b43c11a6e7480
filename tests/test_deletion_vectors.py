"""Merge-on-read deletion vectors (sinks.write_deletion_vectors /
read_with_deletion_vectors): stacking commits, idempotent replays,
crash litter ignored, base files immutable."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from essentials_rd.sinks import (
    _part_dir,
    read_with_deletion_vectors,
    write_deletion_vectors,
    write_partitioned,
)
from essentials_rd.util import np_col

P = 4


def _seed(tmp_path):
    n = 500
    ds = rd.from_arrow(pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(np.arange(n) * 3 % 17, pa.int64()),
    })).repartition(3)
    out = str(tmp_path / "dv_base")
    write_partitioned(ds, out, lambda b: np_col(b, "k"), P)
    return out, n


def _live(out):
    df = read_with_deletion_vectors(out, P).to_pandas()
    return set(df["k"].tolist())


def test_deletion_vectors_stack_and_are_idempotent(tmp_path):
    out, n = _seed(tmp_path)
    base_bytes = {
        p: open(os.path.join(_part_dir(out, p), "data.parquet"), "rb").read()
        for p in range(P)
    }
    assert _live(out) == set(range(n))

    r0 = write_deletion_vectors(out, P, lambda t: np_col(t, "v") == 0,
                                commit=0)
    dead0 = {k for k in range(n) if (k * 3) % 17 == 0}
    assert _live(out) == set(range(n)) - dead0
    assert sum(r["deleted"] for r in r0.to_pylist()) == len(dead0)

    # commit 1 overlaps commit 0: only NEWLY dead rows are recorded
    r1 = write_deletion_vectors(out, P, lambda t: np_col(t, "v") < 2,
                                commit=1)
    dead1 = {k for k in range(n) if (k * 3) % 17 < 2}
    assert _live(out) == set(range(n)) - dead1
    assert sum(r["deleted"] for r in r1.to_pylist()) == len(dead1 - dead0)

    # replaying commit 1 is a no-op
    r1b = write_deletion_vectors(out, P, lambda t: np_col(t, "v") < 2,
                                 commit=1)
    assert all(r["skipped"] for r in r1b.to_pylist())
    assert _live(out) == set(range(n)) - dead1

    # base files never rewritten
    for p in range(P):
        got = open(os.path.join(_part_dir(out, p), "data.parquet"),
                   "rb").read()
        assert got == base_bytes[p]


def test_deletion_vectors_ignore_crash_litter(tmp_path):
    out, n = _seed(tmp_path)
    write_deletion_vectors(out, P, lambda t: np_col(t, "v") == 5, commit=0)
    # a crashed writer's temp sidecar must not affect the scan
    d = os.path.join(_part_dir(out, 0), "deletes")
    pq.write_table(
        pa.table({"row_idx": pa.array([0, 1, 2], pa.int64())}),
        os.path.join(d, ".tmp-deadbeef"),
    )
    dead = {k for k in range(n) if (k * 3) % 17 == 5}
    assert _live(out) == set(range(n)) - dead
