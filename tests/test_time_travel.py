"""versioned_log_init/commit + read_version (sinks.py): every
historical snapshot is exactly reconstructible, deletes tombstone,
upserts re-insert after delete, later versions' files are never
opened by an as-of read, an uncommitted (orphan) delta directory is
invisible, and out-of-range versions raise."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from essentials_rd.sinks import (
    read_version,
    versioned_log_commit,
    versioned_log_init,
)
from essentials_rd.util import np_col

KEY = lambda b: np_col(b, "k")  # noqa: E731


def _tbl(rows):
    ks, vs = zip(*rows) if rows else ((), ())
    return pa.table({"k": pa.array(list(ks), pa.int64()),
                     "v": pa.array(list(vs), pa.int64())})


def _delta(rows):
    ks, vs, ops = zip(*rows)
    return rd.from_arrow(pa.table({
        "k": pa.array(list(ks), pa.int64()),
        "v": pa.array(list(vs), pa.int64()),
        "op": pa.array(list(ops), pa.string())}))


def _snap(d, v):
    t = read_version(d, v, "k").to_pandas().sort_values("k")
    return list(zip(t["k"].tolist(), t["v"].tolist()))


def _build(tmp_path):
    d = str(tmp_path / "log")
    versioned_log_init(rd.from_arrow(_tbl([(1, 10), (2, 20), (3, 30)])),
                       d, KEY, num_partitions=4)
    versioned_log_commit(_delta([(2, 99, "U"), (3, 0, "D"), (4, 40, "U")]),
                         d, KEY, num_partitions=4)
    versioned_log_commit(_delta([(3, 33, "U"), (1, 0, "D")]),
                         d, KEY, num_partitions=4)
    return d


def test_every_version_reconstructs(tmp_path):
    d = _build(tmp_path)
    assert _snap(d, 0) == [(1, 10), (2, 20), (3, 30)]
    assert _snap(d, 1) == [(1, 10), (2, 99), (4, 40)]   # 3 tombstoned
    assert _snap(d, 2) == [(2, 99), (3, 33), (4, 40)]   # 3 re-inserted


def test_later_versions_never_opened(tmp_path):
    # an as-of-v1 read must not touch v2's files: corrupt them
    d = _build(tmp_path)
    v2 = os.path.join(d, "v00002")
    for root, _, files in os.walk(v2):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "w") as fh:
                    fh.write("not parquet")
    assert _snap(d, 1) == [(1, 10), (2, 99), (4, 40)]


def test_orphan_delta_dir_is_invisible(tmp_path):
    # a crash AFTER writing delta files but BEFORE the manifest swap
    # leaves an orphan directory that readers must not see
    d = _build(tmp_path)
    shutil.copytree(os.path.join(d, "v00002"), os.path.join(d, "v00003"))
    assert _snap(d, 2) == [(2, 99), (3, 33), (4, 40)]
    assert _snap(d, 99) == [(2, 99), (3, 33), (4, 40)]  # clamped to last


def test_commit_numbers_are_monotone(tmp_path):
    d = _build(tmp_path)
    v = versioned_log_commit(_delta([(5, 50, "U")]), d, KEY,
                             num_partitions=4)
    assert v == 3
    assert _snap(d, 3) == [(2, 99), (3, 33), (4, 40), (5, 50)]


def test_missing_base_raises(tmp_path):
    d = str(tmp_path / "empty")
    os.makedirs(d)
    with pytest.raises((FileNotFoundError, ValueError)):
        read_version(d, 0, "k")


def test_layout_invariant(tmp_path):
    rng = np.random.default_rng(7)
    rows = [(int(k), int(v)) for k, v in
            zip(range(200), rng.integers(0, 100, 200))]
    snaps = []
    for parts, label in ((2, "a"), (9, "b")):
        d = str(tmp_path / label)
        versioned_log_init(rd.from_arrow(_tbl(rows)).repartition(parts),
                           d, KEY, num_partitions=parts)
        versioned_log_commit(
            _delta([(k, 1, "U") for k in range(0, 200, 3)]
                   + [(k, 0, "D") for k in range(1, 200, 3)]),
            d, KEY, num_partitions=parts)
        snaps.append(_snap(d, 1))
    assert snaps[0] == snaps[1]
