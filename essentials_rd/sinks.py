"""Resumable partitioned Parquet sink (SURVEY.md §2.3 S3 family).

The 100-TB contract (brief: "write partitioned Parquet … so a failed
run can skip finished partitions; never one giant file"):

- Output is ``out_dir/p<p>/`` directories, one per hash partition,
  each holding one Parquet file plus a ``_SUCCESS`` marker.
- Each partition commits ATOMICALLY: data is written to a dot-prefixed
  temp name in the same directory, ``os.replace``d into place, and only
  then is the marker written — a crash mid-write leaves either nothing
  or ignorable ``.tmp-*`` litter, never a half-readable partition.
- A re-run with the same ``out_dir`` drops finished partitions' rows at
  the MAP stage (before the shuffle), so the resume pays one upstream
  scan but re-shuffles and re-writes only the missing partitions.

Dataflow is the engine's standard bucketed exchange: stamp each row's
partition id in ``map_batches``, one ``groupby(part).map_groups`` where
the group task writes its own partition (streaming, nothing driver-
collected) and returns a one-row receipt.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from .util import hash64, np_col

_PART_COL = "__sink_part__"


def _part_dir(out_dir: str, p: int) -> str:
    return os.path.join(out_dir, f"p{p:05d}")  # no '=': avoids hive-partition column inference on read


def finished_partitions(out_dir: str, num_partitions: int) -> np.ndarray:
    """Partition ids whose ``_SUCCESS`` marker exists."""
    done = [
        p
        for p in range(num_partitions)
        if os.path.exists(os.path.join(_part_dir(out_dir, p), "_SUCCESS"))
    ]
    return np.asarray(done, dtype=np.int64)


def write_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    key_fn,
    num_partitions: int,
    *,
    skip_finished: bool = True,
) -> pa.Table:
    """Write ``ds`` to ``out_dir/p<p>/data.parquet`` with p =
    ``hash64(key_fn(batch)) % num_partitions``; returns the receipt
    table (part, rows, skipped) sorted by part.  With
    ``skip_finished=True`` (the default), partitions that already have
    a ``_SUCCESS`` marker are not rewritten — their rows never enter
    the shuffle."""
    os.makedirs(out_dir, exist_ok=True)
    done = set(finished_partitions(out_dir, num_partitions).tolist()) \
        if skip_finished else set()
    done_arr = np.zeros(num_partitions, dtype=bool)
    for p in done:
        done_arr[p] = True

    def _stamp(batch: pa.Table) -> pa.Table:
        p = (hash64(key_fn(batch)) % np.uint64(num_partitions)).astype(
            np.int32
        )
        batch = batch.append_column(_PART_COL, pa.array(p, pa.int32()))
        if done:
            keep = ~done_arr[p]
            if not keep.all():
                batch = batch.take(pa.array(np.flatnonzero(keep)))
        return batch

    def _write(grp: pa.Table) -> pa.Table:
        p = int(np_col(grp, _PART_COL)[0])
        grp = grp.drop_columns([_PART_COL])
        d = _part_dir(out_dir, p)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(grp, tmp)
        os.replace(tmp, os.path.join(d, "data.parquet"))
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")
        return pa.table(
            {
                "part": pa.array([p], pa.int64()),
                "rows": pa.array([grp.num_rows], pa.int64()),
                "skipped": pa.array([False], pa.bool_()),
            }
        )

    receipts = (
        ds.map_batches(_stamp, batch_format="pyarrow")
        .groupby(_PART_COL)
        .map_groups(_write, batch_format="pyarrow")
    )
    written = pa.Table.from_pylist(
        receipts.take_all(),
        schema=pa.schema(
            [("part", pa.int64()), ("rows", pa.int64()),
             ("skipped", pa.bool_())]
        ),
    )
    skipped = pa.table(
        {
            "part": pa.array(sorted(done), pa.int64()),
            "rows": pa.array([-1] * len(done), pa.int64()),
            "skipped": pa.array([True] * len(done), pa.bool_()),
        }
    )
    out = pa.concat_tables([written, skipped]).sort_by("part")
    return out


def read_partitioned(out_dir: str, num_partitions: int) -> rd.Dataset:
    """Read back ONLY finished partitions (``_SUCCESS`` present) —
    temp litter from crashed writers is never touched."""
    paths = [
        os.path.join(_part_dir(out_dir, int(p)), "data.parquet")
        for p in finished_partitions(out_dir, num_partitions)
    ]
    if not paths:
        raise FileNotFoundError(f"no finished partitions under {out_dir}")
    return rd.read_parquet(paths)
