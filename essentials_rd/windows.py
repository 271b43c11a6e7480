"""Windowed / sessionized aggregation over an event stream.

Custom operators the Dataset API lacks natively (the reference engine
family has no SQL layer either): both are expressed as ONE bucketed
shuffle + vectorized per-bucket kernels, the repo's standard shape
(ops.hash_bucket_agg) — no driver materialization, linear per bucket.

- ``tumbling_window_agg``: stamp ``window = floor(epoch_us / width)``
  per row inside ``map_batches`` (stateless, no shuffle), then one
  grouped aggregation on (window, keys...).
- ``sessionize``: hash-bucket by user so each user's full event stream
  lands in one bucket; inside the bucket sort by (user, ts, event_id)
  once and derive session boundaries with vectorized diffs — the
  partitioning assumption is per-user locality, the same one any
  distributed sessionizer needs (skew-safe: a user's stream ≪ bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .ops import hash_bucket_agg
from .util import np_col

US_PER_MIN = 60 * 1_000_000


def _epoch_us(batch: pa.Table, ts_col: str) -> np.ndarray:
    col = batch.column(ts_col).combine_chunks()
    return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)


def tumbling_window_agg(
    events: rd.Dataset,
    ts_col: str = "ts",
    every_minutes: int = 60,
    key_col: str = "event_type",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> rd.Dataset:
    """(window, key, n_events, min_id, max_id) per tumbling window —
    integer-exact aggregates so oracle comparison is bit-exact."""
    width = np.int64(every_minutes * US_PER_MIN)

    def _stamp(batch: pa.Table) -> pa.Table:
        w = np.floor_divide(_epoch_us(batch, ts_col), width)
        return pa.table(
            {
                "window": pa.array(w, pa.int64()),
                key_col: batch.column(key_col),
                id_col: batch.column(id_col),
            }
        )

    def _agg(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        out = df.groupby(["window", key_col], sort=True).agg(
            n_events=pd.NamedAgg(id_col, "count"),
            min_id=pd.NamedAgg(id_col, "min"),
            max_id=pd.NamedAgg(id_col, "max"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata()

    stamped = events.map_batches(_stamp, batch_format="pyarrow")
    return hash_bucket_agg(
        stamped,
        lambda b: np_col(b, "window").astype(np.int64),
        _agg,
        num_buckets=num_buckets,
    )


def sessionize(
    events: rd.Dataset,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-user session stats with a ``gap_minutes`` inactivity split:
    (user_id, n_events, n_sessions, max_session_events,
    max_session_dur_us).  A new session starts when the gap since the
    user's previous event (ordered by ts, then event_id) EXCEEDS the
    threshold."""
    gap = np.int64(gap_minutes * US_PER_MIN)

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col).cast(pa.int64()),
                "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
            }
        )

    def _sessions(grp: pa.Table) -> pa.Table:
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        order = np.lexsort((e, t, u))
        u, t = u[order], t[order]
        n = len(u)
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap_br = np.r_[False, (t[1:] - t[:-1]) > gap]
        new_sess = new_user | gap_br
        # per-session extent
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], n] - 1
        sess_user = u[starts]
        sess_len = (ends - starts + 1).astype(np.int64)
        sess_dur = t[ends] - t[starts]
        df = pd.DataFrame(
            {
                user_col: sess_user,
                "len": sess_len,
                "dur": sess_dur,
            }
        )
        out = df.groupby(user_col, sort=True).agg(
            n_events=pd.NamedAgg("len", "sum"),
            n_sessions=pd.NamedAgg("len", "count"),
            max_session_events=pd.NamedAgg("len", "max"),
            max_session_dur_us=pd.NamedAgg("dur", "max"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata()

    projected = events.map_batches(_project, batch_format="pyarrow")
    return hash_bucket_agg(
        projected,
        lambda b: np_col(b, user_col).astype(np.int64),
        _sessions,
        num_buckets=num_buckets,
    )
