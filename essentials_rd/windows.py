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
from .util import hash64, np_col

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
        # factorize the string key once, then ONE lexsort + run-boundary
        # reductions (no pandas groupby in the per-bucket kernel)
        n = grp.num_rows
        key_t = grp.schema.field(key_col).type
        if n == 0:
            return pa.table(
                {
                    "window": pa.array([], pa.int64()),
                    key_col: pa.array([], key_t),
                    "n_events": pa.array([], pa.int64()),
                    "min_id": pa.array([], pa.int64()),
                    "max_id": pa.array([], pa.int64()),
                }
            )
        w = np_col(grp, "window")
        codes, uq = pd.factorize(
            grp.column(key_col).combine_chunks().to_pandas(), sort=True
        )
        ids = np_col(grp, id_col)
        order = np.lexsort((codes, w))
        ws, cs, es = w[order], codes[order], ids[order]
        diff = (ws[1:] != ws[:-1]) | (cs[1:] != cs[:-1])
        starts = np.flatnonzero(np.r_[True, diff])
        return pa.table(
            {
                "window": pa.array(ws[starts], pa.int64()),
                key_col: pa.array(
                    np.asarray(uq, object)[cs[starts]].tolist(), key_t
                ),
                "n_events": pa.array(
                    np.diff(np.r_[starts, n]).astype(np.int64), pa.int64()
                ),
                "min_id": pa.array(np.minimum.reduceat(es, starts), pa.int64()),
                "max_id": pa.array(np.maximum.reduceat(es, starts), pa.int64()),
            }
        )

    stamped = events.map_batches(_stamp, batch_format="pyarrow")
    return hash_bucket_agg(
        stamped,
        lambda b: np_col(b, "window").astype(np.int64),
        _agg,
        num_buckets=num_buckets,
    )


def hopping_window_agg(
    events: rd.Dataset,
    ts_col: str = "ts",
    size_minutes: int = 120,
    hop_minutes: int = 60,
    key_col: str = "event_type",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Overlapping (hopping) windows: size ``size_minutes``, advancing
    every ``hop_minutes`` (size must be a multiple of hop).  Each event
    lands in ``size/hop`` windows — the stamp stage replicates the row
    once per covering window (a bounded, stateless fan-out inside
    map_batches), then the SAME bucketed aggregate as the tumbling
    case runs on (window, key).  ``window`` is the window's start time
    in hop units (floor(t/hop) − offset)."""
    assert size_minutes % hop_minutes == 0, "size must be a multiple of hop"
    hop = np.int64(hop_minutes * US_PER_MIN)
    k = size_minutes // hop_minutes

    def _stamp(batch: pa.Table) -> pa.Table:
        base = np.floor_divide(_epoch_us(batch, ts_col), hop)
        n = batch.num_rows
        rep = np.repeat(np.arange(n), k)
        off = np.tile(np.arange(k, dtype=np.int64), n)
        return pa.table(
            {
                "window": pa.array(base[rep] - off, pa.int64()),
                key_col: batch.column(key_col).take(pa.array(rep)),
                id_col: batch.column(id_col).take(pa.array(rep)),
            }
        )

    def _agg(grp: pa.Table) -> pa.Table:
        n = grp.num_rows
        key_t = grp.schema.field(key_col).type
        if n == 0:
            return pa.table(
                {
                    "window": pa.array([], pa.int64()),
                    key_col: pa.array([], key_t),
                    "n_events": pa.array([], pa.int64()),
                    "min_id": pa.array([], pa.int64()),
                    "max_id": pa.array([], pa.int64()),
                }
            )
        w = np_col(grp, "window")
        codes, uq = pd.factorize(
            grp.column(key_col).combine_chunks().to_pandas(), sort=True
        )
        ids = np_col(grp, id_col)
        order = np.lexsort((codes, w))
        ws, cs, es = w[order], codes[order], ids[order]
        diff = (ws[1:] != ws[:-1]) | (cs[1:] != cs[:-1])
        starts = np.flatnonzero(np.r_[True, diff])
        return pa.table(
            {
                "window": pa.array(ws[starts], pa.int64()),
                key_col: pa.array(
                    np.asarray(uq, object)[cs[starts]].tolist(), key_t
                ),
                "n_events": pa.array(
                    np.diff(np.r_[starts, n]).astype(np.int64), pa.int64()
                ),
                "min_id": pa.array(np.minimum.reduceat(es, starts), pa.int64()),
                "max_id": pa.array(np.maximum.reduceat(es, starts), pa.int64()),
            }
        )

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
        if grp.num_rows == 0:
            return pa.table(
                {
                    user_col: pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "max_session_events": pa.array([], pa.int64()),
                    "max_session_dur_us": pa.array([], pa.int64()),
                }
            )
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
        # sessions are already user-contiguous (lexsort by user first):
        # per-user stats are run-boundary reductions, no pandas groupby
        nu = np.r_[True, sess_user[1:] != sess_user[:-1]]
        ustarts = np.flatnonzero(nu)
        return pa.table(
            {
                user_col: pa.array(sess_user[ustarts], pa.int64()),
                "n_events": pa.array(
                    np.add.reduceat(sess_len, ustarts), pa.int64()
                ),
                "n_sessions": pa.array(
                    np.diff(np.r_[ustarts, len(sess_user)]).astype(np.int64),
                    pa.int64(),
                ),
                "max_session_events": pa.array(
                    np.maximum.reduceat(sess_len, ustarts), pa.int64()
                ),
                "max_session_dur_us": pa.array(
                    np.maximum.reduceat(sess_dur, ustarts), pa.int64()
                ),
            }
        )

    projected = events.map_batches(_project, batch_format="pyarrow")
    return hash_bucket_agg(
        projected,
        lambda b: np_col(b, user_col).astype(np.int64),
        _sessions,
        num_buckets=num_buckets,
    )


def lag_diff(
    events: rd.Dataset,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    num_buckets: int = 64,
    first_value: int = -1,
) -> rd.Dataset:
    """Per-key LAG window function: for every event, the microsecond gap
    to the key's PREVIOUS event under the total order ``(ts, id)`` —
    SQL ``ts - LAG(ts) OVER (PARTITION BY user ORDER BY ts, id)`` with
    each key's first row getting ``first_value``.  Same single
    user-bucketed shuffle as ``sessionize``; per-bucket kernel is one
    lexsort + a shifted diff (no per-row loop)."""

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col).cast(pa.int64()),
                "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
            }
        )

    def _gaps(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    user_col: pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        order = np.lexsort((e, t, u))
        u, t, e = u[order], t[order], e[order]
        gap = np.empty(len(u), np.int64)
        gap[0] = first_value
        gap[1:] = t[1:] - t[:-1]
        gap[np.r_[True, u[1:] != u[:-1]]] = first_value
        return pa.table(
            {
                id_col: pa.array(e, pa.int64()),
                user_col: pa.array(u, pa.int64()),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    projected = events.map_batches(_project, batch_format="pyarrow")
    return hash_bucket_agg(
        projected,
        lambda b: np_col(b, user_col).astype(np.int64),
        _gaps,
        num_buckets=num_buckets,
    )


def rolling_window_agg(
    events: rd.Dataset,
    k: int | None = 3,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    val_col: str = "__cents__",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-key sliding-window aggregate over the last ``k`` rows —
    SQL ``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW`` semantics,
    partitioned by ``user_col`` and ordered by ``(ts, id)`` (a total
    order because ids are unique): per event, the sum and count of
    ``val_col`` over the window.  ``k=None`` is the unbounded case —
    ``ROWS UNBOUNDED PRECEDING``, i.e. the per-key running total.
    ``val_col`` must be int64 so the result is bit-exact against a SQL
    window-function oracle.

    Shape: same single user-bucketed shuffle as ``sessionize`` — each
    user's full stream lands in one bucket, and the per-bucket kernel
    is ONE lexsort + prefix-sum differences with per-user clamps (no
    per-row loop, linear in the bucket).
    """
    kk = None if k is None else np.int64(k)

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col).cast(pa.int64()),
                "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                val_col: batch.column(val_col).cast(pa.int64()),
            }
        )

    def _roll(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "roll_sum": pa.array([], pa.int64()),
                    "roll_n": pa.array([], pa.int64()),
                }
            )
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        v = np_col(grp, val_col)
        order = np.lexsort((e, t, u))
        u, e, v = u[order], e[order], v[order]
        n = len(u)
        # per-row index of its user-segment start, then clamp the
        # k-row lookback at that boundary
        seg_starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        row_start = seg_starts[np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1]
        i = np.arange(n, dtype=np.int64)
        win_start = (
            row_start if kk is None else np.maximum(row_start, i - kk + 1)
        )
        prefix = np.r_[np.int64(0), np.cumsum(v)]
        return pa.table(
            {
                id_col: pa.array(e, pa.int64()),
                "roll_sum": pa.array(prefix[i + 1] - prefix[win_start], pa.int64()),
                "roll_n": pa.array(i + 1 - win_start, pa.int64()),
            }
        )

    projected = events.map_batches(_project, batch_format="pyarrow")
    return hash_bucket_agg(
        projected,
        lambda b: np_col(b, user_col).astype(np.int64),
        _roll,
        num_buckets=num_buckets,
    )


def range_window_agg(
    events: rd.Dataset,
    span_us: int,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    val_col: str = "__cents__",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-key TIME-based sliding-window aggregate — SQL ``RANGE
    BETWEEN <span> PRECEDING AND CURRENT ROW`` semantics, partitioned
    by ``user_col`` and ordered by ``ts``: per event, the sum and
    count of ``val_col`` over all same-user rows with
    ``ts ∈ [cur_ts − span, cur_ts]``.  Unlike the ROWS variant
    (:func:`rolling_window_agg`) the frame is value-defined, so ALL
    ts-peers of the current row are inside the frame regardless of any
    tie-break order — exactly the SQL RANGE contract, which makes the
    result a pure function of the data (no ordering ambiguity to pin).

    Shape: the same single user-bucketed shuffle; the per-bucket
    kernel is one lexsort by (user, ts) plus TWO vectorized
    searchsorteds over the (user_rank, ts_rank)-composed int64 key
    (the :func:`~essentials_rd.ops.interval_join` trick — composing
    exact value ranks keeps equal timestamps mapping to equal
    composite keys, so 'left'/'right' sides give the closed-interval
    bounds), then prefix-sum differences.  Linear-log in the bucket,
    no per-row loop.  ``val_col`` must be int64 for a bit-exact SQL
    twin.
    """
    span = np.int64(span_us)

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col).cast(pa.int64()),
                "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                val_col: batch.column(val_col).cast(pa.int64()),
            }
        )

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "range_sum": pa.array([], pa.int64()),
            "range_n": pa.array([], pa.int64()),
        }
    )

    def _window(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return empty
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        v = np_col(grp, val_col)
        order = np.lexsort((t, u))
        u, t, e, v = u[order], t[order], e[order], v[order]
        # compose (user_rank, ts_rank) into one sortable int64: ranks
        # come from the union of every ts and every window-low bound,
        # so both probe values exist exactly in the rank table
        uu = np.unique(u)
        ku = np.searchsorted(uu, u)
        vals = np.unique(np.concatenate([t, t - span]))
        width = np.int64(len(vals) + 1)
        comp = ku * width + np.searchsorted(vals, t)
        lo = np.searchsorted(
            comp, ku * width + np.searchsorted(vals, t - span), side="left"
        )
        hi = np.searchsorted(
            comp, ku * width + np.searchsorted(vals, t), side="right"
        )
        prefix = np.r_[np.int64(0), np.cumsum(v)]
        return pa.table(
            {
                id_col: pa.array(e, pa.int64()),
                "range_sum": pa.array(prefix[hi] - prefix[lo], pa.int64()),
                "range_n": pa.array(hi - lo, pa.int64()),
            }
        )

    projected = events.map_batches(_project, batch_format="pyarrow")
    return hash_bucket_agg(
        projected,
        lambda b: np_col(b, user_col).astype(np.int64),
        _window,
        num_buckets=num_buckets,
    )


def funnel_stages(
    events: rd.Dataset,
    stages: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Ordered funnel analysis: per user, how many of ``stages`` were
    completed IN ORDER — stage i counts only if some stage-i event
    happens strictly after the user's first qualifying stage-(i−1)
    event (t₀ = the user's earliest stage-0 event).  The strict-``>``
    tie rule is the pinned semantic the SQL oracle mirrors.  One
    user-bucketed shuffle (sessionize's locality assumption); the
    kernel is one pass per stage of masked per-user segment mins —
    O(rows·stages), no per-user loop.  Output: (user, stage) with
    stage ∈ 0..len(stages) for every user present."""

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table({
            user_col: batch.column(user_col).cast(pa.int64()),
            "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
            type_col: batch.column(type_col),
        })

    def _funnel(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "stage": pa.array([], pa.int64())})
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        et = grp.column(type_col).to_pandas().to_numpy()
        uniq, uidx = np.unique(u, return_inverse=True)
        n = len(uniq)
        bound = np.full(n, np.iinfo(np.int64).min, np.int64)  # t(-1) = -inf
        stage = np.zeros(n, np.int64)
        for s in stages:
            nxt = np.full(n, np.iinfo(np.int64).max, np.int64)
            mask = (et == s) & (t > bound[uidx])
            np.minimum.at(nxt, uidx[mask], t[mask])
            hit = nxt < np.iinfo(np.int64).max
            stage += hit
            bound = np.where(hit, nxt, np.iinfo(np.int64).max)
            # users who missed this stage can't complete later ones:
            # bound = +inf makes every later "t > bound" mask false
        return pa.table({user_col: pa.array(uniq, pa.int64()),
                         "stage": pa.array(stage, pa.int64())})

    projected = events.map_batches(_project, batch_format="pyarrow")
    return hash_bucket_agg(
        projected, lambda b: np_col(b, user_col), _funnel,
        num_buckets=num_buckets,
    )


US_PER_DAY = 24 * 3600 * 1_000_000


def cohort_retention(
    events: rd.Dataset,
    ts_col: str = "ts",
    user_col: str = "user_id",
    period_us: int = US_PER_DAY,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event; cell (cohort, day_offset) counts the distinct
    users of that cohort active ``day_offset`` periods later.  One
    user-bucketed shuffle computes, per bucket, the distinct
    (user, period) pairs and each user's min period in the same kernel
    — the cohort assignment never leaves the bucket — then a second
    tiny shuffle sums the (cohort, offset) partials.  Output:
    (cohort, day_offset, n_users)."""
    from .ops import grouped_pandas_agg

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table({
            user_col: batch.column(user_col).cast(pa.int64()),
            "__p__": pa.array(
                _epoch_us(batch, ts_col) // period_us, pa.int64()),
        })

    def _cohort(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({"cohort": pa.array([], pa.int64()),
                             "day_offset": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        u = np_col(grp, user_col)
        p = np_col(grp, "__p__")
        assert u.min() >= 0 and u.max() < (1 << 31) and p.min() >= 0 \
            and p.max() < (1 << 32), (
            "cohort_retention packs (user, period) into 64 bits: "
            "user ids must be in [0, 2^31), periods in [0, 2^32)"
        )
        pairs = np.unique(u * np.int64(1 << 32) + p)
        pu = (pairs >> 32).astype(np.int64)
        pp = (pairs & np.int64((1 << 32) - 1)).astype(np.int64)
        starts = np.r_[0, np.flatnonzero(pu[1:] != pu[:-1]) + 1]
        counts = np.diff(np.r_[starts, len(pu)])
        cohort = np.repeat(pp[starts], counts)  # min period = first in order
        key = cohort * np.int64(1 << 32) + (pp - cohort)
        uk, n = np.unique(key, return_counts=True)
        return pa.table({
            "cohort": pa.array((uk >> 32).astype(np.int64), pa.int64()),
            "day_offset": pa.array(
                (uk & np.int64((1 << 32) - 1)).astype(np.int64), pa.int64()),
            "n_users": pa.array(n.astype(np.int64), pa.int64()),
        })

    projected = events.map_batches(_project, batch_format="pyarrow")
    partials = hash_bucket_agg(
        projected, lambda b: np_col(b, user_col), _cohort,
        num_buckets=num_buckets,
    )
    return grouped_pandas_agg(
        partials, ["cohort", "day_offset"], {"n_users": ("n_users", "sum")},
        key_fn=lambda b: np_col(b, "cohort") * np.int64(0x9E3779B1)
        + np_col(b, "day_offset"),
        num_buckets=8,
    )


def event_sequences(
    events: rd.Dataset,
    max_len: int = 8,
    sep: str = "|",
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-user ordered event sequences — the sequence-assembly step of
    a behavioral/training-data pipeline: each user's first ``max_len``
    event types under the (ts, id) total order, joined with ``sep``
    (SQL ``string_agg(... ORDER BY ts, id)`` over the ROW_NUMBER-capped
    stream).  The cap bounds output row width regardless of how long
    one user's history is (a hot user can't blow up a row).

    Shape: the standard ONE user-bucketed shuffle; the per-bucket
    kernel is one lexsort + a per-segment rank to apply the cap, then
    a pandas C-level groupby-join over the already-sorted frame."""
    kk = np.int64(max_len)

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col).cast(pa.int64()),
                "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                type_col: batch.column(type_col),
            }
        )

    def _assemble(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table(
                {user_col: pa.array([], pa.int64()),
                 "seq": pa.array([], pa.string()),
                 "seq_len": pa.array([], pa.int64())}
            )
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        order = np.lexsort((e, t, u))
        u = u[order]
        seg_starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        seg_id = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        rank = np.arange(len(u), dtype=np.int64) - seg_starts[seg_id]
        keep = rank < kk
        types = grp.column(type_col).take(
            pa.array(order[keep], pa.int64())
        ).to_pandas()
        df = pd.DataFrame({user_col: u[keep], "__t__": types})
        out = df.groupby(user_col, sort=True)["__t__"].agg(
            lambda s: sep.join(s)
        )
        n = df.groupby(user_col, sort=True)["__t__"].size()
        return pa.table(
            {
                user_col: pa.array(out.index.to_numpy(np.int64), pa.int64()),
                "seq": pa.array(out.to_numpy(object).tolist(), pa.string()),
                "seq_len": pa.array(n.to_numpy(np.int64), pa.int64()),
            }
        )

    return hash_bucket_agg(
        events.map_batches(_project, batch_format="pyarrow"),
        lambda b: np_col(b, user_col),
        _assemble,
        num_buckets=num_buckets,
    )


def throttle_events(
    events: rd.Dataset,
    window_minutes: int = 60,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Windowed dedup / rate-throttle over the event stream — the
    ingest-time dedup shape an LLM-data pipeline applies to near-real-
    time feeds: keep an event iff it is its (user, type) key's FIRST,
    or the gap to the key's previous event under the (ts, id) total
    order strictly exceeds the window (SQL LAG semantics — throttling
    is relative to the previous OCCURRENCE, not the previous kept row,
    which keeps the kernel one shifted diff instead of a sequential
    scan).  Returns the kept rows (user, type, id, epoch-µs ts).

    Same single user-bucketed shuffle as ``sessionize``; hash
    collisions between (user, type) keys can't merge keys because the
    segment boundary tests the ACTUAL columns, not their hash."""
    win = np.int64(window_minutes * US_PER_MIN)

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col).cast(pa.int64()),
                type_col: batch.column(type_col),
                "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
            }
        )

    def _keep(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return grp
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        codes, _ = pd.factorize(grp.column(type_col).combine_chunks().to_pandas())
        order = np.lexsort((e, t, codes, u))
        us, cs, ts_ = u[order], codes[order], t[order]
        new_seg = np.r_[True, (us[1:] != us[:-1]) | (cs[1:] != cs[:-1])]
        gap = np.r_[np.int64(0), ts_[1:] - ts_[:-1]]
        keep = new_seg | (gap > win)
        return grp.take(pa.array(order[keep], pa.int64()))

    return hash_bucket_agg(
        events.map_batches(_project, batch_format="pyarrow"),
        lambda b: np_col(b, user_col),
        _keep,
        num_buckets=num_buckets,
    )


def transition_counts(
    events: rd.Dataset,
    val_col: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Markov transition-count matrix over per-key ordered sequences:
    ``(prev_val, next_val, n)`` counting every consecutive pair of a
    key's events under the ``(ts, id)`` total order — the sufficient
    statistic for first-order sequence models (next-event prediction,
    behavioral embeddings, anomaly scoring) and the SQL twin of
    ``LAG(val) OVER (PARTITION BY key ORDER BY ts, id)`` + GROUP BY.

    Scale shape: the same single user-bucketed shuffle as
    ``sessionize``/``lag_diff`` (a key's sequence is complete inside
    its bucket); the per-bucket kernel is one lexsort + shifted pair
    factorize, and only per-bucket PARTIAL (prev, next, n) counts — at
    most |alphabet|² rows each — leave the bucket for one tiny final
    combine."""
    from .ops import grouped_pandas_agg

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col).cast(pa.int64()),
                "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                val_col: batch.column(val_col),
            }
        )

    def _pairs(grp: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prev_val": pa.array([], grp.schema.field(val_col).type),
                "next_val": pa.array([], grp.schema.field(val_col).type),
                "__n__": pa.array([], pa.int64()),
            }
        )
        if grp.num_rows < 2:
            return empty
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        v = grp.column(val_col).to_pandas().to_numpy()
        order = np.lexsort((e, t, u))
        u, v = u[order], v[order]
        same = u[1:] == u[:-1]  # consecutive rows of the SAME key
        if not same.any():
            return empty
        pv, nv = v[:-1][same], v[1:][same]
        df = pd.DataFrame({"prev_val": pv, "next_val": nv})
        g = df.groupby(["prev_val", "next_val"], sort=False,
                       as_index=False).size()
        return pa.table(
            {
                "prev_val": pa.array(g["prev_val"]),
                "next_val": pa.array(g["next_val"]),
                "__n__": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    projected = events.map_batches(_project, batch_format="pyarrow")
    partial = hash_bucket_agg(
        projected,
        lambda b: np_col(b, user_col).astype(np.int64),
        _pairs,
        num_buckets=num_buckets,
    )
    return grouped_pandas_agg(
        partial,
        keys=["prev_val", "next_val"],
        aggs={"n": ("__n__", "sum")},
        key_fn=_pair_bucket_key,
        num_buckets=max(num_buckets // 8, 1),
    )


def ngram_counts(
    events: rd.Dataset,
    val_col: str,
    n: int = 3,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Order-n sequential-pattern counts over per-key event
    sequences: every run of n consecutive events of the SAME key
    under the (ts, id) total order, counted per value n-gram — the
    direct generalization of ``transition_counts`` (n = 2) to the
    higher-order Markov / frequent-sequence statistic.  Output
    columns v1..vn, n_obs.

    Same scale shape: ONE key-hash bucketed exchange (a key's
    sequence is complete in its bucket), a per-bucket lexsort +
    shifted-window alignment, and only per-bucket partial
    (gram, count) rows — at most |alphabet|ⁿ each — leave for one
    tiny final combine."""
    from .ops import grouped_pandas_agg

    cols = [f"v{i + 1}" for i in range(n)]

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col).cast(pa.int64()),
                "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                val_col: batch.column(val_col),
            }
        )

    def _grams(grp: pa.Table) -> pa.Table:
        vt = grp.schema.field(val_col).type
        empty = pa.table(
            {**{c: pa.array([], vt) for c in cols},
             "__n__": pa.array([], pa.int64())}
        )
        if grp.num_rows < n:
            return empty
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        v = grp.column(val_col).to_pandas().to_numpy()
        order = np.lexsort((e, t, u))
        u, v = u[order], v[order]
        same = np.ones(len(u) - (n - 1), bool)
        for i in range(n - 1):
            same &= u[i:len(u) - (n - 1) + i] == \
                u[i + 1:len(u) - (n - 1) + i + 1]
        if not same.any():
            return empty
        df = pd.DataFrame(
            {c: v[i:len(v) - (n - 1) + i][same]
             for i, c in enumerate(cols)})
        g = df.groupby(cols, sort=False, as_index=False).size()
        return pa.table(
            {**{c: pa.array(g[c]) for c in cols},
             "__n__": pa.array(g["size"].to_numpy(np.int64),
                               pa.int64())}
        )

    projected = events.map_batches(_project, batch_format="pyarrow")
    partial = hash_bucket_agg(
        projected,
        lambda b: np_col(b, user_col).astype(np.int64),
        _grams,
        num_buckets=num_buckets,
    )

    def _gram_key(b: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            acc = _str_or_int_key(b.column(cols[0]))
            for c in cols[1:]:
                acc = acc * np.uint64(31) + _str_or_int_key(b.column(c))
        return hash64(acc.view(np.int64)).view(np.int64)

    return grouped_pandas_agg(
        partial,
        keys=cols,
        aggs={"n_obs": ("__n__", "sum")},
        key_fn=_gram_key,
        num_buckets=max(num_buckets // 8, 1),
    )


def _pair_bucket_key(b: pa.Table) -> np.ndarray:
    with np.errstate(over="ignore"):
        return hash64(
            _str_or_int_key(b.column("prev_val"))
            + _str_or_int_key(b.column("next_val")) * np.uint64(31)
        ).view(np.int64)


def _str_or_int_key(col: pa.ChunkedArray) -> np.ndarray:
    """Stable uint64 key for a string or integer column (bucketing
    only — collisions just co-locate)."""
    if pa.types.is_integer(col.type):
        return np.asarray(
            col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        ).astype(np.uint64)
    from .derive import _str_hash

    return _str_hash(col).astype(np.uint64)


def event_disorder(
    events: rd.Dataset,
    key_col: str = "user_id",
    seq_col: str = "event_id",
    ts_col: str = "ts",
    tie_col: str | None = None,
    num_buckets: int = 16,
) -> pa.Table:
    """Out-of-order-arrival audit — the late-data / watermark-sizing
    report every streaming ingest needs: under the arrival order
    ``seq_col``, an event is LATE when its event time precedes the
    running maximum event time of the events that arrived before it
    (same key), and its disorder is that backlog in µs (how much
    watermark lateness would have been required to window it
    correctly).  Returns per key (n_events, n_late, max_disorder_us).

    One key-bucketed exchange; the per-bucket kernel is fully
    vectorized — lexsort by (key, seq), segmented running max via the
    per-segment band-offset trick (ts normalized to the bucket min so
    the band arithmetic is overflow-checked, same kernel family as
    user_drawdown's), reduceat folds."""
    from .ops import hash_bucket_agg
    from .util import np_col

    def _prep(b: pa.Table) -> pa.Table:
        cols = {
            "k": b.column(key_col).cast(pa.int64()),
            "s": b.column(seq_col).cast(pa.int64()),
            "t": b.column(ts_col).combine_chunks().cast(
                pa.timestamp("us")).cast(pa.int64()),
        }
        cols["x"] = (b.column(tie_col).cast(pa.int64()) if tie_col
                     else cols["s"])
        return pa.table(cols)

    def _audit(grp: pa.Table) -> pa.Table:
        k = np_col(grp, "k")
        s = np_col(grp, "s")
        t = np_col(grp, "t")
        x = np_col(grp, "x")
        order = np.lexsort((x, s, k))  # arrival order, tie-broken
        k, t = k[order], t[order]
        m = len(k)
        if not m:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_late": pa.array([], pa.int64()),
                             "max_disorder_us": pa.array([], pa.int64())})
        rel = t - t.min()
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
        seg = np.cumsum(np.r_[False, k[1:] != k[:-1]]).astype(np.int64)
        assert rel.max(initial=0) < (1 << 45), "band overflow (ts range)"
        assert (int(seg[-1]) << 45) + int(rel.max(initial=0)) < (1 << 62)
        band = seg << np.int64(45)
        runmax = np.maximum.accumulate(rel + band) - band
        first = np.zeros(m, bool)
        first[starts] = True
        # previous-arrivals max: shift the running max down one slot
        prev = np.r_[np.int64(0), runmax[:-1]]
        disorder = np.where(first, 0, np.maximum(prev - rel, 0))
        n_ev = np.diff(np.r_[starts, m]).astype(np.int64)
        late = (disorder > 0).astype(np.int64)
        n_late = np.add.reduceat(late, starts)
        mx = np.maximum.reduceat(disorder, starts)
        return pa.table({
            key_col: pa.array(k[starts], pa.int64()),
            "n_events": pa.array(n_ev, pa.int64()),
            "n_late": pa.array(n_late, pa.int64()),
            "max_disorder_us": pa.array(mx, pa.int64()),
        })

    out = hash_bucket_agg(
        events.map_batches(_prep, batch_format="pyarrow"),
        lambda b: np_col(b, "k"), _audit, num_buckets)
    rows = out.take_all()
    rows.sort(key=lambda r: r[key_col])
    return pa.table({
        key_col: pa.array([r[key_col] for r in rows], pa.int64()),
        "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
        "n_late": pa.array([r["n_late"] for r in rows], pa.int64()),
        "max_disorder_us": pa.array([r["max_disorder_us"] for r in rows],
                                    pa.int64()),
    })


def adjacent_rank_pairs(
    ds: rd.Dataset,
    key_col: str,
    rank_col: str,
    val_col: str,
    num_buckets: int = 64,
) -> rd.Dataset:
    """Directed ``(u, v)`` pairs between values at CONSECUTIVE ranks
    within each key group: for every row at rank r, one pair to every
    row of the same key at rank r+1 (the rank-k → rank-k+1 cross
    product).  Deterministic under rank ties — where a sequence-lag
    definition would depend on an arbitrary tie order, the cross
    product is a set function of the input — and exactly the SQL
    ``a JOIN b ON a.key = b.key AND b.rank = a.rank + 1``.
    Self-pairs (u = v) are dropped; duplicates across keys are KEPT
    (feed ``ops.directed_reciprocity`` or a distinct pass downstream).

    Scale shape: one key-hash bucketed exchange (a key's rows are
    complete inside the bucket), then a per-bucket lexsort + packed
    (key, rank) searchsorted + repeat/arange gather — no Python row
    loop, partial pair tables stream out per bucket."""

    def _pairs(grp: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64())})
        if grp.num_rows < 2:
            return empty
        o = np_col(grp, key_col).astype(np.int64)
        r = np_col(grp, rank_col).astype(np.int64)
        p = np_col(grp, val_col).astype(np.int64)
        order = np.lexsort((r, o))
        o, r, p = o[order], r[order], p[order]
        # dense key codes so the packed (key, rank) key is monotone
        codes = np.r_[0, np.cumsum(o[1:] != o[:-1])].astype(np.int64)
        span = int(r.max()) + 2
        assert codes[-1] < (1 << 62) // span, "packed rank key overflow"
        k = codes * span + r
        lo = np.searchsorted(k, k + 1, "left")
        hi = np.searchsorted(k, k + 1, "right")
        cnt = (hi - lo).astype(np.int64)
        tot = int(cnt.sum())
        if not tot:
            return empty
        u = np.repeat(p, cnt)
        offs = np.repeat(np.cumsum(cnt) - cnt, cnt)
        idx = np.repeat(lo, cnt) + (np.arange(tot, dtype=np.int64) - offs)
        v = p[idx]
        m = u != v
        return pa.table({"u": pa.array(u[m], pa.int64()),
                         "v": pa.array(v[m], pa.int64())})

    return hash_bucket_agg(
        ds,
        lambda b: np_col(b, key_col).astype(np.int64),
        _pairs,
        num_buckets=num_buckets,
    )


def merge_intervals(
    intervals: rd.Dataset,
    key_col: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-key interval UNION (gaps-and-islands): collapse overlapping
    or touching half-open ``[start, end)`` intervals into maximal
    merged intervals — the interval-algebra shape gap-sessionization
    does not cover (sessionize splits on inactivity between POINT
    events; this merges EXTENTS, e.g. playback spans, locks, on-call
    shifts).  Output: one row per merged interval,
    (key, iv_start, iv_end, n_src).

    ONE key-hash bucketed exchange lands each key's intervals
    together; inside the bucket one lexsort by (key, start, end), then
    the running maximum of interval ends — segmented per key via the
    int64 band-offset trick (each key's ends shifted into a disjoint
    band so ONE global np.maximum.accumulate does every key at once,
    overflow-asserted) — marks a new merged interval exactly where a
    start clears every earlier end (touching intervals merge:
    ``start <= running_end``).  No Python loop, linear per bucket; the
    partitioning assumption is per-key locality, same as sessionize.
    Raises on ``end < start`` (an invalid extent has no well-defined
    union)."""

    def _merge(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                "iv_start": pa.array([], pa.int64()),
                "iv_end": pa.array([], pa.int64()),
                "n_src": pa.array([], pa.int64()),
            })
        k = np_col(grp, key_col).astype(np.int64)
        s = np_col(grp, start_col).astype(np.int64)
        e = np_col(grp, end_col).astype(np.int64)
        if (e < s).any():
            bad = int(np.flatnonzero(e < s)[0])
            raise ValueError(
                f"invalid interval end < start at key {k[bad]}: "
                f"[{s[bad]}, {e[bad]})"
            )
        order = np.lexsort((e, s, k))
        k, s, e = k[order], s[order], e[order]
        new_key = np.r_[True, k[1:] != k[:-1]]
        seg = np.cumsum(new_key) - 1
        base = e.min()
        band = np.int64(e.max() - base + 1)
        assert (seg[-1] + 1) * band < np.int64(2) ** 62, \
            "band-offset overflow: too many keys x end-span per bucket"
        cm = np.maximum.accumulate(seg * band + (e - base))
        prev = np.r_[np.int64(-2) ** 62, cm[:-1]] - seg * band + base
        new_iv = new_key | (s > prev)
        starts = np.flatnonzero(new_iv)
        return pa.table({
            key_col: pa.array(k[starts], pa.int64()),
            "iv_start": pa.array(s[starts], pa.int64()),
            "iv_end": pa.array(np.maximum.reduceat(e, starts), pa.int64()),
            "n_src": pa.array(
                np.diff(np.r_[starts, len(k)]).astype(np.int64), pa.int64()
            ),
        })

    return hash_bucket_agg(
        intervals,
        lambda b: np_col(b, key_col).astype(np.int64),
        _merge,
        num_buckets=num_buckets,
    )


def lag1_moments(
    events: rd.Dataset,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-user LAG-1 moment tuple over the (ts, id)-ordered value
    stream, in exact half-up cents: ``(user_id, n, sum_x, sum_xx,
    n_pairs, sum_a, sum_b, sum_ab)`` where (a, b) ranges over adjacent
    value pairs within the user.  Lag-1 autocorrelation (and the
    Durbin-Watson statistic) derive from these EIGHT int64s exactly —
    no float covariance is ever computed, so the result is
    bit-identical at any layout and in SQL (a lead() window twin).
    This is the SEQUENCE-ordered statistic the unordered moment
    queries (comoments, trend) cannot express: it needs per-user
    locality AND the event order, i.e. one user-bucketed exchange and
    a sorted in-bucket kernel — segment sums via cumsum differences,
    no Python loop."""

    def _project(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            np_col(batch, value_col) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({
            user_col: batch.column(user_col).cast(pa.int64()),
            "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
            id_col: batch.column(id_col).cast(pa.int64()),
            "__x__": pa.array(cents, pa.int64()),
        })

    def _moments(grp: pa.Table) -> pa.Table:
        cols = ["n", "sum_x", "sum_xx", "n_pairs", "sum_a", "sum_b",
                "sum_ab"]
        if grp.num_rows == 0:
            return pa.table(
                {user_col: pa.array([], pa.int64()),
                 **{c: pa.array([], pa.int64()) for c in cols}})
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        x = np_col(grp, "__x__")
        order = np.lexsort((e, t, u))
        u, x = u[order], x[order]
        n = len(u)
        new = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], n]

        def seg(vals):  # per-user segment sums via cumsum differences
            cs = np.r_[np.int64(0), np.cumsum(vals)]
            return cs[ends] - cs[starts]

        a, b = x[:-1], x[1:]
        valid = ~new[1:]  # pair (i, i+1) counts iff same user
        return pa.table({
            user_col: pa.array(u[starts], pa.int64()),
            "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "sum_x": pa.array(seg(x), pa.int64()),
            "sum_xx": pa.array(seg(x * x), pa.int64()),
            "n_pairs": pa.array(
                seg(np.r_[valid.astype(np.int64), np.int64(0)]), pa.int64()),
            "sum_a": pa.array(
                seg(np.r_[a * valid, np.int64(0)]), pa.int64()),
            "sum_b": pa.array(
                seg(np.r_[b * valid, np.int64(0)]), pa.int64()),
            "sum_ab": pa.array(
                seg(np.r_[a * b * valid, np.int64(0)]), pa.int64()),
        })

    projected = events.map_batches(_project, batch_format="pyarrow")
    return hash_bucket_agg(
        projected,
        lambda b: np_col(b, user_col).astype(np.int64),
        _moments,
        num_buckets=num_buckets,
    )


def last_touch_attribution(
    events: rd.Dataset,
    src_type: str = "click",
    conv_type: str = "purchase",
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Last-touch attribution: for every ``conv_type`` event, the most
    recent STRICTLY-prior ``src_type`` event of the same user under
    the (ts, event_id) total order — the marketing-attribution ASOF
    self-join per user that sessionization/funnel queries don't
    express.  One user-bucketed exchange; the per-bucket kernel is a
    segmented running arg-max (band-offset accumulate, no Python loop
    over rows).  Emits (event_id, user_id, src_event_id, gap_us) with
    -1 sentinels for unattributed conversions."""

    def _prep(t: pa.Table) -> pa.Table:
        ty = t.column(type_col)
        import pyarrow.compute as pc
        keep = pc.or_(pc.equal(ty, src_type), pc.equal(ty, conv_type))
        t = t.filter(keep)
        is_src = pc.equal(t.column(type_col), src_type)
        return pa.table({
            user_col: t.column(user_col).cast(pa.int64()),
            "ts_us": pa.array(_epoch_us(t, ts_col), pa.int64()),
            id_col: t.column(id_col).cast(pa.int64()),
            "is_src": is_src,
        })

    def _attr(grp: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            user_col: pa.array([], pa.int64()),
            "src_event_id": pa.array([], pa.int64()),
            "gap_us": pa.array([], pa.int64()),
        })
        if grp.num_rows == 0:
            return empty
        uid = np_col(grp, user_col)
        ts = np_col(grp, "ts_us")
        eid = np_col(grp, id_col)
        is_src = np.asarray(grp.column("is_src").to_numpy(
            zero_copy_only=False), bool)
        order = np.lexsort((eid, ts, uid))
        uid, ts, eid, is_src = (uid[order], ts[order], eid[order],
                                is_src[order])
        n = len(uid)
        seg = np.cumsum(np.r_[0, (uid[1:] != uid[:-1]).astype(np.int64)])
        # last src position at-or-before i, within segment: band-offset
        # running max over (pos if src else -1)
        assert int(seg[-1]) * (n + 2) < (1 << 62), "band offset overflow"
        pos = np.arange(n, dtype=np.int64)
        marker = np.where(is_src, pos, np.int64(-1))
        run = np.maximum.accumulate(marker + seg * np.int64(n + 2))
        run = run - seg * np.int64(n + 2)
        # strictly-prior: value at i-1 if same segment, else none
        prior = np.r_[np.int64(-1), run[:-1]]
        first_of_seg = np.r_[True, uid[1:] != uid[:-1]]
        prior[first_of_seg] = -1
        conv = ~is_src
        p = prior[conv]
        has = p >= 0
        src_eid = np.where(has, eid[np.maximum(p, 0)], np.int64(-1))
        gap = np.where(has, ts[conv] - ts[np.maximum(p, 0)],
                       np.int64(-1))
        return pa.table({
            id_col: pa.array(eid[conv], pa.int64()),
            user_col: pa.array(uid[conv], pa.int64()),
            "src_event_id": pa.array(src_eid, pa.int64()),
            "gap_us": pa.array(gap, pa.int64()),
        })

    return hash_bucket_agg(
        events.map_batches(_prep, batch_format="pyarrow"),
        lambda t: np_col(t, user_col),
        _attr, num_buckets=num_buckets)


def cusum_stats(
    events: rd.Dataset,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-user CUSUM changepoint statistics over the (ts, event_id)-
    ordered value stream, in EXACT integers (Page 1954).  The classic
    mean-shift detector tracks ``S_i = Σ_{j<=i} (x_j - mean)``; scaling
    by the user's own count removes the division: with ``x`` in half-up
    cents, ``D_i = n·x_i - T`` (``T`` the user's total) gives prefix
    sums ``P_i = n·S_i`` that are exact int64 at any layout and in SQL.
    Emits per user ``(n, cusum_max, cusum_min, argmax_pos)`` — the max /
    min excursions (``P_n = 0`` always, so a large |excursion| flags a
    level shift) and the 1-based position of the FIRST prefix maximum,
    the estimated changepoint location.  Same single user-bucketed
    exchange as ``sessionize``; the in-bucket kernel is one lexsort +
    segmented cumsum / reduceat — no Python loop over rows."""

    def _project(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            np_col(batch, value_col) * 100.0 + 0.5
        ).astype(np.int64)
        return pa.table({
            user_col: batch.column(user_col).cast(pa.int64()),
            "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
            id_col: batch.column(id_col).cast(pa.int64()),
            "__x__": pa.array(cents, pa.int64()),
        })

    def _cusum(grp: pa.Table) -> pa.Table:
        cols = ["n", "cusum_max", "cusum_min", "argmax_pos"]
        if grp.num_rows == 0:
            return pa.table(
                {user_col: pa.array([], pa.int64()),
                 **{c: pa.array([], pa.int64()) for c in cols}})
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        x = np_col(grp, "__x__")
        order = np.lexsort((e, t, u))
        u, x = u[order], x[order]
        n = len(u)
        new = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], n]
        cnt = (ends - starts).astype(np.int64)
        cs_x = np.r_[np.int64(0), np.cumsum(x)]
        tot = cs_x[ends] - cs_x[starts]
        n_rep = np.repeat(cnt, cnt)
        t_rep = np.repeat(tot, cnt)
        d = n_rep * x - t_rep
        cs = np.cumsum(d)
        base = np.r_[np.int64(0), cs[:-1]][starts]
        p = cs - np.repeat(base, cnt)
        smax = np.maximum.reduceat(p, starts)
        smin = np.minimum.reduceat(p, starts)
        # first in-segment position achieving the max (1-based)
        hit = p == np.repeat(smax, cnt)
        pos = np.arange(n, dtype=np.int64)
        first = np.minimum.reduceat(np.where(hit, pos, np.int64(n)),
                                    starts)
        return pa.table({
            user_col: pa.array(u[starts], pa.int64()),
            "n": pa.array(cnt, pa.int64()),
            "cusum_max": pa.array(smax, pa.int64()),
            "cusum_min": pa.array(smin, pa.int64()),
            "argmax_pos": pa.array(first - starts + 1, pa.int64()),
        })

    projected = events.map_batches(_project, batch_format="pyarrow")
    return hash_bucket_agg(
        projected,
        lambda b: np_col(b, user_col).astype(np.int64),
        _cusum,
        num_buckets=num_buckets,
    )


def series_acf(
    events: rd.Dataset,
    ts_col: str = "ts",
    bucket_us: int = 3_600_000_000,
    max_lag: int = 6,
) -> pa.Table:
    """Lag-k autocorrelation of the ZERO-FILLED per-bucket event-count
    series — the seasonality / burst-memory detector over an event
    stream (hourly buckets by default): for the counts c_t over every
    bucket t in [min, max] (missing buckets count 0, they are real
    observations of an empty hour),

        r_k = Σ_t (c_t − m)(c_{t+k} − m) / Σ_t (c_t − m)²

    computed EXACTLY by scaling out the float mean m = T/n (the cusum
    trick): with d_t = n·c_t − T the numerator/denominator pair
    (Σ d_t·d_{t+k}, Σ d_t²) is integer at any count, folded in
    unbounded Python ints, and r_k is ONE float division emitted
    half-up 6dp (NULL when the series is constant).

    Scale shape: one streaming pass with per-block (bucket, count)
    partials — the series length is CALENDAR-bounded (a decade of
    hours is <10⁵ rows no matter how many events), so the driver fold
    over the bucket-sized table is the operator contract; zero
    shuffles, data rows never move.  Returns one row per lag
    k = 1..max_lag: (lag, num, den, acf)."""

    def _partial(t: pa.Table) -> pa.Table:
        b = _epoch_us(t, ts_col) // np.int64(bucket_us)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(ub, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    parts = events.map_batches(_partial, batch_format="pyarrow").take_all()
    agg: dict[int, int] = {}
    for r in parts:
        agg[r["b"]] = agg.get(r["b"], 0) + r["n"]
    if not agg:
        return pa.table({"lag": pa.array([], pa.int64()),
                         "num": pa.array([], pa.int64()),
                         "den": pa.array([], pa.int64()),
                         "acf": pa.array([], pa.float64())})
    lo, hi = min(agg), max(agg)
    n = int(hi - lo + 1)
    c = np.zeros(n, np.int64)
    for b, v in agg.items():
        c[b - lo] = v
    T = int(c.sum())
    # d_t = n*c_t - T in unbounded Python ints (object) — exact at any
    # event count; the series is calendar-small so this is driver math
    d = [n * int(x) - T for x in c]
    den = sum(x * x for x in d)
    lags, nums, accs = [], [], []
    for k in range(1, max_lag + 1):
        num = sum(d[t] * d[t + k] for t in range(n - k)) if k < n else 0
        lags.append(k)
        nums.append(num)
        # float casts FIRST (CAST num AS DOUBLE / CAST den AS DOUBLE)
        # so the SQL twin reproduces the division bit-for-bit
        accs.append(None if den == 0 else
                    float(np.floor(float(num) / float(den) * 1e6 + 0.5)
                          / 1e6))
    assert abs(den) < (1 << 62) and all(abs(x) < (1 << 62) for x in nums), \
        "ACF sums exceed int64 — rescale the bucket width"
    return pa.table({"lag": pa.array(lags, pa.int64()),
                     "num": pa.array(nums, pa.int64()),
                     "den": pa.array([den] * max_lag, pa.int64()),
                     "acf": pa.array(accs, pa.float64())})


def seq_pattern_counts(
    events: rd.Dataset,
    pattern: str,
    type_map: dict[str, str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
    num_buckets: int = 64,
) -> rd.Dataset:
    """MATCH_RECOGNIZE-class sequence pattern matching: encode each
    user's event stream as a character string under the (ts, id) total
    order (one char per event via ``type_map``; unmapped types encode
    as ``'x'`` so they BREAK a match rather than vanish) and count
    NON-overlapping, leftmost regex matches — e.g. ``vc*p`` is the
    view → any-clicks → purchase conversion path.  Python ``re`` and
    the SQL twin's ``regexp_extract_all`` agree on leftmost
    non-overlapping greedy semantics, so counts hash-match.

    Shape: the standard ONE user-bucketed shuffle (user histories
    co-locate — the sessionizer partitioning assumption); per bucket a
    lexsort + pandas C-level groupby string-join builds each user's
    string once, then one vectorized ``str.count`` sweep.  Output is
    one row per user.  Per-user strings are O(history) — cap upstream
    for adversarially hot users, same contract as ``sessionize``."""
    import re as _re

    _re.compile(pattern)  # fail fast on a bad pattern, driver-side

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table({
            user_col: batch.column(user_col).cast(pa.int64()),
            "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
            id_col: batch.column(id_col).cast(pa.int64()),
            type_col: batch.column(type_col),
        })

    def _match(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table({
                user_col: pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_matches": pa.array([], pa.int64()),
            })
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        order = np.lexsort((e, t, u))
        u = u[order]
        chars = (
            grp.column(type_col)
            .take(pa.array(order, pa.int64()))
            .to_pandas()
            .map(lambda s: type_map.get(s, "x"))
        )
        df = pd.DataFrame({user_col: u, "__c__": chars.to_numpy(object)})
        seq = df.groupby(user_col, sort=True)["__c__"].agg("".join)
        n_ev = df.groupby(user_col, sort=True)["__c__"].size()
        n_m = seq.str.count(pattern)
        return pa.table({
            user_col: pa.array(seq.index.to_numpy(np.int64), pa.int64()),
            "n_events": pa.array(n_ev.to_numpy(np.int64), pa.int64()),
            "n_matches": pa.array(n_m.to_numpy(np.int64), pa.int64()),
        })

    from .ops import manual_bucket_agg

    # manual exchange: its explicit empty_result keeps the schema
    # stable on an empty event stream (hash_bucket_agg's groupby
    # yields a schema-less dataset there)
    return manual_bucket_agg(
        events.map_batches(_project, batch_format="pyarrow"),
        lambda b: np_col(b, user_col),
        _match,
        empty_result=pa.table({
            user_col: pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_matches": pa.array([], pa.int64()),
        }),
        num_buckets=num_buckets,
    )


_ALLEN_RELS = [
    "equals", "precedes", "preceded_by", "meets", "met_by",
    "starts", "started_by", "finishes", "finished_by",
    "during", "contains", "overlaps", "overlapped_by",
]


def allen_census(
    events: rd.Dataset,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_buckets: int = 32,
) -> pa.Table:
    """Allen interval-algebra census — temporal reasoning's 13
    primitive relations (Allen 1983), the vocabulary every
    interval-join / temporal-constraint system speaks — over each
    user's per-event-type activity span [min ts, max ts]: every
    ordered (type_a < type_b) pair per user is classified by ONE fixed
    mutually-exclusive comparison ladder (equals, precedes/by,
    meets/by, starts/by, finishes/by, during/contains,
    overlaps/by — ladder ORDER resolves degenerate point intervals
    identically in engine and SQL), and the census counts pairs per
    relation with explicit zero rows (the absent relations are part of
    the answer).

    ONE user-bucketed exchange (a user's events co-locate — the
    sessionizer assumption); per bucket the spans are a lexsort +
    reduceat, the pair expansion is per-user triangular over ≤
    #event-types rows, classification one vectorized np.select; each
    bucket emits a 13-int partial the driver adds."""
    from .util import np_col

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "u": batch.column(user_col).cast(pa.int64()),
            "t": batch.column(type_col),
            "ts": pa.array(_epoch_us(batch, ts_col), pa.int64()),
        })

    def _census(grp: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"u": np_col(grp, "u"),
                           "t": grp.column("t").to_pylist(),
                           "ts": np_col(grp, "ts")})
        iv = df.groupby(["u", "t"], sort=True)["ts"].agg(["min", "max"])
        iv = iv.reset_index()
        u = iv["u"].to_numpy()
        s = iv["min"].to_numpy()
        e = iv["max"].to_numpy()
        # triangular pair expansion within each user run (iv sorted by
        # (u, t), so pairs are type-ordered automatically)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, len(u)])
        ai, bi = [], []
        for st, ln in zip(starts, lens):
            if ln < 2:
                continue
            x, y = np.triu_indices(ln, k=1)
            ai.append(st + x)
            bi.append(st + y)
        counts = np.zeros(len(_ALLEN_RELS), np.int64)
        if ai:
            a = np.concatenate(ai)
            b = np.concatenate(bi)
            s1, e1, s2, e2 = s[a], e[a], s[b], e[b]
            conds = [
                (s1 == s2) & (e1 == e2),            # equals
                e1 < s2,                             # precedes
                e2 < s1,                             # preceded_by
                e1 == s2,                            # meets
                e2 == s1,                            # met_by
                (s1 == s2) & (e1 < e2),              # starts
                (s1 == s2) & (e2 < e1),              # started_by
                (e1 == e2) & (s1 > s2),              # finishes
                (e1 == e2) & (s2 > s1),              # finished_by
                (s1 > s2) & (e1 < e2),               # during
                (s1 < s2) & (e2 < e1),               # contains
                (s1 < s2) & (s2 < e1) & (e1 < e2),   # overlaps
                (s2 < s1) & (s1 < e2) & (e2 < e1),   # overlapped_by
            ]
            rel = np.select(conds, np.arange(len(conds)), default=-1)
            assert (rel >= 0).all(), "Allen ladder not exhaustive"
            counts = np.bincount(rel, minlength=len(_ALLEN_RELS))
        return pa.table({
            "ri": pa.array(np.arange(len(_ALLEN_RELS), dtype=np.int64)),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    total = np.zeros(len(_ALLEN_RELS), np.int64)
    from .ops import hash_bucket_agg
    parts = hash_bucket_agg(
        events.map_batches(_project, batch_format="pyarrow"),
        lambda b: np_col(b, "u"),
        _census, num_buckets=num_buckets).take_all()
    for r in parts:
        total[int(r["ri"])] += int(r["n"])
    order = np.argsort(np.asarray(_ALLEN_RELS, object))
    return pa.table({
        "rel": pa.array([_ALLEN_RELS[i] for i in order], pa.string()),
        "n_pairs": pa.array(total[order], pa.int64()),
    })


def position_attribution(
    events: rd.Dataset,
    touch_types: tuple[str, ...] = ("view", "click"),
    conv_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 32,
    scale: int = 1_000_000,
) -> pa.Table:
    """Position-based (U-shaped / 40-20-40) multi-touch attribution
    with EXACT integer credits: each conversion distributes ``scale``
    micro-credits over its strictly-prior touches under the
    (ts, event_id) total order — first touch 40%, last touch 40%,
    middles splitting 20% by integer floor division with the remainder
    pinned to the EARLIEST middle (so credits always sum to exactly
    ``scale``); k=1 → all, k=2 → 50/50, k=0 → the full credit lands on
    the '<none>' channel (Σ credit ≡ scale·#conversions, the audit
    invariant).  ONE user-bucketed exchange; per bucket a lexsort +
    per-user searchsorted over touch positions; per-type partial sums
    leave the bucket."""
    from .ops import hash_bucket_agg

    keep = set(touch_types) | {conv_type}

    def _project(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column(type_col).to_pylist(), object)
        m = np.isin(et, list(keep))
        t = batch.take(pa.array(np.flatnonzero(m)))
        return pa.table({
            "u": t.column(user_col).cast(pa.int64()),
            "ty": t.column(type_col),
            "ts": pa.array(_epoch_us(t, ts_col), pa.int64()),
            "eid": t.column(id_col).cast(pa.int64()),
        })

    first_c = (scale * 2) // 5
    mid_pool = scale - 2 * first_c

    def _credit(grp: pa.Table) -> pa.Table:
        u = np_col(grp, "u")
        ty = np.asarray(grp.column("ty").to_pylist(), object)
        ts = np_col(grp, "ts")
        eid = np_col(grp, "eid")
        order = np.lexsort((eid, ts, u))
        u, ty, ts, eid = u[order], ty[order], ts[order], eid[order]
        credits: dict[str, int] = {}

        def _add(ch, c):
            credits[ch] = credits.get(ch, 0) + int(c)

        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        for st, en in zip(starts, np.r_[starts[1:], len(u)]):
            tys = ty[st:en]
            is_conv = tys == conv_type
            touch_idx = np.flatnonzero(~is_conv)
            T = tys[touch_idx]
            for pos in np.flatnonzero(is_conv):
                k = int(np.searchsorted(touch_idx, pos))
                if k == 0:
                    _add("<none>", scale)
                elif k == 1:
                    _add(T[0], scale)
                elif k == 2:
                    _add(T[0], scale // 2)
                    _add(T[1], scale - scale // 2)
                else:
                    _add(T[0], first_c)
                    _add(T[k - 1], first_c)
                    m = mid_pool // (k - 2)
                    rem = mid_pool - m * (k - 2)
                    for t_mid in T[1:k - 1]:
                        _add(t_mid, m)
                    _add(T[1], rem)
        chs = sorted(credits)
        return pa.table({
            "touch_type": pa.array(chs, pa.string()),
            "credit": pa.array([credits[c] for c in chs], pa.int64()),
        })

    acc: dict[str, int] = {}
    for r in hash_bucket_agg(
            events.map_batches(_project, batch_format="pyarrow"),
            lambda b: np_col(b, "u"), _credit,
            num_buckets=num_buckets).take_all():
        acc[r["touch_type"]] = acc.get(r["touch_type"], 0) \
            + int(r["credit"])
    chs = sorted(acc)
    return pa.table({
        "touch_type": pa.array(chs, pa.string()),
        "credit_micros": pa.array([acc[c] for c in chs], pa.int64()),
    })


def rolling_window_median(
    events: rd.Dataset,
    k: int = 5,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    val_col: str = "__cents__",
    num_buckets: int = 64,
) -> rd.Dataset:
    """Per-key sliding-window LOWER MEDIAN over the last ``k`` rows —
    the holistic window aggregate (SQL ``quantile_disc(v, 0.5) OVER
    (... ROWS k-1 PRECEDING)``) that a prefix sum cannot express:
    per event, the element at sorted index ``floor((w-1)/2)`` of its
    window of ``w = min(row_pos+1, k)`` values, exactly DuckDB's
    discrete-quantile pick, so integer inputs stay bit-exact.

    Same single user-bucketed shuffle as :func:`rolling_window_agg`;
    the per-bucket kernel is ONE lexsort + a gathered (n × k) window
    matrix (out-of-window slots filled with +inf so they sort last) +
    one ``np.sort(axis=1)`` and a per-row ``take_along_axis`` at the
    window's own median index — no per-row Python, O(n·k log k) per
    bucket with k a small constant."""
    kk = np.int64(k)
    big = np.int64((1 << 62))

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col).cast(pa.int64()),
                "__ts__": pa.array(_epoch_us(batch, ts_col), pa.int64()),
                id_col: batch.column(id_col).cast(pa.int64()),
                val_col: batch.column(val_col).cast(pa.int64()),
            }
        )

    def _med(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "roll_median": pa.array([], pa.int64()),
                    "roll_n": pa.array([], pa.int64()),
                }
            )
        u = np_col(grp, user_col)
        t = np_col(grp, "__ts__")
        e = np_col(grp, id_col)
        v = np_col(grp, val_col)
        order = np.lexsort((e, t, u))
        u, e, v = u[order], e[order], v[order]
        n = len(u)
        seg_starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        row_start = seg_starts[np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1]
        i = np.arange(n, dtype=np.int64)
        win_start = np.maximum(row_start, i - kk + 1)
        w = i + 1 - win_start
        # gather the k-lookback matrix: column j holds v[i - j],
        # masked to +inf where j falls before the window start
        offs = np.arange(k, dtype=np.int64)
        idx = i[:, None] - offs[None, :]
        valid = offs[None, :] < w[:, None]
        m = np.where(valid, v[np.maximum(idx, 0)], big)
        m.sort(axis=1)
        med_idx = (w - 1) // 2
        med = np.take_along_axis(m, med_idx[:, None], axis=1)[:, 0]
        return pa.table(
            {
                id_col: pa.array(e, pa.int64()),
                "roll_median": pa.array(med, pa.int64()),
                "roll_n": pa.array(w, pa.int64()),
            }
        )

    projected = events.map_batches(_project, batch_format="pyarrow")
    return hash_bucket_agg(
        projected,
        lambda b: np_col(b, user_col).astype(np.int64),
        _med,
        num_buckets=num_buckets,
    )
