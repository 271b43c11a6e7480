"""Generic distributed operators built on Ray Data primitives.

These are the engine's relational/shuffle building blocks (SURVEY.md
§2.4).  The central trick, shared with the superstep engine: instead of
letting ``groupby(fine_key).aggregate`` shuffle + reduce row-wise over
millions of distinct keys, stamp a coarse ``bucket = hash(key) % P``
column, shuffle once on P int buckets, and run the real aggregation
VECTORIZED (pandas/numpy C kernels) inside each bucket's ``map_groups``
call.  Because the bucket is a pure function of the key, every
occurrence of a key lands in the same bucket and per-bucket results are
globally correct.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .util import hash64, np_col

DEFAULT_BUCKETS = 64


def hash_bucket_agg(
    ds: rd.Dataset,
    key_fn: Callable[[pa.Table], np.ndarray],
    group_fn: Callable[[pa.Table], pa.Table],
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """One coarse shuffle + vectorized per-bucket aggregation.

    ``key_fn(batch) -> int64 array`` (the grouping key, pre-hash);
    ``group_fn(bucket_table) -> table`` must aggregate ALL keys present
    in the bucket (they are complete: same key → same bucket).
    """

    # NOTE on empty sort partitions: ``map_groups`` yields no block at
    # all for an empty partition, which surfaces as a schema-less
    # RefBundle and a benign executor warning ("different schema / new
    # schema: ."); __init__ installs a narrowly-matched log filter for
    # exactly that empty-new-schema message.  A round-5 attempt to
    # route ALL 133 hash_bucket_agg call sites through the raw-task
    # exchange (manual_bucket_agg) for typed empty outputs tripped a
    # Ray-core refcount CHECK crash (reference_count.cc:581) under
    # sweep-scale ObjectRef churn and was reverted — keep the Dataset
    # groupby here; use manual_bucket_agg selectively at pipeline
    # boundaries.

    def _stamp(batch: pa.Table) -> pa.Table:
        b = (hash64(key_fn(batch)) % np.uint64(num_buckets)).astype(np.int32)
        return batch.append_column("__bucket__", pa.array(b, pa.int32()))

    def _run(grp: pa.Table) -> pa.Table:
        return group_fn(grp.drop_columns(["__bucket__"]))

    return (
        ds.map_batches(_stamp, batch_format="pyarrow")
        .groupby("__bucket__")
        .map_groups(_run, batch_format="pyarrow")
    )


@ray.remote
def _mba_split(tbl: pa.Table, num_buckets: int, key_fn):
    """Map side of the manual exchange: slice one block into its
    per-bucket sub-tables (one plasma object each via num_returns)."""
    if tbl.num_rows == 0:
        outs = [tbl] * num_buckets
        return tuple(outs) if num_buckets > 1 else outs[0]
    b = (hash64(key_fn(tbl)) % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(b, kind="stable")
    t = tbl.take(pa.array(order))
    sb = b[order]
    bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
    outs = [
        t.slice(bounds[p], bounds[p + 1] - bounds[p]).combine_chunks()
        for p in range(num_buckets)
    ]
    return tuple(outs) if num_buckets > 1 else outs[0]


@ray.remote
def _mba_reduce(group_fn, empty_result: pa.Table, *tabs) -> pa.Table:
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return empty_result
    return group_fn(pa.concat_tables(tabs, promote_options="default"))


def manual_bucket_agg(
    ds: rd.Dataset,
    key_fn: Callable[[pa.Table], np.ndarray],
    group_fn: Callable[[pa.Table], pa.Table],
    empty_result: pa.Table,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Drop-in for :func:`hash_bucket_agg` that runs the exchange as
    plain Ray tasks through the object store (per-block bucket split
    with ``num_returns`` → one concat+aggregate task per bucket)
    instead of Ray Data's sort-based ``groupby`` — the same trick that
    cut the no-checkpoint graph build 6× (graph.py `_split_block`).
    Semantics identical: same key → same bucket, ``group_fn`` sees the
    complete bucket.  ``empty_result`` supplies the output schema for
    buckets that receive no rows.  Materializes ``ds`` (its blocks
    become the map inputs), so prefer it for aggregations that already
    sit at a pipeline boundary."""
    block_refs = ds.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(empty_result)
    if num_buckets > 1:
        split = [
            _mba_split.options(num_returns=num_buckets).remote(
                r, num_buckets, key_fn
            )
            for r in block_refs
        ]
    else:
        split = [[_mba_split.remote(r, num_buckets, key_fn)] for r in block_refs]
    outs = [
        _mba_reduce.remote(
            group_fn, empty_result, *[split[b][p] for b in range(len(split))]
        )
        for p in range(num_buckets)
    ]
    return rd.from_arrow_refs(outs)


def grouped_pandas_agg(
    ds: rd.Dataset,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    key_fn: Callable[[pa.Table], np.ndarray] | None = None,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Bucketed group-aggregate with pandas named aggregations.

    ``aggs``: out_col → (in_col, "sum"|"min"|"max"|"count"|...).
    Defaults to hashing the first key column (must be numeric unless
    ``key_fn`` given).
    """

    if key_fn is None:
        key_fn = lambda batch: np_col(batch, keys[0]).astype(np.int64)

    _REDUCEAT = {"sum": np.add, "min": np.minimum, "max": np.maximum}

    def _agg(grp: pa.Table) -> pa.Table:
        # fast path — integer keys, reduceat-able aggs: ONE lexsort +
        # run-boundary reductions instead of a pandas groupby (which
        # builds a MultiIndex and is ~40× slower per bucket).
        # Contract kept identical to the pandas fallback: integer sum
        # inputs are upcast to int64 before reduceat (pandas upcasts;
        # raw reduceat would keep int32 and overflow), and any float
        # value column containing NaN routes the bucket to pandas
        # (reduceat min/max/sum propagate NaN; pandas groupby skips it).
        karrs = [np_col(grp, k) for k in keys]
        fast = all(a.dtype.kind in "iu" for a in karrs) and all(
            f in ("sum", "min", "max", "count") for _, (_, f) in aggs.items()
        )
        if fast:
            for _, (c, f) in aggs.items():
                v = np_col(grp, c)
                if v.dtype.kind == "f" and np.isnan(v).any():
                    fast = False
                    break
        if fast:
            order = np.lexsort(tuple(karrs[::-1]))  # keys[0] primary
            sk = [a[order] for a in karrs]
            n = len(order)
            if n:
                diff = np.zeros(n - 1, bool)
                for a in sk:
                    diff |= a[1:] != a[:-1]
                starts = np.flatnonzero(np.r_[True, diff])
            else:
                starts = np.zeros(0, np.int64)
            cols: dict = {k: sk[i][starts] for i, k in enumerate(keys)}
            for o, (c, f) in aggs.items():
                v = np_col(grp, c)[order]
                if f == "count":
                    cols[o] = np.diff(np.r_[starts, n]).astype(np.int64)
                else:
                    if f == "sum" and v.dtype.kind in "iu":
                        v = v.astype(np.int64)
                    cols[o] = (
                        _REDUCEAT[f].reduceat(v, starts)
                        if n
                        else np.zeros(0, v.dtype)
                    )
            return pa.table({k: pa.array(v) for k, v in cols.items()})
        df = grp.to_pandas()
        out = df.groupby(keys, sort=True).agg(
            **{o: pd.NamedAgg(column=c, aggfunc=f) for o, (c, f) in aggs.items()}
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata()

    return hash_bucket_agg(ds, key_fn, _agg, num_buckets)


def neighbor_reduce(
    msgs: rd.Dataset,
    key: str,
    value: str,
    how: str = "sum",
    hot_keys: np.ndarray | None = None,
    num_salts: int = 8,
) -> rd.Dataset:
    """Standalone combine-by-destination with EXPLICIT hub salting — the
    reference's ``neighborreduce`` segmented reduction (gunrock/
    essentials ``framework/operators/neighborreduce/neighborreduce.hxx``
    [U — snapshot absent, SURVEY.md §0]) as a two-stage shuffle.

    Rows whose ``key`` is in ``hot_keys`` (e.g. vertices above the
    99.9th in-degree percentile) are stamped ``salt = hash(row) %
    num_salts``; stage 1 combines on (key, salt) — spreading each hub's
    message stream over ``num_salts`` reducers — and stage 2 combines
    the ≤ num_salts partials per hub.  Cold keys take a single stage.
    (The superstep engine gets the same effect structurally from its
    per-source-partition pre-combine; this operator is the explicit
    form for free-standing message datasets, and the salting-equivalence
    test pins that both give identical results.)
    """
    assert how in ("sum", "min", "max", "count")
    hot = np.sort(hot_keys) if hot_keys is not None else np.zeros(0, np.int64)

    def _stage1_key(batch: pa.Table) -> np.ndarray:
        k = np_col(batch, key).astype(np.int64)
        return k

    def _stamp_salt(batch: pa.Table) -> pa.Table:
        k = np_col(batch, key).astype(np.int64)
        if len(hot) == 0:
            is_hot = np.zeros(len(k), dtype=bool)
        else:
            idx = np.searchsorted(hot, k)
            is_hot = (idx < len(hot)) & (hot[np.minimum(idx, len(hot) - 1)] == k)
        # value-based salt (never batch-position-based): identical rows
        # always land in the same stage-1 partial regardless of how Ray
        # splits blocks, so float partial-sum grouping is deterministic
        v = np_col(batch, value)
        vbits = np.ascontiguousarray(np.asarray(v, np.float64)).view(np.uint64)
        with np.errstate(over="ignore"):
            mix = k.astype(np.uint64) * np.uint64(1315423911) + vbits
        salt = np.where(
            is_hot, (hash64(mix.astype(np.int64)) % np.uint64(num_salts)).astype(np.int64), 0
        )
        return batch.append_column("__salt__", pa.array(salt, pa.int64()))

    def _agg(keys_: list[str], fn: str):
        def _fn(grp: pa.Table) -> pa.Table:
            df = grp.to_pandas()
            out = df.groupby(keys_, sort=True)[value].agg(fn).reset_index()
            return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata()

        return _fn

    # partial counts re-combine by SUM, everything else by itself
    how2 = "sum" if how == "count" else how

    salted = msgs.map_batches(_stamp_salt, batch_format="pyarrow")
    stage1 = hash_bucket_agg(
        salted,
        lambda b: np_col(b, key).astype(np.int64) * np.int64(num_salts)
        + np_col(b, "__salt__"),
        _agg([key, "__salt__"], how),
    )
    stage2 = hash_bucket_agg(
        stage1,
        lambda b: np_col(b, key).astype(np.int64),
        lambda grp: _agg([key], how2)(grp.drop_columns(["__salt__"])),
    )
    return stage2


def top_k(
    ds: rd.Dataset,
    by: str,
    k: int,
    descending: bool = True,
    tie_cols: list[str] | None = None,
) -> pa.Table:
    """Distributed top-k: per-block partial top-k inside map_batches,
    then a driver-side merge of ≤ k·num_blocks rows (SURVEY.md §2.4
    R6).  ``tie_cols`` (ascending) pin ties at the k-boundary to a
    total order, making the selected SET deterministic at any block
    layout — required whenever ``by`` has duplicates."""
    ties = tie_cols or []

    def _partial(batch: pa.Table) -> pa.Table:
        v = np_col(batch, by)
        if len(v) <= k:
            return batch
        if ties:
            keys = [np_col(batch, c) for c in reversed(ties)]
            order = np.lexsort([*keys, -v if descending else v])
            return batch.take(pa.array(np.sort(order[:k])))
        if descending:
            idx = np.argpartition(-v, k)[:k]
        else:
            idx = np.argpartition(v, k)[:k]
        return batch.take(pa.array(np.sort(idx)))

    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    if not parts:
        # typed empty result (an untyped empty table would make the
        # sort below fail on the missing key column)
        schema = getattr(ds.schema(), "base_schema", None)
        return schema.empty_table() if schema is not None else pa.table({})
    t = pa.Table.from_pylist(parts)
    sort_keys = [(by, "descending" if descending else "ascending")]
    sort_keys += [(c, "ascending") for c in ties]
    order = pa.compute.sort_indices(t, sort_keys=sort_keys)
    return t.take(order[:k])


def grouped_top_k(
    ds: rd.Dataset,
    group_cols: list[str],
    by: str,
    k: int,
    descending: bool = True,
    tie_cols: list[str] | None = None,
    key_fn: Callable[[pa.Table], np.ndarray] | None = None,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Exact top-k rows PER GROUP (SURVEY.md §2.4 R6 generalized): one
    bucketed shuffle on the group key brings each group together, then a
    vectorized in-bucket sort + head(k).  ``tie_cols`` (ascending) make
    the selection deterministic under ties; output carries ``rank``
    (1-based).  The result is ≤ k rows per group — driver-small per
    group even when groups are huge."""
    tie_cols = tie_cols or []
    if key_fn is None:
        key_fn = lambda b: np_col(b, group_cols[0]).astype(np.int64)

    def _topk(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        df = df.sort_values(
            group_cols + [by] + tie_cols,
            ascending=[True] * len(group_cols) + [not descending]
            + [True] * len(tie_cols),
            kind="stable",
        )
        df = df.groupby(group_cols, sort=False).head(k).copy()
        df["rank"] = df.groupby(group_cols, sort=False).cumcount() + 1
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata()

    return hash_bucket_agg(ds, key_fn, _topk, num_buckets)


def _hll_rank(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: rank = leading zeros of the
    low 64-p bits + 1 (sentinel ones make the cap implicit)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel ones
    rank = np.zeros(len(h), np.int8)
    cur = rest
    for b in (32, 16, 8, 4, 2, 1):
        mask = cur < np.uint64(1 << (64 - b))
        rank[mask] += b
        cur = np.where(mask, cur << np.uint64(b), cur)
    rank += 1
    return idx, np.minimum(rank, 64 - p + 1)


@ray.remote
def _hll_block(p: int, col: str, *tables) -> np.ndarray:
    regs = np.zeros(1 << p, np.int8)
    for t in tables:
        if t.num_rows == 0 or col not in t.schema.names:
            continue
        h = hash64(np_col(t, col).astype(np.int64))
        idx, rank = _hll_rank(h, p)
        np.maximum.at(regs, idx, rank)
    return regs


@ray.remote
def _hll_merge(*regs) -> np.ndarray:
    out = regs[0].copy()
    for r in regs[1:]:
        np.maximum(out, r, out=out)
    return out


def _hll_sketch(ds: rd.Dataset, col: str, p: int) -> np.ndarray:
    """Shared sketch builder: per-block register folds tree-merged as
    Ray tasks; only 2^p bytes ever reach the driver."""
    assert 4 <= p <= 18
    blocks = ds.to_arrow_refs()
    refs = [
        _hll_block.remote(p, col, *blocks[i : i + 4])
        for i in range(0, max(len(blocks), 1), 4)
    ]
    while len(refs) > 1:
        refs = [_hll_merge.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    return ray.get(refs[0])


def hll_registers(ds: rd.Dataset, col: str, p: int = 10) -> pa.Table:
    """The HyperLogLog sketch ITSELF as a (reg, rho) table — all 2^p
    registers, zeros included.  Because register content is
    max(leading-zero rank) over splitmix64 hashes, the table is a pure
    function of the input VALUE SET (dedup-invariant, layout-invariant,
    cluster-size-invariant) and is exactly reproducible in SQL bit
    arithmetic — which makes the sketch, not just its float estimate,
    oracle-checkable.  This is also the mergeable artifact two
    pipelines would exchange to union their distinct counts."""
    regs = _hll_sketch(ds, col, p)
    return pa.table({
        "reg": pa.array(np.arange(1 << p, dtype=np.int64), pa.int64()),
        "rho": pa.array(regs.astype(np.int64), pa.int64()),
    })


def hll_registers_by(ds: rd.Dataset, key: str, col: str, p: int = 8,
                     num_buckets: int = 16) -> rd.Dataset:
    """Per-GROUP HyperLogLog sketches — the "distinct users per
    segment" shape that at 100 TB replaces a per-group exact distinct
    (an all-to-all shuffle of every row) with a bounded exchange: each
    block folds its rows into a dense (groups-in-block × 2^p) register
    matrix via one vectorized maximum.at, emits only the NONZERO
    (key, reg, rho) cells, and a single bucketed grouped-max combines
    the partials — rows moved ≤ blocks · groups · 2^p regardless of
    input size.  Observed cells only (rho ≥ 1); a group's estimate
    derives from its rows + implicit zeros.  Like ``hll_registers``
    the result is a pure function of each group's value set, so the
    whole grouped sketch is SQL-reproducible."""

    def _partial(t: pa.Table) -> pa.Table:
        enc = t.column(key).combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        uniq = enc.dictionary
        h = hash64(np_col(t, col).astype(np.int64))
        idx, rank = _hll_rank(h, p)
        mat = np.zeros((len(uniq), 1 << p), np.int8)
        np.maximum.at(mat, (codes, idx), rank)
        gi, ri = np.nonzero(mat)
        return pa.table({
            key: uniq.take(pa.array(gi, pa.int64())),
            "reg": pa.array(ri.astype(np.int64), pa.int64()),
            "rho": pa.array(mat[gi, ri].astype(np.int64), pa.int64()),
        })

    def _key_fn(b: pa.Table) -> np.ndarray:
        from .derive import _str_hash

        ka = b.column(key)
        kh = (_str_hash(ka) if pa.types.is_string(ka.type)
              or pa.types.is_large_string(ka.type)
              else np_col(b, key).astype(np.int64))
        with np.errstate(over="ignore"):
            return kh * np.int64(31) + np_col(b, "reg")

    return grouped_pandas_agg(
        ds.map_batches(_partial, batch_format="pyarrow"),
        keys=[key, "reg"], aggs={"rho": ("rho", "max")},
        key_fn=_key_fn, num_buckets=num_buckets)


def hll_estimate_from_registers(rho: np.ndarray, p: int) -> float:
    """Estimate from a (possibly sparse) register vector's nonzero
    ranks — shared small/large-range corrections with hll_distinct."""
    m = float(1 << p)
    nz = np.asarray(rho, np.float64)
    zeros = int((1 << p) - len(nz[nz > 0]))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / (np.sum(np.exp2(-nz[nz > 0])) + zeros)
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    elif est > (1 << 64) / 30.0:
        est = -(2.0**64) * np.log1p(-est / 2.0**64)
    return float(est)


def hll_distinct(ds: rd.Dataset, col: str, p: int = 14) -> float:
    """Approximate ``count(DISTINCT col)`` via HyperLogLog (Flajolet
    et al. 2007) with the standard small/large-range corrections —
    the 100-TB path where an exact distinct would be an all-to-all
    shuffle: each block folds into a 2^p-register sketch (splitmix64
    hashing, so the estimate is DETERMINISTIC given the input — same
    result across runs, block layouts and cluster sizes because
    register merge is a max), sketches tree-merge as Ray tasks, and
    only 2^p bytes ever reach the driver.  Typical error ≈
    1.04/√2^p (~0.8 % at p=14)."""
    regs = _hll_sketch(ds, col, p).astype(np.float64)
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    elif est > (1 << 64) / 30.0:
        est = -(2.0**64) * np.log1p(-est / 2.0**64)
    return float(est)


_CM_SEED = 0x9E3779B97F4A7C15  # per-row golden stride, same as hash64's


def cm_sketch(ds: rd.Dataset, col: str, depth: int = 4,
              width: int = 256) -> pa.Table:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over an int64
    key column: ``n[j][s] = #rows where splitmix64(key + j·golden) mod
    width == s``.  The scale shape mirrors int_histogram — each block
    folds ONE depth×width int64 matrix, the driver sums block-count
    vectors, ZERO shuffle — and the sketch is a pure integer function
    of the multiset of keys (layout/cluster-size invariant, mergeable
    by addition), so the full (j, slot, n) table is SQL-reproducible
    through the shared SplitMix64 CTE chain.  Point estimate:
    ``cm_estimate`` (min over rows j) upper-bounds the true count and
    errs by ≤ ε·N with prob 1−δ at width=⌈e/ε⌉, depth=⌈ln 1/δ⌉."""
    seeds = np.array([(j * _CM_SEED) % (1 << 64) for j in range(depth)],
                     np.uint64)

    def _partial(t: pa.Table) -> pa.Table:
        x = np_col(t, col).astype(np.int64).view(np.uint64)
        mat = np.zeros((depth, width), np.int64)
        with np.errstate(over="ignore"):
            for j in range(depth):
                h = hash64((x + seeds[j]).view(np.int64))
                mat[j] = np.bincount(
                    (h % np.uint64(width)).astype(np.int64),
                    minlength=width)
        return pa.table({"cmv": pa.array([mat.ravel().tobytes()],
                                         pa.large_binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    tot = np.zeros(depth * width, np.int64)
    for r in parts:
        tot += np.frombuffer(r["cmv"], np.int64)
    jj = np.repeat(np.arange(depth, dtype=np.int64), width)
    ss = np.tile(np.arange(width, dtype=np.int64), depth)
    return pa.table({"j": pa.array(jj, pa.int64()),
                     "slot": pa.array(ss, pa.int64()),
                     "n": pa.array(tot, pa.int64())})


def cm_estimate(sketch: pa.Table, keys: np.ndarray, depth: int = 4,
                width: int = 256) -> np.ndarray:
    """Point-query the sketch: min over rows j of the key's slot count."""
    n = np_col(sketch, "n").reshape(depth, width)
    ks = np.asarray(keys, np.int64).view(np.uint64)
    est = np.full(len(ks), np.iinfo(np.int64).max, np.int64)
    with np.errstate(over="ignore"):
        for j in range(depth):
            h = hash64((ks + np.uint64((j * _CM_SEED) % (1 << 64)))
                       .view(np.int64))
            est = np.minimum(est, n[j, (h % np.uint64(width)).astype(np.int64)])
    return est


def ams_f2(ds: rd.Dataset, col: str, k: int = 32) -> pa.Table:
    """AMS tug-of-war sketch (Alon, Matias & Szegedy 1996) of an int64
    key column's second frequency moment F₂ = Σ_v c_v² — the self-join
    size, the statistic that prices every equi-join on the column.
    Counter j is ``z_j = Σ_rows sign_j(key)`` with ``sign_j = ±1`` by
    the top bit of splitmix64(key + j·golden); E[z_j²] = F₂ exactly,
    and the mean of the k squares estimates F₂ with relative σ≈√(2/k).

    Scale shape mirrors cm_sketch: each block folds ONE k-vector of
    int64 sign sums, the driver adds the block vectors — ZERO shuffle,
    mergeable by plain addition (a distributed pipeline can keep one
    per partition and add), and the (j, zj) table is a pure integer
    function of the key multiset, layout/cluster-size invariant and
    SQL-reproducible through the shared SplitMix64 CTE chain.

    Returns k rows ``(j, zj, f2_est)`` with ``f2_est = (Σ z_j²) // k``
    (floor; exact integer) repeated on every row as the readout."""
    seeds = np.array([(j * _CM_SEED) % (1 << 64) for j in range(k)],
                     np.uint64)

    def _partial(t: pa.Table) -> pa.Table:
        x = np_col(t, col).astype(np.int64).view(np.uint64)
        vec = np.zeros(k, np.int64)
        with np.errstate(over="ignore"):
            for j in range(k):
                h = hash64((x + seeds[j]).view(np.int64))
                # sign = +1 when the top bit is set, else -1:
                # Σ sign = 2·popcount(top bits) − n
                vec[j] = 2 * int((h >> np.uint64(63)).sum()) - len(x)
        return pa.table({"amsv": pa.array([vec.tobytes()],
                                          pa.large_binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    tot = np.zeros(k, np.int64)
    for r in parts:
        tot += np.frombuffer(r["amsv"], np.int64)
    # Σ z² can exceed int64 (z up to N); fold in Python ints, floor-div.
    est = sum(int(z) * int(z) for z in tot) // k
    return pa.table({
        "j": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
        "zj": pa.array(tot, pa.int64()),
        "f2_est": pa.array(np.full(k, est, np.int64), pa.int64()),
    })


def exact_f2(ds: rd.Dataset, col: str,
             num_buckets: int = DEFAULT_BUCKETS) -> int:
    """Exact F₂ = Σ_v c_v² of an int64 column — the sketch's audit.
    Distributed: per-value counts via one bucketed combine
    (int_value_counts), then per-block Σ c² partials summed on the
    driver; the distinct-value table is never driver-materialized."""
    counts = int_value_counts(ds, col, num_buckets=num_buckets)

    def _sq(t: pa.Table) -> pa.Table:
        c = np_col(t, "count")
        return pa.table({"s": pa.array([int(np.dot(c, c))], pa.int64())})

    return sum(r["s"] for r in
               counts.map_batches(_sq, batch_format="pyarrow").take_all())


def int_value_counts(
    ds: rd.Dataset,
    col: str,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """(value, count) of an integer column: per-batch pre-combine
    (segment_sum) + one bucketed combine — the distributed histogram
    that exact order statistics reduce to when the value domain is
    bounded (counts move, rows never do)."""
    from .util import segment_sum

    def _partial(batch: pa.Table) -> pa.Table:
        v = np_col(batch, col).astype(np.int64)
        uniq, sums, _ = segment_sum(v, np.ones(len(v), np.int64))
        return pa.table(
            {"value": pa.array(uniq, pa.int64()),
             "count": pa.array(sums, pa.int64())}
        )

    def _combine(grp: pa.Table) -> pa.Table:
        uniq, sums, _ = segment_sum(np_col(grp, "value"), np_col(grp, "count"))
        return pa.table(
            {"value": pa.array(uniq, pa.int64()),
             "count": pa.array(sums, pa.int64())}
        )

    return hash_bucket_agg(
        ds.map_batches(_partial, batch_format="pyarrow"),
        lambda b: np_col(b, "value"),
        _combine,
        num_buckets=num_buckets,
    )


def exact_quantiles(
    ds: rd.Dataset, col: str, qs: list[float]
) -> list[int]:
    """EXACT discrete quantiles of an integer column (DuckDB
    ``quantile_disc`` semantics: the sorted value at index
    ``ceil(q·n) − 1``), computed from the distributed value histogram —
    the driver sees one row per DISTINCT value, never the data."""
    import ray

    parts = [
        t
        for t in ray.get(int_value_counts(ds, col).to_arrow_refs())
        if t.num_rows
    ]
    if not parts:
        return [0 for _ in qs]
    t = pa.concat_tables(parts)
    vals = np_col(t, "value")
    cnts = np_col(t, "count")
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    out = []
    for q in qs:
        idx = int(np.ceil(q * n)) - 1  # 0-based rank, quantile_disc rule
        idx = min(max(idx, 0), n - 1)
        out.append(int(vals[np.searchsorted(cum, idx + 1)]))
    return out


def exact_quantiles_cont(
    ds: rd.Dataset, col: str, qs: list[float]
) -> list[float]:
    """EXACT interpolated quantiles (SQL ``quantile_cont`` semantics:
    position q·(n−1), linear interpolation between the two bracketing
    sorted values) from the same distributed value histogram as
    :func:`exact_quantiles`.  Bit-exactness across engines holds when
    every ``q`` is DYADIC (k/2^m, e.g. 0.25/0.5/0.75): then q·(n−1),
    the fractional part and the interpolation are all exactly
    representable doubles, so ANY algebraic arrangement of the lerp
    (v_lo + (v_hi−v_lo)·f vs v_lo·(1−f) + v_hi·f) yields the identical
    float — safe to hash-compare against a SQL twin."""
    import ray

    parts = [
        t
        for t in ray.get(int_value_counts(ds, col).to_arrow_refs())
        if t.num_rows
    ]
    if not parts:
        return [0.0 for _ in qs]
    t = pa.concat_tables(parts)
    vals = np_col(t, "value")
    cnts = np_col(t, "count")
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    out = []
    for q in qs:
        pos = q * (n - 1)
        lo = int(np.floor(pos))
        hi = min(lo + 1, n - 1)
        f = pos - lo
        vlo = float(vals[np.searchsorted(cum, lo + 1)])
        vhi = float(vals[np.searchsorted(cum, hi + 1)])
        out.append(vlo + (vhi - vlo) * f)
    return out


def grouped_distinct_count(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    out_col: str = "n_distinct",
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Exact ``count(DISTINCT val) GROUP BY key`` for int64 key/value:
    per-batch pair distinct (lexsort + run boundaries), one bucketed
    shuffle on the key, per-bucket distinct again + run counts.  Only
    distinct pairs ever move — the shuffle is bounded by the pair
    cardinality, not the row count."""

    def _distinct(batch: pa.Table) -> pa.Table:
        k = np_col(batch, key_col)
        v = np_col(batch, val_col)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        first = (
            np.r_[True, (k[1:] != k[:-1]) | (v[1:] != v[:-1])]
            if len(k)
            else np.zeros(0, bool)
        )
        return pa.table(
            {key_col: pa.array(k[first], pa.int64()),
             val_col: pa.array(v[first], pa.int64())}
        )

    def _count(grp: pa.Table) -> pa.Table:
        d = _distinct(grp)
        k = np_col(d, key_col)
        kfirst = np.r_[True, k[1:] != k[:-1]] if len(k) else np.zeros(0, bool)
        starts = np.flatnonzero(kfirst)
        return pa.table(
            {
                key_col: pa.array(k[starts], pa.int64()),
                out_col: pa.array(
                    np.diff(np.r_[starts, len(k)]).astype(np.int64), pa.int64()
                ),
            }
        )

    return hash_bucket_agg(
        ds.map_batches(_distinct, batch_format="pyarrow"),
        lambda b: np_col(b, key_col),
        _count,
        num_buckets=num_buckets,
    )


def grouped_moments(
    ds: rd.Dataset,
    keys: list[str],
    val: str,
    key_fn: Callable[[pa.Table], np.ndarray] | None = None,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Exact integer moments per group — ``(n, sum_v, sumsq_v)`` of an
    integer-valued column: the bit-exact building block for grouped
    variance/stddev (``var_pop = (n·sumsq − sum²) / n²`` derives as an
    exact rational from the integer outputs, where emitting a float
    variance directly would hash-differ from any SQL engine's own
    incremental float accumulation).

    Scale shape: per-BLOCK partials pre-combine inside ``map_batches``
    (raw rows never enter the exchange), then ONE bucketed sum over
    (distinct keys × blocks) partial rows.  Caller guarantees Σv and
    Σv² fit int64 per group (true for any bounded measure column:
    50-max quantities need > 3×10¹⁵ rows per group to overflow)."""

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + [val]).to_pandas()
        v = df[val].to_numpy(np.int64)
        df = df[keys].copy()
        df["__n__"] = np.int64(1)
        df["__s__"] = v
        df["__s2__"] = v * v
        g = df.groupby(keys, sort=False, as_index=False).sum()
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata()

    return grouped_pandas_agg(
        ds.map_batches(_partial, batch_format="pyarrow"),
        keys=keys,
        aggs={
            "n": ("__n__", "sum"),
            "sum_v": ("__s__", "sum"),
            "sumsq_v": ("__s2__", "sum"),
        },
        key_fn=key_fn,
        num_buckets=num_buckets,
    )


def grouped_comoments(
    ds: rd.Dataset,
    keys: list[str],
    x: str,
    y: str,
    key_fn: Callable[[pa.Table], np.ndarray] | None = None,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Exact bivariate integer moments per group — ``(n, sum_x, sum_y,
    sum_xx, sum_yy, sum_xy)`` of two integer-valued columns: the
    bit-exact building block for grouped covariance / correlation.
    ``covar_pop`` numerator ``n·Σxy − Σx·Σy`` and both variance
    numerators derive as exact integers from the outputs, where a float
    covariance emitted directly would hash-differ from any SQL engine's
    own incremental float accumulation (summation order differs).

    Scale shape mirrors :func:`grouped_moments`: per-BLOCK partials
    pre-combine inside ``map_batches`` (raw rows never enter the
    exchange), then ONE bucketed sum over (distinct keys × blocks)
    partial rows.  Caller guarantees the cross products fit int64 per
    group (quantize accordingly)."""

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + [x, y]).to_pandas()
        vx = df[x].to_numpy(np.int64)
        vy = df[y].to_numpy(np.int64)
        df = df[keys].copy()
        df["__n__"] = np.int64(1)
        df["__sx__"] = vx
        df["__sy__"] = vy
        df["__sxx__"] = vx * vx
        df["__syy__"] = vy * vy
        df["__sxy__"] = vx * vy
        g = df.groupby(keys, sort=False, as_index=False).sum()
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata()

    return grouped_pandas_agg(
        ds.map_batches(_partial, batch_format="pyarrow"),
        keys=keys,
        aggs={
            "n": ("__n__", "sum"),
            "sum_x": ("__sx__", "sum"),
            "sum_y": ("__sy__", "sum"),
            "sum_xx": ("__sxx__", "sum"),
            "sum_yy": ("__syy__", "sum"),
            "sum_xy": ("__sxy__", "sum"),
        },
        key_fn=key_fn,
        num_buckets=num_buckets,
    )


def table_checksum(
    ds: rd.Dataset,
    key_fn: Callable[[pa.Table], np.ndarray],
    num_buckets: int = DEFAULT_BUCKETS,
) -> pa.Table:
    """Order-insensitive distributed content checksum: ``(n, checksum)``
    where ``checksum = Σ splitmix64(key) mod 2⁶⁴`` over every row.  The
    sum is commutative-associative, so the digest is a pure function of
    the multiset of row keys — invariant to block layout, partitioning
    and cluster size — making it the cheap anti-entropy primitive for
    validating a copy/migration/rewrite of a 100 TB table without
    moving it: compare two tables' digests, not their rows.  (A plain
    XOR would cancel duplicate rows; the wrapping SUM detects them.)

    Scale shape: one row ``(n, partial-sum)`` leaves each block via
    ``map_batches`` — no shuffle at all; the driver folds #blocks tiny
    rows.  ``key_fn(batch) -> uint64/int64 array`` packs the columns
    under test into one integer key (collision-mixing is the caller's
    contract, same as every bucketed op here)."""

    def _partial(batch: pa.Table) -> pa.Table:
        h = hash64(key_fn(batch))
        with np.errstate(over="ignore"):
            s = np.add.reduce(h, dtype=np.uint64) if len(h) else np.uint64(0)
        return pa.table(
            {
                "n": pa.array([len(h)], pa.int64()),
                # store the uint64 partial as its int64 bit pattern
                "s": pa.array(np.array([s], np.uint64).view(np.int64)),
            }
        )

    rows = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    parts = np.array([r["s"] for r in rows], np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        total = np.add.reduce(parts, dtype=np.uint64) if len(parts) else np.uint64(0)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "checksum": pa.array(np.array([total], np.uint64).view(np.int64)),
        }
    )


def merkle_range_tree(
    ds: rd.Dataset,
    key_fn: Callable[[pa.Table], np.ndarray],
    node_fn: Callable[[pa.Table], np.ndarray],
    levels: int = 6,
) -> pa.Table:
    """Merkle range-checksum tree: ``table_checksum`` layered so two
    replicas of a 100 TB table can localize WHICH key range diverges in
    O(log ranges) digest comparisons instead of re-reading either side.

    Level 0 groups rows by ``node_fn`` (e.g. ``key // width``) with
    ``h(node) = Σ splitmix64(key_fn(row)) mod 2⁶⁴`` — the wrapping sum
    is commutative, so level-0 digests are a pure function of each
    range's row multiset (block-layout / cluster-size invariant).
    Level k+1 halves the node id and sums ``splitmix64(h_child)`` —
    rehashing before the fold so sibling swaps and cross-node row moves
    change every ancestor.  Per-node row counts ``n`` ride along.

    Scale shape: one ≤#distinct-nodes partial row leaves each block
    (pre-combined with a segment sum); the driver folds partials and
    walks the (tiny) upper levels.  With millions of level-0 nodes,
    swap the driver fold for one ``hash_bucket_agg`` on the node id —
    the per-block pre-combine and every level above are unchanged.

    Returns ``(level, node, n, h)`` for levels 0..``levels`` with ``h``
    as the int64 bit pattern of the uint64 digest.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        h = hash64(key_fn(batch))
        node = node_fn(batch).astype(np.int64)
        order = np.argsort(node, kind="stable")
        node, h = node[order], h[order]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]])
        with np.errstate(over="ignore"):
            sums = np.add.reduceat(h, starts) if len(h) else h
        cnts = np.diff(np.r_[starts, len(node)]).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(node[starts], pa.int64()),
                "n": pa.array(cnts, pa.int64()),
                "s": pa.array(sums.view(np.int64)),
            }
        )

    rows = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    node = np.array([r["node"] for r in rows], np.int64)
    n = np.array([r["n"] for r in rows], np.int64)
    h = np.array([r["s"] for r in rows], np.int64).view(np.uint64)
    out_lvl, out_node, out_n, out_h = [], [], [], []
    for lvl in range(levels + 1):
        order = np.argsort(node, kind="stable")
        node, n, h = node[order], n[order], h[order]
        starts = np.flatnonzero(np.r_[True, node[1:] != node[:-1]]) \
            if len(node) else np.zeros(0, np.int64)
        with np.errstate(over="ignore"):
            hh = np.add.reduceat(h, starts) if len(h) else h
        nn = np.add.reduceat(n, starts) if len(n) else n
        node = node[starts]
        out_lvl.append(np.full(len(node), lvl, np.int64))
        out_node.append(node)
        out_n.append(nn)
        out_h.append(hh)
        # next level: rehash each node digest, halve the node id
        h = hash64(hh)
        n = nn
        node = node >> 1
    return pa.table(
        {
            "level": pa.array(np.concatenate(out_lvl), pa.int64()),
            "node": pa.array(np.concatenate(out_node), pa.int64()),
            "n": pa.array(np.concatenate(out_n), pa.int64()),
            "h": pa.array(np.concatenate(out_h).view(np.int64)),
        }
    )


def merkle_diff(
    tree_a: pa.Table,
    tree_b: pa.Table,
    levels: int,
) -> tuple[pa.Table, int]:
    """Anti-entropy walk over two ``merkle_range_tree`` outputs: start
    at the root level, compare digests, and descend ONLY into nodes
    whose (n, h) differ — the O(log ranges · diverging) localization
    that is the whole point of the layered tree.  Returns the
    diverging level-0 ranges as ``(node, n_a, h_a, n_b, h_b)`` (a
    side missing a node reports n=0, h=0) plus the number of node
    comparisons performed, so callers/tests can assert the walk
    touched far fewer nodes than a flat level-0 scan would.

    Driver-side by design: the trees themselves are the tiny artifact
    the distributed scan already reduced to (one partial row per
    (block, node)); the walk visits ≤ 2·|diverging|·levels nodes
    regardless of table size.
    """

    def _index(t: pa.Table) -> dict[int, tuple]:
        lv = np.asarray(t["level"], np.int64)
        nd = np.asarray(t["node"], np.int64)
        n = np.asarray(t["n"], np.int64)
        h = np.asarray(t["h"], np.int64)
        out = {}
        for k in range(levels + 1):
            m = lv == k
            order = np.argsort(nd[m], kind="stable")
            out[k] = (nd[m][order], n[m][order], h[m][order])
        return out

    A, B = _index(tree_a), _index(tree_b)
    comparisons = 0

    def _lookup(side: dict, k: int, d: int):
        nd, n, h = side[k]
        i = np.searchsorted(nd, d)
        if i < len(nd) and nd[i] == d:
            return int(n[i]), int(h[i])
        return None

    def _diverging(k: int, nodes: list[int]) -> list[int]:
        nonlocal comparisons
        out = []
        for d in nodes:
            comparisons += 1
            va, vb = _lookup(A, k, d), _lookup(B, k, d)
            if va != vb:
                out.append(d)
        return out

    top = np.union1d(A[levels][0], B[levels][0]).tolist()
    frontier = _diverging(levels, top)
    for k in range(levels - 1, -1, -1):
        children = []
        for d in frontier:
            for c in (2 * d, 2 * d + 1):
                ia = np.searchsorted(A[k][0], c)
                ib = np.searchsorted(B[k][0], c)
                if (ia < len(A[k][0]) and A[k][0][ia] == c) or (
                    ib < len(B[k][0]) and B[k][0][ib] == c
                ):
                    children.append(c)
        frontier = _diverging(k, children)

    frontier = sorted(frontier)
    rows = {"node": [], "n_a": [], "h_a": [], "n_b": [], "h_b": []}
    for d in frontier:
        va = _lookup(A, 0, d) or (0, 0)
        vb = _lookup(B, 0, d) or (0, 0)
        rows["node"].append(d)
        rows["n_a"].append(va[0])
        rows["h_a"].append(va[1])
        rows["n_b"].append(vb[0])
        rows["h_b"].append(vb[1])
    return (
        pa.table({c: pa.array(v, pa.int64()) for c, v in rows.items()}),
        comparisons,
    )


def profile_table(
    ds: rd.Dataset,
    cols: list[str],
    num_buckets: int = DEFAULT_BUCKETS,
) -> pa.Table:
    """One-pass data profile of integer columns: per column ``(n,
    n_null, min, max, ndv)`` — the stats a reader needs for pruning /
    sizing decisions, computed the way 100 TB allows:

    - n / n_null / min / max: per-block partials inside ``map_batches``
      (≤ #cols rows per block leave the scan), combined driver-side.
    - ndv (EXACT): per-block distinct ``(col, value)`` pairs, bucketed
      on the PAIR hash — not the column — so a high-cardinality
      column's distinct set spreads over all buckets instead of
      collapsing into one straggler; per-bucket distinct counts per col
      are ≤ #cols × #buckets rows, summed driver-side.
    """
    ncols = len(cols)

    def _stats(batch: pa.Table) -> pa.Table:
        out = {"col_id": [], "n": [], "n_null": [], "mn": [], "mx": []}
        for i, c in enumerate(cols):
            a = batch.column(c)
            nn = a.null_count
            v = np_col(pa.table({c: a.drop_null()}), c) if nn else np_col(
                batch, c
            )
            out["col_id"].append(i)
            out["n"].append(batch.num_rows)
            out["n_null"].append(nn)
            out["mn"].append(int(v.min()) if len(v) else np.iinfo(np.int64).max)
            out["mx"].append(int(v.max()) if len(v) else np.iinfo(np.int64).min)
        return pa.table(
            {k: pa.array(np.asarray(vv, np.int64), pa.int64())
             for k, vv in out.items()}
        )

    def _pairs(batch: pa.Table) -> pa.Table:
        ks, vs = [], []
        for i, c in enumerate(cols):
            v = np.unique(np_col(pa.table({c: batch.column(c).drop_null()}), c))
            ks.append(np.full(len(v), i, np.int64))
            vs.append(v.astype(np.int64))
        return pa.table(
            {"col_id": pa.array(np.concatenate(ks), pa.int64()),
             "val": pa.array(np.concatenate(vs), pa.int64())}
        )

    def _bucket_ndv(grp: pa.Table) -> pa.Table:
        k = np_col(grp, "col_id")
        v = np_col(grp, "val")
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        first = (
            np.r_[True, (k[1:] != k[:-1]) | (v[1:] != v[:-1])]
            if len(k) else np.zeros(0, bool)
        )
        ku = k[first]
        starts = np.flatnonzero(np.r_[True, ku[1:] != ku[:-1]]) if len(ku) \
            else np.zeros(0, np.int64)
        return pa.table(
            {"col_id": pa.array(ku[starts], pa.int64()),
             "ndv": pa.array(np.diff(np.r_[starts, len(ku)]).astype(np.int64),
                             pa.int64())}
        )

    def _pair_key(b: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (
                np_col(b, "col_id").astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                + np_col(b, "val").astype(np.uint64)
            ).astype(np.int64)

    stats_rows = grouped_pandas_agg(
        ds.map_batches(_stats, batch_format="pyarrow"),
        keys=["col_id"],
        aggs={"n": ("n", "sum"), "n_null": ("n_null", "sum"),
              "mn": ("mn", "min"), "mx": ("mx", "max")},
        num_buckets=min(num_buckets, 8),
    ).take_all()
    ndv_rows = hash_bucket_agg(
        ds.map_batches(_pairs, batch_format="pyarrow"),
        _pair_key, _bucket_ndv, num_buckets,
    ).take_all()

    n = np.zeros(ncols, np.int64)
    nnull = np.zeros(ncols, np.int64)
    mn = np.full(ncols, np.iinfo(np.int64).max)
    mx = np.full(ncols, np.iinfo(np.int64).min)
    ndv = np.zeros(ncols, np.int64)
    for r in stats_rows:
        i = r["col_id"]
        n[i], nnull[i], mn[i], mx[i] = r["n"], r["n_null"], r["mn"], r["mx"]
    for r in ndv_rows:
        ndv[r["col_id"]] += r["ndv"]
    return pa.table(
        {
            "column_name": pa.array(cols, pa.string()),
            "n": pa.array(n, pa.int64()),
            "n_null": pa.array(nnull, pa.int64()),
            "min_v": pa.array(mn, pa.int64()),
            "max_v": pa.array(mx, pa.int64()),
            "ndv": pa.array(ndv, pa.int64()),
        }
    ).sort_by("column_name")


def grouped_quantiles(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    qs: list[float],
    num_buckets: int = DEFAULT_BUCKETS,
    cont: bool = False,
) -> rd.Dataset:
    """EXACT per-group quantiles of an int64 value column, grouped by
    a string or int key: per-batch (key, value) histogram pre-combine,
    one bucketed shuffle on the key, then a per-bucket
    cumulative-count kernel that picks each key's rank row(s) with one
    global searchsorted (the cumsum is strictly increasing across
    segments).  Rows never move — only (key, value, count) histogram
    entries.

    ``cont=False`` (default): DuckDB ``quantile_disc`` semantics (the
    sorted value at rank ``ceil(q·n)−1``); output
    (key, q:double, value:int64).  ``cont=True``: ``quantile_cont``
    semantics (position ``q·(n−1)``, linear interpolation between the
    bracketing values); output (key, q:double, value:double) — with
    DYADIC ``q`` (k/2^m) the position, fraction and lerp are all
    exactly representable doubles per key, so the result hash-matches
    a SQL twin bit-for-bit (same argument as
    :func:`exact_quantiles_cont`)."""

    def _kcodes(col: pa.ChunkedArray):
        codes, uq = pd.factorize(col.combine_chunks().to_pandas(), sort=True)
        return codes.astype(np.int64), uq

    def _partial(batch: pa.Table) -> pa.Table:
        v = np_col(batch, val_col).astype(np.int64)
        kc, uq = _kcodes(batch.column(key_col))
        order = np.lexsort((v, kc))
        kc, v = kc[order], v[order]
        first = (
            np.r_[True, (kc[1:] != kc[:-1]) | (v[1:] != v[:-1])]
            if len(kc)
            else np.zeros(0, bool)
        )
        starts = np.flatnonzero(first)
        cnt = np.diff(np.r_[starts, len(kc)]).astype(np.int64)
        key_arr = pa.array(np.asarray(uq, object)[kc[starts]].tolist(),
                           batch.schema.field(key_col).type) \
            if not pa.types.is_integer(batch.schema.field(key_col).type) \
            else pa.array(np.asarray(uq)[kc[starts]].astype(np.int64), pa.int64())
        return pa.table(
            {
                key_col: key_arr,
                "value": pa.array(v[starts], pa.int64()),
                "count": pa.array(cnt, pa.int64()),
            }
        )

    val_type = pa.float64() if cont else pa.int64()

    def _quantile_bucket(grp: pa.Table) -> pa.Table:
        key_t = grp.schema.field(key_col).type
        if grp.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], key_t),
                    "q": pa.array([], pa.float64()),
                    "value": pa.array([], val_type),
                }
            )
        kc, uq = _kcodes(grp.column(key_col))
        v = np_col(grp, "value")
        c = np_col(grp, "count")
        order = np.lexsort((v, kc))
        kc, v, c = kc[order], v[order], c[order]
        # merge duplicate (key, value) histogram entries
        first = np.r_[True, (kc[1:] != kc[:-1]) | (v[1:] != v[:-1])]
        starts = np.flatnonzero(first)
        kc, v = kc[starts], v[starts]
        c = np.add.reduceat(c, starts)
        cum = np.cumsum(c)
        seg_first = np.r_[True, kc[1:] != kc[:-1]]
        seg_starts = np.flatnonzero(seg_first)
        base = np.r_[np.int64(0), cum][seg_starts]
        seg_ends = np.r_[seg_starts[1:], len(kc)] - 1
        n_k = cum[seg_ends] - base
        out_k, out_q, out_v = [], [], []
        for q in qs:
            if cont:
                pos_f = q * (n_k - 1).astype(np.float64)
                lo = np.floor(pos_f).astype(np.int64)
                hi = np.minimum(lo + 1, n_k - 1)
                f = pos_f - lo
                vlo = v[np.searchsorted(cum, base + lo + 1)].astype(np.float64)
                vhi = v[np.searchsorted(cum, base + hi + 1)].astype(np.float64)
                out_v.append(vlo + (vhi - vlo) * f)
            else:
                tgt = np.clip(np.ceil(q * n_k).astype(np.int64) - 1, 0, n_k - 1)
                out_v.append(v[np.searchsorted(cum, base + tgt + 1)])
            out_k.append(kc[seg_starts])
            out_q.append(np.full(len(seg_starts), q))
        kcat = np.concatenate(out_k)
        if pa.types.is_integer(key_t):
            key_arr = pa.array(np.asarray(uq)[kcat].astype(np.int64), key_t)
        else:
            key_arr = pa.array(np.asarray(uq, object)[kcat].tolist(), key_t)
        return pa.table(
            {
                key_col: key_arr,
                "q": pa.array(np.concatenate(out_q), pa.float64()),
                "value": pa.array(
                    np.concatenate(out_v).astype(
                        np.float64 if cont else np.int64
                    ),
                    val_type,
                ),
            }
        )

    def _bucket_key(b: pa.Table) -> np.ndarray:
        col = b.column(key_col)
        if pa.types.is_integer(col.type):
            return np_col(b, key_col)
        from .derive import _str_hash

        return _str_hash(col)

    return hash_bucket_agg(
        ds.map_batches(_partial, batch_format="pyarrow"),
        _bucket_key,
        _quantile_bucket,
        num_buckets=num_buckets,
    )


def deterministic_sample(
    ds: rd.Dataset,
    frac: float,
    key_fn: Callable[[pa.Table], np.ndarray],
    seed: int = 42,
    complement: bool = False,
) -> rd.Dataset:
    """Value-deterministic sampling (SURVEY.md §2.4 R7): keep a row iff
    ``hash64(key ^ seed-mix) / 2^64 < frac``.  Unlike
    ``Dataset.random_sample`` the decision is a pure function of the
    row's key, so the sample is identical across runs, block layouts and
    cluster sizes — the property resume-safe pipelines and the degree-
    histogram / hub-threshold estimators need.  ``key_fn(batch) ->
    int64 array`` picks the sampled identity (e.g. vid, doc_id)."""
    assert 0.0 <= frac <= 1.0
    # frac=1.0 would need threshold 2^64 (keep-all), which overflows
    # uint64 — handle it as an explicit keep-all/drop-all mask instead
    keep_all = frac >= 1.0
    threshold = np.uint64(int(frac * float(2**64 - 1))) if not keep_all \
        else np.uint64(0)
    mix = np.int64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1))

    def _keep(batch: pa.Table) -> pa.Table:
        if keep_all:
            return batch if not complement else batch.slice(0, 0)
        k = key_fn(batch).astype(np.int64)
        with np.errstate(over="ignore"):
            h = hash64(k + mix)
        mask = (h >= threshold) if complement else (h < threshold)
        return batch.take(pa.array(np.flatnonzero(mask)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def stratified_sample(
    ds: rd.Dataset,
    group_col: str,
    key_fn: Callable[[pa.Table], np.ndarray],
    target_per_group: int,
    seed: int = 42,
) -> rd.Dataset:
    """Per-group value-deterministic sampling — the training-data
    rebalancing op ("take ~N docs per language"): groups with ≤ target
    rows are kept whole; larger groups keep a row iff
    ``splitmix64(key + seed·golden) < (target·(2⁶⁴−1)) // count_g``.

    Thresholds are exact integer arithmetic (no float rounding), so the
    SQL oracle reproduces the sample bit-for-bit; the keep decision is a
    pure row function, invariant to runs / block layouts / cluster
    sizes.  Pass 1 is a per-block partial count of ``group_col`` merged
    driver-side — the standard small-side assumption (#groups ≪ driver
    memory; languages/domains/buckets, not user ids).  Pass 2 streams.
    """
    assert target_per_group >= 0

    def _partial_counts(batch: pa.Table) -> pa.Table:
        vc = batch.column(group_col).to_pandas().value_counts()
        return pa.table(
            {
                "g": pa.array(vc.index.astype(object)),
                "n": pa.array(vc.to_numpy(np.int64), pa.int64()),
            }
        )

    partials = (
        ds.select_columns([group_col])
        .map_batches(_partial_counts, batch_format="pyarrow")
        .take_all()
    )  # #groups × #blocks rows — driver-small by the group-cardinality assumption
    counts: dict = {}
    for row in partials:
        counts[row["g"]] = counts.get(row["g"], 0) + int(row["n"])
    full = np.uint64(2**64 - 1)
    thr = {
        g: (
            full
            if c <= target_per_group
            else np.uint64((target_per_group * (2**64 - 1)) // c)
        )
        for g, c in counts.items()
    }
    mix = np.int64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1))

    def _keep(batch: pa.Table) -> pa.Table:
        k = key_fn(batch).astype(np.int64)
        with np.errstate(over="ignore"):
            h = hash64(k + mix)
        g = batch.column(group_col).to_pandas()
        t_row = g.map(thr).to_numpy(np.uint64)
        keep = (h < t_row) | (t_row == full)  # full groups keep h == max too
        return batch.take(pa.array(np.flatnonzero(keep)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def quota_mix_sample(
    ds: rd.Dataset,
    group_col: str,
    key_fn: Callable[[pa.Table], np.ndarray],
    quotas: dict,
    seed: int = 42,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """EXACT-quota dataset mixing — the corpus-composition step of a
    training-data pipeline ("120k en docs, 40k es docs, drop the
    rest"): per group ``g`` keep exactly ``min(quotas[g], count_g)``
    rows, groups absent from ``quotas`` are dropped.  Where
    :func:`stratified_sample` is Bernoulli (hits the target only in
    expectation), the mix contract is a hard budget, so selection is
    rank-based: each row's priority is ``splitmix64(key + seed·golden)``
    and a group keeps its ``quota`` lowest-priority rows (ties at the
    boundary broken by ``key`` ascending — a total order, so the kept
    SET is a pure function of the data: invariant to runs, block
    layouts and cluster sizes, and reproducible in SQL as
    ``row_number() OVER (PARTITION BY g ORDER BY z, key) <= quota``).

    Cost shape: rows with a zero/absent quota are dropped BEFORE the
    exchange (the usual mix config keeps a sliver of a huge corpus,
    so the shuffle moves only candidate groups), then ONE bucketed
    exchange on the group key lands each group whole for the
    vectorized rank-and-cut; per-group state is the quota dict —
    #groups ≪ driver memory (sources/languages, not user ids).  Output
    carries no temp columns."""
    qmap = {g: int(q) for g, q in quotas.items() if int(q) > 0}
    mix = np.int64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1))

    def _stamp(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_pandas()
        cand = g.isin(qmap).to_numpy(bool)
        batch = batch.take(pa.array(np.flatnonzero(cand)))
        k = key_fn(batch).astype(np.int64)
        with np.errstate(over="ignore"):
            h = hash64(k + mix)
        return batch.append_column(
            "__prio__", pa.array(h, pa.uint64())
        ).append_column("__key__", pa.array(k, pa.int64()))

    def _cut(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        df = df.sort_values(
            [group_col, "__prio__", "__key__"], kind="stable"
        )
        q = df[group_col].map(qmap).to_numpy(np.int64)
        rank = df.groupby(group_col, sort=False).cumcount().to_numpy(np.int64)
        out = df.loc[rank < q].drop(columns=["__prio__", "__key__"])
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata()

    def _group_key(b: pa.Table) -> np.ndarray:
        return pd.util.hash_pandas_object(
            b.column(group_col).to_pandas(), index=False
        ).to_numpy(np.uint64).view(np.int64)

    stamped = ds.map_batches(_stamp, batch_format="pyarrow")
    return hash_bucket_agg(stamped, _group_key, _cut, num_buckets)


def range_partition(
    ds: rd.Dataset,
    col: str,
    n_parts: int,
    key_fn: Callable[[pa.Table], np.ndarray],
    sample_frac: float = 0.1,
    seed: int = 42,
) -> tuple[rd.Dataset, np.ndarray]:
    """Deterministic equi-depth range partitioner — the layout step
    under a distributed sort or range-partitioned write: boundaries
    are the EXACT quantiles of a SplitMix64 value-deterministic sample
    (both steps pure functions of the data, so the same boundaries at
    any cluster size / block layout, and a SQL twin reproduces them
    bit-for-bit), and rows route by ``searchsorted(bounds, v,
    'right')``.  Returns ``(ds + part_id column, bounds)``.  Cost
    shape: the sample feeds the distributed value histogram (driver
    sees one row per distinct sampled value, never the data) and the
    routing is a stateless ``map_batches`` — no shuffle beyond what
    the caller then does with ``part_id``.  ``col`` must be int64."""
    assert n_parts >= 1
    qs = [i / n_parts for i in range(1, n_parts)]
    sample = deterministic_sample(ds, sample_frac, key_fn, seed=seed)
    bounds = np.asarray(exact_quantiles(sample, col, qs), np.int64)

    def _route(batch: pa.Table) -> pa.Table:
        v = np_col(batch, col)
        p = np.searchsorted(bounds, v, side="right").astype(np.int64)
        return batch.append_column("part_id", pa.array(p, pa.int64()))

    return ds.map_batches(_route, batch_format="pyarrow"), bounds


def global_rank(
    ds: rd.Dataset,
    col: str,
    tie_cols: list[str],
    key_fn: Callable[[pa.Table], np.ndarray],
    *,
    n_parts: int = 32,
    sample_frac: float = 0.1,
    seed: int = 42,
    rank_col: str = "rank",
) -> rd.Dataset:
    """Distributed global ORDER BY with exact 1-based row numbers
    (SURVEY.md §2.4 R6+ — the total-sort primitive under ranked
    exports and percentile reports).  Plan: :func:`range_partition`
    on ``col`` (routing is a pure function of the value, so equal
    values co-locate and partitions are disjoint ordered ranges —
    boundary quality affects only balance, NEVER the result), one
    tiny per-partition count pass whose prefix sums give each
    partition's global offset (the driver sees n_parts × blocks
    count rows, never data), then each partition sorts locally by
    ``(col, *tie_cols)`` and adds its offset.  ``(col, *tie_cols)``
    must be unique per row for a deterministic total order; ``col``
    must be int64 (the range_partition contract)."""
    routed, _bounds = range_partition(
        ds, col, n_parts, key_fn, sample_frac=sample_frac, seed=seed
    )
    routed = routed.materialize()  # count pass + rank pass share blocks

    def _counts(t: pa.Table) -> pa.Table:
        u, c = np.unique(np_col(t, "part_id"), return_counts=True)
        return pa.table({"p": pa.array(u, pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    sizes = np.zeros(n_parts, np.int64)
    for r in routed.map_batches(_counts, batch_format="pyarrow").take_all():
        sizes[r["p"]] += r["n"]
    offsets = np.r_[0, np.cumsum(sizes)[:-1]]  # tiny, ships in the closure

    order_cols = [col] + list(tie_cols)

    def _rank(grp: pa.Table) -> pa.Table:
        p = int(grp.column("part_id")[0].as_py())
        df = grp.drop_columns(["part_id"]).to_pandas()
        df = df.sort_values(order_cols, kind="stable")
        df[rank_col] = np.arange(
            offsets[p] + 1, offsets[p] + 1 + len(df), dtype=np.int64
        )
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata()

    return routed.groupby("part_id").map_groups(_rank, batch_format="pyarrow")


def global_cumsum(
    ds: rd.Dataset,
    col: str,
    tie_cols: list[str],
    val_col: str,
    key_fn: Callable[[pa.Table], np.ndarray],
    *,
    n_parts: int = 32,
    sample_frac: float = 0.1,
    seed: int = 42,
    out_col: str = "prefix",
) -> rd.Dataset:
    """Distributed ordered EXCLUSIVE prefix sum: for every row, the
    exact int64 sum of ``val_col`` over all rows strictly BEFORE it in
    the ``(col, *tie_cols)`` total order — the allocation primitive
    under sequence packing, byte-offset assignment and ordered
    quota/budget splits.  Same two-pass plan as :func:`global_rank`:
    range-partition on ``col`` (routing is value-pure, so partitions
    are disjoint ordered ranges), a per-partition SUM pass whose
    prefix sums give each partition's global base (driver sees
    n_parts scalars, never rows), then each partition sorts locally
    and cumsums from its base.  ``(col, *tie_cols)`` must be unique
    per row; ``col`` int64; caller guarantees the grand total fits
    int64."""
    routed, _bounds = range_partition(
        ds, col, n_parts, key_fn, sample_frac=sample_frac, seed=seed
    )
    routed = routed.materialize()

    def _sums(t: pa.Table) -> pa.Table:
        p = np_col(t, "part_id")
        v = np_col(t, val_col).astype(np.int64)
        u, s, _ = segment_sum_sorted(*_sorted_kv(p, v))
        return pa.table({"p": pa.array(u, pa.int64()),
                         "s": pa.array(s, pa.int64())})

    totals = np.zeros(n_parts, np.int64)
    for r in routed.map_batches(_sums, batch_format="pyarrow").take_all():
        totals[r["p"]] += r["s"]
    bases = np.r_[0, np.cumsum(totals)[:-1]]

    order_cols = [col] + list(tie_cols)

    def _cum(grp: pa.Table) -> pa.Table:
        p = int(grp.column("part_id")[0].as_py())
        df = grp.drop_columns(["part_id"]).to_pandas()
        df = df.sort_values(order_cols, kind="stable")
        v = df[val_col].to_numpy(np.int64)
        df[out_col] = bases[p] + np.cumsum(v) - v  # exclusive
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata()

    return routed.groupby("part_id").map_groups(_cum, batch_format="pyarrow")


PREFIX_MAX_NEG_INF = -(1 << 62)


def global_prefix_max(
    ds: rd.Dataset,
    col: str,
    tie_cols: list[str],
    val_col: str,
    key_fn: Callable[[pa.Table], np.ndarray],
    *,
    n_parts: int = 32,
    sample_frac: float = 0.1,
    seed: int = 42,
    out_col: str = "prev_max",
) -> rd.Dataset:
    """Distributed ordered EXCLUSIVE prefix MAX: for every row, the
    exact int64 max of ``val_col`` over all rows strictly BEFORE it in
    the ``(col, *tie_cols)`` total order (``PREFIX_MAX_NEG_INF`` for
    the global first row) — the WATERMARK primitive: with ``col`` =
    arrival order and ``val_col`` = event time, ``prev_max - delay``
    is exactly the streaming watermark every late-data policy tests
    against.  Same two-pass plan as :func:`global_cumsum`:
    range-partition on ``col`` (routing is value-pure, so partitions
    are disjoint ordered ranges), a per-partition MAX pass whose
    running max gives each partition's incoming carry (driver sees
    n_parts scalars, never rows), then each partition sorts locally
    and scans ``np.maximum.accumulate`` from its carry.  ``(col,
    *tie_cols)`` must be unique per row; ``col`` int64."""
    routed, _bounds = range_partition(
        ds, col, n_parts, key_fn, sample_frac=sample_frac, seed=seed
    )
    routed = routed.materialize()

    def _maxes(t: pa.Table) -> pa.Table:
        p = np_col(t, "part_id")
        v = np_col(t, val_col).astype(np.int64)
        if not len(p):
            return pa.table({"p": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64())})
        k, vv = _sorted_kv(p, v)
        first = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(first)
        mx = np.maximum.reduceat(vv, starts)
        return pa.table({"p": pa.array(k[starts], pa.int64()),
                         "m": pa.array(mx, pa.int64())})

    maxes = np.full(n_parts, PREFIX_MAX_NEG_INF, np.int64)
    for r in routed.map_batches(_maxes, batch_format="pyarrow").take_all():
        maxes[r["p"]] = max(maxes[r["p"]], r["m"])
    carries = np.r_[PREFIX_MAX_NEG_INF,
                    np.maximum.accumulate(maxes)[:-1]]

    order_cols = [col] + list(tie_cols)

    def _scan(grp: pa.Table) -> pa.Table:
        p = int(grp.column("part_id")[0].as_py())
        df = grp.drop_columns(["part_id"]).to_pandas()
        df = df.sort_values(order_cols, kind="stable")
        v = df[val_col].to_numpy(np.int64)
        run = np.maximum.accumulate(np.r_[np.int64(carries[p]), v])[:-1]
        df[out_col] = run  # exclusive: row i sees carry ∨ max(v[:i])
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata()

    return routed.groupby("part_id").map_groups(_scan, batch_format="pyarrow")


def _sorted_kv(k: np.ndarray, v: np.ndarray):
    order = np.argsort(k, kind="stable")
    return k[order], v[order]


def segment_sum_sorted(k: np.ndarray, v: np.ndarray):
    """(uniq, sums, counts) over a key-sorted pair of arrays."""
    if not len(k):
        return k, v, np.zeros(0, np.int64)
    first = np.r_[True, k[1:] != k[:-1]]
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(v, starts)
    counts = np.diff(np.r_[starts, len(k)])
    return k[starts], sums, counts


def _join_key_fn(on: list[str]) -> Callable[[pa.Table], np.ndarray]:
    """Combined deterministic int64 hash over the key columns (string
    columns via pandas siphash — process-stable; numeric via hash64)."""

    def _key(batch: pa.Table) -> np.ndarray:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in on:
            col = batch.column(c)
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                arr = np.asarray(col.to_pylist(), dtype=object)
                k = (
                    pd.util.hash_array(arr, categorize=False).view(np.int64)
                    if len(arr)
                    else np.zeros(0, np.int64)
                )
            else:
                k = np_col(batch, c).astype(np.int64)
            with np.errstate(over="ignore"):
                h = h * np.uint64(0x100000001B3) + hash64(k)
        return h.astype(np.int64)

    return _key


def _pd_merge(ldf: pd.DataFrame, rdf: pd.DataFrame, on: list[str], how: str) -> pd.DataFrame:
    if how in ("inner", "left", "outer"):
        return ldf.merge(rdf, on=on, how=how)
    if how == "semi":
        return ldf.merge(rdf[on].drop_duplicates(), on=on, how="inner")
    if how == "anti":
        m = ldf.merge(rdf[on].drop_duplicates(), on=on, how="left", indicator=True)
        return m.loc[m["_merge"] == "left_only"].drop(columns=["_merge"])
    raise ValueError(f"unsupported join how={how!r}")


def join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | list[str],
    how: str = "inner",
    *,
    broadcast: bool | None = None,
    broadcast_limit: int = 1_000_000,
    broadcast_byte_limit: int = 128 * 2**20,
    num_buckets: int = DEFAULT_BUCKETS,
    rsuffix: str = "_r",
) -> rd.Dataset:
    """General distributed equi-join (SURVEY.md §2.4 R3) with the two
    scale shapes a 100-TB pipeline needs, chosen per call:

    - **broadcast hash join** (small right side): the right table is
      materialized once, ``ray.put`` into the object store, and every
      left batch merges against it inside ``map_batches`` — one pass
      over the big side, ZERO shuffles.
    - **partitioned hash join** (both sides big): both sides are
      stamped with ``bucket = hash(key) % B`` and co-shuffled in a
      single ``groupby("__bucket__")`` exchange; each bucket merges its
      two complete sides with a vectorized pandas merge.  Same key →
      same bucket, so per-bucket joins are globally correct.

    ``how``: ``inner`` / ``left`` / ``outer`` / ``semi`` / ``anti``
    (semi/anti project the right side to its key columns before any
    movement; ``outer`` always takes the partitioned path — see below).
    ``broadcast=None`` auto-picks: broadcast iff ``right.count() <=
    broadcast_limit`` AND the right side's materialized block bytes are
    ≤ ``broadcast_byte_limit`` — a 1M-row table of wide strings must
    take the partitioned path even though its row count is small (every
    broadcast worker holds a full pandas copy).  Join keys must be
    non-null.  Right value columns colliding with left names get
    ``rsuffix``.  Ray 2.49's ``Dataset.join`` is deliberately not used
    (see cc.py — sort-based, no broadcast path, unstable block counts).
    """
    import ray

    on = [on] if isinstance(on, str) else list(on)
    if how in ("semi", "anti"):
        right = right.select_columns(on)

    def _arrow_schema(ds: rd.Dataset) -> tuple[rd.Dataset, pa.Schema]:
        s = getattr(ds.schema(), "base_schema", None)
        if isinstance(s, pa.Schema):
            return ds, s
        # pandas/simple-block dataset: coerce blocks to Arrow once
        ds = ds.map_batches(lambda b: b, batch_format="pyarrow")
        return ds, ds.schema().base_schema

    left, lschema = _arrow_schema(left)
    right, rschema = _arrow_schema(right)
    lcols = list(lschema.names)
    rename = {
        c: c + rsuffix for c in rschema.names if c not in on and c in lcols
    }
    if rename:
        right = right.rename_columns(rename)
        rschema = pa.schema(
            [
                pa.field(rename.get(n, n), rschema.field(n).type)
                for n in rschema.names
            ]
        )
    rcols = list(rschema.names)
    rval_cols = [c for c in rcols if c not in on]

    if how == "outer":
        # a per-batch broadcast outer merge would emit every unmatched
        # right row once PER LEFT BATCH — outer is only correct on the
        # co-shuffled path where each bucket sees both complete sides
        broadcast = False
    if broadcast is None:
        # materialize once so the strategy probe (count + size_bytes)
        # and the join itself reuse the same blocks instead of executing
        # the right pipeline twice
        right = right.materialize()
        broadcast = (
            right.count() <= broadcast_limit
            and right.size_bytes() <= broadcast_byte_limit
        )

    join._last_strategy = "broadcast" if broadcast else "partitioned"
    if broadcast:
        rtab = pa.concat_tables(
            ray.get(right.to_arrow_refs()), promote_options="default"
        )
        rdf_ref = ray.put(rtab.to_pandas())

        def _bc_merge(batch: pa.Table) -> pa.Table:
            rdf = ray.get(rdf_ref)
            out = _pd_merge(batch.to_pandas(), rdf, on, how)
            return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata()

        return left.map_batches(_bc_merge, batch_format="pyarrow")

    # --- partitioned hash join: pad both sides to a union schema, tag,
    # co-shuffle on the bucket, merge per bucket.
    key_fn = _join_key_fn(on)
    union_fields = (
        [lschema.field(c) for c in lcols]
        + [rschema.field(c) for c in rval_cols]
        + [pa.field("__side__", pa.int8()), pa.field("__bucket__", pa.int32())]
    )
    union_schema = pa.schema(union_fields)

    def _tag(side: int):
        def _fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            bucket = (hash64(key_fn(batch)) % np.uint64(num_buckets)).astype(np.int32)
            cols = []
            for f in union_fields:
                if f.name == "__side__":
                    cols.append(pa.array(np.full(n, side, np.int8), pa.int8()))
                elif f.name == "__bucket__":
                    cols.append(pa.array(bucket, pa.int32()))
                elif f.name in batch.column_names:
                    cols.append(batch.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(cols, schema=union_schema)

        return _fn

    tagged = left.map_batches(_tag(0), batch_format="pyarrow").union(
        right.map_batches(_tag(1), batch_format="pyarrow")
    )

    planned_types = {c: lschema.field(c).type for c in lcols}
    for v in rval_cols:
        planned_types[v] = rschema.field(v).type

    def _join_bucket(grp: pa.Table) -> pa.Table:
        side = np_col(grp, "__side__")
        lt = grp.filter(pa.array(side == 0)).select(lcols)
        rt = grp.filter(pa.array(side == 1)).select(on + rval_cols)
        out = _pd_merge(lt.to_pandas(), rt.to_pandas(), on, how)
        t = pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata()
        if t.num_rows == 0:
            # an empty bucket's pandas round-trip yields NULL-typed
            # columns, which would poison downstream schema probes
            # (e.g. a second join's union schema) — pin planned types
            t = pa.table({c: pa.array([], planned_types[c])
                          for c in t.column_names})
        return t

    return tagged.groupby("__bucket__").map_groups(_join_bucket, batch_format="pyarrow")


def set_op(
    left: rd.Dataset,
    right: rd.Dataset,
    mode: str,
    *,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """SQL ``INTERSECT`` / ``EXCEPT`` (both DISTINCT semantics,
    SURVEY.md §2.4 — completes the set-operation family next to R8
    union).  One co-shuffle keyed on the FULL-ROW hash: a given row
    value always lands in one bucket (the key is a pure function of
    the values), so each bucket holds every occurrence of its rows
    from both sides and decides membership locally — per-worker memory
    is the bucket's DISTINCT rows, never a side's full table.  Hash
    collisions only co-locate rows (the in-bucket merge compares
    actual values), they never change the result.  Schemas must match
    by column name; right is projected to left's column order."""
    if mode not in ("intersect", "except"):
        raise ValueError(f"unsupported set_op mode={mode!r}")

    cols = list(left.schema().names)
    right = right.select_columns(cols)
    key_fn = _join_key_fn(cols)

    def _tag(side: int):
        def _fn(batch: pa.Table) -> pa.Table:
            bucket = (
                hash64(key_fn(batch)) % np.uint64(num_buckets)
            ).astype(np.int32)
            return batch.append_column(
                "__side__", pa.array(np.full(batch.num_rows, side, np.int8))
            ).append_column("__bucket__", pa.array(bucket, pa.int32()))

        return _fn

    tagged = left.map_batches(_tag(0), batch_format="pyarrow").union(
        right.map_batches(_tag(1), batch_format="pyarrow")
    )
    def _bucket(grp: pa.Table) -> pa.Table:
        # schema from the co-shuffled group itself (left.schema() may be
        # a PandasBlockSchema for from_pandas inputs — no Arrow fields)
        out_schema = grp.select(cols).schema
        side = np_col(grp, "__side__")
        lt = grp.filter(pa.array(side == 0)).select(cols)
        ldf = lt.to_pandas().drop_duplicates()
        rdf = grp.filter(pa.array(side == 1)).select(cols).to_pandas()
        how = "semi" if mode == "intersect" else "anti"
        out = _pd_merge(ldf, rdf, cols, how)
        return pa.Table.from_pandas(
            out, preserve_index=False, schema=out_schema
        ).replace_schema_metadata()

    return tagged.groupby("__bucket__").map_groups(
        _bucket, batch_format="pyarrow"
    )


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    left_carry: list[str],
    right_vals: list[str],
    out_names: dict[str, str] | None = None,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Backward as-of join — a custom operator the Dataset API lacks
    (SURVEY.md §2.4): for every left row, attach the right row with the
    same key and the greatest ``(ts, *right_vals)`` such that
    ``right.ts <= left.ts`` (NULL vals when no such row).  The
    lexicographic tie-break over the value columns makes the pick
    deterministic when several right rows share the boundary timestamp.

    Shape: ONE co-shuffle — both sides stamped with
    ``bucket = hash64(key) % B`` and exchanged in a single
    ``groupby("__bucket__")``; each bucket resolves its complete key
    set with a vectorized two-level searchsorted (sort right by
    (key, ts, vals) once, rank-compose (key_rank, ts_rank) into one
    monotone int64, probe with side="right" − 1).  No driver
    materialization; per-bucket memory is the bucket, not the table.

    Keys and value/tie-break columns must be integer; timestamp
    columns may be Arrow timestamps (cast to epoch µs internally).
    """
    import ray.data as rd  # noqa: F811 (runtime import mirror)

    out_names = out_names or {}

    def _ts_np(batch: pa.Table, col: str) -> np.ndarray:
        c = batch.column(col).combine_chunks()
        if pa.types.is_timestamp(c.type):
            c = c.cast(pa.timestamp("us"))
        return c.cast(pa.int64()).to_numpy(zero_copy_only=False)

    carry_fields = [
        pa.field(c, pa.int64()) for c in left_carry
    ]  # int64 carries keep the union schema simple and null-paddable
    val_fields = [pa.field(v, pa.int64()) for v in right_vals]
    union_schema = pa.schema(
        [
            pa.field("__k__", pa.int64()),
            pa.field("__t__", pa.int64()),
            pa.field("__side__", pa.int8()),
        ]
        + carry_fields
        + val_fields
        + [pa.field("__bucket__", pa.int32())]
    )

    def _tag(side: int, key: str, ts: str, cols: list[str]):
        def _fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            k = np_col(batch, key).astype(np.int64)
            arrs = [
                pa.array(k, pa.int64()),
                pa.array(_ts_np(batch, ts), pa.int64()),
                pa.array(np.full(n, side, np.int8), pa.int8()),
            ]
            for f in carry_fields + val_fields:
                if f.name in cols:
                    arrs.append(batch.column(f.name).cast(pa.int64()))
                else:
                    arrs.append(pa.nulls(n, pa.int64()))
            arrs.append(
                pa.array(
                    (hash64(k) % np.uint64(num_buckets)).astype(np.int32),
                    pa.int32(),
                )
            )
            return pa.Table.from_arrays(arrs, schema=union_schema)

        return _fn

    tagged = left.map_batches(
        _tag(0, left_key, left_ts, left_carry), batch_format="pyarrow"
    ).union(
        right.map_batches(
            _tag(1, right_key, right_ts, right_vals), batch_format="pyarrow"
        )
    )

    def _resolve(grp: pa.Table) -> pa.Table:
        side = np_col(grp, "__side__")
        lt = grp.filter(pa.array(side == 0))
        rt = grp.filter(pa.array(side == 1))
        out_fields = [(out_names.get(c, c), c) for c in left_carry]
        val_out = [(out_names.get(v, v), v) for v in right_vals]
        if lt.num_rows == 0:
            return pa.table(
                {o: pa.array([], pa.int64()) for o, _ in out_fields + val_out}
            )
        lk = np_col(lt, "__k__")
        ltv = np_col(lt, "__t__")
        cols = {o: lt.column(c) for o, c in out_fields}
        if rt.num_rows == 0:
            for o, _ in val_out:
                cols[o] = pa.nulls(lt.num_rows, pa.int64())
            return pa.table(cols)
        rk = np_col(rt, "__k__")
        rtv = np_col(rt, "__t__")
        rvals = [np_col(rt, v) for v in right_vals]
        order = np.lexsort(tuple(reversed(rvals)) + (rtv, rk))
        rk, rtv = rk[order], rtv[order]
        rvals = [v[order] for v in rvals]
        # rank-compose (key, ts) into one monotone int64 per side
        uk, ustart = np.unique(rk, return_index=True)
        kr_r = np.searchsorted(uk, rk)
        ts_vals = np.unique(np.concatenate([rtv, ltv]))
        u = np.int64(len(ts_vals) + 1)
        comp_r = kr_r * u + np.searchsorted(ts_vals, rtv)
        kr_l = np.searchsorted(uk, np.clip(lk, uk[0], uk[-1])) if len(uk) else np.zeros(len(lk), np.int64)
        key_hit = (uk[np.minimum(kr_l, len(uk) - 1)] == lk) if len(uk) else np.zeros(len(lk), bool)
        comp_l = kr_l * u + np.searchsorted(ts_vals, ltv)
        idx = np.searchsorted(comp_r, comp_l, side="right") - 1
        ok = key_hit & (idx >= 0)
        safe = np.maximum(idx, 0)
        ok &= comp_r[safe] // u == kr_l  # matched row is in the left key's segment
        for (o, _), rv in zip(val_out, rvals):
            vals = rv[safe]
            cols[o] = pa.array(vals, pa.int64(), mask=~ok)
        return pa.table(cols)

    return tagged.groupby("__bucket__").map_groups(
        _resolve, batch_format="pyarrow"
    )


def _bloom_positions(h: np.ndarray, k: int, n_bits: int) -> np.ndarray:
    """(n, k) probe positions via double hashing g_i = h1 + i*h2
    (Kirsch–Mitzenmacher): two splitmix64 passes give k independent-ish
    probes without k hash evaluations."""
    h1 = h.astype(np.uint64)
    h2 = hash64(h1.view(np.int64)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        g = h1[:, None] + i[None, :] * h2[:, None]
    return (g % np.uint64(n_bits)).astype(np.int64)


@ray.remote
def _bloom_block(on: list[str], k: int, n_bits: int, *tables) -> np.ndarray:
    """Fold blocks of the build side into one packed-uint64 bitmap."""
    key_fn = _join_key_fn(on)
    words = np.zeros((n_bits + 63) // 64, np.uint64)
    for t in tables:
        if t.num_rows == 0:
            continue
        pos = _bloom_positions(key_fn(t).astype(np.uint64), k, n_bits).ravel()
        np.bitwise_or.at(
            words, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
        )
    return words


@ray.remote
def _bloom_or(*maps: np.ndarray) -> np.ndarray:
    out = maps[0].copy()
    for m in maps[1:]:
        np.bitwise_or(out, m, out=out)
    return out


def bloom_bits(ds: rd.Dataset, on: str | list[str], k: int = 8,
               n_bits: int = 4096) -> pa.Table:
    """The Bloom filter ITSELF as a sorted table of set bit positions —
    the third mergeable sketch artifact next to hll_registers /
    cm_sketch: OR-mergeable across pipelines, a pure function of the
    key SET (dedup/layout/cluster-size invariant), and — because the
    probes are Kirsch–Mitzenmacher double hashing over two splitmix64
    passes — exactly reproducible in SQL.  Build is the same
    tree-folded per-block bitmap bloom_join broadcasts; only
    n_bits/8 bytes ever reach the driver.  (Bit extraction assumes a
    little-endian host, same as the packed-word layout itself.)"""
    on = [on] if isinstance(on, str) else list(on)
    blocks = ds.to_arrow_refs()
    refs = [
        _bloom_block.remote(on, k, n_bits, *blocks[i : i + 4])
        for i in range(0, max(len(blocks), 1), 4)
    ] or [_bloom_block.remote(on, k, n_bits)]
    while len(refs) > 1:
        refs = [_bloom_or.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    words = ray.get(refs[0])
    bits = np.unpackbits(words.view(np.uint8), bitorder="little")
    pos = np.flatnonzero(bits[:n_bits])
    return pa.table({"pos": pa.array(pos.astype(np.int64), pa.int64())})


def bloom_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | list[str],
    how: str = "inner",
    *,
    bits_per_key: int = 16,
    num_buckets: int = DEFAULT_BUCKETS,
    rsuffix: str = "_r",
) -> rd.Dataset:
    """Bloom-pre-filtered distributed join — the shuffle-reduction
    pattern a selective 100-TB join needs: a Bloom filter over the
    build (right) side's keys is tree-built from its blocks as Ray
    tasks, broadcast ONCE through the object store, and the probe
    (left) side is filtered inside ``map_batches`` BEFORE the join's
    co-shuffle, so non-matching left rows (often the overwhelming
    majority) never enter the exchange.  The filter is m = 16·n bits
    regardless of right-row width (~0.05 % false-positive rate at
    k = 8), so "broadcast" here stays cheap even when the right table
    itself is too wide to broadcast.

    False positives only — surviving non-matches are dropped by the
    exact partitioned join that follows, so the result is IDENTICAL to
    ``join(left, right, on, how)``.  Restricted to ``inner``/``semi``:
    for left/outer/anti the bloom-dropped left rows would still have
    to be emitted, so pre-filtering the left side would be wrong.
    """
    assert how in ("inner", "semi"), "bloom pre-filter only sound for inner/semi"
    on = [on] if isinstance(on, str) else list(on)
    right = right.materialize()
    n = max(right.count(), 1)
    n_bits = 1 << max(10, int(np.ceil(np.log2(n * bits_per_key))))
    k = 8
    blocks = right.to_arrow_refs()
    refs = [
        _bloom_block.remote(on, k, n_bits, *blocks[i : i + 4])
        for i in range(0, max(len(blocks), 1), 4)
    ] or [_bloom_block.remote(on, k, n_bits)]
    while len(refs) > 1:
        refs = [_bloom_or.remote(*refs[i : i + 8]) for i in range(0, len(refs), 8)]
    words_ref = refs[0]  # stays in the object store; workers read zero-copy
    key_fn = _join_key_fn(on)

    def _prefilter(batch: pa.Table) -> pa.Table:
        words = ray.get(words_ref)
        if batch.num_rows == 0:
            return batch
        pos = _bloom_positions(key_fn(batch).astype(np.uint64), k, n_bits)
        hit = (
            (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
        ).astype(bool)
        return batch.filter(pa.array(hit.all(axis=1)))

    survivors = left.map_batches(_prefilter, batch_format="pyarrow")
    return join(
        survivors, right, on, how,
        broadcast=False, num_buckets=num_buckets, rsuffix=rsuffix,
    )


def skew_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | list[str],
    how: str = "inner",
    *,
    hot_threshold: int = 100_000,
    num_buckets: int = DEFAULT_BUCKETS,
    rsuffix: str = "_r",
) -> rd.Dataset:
    """Skew-aware equi-join: hot keys (left frequency > ``hot_threshold``)
    are joined via BROADCAST of just the right rows carrying those keys,
    everything else takes the normal partitioned hash join; the union of
    the two is exactly ``join(left, right, on, how)``.

    Why: a partitioned hash join sends every row of a key to ONE bucket
    — a power-law hot key (the 100-TB norm: a hub repo, a bot user)
    makes that bucket's task the straggler that serializes the stage.
    Routing only the hot keys' right rows around the shuffle keeps every
    bucket near-uniform while the broadcast side stays tiny (hot keys
    are few by definition; an assert guards the contract).

    The hot-key census is itself distributed: per-block key counts
    pre-combine inside ``map_batches``, then one (distinct-keys-sized)
    bucketed combine — rows never move to be counted.  Deterministic:
    the hot set is a pure function of the input, not a sample.
    Restricted to ``inner``/``semi`` (hot/cold split partitions the
    LEFT rows, which is only result-preserving when unmatched-left and
    right-side rows aren't emitted on their own).
    """
    assert how in ("inner", "semi")
    on = [on] if isinstance(on, str) else list(on)
    key_fn = _join_key_fn(on)

    def _partial_counts(batch: pa.Table) -> pa.Table:
        kk = key_fn(batch)
        uk, cnt = np.unique(kk, return_counts=True)
        return pa.table({"__k__": pa.array(uk, pa.int64()),
                         "__n__": pa.array(cnt.astype(np.int64), pa.int64())})

    def _combine(grp: pa.Table) -> pa.Table:
        kk = np_col(grp, "__k__")
        nn = np_col(grp, "__n__")
        order = np.argsort(kk, kind="stable")
        kk, nn = kk[order], nn[order]
        starts = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        tot = np.add.reduceat(nn, starts)
        hot = tot > hot_threshold
        return pa.table({"__k__": pa.array(kk[starts][hot], pa.int64())})

    left = left.materialize()
    hot_tab = pa.concat_tables(
        ray.get(
            hash_bucket_agg(
                left.map_batches(_partial_counts, batch_format="pyarrow"),
                lambda b: np_col(b, "__k__"), _combine, num_buckets,
            ).to_arrow_refs()
        ),
        promote_options="default",
    )
    hot_keys = np.sort(np_col(hot_tab, "__k__"))
    assert len(hot_keys) <= 100_000, "hot-key set must stay broadcast-small"
    if not len(hot_keys):
        return join(left, right, on, how, broadcast=False,
                    num_buckets=num_buckets, rsuffix=rsuffix)
    hot_ref = ray.put(hot_keys)

    def _split(want_hot: bool):
        def _fn(batch: pa.Table) -> pa.Table:
            hk = ray.get(hot_ref)
            m = np.isin(key_fn(batch), hk)
            return batch.filter(pa.array(m if want_hot else ~m))
        return _fn

    right = right.materialize()
    left_hot = left.map_batches(_split(True), batch_format="pyarrow")
    left_cold = left.map_batches(_split(False), batch_format="pyarrow")
    right_hot = right.map_batches(_split(True), batch_format="pyarrow")
    right_cold = right.map_batches(_split(False), batch_format="pyarrow")
    hot_join = join(left_hot, right_hot, on, how, broadcast=True,
                    rsuffix=rsuffix)
    cold_join = join(left_cold, right_cold, on, how, broadcast=False,
                     num_buckets=num_buckets, rsuffix=rsuffix)
    return hot_join.union(cold_join)


def grouped_rank(
    ds: rd.Dataset,
    key: str,
    val: str,
    id_col: str,
    key_fn: Callable[[pa.Table], np.ndarray],
    descending: bool = False,
    num_buckets: int = DEFAULT_BUCKETS,
    n_tiles: int | None = None,
    dense: bool = False,
) -> rd.Dataset:
    """Per-key ranking window — SQL ``row_number()`` + ``percent_rank()``
    OVER (PARTITION BY key ORDER BY val [DESC], id ASC) in one bucketed
    shuffle (SURVEY.md §2.4 R6 family).  The id tie-break makes the
    order total, so row_number == rank and percent_rank is exactly
    ``(rnk−1)/(n−1)`` (0.0 for single-row keys) — the same two integers
    divided on both sides, hence bit-identical doubles with no rounding
    convention needed.  Output: (id, key, rnk, pct).

    ``dense=True`` adds a ``drnk`` column with SQL ``dense_rank() OVER
    (PARTITION BY key ORDER BY val [DESC])`` semantics — ties on val
    share a rank and ranks have no gaps; unlike rnk it ignores the id
    tie-break (a dense rank over a total order would just equal
    row_number).  One extra vectorized cumsum in the same shuffle.

    ``n_tiles`` adds a ``tile`` column with SQL ``NTILE(n)`` semantics:
    the first ``cnt mod n`` tiles hold ``ceil(cnt/n)`` rows, the rest
    ``floor(cnt/n)`` (NOT ``floor(p·n/cnt)``, which spreads the
    remainder instead of front-loading it — they diverge e.g. at
    cnt=8, n=5).  Integer-exact, so it hashes against the SQL twin."""

    def _ntile(pos: np.ndarray, n: np.ndarray) -> np.ndarray:
        # pos: 0-based rank within the key; n: the key's row count
        base, rem = n // n_tiles, n % n_tiles
        cut = rem * (base + 1)  # rows before this index sit in fat tiles
        return np.where(
            pos < cut,
            pos // (base + 1),
            # base >= 1 whenever any row falls past the fat tiles
            rem + (pos - cut) // np.maximum(base, 1),
        ) + 1

    def _rank(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            cols = {
                id_col: pa.array([], pa.int64()),
                key: pa.array([], grp.schema.field(key).type),
                "rnk": pa.array([], pa.int64()),
                "pct": pa.array([], pa.float64()),
            }
            if n_tiles is not None:
                cols["tile"] = pa.array([], pa.int64())
            if dense:
                cols["drnk"] = pa.array([], pa.int64())
            return pa.table(cols)
        df = grp.to_pandas()
        codes, _ = pd.factorize(df[key], sort=True)
        v = df[val].to_numpy()
        ids = df[id_col].to_numpy(np.int64)
        if descending:
            if not np.issubdtype(v.dtype, np.integer):
                v = -v.astype(np.float64)
            else:
                v = -v.astype(np.int64)
        order = np.lexsort((ids, v, codes))
        c = codes[order]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        counts = np.diff(np.r_[starts, len(c)])
        pos = np.arange(len(c), dtype=np.int64) - np.repeat(starts, counts)
        n = np.repeat(counts, counts)
        pct = np.where(n > 1, pos / np.maximum(n - 1, 1), 0.0)
        cols = {
            id_col: pa.array(ids[order], pa.int64()),
            key: pa.array(df[key].to_numpy()[order]),
            "rnk": pa.array(pos + 1, pa.int64()),
            "pct": pa.array(pct, pa.float64()),
        }
        if n_tiles is not None:
            cols["tile"] = pa.array(_ntile(pos, n), pa.int64())
        if dense:
            vo = v[order]
            newv = np.r_[True, (c[1:] != c[:-1]) | (vo[1:] != vo[:-1])]
            g = np.cumsum(newv)
            cols["drnk"] = pa.array(
                g - np.repeat(g[starts] - 1, counts), pa.int64()
            )
        return pa.table(cols)

    return hash_bucket_agg(ds, key_fn, _rank, num_buckets=num_buckets)


def pivot_counts(
    ds: rd.Dataset,
    key: str,
    val: str,
    categories: list[str],
    key_fn: Callable[[pa.Table], np.ndarray],
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Pivot (crosstab): one wide row per key with a count column per
    category — SQL ``count(*) FILTER (WHERE val = c)``.  Categories are
    an explicit caller-supplied list (the schema must be static for
    Arrow); rows with other values are ignored.  Per-block indicator
    columns pre-aggregate BEFORE the single bucketed shuffle, so the
    exchange carries one row per (block, key), not per event."""
    names = [f"n_{c}" for c in categories]

    def _ind(batch: pa.Table) -> pa.Table:
        et = batch.column(val).to_pandas().to_numpy()
        k = np_col(batch, key)
        cols = {key: pa.array(k, pa.int64())}
        for c, nm in zip(categories, names):
            cols[nm] = pa.array((et == c).astype(np.int64), pa.int64())
        t = pa.table(cols)
        # per-block partial: sum indicators per key (reduceat, sorted)
        order = np.argsort(k, kind="stable")
        sk = k[order]
        starts = np.r_[0, np.flatnonzero(sk[1:] != sk[:-1]) + 1]
        out = {key: pa.array(sk[starts], pa.int64())}
        for nm in names:
            v = np_col(t, nm)[order]
            out[nm] = pa.array(np.add.reduceat(v, starts), pa.int64())
        return pa.table(out)

    partials = ds.map_batches(_ind, batch_format="pyarrow")
    return grouped_pandas_agg(
        partials, [key], {nm: (nm, "sum") for nm in names},
        key_fn=lambda b: np_col(b, key), num_buckets=num_buckets,
    )


def grouped_mode(
    ds: rd.Dataset,
    key: str,
    val: str,
    key_fn: Callable[[pa.Table], np.ndarray],
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Per-key MODE (most frequent value) with the deterministic
    (count desc, value asc) tie-break — the label-propagation combine
    exposed as a standalone relational aggregate (SURVEY.md §2.4 R4).
    Two-stage: per-block (key, val, n) partial counts are computed
    BEFORE the exchange (the shuffle ships one row per distinct pair
    per block, never raw rows), then one bucketed shuffle on the key
    finishes the sum and picks the argmax.  Output: (key, val, n)."""

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key, val]).to_pandas()
        c = df.groupby([key, val], sort=False, observed=True).size()
        c = c.reset_index(name="__n__")
        c["__n__"] = c["__n__"].astype(np.int64)
        return pa.Table.from_pandas(c, preserve_index=False)

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _final(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        df = df.groupby([key, val], sort=False, observed=True)["__n__"] \
            .sum().reset_index()
        df = df.sort_values([key, "__n__", val],
                            ascending=[True, False, True], kind="stable")
        top = df.drop_duplicates(key, keep="first")
        return pa.table({
            key: pa.array(top[key]),
            val: pa.array(top[val]),
            "n": pa.array(top["__n__"].to_numpy(np.int64), pa.int64()),
        })

    return hash_bucket_agg(partials, key_fn, _final,
                           num_buckets=num_buckets)


def latest_by_key(
    ds: rd.Dataset,
    key: str,
    order_by: list[str],
    key_fn: Callable[[pa.Table], np.ndarray],
    *,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Per-key ARG-MAX row: for every key the single FULL row that is
    lexicographically last under the ``order_by`` column tuple — the
    changelog-compaction / CDC upsert-merge / SCD "current row"
    primitive (SURVEY.md §2.4 R4 family).  ``order_by`` must be a
    total order within each key (end it with a unique id, e.g.
    ``["ts", "event_id"]``), otherwise the winner would depend on
    block layout.  Arg-max is idempotent and associative, so the plan
    pre-combines: every block first reduces to one winner row per key
    it contains — the shuffle ships at most distinct-keys-per-block
    full rows, never the raw table — then one bucketed exchange on the
    key hash finishes the arg-max.  Per-worker memory is a bucket's
    distinct keys, not the table."""
    cols = [key] + list(order_by)
    asc = [True] + [False] * len(order_by)

    def _winners(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        df = df.sort_values(cols, ascending=asc, kind="stable")
        return pa.Table.from_pandas(
            df.drop_duplicates(key, keep="first"),
            preserve_index=False,
            schema=tbl.schema,
        ).replace_schema_metadata()

    partials = ds.map_batches(_winners, batch_format="pyarrow")
    return hash_bucket_agg(partials, key_fn, _winners,
                           num_buckets=num_buckets)


SCD2_OPEN = np.int64(2**63 - 1)  # "still current" upper bound


def scd2_intervals(
    ds: rd.Dataset,
    key: str,
    seq: str,
    key_fn: Callable[[pa.Table], np.ndarray],
    *,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Slowly-changing-dimension type-2 builder: turn a changelog into
    versioned rows with half-open validity ``[seq_from, seq_to)`` —
    each key's version i is valid until its successor's ``seq``, the
    latest version gets ``seq_to = SCD2_OPEN`` and ``is_current = 1``.
    The dimension-history shape :func:`latest_by_key` (current row
    only) and :func:`merge_upsert` (apply changes) don't cover: every
    version survives, queryable as-of any ``seq``.

    ``seq`` must be unique per key (a changelog sequence/LSN), making
    the successor well-defined at any block layout.  ONE bucketed
    exchange on the key hash lands each key's full history; the kernel
    is a lexsort + shifted-compare (no per-key loop).  Output = input
    columns with ``seq`` renamed conceptually to the version start,
    plus ``seq_to`` and ``is_current`` (int64 0/1); SQL twin:
    ``coalesce(lead(seq) OVER (PARTITION BY key ORDER BY seq),
    SCD2_OPEN)``."""

    def _versions(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        df = df.sort_values([key, seq], kind="stable")
        k = df[key].to_numpy()
        s = df[seq].to_numpy(np.int64)
        if len(df) and not (np.diff(s)[k[1:] == k[:-1]] > 0).all():
            raise ValueError(f"duplicate {seq!r} within a {key!r} group")
        if len(df):
            nxt = np.r_[s[1:], SCD2_OPEN]
            same = np.r_[k[1:] == k[:-1], False]
            df["seq_to"] = np.where(same, nxt, SCD2_OPEN)
            df["is_current"] = (~same).astype(np.int64)
        else:  # total on 0-row input (empty-bucket contract)
            df["seq_to"] = np.zeros(0, np.int64)
            df["is_current"] = np.zeros(0, np.int64)
        return pa.Table.from_pandas(
            df, preserve_index=False
        ).replace_schema_metadata()

    return hash_bucket_agg(ds, key_fn, _versions, num_buckets=num_buckets)


def interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    left_carry: list[str],
    right_carry: list[str],
    max_span: int,
    out_names: dict[str, str] | None = None,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Bounded interval (range) join — a custom operator the Dataset
    API lacks (SURVEY.md §2.4): emit one row per (left, right) pair
    with the same key and ``right.lo <= left.ts < right.hi``
    (half-open, one-to-many).  ``max_span`` is a caller-supplied upper
    bound on every right interval's length (asserted per bucket) — the
    standard bounded-range-join restriction that turns the inequality
    join into a per-row window probe instead of a per-key scan.

    Shape mirrors :func:`asof_join`: ONE co-shuffle (both sides stamped
    with ``bucket = hash64(key) % B``), then each bucket resolves with
    vectorized searchsorted over the (key_rank, lo)-composed order.
    Because ``hi <= lo + max_span``, a match implies
    ``ts - max_span < lo <= ts``, so candidates per left row are one
    contiguous slice of the lo-sorted segment; the exact ``hi > ts``
    test filters the expanded candidates.  Work per bucket is
    O((L+R)·log R + matches); per-worker memory is the bucket plus its
    match fan-out, never the table.

    Keys, carries and interval columns must be integer (timestamps
    pre-cast to epoch µs by the caller).
    """
    out_names = out_names or {}
    l_fields = [pa.field(c, pa.int64()) for c in left_carry]
    r_fields = [pa.field(c, pa.int64()) for c in right_carry]
    union_schema = pa.schema(
        [
            pa.field("__k__", pa.int64()),
            pa.field("__t__", pa.int64()),   # left ts | right lo
            pa.field("__h__", pa.int64()),   # right hi (null on left)
            pa.field("__side__", pa.int8()),
        ]
        + l_fields
        + r_fields
        + [pa.field("__bucket__", pa.int32())]
    )

    def _ts_np(batch: pa.Table, col: str) -> np.ndarray:
        c = batch.column(col).combine_chunks()
        if pa.types.is_timestamp(c.type):
            c = c.cast(pa.timestamp("us"))
        return c.cast(pa.int64()).to_numpy(zero_copy_only=False)

    def _tag(side: int, key: str, ts: str, hi: str | None, cols: list[str]):
        def _fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            k = np_col(batch, key).astype(np.int64)
            arrs = [
                pa.array(k, pa.int64()),
                pa.array(_ts_np(batch, ts), pa.int64()),
                (pa.array(_ts_np(batch, hi), pa.int64()) if hi
                 else pa.nulls(n, pa.int64())),
                pa.array(np.full(n, side, np.int8), pa.int8()),
            ]
            for f in l_fields + r_fields:
                if f.name in cols:
                    arrs.append(batch.column(f.name).cast(pa.int64()))
                else:
                    arrs.append(pa.nulls(n, pa.int64()))
            arrs.append(
                pa.array(
                    (hash64(k) % np.uint64(num_buckets)).astype(np.int32),
                    pa.int32(),
                )
            )
            return pa.Table.from_arrays(arrs, schema=union_schema)

        return _fn

    tagged = left.map_batches(
        _tag(0, left_key, left_ts, None, left_carry), batch_format="pyarrow"
    ).union(
        right.map_batches(
            _tag(1, right_key, right_lo, right_hi, right_carry),
            batch_format="pyarrow",
        )
    )
    out_fields = [(out_names.get(c, c), c) for c in left_carry]
    rout_fields = [(out_names.get(c, c), c) for c in right_carry]
    empty = pa.table(
        {o: pa.array([], pa.int64()) for o, _ in out_fields + rout_fields}
    )

    def _resolve(grp: pa.Table) -> pa.Table:
        side = np_col(grp, "__side__")
        lt = grp.filter(pa.array(side == 0))
        rt = grp.filter(pa.array(side == 1))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        lk, lts = np_col(lt, "__k__"), np_col(lt, "__t__")
        rk, rlo = np_col(rt, "__k__"), np_col(rt, "__t__")
        rhi = np_col(rt, "__h__")
        span = rhi - rlo
        assert span.max(initial=0) <= max_span, (
            f"interval_join: right span {span.max()} exceeds "
            f"max_span={max_span}"
        )
        order = np.lexsort((rlo, rk))
        rk, rlo, rhi = rk[order], rlo[order], rhi[order]
        uk = np.unique(rk)
        kr_r = np.searchsorted(uk, rk)
        vals = np.unique(np.concatenate([rlo, lts, lts - max_span]))
        u = np.int64(len(vals) + 1)
        comp_r = kr_r * u + np.searchsorted(vals, rlo)
        kr_l = np.searchsorted(uk, np.clip(lk, uk[0], uk[-1]))
        key_hit = uk[np.minimum(kr_l, len(uk) - 1)] == lk
        # candidates: lo in (ts - max_span, ts]  (within the key segment
        # by construction — ranks are < u so comps stay in [kr·u, kr·u+u))
        start = np.searchsorted(
            comp_r, kr_l * u + np.searchsorted(vals, lts - max_span),
            side="right",
        )
        end = np.searchsorted(
            comp_r, kr_l * u + np.searchsorted(vals, lts), side="right"
        )
        counts = np.where(key_hit, end - start, 0)
        total = int(counts.sum())
        if total == 0:
            return empty
        rep = np.repeat(np.arange(lt.num_rows, dtype=np.int64), counts)
        csum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ridx = np.repeat(start, counts) + (
            np.arange(total, dtype=np.int64) - np.repeat(csum, counts)
        )
        keep = rhi[ridx] > lts[rep]
        rep, ridx = rep[keep], ridx[keep]
        cols = {o: lt.column(c).take(pa.array(rep)) for o, c in out_fields}
        rsrc = order[ridx]
        for o, c in rout_fields:
            cols[o] = rt.column(c).take(pa.array(rsrc))
        return pa.table(cols)

    return tagged.groupby("__bucket__").map_groups(
        _resolve, batch_format="pyarrow"
    )


def run_batch(jobs: dict[str, Callable[[], object]], max_workers: int | None = None) -> dict:
    """Run several independent problem instances CONCURRENTLY against
    one Ray cluster — the reference's ``batch`` operator
    (gunrock/essentials ``framework/operators/batch.hxx`` [U]: several
    enactors sharing a device).  Each callable drives its own Dataset
    pipeline / superstep loop; Ray's scheduler interleaves their tasks,
    so total wall time ≈ the resource-bound makespan, not the sum.
    Returns {name: result} with every job completed (exceptions
    propagate after all jobs settle)."""
    import concurrent.futures as cf

    out: dict[str, object] = {}
    errs: dict[str, BaseException] = {}
    with cf.ThreadPoolExecutor(max_workers or len(jobs)) as ex:
        futs = {name: ex.submit(fn) for name, fn in jobs.items()}
        for name, fut in futs.items():
            try:
                out[name] = fut.result()
            except BaseException as e:  # noqa: BLE001 — reported, not hidden
                errs[name] = e
    if errs:
        first = next(iter(errs))
        raise RuntimeError(f"run_batch: {len(errs)} job(s) failed: {sorted(errs)}") from errs[first]
    return out


def rollup_agg(
    ds: rd.Dataset,
    keys: list[str],
    val_col: str | None = None,
    *,
    cube: bool = False,
    sentinel: str = "ALL",
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Multi-level grouped aggregate — SQL ``GROUP BY ROLLUP(keys)``
    (prefix grouping sets) or ``CUBE(keys)`` (all subsets) in ONE scan
    (SURVEY.md §2.4 R4).

    Per block, a partial ``(n, s)`` row is emitted for every grouping
    set × distinct key combo, grouped-out key columns filled with
    ``sentinel`` (NULL-free so the driver's value-hash compare and the
    DuckDB twin agree via COALESCE) — the exchange ships ≤ #combos ×
    #sets rows per block, never raw rows, the engine's standard partial
    pre-aggregation shape.  One bucketed combine on the hash of the
    filled key tuple finishes the sums.  ``val_col`` must be int64 (the
    caller converts floats to exact integers first, e.g. half-up cents,
    so totals are bit-identical at any partitioning); ``None`` counts
    only.  Output: keys… + n (count) + s (sum, if val_col)."""
    import itertools

    import pandas as pd

    if cube:
        sets = list(itertools.product([True, False], repeat=len(keys)))
    else:
        sets = [
            tuple([True] * L + [False] * (len(keys) - L))
            for L in range(len(keys), -1, -1)
        ]
    cols = keys + ([val_col] if val_col else [])

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        outs = []
        for mask in sets:
            g = [k for k, m in zip(keys, mask) if m]
            if g:
                gb = df.groupby(g, sort=False, observed=True, dropna=False)
                agg = gb.size().reset_index(name="n")
                agg["n"] = agg["n"].astype(np.int64)
                if val_col:
                    agg["s"] = gb[val_col].sum().reset_index(drop=True).astype(np.int64)
            else:
                agg = pd.DataFrame({"n": [np.int64(len(df))]})
                if val_col:
                    agg["s"] = np.int64(df[val_col].sum()) if len(df) else np.int64(0)
            for k, m in zip(keys, mask):
                if not m:
                    agg[k] = sentinel
            outs.append(agg[keys + (["n", "s"] if val_col else ["n"])])
        out = pd.concat(outs, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(_partial, batch_format="pyarrow")

    def _key(batch: pa.Table) -> np.ndarray:
        import pandas as pd

        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in keys:
            arr = np.asarray(batch.column(c).to_pylist(), dtype=object)
            k = (
                pd.util.hash_array(arr, categorize=False).view(np.int64)
                if len(arr)
                else np.zeros(0, np.int64)
            )
            with np.errstate(over="ignore"):
                h = h * np.uint64(0x100000001B3) + hash64(k)
        return h.view(np.int64)

    def _final(grp: pa.Table) -> pa.Table:
        df = grp.to_pandas()
        gb = df.groupby(keys, sort=False, observed=True)
        agg = gb["n"].sum().reset_index()
        agg["n"] = agg["n"].astype(np.int64)
        if val_col:
            agg["s"] = gb["s"].sum().reset_index(drop=True).astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    return hash_bucket_agg(partials, _key, _final, num_buckets=num_buckets)


def table_diff(
    a: rd.Dataset,
    b: rd.Dataset,
    key_fn: Callable[[pa.Table], np.ndarray],
    val_fn: Callable[[pa.Table], np.ndarray],
    key_col: str,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Snapshot diff between two versions of a keyed table — the
    data-versioning primitive (what changed between yesterday's and
    today's 100 TB extract?) computed WITHOUT sorting or joining the
    full rows: both sides reduce to (key, value-hash) pairs tagged by
    side, co-shuffle ONCE on the key hash, and each bucket classifies
    its keys locally:

        removed — key present only in A
        added   — key present only in B
        changed — key in both, value hash differs

    Unchanged keys (the overwhelming majority in practice) produce NO
    output row and never leave their bucket.  ``key_fn``/``val_fn``
    map a batch to int64 key / value-hash arrays (pack multiple
    columns the usual way; the value hash uses full 64-bit splitmix —
    a collision hides a change with probability 2⁻⁶⁴ per key).
    Caller guarantees keys are unique per side (it is a diff of keyed
    snapshots, not multisets).  Returns (key_col, status)."""

    def _tag(side: int):
        def _m(batch: pa.Table) -> pa.Table:
            k = key_fn(batch).astype(np.int64)
            v = hash64(val_fn(batch).astype(np.uint64)).view(np.int64)
            return pa.table(
                {
                    key_col: pa.array(k, pa.int64()),
                    "__vh__": pa.array(v, pa.int64()),
                    "__side__": pa.array(
                        np.full(len(k), side, np.int8), pa.int8()
                    ),
                }
            )

        return _m

    tagged = a.map_batches(_tag(0), batch_format="pyarrow").union(
        b.map_batches(_tag(1), batch_format="pyarrow")
    )

    def _classify(grp: pa.Table) -> pa.Table:
        k = np_col(grp, key_col)
        v = np_col(grp, "__vh__")
        s = np_col(grp, "__side__")
        order = np.lexsort((s, k))
        k, v, s = k[order], v[order], s[order]
        starts = (np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
                  if len(k) else np.zeros(0, np.int64))
        counts = np.diff(np.r_[starts, len(k)])
        one = counts == 1
        removed = one & (s[starts] == 0)
        added = one & (s[starts] == 1)
        both = counts == 2
        changed = np.zeros(len(starts), bool)
        bi = np.flatnonzero(both)
        if len(bi):
            changed[bi] = v[starts[bi]] != v[starts[bi] + 1]
        keys = np.concatenate([k[starts[removed]], k[starts[added]],
                               k[starts[changed]]])
        status = np.concatenate([
            np.full(int(removed.sum()), "removed", object),
            np.full(int(added.sum()), "added", object),
            np.full(int(changed.sum()), "changed", object),
        ])
        return pa.table(
            {
                key_col: pa.array(keys, pa.int64()),
                "status": pa.array(status, pa.string()),
            }
        )

    return hash_bucket_agg(
        tagged, lambda t: np_col(t, key_col), _classify,
        num_buckets=num_buckets,
    )


def merge_upsert(
    snapshot: rd.Dataset,
    changes: rd.Dataset,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Apply a CDC changeset to a keyed snapshot — the ``MERGE INTO``
    / log-compaction primitive every incremental-ingest pipeline needs:
    ``changes`` carries the snapshot's full schema plus an int64
    ``seq_col`` (change-log position, ≥ 0) and a string ``op_col``
    (``'U'`` insert-or-replace, ``'D'`` delete).  Per key the change
    with the highest ``seq`` wins (last-writer-wins; ties on ``seq``
    would make the log ambiguous, so they raise); a winning ``'U'``
    replaces / inserts the row, a winning ``'D'`` removes the key.
    Snapshot keys never touched pass through unchanged.

    Plan: ONE key-hash co-shuffle of snapshot ∪ tagged changes (any
    merge must co-locate a key's snapshot row with its change rows —
    this is the minimum movement, same exchange count as table_diff),
    then each bucket resolves its complete keys vectorized: lexsorted
    last-per-key winner pick, searchsorted membership for pass-through
    rows, one ``Table.take``.  Output schema = snapshot schema.  Keys
    are int64 and unique per snapshot (keyed-table contract)."""
    import pyarrow.compute as pc

    schema = getattr(snapshot.schema(), "base_schema", None)
    if not isinstance(schema, pa.Schema):
        snapshot = snapshot.map_batches(lambda b: b, batch_format="pyarrow")
        schema = snapshot.schema().base_schema
    snap_cols = [n for n in schema.names if n not in (seq_col, op_col)]

    def _tag_snap(t: pa.Table) -> pa.Table:
        t = t.select(snap_cols)
        n = t.num_rows
        return t.append_column(
            seq_col, pa.array(np.full(n, -1, np.int64), pa.int64())
        ).append_column(op_col, pa.array(["U"] * n, pa.string()))

    def _cast_seq(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c) for c in snap_cols}
        cols[seq_col] = t.column(seq_col).cast(pa.int64())
        cols[op_col] = t.column(op_col).cast(pa.string())
        return pa.table(cols)

    tagged = snapshot.map_batches(_tag_snap, batch_format="pyarrow").union(
        changes.map_batches(_cast_seq, batch_format="pyarrow")
    )

    def _resolve(grp: pa.Table) -> pa.Table:
        k = np_col(grp, key_col).astype(np.int64)
        seq = np_col(grp, seq_col).astype(np.int64)
        is_ch = seq >= 0
        ck, cseq = k[is_ch], seq[is_ch]
        order = np.lexsort((cseq, ck))
        cks, css = ck[order], cseq[order]
        last = (np.r_[cks[1:] != cks[:-1], True]
                if len(cks) else np.zeros(0, bool))
        if len(css) and np.any(
            (cks[1:] == cks[:-1]) & (css[1:] == css[:-1])
        ):
            raise ValueError(
                f"merge_upsert: duplicate ({key_col}, {seq_col}) change "
                "rows — the change log is ambiguous"
            )
        win_idx = np.flatnonzero(is_ch)[order[last]]
        win_keys = cks[last]  # sorted
        ops = grp.column(op_col).combine_chunks()
        win_keep = win_idx[
            np.asarray(pc.equal(ops.take(pa.array(win_idx)), "U"))
        ]
        snap_idx = np.flatnonzero(~is_ch)
        sk = k[snap_idx]
        if len(win_keys):
            pos = np.minimum(np.searchsorted(win_keys, sk), len(win_keys) - 1)
            snap_idx = snap_idx[win_keys[pos] != sk]
        return grp.take(
            pa.array(np.sort(np.r_[snap_idx, win_keep]))
        ).select(snap_cols)

    return hash_bucket_agg(
        tagged, lambda t: np_col(t, key_col), _resolve,
        num_buckets=num_buckets,
    )


def int_histogram(
    ds: rd.Dataset,
    col: str,
    lo: int,
    width: int,
    n_bins: int,
) -> pa.Table:
    """Equi-width histogram of an integer column — the profiling /
    bucketing primitive: rows with ``lo ≤ v < lo + n_bins·width``
    count into ``bin = (v − lo) // width``; out-of-range rows are
    ignored (count them separately if needed).  Zero shuffle: one
    length-``n_bins`` bincount partial per block, folded driver-side.
    Only non-empty bins are returned (bin, bin_lo, n), matching a SQL
    GROUP BY on the computed bin."""
    hi = lo + n_bins * width

    def _partial(batch: pa.Table) -> pa.Table:
        v = np_col(batch, col).astype(np.int64)
        v = v[(v >= lo) & (v < hi)]
        c = np.bincount((v - lo) // width, minlength=n_bins)
        return pa.table({"c": pa.array(c.astype(np.int64), pa.int64())})

    import ray as _ray

    total = np.zeros(n_bins, np.int64)
    for t in _ray.get(
        ds.map_batches(_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        arr = np.asarray(t.column("c"), np.int64)
        total += arr.reshape(-1, n_bins).sum(axis=0)
    nz = np.flatnonzero(total)
    return pa.table(
        {
            "bin": pa.array(nz.astype(np.int64), pa.int64()),
            "bin_lo": pa.array(lo + nz.astype(np.int64) * width, pa.int64()),
            "n": pa.array(total[nz], pa.int64()),
        }
    )


def split_assign(
    ds: rd.Dataset,
    fracs: list[float],
    labels: list[str],
    key_fn: Callable[[pa.Table], np.ndarray],
    seed: int = 42,
    out_col: str = "split",
) -> rd.Dataset:
    """Deterministic train/val/test splitting: every row gets a split
    label from thresholds on ``splitmix64(key ^ seed-mix)`` — a pure
    function of the row's key, so the assignment is identical across
    runs, block layouts, cluster sizes AND across tables sharing the
    key (features and labels land on the same side, the property a
    leakage-safe pipeline needs; Dataset.random_sample gives none of
    this).  ``fracs`` must sum to 1 within float tolerance; the last
    label absorbs the remainder.  Zero shuffle — one stamped column."""
    assert len(fracs) == len(labels) and len(labels) >= 2
    assert abs(sum(fracs) - 1.0) < 1e-9
    cum = np.cumsum(fracs)[:-1]
    thresholds = (cum * float(2**64 - 1)).astype(np.uint64)
    mix = np.int64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1))
    lab = np.asarray(labels, object)

    def _stamp(batch: pa.Table) -> pa.Table:
        k = key_fn(batch).astype(np.int64)
        with np.errstate(over="ignore"):
            h = hash64(k + mix)
        idx = np.searchsorted(thresholds, h, side="right")
        return batch.append_column(out_col, pa.array(lab[idx], pa.string()))

    return ds.map_batches(_stamp, batch_format="pyarrow")


def weighted_sample(
    ds: rd.Dataset,
    key_fn: Callable[[pa.Table], np.ndarray],
    weight_fn: Callable[[pa.Table], np.ndarray],
    rate_num: int,
    rate_den: int,
    seed: int = 42,
) -> rd.Dataset:
    """Weight-proportional deterministic Bernoulli sampling: keep a row
    iff ``splitmix64(key ^ seed-mix) < min(2⁶⁴−1, w·2⁶⁴·num/den)`` —
    inclusion probability ``min(1, w·num/den)`` per row, a pure
    function of (key, weight), so the sample is identical across runs,
    layouts and cluster sizes, and a SQL twin reproduces the exact
    integer threshold (the rate is a RATIONAL, never a float).  The
    importance-sampling shape: long docs / heavy rows kept
    proportionally more often.  Caller bounds ``w·num`` to int64.
    Zero shuffle."""
    assert rate_num >= 0 and rate_den > 0
    mix = np.int64((seed * 0x9E3779B97F4A7C15) & (2**63 - 1))
    # threshold = w * num * (2^64/den) computed as w*num*(2^64 // den)
    # would lose precision; instead compare h·den < w·num·2^64 via
    # h < w·num·2^64/den  ⇔  h·den < w·num << 64 — do it in Python
    # ints per distinct weight (weights are few per batch) to stay
    # exact without int128
    two64 = 1 << 64

    def _keep(batch: pa.Table) -> pa.Table:
        k = key_fn(batch).astype(np.int64)
        w = weight_fn(batch).astype(np.int64)
        with np.errstate(over="ignore"):
            h = hash64(k + mix)
        uw = np.unique(w)
        # exact uint64 thresholds (clamped), one python int per
        # DISTINCT weight — not per row
        thr_u = np.array(
            [min(two64 - 1, (int(x) * rate_num * two64) // rate_den)
             for x in uw],
            np.uint64,
        )
        mask = h < thr_u[np.searchsorted(uw, w)]
        return batch.take(pa.array(np.flatnonzero(mask)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def validate_table(
    ds: rd.Dataset,
    rules: list[dict],
) -> pa.Table:
    """Distributed data-quality gate: evaluate declarative rules over
    every row and report per-rule violation counts — the CI check a
    pipeline runs before promoting a 100 TB extract.  Each rule is
    ``{"name", "col", ...}`` with optional ``not_null: True``,
    ``min``/``max`` (inclusive bounds on numeric columns) — a row
    violates the rule if any stated condition fails (NULL violates
    bounds only via not_null).  Zero shuffle: one count vector per
    block, folded driver-side.  Returns (rule, n_violations, n_rows)
    sorted by rule."""
    names = [r["name"] for r in rules]

    def _partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        out = []
        for r in rules:
            col = batch.column(r["col"])
            viol = pa.array(np.zeros(n, bool))
            if r.get("not_null"):
                viol = pc.or_(viol, pc.is_null(col))
            if "min" in r:
                bad = pc.fill_null(pc.less(col, r["min"]), False)
                viol = pc.or_(viol, bad)
            if "max" in r:
                bad = pc.fill_null(pc.greater(col, r["max"]), False)
                viol = pc.or_(viol, bad)
            out.append(int(pc.sum(viol).as_py() or 0))
        return pa.table(
            {
                "rule": pa.array(names, pa.string()),
                "v": pa.array(out, pa.int64()),
                "n": pa.array([n] * len(rules), pa.int64()),
            }
        )

    totals = {m: [0, 0] for m in names}
    for row in ds.map_batches(_partial, batch_format="pyarrow").take_all():
        totals[row["rule"]][0] += row["v"]
        totals[row["rule"]][1] += row["n"]
    order = sorted(names)
    return pa.table(
        {
            "rule": pa.array(order, pa.string()),
            "n_violations": pa.array([totals[m][0] for m in order],
                                     pa.int64()),
            "n_rows": pa.array([totals[m][1] for m in order], pa.int64()),
        }
    )


def band_join_self(
    ds: rd.Dataset,
    id_col: str,
    val_col: str,
    span: int,
    n_parts: int = 32,
    key_fn: Callable[[pa.Table], np.ndarray] | None = None,
    seed: int = 42,
) -> rd.Dataset:
    """KEYLESS self band join: all row pairs whose int64 values differ
    by at most ``span`` — the pure theta-join (|vₐ − v_b| ≤ c with no
    equality key) that hash joins cannot express.  Plan: deterministic
    range partitioning on the value; each row lands once as the pair's
    canonical LEFT (owner = partition of the smaller (val, id)) and as
    a GHOST right copy in every partition covering [v − span, v] — at
    sane span/partition-width ratios that is ≤ 2 copies, so the
    exchange stays ~2×|rows|, never all-pairs.  Per partition one
    lexsort + searchsorted window expansion: O(n log n + matches).
    Output (a_id, b_id, vdiff) where a is the pair's smaller (val, id)
    — every pair appears exactly once (proof: its owner partition is
    unique, and in-partition expansion emits each (i, j>i) window pair
    once)."""
    if key_fn is None:
        key_fn = lambda b: np_col(b, id_col)
    routed, bounds = range_partition(ds, val_col, n_parts, key_fn,
                                     seed=seed)

    def _ghost(batch: pa.Table) -> pa.Table:
        v = np_col(batch, val_col)
        i = np_col(batch, id_col)
        own = np.searchsorted(bounds, v, side="right").astype(np.int64)
        lo = np.searchsorted(bounds, v - span, side="right").astype(np.int64)
        outs = []
        # copy into every partition from p(v−span) to p(v) (owner copy
        # carries kind=0, ghosts kind=1; within the owner partition the
        # row acts as both sides via kind=0)
        max_spread = int((own - lo).max()) if len(v) else 0
        for d in range(max_spread + 1):
            sel = own - lo >= d
            if not sel.any():
                break
            p = lo[sel] + d
            kind = (p != own[sel]).astype(np.int8)
            outs.append(pa.table(
                {
                    id_col: pa.array(i[sel], pa.int64()),
                    val_col: pa.array(v[sel], pa.int64()),
                    "part_id": pa.array(p, pa.int64()),
                    "kind": pa.array(kind, pa.int8()),
                }
            ))
        return pa.concat_tables(outs) if outs else pa.table(
            {id_col: pa.array([], pa.int64()),
             val_col: pa.array([], pa.int64()),
             "part_id": pa.array([], pa.int64()),
             "kind": pa.array([], pa.int8())})

    spread = routed.drop_columns(["part_id"]).map_batches(
        _ghost, batch_format="pyarrow"
    )

    def _match(grp: pa.Table) -> pa.Table:
        v = np_col(grp, val_col)
        i = np_col(grp, id_col)
        kind = np_col(grp, "kind")
        order = np.lexsort((i, v))
        v, i, kind = v[order], i[order], kind[order]
        # left rows: owner copies only; rights: everything (owner rows
        # are also valid right partners within this partition)
        hi = np.searchsorted(v, v + span, side="right")
        pos = np.arange(len(v))
        is_left = kind == 0
        li = np.flatnonzero(is_left)
        counts = hi[li] - (li + 1)
        counts = np.maximum(counts, 0)
        if not counts.sum():
            return pa.table(
                {"a_id": pa.array([], pa.int64()),
                 "b_id": pa.array([], pa.int64()),
                 "vdiff": pa.array([], pa.int64())})
        a_rep = np.repeat(li, counts)
        starts = li + 1
        j = (np.arange(int(counts.sum()))
             - np.repeat(np.cumsum(counts) - counts, counts)
             + np.repeat(starts, counts))
        return pa.table(
            {
                "a_id": pa.array(i[a_rep], pa.int64()),
                "b_id": pa.array(i[j], pa.int64()),
                "vdiff": pa.array(v[j] - v[a_rep], pa.int64()),
            }
        )

    return spread.groupby("part_id").map_groups(
        lambda g: _match(g.drop_columns(["part_id"])),
        batch_format="pyarrow",
    )


def _local_skyline_2d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Indices of the 2-D maxima (pareto front) of (x, y): a row
    survives iff no other row has (≥, ≥) with at least one strict.
    Vectorized: lexsort by (x desc, y desc); within an x-group only
    y == group-max rows can survive; across groups (scanned in
    descending x) a group survives iff its y-max strictly beats every
    higher-x group's y-max.  Duplicate surviving points all survive
    (equal points do not dominate each other)."""
    n = len(x)
    if n == 0:
        return np.zeros(0, np.int64)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    grp_start = np.r_[True, xs[1:] != xs[:-1]]
    gid = np.cumsum(grp_start) - 1
    gmax = ys[grp_start]            # first row per x-group = its y max
    run = np.maximum.accumulate(np.r_[np.int64(np.iinfo(np.int64).min),
                                      gmax[:-1]])
    g_alive = gmax > run            # strictly beats all higher-x groups
    keep = g_alive[gid] & (ys == gmax[gid])
    return np.sort(order[keep])


def pareto_front_2d(ds: rd.Dataset, x: str, y: str) -> pa.Table:
    """Distributed 2-D skyline (Börzsönyi et al. 2001, maximize both):
    each block keeps only its LOCAL pareto front (the global front is a
    subset of the union of local fronts — any dominated row is
    dominated transitively by a local survivor), the driver re-runs the
    same kernel over the concatenated candidates.  ZERO shuffle; moved
    rows = Σ local front sizes, which for correlated criteria is tiny.
    The multi-criteria curation filter ("keep docs on the
    quality × length frontier") as one operator."""

    def _partial(t: pa.Table) -> pa.Table:
        idx = _local_skyline_2d(np_col(t, x).astype(np.int64),
                                np_col(t, y).astype(np.int64))
        return t.take(pa.array(idx))

    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    if not parts:
        schema = getattr(ds.schema(), "base_schema", None)
        return schema.empty_table() if schema is not None else pa.table({})
    cand = pa.Table.from_pylist(parts)
    idx = _local_skyline_2d(np_col(cand, x).astype(np.int64),
                            np_col(cand, y).astype(np.int64))
    return cand.take(pa.array(idx))


def incremental_grouped_sum(
    old: rd.Dataset,
    new: rd.Dataset,
    key_col: str,
    group_col: str,
    val_col: str,
    old_agg: pa.Table,
    num_buckets: int = DEFAULT_BUCKETS,
) -> pa.Table:
    """Incremental view maintenance for a grouped SUM — update
    yesterday's aggregate paying only the DELTA: `table_diff`
    classifies keys in one (key, value-hash) co-shuffle where
    unchanged keys never leave their bucket, then exactly two
    keyset-restricted scans re-aggregate only the touched rows:

        A2[g] = A1[g] − Σ old rows of removed∪changed keys
                      + Σ new rows of added∪changed keys

    The result is bit-identical to re-aggregating the new table from
    scratch (pytest-pinned), but the value columns of unchanged keys
    are never exchanged.  The touched keysets are broadcast as sorted
    arrays (delta-sized by assumption — this is the op for the
    daily-extract regime where change ≪ table; a full-churn input
    degrades gracefully to ~one extra scan).  Keys unique per side,
    same as table_diff.  ``old_agg``: (group_col, total) from the
    previous maintenance round.  A group whose rows ALL disappear stays
    in the view with total 0 (maintenance semantics) — a from-scratch
    GROUP BY would emit no row for it; compare accordingly."""
    import ray

    kf = lambda t: np_col(t, key_col).astype(np.int64)  # noqa: E731

    def _vf(t: pa.Table) -> np.ndarray:
        g = t.column(group_col)
        gh = (hash64(np_col(t, group_col).astype(np.int64))
              if not (pa.types.is_string(g.type)
                      or pa.types.is_large_string(g.type))
              else None)
        if gh is None:
            from .derive import _str_hash

            gh = _str_hash(g).view(np.uint64)
        with np.errstate(over="ignore"):
            return (gh.astype(np.uint64) * np.uint64(0x100000001B3)
                    + np_col(t, val_col).view(np.uint64))

    d = table_diff(old.select_columns([key_col, group_col, val_col]),
                   new.select_columns([key_col, group_col, val_col]),
                   key_fn=kf, val_fn=_vf, key_col=key_col,
                   num_buckets=num_buckets).to_pandas()
    minus = np.sort(d.loc[d.status.isin(["removed", "changed"]),
                          key_col].to_numpy(np.int64))
    plus = np.sort(d.loc[d.status.isin(["added", "changed"]),
                         key_col].to_numpy(np.int64))
    minus_ref, plus_ref = ray.put(minus), ray.put(plus)

    def _delta(keys_ref, sign: int):
        def _p(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            m = np.isin(np_col(t, key_col).astype(np.int64), ks)
            t = t.filter(pa.array(m))
            return pa.table({group_col: t.column(group_col),
                             "__d__": pa.array(
                                 sign * np_col(t, val_col), pa.int64())})

        return _p

    touched = (old.select_columns([key_col, group_col, val_col])
               .map_batches(_delta(minus_ref, -1), batch_format="pyarrow")
               .union(new.select_columns([key_col, group_col, val_col])
                      .map_batches(_delta(plus_ref, 1),
                                   batch_format="pyarrow")))

    def _key(b: pa.Table) -> np.ndarray:
        g = b.column(group_col)
        if pa.types.is_string(g.type) or pa.types.is_large_string(g.type):
            from .derive import _str_hash

            return _str_hash(g)
        return np_col(b, group_col).astype(np.int64)

    deltas = grouped_pandas_agg(
        touched, keys=[group_col], aggs={"__d__": ("__d__", "sum")},
        key_fn=_key, num_buckets=min(num_buckets, 8)).take_all()
    dmap = {r[group_col]: r["__d__"] for r in deltas}
    groups = old_agg.column(group_col).to_pylist()
    totals = np_col(old_agg, "total").astype(np.int64)
    out_g = list(groups)
    out_t = [int(t) + int(dmap.pop(g, 0)) for g, t in zip(groups, totals)]
    for g, dv in sorted(dmap.items(), key=lambda kv: str(kv[0])):
        out_g.append(g)          # groups born in the delta
        out_t.append(int(dv))
    keep = [i for i, t in enumerate(out_t) if t != 0 or out_g[i] in groups]
    return pa.table({group_col: pa.array([out_g[i] for i in keep]),
                     "total": pa.array([out_t[i] for i in keep],
                                       pa.int64())})


def pareto_front_2d_by(ds: rd.Dataset, group_col: str, x: str,
                       y: str) -> pa.Table:
    """Per-GROUP 2-D skyline: pareto_front_2d's kernel applied within
    each group — "the frontier per language / per segment" curation
    shape.  Same zero-shuffle plan: each block keeps its per-group
    local fronts (a pandas groupby drives the vectorized kernel — cost
    scales with groups-in-block, not rows²), the driver re-runs the
    same per-group kernel over the concatenated candidates."""

    def _local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = t.to_pandas()
        keep_idx = []
        for _, sub in df.groupby(group_col, sort=False):
            idx = _local_skyline_2d(
                sub[x].to_numpy(np.int64), sub[y].to_numpy(np.int64))
            keep_idx.append(sub.index.to_numpy()[idx])
        sel = np.sort(np.concatenate(keep_idx)) if keep_idx else []
        return pa.Table.from_pandas(df.loc[sel], preserve_index=False) \
            .replace_schema_metadata()

    parts = ds.map_batches(_local, batch_format="pyarrow").take_all()
    if not parts:
        schema = getattr(ds.schema(), "base_schema", None)
        return schema.empty_table() if schema is not None else pa.table({})
    cand = pa.Table.from_pylist(parts)
    return _local(cand)


def grouped_mad(ds: rd.Dataset, key_col: str, val_col: str,
                num_buckets: int = 32) -> rd.Dataset:
    """Per-group MEDIAN ABSOLUTE DEVIATION — the robust location/scale
    pair (med, mad) every outlier screen wants when the IQR fence is
    too loose: two exact grouped-quantile passes (quantile_disc
    semantics, so every output is an int64 actually present in the
    data — no float to hash-drift) with the per-group medians joined
    back by the engine's auto-picked join shape in between.  Rows
    never move in the quantile passes (only (key, value, count)
    histogram entries); the deviation pass is one stateless
    map_batches.  Output (key_col, med, mad)."""
    meds = grouped_quantiles(ds, key_col, val_col, [0.5],
                             num_buckets=num_buckets)
    meds = meds.map_batches(
        lambda t: pa.table({key_col: t.column(key_col),
                            "med": t.column("value")}),
        batch_format="pyarrow").materialize()
    j = join(ds.select_columns([key_col, val_col]), meds, on=key_col)

    def _dev(t: pa.Table) -> pa.Table:
        d = np.abs(np_col(t, val_col).astype(np.int64)
                   - np_col(t, "med").astype(np.int64))
        return pa.table({key_col: t.column(key_col),
                         "__dev__": pa.array(d, pa.int64())})

    mads = grouped_quantiles(j.map_batches(_dev, batch_format="pyarrow"),
                             key_col, "__dev__", [0.5],
                             num_buckets=num_buckets)
    mads = mads.map_batches(
        lambda t: pa.table({key_col: t.column(key_col),
                            "mad": t.column("value")}),
        batch_format="pyarrow")
    return join(meds, mads, on=key_col)


def unpivot(ds: rd.Dataset, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable",
            value_name: str = "value") -> rd.Dataset:
    """UNPIVOT / melt — wide → long, the inverse of pivot_counts:
    each input row yields one output row per value column, carrying
    the id columns, the column NAME as ``var_name`` and its value as
    ``value_name``.  Purely stateless (one map_batches, zero shuffle,
    output = len(value_cols)·rows) — the schema-normalization step
    before a long-form aggregate or a sparse write."""

    def _melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = {c: pa.concat_arrays(
            [t.column(c).combine_chunks()] * len(value_cols))
            for c in id_cols}
        names = []
        vals = []
        for c in value_cols:
            names.append(pa.array([c] * n, pa.string()))
            vals.append(t.column(c).combine_chunks())
        out = dict(ids)
        out[var_name] = pa.concat_arrays(names)
        out[value_name] = pa.concat_arrays(vals)
        return pa.table(out)

    return ds.map_batches(_melt, batch_format="pyarrow")


def hll_union_registers(a: pa.Table, b: pa.Table) -> pa.Table:
    """Union of two HLL sketches = element-wise register max — exact
    sketch algebra (the union sketch equals the sketch OF the union,
    by max associativity), so pipelines can exchange 2^p-byte
    artifacts instead of key sets."""
    ra, rb = np_col(a, "rho"), np_col(b, "rho")
    assert len(ra) == len(rb), "differing register counts (p mismatch)"
    return pa.table({"reg": a.column("reg"),
                     "rho": pa.array(np.maximum(ra, rb), pa.int64())})


def hll_overlap_estimate(a: pa.Table, b: pa.Table, p: int) -> dict:
    """Distinct-key overlap via inclusion–exclusion on sketches:
    |A∩B| ≈ est(A) + est(B) − est(A∪B); also the Jaccard estimate.
    Deterministic given the inputs (registers are exact artifacts);
    error compounds ~3× a single sketch's 1.04/√2^p — the pre-flight
    join-cardinality probe, not a correctness device."""
    def _est(t: pa.Table) -> float:
        return hll_estimate_from_registers(np_col(t, "rho"), p)

    ea, eb = _est(a), _est(b)
    eu = _est(hll_union_registers(a, b))
    inter = max(0.0, ea + eb - eu)
    return {"est_a": ea, "est_b": eb, "est_union": eu,
            "est_intersection": inter,
            "est_jaccard": inter / eu if eu > 0 else 0.0}


def two_sample_hist(
    a: rd.Dataset,
    b: rd.Dataset,
    col: str,
    num_buckets: int = DEFAULT_BUCKETS,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared plan of the two-sample drift statistics (`ks_drift`,
    `rank_sum_u`, `emd_profile`): both sides reduce to per-block
    (value, count) histogram partials in their map scans, ONE bucketed
    exchange merges the two histograms, and the driver receives one
    row per DISTINCT value (the bounded-distinct-domain contract) —
    data rows never move.  Returns value-sorted (v, ca, cb) int64
    arrays."""

    def _h(side: int):
        def _m(t: pa.Table) -> pa.Table:
            v = np_col(t, col).astype(np.int64)
            uv, cnt = np.unique(v, return_counts=True)
            ca = cnt.astype(np.int64) if side == 0 else \
                np.zeros(len(uv), np.int64)
            cb = cnt.astype(np.int64) if side == 1 else \
                np.zeros(len(uv), np.int64)
            return pa.table({"v": pa.array(uv, pa.int64()),
                             "ca": pa.array(ca, pa.int64()),
                             "cb": pa.array(cb, pa.int64())})
        return _m

    merged = grouped_pandas_agg(
        a.map_batches(_h(0), batch_format="pyarrow").union(
            b.map_batches(_h(1), batch_format="pyarrow")),
        keys=["v"], aggs={"ca": ("ca", "sum"), "cb": ("cb", "sum")},
        num_buckets=num_buckets).take_all()
    merged.sort(key=lambda r: r["v"])
    v = np.array([r["v"] for r in merged], np.int64)
    ca = np.array([r["ca"] for r in merged], np.int64)
    cb = np.array([r["cb"] for r in merged], np.int64)
    return v, ca, cb


def emd_profile(
    a: rd.Dataset,
    b: rd.Dataset,
    col: str,
    num_buckets: int = DEFAULT_BUCKETS,
) -> pa.Table:
    """EXACT 1-D Wasserstein-1 (earth-mover) drift profile over an
    integer column — the INTEGRATED distribution distance next to
    :func:`ks_drift`'s max deviation: W1 = ∫|F_a − F_b| dx.  Where KS
    flags the single worst point, W1 weights how much mass moved how
    far — the drift monitor that ranks a small shift across the whole
    range above a spike at one value.

    Everything is integer-exact: one output row per distinct value v
    with cumulative counts (cum_a, cum_b), the gap to the next
    distinct value, and contrib = |cum_a·n_b − cum_b·n_a| · gap (the
    cross-multiplied common-denominator step integral; the last value
    carries gap 0).  W1 = Σ contrib / (n_a·n_b) derives downstream as
    one float division.  Same scale shape as ks_drift
    (:func:`two_sample_hist`): per-block histogram partials, one
    bucketed exchange, driver folds the distinct-value-sized table."""
    v, ca, cb = two_sample_hist(a, b, col, num_buckets)
    na, nb = int(ca.sum()), int(cb.sum())
    if len(v) == 0:
        return pa.table({"v": pa.array([], pa.int64()),
                         "cum_a": pa.array([], pa.int64()),
                         "cum_b": pa.array([], pa.int64()),
                         "gap": pa.array([], pa.int64()),
                         "contrib": pa.array([], pa.int64())})
    gap = np.diff(v, append=v[-1]).astype(np.int64)
    assert na * nb < (1 << 62) and \
        na * nb * int(gap.max(initial=0)) < (1 << 62), \
        "EMD cross-multiply would overflow int64"
    cca = np.cumsum(ca)
    ccb = np.cumsum(cb)
    contrib = np.abs(cca * nb - ccb * na) * gap
    return pa.table({"v": pa.array(v, pa.int64()),
                     "cum_a": pa.array(cca, pa.int64()),
                     "cum_b": pa.array(ccb, pa.int64()),
                     "gap": pa.array(gap, pa.int64()),
                     "contrib": pa.array(contrib, pa.int64())})


def ks_drift(
    a: rd.Dataset,
    b: rd.Dataset,
    col: str,
    num_buckets: int = DEFAULT_BUCKETS,
) -> pa.Table:
    """EXACT two-sample Kolmogorov–Smirnov distance over an integer
    column — the distribution-drift monitor between two extracts
    (yesterday vs today, cohort A vs B): D = max_x |F_a(x) − F_b(x)|
    computed with NO float CDF anywhere, as the integer maximum over
    distinct values of |cum_a(x)·n_b − cum_b(x)·n_a| (cross-multiplied
    common denominator n_a·n_b — overflow-asserted).  Returns one row
    (d_num, n_a, n_b); D = d_num / (n_a·n_b).

    Plan: both sides reduce to (value, side) pre-combined counts in
    their map scans, ONE bucketed exchange merges the two histograms,
    and the driver folds one row per DISTINCT value (the bounded-
    domain histogram contract shared with exact_quantiles) — rows
    never move."""

    _, ca, cb = two_sample_hist(a, b, col, num_buckets)
    na, nb = int(ca.sum()), int(cb.sum())
    assert na * nb < (1 << 62), "KS cross-multiply would overflow int64"
    cca = np.cumsum(ca)
    ccb = np.cumsum(cb)
    d = int(np.abs(cca * nb - ccb * na).max(initial=0))
    return pa.table({"d_num": pa.array([d], pa.int64()),
                     "n_a": pa.array([na], pa.int64()),
                     "n_b": pa.array([nb], pa.int64())})


def rank_sum_u(
    a: rd.Dataset,
    b: rd.Dataset,
    col: str,
    num_buckets: int = DEFAULT_BUCKETS,
) -> pa.Table:
    """EXACT two-sample Mann–Whitney rank-sum statistic over an
    integer column — the nonparametric location-shift test next to
    :func:`ks_drift`'s shape test (same histogram-merge plan, same
    bounded-distinct-domain contract).  Returns one row of four
    int64s from which U, the tie-corrected variance and hence the
    normal-approximation z derive exactly:

    - ``u2_a`` = 2·U_a = Σ_v ca(v)·(2·cb(<v) + cb(v)) — doubled so
      half-credit ties stay integer (U_a counts pairs (x∈A, y∈B)
      with x > y plus half the x = y pairs);
    - ``n_a``, ``n_b``;
    - ``tie_sum`` = Σ_v (t_v³ − t_v) over combined per-value ties,
      the correction term in Var U = n_a·n_b/12·((n+1) − tie_sum/
      (n(n−1))).

    Only per-side (value, count) histogram entries move — one bucketed
    exchange merges the two histograms, the driver folds one row per
    distinct value."""

    _, ca, cb = two_sample_hist(a, b, col, num_buckets)
    na, nb = int(ca.sum()), int(cb.sum())
    n = na + nb
    assert na * nb < (1 << 61), "U cross-product would overflow int64"
    assert n < (1 << 21), "tie_sum n^3 would overflow int64"
    cb_below = np.cumsum(cb) - cb
    u2 = int((ca * (2 * cb_below + cb)).sum())
    t = ca + cb
    tie_sum = int((t * t * t - t).sum())
    return pa.table({"u2_a": pa.array([u2], pa.int64()),
                     "n_a": pa.array([na], pa.int64()),
                     "n_b": pa.array([nb], pa.int64()),
                     "tie_sum": pa.array([tie_sum], pa.int64())})


def pair_counting_ari(la: np.ndarray, lb: np.ndarray) -> tuple:
    """Exact pair-counting (adjusted) Rand pieces between two
    labelings of the same items: (N = C(n,2), Σ C(n_ij,2),
    Σ C(a_i,2), Σ C(b_j,2), ARI) — every sum an exact Python int,
    ARI one float division (None if the denominator degenerates,
    e.g. both labelings a single class).  Labels must be < 2³²
    (packed contingency key)."""
    la = np.asarray(la, np.int64)
    lb = np.asarray(lb, np.int64)
    assert len(la) == len(lb)
    if len(la):
        assert int(la.max()) < 2**32 and int(lb.max()) < 2**32

    def _p2(counts) -> int:
        return int(sum(int(c) * (int(c) - 1) // 2 for c in counts))

    key = la.astype(np.uint64) << np.uint64(32) | lb.astype(np.uint64)
    _, nij = np.unique(key, return_counts=True)
    _, na = np.unique(la, return_counts=True)
    _, nb = np.unique(lb, return_counts=True)
    n = len(la)
    N = n * (n - 1) // 2
    s_both, s_a, s_b = _p2(nij), _p2(na), _p2(nb)
    den = (s_a + s_b) * N - 2 * s_a * s_b
    ari = None if den == 0 else \
        float(2 * (s_both * N - s_a * s_b)) / float(den)
    return N, s_both, s_a, s_b, ari


def bottom_k_hashes(ds: rd.Dataset,
                    key_fn: Callable[[pa.Table], np.ndarray],
                    k: int) -> np.ndarray:
    """KMV / bottom-k distinct sketch: the k smallest splitmix64
    hash values over the distinct keys of ``key_fn(batch)`` — the
    mergeable-summary shape (Bar-Yossef et al.; the theta-sketch
    core): each block emits its local bottom-k (np.unique is already
    ascending, so the partial is a slice), the driver merges
    k × blocks values and re-slices.  splitmix64 is a bijection on
    uint64, so distinct hashes ⇔ distinct keys and the k-th smallest
    value V yields the unbiased estimate (k−1)·2⁶⁴/V.  Returns the
    sorted uint64 array (length ≤ k when the set is smaller)."""

    def _partial(b: pa.Table) -> pa.Table:
        h = np.unique(hash64(np.asarray(key_fn(b), np.int64)))[:k]
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    allh = np.array([r["h"] for r in parts], np.int64).view(np.uint64)
    return np.unique(allh)[:k]


def directed_reciprocity(edges: rd.Dataset, u_col: str = "u",
                         v_col: str = "v",
                         num_buckets: int = 64) -> pa.Table:
    """Edge reciprocity of a directed graph: the fraction of DISTINCT
    directed edges (u, v) whose reverse (v, u) is also present — the
    classic directed-network statistic (Garlaschelli–Loffredo).
    Input may contain duplicate edges; self-loops must already be
    absent.  Returns one row: (n_edges, n_recip, n_mutual_pairs,
    reciprocity) with the counts exact int64 and reciprocity the one
    float division n_recip/n_edges (NULL on an empty graph).

    Scale shape: ONE unordered-pair-hash bucketed exchange puts every
    copy of (u, v) AND its reverse (v, u) in the same bucket, so a
    single per-bucket pass does BOTH the global distinct (np.unique on
    the packed directed key) and the reverse-membership test
    (searchsorted of the swapped key against the sorted distinct
    keys); only two int64 partials leave each bucket.  Vertex ids
    must be < 2³² (packed key, asserted)."""

    def _key(b: pa.Table) -> np.ndarray:
        uu = np_col(b, u_col).astype(np.int64)
        vv = np_col(b, v_col).astype(np.int64)
        lo = np.minimum(uu, vv).astype(np.uint64)
        hi = np.maximum(uu, vv).astype(np.uint64)
        return ((lo << np.uint64(32)) | hi).view(np.int64)

    def _fold(grp: pa.Table) -> pa.Table:
        uu = np_col(grp, u_col).astype(np.int64)
        vv = np_col(grp, v_col).astype(np.int64)
        if len(uu):
            assert int(uu.max()) < 2**32 and int(vv.max()) < 2**32
        kd = np.unique((uu.astype(np.uint64) << np.uint64(32))
                       | vv.astype(np.uint64))
        rev = ((kd & np.uint64(0xFFFFFFFF)) << np.uint64(32)) \
            | (kd >> np.uint64(32))
        pos = np.searchsorted(kd, rev)
        hit = (pos < len(kd)) & (kd[np.minimum(pos, max(len(kd) - 1, 0))]
                                 == rev) if len(kd) else \
            np.zeros(0, bool)
        return pa.table({
            "n_edges": pa.array([len(kd)], pa.int64()),
            "n_recip": pa.array([int(hit.sum())], pa.int64()),
        })

    parts = hash_bucket_agg(edges, _key, _fold,
                            num_buckets=num_buckets).take_all()
    n_edges = sum(r["n_edges"] for r in parts)
    n_recip = sum(r["n_recip"] for r in parts)
    recip = None if n_edges == 0 else float(n_recip) / float(n_edges)
    return pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_recip": pa.array([n_recip], pa.int64()),
        "n_mutual_pairs": pa.array([n_recip // 2], pa.int64()),
        "reciprocity": pa.array([recip], pa.float64()),
    })


def euler_parity_fold(labels: np.ndarray, deg: np.ndarray) -> pa.Table:
    """Eulerian-traversal audit per component from aligned per-vertex
    (component label, degree) arrays: (label, n_vertices, n_odd,
    has_circuit, has_trail) with the classic feasibility rules —
    all degrees even ⇔ closed circuit exists (connected component
    assumed), ≤2 odd ⇔ open trail.  One stable sort + reduceat fold;
    the label/degree inputs come from the distributed CC + degree
    scans, so this runs on driver-small per-vertex arrays (the
    |V| ≪ |E| tier caveat documented at derive.py dense-vid)."""
    labels = np.asarray(labels, np.int64)
    deg = np.asarray(deg, np.int64)
    assert len(labels) == len(deg)
    if not len(labels):
        z = pa.array(np.zeros(0, np.int64), pa.int64())
        return pa.table({"label": z, "n_vertices": z, "n_odd": z,
                         "has_circuit": z, "has_trail": z})
    odd = (deg % 2).astype(np.int64)
    order = np.argsort(labels, kind="stable")
    lab_s, odd_s = labels[order], odd[order]
    starts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
    n_v = np.diff(np.r_[starts, len(lab_s)]).astype(np.int64)
    n_odd = (np.add.reduceat(odd_s, starts) if len(starts)
             else np.zeros(0, np.int64))
    return pa.table({
        "label": pa.array(lab_s[starts] if len(starts)
                          else np.zeros(0, np.int64), pa.int64()),
        "n_vertices": pa.array(n_v, pa.int64()),
        "n_odd": pa.array(n_odd, pa.int64()),
        "has_circuit": pa.array((n_odd == 0).astype(np.int64), pa.int64()),
        "has_trail": pa.array((n_odd <= 2).astype(np.int64), pa.int64()),
    })


def trimmed_sum(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    trim_num: int = 1,
    trim_den: int = 10,
    num_buckets: int = DEFAULT_BUCKETS,
) -> rd.Dataset:
    """Exact per-group trimmed aggregate — the robust mean's integer
    core: per key, drop the k = floor(n·trim_num/trim_den) smallest
    and k largest values BY RANK and return (key, n, k_trim, t_sum)
    where t_sum is the exact int64 sum of the surviving middle ranks.
    The trimmed mean t_sum/(n−2k) derives exactly; no float order
    statistic exists anywhere, so the result is layout/cluster-size
    invariant and SQL-reproducible.  Key may be string or integer
    (string keys group via per-table dictionary codes — hash
    collisions only co-locate, actual values define groups).

    Same bounded-value-domain histogram contract as exact_quantiles /
    ks_drift: blocks pre-combine to (key, value, count) rows, ONE
    bucketed exchange on the key lands each key's complete histogram,
    and the per-group kernel takes each value's rank-interval overlap
    with [k, n−k) — rows never move."""
    from .derive import _str_hash

    def _codes(t: pa.Table) -> tuple[pa.Array, np.ndarray]:
        col = t.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            return col, np.asarray(col, np.int64)
        return col, np.asarray(
            col.dictionary_encode().indices).astype(np.int64)

    def _key_fn(t: pa.Table) -> np.ndarray:
        col = t.column(key_col)
        if pa.types.is_integer(col.type):
            return np_col(t, key_col)
        return np.asarray(_str_hash(col)).astype(np.int64)

    def _hist(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key_col: t.column(key_col),
                             "v": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        col, kc = _codes(t)
        v = np_col(t, val_col).astype(np.int64)
        order = np.lexsort((v, kc))
        ks, vs = kc[order], v[order]
        starts = np.flatnonzero(
            np.r_[True, (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])])
        cnt = np.diff(np.r_[starts, len(ks)]).astype(np.int64)
        first = order[starts]
        return pa.table({key_col: col.take(pa.array(first)),
                         "v": pa.array(vs[starts], pa.int64()),
                         "c": pa.array(cnt, pa.int64())})

    def _fold(grp: pa.Table) -> pa.Table:
        col, kc = _codes(grp)
        v = np_col(grp, "v")
        c = np_col(grp, "c")
        order = np.lexsort((v, kc))
        k, v, c = kc[order], v[order], c[order]
        newkv = np.r_[True, (k[1:] != k[:-1]) | (v[1:] != v[:-1])]
        kvs = np.flatnonzero(newkv)
        cm = np.add.reduceat(c, kvs)
        km, vm = k[kvs], v[kvs]
        first = order[kvs]
        newk2 = np.r_[True, km[1:] != km[:-1]]
        g2 = np.flatnonzero(newk2)
        g2e = np.r_[g2[1:], len(km)]
        out_first, out_n, out_t, out_s = [], [], [], []
        for lo, hi in zip(g2, g2e):
            cc = cm[lo:hi]
            vv = vm[lo:hi]
            n = int(cc.sum())
            t = n * trim_num // trim_den
            cum = np.r_[np.int64(0), np.cumsum(cc)]
            take = (np.minimum(cum[1:], n - t)
                    - np.maximum(cum[:-1], t)).clip(min=0)
            out_first.append(int(first[lo]))
            out_n.append(n)
            out_t.append(t)
            out_s.append(int((take * vv).sum()))
        return pa.table({key_col: col.take(pa.array(out_first)),
                         "n": pa.array(out_n, pa.int64()),
                         "k_trim": pa.array(out_t, pa.int64()),
                         "t_sum": pa.array(out_s, pa.int64())})

    return hash_bucket_agg(
        ds.map_batches(_hist, batch_format="pyarrow"),
        _key_fn, _fold, num_buckets=num_buckets)


def contingency_chisq(
    ds: rd.Dataset,
    a_col: str,
    b_col: str,
) -> pa.Table:
    """Pearson chi-square independence audit over two bounded-
    cardinality categorical columns — the drift/bias screen that flags
    a dependence between, say, event type and time-of-day bucket.
    Emits the FULL |A|x|B| cross product (zero-count cells included:
    they carry expected mass) with exact int64 counts/marginals, the
    integer deviation dev = N*n_ab - n_a*n_b (the chi numerator before
    squaring, so the distributed result hashes exactly), and the cell
    chi contribution dev^2 / (N*n_a*n_b) as ONE fixed float expression
    emitted half-up 6dp — SQL-reproducible term for term.

    Scale shape: one streaming pass with per-block (a, b, count)
    partials (<= cells rows each, zero shuffles — the contingency
    table is bounded by construction, the operator's contract), folded
    driver-side; the cross product and marginals are driver math over
    the cells-sized table.  int64 guard: N * max(n_a) must stay under
    2^63 (asserted)."""
    sel = ds.select_columns([a_col, b_col])

    def _partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "a": t.column(a_col).to_pandas(),
            "b": t.column(b_col).to_pandas(),
        })
        g = df.groupby(["a", "b"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = sel.map_batches(_partial, batch_format="pyarrow").take_all()
    cells = pd.DataFrame(parts).groupby(["a", "b"], as_index=False)["n"].sum()
    n_tot = int(cells.n.sum())
    if n_tot == 0:
        return pa.table({
            a_col: pa.array([], pa.string()), b_col: pa.array([], pa.int64()),
            "n_ab": pa.array([], pa.int64()), "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()), "dev": pa.array([], pa.int64()),
            "cell_chi": pa.array([], pa.float64()),
        })
    na = cells.groupby("a", as_index=False)["n"].sum().rename(
        columns={"n": "n_a"})
    nb = cells.groupby("b", as_index=False)["n"].sum().rename(
        columns={"n": "n_b"})
    assert n_tot * int(na.n_a.max()) < (1 << 62), "N*n_a int64 guard"
    full = na.merge(nb, how="cross")
    full = full.merge(cells, on=["a", "b"], how="left")
    full["n"] = full.n.fillna(0).astype(np.int64)
    full = full.sort_values(["a", "b"]).reset_index(drop=True)
    n_ab = full.n.to_numpy(np.int64)
    n_a = full.n_a.to_numpy(np.int64)
    n_b = full.n_b.to_numpy(np.int64)
    dev = n_tot * n_ab - n_a * n_b
    d = dev.astype(np.float64)
    chi = (d * d) / (float(n_tot) * n_a.astype(np.float64)
                     * n_b.astype(np.float64))
    return pa.table({
        a_col: pa.array(full.a.to_numpy(object)),
        b_col: pa.array(full.b.to_numpy(np.int64), pa.int64()),
        "n_ab": pa.array(n_ab, pa.int64()),
        "n_a": pa.array(n_a, pa.int64()),
        "n_b": pa.array(n_b, pa.int64()),
        "dev": pa.array(dev, pa.int64()),
        "cell_chi": pa.array(np.floor(chi * 1e6 + 0.5) / 1e6,
                             pa.float64()),
    })


def count_sketch(ds: rd.Dataset, col: str, depth: int = 5,
                 width: int = 64) -> pa.Table:
    """Count-Sketch (Charikar, Chen & Farach-Colton 2002) over an
    int64 key column: row j folds ``c[j][s] = Σ sign_j(key)`` over the
    rows hashing to slot s, with slot = splitmix64(key + j·golden)
    mod width and sign = ±1 by the hash's top bit (one hash feeds
    both, the standard trick).  Where count-min's estimate is
    one-sided (always ≥ truth: collisions only ADD), the signed
    collisions here cancel in expectation, giving the UNBIASED
    two-sided estimator ``median_j sign_j(v)·c[j][slot_j(v)]`` with
    error ≈ √(F₂/width) per row — the right sketch when under- and
    over-estimates cost the same (feature hashing, heavy-hitter
    deltas).

    Scale shape mirrors cm_sketch: each block folds ONE depth×width
    int64 matrix (two bincounts per row — no per-key Python), driver
    adds block matrices, ZERO shuffle, mergeable by plain addition,
    layout/cluster-size invariant, SQL-reproducible through the
    shared SplitMix64 CTE chain.  Returns (j, slot, c) rows."""
    seeds = np.array([(j * _CM_SEED) % (1 << 64) for j in range(depth)],
                     np.uint64)

    def _partial(t: pa.Table) -> pa.Table:
        x = np_col(t, col).astype(np.int64).view(np.uint64)
        mat = np.zeros((depth, width), np.int64)
        with np.errstate(over="ignore"):
            for j in range(depth):
                h = hash64((x + seeds[j]).view(np.int64))
                slot = (h % np.uint64(width)).astype(np.int64)
                pos = (h >> np.uint64(63)).astype(bool)
                mat[j] = (np.bincount(slot[pos], minlength=width)
                          - np.bincount(slot[~pos], minlength=width))
        return pa.table({"csv": pa.array([mat.ravel().tobytes()],
                                         pa.large_binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    tot = np.zeros(depth * width, np.int64)
    for r in parts:
        tot += np.frombuffer(r["csv"], np.int64)
    jj = np.repeat(np.arange(depth, dtype=np.int64), width)
    ss = np.tile(np.arange(width, dtype=np.int64), depth)
    return pa.table({"j": pa.array(jj, pa.int64()),
                     "slot": pa.array(ss, pa.int64()),
                     "c": pa.array(tot, pa.int64())})


def cs_estimate(sketch: pa.Table, keys: np.ndarray, depth: int = 5,
                width: int = 64) -> np.ndarray:
    """Point-query the Count-Sketch: median over rows j of
    ``sign_j(key) · c[j][slot_j(key)]`` — exact middle element (keep
    depth ODD so no interpolation; matches SQL ``quantile_disc``)."""
    assert depth % 2 == 1, "odd depth keeps the median an exact element"
    c = np_col(sketch, "c").reshape(depth, width)
    ks = np.asarray(keys, np.int64).view(np.uint64)
    ests = np.zeros((depth, len(ks)), np.int64)
    with np.errstate(over="ignore"):
        for j in range(depth):
            h = hash64((ks + np.uint64((j * _CM_SEED) % (1 << 64)))
                       .view(np.int64))
            sign = np.where((h >> np.uint64(63)).astype(bool), 1, -1)
            ests[j] = sign * c[j, (h % np.uint64(width)).astype(np.int64)]
    return np.sort(ests, axis=0)[depth // 2]


def cm_inner_product(sk_a: pa.Table, sk_b: pa.Table, depth: int = 4,
                     width: int = 256) -> tuple[np.ndarray, int]:
    """Join-size estimation from two Count-Min sketches (Cormode &
    Muthukrishnan 2005, §4.2) — the query-optimizer cardinality
    primitive: |A ⋈ B on key| = Σ_v c_A(v)·c_B(v) is estimated by
    ``min_j  Σ_s a[j][s]·b[j][s]``.  Each per-row dot product
    over-counts by exactly the colliding cross terms (all
    non-negative), so every row upper-bounds the true size and the
    min errs by ≤ F1(A)·F1(B)/width in expectation — pick the width
    from the product of the stream masses, not from either alone.
    The sketches must share depth/width/seed (asserted by shape);
    both stay mergeable-by-addition, so per-partition sketches fold
    before the driver-side dot.  Returns (per-row dots, min)."""
    a = np_col(sk_a, "n").reshape(depth, width)
    b = np_col(sk_b, "n").reshape(depth, width)
    # Python-int fold: Σ a·b can exceed int64 on massive streams
    dots = np.array([sum(int(x) * int(y) for x, y in zip(a[j], b[j]))
                     for j in range(depth)], np.int64)
    return dots, int(dots.min())


def chao1_estimate(
    ds: rd.Dataset,
    col: str,
    frac: float,
    key_fn: Callable[[pa.Table], np.ndarray],
    seed: int = 42,
    num_buckets: int = DEFAULT_BUCKETS,
) -> pa.Table:
    """Distinct-count estimation from a SAMPLE — Chao1 (Chao 1984),
    the species-richness estimator: scan only a deterministic
    ``frac``-Bernoulli row sample, count d = distinct values seen,
    f1/f2 = values seen exactly once/twice, and estimate the FULL
    population's distinct count as ``d + f1(f1−1)/(2(f2+1))``
    (bias-corrected form; singletons flag the unseen mass).  The
    complement of HLL's shape: HLL reads every row with O(1) state,
    Chao1 reads frac·N rows — the right tool when the scan itself is
    the cost and a value-deterministic sample already exists for
    other stages.

    Scale shape: the keep rule is ``deterministic_sample``'s pure
    hash (layout/cluster invariant, SQL-replayable); sample value
    counts via ONE bucketed combine; d/f1/f2 fold as 4-int per-block
    partials over the counts table — the distinct-value table is
    never driver-materialized.  Output: one row (n_sample, d, f1,
    f2, chao1 half-up 6dp)."""
    import math

    # sample BEFORE projecting: key_fn may read row-identity columns
    # that the value column alone doesn't carry
    samp = deterministic_sample(ds, frac, key_fn, seed=seed)
    counts = int_value_counts(samp.select_columns([col]), col,
                              num_buckets=num_buckets)

    def _p(t: pa.Table) -> pa.Table:
        c = np_col(t, "count")
        return pa.table({
            "n": pa.array([int(c.sum())], pa.int64()),
            "d": pa.array([len(c)], pa.int64()),
            "f1": pa.array([int((c == 1).sum())], pa.int64()),
            "f2": pa.array([int((c == 2).sum())], pa.int64()),
        })

    n = d = f1 = f2 = 0
    for r in counts.map_batches(_p, batch_format="pyarrow").take_all():
        n += int(r["n"]); d += int(r["d"])
        f1 += int(r["f1"]); f2 += int(r["f2"])
    chao1 = math.floor(
        (float(d) + float(f1 * (f1 - 1)) / float(2 * (f2 + 1)))
        * 1e6 + 0.5) / 1e6
    return pa.table({
        "n_sample": pa.array([n], pa.int64()),
        "d": pa.array([d], pa.int64()),
        "f1": pa.array([f1], pa.int64()),
        "f2": pa.array([f2], pa.int64()),
        "chao1": pa.array([chao1], pa.float64()),
    })


def exact_heavy_hitters(
    ds: rd.Dataset,
    col: str,
    phi_den: int = 200,
    num_buckets: int = DEFAULT_BUCKETS,
) -> tuple[rd.Dataset, dict]:
    """EXACT heavy hitters (all values with count ≥ ⌈N/phi_den⌉)
    WITHOUT a full-stream shuffle — the two-pass screen-then-verify
    shape that replaces `groupby(everything)` at 100 TB:

    Pass 1 (zero shuffle): each block emits its row count and the keys
    that are LOCALLY heavy (block count ≥ block_len/phi_den).  Weighted
    pigeonhole makes the screen SOUND at any block layout: a globally
    φ-heavy key must be φ-heavy in at least one block, so no false
    negative is possible; each block emits ≤ phi_den keys, so the
    driver folds ≤ blocks·phi_den candidates (not the key universe).
    Pass 2: the candidate set broadcasts once (ray.put), a searchsorted
    membership filter keeps ONLY candidate rows — the exchange moves
    the heavy keys' rows, never the long tail — and an exact
    value-count prunes the screen's false positives against the exact
    integer threshold θ = ⌈N/phi_den⌉ = (N + phi_den − 1)//phi_den.

    The OUTPUT is therefore exactly `HAVING count(*) ≥ θ` regardless
    of layout, even though the candidate set itself may vary with it.
    On near-uniform streams the screen passes everything (there is
    nothing to prune — every key is near-heavy); on the Zipf streams
    heavy-hitter queries exist for, it discards the tail at the block
    boundary.  Returns (result dataset (value, count), info dict with
    n / threshold / n_candidates)."""
    import ray as _ray

    def _screen(batch: pa.Table) -> pa.Table:
        v = np_col(batch, col).astype(np.int64)
        uniq, cnt = np.unique(v, return_counts=True)
        # local count >= len/phi_den  <=>  cnt * phi_den >= len
        heavy = uniq[cnt * phi_den >= len(v)]
        # tag row: is_n=1 carries the block length (a value of -1 in
        # the data must not collide with any sentinel)
        return pa.table({
            "k": pa.array(np.r_[np.int64(0), heavy], pa.int64()),
            "n": pa.array(np.r_[np.int64(len(v)),
                                np.zeros(len(heavy), np.int64)],
                          pa.int64()),
            "is_n": pa.array(np.r_[np.int64(1),
                                   np.zeros(len(heavy), np.int64)],
                             pa.int64()),
        })

    n_total, cands = 0, []
    for r in ds.map_batches(_screen, batch_format="pyarrow").take_all():
        if r["is_n"]:
            n_total += int(r["n"])
        else:
            cands.append(int(r["k"]))
    cand = np.unique(np.asarray(cands, np.int64))
    theta = (n_total + phi_den - 1) // phi_den
    cand_ref = _ray.put(cand)

    def _member(batch: pa.Table) -> pa.Table:
        c = _ray.get(cand_ref)
        v = np_col(batch, col).astype(np.int64)
        pos = np.searchsorted(c, v)
        ok = (pos < len(c)) & (c[np.minimum(pos, max(len(c) - 1, 0))]
                               == v) if len(c) else np.zeros(len(v), bool)
        return batch.take(pa.array(np.flatnonzero(ok)))

    counts = int_value_counts(
        ds.map_batches(_member, batch_format="pyarrow")
          .select_columns([col]),
        col, num_buckets=num_buckets)

    def _prune(t: pa.Table) -> pa.Table:
        keep = np_col(t, "count") >= theta
        return t.take(pa.array(np.flatnonzero(keep)))

    out = counts.map_batches(_prune, batch_format="pyarrow")
    return out, {"n": n_total, "theta": theta,
                 "n_candidates": int(len(cand))}


def sorted_run_stats(
    ds: rd.Dataset,
    order_col: str,
    value_cols: list[str],
    *,
    n_parts: int = 16,
    key_fn: Callable[[pa.Table], np.ndarray] | None = None,
    sample_frac: float = 0.1,
    num_buckets: int = DEFAULT_BUCKETS,
) -> pa.Table:
    """Storage-encoding advisor statistics: for each ``value_cols``
    column, the run count under the GLOBAL ``order_col`` total order
    (``order_col`` must be int64 and unique — ties would make runs
    ambiguous), plus n and ndv — the sufficient statistics for the
    plain / dictionary / run-length encoding decision every columnar
    writer makes.

    The global-order run count is computed WITHOUT a global sort
    gather: one deterministic range partition on ``order_col``, a
    per-partition sort counting INTERNAL value changes, and a driver
    stitch of P boundary rows (each partition's first/last value) that
    merges runs spanning partition borders — the order-statistic
    analog of the parallel prefix trick; only 2·P boundary values and
    P partial counts reach the driver.  ndv per column rides one
    bucketed distinct combine."""
    if key_fn is None:
        key_fn = lambda b: np_col(b, order_col)
    routed, _ = range_partition(ds, order_col, n_parts, key_fn,
                                sample_frac=sample_frac)

    def _part_stats(grp: pa.Table) -> pa.Table:
        # a hash bucket may hold SEVERAL part_ids — sort by
        # (part_id, order) and emit one row set per part
        pids = np_col(grp, "part_id")
        order = np.lexsort((np_col(grp, order_col), pids))
        pids_s = pids[order]
        starts = np.flatnonzero(np.r_[True, pids_s[1:] != pids_s[:-1]])
        ends = np.r_[starts[1:], len(pids_s)]
        o_pid, o_col, o_runs, o_f, o_l, o_n = [], [], [], [], [], []
        for st, en in zip(starts, ends):
            seg = order[st:en]
            for c in value_cols:
                v = np_col(grp, c)[seg]
                o_pid.append(int(pids_s[st]))
                o_col.append(c)
                o_runs.append(1 + int((v[1:] != v[:-1]).sum())
                              if len(v) else 0)
                o_f.append(int(v[0]) if len(v) else 0)
                o_l.append(int(v[-1]) if len(v) else 0)
                o_n.append(len(v))
        return pa.table({
            "part_id": pa.array(o_pid, pa.int64()),
            "col": pa.array(o_col, pa.string()),
            "runs": pa.array(o_runs, pa.int64()),
            "first_v": pa.array(o_f, pa.int64()),
            "last_v": pa.array(o_l, pa.int64()),
            "n": pa.array(o_n, pa.int64()),
        })

    parts = hash_bucket_agg(
        routed, lambda b: np_col(b, "part_id"), _part_stats,
        num_buckets=min(num_buckets, n_parts + 1)).take_all()
    by_col: dict[str, list] = {c: [] for c in value_cols}
    for r in parts:
        by_col[r["col"]].append(
            (int(r["part_id"]), int(r["runs"]), int(r["first_v"]),
             int(r["last_v"]), int(r["n"])))

    ndv = {}
    for c in value_cols:
        ndv[c] = int(int_value_counts(
            ds.select_columns([c]), c,
            num_buckets=num_buckets).count())

    names, n_out, ndv_out, runs_out = [], [], [], []
    for c in value_cols:
        rows = [r for r in sorted(by_col[c]) if r[4] > 0]
        total_n = sum(r[4] for r in rows)
        runs = sum(r[1] for r in rows)
        # stitch: a border where the next NON-EMPTY partition starts
        # with the value the previous ended on merges two runs
        # (empty partitions are skipped so their neighbors stitch)
        for (_, _, _, la, _), (_, _, fb, _, _) in zip(rows, rows[1:]):
            if la == fb:
                runs -= 1
        names.append(c)
        n_out.append(total_n)
        ndv_out.append(ndv[c])
        runs_out.append(runs)
    return pa.table({
        "col": pa.array(names, pa.string()),
        "n": pa.array(n_out, pa.int64()),
        "ndv": pa.array(ndv_out, pa.int64()),
        "runs": pa.array(runs_out, pa.int64()),
    })


def _popcount64(a: np.ndarray) -> int:
    """Total popcount of a uint64 array (numpy<2 has no bitwise_count;
    unpackbits over the byte view is endian-safe for a TOTAL count)."""
    if not len(a):
        return 0
    return int(np.unpackbits(a.view(np.uint8)).astype(np.int64).sum())


def bitmap_index_counts(
    ds: rd.Dataset,
    key_col: str,
    preds: "list[tuple[str, Callable[[pa.Table], np.ndarray]]]",
    num_buckets: int = DEFAULT_BUCKETS,
) -> dict:
    """Bitmap-index build + multi-predicate AND probe in ONE exchange —
    the storage-layer path a bitmap-indexed warehouse runs for
    ``WHERE p1 AND p2 [AND ...]``: each predicate's qualifying keys
    pack into 64-bit WORDS (word = key >> 6, bit = key & 63), per-block
    partial words OR-fold inside the block (lexsort + or.reduceat, no
    per-row Python), one word-bucketed shuffle ORs the partials, and
    the probe is a word-wise AND + popcount — WORDS move through the
    exchange, never rows, so the cost is |keyspace|/64 regardless of
    row count or predicate selectivity.  Keys must be unique non-neg
    int64 (the bitmap position domain).  Returns ``{name: count}`` per
    predicate plus ``"__and__"`` for the conjunction."""
    names = [n for n, _ in preds]
    P = len(preds)

    def _pack(batch: pa.Table) -> pa.Table:
        k = np_col(batch, key_col)
        cols: dict[str, np.ndarray] = {}
        allw: list[np.ndarray] = []
        per = []
        for _, fn in preds:
            m = fn(batch)
            kk = k[m]
            w = kk >> np.int64(6)
            b = np.uint64(1) << (kk & np.int64(63)).astype(np.uint64)
            order = np.argsort(w, kind="stable")
            w, b = w[order], b[order]
            starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
            wu = w[starts] if len(w) else w
            bu = (np.bitwise_or.reduceat(b, starts)
                  if len(w) else b.astype(np.uint64))
            per.append((wu, bu))
            allw.append(wu)
        words = np.unique(np.concatenate(allw)) if allw else np.zeros(0, np.int64)
        cols["word"] = words
        for i, (wu, bu) in enumerate(per):
            out = np.zeros(len(words), np.uint64)
            out[np.searchsorted(words, wu)] = bu
            cols[f"b{i}"] = out
        return pa.table(
            {"word": pa.array(cols["word"], pa.int64()),
             **{f"b{i}": pa.array(cols[f"b{i}"].view(np.int64), pa.int64())
                for i in range(P)}})

    def _probe(grp: pa.Table) -> pa.Table:
        w = np_col(grp, "word")
        order = np.argsort(w, kind="stable")
        starts = np.flatnonzero(
            np.r_[True, w[order][1:] != w[order][:-1]])
        acc = None
        counts = []
        for i in range(P):
            b = np_col(grp, f"b{i}").view(np.uint64)[order]
            bu = (np.bitwise_or.reduceat(b, starts)
                  if len(b) else b)
            counts.append(_popcount64(bu))
            acc = bu if acc is None else (acc & bu)
        nand = _popcount64(acc) if acc is not None else 0
        return pa.table(
            {"n_and": pa.array([nand], pa.int64()),
             **{f"n{i}": pa.array([counts[i]], pa.int64())
                for i in range(P)}})

    packed = ds.map_batches(_pack, batch_format="pyarrow")
    out = {n: 0 for n in names}
    out["__and__"] = 0
    for r in hash_bucket_agg(
            packed, lambda b: np_col(b, "word"), _probe,
            num_buckets=num_buckets).take_all():
        out["__and__"] += r["n_and"]
        for i, n in enumerate(names):
            out[n] += r[f"n{i}"]
    return out


def nra_topk(
    a: rd.Dataset,
    b: rd.Dataset,
    key_col: str,
    val_col: str,
    k: int,
    batch_rows: int = 256,
) -> tuple:
    """Fagin-family NRA (No-Random-Access) top-k aggregation join —
    the classic middleware algorithm (Fagin/Lotem/Naor) for "top-k by
    combined score" over two ranked lists WITHOUT scanning either to
    the bottom: both inputs (key, val ≥ 0; one row per key) are
    consumed in descending-score order via streaming sorted access
    (``iter_batches`` on a sorted Dataset pulls blocks lazily — the
    unscanned tail never reaches the driver), partial sums maintain
    per-key [lower, upper] bounds (upper adds the list's last-seen
    score for the unseen side; unseen keys bound by lastA + lastB),
    and the scan STOPS as soon as the provisional top-k's exact
    scores provably dominate every other bound — with ties broken
    (score desc, key asc) only between fully-resolved keys, so the
    result equals the full-scan answer exactly.  Returns
    ``(rows, scanned_a, scanned_b)`` where rows is the top-k list of
    ``(key, combined, va, vb)``."""
    sa = a.sort(val_col, descending=True).iter_batches(
        batch_size=batch_rows, batch_format="pyarrow")
    sb = b.sort(val_col, descending=True).iter_batches(
        batch_size=batch_rows, batch_format="pyarrow")

    seen: dict[int, list] = {}  # key → [va|None, vb|None]
    last = [None, None]  # last-seen score per stream (None until first)
    done = [False, False]
    iters = [iter(sa), iter(sb)]
    scanned = [0, 0]

    def _advance(side: int) -> None:
        try:
            batch = next(iters[side])
        except StopIteration:
            done[side] = True
            last[side] = 0
            return
        kk = np_col(batch, key_col)
        vv = np_col(batch, val_col)
        scanned[side] += len(kk)
        for i in range(len(kk)):
            ent = seen.setdefault(int(kk[i]), [None, None])
            if ent[side] is not None:
                raise ValueError(
                    f"nra_topk: key {int(kk[i])} appears more than once in "
                    f"stream {side}; inputs must be one row per key")
            ent[side] = int(vv[i])
        if len(vv):
            last[side] = int(vv[-1])

    def _final() -> list | None:
        if last[0] is None or last[1] is None:
            return None
        resolved = []
        open_upper = -1
        for ky, (va, vb) in seen.items():
            # an exhausted stream resolves its missing entries to 0
            ea = va if va is not None else (0 if done[0] else None)
            eb = vb if vb is not None else (0 if done[1] else None)
            if ea is not None and eb is not None:
                resolved.append((ea + eb, -ky, ea, eb))
            else:
                up = ((ea if ea is not None else last[0])
                      + (eb if eb is not None else last[1]))
                open_upper = max(open_upper, up)
        if not (done[0] and done[1]):
            open_upper = max(open_upper, last[0] + last[1])
        resolved.sort(reverse=True)
        if done[0] and done[1]:
            # full exhaustion: everything is exact — return what exists
            # even when fewer than k keys were ever seen
            return [(-nk, s, va, vb) for s, nk, va, vb in resolved[:k]]
        if len(resolved) < k:
            return None
        kth = resolved[k - 1][0]
        # strict domination: no unresolved/unseen key can reach the
        # top-k, and no tie with an unresolved bound remains
        if kth > open_upper:
            return [(-nk, s, va, vb) for s, nk, va, vb in resolved[:k]]
        return None

    side = 0
    while True:
        res = _final()
        if res is not None:
            return res, scanned[0], scanned[1]
        if done[0] and done[1]:
            return (_final() or []), scanned[0], scanned[1]
        # alternate, skipping exhausted streams
        for _ in range(2):
            if not done[side]:
                _advance(side)
                side = 1 - side
                break
            side = 1 - side
