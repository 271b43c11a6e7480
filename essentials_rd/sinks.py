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
import ray
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


@ray.remote
def _copart_merge(fa: str, fb: str | None, on: list[str],
                  how: str) -> pa.Table:
    ta = pq.read_table(fa)
    if fb is None:  # anti join, right partition empty: keep everything
        return ta
    from .ops import _pd_merge

    out = _pd_merge(ta.to_pandas(), pq.read_table(fb).to_pandas(), on, how)
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata()


def copartitioned_join(
    dir_a: str,
    dir_b: str,
    num_partitions: int,
    on: str | list[str],
    how: str = "inner",
) -> rd.Dataset:
    """ZERO-shuffle join over two tables that share the partitioned
    sink's storage layout — the bucketed-layout-reuse pattern that at
    100 TB replaces the join's all-to-all exchange entirely: both dirs
    were written by ``write_partitioned`` with the same key semantics
    and partition count, so the identical ``splitmix64(key) % P``
    routing guarantees partition p of A can only ever match partition
    p of B.  Each pair merges in ONE Ray task that reads exactly its
    two files (a lost task retries per-partition; nothing upstream
    re-runs), and the result streams back as a Dataset built from the
    per-partition Arrow refs.

    ``how``: inner / semi / anti (the shapes that need no right-side
    schema when a right partition is absent).  Misaligned layouts are
    the one failure mode — P is validated against both dirs' maximum
    finished-partition id, and key-routing agreement is the caller's
    contract exactly as it is for any co-partitioned storage system.
    """
    on = [on] if isinstance(on, str) else list(on)
    assert how in ("inner", "semi", "anti"), how
    if len(finished_partitions(dir_a, num_partitions)) == 0:
        raise FileNotFoundError(f"no finished partitions under {dir_a}")
    refs = []
    for p in range(num_partitions):
        fa = os.path.join(_part_dir(dir_a, p), "data.parquet")
        fb = os.path.join(_part_dir(dir_b, p), "data.parquet")
        if not os.path.exists(fa):
            continue  # no left rows routed here: empty for all hows
        if not os.path.exists(fb):
            if how == "anti":  # empty right: whole left partition survives
                refs.append(_copart_merge.remote(fa, None, on, how))
            continue  # inner/semi: empty
        refs.append(_copart_merge.remote(fa, fb, on, how))
    if not refs:
        return rd.from_arrow(pq.read_schema(os.path.join(
            _part_dir(dir_a, int(finished_partitions(
                dir_a, num_partitions)[0])), "data.parquet")).empty_table())
    return rd.from_arrow_refs(refs)


def write_sorted(
    ds: rd.Dataset,
    out_dir: str,
    by: str,
    key_fn,
    num_partitions: int,
    *,
    sample_frac: float = 0.1,
    tie_cols: list[str] | None = None,
) -> tuple[pa.Table, np.ndarray]:
    """GLOBALLY SORTED partitioned output — the external-sort /
    terasort layout: equi-depth range partition on ``by`` (the
    engine's deterministic sampler + exact quantile bounds, so the
    same layout at any cluster size), ONE exchange routing each row
    to its range, and a per-partition vectorized sort before the
    atomic write.  Reading partitions p0 < p1 < … back in order
    yields the fully sorted table, but no task ever held more than
    one partition — the shape that sorts 100 TB with bounded worker
    memory.  Returns (receipts, bounds).  Resumable: finished
    partitions are never rewritten (deterministic routing means a
    re-run reproduces identical contents); unlike write_partitioned
    the re-run still pays the routing exchange, just not the sorts
    and writes — range routing needs the bounds pass either way."""
    from .ops import range_partition

    routed, bounds = range_partition(ds, by, num_partitions, key_fn,
                                     sample_frac=sample_frac)
    ties = tie_cols or []

    def _sort(grp: pa.Table) -> pa.Table:
        keys = [np_col(grp, c) for c in reversed(ties)]
        order = np.lexsort((*keys, np_col(grp, by)))
        return grp.take(pa.array(order)).drop_columns(["part_id"])

    os.makedirs(out_dir, exist_ok=True)
    done = set(finished_partitions(out_dir, num_partitions).tolist())

    def _write(grp: pa.Table) -> pa.Table:
        p = int(np_col(grp, "part_id")[0])
        if p in done:
            return pa.table({"part": pa.array([p], pa.int64()),
                             "rows": pa.array([-1], pa.int64()),
                             "skipped": pa.array([True], pa.bool_())})
        t = _sort(grp)
        d = _part_dir(out_dir, p)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(d, "data.parquet"))
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")
        return pa.table({"part": pa.array([p], pa.int64()),
                         "rows": pa.array([t.num_rows], pa.int64()),
                         "skipped": pa.array([False], pa.bool_())})

    receipts = (routed.groupby("part_id")
                .map_groups(_write, batch_format="pyarrow"))
    out = pa.Table.from_pylist(
        receipts.take_all(),
        schema=pa.schema([("part", pa.int64()), ("rows", pa.int64()),
                          ("skipped", pa.bool_())])).sort_by("part")
    return out, bounds


def read_range_zonemap(
    out_dir: str,
    num_partitions: int,
    col: str,
    lo: int,
    hi: int,
) -> tuple[rd.Dataset | None, int]:
    """Zone-map-pruned range scan over a partitioned sink dir: each
    partition's Parquet FOOTER min/max statistics (written free by
    every Parquet writer) decide driver-side whether the file can
    contain rows with ``lo <= col <= hi`` — only qualifying files are
    opened, the rest never produce a read task.  Over a
    ``write_sorted`` layout the ranges are disjoint, so a selective
    range query opens O(1) of the P files; over an unsorted layout it
    degrades gracefully to a full scan.  Returns (dataset-or-None,
    n_files_opened); the exact row filter still applies inside the
    scan (footer stats are a superset guarantee)."""
    import pyarrow.compute as pc

    paths = []
    for p in finished_partitions(out_dir, num_partitions):
        f = os.path.join(_part_dir(out_dir, int(p)), "data.parquet")
        md = pq.read_metadata(f)
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            paths.append(f)
    if not paths:
        return None, 0
    ds = rd.read_parquet(paths)
    ds = ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t.column(col), lo),
                    pc.less_equal(t.column(col), hi))),
        batch_format="pyarrow")
    return ds, len(paths)


def _morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Bit-interleave two non-negative <2^31 int vectors into the
    Morton / Z-order value (x gets even bits) — int64, always ≥ 0."""

    def _spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64) & np.uint64((1 << 31) - 1)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    assert ((x >= 0).all() and (y >= 0).all()
            and (x < 1 << 31).all() and (y < 1 << 31).all()), \
        "morton2 needs values in [0, 2^31)"
    return (_spread(x) | (_spread(y) << np.uint64(1))).view(np.int64)


def write_zordered(
    ds: rd.Dataset,
    out_dir: str,
    x: str,
    y: str,
    key_fn,
    num_partitions: int,
    *,
    sample_frac: float = 0.1,
) -> tuple[pa.Table, np.ndarray]:
    """Z-ORDER (Morton-curve) clustered layout — MULTI-dimensional
    data skipping: rows sort by the bit-interleave of (x, y), so each
    written file covers a small square-ish region of the plane and its
    footer min/max on BOTH columns become tight 2-D bounding boxes; a
    box query then prunes with read_box_zonemap the way a 1-D range
    prunes the write_sorted layout.  Implementation is exactly
    write_sorted on the derived z column (same deterministic bounds,
    same atomic resumable sink); z stays in the files — it is the
    clustering key and costs 8 bytes a row."""
    import pyarrow.compute as _pc  # noqa: F401

    def _stamp_z(t: pa.Table) -> pa.Table:
        z = _morton2(np_col(t, x).astype(np.int64),
                     np_col(t, y).astype(np.int64))
        return t.append_column("z", pa.array(z, pa.int64()))

    return write_sorted(ds.map_batches(_stamp_z, batch_format="pyarrow"),
                        out_dir, "z", key_fn, num_partitions,
                        sample_frac=sample_frac)


def read_box_zonemap(
    out_dir: str,
    num_partitions: int,
    x: str,
    y: str,
    x_lo: int, x_hi: int, y_lo: int, y_hi: int,
) -> tuple[rd.Dataset | None, int]:
    """2-D box scan with footer-stats pruning on BOTH columns: a file
    is opened only if its (x, y) bounding box intersects the query
    box.  Over a z-ordered layout boxes are tight, so selective box
    queries open few files; over a row-hash layout every file spans
    the whole plane and this degrades to a full scan."""
    import pyarrow.compute as pc

    def _minmax(md, col):
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        return lo, hi

    paths = []
    for p in finished_partitions(out_dir, num_partitions):
        f = os.path.join(_part_dir(out_dir, int(p)), "data.parquet")
        md = pq.read_metadata(f)
        xl, xh = _minmax(md, x)
        yl, yh = _minmax(md, y)
        if (xl is None or (xh >= x_lo and xl <= x_hi)) and \
           (yl is None or (yh >= y_lo and yl <= y_hi)):
            paths.append(f)
    if not paths:
        return None, 0
    ds = rd.read_parquet(paths)
    ds = ds.map_batches(
        lambda t: t.filter(pc.and_(
            pc.and_(pc.greater_equal(t.column(x), x_lo),
                    pc.less_equal(t.column(x), x_hi)),
            pc.and_(pc.greater_equal(t.column(y), y_lo),
                    pc.less_equal(t.column(y), y_hi)))),
        batch_format="pyarrow")
    return ds, len(paths)


@ray.remote
def _compact_shard(
    out_dir: str, shard: int, pieces: list[tuple[str, int, int]]
) -> dict:
    """Write one output shard from its (file, row_lo, row_hi) pieces —
    atomic temp-rename + _SUCCESS, same crash contract as
    write_partitioned."""
    tables = []
    for path, lo, hi in pieces:
        t = pq.read_table(path)
        tables.append(t.slice(lo, hi - lo))
    out = pa.concat_tables(tables)
    dest = os.path.join(out_dir, f"shard_{shard:05d}.parquet")
    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
    pq.write_table(out, tmp)
    os.replace(tmp, dest)
    with open(dest + "._SUCCESS", "w") as f:
        f.write("ok")
    return {"shard": shard, "n_rows": out.num_rows,
            "n_inputs": len(pieces)}


def compact_small_files(
    in_dir: str,
    out_dir: str,
    target_rows: int,
    *,
    skip_finished: bool = True,
) -> pa.Table:
    """Small-file compaction — the table-maintenance operator every
    long-lived 100-TB lake needs: ``ds.write_parquet`` emits one file
    per block, so a streamed job leaves thousands of KB-sized files
    whose per-file open/footer cost then dominates every later scan.
    This rewrites ``in_dir``'s parquet files into
    ``out_dir/shard_%05d.parquet`` of exactly ``target_rows`` rows
    each (last shard takes the remainder) in the DETERMINISTIC global
    order (file name asc, row position) — so the result is a pure
    function of the input tree, reproducible and diffable.

    Planning reads only parquet FOOTERS (row counts) driver-side —
    O(#files) metadata, the very quantity being fixed; row data moves
    only inside per-shard Ray tasks, each reading just the files its
    global row range touches (an input file spanning a shard boundary
    is sliced, not re-read whole).  Raw tasks rather than Dataset ops
    because a shard is an explicit (file, row-range) list — exactly
    the semantics repartition() does not promise.  Each shard commits
    atomically (temp + rename + ``_SUCCESS``); a rerun with
    ``skip_finished`` rewrites only missing shards.  Returns a receipt
    table (shard, n_rows, n_inputs, skipped)."""
    assert target_rows > 0
    files = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    counts = [pq.read_metadata(f).num_rows for f in files]
    total = int(np.sum(counts, dtype=np.int64))
    os.makedirs(out_dir, exist_ok=True)
    n_shards = max(1, -(-total // target_rows))
    # global row offsets per file
    offs = np.r_[np.int64(0), np.cumsum(counts, dtype=np.int64)]
    receipts, futs = [], []
    for s in range(n_shards):
        dest = os.path.join(out_dir, f"shard_{s:05d}.parquet")
        if skip_finished and os.path.exists(dest + "._SUCCESS"):
            receipts.append({"shard": s, "n_rows": -1, "n_inputs": 0,
                             "skipped": True})
            continue
        glo = s * target_rows
        ghi = min(total, (s + 1) * target_rows)
        pieces = []
        first = int(np.searchsorted(offs, glo, side="right") - 1)
        for i in range(first, len(files)):
            if offs[i] >= ghi:
                break
            lo = max(glo, int(offs[i])) - int(offs[i])
            hi = min(ghi, int(offs[i + 1])) - int(offs[i])
            if hi > lo:
                pieces.append((files[i], lo, hi))
        futs.append(_compact_shard.remote(out_dir, s, pieces))
    for r in ray.get(futs):
        receipts.append({**r, "skipped": False})
    receipts.sort(key=lambda r: r["shard"])
    return pa.table({
        "shard": pa.array([r["shard"] for r in receipts], pa.int64()),
        "n_rows": pa.array([r["n_rows"] for r in receipts], pa.int64()),
        "n_inputs": pa.array([r["n_inputs"] for r in receipts], pa.int64()),
        "skipped": pa.array([r["skipped"] for r in receipts], pa.bool_()),
    })


# ---------------------------------------------------------------------------
# Versioned log: snapshot + delta commits + as-of-version reads
# ---------------------------------------------------------------------------

_MANIFEST = "_manifest.json"


def _read_manifest(out_dir: str) -> dict:
    import json

    with open(os.path.join(out_dir, _MANIFEST)) as f:
        return json.load(f)


def _write_manifest(out_dir: str, manifest: dict) -> None:
    import json

    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))


def versioned_log_init(
    ds: rd.Dataset,
    out_dir: str,
    key_fn,
    num_partitions: int = 8,
) -> pa.Table:
    """Start a versioned table log (the delta-lake/iceberg shape on
    plain partitioned Parquet): version 0 is the base snapshot,
    written through the resumable partitioned sink, and a JSON
    manifest — replaced ATOMICALLY on every commit, so readers always
    see a complete version list — records the chain.  Commits append
    delta directories (``versioned_log_commit``); any historical
    snapshot reconstructs with ONE key co-shuffle (``read_version``).
    Returns the base write receipt."""
    os.makedirs(out_dir, exist_ok=True)
    receipt = write_partitioned(
        ds, os.path.join(out_dir, "v00000"), key_fn, num_partitions)
    _write_manifest(out_dir, {"versions": [
        {"version": 0, "dir": "v00000", "num_partitions": num_partitions},
    ]})
    return receipt


def versioned_log_commit(
    changes: rd.Dataset,
    out_dir: str,
    key_fn,
    num_partitions: int = 8,
) -> int:
    """Append one delta version: ``changes`` carries the snapshot
    schema plus a string ``op`` column ('U' upsert / 'D' delete); the log
    stamps the new version number as the change sequence (``seq``)
    while writing — sequencing belongs to the log, not the producer.
    The delta is itself a partitioned resumable write; the manifest
    swap is the atomic commit point (a crash before it leaves an
    orphan directory, never a half-visible version).  Keys must be
    unique within one commit (merge semantics would be ambiguous).
    Returns the committed version number."""
    manifest = _read_manifest(out_dir)
    version = manifest["versions"][-1]["version"] + 1
    dname = f"v{version:05d}"
    seq = np.int64(version)

    def _stamp(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "seq", pa.array(np.full(batch.num_rows, seq), pa.int64()))

    write_partitioned(
        changes.map_batches(_stamp, batch_format="pyarrow"),
        os.path.join(out_dir, dname), key_fn, num_partitions)
    manifest["versions"].append(
        {"version": version, "dir": dname,
         "num_partitions": num_partitions})
    _write_manifest(out_dir, manifest)
    return version


def read_version(
    out_dir: str,
    version: int,
    key_col: str,
    op_col: str = "op",
) -> rd.Dataset:
    """Time-travel read: reconstruct the snapshot AS OF ``version`` by
    folding the base and every delta ≤ version through ONE
    ``merge_upsert`` (single key co-shuffle — per key the
    highest-version change wins, a winning 'D' removes the key, an
    upsert on an absent key re-inserts it).  Reads only the manifest's
    listed directories; later versions' files are never opened."""
    from .ops import merge_upsert

    manifest = _read_manifest(out_dir)
    versions = [v for v in manifest["versions"] if v["version"] <= version]
    if not versions or versions[0]["version"] != 0:
        raise ValueError(f"version {version} not in log {out_dir}")
    base = read_partitioned(
        os.path.join(out_dir, versions[0]["dir"]),
        versions[0]["num_partitions"])
    deltas = [
        read_partitioned(os.path.join(out_dir, v["dir"]),
                         v["num_partitions"])
        for v in versions[1:]
    ]
    if not deltas:
        return base
    changes = deltas[0]
    for d in deltas[1:]:
        changes = changes.union(d)
    return merge_upsert(base, changes, key_col, seq_col="seq",
                        op_col=op_col)


# ---------------------------------------------------------------------------
# Hive-style categorical partitioning: value-named directories + pruned reads
# ---------------------------------------------------------------------------


def _hive_dir(out_dir: str, col: str, value: str) -> str:
    # value is sanitized to a path token; when sanitization ALTERS the
    # value, a digest suffix keeps distinct values in distinct
    # directories ('x/y' and 'x y' must not clobber each other).  The
    # manifest in each dir carries the EXACT value so reads never
    # re-parse the path
    import hashlib as _hl

    v = str(value)
    token = "".join(ch if ch.isalnum() or ch in "-_." else "_"
                    for ch in v)
    if token != v:
        token += "-" + _hl.md5(v.encode()).hexdigest()[:8]
    return os.path.join(out_dir, f"{col}={token}")


def write_hive(
    ds: rd.Dataset,
    out_dir: str,
    part_col: str,
) -> pa.Table:
    """Categorical (hive-style) partitioned write: one
    ``col=value/`` directory per distinct value of ``part_col``, each
    holding one Parquet file + a ``_VALUE`` manifest with the exact
    (unsanitized) value and a ``_SUCCESS`` marker — the layout that
    lets a reader PRUNE BY DIRECTORY: a filtered read opens only the
    matching directories' footers, the other partitions' files are
    never touched (proven by test via corrupting them).  One bucketed
    exchange on the partition value routes complete values to their
    writer task; writes are atomic (tmp + os.replace).  Low-cardinality
    partition columns only — one directory per value."""
    os.makedirs(out_dir, exist_ok=True)
    from .windows import _str_or_int_key

    def _write(grp: pa.Table) -> pa.Table:
        col = grp.column(part_col)
        vals = col.to_pylist()
        import pandas as pd
        order = pd.Series(vals).groupby(vals, sort=True).indices
        out = []
        for v, idx in sorted(order.items(), key=lambda kv: str(kv[0])):
            sub = grp.take(pa.array(np.sort(idx)))
            d = _hive_dir(out_dir, part_col, v)
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
            pq.write_table(sub, tmp)
            os.replace(tmp, os.path.join(d, "data.parquet"))
            with open(os.path.join(d, "_VALUE"), "w") as f:
                f.write(str(v))
            with open(os.path.join(d, "_SUCCESS"), "w") as f:
                f.write("")
            out.append((str(v), sub.num_rows))
        return pa.table({
            "value": pa.array([o[0] for o in out], pa.string()),
            "rows": pa.array([o[1] for o in out], pa.int64()),
        })

    from .ops import hash_bucket_agg
    receipts = hash_bucket_agg(
        ds,
        lambda b: _str_or_int_key(b.column(part_col)).view(np.int64),
        _write,
        num_buckets=32,
    ).take_all()
    receipts.sort(key=lambda r: r["value"])
    return pa.table({
        "value": pa.array([r["value"] for r in receipts], pa.string()),
        "rows": pa.array([int(r["rows"]) for r in receipts], pa.int64()),
    })


def read_hive(
    out_dir: str,
    part_col: str,
    values: list[str] | None = None,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Partition-pruned read of a ``write_hive`` layout: list the
    ``col=value`` directories, keep only those whose ``_VALUE``
    manifest matches ``values`` (None = all), and read ONLY their
    files — non-matching partitions are never opened.  Raises if a
    requested value has no finished partition (silent empty would hide
    a missing write)."""
    import glob as _glob

    found = {}
    for d in sorted(_glob.glob(os.path.join(out_dir, f"{part_col}=*"))):
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            continue
        with open(os.path.join(d, "_VALUE")) as f:
            found[f.read()] = os.path.join(d, "data.parquet")
    if values is None:
        files = list(found.values())
    else:
        missing = [v for v in values if str(v) not in found]
        if missing:
            raise ValueError(
                f"no finished partition for values {missing} in {out_dir}")
        files = [found[str(v)] for v in values]
    return rd.read_parquet(files, columns=columns)


# ---------------------------------------------------------------------------
# Bloom sidecars: partition-skipping point lookups on NON-partition columns
# ---------------------------------------------------------------------------


@ray.remote
def _sidecar_words(path: str, col: str, k: int, n_bits: int) -> np.ndarray:
    from .ops import _bloom_positions

    t = pq.read_table(path, columns=[col])
    words = np.zeros((n_bits + 63) // 64, np.uint64)
    if t.num_rows:
        h = hash64(np_col(t, col).astype(np.int64))
        pos = _bloom_positions(h, k, n_bits).ravel()
        np.bitwise_or.at(words, pos >> 6,
                         np.uint64(1) << (pos & 63).astype(np.uint64))
    return words


def write_bloom_sidecars(
    out_dir: str,
    num_partitions: int,
    col: str,
    k: int = 8,
    n_bits: int = 8192,
) -> int:
    """Attach a per-partition Bloom sidecar over ``col`` to an existing
    ``write_partitioned`` layout — the parquet-bloom-filter idea at the
    partition level, for point lookups on a column the layout was NOT
    partitioned by (partition by orderkey, look up by custkey): each
    finished partition gets a ``_BLOOM-<col>`` file of n_bits/8 packed
    bytes built by one Ray task reading ONLY that column.  Returns the
    number of sidecars written."""
    parts = finished_partitions(out_dir, num_partitions)
    paths = [os.path.join(_part_dir(out_dir, int(p)), "data.parquet")
             for p in parts]
    refs = [_sidecar_words.remote(p, col, k, n_bits) for p in paths]
    for p, ref in zip(parts, refs):
        words = ray.get(ref)
        d = _part_dir(out_dir, int(p))
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(np.array([k, n_bits], np.int64).tobytes())
            f.write(words.tobytes())
        os.replace(tmp, os.path.join(d, f"_BLOOM-{col}"))
    return len(paths)


def read_partitioned_bloom(
    out_dir: str,
    num_partitions: int,
    col: str,
    value: int,
) -> tuple[rd.Dataset | None, int, int]:
    """Point lookup through the sidecars: probe every partition's tiny
    ``_BLOOM-<col>`` (driver-side, n_bits/8 bytes each — the files
    themselves stay closed), open ONLY bloom-positive partitions, and
    filter exactly on ``col == value``.  No false negatives (every
    partition holding the value probes positive by construction);
    false positives only cost an extra file read.  Returns (dataset or
    None when every partition is skipped, n_opened, n_skipped)."""
    from .ops import _bloom_positions

    parts = finished_partitions(out_dir, num_partitions)
    hit_files = []
    n_skipped = 0
    for p in parts:
        d = _part_dir(out_dir, int(p))
        side = os.path.join(d, f"_BLOOM-{col}")
        with open(side, "rb") as f:
            meta = np.frombuffer(f.read(16), np.int64)
            k, n_bits = int(meta[0]), int(meta[1])
            words = np.frombuffer(f.read(), np.uint64)
        h = hash64(np.array([value], np.int64))
        pos = _bloom_positions(h, k, n_bits).ravel()
        bits = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) \
            & np.uint64(1)
        if bits.all():
            hit_files.append(os.path.join(d, "data.parquet"))
        else:
            n_skipped += 1
    if not hit_files:
        return None, 0, int(n_skipped)
    ds = rd.read_parquet(hit_files)

    def _exact(t: pa.Table) -> pa.Table:
        m = np_col(t, col) == value
        return t.take(pa.array(np.flatnonzero(m)))

    return (ds.map_batches(_exact, batch_format="pyarrow"),
            len(hit_files), int(n_skipped))


# ---------------------------------------------------------------------------
# XOR parity: single-shard loss recovery for the partitioned sink
# ---------------------------------------------------------------------------


@ray.remote
def _file_bytes_padded(path: str, size: int) -> np.ndarray:
    with open(path, "rb") as f:
        raw = np.frombuffer(f.read(), np.uint8)
    out = np.zeros(size, np.uint8)
    out[:len(raw)] = raw
    return out


@ray.remote
def _xor_fold(*arrs: np.ndarray) -> np.ndarray:
    out = arrs[0].copy()
    for a in arrs[1:]:
        np.bitwise_xor(out, a, out=out)
    return out


def write_parity(out_dir: str, num_partitions: int) -> dict:
    """RAID-5-style XOR parity over a ``write_partitioned`` layout:
    one ``_PARITY`` sidecar = byte-wise XOR of every partition's
    Parquet file (zero-padded to the longest), plus a length manifest
    — enough to reconstruct ANY SINGLE lost partition byte-identically
    without re-running the pipeline that produced it (resume protects
    against mid-write crashes; parity protects against losing a
    finished shard afterwards).  The fold is a tree of Ray tasks;
    the driver holds one file-sized buffer."""
    import json

    parts = finished_partitions(out_dir, num_partitions)
    paths = {int(p): os.path.join(_part_dir(out_dir, int(p)),
                                  "data.parquet") for p in parts}
    sizes = {p: os.path.getsize(f) for p, f in paths.items()}
    width = max(sizes.values())
    refs = [_file_bytes_padded.remote(paths[p], width)
            for p in sorted(paths)]
    while len(refs) > 1:
        refs = [_xor_fold.remote(*refs[i:i + 8])
                for i in range(0, len(refs), 8)]
    parity = ray.get(refs[0])
    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "wb") as f:
        f.write(parity.tobytes())
    os.replace(tmp, os.path.join(out_dir, "_PARITY"))
    manifest = {"width": width,
                "sizes": {str(p): s for p, s in sizes.items()}}
    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "_PARITY_MANIFEST"))
    return manifest


def recover_partition(out_dir: str, num_partitions: int, p: int) -> str:
    """Reconstruct partition ``p``'s Parquet file byte-identically by
    XOR-ing the parity sidecar with every OTHER partition's (padded)
    bytes, truncating to the manifest length, and committing
    atomically (file + ``_SUCCESS``).  Raises if more than the one
    partition is missing — XOR parity tolerates exactly one loss."""
    import json

    with open(os.path.join(out_dir, "_PARITY_MANIFEST")) as f:
        manifest = json.load(f)
    width = manifest["width"]
    want = {int(k) for k in manifest["sizes"]}
    others = []
    for q in sorted(want - {int(p)}):
        path = os.path.join(_part_dir(out_dir, q), "data.parquet")
        if not os.path.exists(path):
            raise ValueError(
                f"partition {q} also missing — XOR parity recovers "
                "exactly one lost shard")
        others.append(_file_bytes_padded.remote(path, width))
    with open(os.path.join(out_dir, "_PARITY"), "rb") as f:
        parity = np.frombuffer(f.read(), np.uint8).copy()
    refs = others
    while len(refs) > 1:
        refs = [_xor_fold.remote(*refs[i:i + 8])
                for i in range(0, len(refs), 8)]
    if refs:
        np.bitwise_xor(parity, ray.get(refs[0]), out=parity)
    raw = parity[:manifest["sizes"][str(int(p))]]
    d = _part_dir(out_dir, int(p))
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "wb") as f:
        f.write(raw.tobytes())
    os.replace(tmp, os.path.join(d, "data.parquet"))
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("")
    return os.path.join(d, "data.parquet")


def write_columnar_partitioned(
    ds: rd.Dataset,
    out_dir: str,
    key_fn,
    num_partitions: int,
    fmt: str = "orc",
) -> pa.Table:
    """``write_partitioned`` generalized over the columnar container:
    ``fmt ∈ {"orc", "feather"}`` writes ``p<p>/data.<fmt>`` with the
    same hash routing, atomic tmp+rename commit and ``_SUCCESS``
    markers — the interchange formats (ORC for Hive/Spark-side
    consumers, Feather/Arrow-IPC for zero-parse local analytics) a
    multi-engine lake needs beside Parquet."""
    assert fmt in ("orc", "feather")
    os.makedirs(out_dir, exist_ok=True)

    def _stamp(batch: pa.Table) -> pa.Table:
        p = (hash64(key_fn(batch)) % np.uint64(num_partitions)).astype(
            np.int32
        )
        return batch.append_column(_PART_COL, pa.array(p, pa.int32()))

    def _write(grp: pa.Table) -> pa.Table:
        p = int(np_col(grp, _PART_COL)[0])
        grp = grp.drop_columns([_PART_COL])
        d = _part_dir(out_dir, p)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        if fmt == "orc":
            from pyarrow import orc

            orc.write_table(grp, tmp)
        else:
            from pyarrow import feather

            feather.write_feather(grp, tmp)
        os.replace(tmp, os.path.join(d, f"data.{fmt}"))
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")
        return pa.table(
            {
                "part": pa.array([p], pa.int64()),
                "rows": pa.array([grp.num_rows], pa.int64()),
            }
        )

    stamped = ds.map_batches(_stamp, batch_format="pyarrow")
    receipts = stamped.groupby(_PART_COL).map_groups(
        _write, batch_format="pyarrow"
    )
    t = pa.Table.from_pylist(sorted(receipts.take_all(),
                                    key=lambda r: r["part"]))
    return t


def read_columnar_partitioned(
    out_dir: str, num_partitions: int, fmt: str = "orc"
) -> rd.Dataset:
    """Read a ``write_columnar_partitioned`` layout back as a Dataset —
    one Ray task per finished partition parses its container file
    (ORC / Feather via pyarrow) so the read scales with partitions and
    unfinished partitions raise instead of silently dropping rows."""
    assert fmt in ("orc", "feather")
    parts = finished_partitions(out_dir, num_partitions)
    if len(parts) < num_partitions:
        raise ValueError(
            f"only {len(parts)}/{num_partitions} partitions finished"
        )

    @ray.remote
    def _load(p: int) -> pa.Table:
        path = os.path.join(_part_dir(out_dir, p), f"data.{fmt}")
        if fmt == "orc":
            from pyarrow import orc

            return orc.ORCFile(path).read()
        from pyarrow import feather

        return feather.read_table(path)

    refs = [_load.remote(int(p)) for p in parts]
    return rd.from_arrow_refs(refs)


# --------------------------------------- deletion vectors (merge-on-read)


def _dv_dir(out_dir: str, p: int) -> str:
    return os.path.join(_part_dir(out_dir, p), "deletes")


def write_deletion_vectors(
    out_dir: str,
    num_partitions: int,
    pred_fn,
    commit: int,
) -> pa.Table:
    """Delta/Iceberg-v2 merge-on-read DELETE: mark rows dead without
    rewriting the base files.  For every finished partition, one Ray
    task reads its base parquet, evaluates ``pred_fn(table) -> bool
    mask`` (True = delete) against the rows still live under earlier
    commits, and writes the matching ROW INDICES as an atomic sidecar
    ``p<p>/deletes/v<commit>.parquet`` (temp + ``os.replace``, so a
    crash leaves ignorable litter, and a finished sidecar for this
    commit is never rewritten — re-running a commit is a no-op).
    Readers union all sidecars at scan time (:func:`
    read_with_deletion_vectors`), which is what makes deletes O(dead
    rows) instead of O(table) at 100 TB.  Returns a receipt
    (part, deleted, skipped)."""

    @ray.remote
    def _one(p: int) -> dict:
        d = _dv_dir(out_dir, p)
        final = os.path.join(d, f"v{commit:05d}.parquet")
        if os.path.exists(final):
            return {"part": p, "deleted": -1, "skipped": True}
        base = pq.read_table(
            os.path.join(_part_dir(out_dir, p), "data.parquet")
        )
        dead = _dv_union(out_dir, p, base.num_rows)
        mask = np.asarray(pred_fn(base), bool)
        assert len(mask) == base.num_rows
        idx = np.flatnonzero(mask & ~dead).astype(np.int64)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(pa.table({"row_idx": pa.array(idx, pa.int64())}), tmp)
        os.replace(tmp, final)
        return {"part": p, "deleted": int(len(idx)), "skipped": False}

    parts = finished_partitions(out_dir, num_partitions)
    rows = ray.get([_one.remote(int(p)) for p in parts])
    return pa.Table.from_pylist(
        sorted(rows, key=lambda r: r["part"]),
        schema=pa.schema([("part", pa.int64()), ("deleted", pa.int64()),
                          ("skipped", pa.bool_())]),
    )


def _dv_union(out_dir: str, p: int, n_rows: int) -> np.ndarray:
    """Union of all committed deletion sidecars of partition p as a
    bool mask (True = deleted)."""
    dead = np.zeros(n_rows, bool)
    d = _dv_dir(out_dir, p)
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if f.startswith("v") and f.endswith(".parquet"):
                idx = pq.read_table(os.path.join(d, f)).column(
                    "row_idx"
                ).to_numpy(zero_copy_only=False)
                dead[idx] = True
    return dead


def read_with_deletion_vectors(
    out_dir: str, num_partitions: int
) -> rd.Dataset:
    """Scan finished partitions applying their deletion sidecars — one
    task per partition reads base + vectors and emits only live rows
    (merge-on-read; the base files are immutable)."""
    parts = [int(p) for p in finished_partitions(out_dir, num_partitions)]
    if not parts:
        raise FileNotFoundError(f"no finished partitions under {out_dir}")
    meta = rd.from_arrow(pa.table({"part": pa.array(parts, pa.int64())}))

    def _scan(t: pa.Table) -> pa.Table:
        outs = []
        for p in np_col(t, "part"):
            base = pq.read_table(
                os.path.join(_part_dir(out_dir, int(p)), "data.parquet")
            )
            dead = _dv_union(out_dir, int(p), base.num_rows)
            outs.append(base.filter(pa.array(~dead)))
        return pa.concat_tables(outs, promote_options="default")

    return meta.map_batches(_scan, batch_format="pyarrow", batch_size=1)
