"""Extra sources: Matrix Market reader (the reference's only input
format — gunrock/essentials ``include/gunrock/io/matrix_market.hxx``
[U — snapshot absent, SURVEY.md §0 / §2.3 S1]).

Kept deliberately small: the corpus→edge derivation (derive.py) is this
engine's primary ingest; ``read_mtx`` exists so classic graphs
(chesapeake.mtx-style fixtures) can be cross-checked directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def read_mtx(path: str) -> tuple[rd.Dataset, dict]:
    """Parse a MatrixMarket coordinate file into an edge Dataset
    (src:int64, dst:int64, weight:double; 0-based ids).

    Supports ``%%MatrixMarket matrix coordinate (real|integer|pattern)
    (general|symmetric)``.  ``symmetric`` inputs are returned as the
    canonical lower-triangle pair list (src<dst) — exactly the shape
    ``build_graph(symmetrize=True)`` expects.  Returns (edges, meta).

    The file header/parse runs on the driver (MatrixMarket is a
    line-oriented text format with a header — not splittable without
    scanning); for big graphs use Parquet edge tables instead.
    """
    with open(path) as f:
        header = f.readline().strip().lower()
        if not header.startswith("%%matrixmarket matrix coordinate"):
            raise ValueError(f"unsupported MatrixMarket header: {header}")
        parts = header.split()
        field = parts[3] if len(parts) > 3 else "real"
        sym = parts[4] if len(parts) > 4 else "general"
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        n_rows, n_cols, nnz = (int(x) for x in line.split())
        data = np.loadtxt(f, ndmin=2) if field != "pattern" else np.loadtxt(
            f, ndmin=2, usecols=(0, 1)
        )
    if data.size == 0:
        src = np.zeros(0, np.int64)
        dst = np.zeros(0, np.int64)
        w = np.zeros(0, np.float64)
    else:
        src = data[:, 0].astype(np.int64) - 1
        dst = data[:, 1].astype(np.int64) - 1
        w = (
            data[:, 2].astype(np.float64)
            if field != "pattern" and data.shape[1] > 2
            else np.ones(len(src))
        )
    if sym == "symmetric":
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        keep = lo != hi
        src, dst, w = lo[keep], hi[keep], w[keep]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "weight": pa.array(w, pa.float64()),
            }
        )
    )
    meta = {"n_rows": n_rows, "n_cols": n_cols, "nnz": nnz,
            "field": field, "symmetry": sym}
    return edges, meta


_CORPUS_COLUMNS = ("repo", "path", "content")


def read_corpus_any(
    path: str,
    columns: tuple[str, ...] | list[str] | None = _CORPUS_COLUMNS,
) -> rd.Dataset:
    """Format-dispatching corpus reader (SURVEY.md §2.3 S-family):
    Parquet (column-pruned at the read — row groups never ship unused
    columns), CSV, or JSONL, all yielding the same repo_files schema so
    the derive pipeline is source-agnostic.  CSV/JSONL are splittable
    text reads (Ray assigns byte ranges per task); they can't prune
    columns at storage level, so the projection happens immediately
    after parse — pass Parquet for the 100-TB path, the text formats
    exist for interchange.  Dispatch: a directory is assumed Parquet
    (the checkpoint/corpus layout); files dispatch on extension."""
    import os

    cols = list(columns) if columns is not None else None
    low = path.lower()
    if os.path.isdir(path) or low.endswith((".parquet", ".pq")):
        return rd.read_parquet(path, columns=cols)
    if low.endswith(".csv"):
        ds = rd.read_csv(path)
    elif low.endswith((".jsonl", ".json", ".ndjson")):
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unsupported corpus format: {path}")
    return ds.select_columns(cols) if cols else ds


def rmat_edges(
    scale: int,
    n_edges: int,
    seed: int = 42,
    parallelism: int = 16,
) -> rd.Dataset:
    """Deterministic R-MAT edge generator (Chakrabarti, Zhan &
    Faloutsos 2004 — the Graph500 Kronecker shape, public): 2^scale
    vertices, ``n_edges`` directed edges whose endpoints recurse into
    quadrants with the classic skewed probabilities — here EXACTLY
    (9, 3, 3, 1)/16, dyadic on purpose: each recursion level consumes
    one 4-bit nibble of a single ``splitmix64(edge_index + seed·φ)``
    draw (scale ≤ 16 fits all levels in one 64-bit word), so every
    edge is a PURE FUNCTION of its index — the generator is
    embarrassingly parallel (``rd.range`` → one vectorized
    ``map_batches``), identical at any parallelism/cluster size, and
    bit-for-bit reproducible in SQL through the shared SplitMix64
    chain + nibble CASEs.  Multi-edges and self-loops are kept, as in
    Graph500's edge factory; dedup/symmetrize downstream if the
    consumer wants a simple graph.  This is the scale-testing source:
    a 100-TB run generates edges in place of reading them, with zero
    input I/O and no shuffle."""
    from .util import hash64, np_col

    if not 1 <= scale <= 16:
        raise ValueError("rmat_edges supports 1 <= scale <= 16 "
                         "(one nibble per level from a 64-bit draw)")
    mix = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))

    def _gen(t: pa.Table) -> pa.Table:
        i = np_col(t, "id").astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            z = hash64((i + mix).view(np.int64)).view(np.uint64)
        src = np.zeros(len(i), np.uint64)
        dst = np.zeros(len(i), np.uint64)
        for lvl in range(scale):
            nib = (z >> np.uint64(4 * lvl)) & np.uint64(15)
            sbit = (nib >= 12).astype(np.uint64)
            dbit = (((nib >= 9) & (nib < 12)) | (nib >= 15)).astype(
                np.uint64)
            src = (src << np.uint64(1)) | sbit
            dst = (dst << np.uint64(1)) | dbit
        return pa.table({
            "i": pa.array(i.view(np.int64), pa.int64()),
            "src": pa.array(src.view(np.int64), pa.int64()),
            "dst": pa.array(dst.view(np.int64), pa.int64()),
        })

    return rd.range(n_edges, override_num_blocks=parallelism).map_batches(
        _gen, batch_format="pyarrow")


def read_union_by_name(
    paths: list[str],
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Schema-evolution read: union Parquet files whose schemas DRIFTED
    over time — columns added, dropped, or widened — by aligning
    columns BY NAME, null-filling fields a file predates, and promoting
    types permissively (int32→int64, int→float) via
    ``pa.unify_schemas``.  The planning cost is one footer
    (metadata-only) read per file on the driver — the standard catalog
    cost; data reads stay fully parallel: files are grouped by exact
    physical schema, each group is ONE ``read_parquet`` (so column
    pruning still pushes down per group), and per-batch conformance is
    a zero-copy cast + null-column append.  ``columns`` prunes the
    unified schema (a file lacking a requested column contributes
    nulls, not an error)."""
    import pyarrow.parquet as pq

    schemas: dict[tuple, list[str]] = {}
    schema_objs: dict[tuple, pa.Schema] = {}
    for p in sorted(paths):
        s = pq.read_schema(p)
        k = tuple((f.name, str(f.type)) for f in s)
        schemas.setdefault(k, []).append(p)
        schema_objs[k] = s
    unified = pa.unify_schemas(
        list(schema_objs.values()), promote_options="permissive")
    if columns is not None:
        missing = [c for c in columns if unified.get_field_index(c) < 0]
        if missing:
            raise ValueError(f"columns {missing} appear in no input file")
        unified = pa.schema([unified.field(c) for c in columns])
    target = unified

    pieces = []
    for k, group in schemas.items():
        have = {n for n, _ in k}
        want = [f.name for f in target if f.name in have]
        # a file sharing no requested column still contributes its ROW
        # COUNT (all-null rows) — read its narrowest column for that
        ds = rd.read_parquet(group, columns=want or [k[0][0]])

        def _conform(batch: pa.Table, _have=frozenset(have)) -> pa.Table:
            cols = []
            for f in target:
                if f.name in _have:
                    cols.append(batch.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(batch.num_rows, f.type))
            return pa.table(dict(zip([f.name for f in target], cols)))

        pieces.append(ds.map_batches(_conform, batch_format="pyarrow"))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.union(p)
    return out
