"""Partitioned graph build: edge Dataset → zero-copy Arrow/NumPy CSR shards.

The distributed analog of the reference's COO→CSR conversion + device
graph build (gunrock/essentials ``graph/build.hxx``, ``formats/csr.hxx``
[U — snapshot absent, SURVEY.md §0]):

1. (optionally) symmetrize the canonical undirected edge table;
2. stamp ``part = splitmix64(src) % P`` and write the edge table ONCE as
   hive-partitioned Parquet (``.../edges/part=k/``) — this is the
   immutable edge checkpoint (SURVEY.md §4.4) that resume rebuilds from;
3. P Ray tasks each read their partition and build a compressed CSR
   shard ``{srcs, indptr, indices[, weights]}``; the task's return
   ObjectRef IS the shard handle held by scatter actors (zero-copy
   ``ray.get`` from the object store per node).

Shard k holds exactly the out-edges of vertices with hash(vid)%P == k,
so a state row's out-edges are always in the shard named by its own
``part`` column — the partitioning invariant every superstep relies on.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .util import csr_from_edges, np_col, part_of


@dataclass
class GraphShards:
    num_parts: int
    shard_refs: list  # list[ObjectRef[dict]]   (len == num_parts)
    degree_refs: list  # list[ObjectRef[pa.Table]] (vid, outdeg) per part
    n_vertices: int
    n_edges: int  # directed edge count across shards (after symmetrize)
    edges_dir: str  # "" for a no-checkpoint (persist=False) build
    weighted: bool = False
    vertex_ids_ref: object | None = None  # ObjectRef[np.ndarray] sorted vids
    edges_ds: object | None = None  # materialized prepped edges (persist=False)
    _vmeta: tuple | None = None  # cached (n, lo, hi, pcounts) — driver P-sized

    def degrees_ds(self) -> rd.Dataset:
        return rd.from_arrow_refs(list(self.degree_refs))

    def vertex_meta(self) -> tuple:
        """(n_vertices, min_vid, max_vid, per-part counts) — computed
        worker-side over the shared sorted id array so the driver only
        ever holds scalars + one P-sized array (the engine's
        no-|V|-driver-numpy contract for the default PR/CC path)."""
        if self._vmeta is None:
            object.__setattr__(
                self, "_vmeta",
                ray.get(_vertex_meta.remote(self.vertex_ids_ref,
                                            self.num_parts)),
            )
        return self._vmeta


@ray.remote
def _vertex_meta(vids: np.ndarray, num_parts: int) -> tuple:
    """Scalars + P-sized summary of the sorted vertex universe; runs on
    a worker (zero-copy plasma view) so the driver never materializes
    the |V| array just to learn its length/bounds/part occupancy."""
    n = len(vids)
    lo = int(vids[0]) if n else 0
    hi = int(vids[-1]) if n else 0
    pcounts = np.bincount(part_of(vids, num_parts), minlength=num_parts)
    return n, lo, hi, pcounts


def _part_files(edges_dir: str, part: int) -> list[str]:
    d = os.path.join(edges_dir, f"part={part}")
    if not os.path.isdir(d):
        return []
    return [
        os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]


def _count_rows(edges_dir: str, num_parts: int) -> int:
    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for p in range(num_parts)
        for f in _part_files(edges_dir, p)
    )


def _meta_dir(edges_dir: str) -> str:
    return edges_dir.rstrip("/") + "_meta"


def _write_graph_meta(
    edges_dir: str, vertex_ids: np.ndarray, num_parts: int, weighted: bool,
    n_edges: int,
) -> None:
    """Persist the vertex-id universe + build parameters next to the
    immutable edge checkpoint so the resume path never re-reads edge
    data into the driver (the |V|-sized id array is orders of magnitude
    smaller than |E|)."""
    import json

    md = _meta_dir(edges_dir)
    os.makedirs(md, exist_ok=True)
    pq.write_table(
        pa.table({"vid": pa.array(vertex_ids, pa.int64())}),
        os.path.join(md, "vertex_ids.parquet"),
    )
    with open(os.path.join(md, "meta.json"), "w") as f:
        json.dump(
            {
                "num_parts": num_parts,
                "weighted": weighted,
                "n_edges": int(n_edges),
                "n_vertices": int(len(vertex_ids)),
            },
            f,
        )


def read_graph_meta(edges_dir: str) -> dict | None:
    """Graph build parameters persisted by build_graph, or None for a
    pre-meta checkpoint (falls back to inference)."""
    import json

    p = os.path.join(_meta_dir(edges_dir), "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _infer_vertex_ids(edges_dir: str, num_parts: int) -> np.ndarray:
    vid_parts = []
    for p in range(num_parts):
        for f in _part_files(edges_dir, p):
            t = pq.read_table(f, columns=["src", "dst"])
            vid_parts.append(np.unique(np_col(t, "src")))
            vid_parts.append(np.unique(np_col(t, "dst")))
    return np.unique(np.concatenate(vid_parts)) if vid_parts else np.zeros(0, np.int64)


def _empty_shard(weighted: bool):
    empty = {
        "srcs": np.zeros(0, np.int64),
        "indptr": np.zeros(1, np.int64),
        "indices": np.zeros(0, np.int64),
    }
    if weighted:
        empty["weights"] = np.zeros(0, np.float64)
    deg = pa.table(
        {"vid": pa.array([], pa.int64()), "outdeg": pa.array([], pa.int64())}
    )
    return empty, deg


@ray.remote
def _split_block(tbl: pa.Table, num_parts: int):
    """Shuffle map side of the no-checkpoint build: slice one prepped
    block into its per-partition sub-tables.  The exchange stays in the
    object store — no parquet write+read round-trip."""
    if tbl.num_rows == 0 or "part" not in tbl.column_names:
        # zero-row blocks may carry a degenerate schema
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        outs = [empty] * num_parts
        return tuple(outs) if num_parts > 1 else outs[0]
    part = np_col(tbl, "part")
    order = np.argsort(part, kind="stable")
    t = tbl.take(pa.array(order)).drop_columns(["part"])
    sp = part[order]
    bounds = np.searchsorted(sp, np.arange(num_parts + 1))
    outs = [
        t.slice(bounds[p], bounds[p + 1] - bounds[p]).combine_chunks()
        for p in range(num_parts)
    ]
    return tuple(outs) if num_parts > 1 else outs[0]


@ray.remote
def _build_shard_from_tables(weighted: bool, *tabs):
    """Shuffle reduce side of the no-checkpoint build: one partition's
    sub-tables → CSR shard + degree table."""
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return _empty_shard(weighted)
    tbl = pa.concat_tables(tabs)
    src = np_col(tbl, "src")
    dst = np_col(tbl, "dst")
    w = np_col(tbl, "weight") if weighted else None
    shard = csr_from_edges(src, dst, w)
    deg = pa.table(
        {
            "vid": pa.array(shard["srcs"], pa.int64()),
            "outdeg": pa.array(np.diff(shard["indptr"]), pa.int64()),
        }
    )
    return shard, deg


@ray.remote
def _unique_union(*parts: np.ndarray) -> np.ndarray:
    """Sorted union of per-block unique endpoint arrays (worker-side)."""
    if not parts:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate(parts))


@ray.remote
def _len_of(arr) -> int:
    return int(len(arr))


@ray.remote
def _block_vertex_uniques(tbl: pa.Table) -> np.ndarray:
    if tbl.num_rows == 0 or "src" not in tbl.column_names:
        return np.zeros(0, np.int64)
    return np.unique(
        np.concatenate([np_col(tbl, "src"), np_col(tbl, "dst")])
    )


@ray.remote
def _build_shard(edges_dir: str, part: int, weighted: bool):
    """Read one partition's edges and build its CSR shard.

    Returns (shard_dict, degree_table).  NumPy arrays inside the shard
    are stored in plasma and mapped zero-copy by every scatter actor on
    the node.
    """
    d = os.path.join(edges_dir, f"part={part}")
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    if not os.path.isdir(d):
        return _empty_shard(weighted)
    tbl = pq.read_table(d, columns=cols)
    src = np_col(tbl, "src")
    dst = np_col(tbl, "dst")
    w = np_col(tbl, "weight") if weighted else None
    shard = csr_from_edges(src, dst, w)
    deg = pa.table(
        {
            "vid": pa.array(shard["srcs"], pa.int64()),
            "outdeg": pa.array(np.diff(shard["indptr"]), pa.int64()),
        }
    )
    return shard, deg


def build_graph(
    edges: rd.Dataset,
    work_dir: str,
    num_parts: int,
    *,
    symmetrize: bool = True,
    weighted: bool = False,
    vertex_ids: np.ndarray | None = None,
    n_vertices: int | None = None,
    persist: bool = True,
) -> GraphShards:
    """Edge Dataset (src:int64, dst:int64[, weight:double]) → GraphShards.

    ``symmetrize=True`` treats the input as a canonical undirected edge
    list (src<dst, deduped) and materializes both directions — what CC,
    LP, TC-degree and undirected PageRank operate on.  ``vertex_ids``
    (sorted, unique) defines the vertex universe including isolated
    vertices; if omitted it is inferred from edge endpoints.

    ``persist=False`` skips the parquet edge checkpoint entirely: the
    per-partition exchange happens in the object store (block split
    tasks → per-part CSR build tasks) and the materialized prepped
    edge Dataset is kept on ``GraphShards.edges_ds``.  Use for bench /
    oracle runs that never resume; the CLI keeps ``persist=True`` —
    the parquet checkpoint IS the resume source (SURVEY.md §3.3).
    """
    edges_dir = os.path.join(work_dir, "edges")

    def _prep(batch: pa.Table) -> pa.Table:
        s = np_col(batch, "src")
        d = np_col(batch, "dst")
        w = np_col(batch, "weight") if weighted else None
        keep = s != d  # simple graph: no self-loops
        s, d = s[keep], d[keep]
        if w is not None:
            w = w[keep]
        if symmetrize:
            s, d = np.concatenate([s, d]), np.concatenate([d, s])
            if w is not None:
                w = np.concatenate([w, w])
        out = {
            "src": pa.array(s, pa.int64()),
            "dst": pa.array(d, pa.int64()),
            "part": pa.array(part_of(s, num_parts), pa.int32()),
        }
        if w is not None:
            out["weight"] = pa.array(w, pa.float64())
        return pa.table(out)

    prepped = edges.map_batches(_prep, batch_format="pyarrow")

    if not persist:
        mat = prepped.materialize()
        n_edges = mat.count()
        block_refs = list(mat.to_arrow_refs())
        nb = len(block_refs)
        if num_parts > 1:
            split = [
                _split_block.options(num_returns=num_parts).remote(r, num_parts)
                for r in block_refs
            ]
        else:
            split = [[_split_block.remote(r, num_parts)] for r in block_refs]
        shard_futs = [
            _build_shard_from_tables.options(num_returns=2).remote(
                weighted, *[split[b][p] for b in range(nb)]
            )
            for p in range(num_parts)
        ]
        shard_refs = [f[0] for f in shard_futs]
        degree_refs = [f[1] for f in shard_futs]
        if vertex_ids is None:
            # final unique-merge runs on a worker: the driver only ever
            # holds the ObjectRef + a scalar length, never the |V| array
            vertex_ids_ref = _unique_union.remote(
                *[_block_vertex_uniques.remote(r) for r in block_refs]
            )
        else:
            vertex_ids_ref = ray.put(np.asarray(vertex_ids, dtype=np.int64))
        if n_vertices is None:
            n_vertices = (
                len(vertex_ids) if vertex_ids is not None
                else int(ray.get(_len_of.remote(vertex_ids_ref)))
            )
        # block until shards exist so "build" time is accounted here,
        # not silently inside the first superstep
        ray.wait(shard_refs, num_returns=len(shard_refs))
        return GraphShards(
            num_parts=num_parts,
            shard_refs=shard_refs,
            degree_refs=degree_refs,
            n_vertices=int(n_vertices),
            n_edges=int(n_edges),
            edges_dir="",
            weighted=weighted,
            vertex_ids_ref=vertex_ids_ref,
            edges_ds=mat,
        )

    if os.path.isdir(edges_dir):
        import shutil

        shutil.rmtree(edges_dir)
    prepped.write_parquet(edges_dir, partition_cols=["part"])

    shard_futs = [
        _build_shard.options(num_returns=2).remote(edges_dir, p, weighted)
        for p in range(num_parts)
    ]
    shard_refs = [f[0] for f in shard_futs]
    degree_refs = [f[1] for f in shard_futs]

    # directed edge count from parquet footers (no data read)
    n_edges = _count_rows(edges_dir, num_parts)
    if vertex_ids is None:
        vertex_ids = _infer_vertex_ids(edges_dir, num_parts)
    else:
        vertex_ids = np.asarray(vertex_ids, dtype=np.int64)
    if n_vertices is None:
        n_vertices = len(vertex_ids)
    _write_graph_meta(edges_dir, vertex_ids, num_parts, weighted, n_edges)

    return GraphShards(
        num_parts=num_parts,
        shard_refs=shard_refs,
        degree_refs=degree_refs,
        n_vertices=int(n_vertices),
        n_edges=int(n_edges),
        edges_dir=edges_dir,
        weighted=weighted,
        vertex_ids_ref=ray.put(vertex_ids),
    )


def reload_graph(
    edges_dir: str, num_parts: int | None = None, *, weighted: bool | None = None
) -> GraphShards:
    """Rebuild shards from the immutable edge checkpoint (resume path,
    SURVEY.md §3.3) — the edge table is never rewritten.

    Build parameters and the vertex-id universe come from the meta dir
    persisted by :func:`build_graph`; explicit ``num_parts`` /
    ``weighted`` are validated against it (a mismatched ``num_parts``
    would silently mispartition every superstep).  Pre-meta checkpoints
    fall back to driver-side inference (reads edge endpoints — avoid at
    scale)."""
    meta = read_graph_meta(edges_dir)
    if meta is not None:
        if num_parts is not None and num_parts != meta["num_parts"]:
            raise ValueError(
                f"num_parts={num_parts} does not match the edge checkpoint's "
                f"num_parts={meta['num_parts']} ({edges_dir})"
            )
        if weighted is not None and weighted != meta["weighted"]:
            raise ValueError(
                f"weighted={weighted} does not match the edge checkpoint's "
                f"weighted={meta['weighted']} ({edges_dir})"
            )
        num_parts = meta["num_parts"]
        weighted = meta["weighted"]
        n_edges = meta["n_edges"]
        vertex_ids = np_col(
            pq.read_table(
                os.path.join(_meta_dir(edges_dir), "vertex_ids.parquet")
            ),
            "vid",
        )
    else:
        assert num_parts is not None, "pre-meta checkpoint requires num_parts"
        weighted = bool(weighted)
        n_edges = _count_rows(edges_dir, num_parts)
        vertex_ids = _infer_vertex_ids(edges_dir, num_parts)
    shard_futs = [
        _build_shard.options(num_returns=2).remote(edges_dir, p, weighted)
        for p in range(num_parts)
    ]
    return GraphShards(
        num_parts=num_parts,
        shard_refs=[f[0] for f in shard_futs],
        degree_refs=[f[1] for f in shard_futs],
        n_vertices=len(vertex_ids),
        n_edges=int(n_edges),
        edges_dir=edges_dir,
        weighted=weighted,
        vertex_ids_ref=ray.put(vertex_ids),
    )
