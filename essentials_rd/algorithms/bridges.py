"""Bridge (cut-edge) finding via XOR subtree sketches on the BSP
engine — the dataflow-native alternative to Tarjan's DFS (which is
inherently sequential and cannot run as supersteps).

Plan (the Ahn–Guha–McGregor sketching idea specialized to
biconnectivity):

1. ``connected_components`` labels every vertex with its component
   MINIMUM (the engine's hash-min fixpoint).
2. A multi-source **forest BFS** from the set of component minima
   assigns every vertex a depth — one spanning tree per component,
   all grown in the same superstep loop.
3. ``parent(v)`` = the MIN neighbor u with depth(u) = depth(v) − 1 —
   deterministic, recovered by ONE distributed edge scan with
   per-block min partials (no extra shuffle), roots point to
   themselves.  BFS guarantees every non-root has such a neighbor.
4. Every NON-tree edge e gets the 64-bit label h(e) =
   splitmix64(lo·2³² + hi); one more distributed edge scan XORs the
   labels of non-tree edges incident to each vertex → S(v).
5. subtree-XOR: folding S bottom-up over the forest gives, for each
   tree edge (v → parent), the XOR of labels of non-tree edges with
   EXACTLY ONE endpoint inside subtree(v) (both-inside edges cancel —
   XOR is the whole trick).  A tree edge is covered by some non-tree
   edge iff that XOR is non-zero, so **bridge ⇔ subtree-XOR = 0**
   (exact for zero; a false "bridge" needs a 64-bit XOR collision —
   probability ~2⁻⁶⁴ per edge, and the SQL twin replays the SAME
   labels so the oracle comparison is exact either way).
   Non-tree edges are never bridges (they close a cycle with the tree
   path), so the tree edges are the only candidates — the sketch
   decides all of them in one pass.

Scale shape: steps 1–4 are superstep loops / single edge scans with
per-block pre-combined partials.  Step 5 and the parent/root folds
run on driver-side O(|V|) arrays — the repo's documented
|V| ≪ |E| tier caveat (same as tc.py's rank map); the distributed
variant is a depth-bucketed superstep loop folding child XORs upward
(O(max-depth) rounds, messages = tree edges once), same round body.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..graph import GraphShards
from ..ops import grouped_pandas_agg
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, hash64, np_col, segment_min

_UNSET = np.int64(np.iinfo(np.int64).max)


class ForestBfsProgram:
    """Multi-source BFS: depth 0 at every source (one per component),
    min-depth propagation — identical round body to BfsProgram."""

    name = "forest_bfs"
    state_cols = {"depth": pa.int64(), "active": pa.int8()}
    msg_cols = {"mdep": pa.int64()}
    uses_mcount = False

    def __init__(self, sources: np.ndarray):
        self.sources = np.sort(np.asarray(sources, np.int64))

    def init_state(self, vids, outdeg):
        depth = np.full(len(vids), _UNSET, np.int64)
        pos = np.searchsorted(vids, self.sources)
        ok = (pos < len(vids))
        hit = pos[ok][vids[pos[ok]] == self.sources[ok]]
        depth[hit] = 0
        active = np.zeros(len(vids), np.int8)
        active[hit] = 1
        return {"depth": depth, "active": active}

    def scatter(self, state, shard):
        act = state["active"] >= 1
        if not act.any():
            return None, None
        vids, depth = state["vid"][act], state["depth"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        dst, mins, counts = segment_min(nbrs, depth[sel][rep] + 1)
        return {"dst": dst, "mdep": mins, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids, old = state["vid"], state["depth"]
        new = old.copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.minimum.at(new, pos, msgs["mdep"])
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
        changed = (new < old).astype(np.int8)
        return {
            "depth": new,
            "active": changed,
            "delta": (old != new).astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def forest_bfs(graph: GraphShards, sources: np.ndarray,
               **kwargs) -> RunResult:
    return run_superstep_loop(ForestBfsProgram(sources), graph, **kwargs)


def find_bridges(
    g: GraphShards,
    edges: rd.Dataset,
    *,
    max_iters: int = 200,
    **kwargs,
) -> tuple[pa.Table, dict]:
    """Bridges of the SYMMETRIZED simple graph ``g`` whose canonical
    (src<dst, deduped) pair table is ``edges``.  Returns the bridge
    edge table (src, dst) sorted, plus info (depths, parents for
    tests).  Vertex ids must be < 2³² (packed tree/edge keys)."""
    from .cc import components_table, connected_components

    kwargs.setdefault("checkpoint_every", 0)
    cc = connected_components(g, max_iters=max_iters, **kwargs)
    lt = components_table(cc)
    vids = np.asarray(lt["vid"], np.int64)
    labels = np.asarray(lt["label"], np.int64)
    assert len(vids) == 0 or int(vids.max()) < 2**32, (
        "find_bridges packs (lo, hi) edge keys: ids < 2^32"
    )
    roots = vids[labels == vids]

    res = forest_bfs(g, roots, max_iters=max_iters, **kwargs)
    assert res.converged, "forest BFS did not converge"
    dt = res.state_table(["depth"])
    depth = np.asarray(dt.column(1), np.int64)
    dref = ray.put((vids, depth))

    # parent(v) = MIN neighbor at depth(v)-1; per-block min partials
    def _cand(b: pa.Table) -> pa.Table:
        vv, dd = ray.get(dref)
        s = np_col(b, "src").astype(np.int64)
        d = np_col(b, "dst").astype(np.int64)
        u = np.r_[s, d]
        v = np.r_[d, s]
        du = dd[np.searchsorted(vv, u)]
        dv = dd[np.searchsorted(vv, v)]
        ok = du + 1 == dv
        v, u = v[ok], u[ok]
        order = np.lexsort((u, v))
        v, u = v[order], u[order]
        st = np.r_[0, np.flatnonzero(v[1:] != v[:-1]) + 1] \
            if len(v) else np.zeros(0, np.int64)
        return pa.table({"vid": pa.array(v[st], pa.int64()),
                         "parent": pa.array(u[st], pa.int64())})

    rows = grouped_pandas_agg(
        edges.select_columns(["src", "dst"]).map_batches(
            _cand, batch_format="pyarrow"),
        keys=["vid"], aggs={"parent": ("parent", "min")},
        num_buckets=8).take_all()
    parent = vids.copy()  # roots (and anything unparented) = self
    for r in rows:
        i = np.searchsorted(vids, r["vid"])
        parent[i] = r["parent"]
    parent[np.searchsorted(vids, roots)] = roots

    nonroot = parent != vids
    lo_t = np.minimum(vids[nonroot], parent[nonroot]).astype(np.uint64)
    hi_t = np.maximum(vids[nonroot], parent[nonroot]).astype(np.uint64)
    tree_keys = np.sort((lo_t << np.uint64(32)) | hi_t)
    tkref = ray.put(tree_keys)

    # S(v) = XOR of labels of NON-tree edges incident to v
    def _sxor(b: pa.Table) -> pa.Table:
        tk = ray.get(tkref)
        lo = np_col(b, "src").astype(np.uint64)
        hi = np_col(b, "dst").astype(np.uint64)
        key = (lo << np.uint64(32)) | hi
        pos = np.searchsorted(tk, key)
        is_tree = (pos < len(tk)) & (tk[np.minimum(pos, max(len(tk) - 1, 0))]
                                     == key) if len(tk) else \
            np.zeros(len(key), bool)
        nt = ~is_tree
        h = hash64(key[nt])
        v = np.r_[lo[nt], hi[nt]].view(np.int64)
        z = np.r_[h, h]
        order = np.argsort(v, kind="stable")
        v, z = v[order], z[order]
        st = np.r_[0, np.flatnonzero(v[1:] != v[:-1]) + 1] \
            if len(v) else np.zeros(0, np.int64)
        xs = np.bitwise_xor.reduceat(z, st) if len(z) else z
        return pa.table({"vid": pa.array(v[st].astype(np.int64)),
                         "s": pa.array(xs.view(np.int64), pa.int64())})

    S = np.zeros(len(vids), np.uint64)
    for r in edges.select_columns(["src", "dst"]).map_batches(
            _sxor, batch_format="pyarrow").take_all():
        S[np.searchsorted(vids, r["vid"])] ^= np.uint64(
            np.int64(r["s"]).astype(np.uint64))

    # bottom-up subtree XOR over the forest (driver O(|V|))
    pidx = np.searchsorted(vids, parent)
    subx = S.copy()
    order = np.argsort(depth, kind="stable")[::-1]
    for i in order:
        if pidx[i] != i:
            subx[pidx[i]] ^= subx[i]

    is_bridge = nonroot & (subx == 0)
    lo_b = np.minimum(vids[is_bridge], parent[is_bridge])
    hi_b = np.maximum(vids[is_bridge], parent[is_bridge])
    o = np.lexsort((hi_b, lo_b))
    table = pa.table({
        "src": pa.array(lo_b[o], pa.int64()),
        "dst": pa.array(hi_b[o], pa.int64()),
    })
    info = {"vids": vids, "depth": depth, "parent": parent,
            "max_depth": int(depth.max()) if len(depth) else 0}
    return table, info
