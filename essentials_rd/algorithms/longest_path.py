"""Longest-path layering (critical-path depth) on a DAG as a
VertexProgram — the max-plus dual of BFS's min-plus relaxation.

Semantics: over a DIRECTED ACYCLIC graph, ``depth(v)`` = length (hop
count) of the longest path ending at v; sources (in-degree 0) have
depth 0.  This is the scheduling/topological-layer primitive: depth(v)
is v's critical-path layer, and ``max(depth)`` is the DAG's critical
path length.

Capped variant: run exactly K supersteps.  Monotone max-relaxation
gives ``depth_K(v) = min(longest(v), K)`` — every path of length
L ≤ K has propagated end-to-end by round L (each prefix vertex reaches
its depth no later than its position), and round-r messages carry
values ≤ r so nothing exceeds K.  The cap makes the result exactly
reproducible by a K-step unrolled SQL CTE regardless of the DAG's true
diameter, and bounds superstep count on adversarially deep graphs.

Frontier-sparse like BFS/CC: only vertices whose depth just increased
scatter, so per-superstep traversed edges equal the changed frontier's
out-edges.  Build the graph with ``symmetrize=False`` over a DAG
orientation (e.g. the canonical src<dst co-purchase form, acyclic by
construction over any total vertex order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_max


class LongestPathProgram:
    name = "longest_path"
    state_cols = {"depth": pa.int64(), "active": pa.int8()}
    msg_cols = {"mdep": pa.int64()}
    uses_mcount = False

    def init_state(self, vids, outdeg):
        # depth 0 everywhere; every vertex scatters once in round 1 so
        # each edge (u, v) relaxes v to ≥ 1 — in-degree-0 vertices are
        # never relaxed and stay at 0
        return {
            "depth": np.zeros(len(vids), np.int64),
            "active": np.ones(len(vids), np.int8),
        }

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
        dst, maxs, counts = segment_max(nbrs, depth[sel][rep] + 1)
        return {"dst": dst, "mdep": maxs, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids, old = state["vid"], state["depth"]
        new = old.copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.maximum.at(new, pos, msgs["mdep"])
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
        changed = (new > old).astype(np.int8)
        return {
            "depth": new,
            "active": changed,
            "delta": (old != new).astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def longest_path(
    graph: GraphShards,
    *,
    max_iters: int = 64,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    """``max_iters=K`` is the semantic cap: result depth =
    min(longest(v), K).  On a DAG whose critical path is < K the run
    converges early and the cap is invisible."""
    return run_superstep_loop(
        LongestPathProgram(),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def depth_table(result: RunResult) -> pa.Table:
    """(vid, depth) sorted by vid."""
    t = result.state_table(["depth"])
    return pa.table(
        {
            "vid": t["vid"],
            "depth": pa.array(np.asarray(t["depth"], np.int64), pa.int64()),
        }
    )
