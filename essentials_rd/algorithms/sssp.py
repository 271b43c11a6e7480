"""Single-source shortest paths (weighted) as a VertexProgram.

Semantics (SURVEY.md §2.2 A6; upstream gunrock/essentials
``include/gunrock/algorithms/sssp.hxx`` + CPU validator
``examples/algorithms/sssp/sssp_cpu.hxx`` [U — snapshot absent]):
Bellman-Ford-style frontier relaxation — dist(s)=0; each superstep,
vertices whose distance improved relax their out-edges with
dist(u)+w(u,v); combine takes the min.  Non-negative weights assumed
(as in the reference's delta-stepping); terminates at fixpoint, which
for non-negative weights is the true shortest-path distance.
Unreachable vertices report +inf.  Requires a weighted graph
(``build_graph(weighted=True)``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_min


class SsspProgram:
    name = "sssp"
    state_cols = {"dist": pa.float64(), "active": pa.int8()}
    msg_cols = {"mdist": pa.float64()}
    uses_mcount = False

    def __init__(self, source: int):
        self.source = int(source)

    def init_state(self, vids, outdeg):
        dist = np.full(len(vids), np.inf)
        active = np.zeros(len(vids), np.int8)
        src = np.searchsorted(vids, self.source)
        if src < len(vids) and vids[src] == self.source:
            dist[src] = 0.0
            active[src] = 1
        return {"dist": dist, "active": active}

    def scatter(self, state, shard):
        act = state["active"] >= 1
        if not act.any():
            return None, None
        vids, dist = state["vid"][act], state["dist"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, eidx = expand_neighbors(shard, rows[sel])
        w = shard["weights"][eidx] if "weights" in shard else np.ones(len(eidx))
        dst, mins, counts = segment_min(nbrs, dist[sel][rep] + w)
        return {"dst": dst, "mdist": mins, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids, old = state["vid"], state["dist"]
        new = old.copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.minimum.at(new, pos, msgs["mdist"])
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
        changed = (new < old).astype(np.int8)
        delta = np.where(np.isfinite(old), old - new, np.where(changed, 1.0, 0.0))
        return {
            "dist": new,
            "active": changed,
            "delta": delta.astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def sssp(
    graph: GraphShards,
    source: int,
    *,
    max_iters: int = 500,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    return run_superstep_loop(
        SsspProgram(source),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def distances_table(result: RunResult) -> pa.Table:
    """(vid, dist) sorted by vid; unreachable = +inf."""
    t = result.state_table(["dist"])
    return t.rename_columns(["vid", "dist"])
