"""BFS depths as a VertexProgram on the superstep engine.

Semantics (SURVEY.md §2.2 A6; upstream gunrock/essentials
``include/gunrock/algorithms/bfs.hxx`` [U — snapshot absent]): from a
source vertex s, depth(s)=0 and depth(v) = unweighted shortest hop
count; unreachable vertices report -1.  Frontier-sparse exactly like
CC: only vertices whose depth was just set scatter next superstep, so
per-superstep traversed edges equal the classic BFS frontier expansion.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_min

_UNSET = np.int64(np.iinfo(np.int64).max)


class BfsProgram:
    name = "bfs"
    state_cols = {"depth": pa.int64(), "active": pa.int8()}
    msg_cols = {"mdep": pa.int64()}
    uses_mcount = False

    def __init__(self, source: int):
        self.source = int(source)

    def init_state(self, vids, outdeg):
        depth = np.full(len(vids), _UNSET, np.int64)
        active = np.zeros(len(vids), np.int8)
        src = np.searchsorted(vids, self.source)
        if src < len(vids) and vids[src] == self.source:
            depth[src] = 0
            active[src] = 1
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


def bfs(
    graph: GraphShards,
    source: int,
    *,
    max_iters: int = 200,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    return run_superstep_loop(
        BfsProgram(source),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def depths_table(result: RunResult) -> pa.Table:
    """(vid, depth) sorted by vid; unreachable = -1."""
    t = result.state_table(["depth"])
    d = np.asarray(t["depth"], dtype=np.int64)
    d = np.where(d == _UNSET, np.int64(-1), d)
    return pa.table({"vid": t["vid"], "depth": pa.array(d, pa.int64())})
