"""Single-source widest path (max-min semiring) as a VertexProgram.

The bottleneck-shortest-path problem: ``width(v)`` = the maximum over
all s→v paths of the minimum edge weight along the path — network
capacity planning, maximum-bandwidth routing, and the semiring dual of
SSSP (min-plus → max-min).  Same Bellman-Ford-style frontier loop as
``sssp.py``: vertices whose width improved relax their out-edges with
``min(width(u), w(u, v))``; combine takes the max.  Monotone
non-decreasing from 0, so the fixpoint is exact; positive weights make
``width = 0`` unambiguous for "unreachable".  The source carries the
sentinel ``big`` (any real path's width is bounded by the max edge
weight, far below it).  Integer-valued weights stay exact in float64
state on both the engine and the SQL-unroll oracle side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_max

BIG = float(1 << 60)


class WidestProgram:
    name = "widest"
    state_cols = {"width": pa.float64(), "active": pa.int8()}
    msg_cols = {"mw": pa.float64()}
    uses_mcount = False

    def __init__(self, source: int):
        self.source = int(source)

    def init_state(self, vids, outdeg):
        width = np.zeros(len(vids))
        active = np.zeros(len(vids), np.int8)
        src = np.searchsorted(vids, self.source)
        if src < len(vids) and vids[src] == self.source:
            width[src] = BIG
            active[src] = 1
        return {"width": width, "active": active}

    def scatter(self, state, shard):
        act = state["active"] >= 1
        if not act.any():
            return None, None
        vids, width = state["vid"][act], state["width"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, eidx = expand_neighbors(shard, rows[sel])
        w = shard["weights"][eidx] if "weights" in shard else np.ones(len(eidx))
        dst, maxs, counts = segment_max(nbrs, np.minimum(width[sel][rep], w))
        return {"dst": dst, "mw": maxs, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids, old = state["vid"], state["width"]
        new = old.copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.maximum.at(new, pos, msgs["mw"])
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
        changed = (new > old).astype(np.int8)
        return {
            "width": new,
            "active": changed,
            "delta": (new - old).astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def widest_path(
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
        WidestProgram(source),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def widths_table(result: RunResult) -> pa.Table:
    """(vid, width) sorted by vid; unreachable = 0, source = BIG."""
    t = result.state_table(["width"])
    return t.rename_columns(["vid", "width"])
