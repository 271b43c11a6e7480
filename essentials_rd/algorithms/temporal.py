"""Temporal (time-respecting) earliest-arrival reachability as a
VertexProgram — the temporal-graph analytics class (Wu et al., "Path
problems in temporal graphs", VLDB 2014 — public paper) the static
BFS/SSSP family cannot express: an edge ``(u, v)`` carries an
activation time ``t`` and may only extend a path that has ARRIVED at
``u`` by then, so

    arr(s) = 0;   arr(v) = min { t(e) : e = (u, v), t(e) >= arr(u) }

Engine mapping: edge times ride the CSR shards' ``weights`` slot (the
same zero-copy lane SSSP uses), scatter filters each active vertex's
out-edges to ``t >= arr(u)`` and emits ``t`` itself as the message,
combine/apply are the standard segment/fold mins.  Arrivals only
decrease and relaxation is monotone, so the fixpoint is the exact
earliest-arrival function and a fixed-k unrolled oracle with
k >= convergence step matches bit-for-bit (the CC/SSSP property).
Unreachable vertices report +inf (cast to -1 at the query surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_min


class TemporalReachProgram:
    name = "treach"
    state_cols = {"arr": pa.float64(), "active": pa.int8()}
    msg_cols = {"marr": pa.float64()}
    uses_mcount = False

    def __init__(self, source: int):
        self.source = int(source)

    def init_state(self, vids, outdeg):
        arr = np.full(len(vids), np.inf)
        active = np.zeros(len(vids), np.int8)
        src = np.searchsorted(vids, self.source)
        if src < len(vids) and vids[src] == self.source:
            arr[src] = 0.0
            active[src] = 1
        return {"arr": arr, "active": active}

    def scatter(self, state, shard):
        act = state["active"] >= 1
        if not act.any():
            return None, None
        vids, arr = state["vid"][act], state["arr"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, eidx = expand_neighbors(shard, rows[sel])
        if "weights" not in shard:
            raise ValueError("temporal reachability needs edge times "
                             "(build_graph(weighted=True))")
        t = shard["weights"][eidx]
        ok = t >= arr[sel][rep]  # time-respecting: edge departs after arrival
        if not ok.any():
            return None, None
        dst, mins, counts = segment_min(nbrs[ok], t[ok])
        return {"dst": dst, "marr": mins, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids, old = state["vid"], state["arr"]
        new = old.copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.minimum.at(new, pos, msgs["marr"])
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
        changed = (new < old).astype(np.int8)
        delta = np.where(np.isfinite(old), old - new,
                         np.where(changed, 1.0, 0.0))
        return {
            "arr": new,
            "active": changed,
            "delta": delta.astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def temporal_reach(
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
        TemporalReachProgram(source),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def arrival_table(result: RunResult) -> pa.Table:
    t = result.state_table(["arr"])
    return t.rename_columns(["vid", "arr"])
