"""k-core membership as a VertexProgram (iterative peeling).

Semantics (SURVEY.md §2.2 A7 family; upstream gunrock/essentials ships
``algorithms/kcore.hxx`` [U — snapshot absent]): the k-core is the
maximal subgraph in which every vertex has degree ≥ k.  Computed by
peeling — repeatedly (and simultaneously, per round) remove vertices
whose degree among the remaining vertices is < k.  The fixpoint is
unique regardless of removal order.

BSP form: a removed vertex scatters ONE decrement per incident edge
(pre-combined per destination, like every message stream here); apply
subtracts, marks the newly sub-k vertices dead, and they scatter next
superstep.  Converged when a round kills nobody.  Frontier-sparse:
rounds after the first only touch the peel boundary.

Requires the symmetrized graph (outdeg == undirected degree).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_sum


class KcoreProgram:
    name = "kcore"
    state_cols = {"alive": pa.int8(), "adeg": pa.int64(), "active": pa.int8()}
    msg_cols = {"mdec": pa.int64()}
    uses_mcount = False

    def __init__(self, k: int):
        self.k = int(k)

    def init_state(self, vids, outdeg):
        dead0 = outdeg < self.k
        return {
            "alive": (~dead0).astype(np.int8),
            "adeg": outdeg.astype(np.int64),
            "active": dead0.astype(np.int8),  # newly dead: notify neighbors
        }

    def scatter(self, state, shard):
        act = state["active"] >= 1
        if not act.any():
            return None, None
        vids = state["vid"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        _, nbrs, _ = expand_neighbors(shard, rows[sel])
        dst, dec, counts = segment_sum(nbrs, np.ones(len(nbrs), np.int64))
        return {"dst": dst, "mdec": dec, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        alive = state["alive"].astype(bool)
        adeg = state["adeg"].copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            dec = np.bincount(pos, weights=msgs["mdec"], minlength=len(vids))
            adeg -= dec.astype(np.int64)
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
        newly_dead = alive & (adeg < self.k)
        return {
            "alive": (alive & ~newly_dead).astype(np.int8),
            "adeg": adeg,
            "active": newly_dead.astype(np.int8),
            "delta": newly_dead.astype(np.float64),
            "changed": newly_dead.astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def kcore(
    graph: GraphShards,
    k: int,
    *,
    max_iters: int = 500,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    return run_superstep_loop(
        KcoreProgram(k),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def kcore_table(result: RunResult) -> pa.Table:
    """(vid, in_core ∈ {0,1}) sorted by vid (int64 for oracle parity)."""
    t = result.state_table(["alive"])
    return pa.table(
        {
            "vid": t["vid"],
            "in_core": pa.array(
                np.asarray(t["alive"], np.int64), pa.int64()
            ),
        }
    )


def coreness(
    graph: GraphShards,
    cap: int,
    *,
    max_iters: int = 500,
    max_rounds_per_k: int | None = None,
    **kwargs,
) -> pa.Table:
    """Capped k-core DECOMPOSITION: per vertex ``core = min(coreness,
    cap)`` — the full core number for every vertex whose coreness is
    below the cap, ``cap`` for the rest.  Runs the peeling program for
    k = 1..cap; cores nest, so ``core = Σ_k alive_k`` exactly.  Each
    peel is its own frontier-sparse BSP run (rounds after the first
    touch only the peel boundary); a production variant would seed the
    k-peel from the (k−1)-core's survivors — cores nest — but the
    peels here start from the full graph to keep each run independent
    and the oracle unroll per-k self-contained.  Returns (vid, core).
    ``max_rounds_per_k`` (if given) asserts every peel's round count —
    the bound the unrolled SQL oracle relies on."""
    scores = None
    vids = None
    for k in range(1, cap + 1):
        res = kcore(graph, k, max_iters=max_iters, checkpoint_every=0,
                    **kwargs)
        assert res.converged, f"k={k} peel did not converge"
        if max_rounds_per_k is not None:
            assert res.supersteps <= max_rounds_per_k, (
                f"k={k} peel took {res.supersteps} rounds > bound "
                f"{max_rounds_per_k}"
            )
        t = res.state_table(["alive"])
        alive = np.asarray(t["alive"], np.int64)
        if scores is None:
            vids = t["vid"]
            scores = alive.copy()
        else:
            scores += alive
    return pa.table({"vid": vids,
                     "core": pa.array(scores, pa.int64())})
