"""Eigenvector centrality (L1-normalized power iteration) as a
VertexProgram.

Semantics (SURVEY.md §2.2 A7 family; upstream gunrock/essentials ships
``algorithms/hits.hxx`` [U — snapshot absent] — on the symmetrized
graph the HITS hub/authority pair collapses to this single score, the
principal eigenvector of the adjacency matrix):

    c'(v) = ( Σ_{u~v} c(u) ) / Z,   Z = Σ_u c(u)·deg(u)

(Z is the total message mass, so Σ_v c'(v) = 1 every step — L1
normalization without a second pass.)  Start c = 1/n.  ``tol=0`` →
exactly ``max_iters`` steps (what the unrolled DuckDB oracle compares);
tol>0 stops when the L1 delta drops below it.

The normalizer is a per-batch broadcast partial (kind=2 rows), exactly
the dangling-mass channel PageRank uses — no extra driver pass.
Isolated vertices (deg=0) hold score 0 after the first step.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_sum


class EigenCentralityProgram:
    name = "eigencentrality"
    state_cols = {"value": pa.float64(), "outdeg": pa.int64()}
    msg_cols = {"mval": pa.float64()}
    uses_mcount = False

    def __init__(self, n_vertices: int, tol: float = 1.0e-9):
        self.n = n_vertices
        self.tol = tol

    def init_state(self, vids, outdeg):
        return {"value": np.full(len(vids), 1.0 / self.n), "outdeg": outdeg}

    def scatter(self, state, shard):
        vids, value = state["vid"], state["value"]
        rows, found = csr_lookup(shard, vids)
        msgs = None
        if found.any():
            sel = np.flatnonzero(found)
            rep, nbrs, _ = expand_neighbors(shard, rows[sel])
            dst, sums, counts = segment_sum(nbrs, value[sel][rep])
            msgs = {"dst": dst, "mval": sums, "mcount": counts}
        # local share of the normalizer Z = Σ c(u)·deg(u)
        z_local = float((value * state["outdeg"]).sum())
        return msgs, {"mval": z_local}

    def apply(self, state, msgs, bcast):
        vids, value = state["vid"], state["value"]
        n = len(vids)
        agg = np.zeros(n)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            agg = np.bincount(pos, weights=msgs["mval"], minlength=n)
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        z = bcast.get("mval", 0.0)
        new_value = agg / z if z > 0 else np.zeros(n)
        delta = np.abs(new_value - value)
        return {
            "value": new_value,
            "outdeg": state["outdeg"],
            "delta": delta,
            "changed": (delta > 0).astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return self.tol > 0 and totals["sum_delta"] < self.tol


def eigencentrality(
    graph: GraphShards,
    *,
    tol: float = 1.0e-9,
    max_iters: int = 200,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    return run_superstep_loop(
        EigenCentralityProgram(graph.n_vertices, tol=tol),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def centrality_table(result: RunResult) -> pa.Table:
    """(vid, centrality) sorted by vid."""
    t = result.state_table(["value"])
    return t.rename_columns(["vid", "centrality"])
