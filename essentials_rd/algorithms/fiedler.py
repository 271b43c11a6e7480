"""Fiedler vector (spectral bisection direction) as a VertexProgram.

Deflated power iteration on the shifted Laplacian M = cI − L with
c = 2·d_max (PSD shift, so the dominant non-constant eigenvector of M
is the eigenvector of L's second-smallest eigenvalue — the Fiedler
direction whose signs give the classic spectral bisection):

    y(v)   = Σ_{u~v} x(u) + (c − deg(v))·x(v)      (one superstep)
    x'(v)  = (y(v) − μ)/c,   μ = c·(Σ_u x(u))/n     (deflate + contract)

The deflation term μ removes the constant-eigenvector component each
round using only a scatter-computable broadcast partial (Σx — the same
side channel PageRank's dangling mass rides); the fixed 1/c contraction
keeps magnitudes bounded without an adaptive normalizer, so the whole
iteration is a pure function of the graph — reproducible by an
unrolled SQL twin at 6 dp.  x₀(v) = splitmix64(v) mod 1001 − 500, a
deterministic non-constant start the oracle replays bit-for-bit.

SURVEY.md §2.2 A7 family (spectral partitioning; the sweep-cut
machinery in ``sweep.py`` consumes exactly this ordering).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, hash64, segment_sum


class FiedlerProgram:
    name = "fiedler"
    state_cols = {"value": pa.float64(), "outdeg": pa.int64()}
    msg_cols = {"mval": pa.float64()}
    uses_mcount = False

    def __init__(self, n_vertices: int, c: float):
        self.n = n_vertices
        self.c = float(c)

    def init_state(self, vids, outdeg):
        x0 = (hash64(vids.astype(np.uint64)) % np.uint64(1001)).astype(
            np.float64
        ) - 500.0
        return {"value": x0, "outdeg": outdeg}

    def scatter(self, state, shard):
        vids, value = state["vid"], state["value"]
        rows, found = csr_lookup(shard, vids)
        msgs = None
        if found.any():
            sel = np.flatnonzero(found)
            rep, nbrs, _ = expand_neighbors(shard, rows[sel])
            dst, sums, counts = segment_sum(nbrs, value[sel][rep])
            msgs = {"dst": dst, "mval": sums, "mcount": counts}
        return msgs, {"mval": float(value.sum())}

    def apply(self, state, msgs, bcast):
        vids, value = state["vid"], state["value"]
        n = len(vids)
        agg = np.zeros(n)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            agg = np.bincount(pos, weights=msgs["mval"], minlength=n)
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        sx = bcast.get("mval", 0.0)
        mu = self.c * sx / self.n
        new_value = (agg + (self.c - state["outdeg"]) * value - mu) / self.c
        delta = np.abs(new_value - value)
        return {
            "value": new_value,
            "outdeg": state["outdeg"],
            "delta": delta,
            "changed": (delta > 0).astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return False  # fixed-iteration: the oracle unrolls exactly


def fiedler(
    graph: GraphShards,
    *,
    max_iters: int = 8,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    import ray

    dmax = 0
    for t in ray.get(list(graph.degree_refs)):
        od = np.asarray(t["outdeg"], np.int64)
        if len(od):
            dmax = max(dmax, int(od.max()))
    return run_superstep_loop(
        FiedlerProgram(graph.n_vertices, c=2.0 * max(dmax, 1)),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )
