"""SpMV (y = A·x) — the primitive under PageRank, exposed as its own
harness (gunrock/essentials ``include/gunrock/algorithms/spmv.hxx``
[U — snapshot absent]; BASELINE.json: "pr/cc/spmv test harnesses").

A[dst, src] = edge weight; one superstep: scatter x(src)·w along each
edge, combine by destination-vertex hash, apply writes y.  Requires a
weighted graph (``build_graph(weighted=True)``); for an unweighted edge
table pass weight=1.0 upstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_sum


class SpmvProgram:
    name = "spmv"
    state_cols = {"x": pa.float64(), "y": pa.float64()}
    msg_cols = {"mval": pa.float64()}
    uses_mcount = False  # counts are metrics-only for SpMV

    def __init__(self, x_fn=None):
        """``x_fn(vids) -> x`` builds the input vector deterministically
        from vertex ids (default: x = (vid % 97) / 97)."""
        self.x_fn = x_fn or (lambda v: (v % 97) / 97.0)

    def init_state(self, vids, outdeg):
        return {"x": self.x_fn(vids).astype(np.float64), "y": np.zeros(len(vids))}

    def scatter(self, state, shard):
        vids, x = state["vid"], state["x"]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, eidx = expand_neighbors(shard, rows[sel])
        w = shard["weights"][eidx] if "weights" in shard else np.ones(len(eidx))
        dst, sums, counts = segment_sum(nbrs, x[sel][rep] * w)
        return {"dst": dst, "mval": sums, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        y = np.zeros(len(vids))
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            # packed-row order, not vid-grouped: bincount per destination
            pos = np.searchsorted(vids, msgs["vid"])
            y = np.bincount(pos, weights=msgs["mval"], minlength=len(vids))
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
        return {
            "x": state["x"],
            "y": y,
            "delta": np.abs(y - state["y"]),
            "changed": (y != state["y"]).astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["superstep"] >= 1


def spmv(graph: GraphShards, *, x_fn=None, n_actors: int | None = None) -> RunResult:
    return run_superstep_loop(
        SpmvProgram(x_fn), graph, ckpt=None, max_iters=1,
        checkpoint_every=0, n_actors=n_actors,
    )


def spmv_table(result: RunResult) -> pa.Table:
    t = result.state_table(["x", "y"])
    return t.rename_columns(["vid", "x", "y"])


class NbrDegProgram(SpmvProgram):
    """SpMV with x = the degree vector itself (taken from init_state's
    ``outdeg`` — no extra pass): y[v] = Σ_{u∈N(v)} deg(u), the exact
    integer numerator of average-neighbor-degree — the per-vertex
    assortativity feature (Barrat et al. 2004).  Degrees ≤ |V| and
    sums ≤ |E|·|V| stay far under 2^53, so the float64 message channel
    is integer-exact."""

    name = "nbrdeg"

    def __init__(self):
        super().__init__()

    def init_state(self, vids, outdeg):
        return {"x": outdeg.astype(np.float64),
                "y": np.zeros(len(vids))}


def neighbor_degree_sums(graph: GraphShards, *,
                         n_actors: int | None = None) -> RunResult:
    return run_superstep_loop(
        NbrDegProgram(), graph, ckpt=None, max_iters=1,
        checkpoint_every=0, n_actors=n_actors,
    )
