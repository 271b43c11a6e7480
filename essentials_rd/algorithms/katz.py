"""Truncated Katz centrality (Katz 1953) as a VertexProgram.

Katz with attenuation α = 1/A (A integer) and β = 1, truncated at K
steps:  x_K(v) = Σ_{k≤K} α^k · (#walks of length k ending at v).

Computed INTEGER-EXACTLY via the scaled recurrence y_k = A^k·x_k:

    y_0 = 1,   y_{k+1}(v) = A^{k+1} + Σ_{u~v} y_k(u)

— every intermediate is an exact integer (the float64 message channel
is exact below 2^53, asserted on the result), so the unrolled SQL twin
matches bit-for-bit with no rounding anywhere; x_K derives as
y_K / A^K.  Same one-exchange-per-superstep cost as PageRank, no
normalizer channel needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_sum


class KatzProgram:
    name = "katz"
    state_cols = {"value": pa.float64(), "pw": pa.float64()}
    msg_cols = {"mval": pa.float64()}
    uses_mcount = False

    def __init__(self, a_int: int, k_iters: int):
        self.a = float(a_int)
        self.k = k_iters

    def init_state(self, vids, outdeg):
        n = len(vids)
        return {"value": np.ones(n), "pw": np.ones(n)}

    def scatter(self, state, shard):
        vids, value = state["vid"], state["value"]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        dst, sums, counts = segment_sum(nbrs, value[sel][rep])
        return {"dst": dst, "mval": sums, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        n = len(vids)
        agg = np.zeros(n)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            agg = np.bincount(pos, weights=msgs["mval"], minlength=n)
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        new_pw = state["pw"] * self.a  # A^{k+1}, exact dyadic-free int
        new_value = new_pw + agg
        delta = np.abs(new_value - state["value"])
        return {
            "value": new_value,
            "pw": new_pw,
            "delta": delta,
            "changed": (delta > 0).astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["superstep"] >= self.k


def katz(graph: GraphShards, *, a_int: int = 4, k_iters: int = 4,
         ckpt=None, checkpoint_every: int = 0, resume: bool = False,
         n_actors: int | None = None, **kwargs) -> RunResult:
    return run_superstep_loop(
        KatzProgram(a_int, k_iters), graph, ckpt=ckpt,
        max_iters=k_iters, checkpoint_every=checkpoint_every,
        resume=resume, n_actors=n_actors, **kwargs,
    )


def katz_table(result: RunResult) -> pa.Table:
    """(vid, katz_num) — the exact integer y_K; x_K = katz_num / A^K.
    Asserts every value stayed inside float64's exact-integer range."""
    t = result.state_table(["value"])
    y = np.asarray(t["value"], np.float64)
    assert np.abs(y).max() < 2.0**53, "Katz walk sums exceeded 2^53"
    return pa.table({"vid": t["vid"],
                     "katz_num": pa.array(y.astype(np.int64), pa.int64())})
