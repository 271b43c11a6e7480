"""PageRank as a VertexProgram on the superstep engine.

Semantics (SURVEY.md §2.2 A1, mirroring the reference algorithm +
its CPU validator, gunrock/essentials ``include/gunrock/algorithms/
pr.hxx`` and ``examples/algorithms/pr/`` [U — snapshot absent]):

    p'(v) = (1-α)/n + α·( Σ_{u→v} p(u)/outdeg(u) + dangling_mass/n )

- dangling (outdeg=0) mass redistributed uniformly — networkx-compatible;
- start p = 1/n;
- convergence: L1 error Σ|p'-p| < n·tol (networkx's criterion), so the
  converged scores match ``nx.pagerank`` allclose 1e-6;
- ``tol=0`` turns convergence off → exactly ``max_iters`` power steps
  (what the fixed-k DuckDB oracle queries compare against).

The dangling mass is a broadcast partial: each scatter batch emits its
local Σ p(dangling) to every destination partition (kind=2 rows); apply
sums the partials — no extra driver-side pass per superstep.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_sum


class PageRankProgram:
    name = "pagerank"
    state_cols = {"value": pa.float64(), "outdeg": pa.int64()}
    msg_cols = {"mval": pa.float64()}
    # apply() sums mval — per-message counts are metrics-only, so drop
    # them from the combine-shuffle payload (⅓ less shuffle volume)
    uses_mcount = False
    # init is elementwise in (vids, outdeg): eligible for the
    # distributed per-partition initial-state build (superstep.py)
    partitionwise_init = True

    def __init__(self, n_vertices: int, alpha: float = 0.85,
                 tol: float = 1.0e-6, wire: str = "f64"):
        self.n = n_vertices
        self.alpha = alpha
        self.tol = tol
        # wire precision of the combine-shuffle payload:
        # - "f64": float64 messages, bit-reproduces the CPU reference
        #   (atol 1e-12 engine tests) — the default.
        # - "q30": int32 fixed-point at 2^-30 — contributions are
        #   computed in f64, rounded to q = rint(mval·2^30) for the
        #   wire (a pre-combined sum ≤ total mass 1 ⇒ q < 2^31), and
        #   exactly int-summed at apply.  Cuts the dominant PR wire
        #   payload from 12 B to 8 B per packed message (dst i32 +
        #   mval i32).  Per-superstep quantization error ≤ 2^-31 per
        #   message; the α-contraction bounds the converged drift by
        #   α/(1-α)·Σerr ≈ 1e-8 absolute — inside the north-star's
        #   allclose-1e-6 validator with two orders of headroom, and
        #   int sums make the result bit-deterministic at any layout.
        assert wire in ("f64", "q30")
        self.wire = wire
        if wire == "q30":
            self.msg_cols = {"mval": pa.int32()}

    def _wire_out(self, msgs, dangling: float):
        """Quantize outgoing messages + dangling broadcast for the wire."""
        if self.wire == "q30":
            if msgs is not None:
                msgs["mval"] = np.rint(
                    msgs["mval"] * float(1 << 30)
                ).astype(np.int64)
            return msgs, {"mval": int(round(dangling * (1 << 30)))}
        return msgs, {"mval": dangling}

    def init_state(self, vids, outdeg):
        return {"value": np.full(len(vids), 1.0 / self.n), "outdeg": outdeg}

    def scatter(self, state, shard):
        vids, value, outdeg = state["vid"], state["value"], state["outdeg"]
        rows, found = csr_lookup(shard, vids)
        msgs = None
        if found.any():
            sel = np.flatnonzero(found)
            rep, nbrs, _ = expand_neighbors(shard, rows[sel])
            contrib = (value[sel] / outdeg[sel])[rep]
            dst, sums, counts = segment_sum(nbrs, contrib)
            msgs = {"dst": dst, "mval": sums, "mcount": counts}
        dangling = float(value[outdeg == 0].sum())
        return self._wire_out(msgs, dangling)

    def apply(self, state, msgs, bcast):
        vids, value = state["vid"], state["value"]
        n = len(vids)
        agg = np.zeros(n)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            # msgs arrive in deterministic packed-row order (not
            # vid-grouped): bincount accumulates per destination in that
            # order — reproducible float sums with no O(M log M) sort
            # (q30 wire: int32 weights sum EXACTLY in f64 — every
            # partial stays < 2^30·#parts ≪ 2^53)
            pos = np.searchsorted(vids, msgs["vid"])
            agg = np.bincount(pos, weights=msgs["mval"], minlength=n)
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        dmass = bcast.get("mval", 0.0)
        if self.wire == "q30":
            agg = agg * 2.0 ** -30
            dmass = dmass * 2.0 ** -30
        new_value = (1.0 - self.alpha) / self.n + self.alpha * (agg + dmass / self.n)
        delta = np.abs(new_value - value)
        return {
            "value": new_value,
            "outdeg": state["outdeg"],
            "delta": delta,
            "changed": (delta > 0).astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return self.tol > 0 and totals["sum_delta"] < self.n * self.tol


class WeightedPageRankProgram(PageRankProgram):
    """Edge-weighted PageRank: a vertex distributes its mass
    proportionally to out-edge weights,

        p'(v) = (1-α)/n + α·( Σ_{u→v} p(u)·w(u,v)/W⁺(u) + dangling/n )

    with W⁺(u) = Σ out-weights.  Identical engine plumbing; scatter
    scales each expanded contribution by its edge weight over the
    source row's weight sum (cached per worker on the shard dict —
    one reduceat per shard, not per batch).  Dangling = outdeg 0,
    as in the unweighted program."""

    name = "pagerank_w"

    @staticmethod
    def _row_wsums(shard) -> np.ndarray:
        ws = shard.get("_row_wsums")
        if ws is None:
            ip = shard["indptr"]
            w = shard["weights"]
            ws = (
                np.add.reduceat(w, ip[:-1])
                if len(w)
                else np.zeros(0, np.float64)
            )
            shard["_row_wsums"] = ws  # worker-local dict; arrays untouched
        return ws

    def scatter(self, state, shard):
        vids, value, outdeg = state["vid"], state["value"], state["outdeg"]
        rows, found = csr_lookup(shard, vids)
        msgs = None
        if found.any():
            sel = np.flatnonzero(found)
            rep, nbrs, eidx = expand_neighbors(shard, rows[sel])
            wsum = self._row_wsums(shard)
            contrib = (value[sel] / wsum[rows[sel]])[rep] * shard["weights"][eidx]
            dst, sums, counts = segment_sum(nbrs, contrib)
            msgs = {"dst": dst, "mval": sums, "mcount": counts}
        dangling = float(value[outdeg == 0].sum())
        return self._wire_out(msgs, dangling)


def pagerank(
    graph: GraphShards,
    *,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iters: int = 200,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    wire: str = "f64",
    **kwargs,
) -> RunResult:
    prog = PageRankProgram(graph.n_vertices, alpha=alpha, tol=tol, wire=wire)
    return run_superstep_loop(
        prog,
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def pagerank_weighted(
    graph: GraphShards,
    *,
    alpha: float = 0.85,
    tol: float = 1.0e-6,
    max_iters: int = 200,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    assert graph.weighted, "pagerank_weighted needs a weighted graph build"
    prog = WeightedPageRankProgram(graph.n_vertices, alpha=alpha, tol=tol)
    return run_superstep_loop(
        prog,
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def pagerank_table(result: RunResult) -> pa.Table:
    """(vid, pagerank) sorted by vid — small-result helper."""
    t = result.state_table(["value"])
    return t.rename_columns(["vid", "pagerank"])
