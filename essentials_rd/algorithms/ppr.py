"""Personalized PageRank (PPR) as a VertexProgram.

Semantics (SURVEY.md §2.2 A7 family; upstream gunrock/essentials ships
``algorithms/ppr.hxx`` [U — snapshot absent], the single-seed
random-walk-with-restart variant):

    p'(v) = (1-α)·e_S(v) + α·( Σ_{u→v} p(u)/outdeg(u) + dangling_mass·e_S(v) )

with e_S the personalization vector (1.0 at the seed, 0 elsewhere) and
dangling mass restarted AT THE SEED (the standard teleport-to-seed
rule, networkx-compatible when ``personalization``/``dangling`` are the
seed vector).  Start p = e_S.  ``tol=0`` → exactly ``max_iters`` power
steps, which is what the fixed-k unrolled DuckDB oracle compares.

Structurally identical to PageRank (same scatter; only the teleport
term differs), so the combine shuffle, dangling broadcast partials and
deterministic bincount reduction are inherited unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_sum


class PprProgram:
    name = "ppr"
    state_cols = {"value": pa.float64(), "outdeg": pa.int64()}
    msg_cols = {"mval": pa.float64()}
    uses_mcount = False

    def __init__(self, source: int, alpha: float = 0.85, tol: float = 1.0e-6):
        self.source = int(source)
        self.alpha = alpha
        self.tol = tol

    def _pers(self, vids: np.ndarray) -> np.ndarray:
        pers = np.zeros(len(vids))
        pos = np.searchsorted(vids, self.source)
        if pos < len(vids) and vids[pos] == self.source:
            pers[pos] = 1.0
        return pers

    def init_state(self, vids, outdeg):
        return {"value": self._pers(vids), "outdeg": outdeg}

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
        return msgs, {"mval": dangling}

    def apply(self, state, msgs, bcast):
        vids, value = state["vid"], state["value"]
        n = len(vids)
        agg = np.zeros(n)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            agg = np.bincount(pos, weights=msgs["mval"], minlength=n)
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        pers = self._pers(vids)
        dmass = bcast.get("mval", 0.0)
        new_value = (1.0 - self.alpha) * pers + self.alpha * (agg + dmass * pers)
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


def ppr(
    graph: GraphShards,
    source: int,
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
    return run_superstep_loop(
        PprProgram(source, alpha=alpha, tol=tol),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def ppr_table(result: RunResult) -> pa.Table:
    """(vid, ppr) sorted by vid."""
    t = result.state_table(["value"])
    return t.rename_columns(["vid", "ppr"])
