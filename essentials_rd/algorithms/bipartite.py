"""Bipartiteness / odd-cycle detection as a VertexProgram.

Per connected component: is the component 2-colorable?  Classic BFS
parity argument run as BSP supersteps on the same engine as CC/PR
(SURVEY.md §2.7 — the user-extension surface):

- state ``seen`` is a 2-bit mask: bit0 = reachable from the component
  root at EVEN distance, bit1 = at ODD distance (the root is the
  component's min vid — the fixpoint label of the already-verified CC
  run, so both engine and oracle anchor the same parity origin);
- a superstep scatters each frontier vertex's mask with its bits
  SWAPPED (a neighbor sits one step further), messages pre-combine by
  bitwise OR per destination;
- fixpoint when no mask grows.  A vertex with ``seen == 3`` lies on a
  closed odd walk through the root ⟺ its component contains an odd
  cycle ⟺ the component is not bipartite (König).

Monotone (masks only grow), so early convergence and any fixed-k ≥
convergence agree — the property the unrolled DuckDB oracle relies on,
exactly like the CC twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors


def _segment_or(keys: np.ndarray, vals: np.ndarray):
    order = np.argsort(keys, kind="stable")
    sk, sv = keys[order], vals[order]
    uniq, starts, counts = np.unique(sk, return_index=True,
                                     return_counts=True)
    return uniq, np.bitwise_or.reduceat(sv, starts), counts


class ParityProgram:
    name = "parity"
    state_cols = {"seen": pa.int8(), "active": pa.int8()}
    msg_cols = {"mmask": pa.int8()}
    uses_mcount = False

    def __init__(self, roots_ref):
        """``roots_ref``: ray.put of the sorted component-root vid
        array (CC fixpoint labels) — broadcast once, read per worker."""
        self.roots_ref = roots_ref

    def init_state(self, vids, outdeg):
        import ray

        roots = ray.get(self.roots_ref)
        seen = np.isin(vids, roots).astype(np.int8)  # bit0: even dist 0
        return {"seen": seen, "active": seen.copy()}

    def scatter(self, state, shard):
        act = (state["active"] >= 1) & (state["seen"] > 0)
        if not act.any():
            return None, None
        vids = state["vid"][act]
        seen = state["seen"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        swapped = (((seen[sel] & 1) << 1) | ((seen[sel] >> 1) & 1)).astype(
            np.int8
        )
        dst, ors, counts = _segment_or(nbrs, swapped[rep])
        return {"dst": dst, "mmask": ors, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids, old = state["vid"], state["seen"]
        new = old.copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.bitwise_or.at(new, pos, msgs["mmask"].astype(np.int8))
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
        changed = (new != old).astype(np.int8)
        return {
            "seen": new,
            "active": changed,
            "delta": changed.astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def parity_masks(
    graph: GraphShards,
    roots: np.ndarray,
    *,
    max_iters: int = 200,
    **kwargs,
) -> RunResult:
    import ray

    roots_ref = ray.put(np.sort(np.asarray(roots, np.int64)))
    return run_superstep_loop(
        ParityProgram(roots_ref), graph, max_iters=max_iters, **kwargs
    )
