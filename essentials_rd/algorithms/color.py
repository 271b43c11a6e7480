"""Greedy graph coloring (Luby-style independent sets) as a
VertexProgram.

Semantics (SURVEY.md §2.2 A7 family; upstream gunrock/essentials
``algorithms/color.hxx`` [U — snapshot absent], which colors by
repeated independent-set extraction): in round r every UNCOLORED
vertex draws a deterministic per-round priority; a vertex takes color
r iff its (priority, vid) beats every uncolored neighbor's.  The
priority is a pure function of (vid, round) —

    p(v, r) = ((v + (r+1)·K) · K) mod 2³¹,   K = 2654435761 (Knuth)

— chosen because it is EXACTLY reproducible in plain SQL (HUGEINT
arithmetic), which is what makes the coloring oracle-checkable: both
sides compute identical priorities, so the coloring is deterministic,
not merely valid.  Adjacent vertices always differ in (p, vid) (vid
tie-break), so each round's winners form an independent set and the
result is a proper coloring.

Per superstep: uncolored vertices scatter ``packed = p·2³² + vid``
(< 2⁶³, int64-safe) to their neighbors; combine takes the max; a
vertex whose own packed value exceeds the max incoming (or that heard
nothing) colors itself with the round index.  The global
max-priority uncolored vertex always wins, so every round colors ≥ 1
vertex and the loop terminates in ≤ |V| rounds (in practice ≈ a small
multiple of the max clique size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_max

_K = np.uint64(2654435761)
_P_MOD = np.uint64(1 << 31)
_PACK = np.uint64(1 << 32)


def _packed_priority(vids: np.ndarray, rnd: int) -> np.ndarray:
    """int64 (priority, vid) pack — identical to the SQL oracle's
    ((v + (r+1)*K) * K) % 2^31 * 2^32 + v."""
    v = vids.astype(np.uint64)
    p = ((v + np.uint64(rnd + 1) * _K) * _K) % _P_MOD
    return (p * _PACK + v).astype(np.int64)


class ColorProgram:
    name = "color"
    state_cols = {"color": pa.int64(), "rnd": pa.int64()}
    msg_cols = {"mpri": pa.int64()}
    uses_mcount = False

    def init_state(self, vids, outdeg):
        return {
            "color": np.full(len(vids), -1, np.int64),
            "rnd": np.zeros(len(vids), np.int64),
        }

    def scatter(self, state, shard):
        unc = state["color"] < 0
        if not unc.any():
            return None, None
        vids = state["vid"][unc]
        rnd = int(state["rnd"][0]) if len(state["rnd"]) else 0
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        pri = _packed_priority(vids[sel], rnd)[rep]
        dst, maxs, counts = segment_max(nbrs, pri)
        return {"dst": dst, "mpri": maxs, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        color = state["color"].copy()
        rnd = int(state["rnd"][0]) if len(state["rnd"]) else 0
        n = len(vids)
        incoming = np.full(n, np.iinfo(np.int64).min, np.int64)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.maximum.at(incoming, pos, msgs["mpri"])
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        unc = color < 0
        wins = unc & (_packed_priority(vids, rnd) > incoming)
        color[wins] = rnd
        return {
            "color": color,
            "rnd": np.full(n, rnd + 1, np.int64),
            "delta": wins.astype(np.float64),
            "changed": wins.astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def color(
    graph: GraphShards,
    *,
    max_iters: int = 500,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    return run_superstep_loop(
        ColorProgram(),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def colors_table(result: RunResult) -> pa.Table:
    """(vid, color) sorted by vid."""
    t = result.state_table(["color"])
    return t.rename_columns(["vid", "color"])
