"""Strongly connected components (trim + forward-color + backward-mark)
on a DIRECTED graph, as driver-orchestrated VertexProgram rounds.

Semantics (SURVEY.md §2.2 A7 family; upstream gunrock/essentials has no
SCC operator — this is the classic distributed coloring algorithm of
Orzan / Pregel-SCC, public literature): every vertex ends with
``scc = min vertex id of its strongly connected component`` — the same
canonical labeling the undirected CC engine uses, so the result is
deterministic and partitioning-independent by construction.

Per outer round, three BSP fixpoints over the SAME immutable
direction-tagged graph (built once, HITS-style: each directed edge u→v
stored as (u,v,w=FWD) and (v,u,w=REV); ``hits.hits_graph_edges``):

1. **Trim** — iteratively retire alive vertices whose alive in-degree
   or alive out-degree is 0 (they are singleton SCCs).  One superstep
   per peel layer; without this, a directed chain costs one OUTER round
   per vertex instead of one trim superstep per layer.
2. **Forward color** — min-label propagation along FWD edges within the
   alive subgraph to fixpoint: ``color(v) = min vid over alive vertices
   that reach v`` (including v).  Roots are ``color(v) == v``.
3. **Backward mark** — frontier BFS from the roots along REV edges,
   restricted to same-color vertices: ``SCC(r) = {v alive : color(v)=r
   and v reaches r}``.  The restriction is lossless (any alive forward
   path v→…→r lies entirely inside color r — a smaller-id vertex
   reaching an interior vertex would also reach r, contradicting
   color(r)=r), and MAX is a lossless message pre-combine because every
   color arriving at u satisfies ``c ≤ color(u)`` (c reaches u through
   the delivering edge), so the matching color is never combined away.

Every marked vertex is retired with ``scc = color``; each round retires
at least the minimum alive vertex's SCC, so the loop terminates.  All
three phases scatter frontier-sparse and exchange one pre-combined
message shuffle per superstep — the engine's standard scaling shape.

SCC IS ANSI-SQL-expressible on the driver's small inputs via a
recursive reachability CTE (mutual-reach pairs → min label), which is
the DuckDB oracle (`__ray_entry__._scc_sql`); the engine itself never
materializes reachability pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..graph import GraphShards
from ..superstep import run_superstep_loop
from ..util import (
    csr_lookup,
    expand_neighbors,
    np_col,
    segment_max,
    segment_min,
    segment_sum,
)

FWD = 1.0  # weight tag: original edge direction u→v
REV = 2.0  # weight tag: reversed edge v→u

_NO_MSG = np.int64(np.iinfo(np.int64).min)


def _aligned(vids: np.ndarray, ref_vids: np.ndarray) -> None:
    assert len(vids) == len(ref_vids) and vids[0] == ref_vids[0] and (
        vids[-1] == ref_vids[-1]
    ), "program state arrays must align with the graph's sorted vertex ids"


class _TrimProgram:
    """Peel alive vertices with alive in-degree 0 or out-degree 0.

    Messages: presence counts in both directions (m_in along FWD edges,
    m_out along REV edges), sum-combined.  A vertex receiving zero in
    either direction is a singleton SCC; it stops scattering next
    superstep, which cascades the peel one layer per superstep."""

    name = "scc_trim"
    state_cols = {"alive": pa.int8(), "scc": pa.int64()}
    msg_cols = {"m_in": pa.int64(), "m_out": pa.int64()}
    uses_mcount = False

    def __init__(self, vids: np.ndarray, alive: np.ndarray, scc: np.ndarray):
        self._vids = vids
        self._alive = alive
        self._scc = scc

    def init_state(self, vids, outdeg):
        _aligned(vids, self._vids)
        return {"alive": self._alive.astype(np.int8), "scc": self._scc.copy()}

    def scatter(self, state, shard):
        act = state["alive"] >= 1
        if not act.any():
            return None, None
        vids = state["vid"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        rep, nbrs, eidx = expand_neighbors(shard, rows[np.flatnonzero(found)])
        w = shard["weights"][eidx]
        is_fwd = w == FWD
        dst, in_sums, _ = segment_sum(nbrs, is_fwd.astype(np.int64))
        _, out_sums, _ = segment_sum(nbrs, (~is_fwd).astype(np.int64))
        return {"dst": dst, "m_in": in_sums, "m_out": out_sums}, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        alive = state["alive"].astype(bool)
        scc = state["scc"].copy()
        n = len(vids)
        indeg = np.zeros(n, np.int64)
        outdeg = np.zeros(n, np.int64)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.add.at(indeg, pos, msgs["m_in"])
            np.add.at(outdeg, pos, msgs["m_out"])
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        trim = alive & ((indeg == 0) | (outdeg == 0))
        scc[trim] = vids[trim]
        alive &= ~trim
        return {
            "alive": alive.astype(np.int8),
            "scc": scc,
            "delta": trim.astype(np.float64),
            "changed": trim.astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


class _FwdColorProgram:
    """Min-color propagation along FWD edges within the alive subgraph
    (identical shape to undirected CC's hash-min, direction-filtered)."""

    name = "scc_color"
    state_cols = {"color": pa.int64(), "active": pa.int8(), "alive": pa.int8()}
    msg_cols = {"mcolor": pa.int64()}
    uses_mcount = False

    def __init__(self, vids: np.ndarray, alive: np.ndarray):
        self._vids = vids
        self._alive = alive

    def init_state(self, vids, outdeg):
        _aligned(vids, self._vids)
        a = self._alive.astype(np.int8)
        return {"color": vids.copy(), "active": a.copy(), "alive": a}

    def scatter(self, state, shard):
        act = (state["active"] >= 1) & (state["alive"] >= 1)
        if not act.any():
            return None, None
        vids, colors = state["vid"][act], state["color"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, eidx = expand_neighbors(shard, rows[sel])
        keep = shard["weights"][eidx] == FWD
        if not keep.any():
            return None, None
        dst, mins, _ = segment_min(nbrs[keep], colors[sel][rep][keep])
        return {"dst": dst, "mcolor": mins}, None

    def apply(self, state, msgs, bcast):
        vids, old = state["vid"], state["color"]
        alive = state["alive"].astype(bool)
        new = old.copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.minimum.at(new, pos, msgs["mcolor"])
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
        new = np.where(alive, new, old)  # dead vertices ignore messages
        changed = (new < old).astype(np.int8)
        return {
            "color": new,
            "active": changed,
            "alive": state["alive"],
            "delta": (old - new).astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


class _BwdMarkProgram:
    """Frontier BFS from color roots along REV edges, same-color only.
    MAX pre-combine is lossless (module docstring)."""

    name = "scc_mark"
    state_cols = {"color": pa.int64(), "mark": pa.int8(), "active": pa.int8(),
                  "alive": pa.int8()}
    msg_cols = {"mcolor": pa.int64()}
    uses_mcount = False

    def __init__(self, vids: np.ndarray, alive: np.ndarray, color: np.ndarray):
        self._vids = vids
        self._alive = alive
        self._color = color

    def init_state(self, vids, outdeg):
        _aligned(vids, self._vids)
        a = self._alive.astype(np.int8)
        root = (self._alive & (self._color == vids)).astype(np.int8)
        return {"color": self._color.copy(), "mark": root,
                "active": root.copy(), "alive": a}

    def scatter(self, state, shard):
        act = (state["active"] >= 1) & (state["alive"] >= 1)
        if not act.any():
            return None, None
        vids, colors = state["vid"][act], state["color"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, eidx = expand_neighbors(shard, rows[sel])
        keep = shard["weights"][eidx] == REV
        if not keep.any():
            return None, None
        dst, maxs, _ = segment_max(nbrs[keep], colors[sel][rep][keep])
        return {"dst": dst, "mcolor": maxs}, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        alive = state["alive"].astype(bool)
        mark = state["mark"].astype(bool)
        color = state["color"]
        n = len(vids)
        best = np.full(n, _NO_MSG)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.maximum.at(best, pos, msgs["mcolor"])
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        newmark = alive & ~mark & (best == color)
        return {
            "color": color,
            "mark": (mark | newmark).astype(np.int8),
            "active": newmark.astype(np.int8),
            "alive": state["alive"],
            "delta": newmark.astype(np.float64),
            "changed": newmark.astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def scc_coloring(
    graph: GraphShards,
    *,
    max_rounds: int = 64,
    max_iters_per_phase: int = 500,
    **kwargs,
) -> tuple[pa.Table, int]:
    """Direction-tagged weighted graph (``hits_graph_edges`` →
    ``build_graph(weighted=True, symmetrize=False)``) → ((vid, scc)
    sorted by vid, #outer rounds).  ``scc`` is the min vertex id of the
    vertex's strongly connected component."""
    assert graph.weighted, "SCC needs the direction-tagged weighted graph"
    vids = ray.get(graph.vertex_ids_ref)
    n = len(vids)
    scc = np.full(n, -1, np.int64)
    alive = np.ones(n, bool)
    rounds = 0
    while alive.any():
        rounds += 1
        assert rounds <= max_rounds, (
            f"SCC did not finish in {max_rounds} outer rounds "
            f"({int(alive.sum())} vertices undecided)"
        )
        res = run_superstep_loop(
            _TrimProgram(vids, alive, scc), graph,
            max_iters=max_iters_per_phase, checkpoint_every=0, **kwargs,
        )
        assert res.converged, "trim phase hit max_iters"
        t = res.state_table(["alive", "scc"])
        alive = np.asarray(t["alive"], np.int8).astype(bool)
        scc = np.asarray(t["scc"], np.int64).copy()  # Arrow buffers are read-only
        if not alive.any():
            break
        res = run_superstep_loop(
            _FwdColorProgram(vids, alive), graph,
            max_iters=max_iters_per_phase, checkpoint_every=0, **kwargs,
        )
        assert res.converged, "forward-color phase hit max_iters"
        color = np.asarray(res.state_table(["color"])["color"], np.int64)
        res = run_superstep_loop(
            _BwdMarkProgram(vids, alive, color), graph,
            max_iters=max_iters_per_phase, checkpoint_every=0, **kwargs,
        )
        assert res.converged, "backward-mark phase hit max_iters"
        mark = np.asarray(res.state_table(["mark"])["mark"], np.int8).astype(bool)
        mark &= alive
        assert mark.any(), "backward mark retired no vertex (roots must mark)"
        scc[mark] = color[mark]
        alive &= ~mark
    tbl = pa.table(
        {"vid": pa.array(vids, pa.int64()), "scc": pa.array(scc, pa.int64())}
    )
    return tbl, rounds
