"""Maximal independent set (deterministic Luby) as a VertexProgram.

Semantics (SURVEY.md §2.2 A7 family; Luby 1986, the independent-set
engine under upstream ``algorithms/color.hxx`` [U — snapshot absent]):
repeatedly, every UNDECIDED vertex draws the same deterministic
per-round packed priority as the coloring program
(``color._packed_priority`` — SQL-exact, vid tie-break); a vertex
joins the set iff its priority beats every undecided neighbor's, and
neighbors of new members drop out.  No two adjacent vertices can win
the same round (one of them hears the other's higher priority), and
the globally top-priority undecided vertex always gets decided each
round (it either wins or was killed), so the loop terminates — in
practice in O(log |V|) rounds.

One combine per superstep, no extra phase: new members scatter a
sentinel KILL value (int64 max — above every packed priority, which is
< 2⁶³) on the round AFTER they join, alongside the still-undecided
vertices' priorities; the max-combine delivers both streams at once
and apply processes kills before contests.  status ∈ {−1 undecided,
0 out, 1 in}.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_max
from .color import _packed_priority

_KILL = np.int64(np.iinfo(np.int64).max)


class MisProgram:
    name = "mis"
    state_cols = {"status": pa.int8(), "fresh": pa.int8(), "rnd": pa.int64()}
    msg_cols = {"mpri": pa.int64()}
    uses_mcount = False

    def init_state(self, vids, outdeg):
        n = len(vids)
        return {
            "status": np.full(n, -1, np.int8),
            "fresh": np.zeros(n, np.int8),
            "rnd": np.zeros(n, np.int64),
        }

    def scatter(self, state, shard):
        und = state["status"] < 0
        fresh = state["fresh"] >= 1
        send = und | fresh
        if not send.any():
            return None, None
        vids = state["vid"][send]
        rnd = int(state["rnd"][0]) if len(state["rnd"]) else 0
        pri = np.where(fresh[send], _KILL,
                       _packed_priority(vids, rnd))
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        dst, maxs, counts = segment_max(nbrs, pri[sel][rep])
        return {"dst": dst, "mpri": maxs, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        status = state["status"].copy()
        rnd = int(state["rnd"][0]) if len(state["rnd"]) else 0
        n = len(vids)
        incoming = np.full(n, np.iinfo(np.int64).min, np.int64)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.maximum.at(incoming, pos, msgs["mpri"])
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        und = status < 0
        killed = und & (incoming == _KILL)
        status[killed] = 0
        alive = und & ~killed
        # contest among THIS round's pre-kill undecided senders: a
        # killed neighbor still scattered its priority this superstep,
        # and a KILL in the max also (correctly) blocks the win
        wins = alive & (_packed_priority(vids, rnd) > incoming)
        status[wins] = 1
        changed = (killed | wins).astype(np.int8)
        return {
            "status": status,
            "fresh": wins.astype(np.int8),
            "rnd": np.full(n, rnd + 1, np.int64),
            "delta": changed.astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def mis(
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
        MisProgram(),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def mis_table(result: RunResult) -> pa.Table:
    """(vid, in_set ∈ {0,1}); isolated vertices are in the set (they
    hear nothing and beat the −inf default)."""
    t = result.state_table(["status"])
    s = np.asarray(t["status"], np.int64)
    assert (s >= 0).all(), "MIS loop ended with undecided vertices"
    return pa.table({"vid": t["vid"],
                     "in_set": pa.array(s, pa.int64())})
