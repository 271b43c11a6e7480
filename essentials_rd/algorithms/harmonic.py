"""Sampled harmonic (closeness-family) centrality as ONE multi-source
BFS VertexProgram on the superstep engine.

Semantics (SURVEY.md §2.2 A7 family; closeness/harmonic is the standard
companion of the upstream betweenness sampling in
``algorithms/bc.hxx`` [U — snapshot absent]): for a source sample S,

    h(v) = Σ_{s ∈ S, s ≠ v, d(s,v) < ∞} 1 / d(s,v)

with d the unweighted hop distance.  Instead of |S| sequential BFS
runs, ALL sources advance together in one program: each vertex carries
a ``mask`` int64 bitmask of the sources that have reached it (bit i =
``sources[i]``), the frontier message is the bitwise OR of the bits
that arrived last round, and a bit newly set at superstep r means that
source reached the vertex at depth exactly r — contributing 1/r.  The
per-destination combine is OR (idempotent — multiple parents reaching
the same vertex for the same source count once, unlike a sum), done
locally in scatter via ``segment_or`` and again order-insensitively in
apply via ``np.bitwise_or.at``.  Total traversed work is |S|·|E| spread
over diameter-many supersteps — |S|× fewer BSP barriers than looping
:func:`~essentials_rd.algorithms.bfs.bfs` per source.

``max_iters`` doubles as a depth cap: with ``max_iters = D`` the result
is the depth-D-truncated harmonic sum, which is what the unrolled SQL
oracle reproduces level-for-level.  At most 63 sources per run (bits
must stay in a non-negative int64); larger samples = several batched
runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, popcount64, segment_or


class MultiSourceBfsProgram:
    name = "harmonic"
    state_cols = {"mask": pa.int64(), "fresh": pa.int64(),
                  "h": pa.float64(), "rnd": pa.int64()}
    msg_cols = {"mbits": pa.int64()}
    uses_mcount = False

    def __init__(self, sources):
        srcs = sorted(int(s) for s in sources)
        assert 0 < len(srcs) <= 63, "1..63 sources per run (int64 bitmask)"
        assert len(set(srcs)) == len(srcs), "duplicate sources"
        self.sources = srcs

    def init_state(self, vids, outdeg):
        n = len(vids)
        mask = np.zeros(n, np.int64)
        for i, s in enumerate(self.sources):
            pos = np.searchsorted(vids, s)
            if pos < n and vids[pos] == s:
                mask[pos] |= np.int64(1) << i
        return {"mask": mask, "fresh": mask.copy(),
                "h": np.zeros(n), "rnd": np.ones(n, np.int64)}

    def scatter(self, state, shard):
        act = state["fresh"] != 0
        if not act.any():
            return None, None
        vids, bits = state["vid"][act], state["fresh"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        dst, ors, counts = segment_or(nbrs, bits[sel][rep])
        return {"dst": dst, "mbits": ors, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids, mask = state["vid"], state["mask"]
        n = len(vids)
        r = int(state["rnd"][0]) if n else 1
        inc = np.zeros(n, np.int64)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.bitwise_or.at(inc, pos, msgs["mbits"])
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        new = inc & ~mask
        npop = popcount64(new)
        changed = (new != 0).astype(np.int8)
        return {
            "mask": mask | new,
            "fresh": new,
            "h": state["h"] + npop / float(r),
            "rnd": state["rnd"] + 1,
            "delta": npop.astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def harmonic(
    graph: GraphShards,
    sources,
    *,
    max_iters: int = 64,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    return run_superstep_loop(
        MultiSourceBfsProgram(sources),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def harmonic_table(result: RunResult) -> pa.Table:
    """(vid, harmonic) sorted by vid."""
    t = result.state_table(["h"])
    return t.rename_columns(["vid", "harmonic"])
