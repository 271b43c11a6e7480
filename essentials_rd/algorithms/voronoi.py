"""Graph Voronoi partition (nearest-seed multi-source BFS) as a
VertexProgram on the superstep engine.

Every vertex is assigned to its CLOSEST seed under hop distance, ties
broken by the smaller seed rank — the landmark-assignment / graph-
clustering primitive (k-center seeding, partition balancing, ALT
landmark regions all start here).  The whole (distance, seed) pair
rides ONE packed int64 key = dist·2³² + seed_rank, so the engine's
existing min-combine IS the lexicographic (dist, rank) tie-break:
no second message channel, no custom combiner — the same trick the
CC engine uses for hash-min labels.  Frontier-sparse exactly like
BFS: only vertices whose key just improved scatter (key + 2³², i.e.
one hop farther, same seed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_min

_PACK = np.int64(1) << np.int64(32)
_UNSET = np.int64(1) << np.int64(62)


class VoronoiProgram:
    name = "voronoi"
    state_cols = {"key": pa.int64(), "active": pa.int8()}
    msg_cols = {"mkey": pa.int64()}
    uses_mcount = False

    def __init__(self, seeds: list[int]):
        # seed rank = position in the given order (caller fixes it
        # deterministically); must fit 32 bits alongside dist
        assert len(seeds) < (1 << 31)
        self.seeds = [int(s) for s in seeds]

    def init_state(self, vids, outdeg):
        key = np.full(len(vids), _UNSET, np.int64)
        active = np.zeros(len(vids), np.int8)
        for rank, s in enumerate(self.seeds):
            pos = np.searchsorted(vids, s)
            if pos < len(vids) and vids[pos] == s:
                key[pos] = np.int64(rank)  # dist 0, this rank
                active[pos] = 1
        return {"key": key, "active": active}

    def scatter(self, state, shard):
        act = state["active"] >= 1
        if not act.any():
            return None, None
        vids, key = state["vid"][act], state["key"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        dst, mins, counts = segment_min(nbrs, key[sel][rep] + _PACK)
        return {"dst": dst, "mkey": mins, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids, old = state["vid"], state["key"]
        new = old.copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.minimum.at(new, pos, msgs["mkey"])
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
        changed = (new < old).astype(np.int8)
        return {
            "key": new,
            "active": changed,
            "delta": (old != new).astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def graph_voronoi(
    graph: GraphShards,
    seeds: list[int],
    *,
    max_iters: int = 200,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    return run_superstep_loop(
        VoronoiProgram(seeds),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def voronoi_table(result: RunResult, seeds: list[int]) -> pa.Table:
    """(vid, dist, seed_vid) sorted by vid; unreachable = (-1, -1)."""
    t = result.state_table(["key"])
    k = np.asarray(t["key"], dtype=np.int64)
    reached = k < _UNSET
    dist = np.where(reached, k // _PACK, np.int64(-1))
    rank = np.where(reached, k % _PACK, np.int64(-1))
    seed_arr = np.asarray(seeds, np.int64)
    seed_vid = np.where(reached, seed_arr[np.maximum(rank, 0)],
                        np.int64(-1))
    return pa.table({
        "vid": t["vid"],
        "dist": pa.array(dist, pa.int64()),
        "seed_vid": pa.array(seed_vid, pa.int64()),
    })
