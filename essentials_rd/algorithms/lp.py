"""Synchronous label propagation (community detection) as a VertexProgram.

Semantics (SURVEY.md §2.2 A3 — required deterministic variant): init
label(v)=vid; every superstep EVERY vertex adopts the most frequent
label among its distinct-edge neighbors in the undirected simple graph,
ties broken by MIN label (value-based, never arrival-order-based);
isolated vertices keep their label.  Stops when no label changes or at
``max_iters`` (sync LP can 2-cycle on bipartite structures, so the
iteration bound is part of the semantics — both the NumPy validator
and the unrolled DuckDB oracle run the same fixed bound).

Vote counting is two-stage: scatter pre-combines (dst, label) counts
per source partition; apply merges the per-partition counts and takes
the deterministic argmax.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors


class LabelPropagationProgram:
    name = "lp"
    state_cols = {"label": pa.int64()}
    msg_cols = {"mlabel": pa.int64()}
    # label=vid — elementwise: distributed init eligible
    partitionwise_init = True

    def init_state(self, vids, outdeg):
        return {"label": vids.copy()}

    def scatter(self, state, shard):
        vids, labels = state["vid"], state["label"]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        lab = labels[sel][rep]
        # pre-combine votes per (dst, label)
        order = np.lexsort((lab, nbrs))
        d, l = nbrs[order], lab[order]
        grp = np.flatnonzero(np.r_[True, (d[1:] != d[:-1]) | (l[1:] != l[:-1])])
        cnt = np.diff(np.r_[grp, len(d)])
        return {"dst": d[grp], "mlabel": l[grp], "mcount": cnt}, None

    def apply(self, state, msgs, bcast):
        vids, old = state["vid"], state["label"]
        new = old.copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            mv, ml, mc = msgs["vid"], msgs["mlabel"], msgs["mcount"]
            # merge per-partition partial counts by (vid, label)
            order = np.lexsort((ml, mv))
            mv, ml, mc = mv[order], ml[order], mc[order]
            grp = np.flatnonzero(np.r_[True, (mv[1:] != mv[:-1]) | (ml[1:] != ml[:-1])])
            g_v, g_l = mv[grp], ml[grp]
            g_c = np.add.reduceat(mc, grp)
            # winner per vid: max count, tie → min label
            sel = np.lexsort((g_l, -g_c, g_v))
            first = np.flatnonzero(np.r_[True, g_v[sel][1:] != g_v[sel][:-1]])
            win_v, win_l = g_v[sel][first], g_l[sel][first]
            pos = np.searchsorted(vids, win_v)
            new[pos] = win_l
            tot_v, tstarts = np.unique(mv, return_index=True)
            nmsg[np.searchsorted(vids, tot_v)] = np.add.reduceat(mc, tstarts)
        changed = (new != old).astype(np.int8)
        return {
            "label": new,
            "delta": changed.astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def label_propagation(
    graph: GraphShards,
    *,
    max_iters: int = 10,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    return run_superstep_loop(
        LabelPropagationProgram(),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def labels_table(result: RunResult) -> pa.Table:
    t = result.state_table(["label"])
    return t.rename_columns(["vid", "label"])
