"""HITS (hubs + authorities) on a DIRECTED graph as a VertexProgram.

Semantics (SURVEY.md §2.2 A7 family; upstream gunrock/essentials
``algorithms/hits.hxx`` [U — snapshot absent] computes the dual
hub/authority pair on directed graphs — the symmetric collapse of
that pair is ``eigencentrality.py``):

    a_{k+1}(v) = Σ_{u→v} h_k(u)        (authority = in-sum of hubs)
    h_{k+1}(u) = Σ_{u→v} a_{k+1}(v)    (hub = out-sum of authorities)

run for a FIXED k rounds from h_0 = 1 with no in-loop normalization —
final L1 normalization happens once in :func:`hits_table`, which keeps
every intermediate value an exact small-degree polynomial that an
unrolled DuckDB oracle reproduces term-for-term (in-loop float
normalization would compound rounding differently per system).

Physical shape: the engine's CSR shards hold out-edges only, so the
backward (hub) sum needs the transpose.  Both directions live in ONE
weighted graph — each directed edge u→v is stored as (u,v,tag=1) and
its reverse (v,u,tag=2) — and supersteps alternate parity: even
supersteps scatter h along tag-1 edges (authority update), odd
supersteps scatter a along tag-2 edges (hub update).  Build with
:func:`hits_graph_edges` → ``build_graph(weighted=True,
symmetrize=False)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, np_col, segment_sum

FWD = 1.0  # weight tag: original edge direction u→v
REV = 2.0  # weight tag: reversed edge v→u (delivers a(v) to u)


def hits_graph_edges(edges) -> "object":
    """Directed edge Dataset (src, dst) → direction-tagged edge table
    for ``build_graph(weighted=True, symmetrize=False)``: every edge
    twice, weight=1 forward and weight=2 reversed."""

    def _tag(t: pa.Table) -> pa.Table:
        s = np_col(t, "src")
        d = np_col(t, "dst")
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d]), pa.int64()),
                "dst": pa.array(np.concatenate([d, s]), pa.int64()),
                "weight": pa.array(
                    np.concatenate(
                        [np.full(len(s), FWD), np.full(len(s), REV)]
                    ),
                    pa.float64(),
                ),
            }
        )

    return edges.select_columns(["src", "dst"]).map_batches(
        _tag, batch_format="pyarrow"
    )


class HitsProgram:
    name = "hits"
    state_cols = {"hub": pa.float64(), "auth": pa.float64(),
                  "k": pa.int64()}
    msg_cols = {"mval": pa.float64()}
    uses_mcount = False

    def init_state(self, vids, outdeg):
        n = len(vids)
        return {
            "hub": np.ones(n),
            "auth": np.zeros(n),
            "k": np.zeros(n, np.int64),
        }

    def scatter(self, state, shard):
        k = int(state["k"][0]) if len(state["k"]) else 0
        tag = FWD if k % 2 == 0 else REV
        val = state["hub"] if k % 2 == 0 else state["auth"]
        vids = state["vid"]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, eidx = expand_neighbors(shard, rows[sel])
        keep = shard["weights"][eidx] == tag
        if not keep.any():
            return None, None
        dst, sums, counts = segment_sum(nbrs[keep], val[sel][rep][keep])
        return {"dst": dst, "mval": sums, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        k = int(state["k"][0]) if len(state["k"]) else 0
        n = len(vids)
        agg = np.zeros(n)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            agg = np.bincount(pos, weights=msgs["mval"], minlength=n)
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        if k % 2 == 0:  # authority phase just ran
            hub, auth = state["hub"], agg
            delta = np.abs(auth - state["auth"])
        else:  # hub phase
            hub, auth = agg, state["auth"]
            delta = np.abs(hub - state["hub"])
        return {
            "hub": hub,
            "auth": auth,
            "k": np.full(n, k + 1, np.int64),
            "delta": delta,
            "changed": (delta > 0).astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return False  # fixed round count, driven by max_iters


def hits(
    graph: GraphShards,
    *,
    k: int = 6,
    **kwargs,
) -> RunResult:
    """Run k full (authority, hub) rounds = 2k supersteps on a
    direction-tagged weighted graph (see :func:`hits_graph_edges`)."""
    assert graph.weighted, "HITS needs the direction-tagged weighted graph"
    return run_superstep_loop(
        HitsProgram(), graph, max_iters=2 * k, checkpoint_every=0, **kwargs
    )


def hits_table(result: RunResult, round_digits: int = 6) -> pa.Table:
    """(vid, hub, auth), each column L1-normalized then half-up rounded
    — the one normalization of the whole run (see module docstring)."""
    from ..pipelines import round_half_up

    t = result.state_table(["hub", "auth"])
    hub = np.asarray(t["hub"], np.float64)
    auth = np.asarray(t["auth"], np.float64)
    hs, as_ = hub.sum(), auth.sum()
    hub = round_half_up(hub / hs if hs > 0 else hub, round_digits)
    auth = round_half_up(auth / as_ if as_ > 0 else auth, round_digits)
    return pa.table(
        {
            "vid": t["vid"],
            "hub": pa.array(hub, pa.float64()),
            "auth": pa.array(auth, pa.float64()),
        }
    )
