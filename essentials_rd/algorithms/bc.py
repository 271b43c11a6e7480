"""Betweenness centrality (sampled-source Brandes) as two
VertexPrograms on the superstep engine.

Semantics (SURVEY.md §2.2 A7 family; upstream gunrock/essentials
``algorithms/bc.hxx`` [U — snapshot absent], which is Brandes with a
source set): for each source s —

  forward:  BFS levels + σ(v) = number of shortest s→v paths
            (σ messages sum along frontier edges; σ are integers,
            exact in float64),
  backward: dependency accumulation from the deepest level up,
            δ(u) += σ(u) · Σ_{child w} (1+δ(w))/σ(w)
            (one BSP superstep per level; only one level scatters per
            superstep, so receivers at level-1 accept unconditionally).

The reported score is bc(v) = Σ_{s ∈ sources} δ_s(v) (v ≠ s) — the
standard sampled-source Brandes partial sums, NOT normalized and NOT
halved for undirectedness (pinned so the unrolled SQL oracle can
reproduce it term-for-term).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_sum

_UNSET = np.int64(np.iinfo(np.int64).max)


class _BcForwardProgram:
    """BFS with shortest-path counting: depth + σ."""

    name = "bc_fwd"
    state_cols = {"depth": pa.int64(), "sigma": pa.float64(), "active": pa.int8(),
                  "rnd": pa.int64()}
    msg_cols = {"msig": pa.float64()}
    uses_mcount = False

    def __init__(self, source: int):
        self.source = int(source)

    def init_state(self, vids, outdeg):
        depth = np.full(len(vids), _UNSET, np.int64)
        sigma = np.zeros(len(vids))
        active = np.zeros(len(vids), np.int8)
        pos = np.searchsorted(vids, self.source)
        if pos < len(vids) and vids[pos] == self.source:
            depth[pos] = 0
            sigma[pos] = 1.0
            active[pos] = 1
        return {"depth": depth, "sigma": sigma, "active": active,
                "rnd": np.ones(len(vids), np.int64)}

    def scatter(self, state, shard):
        act = state["active"] >= 1
        if not act.any():
            return None, None
        vids, sig = state["vid"][act], state["sigma"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        dst, sums, counts = segment_sum(nbrs, sig[sel][rep])
        return {"dst": dst, "msig": sums, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        depth = state["depth"].copy()
        sigma = state["sigma"].copy()
        n = len(vids)
        inc = np.zeros(n)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            inc = np.bincount(pos, weights=msgs["msig"], minlength=n)
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        # messages only ever come from the current frontier, so an
        # unvisited vertex with incoming σ joins level rnd (a uniform
        # counter — the partition-local frontier may be empty while
        # messages arrive from other partitions)
        rnd = int(state["rnd"][0]) if len(state["rnd"]) else 1
        newly = (depth == _UNSET) & (inc > 0)
        depth[newly] = rnd
        sigma[newly] = inc[newly]
        return {
            "depth": depth,
            "sigma": sigma,
            "active": newly.astype(np.int8),
            "rnd": np.full(n, rnd + 1, np.int64),
            "delta": newly.astype(np.float64),
            "changed": newly.astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


class _BcBackwardProgram:
    """Level-by-level dependency accumulation (lev counts down from the
    deepest level; exactly one level scatters per superstep)."""

    name = "bc_bwd"
    state_cols = {
        "depth": pa.int64(),
        "sigma": pa.float64(),
        "bdelta": pa.float64(),
        "lev": pa.int64(),
    }
    msg_cols = {"mdep": pa.float64()}
    uses_mcount = False

    def __init__(self, depths_ref, sigmas_ref, start_level: int):
        # np arrays aligned with the graph's sorted vid universe
        self._depths_ref = depths_ref
        self._sigmas_ref = sigmas_ref
        self.start_level = int(start_level)

    def init_state(self, vids, outdeg):
        import ray

        d_all, s_all = ray.get(self._depths_ref), ray.get(self._sigmas_ref)
        # vids here is this partition's slice of the sorted universe
        # (init_state receives the FULL sorted universe in this engine)
        return {
            "depth": d_all,
            "sigma": s_all,
            "bdelta": np.zeros(len(vids)),
            "lev": np.full(len(vids), self.start_level, np.int64),
        }

    def scatter(self, state, shard):
        lev = int(state["lev"][0]) if len(state["lev"]) else 0
        send = state["depth"] == lev
        if not send.any():
            return None, None
        vids = state["vid"][send]
        val = (1.0 + state["bdelta"][send]) / state["sigma"][send]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        dst, sums, counts = segment_sum(nbrs, val[sel][rep])
        return {"dst": dst, "mdep": sums, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        lev = int(state["lev"][0]) if len(state["lev"]) else 0
        n = len(vids)
        bdelta = state["bdelta"].copy()
        inc = np.zeros(n)
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            inc = np.bincount(pos, weights=msgs["mdep"], minlength=n)
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        # only parents (depth == lev-1) accept; same-level / child edges
        # deliver messages too, but those receivers are filtered here
        recv = state["depth"] == lev - 1
        bdelta[recv] += state["sigma"][recv] * inc[recv]
        return {
            "depth": state["depth"],
            "sigma": state["sigma"],
            "bdelta": bdelta,
            "lev": np.full(n, lev - 1, np.int64),
            "delta": np.where(recv, inc, 0.0),
            "changed": recv.astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return False  # driven by an exact max_iters


def betweenness(
    graph: GraphShards,
    sources: np.ndarray,
    max_depth: int | None = None,
    **kwargs,
) -> pa.Table:
    """Sampled-source Brandes: (vid, bc) with bc = Σ_s δ_s(v), δ_s(s)
    excluded.  One forward + one backward BSP run per source."""
    import ray

    vids = np.sort(np.asarray(ray.get(graph.vertex_ids_ref), np.int64))
    bc = np.zeros(len(vids))
    for s in np.asarray(sources, np.int64):
        fwd = run_superstep_loop(
            _BcForwardProgram(int(s)), graph, checkpoint_every=0, **kwargs
        )
        t = fwd.state_table(["depth", "sigma"])
        depth = np.asarray(t["depth"], np.int64)
        sigma = np.asarray(t["sigma"], np.float64)
        finite = depth[depth != _UNSET]
        L = int(finite.max()) if len(finite) else 0
        assert max_depth is None or L <= max_depth, (
            f"BFS depth {L} exceeds the oracle's unrolled bound {max_depth}"
        )
        if L >= 2:
            bwd = run_superstep_loop(
                _BcBackwardProgram(ray.put(depth), ray.put(sigma), L),
                graph,
                checkpoint_every=0,
                max_iters=L - 1,
                **kwargs,
            )
            tb = bwd.state_table(["bdelta"])
            delta = np.asarray(tb["bdelta"], np.float64).copy()
        elif L == 1:
            delta = np.zeros(len(vids))
        else:
            delta = np.zeros(len(vids))
        pos = np.searchsorted(vids, s)
        delta[pos] = 0.0  # δ_s(s) excluded
        bc += delta
    return pa.table({"vid": pa.array(vids, pa.int64()),
                     "bc": pa.array(bc, pa.float64())})


def edge_betweenness(
    graph: GraphShards,
    edges,
    sources: np.ndarray,
    max_depth: int | None = None,
    **kwargs,
):
    """Sampled-source EDGE betweenness: for each source the same
    forward (depth, σ) + backward (δ) BSP runs as vertex BC, then the
    per-edge dependency needs NO further exchange — Brandes' edge rule
    δ_s(u→w) = σ(u)·(1+δ(w))/σ(w) for the (unique, BFS) orientation
    with depth(w) = depth(u)+1 is a pure function of the two
    endpoints' (depth, σ, δ), so each source adds one broadcast
    map_batches stage over the canonical pair table and the whole
    accumulation is a single streaming pass with zero shuffles.
    Returns Dataset[src, dst, ebc] (unnormalized Σ_s, like vertex bc).
    """
    import ray
    import ray.data as rd

    from ..util import np_col

    vids = np.sort(np.asarray(ray.get(graph.vertex_ids_ref), np.int64))
    ds = edges.select_columns(["src", "dst"])

    def _zero(t: pa.Table) -> pa.Table:
        return t.append_column(
            "ebc", pa.array(np.zeros(t.num_rows), pa.float64()))

    ds = ds.map_batches(_zero, batch_format="pyarrow")

    for s in np.asarray(sources, np.int64):
        fwd = run_superstep_loop(
            _BcForwardProgram(int(s)), graph, checkpoint_every=0, **kwargs
        )
        t = fwd.state_table(["depth", "sigma"])
        depth = np.asarray(t["depth"], np.int64)
        sigma = np.asarray(t["sigma"], np.float64)
        finite = depth[depth != _UNSET]
        L = int(finite.max()) if len(finite) else 0
        assert max_depth is None or L <= max_depth, (
            f"BFS depth {L} exceeds the oracle's unrolled bound {max_depth}"
        )
        if L >= 2:
            bwd = run_superstep_loop(
                _BcBackwardProgram(ray.put(depth), ray.put(sigma), L),
                graph, checkpoint_every=0, max_iters=L - 1, **kwargs,
            )
            delta = np.asarray(bwd.state_table(["bdelta"])["bdelta"],
                               np.float64).copy()
        else:
            delta = np.zeros(len(vids))
        ref = ray.put((vids, depth, sigma, delta))

        def _add(t: pa.Table, _ref=ref) -> pa.Table:
            vv, dd, sg, dl = ray.get(_ref)
            lo = np_col(t, "src").astype(np.int64)
            hi = np_col(t, "dst").astype(np.int64)
            il = np.searchsorted(vv, lo)
            ih = np.searchsorted(vv, hi)
            term = np.zeros(len(lo))
            with np.errstate(invalid="ignore", over="ignore"):
                m = (dd[il] != _UNSET) & (dd[ih] == dd[il] + 1)
                term[m] = sg[il][m] * (1.0 + dl[ih][m]) / sg[ih][m]
                m2 = (dd[ih] != _UNSET) & (dd[il] == dd[ih] + 1)
                term[m2] = sg[ih][m2] * (1.0 + dl[il][m2]) / sg[il][m2]
            ebc = np_col(t, "ebc").astype(np.float64) + term
            return pa.table({"src": t.column("src"),
                             "dst": t.column("dst"),
                             "ebc": pa.array(ebc, pa.float64())})

        ds = ds.map_batches(_add, batch_format="pyarrow")
    return ds


def sp_counts(graph: GraphShards, source: int, **kwargs) -> pa.Table:
    """Shortest-path counts from one source — Brandes' forward pass
    exposed as its own operator: (vid, depth, sigma) where sigma is
    the EXACT number of shortest source→v paths (integer walk counts
    riding the float64 channel, exact below 2^53 — asserted).
    Unreached vertices report depth −1 and sigma 0.  Same
    one-exchange-per-level cost as BFS."""
    fwd = run_superstep_loop(_BcForwardProgram(int(source)), graph,
                             checkpoint_every=0, **kwargs)
    t = fwd.state_table(["depth", "sigma"])
    depth = np.asarray(t["depth"], np.int64).copy()
    sigma = np.asarray(t["sigma"], np.float64)
    assert np.abs(sigma).max() < 2.0**53 if len(sigma) else True
    depth[depth == _UNSET] = -1
    return pa.table({
        "vid": t["vid"],
        "depth": pa.array(depth, pa.int64()),
        "sigma": pa.array(sigma.astype(np.int64), pa.int64()),
    })
