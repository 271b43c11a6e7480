"""HyperBall — the neighborhood function N(v, r) via per-vertex
HyperLogLog registers (Boldi, Rosa & Vigna, "HyperANF: approximating
the neighbourhood function of very large graphs on a budget", WWW
2011; the HyperBall refinement in Boldi & Vigna 2013 — public papers).

Exact ball sizes at radius r cost Σ deg² intermediates at r=2 and blow
up combinatorially past it (see ``similarity.two_hop_counts``, the
exact r=2 twin this module is cross-validated against); HyperBall
caps the per-vertex state at 2^p registers so each round is ONE
max-combine over edges regardless of how large the balls grow — the
100-TB path for distance distributions / effective diameter.

Representation: the per-vertex sketch is kept SPARSE as (vid, reg,
rho) rows — most vertices touch few registers until their ball fills
— so a round is exactly the engine's standard shapes: one partitioned
join of the state with the symmetrized edge table on the source
vertex (messages = the neighbour's whole sketch), a union with the
current state (a vertex's ball contains itself and its previous
ball — HyperBall's monotone-union invariant), and one bucketed
grouped max on (vid, reg).  Register content = splitmix64 leading-
zero rank, identical to ``ops.hll_registers`` (``ops._hll_rank``), so
every round — not just the final estimate — is reproducible in DuckDB
through the shared SplitMix64 + leading-zero-unroll CTE chains.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..graph import GraphShards
from ..ops import _hll_rank, grouped_pandas_agg, join
from ..util import hash64, np_col


def hyperball(
    g: GraphShards,
    edges: rd.Dataset,
    p: int = 4,
    rounds: int = 2,
    num_buckets: int = 32,
) -> pa.Table:
    """Run ``rounds`` HyperBall iterations; return the final sparse
    register table (vid, reg, rho) sorted by (vid, reg) — pure-integer
    rows the driver's value-hash compare accepts.  Estimates derive
    via :func:`hyperball_estimates`.  Driver holds only the final
    ≤ |V|·2^p sparse cells (16·|V| at p=4)."""
    vids = ray.get(g.vertex_ids_ref)
    idx, rank = _hll_rank(hash64(vids.astype(np.int64)), p)
    state = rd.from_arrow(pa.table({
        "vid": pa.array(vids, pa.int64()),
        "reg": pa.array(idx, pa.int64()),
        "rho": pa.array(rank.astype(np.int64), pa.int64()),
    }))

    def _sym(t: pa.Table) -> pa.Table:
        s, d = np_col(t, "src"), np_col(t, "dst")
        return pa.table({"vid": pa.array(np.r_[s, d], pa.int64()),
                         "nbr": pa.array(np.r_[d, s], pa.int64())})

    sym = (edges.select_columns(["src", "dst"])
           .map_batches(_sym, batch_format="pyarrow").materialize())

    for _ in range(rounds):
        msgs = join(sym, state, on="vid", how="inner",
                    broadcast=False, num_buckets=num_buckets)
        msgs = msgs.map_batches(
            lambda t: pa.table({"vid": t.column("nbr"),
                                "reg": t.column("reg"),
                                "rho": t.column("rho")}),
            batch_format="pyarrow")
        state = grouped_pandas_agg(
            state.union(msgs), keys=["vid", "reg"],
            aggs={"rho": ("rho", "max")},
            num_buckets=num_buckets).materialize()

    rows = state.take_all()
    rows.sort(key=lambda r: (r["vid"], r["reg"]))
    return pa.table({
        "vid": pa.array([r["vid"] for r in rows], pa.int64()),
        "reg": pa.array([r["reg"] for r in rows], pa.int64()),
        "rho": pa.array([r["rho"] for r in rows], pa.int64()),
    })


def hyperball_estimates(sparse: pa.Table, p: int = 4) -> pa.Table:
    """Per-vertex ball-size estimates from the sparse register table
    (driver-side fold over ≤ |V|·2^p rows) — floats, so for the
    oracle gate ship the registers and keep this for analysis and
    the exact-r=2 cross-check pytest."""
    from ..ops import hll_estimate_from_registers

    vid = np_col(sparse, "vid")
    rho = np_col(sparse, "rho")
    bounds = np.flatnonzero(np.r_[True, vid[1:] != vid[:-1], True])
    out_v, out_e = [], []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        out_v.append(int(vid[lo]))
        out_e.append(hll_estimate_from_registers(rho[lo:hi], p))
    return pa.table({"vid": pa.array(out_v, pa.int64()),
                     "ball_est": pa.array(out_e, pa.float64())})
