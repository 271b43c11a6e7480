"""Densest-subgraph 2(1+ε)-approximation by parallel peeling
(Bahmani–Kumar–Vassilvitskii, VLDB 2012).

Each round removes EVERY alive vertex whose degree (within the alive
set) is ≤ 2(1+ε)·E/V — compared in exact integers as
``deg · den · V ≤ 2 · num · E`` for ε = num/den − 1 — then recounts.
Survivors all have degree > 2(1+ε)ρ, and Σdeg ≤ 2E bounds them by
V/(1+ε), so the peel empties in ≤ log_{1+ε} V rounds and the densest
round (max E_r/V_r) is within 2(1+ε) of the optimum density.  With
the default ε = 1 (num=2, den=1) that is ≤ ⌈log₂ V⌉ + 1 rounds and a
4-approximation — the standard MapReduce trade-off.

Scale shape: the edge table streams once per round through a
``map_batches`` degree scan masked by the broadcast alive set (one
``ray.put`` bool array per round — the documented |V| ≪ |E| tier
caveat; the BSP alternative is a KcoreProgram-style decrement
VertexProgram with the (V, 2E) totals on the scatter broadcast
channel); only (index, count) partials leave each block.  No shuffle
at all — the threshold is a global scalar, not a per-key exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..util import np_col


def densest_peel(
    edges: rd.Dataset,
    vertex_ids: np.ndarray,
    rounds: int = 16,
    eps_num: int = 2,
    eps_den: int = 1,
    max_vertices: int = 100_000_000,
) -> tuple[pa.Table, np.ndarray]:
    """Run the peel for exactly ``rounds`` rounds (emitting one row
    per round even after the set empties, so a fixed-round SQL unroll
    compares row-for-row).  ``edges`` holds each undirected edge once
    as (src, dst); ``vertex_ids`` is the sorted global vid array.
    Threshold: remove v iff deg(v)·den·V ≤ 2·num·E (exact ints).

    Returns (per-round table (round, n_vertices, n_edges),
    best-round alive bool mask aligned with vertex_ids).

    Driver-memory contract (bounded): the alive mask (|V| B) and the
    per-round degree fold (|V|·8 B) are driver-resident — the peel
    threshold needs global V and E each round.  ``max_vertices``
    (default 10^8 ≈ 0.9 GB peak driver state) makes the bound
    explicit; beyond it keep (vid, alive, deg) as a Dataset and fold
    the round scalars with a tree-reduce instead.
    """
    vids = np.asarray(vertex_ids, np.int64)
    if len(vids) > max_vertices:
        raise ValueError(
            f"densest_peel driver-resident fold is bounded to "
            f"max_vertices={max_vertices} (got |V|={len(vids)}); raise "
            "the cap explicitly or restructure the round state as a "
            "(vid, alive) Dataset for larger graphs"
        )
    edges = edges.select_columns(["src", "dst"]).materialize()
    vref = ray.put(vids)
    alive = np.ones(len(vids), bool)
    best = (-1, 1, alive.copy())  # (E_r, V_r, mask) maximizing E/V
    rs, vs, es = [], [], []
    for r in range(rounds):
        aref = ray.put(alive)

        def _deg(b: pa.Table) -> pa.Table:
            vv, aa = ray.get(vref), ray.get(aref)
            s = np.searchsorted(vv, np_col(b, "src").astype(np.int64))
            d = np.searchsorted(vv, np_col(b, "dst").astype(np.int64))
            m = aa[s] & aa[d]
            u = np.r_[s[m], d[m]]
            iu, c = np.unique(u, return_counts=True)
            return pa.table({"i": pa.array(iu, pa.int64()),
                             "c": pa.array(c.astype(np.int64),
                                           pa.int64())})

        deg = np.zeros(len(vids), np.int64)
        if alive.any():
            for row in edges.map_batches(
                    _deg, batch_format="pyarrow").take_all():
                deg[row["i"]] += row["c"]
        V = int(alive.sum())
        assert V < 2**31, "int64 threshold product would overflow"
        E2 = int(deg[alive].sum())
        rs.append(r)
        vs.append(V)
        es.append(E2 // 2)
        if V > 0 and (E2 // 2) * best[1] > best[0] * V:
            best = (E2 // 2, V, alive.copy())
        # remove: deg*den*V <= num*E2  (2(1+eps)E = num/den * E2)
        alive = alive & (deg * eps_den * V > eps_num * E2)
    table = pa.table({
        "round": pa.array(rs, pa.int64()),
        "n_vertices": pa.array(vs, pa.int64()),
        "n_edges": pa.array(es, pa.int64()),
    })
    return table, best[2]
