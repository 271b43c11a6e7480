"""Minimum spanning forest (Borůvka) over a distributed edge table.

Semantics (SURVEY.md §2.2 A7 family; upstream gunrock/essentials
``algorithms/mst.hxx`` [U — snapshot absent]): classic Borůvka — each
round every component picks its minimum outgoing edge (ties broken by
(weight, src, dst), which makes the forest UNIQUE and the operator
deterministic), picked edges merge their components, repeat until no
inter-component edge remains.  O(log |V|) rounds.

Physical plan per round: ONE distributed pass over the (immutable)
edge table — relabel endpoints by the current component map (broadcast
via ``ray.put``, |V|-sized — the engine's documented driver-side
budget, same as every vertex-state table), drop intra-component edges,
and pre-combine to ≤ #components candidate rows per block (per-block
lexsort minima).  The driver then merges the ≤ #components × #blocks
candidates, unions components with vectorized pointer-jumping, and
loops.  The big side (edges) is only ever streamed, never collected.

MST/MSF is not expressible in ANSI SQL, so the driver-facing query is
rows-only; correctness is pinned by pytest against a NumPy Kruskal
(``reference_impl.msf_ref``) on planted and random graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..util import np_col


def boruvka_msf(
    edges: rd.Dataset,
    vertex_ids: np.ndarray,
    *,
    max_rounds: int = 64,
    max_vertices: int = 100_000_000,
) -> tuple[pa.Table, float]:
    """edges (canonical undirected src<dst, deduped, weighted) →
    (msf edge table (src, dst, weight) sorted by (src, dst), total
    weight).  Deterministic: min edge per component by (w, src, dst).

    Driver-memory contract (bounded, not unbounded): the component
    array (|V|·8 B) and round-1 candidate winners (≤ one row per
    component) are driver-resident — Borůvka's union step is a global
    fixpoint each round.  ``max_vertices`` (default 10^8 ≈ 1.6 GB peak
    driver state) makes the bound explicit; beyond it, run the
    distributed CC engine on the picked-edge star graph per round
    instead (superstep.py), trading ~P shuffles per round for O(P)
    driver memory.
    """
    vids = np.asarray(vertex_ids, dtype=np.int64)
    n = len(vids)
    if n > max_vertices:
        raise ValueError(
            f"boruvka_msf driver-resident union is bounded to "
            f"max_vertices={max_vertices} (got |V|={n}); raise the cap "
            "explicitly or switch the union step to the distributed CC "
            "engine (essentials_rd.superstep) for larger graphs"
        )
    # component id = dense position of the representative vertex
    comp = np.arange(n, dtype=np.int64)

    edges = edges.select_columns(["src", "dst", "weight"]).materialize()

    picked_src: list[np.ndarray] = []
    picked_dst: list[np.ndarray] = []
    picked_w: list[np.ndarray] = []

    for _ in range(max_rounds):
        comp_ref = ray.put(comp)
        vids_ref = ray.put(vids)

        def _candidates(batch: pa.Table) -> pa.Table:
            c = ray.get(comp_ref)
            v = ray.get(vids_ref)
            s = np_col(batch, "src")
            d = np_col(batch, "dst")
            w = np_col(batch, "weight")
            cs = c[np.searchsorted(v, s)]
            cd = c[np.searchsorted(v, d)]
            keep = cs != cd
            if not keep.any():
                return pa.table(
                    {
                        "comp": pa.array([], pa.int64()),
                        "w": pa.array([], pa.float64()),
                        "src": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                    }
                )
            s, d, w, cs, cd = s[keep], d[keep], w[keep], cs[keep], cd[keep]
            # each inter-component edge is a candidate for BOTH sides
            comp2 = np.r_[cs, cd]
            w2 = np.r_[w, w]
            s2 = np.r_[s, s]
            d2 = np.r_[d, d]
            # per-block min per component by (w, src, dst)
            order = np.lexsort((d2, s2, w2, comp2))
            c_s = comp2[order]
            first = np.r_[True, c_s[1:] != c_s[:-1]]
            sel = order[first]  # original row index of each comp's winner
            return pa.table(
                {
                    "comp": pa.array(comp2[sel], pa.int64()),
                    "w": pa.array(w2[sel], pa.float64()),
                    "src": pa.array(s2[sel], pa.int64()),
                    "dst": pa.array(d2[sel], pa.int64()),
                }
            )

        parts = [
            t
            for t in ray.get(
                edges.map_batches(_candidates, batch_format="pyarrow").to_arrow_refs()
            )
            if t.num_rows
        ]
        if not parts:
            break
        cand = pa.concat_tables(parts)
        comp_c = np_col(cand, "comp")
        w_c = np_col(cand, "w")
        s_c = np_col(cand, "src")
        d_c = np_col(cand, "dst")
        # global per-component min by (w, src, dst)
        order = np.lexsort((d_c, s_c, w_c, comp_c))
        cc = comp_c[order]
        first = np.r_[True, cc[1:] != cc[:-1]]
        win = order[first]
        ws, ss, ds = w_c[win], s_c[win], d_c[win]
        # dedup: one physical edge may win for both its components.
        # Lexsort the actual (src, dst) pairs rather than a packed
        # src*2^32+dst key, which would wrap/collide for vertex ids
        # >= 2^32 (boruvka_msf accepts arbitrary int64 ids).
        o2 = np.lexsort((ds, ss))
        ss, ds, ws = ss[o2], ds[o2], ws[o2]
        keep2 = np.r_[True, (ss[1:] != ss[:-1]) | (ds[1:] != ds[:-1])]
        ss, ds, ws = ss[keep2], ds[keep2], ws[keep2]
        picked_src.append(ss)
        picked_dst.append(ds)
        picked_w.append(ws)
        # union: hash-min CC over the picked star graph, iterated to the
        # fixpoint (a single minimum.at pass is NOT enough — two
        # components may both pick edges into a third)
        ps = comp[np.searchsorted(vids, ss)]
        pd_ = comp[np.searchsorted(vids, ds)]
        parent = np.arange(n, dtype=np.int64)
        while True:
            a, b = parent[ps], parent[pd_]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            if not (parent[hi] > lo).any():
                break
            np.minimum.at(parent, hi, lo)
            while True:
                nxt = parent[parent]
                if np.array_equal(nxt, parent):
                    break
                parent = nxt
        comp = parent[comp]

    if picked_src:
        s_all = np.concatenate(picked_src)
        d_all = np.concatenate(picked_dst)
        w_all = np.concatenate(picked_w)
    else:
        s_all = np.zeros(0, np.int64)
        d_all = np.zeros(0, np.int64)
        w_all = np.zeros(0, np.float64)
    order = np.lexsort((d_all, s_all))
    tbl = pa.table(
        {
            "src": pa.array(s_all[order], pa.int64()),
            "dst": pa.array(d_all[order], pa.int64()),
            "weight": pa.array(w_all[order], pa.float64()),
        }
    )
    return tbl, float(w_all.sum())
