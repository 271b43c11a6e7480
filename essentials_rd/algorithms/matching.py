"""Deterministic maximal matching via local-minimum edge rounds
(Israeli–Itai style): an alive edge joins the matching iff its
priority is the minimum among ALL alive edges touching either
endpoint; winners' endpoints leave the graph; repeat to fixpoint.
Every round the globally-minimal alive edge wins, so the loop always
progresses, and local minima are expected to match a constant fraction
of vertices per round — O(log) rounds in practice.

Priority is ``splitmix64(src·C + dst)`` compared as UNSIGNED 64-bit
with the (src, dst) pair as tie-break — a pure function of the edge,
so the result is independent of partitioning, block layout and cluster
size, and an unrolled SQL twin reproduces it round-for-round (the same
design as MIS/Luby, `mis.py`).

Physical shape per round: one ``map_batches`` pass emits per-block
per-vertex minimum-tuple PARTIALS (≤ 2·distinct-vertices rows per
block, never the edge list), the driver folds them into the |V|-sized
minimum arrays (documented O(|V|) residual, same contract as msf's
union-find), broadcasts once via ``ray.put``, and a second pass marks
winners and prunes matched endpoints.  Alive edges shrink geometrically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..util import hash64, np_col

MM_C = 0x9E3779B97F4A7C15 & (2**63 - 1)  # 63-bit golden multiplier


def _pri(s: np.ndarray, d: np.ndarray) -> np.ndarray:
    """uint64 edge priority — unsigned compare matches the SQL twin's
    UBIGINT ordering."""
    with np.errstate(over="ignore"):
        return hash64(s.astype(np.uint64) * np.uint64(MM_C)
                      + d.astype(np.uint64))


def _fold_min(vtx, p, s, d):
    """First tuple per vertex under (p, s, d) ascending."""
    order = np.lexsort((d, s, p, vtx))
    vtx, p, s, d = vtx[order], p[order], s[order], d[order]
    first = np.r_[True, vtx[1:] != vtx[:-1]]
    return vtx[first], p[first], s[first], d[first]


def maximal_matching(
    edges: rd.Dataset,
    max_rounds: int = 32,
) -> tuple[pa.Table, int, bool]:
    """``edges``: canonical (src < dst) undirected edge Dataset.
    Returns (matched edge table (src, dst, round) sorted by (src, dst),
    rounds, converged)."""
    cur = edges.select_columns(["src", "dst"]).materialize()
    out_s: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    out_r: list[np.ndarray] = []
    rounds = 0
    while rounds < max_rounds:
        if cur.count() == 0:
            return _result(out_s, out_d, out_r, rounds, True)
        rounds += 1

        def _minp_block(t: pa.Table) -> pa.Table:
            s = np_col(t, "src")
            d = np_col(t, "dst")
            p = _pri(s, d)
            vtx = np.concatenate([s, d])
            pp = np.concatenate([p, p])
            ss = np.concatenate([s, s])
            dd = np.concatenate([d, d])
            v2, p2, s2, d2 = _fold_min(vtx, pp, ss, dd)
            return pa.table(
                {
                    "vtx": pa.array(v2, pa.int64()),
                    "p": pa.array(p2.view(np.int64)),
                    "s": pa.array(s2, pa.int64()),
                    "d": pa.array(d2, pa.int64()),
                }
            )

        parts = cur.map_batches(_minp_block, batch_format="pyarrow").take_all()
        vtx = np.array([r["vtx"] for r in parts], np.int64)
        p = np.array([r["p"] for r in parts], np.int64).view(np.uint64)
        s = np.array([r["s"] for r in parts], np.int64)
        d = np.array([r["d"] for r in parts], np.int64)
        vtx, p, s, d = _fold_min(vtx, p, s, d)
        ref = ray.put((vtx, p, s, d))

        def _winners(t: pa.Table) -> pa.Table:
            mv, mp, ms, md = ray.get(ref)
            es = np_col(t, "src")
            ed = np_col(t, "dst")
            ep = _pri(es, ed)

            def _is_min(end):
                pos = np.searchsorted(mv, end)
                return (mp[pos] == ep) & (ms[pos] == es) & (md[pos] == ed)

            win = _is_min(es) & _is_min(ed)
            return pa.table(
                {
                    "src": pa.array(es[win], pa.int64()),
                    "dst": pa.array(ed[win], pa.int64()),
                }
            )

        wins = cur.map_batches(_winners, batch_format="pyarrow").take_all()
        ws = np.array([r["src"] for r in wins], np.int64)
        wd = np.array([r["dst"] for r in wins], np.int64)
        out_s.append(ws)
        out_d.append(wd)
        out_r.append(np.full(len(ws), rounds, np.int64))
        dead = np.unique(np.r_[ws, wd])
        dref = ray.put(dead)

        def _prune(t: pa.Table) -> pa.Table:
            dd_ = ray.get(dref)
            es = np_col(t, "src")
            ed = np_col(t, "dst")

            def _alive(v):
                pos = np.searchsorted(dd_, v)
                return ~(
                    (pos < len(dd_)) & (dd_[np.minimum(pos, max(len(dd_) - 1, 0))] == v)
                ) if len(dd_) else np.ones(len(v), bool)

            keep = _alive(es) & _alive(ed)
            return pa.table(
                {
                    "src": pa.array(es[keep], pa.int64()),
                    "dst": pa.array(ed[keep], pa.int64()),
                }
            )

        cur = cur.map_batches(_prune, batch_format="pyarrow").materialize()
    return _result(out_s, out_d, out_r, rounds, cur.count() == 0)


def _result(out_s, out_d, out_r, rounds, converged):
    s = np.concatenate(out_s) if out_s else np.zeros(0, np.int64)
    d = np.concatenate(out_d) if out_d else np.zeros(0, np.int64)
    r = np.concatenate(out_r) if out_r else np.zeros(0, np.int64)
    order = np.lexsort((d, s))
    t = pa.table(
        {
            "src": pa.array(s[order], pa.int64()),
            "dst": pa.array(d[order], pa.int64()),
            "round": pa.array(r[order], pa.int64()),
        }
    )
    return t, rounds, converged


def vertex_cover_2approx(edges) -> pa.Table:
    """Gavril's matching-based 2-approximate minimum vertex cover:
    the endpoint set of the deterministic maximal matching.  Every
    edge has a matched endpoint (else the matching weren't maximal),
    and any cover must take ≥ one endpoint per matched edge, so
    |cover| = 2·|M| ≤ 2·OPT — the classic distributed-friendly bound;
    all the distributed work is the matching itself, the cover is a
    driver-side distinct over its ≤ |V| endpoints.  Returns (vid)
    sorted ascending."""
    t, rounds, converged = maximal_matching(edges)
    assert converged, rounds
    vids = np.unique(np.r_[np.asarray(t["src"], np.int64),
                           np.asarray(t["dst"], np.int64)])
    return pa.table({"vid": pa.array(vids, pa.int64())})


def _fold_min_wz(vtx, p, z, s, d):
    """First tuple per vertex under (p, z, s, d) ascending — the
    weighted order with the hash tie-break."""
    order = np.lexsort((d, s, z, p, vtx))
    vtx, p, z, s, d = (a[order] for a in (vtx, p, z, s, d))
    first = np.r_[True, vtx[1:] != vtx[:-1]]
    return vtx[first], p[first], z[first], s[first], d[first]


def weighted_matching(
    edges: rd.Dataset,
    weight_col: str = "weight",
    max_rounds: int = 32,
) -> tuple[pa.Table, int, bool]:
    """GREEDY weighted matching as a parallel local-max fixpoint
    (Hoepman/Preis): an alive edge joins the matching iff it is the
    best edge at BOTH endpoints under the total order (weight DESC,
    splitmix64(src,dst), src, dst) — the hash tie-break keeps rounds
    O(log) on tie-heavy weights where a plain (src,dst) order would
    serialize into long dominance chains; winners' endpoints leave;
    repeat.  This fixpoint equals
    the SEQUENTIAL greedy matching that scans edges in that order —
    the classic ½-approximation to maximum-weight matching — because
    at every prefix of the order, a locally-dominant edge is exactly
    one the sequential scan would take; the parallel rounds just take
    all currently-dominant edges at once (O(log) rounds in practice,
    each the same broadcast-fold shape as ``maximal_matching``).
    Returns (matched (src, dst, w, round) sorted by (src, dst),
    rounds, converged)."""
    BIG = np.int64(1 << 62)
    cur = edges.select_columns(["src", "dst", weight_col]).materialize()
    out: list[tuple] = []
    rounds = 0
    while rounds < max_rounds:
        if cur.count() == 0:
            return _wresult(out, rounds, True)
        rounds += 1

        def _best_block(t: pa.Table) -> pa.Table:
            s = np_col(t, "src")
            d = np_col(t, "dst")
            w = np_col(t, weight_col).astype(np.int64)
            assert (w >= 0).all() and (w < (1 << 62)).all()
            p = (BIG - w)  # ascending p == weight descending
            z = _pri(s, d)
            vtx = np.concatenate([s, d])
            v2, p2, z2, s2, d2 = _fold_min_wz(
                vtx, np.concatenate([p, p]).astype(np.uint64),
                np.concatenate([z, z]),
                np.concatenate([s, s]), np.concatenate([d, d]))
            return pa.table({
                "vtx": pa.array(v2, pa.int64()),
                "p": pa.array(p2.view(np.int64)),
                "z": pa.array(z2.view(np.int64)),
                "s": pa.array(s2, pa.int64()),
                "d": pa.array(d2, pa.int64()),
            })

        parts = cur.map_batches(_best_block,
                                batch_format="pyarrow").take_all()
        vtx = np.array([r["vtx"] for r in parts], np.int64)
        p = np.array([r["p"] for r in parts], np.int64).view(np.uint64)
        z = np.array([r["z"] for r in parts], np.int64).view(np.uint64)
        s = np.array([r["s"] for r in parts], np.int64)
        d = np.array([r["d"] for r in parts], np.int64)
        vtx, p, z, s, d = _fold_min_wz(vtx, p, z, s, d)
        ref = ray.put((vtx, p, s, d))

        def _winners(t: pa.Table) -> pa.Table:
            mv, mp, ms, md = ray.get(ref)
            es = np_col(t, "src")
            ed = np_col(t, "dst")
            ew = np_col(t, weight_col).astype(np.int64)
            ep = (BIG - ew).view(np.uint64)

            def _is_best(end):
                pos = np.searchsorted(mv, end)
                return (mp[pos] == ep) & (ms[pos] == es) & (md[pos] == ed)

            win = _is_best(es) & _is_best(ed)
            return pa.table({
                "src": pa.array(es[win], pa.int64()),
                "dst": pa.array(ed[win], pa.int64()),
                "w": pa.array(ew[win], pa.int64()),
            })

        wins = cur.map_batches(_winners,
                               batch_format="pyarrow").take_all()
        ws = np.array([r["src"] for r in wins], np.int64)
        wd = np.array([r["dst"] for r in wins], np.int64)
        ww = np.array([r["w"] for r in wins], np.int64)
        out.append((ws, wd, ww, np.full(len(ws), rounds, np.int64)))
        dead = np.unique(np.r_[ws, wd])
        dref = ray.put(dead)

        def _prune(t: pa.Table) -> pa.Table:
            dd_ = ray.get(dref)
            es = np_col(t, "src")
            ed = np_col(t, "dst")

            def _alive(v):
                if not len(dd_):
                    return np.ones(len(v), bool)
                pos = np.searchsorted(dd_, v)
                return ~((pos < len(dd_))
                         & (dd_[np.minimum(pos, len(dd_) - 1)] == v))

            keep = _alive(es) & _alive(ed)
            return t.take(pa.array(np.flatnonzero(keep)))

        cur = cur.map_batches(_prune, batch_format="pyarrow").materialize()
    return _wresult(out, rounds, cur.count() == 0)


def _wresult(out, rounds, converged):
    if out:
        s = np.concatenate([o[0] for o in out])
        d = np.concatenate([o[1] for o in out])
        w = np.concatenate([o[2] for o in out])
        r = np.concatenate([o[3] for o in out])
    else:
        s = d = w = r = np.zeros(0, np.int64)
    order = np.lexsort((d, s))
    t = pa.table({
        "src": pa.array(s[order], pa.int64()),
        "dst": pa.array(d[order], pa.int64()),
        "w": pa.array(w[order], pa.int64()),
        "round": pa.array(r[order], pa.int64()),
    })
    return t, rounds, converged
