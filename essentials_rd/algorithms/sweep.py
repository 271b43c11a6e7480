"""Sweep-cut conductance profile — the local-clustering primitive.

Given a ranked vertex prefix (here: PPR scores sorted descending, the
Andersen–Chung–Lang FOCS'06 local-clustering recipe — public
algorithm), report for every prefix length k the exact integer cut and
volume.  The conductance φ(k) = cut(k)/min(vol(k), 2|E|−vol(k)) then
derives from two exact int64s, so the PROFILE is hash-exact even
though φ itself is a ratio.

Scale shape: the rank map is k ≤ T entries (driver-small by
construction — T is the sweep budget, not the graph size); every edge
block folds TWO (T+2)-bin histograms (min-endpoint-rank,
max-endpoint-rank) — ZERO shuffle, one small row per block — and the
driver turns the folded histograms into prefix sums:

    cut(k) = #edges with exactly one endpoint ranked ≤ k
           = Σ_{r≤k} hist_min(r) − Σ_{r≤k} hist_max(r).

This is the engine's standard sketch-fold pattern (int_histogram /
cm_sketch) applied to the edge stream; the edge table never moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..util import np_col


def sweep_profile(
    edges: rd.Dataset,
    ranked_vids: np.ndarray,
    degrees: np.ndarray,
) -> pa.Table:
    """(k, vid, cut_k, vol_k) for k = 1..len(ranked_vids).

    ``edges``: canonical undirected pairs (src < dst, each once).
    ``ranked_vids``: vertex ids in rank order (best first).
    ``degrees``: degree of each ranked vertex, same order.
    """
    ranked_vids = np.asarray(ranked_vids, np.int64)
    degrees = np.asarray(degrees, np.int64)
    t_n = len(ranked_vids)
    order = np.argsort(ranked_vids, kind="stable")
    sv = ranked_vids[order]
    sr = (np.arange(t_n, dtype=np.int64) + 1)[order]  # rank of sv[i]
    unranked = np.int64(t_n + 1)

    def _rank_of(x: np.ndarray) -> np.ndarray:
        if t_n == 0:
            return np.full(len(x), unranked)
        pos = np.searchsorted(sv, x)
        pos_c = np.minimum(pos, t_n - 1)
        hit = sv[pos_c] == x
        return np.where(hit, sr[pos_c], unranked)

    def _partial(t: pa.Table) -> pa.Table:
        rs = _rank_of(np_col(t, "src").astype(np.int64))
        rd_ = _rank_of(np_col(t, "dst").astype(np.int64))
        minr = np.minimum(rs, rd_)
        maxr = np.maximum(rs, rd_)
        hm = np.bincount(minr[minr <= t_n], minlength=t_n + 1)
        hx = np.bincount(maxr[maxr <= t_n], minlength=t_n + 1)
        return pa.table({"h": pa.array(
            [np.concatenate([hm, hx]).astype(np.int64).tobytes()],
            pa.large_binary())})

    parts = (edges.select_columns(["src", "dst"])
             .map_batches(_partial, batch_format="pyarrow").take_all())
    tot = np.zeros(2 * (t_n + 1), np.int64)
    for r in parts:
        tot += np.frombuffer(r["h"], np.int64)
    hm, hx = tot[: t_n + 1], tot[t_n + 1:]
    cut = np.cumsum(hm[1:]) - np.cumsum(hx[1:])
    vol = np.cumsum(degrees)
    ks = np.arange(1, t_n + 1, dtype=np.int64)
    return pa.table({
        "k": pa.array(ks, pa.int64()),
        "vid": pa.array(ranked_vids, pa.int64()),
        "cut_k": pa.array(cut, pa.int64()),
        "vol_k": pa.array(vol, pa.int64()),
    })
