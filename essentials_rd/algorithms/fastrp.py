"""FastRP node embeddings (Chen, Sui, Ding, Xie 2019 — public
algorithm: "Fast and Accurate Network Embeddings via Very Sparse
Random Projection"), deterministic and integer-exact.

The projection matrix R is the very-sparse Achlioptas-style sign
matrix derived from splitmix64 — R[v, j] = +1 / −1 / 0 as
``splitmix64(v·2654435761 + j) mod 6`` is 0 / 1 / other (density 1/3)
— a pure function of (vid, dim), so identical on every worker with no
broadcast, at any cluster size, and reproducible in SQL.  The
embedding is the K-hop aggregation X_K = A^K R computed by K
multi-channel SpMV supersteps: the engine's message schema carries all
d dimensions as separate packed columns in the SAME exchange, so one
superstep per hop regardless of d.  Every intermediate is an exact
integer (sums of ±1 walk counts; float64 channel exact below 2^53,
asserted), so the oracle's unrolled twin matches bit-for-bit.

Downstream use normalizes/weights rows (floats); the exported artifact
stays integer so the verification surface has no rounding anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_sum

_VMIX = np.uint64(2654435761)


def _proj_row(vids: np.ndarray, j: int) -> np.ndarray:
    """R[:, j] ∈ {+1, −1, 0} from splitmix64(vid·2654435761 + j)."""
    from ..util import hash64

    with np.errstate(over="ignore"):
        key = vids.astype(np.uint64) * _VMIX + np.uint64(j)
    h = hash64(key.view(np.int64)) % np.uint64(6)
    return np.where(h == 0, 1.0, np.where(h == 1, -1.0, 0.0))


class FastRPProgram:
    name = "fastrp"

    def __init__(self, d: int, k_iters: int):
        self.d = d
        self.k = k_iters
        self.state_cols = {f"x{j}": pa.float64() for j in range(d)}
        self.msg_cols = {f"m{j}": pa.float64() for j in range(d)}
        self.uses_mcount = False

    def init_state(self, vids, outdeg):
        return {f"x{j}": _proj_row(vids, j) for j in range(self.d)}

    def scatter(self, state, shard):
        vids = state["vid"]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        out = None
        for j in range(self.d):
            dst, sums, counts = segment_sum(nbrs, state[f"x{j}"][sel][rep])
            if out is None:
                out = {"dst": dst, "mcount": counts}
            out[f"m{j}"] = sums
        return out, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        n = len(vids)
        out = {}
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
            for j in range(self.d):
                out[f"x{j}"] = np.bincount(
                    pos, weights=msgs[f"m{j}"], minlength=n)
        else:
            for j in range(self.d):
                out[f"x{j}"] = np.zeros(n)
        delta = np.abs(out["x0"] - state["x0"])
        out["delta"] = delta
        out["changed"] = (delta > 0).astype(np.int8)
        out["nmsg"] = nmsg
        return out

    def converged(self, totals: dict) -> bool:
        return totals["superstep"] >= self.k


def fastrp(graph: GraphShards, *, d: int = 8, k_iters: int = 2,
           n_actors: int | None = None, **kwargs) -> RunResult:
    return run_superstep_loop(
        FastRPProgram(d, k_iters), graph, ckpt=None, max_iters=k_iters,
        checkpoint_every=0, n_actors=n_actors, **kwargs,
    )


def fastrp_table(result: RunResult, d: int = 8) -> pa.Table:
    """(vid, dim, val) long form — exact int64 A^K R entries; asserts
    the float64 channel never left the exact-integer range."""
    t = result.state_table([f"x{j}" for j in range(d)])
    vid = np.asarray(t["vid"], np.int64)
    cols_v = [np.asarray(t[f"x{j}"], np.float64) for j in range(d)]
    mx = max(float(np.abs(c).max()) for c in cols_v) if len(vid) else 0.0
    assert mx < 2.0**53, "FastRP walk sums exceeded 2^53"
    n = len(vid)
    return pa.table({
        "vid": pa.array(np.repeat(vid, d), pa.int64()),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n),
                        pa.int64()),
        "val": pa.array(np.concatenate(
            [np.stack(cols_v, axis=1).ravel()]).astype(np.int64)
            if n else np.zeros(0, np.int64), pa.int64()),
    })
