"""Geolocation inference (iterative location propagation) as a
VertexProgram.

Semantics (SURVEY.md §2.2 A7 family; upstream gunrock/essentials
``algorithms/geo.hxx`` [U — snapshot absent] infers missing vertex
locations from located neighbors; upstream refines with a spatial
median, here the semantics are pinned label-once/mean so the operator
is EXACTLY SQL-oracle-checkable): seed vertices carry (lat, lon); each
round, every unlocated vertex that has ≥ 1 located neighbor takes the
component-wise MEAN of ALL neighbors located in previous rounds, and
is fixed from then on.  Fixpoint: every vertex connected to a seed is
located; isolated-from-seed vertices stay unlocated (reported NULL-ish
as -1).

Float-exactness: seed coordinates are integer-valued doubles, so the
running neighbor sums are order-independent in float64 and the final
mean (exact-sum ÷ count) is bit-identical to DuckDB's AVG.

Frontier-sparse: only newly-located vertices scatter; unlocated
vertices ACCUMULATE (sum_lat, sum_lon, cnt) in state across rounds, so
the mean is over all located neighbors to date without re-sending."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_sum


class GeoProgram:
    name = "geo"
    state_cols = {
        "lat": pa.float64(),
        "lon": pa.float64(),
        "located": pa.int8(),
        "active": pa.int8(),
        "slat": pa.float64(),
        "slon": pa.float64(),
        "scnt": pa.int64(),
    }
    msg_cols = {"mlat": pa.float64(), "mlon": pa.float64(), "mcnt": pa.int64()}
    uses_mcount = False

    def __init__(self, seed_vids: np.ndarray, seed_lat: np.ndarray,
                 seed_lon: np.ndarray):
        self.seed_vids = np.asarray(seed_vids, np.int64)
        self.seed_lat = np.asarray(seed_lat, np.float64)
        self.seed_lon = np.asarray(seed_lon, np.float64)

    def init_state(self, vids, outdeg):
        n = len(vids)
        lat = np.full(n, -1.0)
        lon = np.full(n, -1.0)
        located = np.zeros(n, np.int8)
        pos = np.searchsorted(vids, self.seed_vids)
        ok = (pos < n)
        ok[ok] = vids[pos[ok]] == self.seed_vids[ok]
        lat[pos[ok]] = self.seed_lat[ok]
        lon[pos[ok]] = self.seed_lon[ok]
        located[pos[ok]] = 1
        return {
            "lat": lat,
            "lon": lon,
            "located": located,
            "active": located.copy(),  # seeds announce themselves first
            "slat": np.zeros(n),
            "slon": np.zeros(n),
            "scnt": np.zeros(n, np.int64),
        }

    def scatter(self, state, shard):
        act = state["active"] >= 1
        if not act.any():
            return None, None
        vids = state["vid"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        lat = state["lat"][act][sel][rep]
        lon = state["lon"][act][sel][rep]
        dst, slat, counts = segment_sum(nbrs, lat)
        _, slon, _ = segment_sum(nbrs, lon)
        return {
            "dst": dst,
            "mlat": slat,
            "mlon": slon,
            "mcnt": counts.astype(np.int64),
            "mcount": counts,
        }, None

    def apply(self, state, msgs, bcast):
        vids = state["vid"]
        n = len(vids)
        lat = state["lat"].copy()
        lon = state["lon"].copy()
        located = state["located"].astype(bool)
        slat = state["slat"].copy()
        slon = state["slon"].copy()
        scnt = state["scnt"].copy()
        nmsg = np.zeros(n, np.int64)
        if len(msgs["vid"]):
            pos = np.searchsorted(vids, msgs["vid"])
            np.add.at(slat, pos, msgs["mlat"])
            np.add.at(slon, pos, msgs["mlon"])
            np.add.at(scnt, pos, msgs["mcnt"])
            nmsg = np.bincount(pos, minlength=n).astype(np.int64)
        newly = (~located) & (scnt > 0)
        lat[newly] = slat[newly] / scnt[newly]
        lon[newly] = slon[newly] / scnt[newly]
        return {
            "lat": lat,
            "lon": lon,
            "located": (located | newly).astype(np.int8),
            "active": newly.astype(np.int8),
            "slat": slat,
            "slon": slon,
            "scnt": scnt,
            "delta": newly.astype(np.float64),
            "changed": newly.astype(np.int8),
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def geo(
    graph: GraphShards,
    seed_vids: np.ndarray,
    seed_lat: np.ndarray,
    seed_lon: np.ndarray,
    *,
    max_iters: int = 200,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    return run_superstep_loop(
        GeoProgram(seed_vids, seed_lat, seed_lon),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def locations_table(result: RunResult) -> pa.Table:
    """(vid, lat, lon) sorted by vid; unlocated = (-1, -1)."""
    t = result.state_table(["lat", "lon"])
    return t.rename_columns(["vid", "lat", "lon"])
