"""Connected components (hash-min label propagation) as a VertexProgram.

Semantics (SURVEY.md §2.2 A2; BASELINE.json names "Shiloach-Vishkin /
hash-min"): undirected graph (build the GraphShards with
``symmetrize=True``); init label(v)=vid; per superstep

    label'(v) = min(label(v), min_{u~v, u active} label(u))

Only vertices whose label changed last superstep scatter (the frontier —
the engine analog of the reference's sparse frontier, gunrock/essentials
``framework/frontier/*.hxx`` [U]); fixpoint when zero labels change.
The fixpoint label of every vertex is the MIN vid of its component,
which is what the union-find CPU validator (`reference_impl.cc_ref`)
computes directly — assignments must match EXACTLY.

Monotonicity note: labels only decrease, so an early-converged run and
a fixed-k run with k ≥ convergence step give identical labels — the
property the unrolled DuckDB oracle relies on.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..checkpoint import CheckpointManager
from ..graph import GraphShards
from ..superstep import RunResult, run_superstep_loop
from ..util import csr_lookup, expand_neighbors, segment_min


class ConnectedComponentsProgram:
    name = "cc"
    state_cols = {"label": pa.int64(), "active": pa.int8()}
    msg_cols = {"mlabel": pa.int64()}

    def __init__(self, pointer_jump_every: int = 0, num_partitions: int = 8):
        """``pointer_jump_every=j`` > 0 enables the Shiloach-Vishkin
        shortcut every j supersteps: ``label(v) <- label(label(v))`` via a
        distributed self-join of the state on label->vid (SURVEY.md SS2.2
        A2) -- halves the superstep count on long chains.  The shortcut
        only lowers labels toward the (idempotent) min-label fixpoint, so
        results are identical with or without it."""
        self.pointer_jump_every = pointer_jump_every
        self.num_partitions = num_partitions

    def transform_state(self, ds, k: int):
        if not self.pointer_jump_every or k % self.pointer_jump_every:
            return ds
        import pyarrow.compute as pc

        from ..superstep import full_schema

        schema = full_schema(self)

        def _only(eq):
            def _f(t: pa.Table) -> pa.Table:
                op = pc.equal if eq else pc.not_equal
                return t.filter(op(t.column("kind"), 0))

            return _f

        state = ds.map_batches(_only(True), batch_format="pyarrow")
        rest = ds.map_batches(_only(False), batch_format="pyarrow")
        labels = state.map_batches(
            lambda t: pa.table({"jvid": t.column("vid"),
                                "jlabel": t.column("label")}),
            batch_format="pyarrow",
        )
        joined = state.join(
            labels,
            join_type="inner",  # every label IS a vid: inner is total
            num_partitions=self.num_partitions,
            on=("label",),
            right_on=("jvid",),
        )

        def _shortcut(t: pa.Table) -> pa.Table:
            arrays = []
            for f in schema:
                col = t.column("jlabel") if f.name == "label" else t.column(f.name)
                arrays.append(col.cast(f.type))
            return pa.Table.from_arrays(arrays, schema=schema)

        return joined.map_batches(_shortcut, batch_format="pyarrow").union(rest)

    def init_state(self, vids, outdeg):
        return {"label": vids.copy(), "active": np.ones(len(vids), np.int8)}

    def scatter(self, state, shard):
        act = state["active"] == 1
        if not act.any():
            return None, None
        vids, labels = state["vid"][act], state["label"][act]
        rows, found = csr_lookup(shard, vids)
        if not found.any():
            return None, None
        sel = np.flatnonzero(found)
        rep, nbrs, _ = expand_neighbors(shard, rows[sel])
        dst, mins, counts = segment_min(nbrs, labels[sel][rep])
        return {"dst": dst, "mlabel": mins, "mcount": counts}, None

    def apply(self, state, msgs, bcast):
        vids, old = state["vid"], state["label"]
        new = old.copy()
        nmsg = np.zeros(len(vids), np.int64)
        if len(msgs["vid"]):
            uniq, starts = np.unique(msgs["vid"], return_index=True)
            mins = np.minimum.reduceat(msgs["mlabel"], starts)
            cnts = np.add.reduceat(msgs["mcount"], starts)
            pos = np.searchsorted(vids, uniq)
            np.minimum.at(new, pos, mins)
            nmsg[pos] = cnts
        changed = (new < old).astype(np.int8)
        return {
            "label": new,
            "active": changed,
            "delta": (old - new).astype(np.float64),
            "changed": changed,
            "nmsg": nmsg,
        }

    def converged(self, totals: dict) -> bool:
        return totals["changed"] == 0


def connected_components(
    graph: GraphShards,
    *,
    max_iters: int = 200,
    pointer_jump_every: int = 0,
    ckpt: CheckpointManager | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    n_actors: int | None = None,
    **kwargs,
) -> RunResult:
    return run_superstep_loop(
        ConnectedComponentsProgram(
            pointer_jump_every=pointer_jump_every,
            num_partitions=graph.num_parts,
        ),
        graph,
        ckpt=ckpt,
        max_iters=max_iters,
        checkpoint_every=checkpoint_every,
        resume=resume,
        n_actors=n_actors,
        **kwargs,
    )


def components_table(result: RunResult) -> pa.Table:
    t = result.state_table(["label"])
    return t.rename_columns(["vid", "label"])
