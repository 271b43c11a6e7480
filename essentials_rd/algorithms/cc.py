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
    # apply() reduces labels by min — per-message counts are not
    # consumed, so drop them from the combine-shuffle payload
    uses_mcount = False

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
        """Shiloach-Vishkin shortcut pass at the boundary of superstep k.

        Correctness requirements (a jump that silently lowers labels
        breaks the BSP contract in two ways — both are handled here):
        1. jump-changed vertices must re-enter the FRONTIER (active=1,
           changed=1, delta+=) or their lowered labels never scatter
           in the next execution;
        2. superstep k's per-partition metric rows were computed by
           apply BEFORE the jump, so they are regenerated afterwards
           (and the engine re-reads them from the transformed blocks) —
           otherwise a ``changed==0`` apply step could end the loop
           while the jump still moved labels (premature convergence).
        The regeneration is a ``groupby(part)`` pass, which also
        restores part-grouped blocks after the join scattered them.
        """
        if not self.pointer_jump_every or k % self.pointer_jump_every:
            return ds
        import pyarrow.compute as pc

        from ..superstep import _metric_row, full_schema
        from ..util import np_col

        schema = full_schema(self)
        pk_names = [f.name for f in schema if f.name.startswith("pk_")]

        from ..ops import hash_bucket_agg

        # execution boundaries are state-only: kind=0 rows plus stale
        # kind=3 metric rows (regenerated below)
        state = ds.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), 0)),
            batch_format="pyarrow",
        )

        # Bucketed self-join on label→vid (the portable partitioned hash
        # join: tag both sides, one bucket shuffle, vectorized lookup in
        # the bucket).  Ray 2.49's Dataset.join is avoided here: its
        # acero finalize rejects list<> payload columns and trips on
        # empty hash partitions of small inputs.
        def _tag(is_lookup: bool):
            def _f(t: pa.Table) -> pa.Table:
                t = t.drop_columns(pk_names)
                if is_lookup:
                    t = pa.table(
                        {
                            "vid": t.column("vid"),
                            "part": t.column("part"),
                            "kind": t.column("kind"),
                            "sp": t.column("sp"),
                            "label": t.column("label"),
                            "active": t.column("active"),
                            "delta": t.column("delta"),
                            "changed": t.column("changed"),
                            "nmsg": t.column("nmsg"),
                        }
                    )
                    return pa.table(
                        {
                            **{c: t.column(c) for c in t.column_names},
                            "jkey": t.column("vid"),
                            "tag": pa.array(
                                np.ones(t.num_rows, np.int8), pa.int8()
                            ),
                        }
                    )
                return pa.table(
                    {
                        **{c: t.column(c) for c in t.column_names},
                        "jkey": t.column("label"),
                        "tag": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                    }
                )

            return _f

        left = state.map_batches(_tag(False), batch_format="pyarrow")
        lookup = state.map_batches(_tag(True), batch_format="pyarrow")

        def _join_bucket(grp: pa.Table) -> pa.Table:
            tag = np_col(grp, "tag")
            lk = grp.take(pa.array(np.flatnonzero(tag == 1)))
            st = grp.take(pa.array(np.flatnonzero(tag == 0)))
            keys = np_col(lk, "jkey")
            vals = np_col(lk, "label")
            korder = np.argsort(keys)
            keys, vals = keys[korder], vals[korder]
            old = np_col(st, "label")
            pos = np.searchsorted(keys, old)
            ok = (pos < len(keys)) & (keys[np.minimum(pos, len(keys) - 1)] == old)
            jlabel = np.where(ok, vals[np.minimum(pos, len(keys) - 1)], old)
            new = np.minimum(old, jlabel)
            jumped = new < old
            cols = {
                "vid": np_col(st, "vid"),
                "part": np_col(st, "part"),
                "kind": np_col(st, "kind"),
                "sp": np_col(st, "sp"),
                "label": new,
                # jump-lowered labels must scatter in the next execution
                "active": np.maximum(np_col(st, "active"),
                                     jumped.astype(np.int8)),
                "changed": np.maximum(np_col(st, "changed"),
                                      jumped.astype(np.int8)),
                "delta": np_col(st, "delta") + (old - new).astype(np.float64),
                "nmsg": np_col(st, "nmsg"),
            }
            from ..superstep import _mk_table

            return _mk_table(schema, len(new), cols)

        jumped_ds = hash_bucket_agg(
            left.union(lookup),
            lambda b: np_col(b, "jkey"),
            _join_bucket,
            num_buckets=max(self.num_partitions, 8),
        )

        def _regroup(grp: pa.Table) -> pa.Table:
            kind = np_col(grp, "kind")
            s_idx = np.flatnonzero(kind == 0)
            part = int(np_col(grp, "part")[0])
            st = grp.take(pa.array(s_idx))
            metric = _metric_row(
                schema,
                part,
                {
                    "vid": np_col(st, "vid"),
                    "changed": np_col(st, "changed"),
                    "nmsg": np_col(st, "nmsg"),
                    "delta": np_col(st, "delta"),
                },
            )
            return pa.concat_tables([grp, metric])

        # (block-count growth from the bucketed join is capped by the
        # engine's post-materialization repartition guard)
        return jumped_ds.groupby("part").map_groups(
            _regroup, batch_format="pyarrow"
        )

    def init_state(self, vids, outdeg):
        return {"label": vids.copy(), "active": np.ones(len(vids), np.int8)}

    def scatter(self, state, shard):
        act = state["active"] >= 1  # the frontier: changed last superstep
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
            # packed-row order, not vid-grouped; min is order-exact and
            # unbuffered minimum.at beats the argsort+reduceat path
            pos = np.searchsorted(vids, msgs["vid"])
            np.minimum.at(new, pos, msgs["mlabel"])
            nmsg = np.bincount(pos, minlength=len(vids)).astype(np.int64)
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
