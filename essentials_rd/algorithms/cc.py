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
    # label=vid, active=1 — elementwise: distributed init eligible
    partitionwise_init = True

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


def cc_incremental(
    labels,
    delta,
    *,
    num_buckets: int = 32,
    new_vertices: bool = True,
):
    """Incremental CC maintenance for edge INSERTIONS: given converged
    min-vid component labels (``(vid, label)`` — the engine's or any
    hash-min fixpoint) and a delta edge table ``(src, dst)``, return a
    ``(vid, label)`` Dataset **bit-identical to a scratch recompute**
    over base ∪ delta — while paying only O(|delta|) new work instead
    of re-traversing the 100-TB base graph.

    Plan (the graph IVM shape):
    1. two partitioned LEFT joins ship each delta endpoint its current
       label (``labels`` is the big side at scale — never broadcast;
       an endpoint absent from ``labels`` is a NEW vertex and acts as
       its own label via ``pc.coalesce``);
    2. the CONTRACTED multigraph (label_a, label_b) is deduped in one
       bucketed exchange — its size is bounded by |delta|, the IVM
       contract, so the min-label fixpoint + pointer-jumping runs
       driver-side over ≤ 2|delta| ids (documented small side; a
       cluster-scale delta should rebuild from scratch instead);
    3. the old→new mapping (only labels that actually merged) ships as
       two sorted arrays; ONE pass over ``labels`` rewrites merged
       components via searchsorted, and an anti join appends rows for
       vertices the base graph never saw.

    Insertions only: deleting an edge can SPLIT a component, which
    min-label maintenance cannot express — decremental CC needs
    spanning-forest state (Holm–de Lichtenberg–Thorup) and is out of
    scope.  Correctness: merged components take the min of their old
    min-vids, which equals the scratch min-vid of the union component;
    untouched components keep their label — so equality with the
    scratch run is exact, per-row.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from ..ops import grouped_pandas_agg, join
    from ..util import np_col

    delta = delta.select_columns(["src", "dst"]).materialize()
    if delta.count() == 0:
        return labels

    def _as_src_key(t: pa.Table) -> pa.Table:
        return pa.table({"vid": t.column("src").cast(pa.int64()),
                         "w": t.column("dst").cast(pa.int64())})

    a = join(delta.map_batches(_as_src_key, batch_format="pyarrow"),
             labels, on="vid", how="left", broadcast=False,
             num_buckets=num_buckets)

    def _keep_la(t: pa.Table) -> pa.Table:
        return pa.table({"vid": t.column("w"),
                         "la": pc.coalesce(t.column("label"),
                                           t.column("vid"))})

    b = join(a.map_batches(_keep_la, batch_format="pyarrow"),
             labels, on="vid", how="left", broadcast=False,
             num_buckets=num_buckets)

    def _canon_pairs(t: pa.Table) -> pa.Table:
        la = np_col(t, "la")
        lb = np.asarray(pc.coalesce(t.column("label"),
                                    t.column("vid")).combine_chunks())
        m = la != lb
        lo = np.minimum(la[m], lb[m])
        hi = np.maximum(la[m], lb[m])
        return pa.table({"lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64())})

    contracted = grouped_pandas_agg(
        b.map_batches(_canon_pairs, batch_format="pyarrow"),
        keys=["lo", "hi"], aggs={"n": ("hi", "count")},
        num_buckets=num_buckets).take_all()
    lo = np.array([r["lo"] for r in contracted], np.int64)
    hi = np.array([r["hi"] for r in contracted], np.int64)

    # driver-side min-label fixpoint with pointer jumping over the
    # contracted ids (≤ 2|delta| of them)
    uniq = np.unique(np.r_[lo, hi])
    lab = uniq.copy()
    if len(uniq):
        ia = np.searchsorted(uniq, lo)
        ib = np.searchsorted(uniq, hi)
        while True:
            prev = lab.copy()
            np.minimum.at(lab, ia, lab[ib])
            np.minimum.at(lab, ib, lab[ia])
            lab = lab[np.searchsorted(uniq, lab)]  # pointer jump
            if np.array_equal(prev, lab):
                break
    changed = lab != uniq
    old_s, new_s = uniq[changed], lab[changed]  # uniq sorted => old_s sorted

    def _lookup(v: np.ndarray) -> np.ndarray:
        if not len(old_s):
            return v
        pos = np.minimum(np.searchsorted(old_s, v), len(old_s) - 1)
        hit = old_s[pos] == v
        return np.where(hit, new_s[pos], v)

    def _apply(t: pa.Table) -> pa.Table:
        return pa.table({
            "vid": t.column("vid").cast(pa.int64()),
            "label": pa.array(
                _lookup(np_col(t, "label").astype(np.int64)), pa.int64()),
        })

    updated = labels.map_batches(_apply, batch_format="pyarrow")
    if not new_vertices:
        return updated

    def _endpoints(t: pa.Table) -> pa.Table:
        s, d = np_col(t, "src"), np_col(t, "dst")
        return pa.table({"vid": pa.array(
            np.r_[s, d].astype(np.int64), pa.int64())})

    dv = grouped_pandas_agg(
        delta.map_batches(_endpoints, batch_format="pyarrow"),
        keys=["vid"], aggs={"n": ("vid", "count")},
        num_buckets=num_buckets)
    missing = join(dv.select_columns(["vid"]), labels, on="vid",
                   how="anti", broadcast=False, num_buckets=num_buckets)

    def _own(t: pa.Table) -> pa.Table:
        v = np_col(t, "vid").astype(np.int64)
        return pa.table({"vid": pa.array(v, pa.int64()),
                         "label": pa.array(_lookup(v), pa.int64())})

    return updated.union(missing.map_batches(_own, batch_format="pyarrow"))
