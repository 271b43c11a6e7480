"""The BSP superstep engine: scatter → combine → apply on Ray Data.

This is the Ray-native re-expression of the reference's operator layer
(gunrock/essentials ``framework/operators/{advance,filter,
neighborreduce}.hxx`` + the host enactor loop in ``framework/enactor.
hxx`` [U — snapshot absent, SURVEY.md §0]).  One superstep is
(BASELINE.json north_star, verbatim architecture):

  1. **scatter** — ``state.map_batches(_ScatterStage, concurrency=…)``:
     an actor pool whose workers hold zero-copy Arrow/NumPy CSR
     partition shards (fetched once per actor from the object store and
     cached); each state batch is expanded along its out-edges into
     messages, PRE-COMBINED per (destination, source-partition) — the
     stage-1 combine that tames hub skew exactly like explicit salting
     (salt = source partition id; see also ``ops.neighbor_reduce`` for
     the standalone degree-threshold salting operator);
  2. **combine shuffle on destination-vertex hash** — messages are
     stamped ``part = splitmix64(dst) % P`` and co-grouped with the
     vertex state via ``union → groupby("part").map_groups``;
  3. **apply** — per destination partition, messages are reduced
     (vectorized, deterministically sorted by (vid, source-part) so
     float sums are reproducible) and folded into new vertex state.

Between supersteps the state is materialized — either to a Parquet
checkpoint (with per-partition lineage: rows, message counts, changed
counts, max delta — BASELINE.json "per-partition lineage and
message-count metrics") or in the object store (``checkpoint_every``).

Vertex programs (PR/CC/LP/SpMV) implement the small ``VertexProgram``
protocol below — the analog of the reference's problem/enactor pair
(``framework/{problem,enactor}.hxx`` [U]), ≈50 lines each.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Callable, Protocol

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .checkpoint import CheckpointManager
from .graph import GraphShards
from .util import np_col, part_of

_BOOK_COLS: list[tuple[str, pa.DataType]] = [
    ("vid", pa.int64()),
    ("part", pa.int32()),
    ("kind", pa.int8()),  # 0=state, 1=message, 2=broadcast partial
    ("sp", pa.int32()),  # source partition of a message (determinism key)
]
_METRIC_COLS: list[tuple[str, pa.DataType]] = [
    ("delta", pa.float64()),
    ("changed", pa.int8()),
    ("nmsg", pa.int64()),
]

# Messages travel PACKED: one row per (source-partition →
# destination-partition) per scatter batch, carrying list<> columns of
# (dst, mcount, payload...).  The combine shuffle therefore moves
# ~|V| state rows plus ~P² packed rows whose bytes are pure message
# payload — no per-message row overhead, no null-state-column buffers
# (Arrow IPC materializes data buffers even for all-null fixed-width
# columns, which would double the shuffle volume row-wise).
_PK_DST = "pk_dst"
_PK_MCOUNT = "pk_mcount"


def _pk(col: str) -> str:
    return f"pk_{col}"


class VertexProgram(Protocol):
    """User-extension surface (SURVEY.md §2.7)."""

    name: str
    state_cols: dict[str, pa.DataType]
    msg_cols: dict[str, pa.DataType]

    def init_state(self, vids: np.ndarray, outdeg: np.ndarray) -> dict:
        """Per-vertex initial state columns (numpy dict)."""
        ...

    def scatter(self, state: dict, shard: dict) -> tuple[dict | None, dict | None]:
        """state (numpy dict incl. vid) + CSR shard → (messages, broadcast).

        messages: {"dst": int64[], "mcount": int64[], **msg_cols} —
        already locally combined per dst.  broadcast: {msg_col: scalar}
        partials summed across all partitions and handed to every
        apply (e.g. PageRank dangling mass).  Either may be None.
        """
        ...

    def apply(self, state: dict, msgs: dict, bcast: dict) -> dict:
        """Fold combined messages into state.  ``msgs`` arrays are sorted
        by (vid, sp).  Must return state_cols plus delta/changed/nmsg
        arrays aligned with ``state["vid"]``."""
        ...

    def converged(self, totals: dict) -> bool:
        ...


def full_schema(prog: VertexProgram) -> pa.Schema:
    pk_cols = [(_PK_DST, pa.list_(pa.int64())), (_PK_MCOUNT, pa.list_(pa.int64()))]
    pk_cols += [(_pk(c), pa.list_(t)) for c, t in prog.msg_cols.items()]
    names = (
        [n for n, _ in _BOOK_COLS]
        + list(prog.state_cols)
        + [n for n, _ in _METRIC_COLS]
        + [n for n, _ in pk_cols]
    )
    assert len(set(names)) == len(names), f"column collision in {prog.name}"
    fields = _BOOK_COLS + list(prog.state_cols.items()) + _METRIC_COLS + pk_cols
    return pa.schema(fields)


def _empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def _mk_table(schema: pa.Schema, n: int, cols: dict) -> pa.Table:
    arrays = []
    for f in schema:
        v = cols.get(f.name)
        if v is None:
            arrays.append(pa.nulls(n, f.type))
        elif isinstance(v, (pa.Array, pa.ChunkedArray)):
            arrays.append(v.cast(f.type) if v.type != f.type else v)
        elif np.isscalar(v):
            arrays.append(pa.array([v] * n, f.type))
        else:
            arrays.append(pa.array(np.asarray(v), f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


# per-worker-process shard cache for stateless-task scatter: worker
# processes are reused across map_batches tasks, so a shard is fetched
# (zero-copy from plasma) once per worker, not once per task.
_WORKER_SHARD_CACHE: dict = {}


def _cached_shard(ref) -> dict:
    s = _WORKER_SHARD_CACHE.get(ref)
    if s is None:
        if len(_WORKER_SHARD_CACHE) > 64:
            _WORKER_SHARD_CACHE.clear()
        s = ray.get(ref)
        _WORKER_SHARD_CACHE[ref] = s
    return s


def _scatter_batch(
    prog: VertexProgram, shard_refs, P: int, schema: pa.Schema, batch: pa.Table
) -> pa.Table:
    """Expand one state batch into pre-combined message rows (shared by
    all scatter modes)."""
    kind = np_col(batch, "kind")
    if (kind != 0).any():  # defensive: scatter only from state rows
        batch = batch.take(pa.array(np.flatnonzero(kind == 0)))
    parts = np_col(batch, "part")
    out: list[pa.Table] = []
    state_names = ["vid"] + list(prog.state_cols)
    for p in np.unique(parts):
        mask = np.flatnonzero(parts == p)
        sub = batch.take(pa.array(mask)) if len(mask) != len(parts) else batch
        state = {n: np_col(sub, n) for n in state_names}
        msgs, bcast = prog.scatter(state, _cached_shard(shard_refs[p]))
        if msgs is not None and len(msgs["dst"]):
            dst = np.asarray(msgs["dst"], dtype=np.int64)
            mcount = np.asarray(msgs.get("mcount", np.ones(len(dst))), np.int64)
            dp = part_of(dst, P)
            order = np.argsort(dp, kind="stable")
            uniq_dp, starts = np.unique(dp[order], return_index=True)
            offsets = np.r_[starts, len(dst)].astype(np.int32)
            nrows = len(uniq_dp)

            def _pack(arr: np.ndarray, typ: pa.DataType) -> pa.Array:
                return pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(arr[order], typ)
                )

            cols = {
                "vid": np.full(nrows, -1, np.int64),
                "part": uniq_dp.astype(np.int32),
                "kind": np.full(nrows, 1, np.int8),
                "sp": np.full(nrows, p, np.int32),
                # nmsg on a packed row = raw message count (lineage)
                "nmsg": np.add.reduceat(mcount[order], starts).astype(np.int64),
                _PK_DST: _pack(dst, pa.int64()),
                _PK_MCOUNT: _pack(mcount, pa.int64()),
            }
            for c, t in prog.msg_cols.items():
                cols[_pk(c)] = _pack(np.asarray(msgs[c]), t)
            out.append(_mk_table(schema, nrows, cols))
        if bcast is not None:
            boff = pa.array(np.arange(P + 1, dtype=np.int32), pa.int32())
            cols = {
                "vid": np.full(P, -1, np.int64),
                "part": np.arange(P, dtype=np.int32),
                "kind": np.full(P, 2, np.int8),
                "sp": np.full(P, p, np.int32),
                _PK_DST: pa.ListArray.from_arrays(
                    boff, pa.array(np.full(P, -1, np.int64), pa.int64())
                ),
                _PK_MCOUNT: pa.ListArray.from_arrays(
                    boff, pa.array(np.ones(P, np.int64), pa.int64())
                ),
            }
            for c, t in prog.msg_cols.items():
                cols[_pk(c)] = pa.ListArray.from_arrays(
                    boff, pa.array(np.full(P, bcast[c]), t)
                )
            out.append(_mk_table(schema, P, cols))
    if not out:
        return _empty(schema)
    return pa.concat_tables(out)


class _ScatterStage:
    """Actor-pool callable: holds CSR shards (zero-copy from plasma) in
    actor state, expands state batches into pre-combined messages.

    Shards are fetched lazily on first use and cached for the actor's
    lifetime — ``ray.get`` of a NumPy-bearing object is a zero-copy mmap
    of the node-local plasma segment.  NOTE: because Ray Data builds a
    fresh actor pool per Dataset execution, a loop with many short
    supersteps pays actor-startup latency every superstep — that is why
    ``scatter_mode="tasks"`` (identical dataflow, stateless tasks with a
    per-worker-process shard cache) is the default; "actors" is the
    spec-literal variant, best when supersteps are few and heavy.
    """

    def __init__(self, prog: VertexProgram, shard_refs: list, num_parts: int):
        self.prog = prog
        self.refs = shard_refs
        self.P = num_parts
        self.schema = full_schema(prog)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _scatter_batch(self.prog, self.refs, self.P, self.schema, batch)


def _make_apply(prog: VertexProgram, schema_ref, fused: tuple | None = None):
    """Build the map_groups fn for one part: split state/msgs/broadcast,
    sort deterministically, delegate to prog.apply.

    With ``fused=(shard_refs, num_parts)`` the fn also scatters the NEXT
    superstep's messages from the freshly applied state (the combine
    shuffle then carries state+messages together — one all-to-all per
    superstep instead of two stages)."""
    schema = schema_ref
    state_names = ["vid"] + list(prog.state_cols)
    msg_names = list(prog.msg_cols)

    def _apply(grp: pa.Table) -> pa.Table:
        kind = np_col(grp, "kind")
        vid_all = np_col(grp, "vid")
        part = int(np_col(grp, "part")[0])
        s_idx = np.flatnonzero(kind == 0)
        m_idx = np.flatnonzero(kind == 1)
        b_idx = np.flatnonzero(kind == 2)
        st_tbl = grp.take(pa.array(s_idx))
        state = {n: np_col(st_tbl, n) for n in state_names}
        order = np.argsort(state["vid"], kind="stable")
        state = {n: v[order] for n, v in state.items()}

        if len(m_idx):
            m_tbl = grp.take(pa.array(m_idx))
            # deterministic packed-row order: value-based key (sp, first
            # dst, length) — a source partition can emit several packed
            # rows (its state split across blocks), and arrival order
            # must never influence float reduction order
            msp = np_col(m_tbl, "sp")
            dl = m_tbl.column(_PK_DST).combine_chunks()
            lens = np.asarray(pc.list_value_length(dl), dtype=np.int64)
            firsts = np.asarray(
                pc.list_element(dl, 0).to_numpy(zero_copy_only=False)
            )
            rorder = np.lexsort((lens, firsts, msp))
            flat_idx = pa.array(rorder)
            def _unpack(col_name):
                col = m_tbl.column(col_name).combine_chunks().take(flat_idx)
                return np.asarray(col.flatten().to_numpy(zero_copy_only=False))
            mvid = _unpack(_PK_DST)
            mcnt = _unpack(_PK_MCOUNT)
            mcols = {n: _unpack(_pk(n)) for n in msg_names}
            # stable sort by destination only: equal-key order inherits
            # the deterministic packed-row order above
            morder = np.argsort(mvid, kind="stable")
            msgs = {"vid": mvid[morder], "mcount": mcnt[morder]}
            for n in msg_names:
                msgs[n] = mcols[n][morder]
        else:
            msgs = {"vid": np.zeros(0, np.int64), "mcount": np.zeros(0, np.int64)}
            for n in msg_names:
                msgs[n] = np.zeros(0)

        bcast: dict = {}
        if len(b_idx):
            b_tbl = grp.take(pa.array(b_idx))
            bsp = np_col(b_tbl, "sp")
            for n in msg_names:
                col = np.asarray(
                    pc.list_element(
                        b_tbl.column(_pk(n)).combine_chunks(), 0
                    ).to_numpy(zero_copy_only=False)
                )
                border = np.lexsort((col, bsp))  # value-based order
                bcast[n] = float(np.sum(col[border]))

        new = prog.apply(state, msgs, bcast)
        n = len(state["vid"])
        cols = {
            "vid": state["vid"],
            "part": np.full(n, part, np.int32),
            "kind": np.zeros(n, np.int8),
            "sp": np.full(n, -1, np.int32),
            "delta": np.asarray(new["delta"], np.float64),
            "changed": np.asarray(new["changed"], np.int8),
            "nmsg": np.asarray(new["nmsg"], np.int64),
        }
        for c in prog.state_cols:
            cols[c] = new[c]
        out = _mk_table(schema, n, cols)
        if fused is not None:
            refs, P = fused
            msg_tbl = _scatter_batch(prog, refs, P, schema, out)
            if msg_tbl.num_rows:
                out = pa.concat_tables([out, msg_tbl])
        # per-partition lineage metrics ride along as one kind=3 row —
        # the engine extracts them with a map-only scan instead of a
        # second groupby pass per superstep (incoming kind=3 rows from
        # the previous superstep are dropped by the kind split above)
        out = pa.concat_tables([out, _metric_row(schema, part, cols)])
        return out

    return _apply


def _metric_row(schema: pa.Schema, part: int, state_cols: dict) -> pa.Table:
    """kind=3 row: vid=changed_count, sp=rows, nmsg=msg_count,
    delta=Σdelta (the part is in the part column)."""
    n = len(state_cols["vid"])
    return _mk_table(
        schema,
        1,
        {
            "vid": np.array([int(state_cols["changed"].sum())], np.int64),
            "part": np.array([part], np.int32),
            "kind": np.array([3], np.int8),
            "sp": np.array([n], np.int32),
            "nmsg": np.array([int(state_cols["nmsg"].sum())], np.int64),
            "delta": np.array([float(state_cols["delta"].sum())], np.float64),
            "changed": np.array([0], np.int8),
        },
    )


@dataclass
class RunResult:
    state: rd.Dataset
    history: list[dict] = field(default_factory=list)
    supersteps: int = 0
    converged: bool = False
    total_messages: int = 0

    def state_table(self, cols: list[str]) -> pa.Table:
        """Small-result convenience: pull selected state columns sorted
        by vid (drivers/tests only — materializes |V| rows).  Filters to
        state rows (a fused-mode dataset also carries message rows)."""
        t = pa.Table.from_pylist(
            self.state.select_columns(["vid", "kind"] + cols).take_all()
        )
        t = t.filter(pa.compute.equal(t["kind"], 0)).drop_columns(["kind"])
        return t.sort_by("vid")

    def state_dataset(self) -> rd.Dataset:
        """State rows only, as a Dataset (drops fused-mode message rows)."""
        import pyarrow.compute as pc

        return self.state.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 0)), batch_format="pyarrow"
        )


def make_init_state(prog: VertexProgram, graph: GraphShards) -> rd.Dataset:
    """Initial full-schema state from the graph's vertex universe +
    out-degrees.

    Driver-side assembly of |V| rows — fine to ~10^7 vertices; the
    ids/degrees are |V|-sized, orders of magnitude below |E| (SURVEY.md
    §2.5 T3).  At larger scale this becomes a Dataset union of the
    degree tables, same downstream code.
    """
    vids = ray.get(graph.vertex_ids_ref)
    deg = np.zeros(len(vids), dtype=np.int64)
    for t in ray.get(list(graph.degree_refs)):
        dv = np_col(t, "vid")
        dd = np_col(t, "outdeg")
        pos = np.searchsorted(vids, dv)
        ok = pos < len(vids)
        ok[ok] = vids[pos[ok]] == dv[ok]  # ignore endpoints outside the universe
        deg[pos[ok]] += dd[ok]
    init = prog.init_state(vids, deg)
    schema = full_schema(prog)
    n = len(vids)
    cols = {
        "vid": vids,
        "part": part_of(vids, graph.num_parts),
        "kind": np.zeros(n, np.int8),
        "sp": np.full(n, -1, np.int32),
        "delta": np.zeros(n),
        "changed": np.zeros(n, np.int8),
        "nmsg": np.zeros(n, np.int64),
    }
    cols.update(init)
    tbl = _mk_table(schema, n, cols)
    # per-part metric rows for step 0's lineage (zero deltas/messages)
    pcounts = np.bincount(cols["part"], minlength=graph.num_parts)
    metric_tbls = [
        _metric_row(
            schema,
            p,
            {
                "vid": np.zeros(int(pcounts[p]), np.int64),
                "changed": np.zeros(0, np.int8),
                "nmsg": np.zeros(0, np.int64),
                "delta": np.zeros(0, np.float64),
            },
        )
        for p in range(graph.num_parts)
    ]
    tbl = pa.concat_tables([tbl] + metric_tbls)
    # one block per partition: Ray's sort-based groupby sizes its output
    # partitioning from the INPUT block count, so a single-block initial
    # state would collapse every later combine shuffle (and therefore
    # every apply/scatter stage) to ~1 task. P blocks here keeps the
    # whole BSP loop P-way parallel for its lifetime.
    return rd.from_arrow(tbl).repartition(graph.num_parts)


def _lineage(state_ds: rd.Dataset, k: int, wall_s: float) -> dict:
    """Collect the kind=3 per-partition metric rows (map-only scan +
    take of P rows — no shuffle)."""
    import pyarrow.compute as pc

    rows = (
        state_ds.map_batches(
            lambda t: t.filter(pc.equal(t.column("kind"), 3)),
            batch_format="pyarrow",
        )
        .select_columns(["part", "sp", "vid", "nmsg", "delta"])
        .take_all()
    )
    parts = [
        {
            "part": r["part"],
            "rows": r["sp"],
            "msg_count": r["nmsg"],
            "changed": r["vid"],
            "sum_delta": r["delta"],
        }
        for r in sorted(rows, key=lambda r: r["part"])
    ]
    totals = {
        "superstep": k,
        "rows": int(sum(p["rows"] for p in parts)),
        "msg_count": int(sum(p["msg_count"] or 0 for p in parts)),
        "changed": int(sum(p["changed"] or 0 for p in parts)),
        "sum_delta": float(sum(p["sum_delta"] or 0.0 for p in parts)),
        "wall_s": wall_s,
        "partitions": parts,
    }
    return totals


def run_superstep_loop(
    prog: VertexProgram,
    graph: GraphShards,
    *,
    ckpt: CheckpointManager | None = None,
    max_iters: int = 100,
    checkpoint_every: int = 1,
    n_actors: int | None = None,
    resume: bool = False,
    scatter_mode: str = "tasks",
    on_step_end: Callable[[int, dict], None] | None = None,
) -> RunResult:
    """Drive the BSP loop (the reference's host enactor [U]).

    ``checkpoint_every=0`` disables Parquet checkpoints (object-store
    materialization only — used by short oracle queries); the final
    state is still returned.  ``resume=True`` restarts from the last
    _SUCCESS step in ``ckpt`` (partial temp dirs are discarded).

    ``scatter_mode`` (measured in BENCH/BASELINE.md):
    - "tasks" (default): scatter = stateless ``map_batches`` tasks; CSR
      shards fetched zero-copy from plasma, cached per worker process;
    - "actors": scatter = ``map_batches`` actor pool holding the shards
      in actor state (spec-literal; pays pool startup per superstep);
    - "fused": scatter happens inside the combine ``map_groups`` right
      after apply — one all-to-all per superstep, lowest latency.
    Resume must use the checkpoint's mode family: "fused" checkpoints
    carry message rows, the others don't (asserted via lineage).
    """
    if n_actors is None:
        n_actors = max(1, min(graph.num_parts, int(ray.cluster_resources().get("CPU", 4))))
    assert scatter_mode in ("tasks", "actors", "fused")
    fused = scatter_mode == "fused"
    # programs with mode-dependent frontier semantics (CC pointer
    # jumping) can read the mode; harmless for everyone else
    prog._scatter_mode = scatter_mode
    schema = full_schema(prog)
    scatter_task = functools.partial(
        _scatter_batch, prog, graph.shard_refs, graph.num_parts, schema
    )
    history: list[dict] = []
    k0 = 0
    if resume:
        assert ckpt is not None, "resume requires a checkpoint dir"
        ckpt.clean_partials()
        last = ckpt.latest_step()
        if last is not None:
            state, lin0 = ckpt.load_step(last)
            assert lin0.get("fused", False) == fused, (
                "resume scatter_mode mismatch with checkpoint"
            )
            history = ckpt.load_history(last)
            k0 = last
        else:
            resume = False
    if not resume:
        state = make_init_state(prog, graph)
        if fused:
            # seed the pipeline: state_0 + messages scattered from state_0
            state = state.union(
                state.map_batches(
                    scatter_task, batch_format="pyarrow", batch_size=None,
                    zero_copy_batch=True,
                )
            )
        if ckpt is not None and checkpoint_every:
            t0 = time.perf_counter()
            state = ckpt.write_state(0, state)
            lin = _lineage(state, 0, time.perf_counter() - t0)
            lin["fused"] = fused
            ckpt.finalize_step(0, lin)
            history = [lin]
        else:
            state = state.materialize()
            history = []

    # if already converged at the resume point, return immediately
    if history and history[-1]["superstep"] > 0 and prog.converged(history[-1]):
        return RunResult(state, history, history[-1]["superstep"], True,
                         sum(h["msg_count"] for h in history))

    result = RunResult(state, history)
    for k in range(k0 + 1, max_iters + 1):
        t0 = time.perf_counter()
        if fused:
            new_state = state.groupby("part").map_groups(
                _make_apply(
                    prog, schema, fused=(graph.shard_refs, graph.num_parts)
                ),
                batch_format="pyarrow",
            )
        else:
            if scatter_mode == "actors":
                msgs = state.map_batches(
                    _ScatterStage,
                    fn_constructor_args=(prog, graph.shard_refs, graph.num_parts),
                    batch_format="pyarrow",
                    batch_size=None,
                    zero_copy_batch=True,
                    concurrency=(1, n_actors),
                    num_cpus=1,
                )
            else:  # stateless tasks — same dataflow, no pool startup
                msgs = state.map_batches(
                    scatter_task,
                    batch_format="pyarrow",
                    batch_size=None,
                    zero_copy_batch=True,
                )
            new_state = (
                state.union(msgs)
                .groupby("part")
                .map_groups(_make_apply(prog, schema), batch_format="pyarrow")
            )
        # optional program hook (e.g. CC pointer-jumping): runs before
        # the checkpoint write so checkpoints contain the transformed
        # state (resume stays exact).  The input is materialized first —
        # the transform fans out into several consumers (filters + both
        # sides of its bucketed join), and each consumer of a LAZY
        # dataset would re-execute the whole superstep prefix.
        transform = getattr(prog, "transform_state", None)
        if transform is not None:
            pre = new_state.materialize()
            new_state = transform(pre, k)
        do_ckpt = ckpt is not None and checkpoint_every and (k % checkpoint_every == 0)
        mat = new_state.materialize()
        # block-count guard: the sort-based groupby emits one output
        # partition per INPUT block, and union(state, msgs) feeds it ~2×
        # the state's blocks — unchecked, blocks double every superstep
        # (and triple on pointer-jump steps).  Run the cap as its OWN
        # execution: chaining a repartition onto the groupby pipeline
        # can deadlock the streaming executor at low CPU counts.
        if mat.num_blocks() > 3 * graph.num_parts:
            mat = mat.repartition(graph.num_parts).materialize()
        if do_ckpt:
            state = ckpt.write_state(k, mat)
        else:
            state = mat
        lin = _lineage(state, k, time.perf_counter() - t0)
        lin["fused"] = fused
        if do_ckpt:
            ckpt.finalize_step(k, lin)
        history.append(lin)
        result.supersteps = k
        if on_step_end is not None:
            on_step_end(k, lin)
        if prog.converged(lin):
            result.converged = True
            break
    result.state = state
    result.history = history
    result.total_messages = int(sum(h["msg_count"] for h in history))
    return result
