"""The BSP superstep engine: scatter → combine → apply on Ray Data.

This is the Ray-native re-expression of the reference's operator layer
(gunrock/essentials ``framework/operators/{advance,filter,
neighborreduce}.hxx`` + the host enactor loop in ``framework/enactor.
hxx`` [U — snapshot absent, SURVEY.md §0]).  One superstep is
(BASELINE.json north_star, verbatim architecture):

  1. **scatter** — ``state.map_batches(...)`` over workers holding
     zero-copy Arrow/NumPy CSR partition shards (fetched once from the
     object store and cached per worker / per actor); each state batch
     is expanded along its out-edges into messages, PRE-COMBINED per
     (destination, source-partition) — the stage-1 combine that tames
     hub skew exactly like explicit salting (salt = source partition
     id; see also ``ops.neighbor_reduce`` for the standalone
     degree-threshold salting operator).  State rows pass through the
     stage unchanged, so blocks stay partition-aligned and no
     ``union`` (which would double the block count every superstep)
     is needed;
  2. **combine shuffle on destination-vertex hash** — rows carry
     ``part = splitmix64(dst) % P`` and are co-grouped with the vertex
     state via ``groupby("part").map_groups``;
  3. **apply** — per destination partition, messages are reduced
     (vectorized, deterministically sorted by (vid, source-part) so
     float sums are reproducible) and folded into new vertex state.

**Executions vs supersteps.** ``steps_per_execution`` chains that many
scatter→combine→apply rounds lazily into ONE Ray Data execution before
the materialization barrier: per-execution fixed costs (executor
startup, sort sampling, driver coordination) are paid once per chain
instead of once per superstep — the difference between ~0.42 and
≥0.8 scaling efficiency at 8→32 CPUs (BENCH/BASELINE.md).  Results are
value-identical for any chain length; convergence is only *observed* at
execution boundaries, so a program may run up to
``steps_per_execution-1`` overshoot supersteps past its fixpoint
(harmless for monotone programs like CC/LP; a no-op-rate wall-time cost
for PR).

**Per-partition lineage** (BASELINE.json: "per-partition lineage and
message-count metrics") flows out-of-band: every apply pushes its
partition's ``{rows, msg_count, changed, sum_delta}`` to a zero-CPU
collector actor keyed by (superstep, partition) — idempotent under task
retries (values are deterministic, last write wins) — and the driver
polls until every expected partition reported.  This replaces a
per-superstep metric-extraction Dataset pass (a serial ~0.3-1 s that
capped scaling).  Metric rows (kind=3) still ride in the state blocks
for checkpoint/debug parity and for state transforms (CC pointer
jumping) that must regenerate boundary metrics.

Between executions the state is materialized — either to a Parquet
checkpoint (state rows only; checkpoints are scatter-mode-independent)
or in the object store (``checkpoint_every=0``).

Vertex programs (PR/CC/LP/SpMV/BFS/SSSP) implement the small
``VertexProgram`` protocol below — the analog of the reference's
problem/enactor pair (``framework/{problem,enactor}.hxx`` [U]),
≈50 lines each.
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
    ("kind", pa.int8()),  # 0=state, 1=message, 2=broadcast partial, 3=metrics
    ("sp", pa.int32()),  # source partition of a message (determinism key)
]
_METRIC_COLS: list[tuple[str, pa.DataType]] = [
    ("delta", pa.float64()),
    ("changed", pa.int8()),
    ("nmsg", pa.int64()),
]

# Messages travel PACKED: one row per (source-partition →
# destination-partition) per scatter batch, carrying list<> columns of
# (dst[, mcount], payload...).  The combine shuffle therefore moves
# ~|V| state rows plus ~P² packed rows whose bytes are pure message
# payload — no per-message row overhead, no null-state-column buffers
# (Arrow IPC materializes data buffers even for all-null fixed-width
# columns, which would double the shuffle volume row-wise).
# Programs whose apply() does not consume per-message counts set
# ``uses_mcount = False`` to drop the mcount payload from the shuffle
# entirely (PR/CC/SpMV: ⅓ less combine-shuffle volume); the raw
# traversed-edge count per packed row still rides in its ``nmsg``.
_PK_DST = "pk_dst"
_PK_MCOUNT = "pk_mcount"


def _pk(col: str) -> str:
    return f"pk_{col}"


def _uses_mcount(prog) -> bool:
    return bool(getattr(prog, "uses_mcount", True))


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
        """Fold combined messages into state.  ``msgs`` arrays arrive in
        DETERMINISTIC packed-row order (packed rows sorted by the
        value-based key (sp, first dst, length), then concatenated) but
        NOT grouped by vid — reduce per vid with an order-deterministic
        kernel (``np.bincount`` over ``searchsorted`` positions for
        sums, ``np.minimum.at`` for mins; see PageRankProgram).  Must
        return state_cols plus delta/changed/nmsg arrays aligned with
        ``state["vid"]``."""
        ...

    def converged(self, totals: dict) -> bool:
        ...


def full_schema(prog: VertexProgram) -> pa.Schema:
    # engines set prog._i32_dst when every vertex id fits int32 (true
    # until ~2.1e9 vertices): halves the dominant packed-dst payload of
    # the combine shuffle.  At 10^12-file scale ids exceed int32 and the
    # schema stays int64.
    dst_t = pa.int32() if getattr(prog, "_i32_dst", False) else pa.int64()
    pk_cols = [(_PK_DST, pa.list_(dst_t))]
    if _uses_mcount(prog):
        pk_cols.append((_PK_MCOUNT, pa.list_(pa.int64())))
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


# per-worker-process shard cache: worker processes are reused across
# map_batches tasks, so a shard is fetched (zero-copy from plasma) once
# per worker, not once per task.
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
    """Expand one state batch into pre-combined packed message rows and
    pass the state rows through unchanged (kind=3 metric rows are
    dropped — their content already reached the metrics collector)."""
    kind = np_col(batch, "kind")
    if (kind != 0).any():  # scatter only from state rows
        batch = batch.take(pa.array(np.flatnonzero(kind == 0)))
    parts = np_col(batch, "part")
    with_mcount = _uses_mcount(prog)
    out: list[pa.Table] = [batch]
    state_names = ["vid"] + list(prog.state_cols)
    for p in np.unique(parts):
        mask = np.flatnonzero(parts == p)
        sub = batch.take(pa.array(mask)) if len(mask) != len(parts) else batch
        state = {n: np_col(sub, n) for n in state_names}
        msgs, bcast = prog.scatter(state, _cached_shard(shard_refs[p]))
        if msgs is not None and len(msgs["dst"]):
            # keep the shard's native dst dtype (int32 when vids fit —
            # util.csr_from_edges): upcasting to int64 here would copy
            # the |messages| array every superstep only for _pack to
            # cast it straight back down to the int32 wire
            dst = np.asarray(msgs["dst"])
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
                # nmsg on a packed row = raw message count (lineage/TEPS)
                "nmsg": np.add.reduceat(mcount[order], starts).astype(np.int64),
                _PK_DST: _pack(dst, schema.field(_PK_DST).type.value_type),
            }
            if with_mcount:
                cols[_PK_MCOUNT] = _pack(mcount, pa.int64())
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
                    boff,
                    pa.array(
                        np.full(P, -1, np.int64),
                        schema.field(_PK_DST).type.value_type,
                    ),
                ),
            }
            if with_mcount:
                cols[_PK_MCOUNT] = pa.ListArray.from_arrays(
                    boff, pa.array(np.ones(P, np.int64), pa.int64())
                )
            for c, t in prog.msg_cols.items():
                cols[_pk(c)] = pa.ListArray.from_arrays(
                    boff, pa.array(np.full(P, bcast[c]), t)
                )
            out.append(_mk_table(schema, P, cols))
    if len(out) == 1:
        return out[0]
    return pa.concat_tables(out)


class _ScatterStage:
    """Actor-pool callable (the spec-literal "CSR partition shards held
    in actor-pool state"): holds CSR shards zero-copy from plasma in
    actor state, expands state batches into pre-combined messages.

    Shards are fetched lazily on first use and cached for the actor's
    lifetime — ``ray.get`` of a NumPy-bearing object is a zero-copy mmap
    of the node-local plasma segment.  The pool is created with
    ``max_restarts=0`` so an actor loss retries the task on a fresh
    actor instead of attempting an actor restart whose constructor args
    may have left the object store (ray#53727).
    """

    def __init__(self, prog: VertexProgram, shard_refs: list, num_parts: int):
        self.prog = prog
        self.refs = shard_refs
        self.P = num_parts
        self.schema = full_schema(prog)
        self.cache: dict[int, dict] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _scatter_batch(self.prog, self.refs, self.P, self.schema, batch)


@ray.remote(num_cpus=0)
class _MetricsCollector:
    """Out-of-band per-(superstep, partition) lineage sink.

    ``add`` is idempotent per key — apply tasks are deterministic, so a
    Ray retry re-reports identical values and last-write-wins is safe.
    """

    def __init__(self):
        self.steps: dict[int, dict[int, dict]] = {}

    def add(self, step: int, part: int, metrics: dict) -> None:
        self.steps.setdefault(step, {})[part] = metrics

    def get_range(self, lo: int, hi: int) -> dict[int, dict[int, dict]]:
        return {k: v for k, v in self.steps.items() if lo <= k <= hi}


def _drain(
    collector, lo: int, hi: int, expected_parts: list[int], timeout_s: float = 300.0
) -> dict[int, dict[int, dict]]:
    """Poll the collector until steps lo..hi all have every expected
    partition (actor message delivery is async w.r.t. task completion,
    so the driver must wait for the last stragglers — normally 0-1
    polls)."""
    want = set(expected_parts)
    deadline = time.monotonic() + timeout_s
    while True:
        got = ray.get(collector.get_range.remote(lo, hi))
        if all(want <= set(got.get(k, {})) for k in range(lo, hi + 1)):
            return got
        if time.monotonic() > deadline:
            missing = {
                k: sorted(want - set(got.get(k, {}))) for k in range(lo, hi + 1)
            }
            raise TimeoutError(f"metrics collector incomplete: {missing}")
        time.sleep(0.02)


def _make_apply(
    prog: VertexProgram,
    schema_ref,
    step_id: int = 0,
    collector=None,
):
    """Build the apply fn: split state/msgs/broadcast, order
    deterministically, delegate to prog.apply, report each partition's
    lineage metrics to the collector.

    Returned callable is a ``map_batches`` fn over HASH-PARTITIONED
    blocks (``repartition(keys=["part"])``): a block holds one or more
    COMPLETE partitions (hash co-location guarantees a part never
    splits), so the fn loops the parts present in its block."""
    schema = schema_ref
    state_names = ["vid"] + list(prog.state_cols)
    msg_names = list(prog.msg_cols)
    with_mcount = _uses_mcount(prog)

    def _apply_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _empty(schema)
        parts = np_col(block, "part")
        uniq = np.unique(parts)
        if len(uniq) == 1:
            return _apply_part(block, int(uniq[0]))
        outs = []
        for p in uniq:
            sub = block.take(pa.array(np.flatnonzero(parts == p)))
            outs.append(_apply_part(sub, int(p)))
        return pa.concat_tables(outs)

    def _apply_part(grp: pa.Table, part: int) -> pa.Table:
        kind = np_col(grp, "kind")
        s_idx = np.flatnonzero(kind == 0)
        m_idx = np.flatnonzero(kind == 1)
        b_idx = np.flatnonzero(kind == 2)
        st_tbl = grp.take(pa.array(s_idx))
        state = {n: np_col(st_tbl, n) for n in state_names}
        order = np.argsort(state["vid"], kind="stable")
        state = {n: v[order] for n, v in state.items()}

        msg_total = 0
        if len(m_idx):
            m_tbl = grp.take(pa.array(m_idx))
            msg_total = int(np_col(m_tbl, "nmsg").sum())
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
            mcnt = _unpack(_PK_MCOUNT) if with_mcount else np.ones(len(mvid), np.int64)
            # handed over in packed-row order (NOT vid-sorted): programs
            # reduce with bincount/minimum.at, whose summation order is
            # the deterministic concatenation order — no O(M log M)
            # argsort in the combine hot path
            msgs = {"vid": mvid, "mcount": mcnt}
            for n in msg_names:
                msgs[n] = _unpack(_pk(n))
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
        out = pa.concat_tables([out, _metric_row(schema, part, cols, msg_total)])
        if collector is not None:
            collector.add.remote(
                step_id,
                part,
                {
                    "rows": n,
                    "msg_count": msg_total,
                    "changed": int(cols["changed"].sum()),
                    "sum_delta": float(cols["delta"].sum()),
                },
            )
        return out

    return _apply_block


def _metric_row(
    schema: pa.Schema, part: int, state_cols: dict, msg_total: int | None = None
) -> pa.Table:
    """kind=3 row: vid=changed_count, sp=rows, nmsg=msg_count,
    delta=Σdelta (the part is in the part column)."""
    n = len(state_cols["vid"])
    if msg_total is None:
        msg_total = int(state_cols["nmsg"].sum())
    return _mk_table(
        schema,
        1,
        {
            "vid": np.array([int(state_cols["changed"].sum())], np.int64),
            "part": np.array([part], np.int32),
            "kind": np.array([3], np.int8),
            "sp": np.array([n], np.int32),
            "nmsg": np.array([msg_total], np.int64),
            "delta": np.array([float(state_cols["delta"].sum())], np.float64),
            "changed": np.array([0], np.int8),
        },
    )


def _metric_rows_from_blocks(state_ds: rd.Dataset) -> dict[int, dict]:
    """Re-extract kind=3 metric rows from a MATERIALIZED dataset's blocks
    (used after a state transform regenerated boundary metrics) — P tiny
    remote tasks over block refs, no Dataset execution."""

    @ray.remote(num_cpus=0)
    def _extract(block) -> list[tuple[int, dict]]:
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        if t.num_rows == 0 or "kind" not in t.column_names:
            return []
        k = np_col(t, "kind")
        m = t.take(pa.array(np.flatnonzero(k == 3)))
        out = []
        for i in range(m.num_rows):
            out.append(
                (
                    int(m.column("part")[i].as_py()),
                    {
                        "rows": int(m.column("sp")[i].as_py()),
                        "msg_count": int(m.column("nmsg")[i].as_py()),
                        "changed": int(m.column("vid")[i].as_py()),
                        "sum_delta": float(m.column("delta")[i].as_py()),
                    },
                )
            )
        return out

    refs = state_ds.get_internal_block_refs()
    out: dict[int, dict] = {}
    for lst in ray.get([_extract.remote(r) for r in refs]):
        for part, metrics in lst:
            out[part] = metrics
    return out


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
        state rows (kind=3 metric rows ride in the same blocks)."""
        t = pa.Table.from_pylist(
            self.state.select_columns(["vid", "kind"] + cols).take_all()
        )
        t = t.filter(pa.compute.equal(t["kind"], 0)).drop_columns(["kind"])
        return t.sort_by("vid")

    def state_dataset(self) -> rd.Dataset:
        """State rows only, as a Dataset (drops metric rows)."""
        return self.state.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 0)), batch_format="pyarrow"
        )


#: Vertex count above which partitionwise-safe programs build their
#: initial state with per-partition worker tasks instead of one
#: driver-side |V|-row assembly.  Below it the driver path is cheaper
#: (P task launches + P schema builds cost more than one small concat).
_DIST_INIT_MIN_V = 2_000_000


@ray.remote
def _init_state_part(prog, p: int, num_parts: int, vids_all, deg_tbl):
    """One partition's initial state block (+ its kind=3 metric row).

    ``vids_all`` arrives as a zero-copy plasma view of the shared sorted
    vertex universe (shipped once per node, like the CSR shards); the
    per-part slice, degree fold and ``prog.init_state`` all run worker
    side, so the driver never holds a |V|-proportional array.  Requires
    ``prog.init_state`` to be elementwise in (vids, outdeg) — declared
    via ``partitionwise_init = True`` on the program (position-aligned
    programs like SCC/BC-accumulate stay on the driver path).
    """
    pv = vids_all[part_of(vids_all, num_parts) == p]
    n = len(pv)
    deg = np.zeros(n, np.int64)
    # edges are hash-partitioned by part_of(src) (graph.py _prep), so
    # part p's degree table covers exactly part p's vids — no cross-part
    # contributions to fold.
    dv = np_col(deg_tbl, "vid")
    dd = np_col(deg_tbl, "outdeg")
    pos = np.searchsorted(pv, dv)
    ok = pos < n
    ok[ok] = pv[pos[ok]] == dv[ok]  # ignore endpoints outside the universe
    deg[pos[ok]] += dd[ok]
    init = prog.init_state(pv, deg)
    schema = full_schema(prog)
    cols = {
        "vid": pv,
        "part": np.full(n, p, np.int32),
        "kind": np.zeros(n, np.int8),
        "sp": np.full(n, -1, np.int32),
        "delta": np.zeros(n),
        "changed": np.zeros(n, np.int8),
        "nmsg": np.zeros(n, np.int64),
    }
    cols.update(init)
    tbl = _mk_table(schema, n, cols)
    if n:
        metric = _metric_row(
            schema,
            p,
            {
                "vid": np.zeros(n, np.int64),
                "changed": np.zeros(0, np.int8),
                "nmsg": np.zeros(0, np.int64),
                "delta": np.zeros(0, np.float64),
            },
        )
        tbl = pa.concat_tables([tbl, metric])
    return tbl


def _make_init_state_distributed(
    prog: VertexProgram, graph: GraphShards
) -> rd.Dataset:
    """Initial state as P worker-built blocks — the scale path.

    Bit-equal to the driver path (pytest-forced both ways): each block
    holds one partition's state rows (vid-sorted) plus its metric row,
    and downstream only needs the block COUNT (the combine shuffle
    re-keys on dst hash anyway), so one-block-per-part is strictly
    better parallelism-wise than the driver path's row-range split.
    """
    refs = [
        _init_state_part.remote(
            prog, p, graph.num_parts, graph.vertex_ids_ref,
            graph.degree_refs[p],
        )
        for p in range(graph.num_parts)
    ]
    return rd.from_arrow_refs(refs)


def make_init_state(prog: VertexProgram, graph: GraphShards) -> rd.Dataset:
    """Initial full-schema state from the graph's vertex universe +
    out-degrees.

    Programs whose ``init_state`` is elementwise in (vids, outdeg)
    declare ``partitionwise_init = True`` (PR/CC/LP do) and, above
    ``_DIST_INIT_MIN_V`` vertices, get the fully distributed per-part
    build — no |V|-proportional driver array.  Everything else (or
    small graphs, where P task launches cost more than one concat)
    takes the driver-side assembly below, fine to ~10^7 vertices
    (SURVEY.md §2.5 T3).
    """
    if (
        getattr(prog, "partitionwise_init", False)
        and graph.n_vertices >= _DIST_INIT_MIN_V
    ):
        return _make_init_state_distributed(prog, graph)
    return _make_init_state_driver(prog, graph)


def _make_init_state_driver(
    prog: VertexProgram, graph: GraphShards
) -> rd.Dataset:
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
    # per-part metric rows for step 0's state parquet (zero deltas)
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
        if pcounts[p] > 0
    ]
    tbl = pa.concat_tables([tbl] + metric_tbls)
    # one block per partition: Ray's sort-based groupby sizes its output
    # partitioning from the INPUT block count, so a single-block initial
    # state would collapse every later combine shuffle (and therefore
    # every apply/scatter stage) to ~1 task. P blocks here keeps the
    # whole BSP loop P-way parallel for its lifetime.
    return rd.from_arrow(tbl).repartition(graph.num_parts)


def _expected_parts(graph: GraphShards) -> list[int]:
    _, _, _, pcounts = graph.vertex_meta()
    return [p for p in range(graph.num_parts) if pcounts[p] > 0]


def _step0_lineage(graph: GraphShards, expected: list[int], wall_s: float) -> dict:
    n_v, _, _, pcounts = graph.vertex_meta()
    parts = [
        {"part": p, "rows": int(pcounts[p]), "msg_count": 0, "changed": 0,
         "sum_delta": 0.0}
        for p in expected
    ]
    return {
        "superstep": 0,
        "rows": int(n_v),
        "msg_count": 0,
        "changed": 0,
        "sum_delta": 0.0,
        "wall_s": wall_s,
        "partitions": parts,
    }


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
    steps_per_execution: int = 1,
    combine_shuffle: str = "sort",
    on_step_end: Callable[[int, dict], None] | None = None,
) -> RunResult:
    """Drive the BSP loop (the reference's host enactor [U]).

    ``checkpoint_every=0`` disables Parquet checkpoints (object-store
    materialization only — used by short oracle queries); the final
    state is still returned.  ``resume=True`` restarts from the last
    _SUCCESS step in ``ckpt`` (partial temp dirs are discarded);
    checkpoints contain state rows only, so a run may resume under a
    different ``scatter_mode`` / ``steps_per_execution`` than wrote
    them.

    ``scatter_mode``:
    - "tasks" (default): scatter = stateless ``map_batches`` tasks; CSR
      shards fetched zero-copy from plasma, cached per worker process;
    - "actors": scatter = ``map_batches`` actor pool holding the shards
      in actor state (spec-literal; pays pool startup per execution);
    - "fused": accepted alias of "tasks" (scatter and apply land in one
      fused Ray Data map stage per superstep either way).

    ``steps_per_execution=s`` chains s supersteps into one execution
    (see module docstring); checkpoints and convergence observation
    happen at execution boundaries, and ``checkpoint_every`` shortens a
    chain when a checkpoint step falls inside it.
    """
    if n_actors is None:
        n_actors = max(
            1, min(graph.num_parts, int(ray.cluster_resources().get("CPU", 4)))
        )
    assert scatter_mode in ("tasks", "actors", "fused")
    assert steps_per_execution >= 1
    assert combine_shuffle in ("sort", "hash")
    _ctx = rd.DataContext.get_current()
    _prev_strategy = _ctx.shuffle_strategy
    if combine_shuffle == "hash":
        # hash-keyed repartition is only served under the HASH_SHUFFLE
        # strategy; scope the switch to this loop (groupbys elsewhere
        # keep the session default)
        from ray.data.context import ShuffleStrategy

        _ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        return _run_superstep_loop_inner(
            prog, graph, ckpt=ckpt, max_iters=max_iters,
            checkpoint_every=checkpoint_every, n_actors=n_actors,
            resume=resume, scatter_mode=scatter_mode,
            steps_per_execution=steps_per_execution,
            combine_shuffle=combine_shuffle, on_step_end=on_step_end,
        )
    finally:
        _ctx.shuffle_strategy = _prev_strategy


def _run_superstep_loop_inner(
    prog: VertexProgram,
    graph: GraphShards,
    *,
    ckpt: CheckpointManager | None,
    max_iters: int,
    checkpoint_every: int,
    n_actors: int | None,
    resume: bool,
    scatter_mode: str,
    steps_per_execution: int,
    combine_shuffle: str,
    on_step_end: Callable[[int, dict], None] | None,
) -> RunResult:
    P = graph.num_parts
    n_v, lo_vid, hi_vid, pcounts = graph.vertex_meta()
    prog._i32_dst = bool(
        n_v == 0 or (hi_vid < 2**31 and lo_vid >= -(2**31))
    )
    schema = full_schema(prog)
    scatter_task = functools.partial(
        _scatter_batch, prog, graph.shard_refs, P, schema
    )

    def _add_scatter(d: rd.Dataset) -> rd.Dataset:
        if scatter_mode == "actors":
            return d.map_batches(
                _ScatterStage,
                fn_constructor_args=(prog, graph.shard_refs, P),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
                concurrency=(1, n_actors),
                num_cpus=1,
                max_restarts=0,
            )
        return d.map_batches(
            scatter_task, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True,
        )

    collector = _MetricsCollector.remote()
    expected = [p for p in range(P) if pcounts[p] > 0]
    history: list[dict] = []
    k0 = 0
    if resume:
        assert ckpt is not None, "resume requires a checkpoint dir"
        ckpt.clean_partials()
        last = ckpt.latest_step()
        if last is not None:
            state, _lin0 = ckpt.load_step(last)
            history = ckpt.load_history(last)
            k0 = last
        else:
            resume = False
    if not resume:
        t0 = time.perf_counter()
        state = make_init_state(prog, graph)
        if ckpt is not None and checkpoint_every:
            state = ckpt.write_state(0, state)
            lin = _step0_lineage(graph, expected, time.perf_counter() - t0)
            ckpt.finalize_step(0, lin)
            history = [lin]
        else:
            state = state.materialize()
            history = []

    # if already converged at the resume point, return immediately
    if history and history[-1]["superstep"] > 0 and prog.converged(history[-1]):
        return RunResult(
            state,
            history,
            history[-1]["superstep"],
            True,
            sum(h["msg_count"] for h in history),
        )

    result = RunResult(state, history)
    transform = getattr(prog, "transform_state", None)
    k = k0
    while k < max_iters and not result.converged:
        n_steps = min(steps_per_execution, max_iters - k)
        if ckpt is not None and checkpoint_every:
            # shorten the chain so the boundary lands on a checkpoint step
            to_ckpt = checkpoint_every - (k % checkpoint_every)
            n_steps = min(n_steps, to_ckpt)
        if transform is not None:
            # state transforms (CC pointer jumping) run at execution
            # boundaries; keep chains short enough that a due transform
            # is not skipped
            je = getattr(prog, "pointer_jump_every", 0)
            if je:
                n_steps = min(n_steps, je - (k % je))
        t0 = time.perf_counter()
        d = state
        for i in range(1, n_steps + 1):
            d = _add_scatter(d)
            # combine shuffle on destination-vertex hash.  Two physical
            # forms, value-identical (the apply kernels are
            # order-deterministic over packed-row order):
            # - "hash": keyed repartition (no sort) + stateless apply
            #   over co-located blocks;
            # - "sort": groupby("part").map_groups — range shuffle.
            apply_fn = _make_apply(prog, schema, step_id=k + i,
                                   collector=collector)
            if combine_shuffle == "hash":
                d = d.repartition(num_blocks=P, keys=["part"], sort=False)
                d = d.map_batches(
                    apply_fn, batch_format="pyarrow", batch_size=None,
                    zero_copy_batch=True,
                )
            else:
                d = d.groupby("part").map_groups(
                    apply_fn, batch_format="pyarrow"
                )
        boundary = k + n_steps
        mat = d.materialize()
        # optional program hook (e.g. CC pointer jumping): runs before
        # the checkpoint write so checkpoints contain the transformed
        # state (resume stays exact).  The input is materialized first —
        # the transform fans out into several consumers, and each
        # consumer of a LAZY dataset would re-execute the whole chain.
        transformed = False
        if transform is not None:
            post = transform(mat, boundary)
            if post is not mat:
                mat = post.materialize()
                transformed = True
        # block-count guard: transforms can fan out block counts;
        # unchecked they would grow across executions.
        if mat.num_blocks() > 3 * P:
            mat = mat.repartition(P).materialize()
        wall = time.perf_counter() - t0
        do_ckpt = (
            ckpt is not None and checkpoint_every and boundary % checkpoint_every == 0
        )
        if do_ckpt:
            state = ckpt.write_state(boundary, mat)
        else:
            state = mat
        got = _drain(collector, k + 1, boundary, expected)
        if transformed:
            # the transform regenerated the boundary step's kind=3 rows
            # (e.g. labels lowered by a pointer jump); re-read them so
            # convergence sees the post-transform truth
            got[boundary] = _metric_rows_from_blocks(state)
        lins = []
        for i in range(k + 1, boundary + 1):
            parts = [{"part": p, **got[i][p]} for p in sorted(got[i])]
            lins.append(
                {
                    "superstep": i,
                    "rows": int(sum(q["rows"] for q in parts)),
                    "msg_count": int(sum(q["msg_count"] for q in parts)),
                    "changed": int(sum(q["changed"] for q in parts)),
                    "sum_delta": float(sum(q["sum_delta"] for q in parts)),
                    "wall_s": wall / n_steps,
                    "partitions": parts,
                }
            )
        if do_ckpt:
            # the step is durable before any user hook can observe it
            ckpt.finalize_step(boundary, lins[-1])
        for lin in lins:
            history.append(lin)
            result.supersteps = lin["superstep"]
            if on_step_end is not None:
                on_step_end(lin["superstep"], lin)
            if prog.converged(lin):
                result.converged = True
        k = boundary
    result.state = state
    result.history = history
    result.total_messages = int(sum(h["msg_count"] for h in history))
    return result
