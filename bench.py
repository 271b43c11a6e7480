"""Benchmark harness (BASELINE.md measurement protocol).

Headline: the flagship corpus→graph pipeline at a size scaled to
$GRAFT_SF_DIR's scale factor — deterministic synthetic source-code
corpus (seed 42, cached in /tmp) → sha256 + import-reference edge
derivation → partitioned CSR build → PageRank to convergence + CC to
fixpoint.  Reports wall seconds plus TEPS (traversed edges/sec, from
the engine's per-superstep raw message-count lineage — BASELINE.md).

Also times three driver-table queries over $GRAFT_SF_DIR itself.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

`--scaling`: runs the headline twice in fresh processes at
RAY_GRAFT_CPUS=8 and 32 on the SAME input (the in-sandbox substitute
for the north_rule's N vs 4N cluster criterion) and reports both TEPS
plus efficiency = (T_32/T_8)/4; also appends the numbers to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CORPUS_CACHE = "/tmp/essentials_rd_bench_corpus"
WORK = "/tmp/essentials_rd_bench_work"

# per-sf synthetic corpus size (edges ≈ 10 × vertices, 5% hub-directed)
SIZES = {
    "0.001": (3_000, 30_000),
    "0.01": (30_000, 300_000),
    "0.1": (300_000, 3_000_000),
    "1": (3_000_000, 30_000_000),
}
# --scaling uses a larger graph (50M directed edges at sf0.1): the TEPS
# criterion measures the PR+CC graph phase, which must be
# compute-dominated for efficiency to reflect scaling rather than
# fixed per-superstep latency (built once, cached in /tmp)
SCALING_SIZES = {
    "0.001": (30_000, 300_000),
    "0.01": (200_000, 2_500_000),
    "0.1": (2_000_000, 25_000_000),
    "1": (4_000_000, 50_000_000),
}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else "0.1"


def _graph_phase(g, *, warmup: bool = True) -> dict:
    import time as _t

    from essentials_rd.algorithms import connected_components, pagerank

    if warmup:
        # one untimed superstep: spawns the worker pool, imports modules
        # and faults the CSR shards into every worker's plasma mmap —
        # one-time costs that are not part of the TEPS-phase metric
        pagerank(g, tol=0.0, max_iters=1, checkpoint_every=0)

    t0 = _t.perf_counter()
    # steps_per_execution=1 for PR: the per-superstep tol check fires a
    # superstep earlier than the chained variant (5 vs 6 at bench scale)
    # and measured per-message TEPS is no worse; CC keeps chaining (its
    # shrinking frontier makes late supersteps cheap, so amortizing the
    # execution barrier still pays there)
    # wire="q30": int32 fixed-point messages (mval = rint(sum·2^30)) —
    # 8 B/packed message instead of 12, int-exact summation; converged
    # drift vs the f64 wire ≤ ~1e-9 absolute (validated at 1e-6 with
    # two orders of headroom by tests/test_engine_algorithms.py)
    pr = pagerank(g, tol=1e-8, max_iters=60, checkpoint_every=0,
                  steps_per_execution=1, wire="q30")
    t_pr = _t.perf_counter() - t0
    pr_msgs = pr.total_messages

    t0 = _t.perf_counter()
    cc = connected_components(g, max_iters=100, checkpoint_every=0,
                              steps_per_execution=2)
    t_cc = _t.perf_counter() - t0
    cc_msgs = cc.total_messages

    return {
        "pr_sec": round(t_pr, 2),
        "pr_supersteps": pr.supersteps,
        "pr_converged": pr.converged,
        "pr_teps": int(pr_msgs / t_pr) if t_pr else 0,
        "cc_sec": round(t_cc, 2),
        "cc_supersteps": cc.supersteps,
        "cc_teps": int(cc_msgs / t_cc) if t_cc else 0,
        "n_vertices": g.n_vertices,
        "n_edges_directed": g.n_edges,
        "graph_sec": round(t_pr + t_cc, 2),
    }


def run_headline() -> dict:
    from essentials_rd.corpus import generate_bench_corpus
    from essentials_rd.derive import add_sha256, derive_edges, read_corpus
    from essentials_rd.graph import build_graph

    sf = _sf_of(SF_DIR)
    n_v, n_e = SIZES.get(sf, SIZES["0.1"])
    meta = generate_bench_corpus(CORPUS_CACHE, n_vertices=n_v, n_edges=n_e, seed=42)

    num_parts = 32
    # warm the Ray worker POOL (imports + process spawn) out of the
    # timed window — workers are long-lived on a real cluster, so
    # derive_sec measures the pipeline, not one-time process spin-up.
    # Deliberately does NOT touch the corpus files (no page-cache warm).
    import ray.data as _rd

    _rd.range(1_000, override_num_blocks=64).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    t0 = time.perf_counter()
    # read sized to the one block count every downstream stage wants —
    # saves derive's explicit repartition exchange (num_blocks=0)
    files = add_sha256(read_corpus(meta["dir"], override_num_blocks=64))
    edges, vertices, names_ref, n_heavy = derive_edges(files, cap=10_000,
                                                   num_blocks=0)
    edges = edges.materialize()
    t_derive = time.perf_counter() - t0

    t0 = time.perf_counter()
    g = build_graph(
        edges.select_columns(["src", "dst"]),
        os.path.join(WORK, f"graph_{sf}_{NUM_CPUS}"),
        num_parts,
        symmetrize=True,
        persist=False,  # headline never resumes; CLI keeps the checkpoint
    )
    t_build = time.perf_counter() - t0

    h = _graph_phase(g, warmup=False)
    h["derive_sec"] = round(t_derive, 2)
    h["build_sec"] = round(t_build, 2)
    h["headline_sec"] = round(t_derive + t_build + h["graph_sec"], 2)
    return h


def prepare_scaling_graph() -> str:
    """Derive + build the --scaling graph ONCE into a shared dir; the
    timed runs reload the immutable edge checkpoint (the TEPS metric
    measures the PR+CC phase, not the one-time ETL)."""
    from essentials_rd.corpus import generate_bench_corpus
    from essentials_rd.derive import add_sha256, derive_edges, read_corpus
    from essentials_rd.graph import build_graph

    sf = _sf_of(SF_DIR)
    n_v, n_e = SCALING_SIZES.get(sf, SCALING_SIZES["0.1"])
    gdir = os.path.join(WORK, f"scaling_graph_{sf}_v{n_v}_e{n_e}")
    if os.path.exists(os.path.join(gdir, "_READY")):
        return gdir
    meta = generate_bench_corpus(CORPUS_CACHE, n_vertices=n_v, n_edges=n_e, seed=42)
    files = add_sha256(read_corpus(meta["dir"]))
    edges, *_ = derive_edges(files, cap=10_000)
    build_graph(edges.select_columns(["src", "dst"]).materialize(), gdir, 32,
                symmetrize=True)
    with open(os.path.join(gdir, "_READY"), "w") as f:
        f.write("ok")
    return gdir


def graph_only(gdir: str, reps: int = 2) -> None:
    """One scaling leg: steady-state TEPS in THIS fresh process.

    Warm-up (one complete untimed PR + CC pass) faults the CSR shards
    into every worker's plasma mmap, spawns the worker pool and warms
    the code paths — one-time costs a long-running cluster job
    amortizes away, but which at high CPU counts would otherwise be a
    2-3x multiplier on the short timed phase (measured: cold CC at 16
    cpus 93.8 s vs warm 27.6 s on the 50M-edge graph).  The timed reps
    then measure the steady phase; min of ``reps`` is reported.  Every
    leg runs the identical protocol, so efficiencies compare
    steady-state throughput at N vs 4N CPUs."""
    from essentials_rd.graph import reload_graph

    g = reload_graph(os.path.join(gdir, "edges"))
    _graph_phase(g, warmup=False)  # full untimed PR + CC warm pass
    h = min(
        (_graph_phase(g, warmup=False) for _ in range(reps)),
        key=lambda r: r["graph_sec"],
    )
    h["num_cpus"] = NUM_CPUS
    print(json.dumps(h))


def run_queries() -> dict:
    import __ray_entry__ as e

    out = {}
    qs = e.queries()
    for name in ("pagerank_k8", "cc_labels", "triangles_total",
                 "near_dup_pairs", "cosine_near_dup", "tfidf_top1",
                 "bloom_join_urgent", "tpch_q3", "fastrp_embed8",
                 "hll_user_regs", "cdc_chunk_ledger",
                 "heavy_hitter_users", "graph_voronoi8",
                 "rolling_median5", "feature_hash_users",
                 "late_events_watermark", "orders_skyline",
                 "media_jpeg_roundtrip", "media_png_roundtrip"):
        t0 = time.perf_counter()
        res = qs[name](SF_DIR)
        # consume if lazy
        if hasattr(res, "materialize"):
            res = res.materialize()
        out[name] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    h = run_headline()
    q = run_queries()
    out = {
        "metric": "flagship corpus→graph pipeline (derive + build + PR-to-convergence + CC) wall sec",
        "value": h["headline_sec"],
        "unit": "sec",
        "queries": q,
        "sf": _sf_of(SF_DIR),
        "num_cpus": NUM_CPUS,
        **h,
    }
    print(json.dumps(out))
    ray.shutdown()


def memcpy_envelope() -> dict:
    """STREAM-like single-box memory-bandwidth envelope: how well pure
    memcpy parallelizes N→4N *threads* on THIS machine.  On a real
    cluster, 4N nodes bring 4× the memory channels; on one box all
    cores share them, so this ratio caps any memory-bound workload's
    measurable in-sandbox efficiency and is reported next to the engine
    numbers for interpretation."""
    import concurrent.futures as cf

    import numpy as np

    # one private 64 MB buffer per worker slot: threads never share
    # cache lines, so the only shared resource is the memory bus
    bufs = [np.random.default_rng(i).random(2**23) for i in range(32)]

    def churn(i):
        s = 0.0
        for _ in range(4):
            s += float(bufs[i].sum())
        return s

    def throughput(n_threads: int) -> float:
        """total bytes summed per second with n concurrent threads"""
        with cf.ThreadPoolExecutor(n_threads) as ex:
            t0 = time.perf_counter()
            list(ex.map(churn, range(n_threads)))
            dt = time.perf_counter() - t0
        return n_threads * 4 * bufs[0].nbytes / dt

    throughput(2)  # warm
    tp = {n: throughput(n) for n in (4, 8, 16, 32)}
    return {
        "memcpy_eff_4_16": round((tp[16] / tp[4]) / 4, 3),
        "memcpy_eff_8_32": round((tp[32] / tp[8]) / 4, 3),
        "memcpy_gbps": {n: round(v / 1e9, 1) for n, v in tp.items()},
    }


def scaling() -> None:
    """North-rule evidence: the same PR+CC job on the same prebuilt
    graph at two parallelism levels in fresh processes — BOTH N=4→4N=16
    and N=8→4N=32 pairs.  Each leg is one fresh process running the
    full-warm-then-time protocol (see ``graph_only``)."""

    def run(ncpu: int, *flags: str) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *flags],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    prep = run(32, "--prepare")
    gdir = prep["gdir"]
    legs: dict[int, dict] = {}
    for ncpu in (4, 8, 16, 32):
        legs[ncpu] = run(ncpu, "--graph-only", gdir)

    def eff(lo: dict, hi: dict, key: str, ratio: float) -> float:
        if key.endswith("teps"):
            return round((hi[key] / lo[key]) / ratio, 3) if lo[key] else 0.0
        return round((lo[key] / hi[key]) / ratio, 3) if hi[key] else 0.0

    pairs = {"4_16": (legs[4], legs[16]), "8_32": (legs[8], legs[32])}
    env = memcpy_envelope()
    result = {
        "metric": "scaling efficiency (4N vs N CPUs, same input, fresh processes)",
        "sf": _sf_of(SF_DIR),
        "n_vertices": legs[32]["n_vertices"],
        "n_edges_directed": legs[32]["n_edges_directed"],
        **env,
    }
    for tag, (lo, hi) in pairs.items():
        result[f"graph_eff_{tag}"] = eff(lo, hi, "graph_sec", 4)
        result[f"pr_teps_eff_{tag}"] = eff(lo, hi, "pr_teps", 4)
        result[f"cc_teps_eff_{tag}"] = eff(lo, hi, "cc_teps", 4)
    print(json.dumps(result))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## bench.py --scaling @ sf{result['sf']} "
            f"({time.strftime('%Y-%m-%d %H:%M')})\n\n"
            f"Graph: V={result['n_vertices']}, E-directed="
            f"{result['n_edges_directed']}; steady-state protocol: per "
            f"leg one fresh process, full untimed PR+CC warm pass, then "
            f"min of 2 timed reps; identical config every leg.\n\n"
            f"| metric | 4 cpus | 8 cpus | 16 cpus | 32 cpus |\n"
            f"|---|---|---|---|---|\n"
            f"| PR+CC graph phase wall s | "
            + " | ".join(str(legs[n]["graph_sec"]) for n in (4, 8, 16, 32))
            + " |\n| PR TEPS | "
            + " | ".join(str(legs[n]["pr_teps"]) for n in (4, 8, 16, 32))
            + " |\n| CC TEPS | "
            + " | ".join(str(legs[n]["cc_teps"]) for n in (4, 8, 16, 32))
            + " |\n\n"
            f"| efficiency (target ≥0.8) | N=4→4N=16 | N=8→4N=32 |\n"
            f"|---|---|---|\n"
            f"| graph phase | {result['graph_eff_4_16']} | {result['graph_eff_8_32']} |\n"
            f"| PR TEPS | {result['pr_teps_eff_4_16']} | {result['pr_teps_eff_8_32']} |\n"
            f"| CC TEPS | {result['cc_teps_eff_4_16']} | {result['cc_teps_eff_8_32']} |\n"
            f"| pure-memcpy hardware envelope | {env['memcpy_eff_4_16']} | {env['memcpy_eff_8_32']} |\n\n"
            f"The memcpy row is the single-box ceiling for memory-bound "
            f"work (all cores share one memory bus; 4N cluster NODES "
            f"would bring 4N× the bandwidth).  Engine efficiency should "
            f"be read against that envelope.\n\n"
            f"Full JSON: `{json.dumps({'legs': legs, 'result': result})}`\n"
        )


def _init_ray() -> None:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--prepare" in sys.argv:
        _init_ray()
        print(json.dumps({"gdir": prepare_scaling_graph()}))
    elif "--graph-only" in sys.argv:
        _init_ray()
        graph_only(sys.argv[sys.argv.index("--graph-only") + 1])
    else:
        main()
