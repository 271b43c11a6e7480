"""CLI entry point — `python -m essentials_rd.cli` (SURVEY.md §3.2).

On a real cluster this is what `ray job submit -- python -m
essentials_rd.cli ...` runs; in the sandbox it is a plain process that
owns its own `ray.init(address="local")`.  Parse → ingest → derive →
build → superstep loop (checkpointed) → write result Parquet + metrics.

Resume: `--resume` picks up from the last _SUCCESS superstep in
--ckpt-dir, rebuilding CSR shards from the immutable edge checkpoint
(SURVEY.md §3.3) — the kill-resume subprocess test drives exactly this
path.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="essentials_rd")
    p.add_argument("--input", required=True, help="repo_files parquet file/dir")
    p.add_argument("--algo", required=True,
                   choices=["pr", "wpr", "cc", "lp", "tc", "spmv", "bfs",
                            "sssp", "widest", "ppr", "kcore", "eigen", "katz",
                            "fastrp", "color", "hits",
                            "bc", "msf", "ktruss", "esim", "nsample",
                            "walks", "n2v", "harmonic", "scc", "lpath",
                            "match", "treach", "louvain", "fiedler"])
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out", default=None, help="result parquet dir")
    p.add_argument("--num-parts", type=int, default=16)
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--out-parts", type=int, default=0,
                   help="write --out through the resumable partitioned "
                        "sink (N hash partitions on vid, _SUCCESS-gated "
                        "skip-finished resume) instead of one flat dir")
    p.add_argument("--max-iters", type=int, default=100)
    p.add_argument("--cap", type=int, default=10_000, help="heavy shared-key cap")
    p.add_argument("--checkpoint-every", type=int, default=1)
    p.add_argument("--scatter-mode", default="tasks",
                   choices=["tasks", "actors", "fused"])
    p.add_argument("--k", type=int, default=3,
                   help="kcore/ktruss k, nsample fanout, hits/bc rounds; "
                        "fiedler power-iteration steps (honored literally "
                        "when set — fewer steps = less-converged vector; "
                        "unset/0 falls back to 8)")
    p.add_argument("--steps", type=int, default=3, help="walk steps")
    p.add_argument("--p", type=float, default=2.0, help="n2v return param")
    p.add_argument("--q", type=float, default=0.5, help="n2v in-out param")
    p.add_argument("--seed", type=int, default=42,
                   help="sampling seed (nsample/walks)")
    p.add_argument("--source", type=int, default=None,
                   help="bfs/sssp source vertex (default: min vid)")
    p.add_argument("--resume", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from essentials_rd.algorithms import (
        connected_components,
        label_propagation,
        pagerank,
        spmv,
        triangle_counts,
    )
    from essentials_rd.checkpoint import CheckpointManager
    from essentials_rd.derive import add_sha256, derive_edges, read_corpus
    from essentials_rd.graph import build_graph, reload_graph

    ckpt = CheckpointManager(args.ckpt_dir)
    edges_dir = os.path.join(args.ckpt_dir, "edges")

    if args.resume and os.path.isdir(edges_dir):
        # partitioning comes from the checkpoint's own meta (a
        # --num-parts mismatch would silently mispartition state);
        # reload_graph raises if the flag contradicts the checkpoint
        g = reload_graph(edges_dir, args.num_parts)
        edges = None
    else:
        files = add_sha256(read_corpus(args.input))
        edges, vertices, names_ref, n_heavy = derive_edges(files, cap=args.cap)
        edges = edges.materialize()
        print(json.dumps({"event": "derived", "heavy_keys_dropped": n_heavy}),
              flush=True)
        # wpr/widest checkpoint edge weights so --resume reloads a
        # weighted graph; every other algorithm keeps the unweighted
        # checkpoint
        weighted_build = args.algo in ("wpr", "widest")
        cols = ["src", "dst"] + (["weight"] if weighted_build else [])
        g = build_graph(
            edges.select_columns(cols),
            args.ckpt_dir,
            args.num_parts,
            symmetrize=True,
            weighted=weighted_build,
        )

    common = dict(ckpt=ckpt, checkpoint_every=args.checkpoint_every,
                  resume=args.resume, scatter_mode=args.scatter_mode,
                  max_iters=args.max_iters)

    def log_step(k, lin):
        print(json.dumps({"event": "superstep", "k": k,
                          "changed": lin["changed"],
                          "msg_count": lin["msg_count"],
                          "wall_s": round(lin["wall_s"], 3)}), flush=True)

    if args.algo == "pr":
        res = pagerank(g, alpha=args.alpha, tol=args.tol, on_step_end=log_step,
                       **common)
        out_cols = ["value"]
    elif args.algo == "wpr":
        from .algorithms.pagerank import pagerank_weighted

        res = pagerank_weighted(g, alpha=args.alpha, tol=args.tol,
                                on_step_end=log_step, **common)
        out_cols = ["value"]
    elif args.algo in ("nsample", "walks", "n2v"):
        from .sampling import node2vec_walks, random_walks, sample_neighbors

        if args.algo == "nsample":
            out = sample_neighbors(g, args.k, seed=args.seed)
        elif args.algo == "n2v":
            out = node2vec_walks(g, args.steps, p=args.p, q=args.q,
                                 seed=args.seed)
        else:
            out = random_walks(g, args.steps, seed=args.seed)
        n = out.count()
        if args.out:
            out.write_parquet(args.out)
        print(json.dumps({"event": "done", "algo": args.algo, "rows": n}),
              flush=True)
        ray.shutdown()
        return 0
    elif args.algo in ("ktruss", "esim"):
        import pyarrow.compute as pc
        import ray.data as rd

        from .algorithms.similarity import edge_similarity, ktruss as _ktruss

        if edges is None:
            # checkpoint is symmetrized; similarity ops take the
            # canonical src<dst form
            edges = rd.read_parquet(edges_dir, columns=["src", "dst"]).map_batches(
                lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))),
                batch_format="pyarrow",
            )
        canon = edges.select_columns(["src", "dst"])
        if args.algo == "esim":
            out = edge_similarity(g, canon)
            n = out.count()
            if args.out:
                out.write_parquet(args.out)
            print(json.dumps({"event": "done", "algo": "esim", "rows": n}),
                  flush=True)
        else:
            def log_round(r, m):
                print(json.dumps({"event": "round", "k": r, "edges": m}),
                      flush=True)

            truss, rounds, converged = _ktruss(
                canon, args.k, num_parts=args.num_parts,
                max_rounds=args.max_iters, ckpt=ckpt,
                checkpoint_every=args.checkpoint_every,
                resume=args.resume, on_round_end=log_round,
            )
            n = truss.count()
            if args.out:
                truss.write_parquet(args.out)
            print(json.dumps({"event": "done", "algo": "ktruss", "k": args.k,
                              "rounds": rounds, "converged": converged,
                              "edges": n}), flush=True)
        ray.shutdown()
        return 0
    elif args.algo == "cc":
        res = connected_components(g, on_step_end=log_step, **common)
        out_cols = ["label"]
    elif args.algo == "lp":
        res = label_propagation(g, on_step_end=log_step, **common)
        out_cols = ["label"]
    elif args.algo == "spmv":
        res = spmv(g)
        out_cols = ["x", "y"]
    elif args.algo in ("bfs", "sssp", "widest", "ppr"):
        import numpy as np

        from .algorithms import (
            bfs as _bfs, ppr as _ppr, sssp as _sssp,
            widest_path as _widest,
        )

        source = args.source
        if source is None:
            source = int(np.min(ray.get(g.vertex_ids_ref)))
        if args.algo == "bfs":
            res = _bfs(g, source, on_step_end=log_step, **common)
            out_cols = ["depth"]
        elif args.algo == "ppr":
            res = _ppr(g, source, alpha=args.alpha, tol=args.tol,
                       on_step_end=log_step, **common)
            out_cols = ["value"]
        elif args.algo == "widest":
            res = _widest(g, source, on_step_end=log_step, **common)
            out_cols = ["width"]
        else:
            res = _sssp(g, source, on_step_end=log_step, **common)
            out_cols = ["dist"]
    elif args.algo == "kcore":
        from .algorithms import kcore as _kcore

        res = _kcore(g, args.k, on_step_end=log_step, **common)
        out_cols = ["alive", "adeg"]
    elif args.algo == "harmonic":
        import numpy as np

        from .algorithms import harmonic as _harmonic

        vids = np.sort(np.asarray(ray.get(g.vertex_ids_ref), np.int64))
        res = _harmonic(g, vids[:args.k], on_step_end=log_step, **common)
        out_cols = ["h"]
    elif args.algo == "eigen":
        from .algorithms import eigencentrality

        res = eigencentrality(g, tol=args.tol, on_step_end=log_step, **common)
        out_cols = ["value"]
    elif args.algo == "fiedler":
        from .algorithms.fiedler import fiedler as _fiedler

        res = _fiedler(g, max_iters=args.k if args.k else 8,
                       checkpoint_every=args.checkpoint_every,
                       ckpt=ckpt, resume=args.resume,
                       scatter_mode=args.scatter_mode,
                       on_step_end=log_step)
        out_cols = ["value"]
    elif args.algo == "katz":
        from .algorithms.katz import katz as _katz

        res = _katz(g, a_int=4, k_iters=max(args.k, 1), ckpt=ckpt,
                    checkpoint_every=args.checkpoint_every,
                    resume=args.resume, scatter_mode=args.scatter_mode,
                    on_step_end=log_step)
        out_cols = ["value"]
    elif args.algo == "fastrp":
        from .algorithms.fastrp import fastrp as _fastrp

        d = 8
        res = _fastrp(g, d=d, k_iters=max(args.k, 1),
                      scatter_mode=args.scatter_mode,
                      on_step_end=log_step)
        out_cols = [f"x{j}" for j in range(d)]
    elif args.algo == "color":
        from .algorithms import color as _color

        res = _color(g, on_step_end=log_step, **common)
        out_cols = ["color"]
    elif args.algo == "hits":
        import pyarrow.compute as pc
        import ray.data as rd

        from .algorithms import hits as _hits
        from .algorithms import hits_graph_edges, hits_table

        if edges is None:
            edges = rd.read_parquet(edges_dir, columns=["src", "dst"]).map_batches(
                lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))),
                batch_format="pyarrow",
            )
        gh = build_graph(
            hits_graph_edges(edges), os.path.join(args.ckpt_dir, "hits_work"),
            args.num_parts, symmetrize=False, weighted=True, persist=False,
        )
        t = hits_table(_hits(gh, k=args.k))
        if args.out:
            import ray.data as _rd

            _rd.from_arrow(t).write_parquet(args.out)
        print(json.dumps({"event": "done", "algo": "hits",
                          "rounds": args.k, "n_vertices": t.num_rows}),
              flush=True)
        ray.shutdown()
        return 0
    elif args.algo == "scc":
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from .algorithms import hits_graph_edges, scc_coloring
        from .util import hash64, np_col

        if edges is None:
            edges = rd.read_parquet(edges_dir, columns=["src", "dst"]).map_batches(
                lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))),
                batch_format="pyarrow",
            )

        # the derived graph is canonical-undirected; orient each edge by
        # the SplitMix64 parity of its packed pair key (deterministic,
        # partitioning-independent — same rule as the scc_labels query)
        def _orient(t: pa.Table) -> pa.Table:
            s = np_col(t, "src")
            d = np_col(t, "dst")
            with np.errstate(over="ignore"):
                z = hash64(s.astype(np.uint64) * np.uint64(1 << 32)
                           + d.astype(np.uint64))
            fwd = (z & np.uint64(1)) == 0
            return pa.table({
                "src": pa.array(np.where(fwd, s, d), pa.int64()),
                "dst": pa.array(np.where(fwd, d, s), pa.int64()),
            })

        gd = build_graph(
            hits_graph_edges(edges.map_batches(_orient, batch_format="pyarrow")),
            os.path.join(args.ckpt_dir, "scc_work"),
            args.num_parts, symmetrize=False, weighted=True, persist=False,
        )
        t, rounds = scc_coloring(gd)
        if args.out:
            rd.from_arrow(t).write_parquet(args.out)
        print(json.dumps({"event": "done", "algo": "scc",
                          "rounds": rounds, "n_vertices": t.num_rows}),
              flush=True)
        ray.shutdown()
        return 0
    elif args.algo == "treach":
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from .algorithms.temporal import arrival_table, temporal_reach
        from .util import hash64, np_col

        if edges is None:
            edges = rd.read_parquet(edges_dir, columns=["src", "dst"]).map_batches(
                lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))),
                batch_format="pyarrow",
            )

        # deterministic edge activation times from the packed pair key
        # (same rule as the temporal_reach query)
        def _times(t: pa.Table) -> pa.Table:
            s = np_col(t, "src").astype(np.int64).view(np.uint64)
            d = np_col(t, "dst").astype(np.int64).view(np.uint64)
            with np.errstate(over="ignore"):
                key = (s << np.uint64(32)) + d
            tt = (hash64(key.view(np.int64)).view(np.uint64)
                  % np.uint64(32)).astype(np.float64)
            return pa.table({"src": pa.array(s.view(np.int64), pa.int64()),
                             "dst": pa.array(d.view(np.int64), pa.int64()),
                             "weight": pa.array(tt, pa.float64())})

        gt = build_graph(
            edges.select_columns(["src", "dst"]).map_batches(
                _times, batch_format="pyarrow"),
            os.path.join(args.ckpt_dir, "treach_work"),
            args.num_parts, symmetrize=True, weighted=True, persist=False,
        )
        import numpy as _np

        source = args.source
        if source is None:
            source = int(_np.min(ray.get(gt.vertex_ids_ref)))
        res = temporal_reach(gt, source, max_iters=args.max_iters,
                             checkpoint_every=0,
                             scatter_mode=args.scatter_mode,
                             on_step_end=log_step)
        t = arrival_table(res)
        if args.out:
            rd.from_arrow(t).write_parquet(args.out)
        print(json.dumps({"event": "done", "algo": "treach",
                          "source": source, "supersteps": res.supersteps,
                          "n_vertices": t.num_rows}), flush=True)
        ray.shutdown()
        return 0
    elif args.algo == "louvain":
        import numpy as np
        import pyarrow.compute as pc
        import ray.data as rd

        from .algorithms.louvain import contract_graph, modularity_move_round

        if edges is None:
            edges = rd.read_parquet(edges_dir, columns=["src", "dst"]).map_batches(
                lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))),
                batch_format="pyarrow",
            )
        canon = edges.select_columns(["src", "dst"]).materialize()
        vids = np.asarray(ray.get(g.vertex_ids_ref), np.int64)
        moved = modularity_move_round(g, canon, vids, vids.copy())
        coarse = contract_graph(
            canon, np.asarray(moved["vid"], np.int64),
            np.asarray(moved["label"], np.int64))
        n_coarse = coarse.count()
        if args.out:
            rd.from_arrow(moved).write_parquet(args.out)
        n_comm = len(set(moved["label"].to_pylist()))
        print(json.dumps({"event": "done", "algo": "louvain",
                          "n_vertices": moved.num_rows,
                          "n_communities": n_comm,
                          "coarse_edges": n_coarse}), flush=True)
        ray.shutdown()
        return 0
    elif args.algo == "lpath":
        import ray.data as rd

        from .algorithms import depth_table, longest_path

        if edges is None:
            import pyarrow.compute as pc

            edges = rd.read_parquet(edges_dir, columns=["src", "dst"]).map_batches(
                lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))),
                batch_format="pyarrow",
            )
        # canonical src<dst edges ARE a DAG orientation
        gd = build_graph(
            edges, os.path.join(args.ckpt_dir, "lpath_work"),
            args.num_parts, symmetrize=False, persist=False,
        )
        res = longest_path(gd, max_iters=args.max_iters,
                           checkpoint_every=0, on_step_end=log_step,
                           scatter_mode=args.scatter_mode)
        t = depth_table(res)
        if args.out:
            rd.from_arrow(t).write_parquet(args.out)
        print(json.dumps({"event": "done", "algo": "lpath",
                          "supersteps": res.supersteps,
                          "converged": bool(res.converged),
                          "max_depth": int(max(t["depth"].to_pylist() or [0]))}),
              flush=True)
        ray.shutdown()
        return 0
    elif args.algo == "match":
        import ray.data as rd

        from .algorithms import maximal_matching

        if edges is None:
            import pyarrow.compute as pc

            edges = rd.read_parquet(edges_dir, columns=["src", "dst"]).map_batches(
                lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))),
                batch_format="pyarrow",
            )
        t, rounds, converged = maximal_matching(edges,
                                                max_rounds=args.max_iters)
        if args.out:
            rd.from_arrow(t).write_parquet(args.out)
        print(json.dumps({"event": "done", "algo": "match",
                          "rounds": rounds, "converged": bool(converged),
                          "n_matched_edges": t.num_rows}), flush=True)
        ray.shutdown()
        return 0
    elif args.algo == "bc":
        import numpy as np

        from .algorithms import betweenness

        vids = np.sort(np.asarray(ray.get(g.vertex_ids_ref), np.int64))
        n_src = args.k if args.source is None else 1
        sources = (np.asarray([args.source], np.int64)
                   if args.source is not None else vids[:n_src])
        t = betweenness(g, sources, scatter_mode=args.scatter_mode)
        if args.out:
            import ray.data as _rd

            _rd.from_arrow(t).write_parquet(args.out)
        print(json.dumps({"event": "done", "algo": "bc",
                          "n_sources": int(len(sources)),
                          "n_vertices": t.num_rows}), flush=True)
        ray.shutdown()
        return 0
    elif args.algo == "msf":
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from .algorithms import boruvka_msf

        if edges is None:
            # the (unweighted) edge checkpoint has no weight column —
            # resume computes the unit-weight spanning forest (still
            # unique under the (w, src, dst) tie-break)
            def _canon_unit(t):
                t = t.filter(pc.less(t.column("src"), t.column("dst")))
                return t.append_column(
                    "weight",
                    pa.array(np.ones(t.num_rows), pa.float64()),
                )

            edges = rd.read_parquet(
                edges_dir, columns=["src", "dst"]
            ).map_batches(_canon_unit, batch_format="pyarrow")
        vids = np.sort(np.asarray(ray.get(g.vertex_ids_ref), np.int64))
        tbl, total = boruvka_msf(edges, vids)
        if args.out:
            import ray.data as _rd

            _rd.from_arrow(tbl).write_parquet(args.out)
        print(json.dumps({"event": "done", "algo": "msf",
                          "n_edges": tbl.num_rows,
                          "total_weight": total}), flush=True)
        ray.shutdown()
        return 0
    else:  # tc
        if edges is None:
            import pyarrow.compute as pc
            import ray.data as rd

            # the edge checkpoint is SYMMETRIZED (both directions per
            # undirected edge); triangle_counts requires the canonical
            # deduped src<dst form — duplicated oriented edges would
            # corrupt the sorted-adjacency intersection
            edges = rd.read_parquet(edges_dir, columns=["src", "dst"]).map_batches(
                lambda t: t.filter(pc.less(t.column("src"), t.column("dst"))),
                batch_format="pyarrow",
            )
        total, per_v = triangle_counts(
            edges.select_columns(["src", "dst"]),
            os.path.join(args.ckpt_dir, "tc_work"), args.num_parts,
        )
        if args.out:
            per_v.write_parquet(args.out)
        print(json.dumps({"event": "done", "algo": "tc", "triangles": total}),
              flush=True)
        ray.shutdown()
        return 0

    if args.out:
        result_ds = res.state_dataset().select_columns(["vid"] + out_cols)
        if args.out_parts > 0:
            from .sinks import write_partitioned
            from .util import np_col as _nc

            rec = write_partitioned(
                result_ds, args.out, lambda b: _nc(b, "vid"), args.out_parts
            )
            print(json.dumps({
                "event": "sink",
                "written": int(sum(not s for s in rec.column("skipped").to_pylist())),
                "skipped": int(sum(bool(s) for s in rec.column("skipped").to_pylist())),
            }), flush=True)
        else:
            result_ds.write_parquet(args.out)
    print(json.dumps({
        "event": "done", "algo": args.algo, "supersteps": res.supersteps,
        "converged": res.converged, "total_messages": res.total_messages,
    }), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
