"""Run any registered pipeline from the command line:

    python -m essentials_rd.run_query <name> [--sf-dir DIR] [--out DIR]
    python -m essentials_rd.run_query --list

Every entry of the driver contract's ``queries()`` registry (175+
oracle-checked pipelines — graph algorithms, dedup, windows, joins,
sampling, text/embedding ops) becomes directly runnable: the result
prints as a row-count + head preview, or writes Parquet with ``--out``.
Owns its own ``ray.init(address="local")`` like every CLI entry point
(the driver imports ``__ray_entry__`` directly and never goes through
here)."""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="essentials_rd.run_query")
    p.add_argument("name", nargs="?", help="queries() entry to run")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--out", default=None, help="write result Parquet here")
    p.add_argument("--list", action="store_true", dest="list_",
                   help="list registered pipelines and exit")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    p.add_argument("--head", type=int, default=10)
    p.add_argument("--stats", action="store_true",
                   help="print Ray Data per-stage stats for Dataset "
                        "results (the ds.stats() perf feedback loop)")
    args = p.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    if args.list_ or not args.name:
        try:
            for name in sorted(qs):
                print(name)
        except BrokenPipeError:  # `| head` closed the pipe — fine
            pass
        return 0
    if args.name not in qs:
        print(f"unknown pipeline {args.name!r}; --list shows all",
              file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    res = qs[args.name](args.sf_dir)
    if isinstance(res, rd.Dataset):
        if args.stats:
            res = res.materialize()
        # skip 0-row blocks: empty sort partitions surface as
        # zero-COLUMN tables, which strict concat_tables rejects
        blocks = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
        tbl = pa.concat_tables(blocks) if blocks else None
        df = tbl.to_pandas() if tbl is not None else pd.DataFrame()
        if args.stats:
            print(res.stats())
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res
    print(f"{args.name}: {len(df)} rows × {len(df.columns)} cols")
    with pd.option_context("display.width", 200):
        print(df.head(args.head).to_string(index=False))
    if args.out:
        rd.from_pandas(df).write_parquet(args.out)
        print(f"written: {args.out}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
