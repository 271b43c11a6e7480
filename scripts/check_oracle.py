"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row count, schema (column names) and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
       python scripts/check_oracle.py --json OUT.json [sf_dir] [query ...]

With ``--json OUT.json`` a machine-readable per-query artifact is written
(rows/schema/value verdicts + timings) — committed each round as
``CORRECTNESS_full_rN.json`` so all queries (not just the driver's
50-query sample) have durable evidence.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"schema: {sorted(got.columns)} != {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rows: {len(got)} != {len(want)}")
        return problems
    g, w = canon(got), canon(want)
    for c in g.columns:
        a, b = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            ok = np.allclose(a.astype(float), b.astype(float), atol=0, rtol=0, equal_nan=True)
        else:
            ok = (a == b).all()
        if not ok:
            bad = np.flatnonzero(a != b)[:5] if a.dtype == b.dtype else []
            problems.append(f"col {c}: values differ (e.g. rows {list(bad)})")
    return problems


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:  # record, keep sweeping
            print(f"{name:24s} ERROR {ex}")
            failed.append(name)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "rows": None,
                            "ray_sec": None, "sql_sec": None,
                            "err": f"{type(ex).__name__}: {ex}"}
            continue
        t1 = time.perf_counter()
        if name not in oracles:
            print(f"{name:24s} rows={len(got):7d}  ray={t1 - t0:6.1f}s  (rows-only, no oracle)")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "rows": len(got),
                            "ray_sec": round(t1 - t0, 3), "sql_sec": None,
                            "err": None, "rows_only": True}
            continue
        want = con.sql(oracles[name]).df()
        t2 = time.perf_counter()
        problems = compare(name, got, want)
        status = "OK " if not problems else "FAIL"
        print(f"{name:24s} rows={len(got):7d}  ray={t1 - t0:6.1f}s sql={t2 - t1:5.1f}s  {status}")
        for p in problems:
            print(f"    - {p}")
            failed.append(name)
        schema_ok = not any(p.startswith("schema") for p in problems)
        rows_ok = schema_ok and not any(p.startswith("rows") for p in problems)
        report[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                        "hash_match": not problems, "rows": len(got),
                        "oracle_rows": len(want),
                        "ray_sec": round(t1 - t0, 3),
                        "sql_sec": round(t2 - t1, 3),
                        "err": problems or None}
    ray.shutdown()
    if json_out:
        n_ok = sum(1 for v in report.values() if v.get("hash_match"))
        summary = {"sf_dir": sf_dir, "n_queries": len(report),
                   "n_hash_match": n_ok,
                   "n_fail": len(set(failed)),
                   "queries": report}
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_out}: {n_ok}/{len(report)} hash-match, "
              f"{len(set(failed))} fail")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
