"""k-anonymity / l-diversity audit (_q_privacy_audit) vs a brute-force
pandas reference on a planted customer table: classes straddling the
k=5 and l=3 thresholds, negative acctbals that make floor-vs-truncate
band semantics observable, and block-layout invariance (the result is
a pure function of the multiset of rows)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _planted(tmp_path, n_blocks=1):
    rng = np.random.default_rng(7)
    rows = []
    # class A: 12 members, 5 distinct bands -> k_ok, l_ok
    rows += [(1, "AUTO", 1000.0 * b + 1.0) for b in range(5)]
    rows += [(1, "AUTO", 2.0)] * 7
    # class B: 3 members, 1 band -> neither
    rows += [(2, "SHIP", -50.0)] * 3
    # class C: 6 members, 2 bands (one negative band) -> k_ok only
    rows += [(3, "AUTO", -1500.0)] * 3 + [(3, "AUTO", 10.0)] * 3
    # class D: singleton
    rows += [(4, "RAIL", 999.99)]
    # filler noise
    for _ in range(40):
        rows.append((int(rng.integers(5, 9)),
                     ["AUTO", "SHIP", "RAIL"][int(rng.integers(3))],
                     float(rng.integers(-300000, 300000)) / 100.0))
    df = pd.DataFrame(rows,
                      columns=["c_nationkey", "c_mktsegment", "c_acctbal"])
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    if n_blocks == 1:
        pq.write_table(pa.Table.from_pandas(df), d / "customer.parquet")
    else:
        # write interleaved shards so block layout differs
        (d / "customer.parquet").mkdir(exist_ok=True)
        for i in range(n_blocks):
            pq.write_table(pa.Table.from_pandas(df.iloc[i::n_blocks]),
                           d / "customer.parquet" / f"part-{i}.parquet")
    return str(d), df


def _reference(df):
    from __ray_entry__ import BAND_CENTS, BAND_OFF, KANON_K, LDIV_L

    cents = np.floor(df.c_acctbal.to_numpy() * 100.0 + 0.5).astype(np.int64)
    band = (cents + BAND_OFF) // BAND_CENTS
    ref = (df.assign(band=band)
             .groupby(["c_nationkey", "c_mktsegment"])
             .agg(n=("band", "size"), l=("band", "nunique"))
             .reset_index())
    ref["k_ok"] = ref.n >= KANON_K
    ref["l_ok"] = ref.l >= LDIV_L
    return ref


def _canon(df):
    df = df[sorted(df.columns)].copy()
    return (df.sort_values(list(df.columns), kind="stable")
              .reset_index(drop=True))


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_privacy_audit_matches_reference(tmp_path, n_blocks):
    from __ray_entry__ import _q_privacy_audit

    sf_dir, df = _planted(tmp_path, n_blocks)
    got = _q_privacy_audit(sf_dir).to_pandas()
    ref = _reference(df)
    # spot-check the planted classes before the full compare
    a = got.set_index(["c_nationkey", "c_mktsegment"])
    assert tuple(a.loc[(1, "AUTO")][["n", "l"]]) == (12, 5)
    assert tuple(a.loc[(2, "SHIP")][["n", "l", "k_ok", "l_ok"]]) == (
        3, 1, False, False)
    assert tuple(a.loc[(3, "AUTO")][["n", "l", "k_ok", "l_ok"]]) == (
        6, 2, True, False)
    assert tuple(a.loc[(4, "RAIL")][["n", "l"]]) == (1, 1)
    pd.testing.assert_frame_equal(_canon(got), _canon(ref),
                                  check_dtype=False)
