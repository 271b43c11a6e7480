"""Entity-resolution clusters (_q_supplier_entities): planted typo
chains must close transitively (A~B~C at pairwise distance 1 ends in
ONE cluster even though d(A,C)=2), unrelated names stay singletons
with their own key as cluster id, and the assignment is
layout-invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, names, keys, n_blocks=1):
    df = pd.DataFrame({"s_suppkey": np.asarray(keys, np.int64),
                       "s_name": names})
    d = tmp_path / "sf"
    d.mkdir(parents=True, exist_ok=True)
    if n_blocks == 1:
        pq.write_table(pa.Table.from_pandas(df), d / "supplier.parquet")
    else:
        (d / "supplier.parquet").mkdir(exist_ok=True)
        for i in range(n_blocks):
            pq.write_table(pa.Table.from_pandas(df.iloc[i::n_blocks]),
                           d / "supplier.parquet" / f"p{i}.parquet")
    return str(d)


def test_supplier_entities_transitive_chain_and_singletons(tmp_path):
    from __ray_entry__ import _q_supplier_entities

    names = ["widget", "widgex", "widgexx",   # chain 10-11-12
             "gadget", "gadget",              # exact dup 20, 21
             "isolate", "faraway"]            # singletons 30, 40
    keys = [11, 10, 12, 21, 20, 30, 40]
    got = _q_supplier_entities(
        _write(tmp_path / "a", names, keys)).to_pandas()
    c = dict(zip(got.s_suppkey, got.cluster))
    # d(widget,widgex)=1, d(widgex,widgexx)=1, d(widget,widgexx)=2:
    # transitive closure puts all three in cluster min(10,11,12)=10
    assert c[10] == c[11] == c[12] == 10
    assert c[20] == c[21] == 20
    assert c[30] == 30 and c[40] == 40
    got2 = _q_supplier_entities(
        _write(tmp_path / "b", names, keys, n_blocks=4)).to_pandas()
    c2 = dict(zip(got2.s_suppkey, got2.cluster))
    assert c == c2
