import logging

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from essentials_rd.graph import build_graph


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


def edges_ds(src, dst, weight=None) -> rd.Dataset:
    t = {
        "src": pa.array(np.asarray(src, dtype=np.int64), pa.int64()),
        "dst": pa.array(np.asarray(dst, dtype=np.int64), pa.int64()),
    }
    if weight is not None:
        t["weight"] = pa.array(np.asarray(weight, dtype=np.float64), pa.float64())
    return rd.from_arrow(pa.table(t))


def small_graph(tmp_path, src, dst, weight=None, P=2, **kw):
    return build_graph(
        edges_ds(src, dst, weight), str(tmp_path), P,
        weighted=weight is not None, **kw
    )
