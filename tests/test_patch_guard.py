"""Guard tests for the ray-internals schema-metadata patch.

``essentials_rd/__init__.py`` wraps ``ray.data.read_parquet`` (public,
but relies on the ``_block_udf`` kwarg) and
``ray.data._internal.datasource.parquet_datasource._infer_schema``
(private) to strip the pandas schema-metadata blob that makes Ray's
schema-dedup cache log once per block.  These tests pin the contract:

- on the pinned Ray version the patch APPLIES (else the 816-line/run
  warning spam silently returns);
- on any other Ray version, or with ``ESSENTIALS_RD_NO_PATCH=1``, the
  package imports cleanly and leaves Ray untouched (noisy-but-correct);
- if Ray is upgraded past the pinned prefix, the first test fails
  LOUDLY telling the maintainer to re-verify the private symbol.
"""

import subprocess
import sys


def test_infer_schema_patch_applies_on_pinned_ray():
    import ray

    import essentials_rd

    assert str(ray.__version__).startswith(
        essentials_rd._PATCH_TESTED_RAY_PREFIXES
    ), (
        f"Ray upgraded to {ray.__version__}: re-verify that "
        "parquet_datasource._infer_schema still exists and the "
        "read_parquet _block_udf kwarg survives, then add the new "
        "version prefix to _PATCH_TESTED_RAY_PREFIXES"
    )
    assert essentials_rd._INFER_SCHEMA_PATCHED is True
    from ray.data._internal.datasource import parquet_datasource as pds

    assert getattr(pds._infer_schema, "_erd_strips_metadata", False)
    import ray.data as rd

    assert getattr(rd.read_parquet, "_erd_strips_metadata", False)


def _run(code: str, env: dict | None = None) -> None:
    import os

    full = dict(os.environ)
    if env:
        full.update(env)
    r = subprocess.run([sys.executable, "-c", code], env=full,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stdout + r.stderr


def test_patch_opt_out_env_var():
    _run(
        "import essentials_rd, ray.data as rd\n"
        "assert not getattr(rd.read_parquet, '_erd_strips_metadata', False)\n"
        "assert essentials_rd._INFER_SCHEMA_PATCHED is False\n",
        env={"ESSENTIALS_RD_NO_PATCH": "1"},
    )


def test_empty_bundle_warning_filter_is_narrow():
    """The executor-warning filter must drop ONLY the schema-less
    empty-bundle message (new schema blank); genuine schema mismatches
    still log."""
    import logging

    import essentials_rd  # noqa: F401  installs the filter

    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    flt = [f for f in lg.filters if type(f).__name__ == "_EmptyBundleFilter"]
    assert flt, "filter not installed"
    f = flt[0]

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "f", 1, msg, (), None)

    dropped = rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: token: string\n__bucket__: int32, "
        "new schema: . This may lead to unexpected behavior.")
    kept = rec(
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: a: double. "
        "This may lead to unexpected behavior.")
    assert f.filter(dropped) is False
    assert f.filter(kept) is True


def test_patch_degrades_gracefully_on_unknown_ray_version():
    # Fake a future Ray before the package installs its patches: the
    # import must succeed (no ImportError from a moved private symbol)
    # and must leave both read paths untouched.
    _run(
        "import ray\n"
        "ray.__version__ = '9.99.0'\n"
        "import essentials_rd, ray.data as rd\n"
        "assert not getattr(rd.read_parquet, '_erd_strips_metadata', False)\n"
        "assert essentials_rd._INFER_SCHEMA_PATCHED is False\n"
    )
