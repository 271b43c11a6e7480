"""Per-superstep Parquet checkpoints with lineage + atomic completion.

Layout (SURVEY.md §4.4):

    ckpt_dir/
      edges/                      (immutable, written once by build_graph)
      step_00000/ *.parquet       (vertex state incl. frontier flags)
      step_00000.lineage.json     (per-partition metrics + superstep totals)
      step_00000._SUCCESS         (atomic completion marker)

A step is written to ``_tmp_step_k``, renamed, then marked — so a
killed run leaves either a complete step (resumable) or an ignorable
temp dir; resume picks the max k with a ``_SUCCESS`` marker
(BASELINE.json north_star: "a killed `ray job submit` run resumes
mid-iteration").  The reference has no checkpointing (single-GPU,
fail = crash — SURVEY.md §4.1); this is net-new capability required by
the north_rule.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import ray.data as rd

_STEP_RE = re.compile(r"^step_(\d{5})\._SUCCESS$")


class CheckpointManager:
    def __init__(self, ckpt_dir: str):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)

    def step_dir(self, k: int) -> str:
        return os.path.join(self.dir, f"step_{k:05d}")

    def _marker(self, k: int) -> str:
        return self.step_dir(k) + "._SUCCESS"

    def _lineage_path(self, k: int) -> str:
        return self.step_dir(k) + ".lineage.json"

    def latest_step(self) -> int | None:
        ks = [
            int(m.group(1))
            for f in os.listdir(self.dir)
            if (m := _STEP_RE.match(f))
        ]
        return max(ks) if ks else None

    def clean_partials(self) -> None:
        for f in os.listdir(self.dir):
            p = os.path.join(self.dir, f)
            if f.startswith("_tmp_step_"):
                shutil.rmtree(p, ignore_errors=True)
            elif f.startswith("step_") and os.path.isdir(p):
                k = int(f.split("_")[1])
                if not os.path.exists(self._marker(k)):
                    shutil.rmtree(p, ignore_errors=True)

    def write_state(self, k: int, state_ds: rd.Dataset) -> rd.Dataset:
        """Write state atomically (tmp dir + rename); returns a fresh
        Dataset reading it back (the write IS the superstep's
        materialization barrier).  The step only becomes resumable once
        :meth:`finalize_step` lands the lineage + _SUCCESS marker."""
        tmp = os.path.join(self.dir, f"_tmp_step_{k:05d}")
        final = self.step_dir(k)
        # invalidate k and everything after it FIRST (markers before
        # dirs): a kill mid-write must never leave a _SUCCESS marker
        # pointing at a missing/stale dir, and a non-resume rerun in a
        # dirty checkpoint dir must not leave later-step markers from a
        # previous run for resume to trip over
        later = self.latest_step()
        for j in range(k, (later if later is not None else k - 1) + 1):
            if os.path.exists(self._marker(j)):
                os.remove(self._marker(j))
            if os.path.exists(self._lineage_path(j)):
                os.remove(self._lineage_path(j))
            shutil.rmtree(self.step_dir(j), ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        state_ds.write_parquet(tmp)
        os.rename(tmp, final)
        return rd.read_parquet(final)

    def finalize_step(self, k: int, lineage: dict) -> None:
        with open(self._lineage_path(k), "w") as f:
            json.dump(lineage, f, indent=1)
        with open(self._marker(k), "w") as f:
            f.write("ok")

    def load_step(self, k: int) -> tuple[rd.Dataset, dict]:
        with open(self._lineage_path(k)) as f:
            lineage = json.load(f)
        return rd.read_parquet(self.step_dir(k)), lineage

    def load_history(self, upto_k: int) -> list[dict]:
        out = []
        for k in range(upto_k + 1):
            p = self._lineage_path(k)
            if os.path.exists(p):
                with open(p) as f:
                    out.append(json.load(f))
        return out
