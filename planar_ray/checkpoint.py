"""Phase-level checkpoint/resume for multi-phase drivers.

The superstep Engine already checkpoints the plain kernel loop per
superstep (superstep.py _checkpoint / latest_checkpoint). Multi-phase
drivers — contracting WCC, Borůvka MST, the LSH dedup pipeline — run a
SEQUENCE of engine runs / pipelines with derived state between phases
(label mappings, live edge sets, candidate pairs); a kill mid-phase used
to lose the whole run. ``PhaseLog`` persists each completed phase's
datasets as parquet plus a JSON manifest (written last, atomically — the
manifest IS the commit marker), and ``latest()`` finds the newest
complete phase to resume from.

The reference has no checkpointing at all (its only write-back is final
labels, /root/reference/core/io/mutable_csr_writer.cpp:5-52); this is
the repo's own bar per BASELINE.json's resumability rule.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from .util import read_json, write_json_atomic


class PhaseLog:
    """Per-phase parquet artifacts + manifest under ``run_dir``.

    Layout: ``<run_dir>/phase_<k>/<name>/*.parquet`` per dataset and
    ``<run_dir>/phase_<k>/manifest.json`` (written after all datasets).
    """

    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)

    def phase_dir(self, phase: int) -> str:
        return os.path.join(self.run_dir, f"phase_{phase:03d}")

    def complete(self, phase: int, datasets: dict, meta: dict) -> None:
        """Persist ``datasets`` (Dataset or pyarrow.Table values) and then
        the manifest. A re-run over a stale dir replaces it wholesale."""
        d = self.phase_dir(phase)
        man = os.path.join(d, "manifest.json")
        if os.path.exists(man):
            os.remove(man)  # invalidate before touching data
        # committing phase k makes every LATER phase of a previous run
        # over this dir stale — drop them, or a kill before this run
        # reaches phase k+1 would let latest() resume from the old run's
        # phase k+1 data (silently wrong derived state)
        for e in os.listdir(self.run_dir):
            if e.startswith("phase_") and e > f"phase_{phase:03d}":
                shutil.rmtree(os.path.join(self.run_dir, e),
                              ignore_errors=True)
        for name, ds in datasets.items():
            out = os.path.join(d, name)
            shutil.rmtree(out, ignore_errors=True)
            os.makedirs(out, exist_ok=True)
            if isinstance(ds, pa.Table):
                pq.write_table(ds, os.path.join(out, "part-0.parquet"))
            else:
                ds.write_parquet(out)
        write_json_atomic(man, {"phase": phase, **meta})

    def latest(self):
        """(phase, meta) of the newest COMPLETE phase, or None."""
        if not os.path.isdir(self.run_dir):
            return None
        best = None
        for d in sorted(os.listdir(self.run_dir)):
            man = os.path.join(self.run_dir, d, "manifest.json")
            if d.startswith("phase_") and os.path.exists(man):
                best = man
        if best is None:
            return None
        m = read_json(best)
        return (m["phase"], m)

    def load(self, phase: int, name: str):
        """Read one persisted dataset back (schema-metadata-stripped)."""
        import ray.data as rd

        from .util import strip_schema_meta

        return strip_schema_meta(
            rd.read_parquet(os.path.join(self.phase_dir(phase), name)))
