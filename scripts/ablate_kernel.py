"""Driver-capturable roofline ablations of the 64k pair kernel (BENCH.md).

Runs the isolated force-kernel timing (bench.time_force_kernel, the
production path) under three settings, one subprocess each so the env
knobs bind at trace time and the relay sees one client at a time:

  production      — the shipped kernel
  eval_ablate     — AZTPU_ABLATE_EVAL=1: trivial evaluator (structure-only
                    cost: geometry + Newton accumulation + skipping)
  bounds_off      — AZTPU_ABLATE_BOUNDS=1: occupancy skipping disabled

Prints one JSON line per setting; the deltas back BENCH.md's instruction-
floor argument with driver-captured numbers (round-2 review asked for
exactly this).
"""

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["AZTPU_REPO"])
import bench

sim, lj = bench.build_sim()
sim.auto_tune_after = 150
sim.run(250)
sim._seg_adapt = False
kms = bench.time_force_kernel(sim, lj)
print(json.dumps({"setting": os.environ.get("ABLATE_NAME"),
                  "force_kernel_ms": round(kms, 4),
                  "cap": sim._grid_spec.cap}), flush=True)
"""

SETTINGS = [
    ("production", {}),
    ("eval_ablate", {"AZTPU_ABLATE_EVAL": "1"}),
    ("bounds_off", {"AZTPU_ABLATE_BOUNDS": "1"}),
]


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, extra in SETTINGS:
        env = dict(os.environ, AZTPU_REPO=repo, ABLATE_NAME=name, **extra)
        r = subprocess.run(
            [sys.executable, "-u", "-c", _CHILD], env=env,
            capture_output=True, text=True, timeout=900,
        )
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if lines:
            print(lines[-1], flush=True)
        else:
            print(json.dumps({"setting": name, "error": r.returncode,
                              "tail": r.stderr.strip()[-300:]}), flush=True)


if __name__ == "__main__":
    main()
