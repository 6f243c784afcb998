"""Sweep the Pallas kernel's tile knobs on the real TPU.

Runs bench.py in a subprocess per (AZTPU_SUBTILE_H, AZTPU_CELL_BLOCK)
setting (the subtile height is read at module import, so each setting
needs a fresh interpreter) and prints a TPS table.
"""

import itertools
import json
import os
import subprocess
import sys

SETTINGS = list(itertools.product(["16", "8", "32"], ["256", "128", "512"]))


def main():
    env_base = dict(os.environ, BENCH_WARM="150", BENCH_STEPS="600")
    results = []
    for h, cb in SETTINGS:
        env = dict(env_base, AZTPU_SUBTILE_H=h, AZTPU_CELL_BLOCK=cb)
        try:
            out = subprocess.run(
                [sys.executable, "-u", os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "bench.py")],
                env=env, capture_output=True, text=True, timeout=900,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            r = json.loads(line[-1]) if line else {}
            tps = r.get("value")
            kms = r.get("extra", {}).get("force_kernel_ms")
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            tps, kms = None, f"{type(e).__name__}"
        results.append((h, cb, tps, kms))
        print(f"H={h:>2} CB={cb:>3}: TPS={tps} kernel_ms={kms}", flush=True)
    best = max((r for r in results if isinstance(r[2], (int, float))),
               key=lambda r: r[2], default=None)
    print("best:", best, flush=True)


if __name__ == "__main__":
    main()
