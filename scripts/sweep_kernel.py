"""Sweep the Pallas kernel's tile knobs on the real TPU.

Runs bench.py in a subprocess per (AZTPU_SUBTILE_H, AZTPU_CELL_BLOCK)
setting (the subtile height is read at module import, so each setting
needs a fresh interpreter) and prints a TPS table, then sweeps the
Verlet buffer at the winning schedule (buffer trades rebuild cadence
against pair-slot count; BENCH.md roofline). Headline config only
(BENCH_CONFIGS=0): the sweep's job is the 64k kernel schedule.
"""

import itertools
import json
import os
import subprocess
import sys

SETTINGS = list(itertools.product(["16", "8", "32"], ["256", "128", "512"]))
BUFFERS = ["0.3", "0.5", "0.6"]  # 0.4 is the schedule sweep's baseline


def run_bench(env):
    try:
        out = subprocess.run(
            [sys.executable, "-u", os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "bench.py")],
            env=env, capture_output=True, text=True, timeout=900,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        r = json.loads(line[-1]) if line else {}
        return r.get("value"), r.get("extra", {}).get("force_kernel_ms")
    except Exception as e:  # noqa: BLE001 - report and continue the sweep
        return None, f"{type(e).__name__}"


def main():
    env_base = dict(
        os.environ, BENCH_WARM="150", BENCH_STEPS="600", BENCH_CONFIGS="0"
    )
    results = []
    for h, cb in SETTINGS:
        env = dict(env_base, AZTPU_SUBTILE_H=h, AZTPU_CELL_BLOCK=cb)
        tps, kms = run_bench(env)
        results.append((h, cb, tps, kms))
        print(f"H={h:>2} CB={cb:>3}: TPS={tps} kernel_ms={kms}", flush=True)
    best = max((r for r in results if isinstance(r[2], (int, float))),
               key=lambda r: r[2], default=None)
    print("best schedule:", best, flush=True)

    if best is None or os.environ.get("SWEEP_BUFFERS", "1") != "1":
        return
    h, cb = best[0], best[1]
    buf_results = [(0.4, best[2], best[3])]
    for b in BUFFERS:
        env = dict(env_base, AZTPU_SUBTILE_H=h, AZTPU_CELL_BLOCK=cb,
                   BENCH_BUFFER=b)
        tps, kms = run_bench(env)
        buf_results.append((float(b), tps, kms))
        print(f"buffer={b}: TPS={tps} kernel_ms={kms}", flush=True)
    bbest = max((r for r in buf_results if isinstance(r[1], (int, float))),
                key=lambda r: r[1], default=None)
    print("best buffer:", bbest, flush=True)


if __name__ == "__main__":
    main()
