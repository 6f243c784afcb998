"""Instrumented 64k bench warmup: small chunks, per-chunk diagnostics."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from bench import build_sim


def main():
    sim, lj = build_sim()
    sim.max_chunk = int(os.environ.get("DBG_CHUNK", "20"))
    t0 = time.time()
    for k in range(15):
        sim.run(sim.max_chunk)
        st = sim._dense
        v = np.abs(np.asarray(st.velocity)).max()
        thermo_kT = float(
            (np.asarray(st.velocity) ** 2).sum() * 0.5 * 2 / (3 * 64000)
        )
        print(
            f"t={sim.timestep:4d} kT={thermo_kT:.3f} max|v|={v:.4g} "
            f"cap={sim._grid_spec.cap} builds={int(sim._meta.n_builds)} "
            f"({time.time()-t0:.0f}s)",
            flush=True,
        )
        if v > 1e3:
            print("EXPLODED", flush=True)
            break


if __name__ == "__main__":
    main()
