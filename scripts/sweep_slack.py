"""Sweep the tune_cell_capacity slack (cap) on the 64k headline system.

VERDICT r3 item 1 lever: cap 56 sits 8 above the measured equilibrated
max occupancy (~48). A tighter cap shrinks S = C*cap, cutting the
rebin's S-row slot gather and the kernel's structural rows; the risk is
occupancy fluctuation overflow (one replay + recompile per event).

Usage: python scripts/sweep_slack.py [slacks...]   (default 0 4 8)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import bench as B


def main():
    slacks = [int(s) for s in sys.argv[1:]] or [0, 4, 8]
    sim, lj = B.build_sim()
    sim.auto_tune_after = None  # manual tunes below
    sim.run(500)  # melt + settle at production temperature
    for slack in slacks:
        t0 = time.perf_counter()
        sim.tune_cell_capacity(slack=slack)
        sim.run(60)  # compile + verify no immediate overflow
        sim._seg_adapt = False
        ms = B.time_steps(sim, 60, 300)
        print(
            f"slack={slack}: cap={sim._grid_spec.cap} "
            f"S={sim._grid_spec.S} {ms:.3f} ms/step "
            f"({1e3/ms:.1f} TPS) interval={sim._seg_len} "
            f"[{time.perf_counter()-t0:.0f}s]",
            flush=True,
        )
        sim._seg_adapt = True


if __name__ == "__main__":
    main()
