"""Localize the TPU-only explosion: standalone rebin vs in-loop stepping.

Runs the verify-drive system 50 healthy steps on TPU, then:
  1. calls rebin standalone (jit, outside the loop) and checks invariants;
  2. steps 1-at-a-time to find the exploding step.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import azplugins_tpu as az
from azplugins_tpu.ops import dense as D


def build():
    n, a = 10, 1.1
    snap = az.Snapshot(N=n**3)
    snap.configuration.box = [n * a] * 3 + [0, 0, 0]
    snap.particles.types = ["A"]
    x = (np.arange(n) + 0.5) * a - n * a / 2
    snap.particles.position[:] = np.stack(
        np.meshgrid(x, x, x, indexing="ij"), -1
    ).reshape(-1, 3)
    sim = az.Simulation(seed=42)
    sim.create_state_from_snapshot(snap)
    lj = az.pair.PerturbedLennardJones(
        nlist=az.md.nlist.Cell(buffer=0.4), default_r_cut=2.5, mode="shift"
    )
    lj.params[("A", "A")] = dict(
        epsilon=1.0, sigma=1.0, attraction_scale_factor=1.0
    )
    sim.operations.integrator = az.md.Integrator(
        dt=0.005,
        methods=[az.md.methods.Langevin(kT=1.5, default_gamma=0.5)],
        forces=[lj],
    )
    sim.state.thermalize_particle_momenta(kT=1.5)
    return sim


def dump(msg, dense):
    v = np.asarray(dense.velocity)
    p = np.asarray(dense.position)
    tags = np.asarray(dense.tag)
    real = tags >= 0
    print(
        f"{msg}: max|v|={np.abs(v[real]).max():.4g} "
        f"max|p|={np.abs(p[real]).max():.4g} n_real={int(real.sum())}",
        flush=True,
    )


def check_rebin(sim):
    spec = sim._grid_spec
    dense, meta = sim._dense, sim._meta
    N = sim._state.N
    reb = jax.jit(
        lambda d, m: D.rebin(d, m, spec, N, sim._fields)
    )
    nd, nm = reb(dense, meta)
    dump("rebin out", nd)
    tags_in = np.sort(np.asarray(dense.tag)[np.asarray(dense.tag) >= 0])
    tags_out = np.sort(np.asarray(nd.tag)[np.asarray(nd.tag) >= 0])
    ok_tags = np.array_equal(tags_in, tags_out) and len(tags_out) == N
    # position multiset preserved (up to wrap): compare per-tag
    def bytag(d):
        t = np.asarray(d.tag)
        p = np.asarray(d.position)
        keep = t >= 0
        out = np.zeros((N, 3), np.float32)
        out[t[keep]] = p[keep]
        return out

    p_in = bytag(sim._dense)
    p_out = bytag(nd)
    L = np.asarray(sim._dense.box.L)
    dp = p_in - p_out
    dp -= np.round(dp / L) * L
    print(
        f"tags ok={ok_tags} overflow={bool(nm.overflow)} "
        f"max wrap-diff={np.abs(dp).max():.4g}",
        flush=True,
    )


def main():
    sim = build()
    sim.run(50)
    dump("t=50", sim._dense)
    check_rebin(sim)
    # single-step to the explosion
    for k in range(60):
        sim.run(1)
        v = np.abs(np.asarray(sim._dense.velocity)).max()
        if v > 1e3:
            print(f"EXPLODED at t={sim.timestep} max|v|={v:.4g} "
                  f"builds={int(sim._meta.n_builds)}", flush=True)
            dump("post", sim._dense)
            break
        if k % 10 == 0:
            print(f"t={sim.timestep} max|v|={v:.4g} builds={int(sim._meta.n_builds)}",
                  flush=True)
    else:
        print("no explosion in 60 single steps; builds=",
              int(sim._meta.n_builds), flush=True)


if __name__ == "__main__":
    main()
