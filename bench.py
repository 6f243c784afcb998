"""Benchmark: 64k-particle perturbed-LJ fluid, NVT Langevin (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extra}.

Config (see BENCH.md): N = 40^3 = 64,000, rho = 0.85, r_cut = 3.0 (the
azplugins PerturbedLennardJones doc example cutoff), Verlet buffer 0.4,
dt = 0.005, Langevin kT = 1.0. vs_baseline is measured TPS divided by an
estimated HOOMD-blue H100 rate for the same system (no published number
exists; see BASELINE.md — the reference publishes none).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

H100_HOOMD_TPS_ESTIMATE = 1500.0  # documented estimate, see BENCH.md


def build_sim(N_side=40, rho=0.85, seed=12345):
    import azplugins_tpu as az

    N = N_side**3
    L = (N / rho) ** (1.0 / 3.0)
    a = L / N_side
    snap = az.Snapshot(N=N)
    snap.configuration.box = [L, L, L, 0, 0, 0]
    snap.particles.types = ["A"]
    x = (np.arange(N_side) + 0.5) * a - L / 2
    snap.particles.position[:] = np.stack(
        np.meshgrid(x, x, x, indexing="ij"), axis=-1
    ).reshape(-1, 3)

    sim = az.Simulation(seed=seed)
    sim.create_state_from_snapshot(snap)
    cell = az.md.nlist.Cell(buffer=0.4)
    lj = az.pair.PerturbedLennardJones(nlist=cell, default_r_cut=3.0, mode="none")
    lj.params[("A", "A")] = dict(epsilon=1.0, sigma=1.0, attraction_scale_factor=0.5)
    lang = az.md.methods.Langevin(kT=1.0, default_gamma=0.1)
    sim.operations.integrator = az.md.Integrator(dt=0.005, methods=[lang], forces=[lj])
    sim.state.thermalize_particle_momenta(kT=1.0)
    return sim, lj


def time_force_kernel(sim, lj, iters=50):
    """Isolated force-kernel latency (dense stencil pair force).

    Measured with an on-device fori_loop: through the remote TPU relay,
    per-call timing round-trips arguments and block_until_ready acks early.
    """
    import jax
    import jax.numpy as jnp

    ctx = sim._ctx()
    tbl = lj._device_tables()
    spec = sim._grid_spec
    from azplugins_tpu.ops import dense as D

    @jax.jit
    def loop(dense):
        def body(i, d):
            # nudge positions so XLA cannot hoist the loop-invariant kernel
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            jb = D.make_jblocks(
                d, spec, half=spec.newton_ok, need_typeid=False
            )
            r = lj._compute_dense(
                d, jb, spec, None, jnp.int32(i), ctx, tbl, want="force",
                masked=False,
            )
            return d.replace(net_force=r.force)

        return jax.lax.fori_loop(0, iters, body, dense)

    out = loop(sim._dense)
    jax.block_until_ready(out.position)
    t0 = time.perf_counter()
    out = loop(sim._dense)
    jax.block_until_ready(out.position)
    np.asarray(out.net_force[0])
    return (time.perf_counter() - t0) / iters * 1e3


def _stage(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    warm_steps = int(os.environ.get("BENCH_WARM", "200"))
    steps = int(os.environ.get("BENCH_STEPS", "1000"))
    n_side = int(os.environ.get("BENCH_NSIDE", "40"))

    t0 = time.perf_counter()
    sim, lj = build_sim(N_side=n_side)
    _stage(f"built sim N={n_side**3} in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    sim.run(warm_steps)  # compile + equilibrate + settle capacities
    _stage(f"warmup {warm_steps} steps in {time.perf_counter()-t0:.1f}s")
    sim.tune_cell_capacity()  # shrink transient overflow growth (one recompile)
    sim.run(10)
    _stage(f"tuned: cap={sim._grid_spec.cap} dims={sim._grid_spec.dims}")

    t0 = time.perf_counter()
    sim.run(steps)
    elapsed = time.perf_counter() - t0
    tps = steps / elapsed
    _stage(f"timed {steps} steps in {elapsed:.1f}s")

    kernel_ms = time_force_kernel(sim, lj)
    _stage("kernel timed")
    n_builds = int(sim._meta.n_builds)

    # physics sanity so the number is honest: temperature near target
    import azplugins_tpu as az

    thermo = az.compute.ThermodynamicQuantities()
    sim.operations.computes.append(thermo)
    thermo._attach(sim)
    kT = thermo.kinetic_temperature

    result = {
        "metric": "timesteps_per_second_64k_perturbed_lj",
        "value": round(tps, 1),
        "unit": "steps/s",
        "vs_baseline": round(tps / H100_HOOMD_TPS_ESTIMATE, 3),
        "extra": {
            "N": sim._synced_state().N,
            "force_kernel_ms": round(kernel_ms, 3),
            "ms_per_step": round(1e3 / tps, 3),
            "nlist_rebuilds": n_builds,
            "kinetic_temperature": round(float(kT), 3),
            "baseline_note": "vs estimated HOOMD H100 1500 TPS (no published ref numbers)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
