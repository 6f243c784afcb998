"""Per-config rooflines for BASELINE configs 2-5 (VERDICT r3 item 3).

For each config, the differential-timing protocol (bench.py) decomposes
the step: total ms/step, the whole force phase (all forces incl. stencil
row builds, bond scatters, barrier/wall O(N) terms), one rebin, and the
integrator remainder. Then a pinned rebuild-interval sweep answers the
schedule question per config (is dpd's settled interval 2 physics or a
defect? — droplet's interval 1 in round 3 was a defect worth +259%).

Usage: python scripts/config_rooflines.py [config ...]
Configs: polymer dpd patchy droplet (default: all four)
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

import bench as B


def _force_phase_ms(sim, n_lo=20, n_hi=120):
    """Differential ms of the FULL force phase (all attached forces)."""
    import jax
    import jax.numpy as jnp

    tbls = jax.tree_util.tree_map(jnp.asarray, sim._force_tables())
    slot_of = sim._meta.slot_of if sim._grid_spec is not None else None
    has_tq = sim._dense.net_torque is not None

    @jax.jit
    def loop(dense, n):
        def body(i, d):
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            net, ntq = sim._compute_net(d, slot_of, i, tbls)
            d = d.replace(net_force=net)
            if has_tq and ntq is not None:
                d = d.replace(net_torque=ntq)
            return d

        return jax.lax.fori_loop(0, n, body, dense)

    B.sync_scalar(loop(sim._dense, jnp.int32(n_hi)).net_force)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        B.sync_scalar(loop(sim._dense, jnp.int32(n_lo)).net_force)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        B.sync_scalar(loop(sim._dense, jnp.int32(n_hi)).net_force)
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo) * 1e3)
    return best


def _single_force_ms(sim, idx, n_lo=20, n_hi=120):
    """Differential ms of ONE attached force (stencil/bond/external)."""
    import jax
    import jax.numpy as jnp

    f = sim._forces()[idx]
    tbl = jax.tree_util.tree_map(jnp.asarray, f._device_tables())
    tbls = jax.tree_util.tree_map(jnp.asarray, sim._force_tables())
    spec = sim._grid_spec
    slot_of = sim._meta.slot_of if spec is not None else None
    ctx = sim._ctx()
    from azplugins_tpu.ops import dense as D

    masked = bool(np.any(np.asarray(sim._state.box.tilt) != 0.0)) or (
        spec is not None and not spec.newton_ok
    )
    need_t = masked or len(sim._particle_types) > 1

    @jax.jit
    def loop(dense, n):
        def body(i, d):
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            jb = (
                D.make_jblocks(
                    d, spec,
                    getattr(f, "_needs_velocity_j", False),
                    getattr(f, "_needs_tag_j", False),
                    getattr(f, "_needs_quat_j", False),
                    half=spec.newton_ok, need_typeid=need_t,
                )
                if getattr(f, "_needs_nlist", False)
                else None
            )
            r = f._compute_dense(
                d, jb, spec, slot_of, i, ctx, tbl, want="force",
                masked=masked,
            )
            return d.replace(net_force=r.force)

        return jax.lax.fori_loop(0, n, body, dense)

    del tbls
    B.sync_scalar(loop(sim._dense, jnp.int32(n_hi)).net_force)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        B.sync_scalar(loop(sim._dense, jnp.int32(n_lo)).net_force)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        B.sync_scalar(loop(sim._dense, jnp.int32(n_hi)).net_force)
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo) * 1e3)
    return best


def _integrator_ms(sim, n_lo=20, n_hi=120):
    """Differential ms of step1+step2+drift-check (no forces)."""
    import jax
    import jax.numpy as jnp

    from azplugins_tpu.ops import dense as D

    methods = sim.operations.integrator.methods
    dt = sim.operations.integrator.dt
    seed = sim.seed
    spec = sim._grid_spec

    @jax.jit
    def loop(dense, meta, n):
        def body(i, carry):
            d, viol = carry
            for m in methods:
                d = m.step1(d, dt, i, seed)
            viol = viol | D.needs_rebin(d, meta, spec)
            for m in methods:
                d = m.step2(d, dt, i, seed)
            return d, viol

        return jax.lax.fori_loop(0, n, body, (dense, jnp.asarray(False)))

    B.sync_scalar(loop(sim._dense, sim._meta, jnp.int32(n_hi))[0].position)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        B.sync_scalar(loop(sim._dense, sim._meta, jnp.int32(n_lo))[0].position)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        B.sync_scalar(loop(sim._dense, sim._meta, jnp.int32(n_hi))[0].position)
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo) * 1e3)
    return best


def _occupancy(sim):
    import jax

    spec = sim._grid_spec
    tag = jax.device_get(sim._dense.tag)
    counts = (tag.reshape(spec.n_cells, spec.cap) >= 0).sum(1)
    return counts


def roofline(name, builder):
    sim = builder()
    sim.auto_tune_after = 150
    sim.run(250)
    sim._seg_adapt = False
    spec = sim._grid_spec
    settled = sim._seg_len
    print(f"\n=== {name}: N={sim._synced_state().N} dims={spec.dims} "
          f"cap={spec.cap} settled_interval={settled}", flush=True)

    step_ms = B.time_steps(sim, 60, 300)
    force_ms = _force_phase_ms(sim)
    for i, f in enumerate(sim._forces()):
        try:
            fms = _single_force_ms(sim, i)
            print(f"    force[{i}] {type(f).__name__}: {fms:.3f} ms",
                  flush=True)
        except Exception as e:  # pragma: no cover
            print(f"    force[{i}] {type(f).__name__}: FAILED {e}",
                  flush=True)
    rebin_ms = B.time_rebin(sim)
    try:
        integ_ms = _integrator_ms(sim)
        print(f"    integrator+driftcheck: {integ_ms:.3f} ms", flush=True)
    except Exception as e:  # pragma: no cover
        print(f"    integrator probe FAILED {e}", flush=True)
    rebin_amort = rebin_ms / max(settled, 1)
    rest = step_ms - force_ms - rebin_amort
    counts = _occupancy(sim)
    vel = np.asarray(sim._synced_state().velocity)
    vmax = float(np.sqrt((vel * vel).sum(-1).max()))
    dt = sim.dt_ref()
    est = 0.5 * spec.buffer / max(vmax * dt, 1e-12)
    print(f"  step {step_ms:.3f} ms = forces {force_ms:.3f} + "
          f"rebin {rebin_ms:.3f}/{settled} ({rebin_amort:.3f}) + "
          f"other {rest:.3f}", flush=True)
    print(f"  occupancy mean {counts.mean():.2f} max {counts.max()} "
          f"empty {100 * (counts == 0).mean():.0f}%  "
          f"vmax*dt margin estimate -> interval {est:.1f}", flush=True)

    # pinned-interval sweep: time each interval; run() halves the pin if
    # the Verlet check actually fires (physics vetoes the schedule)
    print("  interval sweep:", flush=True)
    for seg in (2, 3, 4, 6, 8, 12):
        if seg == settled:
            print(f"    seg={seg}: {step_ms:.3f} ms/step (settled)",
                  flush=True)
            continue
        sim._seg_len = seg
        sim._seg_ceiling = seg
        sim._realign = False
        try:
            ms = B.time_steps(sim, 60, 300)
        except Exception as e:  # pragma: no cover
            print(f"    seg={seg}: FAILED {e}", flush=True)
            continue
        note = "" if sim._seg_len == seg else (
            f" (VIOLATED -> halved to {sim._seg_len}: physics vetoes it)"
        )
        print(f"    seg={seg}: {ms:.3f} ms/step{note}", flush=True)
        sim._seg_len = settled
        sim._seg_ceiling = settled
    return step_ms


def main():
    which = sys.argv[1:] or ["polymer", "dpd", "patchy", "droplet"]
    builders = {
        "polymer": B.build_polymer_melt,
        "dpd": B.build_dpd_fluid,
        "patchy": B.build_patchy,
        "droplet": B.build_droplet,
        "headline": lambda: B.build_sim()[0],
    }
    for w in which:
        roofline(w, builders[w])


if __name__ == "__main__":
    main()
