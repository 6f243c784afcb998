"""Patchy "other"-phase decomposition + compact-N integration model.

VERDICT r4 #5: patchy's roofline shows "other" (integrate_step1 +
verlet_drift_check + integrate_step2 + loop plumbing) = 1.224 ms/step at
S = 7.2x N (194k slots for 27k particles, cap 16 over 12167 cells) —
the integrator pays per SLOT. The untried lever is compact-N
integration: keep the per-particle integrator state in TAG order
([N] rows, stable across rebins), scatter only positions(+orientations)
into the slot layout for the force pass, gather only forces(+torques)
back. This harness measures, on chip, with the bench differential
protocol:

  1. integrator_S      — step1+step2 at the current [S]-slot shape
  2. integrator_N      — identical math at the compact [Npad] shape
  3. move_per_step     — the scatter/gather traffic compact-N adds:
                         scatter pos [N,3] + quat [N,4] to slots,
                         gather force [N,3] + torque [N,3] from slots
  4. drift_check_S / N — the Verlet drift check at both shapes
  5. rng_S             — the two particle_uniform3 draws at [S]
  6. rotation_S        — NO_SQUISH free_rotation alone at [S]

Decision rule: compact-N wins iff (2) + (3) + (4b) < (1) + (4a) by
enough to clear the implementation risk; the projected full-step gain
is printed at the end.

Usage: python scripts/patchy_integrator.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

import bench as B


def _diff_ms(fn, args, n_lo=40, n_hi=240, reps=3, probe=None):
    """Differential ms/iter of jitted fn(args..., n) over a fori_loop."""
    import jax.numpy as jnp

    probe = probe or (lambda out: out)
    B.sync_scalar(probe(fn(*args, jnp.int32(n_hi))))
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        B.sync_scalar(probe(fn(*args, jnp.int32(n_lo))))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        B.sync_scalar(probe(fn(*args, jnp.int32(n_hi))))
        t_hi = time.perf_counter() - t0
        diffs.append((t_hi - t_lo) / (n_hi - n_lo) * 1e3)
    diffs.sort()
    return diffs[len(diffs) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from azplugins_tpu.core import rng as R
    from azplugins_tpu.md import rotation as ROT
    from azplugins_tpu.ops import dense as D

    sim = B.build_patchy()
    sim.auto_tune_after = 150
    sim.run(250)
    sim._seg_adapt = False
    spec = sim._grid_spec
    dense = sim._dense
    meta = sim._meta
    N = sim._state.N
    S = dense.position.shape[0]
    Npad = ((N + 127) // 128) * 128
    print(f"[patchy] N={N} S={S} Npad={Npad} cap={spec.cap} "
          f"dims={spec.dims} seg={sim._seg_len}", flush=True)

    methods = sim.operations.integrator.methods
    dt = sim.operations.integrator.dt
    seed = sim.seed

    def integ_loop(d, n):
        def body(i, d):
            t = jnp.int32(i)
            for m in methods:
                d = m.step1(d, dt, t, seed)
            for m in methods:
                d = m.step2(d, dt, t, seed)
            return d

        return jax.lax.fori_loop(0, n, body, d)

    # 1. current [S]-slot integrator cost
    f_S = jax.jit(integ_loop)
    ms_S = _diff_ms(f_S, (dense,), probe=lambda d: d.position)

    # 2. identical math at the compact [Npad] shape (tag-ordered rows;
    # values sliced from the dense state — timing only needs the shape)
    def _slice(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == S:
            return x[:Npad]
        return x

    compact = jax.tree_util.tree_map(_slice, dense)
    ms_N = _diff_ms(f_S, (compact,), probe=lambda d: d.position)

    # 3. per-step movement compact-N adds. slot index per tag from meta
    # when available, else synthesized (row i -> slot i*cap//...): the
    # gather/scatter cost depends on row count, not index values.
    slot_idx = jnp.asarray(
        np.random.default_rng(0).permutation(S)[:Npad].astype(np.int32)
    )

    def move_loop(pos_c, quat_c, pos_s, quat_s, f_s, tq_s, n):
        def body(i, carry):
            pc, qc, ps, qs = carry
            pc = pc + jnp.float32(1e-9) * i
            ps = ps.at[slot_idx].set(pc)          # scatter positions
            qs = qs.at[slot_idx].set(qc)          # scatter orientations
            fc = jnp.take(f_s, slot_idx, axis=0)  # gather forces
            tc = jnp.take(tq_s, slot_idx, axis=0)  # gather torques
            pc = pc + jnp.float32(1e-9) * (fc + tc)
            return pc, qc, ps, qs

        return jax.lax.fori_loop(
            0, n, body, (pos_c, quat_c, pos_s, quat_s)
        )

    args_mv = (
        compact.position, compact.orientation, dense.position,
        dense.orientation, dense.net_force, dense.net_torque,
    )
    ms_mv = _diff_ms(jax.jit(move_loop), args_mv, probe=lambda c: c[0])

    # 4. drift check at both shapes
    def drift_loop(d, mt, n):
        def body(i, carry):
            d, acc = carry
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            return d, acc | D.needs_rebin(d, mt, spec)

        return jax.lax.fori_loop(0, n, body, (d, jnp.asarray(False)))

    f_drift = jax.jit(drift_loop)
    ms_drift_S = _diff_ms(f_drift, (dense, meta), probe=lambda c: c[0].position)
    meta_c = meta.replace(ref_position=meta.ref_position[:Npad])
    ms_drift_N = _diff_ms(
        f_drift, (compact, meta_c), probe=lambda c: c[0].position
    )

    # 5. RNG component at [S]: the two uniform3 draws of the Langevin step
    def rng_loop(tag, n):
        def body(i, acc):
            u1 = R.particle_uniform3(R.Stream.LANGEVIN, seed, i, tag)
            u2 = R.particle_uniform3(R.Stream.LANGEVIN_ANGULAR, seed, i, tag)
            return acc + u1 + u2

        return jax.lax.fori_loop(
            0, n, body, jnp.zeros((tag.shape[0], 3), jnp.float32)
        )

    ms_rng = _diff_ms(jax.jit(rng_loop), (dense.tag,))

    # 6. NO_SQUISH free rotation alone at [S]
    def rot_loop(q, p, inertia, n):
        def body(i, carry):
            q, p = carry
            q2, p2 = ROT.free_rotation(q, p, inertia, dt)
            return q2 + jnp.float32(1e-12) * i, p2

        return jax.lax.fori_loop(0, n, body, (q, p))

    ms_rot = _diff_ms(
        jax.jit(rot_loop),
        (dense.orientation, dense.angmom, dense.moment_inertia),
        probe=lambda c: c[0],
    )

    print(f"[patchy] integrator_S   {ms_S:.3f} ms/step", flush=True)
    print(f"[patchy] integrator_N   {ms_N:.3f} ms/step", flush=True)
    print(f"[patchy] move_per_step  {ms_mv:.3f} ms/step", flush=True)
    print(f"[patchy] drift_S        {ms_drift_S:.3f} ms/step", flush=True)
    print(f"[patchy] drift_N        {ms_drift_N:.3f} ms/step", flush=True)
    print(f"[patchy] rng_S          {ms_rng:.3f} ms/step", flush=True)
    print(f"[patchy] rotation_S     {ms_rot:.3f} ms/step", flush=True)
    cur = ms_S + ms_drift_S
    new = ms_N + ms_mv + ms_drift_N
    print(f"[patchy] compact-N projected: {cur:.3f} -> {new:.3f} ms "
          f"({cur - new:+.3f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
