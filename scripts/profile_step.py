"""Ablation profile of the production bench step on the real TPU.

Times variants of a jitted 100-step loop to localize per-step cost:
  full        : production chunk (segmented, rebin every seg_len)
  force_only  : jblocks + pair force only
  integ_only  : step1 + step2 only
  jblocks_only: make_jblocks + trivial reduce
  rebin_only  : rebin every iteration
  drift_only  : needs_rebin reduce every iteration
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_sim
from azplugins_tpu.ops import dense as D


def timeit(name, fn, *args, steps=100):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = time.perf_counter() - t0
    print(f"{name:14s} {dt/steps*1e3:7.3f} ms/step", flush=True)
    return out


def main():
    sim, lj = build_sim()
    sim.run(200)
    sim.tune_cell_capacity()
    sim.run(10)
    spec = sim._grid_spec
    print(
        f"spec: dims={spec.dims} cap={spec.cap} S={spec.S} "
        f"seg_len={sim._seg_len}",
        flush=True,
    )

    integ = sim.operations.integrator
    methods = integ.methods
    dt_ = integ.dt
    seed = sim.seed
    ctx = sim._ctx()
    tbl = lj._device_tables()
    N_tags = sim._state.N
    fields = sim._fields
    steps = 100

    def force(dense, t):
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
        return lj._compute_dense(
            dense, jb, spec, None, t, ctx, tbl, want="force", masked=False
        )

    def full(dense, meta, t0):
        return sim._run_chunk(
            dense, meta, t0, jnp.int32(steps), jnp.int32(sim._seg_len),
            sim._force_tables(), True
        )

    @jax.jit
    def force_only(dense, t0):
        def body(i, d):
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            r = force(d, t0 + i)
            return d.replace(net_force=r.force)

        return jax.lax.fori_loop(0, steps, body, dense)

    @jax.jit
    def integ_only(dense, t0):
        def body(i, d):
            t = t0 + i
            for m in methods:
                d = m.step1(d, dt_, t, seed)
            for m in methods:
                d = m.step2(d, dt_, t, seed)
            return d

        return jax.lax.fori_loop(0, steps, body, dense)

    @jax.jit
    def jblocks_only(dense, t0):
        def body(i, d):
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            jb = D.make_jblocks(d, spec, half=True, need_typeid=False)
            s = jb.x[0, 0, 0] + jb.y[0, 0, 0] + jb.z[0, 0, 0]
            return d.replace(net_force=d.net_force.at[0, 0].add(s))

        return jax.lax.fori_loop(0, steps, body, dense)

    @jax.jit
    def rebin_only(dense, meta, t0):
        def body(i, carry):
            d, mt = carry
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            return D.rebin(
                d, mt, spec, N_tags, fields,
                need_slot_of=mt.slot_of.shape[0] > 0,
            )

        return jax.lax.fori_loop(0, steps, body, (dense, meta))

    @jax.jit
    def drift_only(dense, t0):
        def body(i, d):
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            flag = D.needs_rebin(d, meta, spec)
            return d.replace(
                net_force=d.net_force.at[0, 0].add(flag.astype(jnp.float32))
            )

        return jax.lax.fori_loop(0, steps, body, dense)

    dense, meta = sim._dense, sim._meta
    t0 = jnp.int32(sim.timestep)
    timeit("full", full, dense, meta, t0)
    timeit("force_only", force_only, dense, t0)
    timeit("integ_only", integ_only, dense, t0)
    timeit("jblocks_only", jblocks_only, dense, t0)
    timeit("rebin_only", rebin_only, dense, meta, t0)
    timeit("drift_only", drift_only, dense, t0)


if __name__ == "__main__":
    main()
