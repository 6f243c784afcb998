"""Differential timing harness for the axon TPU relay.

Through the relay, ``block_until_ready`` acks early and a host fetch pays
a large fixed round-trip (~75 ms). The only reliable per-step timing is
DIFFERENTIAL: run the same jitted loop at two iteration counts, fetch one
element to truly drain, and divide the wall-clock difference by the step
difference. Loop length is a traced argument so both counts share one
compilation.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]


def time_loop(fn, args, n_lo=50, n_hi=250, reps=2):
    """fn(*args, n) runs an n-step loop; returns (ms_per_step, fixed_ms)."""
    sync(fn(*args, jnp.int32(n_hi)))  # compile + warm
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args, jnp.int32(n_lo)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(fn(*args, jnp.int32(n_hi)))
        t_hi = time.perf_counter() - t0
        best.append(((t_hi - t_lo) / (n_hi - n_lo) * 1e3,
                     (t_lo * n_hi - t_hi * n_lo) / (n_hi - n_lo) * 1e3))
    ms = min(b[0] for b in best)
    fixed = min(b[1] for b in best)
    return ms, fixed


def main():
    from bench import build_sim
    from azplugins_tpu.ops import dense as D

    sim, lj = build_sim()
    sim.run(200)
    sim.tune_cell_capacity()
    sim.run(10)
    spec = sim._grid_spec
    print(f"spec: dims={spec.dims} cap={spec.cap} seg_len={sim._seg_len}", flush=True)

    dense, meta = sim._dense, sim._meta
    ctx = sim._ctx()
    tbl = lj._device_tables()
    m = sim.operations.integrator.methods[0]
    N_tags = sim._state.N
    fields = sim._fields

    @jax.jit
    def carry_pos(pos, n):
        return jax.lax.fori_loop(0, n, lambda i, p: p + jnp.float32(1e-9), pos)

    @jax.jit
    def langevin_only(dense, n):
        def body(i, d):
            d = m.step1(d, 0.005, i, 1)
            return m.step2(d, 0.005, i, 1)
        return jax.lax.fori_loop(0, n, body, dense)

    @jax.jit
    def force_only(dense, n):
        def body(i, d):
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            jb = D.make_jblocks(d, spec, half=True, need_typeid=False)
            r = lj._compute_dense(d, jb, spec, None, i, ctx, tbl,
                                  want="force", masked=False)
            return d.replace(net_force=r.force)
        return jax.lax.fori_loop(0, n, body, dense)

    @jax.jit
    def rebin_only(dense, meta, n):
        def body(i, carry):
            d, mt = carry
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            return D.rebin(d, mt, spec, N_tags, fields)
        return jax.lax.fori_loop(0, n, body, (dense, meta))

    @jax.jit
    def drift_only(dense, n):
        def body(i, d):
            d = d.replace(position=d.position + jnp.float32(1e-9) * i)
            flag = D.needs_rebin(d, meta, spec)
            return d.replace(
                net_force=d.net_force.at[0, 0].add(flag.astype(jnp.float32)))
        return jax.lax.fori_loop(0, n, body, dense)

    def full(dense, meta, n):
        return sim._run_chunk(dense, meta, jnp.int32(sim.timestep), n,
                              jnp.int32(sim._seg_len), sim._force_tables(), True)

    for name, fn, args in (
        ("carry_pos", carry_pos, (dense.position,)),
        ("langevin_only", langevin_only, (dense,)),
        ("force_only", force_only, (dense,)),
        ("drift_only", drift_only, (dense,)),
        ("rebin_only", rebin_only, (dense, meta)),
        ("full_chunk", full, (dense, meta)),
    ):
        ms, fixed = time_loop(fn, args)
        print(f"{name:14s} {ms:7.3f} ms/step  (+{fixed:6.1f} ms fixed)", flush=True)


if __name__ == "__main__":
    main()
