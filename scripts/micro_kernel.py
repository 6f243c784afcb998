"""Isolated timings: Pallas pair kernel vs its wrapper stages (TPU)."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_sim
from azplugins_tpu.ops import dense as D
from azplugins_tpu.ops import pallas_pair as PP
from azplugins_tpu.ops.evaluators.pair import PAIR_POTENTIALS


def timeit(name, fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = time.perf_counter() - t0
    print(f"{name:24s} {dt/iters*1e3:7.3f} ms", flush=True)


def main():
    sim, lj = build_sim()
    sim.run(200)
    sim.tune_cell_capacity()
    sim.run(10)
    spec = sim._grid_spec
    dense = sim._dense
    C, cap = spec.n_cells, spec.cap
    offsets = spec.half_stencil()
    print(f"cap={cap} J={(len(offsets)+1)*cap} C={C}", flush=True)
    iters = 50

    prec = PAIR_POTENTIALS["PerturbedLennardJones"].precompute(
        dict(epsilon=1.0, sigma=1.0, attraction_scale_factor=0.5)
    )
    keys = sorted(prec)
    scalars = [jnp.float32(prec[k]) for k in keys] + [jnp.float32(9.0)]

    def f_divr(dx, dy, dz, rsq, ei, ej, svals):
        p = dict(zip(keys, svals))
        rcs = svals[-1]
        _, f = PAIR_POTENTIALS["PerturbedLennardJones"].energy_force(rsq, rcs, p)
        f = jnp.where(rsq < rcs, f, 0.0)
        fx, fy, fz = f * dx, f * dy, f * dz
        return [fx, fy, fz], [-fx, -fy, -fz]

    shifts = D._axis_shift_tables(dense.box)
    cap_pad = PP.pad_cap(cap)
    fills = (-PP._SENTINEL, 0.0, 0.0)
    its = [dense.position[:, k].reshape(C, cap).T for k in range(3)]
    jts = [
        D._stencil_rows_t(c, spec, offsets, s, cap_pad=cap_pad, fill=f)
        for c, s, f in zip(its, shifts, fills)
    ]
    counts = D._cell_counts(dense, spec)
    stc = D._stencil_counts(counts, spec, offsets)

    @jax.jit
    def kernel_only(its, jts):
        def body(i, acc):
            jts2 = [a + 1e-12 * i for a in jts]
            fi, fj = PP.stencil_pair_force_kernel(
                f_divr, scalars, *its, *jts2, counts, stc, cap_pad=cap_pad
            )
            return acc + fi[0][0, 0] + fj[0][0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @jax.jit
    def jbt_only(dense):
        def body(i, acc):
            d = dense.replace(position=dense.position + 1e-9 * i)
            its = [d.position[:, k].reshape(C, cap).T for k in range(3)]
            jts = [
                D._stencil_rows_t(c, spec, offsets, s)
                for c, s in zip(its, shifts)
            ]
            return acc + jts[0][0, 0] + jts[1][0, 0] + jts[2][0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @jax.jit
    def wrapper_full(dense):
        tbl = {k: jnp.full((1, 1), float(v), jnp.float32) for k, v in prec.items()}
        r_cut = jnp.full((1, 1), 3.0, jnp.float32)
        jb = D.JBlocks(x=None, y=None, z=None, half=True, preshifted=True)

        def body(i, acc):
            d = dense.replace(position=dense.position + 1e-9 * i)
            r = D._pallas_half_pair_force(
                PAIR_POTENTIALS["PerturbedLennardJones"].energy_force,
                d, jb, spec, tbl, r_cut,
            )
            return acc + r.force[0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    timeit("kernel only", kernel_only, its, jts, iters=iters)
    timeit("stencil rows build", jbt_only, dense, iters=iters)
    timeit("wrapper full force", wrapper_full, dense, iters=iters)

    def f_trivial(dx, dy, dz, rsq, ei, ej, svals):
        f = jnp.where(rsq < svals[-1], rsq * svals[0], 0.0)
        fx, fy, fz = f * dx, f * dy, f * dz
        return [fx, fy, fz], [-fx, -fy, -fz]

    def make_kernel(evalf, cb):
        @jax.jit
        def k(its, jts):
            def body(i, acc):
                jts2 = [a + 1e-12 * i for a in jts]
                fi, fj = PP.stencil_pair_force_kernel(
                    evalf, scalars, *its, *jts2, counts, stc,
                    cap_pad=cap_pad, cell_block=cb
                )
                return acc + fi[0][0, 0] + fj[0][0, 0]

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        return k

    timeit("kernel trivial eval", make_kernel(f_trivial, 128), its, jts,
           iters=iters)
    timeit("kernel CB=256", make_kernel(f_divr, 256), its, jts, iters=iters)
    timeit("kernel CB=512", make_kernel(f_divr, 512), its, jts, iters=iters)


if __name__ == "__main__":
    main()
