"""Minimal repro: do the stencil rolls differ before/after a lax.cond?"""

import os
import sys

sys.path.insert(0, "/root/repo")

FORCE_CPU = os.environ.get("AZ_FORCE_CPU", "0") == "1"
if FORCE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

if FORCE_CPU:
    try:
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
        _xb._clear_backends()
    except Exception:
        pass

from scripts.bisect_step import build, load
from azplugins_tpu.ops import dense as D


def main():
    sim = build()
    sim._attach()
    sim._ensure_dense()
    spec = sim._grid_spec
    N = sim._state.N
    fields = sim._fields
    d, m, t = load("/tmp/vf/tr_60.npz", sim._dense, sim._meta)
    integ = sim.operations.integrator
    methods = integ.methods
    dt_ = integ.dt
    seed = sim.seed

    @jax.jit
    def probe(d, m, tt):
        for meth in methods:
            d = meth.step1(d, dt_, tt, seed)
        d2, m2 = jax.lax.cond(
            D.needs_rebin(d, m, spec),
            lambda a: D.rebin(a[0], a[1], spec, N, fields),
            lambda a: a,
            (d, m),
        )
        jb1 = D.make_jblocks(d, spec, half=True, need_typeid=False)
        jb2 = D.make_jblocks(d2, spec, half=True, need_typeid=False)
        dpos = jnp.max(jnp.abs(d2.position - d.position))
        dx = jnp.max(jnp.abs(jb1.x - jb2.x), axis=(1, 2))  # per offset
        dy = jnp.max(jnp.abs(jb1.y - jb2.y), axis=(1, 2))
        dz = jnp.max(jnp.abs(jb1.z - jb2.z), axis=(1, 2))
        return dpos, dx, dy, dz

    dpos, dx, dy, dz = probe(d, m, jnp.int32(t))
    print("pos diff:", float(dpos))
    print("jb.x per-offset diff:", np.asarray(dx))
    print("jb.y per-offset diff:", np.asarray(dy))
    print("jb.z per-offset diff:", np.asarray(dz))
    print("offsets:", spec.half_stencil().tolist())


if __name__ == "__main__":
    main()
