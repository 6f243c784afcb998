"""Single-step probe: does the rebin cond change the computed pair force?"""

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
    tbls = sim._force_tables()
    spec = sim._grid_spec
    N = sim._state.N
    fields = sim._fields
    d, m, t = load("/tmp/vf/tr_60.npz", sim._dense, sim._meta)
    integ = sim.operations.integrator
    methods = integ.methods
    dt_ = integ.dt
    seed = sim.seed
    lj = integ.forces[0]
    ctx = sim._ctx()
    tbl = tbls[0]

    def show(label, F, tags):
        tags = np.asarray(tags)
        F = np.asarray(F)
        s1 = int(np.where(tags == 674)[0][0])
        s2 = int(np.where(tags == 764)[0][0])
        print(label, F[s1], F[s2], flush=True)

    def net_of(dense, slot_of, tt):
        jb = D.make_jblocks(dense, spec, half=True, need_typeid=False)
        r = lj._compute_dense(
            dense, jb, spec, slot_of, tt, ctx, tbl, want="force", masked=False
        )
        return r.force

    @jax.jit
    def step_no_cond(d, m, tt):
        for meth in methods:
            d = meth.step1(d, dt_, tt, seed)
        return net_of(d, m.slot_of, tt), d.tag

    F, tags = step_no_cond(d, m, jnp.int32(t))
    show("no cond  :", F, tags)

    @jax.jit
    def step_with_cond(d, m, tt):
        for meth in methods:
            d = meth.step1(d, dt_, tt, seed)
        d, m = jax.lax.cond(
            D.needs_rebin(d, m, spec),
            lambda a: D.rebin(a[0], a[1], spec, N, fields),
            lambda a: a,
            (d, m),
        )
        return net_of(d, m.slot_of, tt), d.tag

    F, tags = step_with_cond(d, m, jnp.int32(t))
    show("with cond:", F, tags)

    def one_step(dd, mm, tt):
        for meth in methods:
            dd = meth.step1(dd, dt_, tt, seed)
        dd, mm = jax.lax.cond(
            D.needs_rebin(dd, mm, spec),
            lambda a: D.rebin(a[0], a[1], spec, N, fields),
            lambda a: a,
            (dd, mm),
        )
        net = net_of(dd, mm.slot_of, tt)
        dd = dd.replace(net_force=net)
        for meth in methods:
            dd = meth.step2(dd, dt_, tt, seed)
        return dd, mm

    @jax.jit
    def full_step(d, m, tt):
        nd, nm = one_step(d, m, tt)
        return nd.net_force, nd.tag

    F, tags = full_step(d, m, jnp.int32(t))
    show("full one_step:", F, tags)

    @jax.jit
    def fori_chunk(d, m, t0, n):
        def body(i, carry):
            dd, mm = carry
            return one_step(dd, mm, t0 + i)

        nd, nm = jax.lax.fori_loop(0, n, body, (d, m))
        return nd.net_force, nd.tag

    F, tags = fori_chunk(d, m, jnp.int32(t), jnp.int32(1))
    show("fori(1 dyn) :", F, tags)

    @jax.jit
    def state_probe(d, m, tt):
        for meth in methods:
            d = meth.step1(d, dt_, tt, seed)
        pred = D.needs_rebin(d, m, spec)
        d2, m2 = jax.lax.cond(
            pred,
            lambda a: D.rebin(a[0], a[1], spec, N, fields),
            lambda a: a,
            (d, m),
        )
        same_pos = jnp.max(jnp.abs(d2.position - d.position))
        same_tag = jnp.sum(jnp.abs(d2.tag - d.tag))
        return pred, same_pos, same_tag, jnp.asarray(m2.n_builds)

    pred, dp, dtag, nb = state_probe(d, m, jnp.int32(t))
    print(f"pred={bool(pred)} max|pos diff|={float(dp)} tagdiff={int(dtag)} "
          f"builds={int(nb)}", flush=True)

    @jax.jit
    def step_cond_barrier(d, m, tt):
        for meth in methods:
            d = meth.step1(d, dt_, tt, seed)
        d, m = jax.lax.cond(
            D.needs_rebin(d, m, spec),
            lambda a: D.rebin(a[0], a[1], spec, N, fields),
            lambda a: a,
            (d, m),
        )
        d, m = jax.lax.optimization_barrier((d, m))
        return net_of(d, m.slot_of, tt), d.tag

    F, tags = step_cond_barrier(d, m, jnp.int32(t))
    show("cond+barrier:", F, tags)


if __name__ == "__main__":
    main()
