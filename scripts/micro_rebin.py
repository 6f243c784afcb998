"""Profile the rebin pipeline stages on the TPU at 64k bench shapes."""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_sim
from azplugins_tpu.ops import dense as D


def timeit(name, fn, *args, iters=50):
    """Differential: (t(3*iters) - t(iters)) / (2*iters) — relay
    dispatch/fetch fixed costs (~ms) cancel (bench.py protocol)."""

    def once(k):
        t0 = time.perf_counter()
        out = fn(*args, jnp.int32(k))
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        return time.perf_counter() - t0

    once(iters)  # compile both counts
    once(3 * iters)
    best = min(
        (once(3 * iters) - once(iters)) / (2 * iters) for _ in range(3)
    )
    print(f"{name:22s} {best*1e3:7.3f} ms", flush=True)


def main():
    sim, lj = build_sim()
    sim.run(250)  # auto-tune at 200 rightsizes cap to the fluid
    spec = sim._grid_spec
    dense, meta = sim._dense, sim._meta
    N = sim._state.N
    fields = sim._fields
    n = dense.N
    iters = 50
    layout = D._payload_layout(fields)
    K = sum(w for _, w, _ in layout)
    print(f"S={spec.S} cap={spec.cap} payload={K}", flush=True)

    @jax.jit
    def full(d, m, nn):
        def body(i, carry):
            dd, mm = carry
            dd = dd.replace(position=dd.position + 1e-9 * i)
            return D.rebin(dd, mm, spec, N, fields, need_slot_of=False)

        return jax.lax.fori_loop(0, nn, body, (d, m))

    @jax.jit
    def sort_only(d, nn):
        def body(i, x):
            key = (d.tag + i) | jnp.int32(1)
            return x + jax.lax.sort(key)[0]

        return jax.lax.fori_loop(0, nn, body, jnp.int32(0))

    packed = D._pack_payload(dense, layout)
    perm0 = jnp.argsort(dense.tag)

    @jax.jit
    def take_only(packed, perm, nn):
        def body(i, x):
            out = jnp.take(packed, (perm + i) % n, axis=0)
            return x + out[0, 0]

        return jax.lax.fori_loop(0, nn, body, jnp.int32(0))

    @jax.jit
    def scatter_only(packed, perm, nn):
        S = spec.S

        def body(i, x):
            dest = (perm + i) % n
            base = jnp.zeros((S + 1, packed.shape[1]), jnp.int32)
            out = base.at[dest].set(packed, mode="drop")
            return x + out[0, 0]

        return jax.lax.fori_loop(0, nn, body, jnp.int32(0))

    @jax.jit
    def take_narrow(perm, nn):
        S = spec.S

        def body(i, x):
            idx = (jnp.arange(S, dtype=jnp.int32) + i) % n
            out = jnp.take(perm, jnp.take(perm, idx) % n)
            return x + out[0]

        return jax.lax.fori_loop(0, nn, body, jnp.int32(0))

    @jax.jit
    def wrap_only(d, nn):
        def body(i, x):
            p, im = d.box.wrap(d.position + 1e-9 * i, d.image)
            return x + p[0, 0]

        return jax.lax.fori_loop(0, nn, body, jnp.float32(0))

    @jax.jit
    def cummax_only(d, nn):
        def body(i, x):
            v = jax.lax.cummax(d.tag + i)
            return x + v[-1]

        return jax.lax.fori_loop(0, nn, body, jnp.int32(0))

    # gather1: N-row head gather of the sorted payload; gather2: S-row
    # slot materialization (the two movements the rebin is built from)
    @jax.jit
    def take_head(packed, perm, nn):
        def body(i, x):
            out = jnp.take(packed, (perm[:N] + i) % n, axis=0)
            return x + out[0, 0]

        return jax.lax.fori_loop(0, nn, body, jnp.int32(0))

    C = spec.n_cells
    cid_s0 = jnp.sort(
        D._cell_id(dense.position[:, 0], dense.position[:, 1],
                   dense.position[:, 2], dense.box, spec.dims)
    )

    def make_ss(method):
        @jax.jit
        def ss(cid_s, nn):
            def body(i, x):
                q = jnp.arange(C + 1, dtype=jnp.int32) + (i - i)
                st = jnp.searchsorted(cid_s + i - i, q, method=method)
                return x + st[0].astype(jnp.int32)

            return jax.lax.fori_loop(0, nn, body, jnp.int32(0))

        return ss

    @jax.jit
    def cellid_only(d, nn):
        def body(i, x):
            cid = D._cell_id(
                d.position[:, 0] + 1e-9 * i, d.position[:, 1],
                d.position[:, 2], d.box, spec.dims,
            )
            return x + cid[0]

        return jax.lax.fori_loop(0, nn, body, jnp.int32(0))

    timeit("full rebin", full, dense, meta, iters=iters)
    timeit("sort(key) only", sort_only, dense, iters=iters)
    timeit("take rows S", take_only, packed, perm0, iters=iters)
    timeit("take rows N(head)", take_head, packed, perm0, iters=iters)
    timeit("take narrow x2", take_narrow, perm0, iters=iters)
    timeit("scatter rows", scatter_only, packed, perm0, iters=iters)
    timeit("wrap", wrap_only, dense, iters=iters)
    timeit("cell_id", cellid_only, dense, iters=iters)
    timeit("cummax", cummax_only, dense, iters=iters)
    timeit("searchsorted scan", make_ss("scan"), cid_s0, iters=iters)
    timeit("searchsorted sort", make_ss("sort"), cid_s0, iters=iters)

    import os

    os.environ["AZTPU_REBIN_COMPOSED"] = "1"
    jax.clear_caches()
    timeit("full rebin composed", full, dense, meta, iters=iters)
    del os.environ["AZTPU_REBIN_COMPOSED"]


if __name__ == "__main__":
    main()
