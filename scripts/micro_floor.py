"""Measure the per-iteration floor of fori_loop bodies on the axon TPU.

Varies (a) number of distinct fusions per iteration, (b) unroll factor,
to distinguish per-iteration vs per-kernel-launch overhead.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def bench(name, fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.4f} ms/iter", flush=True)


def chain_body(x, n_fusions):
    # n_fusions sequential reduce->broadcast barriers (cannot fuse through)
    for _ in range(n_fusions):
        s = jnp.sum(x) * 1e-12
        x = x + s
    return x


def make(n_fusions, iters, unroll=1):
    @jax.jit
    def run(x):
        def body(i, x):
            return chain_body(x + 1e-9 * i, n_fusions)

        return jax.lax.fori_loop(0, iters, body, x, unroll=unroll)

    return run


if __name__ == "__main__":
    x = jnp.ones((96768,), jnp.float32)
    iters = 200
    for nf in (1, 2, 5, 10, 20):
        bench(f"fusions={nf} unroll=1", make(nf, iters), (x,), iters)
    for u in (2, 4, 8):
        bench(f"fusions=5 unroll={u}", make(5, iters, u), (x,), iters)
    # big elementwise work, single fusion
    y = jnp.ones((1728, 56, 128), jnp.float32)

    @jax.jit
    def bigwork(y):
        def body(i, y):
            z = y + 1e-9 * i
            for _ in range(30):
                z = z * 1.0000001 + 1e-9
            return z

        return jax.lax.fori_loop(0, iters, body, y)

    bench("big elementwise single fusion", bigwork, (y,), iters)
