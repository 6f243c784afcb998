"""Microbenchmark: VPU throughput of the dense pair-eval math vs block shape.

Hypothesis under test: XLA pads the minor (lane) dimension of the
[C, cap, J] pair blocks to 128, so J=56 wastes >2x VPU throughput and the
force kernel should be shaped so its lane dimension is a multiple of 128
(e.g. pack 2+ stencil offsets into one J block, or use a Pallas kernel
with explicit (8, 128) tiling).

Each case runs the same abstract work: `n_off` offsets x [C, cap, J] pair
evaluations of PLJ-like math with i-side reduction. Reported rate is
pair-evals/s (lane-slots/s tells the padding story).
"""

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np


def plj_math(dx, dy, dz):
    rsq = dx * dx + dy * dy + dz * dz
    r2inv = 1.0 / rsq
    r6inv = r2inv * r2inv * r2inv
    f = r6inv * (12.0 * r6inv - 6.0 * 0.5) * r2inv
    e = r6inv * (r6inv - 0.5)
    inside = rsq < 9.0
    f = jnp.where(inside, f, 0.0)
    e = jnp.where(inside, e, 0.0)
    return e, f


def make_case(C, cap, J, n_off, dtype=jnp.float32):
    """Scan over n_off offsets of [C, cap, J] blocks (mimics _scan_stencil)."""
    key = jax.random.PRNGKey(0)
    xi = jax.random.normal(key, (C, cap, 1), dtype)
    yi = xi * 1.1
    zi = xi * 0.9
    jx = jax.random.normal(key, (n_off, C, J), dtype)
    jy = jx * 1.2
    jz = jx * 0.8

    @jax.jit
    def run(xi, yi, zi, jx, jy, jz):
        def body(carry, js):
            jxx, jyy, jzz = js
            dx = xi - jxx[:, None, :]
            dy = yi - jyy[:, None, :]
            dz = zi - jzz[:, None, :]
            e, f = plj_math(dx, dy, dz)
            return (
                carry[0] + jnp.sum(f * dx, axis=-1),
                carry[1] + jnp.sum(f * dy, axis=-1),
                carry[2] + jnp.sum(f * dz, axis=-1),
            ), None

        carry0 = tuple(jnp.zeros((C, cap), dtype) for _ in range(3))
        out, _ = jax.lax.scan(body, carry0, (jx, jy, jz))
        return out

    return run, (xi, yi, zi, jx, jy, jz)


def time_case(name, C, cap, J, n_off, iters=30):
    run, args = make_case(C, cap, J, n_off)

    @jax.jit
    def loop(args):
        def body(i, acc):
            xi = args[0] + 1e-9 * i
            out = run(xi, *args[1:])
            return acc + out[0][0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    r = loop(args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = loop(args)
    float(r)
    dt = (time.perf_counter() - t0) / iters
    pairs = C * cap * J * n_off
    print(
        f"{name:42s} C={C} cap={cap} J={J} off={n_off} "
        f"{dt*1e3:7.3f} ms  {pairs/dt/1e9:7.2f} Gpair/s",
        flush=True,
    )


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    # current production shape: cap=56, J=56, 14 offsets (half stencil+self)
    time_case("current [1728,56,56] x14", 1728, 56, 56, 14)
    # lane-aligned J: two offsets packed -> J=112 (pads to 128): same work
    time_case("packed2 [1728,56,112] x7", 1728, 56, 112, 7)
    # exactly 128 lanes
    time_case("J=128 [1728,56,128] x7", 1728, 56, 128, 7)
    time_case("J=128 [1728,56,128] x14", 1728, 56, 128, 14)
    # bigger caps
    time_case("cap64 [1728,64,64] x14", 1728, 64, 64, 14)
    time_case("cap64 J128 [1728,64,128] x7", 1728, 64, 128, 7)
    # huge flat lanes
    time_case("flatJ [1728,56,784] x1", 1728, 56, 784, 1)
    time_case("flatJ128 [1728,56,768] x1", 1728, 56, 768, 1)
    # small cells shape (k=2-ish): many cells, tiny cap
    time_case("small [13824,16,16] x63", 13824, 16, 16, 63)
    # column-band shape: [n_cols=144, cap_col=448] band J=96, 5 col-pairs
    time_case("band [144,448,96] x5", 144, 448, 96, 5)
    time_case("band [144,448,128] x5", 144, 448, 128, 5)
