"""Sweep minor-dim J of the scanned pair blocks + transposed layout test."""

import time
import sys

import jax
import jax.numpy as jnp

from micro_pairshape import make_case, plj_math


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
        f"{name:34s} {dt*1e3:8.3f} ms  {pairs/dt/1e9:7.2f} Gpair/s",
        flush=True,
    )


def time_transposed(name, C, cap, n_off, iters=30):
    """Layout [cap_i, cap_j, C]: C on lanes (perfectly aligned)."""
    key = jax.random.PRNGKey(0)
    xi = jax.random.normal(key, (cap, 1, C), jnp.float32)
    yi = xi * 1.1
    zi = xi * 0.9
    jx = jax.random.normal(key, (n_off, cap, C), jnp.float32)
    jy = jx * 1.2
    jz = jx * 0.8

    @jax.jit
    def loop(args):
        xi, yi, zi, jx, jy, jz = args

        def body(i, acc):
            xi2 = xi + 1e-9 * i

            def sbody(carry, js):
                jxx, jyy, jzz = js
                dx = xi2 - jxx[None, :, :]
                dy = yi - jyy[None, :, :]
                dz = zi - jzz[None, :, :]
                e, f = plj_math(dx, dy, dz)
                return (
                    carry[0] + jnp.sum(f * dx, axis=1),
                    carry[1] + jnp.sum(f * dy, axis=1),
                    carry[2] + jnp.sum(f * dz, axis=1),
                ), None

            carry0 = tuple(jnp.zeros((cap, C), jnp.float32) for _ in range(3))
            out, _ = jax.lax.scan(sbody, carry0, (jx, jy, jz))
            return acc + out[0][0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    args = (xi, yi, zi, jx, jy, jz)
    r = loop(args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = loop(args)
    float(r)
    dt = (time.perf_counter() - t0) / iters
    pairs = C * cap * cap * n_off
    print(
        f"{name:34s} {dt*1e3:8.3f} ms  {pairs/dt/1e9:7.2f} Gpair/s",
        flush=True,
    )


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    C = 1728
    for J, off in [(56, 14), (64, 14), (112, 7), (168, 5), (224, 4), (280, 3),
                   (448, 2), (896, 1), (120, 7), (96, 7), (48, 14), (40, 14),
                   (32, 14), (24, 14), (16, 14)]:
        time_case(f"[{C},56,{J}] x{off}", C, 56, J, off)
    # i-row variations with aligned J
    for cap in (8, 16, 24, 32, 40, 48):
        time_case(f"[{C},{cap},112] x7", C, cap, 112, 7)
    # transposed: lanes = cells
    time_transposed("T [56,56,1728] x14", C, 56, 14)
    time_transposed("T [48,48,1728] x14", C, 48, 14)
