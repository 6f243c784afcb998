"""Test: does the Newton j-side reduction double the elementwise work?

Cases (production-shaped, C=1728, cap=56):
  A. full stencil (27 offsets), i-side reduction only, flat J
  B. half stencil (14 offsets incl self), i-side only (physics-wrong, cost probe)
  C. half stencil, i-side + j-side reductions (production math), flat J
  D. same as C but scanned per-offset (current production structure)
"""

import time
import sys

import jax
import jax.numpy as jnp


def plj(dx, dy, dz):
    rsq = dx * dx + dy * dy + dz * dz
    r2inv = 1.0 / rsq
    r6inv = r2inv * r2inv * r2inv
    f = r6inv * (12.0 * r6inv - 3.0) * r2inv
    inside = (rsq < 9.0) & (rsq > 0.0)
    return jnp.where(inside, f, 0.0)


def bench(name, fn, args, pairs, iters=30):
    jfn = jax.jit(fn)

    @jax.jit
    def loop(args):
        def body(i, acc):
            a0 = args[0] + 1e-9 * i
            out = jfn(a0, *args[1:])
            return acc + out[0].ravel()[0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    r = loop(args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    float(loop(args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.3f} ms  {pairs/dt/1e9:6.2f} Gpair/s", flush=True)


C, cap = 1728, 56
key = jax.random.PRNGKey(0)


def mk(J):
    xi = jax.random.normal(key, (C, cap, 1), jnp.float32)
    jx = jax.random.normal(key, (C, J), jnp.float32)
    return (xi, xi * 1.1, xi * 0.9, jx, jx * 1.2, jx * 0.8)


def iside(xi, yi, zi, jx, jy, jz):
    dx = xi - jx[:, None, :]
    dy = yi - jy[:, None, :]
    dz = zi - jz[:, None, :]
    f = plj(dx, dy, dz)
    return (
        jnp.sum(f * dx, axis=-1),
        jnp.sum(f * dy, axis=-1),
        jnp.sum(f * dz, axis=-1),
    )


def both_sides(xi, yi, zi, jx, jy, jz):
    dx = xi - jx[:, None, :]
    dy = yi - jy[:, None, :]
    dz = zi - jz[:, None, :]
    f = plj(dx, dy, dz)
    out_i = (
        jnp.sum(f * dx, axis=-1),
        jnp.sum(f * dy, axis=-1),
        jnp.sum(f * dz, axis=-1),
    )
    out_j = (
        jnp.sum(f * dx, axis=1),
        jnp.sum(f * dy, axis=1),
        jnp.sum(f * dz, axis=1),
    )
    return out_i + out_j


def scanned_both(xi, yi, zi, jx, jy, jz):
    # jx: [n_off, C, cap]
    def body(carry, js):
        jxx, jyy, jzz = js
        dx = xi - jxx[:, None, :]
        dy = yi - jyy[:, None, :]
        dz = zi - jzz[:, None, :]
        f = plj(dx, dy, dz)
        c = (
            carry[0] + jnp.sum(f * dx, axis=-1),
            carry[1] + jnp.sum(f * dy, axis=-1),
            carry[2] + jnp.sum(f * dz, axis=-1),
        )
        ys = jnp.stack(
            [jnp.sum(f * dx, axis=1), jnp.sum(f * dy, axis=1), jnp.sum(f * dz, axis=1)],
            axis=-1,
        )
        return c, ys

    carry0 = tuple(jnp.zeros((C, cap), jnp.float32) for _ in range(3))
    out, ys = jax.lax.scan(body, carry0, (jx, jy, jz))
    return out + (ys,)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    bench("A full27 flat J=1512 i-side", iside, mk(27 * cap), C * cap * 27 * cap)
    bench("B half14 flat J=784 i-side", iside, mk(14 * cap), C * cap * 14 * cap)
    bench("C half14 flat J=784 both sides", both_sides, mk(14 * cap), C * cap * 14 * cap)
    xi = jax.random.normal(key, (C, cap, 1), jnp.float32)
    js = jax.random.normal(key, (14, C, cap), jnp.float32)
    bench(
        "D half14 scan both sides (production)",
        scanned_both,
        (xi, xi * 1.1, xi * 0.9, js, js * 1.2, js * 0.8),
        C * cap * 14 * cap,
    )
    # E: both sides via 128-wide scan chunks (2 offsets/iter)
    js2 = js.reshape(7, 2, C, cap).transpose(0, 2, 1, 3).reshape(7, C, 2 * cap)
    bench(
        "E half14 scan2 both sides J=112",
        scanned_both,
        (xi, xi * 1.1, xi * 0.9, js2, js2 * 1.2, js2 * 0.8),
        C * cap * 14 * cap,
    )
