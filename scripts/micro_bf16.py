"""Does bf16 elementwise math run faster than f32 on the v5e VPU?"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def bench(name, fn, args, iters, work):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.asarray(out, jnp.float32).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.3f} ms  {work/dt/1e9:8.1f} Gpair/s", flush=True)


def plj(dx, dy, dz, dt_):
    one = jnp.asarray(1.0, dt_)
    rsq = dx * dx + dy * dy + dz * dz
    r2 = one / rsq
    r6 = r2 * r2 * r2
    f = r6 * (jnp.asarray(12.0, dt_) * r6 - jnp.asarray(3.0, dt_)) * r2
    f = jnp.where(rsq < jnp.asarray(9.0, dt_), f, jnp.asarray(0.0, dt_))
    return f


def make(dt_, C=1728, cap=56, J=112, off=7):
    key = jax.random.PRNGKey(0)
    xi = jax.random.normal(key, (C, cap, 1), jnp.float32).astype(dt_)
    jx = jax.random.normal(key, (off, C, J), jnp.float32).astype(dt_)
    iters = 30

    @jax.jit
    def run(xi, jx):
        def body(i, acc):
            x2 = xi + jnp.asarray(1e-3, dt_) * i

            def sbody(c, j):
                dx = x2 - j[:, None, :]
                dy = x2 * jnp.asarray(1.1, dt_) - j[:, None, :]
                dz = x2 * jnp.asarray(0.9, dt_) - j[:, None, :]
                f = plj(dx, dy, dz, dt_)
                return (
                    c[0] + jnp.sum(f * dx, axis=-1),
                    c[1] + jnp.sum(f * dy, axis=-1),
                    c[2] + jnp.sum(f * dz, axis=-1),
                ), None

            c0 = tuple(jnp.zeros((C, cap), dt_) for _ in range(3))
            out, _ = jax.lax.scan(sbody, c0, jx)
            return acc + out[0][0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    return run, (xi, jx), iters, C * cap * J * off


if __name__ == "__main__":
    for dt_ in (jnp.float32, jnp.bfloat16):
        run, args, iters, work = make(dt_)
        bench(f"plj chain {dt_.__name__}", run, args, iters, work)
    # wider bf16 (double lanes per tile at (16,128) tiling)
    run, args, iters, work = make(jnp.bfloat16, J=224, off=7)
    bench("plj chain bfloat16 J=224", run, args, iters, work)
    run, args, iters, work = make(jnp.float32, J=224, off=7)
    bench("plj chain float32 J=224", run, args, iters, work)
